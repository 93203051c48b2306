"""Real-dataset end-to-end: the pipeline must match a single-machine
liblinear fit (sklearn's liblinear backend — the same solver lineage as the
reference's vendored liblinear-java) on a real binary-classification task.

rcv1/KDD-scale sets are not fetchable in this image (no egress);
scikit-learn's bundled Wisconsin breast-cancer set is the real data
available offline. See examples/make_real_dataset.py for the staging used
by the runnable example configs.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))

from mlease_tpu.io import avro
from mlease_tpu.utils.config import JobConfig


@pytest.fixture(scope="module")
def staged(tmp_path_factory):
    sklearn = pytest.importorskip("sklearn")  # noqa: F841
    from sklearn.datasets import load_breast_cancer

    from make_real_dataset import _standardize, compare_sklearn, stage

    out_dir = str(tmp_path_factory.mktemp("real"))
    d = load_breast_cancer()
    base = stage("breast-cancer", _standardize(d.data), d.target, out_dir,
                 lambdas="1", num_iters=12)
    ll_sklearn = compare_sklearn(base, 1.0)
    return out_dir, base, ll_sklearn


def test_breast_cancer_matches_liblinear(staged):
    out_dir, base, ll_sklearn = staged
    from mlease_tpu.train.pipeline import run_regression_pipeline

    config = JobConfig.from_file(os.path.join(out_dir, "breast-cancer.job"))
    run_regression_pipeline(config)

    rec = list(avro.read_records(os.path.join(
        base, "out", "test", "lambda-1.0", "_loglik",
        "part-r-00000.avro")))[0]
    ll_ours = rec["testLoglik"]
    assert rec["count"] == 142
    # same objective, same data: the 4-block consensus fit must land within
    # a small slack of the single-machine liblinear optimum (slack covers
    # finite ADMM iterations + sklearn's intercept regularization)
    assert abs(ll_ours - ll_sklearn) < 5e-3, (ll_ours, ll_sklearn)
    # sanity: far better than the base-rate model
    p = 0.627  # class prior of the training split
    ll_prior = p * np.log(p) + (1 - p) * np.log(1 - p)
    assert ll_ours > ll_prior + 0.5
