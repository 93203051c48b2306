"""Stage real datasets as reference-schema Avro for the pipeline.

This image has no network egress, so the classic large sparse LR sets
(rcv1, KDD, Criteo) cannot be fetched; the real datasets available offline
are scikit-learn's bundled ones. Two binary tasks are staged:

  breast-cancer  569 rows x 30 features (Wisconsin diagnostic)
  digits-odd     1797 rows x 64 features (odd vs even digit)

Each becomes train/test Avro files under examples/data/<name>/ with the
reference's input schema {features: [{name, term, value}], response, weight,
offset} (reference: examples/sample-data.avro, RegressionPrepare.java:73-192)
plus a ready-to-run job config. Run:

    python examples/make_real_dataset.py
    JAX_PLATFORMS=cpu python -m mlease_tpu train examples/data/breast-cancer.job

The companion check `compare_sklearn()` fits the SAME objective with
scikit-learn's liblinear solver (the reference's inner-solver lineage) and
prints both held-out logliks.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mlease_tpu.io import avro  # noqa: E402

SCHEMA = {
    "type": "record", "name": "RealRow", "namespace": "mlease.examples",
    "fields": [
        {"name": "response", "type": "int"},
        {"name": "features", "type": {"type": "array", "items": {
            "type": "record", "name": "feature", "fields": [
                {"name": "name", "type": "string"},
                {"name": "term", "type": "string"},
                {"name": "value", "type": "float"}]}}},
        {"name": "weight", "type": "float"},
        {"name": "offset", "type": "float"},
    ],
}


def _rows(X, y, names):
    out = []
    for xi, yi in zip(X, y):
        feats = [{"name": names[j], "term": "", "value": float(v)}
                 for j, v in enumerate(xi) if v != 0.0]
        out.append({"response": int(yi), "features": feats,
                    "weight": 1.0, "offset": 0.0})
    return out


def _standardize(X):
    mu, sd = X.mean(axis=0), X.std(axis=0)
    sd[sd == 0] = 1.0
    return (X - mu) / sd


def stage(name, X, y, out_dir, lambdas="0.1,1,10", num_iters=20, blocks=4):
    rng = np.random.default_rng(0)
    order = rng.permutation(len(y))
    X, y = X[order], y[order]
    n_test = len(y) // 4
    names = [f"f{j}" for j in range(X.shape[1])]
    base = os.path.join(out_dir, name)
    avro.write_records(os.path.join(base, "train", "part-0.avro"), SCHEMA,
                       _rows(X[n_test:], y[n_test:], names))
    avro.write_records(os.path.join(base, "test", "part-0.avro"), SCHEMA,
                       _rows(X[:n_test], y[:n_test], names))
    job = os.path.join(out_dir, f"{name}.job")
    with open(job, "w") as f:
        f.write(f"""input.paths={base}/train
test.path={base}/test
output.base.path={base}/out
num.blocks={blocks}
lambda={lambdas}
num.iters={num_iters}
regularizer=2
test.loglik.per.iter=true
force.output.overwrite=true
dtype=float64
""")
    print(f"staged {name}: train={len(y) - n_test} test={n_test} "
          f"features={X.shape[1]} -> {job}")
    return base


def compare_sklearn(base, lam):
    """Fit the same L2-prior logistic objective with sklearn's liblinear
    backend and report its held-out mean loglik for comparison."""
    from sklearn.linear_model import LogisticRegression

    def load(split):
        rows = list(avro.read_records(os.path.join(base, split)))
        names = sorted({f["name"] for r in rows for f in r["features"]})
        idx = {k: j for j, k in enumerate(names)}
        X = np.zeros((len(rows), len(names)))
        y = np.zeros(len(rows))
        for i, r in enumerate(rows):
            for f in r["features"]:
                X[i, idx[f["name"]]] = f["value"]
            y[i] = r["response"]
        return X, y

    Xtr, ytr = load("train")
    Xte, yte = load("test")
    # our objective: sum_i log1p(exp(-y z)) + (lam/2)||w||^2 (intercept free)
    # sklearn: C * sum_i log1p(exp(-y z)) + 0.5 ||w||^2  =>  C = 1/lam
    clf = LogisticRegression(C=1.0 / lam, solver="liblinear", tol=1e-8,
                             max_iter=10000)
    clf.fit(Xtr, ytr)
    p = clf.predict_proba(Xte)[:, 1]
    ll = float(np.mean(yte * np.log(p) + (1 - yte) * np.log(1 - p)))
    return ll


def main():
    from sklearn.datasets import load_breast_cancer, load_digits

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
    d = load_breast_cancer()
    stage("breast-cancer", _standardize(d.data), d.target, out_dir)
    d = load_digits()
    stage("digits-odd", _standardize(d.data), (d.target % 2), out_dir,
          blocks=4)
    print(json.dumps({
        "sklearn_liblinear_loglik": {
            "breast-cancer@lambda=1": compare_sklearn(
                os.path.join(out_dir, "breast-cancer"), 1.0),
            "digits-odd@lambda=1": compare_sklearn(
                os.path.join(out_dir, "digits-odd"), 1.0),
        }}))


if __name__ == "__main__":
    main()
