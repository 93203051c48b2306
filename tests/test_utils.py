"""Utils: JobConfig parsing/errors, checkpoints, profiling spans."""

import os

import numpy as np
import pytest

from mlease_tpu.utils import checkpoint as ckpt
from mlease_tpu.utils.config import ConfigError, JobConfig
from mlease_tpu.utils.profiling import Timings, trace


def test_jobconfig_parsing(tmp_path):
    p = tmp_path / "x.job"
    p.write_text("""
# comment
! also comment
num.blocks=20
lambda=1, 10 ,100
epsilon = 1e-4
flag=true
name: colon-style
""")
    cfg = JobConfig.from_file(str(p))
    assert cfg.get_int("num.blocks") == 20
    assert cfg.get_float_list("lambda") == [1.0, 10.0, 100.0]
    assert cfg.get_float("epsilon") == 1e-4
    assert cfg.get_boolean("flag")
    assert cfg.get_string("name") == "colon-style"
    assert cfg.get_string("missing", "dflt") == "dflt"
    with pytest.raises(ConfigError, match="missing.key"):
        cfg.get_string("missing.key")
    clone = cfg.clone()
    clone["num.blocks"] = "5"
    assert cfg.get_int("num.blocks") == 20


def test_checkpoint_roundtrip_and_prune(tmp_path):
    d = str(tmp_path / "ck")
    for it in range(1, 5):
        ckpt.save_checkpoint(d, it, np.full((2, 3), it), np.zeros((2, 1, 3)),
                             inner_eps=0.01 / it, mindiff=0.1 * it,
                             best_loglik=-0.5)
    state = ckpt.load_latest(d)
    assert state["iteration"] == 4
    assert state["inner_eps"] == pytest.approx(0.0025)
    np.testing.assert_array_equal(state["z"], np.full((2, 3), 4))
    ckpt.prune_checkpoints(d, keep=2)
    stems = {f.rsplit(".", 1)[0] for f in os.listdir(d)}
    assert stems == {"iter-00003", "iter-00004"}
    assert ckpt.load_latest(str(tmp_path / "nope")) is None


def test_timings_and_trace(tmp_path):
    t = Timings()
    with t.span("a"):
        pass
    with t.span("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    with trace(None):  # no-op path
        pass


def test_eval_empty_records():
    from mlease_tpu.eval.loglik import aggregate_loglik

    out = aggregate_loglik([])
    assert out["count"] == 0.0


def test_loglik_bad_response():
    from mlease_tpu.eval.loglik import record_loglik

    with pytest.raises(ValueError, match="response should be"):
        record_loglik(7, 0.1)
