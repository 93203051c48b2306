"""CLI subcommand smoke tests (train pipeline, naive, fit on libsvm)."""

import json
import os

import numpy as np
import pytest

from mlease_tpu.cli import main, read_libsvm
from mlease_tpu.io import avro, schemas


def write_job(tmp_path, **kv):
    path = str(tmp_path / "job.job")
    with open(path, "w") as f:
        f.write("# test job\n")
        for k, v in kv.items():
            f.write(f"{k}={v}\n")
    return path


def synth_avro(tmp_path, name="data.avro", n=200, seed=0):
    rng = np.random.default_rng(seed)
    recs = []
    for _ in range(n):
        nnz = int(rng.integers(1, 5))
        feats = [{"name": f"f{int(j)}", "term": "", "value": float(rng.normal())}
                 for j in rng.choice(10, nnz, replace=False)]
        score = sum(f["value"] for f in feats) - 0.3
        recs.append({"key": "", "response": int(rng.random() < 1/(1+np.exp(-score))),
                     "features": feats, "weight": 1.0, "offset": 0.0})
    path = str(tmp_path / name)
    avro.write_records(path, schemas.REGRESSION_PREPARE_OUTPUT, recs)
    return path


def test_cli_train(tmp_path, capsys):
    data = synth_avro(tmp_path)
    out = str(tmp_path / "out")
    job = write_job(tmp_path, **{
        "input.paths": data, "output.base.path": out, "test.path": data,
        "num.blocks": 3, "lambda": "1", "num.iters": 4, "regularizer": 2,
        "test.loglik.per.iter": "true", "force.output.overwrite": "true",
        "dtype": "float64"})
    assert main(["train", job]) == 0
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed["models"] == ["1.0"]
    assert os.path.exists(os.path.join(out, "final-model", "part-r-00000.avro"))


def test_cli_naive_and_itemtest(tmp_path, capsys):
    data = synth_avro(tmp_path)
    out = str(tmp_path / "nout")
    job = write_job(tmp_path, **{
        "input.paths": data, "output.base.path": out, "num.blocks": 2,
        "lambda": "1,5", "compute.model.mean": "true", "dtype": "float64"})
    assert main(["naive", job]) == 0
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed["models"] == 4
    assert printed["mean_models"] == ["1.0", "5.0"]
    assert os.path.exists(os.path.join(out, "final-model", "part-r-00000.avro"))


def test_cli_item(tmp_path, capsys):
    rng = np.random.default_rng(1)
    recs = []
    for i in range(120):
        recs.append({"item": f"it{i % 3}", "response": int(rng.integers(0, 2)),
                     "features": [{"name": "a", "term": "", "value": 1.0}],
                     "weight": 1.0, "offset": 0.0})
    schema = {
        "type": "record", "name": "R", "fields": [
            {"name": "item", "type": "string"},
            {"name": "response", "type": "int"},
            {"name": "features", "type": {"type": "array", "items": {
                "type": "record", "name": "feature", "fields": [
                    {"name": "name", "type": "string"},
                    {"name": "term", "type": "string"},
                    {"name": "value", "type": "float"}]}}},
            {"name": "weight", "type": "float"},
            {"name": "offset", "type": "float"}]}
    data = str(tmp_path / "items.avro")
    avro.write_records(data, schema, recs)
    model_out = str(tmp_path / "imodels")
    job = write_job(tmp_path, **{
        "input.paths": data, "item.key": "item",
        "intercept.lambdas": "1", "default.lambdas": "1,4",
        "compute.var": "true", "output.model.path": model_out,
        "dtype": "float64"})
    assert main(["item", job]) == 0
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed["models"] == 6  # 3 items x 1x2 grid

    # itemtest on the trained models
    test_out = str(tmp_path / "itest")
    job2 = write_job(tmp_path, **{
        "input.paths": data, "model.path": printed["output"],
        "item.key": "item", "output.base.path": test_out})
    assert main(["itemtest", job2]) == 0
    agg = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(agg) == 2  # one record per grid prefix
    assert all(a["count"] == 120 for a in agg)


def test_cli_fit_libsvm(tmp_path, capsys):
    rng = np.random.default_rng(2)
    lines = []
    for _ in range(100):
        y = int(rng.integers(0, 2))
        lines.append(f"{y} x:{rng.normal():.4f} z:{rng.normal():.4f}")
    path = str(tmp_path / "train.libsvm")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    out = str(tmp_path / "model.txt")
    assert main(["fit", path, "--out", out, "--posterior-var", "--f64"]) == 0
    text = open(out).read()
    assert "(INTERCEPT) =" in text and "x =" in text
    assert os.path.exists(out + ".var")
    rows = read_libsvm(path)
    assert len(rows) == 100


def test_cli_test_and_loglik(tmp_path, capsys):
    data = synth_avro(tmp_path)
    out = str(tmp_path / "out2")
    job = write_job(tmp_path, **{
        "input.paths": data, "output.base.path": out, "test.path": data,
        "num.blocks": 2, "lambda": "1", "num.iters": 3, "regularizer": 2,
        "force.output.overwrite": "true", "dtype": "float64"})
    assert main(["train", job]) == 0
    capsys.readouterr()
    score_out = str(tmp_path / "scored")
    job_t = write_job(tmp_path, **{
        "input.paths": data, "model.base.path": out,
        "output.base.path": score_out, "lambda": "1.0"})
    assert main(["test", job_t]) == 0
    capsys.readouterr()
    job_l = write_job(tmp_path, **{
        "input.base.paths": score_out, "output.base.path": score_out,
        "lambda": "1.0"})
    assert main(["loglik", job_l]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "1.0" in res
    assert res["1.0"]["testLoglik"] < 0


def test_cli_train_hybrid_config(tmp_path, capsys):
    """head.size / multi.rhs / pcg / relaxation through the job config."""
    data = synth_avro(tmp_path, name="hyb.avro")
    out = str(tmp_path / "hout")
    job = write_job(tmp_path, **{
        "input.paths": data, "output.base.path": out, "test.path": data,
        "num.blocks": 2, "lambda": "1", "num.iters": 4, "regularizer": 2,
        "head.size": 8, "multi.rhs": "true", "pcg": "true",
        "relaxation": 1.6, "test.loglik.per.iter": "true",
        "force.output.overwrite": "true", "dtype": "float64"})
    assert main(["train", job]) == 0
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed["models"] == ["1.0"]
    assert printed["best_loglik"] < 0


def test_cli_fit_warm_start_and_prior(tmp_path, capsys):
    rng = np.random.default_rng(3)
    lines = [f"{int(rng.integers(0, 2))} x:{rng.normal():.4f}"
             for _ in range(80)]
    path = str(tmp_path / "t.libsvm")
    open(path, "w").write("\n".join(lines))
    out1 = str(tmp_path / "m1.txt")
    assert main(["fit", path, "--out", out1, "--f64"]) == 0
    capsys.readouterr()
    # warm start from the solution: converges immediately to the same model
    out2 = str(tmp_path / "m2.txt")
    assert main(["fit", path, "--out", out2, "--init", out1, "--f64"]) == 0
    err = capsys.readouterr().err
    assert "iterations=0" in err
    assert open(out1).read() == open(out2).read()
    # nonzero prior mean shifts the solution
    out3 = str(tmp_path / "m3.txt")
    assert main(["fit", path, "--out", out3, "--prior-mean", "5.0",
                 "--prior-var", "0.01", "--f64"]) == 0
    vals = {l.split(" = ")[0]: float(l.split(" = ")[1])
            for l in open(out3).read().strip().splitlines()}
    assert vals["x"] == pytest.approx(5.0, abs=0.5)


def test_cli_fit_json(tmp_path, capsys):
    path = str(tmp_path / "rows.json")
    rng = np.random.default_rng(4)
    with open(path, "w") as f:
        for _ in range(60):
            f.write(json.dumps({
                "response": int(rng.integers(0, 2)),
                "features": [{"name": "a", "term": "",
                              "value": float(rng.normal())}]}) + "\n")
    out = str(tmp_path / "mj.txt")
    assert main(["fit", path, "--ftype", "json", "--out", out, "--f64"]) == 0
    assert "a =" in open(out).read()


def test_cli_fit_option_string_cov_and_binary(tmp_path, capsys):
    """Reference fit parity: option: strings, posterior covariance file,
    binary-feature mode, positive_weight (LibLinear.java:519-724)."""
    rng = np.random.default_rng(9)
    lines = []
    for _ in range(120):
        y = int(rng.integers(0, 2))
        lines.append(f"{y} a:{rng.normal():.4f} b:{rng.normal():.4f}")
    path = str(tmp_path / "t.libsvm")
    with open(path, "w") as f:
        f.write("\n".join(lines))

    # option string overrides flags; .cov written with [a, b] = v lines
    out = str(tmp_path / "m.txt")
    assert main(["fit", path, "--out", out, "--posterior-var",
                 "--posterior-cov", "--f64",
                 "--option", "max_iter=50, epsilon=1e-6, positive_weight=2"
                 ]) == 0
    assert os.path.exists(out + ".var")
    cov_lines = open(out + ".cov").read().strip().splitlines()
    assert cov_lines and cov_lines[0].startswith("[")
    n = 3  # a, b, (INTERCEPT)
    assert len(cov_lines) == n * n
    # symmetric positive diagonal
    vals = {}
    for line in cov_lines:
        k, _, v = line.partition(" = ")
        vals[k] = float(v)
    assert vals["[a, b]"] == pytest.approx(vals["[b, a]"], rel=1e-9)
    assert vals["[a, a]"] > 0
    # cov diagonal == .var values
    var_vals = {}
    for line in open(out + ".var").read().strip().splitlines():
        k, _, v = line.partition(" = ")
        var_vals[k.strip()] = float(v)
    # .var is 1/diag(H); cov diag is (H^-1)_ii — equal only in the diagonal
    # approx sense, so just check same order of magnitude & positivity
    assert var_vals["a"] > 0

    # positive_weight actually changes the solution
    out_pw = str(tmp_path / "m_pw.txt")
    assert main(["fit", path, "--out", out_pw, "--f64",
                 "--positive-weight", "5"]) == 0
    w_pw = open(out_pw).read()
    out_plain = str(tmp_path / "m_plain.txt")
    assert main(["fit", path, "--out", out_plain, "--f64"]) == 0
    assert w_pw != open(out_plain).read()

    # binary-feature: all values treated as 1 — same model as a file with
    # explicit 1.0 values
    lines1 = [ln.replace(":" + ln.split(":", 1)[1], "") for ln in lines]
    path_bin = str(tmp_path / "bin.libsvm")
    with open(path_bin, "w") as f:
        f.write("\n".join(
            " ".join([tok.split(":")[0] + (":1.0" if i else "")
                      for i, tok in enumerate(ln.split())])
            for ln in lines))
    out_b1 = str(tmp_path / "b1.txt")
    out_b2 = str(tmp_path / "b2.txt")
    assert main(["fit", path, "--out", out_b1, "--f64",
                 "--binary-feature"]) == 0
    assert main(["fit", path_bin, "--out", out_b2, "--f64"]) == 0
    assert open(out_b1).read() == open(out_b2).read()

    # cov without var is the reference's hard error
    with pytest.raises(SystemExit):
        main(["fit", path, "--out", out, "--posterior-cov"])

    # unknown option key raises
    with pytest.raises(ValueError):
        main(["fit", path, "--out", out, "--option", "bogus=1"])


def test_cli_predict_alias_and_mesh_flag(tmp_path, capsys):
    """`predict` scores like `test` (the reference declares run:predict but
    throws, LibLinear.java:716-720); `--mesh N` shards training blocks over
    the first N virtual devices with identical results."""
    data = synth_avro(tmp_path)
    out = str(tmp_path / "outp")
    job = write_job(tmp_path, **{
        "input.paths": data, "output.base.path": out, "test.path": data,
        "num.blocks": 4, "lambda": "1", "num.iters": 3, "regularizer": 2,
        "force.output.overwrite": "true", "dtype": "float64"})
    assert main(["train", job, "--mesh", "4"]) == 0
    r_mesh = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    out2 = str(tmp_path / "outp2")
    job2 = write_job(tmp_path, **{
        "input.paths": data, "output.base.path": out2, "test.path": data,
        "num.blocks": 4, "lambda": "1", "num.iters": 3, "regularizer": 2,
        "force.output.overwrite": "true", "dtype": "float64"})
    assert main(["train", job2]) == 0
    r_plain = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r_mesh["best_loglik"] == pytest.approx(r_plain["best_loglik"],
                                                  rel=1e-9)

    score_out = str(tmp_path / "pred_out")
    job_p = write_job(tmp_path, **{
        "input.paths": data, "model.base.path": out,
        "output.base.path": score_out, "lambda": "1.0"})
    assert main(["predict", job_p]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["outputs"]
