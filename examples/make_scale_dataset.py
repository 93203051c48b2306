"""Stage a CTR-scale synthetic sparse LR dataset as reference-schema Avro.

The classic public large sparse LR sets (rcv1, KDD2010, Criteo) cannot be
fetched in this image (no egress), so the BASELINE.json-class scale target
is anchored with a synthetic power-law dataset at production shape:
default 10M train rows x 1M features x 12 nnz/row (~120M nonzeros, ~1.2 GB
Avro), written as reference-schema container files
{features: [{name, term, value}], response, weight, offset}
(reference: RegressionPrepare.java:73-192 input contract) plus a held-out
test file and a ready-to-run streaming job config:

    python examples/make_scale_dataset.py            # ~10 min, 2 writers
    python -m mlease_tpu train examples/data/ctr-10m.job   # on the TPU chip

The job config uses streaming.groups so each ADMM iteration runs as a
sequence of fixed-shape group solves (host->device transfer double-buffered
under the previous group's solve, train/streaming.py) — the >HBM execution
mode; per-group shapes compile ONCE and are reused for every group and
iteration, which also sidesteps the tunnel's multi-minute remote compile at
monolithic 10M-row shapes (ROADMAP "8.4M-row feasibility" note).

Labels come from a sparse ground-truth model: score = x'w* - 1.5, so the
positive rate lands near a CTR-like ~18% and held-out loglik has a known
good target (the Bayes loglik of the generating model, printed at the end).
"""

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mlease_tpu.io import avro  # noqa: E402

SCHEMA = {
    "type": "record", "name": "CtrRow", "namespace": "mlease.examples",
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

N_FEATURES = int(os.environ.get("SCALE_FEATURES", 1_000_000))
N_TRAIN = int(os.environ.get("SCALE_ROWS", 10_000_000))
N_TEST = int(os.environ.get("SCALE_TEST_ROWS", 200_000))
NNZ = int(os.environ.get("SCALE_NNZ", 12))
N_PARTS = int(os.environ.get("SCALE_PARTS", max(os.cpu_count() or 2, 2)))
ZIPF_A = 1.3
INTERCEPT_TRUE = -1.5


def _w_true():
    # deterministic sparse-ish ground truth: N(0, 0.3) per feature
    rng = np.random.default_rng(12345)
    return (rng.normal(size=N_FEATURES) * 0.3).astype(np.float32)


def _write_part(path: str, n_rows: int, seed: int, report: bool = False):
    """One writer process: vectorized chunk synthesis; encoding through the
    native block encoder when available (~2.3M rows/s/core,
    native/avro_encode.cpp — byte-identical container output), else the
    per-row Python encoder (~18K rows/s/core)."""
    try:
        from mlease_tpu.io import fast_encode
        native = fast_encode.is_available()
    except Exception:  # pragma: no cover - import/packaging issues
        native = False
    rng = np.random.default_rng(seed)
    w = _w_true()
    t0 = time.time()
    chunk = 50_000
    with avro.AvroFileWriter(path, SCHEMA, codec="null",
                             block_records=4000) as out:
        done = 0
        while done < n_rows:
            m = min(chunk, n_rows - done)
            cols = ((rng.zipf(ZIPF_A, size=(m, NNZ)) - 1) % N_FEATURES)
            vals = (rng.normal(size=(m, NNZ)) * 0.5).astype(np.float32)
            score = np.einsum("rk,rk->r", vals, w[cols]) + INTERCEPT_TRUE
            y = (rng.random(m) < 1.0 / (1.0 + np.exp(-score))).astype(int)
            if native:
                for s in range(0, m, 4000):
                    blk = slice(s, min(s + 4000, m))
                    out.append_raw_block(
                        fast_encode.encode_ctr_block(
                            cols[blk].astype(np.int32), vals[blk],
                            y[blk].astype(np.int32)),
                        min(s + 4000, m) - s)
            else:
                names = np.char.add("f", cols.astype("U7"))
                for i in range(m):
                    out.append({
                        "response": int(y[i]), "weight": 1.0, "offset": 0.0,
                        "features": [
                            {"name": names[i, k], "term": "",
                             "value": float(vals[i, k])} for k in range(NNZ)]})
            done += m
            if report:
                rate = done / (time.time() - t0)
                print(f"  {os.path.basename(path)}: {done}/{n_rows} "
                      f"({rate:.0f} rows/s/writer)", flush=True)


def bayes_loglik(n: int = 300_000) -> float:
    """Held-out loglik of the GENERATING model — the ceiling any trained
    model can approach (irreducible Bernoulli noise)."""
    rng = np.random.default_rng(777)
    w = _w_true()
    cols = ((rng.zipf(ZIPF_A, size=(n, NNZ)) - 1) % N_FEATURES)
    vals = (rng.normal(size=(n, NNZ)) * 0.5).astype(np.float32)
    score = np.einsum("rk,rk->r", vals, w[cols]) + INTERCEPT_TRUE
    p = 1.0 / (1.0 + np.exp(-score))
    return float(np.mean(p * np.log(p) + (1 - p) * np.log1p(-p)))


JOB = """\
# CTR-scale streaming ADMM run (synthetic power-law data; see
# make_scale_dataset.py). Matches the reference's config key names
# (README.md:179-205); streaming.groups / head.size are this framework's
# beyond-reference scale knobs.
input.paths = {data_dir}/train
test.path = {data_dir}/test
output.base.path = {out_dir}
num.blocks = 16
streaming.groups = 8
head.size = 128
# resident-head mode (default auto): the dense head is pinned in HBM once;
# only tails stream per iteration. head.dtype=bfloat16 additionally halves
# the head's device memory / wire bytes (accumulation stays f32).
# streaming.resident.head = auto
# head.dtype = bfloat16
lambda = 1,10,100
num.iters = 10
regularizer = 2
epsilon = 0.0001
liblinear.epsilon = 0.01
test.loglik.per.iter = true
write.tmp.data = false
force.output.overwrite = true
"""


def main():
    base = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
    data_dir = os.path.join(base, "ctr-10m")
    os.makedirs(os.path.join(data_dir, "train"), exist_ok=True)
    os.makedirs(os.path.join(data_dir, "test"), exist_ok=True)

    t0 = time.time()
    jobs = []
    per = N_TRAIN // N_PARTS
    for p in range(N_PARTS):
        n = per + (N_TRAIN % N_PARTS if p == N_PARTS - 1 else 0)
        path = os.path.join(data_dir, "train", f"part-{p:05d}.avro")
        jobs.append(mp.Process(target=_write_part,
                               args=(path, n, 1000 + p, p == 0)))
    jobs.append(mp.Process(
        target=_write_part,
        args=(os.path.join(data_dir, "test", "part-00000.avro"),
              N_TEST, 999)))
    for j in jobs:
        j.start()
    for j in jobs:
        j.join()
        if j.exitcode != 0:
            raise SystemExit(f"writer failed: {j.exitcode}")

    job_path = os.path.join(base, "ctr-10m.job")
    with open(job_path, "w") as f:
        f.write(JOB.format(data_dir=data_dir,
                           out_dir=os.path.join(data_dir, "out")))
    size = sum(os.path.getsize(os.path.join(dp, fn))
               for dp, _, fns in os.walk(data_dir) for fn in fns)
    print(json.dumps({
        "train_rows": N_TRAIN, "test_rows": N_TEST,
        "features": N_FEATURES, "nnz_per_row": NNZ,
        "bytes": size, "gen_s": round(time.time() - t0, 1),
        "bayes_loglik": round(bayes_loglik(), 5),
        "job": job_path}))


if __name__ == "__main__":
    main()
