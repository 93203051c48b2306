"""End-to-end pipeline: Prepare -> AdmmTrain -> Test -> TestLoglik.

TPU-native Regression driver (reference:
src/main/java/com/linkedin/mlease/regression/jobs/Regression.java:37-98),
keeping the reference's on-disk layout so downstream consumers can switch
frameworks without changes:

  <out>/tmp-data/                      prepared rows (RegressionPrepareOutput)
  <out>/lambda-rho/part-r-00000.avro   LambdaRhoMap
  <out>/initialModel/                  naive warm-start models (when boosted)
  <out>/sample-test-loglik/iteration-N.avro
  <out>/best-model/best-iteration-N.avro
  <out>/final-model/part-r-00000.avro
  <out>/checkpoint/                    per-iteration (z,u,...) resume state
  <out>/test/lambda-<l>/part-r-00000.avro (+ /_loglik/), /test/best-model/...
"""

from __future__ import annotations

import json
import logging
import os
import shutil
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from mlease_tpu.core.dataset import pack_blocks
from mlease_tpu.core.linear_model import read_model_file, write_model_file
from mlease_tpu.core.prepare import prepare_rows
from mlease_tpu.core.vocab import build_vocab
from mlease_tpu.eval.loglik import run_test_loglik
from mlease_tpu.eval.score import run_regression_test
from mlease_tpu.io import avro, schemas
from mlease_tpu.io.records import feature_key, row_to_prepare_record
from mlease_tpu.train.admm import AdmmConfig, AdmmResult, AdmmTrainer
from mlease_tpu.train.naive import NaiveConfig, train_naive
from mlease_tpu.utils import checkpoint as ckpt
from mlease_tpu.utils.config import JobConfig

logger = logging.getLogger(__name__)


def read_lambda_map(path: str) -> dict[str, float]:
    """Per-feature lambda map from Avro {name, term, value} records
    (reference: ReadLambdaMapConsumer,
    regression/consumers/ReadLambdaMapConsumer.java)."""
    out = {}
    for rec in avro.read_records(path):
        out[feature_key(rec["name"], rec.get("term"))] = float(rec["value"])
    return out


def read_lambda_rho(path: str) -> dict[float, float]:
    """{lambda -> rho} from a LambdaRhoMap Avro file (reference:
    ReadLambdaRhoConsumer, regression/consumers/ReadLambdaRhoConsumer.java)."""
    return {float(rec["lambda"]): float(rec["rho"])
            for rec in avro.read_records(path)}


def _parse_pcg(raw: str):
    """\"pcg\" job key: true|false|jacobi|head_block (AdmmConfig.pcg).
    Unknown values are rejected HERE — a typo must not reach the solver."""
    val = {"true": True, "false": False}.get(raw.lower(), raw.lower())
    if val not in (True, False, "jacobi", "head_block"):
        raise ValueError(
            f"pcg must be true|false|jacobi|head_block; got {raw!r}")
    return val


def admm_config_from_job(config: JobConfig, dtype=None) -> AdmmConfig:
    lambdas = config.get_float_list("lambda")
    rhos = None
    if "rho" in config:
        rhos = config.get_float_list("rho")
    lambda_map = None
    lm_path = config.get_string("lambda.map", "")
    if lm_path:
        lambda_map = read_lambda_map(lm_path)
    return AdmmConfig(
        lambdas=lambdas,
        rhos=rhos,
        num_iters=config.get_int("num.iters", 10),
        regularizer=config.get_int("regularizer"),
        epsilon=config.get_float("epsilon", 1e-4),
        liblinear_epsilon=config.get_float("liblinear.epsilon", 0.01),
        aggressive_liblinear_epsilon_decay=config.get_boolean(
            "aggressive.liblinear.epsilon.decay", False),
        penalize_intercept=config.get_boolean("penalize.intercept", False),
        initialize_boost_rate=config.get_float("initialize.boost.rate", 0.0),
        rho_adapt_coefficient=config.get_float("rho.adapt.coefficient", 0.0),
        num_click_replicates=config.get_int("num.click.replicates", 1),
        test_loglik_per_iter=config.get_boolean("test.loglik.per.iter", False),
        lambda_map=lambda_map,
        relaxation=config.get_float("relaxation", 1.0),
        reference_l1_compat=config.get_boolean("reference.l1.compat", True),
        head_size=config.get_int("head.size", 0),
        # head.dtype=bfloat16: store (and, in streaming mode, transfer) the
        # dense head at half width; accumulation stays in the compute dtype
        head_dtype={"": None, "float32": jnp.float32,
                    "bfloat16": jnp.bfloat16,
                    "float64": jnp.float64}[
                        config.get_string("head.dtype", "")],
        dual_layout=config.get_boolean("dual.layout", False),
        multi_rhs=config.get_boolean("multi.rhs", True),
        pcg=_parse_pcg(config.get_string("pcg", "true")),
        flat_blocks=config.get_boolean("flat.blocks", True),
        dtype=dtype if dtype is not None else {
            "float32": jnp.float32, "float64": jnp.float64,
            "bfloat16": jnp.bfloat16,
        }[config.get_string("dtype", "float32")],
    )


def run_regression_pipeline(config: JobConfig, mesh=None,
                            dtype=None) -> AdmmResult:
    if mesh is None and config.get_boolean("use.mesh", False):
        # shard blocks over the visible devices (single-host multi-chip; for
        # multi-host see parallel/distributed.py). "mesh.devices" selects a
        # leading subset (0 = all).
        from mlease_tpu.parallel.mesh import make_mesh
        ndev = config.get_int("mesh.devices", 0)
        mesh = make_mesh(n=ndev if ndev > 0 else None)
        logger.info("mesh over %d devices", mesh.devices.size)
    out_base = config.get_string("output.base.path")
    if config.get_boolean("force.output.overwrite", False):
        shutil.rmtree(out_base, ignore_errors=True)
    os.makedirs(out_base, exist_ok=True)

    cfg = admm_config_from_job(config, dtype=dtype)
    nblocks = config.get_int("num.blocks")
    ignore_value = config.get_boolean("binary.feature", False)
    map_key = config.get_string("map.key", "")

    # ---- Prepare (RegressionPrepare) --------------------------------
    # Native C++ columnar ingest when possible (single file, random
    # partitioning); identical semantics to the record-at-a-time path
    # (tests/test_native_ingest.py). Falls back to pure Python otherwise.
    input_paths = config.get_string("input.paths")
    seed = config.get_int("prepare.seed", 0)

    # ---- pack cache (pack.cache.dir, streaming jobs only) ------------
    # A 100M-row job pays ~50 min of decode + pack + hybrid conversion
    # before iteration 1; crash/resume pays it again. With pack.cache.dir
    # set, the post-hybrid groups persist once and reload in ~a disk scan
    # (mlease_tpu/io/pack_cache.py; keyed by inputs + layout knobs).
    pack_cache_dir = config.get_string("pack.cache.dir", "")
    cached_groups = None
    pc_manifest = None
    _sg = config.get_int("streaming.groups", 0)
    if pack_cache_dir and _sg > 1 and cfg.initialize_boost_rate <= 0:
        from mlease_tpu.io import pack_cache
        _hdt = np.dtype(cfg.head_dtype if cfg.head_dtype is not None
                        else cfg.dtype)
        pc_manifest = pack_cache.build_manifest(
            avro.enumerate_avro_files(input_paths), nblocks=nblocks,
            n_groups=_sg, head_size=cfg.head_size, head_dtype=str(_hdt),
            num_click_replicates=cfg.num_click_replicates, seed=seed,
            binary_feature=ignore_value, map_key=map_key)
        hit = pack_cache.load_groups(pack_cache_dir, pc_manifest)
        if hit is not None:
            cached_groups, vocab = hit
    data = None
    input_files = avro.enumerate_avro_files(input_paths)
    use_native = (config.get_boolean("native.ingest", True)
                  and not map_key and len(input_files) >= 1
                  and cfg.initialize_boost_rate <= 0  # warm start needs rows
                  and cached_groups is None)
    if use_native:
        from mlease_tpu.io import fast_decode
        if fast_decode.is_available():
            try:
                import time as _time

                from mlease_tpu.core.ingest import (
                    decode_files_parallel, merge_decoded,
                    pack_blocks_columnar, prepare_columnar, vocab_from_names)
                # phase timings: the 100M cold pipeline is ingest-dominated
                # (~2.5:1 over training, ROADMAP r4) — every run records
                # where the minutes went so the dominant term is never a
                # guess
                _ph: dict[str, float] = {}
                _t0 = _time.monotonic()
                parts = decode_files_parallel(
                    input_files, ignore_value=ignore_value)
                _ph["decode_s"] = _time.monotonic() - _t0
                _t0 = _time.monotonic()
                decoded = merge_decoded(parts)
                del parts
                _ph["merge_s"] = _time.monotonic() - _t0
                _t0 = _time.monotonic()
                vocab = vocab_from_names(decoded.vocab_names)
                _ph["vocab_s"] = _time.monotonic() - _t0
                _t0 = _time.monotonic()
                row_ids, partitions, weights = prepare_columnar(
                    decoded, nblocks,
                    num_click_replicates=cfg.num_click_replicates, seed=seed)
                _ph["prepare_s"] = _time.monotonic() - _t0
                _t0 = _time.monotonic()
                data = pack_blocks_columnar(
                    decoded, row_ids, partitions, weights, vocab,
                    nblocks=nblocks)
                _ph["pack_s"] = _time.monotonic() - _t0
                logger.info("ingest phase breakdown: %s",
                            {k: round(v, 1) for k, v in _ph.items()})
                if config.get_boolean("write.tmp.data", True):
                    _write_tmp_from_columnar(
                        os.path.join(out_base, "tmp-data",
                                     "part-m-00000.avro"),
                        decoded, row_ids, partitions, weights, vocab)
                logger.info("native ingest: %d rows, %d features",
                            int(data.nrows.sum()), data.dim)
                # free the columnar decode buffers (~10 GB at 100M rows)
                # before the hybrid/group conversions allocate their peak
                del decoded, row_ids, partitions, weights
            except Exception as e:  # fall back to the reference path
                logger.warning("native ingest failed (%s); python path", e)
                data = None
    if data is None and cached_groups is not None:
        logger.info("pack cache hit: ingest/pack skipped (%d groups, %d "
                    "features)", len(cached_groups), cached_groups[0].dim)
    elif data is None:
        records = avro.read_records(input_paths)
        logger.info("prepare: %d input records", len(records))
        prepared = list(prepare_rows(
            records, nblocks, map_key=map_key,
            num_click_replicates=cfg.num_click_replicates,
            ignore_value=ignore_value, seed=seed))
        if config.get_boolean("write.tmp.data", True):
            avro.write_records(
                os.path.join(out_base, "tmp-data", "part-m-00000.avro"),
                schemas.REGRESSION_PREPARE_OUTPUT,
                (row_to_prepare_record(k, r) for k, r in prepared))
        blocks: list[list[dict]] = [[] for _ in range(nblocks)]
        for key, row in prepared:
            blocks[int(key)].append(row)
        vocab = build_vocab((r for _k, r in prepared), has_intercept=True)
        data = pack_blocks(blocks, vocab)
    vocab.save(os.path.join(out_base, "model-vocab.json"))
    if data is not None:
        logger.info("packed %d blocks, %d rows padded to (%d, %d), "
                    "%d features", data.nblocks, int(data.nrows.sum()),
                    data.padded_rows, data.max_nnz, data.dim)

    # lambda -> rho map file (RegressionAdmmTrain.java:200-201)
    avro.write_records(
        os.path.join(out_base, "lambda-rho", "part-r-00000.avro"),
        schemas.LAMBDA_RHO_MAP,
        [{"lambda": float(l), "rho": float(r)}
         for l, r in zip(cfg.lambdas, cfg.resolved_rhos())])

    # ---- test rows for per-iteration sample loglik -------------------
    test_path = config.get_string("test.path", "")
    test_rows = None
    test_records = None
    if test_path and os.path.exists(test_path):
        from mlease_tpu.io.records import normalize_row

        test_records = avro.read_records(test_path)
        # per-iteration SAMPLE loglik uses only the FIRST enumerated
        # part-file (<=1M events, enforced in AdmmTrainer); the final
        # Test/TestLoglik jobs below score the full test set
        # (RegressionAdmmTrain.java:211-217,771,799 vs RegressionTest)
        first_part = avro.enumerate_avro_files(test_path)[0]
        test_rows = [normalize_row(r, ignore_value=ignore_value)
                     for r in avro.read_records(first_part)]

    # ---- optional warm start (naive mean init, AdmmTrain.java:236-276)
    z0 = None
    if cfg.initialize_boost_rate > 0 and cfg.regularizer == 2:
        logger.info("warm start: naive mean-model initialization")
        naive_cfg = NaiveConfig(
            lambdas=sorted(set(cfg.lambdas)),
            liblinear_epsilon=config.get_float("liblinear.epsilon", 0.01),
            lambda_map=cfg.lambda_map, compute_model_mean=True,
            dtype=cfg.dtype)
        keyed = {str(i): blocks[i] for i in range(nblocks) if blocks[i]}
        naive_res = train_naive(keyed, naive_cfg, vocab=vocab, mesh=mesh)
        write_model_file(os.path.join(out_base, "initialModel",
                                      "part-r-00000.avro"), naive_res.models)
        # per-lambda init from that lambda's mean model
        # (AdmmTrain.java:262-270)
        z0 = np.stack([
            naive_res.mean_models[_fmt(l)].to_dense(vocab)
            if _fmt(l) in naive_res.mean_models else np.zeros(vocab.size)
            for l in cfg.lambdas])

    # ---- optional lambda-path extension warm start ---------------------
    # init.model.path: reuse a previous run's final-model as z init — each
    # lambda starts from the model whose lambda is nearest in log space
    # (exact-key match wins). Lets a user widen the regularization path
    # without re-paying the cold ADMM iterations. No reference analogue
    # (the reference always restarts from zero or a naive mean model).
    init_model_path = config.get_string("init.model.path", "")
    if z0 is None and init_model_path:
        prev_models = read_model_file(init_model_path)
        z0 = np.stack([
            _nearest_lambda_model(l, prev_models).to_dense(vocab)
            for l in cfg.lambdas])
        logger.info("lambda-path warm start from %s (%d models)",
                    init_model_path, len(prev_models))

    # ---- per-iteration callback machinery (shared by the in-memory and
    # streaming trainers): crash checkpoints, the write.train.output interop
    # dump, and per-iteration sample-loglik Avro files -------------------
    ckpt_dir = os.path.join(out_base, "checkpoint")
    best_state = {"loglik": -9999999.0}

    # remove.tmp.dir=true in the reference deletes old iter-i/ state
    # (RegressionAdmmTrain.java:475-479); false keeps everything. Absent, we
    # prune to the newest 2 checkpoints to bound disk.
    keep_all = ("remove.tmp.dir" in config
                and not config.get_boolean("remove.tmp.dir", False))
    keep_n = config.get_int("checkpoint.keep", 2)

    # write.train.output=true: per-iteration iter-i/model files in the
    # reference's RegressionTrainOutput{key="lambda#part", model=x_b,
    # uplusx=u_b+x_b} wire format (RegressionAdmmTrain.java:707-711,
    # src/main/avro/RegressionTrainOutput.avsc) so external Avro consumers /
    # a reference cluster can inspect or resume mid-run state
    write_train_output = config.get_boolean("write.train.output", False)
    prev_u = {"u": None}
    nblocks_total = (data.nblocks if data is not None
                     else sum(g.nblocks for g in cached_groups))

    def _dump_train_output(iteration, z_np, u_np):
        from mlease_tpu.core.linear_model import LinearModel
        u_old = (prev_u["u"] if prev_u["u"] is not None
                 else np.zeros_like(u_np))
        records = []
        L = u_np.shape[0]
        for li in range(L):
            lam_key = _fmt(cfg.lambdas[li])
            for b in range(nblocks_total):
                # u_new = u_old + x - z  =>  x = u_new - u_old + z,
                # uplusx = u_old + x = u_new + z
                x_b = u_np[li, b] - u_old[li, b] + z_np[li]
                uplusx = u_np[li, b] + z_np[li]
                records.append({
                    "key": f"{lam_key}#{b}",
                    "model": LinearModel.from_dense(x_b, vocab).to_avro(),
                    "uplusx": LinearModel.from_dense(uplusx,
                                                     vocab).to_avro()})
        avro.write_records(
            os.path.join(out_base, f"iter-{iteration}", "model",
                         "part-r-00000.avro"),
            schemas.REGRESSION_TRAIN_OUTPUT, records)
        prev_u["u"] = u_np.copy()
        if not keep_all:
            stale = os.path.join(out_base, f"iter-{iteration - 2}")
            shutil.rmtree(stale, ignore_errors=True)

    def on_iteration(iteration, z, u, diffs, inner_eps, logliks=None):
        z_np, u_np = np.asarray(z), np.asarray(u)
        ckpt.save_checkpoint(ckpt_dir, iteration, z_np,
                             u_np, inner_eps=inner_eps,
                             mindiff=float(diffs.min()),
                             best_loglik=best_state["loglik"])
        if not keep_all:
            ckpt.prune_checkpoints(ckpt_dir, keep=keep_n)
        if write_train_output:
            _dump_train_output(iteration, np.asarray(z_np, np.float64),
                               np.asarray(u_np, np.float64))
        # crash-consistent per-iteration loglik files
        # (RegressionAdmmTrain.java writes sample-test-loglik per iteration)
        if logliks:
            avro.write_records(
                os.path.join(out_base, "sample-test-loglik",
                             f"iteration-{iteration}.avro"),
                schemas.SAMPLE_TEST_LOGLIK, logliks)

    # ---- ADMM train ---------------------------------------------------
    # streaming.groups > 1: the >HBM mode — blocks stay host-resident in N
    # groups, transferred per iteration with double-buffered prefetch
    # (train/streaming.py); checkpoint / resume / write.train.output work
    # exactly as in the in-memory trainer (same callback contract)
    streaming_groups = config.get_int("streaming.groups", 0)
    if streaming_groups > 1:
        from mlease_tpu.core.dataset import split_blocks
        from mlease_tpu.train.streaming import StreamingAdmmTrainer

        rh = config.get_string("streaming.resident.head", "auto")
        cd = config.get_string("streaming.consensus.device", "auto")
        cw = config.get_string("streaming.wire", "auto")
        if cached_groups is not None:
            groups = cached_groups
            del cached_groups
        else:
            groups = split_blocks(data, streaming_groups)
            del data   # groups hold views; dropping the name lets the ELL
            #            pack free once every group converts to hybrid
            if pack_cache_dir and pc_manifest is not None:
                # convert to hybrid HERE (the trainer then skips groups
                # that already carry a head) so the cache stores the final
                # packed layout; in place, group by group, for peak RSS
                import time as _time
                _t0 = _time.monotonic()
                if cfg.head_size > 0:
                    from mlease_tpu.core.dataset import to_hybrid
                    _hdt = np.dtype(cfg.head_dtype
                                    if cfg.head_dtype is not None
                                    else cfg.dtype)
                    for _i, _g in enumerate(groups):
                        if _g.head is None:
                            groups[_i] = to_hybrid(_g, cfg.head_size,
                                                   column_sorted=True,
                                                   head_dtype=_hdt)
                _hybrid_s = _time.monotonic() - _t0
                from mlease_tpu.io import pack_cache
                _t0 = _time.monotonic()
                pack_cache.save_groups(pack_cache_dir, pc_manifest,
                                       groups, vocab)
                logger.info(
                    "streaming pack phases: hybrid=%.1fs cache_write=%.1fs",
                    _hybrid_s, _time.monotonic() - _t0)
        s_trainer = StreamingAdmmTrainer(
            groups, vocab, cfg,
            test_rows=test_rows, mesh=mesh,
            resident_head={"auto": "auto", "true": True,
                           "false": False}[rh],
            resident_head_budget_gb=config.get_float(
                "streaming.resident.head.gb", 8.0),
            consensus_device={"auto": "auto", "true": True,
                              "false": False}[cd],
            # compact|dense|auto: COO-head + permutation-derived tail wire
            # (train/streaming.py _head_coo) — auto enables off-mesh
            compact_wire={"auto": "auto", "compact": True,
                          "dense": False}[cw],
            # auto|true|false: pad per-group tail widths to the run max so
            # solver/wire programs compile once, not per group shape
            pad_tails={"auto": "auto", "true": True, "false": False}[
                config.get_string("streaming.pad.tails", "auto")])
        del groups  # the trainer holds the hybrid groups; dropping the
        #             view-groups here releases the original ELL pack
        s_kwargs: dict[str, Any] = {"z0": z0}
        if config.get_boolean("resume", False):
            state = ckpt.load_latest(ckpt_dir)
            if state is not None:
                logger.info("resuming streaming run from checkpoint iter %d",
                            state["iteration"])
                s_kwargs = dict(
                    z0=state["z"], u0=state["u"],
                    start_iteration=state["iteration"] + 1,
                    inner_eps0=state["inner_eps"],
                    mindiff0=state["mindiff"],
                    best_loglik0=state["best_loglik"])
        with_trace = config.get_string("profile.dir", "")
        from mlease_tpu.utils.profiling import trace
        with trace(with_trace):
            result = s_trainer.run(callback=on_iteration, **s_kwargs)
        # probe-composed utilization at THIS shape (logged so every
        # production streaming run records its distance from the measured
        # speed-of-light — see mlease_tpu/utils/floor.py)
        if result.iter_times and mesh is None:
            try:
                from mlease_tpu.utils.floor import (measure_put_bandwidth,
                                                    streaming_floor)
                _steady = (float(np.median(result.iter_times[1:]))
                           if len(result.iter_times) > 1
                           else result.iter_times[0])
                _sf = streaming_floor(
                    s_trainer.groups, s_trainer.trip_log,
                    s_trainer.stream_wire_bytes(), _steady,
                    measure_put_bandwidth(), len(cfg.lambdas))
                logger.info("streaming pass-floor decomposition: %s",
                            json.dumps(_sf))
            except Exception as e:  # accounting must never fail the job
                logger.info("pass-floor decomposition unavailable: %r", e)
        return _write_pipeline_outputs(config, result, out_base, test_path,
                                       test_records, ignore_value)

    # mesh.feature.shards > 1: feature model parallelism — the coefficient
    # axis is column-sharded over a 2-D (block x feat) mesh so per-chip
    # model HBM scales as n/shards (train/feature_sharded.py). Uses all
    # visible devices (or the 1-D mesh's devices when use.mesh also set).
    feat_shards = config.get_int("mesh.feature.shards", 0)
    if feat_shards > 1:
        import jax as _jax

        from mlease_tpu.parallel.mesh import make_mesh_2d
        from mlease_tpu.train.feature_sharded import FeatureShardedAdmmTrainer

        devs = (list(mesh.devices.flat) if mesh is not None
                else _jax.devices())
        block = max(len(devs) // feat_shards, 1)
        mesh2d = make_mesh_2d(devs, block=block, feat=feat_shards)
        logger.info("feature-sharded mesh: %d block x %d feat devices",
                    block, feat_shards)
        for unsupported in ("resume", "write.train.output", "profile.dir"):
            if config.get_string(unsupported, ""):
                logger.warning(
                    "%s is not supported with mesh.feature.shards and is "
                    "ignored (the feature-sharded trainer has no "
                    "checkpoint/interop dump path yet)", unsupported)
        fs_trainer = FeatureShardedAdmmTrainer(
            data, vocab, cfg, test_rows=test_rows, mesh=mesh2d)
        result = fs_trainer.run(z0=z0)
        return _write_pipeline_outputs(config, result, out_base, test_path,
                                       test_records, ignore_value)

    trainer = AdmmTrainer(data, vocab, cfg, test_rows=test_rows, mesh=mesh)

    resume = config.get_boolean("resume", False)
    run_kwargs: dict[str, Any] = {}
    if resume:
        state = ckpt.load_latest(ckpt_dir)
        if state is not None:
            logger.info("resuming from checkpoint iter %d", state["iteration"])
            run_kwargs = dict(
                z0=state["z"], u0=state["u"],
                start_iteration=state["iteration"] + 1,
                inner_eps0=state["inner_eps"], mindiff0=state["mindiff"],
                best_loglik0=state["best_loglik"])
            z0 = None

    if "z0" not in run_kwargs:
        run_kwargs["z0"] = z0
    from mlease_tpu.utils.profiling import trace
    with trace(config.get_string("profile.dir", "")):
        # fused.loop=true: the driver loop runs on-device in lax.while_loop
        # chunks (no per-iteration host round-trips; identical semantics,
        # see AdmmTrainer.run_fused). checkpoint.every=C pauses every C
        # iterations for a crash checkpoint; iter-i interop dumps need
        # per-iteration u deltas, so write.train.output keeps the host loop
        if (config.get_boolean("fused.loop", False)
                and "start_iteration" not in run_kwargs
                and not write_train_output):
            # rough device-bytes estimate: data arrays + the fused loop's
            # carried state ((L, B, n) u + multi-RHS solver workspace). A
            # monolithic fused run at 10M rows x 1M features crashed the
            # TPU worker (HBM wall) where the same data trained fine in
            # streaming mode — warn rather than fault the shared worker.
            L = len(cfg.lambdas)
            est = sum(int(getattr(data, f).nbytes)
                      for f in ("indices", "values", "head", "tail_rows",
                                "tail_cols", "tail_vals", "tail_c_rows",
                                "tail_c_cols", "tail_c_vals")
                      if getattr(data, f, None) is not None)
            est += 12 * 4 * L * (data.nblocks + 1) * data.dim  # u/z/solver ws
            budget = config.get_float("fused.device.budget.gb", 10.0)
            if est > budget * (1 << 30):
                logger.warning(
                    "fused.loop at ~%.1f GB estimated device footprint "
                    "(budget %.1f GB): a monolithic fused run this large "
                    "can crash the TPU worker — prefer streaming.groups=N "
                    "(resident-head mode keeps the hot columns in HBM) or "
                    "fused.loop=false", est / (1 << 30), budget)
            every = config.get_int("checkpoint.every", 0) or None

            def on_chunk(iteration, z, u, diffs, inner_eps, logliks=None):
                ckpt.save_checkpoint(ckpt_dir, iteration, np.asarray(z),
                                     np.asarray(u), inner_eps=inner_eps,
                                     mindiff=float(np.min(diffs)),
                                     best_loglik=best_state["loglik"])
                if not keep_all:
                    ckpt.prune_checkpoints(ckpt_dir, keep=keep_n)
                by_iter: dict[int, list] = {}
                for entry in logliks or []:
                    by_iter.setdefault(entry["iter"], []).append(entry)
                for it, entries in by_iter.items():
                    avro.write_records(
                        os.path.join(out_base, "sample-test-loglik",
                                     f"iteration-{it}.avro"),
                        schemas.SAMPLE_TEST_LOGLIK, entries)

            result = trainer.run_fused(z0=run_kwargs.get("z0"),
                                       checkpoint_every=every,
                                       callback=on_chunk)
        else:
            result = trainer.run(callback=on_iteration, **run_kwargs)
    return _write_pipeline_outputs(config, result, out_base, test_path,
                                   test_records, ignore_value)


def _write_pipeline_outputs(config, result, out_base, test_path,
                            test_records, ignore_value) -> AdmmResult:
    """final-model / sample-test-loglik / best-model files + the Test and
    TestLoglik jobs (Regression.java:63-80)."""
    write_model_file(os.path.join(out_base, "final-model",
                                  "part-r-00000.avro"), result.models)
    if result.sample_loglik_history:
        by_iter: dict[int, list] = {}
        for entry in result.sample_loglik_history:
            by_iter.setdefault(entry["iter"], []).append(entry)
        for it, entries in by_iter.items():
            avro.write_records(
                os.path.join(out_base, "sample-test-loglik",
                             f"iteration-{it}.avro"),
                schemas.SAMPLE_TEST_LOGLIK, entries)
    if result.best_model is not None:
        write_model_file(
            os.path.join(out_base, "best-model",
                         f"best-iteration-{result.iterations}.avro"),
            {result.best_lambda: result.best_model})

    if test_records:
        with avro.AvroFileReader(avro.enumerate_avro_files(test_path)[0]) as r:
            input_schema = r.schema
        test_base = os.path.join(out_base, "test")
        run_regression_test(
            test_records, input_schema, result.models, test_base,
            [k for k in result.models], best_model=result.best_model,
            ignore_value=ignore_value)
        if config.get_boolean("get.test.loglik", True):
            logliks = run_test_loglik(test_base, test_base,
                                      [k for k in result.models])
            for name, rec in logliks.items():
                logger.info("test loglik %s: %.6f (n=%.0f)", name,
                            rec["testLoglik"], rec["count"])
    return result


def _fmt(lam: float) -> str:
    from mlease_tpu.train.admm import _lambda_key
    return _lambda_key(lam)


def _nearest_lambda_model(lam: float, models: Mapping[str, Any]):
    """Pick the init model for `lam` from a previous run's {lambda-key ->
    model} map: exact key match if present, else nearest lambda in log
    space (regularization paths are log-spaced, so log distance matches the
    statistical similarity of adjacent solutions)."""
    from mlease_tpu.core.linear_model import LinearModel

    key = _fmt(lam)
    if key in models:
        return models[key]
    best_key, best_d = None, float("inf")
    for k in models:
        try:
            kl = float(k)
        except ValueError:
            continue  # non-lambda keys (e.g. item models) are skipped
        if kl <= 0 or lam <= 0:
            d = abs(kl - lam)
        else:
            d = abs(np.log(kl) - np.log(lam))
        if d < best_d:
            best_key, best_d = k, d
    if best_key is None:
        return LinearModel()
    return models[best_key]


def _write_tmp_from_columnar(path, decoded, row_ids, partitions, weights,
                             vocab):
    """RegressionPrepareOutput records from the native columnar decode."""
    from mlease_tpu.io.records import split_feature_key

    def gen():
        for i in range(len(row_ids)):
            src = int(row_ids[i])
            s, e = decoded.row_start[src], decoded.row_start[src + 1]
            feats = []
            for j in range(s, e):
                name, term = split_feature_key(
                    vocab.name(int(decoded.feat_id[j])))
                feats.append({"name": name, "term": term,
                              "value": float(decoded.feat_val[j])})
            yield {"key": str(int(partitions[i])),
                   "response": int(decoded.response[src]),
                   "features": feats,
                   "weight": float(weights[i]),
                   "offset": float(decoded.offset[src])}

    avro.write_records(path, schemas.REGRESSION_PREPARE_OUTPUT, gen())
