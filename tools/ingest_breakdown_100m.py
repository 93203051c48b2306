"""Instrumented 100M cold ingest+pack (VERDICT r4 item 5): runs exactly the
pipeline's native-ingest phases (decode/merge/vocab/prepare/pack) plus
split/hybrid/cache-write at the ctr-100m.job shape, host-only (never touches
the chip), and prints one JSON line with the phase breakdown. The cache is
written to a scratch dir (pass --keep to retain it)."""
import json
import os
import shutil
import sys
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ml_dtypes  # noqa: E402

from mlease_tpu.core.dataset import split_blocks, to_hybrid  # noqa: E402
from mlease_tpu.core.ingest import (decode_files_parallel,  # noqa: E402
                                    merge_decoded, pack_blocks_columnar,
                                    prepare_columnar, vocab_from_names)
from mlease_tpu.io import avro, pack_cache  # noqa: E402

TRAIN = "/root/repo/examples/data/ctr-10m/train"
SCRATCH = os.environ.get("INGEST_SCRATCH",
                         "/root/repo/examples/data/ctr-10m/pack-cache-probe")
NBLOCKS, NGROUPS, HEAD = 32, 16, 128

files = avro.enumerate_avro_files(TRAIN)
ph = {}
t = time.monotonic()
parts = decode_files_parallel(files)
ph["decode_s"] = time.monotonic() - t
t = time.monotonic()
dec = merge_decoded(parts)
del parts
ph["merge_s"] = time.monotonic() - t
t = time.monotonic()
vocab = vocab_from_names(dec.vocab_names)
ph["vocab_s"] = time.monotonic() - t
t = time.monotonic()
row_ids, partitions, weights = prepare_columnar(
    dec, NBLOCKS, num_click_replicates=1, seed=0)
ph["prepare_s"] = time.monotonic() - t
t = time.monotonic()
data = pack_blocks_columnar(dec, row_ids, partitions, weights, vocab,
                            nblocks=NBLOCKS)
ph["pack_s"] = time.monotonic() - t
nrows = int(data.nrows.sum())
del dec, row_ids, partitions, weights
t = time.monotonic()
groups = split_blocks(data, NGROUPS)
del data
ph["split_s"] = time.monotonic() - t
t = time.monotonic()
for i, g in enumerate(groups):
    groups[i] = to_hybrid(g, HEAD, column_sorted=True,
                          head_dtype=np.dtype(ml_dtypes.bfloat16))
ph["hybrid_s"] = time.monotonic() - t
man = pack_cache.build_manifest(files, nblocks=NBLOCKS, n_groups=NGROUPS,
                                head_size=HEAD, head_dtype="bfloat16",
                                num_click_replicates=1, seed=0,
                                binary_feature=False)
t = time.monotonic()
pack_cache.save_groups(SCRATCH, man, groups, vocab)
ph["cache_write_s"] = time.monotonic() - t
ph = {k: round(v, 1) for k, v in ph.items()}
total = round(sum(ph.values()), 1)
print(json.dumps({"metric": "cold_ingest_100m_s", "value": total,
                  "unit": "s end-to-end (decode->cache)",
                  "vs_baseline": 0.0,
                  "detail": {"rows": nrows, "phases": ph}}), flush=True)
if "--keep" not in sys.argv:
    shutil.rmtree(SCRATCH, ignore_errors=True)
