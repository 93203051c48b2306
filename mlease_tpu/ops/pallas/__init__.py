from mlease_tpu.ops.pallas.gram import gram_batched, gram_matrix

__all__ = ["gram_batched", "gram_matrix"]
