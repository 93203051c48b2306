from mlease_tpu.ops import admm_math, objective
from mlease_tpu.ops.newton import newton_cholesky
from mlease_tpu.ops.tron import tron, tron_batched
from mlease_tpu.ops.tron_multi import MultiProblem, tron_multi

__all__ = [
    "admm_math", "objective", "newton_cholesky", "tron", "tron_batched",
    "MultiProblem", "tron_multi",
]
