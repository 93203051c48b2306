from mlease_tpu.eval.score import (
    model_vocab,
    remove_union,
    run_regression_test,
    score_rows_device,
)
from mlease_tpu.eval.loglik import (
    aggregate_loglik,
    record_loglik,
    run_test_loglik,
)

__all__ = [
    "model_vocab", "remove_union", "run_regression_test", "score_rows_device",
    "aggregate_loglik", "record_loglik", "run_test_loglik",
]
