from mlease_tpu.utils.config import ConfigError, JobConfig
from mlease_tpu.utils import checkpoint

__all__ = ["ConfigError", "JobConfig", "checkpoint"]
