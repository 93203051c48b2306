"""mlease_tpu — a TPU-native large-scale regression framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of linkedin/ml-ease:
consensus-ADMM large-scale logistic regression (L1/L2), naive
divide-and-average training, per-item models with posterior variances, batch
scoring and held-out log-likelihood evaluation — designed for SPMD execution
over TPU device meshes instead of Hadoop MapReduce.
"""

__version__ = "0.1.0"
