"""Core differentiable ops: gradient reversal and full-covariance MVN math."""

from dpivae_tpu.ops.gradrev import grad_reverse  # noqa: F401
from dpivae_tpu.ops.mvn import (  # noqa: F401
    mvn_log_prob,
    mvn_sample_with_log_prob,
)
