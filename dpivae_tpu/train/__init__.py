"""Training: model assembly and the fused on-device optimization loop."""

from dpivae_tpu.train.setup import setup_model  # noqa: F401
from dpivae_tpu.train.train import TrainLogs, train_model  # noqa: F401
