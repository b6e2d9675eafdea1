"""Training runtime: optax factory, jit train/eval loop, metrics, checkpoints."""

from vit_tpu.train.optim import OptSpec, build_optimizer, schedule_scale  # noqa: F401
from vit_tpu.train.loop import Experiment, TrainState  # noqa: F401
