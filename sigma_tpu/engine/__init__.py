from sigma_tpu.engine.logger import get_logger
from sigma_tpu.engine.optim import build_optimizer
from sigma_tpu.engine.train import TrainState, create_train_state, make_train_step

__all__ = [
    "get_logger",
    "build_optimizer",
    "TrainState",
    "create_train_state",
    "make_train_step",
]
