from nerf_tpu.train.state import TrainState, create_train_state
from nerf_tpu.train.optim import make_optimizer, lr_schedule
from nerf_tpu.train.step import make_train_step, make_eval_render
from nerf_tpu.train.loop import fit

__all__ = [
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "lr_schedule",
    "make_train_step",
    "make_eval_render",
    "fit",
]
