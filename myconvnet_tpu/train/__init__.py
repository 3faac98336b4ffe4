from myconvnet_tpu.train import gan, losses, optim
from myconvnet_tpu.train.trainer import Trainer, TrainState, init_train_state

__all__ = ["gan", "losses", "optim", "Trainer", "TrainState",
           "init_train_state"]
