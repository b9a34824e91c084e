from .engine import Trainer, TrainState, make_train_step

__all__ = ["TrainState", "Trainer", "make_train_step"]
