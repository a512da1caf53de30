from .optim import build_optimizer, build_scheduler, set_learning_rate
from .tester import Tester
from .trainer import Trainer, TrainState, emergency_save

__all__ = [
    "Trainer",
    "TrainState",
    "Tester",
    "emergency_save",
    "build_optimizer",
    "build_scheduler",
    "set_learning_rate",
]
