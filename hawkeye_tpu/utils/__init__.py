from .meters import AverageMeter, PerformanceMeter, Timer, accuracy
from .logging_utils import TqdmHandler, get_logger
from .rng import KeySequence, set_random_seed

__all__ = [
    "AverageMeter",
    "PerformanceMeter",
    "Timer",
    "accuracy",
    "TqdmHandler",
    "get_logger",
    "KeySequence",
    "set_random_seed",
]
