from . import criteria, optimizers, schedulers, scores
from .criteria import initialize_criterion
from .optimizers import initialize_optimizer
from .schedulers import initialize_scheduler
from .scores import initialize_score

__all__ = [
    "criteria", "optimizers", "schedulers", "scores",
    "initialize_criterion", "initialize_optimizer", "initialize_scheduler",
    "initialize_score",
]
