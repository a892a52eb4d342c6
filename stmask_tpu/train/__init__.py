from .losses import compute_losses
from .schedule import autoscale, learning_rate
from .train_step import TrainState, build_train_step, make_optimizer

__all__ = ['compute_losses', 'autoscale', 'learning_rate', 'TrainState',
           'build_train_step', 'make_optimizer']
