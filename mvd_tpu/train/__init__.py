from .losses import noise_loss, reconstruction_metrics  # noqa: F401
from .state import (  # noqa: F401
    TrainState,
    count_params,
    make_lr_schedule,
    make_optimizer,
    trainable_mask,
)
from .step import make_train_step  # noqa: F401
