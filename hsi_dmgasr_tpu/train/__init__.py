from .state import TrainState, create_train_state
from .ddpm_model import DDPMModel
from .stage1_gae import GAETrainer
from .losses import cal_gradient, cal_sam, h_loss, hybrid_loss, spe_loss

__all__ = [
    "DDPMModel",
    "GAETrainer",
    "TrainState",
    "cal_gradient",
    "cal_sam",
    "create_train_state",
    "h_loss",
    "hybrid_loss",
    "spe_loss",
]
