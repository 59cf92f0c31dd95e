from .schedules import DiffusionSchedule, make_beta_schedule
from .gaussian import DDPMDiffusion, GaussianDiffusion

__all__ = [
    "DDPMDiffusion",
    "DiffusionSchedule",
    "GaussianDiffusion",
    "make_beta_schedule",
]
