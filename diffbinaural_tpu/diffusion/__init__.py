from .schedules import (
    linear_beta_schedule,
    linear_alpha_schedule,
    cosine_beta_schedule,
    sigmoid_beta_schedule,
    make_schedule,
    DiffusionSchedule,
)
from .gaussian import GaussianDiffusion
