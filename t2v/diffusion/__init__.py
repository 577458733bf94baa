from t2v.diffusion.schedules import (
    DiffusionSchedule,
    beta_schedule,
    make_ddim_sampling_parameters,
    make_ddim_timesteps,
    modelscope_timesteps,
)
from t2v.diffusion.sampling import SamplerSpec, available_samplers, sample_loop

__all__ = [
    "DiffusionSchedule",
    "beta_schedule",
    "make_ddim_timesteps",
    "make_ddim_sampling_parameters",
    "modelscope_timesteps",
    "SamplerSpec",
    "available_samplers",
    "sample_loop",
]
