"""Diffusion noise schedules and the DDPM coefficient tables.

All tables are computed once on host in float64 (matching the reference's
``torch.float64`` beta math, t2v_model.py:1240-1249) and exposed as float32
numpy arrays; samplers gather per-step scalars from them inside ``lax.scan``.

Reference semantics covered here:
  * ``beta_schedule('linear_sd')``          — t2v_model.py:1240-1249
  * DDPM buffer set                          — gaussian_sampler.py:11-50 and
                                               UNetSD.register_schedule (t2v_model.py:329-384)
  * ModelScope stride timesteps              — gaussian_sampler.py:75-88
  * SD-style DDIM timestep/σ tables          — ldm util make_ddim_timesteps /
                                               make_ddim_sampling_parameters
                                               (used by samplers/ddim/sampler.py:24-53)
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

import numpy as np


def beta_schedule(
    schedule: str,
    num_timesteps: int = 1000,
    init_beta: float | None = None,
    last_beta: float | None = None,
) -> np.ndarray:
    """Beta arrays in float64.

    'linear_sd' is the ModelScope schedule: linspace in sqrt-space
    (t2v_model.py:1243-1246). 'linear' (ldm make_beta_schedule "linear") is
    the same functional form with different default endpoints; 'cosine' is
    the improved-DDPM schedule (lvdm/models/modules/util.py:13-33).
    """
    if schedule == "linear_sd":
        init_beta = 0.00085 if init_beta is None else init_beta
        last_beta = 0.0120 if last_beta is None else last_beta
        return (
            np.linspace(init_beta**0.5, last_beta**0.5, num_timesteps, dtype=np.float64)
            ** 2
        )
    if schedule == "linear":
        init_beta = 1e-4 if init_beta is None else init_beta
        last_beta = 2e-2 if last_beta is None else last_beta
        return (
            np.linspace(init_beta**0.5, last_beta**0.5, num_timesteps, dtype=np.float64)
            ** 2
        )
    if schedule == "cosine":
        s = 0.008
        steps = num_timesteps + 1
        x = np.linspace(0, num_timesteps, steps, dtype=np.float64)
        alphas_cumprod = np.cos(((x / num_timesteps) + s) / (1 + s) * np.pi * 0.5) ** 2
        alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
        betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
        return np.clip(betas, 0, 0.999)
    if schedule == "sqrt_linear":
        init_beta = 1e-4 if init_beta is None else init_beta
        last_beta = 2e-2 if last_beta is None else last_beta
        return np.linspace(init_beta, last_beta, num_timesteps, dtype=np.float64)
    raise ValueError(f"Unsupported schedule: {schedule}")


@dataclass(frozen=True)
class DiffusionSchedule:
    """The full DDPM coefficient table set, float32, length ``num_timesteps``.

    Mirrors the buffers of reference gaussian_sampler.py:33-50.
    """

    betas: np.ndarray

    @classmethod
    def from_betas(cls, betas: np.ndarray) -> "DiffusionSchedule":
        return cls(betas=np.asarray(betas, dtype=np.float64))

    @classmethod
    def linear_sd(cls, num_timesteps: int = 1000) -> "DiffusionSchedule":
        """ModelScope default: linear_sd, 0.00085 → 0.0120
        (t2v_pipeline.py:107-111)."""
        return cls.from_betas(beta_schedule("linear_sd", num_timesteps))

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])

    @cached_property
    def _tables(self) -> dict[str, np.ndarray]:
        betas = self.betas
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas)
        alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])
        alphas_cumprod_next = np.concatenate([alphas_cumprod[1:], [0.0]])
        posterior_variance = (
            betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        )
        t = {
            "alphas": alphas,
            "alphas_cumprod": alphas_cumprod,
            "alphas_cumprod_prev": alphas_cumprod_prev,
            "alphas_cumprod_next": alphas_cumprod_next,
            "sqrt_alphas_cumprod": np.sqrt(alphas_cumprod),
            "sqrt_one_minus_alphas_cumprod": np.sqrt(1.0 - alphas_cumprod),
            "log_one_minus_alphas_cumprod": np.log(1.0 - alphas_cumprod),
            "sqrt_recip_alphas_cumprod": np.sqrt(1.0 / alphas_cumprod),
            "sqrt_recipm1_alphas_cumprod": np.sqrt(1.0 / alphas_cumprod - 1.0),
            "posterior_variance": posterior_variance,
            "posterior_log_variance_clipped": np.log(
                np.maximum(posterior_variance, 1e-20)
            ),
            "posterior_mean_coef1": betas
            * np.sqrt(alphas_cumprod_prev)
            / (1.0 - alphas_cumprod),
            "posterior_mean_coef2": (1.0 - alphas_cumprod_prev)
            * np.sqrt(alphas)
            / (1.0 - alphas_cumprod),
        }
        return {k: v.astype(np.float32) for k, v in t.items()}

    def __getattr__(self, name: str):
        tables = object.__getattribute__(self, "_tables")
        if name in tables:
            return tables[name]
        raise AttributeError(name)

    # float64 views used where the reference keeps double precision
    @cached_property
    def alphas_cumprod_f64(self) -> np.ndarray:
        return np.cumprod(1.0 - self.betas)


def modelscope_timesteps(num_timesteps: int, steps: int) -> np.ndarray:
    """The DDIM_Gaussian sampler's timestep ladder.

    Reproduces gaussian_sampler.py:75-88: stride = T//steps,
    ladder = flip(clamp(1 + arange(0, T, stride), 0, T-1)); the sampler then
    uses entries [0, steps) of the flipped ladder. Returns the ``steps``
    timesteps actually visited, descending.
    """
    if steps > num_timesteps:
        raise ValueError(
            f"steps ({steps}) cannot exceed the schedule's num_timesteps "
            f"({num_timesteps})"
        )
    stride = num_timesteps // steps
    ladder = 1 + np.arange(0, num_timesteps, stride)
    ladder = np.clip(ladder, 0, num_timesteps - 1)
    return ladder[::-1][:steps].astype(np.int32)


def make_ddim_timesteps(
    num_ddim_timesteps: int,
    num_ddpm_timesteps: int,
    discr_method: str = "uniform",
) -> np.ndarray:
    """SD-style DDIM timestep subset (ascending), ldm util semantics:
    uniform: arange(0, steps) * (T // steps) + 1."""
    if num_ddim_timesteps > num_ddpm_timesteps:
        raise ValueError(
            f"steps ({num_ddim_timesteps}) cannot exceed the schedule's "
            f"num_timesteps ({num_ddpm_timesteps})"
        )
    if discr_method == "uniform":
        c = num_ddpm_timesteps // num_ddim_timesteps
        ddim_timesteps = np.asarray(list(range(0, num_ddpm_timesteps, c)))
    elif discr_method == "quad":
        ddim_timesteps = (
            np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps) ** 2
        ).astype(int)
    else:
        raise NotImplementedError(discr_method)
    return (ddim_timesteps + 1).astype(np.int32)


def make_ddim_sampling_parameters(
    alphacums: np.ndarray, ddim_timesteps: np.ndarray, eta: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(sigmas, alphas, alphas_prev) for the selected DDIM subset
    (ldm util make_ddim_sampling_parameters semantics)."""
    alphas = alphacums[ddim_timesteps]
    alphas_prev = np.concatenate(
        [[alphacums[0]], alphacums[ddim_timesteps[:-1]]]
    )
    sigmas = eta * np.sqrt(
        (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
    )
    return (
        sigmas.astype(np.float32),
        alphas.astype(np.float32),
        alphas_prev.astype(np.float32),
    )
