"""DDIM_Gaussian — the ModelScope-style DDIM sampler (the reference default).

Numerics mirror /root/reference/scripts/samplers/ddim/gaussian_sampler.py:
  * timestep ladder         :75-88  (stride ladder, flipped, first ``steps`` used)
  * CFG combine             :125-136 (with the learned_range channel split:
                            guidance applies to the first C//2 output channels,
                            the rest are copied from the conditional branch)
  * eps → x0 → DDIM update  :252-283 (eta noise, t!=0 gating)
  * vid2vid re-noise        add_noise via get_time_steps(int(strength*steps))
                            (samplers_common.py:137-143)

The whole loop compiles to a single ``lax.scan``; per-step scalars are
gathered from stacked plan tables.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from t2v.diffusion.schedules import DiffusionSchedule, modelscope_timesteps

NAME = "DDIM_Gaussian"
FRAME_INPAINT_SUPPORT = True
# CFG is applied to the first out_ch//2 channels only (gaussian_sampler.py
# var_type='learned_range' default + do_classifier_guidance :128-136).
CFG_COMBINE = "split_learned_range"


@dataclass(frozen=True)
class Plan:
    """Per-step coefficient tables, each shaped (steps,)."""

    timesteps: np.ndarray  # int32, descending DDPM t visited per step
    alphas: np.ndarray
    alphas_prev: np.ndarray
    sqrt_recip_alphas_cumprod: np.ndarray
    sqrt_recipm1_alphas_cumprod: np.ndarray
    sigmas: np.ndarray  # eta-scaled DDIM sigma per step
    steps: int


def plan(schedule: DiffusionSchedule, steps: int, eta: float = 0.0) -> Plan:
    T = schedule.num_timesteps
    stride = T // steps
    ts = modelscope_timesteps(T, steps)  # descending, len == steps
    t_prev = np.clip(ts - stride, 0, None)
    alphas = schedule.alphas_cumprod[ts]
    alphas_prev = schedule.alphas_cumprod[t_prev]
    # sigma_t = eta * sqrt((1-a_prev)/(1-a) * (1 - a/a_prev))  (:269-274)
    sigmas = eta * np.sqrt(
        (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
    )
    return Plan(
        timesteps=ts,
        alphas=alphas.astype(np.float32),
        alphas_prev=alphas_prev.astype(np.float32),
        sqrt_recip_alphas_cumprod=schedule.sqrt_recip_alphas_cumprod[ts],
        sqrt_recipm1_alphas_cumprod=schedule.sqrt_recipm1_alphas_cumprod[ts],
        sigmas=sigmas.astype(np.float32),
        steps=steps,
    )


def step(x, eps, p: Plan, i, noise):
    """One DDIM update x_t -> x_{t-1}.

    x:     (..., C) latent at plan step i
    eps:   CFG-combined model output at (x, timesteps[i])
    noise: standard normal, same shape as x (consumed only when eta > 0)
    """
    ts = jnp.asarray(p.timesteps)
    a = jnp.asarray(p.alphas)[i]
    a_prev = jnp.asarray(p.alphas_prev)[i]
    sr = jnp.asarray(p.sqrt_recip_alphas_cumprod)[i]
    srm1 = jnp.asarray(p.sqrt_recipm1_alphas_cumprod)[i]
    sigma = jnp.asarray(p.sigmas)[i]

    x0 = sr * x - srm1 * eps
    direction = jnp.sqrt(1.0 - a_prev - sigma**2) * eps
    nonzero = (ts[i] != 0).astype(x.dtype)
    return jnp.sqrt(a_prev) * x0 + direction + nonzero * sigma * noise


def encode_vid2vid(
    schedule: DiffusionSchedule, latent, noise, strength: float, steps: int
):
    """Re-noise input latents for vid2vid (samplers_common.py:137-143).

    The reference passes ``int(strength*steps)`` as the *stride* of
    get_time_steps and uses the top rung — i.e. it re-noises to near t=T-1
    regardless of strength. Preserved verbatim.
    """
    denoise_steps = max(int(strength * steps), 1)
    ladder = 1 + np.arange(0, schedule.num_timesteps, denoise_steps)
    ladder = np.clip(ladder, 0, schedule.num_timesteps - 1)
    t_top = int(ladder[::-1][0])
    sa = float(schedule.sqrt_alphas_cumprod[t_top])
    sb = float(schedule.sqrt_one_minus_alphas_cumprod[t_top])
    return sa * latent + sb * noise
