"""DDIM — the Stable-Diffusion-style DDIM sampler.

Numerics mirror /root/reference/scripts/samplers/ddim/sampler.py:
  * schedule subset + sigma tables  :24-53 (ldm make_ddim_timesteps /
                                     make_ddim_sampling_parameters, "uniform")
  * p_sample_ddim                   :168-220 (full-channel CFG, eps param)
  * stochastic_encode               :269-283 (vid2vid entry)
  * decode partial loop             :285-306 (vid2vid runs the first
                                     int(strength*steps) rungs, descending)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from t2v.diffusion.schedules import (
    DiffusionSchedule,
    make_ddim_sampling_parameters,
    make_ddim_timesteps,
)

NAME = "DDIM"
FRAME_INPAINT_SUPPORT = False
CFG_COMBINE = "full"


@dataclass(frozen=True)
class Plan:
    """Per-step tables in *sampling order* (descending t), shape (steps,)."""

    timesteps: np.ndarray  # int32, descending: model input t per step
    alphas: np.ndarray
    alphas_prev: np.ndarray
    sqrt_one_minus_alphas: np.ndarray
    sigmas: np.ndarray
    steps: int
    # ascending tables kept for stochastic_encode
    ddim_alphas_asc: np.ndarray


def plan(schedule: DiffusionSchedule, steps: int, eta: float = 0.0) -> Plan:
    ts_asc = make_ddim_timesteps(steps, schedule.num_timesteps)
    # the uniform subset has ceil(T/stride) entries — the reference's DDIM
    # runs ALL of them (total_steps = timesteps.shape[0], sampler.py:135),
    # which can exceed the requested count when steps doesn't divide T; the
    # +1 offset can also reach T for pathological step counts — clamp.
    ts_asc = np.minimum(ts_asc, schedule.num_timesteps - 1)
    steps = len(ts_asc)
    sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(
        schedule.alphas_cumprod, ts_asc, eta
    )
    # sampling iterates the flipped table; index = steps-1-i corresponds to
    # ascending position, so flipping every table gives sampling order.
    flip = lambda a: np.ascontiguousarray(a[::-1])
    return Plan(
        timesteps=flip(ts_asc).astype(np.int32),
        alphas=flip(alphas),
        alphas_prev=flip(alphas_prev),
        sqrt_one_minus_alphas=flip(np.sqrt(1.0 - alphas)),
        sigmas=flip(sigmas),
        steps=steps,
        ddim_alphas_asc=alphas,
    )


def truncate_for_vid2vid(p: Plan, t_start: int) -> Plan:
    """vid2vid decode runs only the first ``t_start`` ascending rungs
    (sampler.py:295-297) — i.e. the *last* t_start entries of the flipped
    tables."""
    sl = slice(p.steps - t_start, None)
    return Plan(
        timesteps=p.timesteps[sl],
        alphas=p.alphas[sl],
        alphas_prev=p.alphas_prev[sl],
        sqrt_one_minus_alphas=p.sqrt_one_minus_alphas[sl],
        sigmas=p.sigmas[sl],
        steps=t_start,
        ddim_alphas_asc=p.ddim_alphas_asc,
    )


def step(x, eps, p: Plan, i, noise):
    """One p_sample_ddim update (sampler.py:168-220), temperature=1."""
    a_t = jnp.asarray(p.alphas)[i]
    a_prev = jnp.asarray(p.alphas_prev)[i]
    sqrt_1m_a = jnp.asarray(p.sqrt_one_minus_alphas)[i]
    sigma = jnp.asarray(p.sigmas)[i]

    pred_x0 = (x - sqrt_1m_a * eps) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(1.0 - a_prev - sigma**2) * eps
    return jnp.sqrt(a_prev) * pred_x0 + dir_xt + sigma * noise


def stochastic_encode(p: Plan, latent, noise, t_enc: int):
    """sampler.py:269-283 — q-sample at ascending DDIM index ``t_enc``."""
    t_enc = min(int(t_enc), len(p.ddim_alphas_asc) - 1)
    sa = float(np.sqrt(p.ddim_alphas_asc[t_enc]))
    sb = float(np.sqrt(1.0 - p.ddim_alphas_asc[t_enc]))
    return sa * latent + sb * noise
