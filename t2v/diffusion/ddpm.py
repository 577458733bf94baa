"""Full-chain ancestral DDPM sampling.

Parity for the reference's LVDM 'ddpm' sample path
(sample_text2video.py:56-69 ``sample_denoising_batch`` →
ddpm3d.py:1014-1126 ``p_sample_loop``): all T timesteps, posterior
q(x_{t-1}|x_t, x0) and log-variance, noise gated at t==0. Compiled as
one ``lax.scan`` over the full chain.

``clip_denoised``: the pixel-space DDPM convention clips x0 to [-1, 1],
but the reference's LatentDiffusion sets ``self.clip_denoised = False``
(ddpm3d.py:540) and ``p_sample_loop`` passes that through — LVDM latents
routinely exceed ±1, so clipping would distort every step. The LVDM
caller must pass ``clip_denoised=False``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from t2v.core import rng as rng_lib
from t2v.diffusion.schedules import DiffusionSchedule

NAME = "DDPM"
CFG_COMBINE = "full"


def sample(
    eps_fn,
    schedule: DiffusionSchedule,
    x,
    key,
    *,
    clip_denoised: bool = True,
):
    """eps_fn(x, t, step) -> eps; runs t = T-1 .. 0."""
    T = schedule.num_timesteps
    sr = jnp.asarray(schedule.sqrt_recip_alphas_cumprod)
    srm1 = jnp.asarray(schedule.sqrt_recipm1_alphas_cumprod)
    pm1 = jnp.asarray(schedule.posterior_mean_coef1)
    pm2 = jnp.asarray(schedule.posterior_mean_coef2)
    plv = jnp.asarray(schedule.posterior_log_variance_clipped)
    noise_key = rng_lib.stream(key, "ddpm_noise")

    def body(xc, i):
        t = T - 1 - i
        eps = eps_fn(xc, t.astype(jnp.float32), i)
        x0 = sr[t] * xc - srm1[t] * eps
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        mean = pm1[t] * x0 + pm2[t] * xc
        noise = jax.random.normal(jax.random.fold_in(noise_key, i), xc.shape, xc.dtype)
        nonzero = (t != 0).astype(xc.dtype)
        return mean + nonzero * jnp.exp(0.5 * plv[t]) * noise, None

    x, _ = jax.lax.scan(body, x.astype(jnp.float32), jnp.arange(T))
    return x
