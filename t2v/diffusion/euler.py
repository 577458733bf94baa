"""Euler and Euler-ancestral samplers (k-diffusion convention).

Beyond-reference additions (the reference ships DDIM_Gaussian / DDIM /
UniPC, samplers_common.py:89-93): Euler and "Euler a" are the default
samplers of the k-diffusion family used across SD tooling (Karras et al.
2022, arXiv:2206.00364 Alg. 1-2).

k-diffusion runs a variance-exploding ODE on the rescaled state
``x_k = x_vp / sqrt(abar_t)`` with noise-to-signal levels
``sig_t = sqrt(1 - abar_t) / sqrt(abar_t)``. In that space the VP
marginal is ``x_k = x0 + sig * eps``, so the Euler derivative
``d = (x_k - x0) / sig`` is *exactly* the eps prediction — no model
re-wrapping needed. One Euler step to the next level:

    x_k'  = x_k + eps * (sig_dn - sig)            (+ sig_up * noise)
    sig_dn = sig_next, sig_up = 0                  (Euler)
    sig_up = sig_next * sqrt(1 - (sig_next/sig)^2 clipped),
    sig_dn = sqrt(sig_next^2 - sig_up^2)           (Euler ancestral, eta=1)

Mapped back to the VP carry (``x_vp = sqrt(abar) * x_k``) every step is a
3-coefficient affine update precomputed on the host, so both samplers fit
the single-state ``plan``/``step`` protocol (scan- and window-compatible,
sampling.py::make_step_body). The final rung is (abar=1, sig=0): the last
Euler step lands exactly on the x0 prediction.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from t2v.diffusion.schedules import DiffusionSchedule, make_ddim_timesteps

NAME = "Euler"
FRAME_INPAINT_SUPPORT = False
CFG_COMBINE = "full"


@dataclass(frozen=True)
class Plan:
    """Per-step affine tables in sampling order (descending t), (steps,)."""

    timesteps: np.ndarray  # int32, descending: model input t per step
    ratio: np.ndarray  # sqrt(abar_next)/sqrt(abar_cur)
    c_eps: np.ndarray  # sqrt(abar_next) * (sig_dn - sig_cur)
    c_noise: np.ndarray  # sqrt(abar_next) * sig_up  (zero for plain Euler)
    steps: int


def _levels(schedule: DiffusionSchedule, steps: int):
    """Descending model-input timesteps + the (abar, sig) ladder including
    the terminal clean rung (abar=1, sig=0)."""
    ts_asc = np.minimum(
        make_ddim_timesteps(steps, schedule.num_timesteps),
        schedule.num_timesteps - 1,
    )
    ts = np.ascontiguousarray(ts_asc[::-1]).astype(np.int32)
    abar = np.concatenate([schedule.alphas_cumprod[ts], [1.0]])
    sig = np.sqrt(1.0 - abar) / np.sqrt(abar)
    return ts, abar, sig


def _make_plan(schedule: DiffusionSchedule, steps: int, ancestral: bool) -> Plan:
    ts, abar, sig = _levels(schedule, steps)
    steps = len(ts)
    sqrt_ab = np.sqrt(abar)
    sig_cur, sig_next = sig[:-1], sig[1:]
    if ancestral:
        # k-diffusion get_ancestral_step with eta=1
        sig_up = np.minimum(
            sig_next,
            np.sqrt(
                np.clip(sig_next**2 * (sig_cur**2 - sig_next**2), 0.0, None)
            )
            / np.where(sig_cur > 0, sig_cur, 1.0),
        )
        sig_dn = np.sqrt(np.clip(sig_next**2 - sig_up**2, 0.0, None))
    else:
        sig_up = np.zeros(steps)
        sig_dn = sig_next
    return Plan(
        timesteps=ts,
        ratio=(sqrt_ab[1:] / sqrt_ab[:-1]).astype(np.float32),
        c_eps=(sqrt_ab[1:] * (sig_dn - sig_cur)).astype(np.float32),
        c_noise=(sqrt_ab[1:] * sig_up).astype(np.float32),
        steps=steps,
    )


# plain Euler ignores eta entirely (c_noise == 0) — tells make_step_body
# not to draw a per-step latent noise tensor that would be multiplied by 0
USES_ETA = False


def plan(schedule: DiffusionSchedule, steps: int, eta: float = 0.0) -> Plan:
    """``eta`` is accepted for protocol compatibility and ignored — Euler
    is deterministic; the ancestral variant's noise scale is structural."""
    return _make_plan(schedule, steps, ancestral=False)


def step(x, eps, p: Plan, i, noise):
    r = jnp.asarray(p.ratio)[i]
    ce = jnp.asarray(p.c_eps)[i]
    cn = jnp.asarray(p.c_noise)[i]
    return r * x + ce * eps + cn * noise


def encode_vid2vid(
    schedule: DiffusionSchedule, latent, noise, strength: float, steps: int
):
    """q-sample the source at the plan's top rung. The ModelScope runner
    already shortens the plan by ``skip_steps = floor(steps*(1-strength))``
    (process_modelscope.py:143) before this is called, mirroring the
    DDIM_Gaussian vid2vid entry semantics (samplers_common.py:137-143)."""
    ts, _, _ = _levels(schedule, max(int(steps), 1))
    t_top = int(ts[0])
    sa = float(schedule.sqrt_alphas_cumprod[t_top])
    sb = float(schedule.sqrt_one_minus_alphas_cumprod[t_top])
    return sa * latent + sb * noise


class _AncestralVariant:
    """Registry adapter for "Euler a": same protocol, ancestral noise
    injected every non-terminal step (NEEDS_STEP_NOISE)."""

    NAME = "Euler a"
    FRAME_INPAINT_SUPPORT = False
    CFG_COMBINE = "full"
    NEEDS_STEP_NOISE = True
    Plan = Plan
    step = staticmethod(step)
    encode_vid2vid = staticmethod(encode_vid2vid)

    @staticmethod
    def plan(schedule, steps, eta=0.0):
        return _make_plan(schedule, steps, ancestral=True)


ancestral = _AncestralVariant()
