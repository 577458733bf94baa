"""DPM-Solver++(2M) — multistep second-order ODE sampler (data prediction).

Beyond-reference addition (the reference ships DDIM_Gaussian / DDIM /
UniPC, samplers_common.py:89-93): DPM-Solver++ (Lu et al. 2022,
arXiv:2211.01095) is the de-facto fast sampler in SD tooling, commonly
run at ~2x fewer steps than DDIM. Measured on the full-scale real-layout
checkpoint (QUALITY.json): 10 DPM++ steps land 24.6 dB mean per-frame
PSNR / 0.909 SSIM from the exact 20-step DDIM_Gaussian output —
solver-trajectory divergence on the true architecture; the "matched
quality" framing is the paper's claim about perceptual quality, which
seeded weights cannot measure. The 2M variant is a pure two-step
linear multistep in half-logSNR space, which makes it a single
homogeneous ``lax.scan`` here (carry = (x, previous x0-prediction)) —
no warmup/tail segmentation like UniPC's order-3 machinery.

Update rule, stepping rung i -> i+1 with h_i = lam_{i+1} - lam_i > 0:
    D_i    = x0-prediction at rung i
    Dbar_0 = D_0                                   (first step: 1st order)
    Dbar_i = (1 + 1/(2 r_i)) D_i - 1/(2 r_i) D_{i-1},  r_i = h_{i-1}/h_i
    x_{i+1} = (sigma_{i+1}/sigma_i) x_i + alpha_{i+1} (1 - e^{-h_i}) Dbar_i

Continuous-time marginals follow the UniPC module's conventions
(t2v/diffusion/unipc.py: linspace rungs, interpolated discrete schedule),
so ``sampling._unipc_model_fn`` provides the x0-prediction wrapper for
eps/v/x0 model parameterizations unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from t2v.diffusion.schedules import DiffusionSchedule
from t2v.diffusion.unipc import _discrete_marginals

NAME = "DPM++ 2M"
FRAME_INPAINT_SUPPORT = False
CFG_COMBINE = "full"
MULTISTEP = True  # carries model-output history — own loop (see ``window``
# for the interrupt-capable chunked execution: the carry is just (x, prev_D))


@dataclass(frozen=True)
class Plan:
    """Rungs 0..steps (float64 host tables); model evals at rungs
    0..steps-1. ``alpha``/``sigma``/``t_input`` are length steps+1 for
    duck-compatibility with ``sampling._unipc_model_fn``."""

    t_input: np.ndarray  # model input times per rung
    alpha: np.ndarray  # marginal alpha_t per rung
    sigma: np.ndarray  # marginal sigma_t per rung
    sig_ratio: np.ndarray  # (steps,) sigma_{i+1}/sigma_i
    growth: np.ndarray  # (steps,) alpha_{i+1} * (1 - exp(-h_i))
    c_cur: np.ndarray  # (steps,) Dbar weight on D_i
    c_prev: np.ndarray  # (steps,) Dbar weight on D_{i-1}
    steps: int


def _karras_rungs(
    schedule: DiffusionSchedule, steps: int, t_T: float, t_0: float, rho: float = 7.0
) -> np.ndarray:
    """Karras et al. 2022 (arXiv:2206.00364 eq. 5) node spacing, expressed
    on the VP noise-to-signal ratio sigma/alpha = exp(-lambda): rho-7
    interpolation between the endpoint ratios, mapped back to continuous
    time by inverting the discrete schedule's lambda(t). Concentrates
    rungs at low noise, where the 2M update benefits most."""
    _, _, _, lam_ends = _discrete_marginals(schedule, np.array([t_T, t_0]))
    nsr = np.exp(-lam_ends)  # (at t_T, at t_0): max, min
    u = np.linspace(0.0, 1.0, steps + 1)
    ramp = (nsr[0] ** (1 / rho) + u * (nsr[1] ** (1 / rho) - nsr[0] ** (1 / rho))) ** rho
    lam_target = -np.log(ramp)
    # invert lambda(t): sample lambda on a fine t grid — lambda is
    # monotone DECREASING in t, and np.interp needs ascending xp, so
    # interpolate over the reversed grid
    t_grid = np.linspace(t_0, t_T, 4096)
    _, _, _, lam_grid = _discrete_marginals(schedule, t_grid)
    return np.interp(lam_target, lam_grid[::-1], t_grid[::-1])


def plan(
    schedule: DiffusionSchedule,
    steps: int,
    t_start: float | None = None,
    node_schedule: str = "uniform",
) -> Plan:
    N = schedule.num_timesteps
    t_0 = 1.0 / N
    t_T = 1.0 if t_start is None else float(t_start)
    if node_schedule == "karras":
        t_cont = _karras_rungs(schedule, steps, t_T, t_0)
    else:
        t_cont = np.linspace(t_T, t_0, steps + 1)
    _, alpha, sigma, lam = _discrete_marginals(schedule, t_cont)

    h = lam[1:] - lam[:-1]  # (steps,) > 0
    sig_ratio = sigma[1:] / sigma[:-1]
    growth = alpha[1:] * (1.0 - np.exp(-h))
    # multistep combination weights; step 0 falls back to first order
    c_cur = np.ones(steps)
    c_prev = np.zeros(steps)
    if steps > 1:
        r = h[:-1] / h[1:]  # r_i = h_{i-1}/h_i for i >= 1
        c_cur[1:] = 1.0 + 1.0 / (2.0 * r)
        c_prev[1:] = -1.0 / (2.0 * r)
    return Plan(
        t_input=(t_cont - 1.0 / N) * N,
        alpha=alpha,
        sigma=sigma,
        sig_ratio=sig_ratio,
        growth=growth,
        c_cur=c_cur,
        c_prev=c_prev,
        steps=steps,
    )


def encode_vid2vid(schedule: DiffusionSchedule, latent, noise, strength: float, steps: int):
    """q-sample at t=strength — same entry semantics as UniPC's
    (sampler.py:20-29)."""
    p = plan(schedule, steps, t_start=strength)
    a0, s0 = float(p.alpha[0]), float(p.sigma[0])
    return a0 * latent + s0 * noise


def _make_body(model_fn, p: Plan):
    t_in = jnp.asarray(p.t_input, jnp.float32)
    sig_ratio = jnp.asarray(p.sig_ratio, jnp.float32)
    growth = jnp.asarray(p.growth, jnp.float32)
    c_cur = jnp.asarray(p.c_cur, jnp.float32)
    c_prev = jnp.asarray(p.c_prev, jnp.float32)

    def body(carry, i):
        xc, d_prev = carry
        d = model_fn(xc, t_in[i], i)
        d_bar = c_cur[i] * d + c_prev[i] * d_prev
        xc = sig_ratio[i] * xc + growth[i] * d_bar
        return (xc, d), None

    return body


def sample(x, model_fn, p: Plan):
    """Run the full 2M loop: one homogeneous scan over the steps.

    model_fn(x, t_input, s) -> x0 ("data") prediction at rung s — the
    ``sampling._unipc_model_fn`` contract.
    """
    body = _make_body(model_fn, p)
    (x, _), _ = jax.lax.scan(body, (x, jnp.zeros_like(x)), jnp.arange(p.steps))
    return x


def window(x, d_prev, model_fn, p: Plan, start, n: int):
    """Run steps [start, start+n) carrying the 2M multistep state
    ``(x, previous x0-prediction)`` across windows — the interrupt-capable
    execution (reference cancellation semantics, samplers_common.py:48-52).
    ``d_prev`` starts as zeros (step 0's weights ignore it). The offset
    rides in the carry so every same-length window shares one jaxpr."""
    body = _make_body(model_fn, p)

    def chunk_body(carry, j):
        (xc, dp), off = carry
        (xc, dp), _ = body((xc, dp), off + j)
        return ((xc, dp), off), None

    ((x, d_prev), _), _ = jax.lax.scan(
        chunk_body, ((x, d_prev), jnp.asarray(start, jnp.int32)), jnp.arange(n)
    )
    return x, d_prev


class _KarrasVariant:
    """Registry adapter: same 2M solver over Karras rho-7 node spacing
    ("DPM++ 2M Karras", the standard pairing in SD tooling)."""

    NAME = "DPM++ 2M Karras"
    FRAME_INPAINT_SUPPORT = False
    CFG_COMBINE = "full"
    MULTISTEP = True
    Plan = Plan
    sample = staticmethod(sample)
    window = staticmethod(window)

    @staticmethod
    def plan(schedule, steps, t_start=None):
        return plan(schedule, steps, t_start, node_schedule="karras")

    @staticmethod
    def encode_vid2vid(schedule, latent, noise, strength, steps):
        p = plan(schedule, steps, t_start=strength, node_schedule="karras")
        return float(p.alpha[0]) * latent + float(p.sigma[0]) * noise


karras = _KarrasVariant()
