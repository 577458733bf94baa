"""DeepCache-style accelerated sampling (optional, opt-in).

Technique from the retrieved papers (PAPERS.md: "Cache Me if You Can —
block caching"; "Faster Diffusion — encoder reuse"): across adjacent
denoise steps the UNet's deep-trunk activations change slowly, so the full
network only needs to run every ``interval`` steps; in between, the cached
deep feature is combined with freshly computed shallow layers. Typical
settings (interval 2-3) cut UNet FLOPs ~40-60% — this is an
approximation, OFF by default (interval=1 is exact). Measured divergence
vs the exact 20-step chain on the full-scale real-layout checkpoint
(QUALITY.json, tools/quality.py): interval 2 = 33.9 dB mean per-frame
PSNR / 0.987 SSIM; interval 3 = 30.5 dB / 0.973.

Implementation: the scan carry is (x, deep_feature); a ``lax.cond`` picks
the full forward (also refreshing the cache) or the cached shallow pass.
Supports the single-state step-fn samplers (DDIM_Gaussian, DDIM, Euler,
Euler a).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from t2v.core import rng as rng_lib
from t2v.diffusion import ddim as ddim_mod
from t2v.diffusion import ddim_gaussian as gaussian_mod
from t2v.diffusion import euler as euler_mod
from t2v.diffusion import sampling as sampling_mod
from t2v.diffusion.schedules import DiffusionSchedule

_MODS = {
    "DDIM_Gaussian": gaussian_mod,
    "DDIM": ddim_mod,
    "Euler": euler_mod,
    "Euler a": euler_mod.ancestral,
}


def deepcache_plan(sampler_name: str, schedule: DiffusionSchedule, steps: int, eta: float):
    """(mod, plan) for a DeepCache-capable sampler. plan.steps is the true
    step count (plans may round up, e.g. DDIM with T % steps != 0)."""
    if sampler_name not in _MODS:
        raise ValueError(f"deepcache supports {list(_MODS)}, not {sampler_name}")
    mod = _MODS[sampler_name]
    return mod, mod.plan(schedule, steps, eta)


def make_deepcache_body(
    mod, p, apply_full, apply_cached, cond, uncond, guidance_scale, eta,
    key, interval: int, parameterization: str = "eps", schedule=None,
):
    """Scan body over carry (x, deep_feature)."""
    t_table = jnp.asarray(np.asarray(p.timesteps), jnp.float32)
    eta_key = rng_lib.stream(key, "ddim_eta")
    needs_noise = (
        eta > 0 and getattr(mod, "USES_ETA", True)
    ) or getattr(mod, "NEEDS_STEP_NOISE", False)
    convert = sampling_mod.make_out_to_eps(parameterization, schedule)
    # single home for the fused-CFG batching (sampling.py) — the
    # cached-apply path reuses exactly the eps_fn semantics
    _, model_in, to_eps = sampling_mod.make_cfg_batcher(
        cond, uncond, guidance_scale, mod.CFG_COMBINE
    )

    def body(carry, i):
        xc, feat = carry
        x2, tt, cc = model_in(xc, t_table[i], i)

        def full(_):
            out, new_feat = apply_full(x2, tt, cc)
            return out, new_feat.astype(feat.dtype)

        def cached(_):
            return apply_cached(x2, tt, cc, feat), feat

        out, feat = jax.lax.cond(i % interval == 0, full, cached, operand=None)
        eps = convert(to_eps(out), xc, t_table[i]).astype(jnp.float32)
        noise = (
            jax.random.normal(jax.random.fold_in(eta_key, i), xc.shape, xc.dtype)
            if needs_noise
            else jnp.zeros((), xc.dtype)
        )
        xc = mod.step(xc, eps, p, i, noise)
        return (xc, feat), None

    return body


def deepcache_feat0(apply_full, x, cond, uncond, guidance_scale, t_example=0.0):
    """Zero cache with the deep feature's shape, via an abstract full pass."""
    _, model_in, _ = sampling_mod.make_cfg_batcher(
        cond, uncond, guidance_scale, "full"
    )
    x2, tt, cc = model_in(x, t_example, 0)
    feat_aval = jax.eval_shape(apply_full, x2, tt, cc)[1]
    return jnp.zeros(feat_aval.shape, feat_aval.dtype)


def run_deepcache_window(body, x, feat, start, n: int):
    """Run steps [start, start+n); offset rides in the carry so same-length
    windows share one jaxpr (interrupt-capable execution)."""

    def win_body(carry, j):
        (xc, feat), off = carry
        (xc, feat), _ = body((xc, feat), off + j)
        return ((xc, feat), off), None

    ((x, feat), _), _ = jax.lax.scan(
        win_body, ((x, feat), jnp.asarray(start, jnp.int32)), jnp.arange(n)
    )
    return x, feat


def sample_loop_deepcache(
    apply_full,     # (x, t, ctx) -> (eps, deep_feature)
    apply_cached,   # (x, t, ctx, deep_feature) -> eps
    schedule: DiffusionSchedule,
    *,
    steps: int,
    shape: tuple[int, ...],
    cond,
    uncond=None,
    guidance_scale: float = 1.0,
    eta: float = 0.0,
    sampler_name: str = "DDIM_Gaussian",
    key: jax.Array | None = None,
    interval: int = 3,
    parameterization: str = "eps",
):
    """Returns the final x0 latent, like sampling.sample_loop (txt2vid)."""
    if key is None:
        key = rng_lib.key_for_seed(0)
    mod, p = deepcache_plan(sampler_name, schedule, steps, eta)
    x = rng_lib.latent_noise(key, shape).astype(jnp.float32)
    body = make_deepcache_body(
        mod, p, apply_full, apply_cached, cond, uncond, guidance_scale, eta,
        key, interval, parameterization, schedule,
    )
    feat0 = deepcache_feat0(apply_full, x, cond, uncond, guidance_scale)
    (x, _), _ = jax.lax.scan(body, (x, feat0), jnp.arange(p.steps))
    return x
