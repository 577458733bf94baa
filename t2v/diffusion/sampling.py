"""Sampler registry and the scan-compiled sampling driver.

Replaces the reference's ``Txt2VideoSampler`` / ``SamplerBase`` machinery
(samplers_common.py:71-207) with pure functions:

  * the registry keys are the public sampler names
    ``DDIM_Gaussian | DDIM | UniPC`` (samplers_common.py:89-93);
  * classifier-free guidance is *fused*: one model forward on the
    ``[uncond; cond]`` doubled batch per step, instead of the reference's two
    sequential forwards (gaussian_sampler.py:161-164, ddim sampler.py:181-185);
  * the step loop is a single ``jax.lax.scan`` (UniPC: scan over its
    homogeneous middle), optionally chunked to poll an interrupt callback —
    the TPU equivalent of the reference's cooperative
    ``state.interrupted`` checks (samplers_common.py:48-52);
  * prompt-editing ("scheduled") conditionings are per-step tables indexed
    inside the scan, replacing per-step ``reconstruct_cond_batch``
    (general_utils.py:27-30).

Latent layout is video-NHWC: ``(B, F, H, W, C)``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from t2v.core import rng as rng_lib
from t2v.diffusion import ddim as ddim_mod
from t2v.diffusion import ddim_gaussian as gaussian_mod
from t2v.diffusion import dpmpp as dpmpp_mod
from t2v.diffusion import euler as euler_mod
from t2v.diffusion import unipc as unipc_mod
from t2v.diffusion.schedules import DiffusionSchedule


@dataclass(frozen=True)
class SamplerSpec:
    name: str
    module: Any

    @property
    def frame_inpaint_support(self) -> bool:
        # single source of truth: the module flag make_step_body gates on
        return bool(getattr(self.module, "FRAME_INPAINT_SUPPORT", False))


available_samplers: tuple[SamplerSpec, ...] = (
    SamplerSpec("DDIM_Gaussian", gaussian_mod),
    SamplerSpec("DDIM", ddim_mod),
    SamplerSpec("UniPC", unipc_mod),
    # beyond-reference: second-order multistep ODE sampler (dpmpp.py),
    # uniform and Karras rho-7 node spacings
    SamplerSpec("DPM++ 2M", dpmpp_mod),
    SamplerSpec("DPM++ 2M Karras", dpmpp_mod.karras),
    # beyond-reference: k-diffusion Euler pair (euler.py) — single-state,
    # so both window (interrupt) and DeepCache execution apply
    SamplerSpec("Euler", euler_mod),
    SamplerSpec("Euler a", euler_mod.ancestral),
)


def get_sampler(name: str) -> SamplerSpec:
    for s in available_samplers:
        if s.name == name:
            return s
    raise ValueError(f"Sampler {name} does not exist.")


def _cond_at(cond, step):
    """Index a scheduled cond table.

    cond: (B, L, D) static or (S, B, L, D) per-step table.
    """
    if cond.ndim == 4:
        return jax.lax.dynamic_index_in_dim(
            cond, jnp.minimum(step, cond.shape[0] - 1), axis=0, keepdims=False
        )
    return cond


def cfg_combine(y, u, scale, mode: str):
    """Classifier-free guidance combine over the channel (last) axis.

    mode="full": u + s*(y-u) on all channels (ddim sampler.py:185, unipc).
    mode="split_learned_range": guidance on the first C//2 channels only,
    the rest copied from the conditional branch — the DDIM_Gaussian
    behaviour inherited from guided-diffusion's learned-variance splitting
    (gaussian_sampler.py:99-101,128-136).
    mode="cfg_original" / "cfg_ours": the LVDM DDIM uc_type variants
    (lvdm ddim.py:233-241): y + s*(y-u) and y + s*(u-y).
    """
    if mode == "full":
        return u + scale * (y - u)
    if mode == "split_learned_range":
        d = y.shape[-1] // 2
        guided = u[..., :d] + scale * (y[..., :d] - u[..., :d])
        return jnp.concatenate([guided, y[..., d:]], axis=-1)
    if mode == "cfg_original":
        return y + scale * (y - u)
    if mode == "cfg_ours":
        return y + scale * (u - y)
    raise ValueError(mode)


def make_out_to_eps(
    parameterization: str | None, schedule: DiffusionSchedule | None
) -> Callable:
    """Model-output → eps conversion for non-eps parameterizations.

    Mirrors the reference DDIM hooks (sampler.py:183-206 /
    ddpm3d.py predict_eps_from_z_and_v): with discrete timestep t,
    ``v``: eps = √ᾱ_t·v + √(1-ᾱ_t)·x;  ``x0``: eps = (x - √ᾱ_t·x0)/√(1-ᾱ_t).
    Learned-variance extra channels (out wider than x) pass through
    unconverted. Returns convert(out, x, t) with scalar integer-valued t.
    """
    if parameterization in (None, "eps"):
        return lambda out, x, t: out
    if parameterization not in ("v", "x0"):
        raise ValueError(f"parameterization {parameterization!r}")
    if schedule is None:
        raise ValueError("non-eps parameterization needs the schedule")
    sa = jnp.asarray(schedule.sqrt_alphas_cumprod)
    s1ma = jnp.asarray(schedule.sqrt_one_minus_alphas_cumprod)

    def convert(out, x, t):
        ti = jnp.asarray(t, jnp.int32)
        a, b = sa[ti], s1ma[ti]
        c = x.shape[-1]
        mean, rest = out[..., :c], out[..., c:]
        if parameterization == "v":
            eps = a * mean + b * x
        else:  # x0
            eps = (x - a * mean) / b
        if rest.shape[-1]:
            eps = jnp.concatenate([eps, rest], axis=-1)
        return eps

    return convert


def make_eps_fn(
    apply_fn: Callable,
    cond,
    uncond,
    guidance_scale: float,
    combine: str,
    parameterization: str = "eps",
    schedule: DiffusionSchedule | None = None,
) -> Callable:
    """Build eps_fn(x, t, step) with fused-CFG batching.

    apply_fn(x, t, context) -> model output, x: (B, F, H, W, C), t: (B,).

    ``parameterization`` follows the model's prediction target
    (configuration.json ``mean_type`` / LVDM ``parameterization``). The
    reference combines CFG on raw model outputs and then converts
    (sampler.py:181-206); all CFG modes here are affine with weights
    summing to 1 and the conversions are affine in (out, x), so
    converting the combined output is identical.
    """
    _, model_in, combine_out = make_cfg_batcher(
        cond, uncond, guidance_scale, combine
    )
    convert = make_out_to_eps(parameterization, schedule)

    def eps_fn(x, t, step):
        x2, t2, ctx2 = model_in(x, t, step)
        return convert(combine_out(apply_fn(x2, t2, ctx2)), x, t)

    return eps_fn


def make_cfg_batcher(cond, uncond, guidance_scale, combine: str):
    """(do_cfg, model_in, combine_out): the fused-CFG batching shared by
    ``make_eps_fn`` and the DeepCache body (deepcache.py) — ONE home for
    the unconditional predicate and the concat/split/cfg_combine logic so
    the two paths cannot drift (round-4 review)."""
    do_cfg = not (
        uncond is None or guidance_scale is None or guidance_scale == 1
    )

    def model_in(x, t, step):
        """x (B, ...), scalar t -> (x', t', ctx') with the [uncond; cond]
        pair batched in when CFG is active."""
        b = x.shape[0]
        c = _cond_at(cond, step)
        tt = jnp.full((b,), t, dtype=jnp.float32)
        if not do_cfg:
            return x, tt, c
        uc = _cond_at(uncond, step)
        return (
            jnp.concatenate([x, x], axis=0),
            jnp.concatenate([tt, tt], axis=0),
            jnp.concatenate([uc, c], axis=0),
        )

    def combine_out(out):
        if not do_cfg:
            return out
        u, y = jnp.split(out, 2, axis=0)
        return cfg_combine(y, u, guidance_scale, combine)

    return do_cfg, model_in, combine_out


def _inpaint_blend(x, step, steps, mask, image_latents, schedule_tables, t_cur, key):
    """Working progressive inpaint masking.

    The reference's per-step inpaint blend is dead code (its
    ``inpaint_masking`` rebinds a local and returns nothing,
    samplers_common.py:17-26) — inpainting there works only through the
    initial masked latents. This is the repaired semantics, enabled via
    ``inpaint_mode='progressive'``: keyframe weights harden into a binary
    mask over steps (v = (steps-step-1)/steps, keep where mask > v) and
    masked-out regions are re-noised from the *source image* latents.
    """
    sqrt_a, sqrt_1ma = schedule_tables
    v = (steps - step - 1.0) / steps
    binary = (mask > v).astype(x.dtype)
    noise = jax.random.normal(key, x.shape, x.dtype)
    renoised = sqrt_a[t_cur] * image_latents + sqrt_1ma[t_cur] * noise
    blended = renoised * (1.0 - binary) + x * binary
    # no blend on the final step (reference guard, samplers_common.py:18) —
    # re-noised regions would otherwise survive into the output
    return jnp.where(step < steps - 1, blended, x)


def _lvdm_mask_blend(x, mask, image_latents, schedule_tables, t_next, key):
    """LVDM DDIM static mask blend (lvdm ddim.py:188-195): after each
    update, known regions are re-imposed as q_sample(x0, t) — mask=1 KEEPS
    the source (opposite polarity to the ModelScope progressive mask)."""
    sqrt_a, sqrt_1ma = schedule_tables
    noise = jax.random.normal(key, x.shape, x.dtype)
    known = sqrt_a[t_next] * image_latents + sqrt_1ma[t_next] * noise
    m = mask.astype(x.dtype)
    return known * m + (1.0 - m) * x


def sample_loop(
    apply_fn: Callable,
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
    noise=None,
    latents=None,
    is_vid2vid: bool = False,
    strength: float = 1.0,
    mask=None,
    image_latents=None,
    inpaint_mode: str = "initial_only",  # "initial_only" (reference parity) | "progressive" | "lvdm_static"
    cfg_combine_mode: str | None = None,  # override (LVDM uc_type variants)
    parameterization: str = "eps",  # model prediction target: "eps"|"v"|"x0"
    callback: Callable[[int], None] | None = None,
    callback_interval: int | None = None,
    dtype=jnp.float32,
):
    """Uniform sampling entry — mirrors Txt2VideoSampler.sample_loop
    (samplers_common.py:165-207) for all three samplers.

    Returns the final denoised latent x0 of shape ``shape`` (B, F, H, W, C).
    """
    spec = get_sampler(sampler_name)
    mod = spec.module
    if key is None:
        key = rng_lib.key_for_seed(0)
    if noise is None:
        noise = rng_lib.latent_noise(key, shape, dtype)

    if getattr(mod, "MULTISTEP", False):
        # multistep samplers carry model-output history; own loops.
        # They hardcode full-channel CFG and take no frame-inpaint blend —
        # reject requests they would otherwise silently ignore (round-4
        # review). Windowed interrupt execution for these samplers lives
        # at the pipeline layer (pipeline.py / videocrafter.py), which
        # carries their (x, history) state across jitted windows;
        # ``callback`` here only fires at termination.
        if cfg_combine_mode not in (None, "full"):
            raise ValueError(
                f"sampler {sampler_name!r} supports only full-channel CFG "
                f"(cfg_combine_mode={cfg_combine_mode!r})"
            )
        # initial_only inpainting still works here (the masked start
        # rides in via ``latents``); only the in-loop blend modes need
        # the step body's mask support
        if mask is not None and inpaint_mode in ("progressive", "lvdm_static"):
            raise ValueError(
                f"sampler {sampler_name!r} does not support "
                f"{inpaint_mode!r} mask blending — use DDIM_Gaussian "
                "(progressive) or DDIM (lvdm_static)"
            )
        if latents is not None and is_vid2vid:
            x = mod.encode_vid2vid(schedule, latents, noise, strength, steps)
        elif latents is not None:
            x = latents
        else:
            x = noise
        x = x.astype(jnp.float32)
        t_start = strength if (is_vid2vid and strength is not None) else None
        p = mod.plan(schedule, steps, t_start=t_start)
        model_fn = _unipc_model_fn(
            apply_fn, cond, uncond, guidance_scale, p,
            parameterization=parameterization,
        )
        out = mod.sample(x, model_fn, p)
        if callback is not None:
            callback(steps)  # terminal progress like the other samplers
        return out

    mod, p, x = plan_and_start(
        schedule, steps=steps, shape=shape, eta=eta,
        sampler_name=sampler_name, key=key, noise=noise, latents=latents,
        is_vid2vid=is_vid2vid, strength=strength, dtype=dtype,
    )
    return _scan_simple(
        mod, p, x, apply_fn, cond, uncond, guidance_scale, key, eta,
        mask, image_latents, inpaint_mode, schedule, callback,
        callback_interval, cfg_combine_mode, parameterization,
    )


def _unipc_model_fn(
    apply_fn, cond, uncond, guidance_scale, p: unipc_mod.Plan,
    parameterization: str = "eps",
):
    """x0-("data")-prediction wrapper with full-channel CFG
    (uni_pc.py:296-311, 350-364). Non-eps model targets convert via the
    plan's continuous-time (α_t, σ_t), matching the reference
    model_wrapper's noise/x0/v modes (uni_pc.py:156-311):
    v: x0 = α_s·x - σ_s·v;  x0: identity."""
    out_fn = make_eps_fn(apply_fn, cond, uncond, guidance_scale, "full")
    alpha = jnp.asarray(p.alpha, jnp.float32)
    sigma = jnp.asarray(p.sigma, jnp.float32)

    def model_fn(x, t_input, s):
        out = out_fn(x, t_input, s)
        if parameterization == "x0":
            return out
        if parameterization == "v":
            return alpha[s] * x - sigma[s] * out
        return (x - sigma[s] * out) / alpha[s]

    return model_fn


def make_step_body(
    mod, p, apply_fn, cond, uncond, guidance_scale, key, eta,
    mask, image_latents, inpaint_mode, schedule, cfg_combine_mode=None,
    parameterization: str = "eps",
):
    """Build the per-step scan body(x, i) -> (x, None) shared by the
    monolithic scan and the windowed (interrupt-capable) execution."""
    eps_fn = make_eps_fn(
        apply_fn, cond, uncond, guidance_scale,
        cfg_combine_mode or mod.CFG_COMBINE,
        parameterization=parameterization, schedule=schedule,
    )
    steps = p.steps
    needs_noise = (
        eta > 0 and getattr(mod, "USES_ETA", True)
    ) or getattr(mod, "NEEDS_STEP_NOISE", False)
    progressive = (
        inpaint_mode == "progressive"
        and mask is not None
        and image_latents is not None
        and mod.FRAME_INPAINT_SUPPORT
    )
    lvdm_static = (
        inpaint_mode == "lvdm_static"
        and mask is not None
        and image_latents is not None
    )
    t_table = jnp.asarray(np.asarray(p.timesteps), jnp.float32)
    if progressive or lvdm_static:
        sched_tables = (
            jnp.asarray(schedule.sqrt_alphas_cumprod),
            jnp.asarray(schedule.sqrt_one_minus_alphas_cumprod),
        )
        t_int = jnp.asarray(np.asarray(p.timesteps), jnp.int32)

    eta_key = rng_lib.stream(key, "ddim_eta")
    inpaint_key = rng_lib.stream(key, "inpaint_noise")

    def body(x, i):
        eps = eps_fn(x, t_table[i], i)
        step_noise = (
            jax.random.normal(jax.random.fold_in(eta_key, i), x.shape, x.dtype)
            if needs_noise
            else jnp.zeros((), x.dtype)
        )
        x = mod.step(x, eps, p, i, step_noise)
        if progressive:
            x = _inpaint_blend(
                x, i, steps, mask, image_latents, sched_tables, t_int[i],
                jax.random.fold_in(inpaint_key, i),
            )
        elif lvdm_static:
            # reference blends at t = step-1 where step is the CURRENT
            # timestep value (lvdm ddim.py:193)
            t_blend = jnp.maximum(t_int[i] - 1, 0)
            x = _lvdm_mask_blend(
                x, mask, image_latents, sched_tables, t_blend,
                jax.random.fold_in(inpaint_key, i),
            )
        return x, None

    return body


def run_window(body, x, start, n: int):
    """Run steps [start, start+n) of a plan on state x. The offset rides in
    the carry so every same-length window shares one jaxpr."""

    def chunk_body(carry, j):
        xc, off = carry
        xc, _ = body(xc, off + j)
        return (xc, off), None

    (x, _), _ = jax.lax.scan(
        chunk_body, (x, jnp.asarray(start, jnp.int32)), jnp.arange(n)
    )
    return x


def _scan_simple(
    mod, p, x, apply_fn, cond, uncond, guidance_scale, key, eta,
    mask, image_latents, inpaint_mode, schedule, callback, callback_interval,
    cfg_combine_mode=None, parameterization: str = "eps",
):
    """lax.scan driver for the single-state samplers (DDIM_Gaussian, DDIM)."""
    body = make_step_body(
        mod, p, apply_fn, cond, uncond, guidance_scale, key, eta,
        mask, image_latents, inpaint_mode, schedule, cfg_combine_mode,
        parameterization,
    )
    steps = p.steps

    if callback is None or callback_interval is None:
        x, _ = jax.lax.scan(body, x, jnp.arange(steps))
        if callback is not None:
            callback(steps)
        return x

    # chunked execution: return to host between chunks so a cooperative
    # interrupt (reference state.interrupted, samplers_common.py:48-52)
    # can stop the loop.
    done = 0
    while done < steps:
        n = min(callback_interval, steps - done)
        x = run_window(body, x, done, n)
        x.block_until_ready()
        done += n
        callback(done)  # raises to interrupt
    return x


def plan_and_start(
    schedule: DiffusionSchedule,
    *,
    steps: int,
    shape: tuple[int, ...],
    eta: float = 0.0,
    sampler_name: str = "DDIM_Gaussian",
    key: jax.Array | None = None,
    noise=None,
    latents=None,
    is_vid2vid: bool = False,
    strength: float = 1.0,
    dtype=jnp.float32,
):
    """The pre-loop part of ``sample_loop``: resolve the sampler module,
    build its plan (truncated for vid2vid), and produce the starting state.
    Lets callers drive the step loop themselves via ``make_step_body`` +
    ``run_window`` (e.g. jitted windows with params as a real argument)."""
    spec = get_sampler(sampler_name)
    mod = spec.module
    if getattr(mod, "MULTISTEP", False):
        raise ValueError(f"windowed execution does not support {mod.NAME}")
    if key is None:
        key = rng_lib.key_for_seed(0)
    if noise is None:
        noise = rng_lib.latent_noise(key, shape, dtype)
    if latents is not None and is_vid2vid:
        if mod is ddim_mod:
            p_full = ddim_mod.plan(schedule, steps, eta)
            t_enc = int(strength * steps)
            x = ddim_mod.stochastic_encode(p_full, latents, noise, t_enc)
            return mod, ddim_mod.truncate_for_vid2vid(p_full, t_enc), x.astype(jnp.float32)
        x = mod.encode_vid2vid(schedule, latents, noise, strength, steps)
    elif latents is not None:
        x = latents
    else:
        x = noise
    return mod, mod.plan(schedule, steps, eta), x.astype(jnp.float32)
