"""Benchmark: seconds per 24-frame 256x256 ModelScope video (DDIM-20).

Runs the full denoise loop (20 DDIM_Gaussian steps, fused-CFG batch of 2)
on the real 1.7B UNetSD config in bf16, plus the frame-batched VAE decode,
on one TPU chip. Random weights — identical FLOP/memory profile to real
checkpoints.

Baseline context (BASELINE.md): the reference publishes no throughput;
target is a 24f/256px/20-step video in <4 s on a v5e-8. We report one
chip's wall time; ``vs_baseline`` is (4 s x 8 chips) / measured — i.e. 1.0
means exactly on-target assuming linear dp scaling, >1 beats it.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

FRAMES = 24
STEPS = 20
H = W = 256
BASELINE_CHIP_SECONDS = 4.0 * 8


def main() -> None:
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

    x = jnp.zeros((1, FRAMES, lat_h, lat_w, cfg.in_dim), jnp.bfloat16)
    t = jnp.zeros((1,), jnp.float32)
    ctx = jnp.zeros((1, 77, cfg.context_dim), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.key(0), x, t, ctx)

    schedule = DiffusionSchedule.linear_sd(cfg.num_timesteps)
    cond = jnp.zeros((1, 77, cfg.context_dim), jnp.bfloat16)
    uncond = jnp.ones((1, 77, cfg.context_dim), jnp.bfloat16) * 0.01

    @jax.jit
    def denoise(params, key):
        def apply_fn(xx, tt, cc):
            return model.apply(params, xx, tt, cc)

        return sample_loop(
            apply_fn,
            schedule,
            steps=STEPS,
            shape=(1, FRAMES, lat_h, lat_w, cfg.in_dim),
            cond=cond,
            uncond=uncond,
            guidance_scale=9.0,
            sampler_name="DDIM_Gaussian",
            key=key,
        )

    vae = AutoencoderKL(cfg=VAEConfig(), policy=policy)
    z_example = jnp.zeros((FRAMES, lat_h, lat_w, 4), jnp.bfloat16)
    vae_params = jax.jit(vae.init)(jax.random.key(1), z_example[:1, :8, :8, :3])

    @jax.jit
    def decode(vae_params, z):
        frames = vae.apply(vae_params, z / 0.18215, method=AutoencoderKL.decode)
        # scalar rides out of the SAME executable: float()ing it is the
        # completion barrier (no extra eager dispatch through the tunnel)
        return frames, jnp.float32(frames.sum())

    # warmup / compile. NOTE: through the axon tunnel block_until_ready()
    # can ack before the device work completes — only an actual value
    # readback (float()) is a reliable barrier (see
    # .claude/skills/verify/SKILL.md).
    key = jax.random.key(42)
    z = denoise(params, key)
    _, s = decode(vae_params, z[0])
    float(s)

    times = []
    for i in range(3):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        z = denoise(params, k)
        _, s = decode(vae_params, z[0])
        float(s)
        times.append(time.perf_counter() - t0)

    sec = min(times)
    print(
        json.dumps(
            {
                "metric": "sec_per_24f_256px_video_ddim20_1chip",
                "value": round(sec, 4),
                "unit": "s",
                "vs_baseline": round(BASELINE_CHIP_SECONDS / sec, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
