"""Profile one LoRA fine-tuning train step on the real TPU chip.

The reference's realistic single-accelerator training workflow is LoRA
fine-tuning (ddpm3d.py:1246-1345 LoRA-only param group; lvdm lora.py
injected modules) — full-params AdamW on the 1.4B UNet needs ~17 GB of
fp32 optimizer state and does not fit one v5e. This profiles the
TPU-native counterpart: ``make_lora_train_step`` (frozen bf16 base merged
functionally, rank-r adapters trained) at the 16-frame 256px latent
config, reports the device-trace category breakdown, and derives achieved
FLOP/s from the measured fwd-step FLOP count (docs/PERF.md: 14.3 TFLOP
per CFG-pair step at 24f — scaled to this batch, x3 for fwd+bwd).

Usage:
    python tools/profile_train.py [tag] [rank] [frames]

Artifacts: /tmp/t2v_profile_train_<tag>/ (trace).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

TAG = sys.argv[1] if len(sys.argv) > 1 else "cur"
RANK = int(sys.argv[2]) if len(sys.argv) > 2 else 16
FRAMES = int(sys.argv[3]) if len(sys.argv) > 3 else 16
TRACE = f"/tmp/t2v_profile_train_{TAG}"


def main() -> None:
    from t2v.core.compile_cache import enable_compile_cache
    from t2v.core.config import ModelScopeUNetConfig
    from t2v.core.dtypes import Policy
    from t2v.diffusion.schedules import DiffusionSchedule
    from t2v.models.modelscope_unet import UNetSD
    from t2v.parallel.mesh import MeshConfig, make_mesh
    from t2v.parallel.train import (
        init_train_state,
        make_lora_train_step,
        make_optimizer,
    )
    from t2v.pipeline.lora import init_lora, unet_module_index

    enable_compile_cache()

    cfg = ModelScopeUNetConfig()
    model = UNetSD(cfg=cfg, policy=Policy.bf16())
    H = W = 32  # 256px latents

    x = jnp.zeros((1, FRAMES, H, W, cfg.in_dim), jnp.bfloat16)
    t = jnp.zeros((1,), jnp.float32)
    ctx = jnp.zeros((1, 77, cfg.context_dim), jnp.bfloat16)

    t0 = time.time()
    print("init compile...", flush=True)
    params = jax.jit(model.init)(jax.random.key(0), x, t, ctx)
    jax.block_until_ready(params)
    print(f"init done in {time.time() - t0:.1f}s", flush=True)

    n_devs = len(jax.devices())
    mesh = make_mesh(MeshConfig(dp=n_devs, sp=1, tp=1))
    index = unet_module_index(cfg)
    lora0 = init_lora(params, index, RANK, jax.random.key(1))
    n_lora = sum(a.size for a in jax.tree.leaves(lora0))
    print(f"rank-{RANK} LoRA: {n_lora / 1e6:.1f}M trainable params", flush=True)

    opt = make_optimizer()
    state = init_train_state(lora0, opt, mesh)
    step_fn = make_lora_train_step(
        lambda p, xx, tt, cc: model.apply(p, xx, tt, cc),
        opt,
        DiffusionSchedule.linear_sd(cfg.num_timesteps),
        mesh,
        params,
        index,
    )

    def batch_for(i: int):
        k = jax.random.key(100 + i)
        return {
            "latents": jax.random.normal(k, x.shape, jnp.bfloat16),
            "context": jax.random.normal(k, ctx.shape, jnp.bfloat16),
        }

    t0 = time.time()
    print("train step compile...", flush=True)
    state, loss = step_fn(state, batch_for(0), jax.random.key(0))
    print(
        f"step compiled in {time.time() - t0:.1f}s loss={float(loss):.4f}",
        flush=True,
    )
    state, loss = step_fn(state, batch_for(1), jax.random.key(1))
    float(loss)  # value readback barrier (see verify skill)

    jax.profiler.start_trace(TRACE)
    for i in range(2, 5):
        state, loss = step_fn(state, batch_for(i), jax.random.key(i))
        float(loss)
    jax.profiler.stop_trace()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_unet import report

    report(TRACE, n_steps=3)
    # fwd FLOPs scale linearly in batch x frames from the measured
    # 14.3 TFLOP per (B=2, F=24) step; bwd of a conv/matmul net is ~2x fwd
    tflop = 3.0 * 14.3 * (1 * FRAMES) / (2 * 24)
    print(
        f"\nestimated step FLOPs ~ {tflop:.1f} TFLOP (fwd x3) — divide by "
        "the ms/step above for achieved TFLOP/s (v5e bf16 peak 197)"
    )


if __name__ == "__main__":
    main()
