"""Fine-tuning CLI: WebVid data → sharded diffusion training.

The reference's training machinery lives in the LVDM family
(ddpm3d.py:349-372 training_step, :885-922 p_losses, :1246-1345
optimizers, webvid.py dataset). This CLI drives the TPU-native
equivalent for either UNet family: clips are VAE-encoded on device,
captions text-encoded, and the jitted (dp, sp, tp)-sharded train step
(t2v/parallel/train.py) runs with XLA-inserted collectives. Checkpoints
save via orbax.

Usage:
  python -m t2v.cli.train --data-dir /data/webvid --model-dir /models/t2v \\
      --batch-size 8 --steps 1000 --save-every 200 --out ckpts/
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("t2v.train", description=__doc__)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--meta-path")
    p.add_argument("--model-dir", help="init from a ModelScope model dir (omit for random init)")
    p.add_argument(
        "--model-type", default="ModelScope", choices=["ModelScope", "VideoCrafter"],
        help="UNet family to train (the reference's training machinery is "
        "LVDM-side, ddpm3d.py:349-372; both families share the step here)",
    )
    p.add_argument("--vc-ckpt", help="VideoCrafter model.ckpt to fine-tune from")
    p.add_argument("--out", default="ckpts")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--frame-stride", type=int, default=1)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight-decay", type=float, default=1e-2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save-every", type=int, default=500)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--sp", type=int, default=1, help="sequence-parallel shards")
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel shards")
    p.add_argument("--tiny", action="store_true", help="tiny random model (smoke test)")
    p.add_argument(
        "--lora-rank", type=int, default=0,
        help="train a rank-r LoRA over attention/ff linears instead of full params; "
        "saves reference-compatible stable-lora .safetensors",
    )
    p.add_argument("--lora-alpha", type=float, default=1.0)
    p.add_argument(
        "--ema-decay", type=float, default=0.0,
        help="EMA shadow decay (e.g. 0.9999); 0 disables (full fine-tune only)",
    )
    p.add_argument(
        "--resume", nargs="?", const="auto", default=None,
        help="resume from a saved train state: a step_N dir, or bare "
        "--resume to pick the newest one under --out (full state: params, "
        "optimizer, EMA, step counter)",
    )
    p.add_argument(
        "--remat", action="store_true",
        help="gradient checkpointing: rematerialise the UNet forward in the "
        "backward pass (fits longer clips / larger batches)",
    )
    return p


def main(argv=None) -> int:
    ns = build_parser().parse_args(argv)

    from t2v.core.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from t2v.core.dtypes import Policy
    from t2v.data.webvid import WebVidDataset
    from t2v.io.orbax_io import save_native
    from t2v.parallel.mesh import MeshConfig, make_mesh
    from t2v.parallel.train import init_train_state, make_optimizer, make_train_step
    from t2v.pipeline.pipeline import ModelScopePipeline

    if ns.model_type == "VideoCrafter":
        from t2v.pipeline.videocrafter import VideoCrafterPipeline

        if ns.vc_ckpt:
            pipe = VideoCrafterPipeline.from_checkpoint(ns.vc_ckpt, policy=Policy.fp32())
        elif ns.tiny:
            pipe = VideoCrafterPipeline.random_init()
        else:
            from t2v.core.config import VAEConfig  # noqa: F401 (doc)
            from t2v.models.videocrafter_unet import VideoCrafterUNetConfig

            pipe = VideoCrafterPipeline.random_init(VideoCrafterUNetConfig())
    elif ns.tiny:
        pipe = ModelScopePipeline.random_init()
    elif ns.model_dir:
        pipe = ModelScopePipeline.from_model_dir(ns.model_dir, Policy.fp32())
    else:
        from t2v.core.config import ModelScopeUNetConfig

        pipe = ModelScopePipeline.random_init(ModelScopeUNetConfig())

    is_vc = ns.model_type == "VideoCrafter"
    unet_cfg = pipe.cfg if is_vc else pipe.unet_cfg
    clip_cfg = pipe.clip_cfg
    clip_params = pipe.clip_params if is_vc else pipe.text_encoder.params
    if is_vc:
        encode_caption = lambda c: jnp.asarray(pipe.encode_text([c]))
    else:
        encode_caption = lambda c: jnp.asarray(pipe.text_encoder.encode_line(c))[None]

    mesh = make_mesh(MeshConfig(dp=-1, sp=ns.sp, tp=ns.tp))
    opt = make_optimizer(ns.lr, ns.weight_decay)
    lora_index = None
    if ns.lora_rank > 0:
        if is_vc:
            raise SystemExit("--lora-rank training currently supports ModelScope only")
        from t2v.parallel.train import make_lora_train_step
        from t2v.pipeline.lora import init_lora, unet_module_index

        lora_index = unet_module_index(unet_cfg)
        lora0 = init_lora(
            pipe.unet_params, lora_index, ns.lora_rank, jax.random.key(ns.seed)
        )
        state = init_train_state(lora0, opt, mesh)
        step_fn = make_lora_train_step(
            pipe.unet.apply, opt, pipe.schedule, mesh,
            pipe.unet_params, lora_index, alpha=ns.lora_alpha,
            parameterization=unet_cfg.parameterization,
        )
    else:
        state = init_train_state(
            pipe.unet_params, opt, mesh, with_ema=ns.ema_decay > 0
        )
        step_fn = make_train_step(
            pipe.unet.apply, opt, pipe.schedule, mesh,
            ema_decay=ns.ema_decay or None, remat=ns.remat,
            parameterization=unet_cfg.parameterization,
        )

    run_mode = {"lora_rank": ns.lora_rank, "ema": ns.ema_decay > 0}
    start_step = 0
    if ns.resume:
        from t2v.io.orbax_io import (
            latest_train_state,
            restore_train_state,
            train_state_mode,
        )

        resume_dir = (
            latest_train_state(ns.out) if ns.resume == "auto" else ns.resume
        )
        if resume_dir is None:
            raise SystemExit(f"--resume: no train state found under {ns.out}")
        saved_mode = train_state_mode(resume_dir)
        if saved_mode and saved_mode != run_mode:
            raise SystemExit(
                f"--resume: {resume_dir} was saved by a run with "
                f"{saved_mode}, incompatible with this run's {run_mode} "
                "(match --lora-rank/--ema-decay or start fresh)"
            )
        state = restore_train_state(resume_dir, state)
        start_step = int(state.step)
        print(f"resumed from {resume_dir} at step {start_step}")
        if start_step >= ns.steps:
            print(f"already at step {start_step} >= --steps {ns.steps}; nothing to do")
            return 0

    ds = WebVidDataset(
        ns.data_dir,
        ns.meta_path,
        video_length=ns.frames,
        resolution=(ns.resolution, ns.resolution),
        frame_stride=ns.frame_stride,
        # a resumed run draws from a re-seeded shuffle rather than replaying
        # the clips/crops the first run already consumed (exact stream
        # continuation would need dataset-position checkpointing)
        seed=ns.seed + start_step,
    )
    print(f"dataset: {len(ds)} clips; mesh {mesh.devices.shape}")

    key = jax.random.key(ns.seed)
    # distinct diffusion noise/timesteps after a resume
    if start_step:
        key = jax.random.fold_in(key, start_step)
    step = start_step
    t0 = time.time()
    for frames, captions in ds.batches(ns.batch_size, epochs=10**6):
        latents = jnp.concatenate(
            [pipe.compute_latents(f) for f in frames], axis=0
        )
        context = jnp.concatenate([encode_caption(c) for c in captions], axis=0)
        batch = {"latents": latents, "context": context}
        key, sub = jax.random.split(key)
        with mesh:
            state, loss = step_fn(state, batch, sub)
        step += 1
        if step % ns.log_every == 0:
            loss_v = float(loss)
            dt = time.time() - t0
            print(f"step {step} loss {loss_v:.4f} ({ns.log_every / dt:.2f} it/s)")
            t0 = time.time()
        if step % ns.save_every == 0 or step >= ns.steps:
            from t2v.io.orbax_io import save_train_state

            if ns.lora_rank > 0:
                from t2v.pipeline.lora import save_stable_lora

                os.makedirs(ns.out, exist_ok=True)
                out = f"{ns.out}/lora_step_{step}.safetensors"
                save_stable_lora(
                    out,
                    jax.device_get(state.params),
                    metadata={"rank": ns.lora_rank, "alpha": ns.lora_alpha, "step": step},
                )
            else:
                out = f"{ns.out}/step_{step}"
                tok = pipe.tokenizer if is_vc else pipe.text_encoder.tokenizer
                save_native(
                    out,
                    unet_params=jax.device_get(
                        state.ema_params if state.ema_params is not None else state.params
                    ),
                    vae_params=jax.device_get(pipe.vae_params),
                    clip_params=jax.device_get(clip_params),
                    unet_cfg=unet_cfg,
                    vae_cfg=pipe.vae_cfg,
                    clip_cfg=clip_cfg,
                    model_family="videocrafter" if is_vc else "modelscope",
                    tokenizer_vocab=getattr(tok, "source_path", None),
                    cond_stage2_params=(
                        jax.device_get(pipe.cond_stage2_params)
                        if getattr(pipe, "cond_stage2_params", None) is not None
                        else None
                    ),
                )
            # full state (params + optimizer + EMA + step) for --resume.
            # LoRA runs use a distinct dir name: a train-state-only step_N/
            # would look like a generation checkpoint to `generate
            # --model-dir` but carry no t2v_native.json
            state_dir = (
                f"{ns.out}/lora_state_{step}" if ns.lora_rank > 0
                else f"{ns.out}/step_{step}"
            )
            save_train_state(state_dir, state, mode=run_mode)
            print(f"saved {out}")
        if step >= ns.steps:
            break
    return 0


if __name__ == "__main__":
    sys.exit(main())
