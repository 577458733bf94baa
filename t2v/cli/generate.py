"""Generation CLI — the framework's primary UX (replacing the reference's
Gradio tab role, per the north star's "stripped of Auto1111/gradio
entanglement"). Flags mirror the T2VArgs schema (args.py:219-236) plus the
VideoCrafter standalone CLI's extras (sample_text2video.py:165-255:
--ddp becomes --dp-shards over the jax mesh).

Usage:
  python -m t2v.cli.generate --model-dir /path/to/modelscope \\
      --prompt "a bunny in the forest" --frames 24 --steps 30
  python -m t2v.cli.generate --serve --port 7860      # WebAPI server
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("t2v.generate", description=__doc__)
    p.add_argument("--model-dir", help="ModelScope-layout model directory")
    p.add_argument("--model", default="<modelscope>", help="model name (general_utils.py:17-25 mapping)")
    p.add_argument("--model-type", default="ModelScope", choices=["ModelScope", "VideoCrafter"])
    p.add_argument("--prompt", default="")
    p.add_argument("--n-prompt", default="text, watermark, copyright, blurry, nsfw")
    from t2v.core.config import SAMPLER_NAMES

    p.add_argument("--sampler", default="DDIM_Gaussian", choices=list(SAMPLER_NAMES))
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--frames", type=int, default=24)
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--cfg-scale", type=float, default=17.0)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--eta", type=float, default=0.0)
    p.add_argument("--batch-count", type=int, default=1)
    # vid2vid
    p.add_argument("--vid2vid-input", help="source video for vid2vid")
    p.add_argument("--strength", type=float, default=0.75)
    p.add_argument("--vid2vid-start-frame", type=int, default=0)
    # img2vid inpainting
    p.add_argument("--inpainting-image")
    p.add_argument("--inpainting-frames", type=int, default=0)
    p.add_argument("--inpainting-weights", default='0:(t/max_i_f), "max_i_f":(1)')
    p.add_argument(
        "--cond-fps", type=int,
        help="frame rate to condition on (FPS-conditioned VideoCrafter "
        "models, reference sample_utils.py:65-71)",
    )
    p.add_argument(
        "--inpaint-mode", default="initial_only",
        choices=["initial_only", "progressive"],
        help="initial_only = reference parity (mask applied once to the "
        "start latents); progressive = per-step hardening re-blend (the "
        "behaviour the reference's dead inpaint_masking code intended)",
    )
    # lora
    p.add_argument("--lora", action="append", default=[], help=".safetensors stable-lora file (repeatable)")
    p.add_argument("--lora-alpha", type=float, default=1.0)

    p.add_argument(
        "--vc-sample-type", default="ddim", choices=["ddim", "ddpm", "dpm++ 2m"],
        help="VideoCrafter denoising chain (sample_utils.py:56-87)",
    )
    p.add_argument(
        "--uc-type", default=None, choices=["cfg_original", "cfg_ours"],
        help="VideoCrafter CFG variant (lvdm ddim.py:233-241); default is "
        "the standard uc + s*(c-uc)",
    )
    p.add_argument("--adapter-ckpt", help="T2I-Adapter checkpoint (VideoCrafter depth conditioning)")
    p.add_argument("--adapter-video", help="adapter input video: RGB when --depth-ckpt is given (depth computed in-pipeline), else precomputed depth maps")
    p.add_argument("--depth-ckpt", help="midas_v21_small checkpoint for in-pipeline depth-from-RGB (reference get_batch_depth)")

    p.add_argument("--embeddings-dir", help="textual-inversion embeddings directory (A1111 .pt/.safetensors)")
    p.add_argument(
        "--comma-padding-backtrack", type=int, default=20,
        help="A1111 opts.comma_padding_backtrack: move the tail after a "
        "comma to the next 75-token chunk when within N tokens (0 = off)",
    )
    p.add_argument(
        "--no-emphasis", action="store_true",
        help="disable (word:1.2) emphasis parsing (A1111 opts.enable_emphasis)",
    )
    p.add_argument(
        "--deep-cache", type=int, default=1, metavar="K",
        help="DeepCache acceleration: full UNet every K steps, cached deep "
        "trunk in between (txt2vid, DDIM samplers; 1 = exact/off)",
    )
    # output
    p.add_argument("--outdir")
    p.add_argument("--fps", type=int, default=15)
    p.add_argument("--crf", type=int, default=17)
    p.add_argument("--preset", default="slow")
    p.add_argument("--add-soundtrack", default="None", choices=["None", "File", "Init Video"])
    p.add_argument("--soundtrack-path", default="")
    p.add_argument("--skip-video-creation", action="store_true")
    p.add_argument("--upscale", action="store_true", help="upscale output frames (r_upscale_video)")
    p.add_argument("--upscale-factor", default="x2", choices=["x2", "x3", "x4"])
    p.add_argument("--upscale-model", default="realesr-animevideov3",
                   help="resampling flavor; 'bicubic' or Lanczos otherwise")
    p.add_argument("--interpolate", type=int, default=0, metavar="X",
                   help="optical-flow frame interpolation x-amount (0/1 = off)")
    p.add_argument("--slow-mo", type=int, default=0, metavar="AMT",
                   help="with --interpolate: slow motion by AMT instead of raising fps")
    # runtime
    p.add_argument("--fp32", action="store_true", help="fp32 weights (default bf16)")
    p.add_argument("--tiny", action="store_true", help="tiny random-weight model (smoke test, no checkpoints)")
    p.add_argument("--dp-shards", type=int, default=1, help="data-parallel sampling across devices")
    p.add_argument("--tp-shards", type=int, default=1,
                   help="tensor-parallel UNet sharding (Megatron attention/MLP split) — one video over many chips")
    p.add_argument("--sp-shards", type=int, default=1,
                   help="shard the frame axis across devices (long videos)")
    p.add_argument("--profile", help="write a jax profiler trace to this dir")
    # server mode
    p.add_argument("--serve", action="store_true", help="run the WebAPI instead")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--json", action="store_true", help="print result as JSON")
    p.add_argument(
        "--no-keep-in-vram", action="store_true",
        help="drop the pipeline cache after each run (reference keep-in-VRAM "
        "'None' setting) — mainly for the --serve mode",
    )
    p.add_argument(
        "--keep-in-vram", default=None,
        choices=["All", "Main Model Only", "None"],
        help="reference 3-state retention option (text2vid.py:93): 'Main "
        "Model Only' keeps the UNet warm but reloads VAE/CLIP per run; "
        "overrides --no-keep-in-vram",
    )
    return p


def main(argv=None) -> int:
    ns = build_parser().parse_args(argv)

    from t2v.core.compile_cache import enable_compile_cache

    enable_compile_cache()

    if ns.serve:
        try:
            import uvicorn

            from t2v.api.app import create_app

            uvicorn.run(create_app(), host=ns.host, port=ns.port)
        except ImportError:
            from t2v.api.stdlib_server import serve

            serve(host=ns.host, port=ns.port)
        return 0

    from t2v.core.config import T2VArgs, T2VOutputArgs
    from t2v.core.dtypes import Policy
    from t2v.pipeline.pipeline import ModelScopePipeline
    from t2v.pipeline.run import run

    args = T2VArgs(
        prompt=ns.prompt,
        n_prompt=ns.n_prompt,
        sampler=ns.sampler,
        steps=ns.steps,
        frames=ns.frames,
        seed=ns.seed,
        cfg_scale=ns.cfg_scale,
        width=ns.width,
        height=ns.height,
        eta=ns.eta,
        batch_count=ns.batch_count,
        do_vid2vid=bool(ns.vid2vid_input),
        vid2vid_input=ns.vid2vid_input,
        strength=ns.strength,
        vid2vid_startFrame=ns.vid2vid_start_frame,
        inpainting_image=ns.inpainting_image,
        inpainting_frames=ns.inpainting_frames,
        inpainting_weights=ns.inpainting_weights,
        cond_fps=ns.cond_fps,
        comma_padding_backtrack=ns.comma_padding_backtrack,
        enable_emphasis=not ns.no_emphasis,
        model_type=ns.model_type,
        model=ns.model,
    )
    out_args = T2VOutputArgs(
        skip_video_creation=ns.skip_video_creation,
        fps=ns.fps,
        ffmpeg_crf=ns.crf,
        ffmpeg_preset=ns.preset,
        add_soundtrack=ns.add_soundtrack,
        soundtrack_path=ns.soundtrack_path,
        r_upscale_video=ns.upscale,
        r_upscale_factor=ns.upscale_factor,
        r_upscale_model=ns.upscale_model,
        frame_interpolation_engine=("FILM" if ns.interpolate > 1 else "None"),
        frame_interpolation_x_amount=max(ns.interpolate, 1),
        frame_interpolation_slow_mo_enabled=ns.slow_mo > 0,
        frame_interpolation_slow_mo_amount=max(ns.slow_mo, 1),
    )

    policy = Policy.fp32() if ns.fp32 else Policy.bf16()
    pipe = None
    if ns.tiny:
        if ns.model_type == "VideoCrafter":
            from t2v.pipeline.videocrafter import VideoCrafterPipeline

            pipe = VideoCrafterPipeline.random_init()
        else:
            pipe = ModelScopePipeline.random_init()
    elif ns.model_dir and ns.model_type == "VideoCrafter":
        from t2v.pipeline.videocrafter import VideoCrafterPipeline

        if os.path.isdir(ns.model_dir):
            pipe = VideoCrafterPipeline.from_model_dir(ns.model_dir, policy=policy)
        else:
            pipe = VideoCrafterPipeline.from_checkpoint(ns.model_dir, policy=policy)
        for lora_path in ns.lora:  # LVDM lora_up/lora_down format
            skipped = pipe.load_lora(lora_path, ns.lora_alpha)
            print(f"merged LVDM LoRA {os.path.basename(lora_path)} (skipped {len(skipped)})")
    elif ns.model_dir:
        pipe = ModelScopePipeline.from_model_dir(ns.model_dir, policy)
        if ns.embeddings_dir and pipe.text_encoder is not None:
            loaded = pipe.text_encoder.embedding_db.load_dir(ns.embeddings_dir)
            if loaded:
                print(f"loaded textual-inversion embeddings: {', '.join(loaded)}")
        for lora_path in ns.lora:
            from t2v.io.safetensors_io import load_safetensors

            lora_sd, meta = load_safetensors(lora_path)
            # merges UNet AND the CLIP text tower (lora_webui.py:186-187)
            skipped = pipe.apply_stable_lora(lora_sd, ns.lora_alpha)
            n_skip = len(set(skipped["unet"]) & set(skipped["clip"]))
            print(f"merged LoRA {os.path.basename(lora_path)} (skipped {n_skip} modules)")

    if ns.profile:
        import jax

        jax.profiler.start_trace(ns.profile)

    result = run(
        args, out_args, pipe=pipe, outdir=ns.outdir,
        adapter_ckpt=ns.adapter_ckpt, adapter_video=ns.adapter_video,
        depth_ckpt=ns.depth_ckpt,
        dp_shards=ns.dp_shards, tp_shards=ns.tp_shards, sp_shards=ns.sp_shards,
        deep_cache_interval=ns.deep_cache,
        keep_in_vram=(
            ns.keep_in_vram
            if ns.keep_in_vram is not None
            else not ns.no_keep_in_vram
        ),
        inpaint_mode=ns.inpaint_mode,
        vc_sample_type=ns.vc_sample_type, vc_uc_type=ns.uc_type,
    )

    if ns.profile:
        import jax

        jax.profiler.stop_trace()

    if ns.json:
        print(json.dumps({"videos": result.videos, "infotexts": result.infotexts}))
    else:
        for v in result.videos:
            print(v)
    return 0


if __name__ == "__main__":
    sys.exit(main())
