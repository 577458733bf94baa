"""Benchmark suite: every tracked config from BASELINE.md, on the real chip.

Extends bench.py (the driver-facing single number) to the full tracked
matrix so README's table regenerates from driver runs instead of hand-kept
claims. All rows go through the PRODUCTION pipeline entry points
(``ModelScopePipeline.infer`` / ``VideoCrafterPipeline.infer``), so
behaviour like the vid2vid ``skip_steps`` truncation
(process_modelscope.py:143; pipeline.py ``steps = args.steps -
skip_steps``) is actually measured — the round-3 suite called the raw
``sample_loop`` and silently re-measured the full 20-step plan for every
row.

Rows:
  * txt2vid at the benchmark shape (24f/256px/20 steps) for each sampler —
    DDIM_Gaussian, DDIM, UniPC, DPM++ 2M, Euler a;
  * vid2vid (strength 0.75 → skip_steps=5, a 15-step denoise);
  * masked img2vid inpainting (initial_only, reference parity mode);
  * DeepCache x2 txt2vid (pipeline execution path);
  * long-context 125f/256px txt2vid (BASELINE.md tracked);
  * long-context 250f/256px txt2vid (BASELINE.md tracked — 16 s of video
    in one denoise; the temporal-conv chain at this shape exceeds every
    Mosaic-legal VMEM tiling so blocks.py routes it to the XLA
    formulation, measured here through the same production path);
  * ZeroScope-shape 1024x576/24f txt2vid (BASELINE.md tracked — same
    1.7B topology, hi-res latents);
  * VideoCrafter 16f/256px DDIM (BASELINE.md tracked).

The round-3/4 ``vid2vid_s075_lora16`` row was dropped (round-4 verdict
weak #6): a stable-LoRA merge swaps weight VALUES into the already-cached
executable, so the row was FLOP-identical to ``vid2vid_s075`` and its
~1.7% delta carried no information. The executable-reuse property it
nominally witnessed is asserted directly by
tests/test_lora_train.py / test_real_checkpoint.py.

Methodology per .claude/skills/verify/SKILL.md: time the full infer()
call (text encode is line-cached after warmup; the numpy frame decode is
the value-readback barrier), varied seed per run so the axon tunnel can't
dedupe, min over runs, compile excluded by an untimed warmup call.

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

import numpy as np

FRAMES, STEPS, H, W = 24, 20, 256, 256


def _time_infer(pipe, args_for_run, runs: int, **infer_kw) -> float:
    """Warmup (compile) + ``runs`` timed calls with varied seeds."""
    from t2v.core.config import T2VArgs  # noqa: F401  (typing aid)

    pipe.infer(args_for_run.replace(seed=999983), **infer_kw)  # warmup/compile
    times = []
    for i in range(runs):
        a = args_for_run.replace(seed=1000 + i)
        t0 = time.perf_counter()
        res = pipe.infer(a, **infer_kw)
        # decode_latents inside infer() returned numpy frames — a real
        # value readback; touch one anyway so the barrier is explicit
        _ = int(np.asarray(res.frames[0]).sum())
        times.append(time.perf_counter() - t0)
    return round(min(times), 4)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_SUITE.json")
    ap.add_argument("--only", default=None)
    ap.add_argument(
        "--tiny", action="store_true",
        help="CPU smoke mode: tiny configs/shapes, exercises every row's "
        "code path without the chip (numbers are meaningless)",
    )
    ns = ap.parse_args()

    global FRAMES, STEPS, H, W

    from t2v.core.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from t2v.core import rng as rng_lib
    from t2v.core.config import ModelScopeUNetConfig, T2VArgs
    from t2v.core.dtypes import Policy
    from t2v.pipeline.pipeline import ModelScopePipeline, _spatial_scale

    policy = Policy.bf16()
    if ns.tiny:
        jax.config.update("jax_platforms", "cpu")
        FRAMES, STEPS = 4, 4
        cfg = ModelScopeUNetConfig().tiny()
        pipe = ModelScopePipeline.random_init(cfg, policy=policy)
        H = W = 16 * _spatial_scale(pipe.vae_cfg)
    else:
        cfg = ModelScopeUNetConfig()
        pipe = ModelScopePipeline.random_init(cfg, policy=policy)

    base = T2VArgs(
        prompt="a photo of an astronaut riding a horse on mars, cinematic",
        n_prompt="text, watermark, blurry",
        steps=STEPS, frames=FRAMES, width=W, height=H,
        sampler="DDIM_Gaussian", cfg_scale=9.0, seed=1,
    )

    ss = _spatial_scale(pipe.vae_cfg)
    lat = (1, FRAMES, H // ss, W // ss, 4)
    src_latents = rng_lib.latent_noise(jax.random.key(9), lat) * 0.3
    # vid2vid truncation exactly as run() computes it (run.py::_prepare_vid2vid)
    import math

    strength = 0.75
    skip_steps = int(math.floor(STEPS * max(0.0, min(1.0 - strength, 1.0))))
    assert ns.tiny or skip_steps == 5, skip_steps

    inp_mask = jnp.asarray(
        (np.arange(FRAMES) < 8).astype(np.float32)[None, :, None, None, None]
        * np.ones(lat, np.float32)
    )
    masked_init = src_latents * (1 - inp_mask) + rng_lib.latent_noise(
        jax.random.key(11), lat
    ) * inp_mask

    # partial re-runs (--only) merge into an existing artifact instead of
    # clobbering the rows they skip
    results: dict[str, float] = {}
    meta: dict[str, dict] = {}
    if ns.only is not None and os.path.exists(ns.out):
        with open(ns.out) as f:
            prev = json.load(f)
        results.update(prev.get("results", {}))
        meta.update(prev.get("shapes", {}))

    def record(name: str, seconds: float, **shape):
        results[name] = seconds
        meta[name] = shape
        print(json.dumps({"config": name, "seconds": seconds, **shape}), flush=True)
        with open(ns.out, "w") as f:
            json.dump(
                {"metric": "sec_per_video_1chip",
                 "frames": FRAMES, "px": H, "steps": STEPS,
                 "results": results, "shapes": meta}, f, indent=2,
            )
            f.write("\n")

    def wants(name: str) -> bool:
        return ns.only is None or name in ns.only.split(",")

    shape24 = dict(frames=FRAMES, px=H, steps=STEPS)
    for sampler in ("DDIM_Gaussian", "DDIM", "UniPC", "DPM++ 2M", "Euler a"):
        name = f"txt2vid_{sampler.lower().replace(' ', '_').replace('+', 'p')}"
        if not wants(name):
            continue
        record(name, _time_infer(pipe, base.replace(sampler=sampler), 3), **shape24)

    if wants("vid2vid_s075"):
        record(
            "vid2vid_s075",
            _time_infer(
                pipe, base.replace(strength=strength), 3,
                latents=src_latents, skip_steps=skip_steps, is_vid2vid=True,
            ),
            **dict(shape24, steps=STEPS - skip_steps),
        )

    if wants("inpaint_initial_only"):
        record(
            "inpaint_initial_only",
            _time_infer(
                pipe, base.replace(strength=1.0), 3,
                latents=masked_init, mask=inp_mask, image_latents=src_latents,
                inpaint_mode="initial_only",
            ),
            **shape24,
        )

    if wants("txt2vid_deepcache2"):
        record(
            "txt2vid_deepcache2",
            _time_infer(pipe, base, 3, deep_cache_interval=2),
            **shape24,
        )

    if wants("txt2vid_125f"):
        long_f = 8 if ns.tiny else 125
        record(
            "txt2vid_125f",
            _time_infer(pipe, base.replace(frames=long_f), 2),
            frames=long_f, px=H, steps=STEPS,
        )

    if wants("txt2vid_250f"):
        long_f = 10 if ns.tiny else 250
        record(
            "txt2vid_250f",
            _time_infer(pipe, base.replace(frames=long_f), 2),
            frames=long_f, px=H, steps=STEPS,
        )

    if wants("txt2vid_zeroscope_1024x576"):
        zw, zh = (2 * W, H) if ns.tiny else (1024, 576)
        record(
            "txt2vid_zeroscope_1024x576",
            _time_infer(pipe, base.replace(width=zw, height=zh), 2),
            frames=FRAMES, px=f"{zw}x{zh}", steps=STEPS,
        )

    if wants("videocrafter_16f"):
        from t2v.models.videocrafter_unet import VideoCrafterUNetConfig
        from t2v.pipeline.videocrafter import VideoCrafterPipeline

        vc_cfg = (
            VideoCrafterUNetConfig().tiny() if ns.tiny else VideoCrafterUNetConfig()
        )
        vc = VideoCrafterPipeline.random_init(vc_cfg, policy=policy)
        vf = 4 if ns.tiny else 16
        vw = 16 * _spatial_scale(vc.vae_cfg) if ns.tiny else W
        record(
            "videocrafter_16f",
            _time_infer(
                vc,
                base.replace(
                    frames=vf, width=vw, height=vw,
                    sampler="DDIM", cfg_scale=15.0,
                ),
                2,
            ),
            frames=vf, px=vw, steps=STEPS,
        )


if __name__ == "__main__":
    main()
