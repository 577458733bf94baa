"""Quantify approximate-sampler quality on the real-layout checkpoint.

Round-4 verdict weak #5: DeepCache's "minor quality cost"
(t2v/diffusion/deepcache.py) and the README's "DPM++ ~2x fewer steps at
matched quality" were user-facing accuracy claims resting on the papers'
word. This tool measures them: it loads the full-scale real-layout
ModelScope checkpoint (tools/parity/gen_checkpoints.py — the reference's
own torch classes saved through torch.save), renders ONE video with the
exact production chain (DDIM_Gaussian, 20 steps), then re-renders from
the SAME seed with each approximate configuration and records per-frame
PSNR and mean SSIM of the decoded uint8 frames against the exact output
into the repo-root ``QUALITY.json`` artifact.

Caveat (stated in the artifact): the checkpoint layout, loading path and
FLOP profile are real, but the WEIGHTS are the parity harness's seeded
initialisation, not the published ModelScope release (this environment
has no network egress). The metric therefore measures *sampler
approximation divergence* on the true architecture — the quantity the
claims are actually about — not perceptual quality of a trained model.

Variants:
  ddim_gaussian_20  — the exact baseline (reference default chain)
  deepcache_k2/k3   — DeepCache interval 2/3 at 20 steps
  dpmpp_2m_10       — DPM++ 2M at 10 steps (the "~2x fewer steps" claim)
  euler_a_20        — Euler ancestral at 20 steps
  unipc_10          — UniPC order-3 at 10 steps

Usage: python tools/quality.py [--model-dir /tmp/parity/model]
       [--frames 16] [--size 256] [--out QUALITY.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(peak * peak / mse))


def ssim(a: np.ndarray, b: np.ndarray) -> float:
    """Mean SSIM over frames/channels (11×11 Gaussian window, K1=0.01,
    K2=0.03 — the standard Wang et al. constants), via cv2 blurs."""
    import cv2

    C1, C2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    vals = []
    for fa, fb in zip(a, b):
        x = fa.astype(np.float64)
        y = fb.astype(np.float64)
        blur = lambda im: cv2.GaussianBlur(im, (11, 11), 1.5)
        mx, my = blur(x), blur(y)
        sxx = blur(x * x) - mx * mx
        syy = blur(y * y) - my * my
        sxy = blur(x * y) - mx * my
        s = ((2 * mx * my + C1) * (2 * sxy + C2)) / (
            (mx * mx + my * my + C1) * (sxx + syy + C2)
        )
        vals.append(float(s.mean()))
    return float(np.mean(vals))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default="/tmp/parity/model")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--out", default=os.path.join(ROOT, "QUALITY.json"))
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--only", default=None)
    ns = ap.parse_args()

    from t2v.core.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax

    from t2v.core.config import T2VArgs
    from t2v.core.dtypes import Policy
    from t2v.pipeline.pipeline import ModelScopePipeline

    t0 = time.time()
    print("loading real-layout checkpoint (several minutes)...", flush=True)
    pipe = ModelScopePipeline.from_model_dir(
        ns.model_dir, policy=Policy.bf16()
    )
    print(f"loaded in {time.time() - t0:.1f}s", flush=True)

    base = T2VArgs(
        prompt="a photo of an astronaut riding a horse on mars, cinematic",
        n_prompt="text, watermark, blurry",
        steps=20, frames=ns.frames, width=ns.size, height=ns.size,
        sampler="DDIM_Gaussian", cfg_scale=9.0, seed=ns.seed,
    )

    variants = {
        "ddim_gaussian_20": (base, {}),
        "deepcache_k2": (base, {"deep_cache_interval": 2}),
        "deepcache_k3": (base, {"deep_cache_interval": 3}),
        "dpmpp_2m_10": (base.replace(sampler="DPM++ 2M", steps=10), {}),
        "euler_a_20": (base.replace(sampler="Euler a"), {}),
        "unipc_10": (base.replace(sampler="UniPC", steps=10), {}),
    }

    # partial re-runs merge into the existing artifact
    results: dict[str, dict] = {}
    if ns.only is not None and os.path.exists(ns.out):
        with open(ns.out) as f:
            results = json.load(f).get("variants", {})

    def render(name):
        a, kw = variants[name]
        t0 = time.time()
        res = pipe.infer(a, **kw)
        frames = np.stack([np.asarray(f) for f in res.frames])
        print(f"[{name}] rendered in {time.time() - t0:.1f}s "
              f"{frames.shape}", flush=True)
        return frames

    exact = render("ddim_gaussian_20")

    def commit() -> str:
        try:
            return subprocess.run(
                ["git", "rev-parse", "HEAD"], cwd=ROOT,
                capture_output=True, text=True,
            ).stdout.strip()
        except Exception:
            return "unknown"

    for name in variants:
        if name == "ddim_gaussian_20":
            continue
        if ns.only is not None and name not in ns.only.split(","):
            continue
        frames = render(name)
        per_frame = [round(psnr(a, b), 2) for a, b in zip(frames, exact)]
        results[name] = {
            "psnr_per_frame_db": per_frame,
            "psnr_mean_db": round(float(np.mean(per_frame)), 2),
            "psnr_min_db": round(float(np.min(per_frame)), 2),
            "ssim_mean": round(ssim(frames, exact), 4),
        }
        print(f"[{name}] {json.dumps(results[name])}", flush=True)
        with open(ns.out, "w") as f:
            json.dump(
                {
                    "baseline": "ddim_gaussian_20 (exact production chain)",
                    "checkpoint": "real-layout parity checkpoint "
                                  "(tools/parity/gen_checkpoints.py; seeded "
                                  "weights — measures sampler approximation "
                                  "divergence on the true architecture, not "
                                  "trained-model perceptual quality)",
                    "device": jax.devices()[0].device_kind,
                    "commit": commit(),
                    "shape": {"frames": ns.frames, "px": ns.size,
                              "seed": ns.seed},
                    "variants": results,
                },
                f, indent=2,
            )
            f.write("\n")
    print(f"wrote {ns.out}", flush=True)


if __name__ == "__main__":
    main()
