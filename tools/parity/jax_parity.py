"""Run our pipeline on the real-layout checkpoints and compare to goldens.

Exercises the PRODUCTION path end-to-end — restricted unpickler →
``convert_unet``/``convert_vae``/``convert_open_clip_text`` →
``ModelScopePipeline.from_model_dir`` → ``infer`` — in fp32 (matmul
precision "highest") and reports:

  * text-embedding max|Δ| vs the torch tower (real .bin weights);
  * single UNet-forward max|Δ| + PSNR vs the torch UNetSD (real .pth);
  * final-latent max|Δ| after the full 20-step DDIM_Gaussian loop;
  * the BASELINE.md gate: per-frame PSNR (>35 dB) of decoded uint8 frames.

Writes a JSON report next to --out.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(peak * peak / mse))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--inputs", required=True)
    ap.add_argument("--golden", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from t2v.core.config import CLIPTextConfig, T2VArgs, VAEConfig
    from t2v.core.dtypes import Policy
    from t2v.pipeline.pipeline import ModelScopePipeline

    inp = np.load(args.inputs)
    gold = np.load(args.golden)
    import datetime
    import subprocess

    report: dict = {
        "device": str(jax.devices()[0]).lower(),
        "commit": subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd="/root/repo",
        ).stdout.strip(),
        "date": datetime.date.today().isoformat(),
    }

    vae_cfg = clip_cfg = None
    if args.small:
        import dataclasses

        vae_cfg = VAEConfig().tiny()
        clip_cfg = dataclasses.replace(
            CLIPTextConfig.vit_h_14(), width=1024, layers=2, heads=2
        )

    t0 = time.time()
    pipe = ModelScopePipeline.from_model_dir(
        args.model_dir, Policy.fp32(), vae_cfg=vae_cfg, clip_cfg=clip_cfg
    )
    report["load_seconds"] = round(time.time() - t0, 1)
    print(f"pipeline loaded in {report['load_seconds']}s", flush=True)

    # --- text tower --------------------------------------------------------
    enc = pipe.text_encoder
    z_c = enc.encode_line(str(inp["prompt"]))
    z_uc = enc.encode_line(str(inp["n_prompt"]))
    d_c = float(np.max(np.abs(z_c - gold["text_c"][0])))
    d_uc = float(np.max(np.abs(z_uc - gold["text_uc"][0])))
    scale = float(np.max(np.abs(gold["text_c"])))
    report["text_max_abs_diff"] = max(d_c, d_uc)
    report["text_scale"] = scale
    print(f"text tower: max|dz| = {max(d_c, d_uc):.3e} (scale {scale:.2f})", flush=True)

    # --- single UNet forward ----------------------------------------------
    # inputs.npz noise is already video-NHWC; the golden consumed its BCFHW
    # transpose, so feed it unchanged here
    x = jnp.asarray(inp["noise"])
    ctx = jnp.asarray(gold["text_c"])
    t = jnp.full((1,), 500.0)
    fwd = jax.jit(lambda p, x, t, c: pipe.unet.apply(p, x, t, c))
    y = np.asarray(fwd(pipe.unet_params, x, t, ctx))
    y_ref = np.transpose(gold["unet_out"], (0, 2, 3, 4, 1))  # BCFHW -> BFHWC
    report["unet_fwd_max_abs_diff"] = float(np.max(np.abs(y - y_ref)))
    report["unet_fwd_rel"] = float(
        np.max(np.abs(y - y_ref)) / (np.std(y_ref) + 1e-12)
    )
    print(
        f"unet fwd: max|dy| = {report['unet_fwd_max_abs_diff']:.3e} "
        f"(std {np.std(y_ref):.3f})",
        flush=True,
    )

    if "x0" not in gold:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(json.dumps(report, indent=1))
        return

    # --- full pipeline -----------------------------------------------------
    req = T2VArgs(
        prompt=str(inp["prompt"]), n_prompt=str(inp["n_prompt"]),
        sampler="DDIM_Gaussian", steps=20, frames=args.frames,
        seed=int(inp["seed"]), cfg_scale=9.0,
        width=args.size, height=args.size, eta=0.0,
    )
    t0 = time.time()
    result = pipe.infer(req)
    report["infer_seconds"] = round(time.time() - t0, 1)

    lat = np.asarray(result.latents)  # (1, F, h, w, 4)
    lat_ref = np.transpose(gold["x0"], (0, 2, 3, 4, 1))
    report["latent_max_abs_diff"] = float(np.max(np.abs(lat - lat_ref)))
    report["latent_std"] = float(np.std(lat_ref))
    print(
        f"final latents: max|dx| = {report['latent_max_abs_diff']:.3e} "
        f"(std {report['latent_std']:.3f})",
        flush=True,
    )

    frames = np.stack(result.frames)  # (F, H, W, 3) RGB uint8
    gframes = gold["frames"]
    per_frame = [psnr(frames[i], gframes[i]) for i in range(frames.shape[0])]
    report["psnr_per_frame"] = [round(p, 2) for p in per_frame]
    report["psnr_min"] = round(min(per_frame), 2)
    report["psnr_mean"] = round(float(np.mean(per_frame)), 2)
    report["gate_psnr_gt_35"] = bool(min(per_frame) > 35.0)
    print(
        f"PSNR: min {report['psnr_min']} dB mean {report['psnr_mean']} dB "
        f"-> gate>35dB: {report['gate_psnr_gt_35']}",
        flush=True,
    )

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
