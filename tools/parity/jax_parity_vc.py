"""Compare our VideoCrafter pipeline against the lvdm torch goldens.

Exercises the production VC load path — restricted unpickler →
``split_lightning_state_dict`` → ``convert_vc_unet`` / ``convert_vae`` /
``convert_hf_clip_text`` → ``VideoCrafterPipeline.from_model_dir`` — in
fp32 and reports CLIP / UNet-forward / 5-step-DDIM / VAE-decode max|Δ|.

Writes a JSON report to --out.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True, help="dir with model.ckpt + golden_vc.npz")
    ap.add_argument("--out", required=True)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from t2v.core.dtypes import Policy
    from t2v.pipeline.videocrafter import VideoCrafterPipeline

    gold = np.load(os.path.join(args.dir, "golden_vc.npz"))
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

    t0 = time.time()
    pipe = VideoCrafterPipeline.from_model_dir(args.dir, policy=Policy.fp32())
    report["load_seconds"] = round(time.time() - t0, 1)
    print(f"pipeline loaded in {report['load_seconds']}s", flush=True)

    # --- CLIP-L tower -------------------------------------------------
    tokens = jnp.asarray(gold["tokens"].astype(np.int32))
    z = np.asarray(jax.jit(pipe.clip.apply)(pipe.clip_params, tokens))
    report["clip_max_abs_diff"] = float(np.max(np.abs(z - gold["text"])))
    print(f"clip: max|dz| = {report['clip_max_abs_diff']:.3e}", flush=True)

    # --- UNet forward ---------------------------------------------------
    x = jnp.asarray(np.transpose(gold["x"], (0, 2, 3, 4, 1)))  # BCFHW->BFHWC
    ctx = jnp.asarray(gold["text"][:1])
    fwd = jax.jit(lambda p, x, t, c: pipe.unet.apply(p, x, t, c))
    y = np.asarray(fwd(pipe.unet_params, x, jnp.full((1,), 500.0), ctx))
    y_ref = np.transpose(gold["unet_out"], (0, 2, 3, 4, 1))
    report["unet_fwd_max_abs_diff"] = float(np.max(np.abs(y - y_ref)))
    report["unet_out_std"] = float(np.std(y_ref))
    print(
        f"unet fwd: max|dy| = {report['unet_fwd_max_abs_diff']:.3e} "
        f"(std {report['unet_out_std']:.3f})",
        flush=True,
    )

    # --- 5-step DDIM loop (reference lvdm sampler vs our ddim module).
    # params ride as a REAL jit argument — captured as constants the 1B
    # fp32 tree ships 4GB through the compile transport.
    from t2v.diffusion.sampling import sample_loop

    uncond = jnp.asarray(gold["text"][1:2])

    @jax.jit
    def ddim5(params, nz, cond, uncond):
        def apply_fn(xx, tt, cc):
            return pipe.unet.apply(params, xx, tt, cc)

        return sample_loop(
            apply_fn, pipe.schedule, steps=5, shape=nz.shape, cond=cond,
            uncond=uncond, guidance_scale=9.0, eta=0.0, sampler_name="DDIM",
            noise=nz, key=jax.random.key(0),
        )

    x0 = ddim5(pipe.unet_params, x, ctx, uncond)
    x0 = np.asarray(x0)
    x0_ref = np.transpose(gold["x0"], (0, 2, 3, 4, 1))
    report["ddim5_max_abs_diff"] = float(np.max(np.abs(x0 - x0_ref)))
    report["ddim5_std"] = float(np.std(x0_ref))
    print(
        f"ddim-5: max|dx| = {report['ddim5_max_abs_diff']:.3e} "
        f"(std {report['ddim5_std']:.3f})",
        flush=True,
    )

    # --- VAE decode -------------------------------------------------------
    from t2v.models.vae import AutoencoderKL

    z_dec = jnp.asarray(x0_ref[0, :2]) / float(pipe.cfg.scale_factor)
    img = np.asarray(
        pipe.vae.apply(pipe.vae_params, z_dec, method=AutoencoderKL.decode)
    )
    img_ref = np.transpose(gold["decoded"], (0, 2, 3, 1))
    report["decode_max_abs_diff"] = float(np.max(np.abs(img - img_ref)))
    print(f"decode: max|d| = {report['decode_max_abs_diff']:.3e}", flush=True)

    report["pass"] = bool(
        report["clip_max_abs_diff"] < 1e-3
        and report["unet_fwd_max_abs_diff"] < 1e-3
        and report["ddim5_max_abs_diff"] < max(1e-2, 1e-3 * report["ddim5_std"])
        and report["decode_max_abs_diff"] < 1e-3
    )
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
