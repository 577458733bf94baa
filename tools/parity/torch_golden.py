"""Compute the fp32 torch reference goldens from a generated model dir.

Drives the reference's OWN code on the real checkpoint files:

  * ``UNetSD`` strict-loaded from ``text2video_pytorch_model.pth``
    (t2v_pipeline.py:95-101);
  * ``AutoencoderKL.init_from_ckpt`` on ``VQGAN_autoencoder.pth``
    (t2v_model.py:1619-1634);
  * the DDIM_Gaussian sampler through ``Txt2VideoSampler`` construction
    (samplers_common.py:85-93, so defaults — incl. the learned_range split
    CFG — match production), 20 steps, eta=0;
  * per-frame VAE decode + ``tensor2vid`` (t2v_pipeline.py:296-360,447-460).

The text tower runs through the generator's OpenClipTextModel (the exact
module the ``.bin`` was saved from) with the A1111 chunk-weight
renormalisation (clip_hardcode.py:397-422).

Outputs golden.npz: text_c, text_uc, unet_out (single fwd), acts_* (block
activations), x0 (final latents), frames (F,H,W,3 RGB uint8).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
import refstubs

refstubs.install()

import numpy as np
import torch
from einops import rearrange

import gen_checkpoints as gen

SCALE_FACTOR = 0.18215
GUIDANCE = 9.0
STEPS = 20


def load_unet(model_dir: str):
    from modelscope.t2v_model import UNetSD

    with open(os.path.join(model_dir, "configuration.json")) as f:
        cfg = json.load(f)["model"]["model_cfg"]
    unet = UNetSD(
        in_dim=cfg["unet_in_dim"], dim=cfg["unet_dim"], y_dim=cfg["unet_y_dim"],
        context_dim=cfg["unet_context_dim"], out_dim=cfg["unet_out_dim"],
        dim_mult=cfg["unet_dim_mult"], num_heads=cfg["unet_num_heads"],
        head_dim=cfg["unet_head_dim"], num_res_blocks=cfg["unet_res_blocks"],
        attn_scales=cfg["unet_attn_scales"], dropout=cfg["unet_dropout"],
        parameterization=cfg["mean_type"],
        temporal_attention=cfg["temporal_attention"] == "True",
    )
    sd = torch.load(
        os.path.join(model_dir, "text2video_pytorch_model.pth"),
        map_location="cpu", weights_only=True,
    )
    unet.load_state_dict(sd, strict=True)
    return unet.eval(), cfg


def encode_text(model_dir: str, tokens: np.ndarray, mults: np.ndarray, width: int, layers: int, heads: int):
    clip = gen.OpenClipTextModel(width=width, layers=layers, heads=heads)
    sd = torch.load(
        os.path.join(model_dir, "open_clip_pytorch_model.bin"),
        map_location="cpu", weights_only=True,
    )
    sd = {k: v for k, v in sd.items() if not k.startswith("visual.")}
    clip.load_state_dict(sd, strict=True)
    clip.eval()
    zs = []
    for i in range(tokens.shape[0]):  # one call per chunk, batch=1 (A1111)
        t = torch.from_numpy(tokens[i : i + 1].astype(np.int64))
        z = clip.encode(t, penultimate=True)
        m = torch.from_numpy(mults[i : i + 1])
        orig_mean = z.mean()
        z = z * m.unsqueeze(-1)
        z = z * (orig_mean / z.mean())
        zs.append(z)
    return torch.hstack(zs)  # (1, 77*n, width)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--inputs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--clip-layers", type=int, default=24)
    ap.add_argument("--clip-heads", type=int, default=16)
    ap.add_argument("--skip-sampling", action="store_true")
    args = ap.parse_args()

    inp = np.load(args.inputs)
    noise = np.ascontiguousarray(
        np.transpose(inp["noise"], (0, 4, 1, 2, 3))
    )  # (B,F,h,w,C) -> (B,C,F,h,w)
    x_T = torch.from_numpy(noise).float()

    unet, cfg = load_unet(args.model_dir)
    print("unet loaded", flush=True)

    t0 = time.time()
    c = encode_text(args.model_dir, inp["tokens_c"], inp["mult_c"],
                    cfg["unet_context_dim"], args.clip_layers, args.clip_heads)
    uc = encode_text(args.model_dir, inp["tokens_uc"], inp["mult_uc"],
                     cfg["unet_context_dim"], args.clip_layers, args.clip_heads)
    print(f"text encoded {tuple(c.shape)} {time.time()-t0:.1f}s", flush=True)

    out = {"text_c": c.numpy(), "text_uc": uc.numpy()}

    # --- single UNet forward with block-activation taps -------------------
    acts: dict[str, np.ndarray] = {}

    def tap(name):
        def hook(mod, i, o):
            acts[name] = o.detach().float().numpy()
        return hook

    hooks = []
    for i, blk in enumerate(unet.input_blocks):
        hooks.append(blk.register_forward_hook(tap(f"enc_{i}")))
    for i, blk in enumerate(unet.middle_block):
        hooks.append(blk.register_forward_hook(tap(f"mid_{i}")))
    for i, blk in enumerate(unet.output_blocks):
        hooks.append(blk.register_forward_hook(tap(f"dec_{i}")))

    t0 = time.time()
    with torch.no_grad():
        y = unet(x_T, torch.tensor([500.0]), c)
    print(f"unet fwd {tuple(y.shape)} {time.time()-t0:.1f}s", flush=True)
    for h in hooks:
        h.remove()
    out["unet_out"] = y.float().numpy()
    for k, v in acts.items():
        out[f"act_{k}"] = v

    if not args.skip_sampling:
        # --- full DDIM_Gaussian loop (production construction path) ------
        from modelscope.t2v_model import beta_schedule
        from samplers.samplers_common import Txt2VideoSampler

        betas = beta_schedule(
            "linear_sd", cfg.get("num_timesteps", 1000),
            init_beta=0.00085, last_beta=0.0120,
        )
        driver = Txt2VideoSampler(
            unet, "cpu", betas=betas, sampler_name="DDIM_Gaussian"
        )
        t0 = time.time()
        with torch.no_grad():
            x0 = driver.sampler.sample(
                x_T=x_T.clone(), S=STEPS, conditioning=c,
                unconditional_conditioning=uc,
                unconditional_guidance_scale=GUIDANCE, eta=0.0,
                callback=None, mask=None,
            )
        print(f"sampled {STEPS} steps {time.time()-t0:.1f}s", flush=True)
        out["x0"] = x0.float().numpy()
        del unet, driver

        # --- frame-chunked VAE decode + tensor2vid ------------------------
        from modelscope.t2v_model import AutoencoderKL

        def tensor2vid(video, mean=0.5, std=0.5):
            # t2v_pipeline.py:447-460: unnormalise, clamp, (i c f h w) ->
            # per-frame (h, w, c) RGB uint8 via truncation
            video = video.mul_(std).add_(mean).clamp_(0, 1)
            images = rearrange(video, "i c f h w -> f h (i w) c")
            return [
                (img.numpy() * 255).astype("uint8") for img in images.unbind(0)
            ]

        with open(os.path.join(args.model_dir, "configuration.json")) as f:
            small = json.load(f)["model"]["model_cfg"]["unet_dim"] < 128
        ddconfig = gen.SMALL_DDCONFIG if small else gen.DDCONFIG
        vae = AutoencoderKL(
            ddconfig, 4, os.path.join(args.model_dir, "VQGAN_autoencoder.pth")
        ).eval()
        t0 = time.time()
        chunks = torch.chunk(x0, chunks=x0.shape[2], dim=2)
        decoded = []
        with torch.no_grad():
            for ch in chunks:
                ch = rearrange(ch / SCALE_FACTOR, "b c f h w -> (b f) c h w")
                decoded.append(vae.decode(ch))
        vd_out = torch.cat(decoded, dim=0)
        vd_out = rearrange(vd_out, "(b f) c h w -> b c f h w", b=x0.shape[0])
        frames = tensor2vid(vd_out.float().cpu())  # list of (H, W, 3) RGB uint8
        print(f"decoded {len(frames)} frames {time.time()-t0:.1f}s", flush=True)
        out["frames"] = np.stack(frames)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez_compressed(args.out, **out)
    print("golden ->", args.out, flush=True)


if __name__ == "__main__":
    main()
