"""Generate a REAL-layout ModelScope model dir from the reference's own code.

Round-1 parity tests synthesised state_dicts shaped by *our* converter's
expectations — circular. This script breaks the circle: it instantiates the
reference's genuine torch classes (UNetSD, AutoencoderKL from
/root/reference/scripts/modelscope/t2v_model.py), seeds them, and saves
their ``state_dict()`` through ``torch.save`` — so the key names, tensor
layouts and the zip-pickle container are all produced by reference + torch
code, exactly like the published ``text2video_pytorch_model.pth`` /
``VQGAN_autoencoder.pth`` / ``open_clip_pytorch_model.bin`` files:

  * the UNet .pth is the flat state_dict the reference strict-loads
    (t2v_pipeline.py:95-101);
  * the VAE .pth wraps keys in ``{'state_dict': {'first_stage_model.*'}}``
    plus ``loss.*`` keys, matching ``init_from_ckpt``
    (t2v_model.py:1619-1634);
  * the CLIP .bin is a flat open_clip-layout dict (text tower + visual.*
    keys our converter must ignore, clip_hardcode.py:74-77).

All-zero parameters (the zero-init gates: head conv, proj_out, temporal
conv4) are perturbed to small random values first — identical weights on
both sides still gate the PSNR check, but zeros would make a conversion bug
in those layers invisible.

Usage: python tools/parity/gen_checkpoints.py --out /tmp/parity/model [--small]
"""

from __future__ import annotations

import argparse
import gzip
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
import refstubs

refstubs.install()

import torch
import torch.nn as nn

FULL_CFG = {
    "unet_in_dim": 4,
    "unet_dim": 320,
    "unet_y_dim": 768,
    "unet_context_dim": 1024,
    "unet_out_dim": 4,
    "unet_dim_mult": [1, 2, 4, 4],
    "unet_num_heads": 8,
    "unet_head_dim": 64,
    "unet_res_blocks": 2,
    "unet_attn_scales": [1, 0.5, 0.25],
    "unet_dropout": 0.1,
    "temporal_attention": "True",
    "mean_type": "eps",
}

SMALL_CFG = {
    **FULL_CFG,
    "unet_dim": 64,
    # the reference hardcodes context_dim=1024 in its DECODER spatial
    # transformers (t2v_model.py:295) regardless of config, so a small
    # harness config must keep the real context width
    "unet_context_dim": 1024,
    "unet_y_dim": 64,
    "unet_num_heads": 2,
    "unet_head_dim": 32,
    "unet_res_blocks": 1,
    "unet_dim_mult": [1, 2],
    "unet_attn_scales": [1, 0.5],
}

DDCONFIG = {  # hardcoded in the reference, t2v_pipeline.py:117-131
    "double_z": True,
    "z_channels": 4,
    "resolution": 256,
    "in_channels": 3,
    "out_ch": 3,
    "ch": 128,
    "ch_mult": [1, 2, 4, 4],
    "num_res_blocks": 2,
    "attn_resolutions": [],
    "dropout": 0.0,
}
SMALL_DDCONFIG = {**DDCONFIG, "ch": 32, "ch_mult": [1, 2], "num_res_blocks": 1}


def perturb_zero_params(module: nn.Module, seed: int) -> int:
    """Replace all-zero parameters with small seeded noise; returns count."""
    g = torch.Generator().manual_seed(seed)
    n = 0
    with torch.no_grad():
        for p in module.parameters():
            if p.numel() and not p.any():
                p.copy_(torch.randn(p.shape, generator=g) * 0.02)
                n += 1
    return n


def build_unet(cfg: dict) -> nn.Module:
    from modelscope.t2v_model import UNetSD

    torch.manual_seed(0)
    unet = UNetSD(
        in_dim=cfg["unet_in_dim"],
        dim=cfg["unet_dim"],
        y_dim=cfg["unet_y_dim"],
        context_dim=cfg["unet_context_dim"],
        out_dim=cfg["unet_out_dim"],
        dim_mult=cfg["unet_dim_mult"],
        num_heads=cfg["unet_num_heads"],
        head_dim=cfg["unet_head_dim"],
        num_res_blocks=cfg["unet_res_blocks"],
        attn_scales=cfg["unet_attn_scales"],
        dropout=cfg["unet_dropout"],
        parameterization=cfg["mean_type"],
        temporal_attention=cfg["temporal_attention"] == "True",
    ).eval()
    perturb_zero_params(unet, seed=1)
    return unet


def build_vae(ddconfig: dict) -> nn.Module:
    from modelscope.t2v_model import AutoencoderKL

    torch.manual_seed(2)
    vae = AutoencoderKL(ddconfig, 4, ckpt_path=None).eval()
    perturb_zero_params(vae, seed=3)
    return vae


class OpenClipTextModel(nn.Module):
    """Torch text tower with open_clip's exact parameter naming.

    Forward implements the reference's ``encode_with_transformer`` +
    penultimate truncation (clip_hardcode.py:255-274): token+positional
    embed -> LND -> resblocks[: layers - layer_idx] (causal mask) -> NLD ->
    ln_final. The module tree (``transformer.resblocks.N.{ln_1,attn,ln_2,
    mlp.c_fc,mlp.c_proj}``, ``token_embedding``, ``positional_embedding``,
    ``ln_final``, ``text_projection``, ``logit_scale``) yields the same
    state_dict keys as open_clip ViT-H-14's text half.
    """

    def __init__(self, width=1024, layers=24, heads=16, ctx=77, vocab=49408):
        super().__init__()
        self.heads = heads
        self.token_embedding = nn.Embedding(vocab, width)
        self.positional_embedding = nn.Parameter(torch.empty(ctx, width))
        tf = nn.Module()
        tf.resblocks = nn.ModuleList()
        for _ in range(layers):
            blk = nn.Module()
            blk.ln_1 = nn.LayerNorm(width)
            blk.attn = nn.MultiheadAttention(width, heads)
            blk.ln_2 = nn.LayerNorm(width)
            mlp = nn.Module()
            mlp.c_fc = nn.Linear(width, width * 4)
            mlp.c_proj = nn.Linear(width * 4, width)
            blk.mlp = mlp
            tf.resblocks.append(blk)
        self.transformer = tf
        self.ln_final = nn.LayerNorm(width)
        self.text_projection = nn.Parameter(torch.empty(width, width))
        self.logit_scale = nn.Parameter(torch.tensor(math.log(1 / 0.07)))
        nn.init.normal_(self.token_embedding.weight, std=0.02)
        nn.init.normal_(self.positional_embedding, std=0.01)
        nn.init.normal_(self.text_projection, std=width ** -0.5)
        mask = torch.full((ctx, ctx), float("-inf"))
        mask.triu_(1)
        self.register_buffer("attn_mask", mask, persistent=False)

    @torch.no_grad()
    def encode(self, tokens: torch.Tensor, penultimate: bool = True):
        x = self.token_embedding(tokens) + self.positional_embedding
        x = x.permute(1, 0, 2)  # NLD -> LND
        n = len(self.transformer.resblocks) - (1 if penultimate else 0)
        for blk in self.transformer.resblocks[:n]:
            h = blk.ln_1(x)
            h, _ = blk.attn(h, h, h, need_weights=False, attn_mask=self.attn_mask)
            x = x + h
            h = blk.ln_2(x)
            x = x + blk.mlp.c_proj(nn.functional.gelu(blk.mlp.c_fc(h)))
        x = x.permute(1, 0, 2)
        return self.ln_final(x)


def build_clip(width=1024, layers=24, heads=16, vocab=49408) -> OpenClipTextModel:
    torch.manual_seed(4)
    clip = OpenClipTextModel(width=width, layers=layers, heads=heads, vocab=vocab).eval()
    # real CLIP towers emit a distinctly nonzero global mean; with zero-mean
    # random weights the A1111 renorm ratio orig_mean/new_mean divides two
    # near-zero numbers and amplifies fp noise into O(1) divergence, so give
    # the generated tower a realistic output mean
    with torch.no_grad():
        clip.ln_final.bias.add_(0.3)
    return clip


def fake_visual_keys(width: int, g: torch.Generator) -> dict:
    """A sample of open_clip visual-tower keys the converter must skip."""
    r = lambda *s: torch.randn(*s, generator=g) * 0.02
    return {
        "visual.class_embedding": r(width),
        "visual.positional_embedding": r(257, width),
        "visual.proj": r(width, width),
        "visual.conv1.weight": r(width, 3, 14, 14),
        "visual.ln_pre.weight": r(width),
        "visual.ln_pre.bias": r(width),
        "visual.transformer.resblocks.0.attn.in_proj_weight": r(3 * width, width),
        "visual.transformer.resblocks.0.attn.in_proj_bias": r(3 * width),
        "visual.transformer.resblocks.0.attn.out_proj.weight": r(width, width),
        "visual.transformer.resblocks.0.attn.out_proj.bias": r(width),
    }


def write_vocab(path: str) -> None:
    """Deterministic full-size BPE merge file: 48894 inert merge pairs so
    the vocab has the real 49408 size and BOS/EOS land at 49406/49407.
    Tokenization degrades to byte-level — identical on both parity sides."""
    n_merges = 49152 - 256 - 2
    lines = ["#version: parity-synthetic"]
    lines += [f"mg{i} mh{i}" for i in range(n_merges)]
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--only", choices=["unet", "vae", "clip"], default=None)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    def want(name: str) -> bool:
        return args.only is None or args.only == name

    cfg = SMALL_CFG if args.small else FULL_CFG
    ddconfig = SMALL_DDCONFIG if args.small else DDCONFIG

    configuration = {
        "framework": "pytorch",
        "task": "text-to-video-synthesis",
        "model": {
            "type": "latent-text-to-video-synthesis",
            "model_args": {
                "ckpt_clip": "open_clip_pytorch_model.bin",
                "ckpt_unet": "text2video_pytorch_model.pth",
                "ckpt_autoencoder": "VQGAN_autoencoder.pth",
                "max_frames": 16,
                "tiny_gpu": 1,
            },
            "model_cfg": cfg,
        },
        "pipeline": {"type": "latent-text-to-video-synthesis-pipeline"},
    }
    with open(os.path.join(args.out, "configuration.json"), "w") as f:
        json.dump(configuration, f, indent=1)

    if want("unet"):
        print("building UNetSD ...", flush=True)
        unet = build_unet(cfg)
        n_params = sum(p.numel() for p in unet.parameters())
        print(f"  {n_params/1e6:.1f}M params", flush=True)
        torch.save(unet.state_dict(), os.path.join(args.out, "text2video_pytorch_model.pth"))
        del unet

    g = torch.Generator().manual_seed(5)
    if want("vae"):
        print("building AutoencoderKL ...", flush=True)
        vae = build_vae(ddconfig)
        vae_sd = {"first_stage_model." + k: v for k, v in vae.state_dict().items()}
        vae_sd["loss.logvar"] = torch.zeros(())
        vae_sd["loss.discriminator.main.0.weight"] = torch.randn(
            64, 3, 4, 4, generator=g
        )
        torch.save({"state_dict": vae_sd}, os.path.join(args.out, "VQGAN_autoencoder.pth"))
        del vae, vae_sd

    if want("clip"):
        print("building OpenCLIP text tower ...", flush=True)
        if args.small:
            clip = build_clip(width=cfg["unet_context_dim"], layers=2, heads=2, vocab=49408)
        else:
            clip = build_clip()
        clip_sd = dict(clip.state_dict())
        clip_sd.update(fake_visual_keys(clip.token_embedding.embedding_dim, g))
        torch.save(clip_sd, os.path.join(args.out, "open_clip_pytorch_model.bin"))
        del clip, clip_sd

    write_vocab(os.path.join(args.out, "bpe_simple_vocab_16e6.txt.gz"))
    print("model dir ready:", args.out, flush=True)


if __name__ == "__main__":
    main()
