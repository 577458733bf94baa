"""VideoCrafter real-checkpoint generation + fp32 torch goldens.

Same approach as the ModelScope harness: the Lightning ``model.ckpt`` is
assembled from the REFERENCE's own torch classes —
``lvdm.models.modules.openaimodel3d.UNetModel`` (strict-loadable under the
``model.diffusion_model.`` prefix, exactly how ``LatentDiffusion``'s
``DiffusionWrapper`` names it), the lvdm VAE modules under
``first_stage_model.``, an HF ``CLIPTextModel`` under
``cond_stage_model.transformer.`` (FrozenCLIPEmbedder's layout,
condition_modules.py:15-40), plus the DDPM schedule buffers a real training
run registers. Goldens: CLIP hidden states, a UNet forward, a 5-step lvdm
DDIM loop (the reference's own sampler driven through a thin model shim),
and a float VAE decode.

Usage:
  python tools/parity/vc_golden.py --out-dir /tmp/parity/vc [--small]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(__file__))
import refstubs

refstubs.install()

# openaimodel3d imports omegaconf.listconfig.ListConfig (isinstance checks
# only) — provide a list alias so the reference module imports untouched
if "omegaconf" not in sys.modules:
    om = types.ModuleType("omegaconf")
    lc = types.ModuleType("omegaconf.listconfig")

    class ListConfig(list):
        pass

    lc.ListConfig = ListConfig
    om.listconfig = lc
    sys.modules["omegaconf"] = om
    sys.modules["omegaconf.listconfig"] = lc

import numpy as np
import torch
import torch.nn as nn
import yaml

import gen_checkpoints as gen

REF_YAML = "/root/reference/scripts/videocrafter/base_t2v/model_config.yaml"
SEED_TOKENS = 777
GUIDANCE = 9.0
STEPS = 5


def load_params(small: bool) -> dict:
    with open(REF_YAML) as f:
        cfg = yaml.safe_load(f)["model"]["params"]
    if small:
        u = cfg["unet_config"]["params"]
        u["model_channels"] = 64
        u["channel_mult"] = [1, 2]
        u["attention_resolutions"] = [2, 1]
        u["num_res_blocks"] = 1
        u["temporal_length"] = 4
        cfg["first_stage_config"]["params"]["ddconfig"].update(
            {"ch": 32, "ch_mult": [1, 2], "num_res_blocks": 1}
        )
    return cfg


def build_unet(cfg: dict) -> nn.Module:
    from videocrafter.lvdm.models.modules.openaimodel3d import UNetModel

    torch.manual_seed(10)
    unet = UNetModel(**{**cfg["unet_config"]["params"], "use_checkpoint": False})
    unet.eval()
    gen.perturb_zero_params(unet, seed=11)
    return unet


class RefVAE(nn.Module):
    """Harness-only composition mirroring lvdm AutoencoderKL's module tree
    (autoencoder.py:11-45) without the Lightning base class."""

    def __init__(self, ddconfig: dict, embed_dim: int):
        super().__init__()
        from videocrafter.lvdm.models.modules.autoencoder_modules import (
            Decoder,
            Encoder,
        )

        self.encoder = Encoder(**ddconfig)
        self.decoder = Decoder(**ddconfig)
        self.quant_conv = nn.Conv2d(2 * ddconfig["z_channels"], 2 * embed_dim, 1)
        self.post_quant_conv = nn.Conv2d(embed_dim, ddconfig["z_channels"], 1)

    @torch.no_grad()
    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))


def build_vae(cfg: dict) -> RefVAE:
    torch.manual_seed(12)
    p = cfg["first_stage_config"]["params"]
    vae = RefVAE(p["ddconfig"], p["embed_dim"]).eval()
    gen.perturb_zero_params(vae, seed=13)
    return vae


def build_clip(small: bool):
    from transformers import CLIPTextConfig, CLIPTextModel

    torch.manual_seed(14)
    hf_cfg = CLIPTextConfig(
        vocab_size=49408, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=2 if small else 12, num_attention_heads=12,
        max_position_embeddings=77, hidden_act="quick_gelu",
    )
    clip = CLIPTextModel(hf_cfg).eval()
    gen.perturb_zero_params(clip, seed=15)
    return clip


def ddpm_buffers(timesteps: int, linear_start: float, linear_end: float) -> dict:
    """The schedule buffers LatentDiffusion.register_schedule persists into
    a real checkpoint (ddpm3d.py:125-177; ldm 'linear' interpolates in
    sqrt-beta space)."""
    betas = (
        np.linspace(linear_start ** 0.5, linear_end ** 0.5, timesteps) ** 2
    ).astype(np.float64)
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    acp = np.append(1.0, ac[:-1])
    t = lambda a: torch.tensor(a, dtype=torch.float32)
    pv = betas * (1.0 - acp) / (1.0 - ac)
    return {
        "betas": t(betas),
        "alphas_cumprod": t(ac),
        "alphas_cumprod_prev": t(acp),
        "sqrt_alphas_cumprod": t(np.sqrt(ac)),
        "sqrt_one_minus_alphas_cumprod": t(np.sqrt(1.0 - ac)),
        "log_one_minus_alphas_cumprod": t(np.log(1.0 - ac)),
        "sqrt_recip_alphas_cumprod": t(np.sqrt(1.0 / ac)),
        "sqrt_recipm1_alphas_cumprod": t(np.sqrt(1.0 / ac - 1.0)),
        "posterior_variance": t(pv),
        "posterior_log_variance_clipped": t(np.log(np.maximum(pv, 1e-20))),
        "posterior_mean_coef1": t(betas * np.sqrt(acp) / (1.0 - ac)),
        "posterior_mean_coef2": t((1.0 - acp) * np.sqrt(alphas) / (1.0 - ac)),
    }


class _ShimLDM:
    """Just enough of LatentDiffusion for the reference DDIMSampler: the
    schedule arrays, device, parameterization and apply_model (the
    'crossattn' conditioning route, ddpm3d.py:1370-1380)."""

    def __init__(self, unet: nn.Module, buffers: dict):
        self.diffusion_model = unet
        self.device = torch.device("cpu")
        self.parameterization = "eps"
        self.num_timesteps = buffers["betas"].shape[0]
        for k, v in buffers.items():
            setattr(self, k, v)

    def apply_model(self, x, t, cond, **kw):
        c = torch.cat(cond["c_crossattn"], 1) if isinstance(cond, dict) else cond
        return self.diffusion_model(x, t, context=c)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--frames", type=int, default=None)
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    cfg = load_params(args.small)
    u = cfg["unet_config"]["params"]
    frames = args.frames or (4 if args.small else u["temporal_length"])

    # --- model_config.yaml for our loader: re-emit the parsed config ----
    with open(REF_YAML) as f:
        full = yaml.safe_load(f)
    full["model"]["params"] = cfg
    with open(os.path.join(args.out_dir, "model_config.yaml"), "w") as f:
        yaml.safe_dump(full, f)
    gen.write_vocab(os.path.join(args.out_dir, "bpe_simple_vocab_16e6.txt.gz"))

    print("building UNetModel ...", flush=True)
    unet = build_unet(cfg)
    print(f"  {sum(p.numel() for p in unet.parameters())/1e6:.1f}M params", flush=True)
    vae = build_vae(cfg)
    clip = build_clip(args.small)

    sd = {}
    for k, v in unet.state_dict().items():
        sd[f"model.diffusion_model.{k}"] = v
    for k, v in vae.state_dict().items():
        sd[f"first_stage_model.{k}"] = v
    for k, v in clip.state_dict().items():
        sd[f"cond_stage_model.transformer.{k}"] = v
    buffers = ddpm_buffers(cfg["timesteps"], cfg["linear_start"], cfg["linear_end"])
    sd.update(buffers)
    sd["model_ema.decay"] = torch.tensor(0.9999)
    sd["model_ema.num_updates"] = torch.tensor(100, dtype=torch.int64)
    torch.save(
        {"state_dict": sd, "global_step": 100, "epoch": 1},
        os.path.join(args.out_dir, "model.ckpt"),
    )
    print("model.ckpt written", flush=True)

    # --- inputs: tokens via our (jax-free) tokenizer, VC padding rule ----
    sys.path.insert(0, "/root/repo")
    from t2v.text.tokenizer import CLIPTokenizer

    tok = CLIPTokenizer.find_and_load(args.out_dir)
    prompt = "an astronaut riding a horse on mars"
    n_prompt = "text, watermark"

    def pad77(p: str) -> list[int]:
        ids = tok.encode(p)[:75]
        row = [tok.bos_id] + ids + [tok.eos_id]
        return row + [tok.eos_id] * (77 - len(row))

    tokens = np.asarray([pad77(prompt), pad77(n_prompt)], np.int64)

    out = {"tokens": tokens, "prompt": np.array(prompt), "n_prompt": np.array(n_prompt)}

    t0 = time.time()
    with torch.no_grad():
        z = clip(input_ids=torch.from_numpy(tokens)).last_hidden_state
    out["text"] = z.float().numpy()  # (2, 77, 768): [cond, uncond]
    print(f"clip fwd {tuple(z.shape)} {time.time()-t0:.1f}s", flush=True)

    lat = 32 if not args.small else 16
    rng = np.random.default_rng(SEED_TOKENS)
    x = rng.standard_normal((1, u["in_channels"], frames, lat, lat)).astype(np.float32)
    out["x"] = x
    t0 = time.time()
    with torch.no_grad():
        y = unet(torch.from_numpy(x), torch.tensor([500.0]), context=z[:1])
    out["unet_out"] = y.float().numpy()
    print(f"unet fwd {tuple(y.shape)} {time.time()-t0:.1f}s", flush=True)

    # --- 5-step reference DDIM loop (lvdm ddim.py via shim) --------------
    from videocrafter.lvdm.samplers.ddim import DDIMSampler

    class CpuDDIM(DDIMSampler):
        def register_buffer(self, name, attr):  # reference hardcodes .to('cuda')
            setattr(self, name, attr)

    shim = _ShimLDM(unet, buffers)
    sampler = CpuDDIM(shim)
    x_T = torch.from_numpy(out["x"])
    t0 = time.time()
    with torch.no_grad():
        samples, _ = sampler.sample(
            S=STEPS, batch_size=1,
            shape=(u["in_channels"], frames, lat, lat),
            conditioning={"c_crossattn": [z[:1]]},
            unconditional_conditioning={"c_crossattn": [z[1:2]]},
            unconditional_guidance_scale=GUIDANCE,
            eta=0.0, x_T=x_T, verbose=False, schedule_verbose=False,
        )
    out["x0"] = samples.float().numpy()
    print(f"ddim {STEPS} steps {time.time()-t0:.1f}s", flush=True)

    # --- float VAE decode of 2 frames ------------------------------------
    z_dec = samples[0, :, :2].permute(1, 0, 2, 3) / cfg["scale_factor"]
    t0 = time.time()
    with torch.no_grad():
        img = vae.decode(z_dec.float())
    out["decoded"] = img.float().numpy()
    print(f"decoded {tuple(img.shape)} {time.time()-t0:.1f}s", flush=True)

    np.savez_compressed(os.path.join(args.out_dir, "golden_vc.npz"), **out)
    print("golden ->", os.path.join(args.out_dir, "golden_vc.npz"), flush=True)


if __name__ == "__main__":
    main()
