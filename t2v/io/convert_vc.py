"""VideoCrafter (LVDM) Lightning checkpoint → Flax converters.

``model.ckpt`` is a Lightning checkpoint (state_dict/global_step/epoch,
sample_utils.py:13-28) whose state_dict prefixes:
  model.diffusion_model.*        → VideoCrafterUNet
  first_stage_model.*            → t2v.models.vae.AutoencoderKL (same SD VAE)
  cond_stage_model.transformer.* → HF CLIP-L text tower

Layout rules as t2v/io/convert.py plus:
  Conv3d (out,in,kt,kh,kw) -> (kt,kh,kw,in,out)
  Conv3d k=1 proj          -> Dense (in,out)
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from t2v.io.convert import _conv3d, _gn32, _linear, _norm
from t2v.models.videocrafter_unet import (
    VCBlockDesc,
    VideoCrafterUNetConfig,
    build_vc_topology,
)

Array = np.ndarray
SD = Mapping[str, Array]


def split_lightning_state_dict(ckpt: Mapping[str, Any]) -> dict[str, dict[str, Array]]:
    """Split a loaded model.ckpt into per-component state dicts."""
    sd = ckpt.get("state_dict", ckpt)
    out = {"unet": {}, "vae": {}, "clip": {}, "other": {}}
    for k, v in sd.items():
        if k.startswith("model.diffusion_model."):
            out["unet"][k[len("model.diffusion_model.") :]] = v
        elif k.startswith("first_stage_model."):
            out["vae"][k[len("first_stage_model.") :]] = v
        elif k.startswith("cond_stage_model.transformer."):
            out["clip"][k[len("cond_stage_model.transformer.") :]] = v
        else:
            out["other"][k] = v
    return out


def _conv3d_k1_as_dense(sd: SD, p: str) -> dict:
    w = sd[f"{p}.weight"]
    return {
        "kernel": np.ascontiguousarray(w[:, :, 0, 0, 0].T),
        "bias": sd[f"{p}.bias"],
    }


def _attn(sd: SD, p: str) -> dict:
    return {
        "to_q": _linear(sd, f"{p}.to_q", bias=False),
        "to_k": _linear(sd, f"{p}.to_k", bias=False),
        "to_v": _linear(sd, f"{p}.to_v", bias=False),
        "to_out": _linear(sd, f"{p}.to_out.0"),
    }


def _temporal_attn(sd: SD, p: str) -> dict:
    out = _attn(sd, p)
    if f"{p}.relative_position_k.embeddings_table" in sd:
        out["relative_position_k"] = {
            "embeddings_table": sd[f"{p}.relative_position_k.embeddings_table"]
        }
        out["relative_position_v"] = {
            "embeddings_table": sd[f"{p}.relative_position_v.embeddings_table"]
        }
    return out


def _st_block(sd: SD, p: str) -> dict:
    out = {
        "attn1": _attn(sd, f"{p}.attn1"),
        "attn2": _attn(sd, f"{p}.attn2"),
        "attn1_tmp": _temporal_attn(sd, f"{p}.attn1_tmp"),
        "attn2_tmp": _temporal_attn(sd, f"{p}.attn2_tmp"),
        "ff": {
            "geglu": _linear(sd, f"{p}.ff.net.0.proj"),
            "out": _linear(sd, f"{p}.ff.net.2"),
        },
    }
    for n in ("norm1", "norm2", "norm3", "norm4", "norm5"):
        out[n] = _norm(sd, f"{p}.{n}")
    return out


def _st_transformer(sd: SD, p: str, depth: int = 1) -> dict:
    out = {
        "norm": _gn32(sd, f"{p}.norm"),
        "proj_in": _conv3d_k1_as_dense(sd, f"{p}.proj_in"),
        "proj_out": _conv3d_k1_as_dense(sd, f"{p}.proj_out"),
    }
    for d in range(depth):
        out[f"block_{d}"] = _st_block(sd, f"{p}.transformer_blocks.{d}")
    return out


def _res_block(sd: SD, p: str, has_skip: bool) -> dict:
    out = {
        "in_norm": _gn32(sd, f"{p}.in_layers.0"),
        "in_conv": {"conv": _conv3d(sd, f"{p}.in_layers.2")},
        "emb": _linear(sd, f"{p}.emb_layers.1"),
        "out_norm": _gn32(sd, f"{p}.out_layers.0"),
        "out_conv": {"conv": _conv3d(sd, f"{p}.out_layers.3")},
    }
    if has_skip:
        out["skip"] = {
            "kernel": np.ascontiguousarray(
                sd[f"{p}.skip_connection.weight"].transpose(2, 3, 4, 1, 0)
            ),
            "bias": sd[f"{p}.skip_connection.bias"],
        }
    return out


def convert_vc_unet(sd: SD, cfg: VideoCrafterUNetConfig) -> dict:
    topo = build_vc_topology(cfg)
    params: dict[str, Any] = {
        "time_embed_0": _linear(sd, "time_embed.0"),
        "time_embed_2": _linear(sd, "time_embed.2"),
        "head_norm": _gn32(sd, "out.0"),
        "head_conv": {"conv": _conv3d(sd, "out.2")},
    }
    for entry in (*topo.encoder, topo.middle, *topo.decoder):
        for d in entry:
            params[d.flax_name] = _convert_block(sd, d, cfg)
    return {"params": params}


def _convert_block(sd: SD, d: VCBlockDesc, cfg: VideoCrafterUNetConfig) -> dict:
    if d.kind == "conv_in":
        return {"conv": _conv3d(sd, d.torch_path)}
    if d.kind == "res":
        return _res_block(sd, d.torch_path, has_skip=d.in_ch != d.out_ch)
    if d.kind == "st":
        return _st_transformer(sd, d.torch_path, cfg.transformer_depth)
    if d.kind == "downsample":
        return {"conv": _conv3d(sd, f"{d.torch_path}.op")}
    if d.kind == "upsample":
        return {"conv_mod": {"conv": _conv3d(sd, f"{d.torch_path}.conv")}}
    raise ValueError(d.kind)


def vc_module_index(cfg: VideoCrafterUNetConfig) -> dict[str, tuple[tuple[str, ...], str]]:
    """torch module path → (flax path, kind) for LVDM LoRA merging
    (lora.py net_load_lora targets attention/ff linears)."""
    idx: dict[str, tuple[tuple[str, ...], str]] = {}
    topo = build_vc_topology(cfg)
    for entry in (*topo.encoder, topo.middle, *topo.decoder):
        for d in entry:
            if d.kind != "st":
                continue
            for dep in range(cfg.transformer_depth):
                tp = f"{d.torch_path}.transformer_blocks.{dep}"
                fp = (d.flax_name, f"block_{dep}")
                for attn in ("attn1", "attn2", "attn1_tmp", "attn2_tmp"):
                    for proj in ("to_q", "to_k", "to_v"):
                        idx[f"{tp}.{attn}.{proj}"] = (fp + (attn, proj), "linear")
                    idx[f"{tp}.{attn}.to_out.0"] = (fp + (attn, "to_out"), "linear")
                idx[f"{tp}.ff.net.0.proj"] = (fp + ("ff", "geglu"), "linear")
                idx[f"{tp}.ff.net.2"] = (fp + ("ff", "out"), "linear")
    return idx


def convert_fps_embedder(other_sd: SD, cfg: VideoCrafterUNetConfig, policy=None):
    """Map a checkpoint's ``cond_stage2_model.*`` weights onto the
    t2v ``FPSEmbedder`` (sample_utils.py:65-71; the reference's bundled
    LVDM does not ship the embedder class, so the expected layout is a
    2-layer MLP over a sinusoidal fps embedding — any two Linear layers
    found under the prefix are mapped in order). Falls back to a fresh
    random init (with a warning) when the checkpoint carries no embedder
    weights or their shapes don't fit."""
    import jax

    from t2v.core.dtypes import Policy
    from t2v.models.videocrafter_unet import FPSEmbedder

    policy = policy or Policy()
    emb = FPSEmbedder(model_channels=cfg.model_channels, policy=policy)
    want0 = (cfg.model_channels, cfg.model_channels * 4)
    want2 = (cfg.model_channels * 4, cfg.model_channels * 4)

    linears = []
    for k in sorted(other_sd):
        if k.startswith("cond_stage2_model.") and k.endswith(".weight"):
            w = other_sd[k]
            if getattr(w, "ndim", 0) == 2:
                linears.append((k[: -len(".weight")], w))
    if len(linears) == 2:
        maps = {}
        ok = True
        for (path, w), name, want in zip(
            linears, ("fps_embed_0", "fps_embed_2"), (want0, want2)
        ):
            kernel = np.ascontiguousarray(np.asarray(w).T)
            if kernel.shape != want:
                ok = False
                break
            bias = other_sd.get(f"{path}.bias")
            maps[name] = {
                "kernel": kernel,
                "bias": np.asarray(bias) if bias is not None
                else np.zeros(want[1], np.float32),
            }
        if ok:
            return {"params": maps}
    import warnings

    warnings.warn(
        "checkpoint declares cond_stage2 (FPS) conditioning but carries no "
        "compatible cond_stage2_model weights; initialising the FPS "
        "embedder randomly"
    )
    import jax.numpy as jnp

    return jax.jit(emb.init)(jax.random.key(0), jnp.zeros((1,)))
