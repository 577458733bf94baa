"""Torch state_dict → Flax param-tree converters.

Mechanical weight layout translation for the reference model zoo:
  * ``convert_unet``  — ModelScope ``text2video_pytorch_model.pth``
    (UNetSD, t2v_model.py:98-326) → t2v.models.modelscope_unet.UNetSD,
    driven by the shared ``build_topology`` descriptors;
  * ``convert_vae``   — ``VQGAN_autoencoder.pth`` (keys filtered by the
    ``first_stage_model.`` prefix, t2v_model.py:1619-1631) →
    t2v.models.vae.AutoencoderKL.

Layout rules:
  Linear  (out,in)        -> Dense kernel (in,out)            [transpose]
  Conv2d  (out,in,kh,kw)  -> Conv kernel (kh,kw,in,out)       [(2,3,1,0)]
  Conv3d  (out,in,kt,kh,kw)-> Conv kernel (kt,kh,kw,in,out)   [(2,3,4,1,0)]
  Conv1d k=1 (out,in,1)   -> Dense kernel (in,out)            [squeeze+T]
  Norm    weight/bias     -> scale/bias
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from t2v.core.config import ModelScopeUNetConfig, VAEConfig
from t2v.models.modelscope_unet import BlockDesc, Topology, build_topology

Array = np.ndarray
SD = Mapping[str, Array]


def _linear(sd: SD, p: str, bias: bool = True) -> dict:
    out = {"kernel": np.ascontiguousarray(sd[f"{p}.weight"].T)}
    if bias:
        out["bias"] = sd[f"{p}.bias"]
    return out


def _conv2d(sd: SD, p: str) -> dict:
    return {
        "kernel": np.ascontiguousarray(sd[f"{p}.weight"].transpose(2, 3, 1, 0)),
        "bias": sd[f"{p}.bias"],
    }


def _conv3d(sd: SD, p: str) -> dict:
    return {
        "kernel": np.ascontiguousarray(sd[f"{p}.weight"].transpose(2, 3, 4, 1, 0)),
        "bias": sd[f"{p}.bias"],
    }


def _conv1d_as_dense(sd: SD, p: str) -> dict:
    return {
        "kernel": np.ascontiguousarray(sd[f"{p}.weight"][:, :, 0].T),
        "bias": sd[f"{p}.bias"],
    }


def _norm(sd: SD, p: str) -> dict:
    return {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}


def _gn32(sd: SD, p: str) -> dict:
    # t2v.models.blocks.GroupNorm32 wraps an anonymous nn.GroupNorm
    return {"GroupNorm_0": _norm(sd, p)}


def _basic_transformer_block(sd: SD, p: str) -> dict:
    """BasicTransformerBlock (t2v_model.py:770-809)."""
    out = {}
    for attn in ("attn1", "attn2"):
        out[attn] = {
            "to_q": _linear(sd, f"{p}.{attn}.to_q", bias=False),
            "to_k": _linear(sd, f"{p}.{attn}.to_k", bias=False),
            "to_v": _linear(sd, f"{p}.{attn}.to_v", bias=False),
            "to_out": _linear(sd, f"{p}.{attn}.to_out.0"),
        }
    out["norm1"] = _norm(sd, f"{p}.norm1")
    out["norm2"] = _norm(sd, f"{p}.norm2")
    out["norm3"] = _norm(sd, f"{p}.norm3")
    out["ff"] = {
        "geglu": _linear(sd, f"{p}.ff.net.0.proj"),
        "out": _linear(sd, f"{p}.ff.net.2"),
    }
    return out


def _spatial_transformer(sd: SD, p: str) -> dict:
    return {
        "norm": _gn32(sd, f"{p}.norm"),
        "proj_in": _linear(sd, f"{p}.proj_in"),
        "block_0": _basic_transformer_block(sd, f"{p}.transformer_blocks.0"),
        "proj_out": _linear(sd, f"{p}.proj_out"),
    }


def _temporal_transformer(sd: SD, p: str) -> dict:
    # use_linear=False: Conv1d k=1 projections (t2v_model.py:694-716)
    return {
        "norm": _gn32(sd, f"{p}.norm"),
        "proj_in": _conv1d_as_dense(sd, f"{p}.proj_in"),
        "block_0": _basic_transformer_block(sd, f"{p}.transformer_blocks.0"),
        "proj_out": _conv1d_as_dense(sd, f"{p}.proj_out"),
    }


def _temporal_conv(sd: SD, p: str) -> dict:
    # note the reference's 'temopral_conv' attribute typo; conv1 nests the
    # Conv3d at index 2, conv2..4 (with Dropout) at index 3
    out = {}
    for i in range(1, 5):
        ci = 2 if i == 1 else 3
        out[f"norm{i}"] = _gn32(sd, f"{p}.conv{i}.0")
        out[f"conv{i}"] = _conv3d(sd, f"{p}.conv{i}.{ci}")
    return out


def _res_block(sd: SD, p: str, has_skip: bool) -> dict:
    out = {
        "in_norm": _gn32(sd, f"{p}.in_layers.0"),
        "in_conv": _conv2d(sd, f"{p}.in_layers.2"),
        "emb": _linear(sd, f"{p}.emb_layers.1"),
        "out_norm": _gn32(sd, f"{p}.out_layers.0"),
        "out_conv": _conv2d(sd, f"{p}.out_layers.3"),
        "temporal_conv": _temporal_conv(sd, f"{p}.temopral_conv"),
    }
    if has_skip:
        out["skip"] = _conv2d(sd, f"{p}.skip_connection")
    return out


def _convert_block(sd: SD, d: BlockDesc) -> dict:
    if d.kind == "conv_in":
        return _conv2d(sd, d.torch_path)
    if d.kind == "res":
        return _res_block(sd, d.torch_path, has_skip=d.in_ch != d.out_ch)
    if d.kind == "spatial":
        return _spatial_transformer(sd, d.torch_path)
    if d.kind == "temporal":
        return _temporal_transformer(sd, d.torch_path)
    if d.kind == "downsample":
        return {"op": _conv2d(sd, f"{d.torch_path}.op")}
    if d.kind == "upsample":
        return {"conv": _conv2d(sd, f"{d.torch_path}.conv")}
    raise ValueError(d.kind)


def convert_unet(sd: SD, cfg: ModelScopeUNetConfig) -> dict:
    """ModelScope UNet state_dict → flax variables {'params': ...}."""
    topo = build_topology(cfg)
    params: dict[str, Any] = {
        "time_embed_0": _linear(sd, "time_embed.0"),
        "time_embed_2": _linear(sd, "time_embed.2"),
        "head_norm": _gn32(sd, "out.0"),
        "head_conv": _conv2d(sd, "out.2"),
    }
    for entry in (*topo.encoder, topo.middle, *topo.decoder):
        for d in entry:
            params[d.flax_name] = _convert_block(sd, d)
    return {"params": params}


# --------------------------------------------------------------------------
# VAE


def strip_first_stage_prefix(sd: SD) -> dict[str, Array]:
    """VQGAN_autoencoder.pth wraps everything under a top-level
    'state_dict' key and carries 'first_stage_model.' prefixes — the
    reference loads ``torch.load(path)['state_dict']`` and keeps only the
    prefixed keys (t2v_model.py:1619-1631); loss.* keys are discarded."""
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        if "first_stage_model" in k:
            k = k.split("first_stage_model.")[-1]
        if k.startswith("loss."):
            continue
        out[k] = v
    return out


def _vae_resnet(sd: SD, p: str, has_nin: bool) -> dict:
    out = {
        "norm1": _norm(sd, f"{p}.norm1"),
        "conv1": _conv2d(sd, f"{p}.conv1"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "conv2": _conv2d(sd, f"{p}.conv2"),
    }
    if has_nin:
        out["nin_shortcut"] = _conv2d(sd, f"{p}.nin_shortcut")
    return out


def _vae_attn(sd: SD, p: str) -> dict:
    return {
        "norm": _norm(sd, f"{p}.norm"),
        "q": _conv2d(sd, f"{p}.q"),
        "k": _conv2d(sd, f"{p}.k"),
        "v": _conv2d(sd, f"{p}.v"),
        "proj_out": _conv2d(sd, f"{p}.proj_out"),
    }


def convert_vae(sd: SD, cfg: VAEConfig) -> dict:
    sd = strip_first_stage_prefix(sd)
    nm = len(cfg.ch_mult)

    def has_nin(prefix: str) -> bool:
        return f"{prefix}.nin_shortcut.weight" in sd

    enc: dict[str, Any] = {
        "conv_in": _conv2d(sd, "encoder.conv_in"),
        "mid_block_1": _vae_resnet(sd, "encoder.mid.block_1", has_nin("encoder.mid.block_1")),
        "mid_attn_1": _vae_attn(sd, "encoder.mid.attn_1"),
        "mid_block_2": _vae_resnet(sd, "encoder.mid.block_2", has_nin("encoder.mid.block_2")),
        "norm_out": _norm(sd, "encoder.norm_out"),
        "conv_out": _conv2d(sd, "encoder.conv_out"),
    }
    for i in range(nm):
        for j in range(cfg.num_res_blocks):
            p = f"encoder.down.{i}.block.{j}"
            enc[f"down_{i}_block_{j}"] = _vae_resnet(sd, p, has_nin(p))
            if f"encoder.down.{i}.attn.{j}.norm.weight" in sd:
                enc[f"down_{i}_attn_{j}"] = _vae_attn(sd, f"encoder.down.{i}.attn.{j}")
        if f"encoder.down.{i}.downsample.conv.weight" in sd:
            enc[f"down_{i}_downsample"] = {
                "conv": _conv2d(sd, f"encoder.down.{i}.downsample.conv")
            }

    dec: dict[str, Any] = {
        "conv_in": _conv2d(sd, "decoder.conv_in"),
        "mid_block_1": _vae_resnet(sd, "decoder.mid.block_1", has_nin("decoder.mid.block_1")),
        "mid_attn_1": _vae_attn(sd, "decoder.mid.attn_1"),
        "mid_block_2": _vae_resnet(sd, "decoder.mid.block_2", has_nin("decoder.mid.block_2")),
        "norm_out": _norm(sd, "decoder.norm_out"),
        "conv_out": _conv2d(sd, "decoder.conv_out"),
    }
    for i in range(nm):
        for j in range(cfg.num_res_blocks + 1):
            p = f"decoder.up.{i}.block.{j}"
            dec[f"up_{i}_block_{j}"] = _vae_resnet(sd, p, has_nin(p))
            if f"decoder.up.{i}.attn.{j}.norm.weight" in sd:
                dec[f"up_{i}_attn_{j}"] = _vae_attn(sd, f"decoder.up.{i}.attn.{j}")
        if f"decoder.up.{i}.upsample.conv.weight" in sd:
            dec[f"up_{i}_upsample"] = {
                "conv": _conv2d(sd, f"decoder.up.{i}.upsample.conv")
            }

    return {
        "params": {
            "encoder": enc,
            "decoder": dec,
            "quant_conv": _conv2d(sd, "quant_conv"),
            "post_quant_conv": _conv2d(sd, "post_quant_conv"),
        }
    }


# --------------------------------------------------------------------------
# torch-module → flax-path index (LoRA merge support)

_KIND_BY_SUFFIX = {
    "linear": "linear",
    "conv2d": "conv2d",
    "conv3d": "conv3d",
    "conv1d": "conv1d",
}


def torch_module_index(cfg: ModelScopeUNetConfig) -> dict[str, tuple[tuple[str, ...], str]]:
    """Map every weight-bearing torch module path of UNetSD to its flax
    param path and layout kind ("linear"|"conv2d"|"conv3d"|"conv1d").

    Used by the stable-lora merge (t2v/pipeline/lora.py), whose files key
    deltas by torch module name (lora_processor.py:202-247).
    """
    idx: dict[str, tuple[tuple[str, ...], str]] = {}

    def add(tp: str, fp: tuple[str, ...], kind: str):
        idx[tp] = (fp, kind)

    def add_btb(tp: str, fp: tuple[str, ...]):
        for attn in ("attn1", "attn2"):
            for proj in ("to_q", "to_k", "to_v"):
                add(f"{tp}.{attn}.{proj}", fp + (attn, proj), "linear")
            add(f"{tp}.{attn}.to_out.0", fp + (attn, "to_out"), "linear")
        add(f"{tp}.ff.net.0.proj", fp + ("ff", "geglu"), "linear")
        add(f"{tp}.ff.net.2", fp + ("ff", "out"), "linear")

    def add_block(d: BlockDesc):
        fp = (d.flax_name,)
        tp = d.torch_path
        if d.kind == "conv_in":
            add(tp, fp, "conv2d")
        elif d.kind == "res":
            add(f"{tp}.in_layers.2", fp + ("in_conv",), "conv2d")
            add(f"{tp}.emb_layers.1", fp + ("emb",), "linear")
            add(f"{tp}.out_layers.3", fp + ("out_conv",), "conv2d")
            if d.in_ch != d.out_ch:
                add(f"{tp}.skip_connection", fp + ("skip",), "conv2d")
            for i in range(1, 5):
                ci = 2 if i == 1 else 3
                add(
                    f"{tp}.temopral_conv.conv{i}.{ci}",
                    fp + ("temporal_conv", f"conv{i}"),
                    "conv3d",
                )
        elif d.kind in ("spatial", "temporal"):
            proj_kind = "linear" if d.kind == "spatial" else "conv1d"
            add(f"{tp}.proj_in", fp + ("proj_in",), proj_kind)
            add(f"{tp}.proj_out", fp + ("proj_out",), proj_kind)
            add_btb(f"{tp}.transformer_blocks.0", fp + ("block_0",))
        elif d.kind == "downsample":
            add(f"{tp}.op", fp + ("op",), "conv2d")
        elif d.kind == "upsample":
            add(f"{tp}.conv", fp + ("conv",), "conv2d")

    add("time_embed.0", ("time_embed_0",), "linear")
    add("time_embed.2", ("time_embed_2",), "linear")
    add("out.2", ("head_conv",), "conv2d")
    topo = build_topology(cfg)
    for entry in (*topo.encoder, topo.middle, *topo.decoder):
        for d in entry:
            add_block(d)
    return idx


def clip_module_index(cfg) -> dict[str, tuple[tuple[str, ...], str]]:
    """Stable-lora module index for the OpenCLIP text tower.

    The reference merges CLIP LoRAs against ``clip_encoder.model.
    transformer`` (lora_webui.py:187), so lora-file keys are named relative
    to the *transformer* submodule (``resblocks.N.attn.out_proj`` …), and
    modules outside it (token_embedding, ln_final) are unreachable there.
    Only nn.Linear leaves match (the fused attn in_proj is not a Linear
    module, lora_processor.py:219-230)."""
    idx: dict[str, tuple[tuple[str, ...], str]] = {}
    n_layers = cfg.layers - (1 if cfg.layer == "penultimate" else 0)
    for i in range(n_layers):
        tp = f"resblocks.{i}"
        fp = (f"resblock_{i}",)
        idx[f"{tp}.attn.out_proj"] = (fp + ("out_proj",), "linear")
        idx[f"{tp}.mlp.c_fc"] = (fp + ("c_fc",), "linear")
        idx[f"{tp}.mlp.c_proj"] = (fp + ("c_proj",), "linear")
    return idx
