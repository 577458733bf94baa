"""Flax UNetSD — the ModelScope 1.7B 3D-factorised text2video UNet.

Topology mirrors reference t2v_model.py:98-326 exactly (so original
``text2video_pytorch_model.pth`` checkpoints map 1:1), but the execution is
TPU-first: channels-last layouts, one fused ``(B·F)`` spatial batch, Pallas
flash attention, fp32 norm statistics under a bf16 compute policy.

Layer order per encoder stage (t2v_model.py:166-229):
  init: Conv2d + TemporalTransformer
  per scale i, block j: ResBlock [+ SpatialTransformer + TemporalTransformer
  when scale ∈ attn_scales]; Downsample after the last block of non-final
  scales. Middle: Res + Spatial + Temporal + Res (:232-270). Decoder mirrors
  with skip-concat and Upsample (:273-318). Head: GN + SiLU + zero Conv
  (:321-326).

The topology is built once as a list of descriptors shared by the module
and the checkpoint converter (t2v/io/convert.py), which keeps the torch
key ↔ flax path mapping mechanical.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from t2v.core.config import ModelScopeUNetConfig
from t2v.core.dtypes import Policy
from t2v.models import blocks as B


@dataclass(frozen=True)
class BlockDesc:
    """One sub-module of the UNet graph.

    kind: conv_in | res | spatial | temporal | downsample | upsample
    flax_name: the linen submodule name
    torch_path: the reference state_dict prefix (e.g. "input_blocks.1.0")
    """

    kind: str
    flax_name: str
    torch_path: str
    in_ch: int = 0
    out_ch: int = 0
    heads: int = 0


@dataclass(frozen=True)
class Topology:
    encoder: tuple[tuple[BlockDesc, ...], ...]  # per input_blocks entry
    middle: tuple[BlockDesc, ...]
    decoder: tuple[tuple[BlockDesc, ...], ...]  # per output_blocks entry


def build_topology(cfg: ModelScopeUNetConfig) -> Topology:
    enc_dims = [cfg.dim * u for u in (1, *cfg.dim_mult)]
    dec_dims = [cfg.dim * u for u in (cfg.dim_mult[-1], *cfg.dim_mult[::-1])]
    shortcut_dims: list[int] = []
    scale = 1.0

    encoder: list[tuple[BlockDesc, ...]] = []
    # init block (torch input_blocks.0)
    init = [
        BlockDesc("conv_in", "input_0_0", "input_blocks.0.0", cfg.in_dim, cfg.dim)
    ]
    if cfg.temporal_attention:
        init.append(
            BlockDesc(
                "temporal", "input_0_1", "input_blocks.0.1", cfg.dim, cfg.dim,
                heads=cfg.num_heads,
            )
        )
    encoder.append(tuple(init))
    shortcut_dims.append(cfg.dim)

    idx = 1
    for i, (din, dout) in enumerate(zip(enc_dims[:-1], enc_dims[1:])):
        for j in range(cfg.num_res_blocks):
            entry = [
                BlockDesc("res", f"input_{idx}_0", f"input_blocks.{idx}.0", din, dout)
            ]
            if scale in cfg.attn_scales:
                entry.append(
                    BlockDesc(
                        "spatial", f"input_{idx}_1", f"input_blocks.{idx}.1", dout, dout
                    )
                )
                if cfg.temporal_attention:
                    entry.append(
                        BlockDesc(
                            "temporal",
                            f"input_{idx}_2",
                            f"input_blocks.{idx}.2",
                            dout,
                            dout,
                        )
                    )
            encoder.append(tuple(entry))
            shortcut_dims.append(dout)
            din = dout
            idx += 1
            if i != len(cfg.dim_mult) - 1 and j == cfg.num_res_blocks - 1:
                encoder.append(
                    (
                        BlockDesc(
                            "downsample",
                            f"input_{idx}_down",
                            f"input_blocks.{idx}",
                            dout,
                            dout,
                        ),
                    )
                )
                shortcut_dims.append(dout)
                scale /= 2.0
                idx += 1

    out_ch = enc_dims[-1]
    middle = [
        BlockDesc("res", "middle_0", "middle_block.0", out_ch, out_ch),
        BlockDesc("spatial", "middle_1", "middle_block.1", out_ch, out_ch),
    ]
    mi = 2
    if cfg.temporal_attention:
        middle.append(
            BlockDesc("temporal", "middle_2", f"middle_block.{mi}", out_ch, out_ch)
        )
        mi += 1
    middle.append(
        BlockDesc("res", f"middle_{mi}", f"middle_block.{mi}", out_ch, out_ch)
    )

    decoder: list[tuple[BlockDesc, ...]] = []
    idx = 0
    for i, (din, dout) in enumerate(zip(dec_dims[:-1], dec_dims[1:])):
        for j in range(cfg.num_res_blocks + 1):
            skip = shortcut_dims.pop()
            entry = [
                BlockDesc(
                    "res",
                    f"output_{idx}_0",
                    f"output_blocks.{idx}.0",
                    din + skip,
                    dout,
                )
            ]
            ti = 1
            if scale in cfg.attn_scales:
                entry.append(
                    BlockDesc(
                        "spatial",
                        f"output_{idx}_1",
                        f"output_blocks.{idx}.1",
                        dout,
                        dout,
                    )
                )
                ti = 2
                if cfg.temporal_attention:
                    entry.append(
                        BlockDesc(
                            "temporal",
                            f"output_{idx}_2",
                            f"output_blocks.{idx}.2",
                            dout,
                            dout,
                        )
                    )
                    ti = 3
            din = dout
            if i != len(cfg.dim_mult) - 1 and j == cfg.num_res_blocks:
                entry.append(
                    BlockDesc(
                        "upsample",
                        f"output_{idx}_up",
                        f"output_blocks.{idx}.{ti}",
                        dout,
                        dout,
                    )
                )
                scale *= 2.0
            decoder.append(tuple(entry))
            idx += 1

    return Topology(tuple(encoder), tuple(middle), tuple(decoder))


class UNetSD(nn.Module):
    """apply(params, x, t, context) -> eps prediction.

    x: (B, F, H, W, in_dim)   latent video, channels-last
    t: (B,)                   timesteps (float or int)
    context: (B, L, context_dim) text conditioning
    returns (B, F, H, W, out_dim)
    """

    cfg: ModelScopeUNetConfig
    policy: Policy = Policy()

    def _make(self, d: BlockDesc, frames: int):
        p = self.policy
        cfg = self.cfg
        if d.kind == "conv_in":
            return nn.Conv(
                d.out_ch,
                kernel_size=(3, 3),
                padding=((1, 1), (1, 1)),
                name=d.flax_name,
                dtype=p.compute_dtype,
                param_dtype=p.param_dtype,
            )
        if d.kind == "res":
            return B.ResBlock(
                channels=d.in_ch,
                emb_channels=cfg.embed_dim,
                out_channels=d.out_ch,
                frames=frames,
                policy=p,
                name=d.flax_name,
            )
        if d.kind == "spatial":
            return B.SpatialTransformer(
                channels=d.out_ch,
                heads=d.out_ch // cfg.head_dim,
                dim_head=cfg.head_dim,
                context_dim=cfg.context_dim,
                policy=p,
                name=d.flax_name,
            )
        if d.kind == "temporal":
            heads = d.heads or d.out_ch // cfg.head_dim
            return B.TemporalTransformer(
                channels=d.out_ch,
                heads=heads,
                dim_head=cfg.head_dim,
                policy=p,
                name=d.flax_name,
            )
        if d.kind == "downsample":
            return B.Downsample(channels=d.out_ch, policy=p, name=d.flax_name)
        if d.kind == "upsample":
            return B.Upsample(channels=d.out_ch, policy=p, name=d.flax_name)
        raise ValueError(d.kind)

    def _apply_block(self, d: BlockDesc, x, e, ctx, b, f):
        mod = self._make(d, f)
        if d.kind in ("conv_in", "downsample", "upsample"):
            return mod(x)
        if d.kind == "res":
            return mod(x, e)
        if d.kind == "spatial":
            return mod(x, context=ctx)
        if d.kind == "temporal":
            bf, h, w, c = x.shape
            x5 = x.reshape(b, f, h, w, c)
            x5 = mod(x5)
            return x5.reshape(bf, h, w, c)
        raise ValueError(d.kind)

    @nn.compact
    def __call__(
        self, x, t, context, *,
        deep_feature=None, return_deep: bool = False, cache_split: int = 1,
    ):
        """deep_feature / return_deep implement DeepCache-style feature
        reuse ("Cache Me if You Can", PAPERS.md; block caching): the UNet
        splits after the first ``cache_split`` encoder entries. A *full*
        pass with return_deep=True also returns the deep-trunk output (the
        activation entering the last ``cache_split`` decoder entries);
        passing that back as ``deep_feature`` on subsequent steps skips the
        entire deep trunk — only the shallow encoder head and decoder tail
        (whose inputs change fastest across timesteps) are recomputed."""
        cfg = self.cfg
        p = self.policy
        b, f, h, w, _ = x.shape
        topo = build_topology(cfg)

        # time embedding (t2v_model.py:414-421): Linear, SiLU, Linear
        e = B.sinusoidal_embedding(t, cfg.dim)
        dense = lambda feats, name: nn.Dense(
            feats, name=name, dtype=p.compute_dtype, param_dtype=p.param_dtype
        )
        e = dense(cfg.embed_dim, "time_embed_0")(e.astype(p.compute_dtype))
        e = dense(cfg.embed_dim, "time_embed_2")(jax.nn.silu(e))

        # repeat per frame, matching torch repeat_interleave(f, dim=0)
        # ordering (t2v_model.py:425-426). The context IS repeated: the
        # shared-context variant (k/v once per sample, frame axis merged
        # into the query rows) benched 134 ms slower end-to-end bundled
        # with its layout changes — see blocks.py's perf-history note.
        e_f = jnp.repeat(e, f, axis=0)
        ctx_f = jnp.repeat(context.astype(p.compute_dtype), f, axis=0)

        x = x.astype(p.compute_dtype).reshape(b * f, h, w, x.shape[-1])

        cached = deep_feature is not None
        n_dec = len(topo.decoder)
        split = cache_split if (cached or return_deep) else 0

        xs = []
        for ei, entry in enumerate(topo.encoder):
            if cached and ei >= split:
                break
            for d in entry:
                x = self._apply_block(d, x, e_f, ctx_f, b, f)
            xs.append(x)

        deep_out = None
        if cached:
            x = deep_feature.astype(p.compute_dtype)
        else:
            for d in topo.middle:
                x = self._apply_block(d, x, e_f, ctx_f, b, f)

        dec_entries = topo.decoder[n_dec - split :] if cached else topo.decoder
        for di, entry in enumerate(dec_entries):
            if return_deep and not cached and di == n_dec - split:
                deep_out = x
            # skip-concat (t2v_model.py:316-318) is virtual: the leading
            # res block takes the (x, skip) pair and never materialises
            # the concatenated tensor (joint-stats GN + split convs)
            x = self._apply_block(entry[0], (x, xs.pop()), e_f, ctx_f, b, f)
            for d in entry[1:]:
                x = self._apply_block(d, x, e_f, ctx_f, b, f)

        # head (t2v_model.py:321-326), zero-init conv
        x = B.GroupNorm32(policy=p, fuse_silu=True, name="head_norm")(x)
        x = nn.Conv(
            cfg.out_dim,
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            name="head_conv",
            kernel_init=nn.initializers.zeros,
            dtype=p.compute_dtype,
            param_dtype=p.param_dtype,
        )(x)
        out = x.reshape(b, f, h, w, cfg.out_dim)
        if return_deep and not cached:
            return out, deep_out
        return out
