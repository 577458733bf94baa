"""Flax LVDM UNetModel — the VideoCrafter 3D UNet.

Architecture per reference lvdm (openaimodel3d.py:281-670 with the base_t2v
config model_config.yaml: model_channels 320, channel_mult (1,2,4,4),
num_res_blocks 2, attention_resolutions {1,2,4}, heads 8, context 768,
kernel_size_t=1 / padding_t=0, temporal_length 16, relative position on).

TPU-first observations exploited here:
  * with kernel_size_t=1 every Conv3d is a per-frame 2D conv — executed as
    one batched ``(B·T, H, W, C)`` NHWC conv (kt>1 falls back to NDHWC 3D);
  * GroupNorm statistics span (C/g, T, H, W) per sample (lvdm
    normalization uses 5D inputs) — computed on the full 5D tensor;
  * the ST block's four attentions (spatial self → temporal self w/
    relative position → spatial cross → temporal self → FF,
    attention_temporal.py:298-335) run through the shared attention
    dispatch (Pallas flash for long token axes);
  * temporal q/k/v/out are zero-initialised (attention_temporal.py:101-105)
    so image-pretrained weights start as identity on the time axis.

Checkpoint keys map 1:1 from Lightning ``model.ckpt``'s
``model.diffusion_model.*`` prefix (sample_utils.py:13-28).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from t2v.core.dtypes import Policy
from t2v.models import blocks as B
from t2v.models.blocks import _tokens_2d


@dataclass(frozen=True)
class VideoCrafterUNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_resolutions: tuple[int, ...] = (1, 2, 4)
    channel_mult: tuple[int, ...] = (1, 2, 4, 4)
    num_heads: int = 8
    transformer_depth: int = 1
    context_dim: int = 768
    kernel_size_t: int = 1
    padding_t: int = 0
    temporal_length: int = 16
    use_relative_position: bool = True
    num_classes: Optional[int] = None  # class-conditional label_emb (adm)
    conditioning_key: str = "crossattn"  # DiffusionWrapper mode (ddpm3d.py:1362)
    # second conditioning stage (FPS embedder): "temporal_context" enables
    # cond_fps-driven generation (sample_utils.py:65-71); None = absent
    cond_stage2_key: Optional[str] = None
    parameterization: str = "eps"  # "eps" | "x0" | "v" (ddpm3d.py:76-84)
    num_timesteps: int = 1000
    linear_start: float = 0.00085
    linear_end: float = 0.012
    scale_factor: float = 0.18215

    @classmethod
    def from_yaml_dict(cls, cfg: dict) -> "VideoCrafterUNetConfig":
        """Parse the OmegaConf-style model_config.yaml dict
        (process_videocrafter.py:23-31)."""
        m = cfg["model"]["params"]
        u = m["unet_config"]["params"]
        return cls(
            in_channels=u["in_channels"],
            out_channels=u["out_channels"],
            model_channels=u["model_channels"],
            num_res_blocks=u["num_res_blocks"],
            attention_resolutions=tuple(u["attention_resolutions"]),
            channel_mult=tuple(u["channel_mult"]),
            num_heads=u["num_heads"],
            transformer_depth=u.get("transformer_depth", 1),
            context_dim=u["context_dim"],
            kernel_size_t=u.get("kernel_size_t", 1),
            padding_t=u.get("padding_t", 0),
            temporal_length=u.get("temporal_length", 16),
            use_relative_position=u.get("use_relative_position", True),
            num_classes=u.get("num_classes"),
            conditioning_key=m.get("conditioning_key", "crossattn"),
            cond_stage2_key=(
                m.get("cond_stage2_key", "temporal_context")
                if m.get("cond_stage2_config") is not None
                else m.get("cond_stage2_key")
            ),
            parameterization=m.get("parameterization", "eps"),
            num_timesteps=m.get("timesteps", 1000),
            linear_start=m.get("linear_start", 0.00085),
            linear_end=m.get("linear_end", 0.012),
            scale_factor=m.get("scale_factor", 0.18215),
        )

    def tiny(self) -> "VideoCrafterUNetConfig":
        import dataclasses

        return dataclasses.replace(
            self,
            model_channels=32,
            context_dim=32,
            num_heads=2,
            num_res_blocks=1,
            channel_mult=(1, 2),
            attention_resolutions=(1,),
            temporal_length=4,
        )


class Conv3dFactorized(nn.Module):
    """conv_nd(3, (kt,3,3)) — executed as a per-frame 2D conv when kt==1.
    Input (B, T, H, W, C)."""

    features: int
    kernel_size_t: int = 1
    padding_t: int = 0
    spatial_kernel: int = 3
    spatial_stride: int = 1
    spatial_padding: int = 1
    zero_init: bool = False
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x):
        p = self.policy
        init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        sk, sp, ss = self.spatial_kernel, self.spatial_padding, self.spatial_stride
        if isinstance(x, tuple):
            # virtual channel-concat input: kernel split along input
            # channels, concat never materialised (decoder skip path)
            assert ss == 1
            return B.SplitConv(
                features=self.features,
                kernel_size=(self.kernel_size_t, sk, sk),
                padding=(
                    (self.padding_t, self.padding_t), (sp, sp), (sp, sp)
                ),
                zero_init=self.zero_init,
                policy=p,
                name="conv",
            )(*x)
        b, t, h, w, c = x.shape
        if self.kernel_size_t == 1:
            conv = nn.Conv(
                self.features,
                kernel_size=(1, sk, sk),
                strides=(1, ss, ss),
                padding=((0, 0), (sp, sp), (sp, sp)),
                name="conv",
                kernel_init=init,
                dtype=p.compute_dtype,
                param_dtype=p.param_dtype,
            )
            # kt==1 kernel: the 3D conv is spatially factorised; XLA treats
            # the singleton depth dim as free
            return conv(x)
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel_size_t, sk, sk),
            strides=(1, ss, ss),
            padding=(
                (self.padding_t, self.padding_t),
                (sp, sp),
                (sp, sp),
            ),
            name="conv",
            kernel_init=init,
            dtype=p.compute_dtype,
            param_dtype=p.param_dtype,
        )(x)


class ResBlock3D(nn.Module):
    """LVDM ResBlock (openaimodel3d.py:135-271). Input (B, T, H, W, C)."""

    channels: int
    out_channels: int
    emb_channels: int
    kernel_size_t: int = 1
    padding_t: int = 0
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x, emb):
        p = self.policy
        # decoder blocks may pass the (upsampled, skip) pair instead of the
        # channel concat (openaimodel3d.py th.cat); see blocks.SplitConv
        pair = isinstance(x, tuple)
        if pair:
            na, nb = B.GroupNorm32(policy=p, fuse_silu=True, name="in_norm")(x)
            h = Conv3dFactorized(
                self.out_channels, self.kernel_size_t, self.padding_t,
                policy=p, name="in_conv",
            )((na, nb))
        else:
            h = B.GroupNorm32(policy=p, fuse_silu=True, name="in_norm")(x)
            h = Conv3dFactorized(
                self.out_channels, self.kernel_size_t, self.padding_t,
                policy=p, name="in_conv",
            )(h)
        emb_out = nn.Dense(
            self.out_channels, name="emb",
            dtype=p.compute_dtype, param_dtype=p.param_dtype,
        )(jax.nn.silu(emb))
        h = h + emb_out[:, None, None, None, :]
        h = B.GroupNorm32(policy=p, fuse_silu=True, name="out_norm")(h)
        h = Conv3dFactorized(
            self.out_channels, self.kernel_size_t, self.padding_t,
            zero_init=True, policy=p, name="out_conv",
        )(h)
        if pair:
            # concat widens the input, so the 1x1x1 projection is always
            # present on this path
            assert self.out_channels != self.channels
            skip = B.SplitConv(
                features=self.out_channels, kernel_size=(1, 1, 1),
                policy=p, name="skip",
            )(*x)
        elif self.out_channels == self.channels:
            skip = x
        else:
            skip = nn.Conv(
                self.out_channels, kernel_size=(1, 1, 1), name="skip",
                dtype=p.compute_dtype, param_dtype=p.param_dtype,
            )(x)
        return skip + h


class RelativePosition(nn.Module):
    """Learned relative-position table (attention_temporal.py:46-65)."""

    num_units: int
    max_relative_position: int
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, length_q: int, length_k: int):
        table = self.param(
            "embeddings_table",
            nn.initializers.xavier_uniform(),
            (self.max_relative_position * 2 + 1, self.num_units),
            self.policy.param_dtype,
        )
        rq = np.arange(length_q)
        rk = np.arange(length_k)
        dist = np.clip(
            rk[None, :] - rq[:, None],
            -self.max_relative_position,
            self.max_relative_position,
        ) + self.max_relative_position
        return table[jnp.asarray(dist)]


class TemporalCrossAttention(nn.Module):
    """Temporal self-attention with relative-position score/value bias
    (attention_temporal.py:68-144); q/k/v/out zero-init.

    Input contracts:
      * default — (B', T, C) frame tokens (the reference layout);
      * ``frame_split=t`` — (B·t, N, C) sample-major SPATIAL tokens: the
        per-token q/k/v projections run in the resident layout and only
        the head fold crosses to the frame axis, so the surrounding block
        never materialises a frame-minor relayout of the full tensor.
        The relative-position bias rules out the packed Pallas temporal
        kernel here (score AND value biases depend on the attention
        weights per head), so the fold transposes stay — but on q/k/v
        only, not on the block residual stream."""

    query_dim: int
    heads: int
    dim_head: int
    temporal_length: Optional[int] = None
    use_relative_position: bool = True
    frame_split: Optional[int] = None
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x, mask=None):
        p = self.policy
        inner = self.heads * self.dim_head
        dense = lambda feats, name, bias=True: nn.Dense(
            feats, use_bias=bias, name=name,
            kernel_init=nn.initializers.zeros,
            dtype=p.compute_dtype, param_dtype=p.param_dtype,
        )
        q = _tokens_2d(dense(inner, "to_q", bias=False), x)
        k = _tokens_2d(dense(inner, "to_k", bias=False), x)
        v = _tokens_2d(dense(inner, "to_v", bias=False), x)
        scale = self.dim_head**-0.5

        if self.frame_split and self.use_relative_position and mask is None:
            # rel-pos biases + head folds fused into one Pallas kernel:
            # q/k/v stay in the resident spatial-token layout and the
            # (B, t, n, h, d) HBM fold transposes never materialise —
            # the round-5 VC trace priced those folds at 20.9 ms/step of
            # `copy` (19%) plus relayout junk (kernels/relpos_mha.py).
            # GSPMD meshes and masked calls keep the XLA einsum path
            # (natively partitionable / general).
            from t2v.kernels.relpos_mha import fits, fused_relpos_temporal_mha

            t = self.frame_split
            bt, n, _ = x.shape
            backend = p.attention_backend
            on_tpu = jax.default_backend() == "tpu"
            if (
                backend in (None, "fused_interpret")
                and fits(n, t, inner, jnp.dtype(q.dtype).itemsize)
                and (on_tpu or backend == "fused_interpret")
            ):
                k2 = RelativePosition(
                    self.dim_head, self.temporal_length, policy=p,
                    name="relative_position_k",
                )(t, t)
                v2 = RelativePosition(
                    self.dim_head, self.temporal_length, policy=p,
                    name="relative_position_v",
                )(t, t)
                out = fused_relpos_temporal_mha(
                    q, k, v, k2, v2, heads=self.heads, frame_split=t,
                    scale=scale, interpret=not on_tpu,
                )
                return _tokens_2d(dense(self.query_dim, "to_out"), out)

        if self.frame_split:
            t = self.frame_split
            bt, n, _ = x.shape
            bb = bt // t
            fold = lambda z: (
                z.reshape(bb, t, n, self.heads, self.dim_head)
                .transpose(0, 2, 3, 1, 4)
                .reshape(bb * n * self.heads, t, self.dim_head)
            )
        else:
            b, t, _ = x.shape
            fold = lambda z: (
                z.reshape(b, t, self.heads, self.dim_head)
                .transpose(0, 2, 1, 3)
                .reshape(b * self.heads, t, self.dim_head)
            )
        q, k, v = fold(q), fold(k), fold(v)
        sim = jnp.einsum(
            "bid,bjd->bij", q, k, preferred_element_type=jnp.float32
        ) * scale
        if self.use_relative_position:
            k2 = RelativePosition(
                self.dim_head, self.temporal_length, policy=p,
                name="relative_position_k",
            )(t, t)
            sim = sim + jnp.einsum(
                "btd,tsd->bts", q, k2.astype(q.dtype),
                preferred_element_type=jnp.float32,
            ) * scale
        if mask is not None:
            sim = sim + (1.0 - mask.astype(jnp.float32)) * -1e9
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bij,bjd->bid", attn, v)
        if self.use_relative_position:
            v2 = RelativePosition(
                self.dim_head, self.temporal_length, policy=p,
                name="relative_position_v",
            )(t, t)
            out = out + jnp.einsum("bts,tsd->btd", attn, v2.astype(attn.dtype))
        if self.frame_split:
            out = (
                out.reshape(bb, n, self.heads, t, self.dim_head)
                .transpose(0, 3, 1, 2, 4)
                .reshape(bt, n, inner)
            )
        else:
            out = (
                out.reshape(b, self.heads, t, self.dim_head)
                .transpose(0, 2, 1, 3)
                .reshape(b, t, inner)
            )
        return _tokens_2d(dense(self.query_dim, "to_out"), out)


class BasicTransformerBlockST(nn.Module):
    """Spatial self → temporal self → spatial cross → temporal self → FF
    (attention_temporal.py:245-335). Input (B, T, H, W, C)."""

    dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    temporal_length: Optional[int] = None
    use_relative_position: bool = True
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x, context=None):
        p = self.policy
        b, t, h, w, c = x.shape
        ln = lambda name: nn.LayerNorm(
            epsilon=1e-5, name=name, dtype=jnp.float32, param_dtype=p.param_dtype
        )

        # The whole block stays resident in the spatial token layout
        # (B·T, H·W, C). The reference ping-pongs the residual stream
        # between (b t)(h w) and (b h w) t layouts per sublayer
        # (attention_temporal.py:298-335) — on TPU each hop is a full HBM
        # relayout and the frame-minor residency poisons downstream GEMM
        # layouts (see TemporalTransformer in blocks.py). LayerNorm, the
        # projections, and the FF are per-token, so they commute with the
        # transpose: only the temporal attention cores see the frame axis,
        # via their own head folds (TemporalCrossAttention.frame_split).
        dt = x.dtype
        xs = x.reshape(b * t, h * w, c)
        xs = B.CrossAttention(
            query_dim=self.dim, heads=self.heads, dim_head=self.dim_head,
            policy=p, name="attn1",
        )(ln("norm1")(xs).astype(dt)) + xs

        xs = TemporalCrossAttention(
            query_dim=self.dim, heads=self.heads, dim_head=self.dim_head,
            temporal_length=self.temporal_length,
            use_relative_position=self.use_relative_position,
            frame_split=t, policy=p, name="attn1_tmp",
        )(ln("norm4")(xs).astype(dt)) + xs

        # spatial cross attention. The reference repeats context per frame
        # (attention_temporal.py:317-324); here the un-repeated (B, L, D)
        # context goes straight in — CrossAttention detects the smaller
        # context batch, projects k/v once per sample, and merges the
        # frame axis into the query rows (free reshape, identical math).
        xs = B.CrossAttention(
            query_dim=self.dim, context_dim=self.context_dim,
            heads=self.heads, dim_head=self.dim_head, policy=p, name="attn2",
        )(ln("norm2")(xs).astype(dt), context=context) + xs

        xs = TemporalCrossAttention(
            query_dim=self.dim, heads=self.heads, dim_head=self.dim_head,
            temporal_length=self.temporal_length,
            use_relative_position=self.use_relative_position,
            frame_split=t, policy=p, name="attn2_tmp",
        )(ln("norm5")(xs).astype(dt)) + xs

        xs = B.GEGLUFeedForward(dim=self.dim, policy=p, name="ff")(
            ln("norm3")(xs).astype(dt)
        ) + xs
        return xs.reshape(b, t, h, w, c)


class SpatialTemporalTransformer(nn.Module):
    """GN → 1×1×1 proj_in → ST blocks → zero proj_out + residual
    (attention_temporal.py:339-399). Input (B, T, H, W, C)."""

    channels: int
    heads: int
    dim_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    temporal_length: Optional[int] = None
    use_relative_position: bool = True
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x, context=None):
        p = self.policy
        x_in = x
        inner = self.heads * self.dim_head
        x = B.GroupNorm32(eps=1e-6, policy=p, name="norm")(x)
        # Conv3d k=1 == Dense over channels
        x = nn.Dense(
            inner, name="proj_in", dtype=p.compute_dtype, param_dtype=p.param_dtype
        )(x)
        for d in range(self.depth):
            x = BasicTransformerBlockST(
                dim=inner, heads=self.heads, dim_head=self.dim_head,
                context_dim=self.context_dim,
                temporal_length=self.temporal_length,
                use_relative_position=self.use_relative_position,
                policy=p, name=f"block_{d}",
            )(x, context=context)
        x = nn.Dense(
            self.channels, name="proj_out",
            kernel_init=nn.initializers.zeros,
            dtype=p.compute_dtype, param_dtype=p.param_dtype,
        )(x)
        return x + x_in


@dataclass(frozen=True)
class VCBlockDesc:
    kind: str  # conv_in | res | st | downsample | upsample
    flax_name: str
    torch_path: str
    in_ch: int = 0
    out_ch: int = 0


@dataclass(frozen=True)
class VCTopology:
    encoder: tuple[tuple[VCBlockDesc, ...], ...]
    middle: tuple[VCBlockDesc, ...]
    decoder: tuple[tuple[VCBlockDesc, ...], ...]


def build_vc_topology(cfg: VideoCrafterUNetConfig) -> VCTopology:
    mc = cfg.model_channels
    encoder: list[tuple[VCBlockDesc, ...]] = [
        (VCBlockDesc("conv_in", "input_0_0", "input_blocks.0.0", cfg.in_channels, mc),)
    ]
    input_chans = [mc]
    ch = mc
    ds = 1
    idx = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            entry = [
                VCBlockDesc("res", f"input_{idx}_0", f"input_blocks.{idx}.0", ch, mult * mc)
            ]
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                entry.append(
                    VCBlockDesc("st", f"input_{idx}_1", f"input_blocks.{idx}.1", ch, ch)
                )
            encoder.append(tuple(entry))
            input_chans.append(ch)
            idx += 1
        if level != len(cfg.channel_mult) - 1:
            encoder.append(
                (VCBlockDesc("downsample", f"input_{idx}_down", f"input_blocks.{idx}.0", ch, ch),)
            )
            input_chans.append(ch)
            ds *= 2
            idx += 1

    middle = (
        VCBlockDesc("res", "middle_0", "middle_block.0", ch, ch),
        VCBlockDesc("st", "middle_1", "middle_block.1", ch, ch),
        VCBlockDesc("res", "middle_2", "middle_block.2", ch, ch),
    )

    decoder: list[tuple[VCBlockDesc, ...]] = []
    idx = 0
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            ich = input_chans.pop()
            entry = [
                VCBlockDesc("res", f"output_{idx}_0", f"output_blocks.{idx}.0", ch + ich, mc * mult)
            ]
            ch = mc * mult
            li = 1
            if ds in cfg.attention_resolutions:
                entry.append(
                    VCBlockDesc("st", f"output_{idx}_1", f"output_blocks.{idx}.1", ch, ch)
                )
                li = 2
            if level and i == cfg.num_res_blocks:
                entry.append(
                    VCBlockDesc(
                        "upsample", f"output_{idx}_up", f"output_blocks.{idx}.{li}", ch, ch
                    )
                )
                ds //= 2
            decoder.append(tuple(entry))
            idx += 1
    return VCTopology(tuple(encoder), middle, tuple(decoder))


class FPSEmbedder(nn.Module):
    """``cond_stage2_model``: embeds the clip's frame rate into the
    time-embedding width (sample_utils.py:65-71 builds it from
    ``cond_stage2_config`` and calls it on ``{'fps': tensor}``; the
    reference's bundled LVDM copy does not ship the class — the call is
    getattr-guarded — so this follows the time_embed MLP convention:
    sinusoidal(model_channels) → Dense → SiLU → Dense, producing a
    (B, 4·model_channels) embedding added to the timestep embedding)."""

    model_channels: int
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, fps):
        p = self.policy
        fps = jnp.asarray(fps, jnp.float32)
        if fps.ndim == 0:
            fps = fps[None]
        e = B.sinusoidal_embedding(fps, self.model_channels)
        dense = lambda name: nn.Dense(
            self.model_channels * 4, name=name,
            dtype=p.compute_dtype, param_dtype=p.param_dtype,
        )
        h = dense("fps_embed_0")(e.astype(p.compute_dtype))
        return dense("fps_embed_2")(jax.nn.silu(h))


class VideoCrafterUNet(nn.Module):
    """apply(params, x, t, context) — x: (B, T, H, W, C), context (B, L, D)."""

    cfg: VideoCrafterUNetConfig
    policy: Policy = Policy()

    def _make(self, d: VCBlockDesc):
        cfg, p = self.cfg, self.policy
        if d.kind == "conv_in":
            return Conv3dFactorized(
                d.out_ch, cfg.kernel_size_t, cfg.padding_t, policy=p, name=d.flax_name
            )
        if d.kind == "res":
            return ResBlock3D(
                channels=d.in_ch, out_channels=d.out_ch,
                emb_channels=cfg.model_channels * 4,
                kernel_size_t=cfg.kernel_size_t, padding_t=cfg.padding_t,
                policy=p, name=d.flax_name,
            )
        if d.kind == "st":
            heads = self.cfg.num_heads
            return SpatialTemporalTransformer(
                channels=d.out_ch, heads=heads, dim_head=d.out_ch // heads,
                depth=cfg.transformer_depth, context_dim=cfg.context_dim,
                temporal_length=cfg.temporal_length,
                use_relative_position=cfg.use_relative_position,
                policy=p, name=d.flax_name,
            )
        if d.kind == "downsample":
            return Conv3dFactorized(
                d.out_ch, cfg.kernel_size_t, cfg.padding_t,
                spatial_stride=2, policy=p, name=d.flax_name,
            )
        if d.kind == "upsample":
            return _VCUpsample(
                channels=d.out_ch, kernel_size_t=cfg.kernel_size_t,
                padding_t=cfg.padding_t, policy=p, name=d.flax_name,
            )
        raise ValueError(d.kind)

    def _apply(self, d: VCBlockDesc, x, emb, ctx):
        mod = self._make(d)
        if d.kind == "res":
            return mod(x, emb)
        if d.kind == "st":
            return mod(x, context=ctx)
        return mod(x)

    @nn.compact
    def __call__(
        self, x, t, context, features_adapter=None, y=None,
        time_emb_replace=None, temporal_context=None,
    ):
        """features_adapter: optional tuple of per-scale feature maps
        (B, h_i, w_i, c_i) injected after every 3rd input block — the
        T2I-Adapter hook (openaimodel3d.py:655-663).
        y: class labels (B,) int or embedding (B, E) for adm conditioning
        (label_emb, openaimodel3d.py:650-652).
        time_emb_replace: precomputed (B, 4*model_channels) embedding that
        replaces the timestep embedding (openaimodel3d.py:643-647).
        temporal_context: FPS embedding (B|1, E) from ``FPSEmbedder``.
        The reference UNet swallows this kwarg (openaimodel3d.py:632
        ``**kwargs``; the ST transformer likewise, attention_temporal.py:
        386); here it is consumed by adding it to the time embedding —
        the upstream-VideoCrafter convention, making FPS conditioning
        functional rather than inert."""
        cfg, p = self.cfg, self.policy
        topo = build_vc_topology(cfg)
        dense = lambda feats, name: nn.Dense(
            feats, name=name, dtype=p.compute_dtype, param_dtype=p.param_dtype
        )
        if time_emb_replace is None:
            e = B.sinusoidal_embedding(t, cfg.model_channels)
            emb = dense(cfg.model_channels * 4, "time_embed_0")(e.astype(p.compute_dtype))
            emb = dense(cfg.model_channels * 4, "time_embed_2")(jax.nn.silu(emb))
        else:
            emb = time_emb_replace.astype(p.compute_dtype)
        if y is not None:
            if cfg.num_classes is not None and jnp.issubdtype(y.dtype, jnp.integer):
                lab = nn.Embed(
                    cfg.num_classes, cfg.model_channels * 4, name="label_emb",
                    param_dtype=p.param_dtype,
                )(y)
            else:
                # embedding-valued y (crossattn-adm / hybrid-adm): project if
                # width differs, else add directly
                lab = y
                if y.shape[-1] != cfg.model_channels * 4:
                    lab = dense(cfg.model_channels * 4, "label_proj")(y.astype(p.compute_dtype))
            emb = emb + lab.astype(emb.dtype)
        if temporal_context is not None:
            # (1, E) broadcasts over the fused-CFG batch; see docstring
            emb = emb + temporal_context.astype(emb.dtype)

        x = x.astype(p.compute_dtype)
        # context may be None (concat/adm conditioning keys): spatial
        # cross-attention then falls back to self-attention, like the
        # reference UNet with context=None
        ctx = None if context is None else context.astype(p.compute_dtype)

        hs = []
        adapter_idx = 0
        for eid, entry in enumerate(topo.encoder):
            for d in entry:
                x = self._apply(d, x, emb, ctx)
            if features_adapter is not None and (eid + 1) % 3 == 0 and adapter_idx < len(features_adapter):
                feat = features_adapter[adapter_idx].astype(x.dtype)
                if feat.ndim == 4:  # (B, h, w, c): broadcast over frames
                    feat = feat[:, None]
                x = x + feat  # per-frame (B, T, h, w, c), ddpm3d.py:1470-1484
                adapter_idx += 1
            hs.append(x)
        for d in topo.middle:
            x = self._apply(d, x, emb, ctx)
        for entry in topo.decoder:
            # skip-concat is virtual: the leading res block takes the
            # (x, skip) pair (joint-stats GN + split convs)
            x = self._apply(entry[0], (x, hs.pop()), emb, ctx)
            for d in entry[1:]:
                x = self._apply(d, x, emb, ctx)

        x = B.GroupNorm32(policy=p, fuse_silu=True, name="head_norm")(x)
        return Conv3dFactorized(
            cfg.out_channels, cfg.kernel_size_t, cfg.padding_t,
            zero_init=True, policy=p, name="head_conv",
        )(x)


class _VCUpsample(nn.Module):
    """Nearest 2x (H, W) + conv (openaimodel3d.py Upsample)."""

    channels: int
    kernel_size_t: int = 1
    padding_t: int = 0
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        x = jax.image.resize(x, (b, t, h * 2, w * 2, c), method="nearest")
        return Conv3dFactorized(
            self.channels, self.kernel_size_t, self.padding_t,
            policy=self.policy, name="conv_mod",
        )(x)
