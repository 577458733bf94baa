"""Flax building blocks for the ModelScope 3D-factorised UNet.

TPU-native re-design of the reference torch modules
(/root/reference/scripts/modelscope/t2v_model.py):
  * layouts are channels-last — spatial tensors ``(B·F, H, W, C)``, temporal
    tensors ``(B·H·W, F, C)`` — so convs and matmuls tile onto the MXU
    without transposes;
  * attention goes through ``t2v.kernels.attention`` (Pallas flash kernel /
    XLA dispatch) instead of the reference's xformers/SDP ladder
    (t2v_model.py:556-581);
  * normalisation statistics are computed in float32 regardless of the
    compute dtype (the reference relies on fp16 autocast behaviour).

Parity notes (verified by tests/test_blocks.py against torch CPU):
  * GroupNorm eps: 1e-5 in ResBlock/TemporalConv (torch default), 1e-6 in
    the transformer norms (t2v_model.py:615-616, 692-693);
  * GELU is the exact (erf) variant (torch F.gelu default) — not jax's
    default tanh approximation;
  * zero-initialised output projections mirror ``zero_module`` /
    ``nn.init.zeros_`` placements (proj_out, ResBlock out conv,
    TemporalConv conv4, UNet head conv).

Perf history (negative results, kept so they are not re-tried): a v5e
end-to-end bisect of the 24f/256px DDIM-20 benchmark attributed a stacked
~10% regression to four individually-plausible "optimisations" layered on
the fused packed-head attention state (2.997 s):
  * chansum GroupNorm + fused SiLU via t2v/kernels/group_norm.py (+79 ms)
    — each change benched well against an OLDER baseline but overlapped
    with the attention fusion's gains; combined it lost;
  * flattening per-token Dense to 2D GEMMs + keeping the temporal
    transformer resident in spatial token layout (+134 ms);
  * in-kernel frame-axis attention (fused_temporal_mha) instead of HBM
    transposes (+50 ms);
  * the Pallas GEGLU-combine kernel (+26 ms, a fusion barrier).
This module therefore keeps the measured-fastest formulation: plain 3D
Dense per-token ops, an explicit HBM transpose around the temporal
transformer, XLA-side GroupNorm/GEGLU math. The kernels remain in
t2v/kernels (tested, documented) for shapes where they do win.

Round-3 follow-up (same bench): flattening the per-token Dense ops to 2D
GEMMs in ISOLATION (no residency change, no shared context) re-benched at
3.115 s vs 3.044 s — the XLA conv-emitter lowering of the small-N 3D dots
(e.g. proj_out (2048, 24, 320) at ~5 TFLOP/s in the device trace) is
still globally faster than the canonical 2D GEMM, because layout
assignment is global and the row-major GEMMs force relayouts around the
neighbouring convs/attention custom calls. Don't re-flatten wholesale
without re-profiling. Flattening ONLY the temporal transformer's
proj_in/proj_out (the two worst per-token dots in the trace) was also a
regression: 3.045 s vs 3.004 s — the relayout cost around the temporal
attention custom region exceeds the GEMM win even at minimal scope.

Round-5 follow-up (profile_unet.py flagship, device trace): the residency
idea was re-tried ONE more time with the round-5 resident-layout frame
attention kernel (the design that won −6.1% on VideoCrafter,
kernels/relpos_mha.py, bias-less variant) — TemporalTransformer staying
in (b·f, h·w, c) tokens, frame attention gridded over spatial tiles, NO
HBM transposes, long-N proj GEMMs. It lost again: 146.0 vs 137.0 ms/step.
The per-site wins materialised exactly as predicted (copy 7.5 → 5.4,
fusion 32.6 → 29.6) but the kernel itself cost 18.3 ms vs the packed
path's 10.2: ModelScope's t=24 frame axis pads to 128 lanes inside the
kernel's (nt, 24, 24) score tiles (5.3× MXU/VPU lane waste), and the
surviving GN/conv fusions reorganised for the worse (convert_reduce
40.3 → 48.7). The trade only wins where the XLA path pays per-site fold
transposes (VideoCrafter's rel-pos attention); with ONE clean transpose
pair per transformer (this module), the packed (B·H·W, F, C) path
remains the measured-fastest formulation. Don't re-try residency without
a lane-packed (multi-token-per-lane) score layout.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from t2v.core.dtypes import Policy
from t2v.kernels.attention import attention_mh as _attention_mh
from t2v.kernels.attention import cross_attention_packed as _cross_attention_packed
from t2v.kernels.attention import self_attention_packed as _self_attention_packed


def sinusoidal_embedding(t: jax.Array, dim: int) -> jax.Array:
    """Timestep embedding, cos-then-sin ordering (t2v_model.py:504-515)."""
    half = dim // 2
    # static table in float64: fp32 pow() phase error is amplified by t~1000
    freqs = jnp.asarray(
        np.power(10000.0, -np.arange(half, dtype=np.float64) / half),
        jnp.float32,
    )
    sinusoid = t.astype(jnp.float32)[:, None] * freqs[None, :]
    x = jnp.concatenate([jnp.cos(sinusoid), jnp.sin(sinusoid)], axis=1)
    if dim % 2 != 0:
        x = jnp.concatenate([x, jnp.zeros_like(x[:, :1])], axis=1)
    return x


class _GNScaleBias(nn.Module):
    """Bare scale/bias parameters with the same names, shapes, and init as
    ``nn.GroupNorm``'s, so a module that computes the normalisation itself
    stays checkpoint-compatible with one that calls ``nn.GroupNorm``."""

    features: int
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype
        )
        return scale, bias


class GroupNorm32(nn.Module):
    """GroupNorm(32) with float32 statistics.

    Also accepts an ``(a, b)`` tuple, treated as the virtual channel concat
    ``[a; b]`` WITHOUT materialising it: group statistics are computed
    jointly from per-part partial sums and each part is normalised in
    place (returning a tuple). Groups that straddle the concat boundary
    are handled exactly. This lets the UNet decoder avoid the HBM
    round-trip of the skip-connection concat (t2v_model.py:316-318 does
    ``th.cat`` + GroupNorm; here the cat never hits memory).

    ``fuse_silu=True`` applies the SiLU that follows most UNet norms; it is
    left to XLA to fuse into the surrounding elementwise work (the chansum
    reformulation in t2v/kernels/group_norm.py benched slower end-to-end —
    see the module docstring's perf history)."""

    eps: float = 1e-5
    num_groups: int = 32
    fuse_silu: bool = False
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x):
        if isinstance(x, tuple):
            out = self._pair(*x)
            if self.fuse_silu:
                out = (jax.nn.silu(out[0]), jax.nn.silu(out[1]))
            return out
        dtype = x.dtype
        out = nn.GroupNorm(
            num_groups=self.num_groups,
            epsilon=self.eps,
            dtype=jnp.float32,
            param_dtype=self.policy.param_dtype,
        )(x.astype(jnp.float32))
        if self.fuse_silu:
            out = jax.nn.silu(out)
        return out.astype(dtype)

    def _pair(self, a, b):
        ca, cb = a.shape[-1], b.shape[-1]
        c = ca + cb
        g = c // self.num_groups
        # same child name ("GroupNorm_0") and param names as the single path
        scale, bias = _GNScaleBias(
            features=c, param_dtype=self.policy.param_dtype, name="GroupNorm_0"
        )()
        red = tuple(range(1, a.ndim - 1))
        n_el = int(np.prod([a.shape[i] for i in red]))
        a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
        # per-channel partial sums -> tiny (B, C) tensors; the big parts are
        # only read, never re-written as a concat
        s = jnp.concatenate([a32.sum(red), b32.sum(red)], axis=-1)
        s2 = jnp.concatenate(
            [(a32 * a32).sum(red), (b32 * b32).sum(red)], axis=-1
        )
        bsz = a.shape[0]
        gs = s.reshape(bsz, self.num_groups, g).sum(-1)
        gs2 = s2.reshape(bsz, self.num_groups, g).sum(-1)
        cnt = n_el * g
        mu = gs / cnt
        var = gs2 / cnt - mu * mu
        inv = jax.lax.rsqrt(var + self.eps)
        mu_c = jnp.repeat(mu, g, axis=-1)  # (B, C)
        inv_c = jnp.repeat(inv, g, axis=-1)
        scale32 = scale.astype(jnp.float32)
        bias32 = bias.astype(jnp.float32)

        def norm(x32, sl, dtype):
            shp = (bsz,) + (1,) * (x32.ndim - 2) + (-1,)
            m = mu_c[:, sl].reshape(shp)
            iv = inv_c[:, sl].reshape(shp)
            pshp = (1,) * (x32.ndim - 1) + (-1,)
            sc = scale32[sl].reshape(pshp)
            bi = bias32[sl].reshape(pshp)
            return ((x32 - m) * iv * sc + bi).astype(dtype)

        return norm(a32, slice(0, ca), a.dtype), norm(b32, slice(ca, c), b.dtype)


class SplitConv(nn.Module):
    """Conv over a virtual channel-concat input ``[a; b]`` computed as two
    convs with the kernel sliced along input channels —
    ``conv(cat(a, b)) == conv_a(a) + conv_b(b)`` — so the concat is never
    materialised. Param tree is identical to ``nn.Conv`` (kernel/bias).
    ``kernel_size`` may be 2-D ``(kh, kw)`` or 3-D ``(kt, kh, kw)``;
    padding defaults to SAME-for-stride-1 (``k // 2`` per dim)."""

    features: int
    kernel_size: tuple[int, ...]
    padding: Optional[tuple[tuple[int, int], ...]] = None
    zero_init: bool = False
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, a, b):
        ks = self.kernel_size
        nd = len(ks)
        cin = a.shape[-1] + b.shape[-1]
        ca = a.shape[-1]
        init = (
            nn.initializers.zeros if self.zero_init
            else nn.initializers.lecun_normal()
        )
        kernel = self.param(
            "kernel", init, (*ks, cin, self.features), self.policy.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.policy.param_dtype
        )
        cd = self.policy.compute_dtype
        k = kernel.astype(cd)
        pad = self.padding or tuple((kk // 2, kk // 2) for kk in ks)
        spatial = "DHW"[-nd:]
        dn = jax.lax.conv_dimension_numbers(
            a.shape,
            k[..., :ca, :].shape,
            ("N" + spatial + "C", spatial + "IO", "N" + spatial + "C"),
        )
        conv = lambda x, kk: jax.lax.conv_general_dilated(
            x.astype(cd), kk, window_strides=(1,) * nd, padding=pad,
            dimension_numbers=dn,
        )
        return conv(a, k[..., :ca, :]) + conv(b, k[..., ca:, :]) + bias.astype(cd)


def _tokens_2d(mod, x):
    """Apply a per-token Dense over ``(B, N, C)`` as one 2D ``(B·N, C)``
    GEMM (used by the VideoCrafter ST blocks, whose small-N 3D batched
    dots lower through XLA's conv emitter with token-minor layouts)."""
    b, n, c = x.shape
    return mod(x.reshape(b * n, c)).reshape(b, n, -1)


class CrossAttention(nn.Module):
    """QKV attention (t2v_model.py:518-584). Self-attention when no context.

    A context whose batch is SMALLER than the query batch declares shared
    conditioning: the caller passes ONE context row per sample while x
    carries ``b = cb·f`` frame rows (sample-major). k/v are then projected
    once per sample (f× less work) and the frame axis merges into the
    query rows — a free reshape — so one sample's whole video attends its
    single context (used by the VideoCrafter ST block)."""

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.heads * self.dim_head
        dense = lambda feats, name, bias=True: nn.Dense(
            feats,
            use_bias=bias,
            name=name,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )
        ctx = x if context is None else context
        q = dense(inner, "to_q", bias=False)(x)
        k = dense(inner, "to_k", bias=False)(ctx)
        v = dense(inner, "to_v", bias=False)(ctx)

        b, n, _ = q.shape
        s = k.shape[1]
        force = self.policy.attention_backend
        if context is None:
            # self-attention: keep heads packed in the minor dim — the
            # fused kernel path avoids the multihead fold transposes
            out = _self_attention_packed(q, k, v, self.heads, force=force)
        elif k.shape[0] != b:
            cb = k.shape[0]
            f = b // cb
            out = _cross_attention_packed(
                q.reshape(cb, f * n, inner), k, v, self.heads, force=force
            ).reshape(b, n, inner)
        else:
            unfold = lambda t, length: t.reshape(
                b, length, self.heads, self.dim_head
            )
            out = _attention_mh(
                unfold(q, n), unfold(k, s), unfold(v, s), force=force
            )
            out = out.reshape(b, n, inner)
        return dense(self.query_dim, "to_out")(out)


class GEGLUFeedForward(nn.Module):
    """GEGLU MLP (t2v_model.py:813-846), exact-erf GELU."""

    dim: int
    mult: int = 4
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult)
        proj = nn.Dense(
            inner * 2,
            name="geglu",
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )(x)
        h, gate = jnp.split(proj, 2, axis=-1)
        # gelu in compute dtype: the reference runs GEGLU under fp16
        # autocast (t2v_pipeline.py:275), and an f32 upcast here forces XLA
        # to materialise the doubled projection in f32 — 6.75 GB at
        # 1024×576 temporal blocks (OOM on one chip)
        h = h * jax.nn.gelu(gate, approximate=False)
        return nn.Dense(
            self.dim,
            name="out",
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )(h)


class BasicTransformerBlock(nn.Module):
    """Pre-LN self + cross + GEGLU FF block (t2v_model.py:770-809)."""

    dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    disable_self_attn: bool = False
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x, context=None):
        ln = lambda name: nn.LayerNorm(
            epsilon=1e-5,
            name=name,
            dtype=jnp.float32,
            param_dtype=self.policy.param_dtype,
        )
        attn1 = CrossAttention(
            query_dim=self.dim,
            context_dim=self.context_dim if self.disable_self_attn else None,
            heads=self.heads,
            dim_head=self.dim_head,
            policy=self.policy,
            name="attn1",
        )
        attn2 = CrossAttention(
            query_dim=self.dim,
            context_dim=self.context_dim,
            heads=self.heads,
            dim_head=self.dim_head,
            policy=self.policy,
            name="attn2",
        )
        dt = x.dtype
        x = attn1(
            ln("norm1")(x).astype(dt),
            context=context if self.disable_self_attn else None,
        ) + x
        x = attn2(ln("norm2")(x).astype(dt), context=context) + x
        x = GEGLUFeedForward(dim=self.dim, policy=self.policy, name="ff")(
            ln("norm3")(x).astype(dt)
        ) + x
        return x


class SpatialTransformer(nn.Module):
    """Attention over (H·W) tokens per frame (t2v_model.py:587-658),
    use_linear=True projections. Input ``(B·F, H, W, C)``."""

    channels: int
    heads: int
    dim_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x, context=None):
        bf, h, w, c = x.shape
        x_in = x
        x = GroupNorm32(eps=1e-6, policy=self.policy, name="norm")(x)
        x = x.reshape(bf, h * w, c)
        inner = self.heads * self.dim_head
        x = nn.Dense(
            inner,
            name="proj_in",
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )(x)
        for d in range(self.depth):
            x = BasicTransformerBlock(
                dim=inner,
                heads=self.heads,
                dim_head=self.dim_head,
                context_dim=self.context_dim,
                policy=self.policy,
                name=f"block_{d}",
            )(x, context=context)
        x = nn.Dense(
            self.channels,
            name="proj_out",
            kernel_init=nn.initializers.zeros,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )(x)
        return x.reshape(bf, h, w, c) + x_in


class TemporalTransformer(nn.Module):
    """Attention over the frame axis (t2v_model.py:661-767),
    use_linear=False (Conv1d k=1 ≡ per-frame Dense). Input ``(B, F, H, W, C)``.

    The block transposes to the ``(b·h·w, f, c)`` token layout in HBM and
    runs everything there. The measured-slower alternatives — keeping the
    block resident in spatial tokens with the frame swap inside the
    attention kernel's VMEM blocks — are recorded in the module docstring's
    perf history."""

    channels: int
    heads: int
    dim_head: int
    depth: int = 1
    multiply_zero: bool = False
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x, context=None):
        b, f, h, w, c = x.shape
        x_in = x
        x = GroupNorm32(eps=1e-6, policy=self.policy, name="norm")(x)
        # (b h w) f c token layout
        x = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, c)
        inner = self.heads * self.dim_head
        x = nn.Dense(
            inner,
            name="proj_in",
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )(x)
        for d in range(self.depth):
            x = BasicTransformerBlock(
                dim=inner,
                heads=self.heads,
                dim_head=self.dim_head,
                context_dim=None,  # only_self_att=True (t2v_model.py:678-681)
                policy=self.policy,
                name=f"block_{d}",
            )(x)
        x = nn.Dense(
            self.channels,
            name="proj_out",
            kernel_init=nn.initializers.zeros,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )(x)
        x = x.reshape(b, h, w, f, c).transpose(0, 3, 1, 2, 4)
        if self.multiply_zero:
            return x_in
        return x + x_in


class _ConvParamsShell(nn.Module):
    """Bare conv parameters with ``nn.Conv``'s names, shapes, and inits —
    lets the fused temporal-conv path own the weights while staying
    checkpoint- and init-identical to the unfused ``nn.Conv`` path."""

    features: int
    in_features: int
    kernel_size: tuple[int, ...]
    zero_init: bool
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self):
        init = (
            nn.initializers.zeros if self.zero_init
            else nn.initializers.lecun_normal()
        )
        kernel = self.param(
            "kernel", init,
            (*self.kernel_size, self.in_features, self.features),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype
        )
        return kernel, bias


class _GNParamsShell(nn.Module):
    """norm{i}/GroupNorm_0/{scale,bias} params without the computation."""

    features: int
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self):
        return _GNScaleBias(
            features=self.features, param_dtype=self.param_dtype,
            name="GroupNorm_0",
        )()


class TemporalConvBlock(nn.Module):
    """4× (GN+SiLU+Conv3d (3,1,1)) residual block, conv4 zero-init
    (t2v_model.py:1186-1229, param name quirk 'temopral_conv' preserved in
    the checkpoint mapping). Input ``(B, F, H, W, C)``.

    On TPU the whole block runs as the fused Pallas chain in
    ``t2v.kernels.temporal_conv`` — one read + one write per layer, group
    statistics produced in each layer's epilogue instead of separate stat
    passes (docs/PERF.md norm-traffic lever). The unfused XLA formulation
    below remains the off-TPU / GSPMD path and the gradient recompute
    target; both paths share one param tree."""

    channels: int
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x):
        backend = self.policy.temporal_conv_backend
        if backend is None:
            backend = "fused" if jax.default_backend() == "tpu" else "xla"
        if backend in ("fused", "fused_spmd"):
            from t2v.kernels.temporal_conv import fits

            bb, ff, hh_, ww_, _ = x.shape
            if not fits(
                ff, hh_ * ww_, self.channels,
                jnp.dtype(x.dtype).itemsize,
                jnp.dtype(self.policy.compute_dtype).itemsize,
            ):
                # no Mosaic-legal VMEM tiling at this shape (e.g. 250
                # frames at full res) — this block takes the XLA
                # formulation; params are shared so mixing is free
                backend = "xla"
        if backend in ("fused", "fused_spmd"):
            layers = []
            for i in range(1, 5):
                scale, bias = _GNParamsShell(
                    features=self.channels,
                    param_dtype=self.policy.param_dtype,
                    name=f"norm{i}",
                )()
                kernel, cb = _ConvParamsShell(
                    features=self.channels,
                    in_features=self.channels,
                    kernel_size=(3, 1, 1),
                    zero_init=i == 4,
                    param_dtype=self.policy.param_dtype,
                    name=f"conv{i}",
                )()
                w = kernel.reshape(3, self.channels, self.channels).astype(
                    self.policy.compute_dtype
                )
                layers.append((scale, bias, w, cb))
            b, f, hh, ww, c = x.shape
            if backend == "fused_spmd":
                # GSPMD meshes: custom_partitioning entry (batch-parallel,
                # frame all-gather under sp inserted by the partitioner) —
                # keeps the fused chain's 7% on tp/sp jobs (round-4 gap)
                from t2v.kernels.spmd import spmd_temporal_conv_chain

                y = spmd_temporal_conv_chain(
                    x.reshape(b, f, hh * ww, c), layers, eps=1e-5
                )
            else:
                from t2v.kernels.temporal_conv import temporal_conv_chain

                y = temporal_conv_chain(
                    x.reshape(b, f, hh * ww, c), layers, eps=1e-5,
                    interpret=jax.default_backend() != "tpu",
                )
            return y.reshape(b, f, hh, ww, c)

        identity = x
        for i in range(1, 5):
            h = GroupNorm32(policy=self.policy, fuse_silu=True,
                            name=f"norm{i}")(x if i == 1 else h)
            h = nn.Conv(
                self.channels,
                kernel_size=(3, 1, 1),
                padding=((1, 1), (0, 0), (0, 0)),
                name=f"conv{i}",
                kernel_init=nn.initializers.zeros if i == 4 else nn.initializers.lecun_normal(),
                dtype=self.policy.compute_dtype,
                param_dtype=self.policy.param_dtype,
            )(h)
        return identity + h


class ResBlock(nn.Module):
    """GN+SiLU+Conv → +time-emb → GN+SiLU+zero-Conv, skip 1×1, followed by
    the temporal conv block (t2v_model.py:886-1009). Input ``(B·F, H, W, C)``
    with ``frames`` static for the temporal reshape."""

    channels: int
    emb_channels: int
    out_channels: int
    frames: int
    use_temporal_conv: bool = True
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x, emb):
        # decoder blocks may pass the (upsampled, skip) pair instead of
        # their channel concat; the concat is then never materialised
        # (joint-stats GroupNorm + input-channel-split convs)
        pair = isinstance(x, tuple)
        conv = lambda feats, name, zero=False: nn.Conv(
            feats,
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            name=name,
            kernel_init=nn.initializers.zeros if zero else nn.initializers.lecun_normal(),
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )
        if pair:
            na, nb = GroupNorm32(policy=self.policy, fuse_silu=True,
                                 name="in_norm")(x)
            h = SplitConv(
                features=self.out_channels, kernel_size=(3, 3),
                policy=self.policy, name="in_conv",
            )(na, nb)
        else:
            h = GroupNorm32(policy=self.policy, fuse_silu=True,
                            name="in_norm")(x)
            h = conv(self.out_channels, "in_conv")(h)

        emb_out = nn.Dense(
            self.out_channels,
            name="emb",
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )(jax.nn.silu(emb))
        h = h + emb_out[:, None, None, :]

        h = GroupNorm32(policy=self.policy, fuse_silu=True, name="out_norm")(h)
        h = conv(self.out_channels, "out_conv", zero=True)(h)

        if pair:
            # channel concat widens the input, so the 1x1 projection is
            # always present on this path
            assert self.out_channels != self.channels
            skip = SplitConv(
                features=self.out_channels, kernel_size=(1, 1),
                policy=self.policy, name="skip",
            )(*x)
        elif self.out_channels == self.channels:
            skip = x
        else:
            skip = nn.Conv(
                self.out_channels,
                kernel_size=(1, 1),
                name="skip",
                dtype=self.policy.compute_dtype,
                param_dtype=self.policy.param_dtype,
            )(x)
        h = skip + h

        if self.use_temporal_conv:
            bf, hh, ww, cc = h.shape
            b = bf // self.frames
            h5 = h.reshape(b, self.frames, hh, ww, cc)
            h5 = TemporalConvBlock(
                channels=self.out_channels, policy=self.policy, name="temporal_conv"
            )(h5)
            h = h5.reshape(bf, hh, ww, cc)
        return h


class Upsample(nn.Module):
    """Nearest 2× + conv3×3 (t2v_model.py:849-883). Input ``(B·F, H, W, C)``."""

    channels: int
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x):
        bf, h, w, c = x.shape
        x = jax.image.resize(x, (bf, h * 2, w * 2, c), method="nearest")
        return nn.Conv(
            self.channels,
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            name="conv",
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )(x)


class Downsample(nn.Module):
    """Stride-2 conv3×3 (t2v_model.py:1010-1045). Input ``(B·F, H, W, C)``."""

    channels: int
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.channels,
            kernel_size=(3, 3),
            strides=(2, 2),
            padding=((1, 1), (1, 1)),
            name="op",
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )(x)
