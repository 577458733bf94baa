"""Legacy 2D UNet blocks from the reference's model zoo, TPU-native.

The reference ships ``Resample`` / ``ResidualBlock`` / ``AttentionBlock``
(/root/reference/scripts/modelscope/t2v_model.py:1049-1183) alongside the
UNetSD it actually instantiates. No published config reaches them — they
are the older image-UNet vocabulary UNetSD grew out of — but they are part
of the reference's public module surface, so they exist here with the same
semantics for anyone composing custom models against that vocabulary.

Design notes (TPU-first, not a translation):
  * layouts are NHWC ``(B, H, W, C)`` — convs/matmuls tile the MXU
    directly, matching the rest of ``t2v.models``;
  * the attention block routes through ``t2v.kernels.attention``'s
    dispatcher (Pallas fused/flash kernels on TPU, XLA fallback) instead
    of the reference's xformers/SDP ladder (t2v_model.py:1160-1177);
  * norm statistics and softmax run in float32 per ``Policy``, weights in
    the policy's param dtype;
  * parity quirks preserved: the double sqrt-scale applied to BOTH q and k
    (``head_dim ** -0.25`` each side, t2v_model.py:1130), context k/v rows
    PREPENDED to the spatial keys (t2v_model.py:1152-1155), zero-init on
    the closing conv of each block, and ``Resample``'s adaptive-avg-pool
    halving (= 2×2 mean pool at even sizes, the only case the UNet shapes
    produce).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from t2v.core.dtypes import Policy
from t2v.kernels.attention import attention_mh as _attention_mh
from t2v.models.blocks import GroupNorm32


def resample(x: jax.Array, mode: str, reference_hw=None) -> jax.Array:
    """'none' | 'upsample' (nearest, to ``reference_hw``) | 'downsample'
    (2× average pool). x: (B, H, W, C). t2v_model.py:1049-1066."""
    if mode == "none":
        return x
    if mode == "upsample":
        if reference_hw is None:
            raise ValueError("upsample mode needs the reference (H, W)")
        rh, rw = reference_hw
        b, h, w, c = x.shape
        # nearest-neighbour via gather indices (static shapes, no
        # data-dependent control flow — jit/scan safe)
        iy = (jnp.arange(rh) * h) // rh
        ix = (jnp.arange(rw) * w) // rw
        return x[:, iy][:, :, ix]
    if mode == "downsample":
        b, h, w, c = x.shape
        # adaptive_avg_pool2d to (H//2, W//2); at even sizes (the UNet
        # invariant) this is exactly a 2×2 mean pool
        if h % 2 or w % 2:
            raise ValueError("downsample expects even spatial dims")
        return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
    raise ValueError(f"unknown resample mode {mode!r}")


class LegacyResidualBlock(nn.Module):
    """GN→SiLU→3×3 conv ×2 with timestep scale-shift and in-block
    resampling (t2v_model.py:1069-1114). Input (B, H, W, C), embedding
    (B, E); ``reference_hw`` sizes the 'upsample' mode."""

    in_dim: int
    embed_dim: int
    out_dim: int
    use_scale_shift_norm: bool = True
    mode: str = "none"
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x, e, reference_hw=None):
        cd = self.policy.compute_dtype
        conv = lambda feats, name, zero=False: nn.Conv(
            feats, (3, 3), padding=1, name=name,
            kernel_init=(nn.initializers.zeros if zero
                         else nn.initializers.lecun_normal()),
            dtype=cd, param_dtype=self.policy.param_dtype,
        )
        identity = resample(x, self.mode, reference_hw)

        h = GroupNorm32(policy=self.policy, fuse_silu=True, name="norm1")(x)
        h = conv(self.out_dim, "conv1")(
            resample(h.astype(cd), self.mode, reference_hw)
        )
        emb = nn.Dense(
            self.out_dim * 2 if self.use_scale_shift_norm else self.out_dim,
            name="embedding", dtype=cd,
            param_dtype=self.policy.param_dtype,
        )(jax.nn.silu(e.astype(jnp.float32)).astype(cd))
        emb = emb[:, None, None, :]
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb, 2, axis=-1)
            h = GroupNorm32(policy=self.policy, name="norm2")(h).astype(cd)
            h = h * (1.0 + scale) + shift
            h = conv(self.out_dim, "conv2", zero=True)(jax.nn.silu(h))
        else:
            h = h + emb
            h = GroupNorm32(policy=self.policy, fuse_silu=True,
                            name="norm2")(h)
            h = conv(self.out_dim, "conv2", zero=True)(h.astype(cd))
        if self.in_dim != self.out_dim:
            identity = nn.Conv(
                self.out_dim, (1, 1), name="shortcut", dtype=cd,
                param_dtype=self.policy.param_dtype,
            )(identity)
        return h + identity


class LegacyAttentionBlock(nn.Module):
    """Spatial self-attention with optional prepended context k/v
    (t2v_model.py:1117-1183). Input (B, H, W, C), context (B, L, Cc)."""

    dim: int
    context_dim: Optional[int] = None
    num_heads: Optional[int] = None
    head_dim: Optional[int] = None
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x, context=None):
        n = (self.dim // self.head_dim) if self.head_dim else self.num_heads
        d = self.dim // n
        if n * d != self.dim:
            raise ValueError("num_heads * head_dim must equal dim")
        cd = self.policy.compute_dtype
        b, h, w, c = x.shape
        identity = x

        xn = GroupNorm32(policy=self.policy, name="norm")(x).astype(cd)
        # 1×1 conv ≡ per-token Dense; qkv packed like the torch Conv2d
        qkv = nn.Dense(
            self.dim * 3, name="to_qkv", dtype=cd,
            param_dtype=self.policy.param_dtype,
        )(xn.reshape(b, h * w, c))
        # torch packs (n*3, d) on the channel axis then chunks into heads:
        # head-major thirds
        qkv = qkv.reshape(b, h * w, 3, n, d)
        q, k, v = (qkv[:, :, i] for i in range(3))  # (b, hw, n, d)

        if context is not None:
            ckv = nn.Dense(
                self.dim * 2, name="context_kv", dtype=cd,
                param_dtype=self.policy.param_dtype,
            )(context.astype(cd))
            ckv = ckv.reshape(b, -1, 2, n, d)
            # context rows come FIRST (torch cat([ck, k], dim=-1))
            k = jnp.concatenate([ckv[:, :, 0], k], axis=1)
            v = jnp.concatenate([ckv[:, :, 1], v], axis=1)

        # reference applies head_dim**-0.25 to q AND k — total scale is the
        # standard 1/sqrt(d); our kernels apply it on q only
        out = _attention_mh(
            q, k, v, scale=float(d) ** -0.5,
            force=self.policy.attention_backend,
        )
        out = out.reshape(b, h, w, self.dim)
        out = nn.Dense(
            self.dim, name="proj", kernel_init=nn.initializers.zeros,
            dtype=cd, param_dtype=self.policy.param_dtype,
        )(out)
        return out + identity
