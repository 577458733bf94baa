"""Flax KL-VAE (the SD "VQGAN_autoencoder.pth" first-stage model).

The reference wraps Stable Diffusion's ``ldm`` Encoder/Decoder
(t2v_model.py:1585-1705; ddconfig hardcoded at t2v_pipeline.py:117-131:
z=4, ch=128, ch_mult [1,2,4,4], 2 res blocks, no attn resolutions).
This is a from-scratch NHWC Flax implementation of that architecture.

TPU-first differences from the reference's execution:
  * frames are one batched ``(B·F, H, W, C)`` call — the reference decodes
    frame-by-frame with CPU offload (t2v_pipeline.py:302-356); here the
    pipeline chunks only to bound peak HBM, never to hop devices;
  * optional spatial tiling with overlap blending for hi-res decode lives
    in the pipeline layer.

Encode parity: ``compute_latents`` returns ``posterior.mean * 0.18215``
(deterministic mode, t2v_pipeline.py:183-185); decode applies ``1/0.18215``
(t2v_pipeline.py:300).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from t2v.core.config import VAEConfig
from t2v.core.dtypes import Policy
from t2v.kernels.attention import attention as _attention


def _gn(policy: Policy, name: str):
    return nn.GroupNorm(
        num_groups=32, epsilon=1e-6, name=name,
        dtype=jnp.float32, param_dtype=policy.param_dtype,
    )


def _conv(policy: Policy, feats: int, name: str, kernel=(3, 3), strides=None, padding=((1, 1), (1, 1))):
    return nn.Conv(
        feats, kernel_size=kernel, strides=strides, padding=padding,
        name=name, dtype=policy.compute_dtype, param_dtype=policy.param_dtype,
    )


class ResnetBlock(nn.Module):
    out_ch: int
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = _gn(self.policy, "norm1")(x.astype(jnp.float32)).astype(x.dtype)
        h = jax.nn.silu(h)
        h = _conv(self.policy, self.out_ch, "conv1")(h)
        h = _gn(self.policy, "norm2")(h.astype(jnp.float32)).astype(h.dtype)
        h = jax.nn.silu(h)
        h = _conv(self.policy, self.out_ch, "conv2")(h)
        if in_ch != self.out_ch:
            x = nn.Conv(
                self.out_ch, kernel_size=(1, 1), name="nin_shortcut",
                dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
            )(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention with 1x1-conv projections."""

    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hn = _gn(self.policy, "norm")(x.astype(jnp.float32)).astype(x.dtype)
        pconv = lambda name: nn.Conv(
            c, kernel_size=(1, 1), name=name,
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
        )
        q = pconv("q")(hn).reshape(b, h * w, c)
        k = pconv("k")(hn).reshape(b, h * w, c)
        v = pconv("v")(hn).reshape(b, h * w, c)
        out = _attention(q, k, v, scale=c ** -0.5)
        out = pconv("proj_out")(out.reshape(b, h, w, c))
        return x + out


class Downsample(nn.Module):
    """Stride-2 conv with SD's asymmetric (0,1)x(0,1) padding."""

    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            x.shape[-1], kernel_size=(3, 3), strides=(2, 2), padding="VALID",
            name="conv", dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )(x)


class Upsample(nn.Module):
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return _conv(self.policy, c, "conv")(x)


class Encoder(nn.Module):
    cfg: VAEConfig
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x):
        cfg, p = self.cfg, self.policy
        res = cfg.resolution
        h = _conv(p, cfg.ch, "conv_in")(x.astype(p.compute_dtype))
        for i, mult in enumerate(cfg.ch_mult):
            for j in range(cfg.num_res_blocks):
                h = ResnetBlock(out_ch=cfg.ch * mult, policy=p, name=f"down_{i}_block_{j}")(h)
                if res in cfg.attn_resolutions:
                    h = AttnBlock(policy=p, name=f"down_{i}_attn_{j}")(h)
            if i != len(cfg.ch_mult) - 1:
                h = Downsample(policy=p, name=f"down_{i}_downsample")(h)
                res //= 2
        h = ResnetBlock(out_ch=h.shape[-1], policy=p, name="mid_block_1")(h)
        h = AttnBlock(policy=p, name="mid_attn_1")(h)
        h = ResnetBlock(out_ch=h.shape[-1], policy=p, name="mid_block_2")(h)
        h = _gn(p, "norm_out")(h.astype(jnp.float32)).astype(h.dtype)
        h = jax.nn.silu(h)
        out_ch = cfg.z_channels * (2 if cfg.double_z else 1)
        return _conv(p, out_ch, "conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, z):
        cfg, p = self.cfg, self.policy
        block_in = cfg.ch * cfg.ch_mult[-1]
        res = cfg.resolution // 2 ** (len(cfg.ch_mult) - 1)
        h = _conv(p, block_in, "conv_in")(z.astype(p.compute_dtype))
        h = ResnetBlock(out_ch=block_in, policy=p, name="mid_block_1")(h)
        h = AttnBlock(policy=p, name="mid_attn_1")(h)
        h = ResnetBlock(out_ch=block_in, policy=p, name="mid_block_2")(h)
        for i in reversed(range(len(cfg.ch_mult))):
            for j in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(out_ch=cfg.ch * cfg.ch_mult[i], policy=p, name=f"up_{i}_block_{j}")(h)
                if res in cfg.attn_resolutions:
                    h = AttnBlock(policy=p, name=f"up_{i}_attn_{j}")(h)
            if i != 0:
                h = Upsample(policy=p, name=f"up_{i}_upsample")(h)
                res *= 2
        h = _gn(p, "norm_out")(h.astype(jnp.float32)).astype(h.dtype)
        h = jax.nn.silu(h)
        return _conv(p, cfg.out_channels, "conv_out")(h)


class DiagonalGaussian:
    """Diagonal-Gaussian posterior over latents (reference lvdm
    distributions.py:5-46): sample / kl / nll / mode on an NHWC
    (mean, logvar) pair — logvar pre-clamped to [-30, 20] by
    ``AutoencoderKL.encode``. ``deterministic=True`` zeroes the variance
    (the inference encode path uses the mean only)."""

    def __init__(self, mean, logvar, deterministic: bool = False):
        self.mean = mean
        self.logvar = logvar
        self.deterministic = deterministic
        if deterministic:
            self.var = self.std = jnp.zeros_like(mean)
        else:
            self.std = jnp.exp(0.5 * logvar)
            self.var = jnp.exp(logvar)

    def sample(self, key=None, noise=None):
        if self.deterministic:
            return self.mean
        if noise is None:
            noise = jax.random.normal(key, self.mean.shape, self.mean.dtype)
        return self.mean + self.std * noise

    def kl(self, other: "DiagonalGaussian | None" = None):
        """KL to N(0, I) or to another diagonal Gaussian, summed over all
        non-batch axes (reference sums dims [1,2,3] of NCHW; NHWC has the
        same non-batch axis set)."""
        if self.deterministic:
            return jnp.zeros((self.mean.shape[0],), self.mean.dtype)
        axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(
                jnp.square(self.mean) + self.var - 1.0 - self.logvar, axis=axes
            )
        return 0.5 * jnp.sum(
            jnp.square(self.mean - other.mean) / other.var
            + self.var / other.var - 1.0 - self.logvar + other.logvar,
            axis=axes,
        )

    def nll(self, sample):
        if self.deterministic:
            return jnp.zeros((self.mean.shape[0],), self.mean.dtype)
        axes = tuple(range(1, self.mean.ndim))
        log2pi = float(np.log(2.0 * np.pi))
        return 0.5 * jnp.sum(
            log2pi + self.logvar + jnp.square(sample - self.mean) / self.var,
            axis=axes,
        )

    def mode(self):
        return self.mean


class AutoencoderKL(nn.Module):
    """encode(x) -> (mean, logvar); decode(z) -> rgb. NHWC, x in [-1, 1].
    Wrap the pair in :class:`DiagonalGaussian` for sample/kl/nll."""

    cfg: VAEConfig
    policy: Policy = Policy()

    def setup(self):
        self.encoder = Encoder(cfg=self.cfg, policy=self.policy, name="encoder")
        self.decoder = Decoder(cfg=self.cfg, policy=self.policy, name="decoder")
        self.quant_conv = nn.Conv(
            2 * self.cfg.embed_dim, kernel_size=(1, 1), name="quant_conv",
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
        )
        self.post_quant_conv = nn.Conv(
            self.cfg.z_channels, kernel_size=(1, 1), name="post_quant_conv",
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
        )

    def encode(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x):
        mean, logvar = self.encode(x)
        return self.decode(mean), (mean, logvar)


def make_encode_latents_fn(vae: "AutoencoderKL", scale: float):
    """Jitted (params, images) -> scaled posterior-mean latents: encode and
    the x scale factor in ONE program (eager device ops on serving paths
    each cost a dispatch round-trip). Shared by both pipeline families."""

    @jax.jit
    def fn(params, x):
        mean, _ = vae.apply(params, x, method=AutoencoderKL.encode)
        return mean.astype(jnp.float32) * scale

    return fn


def make_decode_uint8_fn(vae: "AutoencoderKL", scale: float):
    """Jitted (params, scaled latents) -> uint8 RGB frames: latent unscale,
    decode, tensor2vid normalisation (clip((x+1)/2)), and quantisation in
    ONE program, so the host readback is uint8 (4x smaller than float)."""
    inv = 1.0 / float(scale)

    @jax.jit
    def fn(params, z):
        img = vae.apply(params, z * inv, method=AutoencoderKL.decode)
        img = jnp.clip(img.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)
        return jnp.round(img * 255.0).astype(jnp.uint8)

    return fn
