"""Monocular depth stage for the T2I-Adapter path (depth-from-RGB).

The reference's adapter CLI takes an ORDINARY RGB video and computes depth
in-model: ``T2VAdapterDepth.get_batch_depth`` resizes each frame to
384×384 (bicubic), runs ``depth_stage_model`` (a MiDaS network instantiated
from user config — the class is NOT shipped in the reference repo), resizes
the prediction back to the latent target, and min-max normalises each frame
to [-1, 1] (/root/reference/scripts/videocrafter/lvdm/models/ddpm3d.py:
1443-1466; driven by sample_text2video_adapter.py:113).

This module provides the same stage TPU-natively:

  * ``prepare_depth_frames`` / ``normalize_depth`` — the exact pre/post
    contract of ``get_batch_depth`` (bicubic 384, per-frame [-1, 1]);
  * ``MidasSmall`` — a flax implementation of MiDaS v2.1 small
    (EfficientNet-Lite3 backbone, features=64 expanding RefineNet decoder,
    non-negative head — the standard ``midas_v21_small`` architecture the
    upstream configs point at). Inference-only: BatchNorms are folded into
    the convolutions at conversion time (t2v/io/convert_depth.py), so the
    network is pure conv+relu6/relu — one fused XLA program on TPU;
  * ``DepthStage`` — the user-facing wrapper: load converted weights, or
    inject any ``(frames_384: (N,384,384,3) in [-1,1]) -> (N,384,384)``
    estimator callable (tests use a stub).

Layouts are NHWC throughout; the per-frame batch axis is the data-parallel
axis, so the whole stage jits and shards like any other t2v model.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from t2v.core.dtypes import Policy

# EfficientNet-Lite3 stage plan (width 1.2, depth 1.4; lite variants fix
# the stem at 32ch, drop squeeze-excite, use relu6, and do not scale the
# repeat count of the first and last stages):
#   (repeats, kernel, stride, expand_ratio, out_channels)
_LITE3_STAGES: tuple[tuple[int, int, int, int, int], ...] = (
    (1, 3, 1, 1, 24),
    (3, 3, 2, 6, 32),
    (3, 5, 2, 6, 48),
    (5, 3, 2, 6, 96),
    (5, 5, 1, 6, 136),
    (6, 5, 2, 6, 232),
    (1, 3, 1, 6, 384),
)
# MidasNet_small regroups the stages into four feature taps
# (layer1 = stem + stages 0-1 → stride 4 / 32ch, layer2 = stage 2 →
# stride 8 / 48ch, layer3 = stages 3-4 → stride 16 / 136ch,
# layer4 = stages 5-6 → stride 32 / 384ch)
_TAPS = ((0, 2), (2, 3), (3, 5), (5, 7))
_TAP_CH = (32, 48, 136, 384)
_DEC_CH = (64, 128, 256, 512)  # scratch.layerN_rn (features=64, expand)


class _ConvBias(nn.Module):
    """Conv with bias — inference form of conv+BN (folded at conversion)."""

    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            name="conv",
        )(x)


class _DSConv(nn.Module):
    """Depthwise-separable block (stage 0, expand ratio 1):
    dw3x3+BN+relu6 → pw1x1+BN, residual when shapes allow."""

    out_ch: int
    kernel: int
    stride: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        h = _ConvBias(cin, self.kernel, self.stride, groups=cin, name="dw")(x)
        h = jax.nn.relu6(h)
        h = _ConvBias(self.out_ch, 1, name="pw")(h)
        if self.stride == 1 and cin == self.out_ch:
            h = h + x
        return h


class _MBConv(nn.Module):
    """Inverted residual (no SE — lite): pw-expand+BN+relu6 →
    dw+BN+relu6 → pw-project+BN, residual when shapes allow."""

    out_ch: int
    kernel: int
    stride: int
    expand: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        mid = cin * self.expand
        h = _ConvBias(mid, 1, name="pw_exp")(x)
        h = jax.nn.relu6(h)
        h = _ConvBias(mid, self.kernel, self.stride, groups=mid, name="dw")(h)
        h = jax.nn.relu6(h)
        h = _ConvBias(self.out_ch, 1, name="pw_proj")(h)
        if self.stride == 1 and cin == self.out_ch:
            h = h + x
        return h


class _ResidualConvUnit(nn.Module):
    """MiDaS ResidualConvUnit_custom (bn=False): relu→conv3x3 twice + skip."""

    features: int

    @nn.compact
    def __call__(self, x):
        h = _ConvBias(self.features, 3, name="conv1")(jax.nn.relu(x))
        h = _ConvBias(self.features, 3, name="conv2")(jax.nn.relu(h))
        return h + x


def _resize_bilinear(x, hw, align_corners: bool = True):
    """Bilinear resize matching torch ``interpolate(align_corners=True)``
    (jax.image 'linear' uses half-pixel centers = align_corners=False, so
    the aligned variant is built from an explicit gather-free map_coordinates
    formulation via scale_and_translate)."""
    b, h, w, c = x.shape
    nh, nw = hw
    if align_corners and (nh > 1 and nw > 1):
        scale = jnp.asarray(
            [(nh - 1) / max(h - 1, 1), (nw - 1) / max(w - 1, 1)], jnp.float32
        )
        # align_corners=True maps corner to corner: out = scale_and_translate
        # with translation 0 and kernel 'linear' over exact endpoints
        return jax.image.scale_and_translate(
            x,
            (b, nh, nw, c),
            spatial_dims=(1, 2),
            scale=scale,
            translation=jnp.zeros((2,), jnp.float32),
            method="linear",
        )
    return jax.image.resize(x, (b, nh, nw, c), method="linear")


class _FeatureFusion(nn.Module):
    """MiDaS FeatureFusionBlock_custom (deconv=False, bn=False,
    align_corners=True, expand): optional skip through resConfUnit1, then
    resConfUnit2, ×2 bilinear upsample, 1×1 out projection."""

    features: int
    out_features: int

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + _ResidualConvUnit(self.features, name="res1")(skip)
        x = _ResidualConvUnit(self.features, name="res2")(x)
        b, h, w, c = x.shape
        x = _resize_bilinear(x, (h * 2, w * 2), align_corners=True)
        return _ConvBias(self.out_features, 1, name="out_conv")(x)


@dataclass(frozen=True)
class MidasSmallConfig:
    stages: tuple = _LITE3_STAGES
    taps: tuple = _TAPS
    tap_ch: tuple = _TAP_CH
    dec_ch: tuple = _DEC_CH
    head_ch: int = 32

    def tiny(self) -> "MidasSmallConfig":
        """Reduced config for CPU tests (same topology, 1 block/stage)."""
        stages = tuple((1, k, s, e, max(8, c // 8)) for (_, k, s, e, c) in self.stages)
        return MidasSmallConfig(
            stages=stages,
            taps=self.taps,
            tap_ch=tuple(stages[i[1] - 1][4] for i in self.taps),
            dec_ch=(8, 16, 32, 64),
            head_ch=8,
        )


class MidasSmall(nn.Module):
    """MiDaS v2.1 small forward: (B, H, W, 3) RGB in [-1, 1] →
    (B, H, W) non-negative inverse depth (relative)."""

    cfg: MidasSmallConfig = field(default_factory=MidasSmallConfig)
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x = x.astype(self.policy.compute_dtype)
        h = _ConvBias(32, 3, 2, name="stem")(x)
        h = jax.nn.relu6(h)
        feats = []
        for si, (reps, k, s, e, c) in enumerate(cfg.stages):
            for r in range(reps):
                stride = s if r == 0 else 1
                name = f"block_{si}_{r}"
                if e == 1:
                    h = _DSConv(c, k, stride, name=name)(h)
                else:
                    h = _MBConv(c, k, stride, e, name=name)(h)
            feats.append(h)
        taps = [feats[hi - 1] for (_, hi) in cfg.taps]

        rn = [
            _ConvBias(cfg.dec_ch[i], 3, use_bias=False, name=f"layer{i + 1}_rn")(
                taps[i]
            )
            for i in range(4)
        ]
        # refinenet4..1: top-down fusion, expand halves the features
        p = _FeatureFusion(cfg.dec_ch[3], cfg.dec_ch[2], name="refine4")(rn[3])
        p = _FeatureFusion(cfg.dec_ch[2], cfg.dec_ch[1], name="refine3")(p, rn[2])
        p = _FeatureFusion(cfg.dec_ch[1], cfg.dec_ch[0], name="refine2")(p, rn[1])
        p = _FeatureFusion(cfg.dec_ch[0], cfg.dec_ch[0], name="refine1")(p, rn[0])

        p = _ConvBias(cfg.head_ch, 3, name="head1")(p)
        b, hh, ww, _ = p.shape
        p = _resize_bilinear(p, (hh * 2, ww * 2), align_corners=True)
        p = _ConvBias(cfg.head_ch, 3, name="head2")(p)
        p = jax.nn.relu(p)
        p = _ConvBias(1, 1, name="head3")(p)
        p = jax.nn.relu(p)  # non_negative=True
        return p[..., 0].astype(jnp.float32)


# ---------------------------------------------------------------------------
# the get_batch_depth contract (ddpm3d.py:1443-1466)


def prepare_depth_frames(frames_rgb: np.ndarray) -> np.ndarray:
    """(N, H, W, 3) uint8/float RGB → (N, 384, 384, 3) float32 in [-1, 1]
    (prepare_midas_input: bicubic resize to 384², ddpm3d.py:1443-1446)."""
    import cv2

    f = np.asarray(frames_rgb)
    if f.dtype == np.uint8:
        f = f.astype(np.float32) / 255.0 * 2.0 - 1.0
    out = np.stack(
        [cv2.resize(fr, (384, 384), interpolation=cv2.INTER_CUBIC) for fr in f]
    )
    return out.astype(np.float32)


def normalize_depth(depth: jnp.ndarray, target_hw: tuple[int, int]) -> jnp.ndarray:
    """(N, h, w) raw prediction → (N, H, W, 1) in [-1, 1]: bicubic resize
    to the latent target then per-frame min-max (ddpm3d.py:1457-1464)."""
    n = depth.shape[0]
    d = jax.image.resize(
        depth[..., None].astype(jnp.float32),
        (n, *target_hw, 1),
        method="cubic",
    )
    dmin = d.min(axis=(1, 2, 3), keepdims=True)
    dmax = d.max(axis=(1, 2, 3), keepdims=True)
    return 2.0 * (d - dmin) / (dmax - dmin + 1e-7) - 1.0


@dataclass
class DepthStage:
    """The adapter path's depth stage: ``estimate(frames_384) -> depth``
    plus the pre/post contract. ``estimator`` is any callable
    ``(N, 384, 384, 3) float32 [-1,1] → (N, h, w) float32`` — the
    converted MiDaS network, or a stub in tests."""

    estimator: Callable[[jnp.ndarray], jnp.ndarray]

    @classmethod
    def from_checkpoint(cls, ckpt_path: str, policy: Policy = Policy()) -> "DepthStage":
        """Load a midas_v21_small torch checkpoint through the restricted
        unpickler and fold it into the flax MidasSmall."""
        from t2v.io.convert_depth import convert_midas_small
        from t2v.io.pickle_reader import load_torch_checkpoint

        sd = load_torch_checkpoint(ckpt_path)
        if "state_dict" in sd:
            sd = sd["state_dict"]
        params = convert_midas_small(sd)
        model = MidasSmall(policy=policy)
        fn = jax.jit(model.apply)
        return cls(estimator=lambda f: fn(params, f))

    def video_depth(
        self, frames_rgb: np.ndarray, target_hw: tuple[int, int],
        chunk: int = 8,
    ) -> np.ndarray:
        """get_batch_depth (ddpm3d.py:1448-1466): per-frame depth in
        [-1, 1] at the target resolution, estimated in chunks."""
        prepped = prepare_depth_frames(frames_rgb)
        outs = []
        for i in range(0, prepped.shape[0], chunk):
            d = self.estimator(jnp.asarray(prepped[i : i + chunk]))
            outs.append(np.asarray(normalize_depth(d, target_hw)))
        return np.concatenate(outs, axis=0)
