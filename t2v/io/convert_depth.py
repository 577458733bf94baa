"""midas_v21_small torch checkpoint → flax ``MidasSmall`` params.

The upstream checkpoint is ``MidasNet_small`` wrapping timm's
``tf_efficientnet_lite3`` (the class the reference's adapter configs point
at but do not ship — ddpm3d.py:1441 instantiates it from user config).
Key layout converted here:

  pretrained.layer1.0 / .1      conv_stem + bn1
  pretrained.layer1.{3,4}.{r}   blocks[0:2]   (stages 0-1)
  pretrained.layer2.0.{r}       blocks[2]     (stage 2)
  pretrained.layer3.{0,1}.{r}   blocks[3:5]   (stages 3-4)
  pretrained.layer4.{0,1}.{r}   blocks[5:7]   (stages 5-6)
  scratch.layer{1-4}_rn         decoder input convs (bias-free)
  scratch.refinenet{4-1}        fusion blocks (resConfUnit1/2, out_conv)
  scratch.output_conv.{0,2,4}   head convs

Every conv+BN pair is FOLDED into a biased conv at conversion time
(inference-only stage): W' = W·γ/√(σ²+ε), b' = β − γ·μ/√(σ²+ε), with the
tf-efficientnet BN ε = 1e-3. Conv weights move (O, I, kh, kw) →
(kh, kw, I, O); depthwise weights (C, 1, kh, kw) → (kh, kw, 1, C).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

_BN_EPS = 1e-3  # tf_efficientnet_lite* BatchNorm epsilon

SD = Mapping[str, Any]


def _conv_w(w) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _dw_w(w) -> np.ndarray:
    # (C, 1, kh, kw) → (kh, kw, 1, C)
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _fold(sd: SD, conv_key: str, bn_key: str, depthwise: bool = False) -> dict:
    w = np.asarray(sd[f"{conv_key}.weight"], np.float32)
    gamma = np.asarray(sd[f"{bn_key}.weight"], np.float32)
    beta = np.asarray(sd[f"{bn_key}.bias"], np.float32)
    mean = np.asarray(sd[f"{bn_key}.running_mean"], np.float32)
    var = np.asarray(sd[f"{bn_key}.running_var"], np.float32)
    scale = gamma / np.sqrt(var + _BN_EPS)
    w = w * scale[:, None, None, None]
    b = beta - mean * scale
    kernel = _dw_w(w) if depthwise else _conv_w(w)
    return {"conv": {"kernel": kernel, "bias": b}}


def _plain(sd: SD, key: str, bias: bool = True) -> dict:
    out = {"kernel": _conv_w(np.asarray(sd[f"{key}.weight"], np.float32))}
    if bias:
        out["bias"] = np.asarray(sd[f"{key}.bias"], np.float32)
    return {"conv": out}


def _block(sd: SD, prefix: str, expand_ratio: int) -> dict:
    if expand_ratio == 1:
        # DepthwiseSeparableConv: conv_dw+bn1, conv_pw+bn2
        return {
            "dw": _fold(sd, f"{prefix}.conv_dw", f"{prefix}.bn1", depthwise=True),
            "pw": _fold(sd, f"{prefix}.conv_pw", f"{prefix}.bn2"),
        }
    # InvertedResidual: conv_pw+bn1, conv_dw+bn2, conv_pwl+bn3
    return {
        "pw_exp": _fold(sd, f"{prefix}.conv_pw", f"{prefix}.bn1"),
        "dw": _fold(sd, f"{prefix}.conv_dw", f"{prefix}.bn2", depthwise=True),
        "pw_proj": _fold(sd, f"{prefix}.conv_pwl", f"{prefix}.bn3"),
    }


def _fusion(sd: SD, prefix: str, with_skip: bool) -> dict:
    out = {
        "res2": {
            "conv1": _plain(sd, f"{prefix}.resConfUnit2.conv1"),
            "conv2": _plain(sd, f"{prefix}.resConfUnit2.conv2"),
        },
        "out_conv": _plain(sd, f"{prefix}.out_conv"),
    }
    if with_skip:
        out["res1"] = {
            "conv1": _plain(sd, f"{prefix}.resConfUnit1.conv1"),
            "conv2": _plain(sd, f"{prefix}.resConfUnit1.conv2"),
        }
    return out


def convert_midas_small(sd: SD) -> dict:
    """Full midas_v21_small state dict → ``{"params": ...}`` for
    ``t2v.models.depth.MidasSmall`` (default config)."""
    from t2v.models.depth import _LITE3_STAGES

    params: dict[str, Any] = {
        "stem": _fold(sd, "pretrained.layer1.0", "pretrained.layer1.1"),
    }
    # (layer name, first child index, stage indices)
    groups = (
        ("pretrained.layer1", 3, (0, 1)),
        ("pretrained.layer2", 0, (2,)),
        ("pretrained.layer3", 0, (3, 4)),
        ("pretrained.layer4", 0, (5, 6)),
    )
    for layer, child0, stages in groups:
        for off, si in enumerate(stages):
            reps, _, _, expand, _ = _LITE3_STAGES[si]
            for r in range(reps):
                params[f"block_{si}_{r}"] = _block(
                    sd, f"{layer}.{child0 + off}.{r}", expand
                )
    for i in range(4):
        params[f"layer{i + 1}_rn"] = _plain(
            sd, f"scratch.layer{i + 1}_rn", bias=False
        )
    for i, with_skip in ((4, False), (3, True), (2, True), (1, True)):
        params[f"refine{i}"] = _fusion(
            sd, f"scratch.refinenet{i}", with_skip
        )
    params["head1"] = _plain(sd, "scratch.output_conv.0")
    params["head2"] = _plain(sd, "scratch.output_conv.2")
    params["head3"] = _plain(sd, "scratch.output_conv.4")
    return {"params": params}
