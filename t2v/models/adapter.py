"""T2I-Adapter feature pyramid (depth-conditioned generation).

Flax port of the reference's LVDM adapter (adapter.py:10-105, consumed by
the depth-adapter CLI sample_text2video_adapter.py and injected into the
UNet every 3rd input block, openaimodel3d.py:655-663):
PixelUnshuffle(8) → conv_in → 4 stages × nums_rb ResnetBlocks (first block
of stages 1+ downsamples 2×) → 4 feature maps at the UNet's encoder scales.

Layout NHWC; PixelUnshuffle becomes a space-to-depth reshape.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from t2v.core.dtypes import Policy


def pixel_unshuffle(x, factor: int = 8):
    """(B, H, W, C) -> (B, H/f, W/f, C*f*f), torch PixelUnshuffle channel
    ordering (C-major, then row, then col)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    # torch output channel layout: (c, fy, fx)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // factor, w // factor, c * factor * factor)


class AdapterResnetBlock(nn.Module):
    out_c: int
    down: bool = False
    sk: bool = False
    ksize: int = 3
    use_conv: bool = True  # conv vs avg-pool downsample (adapter.py:20-36)
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x):
        p = self.policy
        conv = lambda feats, name, k=3, s=1: nn.Conv(
            feats, kernel_size=(k, k), strides=(s, s),
            padding=((k // 2, k // 2), (k // 2, k // 2)),
            name=name, dtype=p.compute_dtype, param_dtype=p.param_dtype,
        )
        if self.down:
            if self.use_conv:
                x = conv(x.shape[-1], "down_op", s=2)(x)
            else:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        in_c = x.shape[-1]
        if in_c != self.out_c or not self.sk:
            x = conv(self.out_c, "in_conv", k=self.ksize)(x)
        h = conv(self.out_c, "block1")(x)
        h = jax.nn.relu(h)
        h = conv(self.out_c, "block2", k=self.ksize)(h)
        if not self.sk:
            return h + conv(self.out_c, "skep", k=self.ksize)(x)
        return h + x


@dataclass(frozen=True)
class AdapterConfig:
    channels: tuple[int, ...] = (320, 640, 1280, 1280)
    nums_rb: int = 3
    cin: int = 64  # 1-channel depth x 8x8 unshuffle
    unshuffle: int = 8
    # ResnetBlock knobs (adapter.py:40,76): the published VideoCrafter depth
    # adapter uses ksize=1, sk=True, use_conv=False
    ksize: int = 3
    sk: bool = False
    use_conv: bool = True

    @classmethod
    def depth_adapter(cls) -> "AdapterConfig":
        """The sample_text2video_adapter depth configuration."""
        return cls(nums_rb=2, ksize=1, sk=True, use_conv=False)


class Adapter(nn.Module):
    """apply(params, x) -> tuple of per-scale features.

    x: (B, H, W, C_img) conditioning image (depth map: C_img=1).
    """

    cfg: AdapterConfig = AdapterConfig()
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x):
        cfg, p = self.cfg, self.policy
        x = pixel_unshuffle(x.astype(p.compute_dtype), cfg.unshuffle)
        x = nn.Conv(
            cfg.channels[0], kernel_size=(3, 3), padding=((1, 1), (1, 1)),
            name="conv_in", dtype=p.compute_dtype, param_dtype=p.param_dtype,
        )(x)
        features = []
        for i, ch in enumerate(cfg.channels):
            for j in range(cfg.nums_rb):
                x = AdapterResnetBlock(
                    out_c=ch,
                    down=(i != 0 and j == 0),
                    sk=cfg.sk,
                    ksize=cfg.ksize,
                    use_conv=cfg.use_conv,
                    policy=p,
                    name=f"body_{i * cfg.nums_rb + j}",
                )(x)
            features.append(x)
        return tuple(features)


def infer_adapter_config(sd) -> AdapterConfig:
    """Recover the ResnetBlock knobs from a checkpoint's keys/shapes."""
    n_body = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("body.")
    )
    sk = "body.0.skep.weight" not in sd
    ksize = sd["body.0.block2.weight"].shape[-1]
    use_conv = any(".down_opt.op.weight" in k for k in sd)
    cin = sd["conv_in.weight"].shape[1]
    ch0 = sd["conv_in.weight"].shape[0]
    # channel ladder from each block's out channels
    outs = [sd[f"body.{i}.block1.weight"].shape[0] for i in range(n_body)]
    channels, nums_rb = [], 0
    # nums_rb = run length of the first channel count
    nums_rb = next(
        (i for i in range(1, n_body) if outs[i] != outs[0]), n_body
    )
    channels = tuple(outs[i] for i in range(0, n_body, nums_rb))
    assert channels[0] == ch0
    return AdapterConfig(
        channels=channels, nums_rb=nums_rb, cin=cin,
        ksize=ksize, sk=sk, use_conv=use_conv,
    )


def convert_adapter(sd, cfg: AdapterConfig = AdapterConfig()) -> dict:
    """Torch adapter checkpoint (sample_text2video_adapter.py:20-41) → flax."""
    import numpy as np

    def conv(pfx):
        return {
            "kernel": np.ascontiguousarray(sd[f"{pfx}.weight"].transpose(2, 3, 1, 0)),
            "bias": sd[f"{pfx}.bias"],
        }

    params = {"conv_in": conv("conv_in")}
    for i in range(len(cfg.channels)):
        for j in range(cfg.nums_rb):
            idx = i * cfg.nums_rb + j
            block = {}
            if f"body.{idx}.down_opt.op.weight" in sd:
                block["down_op"] = conv(f"body.{idx}.down_opt.op")
            if f"body.{idx}.in_conv.weight" in sd:
                block["in_conv"] = conv(f"body.{idx}.in_conv")
            block["block1"] = conv(f"body.{idx}.block1")
            block["block2"] = conv(f"body.{idx}.block2")
            if f"body.{idx}.skep.weight" in sd:
                block["skep"] = conv(f"body.{idx}.skep")
            params[f"body_{idx}"] = block
    return {"params": params}
