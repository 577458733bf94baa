"""Spatially-tiled VAE decode/encode with overlap blending.

The TPU answer to the reference's low-VRAM VAE hacks (CPU offload + 1-frame
chunks, t2v_pipeline.py:302-356): for hi-res configs (ZeroScope 1024x576,
BASELINE config 2) the decoder is run on overlapping latent tiles and the
results are feather-blended, bounding peak HBM at any resolution while
staying fully on-device. Frames remain batched — tiling composes with the
pipeline's frame chunking.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np


def _ramp_weights(size: int, start_ovl: int, end_ovl: int) -> np.ndarray:
    """1D feather: linear 0→1 over the leading/trailing overlap regions."""
    w = np.ones(size, np.float32)
    if start_ovl > 0:
        w[:start_ovl] = np.linspace(0.0, 1.0, start_ovl + 2)[1:-1]
    if end_ovl > 0:
        w[-end_ovl:] = np.linspace(1.0, 0.0, end_ovl + 2)[1:-1]
    return w


def _tile_starts(total: int, tile: int, stride: int) -> list[int]:
    if total <= tile:
        return [0]
    starts = list(range(0, total - tile, stride))
    starts.append(total - tile)
    return starts


def decode_spatial_tiled(
    decode_fn: Callable,
    z,
    *,
    tile: int = 64,
    overlap: int = 16,
    upscale: int = 8,
):
    """z: (F, h, w, C) latent → (F, h*upscale, w*upscale, 3) image.

    decode_fn maps a latent tile (F, th, tw, C) → (F, th*u, tw*u, 3).
    Tiles are decoded independently (each a fixed-shape jit call) and
    feather-blended over ``overlap`` latent pixels.
    """
    f, h, w, c = z.shape
    if h <= tile and w <= tile:
        return decode_fn(z)

    stride = tile - overlap
    ys = _tile_starts(h, tile, stride)
    xs = _tile_starts(w, tile, stride)

    out = np.zeros((f, h * upscale, w * upscale, 3), np.float32)
    norm = np.zeros((1, h * upscale, w * upscale, 1), np.float32)

    for y0 in ys:
        for x0 in xs:
            th = min(tile, h - y0)
            tw = min(tile, w - x0)
            img = np.asarray(
                decode_fn(z[:, y0 : y0 + th, x0 : x0 + tw, :]), np.float32
            )
            wy = _ramp_weights(
                th * upscale,
                overlap * upscale if y0 > 0 else 0,
                overlap * upscale if y0 + th < h else 0,
            )
            wx = _ramp_weights(
                tw * upscale,
                overlap * upscale if x0 > 0 else 0,
                overlap * upscale if x0 + tw < w else 0,
            )
            wt = (wy[:, None] * wx[None, :])[None, :, :, None]
            ys0, xs0 = y0 * upscale, x0 * upscale
            out[:, ys0 : ys0 + th * upscale, xs0 : xs0 + tw * upscale] += img * wt
            norm[:, ys0 : ys0 + th * upscale, xs0 : xs0 + tw * upscale] += wt

    return out / np.maximum(norm, 1e-8)


def encode_spatial_tiled(
    encode_fn: Callable,
    x,
    *,
    tile: int = 512,
    overlap: int = 128,
    downscale: int = 8,
):
    """x: (F, H, W, 3) image → (F, H/d, W/d, C) latent mean, tiled."""
    f, H, W, _ = x.shape
    if H <= tile and W <= tile:
        return encode_fn(x)
    stride = tile - overlap
    ys = _tile_starts(H, tile, stride)
    xs = _tile_starts(W, tile, stride)
    h, w = H // downscale, W // downscale
    # out is allocated lazily from the first real tile (a probe call would
    # cost an extra compile at a different shape plus a wasted forward)
    out = None
    norm = np.zeros((1, h, w, 1), np.float32)
    od = overlap // downscale
    for y0 in ys:
        for x0 in xs:
            th = min(tile, H - y0)
            tw = min(tile, W - x0)
            lat = np.asarray(encode_fn(x[:, y0 : y0 + th, x0 : x0 + tw]), np.float32)
            if out is None:
                out = np.zeros((f, h, w, lat.shape[-1]), np.float32)
            lh, lw = lat.shape[1], lat.shape[2]
            wy = _ramp_weights(lh, od if y0 > 0 else 0, od if y0 + th < H else 0)
            wx = _ramp_weights(lw, od if x0 > 0 else 0, od if x0 + tw < W else 0)
            wt = (wy[:, None] * wx[None, :])[None, :, :, None]
            ly, lx = y0 // downscale, x0 // downscale
            out[:, ly : ly + lh, lx : lx + lw] += lat * wt
            norm[:, ly : ly + lh, lx : lx + lw] += wt
    return out / np.maximum(norm, 1e-8)
