"""Data-parallel batch sampling over the device mesh.

TPU-native replacement for the reference's DDP sampling path
(sample_text2video.py:174-188 + ddp_wrapper.py + dist_utils.py): there,
``n_samples`` is split across NCCL ranks, each rank seeds
``local_rank + seed``, samples its share, and results are
``dist.all_gather``ed to rank 0.

Here the same work is ONE jitted computation: the batch axis carries all
n samples at once, per-sample noise comes from per-index seeds (seed + i —
the same seed policy), and the batch axis is sharded over the mesh's ``dp``
axis, so XLA partitions the whole denoise loop across devices and the
"gather" is just the sharded→addressable output transfer. No collectives
appear in the loop at all — sampling is embarrassingly parallel, exactly
why the reference used plain DDP.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from t2v.core import rng as rng_lib
from t2v.diffusion.sampling import sample_loop


def batched_noise(seed: int, n: int, sample_shape: tuple[int, ...], dtype=jnp.float32):
    """(n, *sample_shape) noise; sample i is seeded seed + i, identical to
    the single-sample path with batch_index=i — DP results match serial
    batches bit-for-bit (reference per-rank seed policy,
    sample_text2video.py:185)."""
    rows = [
        rng_lib.latent_noise(
            rng_lib.key_for_seed(seed + i), (1,) + tuple(sample_shape), dtype
        )
        for i in range(n)
    ]
    return jnp.concatenate(rows, axis=0)


def dp_spec(mesh: Mesh, n_samples: int, sample_shape, shard_frames: bool = False) -> P:
    """PartitionSpec for the (n, F, ...) noise/latents."""
    batch_ax = "dp" if n_samples % mesh.shape["dp"] == 0 else None
    frame_ax = (
        "sp"
        if shard_frames
        and mesh.shape.get("sp", 1) > 1
        and sample_shape[0] % mesh.shape["sp"] == 0
        else None
    )
    return P(batch_ax, frame_ax)


def _tile_cond(c, n: int):
    """Tile the batch axis (third-from-last: (B, L, D) or (S, B, L, D))."""
    if c is None:
        return None
    axis = c.ndim - 3
    return jnp.repeat(c, n, axis=axis)


def dp_sample(
    apply_fn,
    schedule,
    *,
    steps: int,
    sample_shape: tuple[int, ...],  # (F, H, W, C) for one sample
    n_samples: int,
    cond,
    uncond=None,
    guidance_scale: float = 1.0,
    eta: float = 0.0,
    sampler_name: str = "DDIM_Gaussian",
    seed: int = 0,
    mesh: Optional[Mesh] = None,
    callback=None,
    callback_interval=None,
    shard_frames: bool = False,
    noise=None,  # precomputed (n, *sample_shape) noise (already placed)
    parameterization: str = "eps",
    latents=None,  # (1|n, F, h, w, C) start latents (vid2vid source or masked init)
    is_vid2vid: bool = False,
    strength: float = 1.0,
    mask=None,  # (1, F, h, w, C) inpaint mask (broadcast over the batch)
    image_latents=None,  # (1, F, h, w, C) clean source latents
    inpaint_mode: str = "initial_only",
    cfg_combine_mode: Optional[str] = None,  # LVDM uc_type variants
):
    """Sample n videos in one sharded computation. Returns (n, F, H, W, C).

    With a mesh, noise is placed sharded over ``dp`` along the batch axis
    and the sharding propagates through the scan; without one it is a plain
    batched sample.

    vid2vid (``latents`` + ``is_vid2vid``) and inpainting (``latents`` as
    the per-sample masked init, plus ``mask``/``image_latents``) ride the
    same batched loop: the per-sample noise is what differentiates samples,
    and (1, ...) conditioning inputs broadcast over the batch axis — the
    reference's DDP had no mode restriction either
    (sample_text2video.py:174-188).

    shard_frames=True additionally shards the FRAME axis over the mesh's
    ``sp`` axis — the long-context configuration (SURVEY.md §5.7): spatial
    convs/attention are frame-parallel so they partition cleanly, and XLA
    inserts the all-gather that temporal attention needs over ICI. Use when
    a video (125+ frames, hi-res) exceeds one chip's HBM.
    """
    if noise is None:
        noise = batched_noise(seed, n_samples, sample_shape)
        if mesh is not None:
            noise = jax.device_put(noise, NamedSharding(mesh, dp_spec(
                mesh, n_samples, sample_shape, shard_frames)))
    cond_b = _tile_cond(cond, n_samples)
    uncond_b = _tile_cond(uncond, n_samples)
    if latents is not None:
        # vid2vid source latents broadcast against the per-sample noise in
        # the encode; direct start latents (masked inpaint init) carry
        # per-sample noise and must already be batched
        ok = (1, n_samples) if is_vid2vid else (n_samples,)
        if latents.shape[0] not in ok:
            raise ValueError(
                f"latents batch {latents.shape[0]} incompatible with "
                f"n_samples={n_samples} (is_vid2vid={is_vid2vid})"
            )
    x0 = sample_loop(
        apply_fn,
        schedule,
        steps=steps,
        shape=(n_samples,) + tuple(sample_shape),
        cond=cond_b,
        uncond=uncond_b,
        guidance_scale=guidance_scale,
        eta=eta,
        sampler_name=sampler_name,
        key=rng_lib.key_for_seed(seed),
        noise=noise,
        latents=latents,
        is_vid2vid=is_vid2vid,
        strength=strength,
        mask=mask,
        image_latents=image_latents,
        inpaint_mode=inpaint_mode,
        cfg_combine_mode=cfg_combine_mode,
        callback=callback,
        callback_interval=callback_interval,
        parameterization=parameterization,
    )
    return x0
