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
    use_shard_map: bool = False,
):
    """Sample n videos in one sharded computation. Returns (n, F, H, W, C).

    With a mesh, noise is placed sharded over ``dp`` along the batch axis
    and the sharding propagates through the scan; without one it is a plain
    batched sample.

    ``use_shard_map=True`` (dp-ONLY meshes) runs the whole per-shard
    sampling loop inside ``jax.shard_map`` instead of relying on GSPMD
    propagation. Sampling is embarrassingly parallel over the batch, so
    the shards need no collectives — and, crucially, the Pallas attention
    kernels (Mosaic custom calls, which GSPMD cannot partition) run
    unchanged on each shard's local batch. Bit-parity with the GSPMD/serial
    paths holds wherever no in-loop noise is drawn (eta == 0,
    initial_only inpainting); ancestral draws fold the shard index into
    the key so shards decorrelate. tp/sp meshes need cross-device
    collectives inside the model (Megatron all-reduce, frame all-gather) —
    those stay on GSPMD with the XLA attention path.

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
    dp_only = (
        use_shard_map
        and mesh is not None
        and mesh.shape.get("dp", 1) > 1
        and all(sz == 1 for ax, sz in mesh.shape.items() if ax != "dp")
        and n_samples % mesh.shape["dp"] == 0
        # the shard_map body is one monolithic per-shard program — it
        # cannot poll between windows, so progress/interrupt requests
        # route to the GSPMD path (which windows the loop) instead of
        # being silently dropped (round-4 review)
        and (callback is None or callback_interval is None)
    )
    if dp_only:
        return _dp_shard_map_sample(
            apply_fn, schedule, steps=steps, sample_shape=sample_shape,
            n_samples=n_samples, cond_b=cond_b, uncond_b=uncond_b,
            guidance_scale=guidance_scale, eta=eta,
            sampler_name=sampler_name, seed=seed, mesh=mesh, noise=noise,
            parameterization=parameterization, latents=latents,
            is_vid2vid=is_vid2vid, strength=strength, mask=mask,
            image_latents=image_latents, inpaint_mode=inpaint_mode,
            cfg_combine_mode=cfg_combine_mode,
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


def _dp_shard_map_sample(
    apply_fn, schedule, *, steps, sample_shape, n_samples, cond_b, uncond_b,
    guidance_scale, eta, sampler_name, seed, mesh, noise, parameterization,
    latents, is_vid2vid, strength, mask, image_latents, inpaint_mode,
    cfg_combine_mode,
):
    """The dp-only shard_map execution (see ``dp_sample``): each device
    runs the FULL sampling loop on its local batch shard — no GSPMD
    partitioning constraints, so the Pallas attention kernels stay live."""
    from jax import shard_map

    ndp = mesh.shape["dp"]
    n_local = n_samples // ndp
    key = rng_lib.key_for_seed(seed)

    def bspec(t):
        # batch axis sits at ndim-3 for conditioning ((B, L, D) or
        # per-step (S, B, L, D) tables)
        return P(*([None] * (t.ndim - 3) + ["dp"]))

    operands = {"noise": noise, "cond": cond_b}
    specs = {"noise": P("dp"), "cond": bspec(cond_b)}
    if uncond_b is not None:
        operands["uncond"] = uncond_b
        specs["uncond"] = bspec(uncond_b)
    if latents is not None:
        operands["latents"] = latents
        specs["latents"] = P("dp") if latents.shape[0] == n_samples else P()
    if mask is not None:
        operands["mask"] = mask
        specs["mask"] = P()
    if image_latents is not None:
        operands["image_latents"] = image_latents
        specs["image_latents"] = P()

    def local(ops):
        # decorrelate ancestral draws across shards; eta == 0 draws nothing
        shard_key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
        return sample_loop(
            apply_fn,
            schedule,
            steps=steps,
            shape=(n_local,) + tuple(sample_shape),
            cond=ops["cond"],
            uncond=ops.get("uncond"),
            guidance_scale=guidance_scale,
            eta=eta,
            sampler_name=sampler_name,
            key=shard_key,
            noise=ops["noise"],
            latents=ops.get("latents"),
            is_vid2vid=is_vid2vid,
            strength=strength,
            mask=ops.get("mask"),
            image_latents=ops.get("image_latents"),
            inpaint_mode=inpaint_mode,
            cfg_combine_mode=cfg_combine_mode,
            parameterization=parameterization,
        )

    # check_vma=False: Pallas calls don't annotate varying-mesh-axes
    # metadata, and the body is embarrassingly parallel (no collectives),
    # so replication checking has nothing to verify anyway
    return shard_map(
        local, mesh=mesh, in_specs=(specs,), out_specs=P("dp"),
        check_vma=False,
    )(operands)
