"""Fused relative-position temporal attention for the VideoCrafter UNet.

The LVDM ST block's temporal attention carries learned relative-position
score AND value biases (reference attention_temporal.py:68-144):

    sim  = q·kᵀ·scale + einsum("btd,tsd->bts", q, K2)·scale
    out  = softmax(sim)·v + einsum("bts,tsd->btd", softmax(sim), V2)

The biases depend on the attention weights per head, which ruled the
packed Pallas kernels out (videocrafter_unet.py round-3 note) — so the
temporal cores ran the XLA einsum path, whose head folds
``(B, t, n, h, d) -> (B·n·h, t, d)`` materialise full-tensor HBM
transposes around EVERY temporal site. The round-5 VC device trace
measured that cost: 20.9 ms/step of pure `copy` (19% of the 110 ms step)
plus conv-emitter relayout junk inside `fusion` — ~7.9 GB/step of
relayout traffic for 7.2 TFLOP of math (docs/PERF.md).

This kernel subsumes the folds: it reads q/k/v in the RESIDENT
sample-major spatial-token layout ``(B·T, N, H·D)`` (what the
per-token projections produce), grids over (batch, spatial tiles), and
runs every head's t×t attention — rel-pos biases included — inside
VMEM. Nothing frame-minor ever touches HBM; the output is written back
in the resident layout. The t×t matrices are tiny for the MXU, but
temporal-attention FLOPs are <1% of the step — the win is the removed
HBM relayout traffic, the opposite trade from the recorded
fused_temporal_mha negative result on ModelScope (blocks.py perf
history), where the alternative was ONE clean residual-stream transpose
rather than per-site q/k/v/out folds.

Measured (round-5, one v5e chip): per-site 0.90/0.36/0.23 ms vs the
einsum path's 1.32/0.65/0.32 ms at the C=320/640/1280 levels, and the
full VC fused-CFG step dropped 110.1 -> 103.4 ms with the `copy`
category collapsing 20.9 -> 5.3 ms (tools/profile_unet.py vc).

Gradients recompute through the XLA reference under ``jax.custom_vjp``
(the kernels/spmd.py trade). GSPMD meshes keep the XLA formulation —
it is natively partitionable and mesh VC jobs were already routed there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Modelled-footprint budget for tile selection. Like the temporal-conv
# chain's budget, this underestimates Mosaic's true scoped-stack use by a
# large constant factor (the per-head VMEM transposes and f32 score/bias
# temporaries materialise scratch): the measured overflow at the VC
# level-0 shape put real/modelled at ~3.8x (20.63 M real for a 5.4 M
# model at tile=64 vs the 16 M scoped limit). 2.75 M keeps the real
# footprint comfortably under the limit at every VC level (tile=32 at
# C=320, tile=8 at C=1280) — calibrated on-chip, do not retune from the
# model.
_VMEM_BUDGET = int(2.75 * 1024 * 1024)


def _pick_tile(n: int, t: int, hd: int, isz: int) -> int | None:
    """Spatial tile: 4 double-buffered (t, tile, hd) streams (q/k/v/out)
    plus per-head f32 score/bias scratch. Tile must divide n and be a
    multiple of 8 (Mosaic second-minor rule) or equal n."""
    per_tile = 4 * 2 * t * hd * isz + 3 * 4 * t * t  # + (nt,t,t) f32 scores
    cap = _VMEM_BUDGET // per_tile
    if cap < 1:
        return None
    if n <= cap:
        return n
    for tile in range((min(cap, n) // 8) * 8, 0, -8):
        if n % tile == 0:
            return tile
    return None


def fits(n: int, t: int, hd: int, isz: int = 2) -> bool:
    return _pick_tile(n, t, hd, isz) is not None


def _kernel(q_ref, k_ref, v_ref, k2_ref, v2_ref, o_ref, *,
            heads: int, scale: float):
    dh = q_ref.shape[3] // heads
    q = q_ref[0]  # (t, nt, hd)
    k = k_ref[0]
    v = v_ref[0]
    k2 = k2_ref[...]  # (t, t, dh)
    v2 = v2_ref[...]
    # Mosaic requires dot_general batch dims at position 0 and rejects
    # minor-dim-splitting reshapes (no (…, hd) -> (…, H, dh) inside the
    # kernel), so: ONE frame<->tile transpose per q/k/v stream hoisted out
    # of the head loop, then per-head minor-dim slices feed batched dots.
    # The remaining per-head transposes touch only the tiny f32 (nt, t, t)
    # score tiles and the per-head output — register-level relayouts, not
    # the HBM folds the kernel exists to remove.
    qn = jnp.transpose(q, (1, 0, 2))  # (nt, t, hd)
    kn = jnp.transpose(k, (1, 0, 2))
    vn = jnp.transpose(v, (1, 0, 2))
    outs = []
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        # scores: batch over the spatial tile -> (nt, tq, tk)
        s = jax.lax.dot_general(
            qn[:, :, sl], kn[:, :, sl], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # rel-pos score bias: q[tq, n]·K2[tq, tk] -> (tq, nt, tk)
        bias = jax.lax.dot_general(
            q[:, :, sl], k2, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s = (s + jnp.transpose(bias, (1, 0, 2))) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        pc = p.astype(v.dtype)  # (nt, tq, tk)
        o1 = jax.lax.dot_general(
            pc, vn[:, :, sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (nt, tq, dh)
        pt = jnp.transpose(pc, (1, 0, 2))  # (tq, nt, tk)
        o2 = jax.lax.dot_general(
            pt, v2, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (tq, nt, dh)
        outs.append(jnp.transpose(o1, (1, 0, 2)) + o2)
    o_ref[0] = jnp.concatenate(outs, axis=2).astype(o_ref.dtype)


def relpos_ref(q, k, v, k2, v2, heads: int, frame_split: int, scale: float):
    """XLA reference — the exact math of the model's einsum path
    (videocrafter_unet.py::TemporalCrossAttention, frame_split layout)."""
    bt, n, hd = q.shape
    t = frame_split
    bb = bt // t
    dh = hd // heads
    fold = lambda z: (
        z.reshape(bb, t, n, heads, dh)
        .transpose(0, 2, 3, 1, 4)
        .reshape(bb * n * heads, t, dh)
    )
    qf, kf, vf = fold(q), fold(k), fold(v)
    sim = jnp.einsum(
        "bid,bjd->bij", qf, kf, preferred_element_type=jnp.float32
    ) * scale
    sim = sim + jnp.einsum(
        "btd,tsd->bts", qf, k2.astype(qf.dtype),
        preferred_element_type=jnp.float32,
    ) * scale
    attn = jax.nn.softmax(sim, axis=-1).astype(vf.dtype)
    out = jnp.einsum("bij,bjd->bid", attn, vf)
    out = out + jnp.einsum("bts,tsd->btd", attn, v2.astype(attn.dtype))
    return (
        out.reshape(bb, n, heads, t, dh)
        .transpose(0, 3, 1, 2, 4)
        .reshape(bt, n, hd)
    )


def _call(q, k, v, k2, v2, heads, frame_split, scale, interpret):
    bt, n, hd = q.shape
    t = frame_split
    bb = bt // t
    tile = _pick_tile(n, t, hd, jnp.dtype(q.dtype).itemsize)
    if tile is None:
        raise ValueError(
            f"no VMEM tiling for relpos mha (n={n}, t={t}, hd={hd}) — "
            "gate the call on fits()"
        )
    resh = lambda z: z.reshape(bb, t, n, hd)
    grid = (bb, n // tile)
    spec = pl.BlockSpec((1, t, tile, hd), lambda b, j: (b, 0, j, 0))
    k2c = k2.astype(q.dtype)
    v2c = v2.astype(q.dtype)
    dh = hd // heads
    out = pl.pallas_call(
        functools.partial(_kernel, heads=heads, scale=float(scale)),
        grid=grid,
        in_specs=[
            spec, spec, spec,
            pl.BlockSpec((t, t, dh), lambda b, j: (0, 0, 0)),
            pl.BlockSpec((t, t, dh), lambda b, j: (0, 0, 0)),
        ],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bb, t, n, hd), q.dtype),
        interpret=interpret,
    )(resh(q), resh(k), resh(v), k2c, v2c)
    return out.reshape(bt, n, hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _relpos_diff(q, k, v, k2, v2, heads, frame_split, scale, interpret):
    return _call(q, k, v, k2, v2, heads, frame_split, scale, interpret)


def _relpos_fwd(q, k, v, k2, v2, heads, frame_split, scale, interpret):
    return (
        _relpos_diff(q, k, v, k2, v2, heads, frame_split, scale, interpret),
        (q, k, v, k2, v2),
    )


def _relpos_bwd(heads, frame_split, scale, interpret, res, g):
    q, k, v, k2, v2 = res
    _, vjp = jax.vjp(
        lambda a, b, c, d, e: relpos_ref(a, b, c, d, e, heads, frame_split,
                                         scale),
        q, k, v, k2, v2,
    )
    return vjp(g)


_relpos_diff.defvjp(_relpos_fwd, _relpos_bwd)


def fused_relpos_temporal_mha(
    q, k, v, k2, v2, *, heads: int, frame_split: int,
    scale: float | None = None, interpret: bool = False,
):
    """Temporal self-attention with rel-pos score/value biases, resident
    layout in and out. q/k/v: (B·T, N, H·D); k2/v2: (T, T, D)."""
    if scale is None:
        scale = (q.shape[-1] // heads) ** -0.5
    return _relpos_diff(q, k, v, k2, v2, heads, frame_split, float(scale),
                        interpret)
