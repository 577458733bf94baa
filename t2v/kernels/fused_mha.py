"""Pallas fused multi-head self-attention for SHORT sequences.

Motivation (v5e profile of the 1.7B ModelScope UNet step): the temporal
transformers dominate the non-conv time, and almost none of it is math —
it's layout. The reference-style multihead fold ``(B, N, H, D) ->
(B·H, N, D)`` materialises 100 MB layout copies per attention
(t2v_model.py:556-581 does the same fold on CUDA where it's free), and the
un-materialised ``(B, F, H, W, C) -> (B·H·W, F, C)`` transpose makes XLA
propagate batch-minor layouts through every downstream matmul (observed
13 TFLOP/s on the out-projection). The fix is a kernel that consumes the
projections' natural ``(B, N, H·D)`` layout directly:

  * q, k, v arrive exactly as the ``to_q``/``to_k``/``to_v`` Dense layers
    produce them — no head fold, no transposes, no (B·H, N, D) relayout;
  * heads are static lane slices of the fused H·D dim (contiguous DMA);
  * each grid step loads a block of ``bt`` sequences and computes all
    ``bt`` attention instances of one head as a single dense
    ``(bt·N, bt·N)`` matmul, masked to its block diagonal — tiny
    sequences (frames: 16-125, low-res spatial: 16-256) can't fill the
    MXU alone, so we trade ``bt×`` redundant FLOPs (still ≪ 1% of the
    UNet's) for full 128×128 tiles and zero data movement;
  * the softmax runs in float32 in VMEM; nothing (N, S)-shaped or
    batch-minor ever touches HBM.

Longer sequences (≥ ``t2v.kernels.attention.FLASH_MIN_KV``) take the
online-softmax flash kernel instead (flash_attention.py) — this kernel
materialises the (bt·N, bt·N) scores in VMEM, which is only sane because N
is small.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows of the dense block-diagonal score matrix per grid step; 512 rows of
# f32 scores is 1 MB of VMEM and a multiple of every MXU tile edge
_TARGET_ROWS = 512

# Mosaic's default 16 MB scoped-VMEM ceiling is far below the chip's
# 128 MB and these kernels legitimately need ~20 MB of stack at the widest
# UNet level (hd=1280, bt·seq=432 measured 19.91 MB at 1024×576 — the
# first config to cross the default). One custom call runs at a time, so
# claiming most of VMEM is safe.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _self_mha_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, scale: float,
                     seq: int, bt: int, valid: int):
    rows = bt * seq
    hd = q_ref.shape[-1]
    dh = hd // heads
    # the (bt, seq) -> rows merge is a pure vector-layout cast only when
    # seq % 8 == 0 (sublane tiling) — the wrapper pads seq to guarantee it
    q = q_ref[...].reshape(rows, hd)
    k = k_ref[...].reshape(rows, hd)
    v = v_ref[...].reshape(rows, hd)

    # block-diagonal mask: row i may attend col j iff same sequence;
    # padded key columns (col position ≥ valid) never receive weight
    row_seq = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0) // seq
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    mask = row_seq == col_iota // seq
    if valid != seq:
        mask = mask & (col_iota % seq < valid)
    neg = jnp.float32(-1e30)

    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(mask, s, neg)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        oh = jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / l
        o_ref[..., sl] = oh.reshape(bt, seq, dh).astype(o_ref.dtype)


def _block_seqs(b: int, seq: int) -> int:
    """Sequences per grid step: pack up to ~_TARGET_ROWS score rows,
    preferring a divisor of ``b`` so the wrapper never pads (padding costs
    a full concatenate of q/k/v in HBM)."""
    cap = max(1, _TARGET_ROWS // seq)
    for d in range(min(cap, b), 0, -1):
        if b % d == 0:
            # accept a divisor unless it wastes more than half the target
            if d * 2 > cap or d == b:
                return d
            break
    return cap


def _temporal_mha_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int,
                         scale: float, f: int, nb: int, valid: int):
    """Attention ACROSS the frame axis on the resident spatial layout.

    Blocks arrive as (f, nb, H·D) — f frame rows of the same sample, nb
    spatial tokens each. The frame<->token transpose happens HERE, in
    VMEM (a register shuffle), instead of as q/k/v/out HBM relayouts in
    the surrounding program. After the in-register swap this is the same
    dense block-diagonal trick as _self_mha_kernel: all nb length-f
    attention instances of one head as a single (nb·f, nb·f) masked
    matmul — frames are short (16-125), so full MXU tiles require the
    packing."""
    rows = nb * f
    hd = q_ref.shape[-1]
    dh = hd // heads
    # (nb, f) -> rows merge: pure layout cast only when f % 8 == 0; the
    # wrapper pads the frame axis and passes the real count as ``valid``
    swap = lambda r: jnp.transpose(r[...], (1, 0, 2)).reshape(rows, hd)
    q = swap(q_ref)
    k = swap(k_ref)
    v = swap(v_ref)

    row_seq = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0) // f
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    mask = row_seq == col_iota // f
    if valid != f:
        mask = mask & (col_iota % f < valid)
    neg = jnp.float32(-1e30)

    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(mask, s, neg)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        oh = jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / l
        o_ref[..., sl] = jnp.transpose(
            oh.reshape(nb, f, dh), (1, 0, 2)
        ).astype(o_ref.dtype)


def temporal_fits(n: int, f: int) -> bool:
    """True when ``fused_temporal_mha`` has a Mosaic-legal VMEM tiling for
    (tokens=n, frames=f); dispatchers fall back to the transposed
    self-attention path otherwise."""
    f_p = f + (-f) % 8
    nb = _legal_block(n, max(1, _TARGET_ROWS // f_p))
    return (nb * f_p) ** 2 * 4 <= 8 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("heads", "f", "scale", "interpret"))
def fused_temporal_mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    heads: int,
    f: int,
    scale: float | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Frame-axis self-attention on (B·F, N, H·D) WITHOUT leaving the
    spatial token layout: row group i·f..(i+1)·f of the leading axis is
    sample i's f frames (sample-major, as the UNets batch frames), and
    attention runs across those f rows independently per spatial token.

    Equivalent to transpose→self-attention→transpose, but the transposes
    live inside the kernel's VMEM blocks — nothing frame-minor ever
    touches HBM.
    """
    bf, n, hd = q.shape
    assert bf % f == 0, (bf, f)
    b = bf // f
    if scale is None:
        scale = (hd // heads) ** -0.5
    # the kernel's (nb, f) -> rows merge needs f % 8 == 0 (Mosaic sublane
    # tiling) — pad the frame axis per sample, mask padded frames in-kernel
    f_real = f
    f_pad = (-f) % 8
    if f_pad:
        q4 = q.reshape(b, f, n, hd)
        zs = jnp.zeros((b, f_pad, n, hd), q.dtype)
        q = jnp.concatenate([q4, zs], axis=1).reshape(b * (f + f_pad), n, hd)
        k = jnp.concatenate([k.reshape(b, f_real, n, hd), zs],
                            axis=1).reshape(b * (f + f_pad), n, hd)
        v = jnp.concatenate([v.reshape(b, f_real, n, hd), zs],
                            axis=1).reshape(b * (f + f_pad), n, hd)
        f = f + f_pad
    # spatial tokens per grid step, packing nb·f rows near the target;
    # nb is a block second-minor dim so it must be Mosaic-legal, and the
    # (nb·f)² f32 score tile must stay within VMEM
    nb = _legal_block(n, max(1, _TARGET_ROWS // f))
    if (nb * f) ** 2 * 4 > 8 * 1024 * 1024:
        raise ValueError(
            f"fused_temporal_mha: no Mosaic-legal token block within VMEM "
            f"for (f={f_real}, n={n}) — use the transposed self-attention path"
        )
    out = pl.pallas_call(
        functools.partial(
            _temporal_mha_kernel, heads=heads, scale=float(scale), f=f,
            nb=nb, valid=f_real,
        ),
        grid=(b, n // nb),
        in_specs=[pl.BlockSpec((f, nb, hd), lambda i, j: (i, j, 0))] * 3,
        out_specs=pl.BlockSpec((f, nb, hd), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * f, n, hd), q.dtype),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(q, k, v)
    if f_pad:
        out = out.reshape(b, f, n, hd)[:, :f_real].reshape(bf, n, hd)
    return out


def _cross_mha_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, scale: float):
    """One (row-block, kv) pair: full attention of ``rb`` query rows over
    the whole (short) kv sequence, packed heads as static lane slices."""
    q = q_ref[0]  # (rb, H·D)
    k = k_ref[0]  # (S, H·D)
    v = v_ref[0]
    hd = q.shape[-1]
    dh = hd // heads
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        oh = jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / l
        o_ref[0, :, sl] = oh.astype(o_ref.dtype)


# query rows per grid step for the cross kernel, bounded by a scoped-VMEM
# budget: q/o blocks are double-buffered bf16 (8·hd bytes per row) and the
# f32 score/prob scratch is lane-padded to 128 columns plus the f32 head
# output (~1.7 kB per row). A flat 4096-row cap hit the 16 MB scoped-VMEM
# ceiling at the full-scale UNet (18.1 MB at hd=320, q (2, 24576, 320)) —
# the budget keeps every channel width comfortably under it.
_CROSS_TARGET_ROWS = 4096
_CROSS_VMEM_BUDGET = 11 * 1024 * 1024


def _cross_rows_cap(hd: int) -> int:
    return max(256, min(_CROSS_TARGET_ROWS, _CROSS_VMEM_BUDGET // (8 * hd + 1664)))


def _legal_block(n: int, cap: int) -> int:
    """Largest divisor of ``n`` that Mosaic accepts as a second-minor block
    dim — a multiple of 8, or ``n`` itself (block == full array dim) —
    preferring ≤ cap, else the smallest legal one. Always succeeds
    (``n`` itself is legal); whether the resulting block FITS is the
    caller's separate VMEM score-size check."""
    legal = [d for d in range(1, n + 1)
             if n % d == 0 and (d == n or d % 8 == 0)]
    under = [d for d in legal if d <= cap]
    return max(under) if under else min(legal)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret"))
def fused_cross_mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    heads: int,
    scale: float | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Cross-attention on packed heads: q (B, N, H·D) over k/v (B, S, H·D)
    with SHORT S (text context, 77 tokens). No head folding — q arrives
    exactly as the projections emit it; heads are static lane slices.

    Large N is welcome: callers merge the frame axis into the query rows
    ((B·F, n) → (B, F·n)) so one sample's whole video attends its single
    shared context — see CrossAttention in t2v/models/blocks.py.
    """
    b, n, hd = q.shape
    s = k.shape[1]
    if scale is None:
        scale = (hd // heads) ** -0.5
    # rb is a block second-minor dim: multiple of 8 or the full n
    rb = _legal_block(n, _cross_rows_cap(hd))
    return pl.pallas_call(
        functools.partial(_cross_mha_kernel, heads=heads, scale=float(scale)),
        grid=(b, n // rb),
        in_specs=[
            pl.BlockSpec((1, rb, hd), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, s, hd), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, s, hd), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rb, hd), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, hd), q.dtype),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret"))
def fused_self_mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    heads: int,
    scale: float | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Self-attention on (B, N, H·D) without head folding.

    B independent length-N sequences; the H heads live fused in the minor
    dim exactly as the qkv projections emit them. Returns (B, N, H·D).
    """
    b, n, hd = q.shape
    if scale is None:
        scale = (hd // heads) ** -0.5
    # the kernel's (bt, seq) -> rows merge needs seq % 8 == 0 (Mosaic
    # sublane tiling; a 125-frame temporal attention caught this) — pad
    # the sequence and mask the padded key columns in-kernel
    seq_pad = (-n) % 8
    if seq_pad:
        zs = jnp.zeros((b, seq_pad, hd), q.dtype)
        q = jnp.concatenate([q, zs], axis=1)
        k = jnp.concatenate([k, zs], axis=1)
        v = jnp.concatenate([v, zs], axis=1)
    n_p = n + seq_pad
    bt = _block_seqs(b, n_p)
    pad = (-b) % bt
    if pad:
        zeros = jnp.zeros((pad, n_p, hd), q.dtype)
        q = jnp.concatenate([q, zeros])
        k = jnp.concatenate([k, zeros])
        v = jnp.concatenate([v, zeros])
    bp = q.shape[0]

    out = pl.pallas_call(
        functools.partial(
            _self_mha_kernel, heads=heads, scale=float(scale), seq=n_p,
            bt=bt, valid=n,
        ),
        grid=(bp // bt,),
        in_specs=[pl.BlockSpec((bt, n_p, hd), lambda i: (i, 0, 0))] * 3,
        out_specs=pl.BlockSpec((bt, n_p, hd), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, n_p, hd), q.dtype),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(q, k, v)
    if pad:
        out = out[:b]
    return out[:, :n] if seq_pad else out
