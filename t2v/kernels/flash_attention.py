"""Pallas TPU flash attention.

This is the TPU-native replacement for the reference's 4-way CUDA attention
dispatch (xformers / torch SDP flash / SDP mem-efficient / einsum,
t2v_model.py:556-581) — the module that made 125-frame videos fit in 12 GB
(reference README.md:45). Instead of materialising the (N, S) score matrix
in HBM, the kernel streams KV blocks through VMEM with the standard
online-softmax recurrence, accumulating in float32.

Shapes are ``(batch, seq, head_dim)`` with attention heads pre-folded into
``batch`` (matching the reference's ``(b h) n d`` layout) — both UNet
attention layouts reduce to this:
  * spatial:  batch = B·F·heads,      seq = H·W  (up to 9216 for 1024×576)
  * temporal: batch = B·H·W·heads,    seq = F    (up to 125+)

Grid is (batch, q_blocks, kv_blocks); kv is the minor (fastest) dimension,
so the running max / sum / accumulator scratch carries across kv steps and
the output block is written once on the last kv step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale: float, kv_len: int, block_kv: int
):
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32) * scale  # (bq, d)
    k = k_ref[0].astype(jnp.float32)  # (bkv, d)
    v = v_ref[0].astype(jnp.float32)  # (bkv, d)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bkv)

    # mask out-of-range kv positions (wrapper pads S up to block multiple)
    first_oob = kv_len - kv_idx * block_kv
    if kv_len % block_kv != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < first_oob, s, -jnp.inf)

    m_prev = m_scr[:, :1]  # (bq, 1)
    l_prev = l_scr[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # (bq, bkv)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)

    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(kv_idx == n_kv - 1)
    def _():
        l = l_scr[:, :1]
        # guard fully-masked (padded) q rows against 0/0
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_kv", "interpret")
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float | None = None,
    block_q: int = 256,
    block_kv: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Blockwise attention, q: (B, N, D), k/v: (B, S, D) -> (B, N, D)."""
    B, N, D = q.shape
    S = k.shape[1]
    if scale is None:
        scale = D**-0.5

    block_q = min(block_q, _round_up(N, 8))
    block_kv = min(block_kv, _round_up(S, LANES))
    n_pad = _round_up(N, block_q)
    s_pad = _round_up(S, block_kv)

    if n_pad != N:
        q = jnp.pad(q, ((0, 0), (0, n_pad - N), (0, 0)))
    if s_pad != S:
        k = jnp.pad(k, ((0, 0), (0, s_pad - S), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, s_pad - S), (0, 0)))

    grid = (B, n_pad // block_q, s_pad // block_kv)

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=float(scale), kv_len=S, block_kv=block_kv
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_kv, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_kv, D), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)

    if n_pad != N:
        out = out[:, :N]
    return out
