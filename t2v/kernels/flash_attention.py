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
    q_ref, k_ref, v_ref, *rest,
    scale: float, kv_len: int, block_kv: int, save_lse: bool
):
    if save_lse:
        o_ref, lse_ref, m_scr, l_scr, acc_scr = rest
    else:
        (o_ref, m_scr, l_scr, acc_scr), lse_ref = rest, None
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # keep the matmul operands in their storage dtype (bf16 runs the MXU at
    # full rate; fp32 operands quarter it) and accumulate in f32 via
    # preferred_element_type. scale == 1.0 means the wrapper pre-scaled q
    # (exact for power-of-two scales) — skip the per-element multiply over
    # the (bq, bkv) f32 scores, one full VPU pass per block (the kernel is
    # VPU-bound at the zeroscope 9216-token shape, see docs/PERF.md).
    q = q_ref[0]  # (bq, d)
    k = k_ref[0]  # (bkv, d)
    v = v_ref[0]  # (bkv, d)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bkv) f32
    if scale != 1.0:
        s = s * scale

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
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(kv_idx == n_kv - 1)
    def _():
        l = l_scr[:, :1]
        # guard fully-masked (padded) q rows against 0/0
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)
        if save_lse:
            # logsumexp rows for the backward pass, lane-broadcast to the
            # (8, 128)-tileable layout Mosaic requires (same trade as jax's
            # own TPU flash kernel, which stores l/m at (…, q, 128))
            lse_ref[0] = m_scr[:] + jnp.log(jnp.where(l_scr[:] == 0.0, 1.0, l_scr[:]))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_qkv(q, k, v, block_q, block_kv):
    B, N, D = q.shape
    S = k.shape[1]
    n_pad = _round_up(N, block_q)
    s_pad = _round_up(S, block_kv)
    if n_pad != N:
        q = jnp.pad(q, ((0, 0), (0, n_pad - N), (0, 0)))
    if s_pad != S:
        k = jnp.pad(k, ((0, 0), (0, s_pad - S), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, s_pad - S), (0, 0)))
    return q, k, v, n_pad, s_pad


def _vmem_block_cap(d: int) -> int:
    """Largest block edge that keeps the pipelined q/k/v/out tiles plus the
    f32 accumulator inside the ~16 MB scoped-VMEM budget. The 1024 default
    is tuned for UNet head dims (64); the VAE mid-block attention runs a
    single 512-wide head, where 1024-blocks exceed the limit (~256K
    elements per tile keeps the worst case ≈6 MB)."""
    return max(256, _round_up(262144 // max(d, 1), 128))


def _divisor_block(length: int, want: int, granule: int) -> int:
    """Largest multiple of ``granule`` ≤ ``want`` that divides ``length``
    exactly, or ``want`` when none ≥ granule·4 exists. Exact division
    removes BOTH the padded-block MXU/VPU waste and the per-block OOB
    column mask: at the ZeroScope mid level (S = 2304) the former 1024
    default padded to 3072 — 44% of the site's score math was spent on
    masked columns (round-5 zeroscope trace, docs/PERF.md)."""
    want = min(want, _round_up(length, granule))
    for cand in range(want - want % granule, 0, -granule):
        if length % cand == 0:
            return cand if cand >= granule * 4 or cand >= length else want
    return want


def _is_pow2(x: float) -> bool:
    import math

    if x <= 0.0:
        return False
    m, _ = math.frexp(x)
    return m == 0.5


def _flash_call(q, k, v, scale, block_q, block_kv, interpret, save_lse):
    B, N, D = q.shape
    S = k.shape[1]
    if scale is None:
        scale = D**-0.5

    # power-of-two scales (every UNet head dim: 64**-0.5 = 1/8) multiply
    # bf16/f32 q exactly — pre-scale the (N, D) q in XLA (fuses into its
    # producer) instead of the (N, S) scores in-kernel, bit-identical
    if _is_pow2(scale):
        q = q * jnp.asarray(scale, q.dtype)
        scale = 1.0

    cap = _vmem_block_cap(D)
    block_q = _divisor_block(N, min(block_q, cap), 8)
    block_kv = _divisor_block(S, min(block_kv, cap), LANES)
    q, k, v, n_pad, s_pad = _pad_qkv(q, k, v, block_q, block_kv)

    grid = (B, n_pad // block_q, s_pad // block_kv)
    out_specs = [pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0))]
    out_shape = [jax.ShapeDtypeStruct((B, n_pad, D), q.dtype)]
    if save_lse:
        out_specs.append(
            pl.BlockSpec((1, block_q, LANES), lambda b, i, j: (b, i, 0))
        )
        out_shape.append(jax.ShapeDtypeStruct((B, n_pad, LANES), jnp.float32))

    res = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=float(scale), kv_len=S, block_kv=block_kv,
            save_lse=save_lse,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_kv, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_kv, D), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=out_specs if save_lse else out_specs[0],
        out_shape=out_shape if save_lse else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)

    if save_lse:
        out, lse = res
        if n_pad != N:
            out, lse = out[:, :N], lse[:, :N]
        return out, lse[:, :, 0]
    out = res
    return out[:, :N] if n_pad != N else out


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_kv", "interpret")
)
def flash_attention_fwd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float | None = None,
    block_q: int = 1536,
    block_kv: int = 1536,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Training forward with residuals: (out (B, N, D), lse (B, N))."""
    return _flash_call(q, k, v, scale, block_q, block_kv, interpret, True)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_kv", "interpret")
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float | None = None,
    block_q: int = 1536,
    block_kv: int = 1536,
    interpret: bool = False,
) -> jax.Array:
    """Blockwise attention, q: (B, N, D), k/v: (B, S, D) -> (B, N, D).
    Inference variant — no residual output."""
    return _flash_call(q, k, v, scale, block_q, block_kv, interpret, False)


# ---------------------------------------------------------------------------
# Backward (FlashAttention-2 style): scores are recomputed blockwise from the
# saved (q, k, v, lse); nothing (N, S)-shaped ever touches HBM. Two kernels:
# dk/dv accumulate over q blocks, dq accumulates over kv blocks. delta_i =
# rowsum(dO_i * O_i) is precomputed in XLA (one cheap fused reduction).


def _recompute_p(q, k, scale, lse, kv_idx, kv_len, block_kv):
    """p = exp(q·kᵀ·scale − lse) with padded kv columns zeroed. q/k stay in
    storage dtype (full-rate MXU); scores accumulate in f32."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(s - lse)
    if kv_len % block_kv != 0:
        first_oob = kv_len - kv_idx * block_kv
        col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        p = jnp.where(col < first_oob, p, 0.0)
    return p


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_scr, dv_scr, *, scale: float, kv_len: int, block_kv: int
):
    q_idx = pl.program_id(2)
    n_q = pl.num_programs(2)
    kv_idx = pl.program_id(1)

    @pl.when(q_idx == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]  # (bq, d) storage dtype — full-rate MXU operands
    k = k_ref[0]  # (bkv, d)
    v = v_ref[0]
    do = do_ref[0]  # (bq, d)
    lse = lse_ref[0]  # (bq, 1)
    delta = delta_ref[0]  # (bq, 1)

    p = _recompute_p(q, k, scale, lse, kv_idx, kv_len, block_kv)  # (bq, bkv) f32
    # dv += pᵀ · dO
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dp = dO · vᵀ ; ds = p ∘ (dp − delta) · scale ; dk += dsᵀ · q
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta) * scale
    dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(q_idx == n_q - 1)
    def _():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr,
    *, scale: float, kv_len: int, block_kv: int
):
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]  # (bq, 1)
    delta = delta_ref[0]  # (bq, 1)

    p = _recompute_p(q, k, scale, lse, kv_idx, kv_len, block_kv)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta) * scale
    dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kv_idx == n_kv - 1)
    def _():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_kv", "interpret")
)
def flash_attention_bwd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    o: jax.Array,
    lse: jax.Array,
    do: jax.Array,
    scale: float | None = None,
    block_q: int = 1536,
    block_kv: int = 1536,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(dq, dk, dv) from saved forward residuals."""
    B, N, D = q.shape
    S = k.shape[1]
    if scale is None:
        scale = D**-0.5
    cap = _vmem_block_cap(D)
    block_q = _divisor_block(N, min(block_q, cap), 8)
    block_kv = _divisor_block(S, min(block_kv, cap), LANES)

    # delta rows; padded q rows get 0 → zero contributions everywhere
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)

    q, k, v, n_pad, s_pad = _pad_qkv(q, k, v, block_q, block_kv)
    if n_pad != N:
        do = jnp.pad(do, ((0, 0), (0, n_pad - N), (0, 0)))
        lse = jnp.pad(lse, ((0, 0), (0, n_pad - N)))
        delta = jnp.pad(delta, ((0, 0), (0, n_pad - N)))
    # trailing-1 layout keeps the (8, 128) tiling rule satisfied:
    # block (1, block_q, 1) has last dims (block_q % 8 == 0, 1 == dim)
    lse = lse[:, :, None]
    delta = delta[:, :, None]

    q_specs = [
        pl.BlockSpec((1, block_q, D), lambda b, j, i: (b, i, 0)),  # q
        pl.BlockSpec((1, block_kv, D), lambda b, j, i: (b, j, 0)),  # k
        pl.BlockSpec((1, block_kv, D), lambda b, j, i: (b, j, 0)),  # v
        pl.BlockSpec((1, block_q, D), lambda b, j, i: (b, i, 0)),  # do
        pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0)),  # lse
        pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0)),  # delta
    ]
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, scale=float(scale), kv_len=S, block_kv=block_kv
        ),
        grid=(B, s_pad // block_kv, n_pad // block_q),
        in_specs=q_specs,
        out_specs=[
            pl.BlockSpec((1, block_kv, D), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_kv, D), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, s_pad, D), k.dtype),
            jax.ShapeDtypeStruct((B, s_pad, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, D), jnp.float32),
            pltpu.VMEM((block_kv, D), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    dq_specs = [
        pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),  # q
        pl.BlockSpec((1, block_kv, D), lambda b, i, j: (b, j, 0)),  # k
        pl.BlockSpec((1, block_kv, D), lambda b, i, j: (b, j, 0)),  # v
        pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),  # do
        pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),  # lse
        pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),  # delta
    ]
    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, scale=float(scale), kv_len=S, block_kv=block_kv
        ),
        grid=(B, n_pad // block_q, s_pad // block_kv),
        in_specs=dq_specs,
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    if n_pad != N:
        dq = dq[:, :N]
    if s_pad != S:
        dk = dk[:, :S]
        dv = dv[:, :S]
    return dq, dk, dv
