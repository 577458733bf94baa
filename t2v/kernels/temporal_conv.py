"""Fused GroupNorm→SiLU→temporal-conv chain for the ResBlock's
TemporalConvBlock (reference t2v_model.py:1186-1229).

Motivation (docs/PERF.md, round-3 device profile): at 49% MFU the two
largest step-time categories sit at the HBM roofline, and the named lever
is normalisation *traffic* — each GroupNorm site costs a stats pass that
re-reads the producer's output plus an apply pass that reads it again.
The TemporalConvBlock is the densest norm region in the UNet (4 of the 6
GN sites per ResBlock) and its convs are (3,1,1) — pure temporal mixing,
i.e. per spatial token three C×C GEMMs. That makes the whole
``GN → SiLU → conv`` layer expressible as ONE Pallas kernel per layer:

  * the layer kernel reads its input tile ONCE, normalises with
    precomputed group statistics (f32), applies SiLU, runs the temporal
    conv as three MXU GEMMs over frame-shifted views (zero-padded ends,
    matching Conv3d padding (1,1) on the frame axis), and writes the
    output tile ONCE;
  * its epilogue accumulates the per-group sum/sum² of the *rounded*
    output — exactly what the NEXT layer's GroupNorm needs — into a tiny
    (B, 2, G) f32 side output, so no stats pass ever re-reads the tensor;
  * the statistics of the chain *input* are computed in plain XLA
    (jnp sums), where the compiler can fuse the read into the producing
    fusion — the same cost the unfused graph already pays;
  * the final layer folds the residual add (identity + conv4) into its
    epilogue instead of emitting stats.

HBM traffic per layer drops from ~2 reads + 2 writes (stat fusion with a
kOutput rematerialisation + normalise-apply consumer) to 1 read + 1 write.
Unlike the recorded fusion-barrier failures (blocks.py perf history: a
standalone GN kernel, the GEGLU kernel), each kernel here *subsumes* the
producer conv and the normalise+SiLU epilogue — there is no XLA epilogue
left at the chain's internal boundaries to un-fuse.

Wide channels (C=1280: the 3×C×C weights alone are 9.8 MB) block the
output-channel axis as the innermost grid dimension; the input tile stays
resident in VMEM across those steps, so N-blocking costs no extra HBM
reads — only a recompute of normalise+SiLU per block (VPU work ≪ the
GEMMs).

Gradients: the public entry is a ``jax.custom_vjp`` whose backward
recomputes through the plain-XLA reference formulation (``chain_ref``) —
the same trade the flash-attention SPMD path documents (kernels/spmd.py).
Training memory/perf is unchanged from the unfused graph; the kernel is
an inference-path optimisation.

Stats layout note (round-4 review → round-5 fix): the side output is
per-spatial-tile PARTIALS ``(B, HW/TILE, 2, C)`` — every grid step writes
its own ``(i, j, ·, n)`` block exactly once, and the tiny fold over the
tile axis happens in the XLA glue (``finalize_stats``). The original
round-4 design accumulated across grid dim j into a shared ``(B, 2, C)``
block, which relied on accumulate-on-revisit semantics for
NON-consecutive revisits that Pallas TPU does not document (it measured
correct on the current chip/JAX version, but could silently break on a
Mosaic upgrade). Partials cost O(B·n_tiles·C) extra HBM — ~300 KB vs the
~126 MB main tensor — and remove the undocumented dependency. The bf16
fused-vs-XLA delta at C=1280 (max rel ~3.5e-02) is shared-input
bf16 rounding, not kernel error: against the fp32 ground truth both
formulations measure the SAME max rel 3.96e-02 / mean 5.28e-03.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NUM_GROUPS = 32

# scoped-VMEM budget for tile selection. The model below underestimates
# Mosaic's true scoped-stack allocation by a large constant factor
# (pipelining double-buffers, materialised scratch for the normalise/pad/
# cast temporaries, relayouts): measured overflows put actual/modelled at
# 3.2× (f32 tile(64,320): 42.10 M real) and 3.9× (f32 tile(16,256) at
# C=1280: 41.25 M real) against the 41 M scoped-vmem limit. The bf16
# budget is CALIBRATED BY MEASUREMENT at every tracked shape (the on-chip
# perf record was taken at those tilings) — do not retune it from the
# model. The fp32 parity path gets a tighter budget sized so that
# 4× the modelled footprint stays under the 41 M limit, and prices the
# weight block double-buffered (its index map varies over the innermost
# grid dim, so Mosaic pipelines it).
_VMEM_BUDGET = 11 * 1024 * 1024
_VMEM_BUDGET_F32 = 9 * 1024 * 1024
# When n_block < c the weight block's index map varies over the innermost
# grid dim, so Mosaic double-buffers it. The fp32 path prices that
# explicitly; the bf16 path's budget is measurement-calibrated with the
# weight priced ONCE, so an untracked bf16 shape with a much larger
# double-buffered weight could overflow the 41 MB scoped-VMEM limit while
# passing the budget. Guard: reject any bf16 n-blocked candidate whose
# modelled footprint WITH the weight priced 2× exceeds this cap — chosen
# just above the worst such footprint among the on-chip-verified tracked
# tilings (14.38 MiB: VC f=16, hw=1024, C=1280, residual), so every
# calibrated tiling is preserved bit-for-bit and anything bigger falls to
# a smaller n_block instead of risking the scoped-VMEM stack.
_VMEM_SAFE_2X = 15 * 1024 * 1024


def _pick_blocks(
    hw: int, f: int, c: int, x_isz: int = 2, w_isz: int = 2,
    residual: bool = False,
) -> tuple[int, int] | None:
    """(spatial tile, output-channel block) under the VMEM budget, or
    ``None`` when no Mosaic-legal tiling fits (the caller falls back to the
    XLA formulation — see ``fits``).

    Mosaic requires the last two dims of every block — here (TILE, N) —
    to be divisible by (8, 128) or equal to the full array dims (hw, c);
    a 125-frame run caught the original heuristic picking TILE=4.

    Per unit of spatial tile the kernel holds: the double-buffered input
    tile, the f32 normalised activation + padded compute-dtype copy, the
    f32 GEMM accumulator over the N block, the double-buffered output
    tile, and (last layer) the double-buffered residual tile. Sizes follow
    the ACTUAL dtypes, and the fp32 path additionally prices the weight
    block double-buffered under a tighter budget (see the budget comment
    above) — the round-4 parity runs (fp32 policy, "highest" precision)
    caught the original bf16-only arithmetic blowing the 41 MB scoped-VMEM
    stack limit at BOTH (f=16, hw=1024, c=320, residual; 42.10 M) and
    (f=16, hw=64, c=1280, residual; 41.25 M).
    """
    f32 = x_isz >= 4 or w_isz >= 4
    budget = _VMEM_BUDGET_F32 if f32 else _VMEM_BUDGET
    n_cands = [c] + [
        m for m in range((c // 128) * 128, 0, -128) if m < c and c % m == 0
    ]
    for n_block in n_cands:
        w_bytes = 3 * c * n_block * w_isz
        if f32:
            w_bytes *= 2  # double-buffered over the N grid dim
        per_tile = f * (
            2 * x_isz * c        # double-buffered input tile
            + 4 * c              # f32 normalised activation
            + w_isz * c          # frame-padded compute-dtype copy
            + 4 * n_block        # f32 GEMM accumulator
            + 2 * x_isz * n_block  # double-buffered output tile
        )
        if residual:
            per_tile += f * 2 * x_isz * n_block  # double-buffered residual
        cap = (budget - w_bytes) // per_tile
        if cap < 1:
            continue

        def _ok(tile: int) -> bool:
            if f32 or n_block == c:
                return True
            return 2 * w_bytes + per_tile * tile <= _VMEM_SAFE_2X

        if hw <= cap and _ok(hw):
            return hw, n_block  # block == full spatial dim: always legal
        for tile in range((min(cap, hw) // 8) * 8, 0, -8):
            if hw % tile == 0 and _ok(tile):
                return tile, n_block
    return None


def _pick_blocks_chunked(
    hw: int, f: int, c: int, x_isz: int = 2, w_isz: int = 2,
    residual: bool = False,
) -> tuple[int, int, int] | None:
    """(frame chunk, spatial tile, output-channel block). Tries the full
    frame extent first (identical to the round-4 behaviour at every shape
    it admitted, so calibrated tilings are untouched), then divisors of f
    descending — long-context shapes whose full-f tile exceeds VMEM (125f
    at C=1280; every 250f shape) run the SAME kernel over frame chunks
    with a 2-frame halo operand (the (3,1,1) conv needs ±1 neighbour;
    GroupNorm statistics stay exact because the finalised mu/inv are
    global and the emitted partials sum over chunks). Frame chunking is
    what lets the fused chain cover the reference's long-video envelope
    (/root/reference README.md:45 — the 125/250-frame configs) instead of
    falling back to XLA above 125 frames."""
    full = _pick_blocks(hw, f, c, x_isz, w_isz, residual=residual)
    if full is not None:
        return (f, *full)
    for fc in range(f // 2, 1, -1):
        if f % fc != 0:
            continue
        sub = _pick_blocks(hw, fc + 2, c, x_isz, w_isz, residual=residual)
        if sub is not None:
            return (fc, *sub)
    return None


def fits(
    f: int, hw: int, c: int, x_isz: int = 2, w_isz: int = 2
) -> bool:
    """True when the fused chain has a Mosaic-legal VMEM tiling for this
    shape at these dtypes (full-frame or frame-chunked). The chain keeps
    C constant across layers and the residual (last) layer is the
    largest, so one conservative check covers all four kernels."""
    return (
        _pick_blocks_chunked(hw, f, c, x_isz, w_isz, residual=True)
        is not None
    )


def _layer_kernel(
    stats_ref, scale_ref, bias_ref, w_ref, cb_ref, x_ref, *rest,
    f: int, hw: int, c: int, n_block: int, eps: float,
    emit_stats: bool, residual: bool, out_dtype,
):
    """One GN→SiLU→temporal-conv layer on a (F, TILE, C) input tile,
    producing the (F, TILE, N_BLOCK) output slice plus per-channel stat
    partials. The group fold / mu/inv finalisation lives in tiny XLA glue
    between kernels (``finalize_stats``): Mosaic's vector layouts reject
    the (G, gs) <-> (C,) shape casts, and the glue is O(B·C) — nothing."""
    if residual:
        res_ref, o_ref = rest[0], rest[1]
        stats_out_ref = None
    else:
        res_ref = None
        o_ref = rest[0]
        stats_out_ref = rest[1] if emit_stats else None

    # stats arrive finalised per channel: (1, 2, C) = [mu_c; inv_c]
    mu_c = stats_ref[0, 0].reshape(1, 1, c)
    inv_c = stats_ref[0, 1].reshape(1, 1, c)

    x = x_ref[0].astype(jnp.float32)  # (F, TILE, C)
    xn = (x - mu_c) * inv_c * scale_ref[0].reshape(1, 1, c) + bias_ref[
        0
    ].reshape(1, 1, c)
    a = jax.nn.silu(xn).astype(w_ref.dtype)
    tile = a.shape[1]
    zrow = jnp.zeros((1, tile, c), a.dtype)
    a_pad = jnp.concatenate([zrow, a, zrow], axis=0)  # (F+2, TILE, C)

    m = f * tile
    acc = jnp.zeros((m, n_block), jnp.float32)
    for k in range(3):
        acc = acc + jax.lax.dot_general(
            a_pad[k : k + f].reshape(m, c),
            w_ref[k],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    # bias + residual in the compute dtype, matching the unfused flax
    # ordering (conv output cast, then bias, then identity add)
    y = acc.astype(out_dtype) + cb_ref[0].reshape(1, n_block).astype(out_dtype)
    y = y.reshape(f, tile, n_block)
    if residual:
        y = y + res_ref[0]
    o_ref[0] = y

    if stats_out_ref is not None:
        # per-tile partials, written exactly once per (i, j, n) grid step —
        # no block revisits, so no reliance on accumulate-on-revisit
        # semantics (see the stats layout note in the module docstring)
        y32 = y.astype(jnp.float32)
        stats_out_ref[0, 0, 0, :] = y32.sum(axis=(0, 1))
        stats_out_ref[0, 0, 1, :] = (y32 * y32).sum(axis=(0, 1))


def _chunked_layer_kernel(
    stats_ref, scale_ref, bias_ref, w_ref, cb_ref, x_ref, halo_ref, *rest,
    fc: int, c: int, n_block: int, eps: float,
    emit_stats: bool, residual: bool, out_dtype,
):
    """Frame-chunked variant of ``_layer_kernel``: the block holds FC
    frames plus a 2-frame halo operand (raw neighbour frames, normalised
    in-kernel with the same global statistics). Halo rows at the sequence
    boundaries are zeroed AFTER the activation — matching the unfused
    Conv3d's zero padding, not SiLU(norm(0))."""
    if residual:
        res_ref, o_ref = rest[0], rest[1]
        stats_out_ref = None
    else:
        res_ref = None
        o_ref = rest[0]
        stats_out_ref = rest[1] if emit_stats else None

    jc = pl.program_id(1)
    nc = pl.num_programs(1)

    mu_c = stats_ref[0, 0].reshape(1, 1, c)
    inv_c = stats_ref[0, 1].reshape(1, 1, c)

    x = x_ref[0, 0].astype(jnp.float32)          # (FC, TILE, C)
    halo = halo_ref[0, 0].astype(jnp.float32)    # (2, TILE, C)
    xh = jnp.concatenate([halo[:1], x, halo[1:]], axis=0)  # (FC+2, TILE, C)
    xn = (xh - mu_c) * inv_c * scale_ref[0].reshape(1, 1, c) + bias_ref[
        0
    ].reshape(1, 1, c)
    a = jax.nn.silu(xn)
    # zero the boundary halo rows (Conv3d frame padding is zeros)
    front = jnp.where(jc > 0, a[:1], jnp.zeros_like(a[:1]))
    back = jnp.where(jc < nc - 1, a[-1:], jnp.zeros_like(a[-1:]))
    a_pad = jnp.concatenate([front, a[1:-1], back], axis=0).astype(
        w_ref.dtype
    )

    tile = a_pad.shape[1]
    m = fc * tile
    acc = jnp.zeros((m, n_block), jnp.float32)
    for k in range(3):
        acc = acc + jax.lax.dot_general(
            a_pad[k : k + fc].reshape(m, c),
            w_ref[k],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    y = acc.astype(out_dtype) + cb_ref[0].reshape(1, n_block).astype(out_dtype)
    y = y.reshape(fc, tile, n_block)
    if residual:
        y = y + res_ref[0, 0]
    o_ref[0, 0] = y

    if stats_out_ref is not None:
        y32 = y.astype(jnp.float32)
        stats_out_ref[0, 0, 0, 0, :] = y32.sum(axis=(0, 1))
        stats_out_ref[0, 0, 0, 1, :] = (y32 * y32).sum(axis=(0, 1))


def _build_halos(x, fc: int):
    """(B, NC, 2, HW, C) raw neighbour frames per chunk: [i·fc−1, (i+1)·fc]
    with zeros at the sequence ends (also re-zeroed in-kernel after the
    activation). Gathers 2·(NC−1) frames — O(F/fc) of the tensor."""
    b, f, hw, c = x.shape
    nc = f // fc
    zero = jnp.zeros((b, 1, hw, c), x.dtype)
    front = jnp.concatenate(
        [zero, x[:, fc - 1 : f - 1 : fc]], axis=1
    )  # (B, NC, HW, C)
    back = jnp.concatenate([x[:, fc : f : fc], zero], axis=1)
    return jnp.stack([front, back], axis=2)


def _chunked_layer(
    x, stats, scale, bias, w, cb, fc, tile, n_block, *,
    residual, emit_stats, eps, interpret,
):
    b, f, hw, c = x.shape
    nc = f // fc
    grid = (b, nc, hw // tile, c // n_block)
    xr = x.reshape(b, nc, fc, hw, c)
    halos = _build_halos(x, fc)

    in_specs = [
        pl.BlockSpec((1, 2, c), lambda i, jc, j, n: (i, 0, 0)),
        pl.BlockSpec((1, c), lambda i, jc, j, n: (0, 0)),
        pl.BlockSpec((1, c), lambda i, jc, j, n: (0, 0)),
        pl.BlockSpec((3, c, n_block), lambda i, jc, j, n: (0, 0, n)),
        pl.BlockSpec((1, n_block), lambda i, jc, j, n: (0, n)),
        pl.BlockSpec((1, 1, fc, tile, c), lambda i, jc, j, n: (i, jc, 0, j, 0)),
        pl.BlockSpec((1, 1, 2, tile, c), lambda i, jc, j, n: (i, jc, 0, j, 0)),
    ]
    args = [stats, scale.reshape(1, c), bias.reshape(1, c), w,
            cb.reshape(1, c), xr, halos]
    out_shape = [jax.ShapeDtypeStruct((b, nc, fc, hw, c), x.dtype)]
    out_specs = [
        pl.BlockSpec(
            (1, 1, fc, tile, n_block), lambda i, jc, j, n: (i, jc, 0, j, n)
        )
    ]
    if residual is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, fc, tile, n_block),
                lambda i, jc, j, n: (i, jc, 0, j, n),
            )
        )
        args.append(residual.reshape(b, nc, fc, hw, c))
    if emit_stats:
        out_shape.append(
            jax.ShapeDtypeStruct((b, nc, hw // tile, 2, c), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec(
                (1, 1, 1, 2, n_block), lambda i, jc, j, n: (i, jc, j, 0, n)
            )
        )

    out = pl.pallas_call(
        functools.partial(
            _chunked_layer_kernel, fc=fc, c=c, n_block=n_block, eps=eps,
            emit_stats=emit_stats, residual=residual is not None,
            out_dtype=x.dtype,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    y = out[0].reshape(b, f, hw, c)
    if emit_stats:
        return y, out[1].sum(axis=(1, 2))
    return y


def _layer(
    x, stats, scale, bias, w, cb, *, residual=None, emit_stats: bool,
    eps: float, interpret: bool,
):
    """x: (B, F, HW, C) -> same-shaped output (+ (B, 2, C) channel sums).

    ``stats`` is the FINALISED (B, 2, C) [mu_c; inv_c] from
    ``finalize_stats``; the emitted side output is raw per-channel
    sum/sum² for the next layer to finalise."""
    b, f, hw, c = x.shape
    blocks = _pick_blocks_chunked(
        hw, f, c,
        jnp.dtype(x.dtype).itemsize, jnp.dtype(w.dtype).itemsize,
        residual=residual is not None,
    )
    if blocks is None:
        raise ValueError(
            f"no Mosaic-legal VMEM tiling for temporal conv chain shape "
            f"(f={f}, hw={hw}, c={c}) — gate the call on fits()"
        )
    fc, tile, n_block = blocks
    if fc < f:
        return _chunked_layer(
            x, stats, scale, bias, w, cb, fc, tile, n_block,
            residual=residual, emit_stats=emit_stats, eps=eps,
            interpret=interpret,
        )
    grid = (b, hw // tile, c // n_block)

    in_specs = [
        pl.BlockSpec((1, 2, c), lambda i, j, n: (i, 0, 0)),
        pl.BlockSpec((1, c), lambda i, j, n: (0, 0)),
        pl.BlockSpec((1, c), lambda i, j, n: (0, 0)),
        pl.BlockSpec((3, c, n_block), lambda i, j, n: (0, 0, n)),
        pl.BlockSpec((1, n_block), lambda i, j, n: (0, n)),
        pl.BlockSpec((1, f, tile, c), lambda i, j, n: (i, 0, j, 0)),
    ]
    args = [stats, scale.reshape(1, c), bias.reshape(1, c), w,
            cb.reshape(1, c), x]
    out_shape = [jax.ShapeDtypeStruct((b, f, hw, c), x.dtype)]
    out_specs = [
        pl.BlockSpec((1, f, tile, n_block), lambda i, j, n: (i, 0, j, n))
    ]
    if residual is not None:
        in_specs.append(
            pl.BlockSpec((1, f, tile, n_block), lambda i, j, n: (i, 0, j, n))
        )
        args.append(residual)
    if emit_stats:
        out_shape.append(
            jax.ShapeDtypeStruct((b, hw // tile, 2, c), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((1, 1, 2, n_block), lambda i, j, n: (i, j, 0, n))
        )

    out = pl.pallas_call(
        functools.partial(
            _layer_kernel, f=f, hw=hw, c=c, n_block=n_block, eps=eps,
            emit_stats=emit_stats, residual=residual is not None,
            out_dtype=x.dtype,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    if emit_stats:
        # fold the per-tile partials — O(B·n_tiles·C) XLA glue
        return out[0], out[1].sum(axis=1)
    return out[0]


def input_stats(x) -> jax.Array:
    """(B, 2, C) raw per-channel sums of the chain input, in plain XLA so
    the read can fuse into x's producer (the ResBlock epilogue)."""
    x32 = x.astype(jnp.float32)
    return jnp.stack(
        [x32.sum(axis=(1, 2)), (x32 * x32).sum(axis=(1, 2))], axis=1
    )


def finalize_stats(raw, n_el: int, eps: float) -> jax.Array:
    """(B, 2, C) raw channel sums -> (B, 2, C) per-channel [mu; 1/sigma]
    with GroupNorm(32) joint statistics: fold channel sums into groups,
    compute mu/var/inv per group, expand back to channels. O(B·C) XLA
    glue between the layer kernels."""
    b, _, c = raw.shape
    gs = c // NUM_GROUPS
    g = raw.reshape(b, 2, NUM_GROUPS, gs).sum(-1)
    cnt = n_el * gs
    mu = g[:, 0] / cnt
    var = g[:, 1] / cnt - mu * mu
    inv = jax.lax.rsqrt(var + eps)
    expand = lambda v: jnp.repeat(v, gs, axis=-1)
    return jnp.stack([expand(mu), expand(inv)], axis=1)


def _norm_silu_ref(x, finalized, scale, bias, eps):
    b, f, hw, c = x.shape
    mu = finalized[:, 0].reshape(b, 1, 1, c)
    inv = finalized[:, 1].reshape(b, 1, 1, c)
    xn = (x.astype(jnp.float32) - mu) * inv
    xn = xn * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return jax.nn.silu(xn)


def chain_ref(x, layers, eps: float = 1e-5):
    """Plain-XLA reference of the fused chain (also the VJP recompute
    target). Matches blocks.TemporalConvBlock numerics: f32 GN statistics
    and SiLU, conv in the compute dtype, zero-padded frame ends."""
    identity = x
    h = x
    for scale, bias, w, cb in layers:
        stats = finalize_stats(input_stats(h), h.shape[1] * h.shape[2], eps)
        a = _norm_silu_ref(h, stats, scale, bias, eps).astype(w.dtype)
        b_, f, hw, c = a.shape
        a_pad = jnp.pad(a, ((0, 0), (1, 1), (0, 0), (0, 0)))
        acc = jnp.zeros((b_, f, hw, w.shape[-1]), jnp.float32)
        for k in range(3):
            acc = acc + jnp.einsum(
                "bfnc,cd->bfnd", a_pad[:, k : k + f], w[k],
                preferred_element_type=jnp.float32,
            )
        h = acc.astype(x.dtype) + cb.astype(x.dtype)
    return identity + h


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _chain(x, layers, eps: float, interpret: bool):
    n_el = x.shape[1] * x.shape[2]
    raw = input_stats(x)
    h = x
    n = len(layers)
    for i, (scale, bias, w, cb) in enumerate(layers):
        last = i == n - 1
        out = _layer(
            h, finalize_stats(raw, n_el, eps), scale, bias, w, cb,
            residual=x if last else None,
            emit_stats=not last, eps=eps, interpret=interpret,
        )
        if last:
            h = out
        else:
            h, raw = out
    return h


def _chain_fwd(x, layers, eps, interpret):
    return _chain(x, layers, eps, interpret), (x, layers)


def _chain_bwd(eps, interpret, res, g):
    x, layers = res
    _, vjp = jax.vjp(lambda xx, ll: chain_ref(xx, ll, eps), x, layers)
    return vjp(g)


_chain.defvjp(_chain_fwd, _chain_bwd)


def temporal_conv_chain(x, layers, eps: float = 1e-5, interpret: bool = False):
    """Fused TemporalConvBlock: x (B, F, HW, C), layers = 4 tuples of
    (gn_scale (C,), gn_bias (C,), w (3, C, C) compute-dtype, conv_bias (C,)).
    Returns identity + conv-chain output, dtype of x."""
    return _chain(x, tuple(layers), float(eps), bool(interpret))
