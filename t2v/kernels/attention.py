"""Attention dispatch: Pallas flash kernel vs plain XLA dot-product.

Replaces the reference's backend ladder (xformers → torch SDP →
einsum, t2v_model.py:556-581). Policy:
  * long sequences on TPU → Pallas flash kernel (no (N,S) matrix in HBM);
  * short sequences (cross-attention over 77 text tokens, few-frame
    temporal attention) → XLA einsum attention, which XLA fuses well and
    which beats the kernel's block overhead at these sizes;
  * non-TPU backends (CPU tests) → XLA path (the Pallas kernel still runs
    under interpret=True in parity tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from t2v.kernels.flash_attention import (
    flash_attention,
    flash_attention_bwd,
    flash_attention_fwd,
)

# below this KV length the score matrix is cheap and XLA's fused attention
# wins; above it the flash kernel's HBM savings dominate.
FLASH_MIN_KV = 512


def xla_attention(q, k, v, scale: float | None = None):
    """Plain dot-product attention, fp32 softmax. (B, N, D) x (B, S, D)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bnd,bsd->bns", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1)
    return jnp.einsum("bns,bsd->bnd", p.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_diff(q, k, v, scale):
    return flash_attention(q, k, v, scale)


def _flash_diff_fwd(q, k, v, scale):
    # pallas_call has no JVP rule — run the kernel forward, save residuals
    out, lse = flash_attention_fwd(q, k, v, scale)
    return out, (q, k, v, out, lse)


def _flash_diff_bwd(scale, res, g):
    # Pallas FlashAttention-2 backward: blockwise recompute from (q, k, v,
    # o, lse) — the (N, S) score matrix never hits HBM in training either.
    q, k, v, o, lse = res
    dq, dk, dv = flash_attention_bwd(q, k, v, o, lse, g, scale)
    return dq, dk, dv


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def attention(q, k, v, scale: float | None = None, force: str | None = None):
    """Dispatching attention entry used by all model blocks.

    force: None (auto) | "flash" | "xla" — test/benchmark override.
    Differentiable on every path (the Pallas kernel carries a custom VJP).
    """
    if force == "flash":
        return _flash_diff(q, k, v, scale)
    if force == "xla":
        return xla_attention(q, k, v, scale)
    if force == "fused_spmd":
        # mesh runs: the flash kernel behind a custom_partitioning batch
        # rule (t2v/kernels/spmd.py); short sequences stay on XLA einsum
        # attention, which the partitioner shards natively
        if k.shape[1] >= FLASH_MIN_KV and q.shape[-1] % 8 == 0:
            from t2v.kernels.spmd import spmd_flash_attention

            return spmd_flash_attention(q, k, v, scale)
        return xla_attention(q, k, v, scale)
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if on_tpu and k.shape[1] >= FLASH_MIN_KV and q.shape[-1] % 8 == 0:
        return _flash_diff(q, k, v, scale)
    return xla_attention(q, k, v, scale)


def _self_mha_ref(q, k, v, heads, scale):
    """XLA reference for fused_self_mha: fold heads, dot-product attention,
    unfold. Used on CPU and as the recompute backward of the fused path."""
    b, n, hd = q.shape
    dh = hd // heads
    fold = lambda t: t.reshape(b, n, heads, dh).transpose(0, 2, 1, 3).reshape(
        b * heads, n, dh
    )
    out = xla_attention(fold(q), fold(k), fold(v), scale)
    return out.reshape(b, heads, n, dh).transpose(0, 2, 1, 3).reshape(b, n, hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_self_diff(q, k, v, heads, scale):
    from t2v.kernels.fused_mha import fused_self_mha

    return fused_self_mha(q, k, v, heads=heads, scale=scale)


def _fused_self_fwd(q, k, v, heads, scale):
    return _fused_self_diff(q, k, v, heads, scale), (q, k, v)


def _fused_self_bwd(heads, scale, res, g):
    # backward by recompute through the XLA reference — short sequences, so
    # the (N, N) score matrix is cheap; keeps the Pallas forward VJP-free
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _self_mha_ref(a, b, c, heads, scale), q, k, v)
    return vjp(g)


_fused_self_diff.defvjp(_fused_self_fwd, _fused_self_bwd)


def self_attention_packed(
    q, k, v, heads: int, scale: float | None = None, force: str | None = None
):
    """Self-attention on (B, N, H·D) with heads PACKED in the minor dim —
    the layout the qkv projections naturally produce.

    On TPU, short sequences take the fused block-diagonal Pallas kernel
    (t2v/kernels/fused_mha.py) — no head-fold transposes, no (N, N) scores
    in HBM, no batch-minor layouts leaking into neighbouring matmuls
    (v5e, temporal shape 1024x24x8x64: 2.0 ms vs 2.36 ms folded per site;
    end-to-end 24f/256px DDIM-20 video 3.23 s -> 2.997 s, bench.py,
    re-confirmed in the round-3 bisect; current HEAD numbers live in
    docs/PERF.md, regenerated from bench.py/profile_unet.py only).
    Long sequences fold and ride the flash kernel; CPU uses plain XLA.
    """
    b, n, hd = q.shape
    dh = hd // heads
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if force == "fused_interpret":
        # test-only: run the Pallas kernel in interpret mode on CPU (e.g.
        # inside shard_map on the virtual mesh, tests/test_dp_sample.py)
        from t2v.kernels.fused_mha import fused_self_mha

        return fused_self_mha(q, k, v, heads=heads, scale=scale, interpret=True)
    if force == "fused_spmd":
        # mesh runs (tp/sp GSPMD): the same kernels behind
        # custom_partitioning rules so the partitioner can shard them
        # (batch + head-group parallel); interpret mode off-TPU
        from t2v.kernels.spmd import spmd_flash_attention, spmd_self_attention

        if n < FLASH_MIN_KV and hd % heads == 0:
            return spmd_self_attention(q, k, v, heads, scale)
        if hd % heads == 0 and dh % 8 == 0:
            # the flash kernel needs lane-aligned head dims (same dh % 8
            # guard as the auto dispatch above) — misaligned configs fall
            # through to the natively-shardable XLA path
            fold = lambda t: t.reshape(b, n, heads, dh).transpose(
                0, 2, 1, 3
            ).reshape(b * heads, n, dh)
            out = spmd_flash_attention(fold(q), fold(k), fold(v), scale)
            return out.reshape(b, heads, n, dh).transpose(0, 2, 1, 3).reshape(
                b, n, hd
            )
        unfold = lambda t: t.reshape(b, n, heads, dh)
        return attention_mh(unfold(q), unfold(k), unfold(v), scale, "xla").reshape(
            b, n, hd
        )
    if force is None and on_tpu and n < FLASH_MIN_KV and hd % heads == 0:
        return _fused_self_diff(q, k, v, heads, scale)
    unfold = lambda t: t.reshape(b, n, heads, dh)
    return attention_mh(unfold(q), unfold(k), unfold(v), scale, force).reshape(
        b, n, hd
    )


def _swap_frame_axis(t, f: int):
    """Sample-major (B·F, N, D) → (B·N, F, D) (materialised transpose)."""
    bf, n, d = t.shape
    b = bf // f
    return t.reshape(b, f, n, d).transpose(0, 2, 1, 3).reshape(b * n, f, d)


def _unswap_frame_axis(t, n: int):
    """(B·N, F, D) → sample-major (B·F, N, D) (materialised transpose)."""
    bn, f, d = t.shape
    b = bn // n
    return t.reshape(b, n, f, d).transpose(0, 2, 1, 3).reshape(b * f, n, d)


def _temporal_mha_ref(q, k, v, heads, f, scale):
    """XLA reference for fused_temporal_mha: materialise the frame<->token
    transpose, run folded self-attention across frames, transpose back.
    CPU path and recompute backward."""
    n = q.shape[1]
    return _unswap_frame_axis(
        _self_mha_ref(
            _swap_frame_axis(q, f), _swap_frame_axis(k, f),
            _swap_frame_axis(v, f), heads, scale,
        ),
        n,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_temporal_diff(q, k, v, heads, f, scale):
    from t2v.kernels.fused_mha import fused_temporal_mha

    return fused_temporal_mha(q, k, v, heads=heads, f=f, scale=scale)


def _fused_temporal_fwd(q, k, v, heads, f, scale):
    return _fused_temporal_diff(q, k, v, heads, f, scale), (q, k, v)


def _fused_temporal_bwd(heads, f, scale, res, g):
    # recompute through the XLA reference — frames are short, scores cheap
    q, k, v = res
    _, vjp = jax.vjp(
        lambda a, b, c: _temporal_mha_ref(a, b, c, heads, f, scale), q, k, v
    )
    return vjp(g)


_fused_temporal_diff.defvjp(_fused_temporal_fwd, _fused_temporal_bwd)


def temporal_attention_packed(
    q, k, v, heads: int, f: int,
    scale: float | None = None, force: str | None = None,
):
    """Self-attention ACROSS the frame axis of sample-major (B·F, N, H·D)
    tensors, staying in the spatial token layout. On TPU the Pallas kernel
    does the frame<->token swap inside VMEM blocks; CPU (and very long
    frame counts) fall back to materialised transposes + the standard
    self-attention dispatch."""
    bf, n, hd = q.shape
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if force == "fused_interpret":
        from t2v.kernels.fused_mha import fused_temporal_mha

        return fused_temporal_mha(
            q, k, v, heads=heads, f=f, scale=scale, interpret=True
        )
    if force is None and on_tpu and f < FLASH_MIN_KV and hd % heads == 0:
        from t2v.kernels.fused_mha import temporal_fits

        if temporal_fits(n, f):
            return _fused_temporal_diff(q, k, v, heads, f, scale)
    return _unswap_frame_axis(
        self_attention_packed(
            _swap_frame_axis(q, f), _swap_frame_axis(k, f),
            _swap_frame_axis(v, f), heads, scale, force,
        ),
        n,
    )


def _cross_mha_ref(q, k, v, heads, scale):
    """XLA reference for fused_cross_mha: fold heads, dot-product attention
    over the short context, unfold. CPU path and recompute backward."""
    b, n, hd = q.shape
    s = k.shape[1]
    dh = hd // heads
    foldq = q.reshape(b, n, heads, dh).transpose(0, 2, 1, 3).reshape(b * heads, n, dh)
    foldk = k.reshape(b, s, heads, dh).transpose(0, 2, 1, 3).reshape(b * heads, s, dh)
    foldv = v.reshape(b, s, heads, dh).transpose(0, 2, 1, 3).reshape(b * heads, s, dh)
    out = xla_attention(foldq, foldk, foldv, scale)
    return out.reshape(b, heads, n, dh).transpose(0, 2, 1, 3).reshape(b, n, hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_cross_diff(q, k, v, heads, scale):
    from t2v.kernels.fused_mha import fused_cross_mha

    return fused_cross_mha(q, k, v, heads=heads, scale=scale)


def _fused_cross_fwd(q, k, v, heads, scale):
    return _fused_cross_diff(q, k, v, heads, scale), (q, k, v)


def _fused_cross_bwd(heads, scale, res, g):
    # recompute through the XLA reference: the context is short (77
    # tokens), so the (N, S) score matrix is cheap to rebuild
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _cross_mha_ref(a, b, c, heads, scale), q, k, v)
    return vjp(g)


_fused_cross_diff.defvjp(_fused_cross_fwd, _fused_cross_bwd)


def cross_attention_packed(
    q, k, v, heads: int, scale: float | None = None, force: str | None = None
):
    """Cross-attention on (B, N, H·D) queries over (B, S, H·D) context with
    heads PACKED in the minor dim — no head-fold transposes on TPU.

    Callers with a per-sample shared context merge the frame axis into N
    first ((B·F, n) → (B, F·n), a free reshape) so k/v are projected once
    per sample instead of once per frame. Short contexts take the Pallas
    packed kernel (t2v/kernels/fused_mha.py::fused_cross_mha); long ones
    and CPU fall back to the folded XLA/flash dispatch.
    """
    b, n, hd = q.shape
    s = k.shape[1]
    dh = hd // heads
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if force == "fused_interpret":
        from t2v.kernels.fused_mha import fused_cross_mha

        return fused_cross_mha(q, k, v, heads=heads, scale=scale, interpret=True)
    if force == "fused_spmd" and s < FLASH_MIN_KV and hd % heads == 0:
        from t2v.kernels.spmd import spmd_cross_attention

        return spmd_cross_attention(q, k, v, heads, scale)
    if force is None and on_tpu and s < FLASH_MIN_KV and hd % heads == 0:
        return _fused_cross_diff(q, k, v, heads, scale)
    unfoldq = q.reshape(b, n, heads, dh)
    unfoldk = k.reshape(b, s, heads, dh)
    unfoldv = v.reshape(b, s, heads, dh)
    return attention_mh(unfoldq, unfoldk, unfoldv, scale, force).reshape(b, n, hd)


def attention_mh(q, k, v, scale: float | None = None, force: str | None = None):
    """Multihead attention entry on (B, N, H, D) -> (B, N, H, D).

    Folds heads into the batch axis and dispatches through ``attention``.
    Measured note (v5e, 24f ModelScope step): keeping heads as a second
    dot_general batch dim ("bnhd,bshd->bhns") looks transpose-free at the
    jaxpr level but XLA lowers the two-batch-dim dot to a *convolution*
    (convolution_multiply_fusion) and still materialises layout copies —
    ~3% slower end to end than the explicit fold transposes. Don't retry
    without re-profiling.
    """
    b, n, h, d = q.shape
    s = k.shape[1]
    fold = lambda t, length: t.transpose(0, 2, 1, 3).reshape(b * h, length, d)
    out = attention(fold(q, n), fold(k, s), fold(v, s), scale, force)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)
