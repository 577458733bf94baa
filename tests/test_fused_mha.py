"""Fused short-sequence self-attention kernel (t2v/kernels/fused_mha.py).

The kernel computes block-diagonal-masked dense attention over packed
heads; parity target is the folded XLA dot-product attention the model
used before (t2v/kernels/attention.py::_self_mha_ref).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2v.kernels.attention import _self_mha_ref, self_attention_packed
from t2v.kernels.fused_mha import _block_seqs, fused_self_mha


@pytest.mark.parametrize(
    "b,n,heads,dh",
    [
        (6, 24, 8, 64),   # temporal, frames=24
        (5, 16, 10, 64),  # temporal, frames=16 (b does not divide bt target)
        (3, 77, 8, 32),   # cross-attention-shaped (padding path)
        (2, 125, 4, 16),  # frames=125: seq % 8 != 0 (Mosaic pad path)
        (4, 256, 5, 64),  # low-res spatial self
        (1, 8, 2, 16),    # minimal
    ],
)
def test_fused_matches_xla_reference(b, n, heads, dh):
    hd = heads * dh
    key = jax.random.key(0)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (b, n, hd), jnp.float32)
        for i in range(3)
    )
    out = fused_self_mha(q, k, v, heads=heads, interpret=True)
    ref = _self_mha_ref(q, k, v, heads, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_explicit_scale():
    b, n, heads, dh = 2, 12, 4, 32
    hd = heads * dh
    key = jax.random.key(1)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (b, n, hd), jnp.float32)
        for i in range(3)
    )
    out = fused_self_mha(q, k, v, heads=heads, scale=0.05, interpret=True)
    ref = _self_mha_ref(q, k, v, heads, 0.05)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_block_seqs_prefers_divisors():
    # 2048 sequences of 24: cap is 21, largest divisor 16 — no padding
    assert _block_seqs(2048, 24) == 16
    assert 2048 % _block_seqs(2048, 24) == 0
    # prime batch: falls back to the cap (wrapper pads)
    assert _block_seqs(97, 24) in (21, 1) or 97 % _block_seqs(97, 24) == 0
    # long sequences: one sequence per step
    assert _block_seqs(8, 500) == 1


def test_packed_dispatch_cpu_matches_reference():
    # on CPU self_attention_packed takes the folded path; this pins the
    # wrapper's reshape bookkeeping
    b, n, heads, dh = 4, 24, 8, 16
    hd = heads * dh
    key = jax.random.key(2)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (b, n, hd), jnp.float32)
        for i in range(3)
    )
    out = self_attention_packed(q, k, v, heads=heads)
    ref = _self_mha_ref(q, k, v, heads, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize(
    "b,n,s,heads,dh",
    [
        (2, 24 * 16, 77, 8, 64),   # merged frame axis over text context
        (2, 100, 77, 5, 64),       # n not divisible by the row-block target
        (3, 64, 13, 4, 32),        # odd short context
        (1, 4096, 77, 8, 64),      # one large row block
    ],
)
def test_fused_cross_matches_xla_reference(b, n, s, heads, dh):
    from t2v.kernels.attention import _cross_mha_ref
    from t2v.kernels.fused_mha import fused_cross_mha

    hd = heads * dh
    key = jax.random.key(4)
    q = jax.random.normal(jax.random.fold_in(key, 0), (b, n, hd), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, s, hd), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, s, hd), jnp.float32)
    out = fused_cross_mha(q, k, v, heads=heads, interpret=True)
    ref = _cross_mha_ref(q, k, v, heads, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_cross_shared_context_merge_equals_per_frame():
    # the model-side restructuring: projecting k/v once per sample and
    # merging the frame axis into the query rows must equal per-frame
    # cross attention over a repeated context
    from t2v.kernels.attention import cross_attention_packed

    cb, f, n, s, heads, dh = 2, 3, 16, 7, 4, 16
    hd = heads * dh
    key = jax.random.key(5)
    q = jax.random.normal(jax.random.fold_in(key, 0), (cb * f, n, hd), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (cb, s, hd), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (cb, s, hd), jnp.float32)
    merged = cross_attention_packed(
        q.reshape(cb, f * n, hd), k, v, heads
    ).reshape(cb * f, n, hd)
    per_frame = cross_attention_packed(
        q, jnp.repeat(k, f, axis=0), jnp.repeat(v, f, axis=0), heads
    )
    np.testing.assert_allclose(
        np.asarray(merged), np.asarray(per_frame), atol=1e-5
    )


@pytest.mark.parametrize(
    "b,f,n,heads,dh",
    [
        (2, 24, 64, 8, 64),   # frames=24, 8x8 tokens
        (2, 16, 36, 4, 32),   # frames=16, non-pow2 tokens
        (1, 5, 128, 2, 16),   # odd frame count
        (1, 125, 16, 2, 16),  # frames=125: f % 8 != 0 (Mosaic pad path)
        (3, 8, 7, 2, 16),     # prime token count (nb=7 or 1)
    ],
)
def test_fused_temporal_matches_transposed_reference(b, f, n, heads, dh):
    from t2v.kernels.attention import _temporal_mha_ref
    from t2v.kernels.fused_mha import fused_temporal_mha

    hd = heads * dh
    key = jax.random.key(7)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (b * f, n, hd), jnp.float32)
        for i in range(3)
    )
    out = fused_temporal_mha(q, k, v, heads=heads, f=f, interpret=True)
    ref = _temporal_mha_ref(q, k, v, heads, f, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_temporal_packed_dispatch_cpu_matches_reference():
    from t2v.kernels.attention import (
        _temporal_mha_ref,
        temporal_attention_packed,
    )

    b, f, n, heads, dh = 2, 6, 16, 4, 16
    hd = heads * dh
    key = jax.random.key(8)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (b * f, n, hd), jnp.float32)
        for i in range(3)
    )
    out = temporal_attention_packed(q, k, v, heads=heads, f=f)
    ref = _temporal_mha_ref(q, k, v, heads, f, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_temporal_grad_matches_reference_grad():
    from t2v.kernels.attention import _fused_temporal_bwd, _temporal_mha_ref

    b, f, n, heads, dh = 2, 4, 6, 2, 16
    hd = heads * dh
    key = jax.random.key(9)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (b * f, n, hd), jnp.float32)
        for i in range(3)
    )
    g = jax.random.normal(jax.random.fold_in(key, 9), (b * f, n, hd), jnp.float32)
    ref_fn = lambda a, bb, c: _temporal_mha_ref(a, bb, c, heads, f, None)
    _, ref_vjp = jax.vjp(ref_fn, q, k, v)
    want = ref_vjp(g)
    got = _fused_temporal_bwd(heads, f, None, (q, k, v), g)
    for w, gt in zip(want, got):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(w), atol=1e-5)


def test_fused_cross_grad_matches_reference_grad():
    from t2v.kernels.attention import _cross_mha_ref, _fused_cross_bwd

    b, n, s, heads, dh = 2, 12, 7, 2, 16
    hd = heads * dh
    key = jax.random.key(6)
    q = jax.random.normal(jax.random.fold_in(key, 0), (b, n, hd), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, s, hd), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, s, hd), jnp.float32)
    g = jax.random.normal(jax.random.fold_in(key, 9), (b, n, hd), jnp.float32)
    ref_fn = lambda a, bb, c: _cross_mha_ref(a, bb, c, heads, None)
    _, ref_vjp = jax.vjp(ref_fn, q, k, v)
    want = ref_vjp(g)
    got = _fused_cross_bwd(heads, None, (q, k, v), g)
    for w, gt in zip(want, got):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(w), atol=1e-5)


def test_fused_grad_matches_reference_grad():
    # the custom VJP recomputes through the XLA reference; check both the
    # interpret-mode forward and its backward agree with plain autodiff
    from t2v.kernels.attention import _fused_self_bwd

    b, n, heads, dh = 3, 10, 2, 16
    hd = heads * dh
    key = jax.random.key(3)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (b, n, hd), jnp.float32)
        for i in range(3)
    )
    g = jax.random.normal(jax.random.fold_in(key, 9), (b, n, hd), jnp.float32)

    ref_fn = lambda a, bb, c: _self_mha_ref(a, bb, c, heads, None)
    _, ref_vjp = jax.vjp(ref_fn, q, k, v)
    want = ref_vjp(g)
    got = _fused_self_bwd(heads, None, (q, k, v), g)
    for w, gt in zip(want, got):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(w), atol=1e-5)
