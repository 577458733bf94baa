"""Flash-attention kernel parity vs XLA reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from t2v.kernels.attention import xla_attention
from t2v.kernels.flash_attention import flash_attention


@pytest.mark.parametrize(
    "b,n,s,d",
    [
        (2, 64, 64, 64),      # tiny self-attn
        (1, 300, 300, 64),    # ragged N and S (padding + masking paths)
        (2, 128, 77, 64),     # cross-attn KV=77 (text tokens)
        (1, 16, 16, 32),      # temporal few-frame
        (1, 513, 513, 64),    # just over one kv block
    ],
)
def test_flash_matches_xla(rng, b, n, s, d):
    q = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
    ref = xla_attention(q, k, v)
    out = flash_attention(q, k, v, block_q=128, block_kv=128, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_scale_override(rng):
    q = jnp.asarray(rng.normal(size=(1, 64, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 64, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 64, 64)).astype(np.float32))
    ref = xla_attention(q, k, v, scale=0.05)
    out = flash_attention(q, k, v, scale=0.05, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_bf16_io(rng):
    q = jnp.asarray(rng.normal(size=(1, 128, 64))).astype(jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, 128, 64))).astype(jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, 128, 64))).astype(jnp.bfloat16)
    ref = xla_attention(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    out = flash_attention(q, k, v, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=3e-2, atol=3e-2
    )


class TestFlashBackward:
    """Pallas FlashAttention-2 backward vs jax.grad of the XLA reference."""

    @pytest.mark.parametrize(
        "b,n,s,d",
        [
            (2, 64, 64, 64),
            (1, 300, 200, 64),   # ragged: padding on both axes
            (2, 128, 77, 32),    # cross-attn
        ],
    )
    def test_grads_match_xla(self, rng, b, n, s, d):
        import jax

        from t2v.kernels.flash_attention import (
            flash_attention_bwd,
            flash_attention_fwd,
        )

        q = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))

        out, lse = flash_attention_fwd(q, k, v, block_q=128, block_kv=128, interpret=True)
        # lse correctness vs dense logsumexp
        scores = jnp.einsum("bnd,bsd->bns", q, k) * (d**-0.5)
        ref_lse = jax.nn.logsumexp(scores, axis=-1)
        np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse), rtol=1e-5, atol=1e-5)

        dq, dk, dv = flash_attention_bwd(
            q, k, v, out, lse, g, block_q=128, block_kv=128, interpret=True
        )
        _, vjp = jax.vjp(lambda a, b_, c: xla_attention(a, b_, c), q, k, v)
        rq, rk, rv = vjp(g)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), rtol=2e-4, atol=2e-4)

    def test_custom_vjp_dispatch(self, rng):
        """attention(force='flash') must be differentiable end-to-end."""
        import jax

        from t2v.kernels.attention import attention

        q = jnp.asarray(rng.normal(size=(1, 64, 32)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(1, 64, 32)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(1, 64, 32)).astype(np.float32))

        # CPU runs the kernel via interpret inside custom_vjp only on TPU;
        # here exercise the vjp wiring through the XLA-equivalent math
        def loss_flash(q_):
            return jnp.sum(attention(q_, k, v) ** 2)

        def loss_xla(q_):
            return jnp.sum(attention(q_, k, v, force="xla") ** 2)

        gf = jax.grad(loss_flash)(q)
        gx = jax.grad(loss_xla)(q)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), rtol=2e-4, atol=2e-4)


class TestMultiheadEntry:
    """attention_mh (B, N, H, D) must match per-head folding through the
    single-head entries (the transpose-free temporal-attention path)."""

    def test_mh_matches_folded(self, rng):
        from t2v.kernels.attention import attention_mh

        b, n, s, h, d = 3, 24, 24, 4, 16
        q = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
        fold = lambda t: t.transpose(0, 2, 1, 3).reshape(b * h, -1, d)
        ref = xla_attention(fold(q), fold(k), fold(v))
        ref = ref.reshape(b, h, n, d).transpose(0, 2, 1, 3)
        out = attention_mh(q, k, v, force="xla")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_mh_cross_attention_lengths(self, rng):
        from t2v.kernels.attention import attention_mh

        b, n, s, h, d = 2, 8, 77, 2, 8
        q = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
        out = attention_mh(q, k, v)
        assert out.shape == (b, n, h, d)
        assert np.isfinite(np.asarray(out)).all()
