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
