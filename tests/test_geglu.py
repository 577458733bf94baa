"""Parity tests for the fused GEGLU kernel (t2v/kernels/geglu.py).

The Pallas pass (run under interpret=True on the CPU mesh) must match the
XLA expression ``h * gelu(gate, approximate=False)`` — the reference's
GEGLU combine (t2v_model.py:813-846) — including the in-kernel polynomial
erf, bf16 IO, and the custom-VJP backward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2v.kernels.geglu import (
    _erf32_poly,
    _geglu_bwd,
    _geglu_ref,
    geglu,
    geglu_pallas,
)


def _rand(shape, key, dtype=jnp.float32, scale=2.0):
    return (jax.random.normal(jax.random.key(key), shape) * scale).astype(dtype)


def test_poly_erf_matches_lax_erf():
    x = jnp.linspace(-6.0, 6.0, 4001, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(_erf32_poly(x)), np.asarray(jax.lax.erf(x)), atol=1e-6
    )


@pytest.mark.parametrize("shape", [(2, 64, 512), (48, 16, 256), (1, 8, 2560)])
def test_pallas_matches_xla_f32(shape):
    x = _rand(shape, 0, scale=3.0)
    want = _geglu_ref(x)
    got = geglu_pallas(x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_bf16_io_keeps_dtype_and_value():
    x = _rand((4, 32, 1024), 1, dtype=jnp.bfloat16)
    got = geglu_pallas(x, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = _geglu_ref(x.astype(jnp.float32))
    # output rounding to bf16 dominates the error budget
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=0.06, rtol=0.03
    )


def test_uneven_row_blocks():
    # rows = 3*37 is indivisible by any nice block: takes the padded path
    x = _rand((3, 37, 256), 2)
    np.testing.assert_allclose(
        np.asarray(geglu_pallas(x, interpret=True)),
        np.asarray(_geglu_ref(x)),
        atol=2e-5,
    )


def test_prime_rows_pad_path():
    # 211 rows is prime: the exact-divisor search would degrade to rb=1
    # (one grid step per row); the pad path must keep a full-size block
    # and still match
    x = _rand((211, 1, 256), 5)
    np.testing.assert_allclose(
        np.asarray(geglu_pallas(x, interpret=True)),
        np.asarray(_geglu_ref(x)),
        atol=2e-5,
    )


def test_f32_vmem_cap_scales_with_itemsize():
    # with f32 inputs the per-row footprint is 40*inner B; the chosen row
    # block must respect the budget (regression for the ADVICE finding)
    from t2v.kernels.geglu import _VMEM_BUDGET, _largest_divisor

    inner = 5120
    rows = 4096
    cap32 = _VMEM_BUDGET // ((6 * 4 + 16) * inner)
    rb = _largest_divisor(rows, cap32)
    assert rb * (6 * 4 + 16) * inner <= _VMEM_BUDGET


def test_backward_matches_autodiff():
    x = _rand((2, 16, 384), 3)
    want = jax.grad(lambda p: (_geglu_ref(p) ** 2).sum())(x)
    (got,) = _geglu_bwd(x, 2.0 * _geglu_ref(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_dispatch_falls_back_on_cpu():
    # on the CPU test mesh the auto path must take the XLA expression
    x = _rand((2, 8, 256), 4)
    np.testing.assert_allclose(
        np.asarray(geglu(x)), np.asarray(_geglu_ref(x)), atol=1e-6
    )
