"""Parity tests for the unified GroupNorm (t2v/kernels/group_norm.py).

It must match flax ``nn.GroupNorm`` in f32 to float tolerance on every
path: single tensor, virtual pair (including groups straddling the concat
boundary), fused SiLU, bf16 IO with f32 stats, and gradients.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2v.kernels.group_norm import group_norm


def _flax_gn(x, scale, bias, groups=32, eps=1e-5):
    mod = nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=jnp.float32)
    return mod.apply(
        {"params": {"scale": scale, "bias": bias}}, x.astype(jnp.float32)
    )


def _rand(shape, key, dtype=jnp.float32):
    return (jax.random.normal(jax.random.key(key), shape) * 2 + 0.5).astype(dtype)


@pytest.mark.parametrize("shape,groups", [
    ((3, 8, 8, 64), 32),
    ((2, 4, 6, 6, 96), 32),   # 5D
    ((2, 7, 5, 40), 8),       # odd spatial dims
    ((2, 37, 64), 16),        # prime token count
])
def test_matches_flax_groupnorm(shape, groups):
    x = _rand(shape, 0)
    scale = _rand((shape[-1],), 1)
    bias = _rand((shape[-1],), 2)
    want = _flax_gn(x, scale, bias, groups)
    got = group_norm(x, scale, bias, num_groups=groups)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_virtual_pair_matches_concat():
    a = _rand((2, 6, 6, 48), 6)
    b = _rand((2, 6, 6, 80), 7)  # 48+80=128; groups straddle at 48
    scale = _rand((128,), 8)
    bias = _rand((128,), 9)
    want = _flax_gn(jnp.concatenate([a, b], -1), scale, bias, 32)
    na, nb = group_norm(a, scale, bias, b_part=b, num_groups=32)
    got = jnp.concatenate([na, nb], -1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_silu():
    x = _rand((2, 8, 8, 64), 10)
    scale = _rand((64,), 11)
    bias = _rand((64,), 12)
    want = jax.nn.silu(_flax_gn(x, scale, bias, 32))
    got = group_norm(x, scale, bias, silu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_bf16_io_f32_stats():
    x = _rand((2, 8, 8, 64), 13, jnp.bfloat16)
    scale = _rand((64,), 14, jnp.bfloat16)
    bias = _rand((64,), 15, jnp.bfloat16)
    got = group_norm(x, scale, bias)
    assert got.dtype == jnp.bfloat16
    want = _flax_gn(
        x.astype(jnp.float32), scale.astype(jnp.float32),
        bias.astype(jnp.float32), 32,
    ).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=0.04
    )


def test_gradient_matches_flax():
    x = _rand((2, 6, 6, 64), 16)
    scale = _rand((64,), 17)
    bias = _rand((64,), 18)

    def loss_kernel(x, s, b):
        return jnp.sum(group_norm(x, s, b) ** 2)

    def loss_ref(x, s, b):
        return jnp.sum(_flax_gn(x, s, b, 32) ** 2)

    g_k = jax.grad(loss_kernel, argnums=(0, 1, 2))(x, scale, bias)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-4)


def test_pair_gradient_matches_concat():
    a = _rand((2, 4, 4, 32), 20)
    b = _rand((2, 4, 4, 32), 21)
    scale = _rand((64,), 22)
    bias = _rand((64,), 23)

    def loss_pair(a, b, s, bi):
        na, nb = group_norm(a, s, bi, b_part=b, num_groups=16)
        return jnp.sum(na ** 2) + jnp.sum(nb ** 3)

    def loss_cat(a, b, s, bi):
        out = _flax_gn(jnp.concatenate([a, b], -1), s, bi, 16)
        na, nb = out[..., :32], out[..., 32:]
        return jnp.sum(na ** 2) + jnp.sum(nb ** 3)

    g_k = jax.grad(loss_pair, argnums=(0, 1, 2, 3))(a, b, scale, bias)
    g_r = jax.grad(loss_cat, argnums=(0, 1, 2, 3))(a, b, scale, bias)
    for x, y in zip(g_k, g_r):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=2e-5, atol=3e-4
        )


def test_groupnorm32_module_matches_and_fuses_silu():
    """GroupNorm32 keeps nn.GroupNorm param names and matches it exactly."""
    from t2v.models.blocks import GroupNorm32

    x = _rand((2, 8, 8, 64), 19)
    mod = GroupNorm32()
    params = mod.init(jax.random.key(0), x)
    leaves = params["params"]["GroupNorm_0"]
    assert set(leaves) == {"scale", "bias"}
    assert leaves["scale"].shape == (64,)
    got = mod.apply(params, x)
    want = _flax_gn(x, leaves["scale"], leaves["bias"], 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    got_s = GroupNorm32(fuse_silu=True).apply(params, x)
    np.testing.assert_allclose(
        np.asarray(got_s), np.asarray(jax.nn.silu(want)), atol=2e-5
    )
