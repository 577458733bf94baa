"""Golden parity: flax blocks vs torch-functional re-derivations.

Each test builds the torch-side forward from torch.nn.functional primitives
with the SAME weights (converted via t2v.io.convert helpers), checking the
numerics rules the UNet conversion depends on: transpose conventions,
GroupNorm/LayerNorm eps, exact-erf GELU, conv padding, NHWC<->NCHW layout
maps, and the temporal (3,1,1) conv. SURVEY.md §4 "Golden/parity".
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from t2v.core.dtypes import Policy
from t2v.io import convert as C
from t2v.models import blocks as B

P = Policy()


def to_t(x):
    return torch.from_numpy(np.asarray(x))


def rnd(rng, *shape):
    return rng.normal(size=shape).astype(np.float32) * 0.1


class TestPrimitives:
    def test_linear_convention(self, rng):
        w, b = rnd(rng, 8, 16), rnd(rng, 8)
        sd = {"l.weight": w, "l.bias": b}
        p = C._linear(sd, "l")
        x = rnd(rng, 3, 16)
        ours = x @ p["kernel"] + p["bias"]
        theirs = F.linear(to_t(x), to_t(w), to_t(b)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_conv2d_convention(self, rng):
        w, b = rnd(rng, 6, 4, 3, 3), rnd(rng, 6)
        sd = {"c.weight": w, "c.bias": b}
        p = C._conv2d(sd, "c")
        x = rnd(rng, 2, 5, 5, 4)  # NHWC
        ours = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(p["kernel"]), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["bias"]
        theirs = (
            F.conv2d(to_t(x).permute(0, 3, 1, 2), to_t(w), to_t(b), padding=1)
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)

    def test_conv3d_temporal_convention(self, rng):
        # the (3,1,1) temporal conv: torch input (b c f h w), ours (b f h w c)
        w, b = rnd(rng, 4, 4, 3, 1, 1), rnd(rng, 4)
        sd = {"c.weight": w, "c.bias": b}
        p = C._conv3d(sd, "c")
        x = rnd(rng, 2, 6, 3, 3, 4)  # (B, F, H, W, C)
        ours = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(p["kernel"]), (1, 1, 1),
            ((1, 1), (0, 0), (0, 0)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ) + p["bias"]
        theirs = (
            F.conv3d(to_t(x).permute(0, 4, 1, 2, 3), to_t(w), to_t(b), padding=(1, 0, 0))
            .permute(0, 2, 3, 4, 1)
            .numpy()
        )
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)

    def test_groupnorm32_eps(self, rng):
        x = rnd(rng, 2, 4, 4, 64)
        w, b = rnd(rng, 64), rnd(rng, 64)
        sd = {"n.weight": w, "n.bias": b}
        gn = B.GroupNorm32(eps=1e-5)
        params = {"params": C._gn32(sd, "n")}
        ours = gn.apply(params, jnp.asarray(x))
        theirs = (
            F.group_norm(to_t(x).permute(0, 3, 1, 2), 32, to_t(w), to_t(b), eps=1e-5)
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)

    def test_groupnorm_5d_cross_frame_stats(self, rng):
        # torch GN on (b c f h w) reduces over (c_g, f, h, w); ours on
        # (b f h w c) must match — the TemporalTransformer/TemporalConv case
        x = rnd(rng, 2, 3, 4, 4, 64)  # (B, F, H, W, C)
        w, b = rnd(rng, 64), rnd(rng, 64)
        sd = {"n.weight": w, "n.bias": b}
        ours = B.GroupNorm32(eps=1e-6).apply({"params": C._gn32(sd, "n")}, jnp.asarray(x))
        theirs = (
            F.group_norm(to_t(x).permute(0, 4, 1, 2, 3), 32, to_t(w), to_t(b), eps=1e-6)
            .permute(0, 2, 3, 4, 1)
            .numpy()
        )
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)

    def test_groupnorm32_pair_matches_concat(self, rng):
        # the decoder's virtual skip-concat: GN over the (a, b) pair must
        # equal GN over cat([a, b], -1), incl. groups straddling the
        # boundary (64+32 channels -> group size 3: boundary mid-group)
        a = rnd(rng, 2, 4, 4, 64)
        b = rnd(rng, 2, 4, 4, 32)
        w, bb = rnd(rng, 96), rnd(rng, 96)
        sd = {"n.weight": w, "n.bias": bb}
        params = {"params": C._gn32(sd, "n")}
        gn = B.GroupNorm32(eps=1e-5)
        ref = gn.apply(params, jnp.concatenate([jnp.asarray(a), jnp.asarray(b)], -1))
        na, nb = gn.apply(params, (jnp.asarray(a), jnp.asarray(b)))
        got = jnp.concatenate([na, nb], axis=-1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_splitconv_matches_concat_conv(self, rng):
        a = rnd(rng, 2, 5, 5, 12)
        b = rnd(rng, 2, 5, 5, 20)
        kernel, bias = rnd(rng, 3, 3, 32, 8), rnd(rng, 8)
        params = {"params": {"kernel": kernel, "bias": bias}}
        got = B.SplitConv(features=8, kernel_size=(3, 3)).apply(
            params, jnp.asarray(a), jnp.asarray(b)
        )
        ref = jax.lax.conv_general_dilated(
            jnp.concatenate([jnp.asarray(a), jnp.asarray(b)], -1),
            jnp.asarray(kernel), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_splitconv_3d_matches_concat_conv(self, rng):
        a = rnd(rng, 1, 3, 4, 4, 8)  # (B, T, H, W, C)
        b = rnd(rng, 1, 3, 4, 4, 8)
        kernel, bias = rnd(rng, 3, 3, 3, 16, 6), rnd(rng, 6)
        params = {"params": {"kernel": kernel, "bias": bias}}
        got = B.SplitConv(
            features=6, kernel_size=(3, 3, 3),
            padding=((1, 1), (1, 1), (1, 1)),
        ).apply(params, jnp.asarray(a), jnp.asarray(b))
        ref = jax.lax.conv_general_dilated(
            jnp.concatenate([jnp.asarray(a), jnp.asarray(b)], -1),
            jnp.asarray(kernel), (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ) + bias
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_exact_gelu(self):
        x = np.linspace(-3, 3, 101, dtype=np.float32)
        ours = np.asarray(jax.nn.gelu(jnp.asarray(x), approximate=False))
        theirs = F.gelu(to_t(x)).numpy()  # torch default = exact erf
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_sinusoidal_embedding_matches_torch_formula(self):
        t = np.array([0.0, 1.0, 500.0, 999.0], dtype=np.float32)
        dim = 32
        ours = np.asarray(B.sinusoidal_embedding(jnp.asarray(t), dim))
        tt = to_t(t)
        sinusoid = torch.outer(tt, torch.pow(10000, -torch.arange(dim // 2).to(tt).div(dim // 2)))
        theirs = torch.cat([torch.cos(sinusoid), torch.sin(sinusoid)], dim=1).numpy()
        # torch computes the freq table with fp32 pow; we use float64 —
        # the residual is fp32 pow phase noise amplified by t≈1000
        np.testing.assert_allclose(ours, theirs, atol=2e-3)

    def test_repeat_interleave_ordering(self):
        e = jnp.asarray(np.arange(6).reshape(2, 3).astype(np.float32))
        ours = np.asarray(jnp.repeat(e, 4, axis=0))
        theirs = to_t(np.asarray(e)).repeat_interleave(4, dim=0).numpy()
        np.testing.assert_allclose(ours, theirs)

    def test_nearest_upsample_matches_torch(self, rng):
        x = rnd(rng, 1, 4, 5, 3)
        ours = np.asarray(
            jax.image.resize(jnp.asarray(x), (1, 8, 10, 3), method="nearest")
        )
        theirs = (
            F.interpolate(to_t(x).permute(0, 3, 1, 2), scale_factor=2, mode="nearest")
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs)


def torch_cross_attention(x, ctx, sd, heads, dim_head):
    """Reference CrossAttention forward (t2v_model.py:518-584), einsum path."""
    q = F.linear(x, to_t(sd["a.to_q.weight"]))
    k = F.linear(ctx, to_t(sd["a.to_k.weight"]))
    v = F.linear(ctx, to_t(sd["a.to_v.weight"]))
    b, n, _ = q.shape
    s = k.shape[1]
    fold = lambda t, l: t.reshape(b, l, heads, dim_head).permute(0, 2, 1, 3).reshape(b * heads, l, dim_head)
    q, k, v = fold(q, n), fold(k, s), fold(v, s)
    sim = torch.einsum("bid,bjd->bij", q, k) * dim_head**-0.5
    attn = sim.softmax(dim=-1)
    out = torch.einsum("bij,bjd->bid", attn, v)
    out = out.reshape(b, heads, n, dim_head).permute(0, 2, 1, 3).reshape(b, n, heads * dim_head)
    return F.linear(out, to_t(sd["a.to_out.0.weight"]), to_t(sd["a.to_out.0.bias"]))


class TestCrossAttentionParity:
    @pytest.mark.parametrize("cross", [False, True])
    def test_parity(self, rng, cross):
        heads, dim_head, qd = 2, 16, 32
        cd = 24 if cross else qd
        sd = {
            "a.to_q.weight": rnd(rng, heads * dim_head, qd),
            "a.to_k.weight": rnd(rng, heads * dim_head, cd),
            "a.to_v.weight": rnd(rng, heads * dim_head, cd),
            "a.to_out.0.weight": rnd(rng, qd, heads * dim_head),
            "a.to_out.0.bias": rnd(rng, qd),
        }
        params = {
            "params": {
                "to_q": C._linear(sd, "a.to_q", bias=False),
                "to_k": C._linear(sd, "a.to_k", bias=False),
                "to_v": C._linear(sd, "a.to_v", bias=False),
                "to_out": C._linear(sd, "a.to_out.0"),
            }
        }
        x = rnd(rng, 2, 9, qd)
        ctx = rnd(rng, 2, 7, cd) if cross else None
        mod = B.CrossAttention(
            query_dim=qd, context_dim=cd if cross else None, heads=heads, dim_head=dim_head
        )
        ours = mod.apply(params, jnp.asarray(x), context=jnp.asarray(ctx) if cross else None)
        theirs = torch_cross_attention(
            to_t(x), to_t(ctx if cross else x), sd, heads, dim_head
        ).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-5)
