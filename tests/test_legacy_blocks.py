"""Torch-functional parity for the legacy 2D blocks (t2v/models/legacy.py).

The reference classes (t2v_model.py:1049-1183) are dead code in every
shipped config, so these oracles re-derive their math from
torch.nn.functional primitives with shared weights — the same pattern as
tests/test_blocks.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from t2v.core.dtypes import Policy
from t2v.models import legacy as L

P32 = Policy(param_dtype=jnp.float32, compute_dtype=jnp.float32)


def to_t(x):
    return torch.from_numpy(np.asarray(x))


def rnd(rng, *shape):
    return rng.normal(size=shape).astype(np.float32) * 0.1


class TestResample:
    def test_none(self, rng):
        x = rnd(rng, 2, 8, 8, 3)
        np.testing.assert_array_equal(L.resample(jnp.asarray(x), "none"), x)

    def test_downsample_matches_adaptive_avg_pool(self, rng):
        x = rnd(rng, 2, 8, 6, 3)
        ours = L.resample(jnp.asarray(x), "downsample")
        theirs = (
            F.adaptive_avg_pool2d(to_t(x).permute(0, 3, 1, 2), (4, 3))
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-6)

    def test_upsample_matches_nearest_interpolate(self, rng):
        x = rnd(rng, 2, 4, 5, 3)
        ours = L.resample(jnp.asarray(x), "upsample", reference_hw=(8, 10))
        theirs = (
            F.interpolate(to_t(x).permute(0, 3, 1, 2), size=(8, 10),
                          mode="nearest")
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-6)


def _gn(x_t, w, b):
    return F.group_norm(x_t, 32, to_t(w), to_t(b), eps=1e-5)


class TestLegacyResidualBlock:
    def _run(self, rng, mode, use_ssn, in_dim=64, out_dim=96):
        emb_dim = 32
        blk = L.LegacyResidualBlock(
            in_dim=in_dim, embed_dim=emb_dim, out_dim=out_dim,
            use_scale_shift_norm=use_ssn, mode=mode, policy=P32,
        )
        x = rnd(rng, 2, 8, 8, in_dim)
        e = rnd(rng, 2, emb_dim)
        ref_hw = (16, 16) if mode == "upsample" else None
        params = blk.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(e),
                          ref_hw)
        # give the zero-init conv2 signal so a conversion bug there shows
        p = jax.tree_util.tree_map(lambda a: a, params)["params"]
        p["conv2"]["kernel"] = jnp.asarray(
            rnd(rng, 3, 3, out_dim, out_dim)
        )
        params = {"params": p}
        ours = np.asarray(blk.apply(params, jnp.asarray(x), jnp.asarray(e),
                                    ref_hw))

        # torch-functional oracle with the converted weights
        def t_conv(name, xt, pad=1):
            w = np.transpose(np.asarray(p[name]["kernel"]), (3, 2, 0, 1))
            return F.conv2d(xt, to_t(w), to_t(np.asarray(p[name]["bias"])),
                            padding=pad)

        def t_resample(xt):
            if mode == "downsample":
                return F.adaptive_avg_pool2d(
                    xt, tuple(u // 2 for u in xt.shape[-2:]))
            if mode == "upsample":
                return F.interpolate(xt, size=ref_hw, mode="nearest")
            return xt

        xt = to_t(x).permute(0, 3, 1, 2)
        identity = t_resample(xt)
        h = F.silu(_gn(xt, np.asarray(p["norm1"]["GroupNorm_0"]["scale"]),
                       np.asarray(p["norm1"]["GroupNorm_0"]["bias"])))
        h = t_conv("conv1", t_resample(h))
        et = F.linear(
            F.silu(to_t(e)),
            to_t(np.asarray(p["embedding"]["kernel"]).T),
            to_t(np.asarray(p["embedding"]["bias"])),
        )[:, :, None, None]
        gn2 = lambda t: _gn(t, np.asarray(p["norm2"]["GroupNorm_0"]["scale"]),
                            np.asarray(p["norm2"]["GroupNorm_0"]["bias"]))
        if use_ssn:
            scale, shift = et.chunk(2, dim=1)
            h = gn2(h) * (1 + scale) + shift
            h = t_conv("conv2", F.silu(h))
        else:
            h = h + et
            h = t_conv("conv2", F.silu(gn2(h)))
        if in_dim != out_dim:
            w = np.transpose(np.asarray(p["shortcut"]["kernel"]), (3, 2, 0, 1))
            identity = F.conv2d(identity, to_t(w),
                                to_t(np.asarray(p["shortcut"]["bias"])))
        theirs = (h + identity).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-5)

    def test_scale_shift_none(self, rng):
        self._run(rng, "none", True)

    def test_additive_embedding_downsample(self, rng):
        self._run(rng, "downsample", False)

    def test_upsample_same_dims(self, rng):
        self._run(rng, "upsample", True, in_dim=64, out_dim=64)


class TestLegacyAttentionBlock:
    def _oracle(self, x, ctx, p, n, d):
        dim = n * d
        xt = to_t(x).permute(0, 3, 1, 2)
        b, c, h, w = xt.shape
        xn = _gn(xt, np.asarray(p["norm"]["GroupNorm_0"]["scale"]),
                 np.asarray(p["norm"]["GroupNorm_0"]["bias"]))
        wq = to_t(np.asarray(p["to_qkv"]["kernel"]).T)[:, :, None, None]
        qkv = F.conv2d(xn, wq, to_t(np.asarray(p["to_qkv"]["bias"])))
        q, k, v = qkv.view(b, n * 3, d, h * w).chunk(3, dim=1)
        if ctx is not None:
            ckv = F.linear(to_t(ctx),
                           to_t(np.asarray(p["context_kv"]["kernel"]).T),
                           to_t(np.asarray(p["context_kv"]["bias"])))
            ck, cv = (ckv.reshape(b, -1, n * 2, d).permute(0, 2, 3, 1)
                      .chunk(2, dim=1))
            k = torch.cat([ck, k], dim=-1)
            v = torch.cat([cv, v], dim=-1)
        scale = float(d) ** -0.25
        attn = torch.matmul(q.transpose(-1, -2) * scale, k * scale)
        attn = F.softmax(attn, dim=-1)
        out = torch.matmul(v, attn.transpose(-1, -2)).reshape(b, c, h, w)
        wp = to_t(np.asarray(p["proj"]["kernel"]).T)[:, :, None, None]
        out = F.conv2d(out, wp, to_t(np.asarray(p["proj"]["bias"])))
        return (out + xt).permute(0, 2, 3, 1).numpy()

    def _run(self, rng, with_context):
        n, d = 4, 16
        dim = n * d
        blk = L.LegacyAttentionBlock(
            dim=dim, context_dim=24 if with_context else None,
            num_heads=n, policy=P32,
        )
        x = rnd(rng, 2, 6, 6, dim)
        ctx = rnd(rng, 2, 5, 24) if with_context else None
        args = (jnp.asarray(x),) + (
            (jnp.asarray(ctx),) if with_context else ()
        )
        params = blk.init(jax.random.key(0), *args)
        p = params["params"]
        # perturb the zero-init proj so the residual path carries signal
        p["proj"]["kernel"] = jnp.asarray(rnd(rng, dim, dim))
        ours = np.asarray(blk.apply({"params": p}, *args))
        theirs = self._oracle(x, ctx, p, n, d)
        np.testing.assert_allclose(ours, theirs, atol=2e-5)

    def test_self_attention(self, rng):
        self._run(rng, with_context=False)

    def test_context_rows_prepended(self, rng):
        self._run(rng, with_context=True)

    def test_head_dim_selection_matches_reference(self):
        blk = L.LegacyAttentionBlock(dim=64, head_dim=16, num_heads=2)
        # head_dim wins over num_heads (t2v_model.py:1119-1121)
        x = jnp.zeros((1, 4, 4, 64))
        params = blk.init(jax.random.key(0), x)
        assert blk.apply(params, x).shape == (1, 4, 4, 64)
