"""DeepCache: UNet split correctness and the accelerated sampling loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2v.core.config import ModelScopeUNetConfig, T2VArgs
from t2v.diffusion.deepcache import sample_loop_deepcache
from t2v.diffusion.sampling import sample_loop
from t2v.diffusion.schedules import DiffusionSchedule
from t2v.models.modelscope_unet import UNetSD


@pytest.fixture(scope="module")
def unet():
    cfg = ModelScopeUNetConfig().tiny()
    model = UNetSD(cfg=cfg)
    x = jnp.ones((1, 2, 8, 8, cfg.in_dim)) * 0.1
    t = jnp.ones((1,)) * 5.0
    ctx = jnp.ones((1, 7, cfg.context_dim)) * 0.2
    params = jax.jit(model.init)(jax.random.key(0), x, t, ctx)
    # un-zero the zero-init gates so the deep trunk contributes
    params = jax.tree.map(
        lambda a: a + 0.01 if a.size and not np.asarray(a).any() else a, params
    )
    return cfg, model, params, (x, t, ctx)


class TestUNetSplit:
    def test_full_with_return_deep_matches_plain(self, unet):
        cfg, model, params, (x, t, ctx) = unet
        plain = model.apply(params, x, t, ctx)
        out, feat = model.apply(params, x, t, ctx, return_deep=True)
        np.testing.assert_allclose(np.asarray(plain), np.asarray(out), atol=1e-6)
        assert feat is not None and feat.ndim == 4

    def test_cached_with_fresh_feature_is_exact(self, unet):
        """Feeding the just-computed deep feature back at the SAME (x, t)
        must reproduce the full forward exactly — the split is lossless."""
        cfg, model, params, (x, t, ctx) = unet
        out, feat = model.apply(params, x, t, ctx, return_deep=True)
        out2 = model.apply(params, x, t, ctx, deep_feature=feat)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)

    def test_stale_feature_differs(self, unet):
        cfg, model, params, (x, t, ctx) = unet
        _, feat = model.apply(params, x, t, ctx, return_deep=True)
        out_fresh = model.apply(params, x * 0.5, t, ctx)
        out_stale = model.apply(params, x * 0.5, t, ctx, deep_feature=feat)
        assert not np.allclose(np.asarray(out_fresh), np.asarray(out_stale))


class TestDeepCacheLoop:
    def _setup(self, unet):
        cfg, model, params, (x, t, ctx) = unet

        def apply_fn(x_, t_, c_):
            return model.apply(params, x_, t_, c_)

        def apply_full(x_, t_, c_):
            return model.apply(params, x_, t_, c_, return_deep=True)

        def apply_cached(x_, t_, c_, f_):
            return model.apply(params, x_, t_, c_, deep_feature=f_)

        sched = DiffusionSchedule.linear_sd(100)
        cond = jnp.ones((1, 7, cfg.context_dim)) * 0.2
        uncond = jnp.zeros((1, 7, cfg.context_dim))
        return cfg, apply_fn, apply_full, apply_cached, sched, cond, uncond

    def test_interval_1_matches_exact_loop(self, unet):
        cfg, apply_fn, full, cached, sched, cond, uncond = self._setup(unet)
        from t2v.core import rng as rng_lib

        key = rng_lib.key_for_seed(7)
        shape = (1, 2, 8, 8, cfg.in_dim)
        ref = sample_loop(
            apply_fn, sched, steps=6, shape=shape, cond=cond, uncond=uncond,
            guidance_scale=5.0, sampler_name="DDIM_Gaussian", key=key,
        )
        out = sample_loop_deepcache(
            full, cached, sched, steps=6, shape=shape, cond=cond,
            uncond=uncond, guidance_scale=5.0, sampler_name="DDIM_Gaussian",
            key=key, interval=1,
        )
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)

    def test_interval_3_runs_and_approximates(self, unet):
        cfg, apply_fn, full, cached, sched, cond, uncond = self._setup(unet)
        from t2v.core import rng as rng_lib

        key = rng_lib.key_for_seed(7)
        shape = (1, 2, 8, 8, cfg.in_dim)
        ref = sample_loop(
            apply_fn, sched, steps=6, shape=shape, cond=cond, uncond=uncond,
            guidance_scale=5.0, sampler_name="DDIM_Gaussian", key=key,
        )
        out = sample_loop_deepcache(
            full, cached, sched, steps=6, shape=shape, cond=cond,
            uncond=uncond, guidance_scale=5.0, sampler_name="DDIM_Gaussian",
            key=key, interval=3,
        )
        out = np.asarray(out)
        assert np.isfinite(out).all()
        # same ballpark but not identical (it IS an approximation)
        assert not np.allclose(np.asarray(ref), out, atol=1e-5)
        assert np.abs(out - np.asarray(ref)).mean() < 1.0

    def test_pipeline_flag(self, unet):
        from t2v.pipeline.pipeline import ModelScopePipeline

        pipe = ModelScopePipeline.random_init()
        args = T2VArgs(prompt="x", n_prompt="", steps=4, frames=2, width=32, height=32, seed=3)
        res = pipe.infer(args, deep_cache_interval=2)
        assert np.stack(res.frames).shape[0] == 2

    def test_unipc_rejected(self, unet):
        cfg, apply_fn, full, cached, sched, cond, uncond = self._setup(unet)
        with pytest.raises(ValueError):
            sample_loop_deepcache(
                full, cached, sched, steps=4, shape=(1, 2, 8, 8, cfg.in_dim),
                cond=cond, sampler_name="UniPC",
            )
