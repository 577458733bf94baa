"""Conditioning-key router + class/time-emb conditioning in the VC UNet."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2v.models.conditioning import (
    CONDITIONING_KEYS,
    normalize_cond,
    route_conditioning,
)
from t2v.models.videocrafter_unet import VideoCrafterUNet, VideoCrafterUNetConfig


class TestRouter:
    def setup_method(self):
        self.x = jnp.ones((2, 4, 8, 8, 4))
        self.cc = jnp.ones((2, 4, 8, 8, 3)) * 0.5
        self.ca = jnp.ones((2, 7, 16))
        self.adm = jnp.ones((2, 32))

    def test_none_passthrough(self):
        x, kw = route_conditioning(None, self.x, {})
        assert x.shape == self.x.shape and kw["context"] is None and kw["y"] is None

    def test_concat(self):
        x, kw = route_conditioning("concat", self.x, {"c_concat": [self.cc]})
        assert x.shape == (2, 4, 8, 8, 7)
        assert kw["context"] is None

    def test_crossattn_token_concat(self):
        x, kw = route_conditioning(
            "crossattn", self.x, {"c_crossattn": [self.ca, self.ca]}
        )
        assert x.shape == self.x.shape
        assert kw["context"].shape == (2, 14, 16)

    def test_hybrid(self):
        x, kw = route_conditioning(
            "hybrid", self.x, {"c_concat": [self.cc], "c_crossattn": [self.ca]}
        )
        assert x.shape == (2, 4, 8, 8, 7)
        assert kw["context"].shape == (2, 7, 16)

    def test_adm_routes_y(self):
        _, kw = route_conditioning("adm", self.x, {"c_crossattn": [self.adm]})
        assert kw["y"] is self.adm and kw["context"] is None

    def test_crossattn_adm(self):
        _, kw = route_conditioning(
            "crossattn-adm", self.x, {"c_crossattn": [self.ca], "s": self.adm}
        )
        assert kw["context"].shape == (2, 7, 16)
        assert kw["y"] is self.adm

    def test_hybrid_adm(self):
        x, kw = route_conditioning(
            "hybrid-adm",
            self.x,
            {"c_concat": [self.cc], "c_crossattn": [self.ca], "c_adm": self.adm},
        )
        assert x.shape[-1] == 7 and kw["y"] is self.adm

    def test_all_keys_dispatch(self):
        cond = {
            "c_concat": [self.cc],
            "c_crossattn": [self.ca],
            "c_adm": self.adm,
            "s": self.adm,
            "mask": None,
        }
        for k in CONDITIONING_KEYS:
            x, kw = route_conditioning(k, self.x, cond)
            assert x.shape[:4] == self.x.shape[:4]

    def test_unknown_key_raises(self):
        with pytest.raises(NotImplementedError):
            route_conditioning("warp-drive", self.x, {})

    def test_normalize_bare_tensor(self):
        c = normalize_cond("crossattn", self.ca)
        assert c == {"c_crossattn": [self.ca]}
        c = normalize_cond("concat", self.cc)
        assert c == {"c_concat": [self.cc]}
        d = {"c_crossattn": [self.ca], "s": 1}
        assert normalize_cond("hybrid", d) == d


class TestUNetConditioning:
    def _tiny(self, **kw):
        import dataclasses

        cfg = VideoCrafterUNetConfig().tiny()
        return dataclasses.replace(cfg, **kw)

    def test_class_conditional_label_emb(self):
        cfg = self._tiny(num_classes=10)
        m = VideoCrafterUNet(cfg=cfg)
        x = jnp.ones((1, 2, 16, 16, 4)) * 0.1
        t = jnp.zeros((1,))
        ctx = jnp.zeros((1, 5, cfg.context_dim))
        y = jnp.asarray([3])
        params = jax.jit(m.init)(jax.random.key(0), x, t, ctx, y=y)
        assert "label_emb" in params["params"]
        out1 = m.apply(params, x, t, ctx, y=jnp.asarray([3]))
        out2 = m.apply(params, x, t, ctx, y=jnp.asarray([7]))
        # zero-init head keeps outputs zero; check the embedding itself varies
        emb = params["params"]["label_emb"]["embedding"]
        assert not np.allclose(np.asarray(emb[3]), np.asarray(emb[7]))
        assert out1.shape == out2.shape == x.shape

    def test_time_emb_replace(self):
        cfg = self._tiny()
        m = VideoCrafterUNet(cfg=cfg)
        x = jnp.ones((1, 2, 16, 16, 4)) * 0.1
        t = jnp.zeros((1,))
        ctx = jnp.zeros((1, 5, cfg.context_dim))
        params = jax.jit(m.init)(jax.random.key(0), x, t, ctx)
        emb = jnp.ones((1, cfg.model_channels * 4))
        out = m.apply(params, x, None, ctx, time_emb_replace=emb)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out, np.float32)).all()

    def test_embedding_valued_y(self):
        cfg = self._tiny()
        m = VideoCrafterUNet(cfg=cfg)
        x = jnp.ones((1, 2, 16, 16, 4)) * 0.1
        t = jnp.zeros((1,))
        ctx = jnp.zeros((1, 5, cfg.context_dim))
        y = jnp.ones((1, 16))  # width != 4*model_channels → projected
        params = jax.jit(m.init)(jax.random.key(0), x, t, ctx, y=y)
        assert "label_proj" in params["params"]
        out = m.apply(params, x, t, ctx, y=y)
        assert out.shape == x.shape


class TestPipelineAdapterPath:
    def test_infer_with_adapter_features(self):
        from t2v.core.config import T2VArgs
        from t2v.pipeline.videocrafter import VideoCrafterPipeline

        from t2v.pipeline.pipeline import _spatial_scale

        pipe = VideoCrafterPipeline.random_init(seed=0)
        # zero-init head/gates make eps identically 0 at random init —
        # un-zero them so the adapter's contribution reaches the output
        pipe.unet_params = jax.tree.map(
            lambda a: a + 0.01 if a.size and not np.asarray(a).any() else a,
            pipe.unet_params,
        )
        mc = pipe.cfg.model_channels
        # injection lands after the first downsample: latent/2
        lat = 64 // _spatial_scale(pipe.vae_cfg)
        feats = (jnp.ones((1, 4, lat // 2, lat // 2, mc)) * 0.05,)
        args = T2VArgs(
            prompt="x", n_prompt="", steps=3, frames=4, width=64, height=64, seed=5
        )
        res = pipe.infer(args, features_adapter=feats)
        base = pipe.infer(args)
        a = np.stack(res.frames).astype(np.float32)
        b = np.stack(base.frames).astype(np.float32)
        assert a.shape == b.shape
        assert not np.allclose(a, b)

    def test_adapter_features_shapes(self):
        from t2v.models.adapter import Adapter, AdapterConfig
        from t2v.pipeline.videocrafter import VideoCrafterPipeline

        pipe = VideoCrafterPipeline.random_init(seed=0)
        acfg = AdapterConfig(channels=(8, 16, 16, 16), nums_rb=1)
        adapter = Adapter(cfg=acfg)
        depth = np.ones((1, 4, 64, 64, 1), np.float32) * 0.3
        params = jax.jit(adapter.init)(
            jax.random.key(0), jnp.zeros((1, 64, 64, 1))
        )
        feats = pipe.adapter_features(adapter, params, depth)
        assert len(feats) == 4
        assert feats[0].shape == (1, 4, 8, 8, 8)
        assert feats[1].shape == (1, 4, 4, 4, 16)
