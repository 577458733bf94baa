"""Depth-from-RGB stage for the adapter path (reference get_batch_depth,
ddpm3d.py:1443-1466; driven by sample_text2video_adapter.py:113)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from t2v.models.depth import (  # noqa: E402
    DepthStage,
    MidasSmall,
    MidasSmallConfig,
    normalize_depth,
    prepare_depth_frames,
)


class TestMidasSmall:
    def test_tiny_forward_shapes(self):
        cfg = MidasSmallConfig().tiny()
        model = MidasSmall(cfg=cfg)
        x = jnp.zeros((1, 64, 64, 3))
        params = jax.jit(model.init)(jax.random.key(0), x)
        out = jax.jit(model.apply)(params, x)
        assert out.shape == (1, 64, 64)
        assert np.isfinite(np.asarray(out)).all()
        assert (np.asarray(out) >= 0).all()  # non_negative=True head

    def test_full_config_param_structure_matches_converter(self):
        """convert_midas_small's output tree must exactly match the flax
        module's init tree (same names, same shapes) for the published
        midas_v21_small layout — checked against a synthetic state dict
        with the documented torch key scheme."""
        from t2v.io.convert_depth import convert_midas_small
        from t2v.models.depth import _LITE3_STAGES

        rng = np.random.default_rng(0)
        sd = {}

        def conv(key, o, i, k):
            sd[f"{key}.weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32)
            sd[f"{key}.bias"] = rng.normal(size=(o,)).astype(np.float32)

        def conv_bn(ckey, bkey, o, i, k, groups=1):
            sd[f"{ckey}.weight"] = rng.normal(
                size=(o, i // groups, k, k)
            ).astype(np.float32)
            sd[f"{bkey}.weight"] = rng.uniform(0.5, 1.5, size=(o,)).astype(np.float32)
            sd[f"{bkey}.bias"] = rng.normal(size=(o,)).astype(np.float32)
            sd[f"{bkey}.running_mean"] = rng.normal(size=(o,)).astype(np.float32)
            sd[f"{bkey}.running_var"] = rng.uniform(0.5, 2.0, size=(o,)).astype(
                np.float32
            )

        conv_bn("pretrained.layer1.0", "pretrained.layer1.1", 32, 3, 3)
        groups = (
            ("pretrained.layer1", 3, (0, 1)),
            ("pretrained.layer2", 0, (2,)),
            ("pretrained.layer3", 0, (3, 4)),
            ("pretrained.layer4", 0, (5, 6)),
        )
        cin = 32
        for layer, child0, stages in groups:
            for off, si in enumerate(stages):
                reps, k, _, e, c = _LITE3_STAGES[si]
                for r in range(reps):
                    p = f"{layer}.{child0 + off}.{r}"
                    if e == 1:
                        conv_bn(f"{p}.conv_dw", f"{p}.bn1", cin, cin, k, groups=cin)
                        conv_bn(f"{p}.conv_pw", f"{p}.bn2", c, cin, 1)
                    else:
                        mid = cin * e
                        conv_bn(f"{p}.conv_pw", f"{p}.bn1", mid, cin, 1)
                        conv_bn(f"{p}.conv_dw", f"{p}.bn2", mid, mid, k, groups=mid)
                        conv_bn(f"{p}.conv_pwl", f"{p}.bn3", c, mid, 1)
                    cin = c
        for i, tap_c, dec_c in zip(
            range(1, 5), (32, 48, 136, 384), (64, 128, 256, 512)
        ):
            sd[f"scratch.layer{i}_rn.weight"] = rng.normal(
                size=(dec_c, tap_c, 3, 3)
            ).astype(np.float32)
        for i, feat, out_f in ((4, 512, 256), (3, 256, 128), (2, 128, 64), (1, 64, 64)):
            for unit in ("resConfUnit1", "resConfUnit2"):
                conv(f"scratch.refinenet{i}.{unit}.conv1", feat, feat, 3)
                conv(f"scratch.refinenet{i}.{unit}.conv2", feat, feat, 3)
            conv(f"scratch.refinenet{i}.out_conv", out_f, feat, 1)
        conv("scratch.output_conv.0", 32, 64, 3)
        conv("scratch.output_conv.2", 32, 32, 3)
        conv("scratch.output_conv.4", 1, 32, 1)

        converted = convert_midas_small(sd)
        model = MidasSmall()
        ref = jax.eval_shape(
            model.init, jax.random.key(0), jnp.zeros((1, 384, 384, 3))
        )
        got_paths = {
            "/".join(str(k.key) for k in p): v.shape
            for p, v in jax.tree_util.tree_flatten_with_path(converted)[0]
        }
        want_paths = {
            "/".join(str(k.key) for k in p): v.shape
            for p, v in jax.tree_util.tree_flatten_with_path(ref)[0]
        }
        assert got_paths == want_paths

    def test_bn_folding_matches_torch(self):
        """Folded conv == torch conv2d+batchnorm(eval) for both regular and
        depthwise convolutions (validates the layout transposes too)."""
        torch = pytest.importorskip("torch")
        from t2v.io.convert_depth import _BN_EPS, _fold

        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 6, 16, 16)).astype(np.float32)  # NCHW

        for depthwise in (False, True):
            o, i, groups = (6, 6, 6) if depthwise else (8, 6, 1)
            w = rng.normal(size=(o, i // groups, 3, 3)).astype(np.float32)
            sd = {
                "c.weight": w,
                "b.weight": rng.uniform(0.5, 1.5, size=(o,)).astype(np.float32),
                "b.bias": rng.normal(size=(o,)).astype(np.float32),
                "b.running_mean": rng.normal(size=(o,)).astype(np.float32),
                "b.running_var": rng.uniform(0.5, 2.0, size=(o,)).astype(np.float32),
            }
            tx = torch.from_numpy(x)
            ty = torch.nn.functional.conv2d(
                tx, torch.from_numpy(w), padding=1, groups=groups
            )
            ty = torch.nn.functional.batch_norm(
                ty,
                torch.from_numpy(sd["b.running_mean"]),
                torch.from_numpy(sd["b.running_var"]),
                torch.from_numpy(sd["b.weight"]),
                torch.from_numpy(sd["b.bias"]),
                training=False,
                eps=_BN_EPS,
            ).numpy()

            folded = _fold(sd, "c", "b", depthwise=depthwise)["conv"]
            jx = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
            jy = jax.lax.conv_general_dilated(
                jx,
                jnp.asarray(folded["kernel"]),
                window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups,
            ) + jnp.asarray(folded["bias"])
            np.testing.assert_allclose(
                np.transpose(ty, (0, 2, 3, 1)), np.asarray(jy), atol=1e-4
            )


class TestDepthContract:
    def test_normalize_depth_minmax(self):
        rng = np.random.default_rng(2)
        d = jnp.asarray(rng.uniform(0, 50, size=(3, 24, 24)).astype(np.float32))
        out = np.asarray(normalize_depth(d, (16, 16)))
        assert out.shape == (3, 16, 16, 1)
        # per-frame range is exactly [-1, 1] (ddpm3d.py:1462-1464)
        for i in range(3):
            assert out[i].min() == pytest.approx(-1.0, abs=1e-4)
            assert out[i].max() == pytest.approx(1.0, abs=1e-4)

    def test_prepare_resizes_and_scales(self):
        frames = (np.ones((2, 32, 48, 3)) * 255).astype(np.uint8)
        out = prepare_depth_frames(frames)
        assert out.shape == (2, 384, 384, 3)
        np.testing.assert_allclose(out, 1.0, atol=1e-6)

    def test_stage_with_stub_estimator(self):
        def stub(f384):
            # brightness as fake inverse depth
            return jnp.mean((f384 + 1.0) / 2.0, axis=-1)

        stage = DepthStage(estimator=stub)
        rng = np.random.default_rng(3)
        video = rng.integers(0, 255, size=(5, 40, 40, 3)).astype(np.uint8)
        d = stage.video_depth(video, (32, 32), chunk=2)
        assert d.shape == (5, 32, 32, 1)
        assert d.min() >= -1.0 - 1e-5 and d.max() <= 1.0 + 1e-5


class TestRunDepthFromRGB:
    def test_run_adapter_from_rgb_video(self, tmp_path):
        """run() with depth_estimator computes depth from an ORDINARY RGB
        video — the reference adapter CLI behaviour
        (sample_text2video_adapter.py:113)."""
        import jax as _jax

        from t2v.core.config import T2VArgs, T2VOutputArgs
        from t2v.media.video import ffmpeg_stitch_video
        from t2v.models.adapter import Adapter, AdapterConfig
        from t2v.pipeline.run import run
        from t2v.pipeline.videocrafter import VideoCrafterPipeline

        rng = np.random.default_rng(0)
        frames = [
            rng.integers(0, 255, (32, 32, 3), np.uint8) for _ in range(4)
        ]
        src = str(tmp_path / "rgb.mp4")
        ffmpeg_stitch_video(frames=frames, out_path=src, fps=4)

        pipe = VideoCrafterPipeline.random_init()
        pipe.unet_params = _jax.tree.map(
            lambda a: a + 0.01 if a.size and not np.asarray(a).any() else a,
            pipe.unet_params,
        )
        from t2v.pipeline.pipeline import _spatial_scale

        # first injection lands after the first downsample (latent/2):
        # unshuffle the 32-px depth straight to that resolution
        ss = _spatial_scale(pipe.vae_cfg)
        un = ss * 2
        acfg = AdapterConfig(
            channels=(pipe.cfg.model_channels,) * 4, nums_rb=1,
            cin=un * un, unshuffle=un,
        )
        adapter = Adapter(cfg=acfg)
        aparams = _jax.jit(adapter.init)(
            _jax.random.key(0), jnp.zeros((4, 32, 32, 1))
        )
        pipe.load_adapter = lambda path: (adapter, aparams)

        calls = []

        def stub(f384):
            calls.append(f384.shape)
            return jnp.mean((f384 + 1.0) / 2.0, axis=-1)

        args = T2VArgs(
            model_type="VideoCrafter", prompt="a room", steps=2, frames=4,
            width=32, height=32, seed=2,
        )
        res = run(
            args, T2VOutputArgs(skip_video_creation=True), pipe=pipe,
            outdir=str(tmp_path / "out"), save_frames=False,
            adapter_ckpt="<in-memory>", adapter_video=src,
            depth_estimator=stub,
        )
        assert len(res.infotexts) == 1
        assert calls and all(s[1:] == (384, 384, 3) for s in calls)
