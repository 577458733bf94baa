"""WebVid loader, T2I-Adapter, DDPM full-chain sampling tests."""

import csv
import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2v.data.webvid import WebVidDataset
from t2v.models.adapter import Adapter, AdapterConfig, convert_adapter, pixel_unshuffle


def _make_fake_webvid(root, n_videos=3, frames=12, size=48):
    os.makedirs(os.path.join(root, "videos", "p1"), exist_ok=True)
    rows = []
    for i in range(n_videos):
        path = os.path.join(root, "videos", "p1", f"vid{i}.mp4")
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        w = cv2.VideoWriter(path, fourcc, 8, (size, size))
        for f in range(frames):
            img = np.full((size, size, 3), (i * 40 + f * 5) % 255, np.uint8)
            w.write(img)
        w.release()
        rows.append({"videoid": f"vid{i}", "name": f"caption {i}", "page_dir": "p1"})
    meta = os.path.join(root, "meta.csv")
    with open(meta, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["videoid", "name", "page_dir"])
        writer.writeheader()
        writer.writerows(rows)
    return root


class TestWebVid:
    def test_load_and_batch(self, tmp_path):
        root = _make_fake_webvid(str(tmp_path))
        ds = WebVidDataset(root, video_length=4, resolution=(32, 32), seed=1)
        assert len(ds) == 3
        sample = ds[0]
        assert sample is not None
        assert sample.frames.shape == (4, 32, 32, 3)
        assert sample.frames.min() >= -1.0 and sample.frames.max() <= 1.0
        assert sample.caption.startswith("caption")

        batches = list(ds.batches(batch_size=2, epochs=1))
        assert batches
        frames, caps = batches[0]
        assert frames.shape == (2, 4, 32, 32, 3)
        assert len(caps) == 2

    def test_too_short_video_skipped(self, tmp_path):
        root = _make_fake_webvid(str(tmp_path), frames=2)
        ds = WebVidDataset(root, video_length=8, resolution=(32, 32))
        assert ds[0] is None

    def test_fps_metadata_and_cap(self, tmp_path):
        """fps_clip = writer_fps // stride, capped by fps_max
        (reference webvid.py:176-179)."""
        root = _make_fake_webvid(str(tmp_path), frames=12)
        ds = WebVidDataset(root, video_length=4, resolution=(32, 32), frame_stride=2)
        s = ds[0]
        assert s.fps == 4.0  # 8 fps fixture // stride 2
        ds = WebVidDataset(
            root, video_length=4, resolution=(32, 32), frame_stride=1, fps_max=5
        )
        assert ds[0].fps == 5.0

    def test_stride_list_with_probs(self, tmp_path):
        root = _make_fake_webvid(str(tmp_path), frames=12)
        ds = WebVidDataset(
            root, video_length=4, resolution=(32, 32),
            frame_stride=[1, 2], fs_probs=[0.0, 1.0], seed=3,
        )
        s = ds[0]
        assert s.frame_stride == 2

    def test_stride_recalc_when_too_short_for_stride(self, tmp_path):
        # 12 frames can't honour stride 8 x length 4 -> stride drops to 3
        root = _make_fake_webvid(str(tmp_path), frames=12)
        ds = WebVidDataset(root, video_length=4, resolution=(32, 32), frame_stride=8)
        s = ds[0]
        assert s is not None and s.frame_stride == 3

    def test_fps_schedule_stages(self, tmp_path):
        root = _make_fake_webvid(str(tmp_path), frames=12)
        ds = WebVidDataset(
            root, video_length=4, resolution=(32, 32),
            frame_stride=[1, 2], fps_schedule=[2], bs_per_device=1,
        )
        strides = [ds[i % 3].frame_stride for i in range(5)]
        assert strides[0] == 1 and strides[-1] == 2  # stage flips after step 2

    def test_trigger_word_and_fps_batches(self, tmp_path):
        root = _make_fake_webvid(str(tmp_path))
        ds = WebVidDataset(
            root, video_length=4, resolution=(32, 32), trigger_word=" sks"
        )
        assert ds[0].caption.endswith(" sks")
        frames, caps, fps = next(ds.batches(2, epochs=1, with_fps=True))
        assert fps.shape == (2,) and fps.dtype == np.float32


class TestAdapter:
    def test_pixel_unshuffle_matches_torch(self, rng):
        import torch

        x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
        ours = pixel_unshuffle(jnp.asarray(x), 8)
        theirs = (
            torch.nn.functional.pixel_unshuffle(
                torch.from_numpy(x).permute(0, 3, 1, 2), 8
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(np.asarray(ours), theirs)

    def test_feature_pyramid_shapes(self):
        cfg = AdapterConfig(channels=(32, 64, 64, 64), nums_rb=2, cin=64)
        m = Adapter(cfg=cfg)
        x = jnp.zeros((1, 64, 64, 1))
        params = jax.jit(m.init)(jax.random.key(0), x)
        feats = m.apply(params, x)
        assert len(feats) == 4
        assert feats[0].shape == (1, 8, 8, 32)
        assert feats[1].shape == (1, 4, 4, 64)
        assert feats[3].shape == (1, 1, 1, 64)

    def test_converter_roundtrip(self, rng):
        cfg = AdapterConfig(channels=(32, 64), nums_rb=2, cin=64)
        # synthetic torch sd
        sd = {}
        r = lambda *s: rng.normal(size=s).astype(np.float32) * 0.05

        def conv(p, o, i, k=3):
            sd[f"{p}.weight"] = r(o, i, k, k)
            sd[f"{p}.bias"] = r(o)

        conv("conv_in", 32, 64)
        # i=0: blocks 0,1 (no down); i=1: block 2 (down from 32->64), block 3
        # NOTE: skep consumes the post-in_conv activation in the reference's
        # forward (adapter.py:60-72), so its in-channels are out_c — the
        # torch-side __init__ shape (in_c, out_c) only type-checks for
        # sk=True configs; we match the runtime-consistent shape.
        chans = [(32, 32), (32, 32), (32, 64), (64, 64)]
        for idx, (ci, co) in enumerate(chans):
            if idx == 2:
                conv(f"body.{idx}.down_opt.op", ci, ci)
            conv(f"body.{idx}.in_conv", co, ci)
            conv(f"body.{idx}.block1", co, co)
            conv(f"body.{idx}.block2", co, co)
            conv(f"body.{idx}.skep", co, co)
        converted = convert_adapter(sd, cfg)
        m = Adapter(cfg=cfg)
        x = jnp.zeros((1, 32, 32, 1))
        ref = jax.jit(m.init)(jax.random.key(0), x)
        shapes = lambda t: jax.tree.map(lambda a: tuple(a.shape), t)
        assert shapes(ref) == shapes(converted)
        feats = m.apply(converted, x)
        assert all(np.isfinite(np.asarray(f)).all() for f in feats)

    def test_unet_adapter_injection(self):
        from t2v.models.videocrafter_unet import VideoCrafterUNet, VideoCrafterUNetConfig

        cfg = VideoCrafterUNetConfig().tiny()
        m = VideoCrafterUNet(cfg=cfg)
        x = jnp.ones((1, 2, 16, 16, 4)) * 0.1
        t = jnp.zeros((1,))
        ctx = jnp.zeros((1, 5, cfg.context_dim))
        params = jax.jit(m.init)(jax.random.key(0), x, t, ctx)
        # un-zero the zero-init head so outputs reflect the torso
        params = jax.tree_util.tree_map_with_path(
            lambda p, a: jnp.ones_like(a) * 0.01
            if any(getattr(s, "key", "") == "head_conv" for s in p)
            else a,
            params,
        )
        base = m.apply(params, x, t, ctx)
        # tiny topology: injection lands after encoder entry 2 (the
        # downsample, ch=model_channels, spatial 8x8)
        feats = (jnp.ones((1, 8, 8, cfg.model_channels)),)
        out = m.apply(params, x, t, ctx, features_adapter=feats)
        assert not np.allclose(np.asarray(base), np.asarray(out))


class TestDDPMSampling:
    def test_full_chain_runs(self):
        from t2v.diffusion import ddpm as ddpm_mod
        from t2v.diffusion.schedules import DiffusionSchedule
        from t2v.core import rng as rng_lib

        sched = DiffusionSchedule.linear_sd(50)  # short chain for speed
        eps_fn = lambda x, t, i: 0.1 * x
        key = rng_lib.key_for_seed(0)
        noise = rng_lib.latent_noise(key, (1, 2, 4, 4, 4))
        out = ddpm_mod.sample(eps_fn, sched, noise, key)
        assert out.shape == noise.shape
        assert np.isfinite(np.asarray(out)).all()
        out2 = ddpm_mod.sample(eps_fn, sched, noise, key)
        assert np.allclose(np.asarray(out), np.asarray(out2))


class TestTrainCLIVideoCrafter:
    def test_one_step_vc_tiny(self, tmp_path):
        root = _make_fake_webvid(str(tmp_path / "data"), n_videos=2, frames=8, size=48)
        out = str(tmp_path / "out")
        from t2v.cli.train import main

        rc = main([
            "--data-dir", root, "--tiny", "--model-type", "VideoCrafter",
            "--batch-size", "2", "--frames", "4", "--resolution", "32",
            "--steps", "1", "--save-every", "1", "--log-every", "1",
            "--out", out,
        ])
        assert rc == 0
        saved = os.listdir(out)
        assert saved == ["step_1"]
        import json

        meta = json.load(open(os.path.join(out, "step_1", "t2v_native.json")))
        assert meta["model_family"] == "videocrafter"


class TestDepthAdapterVariant:
    def test_sk_true_avgpool_variant(self, rng):
        """The published depth-adapter configuration (ksize=1, sk=True,
        use_conv=False) builds, converts, and runs."""
        from t2v.models.adapter import (
            Adapter,
            AdapterConfig,
            convert_adapter,
            infer_adapter_config,
        )

        cfg = AdapterConfig(
            channels=(8, 16), nums_rb=2, cin=64, ksize=1, sk=True, use_conv=False
        )
        # synthetic torch sd with the reference's conditional key layout
        sd = {}
        r = lambda *s: rng.normal(size=s).astype(np.float32) * 0.1

        def conv(p, o, i, k):
            sd[f"{p}.weight"] = r(o, i, k, k)
            sd[f"{p}.bias"] = r(o)

        conv("conv_in", 8, 64, 3)
        # i=0: blocks 0,1 (in 8->8, sk=True -> NO in_conv, NO skep)
        for idx in (0, 1):
            conv(f"body.{idx}.block1", 8, 8, 3)
            conv(f"body.{idx}.block2", 8, 8, 1)
        # i=1: block 2 (down, avg-pool so NO down_opt conv; in 8->16 so
        # in_conv exists), block 3 (16->16, no in_conv)
        conv("body.2.in_conv", 16, 8, 1)
        conv("body.2.block1", 16, 16, 3)
        conv("body.2.block2", 16, 16, 1)
        conv("body.3.block1", 16, 16, 3)
        conv("body.3.block2", 16, 16, 1)

        inferred = infer_adapter_config(sd)
        assert inferred.sk and not inferred.use_conv and inferred.ksize == 1
        assert inferred.channels == (8, 16) and inferred.nums_rb == 2

        params = convert_adapter(sd, cfg)
        m = Adapter(cfg=cfg)
        x = jnp.zeros((1, 32, 32, 1))
        ref = jax.jit(m.init)(jax.random.key(0), x)
        shapes = lambda t: jax.tree.map(lambda a: tuple(a.shape), t)
        assert shapes(ref) == shapes(params)
        feats = m.apply(params, x)
        assert feats[0].shape == (1, 4, 4, 8)
        assert feats[1].shape == (1, 2, 2, 16)
