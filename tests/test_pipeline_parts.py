"""Keyframe DSL, LoRA merge, checkpoint IO, media tests."""

import os

import numpy as np
import pytest

from t2v.core.config import CLIPTextConfig, ModelScopeUNetConfig
from t2v.pipeline.keyframes import KeyFrameSeries, parse_key_frames, safe_eval
from t2v.pipeline.lora import merge_stable_lora, unet_module_index


class TestKeyframeDSL:
    def test_parse_basic(self):
        frames = parse_key_frames("0:(0.0), 10:(1.0)", max_frames=24)
        assert frames == {0: "(0.0)", 10: "(1.0)"}

    def test_parse_expression_index(self):
        frames = parse_key_frames('0:(t/max_i_f), "max_i_f":(1)', max_frames=24, max_i_frames=12)
        assert set(frames) == {0, 11}

    def test_default_inpainting_weights(self):
        # the reference default: linear ramp 0..1 over inpainting frames,
        # then 1 (args.py:232, key_frames semantics)
        keys = KeyFrameSeries(24, seed=1, max_i_frames=12)
        w = keys.inpainting_weights('0:(t/max_i_f), "max_i_f":(1)')
        assert w.shape == (24,)
        assert w[0] == 0.0
        assert w[11] == pytest.approx(1.0)
        assert np.allclose(w[11:], 1.0)
        assert np.all(np.diff(w[:12]) > 0)

    def test_expression_propagates(self):
        # reference quirk: an expression keeps evaluating at later frames
        keys = KeyFrameSeries(10, seed=1, max_i_frames=1)
        w = keys.get_inbetweens(parse_key_frames("0:(t*2)", max_frames=10))
        assert np.allclose(w, np.arange(10) * 2.0)

    def test_interpolation_linear(self):
        keys = KeyFrameSeries(5, seed=1)
        w = keys.get_inbetweens({0: "0", 4: "4"})
        assert np.allclose(w, [0, 1, 2, 3, 4])

    def test_quadratic_degrades_to_linear(self):
        keys = KeyFrameSeries(5, seed=1)
        w = keys.get_inbetweens({0: "0", 4: "4"}, interp_method="Quadratic")
        assert np.allclose(w, [0, 1, 2, 3, 4])

    def test_safe_eval_blocks_attacks(self):
        with pytest.raises(ValueError):
            safe_eval("__import__('os')", {})
        with pytest.raises(ValueError):
            safe_eval("().__class__", {})

    def test_seed_variable(self):
        assert safe_eval("s + 1", {"s": 41}) == 42.0


class TestLoRAMerge:
    def _setup(self, rng):
        import jax
        import jax.numpy as jnp
        from t2v.models.modelscope_unet import UNetSD

        cfg = ModelScopeUNetConfig().tiny()
        m = UNetSD(cfg=cfg)
        x = jnp.zeros((1, 2, 8, 8, cfg.in_dim))
        params = jax.jit(m.init)(
            jax.random.key(0), x, jnp.zeros((1,)), jnp.zeros((1, 5, cfg.context_dim))
        )
        return cfg, params

    def test_linear_merge_and_undo(self, rng):
        cfg, params = self._setup(rng)
        idx = unet_module_index(cfg)
        name = "middle_block.1.transformer_blocks.0.attn1.to_q"
        assert name in idx
        fpath, kind = idx[name]
        assert kind == "linear"
        dim = cfg.dim * max(cfg.dim_mult)
        r = 4
        lora = {
            f"{name}.lora_A": rng.normal(size=(r, dim)).astype(np.float32),
            f"{name}.lora_B": rng.normal(size=(dim, r)).astype(np.float32),
        }
        merged, skipped = merge_stable_lora(params, lora, 0.5, idx)
        assert not skipped

        def leaf(tree):
            node = tree["params"]
            for seg in fpath:
                node = node[seg]
            return np.asarray(node["kernel"])

        delta = leaf(merged) - leaf(params)
        expect = 0.5 * (lora[f"{name}.lora_B"] @ lora[f"{name}.lora_A"]).T
        np.testing.assert_allclose(delta, expect, rtol=1e-4, atol=1e-5)

        restored, _ = merge_stable_lora(merged, lora, 0.5, idx, undo=True)
        np.testing.assert_allclose(leaf(restored), leaf(params), rtol=1e-4, atol=1e-5)

    def test_unknown_modules_skipped(self, rng):
        cfg, params = self._setup(rng)
        idx = unet_module_index(cfg)
        lora = {
            "nonexistent.module.lora_A": np.zeros((2, 4), np.float32),
            "nonexistent.module.lora_B": np.zeros((4, 2), np.float32),
        }
        _, skipped = merge_stable_lora(params, lora, 1.0, idx)
        assert skipped == ["nonexistent.module"]

    def test_index_paths_exist_in_param_tree(self, rng):
        cfg, params = self._setup(rng)
        idx = unet_module_index(cfg)
        for name, (fpath, kind) in idx.items():
            node = params["params"]
            for seg in fpath:
                assert seg in node, f"{name} -> {fpath} missing at {seg}"
                node = node[seg]
            assert "kernel" in node, f"{name} -> {fpath} has no kernel"

    def test_stable_lora_reaches_text_encoder(self, rng):
        """The reference merges every stable-lora into the CLIP transformer
        too (lora_webui.py:186-187); keys are relative to the transformer
        submodule. A CLIP-targeting LoRA must change embeddings, and the
        undo must restore them."""
        from t2v.pipeline.pipeline import ModelScopePipeline

        pipe = ModelScopePipeline.random_init()
        enc = pipe.text_encoder
        z0 = enc.encode_line("a cat in a forest").copy()

        width = pipe.clip_cfg.width
        r = 3
        lora_sd = {
            "resblocks.0.mlp.c_fc.lora_A": rng.normal(size=(r, width)).astype(np.float32),
            "resblocks.0.mlp.c_fc.lora_B": rng.normal(size=(4 * width, r)).astype(np.float32) * 0.1,
        }
        skipped = pipe.apply_stable_lora(lora_sd, alpha=0.5)
        assert "resblocks.0.mlp.c_fc" not in skipped["clip"]
        # the same key is (correctly) not a UNet module
        assert "resblocks.0.mlp.c_fc" in skipped["unet"]
        z1 = enc.encode_line("a cat in a forest")
        assert np.abs(z1 - z0).max() > 1e-3, "CLIP LoRA did not affect embeddings"

        pipe.apply_stable_lora(lora_sd, alpha=0.5, undo=True)
        z2 = enc.encode_line("a cat in a forest")
        np.testing.assert_allclose(z2, z0, rtol=1e-4, atol=1e-5)


class TestSafetensorsIO:
    def test_roundtrip_with_metadata(self, tmp_path, rng):
        import safetensors.numpy

        tensors = {
            "w.lora_A": rng.normal(size=(4, 8)).astype(np.float32),
            "w.lora_B": rng.normal(size=(8, 4)).astype(np.float16),
        }
        p = str(tmp_path / "test.safetensors")
        safetensors.numpy.save_file(
            tensors, p, metadata={"stable_lora_text_to_video": "1"}
        )
        from t2v.io.safetensors_io import load_safetensors

        out, meta = load_safetensors(p)
        assert meta.get("stable_lora_text_to_video") == "1"
        np.testing.assert_allclose(out["w.lora_A"], tensors["w.lora_A"])
        assert out["w.lora_B"].dtype == np.float32  # upcast fp16


class TestMedia:
    def test_cv2_stitch_and_probe(self, tmp_path, rng):
        from t2v.media.video import ffmpeg_stitch_video, get_quick_vid_info, vid2frames

        frames = [
            (rng.uniform(0, 255, size=(64, 64, 3))).astype(np.uint8) for _ in range(8)
        ]
        out = str(tmp_path / "out.mp4")
        ffmpeg_stitch_video(frames=frames, out_path=out, fps=8)
        assert os.path.exists(out) and os.path.getsize(out) > 0
        fps, count, size = get_quick_vid_info(out)
        assert count == 8 and size == (64, 64)
        back = vid2frames(out, start_frame=2, end_frame=6)
        assert len(back) == 4
        assert back[0].shape == (64, 64, 3)

    def test_data_url(self, tmp_path):
        from t2v.media.video import video_to_data_url

        p = str(tmp_path / "f.mp4")
        with open(p, "wb") as f:
            f.write(b"abcd")
        url = video_to_data_url(p)
        assert url.startswith("data:video/mp4;base64,")


class TestSecondReviewFixes:
    def test_pickle_reader_rejects_oob_view(self, tmp_path):
        """Crafted shape/stride metadata must not read outside storage."""
        import torch

        from t2v.io import pickle_reader as pr
        from t2v.io.pickle_reader import load_torch_checkpoint

        # sane checkpoints still load
        t = torch.arange(4, dtype=torch.float32)
        p = str(tmp_path / "ok.pt")
        torch.save({"w": t}, p)
        sd = load_torch_checkpoint(p)
        np.testing.assert_array_equal(sd["w"], np.arange(4, dtype=np.float32))

        class FakeStorage:
            dtype = np.dtype("<f4")
            key = "0"

        stub = pr._TensorStub(
            storage=FakeStorage(), offset=0, shape=(10**6,), stride=(1,)
        )
        with pytest.raises(ValueError):
            pr._materialise(stub, b"\x00\x00\x80?" * 4)  # 4-float storage

    def test_steps_exceeding_T_raise_cleanly(self):
        from t2v.diffusion.schedules import (
            make_ddim_timesteps,
            modelscope_timesteps,
        )

        with pytest.raises(ValueError, match="cannot exceed"):
            modelscope_timesteps(1000, 1001)
        with pytest.raises(ValueError, match="cannot exceed"):
            make_ddim_timesteps(1001, 1000)

    def test_progressive_blend_skips_final_step(self):
        import jax
        import jax.numpy as jnp

        from t2v.diffusion.sampling import _inpaint_blend

        x = jnp.ones((1, 2, 4, 4, 4)) * 0.3
        mask = jnp.zeros_like(x)  # mask<=0 → blend would replace everything
        src = jnp.ones_like(x) * 0.9
        tables = (jnp.ones((1000,)), jnp.zeros((1000,)))
        out_last = _inpaint_blend(
            x, 9, 10, mask, src, tables, 1, jax.random.key(0)
        )
        np.testing.assert_allclose(np.asarray(out_last), np.asarray(x))
        out_mid = _inpaint_blend(
            x, 5, 10, mask, src, tables, 1, jax.random.key(0)
        )
        assert not np.allclose(np.asarray(out_mid), np.asarray(x))
