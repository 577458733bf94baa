"""Real-checkpoint-layout converter parity (VERDICT round-1 item 1).

Unlike the synthetic state_dicts elsewhere in the suite (shaped by our own
converters — circular), these checkpoints are produced by the REFERENCE's
torch classes + ``torch.save`` via tools/parity/gen_checkpoints.py: real key
names, real tensor layouts, the real zip-pickle container, the real
``{'state_dict': {'first_stage_model.*'}}`` VAE nesting. The test then runs
the production load path (restricted unpickler → convert_* →
``ModelScopePipeline.from_model_dir``) and checks activations against the
torch modules.

The full-scale (1.4B, 256×256×16f, 20-step) run of the same harness is
recorded in PARITY.md; this is the CI-sized guard against converter/reader
regressions.
"""

from __future__ import annotations

import dataclasses
import os
import subprocess
import sys

import numpy as np
import pytest

pytest.importorskip("torch")
if not os.path.isdir("/root/reference"):  # harness needs the reference tree
    pytest.skip("reference tree not available", allow_module_level=True)

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools", "parity")
sys.path.insert(0, TOOLS)

FRAMES, SIZE, LAT_SCALE = 3, 64, 2


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("real_ckpt")
    subprocess.run(
        [sys.executable, os.path.join(TOOLS, "gen_checkpoints.py"),
         "--out", str(out), "--small"],
        check=True, capture_output=True, text=True,
    )
    return str(out)


@pytest.fixture(scope="module")
def pipe(model_dir):
    from t2v.core.config import CLIPTextConfig, VAEConfig
    from t2v.core.dtypes import Policy
    from t2v.pipeline.pipeline import ModelScopePipeline

    clip_cfg = dataclasses.replace(
        CLIPTextConfig.vit_h_14(), width=1024, layers=2, heads=2
    )
    return ModelScopePipeline.from_model_dir(
        model_dir, Policy.fp32(), vae_cfg=VAEConfig().tiny(), clip_cfg=clip_cfg
    )


def test_unet_forward_parity(model_dir, pipe):
    import jax.numpy as jnp
    import torch

    import torch_golden

    unet_t, _cfg = torch_golden.load_unet(model_dir)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, FRAMES, 16, 16, 4)).astype(np.float32)
    ctx = rng.standard_normal((1, 77, 1024)).astype(np.float32) * 0.1
    with torch.no_grad():
        y_t = unet_t(
            torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))),
            torch.tensor([500.0]),
            torch.from_numpy(ctx),
        ).numpy()
    y_j = np.asarray(
        pipe.unet.apply(
            pipe.unet_params, jnp.asarray(x), jnp.full((1,), 500.0), jnp.asarray(ctx)
        )
    )
    diff = np.abs(y_j - np.transpose(y_t, (0, 2, 3, 4, 1))).max()
    assert diff < 5e-4, f"UNet forward diverges on real-layout ckpt: {diff}"


def test_text_tower_parity(model_dir, pipe):
    import torch

    import gen_checkpoints as gen

    clip_t = gen.OpenClipTextModel(width=1024, layers=2, heads=2)
    sd = torch.load(
        os.path.join(model_dir, "open_clip_pytorch_model.bin"),
        map_location="cpu", weights_only=True,
    )
    clip_t.load_state_dict(
        {k: v for k, v in sd.items() if not k.startswith("visual.")}, strict=True
    )
    clip_t.eval()

    tok = pipe.text_encoder.tokenizer
    ids = [tok.bos_id] + tok.encode("a photo of a cat") + [tok.eos_id]
    tokens = np.zeros((1, 77), np.int64)
    tokens[0, : len(ids)] = ids
    with torch.no_grad():
        z_t = clip_t.encode(torch.from_numpy(tokens), penultimate=True).numpy()
    import jax.numpy as jnp

    z_j = np.asarray(
        pipe.text_encoder.model.apply(
            pipe.text_encoder.params, jnp.asarray(tokens, jnp.int32)
        )
    )
    assert np.abs(z_j - z_t).max() < 5e-4


def test_videocrafter_real_layout_parity(tmp_path_factory):
    """VideoCrafter family: a Lightning model.ckpt assembled from the
    reference's lvdm torch classes (model.diffusion_model / first_stage /
    cond_stage prefixes + DDPM buffers) through the production
    from_model_dir path; checks CLIP / UNet fwd / 5-step lvdm-DDIM /
    decode against the torch goldens."""
    import json

    out = str(tmp_path_factory.mktemp("vc_ckpt"))
    subprocess.run(
        [sys.executable, os.path.join(TOOLS, "vc_golden.py"),
         "--out-dir", out, "--small"],
        check=True, capture_output=True, text=True,
    )
    report_path = os.path.join(out, "report.json")
    subprocess.run(
        [sys.executable, os.path.join(TOOLS, "jax_parity_vc.py"),
         "--dir", out, "--out", report_path, "--cpu"],
        check=True, capture_output=True, text=True,
    )
    with open(report_path) as f:
        report = json.load(f)
    assert report["pass"], report


def test_vae_decode_parity(model_dir, pipe):
    import jax.numpy as jnp
    import torch

    import gen_checkpoints as gen
    from modelscope.t2v_model import AutoencoderKL as TorchVAE

    vae_t = TorchVAE(
        gen.SMALL_DDCONFIG, 4, os.path.join(model_dir, "VQGAN_autoencoder.pth")
    ).eval()
    rng = np.random.default_rng(1)
    z = rng.standard_normal((2, 32, 32, 4)).astype(np.float32)
    with torch.no_grad():
        img_t = vae_t.decode(
            torch.from_numpy(np.transpose(z, (0, 3, 1, 2)))
        ).numpy()
    from t2v.models.vae import AutoencoderKL

    img_j = np.asarray(
        pipe.vae.apply(pipe.vae_params, jnp.asarray(z), method=AutoencoderKL.decode)
    )
    diff = np.abs(img_j - np.transpose(img_t, (0, 2, 3, 1))).max()
    assert diff < 5e-4, f"VAE decode diverges on real-layout ckpt: {diff}"


class TestKeepInVramRetention:
    """Reference 3-state keep-in-VRAM option (t2v_pipeline.py:74,367-373;
    render.py:40-43): 'All' retains everything, 'Main Model Only' retains
    the UNet but drops VAE/CLIP between runs (reloaded from the model dir
    on the next request), 'None' retains nothing."""

    def _fresh_pipe(self, model_dir):
        from t2v.core.config import CLIPTextConfig, VAEConfig
        from t2v.core.dtypes import Policy
        from t2v.pipeline.pipeline import ModelScopePipeline

        clip_cfg = dataclasses.replace(
            CLIPTextConfig.vit_h_14(), width=1024, layers=2, heads=2
        )
        return ModelScopePipeline.from_model_dir(
            model_dir, Policy.fp32(), vae_cfg=VAEConfig().tiny(),
            clip_cfg=clip_cfg,
        )

    def _args(self):
        from t2v.core.config import T2VArgs

        return T2VArgs(
            prompt="a cat", steps=2, frames=2, width=32, height=32, seed=3
        )

    def test_main_model_only_drops_and_reloads_aux(self, model_dir, tmp_path):
        import t2v.pipeline.run as run_mod
        from t2v.pipeline.run import run

        pipe = self._fresh_pipe(model_dir)
        saved_warm = run_mod._warm_pipe
        try:
            r1 = run(
                self._args(), pipe=pipe, outdir=str(tmp_path),
                keep_in_vram="Main Model Only",
            )
            assert len(r1.videos) == 1
            # aux dropped, UNet + sampler caches retained, pipe stays warm
            assert pipe.text_encoder is None
            assert pipe.vae_params is None
            assert pipe._decode_fn is None
            assert pipe.unet_params is not None
            assert run_mod._warm_pipe is pipe

            # warm-pipe reuse (model=None): aux reloads from the model dir
            r2 = run(
                self._args().replace(model=None, seed=4),
                outdir=str(tmp_path / "b"), keep_in_vram="Main Model Only",
            )
            assert len(r2.videos) == 1
            assert pipe.text_encoder is None  # dropped again post-run
        finally:
            run_mod._warm_pipe = saved_warm

    def test_all_retains_everything(self, model_dir, tmp_path):
        import t2v.pipeline.run as run_mod
        from t2v.pipeline.run import run

        pipe = self._fresh_pipe(model_dir)
        saved_warm = run_mod._warm_pipe
        try:
            run(self._args(), pipe=pipe, outdir=str(tmp_path),
                keep_in_vram="All")
            assert pipe.text_encoder is not None
            assert pipe.vae_params is not None
            assert run_mod._warm_pipe is pipe
        finally:
            run_mod._warm_pipe = saved_warm

    def test_none_clears_warm_pipe(self, model_dir, tmp_path):
        import t2v.pipeline.run as run_mod
        from t2v.pipeline.run import run

        pipe = self._fresh_pipe(model_dir)
        saved_warm = run_mod._warm_pipe
        try:
            run(self._args(), pipe=pipe, outdir=str(tmp_path),
                keep_in_vram="None")
            assert run_mod._warm_pipe is None
            # nothing was stripped from the caller's object — it is simply
            # not retained (reference deletes the global, render.py:42-43)
            assert pipe.text_encoder is not None
        finally:
            run_mod._warm_pipe = saved_warm

    def test_main_model_only_drops_aux_when_infer_raises(
        self, model_dir, tmp_path, monkeypatch
    ):
        """Round-4 advisor finding: release_aux ran only on the success
        paths, so a mid-run raise left VAE/CLIP resident in violation of
        the retention contract. Now it runs in a finally."""
        import t2v.pipeline.run as run_mod
        from t2v.pipeline.run import run

        pipe = self._fresh_pipe(model_dir)
        saved_warm = run_mod._warm_pipe
        monkeypatch.setattr(
            type(pipe), "infer",
            lambda self, *a, **k: (_ for _ in ()).throw(RuntimeError("boom")),
        )
        try:
            with pytest.raises(RuntimeError, match="boom"):
                run(self._args(), pipe=pipe, outdir=str(tmp_path),
                    keep_in_vram="Main Model Only")
            assert pipe.text_encoder is None
            assert pipe.vae_params is None
        finally:
            run_mod._warm_pipe = saved_warm

    def test_invalid_retention_value_rejected(self, model_dir, tmp_path):
        from t2v.pipeline.run import run

        with pytest.raises(ValueError, match="keep_in_vram"):
            run(self._args(), pipe=self._fresh_pipe(model_dir),
                outdir=str(tmp_path), keep_in_vram="Sometimes")
