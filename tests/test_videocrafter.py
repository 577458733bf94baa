"""VideoCrafter family: topology, converter round-trip, e2e inference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2v.core.config import T2VArgs
from t2v.io.convert_vc import convert_vc_unet, split_lightning_state_dict, vc_module_index
from t2v.models.videocrafter_unet import (
    VideoCrafterUNet,
    VideoCrafterUNetConfig,
    build_vc_topology,
)
from t2v.pipeline.videocrafter import VideoCrafterPipeline

CFG = VideoCrafterUNetConfig().tiny()


def make_vc_torch_sd(cfg, rng):
    """Synthetic torch-layout state_dict with LVDM key names
    (openaimodel3d.py module structure)."""
    sd = {}
    r = lambda *s: rng.normal(size=s).astype(np.float32) * 0.05
    kt = cfg.kernel_size_t

    def linear(p, o, i, bias=True):
        sd[f"{p}.weight"] = r(o, i)
        if bias:
            sd[f"{p}.bias"] = r(o)

    def conv3d(p, o, i, k=3):
        sd[f"{p}.weight"] = r(o, i, kt, k, k)
        sd[f"{p}.bias"] = r(o)

    def conv3d_k1(p, o, i):
        sd[f"{p}.weight"] = r(o, i, 1, 1, 1)
        sd[f"{p}.bias"] = r(o)

    def norm(p, c):
        sd[f"{p}.weight"] = 1 + r(c)
        sd[f"{p}.bias"] = r(c)

    def attn(p, dim, ctx=None):
        inner = dim
        linear(f"{p}.to_q", inner, dim, bias=False)
        linear(f"{p}.to_k", inner, ctx or dim, bias=False)
        linear(f"{p}.to_v", inner, ctx or dim, bias=False)
        linear(f"{p}.to_out.0", dim, inner)

    def tattn(p, dim):
        attn(p, dim)
        hd = dim // cfg.num_heads
        sd[f"{p}.relative_position_k.embeddings_table"] = r(2 * cfg.temporal_length + 1, hd)
        sd[f"{p}.relative_position_v.embeddings_table"] = r(2 * cfg.temporal_length + 1, hd)

    def st(p, c):
        norm(f"{p}.norm", c)
        conv3d_k1(f"{p}.proj_in", c, c)
        conv3d_k1(f"{p}.proj_out", c, c)
        bp = f"{p}.transformer_blocks.0"
        attn(f"{bp}.attn1", c)
        attn(f"{bp}.attn2", c, cfg.context_dim)
        tattn(f"{bp}.attn1_tmp", c)
        tattn(f"{bp}.attn2_tmp", c)
        for n in ("norm1", "norm2", "norm3", "norm4", "norm5"):
            norm(f"{bp}.{n}", c)
        linear(f"{bp}.ff.net.0.proj", c * 8, c)
        linear(f"{bp}.ff.net.2", c, c * 4)

    def res(p, ci, co):
        norm(f"{p}.in_layers.0", ci)
        conv3d(f"{p}.in_layers.2", co, ci)
        linear(f"{p}.emb_layers.1", co, cfg.model_channels * 4)
        norm(f"{p}.out_layers.0", co)
        conv3d(f"{p}.out_layers.3", co, co)
        if ci != co:
            conv3d_k1(f"{p}.skip_connection", co, ci)

    linear("time_embed.0", cfg.model_channels * 4, cfg.model_channels)
    linear("time_embed.2", cfg.model_channels * 4, cfg.model_channels * 4)
    norm("out.0", cfg.model_channels)
    conv3d("out.2", cfg.out_channels, cfg.model_channels)

    topo = build_vc_topology(cfg)
    for entry in (*topo.encoder, topo.middle, *topo.decoder):
        for d in entry:
            if d.kind == "conv_in":
                conv3d(d.torch_path, d.out_ch, d.in_ch)
            elif d.kind == "res":
                res(d.torch_path, d.in_ch, d.out_ch)
            elif d.kind == "st":
                st(d.torch_path, d.out_ch)
            elif d.kind == "downsample":
                conv3d(f"{d.torch_path}.op", d.out_ch, d.out_ch)
            elif d.kind == "upsample":
                conv3d(f"{d.torch_path}.conv", d.out_ch, d.out_ch)
    return sd


class TestVCTopology:
    def test_full_config_counts(self):
        cfg = VideoCrafterUNetConfig()
        topo = build_vc_topology(cfg)
        # 1 conv_in + 4 levels * 2 res + 3 downsamples = 12
        assert len(topo.encoder) == 12
        assert len(topo.decoder) == 12
        # ds=8 level (entries 10, 11) has no ST; ds=4 level does
        assert all(d.kind != "st" for d in topo.encoder[10])
        assert all(d.kind != "st" for d in topo.encoder[11])
        assert any(d.kind == "st" for d in topo.encoder[8])

    def test_torch_indices_dense(self):
        topo = build_vc_topology(VideoCrafterUNetConfig())
        ids = [int(e[0].torch_path.split(".")[1]) for e in topo.encoder]
        assert ids == list(range(12))


class TestVCConverter:
    def test_roundtrip_and_forward(self, rng):
        sd = make_vc_torch_sd(CFG, rng)
        converted = convert_vc_unet(sd, CFG)
        m = VideoCrafterUNet(cfg=CFG)
        x = jnp.zeros((1, 4, 16, 16, CFG.in_channels))
        t = jnp.full((1,), 99.0)
        ctx = jnp.asarray(rng.normal(size=(1, 7, CFG.context_dim)).astype(np.float32))
        ref = jax.jit(m.init)(jax.random.key(0), x, t, ctx)
        shapes = lambda tr: jax.tree.map(lambda a: tuple(a.shape), tr)
        assert shapes(ref) == shapes(converted)
        out = jax.jit(m.apply)(converted, x, t, ctx)
        assert out.shape == (1, 4, 16, 16, CFG.out_channels)
        assert np.isfinite(np.asarray(out)).all()

    def test_all_keys_consumed(self, rng):
        sd = make_vc_torch_sd(CFG, rng)
        touched = set()

        class Rec(dict):
            def __getitem__(self, k):
                touched.add(k)
                return dict.__getitem__(self, k)

            def __contains__(self, k):
                touched.add(k)
                return dict.__contains__(self, k)

        convert_vc_unet(Rec(sd), CFG)
        assert not set(sd) - touched

    def test_split_lightning(self):
        ckpt = {
            "state_dict": {
                "model.diffusion_model.out.0.weight": np.zeros(2),
                "first_stage_model.encoder.conv_in.weight": np.zeros(2),
                "cond_stage_model.transformer.text_model.final_layer_norm.weight": np.zeros(2),
                "model_ema.decay": np.zeros(1),
            },
            "global_step": 5,
        }
        parts = split_lightning_state_dict(ckpt)
        assert "out.0.weight" in parts["unet"]
        assert "encoder.conv_in.weight" in parts["vae"]
        assert "text_model.final_layer_norm.weight" in parts["clip"]
        assert "model_ema.decay" in parts["other"]

    def test_lora_index_paths_exist(self, rng):
        sd = make_vc_torch_sd(CFG, rng)
        converted = convert_vc_unet(sd, CFG)
        idx = vc_module_index(CFG)
        assert idx
        for name, (fpath, kind) in idx.items():
            node = converted["params"]
            for seg in fpath:
                assert seg in node, (name, fpath)
                node = node[seg]
            assert "kernel" in node


class TestVCEndToEnd:
    def test_infer(self):
        pipe = VideoCrafterPipeline.random_init()
        args = T2VArgs(
            prompt="a cat", n_prompt="bad", steps=4, frames=4,
            width=64, height=64, seed=3, sampler="DDIM",
        )
        res = pipe.infer(args)
        assert len(res.frames) == 4
        assert res.frames[0].shape == (64, 64, 3)
        assert "VideoCrafter" in res.infotext

    def test_dpmpp_windowed_matches_monolithic(self):
        """VC DPM++ 2M windows like the ModelScope path: the (x, prev_D)
        carry crosses jitted windows and the callback fires per window."""
        from t2v.core.state import JobState

        pipe = VideoCrafterPipeline.random_init()
        args = T2VArgs(
            prompt="a cat", n_prompt="bad", steps=6, frames=2,
            width=32, height=32, seed=3,
        )
        ref = pipe.infer(args, sample_type="dpm++ 2m")  # monolithic
        st = JobState()
        st.begin_job(0, 1, 6)
        out = pipe.infer(
            args, sample_type="dpm++ 2m",
            callback=st.step_callback, callback_interval=2,
        )
        assert st.sampling_step == 6
        np.testing.assert_allclose(
            np.asarray(out.latents), np.asarray(ref.latents), atol=1e-4
        )

    def test_run_exposes_lvdm_extras(self, tmp_path):
        """uc_type, sample_type=ddpm and mask inpainting must be reachable
        through the public run() orchestrator (round-1 review: they were
        library-only surface on VideoCrafterPipeline.infer)."""
        import cv2

        from t2v.core.config import T2VOutputArgs
        from t2v.pipeline.run import run

        pipe = VideoCrafterPipeline.random_init()
        pipe.unet_params = jax.tree.map(
            lambda a: a + 0.01 if a.size and not np.asarray(a).any() else a,
            pipe.unet_params,
        )
        img_path = str(tmp_path / "src.png")
        cv2.imwrite(
            img_path,
            np.random.default_rng(0).integers(0, 255, (64, 64, 3), np.uint8),
        )
        out = T2VOutputArgs(fps=4, skip_video_creation=True)
        base_args = T2VArgs(
            model_type="VideoCrafter", prompt="x", steps=3, frames=3,
            width=64, height=64, seed=4,
        )

        def frames_of(args, sub, **kw):
            r = run(args, out, pipe=pipe, outdir=str(tmp_path / sub),
                    callback_interval=None, **kw)
            assert r.frame_dirs, "run produced no output"
            import os

            d = r.frame_dirs[0]
            pngs = sorted(f for f in os.listdir(d) if f.endswith(".png"))
            return np.stack([cv2.imread(os.path.join(d, f)) for f in pngs])

        plain = frames_of(base_args, "plain")
        uc = frames_of(base_args, "uc", vc_uc_type="cfg_original")
        assert not np.array_equal(plain, uc), "--uc-type is inert through run()"

        ddpm = frames_of(base_args, "ddpm", vc_sample_type="ddpm")
        assert ddpm.shape == plain.shape

        dpm = frames_of(base_args, "dpm", vc_sample_type="dpm++ 2m")
        assert dpm.shape == plain.shape
        # unsupported combos fail loudly rather than silently ignoring flags
        with pytest.raises(Exception):
            pipe.infer(base_args, sample_type="dpm++ 2m", uc_type="cfg_ours")

        inpaint_args = base_args.replace(
            inpainting_image=img_path, inpainting_frames=2
        )
        masked = frames_of(inpaint_args, "mask")
        assert not np.array_equal(plain, masked), "LVDM mask inpaint is inert"

    def test_zero_init_temporal_attention_is_identity(self, rng):
        """The temporal attentions are zero-init — a fresh model must behave
        per-frame identically (image-pretrained identity on time axis)."""
        from t2v.models.videocrafter_unet import TemporalCrossAttention

        mod = TemporalCrossAttention(query_dim=16, heads=2, dim_head=8, temporal_length=4)
        x = jnp.asarray(rng.normal(size=(3, 4, 16)).astype(np.float32))
        params = mod.init(jax.random.key(0), x)
        out = mod.apply(params, x)
        assert np.allclose(np.asarray(out), 0.0)


class TestLVDMMaskAndUcType:
    def test_mask_keeps_source_region(self):
        import jax
        from t2v.core import rng as rng_lib
        from t2v.diffusion.sampling import sample_loop
        from t2v.diffusion.schedules import DiffusionSchedule

        sched = DiffusionSchedule.linear_sd(100)
        toy = lambda x, t, ctx: 0.05 * x
        cond = jnp.zeros((1, 5, 8))
        src = jnp.ones((1, 2, 8, 8, 4)) * 0.7
        mask = jnp.zeros((1, 2, 8, 8, 4)).at[:, :, :4].set(1.0)  # keep top half
        key = rng_lib.key_for_seed(3)
        out = sample_loop(
            toy, sched, steps=8, shape=src.shape, cond=cond,
            sampler_name="DDIM", key=key, mask=mask, image_latents=src,
            inpaint_mode="lvdm_static",
        )
        base = sample_loop(
            toy, sched, steps=8, shape=src.shape, cond=cond,
            sampler_name="DDIM", key=key,
        )
        out, base = np.asarray(out), np.asarray(base)
        # kept region pinned near the source; free region matches plain run
        assert abs(out[:, :, :4].mean() - 0.7) < 0.15
        np.testing.assert_allclose(out[:, :, 4:], base[:, :, 4:], atol=1e-5)

    def test_uc_type_variants_change_combine(self):
        from t2v.diffusion.sampling import cfg_combine

        y = jnp.ones((1, 4)) * 2.0
        u = jnp.ones((1, 4))
        assert float(cfg_combine(y, u, 3.0, "full")[0, 0]) == 4.0       # u+3(y-u)
        assert float(cfg_combine(y, u, 3.0, "cfg_original")[0, 0]) == 5.0  # y+3(y-u)
        assert float(cfg_combine(y, u, 3.0, "cfg_ours")[0, 0]) == -1.0    # y+3(u-y)

    def test_pipeline_mask_passthrough(self):
        from t2v.core.config import T2VArgs
        from t2v.pipeline.pipeline import _spatial_scale
        from t2v.pipeline.videocrafter import VideoCrafterPipeline

        pipe = VideoCrafterPipeline.random_init(seed=0)
        lat = 64 // _spatial_scale(pipe.vae_cfg)
        src = jnp.ones((1, 4, lat, lat, 4)) * 0.5
        mask = jnp.ones((1, 4, lat, lat, 4))
        args = T2VArgs(prompt="x", n_prompt="", steps=3, frames=4, width=64, height=64, seed=5)
        res = pipe.infer(args, mask=mask, source_latents=src, uc_type="cfg_original")
        lat_out = np.asarray(res.latents[0])
        # mask==1 everywhere -> final latent == q_sample(src, t=0) ~= src
        assert abs(lat_out.mean() - 0.5) < 0.1


class TestTemporalAttentionParity:
    def test_relative_position_attention_matches_torch(self, rng):
        """Numerical parity of TemporalCrossAttention (incl. relative
        position score/value bias) vs a torch recompute of
        attention_temporal.py:107-144."""
        import torch

        from t2v.models.videocrafter_unet import TemporalCrossAttention

        dim, heads, dim_head, T, B = 16, 2, 8, 5, 3
        m = TemporalCrossAttention(
            query_dim=dim, heads=heads, dim_head=dim_head,
            temporal_length=T, use_relative_position=True,
        )
        x = rng.normal(size=(B, T, dim)).astype(np.float32)
        params = jax.jit(m.init)(jax.random.key(0), jnp.asarray(x))

        inner = heads * dim_head
        r = lambda *s: rng.normal(size=s).astype(np.float32) * 0.2
        wq, wk, wv = r(inner, dim), r(inner, dim), r(inner, dim)
        wo, bo = r(dim, inner), r(dim)
        tk, tv = r(2 * T + 1, dim_head), r(2 * T + 1, dim_head)
        p = dict(params["params"])
        p["to_q"] = {"kernel": jnp.asarray(wq.T)}
        p["to_k"] = {"kernel": jnp.asarray(wk.T)}
        p["to_v"] = {"kernel": jnp.asarray(wv.T)}
        p["to_out"] = {"kernel": jnp.asarray(wo.T), "bias": jnp.asarray(bo)}
        p["relative_position_k"] = {"embeddings_table": jnp.asarray(tk)}
        p["relative_position_v"] = {"embeddings_table": jnp.asarray(tv)}
        ours = np.asarray(m.apply({"params": p}, jnp.asarray(x)))

        # torch recompute (independent; mirrors the reference math)
        xt = torch.from_numpy(x)
        q = xt @ torch.from_numpy(wq).T
        k = xt @ torch.from_numpy(wk).T
        v = xt @ torch.from_numpy(wv).T
        fold = lambda t: (
            t.reshape(B, T, heads, dim_head).permute(0, 2, 1, 3)
            .reshape(B * heads, T, dim_head)
        )
        q, k, v = fold(q), fold(k), fold(v)
        scale = dim_head ** -0.5
        sim = torch.einsum("bid,bjd->bij", q, k) * scale
        idx = torch.clamp(
            torch.arange(T)[None, :] - torch.arange(T)[:, None], -T, T
        ) + T
        k2 = torch.from_numpy(tk)[idx]
        sim = sim + torch.einsum("btd,tsd->bts", q, k2) * scale
        attn = sim.softmax(dim=-1)
        out = torch.einsum("bij,bjd->bid", attn, v)
        v2 = torch.from_numpy(tv)[idx]
        out = out + torch.einsum("bts,tsd->btd", attn, v2)
        out = (
            out.reshape(B, heads, T, dim_head).permute(0, 2, 1, 3)
            .reshape(B, T, inner)
        )
        theirs = (out @ torch.from_numpy(wo).T + torch.from_numpy(bo)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    def test_fused_relpos_kernel_matches_einsum_path(self, rng):
        """The Pallas resident-layout rel-pos kernel (round-5,
        kernels/relpos_mha.py) must match the XLA einsum path it replaces
        on the frame_split contract, through the real module."""
        import dataclasses

        from t2v.core.dtypes import Policy
        from t2v.models.videocrafter_unet import TemporalCrossAttention

        dim, heads, dim_head, T, BB, N = 16, 2, 8, 5, 2, 16

        def build(backend):
            return TemporalCrossAttention(
                query_dim=dim, heads=heads, dim_head=dim_head,
                temporal_length=T, use_relative_position=True,
                frame_split=T,
                policy=dataclasses.replace(
                    Policy(), attention_backend=backend
                ),
            )

        x = jnp.asarray(rng.normal(size=(BB * T, N, dim)).astype(np.float32))
        m_ref = build("xla")
        params = jax.jit(m_ref.init)(jax.random.key(0), x)
        # perturb the zero-init projections so signal flows
        params = jax.tree.map(
            lambda a: a + 0.05 * np.float32(1.0)
            if a.size and not np.asarray(a).any() else a, params,
        )
        ref = m_ref.apply(params, x)
        out = build("fused_interpret").apply(params, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5,
            err_msg="fused relpos kernel diverges from einsum path",
        )

    def test_fused_relpos_kernel_grads_match(self, rng):
        import dataclasses

        from t2v.core.dtypes import Policy
        from t2v.models.videocrafter_unet import TemporalCrossAttention

        dim, heads, dim_head, T, BB, N = 16, 2, 8, 4, 1, 8

        def build(backend):
            return TemporalCrossAttention(
                query_dim=dim, heads=heads, dim_head=dim_head,
                temporal_length=T, use_relative_position=True,
                frame_split=T,
                policy=dataclasses.replace(
                    Policy(), attention_backend=backend
                ),
            )

        x = jnp.asarray(rng.normal(size=(BB * T, N, dim)).astype(np.float32))
        m_ref = build("xla")
        params = jax.jit(m_ref.init)(jax.random.key(0), x)
        params = jax.tree.map(
            lambda a: a + 0.05 * np.float32(1.0)
            if a.size and not np.asarray(a).any() else a, params,
        )
        g_ref = jax.grad(
            lambda p: jnp.sum(m_ref.apply(p, x) ** 2)
        )(params)
        m_k = build("fused_interpret")
        g = jax.grad(lambda p: jnp.sum(m_k.apply(p, x) ** 2))(params)
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )


class TestVCLoraLoad:
    def test_load_lora_merges(self, rng, tmp_path):
        """load_lora merges a lora_up/lora_down file into the UNet."""
        from safetensors.numpy import save_file

        from t2v.io.convert_vc import vc_module_index
        from t2v.pipeline.videocrafter import VideoCrafterPipeline

        pipe = VideoCrafterPipeline.random_init(seed=0)
        idx = vc_module_index(pipe.cfg)
        # pick a linear target from the index
        name, (fpath, kind) = next(
            (n, v) for n, v in idx.items() if v[1] == "linear"
        )
        node = pipe.unet_params["params"]
        for seg in fpath:
            node = node[seg]
        d_in, d_out = node["kernel"].shape
        sd = {
            f"{name}.lora_up.weight": rng.normal(size=(d_out, 2)).astype(np.float32),
            f"{name}.lora_down.weight": rng.normal(size=(2, d_in)).astype(np.float32),
        }
        p = str(tmp_path / "vc_lora.safetensors")
        save_file(sd, p)
        before = np.asarray(node["kernel"]).copy()
        skipped = pipe.load_lora(p, scale=0.5)
        assert skipped == []
        node2 = pipe.unet_params["params"]
        for seg in fpath:
            node2 = node2[seg]
        after = np.asarray(node2["kernel"])
        assert not np.allclose(before, after)
        expected = before + 0.5 * (sd[f"{name}.lora_up.weight"] @ sd[f"{name}.lora_down.weight"]).T
        np.testing.assert_allclose(after, expected, atol=1e-5)


class TestDiagonalGaussian:
    """sample/kl/nll/mode vs the reference formulas
    (lvdm distributions.py:5-46)."""

    def _pair(self, rng):
        mean = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
        logvar = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
        return jnp.asarray(mean), jnp.asarray(logvar)

    def test_kl_standard_and_pairwise(self, rng):
        from t2v.models.vae import DiagonalGaussian

        m, lv = self._pair(rng)
        d = DiagonalGaussian(m, lv)
        want = 0.5 * np.sum(
            np.square(np.asarray(m)) + np.exp(np.asarray(lv)) - 1.0 - np.asarray(lv),
            axis=(1, 2, 3),
        )
        np.testing.assert_allclose(np.asarray(d.kl()), want, rtol=1e-5)

        m2, lv2 = self._pair(np.random.default_rng(7))
        other = DiagonalGaussian(m2, lv2)
        v, v2 = np.exp(np.asarray(lv)), np.exp(np.asarray(lv2))
        want2 = 0.5 * np.sum(
            np.square(np.asarray(m) - np.asarray(m2)) / v2
            + v / v2 - 1.0 - np.asarray(lv) + np.asarray(lv2),
            axis=(1, 2, 3),
        )
        np.testing.assert_allclose(np.asarray(d.kl(other)), want2, rtol=1e-5)

    def test_nll_and_sample(self, rng):
        from t2v.models.vae import DiagonalGaussian

        m, lv = self._pair(rng)
        d = DiagonalGaussian(m, lv)
        x = jnp.asarray(rng.normal(size=m.shape).astype(np.float32))
        want = 0.5 * np.sum(
            np.log(2 * np.pi) + np.asarray(lv)
            + np.square(np.asarray(x) - np.asarray(m)) / np.exp(np.asarray(lv)),
            axis=(1, 2, 3),
        )
        np.testing.assert_allclose(np.asarray(d.nll(x)), want, rtol=1e-5)

        noise = jnp.ones_like(m)
        np.testing.assert_allclose(
            np.asarray(d.sample(noise=noise)),
            np.asarray(m) + np.exp(0.5 * np.asarray(lv)),
            rtol=1e-5,
        )
        det = DiagonalGaussian(m, lv, deterministic=True)
        np.testing.assert_array_equal(np.asarray(det.sample(noise=noise)), np.asarray(m))
        assert np.all(np.asarray(det.kl()) == 0)


class TestFPSConditioning:
    """cond_stage2 FPS conditioning (reference sample_utils.py:65-71):
    cond_fps → FPSEmbedder → temporal_context in the cond dict → routed to
    the UNet (the reference UNet swallows the kwarg, openaimodel3d.py:632;
    ours adds it to the time embedding so it is functional)."""

    def _fps_pipe(self):
        import dataclasses

        import jax

        from t2v.models.videocrafter_unet import VideoCrafterUNetConfig

        cfg = dataclasses.replace(
            VideoCrafterUNetConfig().tiny(), cond_stage2_key="temporal_context"
        )
        pipe = VideoCrafterPipeline.random_init(cfg=cfg)
        # zero-init gates block signal flow at random init
        pipe.unet_params = jax.tree.map(
            lambda a: a + 0.01 if a.size and not np.asarray(a).any() else a,
            pipe.unet_params,
        )
        return pipe

    def test_cond_fps_changes_output(self):
        pipe = self._fps_pipe()
        args = T2VArgs(
            prompt="a cat", n_prompt="bad", steps=3, frames=2,
            width=32, height=32, seed=5,
        )
        a = pipe.infer(args.replace(cond_fps=8))
        b = pipe.infer(args.replace(cond_fps=30))
        same = pipe.infer(args.replace(cond_fps=8))
        assert not np.allclose(
            np.asarray(a.latents), np.asarray(b.latents)
        ), "cond_fps is inert"
        np.testing.assert_allclose(
            np.asarray(a.latents), np.asarray(same.latents), atol=1e-6
        )

    def test_missing_cond_fps_raises(self):
        pipe = self._fps_pipe()
        args = T2VArgs(
            prompt="x", steps=2, frames=2, width=32, height=32, seed=1
        )
        with pytest.raises(ValueError, match="FPS-conditioned"):
            pipe.infer(args)

    def test_unconditioned_model_ignores_cond_fps(self):
        pipe = VideoCrafterPipeline.random_init()
        args = T2VArgs(
            prompt="x", steps=2, frames=2, width=32, height=32, seed=1,
            cond_fps=12,
        )
        res = pipe.infer(args)  # no cond_stage2 → cond_fps is ignored
        assert len(res.frames) == 2

    def test_yaml_declares_cond_stage2(self):
        from t2v.models.videocrafter_unet import VideoCrafterUNetConfig

        yaml_cfg = {
            "model": {
                "params": {
                    "unet_config": {
                        "params": {
                            "in_channels": 4, "out_channels": 4,
                            "model_channels": 32, "num_res_blocks": 1,
                            "attention_resolutions": [1],
                            "channel_mult": [1, 2], "num_heads": 2,
                            "context_dim": 32,
                        }
                    },
                    "cond_stage2_config": {"target": "lvdm...FPSEmbedder"},
                }
            }
        }
        cfg = VideoCrafterUNetConfig.from_yaml_dict(yaml_cfg)
        assert cfg.cond_stage2_key == "temporal_context"

    def test_router_forwards_temporal_context(self):
        import jax.numpy as jnp

        from t2v.models.conditioning import route_conditioning

        x = jnp.zeros((1, 2, 4, 4, 4))
        tc = jnp.ones((1, 8))
        cond = {
            "c_concat": [jnp.zeros((1, 2, 4, 4, 4))],
            "c_crossattn": [jnp.zeros((1, 77, 32))],
            "s": jnp.asarray([8]),
            "temporal_context": tc,
        }
        x2, kw = route_conditioning("hybrid-time", x, cond)
        assert kw["temporal_context"] is tc
        assert x2.shape[-1] == 8

    def test_windowed_paths_carry_fps(self):
        """The DDIM window and DPM++ window jits take the fps embedding as
        a real argument (no constant-baking, no cache collisions)."""
        from t2v.core.state import JobState

        pipe = self._fps_pipe()
        args = T2VArgs(
            prompt="a cat", n_prompt="bad", steps=4, frames=2,
            width=32, height=32, seed=5, cond_fps=16,
        )
        ref = pipe.infer(args)
        st = JobState()
        st.begin_job(0, 1, 4)
        out = pipe.infer(
            args, callback=st.step_callback, callback_interval=2
        )
        np.testing.assert_allclose(
            np.asarray(out.latents), np.asarray(ref.latents), atol=1e-4
        )
        # a different fps through the SAME cached executables must differ
        out2 = pipe.infer(
            args.replace(cond_fps=2),
            callback=st.step_callback, callback_interval=2,
        )
        assert not np.allclose(np.asarray(out.latents), np.asarray(out2.latents))


class TestVCKeepInVramRetention:
    """'Main Model Only' must apply to the VideoCrafter family too — the
    reference's 3-state option is per-run, not per-family (render.py:40-43).
    Round-4 review: the release sites were gated on ModelScopePipeline, so
    VC requests silently retained everything."""

    def _saved_pipe(self, tmp_path):
        from t2v.io.orbax_io import save_native

        pipe = VideoCrafterPipeline.random_init()
        pipe.unet_params = jax.tree.map(
            lambda a: a + 0.01 if a.size and not np.asarray(a).any() else a,
            pipe.unet_params,
        )
        out = save_native(
            str(tmp_path / "native"),
            unet_params=pipe.unet_params, vae_params=pipe.vae_params,
            clip_params=pipe.clip_params, unet_cfg=pipe.cfg,
            vae_cfg=pipe.vae_cfg, clip_cfg=pipe.clip_cfg,
            model_family="videocrafter",
        )
        pipe.model_dir = out
        return pipe

    def test_release_and_partial_reload(self, tmp_path):
        pipe = self._saved_pipe(tmp_path)
        before = jax.tree.leaves(pipe.vae_params)[0]
        pipe.release_aux()
        assert pipe.vae_params is None and pipe.clip_params is None
        assert pipe._decode_fn is None and pipe._encode_text_fn is None
        assert pipe.unet_params is not None
        pipe.reload_aux()
        assert pipe.vae_params is not None and pipe.clip_params is not None
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(pipe.vae_params)[0], np.float32),
            np.asarray(before, np.float32),
        )

    def test_random_init_release_then_reload_raises(self):
        pipe = VideoCrafterPipeline.random_init()
        pipe.release_aux()
        with pytest.raises(ValueError, match="Main Model Only"):
            pipe.reload_aux()

    def test_run_main_model_only_releases_vc_aux(self, tmp_path):
        import t2v.pipeline.run as run_mod
        from t2v.core.config import T2VOutputArgs
        from t2v.pipeline.run import run

        pipe = self._saved_pipe(tmp_path)
        args = T2VArgs(
            model_type="VideoCrafter", prompt="x", steps=2, frames=2,
            width=32, height=32, seed=4,
        )
        out = T2VOutputArgs(fps=4, skip_video_creation=True)
        saved_warm = run_mod._warm_pipe
        try:
            r1 = run(args, out, pipe=pipe, outdir=str(tmp_path / "a"),
                     callback_interval=None, keep_in_vram="Main Model Only")
            assert r1.frame_dirs
            assert pipe.vae_params is None and pipe.clip_params is None
            assert pipe.unet_params is not None
            assert run_mod._warm_pipe is pipe

            # warm reuse: aux reloads from the native dir, runs, re-drops
            r2 = run(args.replace(model=None, seed=5), out,
                     outdir=str(tmp_path / "b"), callback_interval=None,
                     keep_in_vram="Main Model Only")
            assert r2.frame_dirs
            assert pipe.vae_params is None  # dropped again post-run
        finally:
            run_mod._warm_pipe = saved_warm
