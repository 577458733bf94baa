"""UNetSD structural tests: topology, converter round-trip, forward smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2v.core.config import ModelScopeUNetConfig
from t2v.io.convert import convert_unet
from t2v.models.modelscope_unet import UNetSD, build_topology

CFG = ModelScopeUNetConfig().tiny()


def make_torch_sd(cfg, rng):
    """Synthesize a torch-layout state_dict with the reference's key names
    (UNetSD module definitions, t2v_model.py:98-326). Written from the torch
    side independently of the converter so key-name typos are caught."""
    sd = {}
    r = lambda *s: rng.normal(size=s).astype(np.float32) * 0.05

    def linear(p, dout, din):
        sd[f"{p}.weight"] = r(dout, din)
        sd[f"{p}.bias"] = r(dout)

    def linear_nb(p, dout, din):
        sd[f"{p}.weight"] = r(dout, din)

    def conv2d(p, dout, din, k=3):
        sd[f"{p}.weight"] = r(dout, din, k, k)
        sd[f"{p}.bias"] = r(dout)

    def conv1d(p, dout, din):
        sd[f"{p}.weight"] = r(dout, din, 1)
        sd[f"{p}.bias"] = r(dout)

    def conv3d_t(p, dout, din):
        sd[f"{p}.weight"] = r(dout, din, 3, 1, 1)
        sd[f"{p}.bias"] = r(dout)

    def norm(p, c):
        sd[f"{p}.weight"] = r(c)
        sd[f"{p}.bias"] = r(c)

    def btb(p, dim, ctx_dim):
        inner = dim
        for attn, cd in (("attn1", dim), ("attn2", ctx_dim if ctx_dim else dim)):
            linear_nb(f"{p}.{attn}.to_q", inner, dim)
            linear_nb(f"{p}.{attn}.to_k", inner, cd)
            linear_nb(f"{p}.{attn}.to_v", inner, cd)
            linear(f"{p}.{attn}.to_out.0", dim, inner)
        for n in ("norm1", "norm2", "norm3"):
            norm(f"{p}.{n}", dim)
        linear(f"{p}.ff.net.0.proj", dim * 8, dim)
        linear(f"{p}.ff.net.2", dim, dim * 4)

    def spatial(p, c):
        norm(f"{p}.norm", c)
        linear(f"{p}.proj_in", c, c)
        btb(f"{p}.transformer_blocks.0", c, cfg.context_dim)
        linear(f"{p}.proj_out", c, c)

    def temporal(p, c):
        norm(f"{p}.norm", c)
        conv1d(f"{p}.proj_in", c, c)
        btb(f"{p}.transformer_blocks.0", c, None)
        conv1d(f"{p}.proj_out", c, c)

    def res(p, cin, cout):
        norm(f"{p}.in_layers.0", cin)
        conv2d(f"{p}.in_layers.2", cout, cin)
        linear(f"{p}.emb_layers.1", cout, cfg.embed_dim)
        norm(f"{p}.out_layers.0", cout)
        conv2d(f"{p}.out_layers.3", cout, cout)
        if cin != cout:
            conv2d(f"{p}.skip_connection", cout, cin, k=1)
        for i in range(1, 5):
            ci = 2 if i == 1 else 3
            norm(f"{p}.temopral_conv.conv{i}.0", cout)
            conv3d_t(f"{p}.temopral_conv.conv{i}.{ci}", cout, cout)

    linear("time_embed.0", cfg.embed_dim, cfg.dim)
    linear("time_embed.2", cfg.embed_dim, cfg.embed_dim)
    norm("out.0", cfg.dim)
    conv2d("out.2", cfg.out_dim, cfg.dim)

    topo = build_topology(cfg)
    for entry in (*topo.encoder, topo.middle, *topo.decoder):
        for d in entry:
            if d.kind == "conv_in":
                conv2d(d.torch_path, d.out_ch, d.in_ch)
            elif d.kind == "res":
                res(d.torch_path, d.in_ch, d.out_ch)
            elif d.kind == "spatial":
                spatial(d.torch_path, d.out_ch)
            elif d.kind == "temporal":
                temporal(d.torch_path, d.out_ch)
            elif d.kind == "downsample":
                conv2d(f"{d.torch_path}.op", d.out_ch, d.out_ch)
            elif d.kind == "upsample":
                conv2d(f"{d.torch_path}.conv", d.out_ch, d.out_ch)
    return sd


def tree_shapes(tree):
    return jax.tree.map(lambda x: tuple(x.shape), tree)


class TestTopology:
    def test_tiny_counts(self):
        topo = build_topology(CFG)
        # dim_mult (1,2): 1 init + 2 scales x 1 res + 1 downsample = 4
        assert len(topo.encoder) == 4
        assert len(topo.decoder) == (CFG.num_res_blocks + 1) * len(CFG.dim_mult)

    def test_full_modelscope_config(self):
        cfg = ModelScopeUNetConfig()
        topo = build_topology(cfg)
        # 1 init + 4 scales * 2 res + 3 downsamples = 12 input entries
        assert len(topo.encoder) == 12
        assert len(topo.decoder) == 12
        assert topo.encoder[-1][0].kind == "res"  # last scale has no downsample
        # attention present at scales 1, 1/2, 1/4 but not 1/8
        last_scale_entry = topo.encoder[-1]
        assert all(d.kind != "spatial" for d in last_scale_entry)

    def test_torch_indices_are_dense(self):
        topo = build_topology(ModelScopeUNetConfig())
        enc_ids = [int(e[0].torch_path.split(".")[1]) for e in topo.encoder]
        assert enc_ids == list(range(12))
        dec_ids = [int(e[0].torch_path.split(".")[1]) for e in topo.decoder]
        assert dec_ids == list(range(12))


class TestConverter:
    def test_roundtrip_structure_and_forward(self, rng):
        sd = make_torch_sd(CFG, rng)
        converted = convert_unet(sd, CFG)

        m = UNetSD(cfg=CFG)
        x = jnp.zeros((1, 3, 16, 16, CFG.in_dim))
        t = jnp.full((1,), 100.0)
        ctx = jnp.asarray(rng.normal(size=(1, 7, CFG.context_dim)).astype(np.float32))
        ref_params = jax.jit(m.init)(jax.random.key(0), x, t, ctx)

        assert tree_shapes(ref_params) == tree_shapes(converted), (
            "converted param tree structure/shapes differ from flax init"
        )

        out = jax.jit(m.apply)(converted, x, t, ctx)
        assert out.shape == (1, 3, 16, 16, CFG.out_dim)
        assert np.isfinite(np.asarray(out)).all()
        # nonzero input path: conditioned output responds to context
        out2 = jax.jit(m.apply)(converted, x, t, ctx * 2.0)
        assert not np.allclose(np.asarray(out), np.asarray(out2))

    def test_all_torch_keys_consumed(self, rng):
        """Every key in the synthetic state_dict must be read by the
        converter — catches silently-dropped weights."""
        sd = make_torch_sd(CFG, rng)
        touched = set()

        class Recorder(dict):
            def __getitem__(self, k):
                touched.add(k)
                return dict.__getitem__(self, k)

        convert_unet(Recorder(sd), CFG)
        missed = set(sd) - touched
        assert not missed, f"converter never read: {sorted(missed)[:10]}"


class TestForward:
    def test_zero_init_head_gives_zero_eps(self):
        m = UNetSD(cfg=CFG)
        x = jnp.ones((1, 2, 8, 8, CFG.in_dim))
        t = jnp.full((1,), 10.0)
        ctx = jnp.ones((1, 5, CFG.context_dim))
        params = jax.jit(m.init)(jax.random.key(1), x, t, ctx)
        out = jax.jit(m.apply)(params, x, t, ctx)
        # head conv is zero-init (t2v_model.py:325-326)
        assert np.allclose(np.asarray(out), 0.0)

    def test_batch_frames_shapes(self):
        m = UNetSD(cfg=CFG)
        x = jnp.zeros((2, 5, 8, 8, CFG.in_dim))
        t = jnp.full((2,), 10.0)
        ctx = jnp.zeros((2, 5, CFG.context_dim))
        params = jax.jit(m.init)(jax.random.key(1), x, t, ctx)
        out = m.apply(params, x, t, ctx)
        assert out.shape == (2, 5, 8, 8, CFG.out_dim)
