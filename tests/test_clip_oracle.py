"""Hardening of the CLIP parity oracle (round-2 verdict weak #5).

The full-scale text-tower golden is produced by a builder-authored torch
class (tools/parity/gen_checkpoints.py::OpenClipTextModel) because
open_clip itself is not installable in this image
(clip_hardcode.py:74 loads ``open_clip``'s ViT-H-14 text half). A shared
misreading of open_clip's semantics would pass that golden. These tests
break the self-reference with two independent checks:

1. the oracle's attention — torch ``nn.MultiheadAttention`` — is
   dissected into explicit q/k/v math (packed ``in_proj`` split, 1/√d
   scale, additive causal mask, per-head softmax, ``out_proj``) and
   cross-checked against ``torch.nn.functional.
   multi_head_attention_forward`` directly;
2. a tiny tower is computed by a THIRD implementation written here in
   NumPy straight from open_clip's published algorithm (documented
   below), and the torch oracle AND the flax tower (through the real
   ``convert_open_clip_text`` converter) must both match it.

open_clip text-tower algorithm (model.py of mlfoundations/open_clip,
``Transformer``/``ResidualAttentionBlock`` + CLIP.encode_text; mirrored
by the reference's encode_with_transformer, clip_hardcode.py:255-274):

    x = token_embedding[tokens] + positional_embedding
    for each block:                       # pre-LN residual
        x = x + MHA(ln_1(x), causal additive -inf upper-tri mask)
        x = x + c_proj(gelu_exact(c_fc(ln_2(x))))
    x = ln_final(x)          # penultimate towers stop one block early

MHA (torch F.multi_head_attention_forward, batch_first=False semantics):
    q, k, v = split(x @ in_proj_weight.T + in_proj_bias, 3)
    per head: softmax(q @ k.T / sqrt(head_dim) + mask) @ v
    out = concat_heads @ out_proj.weight.T + out_proj.bias
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

WIDTH, HEADS, CTX, VOCAB, LAYERS = 8, 2, 5, 16, 2


def _np_layernorm(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _np_gelu(x):
    from scipy.special import erf  # available via scipy? fall back below

    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def _gelu(x):
    try:
        return _np_gelu(x)
    except ImportError:
        # exact erf via math, elementwise (tiny tensors)
        import math

        v = np.vectorize(lambda t: 0.5 * t * (1.0 + math.erf(t / math.sqrt(2.0))))
        return v(x).astype(x.dtype)


def _np_mha(x, in_w, in_b, out_w, out_b, heads, mask):
    """Explicit q/k/v attention on (L, D) — the dissected
    nn.MultiheadAttention math."""
    L, D = x.shape
    dh = D // heads
    qkv = x @ in_w.T + in_b
    q, k, v = np.split(qkv, 3, axis=-1)
    outs = []
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = (q[:, sl] @ k[:, sl].T) / np.sqrt(dh) + mask
        s = s - s.max(-1, keepdims=True)
        p = np.exp(s)
        p = p / p.sum(-1, keepdims=True)
        outs.append(p @ v[:, sl])
    return np.concatenate(outs, axis=-1) @ out_w.T + out_b


def _causal(n):
    m = np.zeros((n, n), np.float32)
    m[np.triu_indices(n, 1)] = -np.inf
    return m


class TestDissectedMHA:
    def test_explicit_qkv_matches_torch_functional(self):
        """The oracle relies on nn.MultiheadAttention; prove the explicit
        q/k/v formulation above IS what torch computes (packed in_proj,
        scale, additive mask, out_proj)."""
        rng = np.random.default_rng(0)
        x = rng.normal(size=(CTX, WIDTH)).astype(np.float32)
        in_w = rng.normal(size=(3 * WIDTH, WIDTH)).astype(np.float32) * 0.2
        in_b = rng.normal(size=(3 * WIDTH,)).astype(np.float32) * 0.1
        out_w = rng.normal(size=(WIDTH, WIDTH)).astype(np.float32) * 0.2
        out_b = rng.normal(size=(WIDTH,)).astype(np.float32) * 0.1
        mask = _causal(CTX)

        want = _np_mha(x, in_w, in_b, out_w, out_b, HEADS, mask)

        tx = torch.from_numpy(x)[:, None]  # (L, N=1, D)
        got, _ = torch.nn.functional.multi_head_attention_forward(
            tx, tx, tx, WIDTH, HEADS,
            torch.from_numpy(in_w), torch.from_numpy(in_b),
            None, None, False, 0.0,
            torch.from_numpy(out_w), torch.from_numpy(out_b),
            need_weights=False,
            attn_mask=torch.from_numpy(mask),
        )
        np.testing.assert_allclose(
            got[:, 0].detach().numpy(), want, atol=1e-5
        )


def _tiny_state_dict(rng):
    """open_clip-layout state dict for the tiny tower (the exact key
    names clip_hardcode.py loads and our converter consumes)."""
    sd = {}
    t = lambda *s: torch.from_numpy(rng.normal(size=s).astype(np.float32) * 0.2)
    sd["token_embedding.weight"] = t(VOCAB, WIDTH)
    sd["positional_embedding"] = t(CTX, WIDTH)
    for i in range(LAYERS):
        p = f"transformer.resblocks.{i}"
        sd[f"{p}.ln_1.weight"] = 1.0 + t(WIDTH) * 0.1
        sd[f"{p}.ln_1.bias"] = t(WIDTH)
        sd[f"{p}.attn.in_proj_weight"] = t(3 * WIDTH, WIDTH)
        sd[f"{p}.attn.in_proj_bias"] = t(3 * WIDTH)
        sd[f"{p}.attn.out_proj.weight"] = t(WIDTH, WIDTH)
        sd[f"{p}.attn.out_proj.bias"] = t(WIDTH)
        sd[f"{p}.ln_2.weight"] = 1.0 + t(WIDTH) * 0.1
        sd[f"{p}.ln_2.bias"] = t(WIDTH)
        sd[f"{p}.mlp.c_fc.weight"] = t(4 * WIDTH, WIDTH)
        sd[f"{p}.mlp.c_fc.bias"] = t(4 * WIDTH)
        sd[f"{p}.mlp.c_proj.weight"] = t(WIDTH, 4 * WIDTH)
        sd[f"{p}.mlp.c_proj.bias"] = t(WIDTH)
    sd["ln_final.weight"] = 1.0 + t(WIDTH) * 0.1
    sd["ln_final.bias"] = t(WIDTH)
    return sd


def _np_tower(sd, tokens, penultimate):
    """THIRD implementation: NumPy, straight from open_clip's published
    algorithm (module docstring) — no torch, no flax."""
    g = lambda k: sd[k].numpy()
    x = g("token_embedding.weight")[tokens] + g("positional_embedding")
    mask = _causal(x.shape[0])
    n = LAYERS - (1 if penultimate else 0)
    for i in range(n):
        p = f"transformer.resblocks.{i}"
        h = _np_layernorm(x, g(f"{p}.ln_1.weight"), g(f"{p}.ln_1.bias"))
        x = x + _np_mha(
            h,
            g(f"{p}.attn.in_proj_weight"), g(f"{p}.attn.in_proj_bias"),
            g(f"{p}.attn.out_proj.weight"), g(f"{p}.attn.out_proj.bias"),
            HEADS, mask,
        )
        h = _np_layernorm(x, g(f"{p}.ln_2.weight"), g(f"{p}.ln_2.bias"))
        h = _gelu(h @ g(f"{p}.mlp.c_fc.weight").T + g(f"{p}.mlp.c_fc.bias"))
        x = x + h @ g(f"{p}.mlp.c_proj.weight").T + g(f"{p}.mlp.c_proj.bias")
    return _np_layernorm(x, g("ln_final.weight"), g("ln_final.bias"))


class TestTinyTowerTripleCheck:
    @pytest.fixture()
    def sd(self):
        return _tiny_state_dict(np.random.default_rng(7))

    @pytest.fixture()
    def tokens(self):
        return np.array([1, 7, 3, 11, 2], np.int64)

    @pytest.mark.parametrize("penultimate", [True, False])
    def test_flax_tower_matches_numpy_derivation(self, sd, tokens, penultimate):
        import dataclasses

        from t2v.core.config import CLIPTextConfig
        from t2v.text.clip import CLIPTextTransformer, convert_open_clip_text

        want = _np_tower(sd, tokens, penultimate)
        cfg = dataclasses.replace(
            CLIPTextConfig(),
            vocab_size=VOCAB, width=WIDTH, layers=LAYERS, heads=HEADS,
            context_length=CTX,
            layer="penultimate" if penultimate else "last",
        )
        params = convert_open_clip_text(
            {k: v.numpy() for k, v in sd.items()}, cfg
        )
        model = CLIPTextTransformer(cfg=cfg)
        got = model.apply(params, jnp.asarray(tokens)[None])
        np.testing.assert_allclose(np.asarray(got[0]), want, atol=2e-5)

    @pytest.mark.parametrize("penultimate", [True, False])
    def test_torch_oracle_matches_numpy_derivation(self, sd, tokens, penultimate):
        """The builder-authored torch oracle class itself is pinned to the
        independent NumPy derivation — it is no longer the sole authority
        on open_clip semantics."""
        sys.path.insert(
            0, os.path.join(os.path.dirname(__file__), "..", "tools", "parity")
        )
        try:
            from gen_checkpoints import OpenClipTextModel
        finally:
            sys.path.pop(0)

        want = _np_tower(sd, tokens, penultimate)
        oracle = OpenClipTextModel(
            width=WIDTH, layers=LAYERS, heads=HEADS, ctx=CTX, vocab=VOCAB
        ).eval()
        missing, unexpected = oracle.load_state_dict(sd, strict=False)
        # only the projection/logit extras may be absent from the tiny dict
        assert all(
            k in ("text_projection", "logit_scale") for k in missing
        ) and not unexpected
        got = oracle.encode(
            torch.from_numpy(tokens)[None], penultimate=penultimate
        )
        np.testing.assert_allclose(
            got[0].detach().numpy(), want, atol=2e-5
        )
