"""Flax CLIP text transformer (OpenCLIP ViT-H-14 / CLIP-L architectures).

Covers both text towers the reference uses:
  * ModelScope: OpenCLIP ViT-H-14, width 1024 / 24 layers / 16 heads,
    penultimate layer output then ln_final (clip_hardcode.py:59-90,270-276);
  * VideoCrafter: HF CLIP-L (quick_gelu, last hidden state,
    lvdm condition_modules.py:15-40).

"Penultimate" is realised structurally: the module instantiates
``layers - 1`` blocks and the converter drops the final block's weights —
no runtime branch. Causal masking is a static additive mask. QKV is one
packed Dense per block, mirroring torch MultiheadAttention's
``in_proj_weight`` so conversion is a single transpose.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from t2v.core.config import CLIPTextConfig
from t2v.core.dtypes import Policy


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    cfg: CLIPTextConfig
    policy: Policy = Policy()

    @nn.compact
    def __call__(self, x, mask):
        cfg, p = self.cfg, self.policy
        width = cfg.width
        head_dim = width // cfg.heads
        ln = lambda name: nn.LayerNorm(
            epsilon=1e-5, name=name, dtype=jnp.float32, param_dtype=p.param_dtype
        )
        dense = lambda feats, name: nn.Dense(
            feats, name=name, dtype=p.compute_dtype, param_dtype=p.param_dtype
        )

        h = ln("ln_1")(x).astype(x.dtype)
        qkv = dense(3 * width, "in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, s, _ = q.shape
        fold = lambda t: t.reshape(b, s, cfg.heads, head_dim).transpose(0, 2, 1, 3)
        q, k, v = fold(q), fold(k), fold(v)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (head_dim**-0.5)
        scores = scores + mask
        attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, width)
        x = x + dense(width, "out_proj")(out)

        h = ln("ln_2")(x).astype(x.dtype)
        h = dense(4 * width, "c_fc")(h)
        act = _quick_gelu if cfg.act == "quick_gelu" else (
            lambda v: jax.nn.gelu(v.astype(jnp.float32), approximate=False).astype(v.dtype)
        )
        h = act(h)
        x = x + dense(width, "c_proj")(h)
        return x


class CLIPTextTransformer(nn.Module):
    """apply(params, tokens) -> (B, 77, width) hidden states.

    Output is post-ln_final at the configured layer depth (penultimate
    towers simply have one fewer block instantiated).
    """

    cfg: CLIPTextConfig
    policy: Policy = Policy()

    @property
    def effective_layers(self) -> int:
        return self.cfg.layers - (1 if self.cfg.layer == "penultimate" else 0)

    @nn.compact
    def __call__(self, tokens, input_embeddings=None):
        cfg, p = self.cfg, self.policy
        embed = nn.Embed(
            cfg.vocab_size, cfg.width, name="token_embedding",
            param_dtype=p.param_dtype, dtype=p.compute_dtype,
        )
        if input_embeddings is None:
            x = embed(tokens)
        else:
            # textual-inversion path: caller spliced embedding rows
            x = input_embeddings.astype(p.compute_dtype)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (cfg.context_length, cfg.width),
            p.param_dtype,
        )
        x = x + pos[None, : x.shape[1]].astype(x.dtype)

        mask = jnp.triu(
            jnp.full((x.shape[1], x.shape[1]), -jnp.inf, jnp.float32), k=1
        )
        for i in range(self.effective_layers):
            x = ResidualAttentionBlock(cfg=cfg, policy=p, name=f"resblock_{i}")(x, mask)

        x = nn.LayerNorm(
            epsilon=1e-5, name="ln_final", dtype=jnp.float32, param_dtype=p.param_dtype
        )(x).astype(x.dtype)
        return x


def convert_open_clip_text(sd, cfg: CLIPTextConfig) -> dict:
    """open_clip state_dict (visual tower ignored/deleted, matching the
    reference clip_hardcode.py:74-77) → flax params."""
    params = {
        "token_embedding": {"embedding": sd["token_embedding.weight"]},
        "positional_embedding": sd["positional_embedding"],
        "ln_final": {"scale": sd["ln_final.weight"], "bias": sd["ln_final.bias"]},
    }
    n_layers = cfg.layers - (1 if cfg.layer == "penultimate" else 0)
    for i in range(n_layers):
        tp = f"transformer.resblocks.{i}"
        params[f"resblock_{i}"] = {
            "ln_1": {"scale": sd[f"{tp}.ln_1.weight"], "bias": sd[f"{tp}.ln_1.bias"]},
            "ln_2": {"scale": sd[f"{tp}.ln_2.weight"], "bias": sd[f"{tp}.ln_2.bias"]},
            "in_proj": {
                "kernel": np.ascontiguousarray(sd[f"{tp}.attn.in_proj_weight"].T),
                "bias": sd[f"{tp}.attn.in_proj_bias"],
            },
            "out_proj": {
                "kernel": np.ascontiguousarray(sd[f"{tp}.attn.out_proj.weight"].T),
                "bias": sd[f"{tp}.attn.out_proj.bias"],
            },
            "c_fc": {
                "kernel": np.ascontiguousarray(sd[f"{tp}.mlp.c_fc.weight"].T),
                "bias": sd[f"{tp}.mlp.c_fc.bias"],
            },
            "c_proj": {
                "kernel": np.ascontiguousarray(sd[f"{tp}.mlp.c_proj.weight"].T),
                "bias": sd[f"{tp}.mlp.c_proj.bias"],
            },
        }
    return {"params": params}


def convert_hf_clip_text(sd, cfg: CLIPTextConfig) -> dict:
    """HF CLIPTextModel state_dict (text_model.* keys) → flax params.

    Used for the VideoCrafter FrozenCLIPEmbedder
    (condition_modules.py:15-40, last_hidden_state)."""
    pre = "text_model."
    params = {
        "token_embedding": {"embedding": sd[f"{pre}embeddings.token_embedding.weight"]},
        "positional_embedding": sd[f"{pre}embeddings.position_embedding.weight"],
        "ln_final": {
            "scale": sd[f"{pre}final_layer_norm.weight"],
            "bias": sd[f"{pre}final_layer_norm.bias"],
        },
    }
    for i in range(cfg.layers):
        tp = f"{pre}encoder.layers.{i}"
        qkv_w = np.concatenate(
            [sd[f"{tp}.self_attn.{n}_proj.weight"] for n in ("q", "k", "v")], axis=0
        )
        qkv_b = np.concatenate(
            [sd[f"{tp}.self_attn.{n}_proj.bias"] for n in ("q", "k", "v")], axis=0
        )
        params[f"resblock_{i}"] = {
            "ln_1": {"scale": sd[f"{tp}.layer_norm1.weight"], "bias": sd[f"{tp}.layer_norm1.bias"]},
            "ln_2": {"scale": sd[f"{tp}.layer_norm2.weight"], "bias": sd[f"{tp}.layer_norm2.bias"]},
            "in_proj": {"kernel": np.ascontiguousarray(qkv_w.T), "bias": qkv_b},
            "out_proj": {
                "kernel": np.ascontiguousarray(sd[f"{tp}.self_attn.out_proj.weight"].T),
                "bias": sd[f"{tp}.self_attn.out_proj.bias"],
            },
            "c_fc": {
                "kernel": np.ascontiguousarray(sd[f"{tp}.mlp.fc1.weight"].T),
                "bias": sd[f"{tp}.mlp.fc1.bias"],
            },
            "c_proj": {
                "kernel": np.ascontiguousarray(sd[f"{tp}.mlp.fc2.weight"].T),
                "bias": sd[f"{tp}.mlp.fc2.bias"],
            },
        }
    return {"params": params}
