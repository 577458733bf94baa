"""LVDM LoRA utility zoo: factor algebra, safeloras container, patch_pipe.

Semantics pinned against the reference wrapper's forward
``W x + up(selector(down(x))) * scale`` (lvdm lora.py:51-56) by an
independent torch recompute, and the safeloras container layout against
lora.py:452-617.
"""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from t2v.core.config import ModelScopeUNetConfig
from t2v.models.modelscope_unet import UNetSD
from t2v.pipeline.lora import apply_lora, init_lora, unet_module_index
from t2v.pipeline.lora_zoo import (
    EMBED_FLAG,
    add_lora,
    collapse_lora,
    effective_delta,
    flat_weights_to_lora,
    inspect_lora,
    lora_module_order,
    lora_to_flat_weights,
    parse_safeloras,
    parse_safeloras_embeds,
    patch_safeloras,
    save_all,
    save_safeloras_with_embeds,
    set_lora_diag,
    tune_lora_scale,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = ModelScopeUNetConfig().tiny()
    model = UNetSD(cfg=cfg)
    x = jnp.zeros((1, 2, 8, 8, cfg.in_dim))
    params = jax.jit(model.init)(
        jax.random.key(0), x, jnp.zeros((1,)), jnp.zeros((1, 7, cfg.context_dim))
    )
    idx = unet_module_index(cfg)
    key = jax.random.key(1)
    lora = init_lora(params, idx, rank=2, key=key)
    # perturb B so deltas are non-zero
    k = jax.random.key(2)
    lora = {
        n: {
            "lora_A": ab["lora_A"],
            "lora_B": jax.random.normal(jax.random.fold_in(k, i), ab["lora_B"].shape) * 0.1,
        }
        for i, (n, ab) in enumerate(lora.items())
    }
    return cfg, params, idx, lora


class TestFactorAlgebra:
    def test_scale_and_diag_match_torch_wrapper_forward(self):
        """effective_delta == the reference wrapper's forward delta,
        recomputed independently in torch (lvdm lora.py:51-56)."""
        import torch

        rng = np.random.default_rng(0)
        d_in, r, d_out = 6, 3, 5
        A = rng.standard_normal((d_in, r)).astype(np.float32)   # down.T
        B = rng.standard_normal((r, d_out)).astype(np.float32)  # up.T
        diag = rng.standard_normal(r).astype(np.float32)
        scale = 0.7
        x = rng.standard_normal((4, d_in)).astype(np.float32)

        down = torch.nn.Linear(d_in, r, bias=False)
        up = torch.nn.Linear(r, d_out, bias=False)
        with torch.no_grad():
            down.weight.copy_(torch.from_numpy(A.T))
            up.weight.copy_(torch.from_numpy(B.T))
            sel = torch.diag(torch.from_numpy(diag))
            y_ref = (up(torch.nn.functional.linear(down(torch.from_numpy(x)), sel)) * scale).numpy()

        ab = {"lora_A": A, "lora_B": B, "diag": diag, "scale": scale}
        np.testing.assert_allclose(x @ effective_delta(ab), y_ref, rtol=1e-5, atol=1e-5)

    def test_apply_lora_honours_scale_and_diag(self, tiny):
        _, params, idx, lora = tiny
        scaled = tune_lora_scale(lora, 0.5)
        diag = np.asarray([2.0, 0.0], np.float32)
        tuned = set_lora_diag(scaled, diag)
        merged = apply_lora(params, tuned, idx)
        name = next(iter(lora))
        fpath, _ = idx[name]
        base = params["params"]
        new = merged["params"]
        for seg in fpath:
            base, new = base[seg], new[seg]
        got = np.asarray(new["kernel"]) - np.asarray(base["kernel"])
        np.testing.assert_allclose(
            got, effective_delta(tuned[name]), rtol=1e-4, atol=1e-5
        )

    def test_set_lora_diag_rank_mismatch(self, tiny):
        *_, lora = tiny
        with pytest.raises(ValueError, match="diag shape"):
            set_lora_diag(lora, np.ones(3, np.float32))

    def test_collapse_ignores_runtime_scale(self, tiny):
        """collapse_lora reads raw factors like the reference (:776-810),
        not the runtime scale/selector."""
        _, params, idx, lora = tiny
        plain = collapse_lora(params, lora, idx, alpha=1.0)
        scaled = collapse_lora(params, tune_lora_scale(lora, 0.1), idx, alpha=1.0)
        for a, b in zip(jax.tree.leaves(plain), jax.tree.leaves(scaled)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_flat_weights_roundtrip(self, tiny):
        *_, idx, lora = tiny
        order = [n for n in lora_module_order(idx) if n in lora]
        assert order, "module order did not cover the trained tree"
        flat = lora_to_flat_weights(lora, order)
        assert len(flat) == 2 * len(order)
        back = flat_weights_to_lora(flat, order)
        for n in order:
            np.testing.assert_allclose(
                np.asarray(back[n]["lora_A"]), np.asarray(lora[n]["lora_A"], np.float32),
                rtol=0, atol=1e-3,  # fp16 container rounding
            )
            np.testing.assert_allclose(
                np.asarray(back[n]["lora_B"]), np.asarray(lora[n]["lora_B"], np.float32),
                rtol=0, atol=1e-3,
            )

    def test_add_lora_blend(self, tiny):
        *_, lora = tiny
        name = next(iter(lora))
        other = {name: {"lora_A": np.ones_like(np.asarray(lora[name]["lora_A"])),
                        "lora_B": np.ones_like(np.asarray(lora[name]["lora_B"]))}}
        out = add_lora(lora, other, alpha=2.0, beta=0.5)
        np.testing.assert_allclose(
            out[name]["lora_A"],
            2.0 * other[name]["lora_A"] + 0.5 * np.asarray(lora[name]["lora_A"], np.float32),
            rtol=1e-6,
        )
        # modules only in the old tree are kept, scaled by beta
        missing = [n for n in lora if n != name]
        if missing:
            np.testing.assert_allclose(
                out[missing[0]]["lora_B"],
                0.5 * np.asarray(lora[missing[0]]["lora_B"], np.float32),
                rtol=1e-6,
            )

    def test_inspect_lora(self, tiny):
        *_, lora = tiny
        moved = inspect_lora(lora)
        assert set(moved) == set(lora)
        name = next(iter(lora))
        delta = np.asarray(lora[name]["lora_A"], np.float32) @ np.asarray(
            lora[name]["lora_B"], np.float32
        )
        np.testing.assert_allclose(moved[name], np.abs(delta).mean(), rtol=1e-5)


class TestSafelorasContainer:
    def test_container_layout_matches_reference(self, tiny, tmp_path):
        """Keys, metadata, dtypes exactly as lora.py:452-485 writes them."""
        *_, lora = tiny
        path = str(tmp_path / "zoo.safetensors")
        emb = np.random.default_rng(0).standard_normal(8).astype(np.float32)
        save_safeloras_with_embeds(
            {"unet": (lora, {"CrossAttention"})}, {"<mytok>": emb}, path
        )
        from safetensors import safe_open

        with safe_open(path, "numpy") as f:
            meta = f.metadata()
            assert json.loads(meta["unet"]) == ["CrossAttention"]
            assert meta["<mytok>"] == EMBED_FLAG
            assert meta["unet:0:rank"] == "2"
            up = f.get_tensor("unet:0:up")
            down = f.get_tensor("unet:0:down")
            assert up.dtype == np.float16 and down.dtype == np.float16
            assert down.shape[0] == 2  # (r, in)
            assert up.shape[1] == 2    # (out, r)

    def test_parse_roundtrip_and_embeds(self, tiny, tmp_path):
        *_, lora = tiny
        path = str(tmp_path / "zoo.safetensors")
        emb = np.arange(8, dtype=np.float32)
        save_safeloras_with_embeds(
            {"unet": (lora, {"CrossAttention", "GEGLU"})}, {"<tok>": emb}, path
        )
        parsed = parse_safeloras(path)
        weights, ranks, targets = parsed["unet"]
        assert len(weights) == 2 * len(lora)
        assert ranks == [2] * len(lora)
        assert set(targets) == {"CrossAttention", "GEGLU"}
        embeds = parse_safeloras_embeds(path)
        np.testing.assert_array_equal(embeds["<tok>"], emb)

    def test_parse_rejects_unflagged_tensors(self, tmp_path):
        from safetensors.numpy import save_file

        path = str(tmp_path / "bad.safetensors")
        save_file({"mystery:0:up": np.zeros((2, 2), np.float16)}, path)
        with pytest.raises(ValueError, match="no metadata"):
            parse_safeloras(path)

    def test_patch_safeloras_end_to_end(self, tiny, tmp_path):
        """save_all → patch_safeloras reproduces apply_lora and registers
        the TI embed (reference patch_pipe, lora.py:1099-1165)."""
        cfg, params, idx, lora = tiny
        order = [n for n in lora_module_order(idx) if n in lora]
        path = str(tmp_path / "all.safetensors")
        emb = np.random.default_rng(1).standard_normal((2, 8)).astype(np.float32)
        save_all(
            {n: lora[n] for n in order}, None, path,
            embeds={"<zoo-tok>": emb},
        )

        class _DB:
            def __init__(self):
                self.seen = {}

            def register(self, name, vectors):
                self.seen[name] = vectors

        db = _DB()
        patched = patch_safeloras(path, {"unet": params}, {"unet": idx}, embedding_db=db)
        assert "<zoo-tok>" in db.seen and db.seen["<zoo-tok>"].shape == (2, 8)

        # fp16 container rounding is the only difference vs direct apply
        direct = apply_lora(
            params,
            {
                n: {
                    "lora_A": np.asarray(lora[n]["lora_A"], np.float16).astype(np.float32),
                    "lora_B": np.asarray(lora[n]["lora_B"], np.float16).astype(np.float32),
                }
                for n in order
            },
            idx,
        )
        for a, b in zip(jax.tree.leaves(direct), jax.tree.leaves(patched["unet"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=2e-3)

    def test_patch_skips_models_without_params(self, tiny, tmp_path):
        *_, idx, lora = tiny
        path = str(tmp_path / "two.safetensors")
        save_safeloras_with_embeds(
            {"unet": (lora, {"CrossAttention"}),
             "text_encoder": (lora, {"CLIPAttention"})},
            None, path,
        )
        out = patch_safeloras(path, {"unet": tiny[1]}, {"unet": idx})
        assert set(out) == {"unet"}
