"""LoRA training subsystem: init/apply/save/discover + train steps + EMA."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from t2v.core.config import ModelScopeUNetConfig
from t2v.diffusion.schedules import DiffusionSchedule
from t2v.models.modelscope_unet import UNetSD
from t2v.parallel.mesh import MeshConfig, make_mesh
from t2v.parallel.train import (
    init_train_state,
    make_lora_train_step,
    make_optimizer,
    make_train_step,
)
from t2v.pipeline.lora import (
    apply_lora,
    discover_loras,
    init_lora,
    merge_stable_lora,
    save_stable_lora,
    unet_module_index,
)


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = ModelScopeUNetConfig().tiny()
    model = UNetSD(cfg=cfg)
    x = jnp.zeros((1, 2, 8, 8, cfg.in_dim))
    t = jnp.zeros((1,))
    ctx = jnp.zeros((1, 7, cfg.context_dim))
    params = jax.jit(model.init)(jax.random.key(0), x, t, ctx)
    return cfg, model, params


class TestLoraTree:
    def test_init_zero_delta(self, tiny_unet):
        cfg, model, params = tiny_unet
        idx = unet_module_index(cfg)
        lora = init_lora(params, idx, rank=2, key=jax.random.key(1))
        assert lora, "no linear targets found"
        for ab in lora.values():
            assert ab["lora_A"].shape[1] == 2
            np.testing.assert_array_equal(np.asarray(ab["lora_B"]), 0.0)
        merged = apply_lora(params, lora, idx)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(merged)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_apply_changes_targets_only(self, tiny_unet):
        cfg, _, params = tiny_unet
        idx = unet_module_index(cfg)
        lora = init_lora(params, idx, rank=2, key=jax.random.key(1))
        lora = jax.tree.map(lambda x: jnp.ones_like(x) * 0.1, lora)
        merged = apply_lora(params, lora, idx, alpha=2.0)
        flat_p = jax.tree_util.tree_leaves_with_path(params)
        flat_m = dict(jax.tree_util.tree_leaves_with_path(merged))
        target_paths = {idx[n][0] for n in lora}
        n_changed = 0
        for path, leaf in flat_p:
            m = flat_m[path]
            keys = tuple(
                getattr(s, "key", getattr(s, "name", "")) for s in path
            )
            is_target_kernel = keys[-1] == "kernel" and any(
                keys[1 : 1 + len(tp)] == tp for tp in target_paths
            )
            if is_target_kernel:
                assert not np.allclose(np.asarray(leaf), np.asarray(m))
                n_changed += 1
            else:
                np.testing.assert_array_equal(np.asarray(leaf), np.asarray(m))
        assert n_changed == len(lora)

    def test_save_roundtrip_via_merge(self, tiny_unet, tmp_path):
        """A trained LoRA saved to stable-lora format must merge to the same
        weights as the functional apply (format parity with the reference)."""
        cfg, _, params = tiny_unet
        idx = unet_module_index(cfg)
        key = jax.random.key(3)
        lora = init_lora(params, idx, rank=2, key=key)
        ka, kb = jax.random.split(key)
        lora = {
            n: {
                "lora_A": jax.random.normal(jax.random.fold_in(ka, i), ab["lora_A"].shape) * 0.1,
                "lora_B": jax.random.normal(jax.random.fold_in(kb, i), ab["lora_B"].shape) * 0.1,
            }
            for i, (n, ab) in enumerate(lora.items())
        }
        path = str(tmp_path / "trained.safetensors")
        save_stable_lora(path, jax.device_get(lora), metadata={"rank": 2})

        from safetensors.numpy import load_file

        sd = load_file(path)
        merged_file, skipped = merge_stable_lora(params, sd, 0.7, idx)
        merged_fn = apply_lora(params, lora, idx, alpha=0.7)
        assert not skipped
        for a, b in zip(jax.tree.leaves(merged_file), jax.tree.leaves(merged_fn)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_lvdm_format_save_roundtrip(self, tiny_unet, tmp_path):
        """save_lvdm_lora writes cloneofsimo lora_up/lora_down keys that
        merge_lvdm_lora (and the reference's net_load_lora, lvdm
        lora.py:620-672) consume back to identical weights."""
        from t2v.pipeline.lora import merge_lvdm_lora, save_lvdm_lora

        cfg, _, params = tiny_unet
        idx = unet_module_index(cfg)
        key = jax.random.key(5)
        lora = init_lora(params, idx, rank=2, key=key)
        lora = {
            n: {
                "lora_A": jax.random.normal(jax.random.fold_in(key, 2 * i), ab["lora_A"].shape) * 0.1,
                "lora_B": jax.random.normal(jax.random.fold_in(key, 2 * i + 1), ab["lora_B"].shape) * 0.1,
            }
            for i, (n, ab) in enumerate(lora.items())
        }
        path = str(tmp_path / "extracted.safetensors")
        save_lvdm_lora(path, jax.device_get(lora), metadata={"rank": 2})

        from safetensors.numpy import load_file

        sd = load_file(path)
        assert any(k.endswith(".lora_up.weight") for k in sd)
        merged_file, skipped = merge_lvdm_lora(params, sd, idx, scale=1.0)
        merged_fn = apply_lora(params, lora, idx, alpha=1.0)
        assert not skipped
        for a, b in zip(jax.tree.leaves(merged_file), jax.tree.leaves(merged_fn)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_discover(self, tiny_unet, tmp_path):
        cfg, _, params = tiny_unet
        idx = unet_module_index(cfg)
        lora = init_lora(params, idx, rank=2, key=jax.random.key(0))
        sub = tmp_path / "nested"
        sub.mkdir()
        save_stable_lora(str(sub / "mylora.safetensors"), jax.device_get(lora))
        # untagged file must be ignored
        from safetensors.numpy import save_file

        save_file({"x": np.zeros((2, 2), np.float32)}, str(tmp_path / "other.safetensors"))
        found = discover_loras(str(tmp_path))
        assert [m["lora_name"] for m in found] == ["mylora"]
        assert found[0]["path"].endswith("nested/mylora.safetensors")


def _batch(cfg, b=2):
    rng = np.random.default_rng(0)
    return {
        "latents": jnp.asarray(rng.normal(size=(b, 2, 8, 8, cfg.in_dim)).astype(np.float32)),
        "context": jnp.asarray(rng.normal(size=(b, 7, cfg.context_dim)).astype(np.float32)),
    }


class TestLoraTrainStep:
    def test_step_updates_lora_only(self, tiny_unet):
        cfg, model, params = tiny_unet
        idx = unet_module_index(cfg)
        mesh = make_mesh(MeshConfig(dp=-1))
        opt = make_optimizer(1e-2)
        # random init zero-gates every transformer output (proj_out,
        # zero-init head), which correctly zeroes LoRA grads; un-zero them
        # to emulate pretrained weights so gradients flow.
        params = jax.tree.map(
            lambda a: a + 0.01 if a.size and not np.asarray(a).any() else a, params
        )
        lora0 = init_lora(params, idx, rank=2, key=jax.random.key(1))
        state = init_train_state(lora0, opt, mesh)
        step = make_lora_train_step(
            model.apply, opt, DiffusionSchedule.linear_sd(100), mesh, params, idx
        )
        with mesh:
            state, loss = step(state, _batch(cfg), jax.random.key(2))
        assert np.isfinite(float(loss))
        # lora_B moved away from zero for at least some modules
        moved = sum(
            float(np.abs(np.asarray(ab["lora_B"])).max()) > 0
            for ab in state.params.values()
        )
        assert moved > 0


class TestEMA:
    def test_ema_tracks_params(self, tiny_unet):
        cfg, model, params = tiny_unet
        mesh = make_mesh(MeshConfig(dp=-1))
        opt = make_optimizer(1e-2)
        state = init_train_state(params, opt, mesh, with_ema=True)
        step = make_train_step(
            model.apply, opt, DiffusionSchedule.linear_sd(100), mesh, ema_decay=0.5
        )
        p0 = jax.device_get(state.params)
        with mesh:
            state, _ = step(state, _batch(cfg), jax.random.key(2))
        p1 = jax.device_get(state.params)
        ema = jax.device_get(state.ema_params)
        # ema = 0.5*p0 + 0.5*p1 for every leaf
        for a, b, e in zip(jax.tree.leaves(p0), jax.tree.leaves(p1), jax.tree.leaves(ema)):
            np.testing.assert_allclose(
                np.asarray(e), 0.5 * np.asarray(a) + 0.5 * np.asarray(b), atol=1e-6
            )


class TestRemat:
    def test_remat_step_matches_plain(self, tiny_unet):
        """jax.checkpoint must not change the loss/updates, only memory."""
        cfg, model, params = tiny_unet
        mesh = make_mesh(MeshConfig(dp=-1))
        opt = make_optimizer(1e-2)
        batch = _batch(cfg)
        key = jax.random.key(2)

        s1 = init_train_state(params, opt, mesh)
        f1 = make_train_step(model.apply, opt, DiffusionSchedule.linear_sd(100), mesh)
        with mesh:
            s1, l1 = f1(s1, batch, key)

        s2 = init_train_state(params, opt, mesh)
        f2 = make_train_step(
            model.apply, opt, DiffusionSchedule.linear_sd(100), mesh, remat=True
        )
        with mesh:
            s2, l2 = f2(s2, batch, key)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestResume:
    def test_train_state_roundtrip(self, tiny_unet, tmp_path):
        """Save → restore reproduces params, optimizer state, EMA, and the
        step counter, and the restored state trains identically."""
        from t2v.diffusion.schedules import DiffusionSchedule
        from t2v.io.orbax_io import (
            has_train_state,
            latest_train_state,
            restore_train_state,
            save_train_state,
        )

        cfg, model, params = tiny_unet
        mesh = make_mesh(MeshConfig(dp=-1))
        opt = make_optimizer(1e-2)
        sched = DiffusionSchedule.linear_sd(100)
        step_fn = make_train_step(model.apply, opt, sched, mesh, ema_decay=0.5)
        batch = _batch(cfg)

        state = init_train_state(params, opt, mesh, with_ema=True)
        with mesh:
            state, _ = step_fn(state, batch, jax.random.key(1))
        out = str(tmp_path / "step_1")
        save_train_state(out, state)
        assert has_train_state(out)
        assert latest_train_state(str(tmp_path)) == out

        template = init_train_state(params, opt, mesh, with_ema=True)
        restored = restore_train_state(out, template)
        assert int(restored.step) == int(state.step) == 1
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(state.ema_params), jax.tree.leaves(restored.ema_params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # continuing from the restored state matches continuing directly
        with mesh:
            s_direct, l_direct = step_fn(state, batch, jax.random.key(2))
            s_resumed, l_resumed = step_fn(restored, batch, jax.random.key(2))
        np.testing.assert_allclose(float(l_direct), float(l_resumed), rtol=1e-6)
        for a, b in zip(
            jax.tree.leaves(s_direct.params), jax.tree.leaves(s_resumed.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
