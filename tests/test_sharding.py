"""Distributed tests on the 8-device virtual CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from t2v.core.config import ModelScopeUNetConfig
from t2v.models.modelscope_unet import UNetSD
from t2v.parallel.mesh import MeshConfig, make_mesh
from t2v.parallel.sharding import param_sharding_rules, shard_params
from t2v.parallel.train import (
    init_train_state,
    make_optimizer,
    make_train_step,
)
from t2v.diffusion.schedules import DiffusionSchedule

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

CFG = ModelScopeUNetConfig().tiny()


def test_mesh_shapes():
    mesh = make_mesh(MeshConfig(dp=2, sp=2, tp=2))
    assert mesh.devices.shape == (2, 2, 2)
    assert mesh.axis_names == ("dp", "sp", "tp")
    mesh2 = make_mesh(MeshConfig(tp=4))
    assert mesh2.devices.shape == (2, 1, 4)


def test_param_sharding_rules():
    m = UNetSD(cfg=CFG)
    x = jnp.zeros((1, 2, 8, 8, CFG.in_dim))
    params = jax.jit(m.init)(jax.random.key(0), x, jnp.zeros((1,)), jnp.zeros((1, 5, CFG.context_dim)))
    mesh = make_mesh(MeshConfig(dp=2, sp=1, tp=4))
    rules = param_sharding_rules(params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(rules)[0]
    specs = {
        "/".join(p.key for p in path): s.spec for path, s in flat
    }
    qkv = [s for k, s in specs.items() if k.endswith("to_q/kernel")]
    assert qkv and all(s == P(None, "tp") for s in qkv)
    outs = [s for k, s in specs.items() if k.endswith("to_out/kernel")]
    assert outs and all(s == P("tp", None) for s in outs)
    convs = [s for k, s in specs.items() if "in_conv/kernel" in k]
    assert convs and all(s == P() for s in convs)


def test_tp_sharded_forward_matches_replicated():
    """Megatron-sharded forward == single-device forward."""
    m = UNetSD(cfg=CFG)
    x = jnp.ones((2, 2, 8, 8, CFG.in_dim)) * 0.1
    t = jnp.full((2,), 100.0)
    ctx = jnp.ones((2, 5, CFG.context_dim)) * 0.2
    params = jax.jit(m.init)(jax.random.key(0), x, t, ctx)
    ref = jax.jit(m.apply)(params, x, t, ctx)

    mesh = make_mesh(MeshConfig(dp=2, sp=1, tp=4))
    sharded = shard_params(params, mesh)
    with mesh:
        out = jax.jit(m.apply)(sharded, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_train_step_runs_and_reduces():
    m = UNetSD(cfg=CFG)
    B, F, H, W = 4, 2, 8, 8
    x = jnp.zeros((B, F, H, W, CFG.in_dim))
    t = jnp.zeros((B,))
    ctx = jnp.zeros((B, 5, CFG.context_dim))
    params = jax.jit(m.init)(jax.random.key(0), x, t, ctx)

    mesh = make_mesh(MeshConfig(dp=4, sp=1, tp=2))
    opt = make_optimizer(1e-4)
    state = init_train_state(params, opt, mesh)
    schedule = DiffusionSchedule.linear_sd(100)
    step = make_train_step(m.apply, opt, schedule, mesh)

    rng = np.random.default_rng(0)
    batch = {
        "latents": jnp.asarray(rng.normal(size=(B, F, H, W, CFG.in_dim)).astype(np.float32)),
        "context": jnp.asarray(rng.normal(size=(B, 5, CFG.context_dim)).astype(np.float32)),
    }
    with mesh:
        state2, loss1 = step(state, batch, jax.random.key(1))
        state3, loss2 = step(state2, batch, jax.random.key(1))
    assert np.isfinite(float(loss1)) and float(loss1) > 0
    # same key+batch, updated params -> loss must change (params moved)
    assert float(loss2) != float(loss1)
    assert int(state3.step) == 2
