"""Distributed diffusion training step (pjit over the mesh).

The reference ships training machinery only in the LVDM family
(ddpm3d.py:885-922 ``p_losses``: eps-MSE at uniformly sampled timesteps;
:1246-1345 optimizers). This is the TPU-native equivalent for any of our
UNets: one jitted step = q-sample → eps prediction → MSE → optax adamw →
param update, sharded dp over batch / sp over frames / tp over attention
weights, with XLA collectives (psum for grad reduction) inserted by the
SPMD partitioner.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from t2v.diffusion.schedules import DiffusionSchedule
from t2v.parallel.sharding import activation_spec, param_sharding_rules


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(lr: float = 1e-4, weight_decay: float = 1e-2) -> optax.GradientTransformation:
    return optax.adamw(lr, weight_decay=weight_decay)


def diffusion_loss(apply_fn, params, schedule_tables, batch, key):
    """eps-parameterisation MSE (ddpm3d.py:885-922 semantics)."""
    x0, context = batch["latents"], batch["context"]
    b = x0.shape[0]
    kt, kn = jax.random.split(key)
    t = jax.random.randint(kt, (b,), 0, schedule_tables["num_timesteps"])
    noise = jax.random.normal(kn, x0.shape, x0.dtype)
    sqrt_ac = schedule_tables["sqrt_alphas_cumprod"][t]
    sqrt_1mac = schedule_tables["sqrt_one_minus_alphas_cumprod"][t]
    bshape = (b,) + (1,) * (x0.ndim - 1)
    xt = sqrt_ac.reshape(bshape) * x0 + sqrt_1mac.reshape(bshape) * noise
    eps = apply_fn(params, xt, t.astype(jnp.float32), context)
    return jnp.mean((eps - noise) ** 2)


def schedule_tables(schedule: DiffusionSchedule) -> dict:
    return {
        "num_timesteps": schedule.num_timesteps,
        "sqrt_alphas_cumprod": jnp.asarray(schedule.sqrt_alphas_cumprod),
        "sqrt_one_minus_alphas_cumprod": jnp.asarray(
            schedule.sqrt_one_minus_alphas_cumprod
        ),
    }


def make_train_step(
    apply_fn: Callable,
    optimizer: optax.GradientTransformation,
    schedule: DiffusionSchedule,
    mesh: Mesh,
) -> Callable:
    """Returns jitted train_step(state, batch, key) -> (state, loss).

    batch = {"latents": (B, F, H, W, C), "context": (B, L, D)} sharded
    (dp, sp) on entry; grads are reduced by XLA across dp automatically.
    """
    tables = schedule_tables(schedule)

    def step(state: TrainState, batch, key):
        loss, grads = jax.value_and_grad(
            lambda p: diffusion_loss(apply_fn, p, tables, batch, key)
        )(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def sharded_step(state, batch, key):
        batch = {
            "latents": jax.lax.with_sharding_constraint(
                batch["latents"], NamedSharding(mesh, activation_spec(mesh))
            ),
            "context": jax.lax.with_sharding_constraint(
                batch["context"], NamedSharding(mesh, P("dp", None, None))
            ),
        }
        return step(state, batch, key)

    return jax.jit(sharded_step, donate_argnums=(0,))


def init_train_state(
    params: Any, optimizer: optax.GradientTransformation, mesh: Mesh
) -> TrainState:
    params = jax.device_put(params, param_sharding_rules(params, mesh))
    opt_state = optimizer.init(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "opt_state", "step"], meta_fields=[]
)
