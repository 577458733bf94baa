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
    ema_params: Any = None


def make_optimizer(lr: float = 1e-4, weight_decay: float = 1e-2) -> optax.GradientTransformation:
    return optax.adamw(lr, weight_decay=weight_decay)


def diffusion_loss(
    apply_fn, params, schedule_tables, batch, key, parameterization: str = "eps"
):
    """Denoising MSE (ddpm3d.py:885-922 semantics). The regression target
    follows the model's prediction parameterization (ddpm3d.py:893-898):
    eps → noise;  x0 → the clean latent;  v → √ᾱ_t·eps - √(1-ᾱ_t)·x0."""
    x0, context = batch["latents"], batch["context"]
    b = x0.shape[0]
    kt, kn = jax.random.split(key)
    t = jax.random.randint(kt, (b,), 0, schedule_tables["num_timesteps"])
    noise = jax.random.normal(kn, x0.shape, x0.dtype)
    bshape = (b,) + (1,) * (x0.ndim - 1)
    sqrt_ac = schedule_tables["sqrt_alphas_cumprod"][t].reshape(bshape)
    sqrt_1mac = schedule_tables["sqrt_one_minus_alphas_cumprod"][t].reshape(bshape)
    xt = sqrt_ac * x0 + sqrt_1mac * noise
    if parameterization == "x0":
        target = x0
    elif parameterization == "v":
        target = sqrt_ac * noise - sqrt_1mac * x0
    else:
        target = noise
    pred = apply_fn(params, xt, t.astype(jnp.float32), context)
    return jnp.mean((pred - target) ** 2)


def schedule_tables(schedule: DiffusionSchedule) -> dict:
    return {
        "num_timesteps": schedule.num_timesteps,
        "sqrt_alphas_cumprod": jnp.asarray(schedule.sqrt_alphas_cumprod),
        "sqrt_one_minus_alphas_cumprod": jnp.asarray(
            schedule.sqrt_one_minus_alphas_cumprod
        ),
    }


def _ema_update(ema, params, decay):
    return jax.tree.map(lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema, params)


def make_train_step(
    apply_fn: Callable,
    optimizer: optax.GradientTransformation,
    schedule: DiffusionSchedule,
    mesh: Mesh,
    *,
    ema_decay: float | None = None,
    remat: bool = False,
    parameterization: str = "eps",
) -> Callable:
    """Returns jitted train_step(state, batch, key) -> (state, loss).

    batch = {"latents": (B, F, H, W, C), "context": (B, L, D)} sharded
    (dp, sp) on entry; grads are reduced by XLA across dp automatically.
    ema_decay enables an EMA shadow of the params (the reference's LitEma
    scope, ddpm3d.py:179-192) carried in state.ema_params.
    remat=True rematerialises the UNet forward during the backward pass
    (jax.checkpoint) — trades ~1 extra forward of FLOPs for activation
    memory, the TPU counterpart of the reference's gradient checkpointing
    (lvdm util.py:91-139 CheckpointFunction).
    """
    tables = schedule_tables(schedule)
    if remat:
        apply_fn = jax.checkpoint(apply_fn)

    def step(state: TrainState, batch, key):
        loss, grads = jax.value_and_grad(
            lambda p: diffusion_loss(
                apply_fn, p, tables, batch, key, parameterization
            )
        )(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema_decay is not None and ema is not None:
            ema = _ema_update(ema, params, ema_decay)
        return TrainState(params, opt_state, state.step + 1, ema), loss

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
    params: Any,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    *,
    with_ema: bool = False,
) -> TrainState:
    # copy first: device_put is a no-op when the placement already matches,
    # and the train step DONATES the state — aliasing the caller's params
    # would delete them (e.g. pipe.unet_params) after the first step
    params = jax.tree.map(lambda p: jnp.array(p, copy=True), params)
    params = jax.device_put(params, param_sharding_rules(params, mesh))
    opt_state = optimizer.init(params)
    # copy=True: astype alone aliases fp32 buffers, which breaks donation
    # (state.params and state.ema_params would share storage)
    ema = (
        jax.tree.map(lambda p: jnp.array(p, dtype=jnp.float32, copy=True), params)
        if with_ema
        else None
    )
    return TrainState(
        params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32), ema_params=ema
    )


def make_lora_train_step(
    apply_fn: Callable,
    optimizer: optax.GradientTransformation,
    schedule: DiffusionSchedule,
    mesh: Mesh,
    base_params: Any,
    module_index,
    *,
    alpha: float = 1.0,
    parameterization: str = "eps",
) -> Callable:
    """LoRA fine-tuning step: state.params is the low-rank adapter tree
    (t2v/pipeline/lora.py ``init_lora``); the frozen base params are merged
    functionally inside the loss, so only A/B receive gradients — the
    TPU-native counterpart of the reference's LoRA-only param group
    (ddpm3d.py:1246-1345) and injected-module training (lvdm lora.py)."""
    from t2v.pipeline.lora import apply_lora

    tables = schedule_tables(schedule)
    base_params = jax.device_put(base_params, param_sharding_rules(base_params, mesh))

    def step(state: TrainState, batch, key, base):
        def loss_fn(lora):
            merged = apply_lora(base, lora, module_index, alpha)
            return diffusion_loss(
                apply_fn, merged, tables, batch, key, parameterization
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        lora = optax.apply_updates(state.params, updates)
        return TrainState(lora, opt_state, state.step + 1, state.ema_params), loss

    def sharded_step(state, batch, key, base):
        batch = {
            "latents": jax.lax.with_sharding_constraint(
                batch["latents"], NamedSharding(mesh, activation_spec(mesh))
            ),
            "context": jax.lax.with_sharding_constraint(
                batch["context"], NamedSharding(mesh, P("dp", None, None))
            ),
        }
        return step(state, batch, key, base)

    # base params ride as a (non-donated) argument — closing over them would
    # bake the full frozen model into the executable as jaxpr constants
    jitted = jax.jit(sharded_step, donate_argnums=(0,))
    return lambda state, batch, key: jitted(state, batch, key, base_params)


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "opt_state", "step", "ema_params"], meta_fields=[]
)
