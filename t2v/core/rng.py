"""Deterministic RNG policy.

The reference seeds a CPU ``torch.Generator`` and draws latent noise on host
(samplers_common.py:104-121); exact torch-RNG bit reproduction is out of
scope (SURVEY.md §7 "Hard parts"). Our policy:

  * every generation derives a root ``jax.random.key(seed)``;
  * per-batch seeds follow the reference's ``seed + batch_index`` rule
    (process_modelscope.py:221);
  * named sub-streams are derived with ``fold_in`` over a stable string hash,
    so adding a consumer never perturbs existing streams;
  * multi-host sampling folds in ``jax.process_index()`` (replacing the
    reference's per-rank ``local_rank + seed``, sample_text2video.py:185).
"""

from __future__ import annotations

import hashlib

import jax
import jax.numpy as jnp
import numpy as np


def _stream_id(name: str) -> int:
    return int.from_bytes(hashlib.sha256(name.encode()).digest()[:4], "little")


def key_for_seed(seed: int) -> jax.Array:
    """Root key. seed==-1 means 'random' in the reference; callers must
    resolve -1 to an entropy-derived seed *before* this point so the run
    manifest always records the concrete seed used."""
    if seed < 0:
        raise ValueError("resolve seed=-1 to a concrete seed before keying")
    return jax.random.key(np.uint32(seed))


def resolve_seed(seed: int) -> int:
    """Map the reference's seed==-1 'randomise' sentinel to a fresh seed."""
    if seed == -1:
        return int(np.random.SeedSequence().entropy % (2**31))
    return int(seed)


def stream(key: jax.Array, name: str) -> jax.Array:
    """Named substream (e.g. "latent_noise", "ddim_eta", "inpaint_noise")."""
    return jax.random.fold_in(key, _stream_id(name))


def batch_key(seed: int, batch_index: int) -> jax.Array:
    """Per-batch key matching the reference's seed+batch policy."""
    return key_for_seed(seed + batch_index)


def host_key(key: jax.Array) -> jax.Array:
    """Fold in the process index for multi-host data-parallel sampling."""
    return jax.random.fold_in(key, jax.process_index())


def latent_noise(key: jax.Array, shape: tuple[int, ...], dtype=jnp.float32) -> jax.Array:
    """Initial latent noise draw, fp32 regardless of compute policy."""
    return jax.random.normal(stream(key, "latent_noise"), shape, dtype)
