"""Multi-host initialisation and seed policy.

Reference equivalent: the DDP wrapper's NCCL env:// init + per-rank seeds
(ddp_wrapper.py:9-47, dist_utils.py:4-11, sample_text2video.py:185). Here:

  * ``jax.distributed.initialize()`` (TPU pods auto-discover via the
    coordination service; no env:// rendezvous to manage);
  * global meshes span all hosts' devices — the DCN axis should be the
    outermost (dp) axis so cross-host traffic is pure data parallelism and
    tp/sp collectives stay on ICI;
  * per-host work split + seeds: ``host_seed`` folds ``process_index`` the
    way the reference offsets rank into the seed;
  * "gather to rank 0" becomes a process-0 gate: sharded outputs are
    addressable per host, and media/IO runs only where ``is_primary()``.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None, num_processes: int | None = None, process_id: int | None = None) -> None:
    """Initialise multi-host JAX. On TPU pods all arguments auto-discover;
    pass them explicitly only for manual CPU/GPU rendezvous."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def is_primary() -> bool:
    """True on the process that should write media / save checkpoints
    (reference rank-0 save, sample_text2video.py:248)."""
    return jax.process_index() == 0


def host_seed(seed: int) -> int:
    """Per-host seed = seed + process_index (reference per-rank
    ``local_rank + seed``). Use for host-local batch sharding; inside one
    mesh-sharded computation prefer per-sample fold_in (dp_sample.py)."""
    return seed + jax.process_index()


def host_key(key: jax.Array) -> jax.Array:
    """jax.random analogue: fold the process index into a key."""
    return jax.random.fold_in(key, jax.process_index())


def local_shard(n_samples: int) -> tuple[int, int]:
    """(start, count) of this host's share of n_samples — the reference's
    ``n_samples / world_size`` work split (sample_text2video.py:176),
    with the remainder spread over the first hosts."""
    world = jax.process_count()
    rank = jax.process_index()
    base, rem = divmod(n_samples, world)
    count = base + (1 if rank < rem else 0)
    start = rank * base + min(rank, rem)
    return start, count
