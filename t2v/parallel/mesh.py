"""Device mesh construction.

The reference's only distributed mode is NCCL data-parallel sampling
(dist_utils.py:4-19, ddp_wrapper.py:9-47). The TPU-native replacement is a
2-3 axis ``jax.sharding.Mesh``:

  dp — data parallel: batch / CFG-pair / per-video work split (the
       reference's DDP role, including the per-rank seed policy via
       t2v.core.rng.host_key)
  sp — sequence parallel over the frame axis for long-video configs
       (125-frame BASELINE config) — NEW design, the reference has no
       sequence parallelism (SURVEY.md §2.9)
  tp — tensor parallel over attention heads / MLP hidden — NEW design

Mesh axes ride ICI within a slice; multi-slice deployments should map dp
to the DCN-connected outer axis (standard jax device order already does).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("dp", "sp", "tp")


@dataclass(frozen=True)
class MeshConfig:
    dp: int = -1  # -1: absorb remaining devices
    sp: int = 1
    tp: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int, int]:
        dp, sp, tp = self.dp, self.sp, self.tp
        if dp == -1:
            assert n_devices % (sp * tp) == 0, (n_devices, sp, tp)
            dp = n_devices // (sp * tp)
        assert dp * sp * tp == n_devices, (dp, sp, tp, n_devices)
        return dp, sp, tp


def make_mesh(config: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    dp, sp, tp = config.resolve(len(devices))
    arr = np.asarray(devices).reshape(dp, sp, tp)
    return Mesh(arr, AXES)
