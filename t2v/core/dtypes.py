"""Mixed-precision policy for TPU execution.

The reference runs fp16 CUDA autocast (t2v_pipeline.py:104,275) with manual
``.half()`` calls. On TPU the idiomatic equivalent is bfloat16 for MXU-bound
matmuls/convs with float32 accumulation and float32 normalisation statistics;
XLA handles the accumulate dtype via ``preferred_element_type``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class Policy:
    """Dtype policy threaded through every model module.

    param_dtype:   storage dtype of the weights
    compute_dtype: dtype activations are cast to before matmuls/convs
    norm_dtype:    dtype normalisation statistics are computed in
    """

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    norm_dtype: jnp.dtype = jnp.float32
    # attention backend override threaded to t2v.kernels.attention dispatch:
    # None = auto (Pallas on TPU where profitable). Mesh-sharded execution
    # sets "xla" — XLA's SPMD partitioner cannot partition Mosaic custom
    # calls, so sharded q/k/v would be gathered full-size per shard; the
    # plain dot-product path partitions cleanly with inserted collectives.
    attention_backend: str | None = None
    # TemporalConvBlock backend (t2v.kernels.temporal_conv):
    # None = auto (fused Pallas chain on TPU, XLA elsewhere), "xla", or
    # "fused" (interpret mode off-TPU — used by CPU tests). GSPMD-sharded
    # execution (tp/sp meshes) sets "xla" for the same partitioner reason
    # as attention; dp-only shard_map bodies may keep the fused kernel
    # (per-shard local arrays).
    temporal_conv_backend: str | None = None

    @classmethod
    def bf16(cls) -> "Policy":
        """TPU inference policy: bf16 weights + compute, fp32 norms."""
        return cls(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)

    @classmethod
    def fp32(cls) -> "Policy":
        """Parity/testing policy (PSNR gates run in fp32)."""
        return cls()

    def cast(self, x):
        return x.astype(self.compute_dtype)
