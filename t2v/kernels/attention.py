"""Attention dispatch: Pallas flash kernel vs plain XLA dot-product.

Replaces the reference's backend ladder (xformers → torch SDP →
einsum, t2v_model.py:556-581). Policy:
  * long sequences on TPU → Pallas flash kernel (no (N,S) matrix in HBM);
  * short sequences (cross-attention over 77 text tokens, few-frame
    temporal attention) → XLA einsum attention, which XLA fuses well and
    which beats the kernel's block overhead at these sizes;
  * non-TPU backends (CPU tests) → XLA path (the Pallas kernel still runs
    under interpret=True in parity tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from t2v.kernels.flash_attention import flash_attention

# below this KV length the score matrix is cheap and XLA's fused attention
# wins; above it the flash kernel's HBM savings dominate.
FLASH_MIN_KV = 512


def xla_attention(q, k, v, scale: float | None = None):
    """Plain dot-product attention, fp32 softmax. (B, N, D) x (B, S, D)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bnd,bsd->bns", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1)
    return jnp.einsum("bns,bsd->bnd", p.astype(v.dtype), v)


def attention(q, k, v, scale: float | None = None, force: str | None = None):
    """Dispatching attention entry used by all model blocks.

    force: None (auto) | "flash" | "xla" — test/benchmark override.
    """
    if force == "flash":
        return flash_attention(q, k, v, scale)
    if force == "xla":
        return xla_attention(q, k, v, scale)
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if on_tpu and k.shape[1] >= FLASH_MIN_KV and q.shape[-1] % 8 == 0:
        return flash_attention(q, k, v, scale)
    return xla_attention(q, k, v, scale)
