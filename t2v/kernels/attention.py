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

import functools

import jax
import jax.numpy as jnp

from t2v.kernels.flash_attention import (
    flash_attention,
    flash_attention_bwd,
    flash_attention_fwd,
)

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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_diff(q, k, v, scale):
    return flash_attention(q, k, v, scale)


def _flash_diff_fwd(q, k, v, scale):
    # pallas_call has no JVP rule — run the kernel forward, save residuals
    out, lse = flash_attention_fwd(q, k, v, scale)
    return out, (q, k, v, out, lse)


def _flash_diff_bwd(scale, res, g):
    # Pallas FlashAttention-2 backward: blockwise recompute from (q, k, v,
    # o, lse) — the (N, S) score matrix never hits HBM in training either.
    q, k, v, o, lse = res
    dq, dk, dv = flash_attention_bwd(q, k, v, o, lse, g, scale)
    return dq, dk, dv


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def attention(q, k, v, scale: float | None = None, force: str | None = None):
    """Dispatching attention entry used by all model blocks.

    force: None (auto) | "flash" | "xla" — test/benchmark override.
    Differentiable on every path (the Pallas kernel carries a custom VJP).
    """
    if force == "flash":
        return _flash_diff(q, k, v, scale)
    if force == "xla":
        return xla_attention(q, k, v, scale)
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if on_tpu and k.shape[1] >= FLASH_MIN_KV and q.shape[-1] % 8 == 0:
        return _flash_diff(q, k, v, scale)
    return xla_attention(q, k, v, scale)


def attention_mh(q, k, v, scale: float | None = None, force: str | None = None):
    """Multihead attention entry on (B, N, H, D) -> (B, N, H, D).

    Folds heads into the batch axis and dispatches through ``attention``.
    Measured note (v5e, 24f ModelScope step): keeping heads as a second
    dot_general batch dim ("bnhd,bshd->bhns") looks transpose-free at the
    jaxpr level but XLA lowers the two-batch-dim dot to a *convolution*
    (convolution_multiply_fusion) and still materialises layout copies —
    ~3% slower end to end than the explicit fold transposes. Don't retry
    without re-profiling.
    """
    b, n, h, d = q.shape
    s = k.shape[1]
    fold = lambda t, length: t.transpose(0, 2, 1, 3).reshape(b * h, length, d)
    out = attention(fold(q, n), fold(k, s), fold(v, s), scale, force)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)
