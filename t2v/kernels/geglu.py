"""Fused GEGLU activation: ``gelu(gate) * h`` over a split projection.

The GEGLU MLP (reference t2v_model.py:813-846) projects tokens to
``2*inner`` channels and combines the halves as ``h * gelu(gate)``.
XLA cannot fuse that combine into either neighbouring GEMM: it mixes two
different output columns of the up-projection (col ``j`` with col
``j + inner``), which a tile-wise dot epilogue can't express, so it runs
as a standalone loop fusion — measured at ~48% of HBM bandwidth on v5e
(0.96 ms for a 378 MB pass at the 32x32x1280 UNet level). This kernel is
the same single pass written directly: stream a row-block of the packed
``(rows, 2*inner)`` projection through VMEM, combine in f32, write the
``(rows, inner)`` result. No fusion opportunity is lost — the op was
already a barrier between two GEMMs.

Backward runs as plain XLA (`_geglu_bwd`): training steps are dominated by
the GEMM gradients, and XLA's elementwise bwd fuses into those fine.

Status note: wiring this kernel into every UNet GEGLU site benched ~26 ms
SLOWER on the end-to-end v5e benchmark (bench.py 24f/256px DDIM-20,
round-3 bisect) — the per-site bandwidth win was outweighed by lost
surrounding fusion — so ``t2v.models.blocks.GEGLUFeedForward`` uses the
plain XLA combine. The kernel stays (tested) for explicit use at shapes
where the f32 materialisation matters (e.g. 1024×576 temporal blocks).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# VMEM budget for choosing the row block. Per row: the double-buffered
# in/out blocks (2*(2*inner + inner)*itemsize B) plus the Mosaic stack's
# f32 temporaries (~4 values of width ``inner`` live at once, 16*inner B)
# — ``(6*itemsize + 16)*inner`` bytes/row (28*inner for bf16, 40*inner for
# f32) against the 16 MB scoped-VMEM ceiling.
_VMEM_BUDGET = 11 * 1024 * 1024


def _erf_gelu32(g):
    """Exact-erf GELU in f32 (the reference uses torch's default erf GELU,
    t2v_model.py:826)."""
    return 0.5 * g * (1.0 + jax.lax.erf(g * (1.0 / math.sqrt(2.0))))


def _erf32_poly(x):
    """erf via Abramowitz-Stegun 7.1.26 (max abs err 1.5e-7 — three orders
    below bf16 output resolution). Pallas TPU has no erf lowering; this
    uses only mul/add/exp, which it does."""
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _geglu_kernel(p_ref, o_ref, *, inner: int):
    h = p_ref[:, :inner].astype(jnp.float32)
    g = p_ref[:, inner:].astype(jnp.float32)
    act = 0.5 * g * (1.0 + _erf32_poly(g * (1.0 / math.sqrt(2.0))))
    o_ref[...] = (h * act).astype(o_ref.dtype)


def _largest_divisor(n: int, cap: int) -> int:
    cap = max(1, min(n, cap))
    for d in range(cap, 0, -1):
        if n % d == 0:
            return d
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def geglu_pallas(proj, *, interpret: bool = False):
    """``proj``: (..., 2*inner) packed ``[h; gate]`` -> (..., inner)."""
    *lead, two_inner = proj.shape
    inner = two_inner // 2
    rows = math.prod(lead)
    p2 = proj.reshape(rows, two_inner)
    cap = _VMEM_BUDGET // ((6 * proj.dtype.itemsize + 16) * inner)
    rb = _largest_divisor(rows, cap)
    padded = rows
    if rb < max(1, min(rows, cap) // 2):
        # no clean divisor (e.g. prime rows): pad up to a multiple of a
        # well-sized sublane-aligned block instead of degrading to tiny
        # grid steps; the tail block computes on zeros and is sliced off
        rb = max(1, min(rows, cap))
        if rb >= 8:
            rb -= rb % 8
        padded = -(-rows // rb) * rb
        p2 = jnp.pad(p2, ((0, padded - rows), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_geglu_kernel, inner=inner),
        grid=(padded // rb,),
        in_specs=[pl.BlockSpec((rb, two_inner), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((rb, inner), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((padded, inner), proj.dtype),
        interpret=interpret,
    )(p2)
    if padded != rows:
        out = out[:rows]
    return out.reshape(*lead, inner)


def _geglu_ref(proj):
    h, gate = jnp.split(proj, 2, axis=-1)
    return h * jax.nn.gelu(gate, approximate=False)


@jax.custom_vjp
def _geglu_diff(proj):
    return geglu_pallas(proj)


def _geglu_fwd(proj):
    return geglu_pallas(proj), proj


def _geglu_bwd(proj, dout):
    inner = proj.shape[-1] // 2
    h = proj[..., :inner].astype(jnp.float32)
    g = proj[..., inner:].astype(jnp.float32)
    d32 = dout.astype(jnp.float32)
    act = _erf_gelu32(g)
    # d/dg gelu(g) = Phi(g) + g * phi(g)
    dact = 0.5 * (1.0 + jax.lax.erf(g * (1.0 / math.sqrt(2.0)))) + g * (
        jnp.exp(-0.5 * g * g) * (1.0 / math.sqrt(2.0 * math.pi))
    )
    dproj = jnp.concatenate([d32 * act, d32 * h * dact], axis=-1)
    return (dproj.astype(proj.dtype),)


_geglu_diff.defvjp(_geglu_fwd, _geglu_bwd)


def geglu(proj, force: str | None = None):
    """Combine a packed GEGLU projection ``[h; gate]`` -> ``h * gelu(gate)``.

    force: None (auto) | "pallas" | "xla" — test/benchmark override.
    """
    if force == "pallas":
        return _geglu_diff(proj)
    if force == "xla":
        return _geglu_ref(proj)
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    inner = proj.shape[-1] // 2
    if on_tpu and proj.shape[-1] % 2 == 0 and inner % 128 == 0:
        return _geglu_diff(proj)
    return _geglu_ref(proj)
