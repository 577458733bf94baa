"""Chansum GroupNorm with virtual-concat support (XLA formulation).

Per-channel sum/sum² reductions (f32) folded into groups on tiny ``(B, C)``
tensors, then a single elementwise normalise+affine pass (+ optional fused
SiLU); handles the virtual channel concat ``[a; b]`` with exact joint
group statistics without materialising the concat (the reference does
``th.cat`` + ``nn.GroupNorm``, t2v_model.py:316-318).

Status: RECORDED NEGATIVE RESULT, kept (with tests) so it is not re-tried.
Two formulations of GroupNorm both lost to the plain ``nn.GroupNorm``
lowering on the end-to-end v5e benchmark (bench.py, 24f/256px DDIM-20):
  * a hand-written Pallas kernel (one VMEM residency, one-hot-matmul group
    folding): a fusion barrier — XLA can no longer hide the stat pass in
    the producer or fuse the normalise into the consumer;
  * THIS chansum formulation, wired into every UNet norm site: it benched
    well against an older baseline, but the round-3 bisect attributed
    +79 ms to the switch once the fused packed-head attention state was
    the baseline (2.997 s -> 3.076 s; see blocks.py's perf-history note).
``t2v.models.blocks.GroupNorm32`` therefore uses ``nn.GroupNorm`` for the
single-tensor path and the joint-stats math only for the virtual
skip-concat pair (where avoiding the materialised concat is the win).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _normalize(x32, mu_c, inv_c, scale, bias, silu: bool):
    out = (x32 - mu_c) * inv_c * scale + bias
    if silu:
        out = out * jax.nn.sigmoid(out)
    return out


def group_norm(
    x,
    scale,
    bias,
    b_part=None,
    num_groups: int = 32,
    eps: float = 1e-5,
    silu: bool = False,
):
    """GroupNorm over ``x`` or the virtual channel concat ``[x; b_part]``
    (never materialised).

    x, b_part: (B, ..., C_i) with identical non-channel dims. scale/bias:
    (C_x [+ C_b],). f32 statistics; outputs keep input dtypes. Returns a
    tensor, or an (x, b) tuple when ``b_part`` is given.
    """
    xs = (x,) if b_part is None else (x, b_part)
    channels = tuple(t.shape[-1] for t in xs)
    total_c = sum(channels)
    g = total_c // num_groups
    bsz = xs[0].shape[0]
    red = tuple(range(1, xs[0].ndim - 1))
    n_el = int(np.prod([xs[0].shape[i] for i in red]))
    xs32 = [t.astype(jnp.float32) for t in xs]
    s = jnp.concatenate([t.sum(red) for t in xs32], axis=-1)
    s2 = jnp.concatenate([(t * t).sum(red) for t in xs32], axis=-1)
    gs = s.reshape(bsz, num_groups, g).sum(-1)
    gs2 = s2.reshape(bsz, num_groups, g).sum(-1)
    cnt = n_el * g
    mu = gs / cnt
    var = gs2 / cnt - mu * mu
    inv = jax.lax.rsqrt(var + eps)
    mu_c = jnp.repeat(mu, g, axis=-1)
    inv_c = jnp.repeat(inv, g, axis=-1)
    scale32 = scale.astype(jnp.float32)
    bias32 = bias.astype(jnp.float32)
    outs = []
    off = 0
    for t, t32, c in zip(xs, xs32, channels):
        sl = slice(off, off + c)
        shp = (bsz,) + (1,) * (t.ndim - 2) + (-1,)
        pshp = (1,) * (t.ndim - 1) + (-1,)
        out = _normalize(
            t32, mu_c[:, sl].reshape(shp), inv_c[:, sl].reshape(shp),
            scale32[sl].reshape(pshp), bias32[sl].reshape(pshp), silu,
        )
        outs.append(out.astype(t.dtype))
        off += c
    return outs[0] if b_part is None else tuple(outs)
