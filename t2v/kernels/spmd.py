"""GSPMD partitioning rules for the Pallas attention kernels.

Mosaic custom calls cannot be partitioned by the SPMD partitioner on their
own, so mesh runs used to force the plain-XLA attention path (the round-2
"attention tax" on every tp/sp job). ``jax.experimental.custom_partitioning``
closes the gap: each kernel declares which of its dims are batch-parallel
(the partitioner may shard them freely and the kernel runs unchanged on the
local block) and which it must see whole (the partitioner inserts the
all-gather the math requires). Shardy sharding rules drive propagation;
the ``partition`` callback re-derives the kernel's static head count from
the LOCAL shapes, so Megatron-style head sharding (tp splits the packed
H·D minor dim at head boundaries) runs the kernel per head-group with no
collective at all.

Partitioning contracts (einsum-like, `(h d)` = packed heads):

  self   : ``b n (h d) ×3 -> b n (h d)``  — b, h shardable; n, d whole.
  cross  : ``b n (h d), b s (h d) ×2 -> b n (h d)``
                                          — b, n (query rows), h shardable;
                                            s (context), d whole.
  flash  : ``b n d, b s d ×2 -> b n d``   — b shardable (heads are already
                                            folded into b); n, s, d whole.

The temporal layout needs no rule of its own: the model transposes to
``(B·N, F, C)`` and rides the self contract (F lands on the replicated
``n`` factor, which is exactly the all-gather frame attention needs under
sp sharding).

Backwards: the short-seq (fused-MHA) wrappers recompute through the XLA
einsum formulation — plain programs the partitioner shards natively, and
at those sequence lengths the (N, S) score matrix is small. The flash
wrapper's backward is the Pallas FlashAttention-2 backward behind its own
batch-parallel partitioning rule (same contract as the forward: b
shardable, n/s/d whole), so mesh training in the long-sequence regime
never materialises the (N, S) scores — matching the single-chip path.

On non-TPU backends the kernels run in Pallas interpret mode, which is how
the 8-device virtual CPU mesh proves kernel==XLA bit-parity in CI
(tests/test_spmd_attention.py) without real multi-chip hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec

__all__ = [
    "spmd_self_attention",
    "spmd_cross_attention",
    "spmd_flash_attention",
    "spmd_temporal_conv_chain",
]


def _interpret() -> bool:
    return jax.default_backend() in ("cpu", "gpu")


def _spec3(sharding) -> list:
    spec = list(getattr(sharding, "spec", ()) or ())
    return spec + [None] * (3 - len(spec))


def _axes_size(mesh, entry) -> int:
    if entry is None:
        return 1
    axes = entry if isinstance(entry, tuple) else (entry,)
    size = 1
    for a in axes:
        size *= mesh.shape[a]
    return size


def _result_spec(mesh, q_sharding, heads: int, *, shard_rows: bool):
    """Output follows q: batch stays, packed-head stays iff it lands on
    head boundaries, query rows stay only where the kernel is row-parallel."""
    spec = _spec3(q_sharding)
    if not shard_rows:
        spec[1] = None
    if heads % _axes_size(mesh, spec[2]) != 0:
        spec[2] = None
    return spec


@functools.lru_cache(maxsize=None)
def _self_partitioned(heads: int, dh: int, scale: float, interpret: bool):
    from t2v.kernels.fused_mha import fused_self_mha

    def fwd(q, k, v):
        return fused_self_mha(q, k, v, heads=heads, scale=scale,
                              interpret=interpret)

    f = custom_partitioning(fwd)

    def infer(mesh, arg_shapes, result_shape):
        del result_shape
        spec = _result_spec(mesh, arg_shapes[0].sharding, heads,
                            shard_rows=False)
        return NamedSharding(mesh, PartitionSpec(*spec))

    def partition(mesh, arg_shapes, result_shape):
        del result_shape
        hd_global = arg_shapes[0].shape[-1]
        spec = _result_spec(mesh, arg_shapes[0].sharding, heads,
                            shard_rows=False)
        sh = NamedSharding(mesh, PartitionSpec(*spec))

        def lower(q, k, v):
            h_local = heads * q.shape[-1] // hd_global
            return fused_self_mha(q, k, v, heads=h_local, scale=scale,
                                  interpret=interpret)

        return mesh, lower, sh, (sh, sh, sh)

    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b n (h d), b n (h d), b n (h d) -> b n (h d)",
        need_replication_factors=("n", "d"),
        h=heads, d=dh,
    )
    return f


@functools.lru_cache(maxsize=None)
def _cross_partitioned(heads: int, dh: int, scale: float, interpret: bool):
    from t2v.kernels.fused_mha import fused_cross_mha

    def fwd(q, k, v):
        return fused_cross_mha(q, k, v, heads=heads, scale=scale,
                               interpret=interpret)

    f = custom_partitioning(fwd)

    def infer(mesh, arg_shapes, result_shape):
        del result_shape
        spec = _result_spec(mesh, arg_shapes[0].sharding, heads,
                            shard_rows=True)
        return NamedSharding(mesh, PartitionSpec(*spec))

    def partition(mesh, arg_shapes, result_shape):
        del result_shape
        hd_global = arg_shapes[0].shape[-1]
        spec = _result_spec(mesh, arg_shapes[0].sharding, heads,
                            shard_rows=True)
        q_sh = NamedSharding(mesh, PartitionSpec(*spec))
        kv_sh = NamedSharding(mesh, PartitionSpec(spec[0], None, spec[2]))

        def lower(q, k, v):
            h_local = heads * q.shape[-1] // hd_global
            return fused_cross_mha(q, k, v, heads=h_local, scale=scale,
                                   interpret=interpret)

        return mesh, lower, q_sh, (q_sh, kv_sh, kv_sh)

    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b n (h d), b s (h d), b s (h d) -> b n (h d)",
        need_replication_factors=("d", "s"),  # factor-index order (shardy)
        h=heads, d=dh,
    )
    return f


@functools.lru_cache(maxsize=None)
def _flash_partitioned(scale: float, interpret: bool):
    from t2v.kernels.flash_attention import flash_attention

    def fwd(q, k, v):
        return flash_attention(q, k, v, scale, interpret=interpret)

    f = custom_partitioning(fwd)

    def infer(mesh, arg_shapes, result_shape):
        del result_shape
        spec = _spec3(arg_shapes[0].sharding)
        return NamedSharding(mesh, PartitionSpec(spec[0], None, None))

    def partition(mesh, arg_shapes, result_shape):
        del result_shape
        spec = _spec3(arg_shapes[0].sharding)
        sh = NamedSharding(mesh, PartitionSpec(spec[0], None, None))

        def lower(q, k, v):
            return flash_attention(q, k, v, scale, interpret=interpret)

        return mesh, lower, sh, (sh, sh, sh)

    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b n d, b s d, b s d -> b n d",
        need_replication_factors=("n", "d", "s"),  # factor-index order
    )
    return f


# --- differentiable entries (XLA-recompute backwards, natively SPMD) -----


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _self_diff(q, k, v, heads, scale):
    dh = q.shape[-1] // heads
    return _self_partitioned(heads, dh, scale, _interpret())(q, k, v)


def _self_diff_fwd(q, k, v, heads, scale):
    return _self_diff(q, k, v, heads, scale), (q, k, v)


def _self_diff_bwd(heads, scale, res, g):
    from t2v.kernels.attention import _self_mha_ref

    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _self_mha_ref(a, b, c, heads, scale),
                     q, k, v)
    return vjp(g)


_self_diff.defvjp(_self_diff_fwd, _self_diff_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _cross_diff(q, k, v, heads, scale):
    dh = q.shape[-1] // heads
    return _cross_partitioned(heads, dh, scale, _interpret())(q, k, v)


def _cross_diff_fwd(q, k, v, heads, scale):
    return _cross_diff(q, k, v, heads, scale), (q, k, v)


def _cross_diff_bwd(heads, scale, res, g):
    from t2v.kernels.attention import _cross_mha_ref

    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _cross_mha_ref(a, b, c, heads, scale),
                     q, k, v)
    return vjp(g)


_cross_diff.defvjp(_cross_diff_fwd, _cross_diff_bwd)


@functools.lru_cache(maxsize=None)
def _flash_fwd_partitioned(scale: float, interpret: bool):
    """Training forward: (out, lse) residual variant, same batch-only
    partitioning contract as the inference forward."""
    from t2v.kernels.flash_attention import flash_attention_fwd

    def fwd(q, k, v):
        return flash_attention_fwd(q, k, v, scale, interpret=interpret)

    f = custom_partitioning(fwd)

    def _shardings(mesh, q_sharding):
        spec = _spec3(q_sharding)
        return (
            NamedSharding(mesh, PartitionSpec(spec[0], None, None)),
            NamedSharding(mesh, PartitionSpec(spec[0], None)),
        )

    def infer(mesh, arg_shapes, result_shape):
        del result_shape
        return _shardings(mesh, arg_shapes[0].sharding)

    def partition(mesh, arg_shapes, result_shape):
        del result_shape
        out_sh = _shardings(mesh, arg_shapes[0].sharding)
        in_sh = out_sh[0]

        def lower(q, k, v):
            return flash_attention_fwd(q, k, v, scale, interpret=interpret)

        return mesh, lower, out_sh, (in_sh, in_sh, in_sh)

    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b n d, b s d, b s d -> b n d, b n",
        need_replication_factors=("n", "d", "s"),  # factor-index order
    )
    return f


@functools.lru_cache(maxsize=None)
def _flash_bwd_partitioned(scale: float, interpret: bool):
    """FlashAttention-2 backward, batch-parallel like the forward — each
    shard recomputes its own rows' score blocks in VMEM, so the (N, S)
    matrix never hits HBM on any shard."""
    from t2v.kernels.flash_attention import flash_attention_bwd

    def bwd(q, k, v, o, lse, do):
        return flash_attention_bwd(
            q, k, v, o, lse, do, scale, interpret=interpret
        )

    f = custom_partitioning(bwd)

    def _shardings(mesh, q_sharding):
        b = _spec3(q_sharding)[0]
        sh3 = NamedSharding(mesh, PartitionSpec(b, None, None))
        sh2 = NamedSharding(mesh, PartitionSpec(b, None))
        return sh3, sh2

    def infer(mesh, arg_shapes, result_shape):
        del result_shape
        sh3, _ = _shardings(mesh, arg_shapes[0].sharding)
        return (sh3, sh3, sh3)

    def partition(mesh, arg_shapes, result_shape):
        del result_shape
        sh3, sh2 = _shardings(mesh, arg_shapes[0].sharding)

        def lower(q, k, v, o, lse, do):
            return flash_attention_bwd(
                q, k, v, o, lse, do, scale, interpret=interpret
            )

        return mesh, lower, (sh3, sh3, sh3), (sh3, sh3, sh3, sh3, sh2, sh3)

    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=(
            "b n d, b s d, b s d, b n d, b n, b n d -> b n d, b s d, b s d"
        ),
        need_replication_factors=("n", "d", "s"),  # factor-index order
    )
    return f


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_diff(q, k, v, scale):
    return _flash_partitioned(scale, _interpret())(q, k, v)


def _flash_diff_fwd(q, k, v, scale):
    out, lse = _flash_fwd_partitioned(scale, _interpret())(q, k, v)
    return out, (q, k, v, out, lse)


def _flash_diff_bwd(scale, res, g):
    q, k, v, o, lse = res
    dq, dk, dv = _flash_bwd_partitioned(scale, _interpret())(
        q, k, v, o, lse, g.astype(o.dtype)
    )
    return dq, dk, dv


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


_TCONV_RULE = (
    "b f n c, " + ", ".join(["c, c, t c e, e"] * 4) + " -> b f n c"
)


@functools.lru_cache(maxsize=None)
def _tconv_partitioned(eps: float, interpret: bool):
    """Fused temporal-conv chain (kernels/temporal_conv.py), batch-parallel.

    Contract: ``b f n c`` with only ``b`` shardable — GroupNorm statistics
    are joint over (F, HW, group channels) per batch element, and the
    temporal conv mixes frames, so the kernel must see the full f/n/c
    extents; the partitioner inserts the frame all-gather an sp mesh
    needs (the same gather the plain-XLA formulation's GN forces). The 16
    layer params (4× GN scale/bias + (3, C, C) conv weight + conv bias)
    are replicated. Closes the round-4 gap where tp/sp meshes forced
    ``temporal_conv_backend="xla"`` and gave back the fused chain's 7%."""
    from t2v.kernels.temporal_conv import temporal_conv_chain

    def fwd(x, *flat):
        layers = tuple(tuple(flat[i * 4:(i + 1) * 4]) for i in range(4))
        return temporal_conv_chain(x, layers, eps=eps, interpret=interpret)

    f = custom_partitioning(fwd)

    def _x_sharding(mesh, x_sharding):
        spec = list(getattr(x_sharding, "spec", ()) or ())
        spec += [None] * (4 - len(spec))
        return NamedSharding(mesh, PartitionSpec(spec[0], None, None, None))

    def infer(mesh, arg_shapes, result_shape):
        del result_shape
        return _x_sharding(mesh, arg_shapes[0].sharding)

    def partition(mesh, arg_shapes, result_shape):
        del result_shape
        x_sh = _x_sharding(mesh, arg_shapes[0].sharding)
        rep = NamedSharding(mesh, PartitionSpec())
        return mesh, fwd, x_sh, (x_sh,) + (rep,) * 16

    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=_TCONV_RULE,
        need_replication_factors=("f", "n", "c", "t", "e"),
    )
    return f


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _tconv_diff(x, layers, eps):
    flat = tuple(a for layer in layers for a in layer)
    return _tconv_partitioned(eps, _interpret())(x, *flat)


def _tconv_diff_fwd(x, layers, eps):
    return _tconv_diff(x, layers, eps), (x, layers)


def _tconv_diff_bwd(eps, res, g):
    from t2v.kernels.temporal_conv import chain_ref

    x, layers = res
    _, vjp = jax.vjp(lambda xx, ll: chain_ref(xx, ll, eps), x, layers)
    return vjp(g)


_tconv_diff.defvjp(_tconv_diff_fwd, _tconv_diff_bwd)


def spmd_temporal_conv_chain(x, layers, eps: float = 1e-5):
    """GSPMD-partitionable fused TemporalConvBlock chain: x (B, F, HW, C),
    layers = 4 tuples of (gn_scale, gn_bias, (3, C, C) weight, conv_bias).
    Batch-shardable; f/n/c replicated (gathered by the partitioner where
    the mesh shards them). Backward recomputes through ``chain_ref`` —
    plain XLA the partitioner shards natively, matching the single-chip
    entry's VJP trade."""
    return _tconv_diff(x, tuple(tuple(l) for l in layers), float(eps))


def spmd_self_attention(q, k, v, heads: int, scale: float | None = None):
    """(B, N, H·D) packed-head self-attention, partitionable over b and h."""
    if scale is None:
        scale = (q.shape[-1] // heads) ** -0.5
    return _self_diff(q, k, v, heads, float(scale))


def spmd_cross_attention(q, k, v, heads: int, scale: float | None = None):
    """(B, N, H·D) × (B, S, H·D) packed-head cross-attention,
    partitionable over b, the query rows n, and h."""
    if scale is None:
        scale = (q.shape[-1] // heads) ** -0.5
    return _cross_diff(q, k, v, heads, float(scale))


def spmd_flash_attention(q, k, v, scale: float | None = None):
    """(B, N, D) folded-head flash attention, partitionable over b."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash_diff(q, k, v, float(scale))
