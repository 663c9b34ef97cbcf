"""Destination-tiled one-hot-matmul segment sum.

The TPU-native replacement for the reference's warp-aggregated atomic
scatters (/root/reference/API/src/cuda_util.t:334-429) on graph energies.
XLA's scatter-add on TPU costs ~12 cycles/row (measured ~3.5 ms for 261k
rows); tiny-row inverse gathers are even worse (~5x).  This formulation
has NO scatter at all:

  1. (init-time, host) sort edge indices by destination; tile the
     destination space into windows of TILE_N segments; every tile's
     edges are then a contiguous run of the sorted order, padded to a
     common TE.
  2. (on device) gather each tile's rows, build a [TE, TILE_N] one-hot of
     the within-tile destination, and batch-matmul on the MXU:
     partial[t] = onehot[t]^T @ data[t].  Concatenated partials ARE the
     result — destinations are contiguous per tile, so a reshape replaces
     the scatter.

Degenerate distributions (a tile with a huge share of the rows) make TE
explode; build_plan returns None past a padding-waste cap and callers
fall back to jax.ops.segment_sum.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SegSumPlan:
    gather_idx: jnp.ndarray  # [T, TE] int32 into the data rows (M = pad row)
    rel: jnp.ndarray  # [T, TE] int32 within-tile destination (0..TILE_N-1)
    mask: jnp.ndarray  # [T, TE, 1] {0,1}
    # static (shape-determining) metadata, not traced
    tile_n: int = dataclasses.field(metadata=dict(static=True), default=128)
    num_segments: int = dataclasses.field(metadata=dict(static=True), default=0)


def build_plan(
    ids: np.ndarray,
    num_segments: int,
    tile_n: int = 128,
    max_waste: float = 8.0,
) -> Optional[SegSumPlan]:
    """Host-side static plan for `ids` (destination per row)."""
    ids = np.asarray(ids)
    M = ids.shape[0]
    if M == 0:
        return None
    order = np.argsort(ids, kind="stable").astype(np.int32)
    sorted_ids = ids[order]
    T = -(-num_segments // tile_n)
    T = -(-T // 8) * 8  # pad tile count for 8-sublane pallas blocks
    tile_of = sorted_ids // tile_n
    counts = np.bincount(tile_of, minlength=T)
    te = int(counts.max())
    TE = max(8, -(-te // 8) * 8)
    if TE * T > max_waste * M + 8 * T:
        return None  # too much padding: degenerate distribution
    gather_idx = np.full((T, TE), M, np.int32)
    rel = np.zeros((T, TE), np.int32)
    mask = np.zeros((T, TE, 1), np.float32)
    starts = np.cumsum(counts) - counts
    pos = np.arange(M) - starts[tile_of]
    gather_idx[tile_of, pos] = order
    rel[tile_of, pos] = sorted_ids - tile_of * tile_n
    mask[tile_of, pos] = 1.0
    return SegSumPlan(
        gather_idx=jnp.asarray(gather_idx),
        rel=jnp.asarray(rel),
        mask=jnp.asarray(mask),
        tile_n=tile_n,
        num_segments=num_segments,
    )


ONEHOT_MAX_SEGMENTS = 1024


def bf16_split3(x):
    """3-term bf16 decomposition of an f32 array (float-float style):
    x == h1 + h2 + h3 up to ~2^-24 relative — jointly full f32 mantissa.

    Purpose: an EXACT one-hot contraction at bf16 MXU rate.  The one-hot
    operand is exactly representable in bf16 (0/1), so only the value
    side needs splitting: three bf16×bf16 passes reproduce the f32
    result, where Precision.HIGHEST spends six passes splitting BOTH
    operands (and Precision.HIGH's three passes are NOT exact for
    one-hot dots — measured 7e-4, artifacts/tpu_onehot_precision.jsonl).
    Measured max rel err vs a float64 oracle under heavy cancellation:
    split-3 7.2e-4 vs HIGHEST 2.4e-3 (split-3 is a touch MORE accurate;
    gathers — single nonzero per output — come out bit-exact).

    ONLY for non-differentiated sites: JAX's AD through the split's
    convert/subtract chain rounds cotangents to bf16 without the
    cancellation structure, producing garbage gradients (measured rel
    err ~1.8).  Differentiated one-hot dots must keep HIGHEST."""
    h1 = x.astype(jnp.bfloat16)
    r1 = x - h1.astype(x.dtype)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(x.dtype)).astype(jnp.bfloat16)
    return h1, h2, h3


@functools.partial(jax.custom_jvp, nondiff_argnums=(2,))
def dot_oh_exact(values, onehot_bf16, dimension_numbers):
    """Exact f32 dot against a 0/1 bf16 operand in 3 bf16 MXU passes
    (see bf16_split3; non-differentiated sites only — the contract is
    machine-enforced: differentiating through this raises instead of
    producing the garbage cotangents AD of the bf16 split would give,
    advisor r4).  Falls back to a single HIGHEST dot on CPU (f32 dots
    are exact there) and for f64."""
    if values.dtype != jnp.float32 or jax.default_backend() == "cpu":
        return jax.lax.dot_general(
            values, onehot_bf16.astype(values.dtype), dimension_numbers,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=values.dtype)
    out = None
    for h in bf16_split3(values):
        d = jax.lax.dot_general(h, onehot_bf16, dimension_numbers,
                                preferred_element_type=jnp.float32)
        out = d if out is None else out + d
    return out


@dot_oh_exact.defjvp
def _dot_oh_exact_jvp(dimension_numbers, primals, tangents):
    raise NotImplementedError(
        "dot_oh_exact is non-differentiable by contract: AD through the "
        "bf16 split rounds cotangents without the cancellation structure "
        "(measured rel err ~1.8, see bf16_split3).  Differentiated "
        "one-hot dots must use dot_general with Precision.HIGHEST.")


def onehot_segment_sum(data: jnp.ndarray, ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Exact scatter-free segment sum for SMALL segment counts: one dense
    one-hot matmul on the MXU.  For num_segments <= ~1k the one-hot
    [M, S] is a few MB and the matmul is ~microseconds, vs ~12 cycles/row
    for XLA's scatter (measured 3.5 ms at M=261k).  This is the common
    shape for camera/pose/weight unknowns gathered from large observation
    domains (bundle adjustment cameras, blendshape weights, procrustes)."""
    onehot = (
        ids[:, None] == jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], num_segments), 1)
    ).astype(data.dtype)
    return jax.lax.dot_general(
        onehot,
        data,
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )


_EXPAND_L = 128  # low-digit radix: one MXU contraction tile


def gather_with_onehot_transpose(src, idx, num_segments):
    """Gather src[idx] expressed as a dense one-hot matmul, so XLA's OWN
    transpose is the one-hot segment sum (no custom primitive: fully
    vmappable/batchable, unlike linear_call which has no batching rule —
    caught by the lowering fuzzer).

    For S > 256 the one-hot decomposes into two digits (hi = idx // 128,
    lo = idx % 128): the expand contracts a DENSE K=128 one-hot against
    the [128, H*C] reshaped source and an H-way hi-digit mask selects
    the right slab.  Selection stays exact (each (hi, lo) pair picks
    one source row; HIGHEST precision on the K=128 dot), AD/vmap keep
    working (plain XLA ops), and the compare generation drops from
    R*S to R*(128 + H) — the [1M, 1024] iota-compare + dot measured
    5.8 ms of the BA uniform-1M fixed step (trace r5, fusion.18/19);
    the same decomposition in the fused pair kernel measured ~1.35x
    (artifacts/tpu_decomp.jsonl)."""
    R = idx.shape[0]
    S = num_segments
    if S <= 2 * _EXPAND_L or src.ndim != 2:
        onehot = (
            idx[:, None] == jax.lax.broadcasted_iota(jnp.int32, (R, S), 1)
        ).astype(src.dtype)
        return jax.lax.dot_general(
            onehot,
            src,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
    L = _EXPAND_L
    H = -(-S // L)
    C = src.shape[1]
    pad = H * L - S
    srcp = jnp.pad(src, ((0, pad), (0, 0))) if pad else src
    # [L, H*C]: row lo holds every hi's channels for that low digit
    src_lh = jnp.transpose(srcp.reshape(H, L, C), (1, 0, 2)).reshape(
        L, H * C)
    lo = idx % L
    hi = idx // L
    oh_lo = (
        lo[:, None] == jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    ).astype(src.dtype)
    a = jax.lax.dot_general(
        oh_lo, src_lh, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)  # [R, H*C]
    a = a.reshape(R, H, C)
    mask = (
        hi[:, None] == jax.lax.broadcasted_iota(jnp.int32, (R, H), 1)
    ).astype(src.dtype)
    return jnp.sum(a * mask[:, :, None], axis=1)  # [R, C]


def minor_gather_onehot(cat: jnp.ndarray, idx: jnp.ndarray, n_src: int) -> jnp.ndarray:
    """Channel-major gather cat[:, idx] ([C, N] -> [C, R]) as a one-hot
    MXU matmul for SMALL sources: per-index gathers cost ~8-12 cycles on
    TPU regardless of width (PERF.md), so a 250k-index read of a
    256-camera image costs ~3 ms as a gather but ~0.03 ms as a matmul
    (2*C*R*N FLOPs).  Exact: each one-hot column selects one element, so
    the accumulation has a single nonzero term — BUT only at explicit
    HIGHEST precision: XLA's DEFAULT matmul precision rounds the f32
    value operand to bf16 on TPU, silently perturbing the gathered
    VALUES (~0.4%; measured to stall LM convergence 250x on BA — see
    PERF.md "the default-precision trap").  The AD transpose is the
    transposed matmul = the one-hot segment sum, also scatter-free."""
    onehot = (
        idx[None, :] == jax.lax.broadcasted_iota(
            jnp.int32, (n_src, idx.shape[0]), 0)
    ).astype(cat.dtype)
    return jax.lax.dot_general(
        cat, onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )


def tiled_segment_sum(data: jnp.ndarray, plan: SegSumPlan) -> jnp.ndarray:
    """data: [M, C] -> [num_segments, C], scatter-free (XLA einsum
    variant; see pallas_segment_sum for the VMEM-resident kernel)."""
    M, C = data.shape
    T, TE = plan.gather_idx.shape
    padded = jnp.concatenate([data, jnp.zeros((1, C), data.dtype)], axis=0)
    g = jnp.take(padded, plan.gather_idx.reshape(-1), axis=0).reshape(T, TE, C)
    g = g * plan.mask
    onehot = (
        plan.rel[..., None]
        == jax.lax.broadcasted_iota(jnp.int32, (T, TE, plan.tile_n), 2)
    ).astype(data.dtype)
    part = jnp.einsum(
        "tek,tec->tkc", onehot, g, precision=jax.lax.Precision.HIGHEST
    )
    return part.reshape(T * plan.tile_n, C)[: plan.num_segments]


def pallas_segment_sum(data: jnp.ndarray, plan: SegSumPlan, interpret=None) -> jnp.ndarray:
    """Pallas TPU kernel: per destination tile, build the [TE, TILE_N]
    one-hot IN VMEM and contract it against the tile's rows with one MXU
    dot — the one-hot never touches HBM (XLA materializes it, costing
    ~100 MB of traffic; here total HBM traffic is just the padded rows +
    output).  The TPU answer to the reference's warp-aggregated atomic
    scatter (cuda_util.t:334-429)."""
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    M, C = data.shape
    T, TE = plan.gather_idx.shape
    TN = plan.tile_n
    padded = jnp.concatenate([data, jnp.zeros((1, C), data.dtype)], axis=0)
    g = jnp.take(padded, plan.gather_idx.reshape(-1), axis=0).reshape(T, TE, C)
    g = g * plan.mask

    BT = 8  # tiles per pallas block (sublane alignment)

    def kernel(rel_ref, g_ref, out_ref):
        rel = rel_ref[...]  # [BT, TE]
        onehot = (
            rel[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (BT, TE, TN), 2)
        ).astype(g_ref.dtype)
        out_ref[...] = jax.lax.dot_general(
            onehot,
            g_ref[...],
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)

    part = pl.pallas_call(
        kernel,
        grid=(T // BT,),
        in_specs=[
            pl.BlockSpec((BT, TE), lambda t: (t, 0)),
            pl.BlockSpec((BT, TE, C), lambda t: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((BT, TN, C), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, TN, C), data.dtype),
        interpret=interpret,
    )(plan.rel, g)
    return part.reshape(T * TN, C)[: plan.num_segments]
