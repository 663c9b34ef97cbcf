"""Fused cross-pair block apply: one Pallas kernel per row-table level
computing BOTH directions of a (row-slot, small-image) J^T J pair.

The per-PCG-step hot path for BA-style energies is a pair of one-hot
routing matmuls per level (gather p_cam by column ids; aggregate the
transpose product back into cameras).  Expressed as XLA dot_generals
inside the PCG while-loop, XLA hoists the loop-invariant one-hot
[S, W, N] and MATERIALIZES it in HBM — 2 bytes * S per table entry,
~2 GB at BA 1M obs — and every iteration re-reads it twice.  That was
the measured iteration floor (artifacts/tpu_fused_pair.jsonl: XLA
2.80 ms vs fused 1.67 ms at 1M; the reference's cuSPARSE CSR matvec
keeps the same data on-die via atomics, gauss_newton.t:554-625).

This kernel regenerates the one-hot per tile in VMEM from
`broadcasted_iota == ids` — it never exists in HBM.  Per tile it reads
the blocks ONCE and computes:

  rows[ci, n]  = sum_{cj,w} B[w,ci,cj,n] * pcol[cj, ids[w,n]]   (expand)
  cols[cj, s] += sum_{ci,w} B[w,ci,cj,n] * prow[ci, n] routed by ids
                                                              (aggregate)

Blocks are stored w-major ([W*Ci*Cj, N]) so each w's [Ci*Cj, N] plane is
a contiguous 2-D slice: Mosaic has no rank-3 reductions, so the kernel
works in 2-D planes with concatenate/slice group-sums over the tiny
channel axes.

Numerics match the XLA routing path: the value operands round to bf16
(the explicit routing-dtype contract, blocksparse._routing_dtype), the
one-hot is exact in bf16, accumulation is f32
(preferred_element_type).  Out-of-range ids drop silently — table
padding relies on this in both formulations.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _kernel(ids_ref, b_ref, pcol_ref, prow_ref, rows_ref, cols_ref,
            *, Ci, Cj, W, S, N, n_blk):
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        cols_ref[:] = jnp.zeros_like(cols_ref)

    # mask the grid's padded tail: garbage block/id lanes past N must not
    # contribute to the accumulated cols output (rows writes are dropped
    # by the out-of-bounds write semantics, but cols is accumulated)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_blk), 1)
    valid = (pl.program_id(0) * n_blk + lane) < N  # [1, n_blk]

    pcol = pcol_ref[:].astype(jnp.bfloat16)  # [Cj, S]
    prow = prow_ref[:]  # [Ci, n_blk]
    prow_t = jnp.concatenate(
        [prow[ci:ci + 1] for ci in range(Ci) for _ in range(Cj)], axis=0)
    acc_rows = jnp.zeros((Ci, n_blk), jnp.float32)
    acc_cols = jnp.zeros((Cj, S), jnp.float32)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (S, n_blk), 0)
    for w in range(W):
        ids_w = jnp.where(valid, ids_ref[w:w + 1, :], S)  # invalid -> drop
        oh = (iota_s == ids_w).astype(jnp.bfloat16)  # [S, n_blk]
        # expand: gather pcol columns by ids (single nonzero -> exact)
        pc = jax.lax.dot_general(
            pcol, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [Cj, n_blk]
        bw = b_ref[w * Ci * Cj:(w + 1) * Ci * Cj, :].astype(jnp.float32)
        pc_t = jnp.concatenate([pc] * Ci, axis=0)  # [Ci*Cj, n_blk]
        prod = bw * pc_t
        acc_rows = acc_rows + jnp.concatenate(
            [jnp.sum(prod[ci * Cj:(ci + 1) * Cj], axis=0, keepdims=True)
             for ci in range(Ci)], axis=0)
        # aggregate: z[cj] = sum_ci bw[ci*Cj+cj] * prow[ci], routed by ids
        prod2 = bw * prow_t
        z = prod2[0:Cj]
        for ci in range(1, Ci):
            z = z + prod2[ci * Cj:(ci + 1) * Cj]
        # padded-tail block reads are unspecified (NaN in interpret
        # mode); NaN * 0-one-hot would poison the cols contraction
        z = jnp.where(valid, z, 0.0)
        acc_cols = acc_cols + jax.lax.dot_general(
            z.astype(jnp.bfloat16), oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [Cj, S]
    rows_ref[:] = acc_rows
    cols_ref[:] += acc_cols


def _kernel_wloop(ids_ref, b_ref, pcol_ref, prow_ref, rows_ref, cols_ref,
                  acc_ref, *, Ci, Cj, S, N, n_blk):
    """Large-W variant: 2-D grid (tile, w), one degree slot per program.
    Same math as _kernel; w is a grid dimension instead of an unrolled
    loop, so W is unbounded (skew tail levels reach W~700) and the
    blocks tile stays [Ci*Cj, n_blk] regardless of W.  rows_ref is a
    revisited output block (same tile index across the inner w steps);
    cols accumulates in scratch and writes once at the very end."""
    i, w = pl.program_id(0), pl.program_id(1)
    nw = pl.num_programs(1)

    @pl.when((i == 0) & (w == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(w == 0)
    def _():
        rows_ref[:] = jnp.zeros_like(rows_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_blk), 1)
    valid = (i * n_blk + lane) < N
    pcol = pcol_ref[:].astype(jnp.bfloat16)
    prow = prow_ref[:]
    prow_t = jnp.concatenate(
        [prow[ci:ci + 1] for ci in range(Ci) for _ in range(Cj)], axis=0)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (S, n_blk), 0)
    ids_w = jnp.where(valid, ids_ref[0], S)  # [1, n_blk]
    oh = (iota_s == ids_w).astype(jnp.bfloat16)
    pc = jax.lax.dot_general(
        pcol, oh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    bw = b_ref[0].astype(jnp.float32)  # [Ci*Cj, n_blk]
    pc_t = jnp.concatenate([pc] * Ci, axis=0)
    prod = bw * pc_t
    rows_ref[:] += jnp.concatenate(
        [jnp.sum(prod[ci * Cj:(ci + 1) * Cj], axis=0, keepdims=True)
         for ci in range(Ci)], axis=0)
    prod2 = bw * prow_t
    z = prod2[0:Cj]
    for ci in range(1, Ci):
        z = z + prod2[ci * Cj:(ci + 1) * Cj]
    z = jnp.where(valid, z, 0.0)
    acc_ref[:] += jax.lax.dot_general(
        z.astype(jnp.bfloat16), oh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when((i == pl.num_programs(0) - 1) & (w == nw - 1))
    def _():
        cols_ref[:] = acc_ref[:]


# flag: 1 (default) = pallas on TPU, XLA elsewhere; 0 = never;
# "interpret" = pallas interpreter everywhere (CPU tests)
def _mode() -> str:
    return os.environ.get("THALLO_FUSED_PAIR", "1")


def fused_pair_eligible(S: int, W: int, N: int, dtype,
                        Ci: int = 1, Cj: int = 1) -> bool:
    """Static eligibility (called at trace time; recorded on BsrBlocks
    at setup so readers never re-derive it)."""
    mode = _mode()
    if mode == "0":
        return False
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                                jnp.dtype(jnp.bfloat16)):
        return False  # f64 keeps the exact XLA path
    if S > 2048 or S < 1:
        return False  # one-hot tile [S, n_blk] must fit VMEM
    # leave truly small levels on the XLA routing path (their hoisted
    # one-hot is a few MB at most and a kernel instantiation buys
    # nothing); everything bigger fuses — the XLA form materializes
    # S*W*N*2 bytes in HBM (476 MB for skew-1M's W=716 tail level)
    if S * W * N < (1 << 20):
        return False
    # even the W-independent 2-D-grid variant must fit a 256-lane tile
    # in the VMEM budget (huge Ci*Cj): stay on the XLA path otherwise
    bb = jnp.dtype(dtype).itemsize
    if _pick_n_blk(1, Ci, Cj, S, N, bb) == 0:
        return False
    if mode != "interpret" and jax.default_backend() not in ("tpu", "axon"):
        return False
    return True


def _pick_n_blk(W: int, Ci: int, Cj: int, S: int, N: int,
                blk_bytes: int) -> int:
    # VMEM budget per lane: double-buffered blocks tile (actual dtype!) +
    # one-hot [S, n_blk] bf16 + f32 intermediates (bw/prod/prod2/pc_t/
    # prow_t ~ 8 F-planes) + ids.  Target ~5 MB of the 16 MB scoped
    # limit — a 24-wide f32 level at 1280 lanes measured 16.87M and
    # failed to compile (vmem stack OOM), hence the explicit accounting.
    budget = 5 * 1024 * 1024
    F = Ci * Cj
    per_lane = 2 * W * F * blk_bytes + S * 2 + 8 * F * 4 + W * 8 + 64
    n = budget // max(per_lane, 1)
    if n < 256:
        # a very wide level (large W*Ci*Cj) can't fit even the minimum
        # 256-lane tile in budget: signal the caller to use the 2-D-grid
        # W-loop variant (W-independent VMEM) instead of clamping up and
        # recreating the scoped-vmem compile failure (advisor r4)
        return 0
    n = min(2048, (n // 128) * 128)
    n_needed = _cdiv(N, 128) * 128
    return min(n, max(256, n_needed))


# trace-time call counter (tests assert the fused path actually ran;
# incremented when jit traces the wrapper, i.e. once per new shape)
TRACE_COUNT = [0]


@functools.partial(
    jax.jit, static_argnames=("Ci", "Cj", "S", "interpret"))
def fused_pair_apply(ids2d, blocks_wm, pcol, prow, *, Ci, Cj, S,
                     interpret=False):
    """Both directions of a cross pair through one kernel.

    ids2d:     [W, N] int32 column ids (out-of-range = padded/dropped)
    blocks_wm: [W*Ci*Cj, N] w-major edge blocks (bf16 or f32)
    pcol:      [Cj, S] column-side operand
    prow:      [Ci, N] row-side operand
    Returns (rows [Ci, N] f32, cols [Cj, S] f32).
    """
    TRACE_COUNT[0] += 1
    W, N = ids2d.shape
    bb = jnp.dtype(blocks_wm.dtype).itemsize
    out_shape = [
        jax.ShapeDtypeStruct((Ci, N), jnp.float32),
        jax.ShapeDtypeStruct((Cj, S), jnp.float32),
    ]
    n_blk = _pick_n_blk(W, Ci, Cj, S, N, bb) if W <= 8 else 0
    if n_blk > 0:
        # unrolled w loop: best pipelining for the common low-degree
        # levels (uniform BA W=4, base levels); n_blk == 0 means the
        # level is too wide for the unrolled tile — use the 2-D grid
        kern = functools.partial(_kernel, Ci=Ci, Cj=Cj, W=W, S=S, N=N,
                                 n_blk=n_blk)
        rows, cols = pl.pallas_call(
            kern,
            grid=(_cdiv(N, n_blk),),
            in_specs=[
                pl.BlockSpec((W, n_blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((W * Ci * Cj, n_blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Cj, S), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Ci, n_blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((Ci, n_blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Cj, S), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=out_shape,
            interpret=interpret,
        )(ids2d, blocks_wm, pcol.astype(jnp.float32),
          prow.astype(jnp.float32))
        return rows, cols
    # large W: 2-D grid (tile, w), one degree slot per program — W is
    # unbounded (skew tails reach W~700) and VMEM stays W-independent.
    # ids/blocks reshape to 3-D so the w-blocked axis LEADS: the TPU
    # lowering requires the last two block dims be (8,128)-divisible or
    # equal to the array dims, which (1, n_blk)/(F, n_blk) slices of the
    # 2-D forms are not.
    F = Ci * Cj
    n_blk = _pick_n_blk(1, Ci, Cj, S, N, bb)
    kern = functools.partial(_kernel_wloop, Ci=Ci, Cj=Cj, S=S, N=N,
                             n_blk=n_blk)
    rows, cols = pl.pallas_call(
        kern,
        grid=(_cdiv(N, n_blk), W),
        in_specs=[
            pl.BlockSpec((1, 1, n_blk), lambda i, w: (w, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, n_blk), lambda i, w: (w, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cj, S), lambda i, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ci, n_blk), lambda i, w: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Ci, n_blk), lambda i, w: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cj, S), lambda i, w: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((Cj, S), jnp.float32)],
        interpret=interpret,
    )(ids2d.reshape(W, 1, N), blocks_wm.reshape(W, F, N),
      pcol.astype(jnp.float32), prow.astype(jnp.float32))
    return rows, cols
