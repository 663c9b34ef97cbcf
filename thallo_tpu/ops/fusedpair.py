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


# two-digit id decomposition (the skew-tail lever, PERF.md r4): for
# S > _DECOMP_MIN the routing one-hot [S, n] is replaced by a LOW-digit
# one-hot [L=128, n] plus a HIGH-digit mask [H=ceil(S/L), n].  Generation
# drops from S*N compares to (L+H)*N, and — the bigger term at 1024
# cameras — the expand dot's MXU tile feeds drop from ceil(S/128) to 1
# per output tile (the [Cj, S]-operand dot fed mostly-empty one-hot
# tiles; the [Cj*H, L] form feeds a dense K=128 contraction).  Exactness
# is preserved: each (hi, lo) pair still selects exactly one source
# column, so every accumulation has a single nonzero term.
_DECOMP_L = 128
_DECOMP_MIN = 256


def _use_decomp(S: int) -> bool:
    if os.environ.get("THALLO_FUSED_DECOMP", "1") == "0":
        return False
    return S > _DECOMP_MIN


def _digit_masks(ids_w, S, H, n_blk):
    """oh_lo [L, n] bf16 one-hot of id%L; ohhi [H, n] f32 mask of id//L.
    ids must be pre-masked so invalid lanes carry an id >= H*L (their
    hi digit then matches no row) or land in zero-padded pcol columns
    (ids in [S, H*L))."""
    L = _DECOMP_L
    lo = jax.lax.bitwise_and(ids_w, L - 1)
    hi = jax.lax.shift_right_logical(ids_w, 7)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (L, n_blk), 0)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (H, n_blk), 0)
    oh_lo = (iota_l == lo).astype(jnp.bfloat16)
    ohhi = (iota_h == hi).astype(jnp.float32)
    return oh_lo, ohhi


def _pair_w_direct(ids_w, bw, valid, pcol, prow_t, S, Ci, Cj, n_blk):
    """One degree slot, direct one-hot form (small S).  pcol [Cj, S]
    bf16; returns (rows_contrib [Ci, n], cols_contrib [Cj, S])."""
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (S, n_blk), 0)
    oh = (iota_s == ids_w).astype(jnp.bfloat16)  # [S, n_blk]
    # expand: gather pcol columns by ids (single nonzero -> exact)
    pc = jax.lax.dot_general(
        pcol, oh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [Cj, n_blk]
    pc_t = jnp.concatenate([pc] * Ci, axis=0)  # [Ci*Cj, n_blk]
    prod = bw * pc_t
    rows = jnp.concatenate(
        [jnp.sum(prod[ci * Cj:(ci + 1) * Cj], axis=0, keepdims=True)
         for ci in range(Ci)], axis=0)
    # aggregate: z[cj] = sum_ci bw[ci*Cj+cj] * prow[ci], routed by ids
    prod2 = bw * prow_t
    z = prod2[0:Cj]
    for ci in range(1, Ci):
        z = z + prod2[ci * Cj:(ci + 1) * Cj]
    # padded-tail block reads are unspecified (NaN in interpret mode)
    # and NaN survives the 0-one-hot multiply: zero AFTER the products
    z = jnp.where(valid, z, 0.0)
    cols = jax.lax.dot_general(
        z.astype(jnp.bfloat16), oh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [Cj, S]
    return rows, cols


def _pair_w_decomp(ids_w, bw, valid, pcol_hl, prow_t, S, H, Ci, Cj, n_blk):
    """One degree slot, two-digit form.  pcol_hl [Cj*H, L] bf16 (row
    cj*H+h = pcol[cj, h*L:(h+1)*L], zero-padded past S); returns
    (rows_contrib [Ci, n], cols_contrib [Cj*H, L])."""
    oh_lo, ohhi = _digit_masks(ids_w, S, H, n_blk)
    ohhi_t = jnp.concatenate([ohhi] * Cj, axis=0)  # [Cj*H, n_blk]
    # expand: A2[cj*H+h, n] = pcol[cj, h*L + lo[n]] (exact gather), then
    # the hi mask selects the one correct h per lane
    A2 = jax.lax.dot_general(
        pcol_hl, oh_lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [Cj*H, n_blk]
    sel = A2 * ohhi_t
    pc = jnp.concatenate(
        [jnp.sum(sel[cj * H:(cj + 1) * H], axis=0, keepdims=True)
         for cj in range(Cj)], axis=0)  # [Cj, n_blk]
    pc_t = jnp.concatenate([pc] * Ci, axis=0)  # [Ci*Cj, n_blk]
    prod = bw * pc_t
    rows = jnp.concatenate(
        [jnp.sum(prod[ci * Cj:(ci + 1) * Cj], axis=0, keepdims=True)
         for ci in range(Ci)], axis=0)
    # aggregate: zh[cj*H+h, n] = z[cj, n] * ohhi[h, n], contracted with
    # the lo one-hot over n -> [Cj*H, L]
    prod2 = bw * prow_t
    z = prod2[0:Cj]
    for ci in range(1, Ci):
        z = z + prod2[ci * Cj:(ci + 1) * Cj]
    # zero padded-tail lanes AFTER the multiply (NaN block reads survive
    # a 0-mask multiply)
    z = jnp.where(valid, z, 0.0)
    z_t = jnp.concatenate(
        [z[cj:cj + 1] for cj in range(Cj) for _ in range(H)], axis=0)
    zh = (z_t * ohhi_t).astype(jnp.bfloat16)  # [Cj*H, n_blk]
    cols = jax.lax.dot_general(
        zh, oh_lo, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [Cj*H, L]
    return rows, cols


def _kernel(ids_ref, b_ref, pcol_ref, prow_ref, rows_ref, cols_ref,
            *, Ci, Cj, W, S, H, N, n_blk):
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        cols_ref[:] = jnp.zeros_like(cols_ref)

    # mask the grid's padded tail: garbage block/id lanes past N must not
    # contribute to the accumulated cols output (rows writes are dropped
    # by the out-of-bounds write semantics, but cols is accumulated)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_blk), 1)
    valid = (pl.program_id(0) * n_blk + lane) < N  # [1, n_blk]

    pcol = pcol_ref[:].astype(jnp.bfloat16)  # [Cj, S] | [Cj*H, L]
    prow = prow_ref[:]  # [Ci, n_blk]
    prow_t = jnp.concatenate(
        [prow[ci:ci + 1] for ci in range(Ci) for _ in range(Cj)], axis=0)
    acc_rows = jnp.zeros((Ci, n_blk), jnp.float32)
    acc_cols = jnp.zeros(cols_ref.shape, jnp.float32)
    drop = H * _DECOMP_L if H else S
    for w in range(W):
        ids_w = jnp.where(valid, ids_ref[w:w + 1, :], drop)  # invalid -> drop
        bw = b_ref[w * Ci * Cj:(w + 1) * Ci * Cj, :].astype(jnp.float32)
        if H:
            r, c = _pair_w_decomp(ids_w, bw, valid, pcol, prow_t, S, H,
                                  Ci, Cj, n_blk)
        else:
            r, c = _pair_w_direct(ids_w, bw, valid, pcol, prow_t, S,
                                  Ci, Cj, n_blk)
        acc_rows = acc_rows + r
        acc_cols = acc_cols + c
    rows_ref[:] = acc_rows
    cols_ref[:] += acc_cols


def _kernel_wloop(ids_ref, b_ref, pcol_ref, prow_ref, rows_ref, cols_ref,
                  acc_ref, *, Ci, Cj, S, H, N, n_blk):
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
    drop = H * _DECOMP_L if H else S
    ids_w = jnp.where(valid, ids_ref[0], drop)  # [1, n_blk]
    bw = b_ref[0].astype(jnp.float32)  # [Ci*Cj, n_blk]
    if H:
        r, c = _pair_w_decomp(ids_w, bw, valid, pcol, prow_t, S, H, Ci,
                              Cj, n_blk)
    else:
        r, c = _pair_w_direct(ids_w, bw, valid, pcol, prow_t, S, Ci, Cj,
                              n_blk)
    rows_ref[:] += r
    acc_ref[:] += c

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
    # one-hot [S, n_blk] bf16 (or the two-digit [L+H, n_blk] masks plus
    # [Cj*H, n_blk] intermediates) + f32 intermediates (bw/prod/prod2/
    # pc_t/prow_t ~ 8 F-planes) + ids.  Target ~5 MB of the 16 MB scoped
    # limit — a 24-wide f32 level at 1280 lanes measured 16.87M and
    # failed to compile (vmem stack OOM), hence the explicit accounting.
    budget = 5 * 1024 * 1024
    F = Ci * Cj
    if _use_decomp(S):
        H = _cdiv(S, _DECOMP_L)
        oh_lanes = (_DECOMP_L + H) * 2 + 3 * Cj * H * 4
    else:
        oh_lanes = S * 2
    per_lane = 2 * W * F * blk_bytes + oh_lanes + 8 * F * 4 + W * 8 + 64
    n = budget // max(per_lane, 1)
    if n < 256:
        # a very wide level (large W*Ci*Cj) can't fit even the minimum
        # 256-lane tile in budget: signal the caller to use the 2-D-grid
        # W-loop variant (W-independent VMEM) instead of clamping up and
        # recreating the scoped-vmem compile failure (advisor r4)
        return 0
    n = min(2048, (n // 128) * 128)
    ov = int(os.environ.get("THALLO_FUSED_NBLK", "0"))
    if ov:
        n = ov
    n_needed = _cdiv(N, 128) * 128
    return min(n, max(256, n_needed))


def store_3d(W: int, Ci: int, Cj: int, S: int, N: int,
             blk_bytes: int) -> bool:
    """True when fused_pair_apply will take the 2-D-grid W-loop variant:
    blocks should then be STORED [W, F, N] so the kernel's 3-D operand
    needs no per-iteration relayout — the [W*F, N] -> [W, F, N] reshape
    is not a bitcast for F % 8 != 0, and XLA re-lays the full block
    arrays inside the PCG while-loop (measured ~4.6 ms/iter of async
    copy/slice chains at skew-1M, trace r5)."""
    return not (W <= 8 and _pick_n_blk(W, Ci, Cj, S, N, blk_bytes) > 0)


# trace-time call counter (tests assert the fused path actually ran;
# incremented when jit traces the wrapper, i.e. once per new shape)
TRACE_COUNT = [0]


@functools.partial(
    jax.jit, static_argnames=("Ci", "Cj", "S", "interpret"))
def fused_pair_apply(ids2d, blocks_wm, pcol, prow, *, Ci, Cj, S,
                     interpret=False):
    """Both directions of a cross pair through one kernel.

    ids2d:     [W, N] int32 column ids (out-of-range = padded/dropped)
    blocks_wm: [W*Ci*Cj, N] w-major edge blocks (bf16 or f32), or
               [W, Ci*Cj, N] 3-D (the storage layout for W-loop levels,
               see store_3d — avoids a per-iteration relayout)
    pcol:      [Cj, S] column-side operand
    prow:      [Ci, N] row-side operand
    Returns (rows [Ci, N] f32, cols [Cj, S] f32).
    """
    TRACE_COUNT[0] += 1
    W, N = ids2d.shape
    bb = jnp.dtype(blocks_wm.dtype).itemsize
    L = _DECOMP_L
    H = _cdiv(S, L) if _use_decomp(S) else 0
    if H:
        # two-digit operand/output layout: pcol [Cj, S] -> zero-pad to
        # [Cj, H*L] -> [Cj*H, L]; cols come back [Cj*H, L] and reshape/
        # slice to [Cj, S] outside the kernel (cheap: Cj*S elements)
        pcol_k = jnp.pad(
            pcol.astype(jnp.float32), ((0, 0), (0, H * L - S))
        ).reshape(Cj * H, L)
        cols_shape = (Cj * H, L)
    else:
        pcol_k = pcol.astype(jnp.float32)
        cols_shape = (Cj, S)
    out_shape = [
        jax.ShapeDtypeStruct((Ci, N), jnp.float32),
        jax.ShapeDtypeStruct(cols_shape, jnp.float32),
    ]
    if not store_3d(W, Ci, Cj, S, N, bb):
        # unrolled w loop: best pipelining for the common low-degree
        # levels (uniform BA W=4, base levels)
        n_blk = _pick_n_blk(W, Ci, Cj, S, N, bb)
        if blocks_wm.ndim == 3:  # legacy layout: flatten (relayout)
            blocks_wm = blocks_wm.reshape(W * Ci * Cj, N)
        kern = functools.partial(_kernel, Ci=Ci, Cj=Cj, W=W, S=S, H=H,
                                 N=N, n_blk=n_blk)
        rows, cols = pl.pallas_call(
            kern,
            grid=(_cdiv(N, n_blk),),
            in_specs=[
                pl.BlockSpec((W, n_blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((W * Ci * Cj, n_blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(cols_shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Ci, n_blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((Ci, n_blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(cols_shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=out_shape,
            interpret=interpret,
        )(ids2d, blocks_wm, pcol_k, prow.astype(jnp.float32))
    else:
        # large W: 2-D grid (tile, w), one degree slot per program — W is
        # unbounded (skew tails reach W~700) and VMEM stays W-independent.
        # ids/blocks are 3-D so the w-blocked axis LEADS: the TPU
        # lowering requires the last two block dims be (8,128)-divisible
        # or equal to the array dims, which (1, n_blk)/(F, n_blk) slices
        # of the 2-D forms are not.  Blocks arrive ALREADY 3-D from
        # bsr_setup (store_3d) so no relayout exists inside the loop.
        F = Ci * Cj
        if blocks_wm.ndim == 2:
            blocks_wm = blocks_wm.reshape(W, F, N)
        n_blk = _pick_n_blk(1, Ci, Cj, S, N, bb)
        kern = functools.partial(_kernel_wloop, Ci=Ci, Cj=Cj, S=S, H=H,
                                 N=N, n_blk=n_blk)
        rows, cols = pl.pallas_call(
            kern,
            grid=(_cdiv(N, n_blk), W),
            in_specs=[
                pl.BlockSpec((1, 1, n_blk), lambda i, w: (w, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, F, n_blk), lambda i, w: (w, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(cols_shape, lambda i, w: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Ci, n_blk), lambda i, w: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((Ci, n_blk), lambda i, w: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(cols_shape, lambda i, w: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM(cols_shape, jnp.float32)],
            interpret=interpret,
        )(ids2d.reshape(W, 1, N), blocks_wm,
          pcol_k, prow.astype(jnp.float32))
    if H:
        cols = cols.reshape(Cj, H * L)[:, :S]
    return rows, cols
