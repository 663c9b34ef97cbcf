"""Micro-benchmark: fused cross-pair BSR apply as a Pallas kernel vs the
current XLA routing-dot formulation, at BA shapes, inside a while loop
(matching PCG: loop-invariant one-hots get hoisted AND materialized by
XLA — the measured HBM floor, see artifacts/tpu_trace_r4 notes).

The fused kernel reads the edge blocks ONCE per tile and computes BOTH
directions:
  out_rows[Ci, N_blk]  = sum_{cj,w} B[ci,cj,w,n] * p_col[cj, ids[w,n]]
  out_cols[Cj, S]     += sum_{ci,w} B[ci,cj,w,n] * p_row[ci, n] routed by ids
with the [S, N_blk] one-hot generated in VMEM from iota==ids — it never
touches HBM.

Usage: python scripts/tpu_fused_pair_micro.py
Appends JSON lines to artifacts/tpu_fused_pair.jsonl
"""
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def cdiv(a, b):
    return -(-a // b)


def fused_pair_kernel(ids_ref, b_ref, pcol_ref, prow_ref, rows_ref, cols_ref,
                      *, Ci, Cj, W, S):
    """One N_blk tile: both cross-pair products.

    ids_ref:  [W, N_blk] int32 column element per (w, n); out-of-range = drop
    b_ref:    [W*Ci*Cj, N_blk] blocks (bf16 storage), w-major so each w's
              [Ci*Cj, N_blk] plane is a contiguous 2-D slice (Mosaic has no
              rank-3 reductions; everything here stays 2-D)
    pcol_ref: [Cj, S] f32 column-side operand (full)
    prow_ref: [Ci, N_blk] f32 row-side operand
    rows_ref: [Ci, N_blk] f32 out (row contribution)
    cols_ref: [Cj, S] f32 out (column contribution, accumulated over grid)
    """
    N_blk = ids_ref.shape[1]
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        cols_ref[:] = jnp.zeros_like(cols_ref)

    pcol = pcol_ref[:].astype(jnp.bfloat16)  # [Cj, S]; one-hot dot is exact
    prow = prow_ref[:]  # [Ci, N_blk]
    # prow broadcast to the ci-major [Ci*Cj, N_blk] plane ordering
    prow_t = jnp.concatenate(
        [prow[ci:ci + 1] for ci in range(Ci) for _ in range(Cj)], axis=0)
    acc_rows = jnp.zeros((Ci, N_blk), jnp.float32)
    acc_cols = jnp.zeros((Cj, S), jnp.float32)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (S, N_blk), 0)
    for w in range(W):
        oh = (iota_s == ids_ref[w, :][None, :]).astype(jnp.bfloat16)
        # gather p_col by ids: exactly one nonzero per output -> exact
        pc = jax.lax.dot_general(
            pcol, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [Cj, N_blk]
        bw = b_ref[w * Ci * Cj:(w + 1) * Ci * Cj, :].astype(jnp.float32)
        # rows: sum_cj bw[ci*Cj+cj] * pc[cj]
        pc_t = jnp.concatenate([pc] * Ci, axis=0)  # [Ci*Cj, N_blk]
        prod = bw * pc_t
        acc_rows = acc_rows + jnp.concatenate(
            [jnp.sum(prod[ci * Cj:(ci + 1) * Cj], axis=0, keepdims=True)
             for ci in range(Ci)], axis=0)
        # cols: z[cj] = sum_ci bw[ci*Cj+cj] * prow[ci], then route by ids
        prod2 = bw * prow_t
        z = prod2[0:Cj]
        for ci in range(1, Ci):
            z = z + prod2[ci * Cj:(ci + 1) * Cj]
        acc_cols = acc_cols + jax.lax.dot_general(
            z.astype(jnp.bfloat16), oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [Cj, S]
    rows_ref[:] = acc_rows
    cols_ref[:] += acc_cols


@functools.partial(jax.jit, static_argnames=("Ci", "Cj", "W", "S", "n_blk"))
def fused_pair_apply(ids, blocks, pcol, prow, *, Ci, Cj, W, S, n_blk=1024):
    N = ids.shape[1]
    grid = (cdiv(N, n_blk),)
    kern = functools.partial(fused_pair_kernel, Ci=Ci, Cj=Cj, W=W, S=S)
    rows, cols = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((W, n_blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ci * Cj * W, n_blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cj, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ci, n_blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Ci, n_blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cj, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Ci, N), jnp.float32),
            jax.ShapeDtypeStruct((Cj, S), jnp.float32),
        ],
    )(ids, blocks, pcol, prow)
    return rows, cols


def xla_reference(ids, blocks, pcol, prow, *, Ci, Cj, W, S):
    """Current formulation: rank-3 one-hot routing dots (hoisted +
    materialized inside while loops by XLA)."""
    b = jnp.transpose(
        blocks.astype(jnp.float32).reshape(W, Ci, Cj, -1), (1, 2, 0, 3))
    oh = (ids[None, :, :] == jnp.arange(S, dtype=ids.dtype)[:, None, None]
          ).astype(jnp.bfloat16)  # [S, W, N]
    pc = jax.lax.dot_general(
        pcol.astype(jnp.bfloat16), oh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [Cj, W, N]
    rows = jnp.sum(b * pc[None], axis=(1, 2)) + 0 * prow
    z = jnp.sum(b * prow[:, None, None, :], axis=0)  # [Cj, W, N]
    cols = jax.lax.dot_general(
        z.astype(jnp.bfloat16), oh, (((1, 2), (1, 2)), ((), ())),
        preferred_element_type=jnp.float32)  # [Cj, S]
    return rows, cols


def bench(fn, args, n_loop=50):
    """Run fn inside a lax.while_loop (PCG-like) and time per iteration."""
    def step(c):
        i, rows, cols = c
        r, co = fn(*args)
        return i + 1, rows + r * (1.0 + 1e-9 * i), cols + co

    def run():
        init = (jnp.zeros((), jnp.int32),
                jnp.zeros(args_out_shape[0], jnp.float32),
                jnp.zeros(args_out_shape[1], jnp.float32))
        return jax.lax.while_loop(lambda c: c[0] < n_loop, step, init)

    global args_out_shape
    r0, c0 = fn(*args)
    args_out_shape = (r0.shape, c0.shape)
    runj = jax.jit(run)
    out = runj()
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = runj()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n_loop)
    return best * 1e3, out


def main():
    rng = np.random.default_rng(0)
    cases = [
        # name, Ci, Cj, W, S, N
        ("ba_1m_pt_cam", 3, 9, 4, 1024, 250_000),
        ("ba_250k_pt_cam", 3, 9, 4, 256, 62_500),
        ("skew_level_w8", 3, 9, 8, 256, 16_384),
        ("skew_level_w2", 3, 9, 2, 256, 32_768),
    ]
    out = open("artifacts/tpu_fused_pair.jsonl", "a")
    for name, Ci, Cj, W, S, N in cases:
        ids = jnp.asarray(rng.integers(0, S, (W, N)), jnp.int32)
        blocks = jnp.asarray(rng.normal(size=(Ci * Cj * W, N)), jnp.bfloat16)
        pcol = jnp.asarray(rng.normal(size=(Cj, S)), jnp.float32)
        prow = jnp.asarray(rng.normal(size=(Ci, N)), jnp.float32)

        r_ref, c_ref = xla_reference(ids, blocks, pcol, prow,
                                     Ci=Ci, Cj=Cj, W=W, S=S)
        r_fu, c_fu = fused_pair_apply(ids, blocks, pcol, prow,
                                      Ci=Ci, Cj=Cj, W=W, S=S)
        err_r = float(jnp.max(jnp.abs(r_ref - r_fu)) /
                      (jnp.max(jnp.abs(r_ref)) + 1e-30))
        err_c = float(jnp.max(jnp.abs(c_ref - c_fu)) /
                      (jnp.max(jnp.abs(c_ref)) + 1e-30))

        t_ref, _ = bench(
            lambda *a: xla_reference(*a, Ci=Ci, Cj=Cj, W=W, S=S),
            (ids, blocks, pcol, prow))
        t_fused, _ = bench(
            lambda *a: fused_pair_apply(*a, Ci=Ci, Cj=Cj, W=W, S=S),
            (ids, blocks, pcol, prow))
        block_mb = blocks.size * 2 / 1e6
        rec = {"name": name, "Ci": Ci, "Cj": Cj, "W": W, "S": S, "N": N,
               "xla_ms": round(t_ref, 4), "fused_ms": round(t_fused, 4),
               "speedup": round(t_ref / t_fused, 2),
               "block_mb": round(block_mb, 1),
               "fused_gbps": round(block_mb / 1e3 / (t_fused / 1e3), 1),
               "rel_err_rows": err_r, "rel_err_cols": err_c}
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")
    out.close()


if __name__ == "__main__":
    main()
