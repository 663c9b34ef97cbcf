"""Variant study for the fused cross-pair kernel: where does the
per-program cost come from?

v0: both outputs, cols accumulated into a revisited (0,0) output window
v1: rows only (no cols output at all)
v2: cols accumulated in VMEM scratch, written once on the last program
v3: cols per-program partials [G, Cj, S], summed outside the kernel

Appends to artifacts/tpu_fused_pair.jsonl with variant tags.
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


def _common(ids_ref, b_ref, pcol_ref, prow_ref, Ci, Cj, W, S):
    N_blk = ids_ref.shape[1]
    pcol = pcol_ref[:].astype(jnp.bfloat16)
    prow = prow_ref[:]
    prow_t = jnp.concatenate(
        [prow[ci:ci + 1] for ci in range(Ci) for _ in range(Cj)], axis=0)
    acc_rows = jnp.zeros((Ci, N_blk), jnp.float32)
    acc_cols = jnp.zeros((Cj, S), jnp.float32)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (S, N_blk), 0)
    for w in range(W):
        oh = (iota_s == ids_ref[w, :][None, :]).astype(jnp.bfloat16)
        pc = jax.lax.dot_general(
            pcol, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        bw = b_ref[w * Ci * Cj:(w + 1) * Ci * Cj, :].astype(jnp.float32)
        pc_t = jnp.concatenate([pc] * Ci, axis=0)
        prod = bw * pc_t
        acc_rows = acc_rows + jnp.concatenate(
            [jnp.sum(prod[ci * Cj:(ci + 1) * Cj], axis=0, keepdims=True)
             for ci in range(Ci)], axis=0)
        prod2 = bw * prow_t
        z = prod2[0:Cj]
        for ci in range(1, Ci):
            z = z + prod2[ci * Cj:(ci + 1) * Cj]
        acc_cols = acc_cols + jax.lax.dot_general(
            z.astype(jnp.bfloat16), oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    return acc_rows, acc_cols


def make_v1(Ci, Cj, W, S, n_blk):
    def kern(ids_ref, b_ref, pcol_ref, prow_ref, rows_ref):
        acc_rows, _ = _common(ids_ref, b_ref, pcol_ref, prow_ref, Ci, Cj, W, S)
        rows_ref[:] = acc_rows

    @jax.jit
    def apply(ids, blocks, pcol, prow):
        N = ids.shape[1]
        rows = pl.pallas_call(
            kern, grid=(cdiv(N, n_blk),),
            in_specs=[
                pl.BlockSpec((W, n_blk), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((Ci * Cj * W, n_blk), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((Cj, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Ci, n_blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Ci, n_blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Ci, N), jnp.float32),
        )(ids, blocks, pcol, prow)
        return rows, jnp.zeros((Cj, S), jnp.float32)

    return apply


def make_v2(Ci, Cj, W, S, n_blk):
    def kern(ids_ref, b_ref, pcol_ref, prow_ref, rows_ref, cols_ref, acc):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        acc_rows, acc_cols = _common(ids_ref, b_ref, pcol_ref, prow_ref,
                                     Ci, Cj, W, S)
        rows_ref[:] = acc_rows
        acc[:] += acc_cols

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            cols_ref[:] = acc[:]

    @jax.jit
    def apply(ids, blocks, pcol, prow):
        N = ids.shape[1]
        rows, cols = pl.pallas_call(
            kern, grid=(cdiv(N, n_blk),),
            in_specs=[
                pl.BlockSpec((W, n_blk), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((Ci * Cj * W, n_blk), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((Cj, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Ci, n_blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((Ci, n_blk), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((Cj, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Ci, N), jnp.float32),
                jax.ShapeDtypeStruct((Cj, S), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((Cj, S), jnp.float32)],
        )(ids, blocks, pcol, prow)
        return rows, cols

    return apply


def make_v3(Ci, Cj, W, S, n_blk):
    def kern(ids_ref, b_ref, pcol_ref, prow_ref, rows_ref, cols_ref):
        acc_rows, acc_cols = _common(ids_ref, b_ref, pcol_ref, prow_ref,
                                     Ci, Cj, W, S)
        rows_ref[:] = acc_rows
        cols_ref[:] = acc_cols[None]

    @jax.jit
    def apply(ids, blocks, pcol, prow):
        N = ids.shape[1]
        G = cdiv(N, n_blk)
        rows, colsp = pl.pallas_call(
            kern, grid=(G,),
            in_specs=[
                pl.BlockSpec((W, n_blk), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((Ci * Cj * W, n_blk), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((Cj, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Ci, n_blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((Ci, n_blk), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Cj, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Ci, N), jnp.float32),
                jax.ShapeDtypeStruct((G, Cj, S), jnp.float32),
            ],
        )(ids, blocks, pcol, prow)
        return rows, jnp.sum(colsp, axis=0)

    return apply


def bench(fn, args, out_shapes, n_loop=50):
    def step(c):
        i, rows, cols = c
        r, co = fn(*args)
        return i + 1, rows + r * (1.0 + 1e-9 * i), cols + co

    runj = jax.jit(lambda: jax.lax.while_loop(
        lambda c: c[0] < n_loop, step,
        (jnp.zeros((), jnp.int32),
         jnp.zeros(out_shapes[0], jnp.float32),
         jnp.zeros(out_shapes[1], jnp.float32))))
    out = runj()
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = runj()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n_loop)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    cases = [
        ("ba_1m_pt_cam", 3, 9, 4, 1024, 250_000),
        ("skew_level_w8", 3, 9, 8, 256, 16_384),
    ]
    out = open("artifacts/tpu_fused_pair.jsonl", "a")
    for name, Ci, Cj, W, S, N in cases:
        ids = jnp.asarray(rng.integers(0, S, (W, N)), jnp.int32)
        blocks = jnp.asarray(rng.normal(size=(Ci * Cj * W, N)), jnp.bfloat16)
        pcol = jnp.asarray(rng.normal(size=(Cj, S)), jnp.float32)
        prow = jnp.asarray(rng.normal(size=(Ci, N)), jnp.float32)
        shapes = ((Ci, N), (Cj, S))
        for vname, mk in [("v1_rows_only", make_v1), ("v2_scratch", make_v2),
                          ("v3_partials", make_v3)]:
            fn = mk(Ci, Cj, W, S, 1024)
            t = bench(fn, (ids, blocks, pcol, prow), shapes)
            rec = {"name": name, "variant": vname, "ms": round(t, 4)}
            print(json.dumps(rec), flush=True)
            out.write(json.dumps(rec) + "\n")
    out.close()


if __name__ == "__main__":
    main()
