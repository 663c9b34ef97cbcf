"""Micro-benchmarks for the block-sparse apply layout (TPU).

Times each candidate primitive/layout inside a lax.scan chain (so
dispatch overhead amortizes and XLA can't CSE across iterations), at
ARAP 256x256 scale: N=65536 unknowns, E=261120 rows, D=4 degree, C=3.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np

N = 65536
D = 4
ND = N * D
C = 3
STEPS = 50

key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (ND,), 0, N, dtype=jnp.int32)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    o = f(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = f(*args)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{name:55s} {dt:8.3f} ms/iter")
    return dt


def chain(body):
    """scan STEPS times, feeding a [N] vector through the body."""
    def fn(x0, *consts):
        def step(x, _):
            return body(x, *consts), None
        out, _ = jax.lax.scan(step, x0, None, length=STEPS)
        return out
    return fn


x1 = jnp.ones((N,), jnp.float32)

# --- gather variants -----------------------------------------------------
def g_scalar(x, idx):
    g = jnp.take(x, idx, axis=0)               # [ND] scalar gather
    return x + jnp.sum(g.reshape(N, D), axis=1) * 1e-9

def g_row3(x, idx):
    xr = jnp.stack([x, x, x], axis=-1)          # [N,3]
    g = jnp.take(xr, idx, axis=0)               # [ND,3] row gather
    return x + jnp.sum(g.reshape(N, D, 3), axis=(1, 2)) * 1e-9

def g_minor(x, idx):
    xT = jnp.stack([x, x, x], axis=0)           # [3,N]
    g = jnp.take(xT, idx, axis=1)               # [3,ND] minor-axis gather
    return x + jnp.sum(g.reshape(3, N, D), axis=(0, 2)) * 1e-9

timeit("gather scalar 1-D take [N]->[ND]", chain(g_scalar), x1, idx)
timeit("gather row take [N,3]->[ND,3]", chain(g_row3), x1, idx)
timeit("gather minor-axis take [3,N]->[3,ND]", chain(g_minor), x1, idx)

# --- block matvec variants (8 cross pairs of 3x3 blocks) -----------------
NPAIR = 8
blocks_nd33 = jnp.ones((NPAIR, ND, C, C), jnp.float32)       # old layout
blocks_cm = jnp.ones((NPAIR, C * C, ND), jnp.float32)        # channel-major

def mv_old(x, blocks, idx):
    xr = jnp.stack([x, x, x], axis=-1)
    pg = jnp.take(xr, idx, axis=0)               # [ND,3]
    acc = 0.
    for k in range(NPAIR):
        contrib = jnp.sum(blocks[k] * pg[:, None, :], axis=2)  # [ND,3]
        acc = acc + jnp.sum(contrib.reshape(N, D, C), axis=1)
    return x + jnp.sum(acc, axis=-1) * 1e-9

def mv_cm_reshape(x, blocks, idx):
    # current bsr_apply: per-channel scalar gathers + reshape to [C,C,N,D]
    pg = [jnp.take(x, idx, axis=0).reshape(N, D) for _ in range(C)]
    acc = 0.
    for k in range(NPAIR):
        B = blocks[k].reshape(C, C, N, D)
        s = B[:, 0] * pg[0][None]
        for b in range(1, C):
            s = s + B[:, b] * pg[b][None]
        acc = acc + jnp.sum(s, axis=2)           # [C,N]
    return x + jnp.sum(acc, axis=0) * 1e-9

def mv_cm_1d(x, blocks, idx):
    # pure 1-D: block rows are [ND] slices, gathered p are [ND] 1-D
    pg = [jnp.take(x, idx, axis=0) for _ in range(C)]
    acc = 0.
    for k in range(NPAIR):
        rows = []
        for i in range(C):
            s = blocks[k][i * C + 0] * pg[0]
            for b in range(1, C):
                s = s + blocks[k][i * C + b] * pg[b]
            rows.append(jnp.sum(s.reshape(N, D), axis=1))  # [N]
        acc = acc + jnp.stack(rows, axis=0)       # [C,N]
    return x + jnp.sum(acc, axis=0) * 1e-9

def mv_cm_wide(x, blocks, idx):
    # [C*C, ND] blocks * broadcast [C, ND] gathered p, via one reshape
    pgT = jnp.stack([jnp.take(x, idx, axis=0) for _ in range(C)], axis=0)  # [C,ND]
    acc = 0.
    for k in range(NPAIR):
        B = blocks[k].reshape(C, C, ND)
        s = jnp.sum(B * pgT[None], axis=1)        # [C,ND]
        acc = acc + jnp.sum(s.reshape(C, N, D), axis=2)
    return x + jnp.sum(acc, axis=0) * 1e-9

timeit("matvec OLD [ND,3,3] blocks", chain(mv_old), x1, blocks_nd33, idx)
timeit("matvec CM reshape->[C,C,N,D] (current)", chain(mv_cm_reshape), x1, blocks_cm, idx)
timeit("matvec CM pure 1-D rows", chain(mv_cm_1d), x1, blocks_cm, idx)
timeit("matvec CM wide [C,C,ND]*[1,C,ND]", chain(mv_cm_wide), x1, blocks_cm, idx)

# --- bf16 block storage on the winner ------------------------------------
blocks_cm_bf = blocks_cm.astype(jnp.bfloat16)

def mv_cm_1d_bf(x, blocks, idx):
    return mv_cm_1d(x, blocks.astype(jnp.float32), idx)

timeit("matvec CM pure 1-D rows, bf16 blocks", chain(mv_cm_1d_bf), x1, blocks_cm_bf, idx)
