"""Measure per-iteration floors inside a jitted lax.while_loop on the
real TPU: (a) empty-body, (b) small VPU op, (c) a trivial pallas call,
(d) the fused pair kernel at skew-level shape.  Separates harness/launch
overhead from real kernel cost.
"""
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(body, carry0, n_loop=200):
    def step(c):
        i = c[0]
        rest = body(c)
        return (i + 1,) + rest

    runj = jax.jit(lambda: jax.lax.while_loop(
        lambda c: c[0] < n_loop, step, (jnp.zeros((), jnp.int32),) + carry0))
    out = runj()
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = runj()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n_loop)
    return best * 1e3


def trivial_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0


def main():
    x = jnp.zeros((8, 1024), jnp.float32)

    res = {}
    res["empty_ms"] = timeit(lambda c: (c[1] + 1.0,), (x,))

    def pallas_body(c):
        y = pl.pallas_call(
            trivial_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(c[1])
        return (y,)

    res["pallas_trivial_ms"] = timeit(pallas_body, (x,))

    # grid-sweep trivial pallas: is the floor per-call or per-program?
    big = jnp.zeros((8, 64 * 1024), jnp.float32)

    def pallas_grid_body(c):
        y = pl.pallas_call(
            trivial_kernel,
            grid=(64,),
            in_specs=[pl.BlockSpec((8, 1024), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 1024), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(big.shape, big.dtype),
        )(c[1])
        return (y,)

    res["pallas_grid64_ms"] = timeit(pallas_grid_body, (big,))
    print(json.dumps(res), flush=True)
    with open("artifacts/tpu_loop_floor.json", "w") as f:
        f.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
