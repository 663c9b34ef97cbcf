"""Verify: for one-hot dots (one operand exactly 0/1), Precision.HIGH
(bf16_3x) is bit-identical to Precision.HIGHEST (bf16_6x) — the one-hot
operand has no bf16 low bits, so the 3-pass decomposition reconstructs
the f32 value side exactly.  Also times both at BA-250k/1M-ish shapes.
Appends to artifacts/tpu_onehot_precision.jsonl.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *a):
    f(*a).block_until_ready()
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        f(*a).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return round(best * 1e3, 3)


def main():
    rng = np.random.default_rng(0)
    out = {}
    for name, R, S, F in (("250k", 250_000, 256, 99),
                          ("1m", 1_000_000, 1024, 99)):
        ids = jnp.asarray(rng.integers(0, S, R), jnp.int32)
        z = jnp.asarray(rng.standard_normal((F, R)), jnp.float32)
        iota = jnp.arange(S, dtype=jnp.int32)

        def agg(zv, prec):
            oh = (ids[:, None] == iota[None, :]).astype(zv.dtype)
            return jax.lax.dot_general(
                zv, oh, (((1,), (0,)), ((), ())), precision=prec,
                preferred_element_type=jnp.float32)

        hi = jax.jit(lambda zz: agg(zz, jax.lax.Precision.HIGHEST))
        h3 = jax.jit(lambda zz: agg(zz, jax.lax.Precision.HIGH))
        a, b = hi(z), h3(z)
        out[f"{name}_bitexact"] = bool(jnp.all(a == b))
        out[f"{name}_maxdiff"] = float(jnp.max(jnp.abs(a - b)))
        out[f"{name}_highest_ms"] = timeit(hi, z)
        out[f"{name}_high_ms"] = timeit(h3, z)
    print(json.dumps(out), flush=True)
    with open("artifacts/tpu_onehot_precision.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
