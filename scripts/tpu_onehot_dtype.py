"""Micro-benchmark: one-hot MXU segment-sum / gather dtype variants on
the real chip.  The BA 250k per-PCG-iteration cost is dominated by two
one-hot dots with a 9-wide channel side (M=9 or N=9 wastes 14/15 of the
MXU tile); f32 dots additionally run multi-pass.  Measures:
  agg:  [9, R] @ onehot[R, 256]   (transpose-apply aggregation)
  gth:  onehot[R, 256] @ [256, 9] (camera p gather)
in f32, f32 values x bf16 one-hot, and both-bf16.
Appends JSON to artifacts/tpu_onehot_dtype.jsonl.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

R, S, C = 250_000, 256, 9


def timeit(f, *a):
    f(*a).block_until_ready()
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        f(*a).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, S, R), jnp.int32)
    z = jnp.asarray(rng.standard_normal((C, R)), jnp.float32)
    p = jnp.asarray(rng.standard_normal((S, C)), jnp.float32)
    iota = jnp.arange(S, dtype=jnp.int32)

    def agg(zv, oh_dt):
        oh = (ids[:, None] == iota[None, :]).astype(oh_dt)
        return jax.lax.dot_general(
            zv, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def gth(pv, oh_dt):
        oh = (ids[:, None] == iota[None, :]).astype(oh_dt)
        return jax.lax.dot_general(
            oh, pv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    out = {}
    for name, zdt, ohdt in (("f32", jnp.float32, jnp.float32),
                            ("f32xbf16", jnp.float32, jnp.bfloat16),
                            ("bf16", jnp.bfloat16, jnp.bfloat16)):
        try:
            fa = jax.jit(lambda zz: agg(zz.astype(zdt), ohdt))
            out[f"agg_{name}_ms"] = round(timeit(fa, z), 4)
        except Exception as e:  # noqa: BLE001
            out[f"agg_{name}_err"] = str(e)[:80]
        try:
            fg = jax.jit(lambda pp: gth(pp.astype(zdt), ohdt))
            out[f"gth_{name}_ms"] = round(timeit(fg, p), 4)
        except Exception as e:  # noqa: BLE001
            out[f"gth_{name}_err"] = str(e)[:80]
    # exactness of the f32-values x bf16-one-hot form
    a0 = agg(z, jnp.float32)
    a1 = agg(z, jnp.bfloat16)
    out["agg_f32xbf16_maxdiff"] = float(jnp.max(jnp.abs(a0 - a1)))
    print(json.dumps(out), flush=True)
    with open("artifacts/tpu_onehot_dtype.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
