"""Phase breakdown of the BA step on TPU: setup / linear / finish.
Usage: PYTHONPATH=.:/root/.axon_site python scripts/tpu_phase_profile.py [case]
"""
import sys
import time

import jax
import numpy as np


def main(case="ba_uniform_250k"):
    from thallo_tpu.models import bundle_adjustment as ba

    if case == "ba_uniform_250k":
        inputs, _ = ba.synthetic_inputs(256, 62500, 4)
        sizes = {"C": 256, "P": 62500, "O": len(inputs["oToC"])}
    elif case == "ba_skew_250k":
        inputs, _ = ba.skewed_inputs(256, 62500, 250_000)
        sizes = {"C": 256, "P": 62500, "O": len(inputs["oToC"])}
    elif case == "ba_uniform_1m":
        inputs, _ = ba.synthetic_inputs(1024, 250000, 4)
        sizes = {"C": 1024, "P": 250000, "O": len(inputs["oToC"])}
    spec = ba.make_spec()
    plan = spec.plan(sizes, solver="levenberg_marquardt")
    plan.set_solver_parameter("lIterations", 4)
    plan.set_solver_parameter("q_tolerance", 0.0)
    plan.set_solver_parameter("function_tolerance", 0.0)
    plan.init(inputs)
    comp = plan.compiled
    U, lm, ins, sp, prep = (plan._U, plan._lm, plan._step_inputs(),
                            plan._sp(), plan._prep)
    setup_j, linear_j, finish_j = comp.phase_jits()
    state = setup_j(U, lm, ins, sp, prep)
    delta = linear_j(U, state, ins, sp, prep)
    out = finish_j(U, lm, state, delta, ins, sp, prep)
    jax.block_until_ready(out)

    def t(f, *a):
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*a))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    print(case, flush=True)
    print("  setup_ms", round(t(setup_j, U, lm, ins, sp, prep), 2), flush=True)
    print("  linear_ms(l=4)", round(t(linear_j, U, state, ins, sp, prep), 2),
          flush=True)
    print("  finish_ms", round(t(finish_j, U, lm, state, delta, ins, sp, prep), 2),
          flush=True)
    # cost evaluation alone (2 of these hide inside finish: model + new)
    cost_j = jax.jit(lambda U: comp.cost(U, ins, prep["consts"]))
    jax.block_until_ready(cost_j(U))
    print("  cost_ms", round(t(cost_j, U), 2), flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
