"""Two-point TRACE attribution of the marginal PCG iteration: profile
one step at l_lo and one at l_hi, aggregate device time per op name,
and print the top per-iteration deltas — attributes the marginal cost
op-by-op instead of trusting a single while-loop line.

Usage: PYTHONPATH=... python scripts/tpu_trace_marginal.py [case] [l_lo] [l_hi]
"""
import glob
import sys
import tempfile
from collections import defaultdict

import jax


def trace_once(plan, l_iters):
    plan.set_solver_parameter("lIterations", l_iters)
    plan.step()
    jax.block_until_ready(plan._U)
    agg = defaultdict(float)
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            plan.step()
            jax.block_until_ready(plan._U)
        files = glob.glob(f"{td}/**/*.xplane.pb", recursive=True)
        from jax.profiler import ProfileData
        data = ProfileData.from_serialized_xspace(
            open(sorted(files)[-1], "rb").read())
        total = 0.0
        for plane in data.planes:
            if "TPU" not in plane.name and "device" not in plane.name.lower():
                continue
            for line in plane.lines:
                if "XLA Ops" not in (line.name or ""):
                    continue
                for e in line.events:
                    name = e.name.split(" = ")[0].strip("%")
                    # collapse numbered op instances: fusion.330 -> fusion
                    base = name.split(".")[0]
                    agg[(base, name)] += e.duration_ns / 1e6
                    total += e.duration_ns / 1e6
    return agg, total


def main(case="ba_skew_1m", l_lo="4", l_hi="104"):
    from thallo_tpu.models import bundle_adjustment as ba

    if case == "ba_skew_1m":
        inputs, _ = ba.skewed_inputs(1024, 250000, 1_000_000)
        sizes = {"C": 1024, "P": 250000, "O": len(inputs["oToC"])}
    elif case == "ba_uniform_1m":
        inputs, _ = ba.synthetic_inputs(1024, 250000, 4)
        sizes = {"C": 1024, "P": 250000, "O": len(inputs["oToC"])}
    elif case == "ba_skew_250k":
        inputs, _ = ba.skewed_inputs(256, 62500, 250_000)
        sizes = {"C": 256, "P": 62500, "O": len(inputs["oToC"])}
    spec = ba.make_spec()
    plan = spec.plan(sizes, solver="levenberg_marquardt")
    plan.set_solver_parameter("q_tolerance", -1e30)
    plan.set_solver_parameter("function_tolerance", 0.0)
    plan.set_solver_parameter("nIterations", 10_000)
    plan.init(inputs)
    lo, hi = int(l_lo), int(l_hi)
    a_lo, t_lo = trace_once(plan, lo)
    a_hi, t_hi = trace_once(plan, hi)
    d = hi - lo
    print(f"total device: l={lo}: {t_lo:.1f} ms, l={hi}: {t_hi:.1f} ms, "
          f"marginal {(t_hi - t_lo) / d * 1e3:.1f} us/iter")
    rows = []
    keys = set(a_lo) | set(a_hi)
    for k in keys:
        delta = (a_hi.get(k, 0.0) - a_lo.get(k, 0.0)) / d
        rows.append((delta, k, a_lo.get(k, 0.0)))
    rows.sort(reverse=True)
    print("top per-iteration deltas (us/iter; fixed=the l_lo ms):")
    for delta, (base, name), fixed in rows[:30]:
        if abs(delta) < 1e-4:
            break
        print(f"  {delta * 1e3:9.1f} us/it  fixed {fixed:8.2f} ms  {name[:70]}")
    # fixed-cost attribution: ops with ~zero marginal, big l_lo time
    rows2 = sorted(rows, key=lambda r: -r[2])
    print("top fixed-cost ops (l_lo ms, marginal us/it):")
    for delta, (base, name), fixed in rows2[:25]:
        print(f"  {fixed:8.2f} ms  {delta * 1e3:8.1f} us/it  {name[:70]}")


if __name__ == "__main__":
    main(*sys.argv[1:])
