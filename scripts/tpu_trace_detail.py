"""Detailed trace of one BA production step: per-plane, per-line event
sums with full names, to attribute the fixed per-step cost.
Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_trace_detail.py [case] [l_iters]
"""
import glob
import sys
import tempfile

import jax


def main(case="ba_uniform_250k", l_iters="4"):
    from thallo_tpu.models import bundle_adjustment as ba

    if case == "ba_uniform_250k":
        inputs, _ = ba.synthetic_inputs(256, 62500, 4)
        sizes = {"C": 256, "P": 62500, "O": len(inputs["oToC"])}
    elif case == "ba_skew_1m":
        inputs, _ = ba.skewed_inputs(1024, 250000, 1_000_000)
        sizes = {"C": 1024, "P": 250000, "O": len(inputs["oToC"])}
    elif case == "ba_skew_250k":
        inputs, _ = ba.skewed_inputs(256, 62500, 250_000)
        sizes = {"C": 256, "P": 62500, "O": len(inputs["oToC"])}
    elif case == "ba_uniform_1m":
        inputs, _ = ba.synthetic_inputs(1024, 250000, 4)
        sizes = {"C": 1024, "P": 250000, "O": len(inputs["oToC"])}
    spec = ba.make_spec()
    plan = spec.plan(sizes, solver="levenberg_marquardt")
    plan.set_solver_parameter("lIterations", int(l_iters))
    plan.set_solver_parameter("q_tolerance", 0.0)
    plan.set_solver_parameter("function_tolerance", 0.0)
    plan.init(inputs)
    plan.step()
    plan.step()
    jax.block_until_ready(plan._U)
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            plan.step()
            jax.block_until_ready(plan._U)
        files = glob.glob(f"{td}/**/*.xplane.pb", recursive=True)
        from jax.profiler import ProfileData
        data = ProfileData.from_serialized_xspace(open(sorted(files)[-1], "rb").read())
        for plane in data.planes:
            print(f"== plane: {plane.name}")
            for line in plane.lines:
                evs = list(line.events)
                tot = sum(e.duration_ns for e in evs) / 1e6
                print(f"  -- line: {line.name} ({len(evs)} events, {tot:.3f} ms total)")
                agg = {}
                for e in evs:
                    agg[e.name] = agg.get(e.name, 0) + e.duration_ns
                for n, ns in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
                    print(f"     {ns/1e6:9.3f} ms  {n[:140]}")


if __name__ == "__main__":
    main(*sys.argv[1:])
