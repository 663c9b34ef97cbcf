"""Dump the optimized HLO of the BA 250k production step (compiled on
the real backend) to /tmp/ba250k_step.hlo for fusion attribution.
Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_dump_hlo.py
"""
import sys


def main(case="ba_uniform_250k"):
    from thallo_tpu.models import bundle_adjustment as ba

    inputs, _ = ba.synthetic_inputs(256, 62500, 4)
    sizes = {"C": 256, "P": 62500, "O": len(inputs["oToC"])}
    spec = ba.make_spec()
    plan = spec.plan(sizes, solver="levenberg_marquardt")
    plan.set_solver_parameter("lIterations", 4)
    plan.set_solver_parameter("q_tolerance", 0.0)
    plan.set_solver_parameter("function_tolerance", 0.0)
    plan.init(inputs)
    comp = plan.compiled
    args = (plan._U, plan._lm, plan._step_inputs(), plan._sp(), plan._prep)
    lowered = comp.step_jit.lower(*args)
    compiled = lowered.compile()
    txt = compiled.as_text()
    open("/tmp/ba250k_step.hlo", "w").write(txt)
    print("wrote", len(txt), "bytes")


if __name__ == "__main__":
    main(*sys.argv[1:])
