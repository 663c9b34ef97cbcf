"""Interior fusion breakdown of the BA 250k production step on TPU.
Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_interior_250k.py [case]
"""
import sys


def main(case="ba_uniform_250k"):
    from thallo_tpu.models import bundle_adjustment as ba

    if case == "ba_uniform_250k":
        inputs, _ = ba.synthetic_inputs(256, 62500, 4)
        sizes = {"C": 256, "P": 62500, "O": len(inputs["oToC"])}
    elif case == "ba_skew_1m":
        inputs, _ = ba.skewed_inputs(1024, 250000, 1_000_000)
        sizes = {"C": 1024, "P": 250000, "O": len(inputs["oToC"])}
    elif case == "ba_uniform_1m":
        inputs, _ = ba.synthetic_inputs(1024, 250000, 4)
        sizes = {"C": 1024, "P": 250000, "O": len(inputs["oToC"])}
    spec = ba.make_spec()
    plan = spec.plan(sizes, solver="levenberg_marquardt")
    plan.set_solver_parameter("lIterations", 4)
    plan.set_solver_parameter("q_tolerance", 0.0)
    plan.set_solver_parameter("function_tolerance", 0.0)
    plan.init(inputs)
    summ = plan.kernel_stats(interior=True)
    for row in summ.rows() if hasattr(summ, "rows") else []:
        print(row, flush=True)
    # fall back to the markdown table
    print(summ.markdown() if hasattr(summ, "markdown") else summ, flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
