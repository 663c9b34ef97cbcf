"""Exhaustive compile-and-measure schedule search on real hardware (the
reference's headline experiment loop, SURVEY.md §3.5: re-plan with
exauto_index = 0,1,2,... and measure each candidate, logging estimated
vs measured cost).  Writes artifacts/schedules_<model>_<backend>.txt and
feeds the measurement store the heuristic reads.

Usage: python scripts/measure_schedules.py [image_warping|arap] [max_candidates]
"""
import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "image_warping"
    max_c = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    backend = jax.default_backend()
    os.makedirs("artifacts", exist_ok=True)
    log_path = f"artifacts/schedules_{which}_{backend}.txt"
    os.environ.setdefault("THALLO_MEASUREMENTS",
                          f"artifacts/measurements_{backend}.json")
    from thallo_tpu.autotune import autoschedule_search

    if which == "image_warping":
        from thallo_tpu.models import image_warping as m

        side = int(sys.argv[3]) if len(sys.argv) > 3 else 256
        sizes = {"W": side, "H": side}
        mk = lambda: m.synthetic_inputs(side, side)  # noqa: E731
        factory = m.make_spec
    elif which == "arap":
        from thallo_tpu.models import arap_mesh_deformation as m

        side = 64  # 4k verts / 16k edges: large enough that schedule
        # choice, not dispatch, dominates the measured step
        inputs = m.synthetic_inputs(side=side)
        sizes = {"N": side * side, "E": len(inputs["V0"])}
        mk = lambda: m.synthetic_inputs(side=side)  # noqa: E731
        factory = m.make_spec
    else:
        raise SystemExit(f"unknown model {which}")

    with open(log_path, "a") as f:
        f.write(f"=== measured autoschedule search: {which} on {backend} ===\n")
    plan, results = autoschedule_search(
        factory, sizes, mk, n_steps=3, l_iters=10,
        max_candidates=max_c, log_path=log_path, verbose=True,
    )
    best = min(results, key=lambda r: r[2])
    with open(log_path, "a") as f:
        f.write(f"best: candidate {best[0]} {best[1]} {best[2]*1e3:.3f} ms/step\n")
    print("wrote", log_path)


if __name__ == "__main__":
    main()
