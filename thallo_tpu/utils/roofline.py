"""Roofline accounting: modeled HBM bytes per marginal PCG iteration.

PCG is bandwidth-bound on TPU (the MXU is idle ~all the time: block
matvecs are tiny), so the honest hardware-efficiency metric is achieved
HBM bandwidth as a fraction of peak — the TPU analog of the reference's
machine-model accounting (/root/reference/API/src/cuda_util.t:584-684,
theoretical_memory_bandwidth) — NOT an MFU number that would be ~0 by
construction.  bench.py divides these bytes by the measured marginal
PCG-iteration time and reports GB/s and % of peak per workload.

The model counts REAL bytes only (no per-index penalty equivalents —
those belong to the schedule cost model, schedule.py): every byte a
marginal PCG iteration must move through HBM given the plan's schedule,
assuming perfect fusion of elementwise chains (XLA achieves this) and no
re-reads beyond the algorithmic ones.  It is therefore a LOWER bound on
traffic: achieved/peak fractions computed against it understate the
hardware's efficiency rather than flattering it.
"""
from __future__ import annotations

import os

import numpy as np

# v5e HBM peak; override for other parts (v5p ~2765, v4 ~1228)
HBM_PEAK_GBPS = float(os.environ.get("THALLO_HBM_PEAK_GBPS", "819"))


def _itemsize(dtype) -> int:
    return int(np.dtype(dtype).itemsize)


def _unknown_bytes(plan) -> int:
    return sum(
        int(np.prod([d.size for d in im.dims])) * im.channels
        * _itemsize(plan.dtype)
        for im in plan.spec.unknowns)


def _bsr_iter_bytes(bsr, block_itemsize, f32=4) -> int:
    """Bytes one bsr_apply moves: pair blocks (the dominant term), the
    gathered/broadcast column operands, and the accumulators."""
    total = 0
    shapes = bsr.image_shapes
    elems = {n: int(np.prod(s[:-1])) for n, s in shapes.items()}
    for p_idx, pr in enumerate(bsr.pairs):
        i, j = pr[0], pr[1]
        Ci, Cj = bsr.slot_channels[i], bsr.slot_channels[j]
        if pr[2] == "diag":
            N = elems[bsr.slot_images[i]]
            total += Ci * Cj * N * f32          # diag blocks stay f32
            total += Cj * N * f32               # p operand
        elif pr[2] == "col":
            ct = bsr.col_gathers[pr[3]][0]
            W, Nt = bsr.cols[ct].shape
            total += Ci * Cj * W * Nt * block_itemsize  # cross blocks
            total += Cj * W * Nt * f32          # gathered p columns
        else:  # transpose: consumes the PARTNER's blocks, which the
            # partner pair already reads in the same fused loop — XLA
            # reads them once (counting them twice put the 250k model
            # above HBM peak); only the broadcast p rows are new traffic
            partner = bsr.pairs[pr[3]]
            ct = bsr.col_gathers[partner[3]][0]
            W, Nt = bsr.cols[ct].shape
            total += Cj * Nt * f32              # p rows (broadcast over W)
    # per-row-slot accumulator writes
    for i in set(pr[0] for pr in bsr.pairs):
        total += bsr.slot_channels[i] * elems[bsr.slot_images[i]] * f32
    return total


def _inline_iter_bytes(gp, dtype_bytes) -> int:
    """INLINE/LINEARIZE groups re-evaluate J.p and J^T.q each iteration:
    ~4 passes (jvp fwd+tangent, vjp fwd+cotangent; LINEARIZE: 2) over the
    slot gathers + consts + residuals."""
    from ..schedule import _group_stats
    from ..spec import JTJpSchedule

    st = _group_stats(gp, dtype_bytes)
    passes = 2.0 if gp.schedule == JTJpSchedule.LINEARIZE else 4.0
    return int(passes * (st["gather_bytes"] + st["const_bytes"]
                         + st["res_bytes"]))


def pcg_iter_traffic_bytes(plan) -> int:
    """Modeled HBM bytes per MARGINAL PCG iteration for this plan:
    group J^T J p traffic (schedule-dependent) + the PCG vector updates
    (p, r, z, delta, Ap: ~8 unknown-vector passes across PCGStep1/2/3 +
    dots) + the preconditioner read (scalar or block-Jacobi)."""
    from ..schedule import DENSE_JTJ_MAX_UNKNOWNS, _group_stats
    from ..spec import JTJpSchedule

    comp = plan.compiled
    f32 = _itemsize(plan.dtype)
    block_itemsize = 2 if comp.block_dtype is not None else f32
    total = 0
    consts = plan._prep.get("consts", []) if isinstance(plan._prep, dict) else []
    for gi, gp in enumerate(comp.groups):
        c = consts[gi] if gi < len(consts) else None
        bsr = c.get("bsr") if isinstance(c, dict) else None
        if bsr is not None and comp._wants_bsr(gp):
            total += _bsr_iter_bytes(bsr, block_itemsize, f32)
        elif gp.schedule in (JTJpSchedule.PRECOMPUTE_JTJ,
                             JTJpSchedule.PRECOMPUTE_J_THEN_JTJ):
            st = _group_stats(gp, f32)
            n = st["unknown_elems"]
            if n <= DENSE_JTJ_MAX_UNKNOWNS:
                total += n * n * f32  # dense gemv
            else:
                total += 2 * (st["jblock_bytes"] + st["gather_bytes"])
        elif gp.schedule in (JTJpSchedule.PRECOMPUTE_J,
                             JTJpSchedule.APPLY_SEPARATELY):
            st = _group_stats(gp, f32)
            total += 2 * (st["jblock_bytes"] + st["gather_bytes"])
        else:
            total += _inline_iter_bytes(gp, f32)
    ub = _unknown_bytes(plan)
    total += 8 * ub  # p/r/z/delta/Ap updates + alpha/beta dots
    # preconditioner: scalar = 1 unknown pass; block-Jacobi = C x C blocks
    pre_passes = 1
    total += pre_passes * ub
    if comp.precond_kind in ("auto", "block_jacobi"):
        for im in plan.spec.unknowns:
            N = int(np.prod([d.size for d in im.dims]))
            total += im.channels * im.channels * N * f32
    return int(total)


def roofline(plan, marginal_iter_s: float) -> dict:
    """Achieved GB/s and fraction of HBM peak for a measured marginal
    PCG-iteration time."""
    b = pcg_iter_traffic_bytes(plan)
    gbps = b / max(marginal_iter_s, 1e-12) / 1e9
    return {
        "modeled_bytes_per_iter": b,
        "achieved_gbps": round(gbps, 1),
        "hbm_peak_gbps": HBM_PEAK_GBPS,
        "hbm_fraction": round(gbps / HBM_PEAK_GBPS, 4),
    }
