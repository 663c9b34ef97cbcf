"""Autoscheduler: choose each residual group's JTJp execution strategy.

The reference's headline contribution is scheduling (README.md:6): the
same energy can execute its J/JtJ computation inline, via materialized J,
or via materialized JtJ, chosen per residual group.  Its autoscheduler
(thallo.t:4203-5532) has three modes keyed by `useAutoscheduler`:
  1  heuristic: merge same-domain groups, greedy materialize decisions,
     pick JTJp strategy per group from an analytic GPU cost model
     (cost_of_kernel thallo.t:4509-4546: C(k)=reg_mult*max(mem/bw,
     ops/flops) using the device machine model)
  2  clear everything -> default schedule
  >=3 exhaustive enumeration with memory pruning + schedules.txt log
     (generate_all_schedules thallo.t:4318-4482)

TPU redesign: groups already merge by (domain, schedule) signature at plan
time, and XLA owns loop order/fusion, so the surviving decision is the
per-group JTJp strategy.  The analytic model below is a bytes-moved model
(TPU kernels here are HBM-bandwidth-bound; the MXU only matters for the
dense-JtJ path): per-PCG-iteration traffic + amortized per-nonlinear-
iteration setup, with HBM-feasibility pruning — the same structure as the
reference's cost_of_scheduled_energy (thallo.t:4548-5157) with the machine
model swapped for TPU.
"""
from __future__ import annotations

import itertools
from typing import Dict, List

import numpy as np

from .spec import JTJpSchedule

# TPU v5e-ish machine model (the analog of the reference's CUDA machine
# model, cuda_util.t:584-684); only ratios matter for schedule choice.
HBM_BYTES_PER_S = 800e9
FLOPS = 200e12  # bf16 MXU peak; f32 ~ half
HBM_BYTES = 16e9

DENSE_JTJ_MAX_UNKNOWNS = 4096  # reference dense_materialize_threshold=256
                               # (thallo.t:4204) scaled for MXU gemv

# Measured TPU v5e row-granular access costs, expressed as equivalent
# streamed bytes at HBM_BYTES_PER_S so they compose with the traffic
# model: scatter-add ~12 cycles/row (3.5 ms / 261k rows, PERF.md "the
# scatter wall"); dynamic gathers ~8 cycles PER INDEX independent of row
# width (2.0 ms / 250k indices, PERF.md "the per-index gather floor").
# Caveat: slots whose concrete index arrays turn out piecewise-affine
# (ops/structured.py — grid meshes, sorted observation maps) pay NONE of
# these penalties at runtime; that is only knowable at init when the
# index data exists, so the analytic model here charges the worst case
# and the measured search (autotune.py) is what observes the affine win.
SCATTER_ROW_EQ_BYTES = 10_000
GATHER_ROW_EQ_BYTES = 6_400


def _group_stats(gp, dtype_bytes=4):
    """Traffic building blocks for one lowered group."""
    g = gp.group
    R = g.R
    rc = g.rc
    slot_ch = 0
    gather_bytes = 0
    scatter_slots = 0  # slots needing a real (non-roll) scatter transpose
    pair_ch = 0  # sum over slot pairs of Ci*Cj (block-sparse JtJ payload)
    chans = []
    for s in g.uslots:
        dep = int(np.prod([d.dim.size for d in s.dep_cons])) if s.dep_cons else 1
        slot_ch += dep * s.image.channels
        gather_bytes += R * dep * s.image.channels * dtype_bytes
        if not s.dep_cons and g._roll_plan(s) is None:
            scatter_slots += 1
        chans.append(s.image.channels)
    for ci in chans:
        for cj in chans:
            pair_ch += ci * cj
    const_bytes = 0
    for s in g.cslots:
        dep = int(np.prod([d.dim.size for d in s.dep_cons])) if s.dep_cons else 1
        const_bytes += R * dep * s.image.channels * dtype_bytes
    res_bytes = R * rc * dtype_bytes
    unknown_elems = sum(
        int(np.prod([d.size for d in s.image.dims])) * s.image.channels
        for s in {id(s.image): s for s in g.uslots}.values()
    )
    return {
        "R": R,
        "rc": rc,
        "slot_ch": slot_ch,
        "gather_bytes": gather_bytes,
        "const_bytes": const_bytes,
        "res_bytes": res_bytes,
        "jblock_bytes": R * rc * slot_ch * dtype_bytes,
        "unknown_elems": unknown_elems,
        "scatter_slots": scatter_slots,
        "pair_block_bytes": R * pair_ch * dtype_bytes,
    }


def estimate_group_cost(gp, schedule: JTJpSchedule, lin_iter_hint: int = 10,
                        dtype_bytes: int = 4):
    """(per_solve_iteration_bytes, resident_bytes).  Per-solve-iteration =
    setup traffic + lin_iter_hint * per-PCG-iteration traffic, mirroring
    the reference's nonlinear + lin_iter_hint * linear decomposition
    (cost_of_scheduled_energy)."""
    st = _group_stats(gp, dtype_bytes)
    # every forward/tangent/cotangent pass pays the per-index gather
    # floor once per non-roll slot access (width is free — PERF.md)
    fwd = (st["gather_bytes"] + st["const_bytes"] + st["res_bytes"]
           + st["scatter_slots"] * st["R"] * GATHER_ROW_EQ_BYTES)
    # per-apply scatter/gather row penalties for graph slots (zero for
    # pure stencil groups, whose transposes are inverse rolls)
    scat = st["scatter_slots"] * st["R"] * SCATTER_ROW_EQ_BYTES
    gath = st["scatter_slots"] * st["R"] * GATHER_ROW_EQ_BYTES
    setup = 0.0
    resident = 0.0
    if schedule == JTJpSchedule.INLINE:
        # jvp (fwd + tangent) + vjp (fwd + cotangent) every iteration
        per_iter = 4.0 * fwd + scat + gath
    elif schedule == JTJpSchedule.LINEARIZE:
        # linearization residuals ~ one fwd's intermediates; apply +
        # transpose each touch them plus the slot-aligned tangents
        setup = fwd
        per_iter = 2.0 * fwd + scat + gath
        resident = fwd
    elif schedule in (JTJpSchedule.PRECOMPUTE_J, JTJpSchedule.APPLY_SEPARATELY):
        setup = fwd + st["jblock_bytes"]
        per_iter = 2.0 * (st["jblock_bytes"] + st["gather_bytes"]) + st["res_bytes"] + scat + gath
        resident = st["jblock_bytes"]
    elif schedule in (JTJpSchedule.PRECOMPUTE_JTJ, JTJpSchedule.PRECOMPUTE_J_THEN_JTJ):
        n = st["unknown_elems"]
        if n > DENSE_JTJ_MAX_UNKNOWNS:
            if st["scatter_slots"]:
                # block-sparse materialized JtJ (solver/blocksparse.py):
                # setup assembles + permutes the pair-block payload once;
                # each PCG step reads the padded blocks + col gathers —
                # NO scatters in the linear solve
                payload = st["pair_block_bytes"]
                setup = fwd + 3.0 * payload + st["R"] * GATHER_ROW_EQ_BYTES
                per_iter = payload + gath
                resident = payload
            else:
                # stencil group: falls back to J blocks internally
                setup = fwd + st["jblock_bytes"]
                per_iter = 2.0 * (st["jblock_bytes"] + st["gather_bytes"])
                resident = st["jblock_bytes"]
        else:
            dense = n * n * dtype_bytes
            setup = fwd + st["jblock_bytes"] + dense
            per_iter = dense  # gemv per iteration
            resident = dense
    else:
        per_iter = 4.0 * fwd + scat + gath
    return setup + lin_iter_hint * per_iter, resident


CANDIDATES = [
    JTJpSchedule.LINEARIZE,
    JTJpSchedule.INLINE,
    JTJpSchedule.PRECOMPUTE_J,
    JTJpSchedule.PRECOMPUTE_JTJ,
    JTJpSchedule.APPLY_SEPARATELY,
]


def _expr_op_count(exprs, _seen=None):
    """Approximate FLOP count of an expression DAG (distinct Apply nodes)."""
    from .expr import Apply, Reduction

    seen = _seen if _seen is not None else set()
    n = 0
    stack = list(exprs)
    while stack:
        e = stack.pop()
        if id(e) in seen:
            continue
        seen.add(id(e))
        if isinstance(e, Apply):
            n += 1
            stack.extend(e.args)
        elif isinstance(e, Reduction):
            n += 1
            stack.append(e.arg)
    return n


def _ca_uses(spec, ca):
    """Distinct access sites of a computed array across all residual
    expressions (before inlining)."""
    from .expr import Apply, ImageAccess, Reduction, SampleAccess

    sites = set()
    stack = []
    if spec.energy is not None:
        for nr in spec.energy:
            stack.extend(nr.exprs)
    for other in spec.computed:
        if other is not ca:
            stack.extend(other.expression)
    seen = set()
    while stack:
        e = stack.pop()
        if id(e) in seen:
            continue
        seen.add(id(e))
        if isinstance(e, Apply):
            stack.extend(e.args)
        elif isinstance(e, Reduction):
            stack.append(e.arg)
        elif isinstance(e, SampleAccess):
            stack.extend(e.coords)
        elif isinstance(e, ImageAccess) and e.image is ca:
            sites.add(e.comps)
    return len(sites)


# elementwise/gathered code runs far below MXU peak; what matters for the
# inline-vs-materialize tradeoff is recompute FLOP time vs the HBM cost of
# writing + re-reading the value array
EFFECTIVE_ELEMENTWISE_FLOPS = 5e12


def select_ca_materialization(spec, log=None):
    """Greedy ComputedArray materialize-vs-inline selection (the
    reference's select_expressions_to_materialize, thallo.t:5192-5231):
    materialize when recomputing the expression at every access site costs
    more FLOP-time than the HBM traffic of one precompute pass plus
    re-reads.  Mutates each computed Image's .materialize flag."""
    decisions = {}
    for ca in spec.computed:
        ops = _expr_op_count(ca.expression)
        uses = _ca_uses(spec, ca)
        dom = 1
        for d in ca.dims:
            dom *= d.size if d.size else 1
        c = ca.channels
        # inlined CAs are re-evaluated by every derivative pass too
        # (forward + one jvp per slot channel + vjp), hence the 3x
        inline_t = 3.0 * max(uses - 1, 0) * ops * dom * c / EFFECTIVE_ELEMENTWISE_FLOPS
        # write once + read at each use (jvp/vjp re-reads folded into the
        # same factor on both sides)
        mat_t = (1 + uses) * dom * c * 4 / HBM_BYTES_PER_S
        mat = uses >= 2 and inline_t > mat_t
        ca.materialize = mat
        decisions[ca.name] = mat
        if log is not None:
            log.append(
                f"  ca {ca.name}: ops={ops} uses={uses} "
                f"inline_t={inline_t:.3g}s mat_t={mat_t:.3g}s -> "
                f"{'materialize' if mat else 'inline'}"
            )
    return decisions


def measurements_path():
    import os

    return os.environ.get("THALLO_MEASUREMENTS", "schedule_measurements.json")


def group_measure_key(gp, schedule, order=None) -> str:
    """Stable key for measured schedule timings: group shape + slots +
    schedule (machine-model-free — measurements beat estimates,
    ROADMAP #8).  A non-default external-domain order adds an `_ord`
    suffix so reordered candidates measure separately; pass `order` to
    build the key a hypothetical reorder WOULD measure under."""
    g = gp.group
    slots = ",".join(
        f"{s.image.channels}ch{'x' + str(len(s.dep_cons)) if s.dep_cons else ''}"
        f"{'roll' if g._roll_plan(s) is not None else 'gather'}"
        for s in g.uslots
    )
    key = f"R{g.R}_rc{g.rc}_[{slots}]"
    if order is None and getattr(g, "reordered", False):
        order = g.domain_order
    if order is not None:
        key += "_ord" + ">".join(_domain_labels(order))
    return f"{key}_{schedule.value}"


def _domain_labels(doms):
    """Stable labels for an external-domain ordering: Dim names (domain
    .name embeds a process-global uid — unstable across runs), with an
    occurrence rank appended when one Dim appears twice (cross-product
    energies); rank = position in declaration (uid) order, which source
    order fixes."""
    by_dim: Dict[str, list] = {}
    for d in doms:
        by_dim.setdefault(d.dim.name, []).append(d)
    labels = []
    for d in doms:
        same = by_dim[d.dim.name]
        if len(same) == 1:
            labels.append(d.dim.name)
        else:
            rank = sorted(same, key=lambda x: x.uid).index(d)
            labels.append(f"{d.dim.name}#{rank}")
    return labels


def _slot_ext_deps(g, slot):
    """External domains a slot's index expressions depend on."""
    deps = []
    for c in slot.comps:
        for d in c.domains():
            if d in g.ext_domains and d not in deps:
                deps.append(d)
    return deps


def _slot_is_sparse(slot):
    """True when any index component routes through a sparse-map gather
    (an AffineComp term whose base is a SparseComp, possibly nested)."""
    from .dims import IndexDomain, SparseComp

    def affine_sparse(c):
        return any(
            isinstance(b, SparseComp)
            or (not isinstance(b, IndexDomain)
                and any(affine_sparse(a) for a in getattr(b, "args", ())))
            for b, _ in c.terms)

    return any(affine_sparse(c) for c in slot.comps)


def analytic_domain_orders(groups, schedules, measured=None, log=None):
    """COLD-START symbolic reorder for the heuristic (the analog of the
    reference's reorder_for_coherence, thallo.t:5308-5325, which brings
    domains unused by unknown accesses to the innermost iterator for
    warp-coherent reductions).  On TPU the external order only picks the
    row-major flattening of the residual domain — but that flattening
    decides whether a sparse slot's flattened index array is
    piecewise-repeat: with the slot's dependent domains LEADING the
    order, idx[(d_dep)*prod(rest) + rest] repeats the same id across the
    trailing block (one affine repeat box per element —
    ops/structured.py lowers every hot gather to windowed slices at
    init); with a dependent domain trailing, the ids interleave and
    detection fails (the measured 31x ARAP gap, PERF.md).  So: prefer
    the order where each sparse unknown slot's dependent domains form a
    PREFIX, weighting slots by channel count.  Purely symbolic — needs
    no measurement store; recorded measurements still take precedence
    (select_measured_domain_orders)."""
    out = []
    for gp, sched in zip(groups, schedules):
        g = gp.group
        doms = list(g.ext_domains)
        choice = None
        if 2 <= len(doms) <= 3 and not getattr(g, "reordered", False):
            slots = [s for s in list(g.uslots) + list(g.mslots)
                     if _slot_is_sparse(s)]
            deps = [(set(_slot_ext_deps(g, s)), s.image.channels)
                    for s in slots]

            def cost(order):
                c = 0
                for dset, w in deps:
                    if not dset or len(dset) == len(order):
                        continue  # order-independent
                    if set(order[:len(dset)]) != dset:
                        c += w  # dependent domains not leading: gather
                return c

            base = cost(doms)
            best = base
            for p in itertools.permutations(doms):
                lp = list(p)
                if lp == doms:
                    continue
                cp = cost(lp)
                if cp < best:
                    choice, best = lp, cp
            if log is not None and choice is not None:
                log.append(
                    f"  {gp.name}: analytic reorder "
                    + ">".join(_domain_labels(choice))
                    + f" (sparse-slot prefix score {best} < {base})")
        out.append(choice)
    return out


def choose_compute_at_output(groups, schedules, log=None):
    """The reference's choose_compute_at_output (thallo.t:5273-5306):
    when a group's JtJp stays unmaterialized AND every unknown's dims
    equal the residual's full iteration domain (same Dims, same order),
    iterate over OUTPUT elements instead of residuals — no inverse map,
    fewer memory writes.  On TPU this choice is structurally subsumed:
    such groups' accesses are pure grid offsets, their vjp transposes
    lower to inverse rolls (lower.py _scatter roll plans), and the
    'residual-wise' and 'output-wise' kernels are literally the same
    XLA program — pinned by tests/test_schedule.py::
    test_compute_at_output_rolls.  The chooser still runs so the
    decision is made, recorded, and observable (gp.compute_at_output),
    matching the reference's autoscheduler step 5."""
    for gp, sched in zip(groups, schedules):
        g = gp.group
        cao = sched in (JTJpSchedule.INLINE, JTJpSchedule.LINEARIZE)
        if cao:
            for s in list(g.uslots):
                dims = tuple(im for im in s.image.dims)
                full = tuple(d.dim for d in g.ext_domains)
                if dims != full:
                    cao = False
                    break
        gp.compute_at_output = cao
        if log is not None and cao:
            log.append(f"  {gp.name}: compute_at_output (unknown dims == "
                       "residual domain; lowers to inverse rolls)")
    return [getattr(gp, "compute_at_output", False) for gp in groups]


def select_measured_domain_orders(groups, schedules, log=None):
    """Measured-feedback reorder selection for the heuristic: per group,
    the external-domain order whose recorded timing (written by
    autotune.autoschedule_search over the exhaustive order enumeration)
    beats the default order's, or None to keep discovery order.  This is
    the reference's reorder_for_coherence slot (thallo.t:5308-5325)
    driven by data instead of an analytic warp-coherence score — the
    analytic model has no reorder term on TPU (XLA owns loop order; the
    order only picks the row-major flattening), so measurements are the
    only honest signal."""
    measured = load_measurements()
    out = []
    for gp, sched in zip(groups, schedules):
        g = gp.group
        doms = list(g.ext_domains)
        choice = None
        if 2 <= len(doms) <= 3 and not getattr(g, "reordered", False):
            base = measured.get(group_measure_key(gp, sched))
            best_t = base
            for p in itertools.permutations(doms):
                if list(p) == doms:
                    continue
                t = measured.get(group_measure_key(gp, sched, order=p))
                if t is not None and (best_t is None or t < best_t):
                    choice, best_t = list(p), t
            if log is not None and choice is not None:
                log.append(
                    f"  {gp.name}: measured reorder "
                    + ">".join(_domain_labels(choice))
                    + f" {best_t * 1e3:.3f}ms beats default"
                    + (f" {base * 1e3:.3f}ms" if base is not None else " (unmeasured)")
                )
        out.append(choice)
    return out


def load_measurements():
    import json
    import os

    p = measurements_path()
    if os.path.exists(p):
        try:
            with open(p) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {}
    return {}


def record_measurement(key: str, seconds: float):
    import json

    data = load_measurements()
    prev = data.get(key)
    data[key] = min(prev, seconds) if prev is not None else seconds
    try:
        with open(measurements_path(), "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
    except OSError:
        pass


def default_schedule(g) -> JTJpSchedule:
    """TPU-first default for an unscheduled group: stencil groups run
    matrix-free LINEARIZE (roll/inverse-roll transposes are exact and
    cheap); graph groups — any slot needing a real gather/scatter —
    default to materialized block-sparse J^T J, which makes the PCG inner
    loop scatter-free (see solver/blocksparse.py and PERF.md's scatter
    wall).  The reference's corresponding defaults are INLINE + the
    autoscheduler's materialization picks (thallo.t:5192-5271)."""
    if (g.uslots and not g.con_domains
            and all(not s.dep_cons for s in g.uslots)
            and any(g._roll_plan(s) is None for s in g.uslots)):
        return JTJpSchedule.PRECOMPUTE_JTJ
    return JTJpSchedule.LINEARIZE


def heuristic_schedule(groups, lin_iter_hint: int = 10, dtype_bytes: int = 4,
                       log=None) -> List[JTJpSchedule]:
    """Pick the cheapest feasible schedule per group (reference
    select_jtjp_materialization, thallo.t:5233-5271).  Prior measured
    timings (autotune.autoschedule_search writes them, keyed by group
    shape + schedule) take precedence over the analytic estimate —
    data beats the machine model (ROADMAP #8)."""
    budget = 0.6 * HBM_BYTES
    measured = load_measurements()
    chosen = []
    for gp in groups:
        best, best_cost = None, float("inf")
        for cand in CANDIDATES:
            cost, resident = estimate_group_cost(gp, cand, lin_iter_hint, dtype_bytes)
            if resident > budget:
                continue
            key = group_measure_key(gp, cand)
            m = measured.get(key)
            # measured seconds vs estimated bytes aren't commensurate;
            # normalize: rank by measured when available for ALL feasible
            # candidates of this group, else by estimate
            if log is not None:
                log.append(
                    f"  {gp.name}: {cand.value} est_bytes={cost:.3g} "
                    f"resident={resident:.3g}"
                    + (f" measured={m * 1e3:.3f}ms" if m is not None else "")
                )
            score = (0, m) if m is not None else (1, cost)
            if best is None or score < best_cost:
                best, best_cost = cand, score
        chosen.append(best or JTJpSchedule.INLINE)
        if log is not None:
            log.append(f"  {gp.name} -> {chosen[-1].value}")
    return chosen


def enumerate_domain_orders(groups, max_per_group: int = 6, max_total: int = 16):
    """Per-group external-domain orderings for the exhaustive
    autoscheduler (the reference enumerates schedules x domain
    permutations, generate_all_schedules thallo.t:4318-4482).  Entry 0 is
    all-default (discovery order, encoded None).  Only groups with 2-3
    external domains contribute permutations — the ordering decides the
    row-major flattening of the residual grid (gather/scatter index
    locality + which axis tiles onto lanes), which is only a real choice
    for multi-dim domains."""
    per_group = []
    for gp in groups:
        doms = list(gp.group.ext_domains)
        opts = [None]
        if 2 <= len(doms) <= 3:
            for p in itertools.permutations(doms):
                if list(p) != doms and len(opts) < max_per_group:
                    opts.append(list(p))
        per_group.append(opts)
    out = []
    for combo in itertools.product(*per_group):
        out.append(list(combo))
        if len(out) >= max_total:
            break
    return out


def enumerate_schedules(groups, max_candidates: int = 2000, seed: int = 0):
    """Per-group schedule combinations with memory pruning; sampled
    WITHOUT materializing the cartesian product when it explodes
    (reference generate_all_schedules, thallo.t:4318-4482: enumerate,
    prune, stochastic sample beyond 2000 — also without materializing)."""
    n = len(CANDIDATES)
    G = len(groups)
    total = n ** G if G else 0

    def decode(ix):
        # mixed-radix decode: candidate index -> per-group schedule combo
        combo = []
        for _ in range(G):
            combo.append(CANDIDATES[ix % n])
            ix //= n
        return combo

    if total > max_candidates:
        rng = np.random.RandomState(seed)
        # sample distinct indices lazily (4^G may overflow rng.choice)
        seen = set()
        while len(seen) < max_candidates:
            seen.add(int(rng.randint(0, min(total, 2**62))))
        indices = sorted(seen)
        combos = (decode(i) for i in indices)
    else:
        combos = (list(c) for c in itertools.product(*[CANDIDATES] * G))
    out = []
    budget = 0.6 * HBM_BYTES
    for combo in combos:
        resident = sum(estimate_group_cost(gp, s)[1] for gp, s in zip(groups, combo))
        if resident <= budget:
            out.append(list(combo))
    return out
