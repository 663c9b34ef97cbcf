"""Plan: the compiled problem + solve driver.

Mirrors the reference C API semantics (/root/reference/API/release/include/
Thallo.h:41-106): ProblemPlan -> plan; plan.init/step/solve/cost/
get_summary; string-keyed solver parameters
(Thallo_SetSolverParameter, gauss_newton.t:1828-1862).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .lower import LoweredGroup
from .solver.gn import (
    SOLVER_PARAMETER_DEFAULTS,
    CompiledSolver,
    GroupPlan,
    LMState,
    SolverParams,
    tree_zeros_like,
)
from .spec import JTJpSchedule, ProblemSpec
from .utils.timer import PerfSummary, Timer


_cache_enabled = False


def _enable_compile_cache():
    """Persistent XLA compilation cache: plan compiles are the analog of
    the reference's slowest path (Thallo_ProblemPlan, SURVEY.md §3.2);
    caching makes repeat solves of the same problem shape start fast."""
    global _cache_enabled
    if _cache_enabled:
        return
    try:
        import os

        if jax.default_backend() == "cpu":
            # CPU AOT results are machine-feature-specific; a cache shared
            # across heterogeneous hosts risks SIGILL (observed warnings)
            _cache_enabled = True
            return
        d = os.environ.get("THALLO_COMPILE_CACHE", os.path.expanduser("~/.cache/thallo_tpu_xla"))
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    _cache_enabled = True


_ANY_PLAN_CREATED = [False]  # x64-flip warning bookkeeping (docs/API.md)


def make_plan(spec: ProblemSpec, dim_sizes, solver="gauss_newton", **options):
    _enable_compile_cache()
    return Plan(spec, dim_sizes, solver, **options)


class Plan:
    def __init__(self, spec: ProblemSpec, dim_sizes: Dict[str, int], solver: str, **options):
        if spec.energy is None:
            raise ValueError("problem has no Residuals")
        self.spec = spec
        self.solver_kind = solver
        uses_lambda = solver in ("levenberg_marquardt", "LM", "lm", "LMGPU")
        if not uses_lambda and solver not in (
                "gauss_newton", "GN", "gn", "gaussNewtonGPU"):
            # the reference errors on unknown solver kinds at makePlan
            # (Thallo.h Thallo_ProblemPlan; thallo.t solver dispatch)
            raise ValueError(
                f"unknown solver {solver!r}: expected 'gauss_newton' or "
                "'levenberg_marquardt' (aliases GN/gaussNewtonGPU, LM/LMGPU)")
        self.dtype = jnp.float64 if spec.double_precision else jnp.float32
        if spec.double_precision:
            # NOTE process-wide: x64 must be on for f64 arrays to exist at
            # all in JAX.  All host->device conversions in this package pass
            # explicit dtypes, so already-compiled f32 plans are unaffected;
            # only code OUTSIDE the framework relying on implicit f32
            # promotion could observe the flip (docs/API.md "Precision").
            if not jax.config.jax_enable_x64 and _ANY_PLAN_CREATED[0]:
                import warnings

                warnings.warn(
                    "double_precision plan enables jax_enable_x64 for the "
                    "WHOLE process; plans created earlier in this process "
                    "keep their dtypes, but outside code relying on "
                    "implicit f32 promotion will now see f64 "
                    "(docs/API.md#precision)", stacklevel=3)
            jax.config.update("jax_enable_x64", True)
        _ANY_PLAN_CREATED[0] = True

        # bind dim sizes (reference: dims bound at plan time from the C
        # dimensions array, thallo.t:577-584)
        if isinstance(dim_sizes, (list, tuple)):
            dim_sizes = {d.name: s for d, s in zip(spec.dims, dim_sizes)}
        self.dim_sizes = dict(dim_sizes)
        for d in spec.dims:
            if d.name not in self.dim_sizes:
                raise ValueError(f"no size for dim {d.name}")
            new = int(self.dim_sizes[d.name])
            if d.size is not None and d.size != new:
                # Dim sizes live on the (shared) spec; two live plans with
                # different sizes would silently corrupt each other
                # (reference binds per-plan, thallo.t:577-584).
                raise ValueError(
                    f"dim {d.name} already bound to {d.size} by an earlier "
                    f"plan; build a fresh spec to plan at size {new}"
                )
            d.size = new

        # Autoscheduler modes (reference useAutoscheduler, thallo.t:
        # 4203-5532): 0 = respect user directives; 1 = heuristic override
        # (clear directives, cost-model pick); 2 = clear to default;
        # >=3 = exhaustive candidate use_autoscheduler-3 (reference
        # exauto_index loop, thallo.t:5427-5530)
        _known = {"use_autoscheduler", "lin_iter_hint", "solver_parameters",
                  "timing_level", "verbosity", "guarded_invert_type",
                  "jacobi_scaling", "linear_solver", "schur_eliminate", "trace_dir",
                  "profile_compile", "debug_check_finite", "block_dtype",
                  "steps_per_dispatch", "preconditioner", "schur_dense_max",
                  "sort_residuals"}
        bad = set(options) - _known
        if bad:
            raise ValueError(f"unknown plan option(s): {sorted(bad)}")
        if options.get("linear_solver", "pcg") not in (
                "pcg", "direct", "schur_pcg", "schur_dense"):
            raise ValueError("linear_solver must be 'pcg', 'direct', "
                             "'schur_pcg' or 'schur_dense'")
        if options.get("guarded_invert_type", "CERES") not in (
                "CERES", "MODIFIED_CERES", "EPSILON_ADD"):
            raise ValueError("invalid guarded_invert_type")
        if options.get("jacobi_scaling", "ONCE_PER_SOLVE") not in (
                "ONCE_PER_SOLVE", "EVERY_ITERATION", "NONE"):
            raise ValueError("invalid jacobi_scaling")
        self.use_autoscheduler = int(options.get("use_autoscheduler", 0) or 0)
        auto = self.use_autoscheduler

        if auto == 1:
            from .schedule import heuristic_schedule, select_ca_materialization

            log = ["heuristic autoschedule:"]
            # ComputedArray materialize-vs-inline is decided BEFORE
            # lowering (inlining is baked into the lowered groups) --
            # reference select_expressions_to_materialize,
            # thallo.t:5192-5231
            select_ca_materialization(spec, log=log)
            groups = self._build_groups(spec, auto, merge_all=True)
            log.append(f"({len(groups)} groups)")
            lin_hint = int(options.get("lin_iter_hint", SOLVER_PARAMETER_DEFAULTS["lIterations"]))
            schedules = heuristic_schedule(groups, lin_hint, log=log)
            # reorder: measured timings take precedence (autotune store);
            # with no recorded measurement the COLD-START analytic rule
            # applies — prefer the external order whose row-major
            # flattening makes each sparse slot's index array
            # piecewise-repeat so ops/structured.py can lower its hot
            # gathers (reference reorder_for_coherence, thallo.t:
            # 5308-5325; the TPU translation of 'non-unknown domains
            # innermost')
            from .schedule import (analytic_domain_orders,
                                   choose_compute_at_output,
                                   select_measured_domain_orders)

            dorders = select_measured_domain_orders(groups, schedules, log=log)
            a_orders = analytic_domain_orders(groups, schedules, log=log)
            dorders = [m if m is not None else a
                       for m, a in zip(dorders, a_orders)]
            if any(o is not None for o in dorders):
                groups = self._build_groups(spec, auto, merge_all=True,
                                            domain_orders=dorders)
            for gp, s in zip(groups, schedules):
                gp.schedule = s
            # reference autoscheduler step 5 (thallo.t:5273-5306); on
            # TPU the chosen form is what the lowering already produces
            # (inverse rolls) — decision recorded for observability
            choose_compute_at_output(groups, schedules, log=log)
            self._log_schedules(log)
        elif auto >= 3:
            # exhaustive candidate space = merge-vs-split x ComputedArray
            # inline powerset x per-group schedule combos (the reference
            # enumerates schedules x domain permutations x CA powersets,
            # generate_all_schedules thallo.t:4318-4482)
            from .schedule import enumerate_domain_orders, enumerate_schedules

            idx = auto - 3
            n_ca = len(spec.computed)
            chosen = None
            for merge_all in (True, False):
                for ca_bits in range(1 << n_ca):
                    for b, ca in enumerate(spec.computed):
                        ca.materialize = bool((ca_bits >> b) & 1)
                    groups = self._build_groups(spec, auto, merge_all=merge_all)
                    combos = enumerate_schedules(groups)
                    dorders = enumerate_domain_orders(groups)
                    total = len(combos) * len(dorders)
                    if idx < total:
                        combo = combos[idx // len(dorders)]
                        dorder = dorders[idx % len(dorders)]
                        if any(o is not None for o in dorder):
                            # rebuild with the permuted external orders
                            groups = self._build_groups(
                                spec, auto, merge_all=merge_all,
                                domain_orders=dorder)
                        chosen = (groups, combo, merge_all, ca_bits, dorder)
                        break
                    idx -= total
                if chosen:
                    break
            if chosen is None:
                raise IndexError(f"autoschedule index {auto - 3} exhausted")
            groups, combo, merge_all, ca_bits, dorder = chosen
            for gp, s in zip(groups, combo):
                gp.schedule = s
            self._log_schedules(
                [f"exhaustive candidate {auto - 3}: merge={merge_all} "
                 f"ca_bits={ca_bits:b} "
                 + ", ".join(f"{gp.name}={s.value}" for gp, s in zip(groups, combo))
                 + "".join(
                     f" reorder[{gp.name}]=" + ">".join(d.name for d in o)
                     for gp, o in zip(groups, dorder) if o is not None)]
            )
        else:
            groups = self._build_groups(spec, auto, merge_all=True)

        if options.get("profile_compile"):
            # compile-time profiler (the analog of the reference's Lua
            # sampling profiler around planning, profile_plan
            # thallo.t:19,1386-1429 / pprofiler.t)
            import cProfile
            import pstats

            prof = cProfile.Profile()
            prof.enable()
            self.compiled = CompiledSolver(spec, groups, uses_lambda, self.dtype, options)
            prof.disable()
            pstats.Stats(prof).sort_stats("cumulative").print_stats(15)
        else:
            self.compiled = CompiledSolver(spec, groups, uses_lambda, self.dtype, options)
        self.group_names = [g.name for g in groups]
        if int(options.get("verbosity", 0)):
            for gp in groups:
                g = gp.group
                print(f"[thallo_tpu] group {gp.name}: ext={[d.name for d in g.ext_domains]} "
                      f"con={[d.name for d in g.con_domains]} slots={len(g.uslots)} "
                      f"rc={g.rc} schedule={gp.schedule.value}")
        self.solver_parameters = dict(SOLVER_PARAMETER_DEFAULTS)
        self.solver_parameters.update(options.get("solver_parameters", {}))
        self.timing_level = int(options.get("timing_level", 1))
        self.verbosity = int(options.get("verbosity", 0))
        self.steps_per_dispatch = int(options.get("steps_per_dispatch", 1))
        # jax.profiler trace of the solve (the analog of the reference's
        # timingLevel>=2 CUDA-event kernel traces, util.t:774-790)
        self.trace_dir = options.get("trace_dir")
        # host-side non-finite guard each step (the reference's defensive
        # debugging tier, SURVEY.md §5 race-detection/sanitizers)
        self.debug_check_finite = bool(options.get("debug_check_finite", False))
        # init-time residual-domain reorder (reorder.py): "auto" sorts
        # order-free graph domains by their hottest unstructured sparse
        # map so the block-sparse setup reads contiguous runs; False
        # disables (also THALLO_SORT_RESIDUALS=0)
        self.sort_residuals = options.get("sort_residuals", "auto")
        self._residual_perms = {}
        self._raw_inputs0 = None
        self._sp_cache = None
        self.timer = Timer()
        self._inputs = None
        self._U = None
        self._lm = None
        self._finished = False
        self._iter = 0

    def _build_groups(self, spec, auto, merge_all=True, domain_orders=None):
        """Group residuals by identical (external domains, schedule) — the
        reference's toresidualgroups (thallo.t:4149-4201) — so e.g.
        image_warping's 4 reg + 1 fit residuals become ONE kernel.
        Explicit energy.merge() requests are honored first; merge_all=False
        (exhaustive split candidates) keeps every named residual its own
        group (reference split/full_split, thallo.t:5678-5727).

        domain_orders (exhaustive autoscheduler): per-group external
        domain orderings, positionally aligned with a previous
        identically-keyed build (reference domain permutations in
        generate_all_schedules, thallo.t:4318-4482).  In directive mode
        (auto=0) each residual's user reorder() applies instead."""
        merged_names = {}
        energy = spec.energy
        for mg in energy._merges:
            for n in mg[1:]:
                merged_names[n] = mg[0]
        bucket = {}
        order = []
        for nr in energy:
            tgt = merged_names.get(nr.name, nr.name)
            if tgt != nr.name or tgt in merged_names.values():
                key = ("merge", tgt)
            elif not merge_all:
                key = ("name", nr.name)
            else:
                key = (self._group_signature(nr, ignore_schedule=auto >= 1),)
            if key not in bucket:
                bucket[key] = (tgt if key[0] == "merge" else nr.name, [])
                order.append(key)
            bucket[key][1].append(nr)
        groups = []
        for g_idx, key in enumerate(order):
            name, nrs = bucket[key]
            exprs = []
            for nr in nrs:
                exprs.extend(nr.exprs)
            name = "_".join(nr.name for nr in nrs) if len(nrs) > 1 else name
            schedule = JTJpSchedule.LINEARIZE if auto >= 1 else nrs[0].get_schedule()
            if domain_orders is not None and g_idx < len(domain_orders):
                dorder = domain_orders[g_idx]
            elif auto == 0:
                dorder = next((nr._reorder for nr in nrs if nr._reorder), None)
            else:
                dorder = None  # autoscheduler clears directives (thallo.t:5166)
            con_splits = {}
            for nr in nrs:
                for sp_ in getattr(nr, "_splits", []):
                    if isinstance(sp_, tuple):
                        con_splits[sp_[0]] = sp_[1]
            lg = LoweredGroup(name, exprs, spec, self.dim_sizes, self.dtype,
                              domain_order=dorder, con_splits=con_splits)
            user_directed = any(
                any(nr._materialize.values()) or any(nr._sparse_mat.values())
                for nr in nrs
            )
            if auto == 0 and not user_directed:
                from .schedule import default_schedule

                schedule = default_schedule(lg)
            twin = None
            if lg.has_materialized and not lg.ca_jac_ok:
                # CA gradient arrays (lower.py jac_slots) cover the
                # common case; the force-inlined twin remains only for
                # CA accesses inside contraction fibers
                from .lower import inline_computed

                twin = LoweredGroup(
                    name + "_inlined", inline_computed(exprs, force=True),
                    spec, self.dim_sizes, self.dtype, domain_order=dorder,
                )
            force_sparse = any(
                nr._sparse_mat.get("JtJ") or nr._sparse_mat.get("J")
                for nr in nrs
            )
            groups.append(GroupPlan(name=name, group=lg, schedule=schedule,
                                    inline_group=twin,
                                    force_sparse=force_sparse))
        return groups

    @staticmethod
    def _group_signature(nr, ignore_schedule=False):
        """(external-domain ids, schedule knobs): residuals with identical
        signatures lower into one group (reference toresidualgroups
        domain+schedule classification, thallo.t:4149-4201).  The
        autoscheduler clears user directives first (thallo.t:5166-5190),
        hence ignore_schedule."""
        from .lower import Collection, inline_computed

        col = Collection()
        for e in inline_computed(nr.exprs):
            col.walk(e, frozenset())
        doms = tuple(sorted(d.uid for d in col.ext_domains))
        if ignore_schedule:
            return (doms, ())
        sched = (
            nr.get_schedule().value,
            tuple(sorted(nr._compute_at_output.items())),
        )
        return (doms, sched)

    def _log_schedules(self, lines):
        """Append schedule decisions to schedules.txt (the reference's
        search telemetry, thallo.t:4221-4251)."""
        self.schedule_log = list(lines)
        try:
            with open("schedules.txt", "a") as f:
                for ln in lines:
                    f.write(ln + "\n")
        except OSError:
            pass

    # -- parameter API (Thallo_Set/GetSolverParameter) ---------------------
    def set_solver_parameter(self, name: str, value):
        if name not in self.solver_parameters:
            raise KeyError(f"unknown solver parameter {name}")
        self.solver_parameters[name] = value
        self._sp_cache = None

    def get_solver_parameter(self, name: str):
        return self.solver_parameters[name]

    # -- data binding ------------------------------------------------------
    def _normalize_inputs(self, inputs: Dict[str, np.ndarray]):
        out = {}
        for im in list(self.spec.unknowns) + list(self.spec.arrays):
            if im.name not in inputs:
                raise ValueError(f"missing input {im.name}")
            a = jnp.asarray(inputs[im.name], dtype=self.dtype)
            shape = tuple(d.size for d in im.dims) + (im.channels,)
            if a.ndim == len(im.dims) and im.channels == 1:
                a = a[..., None]
            if a.shape != shape:
                raise ValueError(f"input {im.name}: expected {shape}, got {a.shape}")
            out[im.name] = a
        for sm in self.spec.sparse_maps:
            if sm.name not in inputs:
                raise ValueError(f"missing sparse map {sm.name}")
            raw = np.asarray(inputs[sm.name])
            # bounds-check on the host at bind time: device gathers use
            # promise_in_bounds / wrap and would silently clamp a bad
            # index (the reference's validateParameters probes every user
            # pointer, util.t:645-674).  Maps store ONE INDEX COLUMN PER
            # OUT DIM (lower._sparse_arrays), so validate per column
            # against that dim's own size.
            if raw.size:
                cols = raw.reshape(-1, len(sm.out_dims))
                for j, d in enumerate(sm.out_dims):
                    cj = cols[:, j]
                    if cj.min() < 0 or cj.max() >= d.size:
                        raise ValueError(
                            f"sparse map {sm.name}: indices for out dim "
                            f"{d.name} must be in [0, {d.size}); got range "
                            f"[{cj.min()}, {cj.max()}]")
            arr = jnp.asarray(raw, dtype=jnp.int32)
            out[sm.name] = arr
        for p in self.spec.params:
            if p.name not in inputs:
                raise ValueError(f"missing param {p.name}")
            out[p.name] = jnp.asarray(inputs[p.name], dtype=self.dtype)
        return out

    def _maybe_sort_residuals(self, inputs):
        """Init-time residual-domain sort (reorder.py): relabel order-free
        graph domains so the hottest unstructured sparse map is sorted —
        the block-sparse row tables then read contiguous runs
        (solver/blocksparse.py sorted-run tables) instead of paying the
        per-index gather floor on every level gather.  Results are
        identical (the residual multiset is preserved; tests/
        test_reorder.py).  The raw user order is kept for update_inputs."""
        import os

        self._raw_inputs0 = dict(inputs)
        self._residual_perms = {}
        if not self.sort_residuals or \
                os.environ.get("THALLO_SORT_RESIDUALS", "1") == "0":
            return inputs
        from . import reorder

        gps = self.compiled.groups
        jgs = [gp.jac_group() for gp in gps]
        want = {id(j): self.compiled._wants_bsr(gp)
                for j, gp in zip(jgs, gps)}
        check = jgs + [gp.group for gp in gps if gp.inline_group is not None]
        try:
            perms = reorder.choose_sort_keys(
                self.spec, check, inputs,
                lambda g: want.get(id(g), False))
            out = reorder.apply_perms(self.spec, inputs, perms)
        except Exception:
            if self.sort_residuals != "auto":
                raise
            return inputs  # auto mode: sorting is an optimization only
        if perms and self.verbosity:
            print(f"[thallo_tpu] residual sort: {sorted(perms)}")
        self._residual_perms = perms
        return out

    def init(self, inputs: Dict[str, np.ndarray]):
        """Bind user arrays and reset solver state (Thallo_ProblemInit,
        gauss_newton.t:1166-1198).  Unknown initial values are taken from
        `inputs` by name."""
        inputs = self._maybe_sort_residuals(inputs)
        self._inputs = self._normalize_inputs(inputs)
        # U must NOT alias self._inputs: run_steps donates U, and on TPU a
        # donated step deletes the donated buffers — aliasing would brick
        # reset_unknowns()/_all_inputs() after the first donated step.
        self._U = {im.name: jnp.copy(self._inputs[im.name]) for im in self.spec.unknowns}
        self._const_inputs = {
            k: v for k, v in self._inputs.items()
            if k not in self._U
        }
        # eager (not jitted): builds host-side scatter plans from the
        # concrete sparse maps (data-dependent shapes)
        self._prep = self.compiled.prepare(self._const_inputs)
        zeros = tree_zeros_like(self._U)
        dt = self.dtype
        with self.timer.event("Nonlinear Setup"):
            c0 = float(self.compiled.cost_jit(self._U, self._step_inputs()))
        self._lm = LMState(
            trust_region_radius=jnp.asarray(self.solver_parameters["trust_region_radius"], dt),
            radius_decrease_factor=jnp.asarray(self.solver_parameters["radius_decrease_factor"], dt),
            prev_cost=jnp.asarray(c0, dt),
            n_iter=jnp.asarray(0, jnp.int32),
            ssq=zeros,
            finished=jnp.asarray(False),
        )
        self._finished = False
        self._iter = 0
        import time as _time

        # solve-time budget starts at init, not Plan construction (compile
        # or idle time before the solve must not count against
        # max_solver_time_in_seconds, gauss_newton.t:1767-1779)
        self._solve_t0 = _time.perf_counter()
        self._initial_cost = c0
        if self.verbosity:
            print(f"[thallo_tpu] initial cost: {c0:g}")
        if self.verbosity >= 2:
            self._log_structured()
        return c0

    def _log_structured(self):
        """Report which sparse-map accesses got structured-index plans
        (ops/structured.py) — the observability for 'why is this graph
        fast/slow': planned accesses run as windowed slices, unplanned
        ones pay the per-index gather floor (PERF.md)."""
        from .solver.blocksparse import GroupBsr

        consts = self._prep.get("consts", []) if isinstance(self._prep, dict) else []
        for gp, c in zip(self.compiled.groups, consts):
            if not isinstance(c, dict):
                continue
            a = c.get("affine")
            if a is not None and any(p is not None for p in a.value):
                slots = [s.image.name for s, p in
                         zip(gp.group.uslots, a.value) if p is not None]
                print(f"[thallo_tpu] group {gp.name}: affine slot plans for "
                      f"{slots}")
            bsr = c.get("bsr")
            if isinstance(bsr, GroupBsr):
                n_p = sum(p is not None for pl in bsr.perm_plans for p in pl)
                n_t = sum(len(pl) for pl in bsr.perm_plans)
                n_cp = sum(p is not None for pl in bsr.col_plans
                           if pl is not None for p in pl)
                n_ct = sum(c_.shape[0] for c_ in bsr.cols)  # cols are [W, N]
                n_lv = sum(s is not None for s in bsr.row_sels)
                n_oh = sum(x is not None for x in bsr.oh_idxs)
                extra = ""
                if n_lv:
                    extra += f", {n_lv} overflow level(s) (degree skew)"
                if n_oh:
                    extra += f", {n_oh} one-hot row slot(s)"
                print(f"[thallo_tpu] group {gp.name}: BSR columns planned "
                      f"{n_p}/{n_t} (row tables), {n_cp}/{n_ct} (col tables)"
                      f"{extra}")

    def update_inputs(self, inputs: Dict[str, np.ndarray]):
        """Update NON-unknown problem inputs (const arrays, scalar params,
        sparse maps) between nonlinear iterations, preserving the solver
        state (unknowns, trust region).  The reference re-binds every
        parameter pointer on each Thallo_ProblemStep
        (util.t initParameters setGPUptr, gauss_newton.t:1559), which is
        what lets applications run weight schedules and doubly-nested
        solvers (bundle_fusion) through the step API.  Host-side prep
        (gathered const tables, BSR row tables, static masks) is rebuilt,
        so changing a sparse map mid-solve is supported but costs an
        init-level re-prep."""
        if self._inputs is None:
            raise RuntimeError("update_inputs before init()")
        unknown_names = {im.name for im in self.spec.unknowns}
        bad = sorted(set(inputs) & unknown_names)
        if bad:
            raise ValueError(
                f"update_inputs cannot rebind unknowns {bad}; use init() "
                "or load_state() to reset unknown values")
        # merge over the RAW (pre-sort) user inputs: update values arrive
        # in user order, and the residual sort (if any) re-applies to the
        # merged dict — mixing sorted and unsorted arrays would corrupt
        # the relabeling
        merged = dict(self._raw_inputs0 if self._raw_inputs0 is not None
                      else self._all_inputs())
        merged.update(inputs)
        merged = self._maybe_sort_residuals(merged)
        normalized = self._normalize_inputs(merged)
        self._inputs = {
            k: (self._inputs[k] if k in unknown_names else v)
            for k, v in normalized.items()
        }
        self._const_inputs = {
            k: v for k, v in self._inputs.items() if k not in unknown_names
        }
        self._prep = self.compiled.prepare(self._const_inputs)
        if self._lm is not None and self.compiled.uses_lambda:
            # the LM trust region must judge the NEXT step against the
            # updated objective, not the pre-update cost
            c = float(self.compiled.cost_jit(self._U, self._step_inputs()))
            self._lm = self._lm._replace(prev_cost=jnp.asarray(c, self.dtype))

    def _all_inputs(self):
        return self._inputs

    def _step_inputs(self):
        # unknown entries are never read inside the step (residuals gather
        # from the U pytree); passing only const inputs keeps donation of
        # U safe and shrinks per-call arg processing
        return self._const_inputs

    def _sp(self):
        # cached: rebuilding does 9 tiny host->device transfers (~10 ms on
        # TPU, measured) — far more than a PCG iteration
        if getattr(self, "_sp_cache", None) is None:
            self._sp_cache = SolverParams.from_dict(self.solver_parameters, self.dtype)
        return self._sp_cache

    # -- stepping ----------------------------------------------------------
    def step(self) -> bool:
        """One nonlinear iteration (Thallo_ProblemStep).  Returns True while
        the solve should continue.

        GN steps are dispatched asynchronously (GN has no device-side stop
        condition, gauss_newton.t GN path) — the host never blocks between
        iterations.  LM must read the trust-region stop flag.  timingLevel
        >= 2 forces a sync per step for accurate per-iteration timings
        (the reference's invasive timing mode, Thallo.h:19-25)."""
        if self._finished:
            return False
        n = int(self.solver_parameters["nIterations"])
        if self._iter >= n:
            self._finished = True
            return False
        invasive = self.timing_level >= 2
        if self.timing_level >= 3 and self._iter == 0:
            # per-kernel probe rows once per solve (reference invasive
            # per-kernel timing, Thallo.h:19-25 / util.t:774-790)
            self.kernel_stats()
        with self.timer.event("Nonlinear Iteration"):
            if invasive:
                # phase-split stepping: each of the reference's named
                # phases (util.t:537-541) gets a real wall-clock stat
                setup_jit, linear_jit, finish_jit = self.compiled.phase_jits()
                ins, sp, prep = self._step_inputs(), self._sp(), self._prep
                with self.timer.event("Nonlinear Setup"):
                    state = setup_jit(self._U, self._lm, ins, sp, prep)
                    jax.block_until_ready(state)
                with self.timer.event("Linear Solve"):
                    delta = linear_jit(self._U, state, ins, sp, prep)
                    jax.block_until_ready(delta)
                with self.timer.event("Nonlinear Finish"):
                    U, lm, stop, new_cost = finish_jit(
                        self._U, self._lm, state, delta, ins, sp, prep
                    )
                    jax.block_until_ready(U)
            else:
                U, lm, stop, new_cost = self.compiled.step_jit(
                    self._U, self._lm, self._step_inputs(), self._sp(), self._prep
                )
        self._U, self._lm = U, lm
        self._iter += 1
        if self.debug_check_finite:
            bad = [k for k, v in U.items() if not bool(jnp.isfinite(v).all())]
            if bad:
                raise FloatingPointError(
                    f"non-finite unknowns after iteration {self._iter}: {bad}"
                )
        if self.compiled.uses_lambda and bool(stop):
            self._finished = True
            return False
        max_t = float(self.solver_parameters["max_solver_time_in_seconds"])
        import time as _time

        if max_t > 0 and _time.perf_counter() - getattr(
                self, "_solve_t0", self.timer._t0) > max_t:
            self._finished = True
            return False
        return True

    def run_steps(self, n: int) -> int:
        """Dispatch n nonlinear iterations back-to-back with donated
        unknown/state buffers and no per-step host work (the fast path for
        GN, whose stop conditions are host-side only).  Returns the number
        of steps dispatched."""
        if self._finished or n <= 0:
            return 0
        comp = self.compiled
        limit = int(self.solver_parameters["nIterations"]) - self._iter
        n = min(n, max(limit, 0))
        if n <= 0:
            self._finished = True
            return 0
        U, lm = self._U, self._lm
        cin, sp, prep = self._step_inputs(), self._sp(), self._prep
        k = int(getattr(self, "steps_per_dispatch", 1))
        with self.timer.event("Nonlinear Iteration"):
            if k > 1:
                # fold k nonlinear steps into one executable (lax.scan) so
                # the per-dispatch host overhead amortizes over k
                # iterations (ROADMAP #3); LM bodies no-op via lax.cond
                # once the device-side stop flag is set; remainder runs
                # single steps
                sfn = self._scan_step(k)
                stop = jnp.asarray(False)
                for _ in range(n // k):
                    U, lm, stop, _ = sfn(U, lm, cin, sp, prep)
                fn = self._donated_step()
                for _ in range(n - (n // k) * k):
                    U, lm, stop, _ = fn(U, lm, cin, sp, prep)
            else:
                fn = self._donated_step()
                for _ in range(n):
                    U, lm, stop, _ = fn(U, lm, cin, sp, prep)
        self._U, self._lm = U, lm
        self._iter += n
        if comp.uses_lambda and bool(stop):
            self._finished = True
        if self._iter >= int(self.solver_parameters["nIterations"]):
            self._finished = True
        return n

    def _scan_step(self, k: int):
        """k nonlinear iterations scanned inside ONE jit.  For LM the
        body is wrapped in lax.cond on the device-side finished flag so
        scanning past a trust-region stop leaves the state untouched
        (the reference's step() returns 0 and the host stops calling,
        gauss_newton.t:1763-1785 — here the guard stays on device)."""
        cache = getattr(self, "_scan_step_fns", {})
        if k not in cache:
            comp = self.compiled

            def multi(U, lm, inputs, sp, prep):
                def body(carry, _):
                    Uc, lmc = carry
                    if comp.uses_lambda:
                        def run(_):
                            U2, lm2, _, cost = comp.nonlinear_step(
                                Uc, lmc, inputs, sp, prep)
                            return U2, lm2, cost
                        def frozen(_):
                            return Uc, lmc, lmc.prev_cost
                        U2, lm2, cost = jax.lax.cond(
                            lmc.finished, frozen, run, None)
                    else:
                        U2, lm2, _, cost = comp.nonlinear_step(
                            Uc, lmc, inputs, sp, prep)
                    return (U2, lm2), cost
                (U, lm), costs = jax.lax.scan(body, (U, lm), None, length=k)
                stop = lm.finished if comp.uses_lambda else jnp.asarray(False)
                return U, lm, stop, costs[-1]

            donate = () if jax.default_backend() == "cpu" else (0, 1)
            cache[k] = jax.jit(multi, donate_argnums=donate)
            self._scan_step_fns = cache
        return cache[k]

    def _donated_step(self):
        if getattr(self, "_donated_step_fn", None) is None:
            if jax.default_backend() == "cpu":
                self._donated_step_fn = self.compiled.step_jit
            else:
                self._donated_step_fn = jax.jit(
                    self.compiled.nonlinear_step, donate_argnums=(0, 1)
                )
        return self._donated_step_fn

    def warmup(self) -> None:
        """Pre-compile every solve-path executable (cost, the single
        step, the donated step, the scanned dispatch if configured)
        WITHOUT changing solver state, so the first solve()/step() after
        deployment pays zero compile latency.  The reference compiles at
        Thallo_ProblemPlan; under jit the compile otherwise happens at
        first dispatch — call this at plan time for latency-sensitive
        serving.  Also runs one throwaway step on copies of the state to
        populate the device autotuner/executable caches end to end."""
        if self._inputs is None:
            raise RuntimeError("call init() first")
        comp = self.compiled
        cin, sp, prep = self._step_inputs(), self._sp(), self._prep
        U = {k: jnp.copy(v) for k, v in self._U.items()}
        lm = self._lm
        comp.cost_jit(U, cin)
        out = comp.step_jit(U, lm, cin, sp, prep)
        if jax.default_backend() != "cpu":
            # the donated/scanned fast paths compile separately; feed them
            # the throwaway copies (donation invalidates them, not state)
            U2, lm2, _, _ = out
            fn = self._donated_step()
            U2, lm2, _, _ = fn(U2, lm2, cin, sp, prep)
            k = int(getattr(self, "steps_per_dispatch", 1))
            if k > 1:
                self._scan_step(k)(U2, lm2, cin, sp, prep)
        jax.block_until_ready(self._U)

    def solve(self, inputs: Optional[Dict] = None) -> float:
        """Full solve (Thallo_ProblemSolve): init + steps until done.
        Returns final cost."""
        if inputs is not None:
            self.init(inputs)
        if self._inputs is None:
            raise RuntimeError("call init() first")
        import contextlib

        tracer = (
            jax.profiler.trace(self.trace_dir) if self.trace_dir else contextlib.nullcontext()
        )
        with tracer, self.timer.event("Total"):
            if not self.compiled.uses_lambda and not self.debug_check_finite and \
                    self.timing_level < 2 and \
                    float(self.solver_parameters["max_solver_time_in_seconds"]) == 0:
                # GN has no device-side stop: dispatch all steps at once
                # (timingLevel>=2 wants per-phase stats -> step() instead)
                self.run_steps(int(self.solver_parameters["nIterations"]))
            while self.step():
                pass
            jax.block_until_ready(self._U)
        final = self.cost()
        if self.verbosity:
            print(f"[thallo_tpu] final cost: {final:g} after {self._iter} iterations")
        return final

    def cost(self) -> float:
        return float(self.compiled.cost_jit(self._U, self._step_inputs()))

    def reset_unknowns(self):
        """Restore unknowns to their initial values (reference
        reset_unknowns / initX snapshot, gauss_newton.t:298-299,
        1801-1804)."""
        if self._inputs is None:
            raise RuntimeError("call init() first")
        self._U = {im.name: jnp.copy(self._inputs[im.name]) for im in self.spec.unknowns}
        self._finished = False
        self._iter = 0

    def unknowns(self) -> Dict[str, jnp.ndarray]:
        return dict(self._U)

    def get_unknown(self, name, squeeze=True):
        a = self._U[name]
        if squeeze and a.shape[-1] == 1:
            a = a[..., 0]
        return a

    # -- checkpoint / resume (a capability the reference lacks:
    # SURVEY.md §5 checkpoint/resume "None") --------------------------------
    def save_state(self, path: str):
        """Snapshot the solver state (unknowns + LM scalars + iteration
        counter) to an .npz for long-solve resume."""
        if self._U is None:
            raise RuntimeError("nothing to save: call init() first")
        payload = {f"U::{k}": np.asarray(v) for k, v in self._U.items()}
        payload.update({f"ssq::{k}": np.asarray(v) for k, v in self._lm.ssq.items()})
        payload.update(
            iter=np.asarray(self._iter),
            trust_region_radius=np.asarray(self._lm.trust_region_radius),
            radius_decrease_factor=np.asarray(self._lm.radius_decrease_factor),
            prev_cost=np.asarray(self._lm.prev_cost),
            n_iter=np.asarray(self._lm.n_iter),
            finished=np.asarray(self._finished),
        )
        np.savez(path, **payload)

    def load_state(self, path: str):
        """Restore a snapshot saved by save_state (inputs must already be
        bound via init())."""
        if self._inputs is None:
            raise RuntimeError("bind inputs with init() before load_state()")
        z = np.load(path)
        self._U = {
            k[len("U::"):]: jnp.asarray(z[k], self.dtype)
            for k in z.files if k.startswith("U::")
        }
        ssq = {
            k[len("ssq::"):]: jnp.asarray(z[k], self.dtype)
            for k in z.files if k.startswith("ssq::")
        }
        dt = self.dtype
        self._lm = LMState(
            trust_region_radius=jnp.asarray(z["trust_region_radius"], dt),
            radius_decrease_factor=jnp.asarray(z["radius_decrease_factor"], dt),
            prev_cost=jnp.asarray(z["prev_cost"], dt),
            n_iter=jnp.asarray(z["n_iter"], jnp.int32),
            ssq=ssq,
            finished=jnp.asarray(bool(z["finished"])),
        )
        self._iter = int(z["iter"])
        self._finished = bool(z["finished"])

    def jacobian(self, dense: bool = False):
        """Materialize the current Jacobian: dense [n_res, n_unknowns] or
        COO (residuals, rows, cols, vals, shape) — the analog of the
        reference's J dump path (computeJ/CSR, gauss_newton.t:325-488)."""
        if self._inputs is None:
            raise RuntimeError("call init() first")
        comp = self.compiled
        ins = self._step_inputs()
        consts = self._prep["consts"]
        masks = comp.masks(ins, self._U)
        if dense:
            r, J = comp.dense_jacobian(self._U, ins, consts, masks)
            return r, J
        return comp.coo_jacobian(self._U, ins, consts, masks)

    def get_performance_summary(self) -> PerfSummary:
        return self.timer.summary()

    def kernel_stats(self, n_probe: int = 3, interior: bool = False) -> PerfSummary:
        """Per-kernel timing rows (reference timingLevel 2/3 per-kernel
        CUDA-event table, util.t:774-790).  Each solver-facing kernel
        (computeCost / PCGInit1 / PCGStep1/2/3 / PCGLinearUpdate) is
        probed in isolation n_probe times with a device sync and pushed
        into the same stats the markdown table renders.  Runs
        automatically on the first step at timingLevel>=3; XLA fuses the
        production step, so these rows are isolated-probe measurements,
        not interior timings of the fused executable — pass
        interior=True for the real interior breakdown parsed from a
        profiler trace of ONE production step (top fused-kernel
        durations, the reference's invasive timingLevel=3 analog)."""
        if self._U is None:
            raise RuntimeError("call init() before kernel_stats()")
        if interior:
            return self._interior_kernel_stats()
        comp = self.compiled
        ins, sp, prep = self._step_inputs(), self._sp(), self._prep
        probes = comp.kernel_probe_fns()
        setup_jit = jax.jit(probes["PCGInit1"])
        state = setup_jit(self._U, self._lm, ins, sp, prep)
        jax.block_until_ready(state)
        calls = {
            "computeCost": lambda f: f(self._U, ins, prep),
            "PCGInit1": lambda f: f(self._U, self._lm, ins, sp, prep),
            "PCGStep1": lambda f: f(self._U, state, ins, sp, prep),
            "PCGStep2": lambda f: f(state),
            "PCGStep3": lambda f: f(state),
            "PCGLinearUpdate": lambda f: f(self._U, state),
        }
        for name, fn in probes.items():
            jfn = setup_jit if name == "PCGInit1" else jax.jit(fn)
            call = calls[name]
            jax.block_until_ready(call(jfn))  # compile + warm
            for _ in range(n_probe):
                with self.timer.event(name):
                    jax.block_until_ready(call(jfn))
        return self.timer.summary()

    def _interior_kernel_stats(self, top_k: int = 20) -> PerfSummary:
        """Interior timing of the PRODUCTION step: run one (already
        compiled) step under jax.profiler.trace and aggregate the XLA
        device-event durations by fused-kernel name (the reference wraps
        every launch in CUDA events, util.t:774-790; under XLA the step
        is a handful of fusions, so the honest interior view is the
        trace).  Rows land in the same PerfSummary table."""
        import glob
        import tempfile

        from jax.profiler import ProfileData

        self.step()  # ensure compiled/warm outside the trace
        with tempfile.TemporaryDirectory() as td:
            with jax.profiler.trace(td):
                self.step()
                jax.block_until_ready(self._U)
            files = glob.glob(f"{td}/**/*.xplane.pb", recursive=True)
            if not files:
                raise RuntimeError("profiler produced no xplane trace")
            data = ProfileData.from_serialized_xspace(
                open(sorted(files)[-1], "rb").read())
            durs = {}
            for plane in data.planes:
                pname = plane.name.lower()
                if "cpu" in pname and "tpu" not in pname and                         "device" not in pname:
                    continue  # host threads: we want device kernels
                for line in plane.lines:
                    for ev in line.events:
                        name = ev.name
                        ns = ev.duration_ns
                        if not ns or name.startswith("$"):
                            continue
                        durs[name] = durs.get(name, 0) + ns
        from .utils.timer import RunningStats

        for name, ns in sorted(durs.items(), key=lambda kv: -kv[1])[:top_k]:
            self.timer._stats.setdefault(
                f"interior:{name[:48]}", RunningStats()).push(ns / 1e9)
        return self.timer.summary()

    @property
    def final_cost(self):
        return self.cost()

    @property
    def num_iterations(self):
        return self._iter
