"""Gauss-Newton / Levenberg-Marquardt outer loop with a matrix-free
preconditioned-conjugate-gradient inner loop.

Numerics mirror the reference solver (/root/reference/API/src/
gauss_newton.t) kernel by kernel:
  PCGInit1 / PCGInit1_Finish     gauss_newton.t:676-731
  PCGStep1/2/3                   gauss_newton.t:733-905
  PCGSaveSSq / PCGComputeCtC /
  PCGFinalizeDiagonal            gauss_newton.t:925-971, thallo.t:3911-3941
  residual reset                 gauss_newton.t:1653-1660 (PCGStep2_1st/2ndHalf)
  Q / zeta early termination     gauss_newton.t:1666-1686
  Ceres-style trust region       gauss_newton.t:1707-1761
  guardedInvert (CERES)          gauss_newton.t:638-667
  safeDivideIfNotLM              gauss_newton.t:226-234

TPU-first differences by design:
* The whole inner loop is one `lax.while_loop` on device — no host
  round-trips.  The reference does a cudaMemcpy D2H of Q every linear
  iteration (gauss_newton.t:1146-1150); here the zeta test is on-device.
* Reductions (alpha/beta/Q/cost dots) are jnp reductions; under pjit they
  become ICI `psum`s instead of warp-shuffle + global atomics
  (reference util.t:40-50, cuda_util.t:430-451).
* J^T J . p strategies (the reference's 5-way JTJpSchedule, ir.t:64-68):
  INLINE        -> jvp + vjp each step (derivatives recomputed, low memory)
  PRECOMPUTE_J  -> per-point Jacobian blocks (vmap(jacrev)) stored once per
                   nonlinear iteration; PCG step = batched einsum + scatter
  PRECOMPUTE_JTJ / J_THEN_JTJ -> dense J^T J on the MXU when the unknown
                   count is small (reference dense path gauss_newton.t:
                   554-625, use_dense_where_possible), else falls back to
                   PRECOMPUTE_J blocks
  APPLY_SEPARATELY -> J.p materialized then J^T applied (two-step)
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..lower import LoweredGroup, lower_pointwise
from ..spec import JTJpSchedule


# ---------------------------------------------------------------------------
# pytree helpers (unknown "super-vector": a dict name -> [*dims, C];
# the analog of the reference's contiguous unknown allocation,
# thallo.t:1102-1129 — XLA needs no physical contiguity)
# ---------------------------------------------------------------------------
def tree_zeros_like(t):
    return jax.tree_util.tree_map(jnp.zeros_like, t)


def tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def tree_sub(a, b):
    return jax.tree_util.tree_map(jnp.subtract, a, b)


def tree_scale(a, s):
    return jax.tree_util.tree_map(lambda x: x * s, a)


def tree_axpy(alpha, x, y):
    return jax.tree_util.tree_map(lambda xv, yv: yv + alpha * xv, x, y)


def tree_mul(a, b):
    return jax.tree_util.tree_map(jnp.multiply, a, b)


def tree_dot(a, b):
    parts = jax.tree_util.tree_map(lambda x, y: jnp.vdot(x, y), a, b)
    return jax.tree_util.tree_reduce(jnp.add, parts)


def _cm_small_inv(M, C):
    """Inverse of NxCxC SPD blocks stored channel-major [C*C, N], C<=3,
    via the adjugate formula — pure elementwise on [*, N] rows (a padded
    batched LU on [N, 3, 3] costs ~100x its logical bytes, PERF.md)."""
    m = [M[i] for i in range(C * C)]
    if C == 1:
        return (1.0 / m[0])[None, :]
    if C == 2:
        a, b, c, d = m
        det = a * d - b * c
        inv = 1.0 / det
        return jnp.stack([d * inv, -b * inv, -c * inv, a * inv])
    a, b, c, d, e, f, g, h, i = m
    A = e * i - f * h
    B = -(d * i - f * g)
    Cc = d * h - e * g
    D = -(b * i - c * h)
    E = a * i - c * g
    F = -(a * h - b * g)
    G = b * f - c * e
    H = -(a * f - c * d)
    I = a * e - b * d
    det = a * A + b * B + c * Cc
    inv = 1.0 / det
    # adjugate transpose: inv[r, c] = cofactor[c, r] / det
    return jnp.stack([A, D, G, B, E, H, Cc, F, I]) * inv


def tree_where(c, a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.where(c, x, y), a, b)


# ---------------------------------------------------------------------------
# solver parameters (reference defaults gauss_newton.t:41-55)
# ---------------------------------------------------------------------------
SOLVER_PARAMETER_DEFAULTS = {
    "residual_reset_period": 10,
    "min_relative_decrease": 1e-3,
    "min_trust_region_radius": 1e-32,
    "max_trust_region_radius": 1e16,
    "q_tolerance": 1e-4,
    "function_tolerance": 1e-6,
    "trust_region_radius": 1e4,
    "radius_decrease_factor": 2.0,
    "min_lm_diagonal": 1e-6,
    "max_lm_diagonal": 1e32,
    "max_solver_time_in_seconds": 0.0,
    "nIterations": 10,
    "lIterations": 10,
}


class SolverParams(NamedTuple):
    """Device-side solver parameters; changing them does NOT recompile
    (all enter the jitted step as traced scalars)."""

    residual_reset_period: jnp.ndarray
    min_relative_decrease: jnp.ndarray
    min_trust_region_radius: jnp.ndarray
    max_trust_region_radius: jnp.ndarray
    q_tolerance: jnp.ndarray
    function_tolerance: jnp.ndarray
    min_lm_diagonal: jnp.ndarray
    max_lm_diagonal: jnp.ndarray
    lIterations: jnp.ndarray

    @staticmethod
    def from_dict(d, dtype):
        return SolverParams(
            residual_reset_period=jnp.asarray(d["residual_reset_period"], jnp.int32),
            min_relative_decrease=jnp.asarray(d["min_relative_decrease"], dtype),
            min_trust_region_radius=jnp.asarray(d["min_trust_region_radius"], dtype),
            max_trust_region_radius=jnp.asarray(d["max_trust_region_radius"], dtype),
            q_tolerance=jnp.asarray(d["q_tolerance"], dtype),
            function_tolerance=jnp.asarray(d["function_tolerance"], dtype),
            min_lm_diagonal=jnp.asarray(d["min_lm_diagonal"], dtype),
            max_lm_diagonal=jnp.asarray(d["max_lm_diagonal"], dtype),
            lIterations=jnp.asarray(d["lIterations"], jnp.int32),
        )


class LMState(NamedTuple):
    """Per-solve mutable scalar state (device side)."""

    trust_region_radius: jnp.ndarray
    radius_decrease_factor: jnp.ndarray
    prev_cost: jnp.ndarray
    n_iter: jnp.ndarray
    ssq: Any  # saved diag(J^T J) at iter 0 (JacobiScaling ONCE_PER_SOLVE)
    finished: jnp.ndarray


@dataclasses.dataclass
class GroupPlan:
    name: str
    group: LoweredGroup
    schedule: JTJpSchedule
    # force-inlined twin for jacrev-based paths when the group contains
    # materialized computed arrays (whose chain rule the per-point
    # jacobian doesn't see; the reference solves this with explicit
    # gradient images, thallo.t:1777-1822)
    inline_group: LoweredGroup = None
    # user's set_sparse(True) hint: force the block-sparse JtJ tables
    # regardless of the dense-size threshold (reference thallo.t:5761-5772)
    force_sparse: bool = False

    def jac_group(self):
        return self.inline_group or self.group


# ---------------------------------------------------------------------------
# the compiled solver
# ---------------------------------------------------------------------------
class CompiledSolver:
    """Holds lowered groups + jitted step/cost functions for one problem at
    fixed dim sizes (the analog of the reference's compiled Plan,
    gauss_newton.t:1963-2071)."""

    def __init__(self, spec, groups: List[GroupPlan], uses_lambda: bool, dtype,
                 options=None):
        options = options or {}
        self.spec = spec
        self.groups = groups
        self.uses_lambda = uses_lambda
        self.dtype = dtype
        self.use_preconditioner = spec.use_preconditioner
        # initialization-parameter analogs (reference
        # initialization_parameters, gauss_newton.t:36-39)
        self.guarded_invert_type = options.get("guarded_invert_type", "CERES")
        self.jacobi_scaling = options.get("jacobi_scaling", "ONCE_PER_SOLVE")
        # direct dense solve of the normal equations instead of PCG
        # (reference enable_direct_solve / cublasDirectSolve,
        # gauss_newton.t:22,1280-1328)
        self.direct_solve = bool(options.get("linear_solver", "pcg") == "direct")
        # Schur-complement reduced solve (BEYOND the reference; the
        # Ceres ITERATIVE_SCHUR / DENSE_SCHUR ideas): eliminate an
        # unknown image whose J^T J self-coupling is exactly
        # block-diagonal (BA points: each observation touches one point)
        # and solve the reduced keep-system S = A_kk - A_ke A_ee^-1 A_ek,
        # which is smaller and far better conditioned.  Opt in with
        # linear_solver="schur_pcg" (implicit S, PCG) or "schur_dense"
        # (S materialized from the block-sparse pair blocks, exact dense
        # solve — best when the kept system is small, e.g. BA cameras);
        # schur_eliminate names the image(s), default = auto-pick.
        ls = options.get("linear_solver", "pcg")
        self.schur = ls in ("schur_pcg", "schur_dense")
        self.schur_dense = ls == "schur_dense"
        self.schur_dense_max = int(options.get("schur_dense_max", 8192))
        se = options.get("schur_eliminate")
        self.schur_eliminate = list(se) if se else None
        # bf16 block-sparse JtJ storage (dots/preconditioner stay f32):
        # halves the dominant per-PCG-step HBM read for graph energies
        bd = options.get("block_dtype")
        self.block_dtype = jnp.bfloat16 if bd in ("bf16", "bfloat16") else None
        # "jacobi" (reference parity: scalar diag(J^T J)) or
        # "block_jacobi": per-unknown-element CxC block inverses built
        # from the block-sparse diag-pair blocks — BEYOND the reference
        # (Ceres' SCHUR_JACOBI class idea).  Measured on BA 32k obs: same
        # per-step cost, ~5x fewer outer iterations to converge (PERF.md).
        # Default "auto" = block inverses whenever the block-sparse setup
        # provides diag blocks, scalar otherwise (identical answers; the
        # block form reduces to scalar when blocks are diagonal).
        self.precond_kind = options.get("preconditioner", "auto")
        # set by parallel.mesh.shard_plan_inputs: (mesh, unknown-name ->
        # dim partition tuple).  When present, per-unknown accumulators
        # get sharding constraints so XLA reduces partial (edge-sharded)
        # contributions straight to owner shards (reduce-scatter) instead
        # of all-reducing replicated full copies (SURVEY §2.4's
        # psum_scatter commitment).
        self.shard_ctx = None
        self._exclude_fns = {}
        for im in spec.unknowns:
            if im.exclude_expr is not None:
                g, fn = lower_pointwise(
                    [im.exclude_expr], spec, {d.name: d.size for d in spec.dims}, dtype,
                    name=f"exclude_{im.name}",
                )
                self._exclude_fns[im.name] = (g, fn)
        self.cost_jit = jax.jit(self.cost)
        self.step_jit = jax.jit(self.nonlinear_step)
        self._phase_jits = None

    def phase_jits(self):
        """Separately-jitted setup / linear-solve / finish phases for
        invasive timing (timingLevel>=2): each phase gets a real
        wall-clock stat at the cost of extra dispatches (and, for
        LINEARIZE groups, re-linearizing in the linear phase)."""
        if self._phase_jits is None:
            self._phase_jits = (
                jax.jit(self.solve_setup),
                jax.jit(self.linear_solve),
                jax.jit(self.finish_step),
            )
        return self._phase_jits

    def kernel_probe_fns(self):
        """Jitted probes of the solver-facing kernels for the per-kernel
        timing table (timingLevel>=3, Plan.kernel_stats).  The reference
        wraps every kernel launch in CUDA events and aggregates by kernel
        name (util.t:774-790, makeGPUFunctions groups per-group launchers
        under one solver-facing name); under XLA the step compiles to a
        few fused executables, so each logical kernel is probed in
        isolation instead.  Names match the reference's gauss_newton.t
        kernel families."""
        dtype = self.dtype

        def compute_cost(U, inputs, prep):
            return self.cost(U, inputs, prep["consts"])

        def pcg_step1(U, state, inputs, sp, prep):
            # J^T J p + damping + alpha denominator (gauss_newton.t:
            # 1006-1016 PCGStep1)
            apply_jtjp = self.make_jtjp(
                U, inputs, prep["consts"], state["masks"], state["jac_store"],
                prep["twin_consts"])
            p0 = self.precond_apply(state, state["r0"])
            Ap = apply_jtjp(p0)
            if self.uses_lambda:
                Ap = tree_add(Ap, tree_mul(state["CtC"], p0))
            return Ap, tree_dot(p0, Ap)

        def pcg_step2(state):
            # x/r/z updates + beta numerator (PCGStep2); applies the SAME
            # preconditioner the real loop uses (scalar or block-Jacobi)
            alpha = jnp.asarray(0.5, dtype)
            r0 = state["r0"]
            delta = tree_scale(r0, alpha)
            r = tree_axpy(-alpha, r0, r0)
            z = self.precond_apply(state, r)
            return delta, r, z, tree_dot(z, r)

        def pcg_step3(state):
            # p = z + beta p (PCGStep3)
            beta = jnp.asarray(0.25, dtype)
            z = self.precond_apply(state, state["r0"])
            return tree_axpy(beta, state["r0"], z)

        def linear_update(U, state):
            # X += delta (PCGLinearUpdate)
            return tree_axpy(jnp.asarray(1.0, dtype), state["r0"], U)

        return {
            "computeCost": compute_cost,
            "PCGInit1": self.solve_setup,
            "PCGStep1": pcg_step1,
            "PCGStep2": pcg_step2,
            "PCGStep3": pcg_step3,
            "PCGLinearUpdate": linear_update,
        }

    def _constrain_u(self, name, v):
        """Pin a per-unknown-image accumulator to the unknown's mesh
        sharding (no-op without a mesh)."""
        if not self.shard_ctx:
            return v
        mesh, specs = self.shard_ctx[:2]
        spec = specs.get(name)
        if spec is None:
            return v
        from jax.sharding import NamedSharding, PartitionSpec

        parts = tuple(spec) + (None,) * (v.ndim - len(spec))
        return jax.lax.with_sharding_constraint(
            v, NamedSharding(mesh, PartitionSpec(*parts)))

    def _constrain_tree(self, t):
        return {k: self._constrain_u(k, v) for k, v in t.items()}

    def _replicate(self, v):
        """Explicitly all-gather a small operand on the mesh (no-op
        without one): gathers that read it stay shard-local."""
        if not self.shard_ctx:
            return v
        from jax.sharding import NamedSharding, PartitionSpec

        mesh = self.shard_ctx[0]
        return jax.lax.with_sharding_constraint(
            v, NamedSharding(mesh, PartitionSpec()))

    def _edge_replicate(self, g):
        """Callback for [R, ...] buffers: pin to the edge sharding FIRST,
        then replicate — the two constraints force one explicit
        all-gather at this point and keep the producer chain sharded
        (without the first pin, XLA propagates the replication upstream
        and replicates the whole jacobian pass, indices included)."""
        if not self.shard_ctx or len(self.shard_ctx) < 3:
            return self._replicate
        mesh, _, dim_axes = self.shard_ctx
        eds = [d.dim.name for d in g.ext_domains]
        ax = dim_axes.get(eds[0]) if len(eds) == 1 else None
        if ax is None:
            return self._replicate
        from jax.sharding import NamedSharding, PartitionSpec

        def rep(v):
            if v.shape[0] % mesh.shape[ax] == 0:
                parts = (ax,) + (None,) * (v.ndim - 1)
                v = jax.lax.with_sharding_constraint(
                    v, NamedSharding(mesh, PartitionSpec(*parts)))
            return jax.lax.with_sharding_constraint(
                v, NamedSharding(mesh, PartitionSpec()))

        return rep

    # -- masks -------------------------------------------------------------
    def _eval_mask(self, im, inputs, U):
        g, fn = self._exclude_fns[im.name]
        shape = tuple(d.size for d in im.dims) + (1,)
        v = fn(inputs, U)  # [*ext_shape(in discovered order), rc]
        # map the pointwise group's discovered external-domain
        # order onto the unknown's declared dim order (an exclude
        # whose domains appear in a different order would
        # otherwise silently transpose the mask on square grids)
        ext_dims = [d.dim for d in g.ext_domains]
        if len(ext_dims) == len(im.dims) and all(
            any(dd is d for dd in ext_dims) for d in im.dims
        ):
            perm = [
                next(i for i, dd in enumerate(ext_dims) if dd is d)
                for d in im.dims
            ]
            v = jnp.transpose(v, tuple(perm) + (v.ndim - 1,))
        return jnp.where(v.reshape(shape[:-1]) != 0, 0.0, 1.0).astype(self.dtype)

    def masks(self, inputs, U, static=None):
        """Active-mask pytree: 1 where the unknown may move, 0 where
        excluded (reference fmap.exclude, thallo.t:1993-1997 +
        gauss_newton.t unknownwise kernels).  `static` carries masks
        hoisted by prepare() for excludes that reference no unknown —
        the common case (a constant mask image); re-evaluating one every
        step cost as much as the whole jacobian pass at 512^2 (PERF.md)."""
        out = {}
        for im in self.spec.unknowns:
            # stored [*dims] (2-D for grids): a [*dims, 1] mask buffer
            # would pad its trailing dim onto 128 lanes (~134 MB at
            # 512^2) and be re-read at that size every PCG iteration;
            # consumers broadcast a trailing channel axis in-fusion
            if static is not None and im.name in static:
                out[im.name] = static[im.name]
            elif im.name in self._exclude_fns:
                out[im.name] = self._eval_mask(im, inputs, U)
            else:
                out[im.name] = jnp.ones(
                    tuple(d.size for d in im.dims), dtype=self.dtype)
        return out

    # -- residuals / cost ---------------------------------------------------
    def _wants_bsr(self, gp):
        """Whether this group's schedule materializes J^T J as block-sparse
        tables (graph groups above the dense threshold)."""
        from ..schedule import DENSE_JTJ_MAX_UNKNOWNS

        if gp.schedule not in (
            JTJpSchedule.PRECOMPUTE_JTJ, JTJpSchedule.PRECOMPUTE_J_THEN_JTJ
        ):
            return False
        if gp.force_sparse or self.schur:
            # schur_pcg eliminates through the BSR diag-pair blocks, so
            # the sparse tables are required below the dense threshold too
            return True
        _, total = self.unknown_layout()
        return total > DENSE_JTJ_MAX_UNKNOWNS

    def _onehot_exclude(self):
        """Images that must not build in one-hot row mode: schur_dense
        materializes the reduced system through an eliminated image's
        row tables, so an explicitly-eliminated image needs them."""
        if self.schur and self.schur_eliminate:
            return tuple(self.schur_eliminate)
        return ()

    def group_consts(self, inputs):
        return [
            gp.group.prepared_consts(
                inputs, want_bsr=self._wants_bsr(gp) and gp.inline_group is None,
                onehot_exclude=self._onehot_exclude(),
            )
            for gp in self.groups
        ]

    def prepare(self, inputs):
        """Input-only precomputation hoisted out of the jitted step (the
        analog of the reference's plan-time parameter binding,
        util.t:609-643): const-slot gathers, bounds masks, index values —
        for each group and its inline twin."""
        static_masks = {}
        for im in self.spec.unknowns:
            entry = self._exclude_fns.get(im.name)
            if entry is not None and not entry[0].uslots:
                # exclude references no unknown: the mask is a constant
                # of the inputs — evaluate once here, not every step
                static_masks[im.name] = self._eval_mask(im, inputs, {})
        return {
            "consts": self.group_consts(inputs),
            "twin_consts": [
                gp.inline_group.prepared_consts(
                    inputs, want_bsr=self._wants_bsr(gp),
                    onehot_exclude=self._onehot_exclude())
                if gp.inline_group is not None else None
                for gp in self.groups
            ],
            "masks_static": static_masks,
        }

    def cost(self, U, inputs, consts=None):
        """0.5 * sum of squared residuals (reference createcost,
        thallo.t:3939-3948).  Pure graph groups evaluate channel-major
        (minor-axis gathers, lower.residuals_cm); the sum of squares is
        layout-invariant."""
        consts = consts or self.group_consts(inputs)
        total = jnp.asarray(0.0, self.dtype)
        for gp, c in zip(self.groups, consts):
            g = gp.group
            if g.supports_cm:
                r = g.residuals_cm(U, inputs, c)
            else:
                r = g.residuals(U, inputs, c)
            total = total + jnp.sum(r * r)
        return 0.5 * total

    # -- J^T F + diag(J^T J) -------------------------------------------------
    def jtf_and_diag(self, U, inputs, consts, masks, jac_store, twin_consts=None):
        """Returns (minus_jtf, diag, jac_store).  jac_store caches per-point
        Jacobian blocks for groups whose schedule materializes J.

        diag semantics match the reference exactly (createjtfResidualwise
        scatters partial^2 per ACCESS, thallo.t:3895-3902): if two accesses
        of one residual alias the same physical entry at runtime (e.g. a
        graph edge with v0 == v1), diag gets a^2 + b^2 instead of the true
        (a+b)^2.  This only perturbs the Jacobi preconditioner / LM
        damping, never J itself — J^T F, JTJp and dense J handle aliasing
        exactly (they are linear in the scatters)."""
        mjtf = {im.name: jnp.zeros(tuple(d.size for d in im.dims) + (im.channels,), self.dtype)
                for im in self.spec.unknowns}
        diag = {k: jnp.zeros_like(v) for k, v in mjtf.items()}
        for gi, (gp, c) in enumerate(zip(self.groups, consts)):
            g = gp.jac_group()
            if g.con_block is not None:
                # blocked contractions (real `split`): jtf/diag computed
                # through the reduction chain rule with one-block fiber
                # memory (lower.blocked_jtf_diag); J^T J p stays INLINE
                _, jtf_d, d2_d = g.blocked_jtf_diag(U, inputs, c)
                for name, v in jtf_d.items():
                    mjtf[name] = mjtf[name] - v
                for name, v in d2_d.items():
                    diag[name] = diag[name] + v
                continue
            if not g.jac_slots:
                continue
            if gp.inline_group is not None:
                c = (twin_consts[gi] if twin_consts and twin_consts[gi] is not None
                     else g.prepared_consts(
                         inputs, want_bsr=self._wants_bsr(gp),
                         onehot_exclude=self._onehot_exclude()))
            bsr = c.get("bsr") if isinstance(c, dict) else None
            if bsr is not None and self._wants_bsr(gp):
                # scatter-free setup: J^T r, diag and all J^T J blocks
                # assembled through the padded row tables in one pass.
                # Pure graph groups run the whole pipeline channel-major
                # (lower.py gather_slot_cm: minor-axis gathers + [*, R]
                # AD buffers — measured 14 -> ~2 ms at BA 250k obs)
                from .blocksparse import bsr_setup

                # mesh mode: the jacobian pass gathers unknowns at edge
                # endpoints (N-sharded source, R-sharded indices) — XLA
                # lowers that as masked-partial + O(R)-byte all-reduce.
                # One explicit O(N)-byte all-gather of the unknowns makes
                # every edge gather local (outputs stay edge-sharded).
                Ug = ({k: self._replicate(v) for k, v in U.items()}
                      if self.shard_ctx else U)
                if not g.mslots:
                    r, jacs = g.point_jacobians_cm(Ug, inputs, c)
                    jacs = self._mask_jacs_cm(g, jacs, masks, inputs)
                    cm = True
                else:
                    r, jacs = g.point_jacobians(Ug, inputs, c)
                    jacs = self._mask_jacs(g, jacs, masks, inputs)
                    cm = False
                jtr_d, d2_d, blocks = bsr_setup(
                    bsr, r, jacs, self.dtype,
                    block_dtype=self.block_dtype, channel_major=cm,
                    replicate=(self._edge_replicate(g) if self.shard_ctx
                               else None))
                jac_store[str(gi)] = {"bsr": blocks}
                for name, v in jtr_d.items():
                    mjtf[name] = mjtf[name] - v
                for name, v in d2_d.items():
                    diag[name] = diag[name] + v
                continue
            r, jacs = g.point_jacobians(U, inputs, c)
            jacs = self._mask_jacs(g, jacs, masks, inputs)
            if gp.schedule not in (JTJpSchedule.INLINE, JTJpSchedule.LINEARIZE):
                jac_store[str(gi)] = {"r": r, "jacs": tuple(jacs)}
            jslots = g.jac_slots
            for i in range(len(jslots)):
                J = jacs[i]  # [R, rc, *dep, C]
                # J^T r and diag(J^T J) per point, scattered (reference
                # createjtfResidualwise scatters, thallo.t:3895-3902)
                jtr = jnp.einsum("pc...,pc->p...", J, r, precision=jax.lax.Precision.HIGHEST)
                d2 = jnp.sum(J * J, axis=1)
                name = jslots[i].image.name
                mjtf[name] = mjtf[name] - g.scatter_jac_slot(i, jtr, inputs, c)
                diag[name] = diag[name] + g.scatter_jac_slot(i, d2, inputs, c)
        return self._constrain_tree(mjtf), self._constrain_tree(diag), jac_store

    def _mask_jacs(self, g, jacs, masks, inputs):
        out = []
        for i in range(len(g.jac_slots)):
            if g.jac_slots[i].image.name not in self._exclude_fns:
                out.append(jacs[i])  # mask is literal ones: skip the gather
                continue
            m = g.gather_mask(g.jac_slots[i], masks, inputs)  # [R, *dep]
            J = jacs[i]
            shape = (m.shape[0], 1) + m.shape[1:] + (1,)
            out.append(J * m.reshape(shape))
        return out

    def _mask_jacs_cm(self, g, jacsT, masks, inputs):
        out = []
        for i, slot in enumerate(g.uslots):
            if slot.image.name not in self._exclude_fns:
                out.append(jacsT[i])
                continue
            m = g.gather_mask(slot, masks, inputs)  # [R]
            out.append(jacsT[i] * m[None, None, :])
        return out

    # -- J^T J p -------------------------------------------------------------
    def make_jtjp(self, U, inputs, consts, masks, jac_store, twin_consts=None):
        """Build Ap(p) = sum_g J_g^T J_g p for the current linearization
        point, honoring each group's schedule."""
        from ..schedule import DENSE_JTJ_MAX_UNKNOWNS

        inline_groups = []
        linearized = []  # (jvp_fn, vjp_fn) pairs, linearized at U once
        block_groups = []
        bsr_groups = []  # (GroupBsr, assembled blocks): scatter-free matvec
        dense_mats = []  # materialized J^T J (MXU gemm) for small problems
        _, total_unknowns = self.unknown_layout()
        for gi, gp in enumerate(self.groups):
            g = gp.group
            if not (g.uslots or g.mslots):
                continue
            entry = jac_store.get(str(gi))
            if entry is not None and "bsr" in entry:
                c = (twin_consts[gi] if gp.inline_group is not None and twin_consts
                     and twin_consts[gi] is not None else consts[gi])
                bsr_groups.append((c["bsr"], entry["bsr"]))
                continue
            if g.con_block is not None:
                # blocked contraction groups always apply J^T J p inline:
                # jvp+vjp re-run the checkpointed block scan (bounded
                # memory); LINEARIZE/PRECOMPUTE would store or
                # materialize the full fiber
                inline_groups.append((gi, gp))
            elif gp.schedule == JTJpSchedule.INLINE:
                inline_groups.append((gi, gp))
            elif gp.schedule == JTJpSchedule.LINEARIZE:
                c = consts[gi]
                res_fn = lambda X, g=g, c=c: g.residuals(X, inputs, c)  # noqa: E731
                _, jvp_fn = jax.linearize(res_fn, U)
                vjp_fn = jax.linear_transpose(jvp_fn, U)
                linearized.append((jvp_fn, vjp_fn))
            elif (
                gp.schedule in (JTJpSchedule.PRECOMPUTE_JTJ, JTJpSchedule.PRECOMPUTE_J_THEN_JTJ)
                and total_unknowns <= DENSE_JTJ_MAX_UNKNOWNS
            ):
                # true materialized J^T J (reference PCGStep1_materializedJTJ
                # / cublas gemv path, gauss_newton.t:554-625,1216-1278)
                _, Jg = self.dense_jacobian(U, inputs, consts, masks, [gi])
                A = jnp.matmul(Jg.T, Jg, precision=jax.lax.Precision.HIGHEST)
                dense_mats.append(A)
            else:
                block_groups.append((gi, gp))

        def apply_jtjp(p):
            pm = tree_mul(p, self._bmask(masks))
            Ap = tree_zeros_like(p)
            for bsr, blocks in bsr_groups:
                from .blocksparse import bsr_apply

                contrib = bsr_apply(
                    bsr, blocks, pm,
                    replicate=(self._replicate if self.shard_ctx else None))
                for name, v in contrib.items():
                    Ap[name] = Ap[name] + v
            if dense_mats:
                pflat = self.flatten_U(pm)
                acc = None
                for A in dense_mats:
                    v = jnp.matmul(A, pflat, precision=jax.lax.Precision.HIGHEST)
                    acc = v if acc is None else acc + v
                Ap = tree_add(Ap, self.unflatten_U(acc))
            for jvp_fn, vjp_fn in linearized:
                Jp = jvp_fn(pm)
                (contrib,) = vjp_fn(Jp)
                for name in Ap:
                    if name in contrib:
                        Ap[name] = Ap[name] + contrib[name]
            for gi, gp in inline_groups:
                g = gp.group
                c = consts[gi]
                res_fn = lambda X: g.residuals(X, inputs, c)  # noqa: E731
                _, Jp = jax.jvp(res_fn, (U,), (pm,))
                _, vjp_fn = jax.vjp(res_fn, U)
                (contrib,) = vjp_fn(Jp)
                for name in Ap:
                    if name in contrib:
                        Ap[name] = Ap[name] + contrib[name]
            for gi, gp in block_groups:
                g = gp.jac_group()
                gc = (twin_consts[gi] if gp.inline_group is not None and twin_consts
                      and twin_consts[gi] is not None else consts[gi])
                jacs = jac_store[str(gi)]["jacs"]
                # Jp[p, c] = sum_slots <J_slot, p_slot>
                Jp = None
                nj = len(g.jac_slots)
                pvals = [g.gather_jac_slot(i, pm, inputs, gc) for i in range(nj)]
                for i in range(nj):
                    term = jnp.einsum("pc...,p...->pc", jacs[i], pvals[i], precision=jax.lax.Precision.HIGHEST)
                    Jp = term if Jp is None else Jp + term
                if gp.schedule == JTJpSchedule.APPLY_SEPARATELY:
                    # the reference's two-kernel split (createapplyjResidualwise
                    # then createapplyjtResidualwise via a residual-indexed Jp
                    # array, thallo.t:3754-3841): Jp is MATERIALIZED between
                    # the J and J^T passes.  The barrier keeps XLA from fusing
                    # across it — a real execution-strategy difference, not an
                    # enum alias (on TPU fusion usually wins; measured in
                    # PERF.md's schedule table).
                    Jp = jax.lax.optimization_barrier(Jp)
                for i in range(len(g.uslots)):
                    contrib = jnp.einsum("pc...,pc->p...", jacs[i], Jp, precision=jax.lax.Precision.HIGHEST)
                    name = g.uslots[i].image.name
                    Ap[name] = Ap[name] + g.scatter_slot(i, contrib, inputs, gc)
            return self._constrain_tree(tree_mul(Ap, self._bmask(masks)))

        return apply_jtjp

    def _bmask(self, masks):
        # trailing channel axis, fused into the consuming multiply
        return {k: v[..., None] for k, v in masks.items()}

    # -- dense Jacobian assembly (reference generateDumpJ + dense JTJ,
    # gauss_newton.t:325-488, 498-625) --------------------------------------
    def unknown_layout(self):
        """(offsets dict, total): each unknown image's slice in the
        flattened super-vector (analog of the contiguous unknown
        allocation, thallo.t:1102-1129)."""
        offsets = {}
        total = 0
        for im in self.spec.unknowns:
            n = int(np.prod([d.size for d in im.dims])) * im.channels
            offsets[im.name] = total
            total += n
        return offsets, total

    def flatten_U(self, t):
        return jnp.concatenate([t[im.name].reshape(-1) for im in self.spec.unknowns])

    def unflatten_U(self, v):
        out = {}
        o = 0
        for im in self.spec.unknowns:
            shape = tuple(d.size for d in im.dims) + (im.channels,)
            n = int(np.prod(shape))
            out[im.name] = v[o:o + n].reshape(shape)
            o += n
        return out

    def dense_jacobian(self, U, inputs, consts, masks, group_indices=None):
        """Materialize J as a dense [n_residual_values, n_unknowns] matrix
        (small problems / direct solve / JTJ-on-MXU).  Returns (r_all, J)."""
        offsets, total = self.unknown_layout()
        rows = []
        jmats = []
        sel = range(len(self.groups)) if group_indices is None else group_indices
        for gi in sel:
            gp, c = self.groups[gi], consts[gi]
            g = gp.jac_group()
            c = g.prepared_consts(inputs) if gp.inline_group is not None else c
            r, jacs = g.point_jacobians(U, inputs, c)
            jacs = self._mask_jacs(g, jacs, masks, inputs)
            nrows = g.R * g.rc
            Jg = jnp.zeros((nrows, total), self.dtype)
            row_ids = jnp.arange(g.R * g.rc, dtype=jnp.int32).reshape(g.R, g.rc)
            jslots = g.jac_slots
            for i in range(len(jslots)):
                slot = jslots[i]
                im = slot.image
                C = im.channels
                flat = g.jac_slot_flat_indices(i, inputs)  # [R, *dep]
                cols = offsets[im.name] + flat[..., None] * C + jnp.arange(C)  # [R,*dep,C]
                J = jacs[i]  # [R, rc, *dep, C]
                rr = jnp.broadcast_to(
                    row_ids.reshape((g.R, g.rc) + (1,) * (J.ndim - 2)), J.shape
                ).reshape(-1)
                cc = jnp.broadcast_to(cols[:, None], J.shape).reshape(-1)
                Jg = Jg.at[rr, cc].add(J.reshape(-1))
            rows.append(r.reshape(-1))
            jmats.append(Jg)
        return jnp.concatenate(rows), jnp.concatenate(jmats, axis=0)

    def coo_jacobian(self, U, inputs, consts, masks):
        """Materialize J in COO form (rows, cols, vals) + residual vector —
        the analog of the reference's CSR J dump for cuSPARSE
        (generateDumpJ, gauss_newton.t:325-488), for users doing external
        linear algebra.  Rows are globally numbered across groups; cols
        index the flattened unknown super-vector."""
        offsets, total = self.unknown_layout()
        rows_l, cols_l, vals_l, res_l = [], [], [], []
        row_base = 0
        for gi, gp in enumerate(self.groups):
            g = gp.jac_group()
            c = consts[gi] if gp.inline_group is None else g.prepared_consts(inputs)
            r, jacs = g.point_jacobians(U, inputs, c)
            jacs = self._mask_jacs(g, jacs, masks, inputs)
            row_ids = row_base + jnp.arange(g.R * g.rc, dtype=jnp.int32).reshape(g.R, g.rc)
            jslots = g.jac_slots
            for i in range(len(jslots)):
                slot = jslots[i]
                im = slot.image
                C = im.channels
                flat = g.jac_slot_flat_indices(i, inputs)
                cols = offsets[im.name] + flat[..., None] * C + jnp.arange(C)
                J = jacs[i]
                rr = jnp.broadcast_to(
                    row_ids.reshape((g.R, g.rc) + (1,) * (J.ndim - 2)), J.shape
                ).reshape(-1)
                cc = jnp.broadcast_to(cols[:, None], J.shape).reshape(-1)
                rows_l.append(rr)
                cols_l.append(cc)
                vals_l.append(J.reshape(-1))
            res_l.append(r.reshape(-1))
            row_base += g.R * g.rc
        return (
            jnp.concatenate(res_l),
            jnp.concatenate(rows_l),
            jnp.concatenate(cols_l),
            jnp.concatenate(vals_l),
            (row_base, total),
        )

    def model_cost(self, U, inputs, consts, delta):
        """0.5 |r + J delta|^2 (reference createmodelcostResidualwise,
        thallo.t:3845-3865)."""
        total = jnp.asarray(0.0, self.dtype)
        for gp, c in zip(self.groups, consts):
            g = gp.group
            res_fn = lambda X: g.residuals(X, inputs, c)  # noqa: E731
            r, Jd = jax.jvp(res_fn, (U,), (delta,))
            m = r + Jd
            total = total + jnp.sum(m * m)
        return 0.5 * total

    # -- guarded invert (reference gauss_newton.t:638-667) -----------------
    def guarded_invert(self, t):
        kind = getattr(self, "guarded_invert_type", "CERES")
        if kind == "MODIFIED_CERES":
            f = lambda p: 1.0 / (1.0 + p)  # noqa: E731
        elif kind == "EPSILON_ADD":
            eps = jnp.finfo(self.dtype).eps
            f = lambda p: 1.0 / (eps + p)  # noqa: E731
        else:  # CERES (default)
            f = lambda p: 1.0 / jnp.square(1.0 + jnp.sqrt(p))  # noqa: E731
        return jax.tree_util.tree_map(f, t)

    # -- the nonlinear step --------------------------------------------------
    # Split into the reference's named phases (util.t:537-541): "Nonlinear
    # Setup" (solve_setup) / "Linear Solve" (linear_solve) / "Nonlinear
    # Finish" (finish_step).  nonlinear_step composes them into ONE jit
    # for the fast path; plan.step() jits them separately at
    # timingLevel>=2 so each phase gets a real wall-clock stat (the
    # reference's invasive timing mode, Thallo.h:19-25).
    def solve_setup(self, U, lm: LMState, inputs, sp: SolverParams, prep=None):
        """Phase 1: r0 = -J^T F, diag(J^T J), preconditioner, LM damping
        (+ materialized J blocks / block-sparse J^T J assembly)."""
        dtype = self.dtype
        prep = prep if prep is not None else self.prepare(inputs)
        consts = prep["consts"]
        twin_consts = prep["twin_consts"]
        masks = self.masks(inputs, U, prep.get("masks_static"))
        jac_store = {}

        mjtf, rawdiag, jac_store = self.jtf_and_diag(
            U, inputs, consts, masks, jac_store, twin_consts)
        r0 = mjtf
        if self.uses_lambda:
            # PCGSaveSSq at iter 0 (JacobiScaling ONCE_PER_SOLVE,
            # gauss_newton.t:925-930); keep previous ssq otherwise.
            # jacobi_scaling: "ONCE_PER_SOLVE" (default) | "EVERY_ITERATION"
            # | "NONE" (reference JacobiScalingType, gauss_newton.t:32-38)
            scaling = getattr(self, "jacobi_scaling", "ONCE_PER_SOLVE")
            first = lm.n_iter == 0
            ssq = tree_where(first, rawdiag, lm.ssq)
            radius = lm.trust_region_radius
            # PCGComputeCtC (thallo.t:3911-3941): unclamped = diag/radius
            unclamped = tree_scale(rawdiag, 1.0 / radius)
            # PCGFinalizeDiagonal (gauss_newton.t:932-971)
            def fin(unc, s):
                if scaling == "NONE":
                    inv_ssq = 1.0
                else:
                    inv_ssq = 1.0 / jnp.maximum(s, jnp.asarray(1e-30, dtype))
                mult = inv_ssq / radius
                ctc = jnp.clip(unc, sp.min_lm_diagonal * mult, sp.max_lm_diagonal * mult)
                return ctc

            scale_src = rawdiag if scaling == "EVERY_ITERATION" else ssq
            CtC = jax.tree_util.tree_map(fin, unclamped, scale_src)
            pre = jax.tree_util.tree_map(
                lambda ctc, unc: 1.0 / (ctc + radius * unc), CtC, unclamped
            )
        else:
            ssq = lm.ssq
            CtC = tree_zeros_like(rawdiag)
            pre = self.guarded_invert(rawdiag)
        if not self.use_preconditioner:
            pre = jax.tree_util.tree_map(jnp.ones_like, pre)
        pre_block = {}
        if self.precond_kind in ("auto", "block_jacobi") and self.use_preconditioner:
            pre_block = self._block_preconditioner(
                consts, jac_store, rawdiag, CtC, lm)
        return {
            "masks": masks,
            "jac_store": jac_store,
            "r0": r0,
            "pre": pre,
            "pre_block": pre_block,
            "CtC": CtC,
            "ssq": ssq,
            "rawdiag": rawdiag,
        }

    # -- block-Jacobi preconditioner (beyond the reference) -----------------
    def _block_preconditioner(self, consts, jac_store, rawdiag, CtC, lm):
        """Per-unknown-element CxC block inverses of the block diagonal of
        the damped J^T J.  The block part comes free from the block-sparse
        setup's pre-aggregated diag-pair blocks ([C*C, N] channel-major,
        bsr_setup); contributions from groups outside the BSR path stay on
        the diagonal (rawdiag minus the blocks' own diagonal), so M always
        matches scalar Jacobi when the blocks vanish.  Damping mirrors the
        scalar path exactly: LM adds diag(CtC); GN applies the CERES
        guarded transform d -> (1+sqrt(d))^2 to the diagonal entries."""
        B = self._diag_pair_blocks(consts, jac_store)
        return self._invert_damped_blocks(B, rawdiag, CtC, guard_gn=True)

    def _diag_pair_blocks(self, consts, jac_store, names=None):
        """Sum the block-sparse setup's pre-aggregated diag-pair blocks
        per unknown image: the exact block diagonal of the BSR groups'
        J^T J, channel-major [C*C, N]."""
        B = {}
        for gi, gp in enumerate(self.groups):
            entry = jac_store.get(str(gi))
            if not entry or "bsr" not in entry:
                continue
            c = consts[gi]
            bsr = c.get("bsr") if isinstance(c, dict) else None
            if bsr is None:
                continue
            for p_idx, pr in enumerate(bsr.pairs):
                if pr[2] != "diag":
                    continue
                i, j = pr[0], pr[1]
                name = bsr.slot_images[i]
                if bsr.slot_images[j] != name:
                    continue  # cross-image aliasing: off the block diagonal
                if names is not None and name not in names:
                    continue
                blk = entry["bsr"][p_idx].astype(self.dtype)  # [Ci*Cj, N]
                B[name] = B.get(name, 0) + blk
        return B

    def _invert_damped_blocks(self, B, rawdiag, CtC, guard_gn):
        """Invert per-element CxC blocks after damping their diagonals:
        LM adds diag(CtC) (exact damped blocks — also what the Schur
        elimination needs); GN either applies the CERES guarded transform
        (guard_gn=True: preconditioning) or inverts plainly (guard_gn=
        False: exact elimination, blocks must be nonsingular)."""
        dtype = self.dtype
        out = {}
        for name, blk in B.items():
            C = int(round(blk.shape[0] ** 0.5))
            N = blk.shape[1]
            diag_ix = jnp.arange(C) * C + jnp.arange(C)
            bdiag = blk[diag_ix]  # [C, N]
            raw = rawdiag[name].reshape(N, C).T.astype(dtype)  # [C, N]
            extra = jnp.maximum(raw - bdiag, 0.0)  # non-BSR groups' diag
            if self.uses_lambda:
                damp = CtC[name].reshape(N, C).T.astype(dtype)
                new_diag = bdiag + extra + damp
            elif guard_gn:
                d = bdiag + extra
                new_diag = jnp.square(1.0 + jnp.sqrt(jnp.maximum(d, 0.0)))
            else:
                new_diag = bdiag + extra
            M = blk.at[diag_ix].set(new_diag)  # [C*C, N]
            # Jacobi equilibration: untouched elements carry the huge
            # min_lm_diagonal*inv_ssq damping (~1e24); their adjugate
            # determinant overflows f32 to inf and the inverse goes NaN.
            # Normalizing to unit diagonal keeps every determinant O(1):
            # M = D M' D with D = sqrt(diag), so M^-1 = D^-1 M'^-1 D^-1.
            d = jnp.sqrt(jnp.maximum(new_diag, 1e-30))  # [C, N]
            dd = (d[:, None, :] * d[None, :, :]).reshape(C * C, N)
            Mn = M / dd
            if C <= 3:
                # closed-form adjugate inverse on the channel-major rows:
                # pure [*, N] elementwise, no (8,128)-padded batched LU
                inv_n = _cm_small_inv(Mn, C)
            else:
                Minv = jnp.linalg.inv(
                    jnp.transpose(Mn.reshape(C, C, N), (2, 0, 1))
                )  # [N, C, C] batched; once per nonlinear iteration
                inv_n = jnp.transpose(Minv, (1, 2, 0)).reshape(C * C, N)
            out[name] = inv_n / dd
        return out

    @staticmethod
    def _block_apply(pb, v):
        """y = B v per element: pb [C*C, N] channel-major block rows,
        v image-shaped [..., C]."""
        C = v.shape[-1]
        rT = v.reshape(-1, C).T  # [C, N]
        zT = jnp.sum(pb.reshape(C, C, -1) * rT[None, :, :], axis=1)
        return zT.T.reshape(v.shape)

    def precond_apply(self, state, r):
        """z = M^-1 r: elementwise for scalar Jacobi, a batched channel-
        major block matvec for block-Jacobi unknowns."""
        pre_block = state.get("pre_block") or {}
        if not pre_block:
            return tree_mul(state["pre"], r)
        out = {}
        for k, v in r.items():
            pb = pre_block.get(k)
            out[k] = state["pre"][k] * v if pb is None else self._block_apply(pb, v)
        return out

    def _q_noise_floor(self, jac_store) -> float:
        """Per-iteration relative noise the J^T J p routing injects into
        the Q recurrence: 2^-8 when any block-sparse group routes its
        per-step one-hot dots at bf16 (the explicit approximate-routing
        contract, blocksparse._routing_dtype — also the fused pallas
        pair kernel's operand dtype), 0 otherwise (exact matvec: the
        reference's zeta semantics apply unmodified)."""
        from .blocksparse import _routing_dtype

        has_bsr = any("bsr" in (e or {}) for e in jac_store.values())
        if has_bsr and _routing_dtype(np.dtype(self.dtype)) == jnp.bfloat16:
            return 2.0 ** -8
        return 0.0

    # -- Schur-complement reduced solve (beyond the reference) ---------------
    def _schur_partition(self, consts, jac_store):
        """(keep, elim) unknown-image names for linear_solver="schur_pcg",
        validated at trace time: an eliminated image's J^T J self-coupling
        must be EXACTLY block-diagonal — every group referencing it runs
        the block-sparse path with all its self-pairs 'diag' (BA points:
        each observation touches one point) — and eliminated images must
        not couple to each other.  schur_eliminate overrides the default
        pick (the eligible image with the most elements)."""
        elements = {im.name: int(np.prod([d.size for d in im.dims]))
                    for im in self.spec.unknowns}
        touched_non_bsr = set()
        self_offdiag = set()
        cross = {}
        has_diag_blocks = set()
        for gi, gp in enumerate(self.groups):
            g = gp.jac_group()
            if not g.jac_slots:
                continue
            entry = jac_store.get(str(gi))
            c = consts[gi]
            bsr = c.get("bsr") if isinstance(c, dict) else None
            if entry is not None and "bsr" in entry and bsr is not None:
                for pr in bsr.pairs:
                    a, b = bsr.slot_images[pr[0]], bsr.slot_images[pr[1]]
                    if a == b:
                        if pr[2] == "diag":
                            has_diag_blocks.add(a)
                        else:
                            self_offdiag.add(a)
                    else:
                        cross.setdefault(a, set()).add(b)
            else:
                touched_non_bsr.update(s.image.name for s in g.jac_slots)
        onehot_imgs = set()
        for gi, gp in enumerate(self.groups):
            c = consts[gi]
            bsr = c.get("bsr") if isinstance(c, dict) else None
            if bsr is not None:
                for i, x in enumerate(bsr.oh_idxs):
                    if x is not None:
                        onehot_imgs.add(bsr.slot_images[i])
        eligible = [n for n in elements
                    if n in has_diag_blocks
                    and n not in self_offdiag and n not in touched_non_bsr
                    # schur_dense assembles couplings through the
                    # eliminated image's ROW TABLES; one-hot-mode images
                    # have none (explicit schur_eliminate disables
                    # one-hot mode at build instead)
                    and not (self.schur_dense and n in onehot_imgs)]
        if self.schur_eliminate is not None:
            elim = list(self.schur_eliminate)
            bad = [n for n in elim if n not in eligible]
            if bad:
                raise ValueError(
                    f"schur_eliminate images {bad} are not block-diagonal-"
                    f"eliminable (eligible: {eligible}); each must be "
                    "referenced only by block-sparse groups with purely "
                    "diagonal self-coupling")
        else:
            if not eligible:
                raise ValueError(
                    "linear_solver='schur_pcg' found no eliminable unknown "
                    "image (needs a graph unknown whose J^T J self-coupling "
                    "is block-diagonal, e.g. BA points)")
            elim = [max(eligible, key=lambda n: elements[n])]
        for a in elim:
            coupled = cross.get(a, set()) & set(elim)
            if coupled:
                raise ValueError(
                    f"schur_eliminate images couple to each other: {a} <-> "
                    f"{sorted(coupled)}; the eliminated block must stay "
                    "block-diagonal")
        keep = [n for n in elements if n not in elim]
        if not keep:
            raise ValueError("schur_pcg must keep at least one unknown image")
        return keep, elim

    def _schur_dense_solve(self, state, consts, keep, elim, Einv, b):
        """Materialized Schur complement (the Ceres DENSE_SCHUR class;
        the reference has no analog): assemble the reduced keep-system
        S = A_kk - A_ke A_ee^-1 A_ek densely from the block-sparse pair
        blocks already materialized this iteration, then solve exactly.
        One exact reduced solve per outer iteration — no inner-iteration
        tuning — at a cost that only pays off while the kept system is
        small (BA: cameras; gated by schur_dense_max total keep DOF).

        Assembly: the correction term groups observations by eliminated
        element through the elim image's BSR row tables — for each pair
        (u, v) of keep couplings of elim element p, the block
        -B_u^T G_p B_v accumulates at keep-element pair
        (cols_u[d_u, p], cols_v[d_v, p]) via one segment_sum."""
        dtype = self.dtype
        jac_store = state["jac_store"]
        elements = {im.name: (int(np.prod([d.size for d in im.dims])),
                              im.channels) for im in self.spec.unknowns}
        offs, K = {}, 0
        for n in keep:
            offs[n] = K
            Nn, Cn = elements[n]
            K += Nn * Cn
        if K > self.schur_dense_max:
            raise ValueError(
                f"linear_solver='schur_dense': kept system has {K} DOF > "
                f"schur_dense_max={self.schur_dense_max}; use schur_pcg "
                "or raise the plan option schur_dense_max")

        kk_diag = {}        # keep image -> [C*C, N] block diagonal
        kk_cross = []       # (a, b, vals [M,Ca,Cb], ia [M], ib [M])
        couplings = {e: [] for e in elim}  # elim -> [(B, cols, keep_img)]
        for gi, gp in enumerate(self.groups):
            g = gp.jac_group()
            if not g.jac_slots:
                continue
            entry = jac_store.get(str(gi))
            c = consts[gi]
            bsr = c.get("bsr") if isinstance(c, dict) else None
            if bsr is None or entry is None or "bsr" not in entry:
                raise ValueError(
                    "linear_solver='schur_dense' requires every residual "
                    f"group on the block-sparse path; group {gp.name} is "
                    "not (schedule it with JtJ.set_sparse(True))")
            blocks = entry["bsr"]
            from .blocksparse import BsrBlocks, cross_block_4d
            fused = (blocks.fused_map()
                     if isinstance(blocks, BsrBlocks) else {})
            for p_idx, pr in enumerate(bsr.pairs):
                i, j = pr[0], pr[1]
                a, b2 = bsr.slot_images[i], bsr.slot_images[j]
                Ca, Cb = bsr.slot_channels[i], bsr.slot_channels[j]
                Na = elements[a][0]
                if pr[2] == "transpose":
                    # one-hot row mode: values live in the partner's
                    # blocks (B_ij = B_ji^T), organized by the PARTNER's
                    # row table; masked lanes carry zero blocks
                    if a in elim:
                        raise ValueError(
                            f"schur_dense cannot eliminate {a!r}: it runs "
                            "in one-hot row mode (small image); set "
                            "THALLO_ONEHOT_ROWS=0 or eliminate the large "
                            "image instead")
                    if b2 in elim:
                        continue  # the partner pair carries this coupling
                    partner = bsr.pairs[pr[3]]
                    ct = bsr.col_gathers[partner[3]][0]
                    t = bsr.col_row[ct]
                    blkT = blocks[pr[3]].astype(dtype)
                    W, Nt = bsr.cols[ct].shape
                    BT = cross_block_4d(bsr, fused, pr[3], blkT,
                                        Cb, Ca, W, Nt)
                    sel = bsr.row_sels[t]
                    rows_b = sel if sel is not None else jnp.arange(Nt)
                    ia = jnp.broadcast_to(bsr.cols[ct], (W, Nt)).reshape(-1)
                    ib = jnp.broadcast_to(rows_b[None, :], (W, Nt)).reshape(-1)
                    vals = jnp.transpose(BT, (2, 3, 1, 0)).reshape(
                        W * Nt, Ca, Cb)
                    kk_cross.append((a, b2, vals, ia, ib))
                    continue
                blk = blocks[p_idx].astype(dtype)
                if pr[2] == "diag":
                    cols = None
                    sel = None
                    B = blk.reshape(Ca, Cb, 1, Na)
                else:
                    ct = bsr.col_gathers[pr[3]][0]
                    cols = bsr.cols[ct]  # [W, N_t]
                    sel = bsr.row_sels[bsr.col_row[ct]]
                    B = cross_block_4d(bsr, fused, p_idx, blk, Ca, Cb,
                                       cols.shape[0], cols.shape[1])
                if a in elim:
                    if b2 in keep:
                        # PER-LEVEL coupling (B on its level's own lanes;
                        # sel = covered element ids or None for full
                        # coverage).  The r4 code expanded overflow
                        # levels back to full element order here, which
                        # costs O(W * Ne) memory — 19 GB at skew-1M's
                        # W=716 tail — and made the downstream cross
                        # products O(W^2 * Ne); pairs now align on the
                        # smaller level's lanes instead (see the
                        # correction loop).
                        cu = (cols if cols is not None
                              else jnp.arange(Na)[None, :])
                        couplings[a].append((B, cu, b2, sel))
                    continue  # elim-elim is the (damped, inverted) Einv
                if b2 in elim:
                    continue  # transpose of an elim-keep pair
                if a == b2 and pr[2] == "diag":
                    kk_diag[a] = kk_diag.get(a, 0) + blk
                else:
                    W, Nt = B.shape[2], B.shape[3]
                    rows_a = sel if sel is not None else jnp.arange(Nt)
                    ia = jnp.broadcast_to(
                        rows_a[None, :], (W, Nt)).reshape(-1)
                    ib = (cols.reshape(-1) if cols is not None
                          else rows_a)
                    vals = jnp.transpose(B, (2, 3, 0, 1)).reshape(
                        W * Nt, Ca, Cb)
                    kk_cross.append((a, b2, vals, ia, ib))

        S = jnp.zeros((K, K), dtype)

        def add_blocks(S, a, bname, vals, ia, ib):
            """vals [M, Ca, Cb] accumulated at element-pair (ia, ib)."""
            Na, Ca = elements[a]
            Nb, Cb = elements[bname]
            seg = jax.ops.segment_sum(
                vals.reshape(vals.shape[0], Ca * Cb),
                ia * Nb + ib, num_segments=Na * Nb)
            blockmat = jnp.transpose(
                seg.reshape(Na, Nb, Ca, Cb), (0, 2, 1, 3))
            return S.at[offs[a]:offs[a] + Na * Ca,
                        offs[bname]:offs[bname] + Nb * Cb].add(
                blockmat.reshape(Na * Ca, Nb * Cb))

        # keep-keep off-diagonal couplings
        for (a, bname, vals, ia, ib) in kk_cross:
            S = add_blocks(S, a, bname, vals, ia, ib)

        # the Schur correction: -A_ke A_ee^-1 A_ek per eliminated image.
        # Each (u, v) coupling pair aligns on the SMALLER level's element
        # lanes (levels of one row table are nested by construction;
        # cross-base pairs intersect-with-mask: an element outside either
        # level has no observations in its rank range, so masked lanes
        # are exactly the empty products) and scans over u's degree axis
        # so the largest live intermediate is [Cku, Ckv, Dv, Nc] — the
        # r4 form materialized [Cku, Du, Ckv, Dv, Ne], which is O(W^2)
        # in table width and OOMed on skewed scenes (70 GB at W=375).
        for e in elim:
            cps = couplings[e]
            if not cps:
                continue
            Ne, Ce = elements[e]
            G3 = Einv[e].reshape(Ce, Ce, Ne)
            GB = []
            for (B, _c, _k, sel) in cps:
                Gl = G3 if sel is None else G3[:, :, sel]
                GB.append(jnp.sum(Gl[:, :, None, None, :] * B[None],
                                  axis=1))  # [Ce, Ck, D, N_t]
            for u, (Bu, colsu, ku, selu) in enumerate(cps):
                for v, (_Bv, colsv, kv, selv) in enumerate(cps):
                    GBv = GB[v]
                    Nu = Bu.shape[3]
                    Nv = GBv.shape[3]
                    # align both sides on the smaller lane set
                    if selu is None and selv is None:
                        Bu_c, cu_c = Bu, colsu
                        GBv_c, cv_c = GBv, colsv
                        valid = None
                    else:
                        u_fine = (selv is None
                                  or (selu is not None and Nu <= Nv))
                        fine_sel = selu if u_fine else selv
                        coarse_sel = selv if u_fine else selu
                        if coarse_sel is None:
                            pos, valid = fine_sel, None
                        else:
                            pos = jnp.searchsorted(coarse_sel, fine_sel)
                            pos = jnp.clip(pos, 0, coarse_sel.shape[0] - 1)
                            valid = (jnp.take(coarse_sel, pos)
                                     == fine_sel)  # [Nc]
                        if u_fine:
                            Bu_c, cu_c = Bu, colsu
                            GBv_c = GBv[:, :, :, pos]
                            cv_c = colsv[:, pos]
                        else:
                            Bu_c = Bu[:, :, :, pos]
                            cu_c = colsu[:, pos]
                            GBv_c, cv_c = GBv, colsv
                    if valid is not None:
                        # masked lanes: element not covered by both
                        # levels -> no cross observations -> zero
                        GBv_c = GBv_c * valid[None, None, None, :]
                    Cku = Bu_c.shape[1]
                    Ckv, Dv, Nc = GBv_c.shape[1:]
                    Nb = elements[kv][0]

                    def du_step(acc, xs, GBv_c=GBv_c, cv_c=cv_c,
                                Cku=Cku, Ckv=Ckv, Dv=Dv, Nc=Nc, Nb=Nb):
                        Bu_du, ia_du = xs  # [Ce, Cku, Nc], [Nc]
                        T = jnp.sum(
                            Bu_du[:, :, None, None, :]
                            * GBv_c[:, None, :, :, :], axis=0
                        )  # [Cku, Ckv, Dv, Nc]
                        vals = jnp.transpose(T, (2, 3, 0, 1)).reshape(
                            Dv * Nc, Cku * Ckv)
                        ids = (ia_du[None, :] * Nb + cv_c).reshape(-1)
                        acc = acc + jax.ops.segment_sum(
                            vals, ids, num_segments=elements[ku][0] * Nb)
                        return acc, None

                    Du = Bu_c.shape[2]
                    acc0 = jnp.zeros(
                        (elements[ku][0] * Nb, Cku * Ckv), dtype)
                    acc, _ = jax.lax.scan(
                        du_step, acc0,
                        (jnp.moveaxis(Bu_c, 2, 0), cu_c))
                    Na_u = elements[ku][0]
                    blockmat = jnp.transpose(
                        acc.reshape(Na_u, Nb, Cku, Ckv), (0, 2, 1, 3))
                    S = S.at[offs[ku]:offs[ku] + Na_u * Cku,
                             offs[kv]:offs[kv] + Nb * Ckv].add(
                        -blockmat.reshape(Na_u * Cku, Nb * Ckv))

        # keep-keep block diagonal + exact damping + identity rows for
        # excluded elements (mirrors _invert_damped_blocks / the dense
        # direct path's regularization)
        CtC, rawdiag, masks = state["CtC"], state["rawdiag"], state["masks"]
        for n in keep:
            Nn, Cn = elements[n]
            bd = kk_diag.get(n)
            if bd is None:
                bd = jnp.zeros((Cn * Cn, Nn), dtype)
            diag_ix = jnp.arange(Cn) * Cn + jnp.arange(Cn)
            bdiag = bd[diag_ix]
            raw = rawdiag[n].reshape(Nn, Cn).T.astype(dtype)
            nd = bdiag + jnp.maximum(raw - bdiag, 0.0)
            if self.uses_lambda:
                nd = nd + CtC[n].reshape(Nn, Cn).T.astype(dtype)
            m = masks[n].reshape(-1).astype(dtype)
            nd = nd + (1.0 - m)[None, :]
            bd = bd.at[diag_ix].set(nd)
            vals = jnp.transpose(bd.reshape(Cn, Cn, Nn), (2, 0, 1))
            S = add_blocks(S, n, n, vals, jnp.arange(Nn), jnp.arange(Nn))

        b_flat = jnp.concatenate(
            [b[n].reshape(-1).astype(dtype) for n in keep])
        self._last_S = (S, offs, keep)  # debug/inspection hook (tests)
        if self.uses_lambda:
            delta_flat = jnp.linalg.solve(S, b_flat)
        else:
            # GN has no damping: BA-style problems carry a gauge null
            # space (global similarity), so S is singular to working
            # precision and LU is undefined — take the minimum-norm
            # least-squares solution instead (PCG avoids this naturally
            # by staying in the Krylov range space)
            delta_flat = jnp.linalg.lstsq(S, b_flat)[0]
        out = {}
        for n in keep:
            Nn, Cn = elements[n]
            out[n] = delta_flat[offs[n]:offs[n] + Nn * Cn].reshape(
                state["r0"][n].shape)
        return out

    def _linear_solve_schur(self, state, sp, damped, safe_div, consts):
        """PCG on the reduced keep-system S = A_kk - A_ke A_ee^-1 A_ek
        (A = damped J^T J), then back-substitution for the eliminated
        unknowns.  Implicit: each S matvec is two full damped applies
        plus a block-diagonal inverse — no Schur matrix is formed.  The
        reduced system is smaller (BA: cameras only) and dramatically
        better conditioned than the full normal equations (the Ceres
        ITERATIVE_SCHUR design; the reference has no analog)."""
        dtype = self.dtype
        jac_store = state["jac_store"]
        keep, elim = self._schur_partition(consts, jac_store)
        Einv = self._invert_damped_blocks(
            self._diag_pair_blocks(consts, jac_store, names=set(elim)),
            state["rawdiag"], state["CtC"], guard_gn=False)

        zeros = tree_zeros_like(state["r0"])

        def pad(part):
            return {k: part.get(k, zeros[k]) for k in zeros}

        def einv(ve):
            return {k: self._block_apply(Einv[k], v) for k, v in ve.items()}

        def keep_of(t):
            return {k: t[k] for k in keep}

        def elim_of(t):
            return {k: t[k] for k in elim}

        bfull = state["r0"]
        # reduced RHS: b_k - A_ke A_ee^-1 b_e
        v = damped(pad(einv(elim_of(bfull))))
        b = tree_sub(keep_of(bfull), keep_of(v))

        if self.schur_dense:
            delta_k = self._schur_dense_solve(state, consts, keep, elim,
                                              Einv, b)
            w = damped(pad(delta_k))
            delta_e = einv({k: bfull[k] - w[k] for k in elim})
            return pad({**delta_k, **delta_e})

        def S_apply(xk):
            t = damped(pad(xk))
            w = damped(pad(einv(elim_of(t))))
            return tree_sub(keep_of(t), keep_of(w))

        red_state = {
            "pre": keep_of(state["pre"]),
            "pre_block": {k: pb for k, pb in (state.get("pre_block") or {}).items()
                          if k in keep},
        }
        r0 = b
        p0 = self.precond_apply(red_state, r0)
        alpha_num0 = tree_dot(r0, p0)
        delta0 = tree_zeros_like(r0)
        Q0 = jnp.asarray(0.0, dtype)

        def cond_fn(st):
            i, _, _, _, _, _, stop = st
            return (i < sp.lIterations) & (~stop)

        def body_fn(st):
            i, delta, r, p, alpha_num, Q0v, stop = st
            Ap = S_apply(p)
            alpha = safe_div(alpha_num, tree_dot(p, Ap))
            delta = tree_axpy(alpha, p, delta)
            if self.uses_lambda:
                do_reset = ((i + 1) % sp.residual_reset_period) == 0
                r = jax.lax.cond(
                    do_reset,
                    lambda _: tree_sub(b, S_apply(delta)),
                    lambda _: tree_axpy(-alpha, Ap, r),
                    None,
                )
            else:
                r = tree_axpy(-alpha, Ap, r)
            z = self.precond_apply(red_state, r)
            beta_num = tree_dot(z, r)
            if self.uses_lambda:
                Q1 = 0.5 * tree_dot(delta, tree_add(r, b))
                zeta = (i + 1).astype(dtype) * (Q1 - Q0v) / Q1
                # routing-noise resolvability gate: see linear_solve.
                # The reduced matvec is two bf16-routed applies, so the
                # same spurious-stop failure hit schur_pcg at the
                # bench's q_tolerance=0.0 (the r4 32k-schur
                # time-to-target regression, 0.063 -> 0.286 s).
                resolvable = (i + 1).astype(dtype) * q_noise
                stop_q = ((~jnp.isfinite(Q1)) | (~jnp.isfinite(zeta))
                          | ((zeta < sp.q_tolerance)
                             & (sp.q_tolerance >= resolvable)))
            else:
                Q1 = Q0v
                stop_q = jnp.asarray(False)
            beta = safe_div(beta_num, alpha_num)
            p = tree_add(z, tree_scale(p, beta))
            return (i + 1, delta, r, p, beta_num, Q1, stop_q)

        q_noise = self._q_noise_floor(jac_store)
        init = (jnp.asarray(0, jnp.int32), delta0, r0, p0, alpha_num0, Q0,
                jnp.asarray(False))
        _, delta_k, _, _, _, _, _ = jax.lax.while_loop(cond_fn, body_fn, init)
        # back-substitution: delta_e = A_ee^-1 (b_e - A_ek delta_k)
        w = damped(pad(delta_k))
        delta_e = einv({k: bfull[k] - w[k] for k in elim})
        return pad({**delta_k, **delta_e})

    def linear_solve(self, U, state, inputs, sp: SolverParams, prep=None):
        """Phase 2: the full PCG inner loop (or dense direct solve) ->
        masked delta.  All reductions stay on device (reference
        gauss_newton.t:1615-1687 without its per-iteration D2H of Q)."""
        dtype = self.dtype
        prep = prep if prep is not None else self.prepare(inputs)
        consts = prep["consts"]
        twin_consts = prep["twin_consts"]
        masks = state["masks"]
        jac_store = state["jac_store"]
        r0, CtC = state["r0"], state["CtC"]

        b = r0
        p0 = self.precond_apply(state, r0)
        alpha_num0 = tree_dot(r0, p0)
        delta0 = tree_zeros_like(r0)
        Q0 = jnp.asarray(0.0, dtype)  # 0.5*delta.(r+b) with delta=0

        apply_jtjp = self.make_jtjp(U, inputs, consts, masks, jac_store, twin_consts)

        def damped(pvec):
            Ap = apply_jtjp(pvec)
            if self.uses_lambda:
                Ap = tree_add(Ap, tree_mul(CtC, pvec))
            return Ap

        def safe_div(num, den):
            if self.uses_lambda:
                return num / den
            return jnp.where(den != 0.0, num / jnp.where(den != 0.0, den, 1.0), 0.0)

        if self.schur:
            delta = self._linear_solve_schur(state, sp, damped, safe_div, consts)
            return tree_mul(delta, self._bmask(masks))

        if self.direct_solve:
            # dense LU solve of (J^T J + CtC) delta = -J^T r (reference
            # cublasDirectSolve, gauss_newton.t:1280-1328)
            r_all, J = self.dense_jacobian(U, inputs, consts, masks)
            A = jnp.matmul(J.T, J, precision=jax.lax.Precision.HIGHEST)
            mflat = self.flatten_U(
                {k: jnp.broadcast_to(v[..., None], v.shape + (U[k].shape[-1],))
                 for k, v in masks.items()}
            )
            if self.uses_lambda:
                A = A + jnp.diag(self.flatten_U(CtC))
            # excluded unknowns: identity rows so the system stays regular
            A = A + jnp.diag(1.0 - mflat)
            gvec = jnp.matmul(J.T, r_all, precision=jax.lax.Precision.HIGHEST)
            delta_flat = jnp.linalg.solve(A, -gvec)
            return tree_mul(self.unflatten_U(delta_flat), self._bmask(masks))

        # ---- PCG inner loop (lax.while_loop; reference gauss_newton.t:
        # 1615-1687, all reductions stay on device) ----
        def cond_fn(st):
            i, _, _, _, _, _, stop = st
            return (i < sp.lIterations) & (~stop)

        def body_fn(st):
            i, delta, r, p, alpha_num, Q0v, stop = st
            Ap = damped(p)
            alpha_den = tree_dot(p, Ap)
            alpha = safe_div(alpha_num, alpha_den)
            delta = tree_axpy(alpha, p, delta)

            def reset_r(_):
                # PCGStep2_1stHalf/2ndHalf: r = b - A delta
                Adelta = damped(delta)
                return tree_sub(b, Adelta)

            def update_r(_):
                return tree_axpy(-alpha, Ap, r)

            if self.uses_lambda:
                do_reset = ((i + 1) % sp.residual_reset_period) == 0
                r = jax.lax.cond(do_reset, reset_r, update_r, None)
            else:
                # GN never resets (reference: residual_reset_period is an
                # LM trust-region mechanism); keep the second JTJp apply
                # out of the compiled loop entirely
                r = update_r(None)
            z = self.precond_apply(state, r)
            beta_num = tree_dot(z, r)
            if self.uses_lambda:
                Q1 = 0.5 * tree_dot(delta, tree_add(r, b))
                zeta = (i + 1).astype(dtype) * (Q1 - Q0v) / Q1
                # the zeta test only fires when the tolerance is
                # RESOLVABLE above the routing-noise floor: with bf16
                # routing the per-iteration Q increment carries ~2^-8
                # relative noise, so zeta's noise alone is ~(i+1)*2^-8 —
                # far above the 1e-4 default.  Un-gated, the spurious
                # early stop returns a weak delta that the trust region
                # rejects forever (measured: BA-250k stalls at c0 on TPU
                # with default q_tolerance; converges with f32 routing
                # or q_tolerance=-inf).  f32 routing: floor 0, reference
                # semantics exactly (gauss_newton.t:1666-1686).
                resolvable = (i + 1).astype(dtype) * q_noise
                stop_q = ((~jnp.isfinite(Q1)) | (~jnp.isfinite(zeta))
                          | ((zeta < sp.q_tolerance)
                             & (sp.q_tolerance >= resolvable)))
            else:
                Q1 = Q0v
                stop_q = jnp.asarray(False)
            beta = safe_div(beta_num, alpha_num)
            p = tree_add(z, tree_scale(p, beta))
            return (i + 1, delta, r, p, beta_num, Q1, stop_q)

        q_noise = self._q_noise_floor(jac_store)
        init = (jnp.asarray(0, jnp.int32), delta0, r0, p0, alpha_num0, Q0, jnp.asarray(False))
        _, delta, _, _, _, _, _ = jax.lax.while_loop(cond_fn, body_fn, init)
        return tree_mul(delta, self._bmask(masks))

    def finish_step(self, U, lm: LMState, state, delta, inputs, sp: SolverParams,
                    prep=None):
        """Phase 3: X += delta (+ LM model cost, trust-region accept/
        revert, radius update — reference gauss_newton.t:1692-1761)."""
        prep = prep if prep is not None else self.prepare(inputs)
        return self._finish_step(U, lm, inputs, prep["consts"], delta, sp, state["ssq"])

    def nonlinear_step(self, U, lm: LMState, inputs, sp: SolverParams, prep=None):
        """One Gauss-Newton / LM iteration: setup + full PCG inner loop +
        update (+ trust region accept/revert for LM).  Entirely on device;
        mirrors the reference's step(), gauss_newton.t:1545-1785."""
        prep = prep if prep is not None else self.prepare(inputs)
        state = self.solve_setup(U, lm, inputs, sp, prep)
        delta = self.linear_solve(U, state, inputs, sp, prep)
        return self.finish_step(U, lm, state, delta, inputs, sp, prep)

    def _finish_step(self, U, lm, inputs, consts, delta, sp, ssq):
        dtype = self.dtype
        # ---- nonlinear finish ----
        newU = tree_add(U, delta)
        if not self.uses_lambda:
            return newU, lm._replace(n_iter=lm.n_iter + 1), jnp.asarray(False), jnp.asarray(
                jnp.nan, dtype
            )

        model_cost = self.model_cost(U, inputs, consts, delta)
        model_cost_change = lm.prev_cost - model_cost
        new_cost = self.cost(newU, inputs, consts)
        cost_change = lm.prev_cost - new_cost
        relative_decrease = cost_change / model_cost_change
        accept = (cost_change >= 0) & (relative_decrease > sp.min_relative_decrease)

        # Ceres-style radius update (gauss_newton.t:1707-1761)
        step_quality = relative_decrease
        tmp_factor = 1.0 - (2.0 * step_quality - 1.0) ** 3
        radius_accept = jnp.minimum(
            lm.trust_region_radius / jnp.maximum(1.0 / 3.0, tmp_factor),
            sp.max_trust_region_radius,
        )
        radius_reject = lm.trust_region_radius / lm.radius_decrease_factor

        new_radius = jnp.where(accept, radius_accept, radius_reject)
        new_decrease = jnp.where(accept, 2.0, 2.0 * lm.radius_decrease_factor)
        outU = tree_where(accept, newU, U)
        new_prev_cost = jnp.where(accept, new_cost, lm.prev_cost)

        func_tol = accept & (cost_change <= lm.prev_cost * sp.function_tolerance)
        radius_too_small = (~accept) & (new_radius < sp.min_trust_region_radius)
        stop = func_tol | radius_too_small

        new_lm = LMState(
            trust_region_radius=new_radius,
            radius_decrease_factor=new_decrease,
            prev_cost=new_prev_cost,
            n_iter=lm.n_iter + 1,
            ssq=tree_where(lm.n_iter == 0, ssq, lm.ssq),
            finished=stop,
        )
        return outU, new_lm, stop, new_cost
