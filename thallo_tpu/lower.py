"""Lowering: residual groups -> pure JAX functions.

This module replaces the reference's entire kernel compiler
(`createfunction`, /root/reference/API/src/thallo.t:2332-3455, plus the
derived-function generators thallo.t:3531-3948).  The TPU-first design:

* Each residual group iterates a grid = (external domains) x (contracted
  domains) (the reference's ResidualDomain full/external split,
  /root/reference/API/src/ir.t:59, thallo.t:5821-5884).
* Every image access in the group becomes a **slot**: an array of gathered
  values aligned to the grid.  Grid-offset accesses lower to `jnp.roll`
  (wrap/torus semantics identical to the reference's `Index:wrap()`,
  thallo.t:609-738); everything else is a vectorized gather.  A slot's
  transpose (scatter) is the inverse roll — exact and atomics-free — or a
  `segment_sum` (the TPU analog of the reference's warp-aggregated atomic
  scatter, cuda_util.t:334-429).
* The residual is an **elementwise local function** of slot values, vmapped
  over the external grid.  ALL derivatives (J.p via jvp, J^T.q via vjp,
  per-point Jacobian blocks via vmap(jacrev)) come from JAX; XLA fuses the
  result.  This replaces symbolic autodiff (ad.t) and hand-scheduled PTX
  with tracing + the XLA TPU backend.
"""
from __future__ import annotations

import os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dims import AffineComp, IndexDomain, SparseComp
from .expr import (
    Apply,
    BoundsAccess,
    Const,
    Exp,
    ImageAccess,
    IndexValue,
    ParamValue,
    Reduction,
    SampleAccess,
)
from .inputs import Image
from .ops import structured
from .ops.sampling import array_bilinear_sample, bilinear_sample, sample_with_deriv_images


# ---------------------------------------------------------------------------
# collection: walk the expression DAG
# ---------------------------------------------------------------------------
class SlotSpec:
    """One distinct (image, index) access in a group: all channels are
    gathered together (the analog of the reference's per-access vectorized
    loads, thallo.t:2407-2468)."""

    def __init__(self, image: Image, comps: Tuple[AffineComp, ...], is_unknown: bool):
        self.image = image
        self.comps = comps
        self.is_unknown = is_unknown
        self.dep_cons: Tuple[IndexDomain, ...] = ()  # filled by finalize

    @property
    def key(self):
        return (id(self.image), self.comps)

    def __repr__(self):
        return f"slot:{self.image.name}({','.join(map(repr, self.comps))})"


class Collection:
    def __init__(self, allow_inline_ca=False):
        # allow_inline_ca: domain discovery over RAW (pre-inlining)
        # expressions — a non-materialized ComputedArray access then
        # contributes its access comps' domains (what inlining would
        # substitute them with) instead of being an error.  Used by
        # expr.get()'s free-domain classification for nested get()s
        # (reference maybe_computed_array classify, thallo.t:1868-1893).
        self.allow_inline_ca = allow_inline_ca
        self.ext_domains: List[IndexDomain] = []
        self.con_domains: List[IndexDomain] = []
        self.uslots: Dict = {}  # key -> SlotSpec (unknown images)
        self.cslots: Dict = {}  # key -> SlotSpec (const arrays)
        self.mslots: Dict = {}  # key -> SlotSpec (materialized computed arrays)
        self.bounds: Dict = {}  # key -> BoundsAccess
        self.ivals: Dict = {}  # key -> IndexValue
        self.params: Dict = {}  # name -> Param
        self.sampled: Dict = {}  # name -> SampledImage
        self._seen = set()

    def _domain(self, d: IndexDomain, bound):
        if d in bound:
            if d not in self.con_domains:
                self.con_domains.append(d)
        else:
            if d not in self.ext_domains:
                self.ext_domains.append(d)

    def _comps_domains(self, comps, bound):
        for c in comps:
            for d in c.domains():
                self._domain(d, bound)

    def walk(self, e: Exp, bound: frozenset):
        key = (id(e), bound)
        if key in self._seen:
            return
        self._seen.add(key)
        if isinstance(e, Const):
            return
        if isinstance(e, Apply):
            for a in e.args:
                self.walk(a, bound)
            return
        if isinstance(e, Reduction):
            inner = bound | frozenset(e.domains)
            for d in e.domains:
                if d not in self.con_domains:
                    self.con_domains.append(d)
            self.walk(e.arg, inner)
            return
        if isinstance(e, ImageAccess):
            self._comps_domains(e.comps, bound)
            im = e.image
            if im.kind == "computed":
                if not im.materialize:
                    if self.allow_inline_ca:
                        return  # comps' domains already collected above
                    raise RuntimeError("computed arrays must be inlined before lowering")
                target = self.mslots
            elif im.kind == "unknown":
                target = self.uslots
            else:
                target = self.cslots
            k = (id(im), e.comps)
            if k not in target:
                target[k] = SlotSpec(im, e.comps, im.kind == "unknown")
            return
        if isinstance(e, BoundsAccess):
            self._comps_domains(e.comps, bound)
            k = ("bounds", e.comps, e.dims, e.expand)
            self.bounds.setdefault(k, e)
            return
        if isinstance(e, IndexValue):
            for d in e.comp.domains():
                self._domain(d, bound)
            k = ("ival", e.comp)
            self.ivals.setdefault(k, e)
            return
        if isinstance(e, ParamValue):
            self.params.setdefault(e.param.name, e.param)
            return
        if isinstance(e, SampleAccess):
            for c in e.coords:
                self.walk(c, bound)
            self.sampled.setdefault(e.sampled.name, e.sampled)
            return
        raise TypeError(f"unknown expression node {e!r}")

    def finalize(self):
        conset = set(self.con_domains)
        for slots in (self.uslots, self.cslots, self.mslots):
            for s in slots.values():
                deps = []
                for c in s.comps:
                    for d in c.domains():
                        if d in conset and d not in deps:
                            deps.append(d)
                s.dep_cons = tuple(sorted(deps, key=self.con_domains.index))


# ---------------------------------------------------------------------------
# computed-array inlining (substitution)
# ---------------------------------------------------------------------------
def substitute_index(comp: AffineComp, mapping) -> AffineComp:
    """Affine-compose an index component through a domain substitution."""
    out = AffineComp((), comp.offset)
    for base, coeff in comp.terms:
        if isinstance(base, IndexDomain):
            if base in mapping:
                out = out + coeff * mapping[base]
            else:
                out = out + coeff * AffineComp(((base, 1),), 0)
        else:  # SparseComp: substitute inside args
            new_args = tuple(substitute_index(a, mapping) for a in base.args)
            out = out + coeff * AffineComp(
                ((SparseComp(base.sparse, new_args, base.component), 1),), 0
            )
    return out


def substitute_expr(e: Exp, mapping, cache=None, force_inline=False) -> Exp:
    cache = cache if cache is not None else {}
    if id(e) in cache:
        return cache[id(e)]
    if isinstance(e, Const):
        r = e
    elif isinstance(e, Apply):
        r = Apply(e.op, tuple(substitute_expr(a, mapping, cache, force_inline) for a in e.args))
    elif isinstance(e, Reduction):
        r = Reduction(e.domains, substitute_expr(e.arg, mapping, cache, force_inline))
    elif isinstance(e, ImageAccess):
        comps = tuple(substitute_index(c, mapping) for c in e.comps)
        im = e.image
        if im.kind == "computed" and (force_inline or not im.materialize):
            # inline the computed array's defining expression at this index
            inner_map = {d: c for d, c in zip(im.domains, comps)}
            r = substitute_expr(im.expression[e.channel], inner_map, {}, force_inline)
        else:
            r = ImageAccess(im, comps, e.channel)
    elif isinstance(e, BoundsAccess):
        r = BoundsAccess(tuple(substitute_index(c, mapping) for c in e.comps), e.dims, e.expand)
    elif isinstance(e, IndexValue):
        r = IndexValue(substitute_index(e.comp, mapping))
    elif isinstance(e, ParamValue):
        r = e
    elif isinstance(e, SampleAccess):
        r = SampleAccess(
            e.sampled, tuple(substitute_expr(c, mapping, cache, force_inline) for c in e.coords),
            e.channel,
        )
    else:
        raise TypeError(f"unknown node {e!r}")
    cache[id(e)] = r
    return r


def inline_computed(exprs: List[Exp], force=False) -> List[Exp]:
    """Expand ComputedArray accesses (all of them when force=True, else
    only the non-materialized ones)."""
    return [substitute_expr(e, {}, {}, force) for e in exprs]


# ---------------------------------------------------------------------------
# op evaluation table
# ---------------------------------------------------------------------------
def _as_pred(x):
    return x != 0


def _make_ops(dtype):
    f = lambda b: b.astype(dtype)  # noqa: E731
    return {
        "add": jnp.add,
        "sub": jnp.subtract,
        "mul": jnp.multiply,
        "div": jnp.divide,
        "pow": jnp.power,
        "neg": jnp.negative,
        "abs": jnp.abs,
        "sin": jnp.sin,
        "cos": jnp.cos,
        "tan": jnp.tan,
        "asin": jnp.arcsin,
        "acos": jnp.arccos,
        "atan": jnp.arctan,
        "sqrt": jnp.sqrt,
        "exp": jnp.exp,
        "log": jnp.log,
        "min": jnp.minimum,
        "max": jnp.maximum,
        "select": lambda c, a, b: jnp.where(_as_pred(c), a, b),
        "eq": lambda a, b: f(a == b),
        "neq": lambda a, b: f(a != b),
        "greater": lambda a, b: f(a > b),
        "greatereq": lambda a, b: f(a >= b),
        "less": lambda a, b: f(a < b),
        "lesseq": lambda a, b: f(a <= b),
        "and": lambda a, b: f(_as_pred(a) & _as_pred(b)),
        "or": lambda a, b: f(_as_pred(a) | _as_pred(b)),
        "not": lambda a: f(~_as_pred(a)),
        "constant": jax.lax.stop_gradient,
    }


# ---------------------------------------------------------------------------
# index evaluation over a subgrid
# ---------------------------------------------------------------------------
class _IndexEnv:
    """Evaluates AffineComp/SparseComp index expressions to int32 arrays
    over a (sub)grid [*ext_shape, *dep_con_shape].

    use_np=True evaluates in pure numpy (host): index-table construction
    at init time must not issue eager device ops — on a remote-compile
    backend every eager op is a fresh executable (minutes of init)."""

    def __init__(self, axes: Dict[IndexDomain, int], shape: Tuple[int, ...], sparse_data,
                 use_np: bool = False, offsets=None):
        self.axes = axes  # domain -> axis position
        self.shape = shape
        self.sparse_data = sparse_data  # name -> [prod(in_dims), n_out] int32
        self.use_np = use_np
        # axis -> (possibly traced) iota offset: contraction blocking
        # evaluates index expressions over a SHIFTED sub-range of a
        # contracted domain (lax.scan over K-blocks)
        self.offsets = offsets or {}

    def _iota(self, axis):
        if self.use_np:
            n = self.shape[axis]
            view = [1] * len(self.shape)
            view[axis] = n
            it = np.broadcast_to(
                np.arange(n, dtype=np.int32).reshape(view), self.shape
            )
            off = self.offsets.get(axis)
            return it if off is None else it + np.int32(off)
        it = jax.lax.broadcasted_iota(jnp.int32, self.shape, axis)
        off = self.offsets.get(axis)
        return it if off is None else it + jnp.asarray(off, jnp.int32)

    def eval(self, comp: AffineComp):
        xp = np if self.use_np else jnp
        val = xp.full(self.shape, comp.offset, dtype=xp.int32)
        for base, coeff in comp.terms:
            if isinstance(base, IndexDomain):
                val = val + coeff * self._iota(self.axes[base])
            else:
                val = val + coeff * self.eval_sparse(base)
        return val

    def _identity_flat(self, sc: SparseComp) -> bool:
        """True when the composed in-space index is exactly the row-major
        iota over this grid — i.e. the access is a plain sparse(e) over
        the full residual domain (BA's oToC(o), ARAP's V0(e): the common
        case).  Then take(data, flat) == data and the 250k-row gather
        XLA would otherwise run INSIDE the step (measured 1.7 ms at BA
        250k, fusion.2 in /tmp trace) vanishes."""
        sm = sc.sparse
        if len(sc.args) != len(self.shape):
            return False
        for k, (a, d_in) in enumerate(zip(sc.args, sm.in_dims)):
            if isinstance(a, SparseComp) or a.offset != 0 or len(a.terms) != 1:
                return False
            (base, coeff) = a.terms[0]
            if coeff != 1 or isinstance(base, SparseComp):
                return False
            ax = self.axes.get(base)
            if ax != k or self.shape[ax] != d_in.size:
                return False
            if self.offsets.get(ax) is not None:
                return False
        return True

    def eval_sparse(self, sc: SparseComp):
        sm = sc.sparse
        data = self.sparse_data[sm.name]  # [prod(in_dims), n_out]
        if self._identity_flat(sc):
            col = (np.asarray(data) if self.use_np else data)[:, sc.component]
            return col.reshape(self.shape)
        in_sizes = [d.size for d in sm.in_dims]
        flat = self.eval(sc.args[0]) % in_sizes[0]
        for a, n in zip(sc.args[1:], in_sizes[1:]):
            flat = flat * n + (self.eval(a) % n)
        if self.use_np:
            return np.take(np.asarray(data)[:, sc.component], np.asarray(flat), axis=0)
        return jnp.take(data[:, sc.component], flat, axis=0)


# ---------------------------------------------------------------------------
# scatter -> gather inversion (the TPU analog of the reference's
# "centered"/unknown-wise index inversion, createjtfcentered
# thallo.t:3576-3712: enumerate, per unknown, the residual points that
# touch it).  XLA's scatter-add on TPU serializes; a degree-padded inverse
# gather table turns every scatter into a dense gather + masked sum.
# ---------------------------------------------------------------------------
def gather_with_segsum(src, idx, plan):
    """Linear gather src[idx] whose TRANSPOSE runs the scatter-free
    destination-tiled Pallas segment sum (ops/segsum.py) instead of XLA's
    scatter-add.  jvp/vjp both stay scatter-free."""
    from .ops.segsum import pallas_segment_sum

    def fwd(res, x):
        (i,) = res
        return jnp.take(x, i, axis=0)

    def trans(res, ct):
        return pallas_segment_sum(ct, plan)

    return jax.custom_derivatives.linear_call(fwd, trans, (idx,), src)


# ---------------------------------------------------------------------------
# the lowered group
# ---------------------------------------------------------------------------
class LoweredGroup:
    """A residual group compiled against concrete dim sizes.

    Solver-facing API (see solver/gn.py):
      residuals(X, inputs, consts)     -> [R, rc]
      point_jacobians(X, inputs, consts)
          -> (r [R, rc], jacs: list of [R, rc, *dep_con_shape, C])
      gather_slot(i, X, inputs)        -> [R, *dep_con_shape, C]
      scatter_slot(i, vals, inputs)    -> image-shaped sum-scatter
    """

    def __init__(self, name: str, exprs: List[Exp], spec, sizes: Dict[str, int], dtype,
                 domain_order=None, con_splits=None):
        self.name = name
        self.dtype = dtype
        self.spec = spec
        exprs = inline_computed(exprs)
        self.exprs = exprs
        col = Collection()
        for e in exprs:
            col.walk(e, frozenset())
        col.finalize()
        self.col = col
        self.ext_domains = list(col.ext_domains)
        _discovery_order = tuple(self.ext_domains)
        if domain_order:
            # user/autoscheduler reorder directive (reference
            # thallo.t:5665): permute the external iteration order.  The
            # listed domains come first in the given order; unlisted ones
            # keep discovery order.  On TPU this decides the row-major
            # flattening of the residual grid — i.e. which domain varies
            # fastest in every gather/scatter index table and which axis
            # of multi-dim intermediates lands in the 128-lane tile.
            want = [d for d in domain_order if d in self.ext_domains]
            self.ext_domains = want + [d for d in self.ext_domains
                                       if d not in want]
        self.domain_order = tuple(self.ext_domains)
        # non-default order => measurements key separately (schedule.py)
        self.reordered = self.domain_order != _discovery_order
        self.con_domains = col.con_domains
        both = set(self.ext_domains) & set(self.con_domains)
        if both:
            raise ValueError(f"domains used both inside and outside Sum: {both}")
        self.ext_shape = tuple(d.dim.size for d in self.ext_domains)
        self.con_shape = tuple(d.dim.size for d in self.con_domains)
        self.R = int(np.prod(self.ext_shape)) if self.ext_shape else 1
        self.uslots: List[SlotSpec] = list(col.uslots.values())
        self.cslots: List[SlotSpec] = list(col.cslots.values())
        self.mslots: List[SlotSpec] = list(col.mslots.values())
        self.rc = len(exprs)
        # one sub-lowering per distinct materialized computed array: a
        # pointwise group over the CA's declared domains whose value array
        # is recomputed once per evaluation point ("precompute kernels",
        # reference createprecomputed thallo.t:4046-4094)
        self.computed_groups = {}
        for slot in self.mslots:
            im = slot.image
            if im.name not in self.computed_groups:
                for d in im.dims:
                    if d.size is None:
                        d.size = sizes[d.name]
                sub = LoweredGroup(f"ca_{im.name}", list(im.expression), spec, sizes, dtype)
                if sub.con_domains:
                    raise ValueError(
                        f"materialized computed array {im.name} contains a Sum; "
                        "keep contractions in the residual"
                    )
                # permutation mapping the sub-group's discovered ext order
                # to the CA's declared domain order
                perm = [sub.ext_domains.index(d) for d in im.domains]
                self.computed_groups[im.name] = (im, sub, perm)
        # Composed unknown accesses for materialized computed arrays: for
        # each CA access m and each unknown slot k of the CA's defining
        # expression, the chain rule contributes through the COMPOSED
        # index (k's comps with the CA's domains substituted by m's
        # comps).  This is the TPU analog of the reference's
        # auto-generated CA gradient images (thallo.t:1777-1822): the
        # gradient array dCA/du_k is materialized over the CA's domains
        # and gathered at m's index, and the resulting per-point Jacobian
        # block scatters through the composed access.  Composition is
        # done symbolically on the AffineComp/SparseComp algebra, so
        # composed slots keep every fast path (roll plans, BSR row
        # tables) of direct slots.
        self.comp_slots: List[Tuple[SlotSpec, int, int]] = []
        self.ca_jac_ok = (
            not any(s.dep_cons for s in self.mslots)
            and all(not s.dep_cons for s in self.uslots)
            and all(
                not sub.mslots and all(not s.dep_cons for s in sub.uslots)
                for (_, sub, _) in self.computed_groups.values()
            )
        )
        if self.mslots and self.ca_jac_ok:
            for mi, mslot in enumerate(self.mslots):
                im, sub, _ = self.computed_groups[mslot.image.name]
                mapping = dict(zip(im.domains, mslot.comps))
                for k, s in enumerate(sub.uslots):
                    comps = tuple(substitute_index(c, mapping) for c in s.comps)
                    self.comp_slots.append((SlotSpec(s.image, comps, True), mi, k))
        self._F = self._make_local_fn()
        # contraction blocking (the real `split`, reference thallo.t:
        # 5678-5727 + in-register contraction thallo.t:5821-5884):
        # lax.scan over K-blocks of one contracted domain bounds the
        # materialized fiber memory instead of gathering the full
        # (R x K) cross-product
        self.con_block = self._plan_con_block(con_splits or {})
        self._split_fns = {}

    def _plan_con_block(self, con_splits):
        """(domain, block, n_blocks) or None.  Eligible when every
        Reduction covers the full contracted space (single reduction
        layer: partial sums across blocks compose), nothing contracted
        leaks outside a Reduction, no materialized CAs, and no excluded
        unknowns are touched.  Activated by an explicit split(domain, f)
        directive, or automatically when the materialized fiber bytes
        exceed THALLO_CON_BLOCK_BYTES (default 128 MiB)."""
        import os as _os

        if not self.con_domains or self.mslots:
            return None
        conset = set(self.con_domains)
        rnodes = self._reduction_nodes()
        if not rnodes:
            return None
        for rn in rnodes:
            if set(rn.domains) != conset:
                return None  # partial/nested reductions: not blockable
        # no Reduction nested inside another
        def has_nested(e, inside):
            if isinstance(e, Reduction):
                if inside:
                    return True
                return has_nested(e.arg, True)
            if isinstance(e, Apply):
                return any(has_nested(a, inside) for a in e.args)
            return False
        if any(has_nested(e, False) for e in self.exprs):
            return None
        # every contracted leaf must sit inside a Reduction
        def leaks(e, inside):
            if isinstance(e, Reduction):
                return False  # everything below is inside
            if isinstance(e, (ImageAccess, BoundsAccess, IndexValue)):
                comps = (e.comps if not isinstance(e, IndexValue)
                         else (e.comp,))
                deps = any(d in conset for c in comps for d in c.domains())
                return deps and not inside
            if isinstance(e, Apply):
                return any(leaks(a, inside) for a in e.args)
            return False
        if any(leaks(e, False) for e in self.exprs):
            return None
        touched = {s.image.name for s in self.uslots}
        if any(im.exclude_expr is not None for im in self.spec.unknowns
               if im.name in touched):
            return None
        # the blocked domain: explicit split directive wins, else largest
        split_dom = next((d for d in self.con_domains if d in con_splits),
                         None)
        dom = split_dom or max(self.con_domains, key=lambda d: d.dim.size)
        size = dom.dim.size
        # fiber bytes if NOT blocked (worst consumer: gathered slots +
        # bounds/ivals over the full cross-product)
        width = sum(
            int(np.prod([d.dim.size for d in sl.dep_cons])) * sl.image.channels
            for sl in list(self.uslots) + list(self.cslots) if sl.dep_cons)
        fiber_bytes = self.R * max(width, 1) * 4
        budget = int(_os.environ.get("THALLO_CON_BLOCK_BYTES", str(1 << 27)))
        if split_dom is not None:
            B = max(1, min(int(con_splits[split_dom]), size))
        elif fiber_bytes > budget:
            B = max(1, int(size * budget / fiber_bytes))
        else:
            return None
        while size % B:
            B -= 1  # largest divisor at or under the target width
        if B >= size:
            return None
        return (dom, B, size // B)

    # -- slot index machinery ----------------------------------------------
    def _slot_axes(self, dep_cons, con_block=None):
        axes = {d: i for i, d in enumerate(self.ext_domains)}
        shape = list(self.ext_shape)
        for d in dep_cons:
            axes[d] = len(shape)
            if con_block is not None and d is con_block[0]:
                shape.append(con_block[2])  # blocked width
            else:
                shape.append(d.dim.size)
        return axes, tuple(shape)

    def _roll_plan(self, slot: SlotSpec):
        """If this slot is a pure grid-offset access over distinct external
        domains matching the image's axes, return (ext_axis_per_image_axis,
        shifts).  Gather == jnp.roll; scatter == inverse jnp.roll: the TPU
        fast path for stencils, replacing bounds-checked neighbor loads +
        atomic scatters (reference thallo.t:3340-3418)."""
        if slot.dep_cons:
            return None
        im = slot.image
        used, shifts = [], []
        for j, c in enumerate(slot.comps):
            so = c.as_single_offset()
            if so is None:
                return None
            d, off = so
            if d not in self.ext_domains or d.dim is not im.dims[j]:
                return None
            used.append(self.ext_domains.index(d))
            shifts.append(off)
        if len(set(used)) != len(used):
            return None
        return used, shifts

    def _sparse_arrays(self, inputs):
        out = {}
        for sm in self.spec.sparse_maps:
            if inputs is not None and sm.name in inputs:
                arr = jnp.asarray(inputs[sm.name], dtype=jnp.int32)
                n_out = len(sm.out_dims)
                if arr.ndim == 1 and n_out == 1:
                    arr = arr[:, None]
                out[sm.name] = arr.reshape(-1, n_out)
        return out

    def _slot_flat_indices(self, slot: SlotSpec, inputs, use_np: bool = False,
                           con_block=None):
        axes, shape = self._slot_axes(slot.dep_cons, con_block)
        offsets = {}
        if con_block is not None and con_block[0] in slot.dep_cons:
            offsets[axes[con_block[0]]] = con_block[1]
        env = _IndexEnv(axes, shape, self._sparse_arrays(inputs),
                        use_np=use_np, offsets=offsets)
        im = slot.image
        flat = None
        for j, c in enumerate(slot.comps):
            n = im.dims[j].size
            v = env.eval(c) % n
            flat = v if flat is None else flat * n + v
        return flat

    # -- gather / scatter ---------------------------------------------------
    def _affine_plan(self, consts, i: int):
        if consts is None or i >= len(self.uslots):
            return None
        a = consts.get("affine")
        return a.value[i] if a is not None else None

    def gather_slot(self, i: int, X: Dict[str, jnp.ndarray], inputs, consts=None) -> jnp.ndarray:
        slot = self.uslots[i]
        stable = None
        if consts is not None:
            stable = consts.get("stables", {}).get(i)
        return self._gather(slot, X[slot.image.name], inputs, stable,
                            plan=self._affine_plan(consts, i))

    def _gather(self, slot: SlotSpec, img, inputs, stable=None, plan=None,
                con_block=None):
        # use the array's own channel count: masks are gathered through
        # unknown slots but carry a single channel
        C = img.shape[-1]
        if con_block is not None and con_block[0] in slot.dep_cons:
            flat = self._slot_flat_indices(slot, inputs, con_block=con_block)
            vals = img.reshape(-1, C).at[flat.reshape(-1)].get(
                mode="promise_in_bounds")
            dep_shape = tuple(
                con_block[2] if d is con_block[0] else d.dim.size
                for d in slot.dep_cons)
            return vals.reshape((self.R,) + dep_shape + (C,))
        rp = self._roll_plan(slot)
        if rp is not None:
            used, shifts = rp
            v = self._place_axes(self._apply_roll(img, shifts), used, C)
            return v.reshape((self.R, C))
        if plan is not None and stable is None and not slot.dep_cons:
            # structured fast path: windowed slices; the AD transpose of
            # these is strided slice-adds (the affine scatter) for free
            v = structured.apply_slot_plan_rows(img.reshape(-1, C), plan)
            if v is not None:
                return v.reshape((self.R, C))
        flat = self._slot_flat_indices(slot, inputs)
        src = img.reshape(-1, C)
        S = src.shape[0]
        from .ops.segsum import ONEHOT_MAX_SEGMENTS, gather_with_onehot_transpose

        if stable is not None:
            vals = gather_with_segsum(src, flat.reshape(-1), stable)
        elif S <= ONEHOT_MAX_SEGMENTS and flat.size > 4 * S:
            # small target image gathered from a large domain: make the AD
            # transpose a one-hot MXU matmul instead of a row scatter
            vals = gather_with_onehot_transpose(src, flat.reshape(-1), S)
        else:
            vals = src.at[flat.reshape(-1)].get(mode="promise_in_bounds")
        dep_shape = tuple(d.dim.size for d in slot.dep_cons)
        return vals.reshape((self.R,) + dep_shape + (C,))

    def _place_axes(self, v, used, C):
        """v: rolled image [*imdims, C]; used[j] = ext axis of image axis j.
        Returns [*ext_shape, C]."""
        nd = len(self.ext_shape)
        order = list(np.argsort(used))
        v = jnp.transpose(v, tuple(order) + (len(used),))
        present = sorted(used)
        for a in range(nd):
            if a not in present:
                v = jnp.expand_dims(v, axis=a)
        return jnp.broadcast_to(v, self.ext_shape + (C,))

    def scatter_slot(self, i: int, vals: jnp.ndarray, inputs, consts=None) -> jnp.ndarray:
        """Transpose of gather_slot: sum-scatter [R, *dep_con, C] into an
        image-shaped array (the analog of the reference's atomic add /
        warp-aggregated scatter).  Uses the degree-padded inverse gather
        table when available (scatter-free)."""
        stable = None
        if consts is not None:
            stable = consts.get("stables", {}).get(i)
        return self._scatter(self.uslots[i], vals, inputs, stable,
                             plan=self._affine_plan(consts, i))

    def _scatter(self, slot: SlotSpec, vals: jnp.ndarray, inputs, stable=None,
                 plan=None) -> jnp.ndarray:
        im = slot.image
        C = im.channels
        imshape = tuple(d.size for d in im.dims) + (C,)
        rp = self._roll_plan(slot)
        if plan is not None and stable is None and rp is None \
                and not slot.dep_cons:
            # affine scatter: static strided slice-adds (structured.py)
            N = int(np.prod(imshape[:-1]))
            v = structured.scatter_slot_plan_rows(vals.reshape(-1, C), plan, N)
            if v is not None:
                return v.reshape(imshape)
        if rp is not None:
            used, shifts = rp
            v = vals.reshape(self.ext_shape + (C,))
            nd = len(self.ext_shape)
            extra = tuple(a for a in range(nd) if a not in used)
            if extra:
                v = jnp.sum(v, axis=extra)
            inv = np.argsort(np.argsort(used))
            v = jnp.transpose(v, tuple(inv) + (len(used),))
            for j, off in enumerate(shifts):
                if off:
                    v = jnp.roll(v, off, axis=j)
            return v
        data = vals.reshape(-1, C)
        if stable is not None:
            from .ops.segsum import pallas_segment_sum

            return pallas_segment_sum(data, stable).reshape(imshape)
        Sseg = int(np.prod(imshape[:-1]))
        if Sseg <= 1024 and data.shape[0] > 4 * Sseg:
            from .ops.segsum import onehot_segment_sum

            flat = self._slot_flat_indices(slot, inputs)
            return onehot_segment_sum(data, flat.reshape(-1), Sseg).reshape(imshape)
        flat = self._slot_flat_indices(slot, inputs)
        seg = jax.ops.segment_sum(
            data, flat.reshape(-1), num_segments=int(np.prod(imshape[:-1]))
        )
        return seg.reshape(imshape)

    # -- const values -------------------------------------------------------
    def _comp_deps(self, comps):
        conset = set(self.con_domains)
        deps = []
        for c in comps:
            for d in c.domains():
                if d in conset and d not in deps:
                    deps.append(d)
        return tuple(sorted(deps, key=self.con_domains.index))

    def _bounds_value(self, b: BoundsAccess, inputs, use_np=False,
                      con_block=None):
        deps = self._comp_deps(b.comps)
        axes, shape = self._slot_axes(deps, con_block)
        offsets = {}
        if con_block is not None and con_block[0] in deps:
            offsets[axes[con_block[0]]] = con_block[1]
        env = _IndexEnv(axes, shape, self._sparse_arrays(inputs),
                        use_np=use_np, offsets=offsets)
        ok = None
        for c, dm in zip(b.comps, b.dims):
            v = env.eval(c)
            cond = (v >= b.expand) & (v < dm.size - b.expand)
            ok = cond if ok is None else (ok & cond)
        dep_shape = tuple(
            con_block[2] if con_block is not None and d is con_block[0]
            else d.dim.size for d in deps)
        ok = ok.astype(np.float32 if use_np else self.dtype)
        return ok.reshape((self.R,) + dep_shape), deps

    def _ival_value(self, iv: IndexValue, inputs, use_np=False,
                    con_block=None):
        deps = self._comp_deps((iv.comp,))
        axes, shape = self._slot_axes(deps, con_block)
        offsets = {}
        if con_block is not None and con_block[0] in deps:
            offsets[axes[con_block[0]]] = con_block[1]
        env = _IndexEnv(axes, shape, self._sparse_arrays(inputs),
                        use_np=use_np, offsets=offsets)
        val = env.eval(iv.comp).astype(np.float32 if use_np else self.dtype)
        dep_shape = tuple(
            con_block[2] if con_block is not None and d is con_block[0]
            else d.dim.size for d in deps)
        return val.reshape((self.R,) + dep_shape), deps

    def _gather_const_np(self, slot: SlotSpec, img_np, inputs):
        """Pure-numpy gather of a CONST slot at init time (concrete
        inputs): no eager device ops — on a remote-compile backend every
        eager op is a fresh executable, which made init cost minutes."""
        C = img_np.shape[-1]
        rp = self._roll_plan(slot)
        if rp is not None:
            used, shifts = rp
            v = img_np
            for j, off in enumerate(shifts):
                if off:
                    v = np.roll(v, -off, axis=j)
            nd = len(self.ext_shape)
            order = list(np.argsort(used))
            v = np.transpose(v, tuple(order) + (len(used),))
            present = sorted(used)
            for a in range(nd):
                if a not in present:
                    v = np.expand_dims(v, axis=a)
            v = np.broadcast_to(v, self.ext_shape + (C,))
            return v.reshape((self.R, C))
        flat = np.asarray(self._slot_flat_indices(slot, inputs, use_np=True))
        vals = np.take(img_np.reshape(-1, C), flat.reshape(-1), axis=0)
        dep_shape = tuple(d.dim.size for d in slot.dep_cons)
        return vals.reshape((self.R,) + dep_shape + (C,))

    def _image_array(self, im, inputs):
        a = jnp.asarray(inputs[im.name], dtype=self.dtype)
        return a.reshape(tuple(d.size for d in im.dims) + (im.channels,))

    def prepared_consts(self, inputs, want_bsr=False, onehot_exclude=()):
        """Everything non-differentiated, computed once per solve setup:
        const-array slot values, bounds masks, index values, params,
        sampled images — and, when the schedule materializes J^T J on a
        graph group, the static block-sparse row/col tables
        (solver/blocksparse.py).  onehot_exclude: image names that must
        NOT build in one-hot row mode (schur_dense needs row tables to
        eliminate an image)."""
        concrete = not any(
            isinstance(v, jax.core.Tracer) for v in jax.tree_util.tree_leaves(inputs)
        )
        blk_dom = self.con_block[0] if self.con_block is not None else None
        if concrete:
            # host-side (numpy) preparation + one upload per array: zero
            # eager device compiles at init.  Slots/bounds depending on
            # the BLOCKED contracted domain are not materialized (the
            # whole point of blocking); the scan gathers them per block.
            def np_img(im):
                a = np.asarray(inputs[im.name], dtype=np.float64)
                return a.reshape(tuple(d.size for d in im.dims) + (im.channels,))

            cvals = [
                None if blk_dom in s.dep_cons else
                jnp.asarray(self._gather_const_np(s, np_img(s.image), inputs),
                            dtype=self.dtype)
                for s in self.cslots
            ]
            bpairs = []
            for b in self.col.bounds.values():
                deps = self._comp_deps(b.comps)
                if blk_dom in deps:
                    bpairs.append((None, deps))
                    continue
                v, d = self._bounds_value(b, inputs, use_np=True)
                bpairs.append((jnp.asarray(v, dtype=self.dtype), d))
            ipairs = []
            for v_ in self.col.ivals.values():
                deps = self._comp_deps((v_.comp,))
                if blk_dom in deps:
                    ipairs.append((None, deps))
                    continue
                v, d = self._ival_value(v_, inputs, use_np=True)
                ipairs.append((jnp.asarray(v, dtype=self.dtype), d))
        else:
            cvals = [
                None if blk_dom in s.dep_cons else
                self._gather(s, self._image_array(s.image, inputs), inputs)
                for s in self.cslots
            ]
            bpairs = [
                ((None, self._comp_deps(b.comps))
                 if blk_dom in self._comp_deps(b.comps)
                 else self._bounds_value(b, inputs))
                for b in self.col.bounds.values()]
            ipairs = [
                ((None, self._comp_deps((v.comp,)))
                 if blk_dom in self._comp_deps((v.comp,))
                 else self._ival_value(v, inputs))
                for v in self.col.ivals.values()]
        params = {
            p.name: jnp.asarray(inputs[p.name], dtype=self.dtype)
            for p in self.col.params.values()
        }
        simgs = {}
        for name, simg in self.col.sampled.items():
            arrs = [self._image_array(simg.image, inputs)] + [
                self._image_array(d, inputs) for d in simg.derivs
            ]
            simgs[name] = arrs
        stables = {}
        # Experimental scatter-free segment sum (ops/segsum.py).  Measured
        # on TPU v5e (261k rows -> 65k segments, C=3): XLA scatter-add
        # ~3.5 ms, destination-tiled one-hot (XLA einsum) ~3.9 ms, Pallas
        # VMEM one-hot ~4.4 ms — the permute gather of tiny rows dominates
        # every scatter-free formulation, so XLA's native scatter stays
        # the default.  Opt in with THALLO_SEGSUM=tiled to experiment.
        import os as _os

        use_tiled = _os.environ.get("THALLO_SEGSUM") == "tiled"
        if concrete and use_tiled:
            from .ops.segsum import build_plan

            for i, slot in enumerate(self.uslots):
                if self._roll_plan(slot) is not None:
                    continue
                S = int(np.prod([d.size for d in slot.image.dims]))
                flat = np.asarray(self._slot_flat_indices(slot, inputs)).reshape(-1)
                t = build_plan(flat, S)
                if t is not None:
                    stables[i] = t
        bsr = None
        if want_bsr and concrete:
            from .solver.blocksparse import build_group_bsr

            bsr = build_group_bsr(self, inputs, self.dtype,
                                  onehot_exclude=onehot_exclude)
        # structured-index slot plans (ops/structured.py): when a graph
        # slot's concrete flat indices are piecewise-affine (grid meshes),
        # the channel-major gather lowers to windowed slices with zero
        # per-index cost.  Static (ride the consts pytree as aux data, so
        # a graph change retraces).
        affine = [None] * len(self.uslots)
        if concrete and structured.enabled() and not self.con_domains:
            for i, slot in enumerate(self.uslots):
                if slot.dep_cons or self._roll_plan(slot) is not None:
                    continue  # fiber slots / stencils (rolls already win)
                S = int(np.prod([d.size for d in slot.image.dims]))
                flat = np.asarray(
                    self._slot_flat_indices(slot, inputs, use_np=True)
                ).reshape(-1)
                affine[i] = structured.slot_gather_plan(flat, S)
        # dep-domain tuples are STATIC per lowering (they derive from the
        # expressions, not the data); keeping them out of the consts dict
        # keeps every prep leaf a jax array (prep rides through jit)
        self._bdeps_static = tuple(d for _, d in bpairs)
        self._ideps_static = tuple(d for _, d in ipairs)
        return {
            "bsr": bsr,
            "cvals": cvals,
            "barrs": [v for v, _ in bpairs],
            "iarrs": [v for v, _ in ipairs],
            "params": params,
            "simgs": simgs,
            "stables": stables,
            "affine": structured.Static(tuple(affine)),
        }

    # -- the local function -------------------------------------------------
    def _place_in_con(self, val, dep_cons, con_sizes=None):
        """Reshape a value over [*dep_con_shape] to full con rank with 1s at
        non-dependent positions (row-major insert of singleton axes).
        con_sizes overrides the con-domain extents (contraction
        blocking: the blocked domain runs at its block width)."""
        ncon = len(self.con_domains)
        if ncon == 0:
            return val
        sizes = con_sizes or tuple(d.dim.size for d in self.con_domains)
        pos = {self.con_domains.index(d) for d in dep_cons}
        shape = tuple(sizes[a] if a in pos else 1 for a in range(ncon))
        return jnp.reshape(val, shape)

    def _make_local_fn(self):
        return self._build_local_fn()

    def _reduction_nodes(self):
        """Deterministic list of distinct Reduction nodes across exprs."""
        seen = {}
        out = []

        def walk(e):
            if id(e) in seen:
                return
            seen[id(e)] = True
            if isinstance(e, Reduction):
                out.append(e)
                walk(e.arg)
            elif isinstance(e, Apply):
                for a in e.args:
                    walk(a)

        for e in self.exprs:
            walk(e)
        return out

    def _build_local_fn(self, con_sizes=None, mode="full"):
        """The per-point evaluator.  mode:
          "full"  — evaluate exprs over the full contraction space;
          "inner" — evaluate only the Reduction subtrees over a BLOCK of
                    the contraction space (con_sizes carries the block
                    width) and return their partial sums [nRN];
          "outer" — evaluate exprs with Reduction values injected as a
                    leading [nRN] argument (contraction blocking:
                    reference split / in-register contraction,
                    thallo.t:5678-5727,5821-5884)."""
        ops = _make_ops(self.dtype)
        ukeys = {s.key: i for i, s in enumerate(self.uslots)}
        ckeys = {s.key: i for i, s in enumerate(self.cslots)}
        bkeys = {k: i for i, k in enumerate(self.col.bounds.keys())}
        ikeys = {k: i for i, k in enumerate(self.col.ivals.keys())}
        con_domains = self.con_domains
        con_shape = con_sizes or self.con_shape
        exprs = self.exprs
        rnodes = self._reduction_nodes() if mode in ("inner", "outer") else []
        rindex = {id(rn): k for k, rn in enumerate(rnodes)}

        mkeys = {s.key: i for i, s in enumerate(self.mslots)}

        def F(*args):
            if mode == "outer":
                red = args[0]
                args = args[1:]
            (uvals, mvals, cvals, bvals, ivals, bdeps, ideps, params,
             simgs) = args
            cache = {}

            def ev(e: Exp):
                r = cache.get(id(e))
                if r is not None:
                    return r
                if isinstance(e, Const):
                    r = jnp.asarray(e.value, dtype=self.dtype)
                elif isinstance(e, Apply):
                    r = ops[e.op](*[ev(a) for a in e.args])
                elif isinstance(e, Reduction):
                    if mode == "outer":
                        r = jnp.reshape(red[rindex[id(e)]],
                                        (1,) * len(con_domains))
                    else:
                        v = ev(e.arg)
                        axes = tuple(con_domains.index(d) for d in e.domains)
                        if jnp.ndim(v) < len(con_domains):
                            v = jnp.reshape(v, (1,) * len(con_domains))
                        # expand only the axes being reduced to full size
                        tgt = tuple(
                            con_shape[a] if a in axes else v.shape[a]
                            for a in range(len(con_domains))
                        )
                        v = jnp.broadcast_to(v, tgt)
                        r = jnp.sum(v, axis=axes, keepdims=True)
                elif isinstance(e, ImageAccess):
                    k = (id(e.image), e.comps)
                    if e.image.kind == "unknown":
                        i = ukeys[k]
                        r = self._place_in_con(uvals[i][..., e.channel], self.uslots[i].dep_cons, con_shape)
                    elif e.image.kind == "computed":
                        i = mkeys[k]
                        r = self._place_in_con(mvals[i][..., e.channel], self.mslots[i].dep_cons, con_shape)
                    else:
                        i = ckeys[k]
                        r = self._place_in_con(cvals[i][..., e.channel], self.cslots[i].dep_cons, con_shape)
                elif isinstance(e, BoundsAccess):
                    i = bkeys[("bounds", e.comps, e.dims, e.expand)]
                    r = self._place_in_con(bvals[i], bdeps[i], con_shape)
                elif isinstance(e, IndexValue):
                    i = ikeys[("ival", e.comp)]
                    r = self._place_in_con(ivals[i], ideps[i], con_shape)
                elif isinstance(e, ParamValue):
                    r = params[e.param.name]
                elif isinstance(e, SampleAccess):
                    coords = [ev(c) for c in e.coords]
                    simg = e.sampled
                    imgs = simgs[simg.name]
                    if getattr(simg, "is_array", False):
                        if getattr(simg, "conditional", False):
                            from .ops.sampling import conditional_array_sample

                            val = conditional_array_sample(imgs[0], *coords)
                        else:
                            val = array_bilinear_sample(imgs[0], *coords)
                    elif simg.derivs:
                        val = sample_with_deriv_images(
                            imgs[0], imgs[1], imgs[2], coords[0], coords[1]
                        )
                    else:
                        val = bilinear_sample(imgs[0], *coords)
                    r = val[..., e.channel]
                else:
                    raise TypeError(f"unhandled node {e!r}")
                cache[id(e)] = r
                return r

            if mode == "inner":
                parts = []
                for rn in rnodes:
                    v = ev(rn)  # partial sum over this BLOCK
                    parts.append(jnp.reshape(v, ()))
                return jnp.stack(parts)
            outs = []
            for e in exprs:
                v = jnp.asarray(ev(e))
                if v.ndim:
                    if v.size != 1:
                        raise ValueError(
                            f"residual '{self.name}' still depends on contracted "
                            f"domains after reduction (shape {v.shape}); wrap the "
                            "contracted part in Sum(...)"
                        )
                    v = v.reshape(())
                outs.append(v)
            return jnp.stack(outs)

        return F

    # -- materialized computed arrays ----------------------------------------
    @property
    def has_materialized(self):
        return bool(self.mslots)

    def ca_values(self, X, inputs):
        """Value arrays of all materialized computed arrays, computed from
        the CURRENT unknowns (differentiable: jvp/vjp flow through the
        gather, replacing the reference's explicit gradient images,
        thallo.t:1777-1822)."""
        out = {}
        for name, (im, sub, perm) in self.computed_groups.items():
            consts = sub.prepared_consts(inputs)
            uvals = sub.gather_all(X, inputs)
            r = sub.residuals_from_slots(uvals, consts)  # [R, C]
            arr = r.reshape(sub.ext_shape + (im.channels,))
            arr = jnp.transpose(arr, tuple(perm) + (len(perm),))
            out[name] = arr
        return out

    def gather_mslots(self, cavals, inputs):
        return [self._gather(slot, cavals[slot.image.name], inputs) for slot in self.mslots]

    def _ca_vals_and_grads(self, X, inputs):
        """CA value arrays AND gradient arrays from one sub-group
        linearization each (the reference materializes both as images:
        the CA and its auto-generated gradient image, thallo.t:1777-1822).
        Gradient arrays are [*ca_dims, Cca*C_k] per sub unknown slot, in
        the CA's declared domain order."""
        cav, grads = {}, {}
        for name, (im, sub, perm) in self.computed_groups.items():
            r_sub, jac_sub = sub.point_jacobians(X, inputs)
            nd = len(perm)
            arr = r_sub.reshape(sub.ext_shape + (im.channels,))
            cav[name] = jnp.transpose(arr, tuple(perm) + (nd,))
            gs = []
            for jk in jac_sub:
                Ck = jk.shape[-1]
                a = jk.reshape(sub.ext_shape + (im.channels, Ck))
                a = jnp.transpose(a, tuple(perm) + (nd, nd + 1))
                gs.append(a.reshape(cav[name].shape[:-1] + (im.channels * Ck,)))
            grads[name] = gs
        return cav, grads

    # -- jac slots: the accesses the per-point Jacobian decomposes over ------
    @property
    def jac_slots(self) -> List[SlotSpec]:
        """Direct unknown slots plus, for groups with materialized
        computed arrays, one COMPOSED slot per (CA access, CA unknown
        slot) pair.  Aligned with point_jacobians' jacs list; all
        scatter/gather/index machinery accepts these like direct slots."""
        if self.mslots and self.ca_jac_ok:
            return list(self.uslots) + [cs for cs, _, _ in self.comp_slots]
        return list(self.uslots)

    @staticmethod
    def _apply_roll(v, shifts):
        for j, off in enumerate(shifts):
            if off:
                v = jnp.roll(v, -off, axis=j)
        return v

    def gather_mask(self, slot: SlotSpec, masks, inputs) -> jnp.ndarray:
        """Channelless mask gather aligned with `slot`: [R, *dep] floats.
        Masks are stored [*dims] (no channel axis — a [*dims, 1] buffer
        pads its trailing dim onto 128 lanes); rolls stay rolls, general
        slots use a 1-D flat take (1-D outputs don't tile-pad)."""
        mask = masks[slot.image.name]
        rp = self._roll_plan(slot)
        if rp is not None:
            used, shifts = rp
            v = self._place_axes(self._apply_roll(mask, shifts)[..., None], used, 1)
            return v.reshape(self.R)
        flat = self._slot_flat_indices(slot, inputs)
        m = mask.reshape(-1).at[flat.reshape(-1)].get(mode="promise_in_bounds")
        dep_shape = tuple(d.dim.size for d in slot.dep_cons)
        return m.reshape((self.R,) + dep_shape)

    def _use_rev_mode(self, total_channels: int) -> bool:
        """Forward mode costs one tangent pass per unknown/CA channel;
        reverse one (~2x-priced) cotangent pass per residual channel.
        THALLO_JAC_MODE=fwd/rev overrides for measurement."""
        mode = os.environ.get("THALLO_JAC_MODE", "auto")
        if mode == "auto":
            return 2 * self.rc < total_channels
        return mode == "rev"

    def gather_jac_slot(self, j: int, arrs, inputs, consts=None):
        slot = self.jac_slots[j]
        stable = None
        if consts is not None and j < len(self.uslots):
            stable = consts.get("stables", {}).get(j)
        return self._gather(slot, arrs[slot.image.name], inputs, stable,
                            plan=self._affine_plan(consts, j))

    def scatter_jac_slot(self, j: int, vals, inputs, consts=None):
        slot = self.jac_slots[j]
        stable = None
        if consts is not None and j < len(self.uslots):
            stable = consts.get("stables", {}).get(j)
        return self._scatter(slot, vals, inputs, stable,
                             plan=self._affine_plan(consts, j))

    def jac_slot_flat_indices(self, j: int, inputs, use_np=False):
        slot = self.jac_slots[j]
        flat = self._slot_flat_indices(slot, inputs, use_np=use_np)
        dep_shape = tuple(d.dim.size for d in slot.dep_cons)
        return flat.reshape((self.R,) + dep_shape)

    # -- solver-facing entry points ------------------------------------------
    def slot_flat_indices(self, i: int, inputs):
        """Flat element indices into slot i's image for every grid point:
        [R, *dep_con_shape] int32 (used for dense/sparse J assembly —
        the analog of the reference's generateDumpJ CSR column indices,
        gauss_newton.t:325-488)."""
        slot = self.uslots[i]
        flat = self._slot_flat_indices(slot, inputs)
        dep_shape = tuple(d.dim.size for d in slot.dep_cons)
        return flat.reshape((self.R,) + dep_shape)

    def gather_all(self, X, inputs, consts=None):
        return [self.gather_slot(i, X, inputs, consts) for i in range(len(self.uslots))]

    def _vmapped(self, fn, uvals, consts, mvals=None):
        bdeps, ideps = self._bdeps_static, self._ideps_static
        params, simgs = consts["params"], consts["simgs"]
        mvals = mvals if mvals is not None else []

        def point(u, m, c, b, iv):
            return fn(u, m, c, b, iv, bdeps, ideps, params, simgs)

        return jax.vmap(point, in_axes=(0, 0, 0, 0, 0))(
            uvals, mvals, consts["cvals"], consts["barrs"], consts["iarrs"]
        )

    # -- channel-major fast path (graph groups) ------------------------------
    # TPU tiles the LAST TWO dims of every buffer onto (8,128) lanes, so a
    # row-major gathered slot [R, C] is physically [R, 8ceil, 128] — and,
    # worse, gathering rows from a [N, C] image reads one full 4 KB tile
    # per row (measured: a bare 250k-observation BA residual evaluation
    # cost 5.4 ms, ~100x its logical traffic).  For pure graph groups
    # (exactly the shapes build_group_bsr accepts: no contractions, no
    # fiber slots, no roll plans) the whole per-point pipeline can run
    # CHANNEL-MAJOR instead: minor-axis gathers produce [C, R], the SAME
    # local fn is vmapped over axis 1, and both AD passes then read and
    # write only [*, R] buffers whose padding is the small sublane axis.
    def gather_slot_cm(self, slot: SlotSpec, img, inputs) -> jnp.ndarray:
        """[C, R] minor-axis gather (no (8,128)-tile read amplification);
        small sources go through the one-hot MXU gather instead of paying
        the per-index floor (ops/segsum.minor_gather_onehot)."""
        C = img.shape[-1]
        flat = self._slot_flat_indices(slot, inputs).reshape(-1)
        srcT = img.reshape(-1, C).T  # [C, N] — tiny relayout of the image
        return self._minor_gather(srcT, flat)

    @staticmethod
    def _minor_gather(cat, flat):
        from .ops.segsum import ONEHOT_MAX_SEGMENTS, minor_gather_onehot

        S = cat.shape[1]
        if S <= ONEHOT_MAX_SEGMENTS and flat.size > 4 * S:
            return minor_gather_onehot(cat, flat, S)
        return cat.at[:, flat].get(mode="promise_in_bounds")

    def gather_all_cm(self, X, inputs, consts=None):
        """All unknown slots, channel-major, with same-index slots SHARING
        one gather: gathers cost ~8 cycles PER INDEX independent of row
        width (PERF.md), so slots whose symbolic index and source extent
        coincide (e.g. ARAP's P(v0) and Angle(v0)) concatenate their
        channel-major sources and pay the index cost once.  Slots whose
        concrete indices are piecewise-affine (grid meshes) skip the
        gather entirely: windowed slices via the structured plan computed
        in prepared_consts (ops/structured.py)."""
        plans = None
        if consts is not None and "affine" in consts:
            plans = consts["affine"].value
        groups: Dict[tuple, list] = {}
        for i, s in enumerate(self.uslots):
            key = (tuple(d.size for d in s.image.dims), s.comps)
            groups.setdefault(key, []).append(i)
        out: List = [None] * len(self.uslots)
        for idxs in groups.values():
            plan = plans[idxs[0]] if plans is not None else None
            if len(idxs) == 1:
                i = idxs[0]
                s = self.uslots[i]
                if plan is not None:
                    srcT = X[s.image.name].reshape(-1, s.image.channels).T
                    v = structured.apply_slot_plan_minor(srcT, plan)
                    if v is not None:
                        out[i] = v
                        continue
                out[i] = self.gather_slot_cm(s, X[s.image.name], inputs)
                continue
            s0 = self.uslots[idxs[0]]
            cat = jnp.concatenate(
                [
                    X[self.uslots[i].image.name]
                    .reshape(-1, self.uslots[i].image.channels)
                    .T
                    for i in idxs
                ],
                axis=0,
            )  # [sum C_i, N]
            g = None
            if plan is not None:
                g = structured.apply_slot_plan_minor(cat, plan)
            if g is None:
                flat = self._slot_flat_indices(s0, inputs).reshape(-1)
                g = self._minor_gather(cat, flat)
            off = 0
            for i in idxs:
                C = self.uslots[i].image.channels
                out[i] = g[off:off + C]
                off += C
        return out

    def _vmapped_cm(self, fn, uvalsT, consts):
        bdeps, ideps = self._bdeps_static, self._ideps_static
        params, simgs = consts["params"], consts["simgs"]

        def point(u, c, b, iv):
            return fn(u, [], c, b, iv, bdeps, ideps, params, simgs)

        # unknown slots batch over their LAST axis; per-point const arrays
        # stay row-major (they are read once, not differentiated through)
        return jax.vmap(point, in_axes=(1, 0, 0, 0), out_axes=1)(
            uvalsT, consts["cvals"], consts["barrs"], consts["iarrs"]
        )

    @property
    def supports_cm(self) -> bool:
        """Pure graph group: the channel-major pipeline applies (no
        materialized CAs, contractions, fiber slots, or roll-plan slots
        — the same shapes build_group_bsr accepts)."""
        return (not self.mslots and not self.con_domains
                and all(not s.dep_cons for s in self.uslots)
                and not any(self._roll_plan(s) is not None for s in self.uslots))

    def residuals_cm(self, X, inputs, consts=None):
        """r(U): [rc, R] channel-major."""
        consts = consts if consts is not None else self.prepared_consts(inputs)
        uvalsT = self.gather_all_cm(X, inputs, consts)
        return self._vmapped_cm(self._F, uvalsT, consts)

    def point_jacobians_cm(self, X, inputs, consts=None):
        """(r [rc, R], jacsT list of [rc, C_i, R]) — the channel-major
        twin of point_jacobians for groups without materialized computed
        arrays, contractions or fiber slots.  Same fwd/rev AD-mode choice."""
        consts = consts if consts is not None else self.prepared_consts(inputs)
        uvalsT = self.gather_all_cm(X, inputs, consts)
        f = lambda uv: self._vmapped_cm(self._F, uv, consts)  # noqa: E731
        use_rev = self._use_rev_mode(sum(s.image.channels for s in self.uslots))
        if use_rev:
            r, vjp_fn = jax.vjp(f, uvalsT)
            rows = []
            for c in range(self.rc):
                ct = jnp.zeros_like(r).at[c].set(1.0)
                rows.append(vjp_fn(ct)[0])  # list of [C_i, R]
            jacsT = [
                jnp.stack([rows[c][i] for c in range(self.rc)], axis=0)
                for i in range(len(self.uslots))
            ]
        else:
            r, lin = jax.linearize(f, uvalsT)
            jacsT = []
            for i, slot in enumerate(self.uslots):
                cols = []
                for c in range(slot.image.channels):
                    t = [jnp.zeros_like(v) for v in uvalsT]
                    t[i] = t[i].at[c].set(1.0)
                    cols.append(lin(t))  # [rc, R]
                jacsT.append(jnp.stack(cols, axis=1))  # [rc, C, R]
        return r, jacsT

    def residuals(self, X, inputs, consts=None):
        """r(U): [R, rc]"""
        consts = consts if consts is not None else self.prepared_consts(inputs)
        if self.con_block is not None:
            return self._residuals_blocked(X, inputs, consts)
        uvals = self.gather_all(X, inputs, consts)
        mvals = None
        if self.mslots:
            mvals = self.gather_mslots(self.ca_values(X, inputs), inputs)
        return self._vmapped(self._F, uvals, consts, mvals)

    def residuals_from_slots(self, uvals, consts):
        return self._vmapped(self._F, uvals, consts)

    def point_jacobians(self, X, inputs, consts=None):
        """(r [R, rc], jacs list of [R, rc, *dep_con_shape, C]).

        The analog of the reference's symbolic per-residual partials
        (createjtfResidualwise, thallo.t:3867-3909) — computed numerically.
        When every unknown slot is pointwise (no contraction fibers), uses
        forward mode: one jvp of the whole-field residual function per slot
        channel (XLA shares the forward trace across tangents — measured
        much faster than vmap(jacrev) on TPU).  Falls back to
        vmap(jacrev) for fiber slots.

        Groups with materialized computed arrays return jacs aligned with
        jac_slots: direct-slot jacobians followed by composed-slot chain
        products dr/dCA . dCA/du_k (CA gradient arrays, the analog of the
        reference's gradient images, thallo.t:1777-1822)."""
        if self.con_block is not None:
            raise RuntimeError(
                f"group {self.name!r} runs with blocked contractions "
                f"(split over {self.con_block[0].dim.name}, block "
                f"{self.con_block[1]}): per-point jacobians would "
                "materialize the full fiber; use blocked_jtf_diag / "
                "jvp-vjp of residuals instead")
        if self.mslots:
            if self.ca_jac_ok:
                return self._point_jacobians_fwd(X, inputs, consts)
            raise RuntimeError(
                "point_jacobians on a group whose materialized computed "
                "arrays have contraction fibers; use the force-inlined "
                "twin group"
            )
        if all(not s.dep_cons for s in self.uslots):
            return self._point_jacobians_fwd(X, inputs, consts)
        return self._point_jacobians_rev(X, inputs, consts)

    def _point_jacobians_fwd(self, X, inputs, consts=None):
        consts = consts if consts is not None else self.prepared_consts(inputs)
        uvals = self.gather_all(X, inputs)
        if self.mslots:
            cav, grads = self._ca_vals_and_grads(X, inputs)
            mvals = self.gather_mslots(cav, inputs)
        else:
            mvals = []
        f = lambda uv, mv: self._vmapped(self._F, uv, consts, mv)  # noqa: E731

        # AD-mode choice (the reference gets this for free from symbolic
        # AD; here it is pass count): forward costs one tangent pass per
        # unknown/CA channel, reverse one (~2x-priced) cotangent pass per
        # residual channel.  Bundle adjustment (rc=2, 12 unknown channels)
        # is the canonical reverse winner — measured 8.0 -> 6.5 ms per
        # LM step at 32k observations (PERF.md).
        use_rev = self._use_rev_mode(
            sum(s.image.channels for s in self.uslots)
            + sum(s.image.channels for s in self.mslots)
        )
        if use_rev:
            r, vjp_fn = jax.vjp(f, uvals, mvals)
            rows = []
            for c in range(self.rc):
                ct = jnp.zeros_like(r).at[..., c].set(1.0)
                rows.append(vjp_fn(ct))  # (uvals_bar, mvals_bar)
            jacs = [
                jnp.stack([rows[c][0][i] for c in range(self.rc)], axis=1)
                for i in range(len(self.uslots))
            ]  # [R, rc, C]
            dr_dm = [
                jnp.stack([rows[c][1][m] for c in range(self.rc)], axis=1)
                for m in range(len(self.mslots))
            ]
        else:
            r, lin = jax.linearize(f, uvals, mvals)

            def basis(vals, i, c):
                t = [jnp.zeros_like(v) for v in vals]
                t[i] = t[i].at[..., c].set(1.0)
                return t

            zeros = lambda vals: [jnp.zeros_like(v) for v in vals]  # noqa: E731
            jacs = []
            for i, slot in enumerate(self.uslots):
                cols = [
                    lin(basis(uvals, i, c), zeros(mvals))
                    for c in range(slot.image.channels)
                ]
                jacs.append(jnp.stack(cols, axis=-1))  # [R, rc, C]
            dr_dm = []
            for m, slot in enumerate(self.mslots):
                cols = [
                    lin(zeros(uvals), basis(mvals, m, c))
                    for c in range(slot.image.channels)
                ]
                dr_dm.append(jnp.stack(cols, axis=-1))  # [R, rc, Cca]
        if self.mslots:
            for cs, mi, k in self.comp_slots:
                mslot = self.mslots[mi]
                Cca = mslot.image.channels
                g_img = grads[mslot.image.name][k]  # [*ca_dims, Cca*Ck]
                g_at = self._gather(mslot, g_img, inputs)  # [R, Cca*Ck]
                Ck = g_img.shape[-1] // Cca
                g_at = g_at.reshape(-1, Cca, Ck)
                # chain product as broadcast-multiply-sum (not einsum):
                # XLA pads batched tiny dots onto the MXU (PERF.md)
                jacs.append(
                    jnp.sum(dr_dm[mi][:, :, :, None] * g_at[:, None, :, :], axis=2)
                )
        return r, jacs

    def _point_jacobians_rev(self, X, inputs, consts=None):
        """vmap(jacrev) of the local function (general path)."""
        if self.mslots:
            raise RuntimeError(
                "point_jacobians on a group with materialized computed "
                "arrays; use the force-inlined twin group"
            )
        consts = consts if consts is not None else self.prepared_consts(inputs)
        uvals = self.gather_all(X, inputs)
        bdeps, ideps = self._bdeps_static, self._ideps_static
        params, simgs = consts["params"], consts["simgs"]

        def point(u, c, b, iv):
            f = lambda uu: self._F(uu, [], c, b, iv, bdeps, ideps, params, simgs)  # noqa: E731
            return f(u), jax.jacrev(f)(u)

        return jax.vmap(point, in_axes=(0, 0, 0, 0))(
            uvals, consts["cvals"], consts["barrs"], consts["iarrs"]
        )


    # -- contraction blocking (real `split`) --------------------------------
    # The reference iterates contracted domains in-register per thread
    # (thallo.t:5821-5884) and lets split/full_split retile them
    # (thallo.t:5678-5727).  The TPU equivalent: lax.scan over K-blocks of
    # one contracted domain, gathering only a [R, B, ...] fiber slice per
    # step (jax.checkpoint keeps the AD memory at one block).  The
    # expression DAG splits at Reduction boundaries: F_inner evaluates
    # each Sum's BLOCK-PARTIAL value, partials accumulate across the
    # scan, F_outer finishes the (possibly nonlinear) post-reduction
    # expression from the injected sums.
    def _fns_for_block(self, B):
        key = B
        if key not in self._split_fns:
            sizes = tuple(B if d is self.con_block[0] else d.dim.size
                          for d in self.con_domains)
            self._split_fns[key] = (
                self._build_local_fn(con_sizes=sizes, mode="inner"),
                self._build_local_fn(mode="outer"),
                len(self._reduction_nodes()),
            )
        return self._split_fns[key]

    def _ximg(self, X, im):
        return X[im.name].reshape(tuple(d.size for d in im.dims)
                                  + (im.channels,))

    def _blocked_operands(self, X, inputs, consts):
        """Static (block-invariant) operands + a per-block loader.
        Returns (static dict, load(b0) -> (uvals, cvals, bvals, ivals)
        with blocked entries at dom-dependent positions)."""
        dom, B, nblk = self.con_block
        u_static = [
            None if dom in sl.dep_cons else self.gather_slot(i, X, inputs, consts)
            for i, sl in enumerate(self.uslots)
        ]
        c_static = [
            None if dom in sl.dep_cons else consts["cvals"][i]
            for i, sl in enumerate(self.cslots)
        ]
        bdeps, ideps = self._bdeps_static, self._ideps_static
        b_static = [consts["barrs"][i] if dom not in bdeps[i] else None
                    for i in range(len(bdeps))]
        i_static = [consts["iarrs"][i] if dom not in ideps[i] else None
                    for i in range(len(ideps))]
        blist = list(self.col.bounds.values())
        ilist = list(self.col.ivals.values())
        cimgs = {sl.image.name: self._image_array(sl.image, inputs)
                 for sl in self.cslots if dom in sl.dep_cons}

        def load(b0):
            cb = (dom, b0 * B, B)
            uv = [u_static[i] if u_static[i] is not None else
                  self._gather(sl, self._ximg(X, sl.image), inputs,
                               con_block=cb)
                  for i, sl in enumerate(self.uslots)]
            cv = [c_static[i] if c_static[i] is not None else
                  self._gather(sl, cimgs[sl.image.name], inputs,
                               con_block=cb)
                  for i, sl in enumerate(self.cslots)]
            bv = [b_static[i] if b_static[i] is not None else
                  self._bounds_value(blist[i], inputs, con_block=cb)[0]
                  for i in range(len(bdeps))]
            iv = [i_static[i] if i_static[i] is not None else
                  self._ival_value(ilist[i], inputs, con_block=cb)[0]
                  for i in range(len(ideps))]
            return uv, cv, bv, iv

        return u_static, load

    def _blocked_reductions(self, X, inputs, consts):
        """[R, nRN] accumulated Reduction values via the checkpointed
        block scan."""
        dom, B, nblk = self.con_block
        F_in, _, nRN = self._fns_for_block(B)
        bdeps, ideps = self._bdeps_static, self._ideps_static
        params, simgs = consts["params"], consts["simgs"]
        _, load = self._blocked_operands(X, inputs, consts)

        def point(u, c, b, iv):
            return F_in(u, [], c, b, iv, bdeps, ideps, params, simgs)

        def body(carry, b0):
            uv, cv, bv, iv = load(b0)
            part = jax.vmap(point, in_axes=(0, 0, 0, 0))(uv, cv, bv, iv)
            return carry + part, None

        red, _ = jax.lax.scan(
            jax.checkpoint(body),
            jnp.zeros((self.R, len(self._reduction_nodes())), self.dtype),
            jnp.arange(self.con_block[2]),
        )
        return red

    def _outer_eval(self, red, X, inputs, consts):
        """[R, rc] residuals from accumulated reductions + static slots."""
        _, F_out, _ = self._fns_for_block(self.con_block[1])
        bdeps, ideps = self._bdeps_static, self._ideps_static
        params, simgs = consts["params"], consts["simgs"]
        u_static, _ = self._blocked_operands(X, inputs, consts)
        c_static = [None if self.con_block[0] in sl.dep_cons
                    else consts["cvals"][i]
                    for i, sl in enumerate(self.cslots)]
        b_static = [consts["barrs"][i] if self.con_block[0] not in bdeps[i]
                    else None for i in range(len(bdeps))]
        i_static = [consts["iarrs"][i] if self.con_block[0] not in ideps[i]
                    else None for i in range(len(ideps))]

        def point(rd, u, c, b, iv):
            return F_out(rd, u, [], c, b, iv, bdeps, ideps, params, simgs)

        return jax.vmap(point, in_axes=(0, 0, 0, 0, 0))(
            red, u_static, c_static, b_static, i_static)

    def _residuals_blocked(self, X, inputs, consts):
        red = self._blocked_reductions(X, inputs, consts)
        return self._outer_eval(red, X, inputs, consts)

    def blocked_jtf_diag(self, X, inputs, consts):
        """(r [R, rc], mjtf dict, diag dict) with fiber memory bounded by
        one contraction block — the blocked counterpart of
        jtf_and_diag's per-point jacobians (which would materialize
        [R, rc, K, C]).  Derivatives factor through the reduction values:
        J = dF_outer/du + dF_outer/dred . dred/du, where dred/du for
        dom-dependent slots is block-local (computed and consumed inside
        the pass-2 scan) and for static slots accumulates over pass 1."""
        dom, B, nblk = self.con_block
        F_in, F_out, nRN = self._fns_for_block(B)
        bdeps, ideps = self._bdeps_static, self._ideps_static
        params, simgs = consts["params"], consts["simgs"]
        u_static, load = self._blocked_operands(X, inputs, consts)
        dtype = self.dtype
        dom_slots = [i for i, sl in enumerate(self.uslots)
                     if dom in sl.dep_cons]
        stat_slots = [i for i, sl in enumerate(self.uslots)
                      if dom not in sl.dep_cons]

        def point_inner(u_stat, u_dom, c, b, iv):
            uv = [None] * len(self.uslots)
            for k, i in enumerate(stat_slots):
                uv[i] = u_stat[k]
            for k, i in enumerate(dom_slots):
                uv[i] = u_dom[k]
            return F_in(uv, [], c, b, iv, bdeps, ideps, params, simgs)

        def split_u(uv):
            return ([uv[i] for i in stat_slots], [uv[i] for i in dom_slots])

        # ---- pass 1: red + dred/du for static slots --------------------
        dstat0 = [jnp.zeros((self.R, nRN) + u_static[i].shape[1:], dtype)
                  for i in stat_slots]

        def body1(carry, b0):
            red_c, dstat_c = carry
            uv, cv, bv, iv = load(b0)
            us, ud = split_u(uv)

            def f(us_, ud_, c, b, iv_):
                return point_inner(us_, ud_, c, b, iv_)

            part = jax.vmap(f, in_axes=(0, 0, 0, 0, 0))(us, ud, cv, bv, iv)
            if stat_slots:
                dpart = jax.vmap(jax.jacfwd(f, argnums=0),
                                 in_axes=(0, 0, 0, 0, 0))(us, ud, cv, bv, iv)
                dstat_c = [a + b_ for a, b_ in zip(dstat_c, dpart)]
            return (red_c + part, dstat_c), None

        (red, dstat), _ = jax.lax.scan(
            jax.checkpoint(body1),
            (jnp.zeros((self.R, nRN), dtype), dstat0), jnp.arange(nblk))

        # ---- outer: r, dF_outer/dred, dF_outer/du_static ----------------
        c_static = [None if dom in sl.dep_cons else consts["cvals"][i]
                    for i, sl in enumerate(self.cslots)]
        b_static = [consts["barrs"][i] if dom not in bdeps[i] else None
                    for i in range(len(bdeps))]
        i_static = [consts["iarrs"][i] if dom not in ideps[i] else None
                    for i in range(len(ideps))]

        def point_outer(rd, u_stat, c, b, iv):
            uv = [None] * len(self.uslots)
            for k, i in enumerate(stat_slots):
                uv[i] = u_stat[k]
            # dom slots never appear outside reductions (gating)
            return F_out(rd, uv, [], c, b, iv, bdeps, ideps, params, simgs)

        us_full = [u_static[i] for i in stat_slots]
        r = jax.vmap(point_outer, in_axes=(0, 0, 0, 0, 0))(
            red, us_full, c_static, b_static, i_static)
        d_outer = jax.vmap(jax.jacfwd(point_outer, argnums=(0, 1)),
                           in_axes=(0, 0, 0, 0, 0))(
            red, us_full, c_static, b_static, i_static)
        do_dred, do_dstat = d_outer  # [R, rc, nRN], list [R, rc, *dep, C]

        mjtf: Dict[str, jnp.ndarray] = {}
        diag: Dict[str, jnp.ndarray] = {}

        def add(out, name, v):
            out[name] = out.get(name, 0) + v

        # static slots: full J via the chain rule, standard scatter
        for k, i in enumerate(stat_slots):
            sl = self.uslots[i]
            chain = jnp.einsum("pcn,pn...->pc...", do_dred, dstat[k],
                               precision=jax.lax.Precision.HIGHEST)
            J = do_dstat[k] + chain  # [R, rc, *dep, C]
            jtr = jnp.einsum("pc...,pc->p...", J, r,
                             precision=jax.lax.Precision.HIGHEST)
            d2 = jnp.sum(J * J, axis=1)
            add(mjtf, sl.image.name, self._scatter(sl, jtr, inputs))
            add(diag, sl.image.name, self._scatter(sl, d2, inputs))

        # dom slots: block-local jacobians, blocked scatters (pass 2)
        if dom_slots:
            imshapes = [tuple(d.size for d in self.uslots[i].image.dims)
                        + (self.uslots[i].image.channels,)
                        for i in dom_slots]
            acc0 = ([jnp.zeros(sh, dtype) for sh in imshapes],
                    [jnp.zeros(sh, dtype) for sh in imshapes])

            def body2(carry, b0):
                jt_c, d2_c = carry
                uv, cv, bv, iv = load(b0)
                us, ud = split_u(uv)
                dred_dud = jax.vmap(jax.jacrev(point_inner, argnums=1),
                                    in_axes=(0, 0, 0, 0, 0))(
                    us, ud, cv, bv, iv)  # list: [R, nRN, B, *odep, C]
                cb = (dom, b0 * B, B)
                jt_n, d2_n = [], []
                for k, i in enumerate(dom_slots):
                    sl = self.uslots[i]
                    Jb = jnp.einsum("pcn,pn...->pc...", do_dred,
                                    dred_dud[k],
                                    precision=jax.lax.Precision.HIGHEST)
                    jtr = jnp.einsum("pc...,pc->p...", Jb, r,
                                     precision=jax.lax.Precision.HIGHEST)
                    d2 = jnp.sum(Jb * Jb, axis=1)
                    jt_n.append(jt_c[k] + self._scatter_blocked(
                        sl, jtr, inputs, cb))
                    d2_n.append(d2_c[k] + self._scatter_blocked(
                        sl, d2, inputs, cb))
                return (jt_n, d2_n), None

            (jt_acc, d2_acc), _ = jax.lax.scan(
                jax.checkpoint(body2), acc0, jnp.arange(nblk))
            for k, i in enumerate(dom_slots):
                name = self.uslots[i].image.name
                add(mjtf, name, jt_acc[k])
                add(diag, name, d2_acc[k])
        return r, mjtf, diag

    def _scatter_blocked(self, slot, vals, inputs, con_block):
        """Sum-scatter a BLOCK fiber [R, B, *odep, C] into image shape."""
        im = slot.image
        C = im.channels
        imshape = tuple(d.size for d in im.dims) + (C,)
        flat = self._slot_flat_indices(slot, inputs, con_block=con_block)
        seg = jax.ops.segment_sum(
            vals.reshape(-1, C), flat.reshape(-1),
            num_segments=int(np.prod(imshape[:-1])))
        return seg.reshape(imshape)


def lower_pointwise(exprs: List[Exp], spec, sizes, dtype, name="expr"):
    """Lower standalone expressions (e.g. Exclude guards) over their own
    external domains; returns (group, eval_fn(inputs, X)) producing
    [*ext_shape, rc].  Used for unknown exclusion masks (reference
    fmap.exclude, gauss_newton.t:629-700)."""
    g = LoweredGroup(name, exprs, spec, sizes, dtype)
    if g.con_domains:
        raise ValueError("pointwise expression must not contain contractions")

    def evaluate(inputs, X=None):
        consts = g.prepared_consts(inputs)
        uvals = g.gather_all(X, inputs) if g.uslots else []
        r = g.residuals_from_slots(uvals, consts)
        return r.reshape(g.ext_shape + (g.rc,))

    return g, evaluate
