"""Block-sparse materialized J^T J for graph energies.

The reference materializes sparse J / J^T J through cuSPARSE (dump J to
CSR, csr2csc transpose, csrgemm J^T J, csrmv per PCG step —
/root/reference/API/src/gauss_newton.t:325-488,1331-1526) and scatters
per-edge blocks with warp-aggregated atomics
(creatematerializejtjResidualwise, /root/reference/API/src/
thallo.t:3715-3752; cuda_util.t:334-429).

TPU redesign (no atomics, scatters serialize at ~12 cycles/row — see
PERF.md "the scatter wall"):

* At init (concrete graph available) build, per unknown slot, a
  **degree-padded row table**: perm[N, D] lists the residual points
  touching each unknown element, D = max degree.  This is the reference's
  index-inversion idea (createjtfcentered `residualsincludingX00`,
  thallo.t:3576-3712) as a static gather table.
* Once per nonlinear iteration, assemble every unknown-pair block
  B_ij[e] = J_i[e]^T J_j[e] and row-sort them with ONE wide payload
  gather per row table ([R, F] with F ~ 40-150 channels — wide enough to
  amortize the permute that defeats thin-row formulations, PERF.md).
  Pairs whose row and column indices coincide pointwise pre-aggregate to
  block-diagonal [N, Ci, Cj]; the J^T r and diag(J^T J) setup products
  ride the same gather, so the whole nonlinear setup is scatter-free.
* Each PCG step is then gathers + batched block einsums + a sum over the
  padded degree axis — **zero scatters inside the linear solve**, the
  property the reference gets from materialized J^T J (constant scatter
  count per outer iteration, independent of lIterations).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import structured


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class GroupBsr:
    """Static row/col tables for one lowered group (pytree: index arrays
    are children; the pair wiring is aux data and participates in the jit
    cache key)."""

    # children (device arrays)
    perms: Tuple[jnp.ndarray, ...]       # per row table: [N, D] int32 into [0, R)
    masks: Tuple[jnp.ndarray, ...]       # per row table: [N, D] float (1 = valid)
    cols: Tuple[jnp.ndarray, ...]        # per col table: [D, N] int32 element ids
    # aux (static python data)
    slot_row: Tuple[int, ...]            # slot i -> row table index
    pairs: Tuple[tuple, ...]             # (i, j, "diag") | (i, j, "col", gather_idx)
    col_gathers: Tuple[tuple, ...]       # per gather: (col_table, image_name, C)
    slot_images: Tuple[str, ...]         # slot i -> image name
    slot_channels: Tuple[int, ...]       # slot i -> channel count
    image_shapes: dict                   # image name -> full array shape
    row_dims: Tuple[Tuple[str, ...], ...] = ()  # row table -> image dim names
    col_row: Tuple[int, ...] = ()        # col table -> owning row table
    # structured-index fast path (ops/structured.py): per row table a
    # tuple over d of ColPlan|None lowering the payload row gather to
    # windowed slices; same per col table for the per-PCG-step p gather.
    # Static aux: participates in the jit cache key, so a graph change
    # that alters the plans retraces.
    perm_plans: Tuple[Optional[tuple], ...] = ()
    col_plans: Tuple[Optional[tuple], ...] = ()
    # raw per-row-table index arrays ([R] int32, residual -> unknown
    # element): lets bsr_setup express the jtr/diag row aggregation as a
    # one-hot MXU segment-sum for small-N tables (no gather, no payload
    # transpose) — the setup-side twin of bsr_apply's one-hot col gather.
    idxs: Tuple[Optional[jnp.ndarray], ...] = ()

    def tree_flatten(self):
        children = (self.perms, self.masks, self.cols, self.idxs)
        aux = (self.slot_row, self.pairs, self.col_gathers, self.slot_images,
               tuple(self.slot_channels), tuple(sorted(self.image_shapes.items())),
               self.row_dims, self.col_row, self.perm_plans, self.col_plans)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        perms, masks, cols, idxs = children
        (slot_row, pairs, col_gathers, slot_images, slot_channels, shapes,
         row_dims, col_row, perm_plans, col_plans) = aux
        return cls(perms, masks, cols, slot_row, pairs, col_gathers,
                   slot_images, slot_channels, dict(shapes), row_dims, col_row,
                   perm_plans, col_plans, idxs)


def _plan_cost_ok(plan, N: int) -> bool:
    """Reject windowed plans whose overlap/coverage would cost more than
    the gather they replace (k shifted copies, padded coverage)."""
    _v0, H, L, _b, rs, cs = plan
    if rs < 0:
        return False
    if cs == 1 and H > 1 and rs > 0:
        k = 1 if rs >= L else -(-L // rs)
        if k > 4:
            return False
    return H * L <= 4 * N + 1024


def _seg_keyed_table(idx, N, R, max_waste, max_pad_extra):
    """Try building the row table with columns keyed by affine SEGMENT
    (ops/structured.py) instead of incidence rank: each detected affine
    box of the slot's index array becomes one padded-degree column whose
    perm entries are then themselves affine over the unknown axis — the
    payload gather for that column lowers to windowed slices (zero
    per-index cost).  Returns None when the index array is unstructured
    (falls back to rank keying)."""
    segs = structured.detect_segments_cached(idx) if structured.enabled() else None
    segs = structured.normalize_segments(segs)
    if segs is None:
        return None
    # one padded-degree column per affine segment — except uniform-repeat
    # segments (col_coeff 0: sorted observation maps), which contribute
    # one column per within-run position t so each (unknown, column)
    # pair stays unique.  columns: list of (segment index, t|None).
    columns: List[tuple] = []
    pos = np.empty(R, np.int64)
    for d, (s0, H, W, b, c1, c2) in enumerate(segs):
        span = H * W
        if c2 == 0 and W > 1:
            if H > 1 and c1 == 0:
                return None  # same unknown everywhere: not keyable
            pos[s0:s0 + span] = len(columns) + (
                np.arange(span, dtype=np.int64) % W)
            columns.extend((d, t) for t in range(W))
        else:
            pos[s0:s0 + span] = len(columns)
            columns.append((d, None))
    D = len(columns)
    if D > 32 or N * D > max_waste * R + max_pad_extra:
        return None
    perm = np.zeros((N, D), np.int32)
    mask = np.zeros((N, D), np.float32)
    perm[idx, pos] = np.arange(R, dtype=np.int32)
    mask[idx, pos] = 1.0
    plans = []
    for ci, (d, t) in enumerate(columns):
        s0, H, W, b, c1, c2 = segs[d]
        if t is None:
            plan = (int(b), int(H), int(c1) if H > 1 else int(W), int(s0),
                    int(W), 1)
        else:
            # repeat column t: unknown b + r*c1 -> residual s0 + r*W + t
            plan = (int(b), int(H), int(c1) if H > 1 else 1,
                    int(s0) + int(t), int(W), 0)
        ok = (_plan_cost_ok(plan, N)
              and structured.verify_col_plan(plan, perm[:, ci], mask[:, ci]))
        plans.append(plan if ok else None)
    return {"perm": perm, "mask": mask, "D": D, "segs": segs,
            "columns": tuple(columns), "plans": tuple(plans)}


def _col_plans_for(segs, columns, idx_j, colt, mask, N_src):
    """Affine plans for a column table (idx_j composed through the row
    table): needs idx_j affine over the SAME segment boxes.  Verified
    numerically against the built table on valid lanes."""
    N = colt.shape[0]
    plans = []
    for ci, (d, t) in enumerate(columns):
        s0, H, W, b, c1, _c2 = segs[d]
        if t is None:
            vals = idx_j[s0:s0 + H * W].astype(np.int64).reshape(H, W)
            bj = int(vals[0, 0])
            c2j = int(vals[0, 1] - bj) if W > 1 else 1
            c1j = int(vals[1, 0] - bj) if H > 1 else 0
            expect = (bj + np.arange(H, dtype=np.int64)[:, None] * c1j
                      + np.arange(W, dtype=np.int64)[None, :] * c2j)
            if c2j not in (0, 1) or not np.array_equal(vals, expect):
                plans.append(None)
                continue
            plan = (int(b), int(H), int(c1) if H > 1 else int(W),
                    bj, c1j, c2j)
        else:
            # repeat column t: unknown b + r*c1 <- idx_j[s0 + r*W + t]
            vals = idx_j[s0 + t:s0 + H * W:W].astype(np.int64)
            bj = int(vals[0])
            c1j = int(vals[1] - bj) if H > 1 else 0
            if c1j < 0 or not np.array_equal(
                vals, bj + np.arange(H, dtype=np.int64) * c1j
            ):
                plans.append(None)
                continue
            plan = (int(b), int(H), int(c1) if H > 1 else 1, bj, c1j, 0)
        ok = (_plan_cost_ok(plan, N)
              and structured.verify_col_plan(plan, colt[:, ci], mask[:, ci]))
        plans.append(plan if ok else None)
    return tuple(plans)


def build_group_bsr(group, inputs, dtype, max_waste: float = 4.0,
                    max_pad_extra: int = 1 << 16) -> Optional[GroupBsr]:
    """Build the static tables from concrete sparse maps (host side, once
    per init).  Returns None when the group shape doesn't fit the scheme
    (contractions, fiber slots, pure-stencil groups, pathological degree
    skew) — callers fall back to the J-block path."""
    jslots = group.jac_slots  # direct + CA-composed accesses (lower.py)
    if not jslots or group.con_domains:
        return None
    if group.mslots and not group.ca_jac_ok:
        return None
    if any(s.dep_cons for s in jslots):
        return None
    # pure-stencil groups: roll/inverse-roll scatters are already exact
    # and cheap; materialized blocks would only add traffic
    if all(group._roll_plan(s) is not None for s in jslots):
        return None
    R = group.R
    if R == 0:
        return None

    if any(
        isinstance(v, jax.core.Tracer) for v in jax.tree_util.tree_leaves(inputs)
    ):
        return None
    idxs: List[np.ndarray] = []
    for s in jslots:
        # pure-numpy index evaluation: no eager device ops at init
        flat = group._slot_flat_indices(s, inputs, use_np=True)
        idxs.append(np.asarray(flat).reshape(-1))

    # unique row tables keyed by the index array's bytes
    row_key_of_slot: List[int] = []
    row_tables: List[dict] = []
    key_to_row: Dict[bytes, int] = {}
    padded_total = 0
    for i, s in enumerate(jslots):
        N = int(np.prod([d.size for d in s.image.dims]))
        key = idxs[i].tobytes()
        if key in key_to_row:
            row_key_of_slot.append(key_to_row[key])
            continue
        idx = idxs[i]
        st = _seg_keyed_table(idx, N, R, max_waste, max_pad_extra)
        if st is not None:
            perm, mask, D = st["perm"], st["mask"], st["D"]
            segs, columns, plans = st["segs"], st["columns"], st["plans"]
        else:
            segs, columns, plans = None, None, None
            order = np.argsort(idx, kind="stable").astype(np.int64)
            counts = np.bincount(idx, minlength=N)
            D = max(int(counts.max()), 1)
            if N * D > max_waste * R + max_pad_extra:
                return None  # degree skew would explode the padding
            starts = np.zeros(N + 1, np.int64)
            starts[1:] = np.cumsum(counts)
            sorted_rows = idx[order]
            pos = np.arange(R, dtype=np.int64) - starts[sorted_rows]
            perm = np.zeros((N, D), np.int32)
            mask = np.zeros((N, D), np.float32)
            perm[sorted_rows, pos] = order.astype(np.int32)
            mask[sorted_rows, pos] = 1.0
        padded_total += N * D
        key_to_row[key] = len(row_tables)
        row_key_of_slot.append(len(row_tables))
        row_tables.append({"perm": perm, "mask": mask, "idx": idx, "N": N, "D": D,
                           "dims": tuple(d.name for d in s.image.dims),
                           "segs": segs, "columns": columns,
                           "plans": plans if plans is not None else (None,) * D})
    if padded_total > max_waste * R * len(row_tables) + max_pad_extra:
        return None

    # pair wiring: for each row slot i and col slot j.  Column index
    # tables dedupe by (row table, col index values); column GATHERS
    # dedupe by (col table, gathered image) — two pairs may share a col
    # table while gathering different images (e.g. P(v1)xP(v0) and
    # P(v1)xA(v0) both use v0-through-perm_v1 indices).
    pairs: List[tuple] = []
    col_tables: List[np.ndarray] = []
    col_row_of: List[int] = []
    col_plans_of: List[Optional[tuple]] = []
    col_key: Dict[tuple, int] = {}
    gathers: List[tuple] = []
    gather_key: Dict[tuple, int] = {}
    for i, si in enumerate(jslots):
        t = row_key_of_slot[i]
        rt = row_tables[t]
        N_i = rt["N"]
        for j, sj in enumerate(jslots):
            N_j = int(np.prod([d.size for d in sj.image.dims]))
            if N_i == N_j and np.array_equal(idxs[i], idxs[j]):
                pairs.append((i, j, "diag"))
                continue
            ck = (t, idxs[j].tobytes())
            if ck not in col_key:
                # column element ids aligned to row table t's padded
                # layout, stored [D, N] so every gather keyed by them
                # lands N in the 128-lane dim (see bsr_apply layout note)
                colt = idxs[j][rt["perm"]].astype(np.int32)
                col_key[ck] = len(col_tables)
                col_tables.append(np.ascontiguousarray(colt.T))
                col_row_of.append(t)
                col_plans_of.append(
                    _col_plans_for(rt["segs"], rt["columns"], idxs[j], colt,
                                   rt["mask"], N_j)
                    if rt["segs"] is not None else None)
            gk = (col_key[ck], sj.image.name)
            if gk not in gather_key:
                gather_key[gk] = len(gathers)
                gathers.append((col_key[ck], sj.image.name, sj.image.channels))
            pairs.append((i, j, "col", gather_key[gk]))

    shapes = {}
    for s in jslots:
        shapes[s.image.name] = tuple(d.size for d in s.image.dims) + (s.image.channels,)

    return GroupBsr(
        perms=tuple(jnp.asarray(rt["perm"]) for rt in row_tables),
        masks=tuple(jnp.asarray(rt["mask"], dtype) for rt in row_tables),
        cols=tuple(jnp.asarray(c) for c in col_tables),
        slot_row=tuple(row_key_of_slot),
        pairs=tuple(pairs),
        col_gathers=tuple(gathers),
        slot_images=tuple(s.image.name for s in jslots),
        slot_channels=tuple(s.image.channels for s in jslots),
        image_shapes=shapes,
        row_dims=tuple(rt["dims"] for rt in row_tables),
        col_row=tuple(col_row_of),
        perm_plans=tuple(rt["plans"] for rt in row_tables),
        col_plans=tuple(col_plans_of),
        idxs=tuple(jnp.asarray(rt["idx"], jnp.int32) for rt in row_tables),
    )


def bsr_setup(bsr: GroupBsr, r, jacs, dtype, block_dtype=None,
              channel_major=False):
    """Once per nonlinear iteration: assemble J^T r, diag(J^T J) and all
    unknown-pair blocks, row-sorted, with one wide payload gather per row
    table (scatter-free; replaces creatematerializejtjResidualwise +
    createjtfResidualwise scatters, thallo.t:3715-3752,3867-3909).

    r:    [R, rc]
    jacs: list of [R, rc, C_i] (masked)
    Returns (jtr_images, d2_images, blocks) where jtr/d2 are dicts
    image -> [*imshape] accumulated over this group's slots and blocks is
    {pair_index: [Ci*Cj, N] (diag) | [Ci*Cj*D, N] (cross)}.

    The whole assembly runs CHANNEL-MAJOR ([*, R]/[*, N] buffers, R/N in
    the 128-lane dim): the incoming row-major jac buffers ([R, rc, C] ->
    physically [R, 8, 128]: ~25-57x tile padding) are transposed once at
    entry where XLA fuses the relayout into the jacobian producers, and
    every intermediate after that — J^T r, diag, edge blocks, the wide
    payload, the row-table gather — pads only its small sublane axis
    (the same minor-dim tiling wall bsr_apply hit first; the remaining
    setup cost is the per-index gather floor, profiled in PERF.md's
    "BA 250k-obs setup anatomy").
    """
    nslots = len(bsr.slot_images)

    if channel_major:  # produced natively by point_jacobians_cm
        rT, jTs = r, list(jacs)  # [rc, R], [rc, C, R]
    else:
        rT = r.T  # [rc, R]
        jTs = [jnp.transpose(j, (1, 2, 0)) for j in jacs]  # [rc, C, R]

    # per-slot setup products.  NOTE all block products here and in
    # bsr_apply are broadcast-multiply-sums, NOT einsum/dot_general: XLA
    # lowers batched 3x3-ish dots onto the MXU with 128-lane padding
    # (measured ~7x slower than the VPU elementwise form at 261k rows).
    jtr = [jnp.sum(jTs[i] * rT[:, None, :], axis=0) for i in range(nslots)]  # [C, R]
    d2 = [jnp.sum(jTs[i] * jTs[i], axis=0) for i in range(nslots)]  # [C, R]
    # per-pair edge blocks B_ij = J_i^T J_j  [Ci*Cj, R]
    eblocks = {}
    for p_idx, pr in enumerate(bsr.pairs):
        i, j = pr[0], pr[1]
        Ci, Cj = bsr.slot_channels[i], bsr.slot_channels[j]
        eb = jnp.sum(jTs[i][:, :, None, :] * jTs[j][:, None, :, :], axis=0)
        eblocks[p_idx] = eb.reshape(Ci * Cj, -1)

    # one payload gather per row table
    payload_specs = {t: [] for t in range(len(bsr.perms))}  # t -> [(kind, key, width)]
    payload_parts = {t: [] for t in range(len(bsr.perms))}
    for i in range(nslots):
        t = bsr.slot_row[i]
        C = bsr.slot_channels[i]
        payload_specs[t].append(("jtr", i, C))
        payload_parts[t].append(jtr[i])
        payload_specs[t].append(("d2", i, C))
        payload_parts[t].append(d2[i])
    for p_idx, pr in enumerate(bsr.pairs):
        i, j = pr[0], pr[1]
        t = bsr.slot_row[i]
        Ci, Cj = bsr.slot_channels[i], bsr.slot_channels[j]
        payload_specs[t].append(("pair", p_idx, Ci * Cj))
        payload_parts[t].append(eblocks[p_idx])

    jtr_out: Dict[str, jnp.ndarray] = {}
    d2_out: Dict[str, jnp.ndarray] = {}
    blocks: Dict[int, jnp.ndarray] = {}
    for t in range(len(bsr.perms)):
        if not payload_parts[t]:
            continue
        # ONE relayout to row-major for the row-table gather: the payload
        # is wide (F ~ 40-170), so a row gather moves a near-full tile of
        # useful bytes per index — unlike the thin per-slot gathers the
        # payload exists to batch (PERF.md).  [R, F] pads F only to the
        # next 128 (<2%); the channel-major products above never touch a
        # padded [R, rc, C] buffer.
        payload = jnp.concatenate(payload_parts[t], axis=0).T  # [R, F]
        perm, mask = bsr.perms[t], bsr.masks[t]
        N, D = perm.shape
        F = payload.shape[1]
        plans = bsr.perm_plans[t] if t < len(bsr.perm_plans) else None
        if plans is not None and any(p is not None for p in plans):
            # structured fast path: windowed slices replace the row
            # gather for affine columns (ops/structured.py); invalid
            # lanes read in-range garbage that the mask zeroes.
            # Unplanned columns batch into ONE gather.
            gparts = [None] * D
            for d in range(D):
                if plans[d] is not None:
                    gparts[d] = structured.apply_col_plan_rows(
                        payload, plans[d], N)
            unplanned = [d for d in range(D) if gparts[d] is None]
            if unplanned:
                sub = jnp.take(
                    payload, perm[:, unplanned].reshape(-1), axis=0
                ).reshape(N, len(unplanned), F)
                for k, d in enumerate(unplanned):
                    gparts[d] = sub[:, k]
            g = jnp.stack(
                [gd * mask[:, d][:, None] for d, gd in enumerate(gparts)],
                axis=1)  # [N, D, F]
        else:
            g = jnp.take(payload, perm.reshape(-1), axis=0).reshape(
                N, D, F
            ) * mask[..., None]  # [N, D, F]
        gsum = jnp.sum(g, axis=1)  # [N, F] for the pre-aggregated parts
        off = 0
        for kind, key, width in payload_specs[t]:
            if kind in ("jtr", "d2"):
                i = key
                name = bsr.slot_images[i]
                v = gsum[:, off:off + width].reshape(bsr.image_shapes[name])
                out = jtr_out if kind == "jtr" else d2_out
                out[name] = out.get(name, 0) + v
            else:  # pair
                p_idx = key
                pr = bsr.pairs[p_idx]
                if pr[2] == "diag":
                    # pre-aggregated [Ci*Cj, N]: N-sized, so bf16 saves
                    # nothing — and the block-Jacobi preconditioner is
                    # built from these, so keep them full precision
                    blk = gsum[:, off:off + width].T
                else:
                    blk = jnp.transpose(
                        g[:, :, off:off + width], (2, 1, 0)
                    ).reshape(width * D, N)  # [(ci*Cj+cj)*D+d, n]
                    if block_dtype is not None:
                        # bf16 block STORAGE halves the dominant
                        # per-PCG-step HBM read; products upcast back
                        # (ROADMAP bf16 experiment — J^T r / diag /
                        # setup stay full precision)
                        blk = blk.astype(block_dtype)
                blocks[p_idx] = blk
            off += width
    return jtr_out, d2_out, blocks


def bsr_apply(bsr: GroupBsr, blocks, p):
    """J^T J p for this group from the assembled blocks: gathers + batched
    block matvecs + a padded-degree sum.  NO scatters (the analog of the
    reference's cusparseJTJMatVec / PCGStep1_materializedJTJ,
    gauss_newton.t:554-625,1447-1526).

    Layout discipline (TPU): every buffer this loop touches keeps the
    big axis N LAST (the 128-lane dim) and folds the small channel /
    degree axes into the sublane dim — blocks [Ci*Cj*D, N], gathered
    column operands [Cj, D, N], accumulator [Ci, N], all <2x physical
    padding.  Naive [N,D,Ci,Cj]/[N*D,C] shapes pad their trailing dims
    ~40-110x and measured ~12 ms per 261k-edge PCG iteration end-to-end
    (PERF.md "the minor-dim tiling wall").

    p: unknown pytree.  Returns dict image -> [*imshape] contribution.
    """
    # channel-major views of the operand vectors, once per image
    pT = {}
    for img in set(bsr.slot_images):
        C = p[img].shape[-1]
        pT[img] = p[img].reshape(-1, C).T  # [C, N_img]
    # one [C, D, N] gather per unique (col table, image) — and gathers
    # sharing a col table concatenate their channel-major sources so the
    # ~8-cycle-per-index cost (PERF.md) is paid once per table
    by_table: Dict[tuple, list] = {}
    for gidx, (ct, img, C) in enumerate(bsr.col_gathers):
        # sharing requires equal source extents (same element count)
        by_table.setdefault((ct, pT[img].shape[1]), []).append((gidx, img, C))
    pg = {}
    for (ct, _), entries in by_table.items():
        D, N = bsr.cols[ct].shape
        cat = (pT[entries[0][1]] if len(entries) == 1
               else jnp.concatenate([pT[img] for _, img, _ in entries], axis=0))
        plans = bsr.col_plans[ct] if ct < len(bsr.col_plans) else None
        if plans is not None and any(p is not None for p in plans):
            # structured fast path (ops/structured.py): affine columns
            # read p through windowed slices — zero per-index cost on
            # the PCG-step hot loop; garbage on invalid lanes multiplies
            # zeroed blocks.  Unplanned columns batch into ONE gather.
            gs = [None] * D
            for d in range(D):
                if plans[d] is not None:
                    gs[d] = structured.apply_col_plan_minor(cat, plans[d], N)
            unplanned = [d for d in range(D) if gs[d] is None]
            if unplanned:
                sub = jnp.take(
                    cat, bsr.cols[ct][unplanned].reshape(-1), axis=1
                ).reshape(cat.shape[0], len(unplanned), N)
                for k, d in enumerate(unplanned):
                    gs[d] = sub[:, k]
            g = jnp.stack(gs, axis=1)  # [sum C, D, N]
            off = 0
            for gidx, img, C in entries:
                pg[gidx] = g[off:off + C]
                off += C
            continue
        S_src = cat.shape[1]
        onehot_max = int(os.environ.get("THALLO_ONEHOT_COLS", "512"))
        if 0 < S_src <= onehot_max and D * N > 4 * S_src:
            # small-source gathers as a one-hot MXU matmul.  Measured on
            # TPU v5e (artifacts/tpu_onehot.jsonl, BA 250k obs / 256
            # cameras): marginal PCG iteration 2.73 -> 0.53 ms (5.1x) —
            # XLA fuses the comparison into the matmul operand read, so
            # the per-index gather cost disappears into MXU work that is
            # ~free at these sizes (2*S*C*DN FLOPs ~ 1 GFLOP).  Default
            # threshold 512 source rows; THALLO_ONEHOT_COLS overrides
            # (0 disables) — read at trace time, i.e. plan creation.
            ids = bsr.cols[ct].reshape(-1)
            oh = (ids[None, :] == jnp.arange(S_src)[:, None]).astype(cat.dtype)
            g = jax.lax.dot_general(
                cat, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(cat.dtype)
        else:
            g = jnp.take(cat, bsr.cols[ct].reshape(-1), axis=1)
        off = 0
        for gidx, img, C in entries:
            pg[gidx] = g[off:off + C].reshape(C, D, N)
            off += C
    out: Dict[str, jnp.ndarray] = {}
    acc: Dict[int, jnp.ndarray] = {}  # row slot -> [Ci, N]
    for p_idx, pr in enumerate(bsr.pairs):
        i, j = pr[0], pr[1]
        Ci = bsr.slot_channels[i]
        Cj = bsr.slot_channels[j]
        blk = blocks[p_idx]
        if blk.dtype != p[bsr.slot_images[i]].dtype:
            blk = blk.astype(p[bsr.slot_images[i]].dtype)  # bf16 storage
        if pr[2] == "diag":
            pjT = pT[bsr.slot_images[j]]  # [Cj, N]
            B = blk.reshape(Ci, Cj, -1)  # [Ci, Cj, N]
            contrib = jnp.sum(B * pjT[None, :, :], axis=1)  # [Ci, N]
        else:
            D, N = bsr.cols[bsr.col_gathers[pr[3]][0]].shape
            B = blk.reshape(Ci, Cj, D, N)
            contrib = jnp.sum(B * pg[pr[3]][None], axis=(1, 2))  # [Ci, N]
        acc[i] = acc.get(i, 0) + contrib
    for i, v in acc.items():
        name = bsr.slot_images[i]
        out[name] = out.get(name, 0) + v.T.reshape(bsr.image_shapes[name])
    return out
