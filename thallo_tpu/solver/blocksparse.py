"""Block-sparse materialized J^T J for graph energies.

The reference materializes sparse J / J^T J through cuSPARSE (dump J to
CSR, csr2csc transpose, csrgemm J^T J, csrmv per PCG step —
/root/reference/API/src/gauss_newton.t:325-488,1331-1526) and scatters
per-edge blocks with warp-aggregated atomics
(creatematerializejtjResidualwise, /root/reference/API/src/
thallo.t:3715-3752; cuda_util.t:334-429).  Its index inversion
(createjtfcentered `residualsincludingX00`, thallo.t:3576-3712)
enumerates residuals-per-unknown at ANY degree distribution.

TPU redesign (no atomics, scatters serialize at ~12 cycles/row — see
PERF.md "the scatter wall"):

* At init (concrete graph available) build, per unknown slot, a
  **degree-padded row table**: perm[N, W] lists the residual points
  touching each unknown element.  Degree skew (real BAL scenes are
  power-law) is handled by LEVELS: level 0 is a full [N, W0] table
  covering the first W0 incidences of every element (W0 ~ the 95th
  degree percentile), and each overflow level k covers incidence ranks
  [T_{k-1}, T_k) for only the N_k elements whose degree exceeds
  T_{k-1} — a [N_k, W_k] table with its own element-id selector.
  Padding is bounded per level, so the path never bails on skew (the
  TPU analog of the reference's arbitrary-degree index inversion).
* Slots over SMALL images (BA cameras) skip row tables entirely and
  run **one-hot row mode**: their setup aggregation (J^T r, diag,
  diagonal pair blocks) is an MXU segment-sum — payload [F, R] x
  one-hot [R, N] — which is skew-independent, and their cross J^T J p
  contribution per PCG step is computed from the TRANSPOSE partner's
  blocks (B_ij = B_ji^T): a broadcast multiply over the partner's row
  table plus a one-hot aggregation matmul.  This removes both the
  camera-side payload gather and the per-step large-source column
  gather that set the per-index gather floor at BA 250k/1M obs
  (PERF.md "BA 250k setup anatomy").
* Once per nonlinear iteration, assemble every unknown-pair block
  B_ij[e] = J_i[e]^T J_j[e] and row-sort them with ONE wide payload
  gather per row table ([R, F] with F ~ 40-150 channels — wide enough
  to amortize the permute that defeats thin-row formulations).
* Each PCG step is then gathers + batched block einsums + a sum over
  the padded degree axis — **zero scatters inside the linear solve**
  (overflow levels add one tiny `.at[sel].add` per level over the few
  high-degree elements), the property the reference gets from
  materialized J^T J.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import structured
from ..ops.segsum import dot_oh_exact


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class GroupBsr:
    """Static row/col tables for one lowered group (pytree: index arrays
    are children; the pair wiring is aux data and participates in the jit
    cache key)."""

    # children (device arrays)
    perms: Tuple[jnp.ndarray, ...]       # per row table: [N_t, W_t] int32 into [0, R)
    masks: Tuple[jnp.ndarray, ...]       # per row table: [N_t, W_t] float (1 = valid)
    cols: Tuple[jnp.ndarray, ...]        # per col table: [W_t, N_t] int32 element ids
    # aux (static python data)
    slot_row: Tuple[int, ...]            # slot i -> BASE row table index, or -1
    #                                      for one-hot row mode (small images)
    pairs: Tuple[tuple, ...]             # (i, j, "diag")
    #                                    | (i, j, "col", gather_idx)   per level
    #                                    | (i, j, "transpose", partner_pair_idx)
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
    # row table -> its level-0 base table id (== itself for base tables)
    row_base: Tuple[int, ...] = ()
    # children: per row table, [N_t] int32 element ids covered (None =
    # full image, overflow levels select the high-degree tail); per SLOT,
    # the raw [R] residual->element index array for one-hot row mode
    # (None for table-backed slots)
    row_sels: Tuple[Optional[jnp.ndarray], ...] = ()
    oh_idxs: Tuple[Optional[jnp.ndarray], ...] = ()
    # per row table: [N_t] int32 payload-row START of each element's
    # contiguous incidence run, or None.  Present when the index array is
    # SORTED (natively or via the init-time residual reorder,
    # reorder.py): the payload gather then reads N slices of W contiguous
    # rows instead of N*W scattered rows — per-index cost drops from the
    # incidence count to the element count (PERF.md "the per-index
    # gather floor": indices cost ~8 cycles, gathered bytes are free)
    row_starts: Tuple[Optional[jnp.ndarray], ...] = ()

    def tree_flatten(self):
        children = (self.perms, self.masks, self.cols, self.row_sels,
                    self.oh_idxs, self.row_starts)
        aux = (self.slot_row, self.pairs, self.col_gathers, self.slot_images,
               tuple(self.slot_channels), tuple(sorted(self.image_shapes.items())),
               self.row_dims, self.col_row, self.perm_plans, self.col_plans,
               self.row_base)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        perms, masks, cols, row_sels, oh_idxs, row_starts = children
        (slot_row, pairs, col_gathers, slot_images, slot_channels, shapes,
         row_dims, col_row, perm_plans, col_plans, row_base) = aux
        return cls(perms, masks, cols, slot_row, pairs, col_gathers,
                   slot_images, slot_channels, dict(shapes), row_dims, col_row,
                   perm_plans, col_plans, row_base, row_sels, oh_idxs,
                   row_starts)

    # -- derived wiring (python-side, cheap) --------------------------------
    def levels_of(self, base: int) -> Tuple[int, ...]:
        """All row-table ids sharing this base, base first."""
        return tuple(t for t, b in enumerate(self.row_base) if b == base)

    def slot_onehot(self, i: int) -> bool:
        return self.slot_row[i] < 0


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


def _level_widths(counts: np.ndarray, R: int, max_waste: float,
                  max_pad_extra: int) -> Optional[List[Tuple[int, int]]]:
    """Choose the level boundaries [(rank_start, width), ...] for a
    rank-keyed row table under degree skew.  Level 0 covers every element
    (padding N*W0 bounded by the waste budget); each further level covers
    only the elements whose degree exceeds the cumulative cap, with
    geometrically growing widths, so a power-law tail costs O(log) small
    tables instead of exploding the base table (the reference's index
    inversion is skew-native, thallo.t:3576-3712 — this is its bounded-
    padding TPU counterpart)."""
    N = counts.shape[0]
    Dmax = int(counts.max()) if counts.size else 1
    Dmax = max(Dmax, 1)
    budget = max_waste * R + max_pad_extra
    if N > budget:
        return None  # more elements than the waste budget allows at W0=1
    csort = np.sort(counts)

    def simulate(W0):
        """Geometric levels from a candidate base width; returns
        (levels, total padded entries).  Padded entries are the real
        per-step cost: block reads AND the one-hot routings scale with
        Sum N_t*W_t, not with the incidence count (trace r4: the
        0.95-quantile default padded a 239k-obs skewed scene to 693k
        entries = ~2.9x the per-iteration routing traffic)."""
        levels = [(0, min(W0, Dmax))]
        total = N * levels[0][1]
        T = levels[0][1]
        while T < Dmax:
            n_over = int(N - np.searchsorted(csort, T, side="right"))
            if n_over == 0:
                break
            remaining = int(np.clip(counts - T, 0, None).sum())
            if n_over * (Dmax - T) <= max_waste * remaining + 4096:
                W = Dmax - T  # the tail is cheap to finish in one level
            else:
                W = min(max(1, 3 * T), Dmax - T)
            levels.append((T, W))
            total += n_over * W
            T += W
        return levels, total

    # candidate base widths: powers of two + degree quantiles, padded-
    # entry total decides (bounded by the waste budget)
    qs = [max(1, int(np.ceil(np.quantile(counts, q))))
          for q in (0.5, 0.75, 0.9, 0.95)]
    cands = sorted({*qs, *(1 << k for k in range(0, 11)
                           if (1 << k) <= max(qs[-1] * 2, 2))})
    best = None
    for W0 in cands:
        if N * W0 > budget:
            continue
        levels, total = simulate(W0)
        if total > budget:
            continue
        # each level is extra dispatch: its own gathers, routing dots and
        # overflow .at[sel].add — charge ~16k entries of equivalent cost
        score = total + 16384 * len(levels)
        if best is None or score < best[1]:
            best = (levels, score)
    if best is None:
        return None
    return best[0]


def _rank_keyed_tables(idx: np.ndarray, N: int, R: int, max_waste: float,
                       max_pad_extra: int) -> Optional[List[dict]]:
    """Build the level-bucketed rank-keyed row tables for one index
    array.  Returns a list of dicts (level 0 first; level 0 has sel=None
    = full coverage) or None when even W0=1 exceeds the budget."""
    counts = np.bincount(idx, minlength=N)
    levels = _level_widths(counts, R, max_waste, max_pad_extra)
    if levels is None:
        return None
    order = np.argsort(idx, kind="stable").astype(np.int64)
    starts = np.zeros(N + 1, np.int64)
    starts[1:] = np.cumsum(counts)
    sorted_rows = idx[order]
    pos = np.arange(R, dtype=np.int64) - starts[sorted_rows]
    # sorted index array (natively, or via reorder.py's init-time
    # residual sort): each element's incidences are one CONTIGUOUS run of
    # payload rows, so every level gather lowers to N_t dynamic slices
    is_sorted = bool(np.all(np.diff(idx) >= 0)) if idx.size else False
    out = []
    for li, (T, W) in enumerate(levels):
        if li == 0:
            sel = None
            rowmap = None
            N_t = N
        else:
            selm = counts > T
            sel = np.nonzero(selm)[0].astype(np.int32)
            N_t = sel.shape[0]
            if N_t == 0:
                continue
            rowmap = np.full(N, -1, np.int64)
            rowmap[sel] = np.arange(N_t)
        in_level = (pos >= T) & (pos < T + W)
        rows = sorted_rows[in_level]
        lanes = pos[in_level] - T
        perm = np.zeros((N_t, W), np.int32)
        mask = np.zeros((N_t, W), np.float32)
        r_t = rows if rowmap is None else rowmap[rows]
        perm[r_t, lanes] = order[in_level].astype(np.int32)
        mask[r_t, lanes] = 1.0
        run_start = None
        if is_sorted:
            elems = np.arange(N, dtype=np.int64) if sel is None else sel
            # clamp to R: a start past the end reads only padding rows
            # (mask is all-zero there); payload is padded by W rows so
            # dynamic_slice never clamps/misaligns
            run_start = np.minimum(starts[elems] + T, R).astype(np.int32)
        out.append({"perm": perm, "mask": mask, "sel": sel, "W": W,
                    "start": run_start})
    return out


# one-hot row mode thresholds: a slot over a small image aggregates by
# MXU segment-sum instead of a row table (skew-independent, and removes
# the per-step large-source column gather via transpose-apply).
# THALLO_ONEHOT_ROWS=0 disables; read at build time (plan init).
def _onehot_rows_max() -> int:
    # 1024 covers the 1M-obs BAL camera side; the setup aggregation runs
    # split-3 bf16 (dot_oh_exact) so the F*R*N matmul costs half of what
    # the old HIGHEST path did at the same N
    return int(os.environ.get("THALLO_ONEHOT_ROWS", "1024"))


def build_group_bsr(group, inputs, dtype, max_waste: float = 4.0,
                    max_pad_extra: int = 1 << 16,
                    onehot_exclude=()) -> Optional[GroupBsr]:
    """Build the static tables from concrete sparse maps (host side, once
    per init).  Returns None when the group shape doesn't fit the scheme
    (contractions, fiber slots, pure-stencil groups) — callers fall back
    to the J-block path.  Degree skew never disables the path (levels +
    one-hot row mode, see module docstring)."""
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
    slot_N: List[int] = []
    for s in jslots:
        # pure-numpy index evaluation: no eager device ops at init
        flat = group._slot_flat_indices(s, inputs, use_np=True)
        idxs.append(np.asarray(flat).reshape(-1))
        slot_N.append(int(np.prod([d.size for d in s.image.dims])))
    nslots = len(jslots)

    # one-hot row mode candidates: small element count, residual-heavy.
    # A pair between two one-hot slots with DIFFERENT index arrays has no
    # table to transpose through — demote the larger slot to a table.
    oh_max = _onehot_rows_max()
    onehot = [0 < oh_max and slot_N[i] <= oh_max and R >= 4 * slot_N[i]
              and jslots[i].image.name not in onehot_exclude
              for i in range(nslots)]
    for i in range(nslots):
        for j in range(nslots):
            if i == j or not (onehot[i] and onehot[j]):
                continue
            if slot_N[i] == slot_N[j] and np.array_equal(idxs[i], idxs[j]):
                continue  # diag pair: pure aggregation, no table needed
            # demote the larger (ties: the later slot)
            k = i if slot_N[i] > slot_N[j] else j
            onehot[k] = False

    # transpose-apply eligibility PER PAIR, independent of setup mode:
    # pair (i, j) runs as the transpose of (j, i)'s blocks + a one-hot
    # MXU aggregation whenever slot i's element count is MXU-cheap and j
    # builds a row table.  This matters beyond the one-hot slots: a slot
    # can exceed the one-hot SETUP threshold (the OH setup matmul grows
    # as F*R*N) while the per-step aggregation matmul (C*R*N) stays far
    # cheaper than the R-index column gather it replaces (measured
    # 14.3 ms/iter at BA 1M with table-backed cameras,
    # artifacts/tpu_skew.jsonl — the per-index gather floor).
    # Break-even N ~ 35k/C on v5e.
    tr_max = int(os.environ.get("THALLO_TRANSPOSE_ROWS", "8192"))

    def _transpose_ok(i, j):
        if onehot[i]:
            return True  # no table: transpose is the only cross form
        if slot_N[i] > tr_max or onehot[j]:
            return False
        if jslots[i].image.name in onehot_exclude:
            return False  # schur_dense eliminates through i's blocks
        # one direction must keep materialized blocks for the other to
        # reference: the smaller side transposes (ties: lower slot id)
        return (slot_N[i], i) < (slot_N[j], j)

    # unique row tables keyed by the index array's bytes; each key maps
    # to its BASE (level-0) table id
    row_key_of_slot: List[int] = []
    row_tables: List[dict] = []   # {"perm","mask","sel","dims","segs",...}
    row_base_of: List[int] = []
    key_to_row: Dict[bytes, int] = {}
    for i, s in enumerate(jslots):
        if onehot[i]:
            row_key_of_slot.append(-1)
            continue
        N = slot_N[i]
        key = idxs[i].tobytes()
        if key in key_to_row:
            row_key_of_slot.append(key_to_row[key])
            continue
        idx = idxs[i]
        dims = tuple(d.name for d in s.image.dims)
        st = _seg_keyed_table(idx, N, R, max_waste, max_pad_extra)
        base = len(row_tables)
        if st is not None:
            row_tables.append({
                "perm": st["perm"], "mask": st["mask"], "sel": None,
                "idx": idx, "N": N, "dims": dims, "segs": st["segs"],
                "columns": st["columns"], "plans": st["plans"],
                "start": None})
            row_base_of.append(base)
        else:
            lv = _rank_keyed_tables(idx, N, R, max_waste, max_pad_extra)
            if lv is None:
                return None  # N alone exceeds the budget: tiny-R group
            for t in lv:
                row_tables.append({
                    "perm": t["perm"], "mask": t["mask"], "sel": t["sel"],
                    "idx": idx, "N": N, "dims": dims, "segs": None,
                    "columns": None, "plans": (None,) * t["perm"].shape[1],
                    "start": t["start"]})
                row_base_of.append(base)
        key_to_row[key] = base
        row_key_of_slot.append(base)

    # pair wiring.  Column index tables dedupe by (row table, col index
    # values); column GATHERS dedupe by (col table, gathered image) —
    # two pairs may share a col table while gathering different images.
    pairs: List[tuple] = []
    col_tables: List[np.ndarray] = []
    col_row_of: List[int] = []
    col_plans_of: List[Optional[tuple]] = []
    col_key: Dict[tuple, int] = {}
    gathers: List[tuple] = []
    gather_key: Dict[tuple, int] = {}
    # (row slot j, col slot i) -> pair indices per level, for transpose
    partner_pairs: Dict[Tuple[int, int], List[int]] = {}
    transpose_todo: List[Tuple[int, int]] = []
    for i, si in enumerate(jslots):
        N_i = slot_N[i]
        for j, sj in enumerate(jslots):
            N_j = slot_N[j]
            if N_i == N_j and np.array_equal(idxs[i], idxs[j]):
                pairs.append((i, j, "diag"))
                continue
            if _transpose_ok(i, j):
                transpose_todo.append((i, j))
                continue
            t_base = row_key_of_slot[i]
            plist = []
            for t in (tt for tt, b in enumerate(row_base_of) if b == t_base):
                rt = row_tables[t]
                ck = (t, idxs[j].tobytes())
                if ck not in col_key:
                    # column element ids aligned to row table t's padded
                    # layout, stored [W, N_t] so every gather keyed by
                    # them lands N in the 128-lane dim
                    colt = idxs[j][rt["perm"]].astype(np.int32)
                    col_key[ck] = len(col_tables)
                    col_tables.append(np.ascontiguousarray(colt.T))
                    col_row_of.append(t)
                    col_plans_of.append(
                        _col_plans_for(rt["segs"], rt["columns"], idxs[j],
                                       colt, rt["mask"], N_j)
                        if rt["segs"] is not None else None)
                gk = (col_key[ck], sj.image.name)
                if gk not in gather_key:
                    gather_key[gk] = len(gathers)
                    gathers.append((col_key[ck], sj.image.name,
                                    sj.image.channels))
                plist.append(len(pairs))
                pairs.append((i, j, "col", gather_key[gk]))
            partner_pairs[(i, j)] = plist
    for (i, j) in transpose_todo:
        plist = partner_pairs.get((j, i))
        if not plist:
            # partner also one-hot with a different index array would have
            # been demoted above; this is unreachable, but stay safe
            return None
        for pidx in plist:
            pairs.append((i, j, "transpose", pidx))

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
        row_base=tuple(row_base_of),
        row_sels=tuple(None if rt["sel"] is None else jnp.asarray(rt["sel"])
                       for rt in row_tables),
        oh_idxs=tuple(jnp.asarray(idxs[i], jnp.int32) if onehot[i] else None
                      for i in range(nslots)),
        row_starts=tuple(None if rt["start"] is None
                         else jnp.asarray(rt["start"])
                         for rt in row_tables),
    )


def _full_repeat_table(plans, N_t: int, W: int) -> bool:
    """True when every column d has the repeat ColPlan
    (v0=0, H=N_t, out_row_len=1, src_base=s0+d, src_row_stride=W,
    src_col_stride=0) — i.e. the table is exactly idx[s0 + n*W + d] == n
    for all rows: the whole [N_t, W, F] gather is one contiguous
    reshape of payload[s0 : s0 + N_t*W]."""
    if W < 2 or any(p is None for p in plans):
        return False
    v0, H, L, s0, rs, cs = plans[0]
    if not (v0 == 0 and H == N_t and L == 1 and rs == W and cs == 0):
        return False
    for d, p in enumerate(plans):
        if p != (0, N_t, 1, s0 + d, W, 0):
            return False
    return True


def _routing_dtype(values_dtype):
    """Dtype for the VALUE side of the per-PCG-step one-hot MXU routings
    (column gather of p, transpose-apply aggregation).  On TPU, XLA's
    DEFAULT dot precision already rounds f32 dot operands to bf16 — the
    SETUP aggregations run that way today (trace: the eblock payload
    materializes as bf16 ahead of the one-hot segment-sum and runs 2x
    faster than an f32-fed dot).  The while-body dots miss that demotion
    because p is a loop carry XLA won't re-type, so we apply the same
    contract explicitly: bf16 value side on accelerators, full f32 on
    CPU (tests/oracles).  Measured v5e: each routing dot ~0.47 -> ~0.25
    ms at 250k obs.  THALLO_ROUTING_DTYPE=f32 forces full precision
    everywhere (also the right knob if a TPU solve ever shows
    bf16-routing convergence artifacts)."""
    mode = os.environ.get("THALLO_ROUTING_DTYPE", "auto")
    if mode in ("f32", "float32"):
        return values_dtype
    if mode in ("bf16", "bfloat16"):
        return jnp.bfloat16
    if values_dtype == np.float32 and jax.default_backend() != "cpu":
        return jnp.bfloat16
    return values_dtype


def _routed(values):
    """Cast a one-hot-dot VALUE operand to the routing dtype, behind an
    optimization barrier: without it XLA's algebraic simplifier folds
    the convert back out (the dot has preferred_element_type=f32) and
    the conv emitter feeds f32 — keeping the barrier pins the bf16
    buffer so the MXU runs 2 MACs/cycle (measured 2x on the setup
    aggregation whose producer XLA happened to demote on its own)."""
    rd = _routing_dtype(values.dtype)
    if rd == values.dtype:
        return values
    return jax.lax.optimization_barrier(values.astype(rd))


def _onehot_mat(ids, n, dtype):
    """[len(ids), n] 0/1 matrix; XLA fuses the comparison into the MXU
    operand read, so the 'gather' cost disappears into matmul work
    (measured on v5e: artifacts/tpu_onehot.jsonl)."""
    return (ids[:, None] == jnp.arange(n, dtype=ids.dtype)[None, :]).astype(dtype)


def _onehot3(ids2d, n, dtype):
    """[n, W, N] 0/1 tensor from a [W, N] id table.  Rank-3 so the
    routing dot_generals produce/consume [C, W, N] DIRECTLY: the flat
    [C, W*N] form forces XLA to physically relayout between the dot and
    the block products ([9, 500k] <-> [9, 8, 62.5k] measured 0.3+0.16
    ms per PCG iteration at BA 250k-skew, trace r4) because the (8,128)
    tile split differs; with N kept minor on both sides the reshape
    never exists."""
    return (ids2d[None, :, :] == jnp.arange(n, dtype=ids2d.dtype)[:, None, None]
            ).astype(dtype)


def _routing_dot_expand(values, ids2d, n):
    """values [C, n] routed to [C, W, N] table positions (p gather as a
    one-hot MXU matmul, rank-3 output)."""
    vr = _routed(values)
    oh = _onehot3(ids2d, n, vr.dtype)
    prec = (jax.lax.Precision.HIGHEST
            if vr.dtype in (jnp.float32, jnp.float64) else None)
    return jax.lax.dot_general(
        vr, oh, (((1,), (0,)), ((), ())), precision=prec,
        preferred_element_type=jnp.float32).astype(values.dtype)


def _routing_dot_aggregate(z, ids2d, n):
    """z [C, W, N] summed into [C, n] by table ids (transpose-apply
    aggregation as a one-hot MXU matmul, rank-3 operand)."""
    zr = _routed(z)
    oh = _onehot3(ids2d, n, zr.dtype)
    prec = (jax.lax.Precision.HIGHEST
            if zr.dtype in (jnp.float32, jnp.float64) else None)
    return jax.lax.dot_general(
        zr, oh, (((1, 2), (1, 2)), ((), ())), precision=prec,
        preferred_element_type=jnp.float32).astype(z.dtype)


def _oh_aggregate(parts, ids, n):
    """Segment-sum by MXU: parts [F, R] -> [F, n] summing columns with
    equal ids.  2*F*R*n FLOPs — cheap for small n (one-hot row mode).

    f32 parts must NOT contract at XLA's DEFAULT matmul precision: this
    aggregation assembles J^T r / diag / J^T J blocks, and DEFAULT
    rounds f32 operands to bf16 on TPU — measured to stall LM
    convergence 250x on BA (PERF.md "the default-precision trap").
    They go through dot_oh_exact: a 3-term bf16 split of the value side
    against a bf16 one-hot — full f32 accuracy in HALF the MXU passes
    of Precision.HIGHEST (safe here because bsr_setup consumes
    already-computed jacobians; nothing differentiates through it).
    bf16 parts (the per-PCG-step routing, already approximate by
    explicit choice) keep the fast default path.

    At BA-1M scale the XLA form's layout machinery dominates (the
    [F, R] loop-transpose + the HBM-materialized [R, n] one-hot fed
    three times); the fused pallas kernel (ops/ohsetup.py) owns both —
    same 3-term-split numerics, one-hot only ever in VMEM."""
    if parts.dtype in (jnp.float32, jnp.float64):
        from ..ops.ohsetup import (_mode as _ohs_mode, oh_setup_aggregate,
                                   oh_setup_eligible)

        F, R = parts.shape
        if oh_setup_eligible(F, R, n, parts.dtype):
            return oh_setup_aggregate(
                parts, ids.astype(jnp.int32), N=n,
                interpret=_ohs_mode() == "interpret")
        oh_dt = jnp.bfloat16 if parts.dtype == jnp.float32 else parts.dtype
        return dot_oh_exact(
            parts, _onehot_mat(ids, n, oh_dt), (((1,), (0,)), ((), ()))
        ).astype(parts.dtype)
    oh = _onehot_mat(ids, n, parts.dtype)
    return jax.lax.dot_general(
        parts, oh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(parts.dtype)


def _oh_products_fused(bsr, entries, jTs, rT, slot, n, dtype):
    """One-hot row-mode setup via the in-kernel PRODUCTS pallas kernel
    (ops/ohsetup.oh_setup_products): jtr/d2/eblock slabs computed in
    VMEM from the channel-major jacobian slots and aggregated against
    an in-VMEM one-hot — the [F, R] parts, the [Ci*Cj, R] outer
    products and the [R, n] one-hot never reach HBM (~8 ms + 1.3 GB of
    traffic of the BA-1M fixed step, trace r5).  The XLA parts these
    replace are left unconsumed — DCE removes them.  Returns None when
    ineligible (caller falls back to _oh_aggregate)."""
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return None
    from ..ops.ohsetup import (_mode as _ohs_mode, oh_products_eligible,
                               oh_setup_products)

    rc, R = rT.shape
    slot_list: list = []
    for kind, key, width, _ in entries:
        ss = ((bsr.pairs[key][0], bsr.pairs[key][1]) if kind == "pair"
              else (key,))
        for s in ss:
            if s not in slot_list:
                slot_list.append(s)
    offs, K = {}, 0
    for s in slot_list:
        offs[s] = K
        K += rc * bsr.slot_channels[s]
    recipe, F = [], 0
    for kind, key, width, _ in entries:
        if kind in ("jtr", "d2"):
            recipe.append((kind, offs[key], bsr.slot_channels[key]))
        else:
            a, b = bsr.pairs[key][0], bsr.pairs[key][1]
            recipe.append(("pair", offs[a], bsr.slot_channels[a],
                           offs[b], bsr.slot_channels[b]))
        F += width
    if not oh_products_eligible(F, K, R, n, dtype):
        return None
    Jall = jnp.concatenate(
        [jTs[s].reshape(rc * bsr.slot_channels[s], R) for s in slot_list],
        axis=0)
    return oh_setup_products(
        rT, Jall, bsr.oh_idxs[slot].astype(jnp.int32), N=n,
        recipe=tuple(recipe), interpret=_ohs_mode() == "interpret")


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BsrBlocks:
    """Assembled pair blocks + the STATIC layout record made at setup
    time: which col pairs stored w-major for the fused pallas kernel.
    Consumers (bsr_apply, the Schur assembly, diag-pair reads) read the
    layout from here instead of re-deriving eligibility at their own
    trace time — env/backend drift between setup and a reader would
    otherwise silently reinterpret blocks in the wrong order (advisor
    r4).  `fused` is aux data: a layout change retraces."""

    blocks: Dict[int, jnp.ndarray]
    fused: Tuple[Tuple[int, int], ...]  # (col pair idx, transpose pair idx)

    def __getitem__(self, k):
        return self.blocks[k]

    def items(self):
        return self.blocks.items()

    def fused_map(self) -> Dict[int, int]:
        return dict(self.fused)

    def tree_flatten(self):
        keys = tuple(sorted(self.blocks))
        return tuple(self.blocks[k] for k in keys), (keys, self.fused)

    @classmethod
    def tree_unflatten(cls, aux, children):
        keys, fused = aux
        return cls(dict(zip(keys, children)), fused)


def fused_pair_cols(bsr: GroupBsr, block_dtype, mesh=False) -> Dict[int, int]:
    """Static map col-pair idx -> transpose-pair idx for pairs that run
    through the fused pallas kernel (ops/fusedpair.py).  Decided ONCE in
    bsr_setup and recorded on BsrBlocks; readers take it from there.

    mesh=True disables the fused path: pallas_call inside a
    GSPMD-sharded jit with edge-sharded block operands either fails to
    partition or forces a full all-gather of the [W*F, N_t] blocks
    every PCG iteration — exactly the O(edge-bytes) per-step
    communication the multichip design avoids (advisor r4).  The XLA
    routing path partitions cleanly instead."""
    from ..ops.fusedpair import fused_pair_eligible

    out: Dict[int, int] = {}
    if mesh:
        return out
    for p_idx, pr in enumerate(bsr.pairs):
        if pr[2] != "transpose":
            continue
        partner = bsr.pairs[pr[3]]
        if partner[2] != "col":
            continue
        ct = bsr.col_gathers[partner[3]][0]
        W, N_t = bsr.cols[ct].shape
        img_col = bsr.slot_images[partner[1]]
        S_col = int(np.prod(bsr.image_shapes[img_col][:-1]))
        Ci = bsr.slot_channels[partner[0]]
        Cj = bsr.slot_channels[partner[1]]
        if fused_pair_eligible(S_col, W, N_t, block_dtype, Ci=Ci, Cj=Cj):
            out[pr[3]] = p_idx
    return out


def _fused_store_3d(bsr: GroupBsr, key: int, W: int, N_t: int,
                    block_dtype, cur_dtype) -> bool:
    """Whether this fused col pair's blocks store 3-D [W, F, N_t]
    (fusedpair.store_3d: the W-loop kernel levels — avoids the
    per-iteration [W*F, N] -> [W, F, N] relayout inside the PCG loop)."""
    from ..ops.fusedpair import store_3d

    pr = bsr.pairs[key]
    i, j = pr[0], pr[1]
    Ci, Cj = bsr.slot_channels[i], bsr.slot_channels[j]
    S = int(np.prod(bsr.image_shapes[bsr.slot_images[j]][:-1]))
    bb = jnp.dtype(block_dtype if block_dtype is not None
                   else cur_dtype).itemsize
    return store_3d(W, Ci, Cj, S, N_t, bb)


def cross_block_4d(bsr: GroupBsr, fused: Dict[int, int], p_idx: int,
                   blk, Ca: int, Cb: int, W: int, N_t: int):
    """[Ca, Cb, W, N_t] view of a stored cross block regardless of its
    storage order (fused pairs store w-major, 2-D or 3-D)."""
    if p_idx in fused:
        return jnp.transpose(blk.reshape(W, Ca, Cb, N_t), (1, 2, 0, 3))
    return blk.reshape(Ca, Cb, W, N_t)


def _setup_fullrepeat_fused(bsr, specs, t, s0, jtr_out, d2_out,
                            blocks, fused, block_dtype, jTs, rT):
    """Single-pass pallas setup for a full-repeat level
    (ops/fullrepeat.py): per-w element-order products via a resident
    one-hot layout matrix on the MXU — the [*, N, W] -> [*, W, N]
    transpose-copies and w-sum relayouts of the XLA path (~13 ms of
    the BA uniform-1M fixed step, trace r5) never exist.  Returns False
    when ineligible (caller keeps the XLA channel-major path)."""
    from ..ops.fullrepeat import (_mode as _fr_mode, fullrepeat_eligible,
                                  fullrepeat_setup)

    perm = bsr.perms[t]
    N_t, W = perm.shape
    rc = rT.shape[0]
    slot_list: list = []
    for kind, key, width in specs:
        if kind == "pair":
            pr = bsr.pairs[key]
            if pr[2] != "diag" and key not in fused:
                return False  # XLA routing layout wanted: keep XLA path
            ss = (pr[0], pr[1])
        else:
            ss = (key,)
        for s in ss:
            if s not in slot_list:
                slot_list.append(s)
    offs, Kall = {}, 0
    for s in slot_list:
        offs[s] = Kall
        Kall += rc * bsr.slot_channels[s]
    if not fullrepeat_eligible(W, N_t, Kall, rc, rT.dtype):
        return False
    recipe, n_cross, cross_keys = [], 0, []
    for kind, key, width in specs:
        if kind in ("jtr", "d2"):
            recipe.append((kind, offs[key], bsr.slot_channels[key]))
        else:
            a, b = bsr.pairs[key][0], bsr.pairs[key][1]
            ca, cb = bsr.slot_channels[a], bsr.slot_channels[b]
            if bsr.pairs[key][2] == "diag":
                recipe.append(("diag", offs[a], ca, offs[b], cb))
            else:
                recipe.append(("cross", offs[a], ca, offs[b], cb, n_cross))
                cross_keys.append(key)
                n_cross += 1
    R = rT.shape[1]
    sl = lambda x: jax.lax.slice_in_dim(x, s0, s0 + N_t * W, axis=1)  # noqa: E731
    Jall_win = jnp.concatenate(
        [sl(jTs[s].reshape(rc * bsr.slot_channels[s], R))
         for s in slot_list], axis=0)
    agg, crosses = fullrepeat_setup(
        sl(rT), Jall_win, W=W, N_t=N_t, recipe=tuple(recipe),
        interpret=_fr_mode() == "interpret")
    off = 0
    for kind, key, width in specs:
        if kind in ("jtr", "d2"):
            name = bsr.slot_images[key]
            out = jtr_out if kind == "jtr" else d2_out
            out[name] = out.get(name, 0) + agg[off:off + width].T.reshape(
                bsr.image_shapes[name])
            off += width
        elif bsr.pairs[key][2] == "diag":
            blocks[key] = agg[off:off + width]  # [Ci*Cj, N] full precision
            off += width
        else:
            blk = crosses[cross_keys.index(key)]  # [W*Ci*Cj, N_t] w-major
            if _fused_store_3d(bsr, key, W, N_t, block_dtype, blk.dtype):
                blk = blk.reshape(W, width, N_t)
            if block_dtype is not None:
                blk = blk.astype(block_dtype)
            blocks[key] = blk
    return True


def _setup_base_cm(bsr, parts_list, specs, t, s0, jtr_out, d2_out,
                   blocks, fused, block_dtype, jTs=None, rT=None):
    """Channel-major assembly for a single full-repeat level: the whole
    [N_t, W, F] 'gather' is a contiguous window of the channel-major
    payload [F, R], read as [F, N_t, W] with zero per-index cost AND
    zero row-major relayout.  Aggregated parts (jtr/d2/diag) reduce over
    the trailing W axis in place; cross blocks pay only a minor-dims
    [*, N_t, W] -> [*, W, N_t] transpose (HBM-rate, vs the [R, F]
    loop-transpose the general path needs)."""
    perm, mask = bsr.perms[t], bsr.masks[t]
    N_t, W = perm.shape
    if jTs is not None and rT is not None and _setup_fullrepeat_fused(
            bsr, specs, t, s0, jtr_out, d2_out, blocks, fused,
            block_dtype, jTs, rT):
        return
    payload_cm = jnp.concatenate(parts_list, axis=0)  # [F, R]
    F = payload_cm.shape[0]
    win = jax.lax.slice_in_dim(payload_cm, s0, s0 + N_t * W, axis=1)
    g3 = win.reshape(F, N_t, W)
    # full-repeat masks are all-ones by construction (every (n, t) lane
    # covered); multiply anyway — it fuses and guards future variants
    g3 = g3 * mask[None, :, :]
    gsum = jnp.sum(g3, axis=2)  # [F, N_t]
    off = 0
    for kind, key, width in specs:
        part = g3[off:off + width]  # [width, N_t, W]
        if kind in ("jtr", "d2"):
            name = bsr.slot_images[key]
            v = gsum[off:off + width]  # [width, N_t]
            out = jtr_out if kind == "jtr" else d2_out
            out[name] = out.get(name, 0) + v.T.reshape(
                bsr.image_shapes[name])
        elif bsr.pairs[key][2] == "diag":
            blocks[key] = gsum[off:off + width]  # [Ci*Cj, N] full precision
        else:  # cross pair on this (single) level
            if key in fused:
                # w-major [d*Ci*Cj + f, n] (ops/fusedpair.py layout;
                # 3-D for W-loop levels, fusedpair.store_3d)
                blk = jnp.transpose(part, (2, 0, 1))
                if not _fused_store_3d(bsr, key, W, N_t, block_dtype,
                                       blk.dtype):
                    blk = blk.reshape(W * width, N_t)
            else:
                # channel-major [f*W + d, n] (XLA routing layout)
                blk = jnp.transpose(part, (0, 2, 1)).reshape(
                    width * W, N_t)
            if block_dtype is not None:
                blk = blk.astype(block_dtype)
            blocks[key] = blk
        off += width


def bsr_setup(bsr: GroupBsr, r, jacs, dtype, block_dtype=None,
              channel_major=False, replicate=None):
    """Once per nonlinear iteration: assemble J^T r, diag(J^T J) and all
    unknown-pair blocks, row-sorted, with one wide payload gather per row
    table (scatter-free; replaces creatematerializejtjResidualwise +
    createjtfResidualwise scatters, thallo.t:3715-3752,3867-3909).

    r:    [R, rc]
    jacs: list of [R, rc, C_i] (masked)
    Returns (jtr_images, d2_images, blocks) where jtr/d2 are dicts
    image -> [*imshape] accumulated over this group's slots and blocks is
    {pair_index: [Ci*Cj, N] (diag) | [Ci*Cj*W_t, N_t] (cross, per level)}.
    Transpose pairs materialize nothing (they ride their partner's
    blocks in bsr_apply).

    The whole assembly runs CHANNEL-MAJOR ([*, R]/[*, N] buffers, R/N in
    the 128-lane dim): the incoming row-major jac buffers ([R, rc, C] ->
    physically [R, 8, 128]: ~25-57x tile padding) are transposed once at
    entry where XLA fuses the relayout into the jacobian producers, and
    every intermediate after that — J^T r, diag, edge blocks, the wide
    payload, the row-table gather — pads only its small sublane axis
    (the same minor-dim tiling wall bsr_apply hit first; the remaining
    setup cost is the per-index gather floor, profiled in PERF.md's
    "BA 250k-obs setup anatomy").  One-hot row slots route through the
    MXU segment-sum instead of the payload gather.
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
    # per-pair edge blocks B_ij = J_i^T J_j  [Ci*Cj, R] (skip transpose
    # pairs: their values are the partner's blocks, reused exactly)
    eblocks = {}
    for p_idx, pr in enumerate(bsr.pairs):
        if pr[2] == "transpose":
            continue
        i, j = pr[0], pr[1]
        Ci, Cj = bsr.slot_channels[i], bsr.slot_channels[j]
        eb = jnp.sum(jTs[i][:, :, None, :] * jTs[j][:, None, :, :], axis=0)
        eblocks[p_idx] = eb.reshape(Ci * Cj, -1)

    jtr_out: Dict[str, jnp.ndarray] = {}
    d2_out: Dict[str, jnp.ndarray] = {}
    blocks: Dict[int, jnp.ndarray] = {}
    fused = fused_pair_cols(
        bsr, block_dtype if block_dtype is not None else dtype,
        mesh=replicate is not None)

    # ---- one-hot row slots: MXU segment-sum aggregation -------------------
    # batch all parts sharing one index array into a single matmul
    oh_groups: Dict[int, list] = {}  # slot -> [(kind, key, width, part)]
    for i in range(nslots):
        if not bsr.slot_onehot(i):
            continue
        C = bsr.slot_channels[i]
        oh_groups[i] = [("jtr", i, C, jtr[i]), ("d2", i, C, d2[i])]
    for p_idx, pr in enumerate(bsr.pairs):
        if pr[2] != "diag" or not bsr.slot_onehot(pr[0]):
            continue
        i, j = pr[0], pr[1]
        Ci, Cj = bsr.slot_channels[i], bsr.slot_channels[j]
        oh_groups[i].append(("pair", p_idx, Ci * Cj, eblocks[p_idx]))
    for i, entries in oh_groups.items():
        name_i = bsr.slot_images[i]
        N = int(np.prod(bsr.image_shapes[name_i][:-1]))
        agg = _oh_products_fused(bsr, entries, jTs, rT, i, N, dtype)
        if agg is None:
            parts = jnp.concatenate([p for _, _, _, p in entries], axis=0)
            agg = _oh_aggregate(parts, bsr.oh_idxs[i], N)  # [F, N]
        off = 0
        for kind, key, width, _ in entries:
            v = agg[off:off + width]
            if kind in ("jtr", "d2"):
                name = bsr.slot_images[key]
                out = jtr_out if kind == "jtr" else d2_out
                out[name] = out.get(name, 0) + v.T.reshape(
                    bsr.image_shapes[name])
            else:
                blocks[key] = v  # diag block [Ci*Cj, N], full precision
            off += width

    # ---- table-backed slots: one payload gather per row table (level) -----
    payload_specs: Dict[int, list] = {}  # base table -> [(kind, key, width)]
    payload_parts: Dict[int, list] = {}
    for i in range(nslots):
        t = bsr.slot_row[i]
        if t < 0:
            continue
        C = bsr.slot_channels[i]
        payload_specs.setdefault(t, []).append(("jtr", i, C))
        payload_parts.setdefault(t, []).append(jtr[i])
        payload_specs[t].append(("d2", i, C))
        payload_parts[t].append(d2[i])
    for p_idx, pr in enumerate(bsr.pairs):
        if pr[2] == "transpose":
            continue
        i, j = pr[0], pr[1]
        if bsr.slot_onehot(i):
            continue  # handled by the one-hot route above (diag pairs)
        t = bsr.slot_row[i]
        Ci, Cj = bsr.slot_channels[i], bsr.slot_channels[j]
        payload_specs.setdefault(t, []).append(("pair", p_idx, Ci * Cj))
        payload_parts.setdefault(t, []).append(eblocks[p_idx])

    for base, parts_list in payload_parts.items():
        # channel-major fast path: a single full-repeat level (sorted
        # uniform observation maps, idx[s0 + n*W + t] == n) reads the
        # whole table as one contiguous window of the CHANNEL-MAJOR
        # payload [F, R] — the [R, F] row-major payload below never
        # exists, and neither does its transpose (XLA lowers that
        # [R, F] transpose as a loop at 1M rows: ~17 ms of the measured
        # fixed-cost wall, PERF.md "fixed-cost anatomy").  Mesh mode
        # keeps the general path (the edge-replicate callback pins the
        # [R, ...] axis).
        cm_done = False
        if replicate is None:
            levels0 = bsr.levels_of(base)
            if len(levels0) == 1:
                t0 = levels0[0]
                perm0, mask0 = bsr.perms[t0], bsr.masks[t0]
                N_t0, W0 = perm0.shape
                plans0 = (bsr.perm_plans[t0]
                          if t0 < len(bsr.perm_plans) else None)
                if plans0 is not None and _full_repeat_table(
                        plans0, N_t0, W0):
                    _setup_base_cm(bsr, parts_list, payload_specs[base],
                                   t0, plans0[0][3], jtr_out, d2_out,
                                   blocks, fused, block_dtype,
                                   jTs=jTs, rT=rT)
                    cm_done = True
        if cm_done:
            continue
        # ONE relayout to row-major for the row-table gather: the payload
        # is wide (F ~ 40-170), so a row gather moves a near-full tile of
        # useful bytes per index — unlike the thin per-slot gathers the
        # payload exists to batch (PERF.md).  [R, F] pads F only to the
        # next 128 (<2%); the channel-major products above never touch a
        # padded [R, rc, C] buffer.
        payload = jnp.concatenate(parts_list, axis=0).T  # [R, F]
        if replicate is not None:
            # mesh mode: ONE explicit all-gather of the edge-sharded
            # payload so the N-sharded row-table gathers below stay
            # local — XLA otherwise lowers each cross-sharded gather as
            # masked-partial + full all-reduce (volume-proportional,
            # MULTICHIP_r02's 1.3 MB/step)
            payload = replicate(payload)
        F = payload.shape[1]
        specs = payload_specs[base]
        agg_width = sum(w for kind, _, w in specs if kind != "pair")
        # the level tables gather the same payload; aggregated parts
        # (jtr/d2/diag blocks) sum across levels into full element order,
        # cross-pair blocks stay per level
        combined = None  # [N, agg_width + diag widths]
        deferred_sc = []  # overflow-level (sel, gsum): merged scatter below
        levels = bsr.levels_of(base)
        # map each cross pair to its level table (via its col table)
        pair_level = {}
        for kind, key, width in specs:
            if kind != "pair":
                continue
            pr = bsr.pairs[key]
            if pr[2] == "col":
                pair_level[key] = bsr.col_row[bsr.col_gathers[pr[3]][0]]
        for t in levels:
            perm, mask = bsr.perms[t], bsr.masks[t]
            N_t, W = perm.shape
            plans = bsr.perm_plans[t] if t < len(bsr.perm_plans) else None
            if plans is not None and _full_repeat_table(plans, N_t, W):
                # the whole table is ONE uniform repeat box (sorted
                # observation maps: idx[n*W + t] == n) — read all W
                # columns in a single contiguous reshape of the payload.
                # The per-column form below costs W strided full-payload
                # passes (measured 4 x 0.73 ms at BA 250k, trace r3);
                # this is one pass at HBM rate.
                s0 = plans[0][3]
                g = structured.window_rows(payload, s0, N_t, W, W, 1)
                g = g * mask[..., None]  # [N_t, W, F]
            elif plans is not None and any(p is not None for p in plans):
                # structured fast path: windowed slices replace the row
                # gather for affine columns (ops/structured.py); invalid
                # lanes read in-range garbage that the mask zeroes.
                # Unplanned columns batch into ONE gather.
                gparts = [None] * W
                for d in range(W):
                    if plans[d] is not None:
                        gparts[d] = structured.apply_col_plan_rows(
                            payload, plans[d], N_t)
                unplanned = [d for d in range(W) if gparts[d] is None]
                if unplanned:
                    sub = jnp.take(
                        payload, perm[:, unplanned].reshape(-1), axis=0
                    ).reshape(N_t, len(unplanned), F)
                    for k, d in enumerate(unplanned):
                        gparts[d] = sub[:, k]
                g = jnp.stack(
                    [gd * mask[:, d][:, None] for d, gd in enumerate(gparts)],
                    axis=1)  # [N_t, W, F]
            else:
                # NOTE a sorted-run formulation (vmap(dynamic_slice) /
                # lax.gather with slice_sizes=(W, F) over run starts) was
                # measured 20-26x SLOWER than this per-index take on v5e
                # (143/190 ms vs 7.3 ms at the skew-250k shapes): XLA
                # lowers batched multi-row slices as a sequential while
                # loop + dynamic-update-slice, not as slice DMAs.  The
                # per-index gather (~8 cyc/row, wide rows) is the fastest
                # known XLA form for unstructured row tables; sortedness
                # still pays off through near-sequential HBM access.
                g = jnp.take(payload, perm.reshape(-1), axis=0).reshape(
                    N_t, W, F
                ) * mask[..., None]  # [N_t, W, F]
            gsum = jnp.sum(g, axis=1)  # [N_t, F] for the aggregated parts
            sel = bsr.row_sels[t]
            if combined is None:
                combined = gsum
            elif sel is None:
                combined = combined + gsum
            else:
                # overflow level: deferred, merged into ONE scatter after
                # the level loop (each .at[sel].add rewrites the whole
                # [N, F] buffer — ~150 MB at 1M obs; see bsr_apply)
                deferred_sc.append((sel, gsum))
            # cross blocks from THIS level's gather
            off = 0
            for kind, key, width in specs:
                if kind == "pair" and bsr.pairs[key][2] == "col" \
                        and pair_level.get(key) == t:
                    if key in fused:
                        # w-major storage [d*Ci*Cj + ci*Cj + cj, n]: each
                        # degree-slot d is a contiguous [Ci*Cj, N_t]
                        # plane — the layout the fused pallas pair kernel
                        # slices (ops/fusedpair.py; Mosaic has no rank-3
                        # reductions).  W-loop levels store 3-D
                        # [W, F, N_t] so the kernel operand needs no
                        # per-iteration relayout (fusedpair.store_3d).
                        blk = jnp.transpose(
                            g[:, :, off:off + width], (1, 2, 0))
                        if not _fused_store_3d(bsr, key, W, N_t,
                                               block_dtype, blk.dtype):
                            blk = blk.reshape(W * width, N_t)
                    else:
                        # channel-major [(ci*Cj+cj)*W+d, n]: aligns with
                        # pg [Cj, W, N_t] in the XLA apply path with no
                        # relayout
                        blk = jnp.transpose(
                            g[:, :, off:off + width], (2, 1, 0)
                        ).reshape(width * W, N_t)
                    if block_dtype is not None:
                        # bf16 block STORAGE halves the dominant
                        # per-PCG-step HBM read; products upcast back
                        # (J^T r / diag / setup stay full precision)
                        blk = blk.astype(block_dtype)
                    blocks[key] = blk
                off += width
        if deferred_sc:
            if len(deferred_sc) == 1:
                sel, gs = deferred_sc[0]
                combined = combined.at[sel].add(gs)
            else:
                ids = jnp.concatenate([s for s, _ in deferred_sc])
                ups = jnp.concatenate([g_ for _, g_ in deferred_sc], axis=0)
                combined = combined.at[ids].add(ups)
        # aggregated outputs from the combined (full-order) sums
        off = 0
        for kind, key, width in specs:
            if kind in ("jtr", "d2"):
                i = key
                name = bsr.slot_images[i]
                v = combined[:, off:off + width].reshape(bsr.image_shapes[name])
                out = jtr_out if kind == "jtr" else d2_out
                out[name] = out.get(name, 0) + v
            elif bsr.pairs[key][2] == "diag":
                # pre-aggregated [Ci*Cj, N]: the block-Jacobi
                # preconditioner and Schur elimination are built from
                # these, so keep them full precision
                blocks[key] = combined[:, off:off + width].T
            off += width
    return jtr_out, d2_out, BsrBlocks(blocks, tuple(sorted(fused.items())))


def bsr_apply(bsr: GroupBsr, blocks, p, replicate=None):
    """J^T J p for this group from the assembled blocks: gathers + batched
    block matvecs + a padded-degree sum.  NO scatters on the hot path
    (the analog of the reference's cusparseJTJMatVec /
    PCGStep1_materializedJTJ, gauss_newton.t:554-625,1447-1526); overflow
    levels contribute one tiny `.at[sel].add` over the high-degree tail.

    Layout discipline (TPU): every buffer this loop touches keeps the
    big axis N LAST (the 128-lane dim) and folds the small channel /
    degree axes into the sublane dim — blocks [Ci*Cj*W, N_t], gathered
    column operands [Cj, W, N_t], accumulator [Ci, N], all <2x physical
    padding.  Naive [N,D,Ci,Cj]/[N*D,C] shapes pad their trailing dims
    ~40-110x and measured ~12 ms per 261k-edge PCG iteration end-to-end
    (PERF.md "the minor-dim tiling wall").

    Transpose pairs (one-hot row mode): contribution to the small image
    = partner blocks × p broadcast over the partner's rows, aggregated
    by destination element with a one-hot MXU matmul — no per-index
    gather at all (the per-step cost that set the BA 250k/1M floor).

    p: unknown pytree.  Returns dict image -> [*imshape] contribution.
    """
    # channel-major views of the operand vectors, once per image.  On a
    # mesh, replicate them HERE (one small [C, N] all-gather per image):
    # every downstream col/row read is then shard-local, and the
    # constrained accumulator output reduces to owner shards — per-step
    # communication becomes O(unknown bytes), not O(edge bytes)
    pT = {}
    for img in set(bsr.slot_images):
        C = p[img].shape[-1]
        v = p[img].reshape(-1, C).T  # [C, N_img]
        pT[img] = replicate(v) if replicate is not None else v
    # one [C, W, N_t] gather per unique (col table, image) — and gathers
    # sharing a col table concatenate their channel-major sources so the
    # ~8-cycle-per-index cost (PERF.md) is paid once per table.  Col
    # tables referenced only by transpose pairs never gather (their ids
    # feed the one-hot aggregation directly).
    # fused col+transpose pairs: when a "col" pair has a transpose
    # partner (small column-side image), ONE pallas kernel per level
    # computes both directions reading the blocks once, with the routing
    # one-hot generated in VMEM (ops/fusedpair.py) — the XLA form
    # materializes a [S, W, N_t] one-hot in HBM inside the PCG loop
    # (the measured 1M-obs iteration floor).  The fused set is the one
    # RECORDED at setup (BsrBlocks.fused): storage layout and read
    # layout can never disagree.
    from ..ops.fusedpair import fused_pair_apply

    fused = blocks.fused_map() if isinstance(blocks, BsrBlocks) else {}

    used_gathers = set()
    for p_idx, pr in enumerate(bsr.pairs):
        if pr[2] == "col" and p_idx not in fused:
            used_gathers.add(pr[3])
    by_table: Dict[tuple, list] = {}
    for gidx, (ct, img, C) in enumerate(bsr.col_gathers):
        if gidx not in used_gathers:
            continue
        # sharing requires equal source extents (same element count)
        by_table.setdefault((ct, pT[img].shape[1]), []).append((gidx, img, C))
    pg = {}
    for (ct, _), entries in by_table.items():
        W, N_t = bsr.cols[ct].shape
        cat = (pT[entries[0][1]] if len(entries) == 1
               else jnp.concatenate([pT[img] for _, img, _ in entries], axis=0))
        plans = bsr.col_plans[ct] if ct < len(bsr.col_plans) else None
        if plans is not None and any(p is not None for p in plans):
            # structured fast path (ops/structured.py): affine columns
            # read p through windowed slices — zero per-index cost on
            # the PCG-step hot loop; garbage on invalid lanes multiplies
            # zeroed blocks.  Unplanned columns batch into ONE gather.
            gs = [None] * W
            for d in range(W):
                if plans[d] is not None:
                    gs[d] = structured.apply_col_plan_minor(cat, plans[d], N_t)
            unplanned = [d for d in range(W) if gs[d] is None]
            if unplanned:
                sub = jnp.take(
                    cat, bsr.cols[ct][unplanned].reshape(-1), axis=1
                ).reshape(cat.shape[0], len(unplanned), N_t)
                for k, d in enumerate(unplanned):
                    gs[d] = sub[:, k]
            g = jnp.stack(gs, axis=1)  # [sum C, W, N_t]
            off = 0
            for gidx, img, C in entries:
                pg[gidx] = g[off:off + C]
                off += C
            continue
        S_src = cat.shape[1]
        # default raised 512 -> 4096 after the 1M-obs measurement
        # (artifacts/tpu_skew.jsonl): at 1024 cameras the threshold miss
        # reinstated the R-index thin gather (14.3 ms/iter); the one-hot
        # matmul break-even is ~35k/C source rows on v5e
        onehot_max = int(os.environ.get("THALLO_ONEHOT_COLS", "4096"))
        if 0 < S_src <= onehot_max and W * N_t > 4 * S_src:
            # small-source gathers as a one-hot MXU matmul.  Measured on
            # TPU v5e (artifacts/tpu_onehot.jsonl, BA 250k obs / 256
            # cameras): marginal PCG iteration 2.73 -> 0.53 ms (5.1x) —
            # XLA fuses the comparison into the matmul operand read, so
            # the per-index gather cost disappears into MXU work that is
            # ~free at these sizes (2*S*C*DN FLOPs ~ 1 GFLOP).  Default
            # threshold 512 source rows; THALLO_ONEHOT_COLS overrides
            # (0 disables) — read at trace time, i.e. plan creation.
            # Rank-3 form: output lands [C, W, N_t] directly (no
            # post-dot relayout, see _onehot3).
            g = _routing_dot_expand(cat, bsr.cols[ct], S_src)
        else:
            g = jnp.take(cat, bsr.cols[ct].reshape(-1), axis=1).reshape(
                cat.shape[0], W, N_t)
        off = 0
        for gidx, img, C in entries:
            pg[gidx] = g[off:off + C]
            off += C
    out: Dict[str, jnp.ndarray] = {}
    acc: Dict[int, jnp.ndarray] = {}  # row slot -> [Ci, N] (full order)
    # overflow-level contributions are DEFERRED and merged into ONE
    # scatter per slot at the end: each .at[:, sel].add rewrites the
    # whole [C, N] accumulator, and a skew scene carries several
    # overflow levels — 4 separate scatters measured 0.72 ms of a
    # 2.1 ms skew-1M PCG iteration (trace r5); merged, XLA pays the
    # full-buffer rewrite once (duplicate ids across levels accumulate
    # correctly in one scatter-add)
    deferred: Dict[int, list] = {}

    def _add(i, contrib, sel=None):
        name = bsr.slot_images[i]
        N = int(np.prod(bsr.image_shapes[name][:-1]))
        if i not in acc:
            acc[i] = jnp.zeros((bsr.slot_channels[i], N), contrib.dtype)
        if sel is None:
            acc[i] = acc[i] + contrib
        else:
            deferred.setdefault(i, []).append((sel, contrib))

    for p_idx, pr in enumerate(bsr.pairs):
        i, j = pr[0], pr[1]
        Ci = bsr.slot_channels[i]
        Cj = bsr.slot_channels[j]
        if pr[2] == "transpose":
            if fused.get(pr[3]) == p_idx:
                continue  # computed by the fused kernel at the col pair
            # partner (j, i, "col", g): blocks [Cj*Ci*W, N_t] over j's
            # row table; z = B^T p_j broadcast over rows, then one-hot
            # aggregate by destination (this slot's element ids = the
            # partner's col table)
            partner = bsr.pairs[pr[3]]
            ct = bsr.col_gathers[partner[3]][0]
            t = bsr.col_row[ct]
            blk = blocks[pr[3]]
            if blk.dtype != p[bsr.slot_images[i]].dtype:
                blk = blk.astype(p[bsr.slot_images[i]].dtype)
            W, N_t = bsr.cols[ct].shape
            B = blk.reshape(Cj, Ci, W, N_t)
            prow = pT[bsr.slot_images[j]]  # [Cj, N_j]
            sel = bsr.row_sels[t]
            if sel is not None:
                prow = prow[:, sel]  # [Cj, N_t] (tiny overflow tail)
            z = jnp.sum(B * prow[:, None, None, :], axis=0)  # [Ci, W, N_t]
            name_i = bsr.slot_images[i]
            N_i = int(np.prod(bsr.image_shapes[name_i][:-1]))
            # rank-3 one-hot aggregation: consumes [Ci, W, N_t] in place
            # (the flat form forced a measured 0.16 ms/iter relayout)
            contrib = _routing_dot_aggregate(z, bsr.cols[ct], N_i)
            _add(i, contrib)
            continue
        blk = blocks[p_idx]
        if p_idx in fused:
            # fused pallas path: one kernel per level computes this col
            # pair AND its transpose partner, reading the (w-major)
            # blocks once with the one-hot generated in VMEM
            from ..ops.fusedpair import _mode as _fp_mode

            ct = bsr.col_gathers[pr[3]][0]
            t = bsr.col_row[ct]
            W, N_t = bsr.cols[ct].shape
            img_j = bsr.slot_images[j]
            S_col = int(np.prod(bsr.image_shapes[img_j][:-1]))
            sel = bsr.row_sels[t]
            prow = pT[bsr.slot_images[i]]  # [Ci, N_i]
            if sel is not None:
                prow = prow[:, sel]  # [Ci, N_t] (tiny overflow tail)
            rows_c, cols_c = fused_pair_apply(
                bsr.cols[ct], blk, pT[img_j], prow,
                Ci=Ci, Cj=Cj, S=S_col,
                interpret=_fp_mode() == "interpret")
            dt = p[bsr.slot_images[i]].dtype
            _add(i, rows_c.astype(dt), sel=sel)
            _add(j, cols_c.astype(dt))
            continue
        if blk.dtype != p[bsr.slot_images[i]].dtype:
            blk = blk.astype(p[bsr.slot_images[i]].dtype)  # bf16 storage
        if pr[2] == "diag":
            pjT = pT[bsr.slot_images[j]]  # [Cj, N]
            B = blk.reshape(Ci, Cj, -1)  # [Ci, Cj, N]
            contrib = jnp.sum(B * pjT[None, :, :], axis=1)  # [Ci, N]
            _add(i, contrib)
        else:
            ct = bsr.col_gathers[pr[3]][0]
            t = bsr.col_row[ct]
            W, N_t = bsr.cols[ct].shape
            B = blk.reshape(Ci, Cj, W, N_t)
            contrib = jnp.sum(B * pg[pr[3]][None], axis=(1, 2))  # [Ci, N_t]
            _add(i, contrib, sel=bsr.row_sels[t])
    merge_mode = os.environ.get("THALLO_MERGE_SCATTER", "1")
    for i, v in acc.items():
        name = bsr.slot_images[i]
        ents = deferred.pop(i, [])
        # overflow-level contribution merge: ONE row-granular scatter
        # on the post-transpose [N, C] form.  Measured A/B on v5e
        # (skew-250k marginal, 2026-08-20): merged 0.97 ms/iter vs
        # per-level lane scatters 1.35 — merged wins at both 250k and
        # 1M (6.74 -> 5.39 there).  THALLO_MERGE_SCATTER=0 restores
        # the per-level form for experiments.
        if ents and merge_mode == "0":
            for sel, c in ents:
                v = v.at[:, sel].add(c)
            ents = []
        vt = v.T  # [N, C] row-major (the image layout)
        if ents:
            if len(ents) == 1:
                sel, c = ents[0]
                vt = vt.at[sel].add(c.T)
            else:
                ids = jnp.concatenate([s for s, _ in ents])
                ups = jnp.concatenate([c for _, c in ents], axis=1)
                vt = vt.at[ids].add(ups.T)
        out[name] = out.get(name, 0) + vt.reshape(bsr.image_shapes[name])
    return out
