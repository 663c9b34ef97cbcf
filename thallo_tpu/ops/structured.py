"""Structured-index gathers: piecewise-affine detection + slice lowering.

PERF.md's per-index gather study pinned the graph-energy floor at ~8
cycles PER INDEX regardless of row width: an unstructured 261k-edge ARAP
PCG iteration cannot go below ~4 ms through any gather kernel.  The only
way under is exploiting index STRUCTURE.  This module detects, at init
time on the concrete int32 sparse maps, when an index array is a
concatenation of affine boxes

    idx[e0 + r*W + t] == base + r*row_coeff + t*col_coeff
    (r in [0,H), t in [0,W))

— true for every grid-structured graph (direction-grouped mesh edges,
regular neighborhoods), and lowers the gather to reshaped contiguous
slices with ZERO per-index cost.  Unstructured index arrays simply fail
detection and keep the gather path; results are identical either way
(the fast path reads the same elements).

The reference's analog is the `coherent` scheduling hint (sorted edges
-> warp-coherent gathers, /root/reference/API/src/thallo.t sparse
coherence + reorder_for_coherence thallo.t:5308-5325); on TPU the win is
larger because a detected-affine gather skips index processing entirely.

Disable with THALLO_AFFINE=0 (the plans simply aren't built).
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def enabled() -> bool:
    return os.environ.get("THALLO_AFFINE", "1") != "0"


@jax.tree_util.register_pytree_node_class
class Static:
    """Wrap static (hashable) metadata so it can ride a traced pytree:
    flattens to zero children with the value as aux data, so it
    participates in the jit cache key and is readable at trace time."""

    def __init__(self, value):
        self.value = value

    def tree_flatten(self):
        return (), self.value

    @classmethod
    def tree_unflatten(cls, aux, _children):
        return cls(aux)

    def __repr__(self):
        return f"Static({self.value!r})"


# ---------------------------------------------------------------------------
# detection
# ---------------------------------------------------------------------------
# A segment: (start, H, W, base, row_coeff, col_coeff) meaning
#   idx[start + r*W + t] == base + r*row_coeff + t*col_coeff
# for r in [0, H), t in [0, W).  Segments tile [0, len(idx)) in order.
Segment = Tuple[int, int, int, int, int, int]


def detect_segments(idx: np.ndarray, max_segments: int = 32
                    ) -> Optional[Tuple[Segment, ...]]:
    """Greedy affine-box segmentation of a flat index array.  Returns a
    tuple of segments tiling [0, len) or None if the array needs more
    than max_segments (i.e. is unstructured)."""
    idx = np.asarray(idx).astype(np.int64).reshape(-1)
    R = idx.size
    if R < 2:
        return None
    d = np.diff(idx)
    # positions where the inner stride breaks (row jumps / segment ends)
    segs: List[Segment] = []
    s = 0
    while s < R:
        if len(segs) >= max_segments:
            return None
        if s == R - 1:
            segs.append((s, 1, 1, int(idx[s]), 0, 1))
            s += 1
            continue
        c2 = int(d[s])
        # maximal run of inner stride c2 starting at s
        run = d[s:]
        brk = np.flatnonzero(run != c2)
        if brk.size == 0:
            # one affine row to the end
            segs.append((s, 1, R - s, int(idx[s]), 0, c2))
            break
        W = int(brk[0]) + 1
        c1 = int(idx[s + W] - idx[s]) if s + W < R else 0
        # extend to H rows: idx[s + r*W + t] == idx[s] + r*c1 + t*c2
        H = 1
        max_rows = (R - s) // W
        if max_rows > 1:
            block = idx[s:s + max_rows * W].reshape(max_rows, W)
            expect = (int(idx[s]) + np.arange(max_rows, dtype=np.int64)[:, None] * c1
                      + np.arange(W, dtype=np.int64)[None, :] * c2)
            rows_ok = np.all(block == expect, axis=1)
            H = int(np.argmin(rows_ok)) if not rows_ok.all() else max_rows
            H = max(H, 1)
        segs.append((s, H, W, int(idx[s]), c1, c2))
        s += H * W
    return tuple(segs)


_DETECT_MEMO: dict = {}


def detect_segments_cached(idx: np.ndarray, max_segments: int = 32
                           ) -> Optional[Tuple[Segment, ...]]:
    """detect_segments with a small content-keyed memo: init runs
    detection on the same index arrays from both prepared_consts (slot
    plans) and build_group_bsr (table keying)."""
    import hashlib

    a = np.ascontiguousarray(np.asarray(idx).reshape(-1))
    key = (a.shape[0], max_segments,
           hashlib.blake2b(a.tobytes(), digest_size=16).digest())
    if key not in _DETECT_MEMO:
        if len(_DETECT_MEMO) > 64:
            _DETECT_MEMO.clear()
        _DETECT_MEMO[key] = detect_segments(a, max_segments)
    return _DETECT_MEMO[key]


def normalize_segments(segs, max_segments: int = 32, split_limit: int = 4,
                       allow_broadcast_rows: bool = False
                       ) -> Optional[Tuple[Segment, ...]]:
    """Make every segment independently executable and overlap-free:
    boxes whose rows overlap in value space (row_coeff < W, e.g. two
    direction groups greedily merged into one box) are split into
    single-row runs when small.  allow_broadcast_rows keeps
    identical-row boxes (c1 == 0) whole — fine for gather plans
    (window broadcasts), NOT for BSR column keying (an unknown would
    repeat within the segment).  Returns None when the result would be
    unstructured (too many segments / strided rows)."""
    if segs is None:
        return None
    norm: List[Segment] = []
    for (s0, H, W, b, c1, c2) in segs:
        if c2 == 0:
            # uniform repeat (e.g. sorted observation->point maps):
            # executable directly as a strided slice + broadcast
            if H > 1 and c1 < 0:
                return None
            norm.append((s0, H, W, b, c1, 0))
            continue
        if c2 != 1:
            return None
        if H > 1 and c1 < W:
            if allow_broadcast_rows and c1 == 0:
                norm.append((s0, H, W, b, 0, 1))  # identical rows
            elif H > split_limit:
                return None
            else:
                for r in range(H):
                    norm.append((s0 + r * W, 1, W, b + r * c1, 0, 1))
        else:
            norm.append((s0, H, W, b, c1, c2))
    if len(norm) > max_segments:
        return None
    return tuple(norm)


# ---------------------------------------------------------------------------
# execution: windowed (strided-row) reads via pad + reshape + slice
# ---------------------------------------------------------------------------
def _pad_last(src, lo_need: int, hi_need: int):
    """Zero-pad the last axis so reads in [lo_need, hi_need) are valid.
    Returns (padded, base_shift)."""
    L = src.shape[-1]
    pl_ = max(0, -lo_need)
    pr = max(0, hi_need - L)
    if pl_ or pr:
        pad = [(0, 0)] * (src.ndim - 1) + [(pl_, pr)]
        src = jnp.pad(src, pad)
    return src, pl_


def _strided_rows_last(src, base: int, n_rows: int, row_stride: int):
    """src[..., base + r*row_stride] for r in [0, n_rows): [..., n_rows]
    via one strided slice (zeros out of bounds)."""
    hi = base + (n_rows - 1) * row_stride + 1
    src, b = _pad_last(src, base, hi)
    base = base + b
    starts = [0] * (src.ndim - 1) + [base]
    limits = list(src.shape[:-1]) + [base + (n_rows - 1) * row_stride + 1]
    strides = [1] * (src.ndim - 1) + [max(row_stride, 1)]
    return jax.lax.slice(src, starts, limits, strides)


def window_minor(src, base: int, n_rows: int, row_stride: int, W: int,
                 col_stride: int = 1):
    """out[..., r, t] = src[..., base + r*row_stride + t*col_stride]
    (zeros where out of bounds).  Returns [..., n_rows, W] or None when
    the shape is unsupported (caller falls back to a gather)."""
    if row_stride < 0 or W <= 0 or n_rows <= 0:
        return None
    if col_stride == 0:
        # uniform repeat: one strided slice broadcast along t
        if row_stride == 0:
            src, b = _pad_last(src, base, base + 1)
            rows = jax.lax.slice_in_dim(src, base + b, base + b + 1, axis=-1)
            rows = jnp.broadcast_to(rows, rows.shape[:-1] + (n_rows,))
        else:
            rows = _strided_rows_last(src, base, n_rows, row_stride)
        return jnp.broadcast_to(
            rows[..., :, None], rows.shape + (W,))
    if col_stride != 1:
        return None
    if row_stride == 0:
        src, b = _pad_last(src, base, base + W)
        row = jax.lax.slice_in_dim(src, base + b, base + b + W, axis=-1)
        return jnp.broadcast_to(
            row[..., None, :], row.shape[:-1] + (n_rows, W))
    k = 1 if row_stride >= W else -(-W // row_stride)
    hi = base + (k - 1) * row_stride + n_rows * row_stride
    hi = max(hi, base + (n_rows - 1) * row_stride + W)
    src, b = _pad_last(src, base, hi)
    base = base + b
    lead = src.shape[:-1]
    parts = []
    for j in range(k):
        off = base + j * row_stride
        block = jax.lax.slice_in_dim(
            src, off, off + n_rows * row_stride, axis=-1)
        parts.append(block.reshape(lead + (n_rows, row_stride)))
    out = parts[0] if k == 1 else jnp.concatenate(parts, axis=-1)
    return out[..., :, :W]


def window_rows(src, base: int, n_rows: int, row_stride: int, W: int,
                col_stride: int = 1):
    """out[r, t, ...] = src[base + r*row_stride + t*col_stride, ...]
    (zeros out of bounds).  Returns [n_rows, W, ...] or None."""
    if row_stride < 0 or W <= 0 or n_rows <= 0:
        return None
    L = src.shape[0]
    trail = src.shape[1:]
    if col_stride == 0:
        # uniform repeat: strided slice on axis 0, broadcast along t
        lo = base
        hi = base + max((n_rows - 1) * row_stride, 0) + 1
        pl_ = max(0, -lo)
        pr = max(0, hi - L)
        if pl_ or pr:
            src = jnp.pad(src, [(pl_, pr)] + [(0, 0)] * (src.ndim - 1))
        b = base + pl_
        if row_stride == 0:
            rows = jnp.broadcast_to(src[b:b + 1], (n_rows,) + trail)
        else:
            starts = [b] + [0] * (src.ndim - 1)
            limits = [b + (n_rows - 1) * row_stride + 1] + list(trail)
            strides = [row_stride] + [1] * (src.ndim - 1)
            rows = jax.lax.slice(src, starts, limits, strides)
        return jnp.broadcast_to(rows[:, None], (n_rows, W) + trail)
    if col_stride != 1:
        return None
    if row_stride == 0:
        lo, hi = base, base + W
        pl_ = max(0, -lo)
        pr = max(0, hi - L)
        if pl_ or pr:
            src = jnp.pad(src, [(pl_, pr)] + [(0, 0)] * (src.ndim - 1))
        row = jax.lax.slice_in_dim(src, base + pl_, base + pl_ + W, axis=0)
        return jnp.broadcast_to(row[None], (n_rows, W) + trail)
    k = 1 if row_stride >= W else -(-W // row_stride)
    hi = base + (k - 1) * row_stride + n_rows * row_stride
    hi = max(hi, base + (n_rows - 1) * row_stride + W)
    pl_ = max(0, -base)
    pr = max(0, hi - L)
    if pl_ or pr:
        src = jnp.pad(src, [(pl_, pr)] + [(0, 0)] * (src.ndim - 1))
    base = base + pl_
    parts = []
    for j in range(k):
        off = base + j * row_stride
        block = jax.lax.slice_in_dim(src, off, off + n_rows * row_stride, axis=0)
        parts.append(block.reshape((n_rows, row_stride) + trail))
    out = parts[0] if k == 1 else jnp.concatenate(parts, axis=1)
    return out[:, :W]


# ---------------------------------------------------------------------------
# slot-gather plans (channel-major [C, N] sources over the residual grid)
# ---------------------------------------------------------------------------
def slot_gather_plan(idx: np.ndarray, src_len: int,
                     max_segments: int = 32) -> Optional[tuple]:
    """Plan for out[:, e] = srcT[:, idx[e]] as windowed slices.  Only
    accepted when every segment is executable and all reads are in
    bounds (slot gathers have no mask to hide garbage)."""
    if not enabled():
        return None
    segs = normalize_segments(detect_segments_cached(idx), max_segments,
                              allow_broadcast_rows=True)
    if segs is None:
        return None
    idx = np.asarray(idx).reshape(-1)
    if idx.size and (idx.min() < 0 or idx.max() >= src_len):
        return None
    for (_s, H, W, _b, c1, c2) in segs:
        if c1 < 0:
            return None
        if c2 == 1 and H > 1 and c1 > 0 and -(-W // c1) > 4:
            return None  # window overlap would cost more than the gather
    return segs


def apply_slot_plan_minor(srcT, segs) -> Optional[jnp.ndarray]:
    """Execute a slot_gather_plan: [C, N] -> [C, R] channel-major."""
    parts = []
    for (_s, H, W, b, c1, c2) in segs:
        w = window_minor(srcT, b, H, c1, W, c2)
        if w is None:
            return None
        parts.append(w.reshape(srcT.shape[:-1] + (H * W,)))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def scatter_slot_plan_rows(vals, segs, N: int) -> Optional[jnp.ndarray]:
    """Transpose of apply_slot_plan_rows: sum-scatter vals [R, *trail]
    into [N, *trail] through the piecewise-affine plan — static
    slice-adds instead of a segment_sum (the explicit counterpart of
    the transpose JAX derives automatically for the gather windows)."""
    trail = vals.shape[1:]
    # slack: gap padding of strided rows may write past N (zeros only)
    slack = 0
    for (_s, H, W, b, c1, c2) in segs:
        if c2 == 0:
            hi = b + (1 if (H == 1 or c1 == 0) else H * c1)
        elif H == 1 or c1 == 0:
            hi = b + W
        else:
            k = 1 if c1 >= W else -(-W // c1)
            hi = b + (k - 1) * c1 + H * c1
        slack = max(slack, hi - N)
    out = jnp.zeros((N + max(slack, 0),) + trail, vals.dtype)
    for (s0, H, W, b, c1, c2) in segs:
        seg = jax.lax.slice_in_dim(vals, s0, s0 + H * W, axis=0)
        v = seg.reshape((H, W) + trail)
        if c2 == 0:
            s = jnp.sum(v, axis=1)  # [H, *trail]
            if H == 1 or c1 == 0:
                out = out.at[b:b + 1].add(
                    jnp.sum(s, axis=0, keepdims=True))
            elif c1 == 1:
                out = out.at[b:b + H].add(s)
            else:
                buf = jnp.zeros((H, c1) + trail, vals.dtype)
                buf = buf.at[:, 0].set(s)
                out = out.at[b:b + H * c1].add(
                    buf.reshape((H * c1,) + trail))
            continue
        if c2 != 1 or c1 < 0:
            return None
        if H == 1:
            out = out.at[b:b + W].add(v[0])
            continue
        if c1 == 0:
            out = out.at[b:b + W].add(jnp.sum(v, axis=0))
            continue
        k = 1 if c1 >= W else -(-W // c1)
        for j in range(k):
            w0, w1 = j * c1, min((j + 1) * c1, W)
            part = v[:, w0:w1]
            if w1 - w0 < c1:
                part = jnp.pad(
                    part, [(0, 0), (0, c1 - (w1 - w0))] + [(0, 0)] * len(trail))
            out = out.at[b + j * c1:b + j * c1 + H * c1].add(
                part.reshape((H * c1,) + trail))
    return jax.lax.slice_in_dim(out, 0, N, axis=0)


def apply_slot_plan_rows(src, segs) -> Optional[jnp.ndarray]:
    """Execute a slot_gather_plan on axis 0: [N, F] -> [R, F]."""
    parts = []
    for (_s, H, W, b, c1, c2) in segs:
        w = window_rows(src, b, H, c1, W, c2)
        if w is None:
            return None
        parts.append(w.reshape((H * W,) + src.shape[1:]))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


# ---------------------------------------------------------------------------
# BSR column plans: values over the unknown axis v in [0, N)
# ---------------------------------------------------------------------------
# ColPlan: (v_start, n_rows, out_row_len, src_base, src_row_stride,
#           src_col_stride) meaning, for r in [0, n_rows) and
# t in [0, out_row_len):
#   table[v_start + r*out_row_len + t] == src_base + r*src_row_stride
#                                         + t*src_col_stride
# on VALID (mask=1) lanes; anything read on invalid lanes is masked to
# zero downstream, so the windowed read may return garbage there.
ColPlan = Tuple[int, int, int, int, int, int]


def col_plan_values(plan: ColPlan, N: int) -> np.ndarray:
    """The full [N] prediction of a column plan (for verification)."""
    v0, H, L, b, cr, cc = plan
    out = np.zeros(N, np.int64)
    r = np.arange(H, dtype=np.int64)[:, None]
    t = np.arange(L, dtype=np.int64)[None, :]
    vals = b + r * cr + t * cc
    span = min(H * L, N - v0)
    if span > 0:
        out[v0:v0 + span] = vals.reshape(-1)[:span]
    return out


def verify_col_plan(plan: ColPlan, table_col: np.ndarray,
                    mask_col: np.ndarray) -> bool:
    """Check the plan reproduces the numeric table on valid lanes and
    that every valid lane is inside the plan's coverage."""
    N = table_col.shape[0]
    v0, H, L, _b, _cr, _cc = plan
    valid = mask_col > 0
    cover = np.zeros(N, bool)
    cover[v0:min(v0 + H * L, N)] = True
    if np.any(valid & ~cover):
        return False
    pred = col_plan_values(plan, N)
    return bool(np.all(pred[valid] == table_col[valid].astype(np.int64)))


def apply_col_plan_rows(src, plan: ColPlan, N: int) -> Optional[jnp.ndarray]:
    """Rows variant: out [N, F] with out[v] = src[plan(v)] on covered
    lanes, zeros outside coverage."""
    v0, H, L, b, cr, cc = plan
    w = window_rows(src, b, H, cr, L, cc)
    if w is None:
        return None
    flat = w.reshape((H * L,) + src.shape[1:])
    if v0 > 0:
        flat = jnp.pad(flat, [(v0, 0)] + [(0, 0)] * (flat.ndim - 1))
    n = flat.shape[0]
    if n < N:
        flat = jnp.pad(flat, [(0, N - n)] + [(0, 0)] * (flat.ndim - 1))
    elif n > N:
        flat = jax.lax.slice_in_dim(flat, 0, N, axis=0)
    return flat


def apply_col_plan_minor(srcT, plan: ColPlan, N: int) -> Optional[jnp.ndarray]:
    """Minor variant: out [..., N] with out[..., v] = srcT[..., plan(v)]."""
    v0, H, L, b, cr, cc = plan
    w = window_minor(srcT, b, H, cr, L, cc)
    if w is None:
        return None
    lead = srcT.shape[:-1]
    flat = w.reshape(lead + (H * L,))
    pad_l, n = v0, v0 + H * L
    pad_r = max(0, N - n)
    if pad_l or pad_r:
        flat = jnp.pad(flat, [(0, 0)] * (flat.ndim - 1) + [(pad_l, pad_r)])
    if flat.shape[-1] > N:
        flat = jax.lax.slice_in_dim(flat, 0, N, axis=-1)
    return flat
