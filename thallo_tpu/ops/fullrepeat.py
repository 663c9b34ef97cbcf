"""Fused single-pass setup for a FULL-REPEAT level (sorted uniform
observation maps, idx[s0 + n*W + t] == n): jtr / d2 / diag-block /
w-major cross-block assembly straight from the channel-major jacobian
slots.

The XLA form (_setup_base_cm) computes per-observation products at
[*, R] and then pays minor-dim layout machinery to regroup the trailing
W axis: the [*, N, W] -> [*, W, N] transpose-copies and the [*, N, W]
w-sum relayouts measured ~13 ms of the BA uniform-1M fixed step (trace
r5: copy.60 3.7 + reshape.123 3.8 + copy.65/66 2.5 + reshape.124 3.4).
Those copies are slow because the W=4 minor dim crosses (8,128) tile
boundaries; no XLA formulation avoids the relayout.

This kernel owns the regrouping on the MXU instead: a CONSTANT one-hot
layout matrix sel[w*K + k, n] = (k == n*W + w) (shape [W*K, n_blk],
K = n_blk*W, identical for every tile — Mosaic keeps the block resident
in VMEM across the grid) permutes each operand tile from observation
order to per-w element order as an EXACT 3-term bf16-split dot
(segsum.bf16_split3: the one-hot selects exactly one k per output, so
the split terms reconstruct f32 bit-exactly).  The per-w products then
run on contiguous [*, n_blk] planes in VMEM:

  jtr_c   = sum_w sum_rc Jw * rw          (aggregated slab)
  d2_c    = sum_w sum_rc Jw * Jw
  diag_ab = sum_w sum_rc Jaw (x) Jbw
  cross   = per-w Jaw (x) Jbw             -> [W*Ca*Cb, N] w-major
                                             (ops/fusedpair.py layout)

Nothing per-observation ever reaches HBM: inputs are the raw slot
windows (read once), outputs are the [*, N] setup products.

Non-differentiable by construction (pallas_call has no AD rule), same
contract as ops/ohsetup.py: setup consumes already-computed jacobians.

Reference analog: the one-setup-per-outer-iteration block assembly of
gauss_newton.t:1331-1526, which owns its layouts the same way.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _mode() -> str:
    # 1 (default) = pallas on TPU, XLA elsewhere; 0 = never;
    # "interpret" = pallas interpreter everywhere (CPU tests)
    return os.environ.get("THALLO_FR_SETUP", "1")


def _pick_n_blk(W: int, Kall: int, rc: int, F_agg: int, F_cross: int) -> int:
    # resident sel [W*K, n_blk] bf16 with K = n_blk*W: W^2*n_blk^2*2
    # bytes — the dominant VMEM term; cap it at ~2.5 MB and the rest
    # (double-buffered operand tiles + split temps + out blocks) fits
    # comfortably below the 16 MB scoped limit.
    n = 128
    while True:
        n2 = n * 2
        sel_b = 2 * (W * W * n2 * n2) * 2
        io_b = 2 * (Kall + rc) * W * n2 * 4 * 2
        out_b = (F_agg + W * F_cross) * n2 * 4
        tmp_b = (Kall + rc) * n2 * 4 * 4
        if sel_b + io_b + out_b + tmp_b > 8 * 1024 * 1024 or n2 > 1024:
            return n
        n = n2


def fullrepeat_eligible(W: int, N: int, Kall: int, rc: int, dtype) -> bool:
    mode = _mode()
    if mode == "0":
        return False
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    if W > 8 or Kall > 128 or rc > 8:
        return False
    if N * W < (1 << 19):
        return False  # small problems: XLA's relayout is cheap enough
    if mode != "interpret" and jax.default_backend() not in ("tpu", "axon"):
        return False
    return True


def _split3(x):
    h1 = x.astype(jnp.bfloat16)
    r1 = x - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
    return h1, h2, h3


def _dot_sel(x, selw):
    """Exact f32 [rows, K] x one-hot [K, n_blk] -> [rows, n_blk]."""
    out = None
    for h in _split3(x):
        d = jax.lax.dot_general(h, selw, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        out = d if out is None else out + d
    return out


def _outer(a, b):
    """[Ca, n] x [Cb, n] -> [Ca*Cb, n] without a rank-3 reshape (the
    9-row sublane axis would re-tile)."""
    Ca = a.shape[0]
    return jnp.concatenate([a[i:i + 1, :] * b for i in range(Ca)], axis=0)


def _kernel(sel_ref, r_ref, j_ref, *refs, W, K, N_t, rc, recipe,
            F_agg, cross_widths, n_blk):
    n_cross = len(cross_widths)
    out_agg = refs[0]
    out_cross = refs[1:1 + n_cross]
    i = pl.program_id(0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    valid = (i * K + lane) < N_t * W
    rr = jnp.where(valid, r_ref[:], 0.0)   # [rc, K]
    jj = jnp.where(valid, j_ref[:], 0.0)   # [Kall, K]

    agg = None
    for w in range(W):
        selw = sel_ref[w * K:(w + 1) * K, :]  # [K, n_blk] bf16 one-hot
        rw = _dot_sel(rr, selw)               # [rc, n_blk]
        jw = _dot_sel(jj, selw)               # [Kall, n_blk]
        slabs = []
        for ent in recipe:
            kind = ent[0]
            if kind == "jtr":
                _, off, C = ent
                s = None
                for c in range(rc):
                    t = jw[off + c * C:off + (c + 1) * C, :] * rw[c:c + 1, :]
                    s = t if s is None else s + t
                slabs.append(s)
            elif kind == "d2":
                _, off, C = ent
                s = None
                for c in range(rc):
                    t = jw[off + c * C:off + (c + 1) * C, :]
                    s = (t * t) if s is None else s + t * t
                slabs.append(s)
            elif kind == "diag":
                _, offa, Ca, offb, Cb = ent
                s = None
                for c in range(rc):
                    t = _outer(jw[offa + c * Ca:offa + (c + 1) * Ca, :],
                               jw[offb + c * Cb:offb + (c + 1) * Cb, :])
                    s = t if s is None else s + t
                slabs.append(s)
            else:  # cross: direct per-w write, not aggregated
                ci, (_, offa, Ca, offb, Cb) = ent[5], ent[:5]
                s = None
                for c in range(rc):
                    t = _outer(jw[offa + c * Ca:offa + (c + 1) * Ca, :],
                               jw[offb + c * Cb:offb + (c + 1) * Cb, :])
                    s = t if s is None else s + t
                Fc = Ca * Cb
                out_cross[ci][w * Fc:(w + 1) * Fc, :] = s
        if slabs:
            x = jnp.concatenate(slabs, axis=0)  # [F_agg, n_blk]
            agg = x if agg is None else agg + x
    out_agg[:] = agg if agg is not None else jnp.zeros_like(out_agg)


TRACE_COUNT = [0]


@functools.partial(jax.jit,
                   static_argnames=("W", "N_t", "recipe", "interpret"))
def fullrepeat_setup(rT_win, Jall_win, *, W, N_t, recipe, interpret=False):
    """rT_win [rc, N_t*W] f32 (residual window, observation order),
    Jall_win [Kall, N_t*W] f32 (stacked channel-major jac-slot windows,
    rows off + rc*C + c), recipe: static tuple of
      ("jtr", off, C) | ("d2", off, C) | ("diag", offa, Ca, offb, Cb)
      | ("cross", offa, Ca, offb, Cb, cross_index)
    -> (agg [F_agg, N_t] f32, cross_0 [W*Ca*Cb, N_t] f32, ...)
    agg slabs in recipe order (w-summed); cross outputs w-major."""
    TRACE_COUNT[0] += 1
    rc, RW = rT_win.shape
    Kall = Jall_win.shape[0]
    assert RW == N_t * W, (RW, N_t, W)
    F_agg = 0
    cross_widths = []
    for ent in recipe:
        if ent[0] in ("jtr", "d2"):
            F_agg += ent[2]
        elif ent[0] == "diag":
            F_agg += ent[2] * ent[4]
        else:
            assert ent[5] == len(cross_widths)
            cross_widths.append(ent[2] * ent[4])
    n_blk = _pick_n_blk(W, Kall, rc, F_agg, sum(cross_widths))
    K = n_blk * W

    # constant layout one-hot: sel[w*K + k, n] = (k == n*W + w)
    kk = jax.lax.broadcasted_iota(jnp.int32, (W * K, n_blk), 0)
    nn = jax.lax.broadcasted_iota(jnp.int32, (W * K, n_blk), 1)
    w_of = kk // K
    k_of = kk % K
    sel = (k_of == nn * W + w_of).astype(jnp.bfloat16)

    kern = functools.partial(_kernel, W=W, K=K, N_t=N_t, rc=rc,
                             recipe=recipe, F_agg=F_agg,
                             cross_widths=tuple(cross_widths), n_blk=n_blk)
    out_shapes = ([jax.ShapeDtypeStruct((max(F_agg, 1), N_t), jnp.float32)]
                  + [jax.ShapeDtypeStruct((W * fc, N_t), jnp.float32)
                     for fc in cross_widths])
    out_specs = ([pl.BlockSpec((max(F_agg, 1), n_blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM)]
                 + [pl.BlockSpec((W * fc, n_blk), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
                    for fc in cross_widths])
    outs = pl.pallas_call(
        kern,
        grid=(_cdiv(N_t, n_blk),),
        in_specs=[
            pl.BlockSpec((W * K, n_blk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),  # resident
            pl.BlockSpec((rc, K), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kall, K), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(sel, rT_win, Jall_win)
    return outs[0], list(outs[1:])
