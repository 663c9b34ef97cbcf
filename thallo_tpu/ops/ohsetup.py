"""Fused one-hot setup aggregation: [F, R] channel-major parts summed
into [F, N] by a per-row id — the camera-side J^T r / diag / diag-block
assembly for one-hot row mode (blocksparse._oh_aggregate).

The XLA form (dot_oh_exact: 3-term bf16 split against a materialized
one-hot) is correct but pays layout machinery at BA-1M scale: XLA
loop-transposes the [F, R] parts to feed the dot's preferred layout and
materializes the [R, N] one-hot (2 GB bf16 at R=1M, N=1024) in HBM for
the three split passes — together the bulk of the measured ~30 ms
camera-side fixed cost (PERF.md "fixed-cost anatomy").  This kernel
owns both: it reads the parts tile CHANNEL-MAJOR exactly as produced,
regenerates the one-hot per R-tile in VMEM from `iota == ids`, performs
the 3-term bf16 split in VMEM (exact f32: the one-hot is exactly
representable, each output element is a plain f32 sum over its segment
— see segsum.bf16_split3), and accumulates f32 into a [F, N] VMEM
scratch written once.

Non-differentiable by construction (pallas_call has no AD rule), same
contract as dot_oh_exact: setup aggregation consumes already-computed
jacobians; nothing differentiates through it.
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
    return os.environ.get("THALLO_OH_SETUP", "1")


def oh_setup_eligible(F: int, R: int, N: int, dtype) -> bool:
    mode = _mode()
    if mode == "0":
        return False
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False  # f64 keeps the exact XLA path; bf16 parts use XLA
    if N > 2048 or N < 1 or F > 512:
        return False  # one-hot tile [N, r_blk] + acc [F, N] must fit VMEM
    if R * N < (1 << 24):
        return False  # small problems: XLA's form is already cheap
    if mode != "interpret" and jax.default_backend() not in ("tpu", "axon"):
        return False
    return True


def _kernel(ids_ref, parts_ref, out_ref, acc_ref, *, F, N, R, r_blk):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, r_blk), 1)
    valid = (i * r_blk + lane) < R
    ids = jnp.where(valid, ids_ref[0:1, :], N)  # invalid -> drop
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (N, r_blk), 0)
    oh = (iota_n == ids).astype(jnp.bfloat16)  # [N, r_blk]
    x = parts_ref[:]  # [F, r_blk] f32
    # NaN-in-padding guard: padded block reads are unspecified; zero
    # AFTER reading (0 * one-hot would not kill a NaN in the dot chain)
    x = jnp.where(valid, x, 0.0)
    # 3-term bf16 split (segsum.bf16_split3, in VMEM)
    h1 = x.astype(jnp.bfloat16)
    r1 = x - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = acc_ref[:]
    for h in (h1, h2, h3):
        acc = acc + jax.lax.dot_general(
            h, oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [F, N]
    acc_ref[:] = acc

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


# trace-time call counter (tests assert the path actually ran)
TRACE_COUNT = [0]


# ---------------------------------------------------------------------------
# In-kernel setup PRODUCTS: jtr / diag / eblock slabs computed in VMEM
# from the channel-major jacobian slots, then one-hot aggregated — the
# [F, R] parts array, the [Ci*Cj, R] eblock outer products AND the
# [R, N] one-hot never touch HBM.  At BA-1M the XLA form's chain
# (multiply_reduce [9,9,1M] write -> reshape [81,1M] -> pad into
# [99,1M] -> aggregate) costs ~8 ms of the fixed step and ~1.3 GB of
# HBM traffic; this kernel reads the 72 MB of jacobian slots once.
# Reference analog: PCGInit1's fused J^T r + preconditioner assembly
# (gauss_newton.t:676-731) — one pass over residuals per outer
# iteration, owning its layouts.
# ---------------------------------------------------------------------------

def oh_products_eligible(F: int, K: int, R: int, N: int, dtype) -> bool:
    """Same gates as oh_setup_eligible plus bounds on the slab widths
    (parts [F, r_blk] + operands [K, r_blk] must fit the VMEM tile)."""
    if not oh_setup_eligible(F, R, N, dtype):
        return False
    if K > 256 or F > 256:
        return False
    return True


def _products_kernel(ids_ref, r_ref, j_ref, out_ref, acc_ref, *,
                     F, N, R, r_blk, rc, recipe):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, r_blk), 1)
    valid = (i * r_blk + lane) < R
    ids = jnp.where(valid, ids_ref[0:1, :], N)  # invalid -> drop
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (N, r_blk), 0)
    oh = (iota_n == ids).astype(jnp.bfloat16)  # [N, r_blk]
    rr = r_ref[:]  # [rc, r_blk] f32
    # NaN-in-padding guard: zero AFTER reading (0 * one-hot would not
    # kill a NaN in the dot chain); zeroing r and j zeroes every slab
    rr = jnp.where(valid, rr, 0.0)
    jj = jnp.where(valid, j_ref[:], 0.0)  # [K, r_blk] f32

    # compute the part slabs (rc unrolled: Mosaic has no rank-3 reduce)
    slabs = []
    for ent in recipe:
        if ent[0] == "jtr":
            _, off, C = ent
            s = None
            for c in range(rc):
                t = jj[off + c * C:off + (c + 1) * C, :] * rr[c:c + 1, :]
                s = t if s is None else s + t
            slabs.append(s)  # [C, r_blk]
        elif ent[0] == "d2":
            _, off, C = ent
            s = None
            for c in range(rc):
                t = jj[off + c * C:off + (c + 1) * C, :]
                t = t * t
                s = t if s is None else s + t
            slabs.append(s)
        else:  # ("pair", offa, Ca, offb, Cb)
            _, offa, Ca, offb, Cb = ent
            # outer product as Ca stacked [Cb, r_blk] multiplies (2-D
            # only: a rank-3 [Ca, Cb, r_blk] reshape would re-tile the
            # 9-row sublane axis)
            s = None
            for c in range(rc):
                a = jj[offa + c * Ca:offa + (c + 1) * Ca, :]
                b = jj[offb + c * Cb:offb + (c + 1) * Cb, :]
                t = jnp.concatenate(
                    [a[ca:ca + 1, :] * b for ca in range(Ca)], axis=0)
                s = t if s is None else s + t
            slabs.append(s)  # [Ca*Cb, r_blk]
    x = jnp.concatenate(slabs, axis=0)  # [F, r_blk] f32

    # 3-term bf16 split (segsum.bf16_split3, in VMEM — exact, see
    # oh_setup_aggregate)
    h1 = x.astype(jnp.bfloat16)
    r1 = x - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = acc_ref[:]
    for h in (h1, h2, h3):
        acc = acc + jax.lax.dot_general(
            h, oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [F, N]
    acc_ref[:] = acc

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


PRODUCTS_TRACE_COUNT = [0]


@functools.partial(jax.jit, static_argnames=("N", "recipe", "interpret"))
def oh_setup_products(rT, Jall, ids, *, N, recipe, interpret=False):
    """rT [rc, R] f32, Jall [K, R] f32 (concat of channel-major jac
    slots, rows off+c*C_slot+ch), ids [R] int32 in [0, N) (out-of-range
    rows drop), recipe: static tuple of ("jtr", off, C) | ("d2", off, C)
    | ("pair", offa, Ca, offb, Cb) -> [F, N] f32 where F = sum of slab
    widths, slabs in recipe order (jtr_c = sum_rc J*r, d2 = sum_rc J^2,
    pair = sum_rc Ja (x) Jb), each aggregated by ids — exact (3-term
    bf16 split against the in-VMEM one-hot)."""
    PRODUCTS_TRACE_COUNT[0] += 1
    rc, R = rT.shape
    K = Jall.shape[0]
    F = 0
    for ent in recipe:
        F += ent[2] if ent[0] in ("jtr", "d2") else ent[2] * ent[4]
    budget = 6 * 1024 * 1024 - F * N * 4
    # per-lane: double-buffered j/r + parts slab f32 + 3 bf16 splits +
    # one-hot + the widest rank-3 outer-product intermediate
    widest = max((e[2] * e[4] for e in recipe if e[0] == "pair"),
                 default=0)
    per_lane = 2 * (K + rc) * 4 + F * 4 + 3 * F * 2 + N * 2 + widest * 4 + 8
    r_blk = max(256, min(4096, (budget // max(per_lane, 1) // 128) * 128))
    kern = functools.partial(_products_kernel, F=F, N=N, R=R, r_blk=r_blk,
                             rc=rc, recipe=recipe)
    out = pl.pallas_call(
        kern,
        grid=(_cdiv(R, r_blk),),
        in_specs=[
            pl.BlockSpec((1, r_blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rc, r_blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, r_blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((F, N), jnp.float32)],
        interpret=interpret,
    )(ids.reshape(1, R), rT, Jall)
    return out


@functools.partial(jax.jit, static_argnames=("N", "interpret"))
def oh_setup_aggregate(parts_cm, ids, *, N, interpret=False):
    """parts_cm [F, R] f32 (channel-major), ids [R] int32 in [0, N)
    (out-of-range rows drop) -> [F, N] f32, exact."""
    TRACE_COUNT[0] += 1
    F, R = parts_cm.shape
    budget = 6 * 1024 * 1024 - F * N * 4
    per_lane = 2 * F * 4 + N * 2 + 3 * F * 2 + 8
    r_blk = max(256, min(4096, (budget // max(per_lane, 1) // 128) * 128))
    kern = functools.partial(_kernel, F=F, N=N, R=R, r_blk=r_blk)
    out = pl.pallas_call(
        kern,
        grid=(_cdiv(R, r_blk),),
        in_specs=[
            pl.BlockSpec((1, r_blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, r_blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((F, N), jnp.float32)],
        interpret=interpret,
    )(ids.reshape(1, R), parts_cm)
    return out
