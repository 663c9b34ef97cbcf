"""Bilinear / trilinear image sampling with optional custom derivative
images.

TPU-native analog of the reference's SampledImage machinery
(/root/reference/API/src/thallo.t:899-980 `sample` codegen and
thallo.t:5784-5923 sampledimage with user-supplied dx/dy gradient images,
exercised by examples/optical_flow/optical_flow.t:11-26).  The reference
emits in-kernel gather+lerp Terra code; here sampling is a jnp gather+lerp
and the coordinate derivative is either the analytic lerp derivative or the
user's derivative images via jax.custom_jvp.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _gather2(img, ix, iy):
    """img: [W, H, C]; ix, iy: int arrays (clamped)."""
    W, H = img.shape[0], img.shape[1]
    ix = jnp.clip(ix, 0, W - 1)
    iy = jnp.clip(iy, 0, H - 1)
    return img[ix, iy]


def bilinear_sample(img: jnp.ndarray, x, y):
    """Bilinear interpolation of img ([W, H, C]) at float coords (x, y),
    clamped at the border (matches the reference's in-bounds guarded
    sample, thallo.t:899-936).  Returns [..., C]."""
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    i0 = x0.astype(jnp.int32)
    j0 = y0.astype(jnp.int32)
    v00 = _gather2(img, i0, j0)
    v10 = _gather2(img, i0 + 1, j0)
    v01 = _gather2(img, i0, j0 + 1)
    v11 = _gather2(img, i0 + 1, j0 + 1)
    return (
        v00 * (1 - fx) * (1 - fy)
        + v10 * fx * (1 - fy)
        + v01 * (1 - fx) * fy
        + v11 * fx * fy
    )


@functools.partial(jax.custom_jvp, nondiff_argnums=())
def sample_with_deriv_images(img, dximg, dyimg, x, y):
    """Bilinear sample whose coordinate-derivative is taken from
    user-provided derivative images instead of the lerp derivative
    (reference thallo.t:5887-5923: `sampledimage(im, dx, dy)`)."""
    return bilinear_sample(img, x, y)


@sample_with_deriv_images.defjvp
def _sample_jvp(primals, tangents):
    img, dximg, dyimg, x, y = primals
    _, _, _, tx, ty = tangents
    val = bilinear_sample(img, x, y)
    dx = bilinear_sample(dximg, x, y)
    dy = bilinear_sample(dyimg, x, y)
    tan = dx * tx[..., None] + dy * ty[..., None]
    return val, tan


def array_bilinear_sample(img: jnp.ndarray, x, y, t):
    """Per-slice bilinear sampling of a 3-D image array [W, H, T, C] at
    float coords (x, y) in slice round(t) (reference SampledImageArray,
    thallo.t:5887-5923, used by bundle_fusion's InterpolatedPositions).
    The slice index is not differentiated (it comes from an IndexValue)."""
    T = img.shape[2]
    ti = jnp.clip(jnp.round(jax.lax.stop_gradient(t)).astype(jnp.int32), 0, T - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    i0 = x0.astype(jnp.int32)
    j0 = y0.astype(jnp.int32)
    W, H = img.shape[0], img.shape[1]

    def g(ix, iy):
        ix = jnp.clip(ix, 0, W - 1)
        iy = jnp.clip(iy, 0, H - 1)
        return img[ix, iy, ti]

    return (
        g(i0, j0) * (1 - fx) * (1 - fy)
        + g(i0 + 1, j0) * fx * (1 - fy)
        + g(i0, j0 + 1) * (1 - fx) * fy
        + g(i0 + 1, j0 + 1) * fx * fy
    )


def conditional_array_sample(img: jnp.ndarray, x, y, t):
    """The reference's CONDITIONAL per-slice bilinear sample for 3-D
    image arrays (/root/reference/API/src/thallo.t:931-980): corners
    that are out of bounds or hold the invalid sentinel (first channel
    == -inf, how BundleFusion marks missing depth) are DROPPED and the
    remaining weights renormalized — first horizontally per row, then
    vertically across the two row results; if every corner is invalid
    the sample is the sentinel itself.  The slice index t is not
    differentiated."""
    W, H, T = img.shape[0], img.shape[1], img.shape[2]
    ti = jnp.clip(jnp.round(jax.lax.stop_gradient(t)).astype(jnp.int32),
                  0, T - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    ax = (x - x0)[..., None]
    by = (y - y0)[..., None]
    i0 = x0.astype(jnp.int32)
    j0 = y0.astype(jnp.int32)
    neg_inf = jnp.asarray(-jnp.inf, img.dtype)

    def corner(ix, iy):
        inb = (ix >= 0) & (iy >= 0) & (ix < W) & (iy < H)
        v = img[jnp.clip(ix, 0, W - 1), jnp.clip(iy, 0, H - 1), ti]
        valid = (inb & (v[..., 0] != neg_inf))[..., None]
        vz = jnp.where(valid, v, 0.0)
        return vz, valid.astype(img.dtype)

    def row(iy, beta_w):
        v0, m0 = corner(i0, iy)
        v1, m1 = corner(i0 + 1, iy)
        srow = v0 * (1 - ax) * m0 + v1 * ax * m1
        wrow = (1 - ax) * m0 + ax * m1
        p = srow / jnp.where(wrow > 0, wrow, 1.0)
        has = (wrow > 0).astype(img.dtype)
        return p * beta_w * has, beta_w * has

    s0, w0 = row(j0, (1 - by))
    s1, w1 = row(j0 + 1, by)
    ss, ww = s0 + s1, w0 + w1
    out = ss / jnp.where(ww > 0, ww, 1.0)
    return jnp.where(ww > 0, out, neg_inf)
