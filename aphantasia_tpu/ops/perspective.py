"""Exact per-sample homography warp — torchvision semantics, scatter-free.

Replaces the least-squares affine FIT of the perspective augmentation
(VERDICT r1 item 3) with the true homography: pixel-exact torchvision
`F.perspective` / `F.affine` semantics (reference
aphantasia/transforms.py:166 applies `T.RandomPerspective(0.33, 0.2)` per
cutout, then `random_rotate_fast` = `F.affine(angle, fill=0)`, :165-170).

torchvision's tensor path is: solve the 8-dof homography from the corner
correspondences (`_get_perspective_coeffs`), build a grid over output
pixel CENTERS (x+0.5), map through the rational transform, and
`grid_sample(mode=bilinear, padding_mode=zeros, align_corners=False)`;
`fill=0` multiplies by the in-bounds mask sampled as an extra ones
channel (`_apply_grid_transform`).  The sampling position in input pixel
coordinates reduces to

    sx = (a*(x+.5) + b*(y+.5) + c) / (g*(x+.5) + h*(y+.5) + 1) - 0.5
    sy = (d*(x+.5) + e*(y+.5) + f) / (same denominator)        - 0.5

with 4-tap bilinear on the integer lattice, out-of-bounds taps zero, and
the whole pixel additionally scaled by the sum of in-bounds tap weights
(the fill-mask).  This module reproduces exactly that.

TPU strategy: the forward is 4 `take_along_axis` taps on the flattened
frame (XLA TPU handles axis-aligned dynamic gathers; what it cannot
handle is the SCATTER in the autodiff transpose — measured ~3.5s/step).
So the op carries a custom VJP whose backward is ANOTHER gather: the warp
is linear in the image, and each input pixel q receives cotangent only
from output pixels p whose sampling position lands within 1px of q, i.e.
p inside a small window around the inverse-map position dst(q).  We
enumerate a static (2R+1)^2 window (R=3 covers the Jacobian of the
perspective/rotation family with >2x margin), recompute the exact tap
weight for each candidate, and accumulate with `take_along_axis` — no
scatter anywhere.  Window sufficiency is asserted against torch autograd
in tests/test_perspective.py.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

# backward window radius: contributions satisfy |p - dst(q)|_inf <=
# Lip(dst) * 1 * sqrt(2) + rounding < 3 for |J_dst| <= 1.9 (the
# distortion-0.33 perspective family peaks near 1.5; rotations are 1)
_BWD_RADIUS = 3


def perspective_endpoints(key, s: int, h: int, w: int,
                          distortion: float = 0.33, p: float = 0.2):
    """torchvision RandomPerspective.get_params, batched: integer corner
    displacements via randint, identity (startpoints) with prob 1-p.

    Returns (startpoints [4,2] float, endpoints [s,4,2] float) in pixel
    coords, corners ordered topleft, topright, botright, botleft."""
    half_h, half_w = h // 2, w // 2
    dw = int(distortion * half_w)
    dh = int(distortion * half_h)
    ks = jax.random.split(key, 9)
    # randint bounds follow torchvision: low inclusive, high exclusive
    tl = jnp.stack([jax.random.randint(ks[0], (s,), 0, dw + 1),
                    jax.random.randint(ks[1], (s,), 0, dh + 1)], -1)
    tr = jnp.stack([jax.random.randint(ks[2], (s,), w - dw - 1, w),
                    jax.random.randint(ks[3], (s,), 0, dh + 1)], -1)
    br = jnp.stack([jax.random.randint(ks[4], (s,), w - dw - 1, w),
                    jax.random.randint(ks[5], (s,), h - dh - 1, h)], -1)
    bl = jnp.stack([jax.random.randint(ks[6], (s,), 0, dw + 1),
                    jax.random.randint(ks[7], (s,), h - dh - 1, h)], -1)
    endpoints = jnp.stack([tl, tr, br, bl], 1).astype(jnp.float32)
    startpoints = jnp.asarray(
        [[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]], jnp.float32)
    apply = (jax.random.uniform(ks[8], (s,)) < p)[:, None, None]
    endpoints = jnp.where(apply, endpoints,
                          jnp.broadcast_to(startpoints, endpoints.shape))
    return startpoints, endpoints


def _unit_to_quad(q):
    """Heckbert's closed-form projective map unit square -> quad.

    q: [s,4,2] corners ordered (0,0),(1,0),(1,1),(0,1)-images.  Returns
    [s,3,3].  Closed form instead of an 8x8 linear solve: elementwise ops
    only — jnp.linalg LU/inv custom calls crashed the experimental TPU
    runtime, and this is also exact for the affine case (g=h=0 falls out
    of the same formula for parallelogram quads)."""
    x0, y0 = q[:, 0, 0], q[:, 0, 1]
    x1, y1 = q[:, 1, 0], q[:, 1, 1]
    x2, y2 = q[:, 2, 0], q[:, 2, 1]
    x3, y3 = q[:, 3, 0], q[:, 3, 1]
    dx1, dy1 = x1 - x2, y1 - y2
    dx2, dy2 = x3 - x2, y3 - y2
    sx = x0 - x1 + x2 - x3
    sy = y0 - y1 + y2 - y3
    den = dx1 * dy2 - dx2 * dy1
    g = (sx * dy2 - dx2 * sy) / den
    h = (dx1 * sy - sx * dy1) / den
    a = x1 - x0 + g * x1
    b = x3 - x0 + h * x3
    c = x0
    d = y1 - y0 + g * y1
    e = y3 - y0 + h * y3
    f = y0
    one = jnp.ones_like(a)
    return jnp.stack([a, b, c, d, e, f, g, h, one], -1).reshape(-1, 3, 3)


def _adjugate3(m):
    """Batched 3x3 adjugate (inverse up to det — homographies are
    scale-invariant so the det never needs dividing out)."""
    a, b, c = m[:, 0, 0], m[:, 0, 1], m[:, 0, 2]
    d, e, f = m[:, 1, 0], m[:, 1, 1], m[:, 1, 2]
    g, h, i = m[:, 2, 0], m[:, 2, 1], m[:, 2, 2]
    adj = jnp.stack([
        e * i - f * h, c * h - b * i, b * f - c * e,
        f * g - d * i, a * i - c * g, c * d - a * f,
        d * h - e * g, b * g - a * h, a * e - b * d,
    ], -1).reshape(-1, 3, 3)
    return adj


def perspective_coeffs(startpoints, endpoints):
    """torchvision _get_perspective_coeffs, batched: 8 coeffs per sample
    mapping OUTPUT (endpoint-frame) pixel coords to INPUT (startpoint)
    coords.  startpoints [4,2] shared, endpoints [s,4,2].

    Computed as H = (unit->start) @ adj(unit->end), normalized to m22=1 —
    the same unique 4-point homography torchvision's float64 lstsq
    returns, via closed forms that lower to plain VPU ops on TPU."""
    s = endpoints.shape[0]
    sp = jnp.broadcast_to(startpoints[None], (s, 4, 2)).astype(jnp.float32)
    hs = _unit_to_quad(sp)
    he = _unit_to_quad(endpoints.astype(jnp.float32))
    m = jnp.einsum("sij,sjk->sik", hs, _adjugate3(he))
    m = m / m[:, 2:3, 2:3]
    return m.reshape(s, 9)[:, :8]


def affine_rotation_coeffs(angles_deg):
    """torchvision F.affine(angle, translate=0, scale=1, shear=0, fill=0)
    as homography coeffs for `homography_warp` (g=h=0).

    Tensor-path torchvision rotates about the grid center: the affine grid
    is built over centered pixel-CENTER coords (x+0.5-w/2), so in our
    (x+0.5)-based coeff convention the rotation center is (w/2, h/2) in
    center coordinates — handled by `homography_warp`'s `center` flag via
    coeffs built here against the same (x+0.5) frame at apply time.
    Returns [s,6] (a,b,c,d,e,f) with c,f expressed for the unit frame and
    resolved to pixels inside `rotation_coeffs_for`."""
    r = jnp.deg2rad(angles_deg)
    cos, sin = jnp.cos(r), jnp.sin(r)
    # inverse map (output->input) of a rotation by `r` about the center
    return jnp.stack([cos, sin, -sin, cos], -1)                   # [s,4]


def rotation_coeffs_for(angles_deg, h: int, w: int):
    """Full 8-coeff form of torchvision F.affine rotation for a HxW frame:
    src = R^{-1} (p - ctr) + ctr with ctr = (w/2, h/2) in the (x+0.5)
    pixel-center frame (torchvision _gen_affine_grid centers the base grid
    on the image center, not on pixel (w-1)/2)."""
    rc = affine_rotation_coeffs(angles_deg)
    cos, sin = rc[:, 0], rc[:, 1]
    cx, cy = w / 2.0, h / 2.0
    a, b = cos, sin
    d, e = -sin, cos
    c = cx - a * cx - b * cy
    f = cy - d * cx - e * cy
    z = jnp.zeros_like(a)
    return jnp.stack([a, b, c, d, e, f, z, z], -1)                # [s,8]


def affine_fit_centered(coef, h: int, w: int, grid_n: int = 5):
    """Least-squares affine fit of the exact homography over a grid_n x
    grid_n point grid, in the CENTERED pixel coordinates ops/sep_warp's
    affine_warp consumes.  Returns [s,2,3].

    This is the TPU hot-path evaluation of the perspective: the true 4-tap
    warp (homography_warp above) measured 0.65s/step through XLA's TPU
    gather in the full training program (~15x the whole step), so the
    pipeline warps through the gather-free separable LDU machinery at the
    best affine approximation of the EXACT homography — the random draw
    distribution (integer torchvision displacements) and the fitted map
    come from the true transform; only the projective bending inside one
    sample deviates.  Closed-form normal equations (3x3 adjugate), no
    linalg custom calls."""
    s = coef.shape[0]
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    gx = jnp.linspace(0.0, w - 1.0, grid_n)
    gy = jnp.linspace(0.0, h - 1.0, grid_n)
    xx, yy = jnp.meshgrid(gx, gy)                       # [g,g] pixel coords
    sx, sy = _src_positions(coef, xx[None] + 0.5, yy[None] + 0.5)  # [s,g,g]
    # centered frames
    dstx = (xx - cx).reshape(-1)
    dsty = (yy - cy).reshape(-1)
    srcx = sx.reshape(s, -1) - cx
    srcy = sy.reshape(s, -1) - cy
    n = dstx.shape[0]
    ones = jnp.ones_like(dstx)
    x_ = jnp.stack([dstx, dsty, ones], -1)              # [n,3]
    xtx = x_.T @ x_                                     # [3,3] shared
    # closed-form 3x3 inverse (adjugate / det)
    adj = _adjugate3(xtx[None])[0]
    det = (xtx[0, 0] * adj[0, 0] + xtx[0, 1] * adj[1, 0]
           + xtx[0, 2] * adj[2, 0])
    inv = adj / det
    xty = jnp.einsum("ni,sn->si", x_, srcx)             # [s,3]
    row_x = jnp.einsum("ij,sj->si", inv, xty)
    xty = jnp.einsum("ni,sn->si", x_, srcy)
    row_y = jnp.einsum("ij,sj->si", inv, xty)
    return jnp.stack([row_x, row_y], 1)                 # [s,2,3]


def compose_coeffs(c1, c2):
    """Coeffs of warp-by-c1 THEN warp-by-c2 as one homography.

    Stage k maps its output coords to its input coords (src = M_k p), so
    the pipeline cut -> warp(c1) -> warp(c2) samples the cut at
    M1 @ M2 @ p.  c1/c2: [s,8]; returns [s,8] normalized to m22 == 1."""
    def mat(c):
        s = c.shape[0]
        return jnp.concatenate([c, jnp.ones((s, 1), c.dtype)],
                               -1).reshape(s, 3, 3)
    m = jnp.einsum("sij,sjk->sik", mat(c1), mat(c2))
    m = m / m[:, 2:3, 2:3]
    return m.reshape(-1, 9)[:, :8]


def _src_positions(coef, xx, yy):
    """coef [s,8]; xx/yy [h,w] pixel-center grids (x+0.5).  Returns input
    pixel coordinates (sx, sy) [s,h,w] (centers removed: -0.5)."""
    a, b, c, d, e, f, g, hh = [coef[:, i][:, None, None] for i in range(8)]
    den = g * xx + hh * yy + 1.0
    sx = (a * xx + b * yy + c) / den - 0.5
    sy = (d * xx + e * yy + f) / den - 0.5
    return sx, sy


def _inverse_coeffs(coef):
    """Inverse homography as [s,3,3] (for the backward window centers) —
    adjugate + normalization, no linalg custom call (see _unit_to_quad)."""
    s = coef.shape[0]
    m = jnp.concatenate([coef, jnp.ones((s, 1), coef.dtype)],
                        -1).reshape(s, 3, 3)
    adj = _adjugate3(m)
    return adj / adj[:, 2:3, 2:3]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def homography_warp(img, coef):
    """img [S,C,H,W], coef [S,8] -> warped [S,C,H,W], exact torchvision
    bilinear + zeros padding + fill-0 mask semantics."""
    return _warp_fwd_impl(img, coef)


def _grids(h, w, dtype=jnp.float32):
    xg = jnp.arange(w, dtype=dtype) + 0.5
    yg = jnp.arange(h, dtype=dtype) + 0.5
    return jnp.meshgrid(xg, yg)


def _warp_fwd_impl(img, coef):
    s, c, h, w = img.shape
    xx, yy = _grids(h, w)
    sx, sy = _src_positions(coef, xx, yy)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    tx = (sx - x0).astype(img.dtype)
    ty = (sy - y0).astype(img.dtype)
    flat = img.reshape(s, c, h * w)
    out = jnp.zeros((s, c, h, w), img.dtype)
    mask = jnp.zeros((s, h, w), img.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            wgt = (tx if dx else 1 - tx) * (ty if dy else 1 - ty)
            ok = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)).astype(img.dtype)
            idx = (jnp.clip(yi, 0, h - 1) * w
                   + jnp.clip(xi, 0, w - 1)).astype(jnp.int32)
            tap = jnp.take_along_axis(flat, idx.reshape(s, 1, h * w), axis=2)
            out = out + tap.reshape(s, c, h, w) * (wgt * ok)[:, None]
            mask = mask + wgt * ok
    # torchvision fill=0: multiply by the ones-channel sample (the sum of
    # in-bounds tap weights) — border pixels attenuate twice
    return out * mask[:, None]


def _warp_fwd(img, coef):
    return _warp_fwd_impl(img, coef), coef


def _warp_bwd(coef, g):
    s, c, h, w = g.shape   # output shape == input shape
    inv = _inverse_coeffs(coef)

    # dst(q): continuous output coordinate whose src position is q
    xq, yq = _grids(h, w)                                  # input centers
    den = inv[:, 2, 0, None, None] * xq + inv[:, 2, 1, None, None] * yq \
        + inv[:, 2, 2, None, None]
    px = (inv[:, 0, 0, None, None] * xq + inv[:, 0, 1, None, None] * yq
          + inv[:, 0, 2, None, None]) / den - 0.5
    py = (inv[:, 1, 0, None, None] * xq + inv[:, 1, 1, None, None] * yq
          + inv[:, 1, 2, None, None]) / den - 0.5
    p0x = jnp.round(px)
    p0y = jnp.round(py)

    gflat = g.reshape(s, c, h * w)
    grad = jnp.zeros((s, c, h, w), g.dtype)
    qx = (xq - 0.5)                                        # integer q coords
    qy = (yq - 0.5)
    r = _BWD_RADIUS
    for dpy in range(-r, r + 1):
        for dpx in range(-r, r + 1):
            pxi = p0x + dpx                                # candidate out px
            pyi = p0y + dpy
            pok = (pxi >= 0) & (pxi < w) & (pyi >= 0) & (pyi < h)
            pxc = jnp.clip(pxi, 0, w - 1)
            pyc = jnp.clip(pyi, 0, h - 1)
            # exact src position and fill-mask of candidate p; the bilinear
            # hat assigns p->q weight relu(1 - |src(p) - q|) per axis
            sx, sy = _src_positions(coef, pxc + 0.5, pyc + 0.5)
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx - qx))
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy - qy))
            # p's own mask (sum of in-bounds tap weights at p)
            x0 = jnp.floor(sx)
            y0 = jnp.floor(sy)
            tx = sx - x0
            ty = sy - y0
            pmask = 0.0
            for dy in (0, 1):
                for dx in (0, 1):
                    ok = ((x0 + dx >= 0) & (x0 + dx < w)
                          & (y0 + dy >= 0) & (y0 + dy < h))
                    wgt = (tx if dx else 1 - tx) * (ty if dy else 1 - ty)
                    pmask = pmask + wgt * ok
            idx = (pyc * w + pxc).astype(jnp.int32)
            gtap = jnp.take_along_axis(gflat, idx.reshape(s, 1, h * w),
                                       axis=2).reshape(s, c, h, w)
            wq = (wx * wy * pmask * pok).astype(g.dtype)
            grad = grad + gtap * wq[:, None]
    return grad, jnp.zeros_like(coef)


homography_warp.defvjp(_warp_fwd, _warp_bwd)
