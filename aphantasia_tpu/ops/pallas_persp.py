"""Exact perspective warp — banded one-hot matmul Pallas TPU kernel.

Closes the one remaining augmentation deviation (VERDICT r1 item 3): the
hot path applied a least-squares affine FIT of the perspective because the
exact 4-tap warp (ops/perspective.py:homography_warp) goes through XLA's
TPU gather (~0.65 s/step fwd, ~3.5 s/step bwd via scatter).  This kernel
computes the exact torchvision bilinear+zeros+fill-mask semantics (see
ops/perspective.py header; reference aphantasia/transforms.py:166) with NO
gather at all:

* Bilinear is the tensor product of two 1px hat functions, so the warp is
  one banded interpolation matmul per axis.  For each 16-row output tile
  the kernel builds the x-weight matrix `Wx[x, p] = relu(1 - |sx(p) - x|)`
  on the fly (iota compare, the cutout sampler's trick, ops/sampler.py)
  and contracts it with a WINDOW of source rows on the MXU:
  `acc[k, p] = sum_x img[yb+k, x] * Wx[x, p]`; the 2-tap y-hat
  `Wy[k, p] = relu(1 - |sy(p) - (yb+k)|)` then reduces the window —
  exactly the 4-tap bilinear, never materializing gathers.
* The window start `yb` comes in per (sample, tile) via scalar prefetch:
  source-y extremes of a projective map over a rectangle sit at the tile
  corners (Mobius in u and v), so the host computes exact per-tile bases
  from 4 corner evaluations.  The window HEIGHT is a compile-time bound of
  the torchvision RandomPerspective(distortion) family: enumerating all
  2^8 extreme corner draws (the max — corner influence is monotone;
  confirmed by a 200k boundary-biased sweep) gives range <= 0.728*h
  forward / 0.243*h inverse at distortion 0.33.
* torchvision applies the perspective only with prob p and returns the
  input UNCHANGED otherwise (RandomPerspective.forward) — the kernel takes
  that Bernoulli as a prefetched per-sample flag and `pl.when`-skips the
  whole tile into a copy, so the expected cost is p * worst-case.

Layouts are chosen so every dynamic sublane window is 16-aligned (Mosaic
requires provably tile-aligned dynamic indices in the second-minor dim —
bases are floored to 16 and annotated `pl.multiple_of`; windows carry +16
slack).  The r4 rework batched the MXU issues (the r3-measured cost was
issue-serialization, not flops): the forward runs one [C*K, X] @
[X, G*ceil(W,128)] matmul per G=8 output rows (per-row weight matrices
concatenated along lanes at a 128-aligned stride), and the backward folds
each aligned 16-row cotangent chunk into ONE [C*tv, 16W] @ [16W, Qx] dot
via the block-matmul identity, accumulating dimg tiles in fp32.  Both
directions tier their window sizes per sample from exact corner ranges
(_fwd_bases_tiered / _bwd_bases_tiered), and the p=0.2 perspective stage
can route only DRAWN samples through the kernel via permutation
compaction (perspective_warp_compact — no scatter anywhere).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aphantasia_tpu.ops.perspective import (_inverse_coeffs, _src_positions,
                                            homography_warp)

_TV = 16            # output rows per grid step (bf16 sublane tile)


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _dot_precision(cdtype):
    """HIGHEST only for f32 operands: the TPU default truncates f32 matmul
    inputs to bf16 (measured 1e-2 deviation at identity), but Mosaic
    REJECTS an fp32 contract precision on bf16 operands ("Bad lhs type"
    on v5e) — and bf16 inputs have nothing left to truncate."""
    return (jax.lax.Precision.HIGHEST if cdtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def k_fwd(h: int) -> int:
    """Forward source-row window: covers the distortion<=0.33 family's
    per-16-row-tile sy range (max 0.728*h over the 2^8 extreme corner
    draws at h=224) + 2 interp taps + margin + 16 alignment slack (the
    window base is floored to a multiple of 16 for Mosaic)."""
    return min(_round_up(int(np.ceil(0.73 * h)) + 22, 16), h)


def k_small(h: int) -> int:
    """Small-tier forward window: ~96% of DRAWN distortion-0.33 samples
    have per-tile range <= 0.35*h (20k-draw measurement at h=224: p95 =
    74 = 0.33*h), so a second pl.when tier at this window cuts the
    expected matmul work ~1.7x; the rare wide draws take the k_fwd tier.
    +16 covers the 16-aligned window base."""
    return min(_round_up(int(0.36 * h) + 16, 16), h)


def k_bwd(h: int, tv: int = _TV) -> int:
    """Backward cotangent-row window: inverse-map row range over a tv-row
    input tile.  The range decomposes as ~tv * slope + cross-u spread:
    extreme-corner enumeration gives tv + 0.19*h at h in {64,224,384} for
    tv in {16,32} (e.g. 72.5 at h=224/tv=32, 41.5 at h=64/tv=32), so
    tv + 0.20*h + margin covers the family with >=6 rows to spare; +16
    covers the 16-aligned window base."""
    return min(_round_up(tv + int(np.ceil(0.20 * h)) + 28, 16), h)


def k_rot_fwd(h: int, w: int) -> int:
    """Forward window for the ±30° rotation family (torchvision
    random_rotate_fast, reference transforms.py:73-84): per-tile source-y
    range = sin|θ|·w + cos θ·tv ≤ 0.5·w + 0.87·16."""
    return min(_round_up(int(0.5 * w + 0.87 * _TV) + 22, 16), h)


def k_rot_small(h: int, w: int) -> int:
    """Small rotation tier: |θ| ≤ ~15° (half the nonzero draws of the
    uniform ±30° menu) has range ≤ 0.26·w + tv; the tier split itself is
    EXACT per sample (corner min/max in _fwd_bases_tiered)."""
    return min(_round_up(int(0.26 * w + _TV) + 22, 16), h)


def k_rot_bwd(h: int, w: int, tv: int) -> int:
    """Backward window for rotation: the inverse map is the rotation by
    -θ — same range formula over a tv-row input tile."""
    return min(_round_up(tv + int(0.5 * w + 0.87 * tv) + 28, 16), h)


def k_bwd_small(h: int, tv: int) -> int:
    """Small perspective bwd tier (r4): most drawn samples' inverse-map
    row range over a tv-row tile stays well under the 0.243*h family
    bound; the tier split is EXACT per sample (_bwd_bases_tiered)."""
    return min(_round_up(tv + int(np.ceil(0.10 * h)) + 28, 16), h)


def k_rot_bwd_small(h: int, w: int, tv: int) -> int:
    """Small rotation bwd tier: |θ| <= ~15° has inverse range
    <= 0.26*w + tv (half the nonzero draws of the uniform ±30° menu)."""
    return min(_round_up(tv + int(0.26 * w + tv) + 28, 16), h)


def _corner_minmax(coef, h, w, tv, inverse: bool):
    """[S, T] (min, max) over each 16-row tile of the source (or
    inverse-image) y-position, from the 4 tile-corner evaluations (exact:
    the map is Mobius, hence monotone, in u and in v separately)."""
    t_tiles = h // tv
    us = jnp.asarray([0.5, w - 0.5], jnp.float32)                 # [2]
    v0 = jnp.arange(t_tiles, dtype=jnp.float32) * tv
    vs = jnp.stack([v0 + 0.5, v0 + tv - 0.5], -1)                 # [T,2]
    uu = jnp.broadcast_to(us[None, None, :], (t_tiles, 2, 2))
    vv = jnp.broadcast_to(vs[:, :, None], (t_tiles, 2, 2))
    if inverse:
        inv = _inverse_coeffs(coef)                               # [S,3,3]
        den = (inv[:, 2, 0, None, None, None] * uu
               + inv[:, 2, 1, None, None, None] * vv
               + inv[:, 2, 2, None, None, None])
        sy = (inv[:, 1, 0, None, None, None] * uu
              + inv[:, 1, 1, None, None, None] * vv
              + inv[:, 1, 2, None, None, None]) / den - 0.5
    else:
        _, sy = _src_positions(coef, uu.reshape(1, t_tiles, 4),
                               vv.reshape(1, t_tiles, 4))         # [S,T,4]
    sy = sy.reshape(coef.shape[0], t_tiles, 4)
    return sy.min(-1), sy.max(-1)                                 # [S,T] x2


def _bwd_bases_tiered(coef, flags, h, w, tv, kb1, kb2, margin=3):
    """Tier the backward windows from the EXACT per-sample inverse-map
    ranges (r4: the bwd previously paid the worst-case family window for
    every drawn sample).  Same contract as _fwd_bases_tiered."""
    mn, mx = _corner_minmax(coef, h, w, tv, inverse=True)
    rng = (mx - mn).max(-1)                                       # [S]
    tier = jnp.where(rng + 24.0 <= kb1, 1, 2).astype(jnp.int32)
    flags = flags * tier
    kcap = jnp.where(flags == 1, max(h - kb1, 0),
                     max(h - kb2, 0)).astype(jnp.int32)           # [S]
    yb = jnp.floor(mn).astype(jnp.int32) - margin
    yb = (yb // 16) * 16        # Mosaic: dynamic sublane windows 16-aligned
    return flags, jnp.clip(yb, 0, kcap[:, None])


def _fwd_bases_tiered(coef, flags, h, w, tv, k1, k2):
    """Refine the 0/1 Bernoulli flags into window tiers (1 = small k1,
    2 = full k2) from the EXACT per-sample tile ranges, and clamp the
    per-tile window bases to the tier's window size."""
    mn, mx = _corner_minmax(coef, h, w, tv, inverse=False)
    rng = (mx - mn).max(-1)                                       # [S]
    tier = jnp.where(rng + 20.0 <= k1, 1, 2).astype(jnp.int32)
    flags = flags * tier
    kcap = jnp.where(flags == 1, max(h - k1, 0),
                     max(h - k2, 0)).astype(jnp.int32)            # [S]
    yb = jnp.floor(mn).astype(jnp.int32) - 1
    yb = (yb // 16) * 16        # Mosaic: dynamic sublane windows 16-aligned
    return flags, jnp.clip(yb, 0, kcap[:, None])


def _rational(cf, uu, vv):
    """Source positions on iota grids (all elementwise, broadcasting).
    `cf` is the 8-tuple of per-sample scalars read from SMEM once."""
    a, b, c0, d, e, f, g, hh = cf
    den = g * uu + hh * vv + 1.0
    sx = (a * uu + b * vv + c0) / den - 0.5
    sy = (d * uu + e * vv + f) / den - 0.5
    return sx, sy


def _tap_sum(s, n):
    """Analytic zeros-padding tap-weight sum of a 1D bilinear sample at
    position `s` over the lattice [0, n): (1-t)*in(y0) + t*in(y0+1)."""
    y0 = jnp.floor(s)
    t = s - y0
    in0 = ((y0 >= 0) & (y0 <= n - 1)).astype(s.dtype)
    in1 = ((y0 + 1 >= 0) & (y0 + 1 <= n - 1)).astype(s.dtype)
    return (1.0 - t) * in0 + t * in1


_FWD_G = 8          # output rows per MXU issue (group-concatenated wx)


def _fwd_kernel(flags_ref, ybase_ref, coef_ref, img_ref, imgtile_ref,
                out_ref, *, tv, k1, k2, h, w, c, cdtype):
    s = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(flags_ref[s] == 0)
    def _copy():
        # block-indexed tile (the index map slices): in-kernel pl.ds at a
        # grid-symbol offset misreads under Mosaic (measured on v5e)
        out_ref[0] = imgtile_ref[0]

    def _warp_body(k):
        # r4 rework: the per-row [C*K,X]@[X,W] dots serialized 16 MXU
        # issues per tile; concatenating G rows' weight matrices along the
        # lanes (stride padded to a 128 multiple so per-row slices stay
        # lane-tile aligned) makes it tv/G issues of N = G*wp lanes.
        g, wp = _FWD_G, _round_up(w, 128)
        yb = pl.multiple_of(ybase_ref[s, t], 16)
        cf = tuple(coef_ref[s, i] for i in range(8))
        bwin = img_ref[0, :, pl.ds(yb, k), :]                    # [C, K, X]
        bflat = bwin.reshape(c * k, w).astype(cdtype)            # [C*K, X]
        ybf = ybase_ref[s, t].astype(jnp.float32)
        li = jax.lax.broadcasted_iota(jnp.int32, (1, g * wp), 1)
        uu = (li % wp).astype(jnp.float32) + 0.5                 # [1, G*WP]
        rr = (li // wp).astype(jnp.float32)                      # row in group
        lane_ok = (li % wp) < w                                  # pad lanes
        xi = jax.lax.broadcasted_iota(jnp.int32, (w, g * wp), 0).astype(
            jnp.float32)                                         # [X, G*WP]
        ki = (jax.lax.broadcasted_iota(jnp.int32, (k, g * wp), 0).astype(
            jnp.float32) + ybf)                                  # [K, G*WP]
        for g0 in range(0, tv, g):
            vv = rr + (jnp.float32(0.5) + (t * tv + g0))
            sx, sy = _rational(cf, uu, vv)                       # [1, G*WP]
            wx = jnp.where(lane_ok,
                           jnp.maximum(0.0, 1.0 - jnp.abs(sx - xi)), 0.0)
            acc = jax.lax.dot_general(
                bflat, wx.astype(cdtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_dot_precision(cdtype))                # [C*K, G*WP]
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy - ki))        # [K, G*WP]
            val = jnp.sum(acc.reshape(c, k, g * wp) * wy[None], axis=1)
            mask = _tap_sum(sx, w) * _tap_sum(sy, h)             # [1, G*WP]
            vm = (val * mask).astype(out_ref.dtype)              # [C, G*WP]
            out_ref[0, :, g0:g0 + g, :] = vm.reshape(c, g, wp)[:, :, :w]

    if k1 == k2:
        @pl.when(flags_ref[s] != 0)
        def _w():
            _warp_body(k2)
    else:
        @pl.when(flags_ref[s] == 1)
        def _w1():
            _warp_body(k1)

        @pl.when(flags_ref[s] == 2)
        def _w2():
            _warp_body(k2)


def _bwd_kernel(flags_ref, pbase_ref, coef_ref, g_ref, gtile_ref,
                out_ref, *, tv, kb1, kb2, h, w, c, cdtype):
    s = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(flags_ref[s] == 0)
    def _copy():
        out_ref[0] = gtile_ref[0]

    def _warp_body(kb):
        # r4 rework: the per-cotangent-row [C*Tv,U]@[U,Qx] dots serialized
        # kb MXU issues per tile (the r3-measured cost explosion).  The
        # block-matmul identity sum_r A_r @ B_r = [A_1..A_16]@[[B_1];..]
        # folds each 16-row chunk into ONE [C*Tv, 16*WP]@[16*WP, Qx] dot
        # (K = 4096 fully pumps the MXU; 16x fewer issues), with the
        # per-row weight/mask builds done batched over the merged (r, u)
        # axis — the rationals evaluate on [16WP]-sized vectors only.
        # Mosaic cannot shape-cast a [C,16,W] window's sublanes into
        # lanes (probed: FAIL), so the cotangent arrives PRE-MERGED from
        # XLA as [C, H*WP] with WP = 128-padded W — the 16-row chunk is
        # then a dynamic LANE window at a 256-multiple (probed: OK).
        pb = pbase_ref[s, t]
        cf = tuple(coef_ref[s, i] for i in range(8))
        wp = _round_up(w, 128)
        n16 = 16 * wp
        # lane-merged (r, u) decomposition for A (lanes) ...
        li = jax.lax.broadcasted_iota(jnp.int32, (1, n16), 1)
        lane_ok = (li % wp) < w
        uu_l = (li % wp).astype(jnp.float32) + 0.5               # [1, 16WP]
        rr_l = (li // wp).astype(jnp.float32)
        # ... and sublane-merged (r, u) for B (sublanes)
        si = jax.lax.broadcasted_iota(jnp.int32, (n16, 1), 0)
        sub_ok = (si % wp) < w
        uc = (si % wp).astype(jnp.float32) + 0.5                 # [16WP, 1]
        rc = (si // wp).astype(jnp.float32)
        qxi = jax.lax.broadcasted_iota(
            jnp.int32, (n16, w), 1).astype(jnp.float32)          # lanes=qx
        yt = (jax.lax.broadcasted_iota(jnp.int32, (tv, n16), 0).astype(
            jnp.float32) + t * tv)                               # input row y

        def chunk(ci, acc):
            # aligned 16-row cotangent chunk, folded into one dot
            base = pl.multiple_of((pb + ci * 16) * wp, 256)
            gblk = g_ref[0, :, pl.ds(base, n16)]                 # [C, 16WP]
            j0 = (pb + ci * 16).astype(jnp.float32)
            jj_l = j0 + rr_l                                     # [1, 16WP]
            sx_l, sy_l = _rational(cf, uu_l, jj_l + 0.5)         # [1, 16WP]
            maskj = jnp.where(lane_ok,
                              _tap_sum(sx_l, w) * _tap_sum(sy_l, h), 0.0)
            wyj = jnp.maximum(0.0, 1.0 - jnp.abs(sy_l - yt))     # [Tv, 16WP]
            gm = gblk.astype(jnp.float32) * maskj                # [C, 16WP]
            a = (gm[:, None, :] * wyj[None]).reshape(c * tv, n16)
            jj_c = j0 + rc                                       # [16WP, 1]
            sx_c, _ = _rational(cf, uc, jj_c + 0.5)              # [16WP, 1]
            wxq = jnp.where(sub_ok, jnp.maximum(
                0.0, 1.0 - jnp.abs(sx_c - qxi)), 0.0)            # [16WP, Qx]
            return acc + jax.lax.dot_general(
                a.astype(cdtype), wxq.astype(cdtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_dot_precision(cdtype))                # [CT, Qx]

        acc = jax.lax.fori_loop(
            0, kb // 16, chunk, jnp.zeros((c * tv, w), jnp.float32))
        out_ref[0] = acc.reshape(c, tv, w).astype(out_ref.dtype)

    if kb1 == kb2:
        @pl.when(flags_ref[s] != 0)
        def _w():
            _warp_body(kb2)
    else:
        @pl.when(flags_ref[s] == 1)
        def _w1():
            _warp_body(kb1)

        @pl.when(flags_ref[s] == 2)
        def _w2():
            _warp_body(kb2)


def _prep(img, coef, flags):
    s, c, h, w = img.shape
    coef = coef.astype(jnp.float32)
    if flags is None:
        ident = jnp.asarray([1, 0, 0, 0, 1, 0, 0, 0], jnp.float32)
        flags = (jnp.abs(coef - ident) > 1e-5).any(-1)
    return coef, flags.astype(jnp.int32)


def _fwd_call(img, coef, flags, family="persp"):
    s, c, h, w = img.shape
    tv = _TV
    if family == "rotate":
        k1, k2 = k_rot_small(h, w), k_rot_fwd(h, w)
    else:
        k1, k2 = k_small(h), k_fwd(h)
    t_tiles = h // tv
    flags, ybase = _fwd_bases_tiered(coef, flags, h, w, tv, k1, k2)
    kern = functools.partial(_fwd_kernel, tv=tv, k1=k1, k2=k2, h=h, w=w,
                             c=c, cdtype=img.dtype)
    # Mosaic tiling: a block's last two dims must be (sublane,lane)-tile
    # aligned or full — coef rides SMEM as the FULL [S, 8] array (rows
    # picked by program_id in the kernel); the out block is the natural
    # [1, C, tv, W] tile so every write is static in the sublane dim.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s, t_tiles),
        in_specs=[
            pl.BlockSpec((s, 8), lambda i, t, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, h, w), lambda i, t, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, tv, w), lambda i, t, *_: (i, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, tv, w), lambda i, t, *_: (i, 0, t, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, c, h, w), img.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * s * c * k1 * w * tv * w * t_tiles,
            bytes_accessed=img.nbytes * 3,
            transcendentals=0),
        interpret=_interpret(),
    )(flags, ybase, coef, img, img)


def _bwd_call(g, coef, flags, family="persp"):
    s, c, h, w = g.shape
    # wider input tiles double the matmul's M (= c*tv rows) for better MXU
    # utilization; the window grows only ~1.2x (k_bwd), a clear net win
    tv = 32 if h % 32 == 0 else _TV
    if family == "rotate":
        kb1, kb2 = k_rot_bwd_small(h, w, tv), k_rot_bwd(h, w, tv)
    else:
        kb1, kb2 = k_bwd_small(h, tv), k_bwd(h, tv)
    t_tiles = h // tv
    flags, pbase = _bwd_bases_tiered(coef, flags, h, w, tv, kb1, kb2)
    # the chunk windows arrive lane-merged: [S, C, H*WP] with W padded to
    # a 128 multiple (the pad is one XLA copy; the reshape is free — the
    # layout is already contiguous).  See _warp_body's Mosaic note.
    wp = _round_up(w, 128)
    g2 = g if wp == w else jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, wp - w)))
    g2 = g2.reshape(s, c, h * wp)
    kern = functools.partial(_bwd_kernel, tv=tv, kb1=kb1, kb2=kb2, h=h,
                             w=w, c=c, cdtype=g.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s, t_tiles),
        in_specs=[
            pl.BlockSpec((s, 8), lambda i, t, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, h * wp), lambda i, t, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, tv, w), lambda i, t, *_: (i, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, tv, w), lambda i, t, *_: (i, 0, t, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, c, h, w), g.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * s * c * tv * w * w * kb1 * t_tiles,
            bytes_accessed=g.nbytes * 3,
            transcendentals=0),
        interpret=_interpret(),
    )(flags, pbase, coef, g2, g)


@functools.lru_cache(maxsize=None)
def kernel_supported(backend: str = None) -> bool:
    """One-time build-time probe: compile + run a tiny fwd/bwd instance on
    the current backend.  Mosaic support for this kernel's constructs
    (scalar prefetch, dynamic sublane windows) has to be proven on the
    real chip; on failure the augmentation pipeline falls back LOUDLY to
    the r1 affine-fit path instead of taking down the whole program
    (ops/augs.py:get_transform).  Keyed per backend; call OUTSIDE jit."""
    backend = backend or jax.default_backend()
    try:
        img = jnp.zeros((3, 1, 2 * _TV, 8), jnp.float32)
        # sample 0: y-scale 2 -> wide tile range (k_fwd tier); sample 1:
        # small translate (k_small tier); sample 2: identity copy branch
        coef = jnp.asarray([[1, 0, 0, 0, 2, 0, 0, 0],
                            [1, 0, 2, 0, 1, 1, 0, 0],
                            [1, 0, 0, 0, 1, 0, 0, 0]], jnp.float32)
        flags = jnp.asarray([1, 1, 0], jnp.int32)

        def f(x):
            return jnp.sum(_persp_core("persp", x, coef, flags) ** 2)

        jax.block_until_ready(jax.value_and_grad(f)(img))
        # the production step runs bf16 — Mosaic's dtype/precision checks
        # differ per operand type, so probe that path too (fwd + VJP)
        gb = jax.grad(lambda x: jnp.sum(
            _persp_core("persp", x, coef, flags).astype(jnp.float32) ** 2))(
                img.astype(jnp.bfloat16))
        jax.block_until_ready(gb)
        return True
    except Exception as e:  # pragma: no cover - hardware-dependent
        print("!!" + "!" * 72)
        print(f"!! pallas_persp kernel unsupported on backend {backend!r}:")
        print(f"!!   {e!r}"[:200])
        print("!! transforms_fast falls back to the affine-fit perspective "
              "(r1 path).")
        print("!!" + "!" * 72)
        return False


def perspective_warp(img, coef, flags=None, family="persp"):
    """Exact torchvision homography of [S,C,H,W] by [S,8] coeffs.

    Semantics == ops/perspective.py:homography_warp (bilinear, zeros
    padding, fill-0 mask; torch-golden in tests/test_perspective.py), but
    gather-free and O(p * banded-window) expected cost.  `flags` is the
    per-sample apply mask (torchvision RandomPerspective returns the input
    UNCHANGED when the Bernoulli fails — flag 0 copies exactly); derived
    from non-identity coeffs when omitted.  `family` selects the static
    window bounds the coefficients must come from: "persp" = the
    RandomPerspective distortion<=0.33 family (k_fwd/k_bwd), "rotate" =
    torchvision F.affine rotations |θ|<=30° (k_rot_* — the fully-exact
    opt-in pipeline routes its rotate stage here).  H must be a multiple
    of 16 (CLIP input sizes are) — anything else falls back to the XLA
    gather op."""
    if img.shape[2] % _TV:
        return homography_warp(img, coef)
    coef, flags = _prep(img, coef, flags)
    return _persp_core(family, img, coef, flags)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _persp_core(family, img, coef, flags):
    return _fwd_call(img, coef, flags, family)


def _core_fwd(family, img, coef, flags):
    return _fwd_call(img, coef, flags, family), (coef, flags)


def _core_bwd(family, res, g):
    coef, flags = res
    return (_bwd_call(g, coef, flags, family), jnp.zeros_like(coef),
            np.zeros(flags.shape, jax.dtypes.float0))


_persp_core.defvjp(_core_fwd, _core_bwd)


# --------------------------------------------------- drawn-sample compaction

def default_budget(s: int, p: float = 0.2) -> int:
    """Static compacted-batch size: Binomial(s, p) mean + 4.2 sigma + slack,
    8-aligned.  Overflow probability ~1e-8 per step — and overflow only
    falls back to the full-batch kernel, never changes semantics."""
    import math
    b = int(math.ceil(p * s + 4.2 * math.sqrt(p * (1 - p) * s))) + 2
    return min(s, _round_up(b, 8))


def perspective_warp_compact(img, coef, flags, family="persp", budget=None):
    """perspective_warp that routes ONLY drawn samples through the banded
    kernel (VERDICT r3 item 1 route a: the Bernoulli flags are PRNG-drawn
    before the warp, so a fixed-size sub-batch — argsort by flag — cuts
    the kernel's grid to ~p*S samples).  The undrawn rest rides two
    batch-axis permutation gathers (full-row DMA copies, no scatter
    anywhere: the custom VJP permutes the cotangent with the SAME index
    arrays).  A draw-count overflow beyond `budget` (see default_budget)
    falls back to the full-batch kernel under lax.cond — exact either way.
    """
    if flags is None or img.shape[2] % _TV:
        return perspective_warp(img, coef, flags, family)
    s = img.shape[0]
    if budget is None:
        budget = default_budget(s)
    if budget >= s:
        return perspective_warp(img, coef, flags, family)
    coef, flags = _prep(img, coef, flags)
    return _compact_core(family, int(budget), img, coef, flags)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _compact_core(family, budget, img, coef, flags):
    out, _ = _compact_fwd(family, budget, img, coef, flags)
    return out


def _compact_order(flags):
    order = jnp.argsort(-flags)          # drawn first; jnp.argsort is stable
    inv = jnp.argsort(order)
    return order, inv


def _compact_fwd(family, budget, img, coef, flags):
    order, inv = _compact_order(flags)
    n = jnp.sum(flags > 0)
    pc = jnp.take(coef, order[:budget], axis=0)
    pf = jnp.take(flags, order[:budget], axis=0)

    def compact(img):
        permuted = jnp.take(img, order, axis=0)
        warped = _fwd_call(permuted[:budget], pc, pf, family)
        return jnp.take(jnp.concatenate([warped, permuted[budget:]]),
                        inv, axis=0)

    def full(img):
        return _fwd_call(img, coef, flags, family)

    out = jax.lax.cond(n <= budget, compact, full, img)
    return out, (order, inv, n, coef, flags, pc, pf)


def _compact_bwd(family, budget, res, g):
    order, inv, n, coef, flags, pc, pf = res

    def compact(g):
        gp = jnp.take(g, order, axis=0)
        d_first = _bwd_call(gp[:budget], pc, pf, family)
        return jnp.take(jnp.concatenate([d_first, gp[budget:]]),
                        inv, axis=0)

    def full(g):
        return _bwd_call(g, coef, flags, family)

    dimg = jax.lax.cond(n <= budget, compact, full, g)
    return (dimg, jnp.zeros_like(coef),
            np.zeros(flags.shape, jax.dtypes.float0))


_compact_core.defvjp(_compact_fwd, _compact_bwd)
