"""Batched random-cutout sampler — THE hot custom op of the framework.

Behavioral parity with reference `slice_imgs` (aphantasia/utils.py:218-254),
which runs a Python loop of `count` x {dynamic crop -> bicubic resize} calls.
That formulation is impossible under XLA's static shapes and would be
launch-bound anyway, so it is re-architected TPU-first:

* all `count` crop boxes are drawn as arrays in one keyed PRNG pass;
* each variable-size crop+bicubic-resize is expressed as a fixed-shape pair of
  per-sample interpolation matrices `cut[s] = Wy[s] @ img @ Wx[s]^T`
  (align_corners=True cubic weights from ops/resize.py), which XLA maps
  straight onto the MXU;
* `overscan`/`overmax` tile padding (utils.py:232-237) is folded into the
  interpolation matrices through static index maps (ops/tile.py) — the padded
  frame is never materialized;
* an optional Pallas kernel (ops/pallas_cutout.py) computes the same
  contraction with the frame pinned in VMEM, avoiding the [S,C,M,W]
  intermediate entirely.

Gradients flow through the matmuls back into the frame (the scatter that
builds Wy/Wx is constant w.r.t. the image), so the op is fully differentiable.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from aphantasia_tpu.ops.resize import resize_axis_taps
from aphantasia_tpu.ops.tile import pad_maps


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _contract(img, wy, wx, dt_name):
    """cuts[s,c,m,n] = wy[s,m,h] . img[c,h,w] . wx[s,n,w] with BOTH the
    forward intermediate and the backward cotangent chain held in the
    compute dtype.

    Without this, autodiff's transpose re-runs the contractions with the
    f32 cotangent against bf16 weight matrices — a mixed-precision dot
    XLA executes off the bf16 MXU path — and materializes the [S,C,M,W]
    intermediate in f32 (~690MB at the headline config; measured ~3ms of
    pure HBM/matmul waste per step).  The matrices are constant w.r.t.
    the image (sampler taps come from the PRNG), so the VJP is just the
    two transposed contractions.

    Contraction ORDER is chosen so the materialized [S,C,M,*] intermediate
    scales with min(H, W): contracting the WIDER frame axis first shrinks
    it H/W-fold (720p: 344MB -> 194MB bf16 — the r3 on-chip trace showed
    the intermediate's HBM round-trip as the single biggest non-tower op,
    ~4.6 ms/step across fwd+bwd).  SQUARE canvases must stay on the
    H-first branch (strict `<`): the intermediate is the same size either
    way, but the W-first einsum's [S,C,N,H] layout costs 18% of the whole
    4K step in retiling (on-chip A/B: 6.50 -> 7.95 it/s at 4096x4096,
    docs/TPU_MEASUREMENTS_r3.md section 5)."""
    dt = jnp.dtype(dt_name)
    if img.shape[1] < img.shape[2]:       # H < W: contract W first
        tmp = jnp.einsum("snw,chw->scnh", wx, img.astype(dt),
                         preferred_element_type=dt)
        return jnp.einsum("smh,scnh->scmn", wy, tmp,
                          preferred_element_type=jnp.float32)
    tmp = jnp.einsum("smh,chw->scmw", wy, img.astype(dt),
                     preferred_element_type=dt)
    return jnp.einsum("scmw,snw->scmn", tmp, wx,
                      preferred_element_type=jnp.float32)


def _contract_fwd(img, wy, wx, dt_name):
    return _contract(img, wy, wx, dt_name), (wy, wx, img.shape)


def _contract_bwd(dt_name, res, g):
    wy, wx, img_shape = res
    dt = jnp.dtype(dt_name)
    if img_shape[1] < img_shape[2]:       # mirror the fwd order
        d_tmp = jnp.einsum("scmn,smh->scnh", g.astype(dt), wy,
                           preferred_element_type=dt)
        d_img = jnp.einsum("snw,scnh->chw", wx, d_tmp,
                           preferred_element_type=jnp.float32)
    else:
        d_tmp = jnp.einsum("scmn,snw->scmw", g.astype(dt), wx,
                           preferred_element_type=dt)
        d_img = jnp.einsum("smh,scmw->chw", wy, d_tmp,
                           preferred_element_type=jnp.float32)
    # wy/wx carry no gradient path (PRNG-derived); zeros are DCE'd
    return d_img, jnp.zeros_like(wy), jnp.zeros_like(wx)


_contract.defvjp(_contract_fwd, _contract_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _win_cut(sampler, dt_name, img, csize, offx, offy):
    """Windowed-forward cutout (ops/pallas_cutout_win.py) with the dense
    transpose as backward.  The fwd builds only the WINDOW-REBASED
    weights (cheaper than dense) and keeps the inter-matmul intermediate
    in VMEM; the bwd rebuilds the dense matrices from the taps — so the
    ~145 MB wy/wx tensors never ride the residuals at all."""
    out, _ = _win_cut_fwd(sampler, dt_name, img, csize, offx, offy)
    return out


def _win_cut_fwd(sampler, dt_name, img, csize, offx, offy):
    from aphantasia_tpu.ops.pallas_cutout_win import windowed_cut_fwd
    dt = jnp.dtype(dt_name)
    boxes = Boxes(csize, offx, offy)
    wyw, wxt = sampler.weight_matrices_windowed(boxes, dtype=dt)
    cuts = windowed_cut_fwd(img.astype(dt), boxes, wyw, wxt,
                            sampler.modsize, compute_dtype=dt)
    return cuts, (csize, offx, offy, img.shape)


def _win_cut_bwd(sampler, dt_name, res, g):
    csize, offx, offy, img_shape = res
    dt = jnp.dtype(dt_name)
    wy, wx = sampler.weight_matrices(Boxes(csize, offx, offy), dtype=dt)
    if img_shape[1] < img_shape[2]:       # mirror _contract_bwd
        d_tmp = jnp.einsum("scmn,smh->scnh", g.astype(dt), wy,
                           preferred_element_type=dt)
        d_img = jnp.einsum("snw,scnh->chw", wx, d_tmp,
                           preferred_element_type=jnp.float32)
    else:
        d_tmp = jnp.einsum("scmn,snw->scmw", g.astype(dt), wx,
                           preferred_element_type=dt)
        d_img = jnp.einsum("smh,scmw->chw", wy, d_tmp,
                           preferred_element_type=jnp.float32)
    z = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return d_img, z(csize), z(offx), z(offy)


_win_cut.defvjp(_win_cut_fwd, _win_cut_bwd)


class Boxes(NamedTuple):
    """Per-sample crop boxes, in padded-frame coordinates."""
    csize: jnp.ndarray  # int32 [S] crop side
    offx: jnp.ndarray   # int32 [S]
    offy: jnp.ndarray   # int32 [S]


def _dense_w(idx, wts, n, dtype):
    """[S,M,4] taps -> dense [S,M,n] by 4 iota-compare passes."""
    iota = jnp.arange(n, dtype=jnp.int32)[None, None, :]
    acc = jnp.zeros(idx.shape[:2] + (n,), jnp.float32)
    for a in range(4):       # taps can repeat an index at crop borders
        acc = acc + jnp.where(iota == idx[:, :, a:a + 1],
                              wts[:, :, a:a + 1], 0.0)
    return acc.astype(dtype)


def _dense_w_t(idx, wts, n, dtype):
    """Transposed build: [S,M,4] taps -> [S,n,M] (for the windowed
    kernel's pre-transposed Wx operand)."""
    iota = jnp.arange(n, dtype=jnp.int32)[None, :, None]
    acc = jnp.zeros((idx.shape[0], n, idx.shape[1]), jnp.float32)
    for a in range(4):
        acc = acc + jnp.where(iota == idx[:, None, :, a],
                              wts[:, None, :, a], 0.0)
    return acc.astype(dtype)


@dataclasses.dataclass(frozen=True)
class CutoutSampler:
    """Static sampling config (compile-time constants).

    frame_size : (H, W) of the source frame
    count      : number of cutouts per step
    modsize    : CLIP input resolution (output side of every cutout)
    align      : 'uniform' | 'central' | 'overscan' | 'overmax'
                 (utils.py:222-237 semantics)
    macro      : probability of sampling a near-full-frame crop
                 (szmin = 0.9*min(H,W), utils.py:244)
    chunk      : samples per matmul chunk (bounds the [B,C,M,W] intermediate);
                 0 disables chunking
    """
    frame_size: tuple
    count: int
    modsize: int = 224
    align: str = "uniform"
    macro: float = 0.0
    chunk: int = 0
    use_pallas: bool = False

    @property
    def padded_size(self):
        h, w = self.frame_size
        if self.align == "overmax":
            return (2 * h, 2 * w)
        if "over" in self.align:
            return (int(1.5 * h), int(1.5 * w))
        return (h, w)

    @property
    def index_maps(self):
        """Static per-axis padded->source maps (numpy int32)."""
        return pad_maps(self.frame_size, self.padded_size, type="centr")

    # ---------------- box sampling (utils.py:218-247 parity) --------------

    def sample_boxes(self, key: jax.Array) -> Boxes:
        h, w = self.frame_size
        hp, wp = self.padded_size
        k_size, k_ox, k_oy, k_macro = jax.random.split(key, 4)
        s = self.count
        rnd_size = jax.random.uniform(k_size, (s,))
        if self.align == "central":  # normal around center, utils.py:223-225
            rnd_offx = jnp.clip(jax.random.normal(k_ox, (s,)) * 0.2 + 0.5, 0.0, 1.0)
            rnd_offy = jnp.clip(jax.random.normal(k_oy, (s,)) * 0.2 + 0.5, 0.0, 1.0)
        else:
            rnd_offx = jax.random.uniform(k_ox, (s,))
            rnd_offy = jax.random.uniform(k_oy, (s,))
        sz_max = float(min(h, w))  # min over ORIGINAL dims (utils.py:231)
        is_macro = jax.random.uniform(k_macro, (s,)) < self.macro
        sz_min = jnp.where(is_macro, 0.9 * sz_max, float(self.modsize))
        csize = (rnd_size * (sz_max - sz_min) + sz_min).astype(jnp.int32)
        offx = (rnd_offx * (wp - csize).astype(jnp.float32)).astype(jnp.int32)
        offy = (rnd_offy * (hp - csize).astype(jnp.float32)).astype(jnp.int32)
        return Boxes(csize, offx, offy)

    # ---------------- interpolation matrices ------------------------------

    def tap_indices(self, boxes: Boxes):
        """Per-sample bicubic taps, mapped to source coords.

        Returns (yidx, yw, xidx, xw): int32/float32 [S, modsize, 4].
        Taps clamp at the crop borders (exactly like torch's bicubic on the
        cropped view), then the overscan tile map sends padded coords to
        source coords.
        """
        m = self.modsize
        yidx, yw = resize_axis_taps(m, boxes.csize, boxes.offy)
        xidx, xw = resize_axis_taps(m, boxes.csize, boxes.offx)
        if self.padded_size != tuple(self.frame_size):
            # overscan/overmax only: padded->source via the tile maps.
            # (a table gather costs ~2ms at 200x224x4 on TPU — skip when
            # the map is the identity, i.e. no tiling pad)
            y_map, x_map = self.index_maps
            yidx = jnp.asarray(y_map)[yidx]
            xidx = jnp.asarray(x_map)[xidx]
        return yidx, yw, xidx, xw

    def weight_matrices(self, boxes: Boxes, dtype=jnp.float32):
        """Dense per-sample interpolation matrices Wy [S,M,H], Wx [S,M,W].

        Built by 4 iota-compare accumulation passes (one per bicubic tap)
        instead of a scatter-add — scatters lower to a serialized op on TPU
        (~2x the whole contraction's cost); the compares are plain VPU work
        that XLA fuses into one pass over the output.  `dtype` lets the hot
        path materialize the matrices directly in the matmul compute dtype
        (the tap weights accumulate in f32 first, so only the final store
        rounds)."""
        h, w = self.frame_size
        yidx, yw, xidx, xw = self.tap_indices(boxes)
        return (_dense_w(yidx, yw, h, dtype), _dense_w(xidx, xw, w, dtype))

    def weight_matrices_windowed(self, boxes: Boxes, dtype=jnp.float32):
        """Window-rebased weights for the Pallas windowed forward
        (ops/pallas_cutout_win.py): Wy [S,M,KHmax] with y-taps rebased to
        the sample's 16-aligned row base, and Wx pre-TRANSPOSED
        [S,KWmax,M] rebased to the 128-aligned col base — the kernel then
        slices [:, :k_h] / [:k_w, :] per tier with no in-kernel
        transposes.  Same taps as weight_matrices (exact parity)."""
        from aphantasia_tpu.ops.pallas_cutout_win import (window_bases,
                                                          tier_plan)
        h, w = self.frame_size
        yidx, yw, xidx, xw = self.tap_indices(boxes)
        tier, rb, cb = window_bases(boxes, h, w, self.modsize)
        plan = tier_plan(h, w, self.modsize)
        wyw = _dense_w(yidx - rb[:, None, None], yw, plan[-1][1], dtype)
        wxt = _dense_w_t(xidx - cb[:, None, None], xw, plan[-1][2], dtype)
        return wyw, wxt

    # ---------------- the cutout op ---------------------------------------

    def _win_eligible(self, img, compute_dtype=None) -> bool:
        """Windowed-forward gate: exact (non-overscan) frames whose padded
        row stride fits the VMEM pin budget (~6.5 MB at bf16), opt-in via
        APHANTASIA_WIN_CUTOUT=1 (r4; measured on-chip before defaulting).
        The budget scales with the ACTUAL compute dtype (windowed_cut_fwd
        pins img.astype(dt) — an f32 caller pins 2x the bf16 bytes), and a
        chunk-configured sampler is disqualified: _win_cut_bwd runs the
        dense transpose unchunked, re-materializing the [S,C,M,H]
        intermediate that chunking exists to bound."""
        import os
        if os.environ.get("APHANTASIA_WIN_CUTOUT") != "1":
            return False
        if self.padded_size != tuple(self.frame_size):
            return False   # overscan tile maps break window rebasing
        if self.chunk and self.count > self.chunk:
            return False   # dense bwd would defeat the chunk bound
        h, w = self.frame_size
        wp = -(-w // 128) * 128
        itemsize = jnp.dtype(compute_dtype or jnp.float32).itemsize
        return img.shape[0] * h * wp * itemsize <= 6_500_000

    def cut(self, img: jnp.ndarray, boxes: Boxes,
            compute_dtype=None) -> jnp.ndarray:
        """img [1,C,H,W] or [C,H,W] -> cutouts [S,C,M,M]."""
        if img.ndim == 4:
            img = img[0]
        if self.use_pallas:
            from aphantasia_tpu.ops.pallas_cutout import pallas_cut
            return pallas_cut(self, img, boxes)
        if self._win_eligible(img, compute_dtype):
            dtn = jnp.dtype(compute_dtype or jnp.float32).name
            return _win_cut(self, dtn, img, boxes.csize, boxes.offx,
                            boxes.offy)
        dt = compute_dtype or jnp.float32
        wy, wx = self.weight_matrices(boxes, dtype=dt)

        def chunk_fn(args):
            wy_c, wx_c = args
            return _contract(img, wy_c.astype(dt), wx_c.astype(dt),
                             jnp.dtype(dt).name)

        if self.chunk and self.count > self.chunk:
            b = self.chunk
            s = self.count
            pad = (-s) % b
            if pad:
                wy = jnp.concatenate([wy, jnp.zeros((pad,) + wy.shape[1:], wy.dtype)])
                wx = jnp.concatenate([wx, jnp.zeros((pad,) + wx.shape[1:], wx.dtype)])
            wy = wy.reshape(-1, b, *wy.shape[1:])
            wx = wx.reshape(-1, b, *wx.shape[1:])
            cuts = lax.map(chunk_fn, (wy, wx))
            cuts = cuts.reshape(-1, *cuts.shape[2:])[:s]
        else:
            cuts = chunk_fn((wy, wx))
        return cuts

    def __call__(self, key: jax.Array, img: jnp.ndarray,
                 transform=None, transform_key: jax.Array | None = None,
                 compute_dtype=None) -> jnp.ndarray:
        """Sample boxes + cut + optional augmentation transform.

        Functional equivalent of one `slice_imgs([img], ...)` call
        (utils.py:218-254); `transform` receives (key, cuts) when it wants
        randomness, else (cuts).
        """
        boxes = self.sample_boxes(key)
        cuts = self.cut(img, boxes, compute_dtype=compute_dtype)
        if transform is not None:
            if transform_key is not None:
                cuts = transform(transform_key, cuts)
            else:
                cuts = transform(cuts)
        return cuts


def slice_imgs(key: jax.Array, imgs, count: int, size: int = 224,
               transform=None, align: str = "uniform", macro: float = 0.0):
    """List-based convenience wrapper mirroring the reference signature
    (utils.py:218).  Returns a list of [S,C,size,size] arrays."""
    out = []
    for i, img in enumerate(imgs):
        k_i, k_t, key = jax.random.split(key, 3)
        hw = img.shape[-2:]
        sampler = CutoutSampler(tuple(hw), count, size, align, macro)
        out.append(sampler(k_i, img, transform=transform, transform_key=k_t))
    return out
