"""Spatially-sharded DWT decode — halo-exchange inverse wavelet transform.

The DWT counterpart of parallel/spatial.py's SpatialFFT (SURVEY.md §2.6 row
4 names "halo exchange for DWT convs" as the sequence-parallel analog for
giant canvases; reference scale claim README.md:17).  The wavelet pyramid
(params/dwt.py layout: [Yl, Yh_1(finest) .. Yh_J]) is row-sharded over the
'spatial' mesh axis for the K finest levels — the levels that hold ~94% of
the parameters (sizes fall 4x per level) — while the coarse tail
reconstructs replicated on every chip (identical tiny compute, no
collectives).

Sharded synthesis per level (separable, rows first like params/dwt.py
waverec2):

  * H axis: out row t of the upsampling synthesis conv reads input rows
    [ceil((t-1)/2), floor((t+L-2)/2)] — with output partitions aligned at
    exactly 2x the input partitions, each shard needs only floor(L/2) halo
    rows from its LOWER neighbor: one ppermute per pass, then the dense
    conv machinery (params/dwt.py:_idwt_axis) on the extended rows.
  * W axis: unsharded, the dense op verbatim.

Alignment is kept by a padded-height cascade: the deepest sharded level is
padded to a shard multiple m_p[K] = align(m_K, n) and every finer container
doubles, m_p[j-1] = 2*m_p[j] (always >= the real m_{j-1} = 2*m_j - L + 1|2).
Pad rows are EXACT zeros end to end: param pads start zero and receive zero
gradient (no real output row reads them), synthesis outputs are masked back
to the real row count per level, and the synthesis conv treats missing rows
as zeros exactly like the dense path's boundary padding.  The cost is
<= (2^K·align(m_K) - H)/H extra rows of synthesis work at the fine levels
(~12% at 4K over 8 shards) — the price of never resharding between levels.

The cutout contraction / render / sharpness machinery is inherited from
SpatialCanvas (the image container is H_p = 2*m_p[1] rows; wy row-weights
are zero-padded to it, so contractions are exact).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aphantasia_tpu.parallel.spatial import SpatialCanvas, _pad_to
from aphantasia_tpu.params.wavelets import wavelet_filters, dwt_max_level
from aphantasia_tpu.params.dwt import _idwt_axis, dwt_shapes


def _idwt_rows_sharded(lo, hi, rec_lo, rec_hi, halo: int, n_shards: int):
    """One H-axis synthesis step on row-sharded inputs [..., mloc, W] ->
    local output rows [..., 2*mloc, W] of the 2x container.

    Shard s holds input rows [s*mloc, (s+1)*mloc) and produces output rows
    [2*s*mloc, 2*(s+1)*mloc).  Output row t of the upsampling conv reads
    input rows [ceil((t-1)/2), floor((t+L-2)/2)] — a FORWARD window, so the
    halo is the LOWER neighbor's first floor(L/2) rows: one ppermute up
    (the last shard receives zeros — the dense path's boundary padding),
    then the dense synthesis conv (params/dwt.py:_idwt_axis) on the
    extended rows, keeping the first 2*mloc outputs."""
    if n_shards == 1:
        return _idwt_axis(lo, hi, rec_lo, rec_hi, axis=-2,
                          n_out=2 * lo.shape[-2])
    perm = [(i, i - 1) for i in range(1, n_shards)]
    lo_h = jax.lax.ppermute(lo[..., :halo, :], "spatial", perm)
    hi_h = jax.lax.ppermute(hi[..., :halo, :], "spatial", perm)
    lo_ext = jnp.concatenate([lo, lo_h], axis=-2)
    hi_ext = jnp.concatenate([hi, hi_h], axis=-2)
    mloc = lo.shape[-2]
    out = _idwt_axis(lo_ext, hi_ext, rec_lo, rec_hi, axis=-2,
                     n_out=2 * mloc)
    return out


class SpatialDWT(SpatialCanvas):
    """DWT parameterizer decode + cutout distributed over mesh['spatial'].

    Mirrors params/dwt.py:DWTParameterizer semantics (per-level sharpness
    rescale, inverse DWT, global Bessel contrast normalization) with the
    finest `k_fine` pyramid levels row-sharded.  `shard(params)` takes
    canonical params (resume_dwt output) onto the mesh; `unpad(params)`
    returns them to the reference layout for .pt snapshots."""

    def __init__(self, size, wave: str, sharp: float, colors: float,
                 mesh: Mesh):
        self.size = tuple(size)
        self.wave = wave
        self.sharp = sharp
        self.colors = colors
        self.mesh = mesh
        self.n = mesh.shape["spatial"]
        self.data_axis = ("data" if "data" in mesh.axis_names
                          and mesh.shape["data"] > 1 else None)
        # maxlevel always computed with db1 (reference image.py:35)
        self.level = dwt_max_level(min(self.size))
        self.real_shapes = dwt_shapes(self.size, wave, self.level)
        _, _, self.rec_lo, self.rec_hi = wavelet_filters(wave)
        length = len(self.rec_lo)
        self.halo = length // 2
        # shard the finest levels whose local rows can cover the halo with
        # one neighbor exchange and keep the waste bounded (mloc >= 2*halo)
        k = 0
        for j in range(1, self.level + 1):
            if self.real_shapes[j][3] >= self.n * 2 * self.halo:
                k = j
            else:
                break
        self.k_fine = k
        self.mp = {}
        if k:
            self.mp[k] = _pad_to(self.real_shapes[k][3], self.n)
            for j in range(k - 1, 0, -1):
                self.mp[j] = 2 * self.mp[j + 1]
            self.h_container = 2 * self.mp[1]
        else:
            self.h_container = _pad_to(self.size[0], self.n)

    # ---- params --------------------------------------------------------------

    def _level_sharding(self, j: int):
        if 1 <= j <= self.k_fine:
            return NamedSharding(self.mesh, P(None, None, None, "spatial",
                                              None))
        return NamedSharding(self.mesh, P())

    def param_specs(self):
        return [P(None, None, None, "spatial", None)
                if 1 <= j <= self.k_fine else P()
                for j in range(self.level + 1)]

    def init(self, key, sd: float = 1.0):
        from aphantasia_tpu.params.dwt import DWTParameterizer
        par = DWTParameterizer(self.size, self.wave, self.sharp, self.colors)
        return self.shard(par.init(key, sd))

    def shard(self, params):
        """Canonical [Yl, Yh_1..Yh_J] -> padded, mesh-placed pyramid."""
        out = []
        for j, p in enumerate(params):
            if 1 <= j <= self.k_fine:
                pad = self.mp[j] - p.shape[3]
                if pad:
                    p = jnp.pad(p, ((0, 0),) * 3 + ((0, pad), (0, 0)))
            out.append(jax.device_put(p, self._level_sharding(j)))
        return out

    def unpad(self, params):
        """Slice padded sharded levels back to the reference layout."""
        return [p[:, :, :, :self.real_shapes[j][3]]
                if 1 <= j <= self.k_fine else p
                for j, p in enumerate(params)]

    # ---- decode ---------------------------------------------------------------

    def aux_specs(self):
        return ()

    def _make_aux(self, shift):
        del shift  # DWT decode ignores spectrum shift (params/dwt.py:176)
        return ()

    def noise_shift(self, key, settings):
        # dense parity: the DWT decode drops its shift input, so the noise
        # draw contributes nothing — skip generating it
        return None

    def _scales(self):
        """Static per-level sharpness rescale (params/dwt.py:dwt_scale from
        the REAL, unpadded shapes)."""
        h0, w0 = self.real_shapes[1][3:5]
        return [((h0 * w0) / (s[3] * s[4])) ** (1.0 - self.sharp)
                for s in self.real_shapes[1:]]

    def _mask_rows(self, x, n_real: int):
        """Zero container rows >= n_real (global row index)."""
        tloc = x.shape[-2]
        row = jax.lax.axis_index("spatial") * tloc + jnp.arange(tloc)
        return x * (row < n_real)[:, None]

    def _decode_local(self, params_loc, aux_loc):
        del aux_loc
        h, w = self.size
        scales = self._scales()
        ll = params_loc[0]
        # coarse tail: replicated dense synthesis (params/dwt.py:waverec2)
        for j in range(self.level, self.k_fine, -1):
            yh = params_loc[j] * scales[j - 1]
            lh, hl, hh = yh[:, :, 0], yh[:, :, 1], yh[:, :, 2]
            th, tw = ((self.real_shapes[j - 1][3], self.real_shapes[j - 1][4])
                      if j > 1 else (h, w))
            ll = ll[..., :lh.shape[-2], :lh.shape[-1]]
            lo_w = _idwt_axis(ll, lh, self.rec_lo, self.rec_hi, axis=-2,
                              n_out=th)
            hi_w = _idwt_axis(hl, hh, self.rec_lo, self.rec_hi, axis=-2,
                              n_out=th)
            ll = _idwt_axis(lo_w, hi_w, self.rec_lo, self.rec_hi, axis=-1,
                            n_out=tw)
        idx = jax.lax.axis_index("spatial")
        if self.k_fine:
            # transition: replicated [1,3,m_K,w_K] -> this shard's rows of
            # the padded container
            mp_k = self.mp[self.k_fine]
            mloc = mp_k // self.n
            ll = jnp.pad(ll, ((0, 0),) * 2 + ((0, mp_k - ll.shape[-2]),
                                              (0, 0)))
            ll = jax.lax.dynamic_slice_in_dim(ll, idx * mloc, mloc, axis=-2)
            for j in range(self.k_fine, 0, -1):
                yh = params_loc[j] * scales[j - 1]       # [1,3,3,mloc_j,w_j]
                lh, hl, hh = yh[:, :, 0], yh[:, :, 1], yh[:, :, 2]
                th, tw = ((self.real_shapes[j - 1][3],
                           self.real_shapes[j - 1][4])
                          if j > 1 else (h, w))
                lo_w = _idwt_rows_sharded(ll, lh, self.rec_lo, self.rec_hi,
                                          self.halo, self.n)
                hi_w = _idwt_rows_sharded(hl, hh, self.rec_lo, self.rec_hi,
                                          self.halo, self.n)
                # mask garbage rows (the dense path CROPS to th; zeros feed
                # the next level identically to its implicit boundary pad)
                lo_w = self._mask_rows(lo_w, th)
                hi_w = self._mask_rows(hi_w, th)
                ll = _idwt_axis(lo_w, hi_w, self.rec_lo, self.rec_hi,
                                axis=-1, n_out=tw)
        else:
            # canvas too small to shard the synthesis: decode replicated,
            # slice this shard's container rows (contraction stays sharded)
            hloc = self.h_container // self.n
            ll = jnp.pad(ll, ((0, 0),) * 2
                         + ((0, self.h_container - ll.shape[-2]), (0, 0)))
            ll = jax.lax.dynamic_slice_in_dim(ll, idx * hloc, hloc, axis=-2)
        # global Bessel contrast normalization over REAL pixels (pads are
        # exact zeros, so the sums need no masking; count = real count)
        s1 = jax.lax.psum(jnp.sum(ll), "spatial")
        s2 = jax.lax.psum(jnp.sum(ll * ll), "spatial")
        cnt = 3 * h * w
        var = (s2 - s1 * s1 / cnt) / (cnt - 1)
        img = ll * jax.lax.rsqrt(var + 1e-20)
        if self.h_container != h:
            # normalization scales pad rows too — they stay zero, but the
            # mask also cuts any fp dust so to_valid_rgb sees exact zeros
            img = self._mask_rows(img, h)
        return img
