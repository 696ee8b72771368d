"""Spatial sharding: giant canvases with the FFT parameter grid, the
irfft2 decode and the cutout contraction distributed over a 'spatial' mesh
axis — nothing materializes the full image replicated per chip.

This is the TPU answer to the reference's "fullHD/4K and above" claim
(reference README.md:17; SURVEY.md §2.6 row 4 names it the long-context
analog): the reference fits 4K on one GPU because memory scales with the
cutout count, but a replicated 4K+ float image/params/grad per chip wastes
HBM that the samples axis wants.  Here:

  spectrum [1,3,H,Wf,2]    sharded on Wf ('spatial')
   -> ifft along H          local (H is unsharded on each Wf shard)
   -> all_to_all            Wf-sharded -> H-sharded (the FFT transpose,
                            riding ICI)
   -> irfft along W         local -> image [1,3,H/n,W] H-sharded
   -> color head            elementwise, local
   -> cutout contraction    contract W locally (wx replicated), then the
                            local H rows (wy arrives H-sharded), psum the
                            cuts-sized [S,C,M,M] partials — the ONLY
                            cross-chip reduction, never an image-sized one

The composition ifft_H then irfft_W equals irfft2 exactly (the 2D inverse
factorizes; ortho norm applies 1/sqrt per axis).  Wf = W//2+1 is usually
odd, so the spectrum is zero-padded to a shardable Wf' and sliced back
before the irfft — padding is exact because every op up to the slice is
linear and the pad columns are zero.

Gradients flow through shard_map/all_to_all/psum transposes, so one
jax.grad over the returned loss trains the sharded spectrum in place.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from aphantasia_tpu.params.color import to_valid_rgb
from aphantasia_tpu.params.fft import fft_scale


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


def pad_spectrum(params: jnp.ndarray, n_shards: int) -> jnp.ndarray:
    """[1,3,H,Wf,2] -> [1,3,H,Wf',2] with zero columns, Wf' % n == 0."""
    wf = params.shape[3]
    wf_p = _pad_to(wf, n_shards)
    if wf_p == wf:
        return params
    return jnp.pad(params, ((0, 0),) * 3 + ((0, wf_p - wf), (0, 0)))


def unpad_spectrum(params: jnp.ndarray, w: int) -> jnp.ndarray:
    """Slice a padded spectrum back to the canonical Wf = w//2+1 columns
    (for .pt snapshots byte-compatible with the reference layout)."""
    return params[:, :, :, : w // 2 + 1]


def spectrum_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(None, None, None, "spatial", None))


@functools.lru_cache(maxsize=8)
def _padded_scale(h: int, w: int, decay: float, n_shards: int) -> np.ndarray:
    scale = fft_scale(h, w, decay)                      # [1,1,h,wf,1]
    wf = scale.shape[3]
    wf_p = _pad_to(wf, n_shards)
    if wf_p != wf:
        scale = np.pad(scale, ((0, 0),) * 3 + ((0, wf_p - wf), (0, 0)))
    return scale


class SpatialCanvas:
    """Base of the spatially-sharded parameterizers (SpatialFFT here,
    SpatialDWT in parallel/spatial_dwt.py): the image lives H-sharded as
    `h_container // n` rows per shard (h_container == H for FFT; DWT pads),
    and the cutout contraction / sharpness / render machinery below is
    shared.  Subclasses provide the param pytree specs and the local
    decode."""

    # populated by subclass __init__: size, colors, mesh, n, data_axis,
    # h_container
    size: tuple
    colors: float
    mesh: Mesh
    n: int
    data_axis: str | None
    h_container: int

    # ---- subclass hooks ----------------------------------------------------

    def param_specs(self):
        """PartitionSpec pytree matching the params pytree."""
        raise NotImplementedError

    def aux_specs(self):
        """PartitionSpec pytree for the decode-aux pytree (scale/shift...)."""
        raise NotImplementedError

    def _make_aux(self, shift):
        """Decode-aux pytree for a call (shift may be None)."""
        raise NotImplementedError

    def _decode_local(self, params_loc, aux_loc):
        """Per-shard decode -> contrast-normalized image rows
        [1, 3, h_container/n, W] (zeros on pad rows, if any)."""
        raise NotImplementedError

    def noise_shift(self, key, settings):
        """Per-step decode noise (clip_fft.py:238) in this parameterizer's
        sharded layout, or None when decode has no noise input."""
        raise NotImplementedError

    def unpad(self, params):
        """Canonical (reference-layout) params for .pt snapshots."""
        raise NotImplementedError

    # ---- shared machinery ---------------------------------------------------

    def pad_wy(self, wy):
        """[S,M,H] row-weight matrices padded to the image container height
        (zero rows — the container's pad rows are zero too, so the
        contraction is exact)."""
        if wy.shape[-1] == self.h_container:
            return wy
        return jnp.pad(wy, ((0, 0), (0, 0),
                            (0, self.h_container - wy.shape[-1])))

    def _sharp_local(self, img):
        """'naiv' sharpness (ops/losses.derivat semantics) of the H-sharded
        image [1,3,hc/n,W]: x-diffs are row-local; the y boundary pair uses
        a one-row halo exchange (ppermute of each shard's first row to its
        upper neighbor); pairs that touch container pad rows (and the wrap
        pair) are masked out."""
        h, w = self.size
        n = self.n
        hloc = self.h_container // n
        dx_sum = jnp.sum(jnp.abs(img[:, :, :, 1:] - img[:, :, :, :-1]))
        idx = jax.lax.axis_index("spatial")
        if self.h_container == h:
            dy_sum = jnp.sum(jnp.abs(img[:, :, 1:, :] - img[:, :, :-1, :]))
        else:
            # pad rows hold zeros pre-RGB -> a constant after to_valid_rgb:
            # x-diffs there are 0, but the real/pad boundary y-pair is not —
            # keep only pairs whose LOWER row is a real row (global t+1 < h)
            row1 = idx * hloc + 1 + jnp.arange(hloc - 1)
            dy = jnp.abs(img[:, :, 1:, :] - img[:, :, :-1, :])
            dy_sum = jnp.sum(dy * (row1 < h)[None, None, :, None])
        if n > 1:
            perm = [(i, (i - 1) % n) for i in range(n)]
            halo = jax.lax.ppermute(img[:, :, :1, :], "spatial", perm)
            border = jnp.sum(jnp.abs(halo - img[:, :, -1:, :]))
            ok = jnp.logical_and(idx < n - 1, (idx + 1) * hloc < h)
            dy_sum = dy_sum + jnp.where(ok, border, 0.0)
        dx = jax.lax.psum(dx_sum, "spatial") / (3 * h * (w - 1))
        dy = jax.lax.psum(dy_sum, "spatial") / (3 * (h - 1) * w)
        return 0.5 * (dx + dy)

    def _anchors_local(self, img):
        """Per-channel mean/std of the H-sharded RGB image (the illustrip
        RGB brightness/contrast pins, step.py:123-126) — two [3]-sized
        psums; container pad rows (a 0.5 constant after to_valid_rgb) are
        masked out of the sums."""
        h, w = self.size
        if self.h_container != h:
            hloc = self.h_container // self.n
            row = jax.lax.axis_index("spatial") * hloc + jnp.arange(hloc)
            img = img * (row < h)[:, None]
        s1 = jax.lax.psum(jnp.sum(img, axis=(0, 2, 3)), "spatial")   # [3]
        s2 = jax.lax.psum(jnp.sum(img * img, axis=(0, 2, 3)), "spatial")
        cnt = h * w
        mean_c = s1 / cnt
        var_c = (s2 - s1 * s1 / cnt) / (cnt - 1)
        return mean_c, jnp.sqrt(var_c)

    def cut_fn(self, sampler, compute_dtype=None, with_sharp=False,
               with_anchors=False):
        """Returns cuts(params, wy, wx, shift=None, contrast=1.0) ->
        [S,C,M,M] (replicated over 'spatial') — with `with_sharp` /
        `with_anchors`, a tuple (cuts[, sharp][, (mean_c, std_c)]): 'naiv'
        sharpness over the sharded image (one-row halo exchange for the
        shard-boundary y diffs) and the per-channel image moments for the
        illustrip RGB anchors.  wy [S,M,H] arrives H-sharded, wx is
        replicated; `sampler` supplies static config."""
        dt = compute_dtype or jnp.float32
        da = self.data_axis     # cutout batch axis sharding (or None)

        def _local(params_loc, aux_loc, wy_loc, wx, contrast):
            img = self._decode_local(params_loc, aux_loc)
            img = to_valid_rgb(img * contrast, colors=self.colors)  # [1,3,hc/n,W]
            # contract W locally, then the local H rows, psum cut-sized only
            tmp = jnp.einsum("chw,snw->schn", img[0].astype(dt), wx.astype(dt),
                             preferred_element_type=jnp.float32)   # [S,C,hc/n,M]
            part = jnp.einsum("smh,schn->scmn", wy_loc.astype(dt),
                              tmp.astype(dt),
                              preferred_element_type=jnp.float32)
            cuts = jax.lax.psum(part, "spatial")
            out = (cuts,)
            if with_sharp:
                out += (self._sharp_local(img),)
            if with_anchors:
                out += (self._anchors_local(img),)
            return out if len(out) > 1 else cuts

        cuts_spec = P(da)
        out_specs = (cuts_spec,)
        if with_sharp:
            out_specs += (P(),)
        if with_anchors:
            out_specs += ((P(), P()),)
        fn = shard_map(
            _local, mesh=self.mesh,
            in_specs=(self.param_specs(), self.aux_specs(),
                      P(da, None, "spatial"), P(da), P()),
            out_specs=out_specs if len(out_specs) > 1 else cuts_spec,
        )

        def cuts(params, wy, wx, shift=None, contrast=1.0):
            return fn(params, self._make_aux(shift), self.pad_wy(wy), wx,
                      jnp.asarray(contrast, jnp.float32))

        return cuts

    def wy_sharding(self):
        return NamedSharding(self.mesh, P(self.data_axis, None, "spatial"))

    def render(self, params, contrast: float = 1.0):
        """Full-image render (H-sharded internally, gathered at the end —
        only for frame output, never inside the training step)."""

        def _local(params_loc, aux_loc):
            img = self._decode_local(params_loc, aux_loc)
            return to_valid_rgb(img * contrast, colors=self.colors)

        fn = shard_map(_local, mesh=self.mesh,
                       in_specs=(self.param_specs(), self.aux_specs()),
                       out_specs=P(None, None, "spatial", None),
                       )
        out = fn(params, self._make_aux(None))
        h = self.size[0]
        return out[:, :, :h] if self.h_container != h else out

    def image(self, params, shift=None):
        """Differentiable full-frame decode — the sharded counterpart of the
        dense `parameterizer.image(params, shift=shift)` (incl. the decode
        noise shift): per-shard decode + color head, output H-sharded
        [1,3,H,W].  Feeds the LPIPS sync term inside the training step
        (reference clip_fft.py:268-270; dense path step.py:112-118)."""

        def _local(params_loc, aux_loc):
            img = self._decode_local(params_loc, aux_loc)
            return to_valid_rgb(img, colors=self.colors)

        fn = shard_map(_local, mesh=self.mesh,
                       in_specs=(self.param_specs(), self.aux_specs()),
                       out_specs=P(None, None, "spatial", None),
                       )
        out = fn(params, self._make_aux(shift))
        h = self.size[0]
        return out[:, :, :h] if self.h_container != h else out


class SpatialFFT(SpatialCanvas):
    """FFT parameterizer decode + cutout, distributed over mesh['spatial'].

    Use `init(key)` / `shard(params)` to get spectrum params living
    Wf-sharded on the mesh; `cut_fn(sampler)` returns a jittable
    (params, wy, wx, shift) -> cutouts [S,C,M,M] whose internals never
    replicate image-sized tensors.
    """

    def __init__(self, size, decay_power: float, colors: float, mesh: Mesh):
        self.size = tuple(size)
        self.decay_power = decay_power
        self.colors = colors
        self.mesh = mesh
        self.n = mesh.shape["spatial"]
        # spatial composes with a data axis (cutouts sharded over 'data',
        # spectrum over 'spatial') and tolerates a 'model' axis (CLIP
        # tensor parallel — unmentioned in the shard_map specs, so the
        # spatial program is simply replicated over it)
        self.data_axis = ("data" if "data" in mesh.axis_names
                          and mesh.shape["data"] > 1 else None)
        h, w = self.size
        if h % self.n:
            raise ValueError(f"H={h} must divide the spatial axis ({self.n})")
        self.h_container = h
        self.scale = _padded_scale(h, w, decay_power, self.n)

    # ---- params -----------------------------------------------------------

    def init(self, key, sd: float = 0.01):
        h, w = self.size
        wf_p = self.scale.shape[3]
        params = sd * jax.random.normal(key, (1, 3, h, wf_p, 2), jnp.float32)
        # zero the pad columns so they stay exactly inert
        wf = w // 2 + 1
        params = params.at[:, :, :, wf:].set(0.0)
        return self.shard(params)

    def shard(self, params):
        params = pad_spectrum(params, self.n)
        return jax.device_put(params, spectrum_sharding(self.mesh))

    def unpad(self, params):
        return unpad_spectrum(params, self.size[1])

    # ---- decode -------------------------------------------------------------

    def param_specs(self):
        return P(None, None, None, "spatial", None)

    def aux_specs(self):
        pspec = P(None, None, None, "spatial", None)
        return (pspec, pspec)

    def _make_aux(self, shift):
        wf_p = self.scale.shape[3]
        if shift is None:
            shift = jnp.zeros((1, 1, self.size[0], wf_p, 1), jnp.float32)
        return (jnp.asarray(self.scale), shift)

    def noise_shift(self, key, settings):
        """Spectrum-shift noise (clip_fft.py:238) in the PADDED sharded
        layout — the zero scale columns keep the pad inert, and the shift
        tensor is exactly the spectrum-shaped tensor already sharded."""
        h, wf_p = self.scale.shape[2], self.scale.shape[3]
        u = jax.random.uniform(key, (1, 1, h, wf_p, 1))
        if settings.noise_centered:
            u = u - 0.5
        # [1,1,h,wf',1] broadcasts over channels and real/imag inside the
        # shard (same semantics as the dense path's _noise_shift)
        return jax.lax.with_sharding_constraint(
            settings.noise * u, spectrum_sharding(self.mesh))

    # ---- frame-warp hooks (spatial_frame_warp) -------------------------------

    def state_spec(self):
        return P(None, None, None, "spatial", None)

    def raw_rows(self, params_loc):
        return _raw_decode_rows(self, params_loc)

    def from_rows(self, rows):
        return _encode_rows(self, rows)

    def _decode_local(self, params_loc, aux_loc):
        """Per-shard: scaled spectrum [.., Wf'/n, 2] -> image rows
        [1, 3, H/n, W] (H-sharded after the all_to_all transpose)."""
        scale_loc, shift_loc = aux_loc
        h, w = self.size
        scaled = scale_loc * (params_loc + shift_loc)
        spec = jax.lax.complex(scaled[..., 0], scaled[..., 1])
        spec = jnp.fft.ifft(spec, axis=2, norm="ortho")           # local: full H
        # FFT transpose: Wf-sharded -> H-sharded, over ICI
        spec = jax.lax.all_to_all(spec, "spatial", split_axis=2,
                                  concat_axis=3, tiled=True)
        wf = w // 2 + 1
        spec = spec[:, :, :, :wf]                                 # drop pad
        img = jnp.fft.irfft(spec, n=w, axis=3, norm="ortho")      # [1,3,H/n,W]
        # global contrast normalization (Bessel) via scalar psums
        s1 = jax.lax.psum(jnp.sum(img), "spatial")
        s2 = jax.lax.psum(jnp.sum(img * img), "spatial")
        cnt = 3 * h * w
        var = (s2 - s1 * s1 / cnt) / (cnt - 1)
        return img * jax.lax.rsqrt(var + 1e-20)


def _dft_mats(n: int):
    """In-graph ortho-DFT cos/sin matrices [n,n].

    Computed from iota at run time, NOT embedded as constants: at 4K an
    embedded h×h f32 matrix is ~19-67MB and blows the tunneled compile
    service's request-size limit (the reason _irfft2_mats_jnp exists caps
    out here).  j·k is reduced mod n in int32 BEFORE the float multiply so
    the cos/sin arguments stay in [0, 2π) — without the mod, f32 rounding
    of arguments ~1e4 rad costs ~1e-3 absolute error."""
    idx = jnp.arange(n, dtype=jnp.int32)
    jk = (idx[:, None] * idx[None, :]) % n
    ang = jk.astype(jnp.float32) * np.float32(2.0 * np.pi / n)
    inv = np.float32(1.0 / np.sqrt(n))
    return jnp.cos(ang) * inv, jnp.sin(ang) * inv


def _rfft_w_mats(w: int):
    """Forward ortho-rfft matrices [wf, w] (no weight folding)."""
    wf = w // 2 + 1
    kw = jnp.arange(wf, dtype=jnp.int32)[:, None]
    x = jnp.arange(w, dtype=jnp.int32)[None, :]
    ang = ((kw * x) % w).astype(jnp.float32) * np.float32(2.0 * np.pi / w)
    inv = np.float32(1.0 / np.sqrt(w))
    return jnp.cos(ang) * inv, jnp.sin(ang) * inv


def _irfft_w_mats(w: int):
    """Inverse ortho-irfft matrices [wf, w] with the interior-bin ×2
    Hermitian fold (same math as params/fft.py:_irfft2_mats, in-graph)."""
    wf = w // 2 + 1
    cf, sf = _rfft_w_mats(w)
    wk = np.full((wf, 1), 2.0, np.float32)
    wk[0, 0] = 1.0
    if w % 2 == 0:
        wk[-1, 0] = 1.0
    wk = jnp.asarray(wk)
    return cf * wk, -sf * wk


class SpatialRGB(SpatialCanvas):
    """Raw-pixel parameterizer (params/pixel.py semantics) row-sharded over
    mesh['spatial'] — the illustrip default `--gen RGB` on giant canvases.
    No transform is needed at all: the trainable state IS the image, so
    decode is a contrast rescale (global std via scalar psums, or the fixed
    /3.3 when `fixcontrast`) and the only collectives are the cuts-sized
    psum and the once-per-frame row gather of the motion warp."""

    def __init__(self, size, colors: float, mesh: Mesh,
                 fixcontrast: bool = False):
        self.size = tuple(size)
        self.colors = colors
        self.fixcontrast = fixcontrast
        self.mesh = mesh
        self.n = mesh.shape["spatial"]
        self.data_axis = ("data" if "data" in mesh.axis_names
                          and mesh.shape["data"] > 1 else None)
        self.h_container = _pad_to(self.size[0], self.n)

    # ---- params -----------------------------------------------------------

    def state_spec(self):
        return P(None, None, "spatial", None)

    def param_specs(self):
        return self.state_spec()

    def init(self, key, sd: float = 1.0):
        from aphantasia_tpu.params.pixel import pixel_init
        h, w = self.size
        return self.shard(pixel_init(key, (1, 3, h, w), sd))

    def shard(self, params):
        pad = self.h_container - params.shape[2]
        if pad:
            params = jnp.pad(params, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return jax.device_put(params,
                              NamedSharding(self.mesh, self.state_spec()))

    def unpad(self, params):
        return params[:, :, :self.size[0]]

    # ---- decode -------------------------------------------------------------

    def aux_specs(self):
        return ()

    def _make_aux(self, shift):
        del shift  # pixel decode ignores shift (params/pixel.py:26)
        return ()

    def noise_shift(self, key, settings):
        return None

    def _decode_local(self, params_loc, aux_loc):
        del aux_loc
        h, w = self.size
        if self.h_container != h:
            # mask container pad rows BEFORE the std sums: without it the
            # mean term of the std gradient would leak into pad pixels,
            # Adam would walk them off zero, and the sharded std would
            # drift from the dense one over steps
            hloc = self.h_container // self.n
            row = jax.lax.axis_index("spatial") * hloc + jnp.arange(hloc)
            params_loc = params_loc * (row < h)[:, None]
        if self.fixcontrast:
            return params_loc / 3.3
        s1 = jax.lax.psum(jnp.sum(params_loc), "spatial")
        s2 = jax.lax.psum(jnp.sum(params_loc * params_loc), "spatial")
        cnt = 3 * h * w
        var = (s2 - s1 * s1 / cnt) / (cnt - 1)
        return params_loc * jax.lax.rsqrt(var + 1e-20)

    # ---- frame-warp hooks (spatial_frame_warp) -------------------------------

    def raw_rows(self, params_loc):
        """The RAW frame state rows (dense illustrip decode_raw for RGB is
        the identity, step.py:349-351)."""
        return params_loc

    def from_rows(self, rows):
        return rows


def _raw_decode_rows(spar: SpatialFFT, params_loc):
    """Wf-sharded RAW spectrum (no decay scale / contrast norm) -> local
    image rows [1,3,H/n,W] — the distributed spectrum_to_image
    (params/fft.py:80-86).

    All transform stages run as matmul-DFTs (MXU-friendly; the TPU FFT
    lowering is far off the roofline at these shapes, and XLA-CPU's fft
    thunk RET_CHECKs on the transposed layouts the warp's separable passes
    leave behind).  Matrices are built in-graph from iota — see _dft_mats."""
    h, w = spar.size
    wf = w // 2 + 1
    c_h, s_h = _dft_mats(h)
    re, im = params_loc[..., 0], params_loc[..., 1]
    # ifft along H (e^{+iθ}): R' = C R − S I ; I' = S R + C I
    r1 = (jnp.einsum("jk,bckw->bcjw", c_h, re)
          - jnp.einsum("jk,bckw->bcjw", s_h, im))
    i1 = (jnp.einsum("jk,bckw->bcjw", s_h, re)
          + jnp.einsum("jk,bckw->bcjw", c_h, im))
    spec = jnp.stack([r1, i1], axis=-1)
    spec = jax.lax.all_to_all(spec, "spatial", split_axis=2,
                              concat_axis=3, tiled=True)
    spec = spec[:, :, :, :wf]
    cwi, swi = _irfft_w_mats(w)
    return (jnp.einsum("bcjk,kw->bcjw", spec[..., 0], cwi)
            + jnp.einsum("bcjk,kw->bcjw", spec[..., 1], swi))  # [1,3,h/n,W]


def _encode_rows(spar: SpatialFFT, rows):
    """Local image rows [1,3,H/n,W] -> Wf-sharded RAW spectrum — the
    distributed image_to_spectrum (params/fft.py:88-92)."""
    h, w = spar.size
    wf = w // 2 + 1
    wf_p = spar.scale.shape[3]
    c_h, s_h = _dft_mats(h)
    cwf, swf = _rfft_w_mats(w)
    r2 = jnp.einsum("bcjw,kw->bcjk", rows, cwf)            # [1,3,h/n,wf]
    i2 = -jnp.einsum("bcjw,kw->bcjk", rows, swf)
    spec = jnp.stack([r2, i2], axis=-1)
    if wf_p != wf:
        spec = jnp.pad(spec, ((0, 0),) * 3 + ((0, wf_p - wf), (0, 0)))
    spec = jax.lax.all_to_all(spec, "spatial", split_axis=3,
                              concat_axis=2, tiled=True)   # [1,3,h,wf_p/n]
    # fft along H (e^{-iθ}): R' = C R + S I ; I' = C I − S R
    re2, im2 = spec[..., 0], spec[..., 1]
    r3 = (jnp.einsum("jk,bckw->bcjw", c_h, re2)
          + jnp.einsum("jk,bckw->bcjw", s_h, im2))
    i3 = (jnp.einsum("jk,bckw->bcjw", c_h, im2)
          - jnp.einsum("jk,bckw->bcjw", s_h, re2))
    return jnp.stack([r3, i3], axis=-1)


def spatial_frame_warp(spar: SpatialFFT, params, motion, depth: float = 0.0,
                       depth_map=None):
    """The illustrip FFT-mode frame advance on the sharded canvas
    (VERDICT r1 item 1: '--spatial to illustrip so a 4K video runs
    sharded'; reference illustrip.py:386-423):

      spectrum (Wf-sharded) -> distributed irfft2 (ifft_H local,
      all_to_all transpose, irfft_W local) -> all_gather the H-sharded
      rows ONCE (the only image-sized collective; the per-frame motion is
      a global resample, so every chip warps the full frame with exactly
      the dense path's `grid_warp`/`frame_transform` math — bitwise
      parity with the single-device program) -> slice the local rows
      back -> distributed rfft2 (rfft_W local, all_to_all, fft_H local)
      -> spectrum (Wf-sharded, pad columns zero).

    Raw ortho transforms, NO decay scale / contrast normalization —
    mirrors the dense spectrum_to_image/image_to_spectrum round-trip
    (params/fft.py:80-92).  With `depth > 0`, the DA-V2 depth product
    (computed outside, one dispatch per frame — see
    build_spatial_depth_helpers) drives the 3D grid warp at the gathered
    frame, exactly like the dense build_frame_step (step.py:353-366).
    Training steps before/after stay fully sharded; only this
    once-per-frame warp touches a replicated frame.
    """
    from aphantasia_tpu.ops.warp import frame_transform
    h, w = spar.size
    hc = spar.h_container
    with_depth = depth > 0.0 and depth_map is not None

    def _local(params_loc, motion_v, dmap):
        img = spar.raw_rows(params_loc)
        # ---- gather rows, warp the full frame, take our rows back ----
        full = jax.lax.all_gather(img, "spatial", axis=2, tiled=True)
        if hc != h:
            full = full[:, :, :h]           # drop container pad rows
        angle, sh0, sh1, scale, shear = motion_v
        if with_depth:
            from aphantasia_tpu.motion.depthwarp import grid_warp
            from aphantasia_tpu.ops.resize import resize_bicubic
            # warp-origin mapping, illustrip.py:115-128 (traced scalars)
            dx = 100.0 * sh0 / w
            dy = 100.0 * sh1 / h
            dz = 0.5 + 32.0 * (scale - 1.0)
            d = resize_bicubic(dmap, (h, w))
            full = grid_warp(full, d[0], depth, (dx, dy), dz)
        full = frame_transform(full, (h, w), angle, (sh0, sh1), scale,
                               shear)
        if hc != h:
            full = jnp.pad(full, ((0, 0), (0, 0), (0, hc - h), (0, 0)))
        idx = jax.lax.axis_index("spatial")
        rows = jax.lax.dynamic_slice_in_dim(full, idx * (hc // spar.n),
                                            hc // spar.n, axis=2)
        return spar.from_rows(rows)

    fn = shard_map(_local, mesh=spar.mesh,
                   in_specs=(spar.state_spec(), P(), P()),
                   out_specs=spar.state_spec())
    if depth_map is None:
        depth_map = jnp.zeros((1, 1, 2, 2), jnp.float32)
    return fn(params, tuple(jnp.asarray(m, jnp.float32) for m in motion),
              depth_map)


def spatial_depth_preview(spar: SpatialFFT, params):
    """DA-V2-sized preview of the sharded frame state (the spatial analog
    of step.py:_depth_preview): distributed raw decode, one row gather,
    color head + bicubic resize replicated."""

    def _local(params_loc):
        from aphantasia_tpu.parallel.step import _depth_preview
        img = spar.raw_rows(params_loc)
        full = jax.lax.all_gather(img, "spatial", axis=2, tiled=True)
        if spar.h_container != spar.size[0]:
            full = full[:, :, :spar.size[0]]
        return _depth_preview(full, spar.size, spar.colors)

    # check_vma off: the preview IS replicated (it's a pure function of the
    # all_gathered frame), but the bicubic resize inside _depth_preview
    # uses ops the static replication checker can't see through
    return shard_map(_local, mesh=spar.mesh, in_specs=(spar.state_spec(),),
                     out_specs=P(), check_vma=False)(params)


def build_spatial_frame_step(spar: SpatialFFT, sampler, clip_cfg, settings,
                             optimizer, opt_steps: int, smooth: bool,
                             contrast: float = 1.0, deptha=None,
                             depth: float = 0.0):
    """Spatial counterpart of parallel/step.py:build_frame_step (FFT mode):
    ONE jitted program per video frame — sharded motion warp (with the
    DA-V2 grid warp at the gathered frame in depth mode), `opt_steps`
    sharded train steps, full-frame uint8 render.

    Depth mode mirrors the dense contract (step.py:325-337): the signature
    gains a trailing `depth_map` input and a `preview` output; the DA-V2
    tower itself runs as its own program (build_spatial_depth_helpers).

    Returns frame_fn(params_tmp, opt_state, prev_enc, clip_params,
    aest_params, prompts, key, step_i, motion[, depth_map]) ->
    (params_tmp, opt_state, prev_enc, frame_u8, losses [opt_steps]
    [, preview])."""
    grad_fn = _spatial_grad_fn(spar, sampler, clip_cfg, settings)
    with_depth = deptha is not None and depth > 0.0

    def frame_fn(params_tmp, opt_state, prev_enc, clip_params, aest_params,
                 prompts, key, step_i, motion, depth_map=None):
        gp = spatial_frame_warp(spar, params_tmp, motion, depth=depth,
                                depth_map=depth_map if with_depth else None)
        os_ = opt_state if smooth else optimizer.init(gp)

        def body(carry, s):
            gp, os_, pe = carry
            k = jax.random.fold_in(key, s)
            (loss, out_enc), grads = grad_fn(gp, clip_params, aest_params,
                                             None, prompts, pe, k, step_i)
            updates, os_ = optimizer.update(grads, os_, gp)
            gp = jax.tree_util.tree_map(lambda p, u: p + u, gp, updates)
            return (gp, os_, out_enc), loss

        (gp, os_, pe), losses = jax.lax.scan(
            body, (gp, os_, prev_enc),
            jnp.arange(opt_steps, dtype=jnp.int32))
        img = spar.render(gp, contrast=contrast)
        img = jnp.clip(img[0].transpose(1, 2, 0), 0.0, 1.0)
        frame_u8 = (img * 255.0 + 0.5).astype(jnp.uint8)
        if with_depth:
            preview = spatial_depth_preview(spar, gp)
            return gp, os_, pe, frame_u8, losses, preview
        return gp, os_, pe, frame_u8, losses

    return jax.jit(frame_fn, donate_argnums=(0, 1, 2))


def build_spatial_depth_helpers(spar: SpatialFFT, deptha):
    """Spatial analog of step.py:build_depth_helpers: preview(params) for
    the frame-0 bootstrap (sharded decode + row gather + resize), and
    infer(preview) — ONE batched mirror-fused DA-V2 forward, identical to
    the dense helper (the tower sees only the replicated preview)."""
    from aphantasia_tpu.motion.depthwarp import mirror_fused_depth

    def infer_fn(dparams, preview):
        return mirror_fused_depth(
            lambda x: type(deptha).apply(dparams, deptha.cfg, x,
                                         dtype=deptha.dtype), preview)

    infer_jit = jax.jit(infer_fn)
    preview_jit = jax.jit(lambda p: spatial_depth_preview(spar, p))
    return preview_jit, lambda prev: infer_jit(deptha.params, prev)


def _spatial_grad_fn(spar: SpatialCanvas, sampler, clip_cfg, settings):
    """value_and_grad of the sharded-canvas loss — shared by the per-step
    and the chunked-frames builders below."""
    from aphantasia_tpu.ops.augs import get_transform
    from aphantasia_tpu.ops.losses import sim_func, aesthetic_apply
    from aphantasia_tpu.ops.resize import resize_bicubic
    from aphantasia_tpu.models.clip.model import encode_image
    from aphantasia_tpu.models.lpips import lpips_apply

    transform = get_transform(settings.transform)
    with_sharp = settings.sharp != 0
    with_anchors = settings.rgb_anchors
    cuts_fn = spar.cut_fn(sampler, compute_dtype=settings.clip_dtype,
                          with_sharp=with_sharp, with_anchors=with_anchors)
    data_sh = (NamedSharding(spar.mesh, P(spar.data_axis))
               if spar.data_axis else None)

    def _noise_shift(key):
        """Per-parameterizer decode noise (clip_fft.py:238) — FFT: the
        spectrum-shaped shift, sharded exactly like the params; DWT: None
        (decode ignores the shift, params/dwt.py:176, matching dense)."""
        if settings.noise <= 0:
            return None
        return spar.noise_shift(key, settings)

    def encode_cuts(gen_params, clip_params, key, shift):
        k_box, k_tf = jax.random.split(key)
        boxes = sampler.sample_boxes(k_box)
        wy, wx = sampler.weight_matrices(boxes)
        # the [S,M,H] row matrix is the one H-sized auxiliary: keep it
        # sharded like the image so 4K canvases never replicate it
        wy = jax.lax.with_sharding_constraint(spar.pad_wy(wy),
                                              spar.wy_sharding())
        out = cuts_fn(gen_params, wy, wx, shift=shift)
        if not (with_sharp or with_anchors):
            out = (out,)
        cuts, rest = out[0], list(out[1:])
        sharp = rest.pop(0) if with_sharp else None
        anchors = rest.pop(0) if with_anchors else None
        cuts = transform(k_tf, cuts.astype(settings.clip_dtype))
        if data_sh is not None:
            cuts = jax.lax.with_sharding_constraint(cuts, data_sh)
        enc = encode_image(clip_params, clip_cfg, cuts,
                           dtype=settings.clip_dtype)
        if data_sh is not None:
            enc = jax.lax.with_sharding_constraint(enc, data_sh)
        return enc.astype(jnp.float32), sharp, anchors

    def loss_fn(gen_params, clip_params, aest_params, lpips_bundle, prompts,
                prev_enc, key, step_i):
        k_noise, k1, k2 = jax.random.split(key, 3)
        shift = _noise_shift(k_noise)
        out_enc, sharp, anchors = encode_cuts(gen_params, clip_params, k1,
                                              shift)
        loss = jnp.float32(0.0)
        if with_sharp:
            loss = loss - settings.sharp * sharp
        if settings.aest != 0 and aest_params is not None:
            loss = loss - 0.001 * settings.aest * jnp.mean(
                aesthetic_apply(aest_params, out_enc))
        for embs, wts, coeff in prompts:
            group = jnp.float32(0.0)
            for j in range(embs.shape[0]):
                group = group + wts[j] * sim_func(embs[j:j + 1], out_enc,
                                                  settings.sim)
            loss = loss + coeff * group
        if settings.sync > 0 and lpips_bundle is not None:
            # LPIPS sync (step.py:112-118): decode the full sharded frame
            # with the SAME shift, downsample to the half-res target and
            # let GSPMD place the replicated VGG pipeline
            lpips_params, img_in = lpips_bundle       # img_in: half-res target
            prog = (settings.total_steps - step_i) / settings.total_steps
            img = spar.image(gen_params, shift=shift)
            half = resize_bicubic(img, img_in.shape[-2:])
            loss = loss + prog * settings.sync * jnp.mean(
                lpips_apply(lpips_params, half, img_in, normalize=True))
        if with_anchors:
            # illustrip.py:438-440 empirical brightness/contrast pins
            # (step.py:123-126) from the sharded image's channel moments
            mean_c, std_c = anchors
            loss = loss + jnp.mean(jnp.abs(mean_c - 0.45))
            loss = loss + jnp.mean(jnp.abs(std_c - 0.17))
        if settings.enforce != 0:
            # same decode shift as the first pass (dense path decodes the
            # image once and slices it twice — step.py:96-98)
            enc2, _, _ = encode_cuts(gen_params, clip_params, k2, shift)
            loss = loss - settings.enforce * sim_func(out_enc, enc2,
                                                      settings.sim)
        if settings.expand > 0:
            gate = (step_i > 0).astype(jnp.float32)
            loss = loss + gate * settings.expand * sim_func(
                out_enc, prev_enc, settings.sim)
        return loss, jax.lax.stop_gradient(out_enc)

    return jax.value_and_grad(loss_fn, has_aux=True)


def build_spatial_train_step(spar: SpatialCanvas, sampler, clip_cfg, settings,
                             optimizer):
    """clip_fft-style training step over the spatially-sharded decode+cut.

    Mirrors parallel/step.py:build_train_step: cutout/encoding terms
    (prompt groups, aesthetic, enforce, expand) ride the sharded cut
    contraction; image-space terms run distributed too — sharp via the
    one-row halo exchange, the noise shift in the params' sharded layout,
    and LPIPS sync on the sharded full-frame decode (spar.image).

    Returns train_step(gen_params, opt_state, prev_enc, clip_params,
    aest_params, lpips_bundle, prompts, key, step_i) -> (gen_params,
    opt_state, out_enc, loss) — the dense build_train_step signature;
    gen_params live Wf-sharded (spar.init / spar.shard)."""
    grad_fn = _spatial_grad_fn(spar, sampler, clip_cfg, settings)

    def train_step(gen_params, opt_state, prev_enc, clip_params, aest_params,
                   lpips_bundle, prompts, key, step_i):
        (loss, out_enc), grads = grad_fn(gen_params, clip_params, aest_params,
                                         lpips_bundle, prompts, prev_enc,
                                         key, step_i)
        updates, opt_state = optimizer.update(grads, opt_state, gen_params)
        gen_params = jax.tree_util.tree_map(lambda p, u: p + u,
                                            gen_params, updates)
        return gen_params, opt_state, out_enc, loss

    return jax.jit(train_step, donate_argnums=(0, 1, 2))


def build_spatial_train_loop_frames(spar: SpatialCanvas, sampler, clip_cfg,
                                    settings, optimizer, opt_step: int,
                                    n_frames: int, contrast: float = 1.0,
                                    step_index: str = "frame",
                                    dual=None):
    """Chunked frame-group loop for the sharded canvas — the spatial
    counterpart of parallel/step.py:build_train_loop_frames (same cadence:
    step -> uint8 render -> opt_step-1 steps, `n_frames` groups per
    dispatch), amortizing the tunneled per-program overhead that costs
    ~20% of a 4K step.

    `dual=(clip_cfg2, dm_every)` compiles BOTH towers into the scan body
    (clip_fft.py:135 schedule, lax.cond-swapped — mirrors
    step.py:build_train_loop_frames); the loop then takes three extra args
    after `prompts`: (clip_params2, aest_params2, prompts2).

    Returns loop(gen_params, opt_state, prev_enc, clip_params, aest_params,
    lpips_bundle, prompts, [*dual2,] key, frame0) -> (gen_params, opt_state,
    prev_enc, frames [n_frames,H,W,3] uint8, losses [n_frames*opt_step]) —
    the dense build_train_loop_frames signature."""
    grad_fn = _spatial_grad_fn(spar, sampler, clip_cfg, settings)
    if dual is not None:
        cfg2, dm_every = dual
        grad_fn2 = _spatial_grad_fn(spar, sampler, cfg2, settings)

    def loop(gen_params, opt_state, prev_enc, clip_params, aest_params,
             lpips_bundle, prompts, *rest):
        if dual is not None:
            clip_params2, aest_params2, prompts2, key, frame0 = rest
        else:
            key, frame0 = rest

        def one_step(carry, gstep, fstep):
            gp, os_, pe = carry
            k = jax.random.fold_in(key, gstep)
            # what the loss sees as step_i (mirrors step.py:247): the frame
            # index (clip_fft's i // opt_step) or the global step (illustra)
            si = fstep if step_index == "frame" else gstep
            if dual is None:
                (loss, out_enc), grads = grad_fn(gp, clip_params,
                                                 aest_params, lpips_bundle,
                                                 prompts, pe, k, si)
            else:
                use2 = jnp.logical_and(gstep % dm_every == 0, gstep > 0)
                (loss, out_enc), grads = jax.lax.cond(
                    use2,
                    lambda _: grad_fn2(gp, clip_params2, aest_params2,
                                       lpips_bundle, prompts2, pe, k, si),
                    lambda _: grad_fn(gp, clip_params, aest_params,
                                      lpips_bundle, prompts, pe, k, si),
                    None)
            updates, os_ = optimizer.update(grads, os_, gp)
            gp = jax.tree_util.tree_map(lambda p, u: p + u, gp, updates)
            return (gp, os_, out_enc), loss

        def frame_body(carry, j):
            fstep = frame0 + j
            base = fstep * opt_step
            carry, l0 = one_step(carry, base, fstep)
            img = spar.render(carry[0], contrast=contrast)
            img = jnp.clip(img[0].transpose(1, 2, 0), 0.0, 1.0)
            frame = (img * 255.0 + 0.5).astype(jnp.uint8)
            if opt_step > 1:
                carry, lrest = jax.lax.scan(
                    lambda c, t: one_step(c, base + 1 + t, fstep),
                    carry, jnp.arange(opt_step - 1, dtype=jnp.int32))
                losses = jnp.concatenate([l0[None], lrest])
            else:
                losses = l0[None]
            return carry, (frame, losses)

        (gp, os_, pe), (frames, losses) = jax.lax.scan(
            frame_body, (gen_params, opt_state, prev_enc),
            jnp.arange(n_frames, dtype=jnp.int32))
        return gp, os_, pe, frames, losses.reshape(-1)

    return jax.jit(loop, donate_argnums=(0, 1, 2))
