"""Batched augmentation pipelines for cutouts — gather-free TPU hot path.

Parity targets: reference aphantasia/transforms.py pipelines —
`transforms_fast` (RandomPerspective(0.33, p=0.2) + RandomErasing(0.2) +
rotate(±30°, 20x zero-weighted) + CLIP normalize, transforms.py:165-170),
`transforms_custom` (pad+rotate+jitter+normalize, :156-163) and
`transforms_elastic` (:147-154).

Re-architected TPU-first: the reference applies torchvision transforms per
cutout in a Python loop; here every random parameter is an [S]-array under
a threaded PRNG key.  XLA TPU gathers are unusable in the hot path (the
exact 4-tap warp in ops/perspective.py measured 0.65s/step fwd-only
inside the full program; its autodiff scatter ~3.5s/step), so all warps
are gather-free: every affine stage collapses into ONE per-sample affine
applied by the separable LDU warp (ops/sep_warp.py — FFT-phase shears +
scale matmuls), with the perspective stage of `fast` entering that warp
as its least-squares affine FIT (default).  The full measured ladder
(r5 same-session, docs/TPU_MEASUREMENTS_r5.md §1): affine 25.0 it/s /
0.9928 embedding-cosine vs exact; MIXED (APHANTASIA_EXACT_PERSP=mixed —
exact Pallas perspective + affine rotate) 17.5 it/s / 0.9997; fully
exact (APHANTASIA_EXACT_PERSP=1, banded one-hot-matmul Pallas kernel,
ops/pallas_persp.py) 10.6 it/s / exact by construction.  The affine
default is EVIDENCE-CLOSED at the embedding level: pipeline-level cosine
0.9928 >= the 0.98 target (the fit's error concentrates on the p=0.2
persp-applied subset, 0.9764 there), pinned in tests/test_aug_fidelity.
Remaining deviations (documented + measured there): the fit-vs-exact
perspective deviation (pixel mean 0.06 at full distortion; the DRAW is
torchvision-exact in every mode); the affine stages' interpolant is
spectral (sinc) where torch's is bilinear; erasing commutes with the
affine warp in custom/elastic; 'elastic' uses real smooth separable
displacements (the reference passes a zero noise field to kornia — an
identity warp, known-bug list SURVEY.md §7).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from aphantasia_tpu.ops.sep_warp import affine_warp, fractional_shift
from aphantasia_tpu.params.color import clip_normalize

# rotate angle choices: list(range(-30, 30)) + 20*[0] (transforms.py:168)
_ROT_ANGLES = np.asarray(list(range(-30, 30)) + [0] * 20, dtype=np.float32)


def _rot_a2(angles_deg):
    """[S] -> [S,2,2] inverse rotation (centered coords)."""
    r = jnp.deg2rad(angles_deg)
    cos, sin = jnp.cos(r), jnp.sin(r)
    return jnp.stack([jnp.stack([cos, sin], -1),
                      jnp.stack([-sin, cos], -1)], -2)


def _compose(a, b):
    """Affine composition: warp-by-a then warp-by-b == single warp with
    src = a2 @ (b2 @ dst + bt) + at  ... i.e. out(x)=in(A(B(x)))."""
    a2, at = a[:, :, :2], a[:, :, 2]
    b2, bt = b[:, :, :2], b[:, :, 2]
    c2 = jnp.einsum("sij,sjk->sik", a2, b2)
    ct = jnp.einsum("sij,sj->si", a2, bt) + at
    return jnp.concatenate([c2, ct[:, :, None]], -1)


def random_rotate_affine(key, s, angles=_ROT_ANGLES):
    idx = jax.random.randint(key, (s,), 0, len(angles))
    a2 = _rot_a2(jnp.asarray(angles)[idx])
    return jnp.concatenate([a2, jnp.zeros((s, 2, 1))], -1)


def random_erasing(key, cuts, p=0.2, scale=(0.02, 0.33), ratio=(0.3, 3.3),
                   value=0.0):
    """torchvision RandomErasing: random rect set to `value` with prob p."""
    s, c, h, w = cuts.shape
    ks = jax.random.split(key, 5)
    apply = jax.random.uniform(ks[0], (s,)) < p
    area = jax.random.uniform(ks[1], (s,), minval=scale[0], maxval=scale[1]) * h * w
    logr = jax.random.uniform(ks[2], (s,), minval=np.log(ratio[0]),
                              maxval=np.log(ratio[1]))
    r = jnp.exp(logr)
    eh = jnp.clip(jnp.sqrt(area * r), 1, h - 1)
    ew = jnp.clip(jnp.sqrt(area / r), 1, w - 1)
    y0 = jax.random.uniform(ks[3], (s,)) * (h - eh)
    x0 = jax.random.uniform(ks[4], (s,)) * (w - ew)
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    inside = ((yy >= y0[:, None, None]) & (yy < (y0 + eh)[:, None, None])
              & (xx >= x0[:, None, None]) & (xx < (x0 + ew)[:, None, None]))
    mask = inside & apply[:, None, None]
    return jnp.where(mask[:, None], value, cuts)


def _jitter_affine(key, s, d):
    """jitter(d): integer translate dx,dy in {0..d-1} (transforms.py:27-33);
    src = dst - t  ->  t_eff = -d."""
    dxy = jax.random.randint(key, (s, 2), 0, d).astype(jnp.float32)
    a2 = jnp.broadcast_to(jnp.eye(2), (s, 2, 2))
    return jnp.concatenate([a2, -dxy[:, :, None]], -1)


def transforms_fast(key, cuts):
    """perspective(0.33, p=0.2), erasing(p=0.2), rotate(±30°, 20x0), CLIP
    normalize — the reference's exact stage order (transforms.py:165-170).

    The perspective stage is EXACT (VERDICT r1 item 3): torchvision-exact
    draw (ops/perspective.py — integer randint corner displacements, true
    8-dof homography) applied by the banded one-hot-matmul Pallas kernel
    (ops/pallas_persp.py — gather-free 4-tap bilinear + fill mask,
    pl.when-skipped for the 80% of samples whose Bernoulli fails, just as
    torchvision returns those unchanged).  Erasing then rotation follow in
    torch's own order, and the rotate stage ALSO runs through the kernel
    (a rotation is a homography, "rotate" window family) — so this
    pipeline is fully torchvision-exact per stage: bilinear interpolant,
    zeros+fill borders, separate resamples, ≤1e-3 goldens
    (tests/test_aug_fidelity.py, tests/test_pallas_persp.py).  Remaining
    (documented) deviation from the reference: angles draw per-sample
    here, once per batch there (transforms.py:75).

    OPT-IN via APHANTASIA_EXACT_PERSP=1: the r3 TPU A/B measured this
    pipeline at 7.7 it/s headline vs the affine fit's 24.4; the r4 rework
    (bf16 boundary + batched-issue kernels + bwd tiering + drawn-sample
    compaction of this p=0.2 stage) moved it substantially — current
    numbers in docs/TPU_MEASUREMENTS_r4.md; see get_transform."""
    s, c, h, w = cuts.shape
    k1, k2, k3 = jax.random.split(key, 3)
    from aphantasia_tpu.ops.perspective import (perspective_endpoints,
                                                perspective_coeffs,
                                                rotation_coeffs_for)
    from aphantasia_tpu.ops.pallas_persp import perspective_warp
    start, end = perspective_endpoints(k1, s, h, w, distortion=0.33, p=0.2)
    coef = perspective_coeffs(start, end)
    flags = (jnp.abs(end - start[None]).max((1, 2)) > 0).astype(jnp.int32)
    # full batch, NOT perspective_warp_compact: the r4 on-chip A/B
    # measured compaction SLOWER (4.43 vs 3.87 ms fwd — the permutation
    # gathers cost more than the copy-branch grid steps they remove;
    # docs/TPU_MEASUREMENTS_r4.md §3), so route a stays available but off
    cuts = perspective_warp(cuts, coef, flags)
    cuts = random_erasing(k3, cuts)
    # rotate stage through the same kernel (rotation is a homography):
    # torch-exact bilinear interpolant — same angle draw as the affine
    # pipeline's random_rotate_affine(k2), so A/B runs share their draws
    idx = jax.random.randint(k2, (s,), 0, len(_ROT_ANGLES))
    ang = jnp.asarray(_ROT_ANGLES)[idx]
    rcoef = rotation_coeffs_for(ang, h, w)
    rflags = (jnp.abs(ang) > 0).astype(jnp.int32)
    cuts = perspective_warp(cuts, rcoef, rflags, family="rotate")
    return clip_normalize(cuts)


def transforms_fast_affine(key, cuts):
    """The default `fast` pipeline: perspective applied as its
    least-squares affine fit, composed with the rotation into ONE LDU
    warp (single resample), erasing after.  Default since the r3 TPU A/B
    (24.4 vs 7.7 it/s headline — get_transform); the exact kernel remains
    available via APHANTASIA_EXACT_PERSP=1.  Same key split as
    transforms_fast, so A/B runs share their draws."""
    s, c, h, w = cuts.shape
    k1, k2, k3 = jax.random.split(key, 3)
    from aphantasia_tpu.ops.perspective import (
        perspective_endpoints, perspective_coeffs, affine_fit_centered)
    start, end = perspective_endpoints(k1, s, h, w, distortion=0.33, p=0.2)
    aff_p = affine_fit_centered(perspective_coeffs(start, end), h, w)
    aff = _compose(aff_p, random_rotate_affine(k2, s))
    cuts = affine_warp(cuts, aff, pad=56, compute_dtype=jnp.bfloat16)
    cuts = random_erasing(k3, cuts)
    return clip_normalize(cuts)


def transforms_fast_mixed(key, cuts):
    """The MIXED `fast` pipeline (r5, VERDICT item 1a — the unmeasured
    ladder rung): EXACT torchvision perspective (the stage where the
    affine fit actually errs — a homography is not affine) through the
    banded one-hot-matmul Pallas kernel, then erasing, then the rotation
    as a single LDU affine warp (a rotation IS affine, so the only
    deviation left in that stage is sinc-vs-bilinear interpolant).
    torch stage order preserved (persp, erase, rotate); same key split as
    transforms_fast / transforms_fast_affine so A/B runs share draws.
    Opt-in via APHANTASIA_EXACT_PERSP=mixed (get_transform).  Measured
    (r5 same-session ladder, TPU_MEASUREMENTS_r5.md §1): 17.5 it/s
    headline with embedding cosine 0.9997 vs the fully-exact pipeline —
    embedding-exact augmentation at 70% of headline speed."""
    s, c, h, w = cuts.shape
    k1, k2, k3 = jax.random.split(key, 3)
    from aphantasia_tpu.ops.perspective import (perspective_endpoints,
                                                perspective_coeffs)
    from aphantasia_tpu.ops.pallas_persp import perspective_warp
    start, end = perspective_endpoints(k1, s, h, w, distortion=0.33, p=0.2)
    coef = perspective_coeffs(start, end)
    flags = (jnp.abs(end - start[None]).max((1, 2)) > 0).astype(jnp.int32)
    cuts = perspective_warp(cuts, coef, flags)
    cuts = random_erasing(k3, cuts)
    aff = random_rotate_affine(k2, s)
    cuts = affine_warp(cuts, aff, pad=56, compute_dtype=jnp.bfloat16)
    return clip_normalize(cuts)


def transforms_custom(key, cuts):
    """pad(4, gray) + rotate + jitter(8) + normalize (transforms.py:156-163).
    Gray border emulated by slight scale-down with 0.5 fill."""
    s, c, h, w = cuts.shape
    k1, k2 = jax.random.split(key)
    pad_scale = (h + 8.0) / h      # inverse map scales up -> image shrinks
    scale_aff = jnp.broadcast_to(jnp.concatenate(
        [pad_scale * jnp.eye(2), jnp.zeros((2, 1))], 1), (s, 2, 3))
    aff = _compose(scale_aff, _compose(random_rotate_affine(k1, s),
                                       _jitter_affine(k2, s, 8)))
    cuts = affine_warp(cuts, aff, pad=56, fill=0.5, compute_dtype=jnp.bfloat16)
    return clip_normalize(cuts)


def transforms_elastic(key, cuts):
    """pad + erasing + rotate + elastic + jitter + normalize
    (transforms.py:147-154), with a real separable elastic displacement:
    smooth random per-row dx(y) and per-column dy(x) via FFT-phase shifts."""
    s, c, h, w = cuts.shape
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    aff = _compose(random_rotate_affine(k1, s), _jitter_affine(k2, s, 8))
    cuts = affine_warp(cuts, aff, pad=56, fill=0.5, compute_dtype=jnp.bfloat16)
    cuts = random_erasing(k3, cuts)
    # separable elastic: coarse smooth 1D displacement tracks, amp ~ 6 px
    def smooth_track(k, n):
        coarse = jax.random.uniform(k, (s, 9), minval=-1.0, maxval=1.0)
        return jax.image.resize(coarse, (s, n), "cubic") * 6.0
    dx = smooth_track(k4, h)   # x-shift per row
    dy = smooth_track(k5, w)   # y-shift per column
    cuts = fractional_shift(cuts, dx[:, None, :], axis=-1)
    cuts = fractional_shift(cuts, dy[:, None, :], axis=-2)
    return clip_normalize(cuts)


def _pad_affine(s, h, pad_px):
    """Emulate constant-border pad(p) at fixed shape: centered scale-down
    by h/(h+2p) (inverse map scales up), border filled by the warp."""
    pad_scale = (h + 2.0 * pad_px) / h
    return jnp.broadcast_to(jnp.concatenate(
        [pad_scale * jnp.eye(2), jnp.zeros((2, 1))], 1), (s, 2, 3))


def _scale_affine(key, s, scales):
    """lucent random_scale(scales): per-sample centered content scale
    (reference transforms.py:42-51 — bilinear upsample + pad)."""
    idx = jax.random.randint(key, (s,), 0, len(scales))
    sc = jnp.asarray(scales, jnp.float32)[idx]
    a2 = jnp.eye(2)[None] / sc[:, None, None]   # src = dst / scale
    return jnp.concatenate([a2, jnp.zeros((s, 2, 1))], -1)


def transforms_lucent(key, cuts):
    """Legacy Lucid pipeline: pad(12, gray) + jitter(8) +
    random_scale(0.9..1.1 step .02) + rotate(±10°, 5x0) + jitter(4)
    (reference transforms.py:118-124).

    No reference entry point selects it (and there it is unusable as-is:
    `pad` grows the tensor past CLIP's input size — latent-bug list,
    SURVEY.md §4).  Here the stages compose into ONE per-sample affine
    (per-sample draws, like the other pipelines; the reference draws once
    per batch) with gray fill, and clip_normalize is appended so the
    option actually feeds CLIP correctly."""
    s, c, h, w = cuts.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    scales = [1 + (i - 5) / 50.0 for i in range(11)]
    aff = _compose(_pad_affine(s, h, 12),
                   _compose(_jitter_affine(k1, s, 8),
                            _compose(_scale_affine(k2, s, scales),
                                     _compose(random_rotate_affine(
                                         k3, s, np.asarray(
                                             list(range(-10, 11)) + [0] * 5,
                                             np.float32)),
                                         _jitter_affine(k4, s, 4)))))
    cuts = affine_warp(cuts, aff, pad=56, fill=0.5,
                       compute_dtype=jnp.bfloat16)
    return clip_normalize(cuts)


def transforms_openai(key, cuts):
    """Legacy OpenAI pipeline: pad(2, gray) + 10x jitter(4) +
    rotate(-20..20 ∪ -10..10 ∪ -5..5 ∪ 5x0) + jitter(2) (reference
    transforms.py:127-143).  Ten composed integer jitters == one
    translation by the sum of ten independent draws; same fixed-shape
    pad emulation and appended clip_normalize as transforms_lucent."""
    s, c, h, w = cuts.shape
    ks = jax.random.split(key, 12)
    jit10 = jnp.sum(jnp.stack([
        jax.random.randint(ks[i], (s, 2), 0, 4) for i in range(10)]),
        axis=0).astype(jnp.float32)
    a2 = jnp.broadcast_to(jnp.eye(2), (s, 2, 2))
    jit10_aff = jnp.concatenate([a2, -jit10[:, :, None]], -1)
    angles = np.asarray(list(range(-20, 20)) + list(range(-10, 10))
                        + list(range(-5, 5)) + [0] * 5, np.float32)
    aff = _compose(_pad_affine(s, h, 2),
                   _compose(jit10_aff,
                            _compose(random_rotate_affine(ks[10], s, angles),
                                     _jitter_affine(ks[11], s, 2))))
    cuts = affine_warp(cuts, aff, pad=56, fill=0.5,
                       compute_dtype=jnp.bfloat16)
    return clip_normalize(cuts)


def normalize_only(key, cuts):
    del key
    return clip_normalize(cuts)


def get_transform(name: str):
    """'fast' | 'custom' | 'elastic' | 'lucent' | 'openai' | 'none' ->
    fn(key, cuts) (selection logic parity: clip_fft.py:161-171; lucent/
    openai are the reference's legacy pipelines, transforms.py:118-143).

    'fast' defaults to the AFFINE-FIT perspective (transforms_fast_affine)
    — evidence-closed at the embedding level in r5 (pipeline cosine
    0.9928 vs exact at the production config, TPU_MEASUREMENTS_r5.md §1).
    APHANTASIA_EXACT_PERSP=mixed selects exact-perspective + affine-rotate
    (17.5 it/s, cosine 0.9997); any other truthy value selects the fully
    exact torchvision semantics (10.6 it/s).  Both probe the Pallas
    kernel at build time and fall back LOUDLY if Mosaic rejects it.  The
    fit's pixel deviation stays pinned in tests/test_aug_fidelity.py
    (mean 0.06 at full distortion; the DRAW distribution is
    torchvision-exact in every mode)."""
    import os
    if name == "fast":
        mode = os.environ.get("APHANTASIA_EXACT_PERSP")
        if mode:
            from aphantasia_tpu.ops.pallas_persp import kernel_supported
            if kernel_supported():
                # 'mixed' = exact perspective + affine rotate (r5 ladder
                # rung); any other truthy value = fully exact (r3/r4)
                return (transforms_fast_mixed if mode == "mixed"
                        else transforms_fast)
        return transforms_fast_affine
    return {
        "custom": transforms_custom,
        "elastic": transforms_elastic,
        "lucent": transforms_lucent,
        "openai": transforms_openai,
        "none": normalize_only,
    }[name]
