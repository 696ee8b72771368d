"""Fidelity impact of the documented augmentation deviations (VERDICT r1
weak-7).  ops/augs.py replaces torchvision's RandomPerspective with its
least-squares affine fit and kornia's (identity-bug) elastic with a real
separable elastic.  These tests MEASURE the deviations instead of assuming
them benign:

1. the affine-fit warp vs an exact homography warp (the torchvision
   semantics, implemented in numpy) on the same corner displacements —
   pinned mean/max deviation bounds at the pipeline's distortion level;
2. training-convergence impact: the full `fast` pipeline must reach a
   final CLIP similarity in the same band as no-augmentation training on
   a tiny config (the >=0.98 embedding-cosine target concerns converged
   similarity, not per-op equality).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


def _homography(src_pts, dst_pts):
    """8-dof homography H with src ~ H(dst) (inverse map, like torchvision)."""
    a, b = [], []
    for (xd, yd), (xs, ys) in zip(dst_pts, src_pts):
        a.append([xd, yd, 1, 0, 0, 0, -xs * xd, -xs * yd])
        a.append([0, 0, 0, xd, yd, 1, -ys * xd, -ys * yd])
        b += [xs, ys]
    h = np.linalg.lstsq(np.asarray(a, float), np.asarray(b, float),
                        rcond=None)[0]
    return np.append(h, 1.0).reshape(3, 3)


def _warp_homography(img, hmat):
    """Bilinear inverse-map warp of [C,H,W] by 3x3 H in centered coords."""
    c, h, w = img.shape
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    xc, yc = xx - cx, yy - cy
    den = hmat[2, 0] * xc + hmat[2, 1] * yc + hmat[2, 2]
    xs = (hmat[0, 0] * xc + hmat[0, 1] * yc + hmat[0, 2]) / den + cx
    ys = (hmat[1, 0] * xc + hmat[1, 1] * yc + hmat[1, 2]) / den + cy
    x0 = np.floor(xs).astype(int)
    y0 = np.floor(ys).astype(int)
    tx, ty = xs - x0, ys - y0
    out = np.zeros_like(img)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = np.clip(x0 + dx, 0, w - 1)
            yi = np.clip(y0 + dy, 0, h - 1)
            wgt = (tx if dx else 1 - tx) * (ty if dy else 1 - ty)
            inside = (xs >= -0.5) & (xs < w - 0.5) & (ys >= -0.5) & (ys < h - 0.5)
            out += img[:, yi, xi] * (wgt * inside)[None]
    return out


def _smooth_image(key, h, w):
    """Band-limited test image (augs feed CLIP, whose inputs are natural
    images — white noise would overstate interpolation differences)."""
    coarse = jax.random.uniform(key, (3, h // 8, w // 8))
    return jax.image.resize(coarse, (3, h, w), "cubic")


def test_perspective_affine_fit_deviation():
    """Measured deviation of the affine fit vs the exact homography at the
    pipeline's distortion (0.33, torchvision corner-displacement scheme)."""
    from aphantasia_tpu.ops.augs import random_perspective_affine, _fit_affine
    from aphantasia_tpu.ops.sep_warp import affine_warp

    h = w = 64
    img = np.asarray(_smooth_image(jax.random.PRNGKey(0), h, w))
    rng = np.random.RandomState(3)
    devs_mean, devs_max = [], []
    for trial in range(8):
        half_h = 0.33 * h // 2
        half_w = 0.33 * w // 2
        d = rng.rand(4, 2)
        cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
        corners = np.asarray([[-cx, -cy], [cx, -cy], [cx, cy], [-cx, cy]])
        disp = np.asarray([
            [d[0, 0] * half_w, d[0, 1] * half_h],
            [-d[1, 0] * half_w, d[1, 1] * half_h],
            [-d[2, 0] * half_w, -d[2, 1] * half_h],
            [d[3, 0] * half_w, -d[3, 1] * half_h]])
        endpoints = corners + disp

        hmat = _homography(corners, endpoints)       # src=corners at dst=end
        exact = _warp_homography(img, hmat)

        aff = _fit_affine(jnp.asarray(endpoints)[None],
                          jnp.asarray(corners)[None])       # [1,2,3]
        ours = np.asarray(affine_warp(jnp.asarray(img)[None], aff,
                                      pad=16))[0]

        # compare away from borders: corner displacements reach 0.33*h/2
        # ~ 10px, and the two warps pull in fill zeros at different places
        # there — that's frame-edge handling, not interpolation fidelity
        sl = slice(12, -12)
        diff = np.abs(exact[:, sl, sl] - ours[:, sl, sl])
        devs_mean.append(diff.mean())
        devs_max.append(diff.max())

    # measured on 2026-08-16: mean ~0.06, worst-trial mean ~0.10 of a [0,1]
    # image at full distortion 0.33 — a real (documented) distribution
    # change, diluted to ~1% expected pixel deviation in the pipeline by
    # the p=0.2 application probability (transforms.py:165).  These bounds
    # pin the measured deviation so it cannot silently grow.
    assert np.mean(devs_mean) < 0.12, devs_mean
    # per-pixel max stays informational: it is dominated by sub-pixel edge
    # flips; print for the record instead of pinning a flaky bound
    print(f" perspective-vs-affine: mean dev {np.mean(devs_mean):.4f}, "
          f"max {np.max(devs_max):.3f}")


def test_fast_transform_converges_like_none():
    """40-step tiny training: the full fast pipeline must reach a final
    similarity in the same band as transform='none' (augs are a training
    distribution change, not a quality regression)."""
    from tests.test_step import TINY_CLIP, setup as _setup  # noqa: F401
    from aphantasia_tpu.params.fft import FFTParameterizer
    from aphantasia_tpu.ops.sampler import CutoutSampler
    from aphantasia_tpu.ops.optim import build_optimizer
    from aphantasia_tpu.models.clip.model import clip_init, encode_text
    from aphantasia_tpu.models.clip.tokenizer import tokenize
    from aphantasia_tpu.parallel.step import StepSettings, build_train_step

    clip_params = clip_init(jax.random.PRNGKey(0), TINY_CLIP)
    par = FFTParameterizer((48, 48), 1.5, 1.8)
    sampler = CutoutSampler((48, 48), 8, 32, align="uniform", macro=0.4)
    toks = np.clip(tokenize(["fidelity probe"], context_length=16), 0, 255)
    emb = encode_text(clip_params, TINY_CLIP, jnp.asarray(toks))
    prompts = ((emb, jnp.ones((1,)), jnp.float32(-1.0)),)

    def final_loss(transform):
        settings = StepSettings(sim="cossim", transform=transform,
                                total_steps=40)
        opt = build_optimizer("adam_custom", 0.05)
        step = build_train_step(par, sampler, TINY_CLIP, settings, opt)
        p = par.init(jax.random.PRNGKey(1))
        s = opt.init(p)
        prev = jnp.zeros((8, TINY_CLIP.embed_dim))
        tail = []
        for i in range(40):
            p, s, prev, loss = step(p, s, prev, clip_params, None, None,
                                    prompts, jax.random.PRNGKey(100 + i),
                                    jnp.int32(i))
            if i >= 34:
                tail.append(float(loss))
        return np.mean(tail)

    l_none = final_loss("none")
    l_fast = final_loss("fast")
    # both maximize similarity (loss = -cossim); fast trains a harder,
    # augmented objective — allow a band, but it must clearly converge
    assert l_fast < 0.6 * l_none or l_fast < -0.2, (l_none, l_fast)
