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


def test_perspective_exact_vs_torchvision():
    """BOTH perspective implementations — the XLA gather op
    (ops/perspective.homography_warp) and the banded-matmul Pallas kernel
    (ops/pallas_persp.perspective_warp, the APHANTASIA_EXACT_PERSP=1
    transforms_fast stage) — must stay within 1e-3 of torchvision
    RandomPerspective semantics at full distortion 0.33, on white noise
    (no smoothness to hide interpolation error) AND including borders
    (fill-mask semantics).  This is VERDICT r1 item 3's done-criterion."""
    torch = pytest.importorskip("torch")
    from aphantasia_tpu.ops.perspective import homography_warp
    from aphantasia_tpu.ops.pallas_persp import perspective_warp
    from tests.test_perspective import (_torch_coeffs, _torch_perspective,
                                        _random_endpoints)
    h = w = 64
    rng = np.random.RandomState(3)
    img = rng.rand(1, 3, h, w).astype(np.float32)
    worst_xla = worst_kern = 0.0
    for trial in range(8):
        start, end = _random_endpoints(rng, h, w, distortion=0.33)
        coeffs = _torch_coeffs(start, end)
        want = _torch_perspective(torch.from_numpy(img), coeffs).numpy()
        coef_j = jnp.asarray(coeffs.numpy())[None]
        got = np.asarray(homography_warp(jnp.asarray(img), coef_j))
        worst_xla = max(worst_xla, float(np.abs(got - want).max()))
        got_k = np.asarray(perspective_warp(
            jnp.asarray(img), coef_j, jnp.ones((1,), jnp.int32)))
        worst_kern = max(worst_kern, float(np.abs(got_k - want).max()))
    assert worst_xla <= 1e-3, worst_xla
    assert worst_kern <= 1e-3, worst_kern
    print(f" perspective max deviation vs torch: xla {worst_xla:.2e},"
          f" kernel {worst_kern:.2e}")


def test_pipeline_affine_fit_deviation_pinned():
    """The default hot path (since the r3 TPU A/B: 24.4 vs 7.7 it/s)
    warps at the affine FIT of the exact homography.  Pin the measured
    deviation of fit-vs-exact so it cannot silently grow; the
    APHANTASIA_EXACT_PERSP=1 path has no such deviation (the exact
    kernel, test above), and the DRAW distribution is torchvision-exact
    either way."""
    from aphantasia_tpu.ops.perspective import (perspective_coeffs,
                                                affine_fit_centered,
                                                homography_warp)
    from aphantasia_tpu.ops.sep_warp import affine_warp
    h = w = 64
    img = np.asarray(_smooth_image(jax.random.PRNGKey(0), h, w))
    rng = np.random.RandomState(5)
    devs = []
    for trial in range(8):
        from tests.test_perspective import _random_endpoints
        start, end = _random_endpoints(rng, h, w, distortion=0.33)
        coef = perspective_coeffs(jnp.asarray(start, jnp.float32),
                                  jnp.asarray(end, jnp.float32)[None])
        exact = np.asarray(homography_warp(jnp.asarray(img)[None], coef))[0]
        aff = affine_fit_centered(coef, h, w)
        ours = np.asarray(affine_warp(jnp.asarray(img)[None], aff,
                                      pad=16))[0]
        sl = slice(12, -12)   # borders handle fill differently by design
        devs.append(np.abs(exact[:, sl, sl] - ours[:, sl, sl]).mean())
    # measured 2026-08-17: mean ~0.05 of a [0,1] image at full distortion;
    # diluted ~5x in the pipeline by the p=0.2 application probability
    assert np.mean(devs) < 0.12, devs
    print(f" fit-vs-exact mean deviation: {np.mean(devs):.4f}")


def test_embedding_cosine_affine_and_mixed_pinned():
    """r5 (VERDICT item 1b): the fidelity of the fast-pipeline variants
    measured where it matters — CLIP-embedding cosine vs the exact
    torchvision pipeline on identical draws/weights.  Production-scale
    numbers (200 samples, 720p, 3 trials — scripts/measure_aug_cosine.py,
    docs/TPU_MEASUREMENTS_r5.md): affine 0.9928 mean (0.9764 on the
    persp-applied subset), mixed 0.9997.  This pins a reduced config
    (32 samples, 240x320) so the cosines cannot silently degrade."""
    import sys, os
    scripts = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts")
    sys.path.insert(0, scripts)
    try:
        from measure_aug_cosine import measure
        out = measure(samples=32, trials=1, size=(240, 320), seed=5)
    finally:
        sys.path.remove(scripts)
    af = out["affine_vs_exact"]["all"]
    mx = out["mixed_vs_exact"]["all"]
    # measured 2026-08-20 at this config: affine 0.988, mixed 0.9998
    assert af["mean"] >= 0.97, af
    assert mx["mean"] >= 0.997, mx
    # mixed removes the fit error (persp is where the fit errs; rotate is
    # affine-exact), so it must strictly dominate the fit
    assert mx["mean"] > af["mean"], (af, mx)
    assert mx["min"] > 0.99, mx


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
