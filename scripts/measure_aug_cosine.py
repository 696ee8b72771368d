"""Embedding-level fidelity of the fast-pipeline variants (VERDICT r4
item 1b).

The affine-fit default's fidelity evidence was pixel-level only
(tests/test_aug_fidelity.py pins mean deviation ~0.05 at full
distortion); this measures the fit where it matters — the CLIP
embeddings the loss actually consumes.  On IDENTICAL cutout draws,
identical transform draws (same key-split discipline as ops/augs.py) and
identical synthetic ViT-B/32 weights at the production headline config
(1280x720 frame, 200 cutouts, modsize 224, align=uniform, macro=0.4 —
bench.py's config, mirroring /root/reference/clip_fft.py defaults), it
encodes three pipelines:

  exact   perspective exact + rotate exact (torchvision bilinear
          semantics via ops/perspective.homography_warp — golden-tested
          <=1e-3 vs torch in tests/test_aug_fidelity.py)
  affine  the production default transforms_fast_affine (persp as
          least-squares affine fit, composed with rotate into one LDU
          sinc warp)
  mixed   transforms_fast_mixed semantics (persp exact, rotate as LDU
          sinc warp)

and reports per-sample embedding cosines vs `exact`, overall and on the
persp-applied subset (p=0.2 — the dilution the pixel tests predicted).
Synthetic weights suffice: the comparison is pipeline-vs-pipeline
through the same frozen function.

Usage: python scripts/measure_aug_cosine.py [--samples 200] [--trials 3]
       [--platform cpu|axon]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def exact_pipeline(key, cuts):
    """transforms_fast semantics via the XLA gather warp (platform-neutral
    — the Pallas kernel needs a TPU; homography_warp is the same
    torchvision math, <=1e-3 golden).  Key splits MATCH ops/augs.py's
    transforms_fast / transforms_fast_affine exactly, so draws are shared
    across pipelines under one key."""
    import jax
    import jax.numpy as jnp
    from aphantasia_tpu.ops.augs import random_erasing, _ROT_ANGLES
    from aphantasia_tpu.ops.perspective import (
        perspective_endpoints, perspective_coeffs, rotation_coeffs_for,
        homography_warp)
    from aphantasia_tpu.params.color import clip_normalize
    s, c, h, w = cuts.shape
    k1, k2, k3 = jax.random.split(key, 3)
    start, end = perspective_endpoints(k1, s, h, w, distortion=0.33, p=0.2)
    coef = perspective_coeffs(start, end)
    cuts = homography_warp(cuts, coef)
    cuts = random_erasing(k3, cuts)
    idx = jax.random.randint(k2, (s,), 0, len(_ROT_ANGLES))
    ang = jnp.asarray(_ROT_ANGLES)[idx]
    cuts = homography_warp(cuts, rotation_coeffs_for(ang, h, w))
    applied = jnp.abs(end - start[None]).max((1, 2)) > 0
    return clip_normalize(cuts), applied


def mixed_pipeline(key, cuts):
    """transforms_fast_mixed semantics, gather-warp perspective (see
    exact_pipeline): persp exact -> erase -> rotate as LDU sinc warp."""
    import jax
    from aphantasia_tpu.ops.augs import (random_erasing,
                                         random_rotate_affine)
    from aphantasia_tpu.ops.perspective import (perspective_endpoints,
                                                perspective_coeffs,
                                                homography_warp)
    from aphantasia_tpu.ops.sep_warp import affine_warp
    from aphantasia_tpu.params.color import clip_normalize
    import jax.numpy as jnp
    s, c, h, w = cuts.shape
    k1, k2, k3 = jax.random.split(key, 3)
    start, end = perspective_endpoints(k1, s, h, w, distortion=0.33, p=0.2)
    coef = perspective_coeffs(start, end)
    cuts = homography_warp(cuts, coef)
    cuts = random_erasing(k3, cuts)
    aff = random_rotate_affine(k2, s)
    cuts = affine_warp(cuts, aff, pad=56, compute_dtype=jnp.bfloat16)
    return clip_normalize(cuts)


def measure(samples=200, trials=3, size=(720, 1280), modsize=224,
            model="ViT-B/32", seed=0, production_kernels=False):
    """production_kernels=True swaps the exact/mixed sides to the
    PRODUCTION pipelines (ops/augs.transforms_fast / _mixed — the Pallas
    banded-matmul kernel) instead of the platform-neutral gather warp;
    only meaningful on TPU (Mosaic).  The kernel is <=1e-3-golden vs
    torch, so the two measurements should agree to ~1e-4 in cosine —
    running both closes the 'the exact side wasn't the shipped kernel'
    gap (docs/TPU_MEASUREMENTS_r5.md §1b)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from aphantasia_tpu.models.clip.model import (CLIP_CONFIGS, clip_init,
                                                  encode_image)
    from aphantasia_tpu.ops.augs import (transforms_fast_affine,
                                         transforms_fast,
                                         transforms_fast_mixed)
    from aphantasia_tpu.ops.sampler import CutoutSampler
    from aphantasia_tpu.params.fft import FFTParameterizer

    cfg = CLIP_CONFIGS[model]
    clip_params = clip_init(jax.random.PRNGKey(0), cfg)
    par = FFTParameterizer(size, decay_power=1.5, colors=1.8)
    img = par.image(par.init(jax.random.PRNGKey(1), sd=0.01))
    sampler = CutoutSampler(size, samples, modsize, align="uniform",
                            macro=0.4)

    # one jit PER pipeline (not one fused program), and clip_params/img
    # passed as ARGUMENTS: closured arrays embed as HLO constants, and
    # the tunneled remote-compile endpoint rejects a program body
    # carrying the ~450 MB ViT weights (HTTP 413)
    @jax.jit
    def cut(key, frame):
        k_box, k_t = jax.random.split(key)
        return sampler.cut(frame, sampler.sample_boxes(k_box)), k_t

    def emb_of(transform):
        @jax.jit
        def f(k_t, cuts, cp):
            e = encode_image(cp, cfg, transform(k_t, cuts))
            return e / jnp.linalg.norm(e, axis=-1, keepdims=True)
        return f

    if production_kernels:
        emb_ex = emb_of(transforms_fast)
        emb_mx = emb_of(transforms_fast_mixed)

        @jax.jit
        def applied_of(k_t, cuts):
            from aphantasia_tpu.ops.perspective import perspective_endpoints
            k1, _, _ = jax.random.split(k_t, 3)
            start, end = perspective_endpoints(
                k1, cuts.shape[0], *cuts.shape[2:], distortion=0.33, p=0.2)
            return jnp.abs(end - start[None]).max((1, 2)) > 0
    else:
        emb_ex = emb_of(lambda k, c: exact_pipeline(k, c)[0])
        emb_mx = emb_of(mixed_pipeline)

        @jax.jit
        def applied_of(k_t, cuts):
            return exact_pipeline(k_t, cuts)[1]
    emb_af = emb_of(transforms_fast_affine)

    cos_af, cos_mx, app = [], [], []
    for t in range(trials):
        cuts, k_t = cut(jax.random.PRNGKey(seed + 10 * t), img)
        e_ex = emb_ex(k_t, cuts, clip_params)
        cos_af.append(np.asarray(
            jnp.sum(emb_af(k_t, cuts, clip_params) * e_ex, -1)))
        cos_mx.append(np.asarray(
            jnp.sum(emb_mx(k_t, cuts, clip_params) * e_ex, -1)))
        app.append(np.asarray(applied_of(k_t, cuts)))
    cos_af = np.concatenate(cos_af)
    cos_mx = np.concatenate(cos_mx)
    app = np.concatenate(app)

    def stats(c):
        return {"mean": round(float(c.mean()), 5),
                "min": round(float(c.min()), 5),
                "p05": round(float(np.percentile(c, 5)), 5)}

    return {
        "config": {"samples": samples, "trials": trials, "size": list(size),
                   "modsize": modsize, "model": model,
                   "persp_applied_frac": round(float(app.mean()), 4)},
        "affine_vs_exact": {"all": stats(cos_af),
                            "persp_applied": stats(cos_af[app]),
                            "persp_identity": stats(cos_af[~app])},
        "mixed_vs_exact": {"all": stats(cos_mx),
                           "persp_applied": stats(cos_mx[app]),
                           "persp_identity": stats(cos_mx[~app])},
        "criterion": "mean embedding cosine >= 0.98 (BASELINE.json target "
                     "band applied at the pipeline level)",
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=200)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--production-kernels", action="store_true",
                    help="exact/mixed sides via the shipped Pallas "
                         "pipelines (TPU)")
    a = ap.parse_args(argv)
    import jax
    jax.config.update("jax_platforms", a.platform)
    out = measure(samples=a.samples, trials=a.trials,
                  production_kernels=a.production_kernels)
    out["production_kernels"] = a.production_kernels
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
