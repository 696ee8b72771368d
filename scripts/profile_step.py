"""Component-level step-cost profile at the headline bench config.

Reproduces docs/ROUND2_NOTES.md's table in one command: times each stage of
the training step (decode, cutout contraction, augmentation warp, CLIP
tower forward, full loss forward, full fwd+bwd+adam) as its own jitted
program, plus the full chained step from bench.py's scanned loop.

Not driver-run; results go into docs/ROUND2_NOTES.md by hand.

    python scripts/profile_step.py            # headline config on the TPU
    JAX_PLATFORMS=cpu python scripts/profile_step.py --tiny   # smoke
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from aphantasia_tpu.cli.common import apply_platform

apply_platform()   # persistent compile cache — repeat profile runs are hot

if "--tiny" in sys.argv:
    # the container's sitecustomize re-pins JAX_PLATFORMS=axon at interpreter
    # start (see tests/conftest.py), so CPU smoke needs the config override
    jax.config.update("jax_platforms", "cpu")


def timeit(fn, args, n=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    # axon: force completion with a scalar pull (bench.py NOTE)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / n * 1000.0   # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="CPU smoke config")
    ap.add_argument("--samples", type=int, default=None)
    ap.add_argument("--reps", type=int, default=30)
    a = ap.parse_args()

    from aphantasia_tpu.params.fft import FFTParameterizer
    from aphantasia_tpu.ops.sampler import CutoutSampler
    from aphantasia_tpu.ops.optim import build_optimizer
    from aphantasia_tpu.ops.augs import get_transform
    from aphantasia_tpu.models.clip.model import (CLIP_CONFIGS, clip_init,
                                                  encode_image)
    from aphantasia_tpu.parallel.step import (StepSettings, build_loss_fn,
                                              build_train_step)

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    if a.tiny or not on_tpu:
        size, samples, dtype, reps = (180, 320), 16, jnp.float32, 3
    else:
        size, samples, dtype, reps = (720, 1280), 200, jnp.bfloat16, a.reps
    if a.samples:
        samples = a.samples

    cfg = CLIP_CONFIGS["ViT-B/32"]
    clip_params = clip_init(jax.random.PRNGKey(0), cfg)
    if on_tpu:
        clip_params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            clip_params)
    par = FFTParameterizer(size, decay_power=1.5, colors=1.8)
    sampler = CutoutSampler(size, samples, cfg.image_resolution,
                            align="uniform", macro=0.4)
    settings = StepSettings(sim="mix", transform="fast", total_steps=200,
                            clip_dtype=dtype)
    optimizer = build_optimizer("adam_custom", 0.05)

    gen_params = par.init(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(3)
    embs = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.embed_dim))
    prompts = ((embs, jnp.ones((2,)), jnp.float32(-1.0)),)
    prev_enc = jnp.zeros((samples, cfg.embed_dim))
    opt_state = optimizer.init(gen_params)

    rows = []

    # decode
    dec = jax.jit(lambda p: par.image(p))
    rows.append(("FFT decode", timeit(dec, (gen_params,), reps)))

    # decode + cutouts
    def cuts_fn(p, k):
        img = par.image(p)
        boxes = sampler.sample_boxes(k)
        wy, wx = sampler.weight_matrices(boxes)
        tmp = jnp.einsum("smh,chw->scmw", wy, img[0].astype(dtype))
        return jnp.einsum("scmw,snw->scmn", tmp, wx.astype(dtype))
    cuts_j = jax.jit(cuts_fn)
    t_cuts = timeit(cuts_j, (gen_params, key), reps)
    rows.append(("+ cutout contraction", t_cuts))

    # + augmentation warp
    tf = get_transform("fast")
    aug_j = jax.jit(lambda p, k: tf(k, cuts_fn(p, k).astype(dtype)))
    t_aug = timeit(aug_j, (gen_params, key), reps)
    rows.append(("+ augmentation warp", t_aug))

    # + CLIP tower forward
    enc_j = jax.jit(lambda p, k: encode_image(
        clip_params, cfg, tf(k, cuts_fn(p, k).astype(dtype)), dtype=dtype))
    t_enc = timeit(enc_j, (gen_params, key), reps)
    rows.append(("+ CLIP tower fwd", t_enc))

    # full loss forward
    loss_fn = build_loss_fn(par, sampler, cfg, settings, None)
    lf_j = jax.jit(lambda p, k: loss_fn(p, clip_params, None, None, prompts,
                                        prev_enc, k, jnp.int32(1))[0])
    rows.append(("full loss fwd", timeit(lf_j, (gen_params, key), reps)))

    # full train step (fwd+bwd+adam) — donated args, so chain the outputs
    step = build_train_step(par, sampler, cfg, settings, optimizer)
    for _ in range(3):
        gp2, os2, pe2, loss = step(gen_params, opt_state, prev_enc,
                                   clip_params, None, None, prompts, key,
                                   jnp.int32(1))
        gen_params, opt_state, prev_enc = gp2, os2, pe2
    float(loss)
    t0 = time.perf_counter()
    for i in range(reps):
        gp2, os2, pe2, loss = step(gen_params, opt_state, prev_enc,
                                   clip_params, None, None, prompts,
                                   jax.random.fold_in(key, i), jnp.int32(1))
        gen_params, opt_state, prev_enc = gp2, os2, pe2
    float(loss)
    rows.append(("full fwd+bwd+adam step",
                 (time.perf_counter() - t0) / reps * 1000.0))

    print(f"\nconfig: {size[1]}x{size[0]}, {samples} samples, "
          f"ViT-B/32 {jnp.dtype(dtype).name}, platform "
          f"{jax.devices()[0].platform}")
    for name, ms in rows:
        print(f"  {name:<26} {ms:8.2f} ms")
    print(f"  -> {1000.0 / rows[-1][1]:.1f} it/s")


if __name__ == "__main__":
    main()
