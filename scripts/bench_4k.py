"""4K-canvas measurements (VERDICT r2 item 8).

Two halves:
  * on the TPU: single-chip 4096x4096 clip_fft step rate (the reference's
    "fullHD/4K and above" claim, README.md:17), same scanned-loop shape
    as bench.py;
  * on the virtual 8-CPU mesh: compile the SHARDED spatial training loop
    and count its ICI collectives per scanned step (all_to_all /
    ppermute / all_reduce) straight from the optimized HLO — the scaling
    evidence a single real chip cannot provide.

    python scripts/bench_4k.py            # on TPU: rate; on CPU: counts
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_4k.py --collectives
"""
from __future__ import annotations

import argparse
import collections
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from aphantasia_tpu.cli.common import apply_platform


def bench_single_chip(size=(4096, 4096), samples=200, inner=20, steps=3,
                      model="ViT-B/32"):
    from aphantasia_tpu.params.fft import FFTParameterizer
    from aphantasia_tpu.ops.sampler import CutoutSampler
    from aphantasia_tpu.ops.optim import build_optimizer
    from aphantasia_tpu.models.clip.model import CLIP_CONFIGS, clip_init
    from aphantasia_tpu.parallel.step import StepSettings, build_train_loop

    cfg = CLIP_CONFIGS[model]
    dtype = jnp.bfloat16
    clip_params = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
        clip_init(jax.random.PRNGKey(0), cfg))
    par = FFTParameterizer(size, decay_power=1.5, colors=1.8)
    sampler = CutoutSampler(size, samples, cfg.image_resolution,
                            align="uniform", macro=0.4, use_pallas=False)
    settings = StepSettings(sim="mix", transform="fast", total_steps=200,
                            clip_dtype=dtype)
    optimizer = build_optimizer("adam_custom", 0.05)
    loop = build_train_loop(par, sampler, cfg, settings, optimizer, inner)

    gen_params = par.init(jax.random.PRNGKey(1))
    opt_state = optimizer.init(gen_params)
    prev_enc = jnp.zeros((samples, cfg.embed_dim))
    embs = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.embed_dim))
    prompts = ((embs, jnp.ones((2,)), jnp.float32(-1.0)),)

    keys = jax.random.split(jax.random.PRNGKey(3), steps + 1)
    gen_params, opt_state, prev_enc, losses = loop(
        gen_params, opt_state, prev_enc, clip_params, None, None, prompts,
        keys[0], jnp.int32(0))
    float(losses[-1])
    t0 = time.perf_counter()
    for i in range(steps):
        gen_params, opt_state, prev_enc, losses = loop(
            gen_params, opt_state, prev_enc, clip_params, None, None,
            prompts, keys[1 + i], jnp.int32((1 + i) * inner))
    float(losses[-1])
    its = steps * inner / (time.perf_counter() - t0)
    print(f"single-chip: {its:.2f} it/s "
          f"({size[1]}x{size[0]}, {samples} samples, {model} bf16)")
    return its


def count_spatial_collectives(size=(1024, 1024), samples=16, inner=4):
    """Compile the sharded spatial loop on the virtual mesh and count ICI
    collectives per scanned step from the optimized HLO."""
    from aphantasia_tpu.ops.sampler import CutoutSampler
    from aphantasia_tpu.ops.optim import build_optimizer
    from aphantasia_tpu.models.clip.model import CLIP_CONFIGS, clip_init
    from aphantasia_tpu.parallel.mesh import make_mesh_spatial
    from aphantasia_tpu.parallel.spatial import (
        SpatialFFT, build_spatial_train_loop_frames)
    from aphantasia_tpu.parallel.step import StepSettings

    n_dev = len(jax.devices())
    mesh = make_mesh_spatial(n_dev)
    cfg = CLIP_CONFIGS["ViT-B/32"]
    clip_params = clip_init(jax.random.PRNGKey(0), cfg)
    spar = SpatialFFT(size, 1.5, 1.8, mesh)
    sampler = CutoutSampler(size, samples, cfg.image_resolution,
                            align="uniform", macro=0.4, use_pallas=False)
    settings = StepSettings(sim="mix", transform="fast", total_steps=200)
    optimizer = build_optimizer("adam_custom", 0.05)
    loop = build_spatial_train_loop_frames(spar, sampler, cfg, settings,
                                           optimizer, opt_step=inner,
                                           n_frames=1)
    gen_params = spar.shard(spar.init(jax.random.PRNGKey(1)))
    opt_state = optimizer.init(gen_params)
    prev_enc = jnp.zeros((samples, cfg.embed_dim))
    embs = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.embed_dim))
    prompts = ((embs, jnp.ones((2,)), jnp.float32(-1.0)),)
    lowered = jax.jit(loop).lower(gen_params, opt_state, prev_enc,
                                  clip_params, None, None, prompts,
                                  jax.random.PRNGKey(3), jnp.int32(0))
    hlo = lowered.compile().as_text()
    ops = collections.Counter()
    for line in hlo.splitlines():
        m = re.search(r"= .*?\b(all-to-all|collective-permute|all-reduce|"
                      r"all-gather|reduce-scatter)(?:-start)?\(", line)
        if m:
            ops[m.group(1)] += 1
    print(f"spatial loop ({n_dev}-device virtual mesh, {size[1]}x{size[0]}, "
          f"{samples} samples, {inner} steps/dispatch):")
    for k, v in sorted(ops.items()):
        print(f"  {k:<22} {v:4d} ops in program  ~ {v / inner:.1f}/step")
    return ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--collectives", action="store_true",
                    help="count sharded-loop collectives (CPU mesh)")
    ap.add_argument("--model", default="ViT-B/32")
    ap.add_argument("--size", default="4096-4096", help="W-H")
    ap.add_argument("--samples", type=int, default=200)
    ap.add_argument("--inner", type=int, default=20)
    a = ap.parse_args()
    apply_platform()
    if a.collectives or jax.devices()[0].platform == "cpu":
        count_spatial_collectives()
    else:
        w, h = (int(v) for v in a.size.split("-"))
        bench_single_chip((h, w), a.samples, inner=a.inner, model=a.model)


if __name__ == "__main__":
    main()
