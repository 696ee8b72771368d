"""ICI collective-count tripwire for the sharded spatial step (r4).

docs/SCALING.md claims O(1) image-sized collectives per optimization
step on the spatial mesh (~1.2 all-to-all + ~1.8 all-reduce measured by
scripts/bench_4k.py --collectives).  This pins the claim in CI: compile
the sharded loop on the virtual mesh at TWO sample counts and TWO canvas
sizes and assert (a) the per-program counts stay under recorded bounds
and (b) they are IDENTICAL across configs — collectives that scaled with
samples or resolution would break the equality first.
"""
import collections
import re

import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


def _spatial_counts(size, samples, inner=2):
    from aphantasia_tpu.ops.sampler import CutoutSampler
    from aphantasia_tpu.ops.optim import build_optimizer
    from aphantasia_tpu.models.clip.model import CLIP_CONFIGS, clip_init
    import aphantasia_tpu.models.clip.model as clip_model
    from aphantasia_tpu.parallel.mesh import make_mesh_spatial
    from aphantasia_tpu.parallel.spatial import (
        SpatialFFT, build_spatial_train_loop_frames)
    from aphantasia_tpu.parallel.step import StepSettings

    clip_model.FUSED_ATTN = False
    mesh = make_mesh_spatial(2)
    cfg = CLIP_CONFIGS["ViT-B/32"]
    clip_params = clip_init(jax.random.PRNGKey(0), cfg)
    spar = SpatialFFT(size, 1.5, 1.8, mesh)
    sampler = CutoutSampler(size, samples, cfg.image_resolution,
                            align="uniform", macro=0.4)
    settings = StepSettings(sim="mix", transform="fast", total_steps=100)
    optimizer = build_optimizer("adam_custom", 0.05)
    loop = build_spatial_train_loop_frames(spar, sampler, cfg, settings,
                                           optimizer, opt_step=inner,
                                           n_frames=1)
    gp = spar.shard(spar.init(jax.random.PRNGKey(1)))
    embs = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.embed_dim))
    prompts = ((embs, jnp.ones((1,)), jnp.float32(-1.0)),)
    hlo = jax.jit(loop).lower(
        gp, optimizer.init(gp), jnp.zeros((samples, cfg.embed_dim)),
        clip_params, None, None, prompts, jax.random.PRNGKey(3),
        jnp.int32(0)).compile().as_text()
    ops = collections.Counter()
    for line in hlo.splitlines():
        m = re.search(r"= .*?\b(all-to-all|collective-permute|all-reduce|"
                      r"all-gather|reduce-scatter)(?:-start)?\(", line)
        if m:
            ops[m.group(1)] += 1
    return ops


def test_spatial_collectives_are_o1():
    base = _spatial_counts((128, 128), samples=6)
    more_samples = _spatial_counts((128, 128), samples=12)
    bigger_canvas = _spatial_counts((256, 192), samples=6)

    # (b) counts independent of sample count AND canvas size
    assert base == more_samples, (base, more_samples)
    assert base == bigger_canvas, (base, bigger_canvas)

    # (a) absolute bounds: the docs' measured ~1.2 a2a + ~1.8 ar per step
    # at inner=2 plus frame-level decode/render -> generous but O(1) caps
    inner = 2
    assert base.get("all-to-all", 0) <= 4 * inner, base
    assert base.get("all-reduce", 0) <= 4 * inner, base
    assert base.get("all-gather", 0) <= 3 * inner + 4, base
    assert sum(base.values()) <= 12 * inner + 8, base
