"""Headline benchmark: optimization iterations/sec at 1280x720, 200 samples,
CLIP ViT-B/32 (BASELINE.json metric).

Runs the fused jitted train step (decode -> 200 bicubic cutouts -> augment ->
CLIP ViT-B/32 fwd+bwd -> adam) on the available accelerator and prints ONE
JSON line {metric, value, unit, vs_baseline}.

vs_baseline denominator: the reference publishes NO numbers (BASELINE.md).
We use 1.0 it/s as the nominal reference-GPU figure for this exact config
(T4/P100-class throughput implied by the reference's Colab guidance,
IllusTrip3D.ipynb cell 1); the target in BASELINE.json is >=20x that.
CLIP weights are random-init (identical architecture/FLOPs — no checkpoint
download in this environment), which does not affect throughput.
"""
from __future__ import annotations

import json
import time


def main():
    import jax
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")
    if on_tpu:
        size, samples, steps, warmup = (720, 1280), 200, 5, 2
        dtype = jnp.bfloat16
        chunk = 0
    else:  # CPU fallback so the bench never crashes off-TPU (scaled config)
        size, samples, steps, warmup = (180, 320), 16, 6, 2
        dtype = jnp.float32
        chunk = 0

    from aphantasia_tpu.params.fft import FFTParameterizer
    from aphantasia_tpu.ops.sampler import CutoutSampler
    from aphantasia_tpu.ops.optim import build_optimizer
    from aphantasia_tpu.models.clip.model import CLIP_CONFIGS, clip_init
    from aphantasia_tpu.parallel.step import StepSettings, build_train_loop

    cfg = CLIP_CONFIGS["ViT-B/32"]
    key = jax.random.PRNGKey(0)
    clip_params = clip_init(key, cfg)
    if on_tpu:
        clip_params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            clip_params)
    par = FFTParameterizer(size, decay_power=1.5, colors=1.8)
    sampler = CutoutSampler(size, samples, cfg.image_resolution,
                            align="uniform", macro=0.4, chunk=chunk,
                            use_pallas=False)
    settings = StepSettings(sim="mix", transform="fast", total_steps=200,
                            clip_dtype=dtype)
    optimizer = build_optimizer("adam_custom", 0.05)
    inner = 10 if on_tpu else 2
    loop = build_train_loop(par, sampler, cfg, settings, optimizer, inner)

    gen_params = par.init(jax.random.PRNGKey(1))
    opt_state = optimizer.init(gen_params)
    prev_enc = jnp.zeros((samples, cfg.embed_dim))
    embs = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.embed_dim))
    prompts = ((embs, jnp.ones((2,)), jnp.float32(-1.0)),)

    def run_chunk(i, key):
        nonlocal gen_params, opt_state, prev_enc
        gen_params, opt_state, prev_enc, losses = loop(
            gen_params, opt_state, prev_enc, clip_params, None, None,
            prompts, key, jnp.int32(i))
        return losses

    keys = jax.random.split(jax.random.PRNGKey(3), steps + warmup)
    for i in range(warmup):
        losses = run_chunk(i * inner, keys[i])
    # NOTE: force completion via a scalar device->host pull — on the tunneled
    # axon platform block_until_ready can return before execution finishes
    float(losses[-1])
    t0 = time.perf_counter()
    for i in range(steps):
        losses = run_chunk((warmup + i) * inner, keys[warmup + i])
    float(losses[-1])  # depends on the full chained-step sequence
    dt = time.perf_counter() - t0
    its = steps * inner / dt

    baseline_gpu_its = 1.0  # nominal reference-GPU it/s (no published number)
    result = {
        "metric": "clip_fft iters/sec @1280x720, 200 samples, ViT-B/32"
                  if on_tpu else
                  f"clip_fft iters/sec @{size[1]}x{size[0]}, {samples} samples (CPU fallback)",
        "value": round(its, 3),
        "unit": "it/s",
        "vs_baseline": round(its / baseline_gpu_its, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
