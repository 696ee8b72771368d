"""On-chip rates for the previously-unbenched entry points (VERDICT r4
item 2): cppn, clip_vqgan, illustra keep-chain, interpol.

bench.py covers clip_fft (headline it/s) and illustrip (video f/min);
this measures the remaining generator families at representative
production configs, with the same axon measurement discipline
(memory'd gotchas): chained dependent steps in ONE jit dispatch via the
production loop builders, completion forced by a scalar pull, one TPU
process at a time.

Configs (mirroring each CLI's defaults / the VERDICT-named points):
  cppn      1024x1024, nf=24, layers=10, act=unbias, 50 samples,
            align=overscan, adam(0.003), sim=cossim
            (cli/cppn.py defaults at the VERDICT-named 1024^2 canvas;
            reference cppn.py:268-305)
  vqgan     640x512 gumbel_f8_8192 latents, 190 samples (200 x0.95
            transform budget), sim=mix, adam_custom(0.1), fast augs —
            the production build_train_loop_frames path INCLUDING the
            per-step u8 render (CLIP_VQGAN.ipynb cell 6 semantics)
  illustra  1280x720 FFT, 190 samples, sim=cossim + sharp naiv (the
            keep-chain's per-scene hot loop; the chain rescale itself is
            once-per-scene and amortizes to ~0; reference
            illustra.py:216-263)
  interpol  1280x720 spectrum-crossfade decode (no CLIP), frames/min of
            the chunked shift-render program (reference
            aphantasia/interpol.py:48-60)

Usage: python scripts/bench_entrypoints.py [--families cppn,vqgan,...]
       [--platform axon|cpu] [--json OUT]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pull(x):
    """Force completion: scalar device->host pull (block_until_ready can
    return early through the tunnel)."""
    import jax.numpy as jnp
    return float(jnp.asarray(x).reshape(-1)[0])


def _time_loop(run_chunk, steps_per_chunk, chunks=3, warmup=1):
    for i in range(warmup):
        out = run_chunk(i)
    _pull(out)
    t0 = time.perf_counter()
    for i in range(chunks):
        out = run_chunk(warmup + i)
    _pull(out)
    dt = time.perf_counter() - t0
    return chunks * steps_per_chunk / dt


def _clip(on_tpu):
    import jax
    import jax.numpy as jnp
    from aphantasia_tpu.models.clip.model import CLIP_CONFIGS, clip_init
    cfg = CLIP_CONFIGS["ViT-B/32"]
    params = clip_init(jax.random.PRNGKey(0), cfg)
    if on_tpu:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)
    return cfg, params


def bench_cppn(on_tpu):
    import jax
    import jax.numpy as jnp
    import optax
    from aphantasia_tpu.params.cppn import CPPNParameterizer
    from aphantasia_tpu.ops.sampler import CutoutSampler
    from aphantasia_tpu.parallel.step import StepSettings, build_train_loop

    size, samples, inner = ((1024, 1024), 50, 20) if on_tpu \
        else ((128, 128), 4, 2)
    cfg, clip_params = _clip(on_tpu)
    par = CPPNParameterizer(size, 24, 10, "unbias")
    sampler = CutoutSampler(size, samples, cfg.image_resolution,
                            align="overscan", macro=0.4)
    settings = StepSettings(
        sim="cossim", transform="none", total_steps=inner * 5,
        clip_dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    optimizer = optax.adam(0.003)
    loop = build_train_loop(par, sampler, cfg, settings, optimizer, inner)
    gp = par.init(jax.random.PRNGKey(1))
    state = [gp, optimizer.init(gp), jnp.zeros((samples, cfg.embed_dim))]
    embs = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.embed_dim))
    prompts = ((embs, jnp.ones((1,)), jnp.float32(-1.0)),)
    keys = jax.random.split(jax.random.PRNGKey(3), 16)

    def run(i):
        state[0], state[1], state[2], losses = loop(
            *state, clip_params, None, None, prompts, keys[i],
            jnp.int32(i * inner))
        return losses[-1]

    return {"it_s": round(_time_loop(run, inner), 3),
            "config": f"{size[1]}x{size[0]} nf=24 l=10 s={samples}"}


def bench_vqgan(on_tpu):
    import jax
    import jax.numpy as jnp
    from aphantasia_tpu.models.vqgan import (VQGAN_CONFIGS, vqgan_init,
                                             VQGANParameterizer)
    from aphantasia_tpu.ops.sampler import CutoutSampler
    from aphantasia_tpu.ops.optim import build_optimizer
    from aphantasia_tpu.parallel.step import (StepSettings,
                                              build_train_loop_frames)

    cfg_v = VQGAN_CONFIGS["gumbel_f8_8192"]
    size, samples, nf = ((512, 640), 190, 10) if on_tpu \
        else ((64, 64), 4, 2)
    cfg, clip_params = _clip(on_tpu)
    dec = vqgan_init(jax.random.PRNGKey(4), cfg_v)
    if on_tpu:
        dec = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, dec)
    par = VQGANParameterizer(size, cfg_v, dec)
    sampler = CutoutSampler(size, samples, cfg.image_resolution,
                            align="uniform", macro=0.4)
    settings = StepSettings(
        sim="mix", transform="fast", total_steps=nf * 5,
        clip_dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    optimizer = build_optimizer("adam_custom", 0.1)
    # the production path (cli/clip_vqgan.py): nf step+render groups per
    # dispatch, opt_step=1 — the measured rate INCLUDES the u8 render
    loop = build_train_loop_frames(par, sampler, cfg, settings, optimizer,
                                   1, nf)
    gp = par.init(jax.random.PRNGKey(5))
    state = [gp, optimizer.init(gp), jnp.zeros((samples, cfg.embed_dim))]
    embs = jax.random.normal(jax.random.PRNGKey(6), (1, cfg.embed_dim))
    prompts = ((embs, jnp.ones((1,)), jnp.float32(-1.0)),)
    keys = jax.random.split(jax.random.PRNGKey(7), 16)

    def run(i):
        state[0], state[1], state[2], frames_u8, loss = loop(
            *state, clip_params, None, None, prompts, keys[i],
            jnp.int32(i * nf))
        return loss

    return {"it_s": round(_time_loop(run, nf), 3),
            "config": f"{size[1]}x{size[0]} gumbel_f8 s={samples} "
                      f"(incl. per-step render)"}


def bench_illustra(on_tpu):
    import jax
    import jax.numpy as jnp
    from aphantasia_tpu.params.fft import FFTParameterizer
    from aphantasia_tpu.ops.sampler import CutoutSampler
    from aphantasia_tpu.ops.optim import build_optimizer
    from aphantasia_tpu.parallel.step import StepSettings, build_train_loop

    size, samples, inner = ((720, 1280), 190, 40) if on_tpu \
        else ((96, 128), 4, 2)
    cfg, clip_params = _clip(on_tpu)
    par = FFTParameterizer(size, decay_power=1.5, colors=1.8)
    sampler = CutoutSampler(size, samples, cfg.image_resolution,
                            align="uniform", macro=0.4)
    settings = StepSettings(
        sim="cossim", sharp=0.3, sharp_mode="naiv", transform="fast",
        total_steps=inner * 5,
        clip_dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    optimizer = build_optimizer("adam_custom", 0.1)
    loop = build_train_loop(par, sampler, cfg, settings, optimizer, inner)
    gp = par.init(jax.random.PRNGKey(8))
    # keep-chain handoff (illustra.py:271-286): measured once, amortizes
    # over a scene's 150 steps
    gp = jax.tree_util.tree_map(
        lambda p: 1.5 * p / (p.max() - p.min()), gp)
    state = [gp, optimizer.init(gp), jnp.zeros((samples, cfg.embed_dim))]
    embs = jax.random.normal(jax.random.PRNGKey(9), (1, cfg.embed_dim))
    prompts = ((embs, jnp.ones((1,)), jnp.float32(-1.0)),)
    keys = jax.random.split(jax.random.PRNGKey(10), 16)

    def run(i):
        state[0], state[1], state[2], losses = loop(
            *state, clip_params, None, None, prompts, keys[i],
            jnp.int32(i * inner))
        return losses[-1]

    return {"it_s": round(_time_loop(run, inner), 3),
            "config": f"{size[1]}x{size[0]} s={samples} "
                      f"cossim+sharp (per-scene hot loop)"}


def bench_interpol(on_tpu):
    import jax
    import jax.numpy as jnp
    from aphantasia_tpu.params.fft import FFTParameterizer
    from aphantasia_tpu.parallel.step import build_shift_render_loop

    size, nf = ((720, 1280), 25) if on_tpu else ((96, 128), 4)
    par = FFTParameterizer(size, 1.5, 1.8)
    rloop = build_shift_render_loop(par, contrast=1.1)
    p1 = par.init(jax.random.PRNGKey(11))
    p2 = par.init(jax.random.PRNGKey(12))
    diff = jax.tree_util.tree_map(lambda a, b: b - a, p1, p2)

    # chain the dispatches through params (add 0*frame-sum) so the whole
    # sequence is data-dependent — no overlap hides the program cost
    frames_holder = [None]

    def run(i):
        xs = (jnp.arange(nf, dtype=jnp.float32) + i * nf) / (8.0 * nf)
        frames = rloop(p1, diff, xs)
        frames_holder[0] = frames
        return frames[-1, 0, 0, 0]

    fps = _time_loop(run, nf)
    # and the delivered rate including one device->host frame pull per
    # chunk (the tunnel-bound path a real render pays per frame)
    t0 = time.perf_counter()
    for i in range(2):
        f = rloop(p1, diff, (jnp.arange(nf, dtype=jnp.float32) + i) / 100.0)
        _ = jax.device_get(f)
    dt = time.perf_counter() - t0
    return {"f_min": round(fps * 60.0, 1),
            "f_min_with_pull": round(2 * nf * 60.0 / dt, 1),
            "config": f"{size[1]}x{size[0]} decode-only crossfade"}


def _headline_family(par_factory, label):
    """Headline-config bench (1280x720, 200 samples, ViT-B/32, sim=mix,
    fast augs — bench.py's exact shape) for an alternate generator."""
    def bench(on_tpu):
        import jax
        import jax.numpy as jnp
        from aphantasia_tpu.ops.sampler import CutoutSampler
        from aphantasia_tpu.ops.optim import build_optimizer
        from aphantasia_tpu.parallel.step import (StepSettings,
                                                  build_train_loop)
        size, samples, inner = ((720, 1280), 200, 40) if on_tpu \
            else ((96, 128), 4, 2)
        cfg, clip_params = _clip(on_tpu)
        par = par_factory(size)
        sampler = CutoutSampler(size, samples, cfg.image_resolution,
                                align="uniform", macro=0.4)
        settings = StepSettings(
            sim="mix", transform="fast", total_steps=inner * 5,
            clip_dtype=jnp.bfloat16 if on_tpu else jnp.float32)
        optimizer = build_optimizer("adam_custom", 0.05)
        loop = build_train_loop(par, sampler, cfg, settings, optimizer,
                                inner)
        gp = par.init(jax.random.PRNGKey(1))
        state = [gp, optimizer.init(gp),
                 jnp.zeros((samples, cfg.embed_dim))]
        embs = jax.random.normal(jax.random.PRNGKey(2),
                                 (1, cfg.embed_dim))
        prompts = ((embs, jnp.ones((1,)), jnp.float32(-1.0)),)
        keys = jax.random.split(jax.random.PRNGKey(3), 16)

        def run(i):
            state[0], state[1], state[2], losses = loop(
                *state, clip_params, None, None, prompts, keys[i],
                jnp.int32(i * inner))
            return losses[-1]

        return {"it_s": round(_time_loop(run, inner), 3),
                "config": f"{size[1]}x{size[0]} s={samples} {label}"}
    return bench


def _dwt_par(size):
    from aphantasia_tpu.params.dwt import DWTParameterizer
    return DWTParameterizer(size, "coif2", 0.3, 1.8)   # clip_fft --dwt defaults


def _pixel_par(size):
    from aphantasia_tpu.params.pixel import PixelParameterizer
    return PixelParameterizer(size, colors=1.8)


def bench_siren(on_tpu):
    """SIREN generator at the cppn CLI's siren defaults (nf=256, 5
    layers, w0=30 — cli/cppn.py:86-91) on the 1024^2 canvas."""
    import jax
    import jax.numpy as jnp
    import optax
    from aphantasia_tpu.params.siren import SIRENParameterizer
    from aphantasia_tpu.ops.sampler import CutoutSampler
    from aphantasia_tpu.parallel.step import StepSettings, build_train_loop

    size, samples, inner = ((1024, 1024), 50, 20) if on_tpu \
        else ((128, 128), 4, 2)
    cfg, clip_params = _clip(on_tpu)
    par = SIRENParameterizer(size, 256, 5, 30.0, 30.0)
    sampler = CutoutSampler(size, samples, cfg.image_resolution,
                            align="overscan", macro=0.4)
    settings = StepSettings(
        sim="cossim", transform="none", total_steps=inner * 5,
        clip_dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    optimizer = optax.adam(1e-4)
    loop = build_train_loop(par, sampler, cfg, settings, optimizer, inner)
    gp = par.init(jax.random.PRNGKey(1))
    state = [gp, optimizer.init(gp), jnp.zeros((samples, cfg.embed_dim))]
    embs = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.embed_dim))
    prompts = ((embs, jnp.ones((1,)), jnp.float32(-1.0)),)
    keys = jax.random.split(jax.random.PRNGKey(3), 16)

    def run(i):
        state[0], state[1], state[2], losses = loop(
            *state, clip_params, None, None, prompts, keys[i],
            jnp.int32(i * inner))
        return losses[-1]

    return {"it_s": round(_time_loop(run, inner), 3),
            "config": f"{size[1]}x{size[0]} siren nf=256 l=5 s={samples}"}


def bench_models(on_tpu, names=None):
    """Headline it/s per CLIP model at its xmem sample budget
    (reference clip_fft.py:125-127 cascade — the table users consult
    when switching models)."""
    import jax
    import jax.numpy as jnp
    from aphantasia_tpu.models.clip.model import (CLIP_CONFIGS, XMEM,
                                                  clip_init)
    from aphantasia_tpu.ops.sampler import CutoutSampler
    from aphantasia_tpu.ops.optim import build_optimizer
    from aphantasia_tpu.params.fft import FFTParameterizer
    from aphantasia_tpu.parallel.step import StepSettings, build_train_loop

    if names is None:
        names = (["ViT-B/16", "RN101", "RN50x4", "RN50x16", "ViT-L/14"]
                 if on_tpu else ["ViT-B/16"])
    size = (720, 1280) if on_tpu else (96, 128)
    out = {}
    for name in names:
        cfg = CLIP_CONFIGS[name]
        samples = max(int(200 * XMEM.get(name, 1.0)), 1) if on_tpu else 2
        inner = 20 if on_tpu else 2
        clip_params = clip_init(jax.random.PRNGKey(0), cfg)
        if on_tpu:
            clip_params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, clip_params)
        par = FFTParameterizer(size, decay_power=1.5, colors=1.8)
        sampler = CutoutSampler(size, samples, cfg.image_resolution,
                                align="uniform", macro=0.4)
        settings = StepSettings(
            sim="mix", transform="fast", total_steps=inner * 5,
            clip_dtype=jnp.bfloat16 if on_tpu else jnp.float32)
        optimizer = build_optimizer("adam_custom", 0.05)
        loop = build_train_loop(par, sampler, cfg, settings, optimizer,
                                inner)
        gp = par.init(jax.random.PRNGKey(1))
        state = [gp, optimizer.init(gp),
                 jnp.zeros((samples, cfg.embed_dim))]
        embs = jax.random.normal(jax.random.PRNGKey(2),
                                 (1, cfg.embed_dim))
        prompts = ((embs, jnp.ones((1,)), jnp.float32(-1.0)),)
        keys = jax.random.split(jax.random.PRNGKey(3), 16)

        def run(i, loop=loop, state=state, prompts=prompts, keys=keys,
                inner=inner, clip_params=clip_params):
            state[0], state[1], state[2], losses = loop(
                *state, clip_params, None, None, prompts, keys[i],
                jnp.int32(i * inner))
            return losses[-1]

        out[name] = {"it_s": round(_time_loop(run, inner, chunks=2), 3),
                     "samples": samples}
        print(f"   {name}: {out[name]}", flush=True)
    return out


FAMILIES = {"cppn": bench_cppn, "vqgan": bench_vqgan,
            "illustra": bench_illustra, "interpol": bench_interpol,
            "dwt": _headline_family(_dwt_par, "DWT coif2 headline"),
            "pixel": _headline_family(_pixel_par, "RGB-pixel headline"),
            "siren": bench_siren,
            "models": bench_models,
            "models_xl": lambda on_tpu: bench_models(
                on_tpu, names=["RN50x64"] if on_tpu else ["ViT-B/16"])}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default="cppn,vqgan,illustra,interpol")
    ap.add_argument("--platform", default=None,
                    help="cpu forces the CPU platform (tiny configs)")
    ap.add_argument("--json", default=None)
    a = ap.parse_args(argv)
    import jax
    if a.platform:
        jax.config.update("jax_platforms", a.platform)
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    out = {"platform": jax.devices()[0].platform}
    for fam in a.families.split(","):
        t0 = time.time()
        out[fam] = FAMILIES[fam](on_tpu)
        out[fam]["bench_s"] = round(time.time() - t0, 1)
        print(f" {fam}: {out[fam]}", flush=True)
    line = json.dumps(out)
    print(line)
    if a.json:
        with open(a.json, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
