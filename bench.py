"""Headline benchmark: optimization iterations/sec at 1280x720, 200 samples,
CLIP ViT-B/32 (BASELINE.json metric).

Runs the fused jitted train step (decode -> 200 bicubic cutouts -> augment ->
CLIP ViT-B/32 fwd+bwd -> adam) on the available accelerator and prints ONE
JSON line {metric, value, unit, vs_baseline, ...}.  On TPU the line also
carries the secondary video metric (illustrip sustained frames/min, with
and without the 3D depth warp — BASELINE.json names it next to the
headline), so every driver BENCH_r*.json records both.

vs_baseline denominator: the reference publishes NO numbers and no GPU
exists here (BASELINE.md), so the denominator is MEASURED: the reference's
hot loop mirrored in torch, run at this exact config on this host's CPU
(bench_baseline_torch.py -> baseline_anchor.json).  MFU is estimated from
the compiled program's XLA flop count against the chip's bf16 peak.
CLIP weights are random-init (identical architecture/FLOPs — no checkpoint
download in this environment), which does not affect throughput.
"""
from __future__ import annotations

import json
import os
import time

# measured torch-CPU mirror at the headline config (baseline_anchor.json;
# regenerate with bench_baseline_torch.py)
_ANCHOR_KEY = "torch_cpu_1280x720_200s"
_ANCHOR_FALLBACK = 0.0147  # it/s, measured 2026-08-16 on the 1-core CI host

# bf16 peak of the chip bench targets (TPU v5e), for the MFU estimate
_PEAK_FLOPS = 197e12


def _vit_model_flops_per_step(cfg, samples: int) -> float:
    """Analytic *model* FLOPs per optimization step: the CLIP vision tower
    forward+backward only (bwd = 2x fwd matmul flops).  This is the
    conventional MFU numerator — it excludes the decode/sampler/warp
    machinery, whose matmul-DFT / dense-interpolation formulations
    intentionally overcompute for MXU shape (those DO count in the
    whole-program `mfu` number XLA reports).  VERDICT.md round-1
    weak-item 4 asked for both.

    The tower is FROZEN (no weight gradients — only activation grads
    flow back to the image), so backward is ~1x forward matmul flops
    (grad_x = grad_y @ W^T per matmul), not the 2x of training: total
    = 2x forward."""
    d, p, L = cfg.vision_width, cfg.vision_patch_size, cfg.vision_layers
    g = cfg.image_resolution // p
    t = g * g + 1
    patchify = 2 * (g * g) * (3 * p * p) * d
    per_layer = 24 * t * d * d + 4 * t * t * d   # qkv/out/mlp + scores/av
    proj = 2 * d * cfg.embed_dim
    fwd = patchify + L * per_layer + proj
    return 2.0 * fwd * samples


def _anchor_its() -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "baseline_anchor.json")
    try:
        with open(path) as f:
            return float(json.load(f)[_ANCHOR_KEY])
    except Exception:
        return _ANCHOR_FALLBACK


def main():
    import jax
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")
    if on_tpu:
        size, samples, steps, warmup = (720, 1280), 200, 3, 1
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
    inner = 40 if on_tpu else 2
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

    # Two MFU numbers (VERDICT r1 weak-4): `mfu_hw` uses XLA's whole-program
    # flop count (hardware utilization — includes the dense-interpolation /
    # matmul-DFT overcompute as "useful"), `mfu_model` uses the analytic
    # CLIP-tower fwd+bwd count (conventional model-FLOP utilization).
    mfu = mfu_model = None
    if on_tpu:
        try:
            compiled = loop.lower(gen_params, opt_state, prev_enc, clip_params,
                                  None, None, prompts, keys[0],
                                  jnp.int32(0)).compile()
            # XLA reports the scan BODY's flops once (verified against the
            # analytic count: ~5.7 TFLOP/step at this config), i.e. per step
            flops = compiled.cost_analysis()["flops"]
            mfu = flops * its / _PEAK_FLOPS
        except Exception:
            pass
        mfu_model = _vit_model_flops_per_step(cfg, samples) * its / _PEAK_FLOPS

    result = {
        "metric": "clip_fft iters/sec @1280x720, 200 samples, ViT-B/32"
                  if on_tpu else
                  f"clip_fft iters/sec @{size[1]}x{size[0]}, {samples} samples (CPU fallback)",
        "value": round(its, 3),
        "unit": "it/s",
        # measured anchor: torch-CPU mirror of the reference loop at the SAME
        # config/host (no published reference numbers, no GPU here — see
        # bench_baseline_torch.py / baseline_anchor.json)
        "vs_baseline": round(its / _anchor_its(), 1) if on_tpu else None,
        "baseline": f"{_anchor_its()} it/s (measured torch-CPU reference mirror)",
    }
    if mfu is not None:
        result["mfu"] = round(mfu, 3)          # hardware (XLA whole-program)
    if mfu_model is not None:
        result["mfu_model"] = round(mfu_model, 3)  # CLIP tower fwd+bwd only

    # Link-bandwidth probe (r5, VERDICT item 4): one 720p-frame-sized
    # (~2.7 MB) device->host pull, timed AFTER the headline warmed the
    # transfer path (the FIRST pull of a fresh process can stall minutes
    # on the tunnel).  Chip-day tunnel tuning swings the video metrics
    # 85-160 f/min across sessions while the compute headline reproduces
    # to 0.1% (BASELINE.md:62-70) — this makes every artifact
    # self-normalizing: expected ms/frame ~= frame_bytes/link + encode.
    if on_tpu:
        try:
            import numpy as _np
            base = jnp.zeros((720, 1280, 3), jnp.uint8)
            _np.asarray(base + jnp.uint8(0))      # warm compile + pull path
            times = []
            for i in range(1, 4):
                # a FRESH array each time: jax caches the host value on
                # the Array object after the first transfer, so re-pulling
                # the same object times the cache (observed 0.0 ms)
                f = base + jnp.uint8(i)
                f.block_until_ready()             # compute done (add ~ us)
                t0 = time.perf_counter()
                _np.asarray(f)
                times.append(time.perf_counter() - t0)
            t_med = sorted(times)[1]
            result["link_MBps"] = round(base.nbytes / t_med / 1e6, 1)
            result["link_ms_per_720p_frame"] = round(t_med * 1e3, 1)
        except Exception as e:  # pragma: no cover - hardware-dependent
            result["link_error"] = repr(e)[:80]

    # cppn family rate (r5, VERDICT item 2): the driver artifact tracks a
    # second generator family beyond FFT; guarded like the video stage so
    # the headline always prints
    if on_tpu and not os.environ.get("APHANTASIA_BENCH_NO_CPPN"):
        try:
            import contextlib
            import sys as _sys
            sys_path_dir = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "scripts")
            _sys.path.insert(0, sys_path_dir)
            try:
                from bench_entrypoints import bench_cppn
                with contextlib.redirect_stdout(_sys.stderr):
                    cp = bench_cppn(True)
                result["cppn_it_s"] = cp["it_s"]
                result["cppn_config"] = cp["config"]
            finally:
                _sys.path.remove(sys_path_dir)
        except Exception as e:  # pragma: no cover - hardware-dependent
            result["cppn_error"] = repr(e)[:120]

    # Video throughput, driver-visible (VERDICT r2 item 3): illustrip
    # frames/min with and without the DA-V2 3D depth warp, via the real
    # CLI entry point (bench_illustrip.measure — warm rate of the second
    # run = sustained production rate).  Guarded so the headline survives
    # any video failure; skip on CPU or with APHANTASIA_BENCH_NO_VIDEO=1.
    if on_tpu and not os.environ.get("APHANTASIA_BENCH_NO_VIDEO"):
        # A degraded tunnel HANGS on device->host pulls rather than raising
        # (observed 2026-08-19: a scalar pull took 195 s, then stopped
        # returning at all), so the video stage is alarm-bounded — the
        # headline JSON line must print even if illustrip never returns.
        import signal

        def _vtimeout(signum, frame):  # pragma: no cover - hw-dependent
            raise TimeoutError("video bench exceeded APHANTASIA_BENCH_VIDEO_TIMEOUT")

        budget = int(os.environ.get("APHANTASIA_BENCH_VIDEO_TIMEOUT", "1500"))
        old_handler = signal.signal(signal.SIGALRM, _vtimeout)
        signal.alarm(budget)
        try:
            import contextlib
            import statistics
            import sys
            from bench_illustrip import measure
            def marginal(f_small, small, f_big, big):
                """Sustained long-render frames/min: the MARGINAL rate
                between two warm window lengths — the ~6 s/run fixed
                setup (prompt-encode dispatches, mp4 assembly, writer
                drain) cancels exactly, leaving the steady-state rate a
                long render converges to.  r4 decomposition: the frame
                program computes at ~719 f/min, the async writer
                sustains ~312, and short windows under-report 2-3x
                (docs/TPU_MEASUREMENTS_r4.md §9)."""
                t_small = f_small * 60.0 / statistics.median(small)
                t_big = f_big * 60.0 / statistics.median(big)
                gap = t_big - t_small
                if gap < 1.0:   # a tunnel stall inverted/crushed the gap;
                    return None  # report nothing rather than an absurd rate
                return (f_big - f_small) * 60.0 / gap

            with contextlib.redirect_stdout(sys.stderr):  # keep the JSON
                _, w16 = measure(depth=0.0, frames=16,    # line clean+last
                                 warm_runs=2)
                _, w48 = measure(depth=0.0, frames=48, warm_runs=2)
                _, w12d = measure(depth=1.0, frames=12, warm_runs=2)
                _, w36d = measure(depth=1.0, frames=36, warm_runs=2)
            # windowed medians (comparable to the r3 history) + spreads
            # (VERDICT r3 item 4) + the sustained marginal rates; the
            # 16-vs-48 gap keeps the estimator's divisor ~6 s so timing
            # noise cannot swing it the way 16-vs-32 did (r4 measured
            # 252-490 f/min across same-day runs at the narrow gap);
            # bars in BASELINE.md
            warms, warms_d = w48, w36d
            med = statistics.median(warms)
            med_d = statistics.median(warms_d)
            result["video_frames_per_min"] = round(med, 1)
            result["video_fpm_spread"] = round(
                (max(warms) - min(warms)) / med, 3)
            result["video_frames_per_min_depth"] = round(med_d, 1)
            result["video_fpm_depth_spread"] = round(
                (max(warms_d) - min(warms_d)) / med_d, 3)
            sus = marginal(16, w16, 48, w48)
            sus_d = marginal(12, w12d, 36, w36d)
            if sus is not None:
                result["video_fpm_sustained"] = round(sus, 1)
            if sus_d is not None:
                result["video_fpm_sustained_depth"] = round(sus_d, 1)
            # self-normalized expectation (BASELINE.md, r5): serial model
            # ms/frame = transfer(2.765 MB / link) + frame program (83 ms
            # = 719 f/min on-device).  Pull/compute overlap can only beat
            # it (toward the pure-transfer bound), so the judgment band
            # is [0.7, 1.45].  Calibrated on three sessions: ratios
            # 0.88 / 0.93 / 1.04-1.38 (r5 fast-link, r5 slow-link, r4).
            if sus is not None and result.get("link_MBps"):
                t_frame_s = 2.765 / result["link_MBps"] + 0.083
                pred = 60.0 / t_frame_s
                result["video_fpm_predicted"] = round(pred, 1)
                result["video_fpm_vs_predicted"] = round(sus / pred, 2)
        except Exception as e:  # pragma: no cover - hardware-dependent
            result["video_error"] = repr(e)[:120]
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old_handler)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
