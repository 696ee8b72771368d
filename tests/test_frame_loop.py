"""Parity tests for the fused dispatch-amortizing loops
(parallel/step.py: build_train_loop_frames, build_frame_step).

Both must be numerically IDENTICAL to the per-step path they replace: the
loop folds the dispatch key with the global step index, so driving
build_train_step with the same fold reproduces every step bit-for-bit.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aphantasia_tpu.params.fft import FFTParameterizer
from aphantasia_tpu.ops.sampler import CutoutSampler
from aphantasia_tpu.ops.optim import build_optimizer
from aphantasia_tpu.ops.warp import frame_transform
from aphantasia_tpu.models.clip.model import CLIPConfig, clip_init
from aphantasia_tpu.parallel.step import (
    StepSettings, build_train_step, build_train_loop_frames,
    build_frame_step, frames_per_dispatch, build_render)

TINY_CLIP = CLIPConfig("tiny", 32, 32, 2, 32, 16, context_length=16,
                       vocab_size=256, transformer_width=32,
                       transformer_heads=2, transformer_layers=2,
                       vision_heads_override=2)
SIZE = (48, 48)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    clip_params = clip_init(key, TINY_CLIP)
    par = FFTParameterizer(SIZE, decay_power=1.5, colors=1.8)
    sampler = CutoutSampler(SIZE, count=6, modsize=32, align="uniform",
                            macro=0.4)
    emb = jax.random.normal(jax.random.PRNGKey(5), (1, TINY_CLIP.embed_dim))
    prompts = ((emb, jnp.ones((1,)), jnp.float32(-1.0)),)
    return clip_params, par, sampler, prompts


def test_train_loop_frames_matches_per_step(setup):
    """2 dispatches x 2 frame-groups x opt_step=2 == 8 per-step calls."""
    clip_params, par, sampler, prompts = setup
    settings = StepSettings(sim="cossim", transform="fast", total_steps=8)
    opt = build_optimizer("adam_custom", 0.05)
    opt_step, nf = 2, 2

    loop = build_train_loop_frames(par, sampler, TINY_CLIP, settings, opt,
                                   opt_step, nf, contrast=1.1,
                                   step_index="step")
    step = build_train_step(par, sampler, TINY_CLIP, settings, opt)
    render = build_render(par)

    init = par.init(jax.random.PRNGKey(1))
    keys = jax.random.split(jax.random.PRNGKey(2), 2)

    # chunked path (copies: the loop donates its carry buffers)
    gp = jnp.array(init)
    os_ = opt.init(gp)
    pe = jnp.zeros((sampler.count, TINY_CLIP.embed_dim))
    got_frames, got_losses = [], []
    for c in range(2):
        gp, os_, pe, frames, losses = loop(
            gp, os_, pe, clip_params, None, None, prompts, keys[c],
            jnp.int32(c * nf))
        got_frames.append(np.asarray(frames))
        got_losses.extend(np.asarray(losses).tolist())
    got_frames = np.concatenate(got_frames)

    # per-step reference with the same key folds
    gp2 = init
    os2 = opt.init(gp2)
    pe2 = jnp.zeros((sampler.count, TINY_CLIP.embed_dim))
    want_frames, want_losses = [], []
    for g in range(2 * nf * opt_step):
        k = jax.random.fold_in(keys[g // (nf * opt_step)], g)
        gp2, os2, pe2, loss = step(gp2, os2, pe2, clip_params, None, None,
                                   prompts, k, jnp.int32(g))
        want_losses.append(float(loss))
        if g % opt_step == 0:       # reference cadence: first step of group
            want_frames.append(np.asarray(render(gp2, contrast=1.1)))
    want_frames = np.stack(want_frames)

    # fused vs per-step programs reassociate fp ops; over 8 chained Adam
    # steps the drift compounds, so the tolerance is loose-ish (the first
    # steps match to ~1e-6)
    np.testing.assert_allclose(got_losses[:4], want_losses[:4],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got_losses, want_losses, rtol=2e-2, atol=2e-4)
    assert got_frames.shape == want_frames.shape
    # uint8 render: allow small differences from fp reassociation
    assert np.abs(got_frames.astype(int) - want_frames.astype(int)).max() <= 3
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gp2),
                               rtol=2e-2, atol=5e-3)


def test_frame_step_matches_unfused(setup):
    """build_frame_step (illustrip fused frame) == decode->warp->encode +
    fresh optimizer + opt_step per-step calls + render."""
    clip_params, par, sampler, prompts = setup
    h, w = SIZE
    settings = StepSettings(sim="cossim", transform="fast", total_steps=4,
                            noise=0.5, noise_centered=True)
    opt = build_optimizer("adam_custom", 0.05)
    opt_steps = 2

    fs = build_frame_step(par, sampler, TINY_CLIP, settings, opt, "FFT",
                          SIZE, opt_steps, smooth=False, contrast=1.2)
    step = build_train_step(par, sampler, TINY_CLIP, settings, opt)
    render = build_render(par)

    params0 = par.init(jax.random.PRNGKey(3))
    key = jax.random.PRNGKey(4)
    motion_vals = (3.0, 1.5, -2.0, 1.02, 0.5)
    motion = tuple(jnp.float32(v) for v in motion_vals)
    pe0 = jnp.zeros((sampler.count, TINY_CLIP.embed_dim))

    gp, os_, pe, frame, losses = fs(jnp.array(params0),
                                    opt.init(jnp.array(params0)),
                                    jnp.array(pe0), clip_params, None,
                                    prompts, key, jnp.int32(1), motion)

    # unfused reference
    angle, sh0, sh1, scale, shear = motion_vals
    spec = jax.lax.complex(params0[..., 0], params0[..., 1])
    img = jnp.fft.irfft2(spec, s=(h, w), norm="ortho")
    img = frame_transform(img, (h, w), angle, (sh0, sh1), scale, shear)
    spec2 = jnp.fft.rfft2(img, s=(h, w), norm="ortho")
    gp2 = jnp.stack([spec2.real, spec2.imag], axis=-1)
    os2 = opt.init(gp2)
    pe2 = pe0
    want_losses = []
    for s in range(opt_steps):
        k = jax.random.fold_in(key, s)
        gp2, os2, pe2, loss = step(gp2, os2, pe2, clip_params, None, None,
                                   prompts, k, jnp.int32(1))
        want_losses.append(float(loss))
    want_frame = np.asarray(render(gp2, contrast=1.2))

    np.testing.assert_allclose(np.asarray(losses), want_losses,
                               rtol=2e-4, atol=2e-5)
    assert np.abs(np.asarray(frame).astype(int)
                  - want_frame.astype(int)).max() <= 1
    # fused vs separate programs reassociate fp ops, and adam_custom's
    # beta1=0 turns tiny-gradient fp noise into near-sign-flip updates on
    # low-magnitude spectrum coordinates — the envelope is ABSOLUTE
    # (~5e-3, grew with the exact-homography fp32 LU solve and again with
    # the bf16 custom-VJP cutout/warp chains, whose remat order differs
    # between the fused and unfused programs).  The semantic parity
    # checks are the losses above (step-2 loss is computed after the
    # step-1 update, so params agree functionally) and the <=1
    # gray-level frame bound.
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gp2),
                               rtol=6e-3, atol=2.5e-2)


def test_frames_per_dispatch_divisor():
    assert frames_per_dispatch((720, 1280), 200) in (2, 4, 5, 8, 10)
    assert 200 % frames_per_dispatch((720, 1280), 200) == 0
    assert frames_per_dispatch((64, 64), 7) in (1, 7)
    assert frames_per_dispatch((4096, 4096), 199) == 1


def test_train_loop_frames_dual_matches_per_step(setup):
    """dualmod chunked loop (lax.cond tower swap) == per-step alternation."""
    clip_params, par, sampler, prompts = setup
    TINY2 = CLIPConfig("tiny2", 32, 32, 3, 48, 16, context_length=16,
                       vocab_size=256, transformer_width=32,
                       transformer_heads=2, transformer_layers=1,
                       vision_heads_override=2)
    clip_params2 = clip_init(jax.random.PRNGKey(9), TINY2)
    emb2 = jax.random.normal(jax.random.PRNGKey(6), (1, TINY2.embed_dim))
    prompts2 = ((emb2, jnp.ones((1,)), jnp.float32(-1.0)),)
    settings = StepSettings(sim="cossim", transform="none", total_steps=8)
    opt = build_optimizer("adam_custom", 0.05)
    opt_step, nf, dm = 1, 4, 2

    loop = build_train_loop_frames(par, sampler, TINY_CLIP, settings, opt,
                                   opt_step, nf, step_index="step",
                                   dual=(TINY2, dm))
    step1 = build_train_step(par, sampler, TINY_CLIP, settings, opt)
    step2 = build_train_step(par, sampler, TINY2, settings, opt)

    init = par.init(jax.random.PRNGKey(1))
    keys = jax.random.split(jax.random.PRNGKey(2), 2)

    gp = jnp.array(init)
    os_ = opt.init(gp)
    pe = jnp.zeros((sampler.count, TINY_CLIP.embed_dim))
    got_losses = []
    for c in range(2):
        gp, os_, pe, frames, losses = loop(
            gp, os_, pe, clip_params, None, None, prompts,
            clip_params2, None, prompts2, keys[c], jnp.int32(c * nf))
        got_losses.extend(np.asarray(losses).tolist())

    gp2 = init
    os2 = opt.init(gp2)
    pe2 = jnp.zeros((sampler.count, TINY_CLIP.embed_dim))
    want_losses = []
    for g in range(2 * nf):
        k = jax.random.fold_in(keys[g // nf], g)
        use2 = g > 0 and g % dm == 0   # clip_fft.py:135 schedule
        step = step2 if use2 else step1
        cw = clip_params2 if use2 else clip_params
        pr = prompts2 if use2 else prompts
        gp2, os2, pe2, loss = step(gp2, os2, pe2, cw, None, None, pr, k,
                                   jnp.int32(g))
        want_losses.append(float(loss))

    np.testing.assert_allclose(got_losses, want_losses, rtol=2e-3, atol=2e-4)
