"""End-to-end training-step tests on a tiny config (SURVEY.md §4 item 3)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aphantasia_tpu.params.fft import FFTParameterizer
from aphantasia_tpu.ops.sampler import CutoutSampler
from aphantasia_tpu.ops.optim import build_optimizer
from aphantasia_tpu.models.clip.model import CLIPConfig, clip_init, encode_text
from aphantasia_tpu.models.clip.tokenizer import tokenize
from aphantasia_tpu.parallel.step import StepSettings, build_train_step, build_render

TINY_CLIP = CLIPConfig("tiny", 32, 32, 2, 32, 16, context_length=16,
                       vocab_size=256, transformer_width=32,
                       transformer_heads=2, transformer_layers=2,
                       vision_heads_override=2)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    clip_params = clip_init(key, TINY_CLIP)
    par = FFTParameterizer((48, 48), decay_power=1.5, colors=1.8)
    sampler = CutoutSampler((48, 48), count=8, modsize=32, align="uniform",
                            macro=0.4)
    toks = np.clip(tokenize(["a tiny test prompt"], context_length=16), 0, 255)
    emb = encode_text(clip_params, TINY_CLIP, jnp.asarray(toks))
    prompts = ((emb, jnp.ones((1,)), jnp.float32(-1.0)),)
    return clip_params, par, sampler, prompts


def _run(setup, settings, n=3):
    clip_params, par, sampler, prompts = setup
    opt = build_optimizer("adam_custom", 0.05)
    step = build_train_step(par, sampler, TINY_CLIP, settings, opt)
    params = par.init(jax.random.PRNGKey(1))
    opt_state = opt.init(params)
    prev_enc = jnp.zeros((sampler.count, TINY_CLIP.embed_dim))
    losses = []
    for i in range(n):
        params, opt_state, prev_enc, loss = step(
            params, opt_state, prev_enc, clip_params, None, None, prompts,
            jax.random.PRNGKey(10 + i), jnp.int32(i))
        losses.append(float(loss))
    return params, losses


def test_basic_step_updates_params(setup):
    settings = StepSettings(sim="mix", transform="none", total_steps=3)
    params, losses = _run(setup, settings)
    assert all(np.isfinite(losses))


def test_loss_decreases(setup):
    settings = StepSettings(sim="cossim", transform="none", total_steps=30)
    _, losses = _run(setup, settings, n=30)
    assert losses[-1] < losses[0]  # maximizing similarity -> loss falls


def test_all_terms_finite(setup):
    settings = StepSettings(sim="mix", transform="fast", sharp=0.3,
                            enforce=0.1, expand=0.1, noise=0.05,
                            total_steps=4)
    _, losses = _run(setup, settings, n=4)
    assert all(np.isfinite(losses))


@pytest.mark.parametrize("tf", ["fast", "custom", "elastic", "none"])
def test_transforms_run(setup, tf):
    settings = StepSettings(sim="cossim", transform=tf, total_steps=2)
    _, losses = _run(setup, settings, n=2)
    assert all(np.isfinite(losses))


@pytest.mark.parametrize("opt_name", ["adam", "adam_custom", "adamw", "adamw_custom"])
def test_optimizers(setup, opt_name):
    clip_params, par, sampler, prompts = setup
    opt = build_optimizer(opt_name, 0.05)
    settings = StepSettings(sim="cossim", transform="none", total_steps=2)
    step = build_train_step(par, sampler, TINY_CLIP, settings, opt)
    params = par.init(jax.random.PRNGKey(1))
    opt_state = opt.init(params)
    prev_enc = jnp.zeros((sampler.count, TINY_CLIP.embed_dim))
    p2, _, _, loss = step(params, opt_state, prev_enc, clip_params, None, None,
                          prompts, jax.random.PRNGKey(5), jnp.int32(0))
    assert np.isfinite(float(loss))


def test_render(setup):
    _, par, _, _ = setup
    params = par.init(jax.random.PRNGKey(2))
    frame = build_render(par)(params, contrast=1.1)
    assert frame.shape == (48, 48, 3)
    assert frame.dtype == jnp.uint8


@pytest.mark.slow
def test_sharded_step_matches_single(setup):
    from aphantasia_tpu.parallel.mesh import make_mesh
    clip_params, par, sampler, prompts = setup
    settings = StepSettings(sim="cossim", transform="none", total_steps=2)
    opt = build_optimizer("adam_custom", 0.05)
    params0 = par.init(jax.random.PRNGKey(1))
    prev = jnp.zeros((sampler.count, TINY_CLIP.embed_dim))

    step1 = build_train_step(par, sampler, TINY_CLIP, settings, opt)
    p1, _, _, l1 = step1(jnp.copy(params0), opt.init(params0), jnp.copy(prev),
                         clip_params, None, None, prompts,
                         jax.random.PRNGKey(3), jnp.int32(0))

    mesh = make_mesh(8)
    step8 = build_train_step(par, sampler, TINY_CLIP, settings, opt, mesh=mesh)
    p8, _, _, l8 = step8(jnp.copy(params0), opt.init(params0), jnp.copy(prev),
                         clip_params, None, None, prompts,
                         jax.random.PRNGKey(3), jnp.int32(0))
    assert abs(float(l1) - float(l8)) < 1e-4
    # adam's g/sqrt(v) normalization amplifies reduction-order noise on
    # near-zero grads; 0.05%-of-elements differences at ~4e-3 are expected
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=5e-3)


@pytest.mark.slow
def test_tensor_parallel_step_matches_single(setup):
    """dp x tp: CLIP weights sharded over 'model' (the --mesh NxM product
    path, parallel/mesh.py:shard_clip_params) must reproduce single-device
    numerics.  VERDICT r1 item 7."""
    from aphantasia_tpu.parallel.mesh import make_mesh_2d, shard_clip_params
    clip_params, par, sampler, prompts = setup
    settings = StepSettings(sim="cossim", transform="none", total_steps=2)
    opt = build_optimizer("adam_custom", 0.05)
    params0 = par.init(jax.random.PRNGKey(1))
    prev = jnp.zeros((sampler.count, TINY_CLIP.embed_dim))

    step1 = build_train_step(par, sampler, TINY_CLIP, settings, opt)
    p1, _, _, l1 = step1(jnp.copy(params0), opt.init(params0), jnp.copy(prev),
                         clip_params, None, None, prompts,
                         jax.random.PRNGKey(3), jnp.int32(0))

    mesh = make_mesh_2d(4, 2)
    clip_tp = shard_clip_params(clip_params, mesh)
    step_tp = build_train_step(par, sampler, TINY_CLIP, settings, opt,
                               mesh=mesh)
    pt, _, _, lt = step_tp(jnp.copy(params0), opt.init(params0),
                           jnp.copy(prev), clip_tp, None, None, prompts,
                           jax.random.PRNGKey(3), jnp.int32(0))
    assert abs(float(l1) - float(lt)) < 1e-4
    np.testing.assert_allclose(np.asarray(p1), np.asarray(pt), atol=5e-3)
