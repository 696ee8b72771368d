"""Spatially-sharded FFT decode + cutout (parallel/spatial.py) on the
8-virtual-CPU mesh: numerics parity with the single-device path, gradient
parity through the all_to_all/psum transposes, and a 4K-canvas step with
params sharded, never replicated (SURVEY.md §2.6 row 4; VERDICT r1 item 5).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aphantasia_tpu.parallel.mesh import make_mesh
from aphantasia_tpu.parallel.spatial import SpatialFFT, unpad_spectrum
from aphantasia_tpu.params.fft import FFTParameterizer
from aphantasia_tpu.ops.sampler import CutoutSampler

pytestmark = pytest.mark.slow  # multi-device integration tier


def _mesh():
    return make_mesh(8, axes=("spatial",))


def _setup(size=(256, 384), samples=6, modsize=32):
    mesh = _mesh()
    spar = SpatialFFT(size, decay_power=1.5, colors=1.8, mesh=mesh)
    par = FFTParameterizer(size, 1.5, 1.8)
    sampler = CutoutSampler(size, samples, modsize, align="uniform", macro=0.3)
    params = par.init(jax.random.PRNGKey(0))             # canonical (unpadded)
    boxes = sampler.sample_boxes(jax.random.PRNGKey(1))
    wy, wx = sampler.weight_matrices(boxes)
    return mesh, spar, par, sampler, params, wy, wx


def _ref_cuts(par, params, wy, wx):
    img = par.image(params)[0]
    tmp = jnp.einsum("smh,chw->scmw", wy, img)
    return jnp.einsum("scmw,snw->scmn", tmp, wx)


def test_spatial_cut_matches_single_device():
    mesh, spar, par, sampler, params, wy, wx = _setup()
    ref = np.asarray(_ref_cuts(par, params, wy, wx))

    cuts_fn = jax.jit(spar.cut_fn(sampler))
    out = np.asarray(cuts_fn(spar.shard(params), wy, wx))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_spatial_render_matches_single_device():
    mesh, spar, par, _, params, _, _ = _setup()
    ref = np.asarray(par.image(params))
    out = np.asarray(jax.jit(spar.render)(spar.shard(params)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_spatial_grad_matches_single_device():
    mesh, spar, par, sampler, params, wy, wx = _setup(size=(128, 192),
                                                      samples=4)
    co = jax.random.normal(jax.random.PRNGKey(2), (4, 3, 32, 32))

    g_ref = jax.grad(
        lambda p: jnp.sum(_ref_cuts(par, p, wy, wx) * co))(params)

    cuts_fn = spar.cut_fn(sampler)
    g_sp = jax.grad(lambda p: jnp.sum(cuts_fn(p, wy, wx) * co))(
        spar.shard(params))
    g_sp = unpad_spectrum(g_sp, 192)
    np.testing.assert_allclose(np.asarray(g_sp), np.asarray(g_ref),
                               atol=2e-4, rtol=2e-3)


def test_4k_canvas_step_sharded():
    """4096x4096 canvas: a full loss+grad step runs with the spectrum
    sharded over 8 devices (reference scale claim: README.md:17)."""
    mesh = _mesh()
    size = (4096, 4096)
    spar = SpatialFFT(size, 1.5, 1.8, mesh)
    sampler = CutoutSampler(size, 2, 32, align="uniform")
    params = spar.init(jax.random.PRNGKey(0))
    # spectrum lives sharded on Wf
    assert params.sharding.spec == (None, None, None, "spatial", None)
    shard_w = params.addressable_shards[0].data.shape[3]
    assert shard_w == params.shape[3] // 8

    boxes = sampler.sample_boxes(jax.random.PRNGKey(1))
    wy, wx = sampler.weight_matrices(boxes)
    cuts_fn = spar.cut_fn(sampler)

    def loss(p):
        cuts = cuts_fn(p, wy, wx)
        return jnp.mean(cuts ** 2)

    val, grad = jax.jit(jax.value_and_grad(loss))(params)
    assert np.isfinite(float(val))
    assert grad.sharding.spec == params.sharding.spec
    assert np.isfinite(float(jnp.sum(jnp.abs(grad))))


def test_spatial_sharp_matches_derivat():
    """The halo-exchange 'naiv' sharpness must equal ops/losses.derivat of
    the gathered image."""
    from aphantasia_tpu.ops.losses import derivat
    mesh, spar, par, sampler, params, wy, wx = _setup(size=(128, 192),
                                                      samples=4)
    cuts_fn = spar.cut_fn(sampler, with_sharp=True)
    _, sharp = jax.jit(lambda p: cuts_fn(p, wy, wx))(spar.shard(params))
    ref = derivat(par.image(params), mode="naiv")
    np.testing.assert_allclose(float(sharp), float(ref), rtol=1e-4)


def test_clip_fft_spatial_cli_chunked(tmp_path):
    """clip_fft --spatial end-to-end: the chunked spatial frames loop
    (parallel/spatial.py:build_spatial_train_loop_frames) on the virtual
    mesh — frames saved, loss finite."""
    import os
    from aphantasia_tpu.cli.clip_fft import main
    out = str(tmp_path / "sp")
    main(["-t", "test", "--size", "96-64", "--steps", "4", "--samples", "3",
          "--out_dir", out, "-nv", "--transform", "none", "--spatial", "4"])
    run = [os.path.join(out, d) for d in os.listdir(out)
           if os.path.isdir(os.path.join(out, d))][0]
    frames = [f for f in os.listdir(run) if f.endswith(".jpg")]
    assert len(frames) == 4
