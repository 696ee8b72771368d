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


# ---- round-2 composition (VERDICT r1 item 1) -------------------------------

def test_spatial_noise_shift_parity():
    """cut_fn with a padded spectrum shift == dense decode with the same
    shift (the --noise path: the shift is spectrum-shaped, so it shards
    exactly like the params)."""
    from aphantasia_tpu.parallel.spatial import pad_spectrum
    mesh, spar, par, sampler, params, wy, wx = _setup(size=(128, 192),
                                                      samples=4)
    shift = 0.2 * jax.random.uniform(jax.random.PRNGKey(5),
                                     (1, 1, 128, 192 // 2 + 1, 1))
    img = par.image(params, shift=shift)[0]
    tmp = jnp.einsum("smh,chw->scmw", wy, img)
    ref = np.asarray(jnp.einsum("scmw,snw->scmn", tmp, wx))

    cuts_fn = jax.jit(spar.cut_fn(sampler))
    out = np.asarray(cuts_fn(spar.shard(params), wy, wx,
                             shift=pad_spectrum(shift, spar.n)))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_spatial_grad_fn_noise_runs():
    """--noise through _spatial_grad_fn: finite loss/grads, and the noise
    draw actually changes the loss."""
    from aphantasia_tpu.parallel.spatial import _spatial_grad_fn
    from aphantasia_tpu.parallel.step import StepSettings
    from tests.test_step import TINY_CLIP
    from aphantasia_tpu.models.clip.model import clip_init, encode_text
    from aphantasia_tpu.models.clip.tokenizer import tokenize

    mesh = _mesh()
    spar = SpatialFFT((64, 96), 1.5, 1.8, mesh)
    sampler = CutoutSampler((64, 96), 4, 32, align="uniform")
    clip_params = clip_init(jax.random.PRNGKey(0), TINY_CLIP)
    toks = np.clip(tokenize(["noise probe"], context_length=16), 0, 255)
    emb = encode_text(clip_params, TINY_CLIP, jnp.asarray(toks))
    prompts = ((emb, jnp.ones((1,)), jnp.float32(-1.0)),)
    params = spar.init(jax.random.PRNGKey(1))

    def loss_for(noise):
        settings = StepSettings(sim="cossim", transform="none", noise=noise,
                                total_steps=2)
        gfn = jax.jit(_spatial_grad_fn(spar, sampler, TINY_CLIP, settings))
        (loss, enc), g = gfn(params, clip_params, None, None, prompts,
                             jnp.zeros((4, TINY_CLIP.embed_dim)),
                             jax.random.PRNGKey(2), jnp.int32(0))
        assert np.isfinite(float(loss))
        assert np.isfinite(np.asarray(g)).all()
        return float(loss)

    assert loss_for(0.0) != loss_for(2.0)


def test_spatial_dualmod_chunked_loop():
    """dual=(cfg2, every) in the chunked spatial loop: both towers
    compiled in, cond-swapped on the reference schedule — parity with
    manual per-step alternation."""
    from aphantasia_tpu.parallel.spatial import (
        _spatial_grad_fn, build_spatial_train_loop_frames)
    from aphantasia_tpu.parallel.step import StepSettings
    from aphantasia_tpu.ops.optim import build_optimizer
    from tests.test_step import TINY_CLIP
    from aphantasia_tpu.models.clip.model import (CLIPConfig, clip_init,
                                                  encode_text)
    from aphantasia_tpu.models.clip.tokenizer import tokenize

    TINY2 = CLIPConfig("tiny2", 32, 32, 2, 32, 16, context_length=16,
                       vocab_size=256, transformer_width=32,
                       transformer_heads=2, transformer_layers=2,
                       vision_heads_override=2)
    mesh = _mesh()
    spar = SpatialFFT((64, 96), 1.5, 1.8, mesh)
    sampler = CutoutSampler((64, 96), 4, 32, align="uniform")
    cp1 = clip_init(jax.random.PRNGKey(0), TINY_CLIP)
    cp2 = clip_init(jax.random.PRNGKey(99), TINY2)
    toks = np.clip(tokenize(["dual probe"], context_length=16), 0, 255)
    prompts1 = ((encode_text(cp1, TINY_CLIP, jnp.asarray(toks)),
                 jnp.ones((1,)), jnp.float32(-1.0)),)
    prompts2 = ((encode_text(cp2, TINY2, jnp.asarray(toks)),
                 jnp.ones((1,)), jnp.float32(-1.0)),)
    settings = StepSettings(sim="cossim", transform="none", total_steps=4)
    opt = build_optimizer("adam_custom", 0.05)

    params0 = spar.init(jax.random.PRNGKey(1))
    pe0 = jnp.zeros((4, TINY_CLIP.embed_dim))
    key = jax.random.PRNGKey(7)

    loop = build_spatial_train_loop_frames(spar, sampler, TINY_CLIP,
                                           settings, opt, opt_step=1,
                                           n_frames=4, dual=(TINY2, 2))
    gp, os_, pe, frames, losses = loop(params0, opt.init(params0), pe0,
                                       cp1, None, None, prompts1, cp2, None,
                                       prompts2, key, jnp.int32(0))
    assert frames.shape[0] == 4 and np.isfinite(np.asarray(losses)).all()

    # manual alternation: steps 2 (and 0? no: gstep>0) -> model2 at step 2
    gfn1 = jax.jit(_spatial_grad_fn(spar, sampler, TINY_CLIP, settings))
    gfn2 = jax.jit(_spatial_grad_fn(spar, sampler, TINY2, settings))
    gp2 = spar.init(jax.random.PRNGKey(1))
    os2 = opt.init(gp2)
    pe2 = pe0
    want = []
    for i in range(4):
        k = jax.random.fold_in(key, i)
        use2 = (i % 2 == 0) and i > 0
        gfn, cp, pr = (gfn2, cp2, prompts2) if use2 else (gfn1, cp1, prompts1)
        (loss, enc), g = gfn(gp2, cp, None, None, pr, pe2, k, jnp.int32(i))
        upd, os2 = opt.update(g, os2, gp2)
        gp2 = jax.tree_util.tree_map(lambda p, u: p + u, gp2, upd)
        pe2 = enc
        want.append(float(loss))
    np.testing.assert_allclose(np.asarray(losses), want, rtol=2e-4,
                               atol=1e-5)


def test_spatial_data_mesh_cut_parity():
    """('data','spatial') composition: cutouts sharded over 'data', the
    spectrum over 'spatial' — same numbers as the dense single-device
    reference."""
    from aphantasia_tpu.parallel.mesh import make_mesh_spatial
    mesh = make_mesh_spatial(4, "2")
    assert dict(mesh.shape) == {"data": 2, "spatial": 4}
    size = (128, 192)
    spar = SpatialFFT(size, 1.5, 1.8, mesh)
    assert spar.data_axis == "data"
    par = FFTParameterizer(size, 1.5, 1.8)
    sampler = CutoutSampler(size, 6, 32, align="uniform", macro=0.3)
    params = par.init(jax.random.PRNGKey(0))
    boxes = sampler.sample_boxes(jax.random.PRNGKey(1))
    wy, wx = sampler.weight_matrices(boxes)
    ref = np.asarray(_ref_cuts(par, params, wy, wx))

    cuts_fn = jax.jit(spar.cut_fn(sampler))
    out = np.asarray(cuts_fn(spar.shard(params), wy, wx))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)

    # gradient flows through the composed mesh
    co = jax.random.normal(jax.random.PRNGKey(2), ref.shape)
    g = jax.jit(jax.grad(
        lambda p: jnp.sum(cuts_fn(p, wy, wx) * co)))(spar.shard(params))
    assert np.isfinite(np.asarray(g)).all()


def test_clip_fft_spatial_composed_cli(tmp_path):
    """clip_fft --spatial 4 --mesh 2 --noise: the composed mesh + noise
    end-to-end on the virtual 8-device mesh."""
    import os
    from aphantasia_tpu.cli.clip_fft import main
    out = str(tmp_path / "spc")
    main(["-t", "test", "--size", "96-64", "--steps", "4", "--samples", "4",
          "--out_dir", out, "-nv", "--transform", "none", "--spatial", "4",
          "--mesh", "2", "--noise", "0.5"])
    run = [os.path.join(out, d) for d in os.listdir(out)
           if os.path.isdir(os.path.join(out, d))][0]
    frames = [f for f in os.listdir(run) if f.endswith(".jpg")]
    assert len(frames) == 4


def test_spatial_frame_warp_identity_roundtrip():
    """spatial_frame_warp with identity motion must match the dense
    round-trip (spectrum -> irfft2 -> frame_transform -> rfft2): the
    rfft/irfft pair Hermitian-projects a random spectrum (DC/Nyquist
    imaginary parts vanish), so the dense result is the parity target,
    not the raw params."""
    from aphantasia_tpu.parallel.spatial import (spatial_frame_warp,
                                                 unpad_spectrum)
    from aphantasia_tpu.params.fft import (spectrum_to_image,
                                           image_to_spectrum)
    from aphantasia_tpu.ops.warp import frame_transform
    mesh = _mesh()
    size = (64, 96)
    spar = SpatialFFT(size, 1.0, 1.8, mesh)
    par = FFTParameterizer(size, 1.0, 1.8)
    params = par.init(jax.random.PRNGKey(0))
    sharded = spar.shard(params)
    motion = (0.0, 0.0, 0.0, 1.0, 0.0)
    out = jax.jit(lambda p: spatial_frame_warp(spar, p, motion))(sharded)
    out = unpad_spectrum(out, size[1])

    img = spectrum_to_image(params, size)
    img = frame_transform(img, size, 0.0, (0.0, 0.0), 1.0, 0.0)
    dense = image_to_spectrum(img, size)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                               atol=2e-5, rtol=1e-4)


def test_spatial_frame_step_matches_dense():
    """build_spatial_frame_step == build_frame_step (FFT mode) on the
    virtual mesh: same motion warp math (rows gathered once, dense
    frame_transform), same sharded train steps, same render."""
    from aphantasia_tpu.parallel.spatial import (build_spatial_frame_step,
                                                 unpad_spectrum)
    from aphantasia_tpu.parallel.step import StepSettings, build_frame_step
    from aphantasia_tpu.ops.optim import build_optimizer
    from tests.test_step import TINY_CLIP
    from aphantasia_tpu.models.clip.model import clip_init, encode_text
    from aphantasia_tpu.models.clip.tokenizer import tokenize

    mesh = _mesh()
    size = (64, 96)
    spar = SpatialFFT(size, 1.0, 1.8, mesh)
    par = FFTParameterizer(size, 1.0, 1.8)
    sampler = CutoutSampler(size, 4, 32, align="uniform")
    cp = clip_init(jax.random.PRNGKey(0), TINY_CLIP)
    toks = np.clip(tokenize(["frame probe"], context_length=16), 0, 255)
    prompts = ((encode_text(cp, TINY_CLIP, jnp.asarray(toks)),
                jnp.ones((1,)), jnp.float32(-1.0)),)
    settings = StepSettings(sim="cossim", transform="none", total_steps=4)
    opt = build_optimizer("adam_custom", 0.05)
    params = par.init(jax.random.PRNGKey(1))
    pe0 = jnp.zeros((4, TINY_CLIP.embed_dim))
    key = jax.random.PRNGKey(9)
    motion = (jnp.float32(3.0), jnp.float32(1.0), jnp.float32(2.0),
              jnp.float32(1.01), jnp.float32(0.5))

    dense_fn = build_frame_step(par, sampler, TINY_CLIP, settings, opt,
                                "FFT", size, 2, smooth=False, contrast=1.2)
    # frame steps donate params/opt_state/prev_enc — give each call its own
    gp_d, _, pe_d, frame_d, losses_d = dense_fn(
        params, opt.init(params), jnp.array(pe0), cp, None, prompts, key,
        jnp.int32(1), motion)

    sp_fn = build_spatial_frame_step(spar, sampler, TINY_CLIP, settings,
                                     opt, 2, smooth=False, contrast=1.2)
    sharded = spar.shard(par.init(jax.random.PRNGKey(1)))
    gp_s, _, pe_s, frame_s, losses_s = sp_fn(
        sharded, opt.init(sharded), jnp.array(pe0), cp, None, prompts, key,
        jnp.int32(1), motion)

    np.testing.assert_allclose(np.asarray(losses_s), np.asarray(losses_d),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(unpad_spectrum(gp_s, size[1])), np.asarray(gp_d),
        rtol=2e-3, atol=2e-5)
    assert np.abs(np.asarray(frame_s).astype(int)
                  - np.asarray(frame_d).astype(int)).max() <= 1


def test_4k_spatial_frame_advance():
    """A full VIDEO frame advance (motion warp + train steps + uint8
    render) at 4K on the virtual 8-device mesh — the reference's
    'fullHD/4K and above' claim (README.md:17) for illustrip, sharded
    end-to-end: spectrum stays distributed, loss finite, frame rendered."""
    from aphantasia_tpu.parallel.spatial import build_spatial_frame_step
    from aphantasia_tpu.parallel.step import StepSettings
    from aphantasia_tpu.ops.optim import build_optimizer
    from tests.test_step import TINY_CLIP
    from aphantasia_tpu.models.clip.model import clip_init, encode_text
    from aphantasia_tpu.models.clip.tokenizer import tokenize

    mesh = _mesh()
    size = (2160, 4096)
    spar = SpatialFFT(size, 1.0, 1.8, mesh)
    sampler = CutoutSampler(size, 2, 32, align="uniform")
    cp = clip_init(jax.random.PRNGKey(0), TINY_CLIP)
    toks = np.clip(tokenize(["4k probe"], context_length=16), 0, 255)
    prompts = ((encode_text(cp, TINY_CLIP, jnp.asarray(toks)),
                jnp.ones((1,)), jnp.float32(-1.0)),)
    settings = StepSettings(sim="cossim", transform="none", total_steps=2)
    opt = build_optimizer("adam_custom", 0.05)
    params = spar.init(jax.random.PRNGKey(1))
    assert params.sharding.spec == (None, None, None, "spatial", None)
    motion = (jnp.float32(2.0), jnp.float32(1.0), jnp.float32(-1.0),
              jnp.float32(1.01), jnp.float32(0.2))
    fn = build_spatial_frame_step(spar, sampler, TINY_CLIP, settings, opt,
                                  1, smooth=False, contrast=1.2)
    gp, _, _, frame, losses = fn(params, opt.init(params),
                                 jnp.zeros((2, TINY_CLIP.embed_dim)), cp,
                                 None, prompts, jax.random.PRNGKey(2),
                                 jnp.int32(1), motion)
    assert gp.sharding.spec == (None, None, None, "spatial", None)
    assert frame.shape == (2160, 4096, 3) and frame.dtype == jnp.uint8
    assert np.isfinite(np.asarray(losses)).all()


def test_illustrip_spatial_cli(tmp_path):
    """illustrip --spatial end-to-end on the virtual mesh: sharded frame
    advance + sharded opt steps, frames written."""
    import os
    from aphantasia_tpu.cli.illustrip import main
    out = str(tmp_path / "isp")
    main(["-t", "test", "--size", "96-64", "--steps", "3", "--opt_step", "1",
          "--samples", "3", "--gen", "FFT", "--out_dir", out, "-nv",
          "--transform", "none", "--spatial", "4", "--fstep", "2"])
    work = [os.path.join(out, d) for d in os.listdir(out)][0]
    frames = [f for f in os.listdir(os.path.join(work, "ttt"))
              if f.endswith(".jpg")]
    assert len(frames) == 3


# ---- spatially-sharded DWT (parallel/spatial_dwt.py) ------------------------

def _dwt_setup(size=(512, 384), wave="coif2", samples=5):
    from aphantasia_tpu.parallel.spatial_dwt import SpatialDWT
    from aphantasia_tpu.params.dwt import DWTParameterizer
    mesh = _mesh()
    spar = SpatialDWT(size, wave, 0.3, 1.8, mesh)
    par = DWTParameterizer(size, wave, 0.3, 1.8)
    sampler = CutoutSampler(size, samples, 32, align="uniform", macro=0.3)
    params = par.init(jax.random.PRNGKey(0))
    boxes = sampler.sample_boxes(jax.random.PRNGKey(1))
    wy, wx = sampler.weight_matrices(boxes)
    return mesh, spar, par, sampler, params, wy, wx


def test_spatial_dwt_cut_and_render_match_dense():
    """Halo-exchange inverse DWT (SURVEY.md §2.6 row 4): sharded cutouts and
    render equal the dense DWTParameterizer at fp32 noise level."""
    mesh, spar, par, sampler, params, wy, wx = _dwt_setup()
    assert spar.k_fine >= 2   # the halo path must actually run
    ref = np.asarray(_ref_cuts(par, params, wy, wx))
    cuts_fn = jax.jit(spar.cut_fn(sampler))
    out = np.asarray(cuts_fn(spar.shard(params), wy, wx))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)

    r = np.asarray(jax.jit(spar.render)(spar.shard(params)))
    np.testing.assert_allclose(r, np.asarray(par.image(params)),
                               atol=2e-5, rtol=1e-4)


def test_spatial_dwt_grad_matches_dense():
    """Gradients flow through the ppermute halo exchanges / masks / psums:
    per-level parity with the dense pyramid (pad rows receive zero grad)."""
    mesh, spar, par, sampler, params, wy, wx = _dwt_setup(size=(256, 320),
                                                          wave="db3",
                                                          samples=4)
    co = jax.random.normal(jax.random.PRNGKey(2), (4, 3, 32, 32))
    g_ref = jax.grad(
        lambda p: jnp.sum(_ref_cuts(par, p, wy, wx) * co))(params)
    cuts_fn = spar.cut_fn(sampler)
    sharded = spar.shard(params)
    g_sp = jax.grad(lambda p: jnp.sum(cuts_fn(p, wy, wx) * co))(sharded)
    # pad rows of sharded levels must stay exactly zero-gradient
    for j in range(1, spar.k_fine + 1):
        pad = np.asarray(g_sp[j][:, :, :, spar.real_shapes[j][3]:])
        assert pad.size == 0 or np.abs(pad).max() == 0.0
    for a, b in zip(spar.unpad(g_sp), g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-3)


def test_spatial_dwt_sharding_layout():
    """Fine levels live row-sharded on the mesh; coarse tail replicated;
    shard(unpad(shard(p))) round-trips the canonical layout."""
    mesh, spar, par, _, params, _, _ = _dwt_setup()
    sh = spar.shard(params)
    for j, p in enumerate(sh):
        if 1 <= j <= spar.k_fine:
            assert p.sharding.spec == (None, None, None, "spatial", None)
            assert p.shape[3] == spar.mp[j] and p.shape[3] % 8 == 0
        else:
            assert p.shape == params[j].shape
    back = spar.unpad(sh)
    for a, b in zip(back, params):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_clip_fft_spatial_dwt_cli(tmp_path):
    """clip_fft --dwt --spatial end-to-end on the virtual mesh."""
    import os
    from aphantasia_tpu.cli.clip_fft import main
    out = str(tmp_path / "spd")
    main(["-t", "test", "--size", "96-64", "--steps", "4", "--samples", "3",
          "--out_dir", out, "-nv", "--transform", "none", "--spatial", "4",
          "--dwt", "--save_pt"])
    run = [os.path.join(out, d) for d in os.listdir(out)
           if os.path.isdir(os.path.join(out, d))][0]
    frames = [f for f in os.listdir(run) if f.endswith(".jpg")]
    assert len(frames) == 4
    # snapshot lands in the canonical (unpadded) pyramid layout
    from aphantasia_tpu.io.checkpoint import load_pt
    from aphantasia_tpu.params.dwt import dwt_shapes, dwt_max_level
    pts = [f for f in os.listdir(out) if f.endswith(".pt")]
    assert pts
    obj = load_pt(os.path.join(out, pts[0]))
    want = dwt_shapes((64, 96), "coif2", dwt_max_level(64))
    assert [tuple(np.asarray(p).shape) for p in obj] == [tuple(s) for s in want]


# ---- spatial depth mode (illustrip --spatial --depth) -----------------------

def test_spatial_frame_step_depth_matches_dense():
    """Depth-mode spatial frame step == dense build_frame_step given the
    same depth product: grid warp at the gathered frame, preview emitted
    for the next DA-V2 dispatch."""
    from aphantasia_tpu.parallel.spatial import (build_spatial_frame_step,
                                                 unpad_spectrum)
    from aphantasia_tpu.parallel.step import StepSettings, build_frame_step
    from aphantasia_tpu.ops.optim import build_optimizer
    from tests.test_step import TINY_CLIP
    from aphantasia_tpu.models.clip.model import clip_init, encode_text
    from aphantasia_tpu.models.clip.tokenizer import tokenize

    mesh = _mesh()
    size = (64, 96)
    spar = SpatialFFT(size, 1.0, 1.8, mesh)
    par = FFTParameterizer(size, 1.0, 1.8)
    sampler = CutoutSampler(size, 4, 32, align="uniform")
    cp = clip_init(jax.random.PRNGKey(0), TINY_CLIP)
    toks = np.clip(tokenize(["depth probe"], context_length=16), 0, 255)
    prompts = ((encode_text(cp, TINY_CLIP, jnp.asarray(toks)),
                jnp.ones((1,)), jnp.float32(-1.0)),)
    settings = StepSettings(sim="cossim", transform="none", total_steps=4)
    opt = build_optimizer("adam_custom", 0.05)
    params = par.init(jax.random.PRNGKey(1))
    pe0 = jnp.zeros((4, TINY_CLIP.embed_dim))
    key = jax.random.PRNGKey(9)
    motion = (jnp.float32(2.0), jnp.float32(1.0), jnp.float32(-1.0),
              jnp.float32(1.02), jnp.float32(0.3))
    # synthetic mirror-fused depth product at a DA-V2-ish resolution
    dmap = jax.random.uniform(jax.random.PRNGKey(3), (1, 1, 28, 42))
    dummy_deptha = object()   # with_depth gate only; tower runs outside

    dense_fn = build_frame_step(par, sampler, TINY_CLIP, settings, opt,
                                "FFT", size, 2, smooth=False, contrast=1.2,
                                deptha=dummy_deptha, depth=1.0, colors=1.8)
    gp_d, _, pe_d, frame_d, losses_d, prev_d = dense_fn(
        params, opt.init(params), jnp.array(pe0), cp, None, prompts, key,
        jnp.int32(1), motion, dmap)

    sp_fn = build_spatial_frame_step(spar, sampler, TINY_CLIP, settings,
                                     opt, 2, smooth=False, contrast=1.2,
                                     deptha=dummy_deptha, depth=1.0)
    sharded = spar.shard(par.init(jax.random.PRNGKey(1)))
    gp_s, _, pe_s, frame_s, losses_s, prev_s = sp_fn(
        sharded, opt.init(sharded), jnp.array(pe0), cp, None, prompts, key,
        jnp.int32(1), motion, dmap)

    np.testing.assert_allclose(np.asarray(losses_s), np.asarray(losses_d),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(unpad_spectrum(gp_s, size[1])), np.asarray(gp_d),
        rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(prev_s), np.asarray(prev_d),
                               rtol=1e-4, atol=2e-5)
    assert np.abs(np.asarray(frame_s).astype(int)
                  - np.asarray(frame_d).astype(int)).max() <= 1


def test_illustrip_spatial_depth_cli(tmp_path):
    """illustrip --spatial --depth end-to-end: sharded frame advance with
    the DA-V2 grid warp + double-buffered depth dispatch."""
    import os
    from aphantasia_tpu.cli.illustrip import main
    out = str(tmp_path / "ispd")
    main(["-t", "test", "--size", "96-64", "--steps", "2", "--opt_step", "1",
          "--samples", "3", "--gen", "FFT", "--out_dir", out, "-nv",
          "--transform", "none", "--spatial", "4", "--fstep", "2",
          "--depth", "1.0", "--depth_model", "s"])
    work = [os.path.join(out, d) for d in os.listdir(out)][0]
    frames = [f for f in os.listdir(os.path.join(work, "ttt"))
              if f.endswith(".jpg")]
    assert len(frames) == 2


def test_illustra_spatial_cli(tmp_path):
    """illustra --spatial end-to-end: two scenes on the sharded canvas with
    on-device keep-chaining, canonical .pt snapshots, crossfade assembly."""
    import os
    from aphantasia_tpu.cli.illustra import main
    out = str(tmp_path / "asp")
    txt = str(tmp_path / "scenes.txt")
    with open(txt, "w") as f:
        f.write("first scene\nsecond scene\n")
    main(["-t", txt, "--size", "96-64", "--steps", "2", "--save_step", "1",
          "--samples", "3", "--out_dir", out, "-nv", "--transform", "none",
          "--spatial", "4", "--aest", "0", "--lsteps", "2"])
    pts = [f for f in os.listdir(out) if f.endswith(".pt")]
    assert len(pts) == 2
    # canonical spectrum layout (Wf = 96//2+1), not the padded shard layout
    from aphantasia_tpu.io.checkpoint import load_pt
    spec = np.asarray(load_pt(os.path.join(out, pts[0])))
    assert spec.shape == (1, 3, 64, 49, 2)
    mp4s = [f for f in os.listdir(out) if f.endswith(".mp4")]
    assert "scenes.mp4" in mp4s   # assembled crossfade


# ---- spatial --sync (LPIPS on the sharded full-frame decode) ----------------

def test_spatial_sync_loss_matches_dense():
    """_spatial_grad_fn with an LPIPS sync bundle == dense build_loss_fn:
    the sharded full-frame decode (spar.image) feeds the same prog-decayed
    LPIPS term (reference clip_fft.py:268-270)."""
    from aphantasia_tpu.parallel.spatial import _spatial_grad_fn
    from aphantasia_tpu.parallel.step import StepSettings, build_loss_fn
    from aphantasia_tpu.models.lpips import lpips_load
    from tests.test_lpips import _random_states
    from tests.test_step import TINY_CLIP
    from aphantasia_tpu.models.clip.model import clip_init, encode_text
    from aphantasia_tpu.models.clip.tokenizer import tokenize

    mesh = _mesh()
    size = (64, 96)
    spar = SpatialFFT(size, 1.5, 1.8, mesh)
    par = FFTParameterizer(size, 1.5, 1.8)
    sampler = CutoutSampler(size, 4, 32, align="uniform")
    cp = clip_init(jax.random.PRNGKey(0), TINY_CLIP)
    toks = np.clip(tokenize(["sync probe"], context_length=16), 0, 255)
    prompts = ((encode_text(cp, TINY_CLIP, jnp.asarray(toks)),
                jnp.ones((1,)), jnp.float32(-1.0)),)
    lp = lpips_load(*_random_states(3))
    img_in = jax.random.uniform(jax.random.PRNGKey(4), (1, 3, 32, 48))
    bundle = (lp, img_in)
    settings = StepSettings(sim="cossim", transform="none", sync=1.5,
                            total_steps=4)
    params = par.init(jax.random.PRNGKey(1))
    pe = jnp.zeros((4, TINY_CLIP.embed_dim))
    key = jax.random.PRNGKey(8)

    dense = build_loss_fn(par, sampler, TINY_CLIP, settings)
    loss_d, _ = jax.jit(dense)(params, cp, None, bundle, prompts, pe, key,
                               jnp.int32(1))

    gfn = jax.jit(_spatial_grad_fn(spar, sampler, TINY_CLIP, settings))
    (loss_s, _), g = gfn(spar.shard(params), cp, None, bundle, prompts,
                         pe, key, jnp.int32(1))
    np.testing.assert_allclose(float(loss_s), float(loss_d), rtol=2e-4)
    assert np.isfinite(np.asarray(g)).all()

    # prog decay: the sync term shrinks as step_i grows (step 3 of 4)
    (loss_late, _), _ = gfn(spar.shard(params), cp, None, bundle, prompts,
                            pe, key, jnp.int32(3))
    assert float(loss_late) < float(loss_s)


def test_spatial_fast_transform_runs():
    """--transform fast on the sharded canvas: the exact-perspective
    Pallas kernel (ops/pallas_persp.py) runs inside shard_map on the
    virtual mesh — finite loss, finite sharded grads."""
    from aphantasia_tpu.parallel.spatial import _spatial_grad_fn
    from aphantasia_tpu.parallel.step import StepSettings
    from tests.test_step import TINY_CLIP
    from aphantasia_tpu.models.clip.model import clip_init, encode_text
    from aphantasia_tpu.models.clip.tokenizer import tokenize

    mesh = _mesh()
    spar = SpatialFFT((64, 96), 1.5, 1.8, mesh)
    sampler = CutoutSampler((64, 96), 4, 32, align="uniform")
    cp = clip_init(jax.random.PRNGKey(0), TINY_CLIP)
    toks = np.clip(tokenize(["fast probe"], context_length=16), 0, 255)
    emb = encode_text(cp, TINY_CLIP, jnp.asarray(toks))
    prompts = ((emb, jnp.ones((1,)), jnp.float32(-1.0)),)
    settings = StepSettings(sim="cossim", transform="fast", total_steps=2)
    gfn = jax.jit(_spatial_grad_fn(spar, sampler, TINY_CLIP, settings))
    params = spar.init(jax.random.PRNGKey(1))
    (loss, _), g = gfn(params, cp, None, None, prompts,
                       jnp.zeros((4, TINY_CLIP.embed_dim)),
                       jax.random.PRNGKey(2), jnp.int32(0))
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(g)).all()


def test_clip_fft_spatial_sync_cli(tmp_path):
    """clip_fft --spatial --sync end-to-end: LPIPS sync on the sharded
    canvas (random-init VGG in this hermetic env; path coverage)."""
    import os
    from imageio import imsave
    from aphantasia_tpu.cli.clip_fft import main
    img = (np.random.RandomState(0).rand(64, 96, 3) * 255).astype(np.uint8)
    src = str(tmp_path / "src.png")
    imsave(src, img)
    out = str(tmp_path / "sps")
    main(["-t", "test", "-i", src, "--sync", "0.4", "--size", "96-64",
          "--steps", "4", "--samples", "4", "--out_dir", out, "-nv",
          "--transform", "none", "--spatial", "4"])
    run = [os.path.join(out, d) for d in os.listdir(out)
           if os.path.isdir(os.path.join(out, d))][0]
    frames = [f for f in os.listdir(run) if f.endswith(".jpg")]
    assert len(frames) == 4


# ---- spatially-sharded RGB (illustrip default --gen RGB) --------------------

def test_spatial_rgb_cut_anchor_grad_parity():
    """SpatialRGB == dense PixelParameterizer: cutouts, the per-channel
    anchor moments, render, and gradients (container pad rows get exactly
    zero grad; H deliberately not divisible by the mesh)."""
    from aphantasia_tpu.parallel.spatial import SpatialRGB
    from aphantasia_tpu.params.pixel import PixelParameterizer
    size = (100, 96)
    mesh = _mesh()
    spar = SpatialRGB(size, 1.8, mesh)
    assert spar.h_container == 104
    par = PixelParameterizer(size, 1.8)
    params = par.init(jax.random.PRNGKey(0))
    sampler = CutoutSampler(size, 5, 32, align="uniform", macro=0.3)
    boxes = sampler.sample_boxes(jax.random.PRNGKey(1))
    wy, wx = sampler.weight_matrices(boxes)
    ref = np.asarray(_ref_cuts(par, params, wy, wx))

    cuts_fn = jax.jit(spar.cut_fn(sampler, with_anchors=True))
    out, (mc, sc) = cuts_fn(spar.shard(params), wy, wx)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)
    img = par.image(params)
    np.testing.assert_allclose(np.asarray(mc),
                               np.asarray(img.mean(axis=(0, 2, 3))),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(sc),
                               np.asarray(img.std(axis=(0, 2, 3), ddof=1)),
                               atol=2e-6)
    r = np.asarray(jax.jit(spar.render)(spar.shard(params)))
    assert r.shape == (1, 3, 100, 96)
    np.testing.assert_allclose(r, np.asarray(img), atol=2e-5, rtol=1e-4)

    co = jax.random.normal(jax.random.PRNGKey(2), ref.shape)
    g_ref = jax.grad(
        lambda p: jnp.sum(_ref_cuts(par, p, wy, wx) * co))(params)
    cf = spar.cut_fn(sampler)
    g_sp = jax.grad(lambda p: jnp.sum(cf(p, wy, wx) * co))(spar.shard(params))
    assert np.abs(np.asarray(g_sp[:, :, 100:])).max() == 0.0
    np.testing.assert_allclose(np.asarray(spar.unpad(g_sp)),
                               np.asarray(g_ref), atol=2e-5, rtol=1e-3)


def test_spatial_rgb_frame_step_matches_dense():
    """RGB-mode spatial frame step == dense build_frame_step: identity
    decode, gathered grid_warp + frame_transform, anchor losses."""
    from aphantasia_tpu.parallel.spatial import (SpatialRGB,
                                                 build_spatial_frame_step)
    from aphantasia_tpu.parallel.step import StepSettings, build_frame_step
    from aphantasia_tpu.params.pixel import PixelParameterizer
    from aphantasia_tpu.ops.optim import build_optimizer
    from tests.test_step import TINY_CLIP
    from aphantasia_tpu.models.clip.model import clip_init, encode_text
    from aphantasia_tpu.models.clip.tokenizer import tokenize

    mesh = _mesh()
    size = (64, 96)
    spar = SpatialRGB(size, 1.8, mesh)
    par = PixelParameterizer(size, 1.8)
    sampler = CutoutSampler(size, 4, 32, align="uniform")
    cp = clip_init(jax.random.PRNGKey(0), TINY_CLIP)
    toks = np.clip(tokenize(["rgb probe"], context_length=16), 0, 255)
    prompts = ((encode_text(cp, TINY_CLIP, jnp.asarray(toks)),
                jnp.ones((1,)), jnp.float32(-1.0)),)
    settings = StepSettings(sim="cossim", transform="none", total_steps=4,
                            rgb_anchors=True)
    opt = build_optimizer("adam_custom", 0.05)
    params = par.init(jax.random.PRNGKey(1))
    pe0 = jnp.zeros((4, TINY_CLIP.embed_dim))
    key = jax.random.PRNGKey(9)
    motion = (jnp.float32(2.0), jnp.float32(1.0), jnp.float32(-1.0),
              jnp.float32(1.02), jnp.float32(0.3))

    dense_fn = build_frame_step(par, sampler, TINY_CLIP, settings, opt,
                                "RGB", size, 2, smooth=False, contrast=1.1)
    gp_d, _, pe_d, frame_d, losses_d = dense_fn(
        params, opt.init(params), jnp.array(pe0), cp, None, prompts, key,
        jnp.int32(1), motion)

    sp_fn = build_spatial_frame_step(spar, sampler, TINY_CLIP, settings,
                                     opt, 2, smooth=False, contrast=1.1)
    sharded = spar.shard(par.init(jax.random.PRNGKey(1)))
    gp_s, _, pe_s, frame_s, losses_s = sp_fn(
        sharded, opt.init(sharded), jnp.array(pe0), cp, None, prompts, key,
        jnp.int32(1), motion)

    np.testing.assert_allclose(np.asarray(losses_s), np.asarray(losses_d),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(spar.unpad(gp_s)),
                               np.asarray(gp_d), rtol=2e-3, atol=2e-5)
    assert np.abs(np.asarray(frame_s).astype(int)
                  - np.asarray(frame_d).astype(int)).max() <= 1


def test_illustrip_spatial_rgb_cli(tmp_path):
    """illustrip --spatial with the default --gen RGB end-to-end."""
    import os
    from aphantasia_tpu.cli.illustrip import main
    out = str(tmp_path / "isrgb")
    main(["-t", "test", "--size", "96-64", "--steps", "3", "--opt_step", "1",
          "--samples", "3", "--gen", "RGB", "--out_dir", out, "-nv",
          "--transform", "none", "--spatial", "4", "--fstep", "2"])
    work = [os.path.join(out, d) for d in os.listdir(out)][0]
    frames = [f for f in os.listdir(os.path.join(work, "ttt"))
              if f.endswith(".jpg")]
    assert len(frames) == 3
