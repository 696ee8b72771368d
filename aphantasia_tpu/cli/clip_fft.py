"""clip_fft — single-image CLIP-guided generation (FFT / DWT parameterizers).

Flag-compatible rebuild of the reference entry point (clip_fft.py:35-318):
same argument names, defaults and post-parse interactions (size parsing,
sync/resume -> overscan, dualmod -> ViT-B/32+cossim), the xmem sample-budget
cascade, prompt weighting, dual-model alternation, tone mapping and
.pt snapshots — running the fused jitted TPU step from parallel/step.py.

TPU-specific additions (not in the reference): --clip_weights (path to an
OpenAI/HF checkpoint; random-init fallback otherwise), --precision
(bf16|fp32|auto), --seed.
"""
from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import jax
import jax.numpy as jnp

from aphantasia_tpu.params.fft import FFTParameterizer, resume_fft
from aphantasia_tpu.params.dwt import DWTParameterizer, resume_dwt
from aphantasia_tpu.ops.sampler import CutoutSampler
from aphantasia_tpu.ops.optim import build_optimizer
from aphantasia_tpu.ops.losses import aesthetic_get, aesthetic_dims
from aphantasia_tpu.models.lpips import lpips_get
from aphantasia_tpu.parallel.step import (
    StepSettings, build_train_step, build_train_loop_frames,
    frames_per_dispatch, build_render)
from aphantasia_tpu.cli.common import (
    apply_persp,
    ClipWrapper, parse_size, apply_sample_budget, build_prompt_groups,
    dualmod_steps, maybe_translate, resolve_dtype, add_parallel_flags,
    setup_mesh, apply_platform)
from aphantasia_tpu.io.media import img_read, checkout, img_list, frames_to_video
from aphantasia_tpu.io.checkpoint import save_pt
from aphantasia_tpu.ops.resize import resize_bicubic
from aphantasia_tpu.utils import txt_clean, save_cfg
from aphantasia_tpu.progress import get_progress_bar

CLIP_MODELS = ["ViT-B/16", "ViT-B/32", "RN101", "RN50x16", "RN50x4", "RN50"]


def get_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('-t',  '--in_txt',  default=None, help='input text')
    parser.add_argument('-t2', '--in_txt2', default=None, help='input text - style')
    parser.add_argument('-t0', '--in_txt0', default=None, help='input text to subtract')
    parser.add_argument('-i',  '--in_img',  default=None, help='input image')
    parser.add_argument('-wi', '--weight_img', default=0.5, type=float, help='weight for images')
    parser.add_argument('--out_dir', default='_out')
    parser.add_argument('-s',  '--size',    default='1280-720', help='Output resolution')
    parser.add_argument('-r',  '--resume',  default=None, help='Path to saved FFT snapshots, to resume from')
    parser.add_argument('-ops', '--opt_step', default=1, type=int, help='How many optimizing steps per save step')
    parser.add_argument('-tr', '--translate', action='store_true', help='Translate text with Google Translate')
    parser.add_argument('--save_pt', action='store_true', help='Save FFT snapshots for further use')
    parser.add_argument('-v',  '--verbose',    dest='verbose', action='store_true')
    parser.add_argument('-nv', '--no-verbose', dest='verbose', action='store_false')
    parser.set_defaults(verbose=True)
    # training
    parser.add_argument('-m',  '--model',   default='ViT-B/32', choices=CLIP_MODELS, help='Select CLIP model to use')
    parser.add_argument('--steps',   default=200, type=int, help='Total iterations')
    parser.add_argument('--samples', default=200, type=int, help='Samples to evaluate')
    parser.add_argument('-lr', '--lrate',   default=0.05, type=float, help='Learning rate')
    parser.add_argument('-p',  '--prog',    action='store_true', help='Enable progressive lrate growth (up to double a.lrate)')
    parser.add_argument('-dm', '--dualmod', default=None, type=int, help='Every this step use another CLIP ViT model')
    # wavelet
    parser.add_argument('--dwt',     action='store_true', help='Use DWT instead of FFT')
    parser.add_argument('-w',  '--wave',    default='coif2', help='wavelets: db[1..], coif[1..], haar, dmey')
    # tweaks
    parser.add_argument('-a',  '--align',   default='uniform', choices=['central', 'uniform', 'overscan', 'overmax'], help='Sampling distribution')
    parser.add_argument('-tf', '--transform', default='fast', choices=['none', 'fast', 'custom', 'elastic', 'lucent', 'openai'], help='augmenting transforms')
    parser.add_argument('-opt', '--optimizer', default='adam_custom', choices=['adam', 'adamw', 'adam_custom', 'adamw_custom'], help='Optimizer')
    parser.add_argument('--contrast', default=1.1, type=float)
    parser.add_argument('--colors',  default=1.8, type=float)
    parser.add_argument('--decay',   default=1.5, type=float)
    parser.add_argument('-sh', '--sharp',   default=0., type=float)
    parser.add_argument('-mm', '--macro',   default=0.4, type=float, help='Endorse macro forms 0..1 ')
    parser.add_argument('--aest',    default=0., type=float, help='Enhance aesthetics')
    parser.add_argument('-e',  '--enforce', default=0, type=float, help='Enforce details')
    parser.add_argument('-x',  '--expand',  default=0, type=float, help='Boosts diversity')
    parser.add_argument('-n',  '--noise',   default=0, type=float, help='Add noise to suppress accumulation')
    parser.add_argument('-c',  '--sync',    default=0, type=float, help='Sync output to input image')
    parser.add_argument('--invert',  action='store_true', help='Invert criteria')
    parser.add_argument('--sim',     default='mix', help='Similarity function (dot/angular/spherical/mixed; None = cossim)')
    # TPU-specific
    parser.add_argument('--clip_weights', default=None, help='Path to CLIP checkpoint (OpenAI .pt or HF); random init if absent')
    parser.add_argument('--aest_weights', default=None, help='Path to LAION aesthetic head checkpoint')
    parser.add_argument('--lpips_weights', default=None, help='Path to VGG16+lin LPIPS checkpoint (--sync)')
    parser.add_argument('--precision', default='auto', choices=['auto', 'bf16', 'fp32'])
    parser.add_argument('--seed', default=0, type=int)
    parser.add_argument('--spatial', default=0, type=int,
                        help='Shard the FFT canvas spatially over N devices '
                             '(4K+ canvases; FFT mode only)')
    add_parallel_flags(parser)
    a = parser.parse_args(argv)
    if a.dualmod is not None and a.dualmod < 1:
        parser.error('--dualmod must be a positive step interval')

    if a.size is not None:
        a.size = parse_size(a.size)
    if (a.in_img is not None and a.sync != 0) or a.resume is not None:
        a.align = 'overscan'
    if a.dualmod is not None:
        a.model = 'ViT-B/32'
        a.sim = 'cossim'
    return a


def main(argv=None):
    a = get_args(argv)
    run(a)


def run(a):
    apply_platform()
    apply_persp(a)
    from aphantasia_tpu.parallel.multihost import init_fleet
    init_fleet(getattr(a, 'fleet', None))  # starts the JAX
    # multi-process runtime on pods; this CLI runs its whole job per host
    key = jax.random.PRNGKey(a.seed)
    key, k_init, k_clip, k_img = jax.random.split(key, 4)
    dtype = resolve_dtype(a.precision)

    # ---- parameterizer ----------------------------------------------------
    shape = [1, 3, *a.size]
    if a.dwt:
        gen_params, sz = resume_dwt(a.resume, a.size, a.wave, a.colors, key=k_init)
        if sz is not None:
            a.size = list(sz)
        par = DWTParameterizer(tuple(a.size), a.wave, 0.3, a.colors)
    else:
        gen_params, sz = resume_fft(a.resume, shape, a.decay, sd=0.07, key=k_init)
        if sz is not None:
            a.size = list(sz)
        par = FFTParameterizer(tuple(a.size), a.decay, a.colors)
        gen_params = jnp.asarray(np.asarray(gen_params, np.float32))

    # ---- CLIP model(s) ----------------------------------------------------
    clip1 = ClipWrapper(a.model, a.clip_weights, key=k_clip)
    a.modsize = clip1.modsize
    if a.verbose:
        print(' using model', a.model)
    clip2 = None
    if a.dualmod is not None:
        clip2 = ClipWrapper('ViT-B/16', a.clip_weights, key=k_clip)
        print(' dual model every %d step' % a.dualmod)

    extra = (a.in_txt2 is not None) + (a.in_txt0 is not None)
    a.samples = apply_sample_budget(
        a.samples, a.model, a.dualmod, a.enforce, a.sync, a.transform, extra)

    # ---- aesthetic head ---------------------------------------------------
    aest = aest2 = None
    if a.aest != 0 and aesthetic_dims(a.model):
        aest = aesthetic_get(jax.random.PRNGKey(7), a.model, a.aest_weights)
        if a.dualmod is not None:
            aest2 = aesthetic_get(jax.random.PRNGKey(8), 'ViT-B/16',
                                  a.aest_weights)

    # ---- prompts ----------------------------------------------------------
    sign = 1.0 if a.invert else -1.0
    out_name = []

    def groups_for(clip):
        groups = []
        if a.in_txt is not None:
            txt = maybe_translate(a.in_txt, a.translate, a.verbose)
            embs, wts = clip.enc_text(txt)
            groups.append((embs, wts, sign))
        if a.in_txt2 is not None:
            txt = maybe_translate(a.in_txt2, a.translate, a.verbose)
            embs, wts = clip.enc_text(txt)
            groups.append((embs, wts, sign))
        if a.in_txt0 is not None:
            txt = maybe_translate(a.in_txt0, a.translate, a.verbose)
            embs, wts = clip.enc_text(txt)
            groups.append((embs, wts, -sign))
        return groups

    groups1 = groups_for(clip1)
    groups2 = groups_for(clip2) if clip2 else None
    if a.in_txt is not None:
        out_name.append(txt_clean(a.in_txt).lower()[:40])
        if a.verbose:
            print(' topic text:', a.in_txt)
    if a.in_txt2 is not None:
        out_name.append(txt_clean(a.in_txt2).lower()[:40])
    if a.in_txt0 is not None:
        out_name.append('off-' + txt_clean(a.in_txt0).lower()[:40])

    # ---- reference image / LPIPS sync ------------------------------------
    lpips_bundle = None
    if a.in_img is not None and os.path.isfile(a.in_img):
        img_np = img_read(a.in_img)
        emb, img_t = clip1.enc_image_sliced(img_np, a.samples, a.align, k_img)
        groups1.append((emb, jnp.ones((emb.shape[0],)) / emb.shape[0],
                        sign * a.weight_img))
        if clip2:
            emb2, _ = clip2.enc_image_sliced(img_np, a.samples, a.align, k_img)
            groups2.append((emb2, jnp.ones((emb2.shape[0],)) / emb2.shape[0],
                            sign * a.weight_img))
        if a.sync > 0:
            sim_size = [s // 2 for s in a.size]
            img_in = resize_bicubic(img_t, sim_size)
            lpips_params = lpips_get(jax.random.PRNGKey(9), a.lpips_weights)
            lpips_bundle = (lpips_params, img_in)
        out_name.append(os.path.splitext(os.path.basename(a.in_img))[0]
                        .replace(' ', '_'))

    assert groups1, ' Loss not defined, check the inputs'
    if a.verbose:
        print(' samples:', a.samples)

    prompts1 = build_prompt_groups(groups1)
    prompts2 = build_prompt_groups(groups2) if groups2 else None

    # ---- step functions ---------------------------------------------------
    sampler = CutoutSampler(tuple(a.size), a.samples, a.modsize, a.align,
                            a.macro, use_pallas=a.pallas)
    optimizer = build_optimizer(a.optimizer, a.lrate, a.steps, a.prog)
    settings = StepSettings(
        sim=a.sim or 'cossim', sharp=a.sharp if not a.dwt else 0.0,
        sharp_mode='naiv', aest=a.aest, enforce=a.enforce, expand=a.expand,
        noise=a.noise, noise_centered=False, sync=a.sync,
        total_steps=max(a.steps // a.opt_step, 1), transform=a.transform,
        clip_dtype=dtype)
    spar = None
    if a.spatial and a.spatial > 1:
        # spatially-sharded canvas (parallel/spatial.py): params + decode +
        # cutout contraction distributed.  Composes with --noise (the shift
        # is spectrum-shaped — the tensor already sharded), --dwt
        # (halo-exchange inverse DWT, parallel/spatial_dwt.py), --dualmod
        # (both towers in the scan body), --mesh (cutouts over 'data',
        # CLIP weights over 'model') and --sync (LPIPS on the sharded
        # full-frame decode, spar.image).
        from aphantasia_tpu.parallel.mesh import (make_mesh_spatial,
                                                  shard_clip_params)
        from aphantasia_tpu.parallel.spatial import (SpatialFFT,
                                                     build_spatial_train_step)
        smesh = make_mesh_spatial(a.spatial, a.mesh)
        # the custom-call attention kernel cannot be SPMD-partitioned over
        # any mesh (see cli/common.py:setup_mesh)
        import aphantasia_tpu.models.clip.model as clip_model
        clip_model.FUSED_ATTN = False
        if "model" in smesh.axis_names and smesh.shape["model"] > 1:
            for wdl in (clip1, clip2):
                if wdl is not None:
                    wdl.params = shard_clip_params(wdl.params, smesh)
        if "data" in smesh.axis_names and a.samples % smesh.shape["data"]:
            dp = smesh.shape["data"]
            a.samples += dp - a.samples % dp   # shard_map needs S % dp == 0
            if a.verbose:
                print(f' samples rounded up to {a.samples} (data mesh {dp})')
            sampler = CutoutSampler(tuple(a.size), a.samples, a.modsize,
                                    a.align, a.macro, use_pallas=a.pallas)
        if a.dwt:
            from aphantasia_tpu.parallel.spatial_dwt import SpatialDWT
            spar = SpatialDWT(tuple(a.size), a.wave, 0.3, a.colors, smesh)
        else:
            spar = SpatialFFT(tuple(a.size), a.decay, a.colors, smesh)
        gen_params = spar.shard(gen_params)
        step1 = build_spatial_train_step(spar, sampler, clip1.cfg, settings,
                                         optimizer)
        step2 = (build_spatial_train_step(spar, sampler, clip2.cfg, settings,
                                          optimizer) if clip2 else None)
        render = lambda p, contrast=1.0: (jnp.clip(  # noqa: E731
            spar.render(p, contrast)[0].transpose(1, 2, 0), 0.0, 1.0)
            * 255.0 + 0.5).astype(jnp.uint8)
        if a.verbose:
            print(f' spatial mesh: {dict(smesh.shape)}')
        mesh = None
    else:
        mesh = setup_mesh(a.mesh, (clip1, clip2), a.verbose)
        step1 = build_train_step(par, sampler, clip1.cfg, settings, optimizer,
                                 mesh=mesh)
        step2 = (build_train_step(par, sampler, clip2.cfg, settings,
                                  optimizer, mesh=mesh)
                 if clip2 else None)
        render = build_render(par)
    dm_nums = dualmod_steps(a.steps, a.dualmod) if a.dualmod else set()

    # ---- output dirs ------------------------------------------------------
    out_name = '-'.join(out_name) or 'out'
    out_name += ('-%s' % a.model.replace('/', '').replace('-', '')
                 if a.dualmod is None else '-dm%d' % a.dualmod)
    tempdir = os.path.join(a.out_dir, out_name)
    os.makedirs(tempdir, exist_ok=True)
    save_cfg(a, tempdir, 'config.txt')

    # ---- training loop ----------------------------------------------------
    from aphantasia_tpu.profiling import trace
    opt_state = optimizer.init(gen_params)
    prev_enc = jnp.zeros((a.samples, clip1.cfg.embed_dim))
    pbar = get_progress_bar()(a.steps // a.opt_step)
    prof = trace(a.profile)
    prof.__enter__()
    from aphantasia_tpu.io.media import AsyncFrameWriter
    # empirical tone mapping (clip_fft.py:300-304), applied in the writer
    tone = None
    if a.sync > 0 and a.in_img is not None:
        tone = lambda im: ((im / 255.0) ** 1.3 * 255).astype(np.uint8)
    elif a.sharp != 0:
        tone = (lambda im: ((im / 255.0) ** (1 + a.sharp / 2.0) * 255)
                .astype(np.uint8))
    writer = AsyncFrameWriter()
    # chunked fast path: F frame-groups (step -> render -> opt_step-1 steps)
    # per dispatch, amortizing the ~28ms tunneled per-program overhead.
    # dualmod compiles both towers into the scan body (lax.cond per step);
    # spatial (own step/render) keeps the per-step loop, as does a step
    # count opt_step doesn't divide.
    chunked = (a.opt_step > 0
               and a.steps % a.opt_step == 0 and a.steps >= a.opt_step)
    # one base key for the whole loop: per-step keys are
    # fold_in(k_loop, global_step) in every path (chunked loops fold the
    # scan's global step; the fallback folds i below), so the RNG stream is
    # identical whichever path runs and however frames chunk per dispatch
    key, k_loop = jax.random.split(key)
    if chunked and spar is not None:
        # sharded-canvas counterpart (parallel/spatial.py)
        from aphantasia_tpu.parallel.spatial import (
            build_spatial_train_loop_frames)
        n_frames_total = a.steps // a.opt_step
        nf = frames_per_dispatch(tuple(a.size), n_frames_total)
        dual = (clip2.cfg, a.dualmod) if clip2 is not None else None
        sloop = build_spatial_train_loop_frames(
            spar, sampler, clip1.cfg, settings, optimizer, a.opt_step, nf,
            contrast=a.contrast, dual=dual)
        for c in range(n_frames_total // nf):
            extra = ((clip2.params, aest2, prompts2) if clip2 is not None
                     else ())
            gen_params, opt_state, prev_enc, frames_u8, losses = sloop(
                gen_params, opt_state, prev_enc, clip1.params, aest,
                lpips_bundle, prompts1, *extra, k_loop, jnp.int32(c * nf))
            writer.save_batch(
                [os.path.join(tempdir, '%04d.jpg' % (c * nf + j))
                 for j in range(nf)], frames_u8, tone)
            for _ in range(nf):
                pbar.upd()
    elif chunked:
        n_frames_total = a.steps // a.opt_step
        nf = frames_per_dispatch(tuple(a.size), n_frames_total)
        dual = (clip2.cfg, a.dualmod) if clip2 is not None else None
        loop1 = build_train_loop_frames(par, sampler, clip1.cfg, settings,
                                        optimizer, a.opt_step, nf,
                                        contrast=a.contrast, mesh=mesh,
                                        dual=dual)
        for c in range(n_frames_total // nf):
            extra = ((clip2.params, aest2, prompts2) if clip2 is not None
                     else ())
            gen_params, opt_state, prev_enc, frames_u8, losses = loop1(
                gen_params, opt_state, prev_enc, clip1.params, aest,
                lpips_bundle, prompts1, *extra, k_loop, jnp.int32(c * nf))
            # one transfer for the whole chunk, pulled in the writer thread
            writer.save_batch(
                [os.path.join(tempdir, '%04d.jpg' % (c * nf + j))
                 for j in range(nf)], frames_u8, tone)
            for _ in range(nf):
                pbar.upd()
    else:
        for i in range(a.steps):
            k_step = jax.random.fold_in(k_loop, i)
            use2 = clip2 is not None and i in dm_nums
            step = step2 if use2 else step1
            clip_w = clip2.params if use2 else clip1.params
            aest_w = aest2 if use2 else aest
            prompts = prompts2 if use2 else prompts1
            gen_params, opt_state, prev_enc, loss = step(
                gen_params, opt_state, prev_enc, clip_w, aest_w,
                lpips_bundle, prompts, k_step, jnp.int32(i // a.opt_step))

            if i % a.opt_step == 0:
                # device array handed straight to the async writer — the
                # device->host pull and JPEG encode overlap the next step
                writer.save(os.path.join(tempdir,
                                         '%04d.jpg' % (i // a.opt_step)),
                            render(gen_params, contrast=a.contrast), tone)
                pbar.upd()

    writer.close()
    prof.__exit__(None, None, None)

    # ---- assembly ---------------------------------------------------------
    frames_to_video(tempdir, os.path.join(a.out_dir, f'{out_name}.mp4'))
    frames = img_list(tempdir)
    if frames:
        shutil.copy(frames[-1],
                    os.path.join(a.out_dir, '%s-%d.jpg' % (out_name, a.steps)))
    if a.save_pt:
        if spar is not None:   # drop the spatial pad -> canonical layout
            gen_params = spar.unpad(gen_params)
        # params LIST for byte-parity with the reference (clip_fft.py:315)
        obj = ([np.asarray(gen_params)] if not a.dwt
               else [np.asarray(p) for p in gen_params])
        save_pt('%s.pt' % os.path.join(a.out_dir, out_name), obj)
    return gen_params


if __name__ == '__main__':
    main()
