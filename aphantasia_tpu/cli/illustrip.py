"""illustrip — continuous text-to-video with pan/zoom/rotate/shear motion
and Depth-Anything-V2 3D warp.

Rebuild of reference illustrip.py:39-499: per-scene prompt crossfades
(get_encs, :316-339), the 4-track motion schedule with amplitude coupling
(:301-314), per-frame motion applied to the parameter state (RGB directly;
FFT through an irfft->warp->rfft round-trip, :386-409), fresh optimizer per
frame with optional carried state (--smooth), and depth-warped 3D motion
(depth_transform, :115-128).  Fixes the reference's undefined `pick_` /
`proc_image` bugs (illustrip.py:224,260 — SURVEY.md §7).
"""
from __future__ import annotations

import argparse
import os
import shutil
import time

import numpy as np
import jax
import jax.numpy as jnp

from aphantasia_tpu.params.fft import FFTParameterizer, resume_fft
from aphantasia_tpu.params.pixel import PixelParameterizer, resume_pixel
from aphantasia_tpu.ops.sampler import CutoutSampler
from aphantasia_tpu.ops.optim import build_optimizer
from aphantasia_tpu.ops.losses import aesthetic_get, aesthetic_dims
from aphantasia_tpu.parallel.step import (
    StepSettings, build_frame_step, build_depth_helpers)
from aphantasia_tpu.cli.common import (
    apply_persp,
    ClipWrapper, parse_size, build_prompt_groups, dualmod_steps,
    maybe_translate, resolve_dtype, add_parallel_flags, setup_mesh,
    apply_platform, program_cache)
from aphantasia_tpu.models.clip.model import XMEM
from aphantasia_tpu.io.media import img_read, img_list, frames_to_video, basename
from aphantasia_tpu.utils import txt_clean, save_cfg, read_text, pick_, intrl
from aphantasia_tpu.motion.anima import motion_schedule
from aphantasia_tpu.progress import get_progress_bar

CLIP_MODELS = ['ViT-B/16', 'ViT-B/32', 'RN50', 'RN50x4', 'RN50x16', 'RN101']


def _save_depth_map(writer, dmap, depth_dir, num, size):
    """Depth-map JPEG dump (reference depth/depth.py:78-80): the fused
    product is at DA-V2 inference dims; the device->host pull AND the
    resize-to-frame run in the writer thread (a main-thread pull would
    stall every frame dispatch on the tunneled runtime)."""
    def tone(arr):
        arr8 = (np.clip(np.asarray(arr, np.float32), 0, 1)
                * 255).astype(np.uint8)
        try:
            from PIL import Image
            arr8 = np.asarray(Image.fromarray(arr8).resize(
                (size[1], size[0]), Image.BICUBIC))
        except ImportError:
            pass            # inference-sized dump is still useful
        return np.stack([arr8] * 3, -1)
    writer.save(os.path.join(depth_dir, '%05d.jpg' % num), dmap[0, 0], tone)


def get_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('-s',  '--size',    default='1280-720')
    parser.add_argument('-t',  '--in_txt',  default=None, help='Text string or file (main topic)')
    parser.add_argument('-pre', '--in_txt_pre', default=None)
    parser.add_argument('-post', '--in_txt_post', default=None)
    parser.add_argument('-t2', '--in_txt2', default=None, help='Text string or file (style)')
    parser.add_argument('-t0', '--in_txt0', default=None, help='input text to subtract')
    parser.add_argument('-im', '--in_img',  default=None, help='input image or directory')
    parser.add_argument('-wi', '--weight_img', default=0.5, type=float)
    parser.add_argument('-r',  '--resume',  default=None)
    parser.add_argument('--out_dir', default='_out')
    parser.add_argument('-tr', '--translate', action='store_true')
    parser.add_argument('--invert',  action='store_true')
    parser.add_argument('-v',  '--verbose',    dest='verbose', action='store_true')
    parser.add_argument('-nv', '--no-verbose', dest='verbose', action='store_false')
    parser.set_defaults(verbose=True)
    # training
    parser.add_argument('--gen',     default='RGB', help='Generation method: FFT or RGB')
    parser.add_argument('-m',  '--model',   default='ViT-B/32', choices=CLIP_MODELS)
    parser.add_argument('--steps',   default=300, type=int, help='Iterations (frames) per scene')
    parser.add_argument('--samples', default=100, type=int)
    parser.add_argument('-lr', '--lrate',   default=0.1, type=float)
    parser.add_argument('-dm', '--dualmod', default=None, type=int)
    # motion
    parser.add_argument('-ops', '--opt_step', default=1, type=int, help='Optimizing steps per save/transform step')
    parser.add_argument('-sm', '--smooth',  action='store_true', help='Smoothen interframe jittering for FFT method')
    parser.add_argument('-it', '--interpol', default=True, help='Interpolate topics?')
    parser.add_argument('--fstep',   default=100, type=int, help='Frames before changing motion')
    parser.add_argument('--scale',   default=0.012, type=float)
    parser.add_argument('--shift',   default=10., type=float)
    parser.add_argument('--angle',   default=0.8, type=float)
    parser.add_argument('--shear',   default=0.4, type=float)
    parser.add_argument('--anima',   default=True)
    # depth
    parser.add_argument('-d',  '--depth',   default=0, type=float)
    parser.add_argument('--depth_model', default='b', help='large, base or small')
    parser.add_argument('--depth_dir',   default=None)
    # tweaks
    parser.add_argument('-a',  '--align',   default='overscan', choices=['central', 'uniform', 'overscan', 'overmax'])
    parser.add_argument('-tf', '--transform', default='fast', choices=['none', 'fast', 'custom', 'elastic', 'lucent', 'openai'])
    parser.add_argument('-opt', '--optimizer', default='adam_custom', choices=['adam', 'adam_custom', 'adamw', 'adamw_custom'])
    parser.add_argument('--fixcontrast', action='store_true')
    parser.add_argument('--contrast', default=1.2, type=float)
    parser.add_argument('--colors',  default=2.3, type=float)
    parser.add_argument('-sh', '--sharp',   default=0, type=float)
    parser.add_argument('-mc', '--macro',   default=0.3, type=float)
    parser.add_argument('--aest',    default=0., type=float)
    parser.add_argument('-e',  '--enforce', default=0, type=float)
    parser.add_argument('-x',  '--expand',  default=0, type=float)
    parser.add_argument('-n',  '--noise',   default=2., type=float, help='FFT only')
    parser.add_argument('--sim',     default='mix')
    parser.add_argument('--rem',     default=None, help='Dummy text to add to project name')
    # TPU-specific
    parser.add_argument('--clip_weights', default=None)
    parser.add_argument('--aest_weights', default=None)
    parser.add_argument('--depth_weights', default=None)
    parser.add_argument('--precision', default='auto', choices=['auto', 'bf16', 'fp32'])
    parser.add_argument('--seed', default=0, type=int)
    parser.add_argument('--spatial', default=0, type=int,
                        help='Shard the canvas/spectrum over N devices '
                             '(FFT mode; 4K+ video — reference README.md:17)')
    add_parallel_flags(parser)
    a = parser.parse_args(argv)
    if a.dualmod is not None and a.dualmod < 1:
        parser.error('--dualmod must be a positive step interval')

    a.size = parse_size(a.size)
    a.gen = a.gen.upper()
    a.invert = -1.0 if a.invert is True else 1.0
    if a.gen == 'RGB':
        a.smooth = False
        a.align = 'overscan'
        if a.resume is not None:
            a.fixcontrast = True
    if a.model == 'ViT-B/16':
        a.sim = 'cossim'
    if a.dualmod is not None:
        a.model = 'ViT-B/32'
        a.sim = 'cossim'
    return a


def get_encs(encs, num, steps, interpol=True):
    """Per-scene embedding crossfade schedules (illustrip.py:316-339).
    encs: list of (embs [K,D], wts [K]) or None per scene.
    Returns a list of `steps` entries, each a list of (embs, wts)."""
    cnt = len(encs)
    if cnt == 0:
        return []
    enc_1 = encs[min(num, cnt - 1)]
    enc_2 = encs[min(num + 1, cnt - 1)]
    if interpol is not True:
        return [[enc_1]] * steps
    out = []
    for i in range(steps):
        step_encs = []
        if enc_1 is not None:
            step_encs.append((enc_1[0], enc_1[1] * (steps - i) / steps))
        if enc_2 is not None:
            step_encs.append((enc_2[0], enc_2[1] * i / steps))
        out.append(step_encs)
    return out


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
    key, k_clip, k_init = jax.random.split(key, 3)
    dtype = resolve_dtype(a.precision)

    clip1 = ClipWrapper(a.model, a.clip_weights, key=k_clip)
    a.modsize = clip1.modsize
    if a.verbose:
        print(' using model', a.model)
    if a.model in XMEM:
        a.samples = int(a.samples * XMEM[a.model])
    clip2 = None
    if a.dualmod is not None:
        clip2 = ClipWrapper('ViT-B/16', a.clip_weights, key=k_clip)
        a.samples = int(a.samples * 0.23)
        print(' dual model every %d step' % a.dualmod)

    aest = aest2 = None
    if a.aest != 0 and aesthetic_dims(a.model):
        aest = aesthetic_get(jax.random.PRNGKey(7), a.model, a.aest_weights)
        if a.dualmod is not None:
            aest2 = aesthetic_get(jax.random.PRNGKey(8), 'ViT-B/16',
                                  a.aest_weights)

    if a.enforce != 0:
        a.samples = int(a.samples * 0.5)
    if a.transform in ('elastic', 'custom', 'fast'):
        a.samples = int(a.samples * 0.95)
    a.samples = max(a.samples, 1)

    # ---- inputs (lists per scene) -----------------------------------------
    texts, styles, notexts, images = [], [], [], []
    if a.in_txt is not None:
        texts = read_text(a.in_txt)
    if a.in_txt_pre is not None:
        pre = read_text(a.in_txt_pre)
        texts = [' | '.join([pick_(pre, n), texts[n]]).strip()
                 for n in range(len(texts))]
    if a.in_txt_post is not None:
        post = read_text(a.in_txt_post)
        texts = [' | '.join([texts[n], pick_(post, n)]).strip()
                 for n in range(len(texts))]
    texts = maybe_translate(texts, a.translate, a.verbose)
    if a.in_txt2 is not None:
        styles = maybe_translate(read_text(a.in_txt2), a.translate, a.verbose)
    if a.in_txt0 is not None:
        notexts = maybe_translate(read_text(a.in_txt0), a.translate, a.verbose)
    if a.in_img is not None and os.path.exists(a.in_img):
        from aphantasia_tpu.io.media import file_list
        images = (file_list(a.in_img) if os.path.isdir(a.in_img)
                  else [a.in_img])

    def enc_all(clip):
        txt_encs = [clip.enc_text(t) for t in texts]
        styl_encs = [clip.enc_text(s) for s in styles]
        not_encs = [clip.enc_text(s) for s in notexts]
        img_encs = []
        for i, p in enumerate(images):
            k = jax.random.fold_in(key, 200 + i)
            emb, _ = clip.enc_image_sliced(img_read(p), a.samples, a.align, k)
            img_encs.append((emb, jnp.ones((emb.shape[0],)) / emb.shape[0]))
        return txt_encs, styl_encs, not_encs, img_encs

    enc1 = enc_all(clip1)
    enc2 = enc_all(clip2) if clip2 else None
    count = max(len(enc1[0]), len(enc1[1]), len(enc1[2]), len(enc1[3]))
    assert count > 0, "No inputs found!"
    if a.verbose:
        print(' samples:', a.samples)

    # ---- parameter state --------------------------------------------------
    shape = [1, 3, *a.size]
    if a.gen == 'RGB':
        params_tmp, sz = resume_pixel(a.resume, shape, key=k_init)
        if isinstance(params_tmp, list):
            params_tmp = params_tmp[0]
    else:
        params_tmp, sz = resume_fft(a.resume, shape, decay=1.5, sd=1,
                                    key=k_init)
    if sz is not None:
        a.size = list(sz)
    params_tmp = jnp.asarray(np.asarray(params_tmp, np.float32))

    from aphantasia_tpu.weights import env_weights
    depth_w = env_weights('dav2', a.depth_weights) if a.depth != 0 else None

    def build_deptha():
        if a.depth == 0:
            return None
        from aphantasia_tpu.models.depth_anything import InferDepthAny
        params_d = None
        if depth_w:
            from aphantasia_tpu.models.depth_anything.convert import convert_hf_dav2
            params_d = convert_hf_dav2(depth_w)
        return InferDepthAny(a.depth_model, params=params_d, dtype=dtype)

    if a.depth != 0 and a.depth_dir is not None:
        os.makedirs(a.depth_dir, exist_ok=True)
        print(' depth dir:', a.depth_dir)

    steps = a.steps
    glob_steps = count * steps
    if glob_steps == a.fstep:
        a.fstep = glob_steps // 2  # otherwise no motion (illustrip.py:285)

    workname = basename(a.in_txt) if a.in_txt is not None else basename(a.in_img)
    workname = txt_clean(workname)
    workdir = os.path.join(a.out_dir, workname + '-%s' % a.gen.lower())
    if a.rem is not None:
        workdir += '-%s' % a.rem
    if a.dualmod is not None:
        workdir += '-dm%d' % a.dualmod
    if 'RN' in a.model.upper():
        workdir += '-%s' % a.model
    tempdir = os.path.join(workdir, 'ttt')
    os.makedirs(tempdir, exist_ok=True)
    save_cfg(a, workdir)
    if a.in_txt is not None and os.path.isfile(a.in_txt):
        shutil.copy(a.in_txt, os.path.join(workdir, os.path.basename(a.in_txt)))

    if a.anima:
        m_scale, m_shift, m_angle, m_shear = motion_schedule(
            glob_steps, a.fstep, a.gen, a.scale, a.shift, a.angle, a.shear,
            seed=a.seed)

    # ---- parameterizers / steps -------------------------------------------
    # with --spatial the mesh is built below (make_mesh_spatial composes
    # the data/model axes into the spatial mesh instead)
    spatial = bool(a.spatial and a.spatial > 1)
    mesh = None if spatial else setup_mesh(a.mesh, (clip1, clip2), a.verbose)

    def make_settings():
        return StepSettings(
            sim=a.sim or 'cossim', sharp=a.sharp, sharp_mode='naiv',
            aest=a.aest, enforce=a.enforce, expand=a.expand,
            noise=a.noise if a.gen == 'FFT' else 0.0, noise_centered=True,
            total_steps=steps, rgb_anchors=(a.gen == 'RGB'),
            transform=a.transform, clip_dtype=dtype)

    def make_sampler():
        return CutoutSampler(tuple(a.size), a.samples, a.modsize, a.align,
                             a.macro, use_pallas=a.pallas)

    def build_programs():
        """Everything that shapes the fused frame programs, bundled so
        repeated same-config runs in one process (notebook cell re-runs,
        bench warm passes, fleet fan-out) reuse the jitted wrappers and
        skip the ~7s Python retrace (cli/common.py:program_cache)."""
        par = (PixelParameterizer(tuple(a.size), a.colors, a.fixcontrast)
               if a.gen == 'RGB'
               else FFTParameterizer(tuple(a.size), 1.0, a.colors))  # sd=1 resume decode
        sampler = make_sampler()
        optimizer = build_optimizer(a.optimizer, a.lrate)
        settings = make_settings()
        deptha = build_deptha()
        # the whole frame advance (motion warp -> N opt steps -> render)
        # is ONE jitted program (step.py:build_frame_step); with depth the
        # DA-V2 tower is its own compiled program, one dispatch per frame
        fs1 = build_frame_step(
            par, sampler, clip1.cfg, settings, optimizer, a.gen,
            tuple(a.size), a.opt_step, a.smooth, a.contrast, deptha=deptha,
            depth=a.depth, colors=a.colors, mesh=mesh)
        fs2 = (build_frame_step(
            par, sampler, clip2.cfg, settings, optimizer, a.gen,
            tuple(a.size), a.opt_step, a.smooth, a.contrast, deptha=deptha,
            depth=a.depth, colors=a.colors, mesh=mesh) if clip2 else None)
        helpers = (build_depth_helpers(a.gen, tuple(a.size), deptha,
                                       a.colors)
                   if deptha is not None and a.depth > 0 else None)
        return dict(optimizer=optimizer, deptha=deptha, fs1=fs1, fs2=fs2,
                    helpers=helpers)

    if spatial:
        # sharded 4K+ video (parallel/spatial.py:build_spatial_frame_step):
        # spectrum + irfft2 + cutout contraction distributed; the per-frame
        # motion warp gathers rows once, warps with the dense math, and
        # re-shards (reference scale claim README.md:17)
        from aphantasia_tpu.parallel.mesh import (make_mesh_spatial,
                                                  shard_clip_params)
        from aphantasia_tpu.parallel.spatial import (
            SpatialFFT, SpatialRGB, build_spatial_frame_step,
            build_spatial_depth_helpers)
        import aphantasia_tpu.models.clip.model as clip_model
        clip_model.FUSED_ATTN = False
        smesh = make_mesh_spatial(a.spatial, a.mesh)
        if "model" in smesh.axis_names and smesh.shape["model"] > 1:
            for wdl in (clip1, clip2):
                if wdl is not None:
                    wdl.params = shard_clip_params(wdl.params, smesh)
        if "data" in smesh.axis_names and a.samples % smesh.shape["data"]:
            dp = smesh.shape["data"]
            a.samples += dp - a.samples % dp
        sampler = make_sampler()
        settings = make_settings()
        optimizer = build_optimizer(a.optimizer, a.lrate)
        spar = (SpatialRGB(tuple(a.size), a.colors, smesh, a.fixcontrast)
                if a.gen == 'RGB'
                else SpatialFFT(tuple(a.size), 1.0, a.colors, smesh))
        params_tmp = spar.shard(params_tmp)
        deptha = build_deptha()
        frame_step1 = build_spatial_frame_step(
            spar, sampler, clip1.cfg, settings, optimizer, a.opt_step,
            a.smooth, a.contrast, deptha=deptha, depth=a.depth)
        frame_step2 = (build_spatial_frame_step(
            spar, sampler, clip2.cfg, settings, optimizer, a.opt_step,
            a.smooth, a.contrast, deptha=deptha, depth=a.depth)
            if clip2 else None)
        fused_depth = deptha is not None and a.depth > 0
        if fused_depth:
            # sharded preview decode + the same one-dispatch DA-V2 forward
            # as the dense path (spatial.py:build_spatial_depth_helpers)
            preview_fn, depth_infer = build_spatial_depth_helpers(spar,
                                                                  deptha)
        if a.verbose:
            print(f' spatial mesh: {dict(smesh.shape)}')
    else:
        progs = program_cache(
            ('illustrip', a.gen, tuple(a.size), a.colors, a.fixcontrast,
             a.samples, a.modsize, a.align, a.macro, a.pallas, a.optimizer,
             a.lrate, a.sim, a.sharp, a.aest, a.enforce, a.expand, a.noise,
             steps, a.transform, str(dtype), a.opt_step, a.smooth,
             a.contrast, a.depth, a.depth_model, str(depth_w), a.model,
             clip2 is not None, a.mesh),
            build_programs)
        optimizer = progs['optimizer']
        deptha = progs['deptha']
        frame_step1, frame_step2 = progs['fs1'], progs['fs2']
        fused_depth = deptha is not None and a.depth > 0
        if fused_depth:
            preview_fn, depth_infer = progs['helpers']
    dm_nums = dualmod_steps(steps, a.dualmod) if a.dualmod else set()

    h, w = a.size
    opt_state_carry = {}
    # double-buffered depth product: the DA-V2 dispatch for frame n+1 is
    # issued the moment frame n's program emits its preview, so the depth
    # tower computes while the host admits the frame and preps the next
    # schedule step (VERDICT r1 weak-5: the dispatch was serialized into
    # frame n+1's critical path)
    dmap_pending = None
    # seed state for the fused program's carry (re-initialized in-graph
    # every frame unless --smooth)
    opt_state_carry['s'] = optimizer.init(params_tmp)
    prev_enc = jnp.zeros((a.samples, clip1.cfg.embed_dim))
    glob_start = time.time()
    key_run = key

    def process(num):
        nonlocal params_tmp, prev_enc, key_run, dmap_pending
        txt_encs = get_encs(enc1[0], num, steps, a.interpol)
        styl_encs = get_encs(enc1[1], num, steps, a.interpol)
        not_encs = get_encs(enc1[2], num, steps, a.interpol)
        img_encs = get_encs(enc1[3], num, steps, a.interpol)
        if clip2:
            txt2 = get_encs(enc2[0], num, steps, a.interpol)
            styl2 = get_encs(enc2[1], num, steps, a.interpol)
            not2 = get_encs(enc2[2], num, steps, a.interpol)
            img2 = get_encs(enc2[3], num, steps, a.interpol)
            if txt_encs:
                txt_encs = intrl(txt_encs, txt2, a.dualmod)
            if styl_encs:
                styl_encs = intrl(styl_encs, styl2, a.dualmod)
            if not_encs:
                not_encs = intrl(not_encs, not2, a.dualmod)
            if img_encs:
                img_encs = intrl(img_encs, img2, a.dualmod)

        if a.verbose:
            if texts:
                print(' ref text: ', texts[min(num, len(texts) - 1)][:80])
            if styles:
                print(' ref style: ', styles[min(num, len(styles) - 1)][:80])

        pbar = get_progress_bar()(steps)
        timing = os.environ.get('APHANTASIA_FRAME_TIMING')
        for ii in range(steps):
            t_frame0 = time.time()
            glob_step = num * steps + ii

            scale = float(m_scale[glob_step, 0]) if a.anima else 1 + a.scale
            shift = (m_shift[glob_step] if a.anima else [0, a.shift])
            angle = float(m_angle[glob_step][0]) if a.anima else a.angle
            shear = float(m_shear[glob_step][0]) if a.anima else a.shear

            use2 = clip2 is not None and ii in dm_nums
            clip_w = clip2.params if use2 else clip1.params
            aest_w = aest2 if use2 else aest

            groups = []
            for encs in (txt_encs, styl_encs, not_encs, img_encs):
                if not encs:
                    continue
                coeff = (-a.invert if encs is txt_encs
                         else 1.0 if encs is not_encs
                         else -a.weight_img if encs is img_encs else -1.0)
                for embs, wts in encs[ii % len(encs)]:
                    groups.append((embs, wts, coeff))
            prompts = build_prompt_groups(groups)

            # motion + opt steps + render as one program (step.py:
            # build_frame_step) — the motion scalars are traced, so the
            # schedule never recompiles
            motion = (jnp.float32(angle), jnp.float32(float(shift[0])),
                      jnp.float32(float(shift[1])), jnp.float32(scale),
                      jnp.float32(shear))
            fs = frame_step2 if use2 else frame_step1
            key_run, k_step = jax.random.split(key_run)
            if fused_depth:
                if dmap_pending is None:  # frame-0 bootstrap
                    dmap_pending = depth_infer(preview_fn(params_tmp))
                dmap = dmap_pending
                if a.depth_dir is not None:
                    # depth-map dump (depth/depth.py:78-80), resized to the
                    # frame like the reference's; pulled via the writer
                    _save_depth_map(writer, dmap, a.depth_dir, glob_step,
                                    (h, w))
                (params_tmp, opt_state_carry['s'], prev_enc, frame, _,
                 preview) = fs(params_tmp, opt_state_carry['s'],
                               prev_enc, clip_w, aest_w, prompts,
                               k_step, jnp.int32(ii), motion, dmap)
                # dispatch the NEXT frame's DA-V2 forward immediately: fs
                # emitted its preview asynchronously, so the depth tower
                # queues behind it on-device while the host does the writer
                # admit and schedule prep below (one extra never-consumed
                # forward after the final frame — negligible)
                dmap_pending = depth_infer(preview)
            else:
                params_tmp, opt_state_carry['s'], prev_enc, frame, _ = fs(
                    params_tmp, opt_state_carry['s'], prev_enc, clip_w,
                    aest_w, prompts, k_step, jnp.int32(ii), motion)
            t_disp = time.time()
            writer.save(os.path.join(tempdir, '%06d.jpg' % glob_step), frame)
            if timing:
                # host-side phase split: dispatch (incl. any back-pressure
                # stall inside fs args prep) vs writer admit
                print(f' frame {glob_step}: dispatch {t_disp - t_frame0:.3f}s'
                      f' save-admit {time.time() - t_disp:.3f}s', flush=True)
            if a.verbose and os.environ.get('DISPLAY'):
                from aphantasia_tpu.io.media import cvshow
                cvshow(np.asarray(frame))
            pbar.upd()

    from aphantasia_tpu.profiling import trace
    from aphantasia_tpu.io.media import AsyncFrameWriter
    prof = trace(a.profile)
    prof.__enter__()
    writer = AsyncFrameWriter()
    try:
        for i in range(count):
            process(i)
    except KeyboardInterrupt:
        pass
    finally:
        writer.close()
        prof.__exit__(None, None, None)

    frames_to_video(tempdir, os.path.join(workdir, workname + '.mp4'),
                    pattern='%06d.jpg')


if __name__ == '__main__':
    main()
