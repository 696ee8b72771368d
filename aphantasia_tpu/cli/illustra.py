"""illustra — per-line images + FFT-space crossfade video.

Rebuild of reference illustra.py:29-342: one scene per text line, each scene
resuming from `keep * prev/(max-min)` of the previous scene's spectrum with
optimizer state carried over (illustra.py:271-286), per-scene jpg/mp4/.pt
outputs, and a final crossfade assembly between consecutive .pt snapshots
through the decode `shift` argument (illustra.py:313-338).
"""
from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import jax
import jax.numpy as jnp

from aphantasia_tpu.params.fft import FFTParameterizer, resume_fft
from aphantasia_tpu.ops.sampler import CutoutSampler
from aphantasia_tpu.ops.optim import build_optimizer
from aphantasia_tpu.ops.losses import aesthetic_get, aesthetic_dims
from aphantasia_tpu.parallel.step import StepSettings, build_train_step, build_render
from aphantasia_tpu.cli.common import (
    apply_persp,
    ClipWrapper, parse_size, apply_sample_budget, build_prompt_groups,
    dualmod_steps, maybe_translate, resolve_dtype, add_parallel_flags,
    setup_mesh, apply_platform)
from aphantasia_tpu.io.media import img_read, img_list, checkout, frames_to_video, file_list, basename
from aphantasia_tpu.io.checkpoint import save_pt, load_pt
from aphantasia_tpu.utils import txt_clean, save_cfg, read_text, pick_
from aphantasia_tpu.progress import get_progress_bar

CLIP_MODELS = ['ViT-B/16', 'ViT-B/32', 'ViT-L/14', 'ViT-L/14@336px',
               'RN50', 'RN50x4', 'RN50x16', 'RN50x64', 'RN101']


def get_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('-s',  '--size',    default='1280-720', help='Output resolution')
    parser.add_argument('-t',  '--in_txt',  default=None, help='input text or file - main topic')
    parser.add_argument('-t2', '--in_txt2', default=None, help='input text or file - style')
    parser.add_argument('-im', '--in_img',  default=None, help='input image or directory with images')
    parser.add_argument('-r',  '--resume',  default=None, help='Resume from saved params')
    parser.add_argument('--out_dir', default='_out/fft')
    parser.add_argument('--save_step', default=1, type=int, help='Save every this step')
    parser.add_argument('-tr', '--translate', action='store_true')
    parser.add_argument('-v',  '--verbose',    dest='verbose', action='store_true')
    parser.add_argument('-nv', '--no-verbose', dest='verbose', action='store_false')
    parser.set_defaults(verbose=True)
    # training
    parser.add_argument('-m',  '--model',   default='ViT-B/32', choices=CLIP_MODELS)
    parser.add_argument('--steps',   default=150, type=int, help='Iterations per input')
    parser.add_argument('--samples', default=200, type=int)
    parser.add_argument('-lr', '--lrate',   default=0.05, type=float)
    parser.add_argument('-dm', '--dualmod', default=None, type=int)
    # tweaks
    parser.add_argument('-opt', '--optimr', default='adam', choices=['adam', 'adamw'])
    parser.add_argument('-a',  '--align',   default='uniform', choices=['central', 'uniform', 'overscan', 'overmax'])
    parser.add_argument('-tf', '--transform', default='fast', choices=['none', 'custom', 'fast', 'elastic', 'lucent', 'openai'])
    parser.add_argument('--aest',    default=1., type=float)
    parser.add_argument('--contrast', default=1.1, type=float)
    parser.add_argument('--colors',  default=1.8, type=float)
    parser.add_argument('-d',  '--decay',   default=1.5, type=float)
    parser.add_argument('-sh', '--sharp',   default=0, type=float)
    parser.add_argument('-mc', '--macro',   default=0.4, type=float)
    parser.add_argument('-e',  '--enforce', default=0, type=float)
    parser.add_argument('-n',  '--noise',   default=0, type=float)
    parser.add_argument('--sim',     default='mix')
    parser.add_argument('--loop',    action='store_true', help='Loop inputs')
    parser.add_argument('--save_pt', action='store_true')
    # multi input
    parser.add_argument('-l',  '--length',  default=None, type=int, help='Override total length in sec')
    parser.add_argument('--lsteps',  default=25, type=int, help='Frames per step')
    parser.add_argument('--fps',     default=25, type=int)
    parser.add_argument('--keep',    default=1.5, type=float, help='Accumulate imagery: 0 random, 1+ ~prev')
    parser.add_argument('--separate', action='store_true', help='process inputs separately')
    # TPU-specific
    parser.add_argument('--clip_weights', default=None)
    parser.add_argument('--aest_weights', default=None)
    parser.add_argument('--precision', default='auto', choices=['auto', 'bf16', 'fp32'])
    parser.add_argument('--seed', default=0, type=int)
    parser.add_argument('--spatial', default=0, type=int,
                        help='Shard the FFT canvas spatially over N devices '
                             '(4K+ scenes; composes with --mesh)')
    add_parallel_flags(parser)
    a = parser.parse_args(argv)
    if a.dualmod is not None and a.dualmod < 1:
        parser.error('--dualmod must be a positive step interval')

    a.size = parse_size(a.size)
    if not a.separate:
        a.save_pt = True
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
    from aphantasia_tpu.parallel.multihost import init_fleet, shard_scenes
    rank, world = init_fleet(getattr(a, 'fleet', None))
    fleet = world > 1
    key = jax.random.PRNGKey(a.seed)
    key, k_clip, k_init = jax.random.split(key, 3)
    dtype = resolve_dtype(a.precision)

    clip1 = ClipWrapper(a.model, a.clip_weights, key=k_clip)
    a.modsize = clip1.modsize
    clip2 = None
    if a.dualmod is not None:
        clip2 = ClipWrapper('ViT-B/16', a.clip_weights, key=k_clip)
        print(' dual model every %d step' % a.dualmod)

    # budget cascade (illustra.py:96-124: bx accumulates, none-transform x1.05)
    bx = 1.0
    from aphantasia_tpu.models.clip.model import XMEM
    if a.model in XMEM:
        bx *= XMEM[a.model]
    if a.dualmod is not None:
        bx *= 0.23
    if a.transform == 'none':
        bx *= 1.05
    bx *= 0.95
    if a.enforce != 0:
        bx *= 0.5
    a.samples = max(int(bx * a.samples), 1)

    aest = aest2 = None
    if a.aest != 0 and aesthetic_dims(a.model):
        aest = aesthetic_get(jax.random.PRNGKey(7), a.model, a.aest_weights)
        if a.dualmod is not None:
            aest2 = aesthetic_get(jax.random.PRNGKey(8), 'ViT-B/16',
                                  a.aest_weights)

    # ---- inputs -----------------------------------------------------------
    texts, styles, img_paths = [], [], []
    if a.in_img is not None and os.path.exists(a.in_img):
        img_paths = img_list(a.in_img) if os.path.isdir(a.in_img) else [a.in_img]
    if a.in_txt is not None:
        texts = maybe_translate(read_text(a.in_txt), a.translate, a.verbose)
    if a.in_txt2 is not None:
        styles = maybe_translate(read_text(a.in_txt2), a.translate, a.verbose)

    def enc_all(clip):
        txt_encs = [clip.enc_text(t) for t in texts]
        styl_encs = [clip.enc_text(s) for s in styles]
        img_encs = []
        for i, p in enumerate(img_paths):
            k = jax.random.fold_in(key, 100 + i)
            emb, _ = clip.enc_image_sliced(img_read(p), a.samples, a.align, k)
            img_encs.append((emb, jnp.ones((emb.shape[0],)) / emb.shape[0]))
        return txt_encs, styl_encs, img_encs

    txt1, styl1, imge1 = enc_all(clip1)
    if clip2:
        txt2, styl2, imge2 = enc_all(clip2)
    count = max(len(txt1), len(styl1), len(imge1))
    assert count > 0, "No inputs found!"
    if a.verbose:
        print(' samples:', a.samples)

    sfx = '' if a.dualmod is not None else '-%s' % a.model.replace('/', '').replace('-', '')
    if a.enforce != 0:
        sfx += '-e%.2g' % a.enforce

    par = FFTParameterizer(tuple(a.size), a.decay, a.colors)
    sampler = CutoutSampler(tuple(a.size), a.samples, a.modsize, a.align,
                            a.macro, use_pallas=a.pallas)
    opt_name = ('adamw_custom' if a.optimr.lower() == 'adamw' else 'adam_custom')
    optimizer = build_optimizer(opt_name, a.lrate)
    settings = StepSettings(
        sim=a.sim or 'cossim', sharp=a.sharp, sharp_mode='naiv', aest=a.aest,
        enforce=a.enforce, expand=0.0, noise=a.noise, noise_centered=True,
        total_steps=max(a.steps // a.save_step, 1), transform=a.transform,
        clip_dtype=dtype)
    spar = None
    if a.spatial and a.spatial > 1:
        # spatially-sharded scenes (clip_fft --spatial semantics; scenes are
        # sequential, so each trains on the same sharded canvas)
        from aphantasia_tpu.parallel.mesh import (make_mesh_spatial,
                                                  shard_clip_params)
        from aphantasia_tpu.parallel.spatial import (
            SpatialFFT, build_spatial_train_step)
        smesh = make_mesh_spatial(a.spatial, a.mesh)
        import aphantasia_tpu.models.clip.model as clip_model
        clip_model.FUSED_ATTN = False
        if 'model' in smesh.axis_names and smesh.shape['model'] > 1:
            for wdl in (clip1, clip2):
                if wdl is not None:
                    wdl.params = shard_clip_params(wdl.params, smesh)
        if 'data' in smesh.axis_names and a.samples % smesh.shape['data']:
            dp = smesh.shape['data']
            a.samples += dp - a.samples % dp
            sampler = CutoutSampler(tuple(a.size), a.samples, a.modsize,
                                    a.align, a.macro, use_pallas=a.pallas)
        spar = SpatialFFT(tuple(a.size), a.decay, a.colors, smesh)
        step1 = build_spatial_train_step(spar, sampler, clip1.cfg, settings,
                                         optimizer)
        step2 = (build_spatial_train_step(spar, sampler, clip2.cfg,
                                          settings, optimizer)
                 if clip2 else None)
        render = lambda p, contrast=1.0: (jnp.clip(  # noqa: E731
            spar.render(p, contrast)[0].transpose(1, 2, 0), 0.0, 1.0)
            * 255.0 + 0.5).astype(jnp.uint8)
        if a.verbose:
            print(f' spatial mesh: {dict(smesh.shape)}')
        mesh = None
    else:
        mesh = setup_mesh(a.mesh, (clip1, clip2), a.verbose)
        step1 = build_train_step(par, sampler, clip1.cfg, settings,
                                 optimizer, mesh=mesh)
        step2 = (build_train_step(par, sampler, clip2.cfg, settings,
                                  optimizer, mesh=mesh)
                 if clip2 else None)
        render = build_render(par)
    dm_nums = dualmod_steps(a.steps, a.dualmod) if a.dualmod else set()

    # chunked fast path (step.py:build_train_loop_frames): save_step-sized
    # step groups + in-graph render, several per dispatch; dualmod rides it
    # too (both towers in the scan body, cond-swapped)
    chunk_loop = None
    if (a.save_step > 0 and a.steps % a.save_step == 0
            and a.steps >= a.save_step):
        from aphantasia_tpu.parallel.step import (build_train_loop_frames,
                                                  frames_per_dispatch)
        n_frames_total = a.steps // a.save_step
        nf = frames_per_dispatch(tuple(a.size), n_frames_total)
        dual = (clip2.cfg, a.dualmod) if clip2 is not None else None
        if spar is not None:
            from aphantasia_tpu.parallel.spatial import (
                build_spatial_train_loop_frames)
            chunk_loop = build_spatial_train_loop_frames(
                spar, sampler, clip1.cfg, settings, optimizer, a.save_step,
                nf, contrast=a.contrast, step_index='step', dual=dual)
        else:
            chunk_loop = build_train_loop_frames(
                par, sampler, clip1.cfg, settings, optimizer, a.save_step, nf,
                contrast=a.contrast, mesh=mesh, step_index='step', dual=dual)

    def groups_for(num, which):
        txts, styls, imgs = ((txt2, styl2, imge2) if which == 2
                             else (txt1, styl1, imge1))
        groups = []
        te = pick_(txts, num, a.loop)
        if te is not None:
            groups.append((te[0], te[1], -1.0))
        se = pick_(styls, num, a.loop)
        if se is not None:
            groups.append((se[0], se[1], -1.0))
        ie = pick_(imgs, num, a.loop)
        if ie is not None:
            groups.append((ie[0], ie[1], -1.0))
        return build_prompt_groups(groups)

    workdir = a.out_dir
    os.makedirs(workdir, exist_ok=True)
    gen_params = None
    opt_state = None

    # fleet fan-out: one independent scene per host over DCN (SURVEY §2.6);
    # keep-chaining is sequential, so fleet scenes always start fresh
    scene_ids = shard_scenes(count) if fleet else list(range(count))
    if fleet:
        print(' fleet %d/%d: scenes %s of %d' % (rank, world, scene_ids, count))

    from aphantasia_tpu.profiling import trace
    from aphantasia_tpu.io.media import AsyncFrameWriter
    prof = trace(a.profile)
    prof.__enter__()
    writer = AsyncFrameWriter()
    try:
        # KeyboardInterrupt salvages completed scenes (reference illustra.py:310)
        for num in scene_ids:
            if num == scene_ids[0] or a.separate or fleet:
                gen_params, sz = resume_fft(a.resume, [1, 3, *a.size], a.decay,
                                            sd=0.08, key=jax.random.fold_in(k_init, num))
                gen_params = jnp.asarray(np.asarray(gen_params, np.float32))
                if spar is not None:
                    gen_params = spar.shard(gen_params)
                opt_state = optimizer.init(gen_params)
            elif spar is not None:
                # keep-chaining on-device: the sharded 4K spectrum never
                # round-trips the host (same math as the dense branch)
                gen_params = (a.keep * gen_params
                              / (jnp.max(gen_params) - jnp.min(gen_params)))
            else:
                # keep-chaining (illustra.py:271-286): rescale prev params,
                # carry optimizer state
                p = np.asarray(gen_params)
                gen_params = jnp.asarray(a.keep * p / (p.max() - p.min()))

            prompts1 = groups_for(num, 1)
            prompts2 = groups_for(num, 2) if clip2 else None
            assert prompts1, ' Loss not defined, check inputs'

            out_names = []
            if a.resume is not None and num == 0:
                out_names += [basename(a.resume)[:12]]
            if texts:
                out_names += [txt_clean(pick_(texts, num, a.loop))[:32]]
            if styles:
                out_names += [txt_clean(pick_(styles, num, a.loop))[:32]]
            out_name = '-'.join(out_names) + sfx
            if count > 1:
                out_name = '%04d-' % (num + 1) + out_name
            if a.verbose:
                print(out_name)
            tempdir = os.path.join(workdir, out_name)
            os.makedirs(tempdir, exist_ok=True)
            if num == scene_ids[0] and rank == 0:
                save_cfg(a, workdir, out_name + '.txt')

            prev_enc = jnp.zeros((a.samples, clip1.cfg.embed_dim))
            pbar = get_progress_bar()(a.steps // a.save_step)
            # per-scene base key; per-step keys fold the global step in
            # both paths, so the stream is path- and chunk-size-invariant
            k_scene = jax.random.fold_in(key, num)
            if chunk_loop is not None:
                for c in range(n_frames_total // nf):
                    extra = ((clip2.params, aest2, prompts2)
                             if clip2 is not None else ())
                    (gen_params, opt_state, prev_enc, frames_u8,
                     loss) = chunk_loop(
                        gen_params, opt_state, prev_enc, clip1.params, aest,
                        None, prompts1, *extra, k_scene, jnp.int32(c * nf))
                    writer.save_batch(
                        [os.path.join(tempdir, '%04d.jpg' % (c * nf + j))
                         for j in range(nf)], frames_u8)
                    for _ in range(nf):
                        pbar.upd()
            else:
                for i in range(a.steps):
                    k_step = jax.random.fold_in(k_scene, i)
                    use2 = clip2 is not None and i in dm_nums
                    step = step2 if use2 else step1
                    clip_w = clip2.params if use2 else clip1.params
                    gen_params, opt_state, prev_enc, loss = step(
                        gen_params, opt_state, prev_enc, clip_w,
                        aest2 if use2 else aest, None,
                        prompts2 if use2 else prompts1, k_step,
                        jnp.int32(i))
                    if i % a.save_step == 0:
                        writer.save(os.path.join(
                            tempdir, '%04d.jpg' % (i // a.save_step)),
                            render(gen_params, contrast=a.contrast))
                        pbar.upd()

            frames = img_list(tempdir)
            if frames:
                shutil.copy(frames[-1], os.path.join(
                    workdir, '%s-%d.jpg' % (out_name, a.steps)))
            frames_to_video(tempdir, os.path.join(workdir, out_name + '.mp4'),
                            fps=a.fps)
            if a.save_pt:
                # bare tensor for byte-parity (illustra.py:308); sharded
                # canvases drop the spatial pad -> canonical Wf layout
                obj = (spar.unpad(gen_params) if spar is not None
                       else gen_params)
                save_pt('%s.pt' % os.path.join(workdir, out_name),
                        np.asarray(obj))

    except KeyboardInterrupt:
        print(' interrupted — assembling completed scenes')
    finally:
        writer.close()
        prof.__exit__(None, None, None)

    # ---- final crossfade assembly (illustra.py:313-338) -------------------
    if fleet and not a.separate:
        # only the primary assembles, once every host's snapshots are on the
        # shared out_dir (poll bounded by APHANTASIA_FLEET_WAIT seconds)
        if rank != 0:
            return
        import time
        deadline = time.monotonic() + float(
            os.environ.get('APHANTASIA_FLEET_WAIT', '0'))
        while len(file_list(workdir, 'pt')) < count:
            if time.monotonic() >= deadline:
                print(' fleet: %d/%d scene snapshots present — rerun on one '
                      'host (or run interpol on %s) to assemble the piece'
                      % (len(file_list(workdir, 'pt')), count, workdir))
                return
            time.sleep(2.0)
    if not a.separate:
        vsteps = a.lsteps if a.length is None else int(a.length * a.fps / count)
        tempdir = os.path.join(workdir, '_final')
        os.makedirs(tempdir, exist_ok=True)
        if a.verbose:
            print(' rendering complete piece')
        ptfiles = file_list(workdir, 'pt')
        from aphantasia_tpu.parallel.step import (build_shift_render_loop,
                                                  frames_per_dispatch)
        rloop = build_shift_render_loop(par, a.contrast)
        nf = frames_per_dispatch(tuple(a.size), vsteps)
        pbar = get_progress_bar()(vsteps * len(ptfiles))
        with AsyncFrameWriter() as fw:
            for px in range(len(ptfiles)):
                p1 = jnp.asarray(np.asarray(load_pt(ptfiles[px]), np.float32))
                p2 = jnp.asarray(np.asarray(
                    load_pt(ptfiles[(px + 1) % len(ptfiles)]), np.float32))
                diff = p2 - p1
                for c in range(0, vsteps, nf):
                    xs = jnp.arange(c, c + nf, dtype=jnp.float32) / vsteps
                    frames = rloop(p1, diff, xs)
                    fw.save_batch(
                        [os.path.join(tempdir,
                                      '%05d.jpg' % (px * vsteps + c + j))
                         for j in range(nf)], frames)
                    for _ in range(nf):
                        pbar.upd()
        name = basename(a.in_txt) if a.in_txt else 'final'
        frames_to_video(tempdir, os.path.join(a.out_dir, name + '.mp4'),
                        pattern='%05d.jpg', fps=a.fps)


if __name__ == '__main__':
    main()
