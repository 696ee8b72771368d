"""cppn — CPPN training + shader export.

Rebuild of reference cppn.py:33-319 with the same flags/defaults, .npy
snapshot format and 5-target shader export; fixes the reference's broken
`eps` import and `trfm_fast` typo (cppn.py:28-29,221 — SURVEY.md §7).
"""
from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import jax
import jax.numpy as jnp

from aphantasia_tpu.params.cppn import (
    CPPNParameterizer, export_npy, load_npy, to_shader_layers)
from aphantasia_tpu.params import siren as siren_mod
from aphantasia_tpu.params.siren import SIRENParameterizer
from aphantasia_tpu.ops.sampler import CutoutSampler
from aphantasia_tpu.ops.losses import aesthetic_get, aesthetic_dims
from aphantasia_tpu.parallel.step import StepSettings, build_train_step
from aphantasia_tpu.cli.common import (
    apply_persp,
    ClipWrapper, parse_size, build_prompt_groups, dualmod_steps,
    maybe_translate, resolve_dtype, add_parallel_flags, setup_mesh, apply_platform)
from aphantasia_tpu.models.clip.model import XMEM
from aphantasia_tpu.io.media import img_read, img_list, checkout, frames_to_video, basename
from aphantasia_tpu.shader_expo import export_all
from aphantasia_tpu.utils import txt_clean
from aphantasia_tpu.progress import get_progress_bar
import optax

CLIP_MODELS = ['ViT-B/16', 'ViT-B/32', 'ViT-L/14', 'RN50', 'RN50x4',
               'RN50x16', 'RN50x64', 'RN101']
# cppn.py:197 uses its own xmem table (adds ViT-L/14 x0.11, RN50x64 x0.04)
XMEM_CPPN = dict(XMEM, **{"ViT-L/14": 0.11, "RN50x64": 0.04})


def get_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('-i',  '--in_img',  default=None, help='input image')
    parser.add_argument('-t',  '--in_txt',  default=None, help='input text')
    parser.add_argument('-t0', '--in_txt0', default=None, help='input text to subtract')
    parser.add_argument('--out_dir', default='_out')
    parser.add_argument('-r',  '--resume',  default=None, help='Input CPPN model (NPY file)')
    parser.add_argument('-s',  '--size',    default='512-512')
    parser.add_argument('--fstep',   default=1, type=int, help='Saving step')
    parser.add_argument('-tr', '--translate', action='store_true')
    parser.add_argument('-v',  '--verbose', action='store_true')
    parser.add_argument('-ex', '--export',  action='store_true', help='Only export shaders from snapshot')
    # networks
    parser.add_argument('-gen', '--generator', default='cppn', choices=['cppn', 'siren'],
                        help='coordinate net: CPPN (atan MLP) or SIREN (sine MLP)')
    parser.add_argument('-l',  '--layers',  default=None, type=int)
    parser.add_argument('-nf', '--nf',      default=None, type=int)
    parser.add_argument('-act', '--actfn',  default='unbias', choices=['unbias', 'comp', 'relu'])
    parser.add_argument('--w0',       default=30., type=float, help='SIREN hidden frequency')
    parser.add_argument('--w0_first', default=30., type=float, help='SIREN first-layer frequency')
    parser.add_argument('-dec', '--decim',  default=3, type=int, help='Decimal precision for export')
    # training
    parser.add_argument('-m',  '--model',   default='ViT-B/32', choices=CLIP_MODELS)
    parser.add_argument('-dm', '--dualmod', default=None, type=int)
    parser.add_argument('--steps',   default=200, type=int)
    parser.add_argument('--samples', default=50, type=int)
    parser.add_argument('-lr', '--lrate',   default=None, type=float)
    parser.add_argument('-a',  '--align',   default='overscan', choices=['central', 'uniform', 'overscan'])
    parser.add_argument('-sh', '--sharp',   default=0, type=float)
    parser.add_argument('-tf', '--transform', action='store_true', help='use augmenting transforms?')
    parser.add_argument('-mc', '--macro',   default=0.4, type=float)
    parser.add_argument('--aest',    default=0., type=float)
    # TPU-specific
    parser.add_argument('--clip_weights', default=None)
    parser.add_argument('--aest_weights', default=None)
    parser.add_argument('--precision', default='auto', choices=['auto', 'bf16', 'fp32'])
    parser.add_argument('--seed', default=0, type=int)
    add_parallel_flags(parser)
    a = parser.parse_args(argv)
    if a.dualmod is not None and a.dualmod < 1:
        parser.error('--dualmod must be a positive step interval')
    a.size = parse_size(a.size)
    if a.dualmod is not None:
        a.model = 'ViT-B/32'
    # per-generator defaults (SIREN paper uses wide/shallow nets + small lr)
    siren = a.generator == 'siren'
    if a.nf is None:
        a.nf = 256 if siren else 24
    if a.layers is None:
        a.layers = 5 if siren else 10
    if a.lrate is None:
        a.lrate = 1e-4 if siren else 0.003
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
    key, k_clip, k_init = jax.random.split(key, 3)
    dtype = resolve_dtype(a.precision)

    # model (resume infers architecture, cppn.py:118-133)
    siren = a.generator == 'siren'
    if a.resume is not None and os.path.isfile(a.resume):
        if siren:
            gen_params, nf, num_layers = siren_mod.load_npy(a.resume)
            a.nf, a.layers = nf, num_layers
            par = SIRENParameterizer(tuple(a.size), nf, num_layers,
                                     a.w0, a.w0_first)
        else:
            gen_params, nf, num_layers, act_fn = load_npy(a.resume)
            a.nf, a.layers, a.actfn = nf, num_layers, act_fn
            par = CPPNParameterizer(tuple(a.size), nf, num_layers, act_fn)
        print(' loaded:', a.resume)
    elif siren:
        par = SIRENParameterizer(tuple(a.size), a.nf, a.layers,
                                 a.w0, a.w0_first)
        gen_params = par.init(k_init)
    else:
        par = CPPNParameterizer(tuple(a.size), a.nf, a.layers, a.actfn)
        gen_params = par.init(k_init)
    print(' .. %d vars, %d layers, %d nf, act %s'
          % (2 * len(gen_params), a.layers, a.nf,
             'sine w0=%g' % a.w0 if siren else a.actfn))

    def shader_layers(params):
        return (siren_mod.to_shader_layers(params, a.w0, a.w0_first)
                if siren else to_shader_layers(params, a.actfn))

    if a.export:
        print('exporting')
        base = a.resume.replace('.npy', '')
        export_all(shader_layers(gen_params), base, a.size, a.decim)
        img = np.asarray(par.image(gen_params))[0]
        checkout(img, a.resume.replace('.npy', '.jpg'), verbose=False)
        return

    clip1 = ClipWrapper(a.model, a.clip_weights, key=k_clip)
    a.modsize = clip1.modsize
    if a.model in XMEM_CPPN:
        a.samples = int(a.samples * XMEM_CPPN[a.model])
    clip2 = None
    if a.dualmod is not None:
        clip2 = ClipWrapper('ViT-B/16', a.clip_weights, key=k_clip)
        a.samples = int(a.samples * 0.69)
        print(' dual model every %d step' % a.dualmod)
    a.samples = max(a.samples, 1)

    aest = aest2 = None
    if a.aest != 0 and aesthetic_dims(a.model):
        aest = aesthetic_get(jax.random.PRNGKey(7), a.model, a.aest_weights)
        if a.dualmod is not None:
            aest2 = aesthetic_get(jax.random.PRNGKey(8), 'ViT-B/16',
                                  a.aest_weights)

    transform = 'fast' if a.transform else 'none'
    if a.transform:
        a.samples = int(a.samples * 0.95)

    def groups_for(clip):
        # cppn losses use plain cossim with fixed weights 1/0.5/1 (cppn.py:285-290)
        groups = []
        if a.in_txt is not None:
            txt = maybe_translate(a.in_txt, a.translate, a.verbose)
            embs, wts = clip.enc_text(txt)
            groups.append((embs, wts, -1.0))
        if a.in_txt0 is not None:
            txt = maybe_translate(a.in_txt0, a.translate, a.verbose)
            embs, wts = clip.enc_text(txt)
            groups.append((embs, wts, 0.5))
        if a.in_img is not None and os.path.isfile(a.in_img):
            k_img = jax.random.fold_in(key, 99)
            emb, _ = clip.enc_image_sliced(img_read(a.in_img), a.samples,
                                           a.align, k_img)
            groups.append((emb, jnp.ones((emb.shape[0],)) / emb.shape[0], -1.0))
        return build_prompt_groups(groups)

    prompts1 = groups_for(clip1)
    prompts2 = groups_for(clip2) if clip2 else None
    assert prompts1, ' Loss not defined, check the inputs'

    out_name = []
    if a.in_txt:
        out_name.append(txt_clean(a.in_txt))
    if a.in_img and os.path.isfile(a.in_img):
        out_name.append(basename(a.in_img).replace(' ', '_'))
    sfx = '-l%d-n%d' % (a.layers, a.nf)
    if siren:
        sfx += '-siren'
    if a.dualmod is not None:
        sfx += '-dm%d' % a.dualmod
    if a.aest != 0:
        sfx += '-ae%.2g' % a.aest
    workdir = os.path.join(a.out_dir, 'cppn')
    out_base = os.path.join(workdir, '-'.join(out_name) + sfx)
    tempdir = out_base
    os.makedirs(tempdir, exist_ok=True)

    sampler = CutoutSampler(tuple(a.size), a.samples, a.modsize, a.align,
                            a.macro, use_pallas=a.pallas)
    mesh = setup_mesh(a.mesh, (clip1, clip2), a.verbose)
    optimizer = optax.adam(a.lrate)
    settings = StepSettings(sim='cossim', sharp=a.sharp, sharp_mode='sobel',
                            aest=a.aest, total_steps=a.steps,
                            transform=transform, clip_dtype=dtype)
    step1 = build_train_step(par, sampler, clip1.cfg, settings, optimizer,
                             mesh=mesh)
    step2 = (build_train_step(par, sampler, clip2.cfg, settings, optimizer,
                              mesh=mesh)
             if clip2 else None)
    render = jax.jit(lambda p: (jnp.clip(
        par.image(p)[0].transpose(1, 2, 0), 0, 1) * 255.0 + 0.5
        ).astype(jnp.uint8))
    dm_nums = dualmod_steps(a.steps, a.dualmod) if a.dualmod else set()

    opt_state = optimizer.init(gen_params)
    prev_enc = jnp.zeros((a.samples, clip1.cfg.embed_dim))
    pbar = get_progress_bar()(a.steps)
    from aphantasia_tpu.profiling import trace
    from aphantasia_tpu.io.media import AsyncFrameWriter
    prof = trace(a.profile)
    prof.__enter__()
    writer = AsyncFrameWriter()
    # chunked fast path (see step.py:build_train_loop_frames): fstep-sized
    # step groups with the frame + snapshot params emitted in-graph;
    # dualmod rides it too (both towers in the scan body, cond-swapped)
    chunked = (a.fstep > 0 and a.steps % a.fstep == 0
               and a.steps >= a.fstep)
    # path-independent RNG: one base key; per-step keys fold the global
    # step index in both the chunked scan and the fallback loop
    key, k_loop = jax.random.split(key)
    if chunked:
        from aphantasia_tpu.parallel.step import (build_train_loop_frames,
                                                  frames_per_dispatch)
        n_frames_total = a.steps // a.fstep
        nf = frames_per_dispatch(tuple(a.size), n_frames_total)
        dual = (clip2.cfg, a.dualmod) if clip2 is not None else None
        loop1 = build_train_loop_frames(par, sampler, clip1.cfg, settings,
                                        optimizer, a.fstep, nf, mesh=mesh,
                                        step_index='step', with_params=True,
                                        dual=dual)
        for c in range(n_frames_total // nf):
            extra = ((clip2.params, aest2, prompts2)
                     if clip2 is not None else ())
            (gen_params, opt_state, prev_enc, frames_u8, bparams,
             loss) = loop1(gen_params, opt_state, prev_enc, clip1.params,
                           aest, None, prompts1, *extra, k_loop,
                           jnp.int32(c * nf))
            fnames = [os.path.join(tempdir, '%04d' % (c * nf + j))
                      for j in range(nf)]
            writer.save_batch([f + '.jpg' for f in fnames], frames_u8)
            bparams_np = jax.tree_util.tree_map(np.asarray, bparams)
            for j, fname in enumerate(fnames):
                export_npy(jax.tree_util.tree_map(lambda x: x[j], bparams_np),
                           fname)
            for _ in range(nf * a.fstep):
                pbar.upd()
    else:
        for i in range(a.steps):
            k_step = jax.random.fold_in(k_loop, i)
            use2 = clip2 is not None and i in dm_nums
            step = step2 if use2 else step1
            gen_params, opt_state, prev_enc, loss = step(
                gen_params, opt_state, prev_enc,
                clip2.params if use2 else clip1.params,
                aest2 if use2 else aest, None,
                prompts2 if use2 else prompts1, k_step, jnp.int32(i))
            if i % a.fstep == 0:
                fname = os.path.join(tempdir, '%04d' % (i // a.fstep))
                writer.save(fname + '.jpg', render(gen_params))
                export_npy(gen_params, fname)
            pbar.upd()

    writer.close()
    prof.__exit__(None, None, None)
    export_npy(gen_params, out_base)
    export_all(shader_layers(gen_params), out_base, a.size, a.decim)
    frames_to_video(tempdir, out_base + '.avi')
    frames = img_list(tempdir)
    if frames:
        shutil.copy(frames[-1], out_base + '-%d.jpg' % a.steps)


if __name__ == '__main__':
    main()
