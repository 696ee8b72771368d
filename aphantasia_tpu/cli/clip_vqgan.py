"""clip_vqgan — CLIP-guided VQGAN latent optimization.

CLI equivalent of the reference's notebook-only VQGAN mode
(CLIP_VQGAN.ipynb: trainable z latents decoded by a frozen taming
Decoder, optimized against CLIP similarity over augmented cutouts).
Checkpoints: --vqgan_weights (taming .ckpt) for real decodes; random
decoder otherwise (hermetic).
"""
from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import jax
import jax.numpy as jnp

from aphantasia_tpu.models.vqgan import (
    VQGAN_CONFIGS, vqgan_init, convert_taming, VQGANParameterizer)
from aphantasia_tpu.ops.sampler import CutoutSampler
from aphantasia_tpu.ops.optim import build_optimizer
from aphantasia_tpu.parallel.step import (StepSettings,
                                          build_train_loop_frames,
                                          frames_per_dispatch)
from aphantasia_tpu.cli.common import (
    apply_persp,
    ClipWrapper, parse_size, apply_sample_budget, build_prompt_groups,
    maybe_translate, resolve_dtype, add_parallel_flags, setup_mesh, apply_platform)
from aphantasia_tpu.io.media import img_read, img_list, img_save, frames_to_video
from aphantasia_tpu.io.checkpoint import save_pt, load_pt
from aphantasia_tpu.utils import txt_clean, save_cfg
from aphantasia_tpu.progress import get_progress_bar


def get_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('-t',  '--in_txt',  default=None, help='input text')
    parser.add_argument('-t2', '--in_txt2', default=None, help='style text')
    parser.add_argument('-t0', '--in_txt0', default=None, help='subtract text')
    parser.add_argument('-i',  '--in_img',  default=None, help='input image')
    parser.add_argument('-wi', '--weight_img', default=0.5, type=float)
    parser.add_argument('--out_dir', default='_out')
    parser.add_argument('-s',  '--size',    default='640-480', help='~800x600 is the practical VQGAN ceiling (README.md:129)')
    parser.add_argument('-r',  '--resume',  default=None, help='saved latents .pt')
    parser.add_argument('--vqgan', default='imagenet_f16_16384',
                        choices=list(VQGAN_CONFIGS.keys()))
    parser.add_argument('--vqgan_weights', default=None, help='taming checkpoint')
    parser.add_argument('-m',  '--model',   default='ViT-B/32')
    parser.add_argument('--steps',   default=200, type=int)
    parser.add_argument('--samples', default=200, type=int)
    parser.add_argument('-lr', '--lrate',   default=0.1, type=float)
    parser.add_argument('-a',  '--align',   default='uniform')
    parser.add_argument('-tf', '--transform', default='fast')
    parser.add_argument('-mm', '--macro',   default=0.4, type=float)
    parser.add_argument('--sim',     default='mix')
    parser.add_argument('--save_pt', action='store_true')
    parser.add_argument('-tr', '--translate', action='store_true')
    parser.add_argument('-v',  '--verbose',    dest='verbose', action='store_true')
    parser.add_argument('-nv', '--no-verbose', dest='verbose', action='store_false')
    parser.set_defaults(verbose=True)
    parser.add_argument('--clip_weights', default=None)
    parser.add_argument('--precision', default='auto', choices=['auto', 'bf16', 'fp32'])
    parser.add_argument('--seed', default=0, type=int)
    add_parallel_flags(parser)
    a = parser.parse_args(argv)
    a.size = parse_size(a.size)
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
    key, k_clip, k_init, k_dec = jax.random.split(key, 4)
    dtype = resolve_dtype(a.precision)
    cfg_v = VQGAN_CONFIGS[a.vqgan]
    # snap size to the decoder stride
    a.size = [s - s % cfg_v.f for s in a.size]

    from aphantasia_tpu.weights import env_weights, warn_random
    vq_path = env_weights('vqgan', a.vqgan_weights)
    if vq_path:
        dec_params = convert_taming(vq_path, cfg_v)
    else:
        warn_random('vqgan decoder')
        dec_params = vqgan_init(k_dec, cfg_v)
    par = VQGANParameterizer(tuple(a.size), cfg_v, dec_params)

    clip1 = ClipWrapper(a.model, a.clip_weights, key=k_clip)
    a.samples = apply_sample_budget(a.samples, a.model, None, 0, 0, a.transform,
                                    (a.in_txt2 is not None) + (a.in_txt0 is not None))

    groups = []
    out_name = []
    for txt, coeff, tag in ((a.in_txt, -1.0, ''), (a.in_txt2, -1.0, ''),
                            (a.in_txt0, 1.0, 'off-')):
        if txt is None:
            continue
        txt = maybe_translate(txt, a.translate, a.verbose)
        embs, wts = clip1.enc_text(txt)
        groups.append((embs, wts, coeff))
        out_name.append(tag + txt_clean(txt).lower()[:40])
    if a.in_img is not None and os.path.isfile(a.in_img):
        emb, _ = clip1.enc_image_sliced(img_read(a.in_img), a.samples, a.align,
                                        jax.random.fold_in(key, 5))
        groups.append((emb, jnp.ones((emb.shape[0],)) / emb.shape[0],
                       -a.weight_img))
        out_name.append(os.path.splitext(os.path.basename(a.in_img))[0])
    assert groups, ' Loss not defined, check the inputs'
    prompts = build_prompt_groups(groups)

    if a.resume is not None:
        z = load_pt(a.resume)
        if isinstance(z, list):
            z = z[0]
        gen_params = jnp.asarray(np.asarray(z, np.float32))
    else:
        gen_params = par.init(k_init)

    sampler = CutoutSampler(tuple(a.size), a.samples, clip1.modsize, a.align,
                            a.macro, use_pallas=a.pallas)
    mesh = setup_mesh(a.mesh, (clip1,), a.verbose)
    optimizer = build_optimizer('adam_custom', a.lrate)
    settings = StepSettings(sim=a.sim or 'cossim', total_steps=a.steps,
                            transform=a.transform, clip_dtype=dtype)
    out_name = '-'.join(out_name) or 'vqgan'
    out_name += '-vq'
    tempdir = os.path.join(a.out_dir, out_name)
    os.makedirs(tempdir, exist_ok=True)
    save_cfg(a, tempdir, 'config.txt')

    opt_state = optimizer.init(gen_params)
    prev_enc = jnp.zeros((a.samples, clip1.cfg.embed_dim))
    pbar = get_progress_bar()(a.steps)
    from aphantasia_tpu.profiling import trace
    from aphantasia_tpu.io.media import AsyncFrameWriter
    prof = trace(a.profile)
    prof.__enter__()
    writer = AsyncFrameWriter()
    # nf step+render groups per dispatch (step.py:build_train_loop_frames)
    # — amortizes the tunneled per-program overhead; a frame is saved every
    # step, so opt_step=1 groups
    nf = frames_per_dispatch(tuple(a.size), a.steps)
    loop = build_train_loop_frames(par, sampler, clip1.cfg, settings,
                                   optimizer, 1, nf, mesh=mesh)
    # one base key for every dispatch: per-step keys fold the global step,
    # so the stream is invariant to the chunk size nf
    key, k_loop = jax.random.split(key)
    for c in range(a.steps // nf):
        gen_params, opt_state, prev_enc, frames_u8, loss = loop(
            gen_params, opt_state, prev_enc, clip1.params, None, None,
            prompts, k_loop, jnp.int32(c * nf))
        writer.save_batch(
            [os.path.join(tempdir, '%04d.jpg' % (c * nf + j))
             for j in range(nf)], frames_u8)
        for _ in range(nf):
            pbar.upd()

    writer.close()
    prof.__exit__(None, None, None)
    frames_to_video(tempdir, os.path.join(a.out_dir, out_name + '.mp4'))
    frames = img_list(tempdir)
    if frames:
        shutil.copy(frames[-1],
                    os.path.join(a.out_dir, '%s-%d.jpg' % (out_name, a.steps)))
    if a.save_pt:
        save_pt('%s.pt' % os.path.join(a.out_dir, out_name),
                np.asarray(gen_params))


if __name__ == '__main__':
    main()
