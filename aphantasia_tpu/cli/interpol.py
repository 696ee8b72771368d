"""interpol — offline FFT-snapshot interpolation to video.

Rebuild of reference aphantasia/interpol.py:18-66: reads a directory of .pt
FFT snapshots, renders a crossfade between consecutive snapshots through the
decode path's spectrum `shift` argument, assembles a video.  Fixes the
reference's undefined `a.lsteps`/`count` bugs (interpol.py:46, SURVEY.md §7).
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import jax.numpy as jnp

from aphantasia_tpu.params.fft import FFTParameterizer
from aphantasia_tpu.io.checkpoint import load_pt
from aphantasia_tpu.io.media import file_list, frames_to_video
from aphantasia_tpu.progress import get_progress_bar


def get_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('-i', '--in_dir', default='pt')
    parser.add_argument('-o', '--out_dir', default='_out')
    parser.add_argument('-l', '--length', default=None, type=int, help='Total length in sec')
    parser.add_argument('-s', '--steps', default=25, type=int, help='Frames per transition')
    parser.add_argument('--fps', default=25, type=int)
    parser.add_argument('--contrast', default=1.1, type=float)
    parser.add_argument('--colors', default=1.8, type=float)
    parser.add_argument('-d', '--decay', default=1.5, type=float)
    parser.add_argument('-v', '--verbose', default=True, type=bool)
    parser.add_argument('--fleet', default=None,
                        help="'RANK/WORLD[@COORDINATOR:PORT]' — shard "
                             "snapshot pairs across hosts (DCN fan-out)")
    return parser.parse_args(argv)


def read_pt(file):
    obj = load_pt(file)
    if isinstance(obj, list):
        obj = obj[0]
    return jnp.asarray(np.asarray(obj, np.float32))


def main(argv=None):
    from aphantasia_tpu.cli.common import apply_platform
    from aphantasia_tpu.parallel.multihost import init_fleet, shard_scenes
    apply_platform()
    a = get_args(argv)
    # before ANY jax op — jax.distributed.initialize must precede backend init
    rank, world = init_fleet(a.fleet)
    tempdir = os.path.join(a.out_dir, 'a')
    os.makedirs(tempdir, exist_ok=True)

    ptfiles = file_list(a.in_dir, 'pt')
    assert ptfiles, f"no .pt snapshots in {a.in_dir}"

    ptest = read_pt(ptfiles[0])
    h, w = ptest.shape[2], (ptest.shape[3] - 1) * 2
    par = FFTParameterizer((h, w), a.decay, a.colors)

    vsteps = a.steps if a.length is None else int(a.length * a.fps / len(ptfiles))
    from aphantasia_tpu.parallel.step import (build_shift_render_loop,
                                              frames_per_dispatch)
    rloop = build_shift_render_loop(par, a.contrast)
    nf = frames_per_dispatch((h, w), vsteps)

    # fleet fan-out: transitions are independent -> one pair per host
    pairs = shard_scenes(len(ptfiles), rank, world)
    if world > 1:
        # drop stale frames for THIS rank's pairs from a previous run in
        # the reused shared tempdir — pairs are disjoint across ranks, so
        # each rank cleaning its own filenames cannot race the others
        for px in pairs:
            for j in range(vsteps):
                stale = os.path.join(tempdir, '%05d.jpg' % (px * vsteps + j))
                if os.path.exists(stale):
                    os.remove(stale)

    from aphantasia_tpu.io.media import AsyncFrameWriter
    pbar = get_progress_bar()(vsteps * len(pairs))
    with AsyncFrameWriter() as fw:
        for px in pairs:
            params1 = read_pt(ptfiles[px])
            diff = read_pt(ptfiles[(px + 1) % len(ptfiles)]) - params1
            for c in range(0, vsteps, nf):
                xs = jnp.arange(c, c + nf, dtype=jnp.float32) / vsteps
                frames = rloop(params1, diff, xs)
                fw.save_batch(
                    [os.path.join(tempdir,
                                  '%05d.jpg' % (px * vsteps + c + j))
                     for j in range(nf)], frames)
                for _ in range(nf):
                    pbar.upd()

    if world > 1:
        if rank != 0:
            return
        import time
        # poll for this run's exact filenames (not any .jpg) so leftovers
        # from other configs in the shared tempdir can't fake completion
        expected_names = ['%05d.jpg' % (px * vsteps + j)
                          for px in range(len(ptfiles)) for j in range(vsteps)]
        expected = len(expected_names)
        deadline = time.monotonic() + float(
            os.environ.get('APHANTASIA_FLEET_WAIT', '0'))

        def count():
            return sum(os.path.exists(os.path.join(tempdir, f))
                       for f in expected_names)

        n_frames = count()
        while n_frames < expected:
            if time.monotonic() >= deadline:
                print(' fleet: %d/%d frames present — rerun on one host to '
                      'assemble' % (n_frames, expected))
                return
            time.sleep(2.0)
            n_frames = count()
    out = frames_to_video(tempdir, '%s-pts.mp4' % a.in_dir.rstrip('/'),
                          pattern='%05d.jpg', fps=a.fps)
    if out and a.verbose:
        print('\n', out)


if __name__ == '__main__':
    main()
