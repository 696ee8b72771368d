"""depth — standalone Depth-Anything-V2 batch inference over images.

Rebuild of reference depth/any2/run.py (which ships broken imports —
`from deptha2.dpt import ...` / `from eps import ...`, run.py:9-11 — and
is unused by the main pipeline; SURVEY.md §7 known-bug list).  Same
surface: image-or-folder input, per-image grayscale-x3 PNG of the
min-max-normalized inverse depth at the source resolution.

TPU-first differences from the reference's one-image-at-a-time loop:
images are bucketed by their (multiple-of-14, short-side>=size) inference
dims and each bucket rides batched fixed-shape forwards through ONE jitted
program per shape — the tunneled chip pays the ~28 ms dispatch floor per
batch, not per image.  The depth->source-resolution upsample and the
uint8 min-max quantization run on-device (matmul bicubic), so the host
transfer is one uint8 map per image.
"""
from __future__ import annotations

import argparse
import os
from collections import defaultdict

import numpy as np

from aphantasia_tpu.cli.common import apply_platform
from aphantasia_tpu.io.media import img_list, img_read, img_save, basename
from aphantasia_tpu.progress import get_progress_bar

# reference run.py:17 exposes vits/vitb/vitl/vitg; vitg weights were never
# released (and the reference's own default pipeline uses vitb) — accept
# the flag vocabulary minus 'vitg', plus the short names the video CLI uses
ENCODERS = ["vits", "vitb", "vitl", "s", "b", "l"]

_BATCH = 4   # images per fused forward within a same-shape bucket


def get_args(argv=None):
    parser = argparse.ArgumentParser(description="Depth Anything V2")
    parser.add_argument('-i', '--input', default='_in', help='Input image or folder')
    parser.add_argument('-o', '--out_dir', default='_out')
    parser.add_argument('--encoder', default='vitb', choices=ENCODERS)
    parser.add_argument('-sz', '--size', type=int, default=768, help='inference short side (rounded to multiple of 14)')
    parser.add_argument('--depth_weights', default=None, help='DA-V2 checkpoint (HF safetensors dir/file); APHANTASIA_DAV2_PT otherwise')
    parser.add_argument('-v', '--verbose', action='store_true')
    return parser.parse_args(argv)


def infer_dims(h, w, size):
    """lower-bound resize: short side >= `size`, both multiples of 14
    (reference DA-V2 Resize(keep_aspect_ratio, lower_bound, /14) — the
    run.py `infer_image(img, size)` contract)."""
    scale = size / min(h, w)
    return tuple(max(14, int(round(d * scale / 14)) * 14) for d in (h, w))


def main(argv=None):
    a = get_args(argv)
    apply_platform()
    import jax
    import jax.numpy as jnp
    from aphantasia_tpu.models.depth_anything import InferDepthAny
    from aphantasia_tpu.models.depth_anything.convert import convert_hf_dav2
    from aphantasia_tpu.ops.resize import resize_bicubic
    from aphantasia_tpu.weights import env_weights

    os.makedirs(a.out_dir, exist_ok=True)
    params = None
    dw = env_weights('dav2', a.depth_weights)
    if dw:
        params = convert_hf_dav2(dw)
    deptha = InferDepthAny(a.encoder[-1], params=params)

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def to_uint8(depth, out_hw_pad):
        """[N,1,hd,wd] -> [N,Hp,Wp] uint8 at a bucket-padded output size
        (min-max already applied per-sample by InferDepthAny; the
        reference min-maxes after its internal upsample — the two orders
        differ only by bicubic overshoot, clipped here)."""
        up = resize_bicubic(depth, out_hw_pad)
        return jnp.clip(up[:, 0] * 255.0, 0, 255).astype(jnp.uint8)

    paths = [a.input] if os.path.isfile(a.input) else img_list(a.input)
    if not paths:
        print(' no images found in', a.input)
        return
    imgs = []
    buckets = defaultdict(list)   # inference dims -> indices into imgs
    for i, path in enumerate(paths):
        img = img_read(path)
        imgs.append(img)
        buckets[infer_dims(*img.shape[:2], a.size)].append(i)
    if a.verbose:
        print(f' {len(paths)} images, {len(buckets)} shape bucket(s),'
              f' encoder {a.encoder}, size {a.size}')

    pbar = get_progress_bar()(len(paths))
    for dims, idxs in sorted(buckets.items()):
        # one padded output size per bucket: sources in a bucket share an
        # aspect ratio up to /14 rounding, so the pad slack is tiny
        out_h = max(imgs[i].shape[0] for i in idxs)
        out_w = max(imgs[i].shape[1] for i in idxs)
        for k in range(0, len(idxs), _BATCH):
            chunk = idxs[k:k + _BATCH]
            batch = np.stack([
                np.asarray(resize_bicubic(
                    jnp.asarray(imgs[i], jnp.float32).transpose(2, 0, 1)[None]
                    / 255.0, dims))[0]
                for i in chunk])
            if len(chunk) < _BATCH and len(idxs) > _BATCH:
                # keep ONE compiled shape per bucket: pad the tail batch
                batch = np.concatenate(
                    [batch, np.repeat(batch[-1:], _BATCH - len(chunk), 0)])
            maps = np.asarray(to_uint8(deptha(jnp.asarray(batch)),
                                       (out_h, out_w)))
            for j, i in enumerate(chunk):
                h, w = imgs[i].shape[:2]
                gray = maps[j, :h, :w]
                img_save(os.path.join(a.out_dir, basename(paths[i]) + '.png'),
                         np.repeat(gray[:, :, None], 3, axis=-1))
                pbar.upd()
    if a.verbose:
        print(' saved to', a.out_dir)


if __name__ == '__main__':
    main()
