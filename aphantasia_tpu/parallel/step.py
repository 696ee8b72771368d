"""The fused training step: decode -> cutouts -> augment -> CLIP -> loss ->
grad -> optimizer update, as ONE jitted XLA program.

This replaces the reference's per-step closure chain (clip_fft.py:235-306
`train`, illustra.py:216-263, illustrip.py:426-470) — in torch each step is
dozens of kernel launches and a Python-side autograd walk; here the whole
step (including the Adam update) compiles once and reruns from device memory.

Loss-term parity (clip_fft.py:254-295):
  prompt groups    sign * wt * sim_func(enc, out_enc)   (topic/style/subtract
                   /image unified as (embs, weights, coeff) groups)
  aesthetic        -0.001 * aest * head(out_enc).mean()
  sync (LPIPS)     prog_sync * sync * lpips(half(img), img_in)
  sharpness        -sharp * derivat(img, mode)
  enforce          -enforce * sim(out_enc, second-pass enc)
  expand           +expand * sim(out_enc, prev_enc), gated to step > 0
  noise            spectrum-shift noise injected into decode
  RGB anchors      brightness/contrast pin (illustrip.py:438-440)

Multi-chip: when a mesh is given, cutouts/encodings carry 'data'-axis
sharding constraints; XLA's SPMD partitioner emits the ICI psum for the
gradient reduction (generator params stay replicated).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from aphantasia_tpu.ops.augs import get_transform
from aphantasia_tpu.ops.losses import sim_func, derivat, aesthetic_apply
from aphantasia_tpu.ops.resize import resize_bicubic
from aphantasia_tpu.models.clip.model import encode_image
from aphantasia_tpu.models.lpips import lpips_apply


@dataclasses.dataclass(frozen=True)
class StepSettings:
    """Static (compile-time) loss/step configuration."""
    sim: str = "mix"
    sharp: float = 0.0
    sharp_mode: str = "naiv"
    aest: float = 0.0
    enforce: float = 0.0
    expand: float = 0.0
    noise: float = 0.0
    noise_centered: bool = False   # clip_fft uses rand; illustra/trip rand-0.5
    sync: float = 0.0
    total_steps: int = 200         # prog_sync denominator
    rgb_anchors: bool = False
    transform: str = "fast"
    clip_dtype: Any = jnp.float32


def _noise_shift(key, settings: StepSettings, param_shape):
    """Spectrum-shift noise (clip_fft.py:238 / illustrip.py:429)."""
    if settings.noise <= 0:
        return None
    h, wf = param_shape[2], param_shape[3]
    u = jax.random.uniform(key, (1, 1, h, wf, 1))
    if settings.noise_centered:
        u = u - 0.5
    return settings.noise * u


def build_loss_fn(parameterizer, sampler, clip_cfg, settings: StepSettings,
                  mesh=None):
    """Returns loss_fn(gen_params, clip_params, aest_params, lpips_bundle,
    prompts, prev_enc, key, step_i) -> (loss, out_enc_mean)."""
    transform = get_transform(settings.transform)

    def maybe_shard(x):
        if mesh is not None:
            from aphantasia_tpu.parallel.mesh import shard_batch
            return shard_batch(x, mesh)
        return x

    def encode_cuts(clip_params, key, img):
        k_box, k_tf = jax.random.split(key)
        boxes = sampler.sample_boxes(k_box)
        cuts = sampler.cut(img, boxes, compute_dtype=settings.clip_dtype)
        cuts = maybe_shard(cuts)
        # enter the tower dtype BEFORE the augmentations: the warps already
        # compute in bf16 internally, and keeping the inter-stage tensors
        # bf16 halves the patchify-side layout copies the r3 trace surfaced
        # (~1.3 ms/step of f32 copies at the headline config)
        cuts = transform(k_tf, cuts.astype(settings.clip_dtype))
        enc = encode_image(clip_params, clip_cfg, cuts, dtype=settings.clip_dtype)
        return maybe_shard(enc).astype(jnp.float32)

    def loss_fn(gen_params, clip_params, aest_params, lpips_bundle,
                prompts, prev_enc, key, step_i):
        k_noise, k_s1, k_s2 = jax.random.split(key, 3)
        shift = (_noise_shift(k_noise, settings, gen_params.shape)
                 if (settings.noise > 0 and hasattr(gen_params, "shape")) else None)
        img = parameterizer.image(gen_params, shift=shift)

        out_enc = encode_cuts(clip_params, k_s1, img)
        loss = jnp.float32(0.0)

        if settings.aest != 0 and aest_params is not None:
            loss = loss - 0.001 * settings.aest * jnp.mean(
                aesthetic_apply(aest_params, out_enc))

        for embs, wts, coeff in prompts:
            k = embs.shape[0]
            group = jnp.float32(0.0)
            for j in range(k):
                group = group + wts[j] * sim_func(embs[j:j + 1], out_enc, settings.sim)
            loss = loss + coeff * group

        if settings.sync > 0 and lpips_bundle is not None:
            lpips_params, img_in = lpips_bundle           # img_in: half-res target
            sim_size = img_in.shape[-2:]
            prog = (settings.total_steps - step_i) / settings.total_steps
            half = resize_bicubic(img, sim_size)
            loss = loss + prog * settings.sync * jnp.mean(
                lpips_apply(lpips_params, half, img_in, normalize=True))

        if settings.sharp != 0:
            loss = loss - settings.sharp * derivat(img, mode=settings.sharp_mode)

        if settings.rgb_anchors:
            # illustrip.py:438-440 empirical brightness/contrast pins
            loss = loss + jnp.mean(jnp.abs(img.mean(axis=(2, 3)) - 0.45))
            loss = loss + jnp.mean(jnp.abs(img.std(axis=(2, 3), ddof=1) - 0.17))

        if settings.enforce != 0:
            enc2 = encode_cuts(clip_params, k_s2, img)
            loss = loss - settings.enforce * sim_func(out_enc, enc2, settings.sim)

        if settings.expand > 0:
            gate = (step_i > 0).astype(jnp.float32)
            loss = loss + gate * settings.expand * sim_func(out_enc, prev_enc,
                                                            settings.sim)

        return loss, jax.lax.stop_gradient(out_enc)

    return loss_fn


def build_train_step(parameterizer, sampler, clip_cfg, settings: StepSettings,
                     optimizer: optax.GradientTransformation, mesh=None,
                     jit: bool = True):
    """Returns train_step(gen_params, opt_state, prev_enc, clip_params,
    aest_params, lpips_bundle, prompts, key, step_i)
    -> (gen_params, opt_state, prev_enc, loss)."""
    loss_fn = build_loss_fn(parameterizer, sampler, clip_cfg, settings, mesh)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(gen_params, opt_state, prev_enc, clip_params, aest_params,
                   lpips_bundle, prompts, key, step_i):
        (loss, out_enc), grads = grad_fn(
            gen_params, clip_params, aest_params, lpips_bundle, prompts,
            prev_enc, key, step_i)
        updates, opt_state = optimizer.update(grads, opt_state, gen_params)
        gen_params = optax.apply_updates(gen_params, updates)
        return gen_params, opt_state, out_enc, loss

    if jit:
        train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))
    return train_step


def build_train_loop(parameterizer, sampler, clip_cfg, settings: StepSettings,
                     optimizer: optax.GradientTransformation, n_inner: int,
                     mesh=None):
    """N training steps per dispatch via lax.scan — amortizes the per-call
    host->device round trip (~28ms through the tunneled runtime).

    Returns loop(gen_params, opt_state, prev_enc, clip_params, aest_params,
    lpips_bundle, prompts, key, step0) -> (gen_params, opt_state, prev_enc,
    losses [n_inner])."""
    loss_fn = build_loss_fn(parameterizer, sampler, clip_cfg, settings, mesh)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def loop(gen_params, opt_state, prev_enc, clip_params, aest_params,
             lpips_bundle, prompts, key, step0):
        def body(carry, i):
            gp, os_, pe = carry
            k = jax.random.fold_in(key, i)
            (loss, out_enc), grads = grad_fn(
                gp, clip_params, aest_params, lpips_bundle, prompts, pe, k,
                step0 + i)
            updates, os_ = optimizer.update(grads, os_, gp)
            gp = optax.apply_updates(gp, updates)
            return (gp, os_, out_enc), loss

        (gp, os_, pe), losses = jax.lax.scan(
            body, (gen_params, opt_state, prev_enc),
            jnp.arange(n_inner, dtype=jnp.int32))
        return gp, os_, pe, losses

    return jax.jit(loop, donate_argnums=(0, 1, 2))


def build_train_loop_frames(parameterizer, sampler, clip_cfg,
                            settings: StepSettings,
                            optimizer: optax.GradientTransformation,
                            opt_step: int, n_frames: int,
                            contrast: float = 1.0, mesh=None,
                            step_index: str = "frame",
                            with_params: bool = False,
                            dual=None):
    """`n_frames` frame-groups per dispatch for the image CLIs.

    Each group reproduces the reference cadence exactly (clip_fft.py:297-306
    renders after the FIRST step of every `opt_step` group): one train step,
    render a uint8 frame, then the remaining `opt_step - 1` steps.  Scanning
    groups amortizes the ~28ms tunneled per-program overhead that made CLI
    wall-clock much slower than the bench's scanned loop.

    Returns loop(gen_params, opt_state, prev_enc, clip_params, aest_params,
    lpips_bundle, prompts, key, frame0) -> (gen_params, opt_state, prev_enc,
    frames [n_frames,H,W,3] uint8, losses [n_frames*opt_step]).
    `frame0` is the global frame index of the dispatch's first group (frame
    k covers steps k*opt_step .. (k+1)*opt_step-1).  `step_index` picks what
    the loss sees as step_i: the frame index (clip_fft's `i // opt_step`) or
    the global step (illustra/cppn pass `i`).  `with_params=True` appends a
    stacked pytree of the frame-boundary generator params to the outputs
    (cppn exports an .npy snapshot per saved frame) — only sensible for
    small parameterizers.

    `dual=(clip_cfg2, dm_every)` compiles BOTH towers into the scan body
    for dualmod (clip_fft.py:135: every dm_every-th global step runs the
    second model; a lax.cond picks the branch, so only one executes).  The
    loop then takes three extra args after `prompts`:
    (clip_params2, aest_params2, prompts2)."""
    loss_fn = build_loss_fn(parameterizer, sampler, clip_cfg, settings, mesh)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    if dual is not None:
        cfg2, dm_every = dual
        grad_fn2 = jax.value_and_grad(
            build_loss_fn(parameterizer, sampler, cfg2, settings, mesh),
            has_aux=True)

    def loop(gen_params, opt_state, prev_enc, clip_params, aest_params,
             lpips_bundle, prompts, *rest):
        if dual is not None:
            clip_params2, aest_params2, prompts2, key, frame0 = rest
        else:
            key, frame0 = rest

        def one_step(carry, gstep, fstep):
            gp, os_, pe = carry
            k = jax.random.fold_in(key, gstep)
            si = fstep if step_index == "frame" else gstep
            if dual is None:
                (loss, out_enc), grads = grad_fn(
                    gp, clip_params, aest_params, lpips_bundle, prompts, pe,
                    k, si)
            else:
                use2 = jnp.logical_and(gstep % dm_every == 0, gstep > 0)
                (loss, out_enc), grads = jax.lax.cond(
                    use2,
                    lambda _: grad_fn2(gp, clip_params2, aest_params2,
                                       lpips_bundle, prompts2, pe, k, si),
                    lambda _: grad_fn(gp, clip_params, aest_params,
                                      lpips_bundle, prompts, pe, k, si),
                    None)
            updates, os_ = optimizer.update(grads, os_, gp)
            gp = optax.apply_updates(gp, updates)
            return (gp, os_, out_enc), loss

        def frame_body(carry, j):
            fstep = frame0 + j
            base = fstep * opt_step
            carry, l0 = one_step(carry, base, fstep)
            img = parameterizer.image(carry[0], contrast=contrast)
            img = jnp.clip(img[0].transpose(1, 2, 0), 0.0, 1.0)
            frame = (img * 255.0 + 0.5).astype(jnp.uint8)
            ys = (frame, carry[0]) if with_params else (frame,)
            if opt_step > 1:
                carry, lrest = jax.lax.scan(
                    lambda c, s: one_step(c, base + 1 + s, fstep),
                    carry, jnp.arange(opt_step - 1, dtype=jnp.int32))
                losses = jnp.concatenate([l0[None], lrest])
            else:
                losses = l0[None]
            return carry, ys + (losses,)

        (gp, os_, pe), ys = jax.lax.scan(
            frame_body, (gen_params, opt_state, prev_enc),
            jnp.arange(n_frames, dtype=jnp.int32))
        losses = ys[-1].reshape(-1)
        if with_params:
            return gp, os_, pe, ys[0], ys[1], losses
        return gp, os_, pe, ys[0], losses

    return jax.jit(loop, donate_argnums=(0, 1, 2))


def frames_per_dispatch(size, n_frames_total: int, cap_bytes: int = 75_000_000):
    """Largest divisor of `n_frames_total` whose stacked uint8 frames stay
    under `cap_bytes` (and <= 16) — frame chunks trade dispatch overhead
    against render-buffer memory/transfer."""
    per = size[0] * size[1] * 3
    cap = max(1, min(16, cap_bytes // max(per, 1)))
    best = 1
    for f in range(1, cap + 1):
        if n_frames_total % f == 0:
            best = f
    return best


def build_frame_step(parameterizer, sampler, clip_cfg, settings: StepSettings,
                     optimizer: optax.GradientTransformation, gen: str, size,
                     opt_steps: int, smooth: bool, contrast: float = 1.0,
                     deptha=None, depth: float = 0.0, colors: float = 1.0,
                     mesh=None):
    """ONE jitted program per video frame — the illustrip hot path.

    Fuses the whole frame advance (reference illustrip.py:379-484) that the
    CLI previously ran as ~7 separate dispatches (FFT decode, depth warp,
    affine motion, FFT re-encode, optimizer init, N train steps, render):
    through the tunneled runtime each program carries ~28ms of dispatch
    overhead, which dominated frames/min at small `opt_steps`.

    motion = (angle_deg, shift_x, shift_y, scale, shear_deg) — traced
    scalars, so the motion schedule never recompiles.  With `smooth` the
    optimizer state is carried in/out (illustrip `--smooth`); otherwise a
    fresh state is built inside the program (fresh optimizer per frame,
    illustrip.py:409-423).

    Depth mode (`deptha` + nonzero `depth`): the DA-V2 tower is NOT traced
    into this program — fusing it ballooned the module's remote-compile
    time.  Instead the frame program takes the mirror-fused depth product
    (at the 518-ish inference resolution) as an INPUT, applies the grid
    warp in-graph, and EMITS the next frame's depth-preview image so the
    host's only extra work per frame is one DA-V2 dispatch
    (build_depth_helpers).  Signature gains trailing `depth_map` input and
    a `preview` output.

    Returns frame_fn(params_tmp, opt_state, prev_enc, clip_params,
    aest_params, prompts, key, step_i, motion[, depth_map]) ->
    (params_tmp, opt_state, prev_enc, frame_u8, losses [opt_steps]
    [, preview]).
    """
    from aphantasia_tpu.ops.warp import frame_transform
    h, w = size
    # gate matches the unfused path and the reference (illustrip.py:379
    # `if a.depth > 0`): zero/negative strength disables the warp
    with_depth = deptha is not None and depth > 0.0
    loss_fn = build_loss_fn(parameterizer, sampler, clip_cfg, settings, mesh)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    from aphantasia_tpu.params.fft import spectrum_to_image, image_to_spectrum

    def decode_raw(params_tmp):
        return (spectrum_to_image(params_tmp, (h, w)) if gen == "FFT"
                else params_tmp)

    def motion_warp(params_tmp, motion, depth_map):
        angle, sh0, sh1, scale, shear = motion
        img = decode_raw(params_tmp)
        if with_depth:
            from aphantasia_tpu.motion.depthwarp import grid_warp
            from aphantasia_tpu.ops.resize import resize_bicubic
            # warp-origin mapping, illustrip.py:115-128 (traced scalars)
            dx = 100.0 * sh0 / w
            dy = 100.0 * sh1 / h
            dz = 0.5 + 32.0 * (scale - 1.0)
            d = resize_bicubic(depth_map, (h, w))
            img = grid_warp(img, d[0], depth, (dx, dy), dz)
        img = frame_transform(img, (h, w), angle, (sh0, sh1), scale, shear)
        return image_to_spectrum(img, (h, w)) if gen == "FFT" else img

    def frame_fn(params_tmp, opt_state, prev_enc, clip_params, aest_params,
                 prompts, key, step_i, motion, depth_map=None):
        gp = motion_warp(params_tmp, motion, depth_map)
        os_ = opt_state if smooth else optimizer.init(gp)

        def body(carry, s):
            gp, os_, pe = carry
            k = jax.random.fold_in(key, s)
            (loss, out_enc), grads = grad_fn(
                gp, clip_params, aest_params, None, prompts, pe, k, step_i)
            updates, os_ = optimizer.update(grads, os_, gp)
            gp = optax.apply_updates(gp, updates)
            return (gp, os_, out_enc), loss

        (gp, os_, pe), losses = jax.lax.scan(
            body, (gp, os_, prev_enc), jnp.arange(opt_steps, dtype=jnp.int32))

        img = parameterizer.image(gp, contrast=contrast)
        img = jnp.clip(img[0].transpose(1, 2, 0), 0.0, 1.0)
        frame_u8 = (img * 255.0 + 0.5).astype(jnp.uint8)
        if with_depth:
            preview = _depth_preview(decode_raw(gp), (h, w), colors)
            return gp, os_, pe, frame_u8, losses, preview
        return gp, os_, pe, frame_u8, losses

    return jax.jit(frame_fn, donate_argnums=(0, 1, 2))


def _depth_preview(img_raw, size, colors):
    """DA-V2-sized preview of the frame (motion/depthwarp.py:depth_preview),
    computed from the RAW (pre-color-head) frame state."""
    from aphantasia_tpu.motion.depthwarp import depth_preview
    from aphantasia_tpu.params.color import to_valid_rgb
    return depth_preview(to_valid_rgb(img_raw, colors=colors), size)


def build_depth_helpers(gen: str, size, deptha, colors: float):
    """Host-side companions to build_frame_step's depth mode:

    preview(params) — the frame-0 bootstrap (later frames reuse the
    preview the frame program emits); infer(preview) — ONE batched DA-V2
    forward of the preview and its mirror, fused `d * flip(d_mirror)`
    (depth/depth.py:75), returning the [1,1,hd,wd] product the frame
    program consumes.  The DA-V2 params ride as jit ARGUMENTS (bound via a
    host-side wrapper), never as inlined program constants — the ~100M
    parameter tree would blow the tunneled compile service's request
    limit."""
    h, w = size

    from aphantasia_tpu.params.fft import spectrum_to_image
    from aphantasia_tpu.motion.depthwarp import mirror_fused_depth

    def preview_fn(params_tmp):
        img = (spectrum_to_image(params_tmp, (h, w)) if gen == "FFT"
               else params_tmp)
        return _depth_preview(img, (h, w), colors)

    def infer_fn(dparams, preview):
        return mirror_fused_depth(
            lambda x: type(deptha).apply(dparams, deptha.cfg, x,
                                         dtype=deptha.dtype), preview)

    infer_jit = jax.jit(infer_fn)
    return jax.jit(preview_fn), lambda prev: infer_jit(deptha.params, prev)


def build_shift_render_loop(parameterizer, contrast: float = 1.0):
    """Chunked spectrum-crossfade renderer for interpol / illustra's final
    assembly: render len(xs) frames `decode(params + xs[i]*diff)` in ONE
    dispatch (lax.scan), returning stacked uint8 [N,H,W,3] — the per-frame
    render dispatches dominated assembly wall-clock on the tunneled
    runtime."""
    def loop(params, diff, xs):
        def body(_, x):
            img = parameterizer.image(params, shift=diff * x,
                                      contrast=contrast)
            img = jnp.clip(img[0].transpose(1, 2, 0), 0.0, 1.0)
            return None, (img * 255.0 + 0.5).astype(jnp.uint8)
        return jax.lax.scan(body, None, xs)[1]
    return jax.jit(loop)


def build_render(parameterizer, jit: bool = True):
    """Frame renderer: params -> [H,W,3] uint8 on device (uint8 before the
    device->host pull — the tunneled transfer is bandwidth-bound).  Tone
    mapping stays host-side (clip_fft.py:300-304) on the float copy when
    needed via `as_float`."""
    def render(gen_params, contrast=1.0):
        img = parameterizer.image(gen_params, contrast=contrast)
        img = jnp.clip(img[0].transpose(1, 2, 0), 0.0, 1.0)
        return (img * 255.0 + 0.5).astype(jnp.uint8)
    return jax.jit(render) if jit else render
