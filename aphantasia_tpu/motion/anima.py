"""Keyframe animation curves — host-side numpy (they run once per scene).

Behavioral parity with reference aphantasia/utils.py:299-396 (`latent_anima`,
`lerp`, `slerp_np`, `cublerp`, `smoothstep`, `get_z`): random key points every
`transit` frames interpolated by lerp/slerp/cubic-spline with smoothstep
easing, optional gaussian smoothing and looping.
"""
from __future__ import annotations

import math
import time

import numpy as np
import scipy.special
from scipy.interpolate import CubicSpline
from scipy.ndimage import gaussian_filter


def get_z(shape, rnd, uniform: bool = False):
    return rnd.uniform(0.0, 1.0, shape) if uniform else rnd.randn(*shape)


def smoothstep(x, nn=1.0, xmin=0.0, xmax=1.0):
    """Generalized smoothstep (utils.py:305-313)."""
    n = math.ceil(nn)
    x = np.clip((x - xmin) / (xmax - xmin), 0, 1)
    result = 0
    for i in range(0, n + 1):
        result += (scipy.special.comb(n + i, i)
                   * scipy.special.comb(2 * n + 1, n - i) * (-x) ** i)
    result *= x ** (n + 1)
    if nn != n:
        result = (x + result) / 2
    return result


def lerp(z1, z2, num_steps, smooth: float = 0.0):
    xs = [step / (num_steps - 1) for step in range(num_steps)]
    if smooth > 0:
        xs = [smoothstep(x, smooth) for x in xs]
    return np.array([z1 + (z2 - z1) * x for x in xs])


def slerp_np(z1, z2, num_steps, smooth: float = 0.0):
    """Hypersphere interpolation (utils.py:325-339)."""
    z1_norm = np.linalg.norm(z1)
    z2_norm = np.linalg.norm(z2)
    z2_normal = z2 * (z1_norm / z2_norm)
    vectors = []
    xs = [step / (num_steps - 1) for step in range(num_steps)]
    if smooth > 0:
        xs = [smoothstep(x, smooth) for x in xs]
    for x in xs:
        interplain = z1 + (z2 - z1) * x
        interp = z1 + (z2_normal - z1) * x
        interp_norm = np.linalg.norm(interp)
        vectors.append(interplain * (z1_norm / interp_norm))
    return np.array(vectors)


def cublerp(points, steps, fstep, looped: bool = True):
    """Cubic-spline keypoint interpolation (utils.py:341-346)."""
    keys = np.array([i * fstep for i in range(steps)] + [steps * fstep])
    last = 0 if looped else -1
    points = np.concatenate((points, np.expand_dims(points[last], 0)))
    return CubicSpline(keys, points)(range(steps * fstep + 1))


def latent_anima(shape, frames, transit, key_latents=None, smooth: float = 0.5,
                 uniform: bool = False, cubic: bool = False, gauss: bool = False,
                 start_lat=None, seed=None, looped: bool = True,
                 verbose: bool = False):
    """Random-keypoint scalar/vector timeline (utils.py:350-396)."""
    if key_latents is None:
        transit = int(max(1, min(frames // 2, transit)))
    steps = max(1, math.ceil(frames / transit))
    log = " timeline: %d steps by %d" % (steps, transit)

    if seed is None:
        seed = int((time.time() % 1) * 9999)
    rnd = np.random.RandomState(seed)

    if key_latents is None:
        key_latents = np.array([get_z(shape, rnd, uniform) for _ in range(steps)])
    if start_lat is not None:
        key_latents[0] = start_lat

    latents = np.expand_dims(key_latents[0], 0)
    if transit == 1:
        latents = key_latents
    elif cubic:
        latents = cublerp(key_latents, steps, transit, looped)
        log += ", cubic"
    else:
        for i in range(steps):
            za = key_latents[i]
            lat_num = (i + 1) % steps if looped else min(i + 1, steps - 1)
            zb = key_latents[lat_num]
            interps = (lerp(za, zb, transit, smooth=smooth) if uniform
                       else slerp_np(za, zb, transit, smooth=smooth))
            latents = np.concatenate((latents, interps))
    latents = np.array(latents)

    if gauss:
        lats_post = gaussian_filter(latents, [transit, 0, 0], mode="wrap")
        lats_post = (lats_post
                     / np.linalg.norm(lats_post, axis=-1, keepdims=True)
                     ) * math.sqrt(np.prod(shape))
        log += ", gauss"
        latents = lats_post

    if verbose:
        print(log)
    if latents.shape[0] > frames:
        latents = latents[1:]
    return latents


def motion_schedule(glob_steps, fstep, gen: str, scale=0.012, shift=10.0,
                    angle=0.8, shear=0.4, seed=None):
    """The 4-track motion schedule with amplitude coupling
    (illustrip.py:301-314): scale ping-pongs (FFT) or zooms in (RGB);
    shift/angle/shear amplitudes follow |scale-1|."""
    midp = 0.5
    if gen.upper() == "RGB":
        m_scale = latent_anima([1], glob_steps, fstep, uniform=True, cubic=True,
                               start_lat=[-0.3], seed=seed)
        m_scale = 1 + (m_scale + 0.3) * scale
    else:
        m_scale = latent_anima([1], glob_steps, fstep, uniform=True, cubic=True,
                               start_lat=[0.6], seed=seed)
        m_scale = 1 - (m_scale - 0.6) * scale
    m_shift = latent_anima([2], glob_steps, fstep, uniform=True, cubic=True,
                           start_lat=[midp, midp], seed=seed)
    m_angle = latent_anima([1], glob_steps, fstep, uniform=True, cubic=True,
                           start_lat=[midp], seed=seed)
    m_shear = latent_anima([1], glob_steps, fstep, uniform=True, cubic=True,
                           start_lat=[midp], seed=seed)
    m_shift = (midp - m_shift) * shift * abs(m_scale - 1) / scale
    m_angle = (midp - m_angle) * angle * abs(m_scale - 1) / scale
    m_shear = (midp - m_shear) * shear * abs(m_scale - 1) / scale
    return m_scale, m_shift, m_angle, m_shear
