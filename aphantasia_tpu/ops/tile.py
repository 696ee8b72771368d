"""Tiling / padding as index maps.

Behavioral parity with reference aphantasia/utils.py:152-187 (`tile_pad`,
`pad_up_to`), re-designed TPU-first: instead of materializing a padded frame,
we compute static per-axis int32 index maps (padded coord -> source coord) so
the cutout sampler can fold the overscan pad into its gather — zero HBM cost.
A materializing `tile_pad`/`pad_up_to` is kept for host-side / warp use.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def tile_axis_map(length: int, pad_before: int, pad_after: int,
                  symm: bool = False) -> np.ndarray:
    """Index map for one axis: padded index -> source index.

    Matches the reference `tile` closure (utils.py:156-166) with
    minx=-0.5, maxx=length-0.5: repeating tiles (default) or triangular
    reflection (`symm`).
    """
    x = np.arange(-pad_before, length + pad_after, dtype=np.float64)
    minx, maxx = -0.5, length - 0.5
    rng = maxx - minx
    if symm:
        double_rng = 2 * rng
        mod = np.fmod(x - minx, double_rng)
        normed = np.where(mod < 0, mod + double_rng, mod)
        out = np.where(normed >= rng, double_rng - normed, normed) + minx
    else:
        out = np.remainder(x - minx, rng) + minx
    return out.astype(np.int64).astype(np.int32)


def pad_maps(hw, size, type: str = "centr"):
    """Per-axis index maps padding frame `hw` up to `size`.

    Parity with `pad_up_to` (utils.py:175-187): 'centr' splits the pad evenly
    (excess to the back), 'side' pads only after; 'symm' in the type string
    selects mirrored tiling.  Returns (y_map [size[0]], x_map [size[1]]),
    identity when no padding is needed.
    """
    h, w = hw
    symm = "symm" in type.lower()
    maps = []
    for s, dim in zip(size, (h, w)):
        if "side" in type.lower():
            p0, p1 = 0, s - dim
        else:
            p0 = (s - dim) // 2
            p1 = s - dim - p0
        maps.append(tile_axis_map(dim, p0, p1, symm))
    return maps[0], maps[1]


def tile_pad(xt: jnp.ndarray, padding, symm: bool = False) -> jnp.ndarray:
    """Materializing tile pad: padding=(left, right, top, bottom)."""
    h, w = xt.shape[-2:]
    left, right, top, bottom = padding
    x_map = jnp.asarray(tile_axis_map(w, left, right, symm))
    y_map = jnp.asarray(tile_axis_map(h, top, bottom, symm))
    return xt[..., y_map[:, None], x_map[None, :]]


def pad_up_to(x: jnp.ndarray, size, type: str = "centr") -> jnp.ndarray:
    """Materializing pad-to-size (reference utils.py:175-187)."""
    if list(x.shape[2:]) == list(size):
        return x
    y_map, x_map = pad_maps(x.shape[2:], size, type)
    return x[..., jnp.asarray(y_map)[:, None], jnp.asarray(x_map)[None, :]]
