"""Device meshes + sharding helpers.

The reference has NO distributed code (SURVEY.md §2.6 — hardcoded single
`.cuda()` device).  The TPU design shards the embarrassingly-parallel cutout
batch over a 'data' mesh axis (each chip encodes its shard of cutouts through
CLIP; XLA inserts the psum for the loss/grad reduction over ICI), keeps the
generator parameters replicated, and optionally shards CLIP weights over a
'model' axis for the big RN50x64/ViT-L towers.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axes=("data",)) -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = np.asarray(devs[:n_devices])
    if len(axes) == 1:
        return Mesh(devs.reshape(-1), axes)
    # 2D mesh: put model axis innermost (fastest ICI links)
    model = 1
    for cand in (2, 4):
        if n_devices % cand == 0:
            model = cand
    return Mesh(devs.reshape(-1, model), axes)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (samples) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh):
    return jax.lax.with_sharding_constraint(x, data_sharding(mesh))
