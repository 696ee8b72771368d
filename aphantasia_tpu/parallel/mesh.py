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


def make_mesh_2d(data: int, model: int) -> Mesh:
    """Explicit data x model mesh ('NxM' CLI spec).  Model axis innermost so
    its collectives ride the fastest ICI links."""
    devs = np.asarray(jax.devices()[:data * model])
    if len(devs) < data * model:
        raise ValueError(
            f"mesh {data}x{model} needs {data * model} devices, "
            f"have {len(devs)}")
    return Mesh(devs.reshape(data, model), ("data", "model"))


def make_mesh_spatial(spatial: int, mesh_spec=None) -> Mesh:
    """Compose the canvas axis with the cutout axes: ('data'[, 'model'],
    'spatial') from the CLI --mesh/--spatial pair (VERDICT r1 item 1).
    Spatial innermost so the image-sized FFT-transpose all_to_all rides
    the fastest ICI links; the data axis only ever moves cut-sized
    tensors."""
    axes, shape = [], []
    if mesh_spec and str(mesh_spec) not in ("0", "1"):
        s = str(mesh_spec).lower()
        if "x" in s:
            dp, tp = (int(v) for v in s.split("x"))
            axes += ["data", "model"]
            shape += [dp, tp]
        else:
            axes += ["data"]
            shape += [int(s)]
    axes += ["spatial"]
    shape += [int(spatial)]
    n = int(np.prod(shape))
    devs = jax.devices()
    if len(devs) < n:
        raise ValueError(f"mesh {dict(zip(axes, shape))} needs {n} devices, "
                         f"have {len(devs)}")
    return Mesh(np.asarray(devs[:n]).reshape(shape), tuple(axes))


def shard_clip_params(params, mesh: Mesh):
    """Tensor-parallel layout for a CLIP param tree over the 'model' axis.

    Transformer blocks (both towers; the text tower exists in every model
    incl. the RN family) shard column-/row-wise:
      mlp.fc_w   [D, 4D]  -> P(None, 'model')   (column parallel)
      mlp.proj_w [4D, D]  -> P('model', None)   (row parallel)
      attn.in_w  [D, 3D]  -> P(None, 'model')
    everything else is replicated; XLA's SPMD partitioner inserts the
    activation collectives.  This is the product surface of the dp x tp
    dryrun (__graft_entry__.dryrun_multichip), built for RN50x64/ViT-L
    towers that don't fit comfortably replicated (SURVEY.md §2.6 row 2).
    """
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    out = jax.tree_util.tree_map(lambda x: put(x, P()), params)
    for tower in ("visual", "text"):
        tp = params.get(tower, {})
        if not isinstance(tp, dict) or "blocks" not in tp:
            continue    # RN visual trunk (convs) stays replicated
        for i, blk in enumerate(tp["blocks"]):
            out[tower]["blocks"][i]["mlp"]["fc_w"] = put(
                blk["mlp"]["fc_w"], P(None, "model"))
            out[tower]["blocks"][i]["mlp"]["proj_w"] = put(
                blk["mlp"]["proj_w"], P("model", None))
            out[tower]["blocks"][i]["attn"]["in_w"] = put(
                blk["attn"]["in_w"], P(None, "model"))
    return out


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (samples) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh):
    return jax.lax.with_sharding_constraint(x, data_sharding(mesh))
