"""DCN-spanning single optimization: the `data` axis over multiple hosts.

Closes the SCALING.md "still future work" item (r5, VERDICT item 3): one
optimization whose cutout batch shards over a data axis laid out
HOSTS-OUTER x CHIPS-INNER, so XLA's hierarchical collective decomposition
reduces gradients over ICI within each host first and only the
generator-param grad psum (a few MB for FFT params — the sole cross-shard
tensor in the loss) crosses DCN.  `spatial` and `model` stay intra-host
(their image-sized all_to_all / activation all_gathers want ICI — see
docs/SCALING.md).

The reference has no distributed code at all (SURVEY.md §2.6 — hardcoded
single `.cuda()`, reference aphantasia/image.py:112); this is TPU-pod
territory the TPU-first design adds.

Surfaces
--------
* `make_mesh_dcn()` — the hosts-outer global data mesh (all processes).
* `setup_mesh(spec='dcn')` in cli/common.py routes here, so every CLI
  runs a DCN-spanning optimization with
  `--fleet R/W@coord:port --mesh dcn`.
* `python -m aphantasia_tpu.parallel.dcn RANK WORLD COORD NLOCAL OUT` —
  one-process witness worker: joins the coordination service, runs a
  deterministic tiny train step over the global mesh, writes a JSON
  digest.  Driven by `__graft_entry__.dryrun_multichip` (2 processes x
  n/2 virtual CPU devices — the no-hardware witness, MULTICHIP_r*) and by
  tests/test_multihost.py's cross-host-psum parity test.
"""
from __future__ import annotations

import json
import sys


def make_mesh_dcn(n_local: int | None = None):
    """Global 1-D 'data' mesh over every process's devices, HOSTS-OUTER.

    Adjacent chips of one host are adjacent along the axis, so a psum
    over 'data' decomposes into intra-host reduce (ICI) + one cross-host
    exchange (DCN) — XLA does this automatically for contiguous
    process-grouped device orders."""
    import numpy as np
    import jax
    from jax.sharding import Mesh

    procs: dict[int, list] = {}
    for d in jax.devices():
        procs.setdefault(d.process_index, []).append(d)
    ordered = []
    for pi in sorted(procs):
        local = procs[pi]
        ordered.extend(local if n_local is None else local[:n_local])
    return Mesh(np.asarray(ordered), ("data",))


def make_mesh_dcn_spatial(data: int | None = None):
    """2-D ('data', 'spatial') mesh for DCN-spanning SPATIAL work — the
    realistic pod layout for 4K+ canvases: `data` = one row per HOST
    (the grad psum crosses DCN), `spatial` = that host's chips (the
    image-sized FFT-transpose all_to_all stays on ICI, because each
    spatial group is exactly one process's devices).

    `data` overrides the row count for the SINGLE-process case (the
    parity anchor must reproduce the multi-process mesh shape, e.g.
    data:2 x spatial:4 from 8 local devices); with >1 process the row
    structure IS the process structure and the override must match."""
    import numpy as np
    import jax
    from jax.sharding import Mesh

    procs: dict[int, list] = {}
    for d in jax.devices():
        procs.setdefault(d.process_index, []).append(d)
    rows = [procs[pi] for pi in sorted(procs)]
    if len(rows) == 1 and data and data > 1:
        flat = rows[0]
        rows = [flat[i * (len(flat) // data):(i + 1) * (len(flat) // data)]
                for i in range(data)]
    elif data and data != len(rows):
        raise ValueError(f"data={data} != process_count={len(rows)}")
    n_local = min(len(r) for r in rows)
    grid = np.asarray([r[:n_local] for r in rows])
    return Mesh(grid, ("data", "spatial"))


def _put(tree, mesh, spec):
    """device_put a (possibly nested) host-value tree to a global
    NamedSharding — each process transfers only its addressable shards."""
    import jax
    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, spec)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def witness_step(mesh):
    """One deterministic tiny train step over `mesh` (any process count).

    Returns (loss, digest): digest = sum|params| after the update — a
    scalar funneled through the SAME grad-psum the production step uses,
    so equality across runs certifies the cross-host reduction.  All
    inputs derive from fixed PRNG seeds, identical on every process."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from aphantasia_tpu.models.clip.model import CLIPConfig, clip_init
    from aphantasia_tpu.ops.optim import build_optimizer
    from aphantasia_tpu.ops.sampler import CutoutSampler
    from aphantasia_tpu.params.fft import FFTParameterizer
    from aphantasia_tpu.parallel.step import StepSettings, build_train_step

    tiny = CLIPConfig("dcn-witness", 32, 32, 2, 32, 16, context_length=16,
                      vocab_size=256, transformer_width=32,
                      transformer_heads=2, transformer_layers=2,
                      vision_heads_override=2)
    n = mesh.shape["data"]
    samples = max(2 * n, 8)
    clip_params = clip_init(jax.random.PRNGKey(0), tiny)
    par = FFTParameterizer((48, 48), decay_power=1.5, colors=1.8)
    sampler = CutoutSampler((48, 48), samples, tiny.image_resolution,
                            align="uniform", macro=0.4)
    settings = StepSettings(sim="mix", transform="fast", total_steps=10)
    optimizer = build_optimizer("adam_custom", 0.05)
    step = build_train_step(par, sampler, tiny, settings, optimizer,
                            mesh=mesh)

    gen_params = _put(par.init(jax.random.PRNGKey(1)), mesh, P())
    opt_state = _put(optimizer.init(par.init(jax.random.PRNGKey(1))),
                     mesh, P())
    clip_params = _put(clip_params, mesh, P())
    embs = jax.random.normal(jax.random.PRNGKey(2), (1, tiny.embed_dim))
    prompts = ((_put(embs, mesh, P()),
                _put(jnp.ones((1,)), mesh, P()), jnp.float32(-1.0)),)
    prev_enc = _put(jnp.zeros((samples, tiny.embed_dim)), mesh, P("data"))

    params, _, _, loss = step(gen_params, opt_state, prev_enc, clip_params,
                              None, None, prompts, jax.random.PRNGKey(3),
                              jnp.int32(0))
    digest = jax.jit(
        lambda ps: sum(jnp.sum(jnp.abs(p)) for p in
                       jax.tree_util.tree_leaves(ps)))(params)
    # loss/digest are fully replicated -> scalar conversion is legal in
    # multi-process mode
    return float(loss), float(digest)


def witness_spatial_step(mesh):
    """One deterministic sharded-canvas train step over a
    ('data', 'spatial') mesh (parallel/spatial.py) — witnesses the pod
    layout where the FFT-transpose all_to_all stays intra-host while
    the generator-grad psum crosses DCN.  Same digest contract as
    witness_step."""
    import jax
    import jax.numpy as jnp
    from aphantasia_tpu.models.clip.model import CLIPConfig, clip_init
    import aphantasia_tpu.models.clip.model as clip_model
    from aphantasia_tpu.ops.optim import build_optimizer
    from aphantasia_tpu.ops.sampler import CutoutSampler
    from aphantasia_tpu.parallel.spatial import (SpatialFFT,
                                                 build_spatial_train_step)
    from aphantasia_tpu.parallel.step import StepSettings
    from jax.sharding import PartitionSpec as P

    tiny = CLIPConfig("dcn-witness", 32, 32, 2, 32, 16, context_length=16,
                      vocab_size=256, transformer_width=32,
                      transformer_heads=2, transformer_layers=2,
                      vision_heads_override=2)
    clip_model.FUSED_ATTN = False  # custom call is not SPMD-partitionable
    spatial = mesh.shape["spatial"]
    size = (16 * spatial, 64)
    samples = max(2 * mesh.shape["data"], 4)
    clip_params = _put(clip_init(jax.random.PRNGKey(0), tiny), mesh, P())
    spar = SpatialFFT(size, 1.5, 1.8, mesh)
    sampler = CutoutSampler(size, samples, tiny.image_resolution,
                            align="uniform", macro=0.4)
    settings = StepSettings(sim="mix", transform="fast", total_steps=10)
    optimizer = build_optimizer("adam_custom", 0.05)
    step = build_spatial_train_step(spar, sampler, tiny, settings, optimizer)
    gp = spar.shard(spar.init(jax.random.PRNGKey(1), sd=0.01))
    embs = jax.random.normal(jax.random.PRNGKey(2), (1, tiny.embed_dim))
    prompts = ((_put(embs, mesh, P()), _put(jnp.ones((1,)), mesh, P()),
                jnp.float32(-1.0)),)
    prev_enc = _put(jnp.zeros((samples, tiny.embed_dim)), mesh, P("data"))
    out = step(gp, optimizer.init(gp), prev_enc, clip_params, None, None,
               prompts, jax.random.PRNGKey(3), jnp.int32(0))
    params, loss = out[0], out[3]
    digest = jax.jit(
        lambda ps: sum(jnp.sum(jnp.abs(p)) for p in
                       jax.tree_util.tree_leaves(ps)))(params)
    return float(loss), float(digest)


def main(argv=None):
    """Witness worker (see module docstring).  MUST run in a fresh
    process: forces the CPU platform and virtual device count before any
    jax op (the container's axon pin beats JAX_PLATFORMS for bare
    scripts — memory'd axon gotcha).  Optional 6th arg: 'data' (default,
    1-D hosts-outer mesh) or 'spatial' (data x spatial pod layout)."""
    argv = argv if argv is not None else sys.argv[1:]
    rank, world, coord, n_local, out_path = (
        int(argv[0]), int(argv[1]), argv[2], int(argv[3]), argv[4])
    mode = argv[5] if len(argv) > 5 else "data"

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_local)
    if world > 1:
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=world, process_id=rank)

    if mode == "spatial":
        # single-process anchor reproduces the 2-process mesh SHAPE so
        # the digests are comparable program-for-program
        mesh = make_mesh_dcn_spatial(data=2 if world == 1 else None)
        loss, digest = witness_spatial_step(mesh)
    else:
        mesh = make_mesh_dcn()
        loss, digest = witness_step(mesh)
    rec = {"rank": rank, "world": world, "n_devices": len(jax.devices()),
           "n_local": len(jax.local_devices()),
           "mesh": dict(mesh.shape), "loss": loss, "digest": digest}
    with open(out_path, "w") as f:
        json.dump(rec, f)
    print(f"dcn witness {rank}/{world}: loss={loss:.6f} "
          f"digest={digest:.4f} over {rec['n_devices']} devices")
    return 0


if __name__ == "__main__":
    sys.exit(main())
