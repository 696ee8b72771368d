"""Multi-host (DCN) tests: fleet scene fan-out (SURVEY.md §2.6) AND the
r5 DCN-spanning single optimization (parallel/dcn.py — a hosts-outer
`data` axis whose generator-grad psum crosses the process boundary).  The
reference has no distributed code at all."""
import json
import os
import socket
import subprocess
import sys

import pytest

from aphantasia_tpu.parallel.multihost import parse_fleet, shard_scenes


def test_parse_fleet():
    assert parse_fleet("0/1") == (0, 1, None)
    assert parse_fleet("2/4") == (2, 4, None)
    assert parse_fleet("1/2@localhost:1234") == (1, 2, "localhost:1234")
    for bad in ("", "3", "2/2", "-1/2", "a/b", "0/0"):
        with pytest.raises(ValueError):
            parse_fleet(bad)


def test_shard_scenes_round_robin_covers_all():
    # round-robin: every host gets early scenes; union covers everything
    world = 3
    shards = [shard_scenes(10, r, world) for r in range(world)]
    assert shards[0] == [0, 3, 6, 9]
    assert shards[1] == [1, 4, 7]
    assert sorted(sum(shards, [])) == list(range(10))
    assert shard_scenes(2, 5, 8) == []          # more hosts than scenes
    assert shard_scenes(5, 0, 1) == list(range(5))


def test_make_mesh_dcn_hosts_outer_order():
    """Single-process case: one 'data' axis over all local devices, in
    process-grouped order (the hosts-outer property degenerates to plain
    device order with one process)."""
    import jax
    from aphantasia_tpu.parallel.dcn import make_mesh_dcn
    mesh = make_mesh_dcn()
    assert mesh.axis_names == ("data",)
    assert mesh.shape["data"] == len(jax.devices())
    assert list(mesh.devices.ravel()) == list(jax.devices())
    # n_local truncation (each process contributes its first n)
    mesh2 = make_mesh_dcn(n_local=2)
    assert mesh2.shape["data"] == 2
    assert list(mesh2.devices.ravel()) == list(jax.devices())[:2]


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_illustra_fleet_two_processes(tmp_path):
    """Two real JAX processes (coordination service over localhost) render
    one scene each into a shared out_dir; the primary assembles the final
    crossfade once both snapshots exist."""
    scenes = tmp_path / "scenes.txt"
    scenes.write_text("first scene\nsecond scene\n")
    out = tmp_path / "out"
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)),
               APHANTASIA_FLEET_WAIT="180")
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "aphantasia_tpu.cli.illustra",
             "-t", str(scenes), "--size", "48-48", "--steps", "2",
             "--samples", "2", "--save_step", "1", "--lsteps", "2",
             "--aest", "0", "--transform", "none", "-nv",
             "--out_dir", str(out),
             "--fleet", "%d/2@localhost:%d" % (rank, port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for rank in range(2)
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, text in zip(procs, outs):
        assert p.returncode == 0, text[-2000:]
    names = os.listdir(out)
    # one scene per host: 0001-* from rank 0, 0002-* from rank 1
    pts = sorted(f for f in names if f.endswith(".pt"))
    assert len(pts) == 2 and pts[0].startswith("0001-") \
        and pts[1].startswith("0002-")
    # the primary assembled the full crossfade piece
    final_frames = os.listdir(out / "_final")
    assert len([f for f in final_frames if f.endswith(".jpg")]) == 4
    assert any(f.endswith(".mp4") for f in names)
    # the distributed runtime really had 2 processes (not 2 solo jobs)
    assert "scenes [0] of 2" in outs[0]
    assert "scenes [1] of 2" in outs[1]


@pytest.mark.slow
@pytest.mark.parametrize("mode,mesh_shape", [
    ("data", {"data": 8}),
    ("spatial", {"data": 2, "spatial": 4}),
])
def test_dcn_cross_host_psum_parity(tmp_path, mode, mesh_shape):
    """VERDICT r4 item 3: a SINGLE optimization spanning hosts.  Two real
    JAX processes x 4 virtual CPU devices run one deterministic train
    step over the global hosts-outer mesh (the generator-grad psum
    crosses the process boundary); their loss/digest must agree with each
    other AND with the same step on a single-process 8-device mesh.
    mode='spatial' composes DCN with the sharded-canvas axis — the pod
    layout where the FFT-transpose all_to_all stays intra-host."""
    env_base = dict(os.environ,
                    PYTHONPATH=os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))))
    for v in ("XLA_FLAGS", "JAX_PLATFORMS"):  # dcn.main forces its own
        env_base.pop(v, None)

    def run(rank, world, coord, n_local, out):
        return subprocess.Popen(
            [sys.executable, "-m", "aphantasia_tpu.parallel.dcn",
             str(rank), str(world), coord, str(n_local), str(out), mode],
            env=env_base, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)

    # single-process anchor
    p = run(0, 1, "none", 8, tmp_path / "single.json")
    txt = p.communicate(timeout=600)[0].decode()
    assert p.returncode == 0, txt[-2000:]
    single = json.loads((tmp_path / "single.json").read_text())
    assert single["mesh"] == mesh_shape

    # two processes over the localhost coordination service
    port = _free_port()
    procs = [run(r, 2, f"localhost:{port}", 4, tmp_path / f"r{r}.json")
             for r in range(2)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, text in zip(procs, outs):
        assert p.returncode == 0, text[-2000:]
    recs = [json.loads((tmp_path / f"r{r}.json").read_text())
            for r in range(2)]
    for r in recs:
        assert r["n_devices"] == 8 and r["n_local"] == 4
        assert r["mesh"] == mesh_shape
    # both processes executed the same global program
    assert recs[0]["loss"] == recs[1]["loss"]
    assert recs[0]["digest"] == recs[1]["digest"]
    # and the DCN-spanning reduction matches the single-process step
    # (observed bit-exact on CPU; tolerance guards collective-algorithm
    # reassociation on other platforms)
    assert abs(recs[0]["loss"] - single["loss"]) < 1e-5
    assert abs(recs[0]["digest"] - single["digest"]) < 1e-2 * max(
        1.0, abs(single["digest"]))
