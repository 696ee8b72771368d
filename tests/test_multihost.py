"""Multi-host (DCN) fleet tests — scene fan-out (SURVEY.md §2.6 'Multi-host'
row: DCN only for independent-scene fleet rendering; the reference has no
distributed code at all)."""
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
