"""AsyncFrameWriter: correctness + byte-bounded back-pressure.

VERDICT r1 item 10: the writer queue must be bounded by BYTES, not item
count — at 4K a 16-item bound could hold ~800MB of pending arrays.
"""
import os
import threading
import time

import numpy as np

from aphantasia_tpu.io.media import AsyncFrameWriter


def test_save_and_save_batch_write_frames(tmp_path):
    rs = np.random.RandomState(0)
    one = rs.randint(0, 255, (32, 48, 3), dtype=np.uint8)
    batch = rs.randint(0, 255, (3, 32, 48, 3), dtype=np.uint8)
    with AsyncFrameWriter() as w:
        w.save(str(tmp_path / "a.jpg"), one)
        w.save_batch([str(tmp_path / ("b%d.jpg" % i)) for i in range(3)],
                     batch)
    names = sorted(os.listdir(tmp_path))
    assert names == ["a.jpg", "b0.jpg", "b1.jpg", "b2.jpg"]


def test_tone_map_applied_in_worker(tmp_path):
    frame = np.full((8, 8, 3), 100, np.uint8)
    seen = []

    def tone(f):
        seen.append(f.copy())
        return np.zeros_like(f)

    with AsyncFrameWriter() as w:
        w.save(str(tmp_path / "t.jpg"), frame, tone)
    assert len(seen) == 1 and seen[0].max() == 100
    from aphantasia_tpu.io.media import img_read
    assert img_read(str(tmp_path / "t.jpg")).max() <= 20  # jpeg-lossy zero


def test_byte_bound_blocks_oversized_backlog(tmp_path):
    """Synthetic 4K chunks: with a ~1.5-chunk byte cap, the third enqueue
    must block until the worker drains one, keeping in-flight bytes under
    cap + one chunk at all times."""
    chunk = np.zeros((2, 2160, 3840, 3), np.uint8)       # ~49.8MB
    cap = int(chunk.nbytes * 1.5)
    release = threading.Event()

    def slow_tone(f):
        release.wait(timeout=30)
        return f

    w = AsyncFrameWriter(cap_bytes=cap)
    peak = []

    def producer():
        for c in range(3):
            w.save_batch(
                [str(tmp_path / ("c%d_%d.jpg" % (c, j))) for j in range(2)],
                chunk, slow_tone)
            with w._cv:
                peak.append(w._inflight)

    t = threading.Thread(target=producer)
    t.start()
    time.sleep(1.0)
    # first chunk admitted + in the worker, second admitted, third blocked
    assert t.is_alive(), "third oversized chunk should be back-pressured"
    with w._cv:
        assert w._inflight <= cap
    release.set()
    t.join(timeout=60)
    assert not t.is_alive()
    w.close()
    assert max(peak) <= cap
    assert len(os.listdir(tmp_path)) == 6


def test_oversized_single_chunk_admitted_when_empty(tmp_path):
    """A single chunk larger than the cap must not deadlock — it is
    admitted when nothing else is in flight."""
    chunk = np.zeros((4, 2160, 3840, 3), np.uint8)       # ~100MB
    with AsyncFrameWriter(cap_bytes=chunk.nbytes // 2) as w:
        w.save_batch(
            [str(tmp_path / ("f%d.jpg" % j)) for j in range(4)], chunk)
    assert len(os.listdir(tmp_path)) == 4


def test_encoder_pool_writes_all_frames_in_order(tmp_path, monkeypatch):
    """r5 (VERDICT item 7): APHANTASIA_WRITER_ENCODERS=3 fans the encode
    stage to a pool feeding one ordered committer.  All frames (batch +
    singles, interleaved) must land with correct content, FIFO order on
    disk (mtime-nondecreasing by sequence), and tone applied per frame."""
    monkeypatch.setenv("APHANTASIA_WRITER_ENCODERS", "3")
    # distinct constant frames: JPEG-robust AND detects any frame<->path
    # swap introduced by the pool
    frames = np.stack([np.full((24, 32, 3), 30 * i, np.uint8)
                       for i in range(6)])
    paths = [str(tmp_path / ("f%d.jpg" % i)) for i in range(8)]
    w = AsyncFrameWriter()
    assert w._n_enc == 3 and len(w._enc_threads) == 3
    w.save(paths[0], np.full((24, 32, 3), 250, np.uint8))
    w.save_batch(paths[1:7], frames)
    w.save(paths[7], frames[5], tone=lambda f: np.zeros_like(f))
    w.close()
    from aphantasia_tpu.io.media import img_read
    assert sorted(os.listdir(tmp_path)) == [f"f{i}.jpg" for i in range(8)]
    assert img_read(paths[0]).mean() > 240
    for i in range(6):                          # no frame<->path swaps
        assert abs(float(img_read(paths[1 + i]).mean()) - 30 * i) < 6, i
    assert img_read(paths[7]).max() <= 20      # tone ran in the pool
    # FIFO commit: sequence order == write order
    times = [os.path.getmtime(p) for p in paths]
    assert times == sorted(times)


def test_encoder_pool_error_propagates(tmp_path, monkeypatch):
    monkeypatch.setenv("APHANTASIA_WRITER_ENCODERS", "2")
    import pytest as _pytest
    w = AsyncFrameWriter()

    def bad_tone(f):
        raise RuntimeError("encode boom")

    w.save(str(tmp_path / "x.jpg"),
           np.zeros((8, 8, 3), np.uint8), tone=bad_tone)
    with _pytest.raises(RuntimeError, match="encode boom"):
        w.close()
    with w._cv:                      # byte budget released despite error
        assert w._inflight == 0


def test_pure_avi_fallback_writes_readable_mjpeg(tmp_path, monkeypatch):
    """The last link of the muxer chain (io/avi.py): with ffmpeg and cv2
    unavailable, frames_to_video writes a pure-Python MJPEG AVI whose RIFF
    structure and frame count check out."""
    import shutil as _shutil
    import struct
    from aphantasia_tpu.io.media import frames_to_video, img_save

    for i in range(3):
        img_save(str(tmp_path / f"{i:04d}.jpg"),
                 np.full((32, 48, 3), 40 * i, np.uint8))
    monkeypatch.setattr(_shutil, "which", lambda *_: None)  # no ffmpeg
    import builtins
    real_import = builtins.__import__

    def no_cv2(name, *a, **k):
        if name == "cv2":
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_cv2)
    out = frames_to_video(str(tmp_path), str(tmp_path / "out.mp4"))
    assert out.endswith(".avi") and os.path.isfile(out)
    data = open(out, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8  # RIFF size
    assert data.count(b"00dc") >= 3      # one video chunk per frame (+index)


def test_frames_to_video_no_frames_returns_none(tmp_path):
    from aphantasia_tpu.io.media import frames_to_video
    assert frames_to_video(str(tmp_path), str(tmp_path / "o.mp4")) is None
