"""Host-side A/B of the frame writer's encode-stage width (VERDICT r4
item 7).  Feeds the writer pre-pulled 720p uint8 frames (pure host path —
no device, so this measures exactly the encode+commit stage the pool
widens) and times the drain for N encoders.

Run: python scripts/bench_writer_pool.py [--frames 120] [--workers 1,2,4]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(n_workers: int, frames, chunk: int) -> float:
    from aphantasia_tpu.io.media import AsyncFrameWriter
    os.environ["APHANTASIA_WRITER_ENCODERS"] = str(n_workers)
    td = tempfile.mkdtemp(prefix="wpool")
    try:
        t0 = time.perf_counter()
        with AsyncFrameWriter() as w:
            for c in range(0, len(frames), chunk):
                w.save_batch(
                    [os.path.join(td, "%05d.jpg" % (c + j))
                     for j in range(min(chunk, len(frames) - c))],
                    frames[c:c + chunk])
        dt = time.perf_counter() - t0
        n = len(os.listdir(td))
        assert n == len(frames), (n, len(frames))
        return len(frames) * 60.0 / dt
    finally:
        shutil.rmtree(td, ignore_errors=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--workers", default="1,2,4")
    ap.add_argument("--repeats", type=int, default=3)
    a = ap.parse_args(argv)
    import numpy as np
    rs = np.random.RandomState(0)
    # natural-ish content (pure noise overstates encode cost ~2x)
    coarse = rs.randint(0, 255, (a.frames, 45, 80, 3), np.uint8)
    frames = np.repeat(np.repeat(coarse, 16, axis=1), 16, axis=2)

    out = {"host_cores": os.cpu_count(), "frames": a.frames,
           "size": "1280x720", "rates_f_min": {}}
    for n in (int(x) for x in a.workers.split(",")):
        rates = [round(run_one(n, frames, a.chunk), 1)
                 for _ in range(a.repeats)]
        out["rates_f_min"][str(n)] = rates
        print(f" N={n}: {rates} f/min", flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
