"""Image / frame / video I/O.

Parity targets: reference aphantasia/utils.py:44-100 (file lists, img_read,
img_save, checkout, cvshow).  Video assembly replaces the reference's
`os.system('ffmpeg ...')` shell-outs (clip_fft.py:312 etc.) with a muxer
chain: ffmpeg binary if present -> cv2.VideoWriter -> pure-Python MJPEG/AVI
fallback (io/avi.py), so runs never silently lose their frames.
"""
from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np


def basename(file):
    return os.path.splitext(os.path.basename(file))[0]


def file_list(path, ext=None, subdir=None):
    """Sorted file listing (reference utils.py:47-59)."""
    if subdir is True:
        files = [os.path.join(dp, f) for dp, dn, fn in os.walk(path) for f in fn]
    else:
        files = [os.path.join(path, f) for f in os.listdir(path)]
    if ext is not None:
        if isinstance(ext, list):
            files = [f for f in files if os.path.splitext(f.lower())[1][1:] in ext]
        elif isinstance(ext, str):
            files = [f for f in files if f.endswith(ext)]
    return sorted([f for f in files if os.path.isfile(f)])


def img_list(path, subdir=None):
    if subdir is True:
        files = [os.path.join(dp, f) for dp, dn, fn in os.walk(path) for f in fn]
    else:
        files = [os.path.join(path, f) for f in os.listdir(path)]
    files = [f for f in files
             if os.path.splitext(f.lower())[1][1:] in ["jpg", "jpeg", "png", "ppm", "tif"]]
    return sorted([f for f in files if os.path.isfile(f)])


def img_read(path) -> np.ndarray:
    """Read image -> HWC RGB uint8-ish array (reference utils.py:69-77)."""
    from imageio.v2 import imread
    img = imread(path)
    if img.ndim == 2 or img.shape[2] == 1:
        img = np.dstack((img, img, img))
    if img.shape[2] == 4:
        img = img[:, :, :3]
    return img


def encode_image_bytes(img, ext: str) -> bytes:
    """In-memory raster encode (r5): imageio's file-URI path carries
    ~3.3x per-call overhead over encoding to a BytesIO and writing the
    bytes ourselves (measured 0.34 vs 0.10 s / 30 720p JPEGs on the CI
    host; output bytes verified identical for jpg+png).  Used by
    img_save and the AsyncFrameWriter encode stage."""
    import io as _io
    from imageio.v2 import imsave
    buf = _io.BytesIO()
    imsave(buf, img, format=ext)
    return buf.getvalue()


def img_save(path, img, norm=True):
    img = np.asarray(img)
    if norm is True and not np.issubdtype(img.dtype, np.integer):
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    ext = os.path.splitext(str(path))[1].lower()
    if ext in (".jpg", ".jpeg", ".png", ".bmp"):
        with open(path, "wb") as f:
            f.write(encode_image_bytes(img, ext))
    else:
        from imageio.v2 import imsave
        imsave(path, img)


def cvshow(img):
    """Live preview window when a display is available; no-op headless."""
    if os.environ.get("DISPLAY") is None:
        return
    try:
        import cv2
        img = np.asarray(img)
        if img.shape[0] > 720 or img.shape[1] > 1280:
            x_ = 1280 / img.shape[1]
            y_ = 720 / img.shape[0]
            psize = tuple(int(s * min(x_, y_)) for s in img.shape[:2][::-1])
            img = cv2.resize(img, psize)
        cv2.imshow("t", img[:, :, ::-1])
        cv2.waitKey(1)
    except Exception:
        pass


def checkout(img, fname=None, verbose=False):
    """CHW float [0..1] -> HWC uint8 JPEG + optional preview
    (reference utils.py:94-100)."""
    img = np.transpose(np.asarray(img), (1, 2, 0))
    if verbose is True:
        cvshow(img)
    if fname is not None:
        from imageio.v2 import imsave
        img = np.clip(img * 255, 0, 255).astype(np.uint8)
        imsave(fname, img)


def frames_to_video(frame_dir: str, out_path: str, pattern: str = "%04d.jpg",
                    fps: int = 25) -> str | None:
    """Assemble numbered JPEG frames into a video.

    Tries: ffmpeg binary -> cv2.VideoWriter(mp4) -> pure-Python MJPEG AVI.
    Returns the path actually written, or None when no frames exist.
    """
    frames = img_list(frame_dir)
    if not frames:
        return None
    if shutil.which("ffmpeg"):
        cmd = ["ffmpeg", "-v", "warning", "-y", "-framerate", str(fps),
               "-i", os.path.join(frame_dir, pattern), out_path]
        if subprocess.run(cmd, check=False).returncode == 0:
            return out_path
    try:
        import cv2
        first = img_read(frames[0])
        h, w = first.shape[:2]
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        vw = cv2.VideoWriter(out_path, fourcc, fps, (w, h))
        if vw.isOpened():
            for f in frames:
                vw.write(img_read(f)[:, :, ::-1])
            vw.release()
            return out_path
    except Exception:
        pass
    from aphantasia_tpu.io.avi import write_mjpeg_avi
    avi_path = os.path.splitext(out_path)[0] + ".avi"
    write_mjpeg_avi(avi_path, frames, fps=fps)
    return avi_path


def plot_text(txt, size=224):
    """Render text to an image via matplotlib (reference utils.py:18-27)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(1, 1), dpi=size)
    fontsize = size // len(txt) if len(txt) < 15 else 8
    plt.text(0.5, 0.5, txt, fontsize=fontsize, ha="center", va="center",
             wrap=True)
    plt.axis("off")
    fig.tight_layout(pad=0)
    fig.canvas.draw()
    img = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
    img = img.reshape(fig.canvas.get_width_height()[::-1] + (4,))[:, :, :3]
    plt.close(fig)
    return img.copy()


class AsyncFrameWriter:
    """Overlap frame output with training (SURVEY.md §7 M5 "host-async
    frame writing").

    The per-step frame save is device->host transfer + JPEG encode + disk —
    on a tunneled TPU with one host core this dominated CLI wall time
    (a default 200-step 720p render spent ~3x its compute time in frame
    I/O).  `save()` enqueues the DEVICE array and returns immediately; a
    PULL thread transfers device->host (strictly one transfer in flight)
    and feeds an ENCODE thread that tone-maps + JPEG-encodes + writes —
    the two stages overlap (r4: 182 vs 212-244 ms/frame serial), FIFO
    order preserved.  The bounded queue (device arrays stay alive inside
    it) applies back-pressure if the writer falls behind.  Call `close()`
    (or use as a context manager) before assembling video.
    """

    def __init__(self, cap_bytes: int = 256_000_000):
        import queue
        import threading
        # back-pressure is counted in BYTES, not items or frames: a
        # save_batch chunk at 4K holds ~25MB per frame, so an item- or
        # frame-count bound alone could let ~800MB of pending arrays pile
        # up (VERDICT r1 item 10). An oversized single chunk is admitted
        # only when the pipeline is empty, so it can never deadlock.
        #
        # TWO pipelined stages (r4): the device->host pull (network-bound,
        # 131 ms/720p-frame on the tunnel) and the tone+JPEG+fs write
        # (CPU-bound, GIL-releasing) previously serialized in one thread
        # at ~192 ms/frame; a dedicated pull thread feeding an encode
        # thread overlaps them while keeping exactly ONE transfer in
        # flight (concurrent pulls degrade the tunneled runtime — see the
        # _worker_pull NOTE).  FIFO order is preserved end to end.
        import os
        self._q = queue.Queue()
        self._q2 = queue.Queue(maxsize=4)      # pulled, awaiting encode
        self._cap = cap_bytes
        self._cv = threading.Condition()
        self._inflight = 0                     # bytes enqueued, not yet written
        self._err = None
        # pipelined is the DEFAULT since the r4 same-session A/B with a
        # drift control: pipelined 182 ms/frame vs serial 244/212 (before/
        # after) at 720p on the tunneled chip — the encode hides under the
        # next frame's transfer (docs/TPU_MEASUREMENTS_r4.md §9).  Opt out
        # with APHANTASIA_WRITER_PIPELINED=0.
        self._pipelined = os.environ.get(
            "APHANTASIA_WRITER_PIPELINED", "1") == "1"
        # encode-stage width (r5, VERDICT item 7): the r4 decomposition
        # put the writer at ~312 f/min vs the frame program's 719 — on a
        # PCIe host the JPEG encode is the bound.  N>1 fans the encode
        # out to a worker pool (in-memory JPEG; PIL releases the GIL
        # during compression) feeding ONE commit thread that writes files
        # strictly in sequence order (FIFO preserved end to end).
        # Default = one encoder per spare core, capped at 4 — chosen by
        # measurement (docs/TPU_MEASUREMENTS_r5.md §3): on the 1-core CI
        # host the pool machinery LOSES (12-16k vs 17.7k f/min at N=1),
        # so it only widens where spare cores exist.  The A/B's real
        # finding was a 3.3x per-call overhead in imageio's file-URI
        # path, now bypassed for every mode via encode_image_bytes.
        # Override: APHANTASIA_WRITER_ENCODERS=N.
        n_env = os.environ.get("APHANTASIA_WRITER_ENCODERS")
        self._n_enc = int(n_env) if n_env else max(
            1, min(4, (os.cpu_count() or 1) - 1))
        if self._pipelined:
            self._thread = threading.Thread(target=self._worker_pull,
                                            daemon=True)
            if self._n_enc > 1:
                self._seq = 0                  # task sequence (pull thread)
                self._commit_q = queue.Queue()
                self._enc_threads = [
                    threading.Thread(target=self._worker_encode_pool,
                                     daemon=True)
                    for _ in range(self._n_enc)]
                self._thread2 = threading.Thread(target=self._worker_commit,
                                                 daemon=True)
                for t in self._enc_threads:
                    t.start()
            else:
                self._thread2 = threading.Thread(target=self._worker_encode,
                                                 daemon=True)
            self._thread2.start()
        else:
            self._thread = threading.Thread(target=self._worker_serial,
                                            daemon=True)
        self._thread.start()

    @staticmethod
    def _nbytes(arr) -> int:
        try:
            return int(arr.nbytes)
        except Exception:
            shape = getattr(arr, "shape", None)
            if not shape:
                return 1
            n = 1
            for s in shape:
                n *= int(s)
            return n  # uint8 assumption; frames are uint8 by contract

    def _admit(self, nbytes: int):
        with self._cv:
            while self._inflight > 0 and self._inflight + nbytes > self._cap:
                self._cv.wait()
            self._inflight += nbytes

    def _release(self, nbytes: int):
        with self._cv:
            self._inflight -= nbytes
            self._cv.notify_all()

    def _worker_serial(self):
        import numpy as np
        while True:
            item = self._q.get()
            if item is None:
                return
            path, arr, tone, nbytes = item
            try:
                # NOTE: plain transfer only — see _worker_pull
                arr = np.asarray(arr)
                if isinstance(path, list):     # save_batch chunk
                    for i, p in enumerate(path):
                        f = arr[i] if tone is None else tone(arr[i])
                        img_save(p, f)
                else:
                    if tone is not None:
                        arr = tone(arr)
                    img_save(path, arr)
            except Exception as e:             # surfaced by close()
                self._err = e
            finally:
                self._release(nbytes)

    def _worker_pull(self):
        import numpy as np
        pool = self._n_enc > 1
        while True:
            item = self._q.get()
            if item is None:
                if pool:                       # one sentinel per encoder
                    for _ in range(self._n_enc):
                        self._q2.put(None)
                else:
                    self._q2.put(None)         # propagate shutdown in order
                return
            path, arr, tone, nbytes = item
            try:
                # NOTE: keep this a plain transfer — issuing device COMPUTE
                # (e.g. stacking frames to batch the pull) from this thread
                # serializes against the main thread's dispatches on the
                # tunneled runtime and made runs ~4x slower
                arr = np.asarray(arr)          # device->host off the main thread
            except Exception as e:             # surfaced by close()
                self._err = e
                self._release(nbytes)
                continue
            if not pool:
                self._q2.put((path, arr, tone, nbytes))
                continue
            # pool mode: explode into per-frame tasks so one chunk spreads
            # across encoders; byte budget split exactly across frames
            paths = path if isinstance(path, list) else [path]
            frames = arr if isinstance(path, list) else arr[None]
            share = nbytes // len(paths)
            for i, p in enumerate(paths):
                nb = nbytes - share * (len(paths) - 1) if i == 0 else share
                self._q2.put((self._seq, p, frames[i], tone, nb))
                self._seq += 1

    def _worker_encode_pool(self):
        """Pool encoder: tone-map + JPEG-encode to BYTES in memory (PIL
        releases the GIL during compression), hand off to the commit
        thread.  Never touches the filesystem — ordering lives in the
        commit stage."""
        while True:
            item = self._q2.get()
            if item is None:
                self._commit_q.put(None)       # this encoder is drained
                return
            seq, path, frame, tone, nbytes = item
            try:
                if tone is not None:
                    frame = tone(frame)
                ext = os.path.splitext(str(path))[1] or ".jpg"
                self._commit_q.put(
                    (seq, path, encode_image_bytes(frame, ext), nbytes))
            except Exception as e:             # surfaced by close()
                self._err = e
                self._commit_q.put((seq, path, None, nbytes))

    def _worker_commit(self):
        """Single committer: writes encoded frames to disk strictly in
        sequence order (FIFO preserved end to end) and releases the byte
        budget.  Exits once every encoder has drained."""
        pending = {}
        next_seq = 0
        eofs = 0
        while eofs < self._n_enc:
            item = self._commit_q.get()
            if item is None:
                eofs += 1
                continue
            seq, path, data, nbytes = item
            pending[seq] = (path, data, nbytes)
            while next_seq in pending:
                p, d, nb = pending.pop(next_seq)
                try:
                    if d is not None:
                        with open(p, "wb") as f:
                            f.write(d)
                except Exception as e:         # surfaced by close()
                    self._err = e
                finally:
                    self._release(nb)
                next_seq += 1
        # all encoders drained -> everything enqueued has been received;
        # flush any tail left by an errored/missing sequence defensively
        for seq in sorted(pending):
            p, d, nb = pending.pop(seq)
            try:
                if d is not None:
                    with open(p, "wb") as f:
                        f.write(d)
            except Exception as e:
                self._err = e
            finally:
                self._release(nb)

    def _worker_encode(self):
        while True:
            item = self._q2.get()
            if item is None:
                return
            path, arr, tone, nbytes = item
            try:
                if isinstance(path, list):     # save_batch chunk
                    for i, p in enumerate(path):
                        f = arr[i] if tone is None else tone(arr[i])
                        img_save(p, f)
                else:
                    if tone is not None:
                        arr = tone(arr)
                    img_save(path, arr)
            except Exception as e:             # surfaced by close()
                self._err = e
            finally:
                self._release(nbytes)

    def save(self, path, device_array, tone=None):
        """Enqueue a frame; `tone(np_uint8_array) -> np_uint8_array` runs in
        the worker (the CLIs' empirical tone maps, clip_fft.py:300-304)."""
        if self._err:
            raise self._err
        nbytes = self._nbytes(device_array)
        self._admit(nbytes)
        self._q.put((path, device_array, tone, nbytes))

    def save_batch(self, paths, stacked, tone=None):
        """Enqueue a chunk: `stacked` is ONE device array [N,H,W,3] from a
        chunked dispatch (parallel/step.py:build_train_loop_frames); the
        worker pulls it in a single transfer and writes len(paths) frames.
        Per-frame device slicing on the main thread would cost a dispatch
        each — the whole point of chunking is avoiding those."""
        if self._err:
            raise self._err
        paths = list(paths)
        if not paths:
            return    # empty chunk: nothing to admit (pool explode divides
        nbytes = self._nbytes(stacked)  # the byte budget by len(paths))
        self._admit(nbytes)
        self._q.put((paths, stacked, tone, nbytes))

    def close(self):
        self._q.put(None)
        self._thread.join()        # (pipelined: pull stage forwards sentinel)
        if self._pipelined:
            if self._n_enc > 1:
                for t in self._enc_threads:
                    t.join()       # encoders drain their task shares
            self._thread2.join()   # encode/commit stage drains
        if self._err:
            raise self._err

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
