"""Streaming video inference (reference BaseManager.demo_infer:690-741).

Host decode (cv2.VideoCapture) -> batched device inference -> colormap ->
cv2.VideoWriter. Unlike the reference's frame-serial bs=1 loop, frames are
batched (`video_batch_size`) and decode/encode overlap device compute via
the pipeline prefetcher.
"""
from __future__ import annotations

import pathlib

import jax.numpy as jnp
import numpy as np

from miccai2021_cataract_semantic_segmentation_tpu.data.dataset import VideoDataset
from miccai2021_cataract_semantic_segmentation_tpu.ops.remap import mask_to_colormap


def _background_batches(gen, depth: int = 2):
    """Decode-ahead on a worker thread, yielding HOST numpy batches.

    Unlike pipeline.Prefetcher this does NOT device_put: the frames must
    stay host-resident (they are written to the output video), and
    round-tripping them through the device would add a device->host
    transfer per batch for data the host already had.

    If the consumer exits early (e.g. a writer raises), a stop event is set
    and the worker's bounded q.put drains via timeout instead of blocking
    forever — repeated calls in a long-lived process don't leak threads or
    decoded-frame memory."""
    import queue
    import threading

    q: queue.Queue = queue.Queue(maxsize=depth)
    err = []
    stop = threading.Event()

    def put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def work():
        try:
            for item in gen:
                if not put(item):
                    return
        except Exception as e:  # noqa: BLE001
            err.append(e)
        finally:
            put(None)

    t = threading.Thread(target=work, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _parallel_batches(video_paths, height, width, chunks, workers: int,
                      frame_counts=None):
    """Decode frame batches on `workers` threads, yielding IN ORDER.

    Each worker thread owns its own VideoDataset (cv2.VideoCapture handles
    are stateful and not thread-safe), so decode scales with host cores —
    cv2 releases the GIL during read/convert/resize. A bounded window of
    futures (workers + 2) keeps decode ahead of the consumer without
    unbounded frame memory. `chunks` is a list of (frame_indices, n_valid)
    batch descriptors. `frame_counts` is the caller's probed per-video
    counts — the per-thread readers must reuse them so their index->frame
    mapping matches the offsets the chunks were built from (and so N
    threads don't re-open and re-probe every container at startup)."""
    import itertools
    import threading
    from concurrent.futures import ThreadPoolExecutor
    from collections import deque

    from miccai2021_cataract_semantic_segmentation_tpu.data.dataset import (
        VideoDataset)

    tls = threading.local()

    def decode(chunk):
        indices, n_valid = chunk
        ds = getattr(tls, "ds", None)
        if ds is None:
            ds = tls.ds = VideoDataset(video_paths, height, width,
                                       frame_counts=frame_counts)
        frames, vids = [], []
        for j in indices:
            frame, _, vid = ds[int(j)]
            frames.append(frame)
            vids.append(vid)
        return np.stack(frames), np.asarray(vids), n_valid

    with ThreadPoolExecutor(max_workers=workers) as pool:
        it = iter(chunks)
        window = deque(pool.submit(decode, c)
                       for c in itertools.islice(it, workers + 2))
        while window:
            fut = window.popleft()
            nxt = next(it, None)
            if nxt is not None:
                window.append(pool.submit(decode, nxt))
            yield fut.result()


def discover_videos(data_path: str, video_ids: list[str]) -> list[pathlib.Path]:
    """workflow/test/dev*.mp4 discovery (BaseManager.py:157-184)."""
    root = pathlib.Path(data_path).parent / "workflow" / "test"
    out = []
    for p in sorted(root.glob("**/*.mp4")):
        if p.stem in video_ids:
            out.append(p)
    return out


def demo_infer(trainer, video_paths: list[str] | None = None,
               side_by_side: bool | None = None, frame_freq: int | None = None,
               batch_size: int = 8, fps: int = 30,
               decode_workers: int | None = None):
    """Run segmentation over videos, writing colour-mapped .avi outputs.

    Mode semantics follow the reference (BaseManager.py:148-188, 690-741):
    `demo_video_inference` writes input|prediction side-by-side unless the
    config has the 'miccai_demo' key (prediction-only); `video_inference`
    writes prediction-only videos. `frame_freq` (config 'demo_frame_freq')
    strides frame ids *within each video* (BaseManager.py:175-176), and
    every selected frame is processed — the tail partial batch is padded,
    not dropped.

    Host decode runs on `decode_workers` threads (config
    'video_decode_workers', default min(4, cpu_count)) with per-thread
    capture handles, overlapping the device step and the encoder writes —
    decode throughput scales with host cores (PERF.md §5)."""
    cfg = trainer.config
    if side_by_side is None:
        side_by_side = (cfg.get("mode", "demo_video_inference")
                        == "demo_video_inference") and "miccai_demo" not in cfg
    if frame_freq is None:
        frame_freq = int(cfg.get("demo_frame_freq", 1))
    if video_paths is None:
        video_paths = discover_videos(cfg["data_path"], cfg.get("video_ids", []))
    assert video_paths, "no videos found/given for video inference"

    height = int(cfg.get("video_height", 540))
    width = int(cfg.get("video_width", 960))
    ds = VideoDataset(video_paths, height, width)
    # per-video stride (frame_ids[0::freq] per capture, BaseManager.py:175-176)
    indices = np.concatenate([
        np.arange(ds.offsets[v], ds.offsets[v + 1], frame_freq)
        for v in range(len(video_paths))]).astype(np.int64)
    fourcc = cv2.VideoWriter_fourcc(*"XVID")
    writers = {}
    for vid, path in enumerate(video_paths):
        shape = (2 * width, height) if side_by_side else (width, height)
        out = trainer.run_dir / f"{pathlib.Path(path).stem}_" \
            f"{cfg.get('graph', {}).get('model', 'model')}.avi"
        writers[vid] = cv2.VideoWriter(str(out), fourcc, fps, shape)

    if decode_workers is None:
        import os
        decode_workers = int(cfg.get("video_decode_workers",
                                     min(4, os.cpu_count() or 1)))
    chunks = []
    for i in range(0, len(indices), batch_size):
        chunk = indices[i:i + batch_size]
        n_valid = len(chunk)
        if n_valid < batch_size:  # pad tail to the static batch shape
            chunk = np.concatenate(
                [chunk, np.full(batch_size - n_valid, chunk[-1])])
        chunks.append((chunk, n_valid))

    state = trainer.state
    eval_step = trainer.eval_step
    n_frames = 0
    dummy_lbl = np.zeros((batch_size, height, width), np.uint8)

    import jax

    @jax.jit
    def to_pred_u8(logits):
        """argmax + uint8 cast ON DEVICE: the class-id map is what crosses
        the device->host link (4 bytes/pixel of i32 argmax would be 4x the
        traffic; full logits 68x). The reflect-pad rows are cropped on the
        HOST — returning a non-tile-aligned slice from jit gives the fetch
        path a layout it linearises pathologically slowly."""
        return jnp.argmax(logits, -1).astype(jnp.uint8)

    def flush(pred_dev, frames_np, vids, n_valid):
        nonlocal n_frames
        preds = np.asarray(pred_dev)
        off = (preds.shape[1] - height) // 2
        if off:
            preds = preds[:, off:off + height]
        for k in range(n_valid):
            colour = mask_to_colormap(preds[k], trainer.task)
            if side_by_side:
                out_img = np.concatenate([frames_np[k], colour], axis=1)
            else:
                out_img = colour
            writers[int(vids[k])].write(cv2.cvtColor(out_img, cv2.COLOR_RGB2BGR))
            n_frames += 1

    if decode_workers > 1:
        batch_iter = _parallel_batches(video_paths, height, width, chunks,
                                       decode_workers,
                                       frame_counts=ds.frame_counts)
    else:
        def serial():
            for chunk, n_valid in chunks:
                frames, vids = [], []
                for j in chunk:
                    frame, _, vid = ds[int(j)]
                    frames.append(frame)
                    vids.append(vid)
                yield np.stack(frames), np.asarray(vids), n_valid

        batch_iter = _background_batches(serial(), depth=2)

    pending = None
    try:
        for frames, vids, n_valid in batch_iter:
            # frames are host numpy; jit moves them H2D, only the uint8 class
            # map comes back
            logits, _, _ = eval_step(state, frames, dummy_lbl)
            pred_dev = to_pred_u8(logits)
            if pending is not None:
                flush(*pending)   # overlaps host work with the in-flight step
            pending = (pred_dev, frames, vids, n_valid)
        if pending is not None:
            flush(*pending)
    finally:
        for w in writers.values():
            w.release()
    print(f"[video] wrote {n_frames} frames across {len(writers)} videos "
          f"to {trainer.run_dir}")
    return n_frames
