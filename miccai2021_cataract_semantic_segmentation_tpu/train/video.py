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
from miccai2021_cataract_semantic_segmentation_tpu.data.pipeline import Prefetcher
from miccai2021_cataract_semantic_segmentation_tpu.ops.remap import mask_to_colormap

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def discover_videos(data_path: str, video_ids: list[str]) -> list[pathlib.Path]:
    """workflow/test/dev*.mp4 discovery (BaseManager.py:157-184)."""
    root = pathlib.Path(data_path).parent / "workflow" / "test"
    out = []
    for p in sorted(root.glob("**/*.mp4")):
        if p.stem in video_ids:
            out.append(p)
    return out


def demo_infer(trainer, video_paths: list[str] | None = None,
               side_by_side: bool = True, frame_freq: int = 1,
               batch_size: int = 8, fps: int = 30):
    """Run segmentation over videos, writing colour-mapped .avi outputs.

    `side_by_side=True` concatenates input|prediction horizontally
    (BaseManager.py:165-169 'miccai_demo' switch inverted)."""
    cfg = trainer.config
    if video_paths is None:
        video_paths = discover_videos(cfg["data_path"], cfg.get("video_ids", []))
    assert video_paths, "no videos found/given for video inference"

    height = int(cfg.get("video_height", 540))
    width = int(cfg.get("video_width", 960))
    ds = VideoDataset(video_paths, height, width)
    indices = np.arange(0, len(ds), frame_freq)
    fourcc = cv2.VideoWriter_fourcc(*"XVID")
    writers = {}
    for vid, path in enumerate(video_paths):
        shape = (2 * width, height) if side_by_side else (width, height)
        out = trainer.run_dir / f"{pathlib.Path(path).stem}_" \
            f"{cfg.get('graph', {}).get('model', 'model')}.avi"
        writers[vid] = cv2.VideoWriter(str(out), fourcc, fps, shape)

    def batches():
        for i in range(0, len(indices) - batch_size + 1, batch_size):
            chunk = indices[i:i + batch_size]
            frames, vids = [], []
            for j in chunk:
                frame, _, vid = ds[int(j)]
                frames.append(frame)
                vids.append(vid)
            yield np.stack(frames), np.asarray(vids)

    state = trainer.state
    eval_step = trainer.eval_step
    n_frames = 0
    dummy_lbl = np.zeros((batch_size, height, width), np.uint8)
    for frames, vids in Prefetcher(batches(), depth=2):
        logits, _, _ = eval_step(state, frames, dummy_lbl)
        preds = np.asarray(jnp.argmax(logits, -1))
        # the valid pipeline may reflect-pad the height; crop symmetrically
        off = (preds.shape[1] - height) // 2
        for k in range(len(frames)):
            pred = preds[k][off:off + height] if off else preds[k]
            colour = mask_to_colormap(pred, trainer.task)
            if side_by_side:
                out_img = np.concatenate([np.asarray(frames[k]), colour], axis=1)
            else:
                out_img = colour
            writers[int(vids[k])].write(cv2.cvtColor(out_img, cv2.COLOR_RGB2BGR))
            n_frames += 1
    for w in writers.values():
        w.release()
    print(f"[video] wrote {n_frames} frames across {len(writers)} videos "
          f"to {trainer.run_dir}")
    return n_frames
