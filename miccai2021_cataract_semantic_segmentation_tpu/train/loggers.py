"""Observability: TensorBoard scalars/images/figures + profiler hooks.

Mirrors the reference's per-phase SummaryWriters (BaseManager.py:121-122)
with a graceful JSONL fallback when tensorboard isn't importable. Figures
(confusion-matrix heatmaps, sample-index histograms) are rendered with
matplotlib when available.

Profiling (SURVEY.md §5 tracing): `profile_steps` wraps a step range in a
jax.profiler trace whose artifacts land under <run_dir>/profile.
"""
from __future__ import annotations

import contextlib
import json
import pathlib
import time

import numpy as np


class TBLogger:
    def __init__(self, log_dir: str | pathlib.Path):
        self.log_dir = pathlib.Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._w = SummaryWriter(str(self.log_dir))
            self._jsonl = None
        except Exception:
            self._w = None
            self._jsonl = open(self.log_dir / "scalars.jsonl", "a")

    def scalar(self, tag: str, value, step: int):
        v = float(np.asarray(value))
        if self._w is not None:
            self._w.add_scalar(tag, v, step)
        else:
            self._jsonl.write(json.dumps({"tag": tag, "value": v, "step": step,
                                          "t": time.time()}) + "\n")
            self._jsonl.flush()

    def scalars(self, values: dict, step: int, prefix: str = ""):
        for k, v in values.items():
            if np.asarray(v).ndim == 0:
                self.scalar(f"{prefix}{k}", v, step)

    def image(self, tag: str, img_hwc_u8: np.ndarray, step: int):
        if self._w is not None:
            self._w.add_image(tag, img_hwc_u8, step, dataformats="HWC")

    def figure(self, tag: str, fig, step: int):
        if self._w is not None and fig is not None:
            self._w.add_figure(tag, fig, step)

    def flush(self):
        if self._w is not None:
            self._w.flush()

    def close(self):
        if self._w is not None:
            self._w.close()
        if self._jsonl is not None:
            self._jsonl.close()


def confusion_matrix_figure(matrix: np.ndarray, task: int):
    """Heatmap figure of a normalised confusion matrix
    (utils/utils.py:214-222 get_matrix_fig equivalent)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    from miccai2021_cataract_semantic_segmentation_tpu import taxonomy
    labels = list(taxonomy.TASK_CLASS_NAMES[task])
    if matrix.shape[0] > len(labels):
        labels = labels + ["Ignore"]
    n = matrix.shape[0]
    fig, ax = plt.subplots(figsize=(0.45 * n + 2, 0.45 * n + 2))
    im = ax.imshow(matrix, cmap="YlGn", vmin=0, vmax=1)
    ax.set_xticks(range(n), labels[:n], rotation=90, fontsize=6)
    ax.set_yticks(range(n), labels[:n], fontsize=6)
    fig.colorbar(im, ax=ax, fraction=0.046)
    for i in range(n):
        for j in range(n):
            if matrix[i, j] > 0.005:
                ax.text(j, i, f"{matrix[i, j]:.2f}", ha="center", va="center",
                        fontsize=5,
                        color="white" if matrix[i, j] > 0.6 else "black")
    fig.tight_layout()
    return fig


def index_histogram_figure(counts: np.ndarray, bins: int = 50):
    """Sample-frequency bar chart (utils/utils.py:547-574 fig_from_dist)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    per_bin = max(len(counts) // bins, 1)
    n = len(counts) // per_bin
    agg = counts[: n * per_bin].reshape(n, per_bin).sum(axis=1)
    fig, ax = plt.subplots(figsize=(10, 4))
    ax.bar(range(n), agg)
    ax.set_xlabel("sample index bin")
    ax.set_ylabel("times sampled")
    fig.tight_layout()
    return fig


@contextlib.contextmanager
def profile_steps(run_dir: str | pathlib.Path, enabled: bool = True):
    """jax.profiler trace around a block (the reference had only wall-clock
    prints, OCRNet_Manager.py:70-74; this gives real timelines)."""
    if not enabled:
        yield
        return
    import jax
    out = pathlib.Path(run_dir) / "profile"
    out.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(out))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock step timing (host-side, no device syncs)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times: list[float] = []
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now

    @property
    def mean_ms(self) -> float:
        return 1000 * float(np.mean(self.times)) if self.times else 0.0
