"""Checkpointing: orbax-backed save/restore with the reference's layout.

Run directory layout preserved (BaseManager.py:91-101, 471-529):
    <log_path>/<run_id>/{train,valid,infer}/   tensorboard events
    <log_path>/<run_id>/chkpts/chkpt_best/     best-mIoU checkpoint
    <log_path>/<run_id>/chkpts/chkpt_last/     most recent periodic save
    <log_path>/<run_id>/info.json              config + latest metrics

Checkpoints hold {params, batch_stats, opt_state, step, epoch, best_miou,
best_loss}. Orbax writes asynchronously-safe atomic directories — the
preemption-resilience story for TPU pods (SURVEY.md §5 failure detection).
"""
from __future__ import annotations

import json
import pathlib
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _checkpointer():
    return ocp.PyTreeCheckpointer()


# One process-wide async checkpointer: device arrays are snapshotted
# synchronously (cheap) and serialisation/IO runs on background threads, so
# the epoch loop never blocks on disk. Orbax writes to a temp dir and
# renames atomically — a crash mid-save can't corrupt the previous
# checkpoint (the preemption-resilience story, SURVEY.md §5).
_ASYNC: ocp.AsyncCheckpointer | None = None


def _async_checkpointer() -> ocp.AsyncCheckpointer:
    global _ASYNC
    if _ASYNC is None:
        _ASYNC = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC


def wait_for_saves():
    """Block until all pending async checkpoint writes are durable."""
    if _ASYNC is not None:
        _ASYNC.wait_until_finished()


def save_checkpoint(ckpt_dir: str | pathlib.Path, name: str, state,
                    epoch: int, best_miou: float, best_loss: float,
                    blocking: bool = False):
    path = pathlib.Path(ckpt_dir) / f"chkpt_{name}"
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "meta": {
            "epoch": np.asarray(epoch),
            "best_miou": np.asarray(best_miou),
            "best_loss": np.asarray(best_loss),
        },
    }
    ckptr = _async_checkpointer()
    ckptr.wait_until_finished()  # at most one save in flight (depth-1 pipe)
    ckptr.save(path.absolute(), payload, force=True)
    if blocking:
        ckptr.wait_until_finished()


def restore_checkpoint(ckpt_dir: str | pathlib.Path, name: str,
                       state) -> tuple[Any, dict]:
    """Restore into the structure of `state`; returns (new_state, meta)."""
    wait_for_saves()  # a just-issued async save must be durable first
    path = pathlib.Path(ckpt_dir) / f"chkpt_{name}"
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "meta": {"epoch": np.asarray(0), "best_miou": np.asarray(0.0),
                 "best_loss": np.asarray(np.inf)},
    }
    restored = _checkpointer().restore(path.absolute(), item=template)
    new_state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"],
                              opt_state=restored["opt_state"],
                              step=restored["step"])
    meta = {k: float(v) for k, v in restored["meta"].items()}
    return new_state, meta


def restore_params_only(ckpt_path: str | pathlib.Path, params_template,
                        batch_stats_template):
    """Inference-only restore ({params, batch_stats}) from any checkpoint."""
    wait_for_saves()
    template = {"params": params_template, "batch_stats": batch_stats_template}
    restored = _checkpointer().restore(
        pathlib.Path(ckpt_path).absolute(), item=template)
    return restored["params"], restored["batch_stats"]


def write_info_json(run_dir: str | pathlib.Path, config: dict, metrics: dict):
    """BaseManager.write_info_json (608-622): config + metrics snapshot,
    rewritten after every validation for crash forensics."""
    def clean(o):
        if isinstance(o, dict):
            return {str(k): clean(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return [clean(v) for v in o]
        if isinstance(o, (np.ndarray, jax.Array)):
            return np.asarray(o).tolist()
        if isinstance(o, (np.floating, np.integer)):
            return o.item()
        if isinstance(o, (str, int, float, bool)) or o is None:
            return o
        return str(o)

    path = pathlib.Path(run_dir) / "info.json"
    with open(path, "w") as f:
        json.dump({"config": clean(config), "metrics": clean(metrics)}, f, indent=2)
