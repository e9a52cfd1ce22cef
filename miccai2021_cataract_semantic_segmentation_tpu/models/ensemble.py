"""Bagging ensemble over independently-trained members (reference
models/Ensemble.py).

Functional design: an ensemble is a list of (apply_fn, variables, normalise)
triples; `ensemble_apply` runs each member on the (un-normalised) image,
softmaxes, and merges by mean or max. Members trained with torchvision
normalisation (UPerNet in the reference, Ensemble.py:63-66) get it applied
per-member. Unlike the reference there is no bs==1 restriction — members
vectorise over the batch.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225])


def normalise_imagenet(x: jnp.ndarray) -> jnp.ndarray:
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def ensemble_apply(members: Sequence[tuple[Callable, Any, bool]],
                   x: jnp.ndarray, merge: str = "mean") -> jnp.ndarray:
    """x: NHWC float image in [0,1] (un-normalised). Returns merged softmax
    probabilities NHWK."""
    probs = []
    for apply_fn, variables, needs_norm in members:
        xi = normalise_imagenet(x) if needs_norm else x
        out = apply_fn(variables, xi)
        logits = out["logits"] if isinstance(out, dict) else out
        probs.append(jax.nn.softmax(logits.astype(jnp.float32), axis=-1))
    stacked = jnp.stack(probs)
    if merge == "mean":
        return jnp.mean(stacked, axis=0)
    if merge == "max":
        return jnp.max(stacked, axis=0)
    raise ValueError(f"merge must be 'mean' or 'max', got {merge!r}")


def build_ensemble(config: dict, task: int, log_path: str = "logs",
                   dtype=jnp.float32):
    """Config-driven ensemble construction + per-member best-checkpoint
    restore (Ensemble.py:37-56, load_pretrained 76-90).

    `config['members']` maps member keys to graph configs with a 'ckpt'
    run-id whose `<log_path>/<run_id>/chkpts` best checkpoint is restored.
    UPerNet members get torchvision normalisation applied inside
    ensemble_apply (Ensemble.py:63-66). Returns (members, merge) for
    ensemble_apply.
    """
    import pathlib

    from miccai2021_cataract_semantic_segmentation_tpu.models import build_model
    from miccai2021_cataract_semantic_segmentation_tpu.train import checkpoint as ckpt
    from miccai2021_cataract_semantic_segmentation_tpu.train.state import (
        create_train_state)

    members = []
    for key in sorted(config["members"]):
        mcfg = dict(config["members"][key])
        run_id = mcfg.pop("ckpt", None)
        model = build_model(mcfg, task, dtype=dtype)
        needs_norm = mcfg.get("model") == "UPerNet"
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 64, 64, 3)), {},
                                   lambda _: 1e-4)
        if run_id:
            ckpt_dir = pathlib.Path(log_path) / run_id / "chkpts"
            state, _ = ckpt.restore_checkpoint(ckpt_dir, "best", state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        def apply_fn(v, x, model=model):
            return model.apply(v, x, False)

        members.append((apply_fn, variables, needs_norm))
    return members, config.get("merge", "mean")
