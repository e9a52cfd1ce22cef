"""AOT serving export (extension; the reference has no serving story —
`BaseManager.infer`/`demo_infer` re-run the eager torch graph per frame,
BaseManager.py:640-741).

Serialises the complete inference program — uint8 preprocessing (pad +
ImageNet normalise), the model forward, and the prediction head (argmax +
confidence) — as one portable `jax.export` StableHLO artifact with a
*symbolic batch dimension*, so a single artifact serves any batch size.
Trained weights are baked in as constants: the artifact is reloadable and
executable by any JAX process (CPU or TPU) WITHOUT this framework, the
model code, or the checkpoint — exactly what a production serving fleet
wants to deploy.

Contract: input `(b, H, W, 3) uint8` RGB frames at dataset resolution
(540x960 for CaDIS); output `{"pred": (b, H', W') uint8 task-class ids,
"confidence": (b, H', W') float32 max softmax probability}` where H'/W'
include the reference's 2px vertical reflect pad when the transform list
pads (540 -> 544, utils/utils.py:332-450) — crop the two boundary rows on
the host if undesired. `confidence` feeds downstream pseudo-labelling /
quality monitoring (same quantity as `clipped_argmax`'s threshold input,
torch_utils.py:7-21).
"""
from __future__ import annotations

import pathlib

import jax
import jax.numpy as jnp

SUFFIX = ".jaxexport"


def make_serving_fn(apply_fn, variables, spec, tta_scales=None):
    """Pure serving function closing over trained `variables`.

    `spec` is the device-transform spec (pipeline.device) or None; only its
    `pad` / `normalise` flags apply at inference (the eval pipeline is
    deterministic — same preprocessing as `make_eval_step`).

    `tta_scales`: optional scale tuple — bakes the reference's TTA recipe
    (horizontal flip x multi-scale, softmax-mean merge; ttach Compose,
    BaseManager.py:652-660) into the serving program, same math as
    `Trainer._make_tta_step`. Confidence then comes from the merged probs.
    """
    from miccai2021_cataract_semantic_segmentation_tpu.train.steps import (
        eval_preprocess, tta_merged_probs)

    def serve(images_u8):
        x = eval_preprocess(images_u8, spec)
        if tta_scales is None:
            logits = apply_fn(variables, x, False)["logits"]
            pred = jnp.argmax(logits, -1).astype(jnp.uint8)
            # max softmax prob without materialising the full softmax twice
            lmax = jnp.max(logits, -1, keepdims=True)
            conf = 1.0 / jnp.sum(jnp.exp(logits - lmax), -1)
            return {"pred": pred, "confidence": conf.astype(jnp.float32)}
        probs = tta_merged_probs(
            lambda xi: apply_fn(variables, xi, False)["logits"], x, tta_scales)
        return {"pred": jnp.argmax(probs, -1).astype(jnp.uint8),
                "confidence": jnp.max(probs, -1).astype(jnp.float32)}

    return serve


def make_ensemble_serving_fn(members, merge, spec):
    """Ensemble serving (reference Ensemble_Manager + BaseManager.infer):
    pad-only preprocessing — members apply their own input normalisation
    inside `ensemble_apply` — then merged softmax probabilities drive the
    prediction and confidence, all members baked into one artifact."""
    from miccai2021_cataract_semantic_segmentation_tpu.models.ensemble import (
        ensemble_apply)
    from miccai2021_cataract_semantic_segmentation_tpu.train.steps import (
        eval_preprocess)

    def serve(images_u8):
        x = eval_preprocess(images_u8, spec)
        probs = ensemble_apply(members, x, merge)
        return {"pred": jnp.argmax(probs, -1).astype(jnp.uint8),
                "confidence": jnp.max(probs, -1).astype(jnp.float32)}

    return serve


def export_fn(serve, image_hw, *, batch=None, platforms=None, mesh=None):
    """jax.export plumbing shared by the single-model and ensemble paths.

    batch=None exports a symbolic batch axis `b`; an int pins it.
    `platforms`: e.g. ("cpu", "tpu") for a cross-platform artifact; None
    lowers for the current default backend only.

    `mesh`: a `jax.sharding.Mesh` with a 'data' axis — the artifact then
    shards the batch over the mesh devices (data-parallel serving on a
    slice; XLA GSPMD compiles the partitioned program into the artifact).
    Requires a pinned `batch` divisible by the data axis, and callers must
    run with the same device count and feed inputs placed on an equivalent
    mesh (`jax.device_put(imgs, NamedSharding(mesh, P('data')))`).
    """
    h, w = image_hw
    if mesh is None:
        jit_fn = jax.jit(serve)
    else:
        from jax.sharding import NamedSharding, PartitionSpec
        n_data = mesh.shape["data"]
        assert batch is not None and int(batch) % n_data == 0, \
            f"mesh export needs a pinned batch divisible by {n_data}"
        sh = NamedSharding(mesh, PartitionSpec("data"))
        jit_fn = jax.jit(serve, in_shardings=(sh,),
                         out_shardings={"pred": sh, "confidence": sh})
    if batch is None:
        (b,) = jax.export.symbolic_shape("b")
    else:
        b = int(batch)
    arg = jax.ShapeDtypeStruct((b, h, w, 3), jnp.uint8)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jax.export.export(jit_fn, **kwargs)(arg)


def export_serving(apply_fn, variables, spec, image_hw, *, batch=None,
                   platforms=None, tta_scales=None, mesh=None):
    """Export the single-model serving program (`make_serving_fn`)."""
    serve = make_serving_fn(apply_fn, variables, spec, tta_scales=tta_scales)
    return export_fn(serve, image_hw, batch=batch, platforms=platforms,
                     mesh=mesh)


def save_serving(exported, path) -> pathlib.Path:
    path = pathlib.Path(path)
    if path.suffix != SUFFIX:
        path = path.with_suffix(path.suffix + SUFFIX)
    path.write_bytes(exported.serialize())
    return path


def load_serving(path):
    """Round-trip a saved artifact into a callable — needs only jax, not
    the framework (model code, checkpoints, configs all already baked in).

    Usage note: call the returned function at top level. Embedding it
    inside ANOTHER jitted computation re-inlines the serialized module
    into the outer trace and measured ~30x slower on the CPU backend;
    compose with separate top-level jits instead (tools/bench_serving.py
    shows the pattern)."""
    data = pathlib.Path(path).read_bytes()
    exported = jax.export.deserialize(data)
    return jax.jit(exported.call)


def write_sidecar(path, trainer, *, image_hw, tta_scales=None, mesh=None):
    """`<artifact>.json`: everything a framework-less consumer needs to
    interpret the artifact — input contract, task class names, and the
    CaDIS colormap for rendering predictions (taxonomy.task_colormap)."""
    import json

    from miccai2021_cataract_semantic_segmentation_tpu import taxonomy
    task = trainer.task
    pad = trainer.pipeline.valid_pad
    h, w = image_hw
    n_cls = taxonomy.TASK_NUM_CLASSES[task]
    names = list(taxonomy.TASK_CLASS_NAMES[task])
    cmap = taxonomy.task_colormap(task)
    if taxonomy.task_has_ignore(task):
        names = names + ["Ignore"]
    meta = {
        "input": {"shape": ["batch", h, w, 3], "dtype": "uint8",
                  "layout": "NHWC RGB"},
        "output": {"pred": ["batch", h + (4 if pad else 0), w],
                   "confidence": "float32 max softmax prob, same HxW",
                   "pad_rows": 2 if pad else 0},
        "task": task, "num_classes": n_cls,
        "class_names": names,
        "colormap_rgb": cmap.tolist(),
        "tta_scales": list(tta_scales) if tta_scales else None,
        "mesh_devices": int(mesh.size) if mesh is not None else None,
        "run_id": trainer.run_id,
    }
    sidecar = pathlib.Path(path).with_suffix(SUFFIX + ".json")
    sidecar.write_text(json.dumps(meta, indent=1))
    return sidecar


def export_trainer(trainer, path, *, batch=None, platforms=None, tta=False,
                   mesh=None):
    """Export a Trainer's current inference state (call after
    `load_checkpoint('best')` — ensembles restore member checkpoints at
    construction). Uses the valid-set image resolution. `tta=True` bakes
    the config's TTA recipe in (`tta_scales`, default the reference's
    [.75, 1, 1.5, 1.75, 2]). Writes a `.json` metadata sidecar next to
    the artifact."""
    _, lbl, _ = trainer.valid_set[0]
    h, w = lbl.shape
    tta_scales = None
    if trainer.state is None:  # ensemble inference Trainer
        assert not tta, "TTA is a single-model recipe (BaseManager.infer)"
        members, merge, spec = trainer.ensemble  # the eval step's own spec
        serve = make_ensemble_serving_fn(members, merge, spec)
        exported = export_fn(serve, (h, w), batch=batch, platforms=platforms,
                             mesh=mesh)
    else:
        variables = {"params": trainer.state.params,
                     "batch_stats": trainer.state.batch_stats}
        spec = trainer.pipeline.device if trainer.pipeline.valid_pad else None
        if tta:
            tta_scales = tuple(trainer.config.get(
                "tta_scales", (0.75, 1.0, 1.5, 1.75, 2.0)))
        exported = export_serving(trainer.state.apply_fn, variables, spec,
                                  (h, w), batch=batch, platforms=platforms,
                                  tta_scales=tta_scales, mesh=mesh)
    out = save_serving(exported, path)
    write_sidecar(out, trainer, image_hw=(h, w), tta_scales=tta_scales,
                  mesh=mesh)
    return out
