"""Structural check of the multi-chip SPMD partitioning.

dryrun_multichip proves the sharded step *executes*; this asserts the
compiled program actually has the expected distributed structure — XLA
could silently fall back to full replication and still produce correct
numbers, which would only show up as a perf regression on real slices.

On the 8-device CPU mesh (conftest), the (4, 2) data x model train step
must contain cross-replica collectives (the gradient/metric all-reduce
GSPMD derives from the output shardings) and must keep the batch input
sharded (each device holds 1/8 of the image batch, not a replica).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from miccai2021_cataract_semantic_segmentation_tpu.data.transforms import (
    DeviceAugmentSpec)
from miccai2021_cataract_semantic_segmentation_tpu.losses import build_loss
from miccai2021_cataract_semantic_segmentation_tpu.models import build_model
from miccai2021_cataract_semantic_segmentation_tpu.train.lr_schedule import (
    make_schedule)
from miccai2021_cataract_semantic_segmentation_tpu.train.state import (
    create_train_state)
from miccai2021_cataract_semantic_segmentation_tpu.train.steps import (
    make_train_step)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_sharded_train_step_has_collectives_and_sharded_inputs():
    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("data", "model"))
    task = 2
    model = build_model({"model": "FCN", "width": 0.25}, task)
    loss_fn = build_loss({"name": "CrossEntropyLoss"}, task)
    spec = DeviceAugmentSpec(pad=False, flip=True)
    batch, h, w = 8, 64, 128
    schedule = make_schedule({"epochs": 2, "learning_rate": 1e-4}, 4)
    with mesh:
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   jnp.zeros((batch, h, w, 3)), {}, schedule)
        state = jax.device_put(state, NamedSharding(mesh, P()))
        rng = np.random.default_rng(0)
        images = jax.device_put(
            rng.integers(0, 255, (batch, h, w, 3), dtype=np.uint8),
            NamedSharding(mesh, P("data", "model")))
        labels = jax.device_put(
            rng.integers(0, 18, (batch, h, w), dtype=np.uint8),
            NamedSharding(mesh, P("data", "model")))
        step = make_train_step(loss_fn, spec, task, donate=False, mesh=mesh)
        compiled = step.lower(state, images, labels,
                              jax.random.PRNGKey(1), 0).compile()

    txt = compiled.as_text()
    # gradient/metric reductions across the mesh: GSPMD must have inserted
    # cross-replica collectives (all-reduce; conv halo exchanges along the
    # sharded H axis may additionally appear as collective-permute)
    assert "all-reduce" in txt, "no all-reduce in the partitioned module"

    # the image batch must stay sharded, one (2, 32, w, 3) block per device
    in_shardings = jax.tree.leaves(compiled.input_shardings[0])
    shapes = {s.shard_shape((batch, h, w, 3))
              for s in in_shardings
              if hasattr(s, "shard_shape") and
              getattr(s, "num_devices", 8) == 8}
    # find the sharding actually attached to the uint8 image arg
    img_shard = None
    for s in in_shardings:
        try:
            img_shard = s.shard_shape((batch, h, w, 3))
            if img_shard == (batch // 4, h // 2, w, 3):
                break
        except (TypeError, ValueError):
            continue
    assert img_shard == (batch // 4, h // 2, w, 3), \
        f"image batch not sharded (4,2): got shard shape {img_shard}, " \
        f"all shapes seen {shapes}"

    # and it must actually run
    new_state, metrics = step(state, images, labels, jax.random.PRNGKey(1), 0)
    assert np.isfinite(float(metrics["loss"]))
