"""AOT serving export (train/export.py): symbolic-batch round-trip parity.

The artifact must reload via bare jax.export.deserialize (no framework
objects) and reproduce the framework's own eval preprocessing + forward
bit-for-bit at multiple batch sizes through the one serialized program.
"""
import jax
import jax.numpy as jnp
import numpy as np

from miccai2021_cataract_semantic_segmentation_tpu.data.transforms import DeviceAugmentSpec
from miccai2021_cataract_semantic_segmentation_tpu.models import build_model
from miccai2021_cataract_semantic_segmentation_tpu.train import export as exp


def _small_model_and_vars(task=2):
    model = build_model({"model": "FCN", "width": 0.1}, task)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 36, 64, 3), jnp.float32)
    variables = model.init({"params": rng}, x, False)
    return model, variables


def test_export_symbolic_batch_round_trip(tmp_path):
    model, variables = _small_model_and_vars()
    spec = DeviceAugmentSpec(pad=True, normalise=True)
    exported = exp.export_serving(model.apply, variables, spec, (32, 64))
    path = exp.save_serving(exported, tmp_path / "fcn")
    assert path.suffix == exp.SUFFIX

    served = exp.load_serving(path)
    direct = exp.make_serving_fn(model.apply, variables, spec)

    rng = np.random.default_rng(0)
    for b in (1, 3):
        imgs = jnp.asarray(rng.integers(0, 256, (b, 32, 64, 3), np.uint8))
        got = served(imgs)
        want = direct(imgs)
        # pad=True: 32 -> 36 rows
        assert got["pred"].shape == (b, 36, 64)
        assert got["pred"].dtype == jnp.uint8
        np.testing.assert_array_equal(np.asarray(got["pred"]),
                                      np.asarray(want["pred"]))
        np.testing.assert_allclose(np.asarray(got["confidence"]),
                                   np.asarray(want["confidence"]), atol=1e-6)
        conf = np.asarray(got["confidence"])
        assert conf.min() > 0.0 and conf.max() <= 1.0 + 1e-6


def test_export_tta_matches_trainer_tta_math(tmp_path):
    """TTA-baked artifact: merged probs equal the hand-computed flip +
    multiscale softmax mean (the reference's ttach recipe)."""
    from miccai2021_cataract_semantic_segmentation_tpu.ops.resize import resize_bilinear
    model, variables = _small_model_and_vars()
    scales = (0.75, 1.0)
    exported = exp.export_serving(model.apply, variables, None, (32, 64),
                                  tta_scales=scales)
    served = exp.load_serving(exp.save_serving(exported, tmp_path / "tta"))

    imgs = jnp.asarray(np.random.default_rng(3).integers(
        0, 256, (2, 32, 64, 3), np.uint8))
    got = served(imgs)

    x = imgs.astype(jnp.float32) / 255.0
    probs = jnp.zeros((2, 32, 64, 17))
    for s in scales:
        hs, ws = int(round(32 * s)), int(round(64 * s))
        xs = resize_bilinear(x, (hs, ws), align_corners=False)
        for flip in (False, True):
            xi = xs[:, :, ::-1] if flip else xs
            lg = model.apply(variables, xi, False)["logits"]
            if flip:
                lg = lg[:, :, ::-1]
            lg = resize_bilinear(lg, (32, 64), align_corners=False)
            probs = probs + jax.nn.softmax(lg, -1)
    probs = probs / (2 * len(scales))
    np.testing.assert_array_equal(np.asarray(got["pred"]),
                                  np.asarray(jnp.argmax(probs, -1)))
    np.testing.assert_allclose(np.asarray(got["confidence"]),
                               np.asarray(jnp.max(probs, -1)), atol=1e-5)


def test_export_trainer_from_run(tmp_path):
    """tools/export_serving.py path: train a mini run, export its state,
    serve at the valid-set resolution."""
    from tests.test_train import _mini_trainer
    t = _mini_trainer(tmp_path)
    t.train()
    t.load_checkpoint("best")
    path = exp.export_trainer(t, tmp_path / "run_export")
    # metadata sidecar: framework-less consumers get the full contract
    import json
    meta = json.loads(path.with_suffix(".jaxexport.json").read_text())
    assert meta["task"] == 1 and meta["num_classes"] == 8
    assert len(meta["class_names"]) == 8  # task 1 has no ignore class
    assert len(meta["colormap_rgb"]) == 8 and meta["output"]["pad_rows"] == 0
    served = exp.load_serving(path)
    imgs = jnp.asarray(np.random.default_rng(2).integers(
        0, 256, (2, 32, 32, 3), np.uint8))
    out = served(imgs)
    # transforms=["flip"] -> no pad; task 1 preds in 0..7
    assert out["pred"].shape == (2, 32, 32)
    assert int(np.asarray(out["pred"]).max()) < 8


def test_export_cross_platform(tmp_path):
    """platforms=('cpu','tpu'): one artifact lowered for both backends from
    this CPU-only host — the deploy-anywhere story. Executes on cpu here;
    the TPU half runs in tools/tpu_smoke.py on hardware."""
    model, variables = _small_model_and_vars()
    exported = exp.export_serving(model.apply, variables, None, (32, 64),
                                  platforms=("cpu", "tpu"))
    assert exported.platforms == ("cpu", "tpu")
    served = exp.load_serving(exp.save_serving(exported, tmp_path / "xp"))
    out = served(jnp.zeros((2, 32, 64, 3), jnp.uint8))
    assert out["pred"].shape == (2, 32, 64)


def test_export_mesh_sharded(tmp_path):
    """Data-parallel serving artifact: the batch axis shards over the
    8-device mesh inside the exported program (GSPMD compiled in), outputs
    stay batch-sharded, and predictions match the unsharded serve."""
    from jax.sharding import NamedSharding, PartitionSpec
    from miccai2021_cataract_semantic_segmentation_tpu.parallel import make_mesh
    model, variables = _small_model_and_vars()
    mesh = make_mesh(devices=jax.devices())
    assert mesh.shape["data"] == 8
    exported = exp.export_serving(model.apply, variables, None, (32, 64),
                                  batch=8, mesh=mesh)
    assert exported.nr_devices == 8
    served = exp.load_serving(exp.save_serving(exported, tmp_path / "mesh"))

    sh = NamedSharding(mesh, PartitionSpec("data"))
    imgs = jax.device_put(jnp.asarray(np.random.default_rng(4).integers(
        0, 256, (8, 32, 64, 3), np.uint8)), sh)
    got = served(imgs)
    assert got["pred"].sharding.is_equivalent_to(sh, 3)
    want = exp.make_serving_fn(model.apply, variables, None)(imgs)
    np.testing.assert_array_equal(np.asarray(got["pred"]),
                                  np.asarray(want["pred"]))

    # guard: mesh export requires a pinned, divisible batch
    import pytest
    with pytest.raises(AssertionError):
        exp.export_serving(model.apply, variables, None, (32, 64),
                           batch=6, mesh=mesh)


def test_export_ensemble(tmp_path):
    """Ensemble serving artifact: all members + merge baked into one
    program, matching Trainer's own ensemble eval step."""
    import pandas as pd
    from miccai2021_cataract_semantic_segmentation_tpu.data import ArrayDataset
    from miccai2021_cataract_semantic_segmentation_tpu.train import Trainer
    rng = np.random.default_rng(0)
    n = 4
    ds = ArrayDataset(rng.integers(0, 255, (n, 32, 32, 3), dtype=np.uint8),
                      rng.integers(0, 8, (n, 32, 32), dtype=np.uint8))
    df = pd.DataFrame({"vid_num": np.ones(n, int)})
    config = {
        "name": "ens", "mode": "inference", "manager": "Ensemble",
        "graph": {"model": "Ensemble", "merge": "mean",
                  "members": {"1": {"model": "FCN", "width": 0.125},
                              "2": {"model": "UNet"}}},
        "data": {"experiment": 1, "batch_size": 1, "split": 0,
                 "transforms": []},
        "loss": {}, "train": {},
        "log_path": str(tmp_path), "precision": "f32", "seed": 0,
    }
    t = Trainer(config, datasets=(ds, ds, df, df))
    path = exp.export_trainer(t, tmp_path / "ens_export")
    served = exp.load_serving(path)

    imgs = jnp.asarray(rng.integers(0, 256, (2, 32, 32, 3), np.uint8))
    got = served(imgs)
    probs, _, _ = t.eval_step(None, imgs, jnp.zeros((2, 32, 32), jnp.uint8))
    np.testing.assert_array_equal(np.asarray(got["pred"]),
                                  np.asarray(jnp.argmax(probs, -1)))
    np.testing.assert_allclose(np.asarray(got["confidence"]),
                               np.asarray(jnp.max(probs, -1)), atol=1e-6)


def test_export_artifact_is_self_contained(tmp_path):
    """Reload through raw jax.export only — no framework imports in the
    consuming path (what a serving fleet would run)."""
    model, variables = _small_model_and_vars()
    exported = exp.export_serving(model.apply, variables, None, (32, 64),
                                  batch=2)
    path = exp.save_serving(exported, tmp_path / "pinned")

    raw = jax.export.deserialize(path.read_bytes())
    imgs = jnp.asarray(np.random.default_rng(1).integers(
        0, 256, (2, 32, 64, 3), np.uint8))
    out = raw.call(imgs)
    assert out["pred"].shape == (2, 32, 64)  # no pad without spec
    assert np.isfinite(np.asarray(out["confidence"])).all()
