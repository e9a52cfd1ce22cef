"""Data layer tests: splits, samplers, transforms, pipeline, on a synthetic
frame table shaped like the CaDIS data.csv."""
import numpy as np
import pandas as pd
import pytest

from miccai2021_cataract_semantic_segmentation_tpu import taxonomy
from miccai2021_cataract_semantic_segmentation_tpu.data import (
    split_dataframes, task_count_matrix, RepeatFactorSampler,
    class_repeat_factors, image_repeat_factors, oversample_indices,
    weighted_random_weights, weighted_random_epoch, AdaptiveBatchSampler,
    build_transform_pipeline, AffineTransform, CropTransform, pad_reflect,
    ArrayDataset, assemble_batch, pad_or_trim_batches, epoch_iterator,
)


@pytest.fixture()
def frame_table():
    rng = np.random.default_rng(0)
    n = 120
    rows = {
        "img_path": [f"Video{v:02d}/Images/frame{i}.png" for i, v in
                     enumerate(rng.integers(1, 26, n))],
        "lbl_path": [f"Video{v:02d}/Labels/frame{i}.png" for i, v in
                     enumerate(rng.integers(1, 26, n))],
        "blacklisted": rng.integers(0, 2, n) * (rng.random(n) < 0.1),
        "relabeled": (rng.random(n) < 0.1).astype(float),
        "vid_num": rng.integers(1, 26, n),
    }
    counts = rng.integers(0, 1000, (n, 36)) * (rng.random((n, 36)) < 0.3)
    counts[:, 0] = rng.integers(1000, 50000, n)  # Pupil everywhere
    counts[:, 6] = rng.integers(1000, 90000, n)  # Cornea everywhere
    for i, name in enumerate(taxonomy.CANONICAL_NAMES):
        rows[name] = counts[:, i]
    return pd.DataFrame(rows)


def test_split_semantics(frame_table):
    train, valid = split_dataframes(frame_table, split=2, mode="training",
                                    blacklist=False)
    assert set(train["vid_num"]).issubset(set(taxonomy.DATA_SPLITS[2][0]))
    assert set(valid["vid_num"]).issubset({5, 7, 16})
    _, test = split_dataframes(frame_table, split=2, mode="inference",
                               blacklist=False)
    assert set(test["vid_num"]).issubset({2, 12, 22})


def test_split_blacklist_and_relabel(frame_table):
    train_bl, _ = split_dataframes(frame_table, 1, blacklist=True)
    assert (train_bl["blacklisted"] == 1).sum() == 0
    train_rl, _ = split_dataframes(frame_table, 1, use_relabeled=True,
                                   blacklist=True)
    relabeled = train_rl[train_rl["relabeled"] == 1]
    assert all(p.startswith("relabeled/") for p in relabeled["lbl_path"])


def test_task_count_matrix(frame_table):
    m1 = task_count_matrix(frame_table, 1)
    assert m1.shape == (len(frame_table), 8)
    m2 = task_count_matrix(frame_table, 2)
    assert m2.shape == (len(frame_table), 18)
    # totals preserved across tasks that cover the full canonical space
    canon_total = frame_table[list(taxonomy.CANONICAL_NAMES)].to_numpy().sum()
    np.testing.assert_allclose(m1.sum(), canon_total)
    np.testing.assert_allclose(m2.sum(), canon_total)


def test_repeat_factor_math(frame_table):
    train, _ = split_dataframes(frame_table, 2)
    freqs, rfs = class_repeat_factors(train, 0.15, task=2)
    assert rfs.shape == (18,)
    assert (rfs >= 1).all()
    # ubiquitous classes (Pupil/Cornea) should not be repeated
    assert rfs[0] == 1.0 and rfs[6] == 1.0
    img_rfs = image_repeat_factors(train, rfs, task=2)
    assert img_rfs.shape == (len(train),)
    assert (img_rfs >= 1).all()
    # image rf is the max over present classes
    counts = task_count_matrix(train, 2)
    i = 0
    present = counts[i] > 0
    np.testing.assert_allclose(img_rfs[i], rfs[present].max())


def test_repeat_factor_sampler_epochs(frame_table):
    train, _ = split_dataframes(frame_table, 2)
    s = RepeatFactorSampler(train, repeat_thresh=0.3, task=2, seed=3)
    e1, e2 = s.epoch_indices(), s.epoch_indices()
    n = (s.repeat_factors >= 1).sum()
    assert len(e1) >= n  # every frame appears at least once
    assert not np.array_equal(e1[:20], e2[:20])  # reshuffled
    batches = s.epoch_batches(4)
    assert batches.ndim == 2 and batches.shape[1] == 4  # drop_last


def test_oversampling(frame_table):
    train, _ = split_dataframes(frame_table, 2)
    extra = oversample_indices(train, task=2, preset="default", frac=0.2)
    assert len(extra) >= int(0.2 * len(train))
    assert len(np.unique(extra)) == len(extra)


def test_weighted_random(frame_table):
    train, _ = split_dataframes(frame_table, 2)
    for mode in ("v1", "v2"):
        w = weighted_random_weights(train, 2, mode)
        assert w.shape == (len(train),)
        assert (w >= 0).all() and w.sum() > 0
    idx = weighted_random_epoch(w, 50, np.random.default_rng(0))
    assert idx.shape == (50,) and idx.max() < len(train)


def test_adaptive_batching(frame_table):
    train, _ = split_dataframes(frame_table, 2)
    s = AdaptiveBatchSampler(train, task=2, batch_size=4, sel_size=3)
    b = s.next_batch()
    assert b.shape == (4,)
    s.update_iou(np.linspace(0, 1, 17))
    batches = s.epoch_batches()
    assert batches.shape == (len(train) // 4, 4)


def test_transform_pipeline_parsing():
    p = build_transform_pipeline(["pad", "flip", "blur", "colorjitter",
                                  "torchvision_normalise"],
                                 {"crop_size": 0.4, "crop_mode": "random"}, 2)
    assert p.device.pad and p.device.flip and p.device.blur
    assert p.device.colorjitter and p.device.normalise
    assert not p.host_train
    p2 = build_transform_pipeline(["crop", "pad", "rot"],
                                  {"crop_size": 0.4, "crop_mode": "random"}, 2)
    assert not p2.device.pad  # crop suppresses train pad (utils.py:394-398)
    assert p2.valid_pad
    assert len(p2.host_train) == 2  # affine + crop


def test_affine_and_crop_transforms():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    lbl = rng.integers(0, 18, (64, 96), dtype=np.uint8)
    a_img, a_lbl = AffineTransform(rotation=15)(img, lbl, rng)
    assert a_img.shape == img.shape and a_lbl.shape == lbl.shape
    assert a_lbl.max() < 18  # nearest-neighbour keeps valid ids
    ac_img, ac_lbl = AffineTransform(rotation=15, crop_to_fit=True)(img, lbl, rng)
    assert ac_img.shape == img.shape and ac_lbl.shape == lbl.shape
    c_img, c_lbl = CropTransform(size=0.5, mode="random", task=2)(img, lbl, rng)
    assert c_img.shape[0] == c_img.shape[1] == c_lbl.shape[0]
    assert c_img.shape[0] % 32 == 0


def test_pad_reflect():
    x = np.arange(12, dtype=np.uint8).reshape(3, 4)
    y = pad_reflect(x, ver=(1, 1), hor=(0, 0))
    assert y.shape == (5, 4)
    np.testing.assert_array_equal(y[0], x[1])  # reflect


def test_pipeline_epoch():
    rng = np.random.default_rng(0)
    ds = ArrayDataset(rng.integers(0, 255, (10, 16, 24, 3), dtype=np.uint8),
                      rng.integers(0, 8, (10, 16, 24), dtype=np.uint8))
    batches = np.arange(8).reshape(4, 2)
    batches = pad_or_trim_batches(batches, 6)
    assert batches.shape == (6, 2)
    seen = 0
    for imgs, lbls, idx in epoch_iterator(ds, batches, prefetch=2):
        assert imgs.shape == (2, 16, 24, 3)
        assert lbls.shape == (2, 16, 24)
        seen += 1
    assert seen == 6


# ------------------------------------------------------------- native IO

def test_native_batch_pipeline(tmp_path):
    """C++ thread-pool decode+remap reaches parity with the Python path."""
    import pandas as pd
    from PIL import Image
    from miccai2021_cataract_semantic_segmentation_tpu import taxonomy
    from miccai2021_cataract_semantic_segmentation_tpu.data import (
        SegDataset, assemble_batch, native_io)
    if not native_io.available():
        import pytest
        pytest.skip("native IO toolchain unavailable")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(4):
        img = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
        lbl = rng.integers(0, 36, (32, 48), dtype=np.uint8)
        Image.fromarray(img).save(tmp_path / f"i{i}.png")
        Image.fromarray(lbl).save(tmp_path / f"l{i}.png")
        rows.append({"img_path": f"i{i}.png", "lbl_path": f"l{i}.png",
                     "vid_num": 1})
    df = pd.DataFrame(rows)
    ds = SegDataset(df, task=2, data_path=str(tmp_path))
    imgs, lbls, idx = assemble_batch(ds, [0, 1, 2, 3])
    # parity with the per-item Python path
    for i in range(4):
        img_ref, lbl_ref, _ = ds[i]
        np.testing.assert_array_equal(imgs[i], img_ref)
        np.testing.assert_array_equal(lbls[i], lbl_ref.astype(np.int32))
    assert int(lbls.max()) <= taxonomy.num_label_values(2) - 1


# ----------------------------------------------- vendored benchmark table

def test_vendored_data_csv_loads():
    """The curated CaDIS frame table ships with the repo (reference
    data/data.csv): 4,670 frames, 179 blacklisted, 40 relabeled."""
    from miccai2021_cataract_semantic_segmentation_tpu.data import (
        load_frame_table)
    df = load_frame_table()
    assert len(df) == 4670
    assert int((df["blacklisted"] == 1).sum()) == 179
    assert int((df["relabeled"] == 1).sum()) == 40
    for name in taxonomy.CANONICAL_NAMES:
        assert name in df.columns

    # paper split 2 regime: 19 train / 3 val / 3 test videos
    train, valid = split_dataframes(df, 2, blacklist=False)
    assert train["vid_num"].nunique() == 19
    assert valid["vid_num"].nunique() == 3
    _, test = split_dataframes(df, 2, mode="inference", blacklist=False)
    assert test["vid_num"].nunique() == 3
    assert set(test["vid_num"]).isdisjoint(set(valid["vid_num"]))

    # blacklist regime drops exactly the ==1 flagged rows (the table also
    # carries blacklisted==2 rows, which the reference keeps)
    train_bl, valid_bl = split_dataframes(df, 2, blacklist=True)
    dropped = (len(train) - len(train_bl)) + (len(valid) - len(valid_bl))
    assert dropped == int((train["blacklisted"] == 1).sum()
                          + (valid["blacklisted"] == 1).sum())


def test_vendored_relabelled_pngs():
    """All 40 corrected label PNGs referenced by use_relabeled resolve via
    the vendored relabelled/ fallback and decode to canonical-id masks."""
    import pathlib
    from miccai2021_cataract_semantic_segmentation_tpu.data import (
        SegDataset, load_frame_table)
    df = load_frame_table()
    train, valid = split_dataframes(df, 1, use_relabeled=True, blacklist=True)
    rl = pd.concat([train, valid])
    rl = rl[rl["lbl_path"].str.startswith("relabeled/")]
    assert len(rl) > 0
    ds = SegDataset(rl.reset_index(drop=True), 1, data_path="/nonexistent")
    repo_pngs = sorted((pathlib.Path(__file__).parents[1] / "relabelled").glob("*.png"))
    assert len(repo_pngs) == 40
    for i in range(len(ds.df)):
        p = ds._resolve(ds.df.iloc[i]["lbl_path"])
        assert p.is_file(), p
    # decode one corrected mask: values must be canonical ids (0..35)
    import cv2
    lbl = cv2.imread(str(repo_pngs[0]), cv2.IMREAD_GRAYSCALE)
    assert lbl is not None and lbl.max() < 36


def test_random_split_legacy():
    from miccai2021_cataract_semantic_segmentation_tpu.data import (
        load_frame_table)
    df = load_frame_table()
    train, valid = split_dataframes(df, 2, random_split=[0.6, 0.2],
                                    blacklist=False, seed=1)
    assert abs(len(train) - 0.6 * len(df)) < 5
    assert abs(len(valid) - 0.2 * len(df)) < 5
    assert set(train["file_name"]).isdisjoint(set(valid["file_name"]))


def test_colorization_dataset(tmp_path):
    """ColorizationDataset (reference colorization_dataset.py, dead code
    there): consecutive-frame sequences, ITU-601 grayscale triplets,
    seq-length-safe index bins."""
    import cv2
    from miccai2021_cataract_semantic_segmentation_tpu.data import ColorizationDataset
    paths = []
    for v in range(2):
        p = tmp_path / f"col{v}.avi"
        w = cv2.VideoWriter(str(p), cv2.VideoWriter_fourcc(*"XVID"), 5, (64, 64))
        assert w.isOpened()
        for f in range(5):
            w.write(np.full((64, 64, 3), 20 * f + 100 * v, np.uint8))
        w.release()
        paths.append(str(p))

    ds = ColorizationDataset(paths, sequence_length=2)
    # 5 frames, T=2 -> 4 sequence starts per video (0..3 inclusive)
    assert len(ds) == 8
    assert ds.locate(0) == (0, 0) and ds.locate(4) == (1, 0) and ds.locate(7) == (1, 3)
    rgb_last, _ = ds[3]  # the final sequence reaches the last frame
    assert abs(float(rgb_last[1].mean()) - 80) < 8

    rgb, gray = ds[1]  # video 0, frames 1..2
    assert rgb.shape == (2, 64, 64, 3) and gray.shape == (2, 64, 64, 3)
    assert rgb.dtype == np.uint8 and gray.dtype == np.uint8
    # consecutive frames: fill values 20 and 40 (XVID lossy -> tolerance)
    assert abs(float(rgb[0].mean()) - 20) < 6
    assert abs(float(rgb[1].mean()) - 40) < 6
    # grayscale: 3 identical channels equal to the ITU-601 combination
    assert (gray[..., 0] == gray[..., 1]).all() and (gray[..., 1] == gray[..., 2]).all()
    want = np.round(rgb.astype(np.float32) @ np.array([0.299, 0.587, 0.114], np.float32))
    np.testing.assert_allclose(gray[..., 0].astype(np.float32), want, atol=1.0)

    # second video reachable and distinct
    rgb2, _ = ds[4]
    assert abs(float(rgb2[0].mean()) - 100) < 8


def test_submission_dataset(tmp_path):
    """SubmissionDataset (reference datasets/Dataset_for_Submission.py:16-22):
    sorted directory iteration, resize to target, zero dummy label, name in
    meta for writing the submission files."""
    import cv2
    from miccai2021_cataract_semantic_segmentation_tpu.data.dataset import (
        SubmissionDataset)
    rng = np.random.default_rng(3)
    names = ["b_frame2.png", "a_frame1.png", "c_frame3.png"]
    for k, name in enumerate(names):
        h, w = (540, 960) if k == 0 else (270, 480)  # one native, two resized
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(str(tmp_path / name), img)

    ds = SubmissionDataset(str(tmp_path), height=540, width=960)
    assert len(ds) == 3
    got_names = []
    for i in range(len(ds)):
        img, lbl, meta = ds[i]
        assert img.shape == (540, 960, 3) and img.dtype == np.uint8
        assert lbl.shape == (540, 960) and not lbl.any()
        assert meta["index"] == i
        got_names.append(meta["name"])
    assert got_names == sorted(names)  # sorted order regardless of mtime
