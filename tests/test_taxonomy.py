"""Taxonomy / remapping parity with the reference's defaults.py semantics."""
import numpy as np
import pytest

from miccai2021_cataract_semantic_segmentation_tpu import taxonomy
from miccai2021_cataract_semantic_segmentation_tpu.ops import remap_mask, remap_mask_np, mask_from_network


def test_class_counts():
    assert taxonomy.NUM_CANONICAL == 36
    assert taxonomy.TASK_NUM_CLASSES == {0: 36, 1: 8, 2: 17, 3: 25}
    assert taxonomy.num_label_values(1) == 8
    assert taxonomy.num_label_values(2) == 18
    assert taxonomy.num_label_values(3) == 26
    assert taxonomy.ignore_index(1) == -1
    assert taxonomy.ignore_index(2) == 17
    assert taxonomy.ignore_index(3) == 25


def test_groups_partition_canonical_space():
    # every canonical id is claimed by at most one task class (bijectivity
    # assert of utils/utils.py:37)
    for task, groups in taxonomy.TASK_GROUPS.items():
        seen = [c for ids in groups.values() for c in ids]
        assert len(seen) == len(set(seen))
    # tasks 0 and 1 cover the full canonical space
    assert sorted(c for ids in taxonomy.TASK_GROUPS[1].values() for c in ids) == list(range(36))


@pytest.mark.parametrize("task", [1, 2, 3])
def test_remap_lut_network_space(task):
    mask = np.arange(36, dtype=np.uint8).reshape(6, 6)
    out = remap_mask_np(mask, task, to_network=True)
    assert out.max() <= taxonomy.TASK_NUM_CLASSES[task]  # ignore folded to C
    # paper space keeps 255
    paper = remap_mask_np(mask, task, to_network=False)
    if taxonomy.task_has_ignore(task):
        assert (paper == 255).any()
        assert not (out == 255).any()
    # round trip: network -> paper space
    assert (mask_from_network(out.copy(), task) == paper).all()


def test_remap_task2_known_values():
    # spot checks against defaults.py:134-152
    lut = taxonomy.REMAP_LUTS[2]
    assert lut[0] == 0 and lut[6] == 6
    for canon in (7, 8, 10, 27, 20, 32):
        assert lut[canon] == 7  # Cannula group
    assert lut[9] == 8 and lut[22] == 8
    assert lut[19] == 16
    for canon in (25, 26, 29, 30, 31, 34, 35):
        assert lut[canon] == 255


def test_remap_device_matches_host():
    rng = np.random.default_rng(0)
    mask = rng.integers(0, 36, size=(4, 5), dtype=np.uint8)
    for task in (1, 2, 3):
        np.testing.assert_array_equal(
            np.asarray(remap_mask(mask, task)), remap_mask_np(mask, task))


def test_splits():
    assert len(taxonomy.DATA_SPLITS) == 6
    train, val, test = taxonomy.DATA_SPLITS[2]
    assert len(train) == 19 and len(val) == 3 and len(test) == 3
    assert set(val) == {5, 7, 16} and set(test) == {2, 12, 22}


def test_class_statistics():
    assert taxonomy.CLASS_FREQUENCIES.shape == (36,)
    assert taxonomy.CLASS_SUMS.shape == (36,)
    assert taxonomy.CLASS_SUMS.argmax() == 6  # Cornea dominates


def test_colormap():
    cmap1 = taxonomy.task_colormap(1)
    assert cmap1.shape == (8, 3)
    cmap2 = taxonomy.task_colormap(2)
    assert cmap2.shape == (18, 3)
    assert (cmap2[17] == 0).all()  # ignore renders black
    # first canonical member's colour is used for merged groups
    assert (cmap2[7] == taxonomy.CADIS_COLORMAP[7]).all()
