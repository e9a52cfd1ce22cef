"""Label-space remapping as LUT gathers — device (jnp) and host (numpy) twins.

Replaces the reference's utils/utils.py:23-47 `remap_mask` (numpy fancy
indexing) with a single XLA gather so the canonical->task remap can run
fused inside the input pipeline or the jitted eval step.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from miccai2021_cataract_semantic_segmentation_tpu import taxonomy


def remap_mask_np(mask: np.ndarray, task: int, to_network: bool = True) -> np.ndarray:
    """Canonical-id mask -> task-id mask (host side).

    `to_network=True` folds the 255 ignore value to index num_classes so the
    result is a dense 0..num_label_values-1 id space (utils/utils.py:45-46).
    """
    lut = taxonomy.REMAP_LUTS_NETWORK[task] if to_network else taxonomy.REMAP_LUTS[task]
    return lut[mask]


def remap_mask(mask: jnp.ndarray, task: int, to_network: bool = True) -> jnp.ndarray:
    """Canonical-id mask -> task-id mask (device side, jittable)."""
    lut = taxonomy.REMAP_LUTS_NETWORK[task] if to_network else taxonomy.REMAP_LUTS[task]
    return jnp.asarray(lut)[mask]


def mask_from_network(mask: np.ndarray, task: int) -> np.ndarray:
    """Network label space -> CaDIS paper label space (ignore back to 255).

    Reference: utils/utils.py:114-123.
    """
    if taxonomy.task_has_ignore(task):
        mask = np.where(mask == taxonomy.TASK_NUM_CLASSES[task],
                        taxonomy.IGNORE_VALUE, mask)
    return mask


def mask_to_colormap(mask: np.ndarray, task: int) -> np.ndarray:
    """Network-space id mask (HW) -> RGB uint8 (HW3) via the CaDIS colormap.

    Vectorised version of the reference's per-class loop (utils/utils.py:126-142).
    """
    cmap = taxonomy.task_colormap(task)
    return cmap[np.clip(mask, 0, len(cmap) - 1)]
