"""TPU-native CaDIS cataract-surgery semantic-segmentation framework.

A from-scratch JAX / XLA / Pallas / pjit rebuild of the capabilities of
RViMLab/MICCAI2021_Cataract_semantic_segmentation ("Effective Semantic
Segmentation in Cataract Surgery: What matters most?", MICCAI 2021).

Package layout:
    taxonomy    CaDIS class tables, task remapping LUTs, splits, frequencies
    ops         device-side primitives: remap, metrics, resize, augmentation
    models      flax.linen segmentation graphs (OCRNet, DeepLabv3/+, UPerNet, ...)
    losses      jittable loss zoo (Lovasz, OHEM, Focal, Dice, SoftIoU, composers)
    data        host-side input pipeline: dataframe, datasets, samplers, prefetch
    parallel    mesh construction + sharding rules (data/spatial parallelism)
    train       train/eval steps, schedules, checkpointing, loggers, pipelines
"""

__version__ = "0.1.0"

from miccai2021_cataract_semantic_segmentation_tpu import taxonomy  # noqa: F401
