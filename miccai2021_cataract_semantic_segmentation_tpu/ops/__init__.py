from miccai2021_cataract_semantic_segmentation_tpu.ops.remap import (  # noqa: F401
    remap_mask, remap_mask_np, mask_from_network, mask_to_colormap,
)
from miccai2021_cataract_semantic_segmentation_tpu.ops.resize import (  # noqa: F401
    resize_bilinear, resize_logits,
)
from miccai2021_cataract_semantic_segmentation_tpu.ops.metrics import (  # noqa: F401
    confusion_matrix, confusion_matrix_np, normalise_confusion_matrix,
    pixel_accuracy, iou_from_confusion, mean_iou, mean_iou_breakdown,
    single_class_iou, sliding_miou,
)
from miccai2021_cataract_semantic_segmentation_tpu.ops.misc import (  # noqa: F401
    clipped_argmax, to_one_hot, untransform,
)
from miccai2021_cataract_semantic_segmentation_tpu.ops.augment import (  # noqa: F401
    augment_batch, color_jitter, gaussian_blur, pad_reflect_hw,
)
