from miccai2021_cataract_semantic_segmentation_tpu.data.dataframe import (  # noqa: F401
    load_frame_table, split_dataframes, task_count_matrix, canonical_count_matrix,
)
from miccai2021_cataract_semantic_segmentation_tpu.data.dataset import (  # noqa: F401
    SegDataset, ArrayDataset, VideoDataset, SubmissionDataset, ColorizationDataset,
)
from miccai2021_cataract_semantic_segmentation_tpu.data.semi import (  # noqa: F401
    BalancedConcatDataset, video_files_from_split, excluded_frames_from_df,
)
from miccai2021_cataract_semantic_segmentation_tpu.data.samplers import (  # noqa: F401
    RepeatFactorSampler, AdaptiveBatchSampler, class_repeat_factors,
    image_repeat_factors, oversample_indices, weighted_random_weights,
    weighted_random_epoch,
)
from miccai2021_cataract_semantic_segmentation_tpu.data.transforms import (  # noqa: F401
    build_transform_pipeline, TransformPipeline, DeviceAugmentSpec,
    AffineTransform, CropTransform, pad_reflect, random_flip,
)
from miccai2021_cataract_semantic_segmentation_tpu.data.pipeline import (  # noqa: F401
    epoch_iterator, assemble_batch, pad_or_trim_batches, eval_batches,
    Prefetcher,
)
