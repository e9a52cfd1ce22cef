from miccai2021_cataract_semantic_segmentation_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, replicated_sharding, shard_batch,
)
