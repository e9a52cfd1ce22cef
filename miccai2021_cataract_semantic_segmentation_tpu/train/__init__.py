from miccai2021_cataract_semantic_segmentation_tpu.train.config import (  # noqa: F401
    parse_config, apply_cli_overrides, DEFAULT_CONFIG_FLAT, DEFAULT_CONFIG_NESTED,
)
from miccai2021_cataract_semantic_segmentation_tpu.train.lr_schedule import (  # noqa: F401
    make_schedule, build_multiplier_table,
)
from miccai2021_cataract_semantic_segmentation_tpu.train.state import (  # noqa: F401
    TrainState, create_train_state, make_optimizer,
)
from miccai2021_cataract_semantic_segmentation_tpu.train.steps import (  # noqa: F401
    make_train_step, make_eval_step, make_eval_loss_step,
)
from miccai2021_cataract_semantic_segmentation_tpu.train.trainer import Trainer  # noqa: F401
