from colpali_tpu.training.trainer import (  # noqa: F401
    TrainConfig,
    create_optimizer,
    create_train_state,
    make_train_step,
)
