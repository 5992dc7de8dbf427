from colpali_tpu.training.checkpointing import (  # noqa: F401
    CheckpointManager,
    load_params_safetensors,
    save_params_safetensors,
    save_pretrained,
)
from colpali_tpu.training.lora import (  # noqa: F401
    LoraSpec,
    init_lora_params,
    make_lora_train_step,
    merge_lora,
)
from colpali_tpu.training.orchestrator import ColModelTraining, ColModelTrainingConfig  # noqa: F401
from colpali_tpu.training.trainer import (  # noqa: F401
    TrainConfig,
    create_optimizer,
    create_train_state,
    make_peft_eval_step,
    make_peft_train_step,
    make_train_step,
    shard_peft_train_step,
    shard_train_step,
)
