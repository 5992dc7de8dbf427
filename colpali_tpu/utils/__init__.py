from colpali_tpu.utils.tensor_utils import (  # noqa: F401
    pad_sequences,
    round_up,
    unbind_padded_multivector_embeddings,
)
