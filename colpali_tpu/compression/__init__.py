from colpali_tpu.compression.token_pooling import (  # noqa: F401
    HierarchicalTokenPooler,
    LambdaTokenPooler,
    TokenPoolingOutput,
)
