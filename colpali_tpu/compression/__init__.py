from colpali_tpu.compression.token_pooling import (  # noqa: F401
    HierarchicalTokenPooler,
    KMeansTokenPooler,
    LambdaTokenPooler,
    TokenPoolingOutput,
    kmeans_pool_padded,
)
