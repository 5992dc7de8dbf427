from colpali_tpu.compression.token_pooling import (  # noqa: F401
    DeviceWardTokenPooler,
    HierarchicalTokenPooler,
    KMeansTokenPooler,
    LambdaTokenPooler,
    TokenPoolingOutput,
    kmeans_pool_padded,
    ward_pool_padded,
)
