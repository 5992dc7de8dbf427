from colpali_tpu.losses.bi_encoder import (  # noqa: F401
    BiEncoderLoss,
    BiNegativeCELoss,
    BiPairedEncoderLoss,
    BiPairwiseCELoss,
    BiPairwiseNegativeCELoss,
    BiSigmoidLoss,
)
from colpali_tpu.losses.late_interaction import (  # noqa: F401
    ColbertLoss,
    ColbertNegativeCELoss,
    ColbertPairwiseCELoss,
    ColbertPairwiseNegativeCELoss,
    ColbertSigmoidLoss,
)
