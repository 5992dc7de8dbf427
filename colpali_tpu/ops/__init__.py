from colpali_tpu.ops.maxsim import (  # noqa: F401
    maxsim,
    maxsim_pairwise,
    score_multi_vector,
    score_single_vector,
)
