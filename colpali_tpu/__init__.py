"""colpali-tpu: TPU-native late-interaction visual document retrieval.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
`colpali-engine` reference (late-interaction "ColVision" retrievers), designed
TPU-first: static bucketed shapes, MXU-sized kernels, SPMD sharding over
`jax.sharding.Mesh`, and Pallas kernels for the scoring hot path.
"""

__version__ = "0.3.0"

from colpali_tpu.auto import load_retriever  # noqa: F401
from colpali_tpu.ops.maxsim import score_multi_vector, score_single_vector  # noqa: F401
