from colpali_tpu.processors.base import BaseVisualRetrieverProcessor  # noqa: F401
from colpali_tpu.processors.colpali import ColPaliProcessor  # noqa: F401
