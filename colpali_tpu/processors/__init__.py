from colpali_tpu.processors.base import BaseVisualRetrieverProcessor  # noqa: F401
from colpali_tpu.processors.colpali import ColPaliProcessor  # noqa: F401
from colpali_tpu.processors.idefics3 import ColIdefics3Processor  # noqa: F401
from colpali_tpu.processors.qwen2_5_vl import ColQwen2_5Processor  # noqa: F401
from colpali_tpu.processors.qwen_omni import ColQwen2_5OmniProcessor  # noqa: F401
from colpali_tpu.processors.qwen3_vl import ColQwen3Processor  # noqa: F401
from colpali_tpu.processors.qwen2_vl import ColQwen2Processor  # noqa: F401
