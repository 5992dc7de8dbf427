from colpali_tpu.processors.base import BaseVisualRetrieverProcessor  # noqa: F401
from colpali_tpu.processors.bi import (  # noqa: F401
    BiIdefics3Processor,
    BiPaliProcessor,
    BiQwen2_5_Processor,
    BiQwen2Processor,
    BiQwen3Processor,
)
from colpali_tpu.processors.colpali import ColPaliProcessor  # noqa: F401
from colpali_tpu.processors.gemma3 import (  # noqa: F401
    BiGemma3Processor,
    BiGemmaProcessor3,
    ColGemma3Processor,
    ColGemmaProcessor3,
)
from colpali_tpu.processors.idefics3 import ColIdefics3Processor  # noqa: F401
from colpali_tpu.processors.modernvbert import (  # noqa: F401
    BiModernVBertProcessor,
    ColModernVBertProcessor,
)
from colpali_tpu.processors.qwen2_5_vl import (  # noqa: F401
    ColQwen2_5_Processor,
    ColQwen2_5Processor,
)
from colpali_tpu.processors.qwen2_vl import ColQwen2Processor  # noqa: F401
from colpali_tpu.processors.qwen3_vl import (  # noqa: F401
    BiQwen3_5Processor,
    ColQwen3_5Processor,
    ColQwen3Processor,
)
from colpali_tpu.processors.qwen_omni import ColQwen2_5OmniProcessor  # noqa: F401
