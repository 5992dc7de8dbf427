"""Model zoo: late-interaction (Col*) and bi-encoder (Bi*) visual retrievers.

Mirrors the reference's flat exports
(/root/reference/colpali_engine/models/__init__.py).
"""

from colpali_tpu.models.configs import (  # noqa: F401
    DenseHeadConfig,
    GemmaConfig,
    MultiVectorHeadConfig,
    PaliGemmaConfig,
    SiglipVisionConfig,
)
from colpali_tpu.models.gemma3 import (  # noqa: F401
    BiGemma3,
    ColGemma3,
    Gemma3Backbone,
    Gemma3Config,
    Gemma3TextConfig,
)
from colpali_tpu.models.idefics3 import (  # noqa: F401
    BiIdefics3,
    ColIdefics3,
    Idefics3Backbone,
    Idefics3Config,
    Idefics3VisionConfig,
)
from colpali_tpu.models.modernvbert import (  # noqa: F401
    BiModernVBert,
    ColModernVBert,
    ModernBertTextConfig,
    ModernVBertConfig,
    ModernVBertForMaskedLM,
    ModernVBertModel,
)
from colpali_tpu.models.paligemma import (  # noqa: F401
    BiPali,
    BiPaliProj,
    ColPali,
    PaliGemmaBackbone,
)
from colpali_tpu.models.qwen_omni import (  # noqa: F401
    BiQwen2_5Omni,
    ColQwen2_5Omni,
    OmniAudioConfig,
    QwenOmniConfig,
)
from colpali_tpu.models.qwen3_5 import (  # noqa: F401
    BiQwen3_5,
    ColQwen3_5,
    Qwen35TextConfig,
    Qwen35VLConfig,
)
from colpali_tpu.models.qwen3_vl import (  # noqa: F401
    BiQwen3,
    ColQwen3,
    Qwen3TextConfig,
    Qwen3VLBackbone,
    Qwen3VLConfig,
    Qwen3VLVisionConfig,
)
from colpali_tpu.models.qwen2_5_vl import (  # noqa: F401
    BiQwen2_5,
    ColQwen2_5,
    Qwen25VLBackbone,
    Qwen25VLConfig,
    Qwen25VLVisionConfig,
)
from colpali_tpu.models.qwen2_vl import (  # noqa: F401
    BiQwen2,
    ColQwen2,
    Qwen2TextConfig,
    Qwen2VLBackbone,
    Qwen2VLConfig,
    Qwen2VLVisionConfig,
)
