from colpali_tpu.retrieval.ingest import embed_pages_fused  # noqa: F401
from colpali_tpu.retrieval.store import CorpusIndex, DeviceIndexBuilder  # noqa: F401
