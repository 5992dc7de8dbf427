from colpali_tpu.retrieval.store import CorpusIndex, DeviceIndexBuilder  # noqa: F401
