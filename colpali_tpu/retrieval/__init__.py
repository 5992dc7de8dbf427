from colpali_tpu.retrieval.store import CorpusIndex  # noqa: F401
