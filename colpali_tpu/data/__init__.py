from colpali_tpu.data.collator import VisualRetrieverCollator  # noqa: F401
from colpali_tpu.data.dataset import ColPaliEngineDataset, Corpus  # noqa: F401
from colpali_tpu.data.sampler import SingleDatasetBatchSampler  # noqa: F401
