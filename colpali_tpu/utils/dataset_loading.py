"""Named HF-dataset training recipes.

Mirror of /root/reference/colpali_engine/utils/dataset_transformation.py:
the ViDoRe train set, the hard-negative IR variants (with the
``gold_in_top_100`` filter), docmatix-ir, wiki-ss, DocVQA, and a dummy local
set. Requires the ``datasets`` package and either network access or local
copies (``USE_LOCAL_DATASET=1`` points at paths instead of hub ids, like the
reference's env flag, dataset_transformation.py:9).
"""

from __future__ import annotations

import os
from typing import List

from colpali_tpu.data.dataset import ColPaliEngineDataset, Corpus

USE_LOCAL_DATASET = os.environ.get("USE_LOCAL_DATASET", "0") == "1"

TRAIN_SET_ID = "vidore/colpali_train_set"
DOCMATIX_IR_ID = "Tevatron/docmatix-ir"
WIKISS_ID = "Tevatron/wiki-ss-nq"
DOCVQA_ID = "HuggingFaceM4/DocumentVQA"


def _load(dataset_id: str, split: str = "train", **kwargs):
    from datasets import load_dataset

    return load_dataset(dataset_id, split=split, **kwargs)


def load_train_set(dataset_id: str = TRAIN_SET_ID) -> ColPaliEngineDataset:
    """ViDoRe training set: {query, image} pairs (reference :12-25)."""
    ds = _load(dataset_id)
    return ColPaliEngineDataset(ds, query_column_name="query", pos_target_column_name="image")


def load_train_set_ir(
    dataset_id: str,
    corpus_id: str,
    filter_gold_in_top_100: bool = True,
    num_negatives: int = 3,
) -> ColPaliEngineDataset:
    """Hard-negative IR format: queries with ``negative_passages`` docids into
    an external corpus; optionally keep only rows whose gold doc was found in
    the mined top-100 (reference :27-50)."""
    data = _load(dataset_id)
    if filter_gold_in_top_100 and "gold_in_top_100" in data.column_names:
        data = data.filter(lambda row: row["gold_in_top_100"])
    corpus_data = _load(corpus_id)
    corpus = Corpus(corpus_data, doc_column_name="image" if "image" in corpus_data.column_names else "doc")
    return ColPaliEngineDataset(
        data,
        corpus=corpus,
        query_column_name="query",
        pos_target_column_name="positive_passages",
        neg_target_column_name="negative_passages",
        num_negatives=num_negatives,
    )


def load_docmatix_ir_negs(num_negatives: int = 3) -> ColPaliEngineDataset:
    """Docmatix-IR with mined negatives (reference :114-128)."""
    return load_train_set_ir(DOCMATIX_IR_ID, f"{DOCMATIX_IR_ID}-corpus", num_negatives=num_negatives)


def load_wikiss(num_negatives: int = 3) -> ColPaliEngineDataset:
    """Wiki-SS-NQ screenshot retrieval (reference :130-175)."""
    return load_train_set_ir(WIKISS_ID, f"{WIKISS_ID}-corpus", num_negatives=num_negatives)


def load_docvqa_dataset(split: str = "train") -> ColPaliEngineDataset:
    """DocVQA as a retrieval set (reference :177-210)."""
    ds = _load(DOCVQA_ID, split=split)
    return ColPaliEngineDataset(ds, query_column_name="question", pos_target_column_name="image")


def load_dummy_dataset(n: int = 16, image_size: int = 64) -> ColPaliEngineDataset:
    """Synthetic offline dataset (reference :212-229) — no downloads."""
    import numpy as np

    rng = np.random.default_rng(0)
    data = [
        {
            "query": f"synthetic query {i}",
            "pos_target": rng.integers(0, 255, size=(image_size, image_size, 3), dtype=np.uint8),
        }
        for i in range(n)
    ]
    return ColPaliEngineDataset(data)


def load_multi_qa_datasets(dataset_ids: List[str]) -> List[ColPaliEngineDataset]:
    """Multiple QA datasets for the multi-dataset sampler (reference :231-255)."""
    return [load_train_set(d) for d in dataset_ids]


class TestSetFactory:
    """Named eval-set loader (reference :257-268)."""

    def __init__(self, dataset_path: str, split: str = "test"):
        self.dataset_path = dataset_path
        self.split = split

    def __call__(self):
        return _load(self.dataset_path, split=self.split)
