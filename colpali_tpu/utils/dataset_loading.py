"""Named HF-dataset training recipes.

Mirror of /root/reference/colpali_engine/utils/dataset_transformation.py:
the ViDoRe train set (:12-18), the hard-negative IR set over manu/colpali-*
(:27-50), the vidore mixture recipes (:53-111, :145-174), docmatix-ir
(:114-127), wiki-ss (:130-142), DocVQA (:177-209), the multilingual QA
mixture (:231-254) and a dummy offline set (:212-228).

Hub wiring is pinned 1:1 to the reference (and locked by
tests/utils/test_dataset_loading.py which mocks ``datasets.load_dataset``):

==================  =====================================================
recipe              hub ids (reference line)
==================  =====================================================
train_set           vidore/colpali_train_set                 (:12-18)
train_set_ir        manu/colpali-queries + manu/colpali-corpus (:27-50)
docmatix_ir_negs    Tevatron/docmatix-ir +
                    HuggingFaceM4/Docmatix ("images" config) (:114-127)
wikiss              Tevatron/wiki-ss-nq (data_files=train.jsonl) +
                    HuggingFaceM4/wiki-ss-corpus             (:130-142)
docvqa              lmms-lab/DocVQA (DocVQA + InfographicVQA) (:177-209)
multi_qa            vidore/colpali_train_set +
                    llamaindex/vdr-multilingual-train xN     (:231-254)
==================  =====================================================

``USE_LOCAL_DATASET=1`` swaps hub org prefixes for ``./data_dir/`` exactly
like the reference's env flag (dataset_transformation.py:9).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence

from colpali_tpu.data.dataset import ColPaliEngineDataset, Corpus


def _use_local() -> bool:
    # Read per-call (not import time) so tests / late env changes work.
    return os.environ.get("USE_LOCAL_DATASET", "0") == "1"


def _prefix(org: str) -> str:
    """Hub org prefix, or the reference's local data_dir override."""
    return "./data_dir/" if _use_local() else org


def _load(dataset_id: str, split: Optional[str] = "train", **kwargs):
    from datasets import load_dataset

    return load_dataset(dataset_id, split=split, **kwargs)


def _build_docid_mapping(corpus_data) -> Optional[Dict[Any, int]]:
    """docid -> row index when the corpus carries an explicit docid column."""
    try:
        cols = corpus_data.column_names  # HF dataset
    except AttributeError:
        cols = list(corpus_data[0].keys()) if len(corpus_data) else []
    if "docid" in cols:
        return {docid: i for i, docid in enumerate(corpus_data["docid"])}
    return None


def load_train_set(dataset_id: Optional[str] = None) -> ColPaliEngineDataset:
    """ViDoRe training set: {query, image} pairs (reference :12-18)."""
    ds = _load(dataset_id or _prefix("vidore/") + "colpali_train_set")
    return ColPaliEngineDataset(ds, query_column_name="query", pos_target_column_name="image")


def load_train_set_ir(num_negs: int = 0) -> ColPaliEngineDataset:
    """Hard-negative IR training over the ColPali corpus (reference :27-50):
    ``manu/colpali-queries`` rows hold ``positive_passages`` /
    ``negative_passages`` docids into ``manu/colpali-corpus``; rows whose gold
    doc was not found in the mined top-100 are dropped, and negatives are
    trimmed to ``num_negs``."""
    corpus_data = _load(_prefix("manu/") + "colpali-corpus")
    corpus = Corpus(corpus_data=corpus_data, doc_column_name="image")

    data = _load(_prefix("manu/") + "colpali-queries")
    data = data.filter(lambda row: row["gold_in_top_100"])
    if num_negs > 0:
        data = data.map(lambda row: {"negative_passages": row["negative_passages"][:num_negs]})

    return ColPaliEngineDataset(
        data,
        corpus=corpus,
        query_column_name="query",
        pos_target_column_name="positive_passages",
        neg_target_column_name="negative_passages" if num_negs else None,
        num_negatives=num_negs,
    )


def load_docmatix_ir_negs(num_negatives: int = 3) -> ColPaliEngineDataset:
    """Docmatix-IR with mined negatives (reference :114-127): queries from
    ``Tevatron/docmatix-ir``, documents from ``HuggingFaceM4/Docmatix``'s
    "images" config (the corpus the reference anchors against — NOT a
    nonexistent ``*-corpus`` hub id)."""
    data = _load(_prefix("Tevatron/") + "docmatix-ir")
    corpus_data = _load(_prefix("HuggingFaceM4/") + "Docmatix", name="images")
    corpus = Corpus(
        corpus_data=corpus_data,
        docid_to_idx_mapping=_build_docid_mapping(corpus_data),
        doc_column_name="images",
    )
    return ColPaliEngineDataset(
        data,
        corpus=corpus,
        query_column_name="query",
        pos_target_column_name="positive_passages",
        neg_target_column_name="negative_passages",
        num_negatives=num_negatives,
    )


def load_wikiss(num_negatives: int = 3) -> ColPaliEngineDataset:
    """Wiki-SS-NQ screenshot retrieval (reference :130-142): queries from
    ``Tevatron/wiki-ss-nq`` (``data_files="train.jsonl"``), documents from
    ``HuggingFaceM4/wiki-ss-corpus``."""
    data = _load(_prefix("Tevatron/") + "wiki-ss-nq", data_files="train.jsonl")
    corpus_data = _load(_prefix("HuggingFaceM4/") + "wiki-ss-corpus")
    corpus = Corpus(
        corpus_data=corpus_data,
        docid_to_idx_mapping=_build_docid_mapping(corpus_data),
        doc_column_name="image",
    )
    return ColPaliEngineDataset(
        data,
        corpus=corpus,
        query_column_name="query",
        pos_target_column_name="positive_passages",
        neg_target_column_name="negative_passages",
        num_negatives=num_negatives,
    )


# --- vidore mixture recipes (reference :53-111, :145-174) -------------------

_DETAILED_PATHS = [
    "infovqa_train",
    "docvqa_train",
    "arxivqa_train",
    "tatdqa_train",
    "syntheticDocQA_government_reports_train",
    "syntheticDocQA_healthcare_industry_train",
    "syntheticDocQA_artificial_intelligence_train",
    "syntheticDocQA_energy_train",
]
_TABFQUAD_PATH = "tabfquad_train_subsampled"
_DOCMATIX_FILTERED_PATH = "Docmatix_filtered_train"


def _load_vidore_mixture(paths: Sequence[str], eval_size: int = 500):
    """Concatenate vidore sub-datasets, shuffle, split off an eval head
    (reference :64-79). arxivqa is subsampled to 10k like the reference."""
    from datasets import DatasetDict, concatenate_datasets

    parts = []
    for path in paths:
        ds = _load(_prefix("vidore/") + path)
        if "arxivqa" in path:
            ds = ds.shuffle(42).select(range(10000))
        parts.append(ds)
    dataset = concatenate_datasets(parts).shuffle(seed=42)
    dataset_eval = dataset.select(range(eval_size))
    dataset = dataset.select(range(eval_size, len(dataset)))
    return DatasetDict({"train": dataset, "test": dataset_eval})


def load_train_set_detailed():
    """The 8-source vidore mixture (reference :53-80)."""
    return _load_vidore_mixture(_DETAILED_PATHS)


def load_train_set_with_tabfquad():
    """Detailed mixture + tabfquad (reference :83-111)."""
    paths = _DETAILED_PATHS[:4] + [_TABFQUAD_PATH] + _DETAILED_PATHS[4:]
    return _load_vidore_mixture(paths)


def load_train_set_with_docmatix():
    """Detailed mixture + tabfquad + filtered Docmatix (reference :145-174)."""
    paths = _DETAILED_PATHS[:4] + [_TABFQUAD_PATH] + _DETAILED_PATHS[4:] + [_DOCMATIX_FILTERED_PATH]
    return _load_vidore_mixture(paths)


def load_docvqa_dataset() -> ColPaliEngineDataset:
    """DocVQA + InfographicVQA from lmms-lab/DocVQA as a retrieval set
    (reference :177-209): validation splits concatenated, ``question``
    renamed to ``query``."""
    from datasets import concatenate_datasets

    if _use_local():
        doc = _load("./data_dir/DocVQA", split="validation", name="DocVQA")
        info = _load("./data_dir/DocVQA", split="validation", name="InfographicVQA")
    else:
        doc = _load("lmms-lab/DocVQA", split="validation", name="DocVQA")
        info = _load("lmms-lab/DocVQA", split="validation", name="InfographicVQA")
    dataset = concatenate_datasets([doc, info]).rename_column("question", "query")
    return ColPaliEngineDataset(dataset, query_column_name="query", pos_target_column_name="image")


def load_dummy_dataset(n: int = 16, image_size: int = 64) -> ColPaliEngineDataset:
    """Synthetic offline dataset (reference :212-228) — no downloads."""
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


_MULTI_QA_ARGS = [
    ("vidore/colpali_train_set",),
    ("llamaindex/vdr-multilingual-train", "de"),
    ("llamaindex/vdr-multilingual-train", "en"),
    ("llamaindex/vdr-multilingual-train", "es"),
    ("llamaindex/vdr-multilingual-train", "fr"),
    ("llamaindex/vdr-multilingual-train", "it"),
]


def load_multi_qa_datasets(dataset_args: Optional[Sequence[tuple]] = None) -> Dict[str, ColPaliEngineDataset]:
    """The multilingual QA mixture for the multi-dataset sampler
    (reference :231-254): ViDoRe train + vdr-multilingual language configs.
    Returns ``{name: dataset}`` for ``SingleDatasetBatchSampler``."""
    from datasets import load_dataset

    out: Dict[str, ColPaliEngineDataset] = {}
    for args in dataset_args if dataset_args is not None else _MULTI_QA_ARGS:
        name = "_".join(args)
        ds = load_dataset(*args)
        split = ds["train"] if hasattr(ds, "keys") and "train" in ds else ds
        out[name] = ColPaliEngineDataset(split, query_column_name="query", pos_target_column_name="image")
    return out


class TestSetFactory:
    """Named eval-set loader (reference :257-263)."""

    def __init__(self, dataset_path: str, split: str = "test"):
        self.dataset_path = dataset_path
        self.split = split

    def __call__(self):
        return _load(self.dataset_path, split=self.split)
