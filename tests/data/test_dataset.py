"""Dataset/corpus tests (mirrors reference tests/data/test_dataset.py with
plain-dict fixtures)."""

import pytest

from colpali_tpu.data import ColPaliEngineDataset, Corpus


@pytest.fixture
def corpus():
    return Corpus([{"doc": f"document {i}"} for i in range(10)])


class TestCorpus:
    def test_retrieve_by_index(self, corpus):
        assert corpus.retrieve(3) == "document 3"

    def test_retrieve_by_mapping(self):
        c = Corpus(
            [{"doc": "a"}, {"doc": "b"}],
            docid_to_idx_mapping={"id_a": 0, "id_b": 1},
        )
        assert c.retrieve("id_b") == "b"

    def test_missing_column_raises(self):
        with pytest.raises(ValueError, match="must contain a column"):
            Corpus([{"text": "a"}])


class TestColPaliEngineDataset:
    def test_basic_sample(self):
        ds = ColPaliEngineDataset([{"query": "q0", "pos_target": "d0"}])
        sample = ds[0]
        assert sample["query"] == "q0"
        assert sample["pos_target"] == ["d0"]
        assert sample["neg_target"] is None

    def test_corpus_indirection(self, corpus):
        ds = ColPaliEngineDataset(
            [{"query": "q", "pos_target": [2], "negs": [0, 1, 3, 4, 5]}],
            corpus=corpus,
            neg_target_column_name="negs",
            num_negatives=3,
        )
        sample = ds[0]
        assert sample["pos_target"] == ["document 2"]
        assert len(sample["neg_target"]) == 3  # subsampled
        assert all(n.startswith("document") for n in sample["neg_target"])

    def test_take(self):
        ds = ColPaliEngineDataset([{"query": f"q{i}", "pos_target": f"d{i}"} for i in range(5)])
        sub = ds.take(2)
        assert len(sub) == 2 and sub[1]["query"] == "q1"

    def test_missing_column_raises(self):
        with pytest.raises(ValueError, match="query"):
            ColPaliEngineDataset([{"q": "x", "pos_target": "d"}])
