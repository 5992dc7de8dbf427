"""Metric + evaluator tests."""

import numpy as np
import pytest

from colpali_tpu.evaluation import evaluate_retrieval, mrr_at_k, ndcg_at_k, recall_at_k


class TestMetrics:
    def test_ndcg_perfect_ranking(self):
        assert ndcg_at_k([3, 1, 2], [3], k=5) == pytest.approx(1.0)

    def test_ndcg_rank2(self):
        got = ndcg_at_k([1, 3, 2], [3], k=5)
        assert got == pytest.approx(1.0 / np.log2(3))

    def test_ndcg_graded(self):
        rel = {1: 2.0, 2: 1.0}
        perfect = ndcg_at_k([1, 2], rel, k=2)
        swapped = ndcg_at_k([2, 1], rel, k=2)
        assert perfect == pytest.approx(1.0)
        assert swapped < perfect

    def test_recall(self):
        assert recall_at_k([1, 2, 3], [2, 9], k=3) == pytest.approx(0.5)
        assert recall_at_k([9, 2], [2, 9], k=2) == pytest.approx(1.0)

    def test_mrr(self):
        assert mrr_at_k([5, 7, 3], [3], k=10) == pytest.approx(1 / 3)
        assert mrr_at_k([5, 7], [3], k=2) == 0.0


class TestEvaluator:
    def test_self_retrieval_is_perfect(self):
        rng = np.random.default_rng(0)
        docs = [rng.normal(size=(8, 16)).astype(np.float32) for _ in range(10)]
        docs = [d / np.linalg.norm(d, axis=-1, keepdims=True) for d in docs]
        queries = [d[:4].copy() for d in docs[:5]]  # query i == subset of doc i
        relevance = [[i] for i in range(5)]
        metrics = evaluate_retrieval(queries, docs, relevance, k_values=(1, 5))
        assert metrics["ndcg@1"] == pytest.approx(1.0)
        assert metrics["recall@5"] == pytest.approx(1.0)
        assert metrics["mrr@5"] == pytest.approx(1.0)
