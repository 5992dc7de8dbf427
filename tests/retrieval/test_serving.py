"""Serving dispatch: batch-size routing + request micro-batching.

Covers retrieval/serving.py — the layer scripts/serve.py puts between HTTP
handler threads and the device. Key invariants: merging never changes
results; merged batch size (not per-request size) drives the exact/tiered
routing decision; errors propagate to every affected caller.
"""

import threading

import numpy as np
import pytest

from colpali_tpu.retrieval import CorpusIndex
from colpali_tpu.retrieval.serving import MicroBatcher, route, run_search


def _make_index(prefilter=None, n_docs=64, tokens=8, dim=32, seed=0):
    rng = np.random.default_rng(seed)
    docs = [rng.normal(size=(tokens, dim)).astype(np.float32) for _ in range(n_docs)]
    docs = [d / np.linalg.norm(d, axis=-1, keepdims=True) for d in docs]
    return CorpusIndex(docs, dtype="bf16", prefilter=prefilter), docs


class _FakeIndex:
    prefilter = "binary"


class TestRoute:
    def test_small_batch_tiered_on_prefilter_index(self):
        assert route(_FakeIndex(), 1) == "tiered"
        assert route(_FakeIndex(), 4) == "tiered"

    def test_large_batch_exact(self):
        assert route(_FakeIndex(), 5) == "exact"
        assert route(_FakeIndex(), 64) == "exact"

    def test_no_prefilter_always_exact(self):
        class NoPre:
            prefilter = None

        assert route(NoPre(), 1) == "exact"

    def test_explicit_modes(self):
        assert route(_FakeIndex(), 1, mode="exact") == "exact"
        assert route(_FakeIndex(), 100, mode="tiered") == "tiered"

        class NoPre:
            prefilter = None

        with pytest.raises(ValueError, match="tiered"):
            route(NoPre(), 1, mode="tiered")
        with pytest.raises(ValueError, match="unknown mode"):
            route(_FakeIndex(), 1, mode="bogus")


class TestRunSearch:
    def test_exact_route_bypasses_prefilter(self):
        index, docs = _make_index(prefilter="binary")
        queries = [d[:4] for d in docs[:6]]
        scores, ids = run_search(index, queries, k=3)  # 6 > threshold -> exact
        e_scores, e_ids = index.exact_search(queries, k=3)
        np.testing.assert_array_equal(ids, e_ids)
        np.testing.assert_allclose(scores, e_scores)

    def test_tiered_route_small_batch(self):
        index, docs = _make_index(prefilter="binary")
        scores, ids = run_search(index, [docs[3][:4]], k=3)
        assert ids[0, 0] == 3  # own tokens retrieve the doc


class TestMicroBatcher:
    def test_results_match_direct_search(self):
        index, docs = _make_index()
        mb = MicroBatcher(index, window_ms=0)
        try:
            queries = [docs[5][:4], docs[9][:4]]
            scores, ids = mb.search(queries, k=4)
            d_scores, d_ids = index.search(queries, k=4)
            np.testing.assert_array_equal(ids, d_ids)
            np.testing.assert_allclose(scores, d_scores)
        finally:
            mb.close()

    def test_concurrent_requests_merge_and_agree(self):
        index, docs = _make_index(prefilter="binary")
        mb = MicroBatcher(index, window_ms=20)
        results = {}
        errors = []

        def client(i):
            try:
                scores, ids = mb.search([docs[i][:4]], k=2)
                results[i] = ids[0, 0]
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        try:
            threads = [threading.Thread(target=client, args=(i,)) for i in range(12)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        finally:
            mb.close()
        assert not errors
        # every client got its own doc back regardless of merging
        assert results == {i: i for i in range(12)}

    def test_per_request_k_is_respected(self):
        index, docs = _make_index()
        mb = MicroBatcher(index, window_ms=20)
        out = {}

        def client(i, k):
            out[i] = mb.search([docs[i][:4]], k=k)

        try:
            threads = [
                threading.Thread(target=client, args=(0, 2)),
                threading.Thread(target=client, args=(1, 7)),
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        finally:
            mb.close()
        assert out[0][1].shape == (1, 2)
        assert out[1][1].shape == (1, 7)

    def test_merged_batch_routes_exact(self):
        """12 concurrent 1-query requests merge past the threshold -> the
        sweep must hit the exact kernel, not the prefilter."""
        index, docs = _make_index(prefilter="binary")
        calls = []
        orig_exact, orig_search = index.exact_search, index.search

        def spy_exact(*a, **kw):
            calls.append("exact")
            return orig_exact(*a, **kw)

        def spy_search(*a, **kw):
            calls.append("tiered")
            return orig_search(*a, **kw)

        index.exact_search, index.search = spy_exact, spy_search
        mb = MicroBatcher(index, window_ms=50)
        try:
            barrier = threading.Barrier(12)

            def client(i):
                barrier.wait()
                mb.search([docs[i][:4]], k=2)

            threads = [threading.Thread(target=client, args=(i,)) for i in range(12)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        finally:
            mb.close()
            index.exact_search, index.search = orig_exact, orig_search
        assert "exact" in calls  # at least one merged sweep went exact

    def test_error_propagates_to_all_callers(self):
        index, docs = _make_index()
        mb = MicroBatcher(index, window_ms=20)
        errs = []

        def client():
            try:
                # wrong dim -> the sweep raises; both callers must see it
                mb.search([np.ones((4, 7), np.float32)], k=2)
            except Exception as exc:  # noqa: BLE001
                errs.append(exc)

        try:
            threads = [threading.Thread(target=client) for _ in range(2)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        finally:
            mb.close()
        assert len(errs) == 2

    def test_closed_batcher_rejects(self):
        index, docs = _make_index()
        mb = MicroBatcher(index, window_ms=0)
        mb.close()
        with pytest.raises(RuntimeError, match="closed"):
            mb.search([docs[0][:4]], k=1)

    def test_empty_batch_rejected(self):
        index, _ = _make_index()
        mb = MicroBatcher(index, window_ms=0)
        try:
            with pytest.raises(ValueError, match="empty"):
                mb.search([], k=1)
        finally:
            mb.close()


class TestBucketedDispatch:
    """Merged sweeps pad to power-of-two buckets (compile-count bound);
    padding must never change delivered results."""

    def test_padded_merge_matches_direct(self, monkeypatch):
        import threading

        from colpali_tpu.retrieval import CorpusIndex
        from colpali_tpu.retrieval.serving import MicroBatcher, run_search

        rng = np.random.default_rng(3)
        docs = [rng.normal(size=(12, 32)).astype(np.float32) for _ in range(48)]
        index = CorpusIndex(docs, dtype="bf16")
        qs = [rng.normal(size=(6, 32)).astype(np.float32) for _ in range(3)]

        sweep_sizes = []
        orig = index.search

        def spy(queries, k=10, **kw):
            sweep_sizes.append(len(queries))
            return orig(queries, k=k, **kw)

        monkeypatch.setattr(index, "search", spy)
        mb = MicroBatcher(index, window_ms=20.0, exact_threshold=0)
        try:
            results = [None] * 3

            def go(i):
                results[i] = mb.search([qs[i]], k=5)

            ts = [threading.Thread(target=go, args=(i,)) for i in range(3)]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
        finally:
            mb.close()

        batcher_sweeps = list(sweep_sizes)  # the direct call below also hits the spy
        direct = run_search(index, qs, 5, mode="exact")
        for i in range(3):
            np.testing.assert_allclose(results[i][0][0], direct[0][i], atol=1e-3)
            np.testing.assert_array_equal(results[i][1][0], direct[1][i])
        # 3 concurrent B=1 requests within one 20 ms window -> sweeps padded
        # to powers of two (1, 2, or 4 — merge timing dependent), never 3
        assert batcher_sweeps and all(s & (s - 1) == 0 for s in batcher_sweeps)

    def test_static_sweep_shapes(self, monkeypatch):
        """Every sweep the device sees must have static shapes: query
        tokens zero-padded to query_token_pad and top-k pinned to the ONE
        k_bucket (capped at the corpus size) — so live traffic only ever
        hits warmup-compiled executables, whatever k each request asks."""
        from colpali_tpu.retrieval import CorpusIndex
        from colpali_tpu.retrieval.serving import MicroBatcher, run_search

        rng = np.random.default_rng(5)
        docs = [rng.normal(size=(12, 32)).astype(np.float32) for _ in range(48)]
        index = CorpusIndex(docs, dtype="bf16")

        seen = []  # (query token counts, k)
        orig = index.search

        def spy(queries, k=10, **kw):
            seen.append((sorted({q.shape[0] for q in queries}), k))
            return orig(queries, k=k, **kw)

        monkeypatch.setattr(index, "search", spy)
        mb = MicroBatcher(index, window_ms=0.0, exact_threshold=0,
                          query_token_pad=64)
        try:
            q9 = rng.normal(size=(9, 32)).astype(np.float32)
            scores, ids = mb.search([q9], k=5)
            scores2, ids2 = mb.search([q9], k=30)  # different k, same sweep shape
        finally:
            mb.close()
        # tokens 9 -> 64; k 5 AND k 30 -> min(k_bucket=128, num_docs=48) = 48
        assert seen == [([64], 48), ([64], 48)]
        assert scores.shape == (1, 5) and ids.shape == (1, 5)
        assert scores2.shape == (1, 30) and ids2.shape == (1, 30)
        # zero-token padding and the larger k are result-neutral
        direct = run_search(index, [q9], 5, mode="exact")
        np.testing.assert_allclose(scores[0], direct[0][0], atol=1e-3)
        np.testing.assert_array_equal(ids[0], direct[1][0])

    def test_oversize_query_falls_back(self, monkeypatch):
        """A request longer than query_token_pad must still work (per-sweep
        rounding fallback, no exception, exact results)."""
        from colpali_tpu.retrieval import CorpusIndex
        from colpali_tpu.retrieval.serving import MicroBatcher, run_search

        rng = np.random.default_rng(6)
        docs = [rng.normal(size=(12, 32)).astype(np.float32) for _ in range(48)]
        index = CorpusIndex(docs, dtype="bf16")
        mb = MicroBatcher(index, window_ms=0.0, exact_threshold=0,
                          query_token_pad=16)
        try:
            q40 = rng.normal(size=(40, 32)).astype(np.float32)
            scores, ids = mb.search([q40], k=5)
        finally:
            mb.close()
        direct = run_search(index, [q40], 5, mode="exact")
        np.testing.assert_allclose(scores[0], direct[0][0], atol=1e-3)
        np.testing.assert_array_equal(ids[0], direct[1][0])

    def test_warmup_compiles_buckets(self):
        from colpali_tpu.retrieval import CorpusIndex
        from colpali_tpu.retrieval.serving import MicroBatcher

        rng = np.random.default_rng(4)
        docs = [rng.normal(size=(8, 32)).astype(np.float32) for _ in range(16)]
        index = CorpusIndex(docs, dtype="bf16")
        mb = MicroBatcher(index, max_queries=8)
        try:
            mb.warmup()  # 1, 2, 4, 8 — must not raise
        finally:
            mb.close()

    def test_warmup_covers_every_live_shape(self):
        """After warmup() no live request may trigger a fresh fused-search
        trace: any k <= k_bucket, any batch bucket, auto OR forced exact,
        and tiered within the auto-threshold ceiling (incl. the bucket-8
        sweep a non-power-of-two threshold routes tiered)."""
        from colpali_tpu.retrieval import CorpusIndex
        from colpali_tpu.retrieval.serving import MicroBatcher

        rng = np.random.default_rng(7)
        docs = [rng.normal(size=(8, 32)).astype(np.float32) for _ in range(600)]
        index = CorpusIndex(docs, dtype="bf16", prefilter="binary")
        mb = MicroBatcher(index, window_ms=0.0, max_queries=8,
                          exact_threshold=6, query_token_pad=16)
        try:
            mb.warmup()
            warmed = set(index._jit_cache)
            q = rng.normal(size=(9, 32)).astype(np.float32)
            mb.search([q], k=10)                      # tiny k, auto->tiered
            mb.search([q], k=100, mode="exact")       # forced exact at B=1
            mb.search([q] * 5, k=10)                  # n=5 <= 6 -> tiered at bucket 8
            mb.search([q] * 7, k=10)                  # n=7 > 6 -> exact at bucket 8
            assert set(index._jit_cache) == warmed, \
                "live request compiled a shape warmup missed"
        finally:
            mb.close()
