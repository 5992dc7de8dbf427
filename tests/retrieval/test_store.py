"""CorpusIndex tests (CPU fallback path + sharded-mesh placement)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from colpali_tpu.ops.maxsim import score_multi_vector
from colpali_tpu.retrieval import CorpusIndex


@pytest.fixture
def corpus():
    rng = np.random.default_rng(0)
    docs = [rng.normal(size=(n, 32)).astype(np.float32) for n in (10, 25, 17, 8, 30)]
    docs = [d / np.linalg.norm(d, axis=-1, keepdims=True) for d in docs]
    queries = [rng.normal(size=(n, 32)).astype(np.float32) for n in (5, 7)]
    queries = [q / np.linalg.norm(q, axis=-1, keepdims=True) for q in queries]
    return docs, queries


class TestCorpusIndex:
    def test_score_matches_score_multi_vector(self, corpus):
        docs, queries = corpus
        index = CorpusIndex(docs, dtype="bf16")
        got = index.score(queries)
        # both pad docs to the same bucket -> same zero-padding semantics
        expected = score_multi_vector(queries, docs, token_pad_multiple=index.doc_tokens)
        np.testing.assert_allclose(got, expected, rtol=2e-2, atol=2e-2)  # bf16 storage

    def test_search_topk(self, corpus):
        docs, queries = corpus
        index = CorpusIndex(docs, dtype="bf16")
        scores, idx = index.search(queries, k=3)
        assert scores.shape == (2, 3) and idx.shape == (2, 3)
        full = index.score(queries)
        expected_idx = np.argsort(-full, axis=1)[:, :3]
        np.testing.assert_array_equal(idx, expected_idx)
        assert (idx < len(docs)).all()  # padded fake docs never returned

    def test_int8_index(self, corpus):
        docs, queries = corpus
        bf16 = CorpusIndex(docs, dtype="bf16")
        int8 = CorpusIndex(docs, dtype="int8")
        s_bf16 = bf16.score(queries)
        s_int8 = int8.score(queries)
        np.testing.assert_allclose(s_int8, s_bf16, rtol=0.05, atol=0.3)
        assert int8.nbytes < bf16.nbytes

    def test_k_clamped_to_corpus(self, corpus):
        docs, queries = corpus
        index = CorpusIndex(docs)
        scores, idx = index.search(queries, k=100)
        assert scores.shape == (2, len(docs))

    def test_sharded_mesh_placement(self, corpus):
        docs, queries = corpus
        devices = np.array(jax.devices()[:8]).reshape(8)
        mesh = Mesh(devices, ("data",))
        index = CorpusIndex(docs, dtype="bf16", mesh=mesh)
        # padded doc count must be divisible by DOC_TILE * n_devices
        assert index.padded_docs % (128 * 8) == 0
        scores, idx = index.search(queries, k=2)
        full = index.score(queries)
        expected_idx = np.argsort(-full, axis=1)[:, :2]
        np.testing.assert_array_equal(idx, expected_idx)


class TestBuildAndPersistence:
    """Chunked build + save/load (VERDICT r1 weak #5)."""

    @pytest.fixture
    def corpus(self):
        rng = np.random.default_rng(3)
        docs = [rng.normal(size=(n, 32)).astype(np.float32) for n in (10, 25, 17, 8, 30)]
        docs = [d / np.linalg.norm(d, axis=-1, keepdims=True) for d in docs]
        queries = [rng.normal(size=(n, 32)).astype(np.float32) for n in (5, 7)]
        queries = [q / np.linalg.norm(q, axis=-1, keepdims=True) for q in queries]
        return docs, queries

    @pytest.mark.parametrize("dtype", ["bf16", "int8"])
    def test_chunked_build_matches_single_chunk(self, dtype, monkeypatch):
        rng = np.random.default_rng(11)
        # 300 docs spans 3 tiles -> 3 chunks at chunk size 128 (incl. a ragged tail)
        docs = [rng.normal(size=(rng.integers(2, 9), 32)).astype(np.float32) for _ in range(300)]
        ref = CorpusIndex(docs, dtype=dtype)
        monkeypatch.setattr(CorpusIndex, "_BUILD_CHUNK_DOCS", 128)
        chunked = CorpusIndex(docs, dtype=dtype)
        np.testing.assert_array_equal(np.asarray(chunked._store), np.asarray(ref._store))
        if dtype == "int8":
            np.testing.assert_array_equal(np.asarray(chunked._scales), np.asarray(ref._scales))

    def test_truncation_requires_opt_in(self, corpus):
        docs, _ = corpus
        with pytest.raises(ValueError, match="truncate"):
            CorpusIndex(docs, doc_tokens=8)
        index = CorpusIndex(docs, doc_tokens=8, truncate=True)
        assert index.doc_tokens == 16  # rounded up to the pad multiple

    @pytest.mark.parametrize("dtype", ["bf16", "int8"])
    def test_save_load_round_trip(self, corpus, dtype, tmp_path):
        docs, queries = corpus
        index = CorpusIndex(docs, dtype=dtype)
        path = str(tmp_path / "corpus.idx.npz")
        index.save(path)
        loaded = CorpusIndex.load(path)
        assert (loaded.num_docs, loaded.doc_tokens, loaded.dim, loaded.dtype) == (
            index.num_docs,
            index.doc_tokens,
            index.dim,
            dtype,
        )
        np.testing.assert_array_equal(np.asarray(loaded._store), np.asarray(index._store))
        np.testing.assert_array_equal(loaded.score(queries), index.score(queries))

    def test_load_onto_mesh(self, corpus, tmp_path):
        docs, queries = corpus
        index = CorpusIndex(docs, dtype="int8", mesh=Mesh(np.array(jax.devices()[:8]), ("data",)))
        path = str(tmp_path / "sharded.idx.npz")
        index.save(path)
        loaded = CorpusIndex.load(path, mesh=Mesh(np.array(jax.devices()[:4]), ("data",)))
        np.testing.assert_array_equal(loaded.score(queries), index.score(queries))

    def test_save_requires_npz_suffix(self, corpus, tmp_path):
        docs, _ = corpus
        with pytest.raises(ValueError, match="npz"):
            CorpusIndex(docs).save(str(tmp_path / "corpus.idx"))


class TestKernelServingPath:
    """The production branch: Pallas kernels (interpret mode on CPU) under
    shard_map over the 8-device mesh — VERDICT r1 weak #2. These fail if the
    shard_map in/out specs or the kernel signatures rot."""

    @pytest.fixture
    def corpus(self):
        rng = np.random.default_rng(7)
        docs = [rng.normal(size=(n, 32)).astype(np.float32) for n in (10, 25, 17, 8, 30)]
        docs = [d / np.linalg.norm(d, axis=-1, keepdims=True) for d in docs]
        queries = [rng.normal(size=(n, 32)).astype(np.float32) for n in (5, 7)]
        queries = [q / np.linalg.norm(q, axis=-1, keepdims=True) for q in queries]
        return docs, queries

    @pytest.fixture
    def mesh(self):
        return Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))

    def test_bf16_kernel_single_device(self, corpus):
        docs, queries = corpus
        exact = CorpusIndex(docs, dtype="bf16", force_kernel=False)
        kern = CorpusIndex(docs, dtype="bf16", force_kernel=True)
        np.testing.assert_allclose(kern.score(queries), exact.score(queries), rtol=2e-2, atol=2e-2)

    def test_bf16_kernel_sharded_matches_exact(self, corpus, mesh):
        docs, queries = corpus
        exact = CorpusIndex(docs, dtype="bf16", force_kernel=False)
        kern = CorpusIndex(docs, dtype="bf16", mesh=mesh, force_kernel=True)
        np.testing.assert_allclose(kern.score(queries), exact.score(queries), rtol=2e-2, atol=2e-2)
        # global top-k over doc-sharded scores, padded fake docs masked
        scores, idx = kern.search(queries, k=3)
        _, exact_idx = exact.search(queries, k=3)
        np.testing.assert_array_equal(idx, exact_idx)
        assert (idx < len(docs)).all()

    def test_int8mxu_kernel_sharded_matches_exact(self, corpus, mesh):
        docs, queries = corpus
        exact = CorpusIndex(docs, dtype="int8", force_kernel=False)
        kern = CorpusIndex(docs, dtype="int8", mesh=mesh, force_kernel=True)
        # kernel path also quantizes queries -> extra ~1/127 error vs fallback
        np.testing.assert_allclose(kern.score(queries), exact.score(queries), rtol=0.05, atol=0.3)
        _, idx = kern.search(queries, k=1)
        _, exact_idx = exact.search(queries, k=1)
        np.testing.assert_array_equal(idx, exact_idx)

    def test_int8_dequant_kernel_sharded_matches_exact(self, corpus, mesh):
        docs, queries = corpus
        exact = CorpusIndex(docs, dtype="int8", force_kernel=False)
        kern = CorpusIndex(
            docs, dtype="int8", mesh=mesh, force_kernel=True, quantize_queries=False
        )
        np.testing.assert_allclose(kern.score(queries), exact.score(queries), rtol=2e-2, atol=0.1)


class TestBinaryPrefilter:
    """Two-tier search: binary coarse pass -> exact rerank (VERDICT r1 #8)."""

    @pytest.fixture
    def corpus(self):
        """Planted-relevance corpus: exact top-3 per query is unambiguous and
        sign-sketch-recoverable (noisy copies of the query tokens)."""
        rng = np.random.default_rng(5)
        d = 32
        queries = rng.normal(size=(2, 6, d)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=-1, keepdims=True)
        docs = []
        for b in range(2):
            for _ in range(3):
                doc = queries[b] + 0.1 * rng.normal(size=(6, d)).astype(np.float32)
                docs.append(doc / np.linalg.norm(doc, axis=-1, keepdims=True))
        for _ in range(200):
            n = int(rng.integers(4, 10))
            doc = rng.normal(size=(n, d)).astype(np.float32)
            docs.append(doc / np.linalg.norm(doc, axis=-1, keepdims=True))
        return docs, list(queries)

    @pytest.mark.parametrize("dtype", ["bf16", "int8"])
    def test_two_tier_matches_exact_search(self, corpus, dtype):
        docs, queries = corpus
        exact = CorpusIndex(docs, dtype=dtype)
        tiered = CorpusIndex(docs, dtype=dtype, prefilter="binary")
        e_scores, e_idx = exact.search(queries, k=3)
        t_scores, t_idx = tiered.search(queries, k=3, candidates=32)
        np.testing.assert_array_equal(t_idx, e_idx)
        # rerank scores are exact (fp32 dequant einsum vs the serving kernel)
        np.testing.assert_allclose(t_scores, e_scores, rtol=2e-2, atol=0.1)
        assert (t_idx < len(docs)).all()

    def test_sharded_two_tier_kernel_path(self, corpus):
        """The production TPU branch: Pallas binary kernel (interpret mode)
        under shard_map, per-shard rerank, global merge."""
        docs, queries = corpus
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        exact = CorpusIndex(docs, dtype="int8", force_kernel=False)
        tiered = CorpusIndex(docs, dtype="int8", mesh=mesh, prefilter="binary", force_kernel=True)
        _, e_idx = exact.search(queries, k=3)
        t_scores, t_idx = tiered.search(queries, k=3, candidates=16)
        np.testing.assert_array_equal(t_idx, e_idx)
        assert (t_idx < len(docs)).all()

    def test_save_load_keeps_prefilter(self, corpus, tmp_path):
        docs, queries = corpus
        index = CorpusIndex(docs, dtype="int8", prefilter="binary")
        path = str(tmp_path / "tiered.idx.npz")
        index.save(path)
        loaded = CorpusIndex.load(path)
        assert loaded.prefilter == "binary"
        np.testing.assert_array_equal(np.asarray(loaded._bwords), np.asarray(index._bwords))
        s0, i0 = index.search(queries, k=3, candidates=32)
        s1, i1 = loaded.search(queries, k=3, candidates=32)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_array_equal(s0, s1)

    def test_candidates_requires_prefilter(self, corpus):
        docs, queries = corpus
        with pytest.raises(ValueError, match="prefilter"):
            CorpusIndex(docs).search(queries, k=3, candidates=32)

    def test_binary_store_is_smaller(self, corpus):
        docs, _ = corpus
        plain = CorpusIndex(docs, dtype="int8")
        tiered = CorpusIndex(docs, dtype="int8", prefilter="binary")
        # words are dim/8 bytes + 4-byte mask per token: a small fraction of
        # the 1-byte-per-component int8 store
        assert tiered.nbytes - plain.nbytes < plain.nbytes // 3

    def test_bf16_two_tier_kernel_path(self, corpus):
        """bf16 store (no scales) through the Pallas coarse + gather kernels."""
        docs, queries = corpus
        exact = CorpusIndex(docs, dtype="bf16", force_kernel=False)
        tiered = CorpusIndex(docs, dtype="bf16", prefilter="binary", force_kernel=True)
        _, e_idx = exact.search(queries, k=3)
        _, t_idx = tiered.search(queries, k=3, candidates=32)
        np.testing.assert_array_equal(t_idx, e_idx)

    def test_estimate_recall_planted_corpus(self, corpus):
        docs, queries = corpus
        rng = np.random.default_rng(9)
        many = docs + [
            x / np.linalg.norm(x, axis=-1, keepdims=True)
            for x in rng.normal(size=(300, 8, 32)).astype(np.float32)
        ]
        index = CorpusIndex(many, dtype="int8", prefilter="binary")
        # queries correlated with the planted docs -> coarse pass keeps them
        qs = [d[:4] for d in docs[:3]]
        assert index.estimate_recall(qs, k=3, candidates=64) == 1.0

    def test_tune_candidates_reaches_target_and_pins_default(self):
        """On an adversarial (pure-random, undifferentiated-score) corpus the
        doubling loop must grow the shortlist until measured recall hits the
        target, then pin it as the search() default (round-2 weak #4: a fixed
        default could silently serve near-zero recall)."""
        rng = np.random.default_rng(10)
        docs = rng.normal(size=(500, 6, 32)).astype(np.float32)
        docs /= np.linalg.norm(docs, axis=-1, keepdims=True)
        index = CorpusIndex(list(docs), dtype="int8", prefilter="binary")
        qs = rng.normal(size=(4, 4, 32)).astype(np.float32)
        qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
        cand, recall = index.tune_candidates(list(qs), k=5, target_recall=1.0)
        assert recall == 1.0
        assert index.default_candidates == cand
        # the pinned default now drives search(candidates=None): exact top-k
        _, tiered = index.search(list(qs), k=5)
        _, exact = index.exact_search(list(qs), k=5)
        np.testing.assert_array_equal(tiered, exact)

    def test_estimate_recall_requires_prefilter(self, corpus):
        docs, queries = corpus
        index = CorpusIndex(docs, dtype="bf16")
        with pytest.raises(ValueError, match="prefilter"):
            index.estimate_recall(queries)
        with pytest.raises(ValueError, match="prefilter"):
            index.tune_candidates(queries)


class TestCoarsePooledSketch:
    """coarse_pool: the sign sketch covers mean-pooled token GROUPS (the
    coarse pass is VPU-compute-bound — docs/PERF.md — so its cost and bytes
    shrink by the factor); the exact store and rerank are untouched."""

    @pytest.fixture
    def corpus(self):
        rng = np.random.default_rng(5)
        d = 32
        queries = rng.normal(size=(2, 6, d)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=-1, keepdims=True)
        docs = []
        for b in range(2):
            for _ in range(3):
                doc = queries[b] + 0.1 * rng.normal(size=(6, d)).astype(np.float32)
                docs.append(doc / np.linalg.norm(doc, axis=-1, keepdims=True))
        for _ in range(200):
            n = int(rng.integers(4, 10))
            doc = rng.normal(size=(n, d)).astype(np.float32)
            docs.append(doc / np.linalg.norm(doc, axis=-1, keepdims=True))
        return docs, list(queries)

    @pytest.mark.parametrize("factor", [2, 4])
    def test_pooled_two_tier_matches_exact_search(self, corpus, factor):
        docs, queries = corpus
        exact = CorpusIndex(docs, dtype="int8")
        tiered = CorpusIndex(docs, dtype="int8", prefilter="binary", coarse_pool=factor)
        e_scores, e_idx = exact.search(queries, k=3)
        t_scores, t_idx = tiered.search(queries, k=3, candidates=64)
        np.testing.assert_array_equal(t_idx, e_idx)
        np.testing.assert_allclose(t_scores, e_scores, rtol=2e-2, atol=0.1)

    def test_pooled_sketch_shrinks_by_factor(self, corpus):
        docs, _ = corpus
        full = CorpusIndex(docs, dtype="int8", prefilter="binary")
        pooled = CorpusIndex(docs, dtype="int8", prefilter="binary", coarse_pool=4)
        assert pooled._bwords.shape[2] * 4 == full._bwords.shape[2]
        assert pooled.coarse_pool == 4 and full.coarse_pool == 1

    def test_save_load_keeps_coarse_pool(self, corpus, tmp_path):
        docs, queries = corpus
        index = CorpusIndex(docs, dtype="int8", prefilter="binary", coarse_pool=2)
        path = str(tmp_path / "pooled.idx.npz")
        index.save(path)
        loaded = CorpusIndex.load(path)
        assert loaded.coarse_pool == 2
        np.testing.assert_array_equal(np.asarray(loaded._bwords), np.asarray(index._bwords))
        s0, i0 = index.search(queries, k=3, candidates=64)
        s1, i1 = loaded.search(queries, k=3, candidates=64)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_array_equal(s0, s1)

    def test_device_builder_matches_host_build(self, corpus):
        import jax.numpy as jnp

        from colpali_tpu.retrieval import DeviceIndexBuilder

        docs, _ = corpus
        ref = CorpusIndex(docs, dtype="int8", doc_tokens=16, prefilter="binary", coarse_pool=4)
        builder = DeviceIndexBuilder(
            doc_tokens=16, dim=32, dtype="int8", prefilter="binary", coarse_pool=4
        )
        for i in range(0, len(docs), 7):
            chunk = docs[i : i + 7]
            s = max(x.shape[0] for x in chunk)
            padded = np.zeros((len(chunk), s, 32), np.float32)
            mask = np.zeros((len(chunk), s), bool)
            for j, x in enumerate(chunk):
                padded[j, : x.shape[0]] = x
                mask[j, : x.shape[0]] = True
            builder.add(jnp.asarray(padded), jnp.asarray(mask))
        index = builder.build()
        assert index.coarse_pool == 4
        np.testing.assert_array_equal(np.asarray(index._bwords), np.asarray(ref._bwords))
        np.testing.assert_array_equal(np.asarray(index._store), np.asarray(ref._store))

    def test_extend_preserves_pooled_sketch(self, corpus):
        docs, queries = corpus
        index = CorpusIndex(docs[:100], dtype="int8", prefilter="binary", coarse_pool=2)
        index.extend(docs[100:])
        scratch = CorpusIndex(
            docs, dtype="int8", doc_tokens=index.doc_tokens, prefilter="binary", coarse_pool=2
        )
        _, i0 = index.search(queries, k=3, candidates=64)
        _, i1 = scratch.search(queries, k=3, candidates=64)
        np.testing.assert_array_equal(i0, i1)

    def test_sharded_pooled_kernel_path(self, corpus):
        """Pooled sketch through the Pallas coarse kernel (interpret) under
        shard_map — the production multi-chip serving branch."""
        docs, queries = corpus
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        exact = CorpusIndex(docs, dtype="int8", force_kernel=False)
        tiered = CorpusIndex(
            docs, dtype="int8", mesh=mesh, prefilter="binary", coarse_pool=2, force_kernel=True
        )
        _, e_idx = exact.search(queries, k=3)
        _, t_idx = tiered.search(queries, k=3, candidates=24)
        np.testing.assert_array_equal(t_idx, e_idx)

    def test_coarse_pool_validation(self, corpus):
        docs, _ = corpus
        with pytest.raises(ValueError, match="coarse_pool"):
            CorpusIndex(docs, dtype="int8", coarse_pool=2)  # no prefilter
        with pytest.raises(ValueError, match="divide"):
            CorpusIndex(docs, dtype="int8", prefilter="binary", coarse_pool=5)
        from colpali_tpu.retrieval import DeviceIndexBuilder

        with pytest.raises(ValueError, match="coarse_pool"):
            DeviceIndexBuilder(doc_tokens=16, dim=32, coarse_pool=2)

    def test_sharded_fake_doc_shards_never_win(self):
        """Shards holding only padding (num_docs << padded_docs) must not
        emit fake doc ids even when every real score is negative."""
        rng = np.random.default_rng(11)
        d = 32
        u = rng.normal(size=d).astype(np.float32)
        u /= np.linalg.norm(u)
        # query tokens cluster around +u, every doc token around -u, and
        # docs fill all 16 token slots (zero padding would floor the exact
        # max at 0) -> every real exact score is strongly negative
        q = u + 0.1 * rng.normal(size=(16, d)).astype(np.float32)
        queries = [q / np.linalg.norm(q, axis=-1, keepdims=True)]
        docs = []
        for _ in range(200):
            x = -u + 0.1 * rng.normal(size=(16, d)).astype(np.float32)
            docs.append(x / np.linalg.norm(x, axis=-1, keepdims=True))
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        tiered = CorpusIndex(docs, dtype="int8", mesh=mesh, prefilter="binary", force_kernel=True)
        t_scores, t_idx = tiered.search(queries, k=5, candidates=16)
        # the invariants under test: no fake ids, no fake 0.0 scores (all
        # docs here are near-ties, so exact-id agreement is not expected)
        assert (t_idx < len(docs)).all(), t_idx
        assert (t_scores < 0).all(), t_scores


class TestDeviceIndexBuilder:
    """Streaming on-device ingestion == host-built CorpusIndex."""

    def _ragged_corpus(self, seed=13, n=300, d=32):
        rng = np.random.default_rng(seed)
        docs = [rng.normal(size=(int(rng.integers(3, 15)), d)).astype(np.float32) for _ in range(n)]
        return [x / np.linalg.norm(x, axis=-1, keepdims=True) for x in docs]

    @pytest.mark.parametrize("dtype,prefilter", [("int8", None), ("bf16", None), ("int8", "binary")])
    def test_matches_host_built_index(self, dtype, prefilter):
        import jax.numpy as jnp

        from colpali_tpu.retrieval import DeviceIndexBuilder

        docs = self._ragged_corpus()
        ref = CorpusIndex(docs, dtype=dtype, doc_tokens=16, prefilter=prefilter)

        builder = DeviceIndexBuilder(doc_tokens=16, dim=32, dtype=dtype, prefilter=prefilter)
        for i in range(0, len(docs), 7):  # ragged batches straddle tile edges
            chunk = docs[i : i + 7]
            s = max(x.shape[0] for x in chunk)
            padded = np.zeros((len(chunk), s, 32), np.float32)
            mask = np.zeros((len(chunk), s), bool)
            for j, x in enumerate(chunk):
                padded[j, : x.shape[0]] = x
                mask[j, : x.shape[0]] = True
            builder.add(jnp.asarray(padded), jnp.asarray(mask))
        index = builder.build()

        assert index.num_docs == ref.num_docs and index.padded_docs == ref.padded_docs
        np.testing.assert_array_equal(np.asarray(index._store), np.asarray(ref._store))
        if dtype == "int8":
            np.testing.assert_allclose(np.asarray(index._scales), np.asarray(ref._scales), rtol=1e-6)
        if prefilter:
            np.testing.assert_array_equal(np.asarray(index._bwords), np.asarray(ref._bwords))

    def test_build_onto_mesh_and_search(self):
        import jax.numpy as jnp

        from colpali_tpu.retrieval import DeviceIndexBuilder

        docs = self._ragged_corpus(seed=21, n=40)
        ref = CorpusIndex(docs, dtype="int8", doc_tokens=16)
        builder = DeviceIndexBuilder(doc_tokens=16, dim=32, dtype="int8")
        padded = np.zeros((len(docs), 16, 32), np.float32)
        for j, x in enumerate(docs):
            padded[j, : x.shape[0]] = x
        builder.add(jnp.asarray(padded))
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        index = builder.build(mesh=mesh)
        queries = [d[:4] for d in docs[:2]]
        _, idx = index.search(queries, k=3)
        _, ref_idx = ref.search(queries, k=3)
        np.testing.assert_array_equal(idx, ref_idx)

    def test_rejects_oversized_batches(self):
        import jax.numpy as jnp

        from colpali_tpu.retrieval import DeviceIndexBuilder

        builder = DeviceIndexBuilder(doc_tokens=16, dim=32)
        with pytest.raises(ValueError, match="doc_tokens"):
            builder.add(jnp.zeros((2, 20, 32)))
        with pytest.raises(ValueError, match="No documents"):
            builder.build()

    def test_rejects_use_after_build(self):
        """add()/build() after finalize must fail loudly — a second build()
        used to pass the num_docs guard and crash opaquely (or silently drop
        the pre-build docs; round-2 advisor finding)."""
        import jax.numpy as jnp

        from colpali_tpu.retrieval import DeviceIndexBuilder

        builder = DeviceIndexBuilder(doc_tokens=16, dim=32)
        builder.add(jnp.ones((2, 16, 32)))
        builder.build()
        with pytest.raises(RuntimeError, match="finalized"):
            builder.add(jnp.ones((2, 16, 32)))
        with pytest.raises(RuntimeError, match="finalized"):
            builder.build()


class TestIncrementalExtend:
    """CorpusIndex.extend: append docs in place; N extends == one build."""

    def _docs(self, seed, n, d=32):
        rng = np.random.default_rng(seed)
        docs = [rng.normal(size=(int(rng.integers(3, 15)), d)).astype(np.float32) for _ in range(n)]
        return [x / np.linalg.norm(x, axis=-1, keepdims=True) for x in docs]

    @pytest.mark.parametrize("dtype", ["int8", "bf16"])
    def test_extend_matches_scratch_build(self, dtype):
        all_docs = self._docs(31, 300)
        # splits straddle tile boundaries (128) and leave partial tails
        a, b, c = all_docs[:100], all_docs[100:250], all_docs[250:]
        index = CorpusIndex(a, dtype=dtype, doc_tokens=16)
        index.extend(b)
        index.extend(c)
        ref = CorpusIndex(all_docs, dtype=dtype, doc_tokens=16)
        assert index.num_docs == ref.num_docs and index.padded_docs == ref.padded_docs
        np.testing.assert_array_equal(np.asarray(index._store), np.asarray(ref._store))
        if dtype == "int8":
            np.testing.assert_array_equal(np.asarray(index._scales), np.asarray(ref._scales))

    def test_extend_with_prefilter_search(self):
        all_docs = self._docs(32, 200)
        index = CorpusIndex(all_docs[:130], dtype="int8", doc_tokens=16, prefilter="binary")
        index.extend(all_docs[130:])
        ref = CorpusIndex(all_docs, dtype="int8", doc_tokens=16, prefilter="binary")
        queries = [d[:4] for d in all_docs[150:152]]  # docs only in the extension
        s0, i0 = index.search(queries, k=3, candidates=32)
        s1, i1 = ref.search(queries, k=3, candidates=32)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_allclose(s0, s1, rtol=1e-5)

    def test_extend_validation(self):
        index = CorpusIndex(self._docs(33, 10), doc_tokens=16)
        with pytest.raises(ValueError, match="doc_tokens"):
            index.extend([np.zeros((30, 32), np.float32)])
        with pytest.raises(ValueError, match="dim"):
            index.extend([np.zeros((4, 16), np.float32)])
        n = index.num_docs
        index.extend([])
        assert index.num_docs == n

    def test_extend_sharded_matches_scratch_build(self):
        """Mesh-sharded incremental adds: per-shard tile counts stay equal
        (total re-padded to DOC_TILE*n_shards) and search results equal a
        from-scratch sharded build."""
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        all_docs = self._docs(34, 2500)
        a, b, c = all_docs[:900], all_docs[900:1800], all_docs[1800:]
        index = CorpusIndex(a, dtype="int8", doc_tokens=16, mesh=mesh, force_kernel=False)
        index.extend(b)
        index.extend(c)
        ref = CorpusIndex(all_docs, dtype="int8", doc_tokens=16, mesh=mesh, force_kernel=False)
        assert index.num_docs == ref.num_docs and index.padded_docs == ref.padded_docs
        assert index.padded_docs % (128 * 8) == 0
        np.testing.assert_array_equal(np.asarray(index._store), np.asarray(ref._store))
        queries = [d[:4] for d in all_docs[2400:2402]]  # docs from the last add
        s0, i0 = index.search(queries, k=5)
        s1, i1 = ref.search(queries, k=5)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_allclose(s0, s1, rtol=1e-5)

    def test_extend_sharded_prefilter(self):
        """Mesh + binary prefilter extend: the two-tier shard_map search path
        agrees with a from-scratch sharded two-tier build."""
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        all_docs = self._docs(36, 1500)
        index = CorpusIndex(
            all_docs[:1100], dtype="int8", doc_tokens=16, mesh=mesh,
            prefilter="binary", force_kernel=False,
        )
        index.extend(all_docs[1100:])
        ref = CorpusIndex(
            all_docs, dtype="int8", doc_tokens=16, mesh=mesh,
            prefilter="binary", force_kernel=False,
        )
        queries = [d[:4] for d in all_docs[1200:1202]]
        s0, i0 = index.search(queries, k=3, candidates=32)
        s1, i1 = ref.search(queries, k=3, candidates=32)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_allclose(s0, s1, rtol=1e-5)

    def test_extend_host_assemble_matches_device_path(self):
        """host_assemble=True (bounded-HBM path) builds the identical index."""
        all_docs = self._docs(37, 300)
        a, b = all_docs[:100], all_docs[100:]
        dev = CorpusIndex(a, dtype="int8", doc_tokens=16, prefilter="binary")
        dev.extend(b)
        host = CorpusIndex(a, dtype="int8", doc_tokens=16, prefilter="binary")
        host.extend(b, host_assemble=True)
        np.testing.assert_array_equal(np.asarray(dev._store), np.asarray(host._store))
        np.testing.assert_array_equal(np.asarray(dev._scales), np.asarray(host._scales))
        np.testing.assert_array_equal(np.asarray(dev._bwords), np.asarray(host._bwords))

    def test_sharded_two_tier_xla_fallback(self):
        """mesh + prefilter with the XLA (non-kernel) branch — the CPU/GPU
        serving fallback under shard_map."""
        rng = np.random.default_rng(6)
        d = 32
        queries = rng.normal(size=(1, 6, d)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=-1, keepdims=True)
        docs = [queries[0] + 0.1 * rng.normal(size=(6, d)).astype(np.float32) for _ in range(3)]
        docs += [rng.normal(size=(8, d)).astype(np.float32) for _ in range(200)]
        docs = [x / np.linalg.norm(x, axis=-1, keepdims=True) for x in docs]
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        exact = CorpusIndex(docs, dtype="int8", force_kernel=False)
        tiered = CorpusIndex(docs, dtype="int8", mesh=mesh, prefilter="binary", force_kernel=False)
        _, e_idx = exact.search(list(queries), k=3)
        _, t_idx = tiered.search(list(queries), k=3, candidates=16)
        np.testing.assert_array_equal(t_idx, e_idx)


def test_builder_bf16_prefilter_combination():
    """DeviceIndexBuilder with bf16 store + binary prefilter (the one dtype x
    prefilter cell the parametrized builder test leaves out)."""
    import jax.numpy as jnp

    from colpali_tpu.retrieval import DeviceIndexBuilder

    rng = np.random.default_rng(41)
    docs = [rng.normal(size=(8, 32)).astype(np.float32) for _ in range(150)]
    docs = [x / np.linalg.norm(x, axis=-1, keepdims=True) for x in docs]
    ref = CorpusIndex(docs, dtype="bf16", doc_tokens=16, prefilter="binary")
    builder = DeviceIndexBuilder(doc_tokens=16, dim=32, dtype="bf16", prefilter="binary")
    padded = np.zeros((len(docs), 16, 32), np.float32)
    for j, x in enumerate(docs):
        padded[j, : x.shape[0]] = x
    builder.add(jnp.asarray(padded))
    index = builder.build()
    np.testing.assert_array_equal(np.asarray(index._store), np.asarray(ref._store))
    np.testing.assert_array_equal(np.asarray(index._bwords), np.asarray(ref._bwords))


class TestBuilderPooling:
    """DeviceIndexBuilder(pool_factor=...) pools on device during ingestion."""

    def test_pooled_build_matches_manual_pooling(self):
        import jax
        import jax.numpy as jnp

        from colpali_tpu.compression import kmeans_pool_padded
        from colpali_tpu.retrieval import DeviceIndexBuilder

        rng = np.random.default_rng(5)
        b, s, d = 12, 24, 32
        emb = rng.normal(size=(b, s, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
        mask = np.ones((b, s), np.float32)
        mask[3, 18:] = 0
        emb *= mask[..., None]

        pooled, cmask, _ = jax.jit(
            kmeans_pool_padded, static_argnames=("pool_factor", "iters")
        )(jnp.asarray(emb), jnp.asarray(mask), pool_factor=3)
        manual = DeviceIndexBuilder(doc_tokens=8, dim=d)
        manual.add(pooled, cmask)
        ref = manual.build()

        # pin pool_method: the builder's default became "ward" (round 4),
        # and the manual reference path above pools with k-means
        auto = DeviceIndexBuilder(doc_tokens=8, dim=d, pool_factor=3,
                                  pool_method="kmeans")
        auto.add(jnp.asarray(emb), jnp.asarray(mask))
        index = auto.build()

        assert index.num_docs == b
        np.testing.assert_array_equal(np.asarray(index._store), np.asarray(ref._store))

        # pooled index still ranks a planted near-duplicate query first
        q = np.asarray(pooled[7, :4], np.float32)
        scores, ids = index.search([q], k=3)
        assert ids[0, 0] == 7


class TestBiEncoderServing:
    """Bi-* (single-vector) retrieval rides CorpusIndex directly: a dense
    embedding is a 1-token multi-vector doc, and MaxSim degenerates to the
    dot product (reference score_single_vector, processing_utils.py:103-130)."""

    def test_single_token_docs_rank_by_dot_product(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(11)
        corpus = rng.normal(size=(256, 32)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
        queries = rng.normal(size=(4, 32)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=-1, keepdims=True)

        index = CorpusIndex([d[None, :] for d in corpus], dtype="bf16")
        scores, ids = index.search([q[None, :] for q in queries], k=5)

        # oracle on the bf16-rounded corpus (the store's precision)
        corpus_bf16 = np.asarray(jnp.asarray(corpus, jnp.bfloat16), np.float32)
        full = queries @ corpus_bf16.T
        expect = np.argsort(-full, axis=1)[:, :5]
        np.testing.assert_array_equal(ids, expect)
        np.testing.assert_allclose(scores, np.take_along_axis(full, expect, 1), atol=1e-3)
