"""Token pooling tests (mirrors the reference's fixture-based strategy,
tests/compression/token_pooling/)."""

import numpy as np
import pytest

from colpali_tpu.compression import HierarchicalTokenPooler, LambdaTokenPooler
from colpali_tpu.utils.tensor_utils import pad_sequences


@pytest.fixture
def sample_embedding():
    """6 tokens in 3 dims: two tight groups + outliers (unit-normalized)."""
    emb = np.array(
        [
            [1.0, 0.0, 0.0],
            [0.99, 0.01, 0.0],
            [0.0, 1.0, 0.0],
            [0.0, 0.99, 0.01],
            [0.0, 0.0, 1.0],
            [0.70, 0.70, 0.0],
        ],
        dtype=np.float32,
    )
    return emb / np.linalg.norm(emb, axis=-1, keepdims=True)


class TestHierarchicalTokenPooler:
    def test_pool_factor_1_is_identity(self, sample_embedding):
        pooler = HierarchicalTokenPooler()
        out = pooler.pool_embeddings([sample_embedding], pool_factor=1)
        np.testing.assert_array_equal(out[0], sample_embedding)

    def test_cluster_count(self, sample_embedding):
        pooler = HierarchicalTokenPooler()
        out = pooler.pool_embeddings([sample_embedding], pool_factor=2)
        assert out[0].shape == (3, 3)  # 6 // 2 clusters

    def test_outputs_unit_norm(self, sample_embedding):
        pooler = HierarchicalTokenPooler()
        out = pooler.pool_embeddings([sample_embedding], pool_factor=2)
        norms = np.linalg.norm(out[0], axis=-1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-5)

    def test_similar_tokens_cluster_together(self, sample_embedding):
        pooler = HierarchicalTokenPooler()
        out = pooler.pool_embeddings([sample_embedding], pool_factor=2, return_dict=True)
        maps = out.cluster_id_to_indices[0]
        clusters = [set(v[0].tolist()) for v in maps.values()]
        assert {0, 1} <= set.union(*clusters)  # all tokens assigned
        # tokens 0,1 are nearly identical -> same cluster; same for 2,3
        assert any({0, 1} <= c for c in clusters)
        assert any({2, 3} <= c for c in clusters)

    def test_ragged_batch(self):
        rng = np.random.default_rng(0)
        embs = [rng.normal(size=(n, 8)).astype(np.float32) for n in (10, 20)]
        embs = [e / np.linalg.norm(e, axis=-1, keepdims=True) for e in embs]
        pooler = HierarchicalTokenPooler()
        out = pooler.pool_embeddings(embs, pool_factor=2)
        assert out[0].shape[0] == 5 and out[1].shape[0] == 10

    def test_padded_3d_roundtrip(self):
        rng = np.random.default_rng(1)
        embs = [rng.normal(size=(n, 8)).astype(np.float32) + 1 for n in (6, 10)]
        embs = [e / np.linalg.norm(e, axis=-1, keepdims=True) for e in embs]
        padded = pad_sequences(embs, padding_side="left")
        pooler = HierarchicalTokenPooler()
        out_list = pooler.pool_embeddings(embs, pool_factor=2)
        out_3d = pooler.pool_embeddings(padded, pool_factor=2, padding=True, padding_side="left")
        assert out_3d.ndim == 3
        # left-padded: last rows match the ragged outputs
        for i, o in enumerate(out_list):
            np.testing.assert_allclose(out_3d[i, -o.shape[0] :], o, rtol=1e-5, atol=1e-6)

    def test_single_token_raises(self):
        pooler = HierarchicalTokenPooler()
        with pytest.raises(ValueError, match="more than one token"):
            pooler.pool_embeddings([np.ones((1, 4), np.float32)], pool_factor=2)

    def test_num_workers(self, sample_embedding):
        pooler = HierarchicalTokenPooler()
        seq = pooler.pool_embeddings([sample_embedding] * 4, pool_factor=2)
        par = pooler.pool_embeddings([sample_embedding] * 4, pool_factor=2, num_workers=2)
        for a, b in zip(seq, par):
            np.testing.assert_array_equal(a, b)


class TestLambdaTokenPooler:
    def test_mean_pool(self):
        rng = np.random.default_rng(2)
        embs = [rng.normal(size=(6, 4)).astype(np.float32)]

        def mean_pool(e):
            return e.mean(axis=0, keepdims=True)

        pooler = LambdaTokenPooler(mean_pool)
        out = pooler.pool_embeddings(embs)
        assert out[0].shape == (1, 4)
        np.testing.assert_allclose(out[0], embs[0].mean(axis=0, keepdims=True), rtol=1e-6)


class TestKMeansTokenPooler:
    """Device k-means pooler: container parity with the hierarchical pooler,
    plus the jittable padded path."""

    def _pooler(self):
        from colpali_tpu.compression import KMeansTokenPooler

        return KMeansTokenPooler()

    def test_pool_factor_1_is_identity(self, sample_embedding):
        out = self._pooler().pool_embeddings([sample_embedding], pool_factor=1)
        np.testing.assert_array_equal(out[0], sample_embedding)

    def test_cluster_count_and_unit_norm(self, sample_embedding):
        out = self._pooler().pool_embeddings([sample_embedding], pool_factor=2)
        assert out[0].shape == (3, 3)  # max(6 // 2, 1) clusters
        np.testing.assert_allclose(np.linalg.norm(out[0], axis=-1), 1.0, rtol=1e-5)

    def test_similar_tokens_cluster_together(self, sample_embedding):
        out = self._pooler().pool_embeddings(
            [sample_embedding], pool_factor=2, return_dict=True
        )
        maps = out.cluster_id_to_indices[0]
        clusters = [set(v[0].tolist()) for v in maps.values()]
        assert set.union(*clusters) == {0, 1, 2, 3, 4, 5}  # every token assigned
        assert any({0, 1} <= c for c in clusters)
        assert any({2, 3} <= c for c in clusters)

    def test_ragged_batch_cluster_rule(self):
        rng = np.random.default_rng(0)
        embs = [rng.normal(size=(n, 8)).astype(np.float32) for n in (10, 21, 5)]
        embs = [e / np.linalg.norm(e, axis=-1, keepdims=True) for e in embs]
        out = self._pooler().pool_embeddings(embs, pool_factor=3)
        # reference rule: k_i = max(n_i // factor, 1)
        assert [o.shape[0] for o in out] == [3, 7, 1]

    def test_single_token_raises(self):
        with pytest.raises(ValueError, match="more than one token"):
            self._pooler().pool_embeddings([np.ones((1, 4), np.float32)], pool_factor=2)

    def test_padded_3d_roundtrip(self):
        rng = np.random.default_rng(1)
        embs = [rng.normal(size=(n, 8)).astype(np.float32) for n in (12, 8)]
        embs = [e / np.linalg.norm(e, axis=-1, keepdims=True) for e in embs]
        padded = pad_sequences(embs, padding_side="left")
        out = self._pooler().pool_embeddings(
            padded, padding=True, padding_side="left", pool_factor=2
        )
        assert out.shape[0] == 2 and out.shape[1] == 6  # max k_i, re-padded

    def test_padded_device_path_jits_and_masks(self):
        import jax
        import jax.numpy as jnp

        from colpali_tpu.compression import kmeans_pool_padded

        rng = np.random.default_rng(2)
        e = rng.normal(size=(4, 24, 16)).astype(np.float32)
        e /= np.linalg.norm(e, axis=-1, keepdims=True)
        mask = np.ones((4, 24), np.float32)
        mask[1, 18:] = 0  # n=18 -> k_i = 6
        mask[3, 4:] = 0   # n=4  -> k_i = 1
        e *= mask[..., None]
        fn = jax.jit(kmeans_pool_padded, static_argnames=("pool_factor", "iters"))
        pooled, cmask, assign = fn(jnp.asarray(e), jnp.asarray(mask), pool_factor=3)
        pooled, cmask, assign = map(np.asarray, (pooled, cmask, assign))
        assert pooled.shape == (4, 8, 16)  # K = 24 // 3
        # k_i = max(n_i // 3, 1) bounds the valid clusters (empties may drop)
        for count, bound in zip(cmask.sum(1).tolist(), [8, 6, 8, 1]):
            assert 0 < count <= bound
        # invalid clusters are zeroed; valid ones unit-norm
        norms = np.linalg.norm(pooled, axis=-1)
        np.testing.assert_allclose(norms[cmask], 1.0, rtol=1e-5)
        np.testing.assert_allclose(norms[~cmask], 0.0, atol=1e-7)
        # contract: every valid pooled row is EXACTLY the renormalized mean
        # of the tokens its final assignment maps to
        for i in range(4):
            valid = mask[i] > 0
            for cid in np.where(cmask[i])[0]:
                members = e[i][valid & (assign[i] == cid)]
                assert members.shape[0] > 0
                mean = members.mean(0)
                np.testing.assert_allclose(
                    pooled[i, cid], mean / np.linalg.norm(mean), atol=1e-5)

    def test_fully_masked_doc_yields_no_valid_clusters(self):
        import jax
        import jax.numpy as jnp

        from colpali_tpu.compression import kmeans_pool_padded

        rng = np.random.default_rng(4)
        e = rng.normal(size=(2, 12, 8)).astype(np.float32)
        e /= np.linalg.norm(e, axis=-1, keepdims=True)
        mask = np.ones((2, 12), np.float32)
        mask[1, :] = 0  # pad doc with non-zero (garbage) rows
        fn = jax.jit(kmeans_pool_padded, static_argnames=("pool_factor", "iters"))
        pooled, cmask, _ = fn(jnp.asarray(e), jnp.asarray(mask), pool_factor=2)
        assert not np.asarray(cmask)[1].any()
        np.testing.assert_allclose(np.asarray(pooled)[1], 0.0, atol=1e-7)

    def test_empty_clusters_dropped_like_ward(self):
        """Near-identical tokens collapse to one cluster; the stale init
        centroids must NOT surface as duplicate pooled rows."""
        base = np.ones((10, 8), np.float32)
        tokens = base + 1e-4 * np.arange(10)[:, None]
        tokens /= np.linalg.norm(tokens, axis=-1, keepdims=True)
        out = self._pooler().pool_embeddings([tokens], pool_factor=2, return_dict=True)
        pooled = out.pooled_embeddings[0]
        maps = out.cluster_id_to_indices[0]
        assert pooled.shape[0] == len(maps)
        assert all(v[0].size > 0 for v in maps.values())  # no empty map entries
        assert sum(v[0].size for v in maps.values()) == 10  # every token assigned

    def test_recovers_planted_clusters_like_ward(self):
        """On well-separated groups both algorithms find the same partition."""
        rng = np.random.default_rng(3)
        centers = np.eye(4, 16, dtype=np.float32)  # 4 orthogonal directions
        tokens = np.concatenate(
            [c + 0.01 * rng.normal(size=(5, 16)).astype(np.float32) for c in centers]
        )
        tokens /= np.linalg.norm(tokens, axis=-1, keepdims=True)
        out = self._pooler().pool_embeddings(
            [tokens], pool_factor=5, return_dict=True
        )
        clusters = sorted(
            tuple(sorted(v[0].tolist()))
            for v in out.cluster_id_to_indices[0].values()
        )
        assert clusters == [tuple(range(i * 5, (i + 1) * 5)) for i in range(4)]
