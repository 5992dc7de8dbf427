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
