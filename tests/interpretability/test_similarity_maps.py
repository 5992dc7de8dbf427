"""Interpretability tests on synthetic embeddings (mirrors the reference's
tests/interpretability/test_interpretability_workflow.py approach)."""

import numpy as np
import pytest

from colpali_tpu.interpretability import (
    get_similarity_maps_from_embeddings,
    normalize_similarity_map,
)


class TestSimilarityMaps:
    def test_shapes(self):
        rng = np.random.default_rng(0)
        b, s, nq, dim = 2, 20, 5, 16
        npx, npy = 4, 3
        image_emb = rng.normal(size=(b, s, dim)).astype(np.float32)
        query_emb = rng.normal(size=(b, nq, dim)).astype(np.float32)
        mask = np.zeros((b, s), bool)
        mask[:, 2 : 2 + npx * npy] = True
        maps = get_similarity_maps_from_embeddings(image_emb, query_emb, (npx, npy), mask)
        assert len(maps) == b
        assert maps[0].shape == (nq, npx, npy)

    def test_values_match_manual_einsum(self):
        rng = np.random.default_rng(1)
        dim, npx, npy = 8, 2, 3
        image_emb = rng.normal(size=(1, npx * npy, dim)).astype(np.float32)
        query_emb = rng.normal(size=(1, 2, dim)).astype(np.float32)
        mask = np.ones((1, npx * npy), bool)
        maps = get_similarity_maps_from_embeddings(image_emb, query_emb, (npx, npy), mask)
        # token (h, w) lives at flat index h*npx + w; map is (n, w, h)
        for n in range(2):
            for h in range(npy):
                for w in range(npx):
                    expected = query_emb[0, n] @ image_emb[0, h * npx + w]
                    np.testing.assert_allclose(maps[0][n, w, h], expected, rtol=1e-5)

    def test_mismatched_patches_raise(self):
        image_emb = np.zeros((1, 10, 4), np.float32)
        query_emb = np.zeros((1, 2, 4), np.float32)
        mask = np.ones((1, 10), bool)
        with pytest.raises(ValueError, match="does not match"):
            get_similarity_maps_from_embeddings(image_emb, query_emb, (3, 3), mask)


class TestNormalize:
    def test_bounds(self):
        rng = np.random.default_rng(2)
        m = rng.normal(size=(4, 5)).astype(np.float32)
        out = normalize_similarity_map(m)
        assert out.min() >= 0.0 and out.max() <= 1.0
        assert out.max() == pytest.approx(1.0, abs=1e-5)

    def test_batched(self):
        rng = np.random.default_rng(3)
        m = rng.normal(size=(2, 4, 5)).astype(np.float32)
        out = normalize_similarity_map(m)
        for i in range(2):
            assert out[i].max() == pytest.approx(1.0, abs=1e-5)

    def test_value_range(self):
        m = np.array([[0.0, 5.0], [10.0, 2.5]], np.float32)
        out = normalize_similarity_map(m, value_range=(0.0, 10.0))
        np.testing.assert_allclose(out, m / 10.0, rtol=1e-5)

    def test_bad_ndim_raises(self):
        with pytest.raises(ValueError, match="2 dimensions"):
            normalize_similarity_map(np.zeros(3, np.float32))
