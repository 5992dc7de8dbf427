"""Tests for MaxSim scoring ops.

Mirrors the reference test strategy for scoring
(/root/reference/tests/utils/test_processing_utils.py): shape checks and
list-vs-padded-tensor equivalence, plus a direct numerical cross-check of the
reference einsum formula (computed independently with numpy).
"""

import numpy as np
import pytest

from colpali_tpu.ops.maxsim import maxsim, score_multi_vector, score_single_vector
from colpali_tpu.utils.tensor_utils import pad_sequences, unbind_padded_multivector_embeddings


def _reference_maxsim(qs_padded: np.ndarray, ps_padded: np.ndarray) -> np.ndarray:
    """The reference formula einsum("bnd,csd->bcns").max(3).sum(2) in numpy."""
    sim = np.einsum("bnd,csd->bcns", qs_padded, ps_padded)
    return sim.max(axis=3).sum(axis=2)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


class TestMaxSim:
    def test_matches_reference_formula_on_padded_input(self, rng):
        qs = rng.normal(size=(4, 16, 32)).astype(np.float32)
        ps = rng.normal(size=(6, 48, 32)).astype(np.float32)
        expected = _reference_maxsim(qs, ps)
        got = np.asarray(maxsim(qs, ps))
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)

    def test_score_multi_vector_shapes(self, rng):
        qs = [rng.normal(size=(n, 64)).astype(np.float32) for n in (5, 9, 3)]
        ps = [rng.normal(size=(n, 64)).astype(np.float32) for n in (20, 17, 31, 8)]
        scores = score_multi_vector(qs, ps)
        assert scores.shape == (3, 4)
        assert scores.dtype == np.float32

    def test_list_vs_padded_equivalence(self, rng):
        """List-of-ragged input and pre-padded 3D input give identical scores."""
        qs = [rng.normal(size=(n, 16)).astype(np.float32) for n in (4, 7)]
        ps = [rng.normal(size=(n, 16)).astype(np.float32) for n in (10, 6, 13)]
        padded_qs = pad_sequences(qs)
        padded_ps = pad_sequences(ps)
        s_list = score_multi_vector(qs, ps)
        s_padded = score_multi_vector(padded_qs, padded_ps)
        np.testing.assert_allclose(s_list, s_padded, rtol=1e-5, atol=1e-5)

    def test_ragged_scores_against_bruteforce(self, rng):
        """Per-pair brute force with zero-padding semantics (padded doc tokens
        contribute a 0 candidate to the max, matching the reference's
        pad_sequence(padding_value=0) behavior)."""
        dim = 24
        qs = [rng.normal(size=(n, dim)).astype(np.float32) for n in (3, 6)]
        ps = [rng.normal(size=(n, dim)).astype(np.float32) for n in (5, 11, 2)]
        scores = score_multi_vector(qs, ps, token_pad_multiple=16)

        max_p = 16  # 11 rounded up to 16 -> every doc is padded
        for i, q in enumerate(qs):
            for j, p in enumerate(ps):
                sim = q @ p.T  # (nq, np)
                tok_max = sim.max(axis=1)
                if p.shape[0] < max_p:  # zero-pad candidate present
                    tok_max = np.maximum(tok_max, 0.0)
                expected = tok_max.sum()
                np.testing.assert_allclose(scores[i, j], expected, rtol=1e-4, atol=1e-4)

    def test_batched_blocks_match_single_block(self, rng):
        qs = [rng.normal(size=(6, 16)).astype(np.float32) for _ in range(7)]
        ps = [rng.normal(size=(9, 16)).astype(np.float32) for _ in range(11)]
        s_small_blocks = score_multi_vector(qs, ps, batch_size=3)
        s_one_block = score_multi_vector(qs, ps, batch_size=128)
        np.testing.assert_allclose(s_small_blocks, s_one_block, rtol=1e-5, atol=1e-5)

    def test_empty_inputs_raise(self):
        with pytest.raises(ValueError, match="No queries"):
            score_multi_vector([], [np.zeros((2, 4), np.float32)])
        with pytest.raises(ValueError, match="No passages"):
            score_multi_vector([np.zeros((2, 4), np.float32)], [])


class TestScoreSingleVector:
    def test_matches_numpy(self, rng):
        qs = rng.normal(size=(5, 32)).astype(np.float32)
        ps = rng.normal(size=(7, 32)).astype(np.float32)
        got = score_single_vector(qs, ps)
        np.testing.assert_allclose(got, qs @ ps.T, rtol=1e-5, atol=1e-5)

    def test_list_input(self, rng):
        qs = [rng.normal(size=(8,)).astype(np.float32) for _ in range(3)]
        ps = [rng.normal(size=(8,)).astype(np.float32) for _ in range(4)]
        got = score_single_vector(qs, ps)
        assert got.shape == (3, 4)


class TestUnbindPadded:
    def test_roundtrip_right(self, rng):
        seqs = [rng.normal(size=(n, 8)).astype(np.float32) + 1.0 for n in (3, 5, 2)]
        padded = pad_sequences(seqs, padding_side="right")
        out = unbind_padded_multivector_embeddings(padded, padding_side="right")
        for a, b in zip(seqs, out):
            np.testing.assert_array_equal(a, b)

    def test_roundtrip_left(self, rng):
        seqs = [rng.normal(size=(n, 8)).astype(np.float32) + 1.0 for n in (3, 5, 2)]
        padded = pad_sequences(seqs, padding_side="left")
        out = unbind_padded_multivector_embeddings(padded, padding_side="left")
        for a, b in zip(seqs, out):
            np.testing.assert_array_equal(a, b)

    def test_all_padding_row(self):
        padded = np.zeros((1, 4, 8), np.float32)
        out = unbind_padded_multivector_embeddings(padded)
        assert out[0].shape == (0, 8)
