"""Binary (sign-sketch) MaxSim pre-filter: packing, kernel parity, recall.

Covers VERDICT r1 item #8: the coarse pass that fills the reference's PLAID
role (processing_utils.py:189-244) — packed-bit scoring over the corpus,
exact rescore of survivors (the rescore is tested in tests/retrieval).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from colpali_tpu.ops.maxsim import maxsim
from colpali_tpu.ops.maxsim_binary import (
    binary_maxsim_pallas_tiled,
    binary_maxsim_xla_tiled,
    fill_doc_padding,
    words_to_tile_major,
)
from colpali_tpu.ops.quant import binarize_words, unpack_words


def _pad_tiles(words):
    """(C, Np, W) -> tile-major, zero-padding the doc count up to 128."""
    c = words.shape[0]
    if c % 128:
        pad = jnp.zeros((128 - c % 128, *words.shape[1:]), words.dtype)
        words = jnp.concatenate([words, pad])
    return words_to_tile_major(words)


def _random_padded(rng, b, nq, c, np_, d, q_real, p_real):
    q = rng.normal(size=(b, nq, d)).astype(np.float32)
    q[:, q_real:] = 0.0
    docs = rng.normal(size=(c, np_, d)).astype(np.float32)
    docs[:, p_real:] = 0.0
    docs[3] = 0.0  # a fully padded fake doc
    return q, docs


class TestBinarizeWords:
    def test_round_trip_signs(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(5, 7, 64)).astype(np.float32)
        words, valid = binarize_words(jnp.asarray(x))
        assert words.shape == (5, 7, 2) and words.dtype == jnp.int32
        np.testing.assert_array_equal(np.asarray(unpack_words(words, 64)), np.sign(x))
        np.testing.assert_array_equal(np.asarray(valid), np.ones((5, 7), np.float32))

    def test_validity_mask_marks_zero_tokens(self):
        x = np.ones((2, 3, 32), np.float32)
        x[0, 1] = 0.0
        _, valid = binarize_words(jnp.asarray(x))
        np.testing.assert_array_equal(np.asarray(valid), [[1, 0, 1], [1, 1, 1]])

    def test_requires_dim_multiple_of_32(self):
        with pytest.raises(ValueError, match="multiple of 32"):
            binarize_words(jnp.ones((2, 24)))

    def test_fill_doc_padding_duplicates_first_valid(self):
        x = np.ones((2, 3, 32), np.float32)
        x[0, 1:] = 0.0  # doc 0: tokens 1,2 padded
        x[1] = 0.0  # fully padded fake doc
        words, valid = binarize_words(jnp.asarray(x))
        filled = np.asarray(fill_doc_padding(words, valid))
        np.testing.assert_array_equal(filled[0, 1], filled[0, 0])
        np.testing.assert_array_equal(filled[0, 2], filled[0, 0])
        np.testing.assert_array_equal(filled[1], np.zeros((3, 1), np.int32))

    def test_fill_doc_padding_left_padded(self):
        """LEFT-padded docs (qwen2/gemma3/modernvbert processors) must take
        the first VALID token, not the masked all-zero token 0 — an all-zero
        word scores dim - 2*popcount(q) in the XOR pass instead of being
        score-neutral (round-2 advisor finding)."""
        rng = np.random.default_rng(7)
        real = rng.normal(size=(2, 32)).astype(np.float32)
        left = np.zeros((1, 4, 32), np.float32)
        left[0, 2:] = real  # tokens 0,1 are padding
        right = np.zeros((1, 4, 32), np.float32)
        right[0, :2] = real
        lw = fill_doc_padding(*binarize_words(jnp.asarray(left)))
        rw = fill_doc_padding(*binarize_words(jnp.asarray(right)))
        # same multiset of token words -> identical coarse MaxSim scores
        q = rng.normal(size=(1, 3, 32)).astype(np.float32)
        qw, qv = binarize_words(jnp.asarray(q))
        sl = binary_maxsim_xla_tiled(qw, qv, _pad_tiles(lw), 32)
        sr = binary_maxsim_xla_tiled(qw, qv, _pad_tiles(rw), 32)
        np.testing.assert_array_equal(np.asarray(sl)[:, :1], np.asarray(sr)[:, :1])
        # and no padded token may contain all-zero words
        assert (np.asarray(lw) != 0).any(axis=-1).all()


class TestBinaryMaxsimParity:
    """XLA fallback == Pallas kernel (interpret) == dense sign-sketch oracle."""

    @pytest.fixture
    def packed(self):
        rng = np.random.default_rng(1)
        q, docs = _random_padded(rng, b=3, nq=16, c=256, np_=32, d=128, q_real=11, p_real=20)
        qw, qv = binarize_words(jnp.asarray(q))
        dw, dv = binarize_words(jnp.asarray(docs))
        dw = fill_doc_padding(dw, dv)
        return q, qw, qv, dw, words_to_tile_major(dw)

    def test_xla_matches_dense_oracle(self, packed):
        q, qw, qv, dw, dwt = packed
        got = np.asarray(binary_maxsim_xla_tiled(qw, qv, dwt, 128))
        # oracle: exact maxsim over sign sketches; padded doc tokens are
        # duplicates of token 0 (score-neutral under max), padded query
        # tokens weighted out
        q_sketch = np.asarray(unpack_words(qw, 128)) * np.asarray(qv)[..., None]
        d_sketch = np.asarray(unpack_words(dw, 128))
        want = np.asarray(maxsim(jnp.asarray(q_sketch), jnp.asarray(d_sketch)))
        # maxsim's zero floor from all-zero q tokens contributes 0 there too
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_pallas_matches_xla(self, packed):
        _, qw, qv, _, dwt = packed
        want = np.asarray(binary_maxsim_xla_tiled(qw, qv, dwt, 128))
        got = np.asarray(binary_maxsim_pallas_tiled(qw, qv, dwt, 128, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_word_count_mismatch_raises(self, packed):
        _, qw, qv, _, dwt = packed
        with pytest.raises(ValueError, match="word-count"):
            binary_maxsim_pallas_tiled(qw[..., :2], qv, dwt, 128, interpret=True)

    @pytest.mark.parametrize("np_,tiles_per_step", [(8, 1), (8, 4), (8, 8), (8, 3), (16, None)])
    def test_multi_tile_blocks_match_single_tile(self, np_, tiles_per_step):
        """tiles_per_step > 1 (the pooled-sketch overhead amortization) is
        value-identical to one tile per grid step, including the auto
        default and a non-dividing request (clamped to a divisor of 8)."""
        rng = np.random.default_rng(7)
        q, docs = _random_padded(rng, b=2, nq=8, c=1024, np_=np_, d=64, q_real=6, p_real=np_)
        qw, qv = binarize_words(jnp.asarray(q))
        dw, dv = binarize_words(jnp.asarray(docs))
        dwt = words_to_tile_major(fill_doc_padding(dw, dv))
        want = np.asarray(
            binary_maxsim_pallas_tiled(qw, qv, dwt, 64, interpret=True, tiles_per_step=1)
        )
        got = np.asarray(
            binary_maxsim_pallas_tiled(
                qw, qv, dwt, 64, interpret=True, tiles_per_step=tiles_per_step
            )
        )
        np.testing.assert_array_equal(got, want)
        xla = np.asarray(binary_maxsim_xla_tiled(qw, qv, dwt, 64))
        np.testing.assert_allclose(got, xla, atol=1e-4)


class TestPrefilterRecall:
    def test_planted_relevant_docs_survive_the_coarse_pass(self):
        """Docs built from (noised) query tokens must rank above random
        distractors in the binary pass — the recall property the two-tier
        search relies on."""
        rng = np.random.default_rng(2)
        d = 128
        queries = rng.normal(size=(2, 8, d)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=-1, keepdims=True)
        relevant = []  # docs 0..5: three noisy copies per query
        for b in range(2):
            for _ in range(3):
                doc = queries[b] + 0.1 * rng.normal(size=(8, d)).astype(np.float32)
                relevant.append(doc / np.linalg.norm(doc, axis=-1, keepdims=True))
        distract = rng.normal(size=(250, 8, d)).astype(np.float32)
        distract /= np.linalg.norm(distract, axis=-1, keepdims=True)
        docs = np.concatenate([np.stack(relevant), distract])

        qw, qv = binarize_words(jnp.asarray(queries))
        dw, dv = binarize_words(jnp.asarray(docs))
        scores = np.asarray(
            binary_maxsim_xla_tiled(qw, qv, words_to_tile_major(fill_doc_padding(dw, dv)), d)
        )
        top16 = np.argsort(-scores, axis=1)[:, :16]
        assert set(range(0, 3)) <= set(top16[0].tolist())
        assert set(range(3, 6)) <= set(top16[1].tolist())
