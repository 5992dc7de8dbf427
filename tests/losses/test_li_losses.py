"""Late-interaction loss tests.

Mirrors the reference's closed-form test strategy
(/root/reference/tests/loss/test_li_losses.py): zero embeddings give loss =
log(B) for InfoNCE, softplus(0) for margin losses; utility functions checked
against hand-computed values. Adds offset/gathered-doc tests the reference
lacks.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from colpali_tpu.losses import (
    ColbertLoss,
    ColbertNegativeCELoss,
    ColbertPairwiseCELoss,
    ColbertPairwiseNegativeCELoss,
    ColbertSigmoidLoss,
)
from colpali_tpu.losses.common import aggregate, filter_high_negatives, smooth_max

SOFTPLUS0 = math.log(2.0)


class TestCommon:
    def test_smooth_max(self):
        scores = jnp.array([[0.0, 2.0]])
        out = smooth_max(scores, axis=1, tau=2.0)
        expected = 2.0 * math.log(1.0 + math.exp(1.0))
        np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4)

    def test_aggregate_max(self):
        raw = jnp.array([[[1.0, 2.0], [3.0, 4.0]], [[5.0, 6.0], [7.0, 8.0]]])
        out = aggregate(raw, use_smooth_max=False, axis_max=2, axis_sum=1, tau=0.1)
        np.testing.assert_allclose(np.asarray(out), [6.0, 14.0])

    def test_aggregate_smooth_max(self):
        raw = jnp.zeros((1, 2, 2))
        out = aggregate(raw, use_smooth_max=True, axis_max=2, axis_sum=1, tau=1.0)
        np.testing.assert_allclose(np.asarray(out), 2 * math.log(2.0), rtol=2e-4)

    def test_filter_high_negatives(self):
        scores = jnp.array([[1.0, 0.96], [0.5, 1.0]])
        pos_idx = jnp.array([0, 1])
        out = filter_high_negatives(scores, pos_idx, filter_threshold=0.95, filter_factor=0.5)
        out = np.asarray(out)
        assert out[0, 1] == pytest.approx(0.48)
        assert out[0, 0] == 1.0
        assert out[1, 0] == 0.5
        assert out[1, 1] == 1.0


class TestColbertLoss:
    def test_zero_embeddings(self):
        loss_fn = ColbertLoss(temperature=1.0, normalize_scores=False)
        b, nq, d = 3, 1, 4
        loss = loss_fn(jnp.zeros((b, nq, d)), jnp.zeros((b, nq, d)))
        np.testing.assert_allclose(float(loss), math.log(b), rtol=2e-4)

    def test_filtering_noop_on_zeros(self):
        base = ColbertLoss(temperature=1.0, normalize_scores=False)
        filt = ColbertLoss(temperature=1.0, normalize_scores=False, pos_aware_negative_filtering=True)
        q = jnp.zeros((2, 1, 3))
        d = jnp.zeros((2, 1, 3))
        np.testing.assert_allclose(float(base(q, d)), float(filt(q, d)), rtol=2e-4)

    def test_offset_selects_correct_positives(self):
        """With gathered docs (C=2B) and offset=B, the loss must treat columns
        B..2B-1 as positives — the multi-device semantics of the reference
        (contrastive_trainer.py:148-150)."""
        rng = np.random.default_rng(0)
        b, nq, d = 4, 3, 8
        q = rng.normal(size=(b, nq, d)).astype(np.float32)
        docs_other = rng.normal(size=(b, nq, d)).astype(np.float32) * 0.1
        docs_local = q.copy()  # each doc contains exactly its query's tokens
        gathered = np.concatenate([docs_other, docs_local], axis=0)

        loss_fn = ColbertLoss(temperature=1.0, normalize_scores=False)
        loss_offset = float(loss_fn(jnp.asarray(q), jnp.asarray(gathered), offset=b))
        loss_wrong = float(loss_fn(jnp.asarray(q), jnp.asarray(gathered), offset=0))
        assert loss_offset < loss_wrong

    def test_traced_offset(self):
        """offset may be a traced jnp scalar (axis_index under pjit)."""
        loss_fn = ColbertLoss(temperature=1.0, normalize_scores=False)
        q = jnp.zeros((2, 1, 3))
        d = jnp.zeros((4, 1, 3))
        loss = loss_fn(q, d, offset=jnp.int32(2))
        np.testing.assert_allclose(float(loss), math.log(4), rtol=2e-4)


class TestColbertNegativeCELoss:
    def test_zero_embeddings_no_inbatch(self):
        loss_fn = ColbertNegativeCELoss(temperature=1.0, normalize_scores=False, in_batch_term_weight=0)
        b, lq, d, nneg, lneg = 2, 1, 3, 1, 1
        loss = loss_fn(jnp.zeros((b, lq, d)), jnp.zeros((b, lq, d)), jnp.zeros((b, nneg, lneg, d)))
        np.testing.assert_allclose(float(loss), SOFTPLUS0, rtol=2e-4)

    def test_zero_embeddings_with_inbatch(self):
        loss_fn = ColbertNegativeCELoss(temperature=1.0, normalize_scores=False, in_batch_term_weight=0.5)
        b = 2
        loss = loss_fn(jnp.zeros((b, 1, 3)), jnp.zeros((b, 1, 3)), jnp.zeros((b, 1, 1, 3)))
        expected = 0.5 * SOFTPLUS0 + 0.5 * math.log(b)
        np.testing.assert_allclose(float(loss), expected, rtol=2e-4)


class TestColbertPairwiseCELoss:
    def test_zero_embeddings(self):
        loss_fn = ColbertPairwiseCELoss(temperature=1.0, normalize_scores=False)
        loss = loss_fn(jnp.zeros((3, 1, 4)), jnp.zeros((3, 1, 4)))
        np.testing.assert_allclose(float(loss), SOFTPLUS0, rtol=2e-4)

    def test_separable_embeddings_low_loss(self):
        """Strongly diagonal scores -> near-zero loss."""
        b, d = 3, 4
        q = np.zeros((b, 1, d), np.float32)
        docs = np.zeros((b, 1, d), np.float32)
        for i in range(b):
            q[i, 0, i] = 10.0
            docs[i, 0, i] = 10.0
        loss_fn = ColbertPairwiseCELoss(temperature=1.0, normalize_scores=False)
        assert float(loss_fn(jnp.asarray(q), jnp.asarray(docs))) < 0.01


class TestColbertPairwiseNegativeCELoss:
    def test_zero_embeddings(self):
        loss_fn = ColbertPairwiseNegativeCELoss(
            temperature=1.0, normalize_scores=False, in_batch_term_weight=0.5
        )
        b = 2
        loss = loss_fn(jnp.zeros((b, 1, 3)), jnp.zeros((b, 1, 3)), jnp.zeros((b, 1, 1, 3)))
        np.testing.assert_allclose(float(loss), SOFTPLUS0, rtol=2e-4)


class TestColbertSigmoidLoss:
    def test_zero_embeddings(self):
        loss_fn = ColbertSigmoidLoss(temperature=1.0, normalize_scores=False)
        loss = loss_fn(jnp.zeros((2, 1, 3)), jnp.zeros((2, 1, 3)))
        np.testing.assert_allclose(float(loss), SOFTPLUS0, rtol=2e-4)

    def test_perfect_scores_low_loss(self):
        b, d = 2, 4
        q = np.zeros((b, 1, d), np.float32)
        docs = np.zeros((b, 1, d), np.float32)
        for i in range(b):
            q[i, 0, i] = 30.0
            docs[i, 0, i] = 1.0
            for j in range(b):
                if j != i:
                    docs[j, 0, i] = -1.0
        loss_fn = ColbertSigmoidLoss(temperature=1.0, normalize_scores=False)
        assert float(loss_fn(jnp.asarray(q), jnp.asarray(docs))) < 0.01
