"""Bi-encoder loss tests (closed-form values, mirroring the reference's
hermetic strategy in /root/reference/tests/loss/test_bi_losses.py)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from colpali_tpu.losses import (
    BiEncoderLoss,
    BiNegativeCELoss,
    BiPairedEncoderLoss,
    BiPairwiseCELoss,
    BiPairwiseNegativeCELoss,
    BiSigmoidLoss,
)

SOFTPLUS0 = math.log(2.0)


class TestInit:
    def test_invalid_temperature(self):
        with pytest.raises(ValueError, match="strictly positive"):
            BiEncoderLoss(temperature=0.0)


class TestBiEncoderLoss:
    def test_zero_embeddings(self):
        loss_fn = BiEncoderLoss(temperature=1.0)
        b, d = 4, 5
        loss = loss_fn(jnp.zeros((b, d)), jnp.zeros((b, d)))
        np.testing.assert_allclose(float(loss), math.log(b), rtol=2e-4)

    def test_filtering_noop_on_zeros(self):
        b, d = 3, 2
        q = jnp.zeros((b, d))
        docs = jnp.zeros((b, d))
        l1 = BiEncoderLoss(temperature=1.0, pos_aware_negative_filtering=True)(q, docs)
        l2 = BiEncoderLoss(temperature=1.0)(q, docs)
        np.testing.assert_allclose(float(l1), float(l2), rtol=2e-4)

    def test_offset(self):
        """Gathered docs C=2B with offset picks correct positives."""
        b, d = 3, 4
        q = np.eye(b, d).astype(np.float32) * 5
        local = np.eye(b, d).astype(np.float32) * 5
        other = -np.ones((b, d), np.float32)
        gathered = np.concatenate([other, local], axis=0)
        loss_fn = BiEncoderLoss(temperature=1.0)
        good = float(loss_fn(jnp.asarray(q), jnp.asarray(gathered), offset=b))
        bad = float(loss_fn(jnp.asarray(q), jnp.asarray(gathered), offset=0))
        assert good < bad


class TestBiPairedEncoderLoss:
    def test_zero_embeddings(self):
        b, d = 4, 5
        loss = BiPairedEncoderLoss(temperature=1.0)(jnp.zeros((b, d)), jnp.zeros((b, d)))
        np.testing.assert_allclose(float(loss), math.log(b), rtol=2e-4)


class TestBiNegativeCELoss:
    def test_no_inbatch(self):
        loss_fn = BiNegativeCELoss(temperature=1.0, in_batch_term_weight=0)
        b, d, nneg = 3, 4, 1
        loss = loss_fn(jnp.zeros((b, d)), jnp.zeros((b, d)), jnp.zeros((b, nneg, d)))
        np.testing.assert_allclose(float(loss), SOFTPLUS0, rtol=2e-4)

    def test_with_inbatch(self):
        loss_fn = BiNegativeCELoss(temperature=1.0, in_batch_term_weight=0.5)
        b, d, nneg = 2, 3, 1
        loss = loss_fn(jnp.zeros((b, d)), jnp.zeros((b, d)), jnp.zeros((b, nneg, d)))
        expected = (SOFTPLUS0 + math.log(b)) / 2
        np.testing.assert_allclose(float(loss), expected, rtol=2e-4)


class TestBiPairwiseCELoss:
    def test_zero_embeddings(self):
        b, d = 4, 6
        loss = BiPairwiseCELoss(temperature=1.0)(jnp.zeros((b, d)), jnp.zeros((b, d)))
        np.testing.assert_allclose(float(loss), SOFTPLUS0, rtol=2e-4)

    def test_filtering_noop_on_zeros(self):
        b, d = 3, 5
        q = jnp.zeros((b, d))
        docs = jnp.zeros((b, d))
        l1 = BiPairwiseCELoss(temperature=1.0, pos_aware_negative_filtering=True)(q, docs)
        l2 = BiPairwiseCELoss(temperature=1.0)(q, docs)
        np.testing.assert_allclose(float(l1), float(l2), rtol=2e-4)

    def test_hardest_negative_mining(self):
        """The second-highest score is used when the top-1 equals the positive."""
        q = jnp.asarray(np.eye(2, 3, dtype=np.float32))
        docs = jnp.asarray(np.eye(2, 3, dtype=np.float32))
        loss = BiPairwiseCELoss(temperature=1.0)(q, docs)
        # scores = I; pos = 1, hardest neg = 0 -> softplus(-1)
        np.testing.assert_allclose(float(loss), math.log(1 + math.exp(-1.0)), rtol=2e-4)


class TestBiPairwiseNegativeCELoss:
    def test_no_inbatch(self):
        loss_fn = BiPairwiseNegativeCELoss(temperature=1.0, in_batch_term_weight=0)
        b, nneg, d = 5, 2, 4
        loss = loss_fn(jnp.zeros((b, d)), jnp.zeros((b, d)), jnp.zeros((b, nneg, d)))
        np.testing.assert_allclose(float(loss), SOFTPLUS0, rtol=2e-4)


class TestBiSigmoidLoss:
    def test_zero_embeddings(self):
        b, d = 2, 3
        loss = BiSigmoidLoss(temperature=1.0)(jnp.zeros((b, d)), jnp.zeros((b, d)))
        np.testing.assert_allclose(float(loss), SOFTPLUS0, rtol=2e-4)

    def test_blockwise_equivalence(self):
        """Our single-labels-matrix form must equal the reference's blockwise
        walk: mean over all (B, C) elements with +1 at (i, offset+i)."""
        rng = np.random.default_rng(1)
        b, d = 2, 4
        q = rng.normal(size=(b, d)).astype(np.float32)
        docs = rng.normal(size=(2 * b, d)).astype(np.float32)
        offset = b
        loss = float(BiSigmoidLoss(temperature=1.0)(jnp.asarray(q), jnp.asarray(docs), offset=offset))

        scores = q @ docs.T
        labels = -np.ones_like(scores)
        for i in range(b):
            labels[i, offset + i] = 1.0
        expected = np.mean(np.log1p(np.exp(-scores * labels)))
        np.testing.assert_allclose(loss, expected, rtol=2e-4)
