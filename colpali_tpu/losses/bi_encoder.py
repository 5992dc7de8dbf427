"""Bi-encoder (single-vector) contrastive losses in JAX.

Behavioral spec: /root/reference/colpali_engine/loss/bi_encoder_losses.py
(7 losses). Same conventions as :mod:`colpali_tpu.losses.late_interaction`:
stateless callables, traced-``offset`` safe, functional negative filtering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from colpali_tpu.losses.common import (
    Scalar,
    cross_entropy,
    filter_high_negatives,
    hp_einsum,
    positive_indices,
    slice_rows,
    softplus,
)


def _dense_scores(query_embeddings: jnp.ndarray, doc_embeddings: jnp.ndarray) -> jnp.ndarray:
    """(B, C) dot-product similarity matrix (reference einsum "bd,cd->bc")."""
    return jax.lax.dot_general(
        query_embeddings,
        doc_embeddings,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


class BiEncoderLossBase:
    """Shared hyperparameters (reference :6-61)."""

    def __init__(
        self,
        temperature: float = 0.02,
        pos_aware_negative_filtering: bool = False,
        filter_threshold: float = 0.95,
        filter_factor: float = 0.5,
    ):
        if temperature <= 0:
            raise ValueError("Temperature must be strictly positive")
        self.temperature = temperature
        self.pos_aware_negative_filtering = pos_aware_negative_filtering
        self.filter_threshold = filter_threshold
        self.filter_factor = filter_factor

    def _maybe_filter(self, scores: jnp.ndarray, pos_idx: jnp.ndarray) -> jnp.ndarray:
        if self.pos_aware_negative_filtering:
            return filter_high_negatives(scores, pos_idx, self.filter_threshold, self.filter_factor)
        return scores


class BiEncoderLoss(BiEncoderLossBase):
    """In-batch InfoNCE (reference :64-113)."""

    def __call__(
        self,
        query_embeddings: jnp.ndarray,
        doc_embeddings: jnp.ndarray,
        offset: Scalar = 0,
    ) -> jnp.ndarray:
        scores = _dense_scores(query_embeddings, doc_embeddings)
        _, pos_idx = positive_indices(scores.shape[0], offset)
        scores = self._maybe_filter(scores, pos_idx)
        return cross_entropy(scores / self.temperature, pos_idx)


class BiPairedEncoderLoss(BiEncoderLossBase):
    """Symmetric query<->doc InfoNCE (reference :116-168).

    The doc->query direction uses the *local* identity labels (reference
    labels ``t2q`` with ``idx``, not ``pos_idx``); with gathered docs this
    matches the reference only when ``C == B``.
    """

    def __call__(
        self,
        query_embeddings: jnp.ndarray,
        doc_embeddings: jnp.ndarray,
        offset: Scalar = 0,
    ) -> jnp.ndarray:
        scores = _dense_scores(query_embeddings, doc_embeddings)
        idx, pos_idx = positive_indices(scores.shape[0], offset)
        scores = self._maybe_filter(scores, pos_idx)
        q2t = cross_entropy(scores / self.temperature, pos_idx)
        t2q = cross_entropy(scores.T / self.temperature, idx)
        return (q2t + t2q) / 2.0


class BiNegativeCELoss(BiEncoderLossBase):
    """Softplus margin on explicit negatives + optional in-batch InfoNCE
    (reference :171-236)."""

    def __init__(self, temperature: float = 0.02, in_batch_term_weight: float = 0.5, **kwargs):
        super().__init__(temperature=temperature, **kwargs)
        if not 0 <= in_batch_term_weight <= 1:
            raise ValueError("in_batch_term_weight must be in [0, 1]")
        self.in_batch_term_weight = in_batch_term_weight
        self.inner_loss = BiEncoderLoss(
            temperature=temperature,
            pos_aware_negative_filtering=self.pos_aware_negative_filtering,
            filter_threshold=self.filter_threshold,
            filter_factor=self.filter_factor,
        )

    def __call__(
        self,
        query_embeddings: jnp.ndarray,
        doc_embeddings: jnp.ndarray,
        neg_doc_embeddings: jnp.ndarray,
        offset: Scalar = 0,
    ) -> jnp.ndarray:
        b = neg_doc_embeddings.shape[0]
        local_docs = slice_rows(doc_embeddings, offset, b)
        pos_scores = jnp.sum(query_embeddings * local_docs, axis=1) / self.temperature
        neg_scores = hp_einsum("bd,bnd->bn", query_embeddings, neg_doc_embeddings) / self.temperature
        loss = jnp.mean(softplus(neg_scores - pos_scores[:, None]))
        if self.in_batch_term_weight > 0:
            loss_ib = self.inner_loss(query_embeddings, doc_embeddings, offset)
            loss = loss * (1 - self.in_batch_term_weight) + loss_ib * self.in_batch_term_weight
        return loss


class BiPairwiseCELoss(BiEncoderLossBase):
    """Softplus(hardest in-batch negative - positive) (reference :239-289).

    Note: the reference takes the *local* diagonal as positives (no offset),
    and filters with identity indices; we reproduce that exactly.
    """

    def __call__(
        self,
        query_embeddings: jnp.ndarray,
        doc_embeddings: jnp.ndarray,
        offset: Scalar = 0,  # noqa: ARG002 - kept for API parity; unused like the reference
    ) -> jnp.ndarray:
        scores = _dense_scores(query_embeddings, doc_embeddings)
        b = scores.shape[0]
        idx = jnp.arange(b)
        pos_scores = scores[idx, idx]
        scores = self._maybe_filter(scores, idx)
        top2_vals, _ = jax.lax.top_k(scores, 2)
        neg_scores = jnp.where(top2_vals[:, 0] == pos_scores, top2_vals[:, 1], top2_vals[:, 0])
        return jnp.mean(softplus((neg_scores - pos_scores) / self.temperature))


class BiPairwiseNegativeCELoss(BiEncoderLossBase):
    """Pairwise softplus on explicit negatives + optional in-batch pairwise
    term (reference :292-351)."""

    def __init__(self, temperature: float = 0.02, in_batch_term_weight: float = 0.5, **kwargs):
        super().__init__(temperature=temperature, **kwargs)
        if not 0 <= in_batch_term_weight <= 1:
            raise ValueError("in_batch_term_weight must be in [0, 1]")
        self.in_batch_term_weight = in_batch_term_weight
        self.inner_pairwise = BiPairwiseCELoss(
            temperature=temperature,
            pos_aware_negative_filtering=False,
            filter_threshold=self.filter_threshold,
            filter_factor=self.filter_factor,
        )

    def __call__(
        self,
        query_embeddings: jnp.ndarray,
        doc_embeddings: jnp.ndarray,
        neg_doc_embeddings: jnp.ndarray,
        offset: Scalar = 0,
    ) -> jnp.ndarray:
        b = query_embeddings.shape[0]
        local_docs = slice_rows(doc_embeddings, offset, b)
        pos = jnp.sum(query_embeddings * local_docs, axis=1)  # (B,)
        neg = jnp.sum(query_embeddings[:, None, :] * neg_doc_embeddings, axis=2)  # (B, N)
        loss = jnp.mean(softplus((neg - pos[:, None]) / self.temperature))
        if self.in_batch_term_weight > 0:
            loss_ib = self.inner_pairwise(query_embeddings, doc_embeddings, offset=offset)
            loss = loss * (1 - self.in_batch_term_weight) + loss_ib * self.in_batch_term_weight
        return loss


class BiSigmoidLoss(BiEncoderLossBase):
    """Elementwise sigmoid (softplus) loss over the (B, C) score matrix
    (reference :354-418).

    The reference walks the gathered doc axis in B-sized blocks, labeling the
    block containing the positives with +1 on its diagonal and everything else
    -1, then averages over all elements. That is algebraically identical to a
    single labels matrix with +1 at column ``offset + i`` for row ``i`` and -1
    elsewhere, averaged over all ``B*C`` elements — which is what we compute.
    """

    def __call__(
        self,
        query_embeddings: jnp.ndarray,
        doc_embeddings: jnp.ndarray,
        offset: Scalar = 0,
    ) -> jnp.ndarray:
        scores = _dense_scores(query_embeddings, doc_embeddings)
        b, c = scores.shape
        _, pos_idx = positive_indices(b, offset)
        scores = self._maybe_filter(scores, pos_idx)
        col = jnp.arange(c)[None, :]
        labels = jnp.where(col == pos_idx[:, None], 1.0, -1.0)
        return jnp.mean(softplus(-(scores / self.temperature) * labels))
