"""Late-interaction (ColBERT-style) contrastive losses in JAX.

Behavioral spec: /root/reference/colpali_engine/loss/late_interaction_losses.py
(6 losses, each taking an ``offset`` so that, with documents all-gathered
across the data-parallel axis, each shard's positives sit at
``offset = axis_index * batch_size`` in the gathered doc matrix).

TPU-first notes:
- Token-level similarity tensors are produced by single large contractions
  (``einsum`` lowered to one MXU matmul) and reduced immediately; nothing here
  blocks XLA fusion.
- All classes are stateless callables: hyperparameters are Python-level
  (static under jit), array arguments may be traced, including ``offset``.
- ``jnp.max`` (hard max) has the same subgradient convention torch uses for
  ``amax``; smooth-max uses logsumexp and is fully differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from colpali_tpu.losses.common import (
    Scalar,
    aggregate,
    apply_normalization,
    cross_entropy,
    filter_high_negatives,
    hp_einsum,
    positive_indices,
    query_lengths,
    slice_rows,
    softplus,
)


class ColbertLossBase:
    """Shared hyperparameters for late-interaction losses (reference :6-31)."""

    def __init__(
        self,
        temperature: float = 0.02,
        normalize_scores: bool = True,
        use_smooth_max: bool = False,
        pos_aware_negative_filtering: bool = False,
        tau: float = 0.1,
        norm_tol: float = 1e-3,
        filter_threshold: float = 0.95,
        filter_factor: float = 0.5,
        warn_out_of_bounds: bool = False,
    ):
        if temperature <= 0:
            raise ValueError("Temperature must be strictly positive")
        self.temperature = temperature
        self.normalize_scores = normalize_scores
        self.use_smooth_max = use_smooth_max
        self.pos_aware_negative_filtering = pos_aware_negative_filtering
        self.tau = tau
        self.norm_tol = norm_tol
        self.filter_threshold = filter_threshold
        self.filter_factor = filter_factor
        self.warn_out_of_bounds = warn_out_of_bounds

    def _full_scores(self, query_embeddings: jnp.ndarray, doc_embeddings: jnp.ndarray) -> jnp.ndarray:
        """(B, C) MaxSim scores of every query against every (gathered) doc."""
        raw = hp_einsum("bnd,csd->bcns", query_embeddings, doc_embeddings)
        return aggregate(raw, self.use_smooth_max, axis_max=3, axis_sum=2, tau=self.tau)

    def _maybe_normalize(self, scores: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        if self.normalize_scores:
            return apply_normalization(scores, lengths, self.norm_tol, warn=self.warn_out_of_bounds)
        return scores


class ColbertLoss(ColbertLossBase):
    """In-batch InfoNCE over MaxSim scores (reference :110-164)."""

    def __init__(self, temperature: float = 0.02, **kwargs):
        super().__init__(temperature=temperature, **kwargs)

    def __call__(
        self,
        query_embeddings: jnp.ndarray,
        doc_embeddings: jnp.ndarray,
        offset: Scalar = 0,
    ) -> jnp.ndarray:
        lengths = query_lengths(query_embeddings)
        scores = self._full_scores(query_embeddings, doc_embeddings)
        scores = self._maybe_normalize(scores, lengths)

        batch_size = scores.shape[0]
        _, pos_idx = positive_indices(batch_size, offset)
        if self.pos_aware_negative_filtering:
            scores = filter_high_negatives(scores, pos_idx, self.filter_threshold, self.filter_factor)
        return cross_entropy(scores / self.temperature, pos_idx)


class ColbertNegativeCELoss(ColbertLossBase):
    """Softplus margin on explicit negatives + optional in-batch InfoNCE term
    (reference :167-252)."""

    def __init__(
        self,
        temperature: float = 0.02,
        in_batch_term_weight: float = 0.5,
        **kwargs,
    ):
        super().__init__(temperature=temperature, **kwargs)
        if not 0 <= in_batch_term_weight <= 1:
            raise ValueError("in_batch_term_weight must be in [0, 1]")
        self.in_batch_term_weight = in_batch_term_weight
        self.inner_loss = ColbertLoss(
            temperature=temperature,
            normalize_scores=self.normalize_scores,
            use_smooth_max=self.use_smooth_max,
            pos_aware_negative_filtering=self.pos_aware_negative_filtering,
            tau=self.tau,
            norm_tol=self.norm_tol,
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
        lengths = query_lengths(query_embeddings)
        local_docs = slice_rows(doc_embeddings, offset, b)
        pos_raw = hp_einsum("bnd,bsd->bns", query_embeddings, local_docs)
        neg_raw = hp_einsum("bnd,blsd->blns", query_embeddings, neg_doc_embeddings)
        pos_scores = aggregate(pos_raw, self.use_smooth_max, axis_max=2, axis_sum=1, tau=self.tau)
        neg_scores = aggregate(neg_raw, self.use_smooth_max, axis_max=3, axis_sum=2, tau=self.tau)
        pos_scores = self._maybe_normalize(pos_scores, lengths)
        neg_scores = self._maybe_normalize(neg_scores, lengths)

        loss = jnp.mean(softplus((neg_scores - pos_scores[:, None]) / self.temperature))
        if self.in_batch_term_weight > 0:
            loss_ib = self.inner_loss(query_embeddings, doc_embeddings, offset)
            loss = loss * (1 - self.in_batch_term_weight) + loss_ib * self.in_batch_term_weight
        return loss


class ColbertPairwiseCELoss(ColbertLossBase):
    """Softplus(hardest in-batch negative - positive) (reference :255-313)."""

    def __init__(self, temperature: float = 1.0, **kwargs):
        super().__init__(temperature=temperature, **kwargs)

    def __call__(
        self,
        query_embeddings: jnp.ndarray,
        doc_embeddings: jnp.ndarray,
        offset: Scalar = 0,
    ) -> jnp.ndarray:
        lengths = query_lengths(query_embeddings)
        scores = self._full_scores(query_embeddings, doc_embeddings)
        scores = self._maybe_normalize(scores, lengths)

        batch_size = scores.shape[0]
        idx, pos_idx = positive_indices(batch_size, offset)
        if self.pos_aware_negative_filtering:
            scores = filter_high_negatives(scores, pos_idx, self.filter_threshold, self.filter_factor)

        pos_scores = scores[idx, pos_idx]
        top2_vals, _ = jax.lax.top_k(scores, 2)  # (B, 2) descending
        neg_scores = jnp.where(top2_vals[:, 0] == pos_scores, top2_vals[:, 1], top2_vals[:, 0])
        return jnp.mean(softplus((neg_scores - pos_scores) / self.temperature))


class ColbertPairwiseNegativeCELoss(ColbertLossBase):
    """Pairwise softplus on explicit negatives + optional in-batch pairwise
    term (reference :316-398)."""

    def __init__(
        self,
        temperature: float = 0.02,
        in_batch_term_weight: float = 0.5,
        **kwargs,
    ):
        super().__init__(temperature=temperature, **kwargs)
        if not 0 <= in_batch_term_weight <= 1:
            raise ValueError("in_batch_term_weight must be in [0, 1]")
        self.in_batch_term_weight = in_batch_term_weight
        self.inner_pairwise = ColbertPairwiseCELoss(
            temperature=temperature,
            normalize_scores=self.normalize_scores,
            use_smooth_max=self.use_smooth_max,
            pos_aware_negative_filtering=self.pos_aware_negative_filtering,
            tau=self.tau,
            norm_tol=self.norm_tol,
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
        lengths = query_lengths(query_embeddings)
        local_docs = slice_rows(doc_embeddings, offset, b)
        pos_raw = hp_einsum("bnd,bld->bnl", query_embeddings, local_docs)
        # (B, n_negs, Nq, Lneg)
        neg_raw = hp_einsum("bnd,bsld->bsnl", query_embeddings, neg_doc_embeddings)
        pos_scores = aggregate(pos_raw, self.use_smooth_max, axis_max=2, axis_sum=1, tau=self.tau)
        neg_scores = aggregate(neg_raw, self.use_smooth_max, axis_max=3, axis_sum=2, tau=self.tau)
        pos_scores = self._maybe_normalize(pos_scores, lengths)
        neg_scores = self._maybe_normalize(neg_scores, lengths)

        loss = jnp.mean(softplus((neg_scores - pos_scores[:, None]) / self.temperature))
        if self.in_batch_term_weight > 0:
            loss_ib = self.inner_pairwise(query_embeddings, doc_embeddings, offset)
            loss = loss * (1 - self.in_batch_term_weight) + loss_ib * self.in_batch_term_weight
        return loss


class ColbertSigmoidLoss(ColbertLossBase):
    """Elementwise sigmoid (softplus) loss over the in-batch score matrix
    (reference :401-465).

    The reference implementation assumes the gathered doc axis equals the
    local batch (it builds a ``B*B`` label vector); we generalize to ``(B, C)``
    scores with labels +1 at column ``offset + i`` for row ``i`` and -1
    elsewhere, which is identical for the single-process ``C == B, offset=0``
    case the reference supports.
    """

    def __call__(
        self,
        query_embeddings: jnp.ndarray,
        doc_embeddings: jnp.ndarray,
        offset: Scalar = 0,
    ) -> jnp.ndarray:
        lengths = query_lengths(query_embeddings)
        scores = self._full_scores(query_embeddings, doc_embeddings)
        scores = self._maybe_normalize(scores, lengths)

        b, c = scores.shape
        _, pos_idx = positive_indices(b, offset)
        if self.pos_aware_negative_filtering:
            scores = filter_high_negatives(scores, pos_idx, self.filter_threshold, self.filter_factor)

        col = jnp.arange(c)[None, :]
        labels = jnp.where(col == pos_idx[:, None], 1.0, -1.0)
        return jnp.mean(softplus(-(scores / self.temperature) * labels))
