"""Shared building blocks for contrastive losses.

Pure-function JAX counterparts of the reference loss utilities
(/root/reference/colpali_engine/loss/late_interaction_losses.py:6-107 and
bi_encoder_losses.py:6-61). Everything here is functional (no in-place
mutation) and works with a *traced* ``offset`` so the same code runs inside a
``shard_map``/``pjit`` data-parallel loss where ``offset = axis_index * B``.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp

Scalar = Union[int, jnp.ndarray]


def hp_einsum(subscripts: str, *operands: jnp.ndarray) -> jnp.ndarray:
    """Einsum with fp32 accumulation and exact (HIGHEST) precision.

    Loss-side score contractions are small; exactness beats the bf16-passes
    default, and on TPU with bf16 inputs HIGHEST costs nothing extra.
    """
    return jnp.einsum(
        subscripts,
        *operands,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def smooth_max(scores: jnp.ndarray, axis: int, tau: float) -> jnp.ndarray:
    """Smooth max via temperature-scaled log-sum-exp (reference :40-44)."""
    return tau * jax.nn.logsumexp(scores / tau, axis=axis)


def aggregate(
    raw: jnp.ndarray,
    use_smooth_max: bool,
    axis_max: int,
    axis_sum: int,
    tau: float,
) -> jnp.ndarray:
    """Token-level -> document-level score aggregation (reference :73-91).

    Max (or smooth-max) over doc tokens, then sum over query tokens. When
    ``axis_sum`` indexes a dimension after ``axis_max`` in the original array,
    callers must pass the *post-reduction* axis (same convention as torch,
    where ``amax(dim_max).sum(dim_sum)`` operates on the reduced tensor).
    """
    if use_smooth_max:
        reduced = smooth_max(raw, axis=axis_max, tau=tau)
    else:
        reduced = jnp.max(raw, axis=axis_max)
    return jnp.sum(reduced, axis=axis_sum)


def query_lengths(query_embeddings: jnp.ndarray) -> jnp.ndarray:
    """Number of non-padding query tokens per row (reference :152).

    A token is counted iff the first component of its embedding is nonzero —
    identical to the reference heuristic (padding vectors are all-zero).
    """
    return jnp.sum(query_embeddings[:, :, 0] != 0, axis=1)


def apply_normalization(
    scores: jnp.ndarray,
    lengths: jnp.ndarray,
    norm_tol: float = 1e-3,
    warn: bool = False,
) -> jnp.ndarray:
    """Normalize scores by query length; optionally warn if out of
    [0-tol, 1+tol].

    Functional version of reference :46-71 (which prints rather than raises).
    ``warn`` is off by default: it uses a host callback (jax.debug.print),
    which some TPU runtimes (axon PJRT) do not support inside jitted code.
    """
    if scores.ndim == 2:
        normalized = scores / lengths[:, None]
    else:
        normalized = scores / lengths
    if warn:
        mn = jnp.min(normalized)
        mx = jnp.max(normalized)
        out_of_bounds = (mn < -norm_tol) | (mx > 1 + norm_tol)

        def _warn(args):
            mn_, mx_ = args
            jax.debug.print(
                "Scores out of bounds after normalization: min={mn:.4f}, max={mx:.4f}",
                mn=mn_,
                mx=mx_,
            )

        jax.lax.cond(out_of_bounds, _warn, lambda args: None, (mn, mx))
    return normalized


def filter_high_negatives(
    scores: jnp.ndarray,
    pos_idx: jnp.ndarray,
    filter_threshold: float,
    filter_factor: float,
) -> jnp.ndarray:
    """Down-weight negatives scoring above a fraction of the positive score.

    Functional counterpart of reference :93-107 (in-place there). ``scores``
    is ``(B, C)``; ``pos_idx`` gives each row's positive column (may be
    traced).
    """
    b, c = scores.shape
    rows = jnp.arange(b)
    pos_scores = scores[rows, pos_idx]  # (B,)
    thresh = filter_threshold * pos_scores[:, None]
    col = jax.lax.broadcasted_iota(jnp.int32, (b, c), 1)
    is_pos = col == pos_idx[:, None]
    mask = (scores > thresh) & ~is_pos
    return jnp.where(mask, scores * filter_factor, scores)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross-entropy with integer labels (torch CrossEntropyLoss)."""
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(logz - picked)


def softplus(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.softplus(x)


def positive_indices(batch_size: int, offset: Scalar) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(idx, pos_idx) pair for in-batch losses (reference :33-38)."""
    idx = jnp.arange(batch_size)
    return idx, idx + offset


def slice_rows(x: jnp.ndarray, offset: Scalar, size: int) -> jnp.ndarray:
    """``x[offset : offset + size]`` with a possibly-traced offset."""
    return jax.lax.dynamic_slice_in_dim(x, offset, size, axis=0)
