"""Late-interaction (MaxSim / ColBERT-style) scoring ops.

TPU-native reimplementation of the reference scoring utilities
(/root/reference/colpali_engine/utils/processing_utils.py:103-187):

- ``score_single_vector``: dense dot-product scores for bi-encoders.
- ``score_multi_vector``: MaxSim — for every (query, passage) pair, each query
  token takes its max similarity over passage tokens, summed over query tokens.

Design notes (TPU-first, not a translation):

- The hot op is phrased as ONE large matmul ``(B·Nq, D) x (D, C·Np)`` so XLA
  tiles it straight onto the MXU, followed by a reshape + max/sum reduce that
  XLA fuses into the matmul epilogue. The reference's 4D einsum
  ``bnd,csd->bcns`` materializes the token-level score tensor; we never do.
- Zero padding is score-neutral by construction: padded tokens are all-zero
  vectors, so they contribute 0 to the max over passage tokens (scores of real
  tokens are in [-1, 1] and documents always have at least one real token) and
  0 to the sum over query tokens. This exactly matches the reference's
  pad_sequence(padding_value=0) semantics.
- All shapes are static: inputs are padded to shared bucket lengths before the
  jitted computation, so repeated calls hit the compile cache.

A fused Pallas kernel for corpus-scale scoring (streaming HBM corpus + top-k)
lives in :mod:`colpali_tpu.ops.maxsim_pallas`; this module is the reference
implementation and the small-batch path.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from colpali_tpu.utils.tensor_utils import pad_sequences

Array = Union[np.ndarray, jnp.ndarray]
ArrayLike = Union[Array, Sequence[Array]]


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def maxsim(
    query_embeddings: jnp.ndarray,
    doc_embeddings: jnp.ndarray,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Dense MaxSim scores between all queries and all docs.

    Args:
        query_embeddings: ``(B, Nq, D)`` zero-padded query token embeddings.
        doc_embeddings: ``(C, Np, D)`` zero-padded doc token embeddings.
        compute_dtype: accumulation dtype for the matmul (fp32 on MXU).

    Returns:
        ``(B, C)`` float32 score matrix. Matches the reference einsum
        ``("bnd,csd->bcns").max(3).sum(2)`` (processing_utils.py:179).
    """
    b, nq, d = query_embeddings.shape
    c, np_, _ = doc_embeddings.shape
    q2 = query_embeddings.reshape(b * nq, d)
    p2 = doc_embeddings.reshape(c * np_, d)
    # (B*Nq, C*Np) token-level similarities in one MXU-friendly matmul.
    sim = jax.lax.dot_general(
        q2,
        p2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=compute_dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    sim = sim.reshape(b, nq, c, np_)
    # Max over doc tokens, sum over query tokens.
    return jnp.sum(jnp.max(sim, axis=3), axis=1).astype(jnp.float32)


@jax.jit
def maxsim_pairwise(
    query_embeddings: jnp.ndarray,
    doc_embeddings: jnp.ndarray,
) -> jnp.ndarray:
    """Row-aligned MaxSim: score of query i against doc i only.

    Args:
        query_embeddings: ``(B, Nq, D)``.
        doc_embeddings: ``(B, Np, D)``.

    Returns:
        ``(B,)`` float32 scores. Matches the reference einsum
        ``("bnd,bsd->bns")`` + max/sum (late_interaction_losses.py:235-239).
    """
    sim = jnp.einsum(
        "bnd,bsd->bns",
        query_embeddings,
        doc_embeddings,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.sum(jnp.max(sim, axis=2), axis=1)


def _as_list(xs: ArrayLike) -> List[np.ndarray]:
    """Normalize a (list of 2D) / (3D) embedding input to a list of 2D arrays."""
    if isinstance(xs, (list, tuple)):
        out = [np.asarray(x) for x in xs]
        if any(x.ndim != 2 for x in out):
            raise ValueError("Expected a list of 2D (seq, dim) arrays.")
        return out
    xs = np.asarray(xs)
    if xs.ndim == 2:
        return [xs]
    if xs.ndim == 3:
        return list(xs)
    raise ValueError("Expected a 3D array or a list of 2D arrays.")


def score_single_vector(qs: ArrayLike, ps: ArrayLike) -> np.ndarray:
    """Dot-product scores for single-vector (bi-encoder) embeddings.

    Mirrors the reference ``score_single_vector``
    (processing_utils.py:103-130): ``einsum("bd,cd->bc")`` in float32.
    """
    qs_arr = np.stack([np.asarray(q) for q in qs]) if isinstance(qs, (list, tuple)) else np.asarray(qs)
    ps_arr = np.stack([np.asarray(p) for p in ps]) if isinstance(ps, (list, tuple)) else np.asarray(ps)
    if qs_arr.shape[0] == 0:
        raise ValueError("No queries provided")
    if ps_arr.shape[0] == 0:
        raise ValueError("No passages provided")
    scores = jax.lax.dot_general(
        jnp.asarray(qs_arr),
        jnp.asarray(ps_arr),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return np.asarray(scores, dtype=np.float32)


def score_multi_vector(
    qs: ArrayLike,
    ps: ArrayLike,
    batch_size: int = 128,
    token_pad_multiple: int = 16,
) -> np.ndarray:
    """MaxSim scores between multi-vector queries and passages.

    API mirror of the reference ``score_multi_vector``
    (processing_utils.py:132-187). Accepts ragged lists of ``(len_i, dim)``
    arrays or an already-padded 3D array; returns an ``(n_queries,
    n_passages)`` float32 numpy array.

    All sequences are padded once to the global max length (rounded up to
    ``token_pad_multiple`` for TPU tiling), so every jitted block call shares
    one compiled program regardless of input raggedness.
    """
    qs_list = _as_list(qs)
    ps_list = _as_list(ps)
    if len(qs_list) == 0:
        raise ValueError("No queries provided")
    if len(ps_list) == 0:
        raise ValueError("No passages provided")

    dim = qs_list[0].shape[1]
    for x in (*qs_list, *ps_list):
        if x.shape[1] != dim:
            raise ValueError(f"Embedding dim mismatch: expected {dim}, got {x.shape[1]}")

    nq = max(q.shape[0] for q in qs_list)
    np_len = max(p.shape[0] for p in ps_list)

    scores_rows: List[np.ndarray] = []
    for i in range(0, len(qs_list), batch_size):
        q_block = jnp.asarray(
            pad_sequences(qs_list[i : i + batch_size], pad_to=nq, pad_multiple=token_pad_multiple)
        )
        row_blocks: List[np.ndarray] = []
        for j in range(0, len(ps_list), batch_size):
            p_block = jnp.asarray(
                pad_sequences(ps_list[j : j + batch_size], pad_to=np_len, pad_multiple=token_pad_multiple)
            )
            row_blocks.append(np.asarray(maxsim(q_block, p_block)))
        scores_rows.append(np.concatenate(row_blocks, axis=1))

    scores = np.concatenate(scores_rows, axis=0)
    assert scores.shape[0] == len(qs_list), f"Expected {len(qs_list)} scores, got {scores.shape[0]}"
    return scores.astype(np.float32)
