"""Binary (sign-sketch) MaxSim pre-filter kernels.

The coarse pass of the tiered retrieval pipeline — the role the reference
fills with its external PLAID index (processing_utils.py:189-244). Every
token embedding is collapsed to its sign bits (16x smaller than bf16, 8x
smaller than int8); the approximate token similarity between two sign
sketches q, d in {-1,+1}^D is

    sim(q, d) = D - 2 * popcount(q_bits XOR d_bits)

which is exactly ``dot(sign(q), sign(d))``. MaxSim over those approximate
similarities ranks well enough to shortlist ``k * alpha`` candidates that the
exact int8/bf16 kernels (ops/maxsim_pallas.py) then rescore — see
retrieval/store.py. This is also the credible path for corpora whose int8
form exceeds one chip's HBM: the binary store is 8x smaller.

Padding convention (no mask array): zero-padded DOC tokens must be replaced
by a copy of one of the doc's real tokens before packing — duplicates never
change a max, so scores equal MaxSim over the real tokens exactly, and the
kernel needs no validity plane (saving 4 mask bytes/token of HBM and a VPU
multiply per token pair). :func:`fill_doc_padding` does this using the FIRST
VALID token (not token 0: left-padding processors — qwen2/gemma3/modernvbert
— mask token 0 for short docs, and an all-zero word would score
``dim - 2*popcount(q)`` per query word instead of being neutral).
Fully-empty (fake) docs keep all-zero words and must be masked downstream by
doc count, as the exact kernels already do. Zero-padded QUERY tokens are
weighted out by the ``query_valid`` vector from ops/quant.binarize_words.

Layouts mirror the exact kernels' tile-major scheme (128-doc tiles, one
contiguous HBM read per grid step):

- corpus words: ``(C//DOC_TILE, W, Np, DOC_TILE)`` int32, ``W = D // 32``
  (word-major so the kernel XORs one ``(Np, DOC_TILE)`` plane per word
  against a scalar query word — elementwise VPU ops in the lane=docs layout)
- queries: packed words ``(B, Nq, W)`` int32 + validity ``(B, Nq)`` fp32,
  staged in SMEM and read as scalars.

Arithmetic: 3 VPU ops (xor, popcount, add) per corpus word per query token —
VPU-bound at serving query lengths, which still clears the exact int8
kernel's HBM floor ~2x at batch 1; the bigger win is the 8x HBM capacity.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from colpali_tpu.ops.maxsim_pallas import DOC_TILE


def fill_doc_padding(words: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Replace padded doc-token words with the doc's FIRST VALID token's words.

    Args:
        words: ``(C, Np, W)`` packed sign words (ops/quant.binarize_words).
        valid: ``(C, Np)`` fp32 token validity from the same call.

    Returns:
        ``(C, Np, W)`` with every invalid row replaced by the doc's first
        valid row (duplicating a real token is score-neutral under the max;
        left- and right-padded inputs both work). Fully-padded fake docs
        (no valid token) have all-zero valid, argmax lands on row 0, whose
        words binarize to 0 for a zero embedding — they stay all-zero and
        are masked downstream by doc count.
    """
    first_valid = jnp.argmax(valid > 0, axis=1)  # (C,)
    fill = jnp.take_along_axis(words, first_valid[:, None, None], axis=1)  # (C, 1, W)
    return jnp.where(valid[..., None] > 0, words, fill)


def words_to_tile_major(words_dm: jnp.ndarray) -> jnp.ndarray:
    """(C, Np, W) doc-major packed words -> (C//DOC_TILE, W, Np, DOC_TILE)."""
    c, np_, w = words_dm.shape
    if c % DOC_TILE != 0:
        raise ValueError(f"num docs ({c}) must be a multiple of {DOC_TILE}")
    return words_dm.reshape(c // DOC_TILE, DOC_TILE, np_, w).transpose(0, 3, 2, 1)


def _binary_kernel(q_ref, qv_ref, d_ref, out_ref, *, dim: int, nq: int):
    """K DOC_TILEs of docs per grid step.

    Shapes:
      q_ref:  (B*Nq, W) int32  — SMEM (scalar reads)
      qv_ref: (B*Nq, 1) f32    — SMEM query-token validity
      d_ref:  (K, W, Np, DOC_TILE) int32 — VMEM corpus tiles, word-major
      out_ref:(B, K*DOC_TILE) f32

    K > 1 amortizes the per-grid-step fixed cost, which DOMINATES once the
    sketch is token-pooled (coarse_pool >= 4 leaves ~2 ms of step overhead
    against <2 ms of VPU ops over ~8k steps — measured in docs/PERF.md;
    the exact kernel's multi-tile experiment hit an HBM plateau instead,
    a different regime).
    """
    b = out_ref.shape[0]
    n_words = q_ref.shape[1]
    k_tiles = d_ref.shape[0]
    for bi in range(b):
        for kt in range(k_tiles):
            acc = jnp.zeros((1, DOC_TILE), jnp.float32)
            for qi in range(nq):
                i = bi * nq + qi
                ham = jax.lax.population_count(jax.lax.bitwise_xor(d_ref[kt, 0], q_ref[i, 0]))
                for w in range(1, n_words):
                    ham += jax.lax.population_count(jax.lax.bitwise_xor(d_ref[kt, w], q_ref[i, w]))
                # sign-sketch dot product, max over doc tokens (sublane reduce)
                sim = (dim - 2 * ham).astype(jnp.float32)
                acc += qv_ref[i, 0] * jnp.max(sim, axis=0, keepdims=True)
            out_ref[bi : bi + 1, kt * DOC_TILE : (kt + 1) * DOC_TILE] = acc


@functools.partial(jax.jit, static_argnames=("dim", "interpret", "tiles_per_step"))
def binary_maxsim_pallas_tiled(
    query_words: jnp.ndarray,
    query_valid: jnp.ndarray,
    doc_words_tiled: jnp.ndarray,
    dim: int,
    interpret: bool = False,
    tiles_per_step: Optional[int] = None,
) -> jnp.ndarray:
    """Approximate MaxSim scores against a packed-bit tile-major corpus.

    Args:
        query_words: ``(B, Nq, W)`` int32 packed query sign bits.
        query_valid: ``(B, Nq)`` fp32 query-token validity (0.0 for padding).
        doc_words_tiled: ``(C//128, W, Np, 128)`` int32 corpus words with
            padding pre-filled (see :func:`fill_doc_padding`).
        dim: the original embedding dimension (= 32 * W).
        interpret: Pallas interpreter mode (hermetic CPU testing).
        tiles_per_step: DOC_TILEs per grid step (must divide the tile
            count). Default: auto — 1 for dense sketches, more for pooled
            sketches (small Np), where per-step overhead dominates the VPU
            ops (measured in docs/PERF.md "Pooled sketch").

    Returns:
        ``(B, C)`` fp32 approximate scores (each valid query token scored as
        ``max_j dot(sign(q_i), sign(d_j))`` over the doc's real tokens,
        summed over valid query tokens).
    """
    b, nq, n_words = query_words.shape
    n_tiles, w2, np_, t = doc_words_tiled.shape
    if w2 != n_words or n_words * 32 != dim:
        raise ValueError(f"word-count mismatch: queries {n_words}, docs {w2}, dim {dim}")
    c = n_tiles * DOC_TILE

    if tiles_per_step is None:
        # overhead-amortizing default: target >= 32 (Np, T) planes of work
        # per step, capped at 8 tiles (~VMEM KBs either way)
        tiles_per_step = max(1, min(8, 32 // max(1, np_ // 2)))
    k_tiles = next(k for k in range(min(tiles_per_step, n_tiles), 0, -1) if n_tiles % k == 0)

    q_flat = query_words.reshape(b * nq, n_words)
    qv_flat = query_valid.reshape(b * nq, 1).astype(jnp.float32)
    grid_spec = pl.GridSpec(
        grid=(n_tiles // k_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (k_tiles, n_words, np_, DOC_TILE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((b, k_tiles * DOC_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_binary_kernel, dim=dim, nq=nq),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            # xor+popcount+add per (query token, corpus word)
            flops=3 * b * nq * c * np_ * n_words,
            bytes_accessed=doc_words_tiled.size * 4 + b * c * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_flat, qv_flat, doc_words_tiled)


@functools.partial(jax.jit, static_argnames=("dim",))
def binary_maxsim_xla_tiled(
    query_words: jnp.ndarray,
    query_valid: jnp.ndarray,
    doc_words_tiled: jnp.ndarray,
    dim: int,
) -> jnp.ndarray:
    """XLA fallback with identical semantics to the Pallas kernel (used
    off-TPU and as the test oracle). Scans tile-by-tile so the broadcast
    XOR intermediate stays ~MBs regardless of corpus size."""
    b, nq, n_words = query_words.shape
    n_tiles = doc_words_tiled.shape[0]

    def step(_, words):  # words: (W, Np, T) int32
        x = jax.lax.bitwise_xor(query_words[:, :, :, None, None], words[None, None])
        ham = jnp.sum(jax.lax.population_count(x), axis=2)  # (B, Nq, Np, T)
        sim = (dim - 2 * ham).astype(jnp.float32)
        per_tok = jnp.max(sim, axis=2)  # (B, Nq, T)
        return None, jnp.einsum("bq,bqt->bt", query_valid, per_tok)

    _, scores = jax.lax.scan(step, None, doc_words_tiled)
    return scores.transpose(1, 0, 2).reshape(b, n_tiles * DOC_TILE)
