"""Fused Pallas TPU kernel for corpus-scale MaxSim scoring.

The serving hot path (reference: processing_utils.py:132-187 runs this as a
blocked torch einsum, materializing the token-level similarity tensor for
every block). Here the corpus lives in HBM in **token-major layout**
``(doc_tokens, num_docs, dim)``; the kernel streams 128-doc tiles into VMEM
(double-buffered by the Pallas grid pipeline), runs MXU matmuls per
token-chunk, and keeps a running max over doc tokens — the giant token-level
similarity tensor never touches HBM. Output is just the ``(B, num_docs)``
score matrix.

Why token-major: with docs in the lane dimension, every reshape in the kernel
is lane-preserving (the minor dim stays the 128-doc tile), which is the only
reshape Mosaic supports on TPU. A doc-major layout would need a
``(B*Nq, tile*Np) -> (B, Nq, tile, Np)`` shape cast that Mosaic rejects.

Tiling scheme:
- Grid: one step per ``DOC_TILE`` (=128) docs; output block ``(B, 128)``.
- Inside a step, doc tokens are processed in chunks of ``tok_chunk`` so the
  fp32 similarity chunk ``(B*Nq, tok_chunk*128)`` stays within ~2 MB of VMEM;
  a running elementwise max accumulates across chunks, then scores are summed
  over query tokens and stored once.

Arithmetic intensity: ``~B*Nq`` FLOPs per corpus byte — compute-bound for a
batch of ~32 queries, HBM-bandwidth-bound for single queries. Either way the
corpus is read exactly once per query batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DOC_TILE = 128  # docs per grid step == lane width
_SIM_VMEM_BUDGET = 2 * 1024 * 1024  # fp32 similarity chunk budget (bytes)


def to_token_major(doc_embeddings: jnp.ndarray) -> jnp.ndarray:
    """(C, Np, D) doc-major -> (Np, C, D) token-major corpus layout."""
    return jnp.transpose(doc_embeddings, (1, 0, 2))


def to_tile_major(doc_embeddings_tm: jnp.ndarray) -> jnp.ndarray:
    """(Np, C, D) token-major -> (C//DOC_TILE, Np, DOC_TILE, D) tile-major.

    Token-major grid blocks slice the corpus (middle) axis, so each grid
    step's DMA is Np separate strided (DOC_TILE, D) reads — 16 KB apiece at
    serving shapes, which caps HBM throughput around half of peak.
    Tile-major makes each grid step's block one contiguous read (~1 MB),
    recovering streaming bandwidth. This is the serving-store layout."""
    np_, c, d = doc_embeddings_tm.shape
    if c % DOC_TILE != 0:
        raise ValueError(f"num docs ({c}) must be a multiple of {DOC_TILE}")
    return (
        doc_embeddings_tm.transpose(1, 0, 2)
        .reshape(c // DOC_TILE, DOC_TILE, np_, d)
        .transpose(0, 2, 1, 3)
    )


def scales_to_tile_major(doc_scales_tm: jnp.ndarray) -> jnp.ndarray:
    """(Np, C) per-token scales -> (C//DOC_TILE, Np, DOC_TILE) tile-major."""
    np_, c = doc_scales_tm.shape
    return doc_scales_tm.transpose(1, 0).reshape(c // DOC_TILE, DOC_TILE, np_).transpose(0, 2, 1)


def _pick_tok_chunk(b: int, nq: int, np_: int) -> int:
    """Largest divisor of Np whose fp32 similarity chunk fits the budget."""
    budget = max(1, _SIM_VMEM_BUDGET // (4 * b * nq * DOC_TILE))
    chunk = min(np_, budget)
    while np_ % chunk != 0:
        chunk -= 1
    return chunk


def _maxsim_body(q2: jnp.ndarray, load_chunk, np_: int, tok_chunk: int, b: int, nq: int) -> jnp.ndarray:
    """Shared kernel body: chunked matmul + running max + query-token sum.

    q2: (B*Nq, D). load_chunk(s) -> (tok_chunk, DOC_TILE, D) doc token chunk.
    Returns (B, DOC_TILE) fp32 scores.
    """
    dim = q2.shape[1]
    # Everything stays 2D: Mosaic handles 128-aligned lane slices and sublane
    # reductions well, but rejects 3D relayouts/middle-axis reductions.
    m = jnp.full((b * nq, DOC_TILE), -jnp.inf, dtype=jnp.float32)
    for s in range(np_ // tok_chunk):
        dt = load_chunk(s).reshape(tok_chunk * DOC_TILE, dim)
        # (B*Nq, tok_chunk*DOC_TILE) on the MXU, fp32 accumulation.
        sim = jax.lax.dot_general(
            q2,
            dt,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for t in range(tok_chunk):  # running max over doc tokens (VPU)
            m = jnp.maximum(m, sim[:, t * DOC_TILE : (t + 1) * DOC_TILE])
    # Sum over each query's Nq token rows (sublane reduction per query).
    rows = [jnp.sum(m[i * nq : (i + 1) * nq], axis=0, keepdims=True) for i in range(b)]
    return rows[0] if b == 1 else jnp.concatenate(rows, axis=0)


def _maxsim_kernel(q_ref, d_ref, out_ref, *, tok_chunk: int):
    """One DOC_TILE of docs.

    Shapes (all VMEM):
      q_ref:   (B, Nq, D)            — full query batch, replicated per tile
      d_ref:   (Np, DOC_TILE, D)     — current corpus tile, token-major
      out_ref: (B, DOC_TILE)         — score tile
    """
    b, nq, dim = q_ref.shape
    np_ = d_ref.shape[0]
    q2 = q_ref[:].reshape(b * nq, dim)
    out_ref[:] = _maxsim_body(
        q2,
        lambda s: d_ref[s * tok_chunk : (s + 1) * tok_chunk],
        np_,
        tok_chunk,
        b,
        nq,
    )


def _maxsim_int8_kernel(q_ref, d_ref, dscale_ref, out_ref, *, tok_chunk: int):
    """Int8-corpus variant: docs are per-token int8 + fp32 scales.

    Dequantizes each chunk in VMEM (cheap VPU work). The win of int8 is 2x
    less HBM traffic, which is the bottleneck for small query batches.
    """
    b, nq, dim = q_ref.shape
    np_ = d_ref.shape[0]
    q2 = q_ref[:].reshape(b * nq, dim).astype(jnp.bfloat16)

    def load_chunk(s):
        d_chunk = d_ref[s * tok_chunk : (s + 1) * tok_chunk].astype(jnp.bfloat16)
        scale = dscale_ref[s * tok_chunk : (s + 1) * tok_chunk][..., None].astype(jnp.bfloat16)
        return d_chunk * scale

    out_ref[:] = _maxsim_body(q2, load_chunk, np_, tok_chunk, b, nq)


@functools.partial(jax.jit, static_argnames=("interpret",))
def maxsim_pallas_tm(
    query_embeddings: jnp.ndarray,
    doc_embeddings_tm: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """MaxSim scores against a token-major corpus.

    Args:
        query_embeddings: ``(B, Nq, D)`` zero-padded query token embeddings.
        doc_embeddings_tm: ``(Np, C, D)`` token-major corpus (use
            :func:`to_token_major`); ``C`` must be a multiple of 128. The
            retrieval store keeps the corpus in this layout.
        interpret: run in Pallas interpreter mode (CPU testing).

    Returns:
        ``(B, C)`` float32 scores, identical semantics to
        :func:`colpali_tpu.ops.maxsim.maxsim`.
    """
    b, nq, d = query_embeddings.shape
    np_, c, d2 = doc_embeddings_tm.shape
    if d != d2:
        raise ValueError(f"dim mismatch: queries {d} vs docs {d2}")
    if c % DOC_TILE != 0:
        raise ValueError(f"num docs ({c}) must be a multiple of {DOC_TILE}")
    tok_chunk = _pick_tok_chunk(b, nq, np_)

    grid_spec = pl.GridSpec(
        grid=(c // DOC_TILE,),
        in_specs=[
            pl.BlockSpec((b, nq, d), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, DOC_TILE, d), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, DOC_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
    )

    flops = 2 * b * nq * c * np_ * d
    bytes_accessed = (
        query_embeddings.size * query_embeddings.dtype.itemsize
        + doc_embeddings_tm.size * doc_embeddings_tm.dtype.itemsize
        + b * c * 4
    )

    return pl.pallas_call(
        functools.partial(_maxsim_kernel, tok_chunk=tok_chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )(query_embeddings, doc_embeddings_tm)


def maxsim_pallas(
    query_embeddings: jnp.ndarray,
    doc_embeddings: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """MaxSim via the Pallas kernel, accepting a doc-major ``(C, Np, D)``
    corpus (transposed on the fly — use :func:`maxsim_pallas_tm` with a
    pre-transposed corpus for the hot serving path)."""
    return maxsim_pallas_tm(query_embeddings, to_token_major(doc_embeddings), interpret=interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def maxsim_pallas_int8_tm(
    query_embeddings: jnp.ndarray,
    doc_embeddings_int8_tm: jnp.ndarray,
    doc_scales_tm: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """MaxSim against an int8-quantized token-major corpus.

    ``doc_embeddings_int8_tm``: ``(Np, C, D)`` int8; ``doc_scales_tm``:
    ``(Np, C)`` fp32 per-token scales (see :mod:`colpali_tpu.ops.quant`).
    """
    b, nq, d = query_embeddings.shape
    np_, c, _ = doc_embeddings_int8_tm.shape
    if c % DOC_TILE != 0:
        raise ValueError(f"num docs ({c}) must be a multiple of {DOC_TILE}")
    tok_chunk = _pick_tok_chunk(b, nq, np_)

    grid_spec = pl.GridSpec(
        grid=(c // DOC_TILE,),
        in_specs=[
            pl.BlockSpec((b, nq, d), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, DOC_TILE, d), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, DOC_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, DOC_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
    )

    flops = 2 * b * nq * c * np_ * d
    bytes_accessed = (
        query_embeddings.size * 2 + doc_embeddings_int8_tm.size + doc_scales_tm.size * 4 + b * c * 4
    )

    return pl.pallas_call(
        functools.partial(_maxsim_int8_kernel, tok_chunk=tok_chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )(query_embeddings, doc_embeddings_int8_tm, doc_scales_tm)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def maxsim_topk_tm(
    query_embeddings: jnp.ndarray,
    doc_embeddings_tm: jnp.ndarray,
    k: int = 100,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k docs per query by MaxSim score. Returns (scores, indices)."""
    scores = maxsim_pallas_tm(query_embeddings, doc_embeddings_tm, interpret=interpret)
    return jax.lax.top_k(scores, k)


def _maxsim_int8mxu_kernel(q_ref, qs_ref, d_ref, ds_ref, out_ref, *, tok_chunk: int, nq: int):
    """Full-int8 MXU variant: int8 x int8 -> int32 matmuls; doc scales applied
    to the similarity slice before the running max; query-token scales applied
    at the final weighted row-sum (positive scales commute with the max).

    Shapes (VMEM): q_ref (B*Nq, D) int8; qs_ref (B*Nq, 1) f32;
    d_ref (Np, DOC_TILE, D) int8; ds_ref (Np, DOC_TILE) f32;
    out_ref (B, DOC_TILE) f32.
    """
    _int8mxu_body(q_ref[:], qs_ref[:], lambda s: d_ref[s * tok_chunk : (s + 1) * tok_chunk],
                  lambda r: ds_ref[r : r + 1], d_ref.shape[0], out_ref,
                  tok_chunk=tok_chunk, nq=nq)


def _int8mxu_body(q2, qs, load_docs, load_scale_row, np_, out_ref, *, tok_chunk: int, nq: int):
    """Shared int8-MXU body. load_docs(s) -> (tok_chunk, DOC_TILE, D) int8;
    load_scale_row(r) -> (1, DOC_TILE) f32 for absolute token row r."""
    bnq, dim = q2.shape
    b = bnq // nq
    m = jnp.full((bnq, DOC_TILE), -jnp.inf, dtype=jnp.float32)
    for s in range(np_ // tok_chunk):
        dt = load_docs(s).reshape(tok_chunk * DOC_TILE, dim)
        sim = jax.lax.dot_general(
            q2, dt, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        for t in range(tok_chunk):
            ds = load_scale_row(s * tok_chunk + t)  # (1, DOC_TILE)
            m = jnp.maximum(m, sim[:, t * DOC_TILE : (t + 1) * DOC_TILE] * ds)
    m = m * qs
    rows = [jnp.sum(m[i * nq : (i + 1) * nq], axis=0, keepdims=True) for i in range(b)]
    out_ref[:] = rows[0] if b == 1 else jnp.concatenate(rows, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def maxsim_pallas_int8mxu_tm(
    query_int8: jnp.ndarray,
    query_scales: jnp.ndarray,
    doc_embeddings_int8_tm: jnp.ndarray,
    doc_scales_tm: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """MaxSim with int8 MATMULS (the fastest serving path: ~1.6x the
    dequant+bf16 kernel on v5e — 394 int8 TOPS vs 197 bf16 TFLOPs).

    ``query_int8/query_scales``: per-token symmetric quantization of the
    (B, Nq, D) queries (see ops.quant.quantize_per_token). Corpus as in
    :func:`maxsim_pallas_int8_tm`. Adds ~1/127-per-component query
    quantization error on top of the corpus quantization.
    """
    b, nq, d = query_int8.shape
    np_, c, _ = doc_embeddings_int8_tm.shape
    if c % DOC_TILE != 0:
        raise ValueError(f"num docs ({c}) must be a multiple of {DOC_TILE}")
    tok_chunk = _pick_tok_chunk(b, nq, np_)

    q_flat = query_int8.reshape(b * nq, d)
    qs_flat = query_scales.reshape(b * nq, 1).astype(jnp.float32)
    grid_spec = pl.GridSpec(
        grid=(c // DOC_TILE,),
        in_specs=[
            pl.BlockSpec((b * nq, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b * nq, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, DOC_TILE, d), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, DOC_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, DOC_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_maxsim_int8mxu_kernel, tok_chunk=tok_chunk, nq=nq),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nq * c * np_ * d,
            bytes_accessed=query_int8.size + doc_embeddings_int8_tm.size + doc_scales_tm.size * 4 + b * c * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_flat, qs_flat, doc_embeddings_int8_tm, doc_scales_tm)


# ---------------------------------------------------------------------------
# Tile-major kernels: identical math, contiguous per-grid-step DMA (see
# to_tile_major). These are the hot serving paths used by CorpusIndex.
# ---------------------------------------------------------------------------


def _maxsim_tiled_kernel(q_ref, d_ref, out_ref, *, tok_chunk: int):
    """bf16 tile-major variant: d_ref (1, Np, DOC_TILE, D)."""
    b, nq, dim = q_ref.shape
    np_ = d_ref.shape[1]
    q2 = q_ref[:].reshape(b * nq, dim)
    out_ref[:] = _maxsim_body(
        q2,
        lambda s: d_ref[0, s * tok_chunk : (s + 1) * tok_chunk],
        np_,
        tok_chunk,
        b,
        nq,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def maxsim_pallas_tiled(
    query_embeddings: jnp.ndarray,
    doc_embeddings_tiled: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """MaxSim against a tile-major ``(C//DOC_TILE, Np, DOC_TILE, D)`` corpus
    (see :func:`to_tile_major`). Same semantics as :func:`maxsim_pallas_tm`
    with contiguous per-step HBM reads."""
    b, nq, d = query_embeddings.shape
    n_tiles, np_, _, d2 = doc_embeddings_tiled.shape
    if d != d2:
        raise ValueError(f"dim mismatch: queries {d} vs docs {d2}")
    tok_chunk = _pick_tok_chunk(b, nq, np_)
    c = n_tiles * DOC_TILE

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b, nq, d), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, DOC_TILE, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, DOC_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_maxsim_tiled_kernel, tok_chunk=tok_chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nq * c * np_ * d,
            bytes_accessed=query_embeddings.size * query_embeddings.dtype.itemsize
            + doc_embeddings_tiled.size * doc_embeddings_tiled.dtype.itemsize
            + b * c * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(query_embeddings, doc_embeddings_tiled)


def _maxsim_int8_tiled_kernel(q_ref, d_ref, dscale_ref, out_ref, *, tok_chunk: int):
    """int8-dequant tile-major variant: d_ref (1, Np, DOC_TILE, D) int8,
    dscale_ref (1, Np, DOC_TILE) f32."""
    b, nq, dim = q_ref.shape
    np_ = d_ref.shape[1]
    q2 = q_ref[:].reshape(b * nq, dim).astype(jnp.bfloat16)

    def load_chunk(s):
        d_chunk = d_ref[0, s * tok_chunk : (s + 1) * tok_chunk].astype(jnp.bfloat16)
        scale = dscale_ref[0, s * tok_chunk : (s + 1) * tok_chunk][..., None].astype(jnp.bfloat16)
        return d_chunk * scale

    out_ref[:] = _maxsim_body(q2, load_chunk, np_, tok_chunk, b, nq)


@functools.partial(jax.jit, static_argnames=("interpret",))
def maxsim_pallas_int8_tiled(
    query_embeddings: jnp.ndarray,
    doc_embeddings_int8_tiled: jnp.ndarray,
    doc_scales_tiled: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """int8-corpus MaxSim over the tile-major layout (bf16 matmul after
    in-VMEM dequant; use :func:`scales_to_tile_major` for the scales)."""
    b, nq, d = query_embeddings.shape
    n_tiles, np_, _, _ = doc_embeddings_int8_tiled.shape
    tok_chunk = _pick_tok_chunk(b, nq, np_)
    c = n_tiles * DOC_TILE

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b, nq, d), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, DOC_TILE, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, DOC_TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, DOC_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_maxsim_int8_tiled_kernel, tok_chunk=tok_chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nq * c * np_ * d,
            bytes_accessed=query_embeddings.size * 2
            + doc_embeddings_int8_tiled.size
            + doc_scales_tiled.size * 4
            + b * c * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(query_embeddings, doc_embeddings_int8_tiled, doc_scales_tiled)


def _maxsim_int8mxu_tiled_kernel(q_ref, qs_ref, d_ref, ds_ref, out_ref, *, tok_chunk: int, nq: int):
    """Full-int8 MXU tile-major variant: d_ref (1, Np, DOC_TILE, D) int8,
    ds_ref (1, Np, DOC_TILE) f32."""
    _int8mxu_body(q_ref[:], qs_ref[:], lambda s: d_ref[0, s * tok_chunk : (s + 1) * tok_chunk],
                  lambda r: ds_ref[0, r : r + 1], d_ref.shape[1], out_ref,
                  tok_chunk=tok_chunk, nq=nq)


@functools.partial(jax.jit, static_argnames=("interpret",))
def maxsim_pallas_int8mxu_tiled(
    query_int8: jnp.ndarray,
    query_scales: jnp.ndarray,
    doc_embeddings_int8_tiled: jnp.ndarray,
    doc_scales_tiled: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full-int8 MXU MaxSim over the tile-major layout — the headline serving
    kernel (int8 MXU throughput + contiguous streaming reads)."""
    b, nq, d = query_int8.shape
    n_tiles, np_, _, _ = doc_embeddings_int8_tiled.shape
    tok_chunk = _pick_tok_chunk(b, nq, np_)
    c = n_tiles * DOC_TILE

    q_flat = query_int8.reshape(b * nq, d)
    qs_flat = query_scales.reshape(b * nq, 1).astype(jnp.float32)
    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b * nq, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b * nq, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, DOC_TILE, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, DOC_TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, DOC_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_maxsim_int8mxu_tiled_kernel, tok_chunk=tok_chunk, nq=nq),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nq * c * np_ * d,
            bytes_accessed=query_int8.size
            + doc_embeddings_int8_tiled.size
            + doc_scales_tiled.size * 4
            + b * c * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_flat, qs_flat, doc_embeddings_int8_tiled, doc_scales_tiled)


# ---------------------------------------------------------------------------
# Candidate gather: scalar-prefetch kernel for the two-tier rerank
# ---------------------------------------------------------------------------


def gather_candidates_pallas(
    store: jnp.ndarray,
    scales: jnp.ndarray | None,
    cand: jnp.ndarray,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray | None]:
    """Gather candidate docs from the tile-major store by doc id.

    The rerank step of the two-tier (binary-prefilter) search. XLA's own
    gather/dynamic-slice lowerings relayout-copy the ENTIRE store on TPU for
    this access pattern (observed +7.6 GB HBM at 1M docs) or pay ~9 us per
    candidate; here the candidate ids are scalar-prefetched and drive the
    BlockSpec index maps directly, so each grid step DMAs exactly the
    (Np, 8-lane, D) sublane group holding its candidate (~64 KB).

    Args:
        store: ``(nt, Np, DOC_TILE, D)`` int8/bf16 tile-major corpus.
        scales: ``(nt, Np, DOC_TILE)`` f32 per-token scales, or None (bf16).
        cand: ``(c,)`` int32 doc ids (``tile*DOC_TILE + lane``).
        interpret: Pallas interpreter mode (hermetic CPU testing).

    Returns:
        ``(c, Np, D)`` docs (store dtype) and ``(c, Np)`` f32 scales (or
        None), in candidate order.
    """
    (c,) = cand.shape
    nt, np_, t_, d = store.shape
    has_scales = scales is not None

    in_specs = [
        pl.BlockSpec((1, np_, 8, d), lambda i, cref: (cref[i] // t_, 0, (cref[i] % t_) // 8, 0)),
    ]
    out_specs = [pl.BlockSpec((1, np_, 8, d), lambda i, cref: (i, 0, 0, 0))]
    out_shape = [jax.ShapeDtypeStruct((c, np_, 8, d), store.dtype)]
    if has_scales:
        # f32 blocks need a full-width lane dim: gather the whole scales
        # tile (~32 KB) and select the lane outside the kernel
        in_specs.append(pl.BlockSpec((1, np_, t_), lambda i, cref: (cref[i] // t_, 0, 0)))
        out_specs.append(pl.BlockSpec((1, np_, t_), lambda i, cref: (i, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((c, np_, t_), jnp.float32))

    def kern(cref, *refs):
        n_in = 2 if has_scales else 1
        for in_ref, out_ref in zip(refs[:n_in], refs[n_in:]):
            out_ref[...] = in_ref[...]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    outs = pl.pallas_call(kern, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret)(
        cand, *((store, scales) if has_scales else (store,))
    )
    docs8 = outs[0]
    l8 = (cand % 8).astype(jnp.int32)
    docs = jnp.take_along_axis(docs8, l8[:, None, None, None], axis=2)[:, :, 0, :]
    if not has_scales:
        return docs, None
    lt = (cand % t_).astype(jnp.int32)
    scl = jnp.take_along_axis(outs[1], lt[:, None, None], axis=2)[:, :, 0]
    return docs, scl
