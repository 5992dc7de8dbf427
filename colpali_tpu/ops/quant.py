"""Embedding quantization for compressed corpus storage.

The reference has no quantization (PLAID via the external fast-plaid crate is
its only compression besides token pooling). TPU-native rationale: a 1M-page
corpus at 64 pooled tokens x 128 dim is 16.4 GB in bf16 — over a v5e chip's
HBM — but 8.2 GB in int8 (+0.26 GB scales), which fits and also halves the
HBM traffic of the scoring kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def quantize_per_token(embeddings: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization with one scale per token vector.

    Args:
        embeddings: ``(..., D)`` float embeddings.

    Returns:
        (values int8 ``(..., D)``, scales fp32 ``(...)``) with
        ``values * scales[..., None] ~= embeddings``.
    """
    absmax = jnp.max(jnp.abs(embeddings), axis=-1)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.round(embeddings / scale[..., None]).astype(jnp.int8)
    return q, scale


@jax.jit
def dequantize_per_token(values: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`quantize_per_token` (fp32 output)."""
    return values.astype(jnp.float32) * scales[..., None]


def binarize_words(embeddings: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sign-binarize embeddings into packed int32 words + a validity mask.

    ``(..., D)`` float -> (``(..., D//32)`` int32 words, ``(...)`` fp32 valid).
    Bit ``j`` of word ``w`` is the sign (``> 0``) of component ``32w + j``;
    ``valid`` is 1.0 where the token has any nonzero component (zero-padded
    tokens binarize ambiguously, so the mask restores the reference's
    "padding contributes zero" scoring semantics). This is the storage format
    of the binary MaxSim pre-filter (:mod:`colpali_tpu.ops.maxsim_binary`):
    16x smaller than bf16, scored with XOR+popcount, survivors rescored with
    the exact int8/bf16 kernels.
    """
    *lead, d = embeddings.shape
    if d % 32 != 0:
        raise ValueError("dim must be a multiple of 32 to pack sign bits")
    bits = (embeddings > 0).astype(jnp.uint32).reshape(*lead, d // 32, 32)
    weights = jnp.left_shift(jnp.uint32(1), jnp.arange(32, dtype=jnp.uint32))
    # sum == bitwise-or here: each weighted bit occupies a disjoint position
    words = jnp.sum(bits * weights, axis=-1, dtype=jnp.uint32).astype(jnp.int32)
    valid = jnp.any(embeddings != 0, axis=-1).astype(jnp.float32)
    return words, valid


def unpack_words(words: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Inverse-ish of :func:`binarize_words`: packed int32 words ->
    ``(..., dim)`` fp32 in {-1, +1} (the sign sketch the pre-filter scores)."""
    *lead, w = words.shape
    if w * 32 != dim:
        raise ValueError(f"{w} words hold {w*32} bits, expected dim={dim}")
    shifts = jnp.arange(32, dtype=jnp.int32)
    # arithmetic shift is fine: only bit 0 survives the & 1
    bits = jnp.right_shift(words[..., None], shifts) & 1
    return (bits.reshape(*lead, dim).astype(jnp.float32) * 2.0) - 1.0
