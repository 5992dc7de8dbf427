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


@jax.jit
def binarize(embeddings: jnp.ndarray) -> jnp.ndarray:
    """Sign-binarize embeddings into packed uint8 bitplanes.

    ``(..., D)`` float -> ``(..., D//8)`` uint8, bit j of byte k = sign of
    component ``8k+j``. Used by the binary MaxSim pre-filter (32x smaller
    corpus; rescore survivors with int8/bf16).
    """
    bits = (embeddings > 0).astype(jnp.uint8)
    *lead, d = bits.shape
    if d % 8 != 0:
        raise ValueError("dim must be a multiple of 8 to pack bits")
    bits = bits.reshape(*lead, d // 8, 8)
    weights = (1 << jnp.arange(8, dtype=jnp.uint8))[None, :]
    return jnp.sum(bits * weights, axis=-1).astype(jnp.uint8)
