"""Dynamic w8a8 matmul path for serving forwards.

The v5e MXU runs int8 x int8 -> int32 at ~2x the bf16 FLOP rate (measured
2.08x raw / 1.67x with the dequant epilogue at the ColQwen2 vision-MLP
shape — ``perf/int8_matmul_probe.py``). For the compute-bound embed
forward (SURVEY §3.3: the ViT + LM matmuls dominate), quantizing the big
projections roughly halves their MXU time at a small, measured accuracy
cost. The reference has no quantized inference path (its corpus-side
compression is token pooling only, README.md:225); this is a TPU-native
capability on top of parity.

Scheme — standard dynamic symmetric w8a8:

- activations: one absmax scale per token row (computed on the fly, so no
  calibration set is needed),
- weights: one absmax scale per output channel (re-quantized from the bf16
  params at trace time inside the jit; XLA folds or fuses the per-column
  reduce + rescale, and its cost is two passes over W — noise next to the
  matmul at serving batch geometry),
- int8 x int8 -> int32 ``lax.dot_general`` (the native MXU path), then one
  fused rescale ``acc * s_act * s_w`` back to the compute dtype.

Reproducibility note: activation quantization is DISCONTINUOUS (round at
the int8 grid), so values that land on a rounding boundary can flip
between different XLA compilations of the same program (eager vs jit vs
GSPMD-partitioned) — measured ~2e-3 max output delta across compilations
at 2-layer/512-d scale, vs ~4e-7 for the exact path. Treat quantized
outputs as reproducible per compiled program, not across programs; the
variance is two orders of magnitude below the quantization error itself.

:func:`int8_dot_general` is shape-self-gating: contractions that are too
small to win on the MXU (either dim < :data:`MIN_QUANT_DIM`), non-2D
weights, or non-matmul dimension numbers fall through to the exact
``lax.dot_general`` — so callers can install it unconditionally via
``nn.Dense(dot_general=...)`` and only the FLOP-carrying projections
quantize. The 128-d ``custom_text_proj`` head and other small glue stay
exact by construction.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import lax

# Below this contraction/output width the int8 path can't win (the MXU tile
# is 128x128 and the rescale epilogue dominates); small projections also
# carry the most per-channel information (e.g. the 128-d retrieval head).
MIN_QUANT_DIM = 512


def _quantize_rows(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row (last-axis) symmetric int8: ``(..., K)`` -> int8 + fp32 scale."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _quantize_cols(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-column (output-channel) symmetric int8: ``(K, N)`` -> int8 + (1, N) fp32 scale."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_dot_general(
    lhs: jnp.ndarray,
    rhs: jnp.ndarray,
    dimension_numbers: Any,
    precision: Optional[Any] = None,
    preferred_element_type: Optional[Any] = None,
) -> jnp.ndarray:
    """``lax.dot_general`` drop-in that runs eligible matmuls as w8a8 int8.

    Eligible = the ``nn.Dense`` pattern (contract lhs last dim with rhs dim
    0, no batch dims, 2D rhs) with both the contraction dim K and output
    dim N >= :data:`MIN_QUANT_DIM`, and a float lhs. Anything else falls
    through to the exact dot so this function is safe as a blanket
    ``dot_general`` override.
    """
    (lc, rc), (lb, rb) = dimension_numbers
    eligible = (
        not tuple(lb)
        and not tuple(rb)
        and tuple(lc) == (lhs.ndim - 1,)
        and tuple(rc) == (0,)
        and rhs.ndim == 2
        and jnp.issubdtype(lhs.dtype, jnp.floating)
        and jnp.issubdtype(rhs.dtype, jnp.floating)
        and rhs.shape[0] >= MIN_QUANT_DIM
        and rhs.shape[1] >= MIN_QUANT_DIM
    )
    if not eligible:
        return lax.dot_general(
            lhs, rhs, dimension_numbers, precision=precision,
            preferred_element_type=preferred_element_type,
        )
    out_dtype = preferred_element_type or jnp.promote_types(lhs.dtype, rhs.dtype)
    ql, sl = _quantize_rows(lhs)
    qr, sr = _quantize_cols(rhs)
    acc = lax.dot_general(
        ql, qr, dimension_numbers, preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * sl * sr).astype(out_dtype)


def stored_int8_apply(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    scale: jnp.ndarray,
    out_dtype: Any,
) -> jnp.ndarray:
    """Matmul against a PRE-quantized int8 kernel (w8 static / a8 dynamic).

    ``kernel`` is 2D int8 ``(K, N)`` produced by :func:`quantize_params`
    with its per-output-channel fp32 ``scale`` ``(1, N)``. Activations are
    quantized per token row on the fly. Compared to the dynamic mode this
    removes the per-step weight absmax+requantize pass AND halves weight
    HBM traffic (int8 reads instead of bf16) — the win that matters in the
    weight-bound B=1 query-encode regime.
    """
    ql, sl = _quantize_rows(x)
    dn = (((x.ndim - 1,), (0,)), ((), ()))
    acc = lax.dot_general(ql, kernel, dn, preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * sl * scale).astype(out_dtype)


def quantize_params(params, min_dim: int = MIN_QUANT_DIM, path_filter=None):
    """Convert eligible Dense kernels in a param tree to stored int8.

    Walks ``params`` (the flax ``{"params": ...}`` inner tree) and replaces
    every float leaf named ``kernel`` whose last two dims are both
    >= ``min_dim`` with a symmetric per-output-channel int8 kernel; the
    fp32 scales go to a mirrored tree under the same module path as
    ``kernel_scale`` — the flax ``quant`` collection `QDense` reads.
    Handles both unrolled 2D ``(K, N)`` kernels and scan-stacked 3D
    ``(L, K, N)`` kernels (per-layer, per-channel scales ``(L, 1, N)``).

    ``path_filter``: optional ``fn("a/b/kernel") -> bool`` restricting which
    kernels quantize — e.g. only a FROZEN vision tower during LoRA training
    (the QLoRA-style quantized-base recipe), leaving the adapter-targeted
    text kernels float for the merge.

    Returns ``(quantized_params, quant_collection)``; apply as
    ``model.apply({"params": qp, "quant": qc}, ...)``. Embeddings, norms,
    biases, small kernels (the 128-d head) pass through untouched.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    new_flat, scale_flat = {}, {}
    for path, leaf in flat.items():
        eligible = (
            path[-1] == "kernel"
            and hasattr(leaf, "dtype")
            and jnp.issubdtype(leaf.dtype, jnp.floating)
            and leaf.ndim in (2, 3)
            and leaf.shape[-2] >= min_dim
            and leaf.shape[-1] >= min_dim
            and (path_filter is None or path_filter("/".join(map(str, path))))
        )
        if not eligible:
            new_flat[path] = leaf
            continue
        wf = jnp.asarray(leaf, jnp.float32)
        absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
        scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
        new_flat[path] = q
        scale_flat[path[:-1] + ("kernel_scale",)] = scale
    return (
        flax.traverse_util.unflatten_dict(new_flat),
        flax.traverse_util.unflatten_dict(scale_flat),
    )


def dequantize_params(params, quant, dtype=jnp.float32):
    """Inverse of :func:`quantize_params`: int8 kernels -> ``q * scale``
    floats (the values the quantized run actually computed with — exporting
    these, not the original floats, is the semantically faithful artifact
    of a quantized-base training run)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    scales = flax.traverse_util.flatten_dict(quant) if quant else {}
    out = {}
    for path, leaf in flat.items():
        if hasattr(leaf, "dtype") and leaf.dtype == jnp.int8:
            scale = scales[path[:-1] + ("kernel_scale",)]
            leaf = (leaf.astype(jnp.float32) * scale).astype(dtype)
        out[path] = leaf
    return flax.traverse_util.unflatten_dict(out)


def quantization_error(x: jnp.ndarray, w: jnp.ndarray) -> float:
    """Relative L2 error of the w8a8 dot vs the fp32 dot (diagnostics)."""
    dn = (((x.ndim - 1,), (0,)), ((), ()))
    exact = lax.dot_general(x.astype(jnp.float32), w.astype(jnp.float32), dn)
    quant = int8_dot_general(x, w, dn, preferred_element_type=jnp.float32)
    num = jnp.linalg.norm(quant - exact)
    den = jnp.maximum(jnp.linalg.norm(exact), 1e-20)
    return float(num / den)
