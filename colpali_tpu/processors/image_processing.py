"""Batched, on-device image preprocessing.

The reference preprocesses images one-by-one with PIL inside dataloader
workers (SURVEY.md §3.1 marks this as the embed-pipeline hot spot). Here the
resize + rescale + normalize pipeline is jitted JAX running on the
accelerator: images are uploaded as raw uint8 and all float math happens
on-device. One compiled program per distinct source shape (pages from one
corpus typically share a handful of shapes, so the jit cache stays small).

Fixed-resolution path (PaliGemma 448x448, SigLIP normalization) lives here;
the Qwen2-VL dynamic-resolution smart-resize path builds on the same
primitives in the qwen processor module.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

ImageLike = Union[np.ndarray, "PIL.Image.Image"]  # noqa: F821


def restore_group_order(parts: List[jnp.ndarray], idx_groups: List[List[int]]) -> jnp.ndarray:
    """Concatenate per-group device results and restore the original item
    order (grouped-by-shape processing scrambles it). Skips the permutation
    gather when the groups already cover indices in order."""
    stacked = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    order = np.argsort(np.concatenate([np.asarray(g) for g in idx_groups]))
    if not np.array_equal(order, np.arange(order.size)):
        stacked = jnp.take(stacked, jnp.asarray(order), axis=0)
    return stacked


def to_rgb_array(image: ImageLike) -> np.ndarray:
    """PIL image or array -> (H, W, 3) uint8 numpy array."""
    if hasattr(image, "convert"):  # PIL
        image = np.asarray(image.convert("RGB"))
    image = np.asarray(image)
    if image.ndim == 2:
        image = np.stack([image] * 3, axis=-1)
    if image.shape[-1] == 4:
        image = image[..., :3]
    return image.astype(np.uint8)


@functools.partial(jax.jit, static_argnames=("height", "width", "method", "antialias"))
def _resize_normalize(
    images_u8: jnp.ndarray,
    mean: jnp.ndarray,
    std: jnp.ndarray,
    height: int,
    width: int,
    method: str = "bicubic",
    antialias: bool = True,
) -> jnp.ndarray:
    """(B, H0, W0, 3) uint8 -> (B, height, width, 3) float32, normalized.

    Matches HF image processors' pipeline order: resize (on 0-255 floats) ->
    rescale 1/255 -> normalize (x - mean) / std.
    """
    b = images_u8.shape[0]
    x = images_u8.astype(jnp.float32)
    if images_u8.shape[1:3] != (height, width):  # static under jit
        x = jax.image.resize(x, (b, height, width, 3), method=method, antialias=antialias)
    x = x / 255.0
    return (x - mean[None, None, None, :]) / std[None, None, None, :]


def preprocess_images_fixed(
    images: Sequence[ImageLike],
    size: Tuple[int, int] = (448, 448),
    mean: Sequence[float] = (0.5, 0.5, 0.5),
    std: Sequence[float] = (0.5, 0.5, 0.5),
    method: str = "bicubic",
    device: bool = False,
    host_resize: bool = False,
) -> Union[np.ndarray, jnp.ndarray]:
    """Preprocess a batch of images to a fixed resolution (SigLIP/PaliGemma).

    Images are grouped by source shape so each distinct shape compiles once
    and same-shape images are resized as one batched device op.

    Returns ``(B, height, width, 3)`` float32 (NHWC) — a DEVICE array with
    ``device=True`` (the serving path: normalized-image downloads run at
    MB/s on remote-attached accelerators), host numpy otherwise.
    ``host_resize=True`` resizes on host (PIL bicubic) BEFORE upload so only
    target-size pixels cross a bandwidth-limited host->device link (a 150 dpi
    page is ~6.3 MB raw but 0.6 MB at 448x448 — perf/embed_decompose.py).
    """
    if host_resize:
        from PIL import Image

        arrays = []
        for im in images:
            arr = to_rgb_array(im)
            if arr.shape[:2] != size:
                arr = np.asarray(
                    Image.fromarray(arr).resize((size[1], size[0]), Image.Resampling.BICUBIC)
                )
            arrays.append(arr)
    else:
        arrays = [to_rgb_array(im) for im in images]
    mean_j = jnp.asarray(mean, dtype=jnp.float32)
    std_j = jnp.asarray(std, dtype=jnp.float32)
    h, w = size

    by_shape: dict[Tuple[int, int], List[int]] = {}
    for i, a in enumerate(arrays):
        by_shape.setdefault(a.shape[:2], []).append(i)

    if device:
        parts, idx_groups = [], []
        for _, indices in by_shape.items():
            batch = jnp.asarray(np.stack([arrays[i] for i in indices]))
            parts.append(_resize_normalize(batch, mean_j, std_j, h, w, method=method))
            idx_groups.append(indices)
        return restore_group_order(parts, idx_groups)

    out = np.empty((len(arrays), h, w, 3), dtype=np.float32)
    for _, indices in by_shape.items():
        batch = jnp.asarray(np.stack([arrays[i] for i in indices]))
        resized = _resize_normalize(batch, mean_j, std_j, h, w, method=method)
        out[np.asarray(indices)] = np.asarray(resized)
    return out
