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


def _host_resize_pil(image: ImageLike, size: Tuple[int, int], reducing_gap=None):
    """Shared PIL resize: returns a PIL image at ``size`` (mode preserved
    where possible; palette modes converted to RGB pre-resize).

    ``reducing_gap``: PIL's box-reduce-then-resample optimization. ``1.0``
    halves the bicubic cost on ~3-4x downscales (measured 19.2 -> 9.1
    ms/page on the 1-core ingestion host) at a small smoothing cost;
    ``None`` (default) is the exact single-pass bicubic."""
    from PIL import Image

    if not hasattr(image, "convert"):
        image = Image.fromarray(to_rgb_array(image))
    if image.mode not in ("RGB", "L", "RGBA"):
        image = image.convert("RGB")  # palette modes: convert pre-resize
    if image.size != (size[1], size[0]):
        image = image.resize((size[1], size[0]), Image.Resampling.BICUBIC,
                             reducing_gap=reducing_gap)
    return image


def host_resize_rgb(image: ImageLike, size: Tuple[int, int],
                    reducing_gap=None) -> np.ndarray:
    """PIL bicubic resize to ``size`` -> (h, w, 3) uint8, minimizing host
    work on a 1-core ingestion host: resize runs FIRST on the native PIL
    image (PIL's C resize needs no numpy copy and handles RGB/L/RGBA
    directly), and the RGB convert + numpy copy happen at TARGET size —
    ~13x fewer pixels than converting the full page first (the order the
    round-3 pipeline used; perf/embed_decompose.py showed the full-page
    convert alone cost ~19 ms/batch)."""
    image = _host_resize_pil(image, size, reducing_gap)
    if image.mode != "RGB":
        image = image.convert("RGB")
    return np.asarray(image)


def stage_yuv420(image: ImageLike, size: Tuple[int, int],
                 reducing_gap=None) -> Tuple[np.ndarray, np.ndarray]:
    """Host staging for the YUV420 wire format, all-PIL-C-speed: resize ->
    ``convert("YCbCr")`` (PIL's fixed-point BT.601, the same matrix as
    :data:`_YUV_FWD`) -> plane split -> 2x BOX downscale of the chroma
    planes (PIL's exact-2x BOX average is bit-identical to the u8 integer
    2x2 box filter it replaced, and skips the numpy uint16 round-trip:
    11.1 -> 10.3 ms/page measured on the 1-core host). Replaces
    ``rgb_to_yuv420(host_resize_rgb(...))``, whose fp32 numpy matmul cost
    ~12 ms/page; plane values stay within +-1 of the fp32 reference
    (tests/processors/test_pixel_transport.py)."""
    from PIL import Image

    image = _host_resize_pil(image, size, reducing_gap)
    y, cb, cr = image.convert("YCbCr").split()
    half = (size[1] // 2, size[0] // 2)  # PIL size = (w, h)
    cb = cb.resize(half, Image.Resampling.BOX)
    cr = cr.resize(half, Image.Resampling.BOX)
    uv = np.stack([np.asarray(cb), np.asarray(cr)], axis=-1)
    return np.asarray(y), uv


def stage_gray(image: ImageLike, size: Tuple[int, int],
               reducing_gap=None) -> np.ndarray:
    """Host staging for the luma-only wire format: resize ->
    ``convert("L")`` (PIL's ITU-R 601-2 luma — the BT.601 Y of
    :data:`_YUV_FWD` row 0). 3x fewer wire bytes than RGB u8.

    QUALITY CAVEAT (measured, scripts/transport_gate.py): gray collapses
    retrieval to chance when a colored figure is the discriminating signal
    (nDCG@5 0.50 vs 1.00 on iso-luminant color-critical pages) and loses
    rank-1s even on typical mixed pages. Use only for corpora verified
    achromatic; :func:`stage_yuv420` preserves ranking everywhere measured
    at 2/3 of these savings."""
    return np.asarray(_host_resize_pil(image, size, reducing_gap).convert("L"))


def pack_yuv420_group(planes, out: np.ndarray, size: int) -> np.ndarray:
    """Pack per-page ``(y, uv)`` u8 plane pairs into one contiguous u8 wire
    buffer ``out`` of shape ``(..., size*size*3//2)`` (flattened leading
    dims indexed in page order). ONE host->device transfer per group
    instead of two — each transfer costs a serialization pass plus an RPC
    on remote-attached chips, and transfers serialize with compute on a
    shared tunnel."""
    n = size * size
    flat = out.reshape(-1, out.shape[-1])
    for j, (y, uv) in enumerate(planes):
        flat[j, :n] = y.ravel()
        flat[j, n:] = uv.ravel()
    return out


def unpack_yuv420(buf, size: int):
    """Inverse of :func:`pack_yuv420_group` for on-device decode: slice the
    packed wire buffer back into ``y (..., H, W)`` and ``uv (..., H/2,
    W/2, 2)``. Pure reshape/slice — fuses into the consumer for free."""
    n = size * size
    lead = buf.shape[:-1]
    y = buf[..., :n].reshape(*lead, size, size)
    uv = buf[..., n:].reshape(*lead, size // 2, size // 2, 2)
    return y, uv


# BT.601 full-range (JFIF) RGB<->YUV — the document-ingestion wire format.
# Chroma is 2x2-subsampled (YUV420): half the host->device bytes of RGB u8,
# which is the scarce resource when pages stream to a remote-attached chip.
_YUV_FWD = np.array(
    [[0.299, 0.587, 0.114],
     [-0.168736, -0.331264, 0.5],
     [0.5, -0.418688, -0.081312]], np.float32
)


def rgb_to_yuv420(arr: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(H, W, 3) uint8 RGB -> ``(y (H, W), uv (H/2, W/2, 2))`` uint8.

    H and W must be even (true for every fixed-res vision input here).
    Host cost is one 3x3 matmul over the TARGET-size pixels plus a 2x2 box
    average — a few ms per 448x448 page."""
    h, w, _ = arr.shape
    if h % 2 or w % 2:
        raise ValueError(f"YUV420 needs even dims, got {(h, w)}")
    x = arr.astype(np.float32)
    y = x @ _YUV_FWD[0]
    u = x @ _YUV_FWD[1] + 128.0
    v = x @ _YUV_FWD[2] + 128.0
    uv = np.stack([u, v], axis=-1).reshape(h // 2, 2, w // 2, 2, 2).mean(axis=(1, 3))
    return (
        np.clip(np.rint(y), 0, 255).astype(np.uint8),
        np.clip(np.rint(uv), 0, 255).astype(np.uint8),
    )


def yuv420_to_rgb(y: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Device-side inverse: ``(B, H, W) + (B, H/2, W/2, 2)`` uint8 ->
    ``(B, H, W, 3)`` float32 in 0..255 (nearest chroma upsample). Cheap
    elementwise math — jit-compose it with normalize + the model forward so
    the whole decode fuses into the embedding dispatch."""
    yf = y.astype(jnp.float32)
    uvf = uv.astype(jnp.float32) - 128.0
    uvf = jnp.repeat(jnp.repeat(uvf, 2, axis=1), 2, axis=2)  # (B, H, W, 2)
    u, v = uvf[..., 0], uvf[..., 1]
    r = yf + 1.402 * v
    g = yf - 0.344136 * u - 0.714136 * v
    b = yf + 1.772 * u
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


def normalize_pixels(
    x: jnp.ndarray, mean: Sequence[float], std: Sequence[float]
) -> jnp.ndarray:
    """0..255 floats -> HF normalize pipeline tail: rescale 1/255 then
    (x - mean) / std. Elementwise; fuses into whatever jit wraps it."""
    m = jnp.asarray(mean, jnp.float32)[None, None, None, :]
    s = jnp.asarray(std, jnp.float32)[None, None, None, :]
    return (x / 255.0 - m) / s


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
        arrays = [host_resize_rgb(im, size) for im in images]
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
