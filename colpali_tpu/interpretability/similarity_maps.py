"""Similarity-map interpretability: per-query-token x image-patch heatmaps.

Behavioral spec: /root/reference/colpali_engine/interpretability/
- ``get_similarity_maps_from_embeddings``: select image-token embeddings via
  mask, rearrange "(h w) c -> w h c", einsum("nk,ijk->nij")
  (similarity_map_utils.py:9-56).
- ``normalize_similarity_map``: min-max to [0, 1] with epsilon
  (similarity_map_utils.py:59-103).
- ``plot_similarity_map`` / ``plot_all_similarity_maps``: bilinear/bicubic
  upsampled heatmap overlay (similarity_maps.py:13-162). Plotting needs
  matplotlib (optional dependency — gated import).
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import numpy as np

EPSILON = 1e-10


def get_similarity_maps_from_embeddings(
    image_embeddings: np.ndarray,
    query_embeddings: np.ndarray,
    n_patches: Union[Tuple[int, int], List[Tuple[int, int]]],
    image_mask: np.ndarray,
) -> List[np.ndarray]:
    """Batched similarity maps.

    Args:
        image_embeddings: ``(B, S, dim)`` document embeddings.
        query_embeddings: ``(B, Nq, dim)`` query embeddings.
        n_patches: (n_patches_x, n_patches_y) per image (or one tuple,
            broadcast).
        image_mask: ``(B, S)`` bool mask of image-token positions.

    Returns:
        list of ``(Nq, n_patches_x, n_patches_y)`` arrays.
    """
    image_embeddings = np.asarray(image_embeddings)
    query_embeddings = np.asarray(query_embeddings)
    image_mask = np.asarray(image_mask)
    if isinstance(n_patches, tuple):
        n_patches = [n_patches] * image_embeddings.shape[0]

    maps: List[np.ndarray] = []
    for idx in range(image_embeddings.shape[0]):
        npx, npy = n_patches[idx]
        n_img = int(image_mask[idx].sum())
        if n_img != npx * npy:
            raise ValueError(
                f"The number of patches ({npx} x {npy} = {npx * npy}) does not match "
                f"the number of non-padded image tokens ({n_img})."
            )
        # (h*w, dim) image tokens in row-major (h, w) order -> grid (w, h, dim)
        tokens = image_embeddings[idx][image_mask[idx]]
        grid = tokens.reshape(npy, npx, -1).transpose(1, 0, 2)  # "(h w) c -> w h c"
        maps.append(np.einsum("nk,ijk->nij", query_embeddings[idx], grid))
    return maps


def normalize_similarity_map(
    similarity_map: np.ndarray,
    value_range: Optional[Tuple[float, float]] = None,
) -> np.ndarray:
    """Min-max normalize to [0, 1] over the last two dims."""
    similarity_map = np.asarray(similarity_map)
    if similarity_map.ndim not in (2, 3):
        raise ValueError(
            "The input tensor must have 2 dimensions (n_patch_x, n_patch_y) or "
            "3 dimensions (batch_size, n_patch_x, n_patch_y)."
        )
    if value_range is None:
        mins = similarity_map.min(axis=(-2, -1), keepdims=True)
        maxs = similarity_map.max(axis=(-2, -1), keepdims=True)
    else:
        mins = np.asarray(value_range[0], similarity_map.dtype)
        maxs = np.asarray(value_range[1], similarity_map.dtype)
    return (similarity_map - mins) / (maxs - mins + EPSILON)


def plot_similarity_map(
    image,
    similarity_map: np.ndarray,
    figsize: Tuple[int, int] = (8, 8),
    show_colorbar: bool = False,
):
    """Overlay one token's similarity map on the page image.

    Returns (fig, ax). Requires matplotlib.
    """
    import matplotlib.pyplot as plt

    img = np.asarray(image.convert("RGB") if hasattr(image, "convert") else image)
    h, w = img.shape[:2]
    sim = normalize_similarity_map(np.asarray(similarity_map, np.float32))

    # upsample (n_patches_x, n_patches_y) -> (h, w); map is (x, y) so
    # transpose to (y, x) for display
    import jax
    import jax.numpy as jnp

    heat = np.asarray(
        jax.image.resize(jnp.asarray(sim.T), (h, w), method="bicubic", antialias=False)
    )
    heat = np.clip(heat, 0.0, 1.0)

    fig, ax = plt.subplots(figsize=figsize)
    ax.imshow(img)
    im = ax.imshow(heat, alpha=0.5, cmap="viridis", vmin=0.0, vmax=1.0)
    if show_colorbar:
        fig.colorbar(im, ax=ax)
    ax.axis("off")
    return fig, ax


def plot_all_similarity_maps(
    image,
    query_tokens: List[str],
    similarity_maps: np.ndarray,
    figsize: Tuple[int, int] = (8, 8),
    show_colorbar: bool = False,
    add_title: bool = True,
):
    """One figure per query token (reference plot_all_similarity_maps
    :75-162). Returns a list of (fig, ax)."""
    plots = []
    for idx, token in enumerate(query_tokens):
        fig, ax = plot_similarity_map(image, similarity_maps[idx], figsize, show_colorbar)
        if add_title:
            score = float(np.asarray(similarity_maps[idx]).max())
            ax.set_title(f"Token #{idx}: `{token}`. MaxSim score: {score:.2f}", fontsize=12)
        plots.append((fig, ax))
    return plots
