"""Split-image (Idefics3/ModernVBERT) interpretability: sub-patch -> spatial
reordering for similarity maps.

Behavioral spec: Idefics3SplitImageInterpretabilityMixin
(/root/reference/colpali_engine/utils/processing_utils.py:385-502) — tokens
arrive tile-by-tile (each tile a k x k token grid); rearrange into the
full-image spatial grid before the similarity einsum.
"""

from __future__ import annotations

import math
from typing import List, Tuple, Union

import numpy as np


def rearrange_image_embeddings(
    image_embeddings: np.ndarray,
    image_mask: np.ndarray,
    n_patches: Tuple[int, int],
    image_seq_len: int,
) -> np.ndarray:
    """(S, dim) sequence + mask -> (n_patches_x, n_patches_y, dim) spatial grid.

    Tokens are ordered tile-by-tile, each tile a (k, k) grid with
    k = sqrt(image_seq_len); tiles tile the image row-major.
    """
    masked = np.asarray(image_embeddings)[np.asarray(image_mask)]
    npx, npy = n_patches
    dim = masked.shape[-1]
    k = int(math.sqrt(image_seq_len))
    n_tiles_x = npx // k
    n_tiles_y = npy // k
    grid = masked.reshape(n_tiles_y, n_tiles_x, k, k, dim)
    grid = grid.transpose(0, 2, 1, 3, 4)  # interleave tile rows with token rows
    grid = grid.reshape(npy, npx, dim)
    return grid.transpose(1, 0, 2)  # (x, y, dim) to match the map convention


def get_split_image_similarity_maps(
    image_embeddings: np.ndarray,
    query_embeddings: np.ndarray,
    n_patches: Union[Tuple[int, int], List[Tuple[int, int]]],
    image_mask: np.ndarray,
    image_seq_len: int,
) -> List[np.ndarray]:
    """Similarity maps with tile-aware spatial ordering (reference mixin
    get_similarity_maps_from_embeddings, processing_utils.py:447-502).

    ``image_mask`` should exclude the global tile (use the processor's
    ``get_local_image_mask``).
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
                f"The number of patches ({npx} x {npy} = {npx * npy}) does not match the number of "
                f"non-padded image tokens ({n_img}). "
                "Hint: Use get_local_image_mask() instead of get_image_mask() to exclude the global patch."
            )
        grid = rearrange_image_embeddings(
            image_embeddings[idx], image_mask[idx], (npx, npy), image_seq_len
        )
        maps.append(np.einsum("nk,ijk->nij", query_embeddings[idx], grid))
    return maps
