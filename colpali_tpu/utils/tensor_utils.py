"""Array utilities for variable-length multi-vector embeddings.

TPU-first counterpart of the reference torch utilities
(/root/reference/colpali_engine/utils/torch_utils.py:57-140): variable-length
embedding lists are padded into static-shape arrays (optionally bucketed so
XLA sees few distinct shapes), and padded batches can be unbound back into
ragged lists. Padding rows are all-zero vectors, which is score-neutral for
MaxSim (a zero vector dots to 0 everywhere).
"""

from __future__ import annotations

from typing import List, Sequence, Union

import jax.numpy as jnp
import numpy as np

Array = Union[np.ndarray, jnp.ndarray]


def round_up(x: int, multiple: int) -> int:
    """Round ``x`` up to the nearest multiple of ``multiple``."""
    if multiple <= 0:
        raise ValueError(f"multiple must be positive, got {multiple}")
    return ((x + multiple - 1) // multiple) * multiple


def pad_sequences(
    sequences: Sequence[Array],
    pad_value: float = 0.0,
    pad_to: int | None = None,
    pad_multiple: int = 1,
    padding_side: str = "right",
) -> np.ndarray:
    """Stack variable-length ``(len_i, dim)`` arrays into ``(batch, max_len, dim)``.

    Equivalent of ``torch.nn.utils.rnn.pad_sequence(batch_first=True)`` with
    two TPU-oriented extras:

    - ``pad_multiple``: round the padded length up to a multiple (e.g. 16 for
      bf16 sublane tiling) so XLA/Pallas see aligned shapes.
    - ``pad_to``: explicit target length (must be >= the longest sequence);
      used for shape bucketing so jit caches stay small.
    """
    if len(sequences) == 0:
        raise ValueError("No sequences provided")
    if padding_side not in ("left", "right"):
        raise ValueError("padding_side must be either 'left' or 'right'.")

    seqs = [np.asarray(s) for s in sequences]
    max_len = max(s.shape[0] for s in seqs)
    target = pad_to if pad_to is not None else max_len
    if target < max_len:
        raise ValueError(f"pad_to={target} is smaller than longest sequence ({max_len})")
    target = round_up(target, pad_multiple)

    trailing = seqs[0].shape[1:]
    out = np.full((len(seqs), target, *trailing), pad_value, dtype=seqs[0].dtype)
    for i, s in enumerate(seqs):
        if padding_side == "right":
            out[i, : s.shape[0]] = s
        else:
            out[i, target - s.shape[0] :] = s
    return out


def unbind_padded_multivector_embeddings(
    embeddings: Array,
    padding_value: float = 0.0,
    padding_side: str = "left",
) -> List[np.ndarray]:
    """Split a padded ``(batch, seq, dim)`` batch back into ragged 2D arrays.

    A position is padding iff every component of its vector equals
    ``padding_value``. Matches the reference semantics
    (torch_utils.py:57-140): for left padding, drop everything before the
    first non-padding row; for right padding, drop everything after the last
    non-padding row (interior all-zero rows are preserved).
    """
    embeddings = np.asarray(embeddings)
    if embeddings.ndim != 3:
        raise ValueError("The input must be a 3D array (batch, seq, dim).")
    if padding_side not in ("left", "right"):
        raise ValueError("padding_side must be either 'left' or 'right'.")

    results: List[np.ndarray] = []
    for seq in embeddings:
        non_pad = ~np.all(seq == padding_value, axis=-1)
        idx = np.nonzero(non_pad)[0]
        if idx.size == 0:
            results.append(seq[:0])
        elif padding_side == "left":
            results.append(seq[idx[0] :])
        else:
            results.append(seq[: idx[-1] + 1])
    return results
