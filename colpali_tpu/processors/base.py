"""Base processor: the public API surface users of the reference know.

Mirror of ``BaseVisualRetrieverProcessor``
(/root/reference/colpali_engine/utils/processing_utils.py:21-257):
``process_images`` / ``process_texts`` / ``process_queries`` (prefix + 10x
query-augmentation suffix) / ``score`` / ``score_single_vector`` /
``score_multi_vector`` / ``get_n_patches``. Outputs are plain dicts of numpy
arrays (feed directly into the flax models).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

from colpali_tpu.ops.maxsim import score_multi_vector as _score_multi_vector
from colpali_tpu.ops.maxsim import score_single_vector as _score_single_vector

Batch = Dict[str, np.ndarray]


class BaseVisualRetrieverProcessor(ABC):
    """Abstract processor API for visual retrievers."""

    query_prefix: str = ""
    query_augmentation_token: str = ""

    def save_pretrained(self, output_dir: str) -> None:
        """Persist the tokenizer + image-pipeline configs so
        ``from_pretrained(output_dir)`` reconstructs this processor — the
        reference's final save writes the processor next to the weights so
        the output dir is a self-contained checkpoint
        (colmodel_training.py:109-118)."""
        import json
        import os

        os.makedirs(output_dir, exist_ok=True)
        tok = getattr(self, "tokenizer", None)
        if tok is not None and hasattr(tok, "save_pretrained"):
            tok.save_pretrained(output_dir)
        preprocessor_cfg, processor_cfg = self._export_configs()
        if preprocessor_cfg:
            with open(os.path.join(output_dir, "preprocessor_config.json"), "w") as f:
                json.dump(preprocessor_cfg, f, indent=2)
        if processor_cfg:
            with open(os.path.join(output_dir, "processor_config.json"), "w") as f:
                json.dump(processor_cfg, f, indent=2)

    def _export_configs(self) -> tuple:
        """-> (preprocessor_config.json dict, processor_config.json dict);
        per-family override matching what its ``from_pretrained`` reads."""
        return {}, {}

    @abstractmethod
    def process_images(self, images: Sequence[Any]) -> Batch:
        """Process a list of images into model inputs."""

    @abstractmethod
    def process_texts(self, texts: Sequence[str]) -> Batch:
        """Process a list of texts into model inputs."""

    def process_queries(
        self,
        texts: Optional[Sequence[str]] = None,
        queries: Optional[Sequence[str]] = None,
        max_length: int = 50,  # noqa: ARG002 — kept for API parity (deprecated upstream)
        contexts: Optional[Sequence[str]] = None,  # noqa: ARG002 — parity
        suffix: Optional[str] = None,
    ) -> Batch:
        """Queries = prefix + text + augmentation suffix (reference :55-91).

        The default suffix is 10 repetitions of the query-augmentation token
        ("reasoning buffers" at inference).
        """
        if texts and queries:
            raise ValueError("Only one of 'texts' or 'queries' should be provided.")
        if queries is not None:
            texts = queries
        elif texts is None:
            raise ValueError("No texts or queries provided.")
        if suffix is None:
            suffix = self.query_augmentation_token * 10
        return self.process_texts([self.query_prefix + t + suffix for t in texts])

    def score(self, qs, ps, **kwargs) -> np.ndarray:
        """Default scoring = late-interaction MaxSim."""
        return self.score_multi_vector(qs, ps, **kwargs)

    @staticmethod
    def score_single_vector(qs, ps) -> np.ndarray:
        return _score_single_vector(qs, ps)

    @staticmethod
    def score_multi_vector(qs, ps, batch_size: int = 128, **kwargs) -> np.ndarray:
        return _score_multi_vector(qs, ps, batch_size=batch_size, **kwargs)

    @abstractmethod
    def get_n_patches(self, image_size: Tuple[int, int], *args, **kwargs) -> Tuple[int, int]:
        """(n_patches_x, n_patches_y) used for an image of (height, width)."""


def load_tokenizer(path: str):
    """AutoTokenizer with a fallback for checkpoints whose config.json
    model_type the installed transformers does not recognize (e.g.
    ``modernvbert`` under transformers 4.57): AutoTokenizer consults
    AutoConfig to pick a tokenizer class and raises on unknown types even
    when the tokenizer files themselves are perfectly loadable."""
    from transformers import AutoTokenizer

    try:
        return AutoTokenizer.from_pretrained(path)
    except (ValueError, KeyError):
        from transformers import PreTrainedTokenizerFast

        return PreTrainedTokenizerFast.from_pretrained(path)
