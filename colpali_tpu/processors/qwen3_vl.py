"""ColQwen3 processor: Qwen2-VL pipeline with Qwen3 geometry + pos-embed taps.

Behavioral spec: reference ColQwen3Processor
(/root/reference/colpali_engine/models/qwen3/colqwen3/processing_colqwen3.py):
near-identical to ColQwen2Processor, with the resize factor computed as
``patch_size * merge_size`` from the config (32 for Qwen3's 16px patches —
not the hardcoded 28; reference :59-66). Adds the host-computed bilinear
position-embedding taps the Qwen3 vision tower needs.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np

from colpali_tpu.models.qwen3_vl import pos_embed_interp_indices
from colpali_tpu.processors.base import Batch
from colpali_tpu.processors.qwen2_vl import ColQwen2Processor


class ColQwen3Processor(ColQwen2Processor):
    def __init__(
        self,
        tokenizer: Any,
        patch_size: int = 16,
        merge_size: int = 2,
        num_grid_per_side: int = 48,
        min_pixels: int = 65536,
        max_pixels: int = 16777216,
        **kwargs,
    ):
        super().__init__(
            tokenizer,
            patch_size=patch_size,
            merge_size=merge_size,
            min_pixels=min_pixels,
            max_pixels=max_pixels,
            **kwargs,
        )
        self.num_grid_per_side = num_grid_per_side

    @classmethod
    def from_pretrained(cls, path: str, **kwargs) -> "ColQwen3Processor":
        """Also read the learned-position grid side from config.json — the
        processor's bilinear pos-embed gather must index the same table the
        checkpoint ships (HF fast_pos_embed_interpolate reads it too)."""
        import json
        import os

        if "num_grid_per_side" not in kwargs:
            cfg_path = os.path.join(path, "config.json")
            if os.path.exists(cfg_path):
                with open(cfg_path) as f:
                    vision_cfg = json.load(f).get("vision_config", {})
                if "num_position_embeddings" in vision_cfg:
                    kwargs["num_grid_per_side"] = int(vision_cfg["num_position_embeddings"] ** 0.5)
        return super().from_pretrained(path, **kwargs)

    def process_images(self, images: Sequence[Any], context_prompts: Optional[Sequence[str]] = None) -> Batch:
        batch = super().process_images(images, context_prompts)
        b, p = batch["patch_mask"].shape
        pos_idx = np.zeros((b, p, 4), np.int32)
        pos_wgt = np.zeros((b, p, 4), np.float32)
        for i in range(b):
            n = int(batch["patch_mask"][i].sum())
            grid = tuple(int(x) for x in batch["image_grid_thw"][i])
            pi, pw = pos_embed_interp_indices(grid, self.num_grid_per_side, self.merge_size)
            pos_idx[i, :n] = pi
            pos_wgt[i, :n] = pw
        batch["pos_idx"] = pos_idx
        batch["pos_weight"] = pos_wgt
        return batch


class ColQwen3_5Processor(ColQwen3Processor):  # noqa: N801 — reference naming
    """Qwen3.5 retriever processor (reference processing_colqwen3_5.py:12-121):
    identical pipeline to ColQwen3 — same visual prompt (:24-26), raw query
    tokenization (:106-120), ``<|endoftext|>`` augmentation (:27) — the
    Qwen3.5 backbone reuses the Qwen3-VL vision tower and geometry."""


class BiQwen3_5Processor(ColQwen3_5Processor):  # noqa: N801 — reference naming
    """Dense variant (reference processing_biqwen3_5.py:9-37)."""

    def score(self, qs, ps, **kwargs) -> np.ndarray:
        return self.score_single_vector(qs, ps)
