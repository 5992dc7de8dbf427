"""ColQwen2_5 processor: Qwen2.5-VL = Qwen2-VL pipeline + window ids.

Behavioral spec: reference ColQwen2_5Processor is near-identical to
ColQwen2Processor (SURVEY.md §2.2: "verified by diff"); the only model-side
addition is window attention, whose per-patch window assignment
(HF get_window_index, modeling_qwen2_5_vl.py:365-400) we compute host-side
directly from the merge-ordered patch grid positions.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

from colpali_tpu.processors.base import Batch
from colpali_tpu.processors.qwen2_vl import ColQwen2Processor


def window_ids_from_positions(
    hpos: np.ndarray,
    wpos: np.ndarray,
    grid_thw: tuple,
    merge_size: int,
    window_patches: int,
) -> np.ndarray:
    """Per-patch window id (merge-ordered), equivalent to HF's window
    partition: merged units are grouped into ``window_patches`` x
    ``window_patches`` tiles (edge tiles truncated), per temporal frame."""
    t, h, w = grid_thw
    mh = hpos // merge_size
    mw = wpos // merge_size
    num_w = -(-(w // merge_size) // window_patches)  # ceil
    num_h = -(-(h // merge_size) // window_patches)
    win = (mh // window_patches) * num_w + (mw // window_patches)
    # windows never span temporal frames; h*w patches per frame
    frame = np.arange(hpos.shape[0]) // (h * w)
    return (win + frame * num_h * num_w).astype(np.int32)


class ColQwen2_5Processor(ColQwen2Processor):  # noqa: N801 — reference naming
    """Same prompting/preprocessing as ColQwen2; adds window ids."""

    def __init__(self, *args, window_size: int = 112, **kwargs):
        super().__init__(*args, **kwargs)
        self.window_size = window_size

    @property
    def _window_patches(self) -> int:
        return self.window_size // self.merge_size // self.patch_size

    def process_images(self, images: Sequence[Any], context_prompts=None, device_pixels: bool = False, host_resize: bool = False) -> Batch:
        batch = super().process_images(images, context_prompts, device_pixels=device_pixels, host_resize=host_resize)
        b, p = batch["patch_mask"].shape
        window_id = np.full((b, p), -1, np.int32)
        for i in range(b):
            n = int(batch["patch_mask"][i].sum())
            grid = tuple(int(x) for x in batch["image_grid_thw"][i])
            window_id[i, :n] = window_ids_from_positions(
                batch["vision_hpos"][i, :n],
                batch["vision_wpos"][i, :n],
                grid,
                self.merge_size,
                self._window_patches,
            )
        batch["window_id"] = window_id
        return batch


    @classmethod
    def from_pretrained(cls, path: str, **kwargs) -> "ColQwen2_5Processor":
        """Also pick up the model's vision window size from config.json —
        the processor's window ids must partition patches exactly as the
        checkpoint's tower does (HF get_window_index reads the same field)."""
        import json
        import os

        if "window_size" not in kwargs:
            cfg_path = os.path.join(path, "config.json")
            if os.path.exists(cfg_path):
                with open(cfg_path) as f:
                    vision_cfg = json.load(f).get("vision_config", {})
                if "window_size" in vision_cfg:
                    kwargs["window_size"] = vision_cfg["window_size"]
        return super().from_pretrained(path, **kwargs)


# The reference exports the underscore spelling (models/__init__.py:
# ``ColQwen2_5_Processor``, processing_colqwen2_5.py) — keep both names
# importable so MIGRATION.md's table works verbatim.
ColQwen2_5_Processor = ColQwen2_5Processor
