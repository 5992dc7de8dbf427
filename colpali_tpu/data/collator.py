"""Training collator: example dicts -> prefixed model input batches.

Behavioral spec: /root/reference/colpali_engine/collators/
visual_retriever_collator.py — sample one query / one positive per example,
prefix queries with the processor's query prefix + 10x augmentation token,
auto-detect text vs image payloads, key-prefix the three sub-batches
(``query_`` / ``doc_`` / ``neg_doc_``), and reshape explicit negatives to
``(B, n_neg, ...)``.

TPU addition: optional fixed padding targets so every batch compiles to the
same shapes (the reference pads per-batch "longest", which would retrace
XLA every step). Two independent knobs, each an int or a sorted list of
bucket sizes (smallest bucket >= the batch's natural size wins):

- ``pad_seq_to``: token-sequence axes (input_ids / attention_mask /
  position_ids).
- ``pad_patches_to``: the visual patch axis of dynamic-resolution families
  (Qwen-VL style ``pixel_values (B, P, D)`` + patch_mask/vision_hpos/
  vision_wpos) — without it every distinct image grid retraces XLA.
"""

from __future__ import annotations

import random
from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np

from colpali_tpu.data.dataset import ColPaliEngineDataset
from colpali_tpu.processors.base import BaseVisualRetrieverProcessor

N_AUGMENTATION_TOKENS = 10

PadSpec = Union[int, Sequence[int]]


def prefix_keys(data: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    return {f"{prefix}{k}": v for k, v in data.items()}


def pick_bucket(current: int, spec: PadSpec, multiple: int = 1) -> int:
    """Smallest configured bucket >= current (rounded up to ``multiple``).
    A bare int is a single bucket. Overflow is an error — silent truncation
    would corrupt training."""
    buckets = [spec] if isinstance(spec, int) else sorted(spec)
    for b in buckets:
        b = ((b + multiple - 1) // multiple) * multiple
        if b >= current:
            return b
    raise ValueError(
        f"Batch needs {current} elements but the largest pad bucket is "
        f"{buckets[-1]}; add a bigger bucket (buckets={buckets})"
    )


def _pad_axis(value: Any, axis: int, target: int) -> Any:
    cur = value.shape[axis]
    if cur >= target:
        return value
    pad = [(0, 0)] * value.ndim
    pad[axis] = (0, target - cur)
    if isinstance(value, np.ndarray):
        return np.pad(value, pad)
    # device array (device_pixels staging): pad ON device — np.pad would
    # silently download it through the MB/s host link
    import jax.numpy as jnp

    return jnp.pad(value, pad)


def _is_image(x: Any) -> bool:
    return hasattr(x, "convert") or (isinstance(x, np.ndarray) and x.ndim >= 2)


class VisualRetrieverCollator:
    query_prefix = "query_"
    pos_doc_prefix = "doc_"
    neg_doc_prefix = "neg_doc_"

    def __init__(
        self,
        processor: BaseVisualRetrieverProcessor,
        max_length: int = 2048,
        pad_seq_to: Optional[PadSpec] = None,
        pad_patches_to: Optional[PadSpec] = None,
        rng: Optional[random.Random] = None,
        device_pixels: bool = False,
    ):
        """``device_pixels=True``: processors with a device staging path
        (the qwen families) resize on HOST (PIL, target-size upload) and
        normalize+patchify ON DEVICE, keeping ``pixel_values`` a device
        array. The default host path resizes on device then DOWNLOADS
        normalized fp32 pixels — measured 1.06 s of a 1.73 s staging batch
        on a remote-attached chip (perf/train_bench.py --e2e), which
        input-starved a 269 ms train step 8.5x. Collation must run
        in-process (thread prefetch, data/prefetch.py) for this — device
        calls don't cross dataloader worker processes."""
        self.processor = processor
        self.max_length = max_length
        self.pad_seq_to = pad_seq_to
        self.pad_patches_to = pad_patches_to
        self._rng = rng or random
        if device_pixels:
            import inspect

            sig = inspect.signature(processor.process_images).parameters
            device_pixels = "device_pixels" in sig
            self._host_resize = "host_resize" in sig
        self.device_pixels = device_pixels

    def __call__(self, examples: List[Dict[str, Any]]) -> Dict[str, Any]:
        queries: List[str] = []
        pos_targets: List[Any] = []
        neg_targets: List[Any] = []

        for example in examples:
            if ColPaliEngineDataset.QUERY_KEY not in example:
                raise KeyError(f"Missing {ColPaliEngineDataset.QUERY_KEY} in example.")
            query = example[ColPaliEngineDataset.QUERY_KEY]
            queries.append(self._rng.choice(query) if isinstance(query, list) else query)

            if ColPaliEngineDataset.POS_TARGET_KEY not in example:
                raise KeyError(f"Missing {ColPaliEngineDataset.POS_TARGET_KEY} in example.")
            pos = example[ColPaliEngineDataset.POS_TARGET_KEY]
            pos_targets.append(self._rng.choice(pos) if isinstance(pos, list) else pos)

            neg = example.get(ColPaliEngineDataset.NEG_TARGET_KEY)
            if neg is not None:
                neg_targets.append(neg)

        if not all(isinstance(q, str) for q in queries):
            raise ValueError("All queries must be strings.")

        queries = [
            self.processor.query_prefix + q + self.processor.query_augmentation_token * N_AUGMENTATION_TOKENS
            for q in queries
        ]
        batch = {
            **self.auto_collate(queries, self.query_prefix),
            **self.auto_collate(pos_targets, self.pos_doc_prefix),
        }
        if neg_targets:
            batch.update(self.auto_collate(neg_targets, self.neg_doc_prefix))
        if self.pad_seq_to is not None or self.pad_patches_to is not None:
            batch = self._apply_static_padding(batch)
        return batch

    def auto_collate(self, batch: Sequence[Union[str, Any, list]], key_prefix: str = "") -> Dict[str, Any]:
        """str -> process_texts; image -> process_images; list -> negatives
        reshaped to (B, n_neg, ...) (reference :98-127)."""
        first = batch[0]
        if isinstance(first, str):
            proc = self.processor.process_texts(texts=list(batch))
        elif isinstance(first, list):
            batch_size = len(batch)
            flat = [item for items in batch for item in items]
            num_neg = len(flat) // batch_size
            if isinstance(flat[0], str):
                proc = self.processor.process_texts(texts=flat)
            elif _is_image(flat[0]):
                if self.device_pixels:
                    proc = self.processor.process_images(
                        images=flat, device_pixels=True,
                        **({"host_resize": True} if self._host_resize else {}),
                    )
                else:
                    proc = self.processor.process_images(images=flat)
            else:
                raise ValueError(f"Unsupported batch type: {type(flat[0])}.")
            proc = {
                # reshape host AND device arrays (device_pixels staging)
                k: v.reshape(batch_size, num_neg, *v.shape[1:])
                if getattr(v, "ndim", 0) >= 1 and v.shape[0] == batch_size * num_neg
                else v
                for k, v in proc.items()
            }
        elif _is_image(first):
            if self.device_pixels:
                proc = self.processor.process_images(
                    images=list(batch), device_pixels=True,
                    **({"host_resize": True} if self._host_resize else {}),
                )
            else:
                proc = self.processor.process_images(images=list(batch))
        else:
            raise ValueError(f"Unsupported batch type: {type(first)}.")
        return prefix_keys(proc, key_prefix)

    def _apply_static_padding(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        """Right-pad every sub-batch's sequence axis (input_ids /
        attention_mask / position_ids) and visual patch axis (pixel_values /
        patch_mask / vision_hpos / vision_wpos) to fixed buckets, so batches
        compile to a bounded set of shapes."""
        out = dict(batch)
        # keep merged patch groups aligned under padding
        group = int(getattr(self.processor, "merge_size", 1)) ** 2
        for prefix in (self.query_prefix, self.pos_doc_prefix, self.neg_doc_prefix):
            ids_key = f"{prefix}input_ids"
            if self.pad_seq_to is not None and ids_key in batch:
                target = pick_bucket(batch[ids_key].shape[-1], self.pad_seq_to)
                for name in ("input_ids", "attention_mask", "position_ids"):
                    key = f"{prefix}{name}"
                    if key in batch:
                        out[key] = _pad_axis(batch[key], -1, target)
            mask_key = f"{prefix}patch_mask"
            if self.pad_patches_to is not None and mask_key in batch:
                target = pick_bucket(batch[mask_key].shape[-1], self.pad_patches_to, multiple=group)
                out[f"{prefix}pixel_values"] = _pad_axis(batch[f"{prefix}pixel_values"], -2, target)
                for name in ("patch_mask", "vision_hpos", "vision_wpos"):
                    key = f"{prefix}{name}"
                    if key in batch:
                        out[key] = _pad_axis(batch[key], -1, target)
        return out
