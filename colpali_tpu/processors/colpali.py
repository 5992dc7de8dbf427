"""ColPali processor: PaliGemma prompting + SigLIP preprocessing.

Behavioral spec:
- reference ColPaliProcessor
  (/root/reference/colpali_engine/models/paligemma/colpali/processing_colpali.py):
  ``visual_prompt_prefix = "<image><bos>Describe the image."``, queries =
  ``<bos> + text`` (+ pad-token augmentation suffix via process_queries),
  right padding.
- HF PaliGemmaProcessor string construction (processing_paligemma.py): each
  ``<image>`` in the prompt expands to ``image_seq_length`` copies, the BOS
  token is inserted after the last image token, and a newline is appended.

The tokenizer is injected (any HF-compatible tokenizer object); image
preprocessing is the on-device pipeline from
:mod:`colpali_tpu.processors.image_processing`.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple

import numpy as np

from colpali_tpu.processors.base import BaseVisualRetrieverProcessor, Batch
from colpali_tpu.processors.image_processing import preprocess_images_fixed


class ColPaliProcessor(BaseVisualRetrieverProcessor):
    visual_prompt_prefix: str = "<image><bos>Describe the image."
    image_token: str = "<image>"

    def __init__(
        self,
        tokenizer: Any,
        image_size: int = 448,
        patch_size: int = 14,
        image_seq_length: int = 1024,
        image_mean: Sequence[float] = (0.5, 0.5, 0.5),
        image_std: Sequence[float] = (0.5, 0.5, 0.5),
    ):
        self.tokenizer = tokenizer
        self.image_size = image_size
        self.patch_size = patch_size
        self.image_seq_length = image_seq_length
        self.image_mean = tuple(image_mean)
        self.image_std = tuple(image_std)
        self.image_token_id = tokenizer.convert_tokens_to_ids(self.image_token)

    @classmethod
    def from_pretrained(cls, path: str, **kwargs) -> "ColPaliProcessor":
        """Load tokenizer + image-processing config from an HF checkpoint dir."""
        import json

        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(path)
        init_kwargs = {}
        pp_path = os.path.join(path, "preprocessor_config.json")
        if os.path.exists(pp_path):
            with open(pp_path) as f:
                pp = json.load(f)
            size = pp.get("size", {})
            init_kwargs["image_size"] = size.get("height", 448)
            init_kwargs["image_mean"] = pp.get("image_mean", (0.5, 0.5, 0.5))
            init_kwargs["image_std"] = pp.get("image_std", (0.5, 0.5, 0.5))
        init_kwargs["image_seq_length"] = (init_kwargs.get("image_size", 448) // 14) ** 2
        init_kwargs.update(kwargs)
        return cls(tokenizer, **init_kwargs)

    def _export_configs(self) -> tuple:
        pp = {
            "size": {"height": self.image_size, "width": self.image_size},
            "image_mean": list(self.image_mean),
            "image_std": list(self.image_std),
        }
        return pp, {}

    @property
    def query_augmentation_token(self) -> str:
        """Reference: the tokenizer pad token (processing_colpali.py:50-56)."""
        return self.tokenizer.pad_token

    def _expand_image_prompt(self, text: str) -> str:
        """HF PaliGemmaProcessor expansion: <image> x seq_len, BOS after the
        last image token, trailing newline."""
        expanded = text.replace(self.image_token, self.image_token * self.image_seq_length)
        idx = expanded.rfind(self.image_token)
        bos_at = idx + len(self.image_token) if idx != -1 else 0
        expanded = expanded[:bos_at] + self.tokenizer.bos_token + expanded[bos_at:]
        return expanded + "\n"

    def _tokenize(self, texts: Sequence[str]) -> Batch:
        enc = self.tokenizer(
            list(texts),
            padding="longest",
            padding_side="right",
            add_special_tokens=False,
            return_tensors="np",
        )
        return {"input_ids": np.asarray(enc["input_ids"]), "attention_mask": np.asarray(enc["attention_mask"])}

    def process_images(
        self,
        images: Sequence[Any],
        context_prompts: Optional[Sequence[str]] = None,
        device_pixels: bool = False,
        host_resize: bool = False,
    ) -> Batch:
        """device_pixels=True keeps ``pixel_values`` on device (the
        serving/embedding path — see processors/image_processing.py);
        host_resize=True resizes on host pre-upload (fewer link bytes)."""
        prompts = list(context_prompts) if context_prompts else [self.visual_prompt_prefix] * len(images)
        if len(prompts) != len(images):
            raise ValueError(f"Got {len(images)} images but {len(prompts)} prompts")
        batch = self._tokenize([self._expand_image_prompt(p) for p in prompts])
        batch["pixel_values"] = preprocess_images_fixed(
            images,
            size=(self.image_size, self.image_size),
            mean=self.image_mean,
            std=self.image_std,
            device=device_pixels,
            host_resize=host_resize,
        )
        return batch

    def process_texts(self, texts: Sequence[str]) -> Batch:
        """Queries/texts: BOS + text, right padding (processing_colpali.py:78-94)."""
        return self._tokenize([self.tokenizer.bos_token + t for t in texts])

    def get_n_patches(self, image_size: Tuple[int, int], patch_size: Optional[int] = None) -> Tuple[int, int]:
        patch_size = patch_size or self.patch_size
        return self.image_size // patch_size, self.image_size // patch_size

    def get_image_mask(self, batch: Batch) -> np.ndarray:
        return batch["input_ids"] == self.image_token_id
