"""ColGemma3 / BiGemma3 processors: Gemma3 chat-template prompting.

Behavioral spec:
- reference ColGemmaProcessor3 / BiGemmaProcessor3
  (/root/reference/colpali_engine/models/gemma3/colgemma3/processing_colgemma.py,
  .../bigemma3/processing_bigemma.py): documents are rendered through Gemma3's
  chat template with the prompt "Describe this image"; queries through the
  same template as "Query: {text}". ``process_queries`` aliases
  ``process_texts`` — NO augmentation suffix (unlike the other families).
  Left padding.
- HF Gemma3Processor (processing_gemma3.py:60-76): each ``<start_of_image>``
  in the text expands to ``"\\n\\n<start_of_image>" + <image_soft_token> *
  image_seq_length + "<end_of_image>\\n\\n"``.
- Gemma3 chat template: ``<bos><start_of_turn>user\\n{content}<end_of_turn>\\n``
  with images rendered as ``<start_of_image>`` and text trimmed.

The tokenizer is injected (any HF-compatible tokenizer); image preprocessing
is the on-device SigLIP pipeline (896x896, mean/std 0.5).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple

import numpy as np

from colpali_tpu.processors.base import BaseVisualRetrieverProcessor, Batch
from colpali_tpu.processors.image_processing import preprocess_images_fixed


class ColGemma3Processor(BaseVisualRetrieverProcessor):
    boi_token: str = "<start_of_image>"
    eoi_token: str = "<end_of_image>"
    image_token: str = "<image_soft_token>"
    doc_prompt: str = "Describe this image"
    query_prefix: str = "Query: "

    def __init__(
        self,
        tokenizer: Any,
        image_size: int = 896,
        patch_size: int = 14,
        image_seq_length: int = 256,
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
    def from_pretrained(cls, path: str, **kwargs) -> "ColGemma3Processor":
        import json

        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(path)
        init_kwargs = {}
        pp_path = os.path.join(path, "preprocessor_config.json")
        if os.path.exists(pp_path):
            with open(pp_path) as f:
                pp = json.load(f)
            size = pp.get("size", {})
            init_kwargs["image_size"] = size.get("height", 896)
            init_kwargs["image_mean"] = pp.get("image_mean", (0.5, 0.5, 0.5))
            init_kwargs["image_std"] = pp.get("image_std", (0.5, 0.5, 0.5))
        proc_path = os.path.join(path, "processor_config.json")
        if os.path.exists(proc_path):
            with open(proc_path) as f:
                init_kwargs["image_seq_length"] = json.load(f).get("image_seq_length", 256)
        init_kwargs.update(kwargs)
        return cls(tokenizer, **init_kwargs)

    def _export_configs(self) -> tuple:
        pp = {
            "size": {"height": self.image_size, "width": self.image_size},
            "image_mean": list(self.image_mean),
            "image_std": list(self.image_std),
        }
        return pp, {"image_seq_length": self.image_seq_length}

    @property
    def query_augmentation_token(self) -> str:
        """Reference declares <eos> (processing_colgemma.py:49) — note its
        process_queries never appends it (see :161-177)."""
        return self.tokenizer.eos_token

    def _chat(self, content: str) -> str:
        """Gemma3 chat template, user turn, no generation prompt."""
        return f"{self.tokenizer.bos_token}<start_of_turn>user\n{content}<end_of_turn>\n"

    def _expand_images(self, text: str) -> str:
        full = f"\n\n{self.boi_token}{self.image_token * self.image_seq_length}{self.eoi_token}\n\n"
        return text.replace(self.boi_token, full)

    def _tokenize(self, texts: Sequence[str]) -> Batch:
        enc = self.tokenizer(
            list(texts),
            padding="longest",
            padding_side="left",  # reference sets tokenizer.padding_side = "left"
            add_special_tokens=False,
            return_tensors="np",
        )
        return {"input_ids": np.asarray(enc["input_ids"]), "attention_mask": np.asarray(enc["attention_mask"])}

    def process_images(
        self,
        images: Sequence[Any],
        context_prompts: Optional[Sequence[str]] = None,
        device_pixels: bool = False,
    ) -> Batch:
        prompts = list(context_prompts) if context_prompts else [self.doc_prompt] * len(images)
        if len(prompts) != len(images):
            raise ValueError(f"Got {len(images)} images but {len(prompts)} prompts")
        texts = [self._expand_images(self._chat(f"{self.boi_token}{p}")) for p in prompts]
        batch = self._tokenize(texts)
        batch["pixel_values"] = preprocess_images_fixed(
            images,
            size=(self.image_size, self.image_size),
            mean=self.image_mean,
            std=self.image_std,
            device=device_pixels,
        )
        return batch

    def process_texts(self, texts: Sequence[str]) -> Batch:
        return self._tokenize([self._chat(f"{self.query_prefix}{t}") for t in texts])

    def process_queries(self, texts=None, queries=None, **kwargs) -> Batch:
        """Alias of process_texts — reference ColGemma3 applies NO
        augmentation suffix (processing_colgemma.py:161-177)."""
        if texts and queries:
            raise ValueError("Only one of 'texts' or 'queries' should be provided.")
        texts = queries if queries is not None else texts
        if texts is None:
            raise ValueError("No texts or queries provided.")
        return self.process_texts(texts)

    def get_n_patches(self, image_size: Tuple[int, int], patch_size: Optional[int] = None) -> Tuple[int, int]:
        """Gemma3 pools the 64x64 SigLIP grid to sqrt(mm_tokens) per side.

        Deliberate deviation: the reference returns the RAW patch grid
        (processing_colgemma.py:243-267, image_size//patch_size = 64x64),
        which contradicts its own 256 soft tokens — similarity maps need the
        grid to match the number of image tokens in the sequence, so we
        return the pooled grid."""
        side = int(self.image_seq_length**0.5)
        return side, side

    def get_image_mask(self, batch: Batch) -> np.ndarray:
        return batch["input_ids"] == self.image_token_id


class BiGemma3Processor(ColGemma3Processor):
    """Dense variant (reference processing_bigemma.py): same prompting;
    scoring is cosine over pooled vectors."""

    def score(self, qs, ps, **kwargs) -> np.ndarray:
        return self.score_single_vector(qs, ps)


# The reference's own exported names put the "3" AFTER "Processor"
# (processing_colgemma.py:24 ``ColGemmaProcessor3``, processing_bigemma.py:11
# ``BiGemmaProcessor3``) — not typos here; both spellings stay importable.
ColGemmaProcessor3 = ColGemma3Processor
BiGemmaProcessor3 = BiGemma3Processor
