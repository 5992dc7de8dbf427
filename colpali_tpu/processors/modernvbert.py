"""ColModernVBert / BiModernVBert processors.

Behavioral spec:
- reference ColModernVBertProcessor
  (/root/reference/colpali_engine/models/modernvbert/colvbert/processing_colmodernvbert.py):
  Idefics3-style tile splitting (512px tiles, image_seq_len=64) with the
  visual prompt ``"<|begin_of_text|>User:<image>Describe the
  image.<end_of_utterance>\\nAssistant:"`` (:25-27, the ``<image>`` expands
  into the row/col tile prompt); texts tokenize RAW (:66-79); queries get the
  base 10x ``<end_of_utterance>`` augmentation suffix (:23); left padding
  (:44).
- BiModernVBertProcessor (processing_bimodernvbert.py:9-36): same, scoring is
  cosine over pooled vectors.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from colpali_tpu.processors.base import Batch
from colpali_tpu.processors.idefics3 import ColIdefics3Processor


class ColModernVBertProcessor(ColIdefics3Processor):
    prompt_prefix: str = "<|begin_of_text|>User:"
    query_augmentation_token: str = "<end_of_utterance>"  # processing_colmodernvbert.py:23

    def _tokenize(self, texts: Sequence[str]) -> Batch:
        enc = self.tokenizer(
            list(texts),
            padding="longest",
            padding_side="left",  # reference sets tokenizer.padding_side = "left" (:44)
            add_special_tokens=False,
            return_tensors="np",
        )
        return {"input_ids": np.asarray(enc["input_ids"]), "attention_mask": np.asarray(enc["attention_mask"])}


class BiModernVBertProcessor(ColModernVBertProcessor):
    """Dense variant: cosine scoring (processing_bimodernvbert.py:26-36)."""

    def score(self, qs, ps, **kwargs) -> np.ndarray:
        return self.score_single_vector(qs, ps)
