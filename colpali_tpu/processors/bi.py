"""Bi-encoder (single-vector) processor variants.

Mirrors the reference's ``Bi*Processor`` classes
(/root/reference/colpali_engine/models/*/bi*/processing_bi*.py): each
subclasses the family's Col processor and overrides ``score`` to cosine
similarity over pooled vectors. Their ``process_texts`` overrides in the
reference re-state the Col behavior verbatim (raw tokenization), which our
Col processors already implement, so only ``score`` differs here.
"""

from __future__ import annotations

import numpy as np

from colpali_tpu.processors.colpali import ColPaliProcessor
from colpali_tpu.processors.idefics3 import ColIdefics3Processor
from colpali_tpu.processors.qwen2_5_vl import ColQwen2_5Processor
from colpali_tpu.processors.qwen2_vl import ColQwen2Processor
from colpali_tpu.processors.qwen3_vl import ColQwen3Processor


class BiPaliProcessor(ColPaliProcessor):
    """reference processing_bipali.py:8-26."""

    def score(self, qs, ps, **kwargs) -> np.ndarray:
        return self.score_single_vector(qs, ps)


class BiQwen2Processor(ColQwen2Processor):
    """reference processing_biqwen2.py:9-43."""

    def score(self, qs, ps, **kwargs) -> np.ndarray:
        return self.score_single_vector(qs, ps)


class BiQwen2_5_Processor(ColQwen2_5Processor):  # noqa: N801 — reference naming
    """reference processing_biqwen2_5.py:9-40."""

    def score(self, qs, ps, **kwargs) -> np.ndarray:
        return self.score_single_vector(qs, ps)


class BiQwen3Processor(ColQwen3Processor):
    """reference processing_biqwen3.py:9-37."""

    def score(self, qs, ps, **kwargs) -> np.ndarray:
        return self.score_single_vector(qs, ps)


class BiIdefics3Processor(ColIdefics3Processor):
    """reference processing_biidefics3.py:9-40."""

    def score(self, qs, ps, **kwargs) -> np.ndarray:
        return self.score_single_vector(qs, ps)
