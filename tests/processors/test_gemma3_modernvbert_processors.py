"""Gemma3 + ModernVBert + Bi* processor behavior tests (stub tokenizers)."""

import numpy as np
import pytest

from colpali_tpu.processors import (
    BiGemma3Processor,
    BiModernVBertProcessor,
    BiPaliProcessor,
    BiQwen3_5Processor,
    ColGemma3Processor,
    ColModernVBertProcessor,
    ColQwen3_5Processor,
)


class StubTokenizer:
    """Word/special-token level tokenizer capturing the exact text it saw."""

    bos_token = "<bos>"
    eos_token = "<eos>"
    pad_token = "<pad>"

    def __init__(self):
        self.vocab = {"<pad>": 0, "<bos>": 1, "<eos>": 2}
        self.last_texts = None

    def convert_tokens_to_ids(self, token):
        if token not in self.vocab:
            self.vocab[token] = len(self.vocab)
        return self.vocab[token]

    def _encode(self, text):
        import re

        parts = re.split(r"(<[^<>]+>|\n)", text)
        ids = []
        for p in parts:
            for word in [p] if (p.startswith("<") or p == "\n") else p.split():
                if word:
                    ids.append(self.convert_tokens_to_ids(word))
        return ids

    def __call__(self, texts, padding=None, padding_side="right", add_special_tokens=False,
                 return_tensors=None):
        self.last_texts = list(texts)
        enc = [self._encode(t) for t in texts]
        m = max(len(e) for e in enc)
        ids = np.zeros((len(enc), m), np.int64)
        mask = np.zeros((len(enc), m), np.int64)
        for i, e in enumerate(enc):
            if padding_side == "left":
                ids[i, m - len(e):] = e
                mask[i, m - len(e):] = 1
            else:
                ids[i, : len(e)] = e
                mask[i, : len(e)] = 1
        return {"input_ids": ids, "attention_mask": mask}


class TestColGemma3Processor:
    @pytest.fixture
    def proc(self):
        return ColGemma3Processor(StubTokenizer(), image_size=28, image_seq_length=4)

    def test_image_prompt_expansion(self, proc):
        batch = proc.process_images([np.zeros((40, 30, 3), np.uint8)])
        text = proc.tokenizer.last_texts[0]
        # Gemma3 chat template + HF full_image_sequence expansion
        assert text == (
            "<bos><start_of_turn>user\n"
            "\n\n<start_of_image>" + "<image_soft_token>" * 4 + "<end_of_image>\n\n"
            "Describe this image<end_of_turn>\n"
        )
        assert batch["pixel_values"].shape == (1, 28, 28, 3)
        assert proc.get_image_mask(batch).sum() == 4

    def test_queries_have_no_augmentation_suffix(self, proc):
        proc.process_queries(queries=["what is this?"])
        text = proc.tokenizer.last_texts[0]
        assert text == "<bos><start_of_turn>user\nQuery: what is this?<end_of_turn>\n"
        assert "<eos>" not in text  # reference aliases process_texts: no suffix

    def test_left_padding(self, proc):
        batch = proc.process_texts(["a", "much longer query text"])
        assert batch["attention_mask"][0, 0] == 0  # short row padded on the left
        assert batch["attention_mask"][0, -1] == 1

    def test_bi_scores_single_vector(self):
        proc = BiGemma3Processor(StubTokenizer())
        qs = [np.array([1.0, 0.0], np.float32)]
        ps = [np.array([1.0, 0.0], np.float32), np.array([0.0, 1.0], np.float32)]
        scores = proc.score(qs, ps)
        assert scores.shape == (1, 2)
        assert scores[0, 0] > scores[0, 1]


class StubVBertTokenizer(StubTokenizer):
    special = ["<image>", "<fake_token_around_image>", "<global-img>", "<end_of_utterance>",
               "<|begin_of_text|>"]

    def __init__(self):
        super().__init__()
        for tok in self.special:
            self.convert_tokens_to_ids(tok)


class TestColModernVBertProcessor:
    @pytest.fixture
    def proc(self):
        return ColModernVBertProcessor(StubVBertTokenizer(), tile_size=32, longest_edge=64,
                                       image_seq_len=4)

    def test_visual_prompt_format(self, proc):
        proc.process_images([np.zeros((32, 32, 3), np.uint8)])  # single tile -> global only
        text = proc.tokenizer.last_texts[0]
        assert text.startswith("<|begin_of_text|>User:<fake_token_around_image><global-img>")
        assert text.endswith("Describe the image.<end_of_utterance>\nAssistant:")

    def test_texts_are_raw(self, proc):
        proc.process_texts(["hello world"])
        assert proc.tokenizer.last_texts == ["hello world"]

    def test_query_augmentation(self, proc):
        proc.process_queries(queries=["find the chart"])
        assert proc.tokenizer.last_texts[0] == "find the chart" + "<end_of_utterance>" * 10

    def test_bi_scores_single_vector(self):
        proc = BiModernVBertProcessor(StubVBertTokenizer(), tile_size=32)
        qs = [np.array([0.0, 1.0], np.float32)]
        ps = [np.array([0.0, 1.0], np.float32)]
        assert proc.score(qs, ps).shape == (1, 1)


class TestBiVariants:
    def test_all_bi_processors_score_single_vector(self):
        from colpali_tpu.processors import (
            BiIdefics3Processor,
            BiQwen2_5_Processor,
            BiQwen2Processor,
            BiQwen3Processor,
        )

        qs = [np.array([1.0, 0.0], np.float32)]
        ps = [np.array([1.0, 0.0], np.float32), np.array([-1.0, 0.0], np.float32)]
        for cls in (BiPaliProcessor, BiQwen2Processor, BiQwen2_5_Processor, BiQwen3Processor,
                    BiIdefics3Processor, BiQwen3_5Processor):
            proc = cls.__new__(cls)  # score() needs no tokenizer state
            scores = proc.score(qs, ps)
            np.testing.assert_allclose(scores, [[1.0, -1.0]], atol=1e-6)

    def test_colqwen3_5_inherits_qwen3_pipeline(self):
        from colpali_tpu.processors.qwen3_vl import ColQwen3Processor

        assert issubclass(ColQwen3_5Processor, ColQwen3Processor)
        assert ColQwen3_5Processor.query_augmentation_token == "<|endoftext|>"
