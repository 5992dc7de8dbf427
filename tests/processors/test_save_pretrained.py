"""Processor save_pretrained round-trip: the reference's final save writes
the processor next to the weights so the output dir is self-contained
(colmodel_training.py:109-118). For each root family: construct with
non-default settings -> save_pretrained -> from_pretrained -> same config."""

import numpy as np
import pytest


def make_tokenizer(extra_specials):
    """Hermetic AutoTokenizer-loadable word-level tokenizer."""
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    vocab = {"<pad>": 0, "<unk>": 1, "<bos>": 2}
    for w in "what is a document page".split():
        vocab[w] = len(vocab)
    for s in extra_specials:
        vocab[s] = len(vocab)
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    return PreTrainedTokenizerFast(
        tokenizer_object=tok,
        pad_token="<pad>",
        unk_token="<unk>",
        bos_token="<bos>",
        additional_special_tokens=list(extra_specials),
    )


class TestProcessorSavePretrained:
    def test_colpali_roundtrip(self, tmp_path):
        from colpali_tpu.processors.colpali import ColPaliProcessor

        tok = make_tokenizer(["<image>"])
        proc = ColPaliProcessor(tok, image_size=224, patch_size=14,
                                image_seq_length=256, image_mean=(0.1, 0.2, 0.3))
        proc.save_pretrained(str(tmp_path))
        re = ColPaliProcessor.from_pretrained(str(tmp_path))
        assert re.image_size == 224
        assert re.image_seq_length == 256
        assert tuple(re.image_mean) == (0.1, 0.2, 0.3)
        assert re.image_token_id == proc.image_token_id

    def test_qwen2_roundtrip(self, tmp_path):
        from colpali_tpu.processors.qwen2_vl import ColQwen2Processor

        tok = make_tokenizer(["<|image_pad|>", "<|vision_start|>", "<|vision_end|>"])
        proc = ColQwen2Processor(tok, max_num_visual_tokens=384)
        proc.save_pretrained(str(tmp_path))
        re = ColQwen2Processor.from_pretrained(str(tmp_path))
        assert re.patch_size == proc.patch_size
        assert re.merge_size == proc.merge_size
        assert re.min_pixels == proc.min_pixels
        assert re.max_pixels == proc.max_pixels  # the 384-token cap survives
        np.testing.assert_allclose(re.image_mean, proc.image_mean)

    def test_idefics3_roundtrip(self, tmp_path):
        from colpali_tpu.processors.idefics3 import ColIdefics3Processor

        tok = make_tokenizer(
            ["<image>", "<fake_token_around_image>", "<global-img>", "<end_of_utterance>"]
        )
        proc = ColIdefics3Processor(tok, tile_size=256, longest_edge=1024, image_seq_len=16)
        proc.save_pretrained(str(tmp_path))
        re = ColIdefics3Processor.from_pretrained(str(tmp_path))
        assert re.tile_size == 256
        assert re.longest_edge == 1024
        assert re.image_seq_len == 16

    def test_gemma3_roundtrip(self, tmp_path):
        from colpali_tpu.processors.gemma3 import ColGemma3Processor

        tok = make_tokenizer(
            ["<image_soft_token>", "<start_of_image>", "<end_of_image>"]
        )
        tok.eos_token = "<pad>"
        proc = ColGemma3Processor(tok, image_size=448, image_seq_length=64)
        proc.save_pretrained(str(tmp_path))
        re = ColGemma3Processor.from_pretrained(str(tmp_path))
        assert re.image_size == 448
        assert re.image_seq_length == 64

    def test_stub_tokenizer_skipped_gracefully(self, tmp_path):
        """Processors built on non-HF tokenizers still write the image
        configs (tokenizer files are simply absent)."""
        from colpali_tpu.processors.colpali import ColPaliProcessor

        class Stub:
            pad_token = "<pad>"

            def convert_tokens_to_ids(self, t):
                return 2

        proc = ColPaliProcessor(Stub(), image_size=28, patch_size=14, image_seq_length=4)
        proc.save_pretrained(str(tmp_path))
        assert (tmp_path / "preprocessor_config.json").exists()
