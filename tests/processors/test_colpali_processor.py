"""ColPali processor tests: prompt construction with a stub tokenizer, and
image preprocessing parity against the HF SigLIP image processor."""

import numpy as np
import pytest

from colpali_tpu.processors.colpali import ColPaliProcessor
from colpali_tpu.processors.image_processing import preprocess_images_fixed, to_rgb_array


class StubTokenizer:
    """Minimal HF-like tokenizer: whitespace-split word-level vocab."""

    bos_token = "<bos>"
    pad_token = "<pad>"

    def __init__(self):
        self.vocab = {"<pad>": 0, "<bos>": 1, "<image>": 2}

    def convert_tokens_to_ids(self, token):
        return self.vocab.get(token, -1)

    def _encode(self, text):
        # split out special tokens, then whitespace-split the rest
        ids = []
        for special in ("<image>", "<bos>", "<pad>"):
            text = text.replace(special, f" {special} ")
        for word in text.split():
            if word not in self.vocab:
                self.vocab[word] = len(self.vocab)
            ids.append(self.vocab[word])
        return ids

    def __call__(self, texts, padding=None, padding_side="right", add_special_tokens=False, return_tensors=None):
        encoded = [self._encode(t) for t in texts]
        max_len = max(len(e) for e in encoded)
        input_ids = np.zeros((len(encoded), max_len), np.int32)
        mask = np.zeros((len(encoded), max_len), np.int32)
        for i, e in enumerate(encoded):
            input_ids[i, : len(e)] = e
            mask[i, : len(e)] = 1
        return {"input_ids": input_ids, "attention_mask": mask}


@pytest.fixture
def processor():
    return ColPaliProcessor(StubTokenizer(), image_size=28, patch_size=14, image_seq_length=4)


class TestPromptConstruction:
    def test_image_prompt_expansion(self, processor):
        rng = np.random.default_rng(0)
        images = [rng.integers(0, 255, size=(40, 30, 3), dtype=np.uint8)]
        batch = processor.process_images(images)
        ids = batch["input_ids"][0]
        # 4 image tokens, then BOS, then the prompt words
        assert (ids[:4] == 2).all()
        assert ids[4] == 1  # inserted <bos>
        assert batch["pixel_values"].shape == (1, 28, 28, 3)

    def test_query_augmentation(self, processor):
        batch = processor.process_queries(["hello world"])
        # suffix = <pad> * 10 -> ten pad tokens at the end of the sequence
        ids = batch["input_ids"][0]
        assert (ids[-10:] == 0).all()
        assert ids[0] == 1  # bos first

    def test_get_n_patches(self, processor):
        assert processor.get_n_patches((100, 200)) == (2, 2)

    def test_image_mask(self, processor):
        rng = np.random.default_rng(0)
        images = [rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)]
        batch = processor.process_images(images)
        mask = processor.get_image_mask(batch)
        assert mask.sum() == 4


class TestImagePreprocessing:
    def test_shapes_and_range(self):
        rng = np.random.default_rng(1)
        images = [
            rng.integers(0, 255, size=(100, 80, 3), dtype=np.uint8),
            rng.integers(0, 255, size=(60, 60, 3), dtype=np.uint8),
        ]
        out = preprocess_images_fixed(images, size=(56, 56))
        assert out.shape == (2, 56, 56, 3)
        # bicubic resampling can overshoot the [-1, 1] range slightly
        assert out.min() >= -1.3 and out.max() <= 1.3

    def test_same_shape_batching(self):
        rng = np.random.default_rng(2)
        images = [rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8) for _ in range(3)]
        out = preprocess_images_fixed(images, size=(32, 32))
        single = preprocess_images_fixed(images[1:2], size=(32, 32))
        np.testing.assert_allclose(out[1], single[0], rtol=1e-5, atol=1e-5)

    def test_grayscale_and_rgba(self):
        gray = np.zeros((10, 10), np.uint8)
        rgba = np.zeros((10, 10, 4), np.uint8)
        assert to_rgb_array(gray).shape == (10, 10, 3)
        assert to_rgb_array(rgba).shape == (10, 10, 3)

    def test_hf_siglip_parity(self):
        """Our on-device pipeline vs HF SiglipImageProcessor (PIL-based).

        Resampling kernels differ slightly between PIL and jax.image, so we
        require close-but-not-identical values.
        """
        transformers = pytest.importorskip("transformers")
        from PIL import Image

        rng = np.random.default_rng(3)
        raw = rng.integers(0, 255, size=(120, 90, 3), dtype=np.uint8)
        hf_proc = transformers.SiglipImageProcessor(
            size={"height": 56, "width": 56},
            image_mean=[0.5, 0.5, 0.5],
            image_std=[0.5, 0.5, 0.5],
        )
        expected = hf_proc(Image.fromarray(raw), return_tensors="np")["pixel_values"]  # (1, 3, 56, 56)
        got = preprocess_images_fixed([raw], size=(56, 56))  # (1, 56, 56, 3)
        got_nchw = got.transpose(0, 3, 1, 2)
        diff = np.abs(got_nchw - expected)
        assert diff.mean() < 0.03, f"mean abs diff {diff.mean()}"
        assert np.corrcoef(got_nchw.ravel(), expected.ravel())[0, 1] > 0.998


def test_device_pixels_matches_host(processor):
    rng = np.random.default_rng(8)
    imgs = [rng.integers(0, 255, (40, 30, 3), np.uint8), rng.integers(0, 255, (28, 28, 3), np.uint8)]
    host = processor.process_images(imgs)
    dev = processor.process_images(imgs, device_pixels=True)
    assert isinstance(host["pixel_values"], np.ndarray)
    np.testing.assert_allclose(np.asarray(dev["pixel_values"]), host["pixel_values"], atol=1e-5)
