"""ColQwen2 processor tests: smart_resize parity with HF, patchify shapes,
prompt expansion with a stub tokenizer."""

import numpy as np
import pytest

from colpali_tpu.processors.qwen2_vl import (
    ColQwen2Processor,
    patchify,
    smart_resize,
    vision_positions,
)


class StubTokenizer:
    special = ["<|endoftext|>", "<|im_start|>", "<|im_end|>", "<|vision_start|>", "<|vision_end|>", "<|image_pad|>"]

    def __init__(self):
        self.vocab = {tok: i for i, tok in enumerate(self.special)}

    def convert_tokens_to_ids(self, token):
        return self.vocab.get(token, -1)

    def _encode(self, text):
        for sp in self.special:
            text = text.replace(sp, f" {sp} ")
        ids = []
        for word in text.split():
            if word not in self.vocab:
                self.vocab[word] = len(self.vocab)
            ids.append(self.vocab[word])
        return ids

    def __call__(self, texts, padding=None, padding_side="left", add_special_tokens=False, return_tensors=None):
        encoded = [self._encode(t) for t in texts]
        max_len = max(len(e) for e in encoded)
        input_ids = np.zeros((len(encoded), max_len), np.int64)
        mask = np.zeros((len(encoded), max_len), np.int64)
        for i, e in enumerate(encoded):
            input_ids[i, max_len - len(e):] = e  # left padding
            mask[i, max_len - len(e):] = 1
        return {"input_ids": input_ids, "attention_mask": mask}


@pytest.fixture
def processor():
    return ColQwen2Processor(StubTokenizer(), patch_size=2, merge_size=2, min_pixels=16, max_pixels=1024)


class TestSmartResize:
    def test_matches_hf(self):
        hf_mod = pytest.importorskip("transformers.models.qwen2_vl.image_processing_qwen2_vl")
        for h, w in [(100, 200), (1024, 768), (33, 57), (2000, 1500), (28, 28)]:
            ours = smart_resize(h, w)
            theirs = hf_mod.smart_resize(h, w)
            assert ours == theirs, f"({h},{w}): {ours} != {theirs}"

    def test_extreme_aspect_raises(self):
        with pytest.raises(ValueError, match="aspect ratio"):
            smart_resize(10, 5000)


class TestPatchify:
    def test_shapes(self):
        img = np.zeros((3, 8, 12), np.float32)
        flat, grid = patchify(img, patch_size=2, temporal_patch_size=2, merge_size=2)
        assert grid == (1, 4, 6)
        assert flat.shape == (24, 3 * 2 * 2 * 2)

    def test_merge_order(self):
        """First 4 rows of the flattened patches = the top-left 2x2 merge
        block (row-major within the block)."""
        h, w, p = 4, 4, 2
        img = np.arange(3 * h * w, dtype=np.float32).reshape(3, h, w)
        flat, grid = patchify(img, patch_size=p, temporal_patch_size=2, merge_size=2)
        assert grid == (1, 2, 2)
        # patch (0,0) covers pixels [0:2, 0:2]; its flattened features are
        # (C, T, ph, pw) with T duplicating the frame
        expected_00 = np.stack([img[:, 0:2, 0:2]] * 2, axis=1).reshape(-1)
        np.testing.assert_array_equal(flat[0], expected_00)
        # patch (0,1) covers pixels [0:2, 2:4] and is the second row (same
        # merge block), NOT the row-major second patch of the image
        expected_01 = np.stack([img[:, 0:2, 2:4]] * 2, axis=1).reshape(-1)
        np.testing.assert_array_equal(flat[1], expected_01)
        expected_10 = np.stack([img[:, 2:4, 0:2]] * 2, axis=1).reshape(-1)
        np.testing.assert_array_equal(flat[2], expected_10)

    def test_vision_positions_merge_order(self):
        hpos, wpos = vision_positions((1, 4, 4), 2)
        np.testing.assert_array_equal(hpos[:4], [0, 0, 1, 1])
        np.testing.assert_array_equal(wpos[:4], [0, 1, 0, 1])
        np.testing.assert_array_equal(hpos[4:8], [0, 0, 1, 1])
        np.testing.assert_array_equal(wpos[4:8], [2, 3, 2, 3])


class TestColQwen2Processor:
    def test_process_images(self, processor):
        rng = np.random.default_rng(0)
        images = [
            rng.integers(0, 255, size=(20, 16, 3), dtype=np.uint8),
            rng.integers(0, 255, size=(12, 12, 3), dtype=np.uint8),
        ]
        batch = processor.process_images(images)
        b, p, d = batch["pixel_values"].shape
        assert b == 2 and d == 3 * 2 * 2 * 2
        assert p % 4 == 0
        assert batch["image_grid_thw"].shape == (2, 3)
        assert batch["position_ids"].shape[0] == 3
        # expanded image tokens = merged patches per image
        img_tok = processor.image_token_id
        for i in range(2):
            t, h, w = batch["image_grid_thw"][i]
            n_merged = t * (h // 2) * (w // 2)
            assert (batch["input_ids"][i] == img_tok).sum() == n_merged
            assert batch["patch_mask"][i].sum() == t * h * w

    def test_process_queries_left_padding(self, processor):
        batch = processor.process_queries(["what is this", "hello"])
        # left padding: first column of the shorter row is padding
        assert batch["attention_mask"][1, 0] == 0
        # augmentation suffix: 10 <|endoftext|> tokens at the end
        eot = processor.tokenizer.convert_tokens_to_ids("<|endoftext|>")
        assert (batch["input_ids"][0][-10:] == eot).all()

    def test_get_n_patches(self, processor):
        npx, npy = processor.get_n_patches((64, 32))
        # reference passes image_size[0] as width: 64 -> x patches
        h_new, w_new = smart_resize(32, 64, 4, 16, 1024)
        assert (npx, npy) == (w_new // 2 // 2, h_new // 2 // 2)


class TestDevicePixelPath:
    """device_pixels=True: fused on-device resize+patchify must match the
    host pipeline bit-for-bit in values and metadata."""

    def test_matches_host_path_mixed_shapes(self, processor):
        rng = np.random.default_rng(9)
        imgs = [
            rng.integers(0, 255, (16, 12, 3), np.uint8),
            rng.integers(0, 255, (8, 8, 3), np.uint8),
            rng.integers(0, 255, (16, 12, 3), np.uint8),  # groups interleave
        ]
        host = processor.process_images(imgs)
        dev = processor.process_images(imgs, device_pixels=True)
        assert isinstance(host["pixel_values"], np.ndarray)
        np.testing.assert_allclose(
            np.asarray(dev["pixel_values"]), host["pixel_values"], atol=1e-5
        )
        for key in ("input_ids", "patch_mask", "vision_hpos", "vision_wpos", "position_ids"):
            np.testing.assert_array_equal(np.asarray(dev[key]), host[key])

    def test_host_resize_matches_device_resize(self, processor):
        """host_resize=True (PIL resize pre-upload, 4x fewer link bytes —
        perf/embed_decompose.py) must keep identical metadata/grids and
        near-identical pixels (PIL vs jax bicubic differ sub-pixel)."""
        rng = np.random.default_rng(11)
        imgs = [rng.integers(0, 255, (16, 12, 3), np.uint8) for _ in range(2)]
        dev = processor.process_images(imgs, device_pixels=True)
        hr = processor.process_images(imgs, device_pixels=True, host_resize=True)
        np.testing.assert_array_equal(np.asarray(hr["image_grid_thw"]), np.asarray(dev["image_grid_thw"]))
        for key in ("input_ids", "patch_mask", "vision_hpos", "vision_wpos", "position_ids"):
            np.testing.assert_array_equal(np.asarray(hr[key]), np.asarray(dev[key]))
        pa, pb = np.asarray(dev["pixel_values"]), np.asarray(hr["pixel_values"])
        assert pa.shape == pb.shape
        assert np.abs(pa - pb).mean() < 0.05

    def test_host_resize_noop_when_already_target_size(self, processor):
        """An image already at its smart_resize target must be bit-identical
        through both paths (no resampling at all)."""
        rng = np.random.default_rng(12)
        img = rng.integers(0, 255, (8, 8, 3), np.uint8)  # 8x8 is its own target
        dev = processor.process_images([img], device_pixels=True)
        hr = processor.process_images([img], device_pixels=True, host_resize=True)
        np.testing.assert_allclose(
            np.asarray(hr["pixel_values"]), np.asarray(dev["pixel_values"]), atol=1e-6
        )

    def test_qwen2_5_processor_forwards_device_pixels(self):
        from colpali_tpu.processors.qwen2_5_vl import ColQwen2_5Processor

        proc = ColQwen2_5Processor(StubTokenizer(), patch_size=2, merge_size=2,
                                   min_pixels=16, max_pixels=1024, window_size=8)
        rng = np.random.default_rng(3)
        imgs = [rng.integers(0, 255, (16, 12, 3), np.uint8) for _ in range(2)]
        host = proc.process_images(imgs)
        dev = proc.process_images(imgs, device_pixels=True)
        np.testing.assert_allclose(np.asarray(dev["pixel_values"]), host["pixel_values"], atol=1e-5)
        np.testing.assert_array_equal(dev["window_id"], host["window_id"])
