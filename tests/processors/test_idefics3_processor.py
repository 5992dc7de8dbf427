"""ColIdefics3 processor + split-image interpretability tests."""

import numpy as np
import pytest

from colpali_tpu.interpretability.split_image import (
    get_split_image_similarity_maps,
    rearrange_image_embeddings,
)
from colpali_tpu.processors.idefics3 import ColIdefics3Processor, resized_dimensions


class StubTokenizer:
    special = ["<image>", "<fake_token_around_image>", "<global-img>", "<end_of_utterance>", "<pad>",
               "<|im_start|>"]
    pad_token = "<pad>"

    def __init__(self):
        self.vocab = {tok: i for i, tok in enumerate(self.special)}

    def convert_tokens_to_ids(self, token):
        return self.vocab.get(token, -1)

    def _encode(self, text):
        import re
        # split out specials and <row_x_col_y> markers
        parts = re.split(r"(<[^<>]+>|\n)", text)
        ids = []
        for p in parts:
            for word in ([p] if p.startswith("<") or p == "\n" else p.split()):
                if not word:
                    continue
                if word not in self.vocab:
                    self.vocab[word] = len(self.vocab)
                ids.append(self.vocab[word])
        return ids

    def __call__(self, texts, padding=None, padding_side="right", add_special_tokens=False, return_tensors=None):
        enc = [self._encode(t) for t in texts]
        m = max(len(e) for e in enc)
        ids = np.zeros((len(enc), m), np.int64)
        mask = np.zeros((len(enc), m), np.int64)
        for i, e in enumerate(enc):
            ids[i, : len(e)] = e
            mask[i, : len(e)] = 1
        return {"input_ids": ids, "attention_mask": mask}


@pytest.fixture
def processor():
    return ColIdefics3Processor(StubTokenizer(), tile_size=32, longest_edge=64, image_seq_len=4)


class TestSplitting:
    def test_small_image_single_tile(self, processor):
        img = np.zeros((20, 20, 3), np.uint8)
        batch = processor.process_images([img])
        # one (global) tile, 4 image tokens
        assert batch["pixel_values"].shape[1] == 1
        assert (batch["input_ids"][0] == processor.image_token_id).sum() == 4

    def test_large_image_split(self, processor):
        img = np.zeros((64, 48, 3), np.uint8)
        batch = processor.process_images([img])
        # 64x48 -> ceil(64/32) x ceil(48/32) = 2x2 tiles + global = 5
        assert batch["pixel_values"].shape[1] == 5
        assert batch["tile_mask"][0].sum() == 5
        # 5 tiles x 4 tokens
        assert (batch["input_ids"][0] == processor.image_token_id).sum() == 20

    def test_mixed_batch_padding(self, processor):
        imgs = [np.zeros((64, 48, 3), np.uint8), np.zeros((16, 16, 3), np.uint8)]
        batch = processor.process_images(imgs)
        assert batch["pixel_values"].shape[1] == 5
        assert batch["tile_mask"][1].sum() == 1

    def test_resized_dimensions_even(self):
        h, w = resized_dimensions(333, 1000, 512)
        assert w == 512 and h % 2 == 0

    def test_local_image_mask_excludes_global(self, processor):
        img = np.zeros((64, 48, 3), np.uint8)
        batch = processor.process_images([img])
        full = processor.get_image_mask(batch)
        local = processor.get_local_image_mask(batch)
        assert full[0].sum() - local[0].sum() == processor.image_seq_len

    def test_get_n_patches(self, processor):
        npx, npy = processor.get_n_patches((64, 48))
        # 2 cols x 2 rows of tiles, 2 tokens per tile side
        assert (npx, npy) == (4, 4)


class TestSplitImageInterpretability:
    def test_rearrange_identity_single_tile(self):
        rng = np.random.default_rng(0)
        emb = rng.normal(size=(4, 8)).astype(np.float32)
        mask = np.ones(4, bool)
        grid = rearrange_image_embeddings(emb, mask, (2, 2), image_seq_len=4)
        # token (r, c) of a single 2x2 tile -> grid[c, r]
        np.testing.assert_array_equal(grid[0, 0], emb[0])
        np.testing.assert_array_equal(grid[1, 0], emb[1])
        np.testing.assert_array_equal(grid[0, 1], emb[2])

    def test_tile_order_rearrangement(self):
        """Two tiles side by side: tile 1's tokens must land in columns 2-3."""
        dim = 2
        # 2 tiles of 2x2 tokens: value = tile*100 + local index
        emb = np.array([[t * 100 + i] * dim for t in range(2) for i in range(4)], np.float32)
        mask = np.ones(8, bool)
        grid = rearrange_image_embeddings(emb, mask, (4, 2), image_seq_len=4)
        assert grid.shape == (4, 2, dim)
        assert grid[0, 0, 0] == 0  # tile 0, token (0,0)
        assert grid[2, 0, 0] == 100  # tile 1, token (0,0) -> x offset 2
        assert grid[3, 1, 0] == 103  # tile 1, token (1,1)

    def test_similarity_maps_shapes_and_mismatch(self):
        rng = np.random.default_rng(1)
        emb = rng.normal(size=(1, 10, 8)).astype(np.float32)
        q = rng.normal(size=(1, 3, 8)).astype(np.float32)
        mask = np.zeros((1, 10), bool)
        mask[0, :8] = True
        maps = get_split_image_similarity_maps(emb, q, (4, 2), mask, image_seq_len=4)
        assert maps[0].shape == (3, 4, 2)
        with pytest.raises(ValueError, match="get_local_image_mask"):
            get_split_image_similarity_maps(emb, q, (2, 2), mask, image_seq_len=4)


class TestDeviceTilePath:
    def test_device_pixels_matches_host(self, processor):
        rng = np.random.default_rng(8)
        imgs = [
            rng.integers(0, 255, (96, 64, 3), np.uint8),  # tiled (split) image
            rng.integers(0, 255, (24, 24, 3), np.uint8),  # global-only image
            rng.integers(0, 255, (96, 64, 3), np.uint8),  # interleaved group
        ]
        host = processor.process_images(imgs)
        dev = processor.process_images(imgs, device_pixels=True)
        assert isinstance(host["pixel_values"], np.ndarray)
        np.testing.assert_allclose(
            np.asarray(dev["pixel_values"]), host["pixel_values"], atol=1e-4
        )
        for key in ("input_ids", "tile_mask"):
            np.testing.assert_array_equal(np.asarray(dev[key]), host[key])


    def test_device_pixels_single_axis_resize(self, processor):
        """Longest-edge resize that changes exactly ONE dimension (64x65 ->
        64x64 at longest_edge=64): the unchanged axis carries a (1,1)
        placeholder interpolation matrix that must not reach an einsum."""
        from colpali_tpu.processors.idefics3 import resized_dimensions

        assert resized_dimensions(64, 65, 64) == (64, 64)  # the trigger shape
        rng = np.random.default_rng(9)
        imgs = [rng.integers(0, 255, (64, 65, 3), np.uint8)]
        host = processor.process_images(imgs)
        dev = processor.process_images(imgs, device_pixels=True)
        np.testing.assert_allclose(
            np.asarray(dev["pixel_values"]), host["pixel_values"], atol=1e-4
        )
