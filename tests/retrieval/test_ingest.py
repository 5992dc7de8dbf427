"""Fused low-byte page ingestion (retrieval/ingest.py).

embed_pages_fused must produce the same embeddings as the standard
process_images(host_resize=True) -> forward path when the wire format is
exact (rgb-u8, no reducing_gap), and stay within wire-quantization
tolerance for yuv420. Ragged page counts (final partial group) must
round-trip without padding artifacts.
"""

import numpy as np
import pytest
from PIL import Image

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from colpali_tpu.models.paligemma import ColPali  # noqa: E402
from colpali_tpu.processors.colpali import ColPaliProcessor  # noqa: E402
from colpali_tpu.retrieval.ingest import embed_pages_fused  # noqa: E402
from colpali_tpu.utils.testing import tiny_colpali_config  # noqa: E402

from tests.processors.test_colpali_processor import StubTokenizer  # noqa: E402


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_colpali_config(image_size=28)
    model = ColPali(cfg, dim=16)
    processor = ColPaliProcessor(StubTokenizer(), image_size=28, patch_size=14,
                                 image_seq_length=4)
    rng = np.random.default_rng(0)
    pages = []
    for _ in range(5):
        # document-like page: white background, dark text bars, one figure —
        # random RGB noise would be adversarial for the 4:2:0 chroma wire
        a = np.full((112, 84, 3), 255, np.uint8)
        for _ in range(12):
            y0, x0 = int(rng.integers(0, 104)), int(rng.integers(0, 40))
            a[y0 : y0 + 3, x0 : x0 + int(rng.integers(20, 40))] = int(rng.integers(0, 80))
        a[8:30, 50:80] = [int(rng.integers(0, 256)) for _ in range(3)]
        pages.append(Image.fromarray(a))
    batch = processor.process_images(pages[:1])
    variables = model.init(jax.random.PRNGKey(0),
                           input_ids=jnp.asarray(batch["input_ids"]),
                           attention_mask=jnp.asarray(batch["attention_mask"]),
                           pixel_values=jnp.asarray(batch["pixel_values"]))
    return model, variables, processor, pages


def _reference_embeddings(model, variables, processor, pages):
    batch = processor.process_images(pages, host_resize=True)
    emb = np.asarray(
        model.apply(variables, input_ids=jnp.asarray(batch["input_ids"]),
                    attention_mask=jnp.asarray(batch["attention_mask"]),
                    pixel_values=jnp.asarray(batch["pixel_values"])),
        np.float32,
    )
    mask = np.asarray(batch["attention_mask"]).astype(bool)
    return [emb[i][mask[i]] for i in range(emb.shape[0])]


class TestEmbedPagesFused:
    def test_rgb_u8_matches_standard_path(self, setup):
        model, variables, processor, pages = setup
        ref = _reference_embeddings(model, variables, processor, pages[:4])
        got = embed_pages_fused(model.apply, variables, processor, pages[:4],
                                transport="rgb-u8", batch_size=4)
        assert len(got) == 4
        for g, r in zip(got, ref):
            assert g.shape == r.shape
            np.testing.assert_allclose(g, r, atol=1e-5, rtol=1e-4)

    def test_yuv420_within_wire_quantization(self, setup):
        model, variables, processor, pages = setup
        ref = _reference_embeddings(model, variables, processor, pages[:4])
        got = embed_pages_fused(model.apply, variables, processor, pages[:4],
                                transport="yuv420", batch_size=4)
        for g, r in zip(got, ref):
            # u8 wire + 2x2 chroma subsample: embeddings are normalized,
            # so the drift bound is a cosine floor, not elementwise equality
            cos = np.sum(g * r, -1) / (np.linalg.norm(g, axis=-1) * np.linalg.norm(r, axis=-1))
            assert cos.min() > 0.99

    def test_partial_final_group_and_chunk(self, setup):
        model, variables, processor, pages = setup
        # 5 pages, batch 2, chunk 2 -> groups of 4: the final group is 1 real
        # page + 3 pad repeats that must be sliced off
        got = embed_pages_fused(model.apply, variables, processor, pages,
                                transport="rgb-u8", batch_size=2, chunk=2)
        assert len(got) == 5
        ref = _reference_embeddings(model, variables, processor, pages)
        for g, r in zip(got, ref):
            np.testing.assert_allclose(g, r, atol=1e-5, rtol=1e-4)

    def test_gray_transport_shapes(self, setup):
        model, variables, processor, pages = setup
        got = embed_pages_fused(model.apply, variables, processor, pages[:2],
                                transport="gray", batch_size=2)
        assert len(got) == 2 and got[0].shape[-1] == 16

    def test_rejects_unknown_transport(self, setup):
        model, variables, processor, pages = setup
        with pytest.raises(ValueError, match="transport"):
            embed_pages_fused(model.apply, variables, processor, pages,
                              transport="jpeg")

    def test_empty_pages(self, setup):
        model, variables, processor, _ = setup
        assert embed_pages_fused(model.apply, variables, processor, []) == []
