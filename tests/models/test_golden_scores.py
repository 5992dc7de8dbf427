"""Golden-score E2E tests against real checkpoints (slow tier).

Mirrors the reference's numerical-parity gate
(tests/models/paligemma/colpali/test_modeling_colpali.py:119-157): load the
real vidore checkpoint, embed the 3 test queries/pages, and assert the
hardcoded golden MaxSim matrix within atol=1.

These tests need checkpoint directories (no network in CI): set
COLPALI_TPU_CHECKPOINTS=/path/to/checkpoints with subdirs like
``colpali-v1.2`` containing config.json + *.safetensors + tokenizer files,
plus the hf-internal-testing document-visual-retrieval-test images. Skipped
when absent.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

CKPT_ROOT = os.environ.get("COLPALI_TPU_CHECKPOINTS")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(CKPT_ROOT is None, reason="COLPALI_TPU_CHECKPOINTS not set"),
]

# reference golden scores (test_modeling_colpali.py:149-157), atol=1
GOLDEN_COLPALI_V12 = np.array(
    [[16.5, 7.59, 15.69], [12.06, 16.25, 11.13], [15.25, 12.63, 21.0]]
)

QUERIES = [
    "What is the chip used in the iPhone 12?",
    "What is the price of the iPhone 12?",
    "When was the iPhone 12 released?",
]


def _load_test_images():
    from PIL import Image

    image_dir = os.path.join(CKPT_ROOT, "document-visual-retrieval-test")
    files = sorted(os.listdir(image_dir))[:3]
    return [Image.open(os.path.join(image_dir, f)) for f in files]


class TestGoldenScores:
    def test_colpali_v12_golden_matrix(self):
        import colpali_tpu
        from colpali_tpu.core.hf_loader import load_colpali_params, load_hf_config
        from colpali_tpu.models import ColPali, PaliGemmaConfig
        from colpali_tpu.processors import ColPaliProcessor

        ckpt = os.path.join(CKPT_ROOT, "colpali-v1.2")
        config = PaliGemmaConfig.from_hf_config(load_hf_config(ckpt))
        model = ColPali(config, dtype=jnp.bfloat16)
        params = load_colpali_params(ckpt)
        processor = ColPaliProcessor.from_pretrained(ckpt)

        images = _load_test_images()
        batch_docs = processor.process_images(images)
        batch_queries = processor.process_queries(QUERIES)

        doc_emb = model.apply(
            {"params": params},
            jnp.asarray(batch_docs["input_ids"]),
            jnp.asarray(batch_docs["attention_mask"]),
            jnp.asarray(batch_docs["pixel_values"]),
        )
        q_emb = model.apply(
            {"params": params},
            jnp.asarray(batch_queries["input_ids"]),
            jnp.asarray(batch_queries["attention_mask"]),
        )
        scores = colpali_tpu.score_multi_vector(
            np.asarray(q_emb, np.float32), np.asarray(doc_emb, np.float32)
        )
        assert (np.argmax(scores, axis=1) == np.arange(3)).all(), "not diagonal-dominant"
        np.testing.assert_allclose(scores, GOLDEN_COLPALI_V12, atol=1.0)

    def test_colqwen2_retrieval_diagonal(self):
        """ColQwen2 checkpoint gate: the reference asserts diagonal-argmax
        retrieval over the test set (test_modeling_colqwen2.py:103-130) —
        no hardcoded matrix exists upstream for this family."""
        import colpali_tpu
        from colpali_tpu.core.hf_loader import load_colqwen2_params, load_hf_config
        from colpali_tpu.models import ColQwen2, Qwen2VLConfig
        from colpali_tpu.processors import ColQwen2Processor

        ckpt = os.path.join(CKPT_ROOT, "colqwen2-v1.0")
        if not os.path.isdir(ckpt):
            pytest.skip("colqwen2-v1.0 checkpoint not present")
        config = Qwen2VLConfig.from_hf_config(load_hf_config(ckpt))
        model = ColQwen2(config, dtype=jnp.bfloat16)
        params = load_colqwen2_params(ckpt)
        processor = ColQwen2Processor.from_pretrained(ckpt, max_num_visual_tokens=768)

        images = _load_test_images()
        batch_docs = processor.process_images(images)
        batch_queries = processor.process_queries(QUERIES)

        doc_emb = model.apply(
            {"params": params},
            **{k: jnp.asarray(v) for k, v in batch_docs.items()},
        )
        q_emb = model.apply(
            {"params": params},
            **{k: jnp.asarray(v) for k, v in batch_queries.items()},
        )
        scores = colpali_tpu.score_multi_vector(
            np.asarray(q_emb, np.float32), np.asarray(doc_emb, np.float32)
        )
        assert (np.argmax(scores, axis=1) == np.arange(3)).all(), "not diagonal-dominant"
