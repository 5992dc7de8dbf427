"""Numerical parity: our flax Gemma3 vs the HF torch reference (tiny random
model, hermetic)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from colpali_tpu.core.hf_loader import (  # noqa: E402
    GEMMA3_KEY_REMAPS,
    GEMMA3_RULES,
    convert_state_dict,
    normalize_keys,
)
from colpali_tpu.models.gemma3 import BiGemma3, Gemma3Backbone, Gemma3Config  # noqa: E402

IMAGE_TOKEN = 90
NUM_IMG_TOKENS = 1  # mm_tokens_per_image (28px/14 -> 2x2 patches, pool 2x2)


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    cfg = transformers.Gemma3Config(
        vision_config=dict(
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            image_size=28,
            patch_size=14,
        ),
        text_config=dict(
            vocab_size=99,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=3,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=8,
            query_pre_attn_scalar=8,
            sliding_window=4,
            sliding_window_pattern=2,
            rope_theta=1000000.0,
            rope_local_base_freq=10000.0,
            rope_scaling={"rope_type": "linear", "factor": 2.0},
        ),
        image_token_index=IMAGE_TOKEN,
        mm_tokens_per_image=NUM_IMG_TOKENS,
    )
    return transformers.Gemma3Model(cfg).eval().float()


@pytest.fixture(scope="module")
def our_setup(hf_model):
    config = Gemma3Config.from_hf_config(hf_model.config.to_dict())
    params = convert_state_dict(hf_model.state_dict(), GEMMA3_RULES, GEMMA3_KEY_REMAPS)
    return config, params


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    b, s = 2, 14
    input_ids = rng.integers(1, 80, size=(b, s)).astype(np.int64)
    # image block at positions 3..3+NUM_IMG_TOKENS
    input_ids[:, 3 : 3 + NUM_IMG_TOKENS] = IMAGE_TOKEN
    attention_mask = np.ones((b, s), np.int64)
    attention_mask[1, -3:] = 0
    input_ids[1, -3:] = 0
    token_type_ids = (input_ids == IMAGE_TOKEN).astype(np.int64)
    pixel_values = rng.normal(size=(b, 3, 28, 28)).astype(np.float32)
    return input_ids, attention_mask, token_type_ids, pixel_values


class TestGemma3Parity:
    @pytest.mark.parametrize("dtype64", [False, True])
    def test_multimodal_forward(self, hf_model, our_setup, batch, dtype64):
        config, params = our_setup
        input_ids, attention_mask, token_type_ids, pixel_values = batch

        hf = hf_model.double() if dtype64 else hf_model.float()
        tdt = torch.float64 if dtype64 else torch.float32
        with torch.no_grad():
            expected = hf(
                input_ids=torch.tensor(input_ids),
                attention_mask=torch.tensor(attention_mask),
                token_type_ids=torch.tensor(token_type_ids),
                pixel_values=torch.tensor(pixel_values, dtype=tdt),
            ).last_hidden_state.numpy()
        hf_model.float()

        jdt = jnp.float64 if dtype64 else jnp.float32
        if dtype64:
            jax.config.update("jax_enable_x64", True)
        try:
            p = jax.tree.map(lambda x: np.asarray(x).astype(np.float64), params) if dtype64 else params
            backbone = Gemma3Backbone(config, dtype=jdt, param_dtype=jdt)
            got = np.asarray(
                backbone.apply(
                    {"params": p["model"]},
                    jnp.asarray(input_ids),
                    jnp.asarray(attention_mask),
                    jnp.asarray(pixel_values.transpose(0, 2, 3, 1).astype(np.float64 if dtype64 else np.float32)),
                )
            )
        finally:
            if dtype64:
                jax.config.update("jax_enable_x64", False)
        valid = attention_mask.astype(bool)
        tol = 1e-5 if dtype64 else 2e-2
        np.testing.assert_allclose(got[valid], expected[valid], rtol=tol, atol=tol)

    def test_text_only_forward(self, hf_model, our_setup):
        config, params = our_setup
        rng = np.random.default_rng(1)
        input_ids = rng.integers(1, 80, size=(2, 9)).astype(np.int64)
        attention_mask = np.ones((2, 9), np.int64)
        attention_mask[0, -2:] = 0
        with torch.no_grad():
            expected = hf_model.language_model(
                input_ids=torch.tensor(input_ids),
                attention_mask=torch.tensor(attention_mask),
            ).last_hidden_state.numpy()
        backbone = Gemma3Backbone(config)
        got = np.asarray(
            backbone.apply(
                {"params": params["model"]}, jnp.asarray(input_ids), jnp.asarray(attention_mask)
            )
        )
        valid = attention_mask.astype(bool)
        np.testing.assert_allclose(got[valid], expected[valid], rtol=2e-2, atol=2e-2)

    def test_bigemma3_matryoshka(self, our_setup, batch):
        """Matryoshka truncation + renorm (modeling_bigemma.py:36-58)."""
        config, params = our_setup
        input_ids, attention_mask, _, pixel_values = batch
        model = BiGemma3(config, embedding_dim=16)
        out = np.asarray(
            model.apply(
                {"params": {"model": params["model"]}},
                jnp.asarray(input_ids),
                jnp.asarray(attention_mask),
                jnp.asarray(pixel_values.transpose(0, 2, 3, 1)),
            )
        )
        assert out.shape == (2, 16)
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)
