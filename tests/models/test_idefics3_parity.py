"""Numerical parity: our flax Idefics3/SmolVLM vs HF torch (tiny random)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from colpali_tpu.core.hf_loader import (  # noqa: E402
    IDEFICS3_KEY_REMAPS,
    IDEFICS3_RULES,
    convert_state_dict,
    normalize_keys,
)
from colpali_tpu.models.idefics3 import ColIdefics3, Idefics3Backbone, Idefics3Config, pixel_shuffle  # noqa: E402

IMAGE_TOKEN = 57


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    cfg = transformers.Idefics3Config(
        vision_config=dict(
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            image_size=32,
            patch_size=8,
        ),
        text_config=dict(
            vocab_size=64,
            hidden_size=48,
            intermediate_size=96,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            rope_theta=100000.0,
            rms_norm_eps=1e-6,
        ),
        scale_factor=2,
        image_token_id=IMAGE_TOKEN,
    )
    return transformers.Idefics3Model(cfg).eval().float()


@pytest.fixture(scope="module")
def our_setup(hf_model):
    config = Idefics3Config.from_hf_config(hf_model.config.to_dict())
    params = convert_state_dict(hf_model.state_dict(), IDEFICS3_RULES, IDEFICS3_KEY_REMAPS)
    return config, params


@pytest.fixture(scope="module")
def batch(our_setup):
    config, _ = our_setup
    rng = np.random.default_rng(0)
    b, tiles = 2, 2
    seq_per_tile = config.image_seq_len  # (32/8 / 2)^2 = 4
    n_img = tiles * seq_per_tile
    s = n_img + 5
    input_ids = rng.integers(1, 50, size=(b, s)).astype(np.int64)
    input_ids[:, 1 : 1 + n_img] = IMAGE_TOKEN
    attention_mask = np.ones((b, s), np.int64)
    pixel_values = rng.normal(size=(b, tiles, 3, 32, 32)).astype(np.float32)
    return input_ids, attention_mask, pixel_values


class TestPixelShuffle:
    def test_matches_hf(self, hf_model):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 16, 8)).astype(np.float32)
        expected = hf_model.connector.pixel_shuffle(torch.tensor(x), 2).numpy()
        got = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
        np.testing.assert_allclose(got, expected, rtol=1e-6)


class TestIdefics3Parity:
    @pytest.mark.parametrize("dtype64", [False, True])
    def test_multimodal_forward(self, hf_model, our_setup, batch, dtype64):
        config, params = our_setup
        input_ids, attention_mask, pixel_values = batch

        hf = hf_model.double() if dtype64 else hf_model.float()
        tdt = torch.float64 if dtype64 else torch.float32
        with torch.no_grad():
            expected = hf(
                input_ids=torch.tensor(input_ids),
                attention_mask=torch.tensor(attention_mask),
                pixel_values=torch.tensor(pixel_values, dtype=tdt),
            ).last_hidden_state.numpy()
        hf_model.float()

        jdt = jnp.float64 if dtype64 else jnp.float32
        if dtype64:
            jax.config.update("jax_enable_x64", True)
        try:
            p = jax.tree.map(lambda x: np.asarray(x).astype(np.float64), params) if dtype64 else params
            backbone = Idefics3Backbone(config, dtype=jdt, param_dtype=jdt)
            got = np.asarray(
                backbone.apply(
                    {"params": p["model"]},
                    jnp.asarray(input_ids),
                    jnp.asarray(attention_mask),
                    jnp.asarray(pixel_values.transpose(0, 1, 3, 4, 2)),  # NCHW->NHWC per tile
                    jnp.ones(pixel_values.shape[:2], bool),
                )
            )
        finally:
            if dtype64:
                jax.config.update("jax_enable_x64", False)
        tol = 1e-5 if dtype64 else 2e-2
        np.testing.assert_allclose(got, expected, rtol=tol, atol=tol)

    def test_text_only(self, hf_model, our_setup):
        config, params = our_setup
        rng = np.random.default_rng(2)
        input_ids = rng.integers(1, 50, size=(2, 6)).astype(np.int64)
        attention_mask = np.ones((2, 6), np.int64)
        with torch.no_grad():
            expected = hf_model(
                input_ids=torch.tensor(input_ids), attention_mask=torch.tensor(attention_mask)
            ).last_hidden_state.numpy()
        backbone = Idefics3Backbone(config)
        got = np.asarray(
            backbone.apply({"params": params["model"]}, jnp.asarray(input_ids), jnp.asarray(attention_mask))
        )
        np.testing.assert_allclose(got, expected, rtol=2e-2, atol=2e-2)

    def test_colidefics3_head_named_linear(self, our_setup, batch):
        config, params = our_setup
        input_ids, attention_mask, pixel_values = batch
        model = ColIdefics3(config, dim=16)
        init = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(input_ids),
            jnp.asarray(attention_mask),
            jnp.asarray(pixel_values.transpose(0, 1, 3, 4, 2)),
        )["params"]
        assert "linear" in init["head"]
        out = model.apply(
            {"params": init},
            jnp.asarray(input_ids),
            jnp.asarray(attention_mask),
            jnp.asarray(pixel_values.transpose(0, 1, 3, 4, 2)),
        )
        assert out.shape == (2, input_ids.shape[1], 16)
