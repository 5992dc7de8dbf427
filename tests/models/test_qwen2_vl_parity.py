"""Numerical parity: our flax Qwen2-VL vs the HF torch reference (tiny random
model, hermetic — same strategy as test_paligemma_parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from colpali_tpu.core.hf_loader import (  # noqa: E402
    QWEN2_VL_KEY_REMAPS,
    QWEN2_VL_RULES,
    convert_state_dict,
    normalize_keys,
    split_fused_qkv,
)
from colpali_tpu.models.qwen2_vl import ColQwen2, Qwen2VLBackbone, Qwen2VLConfig  # noqa: E402
from colpali_tpu.processors.qwen2_vl import get_rope_index, patchify, vision_positions  # noqa: E402

IMAGE_TOKEN = 9
VISION_START = 7
VISION_END = 8


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    cfg = transformers.Qwen2VLConfig(
        vision_config=dict(
            depth=2,
            embed_dim=32,
            num_heads=4,
            mlp_ratio=2.0,
            hidden_size=48,
            patch_size=2,
            temporal_patch_size=2,
            spatial_merge_size=2,
            in_channels=3,
        ),
        vocab_size=64,
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        rope_theta=1000000.0,
        rms_norm_eps=1e-6,
        rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
        image_token_id=IMAGE_TOKEN,
        video_token_id=10,
        vision_start_token_id=VISION_START,
        vision_end_token_id=VISION_END,
    )
    model = transformers.Qwen2VLModel(cfg).eval().float()
    return model


@pytest.fixture(scope="module")
def our_setup(hf_model):
    config = Qwen2VLConfig.from_hf_config(hf_model.config.to_dict())
    state = split_fused_qkv(normalize_keys(hf_model.state_dict(), QWEN2_VL_KEY_REMAPS))
    params = convert_state_dict(state, QWEN2_VL_RULES, ())
    return config, params


def _make_images(rng, shapes):
    """Patchified images + grids for given (h, w) pixel shapes."""
    flats, grids = [], []
    for h, w in shapes:
        img = rng.normal(size=(3, h, w)).astype(np.float32)
        flat, grid = patchify(img, patch_size=2, temporal_patch_size=2, merge_size=2)
        flats.append(flat)
        grids.append(grid)
    return flats, grids


def _build_batch(rng, flats, grids, trailing_text=3):
    """input_ids rows: [vision_start, <img>*n, vision_end, text...] with left
    padding to a common length."""
    b = len(flats)
    rows = []
    for t, h, w in grids:
        n_merged = t * (h // 2) * (w // 2)
        rows.append([VISION_START] + [IMAGE_TOKEN] * n_merged + [VISION_END] +
                    list(rng.integers(11, 60, size=trailing_text)))
    s = max(len(r) for r in rows)
    input_ids = np.zeros((b, s), np.int64)
    attention_mask = np.zeros((b, s), np.int64)
    for i, r in enumerate(rows):
        input_ids[i, s - len(r):] = r  # left padding
        attention_mask[i, s - len(r):] = 1
    return input_ids, attention_mask


def _our_vision_inputs(flats, grids):
    p_max = max(f.shape[0] for f in flats)
    p_max = ((p_max + 3) // 4) * 4
    b = len(flats)
    pixel_values = np.zeros((b, p_max, flats[0].shape[1]), np.float32)
    patch_mask = np.zeros((b, p_max), bool)
    hpos = np.zeros((b, p_max), np.int32)
    wpos = np.zeros((b, p_max), np.int32)
    for i, (f, g) in enumerate(zip(flats, grids)):
        n = f.shape[0]
        pixel_values[i, :n] = f
        patch_mask[i, :n] = True
        hp, wp = vision_positions(g, 2)
        hpos[i, :n] = hp
        wpos[i, :n] = wp
    return pixel_values, patch_mask, hpos, wpos


class TestQwen2VLParity:
    def test_multimodal_forward(self, hf_model, our_setup):
        config, params = our_setup
        rng = np.random.default_rng(0)
        shapes = [(8, 12), (8, 8)]  # different resolutions -> ragged patches
        flats, grids = _make_images(rng, shapes)
        input_ids, attention_mask = _build_batch(rng, flats, grids)

        with torch.no_grad():
            expected = hf_model(
                input_ids=torch.tensor(input_ids),
                attention_mask=torch.tensor(attention_mask),
                pixel_values=torch.tensor(np.concatenate(flats)),
                image_grid_thw=torch.tensor(np.asarray(grids, np.int64)),
            ).last_hidden_state.numpy()

        pixel_values, patch_mask, hpos, wpos = _our_vision_inputs(flats, grids)
        position_ids = get_rope_index(
            input_ids, attention_mask, np.asarray(grids, np.int64), IMAGE_TOKEN, VISION_START, 2
        )
        backbone = Qwen2VLBackbone(config)
        got = np.asarray(
            backbone.apply(
                {"params": params["model"]},
                jnp.asarray(input_ids),
                jnp.asarray(attention_mask),
                pixel_values=jnp.asarray(pixel_values),
                vision_hpos=jnp.asarray(hpos),
                vision_wpos=jnp.asarray(wpos),
                patch_mask=jnp.asarray(patch_mask),
                position_ids=jnp.asarray(position_ids),
            )
        )
        valid = attention_mask.astype(bool)
        np.testing.assert_allclose(got[valid], expected[valid], rtol=2e-2, atol=2e-2)

    def test_text_only_forward(self, hf_model, our_setup):
        config, params = our_setup
        rng = np.random.default_rng(1)
        input_ids = rng.integers(11, 60, size=(2, 7)).astype(np.int64)
        attention_mask = np.ones((2, 7), np.int64)
        attention_mask[0, :2] = 0  # left padding
        input_ids[0, :2] = 0

        with torch.no_grad():
            expected = hf_model(
                input_ids=torch.tensor(input_ids),
                attention_mask=torch.tensor(attention_mask),
            ).last_hidden_state.numpy()
        backbone = Qwen2VLBackbone(config)
        got = np.asarray(
            backbone.apply(
                {"params": params["model"]},
                jnp.asarray(input_ids),
                jnp.asarray(attention_mask),
            )
        )
        valid = attention_mask.astype(bool)
        np.testing.assert_allclose(got[valid], expected[valid], rtol=2e-2, atol=2e-2)

    def test_float64_exact(self, hf_model, our_setup):
        """Bit-level correctness in f64 (transcendental-approximation-free)."""
        config, params = our_setup
        rng = np.random.default_rng(2)
        flats, grids = _make_images(rng, [(8, 8)])
        input_ids, attention_mask = _build_batch(rng, flats, grids)

        hf64 = hf_model.double()
        with torch.no_grad():
            expected = hf64(
                input_ids=torch.tensor(input_ids),
                attention_mask=torch.tensor(attention_mask),
                pixel_values=torch.tensor(np.concatenate(flats), dtype=torch.float64),
                image_grid_thw=torch.tensor(np.asarray(grids, np.int64)),
            ).last_hidden_state.numpy()
        hf_model.float()

        pixel_values, patch_mask, hpos, wpos = _our_vision_inputs(flats, grids)
        position_ids = get_rope_index(
            input_ids, attention_mask, np.asarray(grids, np.int64), IMAGE_TOKEN, VISION_START, 2
        )
        jax.config.update("jax_enable_x64", True)
        try:
            params64 = jax.tree.map(lambda x: np.asarray(x).astype(np.float64), params)
            backbone = Qwen2VLBackbone(config, dtype=jnp.float64, param_dtype=jnp.float64)
            got = np.asarray(
                backbone.apply(
                    {"params": params64["model"]},
                    jnp.asarray(input_ids),
                    jnp.asarray(attention_mask),
                    pixel_values=jnp.asarray(pixel_values.astype(np.float64)),
                    vision_hpos=jnp.asarray(hpos),
                    vision_wpos=jnp.asarray(wpos),
                    patch_mask=jnp.asarray(patch_mask),
                    position_ids=jnp.asarray(position_ids),
                )
            )
        finally:
            jax.config.update("jax_enable_x64", False)
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)

    def test_colpali_style_head(self, hf_model, our_setup):
        """ColQwen2 = backbone + 128-d proj + L2 norm + mask
        (modeling_colqwen2.py:48-75)."""
        config, params = our_setup
        rng = np.random.default_rng(3)
        flats, grids = _make_images(rng, [(8, 8), (8, 8)])
        input_ids, attention_mask = _build_batch(rng, flats, grids)

        head = torch.nn.Linear(48, 16).float()
        with torch.no_grad():
            hidden = hf_model(
                input_ids=torch.tensor(input_ids),
                attention_mask=torch.tensor(attention_mask),
                pixel_values=torch.tensor(np.concatenate(flats)),
                image_grid_thw=torch.tensor(np.asarray(grids, np.int64)),
            ).last_hidden_state
            proj = head(hidden)
            proj = proj / proj.norm(dim=-1, keepdim=True)
            expected = (proj * torch.tensor(attention_mask)[..., None]).numpy()

        pixel_values, patch_mask, hpos, wpos = _our_vision_inputs(flats, grids)
        position_ids = get_rope_index(
            input_ids, attention_mask, np.asarray(grids, np.int64), IMAGE_TOKEN, VISION_START, 2
        )
        full_params = dict(params)
        full_params["head"] = {
            "custom_text_proj": {
                "kernel": jnp.asarray(head.weight.detach().numpy().T),
                "bias": jnp.asarray(head.bias.detach().numpy()),
            }
        }
        model = ColQwen2(config, dim=16)
        got = np.asarray(
            model.apply(
                {"params": full_params},
                jnp.asarray(input_ids),
                jnp.asarray(attention_mask),
                pixel_values=jnp.asarray(pixel_values),
                vision_hpos=jnp.asarray(hpos),
                vision_wpos=jnp.asarray(wpos),
                patch_mask=jnp.asarray(patch_mask),
                position_ids=jnp.asarray(position_ids),
            )
        )
        valid = attention_mask.astype(bool)
        np.testing.assert_allclose(got[valid], expected[valid], rtol=2e-2, atol=2e-2)


class TestGetRopeIndex:
    def test_matches_hf(self, hf_model):
        """Our numpy port vs HF get_rope_index on a mixed batch."""
        rng = np.random.default_rng(4)
        flats, grids = _make_images(rng, [(8, 12), (8, 8)])
        input_ids, attention_mask = _build_batch(rng, flats, grids)
        expected, _ = hf_model.get_rope_index(
            torch.tensor(input_ids),
            torch.tensor(np.asarray(grids, np.int64)),
            None,
            torch.tensor(attention_mask),
        )
        got = get_rope_index(
            input_ids, attention_mask, np.asarray(grids, np.int64), IMAGE_TOKEN, VISION_START, 2
        )
        np.testing.assert_array_equal(got, expected.numpy())
