"""Numerical parity: our flax Qwen3-VL (deepstack + interleaved M-RoPE) vs HF
torch (tiny random model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from colpali_tpu.core.hf_loader import (  # noqa: E402
    QWEN2_VL_KEY_REMAPS,
    QWEN3_VL_RULES,
    convert_state_dict,
    normalize_keys,
    split_fused_qkv,
)
from colpali_tpu.models.qwen3_vl import (  # noqa: E402
    Qwen3VLBackbone,
    Qwen3VLConfig,
    pos_embed_interp_indices,
)
from colpali_tpu.processors.qwen2_vl import patchify, vision_positions  # noqa: E402

IMAGE_TOKEN = 9
VISION_START = 7


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    cfg = transformers.Qwen3VLConfig(
        vision_config=dict(
            depth=3,
            hidden_size=32,
            num_heads=4,
            intermediate_size=64,
            out_hidden_size=48,
            patch_size=2,
            temporal_patch_size=2,
            spatial_merge_size=2,
            num_position_embeddings=16,  # 4x4 grid -> interpolation exercised
            deepstack_visual_indexes=[0, 1],
            in_channels=3,
        ),
        text_config=dict(
            vocab_size=64,
            hidden_size=48,
            intermediate_size=96,
            num_hidden_layers=3,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=12,
            rope_theta=5000000.0,
            rms_norm_eps=1e-6,
            rope_scaling={"rope_type": "default", "mrope_section": [2, 2, 2], "mrope_interleaved": True},
        ),
        image_token_id=IMAGE_TOKEN,
        video_token_id=10,
        vision_start_token_id=VISION_START,
        vision_end_token_id=8,
    )
    return transformers.Qwen3VLModel(cfg).eval().float()


@pytest.fixture(scope="module")
def our_setup(hf_model):
    config = Qwen3VLConfig.from_hf_config(hf_model.config.to_dict())
    state = split_fused_qkv(normalize_keys(hf_model.state_dict(), QWEN2_VL_KEY_REMAPS))
    params = convert_state_dict(state, QWEN3_VL_RULES, ())
    return config, params


def _build(rng, shapes, config):
    flats, grids = [], []
    for h, w in shapes:
        img = rng.normal(size=(3, h, w)).astype(np.float32)
        flat, grid = patchify(img, patch_size=2, temporal_patch_size=2, merge_size=2)
        flats.append(flat)
        grids.append(grid)
    rows = []
    for t, h, w in grids:
        n_merged = t * (h // 2) * (w // 2)
        rows.append([VISION_START] + [IMAGE_TOKEN] * n_merged + [8] + list(rng.integers(11, 60, size=3)))
    s = max(len(r) for r in rows)
    b = len(rows)
    input_ids = np.zeros((b, s), np.int64)
    attention_mask = np.zeros((b, s), np.int64)
    for i, r in enumerate(rows):
        input_ids[i, s - len(r):] = r
        attention_mask[i, s - len(r):] = 1

    p_max = ((max(f.shape[0] for f in flats) + 3) // 4) * 4
    pixel_values = np.zeros((b, p_max, flats[0].shape[1]), np.float32)
    patch_mask = np.zeros((b, p_max), bool)
    hpos = np.zeros((b, p_max), np.int32)
    wpos = np.zeros((b, p_max), np.int32)
    pos_idx = np.zeros((b, p_max, 4), np.int32)
    pos_wgt = np.zeros((b, p_max, 4), np.float32)
    for i, (f, g) in enumerate(zip(flats, grids)):
        n = f.shape[0]
        pixel_values[i, :n] = f
        patch_mask[i, :n] = True
        hp, wp = vision_positions(g, 2)
        hpos[i, :n] = hp
        wpos[i, :n] = wp
        pi, pw = pos_embed_interp_indices(g, config.vision.num_grid_per_side, 2)
        pos_idx[i, :n] = pi
        pos_wgt[i, :n] = pw
    return flats, grids, input_ids, attention_mask, pixel_values, patch_mask, hpos, wpos, pos_idx, pos_wgt


class TestQwen3VLParity:
    @pytest.mark.parametrize("dtype64", [False, True])
    def test_multimodal_forward(self, hf_model, our_setup, dtype64):
        config, params = our_setup
        rng = np.random.default_rng(0)
        (flats, grids, input_ids, attention_mask, pixel_values, patch_mask,
         hpos, wpos, pos_idx, pos_wgt) = _build(rng, [(8, 12), (8, 8)], config)

        # positions from the HF model itself (Qwen3-VL's own get_rope_index)
        hf_pos, _ = hf_model.get_rope_index(
            torch.tensor(input_ids),
            torch.tensor(np.asarray(grids, np.int64)),
            None,
            attention_mask=torch.tensor(attention_mask),
        )
        position_ids = hf_pos.numpy()

        hf = hf_model.double() if dtype64 else hf_model.float()
        tdt = torch.float64 if dtype64 else torch.float32
        with torch.no_grad():
            expected = hf(
                input_ids=torch.tensor(input_ids),
                attention_mask=torch.tensor(attention_mask),
                pixel_values=torch.tensor(np.concatenate(flats), dtype=tdt),
                image_grid_thw=torch.tensor(np.asarray(grids, np.int64)),
            ).last_hidden_state.numpy()
        hf_model.float()

        jdt = jnp.float64 if dtype64 else jnp.float32
        if dtype64:
            jax.config.update("jax_enable_x64", True)
        try:
            p = jax.tree.map(lambda x: np.asarray(x).astype(np.float64), params) if dtype64 else params
            backbone = Qwen3VLBackbone(config, dtype=jdt, param_dtype=jdt)
            got = np.asarray(
                backbone.apply(
                    {"params": p["model"]},
                    jnp.asarray(input_ids),
                    jnp.asarray(attention_mask),
                    pixel_values=jnp.asarray(pixel_values.astype(np.float64 if dtype64 else np.float32)),
                    vision_hpos=jnp.asarray(hpos),
                    vision_wpos=jnp.asarray(wpos),
                    patch_mask=jnp.asarray(patch_mask),
                    pos_idx=jnp.asarray(pos_idx),
                    pos_weight=jnp.asarray(pos_wgt),
                    position_ids=jnp.asarray(position_ids),
                )
            )
        finally:
            if dtype64:
                jax.config.update("jax_enable_x64", False)
        valid = attention_mask.astype(bool)
        tol = 1e-5 if dtype64 else 2e-2
        np.testing.assert_allclose(got[valid], expected[valid], rtol=tol, atol=tol)

    def test_text_only(self, hf_model, our_setup):
        config, params = our_setup
        rng = np.random.default_rng(1)
        input_ids = rng.integers(11, 60, size=(2, 7)).astype(np.int64)
        attention_mask = np.ones((2, 7), np.int64)
        with torch.no_grad():
            expected = hf_model(
                input_ids=torch.tensor(input_ids), attention_mask=torch.tensor(attention_mask)
            ).last_hidden_state.numpy()
        backbone = Qwen3VLBackbone(config)
        got = np.asarray(
            backbone.apply({"params": params["model"]}, jnp.asarray(input_ids), jnp.asarray(attention_mask))
        )
        np.testing.assert_allclose(got, expected, rtol=2e-2, atol=2e-2)
