"""Numerical parity: our flax PaliGemma/ColPali vs the HF torch reference.

Strategy (stronger than the reference's, which needs checkpoint downloads —
tests/models/paligemma/colpali/test_modeling_colpali.py is @slow): build a
TINY random HF PaliGemmaForConditionalGeneration from a config, convert its
state dict with our loader, and require fp32 forward agreement. Hermetic, no
network, runs in CI.
"""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from colpali_tpu.core.hf_loader import (  # noqa: E402
    PALIGEMMA_KEY_REMAPS,
    PALIGEMMA_RULES,
    convert_state_dict,
    normalize_keys,
)
from colpali_tpu.models.configs import PaliGemmaConfig  # noqa: E402
from colpali_tpu.models.paligemma import BiPali, ColPali, PaliGemmaBackbone  # noqa: E402

VOCAB = 99
IMAGE_TOKEN = 97
NUM_PATCHES = 4  # 28/14 = 2x2


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    cfg = transformers.PaliGemmaConfig(
        vision_config=dict(
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            image_size=28,
            patch_size=14,
            projection_dim=32,
        ),
        text_config=dict(
            vocab_size=VOCAB,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=8,
        ),
        image_token_index=IMAGE_TOKEN,
        projection_dim=32,
    )
    model = transformers.PaliGemmaForConditionalGeneration(cfg)
    model = model.eval().float()
    return model


@pytest.fixture(scope="module")
def our_setup(hf_model):
    config = PaliGemmaConfig.from_hf_config(hf_model.config.to_dict())
    params = convert_state_dict(hf_model.state_dict(), PALIGEMMA_RULES, PALIGEMMA_KEY_REMAPS)
    return config, params


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    b, s = 2, 12
    input_ids = rng.integers(1, 90, size=(b, s)).astype(np.int32)
    input_ids[:, :NUM_PATCHES] = IMAGE_TOKEN
    attention_mask = np.ones((b, s), np.int32)
    attention_mask[1, -3:] = 0  # right padding on row 1
    input_ids[1, -3:] = 0
    pixel_values = rng.normal(size=(b, 3, 28, 28)).astype(np.float32)
    return input_ids, attention_mask, pixel_values


def _hf_hidden(hf_model, batch):
    input_ids, attention_mask, pixel_values = batch
    with torch.no_grad():
        out = hf_model.model(
            input_ids=torch.tensor(input_ids, dtype=torch.long),
            attention_mask=torch.tensor(attention_mask, dtype=torch.long),
            pixel_values=torch.tensor(pixel_values),
        )
    return out.last_hidden_state.numpy()


class TestBackboneParity:
    """fp32 forwards agree to ~1e-2 on this host because XLA-CPU uses
    approximate transcendentals (tanh off by ~4e-5 per call, accumulating
    through layers). Bit-level exactness is established by
    ``test_float64_exact`` (maxdiff ~3e-7 in f64, where XLA uses precise
    libm)."""

    def test_float64_exact(self, hf_model, our_setup, batch):
        import jax

        config, params = our_setup
        input_ids, attention_mask, pixel_values = batch
        hf64 = hf_model.double()
        with torch.no_grad():
            expected = (
                hf64.model(
                    input_ids=torch.tensor(input_ids, dtype=torch.long),
                    attention_mask=torch.tensor(attention_mask, dtype=torch.long),
                    pixel_values=torch.tensor(pixel_values, dtype=torch.float64),
                )
                .last_hidden_state.numpy()
            )
        hf_model.float()  # restore for other tests
        jax.config.update("jax_enable_x64", True)
        try:
            params64 = jax.tree.map(lambda x: np.asarray(x).astype(np.float64), params)
            backbone = PaliGemmaBackbone(config, dtype=jnp.float64, param_dtype=jnp.float64)
            got = np.asarray(
                backbone.apply(
                    {"params": params64["model"]},
                    jnp.asarray(input_ids),
                    jnp.asarray(attention_mask),
                    jnp.asarray(pixel_values.transpose(0, 2, 3, 1).astype(np.float64)),
                )
            )
        finally:
            jax.config.update("jax_enable_x64", False)
        valid = attention_mask.astype(bool)
        np.testing.assert_allclose(got[valid], expected[valid], rtol=1e-5, atol=1e-5)

    def test_multimodal_forward(self, hf_model, our_setup, batch):
        config, params = our_setup
        input_ids, attention_mask, pixel_values = batch
        expected = _hf_hidden(hf_model, batch)

        backbone = PaliGemmaBackbone(config)
        got = backbone.apply(
            {"params": params["model"]},
            jnp.asarray(input_ids),
            jnp.asarray(attention_mask),
            jnp.asarray(pixel_values.transpose(0, 2, 3, 1)),  # NCHW -> NHWC
        )
        got = np.asarray(got)
        # padding rows differ (HF computes garbage there too but masks later)
        valid = attention_mask.astype(bool)
        np.testing.assert_allclose(got[valid], expected[valid], rtol=2e-2, atol=2e-2)

    def test_text_only_forward(self, hf_model, our_setup):
        config, params = our_setup
        rng = np.random.default_rng(1)
        input_ids = rng.integers(1, 90, size=(2, 7)).astype(np.int32)
        attention_mask = np.ones((2, 7), np.int32)
        attention_mask[0, -2:] = 0

        with torch.no_grad():
            expected = (
                hf_model.model(
                    input_ids=torch.tensor(input_ids, dtype=torch.long),
                    attention_mask=torch.tensor(attention_mask, dtype=torch.long),
                )
                .last_hidden_state.numpy()
            )
        backbone = PaliGemmaBackbone(config)
        got = np.asarray(
            backbone.apply({"params": params["model"]}, jnp.asarray(input_ids), jnp.asarray(attention_mask))
        )
        valid = attention_mask.astype(bool)
        np.testing.assert_allclose(got[valid], expected[valid], rtol=2e-2, atol=2e-2)


class TestColPaliParity:
    def test_full_embedding_output(self, hf_model, our_setup, batch):
        """End-to-end ColPali semantics: proj -> L2 norm -> mask (the
        reference forward, modeling_colpali.py:59-78) applied to the HF
        backbone must equal our ColPali module output."""
        config, params = our_setup
        input_ids, attention_mask, pixel_values = batch

        head = torch.nn.Linear(32, 16)
        head = head.float()
        hidden = torch.tensor(_hf_hidden(hf_model, batch))
        with torch.no_grad():
            proj = head(hidden)
            proj = proj / proj.norm(dim=-1, keepdim=True)
            expected = (proj * torch.tensor(attention_mask)[..., None]).numpy()

        params = dict(params)
        params["head"] = {
            "custom_text_proj": {
                "kernel": jnp.asarray(head.weight.detach().numpy().T),
                "bias": jnp.asarray(head.bias.detach().numpy()),
            }
        }
        model = ColPali(config, dim=16)
        got = np.asarray(
            model.apply(
                {"params": params},
                jnp.asarray(input_ids),
                jnp.asarray(attention_mask),
                jnp.asarray(pixel_values.transpose(0, 2, 3, 1)),
            )
        )
        np.testing.assert_allclose(got, expected, rtol=2e-2, atol=2e-2)

    def test_param_tree_matches_init(self, our_setup, batch):
        """Converted checkpoint tree must exactly match flax init structure."""
        import jax

        config, params = our_setup
        input_ids, attention_mask, pixel_values = batch
        model = ColPali(config, dim=16)
        init = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(input_ids),
            jnp.asarray(attention_mask),
            jnp.asarray(pixel_values.transpose(0, 2, 3, 1)),
        )["params"]
        init_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(init)}
        # head dim differs (16 vs converted none) - conversion has no head for
        # a plain PaliGemma checkpoint, so compare backbone subtree only
        conv_paths = {
            jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_leaves_with_path({"model": params["model"]})
        }
        backbone_init_paths = {p for p in init_paths if p.startswith("['model']")}
        assert conv_paths == backbone_init_paths


class TestBiPaliParity:
    def test_mean_pooling(self, hf_model, our_setup, batch):
        """BiPali = mean-pool over attention mask + L2 norm
        (modeling_bipali.py:71-84)."""
        config, params = our_setup
        input_ids, attention_mask, pixel_values = batch
        hidden = _hf_hidden(hf_model, batch)
        mask = attention_mask[..., None].astype(np.float32)
        pooled = (hidden * mask).sum(1) / mask.sum(1)
        expected = pooled / np.linalg.norm(pooled, axis=-1, keepdims=True)

        model = BiPali(config)
        got = np.asarray(
            model.apply(
                {"params": {"model": params["model"]}},
                jnp.asarray(input_ids),
                jnp.asarray(attention_mask),
                jnp.asarray(pixel_values.transpose(0, 2, 3, 1)),
            )
        )
        np.testing.assert_allclose(got, expected, rtol=2e-2, atol=2e-2)


class TestKeyRemaps:
    """Mirrors the reference's checkpoint key-mapping regression tests
    (tests/models/test_checkpoint_key_mappings.py) with synthetic keys."""

    def test_lora_merged_prefix(self):
        sd = {"base_model.model.custom_text_proj.weight": np.zeros((2, 2))}
        out = normalize_keys(sd, PALIGEMMA_KEY_REMAPS)
        assert "custom_text_proj.weight" in out

    def test_transformers_v4_nesting(self):
        sd = {"model.language_model.model.layers.0.mlp.gate_proj.weight": np.zeros((2, 2))}
        out = normalize_keys(sd, PALIGEMMA_KEY_REMAPS)
        assert "model.language_model.layers.0.mlp.gate_proj.weight" in out

    def test_lm_head_moved(self):
        sd = {"model.language_model.lm_head.weight": np.zeros((2, 2))}
        out = normalize_keys(sd, PALIGEMMA_KEY_REMAPS)
        assert "lm_head.weight" in out

    def test_unmerged_lora_dropped(self):
        sd = {"model.language_model.layers.0.self_attn.q_proj.lora_A.weight": np.zeros((2, 2))}
        out = normalize_keys(sd, PALIGEMMA_KEY_REMAPS)
        assert out == {}

    def test_unmatched_key_raises(self):
        with pytest.raises(ValueError, match="Unmatched"):
            convert_state_dict({"totally.unknown.key": np.zeros(2)}, PALIGEMMA_RULES)
