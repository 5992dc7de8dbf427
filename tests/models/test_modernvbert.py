"""ModernVBERT tests: ModernBERT text-encoder parity vs HF torch, plus
functional tests for the composed VLM (the reference composes hosted
SigLIP2/ettin checkpoints, so full-model parity requires downloads; all
submodules are verified independently)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from colpali_tpu.models.modernvbert import (  # noqa: E402
    BiModernVBert,
    ColModernVBert,
    DecoupledEmbed,
    ModernBertEncoder,
    ModernBertTextConfig,
    ModernVBertConfig,
    ModernVBertForMaskedLM,
)
from colpali_tpu.models.configs import SiglipVisionConfig  # noqa: E402


@pytest.fixture(scope="module")
def hf_modernbert():
    torch.manual_seed(0)
    cfg = transformers.ModernBertConfig(
        vocab_size=64,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        cls_token_id=3,
        sep_token_id=4,
        hidden_size=32,
        intermediate_size=48,
        num_hidden_layers=4,
        num_attention_heads=4,
        global_attn_every_n_layers=3,
        local_attention=4,  # small window so local != global
        global_rope_theta=160000.0,
        local_rope_theta=10000.0,
        norm_eps=1e-5,
    )
    return transformers.ModernBertModel(cfg).eval().float()


def _convert_modernbert(hf) -> dict:
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params: dict = {
        "emb_norm": {"scale": sd["embeddings.norm.weight"]},
        "final_norm": {"scale": sd["final_norm.weight"]},
    }
    n_layers = hf.config.num_hidden_layers
    h = hf.config.hidden_size
    for i in range(n_layers):
        qkv = sd[f"layers.{i}.attn.Wqkv.weight"]
        q, k, v = np.split(qkv, 3, axis=0)
        layer = {
            "attn": {
                "q_proj": {"kernel": q.T},
                "k_proj": {"kernel": k.T},
                "v_proj": {"kernel": v.T},
                "o_proj": {"kernel": sd[f"layers.{i}.attn.Wo.weight"].T},
            },
            "mlp_norm": {"scale": sd[f"layers.{i}.mlp_norm.weight"]},
            "Wi": {"kernel": sd[f"layers.{i}.mlp.Wi.weight"].T},
            "Wo": {"kernel": sd[f"layers.{i}.mlp.Wo.weight"].T},
        }
        if i > 0:
            layer["attn_norm"] = {"scale": sd[f"layers.{i}.attn_norm.weight"]}
        params[f"layers_{i}"] = layer
    return params, sd["embeddings.tok_embeddings.weight"]


class TestModernBertParity:
    @pytest.mark.parametrize("dtype64", [False, True])
    def test_encoder_forward(self, hf_modernbert, dtype64):
        cfg = ModernBertTextConfig.from_hf_config(hf_modernbert.config.to_dict())
        params, embed_w = _convert_modernbert(hf_modernbert)
        rng = np.random.default_rng(0)
        input_ids = rng.integers(1, 60, size=(2, 10)).astype(np.int64)
        attention_mask = np.ones((2, 10), np.int64)
        attention_mask[1, -2:] = 0

        hf = hf_modernbert.double() if dtype64 else hf_modernbert.float()
        with torch.no_grad():
            expected = hf(
                input_ids=torch.tensor(input_ids), attention_mask=torch.tensor(attention_mask)
            ).last_hidden_state.numpy()
        hf_modernbert.float()

        embeds = embed_w[input_ids]
        jdt = jnp.float64 if dtype64 else jnp.float32
        if dtype64:
            jax.config.update("jax_enable_x64", True)
        try:
            p = jax.tree.map(lambda x: np.asarray(x).astype(np.float64), params) if dtype64 else params
            enc = ModernBertEncoder(cfg, dtype=jdt, param_dtype=jdt)
            got = np.asarray(
                enc.apply({"params": p}, jnp.asarray(embeds.astype(np.float64 if dtype64 else np.float32)),
                          jnp.asarray(attention_mask))
            )
        finally:
            if dtype64:
                jax.config.update("jax_enable_x64", False)
        valid = attention_mask.astype(bool)
        tol = 1e-5 if dtype64 else 2e-2
        np.testing.assert_allclose(got[valid], expected[valid], rtol=tol, atol=tol)


@pytest.fixture(scope="module")
def tiny_vbert_config():
    return ModernVBertConfig(
        vision=SiglipVisionConfig(hidden_size=16, intermediate_size=32, num_hidden_layers=1,
                                  num_attention_heads=2, image_size=16, patch_size=4),
        text=ModernBertTextConfig(vocab_size=64, hidden_size=24, intermediate_size=32,
                                  num_hidden_layers=2, num_attention_heads=2, local_attention=4),
        pixel_shuffle_factor=2,
        additional_vocab_size=8,
        image_token_id=60,
    )


class TestDecoupledEmbed:
    def test_routing(self):
        emb = DecoupledEmbed(vocab_size=10, additional_vocab_size=4, features=6)
        params = emb.init(jax.random.PRNGKey(0), jnp.zeros((1, 2), jnp.int32))["params"]
        ids = jnp.asarray([[3, 11]])  # base id 3, additional id 11->1
        out = emb.apply({"params": params}, ids)
        np.testing.assert_allclose(
            np.asarray(out[0, 0]), np.asarray(params["tok_embeddings"]["embedding"][3]), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(out[0, 1]), np.asarray(params["additional_embedding"]["embedding"][1]), rtol=1e-6
        )


class TestModernVBertComposition:
    def test_col_forward_shapes_and_norms(self, tiny_vbert_config):
        cfg = tiny_vbert_config
        rng = np.random.default_rng(1)
        n_img = cfg.image_seq_len  # (16/4 / 2)^2 = 4
        input_ids = rng.integers(1, 50, size=(2, n_img + 4)).astype(np.int32)
        input_ids[:, :n_img] = cfg.image_token_id
        attention_mask = np.ones_like(input_ids)
        pixel_values = rng.normal(size=(2, 1, 16, 16, 3)).astype(np.float32)

        model = ColModernVBert(cfg, dim=8)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(input_ids),
                               jnp.asarray(attention_mask), jnp.asarray(pixel_values))
        out = np.asarray(model.apply(variables, jnp.asarray(input_ids), jnp.asarray(attention_mask),
                                     jnp.asarray(pixel_values)))
        assert out.shape == (2, n_img + 4, 8)
        norms = np.linalg.norm(out, axis=-1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-4)

    def test_bi_and_mlm_heads(self, tiny_vbert_config):
        cfg = tiny_vbert_config
        rng = np.random.default_rng(2)
        input_ids = rng.integers(1, 50, size=(2, 6)).astype(np.int32)
        attention_mask = np.ones_like(input_ids)

        bi = BiModernVBert(cfg)
        v = bi.init(jax.random.PRNGKey(0), jnp.asarray(input_ids), jnp.asarray(attention_mask))
        out = np.asarray(bi.apply(v, jnp.asarray(input_ids), jnp.asarray(attention_mask)))
        assert out.shape == (2, cfg.text.hidden_size)

        mlm = ModernVBertForMaskedLM(cfg)
        v = mlm.init(jax.random.PRNGKey(0), jnp.asarray(input_ids), jnp.asarray(attention_mask))
        logits = np.asarray(mlm.apply(v, jnp.asarray(input_ids), jnp.asarray(attention_mask)))
        assert logits.shape == (2, 6, cfg.text.vocab_size + cfg.additional_vocab_size)
