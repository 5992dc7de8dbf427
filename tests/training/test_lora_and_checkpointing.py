"""LoRA adapter + checkpointing tests."""


import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colpali_tpu.losses import ColbertLoss
from colpali_tpu.models.configs import GemmaConfig, PaliGemmaConfig, SiglipVisionConfig
from colpali_tpu.models.paligemma import ColPali
from colpali_tpu.training.checkpointing import (
    CheckpointManager,
    load_params_safetensors,
    save_params_safetensors,
)
from colpali_tpu.training.lora import count_params, init_lora_params, make_lora_train_step, merge_lora
from colpali_tpu.training.trainer import TrainConfig, create_train_state, make_train_step

IMAGE_TOKEN = 2


@pytest.fixture(scope="module")
def tiny():
    cfg = PaliGemmaConfig(
        vision=SiglipVisionConfig(hidden_size=16, intermediate_size=32, num_hidden_layers=1,
                                  num_attention_heads=2, image_size=28, patch_size=14),
        text=GemmaConfig(vocab_size=32, hidden_size=16, intermediate_size=32, num_hidden_layers=1,
                         num_attention_heads=2, num_key_value_heads=1, head_dim=8),
        projection_dim=16, image_token_index=IMAGE_TOKEN)
    model = ColPali(cfg, dim=8)
    rng = np.random.default_rng(0)
    ids = np.concatenate([np.full((2, 4), IMAGE_TOKEN), rng.integers(3, 30, size=(2, 5))], 1).astype(np.int32)
    batch = {
        "query_input_ids": jnp.asarray(rng.integers(3, 30, size=(2, 8)), jnp.int32),
        "query_attention_mask": jnp.ones((2, 8), jnp.int32),
        "doc_input_ids": jnp.asarray(ids),
        "doc_attention_mask": jnp.ones((2, 9), jnp.int32),
        "doc_pixel_values": jnp.asarray(rng.normal(size=(2, 28, 28, 3)), jnp.float32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["doc_input_ids"], batch["doc_attention_mask"],
                        batch["doc_pixel_values"])["params"]
    return model, params, batch


class TestLoRA:
    def test_init_targets_lm_and_head(self, tiny):
        _, params, _ = tiny
        lora = init_lora_params(params, jax.random.PRNGKey(1), rank=4)
        assert any("custom_text_proj" in k for k in lora)
        assert any("language_model" in k for k in lora)
        assert not any("vision_tower" in k for k in lora)
        # adapters are tiny compared to the base
        assert count_params(lora) < 0.2 * count_params(params)

    def test_zero_b_means_identity(self, tiny):
        _, params, _ = tiny
        lora = init_lora_params(params, jax.random.PRNGKey(1), rank=4)
        merged = merge_lora(params, lora, alpha=4, rank=4)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(merged)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    def test_lora_training_moves_loss(self, tiny):
        model, params, batch = tiny
        lora = init_lora_params(params, jax.random.PRNGKey(1), rank=4)
        loss_obj = ColbertLoss(temperature=0.1)

        def loss_forward(p, b):
            q = model.apply({"params": p}, b["query_input_ids"], b["query_attention_mask"])
            d = model.apply({"params": p}, b["doc_input_ids"], b["doc_attention_mask"], b["doc_pixel_values"])
            return loss_obj(q, d)

        # base_params is an ARGUMENT of the jitted step (closing over it
        # would serialize the base tree as a jit constant — the axon trap)
        lora_loss = make_lora_train_step(loss_forward, alpha=4, rank=4)
        grad_fn = jax.jit(jax.value_and_grad(lora_loss))
        l0, grads = grad_fn(lora, params, batch)
        assert np.isfinite(float(l0))
        # adapter-only updates: grads have exactly the adapter structure
        assert jax.tree.structure(grads) == jax.tree.structure(lora)
        # one SGD step on the adapters must change the loss
        lora2 = jax.tree.map(lambda p, g: p - 0.5 * g, lora, grads)
        l1, _ = grad_fn(lora2, params, batch)
        assert float(l1) != float(l0)

    def test_dropout_masks_adapter_rows(self, tiny):
        _, params, _ = tiny
        lora = init_lora_params(params, jax.random.PRNGKey(1), rank=4)
        # make B nonzero so the delta is visible
        lora = jax.tree.map(lambda x: jnp.ones_like(x) * 0.1, lora)
        base = merge_lora(params, lora, alpha=4, rank=4)
        # no rng -> deterministic merge, identical to dropout=0
        same = merge_lora(params, lora, alpha=4, rank=4, dropout=0.5)
        for a, b in zip(jax.tree.leaves(base), jax.tree.leaves(same)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # with rng, the merged weights differ (rows dropped + rescaled)...
        dropped = merge_lora(
            params, lora, alpha=4, rank=4, dropout=0.5, dropout_rng=jax.random.PRNGKey(2)
        )
        diffs = [
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(base), jax.tree.leaves(dropped))
        ]
        assert any(diffs)
        # ...but are reproducible for the same rng (crc32 path folding)
        dropped2 = merge_lora(
            params, lora, alpha=4, rank=4, dropout=0.5, dropout_rng=jax.random.PRNGKey(2)
        )
        for a, b in zip(jax.tree.leaves(dropped), jax.tree.leaves(dropped2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestCheckpointing:
    def test_safetensors_roundtrip(self, tiny, tmp_path):
        _, params, _ = tiny
        path = str(tmp_path / "model.safetensors")
        save_params_safetensors(params, path)
        restored = load_params_safetensors(path)
        for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(params), key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(restored), key=lambda t: str(t[0])),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_orbax_train_state_roundtrip(self, tiny, tmp_path):
        model, params, batch = tiny
        state = create_train_state(model.apply, params, TrainConfig(warmup_steps=0, learning_rate=1e-3))
        step = jax.jit(make_train_step(ColbertLoss(temperature=0.1)))
        state, _ = step(state, batch)

        mgr = CheckpointManager(str(tmp_path / "ckpt"), save_interval_steps=1)
        assert mgr.save(int(state.step), state)
        mgr.wait()

        template = create_train_state(model.apply, params, TrainConfig(warmup_steps=0, learning_rate=1e-3))
        restored = mgr.restore(template)
        assert int(restored.step) == int(state.step)
        np.testing.assert_array_equal(
            np.asarray(restored.params["head"]["custom_text_proj"]["kernel"]),
            np.asarray(state.params["head"]["custom_text_proj"]["kernel"]),
        )
        # training continues from the restored state
        restored, metrics = step(restored, batch)
        assert np.isfinite(float(metrics["loss"]))
        mgr.close()


class TestStackedLoRA:
    def test_scan_stacked_kernels_get_adapters(self):
        """scan_layers stacks LM kernels to (L, in, out); LoRA must adapt
        them per layer rather than silently skipping the whole LM."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        params = {
            "model": {"language_model": {"layers": {"layer": {"self_attn": {"q_proj": {
                "kernel": jnp.zeros((3, 8, 8))  # 3 stacked layers
            }}}}}},
            "head": {"custom_text_proj": {"kernel": jnp.zeros((8, 4))}},
        }
        lora = init_lora_params(params, jax.random.PRNGKey(0), rank=2)
        stacked = lora["model/language_model/layers/layer/self_attn/q_proj/kernel"]
        assert stacked["a"].shape == (3, 8, 2) and stacked["b"].shape == (3, 2, 8)
        # b starts at zero -> merge is identity
        merged = merge_lora(params, lora, alpha=2, rank=2)
        np.testing.assert_array_equal(
            np.asarray(merged["model"]["language_model"]["layers"]["layer"]["self_attn"]["q_proj"]["kernel"]),
            0.0,
        )
        # nonzero b produces a per-layer delta
        stacked["b"] = jnp.ones((3, 2, 8))
        merged = merge_lora(params, lora, alpha=2, rank=2)
        delta = np.asarray(merged["model"]["language_model"]["layers"]["layer"]["self_attn"]["q_proj"]["kernel"])
        assert np.abs(delta).sum() > 0 and not np.allclose(delta[0], delta[1])


class TestLoraTargetsPerFamily:
    """The DEFAULT pattern must adapt the LM projections AND the retrieval
    head for every family naming convention — idefics3 names its head
    "linear" (reference ColIdefics3) and ModernBERT's MLP is Wi/Wo."""

    def test_idefics3_targets(self):
        from colpali_tpu.models.idefics3 import ColIdefics3, Idefics3Config

        cfg = Idefics3Config.from_hf_dicts(
            vision=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=1,
                        num_attention_heads=4, image_size=32, patch_size=8),
            text=dict(vocab_size=64, hidden_size=48, intermediate_size=96,
                      num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2),
            scale_factor=2, image_token_id=3,
        ) if hasattr(Idefics3Config, "from_hf_dicts") else Idefics3Config.from_hf_config({
            "vision_config": dict(hidden_size=32, intermediate_size=64, num_hidden_layers=1,
                                  num_attention_heads=4, image_size=32, patch_size=8,
                                  num_channels=3),
            "text_config": dict(vocab_size=64, hidden_size=48, intermediate_size=96,
                                num_hidden_layers=1, num_attention_heads=4,
                                num_key_value_heads=2, rope_theta=100000.0,
                                rms_norm_eps=1e-6),
            "scale_factor": 2,
            "image_token_id": 3,
        })
        model = ColIdefics3(cfg, dim=8)
        n_img = cfg.image_seq_len
        ids = np.full((1, n_img + 2), 5, np.int32)
        ids[:, :n_img] = 3
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(ids), jnp.ones_like(jnp.asarray(ids)),
            jnp.zeros((1, 1, 32, 32, 3), jnp.float32),
        )["params"]
        lora = init_lora_params(params, jax.random.PRNGKey(1), rank=2)
        assert any("text_model" in k and "q_proj" in k for k in lora)
        assert any(k.endswith("head/linear/kernel") for k in lora)  # the head adapts
        assert not any("vision_model" in k for k in lora)

    def test_modernvbert_targets(self):
        from colpali_tpu.models.configs import SiglipVisionConfig
        from colpali_tpu.models.modernvbert import (
            ColModernVBert,
            ModernBertTextConfig,
            ModernVBertConfig,
        )

        cfg = ModernVBertConfig(
            vision=SiglipVisionConfig(hidden_size=16, intermediate_size=32, num_hidden_layers=1,
                                      num_attention_heads=2, image_size=16, patch_size=4),
            text=ModernBertTextConfig(vocab_size=64, hidden_size=24, intermediate_size=32,
                                      num_hidden_layers=2, num_attention_heads=2, local_attention=4),
            pixel_shuffle_factor=2,
            additional_vocab_size=8,
            image_token_id=60,
        )
        model = ColModernVBert(cfg, dim=8)
        n_img = cfg.image_seq_len
        ids = np.full((1, n_img + 2), 5, np.int32)
        ids[:, :n_img] = 60
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(ids), jnp.ones_like(jnp.asarray(ids)),
            jnp.zeros((1, 1, 16, 16, 3), jnp.float32),
        )["params"]
        lora = init_lora_params(params, jax.random.PRNGKey(1), rank=2)
        assert any("text_model" in k and "q_proj" in k for k in lora)
        assert any("text_model" in k and ("/Wi/" in k or "/Wo/" in k) for k in lora)
        assert any("custom_text_proj" in k for k in lora)
        assert not any("vision_model" in k for k in lora)
