"""Qwen2.5-Omni tests: audio encoder parity vs HF torch, composed model
functional checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from colpali_tpu.core.hf_loader import OMNI_AUDIO_RULES, convert_state_dict  # noqa: E402
from colpali_tpu.models.qwen_omni import (  # noqa: E402
    ColQwen2_5Omni,
    OmniAudioConfig,
    OmniAudioEncoder,
    QwenOmniConfig,
)

N_WINDOW = 4  # tiny windows: chunks of 8 mel frames -> 4 after cnn -> 2 tokens


@pytest.fixture(scope="module")
def hf_audio():
    torch.manual_seed(0)
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import (
        Qwen2_5OmniAudioEncoderConfig,
    )
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import Qwen2_5OmniAudioEncoder

    cfg = Qwen2_5OmniAudioEncoderConfig(
        num_mel_bins=16,
        d_model=32,
        encoder_layers=2,
        encoder_attention_heads=4,
        encoder_ffn_dim=64,
        n_window=N_WINDOW,
        max_source_positions=64,
        output_dim=24,
    )
    return Qwen2_5OmniAudioEncoder(cfg).eval().float()


class TestAudioEncoderParity:
    @pytest.mark.parametrize("dtype64", [False, True])
    def test_single_audio(self, hf_audio, dtype64):
        """One audio of 2.5 chunks (20 mel frames): full + full + tail."""
        cfg = OmniAudioConfig.from_hf_config(hf_audio.config.to_dict())
        params = convert_state_dict(hf_audio.state_dict(), OMNI_AUDIO_RULES, ())
        rng = np.random.default_rng(0)
        t = 20  # 2 full chunks of 8 + tail of 4
        mel = rng.normal(size=(16, t)).astype(np.float32)

        hf = hf_audio.double() if dtype64 else hf_audio.float()
        tdt = torch.float64 if dtype64 else torch.float32
        with torch.no_grad():
            aftercnn = torch.tensor([(t - 1) // 2 + 1])
            expected = hf(
                torch.tensor(mel, dtype=tdt)[None][0],  # (mel, T)
                feature_lens=torch.tensor([t]),
                aftercnn_lens=aftercnn,
            ).last_hidden_state.numpy()
        hf_audio.float()

        # our chunked layout: 3 chunks of 8 frames (last has 4 valid)
        chunk_len = 2 * N_WINDOW
        n_chunks = 3
        chunks = np.zeros((n_chunks, chunk_len, 16), np.float32)
        frame_mask = np.zeros((n_chunks, chunk_len), bool)
        for c in range(n_chunks):
            valid = min(chunk_len, t - c * chunk_len)
            chunks[c, :valid] = mel[:, c * chunk_len : c * chunk_len + valid].T
            frame_mask[c, :valid] = True

        jdt = jnp.float64 if dtype64 else jnp.float32
        if dtype64:
            jax.config.update("jax_enable_x64", True)
        try:
            p = jax.tree.map(lambda x: np.asarray(x).astype(np.float64), params) if dtype64 else params
            enc = OmniAudioEncoder(cfg, dtype=jdt, param_dtype=jdt)
            got = np.asarray(
                enc.apply({"params": p}, jnp.asarray(chunks.astype(np.float64 if dtype64 else np.float32)),
                          jnp.asarray(frame_mask))
            )
        finally:
            if dtype64:
                jax.config.update("jax_enable_x64", False)

        # valid tokens: floor(aftercnn/2) per chunk, chunks flattened in order
        valid_tokens = []
        for c in range(n_chunks):
            after = (int(frame_mask[c].sum()) - 1) // 2 + 1 if frame_mask[c].any() else 0
            valid_tokens.append(after // 2)
        flat = got.reshape(-1, got.shape[-1])
        ours = np.concatenate(
            [flat[c * (chunk_len // 4) : c * (chunk_len // 4) + v] for c, v in enumerate(valid_tokens)]
        )
        tol = 1e-5 if dtype64 else 2e-3
        np.testing.assert_allclose(ours, expected, rtol=tol, atol=tol)


class TestColQwenOmni:
    def test_audio_document_forward(self):
        """End-to-end: audio doc -> merged thinker -> 128-d embeddings."""
        from colpali_tpu.models.qwen2_5_vl import Qwen25VLVisionConfig
        from colpali_tpu.models.qwen2_vl import Qwen2TextConfig

        cfg = QwenOmniConfig(
            audio=OmniAudioConfig(num_mel_bins=16, d_model=32, encoder_layers=1,
                                  encoder_attention_heads=4, encoder_ffn_dim=64, n_window=N_WINDOW,
                                  max_source_positions=64, output_dim=48),
            vision=Qwen25VLVisionConfig(depth=1, hidden_size=32, num_heads=4, intermediate_size=64,
                                        out_hidden_size=48, patch_size=2, window_size=8,
                                        fullatt_block_indexes=(0,)),
            text=Qwen2TextConfig(vocab_size=64, hidden_size=48, intermediate_size=96,
                                 num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
                                 head_dim=12, mrope_section=(2, 2, 2)),
            audio_token_id=5,
        )
        rng = np.random.default_rng(1)
        # 1 audio of 2 full chunks -> 2 * 2 = 4 audio tokens
        chunks = rng.normal(size=(1, 2, 2 * N_WINDOW, 16)).astype(np.float32)
        frame_mask = np.ones((1, 2, 2 * N_WINDOW), bool)
        input_ids = np.array([[7, 5, 5, 5, 5, 8, 20, 21]], np.int32)
        attention_mask = np.ones_like(input_ids)

        model = ColQwen2_5Omni(cfg, dim=16)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(input_ids), jnp.asarray(attention_mask),
            audio_chunks=jnp.asarray(chunks), audio_frame_mask=jnp.asarray(frame_mask),
        )
        out = np.asarray(
            model.apply(variables, jnp.asarray(input_ids), jnp.asarray(attention_mask),
                        audio_chunks=jnp.asarray(chunks), audio_frame_mask=jnp.asarray(frame_mask))
        )
        assert out.shape == (1, 8, 16)
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-4)

class TestOmniCheckpointLoader:
    def test_full_thinker_checkpoint_conversion(self, tmp_path):
        """A tiny full HF thinker checkpoint converts strictly (every key
        matched or deliberately dropped) into the ColQwen2_5Omni tree."""
        from safetensors.torch import save_file
        from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import (
            Qwen2_5OmniThinkerConfig,
        )
        from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import (
            Qwen2_5OmniThinkerForConditionalGeneration,
        )

        from colpali_tpu.core.hf_loader import load_colqwen_omni_params

        torch.manual_seed(0)
        cfg = Qwen2_5OmniThinkerConfig(
            audio_config=dict(num_mel_bins=16, d_model=32, encoder_layers=1,
                              encoder_attention_heads=4, encoder_ffn_dim=64, n_window=N_WINDOW,
                              max_source_positions=64, output_dim=48),
            vision_config=dict(depth=1, hidden_size=32, num_heads=4, intermediate_size=64,
                               out_hidden_size=48, patch_size=2, window_size=8,
                               fullatt_block_indexes=[0]),
            text_config=dict(vocab_size=64, hidden_size=48, intermediate_size=96,
                             num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
                             head_dim=12),
        )
        # tiny head_dim needs a matching mrope split; HF validates rope_scaling
        # kwargs at construction, so set it afterwards like the real config does
        cfg.text_config.rope_scaling = {"mrope_section": [2, 2, 2], "rope_type": "default", "type": "default"}
        hf = Qwen2_5OmniThinkerForConditionalGeneration(cfg).eval()
        state = {k: v.contiguous() for k, v in hf.state_dict().items()}
        # full Omni checkpoints nest everything under thinker.* and also
        # carry the speech-generation stack — both must convert cleanly
        state = {f"thinker.{k}": v for k, v in state.items()}
        state["talker.model.layers.0.self_attn.q_proj.weight"] = torch.zeros(4, 4)
        state["token2wav.code2wav_bigvgan_model.conv_pre.weight"] = torch.zeros(4, 4)
        save_file(state, str(tmp_path / "model.safetensors"))

        params = load_colqwen_omni_params(str(tmp_path))
        assert set(params["model"].keys()) == {"audio_tower", "visual", "language_model"}
        # audio tower converted identically to the tower-only rules
        audio_direct = convert_state_dict(hf.audio_tower.state_dict(), OMNI_AUDIO_RULES, ())
        got_leaves = jax.tree.leaves(params["model"]["audio_tower"])
        want_leaves = jax.tree.leaves(audio_direct)
        assert len(got_leaves) == len(want_leaves)
        for g, w in zip(got_leaves, want_leaves):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
        # text decoder shapes line up with the flax module's init tree
        # (vision conversion shares QWEN25_VL_RULES, covered by the 2.5-VL
        # parity suite; a text-only init materializes only language_model)
        jcfg = QwenOmniConfig.from_hf_config(
            {"thinker_config": {"audio_config": cfg.audio_config.to_dict(),
                                "vision_config": cfg.vision_config.to_dict(),
                                "text_config": cfg.text_config.to_dict()}}
        )
        model = ColQwen2_5Omni(jcfg, dim=16)
        init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32))
        init_shapes = jax.tree.map(lambda x: x.shape, init["params"]["model"]["language_model"])
        got_shapes = jax.tree.map(lambda x: x.shape, params["model"]["language_model"])
        assert init_shapes == got_shapes
