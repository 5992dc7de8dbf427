"""Scan-over-layers equivalence: scanned stacks must match unrolled output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colpali_tpu.core.hf_loader import stack_layer_params
from colpali_tpu.models.configs import GemmaConfig, PaliGemmaConfig, SiglipVisionConfig
from colpali_tpu.models.paligemma import ColPali
from colpali_tpu.models.qwen2_vl import Qwen2Decoder, Qwen2TextConfig

IMAGE_TOKEN = 2


class TestScanEquivalence:
    def test_colpali_scan_matches_unrolled(self):
        cfg = PaliGemmaConfig(
            vision=SiglipVisionConfig(hidden_size=16, intermediate_size=32, num_hidden_layers=3,
                                      num_attention_heads=2, image_size=28, patch_size=14),
            text=GemmaConfig(vocab_size=32, hidden_size=16, intermediate_size=32, num_hidden_layers=3,
                             num_attention_heads=2, num_key_value_heads=1, head_dim=8),
            projection_dim=16, image_token_index=IMAGE_TOKEN)
        rng = np.random.default_rng(0)
        ids = np.concatenate([np.full((2, 4), IMAGE_TOKEN), rng.integers(3, 30, size=(2, 5))], 1).astype(np.int32)
        am = np.ones_like(ids)
        px = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)

        unrolled = ColPali(cfg, dim=8)
        params = unrolled.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(am), jnp.asarray(px))["params"]
        expected = np.asarray(unrolled.apply({"params": params}, jnp.asarray(ids), jnp.asarray(am), jnp.asarray(px)))

        scanned = ColPali(cfg, dim=8, scan_layers=True)
        sparams = stack_layer_params(params)
        got = np.asarray(scanned.apply({"params": sparams}, jnp.asarray(ids), jnp.asarray(am), jnp.asarray(px)))
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)

    def test_qwen2_decoder_scan_and_remat(self):
        cfg = Qwen2TextConfig(vocab_size=32, hidden_size=16, intermediate_size=32, num_hidden_layers=3,
                              num_attention_heads=2, num_key_value_heads=1, head_dim=8,
                              mrope_section=(2, 1, 1))
        rng = np.random.default_rng(1)
        embeds = jnp.asarray(rng.normal(size=(2, 6, 16)).astype(np.float32))
        bias = jnp.zeros((2, 1, 6, 6), jnp.float32)
        pos = jnp.asarray(np.tile(np.arange(6), (3, 2, 1)))

        unrolled = Qwen2Decoder(cfg)
        params = unrolled.init(jax.random.PRNGKey(0), embeds, bias, pos)["params"]
        expected = np.asarray(unrolled.apply({"params": params}, embeds, bias, pos))

        sparams = stack_layer_params(params)
        for scan, remat in ((True, False), (True, True)):
            model = Qwen2Decoder(cfg, scan_layers=scan, remat=remat)
            got = np.asarray(model.apply({"params": sparams}, embeds, bias, pos))
            np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)

    def test_colgemma3_scan_matches_unrolled(self):
        """Gemma3's sliding/global alternation rides the scan as a per-layer
        flag — the scanned stack must still pick the right bias+rope pair."""
        from colpali_tpu.models.gemma3 import ColGemma3, Gemma3Config, Gemma3TextConfig

        cfg = Gemma3Config(
            vision=SiglipVisionConfig(hidden_size=16, intermediate_size=32, num_hidden_layers=2,
                                      num_attention_heads=2, image_size=28, patch_size=14),
            text=Gemma3TextConfig(vocab_size=32, hidden_size=16, intermediate_size=32,
                                  num_hidden_layers=4, num_attention_heads=2, num_key_value_heads=1,
                                  head_dim=8, query_pre_attn_scalar=8, sliding_window=3,
                                  sliding_window_pattern=2, rope_scaling_factor=4.0),
            mm_tokens_per_image=1, image_token_index=30)
        rng = np.random.default_rng(2)
        ids = rng.integers(1, 29, size=(2, 7)).astype(np.int32)
        ids[:, 2] = 30
        am = np.ones_like(ids)
        px = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
        args = (jnp.asarray(ids), jnp.asarray(am), jnp.asarray(px))

        unrolled = ColGemma3(cfg, dim=8)
        params = unrolled.init(jax.random.PRNGKey(3), *args)["params"]
        expected = np.asarray(unrolled.apply({"params": params}, *args))

        sparams = stack_layer_params(params)
        for remat in (False, True):
            scanned = ColGemma3(cfg, dim=8, scan_layers=True, remat=remat)
            got = np.asarray(scanned.apply({"params": sparams}, *args))
            np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)

    def test_qwen3_decoder_scan_with_deepstack(self):
        """Deepstack injection (first-N layers) must survive the scan: the
        per-layer slice is taken by a clamped dynamic index inside the layer."""
        from colpali_tpu.models.qwen3_vl import Qwen3Decoder, Qwen3TextConfig

        cfg = Qwen3TextConfig(vocab_size=32, hidden_size=16, intermediate_size=32,
                              num_hidden_layers=4, num_attention_heads=2, num_key_value_heads=1,
                              head_dim=8, mrope_section=(2, 1, 1))
        rng = np.random.default_rng(3)
        embeds = jnp.asarray(rng.normal(size=(2, 6, 16)).astype(np.float32))
        bias = jnp.zeros((2, 1, 6, 6), jnp.float32)
        pos = jnp.asarray(np.tile(np.arange(6), (3, 2, 1)))
        image_mask = jnp.asarray(np.array([[0, 1, 1, 0, 0, 0], [1, 1, 0, 0, 0, 0]], bool))
        deepstack = [jnp.asarray(rng.normal(size=(2, 2, 16)).astype(np.float32)) for _ in range(2)]

        unrolled = Qwen3Decoder(cfg)
        params = unrolled.init(jax.random.PRNGKey(0), embeds, bias, pos, image_mask, deepstack)["params"]
        expected = np.asarray(unrolled.apply({"params": params}, embeds, bias, pos, image_mask, deepstack))
        expected_text = np.asarray(unrolled.apply({"params": params}, embeds, bias, pos))

        sparams = stack_layer_params(params)
        for remat in (False, True):
            model = Qwen3Decoder(cfg, scan_layers=True, remat=remat)
            got = np.asarray(model.apply({"params": sparams}, embeds, bias, pos, image_mask, deepstack))
            np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)
        got_text = np.asarray(
            Qwen3Decoder(cfg, scan_layers=True).apply({"params": sparams}, embeds, bias, pos)
        )
        np.testing.assert_allclose(got_text, expected_text, rtol=1e-5, atol=1e-5)

    def test_colqwen3_full_model_scan(self):
        """Tower (collected taps) + decoder scan through the public model with
        the DEFAULT stack_layer_params (stacks both `layers_*` and `blocks_*`)."""
        from colpali_tpu.models.qwen3_vl import (
            ColQwen3, Qwen3TextConfig, Qwen3VLConfig, Qwen3VLVisionConfig,
            pos_embed_interp_indices,
        )
        from colpali_tpu.processors.qwen2_vl import patchify, vision_positions

        cfg = Qwen3VLConfig(
            vision=Qwen3VLVisionConfig(depth=3, hidden_size=16, num_heads=2, intermediate_size=32,
                                       out_hidden_size=16, patch_size=2, temporal_patch_size=2,
                                       spatial_merge_size=2, num_position_embeddings=16,
                                       deepstack_visual_indexes=(0, 2)),
            text=Qwen3TextConfig(vocab_size=64, hidden_size=16, intermediate_size=32,
                                 num_hidden_layers=3, num_attention_heads=2, num_key_value_heads=1,
                                 head_dim=8, mrope_section=(2, 1, 1)),
            image_token_id=9, vision_start_token_id=7, video_token_id=10)
        rng = np.random.default_rng(4)
        img = rng.normal(size=(3, 8, 8)).astype(np.float32)
        flat, grid = patchify(img, patch_size=2, temporal_patch_size=2, merge_size=2)
        n_merged = grid[0] * (grid[1] // 2) * (grid[2] // 2)
        ids = np.array([[7] + [9] * n_merged + [8, 11, 12]], np.int64)
        hp, wp = vision_positions(grid, 2)
        pi, pw = pos_embed_interp_indices(grid, cfg.vision.num_grid_per_side, 2)
        args = (jnp.asarray(ids), jnp.asarray(np.ones_like(ids)), jnp.asarray(flat[None]))
        vk = dict(vision_hpos=jnp.asarray(hp[None]), vision_wpos=jnp.asarray(wp[None]),
                  patch_mask=jnp.ones((1, flat.shape[0]), bool), pos_idx=jnp.asarray(pi[None]),
                  pos_weight=jnp.asarray(pw[None]))

        unrolled = ColQwen3(cfg, dim=8)
        params = unrolled.init(jax.random.PRNGKey(5), *args, **vk)["params"]
        expected = np.asarray(unrolled.apply({"params": params}, *args, **vk))

        sparams = stack_layer_params(params)
        got = np.asarray(
            ColQwen3(cfg, dim=8, scan_layers=True, remat=True).apply({"params": sparams}, *args, **vk)
        )
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)

    def test_hybrid_grouped_scan_matches_unrolled(self):
        """Qwen3.5's hybrid stack scans over pattern PERIODS (linear/full
        alternation repeats each period); params regroup via
        group_hybrid_params."""
        from colpali_tpu.core.hf_loader import group_hybrid_params
        from colpali_tpu.models.layers import make_attention_bias
        from colpali_tpu.models.qwen3_5 import HybridDecoder, Qwen35TextConfig

        cfg = Qwen35TextConfig(
            vocab_size=32, hidden_size=16, intermediate_size=32, num_hidden_layers=4,
            num_attention_heads=2, num_key_value_heads=1, head_dim=8,
            linear_num_value_heads=2, linear_num_key_heads=1, linear_key_head_dim=8,
            linear_value_head_dim=8, linear_conv_kernel_dim=3, full_attention_interval=2,
            num_experts=4, num_experts_per_tok=2, moe_intermediate_size=16,
            shared_expert_intermediate_size=16)
        rng = np.random.default_rng(5)
        embeds = jnp.asarray(rng.normal(size=(2, 6, 16)).astype(np.float32))
        am = jnp.ones((2, 6), jnp.int32)
        bias = make_attention_bias(am, causal=True)
        pos = jnp.asarray(np.tile(np.arange(6), (3, 2, 1)))

        unrolled = HybridDecoder(cfg)
        params = unrolled.init(jax.random.PRNGKey(6), embeds, bias, pos, am)["params"]
        expected = np.asarray(unrolled.apply({"params": params}, embeds, bias, pos, am))

        gparams = group_hybrid_params(params, cfg.full_attention_interval)
        assert gparams["layers"]["layer"]["sub_1"]["self_attn"]["q_proj"]["kernel"].shape[0] == 2
        for remat in (False, True):
            scanned = HybridDecoder(cfg, scan_layers=True, remat=remat)
            got = np.asarray(scanned.apply({"params": gparams}, embeds, bias, pos, am))
            np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)

    def test_hybrid_scan_rejects_aperiodic_pattern(self):
        from colpali_tpu.models.qwen3_5 import HybridDecoder, Qwen35TextConfig

        cfg = Qwen35TextConfig(
            vocab_size=32, hidden_size=16, intermediate_size=32, num_hidden_layers=4,
            num_attention_heads=2, num_key_value_heads=1, head_dim=8,
            linear_num_value_heads=2, linear_num_key_heads=1, linear_key_head_dim=8,
            linear_value_head_dim=8, full_attention_interval=2,
            layer_types=("linear_attention", "full_attention", "full_attention", "linear_attention"))
        with pytest.raises(ValueError, match="periodic"):
            HybridDecoder(cfg, scan_layers=True).init(
                jax.random.PRNGKey(0), jnp.zeros((1, 4, 16)),
                jnp.zeros((1, 1, 4, 4)), jnp.zeros((3, 1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32))

    def test_modernbert_scan_matches_unrolled(self):
        """ModernBERT scans with layer_idx as a scanned input: it selects the
        global/local bias+rope pair AND bypasses attn_norm on layer 0."""
        from colpali_tpu.models.modernvbert import ModernBertEncoder, ModernBertTextConfig

        cfg = ModernBertTextConfig(vocab_size=32, hidden_size=16, intermediate_size=32,
                                   num_hidden_layers=4, num_attention_heads=2,
                                   local_attention=4, global_attn_every_n_layers=2)
        rng = np.random.default_rng(7)
        embeds = jnp.asarray(rng.normal(size=(2, 6, 16)).astype(np.float32))
        am = jnp.asarray(np.array([[1, 1, 1, 1, 1, 1], [1, 1, 1, 1, 0, 0]], np.int32))

        unrolled = ModernBertEncoder(cfg)
        params = unrolled.init(jax.random.PRNGKey(8), embeds, am)["params"]
        expected = np.asarray(unrolled.apply({"params": params}, embeds, am))

        sparams = stack_layer_params(params)
        for remat in (False, True):
            scanned = ModernBertEncoder(cfg, scan_layers=True, remat=remat)
            got = np.asarray(scanned.apply({"params": sparams}, embeds, am))
            np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)

    def test_qwen25_tower_scan_matches_unrolled(self):
        """Qwen2.5's full/window alternation (arbitrary fullatt_block_indexes)
        rides the scan as a per-block flag."""
        from colpali_tpu.models.qwen2_5_vl import Qwen25VisionTower, Qwen25VLVisionConfig

        cfg = Qwen25VLVisionConfig(depth=4, hidden_size=16, num_heads=2, intermediate_size=32,
                                   out_hidden_size=16, patch_size=2, window_size=4,
                                   fullatt_block_indexes=(1, 3))
        rng = np.random.default_rng(9)
        patches = jnp.asarray(rng.normal(size=(1, 8, cfg.patch_dim)).astype(np.float32))
        hpos = jnp.asarray(np.tile(np.arange(8) // 4, (1, 1)))
        wpos = jnp.asarray(np.tile(np.arange(8) % 4, (1, 1)))
        mask = jnp.ones((1, 8), bool)
        window_id = jnp.asarray(np.array([[0, 0, 1, 1, 0, 0, 1, 1]], np.int32))
        args = (patches, hpos, wpos, mask, window_id)

        unrolled = Qwen25VisionTower(cfg)
        params = unrolled.init(jax.random.PRNGKey(10), *args)["params"]
        expected = np.asarray(unrolled.apply({"params": params}, *args))

        sparams = stack_layer_params(params)
        got = np.asarray(
            Qwen25VisionTower(cfg, scan_layers=True, remat=True).apply({"params": sparams}, *args)
        )
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)

    def test_omni_audio_encoder_scan_matches_unrolled(self):
        from colpali_tpu.models.qwen_omni import OmniAudioConfig, OmniAudioEncoder

        cfg = OmniAudioConfig(num_mel_bins=16, d_model=32, encoder_layers=3,
                              encoder_attention_heads=4, encoder_ffn_dim=64, n_window=4,
                              max_source_positions=64, output_dim=24)
        rng = np.random.default_rng(11)
        chunks = jnp.asarray(rng.normal(size=(2, 8, 16)).astype(np.float32))
        fmask = jnp.ones((2, 8), bool)

        unrolled = OmniAudioEncoder(cfg)
        params = unrolled.init(jax.random.PRNGKey(12), chunks, fmask)["params"]
        expected = np.asarray(unrolled.apply({"params": params}, chunks, fmask))
        sparams = stack_layer_params(params)
        got = np.asarray(
            OmniAudioEncoder(cfg, scan_layers=True).apply({"params": sparams}, chunks, fmask)
        )
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)

    def test_colidefics3_scan_matches_unrolled(self):
        from colpali_tpu.models.idefics3 import ColIdefics3, Idefics3Config, Idefics3VisionConfig
        from colpali_tpu.models.qwen2_vl import Qwen2TextConfig

        cfg = Idefics3Config(
            vision=Idefics3VisionConfig(hidden_size=16, intermediate_size=32, num_hidden_layers=3,
                                        num_attention_heads=2, image_size=16, patch_size=4),
            text=Qwen2TextConfig(vocab_size=64, hidden_size=16, intermediate_size=32,
                                 num_hidden_layers=3, num_attention_heads=2, num_key_value_heads=1,
                                 head_dim=8, attention_bias=False, mrope_section=(4,)),
            scale_factor=2, image_token_id=60)
        rng = np.random.default_rng(13)
        n_img = cfg.image_seq_len
        ids = rng.integers(1, 50, size=(1, n_img + 3)).astype(np.int64)
        ids[0, :n_img] = 60
        am = np.ones_like(ids)
        tiles = rng.normal(size=(1, 1, 16, 16, 3)).astype(np.float32)
        args = (jnp.asarray(ids), jnp.asarray(am), jnp.asarray(tiles))

        unrolled = ColIdefics3(cfg, dim=8)
        params = unrolled.init(jax.random.PRNGKey(14), *args)["params"]
        expected = np.asarray(unrolled.apply({"params": params}, *args))
        sparams = stack_layer_params(params)
        got = np.asarray(
            ColIdefics3(cfg, dim=8, scan_layers=True, remat=True).apply({"params": sparams}, *args)
        )
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)

    def test_scan_init_shapes_match_stacked(self):
        """init with scan_layers=True produces the stacked layout directly."""
        cfg = Qwen2TextConfig(vocab_size=32, hidden_size=16, intermediate_size=32, num_hidden_layers=3,
                              num_attention_heads=2, num_key_value_heads=1, head_dim=8,
                              mrope_section=(2, 1, 1))
        model = Qwen2Decoder(cfg, scan_layers=True)
        embeds = jnp.zeros((1, 4, 16))
        bias = jnp.zeros((1, 1, 4, 4))
        pos = jnp.zeros((3, 1, 4), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), embeds, bias, pos)["params"]
        k = params["layers"]["layer"]["self_attn"]["q_proj"]["kernel"]
        assert k.shape[0] == 3  # stacked layer axis


def test_remat_layer_rejects_unknown_policy_name():
    """A typo'd remat_policy must raise the friendly ValueError (listing the
    options) from remat_layer itself, not a bare KeyError deep in Flax
    setup — same contract as remat_policy_ctx (ADVICE r4)."""
    import pytest
    import flax.linen as nn
    from colpali_tpu.models.layers import remat_layer

    with pytest.raises(ValueError, match="unknown remat policy"):
        remat_layer(nn.Dense, remat=True, remat_policy="typo")
    # valid names and raw policy callables still work
    assert remat_layer(nn.Dense, remat=True, remat_policy="dots") is not None
    assert remat_layer(nn.Dense, remat=False, remat_policy="typo") is nn.Dense
