"""Qwen3.5 hybrid backbone parity vs HF Qwen3Next (the same GatedDeltaNet +
gated-attention + MoE architecture family as the reference's Qwen3_5Model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from colpali_tpu.models.qwen3_5 import (  # noqa: E402
    ColQwen3_5,
    HybridDecoder,
    Qwen35TextConfig,
    Qwen35VLConfig,
    chunk_gated_delta_rule,
)


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    cfg = transformers.Qwen3NextConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        partial_rotary_factor=0.25,  # rotary over 4 dims
        rope_theta=10000.0,
        rms_norm_eps=1e-6,
        linear_num_value_heads=4,
        linear_num_key_heads=2,
        linear_key_head_dim=8,
        linear_value_head_dim=8,
        linear_conv_kernel_dim=3,
        layer_types=["linear_attention", "full_attention", "linear_attention", "full_attention"],
        num_experts=4,
        num_experts_per_tok=2,
        moe_intermediate_size=32,
        shared_expert_intermediate_size=32,
        decoder_sparse_step=1,
        mlp_only_layers=[0],  # layer 0 dense, others MoE
        attention_bias=False,
    )
    return transformers.Qwen3NextModel(cfg).eval().float()


def _convert(hf) -> dict:
    """torch state dict -> our flax layout (test-local; the production rules
    live in hf_loader once Qwen3_5 checkpoints exist)."""
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    cfg = hf.config
    params = {
        "embed_tokens": {"embedding": sd["embed_tokens.weight"]},
        "norm": {"weight": sd["norm.weight"]},
    }
    for i in range(cfg.num_hidden_layers):
        layer = {
            "input_layernorm": {"weight": sd[f"layers.{i}.input_layernorm.weight"]},
            "post_attention_layernorm": {"weight": sd[f"layers.{i}.post_attention_layernorm.weight"]},
        }
        if cfg.layer_types[i] == "linear_attention":
            pre = f"layers.{i}.linear_attn"
            layer["linear_attn"] = {
                "in_proj_qkvz": {"kernel": sd[f"{pre}.in_proj_qkvz.weight"].T},
                "in_proj_ba": {"kernel": sd[f"{pre}.in_proj_ba.weight"].T},
                "conv1d_kernel": sd[f"{pre}.conv1d.weight"][:, 0, :].T,  # (C,1,K)->(K,C)
                "A_log": sd[f"{pre}.A_log"],
                "dt_bias": sd[f"{pre}.dt_bias"],
                "norm_weight": sd[f"{pre}.norm.weight"],
                "out_proj": {"kernel": sd[f"{pre}.out_proj.weight"].T},
            }
        else:
            pre = f"layers.{i}.self_attn"
            layer["self_attn"] = {
                "q_proj": {"kernel": sd[f"{pre}.q_proj.weight"].T},
                "k_proj": {"kernel": sd[f"{pre}.k_proj.weight"].T},
                "v_proj": {"kernel": sd[f"{pre}.v_proj.weight"].T},
                "o_proj": {"kernel": sd[f"{pre}.o_proj.weight"].T},
                # HF Qwen3Next RMSNorm stores (1 + w) semantics with w around 1;
                # its forward uses (1.0 + weight) — convert to our offset form
                "q_norm": {"weight": sd[f"{pre}.q_norm.weight"]},
                "k_norm": {"weight": sd[f"{pre}.k_norm.weight"]},
            }
        mlp_pre = f"layers.{i}.mlp"
        if f"{mlp_pre}.gate.weight" in sd:  # MoE
            mlp = {
                "gate": {"kernel": sd[f"{mlp_pre}.gate.weight"].T},
                "shared_expert_gate": {"kernel": sd[f"{mlp_pre}.shared_expert_gate.weight"].T},
                "shared_expert": {
                    p: {"kernel": sd[f"{mlp_pre}.shared_expert.{p}.weight"].T}
                    for p in ("gate_proj", "up_proj", "down_proj")
                },
            }
            mlp["experts"] = {
                p: np.stack(
                    [sd[f"{mlp_pre}.experts.{e}.{p}.weight"].T for e in range(cfg.num_experts)]
                )
                for p in ("gate_proj", "up_proj", "down_proj")
            }
            layer["mlp"] = mlp
        else:
            layer["mlp"] = {
                p: {"kernel": sd[f"{mlp_pre}.{p}.weight"].T}
                for p in ("gate_proj", "up_proj", "down_proj")
            }
        params[f"layers_{i}"] = layer
    return params


class TestProductionLoaderCheckpointLayout:
    """Round-2 missing #5b: route a Qwen3.5-LAYOUT checkpoint (safetensors
    dir with the ``model.language_model.*`` key layout a ColQwen3_5 export
    uses) through the PRODUCTION loader (load_colqwen35_params: QWEN35_RULES
    + stack_expert_weights + fused-qkv split) and verify the loaded decoder
    matches the HF torch forward — the same parity as the hand-converted
    proxy test, but through the exact code path real checkpoints take.

    Proxy coverage note: HF Qwen3Next is the same architecture family as the
    reference's Qwen3_5 text stack (GatedDeltaNet + gated attention +
    GShard-style MoE + partial rotary). What the proxy CANNOT cover:
    (a) the Qwen3.5-VL vision tower + deepstack wiring (covered separately
    by test_qwen3_vl_parity against HF Qwen3VL, which the config reuses),
    (b) real config deltas of an unreleased Qwen3.5 checkpoint (hidden
    sizes, layer_types schedule, expert counts — all config-driven here),
    (c) real tokenizer artifacts. Everything weight-layout-shaped IS covered."""

    def test_loader_matches_hand_conversion_and_torch(self, hf_model, tmp_path):
        from safetensors.numpy import save_file

        from colpali_tpu.core.hf_loader import load_colqwen35_params

        sd = {
            f"model.language_model.{k}": v.detach().numpy()
            for k, v in hf_model.state_dict().items()
            if "rotary_emb" not in k
        }
        save_file(sd, str(tmp_path / "model.safetensors"))
        loaded = load_colqwen35_params(str(tmp_path), strict=True)

        # 1. tree-identical to the proxy test's hand conversion
        hand = _convert(hf_model)
        flat_loaded = jax.tree_util.tree_leaves_with_path(loaded["model"]["language_model"])
        flat_hand = {
            jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_leaves_with_path(hand)
        }
        assert len(flat_loaded) == len(flat_hand)
        for path, leaf in flat_loaded:
            key = jax.tree_util.keystr(path)
            np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat_hand[key]), err_msg=key)

        # 2. the loader-produced params drive the decoder to the torch output
        cfg = Qwen35TextConfig.from_hf_config(hf_model.config.to_dict())
        rng = np.random.default_rng(3)
        input_ids = rng.integers(1, 60, size=(2, 9)).astype(np.int32)
        mask = np.ones_like(input_ids)
        with torch.no_grad():
            expected = hf_model(
                input_ids=torch.tensor(input_ids), attention_mask=torch.tensor(mask)
            ).last_hidden_state.numpy()
        from colpali_tpu.models.layers import make_attention_bias

        decoder = HybridDecoder(cfg)
        p = loaded["model"]["language_model"]
        embeds = decoder.apply({"params": p}, jnp.asarray(input_ids), method=decoder.embed)
        bias = make_attention_bias(jnp.asarray(mask), causal=True)
        pos = jnp.broadcast_to(jnp.arange(9)[None, None], (3, 2, 9))
        got = np.asarray(decoder.apply({"params": p}, embeds, bias, pos, jnp.asarray(mask)))
        np.testing.assert_allclose(got, expected, rtol=2e-2, atol=2e-2)


class TestChunkedDeltaRule:
    def test_matches_torch_reference(self):
        """Our triangular-solve formulation vs HF's sequential fallback."""
        from transformers.models.qwen3_next.modeling_qwen3_next import torch_chunk_gated_delta_rule

        rng = np.random.default_rng(0)
        b, s, h, dk, dv = 2, 10, 3, 8, 8
        q = rng.normal(size=(b, s, h, dk)).astype(np.float32)
        k = rng.normal(size=(b, s, h, dk)).astype(np.float32)
        v = rng.normal(size=(b, s, h, dv)).astype(np.float32)
        g = -np.abs(rng.normal(size=(b, s, h))).astype(np.float32)
        beta = rng.uniform(0.1, 0.9, size=(b, s, h)).astype(np.float32)

        expected, _ = torch_chunk_gated_delta_rule(
            torch.tensor(q), torch.tensor(k), torch.tensor(v), torch.tensor(g), torch.tensor(beta),
            chunk_size=4, use_qk_l2norm_in_kernel=True,
        )
        got = chunk_gated_delta_rule(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(g), jnp.asarray(beta),
            chunk_size=4,
        )
        np.testing.assert_allclose(np.asarray(got), expected.numpy(), rtol=1e-4, atol=1e-4)

    def test_gradient_finite_when_chunk_decay_overflows_exp(self):
        """Regression (round-5): with enough accumulated log-decay in one
        chunk (|sum g| > ~88), exp(g_row - g_col) overflows to inf in the
        masked upper triangle. The forward `where` hides it, but the where
        backward multiplies the masked branch's vjp by a zero cotangent —
        0 * inf = NaN — which silently killed EVERY finetune gradient of the
        hybrid above ~56 tokens. Pin: forward finite AND grads finite at a
        decay budget well past the overflow point."""
        rng = np.random.default_rng(1)
        b, s, h, dk, dv = 1, 128, 2, 8, 8
        q = rng.normal(size=(b, s, h, dk)).astype(np.float32)
        k = rng.normal(size=(b, s, h, dk)).astype(np.float32)
        v = rng.normal(size=(b, s, h, dv)).astype(np.float32)
        # ~2.0 log-decay per token -> |cumsum| ~ 128 >> 88 inside one chunk
        g = -np.abs(rng.normal(loc=2.0, scale=0.3, size=(b, s, h))).astype(np.float32)
        beta = rng.uniform(0.1, 0.9, size=(b, s, h)).astype(np.float32)

        def loss(q, k, v, g, beta):
            out = chunk_gated_delta_rule(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                jnp.asarray(g), jnp.asarray(beta), chunk_size=64,
            )
            return jnp.sum(out**2)

        val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(q, k, v, g, beta)
        assert np.isfinite(float(val))
        for name, grad in zip("qkvgb", grads):
            assert np.isfinite(np.asarray(grad)).all(), f"NaN grad wrt {name}"


class TestHybridDecoderParity:
    @pytest.mark.parametrize("dtype64", [False, True])
    def test_text_forward(self, hf_model, dtype64):
        cfg = Qwen35TextConfig.from_hf_config(hf_model.config.to_dict())
        params = _convert(hf_model)
        rng = np.random.default_rng(1)
        input_ids = rng.integers(1, 60, size=(2, 9)).astype(np.int64)
        attention_mask = np.ones((2, 9), np.int64)

        hf = hf_model.double() if dtype64 else hf_model.float()
        with torch.no_grad():
            expected = hf(
                input_ids=torch.tensor(input_ids), attention_mask=torch.tensor(attention_mask)
            ).last_hidden_state.numpy()
        hf_model.float()

        jdt = jnp.float64 if dtype64 else jnp.float32
        if dtype64:
            jax.config.update("jax_enable_x64", True)
        try:
            p = jax.tree.map(lambda x: np.asarray(x).astype(np.float64), params) if dtype64 else params
            dec = HybridDecoder(cfg, dtype=jdt, param_dtype=jdt)

            def run(params_):
                embeds = dec.apply({"params": params_}, jnp.asarray(input_ids), method=dec.embed)
                from colpali_tpu.models.layers import make_attention_bias

                bias = make_attention_bias(jnp.asarray(attention_mask), causal=True)
                pos = jnp.broadcast_to(jnp.arange(9)[None, None], (3, 2, 9))
                return dec.apply({"params": params_}, embeds, bias, pos, jnp.asarray(attention_mask))

            got = np.asarray(run(p))
        finally:
            if dtype64:
                jax.config.update("jax_enable_x64", False)
        tol = 1e-5 if dtype64 else 2e-2
        np.testing.assert_allclose(got, expected, rtol=tol, atol=tol)


class TestColQwen35:
    def test_multimodal_forward_shapes(self):
        from colpali_tpu.models.qwen3_vl import Qwen3VLVisionConfig

        cfg = Qwen35VLConfig(
            vision=Qwen3VLVisionConfig(depth=1, hidden_size=32, num_heads=4, intermediate_size=64,
                                       out_hidden_size=32, patch_size=2, num_position_embeddings=16,
                                       deepstack_visual_indexes=(0,)),
            text=Qwen35TextConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                                  num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
                                  head_dim=16, linear_num_value_heads=4, linear_num_key_heads=2,
                                  linear_key_head_dim=8, linear_value_head_dim=8,
                                  layer_types=("linear_attention", "full_attention")),
            dim=24,
            image_token_id=9,
        )
        from colpali_tpu.models.qwen3_vl import pos_embed_interp_indices
        from colpali_tpu.processors.qwen2_vl import patchify, vision_positions

        rng = np.random.default_rng(2)
        flat, grid = patchify(rng.normal(size=(3, 8, 8)).astype(np.float32), 2, 2, 2)
        n_merged = grid[0] * (grid[1] // 2) * (grid[2] // 2)
        input_ids = np.concatenate([np.full((1, n_merged), 9), rng.integers(11, 60, size=(1, 4))], 1)
        attention_mask = np.ones_like(input_ids)
        hp, wp = vision_positions(grid, 2)
        pi, pw = pos_embed_interp_indices(grid, 4, 2)

        model = ColQwen3_5(cfg)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(input_ids), jnp.asarray(attention_mask),
            pixel_values=jnp.asarray(flat)[None], vision_hpos=jnp.asarray(hp)[None],
            vision_wpos=jnp.asarray(wp)[None], patch_mask=jnp.ones((1, flat.shape[0]), bool),
            pos_idx=jnp.asarray(pi)[None], pos_weight=jnp.asarray(pw)[None],
        )
        out = model.apply(
            variables, jnp.asarray(input_ids), jnp.asarray(attention_mask),
            pixel_values=jnp.asarray(flat)[None], vision_hpos=jnp.asarray(hp)[None],
            vision_wpos=jnp.asarray(wp)[None], patch_mask=jnp.ones((1, flat.shape[0]), bool),
            pos_idx=jnp.asarray(pi)[None], pos_weight=jnp.asarray(pw)[None],
        )
        assert out.shape == (1, input_ids.shape[1], 24)  # dim from config


class TestMoeCapacityDispatch:
    def _block(self, capacity_factor):
        from colpali_tpu.models.qwen3_5 import SparseMoeBlock

        cfg = Qwen35TextConfig(
            hidden_size=16, num_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=8, shared_expert_intermediate_size=8,
            moe_capacity_factor=capacity_factor,
        )
        return SparseMoeBlock(cfg)

    def test_capacity_matches_dense_when_nothing_drops(self):
        """With capacity >= all tokens per expert, GShard dispatch must equal
        the exact dense path."""
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 6, 16)).astype(np.float32))
        dense = self._block(0.0)
        params = dense.init(jax.random.PRNGKey(1), x)["params"]
        expected = np.asarray(dense.apply({"params": params}, x))
        # factor = E/K makes capacity = T (every expert can hold every token)
        got = np.asarray(self._block(2.0 * 4 / 2).apply({"params": params}, x))
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)

    def test_tight_capacity_drops_overflow(self):
        """Undersized buffers must drop tokens (output differs from dense but
        stays finite), and slot-major priority keeps first choices."""
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(1, 12, 16)).astype(np.float32))
        dense = self._block(0.0)
        params = dense.init(jax.random.PRNGKey(3), x)["params"]
        expected = np.asarray(dense.apply({"params": params}, x))
        got = np.asarray(self._block(0.25).apply({"params": params}, x))
        assert np.isfinite(got).all()
        assert not np.allclose(got, expected, atol=1e-6)  # something dropped

    def test_expert_params_are_stacked(self):
        x = jnp.zeros((1, 4, 16))
        params = self._block(0.0).init(jax.random.PRNGKey(0), x)["params"]
        assert params["experts"]["gate_proj"].shape == (4, 16, 8)
        assert params["experts"]["down_proj"].shape == (4, 8, 16)

    def test_loader_stacks_expert_weights(self):
        from colpali_tpu.core.hf_loader import stack_expert_weights

        state = {}
        for e in range(3):
            for p, shape in (("gate_proj", (8, 16)), ("up_proj", (8, 16)), ("down_proj", (16, 8))):
                state[f"language_model.layers.0.mlp.experts.{e}.{p}.weight"] = (
                    np.full(shape, float(e), np.float32)
                )
        state["language_model.layers.0.mlp.gate.weight"] = np.zeros((3, 16), np.float32)
        rest, updates = stack_expert_weights(state)
        assert list(rest) == ["language_model.layers.0.mlp.gate.weight"]
        key = ("model", "language_model", "layers_0", "mlp", "experts", "gate_proj")
        assert updates[key].shape == (3, 16, 8)  # (E, d_in, d_out), transposed
        assert (updates[key][2] == 2.0).all()
