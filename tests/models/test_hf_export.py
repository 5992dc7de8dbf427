"""Reverse checkpoint export: flax -> HF torch-layout state dict.

Round-trip property (VERDICT r1 missing #2): HF state dict -> flax (the
production loader rules) -> HF (hf_export) must reproduce every consumed key
bit-identically, the torch model must load the export with no unexpected
keys, and re-importing the export into flax must be bit-identical. Hermetic:
tiny random HF models, no network (same strategy as the parity suite).
"""

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from colpali_tpu.core.hf_export import (  # noqa: E402
    adapt_keys_to,
    export_colpali_state_dict,
    export_colqwen2_state_dict,
    render_torch_key,
    unstack_layer_params,
)
from colpali_tpu.core.hf_loader import (  # noqa: E402
    PALIGEMMA_KEY_REMAPS,
    PALIGEMMA_RULES,
    QWEN2_VL_KEY_REMAPS,
    QWEN2_VL_RULES,
    convert_state_dict,
    normalize_keys,
    split_fused_qkv,
    stack_layer_params,
)

_DROPPED = ("lm_head.weight",)


def _is_dropped(key: str) -> bool:
    return key in _DROPPED or ".rotary_emb." in key or ".vision_model.head." in key


def _assert_trees_identical(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert [p for p, _ in la] == [p for p, _ in lb]
    for (_, x), (_, y) in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.fixture(scope="module")
def paligemma_sd():
    torch.manual_seed(0)
    cfg = transformers.PaliGemmaConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=4, image_size=28, patch_size=14,
                           projection_dim=32),
        text_config=dict(vocab_size=99, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, head_dim=8),
        image_token_index=97,
        projection_dim=32,
    )
    model = transformers.PaliGemmaForConditionalGeneration(cfg).eval().float()
    sd = dict(model.state_dict())
    # the retrieval head a trained ColPali checkpoint carries
    sd["custom_text_proj.weight"] = torch.randn(16, 32)
    sd["custom_text_proj.bias"] = torch.randn(16)
    return model, sd


@pytest.fixture(scope="module")
def qwen2_sd():
    torch.manual_seed(0)
    cfg = transformers.Qwen2VLConfig(
        vision_config=dict(depth=2, embed_dim=32, num_heads=4, mlp_ratio=2.0,
                           hidden_size=48, patch_size=2, temporal_patch_size=2,
                           spatial_merge_size=2, in_channels=3),
        vocab_size=64, hidden_size=48, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, rope_theta=1000000.0,
        rms_norm_eps=1e-6, rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
        image_token_id=5, video_token_id=10, vision_start_token_id=3,
        vision_end_token_id=4,
    )
    model = transformers.Qwen2VLModel(cfg).eval().float()
    sd = dict(model.state_dict())
    sd["custom_text_proj.weight"] = torch.randn(16, 48)
    sd["custom_text_proj.bias"] = torch.randn(16)
    return model, sd


class TestRenderTorchKey:
    def test_substitutes_groups_and_drops_optionals(self):
        pat = r"model\.vision_tower\.vision_model\.encoder\.layers\.(\d+)\.layer_norm([12])\.weight"
        assert render_torch_key(pat, ("3", "2")) == (
            "model.vision_tower.vision_model.encoder.layers.3.layer_norm2.weight"
        )
        assert render_torch_key(r"(?:model\.)?custom_text_proj\.weight", ()) == (
            "custom_text_proj.weight"
        )

    def test_refuses_wildcards(self):
        assert render_torch_key(r"model\.vision_tower\.head\..*", ()) is None


class TestColPaliExport:
    def test_round_trip(self, paligemma_sd):
        model, sd = paligemma_sd
        params = convert_state_dict(sd, PALIGEMMA_RULES, PALIGEMMA_KEY_REMAPS)
        exported = export_colpali_state_dict(params)
        adapted = adapt_keys_to(exported, sd.keys(), PALIGEMMA_KEY_REMAPS)
        # every consumed torch key comes back bit-identical
        for key, value in sd.items():
            if _is_dropped(key):
                assert key not in adapted
                continue
            assert key in adapted, f"missing from export: {key}"
            np.testing.assert_array_equal(adapted[key], value.numpy())
        assert not set(adapted) - set(sd)  # no invented keys
        # flax -> HF -> flax is bit-identical
        _assert_trees_identical(
            params, convert_state_dict(exported, PALIGEMMA_RULES, PALIGEMMA_KEY_REMAPS)
        )

    def test_torch_model_loads_export(self, paligemma_sd):
        model, sd = paligemma_sd
        params = convert_state_dict(sd, PALIGEMMA_RULES, PALIGEMMA_KEY_REMAPS)
        adapted = adapt_keys_to(export_colpali_state_dict(params), sd.keys(), PALIGEMMA_KEY_REMAPS)
        target_keys = set(model.state_dict())
        loadable = {
            k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in adapted.items()
            if k in target_keys
        }
        result = model.load_state_dict(loadable, strict=False)
        assert result.unexpected_keys == []
        assert all(_is_dropped(k) for k in result.missing_keys), result.missing_keys

    def test_scanned_params_export_identically(self, paligemma_sd):
        """Models built with scan_layers=True save stacked layer trees; the
        exporter must unstack them transparently."""
        _, sd = paligemma_sd
        params = convert_state_dict(sd, PALIGEMMA_RULES, PALIGEMMA_KEY_REMAPS)
        stacked = stack_layer_params(params)
        assert "layers_0" not in stacked["model"]["language_model"]
        np_sd = export_colpali_state_dict(params)
        np_sd2 = export_colpali_state_dict(stacked)
        assert set(np_sd) == set(np_sd2)
        for k in np_sd:
            np.testing.assert_array_equal(np_sd[k], np_sd2[k])

    def test_unstack_inverts_stack(self, paligemma_sd):
        _, sd = paligemma_sd
        params = convert_state_dict(sd, PALIGEMMA_RULES, PALIGEMMA_KEY_REMAPS)
        _assert_trees_identical(params, unstack_layer_params(stack_layer_params(params)))


class TestColQwen2Export:
    def test_round_trip_with_fused_qkv_and_conv3d(self, qwen2_sd):
        model, sd = qwen2_sd
        state = split_fused_qkv(normalize_keys(sd, QWEN2_VL_KEY_REMAPS))
        params = convert_state_dict(state, QWEN2_VL_RULES, ())
        vc = model.config.vision_config
        exported = export_colqwen2_state_dict(
            params,
            channels=vc.in_channels,
            temporal_patch_size=vc.temporal_patch_size,
            patch_size=vc.patch_size,
        )
        adapted = adapt_keys_to(exported, sd.keys(), QWEN2_VL_KEY_REMAPS)
        for key, value in sd.items():
            if _is_dropped(key):
                continue
            assert key in adapted, f"missing from export: {key}"
            np.testing.assert_array_equal(adapted[key], value.numpy())
        assert not set(adapted) - set(sd)

    def test_torch_model_loads_export(self, qwen2_sd):
        model, sd = qwen2_sd
        state = split_fused_qkv(normalize_keys(sd, QWEN2_VL_KEY_REMAPS))
        params = convert_state_dict(state, QWEN2_VL_RULES, ())
        vc = model.config.vision_config
        adapted = adapt_keys_to(
            export_colqwen2_state_dict(
                params, channels=vc.in_channels,
                temporal_patch_size=vc.temporal_patch_size, patch_size=vc.patch_size,
            ),
            sd.keys(),
            QWEN2_VL_KEY_REMAPS,
        )
        target_keys = set(model.state_dict())
        loadable = {
            k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in adapted.items()
            if k in target_keys
        }
        result = model.load_state_dict(loadable, strict=False)
        assert result.unexpected_keys == []
        assert all(_is_dropped(k) for k in result.missing_keys), result.missing_keys


class TestColQwen35Export:
    """Qwen3.5 trees carry structures no other family has: stacked MoE
    experts and grouped hybrid-scan layers (review findings r2)."""

    def _text_tree(self):
        rng = np.random.default_rng(0)
        f = lambda *s: rng.normal(size=s).astype(np.float32)  # noqa: E731
        layer = {
            "input_layernorm": {"weight": f(8)},
            "post_attention_layernorm": {"weight": f(8)},
            "self_attn": {
                "q_proj": {"kernel": f(8, 8)}, "k_proj": {"kernel": f(8, 8)},
                "v_proj": {"kernel": f(8, 8)}, "o_proj": {"kernel": f(8, 8)},
                "q_norm": {"weight": f(4)}, "k_norm": {"weight": f(4)},
            },
            "mlp": {
                "gate": {"kernel": f(8, 4)},
                "shared_expert_gate": {"kernel": f(8, 1)},
                "shared_expert": {
                    "gate_proj": {"kernel": f(8, 16)}, "up_proj": {"kernel": f(8, 16)},
                    "down_proj": {"kernel": f(16, 8)},
                },
                "experts": {
                    "gate_proj": f(4, 8, 16), "up_proj": f(4, 8, 16), "down_proj": f(4, 16, 8),
                },
            },
        }
        return {
            "model": {"language_model": {
                "embed_tokens": {"embedding": f(16, 8)},
                "norm": {"weight": f(8)},
                "layers_0": layer,
            }},
            "head": {"custom_text_proj": {"kernel": f(8, 4), "bias": f(4)}},
        }

    def test_moe_experts_export_per_expert(self):
        from colpali_tpu.core.hf_export import export_colqwen35_state_dict

        tree = self._text_tree()
        state = export_colqwen35_state_dict(tree, strict=True)  # must not raise
        key = "model.language_model.layers.0.mlp.experts.2.gate_proj.weight"
        assert key in state, sorted(state)[:5]
        np.testing.assert_array_equal(
            state[key], tree["model"]["language_model"]["layers_0"]["mlp"]["experts"]["gate_proj"][2].T
        )
        assert "custom_text_proj.weight" in state

    def test_ungroup_inverts_group_hybrid(self):
        from colpali_tpu.core.hf_export import ungroup_hybrid_params
        from colpali_tpu.core.hf_loader import group_hybrid_params

        rng = np.random.default_rng(1)
        tree = {"layers_" + str(i): {"w": {"kernel": rng.normal(size=(3, 3)).astype(np.float32)}}
                for i in range(4)}
        grouped = group_hybrid_params({"lm": tree}, interval=2)
        restored = ungroup_hybrid_params(grouped)
        assert set(restored["lm"].keys()) == set(tree.keys())
        for k in tree:
            np.testing.assert_array_equal(restored["lm"][k]["w"]["kernel"], tree[k]["w"]["kernel"])

    def test_grouped_tree_exports(self):
        from colpali_tpu.core.hf_export import export_colqwen35_state_dict
        from colpali_tpu.core.hf_loader import group_hybrid_params

        tree = self._text_tree()
        # duplicate the layer so grouping (interval 2) applies
        tree["model"]["language_model"]["layers_1"] = jax.tree.map(
            lambda x: x + 1.0, tree["model"]["language_model"]["layers_0"]
        )
        flat = export_colqwen35_state_dict(tree, strict=True)
        grouped = group_hybrid_params(tree, interval=2)
        regrouped = export_colqwen35_state_dict(grouped, strict=True)
        assert set(flat) == set(regrouped)
        for k in flat:
            np.testing.assert_array_equal(flat[k], regrouped[k])


class TestOmniExportRoundTrip:
    def test_thinker_checkpoint_roundtrips(self, tmp_path):
        """export_colqwen_omni_state_dict inverts load_colqwen_omni_params:
        thinker-layout synth -> flax params -> export -> reload == identity
        (audio tower re-prefixed, text under model., vision attn unfused
        q/k/v without the _proj suffix)."""
        import subprocess
        import sys

        import jax
        import numpy as np
        from safetensors.numpy import save_file

        from colpali_tpu.core.hf_export import export_colqwen_omni_state_dict
        from colpali_tpu.core.hf_loader import load_colqwen_omni_params

        import pathlib

        repo = pathlib.Path(__file__).resolve().parents[2]
        script = repo / "scripts" / "validate_checkpoint.py"
        synth = tmp_path / "omni"
        r = subprocess.run(
            [sys.executable, str(script), "--make-synth", "colqwen-omni-tiny", str(synth)],
            capture_output=True, text=True, cwd=str(repo), timeout=300,
            env={"PYTHONPATH": "", "JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin"},
        )
        assert r.returncode == 0, r.stderr[-2000:]

        params = load_colqwen_omni_params(str(synth))
        state = export_colqwen_omni_state_dict(params)
        out = tmp_path / "exported"
        out.mkdir()
        save_file({k: np.ascontiguousarray(v) for k, v in state.items()},
                  str(out / "model.safetensors"), metadata={"format": "pt"})
        params2 = load_colqwen_omni_params(str(out))
        flat1 = {jax.tree_util.keystr(p): v
                 for p, v in jax.tree_util.tree_leaves_with_path(params)}
        flat2 = {jax.tree_util.keystr(p): v
                 for p, v in jax.tree_util.tree_leaves_with_path(params2)}
        assert set(flat1) == set(flat2)
        for k in flat1:
            np.testing.assert_array_equal(np.asarray(flat1[k]), np.asarray(flat2[k]), err_msg=k)
