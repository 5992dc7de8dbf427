"""Flax params -> HF torch-layout state dict: the reverse of hf_loader.

The reference's ``save_pretrained`` emits checkpoints any torch/transformers
user can load (trainer/colmodel_training.py:109-118). This module gives the
flax trainer the same property by mechanically inverting hf_loader's
declarative ``(torch_key_regex, flax_path_template, transform)`` rule tables:

- each flax leaf path is matched against a rule's path template,
- the rule's torch regex is *rendered* into a concrete key (capture groups
  substituted, optional non-capturing groups dropped),
- the tensor transform is inverted (transpose back, re-fold conv kernels),
- the rendered key is validated by re-matching the forward regex, so the
  inversion can never silently drift from the loader.

Family wrappers add the inverse composite steps (re-fusing qkv, unstacking
scanned layers and MoE experts, dropping synthesized params) and
``adapt_keys_to`` re-dresses canonical keys into whatever layout a target
transformers version reports — using the same normalization remaps the
loader trusts.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Iterable, Mapping, Optional, Sequence, Tuple

import jax
import numpy as np

from colpali_tpu.core.hf_loader import (
    GEMMA3_RULES,
    IDEFICS3_RULES,
    MODERNVBERT_RULES,
    OMNI_AUDIO_RULES,
    PALIGEMMA_RULES,
    QWEN2_VL_RULES,
    QWEN25_VL_RULES,
    QWEN3_VL_RULES,
    QWEN35_RULES,
    _RuleT,
    normalize_keys,
    t_conv1d,
    t_conv1d_depthwise,
    t_conv2d,
    t_conv3d_patch,
    t_id,
    t_linear,
)


def _inv_conv3d_patch(a: np.ndarray, ctx: Mapping[str, Any]) -> np.ndarray:
    """dense (C*T*pH*pW, O) -> torch Conv3d (O, C, T, pH, pW); the fold needs
    the patch geometry, passed via ctx["conv3d_patch_shape"]."""
    c, t, ph, pw = ctx["conv3d_patch_shape"]
    return np.ascontiguousarray(np.asarray(a).T).reshape(-1, c, t, ph, pw)


_INVERSES: Dict[Callable, Callable[[np.ndarray, Mapping[str, Any]], np.ndarray]] = {
    t_id: lambda a, ctx: np.asarray(a),
    t_linear: lambda a, ctx: np.ascontiguousarray(np.asarray(a).T),
    t_conv2d: lambda a, ctx: np.ascontiguousarray(np.asarray(a).transpose(3, 2, 0, 1)),
    t_conv1d: lambda a, ctx: np.ascontiguousarray(np.asarray(a).transpose(2, 1, 0)),
    t_conv1d_depthwise: lambda a, ctx: np.ascontiguousarray(np.asarray(a).T)[:, None, :],
    t_conv3d_patch: _inv_conv3d_patch,
}


def _matching_paren(s: str, start: int) -> int:
    depth = 0
    i = start
    while i < len(s):
        if s[i] == "\\":
            i += 2
            continue
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError(f"Unbalanced parens in {s!r}")


def render_torch_key(pattern: str, groups: Sequence[str]) -> Optional[str]:
    """Render a rule's torch-key regex into a concrete key by substituting
    the capture groups in order; optional non-capturing groups are dropped
    (the canonical HF layout omits them). Returns None if the pattern has
    constructs we can't render (e.g. bare wildcards in dropped rules)."""
    out = []
    gi = 0
    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "\\":
            out.append(pattern[i + 1])
            i += 2
        elif c == "(":
            j = _matching_paren(pattern, i)
            body = pattern[i + 1 : j]
            optional = j + 1 < n and pattern[j + 1] == "?"
            if body.startswith("?:"):
                if not optional:
                    inner = render_torch_key(body[2:], [])
                    if inner is None:
                        return None
                    out.append(inner)
                i = j + (2 if optional else 1)
            else:
                if gi >= len(groups):
                    return None
                out.append(str(groups[gi]))
                gi += 1
                i = j + 1
        elif c in ".*+?[]|^$":
            return None  # un-escaped regex metachar: not renderable
        else:
            out.append(c)
            i += 1
    if gi != len(groups):
        return None
    return "".join(out)


def _template_regex(template: str) -> re.Pattern:
    esc = re.escape(template)
    esc = esc.replace(re.escape("{i}"), r"(\d+)")
    esc = esc.replace(re.escape("{j}"), r"([A-Za-z0-9_]+)")
    return re.compile(esc)


def export_state_dict(
    params: Dict[str, Any],
    rules: Tuple[_RuleT, ...],
    ctx: Optional[Mapping[str, Any]] = None,
    strict: bool = True,
) -> Dict[str, np.ndarray]:
    """Translate a flax param tree into a torch-layout state dict (numpy
    values) using the *forward* rule table, inverted."""
    ctx = ctx or {}
    inv_rules = [
        (_template_regex(template), pattern, transform)
        for pattern, template, transform in rules
        if template
    ]
    out: Dict[str, np.ndarray] = {}
    unmatched = []
    for path_tuple, leaf in jax.tree_util.tree_leaves_with_path(params):
        path = "/".join(str(getattr(k, "key", k)) for k in path_tuple)
        for treg, pattern, transform in inv_rules:
            m = treg.fullmatch(path)
            if m is None:
                continue
            key = render_torch_key(pattern, m.groups())
            if key is None or re.fullmatch(pattern, key) is None:
                continue  # template matched but the torch side disagrees: next rule
            out[key] = _INVERSES[transform](leaf, ctx)
            break
        else:
            unmatched.append(path)
    if unmatched and strict:
        raise ValueError(f"Unexported flax params ({len(unmatched)}): {unmatched[:10]} ...")
    return out


# ---------------------------------------------------------------------------
# Inverse composite steps
# ---------------------------------------------------------------------------


def fuse_qkv(
    state: Dict[str, np.ndarray],
    scope: str = r"visual\.blocks\.\d+\.attn",
    fused_name: str = "qkv",
) -> Dict[str, np.ndarray]:
    """Re-fuse split ``{q,k,v}_proj`` into the fused projection some HF
    layouts use (inverse of hf_loader.split_fused_qkv / split_fused_wqkv)."""
    pat = re.compile(rf"({scope})\.q_proj\.(weight|bias)")
    out = dict(state)
    for key in list(out):
        m = pat.fullmatch(key)
        if m is None:
            continue
        base, kind = m.group(1), m.group(2)
        parts = [out.pop(f"{base}.{p}_proj.{kind}") for p in ("q", "k", "v")]
        out[f"{base}.{fused_name}.{kind}"] = np.concatenate(parts, axis=0)
    return out


def unstack_layer_params(
    params: Dict[str, Any],
    stack_names: Tuple[str, ...] = ("layers", "blocks"),
) -> Dict[str, Any]:
    """Inverse of hf_loader.stack_layer_params: split scanned
    ``layers/layer/...`` stacked subtrees back into ``layers_{i}/...``.
    Idempotent on already-unrolled trees."""
    if not isinstance(params, dict):
        return params
    out: Dict[str, Any] = {}
    for key, value in params.items():
        if (
            key in stack_names
            and isinstance(value, dict)
            and set(value.keys()) == {"layer"}
        ):
            stacked = value["layer"]
            n = jax.tree.leaves(stacked)[0].shape[0]
            for i in range(n):
                out[f"{key}_{i}"] = jax.tree.map(lambda x, i=i: x[i], stacked)
        else:
            out[key] = unstack_layer_params(value, stack_names)
    return out


def ungroup_hybrid_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of hf_loader.group_hybrid_params: a grouped-scan
    ``layers/layer/sub_{j}`` subtree (leading stacked group axis) unrolls
    back to ``layers_{g*interval+j}``. Idempotent on other layouts."""
    if not isinstance(params, dict):
        return params
    out: Dict[str, Any] = {}
    for key, value in params.items():
        if (
            key == "layers"
            and isinstance(value, dict)
            and set(value.keys()) == {"layer"}
            and isinstance(value["layer"], dict)
            and value["layer"]
            and all(re.fullmatch(r"sub_\d+", k) for k in value["layer"])
        ):
            subs = value["layer"]
            interval = len(subs)
            n_groups = jax.tree.leaves(subs)[0].shape[0]
            for g in range(n_groups):
                for j in range(interval):
                    out[f"layers_{g * interval + j}"] = jax.tree.map(
                        lambda x, g=g: x[g], subs[f"sub_{j}"]
                    )
        else:
            out[key] = ungroup_hybrid_params(value)
    return out


def unstack_expert_weights(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Inverse of hf_loader.stack_expert_weights, applied on the exported
    torch-layout dict: a stacked ``...mlp.experts.{gate,up,down}_proj``
    (E, d_in, d_out) entry becomes E per-expert ``experts.N.*.weight``
    (d_out, d_in) entries."""
    pat = re.compile(r"(language_model\.layers\.\d+\.mlp\.experts)\.(gate|up|down)_proj")
    out: Dict[str, np.ndarray] = {}
    for key, value in state.items():
        m = pat.fullmatch(key)
        if m is None:
            out[key] = value
            continue
        for e in range(value.shape[0]):
            out[f"{m.group(1)}.{e}.{m.group(2)}_proj.weight"] = np.ascontiguousarray(
                np.asarray(value[e]).T
            )
    return out


def dress_keys_modern(
    state: Dict[str, np.ndarray], scopes: Tuple[str, ...]
) -> Dict[str, np.ndarray]:
    """Prefix loader-canonical keys with ``model.`` for the named scopes —
    the nesting modern transformers composite models report (e.g. Qwen2-VL's
    ``model.visual.* / model.language_model.*``). Without this a torch
    ``load_state_dict`` marks every weight missing; the loader's remaps strip
    the prefix right back on re-import."""
    pat = re.compile(rf"^({'|'.join(map(re.escape, scopes))})\.")
    return {pat.sub(r"model.\1.", k): v for k, v in state.items()}


def adapt_keys_to(
    state: Dict[str, np.ndarray],
    target_keys: Iterable[str],
    remaps: Tuple[Tuple[str, str], ...],
) -> Dict[str, np.ndarray]:
    """Re-dress exported keys into a target layout (e.g. an older
    transformers nesting): BOTH sides are normalized with the SAME remaps
    the loader uses; when the normalized forms match, the export adopts the
    target's spelling."""

    def norm(key: str) -> str:
        for pattern, repl in remaps:
            key = re.sub(pattern, repl, key)
        return key

    canon_to_target = {norm(tk): tk for tk in target_keys}
    return {canon_to_target.get(norm(k), k): v for k, v in state.items()}


# ---------------------------------------------------------------------------
# Family exporters (inverse of the load_col*_params functions)
# ---------------------------------------------------------------------------


def export_colpali_state_dict(params: Dict[str, Any], strict: bool = True) -> Dict[str, np.ndarray]:
    """Flax (Col)PaliGemma params -> HF torch-layout state dict."""
    return export_state_dict(unstack_layer_params(params), PALIGEMMA_RULES, strict=strict)


def _conv3d_ctx(channels: int, temporal_patch_size: int, patch_size: int) -> Dict[str, Any]:
    return {"conv3d_patch_shape": (channels, temporal_patch_size, patch_size, patch_size)}


def export_colqwen2_state_dict(
    params: Dict[str, Any],
    channels: int = 3,
    temporal_patch_size: int = 2,
    patch_size: int = 14,
    strict: bool = True,
) -> Dict[str, np.ndarray]:
    """Flax (Col)Qwen2-VL params -> HF torch-layout state dict (vision qkv
    re-fused, patch conv re-folded to (O, C, T, pH, pW))."""
    state = export_state_dict(
        unstack_layer_params(params),
        QWEN2_VL_RULES,
        ctx=_conv3d_ctx(channels, temporal_patch_size, patch_size),
        strict=strict,
    )
    return dress_keys_modern(fuse_qkv(state), ("visual", "language_model"))


def export_colqwen25_state_dict(
    params: Dict[str, Any],
    channels: int = 3,
    temporal_patch_size: int = 2,
    patch_size: int = 14,
    strict: bool = True,
) -> Dict[str, np.ndarray]:
    """Flax (Col)Qwen2.5-VL params -> HF torch-layout state dict."""
    state = export_state_dict(
        unstack_layer_params(params),
        QWEN25_VL_RULES,
        ctx=_conv3d_ctx(channels, temporal_patch_size, patch_size),
        strict=strict,
    )
    return dress_keys_modern(fuse_qkv(state), ("visual", "language_model"))


def export_colqwen3_state_dict(
    params: Dict[str, Any],
    channels: int = 3,
    temporal_patch_size: int = 2,
    patch_size: int = 16,
    strict: bool = True,
) -> Dict[str, np.ndarray]:
    """Flax (Col)Qwen3-VL params -> HF torch-layout state dict (HF Qwen3-VL
    vision attention ships FUSED ``attn.qkv`` — transformers 4.57
    modeling_qwen3_vl — which hf_loader.split_fused_qkv re-splits on
    import)."""
    state = export_state_dict(
        unstack_layer_params(params),
        QWEN3_VL_RULES,
        ctx=_conv3d_ctx(channels, temporal_patch_size, patch_size),
        strict=strict,
    )
    return dress_keys_modern(fuse_qkv(state), ("visual", "language_model"))


def export_colqwen35_state_dict(
    params: Dict[str, Any],
    channels: int = 3,
    temporal_patch_size: int = 2,
    patch_size: int = 16,
    strict: bool = True,
) -> Dict[str, np.ndarray]:
    """Flax (Col)Qwen3.5 params -> HF torch-layout state dict (grouped
    hybrid-scan trees unrolled, stacked MoE experts unstacked into
    per-expert entries; vision attention re-fused into ``attn.qkv`` — the
    Qwen3-VL-tower layout split_fused_qkv inverts on import)."""
    state = export_state_dict(
        unstack_layer_params(ungroup_hybrid_params(params)),
        QWEN35_RULES,
        ctx=_conv3d_ctx(channels, temporal_patch_size, patch_size),
        strict=strict,
    )
    return dress_keys_modern(
        fuse_qkv(unstack_expert_weights(state)), ("visual", "language_model"))


def export_colqwen_omni_state_dict(
    params: Dict[str, Any],
    channels: int = 3,
    temporal_patch_size: int = 2,
    patch_size: int = 14,
    strict: bool = True,
) -> Dict[str, np.ndarray]:
    """Flax (Col)Qwen2.5-Omni params -> HF thinker-layout state dict.

    The thinker checkpoint layout (Qwen2_5OmniThinkerForConditionalGeneration
    state dict; reference modeling_colqwen_omni.py:10-30) is the OLDER flat
    nesting: ``audio_tower.* / visual.* / model.*`` (text directly under
    ``model.``), vision attention as UNFUSED ``attn.{q,k,v}`` without the
    ``_proj`` suffix — load_colqwen_omni_params' remaps invert all of this."""
    params = unstack_layer_params(params)
    model = params.get("model", params)
    audio = export_state_dict(model["audio_tower"], OMNI_AUDIO_RULES, strict=strict)
    rest_tree: Dict[str, Any] = {
        "model": {k: v for k, v in model.items() if k != "audio_tower"}
    }
    if "head" in params:
        rest_tree["head"] = params["head"]
    rest = export_state_dict(
        rest_tree,
        QWEN25_VL_RULES,
        ctx=_conv3d_ctx(channels, temporal_patch_size, patch_size),
        strict=strict,
    )
    out = {f"audio_tower.{k}": v for k, v in audio.items()}
    for k, v in rest.items():
        k = re.sub(r"^language_model\.", "model.", k)
        k = re.sub(r"(\.attn)\.(q|k|v)_proj\.", r"\1.\2.", k)
        out[k] = v
    return out


def export_colidefics3_state_dict(
    params: Dict[str, Any], strict: bool = True
) -> Dict[str, np.ndarray]:
    """Flax (Col)Idefics3/SmolVLM params -> HF torch-layout state dict."""
    state = export_state_dict(unstack_layer_params(params), IDEFICS3_RULES, strict=strict)
    return dress_keys_modern(state, ("vision_model", "text_model", "connector"))


def export_colgemma3_state_dict(
    params: Dict[str, Any], strict: bool = True
) -> Dict[str, np.ndarray]:
    """Flax (Col)Gemma3 params -> HF torch-layout state dict."""
    state = export_state_dict(unstack_layer_params(params), GEMMA3_RULES, strict=strict)
    return dress_keys_modern(state, ("vision_tower", "multi_modal_projector", "language_model"))


def export_colmodernvbert_state_dict(
    params: Dict[str, Any], strict: bool = True
) -> Dict[str, np.ndarray]:
    """Flax (Col)ModernVBert params -> HF torch-layout state dict (text Wqkv
    re-fused; the synthesized layer-0 attn_norm — identity in HF — dropped)."""
    params = unstack_layer_params(params)
    layers = params.get("model", {}).get("text_model", {})
    if "layers_0" in layers and "attn_norm" in layers["layers_0"]:
        # shallow rebuild along the one path (leaf arrays shared — a
        # deepcopy would transiently double the whole model in host RAM)
        params = dict(params)
        params["model"] = dict(params["model"])
        params["model"]["text_model"] = dict(params["model"]["text_model"])
        params["model"]["text_model"]["layers_0"] = {
            k: v for k, v in params["model"]["text_model"]["layers_0"].items() if k != "attn_norm"
        }
    state = export_state_dict(params, MODERNVBERT_RULES, strict=strict)
    return fuse_qkv(state, scope=r"model\.text_model\.layers\.\d+\.attn", fused_name="Wqkv")


# model class name -> exporter (used by save_pretrained/orchestrator)
EXPORTERS: Dict[str, Callable] = {
    "ColPali": export_colpali_state_dict,
    "BiPali": export_colpali_state_dict,
    "BiPaliProj": export_colpali_state_dict,
    "ColQwen2": export_colqwen2_state_dict,
    "BiQwen2": export_colqwen2_state_dict,
    "ColQwen2_5": export_colqwen25_state_dict,
    "BiQwen2_5": export_colqwen25_state_dict,
    "ColQwen3": export_colqwen3_state_dict,
    "BiQwen3": export_colqwen3_state_dict,
    "ColQwen3_5": export_colqwen35_state_dict,
    "BiQwen3_5": export_colqwen35_state_dict,
    "ColQwen2_5Omni": export_colqwen_omni_state_dict,
    "BiQwen2_5Omni": export_colqwen_omni_state_dict,
    "ColIdefics3": export_colidefics3_state_dict,
    "BiIdefics3": export_colidefics3_state_dict,
    "ColGemma3": export_colgemma3_state_dict,
    "BiGemma3": export_colgemma3_state_dict,
    "ColModernVBert": export_colmodernvbert_state_dict,
    "BiModernVBert": export_colmodernvbert_state_dict,
}
