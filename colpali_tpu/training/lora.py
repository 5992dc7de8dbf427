"""LoRA: low-rank adaptation over the param pytree.

Reference recipe (SURVEY.md §6): r=32, alpha=32, dropout 0.1, gaussian init,
targets = LM projection layers + ``custom_text_proj``
(scripts/configs/qwen2/train_colqwen2_model.py:82-90).

TPU-first design: instead of wrapping every Linear module (the torch/peft
way), adapters live in a parallel pytree and are merged into the frozen base
on the fly INSIDE the jitted train step — ``W_eff = W + (alpha/r) A @ B``.
XLA fuses the rank-r update into the consuming matmul's producer; the base
tree is donated/frozen so only adapter grads and optimizer state are
trainable memory. LoRA dropout is row-dropout on A (see merge_lora).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict

import jax
import jax.numpy as jnp

# Matches the reference's target regex: attention + MLP projections of the LM
# and the retrieval head — across EVERY family's naming: qwen/gemma/pali use
# language_model, idefics3/modernvbert use text_model; ModernBERT's MLP is
# Wi/Wo instead of gate/up/down; ColIdefics3 names its head "linear"
# (reference scripts/configs/idefics/train_colsmolvlm_model.yaml:71 keeps the
# custom_text_proj target there even though its idefics head is also
# "linear" — we adapt the real head instead).
DEFAULT_TARGET_PATTERN = (
    r".*(language_model|text_model).*/(q_proj|k_proj|v_proj|o_proj|gate_proj|up_proj|down_proj|Wi|Wo)/kernel"
    r"|.*(custom_text_proj|head/linear)/kernel"
)


@dataclasses.dataclass
class LoraSpec:
    """YAML-facing LoRA recipe — the reference's ``peft_config``
    (peft.LoraConfig: r / lora_alpha / lora_dropout / gaussian init /
    target_modules, scripts/configs/qwen2/train_colqwen2_model.py:82-90).
    Attach via ``ColModelTrainingConfig(peft=LoraSpec(...))``."""

    rank: int = 32
    alpha: float = 32.0
    dropout: float = 0.1
    target_pattern: str = DEFAULT_TARGET_PATTERN
    init_stddev: float = 0.01  # "gaussian" init_lora_weights


def _iter_kernels(params: Dict[str, Any]):
    for path_tuple, leaf in jax.tree_util.tree_leaves_with_path(params):
        path = "/".join(str(getattr(k, "key", k)) for k in path_tuple)
        yield path, path_tuple, leaf


def init_lora_params(
    params: Dict[str, Any],
    rng: jax.Array,
    rank: int = 32,
    target_pattern: str = DEFAULT_TARGET_PATTERN,
    stddev: float = 0.01,
) -> Dict[str, Any]:
    """Create the adapter pytree: for each matching ``(in, out)`` kernel, an
    ``a (in, r)`` gaussian and ``b (r, out)`` zeros (so training starts at
    the base model exactly). scan_layers-stacked kernels ``(L, in, out)``
    get per-layer adapters ``(L, in, r)`` / ``(L, r, out)``."""
    lora: Dict[str, Any] = {}
    matched = 0
    for path, _ptuple, leaf in _iter_kernels(params):
        if re.fullmatch(target_pattern, path) and leaf.ndim in (2, 3):
            rng, sub = jax.random.split(rng)
            *stack, fan_in, fan_out = leaf.shape
            lora[path] = {
                "a": jax.random.normal(sub, (*stack, fan_in, rank), jnp.float32) * stddev,
                "b": jnp.zeros((*stack, rank, fan_out), jnp.float32),
            }
            matched += 1
    if matched == 0:
        raise ValueError(f"LoRA target pattern matched no kernels: {target_pattern}")
    return lora


def merge_lora(
    params: Dict[str, Any],
    lora: Dict[str, Any],
    alpha: float = 32.0,
    rank: int = 32,
    dropout: float = 0.0,
    dropout_rng: jax.Array | None = None,
) -> Dict[str, Any]:
    """W + (alpha/r) A @ B for adapted kernels; identity elsewhere. Pure and
    jit-friendly (call inside the train step).

    ``dropout``/``dropout_rng``: LoRA dropout (reference recipe: 0.1,
    scripts/configs/qwen2/train_colqwen2_model.py:82-90). peft drops input
    features of the adapter branch per token; in the weight-merge design the
    equivalent is dropping rows of A — the same expectation, with one mask
    shared across the step's tokens instead of per-token (the only form
    expressible as a weight update, which is what lets XLA fuse the rank-r
    delta into the consuming matmul)."""
    import zlib

    scale = alpha / rank
    keep = 1.0 - dropout
    use_dropout = dropout > 0.0 and dropout_rng is not None

    def merge(path_tuple, leaf):
        path = "/".join(str(getattr(k, "key", k)) for k in path_tuple)
        adapter = lora.get(path)
        if adapter is None:
            return leaf
        a = adapter["a"]
        if use_dropout:
            # crc32(path) is deterministic across processes (unlike hash())
            sub = jax.random.fold_in(dropout_rng, zlib.crc32(path.encode()) & 0x7FFFFFFF)
            mask = jax.random.bernoulli(sub, keep, (*a.shape[:-1], 1))
            a = a * mask.astype(a.dtype) / keep
        # (in, r) @ (r, out), batched over a leading stacked-layer dim if
        # present (scan_layers kernels are (L, in, out))
        delta = jnp.matmul(a, adapter["b"]) * scale
        return leaf + delta.astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(merge, params)


def make_lora_train_step(loss_forward, alpha: float = 32.0, rank: int = 32, dropout: float = 0.0):
    """Wrap a ``loss_forward(params, batch)`` into a LoRA objective
    ``loss(lora, base_params, batch[, dropout_rng])``.

    ``base_params`` is an explicit argument — NEVER close the jitted loss
    over the base tree: jit captures closures as constants, and serializing
    a multi-GB constant through the axon tunnel hangs compilation for 15+
    minutes (see docs/PERF.md). As an argument it can also be donated.
    """

    def lora_loss(lora: Dict[str, Any], base_params, batch, dropout_rng=None):
        merged = merge_lora(
            base_params, lora, alpha=alpha, rank=rank, dropout=dropout, dropout_rng=dropout_rng
        )
        return loss_forward(merged, batch)

    return lora_loss


def count_params(tree: Any) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(tree))
