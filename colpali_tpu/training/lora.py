"""LoRA: low-rank adaptation over the param pytree.

Reference recipe (SURVEY.md §6): r=32, alpha=32, dropout 0.1, gaussian init,
targets = LM projection layers + ``custom_text_proj``
(scripts/configs/qwen2/train_colqwen2_model.py:82-90).

TPU-first design: instead of wrapping every Linear module (the torch/peft
way), adapters live in a parallel pytree and are merged into the frozen base
on the fly INSIDE the jitted train step — ``W_eff = W + (alpha/r) A @ B``.
XLA fuses the rank-r update into the consuming matmul's producer; the base
tree is donated/frozen so only adapter grads and optimizer state are
trainable memory.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax
import jax.numpy as jnp

# Matches the reference's target regex: attention + MLP projections of the LM
# and the retrieval head.
DEFAULT_TARGET_PATTERN = (
    r".*(language_model|text_model).*/(q_proj|k_proj|v_proj|o_proj|gate_proj|up_proj|down_proj)/kernel"
    r"|.*custom_text_proj/kernel"
)


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
    the base model exactly)."""
    lora: Dict[str, Any] = {}
    matched = 0
    for path, _ptuple, leaf in _iter_kernels(params):
        if re.fullmatch(target_pattern, path) and leaf.ndim == 2:
            rng, sub = jax.random.split(rng)
            fan_in, fan_out = leaf.shape
            lora[path] = {
                "a": jax.random.normal(sub, (fan_in, rank), jnp.float32) * stddev,
                "b": jnp.zeros((rank, fan_out), jnp.float32),
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
) -> Dict[str, Any]:
    """W + (alpha/r) A @ B for adapted kernels; identity elsewhere. Pure and
    jit-friendly (call inside the train step)."""
    scale = alpha / rank

    def merge(path_tuple, leaf):
        path = "/".join(str(getattr(k, "key", k)) for k in path_tuple)
        adapter = lora.get(path)
        if adapter is None:
            return leaf
        delta = (adapter["a"] @ adapter["b"]) * scale
        return leaf + delta.astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(merge, params)


def make_lora_train_step(loss_forward, base_params, alpha: float = 32.0, rank: int = 32):
    """Wrap a ``loss_forward(params, batch)`` into a LoRA objective
    ``loss(lora, batch)`` with the base frozen (closure constant under jit).
    """

    def lora_loss(lora: Dict[str, Any], batch):
        merged = merge_lora(base_params, lora, alpha=alpha, rank=rank)
        return loss_forward(merged, batch)

    return lora_loss


def count_params(tree: Any) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(tree))
