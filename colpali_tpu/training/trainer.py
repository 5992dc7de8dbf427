"""Contrastive training: pjit/GSPMD data-parallel loop.

Reference behavior being reproduced (SURVEY.md §3.1-3.2):
- three forwards per step (query / positive doc / optional negative docs),
  key-prefixed batches (contrastive_trainer.py:184-208)
- documents contribute as in-batch negatives GLOBALLY across the
  data-parallel axis. The reference does this with an explicit
  grad-preserving NCCL all_gather + rank offset
  (contrastive_trainer.py:135-162); under GSPMD the loss is simply written
  over the global batch and XLA inserts the gather where the sharded einsum
  needs it — gradients flow through collectives by construction.
- AdamW + linear warmup / linear decay + grad clipping
  (colmodel_torch_training.py:98-112,189-197).

The train step is model-agnostic: it takes the flax apply_fn of any Col*/Bi*
model in this package.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from colpali_tpu.models.layers import flash_mesh
from colpali_tpu.parallel.sharding import DEFAULT_TP_RULES, batch_sharding, tree_shardings

Batch = Dict[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Mirrors the reference recipe constants (SURVEY.md §6)."""

    learning_rate: float = 2e-4
    weight_decay: float = 0.01
    warmup_steps: int = 100
    total_steps: int = 1000
    max_grad_norm: float = 1.0
    b1: float = 0.9
    b2: float = 0.999


def create_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    """AdamW with linear warmup then linear decay to zero."""
    schedule = optax.join_schedules(
        [
            optax.linear_schedule(0.0, config.learning_rate, config.warmup_steps),
            optax.linear_schedule(
                config.learning_rate, 0.0, max(config.total_steps - config.warmup_steps, 1)
            ),
        ],
        boundaries=[config.warmup_steps],
    )
    return optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adamw(schedule, b1=config.b1, b2=config.b2, weight_decay=config.weight_decay),
    )


class TrainState(train_state.TrainState):
    pass


def create_train_state(
    apply_fn: Callable,
    params: Dict[str, Any],
    config: TrainConfig,
    trainable_mask: Optional[Dict[str, Any]] = None,
) -> TrainState:
    """Build the train state; ``trainable_mask`` freezes params where False
    (LoRA-style selective training uses this)."""
    tx = create_optimizer(config)
    if trainable_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree.map(lambda t: "train" if t else "freeze", trainable_mask),
        )
    return TrainState.create(apply_fn=apply_fn, params=params, tx=tx)


def _forward(apply_fn, params, batch: Batch, prefix: str,
             extra_vars: dict | None = None) -> jnp.ndarray:
    """One prefixed forward. Negative docs arrive as (B, n_neg, ...) and are
    flattened into the batch dim (collator reshape, reference
    visual_retriever_collator.py:122-124 inverted).

    ``extra_vars``: additional flax collections merged into the variables
    dict — e.g. the ``quant`` scales of a stored-int8 frozen tower."""
    variables = {"params": params, **(extra_vars or {})}
    ids = batch[f"{prefix}input_ids"]
    mask = batch[f"{prefix}attention_mask"]
    pixels = batch.get(f"{prefix}pixel_values")
    if ids.ndim == 3:  # (B, n_neg, S) -> (B*n_neg, S)
        b, n, s = ids.shape
        ids = ids.reshape(b * n, s)
        mask = mask.reshape(b * n, s)
        if pixels is not None:
            pixels = pixels.reshape(b * n, *pixels.shape[2:])
        emb = apply_fn(variables, ids, mask, pixels)
        return emb.reshape(b, n, *emb.shape[1:])
    return apply_fn(variables, ids, mask, pixels)


def make_train_step(
    loss_fn: Callable,
    has_negatives: bool = False,
) -> Callable[[TrainState, Batch], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the (jittable) train step.

    ``loss_fn(query_embeddings, doc_embeddings, [neg_doc_embeddings,]
    offset=0)`` — any loss from :mod:`colpali_tpu.losses`. Under GSPMD the
    batch passed in is the GLOBAL batch (sharded over the data axis), so
    ``offset=0`` gives exactly the reference's gathered-documents semantics.
    """

    def train_step(state: TrainState, batch: Batch):
        def compute_loss(params):
            q = _forward(state.apply_fn, params, batch, "query_")
            d = _forward(state.apply_fn, params, batch, "doc_")
            if has_negatives:
                n = _forward(state.apply_fn, params, batch, "neg_doc_")
                return loss_fn(q, d, n)
            return loss_fn(q, d)

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        new_state = state.apply_gradients(grads=grads)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return train_step


def make_peft_train_step(
    loss_fn: Callable,
    peft,
    has_negatives: bool = False,
    seed: int = 0,
    quant: dict | None = None,
) -> Callable:
    """LoRA train step: ``state.params`` is the ADAPTER tree; the frozen base
    is an explicit step argument (never a jit closure — a multi-GB closure
    constant hangs remote-lowering, see lora.make_lora_train_step). Grads and
    optimizer moments exist only for the rank-r adapters; the merged weights
    ``W + (alpha/r) A @ B`` are rebuilt inside the step, where XLA fuses the
    rank-r delta into each consuming matmul.

    ``quant``: the ``quant`` collection matching a base tree whose FROZEN
    tower kernels are stored int8 (``ops.quant_dense.quantize_params`` with
    a vision path_filter) — the QLoRA-style quantized-base recipe. Closure
    capture is safe here: it holds only per-channel fp32 scales (MBs, not
    the multi-GB weights). Measured: 234.7 -> 219.3 ms/step on the
    ColQwen2-2B bench (frozen tower int8 runs the MXU at 2x).

    Signature: ``train_step(state, batch, base_params)``.
    """
    from colpali_tpu.training.lora import merge_lora

    def train_step(state: TrainState, batch: Batch, base_params):
        # per-step LoRA dropout rng, derived from the traced step counter
        rng = jax.random.fold_in(jax.random.PRNGKey(seed), state.step)

        def compute_loss(lora):
            params = merge_lora(
                base_params, lora, alpha=peft.alpha, rank=peft.rank,
                dropout=peft.dropout, dropout_rng=rng,
            )
            q = _forward(state.apply_fn, params, batch, "query_", {"quant": quant} if quant else None)
            d = _forward(state.apply_fn, params, batch, "doc_", {"quant": quant} if quant else None)
            if has_negatives:
                n = _forward(state.apply_fn, params, batch, "neg_doc_", {"quant": quant} if quant else None)
                return loss_fn(q, d, n)
            return loss_fn(q, d)

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        new_state = state.apply_gradients(grads=grads)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return train_step


def make_peft_eval_step(
    loss_fn: Callable,
    peft,
    has_negatives: bool = False,
    quant: dict | None = None,
) -> Callable:
    """Eval twin of :func:`make_peft_train_step` (no dropout):
    ``eval_step(state, batch, base_params) -> (loss, q, d)``."""
    from colpali_tpu.training.lora import merge_lora

    def eval_step(state: TrainState, batch: Batch, base_params):
        params = merge_lora(base_params, state.params, alpha=peft.alpha, rank=peft.rank)
        extra = {"quant": quant} if quant else None
        q = _forward(state.apply_fn, params, batch, "query_", extra)
        d = _forward(state.apply_fn, params, batch, "doc_", extra)
        if has_negatives and "neg_doc_input_ids" in batch:
            n = _forward(state.apply_fn, params, batch, "neg_doc_", extra)
            return loss_fn(q, d, n), q, d
        return loss_fn(q, d), q, d

    return eval_step


def make_eval_step(
    loss_fn: Callable,
    has_negatives: bool = False,
) -> Callable[[TrainState, Batch], Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Loss-only forward over an eval batch (the reference's
    ``prediction_step``, contrastive_trainer.py:210-225), additionally
    returning the padded query/doc embeddings so the orchestrator can compute
    retrieval metrics without a second forward."""

    def eval_step(state: TrainState, batch: Batch):
        q = _forward(state.apply_fn, state.params, batch, "query_")
        d = _forward(state.apply_fn, state.params, batch, "doc_")
        if has_negatives and "neg_doc_input_ids" in batch:
            n = _forward(state.apply_fn, state.params, batch, "neg_doc_")
            return loss_fn(q, d, n), q, d
        return loss_fn(q, d), q, d

    return eval_step


def shard_train_step(
    train_step: Callable,
    state: TrainState,
    mesh: Mesh,
    rules=DEFAULT_TP_RULES,
):
    """jit the train step over a (data, model) mesh.

    Params/opt-state are sharded by the TP rules; batches over the data axis.
    Returns (jitted_step, sharded_state, batch_sharding).
    """
    state_shardings = tree_shardings(state, mesh, rules)
    b_sharding = batch_sharding(mesh)

    def traced(state, batch):
        # flash eligibility is a trace-time decision: declare the mesh so
        # attention can shard_map the fused kernel (layers.flash_mesh)
        with flash_mesh(mesh):
            return train_step(state, batch)

    jitted = jax.jit(
        traced,
        in_shardings=(state_shardings, b_sharding),
        out_shardings=(state_shardings, NamedSharding(mesh, P())),
        donate_argnums=(0,),
    )
    sharded_state = jax.device_put(state, state_shardings)
    return jitted, sharded_state, b_sharding


def shard_peft_train_step(
    train_step: Callable,
    state: TrainState,
    base_params,
    mesh: Mesh,
    rules=DEFAULT_TP_RULES,
):
    """jit a ``(state, batch, base_params)`` LoRA step over a (data, model)
    mesh: the frozen base is sharded by the TP rules (it dominates HBM), the
    rank-r adapter state is replicated (its per-chip cost is negligible and
    the merged delta then needs no extra collectives — each shard of W
    consumes the columns of B it owns via GSPMD partitioning of the matmul).

    Returns (jitted_step, sharded_state, batch_sharding, sharded_base).
    """
    state_shardings = jax.tree.map(lambda _: NamedSharding(mesh, P()), state)
    base_shardings = tree_shardings(base_params, mesh, rules)
    b_sharding = batch_sharding(mesh)

    def traced(state, batch, base_params):
        with flash_mesh(mesh):
            return train_step(state, batch, base_params)

    jitted = jax.jit(
        traced,
        in_shardings=(state_shardings, b_sharding, base_shardings),
        out_shardings=(state_shardings, NamedSharding(mesh, P())),
        donate_argnums=(0,),
    )
    sharded_state = jax.device_put(state, state_shardings)
    sharded_base = jax.device_put(base_params, base_shardings)
    return jitted, sharded_state, b_sharding, sharded_base
