"""Mesh + sharding helpers: the TPU-native replacement for the reference's
DDP/NCCL layer (SURVEY.md §2.3).

The reference's only parallelism is data-parallel DDP with an explicit
gradient-preserving all_gather of document embeddings
(contrastive_trainer.py:14-17,135-162). Here parallelism is declarative
GSPMD: a ``Mesh`` with ``data`` (DP, over ICI/DCN) and ``model`` (TP, over
ICI) axes, parameter PartitionSpecs pattern-matched over the pytree
(megatron-style: attention heads and MLP columns split over ``model``), and
batches sharded over ``data``. XLA inserts the collectives — including the
implicit document gather inside the contrastive loss, which under GSPMD is
just a sharded einsum over the global in-batch score matrix.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, PartitionSpec) — first match wins; default = replicated.
# Paths are "/"-joined flax param paths, e.g.
# "model/language_model/layers_0/self_attn/q_proj/kernel".
DEFAULT_TP_RULES: Tuple[Tuple[str, P], ...] = (
    # attention: split heads over the model axis (column-parallel QKV,
    # row-parallel output projection)
    (r".*self_attn/(q|k|v)_proj/kernel", P(None, "model")),
    (r".*self_attn/(q|k|v)_proj/bias", P("model")),
    (r".*self_attn/o_proj/kernel", P("model", None)),
    (r".*self_attn/o_proj/bias", P()),
    # MoE stacked experts (models/qwen3_5.py::StackedExperts): shard the
    # expert axis — expert parallelism; GSPMD turns the one-hot dispatch and
    # combine einsums into all_to_all-style collectives over `model`
    # (stacked-expert leaves have no trailing /kernel, so this cannot
    # swallow shared_expert or dense-MLP Dense kernels)
    (r".*experts/(gate|up|down)_proj", P("model", None, None)),
    (r".*shared_expert/(gate|up)_proj/kernel", P(None, "model")),
    (r".*shared_expert/down_proj/kernel", P("model", None)),
    # gated MLP: column-parallel gate/up, row-parallel down
    (r".*mlp/(gate|up)_proj/kernel", P(None, "model")),
    (r".*mlp/down_proj/kernel", P("model", None)),
    # ViT MLP
    (r".*mlp/fc1/kernel", P(None, "model")),
    (r".*mlp/fc1/bias", P("model")),
    (r".*mlp/fc2/kernel", P("model", None)),
    (r".*mlp/fc2/bias", P()),
    # embeddings: split vocab over model axis
    (r".*embed_tokens/embedding", P("model", None)),
)


def make_mesh(
    data: int = 1,
    model: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Create a (data, model) mesh from available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = data * model
    if len(devices) < n:
        raise ValueError(f"Need {n} devices for mesh ({data}x{model}), have {len(devices)}")
    arr = np.array(devices[:n]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def _match_spec(path: str, rules: Sequence[Tuple[str, P]]) -> P:
    for pattern, spec in rules:
        if re.fullmatch(pattern, path):
            return spec
    return P()  # replicated


def tree_shardings(
    tree: Any,
    mesh: Mesh,
    rules: Sequence[Tuple[str, P]] = DEFAULT_TP_RULES,
) -> Any:
    """NamedSharding pytree for any pytree, pattern-matched by leaf path.

    Works on param trees AND whole TrainStates: optimizer moments (mu/nu)
    mirror the param tree, so the same trailing-path regexes shard them
    consistently; scalars fall through to replicated.
    """

    def to_sharding(path_tuple, _leaf):
        path = "/".join(str(getattr(k, "key", getattr(k, "name", k))) for k in path_tuple)
        return NamedSharding(mesh, _match_spec(path, rules))

    return jax.tree_util.tree_map_with_path(to_sharding, tree)


def param_shardings(
    params: Dict[str, Any],
    mesh: Mesh,
    rules: Sequence[Tuple[str, P]] = DEFAULT_TP_RULES,
) -> Dict[str, Any]:
    """NamedSharding pytree for a param tree, pattern-matched by path."""
    return tree_shardings(params, mesh, rules)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
