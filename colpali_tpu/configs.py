"""YAML config system: one declarative front-end for training/serving.

Replaces the reference's dual config systems (configue YAML with `()`
constructor keys + argparse config-scripts, SURVEY.md §5) with one small
loader: a YAML mapping where any dict with a ``_target_`` key is instantiated
from a registry or dotted import path, depth-first. No external deps beyond
pyyaml.

Example:

```yaml
config:
  model:
    _target_: colpali_tpu.models.ColPali
    config: {_target_: colpali_tpu.models.PaliGemmaConfig}
    dim: 128
  loss_func: {_target_: colpali_tpu.losses.ColbertLoss, temperature: 0.02}
  global_batch_size: 64
```
"""

from __future__ import annotations

import importlib
from typing import Any, Dict

import yaml

TARGET_KEY = "_target_"


def _resolve(path: str) -> Any:
    module_name, _, attr = path.rpartition(".")
    if not module_name:
        raise ValueError(f"_target_ must be a dotted path, got: {path}")
    return getattr(importlib.import_module(module_name), attr)


def instantiate(node: Any) -> Any:
    """Depth-first instantiation of ``_target_`` nodes."""
    if isinstance(node, dict):
        materialized = {k: instantiate(v) for k, v in node.items() if k != TARGET_KEY}
        if TARGET_KEY in node:
            target = _resolve(node[TARGET_KEY])
            return target(**materialized)
        return materialized
    if isinstance(node, list):
        return [instantiate(v) for v in node]
    return node


def load_config(path: str, sub_path: str = "config") -> Dict[str, Any]:
    """Load a YAML file and instantiate the ``sub_path`` subtree (the
    reference loads with configue's sub_path="config",
    scripts/train/train_colbert.py:24)."""
    with open(path) as f:
        raw = yaml.safe_load(f)
    node = raw[sub_path] if sub_path and sub_path in raw else raw
    return instantiate(node)


def bfloat16():
    """YAML-instantiable dtype handle (configs reference it via _target_)."""
    import jax.numpy as jnp

    return jnp.bfloat16

