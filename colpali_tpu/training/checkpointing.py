"""Checkpoint save/restore: Orbax for training state, safetensors for
interchange.

Reference behavior being reproduced (SURVEY.md §5 "Checkpoint / resume"):
- periodic training checkpoints with retention (``save_steps: 500``,
  ``save_total_limit: 1``) and ``resume_from_checkpoint``
- final export as an HF-style checkpoint + provenance (git hash) file
  (colmodel_training.py:109-118)

TPU-native: Orbax async array checkpointing for the sharded TrainState
(restores with the same shardings), plus a safetensors exporter. When the
model family has a registered reverse-export (core/hf_export.EXPORTERS),
``save_pretrained`` writes ``model.safetensors`` in the HF torch layout —
loadable by the torch reference ecosystem AND re-importable here through
core/hf_loader. Families without an exporter fall back to flax-path-keyed
safetensors (NOT torch-loadable; resume via load_params_safetensors only).
"""

from __future__ import annotations

import json
import os
import subprocess
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for TrainStates."""

    def __init__(self, directory: str, save_interval_steps: int = 500, max_to_keep: int = 1):
        self.directory = os.path.abspath(directory)
        options = ocp.CheckpointManagerOptions(
            save_interval_steps=save_interval_steps,
            max_to_keep=max_to_keep,
            create=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        saved = self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)
        return bool(saved)

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoint found in {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def flatten_params(params: Dict[str, Any], sep: str = "/") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for path_tuple, leaf in jax.tree_util.tree_leaves_with_path(params):
        path = sep.join(str(getattr(k, "key", k)) for k in path_tuple)
        out[path] = np.asarray(leaf)
    return out


def unflatten_params(flat: Dict[str, np.ndarray], sep: str = "/") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for path, value in flat.items():
        node = out
        parts = path.split(sep)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out


def save_params_safetensors(params: Dict[str, Any], path: str, metadata: Optional[Dict[str, str]] = None):
    """Write a flax param tree as a single safetensors file (keys are
    '/'-joined tree paths; bf16 preserved)."""
    from safetensors.numpy import save_file

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = flatten_params(params)
    save_file(flat, path, metadata=metadata or {})


def load_params_safetensors(path: str) -> Dict[str, Any]:
    from safetensors.numpy import load_file

    return unflatten_params(load_file(path))


def _try_hf_export(params: Dict[str, Any], model: Any) -> Optional[Dict[str, np.ndarray]]:
    """Run the model family's reverse exporter, passing whatever vision patch
    geometry its signature wants (from model.config). None when the family
    has no exporter or the tree has params the rules don't cover."""
    import inspect

    from colpali_tpu.core.hf_export import EXPORTERS

    export_fn = EXPORTERS.get(type(model).__name__)
    if export_fn is None:
        return None
    kwargs: Dict[str, Any] = {}
    accepted = set(inspect.signature(export_fn).parameters)
    vision = getattr(getattr(model, "config", None), "vision", None)
    for attr, kw in (
        ("in_channels", "channels"),
        ("temporal_patch_size", "temporal_patch_size"),
        ("patch_size", "patch_size"),
    ):
        if kw in accepted and vision is not None and getattr(vision, attr, None) is not None:
            kwargs[kw] = int(getattr(vision, attr))
    try:
        return export_fn(params, **kwargs)
    except ValueError as exc:
        print(f"HF export failed ({exc}); falling back to flax-keyed safetensors")
        return None


def git_revision(repo_dir: Optional[str] = None) -> str:
    try:
        return (
            subprocess.check_output(
                ["git", "rev-parse", "HEAD"], cwd=repo_dir, stderr=subprocess.DEVNULL
            )
            .decode()
            .strip()
        )
    except Exception:
        return "unknown"


def save_pretrained(
    output_dir: str,
    params: Dict[str, Any],
    config: Any = None,
    extra_metadata: Optional[Dict[str, Any]] = None,
    model: Any = None,
) -> None:
    """Final export: params + config + provenance (reference
    colmodel_training.py:109-118 writes model, processor, and git hash).

    When ``model`` (or its class name) has a registered exporter,
    ``model.safetensors`` is written in the HF torch layout (keys+shapes a
    torch ``load_state_dict`` accepts); otherwise flax-path-keyed.
    """
    os.makedirs(output_dir, exist_ok=True)
    hf_state = _try_hf_export(params, model) if model is not None else None
    if hf_state is not None:
        from safetensors.numpy import save_file

        save_file(
            {k: np.ascontiguousarray(v) for k, v in hf_state.items()},
            os.path.join(output_dir, "model.safetensors"),
            metadata={"format": "pt"},
        )
        layout = "hf"
    else:
        save_params_safetensors(params, os.path.join(output_dir, "model.safetensors"))
        layout = "flax"
    extra_metadata = {"checkpoint_layout": layout, **(extra_metadata or {})}
    if config is not None:
        import dataclasses

        cfg_dict = dataclasses.asdict(config) if dataclasses.is_dataclass(config) else dict(config)
        with open(os.path.join(output_dir, "config.json"), "w") as f:
            json.dump(cfg_dict, f, indent=2, default=str)
    provenance = {"git_hash": git_revision(), **(extra_metadata or {})}
    with open(os.path.join(output_dir, "training_provenance.json"), "w") as f:
        json.dump(provenance, f, indent=2)
