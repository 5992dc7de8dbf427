#!/usr/bin/env python
"""Training CLI: YAML config -> ColModelTraining -> train + save.

Mirror of /root/reference/scripts/train/train_colbert.py:13-42 (typer +
configue there; argparse + our instantiate-from-YAML here). The config file
is copied into the output dir for provenance.
"""

from __future__ import annotations

# When run from a source checkout without installation, make the repo root
# importable (an installed colpali_tpu still wins: this is an append).
import sys as _sys
from pathlib import Path as _Path

_repo_root = str(_Path(__file__).resolve().parents[1])
if _repo_root not in _sys.path:
    _sys.path.append(_repo_root)

import argparse
import os
import shutil


def main() -> None:
    parser = argparse.ArgumentParser(description="Train a ColVision retriever from a YAML config.")
    parser.add_argument("config_file", help="Path to the YAML config (see configs/*.yaml)")
    args = parser.parse_args()

    from colpali_tpu.configs import load_config
    from colpali_tpu.training.orchestrator import ColModelTraining, ColModelTrainingConfig

    print(f"Loading config: {args.config_file}")
    cfg_dict = load_config(args.config_file, sub_path="config")
    config = ColModelTrainingConfig(**cfg_dict)

    app = ColModelTraining(config)
    os.makedirs(config.output_dir, exist_ok=True)
    shutil.copy(args.config_file, os.path.join(config.output_dir, "training_config.yml"))

    summary = app.train()
    app.save()

    from colpali_tpu.utils.tpu_stats import print_summary

    print_summary(summary)


if __name__ == "__main__":
    main()
