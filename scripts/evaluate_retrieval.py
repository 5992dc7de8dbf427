"""Evaluate a Col* retriever on a query->page dataset: embed, search, report
nDCG/Recall/MRR as one JSON line.

The self-contained equivalent of the reference's external vidore-benchmark
dependency (reference README points there for evaluation; SURVEY.md §6's
quality gate is nDCG@5). Configs reuse the training ``_target_`` YAML system
— see ``configs/eval_colpali_smoke.yaml`` for a hermetic example (tiny random
model + synthetic dataset; real configs point model/params/dataset at
checkpoints).

Usage:
    python scripts/evaluate_retrieval.py configs/eval_colpali_smoke.yaml
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
import json

import jax.numpy as jnp
import numpy as np


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("config", help="YAML with model/processor[/params]/eval_dataset")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--index-dtype", default="bf16", choices=["bf16", "int8"])
    parser.add_argument("--k", type=int, nargs="+", default=[1, 5, 10])
    args = parser.parse_args()

    from colpali_tpu.configs import load_config
    from colpali_tpu.evaluation import embed_dataset, evaluate_retrieval

    cfg = load_config(args.config)
    model, processor = cfg["model"], cfg["processor"]
    dataset = cfg["eval_dataset"]

    queries = [row["query"] for row in dataset]
    pages = [row["pos_target"][0] for row in dataset]
    # identity relevance: query i's gold page is page i (deduplicated corpora
    # provide their own relevance via a "relevance" column)
    relevance = [row.get("relevance", [i]) for i, row in enumerate(dataset)]

    params = cfg.get("params")
    if params is None:
        import jax

        first = processor.process_images(pages[: args.batch_size])
        variables = model.init(
            jax.random.PRNGKey(0), **{k: jnp.asarray(v) for k, v in first.items()}
        )
    else:
        variables = {"params": params}

    doc_embs = embed_dataset(model.apply, variables, processor, pages,
                             batch_size=args.batch_size, is_images=True)
    query_embs = embed_dataset(model.apply, variables, processor, queries,
                               batch_size=args.batch_size, is_images=False,
                               use_query_prompt=True)

    metrics = evaluate_retrieval(
        query_embs, doc_embs, relevance, k_values=tuple(args.k), index_dtype=args.index_dtype
    )
    print(json.dumps({k: round(float(v), 4) for k, v in sorted(metrics.items())}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
