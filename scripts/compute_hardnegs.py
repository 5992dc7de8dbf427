#!/usr/bin/env python
"""Offline hard-negative mining over precomputed embeddings.

Mirror of /root/reference/scripts/compute_hardnegs.py:30-131 (there: embed a
corpus with BiQwen2, einsum top-100, rewrite the dataset). Here the mining
runs on device via colpali_tpu.retrieval.hardneg; embeddings come from .npz
files produced by an embed run (keys: ``embeddings`` or ragged ``emb_<i>``).
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

import numpy as np


def _load_embeddings(path: str):
    data = np.load(path)
    if "embeddings" in data:
        return data["embeddings"]
    return [data[k] for k in sorted(data.files, key=lambda s: int(s.split("_")[1]))]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("query_embeddings", help=".npz with query embeddings")
    parser.add_argument("doc_embeddings", help=".npz with corpus embeddings")
    parser.add_argument("gold_indices", help=".json list mapping query -> gold doc index")
    parser.add_argument("output", help="output .jsonl with negative_passages / gold_in_top_100")
    parser.add_argument("--k", type=int, default=100)
    parser.add_argument("--multi-vector", action="store_true", help="MaxSim scoring instead of dot product")
    parser.add_argument("--via-index", action="store_true",
                        help="mine through a device-resident CorpusIndex (int8 + binary "
                             "prefilter) instead of the full (Q, C) score matrix — "
                             "required at 100k+ doc scale")
    args = parser.parse_args()

    from colpali_tpu.retrieval.hardneg import mine_hard_negatives

    qs = _load_embeddings(args.query_embeddings)
    ds = _load_embeddings(args.doc_embeddings)
    with open(args.gold_indices) as f:
        gold = json.load(f)

    if args.via_index:
        from colpali_tpu.retrieval import CorpusIndex

        docs = [np.asarray(d)[None, :] if np.asarray(d).ndim == 1 else np.asarray(d)
                for d in ds]
        index = CorpusIndex(docs, dtype="int8",
                            prefilter="binary" if len(docs) >= 100_000 else None)
        results = mine_hard_negatives(qs, None, gold, k=args.k,
                                      multi_vector=args.multi_vector, index=index)
    else:
        results = mine_hard_negatives(qs, ds, gold, k=args.k, multi_vector=args.multi_vector)
    with open(args.output, "w") as f:
        for row in results:
            f.write(json.dumps(row) + "\n")
    in_top = sum(r["gold_in_top_100"] for r in results)
    print(f"Mined {len(results)} queries; gold_in_top_100 for {in_top}/{len(results)}")


if __name__ == "__main__":
    main()
