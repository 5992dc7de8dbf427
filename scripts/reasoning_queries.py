"""Reformulate eval-set queries into reasoning-style queries via an
OpenAI-compatible chat endpoint.

Mirror of the reference ``scripts/reasoning_queries.py`` (:11-60): the same
four-step reformulation prompt, applied to a dataset's query column, writing
a ``reasoning_query`` column. Differences for this environment: the endpoint
is configurable (``OPENAI_BASE_URL``/``OPENAI_API_KEY``; any
OpenAI-compatible server works), the result is saved to disk instead of
re-uploaded to the Hub, and requests run on a thread pool (no pqdm
dependency).

Usage:
    python scripts/reasoning_queries.py <dataset_path_or_id> <output_dir> \
        [--query-column query] [--model gpt-4.1] [--concurrency 16]
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
import concurrent.futures
import json
import os
import sys
import urllib.request

QUERY_TEMPLATE = """
Given a query:
1. Repeat the query.
2. Identify the essential problem.
3. Think step by step to reason and describe what information could be relevant and helpful to address
the questions in detail.
4. Draft an answer with as many thoughts as you have.

Answer in the same language as the query.
Query: {query}
"""


def reformulate(query: str, model: str, base_url: str, api_key: str) -> str:
    """One chat completion against any OpenAI-compatible endpoint."""
    body = json.dumps(
        {
            "model": model,
            "messages": [
                {"role": "developer", "content": "You are a helpful assistant."},
                {"role": "user", "content": QUERY_TEMPLATE.format(query=query)},
            ],
        }
    ).encode()
    req = urllib.request.Request(
        f"{base_url.rstrip('/')}/chat/completions",
        data=body,
        headers={"Content-Type": "application/json", "Authorization": f"Bearer {api_key}"},
    )
    with urllib.request.urlopen(req) as resp:
        out = json.load(resp)
    return out["choices"][0]["message"]["content"].strip()


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("dataset", help="HF dataset path/id (its 'queries' config, test split)")
    parser.add_argument("output_dir", help="where to save the augmented dataset")
    parser.add_argument("--query-column", default="query")
    parser.add_argument("--model", default="gpt-4.1")
    parser.add_argument("--concurrency", type=int, default=16)
    args = parser.parse_args()

    api_key = os.environ.get("OPENAI_API_KEY")
    base_url = os.environ.get("OPENAI_BASE_URL", "https://api.openai.com/v1")
    if not api_key:
        print("OPENAI_API_KEY is not set — cannot reach a reformulation endpoint.", file=sys.stderr)
        return 2

    from datasets import load_dataset

    dataset = load_dataset(args.dataset, "queries", split="test")
    queries = list(dataset[args.query_column])
    print(f"Reformulating {len(queries)} queries with {args.model} via {base_url}")

    with concurrent.futures.ThreadPoolExecutor(max_workers=args.concurrency) as pool:
        reformulated = list(
            pool.map(lambda q: reformulate(q, args.model, base_url, api_key), queries)
        )

    dataset = dataset.add_column("reasoning_query", reformulated)
    dataset.save_to_disk(args.output_dir)
    print(f"Saved to {args.output_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
