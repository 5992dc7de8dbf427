#!/usr/bin/env python
"""Async client for a hosted embedding endpoint.

Mirror of /root/reference/scripts/api_call.py:1-109: batch images as base64,
POST to an embedding API with bounded concurrency (semaphore 16), collect
per-token embeddings. stdlib-only (asyncio + urllib in a thread pool).
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
import asyncio
import base64
import io
import json
import urllib.request
from typing import Any, Dict, List, Sequence

MAX_CONCURRENT = 16


def encode_image_b64(image) -> str:
    from PIL import Image

    if not hasattr(image, "save"):
        image = Image.fromarray(image)
    buf = io.BytesIO()
    image.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _post_json(url: str, payload: Dict[str, Any], timeout: float = 120.0) -> Dict[str, Any]:
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


async def embed_batches(
    url: str,
    batches: Sequence[Dict[str, Any]],
    max_concurrent: int = MAX_CONCURRENT,
) -> List[Dict[str, Any]]:
    """POST all batches with bounded concurrency; preserves order."""
    semaphore = asyncio.Semaphore(max_concurrent)
    loop = asyncio.get_running_loop()

    async def one(payload):
        async with semaphore:
            return await loop.run_in_executor(None, _post_json, url, payload)

    return list(await asyncio.gather(*(one(b) for b in batches)))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("url", help="Embedding endpoint (POST, JSON)")
    parser.add_argument("images", nargs="+", help="Image files to embed")
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--output", default="embeddings.json")
    args = parser.parse_args()

    from PIL import Image

    images = [Image.open(p) for p in args.images]
    batches = [
        {"images": [encode_image_b64(im) for im in images[i : i + args.batch_size]]}
        for i in range(0, len(images), args.batch_size)
    ]
    results = asyncio.run(embed_batches(args.url, batches))
    with open(args.output, "w") as f:
        json.dump(results, f)
    print(f"Embedded {len(images)} images -> {args.output}")


if __name__ == "__main__":
    main()
