"""Text-in serving: QueryEncoder + the /search_text endpoint.

The reference's quickstart encodes queries in the same python process as
scoring (README.md:68-106); round-4's serve.py only took client-side
EMBEDDINGS. This covers the closing piece: query strings are tokenized +
encoded in-process (retrieval/serving.py QueryEncoder) and fed to the
MicroBatcher, so the server's QPS/latency story includes query encoding.

Pins the two properties that make the encoder production-safe:
- static-shape padding is RESULT-INVARIANT: encoding through the
  (batch bucket, token bucket) padded forward returns embeddings identical
  to the direct unpadded forward (pad rows replicate row 0; pad tokens are
  mask-0 and sliced off),
- live traffic only sees warmable shapes: every encode dispatch lands on a
  power-of-two (batch, token) bucket.
"""

import json
import sys
import threading
import urllib.request
from http.server import ThreadingHTTPServer
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO / "scripts"))

from colpali_tpu.retrieval import CorpusIndex  # noqa: E402
from colpali_tpu.retrieval.serving import QueryEncoder  # noqa: E402


@pytest.fixture(scope="module")
def retriever(tmp_path_factory):
    import jax.numpy as jnp

    import validate_checkpoint as vc
    from colpali_tpu.auto import load_retriever

    ckpt = tmp_path_factory.mktemp("synth") / "colpali-tiny"
    vc.make_synth_colpali(str(ckpt))
    model, variables, processor = load_retriever(
        str(ckpt), family="colpali", dtype=jnp.float32, param_dtype=jnp.float32
    )
    return model, variables, processor


QUERIES = ["find document page 0 quarterly report",
           "what is the total revenue ?",
           "figure with chart data"]


def _direct_embed(model, variables, processor, texts):
    """Reference: unpadded forward, per-query mask slice."""
    import jax.numpy as jnp

    batch = processor.process_queries(texts)
    out = np.asarray(
        model.apply(variables, **{k: jnp.asarray(v) for k, v in batch.items()}),
        np.float32,
    )
    mask = np.asarray(batch["attention_mask"]).astype(bool)
    return [out[i][mask[i]] for i in range(len(texts))]


class TestQueryEncoder:
    def test_padding_invariant_vs_direct_forward(self, retriever):
        model, variables, processor = retriever
        enc = QueryEncoder(model, variables, processor)
        got = enc.encode(QUERIES)
        want = _direct_embed(model, variables, processor, QUERIES)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g.shape == w.shape
            np.testing.assert_allclose(g, w, atol=1e-5)

    def test_every_dispatch_is_bucket_shaped(self, retriever):
        model, variables, processor = retriever
        enc = QueryEncoder(model, variables, processor, max_batch=8)
        seen = []
        inner = enc._fwd
        enc._fwd = lambda v, b: (seen.append(b["input_ids"].shape), inner(v, b))[1]
        enc.warmup()
        enc.encode(QUERIES)            # 3 queries -> batch bucket 4
        enc.encode(QUERIES * 4)        # 12 queries -> split 8 + 4
        for shape in seen:
            assert shape[0] & (shape[0] - 1) == 0, shape  # power-of-two batch
            assert shape[1] % enc.token_bucket_min == 0 or \
                shape[1] == enc.token_bucket_min, shape
        # the splits covered by warmup: no NEW shape after warmup's buckets
        warm = set(seen[:4])  # warmup batches 1,2,4,8
        assert set(seen[4:]) <= warm

    def test_batch_independence(self, retriever):
        """A query's embedding must not depend on its batch neighbours."""
        model, variables, processor = retriever
        enc = QueryEncoder(model, variables, processor)
        alone = enc.encode([QUERIES[1]])[0]
        together = enc.encode(QUERIES)[1]
        np.testing.assert_allclose(alone, together, atol=1e-5)

    def test_empty_rejected(self, retriever):
        model, variables, processor = retriever
        with pytest.raises(ValueError, match="empty"):
            QueryEncoder(model, variables, processor).encode([])


@pytest.fixture(scope="module")
def text_server(retriever):
    """serve.py handler with a query encoder: the full text-in stack over a
    corpus embedded with the SAME model (self-retrieval ground truth)."""
    import jax.numpy as jnp

    import serve as serve_mod

    model, variables, processor = retriever
    pages = [np.full((64, 48, 3), 40 * i % 255, np.uint8) for i in range(6)]
    batch = processor.process_images(pages)
    out = np.asarray(
        model.apply(variables, **{k: jnp.asarray(v) for k, v in batch.items()}),
        np.float32,
    )
    mask = np.asarray(batch["attention_mask"]).astype(bool)
    docs = [out[i][mask[i]] for i in range(len(pages))]
    index = CorpusIndex(docs, dtype="bf16")
    files = [f"page_{i}.png" for i in range(len(docs))]
    encoder = QueryEncoder(model, variables, processor)
    handler = serve_mod.make_handler(index, files, encoder=encoder)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_port}", model, variables, processor, docs
    httpd.shutdown()


def _post(url, path, payload):
    req = urllib.request.Request(
        url + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read())


def test_search_text_matches_embedding_search(text_server):
    """/search_text == encode-client-side + /search, bit-for-bit ranking."""
    url, model, variables, processor, docs = text_server
    out_text = _post(url, "/search_text", {"queries": QUERIES, "k": 3})
    qs = _direct_embed(model, variables, processor, QUERIES)
    out_emb = _post(url, "/search", {"embeddings": [q.tolist() for q in qs], "k": 3})
    assert out_text["doc_ids"] == out_emb["doc_ids"]
    np.testing.assert_allclose(out_text["scores"], out_emb["scores"], rtol=1e-4)
    assert len(out_text["files"][0]) == 3


def test_search_text_without_encoder_is_an_error(retriever):
    import serve as serve_mod

    rng = np.random.default_rng(0)
    docs = [rng.normal(size=(4, 16)).astype(np.float32) for _ in range(10)]
    handler = serve_mod.make_handler(CorpusIndex(docs, dtype="bf16"),
                                     [str(i) for i in range(10)])
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        _post(f"http://127.0.0.1:{httpd.server_port}", "/search_text",
              {"queries": ["q"]})
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "checkpoint" in json.loads(e.read())["error"]
    finally:
        httpd.shutdown()


def test_healthz_reports_text_in(text_server):
    url = text_server[0]
    with urllib.request.urlopen(url + "/healthz", timeout=10) as resp:
        assert json.loads(resp.read())["text_in"] is True


class TestEncodeBatcher:
    """Concurrent text-encode merging (the search-side MicroBatcher's twin:
    per-request encode dispatches would serialize the device)."""

    def test_results_match_direct_encode(self, retriever):
        from colpali_tpu.retrieval.serving import EncodeBatcher

        model, variables, processor = retriever
        enc = QueryEncoder(model, variables, processor)
        eb = EncodeBatcher(enc, window_ms=1.0)
        try:
            got = eb.encode(QUERIES)
            want = enc.encode(QUERIES)
            for g, w in zip(got, want):
                np.testing.assert_allclose(g, w, atol=1e-5)
        finally:
            eb.close()

    def test_concurrent_requests_merge(self, retriever):
        import threading

        from colpali_tpu.retrieval.serving import EncodeBatcher

        model, variables, processor = retriever
        enc = QueryEncoder(model, variables, processor)
        calls = []
        inner = enc.encode
        enc.encode = lambda texts: (calls.append(len(texts)), inner(texts))[1]
        eb = EncodeBatcher(enc, window_ms=25.0)
        results = {}

        def worker(i):
            results[i] = eb.encode([QUERIES[i % len(QUERIES)]])[0]

        try:
            threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        finally:
            eb.close()
        assert len(results) == 6
        assert max(calls) > 1, f"no merge happened: {calls}"
        # merged answers equal solo answers
        solo = inner([QUERIES[1]])[0]
        np.testing.assert_allclose(results[1], solo, atol=1e-5)

    def test_error_propagates_and_closed_rejects(self, retriever):
        import pytest as _pytest

        from colpali_tpu.retrieval.serving import EncodeBatcher

        model, variables, processor = retriever
        enc = QueryEncoder(model, variables, processor)
        eb = EncodeBatcher(enc, window_ms=0.0)
        with _pytest.raises(ValueError, match="empty"):
            eb.encode([])
        eb.close()
        with _pytest.raises(RuntimeError, match="closed"):
            eb.encode(["q"])
