#!/usr/bin/env python
"""Where does the training FORWARD's non-matmul time go?

Round 4 measured the LoRA train step's fwd at ~53% of pure-matmul
efficiency and named the residual "glue around small-token matmuls" without
chasing it (VERDICT r4 weak #3). This probe decomposes the forward at the
EXACT train shapes (B=8, 768-patch docs -> S_doc=212, S_q=32, bf16,
scan+dots-remat):

stage mode (--stages):
  merge      merge_lora over the real adapter tree, all merged kernels
             consumed (upper bound: in the real step XLA fuses rank-32
             updates into consumers)
  vision     Qwen2VisionTower fwd on the doc pixel batch
  text_doc   decoder fwd on (B, 212) pre-merged params
  text_query decoder fwd on (B, 32)
  loss       ColbertLoss on (B, 32, 128) x (B, 212, 128)
  full       the real lora_loss forward (sum of the above + glue)

layer mode (--layers): decoder fwd at num_hidden_layers in {1, N}: the
slope is the true per-layer cost, the intercept is embed+head+rope+norm
overhead. Compare the slope against the analytic per-layer matmul time
(2*flops/197T) to size in-layer glue.

All timings use the in-jit chained-iteration methodology (bench.py): a
runtime-false predicate threads iterations, outputs are consumed.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_repo_root = str(_Path(__file__).resolve().parents[1])
if _repo_root not in _sys.path:
    _sys.path.append(_repo_root)

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

B = 8
PATCHES = 768
S_DOC = PATCHES // 4 + 20
S_Q = 32
ITERS = 8


def chained_time(fn, *args, iters=ITERS):
    """fn(*args) -> scalar; returns ms/iter via in-jit chaining."""

    @jax.jit
    def loop(*a):
        def body(i, carry):
            acc = carry
            s = fn(*a, salt=acc)
            return acc + jnp.mean(s)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    np.asarray(loop(*args))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(*args))
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts) * 1e3


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", choices=["stages", "layers"], default="stages")
    parser.add_argument("--rank", type=int, default=32)
    args = parser.parse_args()

    from colpali_tpu.losses import ColbertLoss
    from colpali_tpu.models.qwen2_vl import ColQwen2, Qwen2Decoder, Qwen2VLConfig
    from colpali_tpu.training.lora import init_lora_params, make_lora_train_step, merge_lora

    assert jax.devices()[0].platform == "tpu", "train-shape decomposition is a device probe"
    t0 = time.time()
    config = Qwen2VLConfig()  # Qwen2-VL-2B
    rng = np.random.default_rng(0)

    if args.mode == "layers":
        results = {}
        tc = config.text
        for n_layers in (1, tc.num_hidden_layers):
            cfg_n = dataclasses.replace(tc, num_hidden_layers=n_layers)
            dec = Qwen2Decoder(cfg_n, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                               scan_layers=True, remat=True, remat_policy="dots")
            x = jnp.asarray(rng.normal(size=(B, S_DOC, tc.hidden_size)), jnp.bfloat16)
            mask = jnp.ones((B, S_DOC), jnp.int32)
            pos = jnp.asarray(np.tile(np.arange(S_DOC), (3, B, 1)).astype(np.int64))
            params = jax.jit(lambda d=dec: d.init(jax.random.PRNGKey(0), x, mask, pos))()
            print(f"[{time.time()-t0:6.1f}s] decoder L={n_layers} init", flush=True)

            def fwd(p, x, mask, pos, salt, d=dec):
                xx = x + salt.astype(x.dtype)
                return jnp.sum(d.apply(p, xx, mask, pos).astype(jnp.float32))

            results[f"decoder_L{n_layers}_ms"] = round(
                chained_time(fwd, params, x, mask, pos), 2)
            print(f"[{time.time()-t0:6.1f}s]   {results[f'decoder_L{n_layers}_ms']} ms", flush=True)
        n = tc.num_hidden_layers
        per_layer = (results[f"decoder_L{n}_ms"] - results["decoder_L1_ms"]) / (n - 1)
        results["per_layer_ms"] = round(per_layer, 3)
        results["overhead_ms"] = round(results["decoder_L1_ms"] - per_layer, 2)
        # analytic per-layer matmul time: qkv/o + gate/up/down + attention
        h, hd = tc.hidden_size, tc.head_dim
        nh, nkv, inter = tc.num_attention_heads, tc.num_key_value_heads, tc.intermediate_size
        tokens = B * S_DOC
        proj = 2 * tokens * h * (nh * hd + 2 * nkv * hd + nh * hd) + 2 * tokens * 3 * h * inter
        attn = 2 * 2 * B * S_DOC * S_DOC * nh * hd
        results["per_layer_matmul_ms_at_peak"] = round((proj + attn) / 197e12 * 1e3, 3)
        results["per_layer_matmul_eff_pct"] = round(
            100 * results["per_layer_matmul_ms_at_peak"] / per_layer, 1)
        print(json.dumps(results, indent=2))
        return

    # ---- stages mode -----------------------------------------------------
    model = ColQwen2(config, dim=128, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                     scan_layers=True, remat=True, remat_policy="dots")
    grid_h = int(np.sqrt(PATCHES))
    doc_ids = np.full((B, S_DOC), 11, np.int32)
    doc_ids[:, 1 : 1 + PATCHES // 4] = config.image_token_id
    batch = {
        "query_input_ids": jnp.asarray(rng.integers(3, 200, (B, S_Q)).astype(np.int32)),
        "query_attention_mask": jnp.ones((B, S_Q), jnp.int32),
        "query_position_ids": jnp.asarray(np.tile(np.arange(S_Q), (3, B, 1)).astype(np.int64)),
        "doc_input_ids": jnp.asarray(doc_ids),
        "doc_attention_mask": jnp.ones((B, S_DOC), jnp.int32),
        "doc_pixel_values": jnp.asarray(
            rng.normal(size=(B, PATCHES, config.vision.patch_dim)).astype(np.float32), jnp.bfloat16),
        "doc_vision_hpos": jnp.asarray(np.tile(np.arange(PATCHES) // grid_h, (B, 1)).astype(np.int32)),
        "doc_vision_wpos": jnp.asarray(np.tile(np.arange(PATCHES) % grid_h, (B, 1)).astype(np.int32)),
        "doc_patch_mask": jnp.ones((B, PATCHES), bool),
        "doc_position_ids": jnp.asarray(np.tile(np.arange(S_DOC), (3, B, 1)).astype(np.int64)),
    }
    print(f"[{time.time()-t0:6.1f}s] init params...", flush=True)
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), batch["doc_input_ids"], batch["doc_attention_mask"],
        pixel_values=batch["doc_pixel_values"], vision_hpos=batch["doc_vision_hpos"],
        vision_wpos=batch["doc_vision_wpos"], patch_mask=batch["doc_patch_mask"],
        position_ids=batch["doc_position_ids"])["params"])()
    lora = init_lora_params(params, jax.random.PRNGKey(1), rank=args.rank)
    loss_obj = ColbertLoss(temperature=0.02)

    results = {}

    # merge: consume every merged kernel (forces materialization — upper bound)
    def merge_fn(lora, base, salt):
        salted = jax.tree.map(lambda a: a + salt.astype(a.dtype), lora)
        merged = merge_lora(base, salted, alpha=32.0, rank=args.rank)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(merged))

    results["merge_ms"] = round(chained_time(merge_fn, lora, params), 2)
    print(f"[{time.time()-t0:6.1f}s] merge {results['merge_ms']} ms", flush=True)

    def vision_fn(p, bt, salt):
        px = bt["doc_pixel_values"] + salt.astype(jnp.bfloat16)
        feats = model.apply({"params": p}, px, bt["doc_vision_hpos"],
                            bt["doc_vision_wpos"], bt["doc_patch_mask"],
                            method=lambda m, *a: m.model.visual(*a))
        return jnp.sum(feats.astype(jnp.float32))

    results["vision_ms"] = round(chained_time(vision_fn, params, batch), 2)
    print(f"[{time.time()-t0:6.1f}s] vision {results['vision_ms']} ms", flush=True)

    def text_fn(p, bt, prefix, salt):
        ids = bt[f"{prefix}_input_ids"]
        mask = bt[f"{prefix}_attention_mask"]
        pos = bt[f"{prefix}_position_ids"]

        def run(m, ids, mask, pos):
            x = m.model.language_model.embed(ids)
            x = x + salt.astype(x.dtype)
            from colpali_tpu.models.layers import flash_auto_ok, make_attention_bias

            tc = m.config.text
            if flash_auto_ok(*mask.shape, tc.num_attention_heads,
                             tc.num_key_value_heads, jnp.bfloat16):
                bias = mask.astype(jnp.int32)
            else:
                bias = make_attention_bias(mask, causal=True)
            h = m.model.language_model(x, bias, pos)
            return m.head(h, mask)

        return jnp.sum(model.apply({"params": p}, ids, mask, pos, method=run).astype(jnp.float32))

    for prefix in ("doc", "query"):
        results[f"text_{prefix}_ms"] = round(
            chained_time(lambda p, bt, salt, pr=prefix: text_fn(p, bt, pr, salt), params, batch), 2)
        print(f"[{time.time()-t0:6.1f}s] text_{prefix} {results[f'text_{prefix}_ms']} ms", flush=True)

    q_emb = jnp.asarray(rng.normal(size=(B, S_Q, 128)), jnp.float32)
    d_emb = jnp.asarray(rng.normal(size=(B, S_DOC, 128)), jnp.float32)

    def loss_fn(q, d, salt):
        return loss_obj(q + salt, d)

    results["loss_ms"] = round(chained_time(loss_fn, q_emb, d_emb), 2)
    print(f"[{time.time()-t0:6.1f}s] loss {results['loss_ms']} ms", flush=True)

    lora_loss = make_lora_train_step(
        lambda p, bt: loss_obj(
            model.apply({"params": p}, bt["query_input_ids"], bt["query_attention_mask"],
                        position_ids=bt["query_position_ids"]),
            model.apply({"params": p}, bt["doc_input_ids"], bt["doc_attention_mask"],
                        pixel_values=bt["doc_pixel_values"], vision_hpos=bt["doc_vision_hpos"],
                        vision_wpos=bt["doc_vision_wpos"], patch_mask=bt["doc_patch_mask"],
                        position_ids=bt["doc_position_ids"]),
        ),
        alpha=32.0, rank=args.rank, dropout=0.0)

    def full_fn(lora, base, bt, salt):
        return lora_loss(lora, base, {**bt, "doc_pixel_values":
                                      bt["doc_pixel_values"] + salt.astype(jnp.bfloat16)})

    results["full_fwd_ms"] = round(chained_time(full_fn, lora, params, batch), 2)
    parts = results["vision_ms"] + results["text_doc_ms"] + results["text_query_ms"] + results["loss_ms"]
    results["sum_of_parts_ms"] = round(parts, 2)
    results["fusion_residual_ms"] = round(results["full_fwd_ms"] - parts, 2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
