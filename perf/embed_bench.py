#!/usr/bin/env python
"""Embed-throughput measurement: pages/min/chip for the document-embedding
forward pass (the BASELINE.json north star: >= 2000 ViDoRe pages/min/chip).

Two modes:

- default: forward-only — random pre-patchified device tensors, in-jit
  chained iterations (see bench.py; axon dispatches cost 10-40 ms RPC each).
  This is the DEVICE ceiling, not the pipeline number.
- ``--e2e``: the full production pipeline — page-sized PIL images ->
  processor (batched device resize+normalize, host patchify+tokenize) ->
  host-to-device transfer -> forward -> embeddings fetched to host.
  Preprocessing runs on a prefetch thread overlapping device compute
  (data/prefetch.py), exactly as embed_corpus.py serves it. This is the
  honest "pages embedded per minute" number (VERDICT r1 weak #3).

Random bf16 weights at REAL model size (throughput is weight-independent).

Usage: python perf/embed_bench.py [--model colqwen2|colpali] [--batch 8] [--e2e]
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
import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np


def quant_ctx(args):
    """--quant dynamic: trace the forward under the dynamic w8a8 policy (the
    big projections run int8 on the MXU; small glue like the 128-d head stays
    exact — ops/quant_dense.py). Trace-time switch, so it wraps the first
    (compiling) call of each jitted forward."""
    if getattr(args, "quant", None) == "dynamic":
        from colpali_tpu.models.layers import quantized_acts

        return quantized_acts()
    return contextlib.nullcontext()


def maybe_quantize_params(args, params):
    """--quant stored: pre-quantize eligible kernels to int8 once (w8
    static); the forward then reads int8 weights from HBM — no per-step
    weight quantize pass, half the weight traffic."""
    if getattr(args, "quant", None) != "stored":
        return params
    from colpali_tpu.ops.quant_dense import quantize_params

    qp, qc = quantize_params(params["params"])
    return {"params": qp, "quant": qc}


def build_colqwen2(batch: int, patches: int, text_tokens: int, scan: bool = False):
    from colpali_tpu.models.qwen2_vl import ColQwen2, Qwen2VLConfig

    config = Qwen2VLConfig()  # Qwen2-VL-2B
    model = ColQwen2(config, dim=128, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, scan_layers=scan)
    n_merged = patches // 4
    s = n_merged + text_tokens
    rng = np.random.default_rng(0)
    input_ids = np.full((batch, s), 11, np.int32)
    input_ids[:, 1 : 1 + n_merged] = config.image_token_id
    grid_h = int(np.sqrt(patches))
    batch_inputs = dict(
        input_ids=jnp.asarray(input_ids),
        attention_mask=jnp.ones((batch, s), jnp.int32),
        pixel_values=jnp.asarray(rng.normal(size=(batch, patches, 1176)).astype(np.float32), jnp.bfloat16),
        vision_hpos=jnp.asarray(np.tile(np.arange(patches) // grid_h, (batch, 1)).astype(np.int32)),
        vision_wpos=jnp.asarray(np.tile(np.arange(patches) % grid_h, (batch, 1)).astype(np.int32)),
        patch_mask=jnp.ones((batch, patches), bool),
        position_ids=jnp.asarray(np.tile(np.arange(s), (3, batch, 1)).astype(np.int64)),
    )
    return model, batch_inputs


def build_colpali(batch: int, text_tokens: int = 6, scan: bool = False):
    from colpali_tpu.models.paligemma import ColPali
    from colpali_tpu.models.configs import PaliGemmaConfig

    config = PaliGemmaConfig()  # PaliGemma-3B-448
    model = ColPali(config, dim=128, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, scan_layers=scan)
    n_img = config.vision.num_patches  # 1024
    s = n_img + text_tokens
    rng = np.random.default_rng(0)
    input_ids = np.full((batch, s), 11, np.int32)
    input_ids[:, :n_img] = config.image_token_index
    batch_inputs = dict(
        input_ids=jnp.asarray(input_ids),
        attention_mask=jnp.ones((batch, s), jnp.int32),
        pixel_values=jnp.asarray(
            rng.normal(size=(batch, config.vision.image_size, config.vision.image_size, 3)).astype(np.float32),
            jnp.bfloat16,
        ),
    )
    return model, batch_inputs


class _BenchTokenizer:
    """Minimal HF-like word-level tokenizer (prompt tokenization is a
    negligible share of the pipeline; images are the hot path)."""

    special = ["<|endoftext|>", "<|im_start|>", "<|im_end|>", "<|vision_start|>",
               "<|vision_end|>", "<|image_pad|>", "<image>", "<bos>"]
    bos_token = "<bos>"
    pad_token = "<|endoftext|>"  # colpali's query_augmentation_token source

    def __init__(self):
        self.vocab = {tok: i for i, tok in enumerate(self.special)}

    def convert_tokens_to_ids(self, token):
        return self.vocab.get(token, -1)

    def _encode(self, text):
        for sp in self.special:
            text = text.replace(sp, f" {sp} ")
        ids = []
        for word in text.split():
            if word not in self.vocab:
                self.vocab[word] = len(self.vocab)
            ids.append(self.vocab[word])
        return ids

    def __call__(self, texts, padding=None, padding_side="left", add_special_tokens=False, return_tensors=None):
        encoded = [self._encode(t) for t in texts]
        max_len = max(len(e) for e in encoded)
        input_ids = np.zeros((len(encoded), max_len), np.int64)
        mask = np.zeros((len(encoded), max_len), np.int64)
        for i, e in enumerate(encoded):
            input_ids[i, max_len - len(e):] = e
            mask[i, max_len - len(e):] = 1
        return {"input_ids": input_ids, "attention_mask": mask}


def _make_pages(n: int, height: int = 1650, width: int = 1275):
    """Synthetic document pages: white background + dark text-like bars
    (content is irrelevant to throughput; size matches ~150 dpi letter)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    pages = []
    for _ in range(n):
        arr = np.full((height, width, 3), 255, np.uint8)
        for _ in range(40):  # text lines
            y = int(rng.integers(0, height - 12))
            x = int(rng.integers(0, width // 2))
            w = int(rng.integers(width // 4, width - x))
            arr[y : y + 10, x : x + w] = rng.integers(0, 80)
        pages.append(Image.fromarray(arr))
    return pages


def run_e2e_fused(args, t0):
    """Link-optimized colpali ingestion: PIL pages -> host bicubic resize ->
    u8 (RGB or YUV420) upload -> ONE fused device dispatch per chunk
    (decode + normalize + forward). Differences vs the generic --e2e path,
    each attacking a measured cost on a 1-core host behind a serialized,
    bandwidth-variable tunnel (perf/embed_decompose.py):

    - pixel decode/normalize runs INSIDE the forward jit: one device
      dispatch per chunk instead of two (each dispatch costs 10-40 ms RPC);
    - ``--transport yuv420`` halves the wire bytes (2x2-subsampled chroma,
      u8): the upload serializes with compute on this tunnel, so bytes are
      latency;
    - the prompt is static across batches: input_ids upload once, ever;
    - RGB convert happens after resize at target size (host_resize_rgb).
    """
    from colpali_tpu.data.prefetch import prefetch
    from colpali_tpu.models.configs import PaliGemmaConfig
    from colpali_tpu.models.paligemma import ColPali
    from colpali_tpu.processors.colpali import ColPaliProcessor
    from colpali_tpu.processors.image_processing import (
        host_resize_rgb,
        normalize_pixels,
        pack_yuv420_group,
        stage_gray,
        stage_yuv420,
        unpack_yuv420,
        yuv420_to_rgb,
    )

    assert args.model == "colpali", "--transport fast path covers colpali"
    processor = ColPaliProcessor(_BenchTokenizer())
    config = PaliGemmaConfig()
    model = ColPali(config, dim=128, dtype=jnp.bfloat16,
                    param_dtype=jnp.bfloat16, scan_layers=args.scan)
    size = config.vision.image_size
    mean, std = processor.image_mean, processor.image_std

    n_pages = args.batch * args.e2e_batches
    pages = _make_pages(n_pages)
    print(f"[{time.time()-t0:6.1f}s] {n_pages} synthetic pages ready", flush=True)
    chunk = args.e2e_chunk
    assert args.e2e_batches % chunk == 0, "--e2e-batches must divide by --e2e-chunk"
    group_pages = args.batch * chunk

    # static prompt -> input_ids/mask upload exactly once
    tok = processor._tokenize(
        [processor._expand_image_prompt(processor.visual_prompt_prefix)] * args.batch
    )
    ids = jnp.asarray(np.asarray(tok["input_ids"]))
    att = jnp.asarray(np.asarray(tok["attention_mask"]))

    bytes_per_page = {"rgb-u8": size * size * 3, "yuv420": size * size * 3 // 2,
                      "gray": size * size}[args.transport]

    trace = getattr(args, "trace", False)
    rgap = args.reducing_gap

    def stage(i):
        ts = time.perf_counter()
        group = pages[i : i + group_pages]
        if args.transport == "yuv420":
            # all-PIL-C-speed staging (resize -> YCbCr split -> BOX chroma
            # downscale), packed into ONE u8 upload buffer per group (two
            # separate y/uv transfers cost two serialization passes that
            # compete with compute on the shared tunnel)
            planes = [stage_yuv420(p, (size, size), reducing_gap=rgap) for p in group]
            buf = np.empty((chunk, args.batch, size * size * 3 // 2), np.uint8)
            pack_yuv420_group(planes, buf, size)
            t_conv = time.perf_counter()
            out = {"yuv": jnp.asarray(buf)}
        elif args.transport == "gray":
            # Y (luma) plane only — 3x fewer wire bytes than RGB. Document
            # corpora are overwhelmingly achromatic; for colored corpora use
            # yuv420. PIL "L" = the same BT.601 luma, at C speed.
            y = np.stack([stage_gray(p, (size, size), reducing_gap=rgap)
                          for p in group]).reshape(chunk, args.batch, size, size)
            t_conv = time.perf_counter()
            out = {"y": jnp.asarray(y)}
        else:
            arrs = [host_resize_rgb(p, (size, size), reducing_gap=rgap) for p in group]
            t_conv = time.perf_counter()
            out = {"rgb": jnp.asarray(np.stack(arrs).reshape(chunk, args.batch, size, size, 3))}
        if trace:
            print(f"  stage[{i//group_pages}]: resize+convert {(t_conv-ts)*1e3:.0f} ms, "
                  f"asarray {(time.perf_counter()-t_conv)*1e3:.0f} ms", flush=True)
        return out

    def decode(pix):
        if args.transport == "yuv420":
            x = yuv420_to_rgb(*unpack_yuv420(pix["yuv"], size))
        elif args.transport == "gray":
            x = jnp.repeat(pix["y"].astype(jnp.float32)[..., None], 3, axis=-1)
        else:
            x = pix["rgb"].astype(jnp.float32)
        return normalize_pixels(x, mean, std).astype(jnp.bfloat16)

    def forward_one(params, pix):
        return model.apply(
            params, input_ids=ids, attention_mask=att, pixel_values=decode(pix)
        )

    warm = stage(0)
    print(f"[{time.time()-t0:6.1f}s] init params on device...", flush=True)
    warm_one = {k: v[0] for k, v in warm.items()}
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), input_ids=ids,
                           attention_mask=att, pixel_values=decode(warm_one))
    )()
    params = maybe_quantize_params(args, params)

    if chunk == 1:
        @jax.jit
        def apply_many(params, stacked):
            return forward_one(params, {k: v[0] for k, v in stacked.items()})[None]
    else:
        @jax.jit
        def apply_many(params, stacked):
            return jax.lax.map(lambda b: forward_one(params, b), stacked)

    print(f"[{time.time()-t0:6.1f}s] compiling fused decode+forward...", flush=True)
    with quant_ctx(args):
        np.asarray(apply_many(params, warm))

    # tunnel bandwidth probe: the link is SHARED and varies run to run
    # (11-77 MB/s observed); print it so every result is interpretable as
    # pages/min ~= 60 / (fwd_s + wire_bytes / BW)
    rngp = np.random.default_rng(0)
    probe = rngp.integers(0, 255, size=(24 << 20,)).astype(np.uint8)
    probe2 = rngp.integers(0, 255, size=(24 << 20,)).astype(np.uint8)
    tiny = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    float(tiny(jnp.asarray(probe)))  # compile + warm at full size
    tb = time.perf_counter()
    float(tiny(jnp.asarray(probe2)))
    bw = probe2.nbytes / (time.perf_counter() - tb) / 2**20
    print(f"[{time.time()-t0:6.1f}s] tunnel upload bandwidth now: {bw:.0f} MB/s; running e2e...", flush=True)

    def batches():
        for i in range(0, n_pages, group_pages):
            yield stage(i)

    t1 = time.perf_counter()
    outs = []
    for b in prefetch(batches(), buffer_size=2):
        td = time.perf_counter()
        outs.append(apply_many(params, b))
        if trace:
            print(f"  main: got batch at +{td-t1:6.2f}s, dispatch {(time.perf_counter()-td)*1e3:.0f} ms", flush=True)
    checksum = float(jnp.sum(jnp.stack([jnp.sum(o.astype(jnp.float32)) for o in outs])))
    dt_device = time.perf_counter() - t1
    assert len(outs) == args.e2e_batches // chunk and np.isfinite(checksum)
    dev_rate = n_pages / dt_device * 60
    wire_mb = n_pages * bytes_per_page / 2**20
    print(
        f"RESULT e2e-fused {args.model} [{args.transport}]: {n_pages} pages in "
        f"{dt_device:.2f} s -> {dev_rate:,.0f} pages/min/chip device-resident "
        f"({wire_mb:.0f} MiB wire, {wire_mb/dt_device:.0f} MB/s effective)",
        flush=True,
    )


def run_e2e(args, t0):
    """PIL pages -> processor -> device -> forward -> host embeddings."""
    from colpali_tpu.data.prefetch import prefetch

    if args.model == "colqwen2":
        from colpali_tpu.models.qwen2_vl import ColQwen2, Qwen2VLConfig
        from colpali_tpu.processors.qwen2_vl import ColQwen2Processor

        # reference recipe: 768 visual tokens max (processing_colqwen2.py:58-61);
        # --cap overrides (the 384 budget is the measured throughput sweet spot)
        processor = ColQwen2Processor(_BenchTokenizer(), max_num_visual_tokens=args.cap)
        model = ColQwen2(Qwen2VLConfig(), dim=128, dtype=jnp.bfloat16,
                         param_dtype=jnp.bfloat16, scan_layers=args.scan)
        keys = ("input_ids", "attention_mask", "pixel_values", "patch_mask",
                "vision_hpos", "vision_wpos", "position_ids")
    elif args.model == "colqwen2_5":  # Qwen2.5-VL-3B: windowed vision attention
        from colpali_tpu.models.qwen2_5_vl import ColQwen2_5, Qwen25VLConfig
        from colpali_tpu.models.qwen2_vl import Qwen2TextConfig
        from colpali_tpu.processors.qwen2_5_vl import ColQwen2_5Processor

        config = Qwen25VLConfig(  # 3B text dims
            text=Qwen2TextConfig(
                vocab_size=151936, hidden_size=2048, intermediate_size=11008,
                num_hidden_layers=36, num_attention_heads=16, num_key_value_heads=2,
                head_dim=128, mrope_section=(16, 24, 24),
            )
        )
        processor = ColQwen2_5Processor(_BenchTokenizer(), max_num_visual_tokens=args.cap)
        model = ColQwen2_5(config, dim=128, dtype=jnp.bfloat16,
                           param_dtype=jnp.bfloat16, scan_layers=args.scan)
        keys = ("input_ids", "attention_mask", "pixel_values", "patch_mask",
                "vision_hpos", "vision_wpos", "position_ids", "window_id")
    elif args.model == "colpali":  # PaliGemma-3B, fixed 448x448 SigLIP pipeline
        from colpali_tpu.models.configs import PaliGemmaConfig
        from colpali_tpu.models.paligemma import ColPali
        from colpali_tpu.processors.colpali import ColPaliProcessor

        processor = ColPaliProcessor(_BenchTokenizer())
        model = ColPali(PaliGemmaConfig(), dim=128, dtype=jnp.bfloat16,
                        param_dtype=jnp.bfloat16, scan_layers=args.scan)
        keys = ("input_ids", "attention_mask", "pixel_values")
    else:  # colsmol: ColIdefics3 at the real colSmol-256M dims (512px tiles)
        from colpali_tpu.models.idefics3 import ColIdefics3, Idefics3Config, Idefics3VisionConfig
        from colpali_tpu.models.qwen2_vl import Qwen2TextConfig
        from colpali_tpu.processors.idefics3 import ColIdefics3Processor

        config = Idefics3Config(
            vision=Idefics3VisionConfig(),  # defaults = SmolVLM SigLIP-B/16-512
            text=Qwen2TextConfig(  # SmolLM2-135M dims
                vocab_size=49280, hidden_size=576, intermediate_size=1536,
                num_hidden_layers=30, num_attention_heads=9, num_key_value_heads=3,
                head_dim=64, rope_theta=100000.0, attention_bias=False,
                mrope_section=(32,),  # plain 1D rope in mrope form
            ),
            scale_factor=4,
            image_token_id=6,  # _BenchTokenizer's "<image>"
        )
        processor = ColIdefics3Processor(_BenchTokenizer())
        model = ColIdefics3(config, dim=128, dtype=jnp.bfloat16,
                            param_dtype=jnp.bfloat16, scan_layers=args.scan)
        keys = ("input_ids", "attention_mask", "pixel_values", "tile_mask")

    n_pages = args.batch * args.e2e_batches
    pages = _make_pages(n_pages)
    print(f"[{time.time()-t0:6.1f}s] {n_pages} synthetic pages ready", flush=True)

    chunk = args.e2e_chunk  # batches per device dispatch
    assert args.e2e_batches % chunk == 0, "--e2e-batches must divide by --e2e-chunk"

    def to_device(batch, n):
        """One processor call covers `n` forward batches; reshape every key
        to (n, batch, ...) so lax.map sweeps them in ONE dispatch — per-RPC
        latency over a remote-attached device is the pipeline's fixed cost,
        so the fewer round trips per page the better."""
        out = {}
        for k in keys:
            v = batch[k]
            if k == "pixel_values":
                out[k] = v.astype(jnp.bfloat16).reshape(n, args.batch, *v.shape[1:])
            elif k == "position_ids":  # (3, n*B, S) -> (n, 3, B, S)
                v = np.asarray(v)
                out[k] = jnp.asarray(v.reshape(3, n, args.batch, -1).transpose(1, 0, 2, 3))
            else:
                v = np.asarray(v)
                out[k] = jnp.asarray(v.reshape(n, args.batch, *v.shape[1:]))
        return out

    def stage(i):
        group = pages[i : i + args.batch * chunk]
        return to_device(
            processor.process_images(group, device_pixels=True, host_resize=args.host_resize),
            chunk,
        )

    def batches():
        if args.workers > 1:
            # overlap host preprocess + upload across batches: the upload is
            # the largest pipeline stage on this tunnel (77 MB/s measured,
            # perf/embed_decompose.py) and a single staging thread leaves the
            # link idle while the device computes
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=args.workers) as pool:
                futures = [pool.submit(stage, i) for i in range(0, n_pages, args.batch * chunk)]
                for f in futures:
                    yield f.result()
        else:
            for i in range(0, n_pages, args.batch * chunk):
                yield stage(i)

    warm = stage(0)
    print(f"[{time.time()-t0:6.1f}s] init params on device...", flush=True)
    warm_one = {k: v[0] for k, v in warm.items()}
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), **warm_one))()
    params = maybe_quantize_params(args, params)

    if chunk == 1:
        # no lax.map wrapper for the common case — a length-1 scan still
        # compiles to a loop and can inhibit cross-op optimization
        @jax.jit
        def apply_many(params, stacked):
            return model.apply(params, **{k: v[0] for k, v in stacked.items()})[None]
    else:
        @jax.jit
        def apply_many(params, stacked):
            return jax.lax.map(lambda b: model.apply(params, **b), stacked)

    print(f"[{time.time()-t0:6.1f}s] compiling forward...", flush=True)
    with quant_ctx(args):
        np.asarray(apply_many(params, warm))
    print(f"[{time.time()-t0:6.1f}s] compiled; running e2e...", flush=True)

    # --- ingestion rate: embeddings STAY on device (the production embed ->
    # CorpusIndex path never downloads them; quantization + indexing are
    # device-side). A scalar checksum forces sync without the download.
    t1 = time.perf_counter()
    outs = [apply_many(params, batch) for batch in prefetch(batches(), buffer_size=2)]
    checksum = float(jnp.sum(jnp.stack([jnp.sum(o.astype(jnp.float32)) for o in outs])))
    dt_device = time.perf_counter() - t1
    assert len(outs) == args.e2e_batches // chunk and np.isfinite(checksum)

    # --- plus host fetch (only needed when embeddings must leave the
    # accelerator; over the axon tunnel downloads run at ~1-18 MB/s and
    # dominate, so this is a tunnel artifact, not a pipeline property)
    t2 = time.perf_counter()
    embeddings = [np.asarray(o) for o in outs]
    dt_fetch = time.perf_counter() - t2
    assert len(embeddings) == args.e2e_batches // chunk

    dev_rate = n_pages / dt_device * 60
    host_rate = n_pages / (dt_device + dt_fetch) * 60
    print(
        f"RESULT e2e {args.model}: {n_pages} pages in {dt_device:.2f} s -> "
        f"{dev_rate:,.0f} pages/min/chip device-resident "
        f"({host_rate:,.0f} pages/min incl. host fetch of {dt_fetch:.2f} s)",
        flush=True,
    )


def run_query_latency(args, t0):
    """Query-encode latency: the OTHER half of the serving SLA.

    Pages are embedded offline; at query time the user pays
    text-encode + MaxSim search. This measures the text-only forward at the
    ViDoRe query budget (~32 tokens incl. the 10 augmentation tokens,
    reference processing_utils.py:55-91) for B=1 (latency) and B=8/32
    (throughput): per-dispatch wall latency over the tunnel AND the in-jit
    chained device time (select-dependency loop — see PERF.md methodology).
    At B=1 a 2B bf16 decoder is weight-bound: ~4 GB / 819 GB/s ≈ 5 ms floor.
    """
    s = 32
    # reuse the bench's model builders (real 2B/3B configs); vision inputs
    # are discarded — queries are text-only
    if args.model == "colqwen2":
        model, _ = build_colqwen2(1, 16, text_tokens=4, scan=args.scan)

        def make_inputs(b):
            rng = np.random.default_rng(0)
            return dict(
                input_ids=jnp.asarray(rng.integers(5, 1000, size=(b, s)), jnp.int32),
                attention_mask=jnp.ones((b, s), jnp.int32),
                position_ids=jnp.asarray(np.tile(np.arange(s), (3, b, 1)).astype(np.int64)),
            )
    elif args.model == "colpali":
        model, _ = build_colpali(1, scan=args.scan)

        def make_inputs(b):
            rng = np.random.default_rng(0)
            return dict(
                input_ids=jnp.asarray(rng.integers(5, 1000, size=(b, s)), jnp.int32),
                attention_mask=jnp.ones((b, s), jnp.int32),
            )
    else:
        raise SystemExit(f"--query-latency supports colqwen2/colpali, not {args.model}")

    inputs1 = make_inputs(1)
    print(f"[{time.time()-t0:6.1f}s] init params on device...", flush=True)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), **inputs1))()
    params = maybe_quantize_params(args, params)

    for b in (1, 8, 32):
        inputs = make_inputs(b)
        fwd = jax.jit(lambda p, batch: model.apply(p, **batch))
        np.asarray(fwd(params, inputs))  # compile
        lat = []
        for _ in range(16):
            t1 = time.perf_counter()
            np.asarray(fwd(params, inputs))
            lat.append((time.perf_counter() - t1) * 1e3)
        p50 = float(np.median(lat))

        # true device time: chain iters inside one jit with a runtime-false
        # select dependency (anything algebraic gets folded + hoisted)
        def chained(p, batch, n):
            ids0 = batch["input_ids"]

            def step(carry, _):
                ids = jnp.where(carry > 1e30, jnp.zeros_like(ids0), ids0)
                out = model.apply(p, **{**batch, "input_ids": ids})
                return carry + jnp.sum(out.astype(jnp.float32)), ()

            c, _ = jax.lax.scan(step, jnp.float32(0), None, length=n)
            return c

        times = {}
        for n in (2, 10):
            jc = jax.jit(lambda p, batch, n=n: chained(p, batch, n))
            np.asarray(jc(params, inputs))
            ts = [0.0] * 3
            for i in range(3):
                t1 = time.perf_counter()
                np.asarray(jc(params, inputs))
                ts[i] = (time.perf_counter() - t1) * 1e3
            times[n] = min(ts)
        dev = (times[10] - times[2]) / 8
        print(
            f"RESULT query-encode {args.model}: B={b:2d} S={s} "
            f"p50 {p50:6.1f} ms/dispatch (tunnel) | device {dev:6.2f} ms/batch "
            f"= {dev/b:5.2f} ms/query",
            flush=True,
        )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="colqwen2", choices=["colqwen2", "colqwen2_5", "colpali", "colsmol"])
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--patches", type=int, default=768)
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--scan", action="store_true", help="scan-over-layers (fast compile)")
    parser.add_argument("--e2e", action="store_true", help="full pipeline: PIL -> processor -> forward -> host")
    parser.add_argument("--e2e-batches", type=int, default=12)
    parser.add_argument("--e2e-chunk", type=int, default=1, help="forward batches per device dispatch (lax.map)")
    parser.add_argument("--cap", type=int, default=768,
                        help="max visual tokens for the e2e processor (reference default 768)")
    parser.add_argument("--transport", choices=["rgb-u8", "yuv420", "gray"],
                        help="fused ingestion fast path (colpali): u8 pixels "
                             "decoded + normalized INSIDE the forward jit; "
                             "yuv420 halves the host->device wire bytes")
    parser.add_argument("--trace", action="store_true",
                        help="per-batch staging/dispatch timestamps (fused path)")
    parser.add_argument("--reducing-gap", type=float, default=None,
                        help="PIL reducing_gap for the host resize (1.0 halves "
                             "the bicubic cost via a box pre-reduce)")
    parser.add_argument("--host-resize", action="store_true",
                        help="smart_resize on host pre-upload (4x fewer bytes over the link)")
    parser.add_argument("--workers", type=int, default=1,
                        help="parallel preprocess+upload staging threads")
    parser.add_argument("--query-latency", action="store_true",
                        help="text-only query-encode latency (B=1/8/32, 32 tokens)")
    parser.add_argument("--quant", nargs="?", const="dynamic", choices=["dynamic", "stored"],
                        help="int8 serving mode: 'dynamic' (w8a8 in-jit requantize) or "
                             "'stored' (pre-quantized int8 kernels, half weight HBM traffic)")
    args = parser.parse_args()

    if args.query_latency:
        run_query_latency(args, time.time())
        return
    if args.e2e:
        if args.transport:
            run_e2e_fused(args, time.time())
        else:
            run_e2e(args, time.time())
        return

    t0 = time.time()
    print(f"[{time.time()-t0:6.1f}s] building {args.model} batch={args.batch}", flush=True)
    if args.model == "colqwen2":
        model, inputs = build_colqwen2(args.batch, args.patches, text_tokens=20, scan=args.scan)
    else:
        model, inputs = build_colpali(args.batch, scan=args.scan)

    print(f"[{time.time()-t0:6.1f}s] init params on device...", flush=True)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), **inputs))()
    params = maybe_quantize_params(args, params)
    n_params = sum(int(x.size) for x in jax.tree.leaves(params))
    print(f"[{time.time()-t0:6.1f}s] params: {n_params/1e9:.2f}B", flush=True)

    iters = args.iters

    # Per-dispatch forwards, synced once at the end — NOT in-jit fori_loop
    # chaining: with pixel_values constant across iterations XLA hoists the
    # whole vision tower out of the loop, inflating the "ceiling" 3-4x
    # (round 2 shipped 2,490 pages/min from exactly this artifact; the honest
    # number at the same config is ~660). Async dispatch pipelines the
    # sequential executions, so per-dispatch RPC latency stays off this
    # number (perf/embed_pipeline_probe.py cases D/E: chunking dispatches
    # with lax.map changes nothing).
    fwd = jax.jit(lambda p, b_: model.apply(p, **b_))
    print(f"[{time.time()-t0:6.1f}s] compiling forward...", flush=True)
    with quant_ctx(args):
        np.asarray(fwd(params, inputs))
    print(f"[{time.time()-t0:6.1f}s] compiled; timing...", flush=True)
    times = []
    for _ in range(3):
        t1 = time.perf_counter()
        outs = [fwd(params, inputs) for _ in range(iters)]
        _ = float(np.asarray(jnp.sum(jnp.stack([jnp.sum(o.astype(jnp.float32)) for o in outs]))))
        times.append((time.perf_counter() - t1) / iters)
    dt = min(times)
    pages_per_min = args.batch / dt * 60
    seq = inputs["input_ids"].shape[1]
    print(
        f"RESULT {args.model}: batch={args.batch} seq={seq} {dt*1000:.1f} ms/batch -> "
        f"{pages_per_min:,.0f} pages/min/chip ({args.batch/dt:.1f} pages/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
