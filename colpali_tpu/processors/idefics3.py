"""ColIdefics3 (ColSmol) processor: image splitting + split-image prompts.

Behavioral spec:
- reference ColIdefics3Processor
  (/root/reference/colpali_engine/models/idefics3/colidefics3/processing_colidefics3.py)
  delegates to HF Idefics3Processor with ``visual_prompt_prefix =
  "<|im_start|>User:<image>Describe the image.<end_of_utterance>\\nAssistant:"``
  (:25); queries are tokenized RAW (no prefix wrapper, :64-78), with the
  base 10x ``<end_of_utterance>`` augmentation suffix (:23).
- HF Idefics3 pipeline: resize so the longest edge <= ``size.longest_edge``
  (4x512 for ColSmol), split into ceil-grid 512px sub-images + one global
  512px image (image_processing_idefics3.py:382-440), prompt layout with
  ``<fake_token_around_image>`` / ``<row_r_col_c>`` / ``<global-img>``
  markers (processing_idefics3.py:46-87).

TPU deviation (documented): every tile is resized to exactly
``tile_size`` x ``tile_size`` instead of ragged crops + patch masks — all
vision shapes are static. Resampling differences are sub-pixel.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from colpali_tpu.processors.base import BaseVisualRetrieverProcessor, Batch
from colpali_tpu.processors.image_processing import to_rgb_array


@functools.partial(jax.jit, static_argnums=1)
def _resize_batch_jit(arrs: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    b = arrs.shape[0]
    return jax.image.resize(arrs, (b, *shape, 3), method="bicubic", antialias=True)


@functools.lru_cache(maxsize=128)
def _resize_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) interpolation matrix, bit-equal to jax.image.resize's
    bicubic+antialias along one axis (resizing is linear, so the matrix IS
    the resize of the identity). Cached per (src, dst)."""
    eye = jnp.eye(src, dtype=jnp.float32)
    return np.asarray(jax.image.resize(eye, (dst, src), method="bicubic", antialias=True))


@functools.partial(
    jax.jit, static_argnames=("h1", "w1", "rows", "cols", "s", "crop_bounds")
)
def _split_resize_normalize(
    batch: jnp.ndarray,  # (B, H0, W0, 3) uint8/float (0-255)
    mean: jnp.ndarray,
    std: jnp.ndarray,
    mh1: Optional[jnp.ndarray],  # (h1, H0) longest-edge resize matrices
    mw1: Optional[jnp.ndarray],  # (w1, W0)
    crop_mats: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...],  # per-crop (s,ch),(s,cw)
    h1: int,
    w1: int,
    rows: int,
    cols: int,
    s: int,
    crop_bounds: Tuple[Tuple[int, int, int, int], ...],
) -> jnp.ndarray:
    """Fused tile pipeline for one shape group, TPU-layout-aware.

    Two traps this avoids (measured ~2.4 s/batch on the naive version,
    perf/colsmol_staging_probe.py):
    - NHWC float work with C=3 as the minor (lane) dim wastes 125/128 of
      every TPU vector lane; channels are folded into the batch dim
      ((B, H, W, 3) -> (B*3, H, W)) so lanes run along W.
    - jax.image.resize per crop is slow and was dispatched 13x per batch;
      here every resize is two MXU matmuls against cached interpolation
      matrices (exactly equal to bicubic+antialias: resize is linear), all
      in ONE compiled program.

    Returns (B, rows*cols+1, s, s, 3) normalized tiles (global last).
    """
    b, h0, w0, _ = batch.shape
    x = batch.transpose(0, 3, 1, 2).reshape(b * 3, h0, w0).astype(jnp.float32)
    # PER-AXIS guards: the longest-edge resize can change exactly one axis
    # (e.g. 2000x2049 -> 2000x2048), and the unchanged axis carries a (1,1)
    # placeholder matrix that must not reach an einsum
    if h0 != h1:
        x = jnp.einsum("Hh,bhw->bHw", mh1, x)
    if w0 != w1:
        x = jnp.einsum("Ww,bhw->bhW", mw1, x)
    tiles = []
    for (r0, r1, c0, c1), (mh, mw) in zip(crop_bounds, crop_mats):
        crop = x[:, r0:r1, c0:c1]
        t = jnp.einsum("Hh,bhw->bHw", mh, crop) if crop.shape[1] != s else crop
        t = jnp.einsum("Ww,bhw->bhW", mw, t) if t.shape[2] != s else t
        tiles.append(t)
    stacked = jnp.stack(tiles, axis=1)  # (B*3, T, s, s)
    t_n = stacked.shape[1]
    out = stacked.reshape(b, 3, t_n, s, s).transpose(0, 2, 3, 4, 1)
    return (out / 255.0 - mean) / std


def _resize_grouped(items: List[Tuple[np.ndarray, Tuple[int, int]]]) -> List[np.ndarray]:
    """Resize many (array, (h, w)) requests, grouping identical
    (source shape, target) pairs into one batched device call. The split-image
    pipeline issues up to rows*cols+2 resizes per page; per-call RPC latency
    on remote-attached accelerators makes per-crop dispatch the hot spot."""
    groups: Dict[Tuple[Tuple[int, ...], Tuple[int, int]], List[int]] = {}
    for i, (arr, target) in enumerate(items):
        groups.setdefault((arr.shape, target), []).append(i)
    out: List[Optional[np.ndarray]] = [None] * len(items)
    for ((src, target), idxs) in groups.items():
        if src[:2] == target:  # no-op resize
            for i in idxs:
                out[i] = items[i][0]
            continue
        batch = jnp.asarray(np.stack([items[i][0] for i in idxs]), jnp.float32)
        res = np.asarray(_resize_batch_jit(batch, target))
        for j, i in enumerate(idxs):
            out[i] = res[j]
    return out


def resized_dimensions(height: int, width: int, longest_edge: Optional[int]) -> Tuple[int, int]:
    """Longest-edge resize with even dims (reference
    Idefics3SplitImageInterpretabilityMixin._calculate_resized_dimensions,
    processing_utils.py:338-383)."""
    if longest_edge is None:
        return height, width
    aspect_ratio = width / height
    if width >= height:
        width_new = longest_edge
        height_new = int(width_new / aspect_ratio)
        height_new += height_new % 2
    else:
        height_new = longest_edge
        width_new = int(height_new * aspect_ratio)
        width_new += width_new % 2
    return max(height_new, 1), max(width_new, 1)


class ColIdefics3Processor(BaseVisualRetrieverProcessor):
    image_token: str = "<image>"
    fake_image_token: str = "<fake_token_around_image>"
    global_img_token: str = "<global-img>"
    prompt_prefix: str = "<|im_start|>User:"
    prompt_suffix: str = "<end_of_utterance>\nAssistant:"

    def __init__(
        self,
        tokenizer: Any,
        tile_size: int = 512,
        longest_edge: int = 2048,
        image_seq_len: int = 64,
        image_mean: Sequence[float] = (0.5, 0.5, 0.5),
        image_std: Sequence[float] = (0.5, 0.5, 0.5),
    ):
        self.tokenizer = tokenizer
        self.tile_size = tile_size
        self.longest_edge = longest_edge
        self.image_seq_len = image_seq_len
        self.image_mean = np.asarray(image_mean, np.float32)
        self.image_std = np.asarray(image_std, np.float32)
        self.image_token_id = tokenizer.convert_tokens_to_ids(self.image_token)

    @classmethod
    def from_pretrained(cls, path: str, **kwargs) -> "ColIdefics3Processor":
        import json
        import os

        from colpali_tpu.processors.base import load_tokenizer

        tokenizer = load_tokenizer(path)
        init_kwargs: Dict[str, Any] = {}
        pp_path = os.path.join(path, "preprocessor_config.json")
        if os.path.exists(pp_path):
            with open(pp_path) as f:
                pp = json.load(f)
            init_kwargs["tile_size"] = pp.get("max_image_size", {}).get("longest_edge", 512)
            init_kwargs["longest_edge"] = pp.get("size", {}).get("longest_edge", 2048)
            init_kwargs["image_mean"] = pp.get("image_mean", (0.5, 0.5, 0.5))
            init_kwargs["image_std"] = pp.get("image_std", (0.5, 0.5, 0.5))
        proc_path = os.path.join(path, "processor_config.json")
        if os.path.exists(proc_path):
            with open(proc_path) as f:
                init_kwargs["image_seq_len"] = json.load(f).get("image_seq_len", 64)
        init_kwargs.update(kwargs)
        return cls(tokenizer, **init_kwargs)

    def _export_configs(self) -> tuple:
        pp = {
            "max_image_size": {"longest_edge": self.tile_size},
            "size": {"longest_edge": self.longest_edge},
            "image_mean": [float(x) for x in self.image_mean],
            "image_std": [float(x) for x in self.image_std],
        }
        return pp, {"image_seq_len": self.image_seq_len}

    # reference ClassVar (processing_colidefics3.py:23)
    query_augmentation_token: str = "<end_of_utterance>"

    def _split_one(self, image) -> Tuple[np.ndarray, int, int]:
        """-> (tiles (T, S, S, 3) normalized with global tile last, rows, cols)."""
        return self._split_many([image])[0]

    def _split_many(self, images: Sequence[Any]) -> List[Tuple[np.ndarray, int, int]]:
        """Split-image pipeline over a batch: the longest-edge resizes, then
        ALL tile crops across all images, are issued as shape-grouped batched
        device calls (same-size pages share every group, so a batch costs a
        handful of dispatches instead of rows*cols+2 per page)."""
        s = self.tile_size
        arrs = [to_rgb_array(im).astype(np.float32) for im in images]
        stage1 = []
        for arr in arrs:
            h0, w0 = arr.shape[:2]
            h1, w1 = resized_dimensions(h0, w0, self.longest_edge if max(h0, w0) > self.longest_edge else None)
            stage1.append((arr, (h1, w1)))
        resized = _resize_grouped(stage1)

        crops: List[Tuple[np.ndarray, Tuple[int, int]]] = []
        layout: List[Tuple[int, int, int]] = []  # (n_tiles incl. global, rows, cols)
        for res in resized:
            h1, w1 = res.shape[:2]
            if h1 > s or w1 > s:
                rows, cols = math.ceil(h1 / s), math.ceil(w1 / s)
                opt_h, opt_w = math.ceil(h1 / rows), math.ceil(w1 / cols)
                for r in range(rows):
                    for c in range(cols):
                        crop = res[r * opt_h : min((r + 1) * opt_h, h1), c * opt_w : min((c + 1) * opt_w, w1)]
                        crops.append((crop, (s, s)))
            else:
                rows = cols = 0
            crops.append((res, (s, s)))  # global view
            layout.append((rows * cols + 1, rows, cols))

        tiles_flat = _resize_grouped(crops)
        out: List[Tuple[np.ndarray, int, int]] = []
        pos = 0
        for n_tiles, rows, cols in layout:
            stacked = np.stack(tiles_flat[pos : pos + n_tiles])
            pos += n_tiles
            stacked = (stacked / 255.0 - self.image_mean) / self.image_std
            out.append((stacked.astype(np.float32), rows, cols))
        return out

    def _split_many_device(self, images: Sequence[Any]):
        """Device-resident split pipeline: resizes, crops, tile resizes and
        normalization all run on the accelerator and the padded
        ``(B, T_max, S, S, 3)`` tile batch never visits the host (a page's
        normalized tiles are ~50 MB of fp32 — downloads at MB/s dominate on
        remote-attached devices). Returns (device tiles, tile counts,
        [(rows, cols)] per image)."""
        s = self.tile_size
        # uint8 upload — float32 would be 4x the bytes over the
        # host->device link (the fused kernel upcasts on device)
        arrs = [to_rgb_array(im) for im in images]
        groups: Dict[Tuple[Tuple[int, int], Tuple[int, int]], List[int]] = {}
        for i, arr in enumerate(arrs):
            h0, w0 = arr.shape[:2]
            h1, w1 = resized_dimensions(h0, w0, self.longest_edge if max(h0, w0) > self.longest_edge else None)
            groups.setdefault(((h0, w0), (h1, w1)), []).append(i)

        mean_j = jnp.asarray(self.image_mean)
        std_j = jnp.asarray(self.image_std)
        group_tiles, idx_groups, layouts = [], [], {}
        for ((_, (h1, w1)), idxs) in groups.items():
            batch = jnp.asarray(np.stack([arrs[i] for i in idxs]))
            h0, w0 = batch.shape[1:3]
            if h1 > s or w1 > s:
                rows, cols = math.ceil(h1 / s), math.ceil(w1 / s)
            else:
                rows = cols = 0
            # static crop bounds + cached interpolation matrices per crop
            bounds, mats = [], []
            if rows and cols:
                opt_h, opt_w = math.ceil(h1 / rows), math.ceil(w1 / cols)
                for r in range(rows):
                    for c in range(cols):
                        r0, r1 = r * opt_h, min((r + 1) * opt_h, h1)
                        c0, c1 = c * opt_w, min((c + 1) * opt_w, w1)
                        bounds.append((r0, r1, c0, c1))
                        mats.append((
                            jnp.asarray(_resize_matrix(r1 - r0, s)),
                            jnp.asarray(_resize_matrix(c1 - c0, s)),
                        ))
            bounds.append((0, h1, 0, w1))  # global view
            mats.append((
                jnp.asarray(_resize_matrix(h1, s)) if h1 != s else jnp.zeros((1, 1)),
                jnp.asarray(_resize_matrix(w1, s)) if w1 != s else jnp.zeros((1, 1)),
            ))
            mh1 = jnp.asarray(_resize_matrix(h0, h1)) if h0 != h1 else jnp.zeros((1, 1))
            mw1 = jnp.asarray(_resize_matrix(w0, w1)) if w0 != w1 else jnp.zeros((1, 1))
            # one fused dispatch per shape group (resize+crops+normalize as
            # channels-folded MXU matmuls — see _split_resize_normalize)
            group_tiles.append(
                _split_resize_normalize(
                    batch, mean_j, std_j, mh1, mw1, tuple(mats),
                    h1, w1, rows, cols, s, tuple(bounds),
                )
            )
            idx_groups.append(idxs)
            for i in idxs:
                layouts[i] = (rows, cols)

        from colpali_tpu.processors.image_processing import restore_group_order

        t_max = max(g.shape[1] for g in group_tiles)
        padded = [
            jnp.pad(g, ((0, 0), (0, t_max - g.shape[1]), (0, 0), (0, 0), (0, 0)))
            for g in group_tiles
        ]
        stacked = restore_group_order(padded, idx_groups)
        counts = [layouts[i][0] * layouts[i][1] + 1 for i in range(len(arrs))]
        return stacked, counts, [layouts[i] for i in range(len(arrs))]

    def _image_prompt(self, rows: int, cols: int) -> str:
        """HF get_image_prompt_string (processing_idefics3.py:46-87)."""
        img = self.image_token * self.image_seq_len
        if rows == 0 and cols == 0:
            return f"{self.fake_image_token}{self.global_img_token}{img}{self.fake_image_token}"
        text = ""
        for r in range(rows):
            for c in range(cols):
                text += f"{self.fake_image_token}<row_{r + 1}_col_{c + 1}>{img}"
            text += "\n"
        text += f"\n{self.fake_image_token}{self.global_img_token}{img}{self.fake_image_token}"
        return text

    def _tokenize(self, texts: Sequence[str]) -> Batch:
        enc = self.tokenizer(
            list(texts),
            padding="longest",
            padding_side="right",
            add_special_tokens=False,
            return_tensors="np",
        )
        return {"input_ids": np.asarray(enc["input_ids"]), "attention_mask": np.asarray(enc["attention_mask"])}

    def process_images(
        self,
        images: Sequence[Any],
        context_prompts: Optional[Sequence[str]] = None,
        device_pixels: bool = False,
        host_resize: bool = False,
    ) -> Batch:
        """device_pixels=True keeps the padded tile batch on device (see
        _split_many_device); host numpy otherwise. host_resize=True applies
        the longest-edge resize on host BEFORE upload when a page exceeds
        ``longest_edge`` (fewer bytes over a bandwidth-limited link); pages
        already within the limit upload raw — the 512px tile crops are
        device-side either way."""
        if host_resize:
            from PIL import Image

            shrunk = []
            for im in images:
                arr = to_rgb_array(im)
                h0, w0 = arr.shape[:2]
                if max(h0, w0) > self.longest_edge:
                    h1, w1 = resized_dimensions(h0, w0, self.longest_edge)
                    arr = np.asarray(
                        Image.fromarray(arr).resize((w1, h1), Image.Resampling.BICUBIC)
                    )
                shrunk.append(arr)
            images = shrunk
        if device_pixels:
            device_tiles, counts, rc = self._split_many_device(images)
            layouts = [(counts[i], *rc[i]) for i in range(len(images))]
        else:
            split = self._split_many(images)
            layouts = [(tiles.shape[0], rows, cols) for tiles, rows, cols in split]
        prompts = []
        user_prompts = list(context_prompts) if context_prompts else ["Describe the image."] * len(images)
        for (_, rows, cols), user in zip(layouts, user_prompts):
            prompts.append(
                f"{self.prompt_prefix}{self._image_prompt(rows, cols)}{user}{self.prompt_suffix}"
            )
        batch = self._tokenize(prompts)

        t_max = device_tiles.shape[1] if device_pixels else max(n for n, _, _ in layouts)
        s = self.tile_size
        tile_mask = np.zeros((len(images), t_max), bool)
        for i, (n_tiles, _, _) in enumerate(layouts):
            tile_mask[i, :n_tiles] = True
        if device_pixels:
            batch["pixel_values"] = device_tiles
        else:
            pixel_values = np.zeros((len(images), t_max, s, s, 3), np.float32)
            for i, (tiles, _, _) in enumerate(split):
                pixel_values[i, : tiles.shape[0]] = tiles
            batch["pixel_values"] = pixel_values
        batch["tile_mask"] = tile_mask
        return batch

    def process_texts(self, texts: Sequence[str]) -> Batch:
        """Raw tokenization — the reference applies no query wrapper
        (processing_colidefics3.py:64-78)."""
        return self._tokenize(list(texts))

    def get_n_patches(self, image_size: Tuple[int, int], patch_size: Optional[int] = None) -> Tuple[int, int]:
        """Token grid of the LOCAL tiles, ceil(resized / tile) x tokens/side
        (reference processing_colidefics3.py:92-126)."""
        h, w = image_size
        h1, w1 = resized_dimensions(h, w, self.longest_edge if max(h, w) > self.longest_edge else None)
        side = int(math.sqrt(self.image_seq_len))
        if h1 > self.tile_size or w1 > self.tile_size:
            rows, cols = math.ceil(h1 / self.tile_size), math.ceil(w1 / self.tile_size)
        else:
            rows = cols = 1
        return cols * side, rows * side

    def get_image_mask(self, batch: Batch) -> np.ndarray:
        return batch["input_ids"] == self.image_token_id

    def get_local_image_mask(self, batch: Batch) -> np.ndarray:
        """Image-token mask excluding the global tile (the LAST image_seq_len
        image tokens per row; reference processing_utils.py:299-336)."""
        full = self.get_image_mask(batch)
        local = full.copy()
        for i in range(full.shape[0]):
            positions = np.nonzero(full[i])[0]
            if positions.size > self.image_seq_len:
                local[i, positions[-self.image_seq_len :]] = False
            else:
                pass  # single-tile images keep the global view as their map
        return local
