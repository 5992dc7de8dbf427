"""ColQwen2 processor: dynamic-resolution smart-resize + patchify + M-RoPE.

Behavioral spec:
- reference ColQwen2Processor
  (/root/reference/colpali_engine/models/qwen2/colqwen2/processing_colqwen2.py):
  prompt ``<|im_start|>user\\n<|vision_start|><|image_pad|><|vision_end|>
  Describe the image.<|im_end|><|endoftext|>``, query augmentation token
  ``<|endoftext|>``, left padding, per-image padded pixel sequences +
  image_grid_thw, ``max_num_visual_tokens * 28 * 28 -> max_pixels``.
- HF Qwen2VLImageProcessor: ``smart_resize`` (dims divisible by
  patch*merge=28, pixel count in [min_pixels, max_pixels]) and the exact
  merge-block patch flattening order (image_processing_qwen2_vl.py:54-297).
- HF Qwen2VLModel.get_rope_index: 3-channel M-RoPE positions
  (modeling_qwen2_vl.py:925-1060) — ported to numpy host-side so the jitted
  model sees plain arrays.
"""

from __future__ import annotations

import functools
import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from colpali_tpu.processors.base import BaseVisualRetrieverProcessor, Batch
from colpali_tpu.processors.image_processing import to_rgb_array


def smart_resize(
    height: int,
    width: int,
    factor: int = 28,
    min_pixels: int = 56 * 56,
    max_pixels: int = 14 * 14 * 4 * 1280,
) -> Tuple[int, int]:
    """Exact port of HF smart_resize (image_processing_qwen2_vl.py:54-80)."""
    if max(height, width) / min(height, width) > 200:
        raise ValueError(
            f"absolute aspect ratio must be smaller than 200, got {max(height, width) / min(height, width)}"
        )
    h_bar = round(height / factor) * factor
    w_bar = round(width / factor) * factor
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = max(factor, math.floor(height / beta / factor) * factor)
        w_bar = max(factor, math.floor(width / beta / factor) * factor)
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


def patchify(
    image_chw: np.ndarray,
    patch_size: int = 14,
    temporal_patch_size: int = 2,
    merge_size: int = 2,
) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """Flatten a normalized (C, H, W) image into merge-ordered patch rows.

    Exact port of the HF patch flattening
    (image_processing_qwen2_vl.py:270-297): temporal duplication, then
    reshape/transpose so patches appear merge-block by merge-block.
    Returns ((grid_t*grid_h*grid_w, C*T*ps*ps), (t, h, w)).
    """
    patches = image_chw[None]  # (1, C, H, W) single frame
    if patches.shape[0] % temporal_patch_size != 0:
        repeats = np.repeat(patches[-1][None], temporal_patch_size - patches.shape[0] % temporal_patch_size, 0)
        patches = np.concatenate([patches, repeats], axis=0)
    channel = patches.shape[1]
    grid_t = patches.shape[0] // temporal_patch_size
    grid_h, grid_w = patches.shape[2] // patch_size, patches.shape[3] // patch_size
    patches = patches.reshape(
        grid_t, temporal_patch_size, channel,
        grid_h // merge_size, merge_size, patch_size,
        grid_w // merge_size, merge_size, patch_size,
    )
    patches = patches.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    flat = patches.reshape(grid_t * grid_h * grid_w, channel * temporal_patch_size * patch_size * patch_size)
    return flat, (grid_t, grid_h, grid_w)


def patchify_video(
    frames_tchw: np.ndarray,
    patch_size: int = 14,
    temporal_patch_size: int = 2,
    merge_size: int = 2,
) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """Flatten normalized (T, C, H, W) video frames into merge-ordered patch
    rows (same HF pipeline as :func:`patchify`, with grid_t = ceil(T/2))."""
    patches = np.asarray(frames_tchw)
    if patches.shape[0] % temporal_patch_size != 0:
        repeats = np.repeat(
            patches[-1][None], temporal_patch_size - patches.shape[0] % temporal_patch_size, 0
        )
        patches = np.concatenate([patches, repeats], axis=0)
    channel = patches.shape[1]
    grid_t = patches.shape[0] // temporal_patch_size
    grid_h, grid_w = patches.shape[2] // patch_size, patches.shape[3] // patch_size
    patches = patches.reshape(
        grid_t, temporal_patch_size, channel,
        grid_h // merge_size, merge_size, patch_size,
        grid_w // merge_size, merge_size, patch_size,
    )
    patches = patches.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    flat = patches.reshape(grid_t * grid_h * grid_w, channel * temporal_patch_size * patch_size**2)
    return flat, (grid_t, grid_h, grid_w)


@functools.partial(
    jax.jit,
    static_argnames=("h1", "w1", "patch_size", "temporal_patch_size", "merge_size", "out_dtype"),
)
def _resize_patchify_device(
    images_u8: jnp.ndarray,
    mean: jnp.ndarray,
    std: jnp.ndarray,
    h1: int,
    w1: int,
    patch_size: int,
    temporal_patch_size: int,
    merge_size: int,
    out_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Fused on-device image pipeline: (B, H0, W0, 3) uint8 -> resize ->
    normalize -> merge-ordered patch rows (B, grid_h*grid_w, C*T*ps*ps).

    Same math as :func:`patchify` over :func:`_resize_normalize`, kept
    entirely on the accelerator: raw uint8 uploads once and patches feed the
    vision tower directly. The host round trip this replaces is catastrophic
    on remote-attached devices (axon downloads measured at 1-18 MB/s, turning
    a 33 ms resize into seconds per batch).
    """
    from colpali_tpu.processors.image_processing import _resize_normalize

    x = _resize_normalize(images_u8, mean, std, h1, w1)  # (B, h1, w1, 3) f32
    b = x.shape[0]
    x = x.transpose(0, 3, 1, 2)  # (B, C, H, W)
    # single frames: temporal duplication to fill the temporal patch
    patches = jnp.broadcast_to(x[:, None], (b, temporal_patch_size, 3, h1, w1))
    grid_h, grid_w = h1 // patch_size, w1 // patch_size
    patches = patches.reshape(
        b, 1, temporal_patch_size, 3,
        grid_h // merge_size, merge_size, patch_size,
        grid_w // merge_size, merge_size, patch_size,
    )
    patches = patches.transpose(0, 1, 4, 7, 5, 8, 3, 2, 6, 9)
    flat = patches.reshape(b, grid_h * grid_w, 3 * temporal_patch_size * patch_size * patch_size)
    return flat.astype(out_dtype)


def vision_positions(grid_thw: Tuple[int, int, int], merge_size: int = 2) -> Tuple[np.ndarray, np.ndarray]:
    """Per-patch (h, w) grid positions in merge-block order (HF rot_pos_emb,
    modeling_qwen2_vl.py:673-701)."""
    t, h, w = grid_thw
    hpos = np.arange(h)[:, None].repeat(w, 1)
    hpos = hpos.reshape(h // merge_size, merge_size, w // merge_size, merge_size)
    hpos = hpos.transpose(0, 2, 1, 3).reshape(-1)
    wpos = np.arange(w)[None, :].repeat(h, 0)
    wpos = wpos.reshape(h // merge_size, merge_size, w // merge_size, merge_size)
    wpos = wpos.transpose(0, 2, 1, 3).reshape(-1)
    return np.tile(hpos, t), np.tile(wpos, t)


def get_rope_index(
    input_ids: np.ndarray,
    attention_mask: np.ndarray,
    image_grid_thw: Optional[np.ndarray],
    image_token_id: int,
    vision_start_token_id: int,
    spatial_merge_size: int = 2,
    t_steps: Optional[np.ndarray] = None,
) -> np.ndarray:
    """numpy port of Qwen2VLModel.get_rope_index.

    Returns position_ids (3, B, S). Padding positions get 1 (matching the
    HF initialization; they are masked in attention anyway).

    ``t_steps``: optional per-grid TEMPORAL position stride (float). For
    images (and qwen2/2.5-VL videos) this is 1; Qwen2.5-Omni video documents
    stride the temporal axis in real time:
    ``second_per_grid * position_id_per_seconds`` with a per-element floor
    (modeling_qwen2_5_omni.py get_rope_index: ``(arange(grid_t) *
    second_per_grids[i] * position_id_per_seconds).long()``) — pass the
    video grids as ``image_grid_thw`` with the VIDEO token id and the
    per-video stride here.
    """
    b, s = input_ids.shape
    if image_grid_thw is None:
        pos = np.clip(np.cumsum(attention_mask, axis=-1) - 1, 0, None)
        pos = np.where(attention_mask == 0, 1, pos)
        return np.broadcast_to(pos[None], (3, b, s)).astype(np.int64)

    position_ids = np.ones((3, b, s), dtype=np.int64)
    image_index = 0
    for i in range(b):
        ids = input_ids[i][attention_mask[i] == 1]
        tokens = ids.tolist()
        vision_starts = np.nonzero(ids == vision_start_token_id)[0]
        image_nums = int((ids[vision_starts + 1] == image_token_id).sum()) if vision_starts.size else 0

        pos_chunks: List[np.ndarray] = []
        st = 0
        for _ in range(image_nums):
            ed = tokens.index(image_token_id, st)
            t, h, w = (int(x) for x in image_grid_thw[image_index])
            image_index += 1
            gt, gh, gw = t, h // spatial_merge_size, w // spatial_merge_size
            text_len = ed - st
            st_idx = pos_chunks[-1].max() + 1 if pos_chunks else 0
            pos_chunks.append(np.broadcast_to(np.arange(text_len), (3, text_len)) + st_idx)
            t_step = 1.0 if t_steps is None else float(t_steps[image_index - 1])
            t_vals = np.floor(np.arange(gt) * t_step).astype(np.int64)
            t_index = t_vals[:, None].repeat(gh * gw, 1).reshape(-1)
            h_index = np.arange(gh)[None, :, None].repeat(gt, 0).repeat(gw, 2).reshape(-1)
            w_index = np.arange(gw)[None, None, :].repeat(gt, 0).repeat(gh, 1).reshape(-1)
            pos_chunks.append(np.stack([t_index, h_index, w_index]) + text_len + st_idx)
            st = ed + gt * gh * gw
        if st < len(tokens):
            st_idx = pos_chunks[-1].max() + 1 if pos_chunks else 0
            text_len = len(tokens) - st
            pos_chunks.append(np.broadcast_to(np.arange(text_len), (3, text_len)) + st_idx)

        llm_positions = np.concatenate(pos_chunks, axis=1)
        position_ids[:, i, attention_mask[i] == 1] = llm_positions
    return position_ids


class ColQwen2Processor(BaseVisualRetrieverProcessor):
    visual_prompt_prefix: str = (
        "<|im_start|>user\n<|vision_start|><|image_pad|><|vision_end|>Describe the image.<|im_end|><|endoftext|>"
    )
    query_augmentation_token: str = "<|endoftext|>"
    image_token: str = "<|image_pad|>"
    vision_start_token: str = "<|vision_start|>"

    def __init__(
        self,
        tokenizer: Any,
        patch_size: int = 14,
        merge_size: int = 2,
        temporal_patch_size: int = 2,
        min_pixels: int = 56 * 56,
        max_pixels: int = 14 * 14 * 4 * 1280,
        max_num_visual_tokens: Optional[int] = None,
        image_mean: Sequence[float] = (0.48145466, 0.4578275, 0.40821073),
        image_std: Sequence[float] = (0.26862954, 0.26130258, 0.27577711),
        reducing_gap: Optional[float] = None,
    ):
        # reducing_gap: PIL box-pre-reduce for the host_resize path (1.0
        # halves the bicubic cost on ~4x downscales; quality drift pinned by
        # tests/processors/test_pixel_transport.py). None = exact bicubic.
        self.reducing_gap = reducing_gap
        self.tokenizer = tokenizer
        self.patch_size = patch_size
        self.merge_size = merge_size
        self.temporal_patch_size = temporal_patch_size
        self.min_pixels = min_pixels
        # reference from_pretrained: max_num_visual_tokens * 28 * 28
        # (processing_colqwen2.py:58-61)
        self.max_pixels = (
            max_num_visual_tokens * (patch_size * merge_size) ** 2
            if max_num_visual_tokens is not None
            else max_pixels
        )
        self.image_mean = np.asarray(image_mean, np.float32)
        self.image_std = np.asarray(image_std, np.float32)
        self.image_token_id = tokenizer.convert_tokens_to_ids(self.image_token)
        self.vision_start_token_id = tokenizer.convert_tokens_to_ids(self.vision_start_token)

    @classmethod
    def from_pretrained(cls, path: str, **kwargs) -> "ColQwen2Processor":
        import json
        import os

        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(path)
        init_kwargs = {}
        pp_path = os.path.join(path, "preprocessor_config.json")
        if os.path.exists(pp_path):
            with open(pp_path) as f:
                pp = json.load(f)
            for key in ("patch_size", "merge_size", "temporal_patch_size", "min_pixels", "max_pixels"):
                if key in pp:
                    init_kwargs[key] = pp[key]
            size = pp.get("size", {})
            init_kwargs["min_pixels"] = size.get("shortest_edge", init_kwargs.get("min_pixels", 56 * 56))
            init_kwargs["max_pixels"] = size.get("longest_edge", init_kwargs.get("max_pixels"))
            init_kwargs["image_mean"] = pp.get("image_mean", (0.48145466, 0.4578275, 0.40821073))
            init_kwargs["image_std"] = pp.get("image_std", (0.26862954, 0.26130258, 0.27577711))
        init_kwargs.update(kwargs)
        return cls(tokenizer, **init_kwargs)

    def _export_configs(self) -> tuple:
        pp = {
            "patch_size": self.patch_size,
            "merge_size": self.merge_size,
            "temporal_patch_size": self.temporal_patch_size,
            "min_pixels": self.min_pixels,
            "max_pixels": self.max_pixels,
            "size": {"shortest_edge": self.min_pixels, "longest_edge": self.max_pixels},
            "image_mean": [float(x) for x in self.image_mean],
            "image_std": [float(x) for x in self.image_std],
        }
        return pp, {}

    # --- image pipeline -------------------------------------------------

    def _preprocess_one(self, image) -> Tuple[np.ndarray, Tuple[int, int, int]]:
        """resize (device bicubic) -> normalize -> patchify (host reshape)."""
        flats, grids = self._preprocess_many([image])
        return flats[0], grids[0]

    def _group_by_shape(self, images: Sequence[Any], host_resize: bool = False):
        """Group images by (source shape, smart_resize target): pages from
        one corpus typically share a shape, so a whole batch costs one
        device dispatch instead of one per image (the per-image RPC is the
        embed-pipeline hot spot on remote-attached accelerators).

        host_resize=True performs the smart_resize on host (PIL bicubic —
        the reference image processor's own resampler) BEFORE upload, so
        only the resized pixels cross the host->device link. A 150 dpi page
        is ~6.3 MB raw uint8 but ~1.5 MB at the 768-token budget: on
        bandwidth-limited links (the axon tunnel measures ~77 MB/s,
        perf/embed_decompose.py) the upload is the pipeline's largest stage
        and this cuts it ~4x. The device resize is skipped (shape match)."""
        if host_resize:
            from colpali_tpu.processors.image_processing import host_resize_rgb

            # resize FIRST on the native PIL image, convert to RGB at
            # TARGET size (~13x fewer pixels than converting the full page
            # first — measured 40 -> ~12 ms/page on the 1-core host, and
            # reducing_gap halves the bicubic again; perf/train_bench --e2e)
            resized_arrays = []
            for im in images:
                if hasattr(im, "convert"):  # PIL: .size is (w, h)
                    h0, w0 = im.size[1], im.size[0]
                else:  # numpy (its .size is an int)
                    h0, w0 = np.asarray(im).shape[:2]
                h1, w1 = smart_resize(
                    h0, w0, self.patch_size * self.merge_size,
                    self.min_pixels, self.max_pixels,
                )
                resized_arrays.append(
                    host_resize_rgb(im, (h1, w1), reducing_gap=self.reducing_gap)
                )
            arrays = resized_arrays
        else:
            arrays = [to_rgb_array(im) for im in images]
        targets = [
            smart_resize(
                a.shape[0], a.shape[1], self.patch_size * self.merge_size, self.min_pixels, self.max_pixels
            )
            for a in arrays
        ]
        groups: dict = {}
        for i, (a, t) in enumerate(zip(arrays, targets)):
            groups.setdefault((a.shape[:2], t), []).append(i)
        return arrays, groups

    def _preprocess_many(self, images: Sequence[Any]) -> Tuple[List[np.ndarray], List[Tuple[int, int, int]]]:
        """Batched host preprocessing (one device resize per shape group,
        normalized images fetched back for host patchify)."""
        from colpali_tpu.processors.image_processing import _resize_normalize

        arrays, groups = self._group_by_shape(images)
        mean_j = jnp.asarray(self.image_mean)
        std_j = jnp.asarray(self.image_std)
        normed: List[Optional[np.ndarray]] = [None] * len(arrays)
        for ((_, (h1, w1)), idxs) in groups.items():
            batch = jnp.asarray(np.stack([arrays[i] for i in idxs]))
            out = np.asarray(_resize_normalize(batch, mean_j, std_j, h1, w1))
            for j, i in enumerate(idxs):
                normed[i] = out[j]

        flats, grids = [], []
        for norm in normed:
            flat, grid = patchify(
                norm.transpose(2, 0, 1), self.patch_size, self.temporal_patch_size, self.merge_size
            )
            flats.append(flat)
            grids.append(grid)
        return flats, grids

    def _preprocess_many_device(
        self, images: Sequence[Any], host_resize: bool = False
    ) -> Tuple[jnp.ndarray, List[Tuple[int, int, int]]]:
        """Fully on-device preprocessing: raw uint8 uploads once per shape
        group, resize+normalize+patchify run fused on the accelerator
        (:func:`_resize_patchify_device`), and the padded ``(B, p_max,
        patch_dim)`` pixel batch STAYS on device — no host round trip.
        host_resize=True additionally resizes on host pre-upload (see
        :meth:`_group_by_shape`). Returns (device pixel_values, grids)."""
        arrays, groups = self._group_by_shape(images, host_resize=host_resize)
        mean_j = jnp.asarray(self.image_mean)
        std_j = jnp.asarray(self.image_std)

        grids: List[Optional[Tuple[int, int, int]]] = [None] * len(arrays)
        flat_groups, idx_groups = [], []
        for ((_, (h1, w1)), idxs) in groups.items():
            batch = jnp.asarray(np.stack([arrays[i] for i in idxs]))
            flat = _resize_patchify_device(
                batch, mean_j, std_j, h1, w1,
                self.patch_size, self.temporal_patch_size, self.merge_size,
            )
            grid = (1, h1 // self.patch_size, w1 // self.patch_size)
            for i in idxs:
                grids[i] = grid
            flat_groups.append(flat)
            idx_groups.append(idxs)

        group = self.merge_size**2
        p_max = max(f.shape[1] for f in flat_groups)
        p_max = ((p_max + group - 1) // group) * group
        from colpali_tpu.processors.image_processing import restore_group_order

        padded = [
            jnp.pad(f, ((0, 0), (0, p_max - f.shape[1]), (0, 0))) for f in flat_groups
        ]
        return restore_group_order(padded, idx_groups), grids

    def _tokenize(self, texts: Sequence[str]) -> Batch:
        enc = self.tokenizer(
            list(texts),
            padding="longest",
            padding_side="left",  # reference forces left padding (:43)
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
        """device_pixels=True keeps ``pixel_values`` as a DEVICE array from
        the fused resize+normalize+patchify kernel — the serving/embedding
        path (no normalized-image download, which runs at MB/s on
        remote-attached accelerators). Host numpy otherwise. host_resize=True
        (with device_pixels) resizes on host pre-upload so only target-size
        pixels cross the link — the right trade on bandwidth-limited
        host->device links (see _group_by_shape)."""
        prompts = list(context_prompts) if context_prompts else [self.visual_prompt_prefix] * len(images)
        if device_pixels:
            device_pixel_values, grids = self._preprocess_many_device(images, host_resize=host_resize)
            flats = None
        else:
            flats, grids = self._preprocess_many(images)

        # expand <|image_pad|> to the merged token count per image
        texts = []
        for prompt, (t, h, w) in zip(prompts, grids):
            n_merged = t * (h // self.merge_size) * (w // self.merge_size)
            texts.append(prompt.replace(self.image_token, self.image_token * n_merged))
        batch = self._tokenize(texts)

        # pad per-image patch sequences to a common length (multiple of
        # merge^2 so merged groups stay aligned)
        group = self.merge_size**2
        b = len(grids)
        if device_pixels:
            p_max = device_pixel_values.shape[1]
        else:
            p_max = max(f.shape[0] for f in flats)
            p_max = ((p_max + group - 1) // group) * group
        patch_mask = np.zeros((b, p_max), bool)
        hpos = np.zeros((b, p_max), np.int32)
        wpos = np.zeros((b, p_max), np.int32)
        if not device_pixels:
            patch_dim = flats[0].shape[1]
            pixel_values = np.zeros((b, p_max, patch_dim), np.float32)
        for i, grid in enumerate(grids):
            t, h, w = grid
            n = t * h * w
            if not device_pixels:
                pixel_values[i, :n] = flats[i]
            patch_mask[i, :n] = True
            hp, wp = vision_positions(grid, self.merge_size)
            hpos[i, :n] = hp
            wpos[i, :n] = wp

        batch["pixel_values"] = device_pixel_values if device_pixels else pixel_values
        batch["patch_mask"] = patch_mask
        batch["vision_hpos"] = hpos
        batch["vision_wpos"] = wpos
        batch["image_grid_thw"] = np.asarray(grids, np.int64)
        batch["position_ids"] = get_rope_index(
            batch["input_ids"],
            batch["attention_mask"],
            batch["image_grid_thw"],
            self.image_token_id,
            self.vision_start_token_id,
            self.merge_size,
        )
        return batch

    def process_texts(self, texts: Sequence[str]) -> Batch:
        batch = self._tokenize(texts)
        batch["position_ids"] = get_rope_index(
            batch["input_ids"], batch["attention_mask"], None, self.image_token_id, self.vision_start_token_id
        )
        return batch

    def get_n_patches(self, image_size: Tuple[int, int], spatial_merge_size: Optional[int] = None) -> Tuple[int, int]:
        """Merged-token grid (processing_colqwen2.py:127-152).

        NOTE: the reference passes ``image_size[0]`` as *width* and
        ``image_size[1]`` as *height* (processing_colqwen2.py:141-147),
        despite the base-class docstring saying (height, width); we reproduce
        that behavior exactly.
        """
        merge = spatial_merge_size or self.merge_size
        width, height = image_size[0], image_size[1]
        h_new, w_new = smart_resize(
            height, width, self.patch_size * self.merge_size, self.min_pixels, self.max_pixels
        )
        return w_new // self.patch_size // merge, h_new // self.patch_size // merge

    def get_image_mask(self, batch: Batch) -> np.ndarray:
        return batch["input_ids"] == self.image_token_id
