"""Training orchestrator: the ColModelTraining equivalent.

Behavioral spec: /root/reference/colpali_engine/trainer/colmodel_training.py
(config dataclass + train/save wrapper) and the raw torch loop
colmodel_torch_training.py:68-247 (per-step logging every 10 steps, eval
hook, end-of-training save). The inner loop here is the jitted GSPMD train
step from :mod:`colpali_tpu.training.trainer` with Orbax checkpointing and
resume.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from colpali_tpu.data.collator import VisualRetrieverCollator
from colpali_tpu.data.sampler import SingleDatasetBatchSampler
from colpali_tpu.training.checkpointing import CheckpointManager, save_pretrained
from colpali_tpu.training.trainer import (
    TrainConfig,
    create_train_state,
    make_eval_step,
    make_peft_eval_step,
    make_peft_train_step,
    make_train_step,
    shard_peft_train_step,
    shard_train_step,
)
from colpali_tpu.utils.reporting import MetricsLogger


@dataclasses.dataclass
class ColModelTrainingConfig:
    """Mirrors the reference's ColModelTrainingConfig surface
    (colmodel_training.py:21-71), with jax-native members."""

    model: Any  # flax nn.Module (ColPali / ColQwen2 / ...)
    loss_func: Any
    train_datasets: list
    params: Optional[Dict[str, Any]] = None  # None -> random init from first batch
    processor: Any = None
    eval_dataset: Optional[Any] = None
    output_dir: str = "./models/run"
    global_batch_size: int = 8
    num_epochs: int = 1
    max_steps: Optional[int] = None
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    mesh: Optional[Any] = None  # jax.sharding.Mesh for DP/TP
    save_steps: int = 500
    save_total_limit: int = 1
    log_steps: int = 10
    eval_steps: Optional[int] = None  # None -> eval at each epoch end only
    eval_batch_size: Optional[int] = None  # defaults to global_batch_size
    report_to: Any = "jsonl"  # "jsonl" | "wandb" | ["jsonl", "wandb"] | "none"
    resume_from_checkpoint: bool = False
    # LoRA recipe (the reference's ``peft_config``, colmodel_training.py:21-71
    # + scripts/configs/**): a training.LoraSpec — the base stays frozen,
    # only rank-r adapters train, and save() exports the merged weights.
    peft: Optional[Any] = None
    seed: int = 0
    pad_seq_to: Optional[Any] = None  # int or bucket list (see data.collator)
    pad_patches_to: Optional[Any] = None  # visual patch axis buckets (Qwen-VL)
    # jax.checkpoint policy for remat'ed layer stacks (models/layers.
    # REMAT_POLICIES name, e.g. "dots"): save matmul outputs, recompute only
    # elementwise glue — measured 255.0 -> 236.3 ms/step on the ColQwen2-2B
    # LoRA bench (perf/train_bench.py --decompose --remat-policy dots).
    # Applied as a trace-time context around the train loop; models that
    # thread an explicit remat_policy attribute override it.
    remat_policy: Optional[str] = None
    # Device pixel staging in the collator: resize on host (PIL), normalize
    # + patchify on device, pixel_values stays a device array. The host path
    # resizes on device then DOWNLOADS normalized fp32 pixels — measured
    # 1.73 s/batch staging that input-starved a 269 ms step 8.5x over a
    # remote-attached chip (perf/train_bench.py --e2e). Safe here because
    # collation runs on an in-process prefetch thread (data/prefetch.py),
    # never in a worker process. Ignored for processors without the device
    # staging path.
    device_pixels: bool = True
    # QLoRA-style quantized base (LoRA runs only): store the FROZEN vision
    # tower's kernels int8 (ops/quant_dense.quantize_params, vision paths
    # only). No grads flow through the frozen tower and the LoRA merge never
    # touches int8 leaves; measured 234.7 -> 219.3 ms/step (+7% ex/s) on the
    # ColQwen2-2B bench at embedding-cosine 0.99997 quant fidelity
    # (perf/quant_accuracy_probe.py). Opt-in: it changes training numerics.
    quantize_frozen_base: bool = False
    quant_min_dim: int = 512  # kernels below this stay exact (see quant_dense)


class ColModelTraining:
    """Owns collator, sampler, train state, and the step loop
    (reference colmodel_training.py:74-118)."""

    def __init__(self, config: ColModelTrainingConfig):
        self.config = config
        self.collator = VisualRetrieverCollator(
            config.processor,
            pad_seq_to=config.pad_seq_to,
            pad_patches_to=config.pad_patches_to,
            device_pixels=config.device_pixels,
        )
        self.sampler = SingleDatasetBatchSampler(
            config.train_datasets, config.global_batch_size, seed=config.seed
        )
        self._all_data = _ConcatDataset(config.train_datasets)
        self.logger = MetricsLogger(config.output_dir, report_to=config.report_to)

        has_negatives = self._probe_negatives()
        params = config.params if config.params is not None else self._init_params()

        self.base_params = None  # set when a peft (LoRA) recipe is attached
        self.quant_collection = None
        if config.peft is not None:
            from colpali_tpu.training.lora import init_lora_params

            spec = config.peft
            self.base_params = params
            adapters = init_lora_params(
                params, jax.random.PRNGKey(config.seed + 1), rank=spec.rank,
                target_pattern=spec.target_pattern, stddev=spec.init_stddev,
            )
            if config.quantize_frozen_base:
                from colpali_tpu.ops.quant_dense import quantize_params

                # QLoRA-style quantized base: ONLY the frozen (never
                # adapter-targeted) vision tower stores int8 — no gradient
                # flows through it, the merge never touches int8 leaves,
                # and the int8 MXU runs it at 2x bf16 (measured 234.7 ->
                # 219.3 ms/step on the ColQwen2-2B bench). save() exports
                # q*scale — the values training actually computed with.
                self.base_params, self.quant_collection = quantize_params(
                    params,
                    min_dim=config.quant_min_dim,
                    path_filter=lambda p: "visual" in p or "vision" in p,
                )
            self.train_step = make_peft_train_step(
                config.loss_func, spec, has_negatives=has_negatives, seed=config.seed,
                quant=self.quant_collection,
            )
            self.eval_step = (
                jax.jit(make_peft_eval_step(config.loss_func, spec, has_negatives=has_negatives,
                                            quant=self.quant_collection))
                if config.eval_dataset is not None
                else None
            )
            # optimizer state exists ONLY for the rank-r adapters
            self.state = create_train_state(config.model.apply, adapters, config.train)
        else:
            self.train_step = make_train_step(config.loss_func, has_negatives=has_negatives)
            self.eval_step = (
                jax.jit(make_eval_step(config.loss_func, has_negatives=has_negatives))
                if config.eval_dataset is not None
                else None
            )
            self.state = create_train_state(config.model.apply, params, config.train)

        self.batch_sharding = None
        if config.mesh is not None:
            if config.peft is not None:
                self.train_step, self.state, self.batch_sharding, self.base_params = (
                    shard_peft_train_step(
                        self.train_step, self.state, self.base_params, config.mesh
                    )
                )
            else:
                self.train_step, self.state, self.batch_sharding = shard_train_step(
                    self.train_step, self.state, config.mesh
                )
        else:
            self.train_step = jax.jit(self.train_step)
            if self.base_params is not None:
                self.base_params = jax.device_put(self.base_params)

        self.ckpt = CheckpointManager(
            f"{config.output_dir}/checkpoints",
            save_interval_steps=config.save_steps,
            max_to_keep=config.save_total_limit,
        )
        if config.resume_from_checkpoint and self.ckpt.latest_step is not None:
            self.state = self.ckpt.restore(self.state)

    def _probe_negatives(self) -> bool:
        sample = self.config.train_datasets[0][0]
        return sample.get("neg_target") is not None

    def _init_params(self) -> Dict[str, Any]:
        """Random init from the first doc batch's shapes (used when no
        checkpoint params are supplied, e.g. YAML-driven smoke runs)."""
        batch = self.collator([self.config.train_datasets[0][i] for i in range(2)])
        kwargs = {}
        if "doc_pixel_values" in batch:
            kwargs["pixel_values"] = jnp.asarray(batch["doc_pixel_values"])
        variables = self.config.model.init(
            jax.random.PRNGKey(self.config.seed),
            jnp.asarray(batch["doc_input_ids"]),
            jnp.asarray(batch["doc_attention_mask"]),
            **kwargs,
        )
        return variables["params"]

    def _device_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        if self.batch_sharding is not None:
            return jax.device_put(batch, self.batch_sharding)
        return {k: jnp.asarray(v) for k, v in batch.items()}

    def batches(self, epoch: int, skip: int = 0) -> Iterable[Dict[str, np.ndarray]]:
        """Per-epoch batch stream; ``skip`` drops already-consumed batches on
        resume BEFORE collation (the sampler's schedule is deterministic per
        epoch, so skipping replays the exact uninterrupted order)."""
        self.sampler.set_epoch(epoch)
        for n_batch, indices in enumerate(self.sampler):
            if n_batch < skip:
                continue
            yield self.collator([self._all_data[i] for i in indices])

    @property
    def metrics_history(self) -> list:
        return self.logger.history

    def evaluate(self) -> Dict[str, float]:
        """Eval pass over ``config.eval_dataset``: mean loss (the reference's
        prediction_step semantics, contrastive_trainer.py:210-225) plus
        retrieval metrics where query i's gold documents are every eval-corpus
        copy of its pos target (grouped by corpus doc id; each eval pair is
        scored against the whole eval corpus via evaluation.evaluator).

        Efficiency (round-2 weak #6): eval batches are collated once; doc
        embeddings go straight from the eval forward into a device-side
        index build (retrieval.DeviceIndexBuilder — no host repack/upload of
        the corpus per tick); and results are cached by train step, so
        back-to-back evals without an intervening update are free."""
        from colpali_tpu.evaluation.evaluator import evaluate_retrieval_from_index
        from colpali_tpu.retrieval.store import DeviceIndexBuilder

        step_now = int(self.state.step)
        cached = getattr(self, "_eval_cache", None)
        if cached is not None and cached[0] == step_now:
            return cached[1]

        cfg = self.config
        ds = cfg.eval_dataset
        bs = cfg.eval_batch_size or cfg.global_batch_size
        if not hasattr(self, "_eval_batches"):
            # eval data is deterministic (no sampling): collate (tokenize +
            # image preprocessing) once and reuse on every eval tick
            self._eval_batches = [
                self.collator([ds[i] for i in range(start, min(start + bs, len(ds)))])
                for start in range(0, len(ds), bs)
            ]
            # queries sharing a gold doc id must credit EVERY copy of it in
            # the eval corpus (doc row j holds example j's pos target), else
            # nDCG penalizes retrieving an identical duplicate page. Corpus
            # doc ids give the grouping; corpus-less datasets carry raw
            # images, so each row stays its own gold.
            keys = []
            for i in range(len(ds)):
                key = ("__row__", i)
                if getattr(ds, "corpus", None) is not None:
                    t = ds.data[i][ds.pos_target_column_name]
                    # multi-pos examples keep row identity: the collator
                    # embeds a RANDOM member (collator rng.choice), so a
                    # group key from pos[0] could credit a row holding a
                    # different doc. Single-pos ids (incl. numpy ints) group.
                    if isinstance(t, (list, tuple)):
                        t = t[0] if len(t) == 1 else None
                    if isinstance(t, (int, str, np.integer)):
                        key = int(t) if isinstance(t, np.integer) else t
                keys.append(key)
            groups: Dict[Any, list] = {}
            for j, key in enumerate(keys):
                groups.setdefault(key, []).append(j)
            self._eval_relevance = [groups[key] for key in keys]
        extra = (self.base_params,) if self.base_params is not None else ()
        losses, q_embs, doc_outs = [], [], []
        for batch in self._eval_batches:
            loss, q, d = self.eval_step(self.state, self._device_batch(batch), *extra)
            losses.append(float(loss))
            q = np.asarray(q, np.float32)
            q_mask = np.asarray(batch["query_attention_mask"]).astype(bool)
            q_embs.extend(q[i][q_mask[i]] for i in range(q.shape[0]))
            doc_outs.append((d, batch["doc_attention_mask"]))  # stays on device

        doc_tokens = max(int(d.shape[1]) for d, _ in doc_outs)
        builder = DeviceIndexBuilder(
            doc_tokens=doc_tokens, dim=int(doc_outs[0][0].shape[-1]), dtype="bf16"
        )
        for d, mask in doc_outs:
            builder.add(d, mask=jnp.asarray(mask))
        index = builder.build()
        ranked = evaluate_retrieval_from_index(
            index, q_embs, relevance=self._eval_relevance, k_values=(1, 5)
        )
        metrics = {"eval_loss": float(np.mean(losses))}
        metrics.update({f"eval_{k}": v for k, v in ranked.items()})
        self._eval_cache = (step_now, metrics)
        return metrics

    def train(self, on_step: Optional[Callable[[int, Dict], None]] = None) -> Dict[str, Any]:
        if self.config.remat_policy is not None:
            from colpali_tpu.models.layers import remat_policy_ctx

            with remat_policy_ctx(self.config.remat_policy):
                return self._train(on_step)
        return self._train(on_step)

    def _train(self, on_step: Optional[Callable[[int, Dict], None]] = None) -> Dict[str, Any]:
        cfg = self.config
        step = int(self.state.step)
        t_start = time.time()
        samples = 0
        eval_metrics: Dict[str, float] = {}
        from colpali_tpu.data.prefetch import prefetch

        def run_eval() -> None:
            nonlocal eval_metrics
            eval_metrics = self.evaluate()
            self.logger.log({"step": step, **eval_metrics})
            print(f"step {step}: " + " ".join(f"{k}={v:.4f}" for k, v in eval_metrics.items()))

        # resume mid-epoch: map the restored step back to (epoch, batch)
        # and skip consumed batches — the deterministic sampler replays the
        # exact uninterrupted schedule (reference HF Trainer resume skips
        # dataloader batches the same way). Gated on resume_from_checkpoint:
        # a second train() call on a finished state, or a warm-started state,
        # must still run full epochs from the top.
        steps_per_epoch = max(len(self.sampler), 1)
        resuming = cfg.resume_from_checkpoint and step > 0
        start_epoch = (
            min(step // steps_per_epoch, max(cfg.num_epochs - 1, 0)) if resuming else 0
        )
        for epoch in range(start_epoch, cfg.num_epochs):
            resume_skip = (
                max(0, step - epoch * steps_per_epoch)
                if resuming and epoch == start_epoch
                else 0
            )
            # collation (tokenize + image preprocessing) runs one batch ahead
            # on a daemon thread, overlapping the async device step
            extra = (self.base_params,) if self.base_params is not None else ()
            for batch in prefetch(self.batches(epoch, skip=resume_skip), buffer_size=2):
                self.state, metrics = self.train_step(
                    self.state, self._device_batch(batch), *extra
                )
                step += 1
                samples += cfg.global_batch_size
                if step % cfg.log_steps == 0:
                    entry = {"step": step, "loss": float(metrics["loss"]),
                             "grad_norm": float(metrics["grad_norm"])}
                    self.logger.log(entry)
                    print(f"step {step}: loss={entry['loss']:.4f} grad_norm={entry['grad_norm']:.3f}")
                self.ckpt.save(step, self.state)
                if on_step is not None:
                    on_step(step, metrics)
                if self.eval_step is not None and cfg.eval_steps and step % cfg.eval_steps == 0:
                    run_eval()
                if cfg.max_steps is not None and step >= cfg.max_steps:
                    break
            else:
                if self.eval_step is not None and not cfg.eval_steps:
                    run_eval()  # per-epoch eval (reference colmodel_torch_training.py:234-236)
                continue
            break
        self.ckpt.wait()
        runtime = time.time() - t_start
        summary = {
            "train_runtime": runtime,
            "train_samples_per_second": samples / runtime if runtime > 0 else 0.0,
            "final_step": step,
            **eval_metrics,
        }
        print(f"train_runtime: {runtime:.1f}s, samples/sec: {summary['train_samples_per_second']:.2f}")
        self.logger.close()  # flush jsonl handle; finish() a wandb run
        return summary

    def save(self, output_dir: Optional[str] = None) -> None:
        """Final export (reference colmodel_training.py:109-118). With a peft
        recipe the export is the MERGED weights ``W + (alpha/r) A @ B`` — a
        ready-to-serve checkpoint, the equivalent of the reference's
        ``merge_and_unload`` deployment path."""
        out = output_dir or self.config.output_dir
        model = self.config.model
        model_config = getattr(model, "config", None)
        params = self.state.params
        if self.base_params is not None:
            from colpali_tpu.training.lora import merge_lora

            spec = self.config.peft
            base = self.base_params
            if self.quant_collection is not None:
                from colpali_tpu.ops.quant_dense import dequantize_params

                # export q*scale floats — the values the quantized-base run
                # actually trained against, not the pre-quant originals
                base = dequantize_params(base, self.quant_collection)
            params = merge_lora(base, params, alpha=spec.alpha, rank=spec.rank)
        save_pretrained(out, jax.device_get(params), config=model_config, model=model)
        proc = self.config.processor
        if proc is not None and hasattr(proc, "save_pretrained"):
            proc.save_pretrained(out)


class _ConcatDataset:
    """Global-index view over multiple datasets (sampler emits cumulative
    indices, reference sampler.py:66-80)."""

    def __init__(self, datasets):
        self.datasets = datasets
        self.offsets = np.concatenate([[0], np.cumsum([len(d) for d in datasets])])

    def __getitem__(self, idx: int):
        ds = int(np.searchsorted(self.offsets, idx, side="right") - 1)
        return self.datasets[ds][idx - int(self.offsets[ds])]

    def __len__(self):
        return int(self.offsets[-1])
