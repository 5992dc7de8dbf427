"""Worker for the REAL multi-process jax.distributed test.

Launched as ``python multiprocess_worker.py <pid> <nprocs> <port> <out>`` by
``test_multiprocess.py`` — each process owns 4 virtual CPU devices, joins a
local coordinator, and runs ONE sharded contrastive train step over a
(data=4, model=2) pod mesh spanning both processes. Process 0 writes the
replicated global loss to ``<out>``.

This exercises what the single-process suite cannot: the actual
``jax.distributed.initialize`` handshake, cross-process GSPMD compilation,
and ``make_array_from_process_local_data`` stitching two hosts' disjoint
batch shards into one global batch (the NCCL process-group role, reference
colmodel_torch_training.py:32-34).
"""

import os
import sys

if __name__ == "__main__":
    # only when run AS the worker: test_multiprocess.py also imports this
    # module for its single-process baseline, where the suite's own 8-device
    # flags must stay untouched (a second ...device_count flag wins and
    # silently shrinks the pytest process to 4 devices)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    ).strip()

import jax  # noqa: E402

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def tiny_setup():
    import jax.numpy as jnp

    from colpali_tpu.models.configs import GemmaConfig, PaliGemmaConfig, SiglipVisionConfig
    from colpali_tpu.models.paligemma import ColPali

    image_token = 2
    cfg = PaliGemmaConfig(
        vision=SiglipVisionConfig(
            hidden_size=16, intermediate_size=32, num_hidden_layers=1,
            num_attention_heads=2, image_size=28, patch_size=14,
        ),
        text=GemmaConfig(
            vocab_size=32, hidden_size=16, intermediate_size=32, num_hidden_layers=1,
            num_attention_heads=2, num_key_value_heads=1, head_dim=8,
        ),
        projection_dim=16,
        image_token_index=image_token,
    )
    model = ColPali(cfg, dim=8)

    rng = np.random.default_rng(0)
    b, s_q, s_d = 8, 8, 9
    global_batch = {
        "query_input_ids": rng.integers(3, 30, size=(b, s_q)).astype(np.int32),
        "query_attention_mask": np.ones((b, s_q), np.int32),
        "doc_input_ids": np.concatenate(
            [np.full((b, 4), image_token), rng.integers(3, 30, size=(b, s_d - 4))], axis=1
        ).astype(np.int32),
        "doc_attention_mask": np.ones((b, s_d), np.int32),
        "doc_pixel_values": rng.normal(size=(b, 28, 28, 3)).astype(np.float32),
    }
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(global_batch["doc_input_ids"]),
        jnp.asarray(global_batch["doc_attention_mask"]),
        jnp.asarray(global_batch["doc_pixel_values"]),
    )["params"]
    return model, params, global_batch


def run_step(global_batch, model, params, mesh, local_rows):
    from colpali_tpu.losses import ColbertLoss
    from colpali_tpu.parallel.multihost import process_local_batch
    from colpali_tpu.training.trainer import (
        TrainConfig,
        create_train_state,
        make_train_step,
        shard_train_step,
    )

    state = create_train_state(
        model.apply, params, TrainConfig(learning_rate=1e-3, warmup_steps=0, total_steps=4)
    )
    step = make_train_step(ColbertLoss())
    jitted, sharded_state, _ = shard_train_step(step, state, mesh)
    local = {k: v[local_rows] for k, v in global_batch.items()}
    device_batch = process_local_batch(local, mesh)
    _, metrics = jitted(sharded_state, device_batch)
    return float(metrics["loss"])


def main():
    pid, nprocs, port, out = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    from colpali_tpu.parallel.multihost import initialize_multihost, make_pod_mesh

    info = initialize_multihost(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nprocs, process_id=pid
    )
    assert info["process_count"] == nprocs, info
    assert info["global_device_count"] == nprocs * 4, info

    model, params, global_batch = tiny_setup()
    mesh = make_pod_mesh(model=2)  # (data=4, model=2) over 2 processes x 4 devices
    assert dict(mesh.shape) == {"data": 4, "model": 2}

    # each process feeds ITS disjoint half of the global batch
    rows = slice(pid * 4, (pid + 1) * 4)
    loss = run_step(global_batch, model, params, mesh, rows)
    if pid == 0:
        with open(out, "w") as f:
            f.write(f"{loss!r}\n")


if __name__ == "__main__":
    main()
