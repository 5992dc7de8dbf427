"""Multi-host (pod-slice) launch: jax.distributed wiring + DCN-aware meshes.

The reference trains multi-node via torch DDP/NCCL under accelerate/SLURM
(colmodel_torch_training.py:32-34; README.md:316-322). The TPU-native
equivalent is: one Python process per host, ``jax.distributed.initialize``
to form the runtime (on Cloud TPU the coordinator/process topology is read
from the TPU metadata — zero arguments), a mesh whose outer axis spans hosts
over DCN and whose inner axes stay on ICI, and per-process batch feeding via
``jax.make_array_from_process_local_data``. The GSPMD train step in
training/trainer.py is unchanged — it was written against the GLOBAL batch,
so multi-host is purely a launch + data-feeding concern.

Launch on a v5e pod slice (one command per host, SLURM/gcloud fan-out):

    # gcloud compute tpus tpu-vm ssh $TPU --worker=all --command="
    python scripts/train_colbert.py config.yaml   # each process runs this
    # " — inside, call initialize_multihost() before any jax op, then
    # make_pod_mesh(model=<TP within host>) and feed shards with
    # process_local_batch(...).

Mesh layout rule (scaling-book recipe): put ``data`` on the outermost axis
so its collectives (loss-gather psums) ride DCN, keep ``model`` innermost so
TP collectives stay on ICI within a host.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Dict[str, int]:
    """Form the multi-process JAX runtime. MUST run before any other jax call
    in the process (backend initialization pins the topology).

    On Cloud TPU all three arguments are discovered from the environment —
    call with no arguments. Off-TPU (CPU/GPU clusters) pass them explicitly,
    mirroring torch's init_process_group(init_method=...) role
    (reference colmodel_torch_training.py:32-34).

    Returns {"process_index", "process_count", "local_device_count",
    "global_device_count"} for logging. Idempotent: a second call is a no-op
    (jax.distributed raises if re-initialized; we swallow exactly that).
    """
    if num_processes is None or num_processes > 1 or coordinator_address is not None:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError as exc:  # already initialized (idempotent re-entry)
            # jax's re-init message is "distributed.initialize should only be
            # called once"; older versions said "already initialized"
            msg = str(exc).lower()
            if "only be called once" not in msg and "already initialized" not in msg:
                raise
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }


def make_pod_mesh(
    model: int = 1,
    data: Optional[int] = None,
    allow_split_physical_axes: bool = False,
) -> Mesh:
    """(data, model) mesh spanning every process's devices, laid out so the
    ``data`` axis crosses DCN (host boundary) and ``model`` stays on ICI.

    ``model`` must divide the per-host device count — tensor-parallel
    collectives are latency-bound and must not cross DCN. ``data`` defaults
    to every remaining device (DP over hosts x leftover ICI).
    """
    total = jax.device_count()
    local = jax.local_device_count()
    if model > local:
        raise ValueError(
            f"model={model} exceeds the {local} devices of one host; TP must stay on ICI"
        )
    if local % model != 0:
        raise ValueError(f"model={model} must divide the per-host device count ({local})")
    data = data if data is not None else total // model
    if jax.process_count() > 1:
        if data * model != total:
            # a pod mesh must cover every process's devices — a partial mesh
            # would leave hosts idle inside collectives
            raise ValueError(f"mesh {data}x{model} != {total} devices")
    elif data * model > total:
        raise ValueError(f"mesh {data}x{model} > {total} devices")

    if jax.process_count() > 1:
        from jax.experimental import mesh_utils

        # hybrid mesh: inner (ICI) axes per host, outer (DCN) axis over hosts
        per_host_data = local // model
        # process_is_granule: the DCN boundary in this design IS the host
        # (process) boundary — without it mesh_utils groups by slice_index,
        # which is absent/1 on CPU fleets and multi-host single-slice pods
        # (caught by tests/training/test_multiprocess.py, a REAL 2-process
        # run: "Number of slices 1 must equal ... dcn_mesh_shape (2, 1)")
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(per_host_data, model),
            dcn_mesh_shape=(jax.process_count(), 1),
            process_is_granule=True,
            allow_split_physical_axes=allow_split_physical_axes,
        )
        devices = devices.reshape(data, model)
    else:
        devices = np.array(jax.devices()[: data * model]).reshape(data, model)
    return Mesh(devices, ("data", "model"))


def process_local_batch(
    global_batch: Dict[str, np.ndarray],
    mesh: Mesh,
    axis: str = "data",
    batch_dims: Optional[Dict[str, int]] = None,
) -> Dict[str, jax.Array]:
    """Assemble a globally-sharded batch from per-process host data.

    Each process passes only ITS slice of the global batch (its data-loader
    shard); ``jax.make_array_from_process_local_data`` places it on the local
    devices and stitches the global jax.Array — the multi-host replacement
    for ``jax.device_put(batch, batch_sharding)``. Single-process it
    degenerates to exactly that.

    The batch dimension is axis 0 for every key except ``position_ids``,
    whose M-RoPE layout is ``(3, B, S)`` (processors/qwen2_vl.py) — sharding
    the wrong dim would let make_array_from_process_local_data scale IT by
    the process count and silently corrupt the global shape. Override or
    extend with ``batch_dims={key: dim}``.
    """
    dims = {"position_ids": 1, **(batch_dims or {})}

    def put(k, v):
        d = dims.get(k, 0)
        spec = P(*([None] * d), axis)
        return jax.make_array_from_process_local_data(NamedSharding(mesh, spec), np.asarray(v))

    return {k: put(k, v) for k, v in global_batch.items()}


def shard_dataset_indices(n: int, seed: int = 0) -> np.ndarray:
    """Deterministic per-process partition of dataset indices — the
    DistributedSampler role (each process feeds a disjoint shard; pair with
    process_local_batch). Same seed on every host yields aligned epochs.

    Every process gets EXACTLY the same number of indices (wrap-around
    padding, torch DistributedSampler semantics): the train step is a
    multi-process collective, so a host with one extra batch would enter a
    step its peers never join and deadlock the epoch tail."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    count = jax.process_count()
    per_proc = -(-n // count)  # ceil
    # np.resize repeats cyclically, so even n < process_count pads to the
    # full per_proc*count length (a single wrap slice would fall short and
    # leave some processes with fewer — or zero — indices)
    padded = np.resize(perm, per_proc * count)
    return padded[jax.process_index() :: count]
