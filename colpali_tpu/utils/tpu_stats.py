"""Device utilization reporting: the TPU equivalent of the reference's
pynvml helpers (/root/reference/colpali_engine/utils/gpu_stats.py)."""

from __future__ import annotations

from typing import Any, Dict

import jax


def device_memory_stats(device: Any = None) -> Dict[str, int]:
    """Live/limit HBM bytes for a device (empty dict if the backend doesn't
    expose stats, e.g. CPU)."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats() or {}
    except Exception:
        return {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
    }


def print_device_utilization() -> None:
    """Reference print_gpu_utilization equivalent (gpu_stats.py:5-14)."""
    for device in jax.devices():
        stats = device_memory_stats(device)
        if stats:
            used = stats["bytes_in_use"] / 2**30
            limit = stats["bytes_limit"] / 2**30
            print(f"{device}: HBM used {used:.2f} GiB / {limit:.2f} GiB")
        else:
            print(f"{device}: memory stats unavailable")


def print_summary(result: Dict[str, Any]) -> None:
    """Reference print_summary equivalent (gpu_stats.py:17-24)."""
    if "train_runtime" in result:
        print(f"Time: {result['train_runtime']:.2f}")
    if "train_samples_per_second" in result:
        print(f"Samples/second: {result['train_samples_per_second']:.2f}")
    print_device_utilization()
