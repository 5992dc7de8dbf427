"""Test configuration: force a hermetic 8-device CPU mesh.

Mirrors the reference's fast/hermetic CI tier (SURVEY.md §4) but adds what the
reference lacks: multi-device coverage, via XLA's virtual host devices. Must
run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
