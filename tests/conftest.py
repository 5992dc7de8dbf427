"""Test configuration: force a hermetic 8-device CPU mesh.

Mirrors the reference's fast/hermetic CI tier (SURVEY.md §4) but adds what the
reference lacks: multi-device coverage, via XLA's virtual host devices.

NOTE: this host's sitecustomize registers the axon TPU PJRT plugin and
imports jax at interpreter start, so env vars are too late — we must override
via jax.config before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
