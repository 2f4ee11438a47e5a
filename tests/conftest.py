"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-device collectives are tested without TPUs via XLA's host-platform
device-count flag (SURVEY.md §4: replaces the reference's untestable
multi-GPU paths). The environment may pre-set JAX_PLATFORMS (e.g. the axon
TPU tunnel), so we must override through jax.config, not env vars, and set
XLA_FLAGS before the backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# keep fp32 matmuls exact on CPU for numerics tests
jax.config.update("jax_default_matmul_precision", "highest")
