"""Test configuration: run JAX on a simulated 8-device CPU mesh so the
distributed (shard_map) paths are exercised without TPU hardware
(SURVEY.md §4 "Multi-node without a real cluster").

Note: this environment's sitecustomize imports jax at interpreter startup and
registers the experimental single-TPU "axon" backend, so JAX has already
snapshotted JAX_PLATFORMS=axon by the time conftest runs — plain env-var
edits are too late. jax.config.update works until the first backend
initialization, which is what we use here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    # read by the CPU PJRT client at creation time — env edit still works here
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# double precision available in tests (solver accuracy studies)
jax.config.update("jax_enable_x64", True)
