"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analogue of the reference validating multi-GPU DDP
only by launching real jobs (SURVEY §4): we simulate an 8-chip slice so
sharding/collective code paths are exercised in CI without hardware.

``jax.config.update`` is used (not env vars) because the environment's
sitecustomize imports jax before pytest starts, freezing env-derived config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses we spawn
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
