"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-device sharding tests (shard-invariance, cf. SURVEY.md section 4 item 8)
run against faked CPU devices; real-TPU execution is exercised by bench.py
and the driver's compile checks.

The XLA flag must be set before JAX initializes its backends. The platform
selection must go through ``jax.config`` because the environment's
sitecustomize re-selects the remote-TPU platform after env vars are read.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
