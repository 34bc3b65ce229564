"""Test env: force CPU backend with 8 virtual devices so sharding tests run
anywhere (the driver validates the real multi-chip path via
__graft_entry__.dryrun_multichip).

The axon sitecustomize registers a TPU-tunnel backend at interpreter startup
and programmatically sets jax_platforms='axon,cpu', which overrides the
JAX_PLATFORMS env var — so we override it back via jax.config before any
backend is initialized (conftest imports run before test modules import
jax for real work).
"""

import os
import re

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# an inherited XLA_FLAGS with a SMALLER device count (another harness, CI
# leakage) would otherwise silently skip every sharding test via their
# device-count skipif marks — jax_num_cpu_devices overrides the flag
m = re.search(r"xla_force_host_platform_device_count=(\d+)",
              os.environ["XLA_FLAGS"])
if m and int(m.group(1)) < 8:
    jax.config.update("jax_num_cpu_devices", 8)
