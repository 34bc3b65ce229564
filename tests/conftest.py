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


def stub_reference_deps():
    """Install empty stand-ins for the reference repo's native deps that
    are absent here (rasterio/rpcm/utm/torchvision), so its pure-math
    modules import.  Returns the names actually stubbed so callers can
    remove them at teardown (a leftover stub would make a later
    `pytest.importorskip('utm')` succeed and then AttributeError)."""
    import sys
    import types
    stubbed = []
    for name in ("rasterio", "rpcm", "utm", "torchvision",
                 "torchvision.transforms"):
        if name in sys.modules:
            continue
        try:
            __import__(name)
        except ImportError:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
            stubbed.append(name)
            if "." in name:
                parent, child = name.rsplit(".", 1)
                setattr(sys.modules[parent], child, mod)
    return stubbed


def unstub_reference_deps(stubbed):
    import sys
    for name in stubbed:
        sys.modules.pop(name, None)
