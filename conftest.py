"""Root conftest: force tests onto a virtual 8-device CPU mesh.

The container's sitecustomize registers the 'axon' TPU plugin and forces
``jax_platforms=axon,cpu`` programmatically, so an env var alone is not
enough — we must override at the config level before any backend initializes.
The benchmark (bench.py) intentionally does NOT use this path and runs on the
real TPU backend.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
