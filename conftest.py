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


def pytest_configure(config):
    """Build runtime/libmri_io.so when a toolchain exists, so the native-IO
    tests run instead of skipping (the ctypes loader probes the same path).
    Best-effort: environments without g++/make keep the skip behavior."""
    import pathlib
    import shutil
    import subprocess

    rt = pathlib.Path(__file__).resolve().parent / "runtime"
    lib = rt / "libmri_io.so"
    src = rt / "mri_io.cpp"
    if not src.exists() or shutil.which("make") is None:
        return
    if lib.exists() and lib.stat().st_mtime >= src.stat().st_mtime:
        return
    try:
        subprocess.run(["make", "-C", str(rt)], check=False, timeout=300,
                       capture_output=True)
    except Exception:
        pass
