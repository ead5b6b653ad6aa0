"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count) since only one real TPU chip is
available; the driver separately dry-run-compiles the multi-chip path.
"""
import os

os.environ["JAX_PLATFORMS"] = os.environ.get("SVIN_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU PJRT plugin is registered by sitecustomize at interpreter
# startup (which imports jax, so jax.config has already captured
# JAX_PLATFORMS=axon — the env override above is too late for the config
# default). Its (network-tunneled) lazy init costs ~100 s. Tests are
# CPU-only: point the config at the test platform and drop the factory
# before any backend is initialized.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
try:  # pragma: no cover - only present under the axon harness
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:
    pass

# SLAM estimation needs f64 for the normal equations; flag must be set at import.
jax.config.update("jax_enable_x64", True)

# NOTE: do not enable the persistent compilation cache here — this jaxlib's
# cache-read path segfaults on CPU (observed crash in
# compilation_cache.get_executable_and_time). The xdist worker split in
# pytest.ini bounds per-process compile volume instead (the in-process
# XLA/LLVM JIT also segfaults after enough large compilations).
