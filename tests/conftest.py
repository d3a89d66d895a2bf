"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on virtual host devices
(``xla_force_host_platform_device_count``), per the build environment —
real TPU runs happen via bench.py / the driver.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"   # force: the env pre-sets a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the container's sitecustomize registers a TPU PJRT platform and overrides
# the env var via jax.config — force CPU programmatically before any
# backend is initialized
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu"
assert jax.device_count() == 8


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bounded_compile_history():
    """XLA:CPU segfaults in backend_compile after a long in-process
    compile history (flaky, history-dependent — observed at different
    tests as the suite grew; test_mg.py carries the same workaround
    locally). Clearing the jit caches at module boundaries bounds the
    history each module's compiles build on."""
    jax.clear_caches()
    yield
