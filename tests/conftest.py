"""Test configuration: run on a virtual 8-device CPU mesh.

The ambient environment pins JAX to the real TPU tunnel (JAX_PLATFORMS=axon,
registered by a sitecustomize hook at interpreter start), so eager test ops
would dispatch over the network. Force the CPU platform via jax.config —
which works even after the axon backend is registered — and request 8
virtual host devices for multi-chip sharding tests.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persist compiled executables across test runs (big win for scan-heavy tests).
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".cache", "jax")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
