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

# NOTE: do not enable the persistent compilation cache here — the axon
# remote-compile service shares it and writes AOT results for a different
# CPU feature set (SIGILL risk + load-error spam).
