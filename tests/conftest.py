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
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU compile time dominates the suite on this 1-core image (the model
# programs are large); backend optimization buys nothing for correctness
# tests. -46% measured on the heaviest compiles, assertions unchanged.
if "xla_backend_optimization_level" not in _flags:
    _flags += " --xla_backend_optimization_level=0"
if "xla_llvm_disable_expensive_passes" not in _flags:
    _flags += " --xla_llvm_disable_expensive_passes=true"
os.environ["XLA_FLAGS"] = _flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# NOTE: do not enable the persistent compilation cache here — the axon
# remote-compile service shares it and writes AOT results for a different
# CPU feature set (SIGILL risk + load-error spam).
