"""diffdock_tpu — a TPU-native generative molecular docking framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
gcorso/DiffDock (score-based diffusion docking on the product manifold
T(3) x SO(3) x SO(2)^m), built TPU-first:

* static padded complex batches (no dynamic graphs under jit),
* fixed-capacity masked neighbor lists instead of scatter/gather graphs,
* a generic Clebsch-Gordan tensor-product engine over fixed irrep layouts,
* device-resident SO(3)/torus score tables (no host round-trips),
* ``lax.scan`` reverse diffusion, ``vmap`` over poses, ``shard_map`` over
  device meshes for multi-chip scale-out.

Reference behavior citations in docstrings point into the upstream repo
(e.g. ``utils/so3.py:21``) for parity checking only; the implementation is
original and TPU-native.
"""

__version__ = "0.1.0"
