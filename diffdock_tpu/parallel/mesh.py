"""Multi-chip scale-out: device meshes, sharded training and inference.

The reference's only parallelism is single-node PyG DataParallel
(``utils/utils.py:278-279``). The TPU-native story:

* **training**: data-parallel over a 'dp' mesh axis — each device takes a
  shard of the complex batch, gradients are ``pmean``-ed over ICI inside the
  step (``shard_map``), parameters stay replicated. Batch-norm statistics
  aggregate over both the in-device batch axis and 'dp', so the math is
  independent of the device count.
* **inference**: pose replicas are embarrassingly parallel — shard the pose
  axis over the mesh, replicate the complex, no collectives needed in the
  hot loop.

All of it is expressed with ``jax.sharding.Mesh`` + ``shard_map``; XLA
inserts the collectives.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diffdock_tpu.train.trainer import DP_AXIS


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = DP_AXIS
) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_train_step(
    train_step: Callable, mesh: Mesh, axis_name: str = DP_AXIS
) -> Callable:
    """Wrap a per-device train step (built with ``dp_axis=axis_name``) into a
    jitted multi-device step.

    The batch's leading axis is sharded over the mesh; state and rng are
    replicated. Returns (state, metrics) with metrics already pmean-ed.
    """
    from jax import shard_map

    sharded = shard_map(
        train_step,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def shard_confidence_train_step(
    train_step: Callable, mesh: Mesh, axis_name: str = DP_AXIS
) -> Callable:
    """Data-parallel wrapper for the confidence train step (built with
    ``dp_axis=axis_name``): the batch tuple (stacked complexes, poses,
    labels) is sharded on its leading axis; params / batch_stats /
    opt_state / rng replicated. Gradients are pmean-ed inside the step."""
    from jax import shard_map

    sharded = shard_map(
        train_step,
        mesh=mesh,
        in_specs=(
            P(), P(), P(),
            (P(axis_name), P(axis_name), P(axis_name)),
            P(),
        ),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def shard_pose_sampler(
    sample_fn: Callable, mesh: Mesh, axis_name: str = DP_AXIS
) -> Callable:
    """Shard a pose-sampling program over the mesh.

    ``sample_fn(key, data, init_poses) -> poses``; the pose axis of
    ``init_poses``/outputs is sharded, ``data`` replicated, and each shard
    folds its mesh index into the rng so shards draw independent noise.
    """
    from jax import shard_map

    def local(key, data, init_poses):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        return sample_fn(key, data, init_poses)

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return jax.jit(sharded)
