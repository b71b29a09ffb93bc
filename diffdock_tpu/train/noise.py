"""Forward-diffusion noising for training — fully on device.

The reference's ``NoiseTransform`` (``datasets/pdbbind.py:25-115``) runs in
dataloader workers with numpy/scipy RNG. Here it is a pure jax function
(vmap-able over a batch of complexes, jit-able inside the train step): sample
t, perturb the pose on T(3) x SO(3) x SO(2)^m, and attach the regression
targets

    tr_score  = -tr_update / tr_sigma^2
    rot_score = IGSO3 score at the sampled rotation (so3.score_vec)
    tor_score = wrapped-Gaussian score at the sampled torsions
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from diffdock_tpu.data.complexes import ComplexData
from diffdock_tpu.diffusion.schedules import SigmaConfig, t_to_sigma
from diffdock_tpu.diffusion.so3 import SO3Tables
from diffdock_tpu.diffusion.torus import TorusTables
from diffdock_tpu.geometry.rigid import modify_conformer


class NoisySample(NamedTuple):
    pos: jnp.ndarray  # (NL, 3) perturbed ligand pose
    t: jnp.ndarray  # () diffusion time
    tr_score: jnp.ndarray  # (3,)
    rot_score: jnp.ndarray  # (3,)
    tor_score: jnp.ndarray  # (B,)


def apply_noise(
    key: jax.Array,
    data: ComplexData,
    sigma_cfg: SigmaConfig,
    so3_tables: SO3Tables,
    torus_tables: TorusTables,
    alpha: float = 1.0,
    beta: float = 1.0,
    no_torsion: bool = False,
    t_override=None,
) -> NoisySample:
    """One noisy training sample for one complex."""
    k_t, k_tr, k_rot, k_tor = jax.random.split(key, 4)

    if t_override is None:
        t = jax.random.beta(k_t, alpha, beta)
    else:
        t = jnp.asarray(t_override)
    tr_sigma, rot_sigma, tor_sigma = t_to_sigma(t, t, t, sigma_cfg)

    tr_update = jax.random.normal(k_tr, (3,)) * tr_sigma
    rot_update = so3_tables.sample_vec(k_rot, tr_sigma * 0 + rot_sigma)

    nb = data.rot_u.shape[0]
    if no_torsion or nb == 0:
        tor_updates = jnp.zeros((nb,))
    else:
        tor_updates = torus_tables.sample(
            k_tor, jnp.broadcast_to(tor_sigma, (nb,))
        ) * data.rot_mask

    pos = modify_conformer(
        jnp.asarray(data.lig_pos), tr_update, rot_update,
        None if (no_torsion or nb == 0) else tor_updates,
        data.rot_u, data.rot_v, data.mask_rotate, data.rot_mask,
        atom_mask=data.lig_mask,
    )

    tr_score = -tr_update / tr_sigma**2
    rot_score = so3_tables.score_vec(rot_sigma, rot_update)
    if no_torsion or nb == 0:
        tor_score = jnp.zeros((nb,))
    else:
        tor_score = torus_tables.score(
            tor_updates, jnp.broadcast_to(tor_sigma, (nb,))
        ) * data.rot_mask

    return NoisySample(
        pos=pos, t=t, tr_score=tr_score, rot_score=rot_score, tor_score=tor_score
    )
