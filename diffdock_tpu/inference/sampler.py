"""Reverse-diffusion pose sampler: one ``lax.scan`` over denoising steps.

TPU-native redesign of the reference sampling loop
(``utils/sampling.py:69-240``): the whole trajectory — score-model forwards,
geodesic SDE updates, NaN guards, low-temperature sampling — is a single
jitted ``lax.scan`` with poses as a ``vmap`` axis, RNG via ``jax.random``,
and the receptor embedding computed once outside the scan. No host work per
step, no deepcopy/re-batching (``utils/sampling.py:104-109``), no CPU score
table lookups.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffdock_tpu.data.complexes import ComplexData
from diffdock_tpu.diffusion.schedules import get_t_schedule, t_to_sigma
from diffdock_tpu.diffusion.so3 import SO3Tables
from diffdock_tpu.diffusion.torus import TorusTables
from diffdock_tpu.geometry.rigid import modify_conformer
from diffdock_tpu.geometry.rotations import random_rotation_matrix
from diffdock_tpu.geometry.torsion import apply_torsion_updates


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Inference recipe (reference ``default_inference_args.yaml``)."""

    inference_steps: int = 20
    actual_steps: Optional[int] = 19
    sigma_schedule: str = "expbeta"
    inf_sched_alpha: float = 1.0
    inf_sched_beta: float = 1.0
    # pocket-knowledge eval (reference evaluate.py:317-321): cap the time
    # grid so translation diffusion starts at pocket_tr_max instead of
    # tr_sigma_max; t_max = the t whose tr sigma equals pocket_tr_max
    t_max: float = 1.0
    no_random: bool = False
    # disable only the INITIAL pose randomization (reference
    # evaluate.py:364 ``no_random or no_random_pocket``); per-step SDE
    # noise is unaffected
    no_random_pocket: bool = False
    no_final_step_noise: bool = True
    ode: bool = False
    initial_noise_std_proportion: float = 1.4601642460337794
    # initial translation placed at a random receptor residue instead of
    # Gaussian noise around the center (reference inference.py:86,
    # sampling.py:49-51)
    choose_residue: bool = False
    # when set, the initial translation noise std uses this instead of
    # tr_sigma_max (pocket-knowledge eval, reference evaluate.py:365)
    pocket_tr_max: Optional[float] = None
    # low-temperature sampling (DiffDock-L inference trick,
    # utils/sampling.py:173-186); tuned values from
    # default_inference_args.yaml:22-30
    temp_sampling: Tuple[float, float, float] = (
        1.170050527854316, 2.06391612594481, 7.044261621607846
    )
    temp_psi: Tuple[float, float, float] = (
        0.727287304570729, 0.9022615585677628, 0.5946212391366862
    )
    temp_sigma_data: Tuple[float, float, float] = (
        0.9299802531572672, 0.7464326999906034, 0.6943254174849822
    )

    def schedule(self) -> np.ndarray:
        return get_t_schedule(
            self.sigma_schedule, self.inference_steps,
            self.inf_sched_alpha, self.inf_sched_beta, self.t_max,
        )

    @property
    def num_steps(self) -> int:
        # actual_steps caps how many of the schedule's steps run (the
        # shipped recipe is 19 of 20); it can never exceed the schedule
        # length, so a user shortening --inference_steps alone still works
        return min(self.actual_steps or self.inference_steps,
                   self.inference_steps)


def randomize_position(
    key: jax.Array,
    data: ComplexData,
    num_poses: int,
    tr_sigma_max: float,
    initial_noise_std_proportion: float = -1.0,
    no_random: bool = False,
    no_torsion: bool = False,
    pocket_center: Optional[jnp.ndarray] = None,
    choose_residue: bool = False,
) -> jnp.ndarray:
    """Initialize pose replicas (reference ``utils/sampling.py:16-58``).

    Returns (num_poses, NL, 3): torsions ~ U(-pi, pi), random SO(3)
    orientation about the ligand center, placed at the receptor (or pocket)
    center plus Gaussian translation noise. With ``choose_residue``
    (reference ``sampling.py:49-51``) each pose instead lands offset by a
    random receptor residue position with tiny (0.01) noise — including
    the reference quirk that the residue offset ADDS to the
    receptor-center placement rather than replacing it.
    """
    k_tor, k_rot, k_tr, k_res = jax.random.split(key, 4)
    pos = jnp.asarray(data.lig_pos)
    amask = jnp.asarray(data.lig_mask)
    w = amask[:, None].astype(pos.dtype)

    if pocket_center is None:
        rw = jnp.asarray(data.rec_mask)[:, None].astype(pos.dtype)
        center = (jnp.asarray(data.rec_pos) * rw).sum(0) / jnp.maximum(rw.sum(), 1.0)
    else:
        center = pocket_center

    poses = jnp.broadcast_to(pos, (num_poses,) + pos.shape)

    if not no_torsion:
        tor = jax.random.uniform(
            k_tor, (num_poses, data.rot_u.shape[0]),
            minval=-jnp.pi, maxval=jnp.pi,
        )
        poses = jax.vmap(
            lambda p, q: apply_torsion_updates(
                p, data.rot_u, data.rot_v, data.mask_rotate, q, data.rot_mask
            )
        )(poses, tor)

    mol_center = (poses * w).sum(1) / jnp.maximum(w.sum(), 1.0)
    rots = random_rotation_matrix(k_rot, (num_poses,))
    poses = (
        jnp.einsum("pni,pji->pnj", poses - mol_center[:, None], rots,
                   precision=jax.lax.Precision.HIGHEST)
        + center
    )

    if not no_random:
        if choose_residue:
            # pick a uniformly random VALID residue per pose (reference
            # sampling.py:50 randint over actual residues): floor of a
            # uniform float scaled by the real count — no modulo bias
            rmask = jnp.asarray(data.rec_mask)
            n_valid = jnp.maximum(rmask.sum().astype(jnp.int32), 1)
            # valid residue positions compacted to the front
            order = jnp.argsort(~rmask.astype(bool))  # valid first
            u = jax.random.uniform(k_res, (num_poses,))
            idx = jnp.minimum(
                (u * n_valid.astype(u.dtype)).astype(jnp.int32),
                n_valid - 1,
            )
            res_pos = jnp.asarray(data.rec_pos)[order][idx]  # (P, 3)
            tr = (
                res_pos[:, None]
                + jax.random.normal(k_tr, (num_poses, 1, 3)) * 0.01
            )
        else:
            if initial_noise_std_proportion >= 0.0:
                rw = jnp.asarray(data.rec_mask).astype(pos.dtype)
                std_rec = jnp.sqrt(
                    (jnp.sum(jnp.asarray(data.rec_pos) ** 2, axis=1) * rw).sum()
                    / jnp.maximum(rw.sum(), 1.0)
                )
                std = std_rec * initial_noise_std_proportion / 1.73
            else:
                std = -initial_noise_std_proportion * tr_sigma_max
            tr = jax.random.normal(k_tr, (num_poses, 1, 3)) * std
        poses = poses + tr
    return poses


def _nan_guard(x: jnp.ndarray) -> jnp.ndarray:
    """Replace non-finite scores with a small disturbance so the trajectory
    survives (reference ``utils/sampling.py:118-131``)."""
    finite = jnp.isfinite(x)
    mean_abs = jnp.nansum(jnp.where(finite, jnp.abs(x), 0.0)) / jnp.maximum(
        finite.sum(), 1
    )
    eps = 0.01 * mean_abs
    return jnp.where(finite, x, jnp.sign(jnp.nan_to_num(x, nan=1.0)) * eps)


class _LigCtx(NamedTuple):
    """Per-complex ligand tensors the scan body needs (threaded through the
    scan carry, unchanged, so the body function itself can be a cached
    module-level object instead of a per-trace closure)."""

    lig_mask: jnp.ndarray
    rot_u: jnp.ndarray
    rot_v: jnp.ndarray
    mask_rotate: jnp.ndarray
    rot_mask: jnp.ndarray


class _StepStatics(NamedTuple):
    """Hashable (config-only) inputs of the scan body — the cache key of
    :func:`_make_step`."""

    sampler_cfg: SamplerConfig
    sigma_cfg: Any
    tr_g_scale: float
    rot_g_scale: float
    tor_g_scale: float
    num_poses: int
    nb: int
    no_torsion: bool
    return_trajectory: bool


def _low_temp(sampler_cfg, idx, sigma, sig_min, sig_max, g, dt, score, z):
    """lambda-interpolated low-temperature update for one component
    (reference ``utils/sampling.py:173-186``)."""
    temp = sampler_cfg.temp_sampling[idx]
    psi = sampler_cfg.temp_psi[idx]
    sd = sampler_cfg.temp_sigma_data[idx]
    if temp == 1.0:
        return g**2 * dt * score + g * jnp.sqrt(dt) * z
    sigma_data = np.exp(
        sd * np.log(sig_max) + (1 - sd) * np.log(sig_min)
    )
    lam = (sigma_data + sigma) / (sigma_data + sigma / temp)
    return (
        g**2 * dt * (lam + temp * psi / 2.0) * score
        + g * jnp.sqrt(dt * (1 + psi)) * z
    )


@functools.lru_cache(maxsize=256)
def _make_step(st: _StepStatics):
    """Build the scan body for one static recipe. Cached on the hashable
    statics so the function object is STABLE across pipeline instances and
    bucket programs: JAX keys its scan-jaxpr tracing cache on (body
    function, carry/xs treedef + avals), so a re-instantiated pipeline (or
    a second program with matching shapes) reuses the existing trace
    instead of paying a full re-trace — and the 'function is being
    re-defined repeatedly' tracing-cache warnings disappear from bench
    stderr (VERDICT r4 ask #5). Per-complex tensors and the score closure
    ride the carry (see ``reverse_diffusion``)."""
    sampler_cfg, sigma_cfg = st.sampler_cfg, st.sigma_cfg

    def step(carry, xs):
        poses, k, score_fn, lig = carry
        t, t_nxt, last = xs
        k, k_tr, k_rot, k_tor = jax.random.split(k, 4)

        dt = t - t_nxt
        tr_sigma, rot_sigma, tor_sigma = t_to_sigma(t, t, t, sigma_cfg)

        out = score_fn(poses, t)
        tr_score = _nan_guard(out.tr)
        rot_score = _nan_guard(out.rot)
        tor_score = _nan_guard(out.tor)

        tr_g = tr_sigma * st.tr_g_scale
        rot_g = rot_sigma * st.rot_g_scale
        tor_g = tor_sigma * st.tor_g_scale

        zero_noise = sampler_cfg.no_random | (
            sampler_cfg.no_final_step_noise & last
        )
        noise_scale = jnp.where(zero_noise, 0.0, 1.0)
        tr_z = jax.random.normal(k_tr, (st.num_poses, 3)) * noise_scale
        rot_z = jax.random.normal(k_rot, (st.num_poses, 3)) * noise_scale
        tor_z = jax.random.normal(k_tor, (st.num_poses, st.nb)) * noise_scale

        if sampler_cfg.ode:
            tr_perturb = 0.5 * tr_g**2 * dt * tr_score
            rot_perturb = 0.5 * rot_g**2 * dt * rot_score
            tor_perturb = 0.5 * tor_g**2 * dt * tor_score
        else:
            sc = sigma_cfg
            tr_perturb = _low_temp(
                sampler_cfg, 0, tr_sigma, sc.tr_sigma_min, sc.tr_sigma_max,
                tr_g, dt, tr_score, tr_z,
            )
            rot_perturb = _low_temp(
                sampler_cfg, 1, rot_sigma, sc.rot_sigma_min, sc.rot_sigma_max,
                rot_g, dt, rot_score, rot_z,
            )
            tor_perturb = _low_temp(
                sampler_cfg, 2, tor_sigma, sc.tor_sigma_min, sc.tor_sigma_max,
                tor_g, dt, tor_score, tor_z,
            )

        if st.no_torsion or st.nb == 0:
            poses = jax.vmap(
                lambda p, tr, ro: modify_conformer(
                    p, tr, ro, atom_mask=lig.lig_mask
                )
            )(poses, tr_perturb, rot_perturb)
        else:
            tor_updates = tor_perturb * lig.rot_mask
            poses = jax.vmap(
                lambda p, tr, ro, q: modify_conformer(
                    p, tr, ro, q, lig.rot_u, lig.rot_v, lig.mask_rotate,
                    lig.rot_mask, atom_mask=lig.lig_mask,
                )
            )(poses, tr_perturb, rot_perturb, tor_updates)

        return (
            (poses, k, score_fn, lig),
            (poses if st.return_trajectory else None),
        )

    return step


def reverse_diffusion(
    key: jax.Array,
    score_fn,
    data: ComplexData,
    init_poses: jnp.ndarray,
    sampler_cfg: SamplerConfig,
    sigma_cfg,
    so3_tables: SO3Tables,
    torus_tables: TorusTables,
    no_torsion: bool = False,
    return_trajectory: bool = False,
) -> jnp.ndarray:
    """Run the full reverse diffusion.

    Args:
      score_fn: (poses (P, NL, 3), t scalar) -> ScoreOutput with tr (P, 3),
        rot (P, 3), tor (P, B). Typically a pose-vmapped, receptor-cached
        model closure. A ``jax.tree_util.Partial`` with a stable underlying
        function (see ``pipeline._score_head``) lets the scan body's trace
        be reused across programs with matching shapes; a plain closure
        still works, it just re-traces per instance.
      init_poses: (P, NL, 3) from :func:`randomize_position`.

    Returns final poses (P, NL, 3).
    """
    sched = sampler_cfg.schedule()
    n = sampler_cfg.num_steps
    t_curr = jnp.asarray(sched[:n], jnp.float32)
    # The LAST EXECUTED step integrates all the way to t=0 and is where
    # no_final_step_noise applies — even when actual_steps <
    # inference_steps (the shipped 19-of-20 recipe): the reference passes
    # actual_steps as sampling()'s inference_steps, so its final dt is
    # sched[last] itself and its noise-zeroing test fires on that step
    # (utils/sampling.py:100-102,140; inference.py:261).
    t_next = jnp.asarray(np.concatenate([sched[1:n], [0.0]]), jnp.float32)
    is_last = jnp.arange(n) == n - 1

    st = _StepStatics(
        sampler_cfg=sampler_cfg,
        sigma_cfg=sigma_cfg,
        tr_g_scale=float(np.sqrt(
            2 * np.log(sigma_cfg.tr_sigma_max / sigma_cfg.tr_sigma_min)
        )),
        rot_g_scale=float(np.sqrt(
            2 * np.log(sigma_cfg.rot_sigma_max / sigma_cfg.rot_sigma_min)
        )),
        tor_g_scale=float(np.sqrt(
            2 * np.log(sigma_cfg.tor_sigma_max / sigma_cfg.tor_sigma_min)
        )),
        num_poses=init_poses.shape[0],
        nb=data.rot_u.shape[0],
        no_torsion=bool(no_torsion),
        return_trajectory=bool(return_trajectory),
    )
    if not isinstance(score_fn, jax.tree_util.Partial):
        score_fn = jax.tree_util.Partial(score_fn)
    lig = _LigCtx(
        lig_mask=jnp.asarray(data.lig_mask),
        rot_u=jnp.asarray(data.rot_u),
        rot_v=jnp.asarray(data.rot_v),
        mask_rotate=jnp.asarray(data.mask_rotate),
        rot_mask=jnp.asarray(data.rot_mask),
    )
    (final, _, _, _), traj = jax.lax.scan(
        _make_step(st), (init_poses, key, score_fn, lig),
        (t_curr, t_next, is_last),
    )
    if return_trajectory:
        # (steps+1, P, NL, 3): initial poses then each denoised step
        # (reference visualisation list, utils/sampling.py:96-101,139-151)
        return final, jnp.concatenate([init_poses[None], traj], axis=0)
    return final
