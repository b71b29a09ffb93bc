"""Reverse-diffusion sampler: end-to-end on a synthetic complex (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdock_tpu.data.complexes import synthetic_complex
from diffdock_tpu.diffusion.schedules import SigmaConfig
from diffdock_tpu.diffusion.so3 import SO3Config, get_so3_tables
from diffdock_tpu.diffusion.torus import TorusConfig, get_torus_tables
from diffdock_tpu.inference.sampler import (
    SamplerConfig,
    randomize_position,
    reverse_diffusion,
)
from diffdock_tpu.models.config import ScoreModelConfig
from diffdock_tpu.models.score_model import CGScoreModel

SO3_SMALL = SO3Config(n_eps=64, x_n=256, l_max=512)
TORUS_SMALL = TorusConfig(x_n=256, sigma_n=128, mc_samples=2000)


pytestmark = pytest.mark.slow  # compile-heavy e2e

@pytest.fixture(scope="module")
def setup():
    cfg = ScoreModelConfig(ns=8, nv=2, num_conv_layers=2, num_prot_emb_layers=0)
    model = CGScoreModel(cfg)
    rng = np.random.RandomState(1)
    data = synthetic_complex(rng, n_lig=8, n_rec=16, n_bonds=2)
    data = jax.tree.map(jnp.asarray, data)
    so3 = get_so3_tables(SO3_SMALL)
    torus = get_torus_tables(TORUS_SMALL)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), data, data.lig_pos, jnp.asarray(0.5), so3, torus
    )
    return cfg, model, data, so3, torus, params


def test_randomize_position_statistics(setup):
    cfg, model, data, so3, torus, params = setup
    poses = randomize_position(
        jax.random.PRNGKey(0), data, 64, cfg.sigma.tr_sigma_max,
        initial_noise_std_proportion=-1.0,
    )
    assert poses.shape == (64, data.n_lig, 3)
    # bond lengths preserved by torsion+rigid randomization
    p0 = np.asarray(data.lig_pos)
    for pose in np.asarray(poses)[:4]:
        for i in range(data.n_lig - 1):
            b0 = np.linalg.norm(p0[i] - p0[i + 1])
            b1 = np.linalg.norm(pose[i] - pose[i + 1])
            np.testing.assert_allclose(b0, b1, atol=1e-3)
    # centers spread with std ~ tr_sigma_max * sqrt(3)
    centers = np.asarray(poses).mean(1)
    spread = centers.std(0).mean()
    assert 0.3 * cfg.sigma.tr_sigma_max < spread < 3 * cfg.sigma.tr_sigma_max


def test_reverse_diffusion_runs_and_is_finite(setup):
    cfg, model, data, so3, torus, params = setup
    sampler_cfg = SamplerConfig(inference_steps=4, actual_steps=4)

    cache = model.apply(params, data, method="embed_receptor")

    def score_fn(poses, t):
        return jax.vmap(
            lambda p: model.apply(
                params, data, p, t, so3, torus, rec_cache=cache
            )
        )(poses)

    init = randomize_position(
        jax.random.PRNGKey(1), data, 4, cfg.sigma.tr_sigma_max
    )
    run = jax.jit(
        lambda k, ip: reverse_diffusion(
            k, score_fn, data, ip, sampler_cfg, cfg.sigma, so3, torus
        )
    )
    final = run(jax.random.PRNGKey(2), init)
    assert final.shape == init.shape
    assert np.isfinite(np.asarray(final)).all()
    # poses actually moved
    assert np.abs(np.asarray(final) - np.asarray(init)).max() > 0.1
    # chemistry preserved: bond lengths unchanged through the whole chain
    p0 = np.asarray(data.lig_pos)
    for pose in np.asarray(final):
        for i in range(data.n_lig - 1):
            b0 = np.linalg.norm(p0[i] - p0[i + 1])
            b1 = np.linalg.norm(pose[i] - pose[i + 1])
            np.testing.assert_allclose(b0, b1, atol=5e-3)


def test_sampler_deterministic_given_key(setup):
    cfg, model, data, so3, torus, params = setup
    sampler_cfg = SamplerConfig(inference_steps=2, actual_steps=2)
    cache = model.apply(params, data, method="embed_receptor")

    def score_fn(poses, t):
        return jax.vmap(
            lambda p: model.apply(
                params, data, p, t, so3, torus, rec_cache=cache
            )
        )(poses)

    init = randomize_position(jax.random.PRNGKey(5), data, 2, 5.0)
    a = reverse_diffusion(
        jax.random.PRNGKey(7), score_fn, data, init, sampler_cfg, cfg.sigma,
        so3, torus,
    )
    b = reverse_diffusion(
        jax.random.PRNGKey(7), score_fn, data, init, sampler_cfg, cfg.sigma,
        so3, torus,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_nan_guard_recovers_trajectory(setup):
    """NaN/Inf scores mid-trajectory must not poison the poses (reference
    utils/sampling.py:118-131 epsilon-disturbance guard)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffdock_tpu.inference.sampler import (
        SamplerConfig, _nan_guard, reverse_diffusion,
    )
    from diffdock_tpu.models.score_model import ScoreOutput

    cfg, model, data, so3, torus, params = setup

    # unit: guard replaces non-finite entries with small finite values
    x = jnp.asarray([1.0, jnp.nan, jnp.inf, -jnp.inf, -2.0])
    g = np.asarray(_nan_guard(x))
    assert np.isfinite(g).all()
    np.testing.assert_allclose(g[[0, 4]], [1.0, -2.0])

    # end-to-end: a score_fn emitting NaNs every step still yields finite poses
    P = 2

    def bad_score_fn(poses, t):
        return ScoreOutput(
            tr=jnp.full((P, 3), jnp.nan),
            rot=jnp.full((P, 3), jnp.inf),
            tor=jnp.full((P, data.rot_u.shape[0]), jnp.nan),
        )

    init = jnp.broadcast_to(data.lig_pos, (P,) + data.lig_pos.shape)
    final = reverse_diffusion(
        jax.random.PRNGKey(0), bad_score_fn, data, init,
        SamplerConfig(inference_steps=3, actual_steps=3),
        cfg.sigma, so3, torus,
    )
    assert np.isfinite(np.asarray(final)).all()
