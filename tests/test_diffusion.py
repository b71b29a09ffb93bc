"""Diffusion math: schedules and SO(3)/torus tables vs reference formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdock_tpu.diffusion import (
    SigmaConfig,
    get_so3_tables,
    get_t_schedule,
    get_torus_tables,
    sinusoidal_embedding,
    t_to_sigma,
)
from diffdock_tpu.diffusion.so3 import SO3Config, _generate_tables as gen_so3
from diffdock_tpu.diffusion.torus import TorusConfig, _generate_tables as gen_torus

# small grids so tests are fast; the math is grid-size independent
SO3_SMALL = SO3Config(n_eps=64, x_n=256, l_max=512)
TORUS_SMALL = TorusConfig(x_n=256, sigma_n=128, mc_samples=2000)


def test_t_to_sigma_geometric():
    cfg = SigmaConfig()
    tr, rot, tor = t_to_sigma(jnp.array(0.0), jnp.array(0.0), jnp.array(0.0), cfg)
    np.testing.assert_allclose(
        [tr, rot, tor], [cfg.tr_sigma_min, cfg.rot_sigma_min, cfg.tor_sigma_min],
        rtol=1e-6,
    )
    tr, rot, tor = t_to_sigma(jnp.array(1.0), jnp.array(1.0), jnp.array(1.0), cfg)
    np.testing.assert_allclose(
        [tr, rot, tor], [cfg.tr_sigma_max, cfg.rot_sigma_max, cfg.tor_sigma_max],
        rtol=1e-5,
    )
    # geometric midpoint
    tr, _, _ = t_to_sigma(jnp.array(0.5), jnp.array(0.5), jnp.array(0.5), cfg)
    np.testing.assert_allclose(
        tr, np.sqrt(cfg.tr_sigma_min * cfg.tr_sigma_max), rtol=1e-5
    )


def test_t_schedule_linear_for_alpha_beta_1():
    sched = get_t_schedule("expbeta", 20)
    np.testing.assert_allclose(sched, np.linspace(1, 0, 21)[:-1], atol=1e-9)
    assert sched.shape == (20,)


def test_sinusoidal_embedding_matches_reference_formula():
    import math

    t = np.array([0.0, 0.25, 1.0], np.float32)
    dim, scale = 32, 1000.0
    ours = np.asarray(sinusoidal_embedding(jnp.asarray(scale * t), dim))
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    freqs = np.exp(np.arange(half) * -emb)
    arg = (scale * t)[:, None] * freqs[None, :]
    golden = np.concatenate([np.sin(arg), np.cos(arg)], 1)
    # float32 trig of large arguments: tolerance dominated by arg rounding
    np.testing.assert_allclose(ours, golden, atol=2e-3)


class TestSO3:
    def test_pdf_normalizes(self):
        # The truncated series needs L ~ 8.4/eps terms; below that the tables
        # are garbage (true of the reference too: utils/so3.py L=2000 cannot
        # resolve eps=0.0005). Assert normalization on the resolvable range.
        omegas, cdf, _, _ = gen_so3(SO3_SMALL)
        eps_grid = 10 ** np.linspace(
            np.log10(SO3_SMALL.min_eps), np.log10(SO3_SMALL.max_eps),
            SO3_SMALL.n_eps,
        )
        ok = eps_grid >= 10.0 / SO3_SMALL.l_max
        assert ok.sum() > SO3_SMALL.n_eps // 2
        np.testing.assert_allclose(cdf[ok, -1], 1.0, atol=0.05)

    def test_score_norm_small_and_large_eps_limits(self):
        # Small eps: IGSO3 ~ 3D Gaussian, E||score||^2 = 3/eps^2. Compare at
        # the snapped grid eps (lookups round to the nearest log-grid point,
        # reference utils/so3.py:90-93).
        tab = get_so3_tables(SO3_SMALL)
        c = SO3_SMALL
        idx = int(
            np.clip(
                round(
                    (np.log10(0.05) - np.log10(c.min_eps))
                    / (np.log10(c.max_eps) - np.log10(c.min_eps)) * c.n_eps
                ), 0, c.n_eps - 1,
            )
        )
        eps_grid = 10 ** np.linspace(
            np.log10(c.min_eps), np.log10(c.max_eps), c.n_eps
        )
        snapped = eps_grid[idx]
        small = float(tab.score_norm(jnp.array(0.05)))
        # the reference normalizes E[score^2] by an extra 1/pi
        # (utils/so3.py:59); we replicate that bug-for-bug, so the small-eps
        # limit is sqrt(3/pi)/eps rather than sqrt(3)/eps.
        np.testing.assert_allclose(
            small, np.sqrt(3.0 / np.pi) / snapped, rtol=0.05
        )
        large = float(tab.score_norm(jnp.array(3.5)))
        assert large < 1.0

    def test_sample_statistics(self):
        tab = get_so3_tables(SO3_SMALL)
        eps = jnp.full((4000,), 0.5)
        vecs = tab.sample_vec(jax.random.PRNGKey(1), eps)
        om = np.linalg.norm(np.asarray(vecs), axis=-1)
        assert (om <= np.pi + 1e-5).all() and (om > 0).all()
        # compare empirical mean angle to table expectation
        omegas, cdf, _, _ = gen_so3(SO3_SMALL)
        eps_idx = int(
            round(
                (np.log10(0.5) - np.log10(SO3_SMALL.min_eps))
                / (np.log10(SO3_SMALL.max_eps) - np.log10(SO3_SMALL.min_eps))
                * SO3_SMALL.n_eps
            )
        )
        pdf = np.diff(cdf[eps_idx], prepend=0)
        mean_expected = float((omegas * pdf).sum() / pdf.sum())
        np.testing.assert_allclose(om.mean(), mean_expected, rtol=0.05)

    def test_score_vec_direction(self):
        tab = get_so3_tables(SO3_SMALL)
        vec = jnp.array([[0.3, 0.0, 0.0]])
        s = np.asarray(tab.score_vec(jnp.array([0.1]), vec))
        # score must be parallel (or anti-parallel) to vec
        cross = np.cross(s[0], np.asarray(vec)[0])
        np.testing.assert_allclose(cross, 0.0, atol=1e-5)


class TestTorus:
    def test_score_matches_small_sigma_gaussian(self):
        # for sigma << pi, the wrapped Gaussian is just a Gaussian:
        # score(x) = -x / sigma^2
        tab = get_torus_tables(TORUS_SMALL)
        sigma = 0.05
        xs = np.array([0.05, -0.08, 0.12], np.float32)
        s = np.asarray(tab.score(jnp.asarray(xs), jnp.full(3, sigma)))
        np.testing.assert_allclose(s, -xs / sigma**2, rtol=0.08)

    def test_score_norm_small_sigma(self):
        # E[score^2] = 1/sigma^2 for unwrapped Gaussian
        tab = get_torus_tables(TORUS_SMALL)
        sn = float(tab.score_norm(jnp.array(0.05)))
        np.testing.assert_allclose(sn, 1 / 0.05**2, rtol=0.1)

    def test_wrap_terms_truncation_is_exact(self):
        a = gen_torus(TORUS_SMALL)
        b = gen_torus(
            TorusConfig(x_n=256, sigma_n=128, mc_samples=2000, wrap_terms=64)
        )
        np.testing.assert_allclose(a[2], b[2], rtol=1e-12)  # p tables
        np.testing.assert_allclose(a[3], b[3], rtol=1e-9, atol=1e-12)

    def test_sample_wraps(self):
        tab = get_torus_tables(TORUS_SMALL)
        s = np.asarray(
            tab.sample(jax.random.PRNGKey(0), jnp.full((1000,), 2.5))
        )
        assert (np.abs(s) <= np.pi).all()
