"""Invariants of the eval cover ladder (inference/ladder.py).

The ladder is an executable plan: bench.py's weighted headline and the
prewarm CLI both trust that (a) every realistic complex is covered, (b)
the first-fit entry is also the fastest-fitting entry, and (c) every
bucket's pose batch fits HBM. These tests pin those properties so ladder
edits can't silently break the bench or the prewarm set.
"""

from diffdock_tpu.inference.ladder import (
    COST_BASE_S,
    COST_PER_AREA_S,
    COVER_LADDER,
    cover_bucket,
    modeled_batch_seconds,
)

# round-3 measured cost model (BENCH_DETAILS fit, see ladder.py comment):
# steady-state seconds per pose as a function of cross-block area
_A, _B = COST_PER_AREA_S, COST_BASE_S
POSES_PER_COMPLEX = 40
# known-good HBM footprint: 8 poses x 96 lig x 2304 res (bench-proven)
_HBM_AREA_BOUND = 8 * 96 * 2304


def _complex_time(nl, nr, poses):
    """Modeled wall-clock for one 40-pose complex in bucket (nl, nr)."""
    batches = -(-POSES_PER_COMPLEX // poses)
    return batches * poses * (_A * nl * nr + _B)


def test_ladder_ordered_fastest_first():
    times = [_complex_time(nl, nr, p) for nl, nr, _, p in COVER_LADDER]
    assert times == sorted(times), (
        "COVER_LADDER must be ordered by ascending modeled per-complex "
        f"time so first-fit == fastest-fit; got {times}"
    )


def test_ladder_hbm_bound():
    for nl, nr, _, poses in COVER_LADDER:
        assert poses * nl * nr <= _HBM_AREA_BOUND, (nl, nr, poses)


def test_ladder_pose_counts_divide_recipe():
    # whole batches for the paper 40-pose recipe: no wasted tail poses
    for _, _, _, poses in COVER_LADDER:
        assert POSES_PER_COMPLEX % poses == 0, poses


def test_ladder_covers_churn_mix():
    from bench import churn_sizes

    for nl_c, nr_c in churn_sizes():
        nb_c = max(1, nl_c // 4)
        cov = cover_bucket(nl_c, nr_c, nb_c)
        assert cov is not None, (nl_c, nr_c)
        nl, nr, nb, _ = cov
        assert nl_c <= nl and nr_c <= nr and nb_c <= nb


def test_first_fit_is_min_time_fit():
    # exhaustive check over a grid: the returned bucket is the modeled
    # time-minimizer among ALL fitting entries, not just the first
    for nl_c in range(8, 97, 8):
        for nr_c in range(90, 2305, 101):
            cov = cover_bucket(nl_c, nr_c, 1)
            if cov is None:
                continue
            fits = [
                (nl, nr, p)
                for nl, nr, nb, p in COVER_LADDER
                if nl_c <= nl and nr_c <= nr
            ]
            best = min(fits, key=lambda e: _complex_time(*e))
            assert _complex_time(cov[0], cov[1], cov[3]) == _complex_time(
                *best
            ), (nl_c, nr_c, cov, best)


def test_oversize_returns_none():
    assert cover_bucket(200, 500, 1) is None
    assert cover_bucket(30, 5000, 1) is None


def test_modeled_batch_seconds_matches_cost_model():
    assert modeled_batch_seconds(32, 320, 40) == 40 * (
        _A * 32 * 320 + _B
    )


def test_exclude_reroutes_to_next_covering_entry():
    # quarantining the entry a complex would route to re-routes it to the
    # next (slower but healthy) covering entry — the anomaly-guard path
    entry = cover_bucket(14, 600, 3)
    assert entry == (16, 640, 16, 40)
    rerouted = cover_bucket(14, 600, 3, exclude={entry})
    assert rerouted is not None and rerouted != entry
    nl, nr, nb, _ = rerouted
    assert 14 <= nl and 600 <= nr and 3 <= nb
    # the re-route is the fastest remaining fit
    fits = [
        e for e in COVER_LADDER
        if e != entry and 14 <= e[0] and 600 <= e[1] and 3 <= e[2]
    ]
    best = min(fits, key=lambda e: _complex_time(e[0], e[1], e[3]))
    assert _complex_time(rerouted[0], rerouted[1], rerouted[3]) == (
        _complex_time(best[0], best[1], best[3])
    )


def test_exclude_all_returns_none():
    assert cover_bucket(14, 600, 3, exclude=set(COVER_LADDER)) is None
