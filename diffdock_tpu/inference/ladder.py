"""Coarse eval ladder: a small set of covering buckets for full-sweep
docking.

The fine geometric ladders in ``data/complexes.py`` minimize padding FLOPs
but fan a realistic 150-complex evaluation mix into ~38 distinct compiled
programs (bench.py --churn), which at minutes of XLA compile each dominates
first-run wall-clock. The cover ladder trades padding for programs: every
complex is executed in the fastest cover bucket that fits it, so a whole
sweep compiles at most ``len(COVER_LADDER)`` programs while keeping the
weighted padding overhead bounded (measured in PERF.md).

Used by ``bench.py`` (the distribution-weighted throughput headline is the
throughput of this executable plan, not a model), by the ``prewarm``
CLI (compile the ladder into the persistent cache ahead of a sweep), and
by ``DockingPipeline(bucket_ladder="cover")`` — the default for
``cli.evaluate`` sweeps — so the measured plan IS the production path.
The reference has no analogue: torch eager pays no compile, but also never
batches poses into one device program (``evaluate.py:523-540`` runs pose
mini-batches through eager PyG).
"""

from __future__ import annotations

from typing import Collection, Optional, Tuple

# (n_lig, n_rec, n_bonds, poses_in_flight); poses_in_flight chosen so the
# paper-recipe 40 poses/complex divide into whole batches and the largest
# bucket still fits HBM alongside DiffDock-L activations (P*area bounded
# by the known-good 8x96x2304 footprint).
#
# Entries were selected by greedy search against the 150-complex churn
# distribution using the round-3 measured cost model
# t_pose ~ 3.42e-6 * (nl*nr) + 0.0094 s (BENCH_DETAILS fit), restricted
# to the fine-ladder bucket grid (data/complexes.py LIG/REC_BUCKETS).
# v1 (10 buckets) measured 9.63 poses/s weighted vs 6.55 for the
# previous 4-bucket ladder. v2 (this one) adds the 6 grid points with
# the largest remaining padding reduction — measured on an idle chip:
# 11.04 poses/s weighted (+14.6%) at x2.02 mean padding — now that the persistent
# compile cache (utils/compile_cache.py + the prewarm CLI) makes each
# extra program a one-time ~30-60 s disk-cached load rather than a
# minutes-long cold compile per sweep. Modeled per-complex times
# (40 poses) ascend monotonically down the ladder, so first-fit ==
# fastest-fit (pinned by tests/test_ladder.py).
# Ordered fastest-fit-first (ascending per-complex time).
# v3 (round 4): 16 entries greedy-selected + swap-refined over the
# DENSE_*_BUCKETS candidate rungs against the measured affine cost model
# on the PDBBind-like mix, with the (96, 2304) envelope pinned so the
# coverage envelope never shrinks (modeled +9.6% over v2's default-rung
# selection; v2 history in PERF.md). The round-1/2 continuity bucket
# (32, 320) is superseded by (32, 384) — its banked measurement remains
# in BENCH_DETAILS.json and bench.py's headline serves it as
# best_bucket_banked.
COVER_LADDER: Tuple[Tuple[int, int, int, int], ...] = (
    (32, 192, 16, 40),
    (16, 640, 16, 40),
    (48, 256, 16, 40),
    (32, 384, 16, 40),
    (40, 448, 16, 40),
    (28, 640, 16, 40),
    (56, 384, 16, 40),
    (24, 1024, 16, 40),
    (40, 704, 16, 40),
    (56, 576, 16, 40),
    (40, 832, 16, 40),
    (32, 1280, 16, 20),
    (48, 1024, 16, 20),
    (64, 1024, 16, 20),
    (40, 1792, 16, 20),
    (96, 2304, 32, 8),
)


# Measured steady-state cost model for the production dock program on one
# v5e chip (round-3 BENCH_DETAILS fit, DiffDock-L config at bf16):
# seconds per pose as a function of the NL x NR cross-block area. Used to
# (a) order/validate the ladder (tests/test_ladder.py), (b) budget and
# weight-order bench.py, and (c) detect pathological programs at runtime
# (the 94x-slow 16x704 driver anomaly, VERDICT r3): a batch running many
# times slower than this model is quarantined and its complexes re-routed
# to the next covering entry.
COST_PER_AREA_S = 3.42e-6
COST_BASE_S = 0.0094


def modeled_batch_seconds(nl: int, nr: int, poses: int) -> float:
    """Modeled steady-state wall-clock of one (bucket, poses) batch."""
    return poses * (COST_PER_AREA_S * nl * nr + COST_BASE_S)


# HBM-proven in-flight bounds, both anchored at the bench-proven flagship
# point (8 poses x 96 lig x 2304 res of DiffDock-L fits one v5e chip,
# PERF.md). Two constraints because the two biggest activation families
# scale differently:
# - cross-block (ligand x receptor) terms scale with P*NL*NR;
# - receptor-side neighbor blocks scale with P*NR *independent of NL*
#   (a 13.4G bf16[P, NR, K, F] allocation OOMed the P=40 small-
#   ligand/2304-res program at P*NR=92160: 15.80G of 15.75G HBM, while
#   every cover entry up to P*NR=46080 — 32x2304 at P=20 — measures
#   clean on chip; the bound is that proven point).
HBM_AREA_BOUND = 8 * 96 * 2304
HBM_POSE_NR_BOUND = 20 * 2304


def pdbbind_like_sizes(n: int = 150, seed: int = 7):
    """A realistic PDBBind-test-like complex-size draw (ligand heavy
    atoms, receptor residues): ligands ~8-60 heavy atoms; receptors
    log-spread over ~100-3000 with the mass around 200-600 (the reference
    caps receptors at 3000, datasets/process_mols.py:169-170). The
    default mix behind bench.py's weighted headline and
    ``prewarm --fine``."""
    import numpy as np

    rng = np.random.RandomState(seed)
    nl = np.clip(rng.normal(30, 12, n).astype(int), 8, 120)
    nr = np.clip(np.exp(rng.normal(5.9, 0.7, n)).astype(int), 90, 3000)
    return list(zip(nl.tolist(), nr.tolist()))


def fine_hbm_poses(nl: int, nr: int) -> int:
    """Largest HBM-safe poses-in-flight for a fine bucket: the biggest
    entry of the fine-plan P ladder (divisors of the 40-pose recipe, so
    sweeps run whole batches) whose activation area fits the bench-proven
    per-chip bound. Shared by ``fine_plan`` and the pipeline's fine-mode
    default chunk so warmed services execute exactly the programs
    ``prewarm --fine`` compiled."""
    return next(
        p for p in (40, 20, 10, 8, 5, 4, 2, 1)
        if (p * nl * nr <= HBM_AREA_BOUND
            and p * nr <= HBM_POSE_NR_BOUND) or p == 1
    )


def fine_plan(sizes=None, dense=False):
    """The warmed-service execution plan: each complex in its
    minimal-padding fine bucket (``data/complexes.bucket_sizes``, what
    ``DockingPipeline(bucket_ladder="fine")`` pads to) with the largest
    HBM-safe pose batch that divides the 40-pose recipe into whole
    batches. ~38 programs at x1.56 mean padding for the default mix vs
    the cover ladder's 16 at x2.02 — the right plan once the persistent
    cache is warm (``prewarm --fine``); the cover ladder remains the
    cold-sweep default. ``dense`` uses the ~1.2x-spaced warmed-service
    rungs instead (~85 programs at x1.29 mean padding, what
    ``DockingPipeline(bucket_ladder="fine_dense")`` executes).
    Returns {(nl, nr, nb, P): [(nl_c, nr_c), ...]}."""
    from diffdock_tpu.data.complexes import bucket_sizes

    if sizes is None:
        sizes = pdbbind_like_sizes()
    plan = {}
    for nl_c, nr_c in sizes:
        nb_c = max(1, nl_c // 4)
        nl, nr, nb = bucket_sizes(nl_c, nr_c, nb_c, dense=dense)
        plan.setdefault(
            (nl, nr, nb, fine_hbm_poses(nl, nr)), []
        ).append((nl_c, nr_c))
    return plan


def cover_bucket(
    n_lig: int,
    n_rec: int,
    n_bonds: int,
    exclude: Optional[Collection[Tuple[int, int, int, int]]] = None,
):
    """First (= fastest, by construction of the ordering) cover-ladder
    entry that fits the complex; None if the complex exceeds the ladder
    (caller falls back to the fine ladder). ``exclude``: quarantined
    entries to skip (runtime anomaly guard) — the next covering entry is
    returned instead."""
    for entry in COVER_LADDER:
        if exclude and entry in exclude:
            continue
        nl, nr, nb, poses = entry
        if n_lig <= nl and n_rec <= nr and n_bonds <= nb:
            return entry
    return None
