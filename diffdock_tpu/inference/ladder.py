"""Coarse eval ladder: a small set of covering buckets for full-sweep
docking.

The fine geometric ladders in ``data/complexes.py`` minimize padding FLOPs
but fan a realistic 150-complex evaluation mix into ~38 distinct compiled
programs (bench.py --churn), which at minutes of XLA compile each dominates
first-run wall-clock. The cover ladder trades padding for programs: every
complex is executed in the smallest of FOUR buckets that fits it, so a
whole sweep compiles at most four programs while keeping the weighted
padding overhead bounded (~2x cross-block area on the churn mix — measured
in PERF.md).

Used by ``bench.py`` (the distribution-weighted throughput headline is the
throughput of this executable plan, not a model) and by the ``prewarm``
CLI (compile the ladder into the persistent cache ahead of a sweep).
The reference has no analogue: torch eager pays no compile, but also never
batches poses into one device program (``evaluate.py:523-540`` runs pose
mini-batches through eager PyG).
"""

from __future__ import annotations

from typing import Tuple

# (n_lig, n_rec, n_bonds, poses_in_flight); poses_in_flight chosen so the
# paper-recipe 40 poses/complex divide into whole batches and the largest
# bucket still fits HBM alongside DiffDock-L activations.
COVER_LADDER: Tuple[Tuple[int, int, int, int], ...] = (
    (32, 320, 16, 40),
    (48, 704, 16, 20),
    (64, 1024, 16, 20),
    (96, 2304, 32, 8),
)


def cover_bucket(n_lig: int, n_rec: int, n_bonds: int):
    """Smallest cover-ladder entry that fits the complex; None if the
    complex exceeds the ladder (caller falls back to the fine ladder)."""
    for nl, nr, nb, poses in COVER_LADDER:
        if n_lig <= nl and n_rec <= nr and n_bonds <= nb:
            return nl, nr, nb, poses
    return None
