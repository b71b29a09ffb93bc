"""Model factory (reference ``utils/utils.py:172-281`` ``get_model``)."""

from __future__ import annotations

from diffdock_tpu.models.config import ScoreModelConfig


def build_model(cfg: ScoreModelConfig):
    """CG vs all-atom selection by config, like the reference factory."""
    if cfg.all_atoms:
        from diffdock_tpu.models.aa_model import AAScoreModel

        return AAScoreModel(cfg)
    from diffdock_tpu.models.score_model import CGScoreModel

    return CGScoreModel(cfg)
