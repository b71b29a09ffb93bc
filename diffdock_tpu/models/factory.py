"""Model factory (reference ``utils/utils.py:172-281`` ``get_model``)."""

from __future__ import annotations

from diffdock_tpu.models.config import ScoreModelConfig


def build_model(cfg: ScoreModelConfig):
    """CG vs all-atom x new vs old (v1.0) selection by config, like the
    reference factory's four-way dispatch (``utils/utils.py:179-224``)."""
    if cfg.old_architecture:
        if cfg.all_atoms:
            from diffdock_tpu.models.old_models import OldAAScoreModel

            return OldAAScoreModel(cfg)
        from diffdock_tpu.models.old_models import OldCGScoreModel

        return OldCGScoreModel(cfg)
    if cfg.all_atoms:
        from diffdock_tpu.models.aa_model import AAScoreModel

        return AAScoreModel(cfg)
    from diffdock_tpu.models.score_model import CGScoreModel

    return CGScoreModel(cfg)
