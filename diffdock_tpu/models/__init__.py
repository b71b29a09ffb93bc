from diffdock_tpu.models.config import ScoreModelConfig
from diffdock_tpu.models.score_model import CGScoreModel

__all__ = ["ScoreModelConfig", "CGScoreModel"]
