from diffdock_tpu.data.complexes import ComplexData, pad_to
from diffdock_tpu.data.featurize import (
    LIG_CATEGORICAL_DIMS,
    REC_CATEGORICAL_DIMS,
)

__all__ = ["ComplexData", "pad_to", "LIG_CATEGORICAL_DIMS", "REC_CATEGORICAL_DIMS"]
