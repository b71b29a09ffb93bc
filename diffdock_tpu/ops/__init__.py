from diffdock_tpu.ops.irreps import Irrep, Irreps, get_irrep_seq
from diffdock_tpu.ops.spherical import spherical_harmonics, SH_IRREPS
from diffdock_tpu.ops.tensor_product import (
    FullyConnectedTensorProduct,
    FullTensorProduct,
)
from diffdock_tpu.ops.segment import masked_mean_pool

__all__ = [
    "Irrep",
    "Irreps",
    "get_irrep_seq",
    "spherical_harmonics",
    "SH_IRREPS",
    "FullyConnectedTensorProduct",
    "FullTensorProduct",
    "masked_mean_pool",
]
