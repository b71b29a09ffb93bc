"""Generate the frozen e3nn-parity golden fixture.

Runs the from-spec (sympy-CG) implementation of the reference
OldTensorProductConvLayer on a random case and stores inputs + reference
state dict + expected outputs in tests/fixtures/e3nn_golden.npz. The
committed fixture pins the converter semantics (tests/test_e3nn_parity.py::
test_golden_fixture) independently of the live spec code.

Usage: PYTHONPATH=/root/repo python scripts/make_e3nn_fixture.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.e3nn_spec import spec_old_conv_forward  # noqa: E402
from tests.test_e3nn_parity import (  # noqa: E402
    IN_IRREPS,
    OUT_IRREPS,
    SH_IRREPS,
    _make_conv_case,
)


def main():
    (sd, node_attr, edge_src, edge_dst, edge_attr, edge_sh, nbr, msk,
     order, K) = _make_conv_case(seed=2026)
    expected = spec_old_conv_forward(
        IN_IRREPS, SH_IRREPS, OUT_IRREPS, sd, node_attr, edge_src, edge_dst,
        edge_attr, edge_sh, out_nodes=node_attr.shape[0],
    )
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "e3nn_golden.npz",
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(
        out_path,
        node_attr=node_attr, edge_attr=edge_attr, edge_sh=edge_sh,
        nbr=nbr, msk=msk, order=order, K=np.asarray(K),
        expected=expected.astype(np.float32),
        **{f"sd_{k}": v for k, v in sd.items()},
    )
    print(f"wrote {out_path} (expected mean {expected.mean():.6f})")


if __name__ == "__main__":
    main()
