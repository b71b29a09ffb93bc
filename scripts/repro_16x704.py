"""Reproduce the round-3 driver anomaly: cover bucket 16x704 ran at
225.5 s/batch under the driver (cold compile) vs 2.4 s/batch on the
builder's idle run (VERDICT r3 weak #2).

Measures, in ONE fresh process:
  1. a warm-cache load of the 16x704 program (the entry the driver's own
     run wrote) + steady-state timing;
  2. a healthy neighbor bucket (32x704) for comparison;
optionally with the persistent cache bypassed (--cold) to test whether a
fresh XLA compile of the same program is sometimes pathological.

Persistent-cache hit/miss logging is enabled so we can see whether the
executable came from disk or a fresh compile.
"""

import argparse
import logging
import sys
import time

ap = argparse.ArgumentParser()
ap.add_argument("--cold", action="store_true",
                help="bypass the persistent cache (fresh XLA compile)")
ap.add_argument("--buckets", default="16x704,32x704")
ap.add_argument("--reps", type=int, default=3)
args = ap.parse_args()

if args.cold:
    import os

    os.environ["DIFFDOCK_TPU_NO_COMPILE_CACHE"] = "1"

logging.basicConfig(level=logging.WARNING, stream=sys.stderr)
for name in ("jax._src.compiler", "jax._src.compilation_cache",
             "jax._src.cache_key"):
    logging.getLogger(name).setLevel(logging.DEBUG)

sys.path.insert(0, ".")
from bench import _bench_bucket, _make_pipeline  # noqa: E402

pipeline = _make_pipeline()
for spec in args.buckets.split(","):
    nl, nr = (int(x) for x in spec.split("x"))
    t0 = time.time()
    r = _bench_bucket(pipeline, nl, nr, 16, 40, n_rep=args.reps)
    print(
        f"RESULT bucket {nl}x{nr} cold={args.cold}: compile/load "
        f"{r['compile_s']:.1f}s, steady {r['steady_s_per_batch']:.3f}s/batch "
        f"-> {r['poses_per_sec']:.2f} poses/s "
        f"(total {time.time() - t0:.0f}s)",
        flush=True,
    )
