"""Probe: per-batch cost of the DEFAULT confidence-stage forward on chip.

The reference's measured ``run_times`` include the confidence-model
forward on the final poses (reference ``utils/sampling.py:208-227``
inside the timed region at ``evaluate.py:384,410``); bench.py's headline
has so far charged only the score trajectory (VERDICT r4 missing #1).
The shipped default confidence architecture is the OLD all-atom model
(reference ``inference.py:84`` --old_confidence_model default True) at
the published scale (ns=24, nv=6, 5 conv layers, ESM embeddings — paper
appendix; confidence/confidence_train.py defaults are smaller but the
released checkpoint used these).

The measurement itself is ``bench._make_conf_measurer`` — the SAME
builder the headline's confidence stage uses (one source of truth for
the architecture and the pipeline-mirroring chunked forward), so probe
numbers and headline charges cannot drift apart.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_confidence.py
"""

import json
import sys

sys.path.insert(0, ".")

from bench import _enable_cache_logging, _make_conf_measurer  # noqa: E402

# (nl, nr, nb, P) cover entries to probe: the top-weight mid bucket, a
# small bucket, and the largest (18k-atom) bucket
PROBES = [
    (32, 384, 16, 40),
    (16, 640, 16, 40),
    (96, 2304, 32, 8),
]


def main():
    from diffdock_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    _enable_cache_logging()
    measure = _make_conf_measurer()

    rows = {}
    for nl, nr, nb, P in PROBES:
        try:
            r = measure(nl, nr, nb, P, n_rep=3)
            rows[f"{nl}x{nr}"] = {
                **r,
                "compile_s": round(r["compile_s"], 1),
                "steady_s_per_batch": round(r["steady_s_per_batch"], 4),
                "s_per_pose": round(r["s_per_pose"], 5),
            }
            print(f"# conf {nl}x{nr} na={r['na']} P={P}: compile "
                  f"{r['compile_s']:.1f}s steady "
                  f"{r['steady_s_per_batch']:.3f}s/batch "
                  f"({r['s_per_pose'] * 1e3:.1f} ms/pose)", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — probe records failures
            rows[f"{nl}x{nr}"] = {"poses": P,
                                  "error": f"{type(e).__name__}: {e}"[:300]}
            print(f"# conf {nl}x{nr} FAILED: {e}", file=sys.stderr)
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
