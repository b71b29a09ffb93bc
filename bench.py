"""Benchmark: DiffDock-L-scale docking throughput on one TPU chip.

Default mode measures the production docking path (DockingPipeline, 20
denoising steps, 40 poses per complex — the paper-eval recipe) over the
cover-ladder buckets (`diffdock_tpu/inference/ladder.py`) and reports a
**distribution-weighted poses/sec**: the throughput of running a
realistic 150-complex PDBBind-like size mix (churn_sizes) through the
cover ladder — every complex executes in the smallest measured bucket
that fits it, 40 poses each, so this is the wall-clock of an actual
executable plan, not an extrapolation. The reference measurement
contract is per-complex run_times over the full test set
(evaluate.py:579-591). ``best_bucket_poses_per_sec`` (the 32x320 bucket
alone) is kept for round-1/2 continuity.

The artifact is designed to be un-failable under a driver timeout
(VERDICT r3 ask #1):

- buckets are measured in **descending churn-weight order** (their time
  contribution to the weighted plan), so an early stop loses only the
  low-weight tail;
- after EVERY bucket, BENCH_DETAILS.json is rewritten and a provisional
  headline JSON line is printed to stdout with ``"partial": true`` —
  the weighted number uses measured buckets plus the cost-model fill
  (`ladder.modeled_batch_seconds`) for the unmeasured tail. The final
  line has ``"partial": false``;
- a total wall-clock budget (``--budget``, default 1500 s, env
  ``BENCH_BUDGET_S``) stops measuring before a driver ``timeout`` would
  kill the process mid-bucket;
- a per-bucket anomaly cap (VERDICT r3 weak #2: the 16x704 bucket ran
  94x its cost model under the driver): if the first post-compile batch
  exceeds ``--anomaly_factor`` x the modeled batch time, remaining reps
  are skipped, the bucket is **quarantined**, and the weighted plan
  re-routes its complexes to the next covering entry — exactly what the
  production pipeline's runtime guard does (inference/pipeline.py).

Persistent-cache hit/miss logging (VERDICT r3 ask #5): ``jax_log_compiles``
and ``jax_explain_cache_misses`` are enabled, so stderr shows per program
whether the executable came from the persistent cache or a fresh compile.

Baseline: the reference (torch/PyG DiffDock-L) samples roughly 1.6
poses/sec on an A100 at 40 poses x 20 steps (~25 s per 40-pose complex;
derived from published runtimes of the reference pipeline — the repo
itself publishes no numbers, BASELINE.md). vs_baseline divides the
weighted number by that single A100 figure.

Extra modes:

  python bench.py --churn     bucket-churn accounting only (no chip time)
  python bench.py --fine      additionally measure the round-2 fine
                              buckets (64/1024 P=16, 96/2304 P=8)
  python bench.py --pocket    additionally measure the NR>1024 buckets
                              with crop_beyond pocket compaction and
                              report an alternate weighted headline
  python bench.py --fine_plan measure the WARMED-SERVICE plan: every
                              churn complex in its minimal-padding fine
                              bucket (~38 programs at x1.56 mean padding
                              vs the cover ladder's 16 at x2.02) with the
                              largest HBM-safe pose batch. This is what a
                              long-running service executes once the
                              persistent cache is warm (prewarm --fine);
                              the cover ladder remains the cold-sweep
                              default because 38 cold compiles dominate a
                              first run. Reported as weighted_fine.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

A100_BASELINE_POSES_PER_SEC = 1.6
POSES_PER_COMPLEX = 40  # paper-eval recipe
STEPS = 20
N_CHURN_COMPLEXES = 150


def churn_sizes(n=N_CHURN_COMPLEXES, seed=7):
    """The PDBBind-like complex-size mix behind the weighted headline
    (moved to ``inference/ladder.pdbbind_like_sizes`` so the prewarm CLI
    shares it; kept as an alias for tests/scripts)."""
    from diffdock_tpu.inference.ladder import pdbbind_like_sizes

    return pdbbind_like_sizes(n, seed)


def run_churn():
    from diffdock_tpu.data.complexes import bucket_sizes

    sizes = churn_sizes()
    buckets = {}
    pad_ratio = []
    for nl, nr in sizes:
        b = bucket_sizes(nl, nr, max(1, nl // 4))
        buckets.setdefault(b, 0)
        buckets[b] += 1
        pad_ratio.append((b[0] * b[1]) / (nl * nr))
    rows = sorted(buckets.items())
    mean_pad = float(np.mean(pad_ratio))
    print(
        f"# churn: {len(sizes)} complexes -> {len(rows)} distinct "
        f"fine-ladder buckets (compiled programs); mean cross-block "
        f"padding x{mean_pad:.2f}",
        file=sys.stderr,
    )
    for b, n in rows:
        print(f"#   bucket nl={b[0]} nr={b[1]} nb={b[2]}: {n} complexes",
              file=sys.stderr)
    return {
        "complexes": len(sizes),
        "distinct_buckets": len(rows),
        "mean_cross_padding": round(mean_pad, 3),
        "buckets": [{"nl": b[0], "nr": b[1], "nb": b[2], "count": n}
                    for b, n in rows],
    }


POCKET_CROP_BEYOND = 20.0   # reference pocket-eval crop (utils/utils.py:388)
POCKET_CAPACITY = 1024      # compaction capacity (PERF.md, 2.1x at 32x2304)


def _enable_cache_logging():
    """Per-program persistent-cache hit/miss evidence on stderr
    (VERDICT r3 ask #5). Hits log at DEBUG ('Persistent compilation cache
    hit for ...'), misses at WARNING with jax_explain_cache_misses; a
    dedicated filtered handler passes ONLY those lines — NOT
    jax_log_compiles, which dumps full argument-shape lists per compile
    (megabytes of stderr and real host-CPU formatting load that pollutes
    chip steady-state timings through the axon dispatch path)."""
    import logging

    import jax

    try:
        jax.config.update("jax_explain_cache_misses", True)
    except Exception:  # pragma: no cover - older jax
        pass
    # jax 0.8-era bug exposed by stable scan bodies (torsion.py): the
    # explain path builds cache keys as (ctx, (avals, dbg, *context), {})
    # but diff_tracing_cache_keys unpacks the middle as (tree, dbg, qdd,
    # *_) — a lax.scan body's key has only (avals, dbg), so the SECOND
    # shape traced for the same body raises ValueError('not enough values
    # to unpack') INSIDE the user's trace and kills the program. Guard
    # the differ so a malformed key degrades to 'explanation unavailable'
    # instead of failing the dock call (round-5 rehearsal: 9 cover
    # buckets error-rowed by exactly this).
    try:
        from jax._src.interpreters import partial_eval as _pe

        if not getattr(_pe.diff_tracing_cache_keys, "_ddt_safe", False):
            _orig_diff = _pe.diff_tracing_cache_keys

            def _safe_diff(new_key, old_key):
                try:
                    return _orig_diff(new_key, old_key)
                except Exception:
                    return (9, 0, "cache miss explanation unavailable "
                                  "(short tracing-cache key)")

            _safe_diff._ddt_safe = True
            _pe.diff_tracing_cache_keys = _safe_diff
    except Exception:  # pragma: no cover - jax internals moved
        pass
    handler = logging.StreamHandler(sys.stderr)
    handler.addFilter(
        lambda r: "persistent compilation cache" in r.getMessage().lower()
    )
    logger = logging.getLogger("jax._src.compiler")
    logger.setLevel(logging.DEBUG)
    logger.addHandler(handler)
    # don't also flow DEBUG records (get_compile_options noise, duplicate
    # hit lines) to any root handler the environment may have configured
    logger.propagate = False


def _make_pipeline(steps=STEPS, pocket=False, dense=False):
    import jax
    import jax.numpy as jnp

    from diffdock_tpu.data.complexes import synthetic_complex
    from diffdock_tpu.diffusion.so3 import get_so3_tables
    from diffdock_tpu.diffusion.torus import get_torus_tables
    from diffdock_tpu.inference.pipeline import DockingPipeline
    from diffdock_tpu.inference.sampler import SamplerConfig
    from diffdock_tpu.models.config import PRESETS
    from diffdock_tpu.models.score_model import CGScoreModel

    cfg = dataclasses.replace(PRESETS["diffdock_l"], compute_dtype="bfloat16")
    kw = {}
    if pocket:
        # in-jit sigma-dependent crop + gather-compaction to a fixed
        # pocket capacity; a huge pre_crop_radius (f32-square-safe)
        # disables the host-side pre-crop so the measured program ingests
        # the full padded receptor (what a sweep over big receptors runs)
        cfg = dataclasses.replace(cfg, crop_beyond=POCKET_CROP_BEYOND)
        kw = dict(pocket_capacity=POCKET_CAPACITY, pre_crop_radius=1e9)
    model = CGScoreModel(cfg)
    so3 = get_so3_tables()
    torus = get_torus_tables()
    rng = np.random.RandomState(0)
    d0 = jax.tree.map(
        jnp.asarray,
        synthetic_complex(rng, n_lig=16, n_rec=64, n_bonds=4, lm_dim=1280),
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), d0, d0.lig_pos, jnp.asarray(0.5), so3, torus
    )
    return DockingPipeline(
        cfg, params,
        SamplerConfig(inference_steps=steps, actual_steps=steps),
        so3_tables=so3, torus_tables=torus,
        bucket_ladder="fine_dense" if dense else "fine", **kw,
    )


def _bench_bucket(pipeline, nl, nr, nb, poses, n_rep=2, anomaly_factor=None):
    """Compile + steady-state time for one (bucket, poses) program on the
    production dock_complex path. Returns a dict with poses_per_sec,
    steady s/batch, compile/load time, and whether the first post-compile
    batch tripped the anomaly cap (in which case remaining reps were
    skipped and the recorded steady time is that anomalous batch)."""
    from diffdock_tpu.data.complexes import bucket_sizes, synthetic_complex
    from diffdock_tpu.inference.ladder import modeled_batch_seconds

    rng = np.random.RandomState(1)
    data = synthetic_complex(
        rng, n_lig=nl, n_rec=nr, n_bonds=nb, lm_dim=1280
    )
    # the synthetic sizes must BE the pipeline's bucket for (nl, nr, nb)
    # so the measured program is exactly the requested one
    assert bucket_sizes(
        data.n_lig, data.n_rec, data.n_bonds,
        dense=getattr(pipeline, "_dense", False),
    ) == (nl, nr, nb)

    t0 = time.time()
    pipeline.dock_complex(data, num_poses=poses, seed=0)
    compile_time = time.time() - t0

    model_s = modeled_batch_seconds(nl, nr, poses)
    reps, anomaly = [], False
    for i in range(n_rep):
        t0 = time.time()
        pipeline.dock_complex(data, num_poses=poses, seed=i + 1)
        reps.append(time.time() - t0)
        if (
            i == 0
            and anomaly_factor is not None
            and reps[0] > anomaly_factor * model_s
        ):
            anomaly = True
            break
    dt = float(np.mean(reps))
    return {
        "poses_per_sec": poses / dt,
        "steady_s_per_batch": dt,
        "compile_s": compile_time,
        "anomaly": anomaly,
        "model_s_per_batch": model_s,
    }


def _guard_banked_row(details, key, row, run_id):
    """Record a measurement row without letting a failed/anomalous
    attempt clobber a clean banked row (round-5 rehearsal: a loaded-host
    tunnel glitch error-rowed 9 good cover rows in one run, which would
    have starved the next run's bank fill). A bad row lands only when no
    clean measurement exists; otherwise the clean row is kept and the
    failure is recorded on it as ``last_failed_attempt``."""
    bad = bool(row.get("error")) or bool(row.get("anomaly"))
    if bad:
        prior = details.get(key)
        if prior is None:
            try:
                with open("BENCH_DETAILS.json") as f:
                    prior = json.load(f).get(key)
            except (FileNotFoundError, ValueError):
                prior = None
        if (isinstance(prior, dict) and prior.get("steady_s_per_batch")
                and not (prior.get("error") or prior.get("anomaly"))):
            details[key] = {
                **prior,
                "last_failed_attempt": {
                    "run": run_id,
                    **({"error": str(row["error"])[:300]}
                       if row.get("error")
                       else {"anomalous_steady_s":
                             row["steady_s_per_batch"]}),
                },
            }
            return
    details[key] = row


def _bench_bucket_safe(pipeline, nl, nr, nb, poses, **kw):
    """_bench_bucket, but a bucket that fails to compile or execute (e.g.
    an HBM OOM through the remote-compile tunnel) is recorded instead of
    killing the artifact run: returns the result dict with an "error" key
    and anomaly=True so callers quarantine/skip it."""
    try:
        return _bench_bucket(pipeline, nl, nr, nb, poses, **kw)
    except Exception as e:  # noqa: BLE001 — un-failable artifact
        import traceback

        msg = f"{type(e).__name__}: {e}"
        print(f"# bucket {nl}x{nr} P={poses} FAILED: {msg[:300]}",
              file=sys.stderr)
        # the artifact row keeps the short message; the stderr evidence
        # keeps the full frames so a driver-run failure is diagnosable
        print(traceback.format_exc(limit=25), file=sys.stderr)
        return {
            "poses_per_sec": 0.0,
            "steady_s_per_batch": 0.0,
            "compile_s": 0.0,
            "anomaly": True,
            "model_s_per_batch": 1.0,
            "error": msg[:500],
        }


def _weighted_plan(measured, quarantined, banked=None, conf_cost=None):
    """Wall-clock of the 150-complex x 40-pose plan through the cover
    ladder with ``quarantined`` entries excluded (their complexes
    re-route to the next covering entry, mirroring the pipeline's
    runtime guard). Buckets this run did not measure fall back to
    ``banked`` (per-bucket steady times banked in BENCH_DETAILS.json by
    an earlier complete run — real chip measurements, so a budget-cut
    run degrades gracefully instead of reverting to the cost model),
    then to the cost model. When ``conf_cost`` (a (nl, nr) -> s/pose
    callable, see _conf_cost_fn) is given, each complex is additionally
    charged POSES_PER_COMPLEX x that for the confidence re-ranking stage
    — the reference's timed recipe includes it. Returns (total_s, poses,
    n_model_filled_complexes, mean_padding, n_banked_filled_complexes,
    confidence_s); total_s includes confidence_s."""
    from diffdock_tpu.data.complexes import bucket_sizes
    from diffdock_tpu.inference.ladder import (
        cover_bucket,
        fine_hbm_poses,
        modeled_batch_seconds,
    )

    total_time, total_poses, filled, banked_filled, pad_area = (
        0.0, 0, 0, 0, []
    )
    conf_s = 0.0
    for nl_c, nr_c in churn_sizes():
        nb_c = max(1, nl_c // 4)
        cov = cover_bucket(nl_c, nr_c, nb_c, exclude=quarantined)
        if cov is None:
            # quarantine emptied the covering chain: the pipeline falls
            # back to the complex's fine bucket (dock_complex cov=None
            # path), so model that program instead of crashing the
            # artifact on its own guard
            nl, nr, nb = bucket_sizes(nl_c, nr_c, nb_c)
            cov = (nl, nr, nb, fine_hbm_poses(nl, nr))
        nl, nr, nb, poses = cov
        batches = -(-POSES_PER_COMPLEX // poses)  # ceil
        t = measured.get(cov)
        if t is None and banked:
            t = banked.get(cov)
            if t is not None:
                banked_filled += 1
        if t is None:
            t = modeled_batch_seconds(nl, nr, poses)
            filled += 1
        total_time += batches * t
        if conf_cost is not None:
            c = POSES_PER_COMPLEX * conf_cost(nl, nr)
            conf_s += c
            total_time += c
        total_poses += POSES_PER_COMPLEX
        pad_area.append((nl * nr) / (nl_c * nr_c))
    return (total_time, total_poses, filled, float(np.mean(pad_area)),
            banked_filled, conf_s)


def fine_plan(dense=False):
    """Warmed-service plan for the churn mix (see
    ``inference/ladder.fine_plan``)."""
    from diffdock_tpu.inference.ladder import fine_plan as _fp

    return _fp(churn_sizes(), dense=dense)


def _churn_weight_order():
    """Cover-ladder entries ordered by descending contribution to the
    weighted plan (modeled), so a budget cutoff loses only the tail."""
    from diffdock_tpu.inference.ladder import (
        COVER_LADDER,
        cover_bucket,
        modeled_batch_seconds,
    )

    weight = {entry: 0.0 for entry in COVER_LADDER}
    for nl_c, nr_c in churn_sizes():
        cov = cover_bucket(nl_c, nr_c, max(1, nl_c // 4))
        batches = -(-POSES_PER_COMPLEX // cov[3])
        weight[cov] += batches * modeled_batch_seconds(cov[0], cov[1], cov[3])
    return sorted(COVER_LADDER, key=lambda e: -weight[e]), weight


def _banked_steady(steps):
    """Per-bucket steady times banked in BENCH_DETAILS.json by earlier
    runs — clean cover_* rows at the same step count, plus fineplan_*
    rows whose (bucket, P) matches exactly (the compiled program is
    identical; cover rows take precedence). Lets a budget-cut run fill
    its unmeasured tail with real chip numbers instead of the cost
    model — the artifact degrades gracefully under the driver's wall
    clock instead of reverting to modeled fills."""
    try:
        with open("BENCH_DETAILS.json") as f:
            disk = json.load(f)
    except (FileNotFoundError, ValueError):
        return {}
    banked = {}
    for prefix in ("fineplan_", "cover_"):  # cover overwrites fineplan
        for k, row in disk.items():
            if not (k.startswith(prefix) and isinstance(row, dict)):
                continue
            if row.get("error") or row.get("anomaly"):
                continue
            if not row.get("steady_s_per_batch"):
                continue
            # fineplan rows don't store steps: every banking run uses the
            # bench default, which is what `steps` is unless overridden
            if row.get("steps", STEPS) != steps:
                continue
            b = row["bucket"]
            banked[
                (b["nl"], b["nr"], b["nb"], row["poses_in_flight"])
            ] = row["steady_s_per_batch"]
    return banked


def _banked_compile():
    """(nl, nr) -> worst banked cold-compile seconds across all row
    families in BENCH_DETAILS.json. The budget gate bounds a bucket's
    estimated compile by this (ADVICE r4): the adaptive median estimate
    under-predicted a 515 s cold compile (56x384) by >3x, so a cold-cache
    run could start a compile it cannot afford. Only applied in the
    cold-compile regime (recent observed compiles slow) — under a warm
    persistent cache every program loads in seconds and the worst-ever
    bound would starve the gate."""
    try:
        with open("BENCH_DETAILS.json") as f:
            disk = json.load(f)
    except (FileNotFoundError, ValueError):
        return {}
    worst = {}
    for row in disk.values():
        if not (isinstance(row, dict) and "bucket" in row):
            continue
        c = row.get("compile_s")
        if not c:
            continue
        b = (row["bucket"]["nl"], row["bucket"]["nr"])
        worst[b] = max(worst.get(b, 0.0), float(c))
    return worst


WARM_COMPILE_S = 45.0  # observed persistent-cache loads are < ~30 s


def _est_compile_s(entry, compile_hist, raw_compiles, banked_compile):
    """Budget-gate compile estimate for one ladder entry: the adaptive
    median of recent compiles, bounded below by the worst banked cold
    compile of the SAME bucket when this run looks cold (no observed
    compile yet, or recent observed compiles above the cache-load
    regime)."""
    est = 1.2 * float(np.median(compile_hist[-3:]))
    recent = raw_compiles[-2:]
    warm = bool(recent) and max(recent) < WARM_COMPILE_S
    if not warm:
        est = max(est, banked_compile.get((entry[0], entry[1]), 0.0))
    return est


def _banked_fineplan():
    """(nl, nr, nb, P) -> steady s/batch from clean fineplan_* rows banked
    in BENCH_DETAILS.json by earlier runs (content-matched on the stored
    bucket + P, independent of key format or which grid's plan measured
    them — the compiled program is identical either way)."""
    try:
        with open("BENCH_DETAILS.json") as f:
            disk = json.load(f)
    except (FileNotFoundError, ValueError):
        return {}
    banked = {}
    for k, row in disk.items():
        if not (k.startswith("fineplan_") and isinstance(row, dict)):
            continue
        if row.get("error") or row.get("anomaly"):
            continue
        if not row.get("steady_s_per_batch"):
            continue
        b = row["bucket"]
        banked[(b["nl"], b["nr"], b["nb"], row["poses_in_flight"])] = row[
            "steady_s_per_batch"
        ]
    return banked


def _refresh_fine_bank(pipeline, details, args, t_start, compile_hist,
                       raw_compiles, banked_compile, run_id, k):
    """Bank-freshness audit (VERDICT r4 ask #4): re-measure the top-K
    plan-weight BANKED fineplan programs on chip, record measured drift
    on each row, and demote (overwrite + flag) rows drifting >10% — so
    one libtpu/jax upgrade cannot silently stale the whole bank under a
    still-green artifact. Runs before the bank is served; refreshed
    values land on disk and are picked up by the seeding that follows."""
    try:
        with open("BENCH_DETAILS.json") as f:
            disk = json.load(f)
    except (FileNotFoundError, ValueError):
        return []
    rows = []
    for key, row in disk.items():
        if not (key.startswith("fineplan_") and isinstance(row, dict)):
            continue
        if row.get("error") or row.get("anomaly"):
            continue
        if not row.get("steady_s_per_batch"):
            continue
        p = row["poses_in_flight"]
        w = (row.get("complexes_served", 1)
             * -(-POSES_PER_COMPLEX // p) * row["steady_s_per_batch"])
        rows.append((w, key, row))
    rows.sort(key=lambda t: -t[0])
    drifts = []
    for _, key, row in rows[:k]:
        b = row["bucket"]
        nl, nr, nb, p = b["nl"], b["nr"], b["nb"], row["poses_in_flight"]
        est = _est_compile_s(
            (nl, nr), compile_hist, raw_compiles, banked_compile
        ) + (args.reps + 1) * row["steady_s_per_batch"]
        if time.time() - t_start + est > args.budget:
            print(f"# bank refresh: budget exhausted before {key}",
                  file=sys.stderr)
            break
        r = _bench_bucket_safe(
            pipeline, nl, nr, nb, p,
            n_rep=args.reps, anomaly_factor=args.anomaly_factor,
        )
        if "error" in r or r["anomaly"]:
            # an anomalous refresh batch must not poison the bank; the
            # runtime quarantine story already covers anomalies
            print(f"# bank refresh {key}: anomalous/failed re-measure, "
                  f"row left as-is", file=sys.stderr)
            continue
        compile_hist.append(max(60.0, r["compile_s"]))
        raw_compiles.append(r["compile_s"])
        old = row["steady_s_per_batch"]
        drift = abs(r["steady_s_per_batch"] - old) / old
        demoted = drift > 0.10
        details[key] = {
            **row,
            "banked_at": run_id,
            "compile_s": round(r["compile_s"], 1),
            "steady_s_per_batch": round(r["steady_s_per_batch"], 3),
            "poses_per_sec": round(r["poses_per_sec"], 3),
            "drift_vs_bank": round(drift, 3),
            **({"demoted_stale_value": old} if demoted else {}),
        }
        print(
            f"# bank refresh {key}: banked {old:.3f} -> measured "
            f"{r['steady_s_per_batch']:.3f} s/batch "
            f"(drift {drift * 100:.1f}%)"
            + ("  ** DEMOTED stale row **" if demoted else ""),
            file=sys.stderr,
        )
        drifts.append({
            "key": key, "banked": old,
            "measured": round(r["steady_s_per_batch"], 3),
            "drift": round(drift, 3), "demoted": demoted,
        })
    if drifts:
        details["bank_refresh"] = {"run": run_id, "rows": drifts}
        _write_details(details)
    return drifts


ATOMS_PER_RES = 8  # ~7.8 heavy atoms/residue in PDBBind receptors

# Per-pose confidence-forward cost model seed, fit to the round-5 chip
# probe (scripts/probe_confidence.py: 20.2 ms @ 32x3072, 24.0 ms @
# 16x5120, 344 ms @ 96x18432): s = A + B*(nl*na) + C*na, na = atoms.
# Used only when fewer than 3 conf_* rows exist to fit live.
_CONF_SEED_FIT = (-5.701e-3, 1.64717e-7, 3.17321e-6)
_CONF_FLOOR_S = 0.004  # dispatch floor; the fit's intercept is negative


def _banked_conf():
    """(nl, nr) -> s_per_pose from clean conf_* rows banked in
    BENCH_DETAILS.json (the confidence-stage analogue of
    _banked_steady)."""
    try:
        with open("BENCH_DETAILS.json") as f:
            disk = json.load(f)
    except (FileNotFoundError, ValueError):
        return {}
    rows = {}
    for key, row in disk.items():
        if not (key.startswith("conf_") and isinstance(row, dict)):
            continue
        if row.get("error") or row.get("anomaly"):
            continue
        if not row.get("s_per_pose"):
            continue
        rows[(row["bucket"]["nl"], row["bucket"]["nr"])] = row["s_per_pose"]
    return rows


def _conf_cost_fn(conf_rows):
    """Per-pose confidence forward cost (nl, nr) -> seconds.

    Exact banked/measured row first; otherwise a least-squares fit of
    s = A + B*(nl*na) + C*na over >=3 known rows; otherwise the committed
    probe-seeded fit. The reference's measured run_times include this
    stage (utils/sampling.py:208-227 inside the timed region at
    evaluate.py:384,410), so the weighted headline charges for it."""
    fit = _CONF_SEED_FIT
    if len(conf_rows) >= 3:
        pts = [(nl, ATOMS_PER_RES * nr, s)
               for (nl, nr), s in conf_rows.items()]
        X = np.array([[1.0, nl * na, na] for nl, na, _ in pts])
        y = np.array([s for _, _, s in pts])
        sol, *_ = np.linalg.lstsq(X, y, rcond=None)
        fit = tuple(float(v) for v in sol)

    def cost(nl, nr):
        s = conf_rows.get((nl, nr))
        if s is None:
            na = ATOMS_PER_RES * nr
            a, b, c = fit
            s = a + b * nl * na + c * na
        return max(float(s), _CONF_FLOOR_S)

    return cost


def _make_conf_measurer():
    """Builds the DEFAULT confidence re-ranker once (reference
    inference.py:84 old_confidence_model=True: OLD all-atom architecture,
    ns=24 nv=6, 5 conv layers, ESM embeddings) and returns
    measure(nl, nr, P, n_rep) timing the pipeline's exact chunked
    confidence branch at that cover bucket's padded shapes."""
    import jax
    import jax.numpy as jnp

    from diffdock_tpu.data.complexes import pad_aa_to, synthetic_aa_complex
    from diffdock_tpu.diffusion.so3 import get_so3_tables
    from diffdock_tpu.diffusion.torus import get_torus_tables
    from diffdock_tpu.inference.pipeline import _auto_confidence_chunk
    from diffdock_tpu.models.config import PRESETS
    from diffdock_tpu.models.factory import build_model

    conf_cfg = dataclasses.replace(
        PRESETS["diffdock_s"],
        ns=24, nv=6, num_conv_layers=5,
        confidence_mode=True, old_architecture=True, all_atoms=True,
        lm_embedding_dim=1280, compute_dtype="bfloat16",
    )
    model = build_model(conf_cfg)
    so3 = get_so3_tables()
    torus = get_torus_tables()
    rng = np.random.RandomState(0)
    small = jax.tree.map(
        jnp.asarray,
        synthetic_aa_complex(rng, n_lig=16, n_rec=64, n_bonds=4,
                             atoms_per_res=ATOMS_PER_RES, lm_dim=1280),
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), small, small.base.lig_pos,
        jnp.asarray(0.0), so3, torus,
    )

    @jax.jit
    def conf_forward(params, aa, poses):
        P, nl = poses.shape[0], poses.shape[1]
        na = aa.atom_pos.shape[0]
        c = _auto_confidence_chunk(nl, na, P)
        fwd = lambda p: model.apply(params, aa, p, jnp.asarray(0.0), so3,
                                    torus)
        if c >= P:
            return jax.vmap(fwd)(poses)
        pad = (-P) % c
        pp = jnp.concatenate([poses, poses[:pad]]) if pad else poses
        out = jax.lax.map(jax.vmap(fwd),
                          pp.reshape((-1, c) + poses.shape[1:]))
        return out.reshape((-1,) + out.shape[2:])[:P]

    def measure(nl, nr, nb, P, n_rep=2):
        na = nr * ATOMS_PER_RES
        data = synthetic_aa_complex(
            rng, n_lig=nl, n_rec=nr, n_bonds=nb,
            atoms_per_res=ATOMS_PER_RES, lm_dim=1280,
        )
        padded = jax.tree.map(jnp.asarray, pad_aa_to(data, nl, nr, nb, na))
        poses = jnp.asarray(
            np.asarray(padded.base.lig_pos)[None]
            + rng.randn(P, nl, 3).astype(np.float32)
        )
        t0 = time.time()
        jax.block_until_ready(conf_forward(params, padded, poses))
        compile_s = time.time() - t0
        reps = []
        for _ in range(n_rep):
            t0 = time.time()
            jax.block_until_ready(conf_forward(params, padded, poses))
            reps.append(time.time() - t0)
        steady = float(np.mean(reps))
        return {
            "na": na, "poses": P,
            "chunk": _auto_confidence_chunk(nl, na, P),
            "compile_s": compile_s,
            "steady_s_per_batch": steady,
            "s_per_pose": steady / P,
        }

    return measure


def _measure_conf_stage(args, details, t_start, conf_rows, weights, run_id):
    """Measure the confidence-stage forward at cover buckets (weight
    order): up to ``args.conf_buckets`` not-yet-banked buckets, or — when
    every bucket is already banked — one drift re-measure of the
    top-weight row. Banked as conf_<nl>x<nr> rows; returns the updated
    (nl, nr) -> s_per_pose map."""
    order = sorted(weights, key=lambda e: -weights[e])
    vacant = [e for e in order if (e[0], e[1]) not in conf_rows]
    todo = vacant[: args.conf_buckets]
    refresh = not todo and bool(order) and args.conf_buckets > 0
    if refresh:
        todo = order[:1]
    if not todo:
        return conf_rows
    est_first = 130.0  # measurer build (~15s) + one conf compile + reps
    if time.time() - t_start + est_first > args.budget:
        print("# confidence stage: budget exhausted before first bucket "
              "(headline uses banked/fitted conf costs)", file=sys.stderr)
        return conf_rows
    measure = _make_conf_measurer()
    for entry in todo:
        nl, nr, nb, poses = entry
        if time.time() - t_start + 110.0 > args.budget:
            print(f"# confidence stage: budget exhausted before "
                  f"{nl}x{nr}", file=sys.stderr)
            break
        try:
            r = measure(nl, nr, nb, POSES_PER_COMPLEX, n_rep=args.reps)
        except Exception as e:  # noqa: BLE001 — un-failable artifact
            msg = f"{type(e).__name__}: {e}"[:300]
            print(f"# conf {nl}x{nr} FAILED: {msg}", file=sys.stderr)
            details[f"conf_{nl}x{nr}"] = {
                "bucket": {"nl": nl, "nr": nr, "nb": nb},
                "banked_at": run_id, "error": msg, "anomaly": True,
            }
            continue
        old = conf_rows.get((nl, nr))
        drift = (abs(r["s_per_pose"] - old) / old) if old else None
        conf_rows[(nl, nr)] = r["s_per_pose"]
        details[f"conf_{nl}x{nr}"] = {
            "bucket": {"nl": nl, "nr": nr, "nb": nb},
            "banked_at": run_id,
            "poses": r["poses"],
            "chunk": r["chunk"],
            "compile_s": round(r["compile_s"], 1),
            "steady_s_per_batch": round(r["steady_s_per_batch"], 4),
            "s_per_pose": round(r["s_per_pose"], 5),
            **({"drift_vs_bank": round(drift, 3)} if drift is not None
               else {}),
        }
        print(
            f"# conf {nl}x{nr} (na={r['na']}, P={r['poses']}, "
            f"chunk {r['chunk']}): compile {r['compile_s']:.1f}s, "
            f"{r['s_per_pose'] * 1e3:.1f} ms/pose"
            + (f" (drift {drift * 100:.1f}% vs bank)"
               if drift is not None else ""),
            file=sys.stderr,
        )
        _write_details(details)
    return conf_rows


def _emit_headline(details, measured, quarantined, partial, pocket_time=None,
                   fine_pps=None, banked=None, conf_cost=None):
    """Recompute the weighted plan, update ``details``, and print a
    headline JSON line to stdout (provisional while ``partial``)."""
    total_time, total_poses, filled, mean_pad, banked_filled, conf_s = (
        _weighted_plan(measured, quarantined, banked, conf_cost=conf_cost)
    )
    weighted = total_poses / total_time
    row = {
        "complexes": N_CHURN_COMPLEXES,
        "poses_per_complex": POSES_PER_COMPLEX,
        "total_time_s": round(total_time, 1),
        "poses_per_sec": round(weighted, 3),
        "includes_confidence": conf_cost is not None,
        "measured_buckets": len(measured),
        "model_filled_complexes": filled,
        "banked_filled_complexes": banked_filled,
        "quarantined": [list(e) for e in sorted(quarantined)],
        "mean_cover_padding": round(mean_pad, 3),
        "partial": partial,
    }
    if conf_cost is not None:
        # VERDICT r4 missing #1: the reference's run_times include the
        # confidence-model forward on the final poses; charge for it and
        # keep the score-only number for cross-round continuity
        row["confidence_forward_s"] = round(conf_s, 1)
        row["score_trajectory_s"] = round(total_time - conf_s, 1)
        row["poses_per_sec_score_only"] = round(
            total_poses / (total_time - conf_s), 3
        )
    if partial:
        # a budget-cut / bank-served run must not overwrite the committed
        # COMPLETE-run headline record: rows of different fill provenance
        # would mix across commits (ADVICE r4). The rehearsal row records
        # it instead; the final complete emission clears it.
        details["weighted_rehearsal"] = row
    else:
        details["weighted"] = row
        details.pop("weighted_rehearsal", None)
    line = {
        "metric": "poses_per_sec_weighted",
        "value": round(weighted, 3),
        "unit": "poses/s",
        "vs_baseline": round(weighted / A100_BASELINE_POSES_PER_SEC, 3),
        "includes_confidence": conf_cost is not None,
        "partial": partial,
        "measured_buckets": len(measured),
        "model_filled_complexes": filled,
        "banked_filled_complexes": banked_filled,
    }
    if conf_cost is not None:
        line["poses_per_sec_score_only"] = row["poses_per_sec_score_only"]
    try:
        with open("BENCH_DETAILS.json") as f:
            disk = json.load(f)
    except (FileNotFoundError, ValueError):
        disk = {}
    best_row = details.get("cover_32x320") or disk.get("cover_32x320")
    if best_row and not (best_row.get("error") or best_row.get("anomaly")):
        best = best_row["poses_per_sec"]
        line["best_bucket_poses_per_sec"] = best
        line["best_bucket_vs_baseline"] = round(
            best / A100_BASELINE_POSES_PER_SEC, 3
        )
        if "cover_32x320" not in details:
            line["best_bucket_banked"] = True
    if quarantined:
        line["quarantined_buckets"] = len(quarantined)
    if pocket_time is not None:
        w_pocket = total_poses / pocket_time
        line["weighted_pocket_poses_per_sec"] = round(w_pocket, 3)
    if fine_pps is not None:
        line["weighted_fine_poses_per_sec"] = round(fine_pps, 3)
        line["weighted_fine_vs_baseline"] = round(
            fine_pps / A100_BASELINE_POSES_PER_SEC, 3
        )
    else:
        # a default (cover-only) run still surfaces the warmed-service
        # fine-plan headline banked by an earlier `--fine_plan` run —
        # the best of the banked grids, clearly tagged as banked, with
        # full provenance in BENCH_DETAILS.json
        rows = [disk.get("weighted_fine"), disk.get("weighted_fine_dense")]
        # only surface banked fine rows computed under the SAME headline
        # definition (confidence charged or not) — mixing would overstate
        rows = [
            r for r in rows
            if r and r.get("poses_per_sec")
            and bool(r.get("includes_confidence")) == (conf_cost is not None)
        ]
        fine_row = max(rows, key=lambda r: r["poses_per_sec"], default=None)
        if fine_row:
            line["weighted_fine_poses_per_sec_banked"] = fine_row[
                "poses_per_sec"
            ]
            line["weighted_fine_vs_baseline_banked"] = round(
                fine_row["poses_per_sec"] / A100_BASELINE_POSES_PER_SEC, 3
            )
    print(json.dumps(line), flush=True)
    return weighted


def _write_details(details, drop_prefixes=()):
    # merge-preserve rows measured by other modes (--pocket / --fine /
    # scripts/bench_train.py write into the same artifact);
    # ``drop_prefixes`` clears stale disk rows whose keys this run will
    # not rewrite (fineplan_* keys embed P, which can change with the
    # HBM bounds)
    try:
        with open("BENCH_DETAILS.json") as f:
            disk = json.load(f)
        disk = {
            k: v for k, v in disk.items()
            if not any(k.startswith(p) for p in drop_prefixes)
        }
        details = {**disk, **details}
    except (FileNotFoundError, ValueError):
        pass
    tmp = "BENCH_DETAILS.json.tmp"
    with open(tmp, "w") as f:
        json.dump(details, f, indent=2)
    os.replace(tmp, "BENCH_DETAILS.json")
    return details


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--churn", action="store_true",
                    help="churn accounting only (no chip time)")
    ap.add_argument("--fine", action="store_true",
                    help="also measure the round-2 fine buckets")
    ap.add_argument("--pocket", action="store_true",
                    help="also measure the big cover buckets with the "
                         "reference's crop_beyond pocket compaction and "
                         "report an alternate weighted headline")
    ap.add_argument("--fine_plan", action="store_true",
                    help="also measure the warmed-service fine-ladder "
                         "plan (~38 minimal-padding programs) and report "
                         "weighted_fine (see module docstring)")
    ap.add_argument("--bank_cover", action="store_true",
                    help="skip live cover-bucket measurement and serve the "
                         "cover headline from banked rows (headline stays "
                         "partial) — for --fine_plan banking runs that "
                         "should spend their whole budget on fine programs")
    ap.add_argument("--fine_grid", choices=("default", "dense"),
                    default="default",
                    help="with --fine_plan: which fine grid to plan on — "
                         "'dense' uses the ~1.2x-spaced rungs (~85 "
                         "programs, x1.29 mean padding; "
                         "bucket_ladder='fine_dense') and banks "
                         "weighted_fine_dense")
    ap.add_argument("--steps", type=int, default=STEPS)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--budget", type=float,
                    default=float(os.environ.get("BENCH_BUDGET_S", 1500)),
                    help="total wall-clock budget (s); buckets that would "
                         "exceed it are cost-model-filled")
    ap.add_argument("--anomaly_factor", type=float, default=5.0,
                    help="quarantine a bucket whose first post-compile "
                         "batch exceeds this multiple of its cost model")
    ap.add_argument("--no_confidence", action="store_true",
                    help="do NOT charge the headline for the confidence "
                         "re-ranking stage (score trajectory only — the "
                         "pre-round-5 definition)")
    ap.add_argument("--conf_buckets", type=int, default=2,
                    help="measure the confidence forward at this many "
                         "not-yet-banked cover buckets per run (weight "
                         "order, budget-gated); if all are banked, "
                         "re-measure the top-weight one for drift")
    ap.add_argument("--bank_refresh_k", type=int, default=2,
                    help="re-measure this many top-weight BANKED fineplan "
                         "programs per run (drift audit; >10%% drift "
                         "demotes the row); 0 disables")
    args = ap.parse_args()
    t_start = time.time()
    # provenance stamp for every row this run banks (bank-freshness
    # audit, VERDICT r4 ask #4): rows record WHICH run measured them
    run_id = time.strftime("%Y-%m-%dT%H:%M:%S")

    # Enable the persistent cache BEFORE the first jit (model.init inside
    # _make_pipeline) so the init program is cached too, not just the dock
    # programs that DockingPipeline compiles after enabling it itself.
    if not args.churn:
        from diffdock_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()
        _enable_cache_logging()

    details = {"churn": run_churn()}
    if args.churn:
        details = _write_details(details)
        print(json.dumps(details["churn"]))
        return

    from diffdock_tpu.inference.ladder import modeled_batch_seconds

    # dense-grid fine pipeline: the dense rungs are a superset of every
    # bucket this tool measures (cover v3 entries, both fine plans, the
    # pocket ladder), so synthetic complexes built AT a bucket's exact
    # sizes pad to themselves and the measured program is exactly the
    # requested one. The ladder mode only affects padding choice; the
    # compiled program for given padded shapes is identical across modes,
    # so cache entries and banked rows transfer.
    pipeline = _make_pipeline(args.steps, dense=True)

    order, weights = _churn_weight_order()
    banked = _banked_steady(args.steps)
    if banked:
        print(f"# banked fill available for {len(banked)} buckets "
              f"(earlier runs' BENCH_DETAILS.json)", file=sys.stderr)
    measured, quarantined, skipped_budget = {}, set(), []
    # compile-time estimate for the budget gate: median of recent observed
    # compiles (adaptive — the first program of a fresh process pays
    # one-time backend/table setup that later programs don't, so a
    # max-ever estimate would starve the gate after one big cold compile),
    # bounded below per-bucket by the worst banked cold compile while the
    # run looks cold (_est_compile_s, ADVICE r4). The first bucket is
    # always measured.
    compile_hist = [120.0]
    raw_compiles = []
    banked_compile = _banked_compile()
    # confidence re-ranking charge (VERDICT r4 missing #1): banked conf_*
    # rows seed the per-pose cost fn now; the conf stage below live-
    # measures/refreshes within budget and the final emission re-derives
    conf_rows = {} if args.no_confidence else _banked_conf()
    conf_cost = None if args.no_confidence else _conf_cost_fn(conf_rows)
    if conf_rows:
        print(f"# confidence costs banked for {len(conf_rows)} buckets",
              file=sys.stderr)
    if args.bank_cover and banked:
        print(f"# --bank_cover: cover headline served from "
              f"{len(banked)} banked buckets", file=sys.stderr)
        _emit_headline(details, measured, quarantined, partial=True,
                       banked=banked, conf_cost=conf_cost)
        order = []
    for k, entry in enumerate(order):
        nl, nr, nb, poses = entry
        model_s = modeled_batch_seconds(nl, nr, poses)
        est_compile = _est_compile_s(
            entry, compile_hist, raw_compiles, banked_compile
        )
        est_bucket = est_compile + (args.reps + 1) * model_s
        elapsed = time.time() - t_start
        if k > 0 and elapsed + est_bucket > args.budget:
            skipped_budget.append(entry)
            continue
        r = _bench_bucket_safe(
            pipeline, nl, nr, nb, poses,
            n_rep=args.reps, anomaly_factor=args.anomaly_factor,
        )
        if "error" not in r:
            compile_hist.append(max(60.0, r["compile_s"]))
            raw_compiles.append(r["compile_s"])
        tag = ""
        if r["anomaly"]:
            quarantined.add(entry)
            tag = (f"  ** ANOMALY: {r['steady_s_per_batch'] / r['model_s_per_batch']:.0f}x "
                   f"cost model -> quarantined **")
        else:
            measured[entry] = r["steady_s_per_batch"]
        print(
            f"# cover bucket nl={nl} nr={nr} nb={nb} P={poses} "
            f"(weight {weights[entry]:.0f}s): compile {r['compile_s']:.1f}s, "
            f"steady {r['steady_s_per_batch']:.2f}s/batch -> "
            f"{r['poses_per_sec']:.2f} poses/s{tag}", file=sys.stderr,
        )
        _guard_banked_row(details, f"cover_{nl}x{nr}", {
            "bucket": {"nl": nl, "nr": nr, "nb": nb},
            "banked_at": run_id,
            "poses_in_flight": poses,
            "steps": args.steps,
            "compile_s": round(r["compile_s"], 1),
            "steady_s_per_batch": round(r["steady_s_per_batch"], 3),
            "poses_per_sec": round(r["poses_per_sec"], 3),
            "churn_weight_s": round(weights[entry], 1),
            **({"anomaly": True} if r["anomaly"] else {}),
            **({"error": r["error"]} if "error" in r else {}),
        }, run_id)
        last_bucket = k == len(order) - 1
        # stays provisional while later modes (--pocket/--fine_plan) will
        # still extend the headline line's field set
        more_modes = args.pocket or args.fine_plan or args.fine
        _emit_headline(
            details, measured, quarantined,
            partial=not (last_bucket and not skipped_budget
                         and not more_modes),
            banked=banked, conf_cost=conf_cost,
        )
        _write_details(details)

    if args.bank_refresh_k > 0:
        refreshed = _refresh_fine_bank(
            pipeline, details, args, t_start, compile_hist, raw_compiles,
            banked_compile, run_id, args.bank_refresh_k,
        )
        if refreshed:
            # the bucket->steady map was loaded before the cover loop;
            # refreshed/demoted rows must reach the FINAL authoritative
            # headline too, not just the disk artifact (r5 review)
            banked = _banked_steady(args.steps)

    if not args.no_confidence:
        _, weights_all = _churn_weight_order()
        conf_rows = _measure_conf_stage(
            args, details, t_start, conf_rows, weights_all, run_id,
        )
        conf_cost = _conf_cost_fn(conf_rows)

    if skipped_budget:
        print(
            f"# budget {args.budget:.0f}s: skipped "
            f"{len(skipped_budget)} low-weight buckets "
            f"({'bank' if banked else 'cost-model'}-filled): "
            + ", ".join(f"{e[0]}x{e[1]}" for e in skipped_budget),
            file=sys.stderr,
        )
    # written unconditionally: _write_details merges disk-first, so a
    # complete run must overwrite a previous budget-cut run's list
    details["skipped_for_budget"] = [list(e) for e in skipped_budget]

    pocket_time = None
    if args.pocket:
        # Alternate headline: big receptors (NR > POCKET_CAPACITY) run with
        # the reference's own crop_beyond approximation realized as in-jit
        # gather-compaction (PERF.md "Pocket compaction"). Same plan as the
        # default headline for every other bucket. Opt-in because
        # crop_beyond is not part of the reference default recipe.
        from diffdock_tpu.inference.ladder import COVER_LADDER

        ppipe = _make_pipeline(args.steps, pocket=True, dense=True)
        pocket_measured = dict(measured)
        for nl, nr, nb, poses in COVER_LADDER:
            if nr <= POCKET_CAPACITY:
                continue
            est = _est_compile_s(
                (nl, nr), compile_hist, raw_compiles, banked_compile
            ) + (args.reps + 1) * modeled_batch_seconds(nl, nr, poses)
            if time.time() - t_start + est > args.budget:
                print(f"# budget: skipped pocket bucket {nl}x{nr}",
                      file=sys.stderr)
                continue
            r = _bench_bucket_safe(
                ppipe, nl, nr, nb, poses,
                n_rep=args.reps, anomaly_factor=args.anomaly_factor,
            )
            if "error" not in r:
                compile_hist.append(max(60.0, r["compile_s"]))
                raw_compiles.append(r["compile_s"])
            if not r["anomaly"]:
                pocket_measured[(nl, nr, nb, poses)] = r[
                    "steady_s_per_batch"
                ]
            print(
                f"# pocket bucket nl={nl} nr={nr} P={poses} "
                f"(crop {POCKET_CROP_BEYOND}, cap {POCKET_CAPACITY}): "
                f"compile {r['compile_s']:.1f}s, steady "
                f"{r['steady_s_per_batch']:.2f}s/batch -> "
                f"{r['poses_per_sec']:.2f} poses/s", file=sys.stderr,
            )
            details[f"pocket_{nl}x{nr}"] = {
                "bucket": {"nl": nl, "nr": nr, "nb": nb},
                "banked_at": run_id,
                "poses_in_flight": poses,
                "steps": args.steps,
                "crop_beyond": POCKET_CROP_BEYOND,
                "pocket_capacity": POCKET_CAPACITY,
                "compile_s": round(r["compile_s"], 1),
                "steady_s_per_batch": round(r["steady_s_per_batch"], 3),
                "poses_per_sec": round(r["poses_per_sec"], 3),
                **({"anomaly": True} if r["anomaly"] else {}),
                **({"error": r["error"]} if "error" in r else {}),
            }
        pocket_time, total_poses, p_filled, _, _, _ = _weighted_plan(
            pocket_measured, quarantined, banked, conf_cost=conf_cost
        )
        w_pocket = total_poses / pocket_time
        details["weighted_pocket"] = {
            "complexes": N_CHURN_COMPLEXES,
            "poses_per_complex": POSES_PER_COMPLEX,
            "total_time_s": round(pocket_time, 1),
            "poses_per_sec": round(w_pocket, 3),
            "crop_beyond": POCKET_CROP_BEYOND,
            "pocket_capacity": POCKET_CAPACITY,
            "model_filled_complexes": p_filled,
        }
        print(
            f"# weighted (pocket compaction on NR>{POCKET_CAPACITY}): "
            f"{total_poses} poses in {pocket_time:.0f}s -> {w_pocket:.2f} "
            f"poses/s", file=sys.stderr,
        )

    if args.fine_plan:
        # warmed-service plan: minimal-padding fine buckets, measured in
        # descending plan-weight order with incremental banking so a cut
        # run still lands a mostly-measured number
        dense = args.fine_grid == "dense"
        plan = fine_plan(dense=dense)
        fpipe = pipeline  # dense rungs cover both grids' programs
        f_order = sorted(
            plan,
            key=lambda e: -len(plan[e])
            * -(-POSES_PER_COMPLEX // e[3])
            * modeled_batch_seconds(e[0], e[1], e[3]),
        )
        # seed from fineplan_* rows banked by earlier runs (the SAME
        # compiled program regardless of which grid's plan requested it;
        # rows are content-matched on (bucket, P), not key format) —
        # measurement accumulates across runs, like the pose caches
        banked_fine = _banked_fineplan()
        fine_measured = {
            e: banked_fine[e] for e in f_order if e in banked_fine
        }
        if fine_measured:
            print(f"# fine plan: {len(fine_measured)}/{len(plan)} programs "
                  f"pre-filled from banked runs", file=sys.stderr)
        fine_anomalies = []
        n_seeded = len(fine_measured)
        w_key = "weighted_fine_dense" if dense else "weighted_fine"

        def _update_weighted_fine():
            # incremental: banked + live measurements, model fill for the
            # unmeasured tail
            f_time, f_conf, f_filled, f_pad = 0.0, 0.0, 0, []
            for e, members in plan.items():
                t = fine_measured.get(
                    e, modeled_batch_seconds(e[0], e[1], e[3])
                )
                if e not in fine_measured:
                    f_filled += len(members)
                batches = -(-POSES_PER_COMPLEX // e[3])
                f_time += len(members) * batches * t
                if conf_cost is not None:
                    # same per-complex confidence charge as the cover
                    # headline, at this plan's (smaller) padded buckets
                    cc = (len(members) * POSES_PER_COMPLEX
                          * conf_cost(e[0], e[1]))
                    f_conf += cc
                    f_time += cc
                f_pad += [
                    (e[0] * e[1]) / (c[0] * c[1]) for c in members
                ]
            total_poses_fine = POSES_PER_COMPLEX * sum(
                len(m) for m in plan.values()
            )
            details[w_key] = {
                "complexes": N_CHURN_COMPLEXES,
                "poses_per_complex": POSES_PER_COMPLEX,
                "total_time_s": round(f_time, 1),
                "poses_per_sec": round(total_poses_fine / f_time, 3),
                "includes_confidence": conf_cost is not None,
                **({"confidence_forward_s": round(f_conf, 1)}
                   if conf_cost is not None else {}),
                "grid": args.fine_grid,
                "programs": len(plan),
                "measured_programs": len(fine_measured),
                "banked_programs": n_seeded,
                "model_filled_complexes": f_filled,
                "mean_fine_padding": round(float(np.mean(f_pad)), 3),
                "anomalies": fine_anomalies,
            }
            _write_details(details)

        if fine_measured:
            _update_weighted_fine()
        for entry in f_order:
            if entry in fine_measured:
                continue
            nl, nr, nb, poses = entry
            est = _est_compile_s(
                entry, compile_hist, raw_compiles, banked_compile
            ) + (args.reps + 1) * modeled_batch_seconds(nl, nr, poses)
            if time.time() - t_start + est > args.budget:
                print(f"# budget: stopping fine plan before {nl}x{nr}",
                      file=sys.stderr)
                break
            r = _bench_bucket_safe(
                fpipe, nl, nr, nb, poses,
                n_rep=args.reps, anomaly_factor=args.anomaly_factor,
            )
            if "error" not in r:
                compile_hist.append(max(60.0, r["compile_s"]))
                raw_compiles.append(r["compile_s"])
            if r["anomaly"]:
                fine_anomalies.append(list(entry))
            else:
                fine_measured[entry] = r["steady_s_per_batch"]
            print(
                f"# fine-plan bucket nl={nl} nr={nr} nb={nb} P={poses} "
                f"({len(plan[entry])} complexes): compile "
                f"{r['compile_s']:.1f}s, steady "
                f"{r['steady_s_per_batch']:.2f}s/batch -> "
                f"{r['poses_per_sec']:.2f} poses/s", file=sys.stderr,
            )
            _guard_banked_row(details, f"fineplan_{nl}x{nr}x{nb}_p{poses}", {
                "bucket": {"nl": nl, "nr": nr, "nb": nb},
                "banked_at": run_id,
                "poses_in_flight": poses,
                "complexes_served": len(plan[entry]),
                "compile_s": round(r["compile_s"], 1),
                "steady_s_per_batch": round(r["steady_s_per_batch"], 3),
                "poses_per_sec": round(r["poses_per_sec"], 3),
                **({"anomaly": True} if r["anomaly"] else {}),
                **({"error": r["error"]} if "error" in r else {}),
            }, run_id)
            _update_weighted_fine()
        if w_key in details:
            print(
                f"# weighted (fine plan, warmed service, "
                f"{args.fine_grid} grid): "
                f"{details[w_key]['poses_per_sec']} poses/s over "
                f"{details[w_key]['programs']} programs "
                f"(x{details[w_key]['mean_fine_padding']} mean "
                f"padding)", file=sys.stderr,
            )
        else:
            print("# fine plan: budget exhausted before any bucket "
                  "measured", file=sys.stderr)

    if args.fine:
        for name, nl, nr, nb, poses in (
            ("medium_fine", 64, 1024, 16, 16), ("large_fine", 96, 2304, 32, 8)
        ):
            r = _bench_bucket_safe(pipeline, nl, nr, nb, poses,
                                   n_rep=args.reps)
            print(
                f"# {name} nl={nl} nr={nr} P={poses}: "
                f"{r['poses_per_sec']:.2f} poses/s", file=sys.stderr,
            )
            details[name] = {
                "bucket": {"nl": nl, "nr": nr, "nb": nb},
                "banked_at": run_id,
                "poses_in_flight": poses,
                "compile_s": round(r["compile_s"], 1),
                "steady_s_per_batch": round(r["steady_s_per_batch"], 3),
                "poses_per_sec": round(r["poses_per_sec"], 3),
            }

    # final (authoritative) line: partial if the budget cut the tail or
    # the cover plan was served from the bank instead of live
    final_partial = bool(skipped_budget) or args.bank_cover
    _emit_headline(
        details, measured, quarantined,
        partial=final_partial,
        conf_cost=conf_cost,
        pocket_time=pocket_time,
        fine_pps=(
            details[
                "weighted_fine_dense" if args.fine_grid == "dense"
                else "weighted_fine"
            ]["poses_per_sec"]
            if args.fine_plan
            and ("weighted_fine_dense" if args.fine_grid == "dense"
                 else "weighted_fine") in details
            else None
        ),
        banked=banked,
    )
    # a complete run also clears any stale rehearsal row left on disk by
    # an earlier budget-cut run (the in-memory pop alone can't: the write
    # merges disk-first)
    _write_details(
        details,
        drop_prefixes=() if final_partial else ("weighted_rehearsal",),
    )
    print("# wrote BENCH_DETAILS.json", file=sys.stderr)


if __name__ == "__main__":
    main()
