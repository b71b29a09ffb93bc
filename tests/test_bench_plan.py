"""Host-side logic of bench.py's un-failable artifact flow (VERDICT r3
ask #1): weight ordering, cost-model fill, quarantine re-routing, and
incremental headline emission — all testable without a chip."""

import json

import bench
from diffdock_tpu.inference.ladder import (
    COVER_LADDER,
    HBM_AREA_BOUND,
    fine_hbm_poses,
    fine_plan,
    modeled_batch_seconds,
    pdbbind_like_sizes,
)


def test_fine_hbm_poses_is_safe_and_maximal():
    from diffdock_tpu.inference.ladder import HBM_POSE_NR_BOUND

    def safe(p, nl, nr):
        return (p * nl * nr <= HBM_AREA_BOUND
                and p * nr <= HBM_POSE_NR_BOUND)

    for nl, nr in [(16, 128), (32, 320), (96, 2304), (128, 3072),
                   (16, 2304), (24, 1536), (48, 1024)]:
        p = fine_hbm_poses(nl, nr)
        assert 40 % p == 0
        assert p == 1 or safe(p, nl, nr)
        # maximal: the next-larger ladder entry would exceed a bound
        larger = [q for q in (40, 20, 10, 8, 5, 4, 2) if q > p]
        if larger:
            assert not safe(min(larger), nl, nr)
    assert fine_hbm_poses(96, 2304) == 8  # the bench-proven flagship point
    # the on-chip OOM regression: P=40 at NR=2304 exceeded HBM; the
    # receptor-side bound caps it at the chip-proven P*NR point
    assert fine_hbm_poses(16, 2304) == 20


def test_pipeline_fine_chunk_caps_at_hbm_bound():
    """dock_complex's fine-mode default chunk (and effective_pose_chunk)
    must cap poses-in-flight at the HBM-proven bound; small complexes are
    unaffected."""
    from diffdock_tpu.inference.pipeline import DockingPipeline

    pipe = DockingPipeline.__new__(DockingPipeline)  # logic-only probe
    pipe.mesh = None
    assert pipe._fine_hbm_chunk(16, 128) == 40
    assert pipe._fine_hbm_chunk(96, 2304) == 8

    class FakeMesh:
        size = 4

    pipe.mesh = FakeMesh()
    assert pipe._fine_hbm_chunk(96, 2304) == 32  # per-chip bound x mesh


def test_fine_plan_covers_every_complex_hbm_safe():
    sizes = pdbbind_like_sizes()
    plan = fine_plan(sizes)
    assert sum(len(m) for m in plan.values()) == len(sizes)
    from diffdock_tpu.inference.ladder import HBM_POSE_NR_BOUND

    for (nl, nr, nb, poses), members in plan.items():
        assert poses * nl * nr <= HBM_AREA_BOUND
        assert poses * nr <= HBM_POSE_NR_BOUND
        assert 40 % poses == 0  # whole batches for the 40-pose recipe
        for nl_c, nr_c in members:
            assert nl_c <= nl and nr_c <= nr
    # the fine plan pads strictly less than the cover plan on average
    cover_pad = []
    fine_pad = []
    from diffdock_tpu.inference.ladder import cover_bucket

    for nl_c, nr_c in sizes:
        cov = cover_bucket(nl_c, nr_c, max(1, nl_c // 4))
        cover_pad.append(cov[0] * cov[1] / (nl_c * nr_c))
    for e, members in plan.items():
        fine_pad += [e[0] * e[1] / (c[0] * c[1]) for c in members]
    assert sum(fine_pad) / len(fine_pad) < sum(cover_pad) / len(cover_pad)


def test_weight_order_covers_ladder_and_descends():
    order, weights = bench._churn_weight_order()
    assert sorted(order) == sorted(COVER_LADDER)
    w = [weights[e] for e in order]
    assert w == sorted(w, reverse=True)
    # the head of the order carries most of the plan: measuring the top
    # half under a budget cut must cover >=60% of the modeled plan time
    # (ladder v3's lower padding spreads weight more evenly than v2's
    # 76%-at-half — 64% at half; flatter is the price of less padding)
    assert sum(w[: len(w) // 2]) >= 0.6 * sum(w)


def test_weighted_plan_model_fill_and_measured_agree():
    # with NO measurements the plan is fully model-filled ...
    t_model, poses, filled, pad, _, _ = bench._weighted_plan({}, set())
    assert poses == 150 * 40
    assert filled == 150
    assert pad > 1.0
    # ... and equals the plan where every bucket is "measured" at exactly
    # its model value
    measured = {
        e: modeled_batch_seconds(e[0], e[1], e[3]) for e in COVER_LADDER
    }
    t_meas, _, filled2, _, _, _ = bench._weighted_plan(measured, set())
    assert filled2 == 0
    assert abs(t_meas - t_model) < 1e-9


def test_weighted_plan_banked_fill_beats_model_fill():
    """Buckets a budget-cut run did not measure fall back to banked
    per-bucket steady times (earlier runs' BENCH_DETAILS.json) before
    the cost model — and the banked/model fill counts report it."""
    banked = {
        e: modeled_batch_seconds(e[0], e[1], e[3]) for e in COVER_LADDER
    }
    t_b, poses, filled, _, banked_filled, _ = bench._weighted_plan(
        {}, set(), banked
    )
    assert filled == 0 and banked_filled == 150
    # live measurement wins over banked
    live_entry = COVER_LADDER[0]
    measured = {live_entry: 0.5 * banked[live_entry]}
    t_m, _, _, _, bf2, _ = bench._weighted_plan(measured, set(), banked)
    assert t_m < t_b and bf2 < 150
    # a quarantined entry is never filled from the bank
    t_q, _, _, _, _, _ = bench._weighted_plan({}, {live_entry}, banked)
    assert t_q > t_b


def test_weighted_plan_quarantine_reroutes_and_costs_more():
    measured = {
        e: modeled_batch_seconds(e[0], e[1], e[3]) for e in COVER_LADDER
    }
    t0, _, _, _, _, _ = bench._weighted_plan(measured, set())
    bad = (16, 640, 16, 40)  # small-ligand express lane (cf. the round-3 16x704 anomaly)
    t1, _, _, _, _, _ = bench._weighted_plan(measured, {bad})
    # re-routing to the next covering entry is slower but bounded
    assert t0 < t1 < 1.25 * t0


def test_weighted_plan_survives_total_quarantine():
    """Quarantining EVERY cover entry must not crash the artifact: the
    plan falls back to each complex's fine bucket (the pipeline's own
    cov=None behavior)."""
    t, poses, filled, pad, _, _ = bench._weighted_plan({}, set(COVER_LADDER))
    assert poses == 150 * 40
    assert filled == 150
    assert t > 0 and pad >= 1.0
    # the fine-bucket fallback pads less than the cover plan
    _, _, _, cover_pad, _, _ = bench._weighted_plan({}, set())
    assert pad < cover_pad


def test_anomaly_env_does_not_override_explicit_arg(monkeypatch):
    """Explicit anomaly_guard arg > DIFFDOCK_TPU_ANOMALY_FACTOR env >
    backend default (construction compiles nothing, so this is cheap)."""
    from diffdock_tpu.diffusion.so3 import SO3Config, get_so3_tables
    from diffdock_tpu.diffusion.torus import TorusConfig, get_torus_tables
    from diffdock_tpu.inference.pipeline import DockingPipeline
    from diffdock_tpu.inference.sampler import SamplerConfig
    from diffdock_tpu.models.config import ScoreModelConfig

    so3 = get_so3_tables(SO3Config(n_eps=64, x_n=256, l_max=512))
    torus = get_torus_tables(TorusConfig(x_n=256, sigma_n=128,
                                         mc_samples=2000))
    cfg = ScoreModelConfig(ns=8, nv=2, num_conv_layers=1,
                           num_prot_emb_layers=0)
    kw = dict(so3_tables=so3, torus_tables=torus)
    sampler = SamplerConfig(inference_steps=2, actual_steps=2)

    monkeypatch.setenv("DIFFDOCK_TPU_ANOMALY_FACTOR", "7.5")
    assert DockingPipeline(cfg, {}, sampler, anomaly_guard=3.0,
                           **kw).anomaly_guard == 3.0
    assert DockingPipeline(cfg, {}, sampler, anomaly_guard=0.0,
                           **kw).anomaly_guard == 0.0  # explicit disable
    assert DockingPipeline(cfg, {}, sampler, **kw).anomaly_guard == 7.5
    monkeypatch.delenv("DIFFDOCK_TPU_ANOMALY_FACTOR")
    # backend default: 0.0 on CPU (the cost model is chip-specific)
    assert DockingPipeline(cfg, {}, sampler, **kw).anomaly_guard == 0.0


def test_emit_headline_partial_line(capsys):
    details = {}
    measured = {COVER_LADDER[0]: 1.0}
    bench._emit_headline(details, measured, set(), partial=True)
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["metric"] == "poses_per_sec_weighted"
    assert line["partial"] is True
    assert line["value"] > 0
    assert line["measured_buckets"] == 1
    # a partial emission records the rehearsal row, NOT the committed
    # complete-run headline record (ADVICE r4: provenance must not mix)
    assert "weighted" not in details
    assert details["weighted_rehearsal"]["partial"] is True
    # once 32x320 is in details the continuity field appears, and a full
    # measurement set emits partial=false
    details["cover_32x320"] = {"poses_per_sec": 20.0}
    measured = {
        e: modeled_batch_seconds(e[0], e[1], e[3]) for e in COVER_LADDER
    }
    bench._emit_headline(details, measured, set(), partial=False)
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["partial"] is False
    assert line["best_bucket_poses_per_sec"] == 20.0
    assert line["model_filled_complexes"] == 0
    # the complete emission writes the committed record and clears the
    # in-memory rehearsal row
    assert details["weighted"]["partial"] is False
    assert "weighted_rehearsal" not in details


def test_est_compile_gate_bounded_by_banked_worst_when_cold():
    """ADVICE r4 (medium): the adaptive median underestimated a 515 s
    cold compile >3x. In the cold regime the gate must take the worst
    banked compile for the SAME bucket; once recent observed compiles are
    cache-load fast, the worst-ever bound would starve the gate and must
    NOT apply."""
    entry = (56, 384, 16, 40)
    banked = {(56, 384): 515.0}
    # cold: no observed compile yet
    est = bench._est_compile_s(entry, [120.0], [], banked)
    assert est == 515.0
    # still cold: last observed compile was a real (slow) compile
    est = bench._est_compile_s(entry, [120.0, 118.0], [118.0], banked)
    assert est == 515.0
    # warm: recent compiles were persistent-cache loads
    est = bench._est_compile_s(entry, [120.0, 60.0, 60.0], [8.0, 9.0],
                               banked)
    assert est < 100.0
    # unknown bucket: adaptive estimate regardless
    est = bench._est_compile_s((32, 320, 16, 40), [120.0], [], banked)
    assert est == 1.2 * 120.0


def test_bank_refresh_demotes_stale_row(tmp_path, monkeypatch, capsys):
    """VERDICT r4 ask #4: a banked fineplan row whose re-measurement
    drifts >10% is overwritten with the fresh value and flagged; a
    fresh-within-tolerance row gains drift provenance only."""
    import argparse
    import time as _time

    rows = {
        "fineplan_32x320x8_p40": {
            "bucket": {"nl": 32, "nr": 320, "nb": 8},
            "poses_in_flight": 40, "complexes_served": 30,
            "compile_s": 100.0, "steady_s_per_batch": 2.0,
            "poses_per_sec": 20.0,
        },
        "fineplan_16x192x4_p40": {
            "bucket": {"nl": 16, "nr": 192, "nb": 4},
            "poses_in_flight": 40, "complexes_served": 5,
            "compile_s": 80.0, "steady_s_per_batch": 1.0,
            "poses_per_sec": 40.0,
        },
    }
    monkeypatch.chdir(tmp_path)
    (tmp_path / "BENCH_DETAILS.json").write_text(json.dumps(rows))

    def fake_bench(pipeline, nl, nr, nb, poses, **kw):
        # top-weight row (32x320) drifts 2.0 -> 3.0 (+50%); the other
        # would be fresh, but k=1 must only re-measure the top row
        return {"poses_per_sec": poses / 3.0, "steady_s_per_batch": 3.0,
                "compile_s": 9.0, "anomaly": False,
                "model_s_per_batch": 2.0}

    monkeypatch.setattr(bench, "_bench_bucket", fake_bench)
    args = argparse.Namespace(reps=2, budget=1e9, anomaly_factor=5.0)
    details = {}
    drifts = bench._refresh_fine_bank(
        None, details, args, _time.time(), [120.0], [], {}, "run-X", k=1,
    )
    assert len(drifts) == 1
    assert drifts[0]["key"] == "fineplan_32x320x8_p40"
    assert drifts[0]["demoted"] is True
    row = details["fineplan_32x320x8_p40"]
    assert row["steady_s_per_batch"] == 3.0      # demoted = overwritten
    assert row["demoted_stale_value"] == 2.0
    assert row["drift_vs_bank"] == 0.5
    assert row["banked_at"] == "run-X"
    assert row["complexes_served"] == 30         # provenance fields kept
    assert "DEMOTED" in capsys.readouterr().err
    # the audit summary landed on disk for the artifact
    disk = json.loads((tmp_path / "BENCH_DETAILS.json").read_text())
    assert disk["bank_refresh"]["rows"][0]["demoted"] is True
    assert "fineplan_16x192x4_p40" in disk  # untouched row survives merge
    # r5 review: main() reloads the bucket->steady fill map after a
    # non-empty refresh, so the FINAL headline serves the demoted row's
    # fresh value — the map a reload yields must carry it
    fresh = bench._banked_steady(bench.STEPS)
    assert fresh[(32, 320, 8, 40)] == 3.0
    assert fresh[(16, 192, 4, 40)] == 1.0  # untouched row still served


def test_bench_bucket_safe_records_failure(monkeypatch):
    """A bucket that raises (e.g. HBM OOM through the remote-compile
    tunnel) must come back as a JSON-safe quarantined row, not kill the
    artifact run."""
    import json as _json

    def boom(*a, **k):
        raise RuntimeError("XLA:TPU compile permanent error. Ran out of "
                           "memory in memory space hbm.")

    monkeypatch.setattr(bench, "_bench_bucket", boom)
    r = bench._bench_bucket_safe(None, 16, 2304, 8, 40)
    assert r["anomaly"] is True
    assert "hbm" in r["error"]
    _json.dumps(r)  # JSON-safe (no inf/nan sentinels)


def test_conf_cost_fn_exact_fit_and_seed():
    """Per-pose confidence cost: exact banked row first; a live lstsq fit
    over >=3 rows for unmeasured buckets; the probe-seeded fit when the
    bank is thin; never below the dispatch floor."""
    # thin bank -> seeded fit reproduces the probe points it was fit to
    cost = bench._conf_cost_fn({})
    assert abs(cost(32, 384) - 0.02024) < 2e-3
    assert abs(cost(96, 2304) - 0.34425) < 2e-2
    # tiny bucket would extrapolate negative -> floored
    assert cost(8, 16) == bench._CONF_FLOOR_S

    # exact row wins over any fit
    rows = {(32, 384): 0.05, (16, 640): 0.06, (96, 2304): 0.5}
    cost = bench._conf_cost_fn(rows)
    assert cost(32, 384) == 0.05
    # unmeasured bucket comes from the live fit over the 3 rows (well
    # away from the seeded values)
    assert cost(40, 704) > 0.03


def test_weighted_plan_charges_confidence():
    measured = {
        e: modeled_batch_seconds(e[0], e[1], e[3]) for e in COVER_LADDER
    }
    t0, poses, _, _, _, c0 = bench._weighted_plan(measured, set())
    assert c0 == 0.0
    flat = lambda nl, nr: 0.01  # 10 ms/pose everywhere
    t1, _, _, _, _, c1 = bench._weighted_plan(
        measured, set(), conf_cost=flat
    )
    # 150 complexes x 40 poses x 10 ms = 60 s, additive
    assert abs(c1 - 60.0) < 1e-6
    assert abs(t1 - (t0 + 60.0)) < 1e-6


def test_emit_headline_confidence_fields(capsys):
    measured = {
        e: modeled_batch_seconds(e[0], e[1], e[3]) for e in COVER_LADDER
    }
    details = {}
    bench._emit_headline(details, measured, set(), partial=False,
                         conf_cost=lambda nl, nr: 0.01)
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["includes_confidence"] is True
    row = details["weighted"]
    assert row["includes_confidence"] is True
    assert row["confidence_forward_s"] == 60.0
    # the score-only continuity number is the pre-round-5 definition
    assert row["poses_per_sec_score_only"] > row["poses_per_sec"]
    assert line["poses_per_sec_score_only"] == row["poses_per_sec_score_only"]
    # and without conf_cost the fields are absent / flagged false
    details2 = {}
    bench._emit_headline(details2, measured, set(), partial=False)
    line2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line2["includes_confidence"] is False
    assert "confidence_forward_s" not in details2["weighted"]


def test_guard_banked_row_protects_clean_bank(tmp_path, monkeypatch):
    """r5 rehearsal finding: one loaded-host tunnel glitch error-rowed 9
    clean cover rows in a single run, which would have starved the next
    run's bank fill. A failed/anomalous attempt must keep the clean row
    (recording the attempt on it); clean measurements still overwrite."""
    monkeypatch.chdir(tmp_path)
    clean = {"bucket": {"nl": 48, "nr": 256, "nb": 16},
             "poses_in_flight": 40, "steady_s_per_batch": 2.06,
             "poses_per_sec": 19.42}
    (tmp_path / "BENCH_DETAILS.json").write_text(
        json.dumps({"cover_48x256": clean}))

    # error attempt -> prior kept + attempt recorded
    details = {}
    bad = {"bucket": clean["bucket"], "steady_s_per_batch": 0.0,
           "poses_per_sec": 0.0, "anomaly": True,
           "error": "ValueError: tunnel glitch"}
    bench._guard_banked_row(details, "cover_48x256", bad, "run-Y")
    row = details["cover_48x256"]
    assert row["steady_s_per_batch"] == 2.06
    assert row["last_failed_attempt"]["run"] == "run-Y"
    assert "tunnel glitch" in row["last_failed_attempt"]["error"]

    # anomalous (no error) attempt -> same protection, anomaly recorded
    details2 = {}
    anom = {"bucket": clean["bucket"], "steady_s_per_batch": 55.0,
            "poses_per_sec": 0.7, "anomaly": True}
    bench._guard_banked_row(details2, "cover_48x256", anom, "run-Z")
    assert details2["cover_48x256"]["steady_s_per_batch"] == 2.06
    assert details2["cover_48x256"]["last_failed_attempt"][
        "anomalous_steady_s"] == 55.0

    # clean measurement still overwrites (and clears the attempt field)
    good = {"bucket": clean["bucket"], "poses_in_flight": 40,
            "steady_s_per_batch": 2.10, "poses_per_sec": 19.0}
    bench._guard_banked_row(details, "cover_48x256", good, "run-W")
    assert details["cover_48x256"] == good

    # no clean prior anywhere -> the bad row lands (evidence preserved)
    details3 = {}
    bench._guard_banked_row(details3, "cover_99x999", bad, "run-Y")
    assert details3["cover_99x999"] is bad


def test_cache_logging_survives_short_tracing_cache_keys():
    """r5: jax's cache-miss explainer unpacks keys as (tree, dbg, qdd,
    *_) but a lax.scan body's key carries only (avals, dbg) — with
    jax_explain_cache_misses on, the SECOND shape traced for a stable
    scan body raised inside the user's trace and error-rowed 9 cover
    buckets. _enable_cache_logging must wrap the differ to degrade
    gracefully."""
    bench._enable_cache_logging()
    from jax._src.interpreters import partial_eval as pe

    assert getattr(pe.diff_tracing_cache_keys, "_ddt_safe", False)
    # the malformed (scan-style) key form that crashed: middle has 2 elts
    bad_new = ("ctx", ("avals", "dbg"), ())
    bad_old = ("ctx", ("avals2", "dbg2"), ())
    out = pe.diff_tracing_cache_keys(bad_new, bad_old)
    assert out[-1].startswith("cache miss explanation unavailable")
    # idempotent: re-enabling must not double-wrap
    w = pe.diff_tracing_cache_keys
    bench._enable_cache_logging()
    assert pe.diff_tracing_cache_keys is w
