"""Engine benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
    {"metric": "...", "value": <total_sec>, "unit": "sec", "queries": {...},
     "all_queries_total": <sec>, "all_queries_n": <int>, "sf": ...}

``queries`` is the headline suite (median of 3, steady-state); ``value`` sums
it. Every OTHER registered query is also timed single-shot, but its per-query
detail goes to ``artifacts/bench_full.json`` — NOT the stdout line. The r03
artifact was lost because the driver keeps only a 2000-char tail of stdout
and a 250-entry ``all_queries`` dict blew past it (BENCH_r03.json
``parsed: null``); the stdout line is now kept compact by construction, with
only the scalar ``all_queries_total``/``all_queries_n`` rollup inline.

Each query executes fully through the noop sink (no driver collect, no I/O
cost in the measurement beyond the scan itself). Since r15 the full-registry
pass also records ``construction_sec`` per query in the artifact — the
driver-side DataFrame-construction component (py4j expression building +
training jobs) of the unchanged construct+execute ``all_queries`` figure.

Fault isolation: every per-query execution (warmup AND measured) is wrapped
so a single failing query records an ``errors`` entry instead of killing the
whole artifact — the JSON line is ALWAYS printed.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q12_range_join",
    "q21_topk_per_group",
    "q30_window_ranking",
    "q33_tumbling_window",
    "q37_asof_join",
    "q39_lateral_topk_join",
    "q50_exact_dedup",
    "q63_salted_agg",
    "q52_minhash_neardup",
    "q53_simhash",
    "q60_cosine_topk",
    "q62_ivf_ann",
    "q66_train_test_split",
    "q84_market_share",
    "q89_nation_trade_matrix",
    "q70_token_stats",
    "q79_bigram_lm_score",
    "q76_deterministic_shuffle",
    "q81_multimodal_decode",
    "q90_kpl_batch_stats",
    "q92_kpl_roundtrip",
    "q99_tfidf",
    "q100_bm25",
    "q101_decontamination",
    "q102_embedding_neardup",
    "q105_time_rollup",
    "q108_sessionize",
    "q111_time_range_frame",
    "q112_variant_json",
    "q118_fuzzy_levenshtein",
    "q120_waiting_orders",
    "q130_recursive_month_spine",
    "q131_embedding_quantize",
    "q132_vocab_topk_bigrams",
    "q61_lsh_cosine_neardup",
    "q134_ivf_trained",
]
# NOTE: the headline list is frozen to the BENCH_r02 suite so the summed
# `value` stays comparable round over round; every query added since
# (q137-q221) is timed individually in the `all_queries` section.


def _run_once(queries, name: str, spark, sf_dir: str) -> None:
    queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()


#: Drift self-defense (r10 verdict task #2): a single-run headline taken in
#: a drifting window needed manual adjudication (r10 driver artifact 36.08
#: blend @ drift 13.9% vs same-HEAD rehearsal 28.52 @ 5.8% — a 27% spread
#: above the ±20% floor). When the measured pass's intra-run calib drift
#: exceeds this threshold, the headline pass re-runs (bounded) and the
#: REPORTED figure is the median blend over the rehearsal set, preferring
#: stable-window passes. A calm first pass costs nothing extra.
DRIFT_RETRY_PCT = float(os.environ.get("SPARK_GRAFT_DRIFT_RETRY_PCT", "10"))
DRIFT_MAX_RETRIES = int(os.environ.get("SPARK_GRAFT_DRIFT_RETRIES", "2"))

#: Off-band epoch self-defense (r11 verdict task #5): the two-probe blend
#: model mis-normalizes off-band epochs in BOTH directions (measured: a
#: same-HEAD window at calib 1.146xref blended 22% above the in-band
#: cluster; an r12 window at calib 0.781xref / oh 0.678xref blended 18%
#: above it too — sub-second queries divide by a small oh ratio the real
#: queries did not fully enjoy). Rather than model the mid-band, the
#: headline refuses to REPORT from an off-band window when it can avoid
#: it: a pass whose calib_vs_ref falls outside [1/MAX, MAX] triggers the
#: same bounded re-run as a drifting pass, and selection prefers in-band
#: passes. A persistently off-band window still reports (bounded
#: retries), stamped by the selection policy string.
EPOCH_INBAND_MAX = float(os.environ.get("SPARK_GRAFT_EPOCH_INBAND_MAX", "1.15"))


def _headline_pass(
    queries, spark, sf_dir: str, errors: dict, pass_i: int, skip=()
) -> dict:
    """One self-contained headline measurement: start probe -> median-of-3
    suite -> end probe -> epoch verdict + blended normalization. Returns
    everything a cross-round reader needs to adjudicate THIS pass alone.
    ``skip`` (warm-up failures) are excluded instead of re-erroring 3x per
    pass."""
    from kinesis_writer_spark.calibration import (
        adjudicate_epoch,
        calibrate,
        normalize_suite,
    )

    tag = f"p{pass_i}"
    calib: dict = {}
    calib_end: dict = {}
    timings: dict[str, float] = {}
    headline_runs: dict[str, list[float]] = {}
    try:
        calib = calibrate(spark)
    except Exception:
        errors[f"calibration:{tag}"] = traceback.format_exc(limit=3)
    for name in HEADLINE:
        if name in skip:
            continue
        runs = []
        try:
            for _ in range(3):
                t0 = time.monotonic()
                _run_once(queries, name, spark, sf_dir)
                runs.append(round(time.monotonic() - t0, 3))
                spark.catalog.clearCache()
            headline_runs[name] = runs
            timings[name] = round(sorted(runs)[1], 3)
        except Exception:
            errors[f"{name}:{tag}"] = traceback.format_exc(limit=3)
    try:
        calib_end = calibrate(spark)
    except Exception:
        errors[f"calibration_end:{tag}"] = traceback.format_exc(limit=3)
    try:
        epoch = adjudicate_epoch(calib, calib_end)
    except Exception:
        epoch = {"verdict": "unmeasured"}
        errors[f"epoch:{tag}"] = traceback.format_exc(limit=3)
    try:
        norm = normalize_suite(
            timings, epoch.get("calib_vs_ref"), epoch.get("overhead_vs_ref")
        )
    except Exception:
        norm = {"normalizer_note": "norm=error"}
        errors[f"normalize:{tag}"] = traceback.format_exc(limit=3)
    return {
        "pass": pass_i,
        "timings": timings,
        "headline_runs": headline_runs,
        "calibration": calib,
        "calibration_end": calib_end,
        "epoch": epoch,
        "norm": norm,
        "total": round(sum(timings.values()), 3),
    }


def _pass_drift(p: dict):
    return p["epoch"].get("intra_run_drift_pct")


def _pass_calm(p: dict) -> bool:
    d = _pass_drift(p)
    return d is not None and d <= DRIFT_RETRY_PCT


def _pass_inband(p: dict) -> bool:
    cvr = p["epoch"].get("calib_vs_ref")
    return cvr is not None and 1.0 / EPOCH_INBAND_MAX <= cvr <= EPOCH_INBAND_MAX


def _pick_reported_pass(passes: list[dict]) -> tuple[dict, dict]:
    """Median-blend selection over the rehearsal set.

    Preference order: calm AND in-band epoch (intra-run drift <=
    DRIFT_RETRY_PCT and calib <= EPOCH_INBAND_MAX x ref) > calm > any pass
    with a measured blend. Within the preferred pool the reported pass is
    the one whose blend is the median — so ``value``/``queries`` and the
    normalized headline always come from the SAME physical measurement.
    Returns (reported_pass, selection_note)."""
    def _blend(p: dict):
        return p["norm"].get("value_norm_blend")

    usable = [p for p in passes if _blend(p) is not None]
    if not usable:
        # normalization structurally unmeasurable: still prefer a calm-
        # drift pass over a drifting one before falling back to pass 0
        calm = [p for p in passes if _pass_calm(p)]
        chosen = calm[0] if calm else passes[0]
        return chosen, {
            "policy": "no blend measured; "
            + ("first calm-drift pass" if calm else "first pass"),
            "chosen_pass": chosen["pass"],
        }
    stable = [p for p in usable if _pass_calm(p)]
    inband = [p for p in stable if _pass_inband(p)]
    pool, pool_name = (
        (inband, "stable+in-band")
        if inband
        else (stable, "stable-OFF-BAND") if stable else (usable, "ALL-DRIFTING")
    )
    ranked = sorted(pool, key=_blend)
    chosen = ranked[(len(ranked) - 1) // 2]  # lower median for even counts
    return chosen, {
        "policy": (
            f"median blend over {len(pool)} {pool_name} "
            f"pass(es) of {len(passes)} run"
        ),
        "pass_blends": [_blend(p) for p in passes],
        "pass_drifts": [_pass_drift(p) for p in passes],
        "pass_calib_vs_ref": [p["epoch"].get("calib_vs_ref") for p in passes],
        "chosen_pass": chosen["pass"],
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    errors: dict[str, str] = {}
    timings: dict[str, float] = {}
    all_timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    construction_sec: dict[str, float] = {}
    headline_runs: dict[str, list[float]] = {}
    calib: dict = {}
    calib_end: dict = {}
    gate: dict = {}
    cgate: dict = {}
    hl_passes: list[dict] = []
    hl_selection: dict = {}
    reported: dict = {}
    # environment fingerprint: separates a code regression from a loaded
    # machine in one artifact (1/5/15-min loadavg before and after)
    load_start = list(os.getloadavg())

    try:
        from kinesis_writer_spark import registry
        from kinesis_writer_spark.calibration import calib_gate, calibrate, load_gate
        from kinesis_writer_spark.session import get_spark

        # r6 lesson: loadavg stamps are not enough — wait out transient
        # co-tenant spikes (bounded), then measure host throughput with a
        # fixed probe so raw seconds can be normalized across rounds.
        gate = load_gate()

        spark = get_spark("bench")
        # ERROR-level logs for the bench run only: the sanctioned collapsed-
        # table window ops (bucket-count tables etc.) emit hundreds of
        # "No Partition Defined for Window" WARNs that could push the JSON
        # summary line out of the driver's 2000-char stdout tail.
        spark.sparkContext.setLogLevel("ERROR")
        queries = registry.all_queries()

        # warm the JVM + file listing outside the measurement
        from kinesis_writer_spark import io as kio

        for t in kio.TABLES:
            try:
                kio.load(spark, sf_dir, t).count()
            except Exception:
                errors[f"warmup:{t}"] = traceback.format_exc(limit=3)

        # loadavg cannot see a slow host EPOCH (co-tenant steal / frequency
        # scaling) — probe-gate it: defer while single probe shots run over
        # threshold, bounded so a driver-run bench can't stall long.
        try:
            cgate = calib_gate(
                spark,
                max_wait_s=float(os.environ.get("SPARK_GRAFT_CALIB_GATE_S", "240")),
            )
        except Exception:
            errors["calib_gate"] = traceback.format_exc(limit=3)

        # one unmeasured pass first: JVM JIT + codegen caches warm up, so the
        # measured pass reports steady-state throughput (the regime a long-
        # running 100 TB job actually operates in, and the fair comparison
        # against the reference's "maximum throughput" steady state)
        warm_failed: set[str] = set()
        for name in HEADLINE:
            try:
                _run_once(queries, name, spark, sf_dir)
            except Exception:
                warm_failed.add(name)
                errors[name] = traceback.format_exc(limit=3)
        spark.catalog.clearCache()

        # Self-defending headline measurement (r10 verdict task #2): each
        # pass is probe-bracketed (median of 3 per query inside); if the
        # pass's own intra-run drift exceeds DRIFT_RETRY_PCT, re-run the
        # whole pass (bounded by DRIFT_MAX_RETRIES) and report the median
        # blend over the rehearsal set — no human adjudication needed when
        # the driver's window happens to drift.
        hl_passes = [_headline_pass(queries, spark, sf_dir, errors, 0, warm_failed)]
        while len(hl_passes) <= DRIFT_MAX_RETRIES:
            last = hl_passes[-1]
            blend_ok = last["norm"].get("value_norm_blend") is not None
            if _pass_calm(last) and _pass_inband(last) and blend_ok:
                break  # calm, in-band window; this pass stands on its own
            if not blend_ok and len(hl_passes) >= 2:
                # normalization structurally unmeasurable (calibration or
                # reference failure): one retry covers a transient probe
                # hiccup; past that, burning the full budget can't produce
                # a blend — report on drift alone (r11 ADVICE #3)
                break
            hl_passes.append(
                _headline_pass(
                    queries, spark, sf_dir, errors, len(hl_passes), warm_failed
                )
            )
        reported, hl_selection = _pick_reported_pass(hl_passes)
        timings = reported["timings"]
        headline_runs = reported["headline_runs"]
        calib = reported["calibration"]

        # full-registry pass: covers every registered query so per-query
        # regressions anywhere show up round over round. A single cold shot
        # conflates steady-state cost with one-time JIT/codegen/training —
        # exactly the noise behind the r3->r4 "regression" (q97 5.2 s cold
        # vs 1.9 s steady). Queries slower than 0.5 s get a second shot in
        # a SEPARATE full pass (transient machine-load spikes cluster in
        # time, so immediate back-to-back re-runs can both land inside the
        # same spike — measured r5: q184 [1.63, 1.78] under load vs 0.62
        # idle); the min of the decorrelated runs is reported and both raw
        # values land in the artifact.
        #
        # Memoization honesty (r5 verdict "What's wrong #1"): the cross-
        # query memo caches (SimHash pair table / components, IVF codebooks,
        # perceptron weights) are cleared before EVERY measured shot here,
        # so each per-query figure reflects that query's own full cost and a
        # regression in a shared intermediate is visible in every consumer —
        # r5 recorded q96 at 0.076 s because it read q54's memo. The memo
        # path itself stays on in production/tests; this is measurement
        # policy only. Consequence: `all_queries_total` intentionally
        # DOUBLE-COUNTS shared work relative to a real pipeline run (which
        # computes the duplicate graph once) and is NOT comparable with
        # r2-r5 artifacts (r6+ methodology: memo_cold).
        from kinesis_writer_spark.memo import clear_all as _clear_memos
        non_headline = [
            n for n in queries if n not in timings and n not in warm_failed
        ]
        for name in queries:
            if name in timings:
                all_timings[name] = timings[name]
        for pass_i in range(2):
            for name in non_headline:
                if pass_i == 1 and all_runs.get(name, [2.0])[0] <= 0.5:
                    continue  # fast and stable; a second shot is noise-chasing
                try:
                    _clear_memos()
                    t0 = time.monotonic()
                    df = queries[name](spark, sf_dir)
                    tc = time.monotonic()
                    df.write.mode("overwrite").format("noop").save()
                    t1 = round(time.monotonic() - t0, 3)
                    spark.catalog.clearCache()
                    all_runs.setdefault(name, []).append(t1)
                    all_timings[name] = min(all_runs[name])
                    # r14 verdict task #8: driver-side DataFrame-construction
                    # time (py4j expression building + any training jobs the
                    # builder runs) measured SEPARATELY so the py4j budget is
                    # trackable across rounds. all_runs/all_timings semantics
                    # are unchanged (construction + execution, as always):
                    # this only splits out where the time went.
                    c1 = round(tc - t0, 3)
                    prev = construction_sec.get(name)
                    construction_sec[name] = c1 if prev is None else min(prev, c1)
                except Exception:
                    errors[name] = traceback.format_exc(limit=3)

        # closing probe: catches throughput drift WITHIN this run (a calib
        # delta start->end means the per-query figures straddle two host
        # epochs and intra-run comparisons are suspect too)
        try:
            calib_end = calibrate(spark)  # same median-of-3, comparable
        except Exception:
            errors["calibration_end"] = traceback.format_exc(limit=3)
    except Exception:
        errors["harness"] = traceback.format_exc(limit=5)

    total = round(sum(timings.values()), 3)
    # Self-adjudication (r7 task #2) + drift self-defense (r10 task #2):
    # the headline epoch verdict and blended normalization come from the
    # REPORTED PASS's own probe bracket (tight around the suite), selected
    # by median blend over the rehearsal set when the window drifted. The
    # run-level epoch below (reported-pass start probe vs the closing probe
    # after the full-registry sweep) stamps the all_queries window.
    try:
        from kinesis_writer_spark.calibration import adjudicate_epoch

        run_epoch = adjudicate_epoch(calib, calib_end, cgate)
    except Exception:
        run_epoch = {"verdict": "unmeasured"}
        errors["epoch_verdict"] = traceback.format_exc(limit=3)
    epoch = dict(reported.get("epoch") or run_epoch)
    if cgate.get("calib_gate_expired") and epoch.get("verdict"):
        epoch["verdict"] += ";gate-expired"
    norm_blend = reported.get("norm") or {"normalizer_note": "norm=unmeasured"}
    calib_sec = calib.get("calib_seconds")
    value_norm = round(total / calib_sec, 3) if calib_sec else None
    if epoch.get("verdict") and norm_blend.get("normalizer_note"):
        epoch["verdict"] = f"{epoch['verdict']};{norm_blend['normalizer_note']}"
    if epoch.get("verdict") and len(hl_passes) > 1:
        epoch["verdict"] += (
            f";hl_passes={len(hl_passes)}@p{hl_selection.get('chosen_pass')}"
        )
    sec_norm = (
        {k: round(v / calib_sec, 4) for k, v in timings.items()} if calib_sec else {}
    )
    all_sec_norm = (
        {k: round(v / calib_sec, 4) for k, v in all_timings.items()}
        if calib_sec
        else {}
    )
    # blended per-query normalization (regime-correct: see normalize_suite)
    try:
        from kinesis_writer_spark.calibration import SUBSECOND_CUTOFF_S as _CUT
    except Exception:
        _CUT = 1.0
    _cvr, _ovr = epoch.get("calib_vs_ref"), epoch.get("overhead_vs_ref")
    all_sec_norm_blend = (
        {
            k: round(v / (_ovr if v < _CUT else _cvr), 4)
            for k, v in all_timings.items()
        }
        if _cvr and _ovr
        else {}
    )
    # Full per-query detail (all 250+ registry entries, plus any tracebacks)
    # is an artifact file; stdout carries only the compact summary line so
    # the driver's 2000-char tail always contains the complete JSON object.
    full = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "headline_runs": headline_runs,
        "all_queries": all_timings,
        "all_runs": all_runs,
        # min-of-passes DataFrame-construction seconds per non-headline
        # query (r14 verdict task #8): the driver-side py4j budget,
        # already INCLUDED in all_queries (which stays construct+execute)
        "construction_sec": construction_sec,
        "calibration": calib,
        "calibration_end": calib_end,
        "load_gate": gate,
        "calib_gate": cgate,
        "load_start": load_start,
        "load_end": list(os.getloadavg()),
        "sf": sf,
        "errors": errors,
        # normalized (host-epoch-cancelled) figures + machine verdict
        "value_norm": value_norm,
        "value_norm_oh": norm_blend.get("value_norm_oh"),
        "value_norm_blend": norm_blend.get("value_norm_blend"),
        "subsecond_share_pct": norm_blend.get("subsecond_share_pct"),
        "sec_norm": sec_norm,
        "all_sec_norm": all_sec_norm,
        "all_sec_norm_blend": all_sec_norm_blend,
        "epoch": epoch,
        # drift self-defense detail (r10 task #2): every rehearsal pass in
        # full, plus the median-blend selection rationale
        "run_epoch": run_epoch,
        "headline_passes": hl_passes,
        "headline_selection": hl_selection,
        "drift_retry_pct": DRIFT_RETRY_PCT,
        # Methodology stamp so cross-round deltas are interpretable
        # (timing changed r4->r5: cold single-shot -> warm median/min;
        # r5->r6: all_queries now memo-cold, see comment above the pass).
        "timing_method": {
            "queries": "steady-state median of 3 (JVM warmed, memos as-is)",
            "all_queries": (
                "memo-cold min of up to 2 decorrelated runs; shared memo "
                "caches cleared before every shot, so all_queries_total "
                "double-counts shared intermediates vs a real pipeline run "
                "and is not comparable with r2-r5 artifacts"
            ),
        },
    }
    art_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")
    try:
        os.makedirs(art_dir, exist_ok=True)
        with open(os.path.join(art_dir, "bench_full.json"), "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
    except Exception:
        pass

    out = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "all_queries_total": round(sum(all_timings.values()), 3),
        "all_queries_n": len(all_timings),
        # host-throughput probe (start/end): normalize cross-round deltas
        # as value/calib_sec — raw seconds drift with the sandbox epoch
        # (r6: +26% with byte-identical code). See BASELINE.md.
        "calib_sec": calib.get("calib_seconds"),
        "calib_end_sec": calib_end.get("calib_seconds"),
        # per-job scheduling-overhead probe: short (<~1s) queries track
        # THIS, not throughput — the two drift independently (BASELINE.md)
        "overhead_sec": calib.get("overhead_seconds"),
        "overhead_end_sec": calib_end.get("overhead_seconds"),
        "calib_gate_expired": cgate.get("calib_gate_expired"),
        # SELF-ADJUDICATING fields (r7 verdict task #2): value_norm =
        # value/calib_sec (compare THIS across rounds, not raw value);
        # epoch_verdict encodes BASELINE.md's reading rules vs the frozen
        # r7 reference epoch. Per-query sec_norm is in bench_full.json.
        "value_norm": value_norm,
        # r10: AUTHORITATIVE cross-round headline — per-regime normalizer
        # (sub-second queries / overhead_vs_ref, rest / calib_vs_ref), in
        # epoch-corrected seconds. See BASELINE.md "Since r10".
        "value_norm_blend": norm_blend.get("value_norm_blend"),
        "value_norm_oh": norm_blend.get("value_norm_oh"),
        "epoch_verdict": epoch.get("verdict"),
        "load1m": [round(load_start[0], 2), round(os.getloadavg()[0], 2)],
        "sf": sf,
        # compact stamp; full prose in artifacts/bench_full.json
        "timing_method": "hl=median3-steady+driftretry;aq=min2-memocold",
        "hl_passes": len(hl_passes),
    }
    if errors:
        out["errors_n"] = len(errors)
        out["errors"] = sorted(errors)[:5]  # names only, capped
    line = json.dumps(out)
    if len(line) > 1900:  # hard guarantee: fit the driver's 2000-char tail
        out["queries"] = {
            k: timings[k]
            for k in sorted(timings, key=timings.get, reverse=True)[:20]
        }
        out["queries_truncated"] = True
        line = json.dumps(out)
    print(line)


if __name__ == "__main__":
    main()
