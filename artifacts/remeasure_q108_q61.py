"""Idle re-measure for the r7 watch items q108_sessionize and
q61_lsh_cosine_neardup (VERDICT r7 "What's wrong #1" / "Next round #3").

Both queries regressed raw (q108 0.505→0.679 s = 1.34x; q61 0.994→1.197 s
= 1.20x) between BENCH_r06 and BENCH_r07 while their source files were
unchanged and the round's median headline ratio was 0.87x. Both live in
the sub-second, overhead-sensitive regime, so the BASELINE.md reading rule
says: re-measure on an idle host with calib + overhead probes recorded and
compare NORMALIZED values against BENCH_r07's probes (calib_sec 2.296,
overhead_sec 0.106), not raw seconds.

Methodology = the headline suite's exactly: one unmeasured warm pass, then
median of 3 steady-state runs through the noop sink, memos as-is, cache
cleared between shots. A couple of context queries (unchanged code, known
timings) run alongside as drift controls.

Output: artifacts/remeasure_q108_q61.json
Run:  PYTHONPATH=/root/repo python artifacts/remeasure_q108_q61.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGETS = ["q108_sessionize", "q61_lsh_cosine_neardup"]
# drift controls: sub-second + ~1s queries whose code also did not change,
# with stable r6->r7 readings, to separate "these two queries" from "the host"
CONTROLS = ["q30_window_ranking", "q105_time_rollup", "q60_cosine_topk"]
R7 = {  # BENCH_r07.json
    "calib_sec": 2.296,
    "overhead_sec": 0.106,
    "queries": {
        "q108_sessionize": 0.679,
        "q61_lsh_cosine_neardup": 1.197,
        "q30_window_ranking": 0.465,
        "q105_time_rollup": 0.862,
        "q60_cosine_topk": 0.931,
    },
}
R6 = {
    "queries": {
        "q108_sessionize": 0.505,
        "q61_lsh_cosine_neardup": 0.994,
        "q30_window_ranking": 0.533,
        "q105_time_rollup": 0.877,
        "q60_cosine_topk": 1.105,
    }
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from kinesis_writer_spark import registry
    from kinesis_writer_spark.calibration import calib_gate, calibrate, load_gate
    from kinesis_writer_spark.session import get_spark

    gate = load_gate()
    spark = get_spark("remeasure_q108_q61")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()
    cgate = calib_gate(spark)
    calib = calibrate(spark)

    def run(name: str) -> float:
        t0 = time.monotonic()
        queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = round(time.monotonic() - t0, 3)
        spark.catalog.clearCache()
        return dt

    names = TARGETS + CONTROLS
    for name in names:  # unmeasured warm pass (JIT + codegen)
        run(name)

    results: dict[str, dict] = {}
    for name in names:
        runs = [run(name) for _ in range(3)]
        med = sorted(runs)[1]
        results[name] = {
            "runs": runs,
            "median_sec": med,
            "r6_sec": R6["queries"][name],
            "r7_sec": R7["queries"][name],
            "raw_vs_r7": round(med / R7["queries"][name], 3),
            "raw_vs_r6": round(med / R6["queries"][name], 3),
        }

    calib_end = calibrate(spark)
    # Normalized comparison per BASELINE.md: sub-second queries track the
    # per-job overhead probe; ~1s+ mixed queries track a blend. Report both
    # normalizations so the reading is mechanical.
    for name, e in results.items():
        e["norm_by_overhead_vs_r7"] = round(
            (e["median_sec"] / calib["overhead_seconds"])
            / (R7["queries"][name] / R7["overhead_sec"]),
            3,
        )
        e["norm_by_calib_vs_r7"] = round(
            (e["median_sec"] / calib["calib_seconds"])
            / (R7["queries"][name] / R7["calib_sec"]),
            3,
        )

    out = {
        "metric": "idle_remeasure_q108_q61",
        "timing_method": "steady-state median of 3, JVM warmed, memos as-is",
        "r7_reference": R7,
        "results": results,
        "calibration": calib,
        "calibration_end": calib_end,
        "load_gate": gate,
        "calib_gate": cgate,
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "remeasure_q108_q61.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: results[k] for k in names}, indent=1))
    print(f"calib {calib['calib_seconds']} -> {calib_end['calib_seconds']}; "
          f"overhead {calib['overhead_seconds']} -> {calib_end['overhead_seconds']}")


if __name__ == "__main__":
    main()
