"""Streaming decade point (r12 verdict task #5): the soaks ran at 2-5M
records; this probe drains a ~20M-record backlog (sf1-shaped stream: the
fixture is built THROUGH the fastpath kinesis sink, then read back with
the partitioned source), with paired calibration shots, to show drain
throughput and reader state bounds hold a decade above the 2M reshard
point (and 5x the 4M source soak).

Two drain legs over the same capture stream:
  - uncapped (availableNow, one mega-batch): peak drain recs/s — the
    apples-to-apples number vs bench_stream_soak.json's 4M source phase;
  - admission-capped (8 frames/shard/batch -> ~19 micro-batches over the
    ~2 400-frame capture): per-batch trigger_ms is observable — FLAT
    trigger times across the drain mean the reader carries no state that
    grows with stream length. Driven by the default processing-time
    trigger with a checkpoint-offset stop (availableNow would terminate at
    ONE capped latestOffset snapshot; see the reader docstring).

Writes artifacts/stream_decade_point.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHARDS = 16
RECORDS = 20_000_000


def main() -> None:
    from bench_stream import FIX_ROOT, source_soak
    from kinesis_writer_spark.calibration import _probe_once
    from kinesis_writer_spark.session import get_spark

    spark = get_spark("stream-decade")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(FIX_ROOT, exist_ok=True)

    out = {"metric": "stream_decade_point", "shards": SHARDS,
           "records": RECORDS, "paired_calib_shots": {}}

    t0 = time.monotonic()
    shot = _probe_once(spark)
    out["uncapped"] = source_soak(spark, SHARDS, RECORDS)
    out["paired_calib_shots"]["uncapped"] = [shot, _probe_once(spark)]
    out["uncapped"]["fixture_plus_drain_secs"] = round(time.monotonic() - t0, 1)

    shot = _probe_once(spark)
    capped = source_soak(spark, SHARDS, RECORDS, max_frames_per_batch=8)
    out["paired_calib_shots"]["capped"] = [shot, _probe_once(spark)]
    # flatness: trigger_ms of the last batch vs the median — growth with
    # stream position would show the tail slower than the middle
    tms = [b["trigger_ms"] for b in capped["per_batch"] if b.get("trigger_ms")]
    if len(tms) >= 5:
        mid = sorted(tms)[len(tms) // 2]
        capped["trigger_ms_median"] = mid
        capped["trigger_ms_last_over_median"] = round(tms[-1] / mid, 2)
        capped["trigger_ms_max_over_median"] = round(max(tms) / mid, 2)
    capped["per_batch_count"] = len(capped.pop("per_batch", []))
    out["capped"] = capped

    art = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(art, "stream_decade_point.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({
        "drain_recs_per_sec": out["uncapped"]["drain_recs_per_sec"],
        "drained_all": out["uncapped"]["drained_all"],
        "per_shard_recs_per_sec": round(
            out["uncapped"]["drain_recs_per_sec"] / SHARDS),
        "capped_batches": out["capped"]["per_batch_count"],
        "trigger_flatness_max_over_median":
            out["capped"].get("trigger_ms_max_over_median"),
    }))


if __name__ == "__main__":
    main()
