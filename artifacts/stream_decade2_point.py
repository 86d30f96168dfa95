"""Second streaming decade point: a ~40M-record / ~4.5 GB backlog drain
(2x the 20M decade point, a full decade above the 4M soak, 20x the 2M
reshard point) through the fastpath sink fixture + partitioned source,
uncapped, with paired calibration shots. One number matters: per-shard
drain rate vs the 20M point — flat means per-task work scales with the
task's shard slice (the r13 lazy/sliced client), not the stream.

Writes artifacts/stream_decade2_point.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHARDS = 16
RECORDS = 40_000_000


def main() -> None:
    from bench_stream import FIX_ROOT, source_soak
    from kinesis_writer_spark.calibration import _probe_once
    from kinesis_writer_spark.session import get_spark

    spark = get_spark("stream-decade2")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(FIX_ROOT, exist_ok=True)

    out = {"metric": "stream_decade2_point", "shards": SHARDS,
           "records": RECORDS}
    t0 = time.monotonic()
    shot = _probe_once(spark)
    out["uncapped"] = source_soak(spark, SHARDS, RECORDS)
    out["paired_calib_shots"] = [shot, _probe_once(spark)]
    out["uncapped"]["fixture_plus_drain_secs"] = round(time.monotonic() - t0, 1)
    out["per_shard_recs_per_sec"] = round(
        out["uncapped"]["drain_recs_per_sec"] / SHARDS)

    art = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(art, "stream_decade2_point.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({
        "drain_recs_per_sec": out["uncapped"]["drain_recs_per_sec"],
        "drained_all": out["uncapped"]["drained_all"],
        "per_shard_recs_per_sec": out["per_shard_recs_per_sec"],
    }))


if __name__ == "__main__":
    main()
