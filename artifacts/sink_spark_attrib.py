"""On-Spark attribution of the sink soak's per-core number (r11 task #1).

The off-Spark layers (sink_percore_attrib.py) put the whole single-threaded
Python path at ~159k recs/s — codec speed — so the soak's 37k/core gap is
NOT per-record Python work. This probe decomposes the Spark job itself on
the same fixture the soak uses (sf0.1 events x replicas, ~100 B payloads):

  S0  parquet scan -> noop                      (JVM only: scan ceiling)
  S1  scan -> mapInPandas row-count             (+ Arrow transfer + workers)
  S2  scan -> mapInPandas numpy len-sum         (+ column materialization)
  S3  scan -> write_dataframe (the real sink)   (+ codec + send)

Each stage timed median-of-3 after a warm-up; recs/s/core divides by ALL
host cores (the soak's definition). The S_n - S_{n-1} deltas are the
attribution. Writes artifacts/sink_spark_attrib.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICAS = int(os.environ.get("ATTRIB_REPLICAS", "100"))
N_FILES = 32


def _timed(fn, rounds: int = 3) -> tuple[float, list[float]]:
    fn()  # warm-up (JIT, codegen, file listing)
    runs = []
    for _ in range(rounds):
        t0 = time.monotonic()
        fn()
        runs.append(round(time.monotonic() - t0, 3))
    return sorted(runs)[len(runs) // 2], runs


def main() -> None:
    from bench_stream import build_sink_fixture
    from kinesis_writer_spark.session import get_spark
    from kinesis_writer_spark.sink import FakeKinesisClient, write_dataframe

    spark = get_spark("sink-attrib")
    spark.sparkContext.setLogLevel("ERROR")
    src = build_sink_fixture(spark, REPLICAS, N_FILES)
    df = spark.read.parquet(src).select("data")
    n = df.count()
    total_bytes = df.agg(F.sum(F.length("data"))).first()[0]

    stages = []

    def scan_noop():
        df.write.mode("overwrite").format("noop").save()

    def mip_count():
        def count_rows(it):
            import pandas as pd

            total = sum(len(pdf) for pdf in it)
            yield pd.DataFrame({"n": [total]})

        df.mapInPandas(count_rows, "n bigint").agg(F.sum("n")).first()

    def mip_lensum():
        def len_sum(it):
            import pandas as pd

            total = 0
            for pdf in it:
                for d in pdf["data"].to_numpy():
                    total += len(d)
            yield pd.DataFrame({"n": [total]})

        df.mapInPandas(len_sum, "n bigint").agg(F.sum("n")).first()

    def sink():
        written = write_dataframe(
            df, "attrib", lambda: FakeKinesisClient(num_shards=64)
        )
        assert written == n, (written, n)

    for name, fn in [
        ("S0 scan->noop (JVM only)", scan_noop),
        ("S1 + mapInPandas row-count (Arrow transfer)", mip_count),
        ("S2 + numpy len-sum (column materialized)", mip_lensum),
        ("S3 + full sink (codec + send)", sink),
    ]:
        med, runs = _timed(fn)
        stages.append(
            {
                "stage": name,
                "median_secs": med,
                "runs": runs,
                "recs_per_sec": round(n / med),
                "recs_per_sec_per_core": round(n / med / CPUS),
                "mb_per_sec": round(total_bytes / med / 1e6, 1),
            }
        )
        print(json.dumps(stages[-1]))

    out = {
        "metric": "sink_spark_attrib",
        "replicas": REPLICAS,
        "n_records": n,
        "payload_mb": round(total_bytes / 1e6, 1),
        "cpus": CPUS,
        "stages": stages,
    }
    art = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(art, "sink_spark_attrib.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "stages"}))


if __name__ == "__main__":
    main()
