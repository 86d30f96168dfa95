"""The r12 verdict's ask #4, decided by measurement: is a JVM-side framing
path worth building for the sink, or is the Arrow transfer floor per-BYTE
(in which case pre-framing JVM-side cannot beat the current design)?

The hypothetical JVM path: compute per-record KPL prefixes as Spark SQL
binary expressions and aggregate ~1 MB bodies JVM-side, so Python receives
a few large blobs per batch instead of millions of small cells, reducing
Python to `md5 + put_records`. That only pays if Arrow moves LARGE binary
cells materially faster per byte than small ones — the bytes themselves
must cross into Python either way (the Kinesis client is boto3).

So: S1's exact shape (scan -> mapInPandas row-count) over the same total
payload volume at three cell sizes. If MB/s is ~flat across cell size,
the floor is per-byte and the JVM path is dead on arrival; if MB/s rises
steeply with cell size, the aggregation-shuffle cost is worth pricing.

Writes artifacts/sink_jvm_framing_probe.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
FIX = "/tmp/jvm_framing_probe"


def _timed(fn, rounds: int = 3) -> tuple[float, list[float]]:
    fn()
    runs = []
    for _ in range(rounds):
        t0 = time.monotonic()
        fn()
        runs.append(round(time.monotonic() - t0, 3))
    return sorted(runs)[len(runs) // 2], runs


def build_cells(spark, cell_bytes: int, total_mb: int, dst: str) -> str:
    if not os.path.isdir(dst):
        n = total_mb * 1_000_000 // cell_bytes
        (
            spark.range(n)
            .select(
                F.encode(
                    F.rpad(F.col("id").cast("string"), cell_bytes, "x"), "utf-8"
                ).alias("data")
            )
            .repartition(32)
            .write.parquet(dst)
        )
    return dst


def s1_mb_per_sec(spark, src: str) -> dict:
    df = spark.read.parquet(src).select("data")
    n = df.count()
    total = df.agg(F.sum(F.length("data"))).first()[0]

    def rowcount(pdf_iter):
        import pandas as pd

        c = 0
        for pdf in pdf_iter:
            c += len(pdf)
        yield pd.DataFrame({"n": [c]})

    def run():
        assert (
            df.mapInPandas(rowcount, "n bigint").agg(F.sum("n")).first()[0] == n
        )

    med, runs = _timed(run)
    return {
        "n_cells": int(n),
        "payload_mb": round(total / 1e6, 1),
        "median_secs": med,
        "runs": runs,
        "mb_per_sec": round(total / med / 1e6, 1),
        "mb_per_sec_per_core": round(total / med / 1e6 / CPUS, 1),
    }


def main() -> None:
    from kinesis_writer_spark.session import get_spark

    spark = get_spark("jvm-framing-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"metric": "sink_jvm_framing_probe", "cpus": CPUS, "points": []}
    for cell in (128, 4096, 1_000_000):
        src = build_cells(spark, cell, 1000, f"{FIX}/cells_{cell}")
        pt = {"cell_bytes": cell, **s1_mb_per_sec(spark, src)}
        out["points"].append(pt)
        print(json.dumps(pt))
    small = out["points"][0]["mb_per_sec"]
    big = out["points"][-1]["mb_per_sec"]
    out["big_over_small_ratio"] = round(big / small, 2)
    art = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(art, "sink_jvm_framing_probe.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
