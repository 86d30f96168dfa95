"""KPL codec micro-benchmark: single-thread aggregation (and decode)
throughput of the pure-Python KPL wire codec, the hot path of the sink.

The reference's stated goal is "maximum throughput possible" (build.sbt:21)
but it publishes no numbers (BASELINE.md); the relevant external bound is
the Kinesis service limit of 1 MiB/s per shard. This benchmark answers the
question that matters for the Spark port: can ONE executor core aggregate
fast enough that the network limit — not Python — is the bottleneck?
(Measured: ~450 k records/s/core ≈ 450 shard-limits of 1 KiB traffic; see
artifacts/bench_kpl.json.)

Prints one compact JSON line and writes the same object to
artifacts/bench_kpl.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kinesis_writer_spark.kpl.deaggregator import deaggregate  # noqa: E402
from kinesis_writer_spark.sink import batch_records  # noqa: E402

EHK = "170141183460469231731687303715884105727"


def measure_encode(size: int, n: int) -> dict:
    payload = b"x" * size
    recs = [("a", EHK, payload)] * n
    t0 = time.time()
    blobs = [agg.to_bytes() for agg in batch_records(iter(recs))]
    dt = time.time() - t0
    return {
        "payload_bytes": size,
        "n_records": n,
        "encode_recs_per_sec": round(n / dt),
        "encode_mb_per_sec": round(n * size / dt / 1e6, 1),
        "n_flushes": len(blobs),
        "_blobs": blobs,
    }


def measure_decode(blobs: list[bytes]) -> tuple[int, float]:
    t0 = time.time()
    n = 0
    for blob in blobs:
        n += len(deaggregate(blob))
    return n, time.time() - t0


def main() -> None:
    out = {"metric": "kpl_codec_throughput", "unit": "records_per_sec", "cases": []}
    for size, n in [(100, 500_000), (1024, 200_000), (10_240, 50_000)]:
        case = measure_encode(size, n)
        blobs = case.pop("_blobs")
        n_dec, dt_dec = measure_decode(blobs)
        case["decode_recs_per_sec"] = round(n_dec / dt_dec) if dt_dec > 0 else None
        assert n_dec == n, f"decode count mismatch: {n_dec} != {n}"
        out["cases"].append(case)
    out["value"] = min(c["encode_recs_per_sec"] for c in out["cases"])
    art = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")
    os.makedirs(art, exist_ok=True)
    with open(os.path.join(art, "bench_kpl.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
