"""S-curve tradeoff probe (r12 verdict task #2, conditional leg): evaluate
a 3-band x 5-row banding of the SAME 16-perm MinHash signature against the
same exact-Jaccard>=0.8 truth set at sf1, next to the registered
2-band x 8-row config — the two operating points bracket the S-curve
threshold ((1/b)^(1/r): 0.917 for 2x8, 0.803 for 3x5), so this records
what the knob buys and costs if sf10+ recall ever sags.

Writes artifacts/lsh_band_probe.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF1 = "/tmp/ann_traj/sf1"


def band_point(spark, sf_dir: str, n_bands: int, rows: int) -> dict:
    import duckdb

    from kinesis_writer_spark.functions.hashing import md5_60bit
    from kinesis_writer_spark.operators._util import tables
    from kinesis_writer_spark.operators.dedup import (
        _MINHASH_MASK,
        _minhash_sig_spark,
    )
    from kinesis_writer_spark.operators.scale_ops import q193_prefix_filter_join

    t0 = time.monotonic()
    n_docs = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    truth = q193_prefix_filter_join(spark, sf_dir).select("doc_a", "doc_b")

    (documents,) = tables(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    inner = F.zip_with(
        F.slice(ws, 2, F.size(ws) - 2),
        F.slice(ws, 3, F.size(ws) - 2),
        lambda b, c: F.concat_ws(" ", b, c),
    )
    sh3 = F.zip_with(
        F.slice(ws, 1, F.size(ws) - 2), inner, lambda a, bc: F.concat_ws(" ", a, bc)
    )
    toks = F.when(
        F.size(ws) >= 3, F.array_distinct(F.transform(sh3, lambda s: md5_60bit(s)))
    ).otherwise(F.array().cast("array<bigint>"))
    toksrc = documents.select("doc_id", toks.alias("toks")).filter(F.size("toks") > 0)
    hs = toksrc.select(
        "doc_id",
        F.transform("toks", lambda t: t.bitwiseAND(F.lit(_MINHASH_MASK))).alias("hashes"),
    )
    sigs = hs.select(
        "doc_id", F.array(*_minhash_sig_spark(F.col("hashes"))).alias("signature")
    )
    band_exprs = []
    for b in range(n_bands):
        concat = F.concat_ws(
            ",",
            *[F.col("signature").getItem(b * rows + r).cast("string") for r in range(rows)],
        )
        band_exprs.append(md5_60bit(concat, salt=f"band{b}"))
    bands = sigs.select("doc_id", F.explode(F.array(*band_exprs)).alias("band_key"))
    cands = (
        bands.alias("a")
        .join(
            bands.select(F.col("doc_id").alias("doc_b"), F.col("band_key").alias("bk")),
            (F.col("band_key") == F.col("bk")) & (F.col("doc_id") < F.col("doc_b")),
        )
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
    )
    agg = (
        cands.withColumn("is_cand", F.lit(1))
        .join(truth.withColumn("is_truth", F.lit(1)), ["doc_a", "doc_b"], "full_outer")
        .agg(
            F.sum(F.coalesce("is_truth", F.lit(0))).alias("n_truth"),
            F.sum(F.coalesce("is_cand", F.lit(0))).alias("n_candidates"),
            F.sum(
                F.when((F.col("is_cand") == 1) & (F.col("is_truth") == 1), 1).otherwise(0)
            ).alias("n_hit"),
        )
        .first()
    )
    return {
        "bands": n_bands,
        "rows_per_band": rows,
        "s_curve_threshold": round((1.0 / n_bands) ** (1.0 / rows), 3),
        "n_docs": int(n_docs),
        "n_truth": int(agg["n_truth"]),
        "n_candidates": int(agg["n_candidates"]),
        "n_hit": int(agg["n_hit"]),
        "recall_pct": round(100.0 * agg["n_hit"] / agg["n_truth"], 2),
        "precision_pct": round(100.0 * agg["n_hit"] / agg["n_candidates"], 2),
        "candidates_per_doc": round(agg["n_candidates"] / n_docs, 3),
        "secs": round(time.monotonic() - t0, 1),
    }


def main() -> None:
    from kinesis_writer_spark.session import get_spark

    spark = get_spark("lsh-band-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"metric": "lsh_band_probe", "scale": "sf1", "points": []}
    for b, r in [(2, 8), (3, 5)]:
        pt = band_point(spark, SF1, b, r)
        out["points"].append(pt)
        print(json.dumps(pt))
    art = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(art, "lsh_band_probe.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
