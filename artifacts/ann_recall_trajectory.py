"""ANN recall trajectory across scales (r12 verdict task #4).

r11 pinned q220's LSH recall (92%) and q135's IVF recall only at sf0.01.
This probe re-measures both quality numbers AND their candidate fan-out at
sf0.01 -> sf0.1 -> sf1 (documents via bench_scale.build_fixture's
leak-closure replication; embeddings via +-5% hash-perturbed replicas so
neighbors shift realistically instead of cloning), plus an embeddings-only
sf10 point for the IVF family:

- q220 (shingle-MinHash LSH, 16 perms / 2 bands x 8 rows): recall &
  precision vs the exact Jaccard>=0.8 truth (q193, no false negatives),
  and candidates-per-doc — the S-curve's scale behavior, measured.
- q135 (trained IVF, 4 cells / nprobe 1): recall@3-in-brute-top10
  aggregated over the 1% query sample, plus cell occupancy balance — the
  probed-fraction-of-corpus trajectory.

Writes artifacts/ann_recall_trajectory.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SRC01 = "/root/testdata/sf0.01"
SRC = "/root/testdata/sf0.1"
FIX = "/tmp/ann_traj"


def build_embeddings(src: str, dst: str, replicas: int) -> None:
    """x``replicas`` embeddings with deterministic +-5% per-component
    perturbation on the copies — realistic corpus growth, not clones."""
    import duckdb

    out = os.path.join(dst, "embeddings.parquet")
    if os.path.exists(out) and os.path.getsize(out) > 0:
        return  # size>0: a crashed COPY leaves an empty stub behind
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    n = con.sql(f"SELECT COUNT(*) FROM '{src}/embeddings.parquet'").fetchone()[0]
    con.sql(
        f"""
        COPY (
            SELECT d.vec_id + r.r * {n} AS vec_id,
                   CASE WHEN r.r = 0 THEN d.embedding ELSE
                       list_transform(range(1, len(d.embedding) + 1),
                           i -> CAST(d.embedding[i] * (1.0 +
                               (CAST(hash(d.vec_id * 131071 + i * 8191 + r.r)
                                 % 2001 AS BIGINT) - 1000) / 20000.0) AS FLOAT))
                   END AS embedding,
                   d.label
            FROM '{src}/embeddings.parquet' d, range({replicas}) r(r)
        ) TO '{out}' (FORMAT PARQUET)
        """
    )


def build_documents(dst: str, replicas: int) -> None:
    if os.path.exists(os.path.join(dst, "documents.parquet")):
        return
    from bench_scale import build_fixture

    build_fixture(SRC, dst, replicas)


def q220_point(spark, label: str, sf_dir: str) -> dict:
    from kinesis_writer_spark.registry import all_queries

    import duckdb

    n_docs = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    t0 = time.monotonic()
    row = all_queries()["q220_lsh_recall_eval"](spark, sf_dir).first()
    dt = round(time.monotonic() - t0, 1)
    return {
        "scale": label,
        "n_docs": int(n_docs),
        "n_truth": int(row["n_truth"]),
        "n_candidates": int(row["n_candidates"]),
        "n_hit": int(row["n_hit"]),
        "recall_pct": round(100.0 * row["n_hit"] / row["n_truth"], 2)
        if row["n_truth"]
        else None,
        "precision_pct": round(100.0 * row["n_hit"] / row["n_candidates"], 2)
        if row["n_candidates"]
        else None,
        "candidates_per_doc": round(row["n_candidates"] / n_docs, 3),
        "secs": dt,
    }


def q135_point(spark, label: str, sf_dir: str, query_mod: int = 100,
               k_cells=None) -> dict:
    """``query_mod=100`` is q135's registered 1%% query sample; the sf10
    point passes a sparser sample (the brute-force truth side is
    O(queries x corpus) and exists only to grade the IVF side — recall is
    a property of the index, not of how many queries we grade it on)."""
    from kinesis_writer_spark.operators._util import tables
    from kinesis_writer_spark.operators.similarity import (
        _km_assign,
        ivf_train_centroids,
    )
    from kinesis_writer_spark.registry import all_queries

    t0 = time.monotonic()
    if query_mod == 100 and k_cells is None:
        per_q = all_queries()["q135_ann_recall"](spark, sf_dir)
    else:
        per_q = _q135_sampled(spark, sf_dir, query_mod, k_cells)
    agg = per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum("n_ivf").alias("n_ivf"),
        F.sum("n_in_brute_top10").alias("n_hit"),
    ).first()
    dt = round(time.monotonic() - t0, 1)
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    n_vecs = embeddings.count()
    cells = (
        _km_assign(
            embeddings.select("vec_id", "embedding"),
            ivf_train_centroids(embeddings, cache_key=sf_dir, k_cells=k_cells),
        )
        .groupBy("cluster_id")
        .count()
        .collect()
    )
    occ = sorted(int(r["count"]) for r in cells)
    return {
        "scale": label,
        "n_vectors": int(n_vecs),
        "n_queries": int(agg["n_queries"]),
        "n_ivf_results": int(agg["n_ivf"]),
        "n_in_brute_top10": int(agg["n_hit"]),
        "recall_pct": round(100.0 * agg["n_hit"] / agg["n_ivf"], 2)
        if agg["n_ivf"]
        else None,
        "n_cells": len(occ),
        "cell_occupancy": occ,
        # nprobe=1 scans the query's own cell: expected probed fraction
        "probed_fraction_pct": round(
            100.0 * sum(c * c for c in occ) / (n_vecs * n_vecs), 1
        ),
        "secs": dt,
    }


def _q135_sampled(spark, sf_dir: str, query_mod: int, k_cells=None):
    """q135's exact comparison shape with a sparser query sample — same
    index, same brute-force truth definition, fewer graded queries."""
    from pyspark.sql import Window

    from kinesis_writer_spark.functions.vectors import cosine
    from kinesis_writer_spark.operators._util import tables
    from kinesis_writer_spark.operators.similarity import (
        _km_assign,
        ivf_train_centroids,
    )

    (embeddings,) = tables(spark, sf_dir, "embeddings")
    vectors = embeddings.select("vec_id", "embedding")
    assigned = _km_assign(
        vectors, ivf_train_centroids(embeddings, cache_key=sf_dir, k_cells=k_cells)
    ).persist()
    q = assigned.filter(F.col("vec_id") % query_mod == 50).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("cluster_id").alias("qcell"),
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    brute = (
        F.broadcast(q.select("query_id", "qv"))
        .join(embeddings, F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                cosine("qv", "embedding").alias("cos"))
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= 10)
        .select(F.col("query_id").alias("b_query"),
                F.col("neighbor_id").alias("b_neighbor"),
                F.lit(1).alias("hit"))
    )
    ivf = (
        F.broadcast(q)
        .join(assigned, (F.col("cluster_id") == F.col("qcell"))
              & (F.col("vec_id") != F.col("query_id")))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                cosine("qv", "embedding").alias("cos"))
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id")
    )
    return (
        ivf.join(brute, (F.col("query_id") == F.col("b_query"))
                 & (F.col("neighbor_id") == F.col("b_neighbor")), "left")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_ivf"),
             F.sum(F.when(F.col("hit").isNull(), 0).otherwise(1))
             .alias("n_in_brute_top10"))
    )


def main() -> None:
    from kinesis_writer_spark.session import get_spark

    build_documents(f"{FIX}/sf1", 10)
    build_embeddings(SRC, f"{FIX}/sf1", 10)
    build_embeddings(SRC, f"{FIX}/sf10emb", 100)

    spark = get_spark("ann-traj")
    spark.sparkContext.setLogLevel("ERROR")

    out = {"metric": "ann_recall_trajectory", "q220_lsh": [], "q135_ivf": []}
    for label, d in [("sf0.01", SRC01), ("sf0.1", SRC), ("sf1", f"{FIX}/sf1")]:
        pt = q220_point(spark, label, d)
        out["q220_lsh"].append(pt)
        print(json.dumps(pt))
    for label, d, mod in [
        ("sf0.01", SRC01, 100),
        ("sf0.1", SRC, 100),
        ("sf1", f"{FIX}/sf1", 100),
        ("sf10", f"{FIX}/sf10emb", 10000),
    ]:
        pt = q135_point(spark, label, d, mod)
        pt["query_mod"] = mod
        out["q135_ivf"].append(pt)
        print(json.dumps(pt))

    art = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(art, "ann_recall_trajectory.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__" and not os.environ.get("ANN_ADAPTIVE_K"):
    main()


def adaptive_k_point(spark, label: str, sf_dir: str, k: int,
                     query_mod: int) -> dict:
    """The 'knob to turn is cell count' claim, measured: train the SAME
    IVF machinery with K = k cells (cells ~ sqrt(n)) instead of the
    registered fixed 4, and re-measure recall + probed fraction. The
    registered queries keep K=4 (bit-stable, oracle-twinned); this is the
    scale-path operating point the SCALE.md row commits to."""
    # k_cells is a first-class operator parameter as of r13 (the memo keys
    # by resolved k, so mixed-K runs cannot cross-poison)
    pt = q135_point(spark, label, sf_dir, query_mod, k_cells=k)
    pt["k_cells"] = k
    pt["query_mod"] = query_mod
    return pt


def main_adaptive() -> None:
    from kinesis_writer_spark.session import get_spark

    build_embeddings(SRC, f"{FIX}/sf1", 10)
    build_embeddings(SRC, f"{FIX}/sf10emb", 100)
    spark = get_spark("ann-adaptive-k")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"metric": "ann_adaptive_k", "points": []}
    for label, d, k, mod in [
        ("sf1", f"{FIX}/sf1", 4, 100),       # fixed-K control
        ("sf1", f"{FIX}/sf1", 32, 100),      # ~sqrt(20k)/4
        ("sf10", f"{FIX}/sf10emb", 4, 10000),
        ("sf10", f"{FIX}/sf10emb", 64, 10000),  # ~sqrt(200k)/7
    ]:
        pt = adaptive_k_point(spark, label, d, k, mod)
        out["points"].append(pt)
        print(json.dumps({kk: pt[kk] for kk in (
            "scale", "k_cells", "n_vectors", "recall_pct",
            "probed_fraction_pct", "secs") if kk in pt}))
    art = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(art, "ann_adaptive_k.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__" and os.environ.get("ANN_ADAPTIVE_K"):
    main_adaptive()
