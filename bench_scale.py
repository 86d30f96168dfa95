"""Scale-trajectory bench: measure registry queries across synthetic
decades (sf0.1 -> sf1 -> sf3 -> sf10 -> sf30 -> sf100) and report per-step
scaling ratios, raw and drift-normalized.

Promoted from artifacts/bench_sf1_spot.py (r9 verdict task #5): this is
the canonical scale harness; the normalization arithmetic (min-of-shots
paired-probe normalization, step ratios) lives in
kinesis_writer_spark/scalebench.py and is unit-tested in
tests/test_scalebench.py, so a harness change can't silently skew the
cross-scale ratios. artifacts/bench_sf1_spot.py is now a shim onto this
module — the historical artifact commands keep working.

The engine's 100 TB story is plan-shape-based (banded equi-joins, no
all-pairs, no single-task funnels); these artifacts add measured points
one or more decades up. /root/testdata stops at sf0.1, so larger scales
are synthesized by replicating each input table with SHIFTED KEYS and
PERTURBED text (v4 fixture):

* documents: doc_id += replica * n_docs; words whose CONTENT hash falls in
  a fixed 1/4 bucket (hash(w) % 4 = 0) get a per-replica "~rK" suffix so
  replicas of the same doc are NOT near-duplicates — content-keyed
  mutation is a bijection on the shared vocabulary, so within-replica
  near-dup similarity is preserved EXACTLY and the truth set replicates
  linearly by construction. Docs whose words all hash outside the bucket
  would keep cross-replica Jaccard >= 0.8 (the v3 "clique leak"); those —
  CLOSED over their sf0.1 truth-pair partners — get EVERY word suffixed
  instead. Fixture history (v1 quadratic truth growth, v2 density-down
  bias, v3 clique leak) is in FIXTURES.md; v1-v4 ratios are NOT mutually
  comparable.
* lineitem: l_orderkey/l_partkey/l_suppkey += replica * (max+1) — the
  co-purchase graph grows by disjoint replica blocks, keeping basket sizes
  and degree distribution constant.

Each query runs memo-cold (shared caches cleared), min of 2 decorrelated
passes, through the noop sink, on one calib-gated session. Every measured
run is paired with a calibration probe shot; see scalebench.py for why
normalization divides by the MIN shot per (query, scale).

GATE CROSSINGS: the dup-graph consumers (q148, q255) straddle
CC_DRIVER_MAX_EDGES (and at sf100, CC_LABELS_BROADCAST_MAX_ROWS) between
scale points; their ratios then compare STRATEGIES, not one strategy at
two sizes — read the per-step ratios with the gate positions in mind.

Run:  PYTHONPATH=/root/repo python bench_scale.py \
          --scales 10,30,100 --queries q206_incremental_dedup --out X.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SPOT = ["q220_lsh_recall_eval", "q193_prefix_filter_join", "q206_incremental_dedup",
        "q54_simhash_neardup", "q219_random_walks",
        "q148_pagerank_neardup_graph", "q255_cluster_aware_split",
        "q257_jpeg_decode"]
SRC = "/root/testdata/sf0.1"
DST_TMPL = "/tmp/sfspot_v4_r{n}"  # v4: content-keyed mutation + leak closure
REPLICAS = 10


def _leak_closure(con, src: str) -> list:
    """doc_ids needing full mutation: docs whose 1/4-bucket mutation leaves
    cross-replica word-3gram Jaccard >= 0.8 (the clique leak), closed over
    their sf0.1 truth-pair partners so no genuine near-dup pair straddles
    the partial/full mutation boundary."""
    leaking = {
        r[0]
        for r in con.sql(
            f"""
            WITH rep AS (
                SELECT doc_id, array_to_string(
                    list_transform(string_split(text, ' '),
                        w -> CASE WHEN hash(w) % 4 = 0 THEN w || '~r0' ELSE w END),
                    ' ') AS mtext
                FROM '{src}/documents.parquet'),
            d AS (SELECT doc_id, string_split(mtext, ' ') ws FROM rep),
            sh AS (
                SELECT doc_id, len(ws) - 2 AS total,
                    len(list_filter(range(1, len(ws) - 1),
                        i -> ws[i] NOT LIKE '%~r0' AND ws[i+1] NOT LIKE '%~r0'
                             AND ws[i+2] NOT LIKE '%~r0')) AS clean
                FROM d WHERE len(ws) >= 3)
            SELECT doc_id FROM sh WHERE clean * 1.0 / (2 * total - clean) >= 0.8
            """
        ).fetchall()
    }
    pairs = con.sql(
        f"""
        WITH d AS (
            SELECT doc_id, string_split(text, ' ') ws
            FROM '{src}/documents.parquet'
            WHERE len(string_split(text, ' ')) >= 3),
        idx AS (SELECT doc_id, unnest(range(1, len(ws) - 1)) AS i, ws FROM d),
        sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s FROM idx),
        sz AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id da, b.doc_id db, COUNT(*) c
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY ALL)
        SELECT da, db FROM inter
        JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
        WHERE c * 1.0 / (x.n + y.n - c) >= 0.8
        """
    ).fetchall()
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    closure, frontier = set(leaking), list(leaking)
    while frontier:
        for nb in adj.get(frontier.pop(), ()):
            if nb not in closure:
                closure.add(nb)
                frontier.append(nb)
    return sorted(closure)


def build_fixture(src: str, dst: str, replicas: int = REPLICAS) -> None:
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    n_docs = con.sql(f"SELECT COUNT(*) FROM '{src}/documents.parquet'").fetchone()[0]
    full = _leak_closure(con, src)
    full_set = ", ".join(str(i) for i in full) or "-1"
    print(f"full-mutation closure: {len(full)} docs", file=sys.stderr)
    con.sql(
        f"""
        COPY (
            WITH rep AS (
                SELECT d.doc_id + r.r * {n_docs} AS doc_id,
                       array_to_string(
                           list_transform(string_split(d.text, ' '),
                               w -> CASE WHEN d.doc_id IN ({full_set})
                                              OR hash(w) % 4 = 0
                                         THEN w || '~r' || r.r
                                         ELSE w END),
                           ' ') AS text,
                       d.lang, d.source
                FROM '{src}/documents.parquet' d, range({replicas}) r(r)
            )
            SELECT doc_id, text, lang, source, length(text) AS n_chars
            FROM rep
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
        """
    )
    mo, mp, ms = con.sql(
        f"SELECT MAX(l_orderkey)+1, MAX(l_partkey)+1, MAX(l_suppkey)+1 "
        f"FROM '{src}/lineitem.parquet'"
    ).fetchone()
    con.sql(
        f"""
        COPY (
            SELECT l_orderkey + r.r * {mo} AS l_orderkey,
                   l_partkey + r.r * {mp} AS l_partkey,
                   l_suppkey + r.r * {ms} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM '{src}/lineitem.parquet' l, range({replicas}) r(r)
        ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)
        """
    )


# backwards-compatible alias (artifacts/bench_sf1_spot.py history)
build_sf1 = build_fixture


def _scale_label(replicas: int) -> str:
    sf = replicas / 10.0
    return f"sf{sf:g}"


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="10",
                    help="comma list of replica counts (10=sf1.0, 100=sf10, 1000=sf100)")
    ap.add_argument("--queries", default=",".join(SPOT))
    ap.add_argument("--out", default="bench_sf1_spot.json",
                    help="artifact filename, written under artifacts/")
    ap.add_argument("--base", default=SRC,
                    help="measured base scale dir (default /root/testdata/sf0.1)")
    ap.add_argument("--base-label", default="sf0.1")
    ap.add_argument("--passes", type=int, default=3,
                    help="decorrelated measurement passes per (query, scale); "
                    "3 since r11 — 2-run points carried visible noise (r10 "
                    "verdict: q193's same-artifact sf10 runs spread 40.6/65.6s)")
    ap.add_argument("--force-distributed-cc", action="store_true",
                    help="zero the CC driver union-find AND labels-broadcast "
                    "gates so every scale point runs the pure distributed "
                    "star path — isolates trajectory from strategy-crossing "
                    "(r10 verdict task #4)")
    args = ap.parse_args(argv)
    scales = [int(s) for s in args.scales.split(",")]
    spot = [q for q in args.queries.split(",") if q]

    dirs = [(args.base_label, args.base)]
    for n in scales:
        dst = DST_TMPL.format(n=n)
        if not os.path.exists(os.path.join(dst, "lineitem.parquet")):
            t0 = time.time()
            build_fixture(SRC, dst, replicas=n)
            print(f"built {dst} ({n} replicas) in {time.time() - t0:.1f}s", file=sys.stderr)
        dirs.append((_scale_label(n), dst))

    from kinesis_writer_spark import registry
    from kinesis_writer_spark.calibration import calib_gate, calibrate, load_gate
    from kinesis_writer_spark.memo import clear_all as clear_memos
    from kinesis_writer_spark.scalebench import summarize_results
    from kinesis_writer_spark.session import get_spark

    if args.force_distributed_cc:
        from kinesis_writer_spark.operators import dedup

        dedup.CC_DRIVER_MAX_EDGES = 0
        dedup.CC_LABELS_BROADCAST_MAX_ROWS = 0

    # The cross-scale RATIO is only drift-immune when the host epoch is
    # STABLE across the run; a mid-run slowdown hits one scale's shots
    # more than the other's and can even invert a ratio (observed late
    # r7: a fixed-work-per-row query measured 0.78x at 10x rows while
    # the probe swung 3.8->10.9 s). Gate on the probe itself — loadavg
    # misses epoch-level slowdowns entirely — then stamp start/end
    # calibrations so a drift-corrupted run is visible in the artifact.
    gate = load_gate()

    spark = get_spark("bench_scale")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()
    cgate = calib_gate(spark, max_wait_s=1200.0)
    calib = calibrate(spark)

    def run(name: str, sf_dir: str) -> None:
        queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()

    # warm the JVM once per scale on the cheapest spot query
    for _, sf_dir in dirs:
        run("q54_simhash_neardup", sf_dir)
        spark.catalog.clearCache()
        clear_memos()

    # Paired per-measurement calibration shots; normalization is
    # min-of-shots per (query, scale) — rationale and arithmetic in
    # kinesis_writer_spark/scalebench.py (unit-tested).
    from kinesis_writer_spark.calibration import _probe_once, _resolved_reference

    ref_calib = _resolved_reference()["calib_sec"]

    def _reclaim() -> None:
        # Shuffle-file cleanup is GC-triggered; on a big heap the JVM can
        # go a whole measurement loop without a full GC, so each timed
        # run's shuffle files pile up on disk until ENOSPC (observed at
        # the sf100 point). Force the reclaim BETWEEN measurements —
        # outside the timed window — so disk stays bounded and no timed
        # run pays the GC pause. (session.py additionally sets
        # spark.cleaner.periodicGC.interval=5min as the in-run backstop.)
        spark.sparkContext._jvm.System.gc()

    results: dict[str, dict] = {}
    for pass_i in range(args.passes):
        for name in spot:
            for label, sf_dir in dirs:
                clear_memos()
                _reclaim()
                shot = _probe_once(spark)
                t0 = time.time()
                run(name, sf_dir)
                dt = round(time.time() - t0, 3)
                spark.catalog.clearCache()
                entry = results.setdefault(
                    name,
                    {
                        "runs": {lbl: [] for lbl, _ in dirs},
                        "calib_shots": {lbl: [] for lbl, _ in dirs},
                    },
                )
                entry["runs"][label].append(dt)
                entry["calib_shots"][label].append(shot)

    labels = [lbl for lbl, _ in dirs]
    summarize_results(results, labels, ref_calib)

    from kinesis_writer_spark.calibration import adjudicate_epoch

    calib_end = calibrate(spark)
    out = {
        "metric": "sf1_spot_scale_ratio",
        "replicas": scales,
        "scale_labels": labels,
        "fixture_version": 4,  # content-keyed mutation + leak closure; NOT comparable w/ v1-v3
        "timing_method": (
            f"memo-cold min of {args.passes} decorrelated runs, JVM warmed; "
            "*_norm figures are min-of-shots drift-normalized by paired "
            f"calib probe shots (ref {ref_calib}s; scalebench.py)"
        ),
        "harness": "bench_scale.py (promoted r10; arithmetic in scalebench.py)",
        "force_distributed_cc": args.force_distributed_cc,
        "queries": results,
        "max_ratio": max(e["ratio"] for e in results.values()),
        "calibration": calib,
        "calibration_end": calib_end,
        "load_gate": gate,
        "calib_gate": cgate,
        "epoch": adjudicate_epoch(calib, calib_end, cgate),
    }
    art_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")
    os.makedirs(art_dir, exist_ok=True)
    path = os.path.join(art_dir, args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}))
    for name, e in results.items():
        chain = " -> ".join(f"{e[f'{lbl}_sec']}s" for lbl in labels)
        print(f"{name}: {chain}  (total {e['ratio']}x; steps {e['step_ratios']}; "
              f"norm steps {e['step_ratios_norm']})")


if __name__ == "__main__":
    main()
