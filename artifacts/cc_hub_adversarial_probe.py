"""r10 (r9 VERDICT task #4): star CC's worst-case shape — a high-degree
hub mixed with long chains, above the broadcast gate.

The small-star step conceptually replicates each node's smaller neighbors
to m(u); the worry was that a hub with millions of smaller leaves spikes
the intermediate before `.distinct()`. Structurally the join emits exactly
ONE row per input edge ((u,v) -> (v, m(u))) plus one node-sized min table,
so the intermediate is bounded by |E| + |V| per step — this probe measures
that bound holding on the adversarial fixture, recording per-round edge
counts (now exposed as _components_star.last_round_rows) alongside times.

Fixture (built distributed, nothing driver-side):
* hub node 6_000_000 with 5M SMALLER leaves (ids 0..5M-1) — the worst
  orientation: m(hub)=0 must be routed to every leaf by small-star;
* a diameter-4096 chain (ids 7_000_000..7_004_096) attached to the hub —
  exercises the O(log^2 n) rounds regime in the same run;
* 50 detached chains of length 64 — separate components that must NOT
  merge with the hub component.

Gates forced off (driver union-find AND labels broadcast), so this runs
the pure distributed star path — the 100 TB regime.

Run:  PYTHONPATH=/root/repo python artifacts/cc_hub_adversarial_probe.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from kinesis_writer_spark.session import get_spark
from kinesis_writer_spark.operators import dedup

HUB = 6_000_000
N_LEAVES = 5_000_000
CHAIN_BASE = 7_000_000
CHAIN_LEN = 4096
DETACHED_BASE = 8_000_000
N_DETACHED = 50
DETACHED_LEN = 64

spark = get_spark("cc_hub_adversarial_probe")
spark.sparkContext.setLogLevel("ERROR")
dedup.CC_LABELS_BROADCAST_MAX_ROWS = 0  # force the >gate path

# canonical src < dst edges, all built as DataFrame ops (no driver loops)
leaves = spark.range(N_LEAVES).select(
    F.col("id").alias("doc_a"), F.lit(HUB).alias("doc_b")
)
chain = spark.range(CHAIN_LEN).select(
    (F.col("id") + CHAIN_BASE).alias("doc_a"),
    (F.col("id") + CHAIN_BASE + 1).alias("doc_b"),
)
bridge = spark.range(1).select(
    F.lit(HUB).alias("doc_a"), F.lit(CHAIN_BASE).alias("doc_b")
)
detached = (
    spark.range(N_DETACHED * DETACHED_LEN)
    .select(
        (F.col("id") / DETACHED_LEN).cast("long").alias("c"),
        (F.col("id") % DETACHED_LEN).alias("i"),
    )
    .filter(F.col("i") < DETACHED_LEN - 1)
    .select(
        (DETACHED_BASE + F.col("c") * 1000 + F.col("i")).alias("doc_a"),
        (DETACHED_BASE + F.col("c") * 1000 + F.col("i") + 1).alias("doc_b"),
    )
)
edges = leaves.unionByName(chain).unionByName(bridge).unionByName(detached)
edges = edges.repartition(32).localCheckpoint()
n_edges = edges.count()
print(f"fixture: {n_edges} canonical edges "
      f"(hub degree {N_LEAVES}, chain diameter {CHAIN_LEN}, "
      f"{N_DETACHED} detached chains)", flush=True)

t0 = time.time()
print(f"loop start unix: {t0:.3f}", flush=True)
comps = dedup.connected_components(
    edges, src="doc_a", dst="doc_b", edges_distinct=True,
    driver_max_edges=0, algorithm="star", max_iters=60,
)
n_nodes = comps.count()
dt = time.time() - t0
rt = dedup._components_star.last_round_times
rr = dedup._components_star.last_round_rows
print(f"star (above-gate): {n_nodes} nodes in {dt:.1f}s; "
      f"{len(rt)} rounds", flush=True)
print(f"per-round times: {rt}", flush=True)
print(f"boundary GC reclaims (r11, outside timed rounds): "
      f"{getattr(dedup._components_star, 'last_boundary_gcs', [])}", flush=True)
print(f"per-round edge rows (after large-star, after small-star): {rr}", flush=True)
peak = max(max(a, b) for a, b in rr)
print(f"peak materialized edge rows: {peak} "
      f"({peak / n_edges:.2f}x the input edge count)", flush=True)
print(f"converged: {dedup._components_star.last_converged}", flush=True)

# correctness: hub component = leaves + hub + attached chain, labeled 0;
# each detached chain labeled by its own min
agg = comps.groupBy("comp").count().orderBy("comp")
rows = agg.collect()
expect_hub_size = N_LEAVES + 1 + CHAIN_LEN + 1  # leaves + hub + chain nodes
ok_hub = rows[0]["comp"] == 0 and rows[0]["count"] == expect_hub_size
ok_detached = (
    len(rows) == 1 + N_DETACHED
    and all(r["count"] == DETACHED_LEN for r in rows[1:])
    and all(
        r["comp"] == DETACHED_BASE + k * 1000
        for k, r in enumerate(rows[1:])
    )
)
print(f"hub component: comp={rows[0]['comp']} size={rows[0]['count']} "
      f"(expect 0 / {expect_hub_size}) -> {'OK' if ok_hub else 'WRONG'}", flush=True)
print(f"detached components: {len(rows)-1} of {N_DETACHED}, sizes+labels "
      f"{'OK' if ok_detached else 'WRONG'}", flush=True)
sys.exit(0 if (ok_hub and ok_detached) else 1)
