"""r9 task #2 acceptance: at a fixture ABOVE the labels broadcast gate,
the edge list must be exchanged once across rounds (layout-preserving
checkpoint) and per-round time must be flat. Gate is patched to 0 so the
sf10 graph (22.2M canonical edges, 313k labels) runs the non-broadcast
path on both algorithms."""
import sys, time
sys.path.insert(0, "/root/repo")
from kinesis_writer_spark.session import get_spark
from kinesis_writer_spark.operators import dedup

SF = "/tmp/sfspot_v4_r100"
spark = get_spark("cc_above_gate_probe")
spark.sparkContext.setLogLevel("ERROR")

dedup.CC_LABELS_BROADCAST_MAX_ROWS = 0  # force the >gate path

t0 = time.time()
pairs = dedup._neardup_pairs(spark, SF)
print(f"pair table: {pairs.count()} edges in {time.time()-t0:.1f}s", flush=True)

labels = {}
for algo in ("minlabel", "star"):
    t0 = time.time()
    comps = dedup.connected_components(
        pairs, src="doc_a", dst="doc_b", edges_distinct=True,
        driver_max_edges=0, algorithm=algo, max_iters=60,
    )
    n = comps.count()
    dt = time.time() - t0
    rt = (dedup._components_star.last_round_times if algo == "star"
          else dedup.connected_components.last_round_times)
    print(f"{algo} (above-gate): {n} nodes in {dt:.1f}s; "
          f"{len(rt)} rounds, per-round {rt}", flush=True)
    labels[algo] = comps

# bit-identity between the two above-gate paths at this scale (r10)
from pyspark.sql import functions as F
a, b = labels["minlabel"].alias("a"), labels["star"].alias("b")
mism = (
    a.join(b, F.col("a.node") == F.col("b.node"), "full")
    .filter(
        F.col("a.comp").isNull()
        | F.col("b.comp").isNull()
        | (F.col("a.comp") != F.col("b.comp"))
    )
    .count()
)
print(f"label equality: mismatched={mism}", flush=True)
