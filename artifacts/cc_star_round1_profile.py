"""r10 task #3 diagnosis: split star CC's above-gate round 1 (21.7 s in
the r9 probe vs ~3-6 s later rounds) into its constituent steps at the
sf10 v4 fixture (22.2M canonical edges, 313k labels), gate patched to 0.

Replicates _components_star's pre-loop + round-1 body with explicit
timing so the shave targets the measured lump, not a guess."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from kinesis_writer_spark.session import get_spark
from kinesis_writer_spark.operators import dedup
from kinesis_writer_spark.operators._util import checkpoint_clean

SF = "/tmp/sfspot_v4_r100"
spark = get_spark("cc_star_round1_profile")
spark.sparkContext.setLogLevel("ERROR")
dedup.CC_LABELS_BROADCAST_MAX_ROWS = 0

t0 = time.time()
pairs = dedup._neardup_pairs(spark, SF)
n_pairs = pairs.count()
print(f"pair table: {n_pairs} edges in {time.time()-t0:.1f}s", flush=True)


def step(name, f):
    t = time.time()
    r = f()
    print(f"  {name}: {time.time()-t:.2f}s", flush=True)
    return r


# --- pre-loop (edges_distinct=True path) ---
e0 = pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
nodes = (
    e0.select(F.col("u").alias("node"))
    .unionByName(e0.select(F.col("v").alias("node")))
    .distinct()
)
cur = step("pre: checkpoint_clean(e0)", lambda: checkpoint_clean(e0))
nodes_ckpt = step("pre: checkpoint_clean(nodes)", lambda: checkpoint_clean(nodes))
step("pre: nodes count", lambda: nodes_ckpt.count())

# --- round 1, large-star ---
mn = cur.groupBy(F.col("u").alias("n")).agg(F.min("v").alias("m"))
ls = step(
    "r1 large-star: join+distinct+checkpoint",
    lambda: checkpoint_clean(
        cur.join(mn, cur["v"] == mn["n"], "left")
        .select(cur["u"], F.coalesce(mn["m"], cur["v"]).alias("v"))
        .distinct()
    ),
)
print(f"    large-star rows: {ls.count()}", flush=True)
step(
    "r1 sig(large)",
    lambda: ls.agg(
        F.count(F.lit(1)),
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
    ).first(),
)

# --- round 1, small-star ---
mn2 = step(
    "r1 small-star: mn2 agg+checkpoint",
    lambda: checkpoint_clean(
        ls.groupBy(F.col("u").alias("n")).agg(F.min("v").alias("m"))
    ),
)
small = step(
    "r1 small-star: join+union+distinct+checkpoint",
    lambda: checkpoint_clean(
        ls.join(mn2, ls["u"] == mn2["n"])
        .select(ls["v"].alias("u"), mn2["m"].alias("v"))
        .unionByName(mn2.select(F.col("n").alias("u"), F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    ),
)
print(f"    small-star rows: {small.count()}", flush=True)
step(
    "r1 sig(small)",
    lambda: small.agg(
        F.count(F.lit(1)),
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
    ).first(),
)
print("done", flush=True)
