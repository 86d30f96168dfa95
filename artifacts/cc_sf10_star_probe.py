"""Acceptance probe (r9 task #1): star vs minlabel CC at the sf10 fixture.
Measures distributed rounds + wall seconds on the same memoized pair table."""
import sys, time
sys.path.insert(0, "/root/repo")
from kinesis_writer_spark.session import get_spark
from kinesis_writer_spark.operators import dedup

SF = "/tmp/sfspot_v4_r100"
spark = get_spark("cc_sf10_probe")
spark.sparkContext.setLogLevel("ERROR")

t0 = time.time()
pairs = dedup._neardup_pairs(spark, SF)
n_pairs = pairs.count()
print(f"pair table: {n_pairs} edges in {time.time()-t0:.1f}s", flush=True)

results = {}
for algo in ("star", "minlabel"):
    t0 = time.time()
    comps = dedup.connected_components(
        pairs, src="doc_a", dst="doc_b", edges_distinct=True,
        driver_max_edges=0, algorithm=algo, max_iters=60,
    )
    n = comps.count()
    dt = time.time() - t0
    rounds = getattr(dedup._components_star, "last_rounds", None) if algo == "star" else None
    print(f"{algo}: {n} labeled nodes in {dt:.1f}s"
          + (f" ({rounds} star rounds)" if rounds else ""), flush=True)
    results[algo] = comps

# fixpoint equality on the full sf10 graph (count-based full compare)
a, b = results["star"].alias("a"), results["minlabel"].alias("b")
mism = a.join(b, "node").filter("a.comp != b.comp").count()
ca, cb = results["star"].count(), results["minlabel"].count()
print(f"equality: star={ca} minlabel={cb} mismatched={mism}", flush=True)
