"""ANN-index serving operators: shard-layout planning for a trained IVF
index.

After an index is trained and vectors are assigned to cells (q134's
machinery, similarity.py), serving it requires placing cells onto index
shards so query fan-out stays bounded and shard loads stay balanced. The
planner here is the classic LPT (longest-processing-time) greedy: blocks
sorted by descending size, each placed on the currently least-loaded shard.
LPT is within 4/3 of the optimal makespan — the standard bin-balance bound —
and is fully deterministic, so it hash-checks against the DuckDB twin.

Scale shape: the corpus-sized work is ONE groupBy (block sizes). The greedy
itself runs over the block table — thousands of rows at 100 TB, not
billions — expressed as a single-row ``F.aggregate`` fold over the sorted
block array (no driver-side loop, no collect): the plan stays inside the
query plan, the same pattern as the q251 BPE fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import tables
from .similarity import _km_assign_expr, ivf_assigned_sql_ctes, ivf_train_centroids

_N_SHARDS = 4


@register(
    "q253_ivf_shard_plan",
    oracle=f"""
    WITH RECURSIVE {ivf_assigned_sql_ctes()},
    blocks AS (
        SELECT a.cluster_id AS cell, e.label, COUNT(*)::BIGINT AS n
        FROM assigned a JOIN embeddings e ON a.vec_id = e.vec_id
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT cell, label, n,
               row_number() OVER (ORDER BY n DESC, cell, label) AS rk
        FROM blocks
    ),
    pack AS (
        SELECT 0 AS rk,
               list_transform(range(1, {_N_SHARDS + 1}), j -> 0::BIGINT) AS loads,
               list_transform(range(1, {_N_SHARDS + 1}), j -> 0::BIGINT) AS nblocks
        UNION ALL
        SELECT r.rk,
               list_transform(range(1, {_N_SHARDS + 1}),
                   j -> CASE WHEN j = list_position(p.loads, list_min(p.loads))
                             THEN p.loads[j] + r.n ELSE p.loads[j] END),
               list_transform(range(1, {_N_SHARDS + 1}),
                   j -> CASE WHEN j = list_position(p.loads, list_min(p.loads))
                             THEN p.nblocks[j] + 1 ELSE p.nblocks[j] END)
        FROM pack p JOIN ranked r ON r.rk = p.rk + 1
    ),
    final AS (SELECT loads, nblocks FROM pack ORDER BY rk DESC LIMIT 1)
    SELECT CAST(j - 1 AS BIGINT) AS shard_id,
           nblocks[CAST(j AS INT)] AS n_blocks,
           loads[CAST(j AS INT)] AS n_vectors
    FROM final, range(1, {_N_SHARDS + 1}) t(j)
    """,
)
def q253_ivf_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index shard layout: (trained-IVF cell × label) blocks packed onto
    ``_N_SHARDS`` serving shards by LPT greedy — blocks descending by size,
    each to the least-loaded shard (ties: lowest shard id). Returns one row
    per shard with its block count and vector load.

    The greedy is order-dependent, so it runs as one fold over the sorted
    block array inside a single-row aggregate — deterministic, in-plan, and
    independent of corpus size once block sizes are aggregated.
    """
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    cell = _km_assign_expr(ivf_train_centroids(embeddings, cache_key=sf_dir))
    blocks = (
        embeddings.select(cell.alias("cell"), "label")
        .groupBy("cell", "label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    # one row holding every block, in LPT order (n DESC, cell, label)
    ranked = blocks.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col("n")).alias("negn"),
                    F.col("cell").alias("cell"),
                    F.col("label").alias("label"),
                    F.col("n").alias("n"),
                )
            )
        ).alias("blocks")
    )
    init = F.array(
        *[
            F.struct(
                F.lit(0).cast("bigint").alias("load"),
                F.lit(s).cast("bigint").alias("shard"),
                F.lit(0).cast("bigint").alias("nblocks"),
            )
            for s in range(_N_SHARDS)
        ]
    )
    packed = ranked.select(
        F.aggregate(
            "blocks",
            init,
            # least-loaded shard = array_min over (load, shard, …) structs:
            # lexicographic struct order IS the (load ASC, shard ASC) rule
            lambda acc, b: F.transform(
                acc,
                lambda t: F.when(
                    t["shard"] == F.array_min(acc)["shard"],
                    F.struct(
                        (t["load"] + b["n"]).alias("load"),
                        t["shard"].alias("shard"),
                        (t["nblocks"] + F.lit(1)).alias("nblocks"),
                    ),
                ).otherwise(t),
            ),
        ).alias("plan")
    )
    return packed.select(F.explode("plan").alias("p")).select(
        F.col("p.shard").alias("shard_id"),
        F.col("p.nblocks").alias("n_blocks"),
        F.col("p.load").alias("n_vectors"),
    )
