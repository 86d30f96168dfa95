"""User-facing Python UDTF surface (Spark 4): table functions callable from
SQL with lateral correlation.

The engine's UDF story is: built-in expressions in every hot path (see
SCALE.md), Arrow-batched pandas UDFs when Python is unavoidable, and — for
user extensions that RETURN ROWS — the Python UDTF API demonstrated here.
The n-gram UDTF below deliberately duplicates what `zip_with`/`slice` do
natively (q78/q79) so the oracle can verify the UDTF machinery itself;
row-at-a-time Python is the price of arbitrary user logic, paid only on
the explicitly-opted-in path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from ..registry import register
from ._util import tables


@udtf(returnType="pos int, gram string", useArrow=True)
class NgramUDTF:
    """Emit (position, n-gram) rows for a whitespace-tokenized text.

    ``useArrow=True`` → ArrowEvalPythonUDTF: rows cross the Python boundary
    as Arrow batches instead of pickled rows (the same batching the pandas
    UDF paths use), which is the default posture for every Python-touching
    operator in this engine.
    """

    def eval(self, text: str, n: int):  # noqa: A002
        if text is None:
            return
        words = text.split(" ")
        for i in range(len(words) - n + 1):
            yield i, " ".join(words[i : i + n])


def register_udtfs(spark: SparkSession) -> None:
    spark.udtf.register("ngrams", NgramUDTF)


@register(
    "q113_udtf_ngrams",
    oracle="""
    WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
    grams AS (
        SELECT lang, unnest(list_transform(range(1, len(w) - 1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
        FROM d
    )
    SELECT lang, gram, COUNT(*) AS n
    FROM grams
    GROUP BY lang, gram
    HAVING COUNT(*) >= 3
    """,
)
def q113_udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral-correlated Python UDTF: per document, the registered
    ``ngrams(text, 3)`` table function expands trigrams; repeated trigrams
    (n ≥ 3) are counted per language. The plan is scan → BatchEvalPythonUDTF
    → hash aggregate; the UDTF runs inside the scan stage at scan
    parallelism, so even the slow path scales linearly. The oracle computes
    the identical expansion natively — verifying the UDTF row contract,
    correlation, and null handling.
    """
    register_udtfs(spark)
    (documents,) = tables(spark, sf_dir, "documents")
    documents.createOrReplaceTempView("documents_udtf")
    return spark.sql(
        """
        SELECT d.lang, g.gram, COUNT(*) AS n
        FROM documents_udtf d, LATERAL ngrams(d.text, 3) g
        GROUP BY d.lang, g.gram
        HAVING COUNT(*) >= 3
        """
    )


@register(
    "q156_cogroup_order_gaps",
    oracle="""
    WITH gaps AS (
        SELECT o_custkey,
               CAST(EXTRACT(day FROM o_orderdate
                    - LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                             ORDER BY o_orderdate, o_orderkey))
                    AS BIGINT) AS gap_days
        FROM orders
    ),
    stats AS (
        SELECT o_custkey AS custkey,
               COUNT(*) AS n_gaps,
               ROUND(MEDIAN(gap_days), 1) AS median_gap_days
        FROM gaps WHERE gap_days IS NOT NULL
        GROUP BY o_custkey
    )
    SELECT s.custkey, c.c_mktsegment, s.n_gaps, s.median_gap_days
    FROM stats s JOIN customer c ON c.c_custkey = s.custkey
    """,
)
def q156_cogroup_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped pandas processing — the last piece of the Python-UDF API
    family (pandas_udf → mapInPandas → applyInPandas(WithState) → UDTF →
    THIS): orders and the customer dim arrive as two aligned pandas frames
    per key and the median inter-order day gap is computed imperatively.
    The oracle reproduces it relationally (LAG + MEDIAN), proving the
    imperative path agrees with the declarative one.

    THE scale lesson of this operator: cogroup invokes Python once per
    KEY. With per-customer keys the calls are ~1 ms of pure overhead on
    frames of ~10 rows — measured 17 s at sf0.1 for 15k customers. The
    key here is therefore a BUCKET (``custkey % 64``): 64 Arrow-batched
    invocations, each computing per-customer stats vectorized inside
    pandas (groupby/diff/median). Same results, two orders of magnitude
    less call overhead — bucket the cogroup key whenever entity groups
    are small. Shuffle-wise both sides exchange once on the bucket key;
    per-task memory is one bucket's frames.
    """
    import pandas as pd

    orders, customer = tables(spark, sf_dir, "orders", "customer")
    ob = orders.withColumn("bucket", (F.col("o_custkey") % 64).cast("int"))
    cb = customer.withColumn("bucket", (F.col("c_custkey") % 64).cast("int"))

    def gaps(key, odf: "pd.DataFrame", cdf: "pd.DataFrame"):
        cols = ["custkey", "c_mktsegment", "n_gaps", "median_gap_days"]
        if odf.empty or cdf.empty:
            return pd.DataFrame(columns=cols)
        od = odf.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        od = od.assign(gap=od.groupby("o_custkey")["o_orderdate"].diff().dt.days)
        g = (
            od.dropna(subset=["gap"])
            .groupby("o_custkey")["gap"]
            .agg(["count", "median"])
            .reset_index()
        )
        if g.empty:
            return pd.DataFrame(columns=cols)
        seg = cdf.set_index("c_custkey")["c_mktsegment"]
        out = pd.DataFrame(
            {
                "custkey": g["o_custkey"].astype("int64"),
                "c_mktsegment": g["o_custkey"].map(seg),
                "n_gaps": g["count"].astype("int64"),
                "median_gap_days": g["median"].astype(float).round(1),
            }
        )
        return out.dropna(subset=["c_mktsegment"])

    return (
        ob.groupBy("bucket")
        .cogroup(cb.groupBy("bucket"))
        .applyInPandas(
            gaps,
            "custkey bigint, c_mktsegment string, n_gaps bigint, median_gap_days double",
        )
    )
