"""Cross-engine deterministic hashing.

The dedup/similarity operators need hash functions that BOTH Spark and the
DuckDB oracle can compute identically, so the correctness gate compares the
*same* pipeline bit-for-bit (engine-native ``xxhash64``/``hash`` differ
between engines). We use the top 60 bits of MD5, which every engine exposes:

    Spark:  CAST(CONV(SUBSTRING(MD5(x), 1, 15), 16, 10) AS BIGINT)
    DuckDB: CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)

60 bits keeps the value positive in a signed 64-bit integer on both sides.

Also here: the 128-bit MD5 explicit-hash-key derivation (reference
AggRecord.java:231-243) as a Spark expression — decimal string, since
2^128-1 exceeds every fixed-width SQL integer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_60bit(col: Column, salt: str | Column | None = None) -> Column:
    """60-bit integer hash of a string column (optionally salted)."""
    base = col if salt is None else F.concat(F.lit(salt) if isinstance(salt, str) else salt, F.lit("#"), col)
    return F.conv(F.substring(F.md5(base.cast("binary")), 1, 15), 16, 10).cast("bigint")


def duckdb_md5_60bit(expr: str, salt: str | None = None) -> str:
    """DuckDB SQL text computing the identical 60-bit hash."""
    base = expr if salt is None else f"'{salt}' || '#' || ({expr})"
    return f"CAST(('0x' || substr(md5({base}), 1, 15)) AS BIGINT)"


def md5_uint128_decimal(col: Column) -> Column:
    """Kinesis-style EHK derivation as a Spark expression: decimal string of
    the big-endian 128-bit MD5 integer. Pure JVM (conv on two 64-bit halves
    would overflow, so we assemble via high*2^64 + low using DECIMAL(38) —
    but 2^128-1 needs 39 digits, so the final add is done as string math only
    when the top bit demands it; in practice we keep it simple: a vectorized
    Arrow-batched pandas UDF, used only by the sink's key derivation tests).
    """
    import hashlib

    import pandas
    from pyspark.sql.functions import pandas_udf

    def _derive_fn(s):
        return s.map(lambda v: str(int.from_bytes(hashlib.md5(v.encode("utf-8")).digest(), "big")))

    # explicit annotations: `from __future__ import annotations` would turn
    # inline hints into strings, which pandas_udf cannot resolve
    _derive_fn.__annotations__ = {"s": pandas.Series, "return": pandas.Series}
    return pandas_udf(_derive_fn, "string")(col)
