"""Multimodal column operators: opaque ``binary`` payloads with typed
metadata, decoded/feature-extracted via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is a
deterministic fake (clearly marked); everything Spark-side — schema, binary
columns, Arrow batch shape, mapInPandas signatures, partitioning — is real
and oracle/unit tested. Swapping the fake for PIL/ffmpeg is a one-function
change.

Scale notes: binary payloads ride inside Tungsten rows; mapInPandas streams
Arrow record batches (no per-row Python overhead) and preserves partitioning,
so decode parallelism equals input partitions at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import tables


@register(
    "q80_multimodal_join",
    oracle="""
    SELECT d.lang,
           COUNT(*) AS n_docs,
           CAST(SUM(octet_length(CAST(d.text AS BLOB))) AS BIGINT) AS total_payload_bytes,
           ROUND(AVG(sqrt(list_sum(list_transform(e.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS avg_norm,
           MIN(len(e.embedding)) AS dim
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY d.lang
    """,
)
def q80_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal row assembly: join text docs with their embedding vectors,
    carry the payload as a binary column, aggregate per language.
    """
    from ..functions.vectors import sq_norm

    documents, embeddings = tables(spark, sf_dir, "documents", "embeddings")
    rows = documents.join(embeddings, F.col("doc_id") == F.col("vec_id")).select(
        "lang",
        F.encode("text", "utf-8").alias("payload"),
        "embedding",
    )
    return rows.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.octet_length("payload")).alias("total_payload_bytes"),
        F.round(F.avg(F.sqrt(sq_norm("embedding"))), 4).alias("avg_norm"),
        F.min(F.size("embedding")).alias("dim"),
    )


# -- the deterministic fake codec (swap for a real one when available) ------


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image/audio decoder.

    A real deployment would decode here (PIL / libsndfile / ffmpeg); the
    container has none of those, so we extract structural byte features that
    an oracle can recompute. Raises on None like a real codec would.
    """
    if payload is None:
        raise ValueError("cannot decode null payload")
    head = payload[:16]
    return {
        "n_bytes": len(payload),
        "first_byte": head[0] if head else None,
        "head_checksum": int(sum(head)),
    }


def decode_features(df: DataFrame, payload_col: str = "payload", keep: tuple[str, ...] = ("doc_id",)) -> DataFrame:
    """mapInPandas decode stage: binary payload → typed feature columns.

    Arrow-batched; the generator signature (Iterator[pd.DataFrame] →
    Iterator[pd.DataFrame]) is the real production shape for a codec UDF.
    """
    import pandas as pd

    keep_cols = list(keep)
    schema = (
        ", ".join(f"{c} long" for c in keep_cols)
        + ", n_bytes long, first_byte long, head_checksum long"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[payload_col].map(_fake_decode)
            out = pd.DataFrame(
                {
                    **{c: pdf[c] for c in keep_cols},
                    "n_bytes": feats.map(lambda d: d["n_bytes"]),
                    "first_byte": feats.map(lambda d: d["first_byte"]),
                    "head_checksum": feats.map(lambda d: d["head_checksum"]),
                }
            )
            yield out

    return df.mapInPandas(decode, schema)


@register(
    "q82_grouped_normalize",
    oracle="""
    WITH norms AS (
        SELECT vec_id, label,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings
    ),
    stats AS (
        SELECT label, AVG(nrm) AS mu,
               CASE WHEN COUNT(*) > 1 THEN stddev_samp(nrm) ELSE 0.0 END AS sigma
        FROM norms GROUP BY label
    )
    SELECT n.vec_id, n.label,
           CAST(FLOOR(1000.0 * CASE WHEN s.sigma > 0 THEN (n.nrm - s.mu) / s.sigma
                                    ELSE 0.0 END) AS BIGINT) AS z_milli
    FROM norms n JOIN stats s ON n.label = s.label
    """,
)
def q82_grouped_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-label z-score of embedding norms.

    The pandas function receives each label group as one DataFrame (Arrow
    batch) — the canonical grouped-map shape for per-entity normalization /
    feature scaling in training pipelines. Norm computation stays JVM-side;
    only (vec_id, label, nrm) crosses into Python. FLOOR-scaled output keeps
    the cross-engine compare exact (stddev is order-sensitive in the last
    ulp, but 1e-3 granularity absorbs it).
    """
    import math

    import pandas as pd

    from ..functions.vectors import sq_norm

    (embeddings,) = tables(spark, sf_dir, "embeddings")
    norms = embeddings.select("vec_id", "label", F.sqrt(sq_norm("embedding")).alias("nrm"))

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["nrm"].mean()
        sigma = pdf["nrm"].std(ddof=1) if len(pdf) > 1 else 0.0
        z = (pdf["nrm"] - mu) / sigma if sigma and sigma > 0 else pdf["nrm"] * 0.0
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "label": pdf["label"],
                "z_milli": [int(math.floor(v * 1000.0)) for v in z],
            }
        )

    return norms.groupBy("label").applyInPandas(normalize, "vec_id long, label int, z_milli long")


@register(
    "q81_multimodal_decode",
    oracle="""
    SELECT doc_id,
           octet_length(CAST(text AS BLOB)) AS n_bytes,
           ascii(substr(text, 1, 1)) AS first_byte,
           list_sum(list_transform(range(1, 17), i -> ascii(substr(text, i, 1))))::BIGINT
               AS head_checksum
    FROM documents
    """,
)
def q81_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode pipeline end-to-end: text → binary payload column →
    Arrow-batched mapInPandas feature extraction. The oracle recomputes the
    fake codec's byte features in SQL (corpus is ASCII, so byte == codepoint).
    """
    (documents,) = tables(spark, sf_dir, "documents")
    payloads = documents.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return decode_features(payloads)


# -- frame sampling / resize (video-shaped payloads) ------------------------

FRAME_BYTES = 256  # fake codec: fixed-size frames inside the payload


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    keep: tuple[str, ...] = ("doc_id",),
    every_n: int = 4,
) -> DataFrame:
    """Frame-sampling stage: explode each "video" payload into one row per
    sampled frame (every Nth fixed-size chunk), carrying the frame bytes.

    The chunking is the deterministic fake codec (a real one would call
    ffmpeg per Arrow batch); the output shape — keep-columns + frame_idx +
    frame binary — and the row-expansion inside mapInPandas are the real
    production plumbing. Expansion happens executor-side per batch, so a
    100 TB corpus never materializes all frames at once.
    """
    import pandas as pd

    keep_cols = list(keep)
    schema = (
        ", ".join(f"{c} long" for c in keep_cols)
        + ", frame_idx long, frame_len long, frame binary"
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row[payload_col])
                n_frames = (len(payload) + FRAME_BYTES - 1) // FRAME_BYTES
                for idx in range(0, n_frames, every_n):
                    frame = payload[idx * FRAME_BYTES : (idx + 1) * FRAME_BYTES]
                    rows.append(
                        tuple(row[c] for c in keep_cols) + (idx, len(frame), frame)
                    )
            yield pd.DataFrame(rows, columns=keep_cols + ["frame_idx", "frame_len", "frame"])

    return df.mapInPandas(sample, schema)


def resize_payload(df: DataFrame, payload_col: str = "payload", target_bytes: int = 1024) -> DataFrame:
    """Resize stage (fake codec): truncate-or-zero-pad every payload to a
    fixed size — the schema/batch shape of a real thumbnailer. Adds
    ``resized`` (binary) and ``orig_bytes``; preserves all other columns.
    """
    import pandas as pd

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += ", resized binary, orig_bytes long"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col].map(bytes)
            out = pdf.copy()
            out["resized"] = payloads.map(
                lambda b: b[:target_bytes].ljust(target_bytes, b"\x00")
            )
            out["orig_bytes"] = payloads.map(len)
            yield out

    return df.mapInPandas(resize, schema)


@register(
    "q93_frame_sample",
    oracle=f"""
    WITH vids AS (
        SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes FROM documents
    ),
    frames AS (
        SELECT doc_id,
               unnest(range(0, CAST(CEIL(n_bytes::DOUBLE / {FRAME_BYTES}) AS BIGINT), 4))
                   AS frame_idx,
               n_bytes
        FROM vids
    )
    SELECT doc_id, frame_idx,
           LEAST({FRAME_BYTES}, n_bytes - frame_idx * {FRAME_BYTES}) AS frame_len
    FROM frames
    """,
)
def q93_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video-shaped binary payloads (every 4th fixed-size
    frame), checked against pure frame-arithmetic in SQL: the mapInPandas
    expansion must produce exactly the frame indexes and lengths the
    arithmetic predicts.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    vids = documents.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    frames = frame_sample(vids, keep=("doc_id",), every_n=4)
    return frames.select("doc_id", "frame_idx", "frame_len")
