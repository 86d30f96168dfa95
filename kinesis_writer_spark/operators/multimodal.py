"""Multimodal column operators: opaque ``binary`` payloads with typed
metadata, decoded/feature-extracted via Arrow-batched ``mapInPandas``.

The decode step is REAL for PPM/BMP/PNG/baseline-JPEG images and PCM WAV
audio — complete dependency-free byte-format parsers in
functions/codecs.py (header grammar, endianness, BMP row padding, RIFF
chunk walking, JPEG huffman + IDCT + chroma upsampling), golden- and
round-trip-tested. q81 decodes genuine P6/BMP rasters; q257 decodes
genuine baseline JFIF streams; q93 walks genuine RIFF chunks before
frame-sampling the data chunk. Only formats that require external
libraries (MP3, H.264) fall back to the clearly-marked
structural-feature fake (``_fake_decode``).

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


# -- codec dispatch: real parsers for PPM/BMP/PNG/JPEG/WAV, fake fallback
# -- only for formats whose codecs genuinely need external libs (MP3/H.264)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic FALLBACK for formats whose codecs need external
    libraries (MP3/H.264): structural byte features an oracle can
    recompute. PPM/BMP/PNG/JPEG/WAV payloads never reach this —
    ``decode_media`` routes them to the real parsers in
    functions/codecs.py. Raises on None like a real codec would.
    """
    if payload is None:
        raise ValueError("cannot decode null payload")
    head = payload[:16]
    return {
        "n_bytes": len(payload),
        "first_byte": head[0] if head else None,
        "head_checksum": int(sum(head)),
    }


def decode_media(payload: bytes) -> dict:
    """Sniff the payload's magic and decode with the matching REAL parser
    (functions/codecs.py); unknown formats get the structural fallback.

    Returns a dict with ``kind`` plus format-specific fields — the shape a
    production codec UDF returns per record.
    """
    from ..functions import codecs as C

    if payload is None:
        raise ValueError("cannot decode null payload")
    if payload[:2] == b"P6":
        img = C.parse_ppm(bytes(payload))
        sr, sg, sb = img.channel_sums()
        return {
            "kind": "ppm",
            "n_bytes": len(payload),
            "width": img.width,
            "height": img.height,
            "maxval": img.maxval,
            "sum_r": sr,
            "sum_g": sg,
            "sum_b": sb,
        }
    if payload[:2] == b"BM":
        img = C.parse_bmp(bytes(payload))
        sr, sg, sb = img.channel_sums()
        return {
            "kind": "bmp",
            "n_bytes": len(payload),
            "width": img.width,
            "height": img.height,
            "maxval": 255,
            "sum_r": sr,
            "sum_g": sg,
            "sum_b": sb,
        }
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        img = C.parse_png(bytes(payload))
        sr, sg, sb = img.channel_sums()
        return {
            "kind": "png",
            "n_bytes": len(payload),
            "width": img.width,
            "height": img.height,
            "maxval": 255,
            "n_channels": img.n_channels,
            "sum_r": sr,
            "sum_g": sg,
            "sum_b": sb,
        }
    if payload[:2] == b"\xff\xd8":
        img = C.parse_jpeg(bytes(payload))
        sr, sg, sb = img.channel_sums()
        return {
            "kind": "jpeg",
            "n_bytes": len(payload),
            "width": img.width,
            "height": img.height,
            "maxval": 255,
            "n_channels": img.n_components,
            "sum_r": sr,
            "sum_g": sg,
            "sum_b": sb,
        }
    if payload[:4] == b"RIFF":
        wav = C.parse_wav(bytes(payload))
        return {
            "kind": "wav",
            "n_bytes": len(payload),
            "n_channels": wav.n_channels,
            "sample_rate": wav.sample_rate,
            "bits_per_sample": wav.bits_per_sample,
            "n_frames": wav.n_frames,
            "duration_ms": wav.duration_ms,
        }
    return {"kind": "unknown", **_fake_decode(payload)}


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


#: q81 raster geometry: 10x5 RGB = 150 pixel bytes behind a 12-byte
#: "P6\n10 5\n255\n" header.
_PPM_W, _PPM_H = 10, 5
_PPM_PIX = _PPM_W * _PPM_H * 3
_PPM_HEADER = f"P6\n{_PPM_W} {_PPM_H}\n255\n"
_BMP_STRIDE = (_PPM_W * 3 + 3) & ~3  # BMP rows pad to 4-byte boundaries


@register(
    "q81_multimodal_decode",
    oracle=f"""
    WITH src AS (
        SELECT doc_id,
               substr(repeat(CASE WHEN length(text) = 0 THEN ' ' ELSE text END,
                             CAST({_PPM_PIX} / length(CASE WHEN length(text) = 0
                                  THEN ' ' ELSE text END) + 1 AS INT)),
                      1, {_PPM_PIX}) AS pix
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'bmp' END AS kind,
           CASE WHEN doc_id % 2 = 0 THEN {len(_PPM_HEADER) + _PPM_PIX}
                ELSE {54 + _BMP_STRIDE * _PPM_H} END AS n_bytes,
           {_PPM_W} AS width, {_PPM_H} AS height,
           list_sum(list_transform(range(0, {_PPM_PIX // 3}),
               k -> ascii(substr(pix, k * 3 + 1, 1))))::BIGINT AS sum_r,
           list_sum(list_transform(range(0, {_PPM_PIX // 3}),
               k -> ascii(substr(pix, k * 3 + 2, 1))))::BIGINT AS sum_g,
           list_sum(list_transform(range(0, {_PPM_PIX // 3}),
               k -> ascii(substr(pix, k * 3 + 3, 1))))::BIGINT AS sum_b
    FROM src
    """,
)
def q81_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-decode pipeline over REAL bytes end-to-end: each document
    becomes a genuine 10x5 raster whose pixels are the doc's text bytes —
    even doc_ids as binary P6 PPM (synthesized JVM-side), odd doc_ids as
    24-bit BMP (write_bmp in the synth stage: bottom-up BGR rows, 4-byte
    stride padding) — and the decode stage dispatches by magic and parses
    the actual formats via functions/codecs inside Arrow-batched
    mapInPandas, emitting dimensions and exact per-channel sums.

    The oracle recomputes what a correct decoder MUST extract from pure
    byte arithmetic over the same text (fixture text is ASCII, so byte ==
    codepoint): both formats carry IDENTICAL pixel content, so the channel
    sums must agree with the arithmetic regardless of format — any header
    mis-parse, BGR/RGB transposition, row-order flip, or stride-padding
    leak flips the hash. The fake structural codec is no longer on this
    path — it remains only as the documented fallback for formats needing
    external libraries.
    """
    import pandas as pd

    from ..functions.codecs import write_bmp

    (documents,) = tables(spark, sf_dir, "documents")
    pix = F.expr(
        f"substring(repeat(CASE WHEN length(text) = 0 THEN ' ' ELSE text END, "
        f"CAST({_PPM_PIX} / length(CASE WHEN length(text) = 0 THEN ' ' ELSE text END) "
        f"+ 1 AS INT)), 1, {_PPM_PIX})"
    )
    src = documents.select("doc_id", F.encode(pix, "utf-8").alias("pix"))

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        (
                            _PPM_HEADER.encode("ascii") + bytes(px)
                            if did % 2 == 0
                            else write_bmp(_PPM_W, _PPM_H, bytes(px))
                        )
                        for did, px in zip(pdf["doc_id"], pdf["pix"])
                    ],
                }
            )

    payloads = src.mapInPandas(synth, "doc_id long, payload binary")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(decode_media)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": feats.map(lambda d: d["kind"]),
                    "n_bytes": feats.map(lambda d: d["n_bytes"]),
                    "width": feats.map(lambda d: d["width"]),
                    "height": feats.map(lambda d: d["height"]),
                    "sum_r": feats.map(lambda d: d["sum_r"]),
                    "sum_g": feats.map(lambda d: d["sum_g"]),
                    "sum_b": feats.map(lambda d: d["sum_b"]),
                }
            )

    return payloads.mapInPandas(
        decode,
        "doc_id long, kind string, n_bytes long, width int, height int, "
        "sum_r long, sum_g long, sum_b long",
    )


#: q257 content grammar, shared verbatim by the Spark synth stage and the
#: DuckDB oracle below: even doc_ids are FLAT images, odd doc_ids are
#: 8x8-block MOSAICS (block (bi,bj) is flat with its own color).
_J_R = "({i} * 37 + {bi} * 59 + {bj} * 83) % 256"
_J_G = "({i} * 101 + {bi} * 43 + {bj} * 23 + 53) % 256"
_J_B = "({i} * 193 + {bi} * 7 + {bj} * 11 + 11) % 256"


def _jpeg_rgb(did: int, bi: int, bj: int) -> tuple[int, int, int]:
    return (
        (did * 37 + bi * 59 + bj * 83) % 256,
        (did * 101 + bi * 43 + bj * 23 + 53) % 256,
        (did * 193 + bi * 7 + bj * 11 + 11) % 256,
    )


@register(
    "q257_jpeg_decode",
    oracle=f"""
    WITH src AS (
        SELECT doc_id,
               9 + doc_id % 24 AS w,
               7 + doc_id % 19 AS h
        FROM documents
    ),
    blocks AS (
        -- flat docs are a 1-block "mosaic" (bi = bj = 0 covers everything)
        SELECT s.doc_id, s.w, s.h, rb.bi, cb.bj,
               CASE WHEN s.doc_id % 2 = 1
                    THEN LEAST(8, s.w - 8 * cb.bj) ELSE s.w END
             * CASE WHEN s.doc_id % 2 = 1
                    THEN LEAST(8, s.h - 8 * rb.bi) ELSE s.h END AS n_px,
               {_J_R.format(i='s.doc_id', bi='rb.bi', bj='cb.bj')} AS r,
               {_J_G.format(i='s.doc_id', bi='rb.bi', bj='cb.bj')} AS g,
               {_J_B.format(i='s.doc_id', bi='rb.bi', bj='cb.bj')} AS b
        FROM src s,
             LATERAL (SELECT UNNEST(range(CASE WHEN s.doc_id % 2 = 1
                 THEN CAST(ceil(s.h / 8.0) AS BIGINT) ELSE 1 END)) AS bi) rb,
             LATERAL (SELECT UNNEST(range(CASE WHEN s.doc_id % 2 = 1
                 THEN CAST(ceil(s.w / 8.0) AS BIGINT) ELSE 1 END)) AS bj) cb
    ),
    yc AS (
        SELECT *,
            LEAST(255, GREATEST(0, FLOOR(0.299 * r + 0.587 * g + 0.114 * b + 0.5))) AS yy,
            LEAST(255, GREATEST(0, FLOOR(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0 + 0.5))) AS cb,
            LEAST(255, GREATEST(0, FLOOR(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0 + 0.5))) AS cr
        FROM blocks
    ),
    dec AS (
        SELECT doc_id, w, h, n_px,
            LEAST(255, GREATEST(0, FLOOR(yy + 1.402 * (cr - 128) + 0.5))) AS dr,
            LEAST(255, GREATEST(0, FLOOR(yy - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5))) AS dg,
            LEAST(255, GREATEST(0, FLOOR(yy + 1.772 * (cb - 128) + 0.5))) AS db
        FROM yc
    )
    SELECT doc_id, 'jpeg' AS kind,
           MIN(w) AS width, MIN(h) AS height,
           CAST(SUM(n_px * dr) AS BIGINT) AS sum_r,
           CAST(SUM(n_px * dg) AS BIGINT) AS sum_g,
           CAST(SUM(n_px * db) AS BIGINT) AS sum_b
    FROM dec
    GROUP BY doc_id
    """,
)
def q257_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG-decode pipeline over REAL baseline JFIF bytes end-to-end: each
    document becomes a raster (geometry and colors derived from doc_id)
    encoded by functions/codecs.write_jpeg — full huffman entropy coding,
    DCT, restart markers on every 5th doc — and the decode stage
    dispatches on the FFD8 magic inside Arrow-batched mapInPandas, running
    the real parse_jpeg (marker walk, canonical huffman decode, dequant,
    IDCT, chroma upsample, YCbCr->RGB). Even doc_ids are flat-color images
    cycling 4:2:0 / 4:2:2 / 4:4:4 subsampling; odd doc_ids are 8x8-block
    mosaics at 4:4:4, whose block-to-block DC jumps exercise the signed
    DC-difference huffman chain (magnitude categories + EXTEND) that a
    flat image never leaves zero.

    The oracle is exact, not tolerance-banded, because the encoder writes
    all-ones quantization tables and every 8x8 component block is flat by
    construction (mosaic blocks are aligned to the DCT grid; 4:4:4 keeps
    chroma blocks aligned too): each block's DCT is a lone DC coefficient
    that survives quantize/dequantize/IDCT bit-exactly, so the decoded
    colors are the closed-form floor(x+0.5) YCbCr round trip the SQL
    replicates per block — any huffman mis-decode, DC-predictor slip,
    dequant error, IDCT error, block mis-placement, or sampling-factor bug
    shifts a channel sum and flips the hash. Scale: one tiny CPU-bound
    codec call per row inside mapInPandas, no shuffle — decode parallelism
    equals input partitions.
    """
    import pandas as pd

    from ..functions.codecs import write_jpeg

    (documents,) = tables(spark, sf_dir, "documents")
    src = documents.select("doc_id")
    # The codec stage is CPU-bound Python: its parallelism equals input
    # partitions. A 100 TB scan has thousands of splits; a small local file
    # arrives as one, so fan out to the session's parallelism first (a
    # round-robin exchange of a bare id column — negligible data motion).
    par = spark.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par)

    _SUBS = ("4:2:0", "4:2:2", "4:4:4")

    def _pixels(did: int, w: int, h: int) -> bytes:
        import numpy as np

        if did % 2 == 0:  # flat
            return bytes(_jpeg_rgb(did, 0, 0)) * (w * h)
        img = np.empty((h, w, 3), dtype=np.uint8)
        for bi in range((h + 7) // 8):
            for bj in range((w + 7) // 8):
                img[bi * 8 : bi * 8 + 8, bj * 8 : bj * 8 + 8] = _jpeg_rgb(
                    did, bi, bj
                )
        return img.tobytes()

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 9 + did % 24, 7 + did % 19
                payloads.append(
                    write_jpeg(
                        w,
                        h,
                        _pixels(did, w, h),
                        quality=None,
                        subsampling="4:4:4" if did % 2 else _SUBS[did % 3],
                        restart_interval=1 if did % 5 == 0 else 0,
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    payloads = src.mapInPandas(synth, "doc_id long, payload binary")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(decode_media)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": feats.map(lambda d: d["kind"]),
                    "width": feats.map(lambda d: d["width"]),
                    "height": feats.map(lambda d: d["height"]),
                    "sum_r": feats.map(lambda d: d["sum_r"]),
                    "sum_g": feats.map(lambda d: d["sum_g"]),
                    "sum_b": feats.map(lambda d: d["sum_b"]),
                }
            )

    return payloads.mapInPandas(
        decode,
        "doc_id long, kind string, width int, height int, "
        "sum_r long, sum_g long, sum_b long",
    )


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
            keep_vals = [pdf[c].tolist() for c in keep_cols]
            for i, raw in enumerate(pdf[payload_col]):
                payload = bytes(raw)
                keys = tuple(col[i] for col in keep_vals)
                n_frames = (len(payload) + FRAME_BYTES - 1) // FRAME_BYTES
                for idx in range(0, n_frames, every_n):
                    frame = payload[idx * FRAME_BYTES : (idx + 1) * FRAME_BYTES]
                    rows.append(keys + (idx, len(frame), frame))
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


def frame_sample_wav(
    df: DataFrame,
    payload_col: str = "payload",
    keep: tuple[str, ...] = ("doc_id",),
    every_n: int = 4,
) -> DataFrame:
    """Media-aware frame sampling: REALLY parse each payload's RIFF/WAVE
    container (functions/codecs.parse_wav — chunk walking, fmt validation),
    then explode the PCM data chunk into every Nth fixed-size frame,
    carrying the audio metadata a downstream feature extractor needs.
    """
    import pandas as pd

    from ..functions.codecs import parse_wav

    keep_cols = list(keep)
    schema = (
        ", ".join(f"{c} long" for c in keep_cols)
        + ", sample_rate int, duration_ms long, frame_idx long, frame_len long, frame binary"
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            keep_vals = [pdf[c].tolist() for c in keep_cols]
            for i, payload in enumerate(pdf[payload_col]):
                wav = parse_wav(bytes(payload))
                data = wav.data
                keys = tuple(col[i] for col in keep_vals)
                n_frames = (len(data) + FRAME_BYTES - 1) // FRAME_BYTES
                for idx in range(0, n_frames, every_n):
                    frame = data[idx * FRAME_BYTES : (idx + 1) * FRAME_BYTES]
                    rows.append(
                        keys + (wav.sample_rate, wav.duration_ms, idx, len(frame), frame)
                    )
            yield pd.DataFrame(
                rows,
                columns=keep_cols
                + ["sample_rate", "duration_ms", "frame_idx", "frame_len", "frame"],
            )

    return df.mapInPandas(sample, schema)


@register(
    "q93_frame_sample",
    oracle=f"""
    WITH auds AS (
        SELECT doc_id,
               octet_length(CAST(text AS BLOB))
               + octet_length(CAST(text AS BLOB)) % 2 AS data_len
        FROM documents
    ),
    frames AS (
        SELECT doc_id, data_len,
               (data_len // 2 * 1000) // 8000 AS duration_ms,
               unnest(range(0, CAST(CEIL(data_len::DOUBLE / {FRAME_BYTES}) AS BIGINT), 4))
                   AS frame_idx
        FROM auds
    )
    SELECT doc_id, 8000 AS sample_rate, CAST(duration_ms AS BIGINT) AS duration_ms,
           frame_idx,
           LEAST({FRAME_BYTES}, data_len - frame_idx * {FRAME_BYTES}) AS frame_len
    FROM frames
    """,
)
def q93_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over REAL audio containers: each document's text
    bytes become the PCM payload of a genuine RIFF/WAVE file (44-byte
    canonical header, 16-bit mono 8 kHz — functions/codecs.write_wav), and
    the sampler must WALK THE CHUNKS (parse_wav) to locate the data chunk
    before exploding every 4th {FRAME_BYTES}-byte frame — a header
    mis-parse shifts every frame length and flips the hash.

    The oracle predicts the frame table with pure arithmetic: data length
    = text bytes padded to even (one 16-bit frame per 2 bytes), duration
    from the fmt-chunk rate. Expansion happens executor-side per Arrow
    batch, so a 100 TB corpus never materializes all frames at once.
    """
    import pandas as pd

    from ..functions.codecs import write_wav

    (documents,) = tables(spark, sf_dir, "documents")
    src = documents.select("doc_id", F.encode("text", "utf-8").alias("pcm"))

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["pcm"].map(
                        lambda b: write_wav(
                            bytes(b) + b"\x00" * (len(b) % 2),
                            n_channels=1,
                            sample_rate=8000,
                            bits_per_sample=16,
                        )
                    ),
                }
            )

    auds = src.mapInPandas(synth, "doc_id long, payload binary")
    frames = frame_sample_wav(auds, keep=("doc_id",), every_n=4)
    return frames.select("doc_id", "sample_rate", "duration_ms", "frame_idx", "frame_len")
