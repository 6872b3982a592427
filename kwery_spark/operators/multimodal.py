"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2.10 /
training-data-pipeline extensions).

The corpus has no real media files, so assets are synthesized
deterministically: ``payload`` = the document text UTF-8-encoded into an
opaque ``binary`` column, plus a typed metadata struct (format, width,
height, sample_rate) derived from doc_id. That makes every byte-level
result oracle-checkable (text is pure ASCII, so DuckDB's varchar
functions mirror Spark's binary ones byte-for-byte) while the Spark-side
plumbing — binary columns, schema-carrying metadata, Arrow-batched
mapInPandas decode, frame slicing — is exactly what a real media pipeline
ships.

The actual image/audio decode is STUBBED: ``_decode_real`` raises
NotImplementedError (no codec libraries in this environment); the
deterministic fake decoder stands in so the distributed plumbing (UDF
signature, batch shape, partitioning) is real and tested.

Scale notes: payloads never leave the executors; metadata-only ops prune
the payload column at the parquet scan; the decode path streams Arrow
record batches through the Python worker with no driver materialization.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from kwery_spark.catalog import table
from kwery_spark.registry import register

_FORMATS = ("png", "jpeg", "wav")


def assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → synthetic multimodal asset table:
    (doc_id, payload binary, format, width, height, sample_rate)."""
    docs = table(spark, sf_dir, "documents")
    fmt = F.element_at(F.array(*[F.lit(x) for x in _FORMATS]), (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        fmt.alias("format"),
        (64 * (F.col("doc_id") % 4 + 1)).cast("int").alias("width"),
        (48 * (F.col("doc_id") % 3 + 1)).cast("int").alias("height"),
        (8000 * (F.col("doc_id") % 2 + 1)).cast("int").alias("sample_rate"),
    )


# Oracle-side mirror of the asset synthesis (varchar payload stands in for
# the binary — ASCII text makes them byte-identical).
_ASSET_CTE = """
    WITH assets AS (
        SELECT doc_id,
               text AS payload,
               ['png', 'jpeg', 'wav'][CAST(doc_id % 3 + 1 AS INTEGER)] AS format,
               CAST(64 * (doc_id % 4 + 1) AS INTEGER) AS width,
               CAST(48 * (doc_id % 3 + 1) AS INTEGER) AS height,
               CAST(8000 * (doc_id % 2 + 1) AS INTEGER) AS sample_rate
        FROM documents
    )
"""


@register(
    "mm_asset_metadata",
    oracle=_ASSET_CTE
    + """
    SELECT format,
           count(*) AS n_assets,
           CAST(sum(strlen(payload)) AS BIGINT) AS total_bytes,
           CAST(max(strlen(payload)) AS BIGINT) AS max_bytes,
           CAST(min(width) AS INTEGER) AS min_width,
           CAST(max(height) AS INTEGER) AS max_height
    FROM assets
    GROUP BY format
    """,
)
def mm_asset_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata profiling over the opaque payloads: per-format counts and
    byte/dimension stats. Catalyst prunes everything but the grouped
    columns + octet length into the scan — the payload bytes themselves
    are only touched for length."""
    a = assets(spark, sf_dir)
    return a.groupBy("format").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.length("payload").cast("long")).alias("total_bytes"),
        F.max(F.length("payload")).cast("long").alias("max_bytes"),
        F.min("width").alias("min_width"),
        F.max("height").alias("max_height"),
    )


@register(
    "mm_frame_sample",
    oracle=_ASSET_CTE
    + """
    SELECT doc_id,
           CAST(unnest(range(0, (strlen(payload) - 1) // 256 + 1)) AS INTEGER)
               AS frame_idx,
           unnest(list_transform(range(0, (strlen(payload) - 1) // 256 + 1),
                  i -> md5(substring(payload, CAST(i * 256 + 1 AS BIGINT), 64))))
               AS frame_md5
    FROM assets
    WHERE format = 'wav'
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling on the binary payload: treat every 256 bytes as a
    frame, keep the first 64 bytes of each frame (a thumbnail/audio-window
    stand-in), emit its md5. Pure JVM expressions — posexplode over a
    computed frame index, binary substring, no Python in the loop."""
    a = assets(spark, sf_dir).filter(F.col("format") == "wav")
    n_frames = (F.length("payload") - 1) / F.lit(256) + 1
    return a.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_frames.cast("int") - 1),
                lambda i: F.md5(F.expr("payload").substr(i * 256 + 1, F.lit(64))),
            )
        ).alias("frame_idx", "frame_md5"),
    )


def _decode_real(payload: bytes, fmt: str):
    """Real media decode — requires codec libraries absent from this
    environment (PIL / libsndfile / ffmpeg). Kept as the explicit stub
    boundary: swap this in production."""
    raise NotImplementedError(
        f"no codec available for {fmt!r}; install Pillow/soundfile and "
        "replace _decode_fake with _decode_real"
    )


def _decode_fake(payload: bytes, fmt: str) -> dict:
    """Deterministic stand-in decoder: a 16-bin byte histogram plus a
    sha256 content id — same output shape a real feature extractor would
    produce, reproducible everywhere."""
    hist = [0] * 16
    for b in payload:
        hist[b >> 4] += 1
    return {
        "content_sha256": hashlib.sha256(payload).hexdigest(),
        "byte_hist": hist,
        "mean_byte": float(sum(payload)) / len(payload) if payload else 0.0,
    }


_HIST_ORACLE_BINS = ",\n         ".join(
    f"CAST(len(regexp_extract_all(payload, '[\\x{b:x}0-\\x{b:x}f]')) AS VARCHAR)"
    for b in range(16)
)


@register(
    "mm_decode_features",
    oracle=_ASSET_CTE
    + f"""
    SELECT doc_id,
       sha256(payload) AS content_sha256,
       concat_ws(',',
         {_HIST_ORACLE_BINS}
       ) AS hist_csv,
       CAST(list_sum(list_transform(range(1, strlen(payload) + 1),
                                    i -> ascii(payload[i]))) AS DOUBLE)
           / strlen(payload) AS mean_byte
    FROM assets
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via Arrow-batched
    mapInPandas — the canonical multimodal decode shape. The 16-bin byte
    histogram is rendered as one CSV string (the grading hasher can't
    factorize list cells); payloads are pure-ASCII text, so the oracle
    mirrors the decode char-by-char in DuckDB (sha256 + per-nibble-bin
    regexp counts + mean code). mean_byte is a single integral-sum /
    integer-length division — bit-identical across engines, no rounding.

    Scale: each Python worker sees an iterator of Arrow batches; payload
    bytes stay on the executors, output is fixed-width features."""

    def decode(batches):
        for pdf in batches:
            feats = [_decode_fake(p, f) for p, f in zip(pdf["payload"], pdf["format"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content_sha256": [x["content_sha256"] for x in feats],
                    "hist_csv": [
                        ",".join(str(n) for n in x["byte_hist"]) for x in feats
                    ],
                    "mean_byte": [x["mean_byte"] for x in feats],
                }
            )

    a = assets(spark, sf_dir).select("doc_id", "payload", "format")
    return a.mapInPandas(
        decode,
        "doc_id long, content_sha256 string, hist_csv string, mean_byte double",
    )


@register(
    "mm_resize_plan",
    oracle=_ASSET_CTE
    + """
    SELECT doc_id, format, width, height,
           CAST(greatest(width // 2, 32) AS INTEGER) AS out_width,
           CAST(greatest(height // 2, 32) AS INTEGER) AS out_height,
           (width * height) > (256 * 96) AS needs_downscale
    FROM assets
    WHERE format IN ('png', 'jpeg')
    """,
)
def mm_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning from typed metadata only — computes target
    dimensions (half-size, floor 32px) without touching payload bytes, so
    the parquet scan prunes the binary column entirely. The actual pixel
    resample lives behind _decode_real's stub boundary."""
    a = assets(spark, sf_dir).filter(F.col("format").isin("png", "jpeg"))
    return a.select(
        "doc_id",
        "format",
        "width",
        "height",
        F.greatest(F.floor(F.col("width") / 2).cast("int"), F.lit(32)).alias("out_width"),
        F.greatest(F.floor(F.col("height") / 2).cast("int"), F.lit(32)).alias("out_height"),
        ((F.col("width") * F.col("height")) > (256 * 96)).alias("needs_downscale"),
    )
