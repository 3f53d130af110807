"""Multimodal column handling: opaque ``binary`` payloads + typed metadata
structs, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode step is a
deterministic fake behind ``decode_image_stub`` (clearly marked); the
Spark-side plumbing — schema, binary columns, batch iteration, partition
sizing — is real and tested (tests/test_multimodal.py). At 100 TB the
payloads live in Parquet binary columns co-partitioned with their
metadata; feature extraction is an embarrassingly-parallel mapInPandas
with batch size bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from collimate_spark.catalog import load_table


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Wrap each document as a multimodal asset: binary payload (utf-8
    bytes of the text standing in for image/audio bytes) + metadata
    struct. This is the storage pattern: payload column stays opaque,
    metadata is queryable/prunable without touching payload bytes."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.col("text").cast("binary")).alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan over binary assets: per-source byte stats +
    payload checksums, without decoding payloads. Demonstrates that
    metadata queries prune the payload column (check ReadSchema)."""
    assets = with_binary_payload(load_table(spark, "documents", sf_dir))
    return (
        assets.select(
            "asset_id",
            F.col("meta.source").alias("source"),
            F.col("meta.n_bytes").alias("n_bytes"),
            F.md5("payload").alias("payload_md5"),
        )
        .orderBy("asset_id")
    )


MULTIMODAL_META_SQL = """
SELECT doc_id AS asset_id,
       source,
       octet_length(CAST(text AS BLOB)) AS n_bytes,
       md5(text) AS payload_md5
FROM documents
ORDER BY asset_id
"""


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas feature extractor over binary payloads.

    STUB DECODE: real deployments call PIL/torchaudio here; this container
    has neither, so the "feature" is a deterministic 8-dim byte-histogram
    sketch of the payload — exercising the exact batch shape, Arrow
    transfer, and output schema a real decoder would use.
    """
    for pdf in batches:
        out = []
        for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
            b = bytes(payload)
            hist = [0.0] * 8
            for byte in b:
                hist[byte >> 5] += 1.0
            n = max(len(b), 1)
            out.append(
                {
                    "asset_id": asset_id,
                    "n_bytes": len(b),
                    "byte_mean": sum(b) / n,
                    "feature": [h / n for h in hist],
                }
            )
        yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])


def decode_image_stub(payload: bytes) -> None:
    """Placeholder for the real image decode (PIL.Image.open etc.)."""
    raise NotImplementedError(
        "image/audio codecs are not available in this container; "
        "swap in PIL/torchaudio in a real deployment"
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal feature pipeline: binary assets →
    mapInPandas(extract_features) → aggregate feature stats per source.
    Rows-only correctness (the stubbed decoder is engine-specific);
    determinism covered in tests."""
    assets = with_binary_payload(load_table(spark, "documents", sf_dir))
    feats = assets.select("asset_id", "payload").mapInPandas(extract_features, FEATURE_SCHEMA)
    src = with_binary_payload(load_table(spark, "documents", sf_dir)).select(
        "asset_id", F.col("meta.source").alias("source")
    )
    return (
        feats.join(src, "asset_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.round(F.avg("byte_mean"), 4).alias("avg_byte_mean"),
            F.round(F.avg(F.element_at("feature", 4)), 6).alias("avg_f3"),
        )
        .orderBy("source")
    )


QUERIES = {
    "multimodal_metadata": multimodal_metadata,
    "multimodal_features": multimodal_features,
}

ORACLES = {
    "multimodal_metadata": MULTIMODAL_META_SQL,
    # multimodal_features: rows-only (stubbed decoder)
}
