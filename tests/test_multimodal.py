"""Multimodal plumbing: binary payload round trip, mapInPandas batch
shape/schema, deterministic stub features, decode stub contract."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from collimate_spark.catalog import load_table
from collimate_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    decode_image_stub,
    extract_features,
    with_binary_payload,
)


def test_binary_payload_roundtrip(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).limit(10)
    assets = with_binary_payload(docs)
    row = assets.first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.meta.n_bytes == len(row.payload)
    assert row.meta.mime == "text/plain"
    # payload bytes decode back to the original text
    joined = assets.join(docs, assets.asset_id == docs.doc_id).select(
        "text", F.col("payload").cast("string").alias("decoded")
    )
    assert all(r.text == r.decoded for r in joined.collect())


def test_feature_extraction_batch_shape(spark, sf_dir):
    assets = with_binary_payload(load_table(spark, "documents", sf_dir).limit(20))
    feats = assets.select("asset_id", "payload").mapInPandas(
        extract_features, FEATURE_SCHEMA
    )
    got = feats.collect()
    assert len(got) == 20
    for r in got:
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 1e-6  # normalized histogram
        assert 0 <= r.byte_mean <= 255
    # deterministic across runs
    again = assets.select("asset_id", "payload").mapInPandas(
        extract_features, FEATURE_SCHEMA
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_decode_stub_contract():
    with pytest.raises(NotImplementedError, match="codecs"):
        decode_image_stub(b"\x89PNG")
