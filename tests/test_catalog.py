"""events.ts dtype contract: every consumer may rely on one documented
type (catalog.EVENTS_TS_DTYPE == timestamp_ntz) regardless of the on-disk
encoding — round-2's bench-killing regression was a consumer assuming an
accidental dtype."""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from collimate_spark.catalog import (  # noqa: E402
    EVENTS_TS_DTYPE,
    _normalize_events_ts,
    load_table,
)

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")


def test_events_ts_dtype_is_documented_type(spark):
    ev = load_table(spark, "events", SF_DIR)
    assert dict(ev.dtypes)["ts"] == EVENTS_TS_DTYPE


def test_legacy_nanos_bigint_normalizes_without_precision_loss(spark):
    # 2021-03-28 02:30:00.123456 UTC in epoch nanos — inside the EU DST
    # spring-forward gap, where a session-tz NTZ cast would corrupt.
    nanos = 1616898600123456789
    df = spark.createDataFrame([(nanos,)], "ts bigint")
    out = _normalize_events_ts(df)
    assert dict(out.dtypes)["ts"] == EVENTS_TS_DTYPE
    row = out.select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("s")).first()
    assert row["s"] == "2021-03-28 02:30:00.123456"


def test_legacy_ltz_normalizes_tz_independently(spark):
    # An LTZ instant must surface as its UTC wall-clock whatever the
    # session tz is — exercised under a DST zone to catch offset-shift bugs.
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Europe/Berlin")
        df = spark.createDataFrame(
            [("2021-03-28 02:30:00.5",)], "s string"
        ).select(F.to_timestamp("s").alias("ts"))
        assert dict(df.dtypes)["ts"] == "timestamp"
        out = _normalize_events_ts(df)
        assert dict(out.dtypes)["ts"] == EVENTS_TS_DTYPE
        got = out.select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("s")).first()
        # 02:30 Berlin on 2021-03-28 does not exist (spring-forward); Spark
        # resolves the parse to the absolute instant 1616895000500000 µs =
        # 01:30:00.5 UTC. The NTZ normalization must land on exactly that
        # UTC wall-clock, not a Berlin-shifted one.
        assert got["s"] == "2021-03-28 01:30:00.500000"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
