"""Table catalog over the driver-provided Parquet test tables.

The on-disk layout (one Parquet dataset per table under an sf dir) is the
engine's columnar store — the Spark-native analog of the reference's
directory-of-column-files model (/root/reference/index.js:604-641): typed,
dictionary-encoded, splittable, self-describing.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


#: The one documented type every ``events.ts`` consumer may rely on.
EVENTS_TS_DTYPE = "timestamp_ntz"

_NTZ_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def _normalize_events_ts(df: DataFrame) -> DataFrame:
    """Surface ``events.ts`` as TIMESTAMP_NTZ regardless of on-disk encoding.

    Driver testdata stores ts as parquet timestamp[us] without UTC
    adjustment, which Spark reads natively as TIMESTAMP_NTZ — the no-op
    fast path. Two legacy encodings are normalized timezone-independently
    (no NTZ↔LTZ session-tz cast, so correct under any caller session tz,
    including DST zones):

    - epoch-nanos BIGINT (parquet TIMESTAMP(NANOS) read under
      spark.sql.legacy.parquet.nanosAsLong): integer-divide to micros and
      add to the NTZ epoch — no double-precision loss.
    - TIMESTAMP (LTZ, parquet isAdjustedToUTC): take the absolute instant's
      micros (unix_micros is tz-independent) onto the NTZ epoch, i.e. the
      UTC wall-clock.
    """
    dtype = dict(df.dtypes).get("ts")
    if dtype == EVENTS_TS_DTYPE or dtype is None:
        return df
    if dtype == "bigint":
        return df.withColumn(
            "ts", F.expr(f"timestampadd(MICROSECOND, ts DIV 1000, {_NTZ_EPOCH})")
        )
    if dtype == "timestamp":
        return df.withColumn(
            "ts", F.expr(f"timestampadd(MICROSECOND, unix_micros(ts), {_NTZ_EPOCH})")
        )
    raise TypeError(f"events.ts: unsupported on-disk dtype {dtype!r}")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load one catalog table. Column pruning / predicate pushdown happen at
    the Parquet scan (verify with .explain: PushedFilters / ReadSchema).

    ``events.ts`` is always surfaced as ``EVENTS_TS_DTYPE`` (timestamp_ntz)
    — see ``_normalize_events_ts`` for the legacy encodings handled. The
    nanosAsLong conf is set here (runtime-settable) so the catalog works
    under ANY caller-provided SparkSession, not just
    collimate_spark.session's.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _normalize_events_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so spark.sql() works over the
    catalog — the engine's SQL front door."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
