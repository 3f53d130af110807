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


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load one catalog table. Column pruning / predicate pushdown happen at
    the Parquet scan (verify with .explain: PushedFilters / ReadSchema).

    events.ts is TIMESTAMP(NANOS) on disk — Spark reads it as epoch-nanos
    long (spark.sql.legacy.parquet.nanosAsLong); convert to TimestampType
    (micros) with integer division so no double-precision loss occurs.
    The conf is set here (runtime-settable) so the catalog works under ANY
    caller-provided SparkSession, not just collimate_spark.session's.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so spark.sql() works over the
    catalog — the engine's SQL front door."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
