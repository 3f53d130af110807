"""Storage layout for the columnar store: partitioned and bucketed writes.

At 100 TB the dominant costs are scan volume and shuffle volume; the
storage layout is where both are won:

- ``write_partitioned``: hive-style partition directories (e.g. by date) →
  partition pruning eliminates scan volume for time-ranged queries.
- ``write_bucketed`` / ``read_bucketed``: pre-shuffle the table once at
  write time into N hash buckets on the join key; every subsequent join or
  aggregation on that key runs WITHOUT an Exchange (verified by
  tests/test_storage.py asserting the join plan is shuffle-free). This is
  the Spark-native answer to the co-located join problem — pay the shuffle
  once, reuse it forever.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Hive-partitioned Parquet: one directory per partition value.
    Readers filtering on partition_cols scan only matching directories
    (partition pruning — visible as 'PartitionFilters' in explain)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed external table: hash-partitioned into n_buckets files on
    bucket_cols (+ optionally sorted within buckets, enabling sort-merge
    joins with neither shuffle nor sort)."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int | None = None,
) -> None:
    """Range-clustered Parquet: global range partition on cluster_cols +
    sort within each partition, so every output file covers a narrow,
    largely disjoint key range. Parquet footers carry per-file/row-group
    min/max for the cluster columns, and selective filters then skip
    whole files at scan time — the single-dimension answer to Z-ORDER,
    and the third layout lever next to hive partitioning (pruning on
    low-cardinality values) and bucketing (shuffle-free joins). Costs one
    range shuffle at write; wins every selective scan thereafter
    (verified by tests/test_storage.py against the actual footer stats)."""
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


# Interchange formats the engine reads/writes natively. Parquet is the
# canonical store (the reference's typed-binary-columnar analog); ORC is
# the second columnar citizen (same pushdown/stats story, different
# ecosystem); json/csv are row-interchange only — no pushdown, no stats —
# kept for export paths. Avro needs the external spark-avro jar, which is
# deliberately not assumed (import-gated in tests).
INTERCHANGE_FORMATS = ("parquet", "orc", "json", "csv")


def write_format(df: DataFrame, path: str, fmt: str, **options: str) -> None:
    """Write ``df`` at ``path`` in any supported interchange format.
    Columnar formats keep column stats + predicate pushdown; csv gets a
    header by default so the reference's converter can round-trip it."""
    if fmt not in INTERCHANGE_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {INTERCHANGE_FORMATS}")
    writer = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", True)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def read_format(spark: SparkSession, path: str, fmt: str, schema=None) -> DataFrame:
    """Read ``path`` back. Columnar formats carry their schema; csv/json
    accept an explicit schema (ALWAYS pass one in production — schema
    inference is an extra full scan)."""
    if fmt not in INTERCHANGE_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {INTERCHANGE_FORMATS}")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        reader = reader.option("inferSchema", True)
    return reader.load(path)


def read_evolving(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Read Parquet batches whose schemas drifted (columns added over
    time) as ONE DataFrame: mergeSchema unions the footer schemas and
    back-fills missing columns with NULLs — the append-only ingest
    pattern where new feeds gain columns without rewriting history.
    Pair with ingest.merge_manifests for the profile-side story."""
    return spark.read.option("mergeSchema", True).parquet(*paths)


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_file_mb: float = 128,
    sort_within_by: list[str] | None = None,
) -> tuple[int, int]:
    """Compact a Parquet directory suffering the small-files problem into
    ~``target_file_mb`` outputs. Returns (files_before, files_after).

    The 100 TB rationale: every file costs a namenode/listing round-trip,
    a footer read, and a scheduler task; streaming sinks and partitioned
    appends routinely leave thousands of KB-sized files. Compaction sizes
    the output count off the directory's actual byte size (not row
    counts), rewrites once via coalesce — a shuffle-FREE narrow repack —
    and atomically swaps directories. With ``sort_within_by`` it instead
    range-repartitions on those columns (one shuffle) so the rewrite also
    re-establishes clustering (min/max pruning) while compacting.

    Local-FS note: the swap uses two renames (not atomic vs readers); on
    object stores you'd write to a new prefix and flip a manifest/pointer.
    """
    import math
    import os
    import shutil
    import uuid

    size = 0
    n_before = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                size += os.path.getsize(os.path.join(root, f))
                n_before += 1
    n_out = max(1, math.ceil(size / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if sort_within_by:
        df = df.repartitionByRange(n_out, *[F.col(c) for c in sort_within_by])
    else:
        df = df.coalesce(n_out)
    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    old = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    n_after = sum(
        1
        for root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    return n_before, n_after


def read_binary_dir(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Ingest a directory of raw media/blob files via Spark's binaryFile
    source: one row per file with (path, modificationTime, length,
    content) — the standard on-ramp for multimodal corpora stored as
    loose files rather than parquet-packed binary columns. Column
    pruning applies: a query over (path, length) never reads content
    bytes. Feed the result to operators/multimodal.extract_features after
    renaming content -> payload."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


ZORDER_BITS = 16


def zorder_value(df: DataFrame, cols: list[str], bits: int = ZORDER_BITS) -> DataFrame:
    """Append a ``_z`` column: the Morton (z-order) interleave of the
    given numeric columns, each min/max-scaled to ``bits`` bits via a
    broadcast 1-row stats agg. Pure JVM bit arithmetic — no UDF.

    Range-partitioning on ``_z`` gives MULTI-dimensional data skipping:
    each output file covers a small hyper-rectangle of the key space, so
    min/max footer stats prune scans on ANY of the interleaved columns —
    the Delta/Iceberg OPTIMIZE ZORDER pattern, expressed with plain
    DataFrame ops."""
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"__min_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__max_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(stats))
    scaled = []
    for c in cols:
        lo, hi = F.col(f"__min_{c}"), F.col(f"__max_{c}")
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
        q = F.least(
            F.lit((1 << bits) - 1),
            F.floor((F.col(c).cast("double") - lo) / span * (1 << bits)).cast("long"),
        )
        scaled.append(q)
    z = F.lit(0).cast("long")
    n = len(cols)
    for b in range(bits):
        for i, q in enumerate(scaled):
            z = z.bitwiseOR(F.shiftleft(F.shiftright(q, b).bitwiseAND(F.lit(1)), b * n + i))
    return out.withColumn("_z", z).drop(*[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])


def write_zorder_clustered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 16, bits: int = ZORDER_BITS
) -> None:
    """Write Parquet range-partitioned on the z-order interleave of
    ``cols``: one range shuffle, then each file covers a compact
    hyper-rectangle -> footer min/max prune on every z-ordered column.
    Compare write_range_clustered, which clusters on ONE key ordering."""
    zdf = zorder_value(df, cols, bits)
    zdf.repartitionByRange(n_files, F.col("_z")).drop("_z").write.mode("overwrite").parquet(path)


def write_versioned(df: DataFrame, table_dir: str, note: str = "") -> int:
    """Versioned snapshot write — the minimal table-format core (what
    Delta/Iceberg layer under MERGE/time travel): each write lands in an
    immutable ``v=N`` directory, then a tiny ``_versions.json`` manifest
    commit makes it visible. Readers resolve the manifest FIRST, so a
    half-written snapshot is invisible (manifest commit = atomicity
    point; on object stores use a conditional put). Returns the new
    version number. Old versions stay readable -> time travel, audit,
    and safe concurrent readers during rewrites."""
    import json
    import os

    os.makedirs(table_dir, exist_ok=True)
    manifest_path = os.path.join(table_dir, "_versions.json")
    versions = []
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            versions = json.load(f)
    v = (versions[-1]["version"] + 1) if versions else 0
    path = os.path.join(table_dir, f"v={v}")
    df.write.mode("overwrite").parquet(path)
    n_rows = df.sparkSession.read.parquet(path).count()
    versions.append({"version": v, "path": f"v={v}", "rows": n_rows, "note": note})
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(versions, f)
    os.replace(tmp, manifest_path)  # atomic manifest commit
    return v


def read_versioned(spark: SparkSession, table_dir: str, version: int | None = None) -> DataFrame:
    """Time-travel read: latest version by default, or any retained
    ``version`` — resolved through the manifest, never by listing data
    directories (half-written snapshots are invisible)."""
    import json
    import os

    with open(os.path.join(table_dir, "_versions.json")) as f:
        versions = json.load(f)
    if version is None:
        entry = versions[-1]
    else:
        matches = [e for e in versions if e["version"] == version]
        if not matches:
            raise ValueError(f"version {version} not found; have {[e['version'] for e in versions]}")
        entry = matches[0]
    return spark.read.parquet(os.path.join(table_dir, entry["path"]))
