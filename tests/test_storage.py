"""Storage-layout tests: bucketed joins must be shuffle-free; partitioned
reads must prune."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from collimate_spark.catalog import load_table
from collimate_spark.sources.storage import (
    read_bucketed,
    write_bucketed,
    write_partitioned,
)


def _final_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    write_bucketed(li, "li_b", str(tmp_path / "li_b"), ["l_orderkey"], 8, ["l_orderkey"])
    write_bucketed(orders, "ord_b", str(tmp_path / "ord_b"), ["o_orderkey"], 8, ["o_orderkey"])
    try:
        a = read_bucketed(spark, "li_b")
        b = read_bucketed(spark, "ord_b")
        joined = (
            a.join(b, a.l_orderkey == b.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _final_plan(joined)
        # the join itself consumes bucket layout directly: the only Exchange
        # allowed is the one for the final small aggregation
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    orders = load_table(spark, "orders", sf_dir).withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_part")
    write_partitioned(orders, path, ["order_year"])
    back = spark.read.parquet(path).filter(F.col("order_year") == 1995)
    sc = back.sparkSession.sparkContext
    plan = sc._jvm.PythonSQLUtils.explainString(back._jdf.queryExecution(), "formatted")
    assert "PartitionFilters: [isnotnull(order_year" in plan
    got = back.count()
    expect = orders.filter(F.year("o_orderdate") == 1995).count()
    assert got == expect > 0


def test_range_clustered_files_have_narrow_key_ranges(spark, sf_dir, tmp_path):
    """Range clustering must produce files whose cluster-key min/max spans
    are narrow and largely disjoint — the property that lets Parquet
    footer stats skip whole files for selective filters."""
    import glob

    import pyarrow.parquet as pq

    from collimate_spark.catalog import load_table
    from collimate_spark.sources.storage import write_range_clustered

    li = load_table(spark, "lineitem", sf_dir)
    out = str(tmp_path / "clustered")
    write_range_clustered(li, out, ["l_orderkey"], n_files=8)
    spans = []
    lo_all, hi_all = None, None
    for f in glob.glob(f"{out}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index("l_orderkey")
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        spans.append((lo, hi))
        lo_all = lo if lo_all is None else min(lo_all, lo)
        hi_all = hi if hi_all is None else max(hi_all, hi)
    assert len(spans) >= 4
    global_span = hi_all - lo_all
    avg_span = sum(h - l for l, h in spans) / len(spans)
    # each file covers ~1/n of the key space, not the whole range
    assert avg_span < global_span / (len(spans) / 2)
    # a point filter overlaps at most 2 files' ranges
    probe = (lo_all + hi_all) // 2
    overlapping = sum(1 for l, h in spans if l <= probe <= h)
    assert overlapping <= 2


def test_read_evolving_merges_schemas(spark, tmp_path):
    """Schema evolution: a later batch adds a column; the merged read
    exposes the union schema with NULLs for the old batch's rows."""
    from collimate_spark.sources.storage import read_evolving

    p1, p2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    spark.createDataFrame([(1, "a")], "id: long, v: string").write.parquet(p1)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id: long, v: string, score: double"
    ).write.parquet(p2)
    got = read_evolving(spark, [p1, p2])
    assert set(got.columns) == {"id", "v", "score"}
    rows = {r.id: r for r in got.collect()}
    assert rows[1].score is None and rows[2].score == 9.5


def test_orc_roundtrip_pushes_filters(spark, sf_dir, tmp_path):
    from collimate_spark.sources.storage import read_format, write_format

    orders = load_table(spark, "orders", sf_dir)
    path = str(tmp_path / "orders_orc")
    write_format(orders, path, "orc")
    back = read_format(spark, path, "orc").filter(F.col("o_orderkey") < 100).select(
        "o_orderkey", "o_totalprice"
    )
    sc = spark.sparkContext
    plan = sc._jvm.PythonSQLUtils.explainString(back._jdf.queryExecution(), "formatted")
    # ORC scans must push the predicate and prune to the 2-column projection
    assert "PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey,100)]" in plan
    assert "ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>" in plan
    assert back.count() == orders.filter(F.col("o_orderkey") < 100).count() > 0


def test_csv_json_roundtrip_counts(spark, sf_dir, tmp_path):
    from collimate_spark.sources.storage import read_format, write_format

    nation = load_table(spark, "nation", sf_dir)
    n = nation.count()
    for fmt in ("csv", "json"):
        path = str(tmp_path / f"nation_{fmt}")
        write_format(nation, path, fmt)
        back = read_format(spark, path, fmt, schema=nation.schema)
        assert back.count() == n
        assert set(back.columns) == set(nation.columns)


def test_write_format_rejects_unknown(spark, sf_dir, tmp_path):
    import pytest as _pytest

    from collimate_spark.sources.storage import write_format

    nation = load_table(spark, "nation", sf_dir)
    with _pytest.raises(ValueError):
        write_format(nation, str(tmp_path / "x"), "xml")


def test_dynamic_partition_pruning_on_dim_filter(spark, sf_dir, tmp_path):
    """A fact table partitioned on order_year joined to a FILTERED dim
    must scan only the matching partitions even though the filter is on
    the dim side — Spark's dynamic partition pruning (the mechanism that
    turns star-join queries into partial scans at 100 TB)."""
    orders = load_table(spark, "orders", sf_dir).withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    write_partitioned(orders, path, ["order_year"])
    fact = spark.read.parquet(path)
    # dim must be an INDEPENDENT table with a filter Catalyst cannot fold
    # into a static partition predicate, else static pruning wins instead
    dim_path = str(tmp_path / "year_dim")
    orders.select("order_year").distinct().withColumn(
        "tag", F.when(F.col("order_year") == 1995, "keep").otherwise("drop")
    ).write.mode("overwrite").parquet(dim_path)
    dim = spark.read.parquet(dim_path).filter(F.col("tag") == "keep")
    joined = fact.join(dim, "order_year").groupBy("order_year").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan or "dynamicpruning" in plan.lower()
    rows = joined.collect()
    assert len(rows) == 1 and rows[0]["order_year"] == 1995


def test_compact_small_files(spark, sf_dir, tmp_path):
    """200-file directory compacts to the byte-sized output count with
    identical row multiset."""
    from collimate_spark.sources.storage import compact_small_files

    src = str(tmp_path / "shattered")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.repartition(200).write.mode("overwrite").parquet(src)
    before_cnt = spark.read.parquet(src).count()
    n_before, n_after = compact_small_files(spark, src, target_file_mb=128)
    assert n_before >= 200
    assert n_after < 8  # sf0.001 lineitem is well under one 128 MB target
    after = spark.read.parquet(src)
    assert after.count() == before_cnt
    # spot-check content equality via checksum of a stable aggregate
    a = li.groupBy("l_returnflag").count().collect()
    b = after.groupBy("l_returnflag").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_compact_with_clustering_restores_pruning(spark, sf_dir, tmp_path):
    """sort_within_by re-clusters while compacting: per-file l_orderkey
    ranges must be near-disjoint afterwards (min/max pruning works)."""
    import pyarrow.parquet as pq
    import os

    from collimate_spark.sources.storage import compact_small_files

    src = str(tmp_path / "unclustered")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.repartition(50).write.mode("overwrite").parquet(src)
    compact_small_files(spark, src, target_file_mb=0.05, sort_within_by=["l_orderkey"])
    files = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(src)
        for f in fs
        if f.endswith(".parquet")
    ]
    assert len(files) >= 2
    ranges = []
    for f in files:
        t = pq.read_table(f, columns=["l_orderkey"])
        col = t.column("l_orderkey").to_pylist()
        if col:
            ranges.append((min(col), max(col)))
    ranges.sort()
    overlaps = sum(1 for (a, b), (c, d) in zip(ranges, ranges[1:]) if c < b)
    assert overlaps == 0, f"file key ranges overlap after clustering: {ranges}"


def test_read_binary_dir_prunes_content(spark, tmp_path):
    """binaryFile source reads loose blobs; a metadata-only projection
    must not read content bytes (ReadSchema excludes it)."""
    from collimate_spark.sources.storage import read_binary_dir

    d = tmp_path / "blobs"
    d.mkdir()
    for i in range(5):
        (d / f"img_{i}.bin").write_bytes(bytes([i]) * (100 + i))
    df = read_binary_dir(spark, str(d), glob="*.bin")
    rows = df.select("path", "length").orderBy("length").collect()
    assert [r.length for r in rows] == [100, 101, 102, 103, 104]
    meta_only = df.select("path", "length")
    plan = meta_only._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan.lower().split("readschema")[-1][:200]
    full = df.select("content").collect()
    assert sorted(len(r.content) for r in full) == [100, 101, 102, 103, 104]


def test_zorder_narrows_ranges_on_both_dims(spark, sf_dir, tmp_path):
    """Z-order on (l_partkey, l_suppkey): per-file min/max spans must
    shrink on BOTH dimensions (a 1-D sort narrows only its own key; a
    random layout narrows neither)."""
    import os
    import pyarrow.parquet as pq

    from collimate_spark.sources.storage import write_zorder_clustered

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dst = str(tmp_path / "zordered")
    write_zorder_clustered(li, dst, ["l_partkey", "l_suppkey"], n_files=16)
    back = spark.read.parquet(dst)
    assert back.count() == li.count()
    spans = {"l_partkey": [], "l_suppkey": []}
    full = {
        c: (
            li.agg(F.min(c), F.max(c)).collect()[0][1]
            - li.agg(F.min(c), F.max(c)).collect()[0][0]
        )
        for c in spans
    }
    files = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(dst)
        for f in fs
        if f.endswith(".parquet")
    ]
    assert len(files) >= 8
    for f in files:
        t = pq.read_table(f, columns=list(spans))
        for c in spans:
            col = t.column(c).to_pylist()
            if col:
                spans[c].append(max(col) - min(col))
    for c, ss in spans.items():
        avg_frac = (sum(ss) / len(ss)) / max(full[c], 1)
        assert avg_frac <= 0.55, f"{c}: avg per-file span {avg_frac:.2f} of full range"


def test_observed_write_single_pass_metrics(spark, sf_dir, tmp_path):
    """observe() metrics must equal a direct aggregation, and arrive from
    the same job as the write (no extra scan: assert via the metrics
    being available immediately after the one action)."""
    from collimate_spark.operators.quality import observed_write

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(5000)
    dst = str(tmp_path / "observed")
    got = observed_write(li, dst, ["l_quantity", "l_extendedprice"])
    exp = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").isNull().cast("long")).alias("qn"),
        F.min("l_quantity").alias("qmin"),
        F.max("l_quantity").alias("qmax"),
    ).collect()[0]
    assert got["n_rows"] == exp["n_rows"] == spark.read.parquet(dst).count()
    assert got["l_quantity_nulls"] == exp["qn"]
    assert got["l_quantity_min"] == exp["qmin"]
    assert got["l_quantity_max"] == exp["qmax"]


def test_cbo_statistics_enable_auto_broadcast(spark, sf_dir, tmp_path):
    """With ANALYZE TABLE statistics, Catalyst's size estimate lets a
    small dimension auto-broadcast WITHOUT an explicit broadcast() hint —
    the statistics-driven planning a warehouse relies on."""
    import shutil

    spark.sql("DROP TABLE IF EXISTS t_nation_stats")
    # a previous session's managed-table directory survives the (per-
    # session) derby metastore, so DROP alone cannot clear it
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(os.path.join(warehouse, "t_nation_stats"), ignore_errors=True)
    spark.read.parquet(f"{sf_dir}/nation.parquet").write.mode("overwrite").saveAsTable(
        "t_nation_stats"
    )
    spark.sql("ANALYZE TABLE t_nation_stats COMPUTE STATISTICS")
    li = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    joined = li.join(spark.table("t_nation_stats"), li.s_nationkey == F.col("n_nationkey"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:500]
    stats = spark.sql("DESCRIBE EXTENDED t_nation_stats").collect()
    assert any("Statistics" in str(r) for r in stats)
    spark.sql("DROP TABLE t_nation_stats")


def test_versioned_write_time_travel(spark, sf_dir, tmp_path):
    """Three snapshot versions: latest read resolves the manifest, any
    older version stays readable, and an unknown version errors."""
    import pytest

    from collimate_spark.sources.storage import read_versioned, write_versioned

    t = str(tmp_path / "vt")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    v0 = write_versioned(orders.limit(100), t, note="initial")
    v1 = write_versioned(orders.limit(250), t, note="append-ish")
    v2 = write_versioned(orders.limit(50), t, note="compacted")
    assert (v0, v1, v2) == (0, 1, 2)
    assert read_versioned(spark, t).count() == 50
    assert read_versioned(spark, t, version=1).count() == 250
    assert read_versioned(spark, t, version=0).count() == 100
    with pytest.raises(ValueError, match="version 9 not found"):
        read_versioned(spark, t, version=9)


def test_versioned_manifest_is_atomicity_point(spark, sf_dir, tmp_path):
    """A data directory without a manifest entry is invisible: simulate a
    crashed write by creating v=1 data but not committing the manifest —
    readers still see v=0."""
    import os
    import shutil

    from collimate_spark.sources.storage import read_versioned, write_versioned

    t = str(tmp_path / "vt2")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_versioned(orders.limit(10), t)
    # fake half-finished writer: data present, manifest not updated
    shutil.copytree(os.path.join(t, "v=0"), os.path.join(t, "v=1"))
    assert read_versioned(spark, t).count() == 10  # still v=0
