"""Storage-layout tests: bucketed joins must be shuffle-free; partitioned
reads must prune."""

from __future__ import annotations

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
