"""Invariants for the bloom-prefiltered semi join and the grid-blocked
geo radius join that oracle parity under-specifies: the Bloom filter's
no-false-negative guarantee and bounded false-positive rate, and the geo
join's plan shape (equi hash join, never a nested-loop candidate pass).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from collimate_spark.operators.joins import (
    bloom_pack,
    bloom_probe,
    bloom_prefilter_join,
    geo_radius_join_grid,
)
from collimate_spark.plans import assert_scalable

SF_DIR = "/root/testdata/sf0.001"


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    """Every member key passes the probe (structural guarantee); the FP
    rate over a 10× disjoint probe set stays well under the designed
    ~0.6% (generous 2% assertion bound for hash luck)."""
    members = spark.range(0, 1000).select(F.col("id").alias("k"))
    packed = bloom_pack(members, "k")
    assert members.filter(~bloom_probe(packed, F.col("k"))).count() == 0
    non_members = spark.range(1_000_000, 1_010_000).select(F.col("id").alias("k"))
    fp = non_members.filter(bloom_probe(packed, F.col("k"))).count()
    assert fp / 10_000 < 0.02, f"FP rate {fp / 10_000}"


def test_bloom_prefilter_reduces_fact_rows(spark):
    """The point of the pushdown: the probe drops most non-matching fact
    rows BEFORE the exact semi join. BUILDING is ~1/5 of customers, so
    the survivor set must be well under half the fact table."""
    cust = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    packed = bloom_pack(cust, "c_custkey")
    survivors = orders.filter(bloom_probe(packed, F.col("o_custkey"))).count()
    exact = orders.join(cust, orders.o_custkey == cust.c_custkey, "left_semi").count()
    assert exact <= survivors  # superset: no true match lost
    assert survivors < orders.count() / 2


def test_bloom_join_plan_no_cartesian(spark):
    assert_scalable(bloom_prefilter_join(spark, SF_DIR), allow_bnl=False)


def test_geo_join_is_equi_hash_not_nested_loop(spark):
    """Blocking must turn the radius join into an equi join on the cell
    key — a BroadcastNestedLoopJoin or CartesianProduct here means the
    O(n·m) plan the operator exists to avoid."""
    df = geo_radius_join_grid(spark, SF_DIR)
    assert_scalable(df, allow_bnl=False)
    rows = df.collect()
    assert all(r["dist_km"] < 50.0 for r in rows)
