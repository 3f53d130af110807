"""salted_join must agree with a plain join, including under a heavily
skewed key distribution."""

from __future__ import annotations

import pyspark.sql.functions as F

from collimate_spark.functions.skew import salted_join


def _skewed_frames(spark):
    # 90% of left rows share key 0 — the power-law hot key
    left = spark.range(0, 10000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("left_val"),
    )
    right = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("right_val")
    )
    return left, right


def test_salted_join_matches_plain_inner(spark):
    left, right = _skewed_frames(spark)
    plain = left.join(right, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("right_val").alias("s")
    )
    salted = salted_join(left, right, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("right_val").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    left, right = _skewed_frames(spark)
    # left-outer keeps unmatched left rows exactly once
    right_sub = right.filter(F.col("k") < 50)
    plain = left.join(right_sub, "k", "left")
    salted = salted_join(left, right_sub, "k", how="left")
    assert plain.count() == salted.count()
    assert (
        salted.filter(F.col("right_val").isNull()).count()
        == plain.filter(F.col("right_val").isNull()).count()
    )


def test_salt_actually_spreads(spark):
    left, right = _skewed_frames(spark)
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(8))
    dist = (
        left.withColumn("__salt", salt)
        .filter(F.col("k") == 0)
        .groupBy("__salt")
        .count()
        .collect()
    )
    assert len(dist) == 8  # the hot key's rows land in every salt bucket
    counts = [r["count"] for r in dist]
    assert max(counts) < sum(counts)  # not all in one bucket
