"""Staged cost decomposition of dedup_exact at decade scale (r11 probe).

The fourth-decade sweep measured dedup_exact 23.76s @5M docs ->
385.07s @50M docs (16.2x work for 10x output) on a quiet host, with
executor stacks parked in regexp_replace/lower during the map stage.
This probe times each pipeline prefix in ONE fresh JVM per stage-set
invocation so the hot component is measured, not guessed:

    python scripts/probe_dedup_exact.py /tmp/sf100m [stage ...]

stages: scan, lowertrim, norm, hash, agg, sort (default: all, in order).
Each stage is min-of-2 noop-sink runs.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402


def stage_df(spark, sf_dir: str, stage: str):
    from collimate_spark.catalog import load_table
    from collimate_spark.functions import text as X

    docs = load_table(spark, "documents", sf_dir)
    if stage == "scan":
        return docs.select(F.length("text").alias("n"))
    if stage == "lowertrim":
        return docs.select(F.length(F.lower(F.trim(F.col("text")))).alias("n"))
    if stage == "norm":
        return docs.select(F.length(X.normalize_text(F.col("text"))).alias("n"))
    if stage == "hash":
        return docs.select(
            F.md5(X.normalize_text(F.col("text")).cast("binary")).alias("h")
        )
    if stage == "agg":
        return (
            docs.withColumn(
                "text_hash", F.md5(X.normalize_text(F.col("text")).cast("binary"))
            )
            .groupBy("text_hash")
            .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        )
    if stage == "sort":
        from collimate_spark.operators import all_queries

        return all_queries()["dedup_exact"](spark, sf_dir)
    raise SystemExit(f"unknown stage {stage}")


def main() -> None:
    from collimate_spark.session import get_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100m"
    stages = sys.argv[2:] or ["scan", "lowertrim", "norm", "hash", "agg", "sort"]
    spark = get_session("probe-dedup-exact")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for stage in stages:
        best = None
        for _ in range(2):
            spark.catalog.clearCache()
            df = stage_df(spark, sf_dir, stage)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{stage}: {best:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
