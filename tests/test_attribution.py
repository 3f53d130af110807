"""Attribution invariants parity alone under-specifies: every model must
distribute exactly the same total (conservation), and that total must be
the summed value of precisely the purchases that have ≥1 touch."""

from __future__ import annotations

import pyspark.sql.functions as F

from collimate_spark.catalog import load_table
from collimate_spark.operators.events import attribution_multitouch


def test_attribution_models_conserve_revenue(spark, sf_dir):
    rep = attribution_multitouch(spark, sf_dir)
    totals = rep.agg(
        F.sum("rev_first_touch").alias("f"),
        F.sum("rev_last_touch").alias("l"),
        F.sum("rev_linear").alias("lin"),
    ).collect()[0]
    # per-event_type rounding admits at most ±0.005 per row per model
    assert abs(totals["f"] - totals["l"]) < 0.05
    assert abs(totals["f"] - totals["lin"]) < 0.05

    ev = load_table(spark, "events", sf_dir)
    convs = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("conv_id"),
        F.col("ts").alias("conv_ts"),
        F.col("value").alias("revenue"),
    )
    touched = convs.join(
        ev.filter(F.col("event_type") != "purchase"),
        (F.col("user_id") == F.col("c_user"))
        & (F.col("ts") <= F.col("conv_ts"))
        & (F.col("ts") > F.expr("timestampadd(HOUR, -24, conv_ts)")),
        "left_semi",
    )
    expected = touched.agg(F.sum("revenue")).collect()[0][0]
    assert abs(totals["f"] - expected) < 0.05
