"""Invariant tests for the time-series and lifecycle operators — parity
with DuckDB is covered by test_oracle_parity; these assert structural
properties that hold for ANY input."""

from __future__ import annotations

import numpy as np

from collimate_spark.catalog import load_table
from collimate_spark.operators.dataeng import scd2_user_segments
from collimate_spark.operators.timeseries import markov_transitions, rolling_median_value


def test_scd2_intervals_partition_time_axis(spark, sf_dir):
    """Per user: intervals are ordered, non-overlapping, contiguous
    (valid_to == next valid_from), and exactly one open current row."""
    rows = scd2_user_segments(spark, sf_dir).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for uid, segs in by_user.items():
        assert sum(1 for s in segs if s["is_current"]) == 1
        assert segs[-1]["valid_to"] is None and segs[-1]["is_current"]
        for a, b in zip(segs, segs[1:]):
            assert a["valid_to"] == b["valid_from"], uid
            assert a["valid_from"] < a["valid_to"], uid
        # consecutive segments must actually change segment value
        for a, b in zip(segs, segs[1:]):
            assert a["segment"] != b["segment"], uid


def test_scd2_event_counts_conserve(spark, sf_dir):
    rows = scd2_user_segments(spark, sf_dir).collect()
    total = sum(r["n_events"] for r in rows)
    assert total == load_table(spark, "events", sf_dir).count()


def test_rolling_median_matches_numpy(spark, sf_dir):
    """Spot-check one user's rolling medians against numpy over the same
    trailing-5 frames."""
    ev = (
        load_table(spark, "events", sf_dir)
        .filter("user_id = 1")
        .orderBy("ts", "event_id")
        .collect()
    )
    vals = [r["value"] for r in ev]
    got = {
        r["event_id"]: r["rolling_median"]
        for r in rolling_median_value(spark, sf_dir).collect()
        if r["user_id"] == 1
    }
    for idx, r in enumerate(ev):
        frame = vals[max(0, idx - 4) : idx + 1]
        assert abs(got[r["event_id"]] - round(float(np.median(frame)), 4)) < 1e-9


def test_markov_probabilities_normalize(spark, sf_dir):
    rows = markov_transitions(spark, sf_dir).collect()
    by_prev: dict = {}
    for r in rows:
        by_prev.setdefault(r["prev_type"], 0.0)
        by_prev[r["prev_type"]] += r["prob"]
    for prev, total in by_prev.items():
        assert abs(total - 1.0) < 0.01, (prev, total)  # rounding slack
