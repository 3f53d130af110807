"""Guards for bench.py's cross-round history loader (`_load_history`).

`history_totals` in the one-line bench payload is the only in-artifact
view of prior rounds, so the loader's filtering rules are contract:
an errored round (rc != 0) must contribute NOTHING (its partial rows
would masquerade as a fast round), malformed artifacts must be skipped
rather than abort the bench, and both the driver's wrapped shape
({"rc": 0, "parsed": {...}}) and a raw payload must parse. No Spark
session involved — these run in milliseconds.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _write(tmp_path, name, obj):
    (tmp_path / name).write_text(obj if isinstance(obj, str) else json.dumps(obj))


def _load_from(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    return bench._load_history()


def test_wrapped_and_raw_artifacts_both_parse(tmp_path, monkeypatch):
    _write(tmp_path, "BENCH_r01.json",
           {"rc": 0, "parsed": {"value": 18.2, "queries": {"q1": 0.65}}})
    _write(tmp_path, "BENCH_r02.json",
           {"value": 14.2, "queries": {"q1": 0.61}})  # raw, no driver wrapper
    hist = _load_from(tmp_path, monkeypatch)
    assert hist == {
        "r1": {"total": 18.2, "queries": {"q1": 0.65}},
        "r2": {"total": 14.2, "queries": {"q1": 0.61}},
    }


def test_errored_round_contributes_nothing(tmp_path, monkeypatch):
    _write(tmp_path, "BENCH_r03.json",
           {"rc": 1, "parsed": {"value": 2.0, "queries": {"q1": 0.1}}})
    assert _load_from(tmp_path, monkeypatch) == {}


def test_malformed_or_queryless_artifacts_are_skipped_not_fatal(tmp_path, monkeypatch):
    _write(tmp_path, "BENCH_r04.json", "{not json")
    _write(tmp_path, "BENCH_r05.json", {"rc": 0, "parsed": {"value": 9.9}})  # no queries
    _write(tmp_path, "BENCH_r06.json",
           {"rc": 0, "parsed": {"value": 13.0, "queries": {"q1": 0.7}}})
    hist = _load_from(tmp_path, monkeypatch)
    assert list(hist) == ["r6"]
    assert hist["r6"]["total"] == 13.0
