"""Operator modules. Each module exposes

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLES: dict[str, str]`` — DuckDB-runnable SQL, same column names

``all_queries()`` / ``all_oracles()`` merge every module for the driver
entry point (``__spark_entry__.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from collimate_spark.operators import (
        relational,
        tpch_ext,
        windows,
        joins,
        events,
        grouped,
        udx,
        dedup,
        similarity,
        textstats,
        multimodal,
    )

    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (relational, tpch_ext, windows, joins, events, grouped, udx, dedup, similarity, textstats, multimodal):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    return merged


def all_oracles() -> dict[str, str]:
    from collimate_spark.operators import (
        relational,
        tpch_ext,
        windows,
        joins,
        events,
        grouped,
        udx,
        dedup,
        similarity,
        textstats,
        multimodal,
    )

    merged: dict[str, str] = {}
    for mod in (relational, tpch_ext, windows, joins, events, grouped, udx, dedup, similarity, textstats, multimodal):
        merged.update(mod.ORACLES)
    return merged
