"""Bounded within-group self-pairing — the blocked-matrix-multiply
pattern for distributing O(group²) pair generation.

A plain self equi-join on the group key puts every pair of a group into
ONE task: a group of s rows costs s² work and s·width memory on a single
executor — the classic scale-killer for skewed blocking keys (a hot LSH
band, an oversized embedding cluster). Chunking fixes it exactly, with no
semantic change: split each group into ⌈s/cap⌉ chunks by id hash, emit
the a-side row once per chunk pair (i ≤ j), join on (group, i, j), and
each task now holds ≤ cap×cap candidate pairs regardless of group size.
Total work is unchanged (all pairs are inherent to the contract); what
changes is that it is spread over ⌈s/cap⌉² tasks instead of one.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_PAIR_CAP = 1024


def bounded_self_pairs(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    size_col: str,
    cap: int = DEFAULT_PAIR_CAP,
    payload_cols: Sequence[str] = (),
) -> DataFrame:
    """All unordered within-group pairs (id_a < id_b), each emitted exactly
    once, with per-task candidate volume bounded by cap².

    ``df`` must already carry ``size_col`` = its group's row count (join a
    groupBy-count back before calling). Output: group_cols + (id_a, id_b)
    + ("<c>_a", "<c>_b") per payload column + (__ci, __cj) chunk ids kept
    for task-volume introspection in tests.

    Groups with size ≤ cap get one chunk — the plan degenerates to the
    plain self-join shape with zero replication.
    """
    gcols = list(group_cols)
    nch = F.greatest(F.lit(1), F.ceil(F.col(size_col) / F.lit(cap))).cast("int")
    base = (
        df.withColumn("__nch", nch)
        .withColumn(
            "__chunk", F.pmod(F.xxhash64(F.col(id_col)), F.col("__nch")).cast("int")
        )
    )
    a = base.select(
        *gcols,
        F.col(id_col).alias("__ida"),
        *[F.col(c).alias(f"__pa_{c}") for c in payload_cols],
        F.col("__chunk").alias("__ci"),
        F.explode(F.sequence(F.col("__chunk"), F.col("__nch") - 1)).alias("__cj"),
    )
    b = base.select(
        *gcols,
        F.col(id_col).alias("__idb"),
        *[F.col(c).alias(f"__pb_{c}") for c in payload_cols],
        F.explode(F.sequence(F.lit(0), F.col("__chunk"))).alias("__ci"),
        F.col("__chunk").alias("__cj"),
    )
    joined = a.join(b, [*gcols, "__ci", "__cj"]).filter(
        (F.col("__ci") != F.col("__cj")) | (F.col("__ida") < F.col("__idb"))
    )
    # orient every pair as (min id, max id); payloads swap with their ids
    swap = F.col("__ida") > F.col("__idb")
    out_cols = [
        *gcols,
        F.when(swap, F.col("__idb")).otherwise(F.col("__ida")).alias("id_a"),
        F.when(swap, F.col("__ida")).otherwise(F.col("__idb")).alias("id_b"),
    ]
    for c in payload_cols:
        out_cols.append(
            F.when(swap, F.col(f"__pb_{c}")).otherwise(F.col(f"__pa_{c}")).alias(f"{c}_a")
        )
        out_cols.append(
            F.when(swap, F.col(f"__pa_{c}")).otherwise(F.col(f"__pb_{c}")).alias(f"{c}_b")
        )
    out_cols += [F.col("__ci"), F.col("__cj")]
    return joined.select(*out_cols)
