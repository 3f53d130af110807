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
import pyspark.sql.types as T
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


def _list_to_mat(arr):
    """Arrow list<floating> column -> 2D float64 ndarray (rows must share
    one length). float32 -> float64 is exact, matching the JVM's
    cast("double")."""
    import numpy as np
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    off = arr.offsets.to_numpy(zero_copy_only=False)
    widths = off[1:] - off[:-1]
    if len(widths) == 0:
        return np.zeros((0, 0))
    d = widths[0]
    if not (widths == d).all():
        raise ValueError("blocked_pair_cosines requires uniform vector dims")
    vals = arr.values.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    return vals[off[0] : off[-1]].reshape(len(widths), d)


def _gram_kernel(table):
    """One (group, chunk_i, chunk_j) block: expand every valid pair and
    compute cos = dot/(|a|·|b|) with the SAME float64 arithmetic as the
    sequential left folds in functions/vectors.py (dot and squared-norm
    both accumulate dimension-by-dimension in index order, so every
    per-pair double is bit-identical to the zip_with+aggregate form —
    pinned by tests/test_skew.py::test_blocked_pair_cosines_matches_hof).
    """
    import numpy as np
    import pyarrow as pa

    role = table.column("__role").to_numpy(zero_copy_only=False)
    ids = table.column("__pid").to_numpy(zero_copy_only=False)
    mat = _list_to_mat(table.column("__pvec"))
    same = bool(table.column("__gi")[0].as_py() == table.column("__gj")[0].as_py())
    a_sel, b_sel = role == 0, role == 1
    ida, idb = ids[a_sel], ids[b_sel]
    A, B = mat[a_sel], mat[b_sel]
    sa, sb = len(ida), len(idb)
    n_group = table.num_columns - 5  # leading group-key columns
    names = [table.column_names[i] for i in range(n_group)]
    if sa == 0 or sb == 0:
        empty = [pa.array([], type=table.column(i).type) for i in range(n_group)]
        empty += [
            pa.array([], type=table.column("__pid").type),
            pa.array([], type=table.column("__pid").type),
            pa.array([], type=pa.float64()),
        ]
        return pa.table(empty, names=names + ["id_a", "id_b", "cos_raw"])
    d = A.shape[1]
    # squared norms: sequential left fold over dimensions (== V.norm)
    sqa = np.zeros(sa)
    for k in range(d):
        sqa += A[:, k] * A[:, k]
    sqb = np.zeros(sb)
    for k in range(d):
        sqb += B[:, k] * B[:, k]
    na, nb = np.sqrt(sqa), np.sqrt(sqb)
    # pairwise dot: same left fold, one rank-1 update per dimension
    acc = np.zeros((sa, sb))
    for k in range(d):
        acc += A[:, k][:, None] * B[:, k][None, :]
    cos = acc / (na[:, None] * nb[None, :])
    if same:
        keep = ida[:, None] < idb[None, :]
    else:
        keep = np.ones((sa, sb), dtype=bool)
    ii, jj = np.nonzero(keep)
    xa, xb, c = ida[ii], idb[jj], cos[ii, jj]
    swap = xa > xb
    out_a = np.where(swap, xb, xa)
    out_b = np.where(swap, xa, xb)
    cols = [
        pa.array([table.column(i)[0].as_py()] * len(out_a), type=table.column(i).type)
        for i in range(n_group)
    ]
    cols += [pa.array(out_a), pa.array(out_b), pa.array(c, type=pa.float64())]
    return pa.table(cols, names=names + ["id_a", "id_b", "cos_raw"])


def blocked_pair_cosines(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    vec_col: str,
    size_col: str,
    cap: int = DEFAULT_PAIR_CAP,
) -> DataFrame:
    """All unordered within-group pair COSINES (id_a < id_b), same pair
    set and task bound as ``bounded_self_pairs`` — but the vectors never
    ride a pair-exploding join. Each vector row is shuffled (replicated
    ⌈s/cap⌉+1 ways, exactly the two join sides' replication) to its
    chunk-pair groups, and one applyInArrow kernel per (group, ci, cj)
    block expands the ≤ cap×cap pairs and computes their cosines
    vectorized — shuffle bytes are O(vectors·chunks), not O(pairs·dim)
    (guide §8: move lightweight rows, expand where the decision is made).

    Output: group_cols + (id_a, id_b, cos_raw). cos_raw is bit-identical
    to ``V.dot(a,b)/(V.norm(a)*V.norm(b))`` — the kernel replays the same
    dimension-order float64 left folds.
    """
    gcols = list(group_cols)
    nch = F.greatest(F.lit(1), F.ceil(F.col(size_col) / F.lit(cap))).cast("int")
    base = df.withColumn("__nch", nch).withColumn(
        "__chunk", F.pmod(F.xxhash64(F.col(id_col)), F.col("__nch")).cast("int")
    )
    vec = F.col(vec_col).cast("array<double>").alias("__pvec")
    # Each row's block assignments — role 0 in blocks (chunk, j ≥ chunk),
    # role 1 in blocks (i ≤ chunk, chunk) — emit from ONE explode of a
    # per-row struct array instead of a union of two selects: the union
    # arms re-executed the whole scan+size-join subtree once per side
    # (the same-table-union collapse, r13). The exploded multiset is
    # identical, and the gram kernel selects rows by role/id, so block-
    # internal row order is immaterial.
    blocks = F.concat(
        F.transform(
            F.sequence(F.col("__chunk"), F.col("__nch") - 1),
            lambda j: F.struct(
                F.col("__chunk").alias("gi"), j.alias("gj"), F.lit(0).alias("role")
            ),
        ),
        F.transform(
            F.sequence(F.lit(0), F.col("__chunk")),
            lambda i: F.struct(
                i.alias("gi"), F.col("__chunk").alias("gj"), F.lit(1).alias("role")
            ),
        ),
    )
    u = base.select(
        *gcols,
        F.explode(blocks).alias("__b"),
        F.col(id_col).alias("__pid"),
        vec,
    ).select(
        *gcols,
        F.col("__b.gi").alias("__gi"),
        F.col("__b.gj").alias("__gj"),
        F.col("__b.role").alias("__role"),
        "__pid",
        "__pvec",
    )
    schema = T.StructType(
        [df.schema[c] for c in gcols]
        + [
            T.StructField("id_a", df.schema[id_col].dataType),
            T.StructField("id_b", df.schema[id_col].dataType),
            T.StructField("cos_raw", T.DoubleType()),
        ]
    )
    return u.groupBy(*gcols, "__gi", "__gj").applyInArrow(_gram_kernel, schema)
