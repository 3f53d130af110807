"""User-defined execution surface: vectorized scalar pandas UDF, Python
UDTF (lateral table function), and map-typed columns — the three UDF/UDAF/
UDTF rows of SURVEY.md §2.2 not already covered by applyInPandas /
mapInPandas elsewhere.

Scalar pandas UDFs are Arrow-batched (one Python roundtrip per ~10k-row
batch, not per row); the UDTF runs per-row Python and is therefore the
slowest construct in the engine — appropriate for low-volume lateral
expansions, never for the 100 TB hot path (use explode/posexplode of
built-in arrays there, as dedup does).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import pandas_udf, udtf

from collimate_spark.catalog import load_table
from collimate_spark.scratch import scache


# returnType as a DataType instance (a DDL string would require an active
# SparkSession at import time)
@pandas_udf(T.DoubleType())
def log1p_vec(s: pd.Series) -> pd.Series:
    """Vectorized numpy scalar UDF (Arrow batches)."""
    return np.log1p(s)


def pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF parity: np.log1p over order totals must match the
    oracle's LN(1+x) bit-for-bit (both double)."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.select(
            "o_orderkey",
            F.round(log1p_vec(F.col("o_totalprice")), 6).alias("log1p_price"),
        )
        .orderBy("o_orderkey")
    )


PANDAS_UDF_SQL = """
SELECT o_orderkey, ROUND(LN(1 + o_totalprice), 6) AS log1p_price
FROM orders
ORDER BY o_orderkey
"""


@udtf(returnType="pos: int, token: string")
class TokenizeUDTF:
    """Lateral table function: one (position, token) row per whitespace
    token. Per-row Python — demo of the UDTF surface, not a hot path."""

    def eval(self, text: str):
        if text is None:
            return
        for i, tok in enumerate(text.lower().split()):
            yield (i, tok)


def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF in a LATERAL join over (a slice of) documents."""
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 20)
    docs.createOrReplaceTempView("docs_slice")
    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
    return spark.sql(
        """
        SELECT doc_id, t.pos, t.token
        FROM docs_slice, LATERAL tokenize_udtf(text) t
        ORDER BY doc_id, pos
        """
    )


# trim + collapse whitespace before splitting so the oracle matches
# Python str.split() (which drops empty tokens and splits on any
# whitespace run) for docs with leading/trailing/doubled whitespace
UDTF_SQL = """
WITH d AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents WHERE doc_id < 20
)
SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[i] AS token
FROM d, UNNEST(range(1, len(toks) + 1)) t(i)
WHERE toks[i] <> ''
ORDER BY doc_id, pos
"""


@udtf
class ParsePropsUDTF:
    """POLYMORPHIC table function: the output schema is computed at plan
    time by ``analyze()`` from the literal key list — one LongType column
    per requested JSON key. This is the dynamic-schema UDTF surface
    (Spark 4): the same function handles any props layout without a
    hard-coded returnType; schema resolution happens once on the driver,
    row processing stays per-executor."""

    @staticmethod
    def analyze(props, keys):
        import json as _json

        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.types import LongType, StructField, StructType

        names = [k.strip() for k in keys.value.split(",") if k.strip()]
        if not names:
            raise ValueError("parse_props requires a non-empty literal key list")
        return AnalyzeResult(StructType([StructField(n, LongType()) for n in names]))

    def eval(self, props: str, keys: str):
        import json as _json

        names = [k.strip() for k in keys.split(",") if k.strip()]
        try:
            d = _json.loads(props) if props else {}
        except ValueError:
            d = {}
        yield tuple(
            int(d[k]) if isinstance(d.get(k), (int, float)) else None for k in names
        )


def udtf_parse_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-schema UDTF in a LATERAL join: extract the literal-listed
    JSON keys from events.props, schema decided by analyze()."""
    ev = load_table(spark, "events", sf_dir).filter(F.col("event_id") < 2000)
    ev.createOrReplaceTempView("events_slice")
    spark.udtf.register("parse_props", ParsePropsUDTF)
    return spark.sql(
        """
        SELECT event_id, p.k
        FROM events_slice, LATERAL parse_props(props, 'k') p
        ORDER BY event_id
        """
    )


UDTF_PROPS_SQL = """
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
FROM events
WHERE event_id < 2000
ORDER BY event_id
"""


@pandas_udf(T.DoubleType())
def gini_agg(x: pd.Series) -> float:
    """GROUPED_AGG pandas UDF (the UDAF surface: whole group in, one
    scalar out, usable inside groupBy().agg() alongside built-ins).
    Gini coefficient via the sorted-rank identity
    ``G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n``; numpy-vectorized per group.
    NOTE the scale trade vs Spark's own AggregateFunction: the whole
    group materializes in one Python worker (no partial aggregation), so
    this surface fits dimension-sized groups — built-in moment sketches
    (regr_*, corr) stay the fact-scale path."""
    v = np.sort(x.to_numpy(dtype="float64"))
    n = len(v)
    if n == 0 or v.sum() == 0:
        return 0.0
    i = np.arange(1, n + 1, dtype="float64")
    return float(2.0 * (i * v).sum() / (n * v.sum()) - (n + 1.0) / n)


@pandas_udf(T.LongType())
def count_agg(x: pd.Series) -> int:
    """Companion GROUPED_AGG count: Spark forbids mixing pandas and JVM
    aggregates in one agg call, so the row count rides the same
    Python-side aggregation."""
    return len(x)


def grouped_agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag price inequality (Gini) through the GROUPED_AGG
    pandas-UDF path (two pandas aggregates in one agg call)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_returnflag")
        .agg(
            count_agg(F.col("l_extendedprice")).alias("n"),
            F.round(gini_agg(F.col("l_extendedprice")), 4).alias("gini_price"),
        )
        .orderBy("l_returnflag")
    )


GROUPED_AGG_GINI_SQL = """
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice AS x,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS i
  FROM lineitem
)
SELECT l_returnflag,
       COUNT(*) AS n,
       ROUND(2.0 * SUM(i * x) / (COUNT(*) * SUM(x)) - (COUNT(*) + 1.0) / COUNT(*), 4)
         AS gini_price
FROM ranked
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: build a map, read keys and values back.
    Output stays scalar (value-hash friendly)."""
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") < 500)
    m = F.create_map(
        F.lit("price"), F.col("o_totalprice"),
        F.lit("key2"), F.col("o_custkey").cast("double"),
    )
    return (
        orders.select(
            "o_orderkey",
            F.round(F.element_at(m, "price"), 2).alias("price_from_map"),
            F.concat_ws(",", F.map_keys(m)).alias("keys_joined"),
            F.size(m).alias("map_size"),
        )
        .orderBy("o_orderkey")
    )


MAP_FUNCTIONS_SQL = """
SELECT o_orderkey,
       ROUND((MAP {'price': o_totalprice, 'key2': CAST(o_custkey AS DOUBLE)})['price'][1], 2)
         AS price_from_map,
       array_to_string(map_keys(MAP {'price': o_totalprice, 'key2': CAST(o_custkey AS DOUBLE)}), ',')
         AS keys_joined,
       CAST(cardinality(MAP {'price': o_totalprice, 'key2': CAST(o_custkey AS DOUBLE)}) AS INT)
         AS map_size
FROM orders
WHERE o_orderkey < 500
ORDER BY o_orderkey
"""


def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function family over the embedding column: size/slice/
    element_at/min/max/contains-style predicates, scalar outputs."""
    emb = load_table(spark, "embeddings", sf_dir).filter(F.col("vec_id") < 200)
    arr = F.col("embedding")
    return (
        emb.select(
            "vec_id",
            F.size(arr).alias("dim"),
            F.round(F.element_at(arr, 1).cast("double"), 6).alias("first_elem"),
            F.round(F.element_at(arr, -1).cast("double"), 6).alias("last_elem"),
            F.round(F.array_max(arr).cast("double"), 6).alias("max_elem"),
            F.round(F.array_min(arr).cast("double"), 6).alias("min_elem"),
            F.round(
                F.aggregate(
                    F.slice(arr, 1, 8), F.lit(0.0), lambda a, x: a + x.cast("double")
                ),
                6,
            ).alias("head8_sum"),
            F.size(F.filter(arr, lambda x: x > 0)).alias("n_positive"),
        )
        .orderBy("vec_id")
    )


ARRAY_FUNCTIONS_SQL = """
SELECT vec_id,
       len(embedding) AS dim,
       ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
       ROUND(CAST(embedding[-1] AS DOUBLE), 6) AS last_elem,
       ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS max_elem,
       ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS min_elem,
       ROUND(list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))), 6) AS head8_sum,
       len(list_filter(embedding, x -> x > 0)) AS n_positive
FROM embeddings
WHERE vec_id < 200
ORDER BY vec_id
"""


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct counts, paired with their exact twins
    and a deterministic error-bound audit. The raw HLL estimates are
    engine-specific (never hash-comparable), but |approx−exact|/exact ≤
    4·rsd IS deterministic for Spark's HLL++ (register-max merge is
    order-independent), so the audited output is DuckDB-oracle-able:
    the oracle computes the exact counts and predicts the audit bits as
    1 — an out-of-bound sketch hash-mismatches loudly. At 100 TB the
    approx side is the point (no distinct shuffle per group at rsd
    precision); the exact twin here doubles as the audit baseline.

    The approx and exact sides are SEPARATE aggregations joined on the
    3-row group key, never one combined agg: Spark plans multiple
    COUNT(DISTINCT) via Expand, and any plain aggregate sharing that agg
    is evaluated in the first (per-distinct-value-grained) HashAggregate
    — here that meant one ~12 KB rsd=0.01 HLL++ partial buffer PER
    DISTINCT (flag, key) VALUE (~600k first-stage groups ≈ 7 GB of agg
    state at sf0.1; measured 45-480 s/run, spill-bound). Split, the HLL
    buffers exist only per output group (3) and the multi-distinct
    Expand agg carries nothing but count buffers — same output."""
    li = load_table(spark, "lineitem", sf_dir)
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("__ap"),
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("__ao"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
    )
    # null-safe equality: a NULL group (none in TPC-H data, but the
    # combined agg this replaces kept it) must survive the re-join
    agg = exact.join(
        F.broadcast(approx.withColumnRenamed("l_returnflag", "__rf")),
        exact["l_returnflag"].eqNullSafe(F.col("__rf")),
    )
    # Audit bound: 4·rsd, not 3 — 3·rsd is a ~99% probabilistic HLL++
    # envelope, not a guarantee, and the oracle hardcodes the bit to 1,
    # so the bound needs measured headroom against THIS deterministic
    # estimate rather than the distributional tail. Measured max
    # |approx−exact|/(exact·rsd) on this data: 0.54 (parts, rsd=0.05)
    # and 0.86 (orders, rsd=0.01) across sf0.001/0.01/0.1 — ≥4.6×
    # headroom at 4·rsd. If the bit ever flips at a new SF, diagnose as
    # calibration (re-measure the ratio) before suspecting a regression.
    def within(approx, exact, rsd):
        return (
            (F.abs(approx - F.col(exact)) / F.col(exact) <= 4 * rsd)
            .cast("long")
        )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_orders",
        within(F.col("__ap"), "exact_parts", 0.05).alias("parts_within_4rsd"),
        within(F.col("__ao"), "exact_orders", 0.01).alias("orders_within_4rsd"),
    ).orderBy("l_returnflag")


AGG_APPROX_DISTINCT_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       CAST(1 AS BIGINT) AS parts_within_4rsd,
       CAST(1 AS BIGINT) AS orders_within_4rsd
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def hll_sketch_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches — the architecture that makes
    100 TB distinct counting incremental: build one HLL sketch per day
    partition (``hll_sketch_agg``), persist/merge them WITHOUT rescanning
    the data (``hll_union_agg``), estimate at any rollup grain. Here:
    daily user sketches → weekly distinct-user estimates.  The weekly
    union touches |days| sketch blobs (KBs), not the fact table.

    Output contract (the agg_approx_distinct audit-bits pattern, VERDICT
    r9 #5): the Datasketches estimate itself is engine-specific, so the
    hashed output carries the EXACT weekly distinct count plus a bit
    asserting the merged-union estimate lands within 4·rse of it
    (lgConfigK=12 → rse = 1.04/√4096 ≈ 1.63%, audit bound ~6.5%).
    Measured margins on this data: exact at sf0.001/0.01 (coupon-list
    mode), 0.49·rse at sf0.1 (~1500 distincts/week), and a 100k-distinct
    synthetic union probe measured 1.77·rse — ≥2.2× headroom at the
    worst measured point. If the bit ever flips at a new SF, diagnose as
    calibration (re-measure the ratio) before suspecting a regression;
    the exact twin here doubles as the audit baseline."""
    ev = load_table(spark, "events", sf_dir)
    daily = (
        ev.withColumn("day", F.col("ts").cast("date"))
        .groupBy("day")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    weekly = (
        daily.withColumn("week", F.date_trunc("week", "day").cast("date"))
        .groupBy("week")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("__approx"),
        )
    )
    exact = (
        ev.withColumn("week", F.date_trunc("week", F.col("ts").cast("date")).cast("date"))
        .groupBy("week")
        .agg(F.count_distinct("user_id").alias("exact_users"))
    )
    return (
        weekly.join(exact, "week")
        .select(
            "week",
            "n_days",
            "exact_users",
            (
                F.abs(F.col("__approx") - F.col("exact_users"))
                / F.col("exact_users")
                <= 4 * 1.04 / (4096 ** 0.5)
            )
            .cast("long")
            .alias("union_within_4rse"),
        )
        .orderBy("week")
    )


HLL_SKETCH_PARTITIONED_SQL = """
SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week,
       COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
       COUNT(DISTINCT user_id) AS exact_users,
       CAST(1 AS BIGINT) AS union_within_4rse
FROM events
GROUP BY 1
ORDER BY week
"""


def xml_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML as an interchange surface (native in Spark 4: to_xml /
    from_xml, the spark-xml package absorbed): serialize each event's
    (event_type, value) struct to an XML fragment, parse it back with an
    explicit schema, and aggregate the ROUND-TRIPPED values — proving
    lossless traversal (the oracle aggregates the original columns
    directly, so any serialization loss hash-fails). The XML path is
    JVM-side like from_json; same pushdown/codegen story."""
    ev = load_table(spark, "events", sf_dir)
    xml = F.to_xml(F.struct("event_type", "value"))
    parsed = F.from_xml(xml, "event_type STRING, value DOUBLE")
    return (
        ev.select(parsed.alias("p"))
        .groupBy(F.col("p.event_type").alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("p.value"), 2).alias("sum_value"),
        )
        .orderBy("event_type")
    )


XML_ROUNDTRIP_SQL = """
SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def collated_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 string collations): half the
    event types are re-cased via initcap, then grouped under
    ``COLLATE UTF8_LCASE`` — the engine-level case-insensitive equality
    that replaces sprinkled lower() calls (and, unlike lower(), keeps
    a display form). Oracle groups on lower() — same partition of rows,
    so counts hash-match; the displayed key is normalized to lower in
    both for engine-independence."""
    ev = load_table(spark, "events", sf_dir)
    mixed = ev.select(
        F.when(F.col("event_id") % 2 == 0, F.initcap("event_type"))
        .otherwise(F.col("event_type"))
        .alias("et"),
    )
    return (
        mixed.groupBy(F.expr("et COLLATE UTF8_LCASE").alias("et_ci"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lower("et_ci").alias("event_type"), "n")
        .orderBy("event_type")
    )


COLLATED_GROUP_SQL = """
WITH mixed AS (
  SELECT CASE WHEN event_id % 2 = 0
              THEN upper(substr(event_type, 1, 1)) || substr(event_type, 2)
              ELSE event_type END AS et
  FROM events
)
SELECT lower(et) AS event_type, COUNT(*) AS n
FROM mixed
GROUP BY lower(et)
ORDER BY event_type
"""


def listagg_supplier_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard LISTAGG ... WITHIN GROUP (Spark 4): ordered string
    aggregation per nation — the ANSI form of collect_list+array_join
    with ORDER BY semantics guaranteed by the function itself (no
    array_sort needed for determinism)."""
    supp = load_table(spark, "supplier", sf_dir)
    supp.createOrReplaceTempView("supplier_v")
    return spark.sql(
        """
        SELECT s_nationkey,
               COUNT(*) AS n_suppliers,
               LISTAGG(s_name, ',') WITHIN GROUP (ORDER BY s_name) AS names
        FROM supplier_v
        GROUP BY s_nationkey
        ORDER BY s_nationkey
        """
    )


LISTAGG_SQL = """
SELECT s_nationkey,
       COUNT(*) AS n_suppliers,
       string_agg(s_name, ',' ORDER BY s_name) AS names
FROM supplier
GROUP BY s_nationkey
ORDER BY s_nationkey
"""


def approx_top_k_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's native ``approx_top_k`` aggregate over the exploded word
    stream, driver-oracled via the AUDIT-BITS contract (VERDICT r10 #4,
    same pattern as ``hll_native_distinct``): the hashed output is the
    EXACT top-10 (count desc, word asc — a total order, so the limit
    boundary is engine-deterministic) plus two bits asserting the native
    sketch (a) contains each exact-top-k word in its returned top-10 and
    (b) estimates its count within the frequent-items envelope
    4·N/maxItemsTracked (maxItemsTracked defaults to 10000; the
    DataSketches guarantee is |est − true| ≤ ~3.5·N/m, and any item
    with margin above that is guaranteed tracked). On this 31-word
    vocabulary the sketch never evicts, so est == cnt exactly — a flip
    at web-corpus cardinality is envelope calibration, not regression.
    The hand-rolled Misra-Gries twin (stats.heavy_hitters_words) shows
    the from-scratch form of the same sketch.

    Scale note: two passes over the corpus by design — the sketch
    consumes the raw stream (that is the op under test), the exact
    audit rides a vocab-grain groupBy whose result (cached, vocab-sized)
    also supplies exact-top-k and the N scalar. At 100 TB you drop the
    audit columns, not the sketch."""
    docs = load_table(spark, "documents", sf_dir)
    words = docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    counts = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .transform(scache)
    )
    exact10 = counts.orderBy(F.desc("cnt"), "word").limit(10)
    native = (
        words.agg(F.expr("approx_top_k(word, 10)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("word"), F.col("e.count").alias("est"))
    )
    total = counts.agg(F.sum("cnt").alias("n_words"))
    envelope = F.greatest(
        F.lit(1), F.ceil(F.lit(4.0) * F.col("n_words") / F.lit(10000))
    )
    # A tie AT the rank-10 boundary is broken arbitrarily inside the
    # sketch (exact order: cnt desc, word asc; the sketch orders equal
    # counts its own way), so a boundary-count word legitimately absent
    # from the sketch's 10 gets a vacuous 1 on both bits — the contract
    # audits sketch ERROR, not tie-breaking.
    boundary = F.min("cnt").over(Window.partitionBy(F.lit(1)))
    tied_out = F.col("est").isNull() & (F.col("cnt") == boundary)
    return (
        exact10.join(native, "word", "left")
        .crossJoin(F.broadcast(total))
        .withColumn("tied_out", tied_out)
        .select(
            "word",
            "cnt",
            (F.col("est").isNotNull() | F.col("tied_out"))
            .cast("long")
            .alias("in_sketch_topk"),
            (
                F.col("tied_out")
                | (
                    F.col("est").isNotNull()
                    & (F.abs(F.col("est") - F.col("cnt")) <= envelope)
                )
            )
            .cast("long")
            .alias("est_within_envelope"),
        )
        .orderBy(F.desc("cnt"), "word")
    )


APPROX_TOP_K_WORDS_SQL = """
WITH w AS (
  SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word
  FROM documents
),
counts AS (
  SELECT word, COUNT(*) AS cnt FROM w WHERE word <> '' GROUP BY word
)
SELECT word, cnt,
       CAST(1 AS BIGINT) AS in_sketch_topk,
       CAST(1 AS BIGINT) AS est_within_envelope
FROM counts
ORDER BY cnt DESC, word
LIMIT 10
"""


def try_functions_safety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression family (``try_divide`` / ``try_cast`` /
    ``try_to_number``): malformed inputs yield NULL instead of killing
    the job — the semantics a 100 TB pipeline needs when one bad row in
    a trillion must not fail stage retries. Derived malformed inputs:
    division by (value mod bucket == 0) zeros and non-numeric strings
    mixed into a castable column. Counts of survived/nulled rows are the
    auditable output."""
    ev = load_table(spark, "events", sf_dir)
    mixed = ev.select(
        "event_id",
        (F.col("event_id") % 5).alias("denom"),
        F.when(F.col("event_id") % 7 == 0, F.lit("oops"))
        .otherwise(F.col("value").cast("string"))
        .alias("numstr"),
    )
    out = mixed.select(
        F.expr("try_divide(1.0, denom)").alias("q"),
        F.expr("try_cast(numstr AS DOUBLE)").alias("casted"),
    )
    return out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("q").isNull().cast("long")).alias("div_nulls"),
        F.sum(F.col("casted").isNull().cast("long")).alias("cast_nulls"),
        F.round(F.sum("casted"), 2).alias("sum_casted"),
    )


TRY_FUNCTIONS_SQL = """
WITH mixed AS (
  SELECT event_id,
         event_id % 5 AS denom,
         CASE WHEN event_id % 7 = 0 THEN 'oops' ELSE CAST(value AS VARCHAR) END AS numstr
  FROM events
)
SELECT COUNT(*) AS n,
       CAST(SUM(CASE WHEN denom = 0 THEN 1 ELSE 0 END) AS BIGINT) AS div_nulls,
       CAST(SUM(CASE WHEN TRY_CAST(numstr AS DOUBLE) IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS cast_nulls,
       ROUND(SUM(TRY_CAST(numstr AS DOUBLE)), 2) AS sum_casted
FROM mixed
"""


def map_hof_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order MAP functions (transform_values / map_filter /
    map_zip_with) — the map-typed complement to the array HOFs: build a
    per-order map of charge components, transform values (tax-adjust),
    filter entries by value, and zip two maps into one. Outputs reduce
    to scalars so the oracle (which recomputes the same arithmetic from
    the base columns — DuckDB's map HOF surface differs) hash-matches.

    r13: the map build and the transform_values result are each
    projected ONCE behind an alias — inline, the single output Project
    referenced the ``create_map`` tree four times and the
    ``transform_values`` tree twice, and map HOFs are CodegenFallback
    (no subexpression elimination), so every row rebuilt the map four
    times and re-taxed it twice. Identical arithmetic per element, so
    identical output."""
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_linenumber") == 1)
    # DECIMAL map values: double products land on half-cent ROUND
    # boundaries that Spark and DuckDB round differently (same fix as
    # stats.pareto_revenue_share) — decimal arithmetic is exact
    price_d = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_d = F.col("l_discount").cast("decimal(18,2)")
    tax_d = F.col("l_tax").cast("decimal(18,2)")
    m = F.create_map(
        F.lit("price"), price_d.cast("decimal(28,8)"),
        F.lit("discounted"), (price_d * (1 - disc_d)).cast("decimal(28,8)"),
    )
    staged = li.select("l_orderkey", "l_tax", m.alias("m")).select(
        "l_orderkey",
        "m",
        F.transform_values(
            F.col("m"), lambda k, v: (v * (1 + tax_d)).cast("decimal(28,8)")
        ).alias("taxed"),
    )
    taxed = F.col("taxed")
    big_only = F.map_filter(F.col("m"), lambda k, v: v > 30000)
    zipped = F.map_zip_with(F.col("m"), taxed, lambda k, v1, v2: v2 - v1)
    return (
        staged.select(
            "l_orderkey",
            F.round(F.element_at(taxed, "price"), 2).cast("double").alias("price_taxed"),
            F.size(big_only).alias("n_big_entries"),
            F.round(F.element_at(zipped, "discounted"), 2).cast("double").alias("tax_delta_discounted"),
        )
        .orderBy("l_orderkey")
    )


MAP_HOF_SQL = """
SELECT l_orderkey,
       CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 + CAST(l_tax AS DECIMAL(18,2))), 2)
            AS DOUBLE) AS price_taxed,
       CAST((CASE WHEN CAST(l_extendedprice AS DECIMAL(18,2)) > 30000 THEN 1 ELSE 0 END)
          + (CASE WHEN CAST(l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l_discount AS DECIMAL(18,2))) > 30000 THEN 1 ELSE 0 END) AS INT)
         AS n_big_entries,
       CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                  * (1 + CAST(l_tax AS DECIMAL(18,2)))
             - CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))), 2)
            AS DOUBLE) AS tax_delta_discounted
FROM lineitem
WHERE l_linenumber = 1
ORDER BY l_orderkey
"""


def bitmap_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap aggregates (Spark 3.5+'s
    bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg /
    bitmap_count — the Snowflake-style bitmap index as functions): per
    order priority, distinct customers counted by OR-ing fixed 4KB bucket
    bitmaps. Unlike approx_count_distinct this is EXACT, and unlike
    COUNT(DISTINCT) the partial state is mergeable fixed-size bitmaps,
    not a hash set of values — the middle point on the memory/accuracy
    curve. Two-level agg: (priority, bucket) bitmap build, then per-
    priority sum of per-bucket counts. Oracle: plain COUNT(DISTINCT)."""
    orders = load_table(spark, "orders", sf_dir)
    orders.createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        WITH per_bucket AS (
          SELECT o_orderpriority,
                 bitmap_bucket_number(o_custkey) AS bucket,
                 bitmap_construct_agg(bitmap_bit_position(o_custkey)) AS bm
          FROM orders_v
          GROUP BY 1, 2
        )
        SELECT o_orderpriority,
               CAST(SUM(bitmap_count(bm)) AS BIGINT) AS n_distinct_customers
        FROM per_bucket
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


BITMAP_DISTINCT_SQL = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_distinct_customers
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def hll_native_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NATIVE Apache DataSketches HLL surface (hll_sketch_agg /
    hll_union_agg / hll_sketch_estimate, Spark 3.5+): per-priority
    sketches built in one agg, unioned to a global estimate in a second
    — the library-grade twin of the hand-partitioned
    hll_sketch_partitioned (which proves mergeability from first
    principles). Driver-oracled via the audit-bits contract: the hashed
    output is the EXACT distinct plus a bit asserting the sketch
    estimate sits within 4·rse of it (lgConfigK=12 → rse ≈ 1.63%;
    measured worst margin 0.66·rse across sf0.001/0.01/0.1 — 6×
    headroom; a flip at a new SF is calibration, not regression).

    The sketch agg and the exact COUNT(DISTINCT) are SEPARATE
    aggregations re-joined on the group key (r13; same planning artifact
    as agg_approx_distinct): sharing one agg put partial_hll_sketch_agg
    into the distinct rewrite's first stage, i.e. one DataSketches
    object per distinct (priority, custkey) PAIR — ~130k sketches built
    and shuffled at sf0.1 where 5 suffice, and the per-value buffer
    count grows with the key cardinality at scale. Split, the sketch
    ObjectHashAggregate keys by priority alone (5 objects/task) and the
    exact side is the standard Expand distinct plan; the per-priority
    and global exacts share ONE scan via GROUPING SETS. Output
    identical (oracle-verified); scans 5 → 3, measured 1.9 s → 0.5 s."""
    orders = load_table(spark, "orders", sf_dir)
    orders.createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        WITH sk AS (
          SELECT o_orderpriority, hll_sketch_agg(o_custkey) AS sk
          FROM orders_v GROUP BY 1
        ), est AS (
          SELECT o_orderpriority, hll_sketch_estimate(sk) AS est FROM sk
          UNION ALL
          SELECT '<all>', hll_sketch_estimate(hll_union_agg(sk)) FROM sk
        ), ex AS (
          SELECT CASE WHEN GROUPING(o_orderpriority) = 1 THEN '<all>'
                      ELSE o_orderpriority END AS o_orderpriority,
                 COUNT(DISTINCT o_custkey) AS exact_distinct
          FROM orders_v
          GROUP BY GROUPING SETS ((o_orderpriority), ())
        )
        SELECT ex.o_orderpriority, ex.exact_distinct,
               CAST(ABS(est.est - ex.exact_distinct)
                    / ex.exact_distinct <= 4 * 1.04 / SQRT(4096) AS BIGINT)
                 AS est_within_4rse
        FROM ex JOIN est ON ex.o_orderpriority <=> est.o_orderpriority
        ORDER BY o_orderpriority
        """
    )


HLL_NATIVE_DISTINCT_SQL = """
SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS exact_distinct,
       CAST(1 AS BIGINT) AS est_within_4rse
FROM orders GROUP BY 1
UNION ALL
SELECT '<all>', COUNT(DISTINCT o_custkey), CAST(1 AS BIGINT)
FROM orders
ORDER BY o_orderpriority
"""


def hll_intersection_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch SET ALGEBRA: |clickers ∩ purchasers| estimated from HLL
    sketches alone via inclusion-exclusion (est_a + est_b − est_union) —
    the audience-overlap query you answer at 100 TB from two kilobytes
    of pre-aggregated sketch state, no re-scan, no distinct join. The
    exact intersection rides the same single pass as a COUNT DISTINCT
    audit column so the estimate's error is visible in the result.

    Caveat encoded here on purpose: HLL supports union natively;
    intersection is DERIVED, and its error grows as the overlap shrinks
    relative to the union. Driver-oracled via the audit-bits contract:
    exact counts hash; the derived estimate is audited against the
    union-scaled envelope (3 × 2% × |A∪B| + 1 — each of the three
    estimates carries ~1.6% rse at default lgK; measured error 20 vs
    envelope ~90 at sf0.1).

    Sketches and exact COUNT(DISTINCT)s are SEPARATE one-row
    aggregations cross-joined (r13; the agg_approx_distinct planning
    artifact): sharing one agg put the three partial_hll_sketch_agg
    buffers into the multi-distinct Expand plan's per-distinct-value
    first stage — 3 sketch objects per distinct user instead of 3
    total, a per-value buffer count that grows with |users| at scale.
    The old scalar exact-union subquery also folds into the exact agg
    as a third COUNT(DISTINCT CASE ...) — same value (CASE yields NULL
    outside the filter; COUNT DISTINCT ignores NULLs), one fewer scan.
    Output identical (oracle-verified)."""
    ev = load_table(spark, "events", sf_dir)
    ev.createOrReplaceTempView("events_hll_v")
    return spark.sql(
        """
        WITH sk AS (
          SELECT hll_sketch_agg(CASE WHEN event_type = 'click' THEN user_id END) AS sk_a,
                 hll_sketch_agg(CASE WHEN event_type = 'purchase' THEN user_id END) AS sk_b,
                 hll_sketch_agg(CASE WHEN event_type IN ('click', 'purchase')
                                     THEN user_id END) AS sk_u
          FROM events_hll_v
        ), ex AS (
          SELECT COUNT(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS exact_a,
                 COUNT(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS exact_b,
                 COUNT(DISTINCT CASE WHEN event_type IN ('click', 'purchase')
                                     THEN user_id END) AS exact_u
          FROM events_hll_v
        ), est AS (
          SELECT hll_sketch_estimate(sk_a) AS e_a,
                 hll_sketch_estimate(sk_b) AS e_b,
                 hll_sketch_estimate(sk_u) AS e_u,
                 exact_a, exact_b, exact_u
          FROM sk CROSS JOIN ex
        )
        SELECT exact_a AS exact_clickers, exact_b AS exact_purchasers,
               exact_u AS exact_union,
               exact_a + exact_b - exact_u AS exact_intersection,
               CAST(ABS((e_a + e_b - e_u) - (exact_a + exact_b - exact_u))
                    <= 3 * 0.02 * exact_u + 1 AS BIGINT)
                 AS intersection_within_envelope
        FROM est
        """
    )


HLL_INTERSECTION_SQL = """
WITH x AS (
  SELECT COUNT(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS exact_clickers,
         COUNT(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS exact_purchasers,
         COUNT(DISTINCT CASE WHEN event_type IN ('click', 'purchase') THEN user_id END) AS exact_union
  FROM events
)
SELECT exact_clickers, exact_purchasers, exact_union,
       exact_clickers + exact_purchasers - exact_union AS exact_intersection,
       CAST(1 AS BIGINT) AS intersection_within_envelope
FROM x
"""


QUERIES = {
    "pandas_udf_scalar": pandas_udf_scalar,
    "udtf_tokenize": udtf_tokenize,
    "hll_intersection_users": hll_intersection_users,
    "udtf_parse_props": udtf_parse_props,
    "grouped_agg_gini": grouped_agg_gini,
    "xml_roundtrip_stats": xml_roundtrip_stats,
    "collated_group_count": collated_group_count,
    "listagg_supplier_names": listagg_supplier_names,
    "approx_top_k_words": approx_top_k_words,
    "try_functions_safety": try_functions_safety,
    "map_hof_functions": map_hof_functions,
    "bitmap_distinct_counts": bitmap_distinct_counts,
    "hll_native_distinct": hll_native_distinct,
    "map_functions": map_functions,
    "array_functions": array_functions,
    "agg_approx_distinct": agg_approx_distinct,
    "hll_sketch_partitioned": hll_sketch_partitioned,
}

ORACLES = {
    "pandas_udf_scalar": PANDAS_UDF_SQL,
    "udtf_tokenize": UDTF_SQL,
    "udtf_parse_props": UDTF_PROPS_SQL,
    "grouped_agg_gini": GROUPED_AGG_GINI_SQL,
    "xml_roundtrip_stats": XML_ROUNDTRIP_SQL,
    "collated_group_count": COLLATED_GROUP_SQL,
    "listagg_supplier_names": LISTAGG_SQL,
    "try_functions_safety": TRY_FUNCTIONS_SQL,
    "map_hof_functions": MAP_HOF_SQL,
    "bitmap_distinct_counts": BITMAP_DISTINCT_SQL,
    "approx_top_k_words": APPROX_TOP_K_WORDS_SQL,
    "map_functions": MAP_FUNCTIONS_SQL,
    "array_functions": ARRAY_FUNCTIONS_SQL,
    "agg_approx_distinct": AGG_APPROX_DISTINCT_SQL,
    "hll_sketch_partitioned": HLL_SKETCH_PARTITIONED_SQL,
    "hll_native_distinct": HLL_NATIVE_DISTINCT_SQL,
    "hll_intersection_users": HLL_INTERSECTION_SQL,
}
