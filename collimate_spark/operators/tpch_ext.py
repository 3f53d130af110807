"""Extended TPC-H-analog query shapes over the synthetic star schema.

The driver's tables have no partsupp, so the part↔supplier association
rides through lineitem (l_partkey, l_suppkey) — the shapes (correlated
scalar subqueries, pair matrices, HAVING against a global aggregate,
zero-preserving count distributions) are what these exercise; each is a
distinct Catalyst plan family not covered by relational.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from collimate_spark.catalog import load_table
from collimate_spark.scratch import scache


def q2_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: per part, the supplier offering the minimum observed unit
    price (correlated-min semantics; implemented as window-min + filter —
    the scalable argmin — with a correlated scalar subquery as oracle)."""
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    # min-selection runs on the RAW double quotient (bit-identical across
    # engines); the output scales by 1e4 and floors to an integer — floor
    # has no .5-tie ambiguity, unlike ROUND of a double (Spark rounds the
    # shortest decimal repr, DuckDB rounds the scaled binary value).
    unit = li.select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    per_pair = unit.groupBy("l_partkey", "l_suppkey").agg(
        F.min("unit_price").alias("min_unit")
    )
    w = Window.partitionBy("l_partkey")
    best = (
        per_pair.withColumn("part_min", F.min("min_unit").over(w))
        .filter(F.col("min_unit") == F.col("part_min"))
        .groupBy("l_partkey")
        .agg(F.min("l_suppkey").alias("best_suppkey"), F.min("part_min").alias("best_unit"))
    )
    return (
        best.join(F.broadcast(supp), best.best_suppkey == supp.s_suppkey)
        .select(
            "l_partkey",
            "best_suppkey",
            "s_name",
            F.floor(F.col("best_unit") * 10000).cast("long").alias("best_unit_e4"),
        )
        .orderBy("l_partkey")
    )


Q2_SQL = """
WITH per_pair AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS min_unit
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
best AS (
  SELECT l_partkey, MIN(l_suppkey) AS best_suppkey, MIN(min_unit) AS best_unit
  FROM per_pair p
  WHERE min_unit = (SELECT MIN(min_unit) FROM per_pair p2
                    WHERE p2.l_partkey = p.l_partkey)
  GROUP BY l_partkey
)
SELECT l_partkey, best_suppkey, s_name,
       CAST(FLOOR(best_unit * 10000) AS BIGINT) AS best_unit_e4
FROM best JOIN supplier ON best_suppkey = s_suppkey
ORDER BY l_partkey
"""


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: revenue matrix between customer-nation and
    supplier-nation (two independent dim lookups from the same fact)."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    n1 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == n1.c_nk)
        .join(F.broadcast(n2), supp.s_nationkey == n2.s_nk)
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        # exact decimal sum: a plain double sum landed on a ROUND .5 tie
        # here (753930.795) where Spark and DuckDB disagree
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
            ).cast("double").alias("revenue")
        )
        .orderBy("cust_nation", "supp_nation")
    )


Q7_SQL = """
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY 1, 2
ORDER BY cust_nation, supp_nation
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: groups whose aggregate exceeds a FRACTION OF THE GLOBAL
    aggregate (HAVING against a scalar subquery — plans as a broadcast of
    the 1-row global agg)."""
    li = load_table(spark, "lineitem", sf_dir)
    # exact decimal sums: the threshold comparison must not depend on
    # float accumulation order (rows near the cut would flip membership)
    value = F.sum((F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(18,4)"))
    per_part = li.groupBy("l_partkey").agg(value.alias("part_value"))
    # scale-invariant cut: 40% of the mean per-part value (a fixed global
    # fraction goes empty as the part count grows with SF)
    total = li.agg(
        (value * F.lit(0.4).cast("decimal(10,6)") / F.countDistinct("l_partkey")).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value").cast("decimal(28,8)") > F.col("threshold").cast("decimal(28,8)"))
        .select("l_partkey", F.col("part_value").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


Q11_SQL = """
SELECT l_partkey,
       CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) AS DECIMAL(28,8)) >
       CAST((SELECT SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4)))
             * CAST(0.4 AS DECIMAL(10,6)) / COUNT(DISTINCT l_partkey) FROM lineitem) AS DECIMAL(28,8))
ORDER BY part_value DESC, l_partkey
"""


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: distribution of per-customer order counts INCLUDING
    zero-order customers (left join before the double aggregation)."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional-aggregate percentage over a join (promo =
    p_type prefix match)."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(F.sum(promo) * 100.0 / F.sum(rev), 4).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q14_SQL = """
SELECT ROUND(100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: above-average balance (scalar avg subquery) + NOT EXISTS
    (anti join against large orders), grouped by a derived code."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    big_orders = orders.filter(F.col("o_totalprice") > 300000)
    rich = (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(big_orders, cust.c_custkey == big_orders.o_custkey, "left_anti")
    )
    code = F.substring(F.col("c_name"), 10, 1)
    return (
        rich.groupBy(code.alias("code"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("code")
    )


Q22_SQL = """
SELECT SUBSTRING(c_name, 10, 1) AS code,
       COUNT(*) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey
                  AND o_totalprice > 300000)
GROUP BY 1
ORDER BY code
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's share of regional revenue per year — a
    two-branch conditional aggregate over a 6-table star join (every dim
    broadcast; the only shuffle is fact⋈orders + the final group)."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    n_cust = nation.alias("n1")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    target = F.when(F.col("n2.n_name") == "NATION_3", vol).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(region), F.col("n1.n_regionkey") == region.r_regionkey)
        .join(F.broadcast(nation.alias("n2")), F.col("s_nationkey") == F.col("n2.n_nationkey"))
        .filter(F.col("r_name") == "EUROPE")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                (F.sum(target) / F.sum(vol)).cast("double"), 6
            ).alias("mkt_share"),
            F.sum(vol).cast("double").alias("total_volume"),
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       ROUND(CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                           THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                           ELSE CAST(0 AS DECIMAL(18,4)) END)
                  / SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
             AS DOUBLE), 6) AS mkt_share,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS total_volume
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
  AND r_name = 'EUROPE'
GROUP BY 1
ORDER BY o_year
"""


def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit per supplier-nation per year. The driver schema
    has no partsupp/ps_supplycost, so cost is proxied as
    0.6 · p_retailprice · l_quantity — the plan shape (fact ⋈ part ⋈
    supplier ⋈ nation ⋈ orders, derived-column group) is Q9's."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_name").contains("red"))
    supp = load_table(spark, "supplier", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_SQL = """
SELECT n_name AS nation, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     - 0.6 * p_retailprice * l_quantity AS DECIMAL(18,4))) AS DOUBLE)
         AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: revenue view over one quarter + select the max-revenue
    supplier(s) via a HAVING-against-global-max (scalar subquery)."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = load_table(spark, "supplier", sf_dir)
    # |suppliers|-sized but referenced twice (the max subquery + the
    # final filter join) — cached so the quarter's lineitem scan runs
    # once instead of once per reference (the pareto_revenue_share shape)
    revenue = li.groupBy("l_suppkey").agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
        .alias("total_rev")
    ).transform(scache)
    max_rev = revenue.agg(F.max("total_rev").alias("mx"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_rev"),
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
ORDER BY s_suppkey
"""


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct supplier count per (brand, type, size) bucket.
    The part↔supplier association rides through lineitem (no partsupp in
    the driver schema); excluded brand + size-set filters keep the Q16
    predicate structure."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 2, 3, 4, 5, 10, 15, 20)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 2, 3, 4, 5, 10, 15, 20)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue from lineitems under 40% of their part's average
    quantity (correlated scalar average; implemented as a broadcast of
    per-part averages — the scalable decorrelation)."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_brand") == "Brand#2")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.lit(0.4) * F.avg("l_quantity")).alias("qty_bar")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(avg_qty), li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("qty_bar"))
        .agg(
            F.round((F.sum(F.col("l_extendedprice").cast("decimal(18,4)")) / 7).cast("double"), 4)
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q17_SQL = """
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) / 7 AS DOUBLE), 4)
         AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem l JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#2'
  AND l_quantity < (SELECT 0.4 * AVG(l_quantity) FROM lineitem
                    WHERE l_partkey = l.l_partkey)
"""


def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers whose shipped quantity of matching parts in a
    year exceeds a threshold (semi-join chain part→lineitem→supplier; the
    reference schema's availqty check becomes a shipped-quantity check)."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    part = load_table(spark, "part", sf_dir).filter(F.col("p_name").startswith("red"))
    supp = load_table(spark, "supplier", sf_dir)
    shipped = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("qty_shipped"))
        .filter(F.col("qty_shipped") > 50)
    )
    return (
        supp.join(shipped, supp.s_suppkey == shipped.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey
  HAVING ROUND(SUM(l_quantity), 2) > 50
)
ORDER BY s_suppkey
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who were the SOLE late supplier on a
    multi-supplier finalized order. The classic form is a semi-join
    (another supplier exists on the order) plus an anti-join (no OTHER
    supplier was late) against the same fact table; here both collapse
    into per-order windows — size(collect_set(suppkey)) and its
    late-only twin over partitionBy(l_orderkey) — so the fact subtree
    (lineitem ⋈ orders) executes ONCE with one window shuffle, instead
    of the groupBy-and-join-back form whose two plan branches re-execute
    the join (.explain showed 2× the fact scans). Testdata has no
    l_receiptdate/l_commitdate, so "late" is l_shipdate > o_orderdate +
    90 days (documented deviation; the join/anti-join structure is the
    point of the query)."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "F")
    supp = load_table(spark, "supplier", sf_dir)
    fact = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).withColumn(
        "is_late", (F.col("l_shipdate") > F.date_add("o_orderdate", 90)).cast("int")
    )
    wo = Window.partitionBy("l_orderkey")
    sole_late = (
        fact.withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(wo)))
        .withColumn(
            "n_late_supp",
            F.size(
                F.collect_set(
                    F.when(F.col("is_late") == 1, F.col("l_suppkey"))
                ).over(wo)
            ),
        )
        .filter(
            (F.col("is_late") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_late_supp") == 1)
        )
        .select("l_orderkey", "l_suppkey")
    )
    return (
        sole_late.join(F.broadcast(supp), sole_late.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


Q21_SQL = """
WITH fact AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late_supp
  FROM fact
  GROUP BY l_orderkey
)
SELECT s_name, COUNT(*) AS numwait
FROM fact
JOIN per_order USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE is_late = 1 AND n_supp > 1 AND n_late_supp = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def yoy_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per nation — the ubiquitous BI
    comparison query: one star-join aggregate to (nation, year), then a
    lag window over the tiny result (|nations| x |years| rows). The fact
    table is scanned once; growth math never touches it."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").alias("yr"))
        .agg(F.round(F.sum(li.l_extendedprice * (1 - li.l_discount)), 2).alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy("yr")
    return (
        rev.withColumn("prev_rev", F.lag("revenue").over(w))
        .withColumn(
            "yoy_pct",
            F.round((F.col("revenue") - F.col("prev_rev")) / F.col("prev_rev") * 100, 4),
        )
        .select("n_name", "yr", "revenue", "yoy_pct")
        .orderBy("n_name", "yr")
    )


YOY_SQL = """
WITH rev AS (
  SELECT n_name, EXTRACT(year FROM o_orderdate) AS yr,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
)
SELECT n_name, CAST(yr AS INTEGER) AS yr, revenue,
       ROUND((revenue - LAG(revenue) OVER w) / LAG(revenue) OVER w * 100, 4) AS yoy_pct
FROM rev
WINDOW w AS (PARTITION BY n_name ORDER BY yr)
ORDER BY n_name, yr
"""


QUERIES = {
    "q2_cheapest_supplier": q2_cheapest_supplier,
    "q7_nation_volume": q7_nation_volume,
    "q8_market_share": q8_market_share,
    "q9_profit_by_nation_year": q9_profit_by_nation_year,
    "q11_important_parts": q11_important_parts,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q14_promo_revenue": q14_promo_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q20_excess_shippers": q20_excess_shippers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q22_idle_rich_customers": q22_idle_rich_customers,
    "yoy_revenue_growth": yoy_revenue_growth,
}

ORACLES = {
    "q2_cheapest_supplier": Q2_SQL,
    "q7_nation_volume": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q9_profit_by_nation_year": Q9_SQL,
    "q11_important_parts": Q11_SQL,
    "q13_order_count_distribution": Q13_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q15_top_supplier": Q15_SQL,
    "q16_supplier_part_counts": Q16_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q20_excess_shippers": Q20_SQL,
    "q21_waiting_suppliers": Q21_SQL,
    "q22_idle_rich_customers": Q22_SQL,
    "yoy_revenue_growth": YOY_SQL,
}
