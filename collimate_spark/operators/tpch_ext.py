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


QUERIES = {
    "q2_cheapest_supplier": q2_cheapest_supplier,
    "q7_nation_volume": q7_nation_volume,
    "q11_important_parts": q11_important_parts,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q14_promo_revenue": q14_promo_revenue,
    "q22_idle_rich_customers": q22_idle_rich_customers,
}

ORACLES = {
    "q2_cheapest_supplier": Q2_SQL,
    "q7_nation_volume": Q7_SQL,
    "q11_important_parts": Q11_SQL,
    "q13_order_count_distribution": Q13_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q22_idle_rich_customers": Q22_SQL,
}
