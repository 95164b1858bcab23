"""Adapted TPC-H query pack (q2/q8/q9/q12/q13/q15/q16/q17/q19/q20/q21).

The driver's testdata carries a reduced TPC-H schema (no partsupp, no
commit/receipt dates, no comments), so each query keeps its canonical
*operator shape* — correlated subqueries, conditional aggregation,
outer-join distributions, having-on-aggregate, OR-of-conjunct
pushdown, semi-join chains, multi-exists blame assignment — adapted
to the available columns. All joins/aggs are delegated to Catalyst
(SURVEY §2.3/§2.4: the reference delegates relational execution to
the host engine); dims are broadcast where small.

Every entry has a DuckDB oracle with byte-matching column aliases.
Integer-sum results are cast to BIGINT on the oracle side (DuckDB
widens integer sums to HUGEINT; Spark uses long). Aggregates on
doubles are rounded to absorb summation-order drift.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _volume():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --- q2 shape: min-per-group via correlated scalar subquery ---------------


def q2_min_cost_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest part per type among small sizes (TPC-H Q2's correlated
    MIN subquery shape; Spark expresses it as a window min — same
    result, one shuffle on the group key)."""
    part = _t(spark, sf_dir, "part").where(F.col("p_size") <= 15)
    w = Window.partitionBy("p_type")
    return (
        part.withColumn("_min_price", F.min("p_retailprice").over(w))
        .where(F.col("p_retailprice") == F.col("_min_price"))
        .select("p_partkey", "p_name", "p_type", "p_retailprice")
        .orderBy("p_type", "p_partkey")
    )


Q2_SQL = """
SELECT p_partkey, p_name, p_type, p_retailprice
FROM part p
WHERE p_size <= 15
  AND p_retailprice = (SELECT min(p2.p_retailprice) FROM part p2
                       WHERE p2.p_type = p.p_type AND p2.p_size <= 15)
ORDER BY p_type, p_partkey
"""


# --- q8: national market share ---------------------------------------------


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") <= "1996-12-31")
    )
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").alias("n1")
    n2 = _t(spark, sf_dir, "nation").alias("n2")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    df = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(region), F.col("n1.n_regionkey") == region.r_regionkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2.n_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _volume().alias("volume"),
            F.col("n2.n_name").alias("supp_nation"),
        )
    )
    return (
        df.groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       round(sum(CASE WHEN n2.n_name = 'NATION_3'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
  AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
GROUP BY o_year
ORDER BY o_year
"""


# --- q9: product-type profit by nation and year ----------------------------


def q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        # decimal sum: order-independent (double sums can flip the cent
        # at the rounding boundary between engines)
        .agg(
            F.round(F.sum(_volume().cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE)
           AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# --- q12: conditional aggregation (shipping modes → priorities) ------------


def q12_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
           AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
           AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# --- q13: customer order-count distribution (outer join + re-agg) ----------


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
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
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --- q15: top supplier (aggregate, then filter = global max) ---------------


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-07-01") & (F.col("l_shipdate") < "1995-10-01")
    )
    supp = _t(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(F.round(F.sum(_volume()), 2).alias("total_revenue"))
    top = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        revenue.join(F.broadcast(top), revenue.total_revenue == F.col("m"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-07-01' AND l_shipdate < TIMESTAMP '1995-10-01'
    GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# --- q16: parts/supplier relationship (distinct-count + NOT LIKE) ----------


def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13")
        & (~F.col("p_type").like("MEDIUM%"))
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(20)
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13' AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 20
"""


# --- q17: small-quantity-order revenue (correlated avg) --------------------


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#13")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part_avg, li.l_partkey == F.col("ap"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


Q17_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#13'
  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
"""


# --- q19: OR-of-conjuncts pushdown -----------------------------------------


def q19_or_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    br = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.where(br).agg(F.round(F.sum(_volume()), 2).alias("revenue"))


Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


# --- q20: potential part promotion (semi-join chain + having) --------------


def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    )
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%bolt%"))
    supp = _t(spark, sf_dir, "supplier")
    qualified = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 40.0)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(qualified, supp.s_suppkey == qualified.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE '%bolt%'
      AND l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(l_quantity) > 40)
ORDER BY s_suppkey
"""


# --- q21: suppliers who kept orders waiting (multi-exists blame) -----------


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape with l_shipdate standing in for receipt/commit dates:
    in multi-supplier 'F' orders, blame the unique supplier holding the
    latest ship date; count blamed orders per supplier."""
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey, "left_semi")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
    )
    agg = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("max_ship"),
        F.countDistinct("l_suppkey").alias("nsupp"),
    )
    blamed = (
        li.join(agg, "l_orderkey")
        .where((F.col("l_shipdate") == F.col("max_ship")) & (F.col("nsupp") > 1))
        .groupBy("l_orderkey")
        .agg(
            F.min("l_suppkey").alias("l_suppkey"),
            F.countDistinct("l_suppkey").alias("nlate"),
        )
        .where(F.col("nlate") == 1)
    )
    supp = _t(spark, sf_dir, "supplier")
    return (
        blamed.join(supp, blamed.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


Q21_SQL = """
WITH l AS (
    SELECT l_orderkey, l_suppkey, l_shipdate
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'),
agg AS (
    SELECT l_orderkey, max(l_shipdate) AS max_ship, count(DISTINCT l_suppkey) AS nsupp
    FROM l GROUP BY l_orderkey),
blamed AS (
    SELECT l.l_orderkey, min(l.l_suppkey) AS l_suppkey
    FROM l JOIN agg USING (l_orderkey)
    WHERE l.l_shipdate = agg.max_ship AND agg.nsupp > 1
    GROUP BY l.l_orderkey
    HAVING count(DISTINCT l.l_suppkey) = 1)
SELECT s_name, count(*) AS numwait
FROM blamed JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# --- q11 shape: group-sum vs global-fraction HAVING over partsupp ---------


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification). The testdata has no
    partsupp table, so BOTH sides derive the same deterministic
    partsupp from part x 4 synthetic suppliers (seeded integer
    formulas); value stays in exact integer cents so the
    HAVING-threshold boundary can never flap on float summation order.
    Shape: two-level aggregate — per-part sums filtered against a
    fraction of the global sum (a broadcast 1-row join, no driver
    scalar)."""
    n_supp = _t(spark, sf_dir, "supplier").count()  # table-stat scalar
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_3", "NATION_7", "NATION_12")
    )
    ps = (
        _t(spark, sf_dir, "part")
        .select(F.col("p_partkey").alias("ps_partkey"))
        .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(3))))
        .select(
            "ps_partkey",
            ((F.col("ps_partkey") * 7 + F.col("i") * 13) % n_supp + 1).alias("ps_suppkey"),
            ((F.col("ps_partkey") * 31 + F.col("i") * 17) % 9999 + 1).alias("ps_availqty"),
            ((F.col("ps_partkey") * 53 + F.col("i") * 19) % 100000 + 100).alias("ps_cost_cents"),
        )
    )
    g = (
        ps.join(supp, ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("ps_partkey", (F.col("ps_cost_cents") * F.col("ps_availqty")).alias("v"))
    )
    per_part = g.groupBy("ps_partkey").agg(F.sum("v").alias("stock_value"))
    thresh = g.agg((F.sum("v") * 0.001).alias("_thresh"))
    return (
        per_part.join(F.broadcast(thresh))
        .where(F.col("stock_value") > F.col("_thresh"))
        .select("ps_partkey", "stock_value")
        .orderBy(F.desc("stock_value"), "ps_partkey")
    )


Q11_SQL = """
WITH ps AS (
    SELECT p_partkey AS ps_partkey,
           ((p_partkey * 7 + i * 13) % (SELECT count(*) FROM supplier)) + 1 AS ps_suppkey,
           ((p_partkey * 31 + i * 17) % 9999) + 1 AS ps_availqty,
           ((p_partkey * 53 + i * 19) % 100000) + 100 AS ps_cost_cents
    FROM part, (SELECT unnest(generate_series(0, 3)) AS i)
),
g AS (
    SELECT ps_partkey, ps_cost_cents * ps_availqty AS v
    FROM ps
    JOIN supplier ON ps_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_12')
)
SELECT ps_partkey, CAST(sum(v) AS BIGINT) AS stock_value
FROM g
GROUP BY ps_partkey
HAVING sum(v) > (SELECT sum(v) * 0.001 FROM g)
ORDER BY stock_value DESC, ps_partkey
"""


EXTRA_QUERIES: dict[str, tuple] = {
    "q2_min_cost_part": (q2_min_cost_part, Q2_SQL),
    "q11_important_stock": (q11_important_stock, Q11_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q9_profit": (q9_profit, Q9_SQL),
    "q12_priority_counts": (q12_priority_counts, Q12_SQL),
    "q13_customer_distribution": (q13_customer_distribution, Q13_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q16_supplier_cnt": (q16_supplier_cnt, Q16_SQL),
    "q17_small_quantity": (q17_small_quantity, Q17_SQL),
    "q19_or_predicates": (q19_or_predicates, Q19_SQL),
    "q20_part_promotion": (q20_part_promotion, Q20_SQL),
    "q21_waiting_suppliers": (q21_waiting_suppliers, Q21_SQL),
}
