"""TPC-H analog queries (q1..q22) on the sales schema.

Mechanically split from the flat queries.py (r10); see the package
__init__ for conventions. Registration side effects only — import
through ``datagouv_tools_spark.queries``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._registry import DEC, dec, dround, query, t

# ---------------------------------------------------------------------------
# Relational core (scan / filter / project / agg / join / window / set ops)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) * (CAST(1 AS DECIMAL(18,4)) + CAST(l_tax AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analog: scan → filter → partial-agg → final agg.

    Scale: single shuffle on a tiny (flag, status) key domain; map-side
    partial aggregation reduces 100 TB of lineitem to a handful of rows
    per task before the exchange. Filter + 6-column projection push into
    the parquet scan.
    """
    li = t(spark, sf_dir, "lineitem")
    one = F.lit(1).cast(DEC)
    disc_price = dec("l_extendedprice") * (one - dec("l_discount"))
    charge = disc_price * (one + dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dround(F.sum(dec("l_quantity"))).alias("sum_qty"),
            dround(F.sum(dec("l_extendedprice"))).alias("sum_base_price"),
            dround(F.sum(disc_price)).alias("sum_disc_price"),
            dround(F.sum(charge)).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog: selective dim filter → join → agg → top-k.

    Scale: no forced hint on `customer` — it grows with SF (~2 TB at
    100 TB), so the join strategy is left to the planner/AQE, which
    broadcasts the segment-filtered side when it is actually small and
    shuffles otherwise; orders⋈lineitem shuffles on orderkey once; the
    top-10 is a TakeOrderedAndProject (no global sort materialization).
    """
    cutoff = F.lit("1998-06-01 00:00:00").cast("timestamp_ntz")
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    one = F.lit(1).cast(DEC)
    revenue = dec("l_extendedprice") * (one - dec("l_discount"))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dround(F.sum(revenue)).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    """
    SELECT n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analog: 6-table star join.

    Scale: nation/region are constant-cardinality and keep explicit
    broadcast hints; customer/supplier scale with SF, so their join
    strategy is left to AQE (broadcast while they fit, shuffle when
    they don't). orders⋈lineitem shuffles on orderkey once.
    """
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    one = F.lit(1).cast(DEC)
    revenue = dec("l_extendedprice") * (one - dec("l_discount"))
    return (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dround(F.sum(revenue)).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "q6_forecast_revenue",
    """
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '2000-09-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analog: pure scan-filter-aggregate, zero joins.

    Scale: all four predicates and the 3-column projection push into the
    parquet reader (min/max row-group pruning on l_shipdate); a single
    scalar aggregate follows — the cheapest possible 100 TB query shape.
    """
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("2000-09-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dround(F.sum(dec("l_extendedprice") * dec("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "q7_nation_volume",
    """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           EXTRACT(year FROM l_shipdate) AS l_year,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analog: bidirectional nation-pair trade volume by year.
    Scale: nation×2 keep broadcast hints (25 rows); supplier/customer
    are SF-scaling so AQE picks their strategy; lineitem⋈orders is
    the single guaranteed fact shuffle; the disjunctive nation filter
    prunes map-side."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    one = F.lit(1).cast(DEC)
    revenue = dec("l_extendedprice") * (one - dec("l_discount"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dround(F.sum(revenue)).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q14_promo_revenue",
    """
    SELECT CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO'
                               THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                               ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS promo_revenue,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS total_revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analog: conditional aggregation over the part join
    (promo vs total revenue in one pass). part is SF-scaling — no
    forced hint; AQE broadcasts it while it fits."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    part = t(spark, sf_dir, "part")
    one = F.lit(1).cast(DEC)
    zero = F.lit(0).cast(DEC)
    rev = dec("l_extendedprice") * (one - dec("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            dround(F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))).alias(
                "promo_revenue"
            ),
            dround(F.sum(rev)).alias("total_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q19_disjunctive_filter",
    """
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 5 AND l_quantity <= 25)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 15 AND l_quantity <= 40)
    """,
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 analog: disjunction of conjunctive band predicates
    across both join sides. Catalyst extracts the common l_quantity
    bounds as a pushable pre-filter; the full OR evaluates after the
    join (part unhinted — AQE broadcasts it while it fits)."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15) & (q >= 5) & (q <= 25))
        | ((F.col("p_brand") == "Brand#22") & F.col("p_size").between(10, 30) & (q >= 10) & (q <= 30))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(20, 50) & (q >= 15) & (q <= 40))
    )
    one = F.lit(1).cast(DEC)
    rev = dec("l_extendedprice") * (one - dec("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            dround(F.sum(rev)).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analog: top returners. Scale: nation keeps its
    broadcast hint; customer is SF-scaling so AQE picks; orders
    pre-filtered by date before the orderkey shuffle; top-20 via
    TakeOrderedAndProject."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = t(spark, sf_dir, "nation")
    one = F.lit(1).cast(DEC)
    revenue = dec("l_extendedprice") * (one - dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dround(F.sum(revenue)).alias("revenue"))
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q18_large_volume_customers",
    """
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > CAST(150 AS DECIMAL(18,4))
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_qty
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analog: HAVING-filtered aggregate driving a semi join
    back onto the facts (decorrelated IN-subquery). Scale: the big
    orderkey set is small after the HAVING filter but still
    order-grain (SF-scaling), so the semi join is unhinted — AQE
    broadcasts it while it fits and lineitem/orders shuffle only for
    their own aggregations; a selectivity regression shuffles instead
    of OOMing."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("sq"))
        .filter(F.col("sq") > F.lit(150).cast(DEC))
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate")
        .agg(dround(F.sum(dec("l_quantity"))).alias("total_qty"))
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H sweep completion (Q4, Q8, Q9, Q11, Q12, Q13, Q15, Q16, Q20-Q22
# analogs, adapted to the reduced schema: no partsupp, no commit/receipt
# dates, no phone/comment columns — each adaptation keeps the original
# query's SHAPE: the joins, subquery style, and aggregation pattern).
# ---------------------------------------------------------------------------


@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog: priority counts of orders with a returned line
    (EXISTS -> LEFT SEMI; the date filter prunes orders before the
    orderkey shuffle; lineitem side pre-filtered to 'R' rows).
    Scale: semi join shuffles only orderkeys, never widens rows."""
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
    )
    returned = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q8_market_share",
    """
    WITH vol AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,4))
               * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
    )
    SELECT o_year,
           CAST(ROUND(
             CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analog: NATION_1's share of EUROPE PROMO-part revenue by
    year. Scale: nation/region keep broadcast hints (constant); part/
    customer/supplier are SF-scaling so AQE picks their strategy; the
    only guaranteed shuffle is lineitem><orders on orderkey, then a
    7-row agg.
    Determinism: sums stay exact decimal, cast to double BEFORE the
    division so both engines divide identical doubles."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    one = F.lit(1).cast(DEC)
    volume = (dec("l_extendedprice") * (one - dec("l_discount"))).alias("volume")
    zero = F.lit(0).cast(DEC)
    vol = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            volume,
            "supp_nation",
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_1", F.col("volume"))
                    .otherwise(zero)
                ).cast("double")
                / F.sum("volume").cast("double"),
                6,
            )
            .cast("double")
            .alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q9_product_profit",
    """
    SELECT nation, o_year, CAST(ROUND(SUM(amount), 2) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,4))
               * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
               - CAST(p_retailprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4)) AS amount
      FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
      WHERE p_name LIKE '%widget%'
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analog: per-nation yearly profit on widget parts
    (ps_supplycost replaced by p_retailprice*quantity — no partsupp in
    the reduced schema). Scale: part filter joined first (unhinted —
    AQE broadcasts while it fits) so only ~1/4 of lineitem reaches the
    orderkey shuffle."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    orders = t(spark, sf_dir, "orders")
    one = F.lit(1).cast(DEC)
    amount = dec("l_extendedprice") * (one - dec("l_discount")) - dec(
        "p_retailprice"
    ) * dec("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dround(F.sum("amount")).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "q11_important_parts",
    """
    WITH pv AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                 * CAST(l_quantity AS DECIMAL(18,4))) AS val
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(ROUND(val, 2) AS DOUBLE) AS part_value
    FROM pv, (SELECT COUNT(*) AS c, SUM(val) AS s FROM pv) g
    WHERE CAST(val AS DOUBLE) * g.c > 2.0 * CAST(g.s AS DOUBLE)
    ORDER BY part_value DESC, l_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analog: parts whose ASIA-sourced traded value exceeds
    1/2000 of the total (HAVING vs scalar subquery). Scale: the per-part
    aggregate is one shuffle; the grand total is a 1-row broadcast back
    over it — no second scan of lineitem; supplier is unhinted
    (SF-scaling), AQE picks. Determinism: exact decimal
    sums cast to double before the threshold multiply, same on both
    engines."""
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    pv = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("l_partkey")
        .agg(F.sum(dec("l_extendedprice") * dec("l_quantity")).alias("val"))
    )
    # Grand total/count as a 1-row aggregate over the PER-PART result
    # broadcast-crossed back, not a window: |parts| scales with SF
    # (~20M at sf100), so Window.partitionBy(lit(1)) would funnel the
    # whole per-part domain through one task. Both branches share pv's
    # shuffle, which Spark dedupes as a ReusedExchange — lineitem is
    # still scanned once. The threshold is scale-INVARIANT (share > 2x
    # the average part), so the query stays selective at every SF.
    totals = pv.agg(
        F.sum("val").cast("double").alias("total"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        pv.crossJoin(F.broadcast(totals))
        .filter(
            F.col("val").cast("double") * F.col("cnt")
            > F.lit(2.0) * F.col("total")
        )
        .select("l_partkey", dround(F.col("val")).alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


@query(
    "q12_ship_delay",
    """
    SELECT delay_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (
      SELECT o_orderpriority,
             CAST(LEAST(FLOOR(date_diff('day', CAST(o_orderdate AS DATE),
                                        CAST(l_shipdate AS DATE)) / 30.0), 3) AS BIGINT) AS delay_bucket
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    )
    GROUP BY delay_bucket
    ORDER BY delay_bucket
    """,
)
def q12_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analog: order-priority mix by shipping-delay bucket
    (30-day buckets capped at 3 replace l_shipmode, which the reduced
    schema lacks). Scale: single orderkey shuffle; the conditional
    counts are map-side partial aggregates."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    orders = t(spark, sf_dir, "orders")
    delay = F.least(
        F.floor(
            F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
            / F.lit(30.0)
        ),
        F.lit(3),
    ).cast("long")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(delay.alias("delay_bucket"), "o_orderpriority")
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


@query(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts, outer join
    keeping order-less customers (COUNT(col) skips the nulls the outer
    join makes). Scale: custkey shuffle then a tiny histogram regroup."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
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


@query(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                 * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(ROUND(total_rev, 2) AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue (scalar MAX
    subquery kept as a 1-row broadcast; exact-decimal equality makes
    the tie test deterministic). Scale: one suppkey shuffle; the
    supplier dim is unhinted (SF-scaling, AQE picks)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    supp = t(spark, sf_dir, "supplier")
    one = F.lit(1).cast(DEC)
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(dec("l_extendedprice") * (one - dec("l_discount"))).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", dround(F.col("total_rev")).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@query(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT IN ('PROMO', 'ECONOMY')
      AND p_size IN (1, 4, 9, 14, 19, 24, 28, 33)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analog: distinct supplier counts per (brand, type,
    size) excluding blacklisted suppliers (NOT IN -> LEFT ANTI; the
    complaint filter becomes a negative-balance filter — no s_comment
    in the reduced schema). Scale: part filter and the small blacklist
    set are unhinted (both SF-scaling; AQE broadcasts them while they
    fit); one distinct-agg shuffle."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").isin("PROMO", "ECONOMY"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 24, 28, 33))
    )
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q20_part_promotion",
    """
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'red%'
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > CAST(50 AS DECIMAL(18,4))
    )
    ORDER BY s_name
    """,
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analog: suppliers who moved >50 units of red parts in
    1996 (the partsupp availability check becomes a shipped-quantity
    HAVING; IN -> LEFT SEMI). Scale: part joined into lineitem
    (unhinted, AQE picks), one suppkey agg, then a semi join into the
    supplier dim with nation kept broadcast."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    movers = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > F.lit(50).cast(DEC))
        .select("l_suppkey")
    )
    return (
        supp.join(movers, supp.s_suppkey == movers.l_suppkey, "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@query(
    "q21_waiting_supplier",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analog: suppliers solely responsible for the returned
    line on finalized multi-supplier orders (receipt-past-commit becomes
    returnflag='R'). EXISTS/NOT EXISTS over the same fact -> LEFT SEMI +
    LEFT ANTI self-joins with a non-equi suppkey clause. Scale: all
    three lineitem legs shuffle on the SAME orderkey, so AQE can reuse
    the exchange; the orders semi-join rides that same exchange rather
    than forcing a fact-table broadcast, and supplier is unhinted
    (SF-scaling, AQE picks)."""
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k1"), F.col("l_suppkey").alias("sk1")
    )
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("sk2"))
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("sk3")
    )
    waiting = (
        l1.join(
            l2, (F.col("k1") == F.col("k2")) & (F.col("sk1") != F.col("sk2")), "left_semi"
        )
        .join(
            l3, (F.col("k1") == F.col("k3")) & (F.col("sk1") != F.col("sk3")), "left_anti"
        )
        .join(orders, F.col("k1") == F.col("o_orderkey"), "left_semi")
    )
    return (
        waiting.join(supp, F.col("sk1") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "q22_global_sales",
    """
    WITH pool AS (
      SELECT substr(c_name, 18, 1) AS cntrycode, c_acctbal, c_custkey
      FROM customer
      WHERE substr(c_name, 18, 1) IN ('1', '3', '5', '7', '9')
    ),
    avgbal AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS s, COUNT(*) AS n
      FROM pool WHERE c_acctbal > 0
    )
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS totacctbal
    FROM pool, avgbal
    WHERE CAST(c_acctbal AS DECIMAL(18,4)) * n > s
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analog: balance-rich, urgent-order-less customers by
    name-digit 'country code' (c_phone -> c_name digit; every customer
    here has SOME order, so the NOT EXISTS is against urgent orders).
    Determinism: the above-average test is cross-multiplied
    (bal * n > sum) so it stays in exact integer/decimal arithmetic —
    no division anywhere. Scale: the 1-row average broadcast, anti join
    shuffles only custkeys."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    code = F.substring("c_name", 18, 1)
    pool = cust.filter(code.isin("1", "3", "5", "7", "9")).select(
        code.alias("cntrycode"), "c_acctbal", "c_custkey"
    )
    avgbal = pool.filter(F.col("c_acctbal") > 0).agg(
        F.sum(dec("c_acctbal")).alias("s"), F.count(F.lit(1)).alias("n")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        pool.crossJoin(F.broadcast(avgbal))
        .filter(dec("c_acctbal") * F.col("n") > F.col("s"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dround(F.sum(dec("c_acctbal"))).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@query(
    "q2_min_cost_supplier",
    """
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(18,4))) AS min_offer
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           CAST(min_offer AS DOUBLE) AS best_offer
    FROM part
      JOIN offers   ON p_partkey = l_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_size <= 25 AND p_type = 'LARGE'
      AND min_offer = (SELECT MIN(o2.min_offer) FROM offers o2
                       WHERE o2.l_partkey = offers.l_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analog: the EUROPE supplier(s) offering each LARGE
    size-15 part at its region-wide minimum price (ps_supplycost
    becomes the cheapest observed lineitem offer — no partsupp in the
    reduced schema). The correlated per-part MIN is a window over the
    (part, supplier) aggregate — one pass, no re-join of the subquery.
    Determinism: offers stay exact decimal end-to-end; the correlated
    equality compares exact decimals. Scale: nation/region keep
    broadcast hints (constant); supplier/part are unhinted (SF-scaling,
    AQE picks); the only wide shuffle is the (part, supplier)
    aggregate, and the window repartitions those small aggregated rows
    by partkey only."""
    from pyspark.sql.window import Window

    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 25) & (F.col("p_type") == "LARGE")
    )
    offers = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(dec("l_extendedprice")).alias("min_offer"))
    )
    part_min = F.min("min_offer").over(Window.partitionBy("l_partkey"))
    best = offers.withColumn("part_min", part_min).filter(
        F.col("min_offer") == F.col("part_min")
    )
    return (
        best.join(part, F.col("l_partkey") == part.p_partkey)
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.col("min_offer").cast("double").alias("best_offer"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q17_small_quantity_revenue",
    """
    WITH bp AS (
      SELECT p_partkey FROM part WHERE p_brand = 'Brand#4'
    ), li AS (
      SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
      FROM lineitem l JOIN bp ON l.l_partkey = bp.p_partkey
    ), th AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                    / CAST(COUNT(*) AS DOUBLE)) AS thr
      FROM li GROUP BY l_partkey
    )
    SELECT COUNT(*)::BIGINT AS n_items,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                 / 7.0, 2) AS avg_yearly
    FROM li JOIN th USING (l_partkey)
    WHERE l_quantity < thr
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue), adapted to the
    testdata's part schema (brand filter only — no p_container
    column): average yearly revenue lost if small-quantity orders
    (below 20% of the part's average quantity) were not filled, for
    one brand's parts. The decorrelated form every engine plans:
    per-part averages as a grouped aggregate joined back, instead of a
    per-row correlated subquery.

    Determinism: per-part averages via exact decimal sums cast to
    double in one pinned expression; the final division by 7.0 happens
    on the exact decimal total cast to double.

    Scale: the brand part list (~1/25 of part — SF-scaling, so
    unhinted) joins into lineitem first; AQE broadcasts it while it
    fits, filtering lineitem map-side BEFORE the per-part aggregation,
    and past that it shuffles instead of OOMing. The only guaranteed
    shuffle is the partkey aggregation of the brand's lineitems; the
    threshold table (one row per brand part, also unhinted) joins
    back the same way. Lineitem is never shuffled whole, never scanned
    twice at the storage level (both consumers share the same filtered
    scan)."""
    part = t(spark, sf_dir, "part")
    li_all = t(spark, sf_dir, "lineitem")
    bp = part.filter(F.col("p_brand") == "Brand#4").select("p_partkey")
    li = li_all.join(
        bp, li_all["l_partkey"] == bp["p_partkey"]
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    th = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(dec("l_quantity")).alias("sq"),
            F.count(F.lit(1)).alias("cq"),
        )
        .select(
            "l_partkey",
            (
                F.lit(0.2)
                * (F.col("sq").cast("double") / F.col("cq").cast("double"))
            ).alias("thr"),
        )
    )
    return (
        li.join(th, "l_partkey")
        .filter(F.col("l_quantity") < F.col("thr"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.round(
                F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0), 2
            ).alias("avg_yearly"),
        )
    )
