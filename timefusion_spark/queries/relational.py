"""Relational operator coverage (SURVEY §2.2-§2.8).

The reference delegates all of these to DataFusion (SURVEY: "TimeFusion
implements almost no relational operators itself"); we delegate to Spark
SQL / Catalyst. Each query exists to pin one operator family against the
DuckDB oracle: scan+filter+projection, hash aggregate (partial/final),
joins (inner/left/semi/anti/broadcast), windows, sort/top-K, set ops,
grouping sets, FILTER aggregates, subqueries.

Scale notes (100 TB posture):
- filters/projections are expressed on the scan so Catalyst pushes them
  into parquet (PushedFilters / ReadSchema);
- small dims (region/nation/supplier) are broadcast() — no shuffle;
- top-K uses orderBy().limit() → TakeOrderedAndProject (no global sort);
- aggregates rely on partial/final hash agg (map-side combine built-in).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timefusion_spark.queries._tables import t
from timefusion_spark.registry import query


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                         AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                    AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                 AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)   AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                         AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                    AS avg_price,
           ROUND(AVG(l_discount), 4)                                         AS avg_disc,
           COUNT(*)                                                          AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: scan → pushed filter → 8-agg hash aggregate → sort.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS total_price, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    doc="Top-K: orderBy+limit → TakeOrderedAndProject (streaming top-K, no "
    "global sort). Mirrors the reference's OrderedUnionForTopK goal "
    "(optimizers/ordered_union_for_topk.rs) without custom rules.",
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("total_price"),
            "o_orderdate",
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: 3-way join (customer side broadcast) + agg + top-K.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(li.l_orderkey.alias("orderkey"), o.o_orderdate.alias("orderdate"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("orderkey", "revenue", "orderdate")
        .orderBy(F.col("revenue").desc(), F.col("orderkey"))
        .limit(10)
    )


@query(
    "q_join_chain_rollup",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           COUNT(*) AS n_customers, ROUND(SUM(c.c_acctbal), 2) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    ORDER BY region_name NULLS FIRST, nation_name NULLS FIRST
    """,
    doc="Broadcast join chain over dims + ROLLUP grouping sets (§2.4).",
)
def q_join_chain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.select(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"), "c_acctbal")
        .rollup("region_name", "nation_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"))
        .orderBy(F.col("region_name").asc_nulls_first(), F.col("nation_name").asc_nulls_first())
    )


@query(
    "q_cube_lineitem",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="CUBE grouping sets (§2.4 grouping sets / cube / rollup).",
)
def q_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@query(
    "q_semi_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    ORDER BY c_custkey
    """,
    doc="Left-semi join (EXISTS).",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name").orderBy("c_custkey")


@query(
    "q_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    doc="Left-anti join (NOT EXISTS).",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name").orderBy("c_custkey")


@query(
    "q_left_outer_join_agg",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders,
           ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS total_spent
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    ORDER BY c.c_custkey
    """,
    doc="Left outer join + aggregate over nullable side.",
)
def q_left_outer_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


@query(
    "q_setops",
    oracle="""
    (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
     INTERSECT
     SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 450000
    ORDER BY custkey
    """,
    doc="Set operations: INTERSECT / EXCEPT (distinct semantics, §2.8).",
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    f_cust = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    o_cust = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    big = o.where(F.col("o_totalprice") > 450000).select(F.col("o_custkey").alias("custkey"))
    return f_cust.intersect(o_cust).subtract(big).orderBy("custkey")


@query(
    "q_union_all_distinct",
    oracle="""
    SELECT DISTINCT nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    ) u
    ORDER BY nationkey
    """,
    doc="UNION ALL + DISTINCT.",
)
def q_union_all_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct().orderBy("nationkey")


@query(
    "q_having",
    oracle="""
    SELECT l_suppkey, COUNT(*) AS n_items, ROUND(SUM(l_extendedprice), 2) AS total
    FROM lineitem
    GROUP BY l_suppkey
    HAVING COUNT(*) > 400
    ORDER BY l_suppkey
    """,
    doc="GROUP BY + HAVING (aggregations.slt:53-192 analog).",
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_items"), F.round(F.sum("l_extendedprice"), 2).alias("total"))
        .where(F.col("n_items") > 400)
        .orderBy("l_suppkey")
    )


@query(
    "q_filter_agg",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2) AS finished_total
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="FILTER (WHERE ...) aggregates — the reference's error-rate pattern "
    "(README.md:181-183).",
)
def q_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    fin = F.col("o_orderstatus") == "F"
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(fin, 1)).alias("n_finished"),
            F.round(F.sum(F.when(fin, F.col("o_totalprice"))), 2).alias("finished_total"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_count_star",
    oracle="SELECT COUNT(*) AS n FROM lineitem",
    doc="Bare COUNT(*) — the reference's count-pushdown path "
    "(count_pushdown.rs); Spark answers from parquet row-group metadata "
    "via aggregate pushdown.",
)
def q_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q_window_running_sum",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           ROUND(SUM(l_quantity) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
    FROM lineitem
    WHERE l_suppkey <= 3
    ORDER BY l_suppkey, l_orderkey, l_linenumber
    """,
    doc="Running aggregate window (§2.5), deterministic total order.",
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = t(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 3)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w), 2).alias("running_qty"),
    ).orderBy("l_suppkey", "l_orderkey", "l_linenumber")


@query(
    "q_window_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, ROUND(p_retailprice, 2) AS price, rn
    FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
        FROM part
    ) x
    WHERE rn <= 3
    ORDER BY p_brand, rn
    """,
    doc="Top-K per group via row_number window (§2.5 ranking).",
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    p = t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        p.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", F.round("p_retailprice", 2).alias("price"), "rn")
        .orderBy("p_brand", "rn")
    )


@query(
    "q_window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           LAG(o_orderkey) OVER w  AS prev_orderkey,
           LEAD(o_orderkey) OVER w AS next_orderkey,
           RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS prio_rank
    FROM orders
    WHERE o_custkey <= 20
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    doc="Analytic windows: lag / lead / rank (§2.5).",
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = t(spark, sf_dir, "orders").where(F.col("o_custkey") <= 20)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wr = W.partitionBy("o_custkey").orderBy("o_orderpriority")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.rank().over(wr).alias("prio_rank"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "q_scalar_subquery",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS total_price
    FROM orders
    WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
    ORDER BY o_orderkey
    """,
    doc="Scalar subquery in predicate (§2.2 / DF built-in decorrelation).",
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("tf_orders_scalar_sub")
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS total_price
        FROM tf_orders_scalar_sub
        WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM tf_orders_scalar_sub)
        ORDER BY o_orderkey
        """
    )


@query(
    "q_distinct_count",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_custs,
           COUNT(DISTINCT o_orderpriority) AS n_prios
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="COUNT(DISTINCT) — expand + two-phase agg in Spark.",
)
def q_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_custs"),
            F.countDistinct("o_orderpriority").alias("n_prios"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q_in_subquery_join",
    oracle="""
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name IN ('ASIA', 'EUROPE'))
    ORDER BY s.s_suppkey
    """,
    doc="IN-subquery → semi join; dim broadcast.",
)
def q_in_subquery_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.select("r_regionkey")), n.n_regionkey == F.col("r_regionkey"), "left_semi")
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation_name"))
        .orderBy("s_suppkey")
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation_name
    """,
    doc="TPC-H Q5 shape: 6-way join with compound join condition.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("nation_name"))
    )


@query(
    "q_exists_correlated",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
                        AND o2.o_totalprice > 400000)
    ORDER BY c_custkey
    """,
    doc="Correlated EXISTS / NOT EXISTS (DF-delegated subquery "
    "decorrelation, SURVEY §4.1): Catalyst rewrites to semi/anti joins.",
)
def q_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    for name in ("customer", "orders"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"_tf_{name}")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM _tf_customer c
        WHERE EXISTS (SELECT 1 FROM _tf_orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM _tf_orders o2
                          WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
                            AND o2.o_totalprice > 400000)
        ORDER BY c_custkey
        """
    )


@query(
    "q_like_filtering",
    oracle="""
    SELECT COUNT(*) AS n_all,
           COUNT(*) FILTER (WHERE p_type LIKE 'PROMO%') AS n_promo,
           COUNT(*) FILTER (WHERE p_type LIKE '%BRUSHED%') AS n_brushed,
           COUNT(*) FILTER (WHERE p_name LIKE '_lmond%') AS n_underscore,
           COUNT(*) FILTER (WHERE lower(p_name) LIKE '%sea%') AS n_ilike
    FROM part
    """,
    doc="LIKE-family filtering (tests/slt/filtering.slt shapes): prefix "
    "(pushable as range), infix contains, '_' single-char, ILIKE via lower.",
)
def q_like_filtering(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    return p.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count(F.when(F.col("p_type").like("PROMO%"), 1)).alias("n_promo"),
        F.count(F.when(F.col("p_type").like("%BRUSHED%"), 1)).alias("n_brushed"),
        F.count(F.when(F.col("p_name").like("_lmond%"), 1)).alias("n_underscore"),
        F.count(F.when(F.lower(F.col("p_name")).like("%sea%"), 1)).alias("n_ilike"),
    )


@query(
    "q_null_semantics",
    oracle="""
    WITH x AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END AS v,
               CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderpriority END AS p
        FROM orders WHERE o_orderkey <= 1000
    )
    SELECT COUNT(*) AS n_rows,
           COUNT(v) AS n_nonnull,
           CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           ROUND(SUM(COALESCE(v, 0)), 2) AS sum_coalesced,
           CAST(SUM(CASE WHEN p IS DISTINCT FROM 'URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_distinct_from,
           CAST(SUM(CASE WHEN NULLIF(p, '1-URGENT') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nullif
    FROM x
    """,
    doc="NULL-semantics edge cases (tests/slt/edge_cases.slt): COUNT vs "
    "COUNT(col), COALESCE, IS DISTINCT FROM (null-safe), NULLIF.",
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 1000)
    x = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, None)
        .otherwise(F.col("o_totalprice"))
        .alias("v"),
        F.when(F.col("o_orderkey") % 5 == 0, None)
        .otherwise(F.col("o_orderpriority"))
        .alias("p"),
    )
    return x.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("v").alias("n_nonnull"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias("n_null"),
        F.round(F.sum(F.coalesce("v", F.lit(0.0))), 2).alias("sum_coalesced"),
        F.sum(
            F.when(~F.col("p").eqNullSafe(F.lit("URGENT")), 1).otherwise(0)
        ).alias("n_distinct_from"),
        F.sum(
            F.when(F.nullif(F.col("p"), F.lit("1-URGENT")).isNull(), 1).otherwise(0)
        ).alias("n_nullif"),
    )


@query(
    "q_date_bin_origin",
    oracle="""
    SELECT timezone('UTC', to_timestamp(floor((epoch(ts) - epoch(TIMESTAMP '2026-01-01 00:30:00')) / 3600) * 3600
                + epoch(TIMESTAMP '2026-01-01 00:30:00'))) AS bucket,
           COUNT(*) AS n
    FROM events
    GROUP BY 1
    ORDER BY bucket
    """,
    doc="PG date_bin: origin-aligned bucketing (time_bucket with explicit "
    "origin — functions/time.py date_bin).",
)
def q_date_bin_origin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timefusion_spark.functions.time import date_bin

    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(date_bin("1 hour", F.col("ts"), "2026-01-01 00:30:00").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


@query(
    "q_grouping_sets_explicit",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="Explicit GROUPING SETS (§2.4) — not just ROLLUP/CUBE sugar; "
    "DataFrame.groupingSets (Spark 4) → Expand + hash aggregate.",
)
def q_grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = t(spark, sf_dir, "orders")
    return (
        od.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@query(
    "q_window_time_range",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_trailing_1h,
           ROUND(AVG(value) OVER w, 4) AS avg_trailing_1h
    FROM events
    WHERE user_id % 50 = 0
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
    doc="Time-based RANGE BETWEEN window frame (§2.5): trailing 1-hour "
    "aggregate per user ordered by microsecond epoch — a RANGE frame over "
    "a numeric order key, identical semantics in Spark and DuckDB.",
)
def q_window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").where(F.col("user_id") % 50 == 0)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
        F.round(F.avg("value").over(w), 4).alias("avg_trailing_1h"),
    ).orderBy("user_id", "event_id")


@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey,
           c.c_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           c.c_acctbal,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= DATE '1995-10-01'
      AND o.o_orderdate <  DATE '1996-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 (returned-item reporting): 4-way join — nation "
    "broadcast, customer broadcast against the orders⨝lineitem fact "
    "spine — revenue aggregate, top-20. The date filter prunes orders at "
    "the scan; only 'R' lineitems survive to the join.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1995-10-01") & (F.col("o_orderdate") < "1996-01-01")
    )
    li = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q18_large_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 250
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS VARCHAR) AS o_orderdate,
           o.o_totalprice,
           ROUND(SUM(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 (large-volume customers): self-referencing HAVING "
    "subquery — the big-order key set is itself an aggregate of lineitem, "
    "then rejoined as a semi-filter. The aggregate side is tiny and "
    "broadcasts; lineitem is scanned twice but shuffles once.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .where(F.col("_q") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(
            F.broadcast(big).withColumnRenamed("l_orderkey", "_bk"),
            F.col("l_orderkey") == F.col("_bk"),
            "left_semi",
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 (forecast revenue): the pure scan-filter-aggregate shape "
    "— every predicate reaches the parquet scan as a PushedFilter, no "
    "shuffle beyond the single-row partial-agg merge. Decimal products "
    "keep the sum order-independent, so the hash cannot drift with "
    "partitioning.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * F.col("l_discount").cast("decimal(18,2)")
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (order-priority checking, adapted to the testdata "
    "columns): correlated EXISTS with an extra non-equi conjunct "
    "(l_shipdate > o_orderdate) decorrelated into a left-semi join — the "
    "orders date filter pushes to the scan, the semi join carries the "
    "residual comparison.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q14_promo_effect",
    oracle="""
    SELECT ROUND(CAST(100.00 * SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE CAST(0 AS DECIMAL(18,4)) END)
                 / SUM(rev) AS DOUBLE), 4) AS promo_revenue_pct,
           COUNT(*) AS n
    FROM (
      SELECT p_type,
             CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2))) AS rev
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
    ) x
    """,
    doc="TPC-H Q14 shape (promotion effect): conditional-aggregate ratio "
    "over a broadcast lineitem-part join on a one-month window. Decimal "
    "sums keep both the numerator and denominator order-independent so "
    "the ratio hashes identically under any partitioning.",
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    joined = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey")).select(
        "p_type", rev.alias("rev")
    )
    return joined.agg(
        F.round(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(
                        F.lit(0).cast("decimal(18,4)")
                    )
                )
                / F.sum("rev")
            ).cast("double"),
            4,
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q19_disjunctive_join",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape (discounted revenue): disjunctive multi-predicate "
    "join — three OR'd (brand, size, quantity) branches. The equi-key "
    "(p_partkey = l_partkey) still drives a broadcast hash join; the "
    "disjunction stays a post-join filter, and per-branch part/lineitem "
    "range predicates are pushed where single-sided.",
)
def q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return j.where(branch).agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q22_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey, COUNT(*) AS numcust, ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    doc="TPC-H Q22 shape (global sales opportunity, cntrycode -> "
    "nationkey): scalar-subquery threshold (avg positive balance, "
    "broadcast as a 1-row frame) + NOT EXISTS anti join against recent "
    "orders, grouped per nation.",
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("_a"))
    rich = c.join(F.broadcast(avg_bal)).where(F.col("c_acctbal") > F.col("_a"))
    no_orders = rich.join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
    return (
        no_orders.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           ROUND(CAST(SUM(rev) AS DOUBLE), 2) AS revenue,
           COUNT(*) AS n
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2))) AS rev
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
    ) x
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape (volume shipping): 6-way join with a symmetric "
    "nation-pair disjunction and per-year rollup. Both nation sides and "
    "supplier/customer broadcast; lineitem-orders is the only fact-fact "
    "shuffle.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.withColumnRenamed("n_name", "supp_nation").withColumnRenamed(
        "n_nationkey", "_nk1"
    )
    n2 = n.withColumnRenamed("n_name", "cust_nation").withColumnRenamed(
        "n_nationkey", "_nk2"
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    j = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_nk2"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            rev.alias("rev"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(F.sum("rev").cast("double"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT l_year,
           ROUND(CAST(SUM(CASE WHEN supp_region = 'REGION_1' THEN rev
                               ELSE CAST(0 AS DECIMAL(18,4)) END)
                      / SUM(rev) AS DOUBLE), 4) AS mkt_share,
           COUNT(*) AS n
    FROM (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS l_year,
             r.r_name AS supp_region,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS rev
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    ) x
    GROUP BY l_year
    ORDER BY l_year
    """,
    doc="TPC-H Q8 shape (national market share): per-year share of one "
    "supplier region inside an ECONOMY-part order volume — 6-way join, "
    "conditional-decimal ratio. All dimensions broadcast.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY").select("p_partkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_orderdate")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = t(spark, sf_dir, "region")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    j = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
    )
    shaped = j.select(
        F.year("o_orderdate").cast("bigint").alias("l_year"),
        F.col("r_name").alias("supp_region"),
        rev.alias("rev"),
    )
    return (
        shaped.groupBy("l_year")
        .agg(
            F.round(
                (
                    F.sum(
                        F.when(F.col("supp_region") == "REGION_1", F.col("rev")).otherwise(
                            F.lit(0).cast("decimal(18,4)")
                        )
                    )
                    / F.sum("rev")
                ).cast("double"),
                4,
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_year")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    ) per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape (customer order-count distribution): left outer "
    "join with a join-side predicate (NOT a post-filter — customers with "
    "zero qualifying orders must survive as c_count=0), then a second "
    "aggregation over the first's output. Mirrors DataFusion's "
    "HashJoin(LeftOuter)+two-level HashAggregate plan for the reference "
    "(SURVEY §2.3/§2.4). Scale: the per-customer agg shuffles on "
    "c_custkey once; the histogram re-agg is tiny (distinct counts).",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS supp_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY suppkey
    """,
    doc="TPC-H Q15 shape (top supplier): a derived revenue view consumed "
    "twice — once as the join input, once reduced to a scalar MAX — the "
    "reference's CREATE VIEW + scalar-subquery lifecycle "
    "(SURVEY §2.2/§2.4). Decimal-cast sums keep the equality-on-rounded-"
    "revenue deterministic across engines. Scale: revenue aggregates on "
    "l_suppkey (one shuffle, |suppliers| rows out); the 1-row MAX and the "
    "supplier dim both broadcast — no second big-table shuffle.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
                ).cast("double"),
                2,
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("_max_rev"))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("_max_rev"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
            "total_revenue",
        )
        .orderBy("suppkey")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND p.p_type = 'MEDIUM'
      AND l.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity)
        FROM lineitem l2
        WHERE l2.l_partkey = p.p_partkey
      )
    """,
    doc="TPC-H Q17 shape (small-quantity-order revenue): correlated scalar "
    "AVG subquery against the fact table itself. Decorrelated Spark-first: "
    "the selective part filter broadcasts into BOTH fact scans, the "
    "per-part 0.2*AVG aggregate (|matched parts| rows) broadcasts back — "
    "zero fact-table shuffles, two pruned fact scans, exactly the plan "
    "DataFusion's scalar-subquery decorrelation rule produces for the "
    "reference (SURVEY §4.1). Single row out.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        t(spark, sf_dir, "part")
        .where((F.col("p_brand") == "Brand#23") & (F.col("p_type") == "MEDIUM"))
        .select("p_partkey")
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    matched = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).drop(
        "p_partkey"
    )
    thresholds = matched.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("_qty_thresh")
    )
    return (
        matched.join(F.broadcast(thresholds), "l_partkey")
        .where(F.col("l_quantity") < F.col("_qty_thresh"))
        .agg(F.round(F.sum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly"))
    )


@query(
    "q9_profit_by_nation",
    oracle="""
    SELECT n.n_name AS nation_name,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                          - CAST(0.1 AS DECIMAL(18,2))
                            * CAST(p.p_retailprice AS DECIMAL(18,2))
                            * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT)
    ORDER BY nation_name, o_year DESC
    """,
    doc="TPC-H Q9 shape (product-type profit, adapted: the driver testdata "
    "has no partsupp, so supply cost is proxied as 0.1*p_retailprice — the "
    "join/agg shape is unchanged): 5-way join where the fact table joins "
    "three broadcast dims and one shuffle join (orders), LIKE pushdown on "
    "p_name, decimal profit expression, two-key rollup. The largest join "
    "tree in the TPC-H suite (SURVEY §2.3).",
)
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    p = (
        t(spark, sf_dir, "part")
        .where(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        - F.lit(0.1).cast("decimal(18,2)")
        * F.col("p_retailprice").cast("decimal(18,2)")
        * F.col("l_quantity").cast("decimal(18,2)")
    )
    j = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
    )
    return (
        j.select(
            F.col("n_name").alias("nation_name"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            profit.alias("_profit"),
        )
        .groupBy("nation_name", "o_year")
        .agg(F.round(F.sum("_profit").cast("double"), 2).alias("sum_profit"))
        .orderBy("nation_name", F.col("o_year").desc())
    )


@query(
    "q12_priority_classes",
    oracle="""
    SELECT l.l_returnflag AS returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_returnflag
    ORDER BY returnflag
    """,
    doc="TPC-H Q12 shape (shipping-priority classes, adapted: the driver "
    "lineitem has no l_shipmode/l_receiptdate, so the class split keys on "
    "l_returnflag and the date window on l_shipdate — the join + "
    "conditional-CASE-aggregation shape is unchanged). The year filter is "
    "pushed to the lineitem scan; orders joins on the shuffled key.",
)
def q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    # NULL priority counts in NEITHER class: `IN`/`NOT IN` over NULL are
    # both NULL, so the oracle's CASE falls to ELSE 0 on both sides —
    # when(high, 0).otherwise(1) would count a NULL as low (review r12)
    low = ~F.coalesce(high, F.lit(True))
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(low, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("returnflag")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name AS supp_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, supp_name
    LIMIT 100
    """,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting, adapted: no "
    "l_receiptdate/l_commitdate in the driver testdata, so 'late' is "
    "l_returnflag='R' — the EXISTS + NOT EXISTS correlated double "
    "self-join shape is unchanged). Spark-first decorrelation: both "
    "subqueries become LeftSemi/LeftAnti hash joins on l_orderkey with a "
    "non-equi residual (l2.l_suppkey <> l1.l_suppkey), the same plan "
    "DataFusion's decorrelator emits (SURVEY §4.1). The ORDER BY is a "
    "total order (s_name is unique), so the LIMIT cut is deterministic.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    l1 = li.where(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    l2 = li.select(
        F.col("l_orderkey").alias("_ok2"), F.col("l_suppkey").alias("_sk2")
    )
    l3 = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("_ok3"), F.col("l_suppkey").alias("_sk3")
    )
    waiting = (
        l1.join(o, F.col("l_orderkey") == F.col("o_orderkey")).drop("o_orderkey")
        .join(
            l2,
            (F.col("l_orderkey") == F.col("_ok2"))
            & (F.col("l_suppkey") != F.col("_sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("_ok3"))
            & (F.col("l_suppkey") != F.col("_sk3")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.col("s_name").alias("supp_name"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "supp_name")
        .limit(100)
    )


@query(
    "q_window_rank_family",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           NTILE(4) OVER w AS tile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pr,
           ROUND(CUME_DIST() OVER w, 6) AS cd,
           FIRST_VALUE(o_orderkey) OVER w AS best_key,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_key
    FROM orders
    WHERE o_orderkey <= 500
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_orderpriority, pr, o_orderkey
    """,
    doc="Distribution-rank window family (§2.5 completion): NTILE / "
    "PERCENT_RANK / CUME_DIST / FIRST_VALUE / NTH_VALUE over one "
    "partitioned order. The ORDER BY carries a unique tiebreak "
    "(o_orderkey), so every rank value — and NTH_VALUE under the default "
    "RANGE UNBOUNDED PRECEDING..CURRENT ROW frame, identical in Spark "
    "and PG/DuckDB — is deterministic. One shuffle on the partition key.",
)
def q_window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            F.ntile(4).over(w).alias("tile"),
            F.round(F.percent_rank().over(w), 6).alias("pr"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
            F.first("o_orderkey").over(w).alias("best_key"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
        )
        .orderBy("o_orderpriority", "pr", "o_orderkey")
    )


@query(
    "q_lateral_topk_per_nation",
    oracle="""
    SELECT n.n_name AS nation_name, l.o_orderkey AS orderkey,
           ROUND(l.o_totalprice, 2) AS total_price
    FROM nation n, LATERAL (
        SELECT o.o_orderkey, o.o_totalprice
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 2
    ) l
    ORDER BY nation_name, total_price DESC, orderkey
    """,
    doc="Correlated LATERAL subquery with per-group ORDER BY + LIMIT "
    "(PG's idiomatic top-N-per-key; SURVEY §2.3 subquery surface): "
    "expressed through Spark SQL's LATERAL join and decorrelated by "
    "Catalyst. The oracle runs the identical SQL in DuckDB — both "
    "engines reduce it to a per-nation top-2.",
)
def q_lateral_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    for name in ("nation", "orders", "customer"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"_lat_{name}")
    return spark.sql(
        """
        SELECT n.n_name AS nation_name, l.o_orderkey AS orderkey,
               ROUND(l.o_totalprice, 2) AS total_price
        FROM _lat_nation n, LATERAL (
            SELECT o.o_orderkey, o.o_totalprice
            FROM _lat_orders o
            JOIN _lat_customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY o.o_totalprice DESC, o.o_orderkey
            LIMIT 2
        ) l
        ORDER BY nation_name, total_price DESC, orderkey
        """
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH vol AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))) AS v
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT s.s_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           ROUND(CAST(SUM(v.v) AS DOUBLE), 2) AS total_volume
    FROM vol v JOIN supplier s ON s.s_suppkey = v.l_suppkey
    GROUP BY s.s_nationkey
    HAVING SUM(v.v) > (SELECT SUM(v) * 0.03 FROM vol)
    ORDER BY total_volume DESC, nationkey
    """,
    doc="TPC-H Q11 shape (important stock, adapted: no partsupp in the "
    "driver testdata, so the volume base is lineitem price×quantity per "
    "supplier — the HAVING-against-a-global-scalar-subquery shape is "
    "unchanged): groups survive only if their sum exceeds a fraction of "
    "the WHOLE table's sum. Spark-first: the global total is a 1-row "
    "aggregate broadcast into the HAVING filter — the per-group and "
    "global aggregates share one shuffled base. Exact decimal sums make "
    "the threshold comparison order-independent.",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    vol = li.groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * F.col("l_quantity").cast("decimal(18,2)")
        ).alias("v")
    )
    total = vol.agg((F.sum("v") * F.lit(0.03)).alias("_thresh"))
    grouped = (
        vol.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum("v").alias("_vol"),
        )
    )
    return (
        grouped.join(F.broadcast(total), F.col("_vol") > F.col("_thresh"))
        .select(
            "nationkey",
            "n_suppliers",
            F.round(F.col("_vol").cast("double"), 2).alias("total_volume"),
        )
        .orderBy(F.col("total_volume").desc(), "nationkey")
    )


# ---------------------------------------------------------------------------
# TPC-H Q2 / Q16 / Q20 shapes — the last three of the 22. The driver
# testdata has no partsupp table, so each derives the part-supplier
# relation from lineitem (the same adaptation q11 uses): ps_supplycost =
# MIN(l_extendedprice / l_quantity) per (part, supplier); ps_availqty =
# SUM(l_quantity). The SHAPES under test — correlated scalar-MIN
# decorrelation (Q2), NOT IN exclusion + COUNT(DISTINCT) (Q16), nested
# IN with a correlated scalar SUM (Q20) — are unchanged.
# ---------------------------------------------------------------------------


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(l_extendedprice / l_quantity) AS ps_supplycost
      FROM lineitem GROUP BY 1, 2
    ), rps AS (
      SELECT ps.*, s.s_name, s.s_acctbal, n.n_name
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'
    )
    SELECT ROUND(rps.s_acctbal, 2) AS acctbal, rps.s_name AS supp_name,
           rps.n_name AS nation_name, p.p_partkey AS partkey,
           p.p_type AS part_type,
           FLOOR(rps.ps_supplycost * 10000 + 0.5) / 10000 AS supplycost
    FROM part p
    JOIN rps ON rps.ps_partkey = p.p_partkey
    WHERE p.p_size <= 5
      AND rps.ps_supplycost = (
          SELECT MIN(r2.ps_supplycost) FROM rps r2
          WHERE r2.ps_partkey = p.p_partkey)
    ORDER BY acctbal DESC, nation_name, supp_name, partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape (minimum-cost supplier; partsupp derived from "
    "lineitem as MIN(price/qty) per (part, supplier)): the correlated "
    "scalar-MIN subquery — 'the supplier whose cost equals the regional "
    "minimum for that part' — hand-decorrelated into a per-part MIN "
    "aggregate joined back on (partkey, cost), exactly Catalyst's "
    "rewrite. Spark-first: supplier/nation/region dims broadcast into "
    "the derived ps relation (no fact shuffle for the dim filter); the "
    "per-part min and the probe share one shuffled base; final ORDER BY "
    "… LIMIT 100 is TakeOrderedAndProject. Cost equality is exact: both "
    "sides are the same IEEE double, and MIN returns a member of the "
    "set, so engines agree bit-for-bit.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    p = t(spark, sf_dir, "part").where(F.col("p_size") <= 5).select("p_partkey", "p_type")
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"))
    rps = (
        ps.join(F.broadcast(s), F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("ps_partkey", "ps_suppkey", "ps_supplycost", "s_name", "s_acctbal", "n_name")
    )
    # per-part regional MIN as a window, not a groupBy+self-join: the
    # decorrelated-join plan evaluates the whole rps pipeline (lineitem
    # agg + three broadcasts) TWICE and adds a sort-merge join on
    # (partkey, cost); the window shuffles rps ONCE on ps_partkey and
    # filters in place — the plan you'd want at 100 TB.
    from pyspark.sql import Window as W

    min_cost = F.min("ps_supplycost").over(W.partitionBy("ps_partkey"))
    return (
        rps.withColumn("_min_cost", min_cost)
        .where(F.col("ps_supplycost") == F.col("_min_cost"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("ps_partkey"))
        .select(
            F.round("s_acctbal", 2).alias("acctbal"),
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("nation_name"),
            F.col("p_partkey").alias("partkey"),
            F.col("p_type").alias("part_type"),
            # explicit half-up rounding (floor(x*1e4+0.5)/1e4): built-in
            # ROUND()s disagree across engines exactly at half-step ties
            (F.floor(F.col("ps_supplycost") * 10000 + F.lit(0.5)) / 10000).alias("supplycost"),
        )
        .orderBy(F.col("acctbal").desc(), "nation_name", "supp_name", "partkey")
        .limit(100)
    )


@query(
    "q16_supplier_relationship",
    oracle="""
    WITH ps AS (
      SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
      FROM lineitem
    )
    SELECT p.p_brand AS brand, p.p_type AS part_type, p.p_size AS size,
           CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 2, 3, 4, 5, 6, 7, 8)
      AND ps.ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier
          WHERE s_acctbal < (SELECT AVG(s_acctbal) * 0.5 FROM supplier))
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, brand, part_type, size
    """,
    doc="TPC-H Q16 shape (parts/supplier relationship; partsupp derived "
    "as DISTINCT (l_partkey, l_suppkey); the comment-pattern exclusion "
    "adapted to an acctbal-threshold subquery since the testdata "
    "supplier has no s_comment): COUNT(DISTINCT supplier) per part "
    "attribute bucket with a NOT IN anti-join exclusion. Spark-first: "
    "the exclusion list is a self-threshold subquery (1-row global AVG "
    "broadcast) resolved to a broadcast LEFT ANTI join — s_suppkey is "
    "non-null so NOT IN == anti join; part dim broadcast; "
    "COUNT(DISTINCT) is Spark's two-phase expand/partial-agg, no "
    "driver-side distinct.",
)
def q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    p = (
        t(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#13")
            & (~F.col("p_type").startswith("PROMO"))
            & F.col("p_size").isin(list(range(1, 9)))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    ps = li.select(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).distinct()
    thresh = s.agg((F.avg("s_acctbal") * F.lit(0.5)).alias("_t"))
    excluded = (
        s.join(F.broadcast(thresh), F.col("s_acctbal") < F.col("_t"))
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(excluded), F.col("s_suppkey") == F.col("ps_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("ps_partkey"))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("part_type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "brand", "part_type", "size")
    )


@query(
    "q20_potential_promotion",
    oracle="""
    WITH avail AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             SUM(l_quantity) AS ps_availqty
      FROM lineitem GROUP BY 1, 2
    )
    SELECT s.s_name AS supp_name, n.n_name AS nation_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND s.s_suppkey IN (
        SELECT ps_suppkey FROM avail
        WHERE ps_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND ps_availqty > 0.5 * (
              SELECT SUM(l_quantity) FROM lineitem
              WHERE l_partkey = avail.ps_partkey
                AND l_suppkey = avail.ps_suppkey
                AND l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1997-01-01'))
    ORDER BY supp_name
    """,
    doc="TPC-H Q20 shape (potential part promotion; ps_availqty derived "
    "as the all-time SUM(l_quantity) per (part, supplier)): nested IN "
    "subqueries with a correlated scalar SUM — 'suppliers with more "
    "stock of a small-part than half of what shipped in 1996'. "
    "Spark-first: the correlated SUM is hand-decorrelated into a "
    "filtered per-(part,supplier) aggregate LEFT-joined back (NULL "
    "propagates: no 1996 shipments → comparison NULL → row excluded, "
    "matching SQL's scalar-subquery semantics); both IN filters become "
    "broadcast semi joins; the two aggregates share the lineitem scan "
    "shuffle key (l_partkey, l_suppkey).",
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    small_parts = (
        t(spark, sf_dir, "part").where(F.col("p_name").like("small%")).select("p_partkey")
    )
    avail = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(F.sum("l_quantity").alias("ps_availqty"))
    yr = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(F.col("l_partkey").alias("yr_partkey"), F.col("l_suppkey").alias("yr_suppkey"))
        .agg(F.sum("l_quantity").alias("yr_qty"))
    )
    qualifying = (
        avail.join(
            F.broadcast(small_parts), F.col("p_partkey") == F.col("ps_partkey"), "left_semi"
        )
        .join(
            yr,
            (F.col("yr_partkey") == F.col("ps_partkey"))
            & (F.col("yr_suppkey") == F.col("ps_suppkey")),
            "left",
        )
        # NULL yr_qty (no 1996 shipments) keeps SQL's scalar-subquery
        # semantics: NULL comparison → row excluded, NOT treated as 0.
        .where(F.col("ps_availqty") > F.lit(0.5) * F.col("yr_qty"))
        .select("ps_suppkey")
    )
    return (
        s.join(qualifying, F.col("ps_suppkey") == F.col("s_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select(F.col("s_name").alias("supp_name"), F.col("n_name").alias("nation_name"))
        .orderBy("supp_name")
    )
