"""Relational core queries over the TPC-H-ish testdata (SURVEY.md §2.5,
§2.7, §2.8: aggregations A5-A7, joins J1-J5, top-k T1-T5, window W1).

Scale notes are inline per query; the general pattern: dimension tables
(region/nation/supplier/part) broadcast, fact tables (orders/lineitem)
shuffle at most once on the aggregation key, global top-N uses Spark's
TakeOrdered (per-partition top-N, no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators import certs
from ..operators.windows import top_k_per_group
from . import query

DEC = "decimal(18,4)"

# Decimal-native money arithmetic: prices/discounts/taxes are 2-dp values
# stored as doubles; casting the INPUTS to decimal and multiplying keeps
# every per-row product exact, so sums are order-independent — required
# both for oracle parity and for deterministic results on a 1000-executor
# shuffle at 100TB.
_DISC_PRICE_DUCK = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "(CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
)
_CHARGE_DUCK = (
    f"({_DISC_PRICE_DUCK}) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))"
)


def _disc_price():
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )


def _charge():
    return _disc_price() * (
        F.lit(1).cast("decimal(3,2)") + F.col("l_tax").cast("decimal(3,2)")
    )


# --- A-family: grouped aggregation with exact decimal sums -----------------


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM({dp}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({ch}) AS DOUBLE) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    survey_ids="A2,A5 (grouped agg core)",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    out = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast(DEC)).alias("sum_base_price"),
        F.sum(_disc_price()).alias("sum_disc_price"),
        F.sum(_charge()).alias("sum_charge"),
        F.count(F.lit(1)).alias("count_order"),
    )
    # Sums stay DECIMAL internally (exact, order-independent across a
    # 1000-executor shuffle); the OUTPUT casts the final exact decimal to
    # double so both engines materialize the same float64 pandas dtype
    # (DuckDB .df() renders DECIMAL as float64; Decimal objects hash
    # differently in the driver's gate).
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("sum_base_price").cast("double").alias("sum_base_price"),
        F.col("sum_disc_price").cast("double").alias("sum_disc_price"),
        F.col("sum_charge").cast("double").alias("sum_charge"),
        F.round(F.col("sum_qty").cast("double") / F.col("count_order"), 6).alias(
            "avg_qty"
        ),
        "count_order",
    )


@query(
    "a5_distinct_stats",
    """
    SELECT p.p_brand,
           COUNT(*) AS tx_count,
           COUNT(DISTINCT l.l_suppkey) AS active_suppliers,
           COUNT(DISTINCT l.l_partkey) AS active_parts,
           CAST(epoch_us(MAX(l.l_shipdate)) AS BIGINT) AS max_ship_us
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    survey_ids="A5,A6 (count + countDistinct + max ts), J5 (broadcast dim)",
)
def a5_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # part is a dimension: broadcast so the fact table never shuffles for
    # the join; the groupBy then shuffles once on p_brand. At 100TB the
    # countDistinct pre-aggregates per partition (partial_count_distinct).
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("tx_count"),
            F.countDistinct("l_suppkey").alias("active_suppliers"),
            F.countDistinct("l_partkey").alias("active_parts"),
            F.unix_micros(F.max("l_shipdate")).alias("max_ship_us"),
        )
    )


@query(
    "a5_approx_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS exact_suppliers,
           COUNT(*) AS tx_count,
           TRUE AS within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey_ids="A5 declared 100TB-scale variant (approx_count_distinct)",
)
def a5_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct (HLL++ via approx_count_distinct) certified
    against the exact count IN THE SAME PLAN: the output carries the exact
    count plus a Spark-computed `within_5pct` boolean bounding the sketch
    error, so the DuckDB oracle (exact counts + literal TRUE) hash-checks
    the whole row. The approx path stays exercised — a sketch estimate
    outside 5% flips the boolean and fails the hash. At 100TB the exact
    countDistinct is dropped and only the sketch runs (the certified
    error bound is the contract); here both share one shuffle.

    The sketch is configured at rsd=0.01 so the certified 5% bound sits
    at ~5 sigma: with the default rsd=0.05 the bound is only ~1 sigma
    once HLL++ leaves sparse mode, i.e. at real scale within_5pct would
    flip FALSE with ~30% probability per group and the oracle hash would
    fail nondeterministically. (Test SFs stay in the near-exact sparse
    path either way; the tight rsd makes the certification honest at the
    scale the query is registered for.)"""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_suppkey", 0.01).alias("approx_suppliers"),
            F.countDistinct("l_suppkey").alias("exact_suppliers"),
            F.count(F.lit(1)).alias("tx_count"),
        )
        .select(
            "l_returnflag",
            "exact_suppliers",
            "tx_count",
            certs.within_frac(
                F.col("approx_suppliers"), F.col("exact_suppliers")
            ).alias("within_5pct"),
        )
    )


# --- J-family: star joins, anti join, multiway card merge ------------------


@query(
    "q5_region_revenue",
    """
    SELECT r.r_name, n.n_name,
           CAST(SUM({dp_l}) AS DOUBLE) AS revenue,
           COUNT(*) AS line_count
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY r.r_name, n.n_name
    """,
    survey_ids="J1,J5 (star join, broadcast dims), A2",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = _disc_price()
    # region/nation/customer are broadcast dims; the only shuffles are the
    # orders⋈lineitem join (on orderkey) and the final small groupBy.
    dim = F.broadcast(
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == o.o_orderkey)
        .join(dim, F.col("o_custkey") == dim.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


@query(
    "j2_customers_no_orders",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    survey_ids="J2 (left anti join)",
)
def j2_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "j3_card_merge",
    """
    WITH order_src AS (
        SELECT o_custkey AS custkey, COUNT(*) AS order_count,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend,
               MAX(o_orderdate) AS src_asof
        FROM orders GROUP BY o_custkey
    ), line_src AS (
        SELECT o.o_custkey AS custkey, COUNT(*) AS line_count,
               MAX(l.l_shipdate) AS src_asof
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_custkey
    )
    SELECT c.c_custkey, c.c_name, n.n_name,
           COALESCE(os.order_count, 0) AS order_count,
           COALESCE(os.total_spend, CAST(0 AS DOUBLE)) AS total_spend,
           COALESCE(ls.line_count, 0) AS line_count,
           CAST(epoch_us(LEAST(os.src_asof, ls.src_asof)) AS BIGINT) AS data_as_of_us,
           (CASE WHEN os.custkey IS NULL THEN 1 ELSE 0 END
            + CASE WHEN ls.custkey IS NULL THEN 1 ELSE 0 END) AS degraded_sources
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN order_src os ON os.custkey = c.c_custkey
    LEFT JOIN line_src ls ON ls.custkey = c.c_custkey
    """,
    survey_ids="J3 (multiway left-outer card merge, data_as_of=oldest), C16, ST7 degrade flags",
)
def j3_card_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    order_src = o.groupBy(F.col("o_custkey").alias("os_custkey")).agg(
        F.count(F.lit(1)).alias("order_count"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total_spend"),
        F.max("o_orderdate").alias("os_asof"),
    )
    line_src = (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_custkey").alias("ls_custkey"))
        .agg(F.count(F.lit(1)).alias("line_count"), F.max("l_shipdate").alias("ls_asof"))
    )
    merged = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(order_src, c.c_custkey == order_src.os_custkey, "left_outer")
        .join(line_src, c.c_custkey == line_src.ls_custkey, "left_outer")
    )
    # data_as_of = OLDEST source timestamp (reference api/cards/build.py:162-192);
    # LEAST over nullable maxes: NULL if any side missing (SQL least ignores
    # nulls in duckdb/spark differently — both return the non-null min? No:
    # both Spark `least` and DuckDB `LEAST` skip NULLs... except Spark
    # returns NULL only when all are NULL; DuckDB likewise). Semantics match.
    return merged.select(
        "c_custkey",
        "c_name",
        "n_name",
        F.coalesce(F.col("order_count"), F.lit(0)).alias("order_count"),
        F.coalesce(F.col("total_spend"), F.lit(0.0)).alias("total_spend"),
        F.coalesce(F.col("line_count"), F.lit(0)).alias("line_count"),
        F.unix_micros(F.least(F.col("os_asof"), F.col("ls_asof"))).alias(
            "data_as_of_us"
        ),
        (
            F.when(F.col("os_custkey").isNull(), 1).otherwise(0)
            + F.when(F.col("ls_custkey").isNull(), 1).otherwise(0)
        ).alias("degraded_sources"),
    )


# --- T/W-family: top-k, global share, margin acceptance --------------------


@query(
    "q3_top_orders",
    """
    SELECT o.o_orderkey,
           CAST(SUM({dp_l}) AS DOUBLE) AS revenue,
           CAST(epoch_us(o.o_orderdate) AS BIGINT) AS orderdate_us,
           o.o_orderpriority
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus <> 'F'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey ASC
    LIMIT 10
    """,
    survey_ids="T2,T3 (orderBy desc limit k), J1, F5 predicate",
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = _disc_price()
    o2 = o.select("o_orderkey", "o_orderdate", "o_orderpriority")
    return (
        li.join(o2, li.l_orderkey == o2.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select(
            "o_orderkey",
            "revenue",
            F.unix_micros("o_orderdate").alias("orderdate_us"),
            "o_orderpriority",
        )
    )


@query(
    "w1_top_holders_share",
    """
    WITH tot AS (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS total FROM customer)
    SELECT c_custkey, c_name,
           CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS balance,
           ROUND(CAST(c_acctbal AS DOUBLE) / CAST((SELECT total FROM tot) AS DOUBLE), 9) AS share
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey ASC
    LIMIT 20
    """,
    survey_ids="W1 (global share + top-N holders), T1",
)
def w1_top_holders_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    # Global total via 1-row agg broadcast — NOT Window.partitionBy(), which
    # would serialize the whole table through one task at scale.
    total = c.agg(F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("__total"))
    return (
        c.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
        .limit(20)
        .crossJoin(F.broadcast(total))
        .select(
            "c_custkey",
            "c_name",
            F.col("c_acctbal").cast("decimal(18,2)").cast("double").alias("balance"),
            # try_divide = the W1 SAFE_DIVIDE semantic (NULL share on a
            # zero global total), same law as operators/windows.
            # global_share_topn — not plain division's Inf/NaN.
            F.round(
                F.try_divide(
                    F.col("c_acctbal").cast("double"),
                    F.col("__total").cast("double"),
                ),
                9,
            ).alias("share"),
        )
    )


@query(
    "t5_best_candidate_margin",
    """
    WITH ranked AS (
        SELECT n.n_name, c.c_custkey, c.c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY n.n_name
                                  ORDER BY c.c_acctbal DESC, c.c_custkey ASC) AS rnk
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    SELECT a.n_name, a.c_custkey AS best_custkey,
           ROUND(a.c_acctbal, 2) AS best_bal,
           ROUND(a.c_acctbal - COALESCE(b.c_acctbal, 0), 2) AS margin,
           CASE WHEN a.c_acctbal >= 5000 AND (a.c_acctbal - COALESCE(b.c_acctbal, 0)) >= 100
                THEN TRUE ELSE FALSE END AS accepted
    FROM ranked a LEFT JOIN ranked b ON a.n_name = b.n_name AND b.rnk = 2
    WHERE a.rnk = 1
    """,
    survey_ids="T5 (best candidate + margin), W7",
)
def t5_best_candidate_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "n_name", "c_custkey", "c_acctbal"
    )
    ranked = top_k_per_group(
        joined,
        ["n_name"],
        [F.col("c_acctbal").desc(), F.col("c_custkey").asc()],
        k=2,
        rank_name="rnk",
    )
    best = ranked.filter(F.col("rnk") == 1).select(
        "n_name", F.col("c_custkey").alias("best_custkey"), F.col("c_acctbal").alias("best_bal_raw")
    )
    second = ranked.filter(F.col("rnk") == 2).select(
        F.col("n_name").alias("n_name2"), F.col("c_acctbal").alias("second_bal")
    )
    out = best.join(second, best.n_name == second.n_name2, "left_outer")
    margin = F.col("best_bal_raw") - F.coalesce(F.col("second_bal"), F.lit(0.0))
    return out.select(
        "n_name",
        "best_custkey",
        F.round(F.col("best_bal_raw"), 2).alias("best_bal"),
        F.round(margin, 2).alias("margin"),
        ((F.col("best_bal_raw") >= 5000) & (margin >= 100)).alias("accepted"),
    )


@query(
    "w1_holders_full_share",
    """
    SELECT s_suppkey, s_name,
           ROUND(CAST(s_acctbal AS DOUBLE) /
                 CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) OVER () AS DOUBLE), 9) AS share,
           ROW_NUMBER() OVER (ORDER BY s_acctbal DESC, s_suppkey ASC) AS rnk
    FROM supplier
    """,
    survey_ids="W1 exact shape (SUM OVER (), ROW_NUMBER OVER ORDER BY) — small-dim variant",
)
def w1_holders_full_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # supplier is a small dimension (10 rows/SF-unit): the global window is
    # fine HERE; the scale-safe variant for big tables is w1_top_holders_share.
    s = load_table(spark, sf_dir, "supplier")
    from pyspark.sql import Window

    w = Window.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey").asc())
    return (
        s.withColumn(
            "share",
            F.round(
                F.col("s_acctbal").cast("double")
                / F.sum(F.col("s_acctbal").cast("decimal(18,2)"))
                .over(Window.partitionBy())
                .cast("double"),
                9,
            ),
        )
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .select("s_suppkey", "s_name", "share", "rnk")
    )


@query(
    "w11_rank_distribution",
    """
    SELECT s_suppkey, s_nationkey,
           DENSE_RANK()   OVER w AS drank,
           ROUND(PERCENT_RANK() OVER w, 9) + 0 AS pct_rank,
           ROUND(CUME_DIST()    OVER w, 9) AS cume
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
    survey_ids=(
        "§2.6 ranking-window completion: DENSE_RANK / PERCENT_RANK / "
        "CUME_DIST per key (alongside W1/W7's row_number and W2's lag)"
    ),
)
def w11_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution ranks per nation over supplier balances.

    Keyed window (partitionBy a bounded key) — per-partition state only,
    never a global sort; the deterministic (balance DESC, suppkey)
    ordering makes every rank value partition-order-independent. `+ 0`
    normalizes DuckDB's -0.0 on the first-row percent_rank.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey").asc()
    )
    return load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_nationkey",
        F.dense_rank().over(w).cast("long").alias("drank"),
        (F.round(F.percent_rank().over(w), 9) + F.lit(0)).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
    )


@query(
    "a12_rollup_lattice",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    survey_ids=(
        "§2.5 subtotal lattice: ROLLUP/CUBE/GROUPING SETS — absent in the "
        "reference (SURVEY §2.5 note), supplied by the engine as built-ins"
    ),
)
def a12_rollup_lattice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtotal lattice over (returnflag, linestatus) with grouping_id.

    The reference has no grouping-sets operator (SURVEY.md §2.5: "No
    grouping sets / cube / rollup"); Spark's `rollup()` computes the
    whole lattice in ONE pass — partial aggregation expands each input
    row into its grouping-set combinations map-side, then a single
    shuffle on (keys, spark_grouping_id). At 100TB this beats N separate
    GROUP BYs by reading the fact table once. grouping_id() uses the
    same bitmask convention as DuckDB/ANSI GROUPING (detail=0, grand
    total=2^k-1), asserted by the oracle hash.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")
    )


_EVENT_TYPES = ("click", "view", "purchase", "error", "signup")


@query(
    "a13_pivot_event_matrix",
    """
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup
    FROM events
    GROUP BY user_id
    """,
    survey_ids="§2.5 pivot (long→wide reshaping) — engine built-in beyond the reference",
)
def a13_pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type count matrix via PIVOT.

    The value list is EXPLICIT: `pivot(col)` without values needs a
    whole extra distinct-scan job to discover them — at 100TB that's a
    second pass over the fact table. With declared values this is one
    ordinary groupBy (partial agg map-side, single shuffle on user_id);
    absent combinations are 0, matching COUNT FILTER semantics.
    """
    ev = load_table(spark, sf_dir, "events")
    piv = (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES],
    )


@query(
    "e6_unpivot_long",
    """
    WITH wide AS (
      SELECT user_id,
             COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
             COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             COUNT(*) FILTER (WHERE event_type = 'error')    AS error
      FROM events GROUP BY user_id
    )
    SELECT user_id, metric, cnt FROM wide
    UNPIVOT (cnt FOR metric IN (click, purchase, error))
    """,
    survey_ids="§2.5 unpivot/melt (wide→long reshaping) — engine built-in beyond the reference",
)
def e6_unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt a wide per-user matrix back to (user_id, metric, cnt) rows.

    `unpivot` is a map-only Expand (no shuffle, no UDF): each wide row
    emits one output row per measure column. The long form is what
    windowing/rules stages consume; the wide form is the human-facing
    report — the engine reshapes either direction declaratively.
    UNPIVOT drops NULL cells in both engines; counts here are never
    NULL, so the row count is exactly 3x the user count.
    """
    ev = load_table(spark, sf_dir, "events")
    metrics = ("click", "purchase", "error")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", list(metrics))
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in metrics],
        )
    )
    return wide.unpivot("user_id", list(metrics), "metric", "cnt")


# Substitute the shared decimal-arithmetic fragments into the oracle SQL
# (kept as placeholders above so Spark and DuckDB provably share them).
from . import REGISTRY  # noqa: E402

_DP_L = _DISC_PRICE_DUCK.replace("l_extendedprice", "l.l_extendedprice").replace(
    "l_discount", "l.l_discount"
)
REGISTRY["q1_pricing_summary"].oracle = (
    REGISTRY["q1_pricing_summary"].oracle.replace("{dp}", _DISC_PRICE_DUCK).replace("{ch}", _CHARGE_DUCK)
)
REGISTRY["q5_region_revenue"].oracle = REGISTRY["q5_region_revenue"].oracle.replace(
    "{dp_l}", _DP_L
)
REGISTRY["q3_top_orders"].oracle = REGISTRY["q3_top_orders"].oracle.replace(
    "{dp_l}", _DP_L
)
