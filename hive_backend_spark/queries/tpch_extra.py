"""Deep relational analytics — the remaining classic TPC-H query shapes,
adapted to the driver's star schema (SURVEY §2.4 A5 free surface; the
reference has no GROUP BY at all, db.mjs has only filtered COUNTs).

The test schema lacks partsupp / l_shipmode / l_commitdate / l_receiptdate /
p_container, so each query keeps the *plan shape* of its TPC-H counterpart
(the part Catalyst must get right at 100 TB) while substituting available
columns: market share (Q8), profit by nation x year (Q9), conditional
priority counting (Q12), customer order-count distribution (Q13), top
supplier by revenue (Q15), supplier-part variety counting (Q16),
small-quantity revenue with a correlated per-part average (Q17),
disjunctive multi-range predicates (Q19), and last-to-ship supplier
attribution in multi-supplier orders (Q21).

Scale posture shared by all nine: fact-fact joins (lineitem x orders) shuffle
on the join key; genuinely small dims (region: 5 rows, nation: 25) carry an
explicit broadcast hint; mid-size dims (part, customer, supplier — which grow
with SF) are left to AQE, which broadcasts them at bench SF and switches to
shuffle join when they outgrow the threshold. Float aggregates are rounded in
both engines to absorb summation-order differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


def _ts(lit: str):
    return F.lit(lit).cast("timestamp")


@register(
    "q91_market_share",
    oracle="""
    SELECT o_year,
           round(CAST(sum(CAST(CASE WHEN supp_nation = 'NATION_7' THEN revenue ELSE 0 END
                              AS DECIMAL(18,4))) AS DOUBLE)
                 / CAST(sum(CAST(revenue AS DECIMAL(18,4))) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS revenue,
             ns.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation nc ON c.c_nationkey = nc.n_nationkey
      JOIN region r ON nc.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns ON s.s_nationkey = ns.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    )
    GROUP BY o_year
    """,
)
def q91_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_7's share of PROMO-part
    revenue sold into ASIA customers, per order year. Seven-table join; the
    only fact-fact edge is lineitem-orders (shuffle on orderkey), every
    other edge hangs small-to-mid dims off it. region/nation broadcast by
    hint; part/customer/supplier by AQE at this SF."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1995-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nc = nation.alias("nc")
    ns = nation.alias("ns")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc.n_nationkey"))
        .join(F.broadcast(region), F.col("nc.n_regionkey") == F.col("r_regionkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns.n_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            rev.alias("revenue"),
            F.col("ns.n_name").alias("supp_nation"),
        )
    )
    # Sums go through exact DECIMAL so Spark's partial-agg order and
    # DuckDB's single-pass order cannot produce last-ulp differences; the
    # single division then happens on identical doubles in both engines.
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_7", F.col("revenue"))
        .otherwise(0.0)
        .cast("decimal(18,4)")
    )
    den = F.sum(F.col("revenue").cast("decimal(18,4)"))
    return joined.groupBy("o_year").agg(
        F.round(num.cast("double") / den.cast("double"), 6).alias("mkt_share")
    )


@register(
    "q92_product_profit",
    oracle="""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                    - 0.6 * p.p_retailprice * l.l_quantity AS DECIMAL(18,4))) AS sum_profit
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def q92_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit): profit per supplier nation per year,
    with 0.6 x p_retailprice x quantity standing in for ps_supplycost (no
    partsupp table). The LIKE filter on p_name lands on the part scan
    (pushed); lineitem-orders is the one big shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    orders = load_table(spark, sf_dir, "orders")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(profit.cast("decimal(18,4)")).alias("sum_profit"))
    )


@register(
    "q93_shipping_delay_priority",
    oracle="""
    SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 30 THEN 'fast'
                WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 90 THEN 'normal'
                ELSE 'slow' END AS delay_bucket,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def q93_shipping_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and priority): conditional counting of
    high/low-priority lines per shipping-delay bucket (no l_shipmode column;
    the derived delay bucket keeps the CASE-inside-SUM plan shape). One
    fact-fact shuffle join, then a 3-group aggregate — map-side partials
    collapse it to nothing."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.when(delay <= 30, "fast").when(delay <= 90, "normal").otherwise("slow").alias(
                "delay_bucket"
            ),
            high.alias("is_high"),
        )
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(F.col("is_high"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~F.col("is_high"), 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q94_customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q94_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): orders per customer via LEFT outer
    join (customers with zero orders must appear as c_count=0), then the
    distribution of those counts. Two aggregations; the first shuffles on
    custkey, the second on the tiny count domain."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q95_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM rev r JOIN supplier s ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q95_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarterly revenue per supplier, return the
    supplier(s) hitting the maximum. The max is computed as a 1-row
    aggregate joined back with a broadcast — NOT an unpartitioned window,
    which would serialize the whole supplier aggregate through one task at
    scale. Ties (multiple suppliers at max) are all returned, matching the
    scalar-subquery oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
            .alias("total_revenue")
        )
    )
    top = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        rev.join(F.broadcast(top), F.col("total_revenue") == F.col("max_rev"))
        .join(supp, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q96_part_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q96_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): how many distinct suppliers
    ship each (brand, type, size) combination, excluding one brand (lineitem
    stands in for partsupp). The exclusion + IN-list filters push to the
    part scan; count(DISTINCT) expands to a two-phase aggregate."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        part.join(li, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q97_small_quantity_revenue",
    oracle="""
    SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0, 2)
             AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg_qty
          FROM lineitem GROUP BY l_partkey) t
      ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND p.p_type = 'SMALL'
      AND l.l_quantity < t.half_avg_qty
    """,
)
def q97_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): lines whose quantity is
    below half the part's average quantity, for one brand+type. The
    correlated per-part average decorrelates into a groupBy(partkey) join —
    both sides shuffle on partkey, so they co-partition; the brand/type
    filter broadcasts the tiny surviving part list into the probe."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    half_avg = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(half_avg, F.col("l_partkey") == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double") / 7.0, 2
            ).alias("avg_yearly")
        )
    )


@register(
    "q98_disjunctive_revenue",
    oracle="""
    SELECT sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS revenue,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 15)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 11 AND 25
           AND l.l_quantity BETWEEN 10 AND 25)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 26 AND 50
           AND l.l_quantity BETWEEN 20 AND 35)
    """,
)
def q98_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicates): three
    brand/size/quantity range branches OR-ed across both join sides.
    Catalyst extracts the common single-side conjuncts (brand IN (...),
    size range, quantity range) below the join so each scan prunes before
    pairing — the part that matters when lineitem is 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, F.col("p_partkey") == F.col("l_partkey"))
    b = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(11, 25)
            & F.col("l_quantity").between(10, 25)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(26, 50)
            & F.col("l_quantity").between(20, 35)
        )
    )
    return joined.filter(b).agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q99_last_to_ship_suppliers",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             max(l_shipdate) AS max_ship,
             count(DISTINCT l_suppkey) AS n_supp
      FROM lineitem GROUP BY l_orderkey
    ),
    at_max AS (
      SELECT l.l_orderkey, count(DISTINCT l.l_suppkey) AS n_at_max
      FROM lineitem l JOIN per_order po
        ON l.l_orderkey = po.l_orderkey AND l.l_shipdate = po.max_ship
      GROUP BY l.l_orderkey
    )
    SELECT s.s_suppkey, s.s_name, count(DISTINCT l.l_orderkey) AS numwait
    FROM lineitem l
    JOIN per_order po ON l.l_orderkey = po.l_orderkey
    JOIN at_max am ON l.l_orderkey = am.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE po.n_supp > 1 AND am.n_at_max = 1 AND l.l_shipdate = po.max_ship
    GROUP BY s.s_suppkey, s.s_name
    ORDER BY numwait DESC, s.s_suppkey ASC
    LIMIT 20
    """,
)
def q99_last_to_ship_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): suppliers who were the
    UNIQUE last to ship in orders involving 2+ suppliers (exists/not-exists
    pair expressed as per-order aggregates, with shipdate standing in for
    the missing receipt/commit dates). One fact scan, staged reduction:
    first collapse lineitem to per-(order, supplier) max shipdates (the
    map-side partial combine does most of the work before the shuffle),
    then a window + aggregate over the ~10x smaller pair table picks the
    unique latest supplier per order. No countDistinct anywhere — every
    count is over rows made distinct by construction — so Catalyst inserts
    no Expand re-shuffles, and the final per-supplier aggregate is the only
    other exchange."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    pair_max = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("supp_max")
    )
    w = Window.partitionBy("l_orderkey")
    with_max = pair_max.withColumn("max_ship", F.max("supp_max").over(w))
    at_max = F.col("supp_max") == F.col("max_ship")
    per_order = with_max.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.count(F.when(at_max, 1)).alias("n_at_max"),
        # unique under the n_at_max == 1 filter below, hence deterministic
        F.first(F.when(at_max, F.col("l_suppkey")), ignorenulls=True).alias("winner"),
    )
    return (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_at_max") == 1))
        .join(supp, F.col("s_suppkey") == F.col("winner"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_suppkey").asc())
        .limit(20)
    )


# --- q191: supplier revenue concentration (HHI), pure-SQL facade -------------


@register(
    "q191_supplier_hhi",
    oracle="""
    WITH rev AS (
      SELECT n.n_name AS nation, s.s_suppkey,
             sum(l.l_extendedprice * (1 - l.l_discount)) AS r
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY n.n_name, s.s_suppkey
    ),
    share AS (
      SELECT nation,
             CAST(r / sum(r) OVER (PARTITION BY nation) AS DOUBLE) AS p
      FROM rev
    )
    SELECT nation,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           round(CAST(sum(p * p) AS DOUBLE), 6) AS hhi,
           round(CAST(1.0 AS DOUBLE) / count(*), 6) AS hhi_floor,
           CAST(sum(p * p) AS DOUBLE) > CAST(2.0 AS DOUBLE) / count(*)
             AS concentrated
    FROM share
    GROUP BY nation
    ORDER BY nation
    """,
)
def q191_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier revenue concentration per nation (Herfindahl-Hirschman
    index: Σ share²), flagged where HHI exceeds twice the uniform floor
    1/n — the supply-chain-risk view of the TPC-H schema (one dominant
    supplier per nation = a single point of failure). Expressed through
    the SQL FACADE — temp views + spark.sql — deliberately: every other
    registered query uses the DataFrame API, and this one pins that the
    engine's second entry path compiles to the same Catalyst plans
    (broadcast dims, windowed shares, grouped fold) users of a SQL
    gateway would get.

    Determinism: revenue sums are decimal-exact (q40's discipline);
    shares and HHI round at the edge.

    Scale posture: dimension joins broadcast (25-row nation, supplier
    dim); the fact side shuffles once on (nation, suppkey); the share
    window and final fold reuse the nation key on |suppliers| rows."""
    for name in ("lineitem", "supplier", "nation"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"v_{name}")
    return spark.sql(
        """
        WITH rev AS (
          SELECT n.n_name AS nation, s.s_suppkey,
                 sum(l.l_extendedprice * (1 - l.l_discount)) AS r
          FROM v_lineitem l
          JOIN v_supplier s ON l.l_suppkey = s.s_suppkey
          JOIN v_nation n ON s.s_nationkey = n.n_nationkey
          GROUP BY n.n_name, s.s_suppkey
        ),
        share AS (
          SELECT nation,
                 CAST(r / sum(r) OVER (PARTITION BY nation) AS DOUBLE) AS p
          FROM rev
        )
        SELECT nation,
               CAST(count(*) AS BIGINT) AS n_suppliers,
               round(CAST(sum(p * p) AS DOUBLE), 6) AS hhi,
               round(CAST(1.0 AS DOUBLE) / count(*), 6) AS hhi_floor,
               CAST(sum(p * p) AS DOUBLE) > CAST(2.0 AS DOUBLE) / count(*)
                 AS concentrated
        FROM share
        GROUP BY nation
        ORDER BY nation
        """
    )


# --- round 8: the four remaining official TPC-H shapes (Q2/Q7/Q11/Q20) ------
# The schema still has no partsupp, so the supply relation is DERIVED from
# lineitem: per (part, supplier), the minimum observed unit price stands in
# for ps_supplycost and the shipped quantity for ps_availqty. The plan
# shapes Catalyst must get right — correlated per-group minimum (Q2),
# bidirectional nation-pair flows (Q7), group-share-vs-global threshold
# (Q11), dominant-share semi-join (Q20) — are preserved exactly.


@register(
    "q273_min_cost_supplier",
    oracle="""
    WITH sup AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    cand AS (
      SELECT p.p_partkey, p.p_name, eu.s_name, eu.s_acctbal, eu.n_name,
             sup.cost,
             min(sup.cost) OVER (PARTITION BY p.p_partkey) AS best
      FROM sup
      JOIN eu ON sup.l_suppkey = eu.s_suppkey
      JOIN part p ON sup.l_partkey = p.p_partkey
      WHERE p.p_type = 'STANDARD' AND p.p_size BETWEEN 10 AND 20
    )
    SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
           p_partkey, p_name, round(cost, 6) AS min_cost
    FROM cand WHERE cost = best
    ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
    LIMIT 100
    """,
)
def q273_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier): for mid-size STANDARD parts, the
    EUROPE supplier(s) achieving the lowest unit cost, where the supply
    relation is derived from lineitem (min observed extendedprice/quantity
    per part-supplier pair — the partsupp stand-in). Q2's correlated
    MIN subquery becomes a window MIN over p_partkey with a cost == best
    filter; the equality is safe because min() only compares values both
    engines computed identically per-row (IEEE division, no summation).

    Scale posture: lineitem collapses FIRST to the (part, supplier) supply
    relation — map-side partial min, one shuffle, ~|part x supp-per-part|
    rows out regardless of fact size. region/nation broadcast by hint; the
    region-filtered supplier dim (1/5 of suppliers) and the size/type-
    filtered part slice (~2% of parts) are left to AQE, which broadcasts
    them at bench SF and shuffles when they outgrow the threshold at 100 TB.
    The window partitions by p_partkey — thousands of independent groups,
    no single-task stage."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
    )
    sup = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost")
    )
    eu = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = (
        sup.join(eu, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("best", F.min("cost").over(Window.partitionBy("p_partkey")))
    )
    return (
        cand.filter(F.col("cost") == F.col("best"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("cost", 6).alias("min_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        )
        .limit(100)
    )


@register(
    "q274_nation_trade_flows",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           sum(CAST(volume AS DECIMAL(18,4))) AS revenue
    FROM (
      SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation ns ON s.s_nationkey = ns.n_nationkey
      JOIN nation nc ON c.c_nationkey = nc.n_nationkey
      WHERE ((ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_8')
          OR (ns.n_name = 'NATION_8' AND nc.n_name = 'NATION_3'))
        AND l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q274_nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bidirectional trade revenue between two
    nations per ship year. The pair disjunction is decomposed into
    pushable IN filters on each nation dim (cutting supplier and customer
    to 2/25 each BEFORE the fact joins) plus a residual same-nation
    exclusion after — Catalyst cannot split the OR across two tables by
    itself, so the decomposition is the part this query pins.

    Scale posture: the only fact-fact edge is lineitem x orders (shuffle
    on orderkey, both sides pre-filtered — lineitem by the pushed shipdate
    range, orders only carrying custkey). nation broadcasts by hint; the
    nation-filtered supplier/customer dims by AQE. Sums fold through exact
    DECIMAL so partial-agg order cannot shift the result (q91 discipline)."""
    both = ("NATION_3", "NATION_8")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1995-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    ns = nation.filter(F.col("n_name").isin(*both)).select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = nation.filter(F.col("n_name").isin(*both)).select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    s2 = supp.join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
    c2 = cust.join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(s2, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c2, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            volume.alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(F.col("volume").cast("decimal(18,4)")).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q275_important_part_value",
    oracle="""
    WITH val AS (
      SELECT l.l_partkey AS p_partkey,
             sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS val
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
      GROUP BY l.l_partkey
    ),
    tot AS (SELECT sum(val) AS total FROM val)
    SELECT p_partkey, CAST(val AS DOUBLE) AS value
    FROM val, tot
    WHERE CAST(val AS DOUBLE) > 0.001 * CAST(total AS DOUBLE)
    ORDER BY value DESC, p_partkey ASC
    """,
)
def q275_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock): parts whose traded value through ASIA
    suppliers exceeds a fixed fraction of the total — the classic
    group-share-vs-global-scalar shape (HAVING sum(...) > fraction *
    (SELECT sum(...))). The inner and outer aggregates read the SAME
    collapsed per-part table; the global total is a 1-row scalar attached
    by broadcast, so the 'correlated' subquery costs one extra reduce, not
    a second fact scan.

    Scale posture: lineitem collapses to per-part DECIMAL-exact sums in
    one shuffle (map-side partials); the region-filtered supplier dim
    hangs off the fact scan via AQE; the threshold compare happens on
    identical doubles in both engines (decimal-exact sums cast once).
    The 1-row total is the only broadcast-nested-loop site (recorded in
    plans.BROADCAST_ALLOWLIST / the scalar-BNLJ allowlist)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    val = (
        li.join(asia, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("val"))
    )
    tot = val.agg(F.sum("val").alias("total"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(
            F.col("val").cast("double") > F.lit(0.001) * F.col("total").cast("double")
        )
        .select("p_partkey", F.col("val").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), F.col("p_partkey").asc())
    )


@register(
    "q276_dominant_promo_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(l_quantity AS DECIMAL(18,4))) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    ),
    share AS (
      SELECT sh.l_partkey, sh.l_suppkey, sh.qty,
             sum(sh.qty) OVER (PARTITION BY sh.l_partkey) AS part_qty
      FROM shipped sh
      JOIN part p ON sh.l_partkey = p.p_partkey
      WHERE p.p_type = 'PROMO'
    )
    SELECT sp.s_suppkey, sp.s_name, n.n_name,
           CAST(count(*) AS BIGINT) AS dominated_parts,
           round(CAST(sum(qty) AS DOUBLE), 2) AS total_qty
    FROM share
    JOIN supplier sp ON share.l_suppkey = sp.s_suppkey
    JOIN nation n ON sp.s_nationkey = n.n_nationkey
    WHERE CAST(qty AS DOUBLE) > 0.5 * CAST(part_qty AS DOUBLE)
    GROUP BY sp.s_suppkey, sp.s_name, n.n_name
    ORDER BY dominated_parts DESC, s_suppkey ASC
    """,
)
def q276_dominant_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): suppliers who shipped a
    MAJORITY (> 50%) of a PROMO part's 1996 volume, with how many parts
    they dominate — Q20's 'availqty > half of shipped' correlated
    subquery re-expressed over the derived supply relation as a window
    share test (per-part total via window sum, no second scan, no
    self-join on the fact table).

    Scale posture: lineitem collapses FIRST (pushed shipdate range,
    map-side partial sums, one shuffle to (part, supplier) grain); the
    PROMO part slice (1/6 of parts) joins by AQE; the share window
    partitions by l_partkey; the final per-supplier fold runs on the
    dominated subset only. DECIMAL-exact quantity sums make the 0.5
    threshold compare identical in both engines."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("qty")
    )
    share = shipped.join(part, F.col("l_partkey") == F.col("p_partkey")).withColumn(
        "part_qty", F.sum("qty").over(Window.partitionBy("l_partkey"))
    )
    dominated = share.filter(
        F.col("qty").cast("double") > F.lit(0.5) * F.col("part_qty").cast("double")
    )
    return (
        dominated.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_suppkey", "s_name", "n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("dominated_parts"),
            F.round(F.sum("qty").cast("double"), 2).alias("total_qty"),
        )
        .orderBy(F.col("dominated_parts").desc(), F.col("s_suppkey").asc())
    )
