"""Relational core — SURVEY.md §2.1-2.8, one named query per operator row.

The reference's store queries (db.mjs) run over its five SQLite tables; the
oracle-checked forms here run over the driver's stand-in tables per
FIXTURES.md §B (`events` = the `updates` queue, star-schema dims = the
`connections` registry).

Scale notes common to all queries here:
  - filters/projections are expressed declaratively so Catalyst pushes them
    into the parquet scan (PushedFilters / ReadSchema);
  - every dimension join uses an explicit ``broadcast()`` hint — at 100 TB
    the fact side never shuffles for these lookups;
  - top-k is always ``orderBy().limit(n)`` which Spark executes as
    TakeOrderedAndProject (per-partition heap + driver merge; no global sort);
  - LIMIT queries carry a unique trailing tie-break key so the selected set
    is deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..registry import NOW, register

# ---------------------------------------------------------------------------
# §2.5 O1 + §2.2 P2 + §2.9 Q3 — the flagship: prioritized bounded dequeue
# ---------------------------------------------------------------------------


@register(
    "q01_priority_dequeue",
    oracle=f"""
    SELECT event_id, ts, user_id, event_type, value AS priority, props
    FROM events
    WHERE event_type = 'click' AND ts <= TIMESTAMP '{NOW}'
    ORDER BY coalesce(value, 0) DESC, ts ASC, event_id ASC
    LIMIT 100
    """,
)
def q01_priority_dequeue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority-queue dequeue (reference db.mjs:285-293, getPendingUpdates):
    pending AND target filter, priority DESC, FIFO tie-break, LIMIT batch.
    Spark physical plan: parquet scan with pushed filter -> TakeOrderedAndProject
    (no global sort, no full shuffle — holds at any scale).
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter((F.col("event_type") == "click") & (F.col("ts") <= F.lit(NOW).cast("timestamp")))
        .select(
            "event_id",
            "ts",
            "user_id",
            "event_type",
            F.col("value").alias("priority"),
            "props",
        )
        .orderBy(
            F.coalesce(F.col("priority"), F.lit(0.0)).desc(),
            F.col("ts").asc(),
            F.col("event_id").asc(),
        )
        .limit(100)
    )


# ---------------------------------------------------------------------------
# §2.2 Projections / filters / predicates (P1-P9)
# ---------------------------------------------------------------------------


@register(
    "q02_active_filter",
    oracle="SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders WHERE o_orderstatus = 'O'",
)
def q02_active_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 active-connection filter (db.mjs:281-283): equality predicate +
    projection; both reach the parquet scan (PushedFilters + ReadSchema)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )


@register(
    "q03_pending_filter",
    oracle="""
    SELECT event_id, user_id, ts, value
    FROM events
    WHERE event_type = 'view' AND value IS NOT NULL AND value > 50.0
    """,
)
def q03_pending_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 pending-update filter (db.mjs:287-288): conjunctive predicate
    `processed = 0 AND target_type = ?` mapped onto events."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(
        (F.col("event_type") == "view") & F.col("value").isNotNull() & (F.col("value") > 50.0)
    ).select("event_id", "user_id", "ts", "value")


@register(
    "q04_unacked_fifo",
    oracle="""
    SELECT event_id, user_id, ts, value
    FROM events
    WHERE event_type = 'purchase' AND value > 100.0
    ORDER BY ts ASC, event_id ASC
    """,
)
def q04_unacked_fifo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 unacked filter + O3 FIFO full sort (db.mjs:334-343,
    getUnacknowledgedUpdates): processed AND NOT acknowledged, created_at ASC."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter((F.col("event_type") == "purchase") & (F.col("value") > 100.0))
        .select("event_id", "user_id", "ts", "value")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
    )


@register(
    "q05_point_lookup",
    oracle="SELECT event_id, ts, user_id, event_type, value, props FROM events WHERE event_id = 123",
)
def q05_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 point lookup by PK (server.mjs:205-208, db.mjs:302): WHERE id = ?.
    The equality predicate is pushed to parquet row-group stats, so only
    matching row groups are read — the 100 TB analog of an index probe."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_id") == 123).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


@register(
    "q06_in_list",
    oracle="""
    SELECT event_id, event_type, user_id, ts
    FROM events
    WHERE event_type IN ('signup', 'error')
    """,
)
def q06_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 IN-list predicate (db.mjs:323-332, markUpdatesProcessed builds
    `id IN (?,...)` from an array)."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_type").isin("signup", "error")).select(
        "event_id", "event_type", "user_id", "ts"
    )


@register(
    "q07_time_horizon",
    oracle=f"""
    SELECT event_id, user_id, ts
    FROM events
    WHERE ts < TIMESTAMP '{NOW}' - INTERVAL 7 DAY AND event_type = 'signup'
    """,
)
def q07_time_horizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 time-horizon predicate (db.mjs:366-373, getStaleApps):
    `last_seen < datetime('now','-N minutes') AND status='active'`.
    Wall clock replaced by the fixed NOW literal for determinism (§7.4)."""
    events = load_table(spark, sf_dir, "events")
    horizon = F.lit(NOW).cast("timestamp") - F.expr("INTERVAL 7 DAYS")
    return events.filter((F.col("ts") < horizon) & (F.col("event_type") == "signup")).select(
        "event_id", "user_id", "ts"
    )


@register(
    "q08_recency_window",
    oracle=f"""
    SELECT event_type, count(*) AS cnt
    FROM events
    WHERE ts > TIMESTAMP '{NOW}' - INTERVAL 24 HOUR
    GROUP BY event_type
    """,
)
def q08_recency_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 recency predicate (db.mjs:414,418, monitorHealth's
    `created_at > datetime('now','-1 hour')`) + grouped count."""
    events = load_table(spark, sf_dir, "events")
    cutoff = F.lit(NOW).cast("timestamp") - F.expr("INTERVAL 24 HOURS")
    return (
        events.filter(F.col("ts") > cutoff)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "q09_null_guards",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    WHERE props IS NOT NULL AND json_extract_string(props, '$.k') IS NOT NULL
          AND event_type = 'purchase'
    """,
)
def q09_null_guards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 null/shape guards (sheets-code.gs:359-362: `!data?.cellId` checks)
    + F6 JSON point extraction (get_json_object on the content payload)."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k")
    return (
        events.filter(F.col("props").isNotNull() & k.isNotNull() & (F.col("event_type") == "purchase"))
        .select("event_id", k.cast("int").alias("k"))
    )


# ---------------------------------------------------------------------------
# §2.5 Sorts / limits / top-k (O2; O1 is q01, O3 folded into q04)
# ---------------------------------------------------------------------------


@register(
    "q10_recent_errors_topk",
    oracle="""
    SELECT event_id, user_id, ts, props
    FROM events
    WHERE event_type = 'error'
    ORDER BY ts DESC, event_id DESC
    LIMIT 100
    """,
)
def q10_recent_errors_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 recent-first top-k (db.mjs:376-384, getRecentErrors):
    ORDER BY created_at DESC LIMIT 100 -> TakeOrderedAndProject."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "ts", "props")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(100)
    )


# ---------------------------------------------------------------------------
# §2.4 Aggregations (A1-A4, Q13 health snapshot)
# ---------------------------------------------------------------------------


@register(
    "q11_group_count",
    oracle="SELECT event_type, count(*) AS cnt, count(DISTINCT user_id) AS users FROM events GROUP BY event_type",
)
def q11_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 per-app count (server.mjs:78 connectionCount) generalized to
    groupBy + count + count_distinct. Partial aggregation (map-side combine)
    means the shuffle carries one row per (partition, group), not raw rows."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.countDistinct("user_id").alias("users"),
    )


@register(
    "q12_health_snapshot",
    oracle=f"""
    SELECT
      count(*) AS total_events,
      count(DISTINCT user_id) AS active_users,
      count(*) FILTER (WHERE event_type = 'click') AS pending_updates,
      count(*) FILTER (WHERE event_type = 'error'
                       AND ts > TIMESTAMP '{NOW}' - INTERVAL 24 HOUR) AS errors_last_day,
      round(avg(value) FILTER (WHERE event_type = 'purchase'), 4) AS avg_purchase_value
    FROM events
    """,
)
def q12_health_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13/A1/A2/A3 health snapshot (db.mjs:410-432, monitorHealth): the
    reference issues 4 separate scans inside Promise.all; the Spark form is a
    single one-pass multi-metric aggregate (conditional aggregation), which
    at 100 TB is 4x less I/O than four scans."""
    events = load_table(spark, sf_dir, "events")
    err_cutoff = F.lit(NOW).cast("timestamp") - F.expr("INTERVAL 24 HOURS")
    return events.agg(
        F.count(F.lit(1)).alias("total_events"),
        F.countDistinct("user_id").alias("active_users"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("pending_updates"),
        F.count(F.when((F.col("event_type") == "error") & (F.col("ts") > err_cutoff), 1)).alias(
            "errors_last_day"
        ),
        F.round(F.avg(F.when(F.col("event_type") == "purchase", F.col("value"))), 4).alias(
            "avg_purchase_value"
        ),
    )


@register(
    "q15_avg_latency_per_key",
    oracle="""
    SELECT o_orderpriority,
           round(avg((epoch_us(l_shipdate) - epoch_us(o_orderdate)) / 86400000000.0), 4) AS avg_ship_days,
           count(*) AS n_lineitems
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def q15_avg_latency_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+J5 avg sync latency per key (db.mjs:415-419:
    AVG(strftime('%s',last_sync_time) - strftime('%s',created_at))), mapped to
    ship-latency per order priority. Microsecond-integer arithmetic
    (unix_micros <-> epoch_us) keeps both engines exact; only the final avg is
    rounded. orders-lineitem is a shuffle join on the natural key; AQE handles
    skew at scale."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    lat_days = (F.unix_micros(F.col("l_shipdate")) - F.unix_micros(F.col("o_orderdate"))) / F.lit(
        86400000000.0
    )
    return (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.avg(lat_days), 4).alias("avg_ship_days"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# §2.3 Joins (J1-J5)
# ---------------------------------------------------------------------------


@register(
    "q13_fk_enrich_join",
    oracle="""
    SELECT event_id, ts, value, c_custkey, c_name, c_mktsegment
    FROM events JOIN customer ON user_id = c_custkey
    WHERE event_type = 'purchase'
    """,
)
def q13_fk_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 FK point-lookup join (server.mjs:205-228: fetch connection row to
    enrich the update event). Customer is broadcast — the events side never
    shuffles, which is the only join strategy that survives a 100 TB fact
    table against a small dimension."""
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    return (
        events.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(customer), F.col("user_id") == F.col("c_custkey"))
        .select("event_id", "ts", "value", "c_custkey", "c_name", "c_mktsegment")
    )


@register(
    "q14_latest_wins",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q14_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/S6 latest-record-wins upsert (db.mjs:270-278 INSERT OR REPLACE;
    sheets-code.gs:449-451 filter-and-concat replace): the idiomatic Spark
    form is a dedup window row_number()=1 by key, newest first. One shuffle
    on the key; no driver-side state."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "ts", "event_type", "value")
    )


@register(
    "q27_semi_join",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0)
    """,
)
def q27_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (free-surface per SURVEY §2.3: absent in reference, exposed
    because the oracle can check it): customers with at least one big order."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 100000.0)
    return customer.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "q28_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def q28_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (J4's delete-side expressed relationally): customers with no
    orders at all."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# §2.7 Scalar functions (F4, F8-F11; F1/F2 exercised above)
# ---------------------------------------------------------------------------


@register(
    "q16_conditional_retry",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type = 'error' THEN CAST(floor(value) AS INTEGER) + 1 ELSE 0 END AS retry_count,
           CASE WHEN event_type = 'error' THEN 'error' ELSE 'active' END AS status
    FROM events
    """,
)
def q16_conditional_retry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/T3 conditional retry counter (db.mjs:313-316:
    CASE WHEN ?='error' THEN retry_count+1 ELSE 0 END)."""
    events = load_table(spark, sf_dir, "events")
    is_err = F.col("event_type") == "error"
    return events.select(
        "event_id",
        F.when(is_err, F.floor(F.col("value")).cast("int") + 1).otherwise(0).alias("retry_count"),
        F.when(is_err, F.lit("error")).otherwise(F.lit("active")).alias("status"),
    )


@register(
    "q17_soft_delete",
    oracle="""
    SELECT event_id, user_id,
           CASE WHEN event_type = 'error' THEN FALSE ELSE TRUE END AS active,
           CASE WHEN event_type = 'error' THEN 'deleted' ELSE 'active' END AS status
    FROM events
    """,
)
def q17_soft_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 soft delete (db.mjs:296-305, deleteConnection sets active=0,
    status='deleted'): flag rewrite, not row removal; readers keep filtering
    on `active` (P1)."""
    events = load_table(spark, sf_dir, "events")
    is_del = F.col("event_type") == "error"
    return events.select(
        "event_id",
        "user_id",
        F.when(is_del, F.lit(False)).otherwise(F.lit(True)).alias("active"),
        F.when(is_del, F.lit("deleted")).otherwise(F.lit("active")).alias("status"),
    )


@register(
    "q21_compound_key",
    oracle="""
    SELECT event_id,
           concat_ws('!', event_type, CAST(user_id AS VARCHAR)) AS cell_id,
           split_part(concat_ws('!', event_type, CAST(user_id AS VARCHAR)), '!', 1) AS sheet_name,
           split_part(concat_ws('!', event_type, CAST(user_id AS VARCHAR)), '!', 2) AS range_ref
    FROM events
    WHERE event_type = 'signup'
    """,
)
def q21_compound_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8/F9 compound-key split/build (sheets-code.gs:424,465: cellId.split('!');
    script.mjs:94: `${sheetName}!${range}`)."""
    events = load_table(spark, sf_dir, "events")
    cell_id = F.concat_ws("!", F.col("event_type"), F.col("user_id").cast("string"))
    return events.filter(F.col("event_type") == "signup").select(
        "event_id",
        cell_id.alias("cell_id"),
        F.split_part(cell_id, F.lit("!"), F.lit(1)).alias("sheet_name"),
        F.split_part(cell_id, F.lit("!"), F.lit(2)).alias("range_ref"),
    )


@register(
    "q22_prefix_ops",
    oracle="""
    SELECT doc_id,
           starts_with(text, 'the ') AS has_marker,
           substring(text, 5) AS stripped,
           concat('doc: ', substring(text, 1, 16)) AS labeled
    FROM documents
    WHERE starts_with(text, 'the ')
    """,
)
def q22_prefix_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 prefix test / strip / prepend (slides-code.gs:477-480: emoji marker
    startsWith + substring(2) + template prepend)."""
    docs = load_table(spark, sf_dir, "documents")
    has = F.col("text").startswith("the ")
    return docs.filter(has).select(
        "doc_id",
        has.alias("has_marker"),
        F.expr("substring(text, 5)").alias("stripped"),
        F.concat(F.lit("doc: "), F.substring(F.col("text"), 1, 16)).alias("labeled"),
    )


@register(
    "q23_cast_string",
    oracle="""
    SELECT event_id, CAST(user_id AS VARCHAR) AS user_str,
           CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR) AS value_str
    FROM events WHERE event_type = 'view'
    """,
)
def q23_cast_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 type coercion to string (slides-code.gs:498: String(data.value)
    before writing into a shape). Doubles go through DECIMAL(12,2) so both
    engines render identical text."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_type") == "view").select(
        "event_id",
        F.col("user_id").cast("string").alias("user_str"),
        F.col("value").cast("decimal(12,2)").cast("string").alias("value_str"),
    )


# ---------------------------------------------------------------------------
# §2.6 Set operations (absent in reference; free surface)
# ---------------------------------------------------------------------------


@register(
    "q24_union",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    UNION
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def q24_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union with dedup (§2.6)."""
    events = load_table(spark, sf_dir, "events")
    a = events.filter(F.col("event_type") == "click").select("user_id")
    b = events.filter(F.col("event_type") == "purchase").select("user_id")
    return a.union(b).distinct()


@register(
    "q25_intersect",
    oracle="""
    SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
    INTERSECT
    SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
    """,
)
def q25_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (§2.6): users who both signed up and errored."""
    events = load_table(spark, sf_dir, "events")
    a = events.filter(F.col("event_type") == "signup").select("user_id")
    b = events.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


@register(
    "q26_except",
    oracle="""
    SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def q26_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (§2.6): viewers who never purchased."""
    events = load_table(spark, sf_dir, "events")
    a = events.filter(F.col("event_type") == "view").select("user_id")
    b = events.filter(F.col("event_type") == "purchase").select("user_id")
    return a.subtract(b)  # EXCEPT DISTINCT semantics


# ---------------------------------------------------------------------------
# §2.8 Window functions (free surface; verified against oracle)
# ---------------------------------------------------------------------------


@register(
    "q29_window_rank",
    oracle="""
    SELECT event_id, user_id, value,
           rank() OVER (PARTITION BY user_id ORDER BY value DESC NULLS LAST, event_id ASC) AS value_rank
    FROM events WHERE event_type = 'purchase'
    """,
)
def q29_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ranking (§2.8): per-user purchase rank by value."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc_nulls_last(), F.col("event_id").asc())
    return events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "value", F.rank().over(w).alias("value_rank")
    )


@register(
    "q30_lag_gap",
    oracle="""
    SELECT event_id, user_id, ts,
           epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)) AS gap_us
    FROM events
    """,
)
def q30_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window lag (§2.8): per-user inter-event gap in microseconds (exact
    integer arithmetic, no float rounding)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return events.select(
        "event_id",
        "user_id",
        "ts",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    )


@register(
    "q33_topk_per_group",
    oracle="""
    SELECT event_id, event_type, value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY value DESC NULLS LAST, event_id ASC) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
)
def q33_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (§2.8): highest-value events per type via ranking
    window — the distributed form of N separate top-k queries."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc_nulls_last(), F.col("event_id").asc())
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("event_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# §2.4 A5 grouping sets / rollup / count-distinct (free surface)
# ---------------------------------------------------------------------------


@register(
    "q31_rollup",
    oracle="""
    SELECT r_name, n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q31_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (A5 free surface): region/nation customer census
    with subtotals and grand total. Dimension joins are broadcast."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@register(
    "q32_approx_and_exact_distinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           count(DISTINCT CAST(value AS DECIMAL(12,2))) AS distinct_values
    FROM events
    GROUP BY event_type
    """,
)
def q32_approx_and_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts (A5). (approx_count_distinct is exposed in the
    library and smoke-tested, but HLL estimates are engine-specific so the
    oracle-checked form uses exact counts.)"""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.countDistinct(F.col("value").cast("decimal(12,2)")).alias("distinct_values"),
    )


@register(
    "q34_cube",
    oracle="""
    SELECT r_name, n_name, count(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY CUBE (r_name, n_name)
    """,
)
def q34_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 free surface: CUBE over the region/nation hierarchy — all four
    grouping combinations in one pass (the Expand operator multiplies rows
    by grouping sets BEFORE the shuffle, so partial aggregation still
    applies)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = customer.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    return joined.cube("r_name", "n_name").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "q35_grouping_sets",
    oracle="""
    SELECT event_type, lang, count(*) AS n
    FROM (
      SELECT e.event_type, d.lang
      FROM events e JOIN documents d ON e.event_id % 500 = d.doc_id % 500
      WHERE e.event_id < 2000 AND d.doc_id < 100
    )
    GROUP BY GROUPING SETS ((event_type), (lang))
    """,
)
def q35_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 free surface: explicit GROUPING SETS via the SQL API (the
    DataFrame cube/rollup are sugar over the same Expand plan)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT event_type, lang, count(*) AS n
        FROM (
          SELECT e.event_type, d.lang
          FROM events e JOIN documents d ON e.event_id % 500 = d.doc_id % 500
          WHERE e.event_id < 2000 AND d.doc_id < 100
        )
        GROUP BY GROUPING SETS ((event_type), (lang))
        """
    )


@register(
    "q36_approx_distinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           count(*) AS n,
           TRUE AS approx_within_bound
    FROM events
    GROUP BY event_type
    """,
)
def q36_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 free surface: approx_count_distinct (HyperLogLog++, rsd=0.01).
    HLL sketches are engine-specific, so the raw estimate can't be oracle-
    compared; instead the exact distinct count is emitted beside a boolean
    asserting the estimate sits within 5x the configured relative standard
    deviation (Spark's HLL++ is deterministic for fixed input, so the
    boolean is stable). The oracle emits TRUE — an out-of-bound estimate
    breaks the driver hash instead of being invisible. pytest additionally
    asserts the tighter published bound (test_operators.py)."""
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n"),
    )
    rel_err = F.abs(F.col("approx_users") - F.col("exact_users")) / F.col("exact_users")
    return agg.select(
        "event_type",
        "exact_users",
        "n",
        (rel_err <= 0.05).alias("approx_within_bound"),
    )


@register(
    "q37_date_format",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M') AS minute_key,
           strftime(ts, '%Y-%m-%d') AS day_key
    FROM events
    WHERE event_id < 1000
    """,
)
def q37_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13 timestamp formatting (sheets-sidebar.html:472-474 UI timestamps):
    date_format with Java patterns; the oracle's strftime produces the
    identical strings."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_id") < 1000).select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("minute_key"),
        F.date_format("ts", "yyyy-MM-dd").alias("day_key"),
    )


@register(
    "q38_asof_join",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, max(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ), purchases AS (
      SELECT event_id AS purchase_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id, c.click_id AS last_click_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
    FROM purchases p ASOF JOIN clicks c
      ON p.user_id = c.user_id AND p.ts > c.ts
    """,
)
def q38_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (absent in both the reference and core Spark — SURVEY §2.3
    'free surface' row): each purchase matched to the user's latest STRICTLY
    preceding click. Implemented the scalable way: tag both sides, union,
    one shuffle by user, one sort by (ts, side), then last(ignorenulls) over
    the running frame — O(n log n) per user vs O(pairs) for a join+argmax.
    Equal-ts clicks sort after purchases, so the strict `>` of the DuckDB
    ASOF oracle is reproduced exactly; same-ts click ties are collapsed to
    max(event_id) in both engines first."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .select("user_id", "ts", "click_id", F.lit(None).cast("long").alias("purchase_id"), F.lit(1).alias("side"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
        F.lit(0).alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = (
        clicks.unionByName(purchases)
        .withColumn("last_click_id", F.last("click_id", ignorenulls=True).over(w))
        .withColumn(
            "last_click_ts",
            F.last(F.when(F.col("side") == 1, F.col("ts")), ignorenulls=True).over(w),
        )
    )
    return (
        tagged.filter((F.col("side") == 0) & F.col("last_click_id").isNotNull())
        .select(
            "purchase_id",
            "user_id",
            "last_click_id",
            (F.unix_micros("ts") - F.unix_micros("last_click_ts")).alias("gap_us"),
        )
    )


@register(
    "q39_range_join",
    oracle="""
    SELECT p.event_id AS purchase_id, count(*) AS n_following
    FROM events p JOIN events f
      ON p.user_id = f.user_id
     AND f.ts > p.ts
     AND f.ts <= p.ts + INTERVAL 1 HOUR
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
)
def q39_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join (free surface per SURVEY §2.3): events within the
    hour after each purchase, per user. The equi key (user_id) bounds the
    pair space, the range predicate filters inside each key group — the plan
    is a hash join on user_id with the range as join condition, never a
    cartesian. For key-free range joins, bucketize ts to a coarse grid and
    join on (bucket, bucket±1) — same structure LSH banding uses."""
    events = load_table(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").alias("p")
    f = events.alias("f")
    return (
        p.join(
            f,
            (F.col("p.user_id") == F.col("f.user_id"))
            & (F.col("f.ts") > F.col("p.ts"))
            & (F.col("f.ts") <= F.col("p.ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy(F.col("p.event_id").alias("purchase_id"))
        .agg(F.count(F.lit(1)).alias("n_following"))
    )


@register(
    "q86_analytic_windows",
    oracle="""
    SELECT o_orderkey,
           ntile(4)       OVER w AS price_quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume,
           round(o_totalprice - first_value(o_totalprice) OVER w, 2) AS delta_from_min,
           round(nth_value(o_totalprice, 2) OVER (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS second_lowest
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
)
def q86_analytic_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window breadth (§2.8 free surface): ntile, percent_rank,
    cume_dist, first_value and nth_value over one shared partition+order —
    Catalyst evaluates all five in a single Window operator over a single
    o_orderpriority shuffle. The date filter bounds the windowed set (an
    unfiltered full-table ordered window would be the 100 TB anti-pattern:
    per-partition global sorts of the whole fact table)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        orders.filter(F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp"))
        .select(
            "o_orderkey",
            F.ntile(4).over(w).alias("price_quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.round(
                F.col("o_totalprice") - F.first("o_totalprice").over(w), 2
            ).alias("delta_from_min"),
            F.round(F.nth_value("o_totalprice", 2).over(w_full), 2).alias("second_lowest"),
        )
    )


@register(
    "q110_salted_group_stats",
    oracle="""
    SELECT event_type,
           count(event_id) AS n_events,
           CAST(sum(user_id) AS BIGINT) AS sum_users,
           CAST(min(user_id) AS BIGINT) AS min_user,
           CAST(max(user_id) AS BIGINT) AS max_user
    FROM events
    GROUP BY event_type
    """,
)
def q110_salted_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated aggregation, oracle-checked: the two-phase salted
    aggregate (operators/skew.salted_agg — explode each hot key over 16
    salt buckets, partial-agg per (key, salt), combine per key) must be
    RESULT-IDENTICAL to a plain GROUP BY; only the shuffle distribution
    changes. Restricted to ops with exact combine phases (count/sum-of-int/
    min/max) so the equality is bitwise, not approximate. At 100 TB this is
    the shape that survives a key owning 30% of the fact table when the
    aggregation runs where AQE can't re-plan (foreachBatch micro-batches)."""
    from ..operators.skew import salted_agg

    events = load_table(spark, sf_dir, "events")
    return salted_agg(
        events,
        ["event_type"],
        {
            "n_events": ("event_id", "count"),
            "sum_users": ("user_id", "sum"),
            "min_user": ("user_id", "min"),
            "max_user": ("user_id", "max"),
        },
    )


@register(
    "q118_skew_report",
    oracle="""
    WITH per_key AS (
      SELECT o_custkey AS key, count(*) AS cnt
      FROM orders GROUP BY o_custkey
    ),
    stats AS (
      SELECT count(*) AS n_keys,
             CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(max(cnt) AS BIGINT) AS max_cnt,
             CAST(min(cnt) AS BIGINT) AS min_cnt
      FROM per_key
    )
    SELECT n_keys, n_rows, max_cnt, min_cnt,
           round(max_cnt * n_keys / CAST(n_rows AS DOUBLE), 4) AS skew_factor,
           (SELECT count(*) FROM per_key, stats
             WHERE cnt * n_keys > 2 * n_rows) AS n_heavy_keys
    FROM stats
    """,
)
def q118_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostics — the report run BEFORE choosing a join
    or aggregation strategy at scale: per-key counts reduced to key count,
    row count, min/max, a skew factor (max key's share vs uniform), and how
    many keys exceed 2x their uniform share (the salting / AQE-skew-join
    candidates). Everything derives from exact integer counts, so the
    report is hash-matchable.

    Scale posture: one partial-then-final count per key (the shuffle
    carries one row per key), then a scalar reduction; the heavy-key count
    joins the per-key table against the broadcast scalar stats."""
    orders = load_table(spark, sf_dir, "orders")
    per_key = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
        F.min("cnt").cast("bigint").alias("min_cnt"),
    )
    heavy = (
        per_key.crossJoin(F.broadcast(stats))
        .filter(F.col("cnt") * F.col("n_keys") > 2 * F.col("n_rows"))
        .agg(F.count(F.lit(1)).alias("n_heavy_keys"))
    )
    return (
        stats.crossJoin(F.broadcast(heavy))
        .select(
            "n_keys",
            "n_rows",
            "max_cnt",
            "min_cnt",
            F.round(
                F.col("max_cnt") * F.col("n_keys") / F.col("n_rows").cast("double"), 4
            ).alias("skew_factor"),
            "n_heavy_keys",
        )
    )


# --- q183: ANALYZE-style column statistics -----------------------------------


@register(
    "q183_analyze_column_stats",
    oracle="""
    WITH s AS MATERIALIZED (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) - count(event_id) AS BIGINT) AS null_event_id,
             CAST(count(DISTINCT event_id) AS BIGINT) AS ndv_event_id,
             CAST(min(event_id) AS DOUBLE) AS min_event_id,
             CAST(max(event_id) AS DOUBLE) AS max_event_id,
             CAST(count(*) - count(user_id) AS BIGINT) AS null_user_id,
             CAST(count(DISTINCT user_id) AS BIGINT) AS ndv_user_id,
             CAST(min(user_id) AS DOUBLE) AS min_user_id,
             CAST(max(user_id) AS DOUBLE) AS max_user_id,
             CAST(count(*) - count(value) AS BIGINT) AS null_value,
             CAST(count(DISTINCT value) AS BIGINT) AS ndv_value,
             round(min(value), 4) AS min_value,
             round(max(value), 4) AS max_value,
             CAST(count(*) - count(event_type) AS BIGINT) AS null_event_type,
             CAST(count(DISTINCT event_type) AS BIGINT) AS ndv_event_type,
             min(event_type) AS mins_event_type,
             max(event_type) AS maxs_event_type,
             CAST(count(*) - count(props) AS BIGINT) AS null_props,
             CAST(count(DISTINCT props) AS BIGINT) AS ndv_props,
             min(props) AS mins_props,
             max(props) AS maxs_props
      FROM events
    )
    SELECT 'event_id' AS col_name, n_rows, null_event_id AS null_n,
           ndv_event_id AS ndv_exact, TRUE AS approx_within_bound,
           min_event_id AS min_num, max_event_id AS max_num,
           NULL AS min_str, NULL AS max_str
    FROM s
    UNION ALL
    SELECT 'user_id', n_rows, null_user_id, ndv_user_id, TRUE,
           min_user_id, max_user_id, NULL, NULL FROM s
    UNION ALL
    SELECT 'value', n_rows, null_value, ndv_value, TRUE,
           min_value, max_value, NULL, NULL FROM s
    UNION ALL
    SELECT 'event_type', n_rows, null_event_type, ndv_event_type, TRUE,
           NULL, NULL, mins_event_type, maxs_event_type FROM s
    UNION ALL
    SELECT 'props', n_rows, null_props, ndv_props, TRUE,
           NULL, NULL, mins_props, maxs_props FROM s
    ORDER BY col_name
    """,
)
def q183_analyze_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column statistics in ONE table pass: row count,
    null count, exact NDV with an HLL-estimate bound flag (the q36
    discipline — sketches are engine-specific so the estimate itself
    can't hash-compare, but an out-of-bound estimate flips the boolean
    and breaks the driver hash), and min/max (numeric columns as rounded
    doubles, string columns lexicographic — ASCII data, so byte order
    agrees across engines). This is the optimizer-stats surface behind
    the reference's ANALYZE half of T5 (db.mjs vacuum/analyze); the
    stats a CBO consumes for join sizing and a data engineer reads
    before trusting a new feed.

    Scale posture: every statistic folds in a single global aggregation —
    one scan, map-side partials, a 1-row result stacked into the 5-row
    report. The multi-column exact NDVs compile to the standard Expand
    plan (5 slim shadow rows per input row, each carrying one column);
    that is ANALYZE's inherent price and the per-row payload is a few
    bytes — at 100 TB you sample first (q75 composes for that)."""
    events = load_table(spark, sf_dir, "events")
    cols = ("event_id", "user_id", "value", "event_type", "props")
    # TWO passes by design: mixing HLL sketches (TypedImperativeAggregate
    # buffers) with countDistinct's Expand forces the whole expanded input
    # through a SortAggregate — measured 80 s at sf0.1 for what hash
    # aggregation does in ~1 s. Pass 1 takes everything hash-friendly
    # (exact NDVs ride ONE Expand into a HashAggregate with min/max/null
    # counts); pass 2 computes the five HLL estimates alone
    # (ObjectHashAggregate, no Expand); the two 1-row results meet in a
    # broadcast cross join.
    # string min/max buffers are hash-aggregation-ineligible and would drag
    # the whole Expand through a keyed SortAggregate — they ride pass 2.
    exact = events.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        *[F.countDistinct(c).cast("bigint").alias(f"ndv_{c}") for c in cols],
    )
    # DataSketches HLL (lgConfigK=12): measured 2.6x faster than HLL++ at
    # rsd=0.01 for the same pass, with ~1% observed error at sf0.1 — well
    # inside the 5% bound asserted below. Values are cast to string so one
    # sketch shape serves every column type.
    approx = events.agg(
        *[
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col(c).cast("string"), F.lit(12))
            ).alias(f"adv_{c}")
            for c in cols
        ],
        *[
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"null_{c}")
            for c in cols
        ],
        F.min("event_id").cast("double").alias("min_event_id"),
        F.max("event_id").cast("double").alias("max_event_id"),
        F.min("user_id").cast("double").alias("min_user_id"),
        F.max("user_id").cast("double").alias("max_user_id"),
        F.round(F.min("value"), 4).alias("min_value"),
        F.round(F.max("value"), 4).alias("max_value"),
        F.min("event_type").alias("mins_event_type"),
        F.max("event_type").alias("maxs_event_type"),
        F.min("props").alias("mins_props"),
        F.max("props").alias("maxs_props"),
    )
    s = exact.crossJoin(F.broadcast(approx))

    def in_bound(col: str) -> F.Column:
        rel = F.abs(F.col(f"adv_{col}") - F.col(f"ndv_{col}")) / F.col(f"ndv_{col}")
        return rel <= 0.05

    rows = []
    for col in ("event_id", "user_id", "value"):
        rows.append(
            F.struct(
                F.lit(col).alias("col_name"),
                F.col("n_rows"),
                F.col(f"null_{col}").alias("null_n"),
                F.col(f"ndv_{col}").alias("ndv_exact"),
                in_bound(col).alias("approx_within_bound"),
                F.col(f"min_{col}").alias("min_num"),
                F.col(f"max_{col}").alias("max_num"),
                F.lit(None).cast("string").alias("min_str"),
                F.lit(None).cast("string").alias("max_str"),
            )
        )
    for col in ("event_type", "props"):
        rows.append(
            F.struct(
                F.lit(col).alias("col_name"),
                F.col("n_rows"),
                F.col(f"null_{col}").alias("null_n"),
                F.col(f"ndv_{col}").alias("ndv_exact"),
                in_bound(col).alias("approx_within_bound"),
                F.lit(None).cast("double").alias("min_num"),
                F.lit(None).cast("double").alias("max_num"),
                F.col(f"mins_{col}").alias("min_str"),
                F.col(f"maxs_{col}").alias("max_str"),
            )
        )
    return (
        s.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.*")
        .orderBy("col_name")
    )


# --- q186: last-observation-carried-forward imputation -----------------------


@register(
    "q186_locf_imputation",
    oracle="""
    WITH masked AS (
      SELECT event_id, user_id, ts, event_type,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events
    ),
    filled AS (
      SELECT event_id, user_id, ts, event_type, v,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS v_filled
      FROM masked
    )
    SELECT event_id, user_id, event_type,
           round(v, 4) AS value_raw,
           round(v_filled, 4) AS value_filled,
           v IS NULL AND v_filled IS NOT NULL AS imputed,
           v IS NULL AND v_filled IS NULL AS unfillable
    FROM filled
    ORDER BY user_id, event_id
    """,
)
def q186_locf_imputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward imputation: treat 'error' rows'
    readings as sensor dropouts (masked to NULL by a deterministic rule)
    and fill each gap with the user's most recent valid reading — the
    standard time-series imputation pass before any windowed feature
    computation, expressed as last_value(IGNORE NULLS) over the user
    timeline. Rows with no prior observation stay NULL and are flagged
    unfillable (imputation must not invent a value before the first
    reading — the classic LOCF bug).

    Determinism: the timeline order carries an event_id tie-break;
    masking is a pure CASE.

    Scale posture: one user-keyed window — the same single exchange
    every per-user timeline op in the registry rides (q29/q30/q57);
    LOCF at 100 TB is exactly this partitioning or it is wrong."""
    events = load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = events.select(
        "event_id", "user_id", "ts", "event_type", v.alias("v")
    ).withColumn("v_filled", F.last("v", ignorenulls=True).over(w))
    return filled.select(
        "event_id",
        "user_id",
        "event_type",
        F.round("v", 4).alias("value_raw"),
        F.round("v_filled", 4).alias("value_filled"),
        (F.col("v").isNull() & F.col("v_filled").isNotNull()).alias("imputed"),
        (F.col("v").isNull() & F.col("v_filled").isNull()).alias("unfillable"),
    ).orderBy("user_id", "event_id")


# --- q187: CUSUM change-point detection --------------------------------------


@register(
    "q187_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             avg(value) AS m, CAST(count(*) AS BIGINT) AS n
      FROM events
      GROUP BY event_type, CAST(ts AS DATE)
    ),
    g AS (
      SELECT event_type, avg(m) AS gm FROM daily GROUP BY event_type
    ),
    c AS (
      SELECT d.event_type, d.day, d.m, d.n,
             sum(d.m - g.gm) OVER (
               PARTITION BY d.event_type ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cusum
      FROM daily d JOIN g ON d.event_type = g.event_type
    ),
    best AS (
      SELECT event_type, day, cusum,
             row_number() OVER (
               PARTITION BY event_type ORDER BY abs(cusum) DESC, day
             ) AS rn
      FROM c
    )
    SELECT c.event_type,
           b.day AS change_day,
           round(b.cusum, 4) AS max_abs_cusum,
           round(avg(CASE WHEN c.day <= b.day THEN c.m END), 4) AS mean_before,
           round(avg(CASE WHEN c.day > b.day THEN c.m END), 4) AS mean_after
    FROM c
    JOIN (SELECT event_type, day, cusum FROM best WHERE rn = 1) b
      ON b.event_type = c.event_type
    GROUP BY c.event_type, b.day, b.cusum
    ORDER BY c.event_type
    """,
)
def q187_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per event type: cumulative sum of
    daily-mean deviations from the type's own grand mean; the day where
    |CUSUM| peaks is the most likely single change point, reported with
    the before/after means — the retrospective answer to "WHEN did this
    metric shift", completing the drift family (q147 whether, q174 how
    much, q180 where in the distribution, this one when in time).

    Determinism: the cumulative order is (day) with day-unique rows per
    type; the argmax carries a day tie-break; all inputs are exact-sum
    averages rounded at the edge.

    Scale posture: one (type, day) rollup is the only corpus-sized
    aggregation; the CUSUM window, argmax, and before/after split all
    run over |types x days| bucket rows sharing the event_type hash
    partitioning."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date(F.col("ts")).alias("day")
    ).agg(F.avg("value").alias("m"), F.count(F.lit(1)).cast("bigint").alias("n"))
    g = daily.groupBy("event_type").agg(F.avg("m").alias("gm"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = daily.join(g, "event_type").withColumn(
        "cusum", F.sum(F.col("m") - F.col("gm")).over(wcum)
    )
    wbest = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), F.col("day").asc()
    )
    best = (
        c.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("day").alias("change_day"), F.col("cusum").alias("bc"))
    )
    j = c.join(best, "event_type")
    return (
        j.groupBy("event_type", "change_day", "bc")
        .agg(
            F.round(
                F.avg(F.when(F.col("day") <= F.col("change_day"), F.col("m"))), 4
            ).alias("mean_before"),
            F.round(
                F.avg(F.when(F.col("day") > F.col("change_day"), F.col("m"))), 4
            ).alias("mean_after"),
        )
        .select(
            "event_type",
            "change_day",
            F.round("bc", 4).alias("max_abs_cusum"),
            "mean_before",
            "mean_after",
        )
        .orderBy("event_type")
    )


# --- q189: grouped linear trend via regr_* aggregates ------------------------


@register(
    "q189_value_trend",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(epoch(ts) - epoch(TIMESTAMP '2024-01-01 00:00:00') AS DOUBLE)
               / 86400.0 AS day_x,
             value
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(regr_slope(value, day_x), 6) AS slope_per_day,
           round(regr_intercept(value, day_x), 4) AS intercept,
           round(regr_r2(value, day_x), 6) AS r2,
           abs(regr_slope(value, day_x)) > 0.1 AS trending
    FROM d
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q189_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped least-squares trend: slope/intercept/R² of value over time
    (days since epoch start) per event type, via the SQL-standard regr_*
    aggregate family — the one-pass algebraic form of "is this metric
    drifting linearly", complementing the detection family (q147/q174/
    q180/q187 say whether/where/when; this fits the rate). R² near zero
    with a flagged slope separates genuine trends from noise fitting.

    Determinism: both engines implement the textbook moment formulas over
    identical doubles (the x offset is a fixed literal, keeping moments
    small so summation-order residue stays under the rounding grain).

    Scale posture: regr_* aggregates are algebraic — partial moment sums
    merge map-side — so the whole fit is one bounded-cardinality
    aggregation, the same single shuffle as q11."""
    events = load_table(spark, sf_dir, "events")
    day_x = (
        F.col("ts").cast("double")
        - F.lit("2024-01-01 00:00:00").cast("timestamp").cast("double")
    ) / 86400.0
    d = events.select("event_type", day_x.alias("day_x"), "value")
    return (
        d.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.regr_slope("value", "day_x"), 6).alias("slope_per_day"),
            F.round(F.regr_intercept("value", "day_x"), 4).alias("intercept"),
            F.round(F.regr_r2("value", "day_x"), 6).alias("r2"),
            (F.abs(F.regr_slope("value", "day_x")) > 0.1).alias("trending"),
        )
        .orderBy("event_type")
    )


# --- q192: mergeable-sketch union audit --------------------------------------


@register(
    "q192_sketch_union_audit",
    oracle="""
    WITH halves AS (
      SELECT user_id,
             substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < '8' AS is_ref
      FROM events
    )
    SELECT CAST(count(DISTINCT CASE WHEN is_ref THEN user_id END) AS BIGINT)
             AS exact_ref,
           CAST(count(DISTINCT CASE WHEN NOT is_ref THEN user_id END) AS BIGINT)
             AS exact_inc,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_union,
           TRUE AS union_within_bound,
           TRUE AS merge_consistent
    FROM halves
    """,
)
def q192_sketch_union_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch union audit: build per-half DataSketches HLL
    sketches of distinct users (md5 split of events), UNION them, and
    check (a) the merged estimate sits within 5% of the exact union NDV
    and (b) merging the halves' sketches gives the SAME estimate as
    sketching the whole — the mergeability property itself. This is the
    100 TB operational pattern the estimate-only queries (q36/q183) rest
    on: store one small sketch per partition/day/source, answer
    arbitrary-slice NDV questions by merging sketches at query time,
    never rescanning — sketches are only useful at scale BECAUSE they
    merge, and this query pins that contract. Sketch bytes are
    engine-specific, so the oracle pins the exact NDVs and expects TRUE
    for both booleans (the q36 discipline).

    Scale posture: one pass builds both half-sketches (conditional
    sketch aggregates in a single aggregation); the union is O(sketch
    size) model math on the 1-row result."""
    events = load_table(spark, sf_dir, "events")
    is_ref = F.substring(F.md5(F.col("event_id").cast("string")), 1, 1) < "8"
    u = F.col("user_id").cast("string")
    s = events.agg(
        F.hll_sketch_agg(F.when(is_ref, u), F.lit(12)).alias("sk_ref"),
        F.hll_sketch_agg(F.when(~is_ref, u), F.lit(12)).alias("sk_inc"),
        F.hll_sketch_agg(u, F.lit(12)).alias("sk_all"),
        F.countDistinct(F.when(is_ref, F.col("user_id")))
        .cast("bigint")
        .alias("exact_ref"),
        F.countDistinct(F.when(~is_ref, F.col("user_id")))
        .cast("bigint")
        .alias("exact_inc"),
        F.countDistinct("user_id").cast("bigint").alias("exact_union"),
    )
    merged = F.hll_sketch_estimate(F.hll_union("sk_ref", "sk_inc"))
    whole = F.hll_sketch_estimate("sk_all")
    rel_err = F.abs(merged - F.col("exact_union")) / F.col("exact_union")
    return s.select(
        "exact_ref",
        "exact_inc",
        "exact_union",
        (rel_err <= 0.05).alias("union_within_bound"),
        (merged == whole).alias("merge_consistent"),
    )


# --- q229: sampled join-cardinality estimation --------------------------------

# Bernoulli rate for the estimator: md5(event_id) 2-hex prefix < '40' ->
# p = 64/256 = 1/4 (exact binary fraction: every arithmetic step below is
# IEEE-exact in both engines until the final sums).
_JCE_P = 64.0 / 256.0


@register(
    "q229_join_cardinality_estimate",
    oracle=f"""
    WITH c AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS c FROM events
      GROUP BY user_id
    ),
    s AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS m FROM events
      WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) < '40'
      GROUP BY user_id
    ),
    exact AS (
      SELECT CAST(SUM(c * c) AS BIGINT) AS exact_pairs,
             CAST(MAX(c * c) AS BIGINT) AS top_key_pairs,
             CAST(count(*) AS BIGINT) AS n_keys
      FROM c
    ),
    est AS (
      SELECT SUM(m * (m - 1) / ({_JCE_P} * {_JCE_P}) + m / {_JCE_P})
               AS est_pairs,
             CAST(SUM(m) AS BIGINT) AS n_sampled
      FROM s
    )
    SELECT exact_pairs, n_keys,
           round(CAST(top_key_pairs AS DOUBLE) / exact_pairs, 6)
             AS top_key_share,
           n_sampled,
           round(est_pairs, 2) AS est_pairs,
           round(est_pairs / exact_pairs, 6) AS est_ratio
    FROM exact, est
    """,
)
def q229_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-based join-cardinality estimation — the optimizer statistic
    that decides shuffle-vs-broadcast and partition counts before running
    a many-to-many join. The self-join size on a key is sum_k c(k)^2; the
    audit computes it EXACTLY from the per-key census and beside it the
    UNBIASED estimate from a 1/4 Bernoulli hash sample (E[m(m-1)] =
    p^2 c(c-1) and E[m] = p c, so sum m(m-1)/p^2 + m/p is unbiased for
    sum c^2 — the Goodman / sample-counting estimator every CBO uses when
    only a sample is affordable), plus the top key's share (the skew that
    decides salting). At 100 TB the estimate is the cheap path: it reads
    1/4 of one column and never materializes the join; the q36/q192/q216
    estimate-beside-exact discipline makes its error measurable here.

    Scale posture: two per-key HashAggregates (map-side combined, the
    sampled one filter-pushed to the scan) and two 1-row folds joined by
    broadcast — no join is ever materialized. Determinism: p = 1/4 is an
    exact binary fraction so each per-key term is IEEE-exact from bigint
    counts; the only float folds are the two corpus-key sums, rounded at
    1e-2 / 1e-6, far above summation-order residue. Reference: no
    planner-statistics surface — §7 Phase-3 extension beside q118 (skew
    census) and q216 (sampled dedup rate)."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    s = (
        ev.filter(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 2) < "40"
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    )
    exact = c.agg(
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("exact_pairs"),
        F.max(F.col("c") * F.col("c")).cast("bigint").alias("top_key_pairs"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
    )
    est = s.agg(
        F.sum(
            F.col("m") * (F.col("m") - 1) / F.lit(_JCE_P * _JCE_P)
            + F.col("m") / F.lit(_JCE_P)
        ).alias("est_pairs"),
        F.sum("m").cast("bigint").alias("n_sampled"),
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_pairs",
        "n_keys",
        F.round(
            F.col("top_key_pairs").cast("double") / F.col("exact_pairs"), 6
        ).alias("top_key_share"),
        "n_sampled",
        F.round("est_pairs", 2).alias("est_pairs"),
        F.round(F.col("est_pairs") / F.col("exact_pairs"), 6).alias("est_ratio"),
    )


# --- q230: deletion-request propagation audit ---------------------------------

# Deterministic "deletion request" cohort: customers whose key hash lands
# below 8/256 (~3%) — the same md5 idiom as q75, so the oracle replays the
# cohort exactly.
_DEL_PREFIX = "08"


@register(
    "q230_deletion_propagation_audit",
    oracle=f"""
    WITH del AS (
      SELECT c_custkey FROM customer
      WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 2) < '{_DEL_PREFIX}'
    )
    SELECT 'customer' AS table_name,
           (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_rows,
           (SELECT CAST(count(*) AS BIGINT) FROM del) AS n_purged
    UNION ALL
    SELECT 'orders',
           (SELECT CAST(count(*) AS BIGINT) FROM orders),
           (SELECT CAST(count(*) AS BIGINT) FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM del))
    UNION ALL
    SELECT 'lineitem',
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                 WHERE o_custkey IN (SELECT c_custkey FROM del)))
    UNION ALL
    SELECT 'events',
           (SELECT CAST(count(*) AS BIGINT) FROM events),
           (SELECT CAST(count(*) AS BIGINT) FROM events
            WHERE user_id IN (SELECT c_custkey FROM del))
    ORDER BY table_name
    """,
)
def q230_deletion_propagation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten propagation audit: given a deterministic
    deletion-request cohort (~3% of customers by key hash), count the
    rows each table must purge — directly keyed tables (customer, orders,
    events via the user_id=c_custkey identity, SURVEY §3.1) AND the
    2-hop transitive closure (lineitems of the cohort's orders, which
    carry no customer key of their own). This is the compliance dry-run a
    pipeline owner executes before a deletion batch: the fan-out counts
    size the job, and a table whose purge count is unexpectedly zero
    means a broken FK path — silent retention.

    Scale posture: the cohort predicate is pure key-hash arithmetic
    (rides each scan; no cohort table is materialized for the directly
    keyed tables), the 2-hop path is one key-flag left join on the FK
    spine (orders filtered map-side; unique keys, so no row inflation;
    AQE broadcasts the filtered side while small), and each table is
    scanned EXACTLY ONCE — total and purge counts fold in the same
    conditional aggregate. Nothing corpus-sized moves. Reference:
    retention delete is S8/db.mjs DELETE with age predicate; this is its
    cross-table cascade generalization (§7 Phase-3)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")

    def is_del(col: str) -> F.Column:
        return (
            F.substring(F.md5(F.col(col).cast("string")), 1, 2) < _DEL_PREFIX
        )

    del_orders = orders.filter(is_del("o_custkey"))

    # One scan per table: total and purge counts fold in the SAME
    # aggregate (conditional sum) — a separate purged-side count would
    # read each table twice. The 2-hop lineitem flag comes from a left
    # join against the cohort's order keys (unique, so no row inflation).
    def census(name: str, flagged: DataFrame) -> DataFrame:
        return flagged.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("purge").cast("bigint").alias("n_purged"),
        ).select("table_name", "n_rows", "n_purged")

    li_flagged = lineitem.join(
        del_orders.select(
            F.col("o_orderkey").alias("l_orderkey"), F.lit(1).alias("hit")
        ),
        "l_orderkey",
        "left",
    ).select(F.coalesce("hit", F.lit(0)).alias("purge"))
    return (
        census(
            "customer",
            customer.select(is_del("c_custkey").cast("int").alias("purge")),
        )
        .unionAll(
            census(
                "orders",
                orders.select(is_del("o_custkey").cast("int").alias("purge")),
            )
        )
        .unionAll(census("lineitem", li_flagged))
        .unionAll(
            census(
                "events",
                events.select(is_del("user_id").cast("int").alias("purge")),
            )
        )
        .orderBy("table_name")
    )


# --- q241: sketch-based pairwise overlap (inclusion-exclusion) -----------------


@register(
    "q241_hll_intersection",
    oracle="""
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS exact_inter
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    ),
    per AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS exact_n FROM ut
      GROUP BY event_type
    )
    SELECT p.type_a, p.type_b,
           pa.exact_n AS exact_a, pb.exact_n AS exact_b,
           p.exact_inter,
           round(CAST(p.exact_inter AS DOUBLE)
                 / (pa.exact_n + pb.exact_n - p.exact_inter), 4)
             AS exact_jaccard,
           TRUE AS est_within_bound
    FROM pairs p
    JOIN per pa ON p.type_a = pa.event_type
    JOIN per pb ON p.type_b = pb.event_type
    ORDER BY type_a, type_b
    """,
)
def q241_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix from SKETCHES: |A inter B| for every event-
    type pair via inclusion-exclusion on HLL unions (est_a + est_b -
    est_union), checked beside the exact intersection — the query-time
    pattern that answers arbitrary pairwise overlap questions at 100 TB
    from per-partition sketches WITHOUT ever joining the raw user sets
    (q192 pins that union merging is exact; this pins the derived
    intersection estimate). Sketch bytes are engine-specific, so the
    oracle pins the exact counts/Jaccard and expects TRUE for the bound
    flag: |est - exact| <= 15% of the pair's UNION size — the correct
    yardstick because inclusion-exclusion error scales with the united
    sets, not the (possibly tiny) intersection. 15% is ~5 sigma for
    lgK=12 (per-sketch RSE ~1.04/sqrt(4096) = 1.6%; three-sketch
    inclusion-exclusion ~ sqrt(3) x 1.6% = 2.8% 1-sigma), so the flag
    holds at any scale factor; the TIGHT per-pair audit with the
    measured error lives in tests/test_sketches.py::test_q241_bound,
    which prints the offending (pair, est, exact, err%) on failure
    instead of a bare hash mismatch.

    Determinism: exact counts are integer aggregates; the flag compares
    the engine-deterministic DataSketches estimate against them.

    Scale posture: ONE pass over the distinct (user, type) frame builds
    all |types| sketches (bounded-cardinality agg); the pair frame is the
    |types|^2 self-join of 5-row sketch relations — model-state math, no
    user-level join needed for the estimates (the exact intersection here
    is the audit's ground truth and itself shuffles only the distinct
    (user, type) frame)."""
    return _q241_pair_frame(spark, sf_dir).select(
        "type_a",
        "type_b",
        "exact_a",
        "exact_b",
        "exact_inter",
        "exact_jaccard",
        (F.col("err_frac") <= 0.15).alias("est_within_bound"),
    ).orderBy("type_a", "type_b")


def q241_measured_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit companion to q241: the same pair frame WITH the measured
    inclusion-exclusion relative error (|est - exact| / union) kept as a
    column, for tests/test_sketches.py::test_q241_bound which asserts the
    tight (3-sigma-ish) bound with a readable per-pair message. Not
    registered — sketch estimates are engine-specific and must not enter
    the hash-compared surface."""
    return _q241_pair_frame(spark, sf_dir).select(
        "type_a",
        "type_b",
        "exact_inter",
        F.round("est_inter", 1).alias("est_inter"),
        F.round("err_frac", 6).alias("err_frac"),
    ).orderBy("type_a", "type_b")


def _q241_pair_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared builder: event-type pair frame with exact counts, HLL
    inclusion-exclusion estimate, and relative error vs the union."""
    events = load_table(spark, sf_dir, "events")
    ut = events.select("user_id", "event_type").distinct()
    per = ut.groupBy("event_type").agg(
        F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(12)).alias("sk"),
        F.count(F.lit(1)).cast("bigint").alias("exact_n"),
    )
    a = per.select(
        F.col("event_type").alias("type_a"),
        F.col("sk").alias("sk_a"),
        F.col("exact_n").alias("exact_a"),
    )
    b = per.select(
        F.col("event_type").alias("type_b"),
        F.col("sk").alias("sk_b"),
        F.col("exact_n").alias("exact_b"),
    )
    pairs = a.join(b, F.col("type_a") < F.col("type_b"))
    exact_inter = (
        ut.alias("x")
        .join(
            ut.alias("y"),
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_inter"))
    )
    est_inter = (
        F.hll_sketch_estimate("sk_a")
        + F.hll_sketch_estimate("sk_b")
        - F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
    )
    exact_union = (
        F.col("exact_a") + F.col("exact_b") - F.col("exact_inter")
    ).cast("double")
    return pairs.join(exact_inter, ["type_a", "type_b"]).select(
        "type_a",
        "type_b",
        "exact_a",
        "exact_b",
        "exact_inter",
        F.round(F.col("exact_inter").cast("double") / exact_union, 4).alias(
            "exact_jaccard"
        ),
        est_inter.alias("est_inter"),
        (F.abs(est_inter - F.col("exact_inter")) / exact_union).alias("err_frac"),
    )


# --- q246: offline changepoint by binary segmentation --------------------------


@register(
    "q246_binary_segmentation",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             sum(value) AS s, sum(value * value) AS ss,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, day, s, ss, n,
             sum(s) OVER w AS cs, sum(ss) OVER w AS css,
             sum(n) OVER w AS cn,
             sum(s) OVER p AS ts_, sum(ss) OVER p AS tss,
             sum(n) OVER p AS tn,
             row_number() OVER w AS rk,
             CAST(count(*) OVER p AS BIGINT) AS n_days
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day),
             p AS (PARTITION BY event_type)
    ),
    gains AS (
      SELECT event_type, day, n_days, cn, tn, cs, ts_,
             (tss - ts_ * ts_ / tn)
             - ((css - cs * cs / cn)
                + ((tss - css) - (ts_ - cs) * (ts_ - cs) / (tn - cn)))
               AS gain,
             tss - ts_ * ts_ / tn AS sse_total
      FROM cum WHERE rk < n_days
    ),
    best AS (
      SELECT event_type, day AS split_day, n_days,
             round(cs / cn, 4) AS mean_before,
             round((ts_ - cs) / (tn - cn), 4) AS mean_after,
             round(gain, 4) AS sse_gain,
             round(gain / nullif(sse_total, 0), 6) AS gain_ratio,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY round(gain, 6) DESC, day
             ) AS rn
      FROM gains
    )
    SELECT event_type, split_day, n_days, mean_before, mean_after,
           sse_gain, gain_ratio, gain_ratio > 0.1 AS pronounced
    FROM best WHERE rn = 1
    ORDER BY event_type
    """,
)
def q246_binary_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline changepoint location by binary segmentation: for each event
    type's daily value series, the split day that maximizes the SSE
    reduction (total SSE minus best two-segment SSE) — the classic
    retrospective "WHEN did the level shift" answer that complements
    q187's sequential CUSUM (online detector) and q189's linear trend
    (gradual drift): segmentation finds the STEP. One pass of prefix
    sums prices every candidate split from the same cumulative moments
    (Scott & Knott 1974 binary segmentation; public).

    Determinism: daily sums are float folds of the raw values — the
    per-day partial-agg order differs between engines, but gains are
    ranked on round(gain, 6) with the day as total tie-break, and the
    emitted floats are rounded at the shown grain (the repo's float-fold
    rule); counts and day keys are exact.

    Scale posture: the daily census is one map-side partial agg to
    |types| x 31 rows (calendar-bounded); every window after it
    partitions by event_type over that 31-row frame. At 100x only the
    scan grows."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(
            F.sum("value").alias("s"),
            F.sum(F.col("value") * F.col("value")).alias("ss"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    p = Window.partitionBy("event_type")
    cum = daily.select(
        "event_type",
        "day",
        F.sum("s").over(w).alias("cs"),
        F.sum("ss").over(w).alias("css"),
        F.sum("n").over(w).alias("cn"),
        F.sum("s").over(p).alias("ts_"),
        F.sum("ss").over(p).alias("tss"),
        F.sum("n").over(p).alias("tn"),
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(p).cast("bigint").alias("n_days"),
    )
    sse_total = F.col("tss") - F.col("ts_") * F.col("ts_") / F.col("tn")
    sse_left = F.col("css") - F.col("cs") * F.col("cs") / F.col("cn")
    sse_right = (F.col("tss") - F.col("css")) - (
        F.col("ts_") - F.col("cs")
    ) * (F.col("ts_") - F.col("cs")) / (F.col("tn") - F.col("cn"))
    gains = cum.filter(F.col("rk") < F.col("n_days")).select(
        "event_type",
        "day",
        "n_days",
        "cn",
        "tn",
        "cs",
        "ts_",
        (sse_total - (sse_left + sse_right)).alias("gain"),
        sse_total.alias("sse_total"),
    )
    wb = Window.partitionBy("event_type").orderBy(
        F.round(F.col("gain"), 6).desc(), F.col("day").asc()
    )
    best = gains.select(
        "event_type",
        F.col("day").alias("split_day"),
        "n_days",
        F.round(F.col("cs") / F.col("cn"), 4).alias("mean_before"),
        F.round(
            (F.col("ts_") - F.col("cs")) / (F.col("tn") - F.col("cn")), 4
        ).alias("mean_after"),
        F.round(F.col("gain"), 4).alias("sse_gain"),
        F.round(
            F.col("gain") / F.nullif(F.col("sse_total"), F.lit(0.0)), 6
        ).alias("gain_ratio"),
        F.row_number().over(wb).alias("rn"),
    )
    return (
        best.filter(F.col("rn") == 1)
        .select(
            "event_type",
            "split_day",
            "n_days",
            "mean_before",
            "mean_after",
            "sse_gain",
            "gain_ratio",
            (F.col("gain_ratio") > 0.1).alias("pronounced"),
        )
        .orderBy("event_type")
    )


# --- q253: Hill estimator of the value distribution's tail index ---------------

_HILL_K = 200


@register(
    "q253_hill_tail_index",
    oracle=f"""
    WITH pos AS (
      SELECT value, event_id FROM events WHERE value > 0
    ),
    top AS (
      SELECT value, event_id,
             row_number() OVER (ORDER BY value DESC, event_id) AS rk
      FROM pos QUALIFY rk <= {_HILL_K} + 1
    ),
    arr AS (
      SELECT list(ln(value) ORDER BY rk) AS a,
             min(CASE WHEN rk = {_HILL_K} + 1 THEN value END) AS x_k1
      FROM top
    )
    SELECT CAST({_HILL_K} AS BIGINT) AS k,
           round(x_k1, 4) AS threshold_x,
           round(list_aggregate(a[1:{_HILL_K}], 'sum') / {_HILL_K}
                 - ln(x_k1), 6) AS hill_h,
           round(1.0 / (list_aggregate(a[1:{_HILL_K}], 'sum') / {_HILL_K}
                        - ln(x_k1)), 4) AS tail_alpha,
           1.0 / (list_aggregate(a[1:{_HILL_K}], 'sum') / {_HILL_K}
                  - ln(x_k1)) < 2.0 AS infinite_variance
    FROM arr
    """,
)
def q253_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How heavy is the value distribution's tail: the Hill estimator over
    the top-{_HILL_K} order statistics (H = mean ln x_(i) - ln x_(k+1),
    tail index alpha = 1/H; Hill 1975, public) — the number that decides
    whether mean-based monitors (q174, q248) are even valid: alpha < 2
    means infinite variance and every CLT-based alarm is miscalibrated,
    the regime where the robust family (q165 MAD, q122 winsorized) is
    mandatory. Complements q45's percentiles (descriptive) with the
    asymptotic LAW of the extremes.

    Determinism: the top-(k+1) head carries a (value DESC, event_id)
    total order; the log fold runs over the rank-sorted array in
    identical order in both engines (the q141 discipline); outputs
    rounded at the shown grain.

    Scale posture: one TakeOrderedAndProject pulls the {_HILL_K}+1
    extreme rows (no global sort materialization); the estimator folds a
    bounded array on a 1-row frame. The rank window runs on the
    pre-limited head."""
    events = load_table(spark, sf_dir, "events")
    pos = events.filter(F.col("value") > 0).select("value", "event_id")
    top = pos.orderBy(F.col("value").desc(), F.col("event_id").asc()).limit(
        _HILL_K + 1
    )
    w = Window.orderBy(F.col("value").desc(), F.col("event_id").asc())
    ranked = top.select(
        F.row_number().over(w).alias("rk"), F.log("value").alias("lx"), "value"
    )
    arr = ranked.agg(
        F.expr("transform(array_sort(collect_list(struct(rk, lx))), s -> s.lx)")
        .alias("a"),
        F.min(F.when(F.col("rk") == _HILL_K + 1, F.col("value"))).alias(
            "x_k1"
        ),
    )
    h = (
        F.expr(f"aggregate(slice(a, 1, {_HILL_K}), 0D, (acc, v) -> acc + v)")
        / _HILL_K
        - F.log("x_k1")
    )
    return arr.select(
        F.lit(_HILL_K).cast("bigint").alias("k"),
        F.round("x_k1", 4).alias("threshold_x"),
        F.round(h, 6).alias("hill_h"),
        F.round(1.0 / h, 4).alias("tail_alpha"),
        (1.0 / h < 2.0).alias("infinite_variance"),
    )


# --- q254: Benford first-digit conformance audit -------------------------------


@register(
    "q254_benford_audit",
    oracle="""
    WITH pos AS (
      SELECT event_type,
             CAST(floor(value / pow(10, floor(log10(value)))) AS BIGINT)
               AS digit
      FROM events WHERE value > 0
    ),
    per AS (
      SELECT event_type, digit, CAST(count(*) AS BIGINT) AS n
      FROM pos GROUP BY event_type, digit
    ),
    tot AS (
      SELECT event_type, CAST(sum(n) AS BIGINT) AS n_type FROM per
      GROUP BY event_type
    )
    SELECT p.event_type, p.digit, p.n,
           round(CAST(p.n AS DOUBLE) / t.n_type, 6) AS obs_share,
           round(log10(1.0 + 1.0 / p.digit), 6) AS benford_share,
           round(CAST(p.n AS DOUBLE) / t.n_type
                 - log10(1.0 + 1.0 / p.digit), 6) AS deviation
    FROM per p JOIN tot t USING (event_type)
    ORDER BY event_type, digit
    """,
)
def q254_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit census against Benford's law (P(d) =
    log10(1 + 1/d)) per event type — the classic forensic data-quality
    screen: organically generated multiplicative quantities follow
    Benford closely, while fabricated, truncated, or unit-mangled feeds
    pile up on specific leading digits; a deviation column that jumps
    after an ingest change is a pipeline bug found without any schema
    knowledge (Benford 1938 / Nigrini's audit practice — public).
    Complements the distributional drift family (q147/q180/q245) with a
    SCALE-INVARIANT check: Benford conformance survives unit changes
    that would trip every CDF-based monitor.

    Determinism: the leading digit is floor(v / 10^floor(log10 v)) —
    pure double arithmetic evaluated identically in both engines on
    identical inputs; counts are exact ints; shares rounded at 1e-6.

    Scale posture: one map-side partial agg to |types| x 9 rows; the
    totals join is on the bounded type dimension. Only the scan grows."""
    events = load_table(spark, sf_dir, "events")
    digit = F.floor(
        F.col("value") / F.pow(10.0, F.floor(F.log10("value")))
    ).cast("bigint")
    per = (
        events.filter(F.col("value") > 0)
        .select("event_type", digit.alias("digit"))
        .groupBy("event_type", "digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = per.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("n_type")
    )
    share = F.col("n").cast("double") / F.col("n_type")
    benford = F.log10(1.0 + 1.0 / F.col("digit"))
    return (
        per.join(tot, "event_type")
        .select(
            "event_type",
            "digit",
            "n",
            F.round(share, 6).alias("obs_share"),
            F.round(benford, 6).alias("benford_share"),
            F.round(share - benford, 6).alias("deviation"),
        )
        .orderBy("event_type", "digit")
    )


# --- q262: approximate functional-dependency discovery ------------------------

_FD_CANDIDATES = [
    # (fd label, table, lhs column, rhs column)
    ("part.p_name->p_brand", "part", "p_name", "p_brand"),
    ("part.p_name->p_type", "part", "p_name", "p_type"),
    ("orders.o_custkey->o_orderpriority", "orders", "o_custkey", "o_orderpriority"),
    ("events.user_id->event_type", "events", "user_id", "event_type"),
    ("documents.source->lang", "documents", "source", "lang"),
]


def _fd_cte(label: str, table: str, lhs: str, rhs: str) -> str:
    return f"""
      SELECT '{label}' AS fd,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(count(*) FILTER (WHERE n_rhs > 1) AS BIGINT) AS violating_groups,
             round(CAST(sum(total - max_one) AS DOUBLE) / sum(total), 6) AS g3_violation
      FROM (
        SELECT sum(n) AS total, max(n) AS max_one, count(*) AS n_rhs
        FROM (SELECT {lhs}, {rhs}, count(*) AS n FROM {table} GROUP BY 1, 2)
        GROUP BY {lhs}
      )"""


@register(
    "q262_fd_discovery",
    oracle=(
        "SELECT * FROM ("
        + " UNION ALL ".join(_fd_cte(*c) for c in _FD_CANDIDATES)
        + ") ORDER BY fd"
    ),
)
def q262_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate functional-dependency discovery (profiling the catalog the
    way Metanome/TANE-style systems do, reduced to the g3 error measure):
    for each candidate FD lhs -> rhs, the number of lhs groups, how many
    groups witness more than one rhs value, and the g3 violation rate — the
    minimum fraction of rows to delete for the FD to hold exactly. Extends
    q207's known-FK integrity audit to UNKNOWN dependencies: g3 ~ 0 flags a
    dependency worth enforcing; g3 >> 0 refutes the candidate.

    Scale: each candidate costs two HashAggregates — (lhs, rhs) counts, then
    per-lhs max/sum — shuffling only the distinct (lhs, rhs) frame, never
    rows. Candidates run as independent 1-row aggregates unioned at the end;
    on a cluster they parallelize trivially. No window, no join."""
    out = None
    for label, table, lhs, rhs in _FD_CANDIDATES:
        t = load_table(spark, sf_dir, table)
        pair_counts = t.groupBy(F.col(lhs), F.col(rhs)).agg(
            F.count(F.lit(1)).alias("n")
        )
        per_lhs = pair_counts.groupBy(lhs).agg(
            F.sum("n").alias("total"),
            F.max("n").alias("max_one"),
            F.count(F.lit(1)).alias("n_rhs"),
        )
        row = per_lhs.agg(
            F.lit(label).alias("fd"),
            F.count(F.lit(1)).alias("n_groups"),
            F.sum((F.col("n_rhs") > 1).cast("bigint")).alias("violating_groups"),
            F.round(
                F.sum(F.col("total") - F.col("max_one")).cast("double")
                / F.sum("total"),
                6,
            ).alias("g3_violation"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("fd")


# --- q260: k-anonymity / l-diversity governance audit -------------------------


@register(
    "q260_k_anonymity_audit",
    oracle="""
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT CAST(floor(c_acctbal / 100) AS BIGINT) % 10)
                  AS BIGINT) AS l_div
      FROM customer GROUP BY 1, 2, 3
    ),
    ks AS (SELECT unnest([2, 5, 10]) AS k)
    SELECT CAST(k AS INT) AS k,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(count(*) FILTER (WHERE n < k) AS BIGINT) AS groups_below_k,
           CAST(coalesce(sum(n) FILTER (WHERE n < k), 0) AS BIGINT) AS rows_at_risk,
           round(CAST(coalesce(sum(n) FILTER (WHERE n < k), 0) AS DOUBLE)
                 / sum(n), 6) AS at_risk_fraction,
           CAST(min(l_div) AS BIGINT) AS min_l_diversity
    FROM qi, ks GROUP BY k ORDER BY k
    """,
)
def q260_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity governance audit over the customer table:
    group by the quasi-identifier tuple (nation, market segment, account-
    balance band), then for k in {2, 5, 10} report how many QI groups fall
    below k members and what fraction of ROWS sits in those re-identifiable
    groups; min_l_diversity is the smallest count of distinct sensitive
    values in any group, with the balance HUNDREDS DIGIT (finer than the
    QI's thousand-band, 10-value codomain) as the sensitive attribute —
    genuinely non-unique, so a group can be k-anonymous yet 1-diverse
    (every member shares the digit), the failure l-diversity exists to
    catch (ADVICE r7: custkey, the table's unique key, made l_div
    degenerate to the group size). This is the release-
    gating audit a training-data pipeline runs before exporting any
    user-derived table — the governance sibling of q160's PII scrub and
    q230's deletion-propagation audit.

    Scale: one HashAggregate collapses the corpus to |QI groups| rows
    (count + count-distinct shuffle on the QI key); the 3-row k frame
    cross-joins the group table broadcast-style, and the final aggregate is
    3 rows. No window, no corpus-sized join."""
    cust = load_table(spark, sf_dir, "customer")
    qi = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(
            F.floor(F.col("c_acctbal") / 100).cast("bigint") % 10
        ).alias("l_div"),
    )
    ks = spark.range(0, 3).select(
        F.element_at(F.array(F.lit(2), F.lit(5), F.lit(10)), (F.col("id") + 1).cast("int"))
        .cast("int")
        .alias("k")
    )
    at_risk = F.sum(F.when(F.col("n") < F.col("k"), F.col("n")).otherwise(F.lit(0)))
    return (
        qi.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum((F.col("n") < F.col("k")).cast("bigint")).alias("groups_below_k"),
            at_risk.cast("bigint").alias("rows_at_risk"),
            F.round(at_risk.cast("double") / F.sum("n"), 6).alias("at_risk_fraction"),
            F.min("l_div").alias("min_l_diversity"),
        )
        .orderBy("k")
    )


@register(
    "q317_t_closeness_audit",
    oracle="""
    WITH s AS (
      SELECT c_nationkey AS nk, c_mktsegment AS seg,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             CAST(floor(c_acctbal / 100) AS BIGINT) % 10 AS d
      FROM customer
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s),
    gcd AS (SELECT d, CAST(count(*) AS BIGINT) AS cd FROM s GROUP BY d),
    gd AS (
      SELECT nk, seg, bal_band, d, CAST(count(*) AS BIGINT) AS c
      FROM s GROUP BY 1, 2, 3, 4
    ),
    gn AS (
      SELECT nk, seg, bal_band, CAST(sum(c) AS BIGINT) AS n_g
      FROM gd GROUP BY 1, 2, 3
    ),
    tv AS (
      SELECT gd.nk, gd.seg, gd.bal_band, gn.n_g, tot.n,
             CAST(sum(abs(gd.c * tot.n - gcd.cd * gn.n_g)) AS BIGINT)
               + (tot.n - CAST(sum(gcd.cd) AS BIGINT)) * gn.n_g AS t_num
      FROM gd JOIN gn USING (nk, seg, bal_band) JOIN gcd USING (d), tot
      GROUP BY 1, 2, 3, 4, 5
    ),
    th AS (SELECT unnest([CAST(0.20 AS DOUBLE), CAST(0.35 AS DOUBLE),
                          CAST(0.50 AS DOUBLE)]) AS t0)
    SELECT t0 AS t_threshold,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(count(*) FILTER (WHERE t_num / (2.0 * n * n_g) > t0) AS BIGINT)
             AS groups_over_t,
           CAST(coalesce(sum(n_g) FILTER (WHERE t_num / (2.0 * n * n_g) > t0), 0)
                AS BIGINT) AS rows_over_t,
           round(max(t_num / (2.0 * n * n_g)), 6) AS max_t,
           round(sum(t_num) / (2.0 * max(n) * max(n)), 6) AS weighted_mean_t
    FROM tv, th GROUP BY t0 ORDER BY t0
    """,
)
def q317_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness — the third rung of the release-gating privacy ladder
    (k-anonymity and l-diversity are q260): a QI group can be k-anonymous
    AND l-diverse yet still leak if its sensitive-value DISTRIBUTION skews
    far from the global one (the classic salary example: all l values
    present but 90% mass on one). Per q260's QI tuple (nation, segment,
    balance band) and sensitive attribute (balance hundreds digit), the
    audit computes each group's total-variation distance to the global
    digit distribution — the categorical Earth-Mover's distance — and
    reports, per threshold t in {0.20, 0.35, 0.50}, the violating groups
    and their row mass, plus the worst and member-weighted-mean distances.

    Determinism: TVD is evaluated over a COMMON integer denominator —
    t_num = sum_d |c_gd*N - C_d*n_g| + (N - sum_d_present C_d)*n_g (the
    absent-digit mass folded in closed form, so no 10-way domain explode)
    — exact bigint sums, one final division; the weighted mean collapses
    to sum(t_num)/(2*N^2), again integer-exact. The bigint products bound
    the exact form to N*n_g < 2^63 (~3e9 x 3e9); past that the audit
    switches to double ratios and tolerates last-ulp noise — stated, not
    hidden.

    Scale: one corpus-collapse to (QI, digit) counts (map-side combined),
    a 10-row broadcast global digit census, and a 3-row threshold frame —
    the q260 shuffle shape with one extra bounded join."""
    cust = load_table(spark, sf_dir, "customer")
    digit = F.floor(F.col("c_acctbal") / 100).cast("bigint") % 10
    s = cust.select(
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
        digit.alias("d"),
    )
    gd = s.groupBy("nk", "seg", "bal_band", "d").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    glob = gd.groupBy("d").agg(F.sum("c").cast("bigint").alias("cd"))
    tot = glob.agg(F.sum("cd").cast("bigint").alias("n"))
    gn = gd.groupBy("nk", "seg", "bal_band").agg(
        F.sum("c").cast("bigint").alias("n_g")
    )
    tv = (
        gd.join(F.broadcast(glob), "d")
        .join(gn, ["nk", "seg", "bal_band"])
        .crossJoin(F.broadcast(tot))
        .groupBy("nk", "seg", "bal_band", "n_g", "n")
        .agg(
            (
                F.sum(F.abs(F.col("c") * F.col("n") - F.col("cd") * F.col("n_g")))
                + (
                    F.first("n") - F.sum("cd")
                ) * F.first("n_g")
            )
            .cast("bigint")
            .alias("t_num")
        )
    )
    th = spark.range(0, 3).select(
        F.element_at(
            F.array(F.lit(0.20), F.lit(0.35), F.lit(0.50)),
            (F.col("id") + 1).cast("int"),
        )
        .cast("double")
        .alias("t0")
    )
    t = F.col("t_num") / (2.0 * F.col("n") * F.col("n_g"))
    over = t > F.col("t0")
    return (
        tv.crossJoin(F.broadcast(th))
        .groupBy(F.col("t0").alias("t_threshold"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum(over.cast("bigint")).cast("bigint").alias("groups_over_t"),
            F.sum(F.when(over, F.col("n_g")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("rows_over_t"),
            F.round(F.max(t), 6).alias("max_t"),
            F.round(
                F.sum("t_num") / (2.0 * F.max("n") * F.max("n")), 6
            ).alias("weighted_mean_t"),
        )
        .orderBy("t_threshold")
    )


@register(
    "q286_zonemap_pruning_audit",
    oracle="""
    WITH zones AS (
      SELECT l_orderkey // 512 AS chunk,
             min(l_shipdate) AS zmin, max(l_shipdate) AS zmax,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1
    ),
    probes AS (
      SELECT * FROM (VALUES
        (1, TIMESTAMP '1996-03-01 00:00:00', TIMESTAMP '1996-03-08 00:00:00'),
        (2, TIMESTAMP '1996-06-01 00:00:00', TIMESTAMP '1996-07-01 00:00:00'),
        (3, TIMESTAMP '1997-01-01 00:00:00', TIMESTAMP '1997-07-01 00:00:00')
      ) AS p(pid, lo, hi)
    ),
    zstats AS (
      SELECT p.pid,
             CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(count(*) FILTER (WHERE z.zmax < p.lo OR z.zmin >= p.hi)
                  AS BIGINT) AS n_pruned,
             CAST(coalesce(sum(z.n) FILTER (
                    WHERE NOT (z.zmax < p.lo OR z.zmin >= p.hi)), 0)
                  AS BIGINT) AS rows_scanned
      FROM zones z, probes p
      GROUP BY p.pid
    ),
    hits AS (
      SELECT p.pid, CAST(count(*) AS BIGINT) AS rows_matched
      FROM lineitem l JOIN probes p
        ON l.l_shipdate >= p.lo AND l.l_shipdate < p.hi
      GROUP BY p.pid
    )
    SELECT z.pid, z.n_chunks, z.n_pruned, z.rows_scanned,
           coalesce(h.rows_matched, 0) AS rows_matched,
           round(CAST(z.n_pruned AS DOUBLE) / z.n_chunks, 4) AS prune_rate,
           round(CAST(z.rows_scanned - coalesce(h.rows_matched, 0) AS DOUBLE)
                 / z.rows_scanned, 4) AS overscan
    FROM zstats z LEFT JOIN hits h ON z.pid = h.pid
    ORDER BY z.pid
    """,
)
def q286_zonemap_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max data-skipping) effectiveness audit — the
    layout-planning companion of q259's Z-order locality score: chunks of
    512 consecutive orderkeys stand in for parquet row groups, each
    carrying its (min, max) shipdate zone map; for three probe date
    ranges the audit reports how many chunks the zone maps prune
    (zmax < lo OR zmin >= hi), how many rows the surviving chunks force a
    scan of, and the overscan ratio (scanned-but-not-matched / scanned).
    High overscan on a hot predicate column is the signal to re-sort or
    Z-order the table by that column — the decision this query exists to
    drive at 100 TB, where a row group is ~128 MB and overscan is real
    I/O.

    Determinism: counts and timestamp comparisons only — no floats until
    the two edge-rounded ratios.

    Scale posture: the zone table is one groupBy over the scan
    (|rows|/512 rows out — the actual parquet footer statistics at
    scale, computed here because the engine's row-group stats aren't
    queryable from SQL); the 3-row probe frame broadcasts into both the
    zone census and the exact-match recount (the only
    BroadcastNestedLoopJoin — 3-row build side, recorded)."""
    li = load_table(spark, sf_dir, "lineitem")
    zones = li.groupBy(F.expr("l_orderkey div 512").alias("chunk")).agg(
        F.min("l_shipdate").alias("zmin"),
        F.max("l_shipdate").alias("zmax"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    probes = spark.createDataFrame(
        [
            (1, "1996-03-01 00:00:00", "1996-03-08 00:00:00"),
            (2, "1996-06-01 00:00:00", "1996-07-01 00:00:00"),
            (3, "1997-01-01 00:00:00", "1997-07-01 00:00:00"),
        ],
        "pid int, lo_s string, hi_s string",
    ).select(
        "pid",
        F.col("lo_s").cast("timestamp").alias("lo"),
        F.col("hi_s").cast("timestamp").alias("hi"),
    )
    pruned = (F.col("zmax") < F.col("lo")) | (F.col("zmin") >= F.col("hi"))
    zstats = (
        zones.crossJoin(F.broadcast(probes))
        .groupBy("pid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.count(F.when(pruned, 1)).cast("bigint").alias("n_pruned"),
            F.coalesce(F.sum(F.when(~pruned, F.col("n"))), F.lit(0))
            .cast("bigint")
            .alias("rows_scanned"),
        )
    )
    hits = (
        li.join(
            F.broadcast(probes),
            (F.col("l_shipdate") >= F.col("lo")) & (F.col("l_shipdate") < F.col("hi")),
        )
        .groupBy("pid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("rows_matched"))
    )
    return (
        zstats.join(hits, "pid", "left")
        .select(
            "pid",
            "n_chunks",
            "n_pruned",
            "rows_scanned",
            F.coalesce("rows_matched", F.lit(0)).cast("bigint").alias("rows_matched"),
            F.round(
                F.col("n_pruned").cast("double") / F.col("n_chunks"), 4
            ).alias("prune_rate"),
            F.round(
                (F.col("rows_scanned") - F.coalesce("rows_matched", F.lit(0))).cast(
                    "double"
                )
                / F.col("rows_scanned"),
                4,
            ).alias("overscan"),
        )
        .orderBy("pid")
    )


@register(
    "q307_hll_mergeable_cube",
    oracle="""
    WITH ut AS (
      SELECT DISTINCT user_id, event_type,
             CAST(extract(day FROM ts) AS INT) AS dom
      FROM events
    ),
    type_level AS (
      SELECT 'type' AS level, event_type AS key,
             CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
      FROM ut GROUP BY event_type
    ),
    day_level AS (
      SELECT 'day' AS level, CAST(dom AS VARCHAR) AS key,
             CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
      FROM ut GROUP BY dom
    ),
    all_level AS (
      SELECT 'all' AS level, '*' AS key,
             CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
      FROM ut
    )
    SELECT level, key, exact_users, TRUE AS merged_within_bound
    FROM (SELECT * FROM type_level
          UNION ALL SELECT * FROM day_level
          UNION ALL SELECT * FROM all_level)
    ORDER BY level, key
    """,
)
def q307_hll_mergeable_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch CUBE: distinct users per event type, per day, and
    globally — all three granularities served from ONE pass of
    per-(type, day) HLL sketches, coarser levels by UNION-MERGING the
    base cells (never re-scanning the corpus). This is the OLAP serving
    pattern sketches exist for at 100 TB: materialize the finest-grain
    sketch table once, answer every rollup by merge (q126 pins the
    COUNT-rollup merge == rebuild; q192 pins one sketch union exact;
    this pins the full cube derivation). The exact distinct counts are
    computed beside each level, and the flag asserts each MERGED
    estimate lands within 5% of exact (~3 sigma at lgK=12, rse ~1.6% —
    merging HLLs loses nothing: the union sketch is identical to
    sketching the union, which is why the bound stays single-sketch
    sized; the q241 bound discipline, with the accompanying pytest
    giving the readable failure).

    Scale posture: one shuffle to (type, day) cells carrying 4 KB
    sketches + exact distinct sets collapse; every rollup after that
    merges <= |cells| sketches — no second corpus scan anywhere."""
    levels = _q307_level_frame(spark, sf_dir)
    return levels.select(
        "level",
        "key",
        "exact_users",
        (
            F.abs(F.col("est") - F.col("exact_users"))
            <= F.lit(0.05) * F.col("exact_users")
        ).alias("merged_within_bound"),
    ).orderBy("level", "key")


def _q307_level_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(level, key, exact_users, est): one base sketch pass, three merged
    rollup levels, exact distinct counts beside each."""
    ev = load_table(spark, sf_dir, "events")
    u = F.col("user_id").cast("string")
    base = ev.groupBy(
        "event_type", F.dayofmonth("ts").cast("int").alias("dom")
    ).agg(F.hll_sketch_agg(u, F.lit(12)).alias("sk"))
    # exact side (one distinct collapse, reused by all three levels)
    ut = ev.select(
        "user_id", "event_type", F.dayofmonth("ts").cast("int").alias("dom")
    ).distinct()
    t_exact = ut.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users")
    )
    d_exact = ut.groupBy("dom").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users")
    )
    g_exact = ut.agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users")
    )
    t_est = base.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    d_est = base.groupBy("dom").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    g_est = base.agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    t_rows = t_exact.join(t_est, "event_type").select(
        F.lit("type").alias("level"),
        F.col("event_type").alias("key"),
        "exact_users",
        "est",
    )
    d_rows = d_exact.join(d_est, "dom").select(
        F.lit("day").alias("level"),
        F.col("dom").cast("string").alias("key"),
        "exact_users",
        "est",
    )
    g_rows = g_exact.crossJoin(F.broadcast(g_est)).select(
        F.lit("all").alias("level"), F.lit("*").alias("key"), "exact_users", "est"
    )
    return t_rows.unionAll(d_rows).unionAll(g_rows)


def q307_measured_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit companion to q307 (the q241_measured_errors pattern): the same
    per-level frame WITH the merged estimate and its relative error kept
    as columns, for tests/test_sketches.py::test_q307_cube_bound which
    asserts the bound with a readable per-level message. Not registered —
    sketch estimates are engine-specific and must not enter the
    hash-compared surface."""
    return _q307_level_frame(spark, sf_dir).select(
        "level",
        "key",
        "exact_users",
        "est",
        (
            F.abs(F.col("est") - F.col("exact_users"))
            / F.col("exact_users")
        ).alias("err_frac"),
    )

