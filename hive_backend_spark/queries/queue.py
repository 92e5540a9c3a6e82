"""Queue semantics — SURVEY.md §2.9 (Q1-Q13) in batch-deterministic form.

The reference's `updates` table is a hand-rolled at-least-once message queue
(db.mjs:35-51 DDL; producers server.mjs:110-118,217-229; consumer
db.mjs:285-293; two-phase completion db.mjs:323-332). The oracle-checkable
batch forms live here; the Structured Streaming mirrors live in
``hive_backend_spark.streaming`` and are smoke-tested in pytest (SURVEY §7
keeps them out of the oracle set by design).

`events` is the queue stand-in (FIXTURES.md §B): ts=created_at,
event_type=routing key, coalesce(value,0)=priority.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import NOW, register


@register(
    "q50_enqueue_defaults",
    oracle="""
    SELECT event_id AS id,
           event_type AS type,
           CASE WHEN event_type IN ('click', 'view') THEN 'sheets' ELSE 'slides' END AS source_type,
           CASE WHEN event_type IN ('click', 'view') THEN 'slides' ELSE 'sheets' END AS target_type,
           props AS content,
           FALSE AS processed,
           FALSE AS acknowledged,
           CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS priority,
           ts AS created_at
    FROM events
    """,
)
def q50_enqueue_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1+Q2+Q9 enqueue with routing and priority escalation: the producer
    shape (db.mjs:252-259 insertUpdate; server.mjs:115 target flip;
    server.mjs:117 selection priority=1). Pure projection — no shuffle; at
    scale this is the map stage feeding a partitioned-by-target_type write."""
    events = load_table(spark, sf_dir, "events")
    is_sheets = F.col("event_type").isin("click", "view")
    return events.select(
        F.col("event_id").alias("id"),
        F.col("event_type").alias("type"),
        F.when(is_sheets, "sheets").otherwise("slides").alias("source_type"),
        F.when(is_sheets, "slides").otherwise("sheets").alias("target_type"),
        F.col("props").alias("content"),
        F.lit(False).alias("processed"),
        F.lit(False).alias("acknowledged"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("priority"),
        F.col("ts").alias("created_at"),
    )


@register(
    "q52_two_phase_mark",
    oracle="""
    SELECT e.event_id, TRUE AS processed, TIMESTAMP '2024-01-31 00:00:00' AS processed_at
    FROM events e
    WHERE e.event_id IN (
      SELECT event_id FROM events
      WHERE event_type = 'click'
      ORDER BY coalesce(value, 0) DESC, ts ASC, event_id ASC
      LIMIT 100
    )
    """,
)
def q52_two_phase_mark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 two-phase completion, phase 1 (db.mjs:323-332 markUpdatesProcessed:
    UPDATE ... SET processed=1, processed_at=now WHERE id IN (...)): the
    dequeued batch (q01) flows back as a semi join marking rows processed.
    The IN-list of the reference becomes a broadcast semi join — the 100-row
    batch broadcasts, the big table never shuffles."""
    events = load_table(spark, sf_dir, "events")
    batch = (
        events.filter(F.col("event_type") == "click")
        .orderBy(F.coalesce(F.col("value"), F.lit(0.0)).desc(), F.col("ts").asc(), F.col("event_id").asc())
        .limit(100)
        .select("event_id")
    )
    return (
        events.join(F.broadcast(batch), "event_id", "left_semi")
        .select(
            "event_id",
            F.lit(True).alias("processed"),
            F.lit(NOW).cast("timestamp").alias("processed_at"),
        )
    )


@register(
    "q53_stale_apps",
    oracle=f"""
    SELECT user_id, max(ts) AS last_seen
    FROM events
    GROUP BY user_id
    HAVING max(ts) < TIMESTAMP '{NOW}' - INTERVAL 3 DAY
    """,
)
def q53_stale_apps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 heartbeat staleness watermark (db.mjs:357-373: updateAppLastSeen
    bumps last_seen; getStaleApps finds apps older than the horizon).
    max()-per-key then horizon filter; partial aggregation keeps the shuffle
    tiny (one row per key per partition)."""
    events = load_table(spark, sf_dir, "events")
    horizon = F.lit(NOW).cast("timestamp") - F.expr("INTERVAL 3 DAYS")
    return (
        events.groupBy("user_id")
        .agg(F.max("ts").alias("last_seen"))
        .filter(F.col("last_seen") < horizon)
    )


@register(
    "q54_ttl_retention",
    oracle=f"""
    SELECT event_type, count(*) AS surviving, min(ts) AS oldest_kept
    FROM events
    WHERE ts >= TIMESTAMP '{NOW}' - INTERVAL 14 DAY
    GROUP BY event_type
    """,
)
def q54_ttl_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8/S8 TTL retention (db.mjs:387-408 cleanupStaleData: DELETE WHERE
    created_at < cutoff). On immutable storage the delete is an anti-filter
    rewrite — this query is the survivor set's audit summary. With the table
    partitioned by day, the rewrite touches only expiring partitions."""
    events = load_table(spark, sf_dir, "events")
    cutoff = F.lit(NOW).cast("timestamp") - F.expr("INTERVAL 14 DAYS")
    return (
        events.filter(F.col("ts") >= cutoff)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("surviving"), F.min("ts").alias("oldest_kept"))
    )


@register(
    "q55_hydration_snapshot",
    oracle=f"""
    SELECT 'active_users' AS kind, count(DISTINCT user_id) AS n FROM events
    UNION ALL
    SELECT 'pending_updates' AS kind, count(*) AS n FROM events
    WHERE event_type = 'click' AND ts > TIMESTAMP '{NOW}' - INTERVAL 7 DAY
    """,
)
def q55_hydration_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 initial-state hydration (server.mjs:268-282 getInitialData:
    Promise.all over active connections + pending updates). Two independent
    aggregates unioned into one result; Spark runs both branches of the union
    in the same job."""
    events = load_table(spark, sf_dir, "events")
    cutoff = F.lit(NOW).cast("timestamp") - F.expr("INTERVAL 7 DAYS")
    active = events.agg(F.countDistinct("user_id").alias("n")).select(
        F.lit("active_users").alias("kind"), "n"
    )
    pending = (
        events.filter((F.col("event_type") == "click") & (F.col("ts") > cutoff))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("pending_updates").alias("kind"), "n")
    )
    return active.unionByName(pending)


@register(
    "q56_backlog_alert",
    oracle="""
    SELECT event_type, count(*) AS backlog,
           CASE WHEN count(*) > 2000 THEN 'error'
                WHEN count(*) > 1000 THEN 'warn'
                ELSE 'ok' END AS alert
    FROM events
    GROUP BY event_type
    """,
)
def q56_backlog_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/Q13 threshold alerting on aggregates (db.mjs:423-429: warn if
    pending>1000, error if errors/hour>50). Conditions are ordered
    most-specific first — CASE short-circuits, so testing >1000 before
    >2000 would make the error tier unreachable."""
    events = load_table(spark, sf_dir, "events")
    cnt = F.count(F.lit(1))
    return events.groupBy("event_type").agg(
        cnt.alias("backlog"),
        F.when(cnt > 2000, "error").when(cnt > 1000, "warn").otherwise("ok").alias("alert"),
    )


@register(
    "q51_dedup_by_id",
    oracle="""
    SELECT user_id, event_type, min(event_id) AS first_event_id, min(ts) AS first_ts
    FROM events
    GROUP BY user_id, event_type
    """,
)
def q51_dedup_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 dedup via unique constraint (db.mjs:49 UNIQUE(id); db.mjs:32
    UNIQUE(original_cell_id, slide_element_id)): keep-first-by-key expressed
    as a deterministic min-aggregate (dropDuplicates' arbitrary-survivor
    semantics are not oracle-comparable; the library's streaming form uses
    dropDuplicatesWithinWatermark)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id"),
        F.min("ts").alias("first_ts"),
    )


@register(
    "q111_snapshot_diff",
    oracle="""
    WITH ranked_new AS (
      SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ),
    ranked_old AS (
      SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts <= TIMESTAMP '2024-01-20 00:00:00'
    ),
    new_s AS (SELECT user_id, event_id AS new_event_id FROM ranked_new WHERE rn = 1),
    old_s AS (SELECT user_id, event_id AS old_event_id FROM ranked_old WHERE rn = 1)
    SELECT COALESCE(n.user_id, o.user_id) AS user_id,
           CASE WHEN o.user_id IS NULL THEN 'added'
                WHEN n.user_id IS NULL THEN 'deleted'
                WHEN n.new_event_id <> o.old_event_id THEN 'changed'
                ELSE 'unchanged' END AS change_type,
           o.old_event_id, n.new_event_id
    FROM new_s n FULL OUTER JOIN old_s o ON n.user_id = o.user_id
    WHERE NOT (n.new_event_id IS NOT NULL AND o.old_event_id IS NOT NULL
               AND n.new_event_id = o.old_event_id)
    """,
)
def q111_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (CDC over the backup pair, S7/T7 db.mjs:489-505): the
    per-user latest-state view at snapshot time T1 ('2024-01-20') compared
    against the current view — a full outer join on the entity key
    classifying every key as added / changed / deleted (free arm of the
    outer join; unreachable on this append-only log) and emitting only the
    drift. This is how two table snapshots are reconciled without replaying
    the log between them.

    Scale posture: both latest-state views are WindowGroupLimit top-1 per
    key over the SAME user_id shuffle key, and the diff join shares that
    key — one hash-partitioning serves all three operators; no broadcast
    needed because both sides are |users|, not |events|."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())

    def latest(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select("user_id", "event_id", F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") == 1)
            .select("user_id", F.col("event_id").alias(out))
        )

    new_s = latest(events, "new_event_id")
    old_s = latest(
        events.filter(F.col("ts") <= F.lit("2024-01-20 00:00:00").cast("timestamp")),
        "old_event_id",
    )
    j = new_s.join(old_s, "user_id", "full_outer")
    change = (
        F.when(F.col("old_event_id").isNull(), "added")
        .when(F.col("new_event_id").isNull(), "deleted")
        .when(F.col("new_event_id") != F.col("old_event_id"), "changed")
        .otherwise("unchanged")
    )
    return j.select("user_id", change.alias("change_type"), "old_event_id", "new_event_id").filter(
        F.col("change_type") != "unchanged"
    )


# --- q164: per-user rate-limit admission -------------------------------------

_RL_CAP = 3  # admitted events per user per hour window


@register(
    "q164_rate_limit_admission",
    oracle=f"""
    WITH ranked AS (
      SELECT event_type,
             row_number() OVER (
               PARTITION BY user_id, date_trunc('hour', ts)
               ORDER BY ts, event_id
             ) AS rk
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS total,
           CAST(sum(CASE WHEN rk <= {_RL_CAP} THEN 1 ELSE 0 END) AS BIGINT)
             AS admitted,
           CAST(sum(CASE WHEN rk > {_RL_CAP} THEN 1 ELSE 0 END) AS BIGINT)
             AS rejected,
           round(sum(CASE WHEN rk <= {_RL_CAP} THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS admit_rate
    FROM ranked
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q164_rate_limit_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-limit admission control, replayed deterministically over the
    log: each user may admit at most {_RL_CAP} events per clock-hour
    window; arrivals beyond the cap are rejected. The admission decision
    is a row_number over (user, hour) in (ts, event_id) order — event_id
    breaks timestamp ties so replay is exact — and the report aggregates
    admitted/rejected mass per event type, the throttling-fairness view a
    queue operator actually watches (reference's queue has priority
    ordering, db.mjs:285-343, but no admission control; §7 extension).

    Scale posture: one shuffle on (user_id, hour) — the natural sharding
    key of any rate limiter — with WindowGroupLimit-style early work
    bounded per partition; the per-type report re-aggregates the tiny
    labeled rows. Tumbling windows (not sliding) keep state per key O(1),
    the same trade production limiters make."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", F.date_trunc("hour", F.col("ts"))).orderBy(
        "ts", "event_id"
    )
    ranked = events.select(
        "event_type", F.row_number().over(w).alias("rk")
    )
    admitted = (F.col("rk") <= _RL_CAP).cast("int")
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("total"),
            F.sum(admitted).cast("bigint").alias("admitted"),
            F.sum(1 - admitted).cast("bigint").alias("rejected"),
            F.round(F.sum(admitted) / F.count(F.lit(1)), 4).alias("admit_rate"),
        )
        .orderBy("event_type")
    )


# --- q185: temporal burst detection ------------------------------------------

_BURST_SIGMA = 1.4826
_BURST_Z = 3.0


@register(
    "q185_event_bursts",
    oracle=f"""
    WITH buckets AS (
      SELECT event_type, date_trunc('hour', ts) AS hour_start,
             CAST(count(*) AS BIGINT) AS n
      FROM events
      GROUP BY event_type, date_trunc('hour', ts)
    ),
    med AS (
      SELECT *, median(n) OVER (PARTITION BY event_type) AS med
      FROM buckets
    ),
    dev AS (
      SELECT *, median(abs(n - med)) OVER (PARTITION BY event_type) AS mad
      FROM med
    )
    SELECT event_type, hour_start, n,
           round(med, 4) AS med,
           round(mad, 4) AS mad,
           round((n - med) / ({_BURST_SIGMA} * nullif(mad, 0)), 4) AS robust_z
    FROM dev
    WHERE (n - med) / ({_BURST_SIGMA} * nullif(mad, 0)) > {_BURST_Z}
    ORDER BY event_type, hour_start
    """,
)
def q185_event_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal burst detection: hour-bucketed arrival counts per event
    type, flagged where the count exceeds the type's own median by
    {_BURST_Z} robust sigmas (median/MAD across that type's hour buckets
    — q165's estimator applied along TIME). Scraper storms, replay
    floods, and upstream retries all show up as count bursts long before
    they show up in value distributions; the robust location/scale means
    the flood itself doesn't mask the detection (the failure mode of
    mean/stddev burst alarms). One-sided: only positive spikes alert —
    an idle hour is not an incident.

    Scale posture: the hour rollup is the only corpus-sized aggregation
    (keyed by (type, hour), the natural telemetry partitioning); the two
    window-attached medians and the final filter run over |types x
    hours| bucket rows sharing one event_type exchange."""
    events = load_table(spark, sf_dir, "events")
    buckets = (
        events.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_start")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = Window.partitionBy("event_type")
    med = buckets.withColumn("med", F.expr("percentile(n, 0.5)").over(w))
    dev = med.withColumn("mad", F.expr("percentile(abs(n - med), 0.5)").over(w))
    # MAD == 0 is legal (over half the buckets at the median — plausible for
    # integer hour counts). nullif pins the degenerate-scale case to NULL in
    # BOTH engines (NULL > z filters the row), instead of Spark ANSI
    # DIVIDE_BY_ZERO vs DuckDB IEEE inf diverging data-dependently.
    rz = (F.col("n") - F.col("med")) / (_BURST_SIGMA * F.nullif(F.col("mad"), F.lit(0)))
    return (
        dev.filter(rz > _BURST_Z)
        .select(
            "event_type",
            "hour_start",
            "n",
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            F.round(rz, 4).alias("robust_z"),
        )
        .orderBy("event_type", "hour_start")
    )


# --- q198: inter-arrival gap census -------------------------------------------


@register(
    "q198_interarrival_stats",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             epoch_ms(ts) - lag(epoch_ms(ts))
               OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap_ms
      FROM events
    )
    SELECT event_type,
           CAST(count(gap_ms) AS BIGINT) AS n_gaps,
           round(quantile_cont(gap_ms, 0.5), 4) AS median_gap_ms,
           round(quantile_cont(gap_ms, 0.95), 4) AS p95_gap_ms,
           CAST(max(gap_ms) AS BIGINT) AS max_gap_ms,
           round(avg(gap_ms), 4) AS mean_gap_ms,
           round(stddev_pop(gap_ms) / nullif(avg(gap_ms), 0), 4) AS cv
    FROM gaps
    WHERE gap_ms IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q198_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap census per event type: median/p95/max gap plus the
    coefficient of variation — the rate-stability audit beside q185's burst
    alarm (bursts flag WHEN arrivals spiked; this characterizes the arrival
    process itself: CV ~= 1 is Poisson-like, >> 1 is bursty/clumped, << 1 is
    metronomic — a scheduled scraper pretending to be organic traffic).
    Consecutive-gap multiset is order-stable under timestamp ties (equal
    values sit adjacent regardless of tiebreak), so both engines derive
    identical statistics. nullif guards the all-simultaneous degenerate
    case (mean gap 0) identically in both engines.

    Scale posture: one window pass partitioned by event_type (the natural
    telemetry key; a type's rows sort within its partition — the cost any
    per-stream gap analysis pays), then a bounded |types| aggregation."""
    events = load_table(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts"))
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = events.select(
        "event_type", (ms - F.lag(ms).over(w)).alias("gap_ms")
    ).filter(F.col("gap_ms").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("gap_ms").cast("bigint").alias("n_gaps"),
            F.round(F.expr("percentile(gap_ms, 0.5)"), 4).alias("median_gap_ms"),
            F.round(F.expr("percentile(gap_ms, 0.95)"), 4).alias("p95_gap_ms"),
            F.max("gap_ms").cast("bigint").alias("max_gap_ms"),
            F.round(F.avg("gap_ms"), 4).alias("mean_gap_ms"),
            F.round(
                F.stddev_pop("gap_ms") / F.nullif(F.avg("gap_ms"), F.lit(0)), 4
            ).alias("cv"),
        )
        .orderBy("event_type")
    )


# --- q208: watermark-lag audit --------------------------------------------------


@register(
    "q208_watermark_lag_audit",
    oracle="""
    WITH arr AS (
      SELECT event_type,
             greatest(max(epoch_ms(ts))
                        OVER (ORDER BY event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      - epoch_ms(ts), 0) AS lag_ms
      FROM events
    ),
    lagged AS (SELECT * FROM arr WHERE lag_ms IS NOT NULL)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN lag_ms > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_out_of_order,
           round(quantile_cont(lag_ms, 0.95), 4) AS p95_lag_ms,
           round(quantile_cont(lag_ms, 0.99), 4) AS p99_lag_ms,
           CAST(max(lag_ms) AS BIGINT) AS max_lag_ms,
           CAST(sum(CASE WHEN lag_ms > 3600000 THEN 1 ELSE 0 END) AS BIGINT)
             AS dropped_at_1h
    FROM lagged
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q208_watermark_lag_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-delay calibration: replay the stream in ARRIVAL order
    (event_id is the ingest sequence) and measure each event's lag behind
    the running event-time high-water mark — exactly the quantity a
    Structured Streaming watermark trades off (delay too short: late rows
    silently dropped; too long: state lingers). Reports per type the
    out-of-order share, p95/p99/max lag, and how many rows a 1-hour
    watermark (the q57/q147 streaming default) would actually drop. The
    first-arriving row has no preceding mark: both engines' greatest()
    skips the NULL running max, so it scores lag_ms = 0 and counts toward
    n_events (the isNotNull filter mirrors the oracle's shape and is
    vacuous by the same NULL-skipping — documented, not semantic).

    Scale posture: the running max is a TWO-LEVEL prefix max (the q107
    packing discipline), never an unpartitioned window over the corpus:
    events are range-bucketed into 256 order-preserving chunks of the
    event_id span (bounds from a 1-row min/max scalar, the q196 pattern),
    the within-chunk running max is a window PARTITIONED by chunk
    (parallel), per-chunk maxima reduce to a 256-row head table whose own
    running max is the only unpartitioned window (bounded by construction,
    allowlisted in plans.UNPARTITIONED_WINDOW_ALLOWLIST), and
    greatest(prior-chunk max, within-chunk running max) reassembles the
    exact global prefix — the oracle computes the same mark with one flat
    window, proving the decomposition. Everything downstream is a bounded
    |types| aggregation."""
    events = load_table(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts"))
    bounds = events.agg(
        F.min("event_id").alias("lo"), F.max("event_id").alias("hi")
    )
    span = F.col("hi") - F.col("lo") + 1
    bucket = F.floor((F.col("event_id") - F.col("lo")) * 256 / span)
    t = events.crossJoin(F.broadcast(bounds)).select(
        "event_id", "event_type", bucket.alias("bucket"), ms.alias("ms")
    )
    w_local = (
        Window.partitionBy("bucket")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = t.withColumn("local_prev_max", F.max("ms").over(w_local))
    heads = t.groupBy("bucket").agg(F.max("ms").alias("bucket_max"))
    w_head = (
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    )  # 256 rows — bounded by construction
    offsets = heads.select(
        "bucket", F.max("bucket_max").over(w_head).alias("prior_max")
    )
    prev_mark = F.greatest("prior_max", "local_prev_max")  # skips NULLs
    arr = (
        local.join(F.broadcast(offsets), "bucket")
        .select(
            "event_type",
            F.greatest(prev_mark - F.col("ms"), F.lit(0)).alias("lag_ms"),
        )
        .filter(F.col("lag_ms").isNotNull())
    )
    return (
        arr.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum((F.col("lag_ms") > 0).cast("int")).cast("bigint").alias("n_out_of_order"),
            F.round(F.expr("percentile(lag_ms, 0.95)"), 4).alias("p95_lag_ms"),
            F.round(F.expr("percentile(lag_ms, 0.99)"), 4).alias("p99_lag_ms"),
            F.max("lag_ms").cast("bigint").alias("max_lag_ms"),
            F.sum((F.col("lag_ms") > 3600000).cast("int")).cast("bigint").alias(
                "dropped_at_1h"
            ),
        )
        .orderBy("event_type")
    )


# --- q238: FDR-controlled drift alarms (Benjamini-Hochberg) --------------------

# Early/late split point for the drift contrast (events span 2024-01; the
# fixed literal keeps both engines on the same rows, the NOW discipline).
_BH_SPLIT = "2024-01-16 00:00:00"
_BH_BUCKETS = 64
_BH_ALPHA = 0.05

# Abramowitz & Stegun 26.2.17 polynomial for the standard-normal tail
# (public): Q(z) = phi(z) * (b1 t + ... + b5 t^5), t = 1/(1 + 0.2316419 z).
# Both engines evaluate this identical closed form, so p-values hash-match.
_AS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)


def _normal_two_sided_p_sql(z: str) -> str:
    """DuckDB expression: two-sided normal p-value for z-expression `z`."""
    t = f"(1.0 / (1.0 + 0.2316419 * abs({z})))"
    poly = (
        f"({_AS_B[0]} * {t} + {_AS_B[1]} * pow({t}, 2) + {_AS_B[2]} * pow({t}, 3)"
        f" + {_AS_B[3]} * pow({t}, 4) + {_AS_B[4]} * pow({t}, 5))"
    )
    return (
        f"(2.0 * (exp(-0.5 * {z} * {z}) / sqrt(2.0 * pi())) * {poly})"
    )


@register(
    "q238_fdr_drift_control",
    oracle=f"""
    WITH e AS (
      SELECT user_id % {_BH_BUCKETS} AS bucket,
             CASE WHEN ts < TIMESTAMP '{_BH_SPLIT}' THEN 1 ELSE 0 END AS early,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS err
      FROM events
    ),
    per AS (
      SELECT bucket,
             CAST(sum(early) AS DOUBLE) AS n1,
             CAST(sum(early * err) AS DOUBLE) AS x1,
             CAST(sum(1 - early) AS DOUBLE) AS n2,
             CAST(sum((1 - early) * err) AS DOUBLE) AS x2
      FROM e GROUP BY bucket
    ),
    zt AS (
      SELECT bucket, n1, x1, n2, x2,
             (x1 / n1 - x2 / n2)
             / nullif(sqrt(((x1 + x2) / (n1 + n2)) * (1.0 - (x1 + x2) / (n1 + n2))
                           * (1.0 / n1 + 1.0 / n2)), 0) AS z
      FROM per
    ),
    pv AS (
      SELECT bucket, n1, x1, n2, x2, z,
             round({_normal_two_sided_p_sql("z")}, 10) AS p
      FROM zt
    ),
    rk AS (
      SELECT *, row_number() OVER (ORDER BY p NULLS LAST, bucket) AS i,
             CAST(count(*) OVER () AS DOUBLE) AS m
      FROM pv
    ),
    bh AS (
      SELECT *, max(CASE WHEN p <= {_BH_ALPHA} * i / m THEN i END) OVER () AS kstar
      FROM rk
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(i AS BIGINT) AS rk,
           CAST(n1 AS BIGINT) AS n_early, CAST(x1 AS BIGINT) AS err_early,
           CAST(n2 AS BIGINT) AS n_late, CAST(x2 AS BIGINT) AS err_late,
           round(z, 4) AS z,
           round(p, 8) AS p,
           COALESCE(i <= kstar, FALSE) AS bh_rejected,
           p <= {_BH_ALPHA} AS naive_rejected
    FROM bh
    ORDER BY rk
    """,
)
def q238_fdr_drift_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple-testing discipline for a drift-monitor wall: {_BH_BUCKETS}
    parallel two-proportion z-tests (error rate early-January vs late,
    one per user-hash bucket) with Benjamini-Hochberg FDR control at
    alpha={_BH_ALPHA} — the correction that keeps a dashboard of dozens of
    per-segment alarms from paging on 5% of healthy segments every night
    (q174/q196 test ONE hypothesis; this is the m-hypotheses form).
    Emits both the BH decision and the naive per-test decision so the
    audit shows exactly which alarms the correction suppressed.

    Determinism: counts are exact integer sums; z and the A&S 26.2.17
    normal-tail polynomial are identical closed forms in both engines;
    p is rounded at 1e-10 BEFORE the BH rank with bucket as the total
    tie-break, so the step-up ordering matches bit-for-bit.

    Scale posture: one corpus-scan partial-agg to {_BH_BUCKETS} rows;
    every window after it runs on the fixed {_BH_BUCKETS}-row hypothesis
    frame (allowlisted bound). At 100x the only thing that grows is the
    map-side scan."""
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        (F.col("user_id") % _BH_BUCKETS).alias("bucket"),
        F.when(F.col("ts") < F.lit(_BH_SPLIT).cast("timestamp"), 1)
        .otherwise(0)
        .alias("early"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("err"),
    )
    per = e.groupBy("bucket").agg(
        F.sum("early").cast("double").alias("n1"),
        F.sum(F.col("early") * F.col("err")).cast("double").alias("x1"),
        F.sum(1 - F.col("early")).cast("double").alias("n2"),
        F.sum((1 - F.col("early")) * F.col("err")).cast("double").alias("x2"),
    )
    pool = (F.col("x1") + F.col("x2")) / (F.col("n1") + F.col("n2"))
    se = F.sqrt(
        pool * (1.0 - pool) * (1.0 / F.col("n1") + 1.0 / F.col("n2"))
    )
    z = (F.col("x1") / F.col("n1") - F.col("x2") / F.col("n2")) / F.nullif(
        se, F.lit(0.0)
    )
    t = 1.0 / (1.0 + 0.2316419 * F.abs(F.col("z")))
    poly = (
        _AS_B[0] * t
        + _AS_B[1] * F.pow(t, 2)
        + _AS_B[2] * F.pow(t, 3)
        + _AS_B[3] * F.pow(t, 4)
        + _AS_B[4] * F.pow(t, 5)
    )
    p = 2.0 * (
        F.exp(-0.5 * F.col("z") * F.col("z")) / F.sqrt(F.lit(2.0) * F.lit(math.pi))
    ) * poly
    pv = per.withColumn("z", z).withColumn("p", F.round(p, 10))
    # NULLS LAST explicitly in BOTH engines: a degenerate bucket (n1 or n2 = 0,
    # or pooled rate 0/1 -> se = 0 -> z/p NULL) would otherwise rank FIRST in
    # Spark and LAST in DuckDB, shifting every row_number and the BH kstar.
    wrank = Window.orderBy(F.col("p").asc_nulls_last(), F.col("bucket").asc())
    wall = Window.partitionBy()  # the fixed 64-row hypothesis frame
    rk = pv.withColumn("i", F.row_number().over(wrank)).withColumn(
        "m", F.count(F.lit(1)).over(wall).cast("double")
    )
    bh = rk.withColumn(
        "kstar",
        F.max(
            F.when(
                F.col("p") <= _BH_ALPHA * F.col("i") / F.col("m"), F.col("i")
            )
        ).over(wall),
    )
    return bh.select(
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("i").cast("bigint").alias("rk"),
        F.col("n1").cast("bigint").alias("n_early"),
        F.col("x1").cast("bigint").alias("err_early"),
        F.col("n2").cast("bigint").alias("n_late"),
        F.col("x2").cast("bigint").alias("err_late"),
        F.round("z", 4).alias("z"),
        F.round("p", 8).alias("p"),
        F.coalesce(F.col("i") <= F.col("kstar"), F.lit(False)).alias(
            "bh_rejected"
        ),
        (F.col("p") <= _BH_ALPHA).alias("naive_rejected"),
    ).orderBy("rk")


# --- q250: sequential probability ratio monitor (SPRT) -------------------------

_SPRT_BASELINE_END = "2024-01-08 00:00:00"  # week-1 baseline window
_SPRT_LIFT = 1.5                            # H1: error rate = 1.5 x baseline
_SPRT_UPPER = 2.772589                      # ln((1-beta)/alpha), alpha=.05, beta=.2
_SPRT_LOWER = -1.558145                     # ln(beta/(1-alpha))
_SPRT_BUCKETS = 16


@register(
    "q250_sprt_monitor",
    oracle=f"""
    WITH e AS (
      SELECT user_id % {_SPRT_BUCKETS} AS bucket,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             ts < TIMESTAMP '{_SPRT_BASELINE_END}' AS base,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS err
      FROM events
    ),
    p0t AS (
      SELECT CAST(sum(err) AS DOUBLE) / count(*) AS p0 FROM e WHERE base
    ),
    daily AS (
      SELECT bucket, day,
             CAST(count(*) AS BIGINT) AS n_d,
             CAST(sum(err) AS BIGINT) AS x_d
      FROM e WHERE NOT base GROUP BY bucket, day
    ),
    walk AS (
      SELECT bucket, day, p0,
             sum(x_d * ln(({_SPRT_LIFT} * p0) / p0)
                 + (n_d - x_d) * ln((1.0 - {_SPRT_LIFT} * p0) / (1.0 - p0)))
               OVER (PARTITION BY bucket ORDER BY day) AS llr
      FROM daily, p0t
    ),
    crossings AS (
      SELECT bucket,
             min(CASE WHEN llr >= {_SPRT_UPPER} OR llr <= {_SPRT_LOWER}
                      THEN day END) AS crossing_day
      FROM walk GROUP BY bucket
    ),
    final AS (
      SELECT bucket, max(day) AS last_day FROM walk GROUP BY bucket
    )
    SELECT w.bucket AS bucket,
           round(w.p0, 6) AS baseline_p0,
           c.crossing_day,
           CASE WHEN c.crossing_day IS NULL THEN 'continue'
                WHEN cw.llr >= {_SPRT_UPPER} THEN 'reject_h0'
                ELSE 'accept_h0' END AS decision,
           round(fw.llr, 4) AS final_llr
    FROM crossings c
    JOIN final f ON c.bucket = f.bucket
    JOIN walk fw ON fw.bucket = c.bucket AND fw.day = f.last_day
    LEFT JOIN walk cw ON cw.bucket = c.bucket AND cw.day = c.crossing_day
    JOIN (SELECT DISTINCT bucket, p0 FROM walk) w ON w.bucket = c.bucket
    ORDER BY bucket
    """,
)
def q250_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test as a fleet monitor: per
    user-bucket, a cumulative log-likelihood random walk of the DAILY
    error counts against H0 (the week-1 baseline rate) vs H1 (a
    {_SPRT_LIFT}x lift), with the classic (alpha=.05, beta=.2) decision
    boundaries — the test that lets a monitor STOP EARLY the day the
    evidence crosses a boundary instead of waiting for the month-end
    batch test (Wald 1945; the sequential companion to q238's fixed-
    horizon BH wall and q187's distribution-free CUSUM: SPRT is the
    likelihood-optimal version when the alternative is a known lift).

    Determinism: daily counts are exact ints; the per-day LLR increments
    are identical closed forms; the cumulative walk orders by the day
    grid; crossing day is a min over exact comparisons; emitted floats
    rounded at the shown grain.

    Scale posture: one map-side partial agg to |buckets| x 31 daily
    rows (calendar-bounded); the walk window partitions by bucket over
    that bounded frame; crossing/final joins are bucket-keyed on the
    same tiny frame. Only the scan grows at 100x."""
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        (F.col("user_id") % _SPRT_BUCKETS).alias("bucket"),
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        (F.col("ts") < F.lit(_SPRT_BASELINE_END).cast("timestamp")).alias(
            "base"
        ),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("err"),
    )
    p0t = e.filter("base").agg(
        (F.sum("err").cast("double") / F.count(F.lit(1))).alias("p0")
    )
    daily = (
        e.filter(~F.col("base"))
        .groupBy("bucket", "day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_d"),
            F.sum("err").cast("bigint").alias("x_d"),
        )
    )
    w = Window.partitionBy("bucket").orderBy("day")
    inc = F.col("x_d") * F.log(
        (F.lit(_SPRT_LIFT) * F.col("p0")) / F.col("p0")
    ) + (F.col("n_d") - F.col("x_d")) * F.log(
        (1.0 - F.lit(_SPRT_LIFT) * F.col("p0")) / (1.0 - F.col("p0"))
    )
    walk = daily.crossJoin(F.broadcast(p0t)).select(
        "bucket", "day", "p0", F.sum(inc).over(w).alias("llr")
    )
    crossed = F.when(
        (F.col("llr") >= _SPRT_UPPER) | (F.col("llr") <= _SPRT_LOWER),
        F.col("day"),
    )
    per_bucket = walk.groupBy("bucket").agg(
        F.min(crossed).alias("crossing_day"),
        F.max(F.struct("day", "llr")).alias("last"),
        F.first("p0").alias("p0"),
    )
    cw = walk.select(
        F.col("bucket").alias("cb"),
        F.col("day").alias("cd"),
        F.col("llr").alias("cllr"),
    )
    return (
        per_bucket.join(
            cw,
            (F.col("bucket") == F.col("cb"))
            & (F.col("crossing_day") == F.col("cd")),
            "left",
        )
        .select(
            "bucket",
            F.round("p0", 6).alias("baseline_p0"),
            "crossing_day",
            F.when(F.col("crossing_day").isNull(), "continue")
            .when(F.col("cllr") >= _SPRT_UPPER, "reject_h0")
            .otherwise("accept_h0")
            .alias("decision"),
            F.round(F.col("last.llr"), 4).alias("final_llr"),
        )
        .orderBy("bucket")
    )


# --- q266: EWMA control chart over the daily error rate ------------------------

_EWMA_LAMBDA = 0.2     # smoothing weight (Roberts 1959 / Hunter 1986 default)
_EWMA_L = 3.0          # control-limit width in asymptotic sigmas


@register(
    "q266_ewma_control_chart",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)
               AS n_err
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT day, n, n_err,
             CAST(n_err AS DOUBLE) / n AS x,
             CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) AS i
      FROM daily
    ),
    base AS (
      SELECT avg(x) AS mu, stddev_samp(x) AS sigma FROM idx
    ),
    walk AS (
      SELECT day, n, n_err, x, i, mu, sigma,
             {_EWMA_LAMBDA} * pow(1.0 - {_EWMA_LAMBDA}, i)
               * sum(x * pow(1.0 - {_EWMA_LAMBDA}, -i)) OVER (ORDER BY i)
             + pow(1.0 - {_EWMA_LAMBDA}, i + 1) * mu AS z,
             {_EWMA_L} * sigma
               * sqrt({_EWMA_LAMBDA} / (2.0 - {_EWMA_LAMBDA})
                      * (1.0 - pow(1.0 - {_EWMA_LAMBDA}, 2 * (i + 1)))) AS hw
      FROM idx, base
    )
    SELECT day, n, n_err, round(x, 6) AS x, round(z, 6) AS z,
           round(mu + hw, 6) AS ucl, round(mu - hw, 6) AS lcl,
           (z > mu + hw OR z < mu - hw) AS breach
    FROM walk ORDER BY day
    """,
)
def q266_ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart (Roberts 1959) over the daily error rate: the
    small-persistent-shift monitor that completes the drift-detection
    family — CUSUM (q187) detects by cumulative excess, SPRT (q250) by
    sequential likelihood, BH-FDR (q238) by cross-sectional multiplicity;
    EWMA weights recent days geometrically (lambda=0.2) and alarms when
    the smoothed walk exits time-varying 3-sigma limits that widen toward
    their asymptote as the memory fills.

    The recursion z_i = lambda*x_i + (1-lambda)*z_(i-1), z_(-1) = mu is
    evaluated in CLOSED FORM as a running weighted sum —
    z_i = lambda*(1-lambda)^i * sum_j<=i x_j*(1-lambda)^(-j)
          + (1-lambda)^(i+1)*mu
    — so both engines compute an identical window expression, no
    sequential state; (1-lambda)^(-i) stays bounded (0.8^-31 ~ 1e3) over
    the retention window's day count, and a raise_error guard enforces
    the 128-day precision horizon the closed form depends on. Exact
    limits with the
    (1-(1-lambda)^(2(i+1))) start-up factor, not the asymptote (Hunter
    1986), so early days don't over-alarm.

    Scale posture: one corpus-scan HashAggregate to |days| rows; every
    window after it runs on that bounded day frame (allowlisted: days of
    retention, ~31 here). The 1-row (mu, sigma) baseline cross-joins in
    broadcast-style. At 100x only the map-side scan grows."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("event_type") == "error").cast("bigint")).alias("n_err"),
        )
    )
    idx = daily.select(
        "day",
        "n",
        "n_err",
        (F.col("n_err").cast("double") / F.col("n")).alias("x"),
        (F.row_number().over(Window.orderBy("day")) - 1).cast("bigint").alias("i"),
    )
    base = idx.agg(
        F.avg("x").alias("mu"), F.stddev_samp("x").alias("sigma")
    )
    lam, r = _EWMA_LAMBDA, 1.0 - _EWMA_LAMBDA
    # The closed form weights term j by (1-lambda)^(-j), which grows
    # geometrically: past ~128 days the earliest and latest terms differ
    # by > 2^41 and the sum starts shedding mantissa bits silently (by
    # ~160 days, all of them). The day frame is retention-bounded (~31
    # rows), but nothing upstream enforces that — so enforce the
    # precision horizon here: a day index past it raises at evaluation
    # time instead of emitting a subtly wrong z. (The unconditionally
    # stable alternative is the sequential aggregate() fold q283/q294
    # use; this query keeps the closed form for oracle symmetry.)
    i_safe = F.when(F.col("i") < F.lit(128), F.col("i")).otherwise(
        F.raise_error(
            F.lit(
                "q266: day frame exceeds the 128-day EWMA closed-form "
                "precision bound; switch to the sequential fold (q283)"
            )
        )
    )
    wsum = F.sum(F.col("x") * F.pow(F.lit(r), -i_safe)).over(
        Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    )
    z = (
        F.lit(lam) * F.pow(F.lit(r), F.col("i")) * wsum
        + F.pow(F.lit(r), F.col("i") + 1) * F.col("mu")
    )
    hw = (
        F.lit(_EWMA_L)
        * F.col("sigma")
        * F.sqrt(
            F.lit(lam / (2.0 - lam))
            * (F.lit(1.0) - F.pow(F.lit(r), 2 * (F.col("i") + 1)))
        )
    )
    return (
        idx.join(F.broadcast(base))
        .withColumn("z_raw", z)
        .withColumn("hw", hw)
        .select(
            "day",
            "n",
            "n_err",
            F.round("x", 6).alias("x"),
            F.round("z_raw", 6).alias("z"),
            F.round(F.col("mu") + F.col("hw"), 6).alias("ucl"),
            F.round(F.col("mu") - F.col("hw"), 6).alias("lcl"),
            (
                (F.col("z_raw") > F.col("mu") + F.col("hw"))
                | (F.col("z_raw") < F.col("mu") - F.col("hw"))
            ).alias("breach"),
        )
        .orderBy("day")
    )


# --- q268: Mann-Whitney U (rank-sum) drift test per event type -----------------


@register(
    "q268_mann_whitney_drift",
    oracle=f"""
    WITH s AS (
      SELECT event_type, round(value, 2) AS v,
             CASE WHEN ts < TIMESTAMP '{_BH_SPLIT}' THEN 1 ELSE 0 END AS early
      FROM events WHERE value IS NOT NULL
    ),
    cen AS (
      SELECT event_type, v,
             CAST(sum(early) AS BIGINT) AS ne,
             CAST(sum(1 - early) AS BIGINT) AS nl,
             CAST(count(*) AS BIGINT) AS n
      FROM s GROUP BY 1, 2
    ),
    rk AS (
      SELECT *,
             2 * coalesce(sum(n) OVER (PARTITION BY event_type ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + n + 1 AS avg_rank_x2
      FROM cen
    ),
    agg AS (
      SELECT event_type,
             CAST(sum(ne) AS BIGINT) AS n1, CAST(sum(nl) AS BIGINT) AS n2,
             CAST(sum(ne * avg_rank_x2) AS BIGINT) AS r1_x2,
             sum(CAST(n AS DOUBLE) * n * n - n) AS tieterm
      FROM rk GROUP BY event_type
    ),
    zt AS (
      SELECT event_type, n1, n2,
             (r1_x2 - n1 * (n1 + 1)) / 2.0 AS u1,
             CAST(r1_x2 - n1 * (n1 + 1) - n1 * n2 AS DOUBLE) / 2.0
               / nullif(sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                             * ((n1 + n2 + 1.0)
                                - tieterm / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1.0)))),
                        0) AS z
      FROM agg
    )
    SELECT event_type,
           CAST(n1 AS BIGINT) AS n_early, CAST(n2 AS BIGINT) AS n_late,
           round(u1, 1) AS u1, round(z, 4) AS z,
           round({_normal_two_sided_p_sql("z")}, 8) AS p,
           {_normal_two_sided_p_sql("z")} <= 0.05 AS drift
    FROM zt ORDER BY event_type
    """,
)
def q268_mann_whitney_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) early-vs-late drift test on the
    event VALUE distribution per type — the NONPARAMETRIC leg of the drift
    family: Welch t (q174) assumes means matter, chi2 (q196) needs
    categories, PSI/Wasserstein (q180/q245) report magnitude without a
    test; the rank-sum test detects any location shift with no
    distributional assumption, tie-corrected normal approximation for the
    p-value (A&S 26.2.17 polynomial, the q238 kernel).

    Average ranks come from the value CODOMAIN census (values rounded to
    2 decimals -> <= 49k distinct per type regardless of corpus size, the
    q144 bounded-codomain discipline). Rank-sum arithmetic is PURE
    INTEGER until the final statistic: doubled average ranks
    (2*cum_before + n + 1) and the doubled rank sum r1_x2 are BIGINT
    sums — exact and summation-order-immune up to 2^63 (N per type
    ~ 3e9), not 2^53 — and the z numerator is an integer difference cast
    to double once. The only doubles are the tie term (feeds sigma,
    needs no exactness) and the final ratio, identical closed forms in
    both engines. Spark runs ANSI mode, so a genuinely overflowing
    census (N^2 > 2^63) fails loudly rather than wrapping.

    Scale posture: one corpus-scan HashAggregate to the (type, value)
    census; the rank window is PARTITIONED by type over the bounded
    codomain frame; the test statistic is a |types|-row aggregate. At
    100x only the map-side scan grows."""
    events = load_table(spark, sf_dir, "events")
    s = events.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.round("value", 2).alias("v"),
        F.when(F.col("ts") < F.lit(_BH_SPLIT).cast("timestamp"), 1)
        .otherwise(0)
        .alias("early"),
    )
    cen = s.groupBy("event_type", "v").agg(
        F.sum("early").cast("bigint").alias("ne"),
        F.sum(1 - F.col("early")).cast("bigint").alias("nl"),
        F.count(F.lit(1)).alias("n"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rk = cen.withColumn(
        "avg_rank_x2",
        2 * F.coalesce(F.sum("n").over(w), F.lit(0)) + F.col("n") + 1,
    )
    agg = rk.groupBy("event_type").agg(
        F.sum("ne").alias("n1"),
        F.sum("nl").alias("n2"),
        F.sum(F.col("ne") * F.col("avg_rank_x2")).alias("r1_x2"),
        F.sum(
            F.col("n").cast("double") * F.col("n") * F.col("n") - F.col("n")
        ).alias("tieterm"),
    )
    u1 = (F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)) / 2.0
    nn = F.col("n1") + F.col("n2")
    sigma = F.sqrt(
        F.col("n1").cast("double") * F.col("n2") / 12.0
        * ((nn + 1.0) - F.col("tieterm") / (nn.cast("double") * (nn - 1.0)))
    )
    z = (
        (
            F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1) - F.col("n1") * F.col("n2")
        ).cast("double")
        / 2.0
    ) / F.nullif(sigma, F.lit(0.0))
    t = 1.0 / (1.0 + 0.2316419 * F.abs(F.col("z")))
    poly = (
        _AS_B[0] * t
        + _AS_B[1] * F.pow(t, 2)
        + _AS_B[2] * F.pow(t, 3)
        + _AS_B[3] * F.pow(t, 4)
        + _AS_B[4] * F.pow(t, 5)
    )
    p = 2.0 * (
        F.exp(-0.5 * F.col("z") * F.col("z"))
        / F.sqrt(F.lit(2.0) * F.lit(math.pi))
    ) * poly
    return (
        agg.withColumn("u1", u1)
        .withColumn("z", z)
        .select(
            "event_type",
            F.col("n1").cast("bigint").alias("n_early"),
            F.col("n2").cast("bigint").alias("n_late"),
            F.round("u1", 1).alias("u1"),
            F.round("z", 4).alias("z"),
            F.round(p, 8).alias("p"),
            (p <= 0.05).alias("drift"),
        )
        .orderBy("event_type")
    )


# --- q324: O'Brien-Fleming group-sequential monitor -----------------------------

_GST_BASELINE_END = "2024-01-08 00:00:00"  # week-1 baseline (q250's window)
# OBF shape constant: the z-boundary at information fraction f is C/sqrt(f),
# with C chosen for overall two-sided alpha ~= 0.05 at daily looks over the
# monitoring window (Lan-DeMets OBF spending; C = 2.2414 is the tabulated
# value in that regime and is pinned as a constant — it is a DESIGN input,
# not a data-derived quantity).
_GST_C = 2.2414


@register(
    "q324_obrien_fleming_monitor",
    oracle=f"""
    WITH e AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             ts < TIMESTAMP '{_GST_BASELINE_END}' AS base,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS err
      FROM events
    ),
    p0t AS (
      SELECT CAST(sum(err) AS DOUBLE) / count(*) AS p0 FROM e WHERE base
    ),
    daily AS (
      SELECT day, CAST(count(*) AS BIGINT) AS n_d, CAST(sum(err) AS BIGINT) AS x_d
      FROM e WHERE NOT base GROUP BY day
    ),
    cum AS (
      SELECT day, n_d, x_d,
             CAST(sum(n_d) OVER w AS BIGINT) AS n_t,
             CAST(sum(x_d) OVER w AS BIGINT) AS x_t,
             CAST(sum(n_d) OVER () AS BIGINT) AS n_total
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           n_t AS cum_n, x_t AS cum_errors,
           round(CAST(n_t AS DOUBLE) / n_total, 6) AS info_frac,
           round((x_t - n_t * p0) / sqrt(n_t * p0 * (1.0 - p0)), 6) AS z,
           round({_GST_C} / sqrt(CAST(n_t AS DOUBLE) / n_total), 6) AS boundary,
           abs((x_t - n_t * p0) / sqrt(n_t * p0 * (1.0 - p0)))
             > {_GST_C} / sqrt(CAST(n_t AS DOUBLE) / n_total) AS crossed
    FROM cum, p0t
    ORDER BY day
    """,
)
def q324_obrien_fleming_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O'Brien-Fleming group-sequential monitor (Lan & DeMets 1983): the
    daily error rate tested against the week-1 baseline with the OBF
    spending boundary C/sqrt(information fraction) — extremely conservative
    early (a day-2 blip must be enormous to stop) and converging to the
    fixed-horizon critical value at full information, which is exactly the
    operating characteristic a release monitor wants. Completes the
    sequential-decision family: CUSUM (q187) is distribution-free
    detection, SPRT (q250) is likelihood-optimal for a KNOWN lift, EWMA
    (q266) is a smoothed control chart; GST is the fixed-alpha early-STOP
    rule when looks are scheduled (the clinical-trials standard applied to
    canary analysis).

    Determinism: daily and cumulative counts are exact ints (the running
    window orders by the day grid); z and the boundary are identical
    closed forms of those ints and the 1-row baseline; the crossing flag
    compares the same two doubles in both engines.

    Scale posture: one map-side partial agg to the |days| daily frame;
    the cumulative window runs over that bounded frame (allowlisted); the
    baseline is a 1-row broadcast scalar. Only the scan grows at 100x."""
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        (F.col("ts") < F.lit(_GST_BASELINE_END).cast("timestamp")).alias("base"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("err"),
    )
    p0t = e.filter("base").agg(
        (F.sum("err").cast("double") / F.count(F.lit(1))).alias("p0")
    )
    daily = (
        e.filter(~F.col("base"))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_d"),
            F.sum("err").cast("bigint").alias("x_d"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = daily.select(
        "day",
        F.sum("n_d").over(w).cast("bigint").alias("n_t"),
        F.sum("x_d").over(w).cast("bigint").alias("x_t"),
        F.sum("n_d").over(wall).cast("bigint").alias("n_total"),
    )
    z = (F.col("x_t") - F.col("n_t") * F.col("p0")) / F.sqrt(
        F.col("n_t") * F.col("p0") * (1.0 - F.col("p0"))
    )
    info = F.col("n_t").cast("double") / F.col("n_total")
    bound = F.lit(_GST_C) / F.sqrt(info)
    return (
        cum.crossJoin(F.broadcast(p0t))
        .select(
            "day",
            F.col("n_t").alias("cum_n"),
            F.col("x_t").alias("cum_errors"),
            F.round(info, 6).alias("info_frac"),
            F.round(z, 6).alias("z"),
            F.round(bound, 6).alias("boundary"),
            (F.abs(z) > bound).alias("crossed"),
        )
        .orderBy("day")
    )
