"""Event-stream behavioral analytics: sessionization, funnels, cohorts.

The reference's queue protocol is ingest-time event processing over a
polling loop (SURVEY §2.9); these are the standard batch analytics a real
event stream grows into — gap-based sessionization (the reference's
"adaptive poll cadence" Q10 is exactly an idle-gap detector,
sheets-code.gs:236-241), conversion funnels over the selection->value
update flow (SURVEY §3.1/§3.2), and cohort retention over first-seen
users (the reference tracks first-seen via app registration,
server.mjs:63-87).

All three shuffle ONCE on user_id and do all sequential work inside the
partition via window functions — the shape that scales: at 100 TB the
state per user is bounded (a handful of timestamps), no cross-user data
moves, and AQE coalesces the post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import NOW, register

SESSION_GAP_MIN = 30


@register(
    "q57_sessionize",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM marked
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           min(ts) AS session_start,
           epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM numbered
    GROUP BY user_id, session_seq
    """,
)
def q57_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts after a >30-minute
    idle gap (the reference's poll-backoff cap boundary, sheets-code.gs:4).
    lag + running sum of boundary flags + grouped rollup — three window/agg
    steps over ONE user_id shuffle (Catalyst reuses the partitioning; only
    the final groupBy re-hashes, on a superset key, and AQE coalesces it)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    marked = events.withColumn(
        "is_new",
        F.when(gap_us.isNull() | (gap_us > SESSION_GAP_MIN * 60 * 1_000_000), 1).otherwise(0),
    )
    numbered = marked.withColumn(
        "session_seq", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "q58_funnel_steps",
    oracle="""
    WITH s1 AS (
      SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
                  OVER (PARTITION BY user_id) AS t_view
      FROM events
    ),
    s2 AS (
      SELECT *, min(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
                  OVER (PARTITION BY user_id) AS t_click
      FROM s1
    ),
    s3 AS (
      SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
                  OVER (PARTITION BY user_id) AS t_purchase
      FROM s2
    )
    SELECT count(DISTINCT CASE WHEN t_view IS NOT NULL THEN user_id END) AS users_viewed,
           count(DISTINCT CASE WHEN t_click IS NOT NULL THEN user_id END) AS users_clicked,
           count(DISTINCT CASE WHEN t_purchase IS NOT NULL THEN user_id END) AS users_purchased
    FROM s3
    """,
)
def q58_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: each stage's
    entry time is the earliest event STRICTLY AFTER the previous stage
    (mirrors the reference's selection-broadcast -> value-update causality,
    SURVEY §3.1-3.2). Three chained min-over-user windows share one
    partitioning, so the whole funnel is a single user_id shuffle; the
    final distinct-counts reduce to one row."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    s1 = events.withColumn(
        "t_view", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    s2 = s1.withColumn(
        "t_click",
        F.min(
            F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")), F.col("ts"))
        ).over(w),
    )
    s3 = s2.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")), F.col("ts")
            )
        ).over(w),
    )
    return s3.agg(
        F.countDistinct(F.when(F.col("t_view").isNotNull(), F.col("user_id"))).alias("users_viewed"),
        F.countDistinct(F.when(F.col("t_click").isNotNull(), F.col("user_id"))).alias("users_clicked"),
        F.countDistinct(F.when(F.col("t_purchase").isNotNull(), F.col("user_id"))).alias(
            "users_purchased"
        ),
    )


@register(
    "q59_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS active_day FROM events
    )
    SELECT cohort_day,
           date_diff('day', cohort_day, active_day) AS day_offset,
           count(*) AS n_users
    FROM activity JOIN firsts USING (user_id)
    GROUP BY cohort_day, day_offset
    """,
)
def q59_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day, counted
    on each subsequent active day. Both sides reduce per-user BEFORE the
    cohort join — at 100 TB the join inputs are |users|, not |events|. The
    firsts side grows with the user base, so it carries no broadcast hint;
    both sides already hash on user_id and AQE picks the strategy."""
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("cohort_day")
    )
    activity = events.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("active_day")
    ).distinct()
    return (
        activity.join(firsts, "user_id")  # |users|-sized: AQE chooses
        .withColumn("day_offset", F.datediff(F.col("active_day"), F.col("cohort_day")))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "q129_scd2_intervals",
    oracle="""
    SELECT user_id, event_id, event_type AS attr_value,
           ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           lead(ts) OVER w IS NULL AS is_current,
           CAST(row_number() OVER w AS BIGINT) AS version
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q129_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 build: turn a change-event stream
    into validity intervals — each state becomes a row with [valid_from,
    valid_to) bounds, an is_current flag on the open interval, and a
    per-entity version number. This is how the reference's mutable
    app_states/connections rows (db.mjs:270-278 upserts) become an
    auditable history on immutable storage instead of losing every
    overwritten state. One window pass over one user_id shuffle; lead()
    and row_number() share the same Window operator, so at 100 TB the cost
    is a single per-entity sort — and an entity-bucketed layout
    (operators.bucketing) removes even that exchange."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("attr_value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
        F.row_number().over(w).cast("bigint").alias("version"),
    )


# --- q188: behavioral Markov transition model --------------------------------

_MK_MIN_COUNT = 5


@register(
    "q188_event_transitions",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    ),
    t AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    ),
    r AS (
      SELECT *, CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS row_total
      FROM t
    )
    SELECT from_type, to_type, n,
           round(n * 1.0 / row_total, 4) AS p,
           round(n * 1.0 / row_total, 4)
             > 1.0 / (SELECT count(DISTINCT event_type) FROM events) + 0.02
             AS over_represented
    FROM r
    WHERE n >= {_MK_MIN_COUNT}
    ORDER BY from_type, to_type
    """,
)
def q188_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral Markov model: per-user event sequences
    (ordered by time, event_id tie-break) reduced to a transition matrix
    P(next_type | type), with transitions whose probability beats the
    uniform baseline by 2 points flagged — q151's bigram-LM shape applied
    to user behavior instead of text. The over-represented cells are the
    habitual paths (view->click, error->error retry storms); a transition
    matrix drifting from its baseline is bot traffic or a UI change.

    Determinism: the sequence order carries event_id; probabilities are
    ratios of exact counts rounded at the edge.

    Scale posture: ONE user-keyed window builds successor pairs (the
    q29/q57/q186 exchange), then the transition aggregation is bounded by
    |event types|^2; the uniform baseline is a 1-row scalar subquery in
    both engines."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    t = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    r = t.withColumn(
        "row_total", F.sum("n").over(Window.partitionBy("from_type")).cast("bigint")
    )
    k = events.agg(F.countDistinct("event_type").cast("double").alias("k"))
    p = F.col("n") / F.col("row_total")
    return (
        r.filter(F.col("n") >= _MK_MIN_COUNT)
        .crossJoin(F.broadcast(k))
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(p, 4).alias("p"),
            (F.round(p, 4) > 1.0 / F.col("k") + 0.02).alias("over_represented"),
        )
        .orderBy("from_type", "to_type")
    )


# --- q221: point-in-time (temporal) join -------------------------------------


@register(
    "q221_point_in_time_join",
    oracle="""
    WITH dim AS (
      SELECT user_id, event_type AS attr_value,
             ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      FROM events WHERE event_type <> 'error'
    ),
    pit AS (
      SELECT e.event_id, d.attr_value,
             epoch_ms(e.ts) - epoch_ms(d.valid_from) AS ms_into_state
      FROM (SELECT * FROM events WHERE event_type = 'error') e
      LEFT JOIN dim d
        ON d.user_id = e.user_id
       AND d.valid_from <= e.ts
       AND (d.valid_to IS NULL OR e.ts < d.valid_to)
    )
    SELECT attr_value,
           CAST(count(*) AS BIGINT) AS n_errors,
           round(avg(ms_into_state), 2) AS avg_ms_into_state,
           CAST(max(ms_into_state) AS BIGINT) AS max_ms_into_state
    FROM pit GROUP BY attr_value ORDER BY attr_value NULLS FIRST
    """,
)
def q221_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join — the feature-store staple: each
    label event (errors) is enriched with the dimension value that was
    VALID AT ITS TIMESTAMP, never a later one (the leakage a naive
    latest-value join commits). The dimension is the SCD2 interval table
    q129 builds, here from the user's non-error activity; the join
    predicate is the half-open containment valid_from <= ts < valid_to,
    so a label landing exactly on a state change matches only the NEW
    state and zero-length intervals (two changes at one timestamp) can
    never match — deterministic in both engines. Errors before a user's
    first state survive the left join as the NULL-state row (the
    cold-start bucket a feature pipeline must count, not drop). Report:
    per state, error volume and how far into the state errors land.

    Scale posture: both sides shuffle once on user_id (the interval
    window and the join share the key); the range predicate rides the
    equi-join as a filter — the q39 bounded-interval shape; the rollup is
    keyed by the bounded state dimension."""
    events = load_table(spark, sf_dir, "events")
    # lead orders by the oracle's exact (ts, event_id) total order over the
    # FILTERED change stream, so interval bounds agree engine-for-engine
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        events.filter(F.col("event_type") != "error")
        .select("user_id", "event_id", F.col("event_type").alias("attr_value"), "ts")
        .select(
            "user_id",
            "attr_value",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
    )
    errs = events.filter(F.col("event_type") == "error").select(
        "event_id",
        F.col("user_id").alias("e_user_id"),
        F.col("ts").alias("e_ts"),
    )
    joined = errs.join(
        dim,
        (F.col("user_id") == F.col("e_user_id"))
        & (F.col("valid_from") <= F.col("e_ts"))
        & (F.col("valid_to").isNull() | (F.col("e_ts") < F.col("valid_to"))),
        "left",
    )
    ms_into = F.unix_millis(F.col("e_ts")) - F.unix_millis(F.col("valid_from"))
    return (
        joined.select("attr_value", ms_into.alias("ms_into_state"))
        .groupBy("attr_value")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_errors"),
            F.round(F.avg("ms_into_state"), 2).alias("avg_ms_into_state"),
            F.max("ms_into_state").cast("bigint").alias("max_ms_into_state"),
        )
        .orderBy(F.col("attr_value").asc_nulls_first())
    )


# q224: mutual-information feature ranking. Outcome = high-value event
# (value >= the fixed literal below — a constant, not a data-dependent
# percentile, so the label is reshuffle- and engine-stable). Features are
# bounded-cardinality categoricals: event type (5), hour of day (24),
# user hash-bucket (16).
_MI_HI_VALUE = 100.0


@register(
    "q224_feature_mi_ranking",
    oracle=f"""
    WITH f AS (
      SELECT 'event_type' AS feature, event_type AS level,
             CASE WHEN value >= {_MI_HI_VALUE} THEN 1 ELSE 0 END AS hi
      FROM events
      UNION ALL
      SELECT 'hour_of_day', CAST(hour(ts) AS VARCHAR),
             CASE WHEN value >= {_MI_HI_VALUE} THEN 1 ELSE 0 END
      FROM events
      UNION ALL
      SELECT 'user_bucket', CAST(user_id % 16 AS VARCHAR),
             CASE WHEN value >= {_MI_HI_VALUE} THEN 1 ELSE 0 END
      FROM events
    ),
    j AS (
      SELECT feature, level, hi, CAST(count(*) AS BIGINT) AS c
      FROM f GROUP BY feature, level, hi
    ),
    x AS (SELECT feature, level, SUM(c) AS cx FROM j GROUP BY feature, level),
    y AS (SELECT feature, hi, SUM(c) AS cy FROM j GROUP BY feature, hi),
    t AS (SELECT feature, SUM(c) AS n FROM j GROUP BY feature),
    mi AS (
      SELECT j.feature,
             SUM((CAST(c AS DOUBLE) / n)
                 * log2((CAST(c AS DOUBLE) * n)
                        / (CAST(cx AS DOUBLE) * cy))) AS mi_bits
      FROM j JOIN x USING (feature, level) JOIN y USING (feature, hi)
             JOIN t USING (feature)
      GROUP BY j.feature
    ),
    h AS (
      SELECT x.feature,
             CAST(count(*) AS BIGINT) AS n_levels,
             SUM(-(CAST(cx AS DOUBLE) / n) * log2(CAST(cx AS DOUBLE) / n))
               AS h_bits
      FROM x JOIN t USING (feature)
      GROUP BY x.feature
    )
    SELECT feature, n_levels,
           round(h_bits, 6) AS h_feature_bits,
           round(mi_bits, 6) AS mi_bits
    FROM mi JOIN h USING (feature)
    ORDER BY mi_bits DESC, feature
    """,
)
def q224_feature_mi_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-information feature ranking: I(feature; high-value outcome)
    in bits for each candidate categorical feature, beside the feature's
    own entropy — the standard filter-method feature selection step before
    training a value model on event streams, and the audit that catches a
    feature leaking the label (MI ~ H(outcome)) or carrying nothing
    (MI ~ 0). Complements q162's Pearson audit (linear, numeric-numeric)
    with the information-theoretic categorical form and q148's PMI (which
    scores individual co-occurrences, not whole features).

    Scale posture: the corpus-sized work is ONE pass BY CONSTRUCTION —
    stack() fans each event into its 3 (feature, level) framings
    map-side (no shuffle, rides the scan), then a single HashAggregate
    onto the bounded contingency frame (<= (5+24+16) levels x 2 outcomes
    = 90 cells). Marginals (cx, cy, n) are WINDOWS over that 90-row
    frame — not joins back to re-derived aggregates, which would re-scan
    the corpus once per marginal (differing column pruning defeats
    Spark's exchange reuse across such branches; the window form has
    nothing to re-derive). Entropy folds from the same cells
    (sum over hi of c/n equals cx/n). Determinism: counts are exact
    bigints; the <= 90-term float sums are rounded at 1e-6, orders of
    magnitude above summation-order residue. Reference: no feature
    surface — §7 Phase-3 extension (SURVEY §2.9's value stream is the
    input)."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.selectExpr(
        "stack(3, "
        "'event_type', event_type, "
        "'hour_of_day', cast(hour(ts) as string), "
        "'user_bucket', cast(pmod(user_id, 16) as string)"
        ") as (feature, level)",
        f"cast(value >= {_MI_HI_VALUE} as int) as hi",
    )
    j = f.groupBy("feature", "level", "hi").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    # All three marginals as windows over the 90-row cell frame: one
    # corpus aggregate total, zero joins.
    wx = Window.partitionBy("feature", "level")
    wy = Window.partitionBy("feature", "hi")
    wt = Window.partitionBy("feature")
    cells = j.select(
        "feature",
        "level",
        "c",
        F.sum("c").over(wx).alias("cx"),
        F.sum("c").over(wy).alias("cy"),
        F.sum("c").over(wt).alias("n"),
    )
    return (
        cells.groupBy("feature")
        .agg(
            F.countDistinct("level").cast("bigint").alias("n_levels"),
            F.round(
                F.sum(
                    -(F.col("c").cast("double") / F.col("n"))
                    * F.log2(F.col("cx").cast("double") / F.col("n"))
                ),
                6,
            ).alias("h_feature_bits"),
            F.round(
                F.sum(
                    (F.col("c").cast("double") / F.col("n"))
                    * F.log2(
                        F.col("c").cast("double") * F.col("n")
                        / (F.col("cx").cast("double") * F.col("cy"))
                    )
                ),
                6,
            ).alias("mi_bits"),
        )
        .orderBy(F.col("mi_bits").desc(), "feature")
    )


# q232: sequential pattern census. Length-3 consecutive event-type
# sequences per user — the cheap PrefixSpan stand-in that covers the
# dominant "what do users do next" question without the exponential
# pattern lattice.
_SEQ_TOPK = 20


@register(
    "q232_frequent_sequences",
    oracle=f"""
    WITH s AS (
      SELECT user_id, event_type AS t1,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    g AS (
      SELECT concat_ws(' > ', t1, t2, t3) AS sequence,
             CAST(count(*) AS BIGINT) AS n_occurrences,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM s WHERE t3 IS NOT NULL
      GROUP BY t1, t2, t3
    )
    SELECT sequence, n_users, n_occurrences
    FROM g
    ORDER BY n_users DESC, sequence
    LIMIT {_SEQ_TOPK}
    """,
)
def q232_frequent_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern census: the top-{_SEQ_TOPK} length-3 CONSECUTIVE
    event-type sequences ranked by user support (distinct users who ever
    do A then B then C back-to-back), with raw occurrence counts beside.
    q188's Markov transition matrix sees only pairs and assumes
    memorylessness; the trigram census is the direct evidence for or
    against that assumption (a trigram whose support deviates from the
    chained pair rates is memory) and the standard input for
    next-action-model features and funnel hypothesis mining.

    Scale posture: ONE shuffle on user_id (the sessionization discipline
    — all sequential work happens inside the user partition via lead()),
    then a HashAggregate onto the <= |event types|^3 sequence frame
    (5^3 = 125 cells here — bounded by the type vocabulary, not the
    corpus); the head is TakeOrderedAndProject. Per-user state is two
    lookahead rows. Determinism: sequences order by (ts, event_id) —
    a total order; counts are bigints; top-k tie-breaks on the sequence
    string. Reference: the reference's polling loop observes one event
    at a time (SURVEY §2.9); this is its batch sequence-mining
    generalization (§7 Phase-3, beside q57/q58/q188)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    return (
        s.groupBy("t1", "t2", "t3")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        )
        .select(
            F.concat_ws(" > ", "t1", "t2", "t3").alias("sequence"),
            "n_users",
            "n_occurrences",
        )
        .orderBy(F.col("n_users").desc(), "sequence")
        .limit(_SEQ_TOPK)
    )


# q235: Kaplan-Meier survival of the inter-event gap. Study window 24
# hourly buckets with administrative censoring at the boundary; each
# user's last event is right-censored at the fixed NOW literal.
_KM_HOURS = 24


@register(
    "q235_km_gap_survival",
    oracle=f"""
    WITH g AS (
      SELECT CASE
               WHEN lead(ts) OVER w IS NOT NULL
               THEN date_diff('microsecond', ts, lead(ts) OVER w) / 3600e6
               ELSE date_diff('microsecond', ts,
                              TIMESTAMP '2024-01-31 00:00:00') / 3600e6
             END AS gap_h,
             (lead(ts) OVER w IS NOT NULL) AS observed
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    coded AS (
      SELECT CAST(least(floor(gap_h), {_KM_HOURS}) AS BIGINT) AS bucket,
             CASE WHEN observed AND gap_h < {_KM_HOURS} THEN 1 ELSE 0 END
               AS event
      FROM g
    ),
    cells AS (
      SELECT bucket,
             CAST(SUM(event) AS BIGINT) AS d,
             CAST(SUM(1 - event) AS BIGINT) AS c
      FROM coded WHERE bucket < {_KM_HOURS} GROUP BY bucket
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM coded),
    grid AS (
      SELECT CAST(unnest(range(0, {_KM_HOURS})) AS BIGINT) AS bucket
    ),
    fulled AS (
      SELECT g.bucket, COALESCE(d, 0) AS d, COALESCE(c, 0) AS c
      FROM grid g LEFT JOIN cells USING (bucket)
    ),
    risk AS (
      SELECT bucket, d, c,
             n_total - COALESCE(SUM(d + c) OVER
               (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING), 0) AS n_risk
      FROM fulled, tot
    ),
    curve AS (
      SELECT bucket, d, c, n_risk,
             SUM(ln(1.0 - CAST(d AS DOUBLE) / n_risk)) OVER
               (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS log_s
      FROM risk
    )
    SELECT bucket AS hour, CAST(n_risk AS BIGINT) AS n_risk, d AS n_events,
           c AS n_censored, round(exp(log_s), 6) AS s_hat
    FROM curve
    ORDER BY hour
    """,
)
def q235_km_gap_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of the inter-event gap with RIGHT
    CENSORING — "what fraction of gaps survive past t hours", where each
    user's final gap (event to the fixed NOW) is censored rather than
    dropped or — the naive error — counted as an observed gap. q198's
    inter-arrival census describes only COMPLETED gaps, biasing staleness
    estimates short exactly when users go quiet; the product-limit
    estimator is the standard correction (Kaplan & Meier 1958, public)
    and the modeling basis for q53-style staleness thresholds (pick the
    horizon where S(t) crosses the tolerated false-alarm rate). Gaps at
    or past {_KM_HOURS} h are administratively censored at the boundary,
    so the study grid is a FIXED {_KM_HOURS}-row frame.

    Scale posture: one shuffle on user_id (lead() inside the partition —
    the sessionization discipline), one map-side bucket/censor coding,
    one HashAggregate onto the bucket census — lazily localCheckpoint'ed
    so the study cells and the total-risk scalar share a single events
    pass instead of re-running the gap window per branch; risk sets and
    the cumulative log-product are windows over the fixed grid
    (allowlisted bound). Determinism: gap hours are exact microsecond differences
    over 3600e6 (IEEE-identical); d/n ratios are bigint ratios; the
    cumulative ln fold runs in bucket order in both engines — identical
    operation sequence — and s_hat rounds at 1e-6."""
    from ..registry import NOW

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    gap_h = (
        F.when(
            nxt.isNotNull(),
            (nxt.cast("double") - F.col("ts").cast("double")) / 3600.0,
        ).otherwise(
            (
                F.lit(NOW).cast("timestamp").cast("double")
                - F.col("ts").cast("double")
            )
            / 3600.0
        )
    )
    coded = ev.select(
        F.least(F.floor(gap_h), F.lit(_KM_HOURS))
        .cast("bigint")
        .alias("bucket"),
        (nxt.isNotNull() & (gap_h < _KM_HOURS)).cast("int").alias("event"),
    )
    # One events pass: the bucket census (25 rows incl. the boundary-
    # censored mass at bucket 24) is lazily localCheckpoint'ed so the
    # in-window cells and the total-risk scalar both read it instead of
    # re-running the gap window over the corpus.
    census_all = (
        coded.groupBy("bucket")
        .agg(
            F.sum("event").cast("bigint").alias("d"),
            F.sum(1 - F.col("event")).cast("bigint").alias("c"),
        )
        .localCheckpoint(eager=False)
    )
    cells = census_all.filter(F.col("bucket") < _KM_HOURS)
    tot = census_all.agg(
        F.sum(F.col("d") + F.col("c")).cast("bigint").alias("n_total")
    )
    grid = spark.range(0, _KM_HOURS).select(F.col("id").alias("bucket"))
    fulled = (
        grid.join(cells, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("d", F.lit(0)).alias("d"),
            F.coalesce("c", F.lit(0)).alias("c"),
        )
        .crossJoin(F.broadcast(tot))
    )
    w_prev = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )  # 24-row fixed grid: allowlisted bound
    w_cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n_risk = F.col("n_total") - F.coalesce(
        F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)
    )
    risk = fulled.select(
        "bucket",
        "d",
        "c",
        n_risk.alias("n_risk"),
        F.log(1.0 - F.col("d").cast("double") / n_risk).alias("log_term"),
    )
    return risk.select(
        F.col("bucket").alias("hour"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        F.round(F.exp(F.sum("log_term").over(w_cum)), 6).alias("s_hat"),
    ).orderBy("hour")


# --- q240: incident-window interval-overlap join -------------------------------

_INC_TOPK = 20     # incidents: top-k bursty 10-minute error blocks
_INC_PAD_MIN = 5   # padding on each side of the hot block


@register(
    "q240_interval_overlap_join",
    oracle=f"""
    WITH blocks AS (
      SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 600) * 600 AS BIGINT))
                  AS TIMESTAMP) AS b0,
             CAST(count(*) AS BIGINT) AS n_block_errors
      FROM events WHERE event_type = 'error' GROUP BY 1
    ),
    top AS (
      SELECT b0, n_block_errors,
             row_number() OVER (ORDER BY n_block_errors DESC, b0) AS incident_id
      FROM blocks QUALIFY incident_id <= {_INC_TOPK}
    ),
    inc AS (
      SELECT incident_id, n_block_errors,
             b0 - INTERVAL {_INC_PAD_MIN} MINUTE AS start_ts,
             b0 + INTERVAL {10 + _INC_PAD_MIN} MINUTE AS end_ts
      FROM top
    ),
    joined AS (
      SELECT i.incident_id, i.start_ts, i.end_ts, i.n_block_errors,
             e.event_type, e.user_id
      FROM inc i JOIN events e
        ON e.ts >= i.start_ts AND e.ts < i.end_ts
    )
    SELECT incident_id, start_ts, end_ts, n_block_errors,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_errors,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM joined
    GROUP BY 1, 2, 3, 4
    ORDER BY incident_id
    """,
)
def q240_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join WITHOUT the nested-loop cliff: pull every
    event falling inside the {_INC_TOPK} burstiest error windows (top
    10-minute error blocks, padded +/-{_INC_PAD_MIN} min) — the "what else
    happened during the incident" query. A naive `e.ts BETWEEN i.start AND
    i.end` join has no equality key, so Spark plans BroadcastNestedLoop —
    O(|events| x |intervals|) comparisons. Here each interval EXPLODES
    into its covered minute buckets (interval length is bounded by
    construction: {10 + 2 * _INC_PAD_MIN} minutes) and the join becomes an
    EQUI-join on the minute key plus a residual range check — a plain
    shuffled hash join that stays a hash join at a million intervals,
    which is the point: the technique, not the {_INC_TOPK}-row demo size,
    is what scales (Spark has no built-in range-join optimization; this
    bucketing is the standard workaround, same family as the q221
    point-in-time bucket join).

    Determinism: block counts are exact ints; the top-{_INC_TOPK} head
    carries (count DESC, block_start) total order; interval bounds are
    half-open [start, end) so boundary events land exactly once in both
    engines.

    Scale posture: the block census is one map-side partial agg; the
    incident head is a TakeOrdered; events join by equi-key with the tiny
    bucket table (AQE broadcasts it while small — but the plan is a hash
    join either way, never a cartesian); per-incident aggregates are
    bounded by the incident dimension. The rank window runs on the
    pre-limited {_INC_TOPK}-row head."""
    events = load_table(spark, sf_dir, "events")
    blocks = (
        events.filter(F.col("event_type") == "error")
        .groupBy(
            F.timestamp_seconds(
                (F.floor(F.unix_timestamp("ts") / 600) * 600).cast("bigint")
            ).alias("b0")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_block_errors"))
    )
    top = blocks.orderBy(
        F.col("n_block_errors").desc(), F.col("b0").asc()
    ).limit(_INC_TOPK)
    w = Window.orderBy(F.col("n_block_errors").desc(), F.col("b0").asc())
    inc = top.select(
        F.row_number().over(w).alias("incident_id"),
        "n_block_errors",
        (F.col("b0") - F.expr(f"INTERVAL {_INC_PAD_MIN} MINUTES")).alias(
            "start_ts"
        ),
        (
            F.col("b0") + F.expr(f"INTERVAL {10 + _INC_PAD_MIN} MINUTES")
        ).alias("end_ts"),
    )
    # Bucket decomposition: each interval covers a BOUNDED run of minutes
    # ([start, end) half-open -> last covered minute is end - 1 min), so the
    # explode is O(intervals x 20) and the events side joins on an equi-key.
    buckets = inc.select(
        "incident_id",
        "start_ts",
        "end_ts",
        "n_block_errors",
        F.explode(
            F.sequence(
                F.col("start_ts"),
                F.col("end_ts") - F.expr("INTERVAL 1 MINUTE"),
                F.expr("INTERVAL 1 MINUTE"),
            )
        ).alias("minute"),
    )
    tagged = events.withColumn("minute", F.date_trunc("minute", F.col("ts")))
    joined = tagged.join(buckets, "minute").filter(
        (F.col("ts") >= F.col("start_ts")) & (F.col("ts") < F.col("end_ts"))
    )
    return (
        joined.groupBy("incident_id", "start_ts", "end_ts", "n_block_errors")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("bigint")
            .alias("n_errors"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy("incident_id")
    )


# --- q247: conversion attribution (last-touch) ---------------------------------

_ATTR_LOOKBACK_MIN = 7 * 24 * 60  # 7-day attribution window


@register(
    "q247_touch_attribution",
    oracle=f"""
    WITH s AS (
      SELECT user_id, ts, event_id, event_type,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_type,
             last_value(CASE WHEN event_type <> 'purchase' THEN ts END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_ts
      FROM events
    ),
    conv AS (
      SELECT CASE WHEN touch_ts IS NOT NULL
                  AND date_diff('second', touch_ts, ts)
                      <= {_ATTR_LOOKBACK_MIN} * 60
                  THEN touch_type ELSE '(none)' END AS attributed_to,
             CASE WHEN touch_ts IS NOT NULL
                  AND date_diff('second', touch_ts, ts)
                      <= {_ATTR_LOOKBACK_MIN} * 60
                  THEN date_diff('second', touch_ts, ts) / 60.0 END AS gap_min
      FROM s WHERE event_type = 'purchase'
    )
    SELECT attributed_to,
           CAST(count(*) AS BIGINT) AS n_purchases,
           round(avg(gap_min), 4) AS avg_minutes_to_convert,
           round(max(gap_min), 4) AS max_minutes_to_convert
    FROM conv
    GROUP BY attributed_to
    ORDER BY attributed_to
    """,
)
def q247_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: every purchase is credited to
    the user's most recent non-purchase event within a 7-day lookback —
    the per-user sequential credit-assignment every event pipeline runs
    (and the degenerate single-touch case of the position-based models);
    purchases with no in-window touch report as '(none)', keeping the
    denominator honest. Complements q58 (funnel: fixed step ORDER) and
    q232 (which sequences are frequent): attribution asks what
    IMMEDIATELY preceded the conversion.

    Determinism: the carried touch uses last_value IGNORE NULLS over
    (ts, event_id)-ordered rows — a total order, so ties resolve
    identically in both engines; the gap is exact integer seconds
    divided by 60; aggregates round at 1e-4.

    Scale posture: ONE shuffle on user_id, then all sequential logic is
    a per-user window (bounded per-user state, the q57 sessionize
    shape); the report aggregates to |touch types| rows. No global
    window, no self-join of events against events."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    nonp = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    nonp_ts = F.when(F.col("event_type") != "purchase", F.col("ts"))
    s = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.last(nonp, ignorenulls=True).over(w).alias("touch_type"),
        F.last(nonp_ts, ignorenulls=True).over(w).alias("touch_ts"),
    )
    gap_s = F.col("ts").cast("long") - F.col("touch_ts").cast("long")
    in_win = F.col("touch_ts").isNotNull() & (
        gap_s <= _ATTR_LOOKBACK_MIN * 60
    )
    conv = s.filter(F.col("event_type") == "purchase").select(
        F.when(in_win, F.col("touch_type"))
        .otherwise(F.lit("(none)"))
        .alias("attributed_to"),
        F.when(in_win, gap_s / 60.0).alias("gap_min"),
    )
    return (
        conv.groupBy("attributed_to")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.round(F.avg("gap_min"), 4).alias("avg_minutes_to_convert"),
            F.round(F.max("gap_min"), 4).alias("max_minutes_to_convert"),
        )
        .orderBy("attributed_to")
    )


# --- q248: delta-method CI for a ratio metric (cluster-randomized) -------------


@register(
    "q248_delta_method_ci",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8' AS arm_a,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS DOUBLE) AS x,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS DOUBLE) AS y
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT CAST(count(CASE WHEN arm_a THEN 1 END) AS DOUBLE) AS na,
             sum(CASE WHEN arm_a THEN x END) AS sxa,
             sum(CASE WHEN arm_a THEN y END) AS sya,
             sum(CASE WHEN arm_a THEN x * x END) AS sxxa,
             sum(CASE WHEN arm_a THEN y * y END) AS syya,
             sum(CASE WHEN arm_a THEN x * y END) AS sxya,
             CAST(count(CASE WHEN NOT arm_a THEN 1 END) AS DOUBLE) AS nb,
             sum(CASE WHEN NOT arm_a THEN x END) AS sxb,
             sum(CASE WHEN NOT arm_a THEN y END) AS syb,
             sum(CASE WHEN NOT arm_a THEN x * x END) AS sxxb,
             sum(CASE WHEN NOT arm_a THEN y * y END) AS syyb,
             sum(CASE WHEN NOT arm_a THEN x * y END) AS sxyb
      FROM per_user
    ),
    d AS (
      SELECT na, nb, sxa / sya AS ra, sxb / syb AS rb,
             (sxxa - sxa * sxa / na
              + (sxa / sya) * (sxa / sya) * (syya - sya * sya / na)
              - 2 * (sxa / sya) * (sxya - sxa * sya / na))
             / (na - 1) / na / ((sya / na) * (sya / na)) AS var_ra,
             (sxxb - sxb * sxb / nb
              + (sxb / syb) * (sxb / syb) * (syyb - syb * syb / nb)
              - 2 * (sxb / syb) * (sxyb - sxb * syb / nb))
             / (nb - 1) / nb / ((syb / nb) * (syb / nb)) AS var_rb
      FROM m
    )
    SELECT CAST(na AS BIGINT) AS n_users_a, CAST(nb AS BIGINT) AS n_users_b,
           round(ra, 6) AS ratio_a, round(rb, 6) AS ratio_b,
           round(sqrt(var_ra), 6) AS se_a, round(sqrt(var_rb), 6) AS se_b,
           round(ra - rb, 6) AS diff,
           round(sqrt(var_ra + var_rb), 6) AS se_diff,
           round((ra - rb) / sqrt(var_ra + var_rb), 4) AS z,
           abs((ra - rb) / sqrt(var_ra + var_rb)) > 1.96 AS significant
    FROM d
    """,
)
def q248_delta_method_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correct error bars for a RATIO metric when the randomization unit
    is the user but the metric is event-level: purchases-per-click by
    md5-split arm, with the delta-method variance (1/ybar^2)(var_x +
    R^2 var_y - 2R cov_xy)/n — the linearization every experimentation
    platform applies because treating event-level conversions as iid
    understates the variance whenever users contribute multiple events
    (Deng et al. 2017/2018, "ratio metrics in randomized experiments";
    public). Reports per-arm ratios, SEs, and the two-arm z — beside
    q238 (proportions with FDR) and q174 (means), this completes the
    mean/proportion/ratio testing triad.

    Determinism: all six moments per arm are sums of exact integer
    per-user counts (exact in double far below 2^53); the variance is
    one closed form evaluated identically in both engines, rounded at
    the shown grain.

    Scale posture: one shuffle to per-user counts (the q59 cohort
    shape), then a single 1-row moment aggregate — partial sums combine
    map-side; the delta-method algebra runs on scalars."""
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("double")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("double")
        .alias("y"),
    ).withColumn(
        "arm_a",
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8",
    )

    def moments(flag, suffix):
        return [
            F.count(F.when(flag, F.lit(1))).cast("double").alias("n" + suffix),
            F.sum(F.when(flag, F.col("x"))).alias("sx" + suffix),
            F.sum(F.when(flag, F.col("y"))).alias("sy" + suffix),
            F.sum(F.when(flag, F.col("x") * F.col("x"))).alias("sxx" + suffix),
            F.sum(F.when(flag, F.col("y") * F.col("y"))).alias("syy" + suffix),
            F.sum(F.when(flag, F.col("x") * F.col("y"))).alias("sxy" + suffix),
        ]

    m = per_user.agg(
        *moments(F.col("arm_a"), "a"), *moments(~F.col("arm_a"), "b")
    )

    def ratio_var(n, sx, sy, sxx, syy, sxy):
        r = sx / sy
        num = (
            (sxx - sx * sx / n)
            + r * r * (syy - sy * sy / n)
            - 2 * r * (sxy - sx * sy / n)
        )
        # Var(R) = s^2_{x - R y} / (n * ybar^2): sample variance of the
        # linearized residual over the n user clusters, divided by n for
        # the mean, scaled by 1/ybar^2.
        return r, num / (n - 1) / n / ((sy / n) * (sy / n))

    ra, var_ra = ratio_var(
        F.col("na"), F.col("sxa"), F.col("sya"),
        F.col("sxxa"), F.col("syya"), F.col("sxya"),
    )
    rb, var_rb = ratio_var(
        F.col("nb"), F.col("sxb"), F.col("syb"),
        F.col("sxxb"), F.col("syyb"), F.col("sxyb"),
    )
    z = (ra - rb) / F.sqrt(var_ra + var_rb)
    return m.select(
        F.col("na").cast("bigint").alias("n_users_a"),
        F.col("nb").cast("bigint").alias("n_users_b"),
        F.round(ra, 6).alias("ratio_a"),
        F.round(rb, 6).alias("ratio_b"),
        F.round(F.sqrt(var_ra), 6).alias("se_a"),
        F.round(F.sqrt(var_rb), 6).alias("se_b"),
        F.round(ra - rb, 6).alias("diff"),
        F.round(F.sqrt(var_ra + var_rb), 6).alias("se_diff"),
        F.round(z, 4).alias("z"),
        (F.abs(z) > 1.96).alias("significant"),
    )


# --- q257: seasonal (hour-of-day) decomposition + anomaly hours ---------------


@register(
    "q257_seasonal_anomaly",
    oracle="""
    WITH hourly AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(extract(hour FROM ts) AS INT) AS hod,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    profile AS (
      SELECT hod, avg(n) AS seasonal_mean, stddev_samp(n) AS seasonal_std
      FROM hourly GROUP BY hod
    )
    SELECT h.day, h.hod, h.n,
           round(p.seasonal_mean, 4) AS seasonal_mean,
           round((h.n - p.seasonal_mean) / nullif(p.seasonal_std, 0), 4) AS z
    FROM hourly h JOIN profile p USING (hod)
    WHERE abs((h.n - p.seasonal_mean) / nullif(p.seasonal_std, 0)) > 2
    ORDER BY round(abs((h.n - p.seasonal_mean) / nullif(p.seasonal_std, 0)), 4) DESC,
             h.day, h.hod
    """,
)
def q257_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal decomposition of the event stream (STL-lite): hour-of-day
    seasonal means over the observation month, per-bucket residual z-scores,
    and the anomalous (day, hour) cells where load departed >2 sigma from the
    hour's seasonal norm — the load-anomaly primitive behind q185's burst
    detector, but with an explicit seasonal baseline so a busy-but-normal
    9am never alarms.

    Scale: one HashAggregate collapses the corpus to days x 24 bucket rows;
    the 24-row seasonal profile broadcast-joins back. No window, no
    corpus-sized shuffle — the same two-aggregate discipline as q185
    (queue.py). Degenerate hours (seasonal_std == 0) emit NULL z and are
    excluded by the |z| predicate in BOTH engines (nullif guard mirrored,
    per the q165/q185 MAD discipline). Both engines rank by the ROUNDED |z|
    (round-before-rank convention, q237/q246/q263) so near-tie rows past the
    4th decimal break to (day, hod) identically."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select(
            F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
            F.hour("ts").cast("int").alias("hod"),
        )
        .groupBy("day", "hod")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    profile = hourly.groupBy("hod").agg(
        F.avg("n").alias("seasonal_mean"),
        F.stddev_samp("n").alias("seasonal_std"),
    )
    z = (F.col("n") - F.col("seasonal_mean")) / F.nullif(
        F.col("seasonal_std"), F.lit(0.0)
    )
    return (
        hourly.join(F.broadcast(profile), "hod")
        .withColumn("z_raw", z)
        .filter(F.abs(F.col("z_raw")) > 2)
        .select(
            "day",
            "hod",
            "n",
            F.round(F.col("seasonal_mean"), 4).alias("seasonal_mean"),
            F.round(F.col("z_raw"), 4).alias("z"),
        )
        .orderBy(F.abs(F.col("z")).desc(), F.col("day"), F.col("hod"))
    )


# --- q258: autocorrelation of the daily event-count series --------------------


@register(
    "q258_acf_daily_counts",
    oracle="""
    WITH daily AS (
      SELECT CAST(extract(day FROM ts) AS INT) AS dom,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    lags AS (SELECT unnest(range(1, 8)) AS lag),
    pairs AS (
      SELECT l.lag, a.n AS n_t, b.n AS n_tlag
      FROM lags l
      JOIN daily a ON TRUE
      JOIN daily b ON b.dom = a.dom + l.lag
    )
    SELECT CAST(lag AS INT) AS lag,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(corr(n_t, n_tlag), 4) AS acf
    FROM pairs GROUP BY lag ORDER BY lag
    """,
)
def q258_acf_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily arrival series at lags 1..7 —
    the seasonality detector that motivates q257's hour-of-day baseline and
    q187's CUSUM drift windows: a weekly-periodic load shows an ACF spike at
    lag 7, an i.i.d. one decays immediately.

    Scale: the corpus collapses to ONE row per day before any pairing; the
    lag x day pair frame is |days| x 7 rows built by joining the bounded
    daily table to itself — at 100 TB the daily table is still ~365 rows/yr,
    so both joins broadcast. corr() is the sample Pearson coefficient in
    both engines."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(F.dayofmonth("ts").cast("int").alias("dom"))
        .groupBy("dom")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    a = daily.select(F.col("dom").alias("dom_a"), F.col("n").alias("n_t"))
    b = daily.select(F.col("dom").alias("dom_b"), F.col("n").alias("n_tlag"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(
            F.broadcast(b),
            F.col("dom_b") == F.col("dom_a") + F.col("lag"),
        )
    )
    return (
        pairs.groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.corr("n_t", "n_tlag"), 4).alias("acf"),
        )
        .orderBy("lag")
    )


# --- q263: Markov order-1 adequacy audit over event transitions ---------------


@register(
    "q263_markov_adequacy",
    oracle="""
    WITH seq AS (
      SELECT event_type AS t,
             lag(event_type, 1) OVER w AS t1,
             lag(event_type, 2) OVER w AS t2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    step1 AS (
      SELECT t1 AS a, t AS b, count(*) AS n FROM seq WHERE t1 IS NOT NULL
      GROUP BY 1, 2
    ),
    p1 AS (
      SELECT a, b, CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY a) AS p
      FROM step1
    ),
    step2 AS (
      SELECT t2 AS a, t AS c, count(*) AS n FROM seq WHERE t2 IS NOT NULL
      GROUP BY 1, 2
    ),
    p2emp AS (
      SELECT a, c, CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY a) AS p
      FROM step2
    ),
    ck AS (
      SELECT x.a, y.b AS c, sum(x.p * y.p) AS p
      FROM p1 x JOIN p1 y ON x.b = y.a GROUP BY x.a, y.b
    ),
    cells AS (
      SELECT a.t AS from_type, b.t AS to_type
      FROM (SELECT DISTINCT event_type AS t FROM events) a,
           (SELECT DISTINCT event_type AS t FROM events) b
    )
    SELECT from_type, to_type,
           round(coalesce(e.p, 0), 4) AS p2_empirical,
           round(coalesce(k.p, 0), 4) AS p2_chapman,
           round(abs(coalesce(e.p, 0) - coalesce(k.p, 0)), 4) AS abs_gap
    FROM cells
    LEFT JOIN p2emp e ON e.a = from_type AND e.c = to_type
    LEFT JOIN ck k ON k.a = from_type AND k.c = to_type
    ORDER BY abs_gap DESC, from_type, to_type
    """,
)
def q263_markov_adequacy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov order-1 adequacy audit: does the event stream's two-step
    behavior factor through its one-step transition matrix? Compares the
    empirical two-step transition probabilities P2(a,c) against the
    Chapman-Kolmogorov prediction sum_b P(a,b)P(b,c); a large gap refutes
    the first-order assumption behind q188's transition matrix and any
    next-event model trained on it. The per-cell |gap| table doubles as the
    drill-down for which behavior (e.g. error->error loops) carries the
    memory.

    Scale: lag() runs under a PER-USER partitioned window (no global
    funnel); everything downstream operates on the |types|^2 transition
    matrices — 25-row frames joined and unioned, driver-free. The
    (ts, event_id) window order is a pinned total order in both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("t"),
        F.lag("event_type", 1).over(w).alias("t1"),
        F.lag("event_type", 2).over(w).alias("t2"),
    )

    def cond_probs(src: DataFrame, a_col: str) -> DataFrame:
        counts = (
            src.filter(F.col(a_col).isNotNull())
            .groupBy(F.col(a_col).alias("a"), F.col("t").alias("b"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        wa = Window.partitionBy("a")
        return counts.select(
            "a", "b", (F.col("n").cast("double") / F.sum("n").over(wa)).alias("p")
        )

    p1 = cond_probs(seq, "t1")
    p2emp = cond_probs(seq, "t2").withColumnRenamed("b", "c")
    x = p1.select(F.col("a"), F.col("b"), F.col("p").alias("px"))
    y = p1.select(F.col("a").alias("b"), F.col("b").alias("c"), F.col("p").alias("py"))
    ck = (
        x.join(y, "b")
        .groupBy("a", "c")
        .agg(F.sum(F.col("px") * F.col("py")).alias("p"))
    )
    types = ev.select(F.col("event_type").alias("t")).distinct()
    cells = types.select(F.col("t").alias("from_type")).crossJoin(
        types.select(F.col("t").alias("to_type"))
    )
    e = p2emp.select(
        F.col("a").alias("from_type"), F.col("c").alias("to_type"),
        F.col("p").alias("pe"),
    )
    k = ck.select(
        F.col("a").alias("from_type"), F.col("c").alias("to_type"),
        F.col("p").alias("pk"),
    )
    gap = F.abs(F.coalesce(F.col("pe"), F.lit(0.0)) - F.coalesce(F.col("pk"), F.lit(0.0)))
    return (
        cells.join(e, ["from_type", "to_type"], "left")
        .join(k, ["from_type", "to_type"], "left")
        .select(
            "from_type",
            "to_type",
            F.round(F.coalesce(F.col("pe"), F.lit(0.0)), 4).alias("p2_empirical"),
            F.round(F.coalesce(F.col("pk"), F.lit(0.0)), 4).alias("p2_chapman"),
            F.round(gap, 4).alias("abs_gap"),
        )
        .orderBy(F.col("abs_gap").desc(), "from_type", "to_type")
    )


# --- q269: Theil-Sen slope + Mann-Kendall trend test per event type ------------


@register(
    "q269_theil_sen_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(extract(day FROM ts) AS INT) AS dom,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.event_type,
             CAST(b.n - a.n AS DOUBLE) / (b.dom - a.dom) AS slope,
             CASE WHEN b.n > a.n THEN 1 WHEN b.n < a.n THEN -1 ELSE 0 END AS sgn
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND b.dom > a.dom
    ),
    ties AS (
      SELECT event_type, sum(t * (t - 1.0) * (2.0 * t + 5.0)) AS tie_term
      FROM (SELECT event_type, n, CAST(count(*) AS DOUBLE) AS t
            FROM daily GROUP BY 1, 2)
      GROUP BY event_type
    ),
    agg AS (
      SELECT p.event_type,
             (SELECT CAST(count(*) AS DOUBLE) FROM daily d
              WHERE d.event_type = p.event_type) AS nd,
             median(p.slope) AS ts_slope,
             CAST(sum(p.sgn) AS DOUBLE) AS s
      FROM pairs p GROUP BY p.event_type
    ),
    zt AS (
      SELECT a.event_type, a.nd, a.ts_slope, a.s,
             sqrt((a.nd * (a.nd - 1.0) * (2.0 * a.nd + 5.0) - t.tie_term)
                  / 18.0) AS sigma,
             CASE WHEN a.s > 0 THEN (a.s - 1.0)
                  WHEN a.s < 0 THEN (a.s + 1.0)
                  ELSE 0.0 END
               / nullif(sqrt((a.nd * (a.nd - 1.0) * (2.0 * a.nd + 5.0)
                              - t.tie_term) / 18.0), 0) AS z
      FROM agg a JOIN ties t USING (event_type)
    )
    SELECT event_type, CAST(nd AS BIGINT) AS n_days,
           round(ts_slope, 6) AS ts_slope,
           CAST(s AS BIGINT) AS mk_s,
           round(z, 4) AS z,
           round((2.0 * (exp(-0.5 * z * z) / sqrt(2.0 * pi()))
                  * (0.319381530 * (1.0 / (1.0 + 0.2316419 * abs(z)))
                     + -0.356563782 * pow(1.0 / (1.0 + 0.2316419 * abs(z)), 2)
                     + 1.781477937 * pow(1.0 / (1.0 + 0.2316419 * abs(z)), 3)
                     + -1.821255978 * pow(1.0 / (1.0 + 0.2316419 * abs(z)), 4)
                     + 1.330274429 * pow(1.0 / (1.0 + 0.2316419 * abs(z)), 5))),
                 8) AS p,
           CASE WHEN z IS NULL THEN 'none'
                WHEN (2.0 * (exp(-0.5 * z * z) / sqrt(2.0 * pi()))
                      * (0.319381530 * (1.0 / (1.0 + 0.2316419 * abs(z)))
                         + -0.356563782 * pow(1.0 / (1.0 + 0.2316419 * abs(z)), 2)
                         + 1.781477937 * pow(1.0 / (1.0 + 0.2316419 * abs(z)), 3)
                         + -1.821255978 * pow(1.0 / (1.0 + 0.2316419 * abs(z)), 4)
                         + 1.330274429 * pow(1.0 / (1.0 + 0.2316419 * abs(z)), 5)))
                     > 0.05 THEN 'none'
                WHEN s > 0 THEN 'increasing'
                ELSE 'decreasing' END AS trend
    FROM zt ORDER BY event_type
    """,
)
def q269_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust trend per event type: Theil-Sen slope (median of all pairwise
    day slopes — breakdown point 29%, one anomalous day cannot bend it,
    unlike the OLS trend in q189) plus the Mann-Kendall S test with tie
    correction and continuity-corrected normal approximation — the
    standard nonparametric pair for 'is this series trending' monitoring
    (Theil 1950; Sen 1968; Mann 1945; Kendall's tau variance form). The
    monotone-trend complement of q268's two-sample location test and
    q258's autocorrelation seasonality probe; p-values via the shared
    A&S 26.2.17 tail kernel.

    Determinism: pairwise slopes are exact-rational doubles and both
    engines interpolate the median identically on the sorted pair list;
    S and the tie term are integer sums; z/p are the identical closed
    form.

    Scale posture: the corpus collapses to the |types| x |days| daily
    frame FIRST (one HashAggregate); the all-pairs slope frame is
    C(|days|, 2) x |types| rows — bounded by the retention window
    (~465 x 5 here), never by the corpus. At 100 TB only the map-side
    scan grows; the pair join broadcasts the day frame."""
    from .queue import _AS_B
    import math as _math

    ev = load_table(spark, sf_dir, "events")
    # pin the |types| x |days| daily frame: four consumers (both pair
    # sides, nd, ties) with DIFFERENT downstream aggregates defeat
    # ReuseExchange, so the unpinned plan scans + aggregates the events
    # table 8 times (counted in the r13 before-plan); the pinned form
    # scans it once and every consumer reads the bounded frame
    daily = (
        ev.select("event_type", F.dayofmonth("ts").cast("int").alias("dom"))
        .groupBy("event_type", "dom")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    a = daily.select(
        "event_type", F.col("dom").alias("dom_a"), F.col("n").alias("n_a")
    )
    b = daily.select(
        "event_type", F.col("dom").alias("dom_b"), F.col("n").alias("n_b")
    )
    pairs = a.join(F.broadcast(b), "event_type").filter(
        F.col("dom_b") > F.col("dom_a")
    )
    slope = (F.col("n_b") - F.col("n_a")).cast("double") / (
        F.col("dom_b") - F.col("dom_a")
    )
    sgn = (
        F.when(F.col("n_b") > F.col("n_a"), 1)
        .when(F.col("n_b") < F.col("n_a"), -1)
        .otherwise(0)
    )
    agg = (
        pairs.select("event_type", slope.alias("slope"), sgn.alias("sgn"))
        .groupBy("event_type")
        .agg(
            F.median("slope").alias("ts_slope"),
            F.sum("sgn").cast("double").alias("s"),
        )
    )
    nd = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("nd")
    )
    ties = (
        daily.groupBy("event_type", "n")
        .agg(F.count(F.lit(1)).cast("double").alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1.0) * (2.0 * F.col("t") + 5.0)
            ).alias("tie_term")
        )
    )
    j = agg.join(nd, "event_type").join(ties, "event_type")
    sigma = F.sqrt(
        (
            F.col("nd") * (F.col("nd") - 1.0) * (2.0 * F.col("nd") + 5.0)
            - F.col("tie_term")
        )
        / 18.0
    )
    z = (
        F.when(F.col("s") > 0, F.col("s") - 1.0)
        .when(F.col("s") < 0, F.col("s") + 1.0)
        .otherwise(0.0)
    ) / F.nullif(sigma, F.lit(0.0))
    jz = j.withColumn("z", z)
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
        / F.sqrt(F.lit(2.0) * F.lit(_math.pi))
    ) * poly
    return jz.select(
        "event_type",
        F.col("nd").cast("bigint").alias("n_days"),
        F.round("ts_slope", 6).alias("ts_slope"),
        F.col("s").cast("bigint").alias("mk_s"),
        F.round("z", 4).alias("z"),
        F.round(p, 8).alias("p"),
        F.when(F.col("z").isNull(), "none")
        .when(p > 0.05, "none")
        .when(F.col("s") > 0, "increasing")
        .otherwise("decreasing")
        .alias("trend"),
    ).orderBy("event_type")


# --- q271: funnel conversion lag percentiles -----------------------------------


@register(
    "q271_funnel_conversion_lag",
    oracle="""
    WITH s1 AS (
      SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t_view
      FROM events
    ),
    s2 AS (
      SELECT *, min(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
               OVER (PARTITION BY user_id) AS t_click
      FROM s1
    ),
    s3 AS (
      SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
               OVER (PARTITION BY user_id) AS t_purchase
      FROM s2
    ),
    u AS (SELECT DISTINCT user_id, t_view, t_click, t_purchase FROM s3),
    vc AS (
      SELECT epoch(t_click) - epoch(t_view) AS lag_s FROM u
      WHERE t_click IS NOT NULL
    ),
    cp AS (
      SELECT epoch(t_purchase) - epoch(t_click) AS lag_s FROM u
      WHERE t_purchase IS NOT NULL
    ),
    tot AS (
      SELECT CAST(count(t_view) AS BIGINT) AS n_view,
             CAST(count(t_click) AS BIGINT) AS n_click,
             CAST(count(t_purchase) AS BIGINT) AS n_purchase
      FROM u
    )
    SELECT 'view_to_click' AS step,
           (SELECT n_click FROM tot) AS n_converted,
           round(CAST((SELECT n_click FROM tot) AS DOUBLE)
                 / (SELECT n_view FROM tot), 6) AS conv_rate,
           round(quantile_cont(lag_s, 0.5), 4) AS lag_p50_s,
           round(quantile_cont(lag_s, 0.9), 4) AS lag_p90_s
    FROM vc
    UNION ALL
    SELECT 'click_to_purchase' AS step,
           (SELECT n_purchase FROM tot) AS n_converted,
           round(CAST((SELECT n_purchase FROM tot) AS DOUBLE)
                 / (SELECT n_click FROM tot), 6) AS conv_rate,
           round(quantile_cont(lag_s, 0.5), 4) AS lag_p50_s,
           round(quantile_cont(lag_s, 0.9), 4) AS lag_p90_s
    FROM cp
    ORDER BY step
    """,
)
def q271_funnel_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel latency profile: for each q58 stage transition (view->click,
    click->purchase, same strictly-after causality windows), the converter
    count, the conversion rate from the prior stage, and the EXACT p50/p90
    time-to-convert in seconds — the SLA view q58's counts-only funnel
    lacks (how MANY convert vs how LONG conversion takes; a p90 blowup
    with flat counts is the classic queue-degradation signature the
    reference's health monitor averages away, db.mjs:415-419).

    Determinism: stage times are min-over-window (exact); lags are epoch
    double differences; percentiles are the shared linear-interpolation
    definition (Spark `percentile` == DuckDB quantile_cont, the q45
    precedent).

    Scale posture: the three chained stage windows share ONE user_id
    shuffle (the q58 plan); the per-user frame is |users| rows, and each
    transition's percentile is an exact sort of the (much smaller)
    converter subset — at 100 TB switch to percentile_approx, same plan
    shape, bounded memory."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    s = (
        events.withColumn(
            "t_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    # groupBy(user_id), not distinct over all four columns: the stage times
    # are constant per user (window outputs), so min() reproduces the
    # distinct row exactly — and grouping by the window's own partition key
    # reuses the existing hashpartitioning(user_id) instead of paying a
    # second full exchange keyed by the 4-column tuple.
    u = s.groupBy("user_id").agg(
        F.min("t_view").alias("t_view"),
        F.min("t_click").alias("t_click"),
        F.min("t_purchase").alias("t_purchase"),
    )
    u = u.localCheckpoint(eager=False)  # one funnel pass feeds all branches
    tot = u.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click"),
        F.count("t_purchase").alias("n_purchase"),
    )

    def leg(step, t_from, t_to, n_conv, n_prior):
        lag = F.col(t_to).cast("double") - F.col(t_from).cast("double")
        return (
            u.filter(F.col(t_to).isNotNull())
            .select(lag.alias("lag_s"))
            .agg(
                F.round(F.expr("percentile(lag_s, 0.5)"), 4).alias("lag_p50_s"),
                F.round(F.expr("percentile(lag_s, 0.9)"), 4).alias("lag_p90_s"),
            )
            .crossJoin(F.broadcast(tot))
            .select(
                F.lit(step).alias("step"),
                F.col(n_conv).alias("n_converted"),
                F.round(
                    F.col(n_conv).cast("double") / F.col(n_prior), 6
                ).alias("conv_rate"),
                "lag_p50_s",
                "lag_p90_s",
            )
        )

    return (
        leg("click_to_purchase", "t_click", "t_purchase", "n_purchase", "n_click")
        .unionByName(leg("view_to_click", "t_view", "t_click", "n_click", "n_view"))
        .orderBy("step")
    )


@register(
    "q281_seasonal_strength",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(extract(day FROM ts) AS INT) AS dom,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    tr AS (
      SELECT event_type, dom, n,
             CAST(sum(n) OVER w AS BIGINT) AS s7,
             CAST(count(*) OVER w AS BIGINT) AS c7
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY dom
                   RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
      SELECT event_type, dom, (dom - 1) % 7 AS dow, 7 * n - s7 AS detr
      FROM tr WHERE c7 = 7
    ),
    seas AS (
      SELECT event_type, dow,
             CAST(sum(detr) AS DOUBLE) / count(*) AS m
      FROM det GROUP BY 1, 2
    ),
    sums AS (
      SELECT d.event_type,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(CAST(d.detr AS DECIMAL(38,0))) AS DOUBLE) AS s1,
             CAST(sum(CAST(d.detr * d.detr AS DECIMAL(38,0))) AS DOUBLE) AS s2,
             list_sum(list(d.detr - s.m ORDER BY d.dom)) AS r1,
             list_sum(list((d.detr - s.m) * (d.detr - s.m) ORDER BY d.dom))
               AS r2
      FROM det d JOIN seas s ON d.event_type = s.event_type AND d.dow = s.dow
      GROUP BY d.event_type
    )
    SELECT event_type, n_days,
           round((s2 - s1 * s1 / n_days) / n_days, 4) AS var_detrended,
           round((r2 - r1 * r1 / n_days) / n_days, 4) AS var_residual,
           round(greatest(0.0, 1.0 - (r2 - r1 * r1 / n_days)
                                     / (s2 - s1 * s1 / n_days)), 4)
             AS seasonal_strength
    FROM sums
    ORDER BY event_type
    """,
)
def q281_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-style seasonal-strength decomposition per event type (Cleveland
    et al. 1990's trend/seasonal/remainder split, Hyndman's strength
    statistic F_s = max(0, 1 - Var(remainder)/Var(detrended))): the daily
    series is detrended by a CENTERED 7-day moving average (complete
    windows only), the weekly seasonal component is the per-weekday mean
    of the detrended series, and the strength compares residual to
    detrended variance — 0 = no weekly pattern, near 1 = metronomic. The
    decision-grade complement of q258's ACF: the ACF says "is there
    periodicity", this says "how much of the variance it explains".

    Exactness: the detrended series is kept INTEGER (7n - sum7 instead of
    n - sum7/7 — same zero crossings, 7x the scale) so trend subtraction
    introduces no float at all, and the variances are computed from
    EXACT sums — decimal-cast integer sums for s1/s2, DAY-ORDER folds for
    the residual sums r1/r2 (sort_array struct fold here, in-list-order
    list_sum over list(... ORDER BY dom) in DuckDB — the q151 discipline)
    — then one identical double formula (s2 - s1^2/n)/n. NOT the engines'
    var_pop, whose double partial-aggregation order is nondeterministic
    under Spark's partitioning (observed: a round-4 boundary flip on a
    vanilla session). The per-dow seasonal mean is likewise an explicit
    exact-int-sum / count division, not avg().

    Scale posture: the corpus collapses to one row per (type, day) before
    anything else; every window and join after that runs on the bounded
    daily frame (365 x |types| rows/yr at any corpus size). The MA window
    is RANGE-based on the day number, so a missing day shrinks c7 and the
    row drops out instead of silently widening the window span."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.dayofmonth("ts").cast("int").alias("dom")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.partitionBy("event_type").orderBy("dom").rangeBetween(-3, 3)
    tr = daily.withColumn("s7", F.sum("n").over(w).cast("bigint")).withColumn(
        "c7", F.count(F.lit(1)).over(w).cast("bigint")
    )
    det = tr.filter(F.col("c7") == 7).select(
        "event_type",
        "dom",
        ((F.col("dom") - 1) % 7).alias("dow"),
        (7 * F.col("n") - F.col("s7")).alias("detr"),
    )
    seas = det.groupBy("event_type", "dow").agg(
        (F.sum("detr").cast("double") / F.count(F.lit(1))).alias("m")
    )
    resid = F.col("detr") - F.col("m")
    sums = (
        det.join(seas, ["event_type", "dow"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum(F.col("detr").cast("decimal(38,0)")).cast("double").alias("s1"),
            F.sum((F.col("detr") * F.col("detr")).cast("decimal(38,0)"))
            .cast("double")
            .alias("s2"),
            F.sort_array(F.collect_list(F.struct("dom", resid.alias("r")))).alias(
                "terms"
            ),
        )
        .withColumn("r1", F.expr("aggregate(terms, 0D, (acc, x) -> acc + x.r)"))
        .withColumn(
            "r2", F.expr("aggregate(terms, 0D, (acc, x) -> acc + x.r * x.r)")
        )
    )
    var_d = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_days")) / F.col(
        "n_days"
    )
    var_r = (F.col("r2") - F.col("r1") * F.col("r1") / F.col("n_days")) / F.col(
        "n_days"
    )
    return sums.select(
        "event_type",
        "n_days",
        F.round(var_d, 4).alias("var_detrended"),
        F.round(var_r, 4).alias("var_residual"),
        F.round(
            F.greatest(
                F.lit(0.0),
                F.lit(1.0)
                - (F.col("r2") - F.col("r1") * F.col("r1") / F.col("n_days"))
                / (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_days")),
            ),
            4,
        ).alias("seasonal_strength"),
    ).orderBy("event_type")


@register(
    "q282_automation_signature",
    oracle="""
    WITH ordered AS (
      SELECT user_id, epoch_us(ts) AS t_us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_us
      FROM events
    ),
    gaps AS (
      SELECT user_id, t_us - prev_us AS gap_us
      FROM ordered WHERE prev_us IS NOT NULL
    ),
    stats AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_gaps,
             quantile_cont(gap_us, 0.5) AS med_us,
             CAST(count(*) FILTER (WHERE gap_us < 60000000) AS BIGINT)
               AS n_fast
      FROM gaps GROUP BY user_id
    )
    SELECT user_id, n_gaps,
           round(med_us / 1e6, 3) AS median_gap_s,
           round(CAST(n_fast AS DOUBLE) / n_gaps, 4) AS pct_sub_minute,
           (med_us / 1e6 < 1800.0 AND CAST(n_fast AS DOUBLE) / n_gaps > 0.05)
             AS automated
    FROM stats
    ORDER BY user_id
    """,
)
def q282_automation_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user automation/bot signature from inter-event timing: the
    median gap between consecutive events (EXACT interpolated percentile
    over integer microsecond gaps) and the share of sub-minute gaps —
    the two standard burst features behind rate-based bot heuristics
    (human sessions have heavy-tailed think times; scripted traffic is
    metronomic and fast). A user flags as automated when the median gap
    is under 30 minutes AND more than 5% of gaps are sub-minute. The
    timing complement of q57's sessionizer and q198's inter-arrival
    fits — those model the aggregate process, this profiles each actor.

    Determinism: gaps are exact integer microseconds with the lag window
    ordered by (ts, event_id) — the unique tie-break means equal
    timestamps cannot reorder between engines; the interpolated median of
    integers is (a+b)/2, exact in double; flag comparisons run on
    identically-derived doubles in both engines.

    Scale posture: one shuffle on user_id serves the lag window and the
    per-user fold (same key — Catalyst reuses the partitioning); the
    output is one row per user. The exact percentile is per-user over
    that user's gaps — memory bounded by the heaviest actor, the standard
    posture for actor-profiling (a pathological single-actor flood is
    exactly what the flag exists to surface)."""
    ev = load_table(spark, sf_dir, "events")
    t_us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select("user_id", "ts", "event_id", t_us.alias("t_us")).withColumn(
        "prev_us", F.lag("t_us").over(w)
    )
    gaps = ordered.filter(F.col("prev_us").isNotNull()).select(
        "user_id", (F.col("t_us") - F.col("prev_us")).alias("gap_us")
    )
    stats = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.expr("percentile(gap_us, 0.5)").alias("med_us"),
        F.count(F.when(F.col("gap_us") < 60000000, 1)).cast("bigint").alias("n_fast"),
    )
    med_s = F.col("med_us") / F.lit(1e6)
    pct = F.col("n_fast").cast("double") / F.col("n_gaps")
    return stats.select(
        "user_id",
        "n_gaps",
        F.round(med_s, 3).alias("median_gap_s"),
        F.round(pct, 4).alias("pct_sub_minute"),
        ((med_s < 1800.0) & (pct > 0.05)).alias("automated"),
    ).orderBy("user_id")


@register(
    "q283_holt_linear_smoothing",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT CAST(extract(day FROM ts) AS INT) AS dom,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    ys AS (
      SELECT list(y ORDER BY dom) AS yl, list(dom ORDER BY dom) AS dl,
             len(list(y)) AS n
      FROM daily
    ),
    hw AS (
      SELECT 1 AS t,
             CAST(0 AS DOUBLE) AS f,
             CAST(yl[1] AS DOUBLE) AS l,
             CAST(yl[2] AS DOUBLE) - yl[1] AS b
      FROM ys
      UNION ALL
      SELECT t + 1,
             l + b,
             CAST(0.3 AS DOUBLE) * yl[t + 1] + CAST(0.7 AS DOUBLE) * (l + b),
             CAST(0.1 AS DOUBLE) * ((CAST(0.3 AS DOUBLE) * yl[t + 1]
                 + CAST(0.7 AS DOUBLE) * (l + b)) - l)
               + CAST(0.9 AS DOUBLE) * b
      FROM hw, ys WHERE t < n
    )
    SELECT dl[t] AS dom, yl[t] AS y,
           round(f, 4) AS forecast,
           round(yl[t] - f, 4) AS error,
           round(l, 4) AS level,
           round(b, 4) AS trend
    FROM hw, ys WHERE t >= 2
    ORDER BY dom
    """,
)
def q283_holt_linear_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double exponential) smoothing of the daily arrival
    series (Holt 1957; alpha = 0.3, beta = 0.1): per day, the one-step-
    ahead forecast l + b from the previous state, the realized error, and
    the updated level/trend — the forecasting rung above q266's EWMA
    chart (level only) and below q281's seasonal decomposition, and the
    classic capacity-planning baseline ("what did we expect today, how
    wrong were we").

    A smoothing recursion has no closed window form, so this is the
    repo's canonical SEQUENTIAL-FOLD shape at its limit: the corpus
    collapses to one bounded day-ordered list (<= 366 rows/yr at any
    corpus size), and the recurrence runs ONCE over that list — as an
    aggregate() accumulator fold here, as a recursive CTE in DuckDB —
    with the update expressions written in the identical association
    ((0.3*y + 0.7*(l+b)), then 0.1*(l_new - l) + 0.9*b) so every state
    is the identical double in both engines; outputs round at the edge.

    Scale posture: one shuffle collapses the corpus to the daily census;
    everything after runs on the 1-row list frame. The fold is O(days)
    driver-free sequential work INSIDE one task — exactly as cheap as the
    recursion is on any engine; the 100 TB cost lives entirely in the
    census aggregate."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.dayofmonth("ts").cast("int").alias("dom")).agg(
        F.count(F.lit(1)).cast("bigint").alias("y")
    )
    ys = (
        daily.agg(
            F.sort_array(F.collect_list(F.struct("dom", "y"))).alias("dy")
        )
        .select(
            F.expr("transform(dy, x -> x.dom)").alias("dl"),
            F.expr("transform(dy, x -> x.y)").alias("yl"),
        )
        .filter(F.size("yl") >= 2)
    )
    fold = """
    aggregate(
      sequence(2, size(yl)),
      named_struct(
        't', 1,
        'f', CAST(0 AS DOUBLE),
        'l', CAST(element_at(yl, 1) AS DOUBLE),
        'b', CAST(element_at(yl, 2) AS DOUBLE) - element_at(yl, 1),
        'out', array(named_struct('t', 1, 'f', CAST(0 AS DOUBLE),
                 'l', CAST(element_at(yl, 1) AS DOUBLE),
                 'b', CAST(element_at(yl, 2) AS DOUBLE) - element_at(yl, 1)))),
      (acc, t) -> named_struct(
        't', t,
        'f', acc.l + acc.b,
        'l', 0.3D * element_at(yl, t) + 0.7D * (acc.l + acc.b),
        'b', 0.1D * ((0.3D * element_at(yl, t) + 0.7D * (acc.l + acc.b)) - acc.l)
             + 0.9D * acc.b,
        'out', concat(acc.out, array(named_struct(
          't', t,
          'f', acc.l + acc.b,
          'l', 0.3D * element_at(yl, t) + 0.7D * (acc.l + acc.b),
          'b', 0.1D * ((0.3D * element_at(yl, t) + 0.7D * (acc.l + acc.b)) - acc.l)
               + 0.9D * acc.b)))),
      acc -> acc.out)
    """
    rows = ys.select("dl", "yl", F.explode(F.expr(fold)).alias("s")).filter(
        F.col("s.t") >= 2
    )
    return rows.select(
        F.element_at("dl", F.col("s.t")).alias("dom"),
        F.element_at("yl", F.col("s.t")).alias("y"),
        F.round(F.col("s.f"), 4).alias("forecast"),
        F.round(F.element_at("yl", F.col("s.t")) - F.col("s.f"), 4).alias("error"),
        F.round(F.col("s.l"), 4).alias("level"),
        F.round(F.col("s.b"), 4).alias("trend"),
    ).orderBy("dom")


@register(
    "q288_nelson_aalen_hazard",
    oracle=f"""
    WITH g AS (
      SELECT CASE
               WHEN lead(ts) OVER w IS NOT NULL
               THEN date_diff('microsecond', ts, lead(ts) OVER w) / 3600e6
               ELSE date_diff('microsecond', ts,
                              TIMESTAMP '2024-01-31 00:00:00') / 3600e6
             END AS gap_h,
             (lead(ts) OVER w IS NOT NULL) AS observed
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    coded AS (
      SELECT CAST(least(floor(gap_h), {_KM_HOURS}) AS BIGINT) AS bucket,
             CASE WHEN observed AND gap_h < {_KM_HOURS} THEN 1 ELSE 0 END
               AS event
      FROM g
    ),
    cells AS (
      SELECT bucket,
             CAST(SUM(event) AS BIGINT) AS d,
             CAST(SUM(1 - event) AS BIGINT) AS c
      FROM coded WHERE bucket < {_KM_HOURS} GROUP BY bucket
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM coded),
    grid AS (
      SELECT CAST(unnest(range(0, {_KM_HOURS})) AS BIGINT) AS bucket
    ),
    fulled AS (
      SELECT g.bucket, COALESCE(d, 0) AS d, COALESCE(c, 0) AS c
      FROM grid g LEFT JOIN cells USING (bucket)
    ),
    risk AS (
      SELECT bucket, d, c,
             n_total - COALESCE(SUM(d + c) OVER
               (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING), 0) AS n_risk
      FROM fulled, tot
    ),
    curve AS (
      SELECT bucket, d, n_risk,
             SUM(CAST(d AS DOUBLE) / n_risk) OVER
               (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS cum_h,
             SUM(ln(1.0 - CAST(d AS DOUBLE) / n_risk)) OVER
               (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS log_s
      FROM risk
    )
    SELECT bucket AS hour, CAST(n_risk AS BIGINT) AS n_risk, d AS n_events,
           round(CAST(d AS DOUBLE) / n_risk, 6) AS hazard,
           round(cum_h, 6) AS cum_hazard,
           round(exp(-cum_h), 6) AS s_fleming,
           round(exp(log_s), 6) AS s_km,
           round(exp(-cum_h) - exp(log_s), 6) AS s_gap
    FROM curve
    ORDER BY hour
    """,
)
def q288_nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard of the inter-event gap (Nelson 1972;
    Aalen 1978: H(t) = sum d_s/n_s) on q235's right-censored study frame,
    with the Fleming-Harrington survival exp(-H) set beside the
    Kaplan-Meier product limit and their gap per hour. NA is the
    estimator of choice when per-bucket event counts are small (its
    increments are unbiased hazard estimates and it never hits an exact
    zero the way KM does when d = n), and the hazard COLUMN itself is the
    quantity q53-style staleness monitors actually threshold — "given the
    gap reached t hours, how likely does it end this hour". s_gap ~ 0
    everywhere is the expected sanity bound (FH >= KM always, converging
    as n grows); a visible gap flags buckets thin enough that the
    estimator choice matters.

    Scale posture and determinism identical to q235 (one user_id shuffle,
    checkpointed census, fixed 24-row grid windows — allowlisted bound):
    hazard terms are bigint ratios; BOTH cumulative folds (the hazard sum
    and the log product) are running windows evaluated in bucket order in
    both engines; outputs round at 1e-6."""
    from ..registry import NOW

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    gap_h = F.when(
        nxt.isNotNull(),
        (nxt.cast("double") - F.col("ts").cast("double")) / 3600.0,
    ).otherwise(
        (F.lit(NOW).cast("timestamp").cast("double") - F.col("ts").cast("double"))
        / 3600.0
    )
    coded = ev.select(
        F.least(F.floor(gap_h), F.lit(_KM_HOURS)).cast("bigint").alias("bucket"),
        (nxt.isNotNull() & (gap_h < _KM_HOURS)).cast("int").alias("event"),
    )
    census_all = (
        coded.groupBy("bucket")
        .agg(
            F.sum("event").cast("bigint").alias("d"),
            F.sum(1 - F.col("event")).cast("bigint").alias("c"),
        )
        .localCheckpoint(eager=False)
    )
    cells = census_all.filter(F.col("bucket") < _KM_HOURS)
    tot = census_all.agg(
        F.sum(F.col("d") + F.col("c")).cast("bigint").alias("n_total")
    )
    grid = spark.range(0, _KM_HOURS).select(F.col("id").alias("bucket"))
    fulled = (
        grid.join(cells, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("d", F.lit(0)).alias("d"),
            F.coalesce("c", F.lit(0)).alias("c"),
        )
        .crossJoin(F.broadcast(tot))
    )
    w_prev = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )  # 24-row fixed grid: allowlisted bound
    w_cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n_risk = F.col("n_total") - F.coalesce(
        F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)
    )
    hz = F.col("d").cast("double") / F.col("n_risk")
    risk = fulled.select(
        "bucket",
        "d",
        n_risk.alias("n_risk"),
    ).select(
        "bucket",
        "d",
        "n_risk",
        hz.alias("hz"),
        F.log(1.0 - hz).alias("log_term"),
    )
    cum_h = F.sum("hz").over(w_cum)
    log_s = F.sum("log_term").over(w_cum)
    return risk.select(
        F.col("bucket").alias("hour"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").alias("n_events"),
        F.round("hz", 6).alias("hazard"),
        F.round(cum_h, 6).alias("cum_hazard"),
        F.round(F.exp(-cum_h), 6).alias("s_fleming"),
        F.round(F.exp(log_s), 6).alias("s_km"),
        F.round(F.exp(-cum_h) - F.exp(log_s), 6).alias("s_gap"),
    ).orderBy("hour")


@register(
    "q290_cuped_adjustment",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(sum(CASE WHEN extract(day FROM ts) <= 15 THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(sum(CASE WHEN extract(day FROM ts) > 15 THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    pooled AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM per_user
    ),
    theta AS (
      SELECT CAST(sx AS DOUBLE) / n AS mx,
             (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
               / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) AS th
      FROM pooled
    ),
    adj AS (
      SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 2) < '80'
                  THEN 'treat' ELSE 'control' END AS arm,
             y, y - th * (x - mx) AS ya
      FROM per_user, theta
    ),
    arms AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(CAST(ya AS DECIMAL(38,10))) AS DOUBLE) AS sa,
             CAST(sum(CAST(ya * ya AS DECIMAL(38,10))) AS DOUBLE) AS saa
      FROM adj GROUP BY arm
    )
    SELECT arm, n_users,
           round(CAST(sy AS DOUBLE) / n_users, 6) AS mean_y,
           round(sa / n_users, 6) AS mean_y_cuped,
           round((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n_users)
                 / n_users, 4) AS var_y,
           round((saa - sa * sa / n_users) / n_users, 4) AS var_y_cuped,
           round(1.0 - ((saa - sa * sa / n_users) / n_users)
                 / ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n_users)
                    / n_users), 4) AS var_reduction,
           round((SELECT th FROM theta), 6) AS theta
    FROM arms
    ORDER BY arm
    """,
)
def q290_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013 —
    the industry-standard pre-experiment covariate adjustment): the
    experiment metric is each user's second-half-of-month event count,
    the covariate is their FIRST-half count (pre-period data no
    treatment can touch), theta = cov(X,Y)/var(X) is fit on the pooled
    population, and the adjusted metric Y - theta(X - mean(X)) keeps
    every arm mean unbiased while stripping the between-user variance
    the covariate explains. Arms are a deterministic md5 hash split
    (q77's split discipline). var_reduction ~ rho^2 is the whole point:
    the same experiment detects an effect 1/(1-rho^2) times smaller at
    equal traffic — at 100 TB of raw events this is the difference
    between shipping an A/B readout weekly and monthly.

    Cross-engine exactness: X/Y are exact integer counts, so the pooled
    moments (sx, sy, sxy, sxx) and the per-arm raw moments (sy, syy) are
    exact BIGINTs; theta and each adjusted value are identical doubles
    (identical association); the per-arm sums of the adjusted metric
    fold through DECIMAL(38,10) per-row casts (the q91 discipline:
    identical doubles cast identically, decimal addition is
    order-free), so no float aggregation order exists anywhere.

    Scale posture: one shuffle collapses events to per-user counts; the
    pooled moment row is a broadcast scalar; arms aggregate the same
    per-user frame — three hash aggregates, no window, no second scan
    of the raw events."""
    ev = load_table(spark, sf_dir, "events")
    dom = F.dayofmonth("ts")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(dom <= 15, 1).otherwise(0)).cast("bigint").alias("x"),
        F.sum(F.when(dom > 15, 1).otherwise(0)).cast("bigint").alias("y"),
    )
    pooled = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    theta = pooled.select(
        (F.col("sx").cast("double") / F.col("n")).alias("mx"),
        (
            (F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy") / F.col("n"))
            / (F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / F.col("n"))
        ).alias("th"),
    )
    ya = F.col("y") - F.col("th") * (F.col("x") - F.col("mx"))
    adj = per_user.crossJoin(F.broadcast(theta)).select(
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 2) < "80",
            F.lit("treat"),
        )
        .otherwise(F.lit("control"))
        .alias("arm"),
        "y",
        ya.alias("ya"),
        "th",
    )
    arms = adj.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("ya").cast("decimal(38,10)")).cast("double").alias("sa"),
        F.sum((F.col("ya") * F.col("ya")).cast("decimal(38,10)"))
        .cast("double")
        .alias("saa"),
        F.first("th").alias("th"),
    )
    var_y = (
        F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / F.col("n_users")
    ) / F.col("n_users")
    var_a = (F.col("saa") - F.col("sa") * F.col("sa") / F.col("n_users")) / F.col(
        "n_users"
    )
    return arms.select(
        "arm",
        "n_users",
        F.round(F.col("sy").cast("double") / F.col("n_users"), 6).alias("mean_y"),
        F.round(F.col("sa") / F.col("n_users"), 6).alias("mean_y_cuped"),
        F.round(var_y, 4).alias("var_y"),
        F.round(var_a, 4).alias("var_y_cuped"),
        F.round(F.lit(1.0) - var_a / var_y, 4).alias("var_reduction"),
        F.round("th", 6).alias("theta"),
    ).orderBy("arm")


@register(
    "q298_attribution_models",
    oracle="""
    WITH purchases AS (
      SELECT user_id, event_id AS conv_id, ts AS conv_ts
      FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT user_id, event_id AS touch_id, ts AS touch_ts, event_type
      FROM events WHERE event_type <> 'purchase'
    ),
    pairs AS (
      SELECT p.conv_id, t.event_type, t.touch_ts, t.touch_id,
             count(*) OVER (PARTITION BY p.conv_id) AS k,
             row_number() OVER (PARTITION BY p.conv_id
                                ORDER BY t.touch_ts ASC, t.touch_id ASC)
               AS rk_first,
             row_number() OVER (PARTITION BY p.conv_id
                                ORDER BY t.touch_ts DESC, t.touch_id DESC)
               AS rk_last
      FROM purchases p JOIN touches t
        ON p.user_id = t.user_id
       AND t.touch_ts < p.conv_ts
       AND t.touch_ts >= p.conv_ts - INTERVAL 7 DAY
    )
    SELECT event_type AS channel,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(CASE WHEN rk_first = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS first_touch,
           CAST(sum(CASE WHEN rk_last = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS last_touch,
           round(CAST(sum(CAST(1.0 / k AS DECIMAL(38,12))) AS DOUBLE), 4)
             AS linear_credit
    FROM pairs
    GROUP BY event_type
    ORDER BY channel
    """,
)
def q298_attribution_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-model conversion attribution side by side — first-touch,
    last-touch, and linear — per channel (event type), over every
    purchase's 7-day pre-conversion touch window. q247 answers the
    single-touch question; real marketing/readout disputes are about
    MODEL DISAGREEMENT, which only shows when the models share one touch
    frame: a channel with high first-touch but low last-touch credit is
    a discovery channel, the reverse is a closer, and linear is the
    compromise everyone actually ships. Position-based models (Shao &
    Li 2011 on data-driven attribution — the public framing) all reduce
    to weights over this same frame.

    Determinism: the touch frame is an equi-join on user_id with an
    exact timestamp interval; ranks carry (ts, event_id) total orders;
    first/last credits are exact counts; the linear 1/k credits are
    identical doubles summed through DECIMAL(38,12) per-row casts (the
    q91 discipline), so no float aggregation order exists.

    Scale posture: ONE shuffle on user_id co-locates purchases and
    touches; the interval condition bounds pairs by per-user 7-day
    activity (attribution's inherent cost); the per-conversion windows
    partition on conv_id; the report collapses to |channels| rows."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("conv_id"),
        F.col("ts").alias("conv_ts"),
    )
    touches = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("ts").alias("touch_ts"),
        "event_type",
    )
    pairs = purchases.join(touches, "user_id").filter(
        (F.col("touch_ts") < F.col("conv_ts"))
        & (F.col("touch_ts") >= F.col("conv_ts") - F.expr("INTERVAL 7 DAY"))
    )
    wk = Window.partitionBy("conv_id")
    wf = Window.partitionBy("conv_id").orderBy(
        F.col("touch_ts").asc(), F.col("touch_id").asc()
    )
    wl = Window.partitionBy("conv_id").orderBy(
        F.col("touch_ts").desc(), F.col("touch_id").desc()
    )
    ranked = pairs.select(
        "conv_id",
        "event_type",
        F.count(F.lit(1)).over(wk).alias("k"),
        F.row_number().over(wf).alias("rk_first"),
        F.row_number().over(wl).alias("rk_last"),
    )
    return (
        ranked.groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum(F.when(F.col("rk_first") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("first_touch"),
            F.sum(F.when(F.col("rk_last") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("last_touch"),
            F.round(
                F.sum((F.lit(1.0) / F.col("k")).cast("decimal(38,12)")).cast(
                    "double"
                ),
                4,
            ).alias("linear_credit"),
        )
        .orderBy("channel")
    )


@register(
    "q301_rfm_segments",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(date_diff('day', max(ts), TIMESTAMP '{NOW}') AS BIGINT)
               AS recency_d,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS monetary
      FROM events GROUP BY user_id
    ),
    cuts AS (
      SELECT quantile_cont(recency_d, [0.2, 0.4, 0.6, 0.8]) AS rc,
             quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS fc,
             quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS mc
      FROM per_user
    ),
    scored AS (
      SELECT user_id, recency_d, frequency,
             round(monetary, 2) AS monetary,
             5 - len(list_filter(rc, c -> c < recency_d)) AS r_score,
             1 + len(list_filter(fc, c -> c < frequency)) AS f_score,
             1 + len(list_filter(mc, c -> c < monetary)) AS m_score
      FROM per_user, cuts
    )
    SELECT user_id, recency_d, frequency, monetary,
           CAST(r_score AS INT) AS r_score,
           CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           CASE
             WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
               THEN 'champion'
             WHEN r_score >= 4 AND f_score >= 3 THEN 'loyal'
             WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
             WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
             ELSE 'regular'
           END AS segment
    FROM scored
    ORDER BY user_id
    """,
)
def q301_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (Hughes 1994's recency/frequency/monetary scoring
    — the standard customer-value grid): per user, days since last event,
    event count, and decimal-exact value total, each scored 1-5 against
    the population's quintile cuts, then mapped to the classic named
    segments (champion / loyal / at_risk / hibernating / regular).
    Recency scores INVERT (recent = 5). The per-actor summary view that
    q282 (timing signature) and q247/q298 (attribution) hang off.

    Determinism: R and F are exact integers and M folds through
    DECIMAL(38,10) casts; the quintile cuts are interpolated percentiles
    — both engines use the R-7 (n-1)p linear-interpolation convention on
    identical inputs — attached as a 1-row scalar; scoring is a strict
    `cut < metric` count, so ties at a cut land identically.

    Scale posture: one shuffle collapses events to per-user rows; the
    cut computation is one scalar aggregate over that frame; scoring is
    scan-side map work against the broadcast cuts (NO ntile over the
    user table — a global rank window over users is exactly what the
    unpartitioned-window invariant forbids at 100 TB)."""
    from ..registry import NOW

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.datediff(F.lit(NOW).cast("timestamp"), F.max("ts"))
        .cast("bigint")
        .alias("recency_d"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.sum(F.col("value").cast("decimal(38,10)")).cast("double").alias("monetary"),
    )
    cuts = per_user.agg(
        F.expr("percentile(recency_d, array(0.2, 0.4, 0.6, 0.8))").alias("rc"),
        F.expr("percentile(frequency, array(0.2, 0.4, 0.6, 0.8))").alias("fc"),
        F.expr("percentile(monetary, array(0.2, 0.4, 0.6, 0.8))").alias("mc"),
    )
    nlt = lambda arr, m: F.size(F.filter(arr, lambda c: c < m))  # noqa: E731
    scored = per_user.crossJoin(F.broadcast(cuts)).select(
        "user_id",
        "recency_d",
        "frequency",
        F.round("monetary", 2).alias("monetary"),
        (F.lit(5) - nlt(F.col("rc"), F.col("recency_d"))).cast("int").alias("r_score"),
        (F.lit(1) + nlt(F.col("fc"), F.col("frequency"))).cast("int").alias("f_score"),
        (F.lit(1) + nlt(F.col("mc"), F.col("monetary"))).cast("int").alias("m_score"),
    )
    seg = (
        F.when(
            (F.col("r_score") >= 4) & (F.col("f_score") >= 4) & (F.col("m_score") >= 4),
            "champion",
        )
        .when((F.col("r_score") >= 4) & (F.col("f_score") >= 3), "loyal")
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 4), "at_risk")
        .when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "hibernating")
        .otherwise("regular")
    )
    return scored.withColumn("segment", seg).orderBy("user_id")


@register(
    "q302_fano_burstiness",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS c
      FROM events
      GROUP BY event_type, extract(day FROM ts), extract(hour FROM ts)
    ),
    grid AS (
      SELECT CAST(24 * count(DISTINCT extract(day FROM ts)) AS BIGINT) AS nb
      FROM events
    ),
    per AS (
      SELECT event_type,
             CAST(sum(c) AS BIGINT) AS s1,
             CAST(sum(c * c) AS BIGINT) AS s2
      FROM hourly GROUP BY event_type
    )
    SELECT event_type, nb AS n_bins, s1 AS n_events,
           round(CAST(s1 AS DOUBLE) / nb, 4) AS mean_per_hour,
           round((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / nb) / nb, 4)
             AS var_per_hour,
           round(((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / nb) / nb)
                 / (CAST(s1 AS DOUBLE) / nb), 4) AS fano,
           ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / nb) / nb)
             / (CAST(s1 AS DOUBLE) / nb) > 1.5 AS bursty
    FROM per, grid
    ORDER BY event_type
    """,
)
def q302_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (index of dispersion, var/mean of hourly arrival counts)
    per event type — the Poisson-ness test for event streams (Fano 1947;
    F = 1 under Poisson, F >> 1 = bursty/clumped, F < 1 = regularized):
    the arrival-side complement of q150's term burstiness and the
    diagnostic that says whether q198's exponential inter-arrival fit and
    q266's control limits (both Poisson-flavored) are even applicable.
    Missing hours count as TRUE ZERO bins: the bin denominator is the
    full 24 x observed-days grid, not just hours that happened to have
    events — dropping empty bins is the classic Fano mistake that biases
    F down exactly for the burstiest types.

    Determinism: zeros contribute nothing to the sums, so s1/s2 over
    OBSERVED cells plus the exact grid size give the exact-sum variance
    ((s2 - s1^2/N)/N, the q281 discipline) — every output derives from
    three exact BIGINTs; the >1.5 flag compares identically-derived
    doubles.

    Scale posture: one hash aggregate to (type, day, hour) cells, one to
    per-type sums; the grid size is a 1-row scalar; output is |types|
    rows."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.dayofmonth("ts").alias("dom"), F.hour("ts").alias("hod")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    grid = ev.agg(
        (24 * F.countDistinct(F.dayofmonth("ts"))).cast("bigint").alias("nb")
    )
    per = hourly.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("nb")
    var = (
        F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("nb")
    ) / F.col("nb")
    return (
        per.crossJoin(F.broadcast(grid))
        .select(
            "event_type",
            F.col("nb").alias("n_bins"),
            F.col("s1").alias("n_events"),
            F.round(mean, 4).alias("mean_per_hour"),
            F.round(var, 4).alias("var_per_hour"),
            F.round(var / mean, 4).alias("fano"),
            (var / mean > 1.5).alias("bursty"),
        )
        .orderBy("event_type")
    )


@register(
    "q303_markov_entropy_rate",
    oracle="""
    WITH ordered AS (
      SELECT event_type AS a,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS b
      FROM events
    ),
    cells AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab
      FROM ordered WHERE b IS NOT NULL GROUP BY a, b
    ),
    rows_ AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a FROM cells GROUP BY a),
    cols_ AS (SELECT b, CAST(sum(c_ab) AS BIGINT) AS c_b FROM cells GROUP BY b),
    tot AS (SELECT CAST(sum(c_ab) AS BIGINT) AS t FROM cells),
    one AS (
      SELECT list(c.c_ab ORDER BY c.a, c.b) AS lab,
             list(r.c_a ORDER BY c.a, c.b) AS la,
             CAST(count(*) AS BIGINT) AS k
      FROM cells c JOIN rows_ r ON c.a = r.a
    ),
    onem AS (
      SELECT list(c_b ORDER BY b) AS lb, CAST(count(*) AS BIGINT) AS km
      FROM cols_
    )
    SELECT t AS n_transitions, k AS n_cells,
           round(-list_sum(list_transform(range(1, km + 1), i ->
             CAST(lb[i] AS DOUBLE) / t * ln(CAST(lb[i] AS DOUBLE) / t))),
             6) AS h_marginal,
           round(-list_sum(list_transform(range(1, k + 1), i ->
             CAST(lab[i] AS DOUBLE) / t * ln(CAST(lab[i] AS DOUBLE) / la[i]))),
             6) AS h_rate,
           round(-list_sum(list_transform(range(1, km + 1), i ->
             CAST(lb[i] AS DOUBLE) / t * ln(CAST(lb[i] AS DOUBLE) / t)))
             - (-list_sum(list_transform(range(1, k + 1), i ->
               CAST(lab[i] AS DOUBLE) / t * ln(CAST(lab[i] AS DOUBLE) / la[i])))),
             6) AS info_gain
    FROM one, onem, tot
    """,
)
def q303_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov entropy rate of the per-user event sequence
    (Shannon 1948: H(B|A) = -sum p(a,b) ln p(b|a)) beside the marginal
    entropy H(B), with the information gain H(B) - H(B|A) — how many nats
    of next-event uncertainty knowing the current event removes. The
    information-theoretic summary of q263's transition matrix (which
    tests whether first-order is ADEQUATE; this says how much the order
    BUYS) and the principled version of q188's lift-vs-uniform readout.
    Gain ~ 0 means event types arrive memorylessly and any sequence
    model is wasted capacity; large gain justifies sequence features in
    the q124 pipeline.

    Determinism: all cell/marginal counts are exact BIGINTs; both
    entropy folds run in fixed (a, b) / (b) cell order on bounded
    |types|^2 frames (the q151 discipline); info_gain is written as the
    same two folds re-evaluated and subtracted — identical association —
    rather than a new expression.

    Scale posture: one user_id shuffle for the lead() pairing, hash
    aggregates to the |types|^2 cell census, folds on 1-row list frames."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        F.col("event_type").alias("a"), F.lead("event_type").over(w).alias("b")
    )
    cells = (
        ordered.filter(F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
    )
    rows_ = cells.groupBy("a").agg(F.sum("c_ab").cast("bigint").alias("c_a"))
    cols_ = cells.groupBy("b").agg(F.sum("c_ab").cast("bigint").alias("c_b"))
    tot = cells.agg(F.sum("c_ab").cast("bigint").alias("t"))
    one = (
        cells.join(rows_, "a")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("a", "b", "c_ab", "c_a"))
            ).alias("terms"),
            F.count(F.lit(1)).cast("bigint").alias("k"),
        )
    )
    onem = cols_.agg(
        F.sort_array(F.collect_list(F.struct("b", "c_b"))).alias("mterms"),
        F.count(F.lit(1)).cast("bigint").alias("km"),
    )
    h_marg = -F.expr(
        "aggregate(mterms, 0D, (acc, x) -> acc + "
        "CAST(x.c_b AS DOUBLE) / t * ln(CAST(x.c_b AS DOUBLE) / t))"
    )
    h_rate = -F.expr(
        "aggregate(terms, 0D, (acc, x) -> acc + "
        "CAST(x.c_ab AS DOUBLE) / t * ln(CAST(x.c_ab AS DOUBLE) / x.c_a))"
    )
    return (
        one.crossJoin(F.broadcast(onem))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("t").alias("n_transitions"),
            F.col("k").alias("n_cells"),
            F.round(h_marg, 6).alias("h_marginal"),
            F.round(h_rate, 6).alias("h_rate"),
            F.round(h_marg - h_rate, 6).alias("info_gain"),
        )
    )


@register(
    "q304_peak_concurrency",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    ),
    sess AS (
      SELECT user_id, sid, min(ts) AS s_start, max(ts) AS s_end
      FROM numbered GROUP BY user_id, sid
    ),
    bounds AS (
      SELECT s_start AS t, 1 AS d, user_id, sid FROM sess
      UNION ALL
      SELECT s_end, -1, user_id, sid FROM sess
    ),
    run AS (
      SELECT t, d,
             CAST(sum(d) OVER (ORDER BY t, d DESC, user_id, sid
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS load
      FROM bounds
    ),
    daily AS (
      SELECT CAST(extract(day FROM t) AS INT) AS dom,
             CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS sessions_started,
             CAST(max(load) AS BIGINT) AS peak
      FROM run GROUP BY 1
    ),
    peak_at AS (
      SELECT CAST(extract(day FROM t) AS INT) AS dom, load, min(t) AS at_ts
      FROM run GROUP BY 1, 2
    )
    SELECT d.dom, d.sessions_started, d.peak, p.at_ts AS peak_ts
    FROM daily d JOIN peak_at p ON d.dom = p.dom AND d.peak = p.load
    ORDER BY d.dom
    """,
)
def q304_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the sweep-line maximum-overlap
    query (+1 at each session start, -1 at each end, running sum, max):
    the capacity-planning number every serving layer budgets against,
    over the q57 gap-sessions. Interval endpoints are INCLUSIVE (starts
    sort before ends at the same instant), so a zero-length single-event
    session still counts while it exists; peak_ts is the first instant
    each day's peak is reached.

    Scale posture — the whole point of this query: the sweep's running
    sum is a global prefix over a corpus-sized boundary stream, which is
    NEVER computed as one unpartitioned window. It is the q208/q107
    TWO-LEVEL decomposition on SUM: boundaries range-bucket into 256
    order-preserving chunks of the time span (bounds from a 1-row
    min/max scalar), the within-chunk running sum is a window
    PARTITIONED by chunk, per-chunk sums reduce to a 256-row head table
    whose own prefix sum is the only unpartitioned window (bounded by
    construction, allowlisted), and prior-chunk offset + local running
    sum reassembles the exact global load. The oracle computes the same
    sweep with one flat window, proving the decomposition row for row.

    Determinism: the sweep order (t, d DESC, user_id, sid) is total;
    loads are exact integers; peak attribution joins on the exact
    (day, load) pair."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    numbered = ev.withColumn(
        "is_new",
        F.when(
            gap_us.isNull() | (gap_us > SESSION_GAP_MIN * 60 * 1_000_000), 1
        ).otherwise(0),
    ).withColumn(
        "sid", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    # The session table feeds a diamond (bounds -> tagged is read by both
    # the local window and the chunk-head aggregate); without a
    # materialization the sessionize window pipeline — the expensive part —
    # re-executes once per consumer (partial aggregation below the head
    # exchange defeats ReuseExchange). Checkpoint the |sessions|-row table
    # once; every recompute downstream is then a cheap union/project.
    sess = numbered.groupBy("user_id", "sid").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    ).localCheckpoint(eager=False)
    bounds = sess.select(
        F.col("s_start").alias("t"), F.lit(1).alias("d"), "user_id", "sid"
    ).unionAll(
        sess.select(
            F.col("s_end").alias("t"), F.lit(-1).alias("d"), "user_id", "sid"
        )
    )
    us = F.unix_micros(F.col("t"))
    brange = bounds.agg(
        F.min(us).alias("lo"), F.max(us).alias("hi")
    )
    span = F.col("hi") - F.col("lo") + 1
    chunk = F.floor((us - F.col("lo")) * 256 / span)
    tagged = bounds.crossJoin(F.broadcast(brange)).select(
        "t", "d", "user_id", "sid", us.alias("us"), chunk.alias("chunk")
    )
    w_local = (
        Window.partitionBy("chunk")
        .orderBy(F.col("us").asc(), F.col("d").desc(), "user_id", "sid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = tagged.withColumn("local_run", F.sum("d").over(w_local))
    heads = tagged.groupBy("chunk").agg(F.sum("d").alias("csum"))
    w_head = Window.orderBy("chunk").rowsBetween(
        Window.unboundedPreceding, -1
    )  # 256 rows — bounded by construction
    offsets = heads.select(
        "chunk", F.coalesce(F.sum("csum").over(w_head), F.lit(0)).alias("prior")
    )
    run = local.join(F.broadcast(offsets), "chunk").select(
        "t",
        "d",
        (F.col("prior") + F.col("local_run")).cast("bigint").alias("load"),
    )
    # One consumption of `run`: the (dom, load) rollup carries everything
    # both outputs need — per-cell start counts and first-instant — so the
    # daily summary is a second-level rollup of the tiny grid (<= days x
    # distinct loads rows) instead of a second full pass over the sweep.
    g = run.groupBy(
        F.dayofmonth("t").cast("int").alias("dom"), F.col("load")
    ).agg(
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_starts"),
        F.min("t").alias("at_ts"),
    )
    daily = g.groupBy("dom").agg(
        F.sum("n_starts").cast("bigint").alias("sessions_started"),
        F.max("load").cast("bigint").alias("peak"),
    )
    return (
        daily.join(
            # g is corpus-growing (distinct concurrency levels), so no
            # broadcast hint — AQE picks the strategy from runtime sizes
            g,
            (daily.dom == g.dom) & (daily.peak == g.load),
        )
        .select(
            daily.dom.alias("dom"),
            "sessions_started",
            "peak",
            F.col("at_ts").alias("peak_ts"),
        )
        .orderBy("dom")
    )


@register(
    "q305_session_basket_lift",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    ),
    baskets AS (
      SELECT DISTINCT user_id, sid, event_type FROM numbered
    ),
    nb AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM (
        SELECT DISTINCT user_id, sid FROM baskets)
    ),
    per AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS b FROM baskets
      GROUP BY event_type
    ),
    pairs AS (
      SELECT x.event_type AS a, y.event_type AS b_,
             CAST(count(*) AS BIGINT) AS b_ab
      FROM baskets x JOIN baskets y
        ON x.user_id = y.user_id AND x.sid = y.sid
       AND x.event_type < y.event_type
      GROUP BY 1, 2
    )
    SELECT p.a, p.b_ AS b, pa.b AS baskets_a, pb.b AS baskets_b,
           p.b_ab AS baskets_both,
           round(CAST(p.b_ab AS DOUBLE) / n, 6) AS support,
           round(CAST(p.b_ab AS DOUBLE) * n / (CAST(pa.b AS DOUBLE) * pb.b), 4)
             AS lift
    FROM pairs p
    JOIN per pa ON p.a = pa.event_type
    JOIN per pb ON p.b_ = pb.event_type, nb
    ORDER BY a, b
    """,
)
def q305_session_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket lift between event types with SESSIONS as baskets
    (Agrawal & Srikant 1994's support/lift, the q57 gap-sessions as the
    transaction unit): lift(a,b) = P(a,b)/(P(a)P(b)) over baskets — > 1
    means the two event types co-occur within a session beyond chance
    (a real flow), ~1 means independent arrivals. q194 mines frequent
    pairs over DOCUMENT-term baskets; this is the behavioral-sequence
    counterpart, and (vs q303's entropy rate) it names WHICH pairs carry
    the sequence structure rather than how much structure exists.

    Determinism: every count is exact (distinct presence per basket; the
    pair census self-joins the deduplicated presence table on the basket
    key); support and lift are single identical-association expressions
    rounded at the edge.

    Scale posture: one user_id shuffle builds sessions (q57); presence
    dedup and the pair self-join key on (user, sid) — work bounded by
    |types| per basket, output bounded by |types|^2; the basket total is
    a 1-row broadcast scalar."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    numbered = ev.withColumn(
        "is_new",
        F.when(
            gap_us.isNull() | (gap_us > SESSION_GAP_MIN * 60 * 1_000_000), 1
        ).otherwise(0),
    ).withColumn(
        "sid", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    baskets = numbered.select("user_id", "sid", "event_type").distinct()
    nb = baskets.select("user_id", "sid").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    per = baskets.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("b")
    )
    x = baskets.select("user_id", "sid", F.col("event_type").alias("a"))
    y = baskets.select("user_id", "sid", F.col("event_type").alias("b"))
    pairs = (
        x.join(y, ["user_id", "sid"])
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("b_ab"))
    )
    pa = per.select(F.col("event_type").alias("a"), F.col("b").alias("baskets_a"))
    pb = per.select(F.col("event_type").alias("b"), F.col("b").alias("baskets_b"))
    return (
        pairs.join(F.broadcast(pa), "a")
        .join(F.broadcast(pb), "b")
        .crossJoin(F.broadcast(nb))
        .select(
            "a",
            "b",
            "baskets_a",
            "baskets_b",
            F.col("b_ab").alias("baskets_both"),
            F.round(F.col("b_ab").cast("double") / F.col("n"), 6).alias("support"),
            F.round(
                F.col("b_ab").cast("double")
                * F.col("n")
                / (F.col("baskets_a").cast("double") * F.col("baskets_b")),
                4,
            ).alias("lift"),
        )
        .orderBy("a", "b")
    )
