"""Deterministic sampling & split assignment for training-data pipelines.

A 100 TB corpus is never trained on raw: pipelines need reproducible
subsampling, per-stratum rate control (e.g. downsample dominant languages),
and stable train/val/test splits that survive re-runs and late-arriving
data. All three are expressed as pure column arithmetic on a content-stable
key hash — md5(doc_id) — so:

  * the decision is per-row with NO shuffle, no RNG state, no seed
    coordination across executors: a narrow map stage that pushes down
    into the scan;
  * membership is stable under repartitioning, retries, and incremental
    reprocessing (the same row always lands in the same split);
  * the DuckDB oracle computes the identical md5 prefix, making sampling
    — normally unverifiable randomness — exactly hash-checkable.

The hex-prefix-vs-threshold comparison gives rate p = threshold/256 per
2-hex-char prefix (uniform because md5 output bits are uniform). The
reference has no sampling surface (SURVEY §2.4 A5 absent); this is §7
Phase-3 pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


def hash_bucket(key: F.Column | str, nchars: int = 2) -> F.Column:
    """First `nchars` hex chars of md5(key-as-string): a uniform,
    engine-portable bucket label in ['00'..'ff'] (for nchars=2)."""
    col = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(col.cast("string")), 1, nchars)


@register(
    "q75_hash_sample",
    oracle="""
    SELECT doc_id, source, lang, n_chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
    """,
)
def q75_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% uniform deterministic sample (md5 prefix < 0x1a = 26/256).
    Unlike df.sample(), membership is a pure function of the key: stable
    across runs, partitionings, and engines — which is why the oracle can
    hash-match it row for row."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(hash_bucket("doc_id") < "1a").select(
        "doc_id", "source", "lang", "n_chars"
    )


@register(
    "q76_stratified_sample",
    oracle="""
    SELECT lang, count(*) AS n_sampled, round(sum(n_chars) / 1000.0, 2) AS kchars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
          CASE WHEN lang = 'en' THEN '33' ELSE 'cc' END
    GROUP BY lang
    """,
)
def q76_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified rate control: downsample the dominant language (en at
    ~20%, 0x33/256) while keeping ~80% (0xcc/256) of everything else — the
    standard language-rebalancing step in corpus prep. Per-stratum rates
    are just a CASE over the same hash, so the whole operation stays a
    scan-side filter; only the tiny per-lang rollup shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    threshold = F.when(F.col("lang") == "en", F.lit("33")).otherwise(F.lit("cc"))
    return (
        docs.filter(hash_bucket("doc_id") < threshold)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.sum("n_chars") / 1000.0, 2).alias("kchars"),
        )
    )


@register(
    "q77_train_val_test_split",
    oracle="""
    SELECT source,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0d' THEN 'test'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a' THEN 'val'
                ELSE 'train' END AS split,
           count(*) AS n_docs,
           min(doc_id) AS min_doc_id
    FROM documents
    GROUP BY source, split
    """,
)
def q77_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable ~5/5/90 train/val/test assignment from disjoint hash ranges.
    Because the split is keyed on content identity rather than position or
    RNG, re-running over a grown corpus never moves an old row between
    splits (no test-set leakage on incremental refreshes)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket("doc_id")
    split = (
        F.when(bucket < "0d", F.lit("test")).when(bucket < "1a", F.lit("val")).otherwise(F.lit("train"))
    )
    return (
        docs.withColumn("split", split)
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
    )


@register(
    "q89_per_group_exact_sample",
    oracle="""
    SELECT doc_id, lang, rn
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    WHERE rn <= 5
    """,
)
def q89_per_group_exact_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum sampling: rank rows inside each stratum by
    their key hash (a deterministic, uniform, reshuffling-stable order) and
    keep the first k — the fixed-quota counterpart to q76's rate-based
    sampling (eval sets, per-language probes). Spark pushes rank<=k through
    WindowGroupLimit: each partition keeps only k rows per group BEFORE the
    shuffle, so the exchange carries ~k x |strata| rows, not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
    )


@register(
    "q102_weighted_priority_sample",
    oracle="""
    SELECT doc_id, lang, n_chars,
           CAST(n_chars AS DOUBLE)
             / (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) + 1)
             AS priority
    FROM documents
    ORDER BY priority DESC, doc_id ASC
    LIMIT 50
    """,
)
def q102_weighted_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted priority sampling (Duffield et al.): keep the top-k rows by
    priority w/u where u is a uniform key — long documents are
    proportionally more likely to survive, the standard size-weighted
    subsample for token-budgeted training mixes. u derives from a 48-bit
    md5 prefix, so: exact in a double, reshuffle/rerun-stable, and the
    single integer division is IEEE-identical in every engine — a sampling
    step the oracle can hash-match bit for bit. Plan: scan-side narrow
    projection + TakeOrderedAndProject; nothing shuffles but the top-k."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10).cast("bigint")
    priority = F.col("n_chars").cast("double") / (h + F.lit(1))
    return (
        docs.select("doc_id", "lang", "n_chars", priority.alias("priority"))
        .orderBy(F.col("priority").desc(), F.col("doc_id").asc())
        .limit(50)
    )


@register(
    "q144_curriculum_stages",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
             round(LEAST(len(regexp_split_to_array(trim(text), '\\s+')) / 100.0, 1.0) * 0.5
                   + LEAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                 t -> list_contains(['the', 'a', 'of', 'and']::VARCHAR[], t)))
                           / CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE)
                           * 5.0, 1.0) * 0.5, 4) AS q
      FROM documents
    ),
    staged AS (
      SELECT *, ntile(4) OVER (ORDER BY q DESC, doc_id) AS stage FROM scored
    )
    SELECT stage,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(min(q), 4) AS min_score,
           round(max(q), 4) AS max_score,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM staged GROUP BY stage
    """,
)
def q144_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum staging: rank the corpus by the q62 quality score and cut
    it into 4 equal-population stages (ntile) — the "train on clean data
    first" schedule used by curriculum-ordered pretraining. The report per
    stage (population, score range, token mass, language spread) is what a
    schedule designer checks before committing shard order.

    Determinism: the stage assignment reproduces ntile over a TOTAL order
    (rounded score desc, doc_id) — identical in both engines; every
    reported value is an integer or a rounded double of one.

    Scale posture: the global rank is NEVER a corpus-wide unpartitioned
    window. The score is rounded to 4 decimals, so its codomain is <=
    10001 distinct values — a bounded dimension. The q107 two-level
    prefix discipline, keyed by VALUE instead of bucket: (1) per-score
    populations (HashAggregate, parallel), (2) a running count over that
    bounded score table (the only unpartitioned window, <= 10001 rows,
    allowlisted in plans.UNPARTITIONED_WINDOW_ALLOWLIST) gives each score
    its strictly-better population n_above, (3) the within-score rank is
    a window PARTITIONED by score (parallel), so global rn = n_above +
    within-score row_number, and (4) the ntile boundary ranks come in
    closed form from the 1-row corpus count (first N%4 tiles take the
    extra row — the exact ntile contract), attached as a broadcast
    scalar. The oracle keeps the flat ntile window, proving the
    decomposition exact."""
    from .text import STOPWORDS

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(toks)
    stop_ratio = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / n_tokens.cast(
        "double"
    )
    q = F.round(
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.5
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.5,
        4,
    )
    # The scored frame is read by three branches (per-score counts, the
    # corpus total, the final stage assignment); lazy localCheckpoint
    # materializes the narrow (doc_id, lang, n_tokens, q) projection once
    # so the text is tokenized and scored in ONE pass, not three.
    scored = docs.select(
        "doc_id", "lang", n_tokens.alias("n_tokens"), q.alias("q")
    ).localCheckpoint(eager=False)
    counts = scored.groupBy("q").agg(F.count(F.lit(1)).alias("n_at"))
    w_above = (
        Window.orderBy(F.col("q").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # <= 10001 rows: the rounded score codomain, bounded by construction
    w_all = Window.orderBy(F.col("q").desc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # n_total rides the SAME bounded window pass as n_above — one window
    # over the <=10001-row score table yields both, so the corpus total
    # needs no second scan of `scored` and no separate broadcast exchange
    cum = counts.select(
        "q",
        F.coalesce(F.sum("n_at").over(w_above), F.lit(0)).alias("n_above"),
        F.sum("n_at").over(w_all).alias("n_total"),
    )
    w_in = Window.partitionBy("q").orderBy("doc_id")
    base = F.floor(F.col("n_total") / 4)
    rem = F.col("n_total") % 4
    rn = F.col("n_above") + F.row_number().over(w_in)

    def boundary(k: int):  # last global rank of tile k (ntile contract)
        return k * base + F.least(F.lit(k), rem)

    stage = (
        F.lit(1)
        + (rn > boundary(1)).cast("int")
        + (rn > boundary(2)).cast("int")
        + (rn > boundary(3)).cast("int")
    ).cast("int")
    return (
        scored.join(F.broadcast(cum), "q")
        .select("lang", "n_tokens", "q", stage.alias("stage"))
        .groupBy("stage")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.min("q"), 4).alias("min_score"),
            F.round(F.max("q"), 4).alias("max_score"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
        )
    )


# Per-source retention cap (q156): at most _CAP_M docs survive per source,
# best-quality-first — the CommonCrawl-style per-domain cap that stops one
# hot domain from flooding a training mix.
_CAP_M = 15


def _q156_oracle() -> str:
    from .text import STOPWORDS

    return f"""
    WITH q AS (
      SELECT doc_id, source,
             LEAST(len(regexp_split_to_array(trim(text), '\\s+')) / 100.0, 1.0)
               * 0.5
             + LEAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                           t -> list_contains({list(STOPWORDS)!r}::VARCHAR[], t)))
                     / CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                            AS DOUBLE) * 5.0, 1.0) * 0.5 AS quality
      FROM documents
    ),
    r AS (
      SELECT source, doc_id, quality,
             row_number() OVER (PARTITION BY source
                                ORDER BY quality DESC, doc_id ASC) AS rk
      FROM q
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN rk <= {_CAP_M} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(sum(CASE WHEN rk > {_CAP_M} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped,
           round(min(CASE WHEN rk <= {_CAP_M} THEN quality END), 4)
             AS min_kept_quality,
           round(avg(CASE WHEN rk <= {_CAP_M} THEN quality END), 4)
             AS avg_kept_quality
    FROM r GROUP BY source
    """


@register("q156_source_quality_cap", oracle=_q156_oracle())
def q156_source_quality_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source retention cap, best-quality-first: rank every document
    inside its source by the q62 quality score (ties -> doc_id) and keep
    the top {_CAP_M}; report the per-source retention census (kept,
    dropped, kept-quality floor/mean). This is the per-domain cap every
    web-scale pipeline applies so one template-heavy domain can't flood
    the mix — composed with quality scoring so the cap keeps the BEST
    slice of each source, not a random one.

    Determinism: quality derives from exact integer token counts; the
    rank tie-breaks on doc_id; kept-side min/avg fold <= {_CAP_M} doubles,
    rounded.

    Scale posture: one hash exchange on source shared by the rank window
    and the census aggregate (the q109 discipline). The census never
    materializes the kept set — at 100 TB the same rank column gates the
    actual output write (filter rk <= M), a narrow continuation of this
    exact plan."""
    from .text import STOPWORDS

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(toks)
    stop_ratio = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / n_tokens.cast(
        "double"
    )
    quality = F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.5 + F.least(
        stop_ratio * 5.0, F.lit(1.0)
    ) * 0.5
    w = Window.partitionBy("source").orderBy(F.col("quality").desc(), F.col("doc_id"))
    ranked = docs.select("doc_id", "source", quality.alias("quality")).withColumn(
        "rk", F.row_number().over(w)
    )
    kept_q = F.when(F.col("rk") <= _CAP_M, F.col("quality"))
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum((F.col("rk") <= _CAP_M).cast("int")).cast("bigint").alias("n_kept"),
        F.sum((F.col("rk") > _CAP_M).cast("int")).cast("bigint").alias("n_dropped"),
        F.round(F.min(kept_q), 4).alias("min_kept_quality"),
        F.round(F.avg(kept_q), 4).alias("avg_kept_quality"),
    )


# --- q161: leakage-safe split audit ------------------------------------------


@register(
    "q161_leakage_safe_split",
    oracle="""
    WITH lab AS (
      SELECT md5(trim(text)) AS fp,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
                    THEN 'val'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '34'
                    THEN 'test'
                  ELSE 'train' END AS naive_label,
             CASE WHEN substr(md5(md5(trim(text))), 1, 2) < '1a' THEN 'val'
                  WHEN substr(md5(md5(trim(text))), 1, 2) < '34' THEN 'test'
                  ELSE 'train' END AS safe_label
      FROM documents
    ),
    g AS (
      SELECT fp, count(*) AS docs,
             count(DISTINCT naive_label) AS nd,
             count(DISTINCT safe_label) AS sd
      FROM lab GROUP BY fp
    )
    SELECT 'by_doc_id' AS split_rule,
           CAST(count(*) AS BIGINT) AS clusters_total,
           CAST(sum(CASE WHEN docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS multi_doc_clusters,
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS straddling_clusters,
           CAST(sum(CASE WHEN nd > 1 THEN docs ELSE 0 END) AS BIGINT)
             AS leaked_docs
    FROM g
    UNION ALL
    SELECT 'by_fingerprint',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN docs > 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN sd > 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN sd > 1 THEN docs ELSE 0 END) AS BIGINT)
    FROM g
    ORDER BY split_rule
    """,
)
def q161_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test leakage audit: contrast the naive per-document split
    (hash of doc_id) with the content-keyed split (hash of the exact-dup
    fingerprint md5(trim(text))). Under the naive rule, byte-identical
    duplicates land in different splits — the eval set silently contains
    training text; keying the SAME hash rule on the fingerprint makes
    every duplicate cluster atomic by construction, so its straddle count
    is structurally zero and the audit proves it. Output: per rule, total
    clusters, multi-doc clusters, clusters straddling >1 split, and
    documents belonging to straddling clusters (the leaked mass).

    Determinism: both labels are pure md5-prefix functions of row content
    (q75's threshold rule: val < 0x1a ~10%, test < 0x34 ~10%, train
    rest); every output is an exact integer.

    Scale posture: label assignment is map-side column arithmetic riding
    the scan; the only shuffle groups by fingerprint — the exact-dedup
    shuffle shape (q64) the pipeline already pays — and both rules are
    audited from that single grouped pass (count-distinct over 3 labels
    is O(1) per group). Two report rows come off a second 1-row
    aggregate; nothing corpus-sized concentrates anywhere."""
    docs = load_table(spark, sf_dir, "documents")

    def label(bucket: F.Column) -> F.Column:
        return (
            F.when(bucket < "1a", F.lit("val"))
            .when(bucket < "34", F.lit("test"))
            .otherwise(F.lit("train"))
        )

    fp = F.md5(F.trim(F.col("text")))
    lab = docs.select(
        fp.alias("fp"),
        label(hash_bucket("doc_id")).alias("naive_label"),
        label(hash_bucket(fp)).alias("safe_label"),
    )
    # "straddles >1 split" == "labels not all equal" == min != max: plain
    # algebraic aggregates, so the fp group-by stays ONE exchange (a
    # count-distinct pair would Expand the corpus 3x before the shuffle).
    g = lab.groupBy("fp").agg(
        F.count(F.lit(1)).alias("docs"),
        (F.min("naive_label") != F.max("naive_label")).alias("n_straddle"),
        (F.min("safe_label") != F.max("safe_label")).alias("s_straddle"),
    )
    agg = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("ct"),
        F.sum((F.col("docs") > 1).cast("int")).cast("bigint").alias("mdc"),
        F.sum(F.col("n_straddle").cast("int")).cast("bigint").alias("ns"),
        F.sum(F.when(F.col("n_straddle"), F.col("docs")).otherwise(0))
        .cast("bigint")
        .alias("nleak"),
        F.sum(F.col("s_straddle").cast("int")).cast("bigint").alias("ss"),
        F.sum(F.when(F.col("s_straddle"), F.col("docs")).otherwise(0))
        .cast("bigint")
        .alias("sleak"),
    )
    return agg.select(
        F.expr(
            "stack(2, 'by_doc_id', ct, mdc, ns, nleak, "
            "'by_fingerprint', ct, mdc, ss, sleak) AS "
            "(split_rule, clusters_total, multi_doc_clusters, "
            "straddling_clusters, leaked_docs)"
        )
    ).orderBy("split_rule")


# q219 (DSIR): hashed-feature importance weighting. B=256 buckets (the
# 2-hex-char md5 codomain) keeps BOTH feature distributions constant-size
# model state; the published method uses ~10k hashed n-gram buckets — at
# 100 TB you widen the prefix (nchars=3 -> 4096, 4 -> 65536), still a
# bounded dimension, never corpus-coupled. k=0.5 Jeffreys smoothing keeps
# never-seen-in-target buckets finite.
_DSIR_B = 256
_DSIR_SMOOTH = 0.5
_DSIR_TOPK = 100
_DSIR_TARGET = "src0"


@register(
    "q219_dsir_importance",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
      FROM documents
    ),
    tb AS (SELECT doc_id, source, substr(md5(term), 1, 2) AS bucket FROM tok),
    allc AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS c_all FROM tb GROUP BY bucket
    ),
    tgtc AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS c_tgt
      FROM tb WHERE source = '{_DSIR_TARGET}' GROUP BY bucket
    ),
    tots AS (
      SELECT (SELECT SUM(c_all) FROM allc) AS n_all,
             (SELECT COALESCE(SUM(c_tgt), 0) FROM tgtc) AS n_tgt
    ),
    lr AS (
      SELECT a.bucket,
             ln((COALESCE(t.c_tgt, 0) + {_DSIR_SMOOTH})
                / (n_tgt + {_DSIR_SMOOTH} * {_DSIR_B}))
           - ln((a.c_all + {_DSIR_SMOOTH})
                / (n_all + {_DSIR_SMOOTH} * {_DSIR_B})) AS lr
      FROM allc a LEFT JOIN tgtc t USING (bucket), tots
    ),
    d AS (
      SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS n
      FROM tb GROUP BY doc_id, bucket
    ),
    s AS (
      SELECT d.doc_id,
             CAST(SUM(d.n) AS BIGINT) AS n_tokens,
             list_sort(list(struct_pack(b := d.bucket, v := d.n * lr.lr)))
               AS terms
      FROM d JOIN lr USING (bucket)
      GROUP BY d.doc_id
    )
    SELECT doc_id, n_tokens,
           round(list_sum(list_transform(terms, x -> x.v)), 4) AS log_weight
    FROM s
    ORDER BY log_weight DESC, doc_id
    LIMIT {_DSIR_TOPK}
    """,
)
def q219_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection via importance resampling (Xie et al.
    2023, public): score every document by how much more likely its
    hashed-token feature vector is under a TARGET domain's distribution
    (here source='src0') than under the raw corpus's, then keep the
    top-k. log w(d) = sum_b n_{d,b} * [ln p_tgt(b) - ln p_raw(b)] with
    add-0.5 smoothing over B=256 md5-prefix buckets. This is the standard
    cheap proxy for "select pretraining data that looks like the target"
    and the piece the registry lacked between q151's perplexity filter
    (fluency) and q114's unigram divergence (corpus-level only — no
    per-document selection).

    Scale posture: feature hashing caps BOTH distributions at B buckets —
    constant-size model state independent of corpus size (the published
    method's whole point). Token bucketing is map-side arithmetic riding
    the scan; the two global bucket censuses are B-bounded HashAggregates;
    the log-ratio table (<= B rows) joins the per-doc bucket counts PLAIN
    so AQE broadcasts it; the only explicit broadcast is the 1-row totals
    scalar. Per-doc scoring folds the <= B (bucket, contribution) pairs in
    bucket order (sort_array), so the floating-point sum matches the
    oracle's list-order fold exactly. Selection is TakeOrderedAndProject
    top-{_DSIR_TOPK} on (rounded weight desc, doc_id) — no global sort
    materialization. Reference: no selection surface (SURVEY §7 Phase-3
    extension alongside q75/q76's hash sampling)."""
    docs = load_table(spark, sf_dir, "documents")
    tb = (
        docs.select(
            "doc_id",
            "source",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
        )
        .select(
            "doc_id",
            "source",
            F.substring(F.md5("term"), 1, 2).alias("bucket"),
        )
    )
    # ONE tokenize pass: the (doc_id, source, bucket) census is the sole
    # corpus-sized aggregation (source is functionally dependent on doc_id,
    # so adding it costs nothing). Both global distributions AND the 1-row
    # totals re-aggregate the census's exchange — Spark's ReuseExchange
    # dedupes the identical subtrees, so the corpus is scanned and hashed
    # exactly once (verified in the formatted plan: one documents scan).
    d = tb.groupBy("doc_id", "source", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    cen = d.groupBy("bucket").agg(
        F.sum("n").cast("bigint").alias("c_all"),
        F.sum(F.when(F.col("source") == _DSIR_TARGET, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("c_tgt"),
    )
    tots = cen.agg(
        F.sum("c_all").alias("n_all"), F.sum("c_tgt").alias("n_tgt")
    )
    lr = (
        cen
        .crossJoin(F.broadcast(tots))
        .select(
            "bucket",
            (
                F.log(
                    (F.col("c_tgt") + F.lit(_DSIR_SMOOTH))
                    / (F.col("n_tgt") + F.lit(_DSIR_SMOOTH * _DSIR_B))
                )
                - F.log(
                    (F.col("c_all") + F.lit(_DSIR_SMOOTH))
                    / (F.col("n_all") + F.lit(_DSIR_SMOOTH * _DSIR_B))
                )
            ).alias("lr"),
        )
    )
    s = (
        d.join(lr, "bucket")
        .select(
            "doc_id",
            "n",
            F.col("bucket").alias("b"),
            (F.col("n") * F.col("lr")).alias("v"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("bigint").alias("n_tokens"),
            F.sort_array(
                F.collect_list(F.struct("b", "v"))  # <= B=256 bucket pairs
            ).alias("terms"),
        )
    )
    return (
        s.select(
            "doc_id",
            "n_tokens",
            F.round(
                F.expr("aggregate(terms, 0D, (acc, x) -> acc + x.v)"), 4
            ).alias("log_weight"),
        )
        .orderBy(F.col("log_weight").desc(), "doc_id")
        .limit(_DSIR_TOPK)
    )


# q223: Neyman (minimum-variance) stratified allocation. Budget in docs;
# the variable whose population mean the sample must estimate is document
# length (the token-budget proxy). Classic survey-sampling result: for a
# fixed total n, allocating n_h proportional to N_h * S_h minimizes the
# variance of the stratified mean estimator (Neyman 1934, public).
_NEYMAN_BUDGET = 1000


@register(
    "q223_neyman_allocation",
    oracle=f"""
    WITH strata AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             COALESCE(stddev_pop(n_chars), 0.0) AS sd
      FROM documents GROUP BY source
    ),
    den AS (
      SELECT SUM(n_docs * sd) AS w_total, SUM(n_docs) AS n_total FROM strata
    )
    SELECT source, n_docs,
           round(sd, 4) AS sd_chars,
           round({_NEYMAN_BUDGET} * n_docs * sd / w_total, 2) AS neyman_alloc,
           round({_NEYMAN_BUDGET} * n_docs / n_total, 2) AS prop_alloc,
           round({_NEYMAN_BUDGET} * sd / w_total, 6) AS neyman_rate
    FROM strata, den
    ORDER BY source
    """,
)
def q223_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-variance stratified sample design: given a fixed labeling /
    eval budget of {_NEYMAN_BUDGET} docs, allocate to each source stratum
    in proportion to N_h * S_h (stratum size x within-stratum length
    stddev) — the Neyman allocation, which beats proportional allocation
    exactly where strata have unequal spread (a source of uniform
    boilerplate needs few probes; a high-variance scrape needs many).
    Emitted next to the proportional allocation so the planner sees the
    delta, plus the per-stratum sampling rate to feed q76-style hash
    thresholds.

    Scale posture: one map-side-combined HashAggregate over the corpus
    (count + stddev_pop moments, constant state per stratum), then all
    arithmetic on the |sources|-row table — the denominators are WINDOW
    sums over that bounded frame (allowlisted), not a re-aggregated
    branch, so the corpus is scanned exactly once, projecting only
    (source, n_chars). Determinism: both engines compute textbook
    population stddev from exact integers; ratios are rounded well above
    summation-order residue. Reference: no sampling surface (SURVEY §2.4
    A5 absent) — §7 Phase-3 extension beside q76's rate-based and q167's
    budget-capped allocation."""
    docs = load_table(spark, sf_dir, "documents")
    strata = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.coalesce(F.stddev_pop("n_chars"), F.lit(0.0)).alias("sd"),
    )
    w_all = Window.partitionBy()  # |sources|-row frame: allowlisted bound
    b = F.lit(_NEYMAN_BUDGET)
    return (
        strata.select(
            "source",
            "n_docs",
            "sd",
            F.sum(F.col("n_docs") * F.col("sd")).over(w_all).alias("w_total"),
            F.sum("n_docs").over(w_all).alias("n_total"),
        )
        .select(
            "source",
            "n_docs",
            F.round(F.col("sd"), 4).alias("sd_chars"),
            F.round(b * F.col("n_docs") * F.col("sd") / F.col("w_total"), 2)
            .alias("neyman_alloc"),
            F.round(b * F.col("n_docs") / F.col("n_total"), 2)
            .alias("prop_alloc"),
            F.round(b * F.col("sd") / F.col("w_total"), 6)
            .alias("neyman_rate"),
        )
        .orderBy("source")
    )


# q226: resharding stability. N -> N+1 shard growth under two assignment
# functions. Rendezvous (highest-random-weight) hashing moves only the
# ~1/(N+1) of keys whose new shard's weight beats all old ones (Thaler &
# Ravishankar 1996, public); mod-N rehashing moves ~N/(N+1) of the corpus.
_HRW_N = 8


def _hrw_weight_spark(s: int) -> F.Column:
    return F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col("doc_id").cast("string"), F.lit(str(s)))),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")


def _hrw_weight_sql(s: int) -> str:
    return (
        "CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), "
        f"'|', '{s}')), 1, 12)) AS BIGINT)"
    )


def _argmax_sql(n: int) -> str:
    """First-index argmax over w0..w{n-1} as a CASE chain — the same
    greatest()+first-match tie-break the Spark side uses, so both engines
    agree even on (astronomically unlikely) 48-bit weight ties."""
    gm = "greatest(" + ", ".join(f"w{s}" for s in range(n)) + ")"
    cases = " ".join(f"WHEN w{s} = {gm} THEN {s}" for s in range(n))
    return f"CASE {cases} END"


@register(
    "q226_rendezvous_resharding",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             {", ".join(f"{_hrw_weight_sql(s)} AS w{s}" for s in range(_HRW_N + 1))},
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
                  AS BIGINT) AS hm
      FROM documents
    ),
    a AS (
      SELECT doc_id,
             {_argmax_sql(_HRW_N)} AS hrw_old,
             {_argmax_sql(_HRW_N + 1)} AS hrw_new,
             hm % {_HRW_N} AS mod_old,
             hm % {_HRW_N + 1} AS mod_new
      FROM w
    ),
    f AS (
      SELECT 'rendezvous' AS strategy, hrw_old AS shard_old,
             CASE WHEN hrw_new <> hrw_old THEN 1 ELSE 0 END AS moved
      FROM a
      UNION ALL
      SELECT 'mod_n', mod_old,
             CASE WHEN mod_new <> mod_old THEN 1 ELSE 0 END
      FROM a
    ),
    loads AS (
      SELECT strategy, shard_old, CAST(count(*) AS BIGINT) AS load,
             CAST(SUM(moved) AS BIGINT) AS moved
      FROM f GROUP BY strategy, shard_old
    )
    SELECT strategy,
           CAST(SUM(load) AS BIGINT) AS n_docs,
           CAST(SUM(moved) AS BIGINT) AS n_moved,
           round(CAST(SUM(moved) AS DOUBLE) / SUM(load), 6) AS moved_frac,
           round(1.0 / {_HRW_N + 1}, 6) AS hrw_expected_frac,
           MAX(load) AS max_shard_load,
           MIN(load) AS min_shard_load
    FROM loads
    GROUP BY strategy
    ORDER BY strategy
    """,
)
def q226_rendezvous_resharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resharding-stability audit: grow the shard count {_HRW_N} ->
    {_HRW_N + 1} and measure, per assignment strategy, how much of the
    corpus MOVES. Rendezvous (highest-random-weight) hashing reassigns
    only the keys the new shard now wins (~1/{_HRW_N + 1} of the corpus);
    naive mod-N rehashing reassigns ~{_HRW_N}/{_HRW_N + 1}. At 100 TB the
    difference is re-moving ~11 TB versus ~89 TB on every capacity step —
    the audit a storage planner runs before picking the placement
    function, alongside each strategy's load balance (max/min shard
    occupancy at N={_HRW_N}). Complements q152/q177 (which size and audit
    a FIXED sharding) with the growth dimension.

    Determinism: weights are 48-bit md5 prefixes (exact in doubles and
    bigints), identical hex arithmetic in both engines; the argmax
    tie-breaks first-index via the same greatest()+first-match chain in
    both. Scale posture: per-doc weight computation is pure map-side
    column arithmetic riding the scan — {_HRW_N + 1} digests per row, no
    shuffle, no per-row state; the only exchange is the final
    HashAggregate onto the 2x{_HRW_N}-row (strategy, shard) frame.
    Reference: no sharding surface — §7 Phase-3 extension."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    w = docs.select(
        "doc_id",
        *[_hrw_weight_spark(s).alias(f"w{s}") for s in range(_HRW_N + 1)],
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
        )
        .cast("bigint")
        .alias("hm"),
    )

    def argmax(n: int) -> F.Column:
        gm = F.greatest(*[F.col(f"w{s}") for s in range(n)])
        expr = F.when(F.col("w0") == gm, F.lit(0))
        for s in range(1, n):
            expr = expr.when(F.col(f"w{s}") == gm, F.lit(s))
        return expr

    a = w.select(
        "doc_id",
        argmax(_HRW_N).alias("hrw_old"),
        argmax(_HRW_N + 1).alias("hrw_new"),
        F.pmod("hm", F.lit(_HRW_N)).alias("mod_old"),
        F.pmod("hm", F.lit(_HRW_N + 1)).alias("mod_new"),
    )
    f = a.selectExpr(
        "stack(2, "
        "'rendezvous', cast(hrw_old as int), cast(hrw_new <> hrw_old as int), "
        "'mod_n', cast(mod_old as int), cast(mod_new <> mod_old as int)"
        ") as (strategy, shard_old, moved)"
    )
    loads = f.groupBy("strategy", "shard_old").agg(
        F.count(F.lit(1)).cast("bigint").alias("load"),
        F.sum("moved").cast("bigint").alias("moved"),
    )
    return (
        loads.groupBy("strategy")
        .agg(
            F.sum("load").cast("bigint").alias("n_docs"),
            F.sum("moved").cast("bigint").alias("n_moved"),
            F.round(
                F.sum("moved").cast("double") / F.sum("load"), 6
            ).alias("moved_frac"),
            F.round(F.lit(1.0 / (_HRW_N + 1)), 6).alias("hrw_expected_frac"),
            F.max("load").alias("max_shard_load"),
            F.min("load").alias("min_shard_load"),
        )
        .orderBy("strategy")
    )


# --- q239: Poisson-bootstrap confidence interval -------------------------------

# Poisson(1) CDF thresholds (k = 0..6; u >= last -> weight 7). The Poisson
# bootstrap replaces multinomial resampling — which needs the global row
# count up front and a shared draw — with an INDEPENDENT per-row weight,
# the only bootstrap that runs as a single map stage at cluster scale
# (Chamandy et al., "Estimating uncertainty for massive data streams",
# Google 2012 — public).
_POIS1_CDF = (
    0.3678794411714423,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507120,
)
_BOOT_R = 40  # replicates; percentile CI at ranks 1 / 39 (2.5% / 97.5%)


def _pois_case_sql(u: str) -> str:
    arms = " ".join(
        f"WHEN {u} < {t!r} THEN {k}" for k, t in enumerate(_POIS1_CDF)
    )
    return f"(CASE {arms} ELSE 7 END)"


@register(
    "q239_poisson_bootstrap_ci",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS x
      FROM documents
    ),
    rep AS (
      SELECT r, doc_id, x,
             CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':'
                              || CAST(r AS VARCHAR)), 1, 8)) AS BIGINT)
                  AS DOUBLE) / 4294967296.0 AS u
      FROM d, range(1, {_BOOT_R} + 1) t(r)
    ),
    means AS (
      SELECT r,
             sum({_pois_case_sql("u")} * x) / sum({_pois_case_sql("u")}) AS m
      FROM rep GROUP BY r
    ),
    arr AS (
      SELECT list(m ORDER BY m, r) AS a,
             CAST(count(*) AS DOUBLE) AS rr
      FROM means
    ),
    folds AS (
      SELECT rr, a,
             list_aggregate(a, 'sum') / rr AS mbar
      FROM arr
    ),
    point AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs, sum(x) / count(*) AS mean_x
      FROM d
    )
    SELECT n_docs,
           CAST({_BOOT_R} AS BIGINT) AS n_replicates,
           round(mean_x, 4) AS mean_tokens,
           round(sqrt(list_aggregate(list_transform(a, v -> (v - mbar)
                      * (v - mbar)), 'sum') / (rr - 1.0)), 6) AS boot_se,
           round(a[2], 4) AS ci_lo,
           round(a[{_BOOT_R - 1}], 4) AS ci_hi
    FROM folds, point
    """,
)
def q239_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncertainty for a corpus statistic WITHOUT resampling coordination:
    the Poisson bootstrap (per-row independent Poisson(1) weights, R =
    {_BOOT_R} replicates) for the mean tokens-per-document, with the
    replicate-spread SE and the rank-1/rank-{_BOOT_R - 1} percentile
    interval. The multinomial bootstrap needs a global n and a shared
    multinomial draw — impossible as a map stage; Poissonization makes
    every row's weight independent, so the whole resample is one narrow
    projection (Chamandy et al. 2012; the grouped-jackknife q233's
    resampling companion). Weights come from the md5 hash of
    (doc_id, replicate), the repo's deterministic-sampling discipline, so
    a rerun — or the DuckDB oracle — reproduces every draw exactly.

    Determinism: weights are integers from hash-uniform thresholds;
    sum(w*x) and sum(w) are exact integer-valued double sums (token counts
    x weight <= 7 x corpus tokens, far under 2^53), so each replicate mean
    is an exact ratio in both engines; the R-row spread/percentile math
    folds a (value, r)-sorted array in identical order (q141 discipline).

    Scale posture: one corpus scan exploding {_BOOT_R} weights per row,
    partial-aggregated map-side to {_BOOT_R} rows per task before the
    shuffle — the shuffle moves O({_BOOT_R} x tasks) rows, never the
    corpus. All interval math runs on the {_BOOT_R}-row replicate frame
    folded into one row."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("double").alias("x"),
    )
    rep = d.select(
        "doc_id",
        "x",
        F.explode(F.sequence(F.lit(1), F.lit(_BOOT_R))).alias("r"),
    ).withColumn(
        "u",
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("doc_id"), F.col("r"))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0),
    )
    w = F.lit(7)
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        w = F.when(F.col("u") < _POIS1_CDF[k], F.lit(k)).otherwise(w)
    means = (
        rep.withColumn("w", w)
        .groupBy("r")
        .agg(
            (F.sum(F.col("w") * F.col("x")) / F.sum("w")).alias("m")
        )
    )
    arr = means.agg(
        F.array_sort(F.collect_list(F.struct("m", "r"))).alias("a"),
        F.count(F.lit(1)).cast("double").alias("rr"),
    ).select(
        F.expr("transform(a, s -> s.m)").alias("a"), "rr"
    )
    folds = arr.select(
        "a",
        "rr",
        (F.expr("aggregate(a, 0D, (acc, v) -> acc + v)") / F.col("rr")).alias(
            "mbar"
        ),
    )
    point = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.sum("x") / F.count(F.lit(1))).alias("mean_x"),
    )
    return folds.crossJoin(F.broadcast(point)).select(
        "n_docs",
        F.lit(_BOOT_R).cast("bigint").alias("n_replicates"),
        F.round("mean_x", 4).alias("mean_tokens"),
        F.round(
            F.sqrt(
                F.expr("aggregate(a, 0D, (acc, v) -> acc + (v - mbar) * (v - mbar))")
                / (F.col("rr") - 1.0)
            ),
            6,
        ).alias("boot_se"),
        F.round(F.element_at("a", 2), 4).alias("ci_lo"),
        F.round(F.element_at("a", _BOOT_R - 1), 4).alias("ci_hi"),
    )


# --- q249: effective sample size of the DSIR importance weights ----------------


@register(
    "q249_importance_ess",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
      FROM documents
    ),
    tb AS (SELECT doc_id, source, substr(md5(term), 1, 2) AS bucket FROM tok),
    d AS (
      SELECT doc_id, source, bucket, CAST(count(*) AS BIGINT) AS n
      FROM tb GROUP BY doc_id, source, bucket
    ),
    cen AS (
      SELECT bucket, SUM(n) AS c_all,
             SUM(CASE WHEN source = '{_DSIR_TARGET}' THEN n ELSE 0 END) AS c_tgt
      FROM d GROUP BY bucket
    ),
    tots AS (SELECT SUM(c_all) AS n_all, SUM(c_tgt) AS n_tgt FROM cen),
    lr AS (
      SELECT bucket,
             ln((c_tgt + {_DSIR_SMOOTH})
                / (n_tgt + {_DSIR_SMOOTH} * {_DSIR_B}))
           - ln((c_all + {_DSIR_SMOOTH})
                / (n_all + {_DSIR_SMOOTH} * {_DSIR_B})) AS lr
      FROM cen, tots
    ),
    lw AS (
      SELECT d.doc_id, d.source, SUM(d.n * lr.lr) AS log_w
      FROM d JOIN lr USING (bucket)
      GROUP BY d.doc_id, d.source
    ),
    norm AS (
      SELECT source, max(log_w) AS max_lw FROM lw GROUP BY source
    ),
    w AS (
      SELECT lw.source, exp(lw.log_w - n.max_lw) AS wt
      FROM lw JOIN norm n USING (source)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(sum(wt) * sum(wt) / sum(wt * wt), 2) AS ess,
           round(sum(wt) * sum(wt) / sum(wt * wt) / count(*), 4) AS ess_ratio,
           round(max(wt) / sum(wt), 4) AS max_weight_share
    FROM w
    GROUP BY source
    ORDER BY source
    """,
)
def q249_importance_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the DSIR reweighting (q219) statistically USABLE? The effective
    sample size (Kish: (sum w)^2 / sum w^2) of each source's importance
    weights toward the '{_DSIR_TARGET}' target, plus the largest single
    weight's share — the two standard importance-sampling diagnostics: an
    ESS ratio near 1 means the reweighting barely changes the source (safe
    but pointless); near 0 means a few documents dominate and the
    resampled corpus is effectively tiny (the published DSIR paper's
    failure mode when the proxy distributions are too far apart). Weights
    are normalized per source by exp(log_w - max log_w) before the
    quadratic sums — ESS is scale-invariant, and the subtraction keeps
    exp() in range for any corpus (log-sum-exp discipline).

    Determinism: the weight pipeline is q219's exact bucket-census
    arithmetic; per-doc and per-source float folds differ in order
    between engines only at ~1e-13 relative residue, absorbed by the
    1e-2/1e-4 output rounding (the repo's float-fold rule).

    Scale posture: identical to q219 up to the per-doc score (one
    tokenize pass, B-bounded censuses, AQE-broadcast log-ratio join);
    then TWO bounded aggregates (per-source max, per-source quadratic
    sums) — map-side combinable, |sources| rows out. No window, no
    collect, no top-k needed."""
    docs = load_table(spark, sf_dir, "documents")
    tb = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
    ).select(
        "doc_id", "source", F.substring(F.md5("term"), 1, 2).alias("bucket")
    )
    d = tb.groupBy("doc_id", "source", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    cen = d.groupBy("bucket").agg(
        F.sum("n").alias("c_all"),
        F.sum(
            F.when(F.col("source") == _DSIR_TARGET, F.col("n")).otherwise(0)
        ).alias("c_tgt"),
    )
    tots = cen.agg(F.sum("c_all").alias("n_all"), F.sum("c_tgt").alias("n_tgt"))
    lr = cen.crossJoin(F.broadcast(tots)).select(
        "bucket",
        (
            F.log(
                (F.col("c_tgt") + F.lit(_DSIR_SMOOTH))
                / (F.col("n_tgt") + F.lit(_DSIR_SMOOTH * _DSIR_B))
            )
            - F.log(
                (F.col("c_all") + F.lit(_DSIR_SMOOTH))
                / (F.col("n_all") + F.lit(_DSIR_SMOOTH * _DSIR_B))
            )
        ).alias("lr"),
    )
    lw = (
        d.join(lr, "bucket")
        .groupBy("doc_id", "source")
        .agg(F.sum(F.col("n") * F.col("lr")).alias("log_w"))
    )
    norm = lw.groupBy("source").agg(F.max("log_w").alias("max_lw"))
    w = lw.join(F.broadcast(norm), "source").select(
        "source", F.exp(F.col("log_w") - F.col("max_lw")).alias("wt")
    )
    ess = F.sum("wt") * F.sum("wt") / F.sum(F.col("wt") * F.col("wt"))
    return (
        w.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(ess, 2).alias("ess"),
            F.round(ess / F.count(F.lit(1)), 4).alias("ess_ratio"),
            F.round(F.max("wt") / F.sum("wt"), 4).alias("max_weight_share"),
        )
        .orderBy("source")
    )


# --- q255: Madow systematic probability-proportional-to-size sample ------------

# n draws at cumulative-size positions (k + 3/8) * T / n, k = 0..n-1. The
# 3/8 anchor is a fixed public constant (any u in [0,1) gives an unbiased
# pips design; fixing it keeps the draw set deterministic). All crossing
# arithmetic is INTEGER: doc i is drawn once per integer k with
# 8nC_{i-1} < (8k+3)T <= 8nC_i, i.e. multiplicity =
# (8nC_i + 5T) div 8T - (8nC_{i-1} + 5T) div 8T  (the +5T shift keeps every
# numerator positive so both engines' integer division is plain floor).
_PPS_N = 500
_PPS_BUCKETS = 256


@register(
    "q255_systematic_pps_sample",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, CAST(n_chars AS BIGINT) AS sz FROM documents
    ),
    c AS (
      SELECT source, sz,
             sum(sz) OVER (ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) AS c_i
      FROM d
    ),
    t AS (SELECT CAST(sum(sz) AS BIGINT) AS total FROM d),
    m AS (
      SELECT source,
             (8 * {_PPS_N} * c_i + 5 * total) // (8 * total)
             - (8 * {_PPS_N} * (c_i - sz) + 5 * total) // (8 * total) AS mult,
             sz
      FROM c, t
    )
    SELECT m.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(m.sz) AS DOUBLE) / t.total, 6) AS size_share,
           round({_PPS_N} * CAST(sum(m.sz) AS DOUBLE) / t.total, 4)
             AS expected_draws,
           CAST(sum(m.mult) AS BIGINT) AS actual_draws,
           round(sum(m.mult) - {_PPS_N} * CAST(sum(m.sz) AS DOUBLE) / t.total,
                 4) AS deviation
    FROM m, t
    GROUP BY m.source, t.total
    ORDER BY m.source
    """,
)
def q255_systematic_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size sampling WITHOUT randomness
    coordination: Madow's systematic pips design — {_PPS_N} draw positions
    laid at equal cumulative-size steps (anchor 3/8), each document drawn
    with multiplicity equal to the draw positions falling inside its
    cumulative-size span, so inclusion probability is EXACTLY proportional
    to n_chars (big docs can legitimately be drawn twice). This is the
    token-budgeted sampler a mixture plan wants when "sample 500 docs"
    really means "sample a size-representative 500" — beside the q75
    Bernoulli (uniform rate), q76/q223 (stratified counts) and q102
    (weighted priority order), this is the fixed-SIZE-measure design, and
    systematic ordering makes its within-stream variance near-minimal
    (Madow 1949, public).

    Determinism: the entire draw set is integer arithmetic on exact
    cumulative sums — no RNG, no floats until the reporting ratios; the
    audit compares per-source actual draws against n x size-share, whose
    deviation the systematic design bounds by construction.

    Scale posture: the cumulative size is a TWO-LEVEL prefix sum (the
    q107/q208 discipline): {_PPS_BUCKETS} order-preserving doc_id-range
    buckets from a 1-row bounds scalar, within-bucket cumsum PARTITIONED
    by bucket, bucket totals' running sum over the {_PPS_BUCKETS}-row
    head table (the only unpartitioned window — bounded, allowlisted),
    prior-bucket offset joined back by broadcast. The oracle computes the
    same prefix with one flat window, proving the decomposition. The
    report is a |sources| aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "source", F.col("n_chars").cast("bigint").alias("sz")
    )
    bounds = d.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
    span = F.col("hi") - F.col("lo") + 1
    bucket = F.floor((F.col("doc_id") - F.col("lo")) * _PPS_BUCKETS / span)
    t = d.crossJoin(F.broadcast(bounds)).select(
        "doc_id", "source", "sz", bucket.alias("bucket")
    )
    w_local = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = t.withColumn("c_local", F.sum("sz").over(w_local))
    heads = t.groupBy("bucket").agg(F.sum("sz").alias("bucket_sum"))
    w_head = (
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    )  # 256 rows — bounded by construction
    offsets = heads.select(
        "bucket",
        F.coalesce(F.sum("bucket_sum").over(w_head), F.lit(0)).alias(
            "prior_sum"
        ),
    )
    tot = d.agg(F.sum("sz").cast("bigint").alias("total"))
    c_i = F.col("prior_sum") + F.col("c_local")
    mult = F.expr(
        f"(8 * {_PPS_N} * (prior_sum + c_local) + 5 * total) div (8 * total)"
    ) - F.expr(
        f"(8 * {_PPS_N} * (prior_sum + c_local - sz) + 5 * total) "
        f"div (8 * total)"
    )
    m = (
        local.join(F.broadcast(offsets), "bucket")
        .crossJoin(F.broadcast(tot))
        .select("source", "sz", "total", mult.alias("mult"))
    )
    share = F.sum("sz").cast("double") / F.first("total")
    return (
        m.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(share, 6).alias("size_share"),
            F.round(F.lit(_PPS_N) * share, 4).alias("expected_draws"),
            F.sum("mult").cast("bigint").alias("actual_draws"),
            F.round(
                F.sum("mult") - F.lit(_PPS_N) * share, 4
            ).alias("deviation"),
        )
        .orderBy("source")
    )


# --- q265: per-source weighted sampling WITHOUT replacement (ES keys) ----------

_ES_K = 5  # draws per source stratum


@register(
    "q265_es_weighted_stratified_wor",
    oracle=f"""
    WITH keyed AS (
      SELECT source, doc_id, n_chars,
             ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
                      AS BIGINT) + 1) / 281474976710656.0)
               / CAST(n_chars AS DOUBLE) AS es_key
      FROM documents
      WHERE n_chars > 0
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY source ORDER BY es_key DESC, doc_id) AS rk
      FROM keyed
    )
    SELECT source, doc_id, n_chars, round(es_key, 6) AS es_key,
           CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= {_ES_K}
    ORDER BY source, rk
    """,
)
def q265_es_weighted_stratified_wor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k draws per source stratum, by
    the Efraimidis-Spirtakis exponential-key scheme (Efraimidis & Spirtakis
    2006: rank by u^(1/w), equivalently ln(u)/w, u uniform, w the weight):
    the top-k keys per source are EXACTLY a w-weighted WOR draw, so a
    token-budgeted training mix can take its per-source quota in ONE pass
    with no rejection loop and no sequential state — the WOR complement of
    q102's Duffield priority sample (top-k overall, w/u keys) and q255's
    systematic PPS (fixed skip interval). u derives from the 48-bit md5
    prefix of doc_id (the module's deterministic-uniform discipline), so
    the draw is reshuffle/rerun-stable and the oracle replays it bit for
    bit — ln is the one transcendental, and competing keys are continuous
    random values, so a 1-ulp libm disagreement flips no rank at any
    realistic scale (the q219 log-sum-exp precedent).

    Scale posture: narrow scan-side key computation; the only shuffle is
    the per-source window (row_number over |source| partitions, each
    heap-pruned to k by the rank filter). At 1000 sources x 100 TB the
    partitioned top-k is the same plan; no global sort, no driver state."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    u = (h + F.lit(1)).cast("double") / F.lit(float(2**48))
    es_key = F.log(u) / F.col("n_chars").cast("double")
    w = Window.partitionBy("source").orderBy(F.col("es_key").desc(), F.col("doc_id"))
    return (
        docs.filter(F.col("n_chars") > 0)
        .select("source", "doc_id", "n_chars", es_key.alias("es_key"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _ES_K)
        .select(
            "source",
            "doc_id",
            "n_chars",
            F.round("es_key", 6).alias("es_key"),
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("source", "rk")
    )


@register(
    "q278_range_partition_planner",
    oracle="""
    WITH sample AS (
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
      LIMIT 512
    ),
    tiles AS (
      SELECT o_totalprice,
             ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS tile
      FROM sample
    ),
    cuts AS (
      SELECT list_sort(list(mx)) AS cs FROM (
        SELECT max(o_totalprice) AS mx FROM tiles WHERE tile < 8 GROUP BY tile)
    ),
    assigned AS (
      SELECT o_totalprice,
             len(list_filter(cs, c -> c < o_totalprice)) AS bucket
      FROM orders, cuts
    ),
    census AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
             round(min(o_totalprice), 2) AS min_price,
             round(max(o_totalprice), 2) AS max_price
      FROM assigned GROUP BY bucket
    )
    SELECT bucket, n_rows, min_price, max_price,
           round(CAST(n_rows AS DOUBLE) * 8 / sum(n_rows) OVER (), 4) AS balance
    FROM census ORDER BY bucket
    """,
)
def q278_range_partition_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-based range-partition planning — the algorithm behind Spark's
    own RangePartitioner (core/Partitioner.scala sketch+bounds) surfaced as
    an auditable query: draw a FIXED-SIZE deterministic sample (the 512
    orders with the smallest md5(key) — reservoir-equivalent, engine-
    portable, and bounded regardless of corpus size, unlike a fraction
    sample that grows linearly), cut it into 8 ntiles to get 7 split
    points, assign EVERY order to its range bucket with a strict
    cut < price rule (ties go left), and report the per-bucket census with
    a balance factor (n * buckets / total; 1.0 = perfectly even). This is
    the planning step a 100 TB sort/range-bucketing job runs first — a
    skewed balance column here means a straggler task there.

    Scale posture: the sample is TakeOrderedAndProject (top-512 by hash —
    no full sort, no shuffle of the table); the ntile window runs on 512
    rows (recorded bound); the 7-cut array attaches as a 1-row broadcast
    scalar so bucket assignment is a pure map over the scan; the census is
    one 8-group aggregate and the balance window runs over those 8 rows.

    Determinism: the ntile ordering carries the unique key tie-break, cut
    comparison is on identical doubles, and min/max/count are order-free."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    sample = (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.md5(F.col("o_orderkey").cast("string")), F.col("o_orderkey"))
        .limit(512)
    )
    tiles = sample.withColumn(
        "tile", F.ntile(8).over(Window.orderBy("o_totalprice", "o_orderkey"))
    )
    cuts = (
        tiles.filter(F.col("tile") < 8)
        .groupBy("tile")
        .agg(F.max("o_totalprice").alias("mx"))
        .agg(F.sort_array(F.collect_list("mx")).alias("cs"))
    )
    assigned = orders.crossJoin(F.broadcast(cuts)).select(
        "o_totalprice",
        F.size(F.filter("cs", lambda c: c < F.col("o_totalprice"))).alias("bucket"),
    )
    census = assigned.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )
    w = Window.partitionBy()
    return census.select(
        "bucket",
        "n_rows",
        "min_price",
        "max_price",
        F.round(
            F.col("n_rows").cast("double") * 8 / F.sum("n_rows").over(w), 4
        ).alias("balance"),
    ).orderBy("bucket")


_HAMILTON_SEATS = 1000  # sampling budget apportioned across sources


@register(
    "q299_hamilton_apportionment",
    oracle=f"""
    WITH src AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM src),
    quotas AS (
      SELECT source, n,
             {_HAMILTON_SEATS} * CAST(n AS DOUBLE) / nn AS quota,
             CAST(floor({_HAMILTON_SEATS} * CAST(n AS DOUBLE) / nn) AS BIGINT)
               AS base
      FROM src, tot
    ),
    ranked AS (
      SELECT source, n, quota, base,
             row_number() OVER (ORDER BY quota - base DESC, source ASC)
               AS rk,
             {_HAMILTON_SEATS} - sum(base) OVER () AS leftover
      FROM quotas
    )
    SELECT source, n AS n_docs,
           round(quota, 6) AS quota,
           base,
           CAST(CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS extra,
           base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS allocation
    FROM ranked
    ORDER BY source
    """,
)
def q299_hamilton_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamilton (largest-remainder) apportionment of a fixed sampling
    budget of {_HAMILTON_SEATS} across sources (Hamilton 1792; the
    integer-allocation step every quota design ends with): each source
    gets the floor of its proportional quota, and the leftover seats go
    to the largest fractional remainders — the allocation sums EXACTLY
    to the budget, which proportional rounding alone never guarantees.
    The integer complement of q223's Neyman allocation (real-valued
    optimal n_h) and q167's budget waterfill (cap-constrained): those
    decide the real-number target, this turns it into whole rows to
    actually draw (then q265/q255 do the drawing).

    Determinism: quotas are identical doubles (exact integer counts, one
    division); floors of identical doubles agree; the remainder rank
    carries a source tie-break; the leftover count is exact integer
    arithmetic.

    Scale posture: one scan collapses to the |sources| census; the rank
    and leftover windows run on that bounded frame (allowlisted)."""
    docs = load_table(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = src.agg(F.sum("n").cast("bigint").alias("nn"))
    quota = F.lit(_HAMILTON_SEATS) * F.col("n").cast("double") / F.col("nn")
    quotas = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        quota.alias("quota"),
        F.floor(quota).cast("bigint").alias("base"),
    )
    w_rk = Window.orderBy(
        (F.col("quota") - F.col("base")).desc(), F.col("source").asc()
    )  # |sources|-row frame: allowlisted bound
    w_all = Window.partitionBy()
    ranked = quotas.select(
        "source",
        "n",
        "quota",
        "base",
        F.row_number().over(w_rk).alias("rk"),
        (F.lit(_HAMILTON_SEATS) - F.sum("base").over(w_all)).alias("leftover"),
    )
    extra = F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
    return ranked.select(
        "source",
        F.col("n").alias("n_docs"),
        F.round("quota", 6).alias("quota"),
        "base",
        extra.cast("bigint").alias("extra"),
        (F.col("base") + extra).alias("allocation"),
    ).orderBy("source")


# --- q321: successive-halving source selection ---------------------------------

# (budget hash-prefix ceiling, survivors kept) per round: 25% of docs rank
# all 20 arms, 50% rank the top 10, the full corpus ranks the last 5.
_SH_ROUNDS = (("40", 10), ("80", 5), (None, 3))


def _sh_oracle() -> str:
    """Unrolled successive halving: per-arm quality mass as EXACT integers
    (the q62 score rounded onto its 1e-4 grid and cast), so each round's
    ranking compares identical doubles s/n in both engines."""
    qual = """
      SELECT source, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
             CAST(round((CASE WHEN len(toks) / 100.0 < 1.0
                              THEN len(toks) / 100.0 ELSE 1.0 END * 0.5
                  + CASE WHEN len(list_filter(toks,
                            t -> t IN ('the', 'a', 'of', 'and')))
                              / CAST(len(toks) AS DOUBLE) * 5.0 < 1.0
                         THEN len(list_filter(toks,
                            t -> t IN ('the', 'a', 'of', 'and')))
                              / CAST(len(toks) AS DOUBLE) * 5.0
                         ELSE 1.0 END * 0.5) * 10000.0, 0) AS BIGINT) AS qi
      FROM (SELECT source, doc_id,
                   regexp_split_to_array(trim(text), '\\s+') AS toks
            FROM documents)
    """
    blocks = [f"q AS ({qual})"]
    prev_keep = None
    selects = []
    for i, (ceil_b, keep) in enumerate(_SH_ROUNDS, start=1):
        where = f"WHERE bucket < '{ceil_b}'" if ceil_b else ""
        src_filter = (
            f"JOIN (SELECT source FROM k{i - 1} WHERE rk <= {prev_keep}) USING (source)"
            if prev_keep
            else ""
        )
        blocks.append(f"""
    r{i} AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n, CAST(sum(qi) AS BIGINT) AS s
      FROM q {src_filter} {where} GROUP BY source
    ),
    k{i} AS (
      SELECT source, n, s,
             row_number() OVER (ORDER BY s * 1.0 / n DESC, source) AS rk
      FROM r{i}
    )""")
        selects.append(
            f"SELECT CAST({i} AS INT) AS sh_round, source, n AS n_docs, "
            f"round(s / 10000.0 / n, 6) AS mean_quality, "
            f"CAST(rk AS INT) AS rank, rk <= {keep} AS kept FROM k{i}"
        )
        prev_keep = keep
    return (
        "WITH " + ",".join(blocks) + "\n    "
        + "\n    UNION ALL ".join(selects)
        + "\n    ORDER BY sh_round, rank"
    )


@register("q321_successive_halving", oracle=_sh_oracle())
def q321_successive_halving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Successive halving over data sources (the Hyperband inner loop,
    Jamieson & Talwalkar 2016, applied to SOURCE selection): all 20 arms
    are scored on a cheap 25% hash-prefix sample, the top half re-scores
    on 50%, the survivors on the full corpus — the budget-efficient way to
    pick high-quality sources when scoring the full corpus per candidate
    is unaffordable, exactly the regime of a 100 TB mixture search. Each
    round emits every evaluated arm with its sample size, mean quality,
    rank, and survival flag, so the output is the full elimination
    bracket.

    Determinism: per-doc quality lands on its 1e-4 grid and sums as exact
    BIGINTs; each arm's mean is one int/int division (identical doubles
    in both engines), so rankings cannot flip on accumulation order.
    Budgets are hash-prefix prefixes (the q105/q216 sampling discipline) —
    round r+1's sample CONTAINS round r's, as successive halving requires.

    Scale posture: each round is one map-side-combined aggregate over its
    sample with survivors attached by a |arms|-row semi-join; rankings
    are flat windows over <= 20-row arm frames (allowlisted). No round
    re-reads losers' documents — that is the algorithm's whole point."""
    from .text import STOPWORDS

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(toks)
    stop_ratio = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / n_tokens.cast(
        "double"
    )
    quality = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.5
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.5
    )
    q = docs.select(
        "source",
        hash_bucket("doc_id").alias("bucket"),
        F.round(quality * 10000.0, 0).cast("bigint").alias("qi"),
    )
    out = None
    survivors = None
    w = Window.orderBy((F.col("s") * 1.0 / F.col("n")).desc(), F.col("source"))
    for i, (ceil_b, keep) in enumerate(_SH_ROUNDS, start=1):
        sample = q.filter(F.col("bucket") < ceil_b) if ceil_b else q
        if survivors is not None:
            sample = sample.join(survivors, "source", "left_semi")
        k = (
            sample.groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("qi").cast("bigint").alias("s"),
            )
            .withColumn("rk", F.row_number().over(w))
        )
        rows = k.select(
            F.lit(i).alias("sh_round"),
            "source",
            F.col("n").alias("n_docs"),
            F.round(F.col("s") / 10000.0 / F.col("n"), 6).alias("mean_quality"),
            F.col("rk").cast("int").alias("rank"),
            (F.col("rk") <= keep).alias("kept"),
        )
        out = rows if out is None else out.unionByName(rows)
        survivors = k.filter(F.col("rk") <= keep).select("source")
    return out.orderBy("sh_round", "rank")
