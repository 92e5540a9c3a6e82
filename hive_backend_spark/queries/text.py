"""Text-analysis + dedup operators over `documents` — SURVEY §7 Phase 3.

These are the training-data-pipeline extensions (not reference behavior):
token counting, quality scoring, language-ID heuristics, fingerprinting, and
exact-dup detection. All built-in column expressions (JVM-side, codegen) — no
Python UDFs in any of these paths, so they scale to 100 TB of text at full
whole-stage-codegen speed.

Near-dup (MinHash-LSH / SimHash) lives in ``operators/dedup.py`` with its
own registered queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import dedup as D
from ..registry import register

# English-ish stopwords present in the synthetic corpus vocabulary.
STOPWORDS = ("the", "a", "of", "and")


@register(
    "q60_text_stats",
    oracle="""
    SELECT doc_id, lang, n_chars,
           len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
           round(CAST(n_chars AS DOUBLE) / len(regexp_split_to_array(trim(text), '\\s+')), 4) AS chars_per_token
    FROM documents
    """,
)
def q60_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + length stats (whitespace tokenization): the basic
    per-document quality signals. Pure scan + projection — embarrassingly
    parallel, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return docs.select(
        "doc_id",
        "lang",
        "n_chars",
        n_tokens.alias("n_tokens"),
        F.round(F.col("n_chars").cast("double") / n_tokens, 4).alias("chars_per_token"),
    )


@register(
    "q61_token_count_regex",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z]+')) AS word_tokens,
           len(regexp_extract_all(text, '[0-9]+')) AS num_tokens
    FROM documents
    """,
)
def q61_token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token counting (word vs numeric runs) — the cheap proxy
    for tokenizer-cost estimation over a corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit("[A-Za-z]+")).alias("word_tokens"),
        F.regexp_count(F.col("text"), F.lit("[0-9]+")).alias("num_tokens"),
    )


@register(
    "q62_quality_score",
    oracle=f"""
    SELECT doc_id,
           n_tokens,
           round(stop_hits / CAST(n_tokens AS DOUBLE), 4) AS stopword_ratio,
           round(LEAST(n_tokens / 100.0, 1.0) * 0.5
                 + LEAST(stop_hits / CAST(n_tokens AS DOUBLE) * 5.0, 1.0) * 0.5, 4) AS quality_score
    FROM (
      SELECT doc_id,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
             len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                             t -> list_contains({list(STOPWORDS)!r}::VARCHAR[], t))) AS stop_hits
      FROM documents
    )
    """,
)
def q62_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring (length + stopword-density mix, the classic C4-style
    heuristic family): still pure column expressions — array ops run inside
    codegen, no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    stop_ratio = stop_hits / n_tokens.cast("double")
    quality = F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.5 + F.least(
        stop_ratio * 5.0, F.lit(1.0)
    ) * 0.5
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(quality, 4).alias("quality_score"),
    )


@register(
    "q63_doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
)
def q63_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over whitespace-normalized lowercased
    text. md5 is bit-identical across engines, so fingerprints are portable
    keys for cross-system dedup."""
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return docs.select("doc_id", F.md5(normalized).alias("fingerprint"))


@register(
    "q64_exact_dup_groups",
    oracle="""
    SELECT fingerprint, count(*) AS n_dups, min(doc_id) AS keeper_doc_id
    FROM (
      SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
      FROM documents
    )
    GROUP BY fingerprint
    HAVING count(*) > 1
    """,
)
def q64_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deduplication (hash-groupBy): duplicate clusters with a
    deterministic keeper (min doc_id). At 100 TB this is the standard
    shuffle-on-digest dedup — the 16-byte digest, not the document text, is
    the shuffle key/payload."""
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return (
        docs.select("doc_id", F.md5(normalized).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("keeper_doc_id"))
        .filter(F.col("n_dups") > 1)
    )


@register(
    "q65_lang_profile",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars,
           round(avg(len(regexp_split_to_array(trim(text), '\\s+'))), 4) AS avg_tokens
    FROM documents
    GROUP BY lang
    """,
)
def q65_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus profile (the audit view a lang-ID pass feeds)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.avg(F.size(F.split(F.trim(F.col("text")), r"\s+"))), 4).alias("avg_tokens"),
    )


@register(
    "q66_lang_id_heuristic",
    oracle=f"""
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN stop_hits >= 3 THEN 'en_like' ELSE 'other' END AS predicted_class,
           stop_hits
    FROM (
      SELECT doc_id, lang,
             len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                             t -> list_contains({list(STOPWORDS)!r}::VARCHAR[], t))) AS stop_hits
      FROM documents
    )
    """,
)
def q66_lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (stopword-hit n-gram scoring): the structure of
    a real fastText-style classifier pass — score features per doc, threshold
    into classes — with a deterministic, oracle-checkable feature set."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.when(stop_hits >= 3, "en_like").otherwise("other").alias("predicted_class"),
        stop_hits.alias("stop_hits"),
    )


@register(
    "q78_vocabulary",
    oracle="""
    SELECT token,
           count(*) AS tf,
           count(DISTINCT doc_id) AS doc_freq
    FROM (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
      FROM documents
    )
    WHERE token <> ''
    GROUP BY token
    ORDER BY tf DESC, token ASC
    LIMIT 40
    """,
)
def q78_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary building: explode whitespace tokens, count term
    and document frequency, keep the top of the distribution — the first
    pass of any tokenizer-training or TF-IDF pipeline. explode feeds a
    partial-aggregating groupBy, so the shuffle carries one row per
    distinct (partition, token), not per token occurrence; the top-40 is
    TakeOrderedAndProject over the aggregated vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"), F.countDistinct("doc_id").alias("doc_freq"))
        .orderBy(F.col("tf").desc(), F.col("token").asc())
        .limit(40)
    )


@register(
    "q84_tfidf",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
      FROM documents
    ),
    tf AS (
      SELECT doc_id, token, count(*) AS tf
      FROM toks WHERE token <> '' GROUP BY doc_id, token
    ),
    idf AS (
      SELECT token,
             ln((SELECT count(*) FROM documents) / CAST(count(DISTINCT doc_id) AS DOUBLE)) AS idf
      FROM tf GROUP BY token
    )
    SELECT tf.doc_id, tf.token, round(tf.tf * idf.idf, 6) AS tfidf
    FROM tf JOIN idf USING (token)
    ORDER BY tfidf DESC, tf.doc_id ASC, tf.token ASC
    LIMIT 50
    """,
)
def q84_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF term weighting — the relevance-scoring / keyword-extraction
    primitive built on q78's vocabulary stats. Two aggregations over the
    exploded token stream (per-doc tf, per-token df) re-joined on token;
    the idf side is |vocabulary| rows — far under the token stream but
    still corpus-growing (Heaps' law), so it carries no broadcast hint and
    AQE picks broadcast vs shuffle at runtime. Corpus size enters as a
    1-row broadcast scalar, not a collected constant."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    idf = (
        tf.groupBy("token")
        .agg(F.countDistinct("doc_id").alias("df_docs"))
        .crossJoin(F.broadcast(n_docs))
        .select("token", F.log(F.col("n_docs") / F.col("df_docs").cast("double")).alias("idf"))
    )
    return (
        tf.join(idf, "token")  # vocab-sized side: AQE chooses the strategy
        .select("doc_id", "token", F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf"))
        .orderBy(F.col("tfidf").desc(), F.col("doc_id").asc(), F.col("token").asc())
        .limit(50)
    )


@register(
    "q103_corpus_clean",
    oracle=f"""
    SELECT lang,
           CASE WHEN n_tokens < 30 THEN 'too_short'
                WHEN stop_hits / CAST(n_tokens AS DOUBLE) < 0.03 THEN 'low_stopword'
                ELSE 'kept' END AS verdict,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT lang, n_chars,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
             len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                             t -> list_contains({list(STOPWORDS)!r}::VARCHAR[], t))) AS stop_hits
      FROM documents
    )
    GROUP BY lang, verdict
    """,
)
def q103_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus cleaning verdicts: every document is assigned the
    FIRST filter rule it fails (length gate, then stopword-density gate) or
    'kept', rolled up per language — the audit view a cleaning pipeline
    emits before materializing the kept subset. One scan, all-column
    expressions, tiny aggregate: at 100 TB the cost is the scan itself."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    verdict = (
        F.when(n_tokens < 30, "too_short")
        .when(stop_hits / n_tokens.cast("double") < 0.03, "low_stopword")
        .otherwise("kept")
    )
    return (
        docs.select("lang", "n_chars", verdict.alias("verdict"))
        .groupBy("lang", "verdict")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@register(
    "q104_term_redaction",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '\\b(customer|key)\\b')) AS n_masked,
           md5(regexp_replace(text, '\\b(customer|key)\\b', '[MASK]', 'g')) AS redacted_md5
    FROM documents
    WHERE len(regexp_extract_all(text, '\\b(customer|key)\\b')) > 0
    """,
)
def q104_term_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensitive-term redaction — the masking pass every training pipeline
    runs over raw text (PII patterns, denylisted terms): global
    regexp_replace with a word-boundary alternation, plus a per-doc hit
    count for the audit trail. The oracle compares an md5 of the redacted
    text, proving byte-identical masking across engines without hauling
    full documents through the comparison. Narrow map stage: no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    pat = r"\b(customer|key)\b"
    n_masked = F.size(F.regexp_extract_all("text", F.lit(pat)))
    return (
        docs.select(
            "doc_id",
            n_masked.alias("n_masked"),
            F.md5(F.regexp_replace("text", pat, "[MASK]")).alias("redacted_md5"),
        )
        .filter(F.col("n_masked") > 0)
    )


@register(
    "q105_incremental_dedup",
    oracle="""
    WITH fp AS (
      SELECT doc_id, md5(text) AS fingerprint,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
      FROM documents
    )
    SELECT i.doc_id, i.fingerprint
    FROM fp i
    WHERE i.bucket >= 'e6'
      AND NOT EXISTS (
        SELECT 1 FROM fp c WHERE c.bucket < 'e6' AND c.fingerprint = i.fingerprint
      )
    """,
)
def q105_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: an incoming batch (~10% of docs by hash
    split, standing in for today's crawl) is anti-joined on content
    fingerprint against the existing corpus, keeping only genuinely new
    content — the incremental counterpart to the full-corpus dedup (q64).
    At 100 TB the corpus side is a bucketed fingerprint index joined on its
    bucket key; here the anti join broadcasts the (small) incoming side's
    matches. No text moves — only 32-char digests."""
    docs = load_table(spark, sf_dir, "documents")
    from .sampling import hash_bucket

    fp = docs.select(
        "doc_id",
        F.md5("text").alias("fingerprint"),
        hash_bucket("doc_id").alias("bucket"),
    )
    incoming = fp.filter(F.col("bucket") >= "e6").select("doc_id", "fingerprint")
    corpus = fp.filter(F.col("bucket") < "e6").select("fingerprint")
    return incoming.join(corpus, "fingerprint", "left_anti")


@register(
    "q119_repetition_signals",
    oracle=r"""
    WITH base AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id, toks, len(toks) AS n,
             list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i+1]) AS bg,
             CASE WHEN len(toks) >= 3 THEN
               list_transform(range(1, len(toks)-1),
                              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
             END AS tg
      FROM base
    )
    SELECT doc_id,
      round(len(list_distinct(toks)) / CAST(n AS DOUBLE), 4) AS ttr,
      CASE WHEN n >= 2 THEN
        round(2.0 * list_max(list_transform(list_distinct(bg),
                x -> len(list_filter(bg, y -> y = x)))) / CAST(n AS DOUBLE), 4)
      END AS top_bigram_frac,
      CASE WHEN n >= 3 THEN
        round(len(list_filter(tg, x -> len(list_filter(tg, y -> y = x)) > 1))
              / CAST(len(tg) AS DOUBLE), 4)
      END AS dup_trigram_frac
    FROM g
    """,
)
def q119_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: type-token
    ratio, fraction of tokens covered by the single most frequent bigram,
    and fraction of trigram positions whose trigram repeats within the doc
    (Rae et al. 2021, "Scaling Language Models", Table A1 repetition
    filters). Zero shuffle — at 100 TB this is a pure map over the scan
    like q60/q62. The Spark side sorts each n-gram array once and then runs
    O(n) folds (max equal-run length == max occurrence count; a position's
    n-gram repeats iff it equals a sorted neighbor) instead of the naive
    O(distinct x n) nested filters — higher-order lambdas are interpreted,
    so cutting the eval count cuts wall-clock proportionally. The oracle
    keeps the naive-but-obvious nested-filter form: both compute the same
    counts, which is the point of the check. Docs too short for an n-gram
    get NULL (never a fake 0) in both engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = (
        docs.withColumn("toks", F.split(F.trim(F.col("text")), r"\s+"))
        .withColumn("n", F.size("toks"))
        .withColumn(
            "sbg",
            F.expr(
                "array_sort(transform(sequence(0, n-2), i -> concat(toks[i], ' ', toks[i+1])))"
            ),
        )
        .withColumn(
            "stg",
            F.expr(
                "CASE WHEN n >= 3 THEN array_sort(transform(sequence(0, n-3),"
                " i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))) END"
            ),
        )
    )
    # Longest equal run in the sorted bigram array == max bigram multiplicity.
    max_run = (
        "CASE WHEN size(sbg) < 2 THEN 1 ELSE aggregate(sequence(1, size(sbg)-1),"
        " named_struct('run', 1, 'best', 1),"
        " (acc, i) -> IF(sbg[i] = sbg[i-1],"
        "   named_struct('run', acc.run + 1, 'best', greatest(acc.best, acc.run + 1)),"
        "   named_struct('run', 1, 'best', acc.best)),"
        " acc -> acc.best) END"
    )
    # A sorted position's trigram is unique iff it differs from both neighbors.
    n_once = (
        "size(filter(sequence(0, size(stg)-1),"
        " i -> (i = 0 OR stg[i] != stg[i-1]) AND (i = size(stg)-1 OR stg[i] != stg[i+1])))"
    )
    return d.select(
        "doc_id",
        F.round(F.expr("size(array_distinct(toks)) / CAST(n AS DOUBLE)"), 4).alias("ttr"),
        F.when(
            F.col("n") >= 2,
            F.round(F.expr(f"2.0 * ({max_run}) / CAST(n AS DOUBLE)"), 4),
        ).alias("top_bigram_frac"),
        F.when(
            F.col("n") >= 3,
            F.round(F.expr(f"(size(stg) - ({n_once})) / CAST(size(stg) AS DOUBLE)"), 4),
        ).alias("dup_trigram_frac"),
    )


# Chunking geometry: 32-token windows advancing by 24 (8-token overlap) —
# the context-window preparation step for embedding / retrieval pipelines.
_CHUNK, _STRIDE = 32, 24


@register(
    "q120_chunk_windows",
    oracle=rf"""
    WITH base AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks,
             len(regexp_split_to_array(trim(text), '\s+')) AS n
      FROM documents
    )
    SELECT doc_id, k AS chunk_id,
           array_to_string(toks[k*{_STRIDE}+1 : k*{_STRIDE}+{_CHUNK}], ' ') AS chunk_text,
           LEAST({_CHUNK}, n - k*{_STRIDE}) AS chunk_tokens
    FROM base, unnest(range(0, 1 + CAST(greatest(0,
           ceil((n - {_CHUNK}) / CAST({_STRIDE} AS DOUBLE))) AS BIGINT))) AS u(k)
    """,
)
def q120_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (32-token windows, stride 24): the
    standard document->passage step before embedding or retrieval indexing.
    A generate (explode over a per-doc start sequence) followed by an
    O(chunk) slice — map-side only, no shuffle, and the chunk count adapts
    to each doc's length so short docs emit exactly one chunk. Every token
    appears in at least one chunk; the final chunk is allowed to run short
    rather than re-reading the tail twice. chunk_text round-trips the exact
    canonical-trim tokens, so chunk md5s are stable across engines."""
    docs = load_table(spark, sf_dir, "documents")
    d = (
        docs.withColumn("toks", F.split(F.trim(F.col("text")), r"\s+"))
        .withColumn("n", F.size("toks"))
        .withColumn(
            "k",
            F.expr(
                f"explode(sequence(0, CAST(greatest(0,"
                f" ceil((n - {_CHUNK}) / CAST({_STRIDE} AS DOUBLE))) AS INT)))"
            ),
        )
    )
    return d.select(
        "doc_id",
        F.col("k").alias("chunk_id"),
        F.expr(f"array_join(slice(toks, k*{_STRIDE}+1, {_CHUNK}), ' ')").alias("chunk_text"),
        F.expr(f"least({_CHUNK}, n - k*{_STRIDE})").alias("chunk_tokens"),
    )


@register(
    "q122_winsorized_stats",
    oracle="""
    WITH p AS (
      SELECT lang,
             quantile_cont(n_chars, 0.05) AS p05,
             quantile_cont(n_chars, 0.95) AS p95
      FROM documents GROUP BY lang
    )
    SELECT d.lang, count(*) AS n_docs,
           round(any_value(p.p05), 4) AS p05_chars,
           round(any_value(p.p95), 4) AS p95_chars,
           round(sum(LEAST(GREATEST(CAST(d.n_chars AS DOUBLE), p.p05), p.p95))
                 / count(*), 4) AS winsorized_mean
    FROM documents d JOIN p USING (lang)
    GROUP BY d.lang
    """,
)
def q122_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language winsorized length statistics: exact p05/p95 percentiles
    (linear interpolation — Spark `percentile` and DuckDB `quantile_cont`
    share the definition), then a robust mean with every value clamped into
    [p05, p95]. The outlier-trimming step before any corpus-level length
    normalization. One Window pass attaches the percentiles (single shuffle
    on lang), then the final agg rides the same partitioning — Catalyst
    reuses the Exchange rather than shuffling twice. The mean derives from
    sum/count (never avg) per the float-parity rule; the 4-decimal rounding
    absorbs summation-order drift, which at 5 groups x ~100s of doubles is
    ~1e-10 relative."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("lang")
    d = (
        docs.withColumn("p05", F.expr("percentile(n_chars, 0.05)").over(w))
        .withColumn("p95", F.expr("percentile(n_chars, 0.95)").over(w))
        .withColumn(
            "clamped", F.expr("least(greatest(CAST(n_chars AS DOUBLE), p05), p95)")
        )
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.first("p05"), 4).alias("p05_chars"),
        F.round(F.first("p95"), 4).alias("p95_chars"),
        F.round(F.sum("clamped") / F.count(F.lit(1)), 4).alias("winsorized_mean"),
    )


# Boilerplate-removal geometry for q128: non-overlapping 16-token windows
# ("lines" — the fixture text has no newlines); a window whose exact content
# appears in >= 3 distinct documents is boilerplate (the C4/Dolma
# repeated-line rule).
_BP_WINDOW, _BP_MIN_DF = 16, 3


@register(
    "q128_boilerplate_removal",
    oracle=rf"""
    WITH base AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks,
             len(regexp_split_to_array(trim(text), '\s+')) AS n
      FROM documents
    ), w AS (
      SELECT doc_id, k,
             array_to_string(toks[k*{_BP_WINDOW}+1 : k*{_BP_WINDOW}+{_BP_WINDOW}], ' ') AS wtext
      FROM base, unnest(range(0, CAST(ceil(n / {_BP_WINDOW}.0) AS BIGINT))) AS u(k)
    ), bp AS (
      SELECT md5(wtext) AS whash FROM w
      GROUP BY md5(wtext) HAVING count(DISTINCT doc_id) >= {_BP_MIN_DF}
    ), flagged AS (
      SELECT doc_id, k, wtext, md5(wtext) IN (SELECT whash FROM bp) AS is_bp FROM w
    )
    SELECT doc_id,
           count(*) AS n_windows,
           count(*) FILTER (is_bp) AS n_removed,
           md5(coalesce(string_agg(CASE WHEN NOT is_bp THEN wtext END, ' ' ORDER BY k), ''))
             AS cleaned_md5
    FROM flagged GROUP BY doc_id
    """,
)
def q128_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-window (boilerplate) removal — the C4/Dolma "drop any line
    that appears in >= N documents" rule, over 16-token windows since the
    fixture text has no line structure: headers, navigation chrome and
    license blurbs are exactly what this kills in a web corpus. Windows are
    df-counted BY 32-CHAR DIGEST, so the frequency shuffle moves md5s, not
    window text; the boilerplate set (small in practice, but corpus-growing,
    so AQE — not a forced hint — picks its join) comes back as the removal
    filter, and each doc is
    reassembled from its surviving windows in original order. The cleaned
    text is md5-compared against the oracle, so reassembly order and every
    removal decision are value-checked. Two shuffles total at any scale:
    digest df-count + per-doc regroup."""
    docs = load_table(spark, sf_dir, "documents")
    w = (
        docs.withColumn("toks", F.split(F.trim(F.col("text")), r"\s+"))
        .withColumn("n", F.size("toks"))
        .withColumn(
            "k",
            F.expr(f"explode(sequence(0, CAST(ceil(n / {_BP_WINDOW}.0) AS INT) - 1))"),
        )
        .select(
            "doc_id",
            "k",
            F.expr(f"array_join(slice(toks, k*{_BP_WINDOW}+1, {_BP_WINDOW}), ' ')").alias("wtext"),
        )
        .withColumn("whash", F.md5("wtext"))
    )
    bp = (
        w.groupBy("whash")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= _BP_MIN_DF)
        .select("whash", F.lit(True).alias("is_bp"))
    )
    # the boilerplate set grows with the corpus (every df>=3 window digest),
    # so no broadcast hint — AQE broadcasts while small, else shuffles on
    # the digest both sides already produced
    flagged = w.join(bp, "whash", "left").withColumn(
        "is_bp", F.coalesce(F.col("is_bp"), F.lit(False))
    )
    kept_struct = F.when(~F.col("is_bp"), F.struct("k", "wtext"))
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum(F.when(F.col("is_bp"), 1).otherwise(0)).cast("bigint").alias("n_removed"),
        F.md5(
            F.array_join(
                F.transform(F.array_sort(F.collect_list(kept_struct)), lambda s: s["wtext"]),
                " ",
            )
        ).alias("cleaned_md5"),
    )


# Winnowing geometry for q131: token 5-grams, window of 4 consecutive gram
# hashes (guarantee: any shared run of >= 8 tokens yields at least one shared
# fingerprint).
_WIN_GRAM, _WIN_W = 5, 4


def _winnowed(docs: DataFrame) -> DataFrame:
    """docs + (toks, n, h, fps): the winnowing fingerprint construction
    shared by q131 (per-doc signatures) and q139 (fingerprint-overlap
    decontamination). All per-document higher-order expressions — map-only."""
    return (
        docs.withColumn("toks", F.split(F.trim(F.col("text")), r"\s+"))
        .withColumn("n", F.size("toks"))
        .withColumn(
            "h",
            F.expr(
                f"CASE WHEN n >= {_WIN_GRAM} THEN transform(sequence(0, n - {_WIN_GRAM}),"
                f" i -> md5(array_join(slice(toks, i+1, {_WIN_GRAM}), ' '))) END"
            ),
        )
        .withColumn(
            "fps",
            F.expr(
                f"CASE WHEN h IS NOT NULL THEN array_sort(array_distinct("
                f"transform(sequence(0, greatest(size(h) - {_WIN_W}, 0)),"
                f" i -> array_min(slice(h, i+1, {_WIN_W}))))) END"
            ),
        )
    )


@register(
    "q131_winnowing_fingerprints",
    oracle=rf"""
    WITH base AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks,
             len(regexp_split_to_array(trim(text), '\s+')) AS n
      FROM documents
    ), hashed AS (
      SELECT doc_id, n,
             CASE WHEN n >= {_WIN_GRAM} THEN
               list_transform(range(0, n - {_WIN_GRAM} + 1),
                 i -> md5(array_to_string(toks[i+1 : i+{_WIN_GRAM}], ' ')))
             END AS h
      FROM base
    )
    SELECT doc_id,
           CAST(coalesce(len(h), 0) AS BIGINT) AS n_grams,
           CAST(CASE WHEN h IS NULL THEN 0 ELSE len(list_distinct(
             list_transform(range(0, greatest(len(h) - {_WIN_W} + 1, 1)),
               i -> list_aggregate(h[i+1 : i+{_WIN_W}], 'min'))
           )) END AS BIGINT) AS n_fingerprints,
           CASE WHEN h IS NOT NULL THEN md5(array_to_string(list_sort(list_distinct(
             list_transform(range(0, greatest(len(h) - {_WIN_W} + 1, 1)),
               i -> list_aggregate(h[i+1 : i+{_WIN_W}], 'min')))), ' '))
           END AS fp_digest
    FROM hashed
    """,
)
def q131_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., the MOSS rolling-
    hash selection): hash every token 5-gram, slide a 4-hash window, keep
    each window's minimum — the classic guarantee that any shared token run
    of >= 8 tokens produces at least one shared fingerprint, at ~1/4 the
    density of full k-gram fingerprinting. The selected set is the compact
    per-doc signature that plagiarism/overlap detection joins on (exact
    dedup q63 keeps one hash per doc; this keeps one per locality). Hashes
    are md5 hex strings and 'min' is lexicographic in both engines, so
    selection is value-exact; the digest of the sorted distinct
    fingerprints is hash-compared. Map-only — all work is per-document
    higher-order expressions; the fingerprint JOIN (not materialized here)
    is what would shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    d = _winnowed(docs)
    return d.select(
        "doc_id",
        F.coalesce(F.size("h"), F.lit(0)).cast("bigint").alias("n_grams"),
        F.coalesce(F.size("fps"), F.lit(0)).cast("bigint").alias("n_fingerprints"),
        F.when(F.col("fps").isNotNull(), F.md5(F.array_join(F.col("fps"), " "))).alias("fp_digest"),
    )


@register(
    "q137_ngram_novelty",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             md5(unnest(list_distinct(list_transform(
               range(1, greatest(len(t) - 1, 1)),
               i -> concat_ws(' ', t[i], t[i+1], t[i+2]))))) AS gh
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
            FROM documents)
      WHERE len(t) >= 3
    ),
    df AS (SELECT gh, count(*) AS df FROM g GROUP BY gh)
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           round(CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS novelty
    FROM g JOIN df USING (gh)
    GROUP BY g.doc_id
    """,
)
def q137_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty — the uniqueness signal diversity-aware
    selection uses opposite dedup: the fraction of a document's distinct
    3-gram shingles that occur in NO other document (corpus df == 1). Low
    novelty marks template/boilerplate-heavy docs even when no pair
    crosses a near-dup threshold; high novelty marks content worth
    up-sampling. Shingles reuse the dedup pipeline's Arrow-vectorized
    tokenization, and the corpus df aggregation shuffles 16-byte md5
    digests rather than gram text (the q128 discipline) — two digest
    shuffles total at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    g = (
        D.spread(docs)
        .select("doc_id", F.explode(D.shingles_udf()(F.col("text"))).alias("gram"))
        .select("doc_id", F.md5("gram").alias("gh"))
    )
    df_ = g.groupBy("gh").agg(F.count(F.lit(1)).alias("df"))
    novel = F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).cast("bigint")
    return (
        g.join(df_, "gh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            novel.alias("n_novel"),
            F.round(novel.cast("double") / F.count(F.lit(1)), 6).alias("novelty"),
        )
    )


@register(
    "q138_token_fertility",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS ws_tokens,
           CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+'))) AS BIGINT) AS word_tokens,
           CAST(sum(len(regexp_extract_all(text, '[0-9]+'))) AS BIGINT) AS num_tokens,
           CAST(sum(len(text)) AS BIGINT) AS n_chars,
           round(CAST(sum(len(text)) AS DOUBLE)
                 / sum(len(regexp_split_to_array(trim(text), '\\s+'))), 4) AS chars_per_ws_token,
           round(CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+'))
                          + len(regexp_extract_all(text, '[0-9]+'))) AS DOUBLE)
                 / sum(len(regexp_split_to_array(trim(text), '\\s+'))), 4) AS fertility
    FROM documents
    GROUP BY lang
    """,
)
def q138_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility report — the corpus-level planning
    aggregate over q60/q61's per-doc counts: whitespace tokens, regex word/
    digit-run tokens (the BPE-ish proxy), chars per whitespace token, and
    fertility = regex tokens per whitespace token. This is what sizes a
    token budget per language before an expensive real-tokenizer pass, and
    a drift in it between corpus versions is a canary for text-cleaning
    regressions. One scan, map-side partial aggregation into |langs| rows;
    every compared value is an integer or a rounded ratio of integer sums
    (both engines derive the identical doubles)."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    words = F.regexp_count(F.col("text"), F.lit("[A-Za-z]+"))
    nums = F.regexp_count(F.col("text"), F.lit("[0-9]+"))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(ws).cast("bigint").alias("ws_tokens"),
        F.sum(words).cast("bigint").alias("word_tokens"),
        F.sum(nums).cast("bigint").alias("num_tokens"),
        F.sum(F.length("text")).cast("bigint").alias("n_chars"),
        F.round(
            F.sum(F.length("text")).cast("double") / F.sum(ws), 4
        ).alias("chars_per_ws_token"),
        F.round(
            (F.sum(words) + F.sum(nums)).cast("double") / F.sum(ws), 4
        ).alias("fertility"),
    )


# Named so the q171 ladder rollup can reuse the identical flagged-doc rule.
ORACLE_WINNOW_FLAGGED = rf"""
    WITH base AS (
      SELECT doc_id,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
             regexp_split_to_array(trim(text), '\s+') AS toks,
             len(regexp_split_to_array(trim(text), '\s+')) AS n
      FROM documents
    ), hashed AS (
      SELECT doc_id, bucket, n,
             CASE WHEN n >= {_WIN_GRAM} THEN
               list_transform(range(0, n - {_WIN_GRAM} + 1),
                 i -> md5(array_to_string(toks[i+1 : i+{_WIN_GRAM}], ' ')))
             END AS h
      FROM base
    ), fpl AS (
      SELECT doc_id, bucket,
             list_distinct(list_transform(range(0, greatest(len(h) - {_WIN_W} + 1, 1)),
               i -> list_aggregate(h[i+1 : i+{_WIN_W}], 'min'))) AS fps
      FROM hashed WHERE h IS NOT NULL
    ), f AS (
      SELECT doc_id, bucket, len(fps) AS n_fps, unnest(fps) AS fp FROM fpl
    ), ev AS (
      SELECT DISTINCT fp FROM f WHERE bucket >= 'f0'
    )
    SELECT f.doc_id,
           CAST(max(f.n_fps) AS BIGINT) AS n_fingerprints,
           CAST(count(*) AS BIGINT) AS n_shared_fingerprints,
           round(CAST(count(*) AS DOUBLE) / max(f.n_fps), 6) AS shared_frac
    FROM f JOIN ev USING (fp)
    WHERE f.bucket < 'f0'
    GROUP BY f.doc_id
    """


@register("q139_fingerprint_decontamination", oracle=ORACLE_WINNOW_FLAGGED)
def q139_fingerprint_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-fingerprint decontamination — the middle rung of the
    decontamination ladder: cheaper than exact 8-gram overlap (q106, which
    explodes every gram) and deterministic unlike MinHash banding (q133).
    By the winnowing guarantee (q131), any train/eval shared token run of
    >= {_WIN_GRAM} + {_WIN_W} - 1 tokens produces at least one shared
    SELECTED fingerprint, so joining the ~1/{_WIN_W}-density fingerprint
    sets loses no long-overlap recall while moving ~4x fewer rows than the
    gram join. Flagged train docs report how many of their fingerprints
    the eval split also selected.

    Scale posture mirrors q106: the eval split is benchmark-sized, so its
    distinct fingerprint set broadcasts; training fingerprints are
    filtered map-side, and only the (rare) hits shuffle for the per-doc
    count. The fingerprint rows are produced by one vectorized mapInPandas
    pass (the operators/dedup.explode_bands discipline): exploding the
    column-expression form instead lets Catalyst collapse the O(n x W)
    winnowing transform INTO the Generate and re-evaluate it once per
    generated fingerprint — O(n^2) interpreted work per document
    (measured: 2 s column-form q131 vs minutes for its exploded twin at
    sf0.1). q131's column form stays as the cross-engine spec; the
    winnowing property test (test_properties.py::_py_winnow parity) pins
    the Python selection byte-identical to it."""
    import hashlib
    import re

    import pandas as pd

    g, wnd = _WIN_GRAM, _WIN_W
    ws = re.compile(r"\s+")

    def gen(batches):
        for pdf in batches:
            ids, buckets, nfps, fps = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # strip(" ") mirrors SQL trim (spaces only) — see shingles_udf
                toks = ws.split(text.strip(" "))
                if len(toks) < g:
                    continue
                h = [
                    hashlib.md5(" ".join(toks[i : i + g]).encode()).hexdigest()
                    for i in range(len(toks) - g + 1)
                ]
                sel = sorted({min(h[i : i + wnd]) for i in range(max(len(h) - wnd + 1, 1))})
                b = hashlib.md5(str(doc_id).encode()).hexdigest()[:2]
                for fp in sel:
                    ids.append(doc_id)
                    buckets.append(b)
                    nfps.append(len(sel))
                    fps.append(fp)
            yield pd.DataFrame(
                {"doc_id": ids, "bucket": buckets, "n_fps": nfps, "fp": fps}
            )

    from .sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    # Split BEFORE the mapInPandas: the bucket is doc_id-derived, but the
    # winnowing pass is opaque to Catalyst, so a post-UDF bucket filter
    # cannot push below it — the r12 plan ran the full-corpus md5 winnowing
    # TWICE (once per branch). Filtering each branch's scan first makes the
    # two passes cover DISJOINT splits: one corpus winnowing total, and the
    # in-UDF bucket recomputation stays byte-identical to the filter.
    base = docs.select("doc_id", "text")
    _winnow = lambda d: D.spread(d).mapInPandas(  # noqa: E731
        gen, schema="doc_id bigint, bucket string, n_fps int, fp string"
    )
    eval_fps = (
        _winnow(base.filter(hash_bucket("doc_id") >= "f0"))
        .select("fp")
        .distinct()
    )
    train = _winnow(base.filter(hash_bucket("doc_id") < "f0"))
    return (
        train.join(F.broadcast(eval_fps), "fp")  # bounded: eval benchmark side
        .groupBy("doc_id")
        .agg(
            F.max("n_fps").cast("bigint").alias("n_fingerprints"),
            F.count(F.lit(1)).cast("bigint").alias("n_shared_fingerprints"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.max("n_fps"), 6
            ).alias("shared_frac"),
        )
    )


# Duplicate-span detection unit: same 8-token gram as decontamination
# (q106) — long enough that a shared gram implies copied text.
_SPAN_N = 8


@register(
    "q142_duplicate_ngram_spans",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
    ),
    g AS (
      SELECT doc_id, len(t) AS n_tokens,
             unnest(list_transform(range(0, len(t) - {_SPAN_N} + 1),
               i -> struct_pack(pos := i,
                 g := md5(array_to_string(t[i+1 : i+{_SPAN_N}], ' '))))) AS s
      FROM tok WHERE len(t) >= {_SPAN_N}
    ),
    ge AS (SELECT doc_id, n_tokens, s.pos AS pos, s.g AS g FROM g),
    dup AS (SELECT g FROM ge GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
    hit AS (
      SELECT doc_id, n_tokens, pos, pos + {_SPAN_N} - 1 AS e
      FROM ge JOIN dup USING (g)
    ),
    isl AS (
      SELECT doc_id, n_tokens, pos, e,
             CASE WHEN max(e) OVER w IS NULL OR pos > max(e) OVER w
                  THEN 1 ELSE 0 END AS is_new
      FROM hit
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    isl2 AS (
      SELECT *, sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM isl
    ),
    sp AS (
      SELECT doc_id, max(n_tokens) AS n_tokens, island,
             min(pos) AS s, max(e) AS e
      FROM isl2 GROUP BY doc_id, island
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_dup_spans,
           CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens,
           CAST(max(n_tokens) AS BIGINT) AS n_tokens,
           round(sum(e - s + 1) / CAST(max(n_tokens) AS DOUBLE), 6) AS dup_frac,
           md5(string_agg(s || '-' || e, ',' ORDER BY s)) AS span_digest
    FROM sp GROUP BY doc_id
    """,
)
def q142_duplicate_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate-SPAN detection — the substring-granular
    dedup of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better") at {_SPAN_N}-gram resolution: find every
    {_SPAN_N}-token gram occurring in more than one document, then merge
    each document's duplicated gram positions into maximal token spans.
    Unlike whole-doc dedup (q63/q64) or candidate pairing (q67/q100),
    the output names WHICH token ranges to cut (span digest included so
    the cut list itself is hash-verified), plus the per-doc duplicated
    fraction — partially-copied boilerplate that document-level
    fingerprints can't see.

    Determinism: positions/lengths are integers, the span merge is a
    gaps-and-islands window over the unique-per-doc position order, and
    the span list digests via md5 of the position-ordered "s-e" list.

    Scale posture: gram digests (not text) shuffle once for the
    document-frequency count — the q106/q128 discipline; the join back
    carries only digest hits, and the island windows partition by doc_id
    with per-partition work bounded by document length. The gram digest
    is computed AFTER the position explode (one md5 over {_SPAN_N} tokens
    per generated row) — never inside the generator expression, where
    Catalyst would re-evaluate the whole per-doc transform once per
    generated element (the q139 O(n^2) trap)."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    ).filter(F.size("t") >= _SPAN_N)
    ge = (
        base.select(
            "doc_id",
            F.size("t").alias("n_tokens"),
            "t",
            F.explode(F.sequence(F.lit(0), F.size("t") - _SPAN_N)).alias("pos"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "pos",
            F.md5(F.concat_ws(" ", F.slice("t", F.col("pos") + 1, _SPAN_N))).alias("g"),
        )
    )
    dup = ge.groupBy("g").agg(
        F.countDistinct("doc_id").alias("nd")
    ).filter(F.col("nd") >= 2).select("g")
    hit = ge.join(dup, "g").select(
        "doc_id", "n_tokens", "pos", (F.col("pos") + _SPAN_N - 1).alias("e")
    )
    wp = Window.partitionBy("doc_id").orderBy("pos")
    prev_max_e = F.max("e").over(wp.rowsBetween(Window.unboundedPreceding, -1))
    isl = hit.select(
        "doc_id",
        "n_tokens",
        "pos",
        "e",
        F.when(prev_max_e.isNull() | (F.col("pos") > prev_max_e), 1)
        .otherwise(0)
        .alias("is_new"),
    ).select(
        "doc_id",
        "n_tokens",
        "pos",
        "e",
        F.sum("is_new").over(wp.rowsBetween(Window.unboundedPreceding, 0)).alias("island"),
    )
    sp = isl.groupBy("doc_id", "island").agg(
        F.max("n_tokens").alias("n_tokens"),
        F.min("pos").alias("s"),
        F.max("e").alias("e"),
    )
    return sp.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias("dup_tokens"),
        F.max("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(
            F.sum(F.col("e") - F.col("s") + 1)
            / F.max("n_tokens").cast("double"),
            6,
        ).alias("dup_frac"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("s", "e"))),
                    lambda st: F.concat_ws("-", st.getField("s"), st.getField("e")),
                ),
                ",",
            )
        ).alias("span_digest"),
    )


@register(
    "q146_token_entropy",
    oracle="""
    SELECT doc_id,
           len(t) AS n_tokens,
           len(list_distinct(t)) AS n_distinct,
           round(-list_aggregate(list_transform(list_sort(list_distinct(t)),
             x -> (len(list_filter(t, y -> y = x)) / CAST(len(t) AS DOUBLE))
                  * ln(len(list_filter(t, y -> y = x)) / CAST(len(t) AS DOUBLE))),
             'sum'), 4) AS entropy,
           CASE WHEN len(list_distinct(t)) > 1 THEN
             round(-list_aggregate(list_transform(list_sort(list_distinct(t)),
               x -> (len(list_filter(t, y -> y = x)) / CAST(len(t) AS DOUBLE))
                    * ln(len(list_filter(t, y -> y = x)) / CAST(len(t) AS DOUBLE))),
               'sum') / ln(CAST(len(list_distinct(t)) AS DOUBLE)), 4)
           END AS norm_entropy
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
          FROM documents)
    """,
)
def q146_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token-distribution Shannon entropy (plus the
    normalized form entropy/ln(V)) — the information-density quality
    signal beside q119's repetition fractions: near-zero entropy means a
    doc is one token repeated (spam/boilerplate), normalized entropy near
    1 means a flat distribution (hash dumps, tables). Used as a gate
    alongside the C4-style heuristics in q62/q103.

    Determinism: the entropy sum folds sequentially over per-token counts
    in SORTED token order in both engines (run-length fold here, sorted
    distinct list in the oracle — same order, same exact integer counts),
    so accumulation order is identical.

    Scale posture: map-only — per-doc array expressions inside codegen,
    zero shuffle, zero UDF. Per-doc work is O(n log n): one array_sort,
    then run boundaries via a linear filter over positions (equal tokens
    are adjacent after the sort), then counts as differences of
    consecutive run-end positions — NOT the O(V x n) re-scan-per-distinct
    -token shape (a 100k-token doc with 10k distinct tokens would do 1e9
    comparisons in one task)."""
    docs = load_table(spark, sf_dir, "documents")
    plogp = (
        "aggregate(transform(ends, (e, j) -> "
        "((e - if(j = 0, 0, element_at(ends, j))) / CAST(size(t) AS DOUBLE)) "
        "* ln((e - if(j = 0, 0, element_at(ends, j))) / CAST(size(t) AS DOUBLE))), "
        "0D, (acc, v) -> acc + v)"
    )
    return (
        docs.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t"))
        .withColumn("s", F.array_sort("t"))
        .withColumn(
            "ends",
            F.expr(
                "filter(sequence(1, size(s)), "
                "i -> i = size(s) OR element_at(s, i) != element_at(s, i + 1))"
            ),
        )
        .select(
            "doc_id",
            F.size("t").alias("n_tokens"),
            F.size("ends").alias("n_distinct"),
            F.round(-F.expr(plogp), 4).alias("entropy"),
            F.when(
                F.size("ends") > 1,
                F.round(
                    -F.expr(plogp) / F.log(F.size("ends").cast("double")),
                    4,
                ),
            ).alias("norm_entropy"),
        )
    )


@register(
    "q147_source_drift",
    oracle="""
    WITH d AS (
      SELECT lang,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80'
                  THEN 1 ELSE 0 END AS is_ref,
             len(regexp_split_to_array(trim(text), '\\s+')) AS v
      FROM documents
    ),
    per AS (
      SELECT lang, v,
             CAST(sum(is_ref) AS BIGINT) AS c_ref,
             CAST(sum(1 - is_ref) AS BIGINT) AS c_cur
      FROM d GROUP BY lang, v
    ),
    c AS (
      SELECT lang, v, c_ref, c_cur,
             sum(c_ref) OVER (PARTITION BY lang ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cr,
             sum(c_cur) OVER (PARTITION BY lang ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
             sum(c_ref) OVER (PARTITION BY lang) AS nr,
             sum(c_cur) OVER (PARTITION BY lang) AS nc
      FROM per
    )
    SELECT lang,
           CAST(max(nr) AS BIGINT) AS n_ref,
           CAST(max(nc) AS BIGINT) AS n_cur,
           CASE WHEN max(nr) = 0 OR max(nc) = 0 THEN NULL ELSE
             round(max(abs(cr / CAST(nr AS DOUBLE) - cc / CAST(nc AS DOUBLE))), 6)
           END AS ks_stat,
           CASE WHEN max(nr) = 0 OR max(nc) = 0 THEN NULL ELSE
             round(1.63 * sqrt((max(nr) + max(nc))
                   / (CAST(max(nr) AS DOUBLE) * max(nc))), 6)
           END AS ks_crit,
           CASE WHEN max(nr) = 0 OR max(nc) = 0 THEN TRUE ELSE
             max(abs(cr / CAST(nr AS DOUBLE) - cc / CAST(nc AS DOUBLE)))
               > 1.63 * sqrt((max(nr) + max(nc))
                   / (CAST(max(nr) AS DOUBLE) * max(nc)))
           END AS drifted
    FROM c GROUP BY lang
    """,
)
def q147_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: a two-sample Kolmogorov-Smirnov test on
    the per-language document-length distribution between the reference
    half of the corpus (md5 bucket < 0x80) and the incoming half — the
    canary a production ingest pipeline evaluates per batch to catch a
    scraper change or cleaning regression before it poisons a training
    mix. Reports the KS statistic beside the alpha=0.01 critical value
    (1.63 * sqrt((n1+n2)/(n1*n2))) and the drift verdict.

    Determinism: both ECDFs are cumulative-sum windows over exact integer
    counts grouped by distinct value, so every compared double is a ratio
    of integers; the max over distinct values is order-free.

    One-sided languages: a language whose docs all land in one md5 half
    (possible for any rare language) has no KS statistic, and under ANSI
    mode a plain division would throw DIVIDE_BY_ZERO at runtime while
    the DuckDB oracle quietly yields NULL — a hard failure AND an oracle
    divergence. Both engines now agree explicitly: ks_stat/ks_crit NULL,
    drifted TRUE (a population appearing on only one side IS drift).

    Scale posture: one scan -> (lang, value) partial agg (|langs| x
    |distinct lengths| rows — tiny), windowed cumsums partitioned by
    lang over that reduced relation, one final |langs|-row aggregate.
    Nothing corpus-sized survives the first aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    from .sampling import hash_bucket

    d = docs.select(
        "lang",
        (hash_bucket("doc_id") < "80").cast("int").alias("is_ref"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("v"),
    )
    per = d.groupBy("lang", "v").agg(
        F.sum("is_ref").cast("bigint").alias("c_ref"),
        F.sum(1 - F.col("is_ref")).cast("bigint").alias("c_cur"),
    )
    wcum = (
        Window.partitionBy("lang")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("lang")
    c = per.select(
        "lang",
        F.sum("c_ref").over(wcum).alias("cr"),
        F.sum("c_cur").over(wcum).alias("cc"),
        F.sum("c_ref").over(wall).alias("nr"),
        F.sum("c_cur").over(wall).alias("nc"),
    )
    diff = F.abs(
        F.try_divide(F.col("cr"), F.col("nr").cast("double"))
        - F.try_divide(F.col("cc"), F.col("nc").cast("double"))
    )
    crit = 1.63 * F.sqrt(
        F.try_divide(
            F.max("nr") + F.max("nc"),
            F.max("nr").cast("double") * F.max("nc"),
        )
    )
    one_sided = (F.max("nr") == 0) | (F.max("nc") == 0)
    return c.groupBy("lang").agg(
        F.max("nr").cast("bigint").alias("n_ref"),
        F.max("nc").cast("bigint").alias("n_cur"),
        F.round(F.max(diff), 6).alias("ks_stat"),
        F.round(crit, 6).alias("ks_crit"),
        F.when(one_sided, F.lit(True))
        .otherwise(F.max(diff) > crit)
        .alias("drifted"),
    )


@register(
    "q149_vocab_overlap",
    oracle="""
    WITH vocab AS (
      SELECT DISTINCT lang, term
      FROM (SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
            FROM documents)
    ),
    sizes AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM vocab GROUP BY lang),
    shared AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b, CAST(count(*) AS BIGINT) AS n_shared
      FROM vocab a JOIN vocab b ON a.term = b.term AND a.lang < b.lang
      GROUP BY a.lang, b.lang
    )
    SELECT lang_a, lang_b,
           sa.n AS n_terms_a, sb.n AS n_terms_b, n_shared,
           round(n_shared / CAST(sa.n + sb.n - n_shared AS DOUBLE), 6) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.lang = lang_a
    JOIN sizes sb ON sb.lang = lang_b
    """,
)
def q149_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-language vocabulary overlap: Jaccard similarity of the
    distinct-token vocabularies for every language pair — the lang-ID
    quality audit (two languages whose vocabularies overlap heavily in a
    corpus usually mean a broken classifier or heavy code-switching, both
    of which poison per-language mixture planning q113/q143).

    Determinism: all set sizes are exact integer counts; jaccard is one
    division, rounded.

    Scale posture: the distinct (lang, term) relation is one
    dedup-shuffle (vocabulary-bounded per language, not corpus-bounded);
    the pair intersection joins vocab to itself ON TERM — shuffle keyed
    on term, never a language cross product — and |langs|^2/2 result
    groups. The |langs|-row size table broadcasts."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            "lang", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
        )
        .distinct()
    )
    sizes = vocab.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = vocab.select(F.col("lang").alias("lang_a"), "term")
    b = vocab.select(F.col("lang").alias("lang_b"), "term")
    shared = (
        a.join(b, "term")
        .filter(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    sa = F.broadcast(sizes.select(F.col("lang").alias("lang_a"), F.col("n").alias("n_terms_a")))
    sb = F.broadcast(sizes.select(F.col("lang").alias("lang_b"), F.col("n").alias("n_terms_b")))
    return (
        shared.join(sa, "lang_a")
        .join(sb, "lang_b")
        .select(
            "lang_a",
            "lang_b",
            "n_terms_a",
            "n_terms_b",
            "n_shared",
            F.round(
                F.col("n_shared")
                / (F.col("n_terms_a") + F.col("n_terms_b") - F.col("n_shared")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )


# Burstiness report head: top terms by corpus frequency.
_BURST_K = 20


@register(
    "q150_term_burstiness",
    oracle=f"""
    WITH per_doc AS (
      SELECT term, doc_id, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
            FROM documents)
      GROUP BY term, doc_id
    ),
    d AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    agg AS (
      SELECT term,
             CAST(sum(c) AS BIGINT) AS tf,
             CAST(count(*) AS BIGINT) AS df,
             CAST(sum(c * c) AS BIGINT) AS sumsq
      FROM per_doc GROUP BY term
    )
    SELECT term, tf, df,
           round(df / CAST(n_docs AS DOUBLE), 6) AS doc_frac,
           round((sumsq / CAST(n_docs AS DOUBLE)
                  - (tf / CAST(n_docs AS DOUBLE)) * (tf / CAST(n_docs AS DOUBLE)))
                 / (tf / CAST(n_docs AS DOUBLE)), 6) AS fano
    FROM agg, d
    ORDER BY tf DESC, term
    LIMIT {_BURST_K}
    """,
)
def q150_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness (Fano factor of per-document counts): var/mean of
    each head term's per-doc occurrence count over the whole corpus —
    near 1 means Poisson-scattered (function words), far above 1 means
    the term clumps in few documents (content words, or a template
    pasted into a subset of docs). The standard term-weighting/template
    diagnostic beside PMI (q148) and entropy (q146).

    Determinism: variance expands to sumsq/D - (tf/D)^2 over exact
    integer sums with the identical expression tree in both engines;
    order ties-break on the exact integer tf then term.

    Scale posture: same shuffle shape as q145 — one explode ->
    (term, doc) partial agg -> term agg, a broadcast 1-row doc count,
    and a TakeOrdered head."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = (
        docs.select(
            "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    d = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    agg = per_doc.groupBy("term").agg(
        F.sum("c").cast("bigint").alias("tf"),
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sumsq"),
    )
    nd = F.col("n_docs").cast("double")
    mean = F.col("tf") / nd
    fano = (F.col("sumsq") / nd - mean * mean) / mean
    return (
        agg.crossJoin(F.broadcast(d))
        .select(
            "term",
            "tf",
            "df",
            F.round(F.col("df") / nd, 6).alias("doc_frac"),
            F.round(fano, 6).alias("fano"),
        )
        .orderBy(F.col("tf").desc(), "term")
        .limit(_BURST_K)
    )


# q158: corpus-derived stopword list size + the coverage gate threshold.
# 25 head terms ~ the closed-class core of a language; coverage below 20%
# is the word-salad / wrong-language signal (Gopher's stop-word rule uses
# the same shape with a fixed list — deriving it from the corpus makes the
# gate language-agnostic).
_SW_K = 25
_SW_MIN_COVERAGE = 0.2


@register(
    "q158_stopword_coverage_gate",
    oracle=f"""
    WITH sw AS (
      SELECT term FROM (
        SELECT term, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
              FROM documents)
        GROUP BY term
        ORDER BY c DESC, term ASC LIMIT {_SW_K})
    ),
    swl AS (SELECT list(term ORDER BY term) AS sw FROM sw),
    t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
          FROM documents)
    SELECT doc_id,
           len(t) AS n_tokens,
           round(len(list_filter(t, x -> list_contains(sw, x)))
                 / CAST(len(t) AS DOUBLE), 4) AS stopword_coverage,
           len(list_filter(t, x -> list_contains(sw, x)))
             / CAST(len(t) AS DOUBLE) < {_SW_MIN_COVERAGE} AS low_coverage
    FROM t, swl
    """,
)
def q158_stopword_coverage_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-derived stopword-coverage gate: build the stopword list from
    the corpus itself (top-{_SW_K} terms by frequency, ties alphabetic)
    and flag documents whose coverage — fraction of tokens drawn from
    that list — falls below {_SW_MIN_COVERAGE}. Natural prose is dense in
    closed-class words; hash dumps, code blobs, word salad, and
    wrong-language documents are not. Same gate family as q62/q103 but
    with the list LEARNED from the corpus, so it ports across languages
    without a hand-curated list.

    Determinism: the head list is an exact-count TakeOrdered with
    alphabetic tie-break; coverage is a ratio of exact integers.

    Scale posture: the stopword head is vocabulary-bounded aggregation ->
    top-{_SW_K} (the q141 shape); the {_SW_K}-term array rides a 1-row
    broadcast into a map-only coverage pass — no corpus shuffle, and the
    membership probe is an O({_SW_K}) array_contains inside codegen, not
    a join per token."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    head = (
        docs.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .orderBy(F.col("c").desc(), F.col("term").asc())
        .limit(_SW_K)
    )
    swl = head.agg(F.sort_array(F.collect_list("term")).alias("sw"))
    hits = F.size(F.filter(F.col("t"), lambda x: F.array_contains(F.col("sw"), x)))
    coverage = hits / F.size("t").cast("double")
    return (
        docs.select("doc_id", toks.alias("t"))
        .crossJoin(F.broadcast(swl))
        .select(
            "doc_id",
            F.size("t").alias("n_tokens"),
            F.round(coverage, 4).alias("stopword_coverage"),
            (coverage < _SW_MIN_COVERAGE).alias("low_coverage"),
        )
    )


# --- q160: PII scrubbing census ---------------------------------------------

# Engine-portable patterns: plain classes, \b, bounded repetition — identical
# semantics under Java regex (Spark) and RE2 (DuckDB); no backrefs/lookaround.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
# A live deny-term so the replace/count path is exercised by the synthetic
# fixture (which contains no digits at all — the PII classes stay zero there
# by construction, which the census faithfully reports).
_PII_WATCH = r"\bcustomer\b"


@register(
    "q160_pii_scrub",
    oracle=f"""
    WITH scrubbed AS (
      SELECT source,
             length(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_email,
             length(regexp_extract_all(text, '{_PII_IPV4}')) AS n_ipv4,
             length(regexp_extract_all(text, '{_PII_PHONE}')) AS n_phone,
             length(regexp_extract_all(text, '{_PII_WATCH}')) AS n_watch,
             length(text) - length(
               regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                 text, '{_PII_EMAIL}', '', 'g'), '{_PII_IPV4}', '', 'g'),
                 '{_PII_PHONE}', '', 'g'), '{_PII_WATCH}', '', 'g')
             ) AS redacted
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_email + n_ipv4 + n_phone > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS pii_docs,
           CAST(sum(CASE WHEN n_watch > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS watch_docs,
           CAST(sum(n_email) AS BIGINT) AS email_matches,
           CAST(sum(n_ipv4) AS BIGINT) AS ipv4_matches,
           CAST(sum(n_phone) AS BIGINT) AS phone_matches,
           CAST(sum(n_watch) AS BIGINT) AS watch_matches,
           CAST(sum(redacted) AS BIGINT) AS chars_redacted
    FROM scrubbed
    GROUP BY source
    ORDER BY source
    """,
)
def q160_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing census: regex-detect emails / IPv4 addresses /
    phone-shaped numbers plus a deny-term watchlist, redact them, and
    report per-source match counts and characters removed — the
    compliance gate every pre-training corpus passes through before
    anything else touches it. Patterns are restricted to the
    engine-portable subset (character classes, word boundaries, bounded
    repetition — no lookaround/backrefs) so Java regex and RE2 agree
    match-for-match; the fixture corpus contains no digits, so the three
    PII classes are structurally zero there and the census proves it,
    while the watch term exercises the nonzero path end to end.

    Scale posture: pure map-side — four regexp_count + a chained
    regexp_replace inside codegen per row, then one bounded-cardinality
    per-source aggregation. Nothing corpus-sized ever shuffles; at 100 TB
    this is scan-rate bound, exactly what a scrub pass should be."""
    docs = load_table(spark, sf_dir, "documents")
    n = lambda pat: F.regexp_count(F.col("text"), F.lit(pat))  # noqa: E731
    redacted = F.col("text")
    for pat in (_PII_EMAIL, _PII_IPV4, _PII_PHONE, _PII_WATCH):
        redacted = F.regexp_replace(redacted, pat, "")
    per_doc = docs.select(
        "source",
        n(_PII_EMAIL).alias("n_email"),
        n(_PII_IPV4).alias("n_ipv4"),
        n(_PII_PHONE).alias("n_phone"),
        n(_PII_WATCH).alias("n_watch"),
        (F.length("text") - F.length(redacted)).alias("redacted"),
    )
    any_pii = (F.col("n_email") + F.col("n_ipv4") + F.col("n_phone")) > 0
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(any_pii.cast("int")).cast("bigint").alias("pii_docs"),
            F.sum((F.col("n_watch") > 0).cast("int")).cast("bigint").alias("watch_docs"),
            F.sum("n_email").cast("bigint").alias("email_matches"),
            F.sum("n_ipv4").cast("bigint").alias("ipv4_matches"),
            F.sum("n_phone").cast("bigint").alias("phone_matches"),
            F.sum("n_watch").cast("bigint").alias("watch_matches"),
            F.sum("redacted").cast("bigint").alias("chars_redacted"),
        )
        .orderBy("source")
    )


# --- q162: quality-feature correlation matrix --------------------------------


@register(
    "q162_feature_correlation",
    oracle="""
    WITH feats AS (
      SELECT source,
             CAST(n_chars AS DOUBLE) AS n_chars,
             CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE)
               AS toks,
             CAST(length(list_distinct(regexp_split_to_array(trim(text), '\\s+')))
               AS DOUBLE) AS dtoks
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(corr(n_chars, toks), 4) AS corr_chars_toks,
           round(corr(toks, dtoks), 4) AS corr_toks_distinct,
           round(corr(n_chars, dtoks), 4) AS corr_chars_distinct
    FROM feats
    GROUP BY source
    HAVING count(*) >= 2
    ORDER BY source
    """,
)
def q162_feature_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Pearson correlation between quality features (character
    length, token count, distinct-token count) — the feature-redundancy
    audit run before wiring quality signals into a filter ensemble: a
    pair correlating at ~1 is one signal counted twice, and a source
    whose correlation structure differs from the rest is drawn from a
    different generator (template spam, concatenation artifacts).

    Determinism: both engines compute textbook sample Pearson; inputs are
    exact integers cast to double, groups are ~dozens of docs, and the
    ratio is rounded to 4 — summation-order residue is orders of
    magnitude below the rounding grain. Spark returns NaN where DuckDB
    returns NULL for degenerate groups (zero variance / n=1); NaN is
    normalized to NULL and singleton groups are excluded in both engines
    so the edge semantics agree.

    Scale posture: one narrow map computes features in codegen, one
    bounded-cardinality per-source aggregation computes all three
    correlations in a single pass (corr is algebraic — partial
    sums/products merge map-side). No second shuffle, nothing
    corpus-sized materializes."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    feats = docs.select(
        "source",
        F.col("n_chars").cast("double").alias("nc"),
        F.size(toks).cast("double").alias("toks"),
        F.size(F.array_distinct(toks)).cast("double").alias("dtoks"),
    )
    nonan = lambda c: F.when(F.isnan(c), F.lit(None)).otherwise(c)  # noqa: E731
    return (
        feats.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(nonan(F.corr("nc", "toks")), 4).alias("corr_chars_toks"),
            F.round(nonan(F.corr("toks", "dtoks")), 4).alias("corr_toks_distinct"),
            F.round(nonan(F.corr("nc", "dtoks")), 4).alias("corr_chars_distinct"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy("source")
    )


# --- q165: robust outlier census (median/MAD) --------------------------------

_MAD_SIGMA = 1.4826  # consistency constant: MAD -> sigma under normality
_MAD_Z = 3.0


@register(
    "q165_mad_outliers",
    oracle=f"""
    WITH med AS (
      SELECT *, median(value) OVER (PARTITION BY event_type) AS med
      FROM events
    ),
    dev AS (
      SELECT *, median(abs(value - med)) OVER (PARTITION BY event_type) AS mad
      FROM med
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(any_value(med), 4) AS med,
           round(any_value(mad), 4) AS mad,
           CAST(sum(CASE WHEN abs(value - med) > {_MAD_Z} * {_MAD_SIGMA} * mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(sum(CASE WHEN abs(value - med) > {_MAD_Z} * {_MAD_SIGMA} * mad
                          THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
             AS outlier_share,
           round(max(abs(value - med) / ({_MAD_SIGMA} * nullif(mad, 0))), 4)
             AS max_robust_z
    FROM dev
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q165_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier census per event type: median/MAD (median absolute
    deviation, scaled by {_MAD_SIGMA} for normal consistency) instead of
    mean/stddev — the detector that still works when the contamination
    itself inflates the scale estimate, which is exactly when z-scores go
    blind. Flags |x - med| > {_MAD_Z}σ̂ and reports the per-type outlier
    mass plus the worst robust z — the metric-quality gate for a value
    column feeding training signals (q122's winsorized stats are the
    LIMITING treatment; this is the DETECTING one).

    Determinism: both engines compute interpolated medians (Spark
    `percentile`, DuckDB `median`) over the same doubles; counts are
    exact integers, ratios rounded to 4.

    Scale posture: two window-attached medians sharing ONE event_type
    hash partition (the second median consumes the first in the same
    exchange — no join, no second corpus shuffle), then the grouped
    census on the same key. Group cardinality is the event-type dimension
    — bounded — so every aggregation is a map-side-combine shuffle of
    k rows."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    med = events.withColumn("med", F.expr("percentile(value, 0.5)").over(w))
    dev = med.withColumn(
        "mad", F.expr("percentile(abs(value - med), 0.5)").over(w)
    )
    is_out = (
        F.abs(F.col("value") - F.col("med")) > _MAD_Z * _MAD_SIGMA * F.col("mad")
    ).cast("int")
    return (
        dev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.first("med"), 4).alias("med"),
            F.round(F.first("mad"), 4).alias("mad"),
            F.sum(is_out).cast("bigint").alias("n_outliers"),
            F.round(F.sum(is_out) / F.count(F.lit(1)), 4).alias("outlier_share"),
            # nullif(mad, 0): a type whose values are >50% at the median has
            # MAD 0 — both engines then report max_robust_z NULL instead of
            # Spark ANSI DIVIDE_BY_ZERO vs DuckDB inf diverging.
            F.round(
                F.max(
                    F.abs(F.col("value") - F.col("med"))
                    / (_MAD_SIGMA * F.nullif(F.col("mad"), F.lit(0)))
                ),
                4,
            ).alias("max_robust_z"),
        )
        .orderBy("event_type")
    )


# --- q169: per-source quality calibration ------------------------------------

_CAL_FRAC = 0.10  # bottom decile gate


@register(
    "q169_quality_calibration",
    oracle=f"""
    WITH q AS (
      SELECT source,
             LEAST(n_tokens / 100.0, 1.0) * 0.5
             + LEAST(stop_hits / CAST(n_tokens AS DOUBLE) * 5.0, 1.0) * 0.5
               AS raw
      FROM (
        SELECT source,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
               len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                               t -> list_contains({list(STOPWORDS)!r}::VARCHAR[], t)))
                 AS stop_hits
        FROM documents
      )
    ),
    thr AS (SELECT quantile_cont(raw, {_CAL_FRAC}) AS p10 FROM q),
    r AS (
      SELECT source, raw,
             percent_rank() OVER (PARTITION BY source ORDER BY raw) AS pr
      FROM q
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN raw < (SELECT p10 FROM thr) THEN 1 ELSE 0 END)
                AS BIGINT) AS flagged_global,
           CAST(sum(CASE WHEN pr < {_CAL_FRAC} THEN 1 ELSE 0 END) AS BIGINT)
             AS flagged_calibrated,
           CAST(sum(CASE WHEN (raw < (SELECT p10 FROM thr))
                          <> (pr < {_CAL_FRAC}) THEN 1 ELSE 0 END) AS BIGINT)
             AS disagreements,
           round(sum(CASE WHEN (raw < (SELECT p10 FROM thr))
                           <> (pr < {_CAL_FRAC}) THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS disagreement_share
    FROM r
    GROUP BY source
    ORDER BY source
    """,
)
def q169_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-gate calibration: contrast a single GLOBAL
    quality threshold (corpus-wide bottom {_CAL_FRAC:.0%} of q62's score)
    with a PER-SOURCE calibrated gate (bottom {_CAL_FRAC:.0%} percentile
    rank within each source). A global cutoff silently ejects whole
    low-register sources and passes every doc of high-register ones; the
    calibrated gate removes each source's own worst tail. The report
    counts, per source, how many docs each rule flags and where they
    disagree — the evidence for choosing a thresholding policy before a
    filtering run, the same exact-beside-alternative shape as q145/q154.

    Determinism: identical score arithmetic in both engines; percentile
    ranks share tie structure because the scores are bit-identical
    doubles; the global threshold is one interpolated quantile.

    Scale posture: one source-partitioned window (the percent_rank) and
    the per-source census share a single hash exchange; the global
    quantile is a 1-row scalar attached by broadcast. Nothing else
    shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(toks)
    stop_ratio = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / n_tokens.cast(
        "double"
    )
    raw = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.5
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.5
    )
    q = docs.select("source", raw.alias("raw"))
    thr = q.agg(F.expr(f"percentile(raw, {_CAL_FRAC})").alias("p10"))
    r = q.withColumn(
        "pr", F.percent_rank().over(Window.partitionBy("source").orderBy("raw"))
    ).crossJoin(F.broadcast(thr))
    g_flag = (F.col("raw") < F.col("p10")).cast("int")
    c_flag = (F.col("pr") < _CAL_FRAC).cast("int")
    return (
        r.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(g_flag).cast("bigint").alias("flagged_global"),
            F.sum(c_flag).cast("bigint").alias("flagged_calibrated"),
            F.sum((g_flag != c_flag).cast("int")).cast("bigint").alias("disagreements"),
            F.round(
                F.sum((g_flag != c_flag).cast("int")) / F.count(F.lit(1)), 4
            ).alias("disagreement_share"),
        )
        .orderBy("source")
    )


# --- q170: template-prefix census --------------------------------------------

_TPL_K = 2  # prefix length in tokens
_TPL_MIN = 3  # minimum docs sharing a prefix to report


@register(
    "q170_template_prefix_census",
    oracle=f"""
    WITH p AS (
      SELECT concat_ws(' ', regexp_split_to_array(trim(text), '\\s+')[1],
                       regexp_split_to_array(trim(text), '\\s+')[2]) AS prefix,
             source,
             md5(trim(text)) AS fp
      FROM documents
      WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= {_TPL_K}
    ),
    g1 AS (
      SELECT prefix, source, fp, count(*) AS cnt
      FROM p GROUP BY prefix, source, fp
    )
    SELECT prefix,
           CAST(sum(cnt) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct_texts,
           round(count(DISTINCT fp) * 1.0 / sum(cnt), 4) AS text_diversity
    FROM g1
    GROUP BY prefix
    HAVING sum(cnt) >= {_TPL_MIN}
    ORDER BY n_docs DESC, prefix
    """,
)
def q170_template_prefix_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template-prefix census: group documents by their first {_TPL_K}
    tokens and report prefixes shared by >= {_TPL_MIN} docs with source
    spread and text diversity. Boilerplate farms and templated spam open
    identically while varying the tail — exactly the shape full-document
    hashing (q64) misses and shingle LSH only catches pair-by-pair; low
    text_diversity at high n_docs = exact-dup mass, high diversity =
    live template. Complements q128's within-doc boilerplate removal
    with a cross-doc generator-level view.

    Scale posture: the prefix is a two-token map-side projection (no
    shingling, no UDF); the first aggregation groups (prefix, source,
    fingerprint) — corpus-sized but one shuffle of short digests — and
    the distinct counts run on that already-reduced table, so the
    count-distinct Expand touches group rows, not corpus rows."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    p = docs.filter(F.size(toks) >= _TPL_K).select(
        F.concat_ws(
            " ", F.element_at(toks, 1), F.element_at(toks, 2)
        ).alias("prefix"),
        "source",
        F.md5(F.trim(F.col("text"))).alias("fp"),
    )
    g1 = p.groupBy("prefix", "source", "fp").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        g1.groupBy("prefix")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.countDistinct("fp").cast("bigint").alias("n_distinct_texts"),
            F.round(F.countDistinct("fp") / F.sum("cnt"), 4).alias("text_diversity"),
        )
        .filter(F.col("n_docs") >= _TPL_MIN)
        .orderBy(F.col("n_docs").desc(), F.col("prefix").asc())
    )


# --- q174: per-source Welch t-test drift audit -------------------------------


@register(
    "q174_source_welch_drift",
    oracle="""
    WITH d AS (
      SELECT source,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS x
      FROM documents
    ),
    per AS (
      SELECT source, CAST(count(*) AS DOUBLE) AS n1,
             sum(x) AS s1, sum(x * x) AS ss1
      FROM d GROUP BY source
    ),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS s, sum(x * x) AS ss FROM d),
    m AS (
      SELECT source, n1, s1 / n1 AS m1,
             (ss1 - n1 * (s1 / n1) * (s1 / n1)) / (n1 - 1) AS v1,
             (SELECT n FROM tot) - n1 AS n2,
             ((SELECT s FROM tot) - s1) / ((SELECT n FROM tot) - n1) AS m2,
             ((SELECT ss FROM tot) - ss1
              - ((SELECT n FROM tot) - n1)
                * (((SELECT s FROM tot) - s1) / ((SELECT n FROM tot) - n1))
                * (((SELECT s FROM tot) - s1) / ((SELECT n FROM tot) - n1)))
             / ((SELECT n FROM tot) - n1 - 1) AS v2
      FROM per
    )
    SELECT source,
           CAST(n1 AS BIGINT) AS n_docs,
           round(m1, 4) AS mean_tokens,
           round(m2, 4) AS mean_rest,
           round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 4) AS t_stat,
           round(pow(v1 / n1 + v2 / n2, 2)
                 / (pow(v1 / n1, 2) / (n1 - 1) + pow(v2 / n2, 2) / (n2 - 1)),
                 4) AS welch_df,
           abs((m1 - m2) / sqrt(v1 / n1 + v2 / n2)) > 1.96 AS significant
    FROM m
    ORDER BY source
    """,
)
def q174_source_welch_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mean-shift audit: Welch's t between each source's token
    counts and the rest of the corpus — the parametric companion to
    q147's KS test (KS sees any distributional change; this isolates MEAN
    drift with a significance call, the alarm wired to ingest when a
    source silently changes its chunking or truncation). One-vs-rest
    comes free from the algebra: the complement's moments are the global
    sums minus the source's sums, so there is no per-pair work and no
    second scan.

    Determinism: every input to the float math is an exact integer sum;
    both engines then evaluate the identical closed-form expressions
    (variance from sums, Welch-Satterthwaite df), so the rounded outputs
    agree bit-for-bit.

    Scale posture: ONE aggregation per source (bounded dimension) and a
    1-row global-sums scalar attached by broadcast; everything downstream
    is arithmetic on |sources| rows."""
    docs = load_table(spark, sf_dir, "documents")
    x = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("double")
    d = docs.select("source", x.alias("x"))
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n1"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("ss1"),
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("ss"),
    )
    j = per.crossJoin(F.broadcast(tot))
    m1 = F.col("s1") / F.col("n1")
    v1 = (F.col("ss1") - F.col("n1") * m1 * m1) / (F.col("n1") - 1)
    n2 = F.col("n") - F.col("n1")
    m2 = (F.col("s") - F.col("s1")) / n2
    v2 = (F.col("ss") - F.col("ss1") - n2 * m2 * m2) / (n2 - 1)
    se2 = v1 / F.col("n1") + v2 / n2
    t = (m1 - m2) / F.sqrt(se2)
    df = F.pow(se2, 2) / (
        F.pow(v1 / F.col("n1"), 2) / (F.col("n1") - 1) + F.pow(v2 / n2, 2) / (n2 - 1)
    )
    return j.select(
        "source",
        F.col("n1").cast("bigint").alias("n_docs"),
        F.round(m1, 4).alias("mean_tokens"),
        F.round(m2, 4).alias("mean_rest"),
        F.round(t, 4).alias("t_stat"),
        F.round(df, 4).alias("welch_df"),
        (F.abs(t) > 1.96).alias("significant"),
    ).orderBy("source")


# --- q175: classifier-vs-label agreement audit -------------------------------


@register(
    "q175_langid_confusion",
    oracle=f"""
    WITH p AS (
      SELECT lang,
             CASE WHEN len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                    t -> list_contains({list(STOPWORDS)!r}::VARCHAR[], t))) >= 3
                  THEN 1 ELSE 0 END AS pred_en
      FROM documents
    ),
    g AS (
      SELECT CAST(sum(CASE WHEN lang = 'en' AND pred_en = 1 THEN 1 ELSE 0 END)
               AS DOUBLE) AS tp,
             CAST(sum(pred_en) AS DOUBLE) AS pred_pos,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
               AS actual_pos
      FROM p
    )
    SELECT lang AS labeled_lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(pred_en) AS BIGINT) AS pred_en_like,
           CAST(count(*) - sum(pred_en) AS BIGINT) AS pred_other,
           round(sum(CASE WHEN (lang = 'en') = (pred_en = 1) THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 4) AS class_accuracy,
           round((SELECT tp / pred_pos FROM g), 4) AS precision_en,
           round((SELECT tp / actual_pos FROM g), 4) AS recall_en
    FROM p
    GROUP BY lang
    ORDER BY labeled_lang
    """,
)
def q175_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-vs-metadata agreement audit: q66's stopword lang-ID
    against the corpus's own lang labels — per labeled language, how the
    classifier splits its docs, the per-class accuracy, and the global
    precision/recall of the 'en' prediction. Label-quality auditing cuts
    both ways: a language with low agreement either has mislabeled docs
    or exposes a classifier blind spot — and at 100 TB nobody inspects
    either by hand; this census is how the disagreement mass gets
    budgeted before a re-labeling run.

    Scale posture: the classifier feature is map-side (stopword hits in
    codegen), one bounded per-language aggregation, and the global
    precision/recall is a 1-row scalar broadcast onto the report rows."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    pred_en = (F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) >= 3).cast("int")
    p = docs.select(F.col("lang"), pred_en.alias("pred_en"))
    g = p.agg(
        F.sum(F.when((F.col("lang") == "en") & (F.col("pred_en") == 1), 1).otherwise(0))
        .cast("double")
        .alias("tp"),
        F.sum("pred_en").cast("double").alias("pred_pos"),
        F.sum((F.col("lang") == "en").cast("int")).cast("double").alias("actual_pos"),
    )
    agree = ((F.col("lang") == "en") == (F.col("pred_en") == 1)).cast("int")
    return (
        p.groupBy(F.col("lang").alias("labeled_lang"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("pred_en").cast("bigint").alias("pred_en_like"),
            (F.count(F.lit(1)) - F.sum("pred_en")).cast("bigint").alias("pred_other"),
            F.round(F.sum(agree) / F.count(F.lit(1)), 4).alias("class_accuracy"),
        )
        .crossJoin(F.broadcast(g))
        .select(
            "labeled_lang",
            "n_docs",
            "pred_en_like",
            "pred_other",
            "class_accuracy",
            F.round(F.col("tp") / F.col("pred_pos"), 4).alias("precision_en"),
            F.round(F.col("tp") / F.col("actual_pos"), 4).alias("recall_en"),
        )
        .orderBy("labeled_lang")
    )


# --- q180: PSI distribution-drift audit --------------------------------------

_PSI_EPS = 0.0005  # floor for shares so empty buckets stay finite
_PSI_ALERT = 0.2  # industry convention: PSI > 0.2 = significant shift


@register(
    "q180_psi_drift",
    oracle=f"""
    WITH d AS (
      SELECT CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS x,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8' AS is_ref
      FROM documents
    ),
    cuts AS (
      SELECT quantile_cont(x, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS c
      FROM d WHERE is_ref
    ),
    b AS (
      SELECT len(list_filter((SELECT c FROM cuts), v -> v < x)) AS bucket, is_ref
      FROM d
    ),
    per AS (
      SELECT bucket,
             CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS ref_n,
             CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS inc_n
      FROM b GROUP BY bucket
    ),
    tot AS (SELECT sum(ref_n) AS rt, sum(inc_n) AS it FROM per),
    sh AS (
      SELECT bucket, ref_n, inc_n,
             greatest(ref_n * 1.0 / (SELECT rt FROM tot), {_PSI_EPS}) AS p,
             greatest(inc_n * 1.0 / (SELECT it FROM tot), {_PSI_EPS}) AS q
      FROM per
    ),
    psi AS (SELECT sum((q - p) * ln(q / p)) AS v FROM sh)
    SELECT CAST(bucket AS INT) AS bucket, ref_n, inc_n,
           round(p, 4) AS ref_share,
           round(q, 4) AS inc_share,
           round((q - p) * ln(q / p), 6) AS psi_term,
           round((SELECT v FROM psi), 4) AS psi_total,
           (SELECT v FROM psi) > {_PSI_ALERT} AS drifted
    FROM sh
    ORDER BY bucket
    """,
)
def q180_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index on the token-count distribution between
    the reference half and the incoming half (md5 split, q147's rule):
    bucket by the REFERENCE's own deciles, compare bucket shares, and sum
    (q-p)·ln(q/p). PSI completes the drift triad — q147's KS answers "did
    the distribution change at all", q174's Welch isolates mean shift,
    PSI localizes WHICH region of the distribution moved (the per-bucket
    psi_term is the evidence trail) with the industry's conventional
    alarm at {_PSI_ALERT}. Shares are floored at {_PSI_EPS} so an empty
    incoming bucket reports a large finite term instead of infinity —
    identical clamping in both engines.

    Scale posture: one scan computes the feature map-side; the reference
    deciles are ONE interpolated-percentile aggregate broadcast as a
    9-value array; bucket assignment is an O(9) array probe in codegen;
    the report is a 10-row aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    x = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("double")
    d = docs.select(
        x.alias("x"),
        (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "8").alias(
            "is_ref"
        ),
    )
    cuts = d.filter("is_ref").agg(
        F.expr(
            "percentile(x, array(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9))"
        ).alias("c")
    )
    b = d.crossJoin(F.broadcast(cuts)).select(
        F.size(F.filter(F.col("c"), lambda v: v < F.col("x"))).alias("bucket"),
        "is_ref",
    )
    per = b.groupBy("bucket").agg(
        F.sum(F.col("is_ref").cast("int")).cast("bigint").alias("ref_n"),
        F.sum((~F.col("is_ref")).cast("int")).cast("bigint").alias("inc_n"),
    )
    tot = per.agg(F.sum("ref_n").alias("rt"), F.sum("inc_n").alias("it"))
    p_share = F.greatest(F.col("ref_n") / F.col("rt"), F.lit(_PSI_EPS))
    q_share = F.greatest(F.col("inc_n") / F.col("it"), F.lit(_PSI_EPS))
    sh = per.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "ref_n",
        "inc_n",
        p_share.alias("p"),
        q_share.alias("q"),
    )
    psi = sh.agg(
        F.sum((F.col("q") - F.col("p")) * F.log(F.col("q") / F.col("p"))).alias("v")
    )
    return (
        sh.crossJoin(F.broadcast(psi))
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            "ref_n",
            "inc_n",
            F.round("p", 4).alias("ref_share"),
            F.round("q", 4).alias("inc_share"),
            F.round((F.col("q") - F.col("p")) * F.log(F.col("q") / F.col("p")), 6)
            .alias("psi_term"),
            F.round("v", 4).alias("psi_total"),
            (F.col("v") > _PSI_ALERT).alias("drifted"),
        )
        .orderBy("bucket")
    )


# --- q181: hapax legomena census ---------------------------------------------


@register(
    "q181_hapax_census",
    oracle="""
    WITH tc AS (
      SELECT source, term, count(*) AS c
      FROM (SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
            FROM documents)
      GROUP BY source, term
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS vocab_size,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_terms,
           CAST(sum(c) AS BIGINT) AS tokens,
           round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
             AS hapax_frac
    FROM tc
    GROUP BY source
    ORDER BY source
    """,
)
def q181_hapax_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax legomena census: per source, the fraction of vocabulary terms
    occurring exactly once. Natural corpora sit near 40-60% hapax (the
    Heaps/Zipf tail that makes the q114 vocabulary-map bound sublinear —
    this query is that argument's empirical check); templated or
    synthetic text collapses the fraction, OCR noise and mojibake inflate
    it with junk singletons. The vocabulary-health gate beside q141's
    Zipf slope, at per-source grain so one bad feed stands out.

    Scale posture: one (source, term) count — the q78 vocabulary shuffle
    keyed by source — then a bounded per-source rollup. Nothing but
    digest-sized rows move."""
    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select(
            "source",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
        )
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        tc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
            F.sum((F.col("c") == 1).cast("int")).cast("bigint").alias("hapax_terms"),
            F.sum("c").cast("bigint").alias("tokens"),
            F.round(
                F.sum((F.col("c") == 1).cast("int")) / F.count(F.lit(1)), 4
            ).alias("hapax_frac"),
        )
        .orderBy("source")
    )


# --- q182: vocabulary coverage curve -----------------------------------------

_COV_KS = (5, 10, 20, 30, 40)  # head sizes to report (fixture vocab ~40 terms)
_COV_HEAD = 40


@register(
    "q182_vocab_coverage",
    oracle=f"""
    WITH tc AS (
      SELECT term, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
            FROM documents)
      GROUP BY term
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS t,
                   CAST(count(*) AS BIGINT) AS v FROM tc),
    head AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, term) AS rk
      FROM tc ORDER BY c DESC, term LIMIT {_COV_HEAD}
    ),
    cum AS (
      SELECT rk, sum(c) OVER (ORDER BY rk ROWS UNBOUNDED PRECEDING) AS cum_c
      FROM head
    )
    SELECT CAST(rk AS INT) AS vocab_k,
           CAST(cum_c AS BIGINT) AS tokens_covered,
           round(cum_c * 1.0 / (SELECT t FROM tot), 4) AS coverage,
           CAST((SELECT v FROM tot) AS BIGINT) AS vocab_size,
           CAST((SELECT t FROM tot) AS BIGINT) AS tokens_total
    FROM cum
    WHERE rk IN {_COV_KS}
    ORDER BY vocab_k
    """,
)
def q182_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what fraction of all tokens the top-k
    vocabulary covers, at fixed head sizes — the tokenizer-budget planning
    view (choose the smallest vocab whose coverage clears the OOV target)
    beside q138's fertility and q141's Zipf slope. A healthy Zipf corpus
    covers most mass with a tiny head; a flat curve means vocabulary
    explosion (noise, code, concatenated IDs).

    Scale posture: vocabulary-bounded count (the q78 shuffle), then the
    curve is computed on a TakeOrdered top-{_COV_HEAD} head only — the
    single-partition cumulative window runs over {_COV_HEAD} rows by
    construction, never the full Heaps-bounded vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = tc.agg(
        F.sum("c").cast("bigint").alias("t"), F.count(F.lit(1)).cast("bigint").alias("v")
    )
    head = tc.orderBy(F.col("c").desc(), F.col("term").asc()).limit(_COV_HEAD)
    w = Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        head.select(
            "c",
            F.row_number()
            .over(Window.orderBy(F.col("c").desc(), F.col("term").asc()))
            .alias("rk"),
        )
        .withColumn("cum_c", F.sum("c").over(w))
    )
    return (
        cum.filter(F.col("rk").isin(*_COV_KS))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("rk").cast("int").alias("vocab_k"),
            F.col("cum_c").cast("bigint").alias("tokens_covered"),
            F.round(F.col("cum_c") / F.col("t"), 4).alias("coverage"),
            F.col("v").alias("vocab_size"),
            F.col("t").alias("tokens_total"),
        )
        .orderBy("vocab_k")
    )


# --- q193: skyline (Pareto-optimal) operator ---------------------------------


def _pareto_skyline_pdf(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """Exact 2D skyline of (quality max, n_chars min) via the sort-based
    sweep: order by quality desc then length asc; a quality-group's
    minimum length survives iff it beats the running minimum of all
    strictly-higher-quality groups; within a group only min-length rows
    survive (equal (q, l) duplicates are mutually non-dominating and all
    survive). O(n log n), no pairwise comparisons."""
    import numpy as np
    import pandas as pd  # noqa: F401

    if not len(pdf):
        return pdf
    s = pdf.sort_values(["q", "l", "doc_id"], ascending=[False, True, True])
    keep_rows = []
    thresh = np.inf
    for _, grp in s.groupby("q", sort=False):
        gl = grp["l"].iloc[0]
        if gl < thresh:
            keep_rows.append(grp[grp["l"] == gl])
            thresh = gl
    return pd.concat(keep_rows) if keep_rows else s.iloc[0:0]


@register(
    "q193_quality_skyline",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, n_chars,
             LEAST(n_tokens / 100.0, 1.0) * 0.5
             + LEAST(stop_hits / CAST(n_tokens AS DOUBLE) * 5.0, 1.0) * 0.5
               AS q
      FROM (
        SELECT doc_id, n_chars,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
               len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                               t -> list_contains({list(STOPWORDS)!r}::VARCHAR[], t)))
                 AS stop_hits
        FROM documents
      )
    )
    SELECT a.doc_id, round(a.q, 4) AS quality, a.n_chars
    FROM f a
    WHERE NOT EXISTS (
      SELECT 1 FROM f b
      WHERE b.q >= a.q AND b.n_chars <= a.n_chars
        AND (b.q > a.q OR b.n_chars < a.n_chars)
    )
    ORDER BY a.doc_id
    """,
)
def q193_quality_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-optimal set) over (quality maximize, length
    minimize): the documents no other document beats on both axes — the
    classic OLAP skyline operator, used here as the "best value per
    token" shortlist a budget-constrained curation pass starts from
    (every non-skyline doc has a strictly better-or-equal alternative).

    Distributed via the canonical two-phase algorithm: each partition
    computes its LOCAL skyline with the O(n log n) sort-sweep (a global
    non-dominated point is non-dominated in its own partition, so local
    skylines are a superset), and one final pass merges the survivors —
    the single-task input is the union of local skylines, typically
    orders of magnitude smaller than the corpus (worst case, fully
    anti-correlated axes, it IS the skyline — which any algorithm must
    materialize anyway). The oracle uses the quadratic NOT EXISTS
    dominance definition, so the sweep is checked against the
    definition, not against itself.

    Determinism: dominance is exact arithmetic on exact inputs; equal
    (quality, length) pairs are mutually non-dominating and all
    survive."""
    import pandas as pd  # noqa: F401

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(toks)
    stop_ratio = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / n_tokens.cast(
        "double"
    )
    q = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.5
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.5
    )
    f = docs.select("doc_id", "n_chars", q.alias("q"))
    schema = "doc_id bigint, n_chars bigint, q double"

    def local(it):
        for pdf in it:
            yield _pareto_skyline_pdf(pdf.rename(columns={"n_chars": "l"})).rename(
                columns={"l": "n_chars"}
            )

    survivors = f.mapInPandas(local, schema)
    final = survivors.groupBy(F.lit(1).alias("g")).applyInPandas(
        lambda _k, pdf: _pareto_skyline_pdf(
            pdf.rename(columns={"n_chars": "l"})
        ).rename(columns={"l": "n_chars"}),
        schema,
    )
    return final.select(
        "doc_id", F.round("q", 4).alias("quality"), "n_chars"
    ).orderBy("doc_id")


# --- q196: chi-square categorical drift --------------------------------------

# chi2 inverse CDF at alpha=0.01 by dof — a fixed lookup shared verbatim by
# both engines (no closed form in SQL); extend if a corpus ever has >13 types
_CHI2_CRIT_99 = {
    1: 6.6349, 2: 9.2103, 3: 11.3449, 4: 13.2767, 5: 15.0863, 6: 16.8119,
    7: 18.4753, 8: 20.0902, 9: 21.666, 10: 23.2093, 11: 24.725, 12: 26.217,
}
_CHI2_CASE_SQL = "CAST(CASE dof " + " ".join(
    f"WHEN {d} THEN {c}" for d, c in _CHI2_CRIT_99.items()
) + " END AS DOUBLE)"

# Beyond the exact table the critical value comes from the Wilson-Hilferty
# cube approximation (chi2_p(k) ~= k * (1 - 2/9k + z_p * sqrt(2/9k))^3,
# within ~0.1% of exact at k > 12), so a monitor wired to `drifted` keeps
# alarming when event-type cardinality outgrows the lookup instead of
# silently emitting NULL — the ADVICE r6 failure mode. Both engines share
# the identical formula text; the result is rounded to 4 decimals so the
# double agrees across engines.
_CHI2_Z99 = 2.3263478740408408  # Phi^-1(0.99)
_CHI2_WH_SQL = (
    "round(dof * power(1.0 - 2.0/(9.0*dof) + "
    f"{_CHI2_Z99} * sqrt(2.0/(9.0*dof)), 3.0), 4)"
)
_CHI2_CRIT_SQL = f"COALESCE({_CHI2_CASE_SQL}, {_CHI2_WH_SQL})"


def chi2_crit_99_col(dof):
    """alpha=0.01 chi-square critical value as a Column: the exact shared
    lookup for dof <= 12, the Wilson-Hilferty approximation (rounded to 4
    decimals) beyond — never NULL for dof >= 1."""
    table = F.element_at(
        F.create_map(*[F.lit(x) for kv in _CHI2_CRIT_99.items() for x in kv]),
        dof.cast("int"),
    )
    d = dof.cast("double")
    wh = F.round(
        d
        * F.pow(
            F.lit(1.0) - F.lit(2.0) / (d * 9.0)
            + F.lit(_CHI2_Z99) * F.sqrt(F.lit(2.0) / (d * 9.0)),
            F.lit(3.0),
        ),
        4,
    )
    return F.coalesce(table, wh)


@register(
    "q196_chi2_type_drift",
    oracle=f"""
    WITH b AS (
      SELECT (min(epoch_ms(ts)) + max(epoch_ms(ts))) // 2 AS thr FROM events
    ),
    halves AS (
      SELECT event_type,
             CAST(sum(CASE WHEN epoch_ms(ts) > thr THEN 0 ELSE 1 END) AS BIGINT) AS n_early,
             CAST(sum(CASE WHEN epoch_ms(ts) > thr THEN 1 ELSE 0 END) AS BIGINT) AS n_late
      FROM events, b GROUP BY event_type
    ),
    tot AS (
      SELECT CAST(sum(n_early) AS BIGINT) AS tot_e,
             CAST(sum(n_late) AS BIGINT) AS tot_l,
             CAST(count(*) AS BIGINT) AS n_types
      FROM halves
    ),
    terms AS (
      SELECT event_type, n_early, n_late,
             (n_early + n_late) * tot_e / CAST(tot_e + tot_l AS DOUBLE) AS exp_early,
             (n_early + n_late) * tot_l / CAST(tot_e + tot_l AS DOUBLE) AS exp_late,
             n_types
      FROM halves, tot
    ),
    scored AS (
      SELECT event_type, n_early, n_late,
             round(exp_early, 4) AS exp_early, round(exp_late, 4) AS exp_late,
             (CASE WHEN exp_early > 0 THEN (n_early - exp_early) * (n_early - exp_early) / exp_early ELSE 0 END
              + CASE WHEN exp_late > 0 THEN (n_late - exp_late) * (n_late - exp_late) / exp_late ELSE 0 END)
               AS term,
             n_types
      FROM terms
    )
    SELECT event_type, n_early, n_late, exp_early, exp_late,
           round(term, 4) AS chi2_term,
           round(sum(term) OVER (), 4) AS chi2_total,
           CAST(n_types - 1 AS BIGINT) AS dof,
           chi2_crit_99,
           sum(term) OVER () > chi2_crit_99 AS drifted
    FROM (SELECT *, n_types - 1 AS dof FROM scored),
         LATERAL (SELECT {_CHI2_CRIT_SQL} AS chi2_crit_99)
    ORDER BY event_type
    """,
)
def q196_chi2_type_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of event-TYPE composition between the time halves of
    the stream — the categorical member of the drift family (KS q147 asks
    about numeric values, PSI q180 about their decile shares, Welch q174
    about means; none of them sees a new route mix). The timeline splits at
    the midpoint between min and max epoch-ms; expected counts come from
    the standard independence model (row total x column share); per-type
    terms localize WHICH type moved and the total tests at alpha=0.01
    against the shared dof lookup (exact table to dof 12, Wilson-Hilferty
    beyond — the verdict never goes NULL as type cardinality grows; both
    engines share the formula text verbatim).

    Scale posture: one corpus aggregation keyed by event_type (map-side
    combined after a 1-row min/max bounds pass rides in); everything after
    runs over |types| rows in a single partition — bounded by the type
    dimension, not the corpus."""
    events = load_table(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts"))
    bounds = events.agg(
        ((F.min(ms) + F.max(ms)) / F.lit(2)).cast("bigint").alias("thr")
    )
    late = (ms > F.col("thr")).cast("int")
    halves = (
        events.crossJoin(bounds)
        .groupBy("event_type")
        .agg(
            F.sum(1 - late).cast("bigint").alias("n_early"),
            F.sum(late).cast("bigint").alias("n_late"),
        )
    )
    from pyspark.sql.window import Window

    wall = Window.partitionBy()  # |types| rows — bounded
    tot_e = F.sum("n_early").over(wall)
    tot_l = F.sum("n_late").over(wall)
    n_types = F.count(F.lit(1)).over(wall)
    row_tot = F.col("n_early") + F.col("n_late")
    exp_e = row_tot * tot_e / (tot_e + tot_l).cast("double")
    exp_l = row_tot * tot_l / (tot_e + tot_l).cast("double")
    term = F.when(exp_e > 0, (F.col("n_early") - exp_e) ** 2 / exp_e).otherwise(
        F.lit(0.0)
    ) + F.when(exp_l > 0, (F.col("n_late") - exp_l) ** 2 / exp_l).otherwise(F.lit(0.0))
    scored = halves.select(
        "event_type",
        "n_early",
        "n_late",
        F.round(exp_e, 4).alias("exp_early"),
        F.round(exp_l, 4).alias("exp_late"),
        term.alias("term"),
        (n_types - 1).cast("bigint").alias("dof"),
    )
    crit = chi2_crit_99_col(F.col("dof"))
    w2 = Window.partitionBy()
    return (
        scored.select(
            "event_type",
            "n_early",
            "n_late",
            "exp_early",
            "exp_late",
            F.round("term", 4).alias("chi2_term"),
            F.round(F.sum("term").over(w2), 4).alias("chi2_total"),
            "dof",
            crit.alias("chi2_crit_99"),
            (F.sum("term").over(w2) > crit).alias("drifted"),
        )
        .orderBy("event_type")
    )


# --- q201: token-frequency Gini concentration ---------------------------------


@register(
    "q201_token_gini",
    oracle="""
    WITH u AS (
      SELECT source, token, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
            FROM documents)
      GROUP BY source, token
    ),
    r AS (
      SELECT source, c,
             row_number() OVER (PARTITION BY source ORDER BY c ASC, token ASC) AS i
      FROM u
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(c) AS BIGINT) AS total_tokens,
           round(2.0 * sum(i * c) / (count(*) * sum(c))
                 - (count(*) + 1.0) / count(*), 6) AS gini
    FROM r GROUP BY source ORDER BY source
    """,
)
def q201_token_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the token-frequency distribution per source —
    the concentration gauge beside q141's Zipf slope (a fitted exponent)
    and q181's hapax share (the tail's edge): Gini reads the WHOLE Lorenz
    curve, so template spam (few types carrying most mass) scores near 1
    even when the Zipf fit looks ordinary. Uses the rank formula
    G = 2*sum(i*c_i)/(k*sum(c)) - (k+1)/k over counts sorted ascending;
    ties in c are order-invariant for the sum, so the token tiebreak only
    pins both engines to one plan, not the value.

    Scale posture: one (source, token) count pass (map-side combined);
    the rank window partitions by source over VOCABULARY rows — Heaps-
    sublinear in corpus size, the same bound q114's vocab map records."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        docs.select(
            "source", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
        )
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    w = Window.partitionBy("source").orderBy(F.col("c").asc(), F.col("token").asc())
    r = u.select("source", "c", F.row_number().over(w).alias("i"))
    k = F.count(F.lit(1))
    return (
        r.groupBy("source")
        .agg(
            k.cast("bigint").alias("n_types"),
            F.sum("c").cast("bigint").alias("total_tokens"),
            F.round(
                2.0 * F.sum(F.col("i") * F.col("c")) / (k * F.sum("c"))
                - (k + 1.0) / k,
                6,
            ).alias("gini"),
        )
        .orderBy("source")
    )


# --- q205: per-source dataset card --------------------------------------------


@register(
    "q205_source_dataset_card",
    oracle=f"""
    WITH feat AS (
      SELECT source, lang, md5(text) AS fp,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
             len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                             t -> list_contains({list(STOPWORDS)!r}::VARCHAR[], t))) AS stop_hits
      FROM documents
    ),
    fpc AS (SELECT fp, count(*) AS k FROM feat GROUP BY fp),
    scored AS (
      SELECT source, lang, n_tokens,
             LEAST(n_tokens / 100.0, 1.0) * 0.5
             + LEAST(stop_hits / CAST(n_tokens AS DOUBLE) * 5.0, 1.0) * 0.5 AS quality,
             CASE WHEN k > 1 THEN 1 ELSE 0 END AS is_dup
      FROM feat JOIN fpc USING (fp)
    ),
    langs AS (
      SELECT source, lang, count(*) AS c,
             row_number() OVER (PARTITION BY source ORDER BY count(*) DESC, lang ASC) AS rn,
             sum(count(*)) OVER (PARTITION BY source) AS tot
      FROM scored GROUP BY source, lang
    )
    SELECT s.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(avg(n_tokens), 2) AS mean_tokens,
           round(avg(quality), 4) AS mean_quality,
           round(sum(is_dup) / CAST(count(*) AS DOUBLE), 4) AS exact_dup_rate,
           any_value(l.lang) AS top_lang,
           round(any_value(l.c) / CAST(any_value(l.tot) AS DOUBLE), 4) AS top_lang_share
    FROM scored s JOIN (SELECT * FROM langs WHERE rn = 1) l USING (source)
    GROUP BY s.source
    ORDER BY s.source
    """,
)
def q205_source_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source dataset card: the one-stop rollup a mixture owner
    reads before granting a source sampling budget — volume (docs,
    tokens), quality (q62's score averaged), redundancy (share of docs
    whose exact fingerprint repeats corpus-wide), and language composition
    (dominant lang and its share). Each column exists as a standalone
    audit (q62/q64/q65/q77); this composes them at the grain decisions
    are made at.

    Scale posture: one map-side feature pass (tokens, stopword hits, md5);
    the duplicate flag joins a digest-keyed count table (32-char shuffle
    keys); language ranking and the final rollup run per (source, lang) —
    bounded dimensions."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    feat = docs.select(
        "source",
        "lang",
        F.md5("text").alias("fp"),
        n_tokens.alias("n_tokens"),
        stop_hits.alias("stop_hits"),
    )
    fpc = feat.groupBy("fp").agg(F.count(F.lit(1)).alias("k"))
    quality = (
        F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.5
        + F.least(F.col("stop_hits") / F.col("n_tokens").cast("double") * 5.0, F.lit(1.0))
        * 0.5
    )
    scored = feat.join(fpc, "fp").select(
        "source",
        "lang",
        "n_tokens",
        quality.alias("quality"),
        F.when(F.col("k") > 1, 1).otherwise(0).alias("is_dup"),
    )
    lw = Window.partitionBy("source").orderBy(F.col("c").desc(), F.col("lang").asc())
    lt = Window.partitionBy("source")
    langs = (
        scored.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "source",
            "lang",
            "c",
            F.row_number().over(lw).alias("rn"),
            F.sum("c").over(lt).alias("tot"),
        )
        .filter(F.col("rn") == 1)
    )
    per = scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 2).alias("mean_tokens"),
        F.round(F.avg("quality"), 4).alias("mean_quality"),
        F.round(F.sum("is_dup") / F.count(F.lit(1)).cast("double"), 4).alias(
            "exact_dup_rate"
        ),
    )
    return (
        per.join(langs, "source")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "mean_tokens",
            "mean_quality",
            "exact_dup_rate",
            F.col("lang").alias("top_lang"),
            F.round(F.col("c") / F.col("tot").cast("double"), 4).alias("top_lang_share"),
        )
        .orderBy("source")
    )


# --- q209: Count-Min sketch frequency audit -----------------------------------

_CMS_TOPK = 20


@register(
    "q209_countmin_audit",
    oracle=f"""
    WITH cnt AS (
      SELECT token, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
            FROM documents)
      GROUP BY token
    ),
    rows_ AS (SELECT unnest(range(0, 4)) AS cms_row),
    cms AS (
      SELECT cms_row,
             CAST(concat('0x', substr(md5(concat(cms_row, '|', token)), 1, 8)) AS BIGINT)
               % 1024 AS pos,
             CAST(sum(c) AS BIGINT) AS total
      FROM cnt, rows_
      GROUP BY 1, 2
    ),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS stream_n FROM cnt),
    top AS (SELECT token, c FROM cnt ORDER BY c DESC, token ASC LIMIT {_CMS_TOPK}),
    probe AS (
      SELECT p.token, p.c, min(cms.total) AS est
      FROM (SELECT t.token, t.c, r.cms_row,
                   CAST(concat('0x', substr(md5(concat(r.cms_row, '|', t.token)), 1, 8)) AS BIGINT)
                     % 1024 AS pos
            FROM top t, rows_ r) p
      JOIN cms USING (cms_row, pos)
      GROUP BY p.token, p.c
    )
    SELECT token, c AS exact_count, CAST(est AS BIGINT) AS cms_estimate,
           est >= c AS no_underestimate,
           (est - c) <= CAST(ceil(2.718281828459045 * stream_n / 1024.0) AS BIGINT)
             AS within_eps_bound
    FROM probe, n
    ORDER BY exact_count DESC, token ASC
    """,
)
def q209_countmin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency audit — the frequency member of the
    sketch family (HLL distinct q36/q192, Misra-Gries heavy hitters q163,
    Bloom membership q184/q190, GK percentiles q134): build the 4x1024
    sketch as a relation from the vocabulary count table, probe the top
    {_CMS_TOPK} exact tokens, and report estimate beside exact with the two
    contract flags — no_underestimate (guaranteed: every counter a key
    touches holds its full count plus collisions) and the e*N/w error
    bound (probabilistic, ~certain at depth 4). md5-derived positions make
    the DuckDB oracle replay the sketch bit for bit.

    Scale posture: the depth-x expansion happens AFTER the per-token
    aggregation (vocabulary rows, Heaps-sublinear — the cms_build
    discipline), so the sketch build shuffles |V| x 4 short rows; the
    sketch itself is 4096 counters — mergeable model state (union two
    sketch relations and re-sum to merge slices, q192's contract)."""
    from ..operators.sketch import CMS_WIDTH, cms_build, cms_estimate

    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    cms = cms_build(cnt, "token", "c")
    top = cnt.orderBy(F.col("c").desc(), F.col("token").asc()).limit(_CMS_TOPK)
    est = cms_estimate(cms, top.select("token"), "token")
    n = cnt.agg(F.sum("c").cast("bigint").alias("stream_n"))
    import math

    bound = F.ceil(math.e * F.col("stream_n") / float(CMS_WIDTH)).cast("bigint")
    return (
        top.join(est, "token")
        .crossJoin(n)
        .select(
            "token",
            F.col("c").alias("exact_count"),
            F.col("cms_estimate").cast("bigint").alias("cms_estimate"),
            (F.col("cms_estimate") >= F.col("c")).alias("no_underestimate"),
            ((F.col("cms_estimate") - F.col("c")) <= bound).alias("within_eps_bound"),
        )
        .orderBy(F.col("exact_count").desc(), F.col("token").asc())
    )


# --- q210: filter-cascade attrition ------------------------------------------

# Staged pre-training filter cascade (the FineWeb/C4 shape: cheap structural
# filters first, ordered so each stage sees only prior survivors). Constants
# chosen against the synthetic corpus so every stage has real attrition.
_CASCADE_MIN_TOKENS = 20
_CASCADE_MAX_TOKENS = 90
_CASCADE_STOP_FLOOR = 0.03
_CASCADE_DISTINCT_FLOOR = 0.4
_CASCADE_STAGES = (
    "min_tokens",
    "max_tokens",
    "stopword_floor",
    "distinct_floor",
)


@register(
    "q210_filter_cascade_attrition",
    oracle=f"""
    WITH f AS (
      SELECT len(tok) AS n,
             len(list_filter(tok, x -> list_contains({list(STOPWORDS)!r}::VARCHAR[], x)))
               / CAST(len(tok) AS DOUBLE) AS stopr,
             len(list_distinct(tok)) / CAST(len(tok) AS DOUBLE) AS distr
      FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS tok FROM documents)
    ),
    flags AS (
      SELECT n,
             (n >= {_CASCADE_MIN_TOKENS}) AS c1,
             (n >= {_CASCADE_MIN_TOKENS} AND n <= {_CASCADE_MAX_TOKENS}) AS c2,
             (n >= {_CASCADE_MIN_TOKENS} AND n <= {_CASCADE_MAX_TOKENS}
              AND stopr >= {_CASCADE_STOP_FLOOR}) AS c3,
             (n >= {_CASCADE_MIN_TOKENS} AND n <= {_CASCADE_MAX_TOKENS}
              AND stopr >= {_CASCADE_STOP_FLOOR}
              AND distr >= {_CASCADE_DISTINCT_FLOOR}) AS c4
      FROM f
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN c2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN c3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
             CAST(sum(CASE WHEN c4 THEN 1 ELSE 0 END) AS BIGINT) AS n4,
             CAST(sum(CASE WHEN c1 THEN n ELSE 0 END) AS BIGINT) AS t1,
             CAST(sum(CASE WHEN c2 THEN n ELSE 0 END) AS BIGINT) AS t2,
             CAST(sum(CASE WHEN c3 THEN n ELSE 0 END) AS BIGINT) AS t3,
             CAST(sum(CASE WHEN c4 THEN n ELSE 0 END) AS BIGINT) AS t4
      FROM flags
    )
    SELECT * FROM (
      SELECT CAST(1 AS INT) AS stage, 'min_tokens' AS stage_name,
             n0 AS n_in, n1 AS n_pass, n0 - n1 AS n_fail,
             round(n1 / CAST(nullif(n0, 0) AS DOUBLE), 4) AS pass_rate,
             t1 AS tokens_retained
      FROM agg
      UNION ALL
      SELECT 2, 'max_tokens', n1, n2, n1 - n2,
             round(n2 / CAST(nullif(n1, 0) AS DOUBLE), 4), t2 FROM agg
      UNION ALL
      SELECT 3, 'stopword_floor', n2, n3, n2 - n3,
             round(n3 / CAST(nullif(n2, 0) AS DOUBLE), 4), t3 FROM agg
      UNION ALL
      SELECT 4, 'distinct_floor', n3, n4, n3 - n4,
             round(n4 / CAST(nullif(n3, 0) AS DOUBLE), 4), t4 FROM agg
    ) ORDER BY stage
    """,
)
def q210_filter_cascade_attrition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged filter-cascade attrition census — the funnel report every
    web-scale cleaning pipeline (C4, FineWeb) publishes: four structural
    filters applied in sequence (token floor, token ceiling, stopword-
    ratio floor ~ language-ness, distinct-token floor ~ repetition), each
    stage reporting survivors-in, pass/fail counts, pass rate, and the
    token mass retained by the cumulative cascade. The report is what a
    pipeline owner reads to spot the stage that suddenly started eating
    the corpus after an upstream change.

    Determinism: every flag derives from exact integer token counts and
    exact integer-ratio doubles — identical comparisons in both engines;
    outputs are counts and 4-decimal rounded rates.

    Scale posture: ONE map-side pass computes all four cumulative flags
    per document (no per-stage rescan), a single partial-aggregated fold
    reduces them to one row of counters, and the 4-row stage report is an
    explode of that row — no shuffle wider than the 1-row aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(toks)
    stopr = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / n.cast("double")
    distr = F.size(F.array_distinct(toks)) / n.cast("double")
    c1 = n >= _CASCADE_MIN_TOKENS
    c2 = c1 & (n <= _CASCADE_MAX_TOKENS)
    c3 = c2 & (stopr >= _CASCADE_STOP_FLOOR)
    c4 = c3 & (distr >= _CASCADE_DISTINCT_FLOOR)
    flags = docs.select(
        n.alias("n"),
        c1.alias("c1"),
        c2.alias("c2"),
        c3.alias("c3"),
        c4.alias("c4"),
    )
    agg = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n0"),
        *[
            F.sum(F.col(f"c{i}").cast("int")).cast("bigint").alias(f"n{i}")
            for i in (1, 2, 3, 4)
        ],
        *[
            F.sum(F.when(F.col(f"c{i}"), F.col("n")).otherwise(0))
            .cast("bigint")
            .alias(f"t{i}")
            for i in (1, 2, 3, 4)
        ],
    )
    stage_rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("stage"),
                F.lit(name).alias("stage_name"),
                F.col(f"n{i}").alias("n_in"),
                F.col(f"n{i + 1}").alias("n_pass"),
                (F.col(f"n{i}") - F.col(f"n{i + 1}")).alias("n_fail"),
                F.round(
                    F.col(f"n{i + 1}")
                    / F.nullif(F.col(f"n{i}"), F.lit(0)).cast("double"),
                    4,
                ).alias("pass_rate"),
                F.col(f"t{i + 1}").alias("tokens_retained"),
            )
            for i, name in enumerate(_CASCADE_STAGES)
        ]
    )
    return (
        agg.select(F.explode(stage_rows).alias("s"))
        .select("s.*")
        .orderBy("stage")
    )


# --- q216: sampled dedup-rate estimator --------------------------------------

# Fingerprint-stratified sample: keep documents whose md5(text) starts with
# one of these hex digits (rate 4/16 = 1/4). Sampling BY FINGERPRINT keeps
# every exact-duplicate group intact or absent as a unit — the property that
# makes the within-sample duplicate share an unbiased estimate of the
# corpus-wide one (a doc_id-keyed sample would split groups and bias low).
_DEDUP_SAMPLE_PREFIXES = ("0", "1", "2", "3")


@register(
    "q216_sampled_dedup_estimate",
    oracle=f"""
    WITH d AS (SELECT md5(text) AS fp FROM documents),
    cw AS (SELECT fp, count(*) AS k FROM d GROUP BY fp),
    full_ AS (
      SELECT CAST(sum(k) AS BIGINT) AS n_docs,
             sum(CASE WHEN k > 1 THEN k ELSE 0 END)
               / CAST(sum(k) AS DOUBLE) AS exact_share
      FROM cw
    ),
    samp AS (
      SELECT CAST(COALESCE(sum(k), 0) AS BIGINT) AS n_sampled,
             sum(CASE WHEN k > 1 THEN k ELSE 0 END)
               / CAST(nullif(sum(k), 0) AS DOUBLE) AS est_share
      FROM cw WHERE substr(fp, 1, 1) IN {_DEDUP_SAMPLE_PREFIXES!r}
    )
    SELECT n_docs, n_sampled,
           round(n_sampled / CAST(n_docs AS DOUBLE), 4) AS sample_rate,
           round(est_share, 4) AS est_dup_share,
           round(exact_share, 4) AS exact_dup_share,
           round(abs(est_share - exact_share), 4) AS abs_error
    FROM full_, samp
    """,
)
def q216_sampled_dedup_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate rate from a 1/4 fingerprint-stratified sample,
    reported BESIDE the exact corpus-wide rate (the q36/q192/q209
    estimate-beside-exact discipline). Sampling on the md5 prefix keeps
    each duplicate group wholly in or wholly out — identical texts share a
    fingerprint — so the within-sample duplicate-instance share estimates
    the corpus share without the group-splitting bias a row sample would
    have. At 100 TB the sampled pass is the cheap daily monitor (reads
    1/4 of the digests, no corpus-wide group-by of the rest) and the
    exact pass the weekly calibration; here both run so the error column
    keeps the estimator honest.

    Scale posture: one md5 projection feeds both sides; the group-by keys
    are 32-char digests; both reports are 1-row folds joined by a
    broadcast scalar attach."""
    docs = load_table(spark, sf_dir, "documents")
    cw = (
        docs.select(F.md5("text").alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    dup_mass = F.sum(F.when(F.col("k") > 1, F.col("k")).otherwise(0))
    full = cw.agg(
        F.sum("k").cast("bigint").alias("n_docs"),
        (dup_mass / F.sum("k").cast("double")).alias("exact_share"),
    )
    samp = cw.filter(
        F.substring("fp", 1, 1).isin(*_DEDUP_SAMPLE_PREFIXES)
    ).agg(
        F.coalesce(F.sum("k"), F.lit(0)).cast("bigint").alias("n_sampled"),
        (dup_mass / F.nullif(F.sum("k"), F.lit(0)).cast("double")).alias(
            "est_share"
        ),
    )
    return full.crossJoin(F.broadcast(samp)).select(
        "n_docs",
        "n_sampled",
        F.round(F.col("n_sampled") / F.col("n_docs").cast("double"), 4).alias(
            "sample_rate"
        ),
        F.round("est_share", 4).alias("est_dup_share"),
        F.round("exact_share", 4).alias("exact_dup_share"),
        F.round(F.abs(F.col("est_share") - F.col("exact_share")), 4).alias(
            "abs_error"
        ),
    )


# --- q218: small-group suppression census ------------------------------------

# k-anonymity floor for release grouping: a (source, lang) cell with fewer
# documents than this is individually identifying at release granularity.
_K_ANON = 5


@register(
    "q218_small_group_census",
    oracle=f"""
    WITH g AS (
      SELECT source, lang, count(*) AS n
      FROM documents GROUP BY source, lang
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN n < {_K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_small_groups,
           CAST(sum(CASE WHEN n < {_K_ANON} THEN n ELSE 0 END) AS BIGINT)
             AS suppressed_docs,
           round(sum(CASE WHEN n < {_K_ANON} THEN n ELSE 0 END)
                 / CAST(sum(n) AS DOUBLE), 4) AS suppressed_share,
           CAST(min(n) AS BIGINT) AS min_group_size
    FROM g GROUP BY source ORDER BY source
    """,
)
def q218_small_group_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity census at release granularity (the aggregate-side
    privacy audit beside q160's content-side PII scrub): per source, how
    many (source, lang) cells fall under the k={_K_ANON} floor, the
    document mass a suppress-small-cells release policy would withhold,
    and the smallest cell — the table a data-release reviewer signs off
    on before publishing per-cell statistics or samples.

    Scale posture: one grouped count (map-side combined), then a
    |source x lang|-bounded rollup — nothing after the first aggregation
    exceeds the bounded release-cell dimension."""
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    small = F.col("n") < _K_ANON
    return (
        g.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum(small.cast("int")).cast("bigint").alias("n_small_groups"),
            F.sum(F.when(small, F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("suppressed_docs"),
            F.round(
                F.sum(F.when(small, F.col("n")).otherwise(0))
                / F.sum("n").cast("double"),
                4,
            ).alias("suppressed_share"),
            F.min("n").cast("bigint").alias("min_group_size"),
        )
        .orderBy("source")
    )


# --- q228: filter-rule interaction census ------------------------------------


@register(
    "q228_filter_interaction_census",
    oracle=f"""
    WITH f AS (
      SELECT len(tok) AS n,
             len(list_filter(tok, x -> list_contains({list(STOPWORDS)!r}::VARCHAR[], x)))
               / CAST(len(tok) AS DOUBLE) AS stopr,
             len(list_distinct(tok)) / CAST(len(tok) AS DOUBLE) AS distr
      FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS tok FROM documents)
    ),
    sig AS (
      SELECT n,
             CASE WHEN n < {_CASCADE_MIN_TOKENS} THEN 1 ELSE 0 END AS f_short,
             CASE WHEN n > {_CASCADE_MAX_TOKENS} THEN 1 ELSE 0 END AS f_long,
             CASE WHEN stopr < {_CASCADE_STOP_FLOOR} THEN 1 ELSE 0 END
               AS f_lowstop,
             CASE WHEN distr < {_CASCADE_DISTINCT_FLOOR} THEN 1 ELSE 0 END
               AS f_lowdistinct
      FROM f
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM sig)
    SELECT f_short * 8 + f_long * 4 + f_lowstop * 2 + f_lowdistinct
             AS signature,
           f_short, f_long, f_lowstop, f_lowdistinct,
           f_short + f_long + f_lowstop + f_lowdistinct AS n_rules_failed,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n) AS BIGINT) AS sum_tokens,
           round(count(*) / CAST(n_total AS DOUBLE), 6) AS doc_share
    FROM sig, tot
    GROUP BY f_short, f_long, f_lowstop, f_lowdistinct, n_total
    ORDER BY signature
    """,
)
def q228_filter_interaction_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-rule INTERACTION census: apply q210's four structural
    cleaning rules independently (not cumulatively) and group the corpus
    by its 4-bit failure signature — which rule combinations co-fire, and
    on how much of the corpus. q210's sequential funnel can't distinguish
    "rule 3 would have caught everything rule 4 catches" from "rules 3
    and 4 fire on disjoint docs"; the signature grid does, and is exactly
    the evidence for dropping a redundant rule (its failure mass is
    entirely inside another rule's signatures) or re-ordering the cascade
    (put the rule with the largest SOLO-failure mass first so the
    expensive later stages see fewer docs).

    Scale posture: flags are one map-side pass of per-doc array
    arithmetic riding the scan; the census is a single HashAggregate
    onto the <= 16-row signature frame (the 2^4 codomain), with the
    corpus total a WINDOW sum over that bounded frame (a re-aggregated
    branch would scan the corpus twice — allowlisted bound). Determinism:
    flags derive from exact integer counts and integer-ratio doubles —
    identical comparisons in both engines; shares rounded at 1e-6.
    Reference: no filtering surface — §7 Phase-3 extension beside q210
    (sequential funnel) and q62 (the score these rules gate)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(toks)
    stopr = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / n.cast("double")
    distr = F.size(F.array_distinct(toks)) / n.cast("double")
    sig = docs.select(
        n.alias("n"),
        (n < _CASCADE_MIN_TOKENS).cast("int").alias("f_short"),
        (n > _CASCADE_MAX_TOKENS).cast("int").alias("f_long"),
        (stopr < _CASCADE_STOP_FLOOR).cast("int").alias("f_lowstop"),
        (distr < _CASCADE_DISTINCT_FLOOR).cast("int").alias("f_lowdistinct"),
    )
    cells = sig.groupBy("f_short", "f_long", "f_lowstop", "f_lowdistinct").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n").cast("bigint").alias("sum_tokens"),
    )
    w_all = Window.partitionBy()  # <= 16-row signature frame: allowlisted
    return (
        cells.withColumn("n_total", F.sum("n_docs").over(w_all))
        .select(
            (
                F.col("f_short") * 8
                + F.col("f_long") * 4
                + F.col("f_lowstop") * 2
                + F.col("f_lowdistinct")
            ).alias("signature"),
            "f_short",
            "f_long",
            "f_lowstop",
            "f_lowdistinct",
            (
                F.col("f_short")
                + F.col("f_long")
                + F.col("f_lowstop")
                + F.col("f_lowdistinct")
            ).alias("n_rules_failed"),
            "n_docs",
            "sum_tokens",
            F.round(
                F.col("n_docs").cast("double") / F.col("n_total"), 6
            ).alias("doc_share"),
        )
        .orderBy("signature")
    )


# --- q231: positional phrase search -------------------------------------------

_PHRASE = ("fast", "scan")
_PHRASE_TOPK = 20


@register(
    "q231_phrase_search",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(t) AS term,
             CAST(generate_subscripts(t, 1) AS BIGINT) AS pos
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
            FROM documents)
    ),
    a AS (SELECT doc_id, pos FROM tok WHERE term = '{_PHRASE[0]}'),
    b AS (SELECT doc_id, pos FROM tok WHERE term = '{_PHRASE[1]}'),
    hits AS (
      SELECT a.doc_id,
             CAST(count(*) AS BIGINT) AS n_matches,
             CAST(min(a.pos) AS BIGINT) AS first_pos
      FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      GROUP BY a.doc_id
    )
    SELECT doc_id, n_matches, first_pos
    FROM hits
    ORDER BY n_matches DESC, doc_id
    LIMIT {_PHRASE_TOPK}
    """,
)
def q231_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact PHRASE query over a positional inverted index: find documents
    containing the adjacent token sequence '{" ".join(_PHRASE)}' by
    intersecting the two terms' positional postings where pos_b =
    pos_a + 1 — the search-engine primitive q108's BM25 (bag-of-words
    ranked OR) cannot express, and the exact-match complement to q142's
    duplicated-span mining (which finds REPEATED n-grams, not a given
    one). Returns the top-{_PHRASE_TOPK} docs by occurrence count with
    the first match position — the quote-attribution / exact-citation
    lookup a contamination investigation runs after q106 flags a doc.

    Scale posture: postings are FILTERED TO THE QUERY TERMS before
    anything joins — the term predicate prunes at the explode, so the
    join sees per-term posting lists (corpus-frequency-bounded), never
    the full positional index; the adjacency intersection joins on
    doc_id (AQE broadcasts the rarer side while small) and the head is
    TakeOrderedAndProject. At 100 TB with a PERSISTED positional index
    (q217's standing index adds positions the same way), the same plan
    reads only the two terms' buckets. Determinism: positions are
    1-based ordinals of the same whitespace split in both engines;
    counts are bigints; top-k tie-breaks on doc_id. Reference: no search
    surface (§7 Phase-3, beside q108/q200)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias(
            "pos0", "term"
        ),
    ).select("doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "term")
    a = tok.filter(F.col("term") == _PHRASE[0]).select("doc_id", "pos")
    b = tok.filter(F.col("term") == _PHRASE[1]).select(
        "doc_id", (F.col("pos") - 1).alias("pos")
    )
    return (
        a.join(b, ["doc_id", "pos"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_matches"),
            F.min("pos").cast("bigint").alias("first_pos"),
        )
        .orderBy(F.col("n_matches").desc(), "doc_id")
        .limit(_PHRASE_TOPK)
    )


# --- q236: quality-gate language-bias AUC -------------------------------------


@register(
    "q236_quality_auc",
    oracle=f"""
    WITH lab AS (
      SELECT round(LEAST(len(regexp_split_to_array(trim(text), '\\s+')) / 100.0, 1.0) * 0.5
                   + LEAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                 t -> list_contains({list(STOPWORDS)!r}::VARCHAR[], t)))
                           / CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE)
                           * 5.0, 1.0) * 0.5, 4) AS q,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ),
    census AS (
      SELECT q,
             CAST(SUM(pos) AS BIGINT) AS n_pos_at,
             CAST(SUM(1 - pos) AS BIGINT) AS n_neg_at
      FROM lab GROUP BY q
    ),
    ranked AS (
      SELECT q, n_pos_at, n_neg_at,
             COALESCE(SUM(n_pos_at + n_neg_at) OVER
               (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING), 0) AS n_below
      FROM census
    ),
    folded AS (
      SELECT SUM(n_pos_at) AS n_pos, SUM(n_neg_at) AS n_neg,
             SUM(n_pos_at * (n_below + (n_pos_at + n_neg_at + 1) / 2.0))
               AS r_pos
      FROM ranked
    )
    SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
           round(r_pos, 4) AS r_pos,
           round((r_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg), 6)
             AS auc
    FROM folded
    """,
)
def q236_quality_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of the q62 quality score as a separator of English vs
    non-English documents, computed EXACTLY as the Mann-Whitney rank
    statistic with midrank tie handling: AUC = (R_pos - n_pos(n_pos+1)/2)
    / (n_pos * n_neg), where R_pos is the positives' midrank sum. This is
    the language-bias audit run before wiring a quality heuristic into a
    corpus gate: stopword-based scores are English-trained, and an AUC
    far from 0.5 means the gate is a covert language filter — thresholding
    it reshapes the language mix (the documented failure mode of C4-style
    cleaning), so the q76 rebalancing must happen AFTER the gate, sized
    by this number.

    Scale posture: the q144 bounded-codomain rank discipline — scores
    round to 4 decimals (<= 10001 distinct values), so ranking needs NO
    corpus-wide sort: one HashAggregate onto the per-score pos/neg
    census, a running count over that bounded frame (allowlisted), and a
    1-row fold. Score and label come from the same map-side pass — no
    join at all. Determinism: midranks are exact arithmetic on bigint
    counts; the <= 10001-term float fold rounds at 1e-4/1e-6, far above
    residue. Reference: no evaluation surface — §7 Phase-3 extension
    linking q62 (score) and q66/q175 (language surface); Mann-Whitney/
    AUC equivalence per Hanley & McNeil (public)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(toks)
    stop_ratio = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / n_tokens.cast("double")
    q = F.round(
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.5
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.5,
        4,
    )
    lab = docs.select(
        q.alias("q"), (F.col("lang") == "en").cast("int").alias("pos")
    )
    census = lab.groupBy("q").agg(
        F.sum("pos").cast("bigint").alias("n_pos_at"),
        F.sum(1 - F.col("pos")).cast("bigint").alias("n_neg_at"),
    )
    w_below = Window.orderBy("q").rowsBetween(
        Window.unboundedPreceding, -1
    )  # <= 10001 rows: the rounded score codomain (q144 discipline)
    ranked = census.select(
        "n_pos_at",
        "n_neg_at",
        F.coalesce(
            F.sum(F.col("n_pos_at") + F.col("n_neg_at")).over(w_below),
            F.lit(0),
        ).alias("n_below"),
    )
    folded = ranked.agg(
        F.sum("n_pos_at").cast("bigint").alias("n_pos"),
        F.sum("n_neg_at").cast("bigint").alias("n_neg"),
        F.sum(
            F.col("n_pos_at")
            * (
                F.col("n_below")
                + (F.col("n_pos_at") + F.col("n_neg_at") + 1) / 2.0
            )
        ).alias("r_pos"),
    )
    return folded.select(
        "n_pos",
        "n_neg",
        F.round("r_pos", 4).alias("r_pos"),
        F.round(
            (F.col("r_pos") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0)
            / (F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("auc"),
    )


# --- q243: split-conformal interval for a per-source predictor -----------------

_CONF_ALPHA_NUM = 9  # 1 - alpha = 9/10 kept as an integer ratio: k = ceil(0.9(n+1))


@register(
    "q243_conformal_threshold",
    oracle="""
    WITH d AS (
      SELECT source, CAST(n_chars AS DOUBLE) AS y,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8' AS is_cal
      FROM documents
    ),
    pred AS (
      SELECT source, sum(CASE WHEN is_cal THEN y END)
                     / count(CASE WHEN is_cal THEN 1 END) AS y_hat
      FROM d GROUP BY source
    ),
    scored AS (
      SELECT d.is_cal, CAST(ceil(abs(d.y - p.y_hat)) AS BIGINT) AS s
      FROM d JOIN pred p USING (source)
    ),
    caln AS (
      SELECT CAST(count(*) AS BIGINT) AS n_cal FROM scored WHERE is_cal
    ),
    grid AS (
      SELECT s, CAST(count(*) AS BIGINT) AS c
      FROM scored WHERE is_cal GROUP BY s
    ),
    cum AS (
      SELECT s, sum(c) OVER (ORDER BY s) AS cum_c FROM grid
    ),
    qhat AS (
      SELECT min(s) AS q_hat
      FROM cum, caln
      WHERE cum_c >= (9 * (n_cal + 1) + 9) // 10
    ),
    test AS (
      SELECT CAST(count(*) AS BIGINT) AS n_test,
             CAST(sum(CASE WHEN s <= (SELECT q_hat FROM qhat)
                           THEN 1 ELSE 0 END) AS BIGINT) AS covered
      FROM scored WHERE NOT is_cal
    )
    SELECT n_cal,
           (9 * (n_cal + 1) + 9) // 10 AS k_rank,
           (SELECT q_hat FROM qhat) AS q_hat,
           n_test, covered,
           round(CAST(covered AS DOUBLE) / n_test, 4) AS test_coverage
    FROM caln, test
    """,
)
def q243_conformal_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free error bars for a corpus predictor: split-
    conformal calibration of the per-source mean-chars model at alpha =
    0.1 — q_hat is the ceil(0.9 (n+1))-th smallest absolute residual on
    the calibration half (md5 doc split, the q77 discipline), and the
    interval y_hat +/- q_hat then covers >= 90% of fresh documents by the
    exchangeability theorem (Vovk et al.; Lei et al. 2018 — public). The
    audited test-half coverage is reported beside the rank so drift that
    breaks the guarantee shows up as a number, not a belief. This is the
    calibration layer a quality-filter threshold (q169/q236) needs before
    its cutoffs are trusted at 100 TB.

    Determinism: the residual grid is integer-ceiled, so the order
    statistic is a min over exact integer cumulative counts; k uses pure
    integer arithmetic ((9(n+1)+9) div 10) in both engines; the coverage
    ratio is one exact division rounded at 1e-4.

    Scale posture: the predictor is a |sources|-row broadcast; residuals
    are a narrow map stage; the quantile runs on the CEILED-RESIDUAL GRID
    (bounded by the chars codomain, the q144/q236 discipline) — its
    cumulative window orders a grid-sized frame, never the corpus; the
    coverage check is one more map-side aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        F.col("n_chars").cast("double").alias("y"),
        (
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "8"
        ).alias("is_cal"),
    )
    pred = d.groupBy("source").agg(
        (
            F.sum(F.when(F.col("is_cal"), F.col("y")))
            / F.count(F.when(F.col("is_cal"), F.lit(1)))
        ).alias("y_hat")
    )
    scored = d.join(F.broadcast(pred), "source").select(
        "is_cal",
        F.ceil(F.abs(F.col("y") - F.col("y_hat"))).cast("bigint").alias("s"),
    )
    caln = scored.filter("is_cal").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cal")
    )
    grid = (
        scored.filter("is_cal")
        .groupBy("s")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    wg = Window.orderBy("s")  # grid-bounded: ceiled-residual codomain
    cum = grid.select("s", F.sum("c").over(wg).alias("cum_c"))
    k = F.expr("(9 * (n_cal + 1) + 9) div 10")
    qhat = (
        cum.crossJoin(F.broadcast(caln))
        .filter(F.col("cum_c") >= k)
        .agg(F.min("s").alias("q_hat"))
    )
    test = (
        scored.filter(~F.col("is_cal"))
        .crossJoin(F.broadcast(qhat))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(F.when(F.col("s") <= F.col("q_hat"), 1).otherwise(0))
            .cast("bigint")
            .alias("covered"),
            F.first("q_hat").alias("q_hat"),
        )
    )
    return caln.crossJoin(F.broadcast(test)).select(
        "n_cal",
        k.cast("bigint").alias("k_rank"),
        "q_hat",
        "n_test",
        "covered",
        F.round(F.col("covered").cast("double") / F.col("n_test"), 4).alias(
            "test_coverage"
        ),
    )


# --- q245: Wasserstein-1 (earth mover) drift per source ------------------------


@register(
    "q245_wasserstein_drift",
    oracle="""
    WITH d AS (
      SELECT source, CAST(n_chars AS BIGINT) AS v FROM documents
    ),
    sv AS (
      SELECT source, v, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY source, v
    ),
    grid AS (SELECT DISTINCT v FROM d),
    src AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM d GROUP BY source
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    gcum AS (
      SELECT v, CAST(sum(c) OVER (ORDER BY v) AS DOUBLE) AS g_cum
      FROM (SELECT v, sum(c) AS c FROM sv GROUP BY v)
    ),
    frame AS (
      SELECT s.source, g.v,
             CAST(sum(COALESCE(x.c, 0))
                  OVER (PARTITION BY s.source ORDER BY g.v) AS DOUBLE) AS s_cum,
             lead(g.v) OVER (PARTITION BY s.source ORDER BY g.v) AS v_next
      FROM src s CROSS JOIN grid g
      LEFT JOIN sv x ON x.source = s.source AND x.v = g.v
    )
    SELECT f.source, s.n_s AS n_docs,
           round(sum(abs(f.s_cum / s.n_s - gc.g_cum / t.n)
                     * (f.v_next - f.v)), 4) AS w1_chars
    FROM frame f
    JOIN src s ON f.source = s.source
    JOIN gcum gc ON f.v = gc.v
    CROSS JOIN tot t
    WHERE f.v_next IS NOT NULL
    GROUP BY f.source, s.n_s
    ORDER BY f.source
    """,
)
def q245_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earth-mover drift: the Wasserstein-1 distance between each source's
    document-length distribution and the corpus-wide one, computed exactly
    as the integral of |CDF_s - CDF_global| over the observed value grid
    (the 1-D closed form). KS (q147) reports the WORST single gap — it
    saturates and can't distinguish "one spike moved" from "the whole
    distribution shifted 2x"; W1 integrates the gap, so it ranks HOW MUCH
    mass moved HOW FAR, the number a mixture rebalance actually budgets
    against (optimal-transport drift metrics — public: Villani; Ramdas et
    al. 2017 on univariate W1 = CDF L1).

    Determinism: CDFs are exact integer-count ratios on an integer value
    grid; both engines sum the identical |gap| x gap-width terms and round
    at 1e-4 (absorbing summation-order residue, the repo's float-fold
    rule).

    Scale posture: the (source, v) census is one partial-agg shuffle
    bounded by |sources| x |chars codomain|, NOT the corpus; the CDF
    windows partition by source over the value GRID (codomain-bounded,
    the q144/q236/q243 discipline); the |sources| x |grid| frame is a
    crossJoin of two bounded relations. No corpus-sized window, no
    collect."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("source", F.col("n_chars").cast("bigint").alias("v"))
    sv = d.groupBy("source", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    grid = d.select("v").distinct()
    src = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_s")
    )
    tot = d.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    gv = sv.groupBy("v").agg(F.sum("c").alias("c"))
    wg = Window.orderBy("v")  # chars-codomain grid, bounded
    gcum = gv.select("v", F.sum("c").over(wg).cast("double").alias("g_cum"))
    ws = Window.partitionBy("source").orderBy("v")
    frame = (
        src.crossJoin(grid)
        .join(sv, ["source", "v"], "left")
        .select(
            "source",
            "n_s",
            "v",
            F.sum(F.coalesce(F.col("c"), F.lit(0)))
            .over(ws)
            .cast("double")
            .alias("s_cum"),
            F.lead("v").over(ws).alias("v_next"),
        )
    )
    return (
        frame.join(gcum, "v")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("v_next").isNotNull())
        .groupBy("source", "n_s")
        .agg(
            F.round(
                F.sum(
                    F.abs(
                        F.col("s_cum") / F.col("n_s")
                        - F.col("g_cum") / F.col("n")
                    )
                    * (F.col("v_next") - F.col("v"))
                ),
                4,
            ).alias("w1_chars")
        )
        .select(
            "source", F.col("n_s").alias("n_docs"), "w1_chars"
        )
        .orderBy("source")
    )


@register(
    "q285_brier_decomposition",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             round(LEAST(len(regexp_split_to_array(trim(text), '\\s+')) / 100.0, 1.0) * 0.5
                   + LEAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                               t -> list_contains({list(STOPWORDS)!r}::VARCHAR[], t)))
                           / CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE)
                           * 5.0, 1.0) * 0.5, 4) AS p,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS d
      FROM documents
    ),
    outcomes AS (
      SELECT CAST(round(p * 10000, 0) AS BIGINT) AS pi, d
      FROM scored
    ),
    bins AS (
      SELECT LEAST(pi // 1000, 9) AS bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pi) AS BIGINT) AS s,
             CAST(sum(d) AS BIGINT) AS dd
      FROM outcomes GROUP BY 1
    ),
    one AS (
      SELECT list(n ORDER BY bin) AS ln, list(s ORDER BY bin) AS ls,
             list(dd ORDER BY bin) AS ld,
             CAST(sum(n) AS BIGINT) AS nn, CAST(sum(dd) AS BIGINT) AS ddd,
             CAST(count(*) AS BIGINT) AS nb
      FROM bins
    )
    SELECT nn AS n_docs, nb AS n_bins,
           round(CAST(ddd AS DOUBLE) / nn, 6) AS en_rate,
           round(list_sum(list_transform(range(1, nb + 1), i ->
             ln[i] * ((CAST(ls[i] AS DOUBLE) / ln[i] / 10000.0
                       - CAST(ld[i] AS DOUBLE) / ln[i])
                    * (CAST(ls[i] AS DOUBLE) / ln[i] / 10000.0
                       - CAST(ld[i] AS DOUBLE) / ln[i]))))
             / nn, 6) AS reliability,
           round(list_sum(list_transform(range(1, nb + 1), i ->
             ln[i] * ((CAST(ld[i] AS DOUBLE) / ln[i] - CAST(ddd AS DOUBLE) / nn)
                    * (CAST(ld[i] AS DOUBLE) / ln[i] - CAST(ddd AS DOUBLE) / nn))))
             / nn, 6) AS resolution,
           round(CAST(ddd AS DOUBLE) / nn * (1.0 - CAST(ddd AS DOUBLE) / nn), 6)
             AS uncertainty,
           round(list_sum(list_transform(range(1, nb + 1), i ->
             ln[i] * ((CAST(ls[i] AS DOUBLE) / ln[i] / 10000.0
                       - CAST(ld[i] AS DOUBLE) / ln[i])
                    * (CAST(ls[i] AS DOUBLE) / ln[i] / 10000.0
                       - CAST(ld[i] AS DOUBLE) / ln[i]))))
             / nn
           - list_sum(list_transform(range(1, nb + 1), i ->
             ln[i] * ((CAST(ld[i] AS DOUBLE) / ln[i] - CAST(ddd AS DOUBLE) / nn)
                    * (CAST(ld[i] AS DOUBLE) / ln[i] - CAST(ddd AS DOUBLE) / nn))))
             / nn
           + CAST(ddd AS DOUBLE) / nn * (1.0 - CAST(ddd AS DOUBLE) / nn), 6)
             AS brier_score
    FROM one
    """,
)
def q285_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score (Murphy 1973: BS =
    reliability - resolution + uncertainty) for the q62 quality heuristic
    read as an ENGLISH-NESS predictor: docs bin by predicted score
    decile, the outcome is lang = 'en' (the q62 score leans on English
    stopword density, so it IS an implicit language classifier — with
    real outcome variance at every scale factor, unlike exact-dup
    membership, which is empty in this corpus and would make the
    decomposition degenerate), and the three components say WHY the
    heuristic is (mis)calibrated — reliability is the bin-wise gap
    between predicted and observed rates (0 = perfectly calibrated),
    resolution is how much the bins separate outcomes, and uncertainty
    is the outcome's own variance floor. The calibration-audit
    complement of q236's AUC (pure ranking) and q169's per-decile
    calibration table: a score can rank well while reliability is
    terrible, which is exactly what raw heuristic scores look like
    before a q243-style conformal/Platt adjustment.

    Cross-engine exactness: scores are read as INTEGER ten-thousandths
    (the rounded 4-decimal codomain), so every bin sum is an exact
    BIGINT; the <= 10 per-bin terms fold in BIN ORDER on both sides (the
    q151 discipline) with identical association; the six outputs round
    once at the edge.

    Scale posture: one scan computes score + outcome (pure column
    expressions, no second pass); bins collapse to <= 10 rows before any
    float, and the decomposition runs on the 1-row bin-list frame."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    quality = F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.5 + F.least(
        stop_hits / n_tokens.cast("double") * 5.0, F.lit(1.0)
    ) * 0.5
    outcomes = docs.select(
        F.round(quality, 4).alias("p"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("d"),
    ).select(
        F.round(F.col("p") * 10000, 0).cast("bigint").alias("pi"), "d"
    )
    bins = outcomes.groupBy(
        F.least(F.expr("pi div 1000"), F.lit(9)).alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("pi").cast("bigint").alias("s"),
        F.sum("d").cast("bigint").alias("dd"),
    )
    one = bins.agg(
        F.sort_array(F.collect_list(F.struct("bin", "n", "s", "dd"))).alias("terms"),
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("dd").cast("bigint").alias("ddd"),
        F.count(F.lit(1)).cast("bigint").alias("nb"),
    )
    rel = (
        F.expr(
            "aggregate(terms, 0D, (acc, x) -> acc + "
            "x.n * ((CAST(x.s AS DOUBLE) / x.n / 10000.0D"
            " - CAST(x.dd AS DOUBLE) / x.n)"
            " * (CAST(x.s AS DOUBLE) / x.n / 10000.0D"
            " - CAST(x.dd AS DOUBLE) / x.n)))"
        )
        / F.col("nn")
    )
    obar = F.col("ddd").cast("double") / F.col("nn")
    res = (
        F.expr(
            "aggregate(terms, 0D, (acc, x) -> acc + "
            "x.n * ((CAST(x.dd AS DOUBLE) / x.n"
            " - CAST(ddd AS DOUBLE) / nn)"
            " * (CAST(x.dd AS DOUBLE) / x.n"
            " - CAST(ddd AS DOUBLE) / nn)))"
        )
        / F.col("nn")
    )
    unc = obar * (F.lit(1.0) - obar)
    return one.select(
        F.col("nn").alias("n_docs"),
        F.col("nb").alias("n_bins"),
        F.round(obar, 6).alias("en_rate"),
        F.round(rel, 6).alias("reliability"),
        F.round(res, 6).alias("resolution"),
        F.round(unc, 6).alias("uncertainty"),
        F.round(rel - res + unc, 6).alias("brier_score"),
    )


@register(
    "q289_eb_rate_shrinkage",
    oracle="""
    WITH src AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS x
      FROM documents GROUP BY source
    ),
    one AS (
      SELECT list(n ORDER BY source) AS ln, list(x ORDER BY source) AS lx,
             CAST(count(*) AS BIGINT) AS k
      FROM src
    ),
    mom AS (
      SELECT list_sum(list_transform(range(1, k + 1), i ->
               CAST(lx[i] AS DOUBLE) / ln[i])) / k AS m
      FROM one
    ),
    prior AS (
      SELECT m,
             (m * (1.0 - m))
               / (list_sum(list_transform(range(1, one.k + 1), i ->
                    (CAST(lx[i] AS DOUBLE) / ln[i] - m)
                    * (CAST(lx[i] AS DOUBLE) / ln[i] - m))) / one.k)
               - 1.0 AS c
      FROM one, mom
    )
    SELECT source, n AS n_docs, x AS n_en,
           round(CAST(x AS DOUBLE) / n, 6) AS raw_rate,
           round((x + m * c) / (n + c), 6) AS shrunk_rate,
           round(CAST(n AS DOUBLE) / (n + c), 4) AS shrink_weight,
           round(m * c, 4) AS prior_alpha,
           round((1.0 - m) * c, 4) AS prior_beta
    FROM src, prior
    ORDER BY source
    """,
)
def q289_eb_rate_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-source English rates under a
    method-of-moments beta-binomial prior (Robbins 1956's empirical
    Bayes; the Efron-Morris small-n rate correction): fit (alpha, beta)
    from the across-source mean m and variance v of the raw rates
    (alpha + beta = m(1-m)/v - 1), then pull each source's estimate
    toward the prior mean with weight n/(n + alpha + beta). A source
    with 25 docs and a lucky streak stops ranking above a source with
    25k docs — the standard fix for every per-source dashboard rate in
    this repo (dup rate, quality share, langid precision) whose naive
    version whipsaws at small n; raw and shrunk sit side by side so the
    correction is auditable.

    Cross-engine exactness: per-source (n, x) are exact BIGINTs; the
    across-source moment folds run in SOURCE ORDER on both sides (the
    q151 discipline, |sources| bounded); every downstream expression is
    the identical association on identical doubles, rounded at the edge.

    Scale posture: one scan collapses the corpus to the |sources|-row
    census; the prior is a 1-row scalar attached back by broadcast; no
    second pass."""
    docs = load_table(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
    )
    one = src.agg(
        F.sort_array(F.collect_list(F.struct("source", "n", "x"))).alias("terms"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    m = F.expr(
        "aggregate(terms, 0D, (acc, t) -> acc + CAST(t.x AS DOUBLE) / t.n)"
    ) / F.col("k")
    mom = one.select("terms", "k", m.alias("m"))
    v = F.expr(
        "aggregate(terms, 0D, (acc, t) -> acc + "
        "(CAST(t.x AS DOUBLE) / t.n - m) * (CAST(t.x AS DOUBLE) / t.n - m))"
    ) / F.col("k")
    prior = mom.select(
        "m", ((F.col("m") * (F.lit(1.0) - F.col("m"))) / v - F.lit(1.0)).alias("c")
    )
    return (
        src.crossJoin(F.broadcast(prior))
        .select(
            "source",
            F.col("n").alias("n_docs"),
            F.col("x").alias("n_en"),
            F.round(F.col("x").cast("double") / F.col("n"), 6).alias("raw_rate"),
            F.round(
                (F.col("x") + F.col("m") * F.col("c")) / (F.col("n") + F.col("c")), 6
            ).alias("shrunk_rate"),
            F.round(F.col("n").cast("double") / (F.col("n") + F.col("c")), 4).alias(
                "shrink_weight"
            ),
            F.round(F.col("m") * F.col("c"), 4).alias("prior_alpha"),
            F.round((F.lit(1.0) - F.col("m")) * F.col("c"), 4).alias("prior_beta"),
        )
        .orderBy("source")
    )


@register(
    "q297_simpsons_reversal",
    oracle=f"""
    WITH scored AS (
      SELECT source,
             CAST(n_chars AS BIGINT) AS x,
             CAST(round(round(LEAST(len(regexp_split_to_array(trim(text), '\\s+')) / 100.0, 1.0) * 0.5
                   + LEAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                               t -> list_contains({list(STOPWORDS)!r}::VARCHAR[], t)))
                           / CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE)
                           * 5.0, 1.0) * 0.5, 4) * 10000, 0) AS BIGINT) AS y
      FROM documents
    ),
    per AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM scored GROUP BY source
    ),
    pooled AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM scored
    ),
    rs AS (
      SELECT source, n,
             (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
               / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
                      * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)) AS r
      FROM per
    ),
    rp AS (
      SELECT (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
               / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
                      * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)) AS r
      FROM pooled
    )
    SELECT rs.source, rs.n AS n_docs,
           round(rs.r, 4) AS source_corr,
           round(rp.r, 4) AS pooled_corr,
           (rs.r > 0) <> (rp.r > 0) AS reversed
    FROM rs, rp
    ORDER BY rs.source
    """,
)
def q297_simpsons_reversal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox screen (Simpson 1951; the aggregation-reversal
    audit every metrics warehouse eventually needs): the correlation
    between document length and the q62 quality score, computed PER
    SOURCE and POOLED, with a `reversed` flag where the within-stratum
    sign contradicts the pooled sign. A pooled "longer docs score
    higher" can be pure composition (one verbose high-scoring source)
    while every individual source trends the other way — acting on the
    pooled number (e.g. a q156-style length-biased quality cap) would
    then hurt every stratum. This is the one-query check that the
    direction of a correlation survives disaggregation.

    Cross-engine exactness: x is the raw char count, y the quality score
    as INTEGER ten-thousandths (q285's integerization), so all five
    moments per stratum are exact BIGINTs; the Pearson r is one
    identical-association double expression (no engine corr(), whose
    accumulation order is nondeterministic — the q281 lesson); the sign
    comparison uses the UNROUNDED r in both engines.

    Scale posture: one scan -> per-source exact moments (map-side
    partials, one shuffle on source); the pooled moment row attaches as
    a 1-row broadcast scalar; output is |sources| rows."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    quality = F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.5 + F.least(
        stop_hits / n_tokens.cast("double") * 5.0, F.lit(1.0)
    ) * 0.5
    scored = docs.select(
        "source",
        F.col("n_chars").cast("bigint").alias("x"),
        F.round(F.round(quality, 4) * 10000, 0).cast("bigint").alias("y"),
    )

    def moments(grouped):
        return grouped.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        )

    def pearson():
        return (
            F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy") / F.col("n")
        ) / F.sqrt(
            (F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / F.col("n"))
            * (F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / F.col("n"))
        )

    per = moments(scored.groupBy("source")).select("source", "n", pearson().alias("r"))
    pooled = moments(scored.groupBy()).select(pearson().alias("rp"))
    return (
        per.crossJoin(F.broadcast(pooled))
        .select(
            "source",
            F.col("n").alias("n_docs"),
            F.round("r", 4).alias("source_corr"),
            F.round("rp", 4).alias("pooled_corr"),
            ((F.col("r") > 0) != (F.col("rp") > 0)).alias("reversed"),
        )
        .orderBy("source")
    )


@register(
    "q300_length_debiased_quality",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             CAST(n_chars AS BIGINT) AS x,
             CAST(round(round(LEAST(len(regexp_split_to_array(trim(text), '\\s+')) / 100.0, 1.0) * 0.5
                   + LEAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                               t -> list_contains({list(STOPWORDS)!r}::VARCHAR[], t)))
                           / CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE)
                           * 5.0, 1.0) * 0.5, 4) * 10000, 0) AS BIGINT) AS y
      FROM documents
    ),
    fit AS (
      SELECT (CAST(sum(x * y) AS DOUBLE) - CAST(sum(x) AS DOUBLE) * sum(y) / count(*))
               / (CAST(sum(x * x) AS DOUBLE) - CAST(sum(x) AS DOUBLE) * sum(x) / count(*))
               AS b,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy
      FROM scored
    ),
    resid AS (
      SELECT doc_id, source, x, y,
             y - ((CAST(sy AS DOUBLE) - b * sx) / n + b * x) AS r
      FROM scored, fit
    ),
    flagged AS (
      SELECT doc_id, source, x AS n_chars, y AS quality_e4,
             round(r, 4) AS residual,
             CASE WHEN r > 0 THEN 'over' ELSE 'under' END AS side
      FROM resid
    )
    SELECT * FROM (
      (SELECT * FROM flagged ORDER BY residual DESC, doc_id ASC LIMIT 10)
      UNION ALL
      (SELECT * FROM flagged ORDER BY residual ASC, doc_id ASC LIMIT 10)
    )
    ORDER BY residual DESC, doc_id ASC
    """,
)
def q300_length_debiased_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-debiased quality ranking: regress the q62 score on document
    length (one pooled OLS from exact integer moments) and rank documents
    by the RESIDUAL — quality the length term cannot explain. The q62
    heuristic hard-codes a length reward, so raw-score ranking (q112,
    q156's caps) partly re-ranks by length; the residual surfaces the
    short-but-good docs a raw cutoff would discard and the long-but-empty
    docs it would keep — the two triage queues this emits (top/bottom 10
    by residual). Residualization-before-ranking is the standard
    confound control (the regression form of q297's Simpson screen —
    there it DETECTS the length confound, here it REMOVES it).

    Determinism: slope and intercept come from exact BIGINT moments in
    one identical-association expression; each residual is an identical
    double; ranking is by the ROUNDED residual with a doc_id tie-break
    (round-before-rank).

    Scale posture: one scan computes (x, y); the fit is a 1-row scalar
    attached by broadcast; the two triage queues are TakeOrdered top-10s
    (no global window anywhere — ranking the FULL corpus by residual
    would be the q144 two-level problem; a bounded head never is)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    quality = F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.5 + F.least(
        stop_hits / n_tokens.cast("double") * 5.0, F.lit(1.0)
    ) * 0.5
    scored = docs.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("bigint").alias("x"),
        F.round(F.round(quality, 4) * 10000, 0).cast("bigint").alias("y"),
    )
    fit = scored.agg(
        (
            (
                F.sum(F.col("x") * F.col("y")).cast("double")
                - F.sum("x").cast("double") * F.sum("y") / F.count(F.lit(1))
            )
            / (
                F.sum(F.col("x") * F.col("x")).cast("double")
                - F.sum("x").cast("double") * F.sum("x") / F.count(F.lit(1))
            )
        ).alias("b"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
    )
    r = F.col("y") - (
        (F.col("sy").cast("double") - F.col("b") * F.col("sx")) / F.col("n")
        + F.col("b") * F.col("x")
    )
    resid = scored.crossJoin(F.broadcast(fit)).select(
        "doc_id",
        "source",
        F.col("x").alias("n_chars"),
        F.col("y").alias("quality_e4"),
        F.round(r, 4).alias("residual"),
        F.when(r > 0, "over").otherwise("under").alias("side"),
    )
    top = resid.orderBy(F.col("residual").desc(), F.col("doc_id").asc()).limit(10)
    bottom = resid.orderBy(F.col("residual").asc(), F.col("doc_id").asc()).limit(10)
    return top.unionAll(bottom).orderBy(
        F.col("residual").desc(), F.col("doc_id").asc()
    )


@register(
    "q310_sentence_stats",
    oracle="""
    WITH sent AS (
      SELECT doc_id, source,
             list_filter(regexp_split_to_array(trim(text), '[.!?]+'),
                         s -> len(trim(s)) > 0) AS ss
      FROM documents
    ),
    per AS (
      SELECT doc_id, source,
             CAST(len(ss) AS BIGINT) AS n_sentences,
             CAST(list_sum(list_transform(ss, s ->
               len(list_filter(regexp_split_to_array(trim(s), '\\s+'),
                               t -> len(t) > 0)))) AS BIGINT) AS n_words
      FROM sent WHERE len(ss) > 0
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_sentences) AS BIGINT) AS n_sentences,
           CAST(sum(n_words) AS BIGINT) AS n_words,
           round(CAST(sum(n_words) AS DOUBLE) / sum(n_sentences), 4)
             AS words_per_sentence,
           round(CAST(sum(n_sentences) AS DOUBLE) / count(*), 4)
             AS sentences_per_doc
    FROM per
    GROUP BY source
    ORDER BY source
    """,
)
def q310_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-level shape statistics per source: sentences split on
    terminal punctuation runs ([.!?]+), words per sentence and sentences
    per document — the sentence-granularity complement of q60's token
    stats and the core input of every readability formula (Flesch/
    Kincaid are affine functions of words-per-sentence plus a syllable
    term); long-sentence sources are the first place extraction bugs
    (lost punctuation, concatenated boilerplate) show up, upstream of
    any quality score that tokenizes.

    Cross-engine contract: the sentence splitter is the same
    regexp-split-both-engines pattern as the canonical tokenizer (split
    on the punctuation class, drop whitespace-only fragments; words per
    sentence re-split each fragment with the canonical \\s+ rule,
    dropping empties — stated operationally so both engines execute the
    identical definition). All outputs derive from exact integer counts.

    Scale posture: pure column expressions inside codegen (no UDF), one
    hash aggregate to |sources| rows."""
    docs = load_table(spark, sf_dir, "documents")
    ss = F.filter(
        F.split(F.trim(F.col("text")), r"[.!?]+"),
        lambda s: F.length(F.trim(s)) > 0,
    )
    words_in = lambda s: F.size(  # noqa: E731
        F.filter(F.split(F.trim(s), r"\s+"), lambda t: F.length(t) > 0)
    )
    per = docs.select(
        "source",
        F.size(ss).cast("bigint").alias("n_sentences"),
        F.aggregate(
            ss, F.lit(0).cast("bigint"), lambda acc, s: acc + words_in(s)
        ).alias("n_words"),
    ).filter(F.col("n_sentences") > 0)
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_sentences").cast("bigint").alias("n_sentences"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.round(
                F.sum("n_words").cast("double") / F.sum("n_sentences"), 4
            ).alias("words_per_sentence"),
            F.round(
                F.sum("n_sentences").cast("double") / F.count(F.lit(1)), 4
            ).alias("sentences_per_doc"),
        )
        .orderBy("source")
    )


# --- q319: code-switch / segment-level language-consistency audit --------------

_CS_SEGMENTS = 4


def _code_switch_oracle() -> str:
    """Per-document quarter segmentation via 1-based inclusive list slices;
    a quarter is en-like iff its stopword hits reach 10% of its tokens
    (integer compare hits*10 >= len — no float threshold)."""
    segs = []
    for q in range(1, _CS_SEGMENTS + 1):
        lo = f"(({q - 1}) * n) // {_CS_SEGMENTS} + 1"
        hi = f"({q} * n) // {_CS_SEGMENTS}"
        seg = f"toks[{lo}:{hi}]"
        segs.append(
            f"CASE WHEN {hi} >= {lo} THEN "
            f"CASE WHEN len(list_filter({seg}, t -> list_contains("
            f"{list(STOPWORDS)!r}::VARCHAR[], t))) * 10 >= len({seg}) "
            f"THEN 1 ELSE 0 END END AS en{q}"
        )
    flags = ", ".join(segs)
    ens = " , ".join(f"en{q}" for q in range(1, _CS_SEGMENTS + 1))
    return f"""
    WITH base AS (
      SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS toks,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n
      FROM documents
    ),
    seg AS (SELECT doc_id, lang, n, {flags} FROM base),
    per_doc AS (
      SELECT doc_id, lang,
             len(list_filter([{ens}], x -> x IS NOT NULL)) AS n_segs,
             coalesce(en1, 0) + coalesce(en2, 0) + coalesce(en3, 0)
               + coalesce(en4, 0) AS n_en_segs
      FROM seg
    )
    SELECT lang AS labeled_lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_segs >= 2 AND n_en_segs > 0
                          AND n_en_segs < n_segs THEN 1 ELSE 0 END) AS BIGINT)
             AS n_switched,
           round(sum(CASE WHEN n_segs >= 2 AND n_en_segs > 0
                           AND n_en_segs < n_segs THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS switch_rate,
           round(avg(CAST(n_en_segs AS DOUBLE) / n_segs), 6) AS mean_en_frac
    FROM per_doc GROUP BY lang ORDER BY labeled_lang
    """


@register("q319_code_switch_audit", oracle=_code_switch_oracle())
def q319_code_switch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level language-consistency audit: each document splits into
    {_CS_SEGMENTS} token quarters, each quarter gets the q66/q175 stopword
    language test (en-like iff stopword hits reach 10% of the quarter's
    tokens — an integer compare, no float threshold), and a document whose
    non-empty quarters DISAGREE is flagged as code-switched. Mixed-language
    documents defeat document-level lang-ID (the whole-doc vote averages
    the signal away) and poison monolingual training mixtures — this is
    the census that budgets a segment-level re-labeling pass, per labeled
    language. Complements q175 (document-level classifier-vs-label
    confusion): q175 asks "is the label right", this asks "is ONE label
    even the right model".

    Determinism: quarter boundaries are integer floor arithmetic on the
    token count; the en-like test is an exact integer compare; rates are
    exact-ratio rounding.

    Scale posture: pure map — slices and higher-order filters over the
    token array, no shuffle until the |langs|-row aggregate. At 100x only
    the scan grows (the q60/q119 class)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = docs.select(
        "doc_id", "lang", toks.alias("toks"), F.size(toks).alias("n")
    )
    flags = []
    for q in range(1, _CS_SEGMENTS + 1):
        lo = F.floor((q - 1) * F.col("n") / _CS_SEGMENTS) + 1
        hi = F.floor(q * F.col("n") / _CS_SEGMENTS)
        seg = F.slice("toks", lo.cast("int"), (hi - lo + 1).cast("int"))
        hits = F.size(F.filter(seg, lambda t: t.isin(*STOPWORDS)))
        flags.append(
            F.when(hi >= lo, (hits * 10 >= F.size(seg)).cast("int")).alias(
                f"en{q}"
            )
        )
    seg = base.select("doc_id", "lang", "n", *flags)
    en_cols = [F.col(f"en{q}") for q in range(1, _CS_SEGMENTS + 1)]
    n_segs = F.size(
        F.filter(F.array(*en_cols), lambda x: x.isNotNull())
    )
    n_en = sum(F.coalesce(c, F.lit(0)) for c in en_cols[1:]) + F.coalesce(
        en_cols[0], F.lit(0)
    )
    per_doc = seg.select(
        "lang", n_segs.alias("n_segs"), n_en.alias("n_en_segs")
    )
    switched = (
        (F.col("n_segs") >= 2)
        & (F.col("n_en_segs") > 0)
        & (F.col("n_en_segs") < F.col("n_segs"))
    ).cast("int")
    return (
        per_doc.groupBy(F.col("lang").alias("labeled_lang"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(switched).cast("bigint").alias("n_switched"),
            F.round(F.sum(switched) / F.count(F.lit(1)), 6).alias("switch_rate"),
            F.round(
                F.avg(F.col("n_en_segs").cast("double") / F.col("n_segs")), 6
            ).alias("mean_en_frac"),
        )
        .orderBy("labeled_lang")
    )


# --- q326: readability indices ---------------------------------------------------


@register(
    "q326_readability_scores",
    oracle="""
    WITH per_doc AS (
      SELECT lang,
             greatest(len(list_filter(regexp_split_to_array(text, '[.!?]+'),
                                      s -> trim(s) <> '')), 1) AS sents,
             len(regexp_split_to_array(trim(text), '\\s+')) AS words,
             list_aggregate(list_transform(
               regexp_split_to_array(trim(lower(text)), '\\s+'),
               t -> greatest(len(regexp_extract_all(t, '[aeiouy]+')), 1)),
               'sum') AS sylls,
             length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS chars
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(words) AS BIGINT) AS n_words,
           CAST(sum(sents) AS BIGINT) AS n_sentences,
           CAST(sum(sylls) AS BIGINT) AS n_syllables,
           round(CAST(sum(words) AS DOUBLE) / sum(sents), 4)
             AS words_per_sentence,
           round(CAST(sum(sylls) AS DOUBLE) / sum(words), 4)
             AS syllables_per_word,
           round(206.835 - 1.015 * (CAST(sum(words) AS DOUBLE) / sum(sents))
                 - 84.6 * (CAST(sum(sylls) AS DOUBLE) / sum(words)), 4)
             AS flesch_ease,
           round(0.39 * (CAST(sum(words) AS DOUBLE) / sum(sents))
                 + 11.8 * (CAST(sum(sylls) AS DOUBLE) / sum(words)) - 15.59, 4)
             AS fk_grade,
           round(4.71 * (CAST(sum(chars) AS DOUBLE) / sum(words))
                 + 0.5 * (CAST(sum(words) AS DOUBLE) / sum(sents)) - 21.43, 4)
             AS ari
    FROM per_doc GROUP BY lang ORDER BY lang
    """,
)
def q326_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language readability indices — Flesch Reading Ease,
    Flesch-Kincaid grade, and ARI — from exact corpus-level counts of
    words, sentences ([.!?]+ segmentation), syllables (vowel-group runs
    per token, floor 1 — the standard dictionary-free proxy), and
    alphanumeric characters. Readability bands are a routine quality /
    complexity-stratification signal in pretraining mixture design
    (complements q62's length/stopword score and q146's token entropy
    with SENTENCE-level structure, which neither sees).

    Determinism: all four inputs are exact integer sums (per-doc counts
    via higher-order folds over the token array, identical in both
    engines); each index is a closed form of two exact ratios, rounded
    at 4 — no float aggregation anywhere.

    Scale posture: pure map over the scan (regex splits + per-doc folds),
    then a |langs|-row aggregate of integer partials — the q60/q119
    zero-shuffle class."""
    docs = load_table(spark, sf_dir, "documents")
    sents = F.greatest(
        F.size(
            F.filter(
                F.split(F.col("text"), r"[.!?]+"),
                lambda s: F.trim(s) != "",
            )
        ),
        F.lit(1),
    )
    words = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    sylls = F.expr(
        "aggregate(transform(split(trim(lower(text)), '\\\\s+'),"
        " t -> greatest(size(regexp_extract_all(t, '[aeiouy]+', 0)), 1)),"
        " 0, (acc, x) -> acc + x)"
    )
    chars = F.length(F.regexp_replace("text", "[^A-Za-z0-9]", ""))
    per_doc = docs.select(
        "lang",
        sents.alias("sents"),
        words.alias("words"),
        sylls.alias("sylls"),
        chars.alias("chars"),
    )
    wps = F.sum("words").cast("double") / F.sum("sents")
    spw = F.sum("sylls").cast("double") / F.sum("words")
    cpw = F.sum("chars").cast("double") / F.sum("words")
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("words").cast("bigint").alias("n_words"),
            F.sum("sents").cast("bigint").alias("n_sentences"),
            F.sum("sylls").cast("bigint").alias("n_syllables"),
            F.round(wps, 4).alias("words_per_sentence"),
            F.round(spw, 4).alias("syllables_per_word"),
            F.round(206.835 - 1.015 * wps - 84.6 * spw, 4).alias("flesch_ease"),
            F.round(0.39 * wps + 11.8 * spw - 15.59, 4).alias("fk_grade"),
            F.round(4.71 * cpw + 0.5 * wps - 21.43, 4).alias("ari"),
        )
        .orderBy("lang")
    )


# --- q327: word-order-insensitive (bag-of-words) duplicate census ---------------


@register(
    "q327_bag_dup_groups",
    oracle="""
    WITH bags AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(
               regexp_split_to_array(trim(text), '\\s+')), ' ')) AS bag_fp,
             md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS exact_fp
      FROM documents
    )
    SELECT bag_fp,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT exact_fp) AS BIGINT) AS n_distinct_texts,
           CAST(min(doc_id) AS BIGINT) AS keeper_doc_id,
           count(DISTINCT exact_fp) > 1 AS reordered
    FROM bags
    GROUP BY bag_fp
    HAVING count(*) > 1
    ORDER BY bag_fp
    """,
)
def q327_bag_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-order-insensitive duplicate census — the reorder-invariant rung
    between exact dedup (q64: byte identity) and near-dup LSH (q67:
    shingle overlap): documents whose sorted token MULTISETS collide are
    grouped by the bag fingerprint (md5 of the sorted token list), and
    `reordered` marks groups whose members are NOT byte-identical — the
    template-shuffle duplicates (list reorderings, navigation permutes,
    shuffled boilerplate) that exact dedup misses and shingle LSH only
    partially catches (reordering destroys most 3-gram shingles). The
    keeper rule mirrors q64 (min doc_id).

    Determinism: fingerprints are md5 digests of canonical forms (sorted
    token join; lowercased whitespace-normalized text); counts exact.

    Scale posture: one map pass computes both digests per document (the
    sort is per-doc, bounded by doc length), then a digest-keyed
    HashAggregate — the q64 shuffle shape with a 16-byte key; text never
    moves."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    bag_fp = F.md5(F.array_join(F.array_sort(toks), " "))
    exact_fp = F.md5(
        F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    )
    bags = docs.select(
        "doc_id", bag_fp.alias("bag_fp"), exact_fp.alias("exact_fp")
    )
    return (
        bags.groupBy("bag_fp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("exact_fp").cast("bigint").alias("n_distinct_texts"),
            F.min("doc_id").cast("bigint").alias("keeper_doc_id"),
            (F.countDistinct("exact_fp") > 1).alias("reordered"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("bag_fp")
    )
