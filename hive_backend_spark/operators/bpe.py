"""Iterated BPE merge training (Sennrich et al. 2016) over the corpus
word-frequency table.

The trainer operates on DISTINCT words weighted by frequency — the classic
efficient BPE formulation and the natural Spark one: the corpus collapses
to the word vocabulary in ONE scan (HashAggregate, map-side combined), and
every merge round after that touches only the vocabulary-sized frame, never
the corpus again. Per round the loop is

  count adjacent symbol pairs (weighted by word freq)
    -> argmax merge rule (count desc, pair lexicographic — deterministic)
    -> apply the merge to every word's symbol sequence
    -> repeat on the merged symbols,

with k rounds of 1-row driver state (the merge rule), the same bounded
driver-state discipline as the k-means trainer (operators/clustering.py).

Symbol sequences are stored as a delimited STRING, one ``" sym\\x1f"`` unit
per symbol (space = start-of-symbol boundary, unit separator \\x1f =
end-of-symbol marker). That encoding makes merge application a single
codegen'd ``replace(enc, " a\\x1f b\\x1f", " ab\\x1f")``: left-to-right
non-overlapping replacement — the semantics of both Spark's and DuckDB's
``replace`` — is EXACTLY the BPE leftmost-scan merge rule (after a merge
consumes positions (i, i+1), position i+1 cannot also merge with i+2),
and each unit carries both boundaries so no delimiter is shared between
adjacent matches (the classic " a b a b " double-space bug cannot occur).
Tokens never contain whitespace (words are whitespace-split) and the
synthetic corpus is printable text, so \\x1f is collision-free.

Reference: the reference system has no tokenizer surface (its text
handling is `db.mjs` JSON passthrough); SURVEY §7 Phase-3 names tokenizer
training as a first-class LLM-pipeline extension. q159 computes one round
of merge CANDIDATES; this module runs the actual training loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEP = "\x1f"


def word_freq_symbols(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(freq bigint, enc string): one row per DISTINCT word with its corpus
    frequency and its character-level symbol encoding (`" c\\x1f"` units).
    The only corpus-sized pass of the whole trainer."""
    words = docs.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
    ).filter(F.length("w") >= 1)
    return words.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq")
    ).select(
        "freq", F.regexp_replace("w", "(.)", " $1" + SEP).alias("enc")
    )


def _symbols() -> "F.Column":
    """Decode the delimited encoding back to the symbol array:
    strip the leading space and trailing \\x1f, split on '\\x1f '."""
    return F.expr("split(substring(enc, 2, length(enc) - 2), concat(chr(31), ' '))")


def pair_counts(wf: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent-symbol pair counts weighted by word frequency.
    Map-side combinable HashAggregate over the vocabulary-sized frame; the
    pair vocabulary is symbol-alphabet^2-bounded. Single-symbol words are
    filtered (no pairs) rather than fed to sequence(0, -1), which Spark
    would interpret as a DESCENDING range."""
    sy = wf.select("freq", _symbols().alias("s")).filter(F.size("s") >= 2)
    pr = sy.select(
        "freq",
        F.explode(
            F.expr("transform(sequence(0, size(s) - 2), i -> struct(s[i] AS a, s[i + 1] AS b))")
        ).alias("p"),
    )
    return pr.groupBy("p.a", "p.b").agg(F.sum("freq").cast("bigint").alias("cnt"))


def apply_merge(wf: DataFrame, a: str, b: str) -> DataFrame:
    """One merge rule applied to every word: a single codegen'd string
    replace of the two-unit pattern by the fused unit (leftmost-scan
    semantics — see the module docstring)."""
    return wf.withColumn(
        "enc",
        F.replace(
            F.col("enc"),
            F.lit(f" {a}{SEP} {b}{SEP}"),
            F.lit(f" {a}{b}{SEP}"),
        ),
    )


def train_merges(
    docs: DataFrame, k: int, text_col: str = "text"
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Run k BPE merge rounds; returns (merges, final_word_frame) where
    merges = [(round, left_sym, right_sym, merged, pair_count), ...] in
    training order (fewer than k if the pair table drains first) and
    final_word_frame is the (freq, enc) table after all merges.

    Driver state per round is the 1-row argmax (bounded collect, the
    k-means/centroid discipline); the word frame is localCheckpoint'ed per
    round so round r+1's lineage doesn't re-run rounds 1..r — the same
    iterative-truncation fix the k-core peeling and star-contraction loops
    use. Ties break on (count desc, left asc, right asc) in both engines."""
    wf = word_freq_symbols(docs, text_col).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(1, k + 1):
        top = (
            pair_counts(wf)
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((r, a, b, a + b, cnt))
        wf = apply_merge(wf, a, b).localCheckpoint(eager=False)
    return merges, wf


def merges_frame(spark: SparkSession, merges) -> DataFrame:
    """The k-row training transcript as a DataFrame (driver-built: k rows
    of model state, the q155 emission discipline)."""
    return spark.createDataFrame(
        merges,
        "merge_round int, left_sym string, right_sym string, "
        "merged string, pair_count bigint",
    )
