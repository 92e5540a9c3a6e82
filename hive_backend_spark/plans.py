"""Physical-plan introspection (SURVEY §4): the engine relies on Catalyst
for pushdown/pruning/join-selection rather than custom rules, so the
guarantee we CAN make is that the optimizer actually produced the plan we
designed for. These helpers extract the physical operator list, pushed
filters, and codegen spans from `explain("formatted")` output; the plan
tests assert the load-bearing properties (broadcast joins stay broadcast,
top-k stays TakeOrderedAndProject, scans keep their PushedFilters)."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame

_OP_RE = re.compile(r"^\s*\(\d+\)\s+(\S+)")
_PUSHED_RE = re.compile(r"PushedFilters: \[([^\]]*)\]")
_READSCHEMA_RE = re.compile(r"ReadSchema: (\S+)")


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def physical_ops(df: DataFrame) -> list[str]:
    """Physical operator names in plan order, e.g. ['Scan', 'Filter',
    'BroadcastHashJoin', ...]."""
    ops = []
    for line in formatted_plan(df).splitlines():
        m = _OP_RE.match(line)
        if m:
            ops.append(m.group(1))
    return ops


def pushed_filters(df: DataFrame) -> list[str]:
    """Every scan's PushedFilters content (one string per scan)."""
    return _PUSHED_RE.findall(formatted_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    """Every scan's ReadSchema — the column-pruning evidence."""
    return _READSCHEMA_RE.findall(formatted_plan(df))


def oracle_unpartitioned_window_specs(sql: str) -> list[str]:
    """Every window spec in an ORACLE SQL text with no PARTITION BY —
    inline ``OVER (...)`` forms and named ``WINDOW w AS (...)`` clauses
    referenced via ``OVER w``. The DuckDB oracle runs at toy scale, so a
    flat window there is legal; this scanner exists so each one is an
    ASSERTED intentional divergence (either mirroring a Spark-side
    bounded window from UNPARTITIONED_WINDOW_ALLOWLIST, or listed in
    ORACLE_ONLY_GLOBAL_WINDOWS with the Spark-side alternative named),
    never an unexamined default."""
    import re

    spec = re.compile(r"over\s*\(([^()]*(?:\([^()]*\)[^()]*)*)\)", re.I | re.S)
    named = re.compile(
        r"window\s+(\w+)\s+as\s*\(([^()]*(?:\([^()]*\)[^()]*)*)\)", re.I | re.S
    )
    specs = [m.group(1) for m in spec.finditer(sql)]
    defs = {m.group(1): m.group(2) for m in named.finditer(sql)}
    for m in re.finditer(r"over\s+(\w+)", sql, re.I):
        if m.group(1) in defs:
            specs.append(defs[m.group(1)])
    return [
        # A bare OVER () — the most global window shape of all — must not
        # silently drop out of the audit just because its spec text is
        # empty; report it as the sentinel '<empty>' so the intent tests
        # see it like any other flat window.
        re.sub(r"\s+", " ", s.strip()) or "<empty>"
        for s in specs
        if "partition by" not in s.lower()
    ]


# Oracle texts allowed a flat window WITHOUT a matching Spark-side
# UNPARTITIONED_WINDOW_ALLOWLIST entry: the Spark implementation avoids the
# window entirely, so the divergence is the point — recorded here per query.
# tests/test_plans.py::test_oracle_global_windows_are_intentional enforces
# that every flat oracle window is covered by one of the two lists and that
# no entry here is stale.
ORACLE_ONLY_GLOBAL_WINDOWS: dict[str, str] = {
    "q155_kmeans_train":
        "oracle ranks the k init seeds with a flat row_number over a "
        "k-row LIMIT; the Spark side collects the k seeds driver-side "
        "(bounded model state), so its plan has no window at all",
}


def unpartitioned_window_specs(df: DataFrame) -> list[str]:
    """Every ``windowspecdefinition(...)`` in the EXECUTED plan whose
    partition spec is empty — the single-task funnel shape (Exchange
    SinglePartition + one-task sort over the window's whole input). A spec
    is unpartitioned iff its first argument is already a sort order
    (``col ASC/DESC NULLS ...``) or, for order-less global frames, the
    ``specifiedwindowframe(...)`` itself. Parsed with a paren-balanced
    scanner so partition EXPRESSIONS containing commas/parens classify
    correctly."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    marker = "windowspecdefinition("
    out = []
    i = 0
    while True:
        j = plan.find(marker, i)
        if j < 0:
            break
        depth, k = 1, j + len(marker)
        args, last = [], j + len(marker)
        while depth and k < len(plan):
            c = plan[k]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    args.append(plan[last:k])
            elif c == "," and depth == 1:
                args.append(plan[last:k])
                last = k + 1
            k += 1
        i = k
        first = args[0].strip() if args else ""
        if (
            " ASC NULLS" in first
            or " DESC NULLS" in first
            or first.startswith("specifiedwindowframe(")
        ):
            out.append(marker + ", ".join(a.strip() for a in args) + ")")
    return out


def assert_plan(df: DataFrame, requires: list[str] = (), forbids: list[str] = ()) -> None:
    """Assert operator presence/absence by name substring."""
    ops = physical_ops(df)
    for op in requires:
        assert any(op in o for o in ops), f"plan missing {op!r}: {ops}"
    for op in forbids:
        assert not any(op in o for o in ops), f"plan contains forbidden {op!r}: {ops}"


# --- unpartitioned-window invariant -----------------------------------------
# A window with an empty partition spec moves its ENTIRE input through one
# task (Exchange SinglePartition + single-task sort) — correct at any sf,
# a funnel at 100x. It is allowed ONLY when the window's input is BOUNDED
# BY CONSTRUCTION: a TakeOrdered-limited report head, a fixed bucket-head
# table (256 packing/prefix chunks), a value-bounded dimension (a rounded
# score's codomain, |sources|, |event types|). A global window over a
# corpus-sized relation — ranking all documents, a running mark over all
# events — must be decomposed with the q107 two-level prefix discipline
# (per-chunk window partitioned by chunk + one bounded chunk-head window)
# or replaced by closed-form boundary arithmetic (q144).
#
# tests/test_plans.py::test_unpartitioned_windows_are_bounded enforces this
# mechanically over every registered query's EXECUTED plan: any query whose
# plan contains a windowspecdefinition with no partition columns must appear
# here with its recorded input bound. q208/q144 shipped exactly this funnel
# in round 6 and would have failed the sweep at commit time.
UNPARTITIONED_WINDOW_ALLOWLIST: dict[str, str] = {
    "q107_sequence_packing":
        "256-row packing bucket-head table (two-level prefix sum, level 2)",
    "q115_packed_shards":
        "256-row packing bucket-head table (two-level prefix sum, level 2)",
    "q124_training_pipeline":
        "256-row packing bucket-head table (two-level prefix sum, level 2)",
    "q141_zipf_slope":
        "top-30 zipf head, pre-limited by TakeOrderedAndProject before the "
        "rank window",
    "q316_heaps_law_fit":
        "10-row decile frame: cumulative token/vocab prefix sums over the "
        "fixed decile dimension (q225 growth-curve discipline)",
    "q324_obrien_fleming_monitor":
        "|days|-row daily frame: cumulative looks over the calendar-"
        "bounded monitoring window (the q266/q250 day-grid discipline)",
    "q321_successive_halving":
        "<= 20-row arm frame per round: |sources| is the bounded "
        "dimension being ranked (elimination-bracket row_number)",
    "q144_curriculum_stages":
        "<= 10001-row per-score population table: the rounded quality "
        "score's codomain (running count, two-level rank level 2)",
    "q167_budget_waterfill":
        "|sources|-row availability table: bounded dimension (waterfill "
        "prefix scan)",
    "q182_vocab_coverage":
        "top-k vocabulary head, pre-limited by TakeOrderedAndProject before "
        "the rank/cumulative windows",
    "q196_chi2_type_drift":
        "|event types|-row contingency table: bounded dimension (chi2 "
        "totals as Window.partitionBy() over the type census)",
    "q200_rrf_fusion":
        "top-k ranker heads, pre-limited by TakeOrderedAndProject before "
        "the rank windows",
    "q204_ranker_agreement":
        "top-k ranker heads, pre-limited by TakeOrderedAndProject before "
        "the rank windows",
    "q208_watermark_lag_audit":
        "256-row chunk-head prior-max table (two-level prefix max, level 2)",
    "q225_dedup_growth_curve":
        "10-row decile frame: running sums over the fixed decile dimension "
        "(growth-curve cumulative counts)",
    "q235_km_gap_survival":
        "24-row fixed hour grid: risk-set and cumulative-log windows over "
        "the administrative-censoring study frame",
    "q288_nelson_aalen_hazard":
        "24-row fixed hour grid: risk-set, cumulative-hazard and "
        "cumulative-log windows over the q235 study frame",
    "q236_quality_auc":
        "<= 10001-row rounded-score codomain: running midrank count "
        "(q144 discipline, bounded by the 4-decimal score grid)",
    "q223_neyman_allocation":
        "|sources|-row strata frame: denominator window sums (single-scan "
        "form — a re-aggregated branch would scan the corpus twice)",
    "q228_filter_interaction_census":
        "<= 16-row signature frame (2^4 codomain): corpus-total window "
        "sum (single-scan form)",
    "q253_hill_tail_index":
        "top-201 order-statistic head, pre-limited by TakeOrderedAndProject "
        "before the rank window",
    "q255_systematic_pps_sample":
        "256-row bucket-head prefix-sum table (two-level prefix sum, "
        "level 2, q107/q208 discipline)",
    "q278_range_partition_planner":
        "512-row fixed planner sample (pre-limited by TakeOrderedAndProject "
        "before the ntile window) + the 8-row bucket census balance window",
    "q294_rbo_ranker_churn":
        "100-row fixed depth grid (both ranker lists pre-limited by "
        "TakeOrderedAndProject): running overlap census window",
    "q299_hamilton_apportionment":
        "|sources|-row census frame: remainder rank + leftover-sum "
        "windows (bounded dimension)",
    "q304_peak_concurrency":
        "256-row chunk-head prefix-sum table (two-level prefix sum, "
        "level 2, q107/q208 discipline)",
    "q306_kendall_tau":
        "top-k ranker heads, pre-limited by TakeOrderedAndProject before "
        "the rank windows (the q204 frame)",
    "q308_bfs_hop_census":
        "<= 5-row hop frame (4 pinned BFS rounds): cumulative-reach "
        "window (bounded by construction)",
    "q245_wasserstein_drift":
        "chars-codomain value grid: global-CDF cumulative window over the "
        "bounded grid (per-source CDFs partition by source)",
    "q243_conformal_threshold":
        "ceiled-residual grid: bounded by the chars codomain, not the "
        "corpus (cumulative order-statistic window, q144/q236 discipline)",
    "q240_interval_overlap_join":
        "top-20 incident head, pre-limited by TakeOrderedAndProject before "
        "the rank window",
    "q238_fdr_drift_control":
        "64-row user-bucket hypothesis frame: BH step-up rank and kstar "
        "windows over the fixed bucket dimension",
    "q266_ewma_control_chart":
        "|days|-row daily-rate frame: day indexing and the EWMA running "
        "weighted sum over the bounded retention-day dimension (~31 here)",
}

# --- explicit-broadcast invariant -------------------------------------------
# An explicit F.broadcast() hint is allowed ONLY on a side whose cardinality
# is FIXED BY CONSTRUCTION: a star-schema dimension table, a 1-row / k-row
# aggregate scalar, a bounded batch (top-k dequeue, upsert delta, dirty
# refresh buckets), a benchmark-sized eval set, or a constant-size table
# (256 packing buckets, k centroids, the language-weight table). A side that
# GROWS WITH THE CORPUS — signature tables, cluster labels, vocabulary/idf,
# boilerplate digests, per-user reductions — must NOT be hinted: a forced
# broadcast of a corpus-sized table materializes the corpus on every
# executor at 100x scale. Leave those joins plain and AQE broadcasts them
# while genuinely small, falling back to a shuffled join when not.
#
# tests/test_plans.py::test_broadcast_hints_are_allowlisted enforces this
# mechanically: every `F.broadcast(` call site in the library must appear
# here with a justification naming why the build side is bounded. Adding a
# hint without recording its bound fails the suite.
# --- collected-list invariant -----------------------------------------------
# collect_list folds a whole group into ONE aggregation-buffer row, built by
# one task. That is safe only when the list length is BOUNDED BY CONSTRUCTION:
# array dimension (64-dim centroid pairs), a pre-applied rank/top-k filter, a
# single document's own tokens/windows/spans, a fixed report head, or
# partitions x k partial rows. A list that grows with the CORPUS (a full
# posting list, every distinct bigram, per-user event history) concentrates
# corpus-sized state in one buffer and, if then broadcast, on every executor.
# The ONE sanctioned corpus-coupled case is q114's unigram vocabulary map:
# vocabulary growth follows Heaps' law V ~ K * N^b with b ~ 0.4-0.6 observed
# on web corpora, so at 100 TB (~2.5e13 tokens, K~30, b~0.5) V is O(1.5e8)
# terms — a few GB as a map, the documented ceiling of that design; its
# BIGRAM analogue has no such sublinear bound and was rebuilt as joins (q151).
#
# tests/test_plans.py::test_collect_list_sites_are_bounded enforces this the
# same way as the broadcast allowlist: every `collect_list(` call site in the
# library must appear here with its recorded bound.
COLLECT_LIST_ALLOWLIST: dict[tuple[str, str], str] = {
    ("queries/relational.py",
     'F.expr("transform(array_sort(collect_list(struct(rk, lx))), s -> s.lx)")'):
        "rank-bounded: exactly k+1=201 top order statistics, pre-limited "
        "by TakeOrderedAndProject (q253 Hill estimator)",
    ("queries/sampling.py",
     'F.array_sort(F.collect_list(F.struct("m", "r"))).alias("a"),'):
        "replicate-bounded: exactly R=40 bootstrap replicate means folded "
        "into the 1-row interval frame (q239)",
    ("queries/sampling.py",
     'F.collect_list(F.struct("b", "v"))  # <= B=256 bucket pairs'):
        "codomain-bounded: <= 256 (bucket, contribution) pairs per doc — "
        "the 2-hex-char md5 bucket codomain (q219 DSIR ordered fold)",
    ("queries/similarity.py",
     'F.array_sort(F.collect_list(F.struct("pos", "mx"))),'):
        "dim-bounded: 64 (pos, mean) pairs per centroid row (q322)",
    ("queries/similarity.py",
     'F.array_sort(F.collect_list(F.struct("li", "lj", "cst"))),'):
        "label^2-bounded: 100 cost-matrix cells folded into the 1-row "
        "Sinkhorn state (q322)",
    ("queries/similarity.py",
     "F.array_sort(F.collect_list(F.struct(F.col(\"label\"), F.col(\"p\")))),"):
        "label-bounded: 10 marginal shares folded to one ordered array "
        "(q322)",
    ("queries/similarity.py",
     "F.array_sort(F.collect_list(F.struct(F.col(\"label\"), F.col(\"q\")))),"):
        "label-bounded: 10 marginal shares folded to one ordered array "
        "(q322)",
    ("queries/similarity.py",
     "F.array_sort(F.collect_list(F.struct(F.col(\"pos\"), F.col(\"m\")))),"):
        "dim-bounded: 64 (pos, mean) pairs per centroid row (_ivf_centroids)",
    ("queries/similarity.py",
     "F.collect_list(F.struct(F.col(\"pos\"), F.col(\"mean_x\")))"):
        "dim-bounded: 64 (pos, mean) pairs per centroid row (q73)",
    ("queries/similarity.py",
     "F.array_sort(F.collect_list(F.struct(F.col(\"pos\"), F.col(\"mean_x\")))),"):
        "dim-bounded: 64 (pos, mean) pairs per centroid row (q74)",
    ("queries/similarity.py",
     'F.expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)").alias("c")'):
        "dim-bounded: 64 codebook components per (subspace, code) row (q127)",
    ("queries/similarity.py",
     'F.expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)").alias("c")'):
        "dim-bounded: 64 centroid components per label row (q140/q154)",
    ("queries/similarity.py",
     'F.expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)").alias("c2")'):
        "dim-bounded: 64 centroid components per label row (q140 update)",
    ("queries/corpus.py",
     'F.collect_list(F.when(F.col("rk") <= 20, F.col("doc_id")))'):
        "rank-bounded: per-term row_number <= 20 applied BEFORE the collect "
        "(q109 posting head — hot-term lists never materialize)",
    ("queries/corpus.py",
     'F.array_sort(F.collect_list(F.struct("decile", "x", "y"))).alias("a"),'):
        "codomain-bounded: exactly 10 decile points folded into the 1-row "
        "Heaps regression frame (q316, the q141 ordered-fold discipline)",
    ("queries/corpus.py",
     'F.map_from_entries(F.collect_list(F.struct("term", "c"))).alias("vmap"),'):
        "Heaps-bounded: unigram vocabulary V ~ K*N^0.5 — O(1.5e8) terms / a "
        "few GB at 100 TB, the documented ceiling of q114's map design; the "
        "corpus-linear bigram analogue is FORBIDDEN and was rebuilt as "
        "window-count + join (q151)",
    ("queries/corpus.py",
     'F.array_sort(F.collect_list(F.struct("start_offset", "text"))),'):
        "doc-bounded: one document's 512-token chunks per row (q120)",
    ("queries/corpus.py",
     'F.array_sort(F.collect_list(F.struct("pos", "tok"))),'):
        "doc-bounded: one document's chunk tokens per row (q212 fold)",
    ("queries/corpus.py",
     'F.collect_list(F.struct("source", "cnt")).alias("srcs"),'):
        "source-bounded: <= |sources| (the bounded source dimension, the "
        "q212 rollup key) per-source counts folded per digest so the "
        "census is consumed once instead of re-joining the chunk stream",
    ("queries/corpus.py",
     'F.sort_array(F.collect_list(F.when(F.col("rk") <= 20, F.col("doc_id")))).alias("head"),'):
        "rank-bounded: per-term row_number <= 20 applied BEFORE the collect "
        "(q217 partial-index posting head — the mergeable min-20 summary)",
    ("queries/corpus.py",
     'F.array_sort(F.collect_list(F.struct("rk", "x", "y"))).alias("a"),'):
        "head-bounded: top-30 zipf ranks, pre-limited by TakeOrdered (q141)",
    ("queries/corpus.py",
     '.agg(F.sort_array(F.collect_list(F.struct("i", "ll"))).alias("terms"))'):
        "doc-bounded: one document's bigram positions per row (q151 fold)",
    ("queries/text.py",
     'F.transform(F.array_sort(F.collect_list(kept_struct)), lambda s: s["wtext"]),'):
        "doc-bounded: one document's shingle windows per row (q128)",
    ("queries/text.py", 'F.array_sort(F.collect_list(F.struct("s", "e"))),'):
        "doc-bounded: one document's merged duplicate spans per row (q142)",
    ("queries/text.py",
     'swl = head.agg(F.sort_array(F.collect_list("term")).alias("sw"))'):
        "head-bounded: top-25 stopword terms, pre-limited by TakeOrdered "
        "(q158)",
    ("queries/similarity.py",
     'F.array_sort(F.collect_list(F.struct("rn", "vec_id"))),'):
        "rank-bounded: per-probe row_number <= 5 applied BEFORE the collect "
        "(q220 approx-id list)",
    ("operators/clustering.py",
     'F.collect_list("s"), zero, lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b)'):
        "partition-bounded: <= one k x dim partial-sum row per Arrow batch "
        "per cell, folded to a dim-length array (kmeans_train round reduce)",
    ("operators/linalg.py",
     "F.collect_list(col), zero, lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b)"):
        "partition-bounded: exactly one moment-partial row per partition "
        "(dim + dim^2 doubles each), folded to O(dim^2) model state "
        "(second_moments reduce)",
    ("queries/sampling.py", '.agg(F.sort_array(F.collect_list("mx")).alias("cs"))'):
        "tile-bounded: exactly 7 split points from the fixed 512-row "
        "planner sample (q278)",
    ("queries/sessions.py",
     'F.sort_array(F.collect_list(F.struct("dom", resid.alias("r")))).alias('):
        "day-bounded: <= 31 residual rows per event type (q281 exact "
        "variance fold)",
    ("queries/sessions.py",
     'F.sort_array(F.collect_list(F.struct("dom", "y"))).alias("dy")'):
        "day-bounded: <= 366 daily-census rows per year (q283 Holt "
        "recursion input)",
    ("queries/text.py",
     'F.sort_array(F.collect_list(F.struct("bin", "n", "s", "dd"))).alias("terms"),'):
        "bin-bounded: exactly <= 10 score-decile rows (q285 Brier "
        "decomposition fold)",
    ("queries/text.py",
     'F.sort_array(F.collect_list(F.struct("source", "n", "x"))).alias("terms"),'):
        "source-bounded: |sources| census rows (q289 beta-binomial "
        "moment fold)",
    ("queries/similarity.py",
     'F.sort_array(F.collect_list(F.struct("dim", "n", "s1", "s2"))).alias("ds")'):
        "dimension-bounded: exactly |dim|=64 moment rows (q292 "
        "Mahalanobis stats)",
    ("queries/corpus.py",
     'one = xs.agg(F.sort_array(F.collect_list(F.struct("d", "x"))).alias("dx")).select('):
        "grid-bounded: exactly 100 depth-census rows (q294 RBO fold "
        "input)",
    ("queries/sessions.py",
     'F.collect_list(F.struct("a", "b", "c_ab", "c_a"))'):
        "type-bounded: |types|^2 transition cells (q303 entropy fold)",
    ("queries/sessions.py",
     'F.sort_array(F.collect_list(F.struct("b", "c_b"))).alias("mterms"),'):
        "type-bounded: |types| marginal cells (q303 entropy fold)",
    ("queries/similarity.py",
     'F.collect_list(F.struct("dim", F.col("s_dec").cast("double").alias("s")))'):
        "dimension-bounded: exactly |dim|=64 component sums per label / "
        "total (q312 separability)",
    ("queries/similarity.py",
     'F.collect_list(F.struct("dim", F.col("sd").cast("double").alias("s")))'):
        "dimension-bounded: exactly |dim|=64 total component sums "
        "(q312 separability)",
}

BROADCAST_ALLOWLIST: dict[tuple[str, str], str] = {
    # (r14: the q338 bounds broadcast is gone — bounds became window
    # aggregates over the same footer-walk stream, one walk instead of two)
    ("operators/dedup.py", 'F.broadcast(over.select("band_idx", "band_sig")),'):
        "over-cap bucket census: rows = flood buckets only (zero on every "
        "non-flooded corpus, a handful under attack) — the r10 shared-census "
        "escalation set (_escalated_fps)",
    ("operators/dedup.py", 'nn.join(F.broadcast(over), ["band_idx", "band_sig"], "left_anti")'):
        "same over-cap census as anti-join cap filter (escalate=False path); "
        "bounded by flood-bucket count, not corpus",
    ("operators/dedup.py", 'l1 = _l1(nn.join(F.broadcast(over), ["band_idx", "band_sig"], "left_anti"))'):
        "same over-cap census, escalation path cap filter — probe proved it "
        "non-empty but it is still only the flood buckets",
    ("queries/sessions.py", 'hourly.join(F.broadcast(profile), "hod")'):
        "24-row hour-of-day seasonal profile table (q257)",
    ("queries/sessions.py", "a.crossJoin(F.broadcast(lags))"):
        "7-row lag frame over the |days|-row daily-count table (q258 ACF)",
    ("queries/sessions.py", "F.broadcast(b),"):
        "|days|-row daily-count table, self-joined at lag offsets "
        "(q258 ACF)",
    ("queries/sessions.py", 'pairs = a.join(F.broadcast(b), "event_type").filter('):
        "|types| x |days| daily-count table, all-pairs slope self-join "
        "(q269 Theil-Sen; bounded by the retention window)",
    ("queries/sessions.py", ".crossJoin(F.broadcast(tot))"):
        "1-row funnel stage-totals scalar (q271 conversion lag)",
    ("queries/similarity.py", "pairs = a.crossJoin(F.broadcast(b)).select("):
        "|labels|-row centroid table self-crossed to the L x L cost "
        "matrix (q322 Sinkhorn ground cost; L = 10 cells)",
    ("queries/similarity.py", "halves.crossJoin(F.broadcast(tot))"):
        "1-row half-corpus totals scalar attached to the |labels|-row "
        "marginal table (q322)",
    ("queries/similarity.py", "st = cmat.crossJoin(F.broadcast(marg)).select("):
        "1-row x 1-row Sinkhorn state assembly (q322 model state)",
    ("queries/queue.py", "cum.crossJoin(F.broadcast(p0t))"):
        "1-row week-1 baseline-rate scalar on the |days|-row GST frame "
        "(q324, the q250 pattern)",
    ("queries/relational.py", "qi.crossJoin(F.broadcast(ks))"):
        "3-row k-threshold frame over the QI-group table (q260 "
        "k-anonymity)",
    ("queries/relational.py", 'gd.join(F.broadcast(glob), "d")'):
        "10-row global sensitive-digit census joined to the (QI, digit) "
        "count table (q317 t-closeness)",
    ("queries/relational.py", ".crossJoin(F.broadcast(tot))"):
        "1-row corpus-total scalar attached to the QI-group frame "
        "(q317 t-closeness common denominator)",
    ("queries/relational.py", "tv.crossJoin(F.broadcast(th))"):
        "3-row t-threshold frame over the |QI groups|-row distance table "
        "(q317 t-closeness, the q260 shape)",
    ("queries/corpus.py", "q = dims.crossJoin(F.broadcast(bounds)).select("):
        "1-row global min/max bounds scalar for 4-bit quantization "
        "(q259 z-order, the q255 pattern)",
    ("queries/text.py", 'scored = d.join(F.broadcast(pred), "source").select('):
        "|sources|-row calibration predictor table (q243 conformal)",
    ("queries/text.py", "cum.crossJoin(F.broadcast(caln))"):
        "1-row calibration-count scalar (q243 conformal)",
    ("queries/text.py", ".crossJoin(F.broadcast(qhat))"):
        "1-row conformal-threshold scalar (q243 conformal)",
    ("queries/text.py", "return caln.crossJoin(F.broadcast(test)).select("):
        "1-row test-coverage fold joined to the 1-row calibration count "
        "(q243 conformal)",
    ("queries/sampling.py", "t = d.crossJoin(F.broadcast(bounds)).select("):
        "1-row doc_id min/max bounds scalar for range bucketing (q255, "
        "the q208 pattern)",
    ("queries/sampling.py", 'local.join(F.broadcast(offsets), "bucket")'):
        "256-row bucket-head prefix-sum offset table (q255 two-level "
        "prefix sum, level 2)",
    ("queries/queue.py", "walk = daily.crossJoin(F.broadcast(p0t)).select("):
        "1-row baseline error-rate scalar (q250 SPRT)",
    ("queries/queue.py", "idx.join(F.broadcast(base))"):
        "1-row (mu, sigma) baseline scalar over the day frame (q266 EWMA)",
    ("queries/sampling.py", "lr = cen.crossJoin(F.broadcast(tots)).select("):
        "1-row token-totals scalar for the DSIR smoothing denominators "
        "(q249, the q219 pattern)",
    ("queries/sampling.py", 'w = lw.join(F.broadcast(norm), "source").select('):
        "|sources|-row per-source max-log-weight table (q249 log-sum-exp "
        "normalizer)",
    ("queries/sampling.py", "return folds.crossJoin(F.broadcast(point)).select("):
        "1-row point-estimate scalar joined to the 1-row replicate fold "
        "(q239 Poisson bootstrap)",
    ("queries/corpus.py", '.join(F.broadcast(s), "source")'):
        "|sources|-row token totals: bounded dimension (q237 log-odds)",
    ("queries/corpus.py", ".crossJoin(F.broadcast(g))"):
        "1-row global token count scalar (q237 log-odds)",
    ("streaming/pipeline.py", 'return events.join(F.broadcast(dim), on, "inner")'):
        "stream-static dim lookup: dim table is fixed-cardinality by contract",
    ("streaming/pipeline.py",
     'b = tagged.join(F.broadcast(cuts), "event_type", "left").select('):
        "reference decile table: |event types| x 9 values, bounded "
        "dimension (batch_value_psi)",
    ("operators/layout.py", "with_key = df.crossJoin(F.broadcast(stats)).withColumn("):
        "1-row min/max stats scalar for Z-order key scaling",
    ("operators/mutation.py",
     'kept = current.join(F.broadcast(updates.select(*key_cols)), key_cols, "left_anti")'):
        "upsert delta batch: bounded by the write batch, not the table",
    ("operators/skew.py", 'salted_big.join(F.broadcast(replicated), [key, "__salt"]).drop("__salt")'):
        "salted-join small side: replicated dim, small by the operator's contract",
    ("queries/relational.py", "return exact.crossJoin(F.broadcast(est)).select("):
        "1-row sampled-estimator scalar attached to the 1-row exact fold "
        "(q229 join-cardinality estimate-beside-exact)",
    ("queries/relational.py", '.join(F.broadcast(customer), F.col("user_id") == F.col("c_custkey"))'):
        "customer dim enrich (q13)",
    ("queries/relational.py",
     'customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))'):
        "nation dim: 25 rows",
    ("queries/relational.py", '.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))'):
        "region dim: 5 rows",
    ("queries/relational.py", 'F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")'):
        "nation dim: 25 rows",
    ("queries/relational.py", ').join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))'):
        "region dim: 5 rows",
    ("queries/relational.py", "per_key.crossJoin(F.broadcast(stats))"):
        "1-row skew stats scalar (q118)",
    ("queries/relational.py", "s = exact.crossJoin(F.broadcast(approx))"):
        "1-row sketch/min-max/null stats scalar: second ANALYZE pass "
        "(q183)",
    ("queries/relational.py", "stats.crossJoin(F.broadcast(heavy))"):
        "1-row heavy-key count scalar (q118)",
    ("queries/dedup.py", 'train_b.join(F.broadcast(eval_b), ["band_idx", "band_sig"])'):
        "fuzzy decontamination eval side: benchmark-sized, bounded (q133)",
    ("queries/dedup.py",
     'F.broadcast(name_agree), ["key", "name_lo", "name_hi"], "left"'):
        "per-key distinct-name-pair agreement lookup: bounded by the name "
        "vocabulary squared, not the record count (q267 FS scoring)",
    ("queries/dedup.py", "s.crossJoin(F.broadcast(t))"):
        "1-row true-pair count scalar (q168 audit report)",
    ("queries/dedup.py", ".crossJoin(F.broadcast(c))"):
        "1-row candidate-pair count scalar (q168 audit report)",
    ("queries/dedup.py", ".crossJoin(F.broadcast(g))"):
        "1-row caught-pair count scalar (q168 audit report)",
    ("queries/dedup.py", "per.crossJoin(F.broadcast(g))"):
        "1-row shard balance stats scalar (q177)",
    ("queries/text.py", ".crossJoin(F.broadcast(n_docs))"):
        "1-row corpus count scalar for idf (q84)",
    ("queries/text.py", 'train.join(F.broadcast(eval_fps), "fp")  # bounded: eval benchmark side'):
        "fingerprint decontamination eval side: benchmark-sized (q139)",
    ("queries/text.py", 'sa = F.broadcast(sizes.select(F.col("lang").alias("lang_a"), F.col("n").alias("n_terms_a")))'):
        "language census: |langs| rows, bounded dimension (q149)",
    ("queries/text.py", 'sb = F.broadcast(sizes.select(F.col("lang").alias("lang_b"), F.col("n").alias("n_terms_b")))'):
        "language census: |langs| rows, bounded dimension (q149)",
    ("queries/text.py", "agg.crossJoin(F.broadcast(d))"):
        "1-row corpus doc-count scalar (q150)",
    ("queries/text.py", ".crossJoin(F.broadcast(swl))"):
        "1-row top-25 stopword array, head-bounded (q158)",
    ("queries/text.py", ").crossJoin(F.broadcast(thr))"):
        "1-row global quality-quantile scalar (q169)",
    ("queries/text.py", "j = per.crossJoin(F.broadcast(tot))"):
        "1-row global-sums scalar: Welch complement moments (q174)",
    ("queries/text.py", ".crossJoin(F.broadcast(g))"):
        "1-row global precision/recall scalar (q175)",
    ("queries/text.py", "b = d.crossJoin(F.broadcast(cuts)).select("):
        "1-row 9-value reference-decile array (q180)",
    ("queries/text.py", "sh = per.crossJoin(F.broadcast(tot)).select("):
        "1-row ref/incoming totals scalar (q180)",
    ("queries/text.py", "sh.crossJoin(F.broadcast(psi))"):
        "1-row PSI total scalar (q180)",
    ("queries/text.py", "return full.crossJoin(F.broadcast(samp)).select("):
        "1-row sampled-dedup stats scalar (q216)",
    ("queries/text.py", ".crossJoin(F.broadcast(tot))"):
        "1-row vocab/token totals scalar (q182)",
    ("queries/queue.py", 'events.join(F.broadcast(batch), "event_id", "left_semi")'):
        "two-phase mark batch: top-100 dequeue slice (q52)",
    ("queries/queue.py", "t = events.crossJoin(F.broadcast(bounds)).select("):
        "1-row event_id min/max bounds scalar: 256-way order-preserving "
        "bucketing for the two-level prefix max (q208)",
    ("queries/queue.py", 'local.join(F.broadcast(offsets), "bucket")'):
        "256-row chunk-head prior-max table (q208 two-level prefix max)",
    ("queries/sampling.py", 'scored.join(F.broadcast(cum), "q")'):
        "per-score cumulative-population table: <= 10001 rows (the rounded "
        "quality score's codomain), value-bounded dimension (q144)",
    ("queries/sampling.py", ".crossJoin(F.broadcast(tot))"):
        "1-row corpus-count scalar: ntile boundary ranks (q144)",
    ("queries/sampling.py", ".crossJoin(F.broadcast(tots))"):
        "1-row token-total scalar pair: DSIR smoothing denominators "
        "(q219; re-aggregated from the B-bounded bucket census)",
    ("queries/dedup.py", ").crossJoin(F.broadcast(nd))"):
        "1-row distinct-fingerprint count scalar (q233 jackknife)",
    ("queries/dedup.py", ".crossJoin(F.broadcast(tot))"):
        "1-row (n_total, n_distinct) scalar pair attached to the 10-row "
        "decile replicate frame (q233 jackknife)",
    ("queries/dedup.py", "reps.crossJoin(F.broadcast(mean))"):
        "1-row replicate-mean scalar over the 10-row frame (q233 "
        "jackknife sum of squares)",
    ("queries/sessions.py", ".crossJoin(F.broadcast(tot))"):
        "1-row gap-population total: Kaplan-Meier initial risk set "
        "(q235; attached to the fixed 24-row hour grid)",
    ("queries/sessions.py", ".crossJoin(F.broadcast(k))"):
        "1-row event-type-count scalar: uniform baseline (q188)",
    ("queries/tpch_extra.py", '.join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc.n_nationkey"))'):
        "nation dim: 25 rows",
    ("queries/tpch_extra.py", '.join(F.broadcast(region), F.col("nc.n_regionkey") == F.col("r_regionkey"))'):
        "region dim: 5 rows",
    ("queries/tpch_extra.py", '.join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns.n_nationkey"))'):
        "nation dim: 25 rows",
    ("queries/tpch_extra.py", '.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))'):
        "nation dim: 25 rows",
    ("queries/tpch_extra.py", 'rev.join(F.broadcast(top), F.col("total_revenue") == F.col("max_rev"))'):
        "1-row max-revenue scalar (q95)",
    ("queries/tpch_extra.py", 'supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))'):
        "nation dim: 25 rows (q273/q275)",
    ("queries/tpch_extra.py", '.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))'):
        "region dim: 5 rows (q273/q275)",
    ("queries/tpch_extra.py", 's2 = supp.join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))'):
        "nation dim filtered to the 2 flow nations (q274)",
    ("queries/tpch_extra.py", 'c2 = cust.join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))'):
        "nation dim filtered to the 2 flow nations (q274)",
    ("queries/tpch_extra.py", "val.crossJoin(F.broadcast(tot))"):
        "1-row per-part-value grand-total scalar (q275)",
    ("queries/corpus.py", ".crossJoin(F.broadcast(tt))"):
        "1-row bigram-type-total scalar (q277 Kneser-Ney continuation "
        "denominator)",
    ("queries/sampling.py", "assigned = orders.crossJoin(F.broadcast(cuts)).select("):
        "1-row 7-element split-point array scalar (q278 range planner)",
    ("queries/corpus.py", ".crossJoin(F.broadcast(nn))"):
        "1-row bigram-occurrence-total scalar (q284 G-test)",
    ("queries/relational.py", "zones.crossJoin(F.broadcast(probes))"):
        "3-row probe date-range frame (q286 zone-map audit)",
    ("queries/relational.py", "F.broadcast(probes),"):
        "3-row probe date-range frame, range-joined to the scan for the "
        "exact-match recount (q286 zone-map audit)",
    ("queries/text.py", "src.crossJoin(F.broadcast(prior))"):
        "1-row fitted beta-prior scalar (q289 EB shrinkage)",
    ("queries/sessions.py", "adj = per_user.crossJoin(F.broadcast(theta)).select("):
        "1-row pooled (theta, mean-X) scalar (q290 CUPED)",
    ("queries/dedup.py", "gsize.crossJoin(F.broadcast(leak))"):
        "1-row leak-audit count scalar (q291 GroupKFold; structurally 0)",
    ("queries/similarity.py", "emb.crossJoin(F.broadcast(stats))"):
        "1-row (mu[dim], sd[dim]) moment-array scalar (q292 Mahalanobis)",
    ("queries/text.py", "per.crossJoin(F.broadcast(pooled))"):
        "1-row pooled-moments scalar (q297 Simpson screen)",
    ("queries/sampling.py", "quotas = src.crossJoin(F.broadcast(tot)).select("):
        "1-row corpus-total scalar (q299 apportionment)",
    ("queries/text.py", "resid = scored.crossJoin(F.broadcast(fit)).select("):
        "1-row OLS-fit scalar (q300 residualization)",
    ("queries/sessions.py", "scored = per_user.crossJoin(F.broadcast(cuts)).select("):
        "1-row quintile-cuts scalar (q301 RFM)",
    ("queries/sessions.py", "per.crossJoin(F.broadcast(grid))"):
        "1-row hour-grid-size scalar (q302 Fano)",
    ("queries/sessions.py", "one.crossJoin(F.broadcast(onem))"):
        "1-row marginal-entropy list frame (q303; |types| bounded)",
    ("queries/sessions.py", "tagged = bounds.crossJoin(F.broadcast(brange)).select("):
        "1-row time-span min/max scalar (q304 chunk bucketing)",
    ("queries/sessions.py", 'run = local.join(F.broadcast(offsets), "chunk").select('):
        "256-row chunk-offset head table (q304 two-level prefix sum)",
    ("queries/sessions.py", 'pairs.join(F.broadcast(pa), "a")'):
        "|types|-row basket census (q305 lift)",
    ("queries/sessions.py", '.join(F.broadcast(pb), "b")'):
        "|types|-row basket census (q305 lift)",
    ("queries/sessions.py", ".crossJoin(F.broadcast(nb))"):
        "1-row basket-total scalar (q305 lift)",
    ("queries/corpus.py", 'x.join(F.broadcast(y), F.col("did_x") < F.col("did_y"))'):
        "100-row shared ranked list, self-paired for concordance counting "
        "(q306 Kendall; bounded by the TakeOrdered list depth)",
    ("queries/corpus.py", "return pairs.crossJoin(F.broadcast(nn)).select("):
        "1-row shared-list-size scalar (q306 Kendall)",
    ("queries/relational.py", "g_rows = g_exact.crossJoin(F.broadcast(g_est)).select("):
        "1-row global sketch-estimate scalar (q307 cube)",
    ("queries/similarity.py", ".crossJoin(F.broadcast(stot))"):
        "1-row 64-length total component-sum array scalar (q312)",
    ("queries/similarity.py", ".crossJoin(F.broadcast(tot))"):
        "1-row (N, Q_tot) scalar (q312)",
    ("queries/analytics.py", 'F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING")),'):
        "customer dim, segment-filtered (q41)",
    ("queries/analytics.py",
     'nation.join(F.broadcast(region.filter(F.col("r_name") == "ASIA")), '
     'F.col("n_regionkey") == F.col("r_regionkey"))'):
        "region dim: 5 rows (q42)",
    ("queries/analytics.py", '.join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))'):
        "customer dim (q42)",
    ("queries/analytics.py", '.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))'):
        "supplier dim (q42)",
    ("queries/analytics.py", '.join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))'):
        "nation dim, region-filtered (q42)",
    ("queries/analytics.py", 'orders.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))'):
        "customer dim (q43)",
    ("queries/analytics.py", "F.broadcast(filtered),"):
        "q44 EXISTS probe side: fixed 3-month order window, the bounded slice by design",
    ("queries/analytics.py",
     'joined = orders.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))'):
        "customer dim (q45)",
    ("queries/analytics.py", 'supp = supplier.join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))'):
        "nation dim, filtered (q46)",
    ("queries/analytics.py", 'cust = customer.join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))'):
        "nation dim, filtered (q46)",
    ("queries/analytics.py", '.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))'):
        "supplier dim pre-joined to nation (q46)",
    ("queries/analytics.py", '.join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))'):
        "customer dim pre-joined to nation (q46)",
    ("queries/analytics.py", "customer.join(F.broadcast(avg_bal))"):
        "1-row avg balance scalar (q20)",
    ("queries/analytics.py",
     '.join(F.broadcast(part.select("p_partkey", "p_type")), F.col("p_partkey") == F.col("l_partkey"))'):
        "part dim, pruned to 2 columns (q47)",
    ("queries/analytics.py",
     'F.broadcast(customer.select("c_custkey", "c_name", "c_nationkey", "c_acctbal")),'):
        "customer dim, pruned (q48)",
    ("queries/analytics.py", '.join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))'):
        "nation dim: 25 rows (q48)",
    ("queries/analytics.py",
     '.join(F.broadcast(customer.select("c_custkey", "c_name")), F.col("c_custkey") == F.col("o_custkey"))'):
        "customer dim, pruned (q49)",
    ("queries/analytics.py", 'stored.join(F.broadcast(touched), "bucket", "left_semi")'):
        "dirty refresh buckets: bounded by the incoming batch's hour span (q126)",
    ("queries/corpus.py", 'train.join(F.broadcast(eval_grams), "gram")'):
        "exact decontamination eval gram set: benchmark-sized (q106)",
    ("queries/corpus.py", 'local.join(F.broadcast(offsets), "bucket")'):
        "256-row packing bucket offsets (q107)",
    ("queries/corpus.py", 'tf.join(F.broadcast(df_), "term")'):
        "per-query-term df stats: |terms| rows (q108)",
    ("queries/corpus.py", ".crossJoin(F.broadcast(stats))"):
        "1-row N/avgdl scalar (q108)",
    ("queries/corpus.py", 'avail.join(F.broadcast(w), "lang")'):
        "language weight table: 5 rows (q113)",
    ("queries/corpus.py", ".crossJoin(F.broadcast(query))"):
        "1-row query embedding (q200): dim-bounded model state",
    ("queries/corpus.py", "docs.crossJoin(F.broadcast(m))"):
        "1-row unigram vocab map + total (q114): Heaps-bounded V ~ K*N^0.5, "
        "O(GB) at 100 TB — see the COLLECT_LIST_ALLOWLIST vmap entry for "
        "the full bound; the corpus-linear bigram analogue is forbidden",
    ("queries/corpus.py", 'placed = local.join(F.broadcast(offsets), "bucket").select('):
        "256-row packing bucket offsets (q115)",
    ("queries/corpus.py", "return folded.crossJoin(F.broadcast(totals)).select("):
        "1-row vocab-size/token-total scalar (q141)",
    ("queries/corpus.py", "s = t.crossJoin(F.broadcast(tot)).select("):
        "1-row corpus token-total scalar (q143)",
    ("queries/corpus.py", "return s.crossJoin(F.broadcast(z)).select("):
        "1-row mixture-weight normalizer scalar (q143)",
    ("queries/corpus.py", ".crossJoin(F.broadcast(tot))"):
        "1-row unigram/bigram-total scalar (q148)",
    ("queries/corpus.py", ".crossJoin(F.broadcast(vt))"):
        "1-row vocab-size scalar (q151); the bigram/unigram COUNTS are "
        "never hinted — window count over (a, b) and a plain vocab join",
    ("queries/corpus.py", '.join(F.broadcast(eval_grams), "gram")'):
        "eval gram set: benchmark-sized (q124)",
    ("queries/corpus.py", "exact.crossJoin(F.broadcast(tot))"):
        "1-row total-token-count scalar: the heavy-hitter support "
        "threshold (q163)",
    ("queries/corpus.py", "src.crossJoin(F.broadcast(tot))"):
        "1-row corpus-total/source-count scalar (q167)",
    ("queries/corpus.py", "srt.crossJoin(F.broadcast(th))"):
        "1-row waterfilling level scalar (q167)",
    ("queries/corpus.py", "per.crossJoin(F.broadcast(tot))"):
        "1-row budget-totals scalar (q215 epoch schedule)",
    ("queries/corpus.py", "member_probe.crossJoin(F.broadcast(neg_probe))"):
        "1-row negative-probe census scalar (q190)",
    ("queries/corpus.py", "counts.crossJoin(F.broadcast(nd))"):
        "1-row document-count scalar: the a-priori support bar (q194)",
    ("queries/corpus.py", 'return local.join(F.broadcast(offsets), "bucket").select('):
        "256-row packing bucket offsets (q124)",
    ("queries/similarity.py", ".crossJoin(F.broadcast(query))"):
        "1-row query vector (q70/q74)",
    ("queries/similarity.py", "centroids.crossJoin(F.broadcast(query))"):
        "1-row query vector (q74)",
    ("queries/similarity.py", '.join(F.broadcast(best), "label")'):
        "1-row routed-cell id (q74)",
    ("queries/similarity.py", 'emb.join(F.broadcast(top), "vec_id")'):
        "10-row top-k slice for the exact-cosine re-rank (q127)",
    ("queries/similarity.py", 'vecs.join(F.broadcast(centroids), "label")'):
        "k-row centroid table (q132)",
    ("queries/similarity.py", 'a.join(F.broadcast(b), F.col("label") != F.col("nearest_label"))'):
        "k-row centroid table self-pairing (q132)",
    ("queries/similarity.py", "scored = vecs.crossJoin(F.broadcast(cent)).select("):
        "k-row centroid table: Lloyd-step scoring side, k fixed by design (q140)",
    ("queries/similarity.py", "vecs.crossJoin(F.broadcast(probes))"):
        "5-row fixed probe set: recall-audit ground-truth scoring (q154)",
    ("queries/similarity.py", "route_scored = probes.crossJoin(F.broadcast(cent)).select("):
        "k-row centroid table: probe routing side (q154)",
    ("queries/similarity.py", "F.broadcast(best),"):
        "5-row probe->cell routing table (q154)",
    ("queries/similarity.py", "agg.crossJoin(F.broadcast(tot))"):
        "1-row total-distortion scalar (q176)",
    ("queries/similarity.py", "vecs.crossJoin(F.broadcast(probes))"):
        "8-row fixed probe set: hard-negative mining scoring side (q213)",
    ("queries/similarity.py", 'cand = sig.join(F.broadcast(pb), "bucket").filter('):
        "45-row probe-bucket key set (5 probes x 9 multi-probe buckets, "
        "fixed by construction — q220)",
    ("queries/similarity.py", 'sig.crossJoin(F.broadcast(probes.select("probe_id", "pv")))'):
        "5-row fixed probe set: brute-force truth side of the recall "
        "audit (q220)",
}
