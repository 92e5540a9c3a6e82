#!/usr/bin/env python3
"""Invariant-based correctness AT SCALE for the queries whose DuckDB
oracles are infeasible at sf1 (round-10 verdict task #2): every query the
sf1 oracle sweep excludes gets a Spark-side or pure-Python INDEPENDENT
check here, so "oracle infeasible" no longer means "unverified at scale".

Check classes, strongest first:
  - full independent replay in pure Python over the collected graph/edge
    tables (connected components, k-core peeling, triangles, clustering
    coefficients, assortativity, pagerank, brute-force ANN truth) — the
    DuckDB-oracle idea with Python as the second engine, feasible because
    the GRAPHS are small even when the corpora are not;
  - sampled pure-Python re-derivation from raw text (minhash band
    signatures, exact shingle Jaccard/containment) — bit-level replay of
    the hashing pipeline on a deterministic sample;
  - Spark-side cross-query / structural invariants (q67 == the naive
    banded self-join built from q82's own output; every q67 edge lands
    intra-cluster in q79; q68-verified pairs above tau are contained in
    q222's exact AllPairs output; q171's verdict is a pure function of
    its rung flags; q212/q220 arithmetic identities).

Output: ONE JSON line {"metric": "scale_invariants", "checks": {...},
"pass": N, "fail": [...]} — merged with the oracle sweep into
CORRECTNESS_sf1_r11.json.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hive_backend_spark.registry import all_queries
from hive_backend_spark.session import get_spark

SF1 = os.environ.get("SCALE_SF1", "/root/repo/.scaledata/sf1")
_WS = re.compile(r"\s+")


def _r(x: float, k: int) -> float:
    """HALF_UP rounding for nonnegative x — Spark F.round / DuckDB round
    semantics; Python's round() is half-to-even and can differ at exact
    midpoints (the q88/_pq_q8 discipline)."""
    p = 10**k
    return math.floor(x * p + 0.5) / p


def _shingles(text: str) -> set:
    toks = _WS.split(text.strip())
    if len(toks) < 3:
        return set()
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _bands_py(text: str) -> list:
    """Pure-Python replay of the minhash band pipeline (8 seeds, 4 bands
    of 2 rows, md5('{seed}|{shingle}') string-min) — the oracle algorithm
    with Python as the engine."""
    sh = _shingles(text)
    if not sh:
        return [None] * 4
    sig = [min(_md5(f"{seed}|{s}") for s in sh) for seed in range(8)]
    return [_md5(sig[2 * b] + sig[2 * b + 1]) for b in range(4)]


def check(name):
    def deco(fn):
        CHECKS.append((name, fn))
        return fn

    return deco


CHECKS: list = []


# --------------------------------------------------------------- helpers

class Ctx:
    """Shared collected state (edges, labels) so the graph checks read
    each Spark table once."""

    def __init__(self, spark, specs):
        self.spark = spark
        self.specs = specs
        self._cache: dict = {}

    def doc_edges(self):
        if "doc_edges" not in self._cache:
            rows = (
                self.specs["q67_lsh_candidates"]
                .fn(self.spark, SF1)
                .collect()
            )
            self._cache["doc_edges"] = [
                (r["doc_a"], r["doc_b"], r["n_shared_bands"]) for r in rows
            ]
        return self._cache["doc_edges"]

    def adj(self):
        if "adj" not in self._cache:
            adj = defaultdict(set)
            for a, b, _ in self.doc_edges():
                adj[a].add(b)
                adj[b].add(a)
            self._cache["adj"] = adj
        return self._cache["adj"]


# ---------------------------------------------------------------- checks

@check("q82_minhash_bands")
def _q82(ctx):
    spark, specs = ctx.spark, ctx.specs
    df = specs["q82_minhash_bands"].fn(spark, SF1)
    # (a) exactly one row per (doc, band 0..3)
    shape = df.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("band_idx").alias("nb"),
        F.min("band_idx").alias("mn"),
        F.max("band_idx").alias("mx"),
    )
    bad_shape = shape.filter(
        (F.col("n") != 4) | (F.col("nb") != 4) | (F.col("mn") != 0) | (F.col("mx") != 3)
    ).count()
    # (b) identical texts -> identical band signatures (one distinct sig
    # per (fingerprint, band) across the whole corpus)
    from hive_backend_spark.catalog import load_table

    docs = load_table(spark, SF1, "documents").select(
        "doc_id", F.md5("text").alias("fp")
    )
    fp_sig = (
        df.join(docs, "doc_id")
        .groupBy("fp", "band_idx")
        .agg(F.countDistinct(F.coalesce("band_sig", F.lit("<null>"))).alias("k"))
    )
    bad_fp = fp_sig.filter(F.col("k") != 1).count()
    # (c) sampled pure-Python re-derivation (60 deterministic docs)
    sample = (
        load_table(spark, SF1, "documents")
        .filter(F.pmod(F.col("doc_id"), F.lit(997)) < 3)
        .select("doc_id", "text")
        .limit(60)
        .collect()
    )
    got = {
        (r["doc_id"], r["band_idx"]): r["band_sig"]
        for r in df.join(
            spark.createDataFrame(
                [(r["doc_id"],) for r in sample], "doc_id bigint"
            ),
            "doc_id",
            "left_semi",
        ).collect()
    }
    mism = 0
    for r in sample:
        want = _bands_py(r["text"])
        for b in range(4):
            if got.get((r["doc_id"], b)) != want[b]:
                mism += 1
    ok = bad_shape == 0 and bad_fp == 0 and mism == 0 and len(sample) > 0
    return ok, {
        "bad_shape_docs": bad_shape,
        "fp_sig_inconsistent": bad_fp,
        "python_rederive_mismatches": mism,
        "python_rederive_docs": len(sample),
    }


@check("q67_lsh_candidates")
def _q67(ctx):
    spark, specs = ctx.spark, ctx.specs
    q67 = specs["q67_lsh_candidates"].fn(spark, SF1)
    bands = specs["q82_minhash_bands"].fn(spark, SF1).filter(
        F.col("band_sig").isNotNull()
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"), "band_idx", "band_sig"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), "band_idx", "band_sig"
    )
    naive = (
        a.join(b, ["band_idx", "band_sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    extra = q67.exceptAll(naive).count()
    missing = naive.exceptAll(q67).count()
    n = q67.count()
    return extra == 0 and missing == 0 and n > 0, {
        "pairs": n,
        "not_in_naive_self_join": extra,
        "missing_vs_naive_self_join": missing,
    }


@check("q79_dup_clusters")
def _q79(ctx):
    spark, specs = ctx.spark, ctx.specs
    df = specs["q79_dup_clusters"].fn(spark, SF1).cache()
    # (a) cluster_size is the true member count on every row
    sizes = df.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("true_n"),
        F.min("doc_id").alias("min_doc"),
    )
    bad_size = (
        df.join(sizes, "cluster_id")
        .filter(F.col("cluster_size") != F.col("true_n"))
        .count()
    )
    # (b) representative minimality: label == min member id
    bad_rep = sizes.filter(F.col("cluster_id") != F.col("min_doc")).count()
    # (c) every candidate edge is intra-cluster
    lab = df.select("doc_id", "cluster_id")
    q67 = specs["q67_lsh_candidates"].fn(spark, SF1).select("doc_a", "doc_b")
    la = lab.select(F.col("doc_id").alias("doc_a"), F.col("cluster_id").alias("ca"))
    lb = lab.select(F.col("doc_id").alias("doc_b"), F.col("cluster_id").alias("cb"))
    cross_edges = (
        q67.join(la, "doc_a").join(lb, "doc_b").filter(F.col("ca") != F.col("cb")).count()
    )
    # (d) full pure-Python connected components == the Spark labels
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for aa, bb, _ in ctx.doc_edges():
        parent.setdefault(aa, aa)
        parent.setdefault(bb, bb)
        ra, rb = find(aa), find(bb)
        if ra != rb:
            parent[ra] = rb
    comp = defaultdict(list)
    for node in parent:
        comp[find(node)].append(node)
    py_label = {}
    for members in comp.values():
        m = min(members)
        for node in members:
            py_label[node] = m
    got = {r["doc_id"]: r["cluster_id"] for r in df.select("doc_id", "cluster_id").collect()}
    py_mismatch = sum(1 for k, v in py_label.items() if got.get(k) != v)
    extra_nodes = len(set(got) - set(py_label))
    df.unpersist()
    ok = bad_size == 0 and bad_rep == 0 and cross_edges == 0 and py_mismatch == 0 and extra_nodes == 0 and len(got) > 0
    return ok, {
        "nodes": len(got),
        "bad_cluster_size_rows": bad_size,
        "non_minimal_representatives": bad_rep,
        "cross_cluster_edges": cross_edges,
        "python_cc_label_mismatches": py_mismatch,
        "nodes_not_in_python_cc": extra_nodes,
    }


@check("q227_kcore_decomposition")
def _q227(ctx):
    spark, specs = ctx.spark, ctx.specs
    from hive_backend_spark.queries.dedup import _KCORE_K, _KCORE_ROUNDS, _fp_pairs

    pairs = [(r["fp_a"], r["fp_b"]) for r in _fp_pairs(spark, SF1).select("fp_a", "fp_b").collect()]
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    census = [(0, len(adj), sum(len(v) for v in adj.values()) // 2)]
    cur = {k: set(v) for k, v in adj.items()}
    for r in range(1, _KCORE_ROUNDS + 1):
        keep = {u for u, nb in cur.items() if len(nb) >= _KCORE_K}
        cur = {
            u: {v for v in nb if v in keep} for u, nb in cur.items() if u in keep
        }
        # drop nodes that lost all neighbors only via the census count
        n_nodes = sum(1 for nb in cur.values() if nb)
        n_edges = sum(len(nb) for nb in cur.values()) // 2
        census.append((r, n_nodes, n_edges))
        cur = {u: nb for u, nb in cur.items() if nb}
    got = [
        (r["round"], r["n_nodes"], r["n_edges"])
        for r in specs["q227_kcore_decomposition"].fn(spark, SF1).orderBy("round").collect()
    ]
    return got == census and len(pairs) > 0, {
        "python_peel": census,
        "spark_peel": got,
    }


@check("q130_q287_q309_graph_stats")
def _graph(ctx):
    spark, specs = ctx.spark, ctx.specs
    adj = ctx.adj()
    edges = ctx.doc_edges()
    n_edges = len(edges)
    n_nodes = len(adj)
    n_wedges = sum(d * (d - 1) // 2 for d in map(len, adj.values()))
    tri_at = defaultdict(int)
    total_tri = 0
    for a, b, _ in edges:
        common = adj[a] & adj[b]
        for c in common:
            tri_at[c] += 1  # credited once per closing edge; see below
        total_tri += len(common)
    # each triangle is seen by all 3 of its edges: total/3 triangles; a
    # node's corner count is (times seen as the common vertex) / 1 ... a
    # triangle {x,y,z} contributes to tri_at[z] from edge (x,y), to
    # tri_at[y] from (x,z), to tri_at[x] from (y,z) -> corner counts are
    # already per-node-exact
    assert total_tri % 3 == 0
    q130 = specs["q130_triangle_census"].fn(spark, SF1).collect()[0]
    ok130 = (
        q130["n_triangles"] == total_tri // 3
        and q130["n_edges"] == n_edges
        and q130["n_nodes"] == n_nodes
        and q130["n_wedges"] == n_wedges
    )
    q287 = specs["q287_clustering_coefficients"].fn(spark, SF1).collect()
    mism287 = 0
    for r in q287:
        d = len(adj[r["doc_id"]])
        t = tri_at.get(r["doc_id"], 0)
        lcc = _r(2 * t / (d * (d - 1)), 4)
        if r["degree"] != d or r["n_triangles"] != t or abs(r["lcc"] - lcc) > 1e-9:
            mism287 += 1
    covered = {r["doc_id"] for r in q287}
    want287 = {v for v in adj if len(adj[v]) >= 2}
    q309 = specs["q309_degree_assortativity"].fn(spark, SF1).collect()[0]
    xs, ys = [], []
    for a, b, _ in edges:
        xs += [len(adj[a]), len(adj[b])]
        ys += [len(adj[b]), len(adj[a])]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    r_py = (sxy - sx * sy / n) / math.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
    ok309 = q309["n_edge_ends"] == n and abs(q309["assortativity"] - r_py) < 1e-5
    ok = ok130 and mism287 == 0 and covered == want287 and ok309 and n_edges > 0
    return ok, {
        "edges": n_edges,
        "q130_match": ok130,
        "q287_row_mismatches": mism287,
        "q287_coverage_match": covered == want287,
        "q309_match": ok309,
        "python_triangles": total_tri // 3,
        "python_assortativity": round(r_py, 6),
    }


@check("q123_pagerank_centrality")
def _q123(ctx):
    spark, specs = ctx.spark, ctx.specs
    from hive_backend_spark.queries.similarity import (
        _PR_DAMP,
        _PR_ITERS,
        q71_near_dup_pairs,
    )

    pairs = [
        (r["vec_a"], r["vec_b"])
        for r in q71_near_dup_pairs(spark, SF1).select("vec_a", "vec_b").collect()
    ]
    adj = defaultdict(list)
    for a, b in pairs:
        adj[a].append(b)
        adj[b].append(a)
    n = len(adj)
    rank = {v: 1.0 / n for v in adj}
    for _ in range(_PR_ITERS):
        contrib = defaultdict(float)
        for src, nbs in adj.items():
            share = rank[src] / len(nbs)
            for dst in nbs:
                contrib[dst] += share
        rank = {v: (1 - _PR_DAMP) / n + _PR_DAMP * contrib[v] for v in adj}
    got = {
        r["vec_id"]: r["pagerank"]
        for r in specs["q123_pagerank_centrality"].fn(spark, SF1).collect()
    }
    mism = sum(
        1 for v, want in rank.items() if v not in got or abs(got[v] - want) > 2e-6
    )
    rank_sum = sum(got.values())
    ok = (
        mism == 0
        and set(got) == set(rank)
        # each node's rank is rounded to 6 decimals, so the sum can drift
        # by up to n * 5e-7 from the exact invariant sum of 1.0
        and abs(rank_sum - 1.0) < 5e-7 * n + 1e-6
        and n > 0
    )
    return ok, {
        "nodes": n,
        "python_value_mismatches": mism,
        "node_set_match": set(got) == set(rank),
        "rank_sum": round(rank_sum, 8),
    }


@check("q222_prefix_filter_join")
def _q222(ctx):
    spark, specs = ctx.spark, ctx.specs
    from hive_backend_spark.catalog import load_table
    from hive_backend_spark.queries.dedup import _PFX_TAU

    df = specs["q222_prefix_filter_join"].fn(spark, SF1).cache()
    n = df.count()
    bad_order = df.filter(F.col("fp_a") >= F.col("fp_b")).count()
    dup_pairs = n - df.select("fp_a", "fp_b").distinct().count()
    bad_tau = df.filter(
        (F.col("jaccard") < _PFX_TAU - 1e-6) | (F.col("jaccard") > 1.0 + 1e-9)
    ).count()
    bad_docmath = df.filter(
        F.col("n_doc_pairs") != F.col("n_docs_a") * F.col("n_docs_b")
    ).count()
    # sampled pure-Python recompute of the exact Jaccard from raw text
    sample = df.orderBy(F.md5(F.concat("fp_a", "fp_b"))).limit(150).collect()
    fps = {r["fp_a"] for r in sample} | {r["fp_b"] for r in sample}
    docs = load_table(spark, SF1, "documents").select(
        F.md5("text").alias("fp"), "text"
    )
    texts = {
        r["fp"]: r["text"]
        for r in docs.join(
            spark.createDataFrame([(f,) for f in fps], "fp string"),
            "fp",
            "left_semi",
        )
        .groupBy("fp")
        .agg(F.first("text").alias("text"))
        .collect()
    }
    mism = 0
    for r in sample:
        sa, sb = _shingles(texts[r["fp_a"]]), _shingles(texts[r["fp_b"]])
        j = _r(len(sa & sb) / len(sa | sb), 6)
        if abs(j - r["jaccard"]) > 1e-9:
            mism += 1
    # recall containment: every q68-verified pair above tau (with margin
    # for q68's 6-decimal rounding) maps to a q222 fp pair
    q68 = specs["q68_jaccard_verify"].fn(spark, SF1).filter(
        F.col("jaccard") >= _PFX_TAU + 1e-4
    )
    dmap = load_table(spark, SF1, "documents").select(
        "doc_id", F.md5("text").alias("fp")
    )
    fa = dmap.select(F.col("doc_id").alias("doc_a"), F.col("fp").alias("fpa"))
    fb = dmap.select(F.col("doc_id").alias("doc_b"), F.col("fp").alias("fpb"))
    verified_fp = (
        q68.join(fa, "doc_a")
        .join(fb, "doc_b")
        .filter(F.col("fpa") != F.col("fpb"))
        .select(
            F.least("fpa", "fpb").alias("fp_a"),
            F.greatest("fpa", "fpb").alias("fp_b"),
        )
        .distinct()
    )
    uncontained = verified_fp.join(
        df.select("fp_a", "fp_b"), ["fp_a", "fp_b"], "left_anti"
    ).count()
    df.unpersist()
    ok = (
        n > 0
        and bad_order == 0
        and dup_pairs == 0
        and bad_tau == 0
        and bad_docmath == 0
        and mism == 0
        and uncontained == 0
    )
    return ok, {
        "pairs": n,
        "bad_ordering": bad_order,
        "duplicate_pairs": dup_pairs,
        "below_tau": bad_tau,
        "doc_pair_arith_bad": bad_docmath,
        "python_jaccard_mismatches": mism,
        "python_sampled_pairs": len(sample),
        "q68_verified_pairs_missing": uncontained,
    }


@check("q179_containment_pairs")
def _q179(ctx):
    spark, specs = ctx.spark, ctx.specs
    from hive_backend_spark.catalog import load_table

    df = specs["q179_containment_pairs"].fn(spark, SF1).cache()
    n = df.count()
    bad_bounds = df.filter(
        (F.col("containment") < F.col("jaccard") - 1e-4)
        | (F.col("containment") > 1.0 + 1e-9)
        | (F.col("jaccard") < 0)
    ).count()
    # the flag is computed on UNROUNDED values; away from the 0.7
    # boundary the rounded values must reproduce it exactly
    interior = df.filter(
        (F.abs(F.col("containment") - 0.7) > 1e-3)
        & (F.abs(F.col("jaccard") - 0.7) > 1e-3)
    )
    flag_bad = interior.filter(
        F.col("asymmetric_dup")
        != ((F.col("containment") >= 0.7) & (F.col("jaccard") < 0.7))
    ).count()
    # sampled pure-Python recompute from raw text
    sample = (
        df.orderBy(
            F.md5(
                F.concat_ws(
                    ",",
                    F.col("doc_a").cast("string"),
                    F.col("doc_b").cast("string"),
                )
            )
        )
        .limit(120)
        .collect()
    )
    ids = {r["doc_a"] for r in sample} | {r["doc_b"] for r in sample}
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF1, "documents")
        .join(
            spark.createDataFrame([(i,) for i in ids], "doc_id bigint"),
            "doc_id",
            "left_semi",
        )
        .collect()
    }
    mism = 0
    for r in sample:
        sa, sb = _shingles(texts[r["doc_a"]]), _shingles(texts[r["doc_b"]])
        inter = len(sa & sb)
        cont = _r(inter / min(len(sa), len(sb)), 4)
        jac = _r(inter / len(sa | sb), 4)
        if (
            r["n_shingles_a"] != len(sa)
            or r["n_shingles_b"] != len(sb)
            or abs(r["containment"] - cont) > 1e-9
            or abs(r["jaccard"] - jac) > 1e-9
        ):
            mism += 1
    df.unpersist()
    ok = n > 0 and bad_bounds == 0 and flag_bad == 0 and mism == 0
    return ok, {
        "pairs": n,
        "bound_violations": bad_bounds,
        "interior_flag_mismatches": flag_bad,
        "python_recompute_mismatches": mism,
        "python_sampled_pairs": len(sample),
    }


@check("q171_decontamination_ladder")
def _q171(ctx):
    spark, specs = ctx.spark, ctx.specs
    from hive_backend_spark.catalog import load_table
    from hive_backend_spark.queries.sampling import hash_bucket

    df = specs["q171_decontamination_ladder"].fn(spark, SF1).cache()
    n = df.count()
    want_n = (
        load_table(spark, SF1, "documents")
        .filter(hash_bucket("doc_id") < "f0")
        .count()
    )
    expected = (
        F.when(F.col("exact_hit"), "contaminated")
        .when(F.col("winnow_hit") | F.col("fuzzy_hit"), "suspect")
        .otherwise("clean")
    )
    bad_verdict = df.filter(F.col("verdict") != expected).count()
    dup_docs = n - df.select("doc_id").distinct().count()
    df.unpersist()
    ok = n == want_n and bad_verdict == 0 and dup_docs == 0 and n > 0
    return ok, {
        "rows": n,
        "expected_rows": want_n,
        "verdict_rule_violations": bad_verdict,
        "duplicate_docs": dup_docs,
    }


@check("q212_chunk_dedup_census")
def _q212(ctx):
    spark, specs = ctx.spark, ctx.specs
    df = specs["q212_chunk_dedup_census"].fn(spark, SF1).cache()
    rows = df.collect()
    bad = 0
    for r in rows:
        if not (
            0 < r["n_distinct_chunks"] <= r["n_chunks"]
            and 0 <= r["cross_source_chunks"] <= r["n_distinct_chunks"]
            and 0.0 <= r["dup_instance_share"] <= 1.0
        ):
            bad += 1
        # a source where no digest repeats corpus-wide must have share 0
        if r["n_distinct_chunks"] == r["n_chunks"] and r["cross_source_chunks"] == 0:
            # digests unique within source AND absent elsewhere -> share
            # can still be nonzero only via cross-source repeats, which
            # cross_source_chunks==0 rules out
            if r["dup_instance_share"] != 0.0:
                bad += 1
    df.unpersist()
    return bad == 0 and len(rows) > 0, {
        "sources": len(rows),
        "invariant_violations": bad,
    }


@check("q220_multiprobe_lsh")
def _q220(ctx):
    spark, specs = ctx.spark, ctx.specs
    from hive_backend_spark.catalog import load_table

    import numpy as np

    df = specs["q220_multiprobe_lsh"].fn(spark, SF1).cache()
    rows = df.collect()
    emb = load_table(spark, SF1, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in emb], dtype=np.int64)
    m = np.array([r["embedding"] for r in emb], dtype=np.float64)
    norms = np.linalg.norm(m, axis=1)
    by_id = {int(v): i for i, v in enumerate(ids)}
    n_vecs = len(ids)
    bad = 0
    for r in rows:
        approx = [int(x) for x in r["approx_ids"].split(",") if x]
        if not (
            0.0 <= r["recall_at_5"] <= 1.0
            and abs(r["recall_at_5"] * 5 - round(r["recall_at_5"] * 5)) < 1e-9
            and len(approx) <= 5
            and r["n_candidates"] <= n_vecs
            and all(a in by_id for a in approx)
        ):
            bad += 1
            continue
        # independent numpy brute-force truth for this probe (rounded
        # cosine, vec_id tie-break — the query's own ordering contract)
        q = m[by_id[r["probe_id"]]]
        cos = np.round((m @ q) / (norms * np.linalg.norm(q)), 6)
        mask = ids != r["probe_id"]
        order = sorted(
            zip(-cos[mask], ids[mask]), key=lambda t: (t[0], t[1])
        )[:5]
        truth5 = {int(v) for _, v in order}
        want_recall = round(len(truth5 & set(approx)) / 5.0, 6)
        if abs(want_recall - r["recall_at_5"]) > 1e-9:
            bad += 1
    df.unpersist()
    return bad == 0 and len(rows) > 0, {
        "probes": len(rows),
        "violations": bad,
        "corpus_vectors": n_vecs,
    }


def main() -> None:
    spark = get_spark("hive-backend-spark-scale-invariants")
    specs = all_queries()
    ctx = Ctx(spark, specs)
    results: dict = {}
    failed = []
    for name, fn in CHECKS:
        try:
            ok, detail = fn(ctx)
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            ok, detail = False, {"error": f"{type(e).__name__}: {e}"}
        results[name] = {"ok": ok, **detail}
        if not ok:
            failed.append(name)
        print(f"# {name}: {'OK' if ok else 'FAIL'} {detail}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "scale_invariants",
                "sf_dir": SF1,
                "checks": results,
                "pass": sum(1 for r in results.values() if r["ok"]),
                "fail": failed,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
