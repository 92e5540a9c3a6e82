#!/usr/bin/env python3
"""Build sf1.0 (or any multiple) scale-test data from the driver's sf0.1
parquet — the empirical backing for the 100 TB posture (round-9 verdict
task #1: plan inspection catches shuffle shape, only a measured scaling
exponent catches super-linear cost growth).

Method: union REPLICAS copies of every fact table with disjoint key ranges
(offset = replica * 10_000_000 on every bigint key, preserving ALL foreign
keys: o_custkey shifts with c_custkey, l_orderkey with o_orderkey, ...).
Dimension tables (region, nation) stay single — exactly how a real
warehouse scales, and what keeps the broadcast-dim plans honest at 10x.
Content columns are perturbed deterministically so the scaled corpus is
statistically similar rather than 10x exact duplicates (which would turn
every dedup query into a flood benchmark instead of a scale benchmark):

  - documents: every word in replica i gets an 'r<i>' suffix — replicas
    share no shingles with their source (vocabulary grows with the corpus,
    like real crawl growth), length distribution is preserved, n_chars is
    recomputed to stay consistent with the mutated text.
  - embeddings: replica i applies a deterministic CYCLIC DIMENSION
    ROTATION (shift 7*i mod 64) plus a small nonlinear perturbation
    (x + 0.01*cos(7x) on rotated values). Rotation is an isometry, so
    each replica carries an exact copy of the source similarity
    structure (norms, within-replica cosines) while CROSS-replica
    cosines drop to noise — without it, every base vector's replicas
    form a near-dup clique (cosine ~ 1 > any threshold) and the
    similarity graph densifies QUADRATICALLY in the replica count: at
    32x that made q71/q123's edge list a ~500x flood, a
    corpus-construction artifact, not a scale measurement (the same
    trap the name perturbation fixes for ER blocking).
  - entity names (p_name, c_name, s_name): every word in replica i gets
    the same 'r<i>' suffix — real catalogs/CRMs at 10x carry new names,
    not each name repeated 10x. Without this, q267/q256's head-noun
    blocks get 10x denser and record-PAIR volume grows 100x: a flood
    benchmark, not a scale benchmark (measured: q267 33.8 s at sf1 with
    replicated names vs linear growth with perturbed ones).
  - events/orders/lineitem/...: keys shift, values/timestamps stay — 10x
    row density over the same time window and value ranges.

Pure DuckDB (no Spark), ~seconds. Output: /root/repo/.scaledata/sf<mult>/
(gitignored — this is derived data, the script is the artifact).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = os.environ.get("SCALE_SRC", "/root/testdata/sf0.1")
MULT = int(os.environ.get("SCALE_MULT", "10"))
OUT = os.environ.get(
    "SCALE_OUT", f"/root/repo/.scaledata/sf{MULT / 10:g}"
)
OFF = 10_000_000  # disjoint key ranges per replica; all source keys < 10M

# table -> {bigint key columns to shift}
SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]


def replica_select(table: str, cols: list, i: int) -> str:
    exprs = []
    for name, typ in cols:
        e = name
        if name in SHIFTS.get(table, []) and i > 0:
            e = f"{name} + {i * OFF}"
        if name in ("p_name", "c_name", "s_name") and i > 0:
            e = f"regexp_replace({name}, '(\\S+)', '\\1r{i}', 'g')"
        if table == "documents" and i > 0:
            if name == "text":
                e = f"regexp_replace(text, '(\\S+)', '\\1r{i}', 'g')"
            elif name == "n_chars":
                e = f"CAST(length(regexp_replace(text, '(\\S+)', '\\1r{i}', 'g')) AS BIGINT)"
        if table == "embeddings" and i > 0 and name == "embedding":
            shift = (7 * i) % 64
            e = (
                f"list_transform(range(1, len(embedding) + 1), j -> "
                f"CAST(embedding[((j - 1 + {shift}) % len(embedding)) + 1] "
                f"+ 0.01 * cos(7 * embedding[((j - 1 + {shift}) % "
                f"len(embedding)) + 1]) AS FLOAT))"
            )
        exprs.append(f"{e} AS {name}")
    return f"SELECT {', '.join(exprs)} FROM src_{table}"


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS + list(SHIFTS):
        con.execute(
            f"CREATE VIEW src_{t} AS SELECT * FROM '{SRC}/{t}.parquet'"
        )
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM src_{t}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: dims copied 1x", file=sys.stderr)
    for t in SHIFTS:
        cols = [
            (d[0], d[1])
            for d in con.execute(f"DESCRIBE SELECT * FROM src_{t}").fetchall()
        ]
        union = " UNION ALL ".join(
            replica_select(t, cols, i) for i in range(MULT)
        )
        # fact tables become MULTI-FILE directories (~8 MB parts) so the
        # scaled scan parallelizes the way a real cluster's would — a
        # single 100+ MB file would serialize the sf1 scan into one task
        # and overstate every exponent. spark.read.parquet() reads the
        # directory transparently (it is still named <t>.parquet).
        con.execute(
            f"COPY ({union}) TO '{OUT}/{t}.parquet' "
            "(FORMAT PARQUET, FILE_SIZE_BYTES '8MB')"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{OUT}/{t}.parquet/*.parquet'"
        ).fetchone()[0]
        print(f"{t}: {n} rows ({MULT}x)", file=sys.stderr)
    print(OUT)


if __name__ == "__main__":
    main()
