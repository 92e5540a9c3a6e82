"""Iterated k-means training (Lloyd's algorithm) over an embedding
DataFrame — the training loop the IVF/PQ family assumes has already
happened (q73 coarse-quantizer build, q74 routing, q127 PQ codebooks,
q132 cluster audit, q154 recall audit all consume a centroid table; q140
is a single Lloyd step of this loop).

Reference parity: the reference system has no vector stage at all
(saint0x/hive-backend `db.mjs` is a queue/event store) — this is the
brief-mandated LLM-data-pipeline extension surface.

Loop discipline (mirrors the connected-components operator in
operators/dedup.py): ONE Spark action per round, model state (the k x dim
centroid matrix — KB-scale) held driver-side and shipped into the pass as
a closure constant exactly like q127's PQ codebook, loud RuntimeError on
non-convergence. Lineage does not grow round-over-round (each pass reads
the source afresh with new constants), so no checkpointing is needed.

Scale posture per round: one mapInPandas pass over the vectors — a BLAS
(batch x dim) @ (dim x k) matmul per Arrow batch, emitting at most k
partial rows per batch (cell, count, sum, inertia, moved) — then a k-row
groupBy that zip_with-folds the partial sums. Nothing corpus-sized is
collected, broadcast, or funneled through one task; the only driver
traffic is k rows per round.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class KMeansRound:
    """Per-iteration convergence report: the signals a training pipeline
    loops on (q140 reports the same shape for a single step)."""

    iteration: int
    n_moved: int  # vectors whose assignment changed vs the previous round
    inertia: float  # sum of squared distance to the assigned centroid
    max_shift: float  # max centroid movement (L2) this round


def _pass(vecs: DataFrame, vec_col: str, prev, cur):
    """One distributed round: assign every vector under `prev` and `cur`
    centroids, return (counts, sums, inertia, moved) where counts/sums
    are per-cell under the `cur` assignment. Exactly one action."""
    import numpy as np

    k, dim = cur.shape
    prev_b = np.ascontiguousarray(prev)
    cur_b = np.ascontiguousarray(cur)

    def partials(batches):
        import pandas as pd

        pp = (prev_b * prev_b).sum(axis=1)
        cc = (cur_b * cur_b).sum(axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            vv = (m * m).sum(axis=1)
            # ||v - c||^2 = v.v + c.c - 2 v.c — same formula as the SQL
            # oracle so assignment margins agree to the last few ulps
            d2_prev = vv[:, None] + pp[None, :] - 2.0 * (m @ prev_b.T)
            d2_cur = vv[:, None] + cc[None, :] - 2.0 * (m @ cur_b.T)
            a_prev = np.argmin(d2_prev, axis=1)  # first min == smallest id
            a_cur = np.argmin(d2_cur, axis=1)
            rows = []
            for j in np.unique(a_cur):
                sel = a_cur == j
                rows.append(
                    {
                        "cell": int(j),
                        "n": int(sel.sum()),
                        "s": m[sel].sum(axis=0).tolist(),
                        "inertia": float(d2_cur[sel, a_cur[sel]].sum()),
                        "moved": int((a_prev[sel] != a_cur[sel]).sum()),
                    }
                )
            yield pd.DataFrame(rows)

    part = vecs.mapInPandas(
        partials,
        schema="cell int, n bigint, s array<double>, inertia double, moved bigint",
    )
    zero = F.array_repeat(F.lit(0.0), dim)
    agg = (
        part.groupBy("cell")
        .agg(
            F.sum("n").alias("n"),
            F.aggregate(
                F.collect_list("s"), zero, lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b)
            ).alias("s"),
            F.sum("inertia").alias("inertia"),
            F.sum("moved").alias("moved"),
        )
        .collect()  # k rows — the round's single action
    )
    counts = np.zeros(k, dtype=np.int64)
    sums = np.zeros((k, dim), dtype=np.float64)
    inertia = 0.0
    moved = 0
    for r in agg:
        counts[r["cell"]] = r["n"]
        sums[r["cell"]] = np.array(r["s"], dtype=np.float64)
        inertia += r["inertia"]
        moved += r["moved"]
    return counts, sums, inertia, moved


def kmeans_train(
    vecs: DataFrame,
    init,
    max_iter: int = 20,
    tol: float = 1e-6,
    vec_col: str = "v",
    strict: bool = True,
    min_iter: int = 0,
):
    """Train k-means to convergence: returns (centroids k x dim ndarray,
    history list[KMeansRound]).

    `init` is the k x dim seed matrix (e.g. the k lowest-id vectors, or
    the per-label means `_ivf_centroids` derives — both deterministic).
    Convergence = max centroid shift <= tol, or a round moves zero
    vectors (assignment fixpoint — the next shift is exactly 0), checked
    only after min_iter rounds (min_iter=max_iter runs an exact round
    count, the shape a fixed-budget oracle replays). If convergence never
    happens within max_iter and strict is set, raises loudly rather than
    returning a silently-unconverged model.

    Invariants (property-tested): inertia is monotonically non-increasing
    across rounds (J(a,C) drops under both the assignment and the update
    step), and re-running from a converged centroid matrix moves zero
    vectors in its first round.
    """
    import numpy as np

    cur = np.asarray(init, dtype=np.float64)
    if cur.ndim != 2:
        raise ValueError("init must be a k x dim matrix")
    # seed pass: cell populations under the init centroids (a_0)
    counts, sums, _, _ = _pass(vecs, vec_col, cur, cur)
    history: list[KMeansRound] = []
    for it in range(1, max_iter + 1):
        nxt = cur.copy()  # empty cells keep their previous centroid
        nonzero = counts > 0
        nxt[nonzero] = sums[nonzero] / counts[nonzero][:, None]
        d2 = (
            (nxt * nxt).sum(axis=1)
            + (cur * cur).sum(axis=1)
            - 2.0 * (nxt * cur).sum(axis=1)
        )
        max_shift = float(np.sqrt(np.maximum(d2, 0.0)).max())
        counts, sums, inertia, moved = _pass(vecs, vec_col, cur, nxt)
        history.append(KMeansRound(it, int(moved), float(inertia), max_shift))
        cur = nxt
        if it >= min_iter and (max_shift <= tol or moved == 0):
            return cur, history
    if strict:
        raise RuntimeError(
            f"kmeans_train did not converge in {max_iter} rounds "
            f"(last shift {history[-1].max_shift:.3e}, "
            f"last moved {history[-1].n_moved}); raise max_iter or tol"
        )
    return cur, history
