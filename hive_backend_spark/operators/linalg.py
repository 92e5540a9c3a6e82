"""Distributed second-moment (Gram/covariance) computation for embedding
diagnostics.

The scale shape mirrors operators/clustering.kmeans_train: the corpus-sized
work — accumulating sum(x), sum(x xᵀ) — is one Arrow-batched mapInPandas
pass doing BLAS matmuls per batch (X.T @ X), emitting ONE bounded row per
partition (a dim-vector and a dim²-array of partials). Those fold
elementwise into a single (n, mean, covariance) model state of size
O(dim²) — 64×64 here, kilobytes — which is legitimate driver-side state
exactly like the k×dim centroid table: bounded by construction, never by
corpus size. Everything downstream (power iteration, spectra) is O(dim²)
model math.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def second_moments(vecs: DataFrame, vec_col: str, dim: int):
    """One pass over `vecs[vec_col]` (array<float|double>, fixed length
    `dim`): returns (n, mean vector, covariance matrix) as numpy float64.
    Covariance is the population form C = E[xxᵀ] − μμᵀ, computed from the
    exactly-accumulated Gram so both engines can reproduce it from sums."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim, dtype=np.float64)
        g = np.zeros((dim, dim), dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += m.shape[0]
            s += m.sum(axis=0)
            g += m.T @ m
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]}
            )

    part = vecs.select(vec_col).mapInPandas(
        partials, schema="n bigint, s array<double>, g array<double>"
    )
    zero_s = F.array_repeat(F.lit(0.0), dim)
    zero_g = F.array_repeat(F.lit(0.0), dim * dim)
    fold = lambda col, zero: F.aggregate(  # noqa: E731
        F.collect_list(col), zero, lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b)
    )
    row = part.agg(
        F.sum("n").alias("n"), fold("s", zero_s).alias("s"), fold("g", zero_g).alias("g")
    ).collect()[0]  # 1 row of O(dim^2) model state — the pass's single action
    if row["n"] is None or row["n"] == 0:
        # every partition was empty: sum(n) aggregates no rows -> NULL.
        # Fail loudly (kmeans_train's non-convergence discipline) instead of
        # an opaque TypeError/NaN cascade downstream.
        raise ValueError("second_moments: no vectors in input")
    n = int(row["n"])
    mu = np.array(row["s"], dtype=np.float64) / n
    gram = np.array(row["g"], dtype=np.float64).reshape(dim, dim)
    cov = gram / n - np.outer(mu, mu)
    return n, mu, cov


def power_iteration(cov: np.ndarray, iters: int) -> tuple[np.ndarray, float]:
    """Fixed-iteration-count power method from the deterministic uniform
    start v0 = 1/sqrt(dim): returns (sign-normalized eigenvector estimate,
    Rayleigh-quotient eigenvalue estimate). The iteration count is FIXED
    (not convergence-tested) so an SQL oracle can replay the identical
    unrolled arithmetic; sign is fixed by making the largest-|.|
    component positive (smallest index on ties)."""
    dim = cov.shape[0]
    v = np.full(dim, 1.0 / np.sqrt(dim))
    for _ in range(iters):
        w = cov @ v
        v = w / np.sqrt((w * w).sum())
    top = int(np.argmax(np.abs(v)))  # first max on ties
    if v[top] < 0:
        v = -v
    lam = float(v @ cov @ v)
    return v, lam
