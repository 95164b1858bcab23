"""Distributed PCA / whitening over an embedding column.

The embedding hygiene step of a training-data pipeline: decorrelate and
compress vectors before near-dup detection or ANN indexing (whitening
makes cosine thresholds comparable across dimensions; truncating to the
top-k components is the classic storage/recall trade). Public method:
ordinary PCA via the covariance eigendecomposition.

Spark-first shape, two covariance paths with one contract:

- **builtin** (default for d <= 128): ONE map-combined aggregate of
  d(d+1)/2 ``covar_samp`` expressions — a single pass, no Python, the
  plan any SQL engine can replay (the correctness oracle does).
- **arrow** (the wide-d scale path): ``mapInPandas`` folds each Arrow
  batch into ONE (d+2)-row partial (count, sum, X^T X upper triangle)
  with BLAS, so the shuffle carries P partials regardless of corpus
  size; the driver finishes the moments. At d = 768 the builtin path
  would need ~295k aggregate expressions — the partial fold is the
  same algebra without the codegen wall.

The fitted model (mean, components, eigenvalues) is driver-sized
(d x d floats); eigendecomposition is numpy on the driver — O(d^3) on
64-4096 dims is microseconds, never a distributed concern. Projection
is pure JVM column math: k dot products per row against broadcast
literal components.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ARROW_DIM_THRESHOLD = 128


def _dim_of(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None or row["d"] is None:
        raise ValueError(f"cannot infer dimension: {vec_col} has no rows")
    return int(row["d"])


def embedding_covariance(
    emb: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    method: str = "auto",
):
    """(n, mean, cov) of an embedding column in one distributed pass.
    ``cov`` is the SAMPLE covariance (n-1 denominator), returned as a
    d x d nested list; ``mean`` as a d-list. ``method``: 'builtin'
    (covar_samp grid), 'arrow' (BLAS partial fold), or 'auto' (builtin
    up to d = ARROW_DIM_THRESHOLD = 128, arrow beyond)."""
    d = dim or _dim_of(emb, vec_col)
    if method not in ("auto", "builtin", "arrow"):
        raise ValueError(f"unknown method {method!r} (auto/builtin/arrow)")
    if method == "auto":
        method = "builtin" if d <= ARROW_DIM_THRESHOLD else "arrow"
    v = F.col(vec_col)
    if method == "builtin":
        aggs = [F.count(F.lit(1)).alias("__n")]
        aggs += [F.avg(v[i]).alias(f"__m{i}") for i in range(d)]
        aggs += [
            F.covar_samp(v[i], v[j]).alias(f"__c{i}_{j}")
            for i in range(d)
            for j in range(i, d)
        ]
        row = emb.agg(*aggs).head()
        n = int(row["__n"])
        mean = [float(row[f"__m{i}"]) for i in range(d)]
        cov = [[0.0] * d for _ in range(d)]
        for i in range(d):
            for j in range(i, d):
                c = float(row[f"__c{i}_{j}"] or 0.0)
                cov[i][j] = cov[j][i] = c
        return n, mean, cov

    import numpy as np

    def _fold(batches):
        import numpy as _np
        import pandas as _pd

        cnt, s, xtx = 0, None, None
        for pdf in batches:
            if pdf.empty:
                continue
            x = _np.asarray(list(pdf[vec_col]), dtype=_np.float64)
            cnt += len(x)
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            g = x.T @ x
            xtx = g if xtx is None else xtx + g
        if cnt == 0:
            return
        yield _pd.DataFrame(
            {
                "n": [cnt],
                "s": [s.tolist()],
                "g": [xtx[_np.triu_indices_from(xtx)].tolist()],
            }
        )

    parts = emb.select(vec_col).mapInPandas(
        _fold, "n bigint, s array<double>, g array<double>"
    ).collect()
    if not parts:
        raise ValueError(f"{vec_col} has no rows")
    n = sum(p["n"] for p in parts)
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    gflat = np.sum([np.asarray(p["g"]) for p in parts], axis=0)
    g = np.zeros((d, d))
    g[np.triu_indices(d)] = gflat
    g = g + np.triu(g, 1).T
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / max(n - 1, 1)
    return n, mean.tolist(), cov.tolist()


def fit_pca(
    emb: DataFrame,
    k: int | None = None,
    vec_col: str = "embedding",
    method: str = "auto",
) -> dict:
    """Fit PCA from the one-pass covariance: returns ``{"mean",
    "components" (k x d, orthonormal rows, descending variance),
    "explained_variance" (k eigenvalues), "n"}``. Deterministic up to
    the eigensolver: each component's sign is fixed so its
    largest-|coordinate| is positive (the standard convention — eig
    sign is otherwise arbitrary and would break reproducibility)."""
    import numpy as np

    n, mean, cov = embedding_covariance(emb, vec_col, method=method)
    vals, vecs = np.linalg.eigh(np.asarray(cov))
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    d = len(mean)
    k = k or d
    if not 0 < k <= d:
        raise ValueError(f"k must be in (0, {d}], got {k}")
    comps = vecs[:, :k].T  # (k, d)
    for i in range(k):
        j = int(np.abs(comps[i]).argmax())
        if comps[i][j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": list(mean),
        "components": comps.tolist(),
        "explained_variance": [float(x) for x in vals[:k]],
        "n": n,
    }


def project_embeddings(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-9,
    method: str = "auto",
) -> DataFrame:
    """Project each vector onto the fitted components. ``whiten=True``
    divides each coordinate by sqrt(its eigenvalue + eps), giving unit
    variance per output dimension.

    Two paths, same crossover as the covariance fit: 'builtin' embeds
    k x d literal components as JVM column math (no UDF, no shuffle —
    right up to k*d ~ ARROW_DIM_THRESHOLD**2, past which Catalyst plan
    construction hits the codegen wall), and 'arrow' does one BLAS
    matmul per Arrow batch with the (k, d) matrix broadcast in the
    closure — a narrow mapInPandas, still no shuffle."""
    mean = model["mean"]
    comps = model["components"]
    evs = model["explained_variance"]
    if method not in ("auto", "builtin", "arrow"):
        raise ValueError(f"unknown method {method!r} (auto/builtin/arrow)")
    if method == "auto":
        kd = len(comps) * len(mean)
        method = "builtin" if kd <= ARROW_DIM_THRESHOLD**2 else "arrow"
    if method == "arrow":
        import numpy as np

        w = np.asarray(comps, dtype=np.float64)
        if whiten:
            w = w / np.sqrt(np.asarray(evs, dtype=np.float64) + eps)[:, None]
        mu = np.asarray(mean, dtype=np.float64)
        cols = list(df.columns)
        out_schema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
        ) + f", `{out_col}` array<double>"

        def _proj(batches):
            import pandas as _pd

            for pdf in batches:
                if pdf.empty:
                    continue
                x = np.asarray(list(pdf[vec_col]), dtype=np.float64)
                p = (x - mu) @ w.T
                pdf = pdf.copy()
                pdf[out_col] = [row.tolist() for row in p]
                yield pdf

        return df.mapInPandas(_proj, out_schema).select(*cols, out_col)
    v = F.col(vec_col)
    centered = F.zip_with(
        v, F.array(*[F.lit(float(m)) for m in mean]), lambda a, b: a - b
    )
    coords = []
    for ci, comp in enumerate(comps):
        dot = F.aggregate(
            F.zip_with(
                centered,
                F.array(*[F.lit(float(c)) for c in comp]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        if whiten:
            dot = dot / F.lit(float((evs[ci] + eps) ** 0.5))
        coords.append(dot)
    return df.withColumn(out_col, F.array(*coords))
