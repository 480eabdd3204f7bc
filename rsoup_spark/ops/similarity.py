"""Similarity search over an embedding column (array<float>).

* ``cosine_topk``      -- brute-force baseline: broadcast the (small)
                          query set against the corpus; dot products via
                          ``aggregate(zip_with(...))`` stay JVM-side.
* ``lsh_ann_topk``     -- scale path: random-hyperplane LSH buckets
                          (deterministic planes from xxhash64 of
                          (dim, plane) pairs), candidates only within a
                          bucket, then exact re-rank.  At 100TB the
                          bucket join replaces the corpus-wide cross
                          product; multi-probe = more plane sets.
* ``embedding_dup_pairs`` -- near-duplicate detection by cosine >= tau.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbours per query (brute force, broadcast queries).

    Returns (query_id, neighbor_id, cos, rank); ties break on neighbor
    id for determinism; self-matches excluded; cos rounded to 6dp.
    """
    from pyspark.sql.window import Window

    # compute in float64: matches the DuckDB oracle's summation precision
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _hyperplane_sig(vec_col, n_planes: int, dim: int, seed: int = 42):
    """Sign signature against deterministic pseudo-random hyperplanes.

    Plane weights w[p][d] = xxhash64(p*dim+d, seed) scaled to [-1,1] --
    reproducible everywhere, no stored model, all JVM-side.
    """
    bits = []
    for p in range(n_planes):
        terms = F.aggregate(
            F.zip_with(
                vec_col,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda v, d: v
                * (
                    (
                        F.xxhash64(F.lit(seed), F.lit(p) * dim + d)
                        % 20001
                    ).cast("double")
                    / 10000.0
                ),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(terms >= 0, F.lit(1)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig * 2 + b
    return sig


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share a random-hyperplane bucket,
    exact cosine re-rank within the bucket."""
    from pyspark.sql.window import Window

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _hyperplane_sig(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _hyperplane_sig(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: corpus vectors are assigned to the nearest of
    ``n_cells`` centroids (deterministically sampled corpus vectors --
    no training step, fully reproducible); each query probes its
    ``n_probe`` nearest cells and re-ranks exactly within them.

    Scale path: the assignment is one broadcast of n_cells vectors + a
    vectorized numpy matmul per Arrow batch; the search join touches
    only n_probe/n_cells of the corpus.
    """
    from pyspark.sql.types import ArrayType, IntegerType
    from pyspark.sql.window import Window

    # deterministic centroids: every (n/k)-th vector by id order
    ids = [r[0] for r in corpus.select(id_col).orderBy(id_col).collect()]
    step = max(1, len(ids) // n_cells)
    centroid_ids = ids[::step][:n_cells]
    cents = (
        corpus.where(F.col(id_col).isin(centroid_ids))
        .orderBy(id_col)
        .select(vec_col)
        .collect()
    )
    C = np.array([list(r[0]) for r in cents], dtype=np.float64)
    C /= np.linalg.norm(C, axis=1, keepdims=True)

    @F.pandas_udf(IntegerType())
    def assign_cell(vs: pd.Series) -> pd.Series:
        V = np.array(vs.tolist(), dtype=np.float64)
        V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(V @ C.T, axis=1).astype("int32"))

    @F.pandas_udf(ArrayType(IntegerType()))
    def probe_cells(vs: pd.Series) -> pd.Series:
        V = np.array(vs.tolist(), dtype=np.float64)
        V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(V @ C.T), axis=1)[:, :n_probe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        assign_cell(F.col(vec_col)).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        F.explode(probe_cells(F.col(vec_col))).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def embedding_dup_pairs(
    vectors: DataFrame,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vector pairs: cosine >= tau, id_a < id_b.

    Brute force baseline over a self-join; the LSH-bucketed variant is
    the scale path (same re-rank, bucket-join candidates).
    """
    a = vectors.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("va"),
    )
    b = vectors.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("vb"),
    )
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"),
        )
        .where(F.col("cos") >= tau)
    )
