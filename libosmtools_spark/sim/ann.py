"""Similarity search over embedding columns (training-data extension).

- ``cosine_topk_brute``: exact top-k cosine neighbors — the correctness
  baseline.  Dot products are computed in one numpy matmul per Arrow batch
  against a broadcast matrix (no per-row Python).
- ``lsh_topk``: random-hyperplane LSH bucketing — the scale path: neighbors
  are only searched within matching sign-buckets (plus multi-probe),
  turning the quadratic scan into bucket-local scans.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _collect_matrix(embeddings: DataFrame, id_col: str, vec_col: str):
    pdf = embeddings.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(M, axis=1)
    norms[norms == 0] = 1.0
    return ids, M, norms


def cosine_topk_brute(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, neighbor_id, rank): exact top-k by cosine, ties by neighbor id.

    The corpus matrix is broadcast (dimension-scale index assumption —
    same posture as the region store); each Arrow batch of queries does ONE
    matmul.  For corpus sizes beyond broadcast, use lsh_topk."""
    spark = embeddings.sparkSession
    ids, M, norms = _collect_matrix(embeddings, id_col, vec_col)
    bc = spark.sparkContext.broadcast((ids, M / norms[:, None]))

    out_schema = T.StructType(
        [
            T.StructField("qid", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )

    def part(it):
        nids, Mn = bc.value
        for pdf in it:
            Q = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            qn = np.linalg.norm(Q, axis=1)
            qn[qn == 0] = 1.0
            S = (Q / qn[:, None]) @ Mn.T  # (q, n) cosine matrix
            qids = pdf[id_col].to_numpy()
            rows = {"qid": [], "neighbor_id": [], "rank": []}
            for r in range(S.shape[0]):
                s = S[r].copy()
                self_mask = nids == qids[r]
                s[self_mask] = -np.inf
                order = np.lexsort((nids, -s))[:k]
                rows["qid"].extend([qids[r]] * len(order))
                rows["neighbor_id"].extend(nids[order].tolist())
                rows["rank"].extend(range(1, len(order) + 1))
            yield pd.DataFrame(rows)

    return (
        embeddings.select(id_col, vec_col)
        .mapInPandas(part, out_schema)
        .withColumnRenamed("qid", id_col)
    )


def hyperplane_buckets_udf(dim: int, n_planes: int, n_tables: int, seed: int = 7):
    """vec → array of n_tables bucket ids (each from its own n_planes
    hyperplane set).  Multi-table LSH: a pair is a candidate if it collides
    in ANY table — recall improves geometrically with tables while each
    table's buckets stay small (the skew/size trade)."""
    rng = np.random.default_rng(seed)
    H = rng.normal(size=(n_tables, n_planes, dim))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vec: pd.Series) -> pd.Series:
        V = np.stack(vec.to_numpy()).astype(np.float64)  # (n, dim)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        out = np.empty((len(V), n_tables), dtype=np.int64)
        for t in range(n_tables):
            signs = (V @ H[t].T) > 0
            # offset by table so buckets never collide across tables
            out[:, t] = (signs @ weights) + t * (1 << n_planes)
        return pd.Series(out.tolist())

    return buckets


def lsh_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = pairs colliding in any of
    ``n_tables`` hyperplane-sign buckets, ranked by exact cosine.  Linear
    candidate generation; recall measured against cosine_topk_brute in
    tests."""
    dim = len(embeddings.select(vec_col).first()[0])
    bucket = hyperplane_buckets_udf(dim, n_planes, n_tables)
    b = embeddings.select(id_col, vec_col).withColumn(
        "bucket", F.explode(bucket(F.col(vec_col)))
    )

    x = b.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"), "bucket")
    y = b.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"), "bucket")
    cand = (
        x.join(y, "bucket")
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "qv", "nid", "nv")
        .dropDuplicates(["qid", "nid"])
    )

    @F.pandas_udf(T.DoubleType())
    def cos(a: pd.Series, c: pd.Series) -> pd.Series:
        A = np.stack(a.to_numpy()).astype(np.float64)
        C = np.stack(c.to_numpy()).astype(np.float64)
        na = np.linalg.norm(A, axis=1)
        nc = np.linalg.norm(C, axis=1)
        na[na == 0] = 1.0
        nc[nc == 0] = 1.0
        return pd.Series((A * C).sum(axis=1) / (na * nc))

    scored = cand.withColumn("cosine", cos(F.col("qv"), F.col("nv")))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias(id_col), F.col("nid").alias("neighbor_id"), "rank", "cosine")
    )
