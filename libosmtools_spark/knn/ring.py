"""Cell-ring-expansion kNN (north-rule operator; SURVEY.md §2.4).

Not present in the reference as a public op, but its machinery is: the cell
dual graph (/root/reference/src/OsmTriangulationRegionStore.cpp:382-429)
defines cell adjacency, and the grid makes ring expansion pure arithmetic.

Contract: for each query point, the k nearest *other* points under the
squared-euclidean-degree metric (see geom.kernels.sq_euclid_deg for why not
haversine: bit-reproducibility of the ranking across engines), ties broken
by neighbor id ascending.

Algorithm (distributed, no cross join):
  round r = 1, 2, 4, ...: candidates = equi-join of unresolved query points
  against points indexed by cell_key, where the join key is each query
  point's ring-r neighbor cell set (exploded).  A query resolves when its
  k-th best candidate distance is strictly below the ring's guarantee bound
  ``(r * cell_size_deg)^2`` — no point outside the ring can beat it.
  Unresolved queries escalate to a doubled radius; a final fallback pass
  (rare: isolated points) goes global.

Skew: hot cells (dense urban tiles) produce large candidate groups; the
per-query top-k is a bounded-memory window aggregate, and AQE skew-join
splits oversized shuffle partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from libosmtools_spark.geom import kernels as K
from libosmtools_spark.geom.columns import sq_euclid_deg_col
from libosmtools_spark.joins.spatial import with_cell_key


def _ring_keys_udf(k: int):
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def ring_keys(keys: pd.Series) -> pd.Series:
        # vectorized per distinct cell (points cluster into few cells)
        uniq = keys.unique()
        table = {int(c): K.cell_ring(int(c), k).tolist() for c in uniq}
        return keys.map(lambda c: table[int(c)])

    return ring_keys


def knn_join(
    points: DataFrame,
    id_col: str,
    k: int = 5,
    level: int = 6,
    lat: str = "lat",
    lon: str = "lon",
    max_rounds: int = 4,
) -> DataFrame:
    """points(id, lat, lon, …) → (id, neighbor_id, rank) with rank 1..k.

    Self-kNN: every point queries against the full point set minus itself.
    """
    pts = with_cell_key(points.select(id_col, lat, lon), lat, lon, level).cache()
    data = pts.select(
        F.col(id_col).alias("n_id"),
        F.col(lat).alias("n_lat"),
        F.col(lon).alias("n_lon"),
        F.col("cell_key").alias("n_key"),
    ).cache()

    cell_size = 180.0 / (1 << level)
    unresolved = pts
    resolved_parts: list[DataFrame] = []
    radius = 1

    for _ in range(max_rounds):
        ring_udf = _ring_keys_udf(radius)
        cand = (
            unresolved.withColumn("ring", ring_udf(F.col("cell_key")))
            .withColumn("n_key", F.explode("ring"))
            .drop("ring")
            .join(data, "n_key")
            .filter(F.col(id_col) != F.col("n_id"))
            .withColumn(
                "d2", sq_euclid_deg_col(F.col(lat), F.col(lon), F.col("n_lat"), F.col("n_lon"))
            )
        )
        w = Window.partitionBy(id_col).orderBy(F.col("d2").asc(), F.col("n_id").asc())
        topk = cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
        bound = (radius * cell_size) ** 2
        # resolved: has k candidates AND the k-th distance beats the ring bound
        kth = topk.groupBy(id_col).agg(F.max("rank").alias("nk"), F.max("d2").alias("dk"))
        done_ids = kth.filter((F.col("nk") == k) & (F.col("dk") < bound)).select(id_col)
        resolved_parts.append(
            topk.join(done_ids, id_col, "left_semi").select(
                id_col, F.col("n_id").alias("neighbor_id"), "rank"
            )
        )
        unresolved = unresolved.join(done_ids, id_col, "left_anti")
        radius *= 2
        if unresolved.isEmpty():
            break

    out = resolved_parts[0]
    for p in resolved_parts[1:]:
        out = out.unionByName(p)

    if not unresolved.isEmpty():
        # global fallback for stragglers (isolated points): the unresolved
        # side is tiny, so broadcast IT against the full data set
        cand = (
            F.broadcast(unresolved.select(id_col, lat, lon))
            .crossJoin(data.drop("n_key"))
            .filter(F.col(id_col) != F.col("n_id"))
            .withColumn(
                "d2", sq_euclid_deg_col(F.col(lat), F.col(lon), F.col("n_lat"), F.col("n_lon"))
            )
        )
        w = Window.partitionBy(id_col).orderBy(F.col("d2").asc(), F.col("n_id").asc())
        fallback = (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(id_col, F.col("n_id").alias("neighbor_id"), "rank")
        )
        out = out.unionByName(fallback)
    return out


def knn_neighbor_lists(knn_rows: DataFrame, id_col: str) -> DataFrame:
    """(id, neighbor_id, rank) → (id, neighbor_ids array ordered by rank)."""
    return knn_rows.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rank", "neighbor_id"))), lambda s: s["neighbor_id"]
        ).alias("neighbor_ids")
    )
