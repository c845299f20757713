"""Raster↔vector tile materialization + cell-graph operators (T9–T12,
plus the north-rule raster↔vector requirement).

- vector→raster: polygons exploded into covering cells — the G4 machinery
  (/root/reference/src/OsmGridRegionTree.cpp:133-140).
- raster→vector: cells grouped back into tile rectangles (the cell IS a
  rectangle on the uniform grid; a region's raster footprint is the union).
- cell dual graph: adjacent distinct cell-id pairs
  (/root/reference/src/OsmTriangulationRegionStore.cpp:382-429) — grid-
  native via ring-1 neighbor keys.
- cell sizes/representatives (T10, :280-292), center of mass (T11,
  :294-320), region→cells inverted index (T12,
  /root/reference/include/osmtools/OsmTriangulationRegionStore.h:538-553),
  per-cell stats (T22, :1088-1111).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from libosmtools_spark.geom import kernels as K
from libosmtools_spark.geom.columns import cell_bounds_cols, cell_center_cols
from libosmtools_spark.index.grid import build_cell_index
from libosmtools_spark.session import release_local_checkpoint


def vector_to_raster(region_rings: DataFrame, level: int) -> DataFrame:
    """region polygons → covering cells (cell_key, region_id, full) —
    alias of the index build; exposed as the materialization operator."""
    return build_cell_index(region_rings, level)


def raster_to_vector(cells: DataFrame) -> DataFrame:
    """cells(cell_key, …) → one rectangle polygon per cell:
    (cell_key, min_lat, max_lat, min_lon, max_lon, ring array of 5 closed
    CCW points — GeoPolygon::fromRect contract,
    /root/reference/src/types.cpp:9-17)."""
    mn_lat, mx_lat, mn_lon, mx_lon = cell_bounds_cols(F.col("cell_key"))
    pt = lambda a, o: F.struct(a.alias("lat"), o.alias("lon"))  # noqa: E731
    return cells.select(
        "cell_key",
        mn_lat.alias("min_lat"),
        mx_lat.alias("max_lat"),
        mn_lon.alias("min_lon"),
        mx_lon.alias("max_lon"),
        F.array(
            pt(mn_lat, mn_lon),
            pt(mn_lat, mx_lon),
            pt(mx_lat, mx_lon),
            pt(mx_lat, mn_lon),
            pt(mn_lat, mn_lon),
        ).alias("ring"),
    )


def region_raster_footprint(cell_index: DataFrame) -> DataFrame:
    """per-region raster summary: covering-cell count, full/partial split,
    bbox of the footprint."""
    mn_lat, mx_lat, mn_lon, mx_lon = cell_bounds_cols(F.col("cell_key"))
    return (
        cell_index.withColumn("c_min_lat", mn_lat)
        .withColumn("c_max_lat", mx_lat)
        .withColumn("c_min_lon", mn_lon)
        .withColumn("c_max_lon", mx_lon)
        .groupBy("region_id")
        .agg(
            F.count("*").alias("n_cells"),
            F.sum(F.col("full").cast("int")).alias("n_full"),
            F.min("c_min_lat").alias("min_lat"),
            F.max("c_max_lat").alias("max_lat"),
            F.min("c_min_lon").alias("min_lon"),
            F.max("c_max_lon").alias("max_lon"),
        )
    )


def neighbor_keys_col(key):
    """Ring-1 neighbor keys excluding self — pure JVM arithmetic
    (geom.columns.ring_keys_col), no Python in the adjacency hot path."""
    from libosmtools_spark.geom.columns import ring_keys_col

    ring = ring_keys_col(key, 1)
    return F.filter(ring, lambda x: x != key)


def cell_dual_graph(cells: DataFrame) -> DataFrame:
    """cells(cell_key, cell_id) → distinct adjacent (cell_id_a < cell_id_b)
    pairs — T9's sorted distinct edge set
    (/root/reference/src/OsmTriangulationRegionStore.cpp:389-407).  Grid
    adjacency: ring-1 neighbor keys, restricted to cells present."""
    base = cells.select("cell_key", "cell_id")
    nbrs = (
        base.withColumn("n_key", F.explode(neighbor_keys_col(F.col("cell_key"))))
        .join(
            base.select(F.col("cell_key").alias("n_key"), F.col("cell_id").alias("n_cell_id")),
            "n_key",
        )
        .filter(F.col("cell_id") != F.col("n_cell_id"))
    )
    return (
        nbrs.select(
            F.least("cell_id", "n_cell_id").alias("cell_id_a"),
            F.greatest("cell_id", "n_cell_id").alias("cell_id_b"),
        )
        .distinct()
        .orderBy("cell_id_a", "cell_id_b")
    )


#: dual-graph edge sets up to this many rows take the driver-local
#: vectorized BFS (the dual graph derives from the broadcastable cells
#: dictionary — edges ≤ 8 × cells, dimension-scale by the same argument)
LOCAL_BFS_MAX_EDGES = 4_000_000


def cell_hop_distances(
    dual_edges: DataFrame,
    source_cell_id: int,
    max_iter: int = 10_000,
    algo: str = "auto",
) -> DataFrame:
    """T23 — hop distances over the cell dual graph: (cell_id, hop) for
    every cell reachable from ``source_cell_id``, hop = BFS shortest path
    length (/root/reference/src/OsmTriangulationRegionStore.cpp:382-429 —
    the hop metric the reference's cell splitting and diameter checks
    walk).  Cells outside the source's component are absent.

    ``algo`` (the connected_components dispatch pattern):
    - 'auto': count-gated — dimension-scale edge sets run one vectorized
      numpy BFS on the driver (frontier sweeps over a CSR-ish neighbor
      array); larger graphs fall through to 'loop'.
    - 'loop': distributed frontier expansion — per round the frontier
      equi-joins the edge table, anti-joins the visited set, and both are
      localCheckpointed (lineage cut); O(diameter) rounds, each a bounded
      shuffle on cell ids only.  Both paths produce the identical
      distance map (parity-tested and driver-oracled)."""
    assert algo in ("auto", "loop")
    edges = dual_edges.select("cell_id_a", "cell_id_b")
    if algo == "auto":
        # ONE job both gates and fetches: limit(N+1).toPandas() returns all
        # M rows when M <= N, and an overflow (N+1 rows) routes to 'loop'
        pdf = edges.limit(LOCAL_BFS_MAX_EDGES + 1).toPandas()
        if len(pdf) <= LOCAL_BFS_MAX_EDGES:
            a = pdf["cell_id_a"].to_numpy(dtype=np.int64)
            b = pdf["cell_id_b"].to_numpy(dtype=np.int64)
            # undirected: both directions, nodes remapped to 0..m-1
            src = np.concatenate([a, b])
            dst = np.concatenate([b, a])
            nodes = np.unique(np.concatenate([a, b, [source_cell_id]]))
            s = np.searchsorted(nodes, src)
            d = np.searchsorted(nodes, dst)
            dist = np.full(len(nodes), -1, dtype=np.int64)
            start = int(np.searchsorted(nodes, source_cell_id))
            dist[start] = 0
            frontier = np.array([start], dtype=np.int64)
            hop = 0
            while len(frontier):
                hop += 1
                mask = np.isin(s, frontier)
                cand = np.unique(d[mask])
                cand = cand[dist[cand] < 0]
                dist[cand] = hop
                frontier = cand
            found = dist >= 0
            out = pd.DataFrame(
                {"cell_id": nodes[found], "hop": dist[found]}
            )
            return dual_edges.sparkSession.createDataFrame(
                out, schema="cell_id long, hop long"
            )
        algo = "loop"

    spark = dual_edges.sparkSession
    both = edges.unionByName(
        edges.select(
            F.col("cell_id_b").alias("cell_id_a"), F.col("cell_id_a").alias("cell_id_b")
        )
    ).localCheckpoint()
    visited = spark.createDataFrame(
        [(int(source_cell_id), 0)], "cell_id long, hop long"
    ).localCheckpoint()
    frontier = visited
    for hop in range(1, max_iter + 1):
        nxt = (
            frontier.join(both, frontier.cell_id == both.cell_id_a)
            .select(F.col("cell_id_b").alias("cell_id"))
            .distinct()
            .join(visited.select("cell_id"), "cell_id", "left_anti")
            .withColumn("hop", F.lit(hop).cast("long"))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            release_local_checkpoint(nxt)
            break
        new_visited = visited.unionByName(nxt).localCheckpoint()
        # both superseded checkpoints' blocks are dead once the union
        # materializes (eager) — release them instead of accumulating
        # O(diameter) persisted block sets over the sweep
        release_local_checkpoint(visited)
        if frontier is not visited:
            release_local_checkpoint(frontier)
        visited, frontier = new_visited, nxt
    if frontier is not visited:
        release_local_checkpoint(frontier)
    release_local_checkpoint(both)
    return visited


def cell_graph_diameter(
    dual_edges: DataFrame,
    exact_cutoff: int | None = None,
    algo: str = "auto",
    sweeps: int | None = None,
) -> DataFrame:
    """T7 — max-hop diameter of the cell dual graph with the reference's
    exact/approx size switch
    (/root/reference/include/osmtools/OsmTriangulationRegionStore.h:513 —
    EXACT_DIAMETER_MAX_UNITS): exact all-pairs BFS when the node count is
    under the cutoff, randomized double-sweep beyond (cells/hopsplit.
    max_hop_pair — the same kernel the T6 splitter uses per cell).

    ``algo`` (the cell_hop_distances dispatch pattern):
    - 'auto': dimension-scale edge sets (≤ LOCAL_BFS_MAX_EDGES, gated and
      fetched by ONE limit(N+1) job) run driver-local numpy; larger graphs
      fall through to 'loop' — the reference's own posture is "approximate
      beyond the cutoff, never fail"
      (/root/reference/src/OsmTriangulationRegionStore.cpp:100-132).
    - 'loop': fully distributed double-sweep — ``sweeps`` deterministic
      seeds (hash-ordered node picks, the Spark-determinism analog of the
      reference's rng), each seed runs two cell_hop_distances(algo='loop')
      BFS sweeps (id-only shuffles, O(diameter) rounds); the result is the
      max second-sweep eccentricity.  Exact on trees and a lower bound in
      general, like the reference's approximation; on grid-shaped dual
      graphs the sweep lands on the periphery and matches the exact answer
      (driver-oracled on the fixture).

    Returns one row (n_nodes, n_edges, diameter) — diameter is the max
    eccentricity over all components (nodes = edge endpoints; isolated ids
    have no hops to measure)."""
    from libosmtools_spark.cells.hopsplit import (
        APPROX_DIAMETER_RUNS,
        EXACT_DIAMETER_PRACTICAL,
        max_hop_pair,
    )

    assert algo in ("auto", "loop")
    if exact_cutoff is None:
        exact_cutoff = EXACT_DIAMETER_PRACTICAL
    spark = dual_edges.sparkSession
    edges = dual_edges.select("cell_id_a", "cell_id_b")
    if algo == "auto":
        # ONE job both gates and fetches (the cell_hop_distances pattern)
        pdf = edges.limit(LOCAL_BFS_MAX_EDGES + 1).toPandas()
        if len(pdf) > LOCAL_BFS_MAX_EDGES:
            algo = "loop"
    if algo == "loop":
        if sweeps is None:
            sweeps = APPROX_DIAMETER_RUNS
        nodes = (
            edges.select(F.col("cell_id_a").alias("cell_id"))
            .unionByName(edges.select(F.col("cell_id_b").alias("cell_id")))
            .distinct()
            .localCheckpoint()
        )
        n_nodes = nodes.count()
        n_edges = edges.count()
        if n_nodes == 0:
            release_local_checkpoint(nodes)
            return spark.createDataFrame(
                [(0, 0, 0)], "n_nodes long, n_edges long, diameter long"
            )
        # deterministic pseudo-random seeds: hash order over node ids —
        # a bounded driver collect (``sweeps`` rows, never grows with n)
        seed_rows = (
            nodes.orderBy(F.xxhash64("cell_id"), F.col("cell_id")).limit(sweeps).collect()
        )
        release_local_checkpoint(nodes)
        diam = 0
        for row in seed_rows:
            d1 = cell_hop_distances(edges, int(row.cell_id), algo="loop")
            far = d1.orderBy(F.desc("hop"), F.asc("cell_id")).limit(1).collect()[0]
            release_local_checkpoint(d1)
            d2 = cell_hop_distances(edges, int(far.cell_id), algo="loop")
            ecc = d2.agg(F.max("hop").alias("m")).collect()[0].m
            release_local_checkpoint(d2)
            # both sweeps' eccentricities are valid lower bounds
            diam = max(diam, int(far.hop), int(ecc))
        return spark.createDataFrame(
            [(int(n_nodes), int(n_edges), int(diam))],
            "n_nodes long, n_edges long, diameter long",
        )
    a = pdf["cell_id_a"].to_numpy(dtype=np.int64)
    b = pdf["cell_id_b"].to_numpy(dtype=np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    if len(nodes) == 0:
        return spark.createDataFrame(
            [(0, 0, 0)], "n_nodes long, n_edges long, diameter long"
        )
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    src = np.concatenate([ai, bi])
    dst = np.concatenate([bi, ai])
    order = np.argsort(src, kind="stable")
    src_s, dst_s = src[order], dst[order]
    starts = np.searchsorted(src_s, np.arange(len(nodes) + 1))
    adj = [dst_s[starts[i]: starts[i + 1]] for i in range(len(nodes))]
    _, _, diam = max_hop_pair(adj, exact_cutoff)
    return spark.createDataFrame(
        [(int(len(nodes)), int(len(pdf)), int(diam))],
        "n_nodes long, n_edges long, diameter long",
    )


def cell_graph_diameter_endpoints(
    dual_edges: DataFrame, exact_cutoff: int | None = None
) -> DataFrame:
    """T7 parity detail: the reference's ``calcDiameter(startNode, endNode)``
    reports the argmax ENDPOINTS, not just the hop count
    (/root/reference/include/osmtools/OsmTriangulationRegionStore.h:83).

    Exact dimension-scale path (the dual graph is interned-cell-scale by
    construction): all-pairs BFS with a PINNED tie rule — among every pair
    at max eccentricity, return the lexicographically smallest
    ``(endpoint_a, endpoint_b)`` with ``endpoint_a < endpoint_b`` (the
    reference's first-found pair depends on thread interleaving; a
    deterministic rule is the Spark-reproducibility analog).  Graphs past
    ``LOCAL_BFS_MAX_EDGES`` degrade to the seeded double-sweep: endpoints of
    the best sweep found (a lower-bound witness pair — the same
    approximation posture as the reference past its cutoff)."""
    from libosmtools_spark.cells.hopsplit import (
        APPROX_DIAMETER_RUNS,
        EXACT_DIAMETER_PRACTICAL,
        _bfs,
    )

    if exact_cutoff is None:
        exact_cutoff = EXACT_DIAMETER_PRACTICAL
    spark = dual_edges.sparkSession
    schema = (
        "n_nodes long, n_edges long, diameter long, endpoint_a long, endpoint_b long"
    )
    edges = dual_edges.select("cell_id_a", "cell_id_b")
    pdf = edges.limit(LOCAL_BFS_MAX_EDGES + 1).toPandas()
    if len(pdf) > LOCAL_BFS_MAX_EDGES:
        # distributed double-sweep witness pair (deterministic seed rule
        # shared with cell_graph_diameter's loop path)
        nodes_df = (
            edges.select(F.col("cell_id_a").alias("cell_id"))
            .unionByName(edges.select(F.col("cell_id_b").alias("cell_id")))
            .distinct()
            .localCheckpoint()
        )
        n_nodes, n_edges = nodes_df.count(), edges.count()
        seed_rows = (
            nodes_df.orderBy(F.xxhash64("cell_id"), F.col("cell_id"))
            .limit(APPROX_DIAMETER_RUNS)
            .collect()
        )
        release_local_checkpoint(nodes_df)
        best = (0, 0, 0)  # (diam, a, b)
        for row in seed_rows:
            d1 = cell_hop_distances(edges, int(row.cell_id), algo="loop")
            far = d1.orderBy(F.desc("hop"), F.asc("cell_id")).limit(1).collect()[0]
            release_local_checkpoint(d1)
            d2 = cell_hop_distances(edges, int(far.cell_id), algo="loop")
            far2 = d2.orderBy(F.desc("hop"), F.asc("cell_id")).limit(1).collect()[0]
            release_local_checkpoint(d2)
            u, v = sorted((int(far.cell_id), int(far2.cell_id)))
            cand = (int(far2.hop), u, v)
            if cand[0] > best[0] or (cand[0] == best[0] and cand[1:] < best[1:]):
                best = cand
        return spark.createDataFrame(
            [(int(n_nodes), int(n_edges), best[0], best[1], best[2])], schema
        )
    a = pdf["cell_id_a"].to_numpy(dtype=np.int64)
    b = pdf["cell_id_b"].to_numpy(dtype=np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    if len(nodes) == 0:
        return spark.createDataFrame([(0, 0, 0, 0, 0)], schema)
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    src = np.concatenate([ai, bi])
    dst = np.concatenate([bi, ai])
    order = np.argsort(src, kind="stable")
    src_s, dst_s = src[order], dst[order]
    starts = np.searchsorted(src_s, np.arange(len(nodes) + 1))
    adj = [dst_s[starts[i]: starts[i + 1]] for i in range(len(nodes))]
    diam, ea, eb = 0, int(nodes[0]), int(nodes[0])
    for s in range(len(adj)):
        d = _bfs(adj, s)
        ecc = int(d.max())
        if ecc < diam:
            continue
        # all argmax partners of s at this eccentricity; pin the smallest
        # sorted (a, b) pair among ties
        for t in np.flatnonzero(d == ecc):
            u, v = sorted((int(nodes[s]), int(nodes[t])))
            if ecc > diam or (u, v) < (ea, eb):
                diam, ea, eb = ecc, u, v
    return spark.createDataFrame(
        [(int(len(nodes)), int(len(pdf)), diam, ea, eb)], schema
    )


def cell_sizes(point_cells: DataFrame) -> DataFrame:
    """T10: per-cell point count + representative (first point id seen —
    deterministic: min id).  (/root/reference/src/OsmTriangulationRegionStore.cpp:280-292)."""
    id_col = [c for c in point_cells.columns if c not in ("cell_key", "cell_id")][0]
    return point_cells.groupBy("cell_id").agg(
        F.count("*").alias("n_points"), F.min(id_col).alias("representative")
    )


def cell_center_of_mass(point_cells_latlon: DataFrame) -> DataFrame:
    """T11: mean of member point coords per cell
    (/root/reference/src/OsmTriangulationRegionStore.cpp:294-320 — mean of
    face centroids; points are our faces' sample set).

    The mean is computed over EXACT integer micro-degree sums (coords are
    1e-6-snapped by the G5 contract, so round(lat·1e6) is the exact snap
    integer and the int64 sum is exact), finished by two IEEE divisions —
    the result is bit-identical in any engine and ANY partition/summation
    order, unlike a float avg() whose value varies run-to-run with Spark's
    partition order.  SQL mirror: (CAST(sum(CAST(round(lat*1000000.0) AS
    BIGINT)) AS DOUBLE) / count(*)) / 1000000.0."""
    lat_u = F.round(F.col("lat") * 1e6).cast("long")
    lon_u = F.round(F.col("lon") * 1e6).cast("long")
    agg = point_cells_latlon.groupBy("cell_id").agg(
        F.count("*").alias("n_points"),
        F.sum(lat_u).alias("_slat"),
        F.sum(lon_u).alias("_slon"),
    )
    n = F.col("n_points").cast("double")
    return agg.select(
        "cell_id",
        "n_points",
        (F.col("_slat").cast("double") / n / F.lit(1e6)).alias("com_lat"),
        (F.col("_slon").cast("double") / n / F.lit(1e6)).alias("com_lon"),
    )


def region_cells_inverted(cells: DataFrame) -> DataFrame:
    """T12: region_id → cells containing it (one row per pair)
    (/root/reference/include/osmtools/OsmTriangulationRegionStore.h:538-553)."""
    return cells.select("cell_key", "cell_id", F.explode("region_ids").alias("region_id"))


def cell_stats(point_cells: DataFrame, exact_median: bool = False) -> DataFrame:
    """T22: min/max/median/mean points per cell, cell 0 excluded
    (/root/reference/src/OsmTriangulationRegionStore.cpp:1088-1111).

    ``exact_median=False`` (default): percentile_approx — the per-cell
    sizes table can itself be large at 10^12 rows and the exact percentile
    funnels every group value through one task.  ``exact_median=True``:
    Spark's exact linear-interpolation percentile — same definition as
    DuckDB quantile_cont, used by the driver oracle.  The mean is
    sum(int)/count (exact integer sum, one IEEE division) either way."""
    sizes = point_cells.filter(F.col("cell_id") != 0).groupBy("cell_id").agg(
        F.count("*").alias("n")
    )
    median = (
        F.expr("percentile(n, 0.5)") if exact_median else F.expr("percentile_approx(n, 0.5)")
    )
    return sizes.agg(
        F.min("n").alias("min_points"),
        F.max("n").alias("max_points"),
        median.alias("median_points"),
        (F.sum("n").cast("double") / F.count("*").cast("double")).alias("mean_points"),
        F.count("*").alias("n_cells"),
    )


def cell_centers(cells: DataFrame) -> DataFrame:
    """cell midpoints (T3 analog) as columns."""
    clat, clon = cell_center_cols(F.col("cell_key"))
    return cells.select("cell_key", clat.alias("center_lat"), clon.alias("center_lon"))


def _set_diam2(cla, clo) -> float:
    """Exact max squared euclidean (degree) distance of one point set.

    Convex hull first (Andrew's monotone chain): the farthest pair of a
    finite point set is a pair of hull vertices, so the pairwise max runs
    over the (tiny) hull instead of all n² pairs — same value, computed by
    the identical dlat²+dlon² expression, so the result is bit-equal to
    the old quadratic scan (the max pair's arithmetic is unchanged).
    NaN coordinates fall back to the legacy chunked quadratic scan to
    preserve its propagation semantics exactly."""
    import numpy as np

    n = len(cla)
    if n < 2:
        return 0.0
    # NaN check BEFORE the 2-point shortcut: the legacy scan's
    # max(0.0, nan) kept 0.0 for a NaN pair, and the fallback reproduces
    # that; a bare subtraction would return NaN instead
    if np.isnan(cla).any() or np.isnan(clo).any():
        best = 0.0
        chunk = max(1, 4_000_000 // n)
        for i0 in range(0, n, chunk):
            sl = slice(i0, i0 + chunk)
            d2 = (cla[sl, None] - cla[None, :]) ** 2 + (clo[sl, None] - clo[None, :]) ** 2
            best = max(best, float(d2.max()))
        return best
    if n == 2:
        return float((cla[0] - cla[1]) ** 2 + (clo[0] - clo[1]) ** 2)
    order = np.lexsort((cla, clo))
    xs, ys = clo[order], cla[order]

    def chain(idx):
        stack: list = []
        for i in idx:
            while len(stack) >= 2:
                a, b = stack[-2], stack[-1]
                if (xs[b] - xs[a]) * (ys[i] - ys[a]) - (ys[b] - ys[a]) * (xs[i] - xs[a]) <= 0:
                    stack.pop()
                else:
                    break
            stack.append(i)
        return stack

    hull = np.unique(np.concatenate([chain(range(n)), chain(range(n - 1, -1, -1))]))
    hy, hx = ys[hull], xs[hull]
    # hull size is usually tiny, but points in convex position keep it at
    # ~n — chunk the pairwise max like the legacy scan so the temporaries
    # stay bounded instead of allocating an h×h matrix
    h = len(hull)
    best = 0.0
    chunk = max(1, 4_000_000 // h)
    for i0 in range(0, h, chunk):
        sl = slice(i0, i0 + chunk)
        d2 = (hy[sl, None] - hy[None, :]) ** 2 + (hx[sl, None] - hx[None, :]) ** 2
        best = max(best, float(d2.max()))
    return best


def cell_diameter(point_cells_latlon: DataFrame) -> DataFrame:
    """(cell_key, n, diam2): exact per-cell point-set diameter (max squared
    euclidean degrees, the kNN metric).

    Per cell the farthest pair is found via convex hull + a pairwise max
    over hull vertices (_set_diam2) — O(n log n) instead of the former
    chunked all-pairs scan, exact same output.  The per-cell grouping (one
    task per cell) is unchanged, so the operator still exposes cell-size
    skew: a hot cell's work serializes on one task until
    cells/refine.refine_oversized bounds it — bench.py's skew probe
    measures that before/after (the analytic Σn² work_ratio evidences the
    bound; walls now measure the subquadratic operator)."""
    import numpy as np
    import pandas as pd

    # group by hash BUCKETS of cells, not per cell: one Arrow round-trip
    # per bucket with numpy sort-grouping inside (per-group applyInPandas
    # overhead at ~8k cells dwarfed the actual geometry), while each cell
    # still lands wholly in one task — the skew exposure is unchanged.
    n_buckets = 256

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = pdf["cell_key"].to_numpy(dtype=np.int64)
        la = pdf["lat"].to_numpy(dtype=np.float64)
        lo = pdf["lon"].to_numpy(dtype=np.float64)
        order = np.argsort(keys, kind="stable")
        keys, la, lo = keys[order], la[order], lo[order]
        uniq, starts = np.unique(keys, return_index=True)
        ends = np.append(starts[1:], len(keys))
        ns, diams = np.empty(len(uniq), dtype=np.int64), np.empty(len(uniq))
        for i, (s, e) in enumerate(zip(starts, ends)):
            ns[i] = e - s
            diams[i] = _set_diam2(la[s:e], lo[s:e])
        return pd.DataFrame({"cell_key": uniq, "n": ns, "diam2": diams})

    return (
        point_cells_latlon.filter(F.col("cell_key").isNotNull())
        .withColumn("_bkt", F.pmod(F.xxhash64("cell_key"), F.lit(n_buckets)))
        .groupBy("_bkt")
        .applyInPandas(per_bucket, "cell_key long, n long, diam2 double")
    )
