"""Strict-parity cell splitting: hop-BFS voronoi growth inside one cell
(T6/T7/T8/T23), for runs where the reference's exact splitting semantics are
wanted instead of the grid-native quadtree split of cells/refine.py.

The reference splits an oversized cell by picking far-apart generator faces
(max-hop BFS) and growing new cells by hop distance
(/root/reference/src/OsmTriangulationRegionStore.cpp:593-759).  Its diameter
computation switches from exact all-pairs BFS to a 10-run randomized
double-sweep above 50,000 faces
(/root/reference/src/OsmTriangulationRegionStore.cpp:100-132) — kept here as
EXACT_DIAMETER_MAX_UNITS.

Spark shape: each cell's member units (grid sub-cells one level deeper play
the role of triangulation faces) are grouped with ``applyInPandas``; inside
the group everything is numpy BFS over the local 4/8-neighbor adjacency —
vectorized per frontier, no Python per-edge loops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libosmtools_spark.geom import kernels as K

#: exact/approx diameter switch, mirroring the reference's 50k-face cutoff
EXACT_DIAMETER_MAX_UNITS = 50_000
#: double-sweep runs above the cutoff (reference: 10)
APPROX_DIAMETER_RUNS = 10
#: reference default: split up to this many generators per round (:593-759)
DEFAULT_SPLIT_PER_RUN = 2


def _local_adjacency(iys: np.ndarray, ixs: np.ndarray, nlon: int):
    """index lookup + neighbor lists (4-neighborhood with lon wrap) for the
    units of one cell.  Returns list-of-arrays adjacency."""
    pos = {(int(y), int(x)): i for i, (y, x) in enumerate(zip(iys, ixs))}
    adj = []
    for y, x in zip(iys, ixs):
        nbrs = []
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            key = (int(y + dy), int((x + dx) % nlon))
            j = pos.get(key)
            if j is not None:
                nbrs.append(j)
        adj.append(np.array(nbrs, dtype=np.int64))
    return adj


def _bfs(adj, start: int) -> np.ndarray:
    """Hop distances from start (T23,
    /root/reference/src/OsmTriangulationRegionStore.cpp:431-452)."""
    n = len(adj)
    dist = np.full(n, -1, dtype=np.int64)
    dist[start] = 0
    frontier = [start]
    d = 0
    while frontier:
        d += 1
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if dist[v] < 0:
                    dist[v] = d
                    nxt.append(int(v))
        frontier = nxt
    return dist


def _multi_source_bfs(adj, sources: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """(owner, dist) growth from several generators at once — the voronoi
    expansion of refineCells; ties go to the lower generator index
    (deterministic)."""
    n = len(adj)
    dist = np.full(n, -1, dtype=np.int64)
    owner = np.full(n, -1, dtype=np.int64)
    frontier = []
    for gi, s in enumerate(sorted(sources)):
        dist[s] = 0
        owner[s] = gi
        frontier.append(s)
    while frontier:
        nxt = []
        for u in frontier:  # frontier order preserves deterministic ties
            for v in adj[u]:
                if dist[v] < 0:
                    dist[v] = dist[u] + 1
                    owner[v] = owner[u]
                    nxt.append(int(v))
        frontier = nxt
    return owner, dist


#: practical exact cutoff for the Python BFS (the reference's 50k is tuned
#: for threaded C++; all-pairs at 50k units is not sensible in-UDF)
EXACT_DIAMETER_PRACTICAL = 2_000


def max_hop_pair(adj, exact_cutoff: int = EXACT_DIAMETER_PRACTICAL) -> tuple[int, int, int]:
    """(u, v, diameter_hops): exact all-pairs BFS when small, randomized
    double-sweep above the cutoff (T7's exact/approx switch; reference
    constant EXACT_DIAMETER_MAX_UNITS retained as the documented knob)."""
    n = len(adj)
    if n <= 1:
        return 0, 0, 0
    if n <= exact_cutoff:
        best = (0, 0, 0)
        for s in range(n):
            d = _bfs(adj, s)
            far = int(d.argmax())
            if d[far] > best[2]:
                best = (s, far, int(d[far]))
        return best
    rng = np.random.default_rng(42)
    best = (0, 0, 0)
    for _ in range(APPROX_DIAMETER_RUNS):
        s = int(rng.integers(0, n))
        d1 = _bfs(adj, s)
        u = int(d1.argmax())
        d2 = _bfs(adj, u)
        v = int(d2.argmax())
        if d2[v] > best[2]:
            best = (u, v, int(d2[v]))
    return best


def split_oversized_cells_hopbfs(
    point_cells: DataFrame,
    max_points: int,
    level: int = 6,
    sub_levels: int = 3,
    split_per_run: int = DEFAULT_SPLIT_PER_RUN,
) -> DataFrame:
    """points(…, lat, lon, cell_key, cell_id) → + ``refined_cell_id``.

    Oversized cells (> max_points members) are split by growing
    ``split_per_run + 1`` voronoi sub-cells from max-hop generators over the
    sub-grid adjacency ``sub_levels`` deeper — the reference's exact
    mechanism, expressed per-cell inside a grouped pandas UDF.  Small cells
    pass through with refined == original."""
    from libosmtools_spark.geom.columns import cell_key_col

    sub_level = level + sub_levels
    nlon_sub = 2 << sub_level
    # pure-Column sub-key (no UDF)
    with_sub = point_cells.withColumn("sub_key", cell_key_col(F.col("lat"), F.col("lon"), sub_level))

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in with_sub.schema.fields
    ) + ", refined_cell_id string"

    def split(pdf: pd.DataFrame) -> pd.DataFrame:
        cid = int(pdf["cell_id"].iloc[0])
        if len(pdf) <= max_points:
            pdf = pdf.copy()
            pdf["refined_cell_id"] = str(cid)
            return pdf
        units, inv = np.unique(pdf["sub_key"].to_numpy(), return_inverse=True)
        _, iys, ixs = K.unpack_key(units)
        adj = _local_adjacency(iys, ixs, nlon_sub)
        u, v, _ = max_hop_pair(adj)
        gens = [u, v]
        # extra generators: farthest from current set, greedily
        while len(gens) < split_per_run + 1 and len(gens) < len(units):
            _, dist = _multi_source_bfs(adj, gens)
            cand = int(dist.argmax())
            if dist[cand] <= 0:
                break
            gens.append(cand)
        owner, _ = _multi_source_bfs(adj, gens)
        owner[owner < 0] = 0  # disconnected units join generator 0
        pdf = pdf.copy()
        pdf["refined_cell_id"] = [f"{cid}.{int(o)}" for o in owner[inv]]
        return pdf

    return with_sub.groupBy("cell_id").applyInPandas(split, out_schema)
