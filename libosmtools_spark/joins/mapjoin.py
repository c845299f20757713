"""Zero-shuffle flagship: the broadcast-store map-side spatial join.

The reference's query path is a per-point lookup against an in-memory
GridRegionTree (/root/reference/include/osmtools/OsmGridRegionTree.h:109-151)
— no data movement at all.  When the polygon store + cell index broadcast
(the normal case: the store is a dimension table), the Spark-faithful
translation is a single ``mapInArrow`` pass:

    pages → geocode + cell_key (JVM Columns) → one Arrow-batched map that
    resolves each point's region set from the broadcast index (definite
    hits free, candidates ray-cast) → (url, cell_key, region_ids)

ZERO shuffles, embarrassingly parallel, scales linearly with executors —
this is the plan that survives 10^12 rows.  The join-based path
(joins/spatial.py) remains for stores too large to broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libosmtools_spark.geom import kernels as K


def build_cell_candidates(cell_index_pdf: pd.DataFrame, rings: dict | None = None) -> dict:
    """cell_key → (sorted region_id array, full-flag array, clipped-edge
    list) from the collected cell-coverage index (dimension-scale).

    When ``rings`` (region_id → (outers, inners)) is given, each partial
    candidate's boundary is PRE-CLIPPED to the cell (kernels.
    clip_edges_for_cell): a planet-size ring shrinks to the few edges near
    the cell, which is where the ray-cast cost goes.  Parity over the
    combined outer+inner edge set is the even-odd rule — equivalent to
    inside(outer) ∧ ¬inside(hole) for nested holes (the region model)."""
    out: dict[int, tuple[np.ndarray, np.ndarray, list]] = {}
    for key, grp in cell_index_pdf.groupby("cell_key"):
        order = np.argsort(grp["region_id"].to_numpy())
        rids = grp["region_id"].to_numpy()[order].astype(np.int64)
        full = grp["full"].to_numpy()[order].astype(bool)
        clipped: list = [None] * len(rids)
        if rings is not None:
            min_lat, max_lat, min_lon, _ = K.cell_bounds(np.int64(key))
            for i, (rid, is_full) in enumerate(zip(rids, full)):
                if is_full:
                    continue
                outers, inners = rings[int(rid)]
                edges = np.vstack([K.ring_edges(r) for r in list(outers) + list(inners)])
                clipped[i] = K.clip_edges_for_cell(edges, float(min_lat), float(max_lat), float(min_lon))
        out[int(key)] = (rids, full, clipped)
    return out


#: the single-long bitmask path needs global region ids ≤ MASK_MAX_REGION;
#: larger stores use the multi-word mask (array<long>)
MASK_MAX_REGION = 62


def map_spatial_join(
    points: DataFrame,
    candidates_bcast,
    rings_bcast,
    id_col: str = "url",
    lat: str = "lat",
    lon: str = "lon",
    n_regions: int | None = None,
) -> DataFrame:
    """points(id, lat, lon, cell_key) → (id, cell_key, region_ids array).

    Per Arrow batch: group point rows by cell (np.unique — points in the
    same cell share the same candidate set), assign definite regions
    without a geometry test, ray-cast the candidates, and OR each hit into
    a per-point int64 BITMASK (multi-word for stores >62 regions) — pure
    integer vector ops, no Python-object strings in the hot path (string
    assembly doubled CPU time at high thread counts from memory stalls).
    Masks are decoded to sorted region-id arrays JVM-side."""
    if n_regions is None:
        n_regions = 1 + max(
            (int(r) for rids, _, _ in candidates_bcast.value.values() for r in rids),
            default=0,
        )
    n_words = max(1, (n_regions + 62) // 63)
    id_type = dict(points.dtypes)[id_col]
    # mask words as FLAT int64 columns (m0, m1, …): each is a plain numpy
    # column through Arrow — no per-row Python list objects (at millions of
    # rows per batch the list-of-arrays assembly dominated UDF time)
    word_cols = ", ".join(f"m{w} long" for w in range(n_words))
    schema = f"{id_col} {id_type}, cell_key long, {word_cols}"

    # sorted candidate-cell key array for vectorized membership tests —
    # at planet scale most cells (ocean) have no regions; looping over
    # them in Python would dominate sparse batches
    cand_keys_sorted = np.array(sorted(candidates_bcast.value.keys()), dtype=np.int64)

    def run(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        cands = candidates_bcast.value
        rings = rings_bcast.value
        nan = pa.scalar(float("nan"), type=pa.float64())
        for batch in batches:
            n = batch.num_rows
            # Arrow-native I/O (mapInArrow): the id column passes through as
            # an Arrow buffer — a pandas round-trip would materialize
            # millions of Python string objects per task, which dominated
            # allocator time at high thread counts.
            la = pc.fill_null(batch.column(lat).cast(pa.float64()), nan).to_numpy(
                zero_copy_only=False
            )
            lo = pc.fill_null(batch.column(lon).cast(pa.float64()), nan).to_numpy(
                zero_copy_only=False
            )
            # cell_key is NULL-free by construction (NULL → -1 sentinel
            # JVM-side below), so the int64 Arrow buffer converts straight
            # to int64 numpy; any float detour would silently round level-6
            # keys (~2.2e17 — past float64's 53-bit exact-integer range) and
            # corrupt the whole batch — the asarray int64 check raises
            # loudly if that ever regresses.
            keys = np.asarray(batch.column("cell_key").to_numpy(), dtype=np.int64)
            masks = np.zeros((n, n_words), dtype=np.int64)
            valid = keys >= 0
            vkeys = keys[valid]
            vidx = np.flatnonzero(valid)
            # sort the batch by cell key ONCE; each cell is then a
            # contiguous slice (no per-cell O(n) boolean scans)
            order = np.argsort(vkeys, kind="stable")
            skeys = vkeys[order]
            sidx = vidx[order]
            uniq, starts = np.unique(skeys, return_index=True)
            ends = np.append(starts[1:], len(skeys))
            # vectorized: keep only cells that actually have candidates
            if len(cand_keys_sorted):
                pos = np.searchsorted(cand_keys_sorted, uniq)
                pos[pos >= len(cand_keys_sorted)] = len(cand_keys_sorted) - 1
                has_cand = cand_keys_sorted[pos] == uniq
            else:
                has_cand = np.zeros(len(uniq), dtype=bool)
            for u in np.flatnonzero(has_cand):
                sel = sidx[starts[u] : ends[u]]
                cand = cands.get(int(uniq[u]))
                if cand is None:
                    continue
                rids, full, clipped = cand
                la_sel = la[sel]  # copy once per cell, not per region
                lo_sel = lo[sel]
                for i, (rid, is_full) in enumerate(zip(rids, full)):
                    word, bit = divmod(int(rid), 63)
                    if is_full:
                        masks[sel, word] |= np.int64(1) << np.int64(bit)
                        continue
                    if clipped[i] is not None:
                        hit = K.point_in_edges(la_sel, lo_sel, clipped[i])
                    else:
                        outers, inners = rings[int(rid)]
                        hit = K.point_in_rings(la_sel, lo_sel, outers, inners)
                    masks[sel[hit], word] |= np.int64(1) << np.int64(bit)
            arrays = [batch.column(id_col), batch.column("cell_key")]
            names = [id_col, "cell_key"]
            for w in range(n_words):
                arrays.append(pa.array(np.ascontiguousarray(masks[:, w])))
                names.append(f"m{w}")
            yield pa.RecordBatch.from_arrays(arrays, names)

    # NULL cell_key (geocode miss) → -1 sentinel so the Arrow column stays
    # int64 end-to-end (see the dtype note inside run); restored below.
    pts = points.select(
        id_col, lat, lon, F.coalesce(F.col("cell_key"), F.lit(-1).cast("long")).alias("cell_key")
    )
    out = pts.mapInArrow(run, schema).withColumn(
        "mask", F.array(*[F.col(f"m{w}") for w in range(n_words)])
    )
    # decode: for word w and bit b, region id = w*63 + b
    decode = F.expr(
        "filter(flatten(transform(mask, (m, w) -> "
        "transform(sequence(0, 62), b -> CASE WHEN (m >> b) & 1 = 1 THEN w * 63 + b END)"
        ")), x -> x IS NOT NULL)"
    ).cast("array<int>")
    restore_key = F.when(F.col("cell_key") >= 0, F.col("cell_key"))
    return out.select(id_col, restore_key.alias("cell_key"), decode.alias("region_ids"))
