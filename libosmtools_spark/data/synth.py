"""Deterministic synthetic fixtures (FIXTURES.md; SURVEY.md §5).

Generates, with a fixed seed, the spatial test corpus the reference has no
equivalent of (it ships zero test files — /root/reference/CMakeLists.txt:26-29):

- ``pages``: Common-Crawl-style web pages per BASELINE.json input_hint
  ``(url, warc_ts, html, text, lang)`` with a geocode embedded
  deterministically in ``text`` (byte-identical extraction asserted
  end-to-end).
- ``regions`` / ``region_rings``: a golden polygon store exercising
  overlaps, nesting, holes, multipolygons, and a sliver.
- ``nodes`` / ``ways`` / ``relations``: extraction-phase inputs mirroring
  the AreaExtractor semantics (/root/reference/src/AreaExtractor.cpp).
- golden outputs via brute-force numpy oracles: page→regions, cells
  dictionary, page→cell, kNN.

Everything is snapped to 1e-6 degrees (G5) before use so PIP results are
machine-independent.
"""

from __future__ import annotations

import datetime as _dt
import os

import numpy as np
import pandas as pd

from libosmtools_spark.geom import kernels as K

SEED = 42

#: cell level used by fixtures + golden outputs (cell side = 180/2^6 = 2.8125°)
FIXTURE_LEVEL = 6

#: rows per scale factor (pages)
SF_ROWS = {"0.001": 2_000, "0.01": 20_000, "0.1": 200_000}

KNN_K = 5


# ---------------------------------------------------------------------------
# region store
# ---------------------------------------------------------------------------

def region_spec():
    """The golden polygon store: list of dicts
    {region_id, name, rings: [(role, np.ndarray)], tags}.

    Designed per FIXTURES.md §3: overlapping pair, nested regions, polygon
    with hole, multipolygon with 3 outers, and a sliver (diameter-split
    trigger, /root/reference/src/CellCriteria.cpp:77-93).  region_id is the
    dense insertion index
    (/root/reference/include/osmtools/OsmGridRegionTree.h:186-200).
    """
    R = K.rect_ring
    tri = lambda pts: K.snap(np.array(pts + pts[:1], dtype=np.float64))  # noqa: E731
    specs = [
        # 0/1: overlapping pair → points in both → multi-element region sets
        ("overlap_a", [("outer", R(10.0, 10.0, 20.0, 20.0))]),
        ("overlap_b", [("outer", R(15.0, 15.0, 25.0, 25.0))]),
        # 2/3: nested region-inside-region
        ("nest_outer", [("outer", R(-30.0, 40.0, -10.0, 60.0))]),
        ("nest_inner", [("outer", R(-25.0, 45.0, -15.0, 55.0))]),
        # 4: polygon with hole
        ("holed", [("outer", R(30.0, -60.0, 45.0, -40.0)), ("inner", R(35.0, -55.0, 40.0, -45.0))]),
        # 5: multipolygon with 3 outers
        (
            "multi3",
            [
                ("outer", R(-50.0, -170.0, -45.0, -160.0)),
                ("outer", R(-50.0, -150.0, -45.0, -140.0)),
                ("outer", R(-60.0, -165.0, -55.0, -155.0)),
            ],
        ),
        # 6: sliver (thin, long)
        ("sliver", [("outer", R(50.0, 0.0, 50.2, 30.0))]),
        # 7: triangle (non-rectilinear edges for the ray-cast path)
        ("triangle", [("outer", tri([[60.0, 60.0], [70.0, 80.0], [60.0, 100.0]]))]),
        # 8: near-antimeridian region (east side)
        ("dateline_east", [("outer", R(-5.0, 170.0, 5.0, 179.5))]),
        # 9: dense urban hotspot target (most clustered points land here)
        ("urban", [("outer", R(48.0, 11.0, 48.4, 11.8))]),
        # 10: antimeridian-CROSSING region (continuous-frame convention:
        # lon runs 174 → 186, i.e. across ±180 to -174) — exercises
        # wrapped coverage keys + frame-shifted PIP through the whole
        # flagship pipeline and its brute-force goldens
        ("dateline_cross", [("outer", R(20.0, 174.0, 30.0, 186.0))]),
    ]
    out = []
    for rid, (name, rings) in enumerate(specs):
        out.append(
            {
                "region_id": rid,
                "name": name,
                "rings": [(role, K.snap(r)) for role, r in rings],
                "tags": {"name": name, "boundary": "administrative"},
            }
        )
    return out


def regions_frames(specs=None):
    """→ (regions_df, region_rings_df) pandas frames (FIXTURES.md §3 schemas)."""
    specs = specs or region_spec()
    reg_rows, ring_rows = [], []
    for s in specs:
        pts = np.vstack([r for _, r in s["rings"]])
        reg_rows.append(
            {
                "region_id": s["region_id"],
                "name": s["name"],
                "tags": s["tags"],
                "min_lat": float(pts[:, 0].min()),
                "max_lat": float(pts[:, 0].max()),
                "min_lon": float(pts[:, 1].min()),
                "max_lon": float(pts[:, 1].max()),
            }
        )
        for ring_id, (role, ring) in enumerate(s["rings"]):
            ring_rows.append(
                {
                    "region_id": s["region_id"],
                    "ring_id": ring_id,
                    "ring_role": role,
                    "points": [{"lat": float(a), "lon": float(o)} for a, o in ring],
                }
            )
    return pd.DataFrame(reg_rows), pd.DataFrame(ring_rows)


# ---------------------------------------------------------------------------
# pages
# ---------------------------------------------------------------------------

def gen_points(n: int, rng: np.random.Generator):
    """~80% clustered in dense 'urban' cells, ~20% uniform, plus adversarial
    points (FIXTURES.md §1)."""
    n_cluster = int(n * 0.8)
    n_unif = n - n_cluster
    # three hotspots; the first gets half of all clustered mass (skew!)
    centers = np.array([[48.2, 11.4], [17.5, 17.5], [-20.0, 50.0]])
    w = np.array([0.5, 0.3, 0.2])
    which = rng.choice(3, size=n_cluster, p=w)
    lat = centers[which, 0] + rng.normal(0, 0.15, n_cluster)
    lon = centers[which, 1] + rng.normal(0, 0.15, n_cluster)
    ulat = rng.uniform(-85, 85, n_unif)
    ulon = rng.uniform(-180, 180, n_unif)
    lats = np.concatenate([lat, ulat])
    lons = np.concatenate([lon, ulon])
    # adversarial overrides on the first rows: vertices, edges, hole-inside,
    # outside-all (cell 0), near antimeridian
    adv = [
        (10.0, 10.0),     # region vertex
        (15.0, 20.0),     # shared edge of overlap pair
        (37.0, -50.0),    # inside the hole of 'holed' → not in region 4
        (-80.0, 100.0),   # outside all regions → cell_id 0
        (0.0, 179.8),     # near antimeridian, inside dateline_east
        (0.0, -179.9),    # near antimeridian, outside
        (20.0, 20.0),     # corner shared by overlap pair
        (48.2, 11.4),     # urban hotspot center
        (25.0, 179.0),    # inside dateline_cross, east of the line
        (25.0, -177.0),   # inside dateline_cross, WEST of the line (wrap)
        (25.0, -173.0),   # west of the line, outside dateline_cross
    ]
    for i, (a, o) in enumerate(adv):
        if i < len(lats):
            lats[i], lons[i] = a, o
    return K.snap(np.clip(lats, -89.999999, 89.999999)), K.snap(K.norm_lon(lons))


def pages_frame(sf: str) -> pd.DataFrame:
    """pages(url, warc_ts, html, text, lang) — schemas per BASELINE.json
    input_hint.  Deterministic for a given sf."""
    n = SF_ROWS[sf]
    rng = np.random.default_rng(SEED)
    lats, lons = gen_points(n, rng)
    i = np.arange(n)
    urls = [f"https://site{j % 997}.example/p/{j}" for j in i]
    base = _dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc)
    ts = [base + _dt.timedelta(seconds=int(j) * 37) for j in i]
    langs = np.array(["en", "de", "fr", "es", "pt"])[i % 5]
    text = [
        f"page {j} of crawl corpus. location geo:{a:.6f},{o:.6f} end. "
        f"filler tokens alpha beta gamma delta {j % 17}."
        for j, a, o in zip(i, lats, lons)
    ]
    html = [f"<html><body><p>{t}</p></body></html>".encode("utf-8") for t in text]
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": ts,
            "html": html,
            "text": text,
            "lang": langs,
        }
    )


def extract_geo(text_series: pd.Series):
    """The byte-exact geocode extraction contract: 'geo:{lat:.6f},{lon:.6f}'."""
    ext = text_series.str.extract(r"geo:(-?\d+\.\d{6}),(-?\d+\.\d{6})")
    return ext[0].astype(np.float64).to_numpy(), ext[1].astype(np.float64).to_numpy()


# ---------------------------------------------------------------------------
# brute-force golden oracles
# ---------------------------------------------------------------------------

def brute_page_regions(lats, lons, specs=None) -> list[list[int]]:
    """All-pairs exact PIP — the parity oracle (SURVEY.md §5 item 5)."""
    specs = specs or region_spec()
    n = len(lats)
    sets = [[] for _ in range(n)]
    for s in specs:
        outers = [r for role, r in s["rings"] if role == "outer"]
        inners = [r for role, r in s["rings"] if role == "inner"]
        hit = K.point_in_rings(lats, lons, outers, inners)
        for idx in np.flatnonzero(hit):
            sets[idx].append(s["region_id"])
    return [sorted(s) for s in sets]


def golden_frames(pages: pd.DataFrame, specs=None, level: int = FIXTURE_LEVEL):
    """→ dict of golden DataFrames (FIXTURES.md §4)."""
    specs = specs or region_spec()
    lats, lons = extract_geo(pages["text"])
    region_lists = brute_page_regions(lats, lons, specs)
    keys = K.cell_key(lats, lons, level)

    golden_page_regions = pd.DataFrame(
        {"url": pages["url"], "region_ids": region_lists}
    )

    # cells dictionary: per distinct cell among pages, regions containing the
    # CELL CENTER (reference semantics: face-centroid PIP →
    # /root/reference/src/OsmTriangulationRegionStore.cpp:946-1086), interned
    # to dense cell ids with the empty set pinned to 0.
    ukeys = np.unique(keys)
    clat, clon = K.cell_center(ukeys)
    center_lists = brute_page_regions(clat, clon, specs)
    set_key = ["," .join(map(str, s)) for s in center_lists]
    distinct = sorted(set(k for k in set_key if k))
    dict_id = {k: i + 1 for i, k in enumerate(distinct)}
    dict_id[""] = 0
    cell_ids = np.array([dict_id[k] for k in set_key], dtype=np.int64)
    golden_cells = pd.DataFrame(
        {"cell_key": ukeys, "cell_id": cell_ids, "region_ids": center_lists}
    )

    key_to_cellid = dict(zip(ukeys.tolist(), cell_ids.tolist()))
    golden_page_cells = pd.DataFrame(
        {
            "url": pages["url"],
            "cell_key": keys,
            "cell_id": [key_to_cellid[int(k)] for k in keys],
        }
    )

    # kNN golden: squared-euclid degree metric, tie-break by url asc
    n = len(pages)
    if n <= 5000:  # brute force only at smoke scale
        d2 = (lats[:, None] - lats[None, :]) ** 2 + (lons[:, None] - lons[None, :]) ** 2
        np.fill_diagonal(d2, np.inf)
        urls = pages["url"].to_numpy()
        neigh = []
        for i in range(n):
            order = np.lexsort((urls, d2[i]))[:KNN_K]
            neigh.append(list(urls[order]))
        golden_knn = pd.DataFrame({"url": pages["url"], "neighbor_urls": neigh})
    else:
        golden_knn = None

    out = {
        "golden_page_regions": golden_page_regions,
        "golden_cells": golden_cells,
        "golden_page_cells": golden_page_cells,
    }
    if golden_knn is not None:
        out["golden_knn"] = golden_knn
    return out


def golden_hop_split_frame(
    pages: pd.DataFrame,
    golden_page_cells: pd.DataFrame,
    max_points: int = 1000,
    level: int = FIXTURE_LEVEL,
    sub_levels: int = 3,
    split_per_run: int = 2,
) -> pd.DataFrame:
    """Independent plain-Python generator of the hop-BFS cell-split golden
    (url, cell_id, refined_cell_id) — re-implements the documented T6
    contract (/root/reference/src/OsmTriangulationRegionStore.cpp:593-759)
    with lists/dicts instead of the engine's vectorized path
    (cells/hopsplit.py).  The deterministic tie rules ARE part of the
    contract being pinned: units sorted by sub-key; BFS layer order; first
    index wins argmax ties; generator ids assigned by sorted unit order."""
    lats, lons = extract_geo(pages["text"])
    sub = K.cell_key(lats, lons, level + sub_levels)
    nlon_sub = 2 << (level + sub_levels)
    cid_of = dict(zip(golden_page_cells["url"], golden_page_cells["cell_id"]))
    rows = list(zip(pages["url"], (int(cid_of[u]) for u in pages["url"]), sub.tolist()))

    by_cid: dict[int, list] = {}
    for u, cid, s in rows:
        by_cid.setdefault(cid, []).append((u, s))

    def bfs(adj, start):
        n = len(adj)
        dist = [-1] * n
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
                        nxt.append(v)
            frontier = nxt
        return dist

    def first_argmax(xs):
        best = 0
        for j in range(1, len(xs)):
            if xs[j] > xs[best]:
                best = j
        return best

    def multi_source(adj, sources):
        n = len(adj)
        dist = [-1] * n
        owner = [-1] * n
        frontier = []
        for gi, s in enumerate(sorted(sources)):
            dist[s] = 0
            owner[s] = gi
            frontier.append(s)
        while frontier:
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if dist[v] < 0:
                        dist[v] = dist[u] + 1
                        owner[v] = owner[u]
                        nxt.append(v)
            frontier = nxt
        return owner, dist

    out_urls, out_cids, out_ref = [], [], []
    for cid, members in by_cid.items():
        if len(members) <= max_points:
            for u, _ in members:
                out_urls.append(u)
                out_cids.append(cid)
                out_ref.append(str(cid))
            continue
        units = sorted({s for _, s in members})
        idx = {s: i for i, s in enumerate(units)}
        pos = {}
        for s in units:
            k = int(s)
            iy = (k >> 28) & ((1 << 27) - 1)
            ix = k & ((1 << 28) - 1)
            pos[(iy, ix)] = idx[s]
        adj = []
        for s in units:
            k = int(s)
            iy = (k >> 28) & ((1 << 27) - 1)
            ix = k & ((1 << 28) - 1)
            nbrs = []
            for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                j = pos.get((iy + dy, (ix + dx) % nlon_sub))
                if j is not None:
                    nbrs.append(j)
            adj.append(nbrs)
        n = len(units)
        # max-hop generator pair — mirrors hopsplit.max_hop_pair including
        # the strict-greater update and the exact/approx switch (the
        # reference's 50k-face cutoff, scaled to the in-UDF practical 2000)
        if n <= 1:
            u0, v0 = 0, 0
        elif n <= 2000:
            best = (0, 0, 0)
            for s in range(n):
                d = bfs(adj, s)
                far = first_argmax(d)
                if d[far] > best[2]:
                    best = (s, far, d[far])
            u0, v0 = best[0], best[1]
        else:
            rng = np.random.default_rng(42)
            best = (0, 0, 0)
            for _ in range(10):
                s = int(rng.integers(0, n))
                d1 = bfs(adj, s)
                uu = first_argmax(d1)
                d2 = bfs(adj, uu)
                vv = first_argmax(d2)
                if d2[vv] > best[2]:
                    best = (uu, vv, d2[vv])
            u0, v0 = best[0], best[1]
        gens = [u0, v0]
        while len(gens) < split_per_run + 1 and len(gens) < n:
            _, dist = multi_source(adj, gens)
            cand = first_argmax(dist)
            if dist[cand] <= 0:
                break
            gens.append(cand)
        owner, _ = multi_source(adj, gens)
        owner = [0 if o < 0 else o for o in owner]
        for u, s in members:
            out_urls.append(u)
            out_cids.append(cid)
            out_ref.append(f"{cid}.{owner[idx[s]]}")
    return pd.DataFrame({"url": out_urls, "cell_id": out_cids, "refined_cell_id": out_ref})


# ---------------------------------------------------------------------------
# extraction-phase inputs (nodes / ways / relations)
# ---------------------------------------------------------------------------

def osm_frames():
    """nodes/ways/relations per FIXTURES.md §2, covering every AreaExtractor
    branch: kept closed ways, dropped open/untagged ways, missing-node reject
    (/root/reference/src/AreaExtractor.cpp:198-204), multipolygon relations
    with split outer rings in all 4 stitch orientations
    (/root/reference/src/AreaExtractor.cpp:26-48), odd accepted roles
    (/root/reference/src/AreaExtractor.cpp:305-309), an unclosable ring set,
    and a 1-outer/0-inner demotion
    (/root/reference/include/osmtools/AreaExtractor.h:48-55)."""
    nodes, ways, rels = [], [], []

    def add_nodes(ids, coords):
        for nid, (a, o) in zip(ids, coords):
            nodes.append({"node_id": nid, "lat": float(a), "lon": float(o)})

    # --- kept closed way: square, tagged boundary (way 100)
    add_nodes([1, 2, 3, 4], [(0, 0), (0, 1), (1, 1), (1, 0)])
    ways.append({"way_id": 100, "refs": [1, 2, 3, 4, 1], "tags": {"boundary": "administrative", "name": "sq"}})
    # --- closed but untagged (dropped) (way 101)
    add_nodes([5, 6, 7, 8], [(2, 2), (2, 3), (3, 3), (3, 2)])
    ways.append({"way_id": 101, "refs": [5, 6, 7, 8, 5], "tags": {}})
    # --- tagged but open (dropped) (way 102)
    ways.append({"way_id": 102, "refs": [1, 2, 3, 4], "tags": {"boundary": "administrative"}})
    # --- closed, tagged, but only 4 refs → fails the >4 test (way 103,
    #     triangle; predicate at /root/reference/src/AreaExtractor.cpp:163)
    add_nodes([9, 10, 11], [(4, 4), (4, 5), (5, 5)])
    ways.append({"way_id": 103, "refs": [9, 10, 11, 9], "tags": {"boundary": "administrative"}})
    # --- way referencing a missing node (dropped with reject) (way 104)
    ways.append({"way_id": 104, "refs": [1, 2, 999999, 4, 1], "tags": {"boundary": "administrative"}})
    # --- landuse-tagged closed way (kept) (way 105)
    add_nodes([12, 13, 14, 15], [(6, 6), (6, 7), (7, 7), (7, 6)])
    ways.append({"way_id": 105, "refs": [12, 13, 14, 15, 12], "tags": {"landuse": "forest"}})
    # --- place=island (kept via KeyMultiValue branch,
    #     /root/reference/src/AreaExtractorFilters.cpp:26-37) (way 106)
    add_nodes([16, 17, 18, 19], [(8, 8), (8, 9), (9, 9), (9, 8)])
    ways.append({"way_id": 106, "refs": [16, 17, 18, 19, 16], "tags": {"place": "island"}})

    # --- multipolygon rel 200: outer ring split across 4 open ways in mixed
    #     orientations (the 4 endpoint-match cases), one inner hole way.
    #     Outer square (10..11)x(10..11) via corner nodes 20-23 + midpoints.
    add_nodes(
        [20, 21, 22, 23, 24, 25, 26, 27],
        [(10, 10), (10, 11), (11, 11), (11, 10), (10, 10.5), (10.5, 11), (11, 10.5), (10.5, 10)],
    )
    # segments: w301 fwd, w302 fwd, w303 REVERSED, w304 REVERSED → exercises
    # back-front, back-back, front-front, front-back matching
    ways.append({"way_id": 301, "refs": [20, 24, 21], "tags": {}})
    ways.append({"way_id": 302, "refs": [21, 25, 22], "tags": {}})
    ways.append({"way_id": 303, "refs": [23, 26, 22], "tags": {}})  # reversed
    ways.append({"way_id": 304, "refs": [23, 27, 20], "tags": {}})
    add_nodes([28, 29, 30, 31], [(10.3, 10.3), (10.3, 10.7), (10.7, 10.7), (10.7, 10.3)])
    ways.append({"way_id": 305, "refs": [28, 29, 30, 31, 28], "tags": {}})  # hole (closed)
    rels.append(
        {
            "rel_id": 200,
            "members": [
                {"type": "way", "ref": 301, "role": "outer"},
                {"type": "way", "ref": 302, "role": ""},          # accepted as outer
                {"type": "way", "ref": 303, "role": "Outer"},     # accepted as outer
                {"type": "way", "ref": 304, "role": "outer:FIXME"},
                {"type": "way", "ref": 305, "role": "inner"},
                {"type": "node", "ref": 20, "role": "admin_centre"},  # non-way ignored
            ],
            "tags": {"type": "multipolygon", "boundary": "administrative", "name": "mp"},
        }
    )

    # --- rel 201: 1 closed outer, 0 inner → demotion to plain polygon
    add_nodes([40, 41, 42, 43], [(20, 20), (20, 21), (21, 21), (21, 20)])
    ways.append({"way_id": 306, "refs": [40, 41, 42, 43, 40], "tags": {}})
    rels.append(
        {
            "rel_id": 201,
            "members": [{"type": "way", "ref": 306, "role": "outer"}],
            "tags": {"type": "multipolygon", "landuse": "meadow"},
        }
    )

    # --- rel 202: unclosable outer (gap) → ZERO closed outer rings result,
    #     so the relation is dropped (reference emits iff outerWays.size()
    #     after stitching, /root/reference/src/AreaExtractor.cpp:324-327)
    add_nodes([50, 51, 52, 53], [(30, 30), (30, 31), (31, 31), (31, 30)])
    ways.append({"way_id": 307, "refs": [50, 51], "tags": {}})
    ways.append({"way_id": 308, "refs": [52, 53], "tags": {}})  # no shared endpoint
    rels.append(
        {
            "rel_id": 202,
            "members": [
                {"type": "way", "ref": 307, "role": "outer"},
                {"type": "way", "ref": 308, "role": "outer"},
            ],
            "tags": {"type": "multipolygon", "natural": "water"},
        }
    )

    # --- rel 203: enclave/exclave roles
    add_nodes([60, 61, 62, 63], [(40, 40), (40, 42), (42, 42), (42, 40)])
    add_nodes([64, 65, 66, 67], [(40.5, 40.5), (40.5, 41.5), (41.5, 41.5), (41.5, 40.5)])
    ways.append({"way_id": 309, "refs": [60, 61, 62, 63, 60], "tags": {}})
    ways.append({"way_id": 310, "refs": [64, 65, 66, 67, 64], "tags": {}})
    rels.append(
        {
            "rel_id": 203,
            "members": [
                {"type": "way", "ref": 309, "role": "exclave"},
                {"type": "way", "ref": 310, "role": "enclave"},
            ],
            "tags": {"type": "multipolygon", "boundary": "administrative"},
        }
    )

    # tag-filter-miss relation (dropped before assembly)
    rels.append(
        {
            "rel_id": 204,
            "members": [{"type": "way", "ref": 306, "role": "outer"}],
            "tags": {"type": "route"},
        }
    )

    # --- rel 205: partial-result path — one closable outer + one unclosable
    #     leftover: the closed ring is KEPT, the leftover discarded
    #     (closedPolysFromWays keeps resultWays on allOk=false,
    #     /root/reference/src/AreaExtractor.cpp:59-65, :320-327)
    add_nodes([70, 71, 72, 73], [(50, 50), (50, 51), (51, 51), (51, 50)])
    add_nodes([74, 75], [(52, 52), (52, 53)])
    ways.append({"way_id": 311, "refs": [70, 71, 72, 73, 70], "tags": {}})
    ways.append({"way_id": 312, "refs": [74, 75], "tags": {}})  # unclosable stub
    rels.append(
        {
            "rel_id": 205,
            "members": [
                {"type": "way", "ref": 311, "role": "outer"},
                {"type": "way", "ref": 312, "role": "outer"},
            ],
            "tags": {"type": "multipolygon", "natural": "wood"},
        }
    )

    # --- rel 206: member way touching a MISSING node is skipped; the
    #     relation still assembles from its remaining ways (unavailable way
    #     only clears allWaysAvailable — log-only,
    #     /root/reference/src/AreaExtractor.cpp:296-327)
    add_nodes([80, 81, 82, 83], [(55, 55), (55, 56), (56, 56), (56, 55)])
    ways.append({"way_id": 313, "refs": [80, 81, 82, 83, 80], "tags": {}})
    ways.append({"way_id": 314, "refs": [80, 999998, 81], "tags": {}})  # missing node
    rels.append(
        {
            "rel_id": 206,
            "members": [
                {"type": "way", "ref": 313, "role": "outer"},
                {"type": "way", "ref": 314, "role": "outer"},
            ],
            "tags": {"type": "multipolygon", "landuse": "farmland"},
        }
    )

    # --- tag-filter parity rows (/root/reference/src/AreaExtractorFilters.cpp:23-83):
    #     each discriminates the reference's conditional-exclusion /
    #     BoolTagFilter(false) / type-only-multipolygon semantics from a
    #     blanket key-absence formula.
    # way 107: bare area=yes → kept under ET_DEFAULT (all exclusions absent)
    add_nodes([84, 85, 86, 87], [(60, 60), (60, 61), (61, 61), (61, 60)])
    ways.append({"way_id": 107, "refs": [84, 85, 86, 87, 84], "tags": {"area": "yes"}})
    # way 108: area=yes + building=yes → dropped under ET_DEFAULT (building
    # exclusion fails: truthy), kept under ET_ALL_SPECIAL (building branch)
    add_nodes([88, 89, 90, 91], [(62, 62), (62, 63), (63, 63), (63, 62)])
    ways.append(
        {"way_id": 108, "refs": [88, 89, 90, 91, 88], "tags": {"area": "yes", "building": "yes"}}
    )
    # way 109: area=yes + building=no → kept under ET_DEFAULT
    # (BoolTagFilter(building,false) matches the explicit falsy value)
    add_nodes([92, 93, 94, 95], [(64, 64), (64, 65), (65, 65), (65, 64)])
    ways.append(
        {"way_id": 109, "refs": [92, 93, 94, 95, 92], "tags": {"area": "yes", "building": "no"}}
    )
    # way 110: area=yes + highway=pedestrian → kept (highway is NOT in the
    # reference exclusion set {building, boundary, landuse, natural})
    add_nodes([96, 97, 98, 99], [(66, 66), (66, 67), (67, 67), (67, 66)])
    ways.append(
        {
            "way_id": 110,
            "refs": [96, 97, 98, 99, 96],
            "tags": {"area": "yes", "highway": "pedestrian"},
        }
    )
    # way 111: building=residential only → dropped under ET_DEFAULT (no
    # ET_BUILDING), kept under ET_ALL_SPECIAL via the building KeyOnly branch
    add_nodes([120, 121, 122, 123], [(68, 68), (68, 69), (69, 69), (69, 68)])
    ways.append(
        {"way_id": 111, "refs": [120, 121, 122, 123, 120], "tags": {"building": "residential"}}
    )
    # rel 207: bare type=boundary, NO area tags → kept under ET_DEFAULT via
    # the boundary-relation arm (cpp:77-79 — no area-filter conjunction)
    add_nodes([124, 125, 126, 127], [(70, 70), (70, 71), (71, 71), (71, 70)])
    ways.append({"way_id": 315, "refs": [124, 125, 126, 127, 124], "tags": {}})
    rels.append(
        {
            "rel_id": 207,
            "members": [{"type": "way", "ref": 315, "role": "outer"}],
            "tags": {"type": "boundary", "name": "bare-boundary"},
        }
    )
    # rel 208: type=multipolygon with no qualifying area tag → dropped under
    # ET_DEFAULT, kept type-only when ET_MULTIPOLYGONS is set (cpp:71-73)
    add_nodes([128, 129, 130, 131], [(72, 72), (72, 73), (73, 73), (73, 72)])
    ways.append({"way_id": 316, "refs": [128, 129, 130, 131, 128], "tags": {}})
    rels.append(
        {
            "rel_id": 208,
            "members": [{"type": "way", "ref": 316, "role": "outer"}],
            "tags": {"type": "multipolygon"},
        }
    )

    nodes_df = pd.DataFrame(nodes).drop_duplicates("node_id").reset_index(drop=True)
    nodes_df["lat"] = K.snap(nodes_df["lat"].to_numpy())
    nodes_df["lon"] = K.snap(nodes_df["lon"].to_numpy())
    return nodes_df, pd.DataFrame(ways), pd.DataFrame(rels)


# ---------------------------------------------------------------------------
# materialization
# ---------------------------------------------------------------------------

def scaling_region_spec(n_regions: int = 45, n_vertices: int = 800):
    """High-vertex, heavily-overlapping star polygons for the scaling
    benchmark — realistic admin-boundary complexity (planet polygons run to
    thousands of vertices) stacked 15-deep over each point hotspot, so each
    clustered query point ray-casts many large rings and the measurement is
    compute-dominated like a planet workload.  Deterministic (seeded)."""
    rng = np.random.default_rng(SEED + 1)
    hotspots = [(48.2, 11.4), (17.5, 17.5), (-20.0, 50.0)]
    centers = [
        (h[0] + float(rng.uniform(-0.3, 0.3)), h[1] + float(rng.uniform(-0.3, 0.3)))
        for i in range(n_regions)
        for h in [hotspots[i % len(hotspots)]]
    ]
    specs = []
    for rid, (clat, clon) in enumerate(centers[:n_regions]):
        ang = np.linspace(0, 2 * np.pi, n_vertices, endpoint=False)
        rad = 1.5 + 0.7 * np.sin(ang * 7 + rid) + rng.uniform(-0.1, 0.1, n_vertices)
        ring = np.stack([clat + rad * np.sin(ang), clon + rad * np.cos(ang)], axis=1)
        ring = K.snap(np.vstack([ring, ring[:1]]))
        specs.append(
            {
                "region_id": rid,
                "name": f"star{rid}",
                "rings": [("outer", ring)],
                "tags": {"name": f"star{rid}", "boundary": "administrative"},
            }
        )
    return specs


def fixtures_dir(sf: str, root: str | None = None) -> str:
    root = root or os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "fixtures")
    return os.path.join(root, f"sf{sf}")


def write_fixtures(sf: str, root: str | None = None) -> str:
    """Write all fixture + golden parquet for one scale tier.  Idempotent."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = fixtures_dir(sf, root)
    os.makedirs(out, exist_ok=True)

    def w(df: pd.DataFrame, name: str, map_cols: tuple[str, ...] = ()) -> None:
        # micros, not nanos: Spark's parquet reader rejects TIMESTAMP(NANOS)
        tbl = pa.Table.from_pandas(df.drop(columns=list(map_cols)), preserve_index=False)
        for c in map_cols:
            # dict → real parquet MAP (pandas dicts infer as STRUCT otherwise)
            arr = pa.array(
                [list(d.items()) for d in df[c]], type=pa.map_(pa.string(), pa.string())
            )
            tbl = tbl.append_column(c, arr)
        pq.write_table(
            tbl,
            os.path.join(out, f"{name}.parquet"),
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )

    pages = pages_frame(sf)
    w(pages, "pages")

    regions, rings = regions_frames()
    w(regions, "regions", map_cols=("tags",))
    w(rings, "region_rings")

    goldens = golden_frames(pages)
    for name, df in goldens.items():
        w(df, name)
    w(golden_hop_split_frame(pages, goldens["golden_page_cells"]), "golden_hop_split")

    nodes, ways, rels = osm_frames()
    w(nodes, "nodes")
    w(ways, "ways", map_cols=("tags",))
    w(rels, "relations", map_cols=("tags",))

    _, scaling_rings = regions_frames(scaling_region_spec())
    w(scaling_rings, "scaling_region_rings")
    return out


def ensure_fixtures(sf: str, root: str | None = None) -> str:
    out = fixtures_dir(sf, root)
    # golden_hop_split is the newest artifact — its absence means the dir
    # predates round 4 and must be regenerated as a whole
    if not all(
        os.path.exists(os.path.join(out, f"{n}.parquet"))
        for n in ("pages", "golden_hop_split")
    ):
        write_fixtures(sf, root)
    return out


if __name__ == "__main__":
    import sys

    for sf in sys.argv[1:] or ["0.001", "0.01", "0.1"]:
        print(write_fixtures(sf))
