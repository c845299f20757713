"""Pure-numpy geometry kernels (no Spark dependency).

This is the vectorized core of the engine: hierarchical cell-key encoding
(our h3/s2-free grid — the reference's index is likewise a plain uniform
lat/lon grid refined quadtree-style, see
/root/reference/src/OsmGridRegionTree.cpp:133-140), deterministic
coordinate snapping (snapPoints, /root/reference/src/OsmGridRegionTree.cpp:96-103),
ray-casting point-in-polygon with a half-open edge rule (the engine's
replacement for CGAL exact predicates,
/root/reference/include/osmtools/OsmTriangulationRegionStore.h:199-205),
geodesic distance, and cell-ring expansion (the adjacency contract of the
cell dual graph, /root/reference/src/OsmTriangulationRegionStore.cpp:382-429).

Everything here is deterministic, vectorized over numpy arrays, and safe to
call inside Arrow/pandas UDF batches.

Cell-key layout (int64, always positive):

    key = level * 2^55 + iy * 2^28 + ix

At level ``L`` the world (lat ∈ [-90, 90], lon ∈ [-180, 180)) is an
``2^L x 2^(L+1)`` grid (rows x cols), so cells are square in degrees:
``180 / 2^L`` per side.  Level 0 is 2 cells of 180°x180°.  Max level 26
(sub-centimeter) fits the bit budget: iy < 2^26 (27-bit field), ix < 2^27
(28-bit field).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# constants
# ---------------------------------------------------------------------------

SNAP_SCALE = 1_000_000  # 1e-6 degree fixed-point, mirrors sserialize GeoPoint
MAX_LEVEL = 26
_LEVEL_SHIFT = 55
_IY_SHIFT = 28

#: cell 0 is, by definition, "contained in no region"
#: (/root/reference/src/OsmTriangulationRegionStore.cpp:990-996, :1113-1114)
EMPTY_CELL_ID = 0

#: reference sentinel for faces of the infinite/outside domain
#: (/root/reference/src/OsmTriangulationRegionStore.cpp:761-762)
INFINITE_CELL_ID = 0xFFFFFFFF

EARTH_RADIUS_M = 6_371_008.8  # IUGG mean radius

# default refinement policy mirrors the reference ctor defaults:
# 2x2 split while the node's geodesic diagonal exceeds 250 m
# (/root/reference/src/OsmGridRegionTree.cpp:70)
DEFAULT_MIN_DIAG_M = 250.0


# ---------------------------------------------------------------------------
# snapping (G5)
# ---------------------------------------------------------------------------

def snap(coords):
    """Quantize coordinates to 1e-6 degrees.

    Mirrors OsmGridRegionTree::snapPoints
    (/root/reference/src/OsmGridRegionTree.cpp:96-103): every coordinate that
    enters a comparison is quantized first so PIP decisions are
    machine-independent.  round-half-even like numpy; applied identically at
    fixture generation and at query time.
    """
    a = np.asarray(coords, dtype=np.float64)
    return np.round(a * SNAP_SCALE) / SNAP_SCALE


def norm_lon(lon):
    """Normalize longitudes into [-180, 180)."""
    lon = np.asarray(lon, dtype=np.float64)
    return ((lon + 180.0) % 360.0) - 180.0


# ---------------------------------------------------------------------------
# cell keys (T13 / G4 encoding)
# ---------------------------------------------------------------------------

def cell_key(lat, lon, level: int):
    """Vectorized point → cell-key at ``level``.

    Pure arithmetic, O(1) per point — this deliberately removes the
    reference's point-location mutex cliff
    (/root/reference/include/osmtools/TriangulationGridLocater.h:134-140).
    Points are clamped to the valid domain (lat=90 lands in the top row).
    """
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    lat = np.asarray(lat, dtype=np.float64)
    lon = norm_lon(lon)
    nlat = np.int64(1) << level
    nlon = np.int64(2) << level
    iy = np.clip(np.floor((lat + 90.0) / 180.0 * nlat).astype(np.int64), 0, nlat - 1)
    ix = np.clip(np.floor((lon + 180.0) / 360.0 * nlon).astype(np.int64), 0, nlon - 1)
    return pack_key(level, iy, ix)


def pack_key(level, iy, ix):
    level = np.int64(level)
    return (level << _LEVEL_SHIFT) | (np.asarray(iy, dtype=np.int64) << _IY_SHIFT) | np.asarray(ix, dtype=np.int64)


def unpack_key(key):
    """key → (level, iy, ix), vectorized."""
    key = np.asarray(key, dtype=np.int64)
    level = key >> _LEVEL_SHIFT
    iy = (key >> _IY_SHIFT) & ((np.int64(1) << (_LEVEL_SHIFT - _IY_SHIFT)) - 1)
    ix = key & ((np.int64(1) << _IY_SHIFT) - 1)
    return level, iy, ix


def cell_bounds(key):
    """key → (min_lat, max_lat, min_lon, max_lon), vectorized."""
    level, iy, ix = unpack_key(key)
    size = 180.0 / (np.int64(1) << level).astype(np.float64)
    min_lat = iy.astype(np.float64) * size - 90.0
    min_lon = ix.astype(np.float64) * size - 180.0
    return min_lat, min_lat + size, min_lon, min_lon + size


def cell_center(key):
    """key → (lat, lon) midpoint — the grid analog of the face centroid
    sample point (/root/reference/src/OsmTriangulationRegionStore.cpp:276-278)."""
    min_lat, max_lat, min_lon, max_lon = cell_bounds(key)
    return (min_lat + max_lat) / 2.0, (min_lon + max_lon) / 2.0


def cell_children(key):
    """One level down: the 2x2 children (quadtree split, reference default
    policy /root/reference/src/OsmGridRegionTree.cpp:70)."""
    level, iy, ix = unpack_key(key)
    level = int(np.asarray(level).reshape(-1)[0])
    if level >= MAX_LEVEL:
        raise ValueError("cannot subdivide beyond MAX_LEVEL")
    iy2, ix2 = iy * 2, ix * 2
    dy, dx = np.meshgrid([0, 1], [0, 1], indexing="ij")
    return pack_key(level + 1, (iy2[..., None] + dy.ravel()), (ix2[..., None] + dx.ravel())).ravel()


def cell_parent(key, levels_up: int = 1):
    level, iy, ix = unpack_key(key)
    lvl = level - levels_up
    return pack_key(0, iy >> levels_up, ix >> levels_up) | (lvl << _LEVEL_SHIFT)


def cell_ring(key: int, k: int):
    """All cells at the key's level with Chebyshev grid distance ≤ k
    (k=0 → the cell itself).  Longitude wraps; latitude clamps at the poles.

    This is the neighbor expansion the kNN operator walks — the grid-native
    version of the cell dual graph
    (/root/reference/src/OsmTriangulationRegionStore.cpp:382-429).
    Returns a 1-D int64 array (deduplicated, sorted).
    """
    level, iy, ix = unpack_key(np.int64(key))
    level, iy, ix = int(level), int(iy), int(ix)
    nlat = 1 << level
    nlon = 2 << level
    ys = np.arange(max(0, iy - k), min(nlat - 1, iy + k) + 1, dtype=np.int64)
    xs = np.arange(ix - k, ix + k + 1, dtype=np.int64) % nlon
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    keys = pack_key(level, yy.ravel(), xx.ravel())
    return np.unique(keys)


def ring_min_distance_deg(key: int, k: int) -> float:
    """Lower bound on the degree-space distance from anywhere inside ``key``'s
    cell to anywhere outside its k-ring.  Used for kNN early termination: once
    k neighbors are found with distance < this bound, no point outside the
    ring can beat them."""
    level, _, _ = unpack_key(np.int64(key))
    size = 180.0 / (1 << int(level))
    return k * size


# ---------------------------------------------------------------------------
# distances
# ---------------------------------------------------------------------------

def haversine_m(lat1, lon1, lat2, lon2):
    """Great-circle distance in meters, vectorized.

    Stands in for the reference's GeodesicDistanceCalculator
    (DCT_GEODESIC_ACCURATE, /root/reference/src/CellCriteria.cpp:34)."""
    lat1, lon1, lat2, lon2 = (np.radians(np.asarray(a, dtype=np.float64)) for a in (lat1, lon1, lat2, lon2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))


def sq_euclid_deg(lat1, lon1, lat2, lon2):
    """Squared euclidean distance in snapped degree space.

    The kNN operator ranks by THIS metric (not haversine): products and sums
    of identical IEEE-754 doubles are bit-identical across engines, which
    makes kNN rankings reproducible in the DuckDB oracle.  Documented
    deviation from the reference's geodesic metric."""
    lat1, lon1, lat2, lon2 = (np.asarray(a, dtype=np.float64) for a in (lat1, lon1, lat2, lon2))
    dlat = lat1 - lat2
    dlon = lon1 - lon2
    return dlat * dlat + dlon * dlon


def cell_diag_m(key):
    """Geodesic diagonal of a cell — the refinement criterion quantity
    (FixedSizeDiagRefiner, /root/reference/src/OsmGridRegionTree.cpp:13-30)."""
    min_lat, max_lat, min_lon, max_lon = cell_bounds(key)
    return haversine_m(min_lat, min_lon, max_lat, max_lon)


# ---------------------------------------------------------------------------
# point-in-polygon (G6 exact refine)
# ---------------------------------------------------------------------------

#: target element count of the (points x edges) temporaries — keeps each
#: intermediate ≈512 KB so the ray cast's working set stays within a core's
#: PRIVATE cache instead of the shared L3 (the multiprocess-contention
#: microbench, tools/pip_microbench.py, measures 4→16-proc efficiency 0.95
#: at 65k elements vs 0.72 at 1M; the unchunked kernel was measured 60.7 s
#: vs 0.68 s on a 65k-point × 800-edge batch and did not scale with cores).
_PIP_CHUNK_ELEMS = 65_536


def _point_in_ring_block(y, x, y1, x1, y2, x2):
    """Division-free ray-cast block: ``x < x1 + (y-y1)/(y2-y1)*(x2-x1)``
    cross-multiplied after scaling both sides by sign(y2-y1) — multiplying
    by ±1 is exact, so the strict `<` (the half-open boundary rule) is
    preserved for on-edge points, unlike a naive inequality flip which
    would turn `<` into `<=` on descending edges.  Measured ~15% faster
    than the division form under 16-way contention
    (tools/pip_microbench.py); agrees with it exactly on vertex/edge
    points (exact products) and everywhere off-boundary."""
    straddle = (y1 <= y) != (y2 <= y)
    d = y2 - y1
    s = np.sign(d)
    lhs = (x - x1) * (d * s)          # (x - x1) * |d|
    rhs = (y - y1) * ((x2 - x1) * s)
    crossings = straddle & (lhs < rhs)
    return (crossings.sum(axis=1) % 2).astype(bool)


def point_in_ring(lats, lons, ring: np.ndarray):
    """Vectorized ray cast of n points against one closed ring.

    ``ring`` is (m, 2) float64 [[lat, lon], ...], first == last point
    (closedness enforced at extraction, /root/reference/src/AreaExtractor.cpp:59).
    Horizontal ray toward +lon; half-open edge rule ``lat1 <= y < lat2`` so a
    point exactly on a shared horizontal vertex is counted once — the
    determinism stand-in for CGAL's exact predicates.

    Points are processed in cache-sized chunks (see _PIP_CHUNK_ELEMS).
    Returns a boolean array of length n.
    """
    ys = np.asarray(lats, dtype=np.float64)
    xs = np.asarray(lons, dtype=np.float64)
    y1 = ring[:-1, 0][None, :]                         # (1,m-1)
    x1 = ring[:-1, 1][None, :]
    y2 = ring[1:, 0][None, :]
    x2 = ring[1:, 1][None, :]
    n = ys.shape[0]
    m = max(ring.shape[0] - 1, 1)
    chunk = max(64, _PIP_CHUNK_ELEMS // m)
    if n <= chunk:
        return _point_in_ring_block(ys[:, None], xs[:, None], y1, x1, y2, x2)
    out = np.empty(n, dtype=bool)
    for i in range(0, n, chunk):
        out[i : i + chunk] = _point_in_ring_block(
            ys[i : i + chunk, None], xs[i : i + chunk, None], y1, x1, y2, x2
        )
    return out


def ring_edges(ring: np.ndarray) -> np.ndarray:
    """(m,2) closed ring → (m-1, 4) edge array [y1, x1, y2, x2]."""
    return np.stack([ring[:-1, 0], ring[:-1, 1], ring[1:, 0], ring[1:, 1]], axis=1)


def clip_edges_for_cell(edges: np.ndarray, min_lat, max_lat, min_lon) -> np.ndarray:
    """Edges that can affect the ray-cast parity of ANY point inside the
    cell [min_lat, max_lat] × [min_lon, …):

    - an edge whose lat range misses the cell's lat band can never straddle
      a point latitude inside it;
    - an edge entirely WEST of the cell (both lons < min_lon) is never
      crossed by the eastward ray.

    This is the query-side counterpart of the definite/candidate split:
    large admin rings (thousands of edges) shrink to the handful of edges
    actually near the cell — the dominant PIP cost lever."""
    ylo = np.minimum(edges[:, 0], edges[:, 2])
    yhi = np.maximum(edges[:, 0], edges[:, 2])
    keep = (yhi > min_lat) & (ylo <= max_lat)
    west = np.maximum(edges[:, 1], edges[:, 3]) < min_lon
    return edges[keep & ~west]


def point_in_edges(lats, lons, edges: np.ndarray):
    """Ray-cast parity against an explicit (k,4) edge set (same half-open
    rule as point_in_ring).  Callers are responsible for the edge set being
    parity-preserving for these points (see clip_edges_for_cell)."""
    ys = np.asarray(lats, dtype=np.float64)
    xs = np.asarray(lons, dtype=np.float64)
    if edges.shape[0] == 0:
        return np.zeros(ys.shape[0], dtype=bool)
    y1 = edges[:, 0][None, :]
    x1 = edges[:, 1][None, :]
    y2 = edges[:, 2][None, :]
    x2 = edges[:, 3][None, :]
    n = ys.shape[0]
    m = edges.shape[0]
    chunk = max(64, _PIP_CHUNK_ELEMS // m)
    if n <= chunk:
        return _point_in_ring_block(ys[:, None], xs[:, None], y1, x1, y2, x2)
    out = np.empty(n, dtype=bool)
    for i in range(0, n, chunk):
        out[i : i + chunk] = _point_in_ring_block(
            ys[i : i + chunk, None], xs[i : i + chunk, None], y1, x1, y2, x2
        )
    return out


def point_in_rings(lats, lons, outer_rings, inner_rings=()):
    """PIP against a polygon-with-holes: inside any outer AND not inside any
    inner (/root/reference/include/osmtools/OsmGridRegionTree.h:34-63 —
    multipolygon = outer list + inner list).

    ``outer_rings`` / ``inner_rings``: sequences of (m,2) arrays.
    """
    n = len(np.asarray(lats, dtype=np.float64))
    inside = np.zeros(n, dtype=bool)
    for ring in outer_rings:
        inside |= point_in_ring(lats, lons, ring)
    for ring in inner_rings:
        inside &= ~point_in_ring(lats, lons, ring)
    return inside


def segment_intersects_rect(y1, x1, y2, x2, min_lat, max_lat, min_lon, max_lon):
    """Vectorized segment-vs-axis-aligned-rectangle overlap test
    (Cohen–Sutherland style via Liang–Barsky clipping).  Used to classify a
    cell as 'full' (entirely inside a region — no boundary segment may cross
    it) vs 'partial' — the definite/candidate split of
    /root/reference/include/osmtools/OsmGridRegionTree.h:110-112.

    Inputs are arrays of segment endpoints; the rect bounds may be scalars
    or arrays — everything numpy-broadcasts (e.g. segments (s,1) against
    rects (1,c) for the batched quadtree cover).
    Returns boolean array: True where the segment touches the rect.
    """
    y1 = np.asarray(y1, dtype=np.float64)
    x1 = np.asarray(x1, dtype=np.float64)
    y2 = np.asarray(y2, dtype=np.float64)
    x2 = np.asarray(x2, dtype=np.float64)
    dy = y2 - y1
    dx = x2 - x1
    shape = np.broadcast(y1, x1, np.asarray(min_lat), np.asarray(min_lon)).shape
    t0 = np.zeros(shape, dtype=np.float64)
    t1 = np.ones(shape, dtype=np.float64)
    ok = np.ones(shape, dtype=bool)
    for p, q in (
        (-dx, x1 - min_lon),
        (dx, max_lon - x1),
        (-dy, y1 - min_lat),
        (dy, max_lat - y1),
    ):
        para_out = (p == 0) & (q < 0)
        ok &= ~para_out
        with np.errstate(divide="ignore", invalid="ignore"):
            r = q / p
        enter = p < 0
        leave = p > 0
        t0 = np.where(enter, np.maximum(t0, r), t0)
        t1 = np.where(leave, np.minimum(t1, r), t1)
    return ok & (t0 <= t1)


def crosses_antimeridian(lon1, lon2):
    """True where a segment crosses the ±180° line — such segments are
    skipped in the index build, mirroring
    /root/reference/src/OsmTriangulationRegionStore.cpp:819-822."""
    lon1 = norm_lon(lon1)
    lon2 = norm_lon(lon2)
    return np.abs(lon1 - lon2) > 180.0


# ---------------------------------------------------------------------------
# region coverage (G4 index build kernel)
# ---------------------------------------------------------------------------

def covering_cells(outer_rings, inner_rings, level: int):
    """Cells at ``level`` overlapping a polygon-with-holes, classified
    full/partial.

    Returns (keys: int64[], full: bool[]).  'full' means the whole cell is
    inside the region (all of it passes PIP without a geometry test at query
    time — the 'definite' list of
    /root/reference/include/osmtools/OsmGridRegionTree.h:109-120).
    Classification is conservative: a cell is 'full' only if its center is
    inside AND no boundary segment of any ring intersects the cell rect.
    """
    all_rings = list(outer_rings) + list(inner_rings)
    pts = np.vstack(all_rings)
    min_lat, max_lat = pts[:, 0].min(), pts[:, 0].max()
    min_lon, max_lon = pts[:, 1].min(), pts[:, 1].max()

    k_lo = cell_key(np.array([min_lat]), np.array([min_lon]), level)[0]
    k_hi = cell_key(np.array([max_lat]), np.array([max_lon]), level)[0]
    _, iy_lo, ix_lo = unpack_key(k_lo)
    _, iy_hi, ix_hi = unpack_key(k_hi)
    ys = np.arange(int(iy_lo), int(iy_hi) + 1, dtype=np.int64)
    xs = np.arange(int(ix_lo), int(ix_hi) + 1, dtype=np.int64)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    keys = pack_key(level, yy.ravel(), xx.ravel())
    if keys.size == 0:
        return keys, np.zeros(0, dtype=bool)

    clat, clon = cell_center(keys)
    center_in = point_in_rings(clat, clon, outer_rings, inner_rings)

    # boundary segments (all rings form the boundary)
    seg_y1 = np.concatenate([r[:-1, 0] for r in all_rings])
    seg_x1 = np.concatenate([r[:-1, 1] for r in all_rings])
    seg_y2 = np.concatenate([r[1:, 0] for r in all_rings])
    seg_x2 = np.concatenate([r[1:, 1] for r in all_rings])
    keep = ~crosses_antimeridian(seg_x1, seg_x2)  # antimeridian guard
    seg_y1, seg_x1, seg_y2, seg_x2 = seg_y1[keep], seg_x1[keep], seg_y2[keep], seg_x2[keep]

    b = cell_bounds(keys)
    touched = np.zeros(keys.shape, dtype=bool)
    for i in range(keys.size):
        touched[i] = segment_intersects_rect(
            seg_y1, seg_x1, seg_y2, seg_x2, b[0][i], b[1][i], b[2][i], b[3][i]
        ).any()

    full = center_in & ~touched
    # a cell overlaps the region iff its center is inside OR boundary touches it
    overlap = center_in | touched
    return keys[overlap], full[overlap]


def adaptive_covering_cells(outer_rings, inner_rings, base_level: int, max_level: int):
    """Quadtree coverage: start at ``base_level``; FULL cells are kept as-is,
    PARTIAL cells are recursively subdivided until ``max_level`` — the
    reference's GridRegionTree recursion
    (/root/reference/src/OsmGridRegionTree.cpp:133-140, refinement predicate
    :13-30).  Index size is boundary-linear instead of area-quadratic.

    Returns (keys int64[], full bool[]) with keys at MIXED levels; the
    coverage cells partition the region (disjoint across levels), so a
    point matches at most one coverage cell per region.
    """
    keys, full = covering_cells(outer_rings, inner_rings, base_level)
    out_keys = [keys[full]]
    out_full = [np.ones(int(full.sum()), dtype=bool)]
    partial = keys[~full]

    all_rings = list(outer_rings) + list(inner_rings)
    seg_y1 = np.concatenate([r[:-1, 0] for r in all_rings])
    seg_x1 = np.concatenate([r[:-1, 1] for r in all_rings])
    seg_y2 = np.concatenate([r[1:, 0] for r in all_rings])
    seg_x2 = np.concatenate([r[1:, 1] for r in all_rings])
    keep = ~crosses_antimeridian(seg_x1, seg_x2)
    seg_y1, seg_x1, seg_y2, seg_x2 = seg_y1[keep], seg_x1[keep], seg_y2[keep], seg_x2[keep]

    level = base_level
    while level < max_level and partial.size:
        # vectorized 2x2 split of every partial cell at once
        _, iy, ix = unpack_key(partial)
        dy, dx = np.meshgrid([0, 1], [0, 1], indexing="ij")
        children = pack_key(
            level + 1,
            (iy * 2)[:, None] + dy.ravel()[None, :],
            (ix * 2)[:, None] + dx.ravel()[None, :],
        ).ravel()
        clat, clon = cell_center(children)
        center_in = point_in_rings(clat, clon, outer_rings, inner_rings)
        b = cell_bounds(children)
        # batched segment-vs-rect: (segments × cell-chunk) broadcast, chunked
        # to bound temporaries (a per-child Python loop dominated the build)
        touched = np.zeros(children.shape, dtype=bool)
        ch = max(1, 4_000_000 // max(len(seg_y1), 1))
        for i0 in range(0, children.size, ch):
            sl = slice(i0, min(i0 + ch, children.size))
            touched[sl] = segment_intersects_rect(
                seg_y1[:, None], seg_x1[:, None], seg_y2[:, None], seg_x2[:, None],
                b[0][sl][None, :], b[1][sl][None, :], b[2][sl][None, :], b[3][sl][None, :],
            ).any(axis=0)
        overlap = center_in | touched
        is_full = center_in & ~touched
        out_keys.append(children[overlap & is_full])
        out_full.append(np.ones(int((overlap & is_full).sum()), dtype=bool))
        partial = children[overlap & ~is_full]
        level += 1

    if partial.size:  # max_level partial leaves stay candidates
        out_keys.append(partial)
        out_full.append(np.zeros(partial.size, dtype=bool))
    return np.concatenate(out_keys), np.concatenate(out_full)


def rect_ring(min_lat, min_lon, max_lat, max_lon) -> np.ndarray:
    """Closed 5-point CCW ring from a rect — GeoPolygon::fromRect
    (/root/reference/src/types.cpp:9-17)."""
    return np.array(
        [
            [min_lat, min_lon],
            [min_lat, max_lon],
            [max_lat, max_lon],
            [max_lat, min_lon],
            [min_lat, min_lon],
        ],
        dtype=np.float64,
    )
