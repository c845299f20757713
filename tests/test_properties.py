"""Property-based tests (hypothesis) for the pure-numpy geometry kernels —
the invariants every spatial operator builds on.  No SparkSession needed,
so these run in milliseconds and fuzz far wider than the fixture corpus.
"""

import numpy as np
import pytest
from hypothesis import example, given, settings
from hypothesis import strategies as st

from libosmtools_spark.geom import kernels as K

# numeric kernels must be warning-clean (VERDICT r4 item 6): any
# RuntimeWarning from the numpy kernels fails these modules outright
pytestmark = pytest.mark.filterwarnings("error::RuntimeWarning")

lat_s = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)
lon_s = st.floats(min_value=-540.0, max_value=540.0, allow_nan=False)
level_s = st.integers(min_value=0, max_value=K.MAX_LEVEL)


class TestCellKeyProperties:
    @given(lat=lat_s, lon=lon_s, level=level_s)
    @settings(max_examples=300, deadline=None)
    def test_key_bounds_contain_point(self, lat, lon, level):
        """A point's cell bounds contain the (lon-normalized, clamped)
        point — the half-open [min, max) grid contract, closed at the
        domain edge (lat=90 lands in the top row)."""
        key = K.cell_key(np.array([lat]), np.array([lon]), level)
        min_lat, max_lat, min_lon, max_lon = K.cell_bounds(key)
        nlon = K.norm_lon(np.array([lon]))[0]
        # 1e-9 margins: double absorption near cell boundaries (e.g. a
        # subnormal lat added to 90.0 vanishes) can put the point one ulp
        # across; the kernels and the SQL mirror absorb identically.
        assert min_lat[0] - 1e-9 <= lat <= max_lat[0] + 1e-9
        assert min_lon[0] - 1e-9 <= nlon <= max_lon[0] + 1e-9

    @given(lat=lat_s, lon=lon_s, level=st.integers(min_value=1, max_value=K.MAX_LEVEL))
    @settings(max_examples=300, deadline=None)
    def test_parent_of_key_is_coarser_key(self, lat, lon, level):
        """cell_parent(key at L) == the point's own key at L-1 — the
        quadtree hierarchy is consistent with direct assignment."""
        fine = K.cell_key(np.array([lat]), np.array([lon]), level)
        coarse = K.cell_key(np.array([lat]), np.array([lon]), level - 1)
        assert K.cell_parent(fine)[0] == coarse[0]

    @given(lat=lat_s, lon=lon_s, level=st.integers(min_value=0, max_value=K.MAX_LEVEL - 1))
    @settings(max_examples=200, deadline=None)
    def test_children_partition_parent(self, lat, lon, level):
        """The point's key at level+1 is among its level-key's 4 children."""
        key = K.cell_key(np.array([lat]), np.array([lon]), level)
        child = K.cell_key(np.array([lat]), np.array([lon]), level + 1)
        assert child[0] in set(K.cell_children(int(key[0])).tolist())

    @given(lon=lon_s)
    @settings(max_examples=300, deadline=None)
    def test_norm_lon_range(self, lon):
        n = K.norm_lon(np.array([lon]))[0]
        assert -180.0 <= n < 180.0 or np.isclose(n, -180.0)


class TestPIPProperties:
    @given(
        cy=st.floats(min_value=-60, max_value=60, allow_nan=False),
        cx=st.floats(min_value=-60, max_value=60, allow_nan=False),
        h=st.floats(min_value=0.5, max_value=20, allow_nan=False),
        w=st.floats(min_value=0.5, max_value=20, allow_nan=False),
        py=st.floats(min_value=-89, max_value=89, allow_nan=False),
        px=st.floats(min_value=-89, max_value=89, allow_nan=False),
    )
    @settings(max_examples=300, deadline=None)
    def test_rect_ray_cast_matches_bounds(self, cy, cx, h, w, py, px):
        """Ray-cast against an axis-aligned rect ring agrees with the
        direct bounds test whenever the point is clearly off the boundary
        (the half-open edge rule only matters ON the boundary)."""
        ring = K.rect_ring(cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2)
        eps = 1e-9 * max(1.0, abs(py), abs(px))
        on_edge = (
            min(abs(py - (cy - h / 2)), abs(py - (cy + h / 2))) < 1e-6
            or min(abs(px - (cx - w / 2)), abs(px - (cx + w / 2))) < 1e-6
        )
        if on_edge:
            return
        want = (cy - h / 2 < py < cy + h / 2) and (cx - w / 2 < px < cx + w / 2)
        got = K.point_in_rings(np.array([py]), np.array([px]), [ring], [])[0]
        assert got == want, (py, px, ring, eps)

    @given(
        n=st.integers(min_value=3, max_value=12),
        seed=st.integers(min_value=0, max_value=10_000),
        r=st.floats(min_value=1.0, max_value=30.0, allow_nan=False),
    )
    @settings(max_examples=200, deadline=None)
    def test_convex_polygon_center_inside(self, n, seed, r):
        """The centroid of a convex polygon (star-sampled) is inside it;
        a far-outside point is not."""
        rng = np.random.default_rng(seed)
        ang = np.sort(rng.uniform(0, 2 * np.pi, size=n))
        if len(np.unique(np.round(ang, 6))) < 3:
            return
        ys = r * np.sin(ang)
        xs = r * np.cos(ang)
        ring = np.stack([np.append(ys, ys[0]), np.append(xs, xs[0])], axis=1)
        cy, cx = ys.mean(), xs.mean()
        assert K.point_in_rings(np.array([cy]), np.array([cx]), [ring], [])[0]
        assert not K.point_in_rings(np.array([cy + 3 * r]), np.array([cx]), [ring], [])[0]


class TestSegmentRectProperties:
    @given(
        y1=st.floats(-50, 50, allow_nan=False), x1=st.floats(-50, 50, allow_nan=False),
        y2=st.floats(-50, 50, allow_nan=False), x2=st.floats(-50, 50, allow_nan=False),
        ry=st.floats(-40, 40, allow_nan=False), rx=st.floats(-40, 40, allow_nan=False),
        rh=st.floats(0.5, 10, allow_nan=False), rw=st.floats(0.5, 10, allow_nan=False),
    )
    @settings(max_examples=300, deadline=None)
    def test_inside_endpoints_intersect(self, y1, x1, y2, x2, ry, rx, rh, rw):
        a, b, c, d = ry, ry + rh, rx, rx + rw
        inside1 = a < y1 < b and c < x1 < d
        inside2 = a < y2 < b and c < x2 < d
        got = K.segment_intersects_rect(
            np.array([y1]), np.array([x1]), np.array([y2]), np.array([x2]), a, b, c, d
        )[0]
        if inside1 or inside2:
            assert got
        # CLEARLY disjoint bounding boxes → no intersection (the margin
        # keeps float absorption at touching boundaries out of scope —
        # Liang-Barsky counts boundary touches as intersections)
        if (max(y1, y2) < a - 1e-6 or min(y1, y2) > b + 1e-6
                or max(x1, x2) < c - 1e-6 or min(x1, x2) > d + 1e-6):
            assert not got


class TestUnwrapProperties:
    @given(
        a=st.floats(-60, 50, allow_nan=False),
        c=st.floats(-179.0, 179.0, allow_nan=False),
        h=st.floats(1.0, 25.0, allow_nan=False),
        w=st.floats(1.0, 25.0, allow_nan=False),
        seed=st.integers(0, 10_000),
    )
    @settings(max_examples=60, deadline=None)
    def test_jump_form_equals_continuous_form(self, a, c, h, w, seed):
        """A ring stored NORMALIZED (lons in [-180,180), wraps encoded as
        jumps > 180°) and the same ring in the continuous frame give
        identical PIP answers for probe points around the region — the
        two storage conventions are interchangeable through unwrap_rings."""
        cont = K.rect_ring(a, c, a + h, c + w)  # continuous frame (c+w may pass 180)
        norm = cont.copy()
        norm[:, 1] = K.norm_lon(norm[:, 1])     # jump form
        o1, _ = K.unwrap_rings([cont], [])
        o2, _ = K.unwrap_rings([norm], [])
        rng = np.random.default_rng(seed)
        py = rng.uniform(a - 5, a + h + 5, size=30)
        px = K.norm_lon(rng.uniform(c - 5, c + w + 5, size=30))  # real-world lons
        got1 = K.point_in_rings(py, px, o1, [])
        got2 = K.point_in_rings(py, px, o2, [])
        assert (got1 == got2).all()


class TestCoverageProperties:
    @given(
        a=st.floats(-60, 50, allow_nan=False),
        c=st.floats(-170, 175, allow_nan=False),
        h=st.floats(1.0, 25.0, allow_nan=False),
        w=st.floats(1.0, 25.0, allow_nan=False),
        seed=st.integers(0, 10_000),
    )
    # explicit antimeridian regressions: touching +180, crossing it, and the
    # round-3 falsifying case (rect reaching exactly 180)
    @example(a=0.0, c=160.0, h=1.0, w=20.0, seed=1)
    @example(a=0.0, c=175.0, h=2.0, w=5.0, seed=2)
    @example(a=-10.0, c=170.0, h=5.0, w=25.0, seed=3)
    @example(a=30.0, c=172.05, h=4.0, w=15.9, seed=4)
    @settings(max_examples=80, deadline=None)
    def test_adaptive_equals_flat_membership(self, a, c, h, w, seed):
        """For random rect regions (including antimeridian-touching and
        -crossing ones: c + w may exceed 180 — the ring is then in the
        continuous frame) and random probe points, membership via the flat
        level-6 cover equals membership via the adaptive 6..9 cover (full
        hit OR (partial leaf AND ray-cast)) AND equals the direct ray-cast
        — the engine-default index is a pure optimization."""
        ring = K.rect_ring(a, c, a + h, c + w)
        rng = np.random.default_rng(seed)
        py = rng.uniform(a - 5, a + h + 5, size=40)
        px = rng.uniform(c - 5, c + w + 5, size=40)

        def member(keys, full, levels):
            out = np.zeros(len(py), dtype=bool)
            if len(keys) == 0:
                return out
            order = np.argsort(keys, kind="stable")
            sk, sf = keys[order], full[order]
            for lv in levels:
                pk = K.cell_key(py, px, lv)
                pos = np.searchsorted(sk, pk)
                pos[pos >= len(sk)] = len(sk) - 1
                hit = sk[pos] == pk
                for i in np.flatnonzero(hit):
                    if sf[pos[i]]:
                        out[i] = True
                    else:
                        out[i] |= bool(
                            K.point_in_rings(py[i : i + 1], px[i : i + 1], [ring], [])[0]
                        )
            return out

        fk, ff = K.covering_cells([ring], [], 6)
        ak, af = K.adaptive_covering_cells([ring], [], 6, 9)
        got_flat = member(fk, ff, [6])
        got_ad = member(ak, af, sorted({int(k) >> K._LEVEL_SHIFT for k in ak}))
        assert (got_flat == got_ad).all()
        # both index paths must agree with the direct ray-cast for points
        # clearly off the region boundary (the index is an optimization,
        # never a semantics change)
        direct = K.point_in_rings(py, px, [ring], [])
        edge = np.minimum.reduce([
            np.abs(py - a), np.abs(py - (a + h)), np.abs(px - c), np.abs(px - (c + w))
        ])
        ok = edge > 1e-6
        assert (got_flat[ok] == direct[ok]).all()


class TestCellKeysMultiProperty:
    @given(lat=lat_s, lon=lon_s)
    @settings(max_examples=300, deadline=None)
    @example(lat=90.0, lon=180.0)
    @example(lat=-90.0, lon=-180.0)
    @example(lat=np.nextafter(90.0, 0.0), lon=np.nextafter(180.0, -180.0))
    def test_multi_equals_per_level(self, lat, lon):
        """Shift-derived keys == per-level cell_key for every level subset
        (the nested-floor identity the flagship kernel relies on)."""
        levels = [0, 2, 6, 9, 10, 17, K.MAX_LEVEL]
        multi = K.cell_keys_multi([lat], [lon], levels)
        for L in levels:
            assert multi[L][0] == K.cell_key([lat], [lon], L)[0]
