"""Refinement criteria (T16-T19) and hop-BFS cell splitting (T6/T7/T23)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from libosmtools_spark.geom.kernels import _LEVEL_SHIFT


class TestBFSKernels:
    def grid_adj(self, w, h):
        from libosmtools_spark.cells.hopsplit import _local_adjacency

        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        return _local_adjacency(ys.ravel(), xs.ravel(), nlon=10_000), ys.ravel(), xs.ravel()

    def test_bfs_distances_manhattan(self):
        from libosmtools_spark.cells.hopsplit import _bfs

        adj, ys, xs = self.grid_adj(5, 5)
        d = _bfs(adj, 0)  # from (0,0)
        assert (d == ys + xs).all()

    def test_max_hop_pair_exact(self):
        from libosmtools_spark.cells.hopsplit import max_hop_pair

        adj, ys, xs = self.grid_adj(4, 3)
        u, v, diam = max_hop_pair(adj)
        assert diam == (3 - 1) + (4 - 1)

    def test_max_hop_pair_approx_reasonable(self):
        from libosmtools_spark.cells.hopsplit import max_hop_pair

        adj, ys, xs = self.grid_adj(30, 30)
        _, _, exact = max_hop_pair(adj, exact_cutoff=10_000)
        _, _, approx = max_hop_pair(adj, exact_cutoff=1)
        assert approx >= exact * 0.7  # double-sweep on a grid is near-exact

    def test_multi_source_partition(self):
        from libosmtools_spark.cells.hopsplit import _multi_source_bfs

        adj, ys, xs = self.grid_adj(10, 1)  # a path graph
        owner, dist = _multi_source_bfs(adj, [0, 9])
        assert owner[0] == 0 and owner[9] == 1
        assert (owner >= 0).all()
        assert owner[4] == 0 and owner[5] == 1


class TestHopSplit:
    def test_splits_hot_cell(self, spark, sf_smoke):
        from libosmtools_spark.cells.assign import assign_point_cell_ids
        from libosmtools_spark.cells.hopsplit import split_oversized_cells_hopbfs
        from libosmtools_spark.pipeline import SpatialEngine

        eng = SpatialEngine.from_fixtures(spark, sf_smoke)
        pages = spark.read.parquet(os.path.join(sf_smoke, "pages.parquet"))
        pts = eng.page_points(pages).select("url", "lat", "lon", "cell_key")
        cells = eng.cells(pages)
        pc = assign_point_cell_ids(pts, cells)
        out = split_oversized_cells_hopbfs(pc, max_points=200, level=6).toPandas()
        assert len(out) == pages.count()
        sizes = out.groupby("refined_cell_id").size()
        # the urban hotspot cell must have been split into >1 part
        hot = out.groupby("cell_id").size()
        for cid, n in hot.items():
            parts = out.loc[out.cell_id == cid, "refined_cell_id"].nunique()
            if n > 200:
                assert parts > 1, f"cell {cid} ({n} points) not split"
            else:
                assert parts == 1

    def test_deterministic(self, spark, sf_smoke):
        from libosmtools_spark.cells.assign import assign_point_cell_ids
        from libosmtools_spark.cells.hopsplit import split_oversized_cells_hopbfs
        from libosmtools_spark.pipeline import SpatialEngine

        eng = SpatialEngine.from_fixtures(spark, sf_smoke)
        pages = spark.read.parquet(os.path.join(sf_smoke, "pages.parquet")).limit(500)
        pts = eng.page_points(pages).select("url", "lat", "lon", "cell_key")
        cells = eng.cells(pages)
        pc = assign_point_cell_ids(pts, cells)
        a = split_oversized_cells_hopbfs(pc, max_points=100, level=6).toPandas()
        b = split_oversized_cells_hopbfs(pc, max_points=100, level=6).toPandas()
        a = a.sort_values("url").reset_index(drop=True)
        b = b.sort_values("url").reset_index(drop=True)
        assert (a["refined_cell_id"] == b["refined_cell_id"]).all()


class TestCriteria:
    def test_diag_refinement_reaches_target(self, spark):
        from libosmtools_spark.cells.criteria import diag_criterion, refine_until_good
        from libosmtools_spark.geom.kernels import cell_key

        keys = [int(cell_key([48.0], [11.0], 4)[0]), int(cell_key([0.0], [0.0], 4)[0])]
        cells = spark.createDataFrame([(k,) for k in keys], "cell_key long")
        out = refine_until_good(cells, diag_criterion(200_000.0), max_level=12).toPandas()
        levels = out["cell_key"].to_numpy() >> _LEVEL_SHIFT
        assert levels.min() > 4  # everything got subdivided at least once
        from libosmtools_spark.geom.kernels import cell_diag_m

        assert cell_diag_m(out["cell_key"].to_numpy()).max() <= 200_000.0

    def test_refine_fixpoint_count_refresh(self, spark):
        """refine_until_good with the count criterion + occupancy refresh
        (the T16 loop the driver oracles as ``refine_fixpoint``): the
        result is a fixpoint (no cell over the bound below max_level), a
        partition of the input points (counts sum exactly), and children
        only exist where an ancestor was over the bound."""
        import __spark_entry__ as entry

        out = entry.q_refine_fixpoint(spark, "/root/testdata/sf0.001").toPandas()
        levels = out["cell_key"].to_numpy() >> _LEVEL_SHIFT
        n = out["n_points"].to_numpy()
        # fixpoint: below max level nothing is over the bound
        assert (n[levels < entry.REFINE_MAX_LEVEL] <= entry.REFINE_MAX_COUNT).all()
        # partition: every point counted exactly once across surviving cells
        n_docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
        assert int(n.sum()) == n_docs
        # keys unique; refined levels only appear via split ancestors
        assert out["cell_key"].is_unique
        assert levels.min() == entry.REFINE_BASE_LEVEL
        mask = levels > entry.REFINE_BASE_LEVEL
        keys = out["cell_key"].to_numpy()[mask]
        lv = levels[mask]
        iy = (keys >> 28) & ((1 << 27) - 1)
        ix = keys & ((1 << 28) - 1)
        pkeys = ((lv - 1) << _LEVEL_SHIFT) + (iy // 2 << 28) + ix // 2
        # no surviving cell's parent also survives (parents were replaced)
        assert not set(pkeys.tolist()) & set(out["cell_key"].tolist())

    def test_count_criterion_column(self, spark):
        from libosmtools_spark.cells.criteria import count_criterion

        df = spark.createDataFrame([(1, 10), (2, 300)], "cell_key long, n_points long")
        bad = df.filter(count_criterion(100)(df)).toPandas()
        assert list(bad["cell_key"]) == [2]

    def test_centroid_distance_criterion(self, spark):
        """CentroidDistanceMeshCriteria analog
        (/root/reference/include/osmtools/MeshCriteria.h:126-167): max
        center→corner geodesic distance vs the half-diagonal."""
        from libosmtools_spark.cells.criteria import centroid_distance_criterion
        from libosmtools_spark.geom.kernels import cell_diag_m, cell_key

        keys = [int(cell_key([0.0], [0.0], 6)[0]), int(cell_key([0.0], [0.0], 12)[0])]
        df = spark.createDataFrame([(k,) for k in keys], "cell_key long")
        # threshold between the two cells' center→corner distances: the
        # level-6 cell is bad, the level-12 cell is not
        import numpy as np

        half_diag6 = cell_diag_m(np.array(keys[:1]))[0] / 2
        bad = df.filter(centroid_distance_criterion(half_diag6 * 0.5)(df)).toPandas()
        assert list(bad["cell_key"]) == [keys[0]]
        none_bad = df.filter(centroid_distance_criterion(half_diag6 * 2)(df)).toPandas()
        assert len(none_bad) == 0

    def test_edge_length_and_ratio_criteria(self, spark):
        """EdgeLengthMeshCriteria + EdgeLengthRatioMeshCriteria with the
        tiny-triangle guard (/root/reference/include/osmtools/MeshCriteria.h:169-290,
        guard :277-284)."""
        from libosmtools_spark.cells.criteria import (
            edge_length_criterion,
            edge_length_ratio_criterion,
        )
        from libosmtools_spark.geom.kernels import cell_key

        equator = int(cell_key([0.0], [0.0], 6)[0])
        polar = int(cell_key([89.9], [0.0], 6)[0])     # lon edges shrink by cos(lat)
        tiny = int(cell_key([89.9], [0.0], 26)[0])     # sub-meter cell near the pole
        df = spark.createDataFrame([(equator,), (polar,), (tiny,)], "cell_key long")
        # edge length: the two level-6 cells have ~313 km meridian edges
        bad_len = df.filter(edge_length_criterion(100_000.0)(df)).toPandas()
        assert set(bad_len["cell_key"]) == {equator, polar}
        # ratio: only the polar cell is skewed (equator cell ~1:1); the tiny
        # polar cell is equally skewed but saved by the tiny-cell guard
        bad_ratio = df.filter(edge_length_ratio_criterion(5.0)(df)).toPandas()
        assert set(bad_ratio["cell_key"]) == {polar}

    def test_with_cell_id_wrapper(self, spark):
        """RefineTrianglesWithCellIdMeshCriteria analog
        (/root/reference/include/osmtools/MeshCriteria.h:356-384)."""
        from libosmtools_spark.cells.criteria import count_criterion, with_cell_id_criterion

        df = spark.createDataFrame(
            [(1, 300, 7), (2, 300, None)], "cell_key long, n_points long, cell_id int"
        )
        crit = with_cell_id_criterion(count_criterion(100))
        bad = df.filter(crit(df)).toPandas()
        assert list(bad["cell_key"]) == [1]


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))
