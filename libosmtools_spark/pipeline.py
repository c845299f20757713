"""The flagship end-to-end pipeline (SURVEY.md §3.3 Spark lifecycle):

pages → geocode(text) → cell_key arithmetic → cell-index equi-join →
PIP-refine partial hits → region sets per url → cells dictionary →
(url, cell_key, cell_id, region_ids).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from libosmtools_spark.cells.assign import (
    assign_point_cell_ids,
    build_cells_table,
    build_cells_table_map,
)
from libosmtools_spark.index.grid import build_adaptive_cell_index, rings_lookup
from libosmtools_spark.joins.spatial import (
    geocode_pages,
    page_region_sets,
    spatial_join_adaptive,
    spatial_join_adaptive_left,
    with_cell_key,
)

DEFAULT_LEVEL = 6
#: levels of recursive boundary refinement below the base grid — the
#: engine DEFAULT is the adaptive multi-level index (the reference's whole
#: point is quadtree refinement while cells exceed a size bound,
#: FixedSizeDiagRefiner /root/reference/src/OsmGridRegionTree.cpp:13-30):
#: boundary cells subdivide until max_level, so nearly all points resolve
#: as definite (no ray-cast) and the rest ray-cast against edges clipped
#: to a 16x finer cell.  Index size stays boundary-linear.  max_level ==
#: level degenerates to the flat single-level index (the round-1/2 shape).
DEFAULT_REFINE_LEVELS = 4


class SpatialEngine:
    """Holds the built index artifacts (the analog of the reference's
    OsmGridRegionTree + OsmTriangulationRegionStore pair) for a region store.
    """

    def __init__(
        self,
        spark: SparkSession,
        region_rings: DataFrame,
        level: int = DEFAULT_LEVEL,
        max_level: int | None = None,
    ):
        self.spark = spark
        self.level = level
        self.max_level = level + DEFAULT_REFINE_LEVELS if max_level is None else max_level
        self.region_rings = region_rings
        # dimension-scale: collect rings ONCE — the same collected frame
        # feeds the broadcast lookup AND the (count-gated driver-local)
        # index build, so the engine constructor runs one Spark job instead
        # of a collect + a shuffle/UDF stage per build
        rings_pdf = region_rings.toPandas()
        self.rings_bcast = spark.sparkContext.broadcast(rings_lookup(rings_pdf))
        self.cell_index = build_adaptive_cell_index(
            region_rings, level, self.max_level, rings_pdf=rings_pdf
        ).cache()
        self._candidates_bcast = None

    @property
    def candidates_bcast(self):
        """cell_key → (region ids, full flags) lookup, broadcast lazily —
        powers the zero-shuffle map join."""
        if self._candidates_bcast is None:
            from libosmtools_spark.joins.mapjoin import build_cell_candidates

            self._candidates_bcast = self.spark.sparkContext.broadcast(
                build_cell_candidates(self.cell_index.toPandas(), self.rings_bcast.value)
            )
        return self._candidates_bcast

    @classmethod
    def from_fixtures(cls, spark: SparkSession, fixtures_dir: str, level: int = DEFAULT_LEVEL):
        rings = spark.read.parquet(os.path.join(fixtures_dir, "region_rings.parquet"))
        return cls(spark, rings, level)

    # -- queries ---------------------------------------------------------

    def page_points(self, pages: DataFrame) -> DataFrame:
        return with_cell_key(geocode_pages(pages), level=self.level)

    def page_regions(self, pages: DataFrame) -> DataFrame:
        """(url, region_ids sorted array) for every page — join-output parity
        target (BASELINE.json north_star)."""
        pts = self.page_points(pages).select("url", "lat", "lon", "cell_key")
        hits = spatial_join_adaptive(
            pts, self.cell_index, self.rings_bcast, self.level, self.max_level
        )
        return page_region_sets(hits.select("url", "region_id"), pages)

    def page_region_rows(self, pages: DataFrame) -> DataFrame:
        """Exploded (url, region_id) rows — the raw join output."""
        pts = self.page_points(pages).select("url", "lat", "lon", "cell_key")
        return spatial_join_adaptive(
            pts, self.cell_index, self.rings_bcast, self.level, self.max_level
        ).select("url", "region_id")

    def cells(self, pages: DataFrame) -> DataFrame:
        """(cell_key, cell_id, region_ids) dictionary over the cells the
        pages occupy (T4)."""
        pts = self.page_points(pages).select("cell_key")
        return build_cells_table(
            pts, self.cell_index, self.rings_bcast, self.level, self.max_level
        )

    def page_cells(self, pages: DataFrame) -> DataFrame:
        """(url, cell_key, cell_id) — tile-to-cell assignment per url."""
        pts = self.page_points(pages).select("url", "cell_key")
        cells = self.cells(pages)
        return assign_point_cell_ids(pts, cells).select("url", "cell_key", "cell_id")

    def flagship_map(self, pages: DataFrame) -> DataFrame:
        """(url, cell_key, cell_id, region_ids) with ZERO shuffles — the
        broadcast-store plan (joins/mapjoin.py): one text-in mapInArrow
        resolves each page's geocode, cell key AND region set (RE2 + numpy
        inside the batch — the JVM regex/key pass and 24 B/row of Arrow
        boundary traffic are gone, see map_spatial_join_text); the cells
        dictionary derives from a text-only second pass that emits
        batch-unique keys, and joins broadcast.  The plan of record for
        10^12 pages with a broadcastable polygon store (the reference's
        own in-memory posture)."""
        from libosmtools_spark.joins.mapjoin import (
            map_spatial_join_text,
            page_cell_keys_text,
        )

        res = map_spatial_join_text(
            pages, self.candidates_bcast, self.rings_bcast, level=self.level
        )
        cells = build_cells_table_map(
            page_cell_keys_text(pages, level=self.level),
            self.candidates_bcast,
            self.rings_bcast,
            # batch-unique keys already — the fused build's single task
            # dedups globally, no distinct exchange needed
            input_batch_unique=True,
        )
        out = res.join(F.broadcast(cells.select("cell_key", "cell_id")), "cell_key", "left")
        return out.select(
            "url",
            "cell_key",
            F.coalesce("cell_id", F.lit(0)).alias("cell_id"),
            "region_ids",
        )

    def flagship(self, pages: DataFrame) -> DataFrame:
        """(url, cell_key, cell_id, region_ids) — ONE wide pass:

        left-join the broadcast cell index (every page survives; failed PIP
        candidates become NULL), then a single groupBy(url) builds the
        region set AND carries cell_key — no page×page join anywhere.  The
        cells dictionary is dimension-scale and broadcast.  Total cost at
        scale: one broadcast join + one shuffle on url (the adaptive left
        join keeps the shuffle at ~1× the page count: non-matching probe
        rows are dropped except each page's guaranteed base-level row)."""
        pts = self.page_points(pages).select("url", "lat", "lon", "cell_key")
        hits = spatial_join_adaptive_left(
            pts, self.cell_index, self.rings_bcast, self.level, self.max_level
        )
        agg = hits.groupBy("url").agg(
            F.first("cell_key").alias("cell_key"),
            F.array_sort(F.collect_set("region_id")).alias("region_ids"),
        )
        cells = build_cells_table_map(
            pts.select("cell_key"), self.candidates_bcast, self.rings_bcast
        )
        out = agg.join(F.broadcast(cells.select("cell_key", "cell_id")), "cell_key", "left")
        return out.select(
            "url",
            "cell_key",
            F.coalesce("cell_id", F.lit(0)).alias("cell_id"),
            "region_ids",
        )


def pages_from_html(pages: DataFrame) -> DataFrame:
    """pages with ``text`` re-derived by EXTRACTION from the ``html``
    binary column instead of trusting the stored text — the input source
    the north-star actually describes (geocode pages from extracted page
    text).  Composable with every SpatialEngine method; the byte-identical
    invariant says the flagship over this frame equals the flagship over
    the original, which tests assert against the goldens."""
    from libosmtools_spark.text.analysis import html_text_col

    return pages.withColumn("text", html_text_col(F.col("html")))


def run_flagship(spark: SparkSession, fixtures_dir: str, level: int = DEFAULT_LEVEL) -> DataFrame:
    """pages → (url, cell_key, cell_id, region_ids)."""
    pages = spark.read.parquet(os.path.join(fixtures_dir, "pages.parquet"))
    eng = SpatialEngine.from_fixtures(spark, fixtures_dir, level)
    return eng.flagship(pages)


def run_flagship_staged(
    spark: SparkSession,
    fixtures_dir: str,
    ckpt_root: str,
    level: int = DEFAULT_LEVEL,
    max_level: int | None = None,
) -> DataFrame:
    """The production shape of the flagship: staged, resumable, and ONE
    scan of the fact table.

    - stage ``page_regions``: the zero-shuffle map join, written to
      parquet (this IS the expensive fact pass — geocode + kernel);
    - stage ``cells``: the dictionary built from the STAGE OUTPUT's
      distinct cells (read back from the narrow stage-1 parquet — the
      in-memory flagship_map re-derives them with a second pages scan,
      which at 10^12 rows is a full extra fact pass);
    - stage ``flagship``: broadcast join of the two.

    Each stage records manifest lineage + per-partition metrics
    (run/checkpoint.py); re-running with an unchanged input fingerprint
    skips straight to reading the stage parquet — resumable from any
    point (north-rule requirement)."""
    from libosmtools_spark.cells.assign import build_cells_table_map
    from libosmtools_spark.joins.mapjoin import map_spatial_join_text
    from libosmtools_spark.run.checkpoint import CheckpointManager, input_fingerprint

    pages_path = os.path.join(fixtures_dir, "pages.parquet")
    fp = input_fingerprint(spark, pages_path)
    rings = spark.read.parquet(os.path.join(fixtures_dir, "region_rings.parquet"))
    eng = SpatialEngine(spark, rings, level, max_level)
    cp = CheckpointManager(spark, ckpt_root)

    def build_regions():
        pages = spark.read.parquet(pages_path)
        return map_spatial_join_text(
            pages, eng.candidates_bcast, eng.rings_bcast, level=eng.level
        )

    res = cp.stage("page_regions", fp, build_regions)
    cells = cp.stage(
        "cells",
        fp,
        lambda: build_cells_table_map(
            res.select("cell_key"), eng.candidates_bcast, eng.rings_bcast
        ),
    )
    final = cp.stage(
        "flagship",
        fp,
        lambda: res.join(F.broadcast(cells.select("cell_key", "cell_id")), "cell_key", "left")
        .select(
            "url",
            "cell_key",
            F.coalesce("cell_id", F.lit(0)).alias("cell_id"),
            "region_ids",
        ),
    )
    return final
