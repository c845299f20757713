"""T21 — the self-test invariant suite as a relational query.

The reference's ``selfTest`` walks the region store asserting its
structural contract (/root/reference/src/OsmTriangulationRegionStore.cpp:
1227-1281): cell ids are gap-free, the unassigned cell is exactly the
empty region set, the key→id map is a function, per-cell region lists are
sorted and duplicate-free, and every face's stored cell agrees with a
fresh lookup.  Here each invariant is a bounded aggregate over the cells
dictionary (dimension-scale by the T4 contract) — except the
assignment-consistency check, which is a distributed join over the point
table and scales with the corpus.  The result is a violations table:
one row per check, ``n_violations = 0`` everywhere on a healthy store,
so the driver oracle is a constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def selftest_violations(cells: DataFrame, point_cells: DataFrame | None = None) -> DataFrame:
    """cells(cell_key, cell_id, region_ids)
    [+ point_cells(…, cell_key, cell_id)] → (check_name, n_violations).

    Checks, one output row each (reference contract file:line above):
    - ``cell_ids_dense``        — observed ids form a gap-free run whose
      floor is 0 or 1 (cell 0 may legitimately be absent); 0/1 flag.
    - ``cell_key_unique``       — keys mapped to more than one row.
    - ``empty_set_iff_cell0``   — cells where (cell_id == 0) disagrees
      with (region_ids is empty): the unassigned⇔empty bijection.
    - ``region_ids_sorted_distinct`` — cells whose region list is not
      strictly ascending (sorted AND duplicate-free).
    - ``set_id_bijection``      — region sets mapped to several ids plus
      ids shared by several sets (0 excluded: it is the empty-set id).
    - ``points_match_dict``     — only with ``point_cells``: points whose
      stored cell_id differs from a fresh dictionary lookup of their key
      (missing key → 0, the outside-domain contract).
    """
    base = cells.select("cell_key", "cell_id", "region_ids")

    def named(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("check_name"),
            F.col("n").cast("long").alias("n_violations"),
        )

    dense = named(
        "cell_ids_dense",
        base.agg(
            F.countDistinct("cell_id").alias("n_ids"),
            F.min("cell_id").alias("mn"),
            F.max("cell_id").alias("mx"),
        ).select(
            F.when(F.col("n_ids") == 0, F.lit(0))
            .when(
                (F.col("mn") >= 0)
                & (F.col("mn") <= 1)
                & (F.col("n_ids") == F.col("mx") - F.col("mn") + 1),
                F.lit(0),
            )
            .otherwise(F.lit(1))
            .alias("n")
        ),
    )
    dup_keys = named(
        "cell_key_unique",
        base.groupBy("cell_key")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count("*").alias("n")),
    )
    # null-safe: a NULL cell_id/region_ids is itself corruption and must
    # COUNT as a violation — a plain != predicate evaluates to NULL there
    # and the filter would silently drop the row (store reads healthy)
    empty_iff_0 = named(
        "empty_set_iff_cell0",
        base.filter(
            F.col("cell_id").isNull()
            | F.col("region_ids").isNull()
            | ((F.col("cell_id") == 0) != (F.size("region_ids") == 0))
        ).agg(F.count("*").alias("n")),
    )
    sorted_distinct = named(
        "region_ids_sorted_distinct",
        base.filter(
            F.col("region_ids").isNull()
            | (F.sort_array("region_ids") != F.col("region_ids"))
            | (F.size(F.array_distinct("region_ids")) != F.size("region_ids"))
        ).agg(F.count("*").alias("n")),
    )
    canon = base.filter(F.col("cell_id") != 0).select(
        "cell_id", F.sort_array("region_ids").alias("rset")
    )
    set_to_ids = (
        canon.groupBy("rset")
        .agg(F.countDistinct("cell_id").alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count("*").alias("a"))
    )
    id_to_sets = (
        canon.groupBy("cell_id")
        .agg(F.countDistinct("rset").alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count("*").alias("b"))
    )
    bijection = named(
        "set_id_bijection",
        set_to_ids.crossJoin(id_to_sets).select((F.col("a") + F.col("b")).alias("n")),
    )
    out = dense.unionByName(dup_keys).unionByName(empty_iff_0).unionByName(
        sorted_distinct
    ).unionByName(bijection)
    if point_cells is not None:
        looked_up = point_cells.select("cell_key", F.col("cell_id").alias("stored")).join(
            base.select("cell_key", F.col("cell_id").alias("fresh")), "cell_key", "left"
        )
        mismatch = named(
            "points_match_dict",
            looked_up.filter(
                F.col("stored").isNull()
                | (F.col("stored") != F.coalesce(F.col("fresh"), F.lit(0)))
            ).agg(F.count("*").alias("n")),
        )
        out = out.unionByName(mismatch)
    return out
