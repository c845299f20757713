"""Structured-Streaming ingestion of a pages stream (north-rule batch
lineage is primary; streaming is the continuous-arrival variant of the same
flagship pipeline — geocode → cell key → windowed per-cell counts).

The stateless stages (geocode, cell key) reuse the exact batch Columns, so
streaming and batch cannot drift.  Watermarked tumbling windows bound state
for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libosmtools_spark.joins.spatial import geocode_pages, with_cell_key


def stream_cell_counts(
    pages_stream: DataFrame,
    level: int = 6,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """pages stream → (window, cell_key, n_pages) with watermarked late-data
    handling.  Works identically on a batch frame (for oracle checks) —
    window() and the geocode/cell-key Columns are engine-agnostic."""
    pts = with_cell_key(geocode_pages(pages_stream), level=level)
    return (
        pts.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "cell_key")
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "cell_key",
            "n_pages",
        )
    )


def stream_dedup_first_seen(pages_stream: DataFrame):
    """Custom stateful operator (applyInPandasWithState): emit each url the
    FIRST time it is seen across the whole stream; duplicates in later
    micro-batches are suppressed.  State = one boolean per url group.

    This is the streaming face of the dedup family (north-rule training-
    data op): exact online deduplication with bounded per-key state."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def dedup(key, batches, state):
        if state.exists:
            # already emitted — swallow everything
            for _ in batches:
                pass
            return iter(())
        # a url's rows within one micro-batch may span several Arrow
        # chunks: track the min-warc_ts row ACROSS all chunks (chunk-order
        # independence → deterministic output for duplicate-heavy batches)
        first = None
        for pdf in batches:
            if not len(pdf):
                continue
            cand = pdf.sort_values(["warc_ts", "lang"], kind="stable").head(1)
            if first is None or (
                tuple(cand[["warc_ts", "lang"]].iloc[0])
                < tuple(first[["warc_ts", "lang"]].iloc[0])
            ):
                first = cand
        state.update((True,))
        return iter(() if first is None else (first[["url", "warc_ts", "lang"]],))

    return (
        pages_stream.select("url", "warc_ts", "lang")
        .groupBy("url")
        .applyInPandasWithState(
            dedup,
            outputStructType="url string, warc_ts timestamp, lang string",
            stateStructType="seen boolean",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_first_event_per_user(events_stream: DataFrame):
    """Custom stateful operator (applyInPandasWithState): emit each
    user_id's FIRST event across the whole stream; later micro-batches'
    rows for a seen user are suppressed.  State = one boolean per user.

    First-seen is a STREAM-ORDER semantic; when the input stream is
    globally ordered by (ts, event_id) — the driver query stages it that
    way — the emitted row equals the relational ``row_number() OVER
    (PARTITION BY user_id ORDER BY ts, event_id) = 1`` answer, which is
    the exact-oracle contract.  Same chunk-order-independent min tracking
    as stream_dedup_first_seen."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def first(key, batches, state):
        if state.exists:
            for _ in batches:
                pass
            return iter(())
        best = None
        for pdf in batches:
            if not len(pdf):
                continue
            cand = pdf.sort_values(["ts", "event_id"], kind="stable").head(1)
            if best is None or (
                tuple(cand[["ts", "event_id"]].iloc[0])
                < tuple(best[["ts", "event_id"]].iloc[0])
            ):
                best = cand
        state.update((True,))
        return iter(
            () if best is None else (best[["user_id", "ts", "event_id", "event_type"]],)
        )

    return (
        events_stream.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            first,
            outputStructType=(
                "user_id bigint, ts timestamp, event_id bigint, event_type string"
            ),
            stateStructType="seen boolean",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _cleanup_staged(d) -> None:
    """Remove a mkdtemp staging copy after the stream drains (the memory
    sink owns the rows); no-op when the caller passed a real directory."""
    if d is not None:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


def run_dedup_stream_to_memory(spark, pages_dir: str, query_name: str = "dedup_stream"):
    """Drive the stateful dedup synchronously over fixture parquet."""
    import os
    import shutil
    import tempfile

    d = None
    if os.path.isfile(pages_dir):
        d = tempfile.mkdtemp(prefix="geostream_dedup_")
        shutil.copy(pages_dir, os.path.join(d, os.path.basename(pages_dir)))
        pages_dir = d
    static = spark.read.parquet(pages_dir)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(pages_dir)
    )
    out = stream_dedup_first_seen(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        _cleanup_staged(d)
    return spark.sql(f"SELECT * FROM {query_name}")


def run_stream_to_memory(spark, pages_dir: str, level: int = 6, query_name: str = "cells_stream"):
    """Drive the streaming query synchronously over the fixture parquet
    (memory sink; processAllAvailable) — the local smoke harness."""
    import os
    import shutil
    import tempfile

    d = None
    if os.path.isfile(pages_dir):
        # streaming file source requires a directory
        d = tempfile.mkdtemp(prefix="geostream_")
        shutil.copy(pages_dir, os.path.join(d, os.path.basename(pages_dir)))
        pages_dir = d
    static = spark.read.parquet(pages_dir)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(pages_dir)
    )
    agg = stream_cell_counts(stream, level=level)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        _cleanup_staged(d)
    return spark.sql(f"SELECT * FROM {query_name}")


def stream_region_counts(
    pages_stream: DataFrame,
    candidates_bcast,
    rings_bcast,
    level: int = 6,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """pages stream → (window, region_id, n_pages): the FULL spatial join
    running continuously — the zero-shuffle broadcast-store kernel
    (joins/mapjoin.map_spatial_join) is a stateless mapInArrow, so it
    composes with Structured Streaming unchanged; the event timestamp
    rides through the kernel as an Arrow passthrough column and feeds the
    watermarked window after region explode.  Identical on a batch frame
    (stream == batch parity-tested)."""
    from libosmtools_spark.joins.mapjoin import map_spatial_join

    pts = with_cell_key(geocode_pages(pages_stream), level=level).select(
        "url", "warc_ts", "lat", "lon", "cell_key"
    )
    res = map_spatial_join(
        pts, candidates_bcast, rings_bcast, carry_cols=("warc_ts",)
    )
    rows = res.select("warc_ts", F.explode("region_ids").alias("region_id"))
    return (
        rows.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "region_id")
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "region_id",
            "n_pages",
        )
    )


def run_region_stream_to_memory(spark, pages_dir: str, engine, query_name: str = "regions_stream"):
    """Drive the streaming spatial join synchronously over fixture parquet
    (memory sink; processAllAvailable) using a prebuilt SpatialEngine's
    broadcast artifacts."""
    import os
    import shutil
    import tempfile

    d = None
    if os.path.isfile(pages_dir):
        d = tempfile.mkdtemp(prefix="geostream_regions_")
        shutil.copy(pages_dir, os.path.join(d, os.path.basename(pages_dir)))
        pages_dir = d
    static = spark.read.parquet(pages_dir)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(pages_dir)
    )
    agg = stream_region_counts(stream, engine.candidates_bcast, engine.rings_bcast,
                               level=engine.level)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        _cleanup_staged(d)
    return spark.sql(f"SELECT * FROM {query_name}")
