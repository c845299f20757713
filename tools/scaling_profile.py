"""Phase profile of the scaling-section flagship (guide §1.4 noop-sink
isolation): where does the lo-config (local[4]) wall go?

Runs the exact _SCALE_RUNNER workload (complex region store, x128
pre-materialized pages) but times each pipeline prefix with the noop sink:

  scan      read pages parquet (url, text) only
  geocode   + regexp geocode + cell_key
  mask      + mapInArrow spatial kernel (mask words, pre-decode)
  flagship  full flagship_map (decode + cells-dict broadcast join)
  agg       run_flagship_materialized (the timed bench job)

Usage: python tools/scaling_profile.py [cpus] [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from pyspark.sql import functions as F

    from libosmtools_spark.joins.mapjoin import map_spatial_join
    from libosmtools_spark.session import get_spark

    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    fixtures = os.environ.get("SPARK_GRAFT_FIXTURES", "/root/repo/fixtures/sf0.1")
    inflated = os.environ.get(
        "SPARK_GRAFT_INFLATED", "/tmp/bench_scaling_pages_x128.parquet"
    )

    t0 = time.monotonic()
    spark = get_spark(app=f"profile{cpus}", cpus=cpus, shuffle_partitions=cpus)
    print(f"[p] spark_start: {time.monotonic()-t0:.1f}s", flush=True)

    t0 = time.monotonic()
    eng = bench.build_engine(spark, fixtures, complex_regions=True)
    print(f"[p] build_engine(complex): {time.monotonic()-t0:.1f}s", flush=True)
    t0 = time.monotonic()
    eng.candidates_bcast
    print(f"[p] candidates_bcast: {time.monotonic()-t0:.1f}s", flush=True)

    from libosmtools_spark.data.synth import ensure_fixtures

    t0 = time.monotonic()
    bench.run_flagship_materialized(eng, bench.load_pages(spark, ensure_fixtures("0.001")))
    print(f"[p] warm_sf0.001: {time.monotonic()-t0:.1f}s", flush=True)

    pages = spark.read.parquet(inflated)

    def timed(name, fn):
        best, best_cpu = None, None
        for _ in range(passes):
            c = bench.cpu_sec()
            t = time.monotonic()
            fn()
            dt = time.monotonic() - t
            dc = bench.cpu_sec() - c
            if best is None or dt < best:
                best, best_cpu = dt, dc
        print(f"[p] {name}: best {best:.2f}s cpu {best_cpu:.1f}s over {passes}", flush=True)

    spark.sparkContext.setJobDescription("profile: scan")
    timed("scan", lambda: noop(pages.select("url", "text")))

    def geocode_df():
        return eng.page_points(pages).select("url", "lat", "lon", "cell_key")

    spark.sparkContext.setJobDescription("profile: geocode+key")
    timed("geocode", lambda: noop(geocode_df()))

    spark.sparkContext.setJobDescription("profile: kernel masks")
    # pre-decode mask output: replicate map_spatial_join's input prep
    def mask_df():
        return map_spatial_join(geocode_df(), eng.candidates_bcast, eng.rings_bcast)

    timed("kernel+decode", lambda: noop(mask_df()))

    spark.sparkContext.setJobDescription("profile: flagship_map")
    timed("flagship_map", lambda: noop(eng.flagship_map(pages)))

    spark.sparkContext.setJobDescription("profile: materialized agg")
    timed("materialized", lambda: bench.run_flagship_materialized(eng, pages))

    spark.stop()


if __name__ == "__main__":
    main()
