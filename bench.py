"""Bench harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Headline metric: spatial-join + tile-assignment throughput (pages/sec) —
the flagship pipeline (geocode → cell-key → index join → PIP refine →
cells dictionary → page cell ids) over the matching-tier pages fixtures
(sf0.1 ≈ 200k pages), per BASELINE.json.

Set SPARK_GRAFT_SCALING=1 to additionally run the flagship at local[8] and
local[32] on the same input and report scaling efficiency (the north-rule
two-cluster-size criterion, evidenced at two parallelism levels).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF = os.path.basename(os.path.normpath(SF_DIR)).removeprefix("sf")


def make_spark(cpus: int):
    from libosmtools_spark.session import get_spark

    return get_spark(app=f"bench-{cpus}", cpus=cpus, shuffle_partitions=max(cpus, 8))


def flagship_count(spark, fixtures: str) -> int:
    """Materialize the full flagship output; returns row count (=pages)."""
    from libosmtools_spark.pipeline import run_flagship

    return run_flagship(spark, fixtures).count()


def bench_queries(spark, fixtures: str) -> dict[str, float]:
    import __spark_entry__ as entry

    qs = entry.queries()
    picks = [
        "pip_region_sets",
        "doc_cell_ids",
        "knn",
        "tile_counts",
        "cell_dual_graph",
        "dedup_exact",
        "jaccard_pairs",
        "minhash_lsh",
        "ann_cosine",
        "token_count",
        "lang_id",
        "events_window",
        "sessionize",
    ]
    out: dict[str, float] = {}
    for name in picks:
        t0 = time.monotonic()
        qs[name](spark, SF_DIR).count()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def main() -> None:
    from libosmtools_spark.data.synth import ensure_fixtures

    fixtures = ensure_fixtures(SF if SF in ("0.001", "0.01", "0.1") else "0.01")

    spark = make_spark(CPUS)
    # warm the JVM/Arrow path once at small scale
    flagship_count(spark, ensure_fixtures("0.001"))

    t0 = time.monotonic()
    n_pages = flagship_count(spark, fixtures)
    flagship_sec = time.monotonic() - t0

    queries = {"flagship": round(flagship_sec, 3)}
    queries.update(bench_queries(spark, fixtures))
    spark.stop()

    result = {
        "metric": "spatial_join_tile_assign_pages_per_sec",
        "value": round(n_pages / flagship_sec, 1),
        "unit": "sec",
        "queries": queries,
        "sf": SF,
        "n_pages": n_pages,
        "cpus": CPUS,
    }

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        scaling = {}
        for cpus in (8, 32):
            s = make_spark(cpus)
            flagship_count(s, ensure_fixtures("0.001"))  # warm
            t0 = time.monotonic()
            n = flagship_count(s, fixtures)
            dt = time.monotonic() - t0
            scaling[str(cpus)] = {"sec": round(dt, 3), "pages_per_sec": round(n / dt, 1)}
            s.stop()
        thr8 = scaling["8"]["pages_per_sec"]
        thr32 = scaling["32"]["pages_per_sec"]
        result["scaling"] = scaling
        result["scaling_efficiency"] = round((thr32 / thr8) / (32 / 8), 3)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
