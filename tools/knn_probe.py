"""Measure the real brute↔ring kNN crossover on the bench corpus.

Times knn_brute vs knn_ring at several point counts drawn from the x10
replica corpus (same spatial distribution as the census), each in THIS
process but with a per-size cache reset.  Output: one JSON line per
(n, method) with wall seconds — the data BRUTE_THRESHOLD is set from.

Usage: python tools/knn_probe.py [n ...] (defaults: 100k 200k 400k 800k 2M)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

N_DEFAULT = [5_000, 10_000, 20_000, 50_000]


def materialize(df):
    # full-column hash-sum: count() alone lets Catalyst prune the work
    from pyspark.sql import functions as F

    # cast to double: ANSI mode throws on long-sum overflow
    return df.select(
        F.sum(F.xxhash64(*[F.col(c) for c in df.columns]).cast("double")).alias("h")
    ).collect()[0]["h"]


def main() -> None:
    import __spark_entry__ as entry
    from libosmtools_spark.knn.ring import knn_brute, knn_ring
    from libosmtools_spark.session import get_spark, release_local_checkpoint

    ns = [int(float(a)) for a in sys.argv[1:]] or N_DEFAULT
    spark = get_spark(app="knn-probe", cpus=32, shuffle_partitions=32)
    sf_dir = "/tmp/bench_x10v2_sf0.1_f10"
    pts_all = entry._points(spark, sf_dir)
    total = pts_all.count()
    print(f"corpus: {total} points", file=sys.stderr)

    for n in ns:
        frac = min(1.0, n / total)
        pts = pts_all.sample(frac, seed=7) if frac < 1.0 else pts_all
        pts = pts.repartition(64).cache()
        n_real = pts.count()
        for method in ("brute", "ring"):
            if method == "brute" and n_real > 2_200_000:
                continue
            t0 = time.time()
            out = (
                knn_brute(pts, "doc_id")
                if method == "brute"
                else knn_ring(pts, "doc_id", level=6)
            )
            h = materialize(out)
            wall = time.time() - t0
            if method == "ring":
                release_local_checkpoint(out)
            print(json.dumps({"n": n_real, "method": method, "sec": round(wall, 2), "h": h}))
            sys.stdout.flush()
        pts.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
