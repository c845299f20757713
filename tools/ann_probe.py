"""Measure the brute↔blocked exact-cosine crossover on the bench corpus.

Times cosine_topk_brute vs cosine_topk_blocked at several corpus sizes
sampled from the x10 embeddings replica (same distribution as the census),
warm JVM, min-of-2 — the data sim.ann.BRUTE_MAX_ROWS is set from.  Also
cross-checks that both physical paths emit the identical row set at the
largest size (the blocked path once silently dropped ~7/8 of all queries
on exactly this corpus — the mixed-type cogroup key bug).

Usage: python tools/ann_probe.py [x10_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

FRACS = (0.1, 0.25, 0.5, 1.0)


def main() -> None:
    import libosmtools_spark.sim.ann as A
    from libosmtools_spark.session import get_spark
    from pyspark.sql import functions as F

    x10_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_x10v2_sf0.1_f10"
    spark = get_spark(app="ann-probe", cpus=32, shuffle_partitions=32)

    def mat(df):
        # cast to double: ANSI mode throws on long-sum overflow
        return df.select(
            F.sum(F.xxhash64(*[F.col(c) for c in df.columns]).cast("double")).alias("h")
        ).collect()[0]["h"]

    x10 = spark.read.parquet(f"{x10_dir}/embeddings.parquet")
    largest = None
    for frac in FRACS:
        emb = (x10.sample(frac, seed=7) if frac < 1 else x10).repartition(16).cache()
        n = emb.count()
        res = {}
        for m, fn in (
            ("brute", lambda: A.cosine_topk_brute(emb, max_rows=10**9, _count_checked=True)),
            ("blocked", lambda: A.cosine_topk_blocked(emb)),
        ):
            best = 1e9
            for _ in range(2):
                t0 = time.time()
                mat(fn())
                best = min(best, time.time() - t0)
            res[m] = round(best, 2)
        print(json.dumps({"n": n, **res}))
        sys.stdout.flush()
        if frac == FRACS[-1]:
            largest = emb
        else:
            emb.unpersist()

    # exact path-agreement at the largest size (order-independent: anti-joins)
    b = A.cosine_topk_brute(largest, max_rows=10**9, _count_checked=True).cache()
    bl = A.cosine_topk_blocked(largest).cache()
    key = ["vec_id", "neighbor_id", "rank"]
    rec = {
        "brute_rows": b.count(),
        "blocked_rows": bl.count(),
        "only_brute": b.join(bl, key, "left_anti").count(),
        "only_blocked": bl.join(b, key, "left_anti").count(),
    }
    print(json.dumps(rec))
    assert rec["only_brute"] == 0 and rec["only_blocked"] == 0, "paths diverged"
    spark.stop()


if __name__ == "__main__":
    main()
