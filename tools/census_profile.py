"""Stage-level profile of the heavy census queries at the x10 tier
(guide §1.4 noop-sink isolation): times each pipeline prefix so the
optimization targets the real hotspot, not a guess.

Usage: python tools/census_profile.py [x10_dir] [what]
  what ∈ {minhash, jaccard, annlsh, simhash, all}
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from libosmtools_spark.session import get_spark

    x10 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_x10v2_sf0.1_f10"
    what = sys.argv[2] if len(sys.argv) > 2 else "all"
    spark = get_spark(app="census-profile", cpus=32)

    import __spark_entry__ as entry

    docs = entry._docs(spark, x10)
    emb = entry._emb(spark, x10)

    def timed(name, fn, passes=2):
        best = None
        for _ in range(passes):
            t = time.monotonic()
            fn()
            dt = time.monotonic() - t
            best = dt if best is None or dt < best else best
        print(f"[c] {name}: best {best:.2f}s", flush=True)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    if what in ("minhash", "all"):
        from libosmtools_spark.dedup.dedup import minhash_signature_udf
        from libosmtools_spark.text.analysis import shingle_pos_rows

        timed("mh.shingle_rows", lambda: noop(shingle_pos_rows(docs, 3)))
        hashed_df = (
            shingle_pos_rows(docs, 3)
            .withColumn("h", F.xxhash64("shingle"))
            .groupBy("doc_id")
            .agg(F.collect_list("h").alias("sh"))
        )
        timed("mh.hashed_arrays", lambda: noop(hashed_df))
        sig = minhash_signature_udf(64)
        timed("mh.signatures", lambda: noop(hashed_df.withColumn("sig", sig(F.col("sh"))).select("doc_id", "sig")))
        from libosmtools_spark.dedup.dedup import minhash_lsh_pairs

        timed("mh.full", lambda: minhash_lsh_pairs(docs, threshold=0.5, num_perm=64, bands=32).count())

    if what in ("jaccard", "all"):
        from libosmtools_spark.dedup.dedup import ngram_jaccard_pairs, shingle_rows

        timed("jc.shingle_distinct", lambda: noop(shingle_rows(docs)))
        timed("jc.full", lambda: ngram_jaccard_pairs(docs, threshold=0.2).count())

    if what in ("annlsh", "all"):
        from libosmtools_spark.sim.ann import (
            auto_lsh_params,
            hyperplane_buckets_udf,
            lsh_topk,
        )

        n = emb.count()
        p, t = auto_lsh_params(n)
        print(f"[c] annlsh n={n} planes={p} tables={t}", flush=True)
        bucket = hyperplane_buckets_udf(p, t)
        b = emb.select(F.col("vec_id"), F.explode(bucket(F.col("embedding"))).alias("bucket"))
        timed("al.buckets", lambda: noop(b))
        x = b.select(F.col("vec_id").alias("qid"), "bucket")
        y = b.select(F.col("vec_id").alias("nid"), "bucket")
        cand = (
            x.join(y, "bucket").filter(F.col("qid") != F.col("nid")).select("qid", "nid").dropDuplicates(["qid", "nid"])
        )
        timed("al.cand", lambda: noop(cand))
        timed("al.full", lambda: lsh_topk(emb, k=5).count())

    if what in ("simhash", "all"):
        from libosmtools_spark.dedup.dedup import simhash_fingerprints, simhash_pairs

        fps = simhash_fingerprints(docs)
        timed("sh.fingerprints", lambda: noop(fps))
        timed("sh.full", lambda: simhash_pairs(fps, max_hamming=3, n_bands=4).count())

    spark.stop()


if __name__ == "__main__":
    main()
