"""bench.py's final stdout line must stay inside the driver's tail capture
(BENCH_r04.json lost the whole round's headline to a fat line — parsed:
null).  These tests pin the contract: compact, parseable, last."""

import json

import bench


def representative_result(n_queries=None, pairs=6):
    """A full result dict at least as large as a real round's: the actual
    bench census (flagship + BENCH_PICKS) plus headroom entries."""
    names = ["flagship"] + list(bench.BENCH_PICKS) + [
        "future_query_slot_a", "future_query_slot_b", "future_query_slot_c",
    ]
    if n_queries is not None:
        names = [f"some_quite_long_query_name_{i:02d}" for i in range(n_queries)]
    return {
        "metric": "spatial_join_tile_assign_pages_per_sec",
        "value": 123456.7,
        "unit": "pages_per_sec",
        "queries": {n: 12.345 for n in names},
        "queries_cpu_sec": {n: 123.456 for n in names},
        "noise_floor": {
            "unit": "Miter_per_sec_1thread",
            "flagship_passes": [27.87] * 8,
            "query_passes": [24.6] * 8,
        },
        "sf": "0.1",
        "n_pages": 200000,
        "cpus": 32,
        "skew": {"work_ratio": 13.37, "before_sec": 24.9, "after_sec": 7.5},
        "x10": {
            "factor": 10,
            "queries": {n: 123.456 for n in names},
            "queries_cpu_sec": {n: 1234.567 for n in names},
            "flagship_sec": 123.456,
            "flagship_n_pages": 2000000,
            "scale_ratio": {n: 12.34 for n in names},
        },
        "x10_pages_per_sec": 123456.7,
        "x10_agg_sec": 1234.5,
        "scaling": {"4": {"sec": 128.9}, "16": {"sec": 58.6}},
        "scaling_inflate": 128,
        "scaling_n_pages": 25600000,
        "scaling_runs_per_config": pairs,
        "scaling_calibration_miter_s": {"4": [91.3] * pairs, "16": [219.3] * pairs},
        "scaling_membw_gbs": {"4": [65.4] * pairs, "16": [90.3] * pairs},
        "scaling_efficiency": 0.812,
        "scaling_efficiency_median": 0.858,
        "scaling_efficiency_pairwise": [0.812, 0.858, 0.899, 0.905, 0.91, 0.99][:pairs],
        "scaling_efficiency_min_walls": 0.549,
        "scaling_pair_ceiling_ratio": [0.838] * pairs,
        "scaling_pair_bw_floor": [0.345] * pairs,
        "scaling_pair_cpu_inflation": [1.18] * pairs,
        "scaling_pair_vs_ceiling": [0.97] * pairs,
        "scaling_hw_ceiling_same_window": 0.838,
        "scaling_efficiency_vs_ceiling": 0.97,
        "scaling_cpu_inflation": 1.18,
    }


class TestHeadlineLine:
    def test_fits_driver_capture(self):
        line = bench.headline_line(representative_result())
        assert len(line) <= bench.HEADLINE_MAX_CHARS, len(line)

    def test_parseable_with_required_fields(self):
        got = json.loads(bench.headline_line(representative_result()))
        for key in ("metric", "value", "unit", "queries", "sf",
                    "x10_pages_per_sec", "x10_agg_sec",
                    "scaling_efficiency", "scaling_efficiency_median",
                    "scaling_cpu_inflation", "scaling_pair_bw_floor",
                    "skew_work_ratio"):
            assert key in got, key
        assert got["value"] == 123456.7
        assert len(got["queries"]) == len(bench.BENCH_PICKS) + 4

    def test_scaling_absent_still_valid(self):
        """SPARK_GRAFT_SCALING=0 runs emit a headline without scaling keys."""
        r = representative_result()
        for k in list(r):
            if k.startswith("scaling"):
                del r[k]
        got = json.loads(bench.headline_line(r))
        assert "scaling_efficiency" not in got
        assert got["queries"]

    def test_pathological_overflow_degrades(self):
        """Even an absurd query census cannot overflow the cap — the
        queries map is dropped, flagged, and the line stays parseable."""
        r = representative_result(n_queries=200)
        line = bench.headline_line(r)
        assert len(line) <= bench.HEADLINE_MAX_CHARS
        got = json.loads(line)
        assert got.get("queries_dropped_for_length") is True
        assert got["scaling_efficiency"] == 0.812


class TestX10Tier:
    """ensure_x10 contract: exactly factor× rows, disjoint per-replica id
    ranges, and NO new cross-replica exact-dup or identical-embedding
    pairs (which would quadratically distort candidate generation)."""

    def test_shape_ids_and_content(self, spark, tmp_path):
        import pyspark.sql.functions as F

        sf_dir = "/root/testdata/sf0.001"
        out = bench.ensure_x10(spark, sf_dir, factor=3)
        # factor is part of the cache key — a different factor must not
        # collide with the default-10 replica other runs build
        assert out.endswith("_f3")
        for t, key in (("documents", "doc_id"), ("embeddings", "vec_id"),
                       ("events", "event_id")):
            base = spark.read.parquet(f"{sf_dir}/{t}.parquet")
            rep = spark.read.parquet(f"{out}/{t}.parquet")
            assert rep.count() == 3 * base.count(), t
            assert rep.columns == base.columns, t
            # ids unique across replicas (disjoint stride ranges)
            assert rep.select(key).distinct().count() == rep.count(), t
        docs = spark.read.parquet(f"{out}/documents.parquet")
        emb = spark.read.parquet(f"{out}/embeddings.parquet")
        base_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        # exact-dup structure scales linearly: distinct texts ×3
        n_txt = base_docs.select("text").distinct().count()
        assert docs.select("text").distinct().count() == 3 * n_txt
        # n_chars stays consistent with the perturbed text
        assert docs.filter(F.length("text") != F.col("n_chars")).count() == 0
        # embeddings: replica vectors differ from their replica-0 twin
        base_vec = (
            emb.filter(F.col("vec_id") < bench.X10_STRIDE)
            .select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_vec"))
        )
        twins = emb.filter(F.col("vec_id") >= bench.X10_STRIDE).join(
            base_vec,
            F.pmod(F.col("vec_id"), F.lit(bench.X10_STRIDE)) == F.col("b_id"),
        )
        assert twins.filter(F.col("embedding") == F.col("b_vec")).count() == 0
