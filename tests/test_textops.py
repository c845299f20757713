"""Text analysis / dedup / similarity / multimodal / streaming / checkpoint
operators over the driver testdata and fixtures."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

TESTDATA = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{TESTDATA}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{TESTDATA}/embeddings.parquet").cache()


class TestTextAnalysis:
    def test_analyze_shapes(self, docs):
        from libosmtools_spark.text.analysis import analyze_documents

        out = analyze_documents(docs).toPandas()
        assert len(out) == docs.count()
        assert (out["n_tokens"] >= 1).all()
        assert out["alpha_ratio"].between(0, 1).all()
        assert out["fp_md5"].str.len().eq(32).all()
        assert out["pred_lang"].isin(["en", "de", "es", "fr", "pt"]).all()

    def test_md5_matches_duckdb(self, docs):
        import duckdb

        from libosmtools_spark.text.analysis import analyze_documents

        got = analyze_documents(docs).select("doc_id", "fp_md5").toPandas()
        want = duckdb.sql(
            f"select doc_id, md5(text) as fp_md5 from read_parquet('{TESTDATA}/documents.parquet')"
        ).df()
        m = got.merge(want, on="doc_id", suffixes=("_s", "_d"))
        assert (m["fp_md5_s"] == m["fp_md5_d"]).all()

    def test_html_text_col_extraction(self, spark):
        """Tag-strip + ordered entity decode: arbitrary adversarial texts
        round-trip byte-identically through escape -> wrap -> extract,
        including double-escaped entities and lone angle brackets."""
        from libosmtools_spark.text.analysis import html_text_col

        texts = [
            "plain words only",
            "math: 1 < 2 & 3 > 2",
            "literal entity &lt; stays one level",
            "quotes ' and \" survive",
            "unicode café — ok",
            "",
        ]

        def esc(t):
            return t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

        rows = [
            (i, t, f"<html><body><p>{esc(t)}</p></body></html>".encode())
            for i, t in enumerate(texts)
        ]
        df = spark.createDataFrame(rows, "i long, text string, html binary")
        out = df.select("text", html_text_col(F.col("html")).alias("x")).toPandas()
        assert (out["text"] == out["x"]).all(), out
        # decode is one level only: "&amp;lt;" -> "&lt;", never "<"
        one = spark.createDataFrame(
            [(b"<p>&amp;lt;</p>",)], "html binary"
        ).select(html_text_col(F.col("html")).alias("x")).collect()[0]["x"]
        assert one == "&lt;", one

    def test_html_extract_query_all_match(self, spark):
        """Registry query contract: matches=true on every documents row."""
        import __spark_entry__ as entry

        out = entry.queries()["html_extract"](spark, TESTDATA).toPandas()
        assert out["matches"].all() and len(out) == 500

    def test_token_count_matches_duckdb(self, docs):
        import duckdb

        from libosmtools_spark.text.analysis import token_count_col

        got = docs.select("doc_id", token_count_col(F.col("text")).alias("n")).toPandas()
        want = duckdb.sql(
            f"select doc_id, len(string_split_regex(trim(text), '\\s+')) as n "
            f"from read_parquet('{TESTDATA}/documents.parquet')"
        ).df()
        m = got.merge(want, on="doc_id", suffixes=("_s", "_d"))
        assert (m["n_s"] == m["n_d"]).all()


class TestDedup:
    def test_exact_dedup_groups(self, docs, spark):
        from libosmtools_spark.dedup.dedup import exact_dedup

        out = exact_dedup(docs).toPandas()
        assert len(out) == docs.count()
        assert (out["canonical_id"] <= out["doc_id"]).all()
        # brute check on pandas
        pdf = docs.select("doc_id", "text").toPandas()
        want = pdf.groupby("text")["doc_id"].transform("min")
        m = out.set_index("doc_id").loc[pdf["doc_id"], "canonical_id"].to_numpy()
        assert (m == want.to_numpy()).all()

    def test_exact_dedup_verify_agrees(self, docs, spark):
        """verify=True (text re-check inside multi-member hash groups)
        returns the identical result absent collisions — and the fixture
        has real duplicate groups, so the verified path is exercised."""
        from libosmtools_spark.dedup.dedup import exact_dedup

        dup = spark.createDataFrame(
            [(1000001, "a duplicate body"), (1000002, "a duplicate body"),
             (1000003, "a duplicate body"), (1000004, "unique body")],
            "doc_id long, text string",
        )
        both = docs.select("doc_id", "text").unionByName(dup)
        fast = exact_dedup(both).toPandas().sort_values("doc_id").reset_index(drop=True)
        ver = exact_dedup(both, verify=True).toPandas().sort_values("doc_id").reset_index(drop=True)
        assert (fast["group_size"] > 1).any()  # duplicate groups exist
        assert fast.equals(ver)
        g = ver[ver["doc_id"].isin([1000001, 1000002, 1000003])]
        assert set(g["canonical_id"]) == {1000001} and set(g["group_size"]) == {3}

    def test_jaccard_pairs_vs_brute(self, docs, spark):
        from libosmtools_spark.dedup.dedup import ngram_jaccard_pairs

        small = docs.limit(80).cache()
        got = ngram_jaccard_pairs(small, threshold=0.2).toPandas()
        # brute force in pandas
        pdf = small.select("doc_id", "text").toPandas()
        sh = {
            r.doc_id: set(
                " ".join(toks[i : i + 3])
                for toks in [r.text.strip().split()]
                for i in range(max(len(toks) - 2, 0))
            )
            for r in pdf.itertuples()
        }
        want = set()
        ids = sorted(sh)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                u = len(sh[a] | sh[b])
                if u and len(sh[a] & sh[b]) / u >= 0.2:
                    want.add((a, b))
        assert set(zip(got["a"], got["b"])) == want

    def test_shingle_pos_rows_equals_hof_form(self, docs, spark):
        """The lead-window row form is exactly posexplode(shingles_col):
        same (doc_id, pos, shingle) set on the corpus AND on adversarial
        short/empty documents (which contribute no rows)."""
        from libosmtools_spark.text.analysis import shingle_pos_rows, shingles_col

        edge = spark.createDataFrame(
            [(9000001, ""), (9000002, "one"), (9000003, "just two"),
             (9000004, "exactly three tokens"), (9000005, "  padded   spacing  here  ")],
            "doc_id long, text string",
        )
        both = docs.select("doc_id", "text").unionByName(edge)
        a = shingle_pos_rows(both, 3)
        b = both.select(
            F.col("doc_id"),
            F.posexplode(shingles_col(F.col("text"), 3)).alias("pos", "shingle"),
        )
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
        assert a.filter(F.col("doc_id").isin(9000001, 9000002, 9000003)).count() == 0
        assert a.filter(F.col("doc_id") == 9000004).count() == 1

    def test_minhash_short_docs_no_pairs_no_crash(self, spark):
        """Documents with fewer than k tokens drop out of the signature
        stage (no all-sentinel hot bucket) and never form pairs; real
        duplicates in the same corpus are still found."""
        from libosmtools_spark.dedup.dedup import minhash_lsh_pairs

        body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        rows = [(1, body), (2, body), (3, ""), (4, "x"), (5, "two words"),
                (6, "a wholly different sentence about another topic entirely ok")]
        d = spark.createDataFrame(rows, "doc_id long, text string")
        out = minhash_lsh_pairs(d, threshold=0.5).toPandas()
        assert set(zip(out["a"], out["b"])) == {(1, 2)}

    def test_minhash_lsh_recall(self, spark):
        from libosmtools_spark.dedup.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

        # corpus with planted near-duplicates
        base = "the quick brown fox jumps over the lazy dog again and again today"
        rows = []
        for i in range(40):
            rows.append((i, base if i % 4 == 0 else f"{base} variant {i} " + "x " * i))
        docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
        exact = ngram_jaccard_pairs(docs, threshold=0.8).toPandas()
        lsh = minhash_lsh_pairs(docs, threshold=0.8, num_perm=64, bands=32).toPandas()
        want = set(zip(exact["a"], exact["b"]))
        got = set(zip(lsh["a"], lsh["b"]))
        assert want, "planted duplicates must exist"
        # high-band LSH at j>=0.8 should reach full recall on identical docs
        assert got == want
        # the RELATIONAL verification paths (gather disabled so the branch
        # actually runs): both the corpus-wide explode and the count-gated
        # candidate-filtered variant must produce the exact same pairs
        for min_docs in (0, 20_000):
            gated = minhash_lsh_pairs(
                docs, threshold=0.8, num_perm=64, bands=32,
                candidate_filter_min_docs=min_docs, verify_gather_max_docs=0,
            ).toPandas()
            assert set(zip(gated["a"], gated["b"])) == want
            assert sorted(map(tuple, gated[["a", "b", "jaccard"]].itertuples(index=False))) \
                == sorted(map(tuple, lsh[["a", "b", "jaccard"]].itertuples(index=False)))

    def test_simhash_near_for_near_texts(self, spark):
        from libosmtools_spark.dedup.dedup import simhash_fingerprints

        rows = [
            (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "totally different words entirely unrelated content here now"),
        ]
        docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
        out = simhash_fingerprints(docs).toPandas().set_index("doc_id")["simhash"]
        assert out[0] == out[1]
        ham = bin(np.uint64(out[0]) ^ np.uint64(out[2])).count("1")
        assert ham > 10


class TestANN:
    def test_brute_topk_matches_numpy(self, embeddings):
        from libosmtools_spark.sim.ann import cosine_topk_brute

        got = cosine_topk_brute(embeddings, k=5).toPandas()
        pdf = embeddings.toPandas()
        M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        ids = pdf["vec_id"].to_numpy()
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        S = Mn @ Mn.T
        for q in ids[:20]:
            qi = np.where(ids == q)[0][0]
            s = S[qi].copy()
            s[qi] = -np.inf
            order = np.lexsort((ids, -s))[:5]
            want = ids[order].tolist()
            g = got[got.vec_id == q].sort_values("rank")["neighbor_id"].tolist()
            assert g == want, q

    def test_lsh_recall_reasonable(self, embeddings):
        from libosmtools_spark.sim.ann import cosine_topk_brute, lsh_topk

        brute = cosine_topk_brute(embeddings, k=5).toPandas()
        approx = lsh_topk(embeddings, k=5, n_planes=4, n_tables=16).toPandas()
        b = set(zip(brute["vec_id"], brute["neighbor_id"]))
        a = set(zip(approx["vec_id"], approx["neighbor_id"]))
        recall = len(a & b) / len(b)
        assert recall > 0.6, recall  # 16 tables x 16 buckets over 500 vecs

    def test_lsh_near_dup_recall(self, spark):
        """The production operating point (10 planes x 12 tables): recall
        >= 0.95 for genuinely NEAR neighbors (planted near-duplicates at
        cosine ~0.95+), the retrieval regime sign-LSH exists for."""
        from libosmtools_spark.sim.ann import lsh_topk

        rng = np.random.default_rng(123)
        base = rng.normal(size=(1000, 64))
        dups = base[:400] + rng.normal(size=(400, 64)) * 0.15
        rows = [(int(i), v.tolist()) for i, v in enumerate(np.vstack([base, dups]))]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = lsh_topk(emb, k=5, n_planes=10, n_tables=12).toPandas()
        pairs = set(zip(got["vec_id"], got["neighbor_id"]))
        found = sum((i, 1000 + i) in pairs for i in range(400))
        assert found / 400 >= 0.95, found / 400

    def test_auto_lsh_params(self):
        """Geometry formula: exactly the oracle constants (10, 12) at every
        fixture scale, then log2 plane growth with recall-preserving table
        growth, tables capped."""
        from libosmtools_spark.sim.ann import LSH_MAX_TABLES, auto_lsh_params

        for n in (0, 1, 500, 2000, 4096):
            assert auto_lsh_params(n) == (10, 12), n
        p13, t13 = auto_lsh_params(20_000)
        assert p13 == 13 and 18 <= t13 <= 20, (p13, t13)
        prev = (10, 12)
        for n in (4097, 10_000, 100_000, 10**6, 10**9):
            p, t = auto_lsh_params(n)
            assert p >= prev[0] and t >= prev[1], (n, p, t)
            assert t <= LSH_MAX_TABLES
            prev = (p, t)

    def test_auto_lsh_near_dup_recall_past_fixture_scale(self, spark):
        """The AUTO geometry (planes grown past the 10-plane base, tables
        grown to compensate) holds near-duplicate recall >= 0.95 on a
        corpus large enough to actually trigger the growth."""
        from libosmtools_spark.sim.ann import auto_lsh_params, lsh_topk

        rng = np.random.default_rng(321)
        n_base, n_dup = 4000, 800
        base = rng.normal(size=(n_base, 32))
        dups = base[:n_dup] + rng.normal(size=(n_dup, 32)) * 0.15
        assert auto_lsh_params(n_base + n_dup)[0] > 10  # growth triggered
        rows = [(int(i), v.tolist()) for i, v in enumerate(np.vstack([base, dups]))]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = lsh_topk(emb, k=5).toPandas()  # default = auto geometry
        pairs = set(zip(got["vec_id"], got["neighbor_id"]))
        found = sum((i, n_base + i) in pairs for i in range(n_dup))
        assert found / n_dup >= 0.95, found / n_dup

    def test_ivf_near_dup_recall(self, spark):
        """IVF lists: a near-duplicate pair has nearly identical vectors,
        hence the same nearest centroid, hence the same list — recall ~1
        for the dedup regime."""
        from libosmtools_spark.sim.ann import ivf_topk

        rng = np.random.default_rng(21)
        base = rng.normal(size=(600, 64))
        dups = base[:200] + rng.normal(size=(200, 64)) * 0.12
        rows = [(int(i), v.tolist()) for i, v in enumerate(np.vstack([base, dups]))]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = ivf_topk(emb, k=5, n_lists=16, n_probe=4).toPandas()
        pairs = set(zip(got["vec_id"], got["neighbor_id"]))
        found = sum((i, 600 + i) in pairs or (600 + i, i) in pairs for i in range(200))
        assert found / 200 >= 0.95, found / 200

    def test_ivf_corpus_partition(self, embeddings):
        """Every corpus vector lives in exactly one list; candidates per
        query are bounded by the probed lists' population."""
        from libosmtools_spark.sim.ann import ivf_assign_udf, ivf_seed_centroids

        cents = ivf_seed_centroids(embeddings, 8)
        assign = ivf_assign_udf(cents, 3)
        out = embeddings.select("vec_id", assign(F.col("embedding")).alias("p")).toPandas()
        assert (out["p"].str.len() == 3).all()          # n_probe entries each
        assert out["p"].apply(lambda p: len(set(p)) == 3).all()  # distinct lists
        assert out["p"].apply(lambda p: all(0 <= x < 8 for x in p)).all()

    def test_ivf_trained_quantizer_beats_seed(self, spark):
        """On a clustered corpus (the real-world embedding shape) the
        trained spherical-k-means quantizer must reach top-k recall >= the
        seed (first-n-by-id) quantizer at equal n_probe — and be
        deterministic across runs."""
        from libosmtools_spark.sim.ann import (
            cosine_topk_brute,
            ivf_seed_centroids,
            ivf_topk,
            ivf_train_centroids,
        )

        rng = np.random.default_rng(5)
        centers = rng.normal(size=(25, 32)) * 3.0
        # ids ordered cluster-by-cluster: the seed quantizer's first-25
        # vectors all come from the first clusters — the adversarial (and
        # realistic: ingest order correlates with source) case
        X = np.concatenate(
            [c + rng.normal(size=(40, 32)) for c in centers], axis=0
        )
        rows = [(int(i), v.tolist()) for i, v in enumerate(X)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
        exact = cosine_topk_brute(emb, k=5).toPandas()
        want = set(zip(exact["vec_id"], exact["neighbor_id"]))

        def recall(cents):
            got = ivf_topk(emb, k=5, n_lists=25, n_probe=2, centroids=cents).toPandas()
            have = set(zip(got["vec_id"], got["neighbor_id"]))
            return len(have & want) / len(want)

        trained = ivf_train_centroids(emb, n_lists=25)
        trained2 = ivf_train_centroids(emb, n_lists=25)
        np.testing.assert_array_equal(trained, trained2)  # deterministic
        r_seed = recall(ivf_seed_centroids(emb, 25))
        r_trained = recall(trained)
        emb.unpersist()
        assert r_trained >= r_seed, (r_trained, r_seed)
        assert r_trained >= 0.9, r_trained  # probes cover the true cluster

    def test_ivf_training_collect_hard_bounded(self, spark):
        """The trainer's driver collect is unconditionally bounded: even
        when the hash sample over-delivers (expected-size only), at most
        2*sample_rows vectors reach the driver — and the sorted limit keeps
        training deterministic."""
        from libosmtools_spark.sim.ann import ivf_train_centroids

        rng = np.random.default_rng(9)
        X = rng.normal(size=(300, 8))
        rows = [(int(i), v.tolist()) for i, v in enumerate(X)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        import libosmtools_spark.sim.ann as ann_mod

        seen = {}
        orig = ann_mod.np.stack

        def spy(arrs, *a, **kw):
            out = orig(arrs, *a, **kw)
            seen.setdefault("n", len(out))
            return out

        ann_mod.np.stack = spy
        try:
            # sample_rows=20 over 300 rows: hash keeps ~1/15 in expectation
            # but the limit(2*20) bound must hold regardless
            c1 = ivf_train_centroids(emb, n_lists=4, sample_rows=20)
            seen.clear()
            c2 = ivf_train_centroids(emb, n_lists=4, sample_rows=20)
        finally:
            ann_mod.np.stack = orig
        assert seen["n"] <= 40, seen
        np.testing.assert_array_equal(c1, c2)

    def test_ivf_trained_sampling_deterministic(self, spark):
        """The hash-sampled training path (corpus > sample_rows) is
        deterministic and produces valid unit-norm centroids."""
        from libosmtools_spark.sim.ann import ivf_train_centroids

        rng = np.random.default_rng(9)
        X = rng.normal(size=(800, 16))
        rows = [(int(i), v.tolist()) for i, v in enumerate(X)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        c1 = ivf_train_centroids(emb, n_lists=8, sample_rows=200)
        c2 = ivf_train_centroids(emb, n_lists=8, sample_rows=200)
        np.testing.assert_array_equal(c1, c2)
        assert c1.shape == (8, 16)
        np.testing.assert_allclose(np.linalg.norm(c1, axis=1), 1.0, rtol=1e-9)

    def test_cosine_dup_pairs_paths_agree(self, embeddings):
        """Exact near-dup pairs: brute and block-nested-loop physical paths
        emit the identical pair set."""
        from libosmtools_spark.sim.ann import cosine_dup_pairs

        brute = cosine_dup_pairs(embeddings, threshold=0.4).toPandas()
        blocked = cosine_dup_pairs(
            embeddings, threshold=0.4, brute_max_rows=0,
            n_query_blocks=3, n_corpus_blocks=3,
        ).toPandas()
        assert set(zip(brute["a"], brute["b"])) == set(zip(blocked["a"], blocked["b"]))
        assert len(brute) == len(brute.drop_duplicates())  # each pair exactly once

    def test_blocked_topk_complete_on_wide_ids_multi_partition(self, spark):
        """Regression: the blocked cogroup's per-position key types must be
        identical on both sides.  With (long,int) vs (int,long) keys the
        groups compare equal inside a partition (UnsafeRow 8-byte slots) but
        murmur3 ROUTES int and long differently, so group alignment became
        partition-layout-dependent — exact at small scale while silently
        dropping ~7/8 of the (qb,cb) pairs on the 8-file 20k-row bench
        replica (whole queries vanished from the output).  This pins the
        visible contract on a replica-shaped corpus: every query present,
        exactly k rows each, equal to the brute answer."""
        from libosmtools_spark.sim.ann import cosine_topk_blocked, cosine_topk_brute

        rng = np.random.default_rng(11)
        X = rng.normal(size=(1600, 16))
        # x10-replica id shape: replica stride 2^32, 8 input partitions
        rows = [
            (int((i % 8) * (1 << 32) + i // 8), v.tolist()) for i, v in enumerate(X)
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(8)
        blocked = cosine_topk_blocked(emb, k=3).toPandas()
        brute = cosine_topk_brute(emb, k=3, _count_checked=True).toPandas()
        assert len(blocked) == 1600 * 3
        assert blocked["vec_id"].nunique() == 1600
        key = ["vec_id", "neighbor_id", "rank"]
        assert set(map(tuple, blocked[key].to_numpy())) == set(map(tuple, brute[key].to_numpy()))

    def test_cosine_dup_lsh_recall(self, spark):
        """LSH near-dup path: recall >= 0.95 on planted duplicates."""
        from libosmtools_spark.sim.ann import cosine_dup_pairs_lsh

        rng = np.random.default_rng(7)
        base = rng.normal(size=(800, 64))
        dups = base[:300] + rng.normal(size=(300, 64)) * 0.12
        rows = [(int(i), v.tolist()) for i, v in enumerate(np.vstack([base, dups]))]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = cosine_dup_pairs_lsh(emb, threshold=0.9).toPandas()
        pairs = set(zip(got["a"], got["b"]))
        found = sum((i, 800 + i) in pairs for i in range(300))
        assert found / 300 >= 0.95, found / 300

    def test_ann_lsh_topk_dispatch(self, embeddings):
        """Count-gated dispatch: a broadcast-scale corpus routes to the
        exact brute path (recall 1 by construction)."""
        from libosmtools_spark.sim.ann import ann_lsh_topk, cosine_topk_brute

        got = ann_lsh_topk(embeddings, k=3).toPandas().sort_values(["vec_id", "rank"])
        want = cosine_topk_brute(embeddings, k=3).toPandas().sort_values(["vec_id", "rank"])
        assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


class TestMultimodal:
    def test_feature_plumbing(self, spark, sf_smoke):
        from libosmtools_spark.mm.multimodal import extract_features, pages_html_media

        pages = spark.read.parquet(os.path.join(sf_smoke, "pages.parquet")).limit(100)
        media = pages_html_media(pages)
        out = extract_features(media).toPandas()
        assert len(out) == 100
        assert out["ok"].all()
        assert out["feat"].map(len).eq(8).all()
        assert out["sha256"].str.len().eq(64).all()
        # determinism
        out2 = extract_features(media).toPandas()
        m = out.sort_values("media_id").reset_index(drop=True)
        m2 = out2.sort_values("media_id").reset_index(drop=True)
        assert (m["sha256"] == m2["sha256"]).all()

    def test_real_decoder_raises(self):
        from libosmtools_spark import mm
        from libosmtools_spark.mm.multimodal import DecodeUnavailable, real_decode

        if mm.multimodal._pil() is None:  # this container: no Pillow
            with pytest.raises(DecodeUnavailable):
                real_decode(b"xx", "image/png")
        else:  # a cluster image with codecs: the real path decodes
            import io

            from PIL import Image

            buf = io.BytesIO()
            Image.new("L", (4, 4), color=128).save(buf, format="PNG")
            assert real_decode(buf.getvalue(), "image/png").shape == (4, 4)

    def test_real_decoder_with_fake_pil(self, monkeypatch):
        """The Pillow-present branch, driven by a monkeypatched decoder —
        exercises real_decode_features' histogram contract without codecs
        in the container."""
        import numpy as np

        from libosmtools_spark.mm import multimodal as M

        class _FakeImg:
            def convert(self, mode):
                return self

            def __array__(self, dtype=None):
                return np.zeros((4, 4), dtype=dtype or np.uint8)

        class _FakeImage:
            @staticmethod
            def open(fp):
                return _FakeImg()

        monkeypatch.setattr(M, "_pil", lambda: _FakeImage)
        feat = M.real_decode_features(b"xxxx", "image/png")
        assert feat.shape == (8,) and feat.dtype == np.float32
        assert feat[0] == 1.0 and feat[1:].sum() == 0.0  # all-zero plane -> bin 0

        # non-image mime still refuses even with the decoder present
        with pytest.raises(M.DecodeUnavailable):
            M.real_decode(b"xx", "audio/wav")

    @staticmethod
    def _encode_ppm(rgb: "np.ndarray") -> bytes:
        h, w, _ = rgb.shape
        return b"P6\n# test comment\n%d %d\n255\n" % (w, h) + rgb.astype(np.uint8).tobytes()

    @staticmethod
    def _encode_pgm(gray: "np.ndarray") -> bytes:
        h, w = gray.shape
        return b"P5 %d %d 255\n" % (w, h) + gray.astype(np.uint8).tobytes()

    @staticmethod
    def _encode_bmp24(rgb: "np.ndarray") -> bytes:
        """Minimal uncompressed 24-bit BI_RGB bottom-up BMP writer (test
        fixture generator — independent of the decoder under test)."""
        h, w, _ = rgb.shape
        stride = ((w * 3 + 3) // 4) * 4
        img = bytearray()
        for y in range(h - 1, -1, -1):  # bottom-up
            row = rgb[y, :, ::-1].astype(np.uint8).tobytes()  # BGR
            img += row + b"\x00" * (stride - len(row))
        data_off = 14 + 40
        file_size = data_off + len(img)
        hdr = b"BM" + file_size.to_bytes(4, "little") + b"\x00\x00\x00\x00"
        hdr += data_off.to_bytes(4, "little")
        info = (40).to_bytes(4, "little") + w.to_bytes(4, "little", signed=True)
        info += h.to_bytes(4, "little", signed=True) + (1).to_bytes(2, "little")
        info += (24).to_bytes(2, "little") + (0).to_bytes(4, "little")
        info += len(img).to_bytes(4, "little") + b"\x00" * 16
        return bytes(hdr + info + img)

    def test_numpy_codecs_decode_real_formats(self):
        """The in-sandbox real path: netpbm P5/P6 and 24-bit BMP decode
        end-to-end in pure numpy, matching the source plane exactly
        (integer BT.601 luma for the RGB formats)."""
        from libosmtools_spark.mm.multimodal import decode_bmp, decode_ppm, real_decode

        rng = np.random.default_rng(5)
        rgb = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)  # odd w: BMP padding
        luma = (
            (77 * rgb[..., 0].astype(np.uint32)
             + 150 * rgb[..., 1].astype(np.uint32)
             + 29 * rgb[..., 2].astype(np.uint32)) >> 8
        ).astype(np.uint8)
        np.testing.assert_array_equal(decode_ppm(self._encode_ppm(rgb)), luma)
        np.testing.assert_array_equal(decode_bmp(self._encode_bmp24(rgb)), luma)
        gray = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
        np.testing.assert_array_equal(decode_ppm(self._encode_pgm(gray)), gray)
        # real_decode sniffs magic bytes, mime not required to be truthful
        np.testing.assert_array_equal(real_decode(self._encode_ppm(rgb), "application/octet-stream"), luma)
        np.testing.assert_array_equal(real_decode(self._encode_bmp24(rgb), None), luma)

    def test_real_decode_features_end_to_end(self, spark):
        """extract_features(use_stub=False) over a media table of actual
        PPM/BMP payloads: the NON-stub branch decodes and features real
        formats in this container (ok=True), while an undecodable payload
        degrades to ok=False instead of failing the job."""
        from libosmtools_spark.mm.multimodal import extract_features

        rng = np.random.default_rng(6)
        rgb = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        gray = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
        rows = [
            (1, "image", self._encode_ppm(rgb), "image/x-portable-pixmap", None, None),
            (2, "image", self._encode_bmp24(rgb), "image/bmp", None, None),
            (3, "image", self._encode_pgm(gray), "image/x-portable-graymap", None, None),
            (4, "image", b"\x89PNG not really", "image/png", None, None),
        ]
        media = spark.createDataFrame(
            rows,
            "media_id long, kind string, payload binary, mime string, width int, height int",
        )
        out = (
            extract_features(media, use_stub=False)
            .toPandas()
            .sort_values("media_id")
            .reset_index(drop=True)
        )
        assert out["ok"].tolist() == [True, True, True, False]
        # expected feature: L1-normalized 8-bin histogram of the luma plane
        luma = (
            (77 * rgb[..., 0].astype(np.uint32)
             + 150 * rgb[..., 1].astype(np.uint32)
             + 29 * rgb[..., 2].astype(np.uint32)) >> 8
        ).astype(np.uint8)
        hist, _ = np.histogram(luma, bins=8, range=(0, 256))
        want = (hist / hist.sum()).astype(np.float32)
        np.testing.assert_allclose(np.array(out.loc[0, "feat"], dtype=np.float32), want, rtol=1e-6)
        # PPM and BMP encode the same pixels -> identical features
        assert list(out.loc[0, "feat"]) == list(out.loc[1, "feat"])

    def test_resize_plumbing(self, spark, sf_smoke):
        from libosmtools_spark.mm.multimodal import pages_html_media, resize_media

        pages = spark.read.parquet(os.path.join(sf_smoke, "pages.parquet")).limit(50)
        out = resize_media(pages_html_media(pages), out_w=8, out_h=8).toPandas()
        assert len(out) == 50
        assert out["plane"].map(len).eq(64).all()  # 8x8 uint8 plane
        assert out["mean_luma"].between(0, 255).all()
        # determinism (fake decoder is payload-deterministic)
        out2 = resize_media(pages_html_media(pages), out_w=8, out_h=8).toPandas()
        a = out.sort_values("media_id").reset_index(drop=True)
        b = out2.sort_values("media_id").reset_index(drop=True)
        assert (a["plane"] == b["plane"]).all()

    def test_frame_sample_plumbing(self, spark, sf_smoke):
        from libosmtools_spark.mm.multimodal import frame_sample, pages_html_media

        pages = spark.read.parquet(os.path.join(sf_smoke, "pages.parquet")).limit(20)
        out = frame_sample(pages_html_media(pages), every_k=4, frame_bytes=64).toPandas()
        assert out["media_id"].nunique() == 20
        # every media contributes frame 0 and only every-4th frames
        assert (out["frame_idx"] % 4 == 0).all()
        per = out.groupby("media_id").agg(n=("frame_idx", "size"), tot=("n_frames", "first"))
        assert (per["n"] == -(-per["tot"] // 4)).all()
        assert out["frame"].map(len).le(64).all()


class TestStreaming:
    def test_region_stream_matches_batch(self, spark, sf_smoke):
        """The full spatial join as a continuous query: streaming windowed
        per-region counts equal the batch computation on the same input."""
        import os

        from libosmtools_spark.pipeline import SpatialEngine
        from libosmtools_spark.streaming.geostream import (
            run_region_stream_to_memory,
            stream_region_counts,
        )

        eng = SpatialEngine.from_fixtures(spark, sf_smoke)
        pages_dir = os.path.join(sf_smoke, "pages.parquet")
        got = run_region_stream_to_memory(spark, pages_dir, eng, query_name="t_rstream").toPandas()
        batch = stream_region_counts(
            spark.read.parquet(pages_dir), eng.candidates_bcast, eng.rings_bcast,
            level=eng.level,
        ).toPandas()
        key = ["window_start", "region_id"]
        g = got.sort_values(key).reset_index(drop=True)
        b = batch.sort_values(key).reset_index(drop=True)
        assert len(g) == len(b) > 0
        assert (g["n_pages"].to_numpy() == b["n_pages"].to_numpy()).all()

    def test_stream_matches_batch(self, spark, sf_smoke):
        from libosmtools_spark.streaming.geostream import (
            run_stream_to_memory,
            stream_cell_counts,
        )

        pages_dir = os.path.join(sf_smoke, "pages.parquet")
        got = run_stream_to_memory(spark, pages_dir, query_name="t_stream").toPandas()
        batch = stream_cell_counts(spark.read.parquet(pages_dir)).toPandas()
        g = got.sort_values(["window_start", "cell_key"]).reset_index(drop=True)
        b = batch.sort_values(["window_start", "cell_key"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(g, b)


class TestCheckpoint:
    def test_stage_skip_and_rebuild(self, spark, sf_smoke, tmp_path):
        from libosmtools_spark.run.checkpoint import CheckpointManager, input_fingerprint

        cp = CheckpointManager(spark, str(tmp_path / "ckpt"))
        fp = input_fingerprint(spark, os.path.join(sf_smoke, "pages.parquet"))
        calls = {"n": 0}

        def build():
            calls["n"] += 1
            return spark.read.parquet(os.path.join(sf_smoke, "pages.parquet")).select("url")

        a = cp.stage("urls", fp, build)
        b = cp.stage("urls", fp, build)  # must skip
        assert calls["n"] == 1
        assert a.count() == b.count()
        c = cp.stage("urls", "changed-fp", build)  # must rebuild
        assert calls["n"] == 2
        # manifest has 2 records for the stage
        import json

        with open(cp.manifest_path) as f:
            recs = [json.loads(x) for x in f]
        assert sum(1 for r in recs if r["stage"] == "urls") == 2

    def test_partition_metrics(self, spark, sf_smoke, tmp_path):
        from libosmtools_spark.run.checkpoint import CheckpointManager

        cp = CheckpointManager(spark, str(tmp_path / "ckpt2"))
        df = spark.read.parquet(os.path.join(sf_smoke, "pages.parquet"))
        pm = cp.partition_metrics(df).toPandas()
        assert pm["n_rows"].sum() == df.count()


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))


class TestScaleHygiene:
    def test_simhash_hot_fingerprint_bounded(self, spark):
        """10k no-shingle docs all coalesce to simhash 0.  The banded join
        must see each DISTINCT fingerprint once (not 10k × 4 bands rows),
        and the hamming-0 clique resolves via a plain fingerprint equi-join
        whose size is the (unavoidable) output itself."""
        from libosmtools_spark.dedup.dedup import simhash_pairs

        n = 10_000
        fps = spark.range(n).select(
            F.col("id").alias("doc_id"), F.lit(0).cast("long").alias("simhash")
        )
        pairs = simhash_pairs(fps, max_hamming=3, n_bands=4)
        # candidate volume through the BANDED path is bounded by distinct
        # fingerprints (here: 1), so planning+counting finishes fast; the
        # output is the full clique
        assert pairs.count() == n * (n - 1) // 2
        assert pairs.filter(F.col("hamming") != 0).count() == 0

    def test_no_storage_growth_across_calls(self, spark):
        """knn_ring and ngram_jaccard_pairs release their caches: repeated
        calls in one session must not accumulate persisted RDDs."""
        from libosmtools_spark.dedup.dedup import ngram_jaccard_pairs
        from libosmtools_spark.knn.ring import knn_ring

        docs = spark.read.parquet(f"{TESTDATA}/documents.parquet")
        pts = docs.select(
            "doc_id",
            ((F.col("doc_id") * 9973 % 1700) / 10.0 - 85.0).alias("lat"),
            ((F.col("doc_id") * 7919 % 3600) / 10.0 - 180.0).alias("lon"),
        )

        from libosmtools_spark.session import release_local_checkpoint

        def n_cached():
            jsc = spark.sparkContext._jsc.sc()
            return jsc.getPersistentRDDs().size()

        base = n_cached()
        for _ in range(3):
            for res in (knn_ring(pts, "doc_id", k=3), ngram_jaccard_pairs(docs, threshold=0.5)):
                res.count()
                release_local_checkpoint(res)
            # every intermediate cache/loop-checkpoint is released by the
            # operators themselves; the result checkpoint via the helper.
            # <= not ==: checkpoints left by EARLIER tests in the session
            # may be garbage-collected mid-loop, dropping the count below
            # the baseline — growth is the bug, shrinkage isn't.
            assert n_cached() <= base


class TestEmptyInputs:
    def test_operators_accept_empty_corpora(self, spark):
        """Every dedup/similarity operator returns a typed empty result on
        an empty table instead of crashing in numpy stacking."""
        from libosmtools_spark.dedup.dedup import (
            exact_dedup, minhash_lsh_pairs, ngram_jaccard_pairs,
            simhash_fingerprints, simhash_pairs,
        )
        from libosmtools_spark.sim.ann import (
            ann_topk, cosine_dup_pairs, ivf_topk, lsh_topk,
        )

        docs = spark.createDataFrame([], "doc_id long, text string")
        emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
        assert exact_dedup(docs).count() == 0
        assert ngram_jaccard_pairs(docs).count() == 0
        assert minhash_lsh_pairs(docs).count() == 0
        assert simhash_pairs(simhash_fingerprints(docs)).count() == 0
        assert ann_topk(emb).count() == 0
        assert lsh_topk(emb).count() == 0
        assert cosine_dup_pairs(emb).count() == 0
        assert ivf_topk(emb).count() == 0


class TestWinnowBPE:
    def test_bpe_token_count(self, spark):
        from libosmtools_spark.text.analysis import bpe_token_count_col

        rows = [(0, "hello world42 foo-bar!!"), (1, ""), (2, "a1b2")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = docs.select("doc_id", bpe_token_count_col(F.col("text")).alias("n")).toPandas()
        got = out.set_index("doc_id")["n"]
        # hello | world | 42 | foo | - | bar | !! = 7 runs
        assert got[0] == 7 and got[1] == 0 and got[2] == 4

    def test_winnow_shared_substring_shares_fingerprint(self, spark):
        """The winnowing guarantee: documents sharing a sufficiently long
        run of tokens (longer than window + k) share at least one
        fingerprint; unrelated docs share none."""
        from libosmtools_spark.text.analysis import winnow_fingerprints

        common = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
        rows = [
            (0, f"prefix one two {common} suffix here"),
            (1, f"other words entirely {common} trailing bits"),
            (2, "completely unrelated vocabulary nothing matches at all ever"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        fps = winnow_fingerprints(docs, k=3, window=4).toPandas()
        by_doc = {d: set(g["fp"]) for d, g in fps.groupby("doc_id")}
        assert by_doc[0] & by_doc[1], "shared run must share a fingerprint"
        assert not (by_doc[0] & by_doc[2])
        # sketch is smaller than the shingle count (that's the point)
        n_sh0 = len(rows[0][1].split()) - 2
        assert 0 < len(by_doc[0]) < n_sh0
