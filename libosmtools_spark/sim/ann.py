"""Similarity search over embedding columns (training-data extension).

- ``ann_topk``: the entry point — count-gated auto-dispatch (the same
  pattern as knn/ring.py's knn_join): broadcastable corpora take the
  one-matmul brute path; larger corpora take the distributed
  block-nested-loop exact path.  No unguarded driver collect anywhere.
- ``cosine_topk_brute``: exact top-k cosine neighbors against a broadcast
  corpus matrix — one numpy matmul per Arrow batch (no per-row Python).
- ``cosine_topk_blocked``: distributed exact top-k — (query-block ×
  corpus-block) cogroups, partial top-k per pair, one global window merge.
  Per-task memory is |corpus|/Bc + |queries|/Bq vectors; shuffle volume is
  the honest O(n·B) of exact all-pairs search, spread over the cluster.
- ``lsh_topk``: random-hyperplane LSH bucketing — the approximate scale
  path: the bucket self-join carries (id, bucket) rows ONLY; full vectors
  rejoin exactly once for scoring.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from libosmtools_spark.sim.topk import topk_rows

#: corpora up to this many rows broadcast whole (same posture as the
#: region store / knn_join's brute threshold — a dimension-scale index).
#: Measured on the bench corpus (32 cores, warm, min-of-2, with query
#: chunking): brute/blocked walls 1.2/2.6 s at 10k, 2.3/3.5-5.2 s at 20k;
#: brute grows quadratically past the blocked path's near-flat wall, so the
#: crossover sits at ~25-35k rows on this box.  Box-measured, not
#: universal: on a cluster the binding constraint is executor memory for
#: the broadcast matrix — re-probe at other scales.
BRUTE_MAX_ROWS = 24_000

#: per-chunk element budget for brute cosine score matrices: ~512 KB
#: temporaries stay private-cache-resident; unchunked full-batch matmuls
#: (e.g. 1250×20000 ≈ 200 MB) go memory-bandwidth-bound and fall off a
#: cliff (measured 0.9 s → 19.3 s from 10k to 20k corpus rows)
_ANN_CHUNK_ELEMS = 262_144

_TOPK_SCHEMA = T.StructType(
    [
        T.StructField("qid", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("rank", T.IntegerType()),
    ]
)


def ann_topk(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    brute_max_rows: int = BRUTE_MAX_ROWS,
    n_rows: int | None = None,
) -> DataFrame:
    """Exact cosine top-k with automatic physical-path dispatch: corpora
    that fit a broadcast take the matmul path; anything larger runs the
    distributed blocked path.  Results are identical (same cosine formula,
    same desc-cosine/asc-id tie rule).  ``n_rows`` (if known) skips the
    dispatch count() job."""
    n = embeddings.count() if n_rows is None else n_rows
    if n == 0:
        return _empty_topk(embeddings, id_col)
    if n <= brute_max_rows:
        return cosine_topk_brute(embeddings, k, id_col, vec_col, _count_checked=True)
    return cosine_topk_blocked(embeddings, k, id_col=id_col, vec_col=vec_col)


def _empty_topk(embeddings: DataFrame, id_col: str) -> DataFrame:
    """Typed empty (id, neighbor_id, rank) result — numpy paths can't
    stack zero vectors."""
    return embeddings.sparkSession.createDataFrame(
        [], f"{id_col} long, neighbor_id long, rank int"
    )


def _collect_matrix(embeddings: DataFrame, id_col: str, vec_col: str):
    """Corpus as (ids, M, norms), SORTED by id ascending — column order =
    id order, so topk_rows' (score, column asc) tie rule is exactly the
    (score, neighbor-id asc) contract with no per-row lexsort."""
    pdf = embeddings.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    M = np.stack(pdf[vec_col].to_numpy()[order]).astype(np.float64)
    norms = np.linalg.norm(M, axis=1)
    norms[norms == 0] = 1.0
    return ids, M, norms


def cosine_topk_brute(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = BRUTE_MAX_ROWS,
    _count_checked: bool = False,
) -> DataFrame:
    """(id, neighbor_id, rank): exact top-k by cosine, ties by neighbor id.

    The corpus matrix is broadcast (dimension-scale index assumption — the
    same posture as the region store); each Arrow batch of queries does ONE
    matmul.  GUARDED: refuses corpora beyond ``max_rows`` — use ann_topk
    (auto-dispatch) or cosine_topk_blocked for fact-table-scale corpora."""
    spark = embeddings.sparkSession
    if not _count_checked:
        n = embeddings.count()
        if n > max_rows:
            raise ValueError(
                f"cosine_topk_brute: corpus has {n} rows > max_rows={max_rows}; "
                "use ann_topk (auto-dispatch) or cosine_topk_blocked"
            )
    ids, M, norms = _collect_matrix(embeddings, id_col, vec_col)
    bc = spark.sparkContext.broadcast((ids, M / norms[:, None]))

    def part(it):
        nids, Mn = bc.value
        chunk = max(4, _ANN_CHUNK_ELEMS // max(len(nids), 1))
        for pdf in it:
            Q = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            qn = np.linalg.norm(Q, axis=1)
            qn[qn == 0] = 1.0
            Qn = Q / qn[:, None]
            all_qids = pdf[id_col].to_numpy()
            for i in range(0, len(all_qids), chunk):
                qi = slice(i, i + chunk)
                S = Qn[qi] @ Mn.T  # (chunk, n) cosine matrix
                qids = all_qids[qi]
                S[qids[:, None] == nids[None, :]] = -np.inf  # self-exclusion
                # corpus is id-sorted: topk_rows(-S) gives exact
                # (cosine desc, id asc) at O(n) per row — no per-row lexsort
                top = topk_rows(-S, k)
                m, kk = top.shape
                yield pd.DataFrame(
                    {
                        "qid": np.repeat(qids, kk),
                        "neighbor_id": nids[top].ravel(),
                        "rank": np.tile(np.arange(1, kk + 1), m),
                    }
                )

    return (
        embeddings.select(id_col, vec_col)
        .mapInPandas(part, _TOPK_SCHEMA)
        .withColumnRenamed("qid", id_col)
    )


def cosine_topk_blocked(
    embeddings: DataFrame,
    k: int = 5,
    n_query_blocks: int = 8,
    n_corpus_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed EXACT top-k cosine: block-nested-loop self-join.

    Queries hash into Bq blocks, corpus into Bc blocks; every (qb, cb)
    pair cogroups on one task, computes its partial top-k with one matmul
    (identical arithmetic to the brute path, so results merge exactly),
    and a single window rank merges the Bc partials per query.  Nothing is
    ever collected to the driver; per-task memory is bounded by the block
    sizes, tunable independently of corpus size."""
    Bq, Bc = n_query_blocks, n_corpus_blocks
    # CRITICAL: both grouping keys must be LONG on BOTH sides.  pmod(xxhash64)
    # is long but explode(sequence(int,int)) is int; cogroup with per-position
    # key types (long,int) vs (int,long) compares equal inside a partition
    # (UnsafeRow stores both in 8-byte slots) yet ROUTES by murmur3, which
    # hashes int and long differently — so group alignment silently became
    # partition-layout-dependent: exact at driver/test scale, dropping ~7/8
    # of all (qb,cb) pairs on the 8-file 20k-row bench corpus (measured:
    # 20/64 groups matched, AQE on or off; 64/64 with unified types).
    q = (
        embeddings.select(
            F.col(id_col).alias("qid"),
            F.col(vec_col).alias("qv"),
            F.pmod(F.xxhash64(id_col), F.lit(Bq)).alias("qb"),
        )
        .withColumn("cb", F.explode(F.sequence(F.lit(0), F.lit(Bc - 1))))
        .withColumn("cb", F.col("cb").cast("long"))
    )
    c = (
        embeddings.select(
            F.col(id_col).alias("nid"),
            F.col(vec_col).alias("nv"),
            F.pmod(F.xxhash64(id_col), F.lit(Bc)).alias("cb"),
        )
        .withColumn("qb", F.explode(F.sequence(F.lit(0), F.lit(Bq - 1))))
        .withColumn("qb", F.col("qb").cast("long"))
    )

    part_schema = T.StructType(
        [
            T.StructField("qid", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def partial_topk(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"qid": [], "neighbor_id": [], "cosine": []}).astype(
                {"qid": "int64", "neighbor_id": "int64", "cosine": "float64"}
            )
        Q = np.stack(left["qv"].to_numpy()).astype(np.float64)
        qn = np.linalg.norm(Q, axis=1)
        qn[qn == 0] = 1.0
        nids = right["nid"].to_numpy()
        # sort the corpus block by nid so topk_rows' column-order tie rule
        # is the (cosine desc, nid asc) contract (blocks arrive unordered)
        nord = np.argsort(nids, kind="stable")
        nids = nids[nord]
        M = np.stack(right["nv"].to_numpy()[nord]).astype(np.float64)
        mn = np.linalg.norm(M, axis=1)
        mn[mn == 0] = 1.0
        S = (Q / qn[:, None]) @ (M / mn[:, None]).T
        qids = left["qid"].to_numpy()
        S[qids[:, None] == nids[None, :]] = -np.inf  # self-exclusion
        top = topk_rows(-S, min(k, S.shape[1]))
        m, kk = top.shape
        rows_idx = np.arange(m)[:, None]
        sel = S[rows_idx, top]
        keep = (sel > -np.inf).ravel()  # drop the self slots (one block owns them)
        return pd.DataFrame(
            {
                "qid": np.repeat(qids, kk)[keep],
                "neighbor_id": nids[top].ravel()[keep],
                "cosine": sel.ravel()[keep],
            }
        )

    partials = (
        q.groupBy("qb", "cb")
        .cogroup(c.groupBy("qb", "cb"))
        .applyInPandas(lambda left, right: partial_topk(left, right), part_schema)
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias(id_col), "neighbor_id", F.col("rank").cast("int").alias("rank")
        )
    )


#: embedding quantization scale for the bucket decision (2^20): q = floor(v·2^20)
#: is exact in IEEE-754 (power-of-two multiply), and every partial sum of
#: h·q terms stays far below 2^53, so the SIGN of the dot product is
#: bit-identical in ANY engine and ANY summation order — this is what makes
#: the LSH bucketing exactly SQL-oracle-able.
LSH_QUANT = 1048576.0
#: integer hyperplane coordinate range (random ±127 projections are as good
#: as gaussian for sign-LSH, and keep the arithmetic integer-exact)
LSH_PLANE_RANGE = 127

#: base LSH geometry — the fixture-scale operating point (≤4096 rows):
#: 10 planes × 12 tables holds recall ≈0.94 at cosine 0.9 with ~2% of
#: all-pairs candidate volume.  The static SQL oracle replicates exactly
#: these constants, and ``auto_lsh_params`` returns exactly them for every
#: fixture-scale corpus, so auto-parameterized queries stay oracle-exact.
LSH_BASE_PLANES = 10
LSH_BASE_TABLES = 12
#: expected rows per (table, bucket): planes grow as log2(n/occ) so bucket
#: occupancy — and with it candidate pairs per row — stays ~constant as the
#: corpus grows.  Fixed planes are quadratic: measured on the 20k-vector
#: 10× bench replica, 10 planes produced 3.17M candidate pairs / 93 s wall
#: where 13 planes produce 482k pairs / 7.7 s — same corpus, same recall
#: law (tables are grown alongside, below).
LSH_TARGET_OCCUPANCY = 4
#: per-plane collision probability at the documented cos≈0.9 operating
#: point (1 - acos(0.9)/π): each added plane multiplies the per-table
#: collision probability by this, so tables must grow by its inverse per
#: plane to hold the multi-table recall curve fixed — the standard sign-LSH
#: n^ρ cost law, paid in tables instead of recall.
_LSH_P_NEAR = 0.8564
#: ceiling on auto-grown tables (cost guard; past this the recall operating
#: point drifts down and the docstring contract says so)
LSH_MAX_TABLES = 64


def auto_lsh_params(
    n_rows: int,
    base_planes: int = LSH_BASE_PLANES,
    base_tables: int = LSH_BASE_TABLES,
    target_occupancy: int = LSH_TARGET_OCCUPANCY,
    max_tables: int = LSH_MAX_TABLES,
) -> tuple[int, int]:
    """(n_planes, n_tables) scaled to the corpus size.

    planes = max(base, ceil(log2(n / occupancy))) keeps expected bucket
    occupancy constant (candidate generation stays linear in n); tables
    grow by 1/p per added plane (p = per-plane collision probability at
    cosine 0.9) so the near-duplicate recall operating point is preserved.
    At fixture scale (n ≤ base_occupancy·2^base_planes = 4096) this returns
    exactly (base_planes, base_tables) — the constants the static SQL
    oracle replicates."""
    import math

    planes = base_planes
    if n_rows > target_occupancy * (1 << base_planes):
        planes = math.ceil(math.log2(max(n_rows, 2) / target_occupancy))
    tables = min(
        max_tables, round(base_tables * (1.0 / _LSH_P_NEAR) ** (planes - base_planes))
    )
    return planes, tables


def lsh_hyperplanes(n_tables: int, n_planes: int, dim: int, seed: int = 7) -> np.ndarray:
    """Deterministic integer hyperplanes (n_tables, n_planes, dim) in
    [-LSH_PLANE_RANGE, LSH_PLANE_RANGE] — shared by the Spark UDF and the
    DuckDB oracle generator (single definition)."""
    return (
        np.random.default_rng(seed)
        .integers(-LSH_PLANE_RANGE, LSH_PLANE_RANGE + 1, size=(n_tables, n_planes, dim))
        .astype(np.float64)
    )


def hyperplane_buckets_udf(n_planes: int, n_tables: int, seed: int = 7):
    """vec → array of n_tables bucket ids (each from its own n_planes
    hyperplane set).  Multi-table LSH: a pair is a candidate if it collides
    in ANY table — recall improves geometrically with tables while each
    table's buckets stay small (the skew/size trade).

    The hyperplanes are generated deterministically INSIDE the UDF from the
    incoming vectors' dimension (cached per process) — no driver-side
    ``.first()`` probe, no dim parameter to thread through.  Bucket bits
    come from integer-exact quantized dot products (see LSH_QUANT)."""
    _planes_cache: dict[int, np.ndarray] = {}

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vec: pd.Series) -> pd.Series:
        V = np.stack(vec.to_numpy()).astype(np.float64)  # (n, dim)
        dim = V.shape[1]
        H = _planes_cache.get(dim)
        if H is None:
            H = lsh_hyperplanes(n_tables, n_planes, dim, seed)
            _planes_cache[dim] = H
        Q = np.floor(V * LSH_QUANT)  # exact: power-of-two scale + floor
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        out = np.empty((len(V), n_tables), dtype=np.int64)
        for t in range(n_tables):
            signs = (Q @ H[t].T) > 0  # integer-valued doubles: exact sums
            # offset by table so buckets never collide across tables
            out[:, t] = (signs @ weights) + t * (1 << n_planes)
        return pd.Series(out.tolist())

    return buckets


def ann_lsh_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_planes: int | None = None,
    n_tables: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    brute_max_rows: int = BRUTE_MAX_ROWS,
) -> DataFrame:
    """LSH entry point with the same count-gated dispatch as ann_topk:
    corpora that fit a broadcast take the exact brute path (strictly better
    than any approximation at that scale — one matmul, recall 1); larger
    corpora run hyperplane LSH with auto_lsh_params-scaled geometry (pass
    explicit n_planes/n_tables to pin it).  Callers wanting the LSH
    physical path regardless of scale call lsh_topk directly."""
    n = embeddings.count()
    if n <= brute_max_rows:
        return cosine_topk_brute(embeddings, k, id_col, vec_col, _count_checked=True)
    auto_p, auto_t = auto_lsh_params(n)
    return lsh_topk(
        embeddings,
        k,
        auto_p if n_planes is None else n_planes,
        auto_t if n_tables is None else n_tables,
        id_col,
        vec_col,
    )


def lsh_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_planes: int | None = None,
    n_tables: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = pairs colliding in any of
    ``n_tables`` hyperplane-sign buckets, ranked by exact cosine.  Linear
    candidate generation; recall measured against the exact operator in
    tests.

    Operating regime (sign-LSH's similarity-recall curve): the defaults
    (10 planes × 12 tables) hold recall ≥ ~0.95 for genuinely NEAR
    neighbors (cosine ≥ ~0.9 — the near-duplicate retrieval the operator
    exists for) at ~2% of all-pairs candidate volume on a random corpus;
    recall for near-orthogonal "top-k" pairs (cosine ~0.4) is intentionally
    sacrificed — retrieving those needs near-quadratic candidates and is
    the exact paths' job (ann_topk dispatches there when feasible).

    Shuffle diet: the bucket self-join and the (qid, nid) dedup move
    (id, bucket) rows ONLY — full embedding vectors rejoin exactly once,
    after dedup, for scoring.  At 100 TB the duplicated-vector shuffle this
    replaces would dwarf the id-only join.

    ``n_planes``/``n_tables`` default to auto_lsh_params(count) — constant
    bucket occupancy (linear candidates) with the recall curve held by
    table growth; at fixture scale the auto values are exactly the
    (10, 12) the static SQL oracle replicates."""
    # one count serves both the auto geometry and the scoring dispatch
    # (ADVICE r7: default-geometry callers paid a second uncached count)
    n = embeddings.count()
    if n_planes is None or n_tables is None:
        auto_p, auto_t = auto_lsh_params(n)
        n_planes = auto_p if n_planes is None else n_planes
        n_tables = auto_t if n_tables is None else n_tables
    bucket = hyperplane_buckets_udf(n_planes, n_tables)
    b = embeddings.select(
        F.col(id_col), F.explode(bucket(F.col(vec_col))).alias("bucket")
    )

    x = b.select(F.col(id_col).alias("qid"), "bucket")
    y = b.select(F.col(id_col).alias("nid"), "bucket")
    cand = (
        x.join(y, "bucket")
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid")
        .dropDuplicates(["qid", "nid"])
    )
    scored = _score_pairs(embeddings, cand, "qid", "nid", id_col, vec_col, n_rows=n)
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias(id_col), F.col("nid").alias("neighbor_id"), "rank", "cosine")
    )


def _score_pairs(
    embeddings: DataFrame,
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    id_col: str,
    vec_col: str,
    n_rows: int | None = None,
    brute_max_rows: int = BRUTE_MAX_ROWS,
) -> DataFrame:
    """pairs(a, b) → + cosine, bit-identical to the former per-pair pandas
    UDF over twice-joined vectors: cosine = (va·vb row-sum) / (‖va‖·‖vb‖),
    the exact same elementwise-product/sum/np.linalg.norm arithmetic.

    Physical dispatch (count-gated like ann_topk): a broadcastable corpus
    ships ONCE as an id-sorted matrix and each pair batch GATHERS its rows
    — no vector join, no per-pair np.stack of 10^5 small lists (measured as
    the dominant scoring cost), and the pair shuffle carries ids only.
    Past broadcast scale the original two hash joins + pair UDF remain."""
    n = embeddings.count() if n_rows is None else n_rows
    # n == 0 falls through to the join path: zero rows means the scoring
    # UDF never runs, and _collect_matrix cannot stack an empty corpus
    if 0 < n <= brute_max_rows:
        spark = embeddings.sparkSession
        # keep the zero-guarded norms _collect_matrix already computed —
        # per-task recomputation threw them away (review finding)
        ids, M, norms_ = _collect_matrix(embeddings, id_col, vec_col)
        # the returned frame is LAZY, so this broadcast cannot be
        # unpersisted here; the session's periodic ContextCleaner GC
        # (session.py) reclaims it once the caller drops the result
        bc = spark.sparkContext.broadcast((ids, M, norms_))
        out_schema = T.StructType(
            [
                T.StructField(a_col, T.LongType()),
                T.StructField(b_col, T.LongType()),
                T.StructField("cosine", T.DoubleType()),
            ]
        )

        def score(it):
            sids, SM, norms = bc.value
            for pdf in it:
                ai = np.searchsorted(sids, pdf[a_col].to_numpy())
                bi = np.searchsorted(sids, pdf[b_col].to_numpy())
                A = SM[ai]
                C = SM[bi]
                cos = (A * C).sum(axis=1) / (norms[ai] * norms[bi])
                yield pd.DataFrame(
                    {a_col: pdf[a_col], b_col: pdf[b_col], "cosine": cos}
                )

        return pairs.mapInPandas(score, out_schema)

    qv = embeddings.select(F.col(id_col).alias(a_col), F.col(vec_col).alias("qv"))
    nv = embeddings.select(F.col(id_col).alias(b_col), F.col(vec_col).alias("nv"))
    joined = pairs.join(qv, a_col).join(nv, b_col)

    @F.pandas_udf(T.DoubleType())
    def cos(a: pd.Series, c: pd.Series) -> pd.Series:
        A = np.stack(a.to_numpy()).astype(np.float64)
        C = np.stack(c.to_numpy()).astype(np.float64)
        na = np.linalg.norm(A, axis=1)
        nc = np.linalg.norm(C, axis=1)
        na[na == 0] = 1.0
        nc[nc == 0] = 1.0
        return pd.Series((A * C).sum(axis=1) / (na * nc))

    return joined.withColumn("cosine", cos(F.col("qv"), F.col("nv"))).drop("qv", "nv")


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicate pairs (the dedup-family member: emit the
# PAIRS above a similarity threshold, not per-query top-k)
# ---------------------------------------------------------------------------

_PAIR_SCHEMA = T.StructType(
    [T.StructField("a", T.LongType()), T.StructField("b", T.LongType())]
)


def cosine_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    brute_max_rows: int = BRUTE_MAX_ROWS,
    n_query_blocks: int = 8,
    n_corpus_blocks: int = 8,
) -> DataFrame:
    """(a, b) unordered pairs with cosine(a, b) ≥ threshold — EXACT
    embedding near-dup detection, the cosine sibling of
    dedup.ngram_jaccard_pairs.  Count-gated physical dispatch like
    ann_topk: a broadcastable corpus takes one matmul per Arrow batch of
    queries (each batch emits only its own a<b half — every unordered
    pair materializes exactly once across batches); larger corpora run the
    block-nested-loop cogroup with per-task memory bounded by the block
    sizes.  Output carries ids only (no cosine column): the float is
    summation-order-sensitive across engines, the pair set is not."""
    spark = embeddings.sparkSession
    n = embeddings.count()
    if n == 0:
        return spark.createDataFrame([], "a long, b long")
    if n <= brute_max_rows:
        ids, M, norms = _collect_matrix(embeddings, id_col, vec_col)
        bc = spark.sparkContext.broadcast((ids, M / norms[:, None]))

        def part(it):
            nids, Mn = bc.value
            chunk = max(4, _ANN_CHUNK_ELEMS // max(len(nids), 1))
            for pdf in it:
                Q = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                qn = np.linalg.norm(Q, axis=1)
                qn[qn == 0] = 1.0
                Qn = Q / qn[:, None]
                all_qids = pdf[id_col].to_numpy()
                for i in range(0, len(all_qids), chunk):
                    sl = slice(i, i + chunk)
                    S = Qn[sl] @ Mn.T
                    qids = all_qids[sl]
                    qi, ci = np.nonzero((S >= threshold) & (qids[:, None] < nids[None, :]))
                    yield pd.DataFrame({"a": qids[qi], "b": nids[ci]})

        return embeddings.select(id_col, vec_col).mapInPandas(part, _PAIR_SCHEMA)

    # distributed: block-nested-loop over (query-block × corpus-block).
    # Grouping keys cast to LONG on both sides — see cosine_topk_blocked for
    # the mixed-type cogroup misalignment this prevents.
    Bq, Bc = n_query_blocks, n_corpus_blocks
    q = (
        embeddings.select(
            F.col(id_col).alias("qid"),
            F.col(vec_col).alias("qv"),
            F.pmod(F.xxhash64(id_col), F.lit(Bq)).alias("qb"),
        )
        .withColumn("cb", F.explode(F.sequence(F.lit(0), F.lit(Bc - 1))))
        .withColumn("cb", F.col("cb").cast("long"))
    )
    c = (
        embeddings.select(
            F.col(id_col).alias("nid"),
            F.col(vec_col).alias("nv"),
            F.pmod(F.xxhash64(id_col), F.lit(Bc)).alias("cb"),
        )
        .withColumn("qb", F.explode(F.sequence(F.lit(0), F.lit(Bq - 1))))
        .withColumn("qb", F.col("qb").cast("long"))
    )

    def block_pairs(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"a": [], "b": []}).astype({"a": "int64", "b": "int64"})
        Q = np.stack(left["qv"].to_numpy()).astype(np.float64)
        qn = np.linalg.norm(Q, axis=1)
        qn[qn == 0] = 1.0
        M = np.stack(right["nv"].to_numpy()).astype(np.float64)
        mn = np.linalg.norm(M, axis=1)
        mn[mn == 0] = 1.0
        S = (Q / qn[:, None]) @ (M / mn[:, None]).T
        qids = left["qid"].to_numpy()
        nids = right["nid"].to_numpy()
        qi, ci = np.nonzero((S >= threshold) & (qids[:, None] < nids[None, :]))
        return pd.DataFrame({"a": qids[qi], "b": nids[ci]})

    return (
        q.groupBy("qb", "cb")
        .cogroup(c.groupBy("qb", "cb"))
        .applyInPandas(lambda l, r: block_pairs(l, r), _PAIR_SCHEMA)
    )


def cosine_dup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.8,
    n_planes: int | None = None,
    n_tables: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The 100 TB path: LSH-bucketed candidate pairs verified by exact
    cosine ≥ threshold.  Candidate generation is linear and id-only (same
    shuffle diet as lsh_topk); recall follows the sign-LSH
    similarity-recall curve — ≥ ~0.95 for genuinely near pairs (cosine ≥
    ~0.9) at the fixture-scale geometry, measured on planted duplicates in
    tests.  Geometry defaults to auto_lsh_params(count) — see lsh_topk.
    Use cosine_dup_pairs (exact) when the corpus permits."""
    # one count serves both the auto geometry and the scorer dispatch —
    # default-geometry callers previously paid a second uncached count
    n = embeddings.count()
    if n_planes is None or n_tables is None:
        auto_p, auto_t = auto_lsh_params(n)
        n_planes = auto_p if n_planes is None else n_planes
        n_tables = auto_t if n_tables is None else n_tables
    bucket = hyperplane_buckets_udf(n_planes, n_tables)
    b = embeddings.select(F.col(id_col), F.explode(bucket(F.col(vec_col))).alias("bucket"))
    x = b.select(F.col(id_col).alias("a"), "bucket")
    y = b.select(F.col(id_col).alias("b"), "bucket")
    cand = (
        x.join(y, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
    # same cosine arithmetic as before, via the count-gated broadcast-gather
    # scorer (no vector joins / per-pair stacks at dimension scale)
    return (
        _score_pairs(embeddings, cand, "a", "b", id_col, vec_col, n_rows=n)
        .filter(F.col("cosine") >= threshold)
        .select("a", "b")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the list-partitioned scale path
# ---------------------------------------------------------------------------

def ivf_seed_centroids(embeddings: DataFrame, n_lists: int,
                       id_col: str = "vec_id", vec_col: str = "embedding") -> np.ndarray:
    """Deterministic coarse quantizer: the ``n_lists`` corpus vectors with
    the smallest ids, as an (n_lists, dim) float64 matrix.  Production IVF
    plugs a TRAINED quantizer (k-means run offline) into ``ivf_topk``'s
    ``centroids`` parameter — the assignment/probe machinery is identical;
    the seed default keeps the operator deterministic and exactly
    SQL-oracle-able without a training step."""
    pdf = (
        embeddings.select(id_col, vec_col).orderBy(id_col).limit(n_lists).toPandas()
    )
    if len(pdf) == 0:
        return np.zeros((0, 0), dtype=np.float64)
    return np.stack(pdf[vec_col].to_numpy()).astype(np.float64)


def ivf_train_centroids(
    embeddings: DataFrame,
    n_lists: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: int = 100_000,
    n_iter: int = 20,
) -> np.ndarray:
    """TRAINED coarse quantizer: deterministic spherical k-means over a
    hash-sampled subset, for ``ivf_topk``'s ``centroids`` hook.

    100 TB shape: training never sees the full corpus — a deterministic
    xxhash64 row sample of ≤ ``sample_rows`` vectors collects to the
    driver (the quantizer is a dimension-scale model, same posture as the
    region store), and the k-means loop is a few numpy matmuls over that
    sample.  Assignment of the full corpus happens distributed inside
    ivf_topk exactly as with the seed quantizer.

    Deterministic end-to-end (no RNG at all): greedy farthest-point init (k-means++
    without randomness in the D² draw — always the farthest point, ties to
    the smaller sample index), fixed ``n_iter`` Lloyd rounds on the unit
    sphere (assign by max cosine, mean + re-normalize, empty lists re-seeded
    from the worst-covered points).  The seed-subset default
    (ivf_seed_centroids) remains the oracle contract; this trainer is the
    recall path for clustered real corpora — measured ≥ the seed quantizer
    at equal n_probe on a clustered fixture in tests."""
    n = embeddings.count()
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    take = embeddings.select(id_col, vec_col)
    if n > sample_rows:
        # deterministic hash sample at ~sample_rows expected size, with a
        # HARD driver bound: the hash filter's size is only expected-value,
        # so a sorted limit(2*sample_rows) makes the collect bound
        # unconditional while staying deterministic (ties impossible: ids
        # are unique, the orderBy is total)
        m = max(1, n // sample_rows)
        # truncation key = hash, not raw id: when the hash filter
        # over-delivers, a raw-id limit would keep only the smallest ids and
        # bias training toward ingest order; ordering by (hash, id) keeps the
        # truncation pseudo-random while staying deterministic and total
        take = (
            take.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(m)) == 0)
            .orderBy(F.xxhash64(F.col(id_col)), id_col)
            .limit(2 * sample_rows)
        )
    pdf = take.orderBy(id_col).toPandas()
    X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0] = 1.0
    X = X / norms[:, None]
    k = min(n_lists, len(X))
    # greedy farthest-point init (deterministic): start from the sample
    # vector nearest the sample mean, then repeatedly take the point with
    # the smallest max-cosine to any chosen center
    mean = X.mean(axis=0)
    first = int(np.argmax(X @ mean))
    chosen = [first]
    best_cos = X @ X[first]
    for _ in range(1, k):
        nxt = int(np.argmin(best_cos))
        chosen.append(nxt)
        best_cos = np.maximum(best_cos, X @ X[nxt])
    C = X[chosen].copy()
    for _ in range(n_iter):
        S = X @ C.T  # (n_sample, k) cosine since both sides unit-norm
        assign = np.argmax(S, axis=1)
        newC = np.zeros_like(C)
        np.add.at(newC, assign, X)
        counts = np.bincount(assign, minlength=k)
        empty = counts == 0
        if empty.any():
            # re-seed empty lists from the worst-covered sample points
            worst = np.argsort(S[np.arange(len(X)), assign])[: int(empty.sum())]
            newC[empty] = X[worst]
            counts[empty] = 1
        newC /= counts[:, None]
        cn = np.linalg.norm(newC, axis=1)
        cn[cn == 0] = 1.0
        C = newC / cn[:, None]
    return C


def _ivf_quantizer(centroids: np.ndarray):
    """Integer-exact assignment tables: quantized centroids (ints) and
    their norms.  Scores are dot(floor(v·2^20), floor(c·2^20)) / ‖floor(
    c·2^20)‖ — the dot is an exact int64 (< 2^53 for unit-scale
    embeddings), the norm an IEEE sqrt of an exact int, so every engine
    computes bit-identical scores in any summation order (same trick as
    the LSH buckets; see LSH_QUANT)."""
    Cq = np.floor(centroids * LSH_QUANT)
    norms = np.sqrt((Cq * Cq).sum(axis=1))
    norms[norms == 0] = 1.0
    return Cq, norms


def ivf_assign_udf(centroids: np.ndarray, n_probe: int):
    """vec → array of list ids: [own list (argmax score), …top-n_probe
    probes] — element 0 is the corpus-side assignment; the full array is
    the query-side probe set.  Ties break to the smaller list id."""
    Cq, norms = _ivf_quantizer(centroids)
    L = len(Cq)
    n_probe = min(n_probe, L)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def assign(vec: pd.Series) -> pd.Series:
        V = np.stack(vec.to_numpy()).astype(np.float64)
        Q = np.floor(V * LSH_QUANT)
        S = (Q @ Cq.T) / norms[None, :]  # exact ints / exact norms
        # columns ARE list ids 0..L-1, so topk_rows' column tie rule is
        # exactly "ties break to the smaller list id"
        order = topk_rows(-S, n_probe).astype(np.int32)
        return pd.Series(list(order))

    return assign


def ivf_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    centroids: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via inverted lists: every corpus vector lives in
    exactly ONE list (its nearest centroid); each query probes its
    ``n_probe`` nearest lists and ranks the candidates by exact cosine.

    100 TB shape: the corpus partitions by list id (candidate volume per
    query ≈ n_probe/n_lists of the corpus — tunable recall/cost), the
    list assignment shuffle carries (id, list) rows only, and vectors
    rejoin once for scoring, exactly like lsh_topk.  Recall follows the
    probe coverage; measured against the exact operator in tests."""
    if centroids is None:
        centroids = ivf_seed_centroids(embeddings, n_lists, id_col, vec_col)
    if len(centroids) == 0:  # empty corpus → empty result
        return _empty_topk(embeddings, id_col)
    assign = ivf_assign_udf(centroids, n_probe)
    assigned = embeddings.select(
        F.col(id_col), assign(F.col(vec_col)).alias("probes")
    )
    corpus = assigned.select(
        F.col(id_col).alias("nid"), F.element_at("probes", 1).alias("list_id")
    )
    queries = assigned.select(
        F.col(id_col).alias("qid"), F.explode("probes").alias("list_id")
    )
    cand = (
        queries.join(corpus, "list_id")
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid")
    )  # lists are disjoint per corpus vector and probes are distinct → no dup pairs
    scored = _score_pairs(embeddings, cand, "qid", "nid", id_col, vec_col)
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias(id_col), F.col("nid").alias("neighbor_id"), "rank")
    )
