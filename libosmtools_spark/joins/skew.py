"""Explicit skew mitigation: hot-key salting (SURVEY.md §4 — the
refineCells contract translated to shuffle balancing).

AQE's skew-join splits oversized shuffle partitions at runtime; salting is
the complementary *semantic* tool for aggregations and joins whose key
distribution is known-skewed (dense urban cells: the fixture plants ~40% of
all pages in one hotspot cell).  ``salted_count`` demonstrates the standard
two-phase pattern; ``top_hot_keys`` finds the keys worth salting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def top_hot_keys(
    df: DataFrame, key: str, top_k: int = 16, sample_fraction: float | None = 0.01,
    sample_threshold: int = 1_000_000,
) -> list:
    """The top-k hottest keys by count — the salting candidates.

    Hot keys are a frequency question, so a uniform sample answers it: when
    the input exceeds ``sample_threshold`` rows, count over a
    ``sample_fraction`` sample (seeded — deterministic) instead of the full
    table; a key hot enough to need salting is by definition heavily
    represented in any 1% sample.  Pass ``sample_fraction=None`` to force
    the exact full-table count."""
    src = df
    if sample_fraction is not None and df.count() > sample_threshold:
        src = df.sample(fraction=sample_fraction, seed=13)
    rows = src.groupBy(key).count().orderBy(F.desc("count"), F.asc(key)).limit(top_k).collect()
    return [r[key] for r in rows]


def salt_col(df_key: Column, hot_keys: list, n_salt: int, entropy: Column) -> Column:
    """0 for cold keys; pmod(hash(entropy), n_salt) for hot ones."""
    is_hot = df_key.isin(*hot_keys) if hot_keys else F.lit(False)
    return F.when(is_hot, F.pmod(F.xxhash64(entropy), F.lit(n_salt))).otherwise(F.lit(0))


def salted_count(df: DataFrame, key: str, entropy: str, hot_keys: list | None = None,
                 n_salt: int = 8) -> DataFrame:
    """groupBy(key).count() with two-phase aggregation on salted hot keys:
    phase 1 aggregates (key, salt), phase 2 merges salts — the hot key's
    work spreads over ``n_salt`` reducers instead of one."""
    hot_keys = top_hot_keys(df, key) if hot_keys is None else hot_keys
    salted = df.withColumn("_salt", salt_col(F.col(key), hot_keys, n_salt, F.col(entropy)))
    phase1 = salted.groupBy(key, "_salt").agg(F.count("*").alias("n_part"))
    return phase1.groupBy(key).agg(F.sum("n_part").alias("n"))


def replicate_broadcast_join(fact: DataFrame, dim: DataFrame, key: str,
                             hot_keys: list, n_salt: int, entropy: str) -> DataFrame:
    """Skewed equi-join without AQE: the dim side's hot rows are replicated
    n_salt times with explicit salts; fact rows pick a salt from entropy.
    (With a broadcastable dim, plain F.broadcast is simpler — this is the
    pattern for when BOTH sides shuffle.)"""
    dim_salted = dim.withColumn(
        "_salt",
        F.explode(
            F.when(F.col(key).isin(*hot_keys), F.sequence(F.lit(0), F.lit(n_salt - 1)))
            .otherwise(F.array(F.lit(0)))
        ),
    )
    fact_salted = fact.withColumn("_salt", salt_col(F.col(key), hot_keys, n_salt, F.col(entropy)))
    return fact_salted.join(dim_salted, [key, "_salt"]).drop("_salt")
