"""Driver-contract smoke: entry() runs; a sample of queries matches the
DuckDB oracles at sf0.001 (the full sweep lives in tools/check_oracles.py
and runs at sf0.01 in the driver)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _match(spark, duck, name):
    spdf = entry.queries()[name](spark, SF_DIR).toPandas()
    opdf = duck.sql(entry.oracle_sql()[name]).df()
    cols = sorted(spdf.columns)
    assert cols == sorted(opdf.columns)
    assert len(spdf) == len(opdf)
    s = sorted(map(tuple, spdf[cols].map(_norm).itertuples(index=False)))
    o = sorted(map(tuple, opdf[cols].map(_norm).itertuples(index=False)))
    assert s == o, f"{name}: first diff {next((a, b) for a, b in zip(s, o) if a != b)}"


def test_entry_smoke(spark):
    out = entry.entry(spark)
    assert out.count() > 0
    assert set(out.columns) == {"url", "cell_key", "cell_id", "region_ids"}


@pytest.mark.parametrize(
    "name",
    ["pip_region_rows", "pip_region_sets", "cell_assign", "cells_dict", "knn",
     "vector_to_raster", "token_count", "fingerprint", "events_window", "sessionize",
     "pip_antimeridian", "flagship_antimeridian", "refine_fixpoint",
     "cell_repair", "events_window_stream", "stream_first_event"],
)
# stream_region_counts is absent above: its oracle pins the sf0.01 fixture
# goldens (like flagship_page_cells) — covered by tools/check_oracles.py
# at sf0.01, the driver's tier
def test_oracle_match(spark, duck, name):
    _match(spark, duck, name)


def test_session_caches_registered_and_clearable(spark):
    """Per-session engine caches are registered with the session module and
    empty out on clear_session_caches (the stop_spark hook) — a process
    cycling many sessions does not accumulate dead broadcasts; rebuilding
    afterwards works."""
    from libosmtools_spark import session as S

    entry._engine(spark)
    entry._antim_engine(spark)
    assert entry._ENGINE_CACHE and entry._ANTIM_CACHE
    assert any(c is entry._ENGINE_CACHE for c in S._SESSION_CACHES)
    S.clear_session_caches()
    assert not entry._ENGINE_CACHE and not entry._ANTIM_CACHE and not entry._CELLS_CACHE
    entry._engine(spark)  # rebuild after eviction works
    assert len(entry._ENGINE_CACHE) == 1


def test_all_queries_have_unique_names(spark):
    qs = entry.queries()
    assert len(qs) >= 25
    # every oracle key exists in queries
    assert set(entry.oracle_sql()) <= set(qs)


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
