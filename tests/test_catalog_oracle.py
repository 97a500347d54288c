"""Every catalog query must hash-match its DuckDB oracle (the driver's
correctness gate, replicated at sf0.001 for speed — the driver runs
sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tools.check_oracle import compare, duck_connection

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connection(sf_dir)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert len(df.columns) > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        pytest.skip(f"{name}: rows-only check (no oracle)")
    ddf = duck.sql(ORACLES[name]).df()
    issues = compare(name, sdf, ddf)
    assert not issues, f"{name}: {issues}"
