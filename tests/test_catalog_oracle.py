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


def test_oracles_are_fully_rendered_sql():
    """Builder-generated oracles (e.g. the time-decay gate
    interpolation) must leave no template tokens behind — an
    unrendered __TOKEN__ would surface as a cryptic DuckDB parse
    error in the driver's gate instead of a test failure here."""
    for name, sql in ORACLES.items():
        assert isinstance(sql, str) and sql.strip(), name
        assert "__" not in sql, f"{name}: unrendered template token"
