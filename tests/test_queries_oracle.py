"""Oracle-differential test: every registry query with a DuckDB oracle
must match it (row count + sorted columns + normalized values).
Queries without an oracle just need to run and return a stable schema."""

from __future__ import annotations

import pytest

from gather_datawarehouse_sync_spark.queries import REGISTRY
from tests.oracle import compare, duck_connection


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spec = REGISTRY[name]
    df = spec.spark(spark, sf_dir)
    if spec.oracle is None:
        rows = df.limit(5).collect()
        assert df.columns, f"{name}: no columns"
        _ = rows  # runs without error is the (weaker) bar
        return
    problems = compare(df, duck, spec.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)
