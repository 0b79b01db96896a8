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


def test_driver_window_spends_budget_on_flagships():
    """The driver's oracle gate checks exactly the first 50 registered
    queries; the priority reorder must put the 44 core queries plus the
    six oracled LLM-pipeline flagships inside that window."""
    from gather_datawarehouse_sync_spark.queries import _PRIORITY

    first_50 = list(REGISTRY)[:50]
    assert first_50 == list(_PRIORITY)
    assert len(first_50) == 50
    # every windowed query must carry a real DuckDB oracle (hash check),
    # not a rows-only fallback
    for name in first_50:
        assert REGISTRY[name].oracle is not None, f"{name} is rows-only"


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spec = REGISTRY[name]
    df = spec.spark(spark, sf_dir)
    # driver hash contract: DecimalType renders differently per engine,
    # so no final result schema may contain it (nested included)
    assert "decimal" not in df.schema.simpleString(), (
        f"{name}: DecimalType in result schema — cast the final column "
        "to DOUBLE/BIGINT in both dialects"
    )
    if spec.oracle is None:
        rows = df.limit(5).collect()
        assert df.columns, f"{name}: no columns"
        _ = rows  # runs without error is the (weaker) bar
        return
    problems = compare(df, duck, spec.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)
