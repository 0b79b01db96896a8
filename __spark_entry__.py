"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H Q1 shape, SURVEY §2.6 Q18) on
sf0.001.  ``queries()`` / ``oracle_sql()`` — the full declared-query
registry from ``gather_datawarehouse_sync_spark.queries`` (SURVEY §2,
Q1-Q44 + extension ops).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# Python WORKERS must also import the package: they resolve imports from
# PYTHONPATH, not the driver's sys.path, so when this module is loaded
# by file path from outside the repo cwd (the driver contract) a
# worker-side kernel would otherwise fail with ModuleNotFoundError.
# Setting the env var BEFORE the SparkSession/JVM starts propagates it
# to every spawned worker; if a JVM already runs with the repo on its
# path (the in-repo case), this is a no-op.
if _REPO not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _REPO + os.pathsep + os.environ["PYTHONPATH"]
        if os.environ.get("PYTHONPATH")
        else _REPO
    )

from gather_datawarehouse_sync_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.REGISTRY["q18"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL for every hash-comparable query."""
    return _q.oracle_sql()
