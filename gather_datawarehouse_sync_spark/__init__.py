"""gather_datawarehouse_sync_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference engine
``geoforms-lab/gather-datawarehouse-sync`` (a Node.js filesystem→warehouse
sync tool, see ``/root/reference/src/DataWarehouse.js``) as an idiomatic
Apache Spark application:

- all relational operators (scan/filter/join/dedup/agg/sort/set ops) are
  declared with the DataFrame / Spark SQL API so Catalyst + Tungsten own
  the physical plan (predicate pushdown, broadcast vs sort-merge joins,
  whole-stage codegen, AQE);
- the reference's bespoke semantics (cascading-key join, greedy one-to-one
  assignment, duplicate marking, path-hierarchy dimension, CDC-style
  reconcile) are thin compositions of those primitives in ``operators/``;
- streaming ingestion uses Structured Streaming (``streaming/``);
- LLM-data-pipeline extensions (fuzzy dedup, vector similarity, text
  analysis, multimodal columns) live in ``operators/`` + ``functions/``.

Nothing here is a translation of the reference's JavaScript; reference
file:line citations in docstrings identify the *semantics* being matched.
"""

__version__ = "0.1.0"

from gather_datawarehouse_sync_spark.session import get_spark, load_tables  # noqa: F401
