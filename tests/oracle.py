"""Local oracle-differential harness mirroring the driver's compare:
run the Spark query and the DuckDB SQL on the same parquet, sort columns
by name, compare row count + normalized values (order-insensitive)."""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math
import os

import duckdb


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, _decimal.Decimal):
        # The driver's hash normalizer renders Decimals differently per
        # engine (round-1 lesson: 7 hash failures, values identical), so
        # final result schemas must not contain DECIMAL in either dialect.
        # Failing here keeps local green predictive of driver green.
        raise AssertionError(
            "DecimalType value in a final result — cast the final column "
            "to DOUBLE (or an integer type) in both dialects"
        )
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="seconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def normalize_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [columns[i] for i in order], out


def compare(spark_df, duck_con, duck_sql: str):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = duck_con.execute(duck_sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    sc, sr = normalize_rows(s_cols, s_rows)
    dc, dr = normalize_rows(d_cols, d_rows)
    problems = []
    if sc != dc:
        problems.append(f"columns differ: spark={sc} duck={dc}")
    if len(sr) != len(dr):
        problems.append(f"row counts differ: spark={len(sr)} duck={len(dr)}")
    if not problems and sr != dr:
        for i, (a, b) in enumerate(zip(sr, dr)):
            if a != b:
                problems.append(f"first diff at row {i}: spark={a} duck={b}")
                break
    return problems
