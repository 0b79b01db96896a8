"""Local oracle-differential harness mirroring the driver's compare:
run the Spark query and the DuckDB SQL on the same parquet, sort columns
by name, compare row count + normalized values (order-insensitive)."""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math
import os

import duckdb
import pyarrow as pa


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


def arrow_decimal_columns(schema: "pa.Schema") -> list:
    """Column names whose arrow type is (or contains) a decimal.

    The driver hashes oracle results through arrow, where DuckDB's
    HUGEINT (e.g. an uncast window ``SUM(BIGINT)``) surfaces as
    ``decimal128(38,0)`` and renders differently from Spark's BIGINT.
    ``.fetchall()`` int-converts HUGEINT, so the Decimal value guard in
    ``_norm`` can never fire on it — this schema check is the tripwire
    that catches the class (the r16 x_pack_chunks failure mode).
    """

    def has_decimal(t: "pa.DataType") -> bool:
        if pa.types.is_decimal(t):
            return True
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            return has_decimal(t.value_type)
        if pa.types.is_struct(t):
            return any(has_decimal(f.type) for f in t)
        if pa.types.is_map(t):
            return has_decimal(t.key_type) or has_decimal(t.item_type)
        return False

    return [f.name for f in schema if has_decimal(f.type)]


def compare(spark_df, duck_con, duck_sql: str):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    # Fetch through arrow — the driver's hash path — so HUGEINT/DECIMAL
    # oracle columns fail here instead of only on the driver.
    tbl = duck_con.execute(duck_sql).fetch_arrow_table()
    dec_cols = arrow_decimal_columns(tbl.schema)
    if dec_cols:
        return [
            "oracle arrow schema has decimal column(s) "
            f"{dec_cols} — CAST to BIGINT/DOUBLE in the SQL "
            "(uncast window SUM? HUGEINT literal arithmetic?)"
        ]
    d_cols = tbl.column_names
    d_rows = list(zip(*(c.to_pylist() for c in tbl.columns))) if tbl.num_rows else []
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
