"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its DuckDB oracle SQL over the same
parquet, then compares row-count + column names + order-insensitive
normalized values — the same gate CORRECTNESS_r{N}.json records, so any
mismatch is caught here first.
"""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter
from decimal import Decimal

import duckdb

from hapiy_etl_spark.io import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        f = float(v)
        return ("num", round(f, 6))
    if isinstance(v, float):
        if math.isnan(v):
            return ("num", "nan")
        return ("num", round(v, 6))
    if isinstance(v, int):
        return ("num", round(float(v), 6))
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        # DuckDB structs arrive as dicts; Spark Rows as tuples. Normalize
        # both to key-sorted value tuples (Spark side relies on struct
        # fields already being declared in sorted order).
        return tuple(_norm(val) for _k, val in sorted(v.items()))
    if isinstance(v, bytes):
        return v.hex()
    return v


def _rows_to_multiset(cols: list[str], rows: list[tuple]) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


def compare(spark, query, sf_dir: str) -> None:
    """Assert Spark result == DuckDB oracle result for one Query."""
    sdf = query.fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_conn(sf_dir)
    try:
        res = con.execute(query.oracle)
        d_cols = [c[0] for c in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{query.name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), f"{query.name}: rowcount spark={len(s_rows)} duckdb={len(d_rows)}"
    s_ms = _rows_to_multiset(s_cols, s_rows)
    d_ms = _rows_to_multiset(d_cols, d_rows)
    if s_ms != d_ms:
        only_s = list((s_ms - d_ms).items())[:5]
        only_d = list((d_ms - s_ms).items())[:5]
        raise AssertionError(
            f"{query.name}: value mismatch\n only-in-spark: {only_s}\n only-in-duckdb: {only_d}"
        )
