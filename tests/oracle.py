"""Local replica of the driver's DuckDB-oracle comparison — dtype-strict.

Runs a registered Spark query and its DuckDB oracle SQL over the same
parquet, then compares row-count + column names + an order-insensitive
canonical multiset of values. The driver's canonicalizer is
pandas-based and dtype-sensitive (CORRECTNESS_r01: Decimal-vs-float and
int64-vs-float64 hash-mismatch; ndarray cells crash it outright), so
this harness must be at least as strict:

- no float rounding here — queries must emit hash-stable values
  themselves (round/cast per the registry convention);
- int vs float is a mismatch (``sign()`` dtype seam, r1 ``fn_math``);
- Decimal vs float is a mismatch (r1 ``filter_predicate_algebra``);
- array/map/struct/ndarray output cells are REJECTED for oracle-backed
  queries — serialize them (array_join / to_json) in both twins.
"""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from hapiy_etl_spark.io import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


class UnsafeOutputError(AssertionError):
    """An oracle-backed query emitted a cell the driver cannot hash."""


def _canon(v, col: str):
    """Canonical, dtype-tagged token for one cell.

    Tags make dtype seams visible: ('int', 5) != ('float', 5.0) !=
    ('decimal', '5'). The driver's pandas hash distinguishes them, so we
    must too.
    """
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return None  # NULL and NaN both surface as NaN in pandas float cols
        return ("float", f)
    if isinstance(v, bool) or isinstance(v, np.bool_):
        return ("bool", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("int", int(v))
    if isinstance(v, Decimal):
        return ("decimal", str(v))
    if isinstance(v, (dt.datetime, np.datetime64)):
        if isinstance(v, np.datetime64):
            if np.isnat(v):
                return None
            v = v.astype("datetime64[us]").item()
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("ts", dt.datetime(v.year, v.month, v.day).isoformat())
    if isinstance(v, str):
        return ("str", v)
    if isinstance(v, bytes):
        return ("bytes", v.hex())
    if isinstance(v, (list, tuple, dict, np.ndarray)):
        raise UnsafeOutputError(
            f"column {col!r}: {type(v).__name__} cell — the driver's canonicalizer "
            "cannot hash array/map/struct outputs; serialize with array_join/to_json "
            "in BOTH the Spark query and the oracle SQL"
        )
    raise UnsafeOutputError(f"column {col!r}: unhandled cell type {type(v).__name__}")


def _rows_to_multiset(cols: list[str], rows: list[tuple]) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    return Counter(
        tuple(_canon(r[i], names[j]) for j, i in enumerate(order)) for r in rows
    )


def compare_frames(name: str, s_cols, s_rows, d_cols, d_rows) -> None:
    """Driver-strict comparison of two result sets (column-name sorted)."""
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: rowcount spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    s_ms = _rows_to_multiset(list(s_cols), s_rows)
    d_ms = _rows_to_multiset(list(d_cols), d_rows)
    if s_ms != d_ms:
        only_s = list((s_ms - d_ms).items())[:5]
        only_d = list((d_ms - s_ms).items())[:5]
        raise AssertionError(
            f"{name}: value mismatch\n only-in-spark: {only_s}\n only-in-duckdb: {only_d}"
        )


def _pdf_rows(pdf: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    """Rows out of a pandas frame, PRESERVING pandas dtypes per cell.

    Going through pandas is the point: the driver materializes both
    sides as pandas frames, so dtype coercions that happen only there
    must happen here too. The canonical example (r2's three hash
    failures): DuckDB returns HUGEINT for SUM over integers, and
    ``.df()`` materializes HUGEINT as float64 — ``fetchall()`` would
    have handed us Python ints and hidden the seam.
    """
    cols = list(pdf.columns)
    rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
    return cols, rows


def compare(spark, query, sf_dir: str) -> None:
    """Assert Spark result == DuckDB oracle result for one Query."""
    sdf = query.fn(spark, sf_dir)
    s_cols, s_rows = _pdf_rows(sdf.toPandas())

    con = duckdb_conn(sf_dir)
    try:
        d_cols, d_rows = _pdf_rows(con.execute(query.oracle).df())
    finally:
        con.close()

    compare_frames(query.name, s_cols, s_rows, d_cols, d_rows)
