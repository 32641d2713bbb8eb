"""Registry integrity: every module imports, every query has unique
name, oracles reference only pre-registered tables."""

from __future__ import annotations

import re

from hapiy_etl_spark.io import TABLES
from hapiy_etl_spark.queries import IMPORT_ERRORS
from hapiy_etl_spark.registry import all_queries


def test_no_module_import_errors():
    assert IMPORT_ERRORS == {}, f"query modules failed to import: {IMPORT_ERRORS}"


def test_oracles_reference_known_tables_only():
    known = set(TABLES)
    for q in all_queries().values():
        if not q.oracle:
            continue
        # crude FROM/JOIN table extraction; CTE names get defined inline
        # CTE names, incl. recursive form with a column list: name(a, b) AS (
        ctes = set(re.findall(r"(\w+)\s*(?:\([^)]*\))?\s+AS\s*\(", q.oracle, re.IGNORECASE))
        refs = re.findall(r"(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)", q.oracle, re.IGNORECASE)
        for r in refs:
            if r.lower() in {"lateral", "unnest", "range", "generate_series"}:
                continue
            assert r in known or r in ctes, f"{q.name}: oracle references unknown table {r!r}"


def test_query_count_floor():
    qs = all_queries()
    assert len(qs) >= 80, f"registry shrank: {len(qs)}"
    with_oracle = sum(1 for q in qs.values() if q.oracle)
    assert with_oracle >= 69, f"oracle coverage shrank: {with_oracle}"
