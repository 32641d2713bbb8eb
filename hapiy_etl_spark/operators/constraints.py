"""Write-path constraint enforcement: validate rows against declared
checks, split passing rows from quarantined ones (with per-row reasons),
and gate TxTable appends on the result.

The reference trusts its upstream schema entirely (fixed record type,
`git_etl.ts:17-22`, no validation); the target surface needs the ETL
standard instead: CHECK/NOT-NULL-style rules enforced AT WRITE TIME,
with the production-grade failure mode — quarantine the violating rows
(with machine-readable reasons) and land the clean ones, so one bad
upstream record cannot stall a 100 TB ingest, and nothing is silently
dropped.

Semantics: a check is a SQL boolean expression; a row FAILS it only
when the expression is FALSE. NULL (unknown) passes, exactly like ANSI
SQL CHECK constraints — null-rejection must be declared explicitly
(``col IS NOT NULL``), which keeps the rule set composable: a range
check on a nullable column does not double as a null check.

Everything is column algebra over one projection — map-only, no
shuffle, whole-stage codegen; the split is two filters over the same
flagged frame.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VIOLATIONS_COL = "__violations"


@dataclass(frozen=True)
class Check:
    name: str
    expr: str  # SQL boolean; FALSE = violation, NULL = pass (ANSI CHECK)


def flag_violations(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Append an array column of failed-check names (empty = clean)."""
    flags = [
        F.when(~F.coalesce(F.expr(c.expr), F.lit(True)), F.lit(c.name))
        for c in checks
    ]
    return df.withColumn(VIOLATIONS_COL, F.array_compact(F.array(*flags)))


def validate_split(
    df: DataFrame, checks: Sequence[Check]
) -> tuple[DataFrame, DataFrame]:
    """(clean_rows, quarantined_rows): clean rows carry the original
    schema; quarantined rows keep every column plus the sorted
    violation-name array in ``__violations``."""
    flagged = flag_violations(df, checks)
    clean = flagged.where(F.size(VIOLATIONS_COL) == 0).drop(VIOLATIONS_COL)
    quarantined = flagged.where(F.size(VIOLATIONS_COL) > 0).withColumn(
        VIOLATIONS_COL, F.sort_array(VIOLATIONS_COL)
    )
    return clean, quarantined


def checked_append(
    table,
    df: DataFrame,
    checks: Sequence[Check],
    quarantine_table=None,
    mode: str = "quarantine",
) -> dict:
    """Constraint-gated TxTable append.

    ``mode="fail"``: any violation aborts BEFORE any write (the strict
    CHECK-constraint contract). ``mode="quarantine"``: clean rows land
    in ``table``, violating rows (with reasons) land in
    ``quarantine_table`` — both as ordinary commits, so the quarantine
    is itself queryable, versioned, and replayable. Returns
    {"appended": n, "quarantined": n}.
    """
    if mode not in ("fail", "quarantine"):
        raise ValueError(f"unknown mode: {mode}")
    # Persist the flagged frame: counts and both appends otherwise each
    # re-execute the full scan + check expressions (3-4 passes over the
    # write path this module exists for). One materialization serves
    # everything.
    flagged = flag_violations(df, checks).persist()
    try:
        from pyspark.sql import functions as F

        n_total = flagged.count()
        bad = flagged.where(F.size(VIOLATIONS_COL) > 0).withColumn(
            VIOLATIONS_COL, F.sort_array(VIOLATIONS_COL)
        )
        clean = flagged.where(F.size(VIOLATIONS_COL) == 0).drop(VIOLATIONS_COL)
        n_bad = bad.count()
        n_clean = n_total - n_bad
        if mode == "fail":
            if n_bad:
                sample = [
                    (r[VIOLATIONS_COL]) for r in bad.select(VIOLATIONS_COL).head(3)
                ]
                raise ValueError(
                    f"checked_append: {n_bad} row(s) violate constraints "
                    f"(e.g. {sample}); nothing was written"
                )
            table.append(clean)
            return {"appended": n_clean, "quarantined": 0}
        if n_bad and quarantine_table is None:
            raise ValueError("mode='quarantine' requires quarantine_table")
        if n_clean:
            table.append(clean)
        if n_bad:
            quarantine_table.append(bad)
        return {"appended": n_clean, "quarantined": n_bad}
    finally:
        flagged.unpersist()
