"""Engine-portable column kernels shared across query modules.

One definition per kernel, in BOTH dialects (a Spark Column builder and
a DuckDB SQL template), so the cross-engine determinism contract lives
in exactly one place — a tweak that touches only one copy is the bug
class this module removes (three hand-expanded copies of the md5
uniform had already diverged into stats.py / text.py / udf.py before it
was factored here).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_uniform(col: Column) -> Column:
    """Deterministic per-row uniform in (0, 1]: md5 of the value's
    string form, first 14 hex digits -> bigint -> modular residue.
    Identical on any engine, partitioning, or rerun — the portable
    replacement for rand(seed) wherever a sampling decision must be
    reproducible AND oracle-checkable. Never exactly 0 (the +1 shift),
    so `u < p` keeps nothing at p=0 and everything at p=1.
    """
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 14), 16, 10).cast("long")
        % 1000000
        + 1
    ) / 1000001.0


# DuckDB twin — .format(col=<sql expression>); semantics must track
# md5_uniform() exactly (same prefix width, modulus, and shift).
MD5_UNIFORM_SQL = (
    "((('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 14))::BIGINT "
    "% 1000000 + 1) / 1000001.0)"
)
