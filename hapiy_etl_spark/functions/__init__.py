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


def srp_matrix(k: int, d: int) -> list[list[float]]:
    """Deterministic ±1 sign matrix for sparse-random-projection /
    Johnson-Lindenstrauss: sign(r, j) = +1 when the first hex nibble of
    md5("r:j") is < 8. Derived from a hash, not an RNG, so every engine,
    rerun, and oracle twin materializes the identical matrix — it is a
    shared CONSTANT (like a stopword list), broadcast into codegen on
    the Spark side and inlined as literals into the DuckDB SQL."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{r}:{j}".encode()).hexdigest()[0], 16) < 8 else -1.0
            for j in range(d)
        ]
        for r in range(k)
    ]


def srp_row_sql(row: list[float]) -> str:
    """One projection row as a DuckDB DOUBLE[] literal."""
    return "[" + ", ".join(f"{v:.1f}" for v in row) + "]::DOUBLE[]"


SIGN_BITS = 8  # 256 buckets; bump for denser corpora


def sign_bucket(col: Column | str, bits: int = SIGN_BITS) -> Column:
    """Deterministic sign-bucket LSH key for an embedding column: one
    bit per leading dimension (1 when the component is > 0), packed
    little-endian into an int — the 0-probe hyperplane-LSH special
    case. Identical on any engine (pure comparisons, no hashing of
    floats beyond their sign), so bucket assignments stored in an
    index replay exactly in a DuckDB twin (sign_bucket_sql)."""
    c = F.col(col) if isinstance(col, str) else col
    bucket = F.lit(0)
    for i in range(bits):
        bucket = bucket + F.when(
            F.element_at(c, i + 1) > 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
    return bucket


def sign_bucket_sql(col: str, bits: int = SIGN_BITS) -> str:
    """DuckDB twin of sign_bucket — same bit order, same strict-> 0
    comparison (a 0.0 or NULL component contributes 0 in both)."""
    return (
        "("
        + " + ".join(
            f"CASE WHEN {col}[{i + 1}] > 0 THEN {1 << i} ELSE 0 END"
            for i in range(bits)
        )
        + ")"
    )
