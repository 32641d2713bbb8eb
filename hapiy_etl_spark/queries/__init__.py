"""Named query modules. Importing this package registers every query.

Imports are per-module guarded: a single broken module (e.g. an API
drift in one operator family) costs that family's queries, not the
whole driver contract. Failures are printed loudly — tests import this
package, so CI still sees them.
"""

import importlib
import sys

_MODULES = (
    "aggregates",
    "events",
    "graph",
    "multimodal",
    "relational",
    "scalar",
    "stats",
    "subqueries",
    "text",
    "tpch_more",
    "udf",
    "vectors",
    "windows",
)

IMPORT_ERRORS: dict[str, Exception] = {}

for _m in _MODULES:
    try:
        importlib.import_module(f"hapiy_etl_spark.queries.{_m}")
    except Exception as _ex:  # pragma: no cover - defensive
        IMPORT_ERRORS[_m] = _ex
        print(f"hapiy_etl_spark.queries.{_m} failed to import: {_ex!r}", file=sys.stderr)
