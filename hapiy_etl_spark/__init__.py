"""hapiy_etl_spark — a PySpark-native analytics/ETL engine.

Re-expresses the capabilities of the reference incremental ETL
(nakennedy11/hapiy-etl, surveyed in SURVEY.md) Spark-first, plus the full
relational operator surface and LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns) required by the
build target. Everything is DataFrame/SQL-declarative so Catalyst +
Tungsten + AQE pick the physical strategy; Pandas UDFs only where the
built-ins genuinely can't express the semantics.
"""

__version__ = "0.1.0"

from hapiy_etl_spark.io import TABLES, load_tables, read_table  # noqa: F401
from hapiy_etl_spark.session import get_spark, tune_session  # noqa: F401
