"""Library operators that compose Spark built-ins into semantics Spark
lacks natively (SURVEY.md §4.3): keyed upsert, as-of join, persisted
batch watermark, dedup family, similarity search, text stats,
multimodal column conventions."""

from hapiy_etl_spark.operators.asof import asof_join  # noqa: F401
from hapiy_etl_spark.operators.upsert import dedup_by_key, upsert_by_key  # noqa: F401
from hapiy_etl_spark.operators.watermark import WatermarkStore  # noqa: F401
