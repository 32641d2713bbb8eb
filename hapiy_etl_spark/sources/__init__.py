"""Custom Spark data sources (Spark 4 Python Data Source API)."""

from hapiy_etl_spark.sources.rest_source import PagedRestDataSource  # noqa: F401
