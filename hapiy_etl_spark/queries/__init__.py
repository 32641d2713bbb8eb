"""Named query modules. Importing this package registers every query."""

from hapiy_etl_spark.queries import (  # noqa: F401
    aggregates,
    events,
    multimodal,
    relational,
    scalar,
    subqueries,
    text,
    udf,
    vectors,
    windows,
)
