"""Multimodal-column queries: binary payload + typed metadata plumbing
(build target north star — decode stage stubbed, Spark plumbing real).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hapiy_etl_spark.io import load_tables
from hapiy_etl_spark.operators.multimodal import (
    attach_binary_payload,
    decode_image_features,
    frame_sample_plan,
)
from hapiy_etl_spark.registry import register


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS payload_sha256,
           'image' AS kind
    FROM documents
    ORDER BY doc_id
    """,
    doc="Multimodal column convention: opaque BINARY payload + typed "
    "metadata struct; metadata-only query never touches payload pages "
    "(parquet column pruning).",
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    with_payload = attach_binary_payload(t["documents"], "text")
    return with_payload.select(
        "doc_id",
        F.col("media.n_bytes").alias("n_bytes"),
        F.col("media.sha256").alias("payload_sha256"),
        F.col("media.kind").alias("kind"),
    ).orderBy("doc_id")


@register(
    "multimodal_decode_features",
    oracle="""
    SELECT doc_id,
           CAST(64 + ('0x' || substr(sha256(text), 1, 2))::INT % 192
                AS INTEGER) AS width,
           CAST(64 + ('0x' || substr(sha256(text), 3, 2))::INT % 192
                AS INTEGER) AS height,
           ROUND(('0x' || substr(sha256(text), 5, 2))::INT / 255.0, 6)
               AS mean_luma
    FROM documents
    ORDER BY doc_id
    """,
    doc="Arrow-batched image decode via mapInPandas (decoder stubbed "
    "deterministically — real libs absent in this container; swap "
    "_fake_decode for PIL in production). The stub derives features "
    "from sha256 bytes of the payload, which IS SQL-expressible, so "
    "the whole mapInPandas pipeline — payload attach, Arrow batching, "
    "schema, ordering — gets a full value-level oracle instead of a "
    "rows-only check.",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    with_payload = attach_binary_payload(t["documents"], "text")
    return decode_image_features(with_payload, "doc_id").orderBy("doc_id")


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           unnest(range(0, (octet_length(encode(text)) % 100 + 1)::BIGINT, 10)) AS frame_idx,
           sha256(text) AS payload_sha256
    FROM documents
    ORDER BY doc_id, frame_idx
    """,
    doc="Video frame-sampling plumbing: frames-per-payload derived from "
    "metadata, exploded to one row per sampled frame — the plan never "
    "decodes to know its cardinality.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    with_payload = attach_binary_payload(t["documents"], "text")
    return frame_sample_plan(with_payload, every_n=10, id_col="doc_id").orderBy(
        "doc_id", "frame_idx"
    )
