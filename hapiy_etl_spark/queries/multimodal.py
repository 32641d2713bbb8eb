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
    oracle=None,  # decode is a Python (Arrow-batched) stage — not SQL;
    # determinism + batch shape tested in tests/test_llm.py
    doc="Arrow-batched image decode via mapInPandas (decoder stubbed "
    "deterministically — real libs absent in this container).",
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
