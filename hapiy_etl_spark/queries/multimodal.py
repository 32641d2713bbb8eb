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
    phash_near_dup_pairs,
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


@register(
    "multimodal_payload_dedup",
    oracle="""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        -- re-ingested slice: the exact-duplicate payloads a second
        -- crawl/upload pass lands (every 7th doc, offset ids)
        SELECT doc_id + 100000 AS doc_id, text FROM documents
        WHERE doc_id % 7 = 0
    )
    SELECT sha256(text) AS payload_sha256,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS canonical_id,
           STRING_AGG(doc_id, ',' ORDER BY doc_id) AS member_ids
    FROM corpus
    GROUP BY sha256(text)
    HAVING COUNT(*) > 1
    ORDER BY payload_sha256
    """,
    doc="Exact multimodal dedup — the exact-regime [O] twin of "
    "multimodal_phash_neardup (same pattern as the ANN exact-regime "
    "twins): group binary payloads by their media.sha256 digest over a "
    "corpus with a planted re-ingested slice, keep groups with >1 "
    "copy, pick min-id canonical. The digest is 32 bytes, so the "
    "shuffle carries digests + ids, never payloads — byte-identical "
    "media dedup at 100 TB is a 16-byte-per-row problem.",
)
def multimodal_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"].select("doc_id", "text")
    corpus = docs.unionAll(
        docs.where(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    wp = attach_binary_payload(corpus, "text")
    return (
        wp.groupBy(F.col("media.sha256").alias("payload_sha256"))
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("canonical_id"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("member_ids"),
        )
        .where(F.col("n_copies") > 1)
        .orderBy("payload_sha256")
    )


@register(
    "multimodal_phash_neardup",
    doc="Perceptual near-dedup over binary payloads (rows-only: the "
    "byte-grid dHash is not SQL-expressible; its exact-regime [O] twin "
    "is multimodal_payload_dedup): dHash signatures — downsample the "
    "payload to an 8x9 luma grid (decode stage stubbed as bytes-as-"
    "luma; resample + gradient bits real), one bit per adjacent-cell "
    "gradient — banded by the Manku block scheme shared with text "
    "SimHash (dedup.signature_band_pairs): recall 1.0 for hamming <= 3 "
    "by pigeonhole, equi-join candidates only, never all-pairs. The "
    "corpus plants same-length perturbed twins (4-byte in-place "
    "overlay on docs >= 300 chars, offset ids) — a handful of changed "
    "bytes moves a couple of grid cells, so planted pairs sit at small "
    "hamming while unrelated payloads sit near 32 (random-sign "
    "gradients).",
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"].select("doc_id", "text")
    planted = docs.where(
        (F.col("doc_id") % 9 == 0) & (F.length("text") >= 300)
    ).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.overlay(F.col("text"), F.lit("XXXX"), 17).alias("text"),
    )
    corpus = attach_binary_payload(docs.unionAll(planted), "text")
    return phash_near_dup_pairs(corpus, "doc_id", max_hamming=3).orderBy(
        "id_a", "id_b"
    )
