"""Multimodal-column queries: binary payload + typed metadata plumbing
(build target north star — decode stage stubbed, Spark plumbing real).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hapiy_etl_spark.io import load_tables
from hapiy_etl_spark.operators.multimodal import (
    attach_binary_payload,
    audio_near_dup_pairs,
    decode_image_features,
    frame_sample_plan,
    phash_near_dup_pairs,
    video_near_dup_pairs,
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
    "multimodal_frame_dedup",
    oracle="""
    WITH corpus AS (
        SELECT doc_id, text FROM documents WHERE text IS NOT NULL
        UNION ALL
        SELECT doc_id + 100000, text FROM documents
        WHERE text IS NOT NULL AND doc_id % 11 = 0
        UNION ALL
        SELECT doc_id + 200000,
               substr(text, 1, 4) || 'QQQQ' || substr(text, 9)
        FROM documents
        WHERE text IS NOT NULL AND doc_id % 13 = 0 AND length(text) >= 200
    ),
    frames AS (
        SELECT doc_id, fi,
               sha256(substr(text, fi * flen + 1, flen)) AS digest
        FROM (
            SELECT doc_id, text,
                   CAST(ceil(length(text) / 8.0) AS INT) AS flen
            FROM corpus
        ), UNNEST(generate_series(0, 7)) AS t(fi)
        WHERE substr(text, fi * flen + 1, flen) <> ''
    )
    SELECT a.doc_id AS vid_a, b.doc_id AS vid_b,
           COUNT(*) AS n_matching_frames
    FROM frames a
    JOIN frames b ON a.fi = b.fi AND a.digest = b.digest
                 AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 6
    ORDER BY vid_a, vid_b
    """,
    doc="Video-level EXACT frame dedup — the exact-regime [O] twin of "
    "multimodal_video_phash: each payload's byte stream splits into 8 "
    "frame slices (the decode stub for keyframe extraction), frames "
    "digest to 32 bytes, and two videos pair when >= 6 SAME-INDEX "
    "frames are byte-identical. The corpus plants an exact re-upload "
    "slice (8/8 frames match) and a one-frame-corrupted slice (7/8 — "
    "a 4-byte splice inside frame 0). The shuffle carries (frame_idx, "
    "digest) pairs only — at 100 TB video dedup is a digest-join "
    "problem, payload bytes never move.",
)
def multimodal_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"].where(F.col("text").isNotNull()).select(
        "doc_id", "text"
    )
    corrupted = F.concat(
        F.substring("text", 1, 4), F.lit("QQQQ"), F.expr("substring(text, 9)")
    )
    corpus = (
        docs.unionAll(
            docs.where(F.col("doc_id") % 11 == 0).select(
                (F.col("doc_id") + 100000).alias("doc_id"), "text"
            )
        )
        .unionAll(
            docs.where(
                (F.col("doc_id") % 13 == 0) & (F.length("text") >= 200)
            ).select(
                (F.col("doc_id") + 200000).alias("doc_id"),
                corrupted.alias("text"),
            )
        )
    )
    frames = (
        corpus.withColumn(
            "flen", F.ceil(F.length("text") / 8).cast("int")
        )
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(7))).alias("fi"),
            "text",
            "flen",
        )
        .withColumn("frame", F.expr("substring(text, fi * flen + 1, flen)"))
        .where(F.col("frame") != "")
        .select("doc_id", "fi", F.sha2("frame", 256).alias("digest"))
    )
    a = frames.alias("a")
    b = frames.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fi") == F.col("b.fi"))
            & (F.col("a.digest") == F.col("b.digest"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("vid_a"), F.col("b.doc_id").alias("vid_b")
        )
        .agg(F.count("*").alias("n_matching_frames"))
        .where(F.col("n_matching_frames") >= 6)
        .orderBy("vid_a", "vid_b")
    )


@register(
    "multimodal_video_phash",
    doc="Video-level PERCEPTUAL near-dup (rows-only: frame dHash is "
    "not SQL-expressible; exact-regime [O] twin is "
    "multimodal_frame_dedup): every frame slice dHashes, frame "
    "signatures band through the shared Manku kernel with SAME-INDEX "
    "alignment, and two videos pair when >= 6 aligned frames sit "
    "within hamming 3. The planted slice sparsely re-encodes EVERY "
    "frame (q->Q case flips — a few bytes per frame), so exact frame "
    "digests all differ while the perceptual vote still pairs it with "
    "its original — the regime gap this operator exists for. Never "
    "all-pairs: banding equi-joins + one grouped vote "
    "(operators/multimodal.py video_near_dup_pairs).",
)
def multimodal_video_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"].where(F.col("text").isNotNull()).select(
        "doc_id", "text"
    )
    planted = docs.where(
        (F.col("doc_id") % 9 == 0) & (F.length("text") >= 300)
    ).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.translate("text", "q", "Q").alias("text"),
    )
    corpus = attach_binary_payload(docs.unionAll(planted), "text")
    return video_near_dup_pairs(
        corpus, "doc_id", n_frames=8, max_hamming=3, min_matching_frames=6
    ).orderBy("vid_a", "vid_b")


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
    "gradients). (r12 review: this decorator was mis-stacked on "
    "multimodal_frame_dedup, registering the frame query under both "
    "names and leaving this body unreachable — the driver's r12 "
    "rows-only check for this name exercised the wrong plan.)",
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


@register(
    "multimodal_audio_dedup",
    oracle="""
    WITH corpus AS (
        SELECT doc_id, text FROM documents WHERE text IS NOT NULL
        UNION ALL
        -- exact re-upload slice: all 8 windows byte-identical
        SELECT doc_id + 100000, text FROM documents
        WHERE text IS NOT NULL AND doc_id % 10 = 0
        UNION ALL
        -- tail-corrupted slice: a 4-byte splice at the very end lands
        -- entirely in window 7, so exactly 7/8 windows still match
        SELECT doc_id + 200000,
               substr(text, 1, length(text) - 4) || 'QQQQ'
        FROM documents
        WHERE text IS NOT NULL AND doc_id % 17 = 0 AND length(text) >= 200
    ),
    windows AS (
        SELECT doc_id, wi,
               sha256(substr(text, wi * wlen + 1, wlen)) AS digest
        FROM (
            SELECT doc_id, text,
                   CAST(ceil(length(text) / 8.0) AS INT) AS wlen
            FROM corpus
        ), UNNEST(generate_series(0, 7)) AS t(wi)
        WHERE substr(text, wi * wlen + 1, wlen) <> ''
    )
    SELECT a.doc_id AS aud_a, b.doc_id AS aud_b,
           COUNT(*) AS n_matching_windows
    FROM windows a
    JOIN windows b ON a.wi = b.wi AND a.digest = b.digest
                  AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 6
    ORDER BY aud_a, aud_b
    """,
    doc="Audio-level EXACT window dedup (r15, VERDICT r14 item 7 — "
    "the audio modality joins the family) — the exact-regime [O] twin "
    "of multimodal_audio_fingerprint, the same alignment+vote "
    "contract multimodal_frame_dedup pins for video: each waveform "
    "payload splits into 8 windows (the codec stub), windows digest "
    "to 32 bytes, and two payloads pair when >= 6 SAME-INDEX windows "
    "are byte-identical. The corpus plants an exact re-upload slice "
    "(8/8 windows) and a tail-corrupted slice (a 4-byte splice in the "
    "final window — 7/8). The shuffle carries (window_idx, digest) "
    "pairs only — at 100 TB audio dedup is a digest-join problem, "
    "waveform bytes never move.",
)
def multimodal_audio_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"].where(F.col("text").isNotNull()).select(
        "doc_id", "text"
    )
    tail_corrupt = F.concat(
        F.expr("substring(text, 1, length(text) - 4)"), F.lit("QQQQ")
    )
    corpus = (
        docs.unionAll(
            docs.where(F.col("doc_id") % 10 == 0).select(
                (F.col("doc_id") + 100000).alias("doc_id"), "text"
            )
        )
        .unionAll(
            docs.where(
                (F.col("doc_id") % 17 == 0) & (F.length("text") >= 200)
            ).select(
                (F.col("doc_id") + 200000).alias("doc_id"),
                tail_corrupt.alias("text"),
            )
        )
    )
    windows = (
        corpus.withColumn(
            "wlen", F.ceil(F.length("text") / 8).cast("int")
        )
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(7))).alias("wi"),
            "text",
            "wlen",
        )
        .withColumn("win", F.expr("substring(text, wi * wlen + 1, wlen)"))
        .where(F.col("win") != "")
        .select("doc_id", "wi", F.sha2("win", 256).alias("digest"))
    )
    a = windows.alias("a")
    b = windows.alias("b")
    return (
        a.join(
            b,
            (F.col("a.wi") == F.col("b.wi"))
            & (F.col("a.digest") == F.col("b.digest"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("aud_a"), F.col("b.doc_id").alias("aud_b")
        )
        .agg(F.count("*").alias("n_matching_windows"))
        .where(F.col("n_matching_windows") >= 6)
        .orderBy("aud_a", "aud_b")
    )


@register(
    "multimodal_audio_fingerprint",
    doc="Audio-level PERCEPTUAL near-dup (r15, rows-only: the "
    "band-energy FFT fingerprint is not SQL-expressible; exact-regime "
    "[O] twin is multimodal_audio_dedup): every waveform window "
    "fingerprints via the Haitsma-Kalker-style band-energy time "
    "gradient (operators/multimodal.py _band_energy_sig — REAL numpy "
    "FFT over the stub-decoded byte waveform), window signatures band "
    "through the shared Manku kernel with SAME-INDEX alignment, and "
    "two payloads pair when >= 6 aligned windows sit within hamming "
    "3. The planted slice sparsely re-encodes EVERY window (z->Z "
    "byte shifts — a few samples per window), so exact window digests "
    "all differ while the perceptual vote still pairs it with its "
    "original (validated on this corpus: all plants vote 8/8) — the "
    "regime gap this operator exists for, now for the audio kind. "
    "Never all-pairs: banding equi-joins + one grouped vote; hot "
    "silence-window buckets drop at key_cap "
    "(operators/multimodal.py audio_near_dup_pairs).",
)
def multimodal_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"].where(F.col("text").isNotNull()).select(
        "doc_id", "text"
    )
    planted = docs.where(
        (F.col("doc_id") % 12 == 0) & (F.length("text") >= 300)
    ).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.translate("text", "z", "Z").alias("text"),
    )
    corpus = attach_binary_payload(
        docs.unionAll(planted), "text", kind="audio", mime="audio/fake"
    )
    return audio_near_dup_pairs(
        corpus, "doc_id", n_windows=8, max_hamming=3, min_matching_windows=6
    ).orderBy("aud_a", "aud_b")
