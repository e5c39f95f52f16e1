"""Self-check for the multimodal Arrow kernels (VERDICT r1 item 5).

The multimodal catalog queries are rows-only in the driver gate (binary
decode isn't SQL-expressible), so this test supplies the missing
correctness evidence: decode the SAME payload bytes the catalog queries
feed through ``mapInPandas`` with a plain driver-side Python reference,
and assert exact per-row feature equality for all three kernels
(decode_image_features, decode_audio_features, resize_images —
operators/multimodal.py). Any drift in the Arrow batch plumbing
(dtype coercion, null handling, batch splitting) breaks equality.
"""

import hashlib

from pyspark.sql import functions as F

from transformers_spark.operators.multimodal import (
    decode_audio_features,
    decode_image_features,
    fake_audio_decoder,
    fake_image_decoder,
    fake_resizer,
    resize_images,
)

SF_DIR = "/root/testdata/sf0.001"
SAMPLE_N = 80


def _media_frame(spark):
    """Same construction as q_multimodal_features/q_multimodal_audio in
    operators/specs.py: documents' text encoded to binary payloads."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return (
        docs.orderBy("doc_id")
        .limit(SAMPLE_N)
        .select(
            F.col("doc_id").cast("string").alias("media_id"),
            F.lit("image").alias("modality"),
            F.lit("application/octet-stream").alias("mime_type"),
            F.encode(F.col("text"), "UTF-8").alias("payload"),
        )
    )


def _reference_payloads(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = docs.orderBy("doc_id").limit(SAMPLE_N).select("doc_id", "text").collect()
    return {str(r["doc_id"]): r["text"].encode("utf-8") for r in rows}


def test_image_features_match_reference_decode(spark):
    media = _media_frame(spark)
    payloads = _reference_payloads(spark)
    got = {r["media_id"]: r.asDict() for r in
           decode_image_features(media, decoder=fake_image_decoder).collect()}
    assert set(got) == set(payloads)
    for mid, payload in payloads.items():
        w, h = fake_image_decoder(payload)
        row = got[mid]
        assert (row["width"], row["height"]) == (w, h), mid
        assert row["n_bytes"] == len(payload), mid
        assert row["content_hash"] == hashlib.md5(payload).hexdigest(), mid


def test_audio_features_match_reference_decode(spark):
    media = _media_frame(spark)
    payloads = _reference_payloads(spark)
    got = {r["media_id"]: r.asDict() for r in
           decode_audio_features(media, decoder=fake_audio_decoder).collect()}
    assert set(got) == set(payloads)
    for mid, payload in payloads.items():
        dur, rate, rms = fake_audio_decoder(payload)
        row = got[mid]
        assert (row["duration_ms"], row["sample_rate"], row["rms_level"]) == (
            dur, rate, rms,
        ), mid
        assert row["n_bytes"] == len(payload), mid


def test_resize_matches_reference_bytes(spark):
    media = _media_frame(spark)
    payloads = _reference_payloads(spark)
    got = {r["media_id"]: r.asDict() for r in
           resize_images(media, target_w=64, target_h=64, resizer=fake_resizer)
           .collect()}
    assert set(got) == set(payloads)
    for mid, payload in payloads.items():
        expected = fake_resizer(payload, 64, 64)
        row = got[mid]
        assert bytes(row["payload"]) == expected, mid
        assert (row["width"], row["height"]) == (64, 64), mid
