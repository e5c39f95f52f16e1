#!/usr/bin/env python
"""End-to-end training-data curation pipeline — every stage is an
engine operator composed the way a real pretraining run would chain
them:

    load documents
      → exact dedup (content fingerprints)
      → near-dup removal (MinHash-LSH → connected components)
      → quality + language filter
      → DSIR target-likeness scoring
      → token counting + packing into training sequences
      → fixed-byte shard plan
      → export one parquet dataset

Run: ``python examples/curation_pipeline.py [sf_dir] [out_dir]``
(defaults: /root/testdata/sf0.001, /tmp/curation_demo). Smoke-tested
by tests/test_examples.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str, out_dir: str) -> dict:
    from pyspark.sql import functions as F

    from transformers_spark.exports import export_data
    from transformers_spark.operators.curation import dsir_weights, pack_sequences
    from transformers_spark.operators.dedup import (
        DEMO_BANDS,
        DEMO_NUM_PERM,
        exact_dedup_groups,
        minhash_lsh_pairs,
    )
    from transformers_spark.operators.graph import connected_components
    from transformers_spark.operators.text import lang_exprs, quality_expr, tokens
    from transformers_spark.session import get_spark
    from transformers_spark.sources.testdata import load_table

    spark = get_spark(app_name="curation-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    n_input = docs.count()

    # 1. exact dedup: keep each content fingerprint's representative
    keep_exact = exact_dedup_groups(docs).select(
        F.col("keep_id").alias("doc_id")
    )
    docs = docs.join(keep_exact, "doc_id", "left_semi")

    # 2. near-dup removal: LSH candidates -> components -> keep the
    #    component representative (min id)
    pairs = minhash_lsh_pairs(
        docs, num_perm=DEMO_NUM_PERM, bands=DEMO_BANDS
    ).filter(F.col("matching_bands") >= 2)
    dup_ids = (
        connected_components(pairs)
        .filter(F.col("vertex") != F.col("component"))
        .select(F.col("vertex").alias("doc_id"))
    )
    docs = docs.join(dup_ids, "doc_id", "left_anti")

    # 3. quality + language floor (pure column expressions)
    pred_lang, best_score = lang_exprs(F.col("text"))
    docs = (
        docs.withColumn("quality", quality_expr(F.col("text")))
        .withColumn("predicted_lang", pred_lang)
        .filter((F.col("quality") >= 0.5) & (best_score >= 1))
    )

    # 4. DSIR target-likeness (target = English) — a downstream mixer
    #    would resample on this; here it rides along as a column
    scores = dsir_weights(docs, F.col("lang") == "en").withColumnRenamed(
        "doc", "doc_id"
    )
    docs = docs.join(scores.select("doc_id", "dsir_score"), "doc_id", "left")

    # 5. token counts -> 512-token sequence packing
    counted = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).alias("n_tokens")
    )
    packed = pack_sequences(counted, seq_len=512)

    # 6. fixed-byte shard plan for the export layout
    sharded = pack_sequences(
        docs.select("doc_id", F.col("n_chars").cast("bigint").alias("n_bytes")),
        seq_len=65536,
        count_col="n_bytes",
    ).select("doc_id", F.col("seq_id").alias("shard_id"))

    # 7. one curated parquet dataset
    final = (
        docs.join(packed.select("doc_id", "seq_id", "seq_offset"), "doc_id")
        .join(sharded, "doc_id")
        .select(
            "doc_id", "source", "lang", "predicted_lang", "quality",
            "dsir_score", "n_chars", "seq_id", "seq_offset", "shard_id", "text",
        )
    )
    export_data(final, out_dir, fmt="parquet", overwrite=True)
    n_out = spark.read.parquet(out_dir).count()
    # release the intermediates the operators persisted (packing
    # cumsum frames, DSIR occurrence table) — the export materialized
    # everything, so nothing needs to stay pinned
    from transformers_spark import cache

    cache.release()
    stats = {"input_docs": n_input, "curated_docs": n_out}
    print(stats)
    return stats


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curation_demo"
    main(sf, out)
