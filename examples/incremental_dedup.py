#!/usr/bin/env python
"""Standing-index incremental dedup — the deployment shape for
continuous ingestion: build the LSH index over the corpus ONCE, then
dedup each arriving batch against it without ever re-touching (or
shuffling) the corpus.

Run: ``python examples/incremental_dedup.py [sf_dir]``
(default /root/testdata/sf0.001). Smoke-tested by
tests/test_examples.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from transformers_spark.operators.dedup import (
        DEMO_BANDS,
        DEMO_NUM_PERM,
        probe_lsh_index,
        write_lsh_index,
    )
    from transformers_spark.session import get_spark
    from transformers_spark.sources.testdata import load_table

    spark = get_spark(app_name="incremental-dedup-demo")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")

    # pretend the last 20% of ids is a newly-arrived batch
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    threshold = (max_id * 4) // 5
    corpus = docs.filter(F.col("doc_id") < threshold)
    new_batch = docs.filter(F.col("doc_id") >= threshold)

    spark.sql("CREATE DATABASE IF NOT EXISTS demo_index")
    # hasher="fast" (JVM xxhash64) is the production setting when
    # cross-engine reproducibility isn't needed; the index stamps it
    # in its table properties, so a probe with a mismatched hasher is
    # rejected instead of silently joining incompatible buckets.
    write_lsh_index(
        corpus,
        "demo_index.standing_lsh",
        num_perm=DEMO_NUM_PERM,
        bands=DEMO_BANDS,
        hasher="fast",
    )
    matches = probe_lsh_index(
        spark,
        "demo_index.standing_lsh",
        new_batch,
        num_perm=DEMO_NUM_PERM,
        bands=DEMO_BANDS,
        hasher="fast",
        min_bands=2,
    )
    n_new = new_batch.count()
    dup_ids = matches.select("new_doc").distinct()
    n_dups = dup_ids.count()
    kept = new_batch.join(
        dup_ids.withColumnRenamed("new_doc", "doc_id"), "doc_id", "left_anti"
    )
    stats = {
        "corpus_docs": corpus.count(),
        "new_docs": n_new,
        "near_dups_vs_index": n_dups,
        "kept_after_dedup": kept.count(),
    }
    print(stats)
    return stats


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
