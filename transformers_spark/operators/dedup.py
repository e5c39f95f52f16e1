"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Designed scale-first:

* **exact**: one hash-groupBy shuffle on a 128-bit content fingerprint
  — the canonical 100 TB dedup pass.
* **minhash_lsh**: shingle → K permuted min-hashes → banded buckets →
  candidate pairs from a bucket self-join. Only docs sharing a band
  bucket ever meet, so the join is |buckets| × small, not n².
  ``max_bucket_size`` caps degenerate buckets (skew guard).
* **ngram_jaccard**: exact Jaccard over word n-grams via an inverted-
  index join; ``max_doc_freq`` drops stop-grams (both a skew guard and
  the standard IDF-ish trick).
* **simhash**: 32-bit weighted bit-vote fingerprint; near-dups =
  fingerprints at small Hamming distance, found via band buckets.

All hashes are md5-derived (operators/hashing.py) so every operator
here is reproducible in the DuckDB oracle — no engine-native hashing
in result-bearing paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import MERSENNE_P, h32, lcg_constants, perm_hash
from .text import doc_fingerprint, tokens

__all__ = [
    "exact_dedup_groups",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
]

DEFAULT_NUM_PERM = 16
DEFAULT_BANDS = 4
SIMHASH_BITS = 32


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Content-identical groups: fingerprint → (representative id,
    duplicate count). Representative = min id (deterministic)."""
    return (
        df.select(F.col(id_col), doc_fingerprint(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def _word_ngrams(toks: Column, n: int) -> Column:
    """Distinct word n-grams as strings (space-joined)."""
    if n == 1:
        return F.array_distinct(toks)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def _exploded_grams(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    toks = tokens(F.col(text_col))
    out = df
    if n > 1:
        out = out.filter(F.size(toks) >= n)  # too-short docs have no n-grams
    return out.select(
        F.col(id_col).alias("doc"),
        F.explode(_word_ngrams(toks, n)).alias("gram"),
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = DEFAULT_NUM_PERM,
    shingle_n: int = 2,
) -> DataFrame:
    """(id, sig_0..sig_{K-1}): min over shingles of K permuted hashes.
    One explode + one groupBy shuffle; the K mins are map-side partial
    aggregates, so the shuffle carries only K longs per doc."""
    grams = _exploded_grams(df, text_col, id_col, shingle_n)
    h = h32(F.col("gram"))
    aggs = [
        F.min(perm_hash(h, a, b)).alias(f"sig_{i}")
        for i, (a, b) in enumerate(lcg_constants(num_perm))
    ]
    return grams.groupBy("doc").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 2,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Candidate near-duplicate pairs (d1 < d2) with the number of
    agreeing bands. Docs pair iff an entire band of their signatures
    matches — the classic LSH S-curve."""
    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle_n)
    band_cols = []
    for band in range(bands):
        members = [F.col(f"sig_{band * rows_per_band + j}") for j in range(rows_per_band)]
        band_cols.append(
            F.struct(
                F.lit(band).alias("band"),
                F.md5(F.concat_ws("-", *members)).alias("bucket"),
            )
        )
    buckets = sigs.select(
        F.col("doc"), F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    # One shuffle groups each bucket's members; oversized buckets
    # (degenerate content, the skew hazard) are dropped wholesale, and
    # each surviving list expands to its (d1 < d2) pairs locally — no
    # bucket self-join, no window pass.
    members = (
        buckets.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list("doc")).alias("docs"))
        .filter(F.size("docs").between(2, max_bucket_size))
    )
    pair_array = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.size("docs") - 2),
            lambda i: F.transform(
                F.slice(F.col("docs"), i + 2, F.size("docs")),
                lambda d2: F.struct(F.col("docs")[i].alias("d1"), d2.alias("d2")),
            ),
        )
    )
    return (
        members.select(F.col("band"), F.explode(pair_array).alias("p"))
        .select("band", F.col("p.d1").alias("d1"), F.col("p.d2").alias("d2"))
        .groupBy("d1", "d2")
        .agg(F.countDistinct("band").alias("matching_bands"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    max_doc_freq: int = 100000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing ≥1 gram.
    Inverted-index join: shuffle keys are grams, so co-grouped docs
    meet locally; ``max_doc_freq`` removes stop-grams that would
    explode the join (skew guard — at 100 TB this cap is mandatory)."""
    grams = _exploded_grams(df, text_col, id_col, n)
    # One shuffle groups each gram's posting list; stop-grams (lists
    # longer than max_doc_freq) are dropped wholesale, then each list
    # expands to its (d1 < d2) pairs locally — no gram self-join, and
    # skew is bounded by construction.
    postings = (
        grams.groupBy("gram")
        .agg(F.sort_array(F.collect_list("doc")).alias("docs"))
        .filter(F.size("docs").between(2, max_doc_freq))
    )
    pair_array = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.size("docs") - 2),
            lambda i: F.transform(
                F.slice(F.col("docs"), i + 2, F.size("docs")),
                lambda d2: F.struct(
                    F.col("docs")[i].alias("doc"), d2.alias("doc2")
                ),
            ),
        )
    )
    shared = (
        postings.select(F.explode(pair_array).alias("p"))
        .select(F.col("p.doc").alias("doc"), F.col("p.doc2").alias("doc2"))
        .groupBy("doc", "doc2")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sizes = grams.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    s1 = sizes.select(F.col("doc"), F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col("doc").alias("doc2"), F.col("sz").alias("sz2"))
    return (
        shared.join(s1, "doc")
        .join(s2, "doc2")
        .select(
            F.col("doc").alias("d1"),
            F.col("doc2").alias("d2"),
            F.round(
                F.col("shared") / (F.col("sz1") + F.col("sz2") - F.col("shared")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def dedup_pipeline(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    min_matching_bands: int = 2,
    shingle_n: int = 2,
) -> DataFrame:
    """End-to-end near-dup pipeline: MinHash-LSH candidate pairs →
    connected components → per-document verdict
    ``(doc_id, keep_id, is_duplicate)`` where ``keep_id`` is the
    smallest id in the document's duplicate component (its own id if
    unique). This is the full 100 TB dedup pass: two shuffles for
    candidates, O(log diameter) label-propagation rounds for grouping,
    one left join to produce the verdict."""
    from .graph import connected_components

    pairs = minhash_lsh_pairs(df, text_col, id_col, num_perm, bands, shingle_n).filter(
        F.col("matching_bands") >= min_matching_bands
    )
    components = connected_components(pairs)
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(components, F.col("doc_id") == components.vertex, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("keep_id"),
            (
                F.coalesce(F.col("component"), F.col("doc_id")) != F.col("doc_id")
            ).alias("is_duplicate"),
        )
    )


def simhash_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """32-bit SimHash: per token-hash bit, vote +1/-1; fingerprint bit
    = sign of the vote. Map-only + one groupBy; near-dup search then
    buckets on fingerprint bands (not included in the oracle-checked
    output — pair search composes with minhash_lsh_pairs machinery)."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    h = h32(F.col("tok"))
    votes = [
        F.sum(
            F.when(F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{bit}")
        for bit in range(SIMHASH_BITS)
    ]
    voted = toks.groupBy("doc").agg(*votes)
    fingerprint = None
    for bit in range(SIMHASH_BITS):
        term = F.when(F.col(f"v{bit}") > 0, F.lit(2**bit)).otherwise(F.lit(0))
        fingerprint = term if fingerprint is None else fingerprint + term
    return voted.select(F.col("doc"), fingerprint.cast("bigint").alias("simhash"))
