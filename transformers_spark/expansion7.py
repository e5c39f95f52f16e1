"""Round-10 catalog expansion: cross-document substring dedup — the
one gap the round-9 verdict named in the dedup family (ask 3).

* text_cross_doc_span_dedup — the exact-substring-dedup class:
  8-word tiled spans repeated in >= 2 DISTINCT documents (crawl
  boilerplate — navbars, license footers, syndicated paragraphs) are
  removed everywhere except one canonical keeper occurrence (global
  min (doc, span_idx)); per document, the rollup reports span/token
  counts removed and a kept_fingerprint (md5 over the ordered
  surviving (span_idx:span_h) list) that pins the rewritten content
  without shuffling text. text_span_dedup counts repeats anywhere
  INCLUDING within one doc; this removal set is strictly
  cross-document. Built on the same banded/inverted-index discipline
  as the rest of the dedup family: map-only span generation, one
  per-hash aggregate, one hash join back, one per-doc rollup — never
  all-pairs, and only 16-byte hashes + ints in the shuffles.

Determinism rules as everywhere (queries.py docstring, ORACLES.md):
exact integer aggregates, md5-derived hashes, one double division per
output on identical exact operands, explicit whitespace classes
(class 16), HUGEINT cast away at oracle outputs, keeper tie-break is
a total order (lexicographic (doc, span_idx) struct min — DuckDB
named-struct MIN compares fields in declaration order, same as
Spark), and the per-doc rollup groups by id rather than joining back
onto the base table, so duplicate-id rows stay consistent on both
sides (class: duprows gate, ORACLES.md #15).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators.specs import DUCK_TOKENS
from .operators.text import cross_doc_span_dedup_stats
from .sources.testdata import register_tables


def q_cross_doc_span_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-document substring dedup rollup
    (operators/text.py:cross_doc_span_dedup_stats, span_len=8)."""
    register_tables(spark, sf_dir, ("documents",))
    return cross_doc_span_dedup_stats(spark.table("documents"), span_len=8)


# The oracle mirrors the operator stage by stage. LEAST() keeps the
# tail-tile token count; string_agg ties (duplicate physical rows)
# order identical values, so the fingerprint stays deterministic; the
# FILTER-empty case (every span removed) coalesces to md5('') exactly
# as Spark's array_join over an empty array does.
ORACLE_CROSS_DOC_SPAN_DEDUP = f"""
WITH toks AS (
  SELECT doc_id, {DUCK_TOKENS} AS ts FROM documents
),
spans AS (
  SELECT doc_id,
         CAST(i AS INT) AS span_idx,
         md5(array_to_string(list_slice(ts, i*8 + 1, i*8 + 8), ' ')) AS span_h,
         CAST(LEAST(8, len(ts) - i*8) AS INT) AS tok_len
  FROM toks,
       unnest(generate_series(0, CAST(ceil(len(ts) / 8.0) AS INT) - 1)) AS g(i)
  WHERE len(ts) > 0
),
dup AS (
  SELECT span_h,
         min({{'doc': doc_id, 'idx': span_idx}}) AS keeper
  FROM spans GROUP BY span_h
  HAVING COUNT(DISTINCT doc_id) >= 2
),
flagged AS (
  SELECT s.doc_id, s.span_idx, s.span_h, s.tok_len,
         d.span_h IS NOT NULL AS is_dup,
         (d.span_h IS NOT NULL
          AND NOT (d.keeper.doc = s.doc_id
                   AND d.keeper.idx = s.span_idx)) AS removed
  FROM spans s LEFT JOIN dup d ON s.span_h = d.span_h
)
SELECT doc_id AS doc,
       COUNT(*) AS n_spans,
       CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
         AS n_cross_dup_spans,
       CAST(SUM(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed_spans,
       CAST(SUM(tok_len) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN removed THEN tok_len ELSE 0 END) AS BIGINT)
         AS tokens_removed,
       ROUND(1.0 - SUM(CASE WHEN removed THEN tok_len ELSE 0 END)::DOUBLE
                   / SUM(tok_len), 6) AS retained_token_frac,
       md5(COALESCE(
         string_agg(span_idx || ':' || span_h, ' '
                    ORDER BY span_idx, span_h)
           FILTER (WHERE NOT removed),
         '')) AS kept_fingerprint
FROM flagged
GROUP BY doc_id
"""


def expansion7_specs():
    from .queries import QuerySpec

    return [
        QuerySpec(
            "text_cross_doc_span_dedup",
            "Cross-document repeated-span removal rollup (keeper-kept)",
            q_cross_doc_span_dedup,
            ORACLE_CROSS_DOC_SPAN_DEDUP,
        ),
    ]
