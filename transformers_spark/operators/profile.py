"""Column profiling: the data-quality summary every ingest pipeline
runs first — per column: null rate, exact distinct count, min/max
(as strings, so one result schema covers all column types).

Plan shape: ONE aggregate pass computes every column's statistics
(Spark plans the multi-column COUNT(DISTINCT ...) as a single Expand —
k× the rows map-side, still one shuffle), then a map-only ``stack``
unpivots the scalar row into (column, ...) rows. At 100 TB exact
multi-column distinct is the expensive choice — swap
``approx_count_distinct`` in via ``exact_distinct=False`` when ±2%
suffices (the oracle gate requires the exact path; HLL sketches don't
hash-match across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["column_profile"]


def column_profile(
    df: DataFrame, cols: list[str] | None = None, exact_distinct: bool = True
) -> DataFrame:
    """(column, n_rows, n_nulls, null_frac, n_distinct, min_value,
    max_value) per profiled column; min/max stringified (numerics via
    their canonical cast) so heterogeneous column types share one
    result schema."""
    cols = cols or df.columns

    # Escape interpolated names: a quote/backslash in a string literal
    # or a backtick in an identifier is legal in a Spark column name
    # and must not break the generated stack() SQL
    def _qlit(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    def _qid(s: str) -> str:
        return "`" + s.replace("`", "``") + "`"

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(_qid(c))
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"__nulls_{c}"))
        distinct = (
            F.countDistinct(col)
            if exact_distinct
            else F.approx_count_distinct(col)
        )
        aggs.append(distinct.alias(f"__dist_{c}"))
        aggs.append(F.min(col).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"__max_{c}"))
    row = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args.append(_qlit(c))
        stack_args.append(_qid(f"__nulls_{c}"))
        stack_args.append(_qid(f"__dist_{c}"))
        stack_args.append(_qid(f"__min_{c}"))
        stack_args.append(_qid(f"__max_{c}"))
    stacked = row.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) AS "
            "(column, n_nulls, n_distinct, min_value, max_value)"
        ),
    )
    return stacked.select(
        "column",
        "n_rows",
        "n_nulls",
        F.round(F.col("n_nulls") / F.col("n_rows"), 6).alias("null_frac"),
        "n_distinct",
        "min_value",
        "max_value",
    )
