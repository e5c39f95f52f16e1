"""Deterministic dataset splitting for training pipelines.

A train/validation/test split at 100 TB can't be a random sample — it
must be (a) reproducible across runs and engines, (b) stable under
re-partitioning and appends (a document keeps its split forever), and
(c) computable without any shuffle. Hash-mod splitting gives all
three: bucket = md5(id) mod 100, and contiguous bucket ranges map to
splits. The assignment is a map-only projection; the same arithmetic
runs verbatim in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import hash32

__all__ = ["hash_split", "split_expr"]


def split_expr(
    id_col: Column,
    weights: dict[str, int] | None = None,
    hasher: str = "portable",
) -> Column:
    """Split-name column from percentage ``weights`` (must sum to 100);
    buckets are assigned in dict order, so ``{"train": 80, "val": 10,
    "test": 10}`` maps buckets [0,80) / [80,90) / [90,100)."""
    weights = weights or {"train": 80, "val": 10, "test": 10}
    if sum(weights.values()) != 100:
        raise ValueError(f"split weights must sum to 100: {weights}")
    bucket = hash32(hasher)(id_col.cast("string")) % 100
    expr: Column | None = None
    lo = 0
    for name, pct in weights.items():
        hi = lo + pct
        cond = bucket < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return expr


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, int] | None = None,
    hasher: str = "portable",
    split_col: str = "split",
) -> DataFrame:
    """``df`` plus a deterministic ``split`` column keyed on
    ``id_col``'s hash — stable under appends, repartitioning, and
    engine changes; zero shuffle."""
    return df.withColumn(split_col, split_expr(F.col(id_col), weights, hasher))
