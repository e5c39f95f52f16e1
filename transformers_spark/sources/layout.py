"""Multi-dimensional data layout: Z-order (Morton) clustering.

Partition pruning handles ONE dimension (the partition column); row-
group min/max skipping handles whatever the file sort order localizes.
A linear sort localizes only its leading column — a 100 TB table
sorted by ``user_id`` answers ``user_id = X`` with a handful of files
but scans everything for ``value BETWEEN a AND b``. Interleaving the
bits of several columns into one Morton code and range-partitioning +
sorting by it localizes ALL interleaved dimensions at once: every
file/row-group covers a small hyper-rectangle, so min/max stats prune
multi-predicate scans on any subset of the z-columns.

All map-only: per-column (min, max) come from one bounded aggregate
(2 scalars per column), quantization + bit interleave are pure column
expressions, and the write is the usual repartitionByRange + local
sort — no extra shuffle beyond the one the re-layout itself requires.

This is the hand-rolled core of what table formats call Z-ORDER
clustering; keeping it at expression level means it works on plain
parquet directories with no format dependency.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_value", "write_zordered", "file_minmax_stats"]


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[DataFrame, str]:
    """Append a Morton-code column interleaving ``cols`` (each
    quantized to ``bits`` bits over its observed [min, max]); returns
    (df_with_column, column_name). ``bits * len(cols)`` must fit a
    signed 64-bit long (e.g. 3 cols x 16 bits = 48). The min/max
    collect is one aggregate of 2·len(cols) scalars — bounded at any
    corpus size."""
    if bits * len(cols) > 62:
        raise ValueError(f"{len(cols)} cols x {bits} bits exceeds a long")
    ranges = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    max_q = (1 << bits) - 1
    quantized: list[Column] = []
    for c in cols:
        mn, mx = ranges[f"mn_{c}"], ranges[f"mx_{c}"]
        if mn is None or mx is None:
            raise ValueError(
                f"cannot z-order on {c!r}: no non-null values to quantize"
            )
        span = (mx - mn) or 1.0
        # NULLs quantize to cell 0 (SQL NULLS FIRST convention): they
        # cluster in the lowest corner instead of silently landing in
        # the max cell (least/greatest SKIP nulls) and widening the top
        # file's min/max stats
        q = F.floor(
            (F.coalesce(F.col(c).cast("double"), F.lit(mn)) - F.lit(mn))
            / F.lit(span)
            * max_q
        )
        quantized.append(
            F.greatest(F.lit(0), F.least(F.lit(max_q), q)).cast("long")
        )
    ncols = len(cols)
    parts = [
        F.shiftleft(F.shiftright(q, b).bitwiseAND(F.lit(1)), b * ncols + i)
        for i, q in enumerate(quantized)
        for b in range(bits)
    ]
    z = reduce(lambda a, b: a.bitwiseOR(b), parts)
    zcol = "__z_" + "_".join(cols)
    return df.withColumn(zcol, z), zcol


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
) -> None:
    """Re-layout ``df`` into ``n_files`` parquet files clustered by the
    Morton code of ``cols``: range partition on the code (each file
    owns a z-range = a small hyper-rectangle of the column space),
    sort within, drop the helper column on write."""
    zdf, zcol = zorder_value(df, cols, bits)
    (
        zdf.repartitionByRange(n_files, zcol)
        .sortWithinPartitions(zcol)
        .drop(zcol)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_minmax_stats(path: str, cols: list[str]) -> list[dict]:
    """Per-file min/max of ``cols`` from parquet FOOTER stats only
    (no data read) — the same numbers a scan's file/row-group pruning
    consults, exposed for layout-quality audits: the fraction of files
    overlapping a predicate box IS the fraction the scan must read."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for fp in sorted(glob.glob(os.path.join(path, "part-*"))):
        md = pq.ParquetFile(fp).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        row: dict = {"file": os.path.basename(fp)}
        for c in cols:
            mn = mx = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(names[c]).statistics
                if st is None or not st.has_min_max:
                    mn = mx = None
                    break
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
            row[f"{c}_min"], row[f"{c}_max"] = mn, mx
        out.append(row)
    return out
