"""Small driver-built frames as pure-JVM literal plans.

``spark.createDataFrame(rows)`` over a Python list builds a
*parallelized Python RDD*: every evaluation of the plan launches
Python worker processes across ``defaultParallelism`` partitions just
to re-serialize a handful of driver-known values — hundreds of ms to
seconds per action, and a cold-start multiplier inside joins that
re-evaluate the small side (measured: two 1-row anchors turned a
theta-sketch cross join into ~15 s at sf0.1). For frames whose
contents the driver already holds (partition offsets, query keys,
codebook centroids — anything bounded by a parameter, not by data),
``inline(array(struct(...)))`` over ``range(1)`` builds the same frame
as plan literals: single partition, zero Python at execution time.

Not for data-sized frames: every cell becomes a literal in the plan,
so keep inputs bounded (partition counts, query lists, centroid
tables — thousands of cells, not millions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def literal_frame(
    spark: SparkSession,
    rows: list[tuple],
    fields: list[tuple[str, str]],
) -> DataFrame:
    """A 1-partition JVM-literal DataFrame from driver-side ``rows``.

    ``fields`` is ``[(column_name, spark_sql_type), ...]``; list/tuple
    cell values become ``array<element_type>`` columns (pass the
    ELEMENT type, e.g. ``("vec", "float")``). ``rows`` must be
    non-empty (an empty literal array cannot carry a schema — callers
    with a legitimately empty case supply their sentinel row, as the
    offset-join callers already do)."""
    if not rows:
        raise ValueError("literal_frame requires at least one row")

    def cell(v, typ: str):
        if isinstance(v, (list, tuple)):
            # cast the whole array, not just elements: an empty cell is
            # F.array() of type array<void>, which fails to unify with
            # other rows' array<typ> struct fields inside inline(); the
            # outer cast also normalizes all-null-element cells
            return F.array(*[F.lit(x) for x in v]).cast(f"array<{typ}>")
        return F.lit(v).cast(typ)

    structs = [
        F.struct(
            *[cell(v, typ).alias(name) for v, (name, typ) in zip(row, fields)]
        )
        for row in rows
    ]
    return spark.range(0, 1, 1, 1).select(F.inline(F.array(*structs)))
