"""Iterative graph helpers: connected components via label
propagation — the grouping step of a near-duplicate pipeline.

Implementation is alternating-direction min-label propagation over the
edge list: each round every vertex takes the minimum label among
itself and its neighbors. Rounds are driver-side Spark jobs; the label
table is checkpointed by localCheckpoint() each round so the lineage
(and the shuffle DAG) doesn't grow with iterations. Converges in
O(log diameter) rounds for the short, dense components near-dup
detection produces; ``max_iterations`` bounds pathological chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    max_iterations: int = 10,
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """(vertex, component) for every vertex in ``edges``; component =
    min vertex id of its connected component.

    Adaptive: once the edge list is materialized its size is known —
    at or below ``driver_threshold`` edges the components come from
    driver-side union-find (one collect of an already-bounded list,
    O(E α) instead of O(rounds) Spark jobs of fixed overhead each);
    above it, distributed min-label propagation. Near-dup candidate
    graphs are usually far smaller than their corpus, so the fast path
    is the common one even at large scale — the threshold, not the
    corpus, bounds driver memory.
    """
    # Materialize the edge list once: it's typically the output of an
    # expensive candidate-pair plan (MinHash etc.) that would otherwise
    # be recomputed by the union below and by EVERY propagation round.
    edges = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint(
        eager=True
    )
    if edges.count() <= driver_threshold:  # count is free: checkpointed
        return _driver_union_find(edges)
    # Checkpoint the symmetrized list too: it joins into EVERY round,
    # and without this each round re-runs the union+distinct shuffle.
    sym = (
        edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
    )
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.b == labels.vertex)
            .groupBy(F.col("a").alias("vertex"))
            .agg(F.min("component").alias("neighbor_component"))
        )
        # Carry the pre-update label alongside the new one so the
        # convergence check below is a map-only filter over the
        # checkpointed result — not a second shuffle join per round.
        updated = (
            labels.join(neighbor_min, "vertex", "left")
            .select(
                "vertex",
                F.col("component").alias("prev"),
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("neighbor_component"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            updated.filter(F.col("component") != F.col("prev")).limit(1).count()
        )
        labels = updated.select("vertex", "component")
        if changed == 0:
            break
    return labels


def _driver_union_find(edges: DataFrame) -> DataFrame:
    """Path-compressing union-find over a collected edge list; roots
    are the minimum vertex id of each component (same contract as the
    distributed path). Only reached when the edge count is known to be
    at or below ``driver_threshold``."""
    parent: dict = {}

    def find(v):
        r = v
        while parent[r] != r:
            r = parent[r]
        while parent[v] != r:  # path compression
            parent[v], v = r, parent[v]
        return r

    for row in edges.collect():
        a, b = row["a"], row["b"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:  # min id wins the root, keeping component = min
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    rows = [(v, find(v)) for v in parent]
    from pyspark.sql.types import StructField, StructType

    vtype = edges.schema["a"].dataType  # explicit: rows may be empty
    schema = StructType(
        [StructField("vertex", vtype), StructField("component", vtype)]
    )
    return edges.sparkSession.createDataFrame(rows, schema)
