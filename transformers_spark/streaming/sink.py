"""Streaming → catalog sink: land a stream in the engine's managed
partitioned tables.

The reference's only sink is a BigQuery table load per batch job; the
streaming twin is ``foreachBatch`` into the same ``Writer`` the batch
engine uses, so streamed data lands in the identical ``dt``-partitioned
catalog tables batch queries and load methods operate on — one table
layout, two ingestion modes.

Idempotence at scale: ``foreachBatch`` gives at-least-once delivery on
retries. ``append`` mode tags each row with the batch id so a replayed
batch can be deduplicated downstream (or swap to ``overwrite_dynamic``
when the stream carries full partition replacements — dynamic partition
overwrite is naturally idempotent per batch). Checkpointing the query
makes batch ids stable across restarts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..loaders import Writer

__all__ = ["stream_into_table"]


def stream_into_table(
    sdf: DataFrame,
    writer: Writer,
    fqn: str,
    query_name: str,
    checkpoint_dir: str,
    mode: str = "append",
    batch_id_col: str | None = "_batch_id",
    available_now: bool = True,
):
    """Start a streaming query writing ``sdf`` into catalog table
    ``fqn`` through the engine's write layer.

    ``mode='append'`` uses ``Writer.append`` (WRITE_APPEND semantics);
    ``mode='overwrite_dynamic'`` replaces exactly the day-partitions
    present in each micro-batch (idempotent under replay).
    ``batch_id_col`` (append mode) records the micro-batch id when the
    destination has such a column — the replay-dedup hook.

    Returns the started ``StreamingQuery``; callers drain with
    ``awaitTermination()``.
    """
    if mode not in ("append", "overwrite_dynamic"):
        raise ValueError(f"unsupported sink mode {mode!r}")
    meta = writer.catalog.get_table(fqn)
    dest_cols = {c.lower() for c in meta.column_names}

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = batch_df
        if mode == "append":
            if batch_id_col and batch_id_col.lower() in dest_cols:
                out = out.withColumn(batch_id_col, F.lit(batch_id))
            writer.append(fqn, out)
        else:
            writer.overwrite_dynamic(fqn, out)

    stream = (
        sdf.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        stream = stream.trigger(availableNow=True)
    return stream.start()
