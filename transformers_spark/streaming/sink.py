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

import json
import os

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
    ``batch_id_col`` must then name a destination column that records
    the micro-batch id (the replay-dedup hook) — pass ``None`` to
    disable tagging. ``mode='overwrite_dynamic'`` replaces exactly the
    day-partitions present in each micro-batch (idempotent under
    replay) and RAISES if a later batch touches a partition a DIFFERENT
    earlier batch already wrote — including batches committed before a
    checkpoint restart (the seen-partition set is persisted next to the
    checkpoint) — partition data straddling micro-batches would
    otherwise be silently erased.

    Returns the started ``StreamingQuery``; callers drain with
    ``awaitTermination()``.
    """
    if mode not in ("append", "overwrite_dynamic"):
        raise ValueError(f"unsupported sink mode {mode!r}")
    meta = writer.catalog.get_table(fqn)
    dest_cols = {c.lower() for c in meta.column_names}
    # fail at start(), not inside the first micro-batch: an append into
    # an ingestion-time table has no per-batch partition date, and a
    # typo'd batch_id_col would silently drop the replay-dedup tag
    if mode == "append":
        part = meta.partition
        if part.is_partitioned and not part.field:
            raise ValueError(
                f"{fqn} is ingestion-time partitioned: streaming append "
                "has no per-batch partition date — use a column-DAY "
                "partitioned destination"
            )
        if batch_id_col and batch_id_col.lower() not in dest_cols:
            raise ValueError(
                f"batch_id_col {batch_id_col!r} is not a column of {fqn}; "
                "pass batch_id_col=None to disable replay tagging"
            )
    else:
        # overwrite_dynamic replaces day-partitions derived from a
        # COLUMN_DAY field: anything else would only fail (or worse,
        # skip the clobber guard) inside the first micro-batch
        part = meta.partition
        if not part.is_partitioned or not part.field:
            raise ValueError(
                f"{fqn} must be column-DAY partitioned for the "
                "overwrite_dynamic sink (non-partitioned and "
                "ingestion-time destinations have no per-batch "
                "partition mapping) — use append mode"
            )
    # data-loss guard for overwrite_dynamic: each batch replaces whole
    # day-partitions, so a day whose data straddles two micro-batches
    # would silently lose the earlier batch's rows — detect and raise.
    # The seen-partition set is PERSISTED under the checkpoint dir (one
    # tiny json per committed batch, written only after the overwrite
    # succeeds) so the guard survives a checkpoint restart — which is
    # exactly when at-least-once replay makes the clobber real. A
    # replayed batch id is exempt: dynamic overwrite of the same batch's
    # own partitions is the idempotent case. Paths use the local
    # filesystem; on an object store, write the same per-batch markers
    # through that store's API.
    state_dir = os.path.join(checkpoint_dir, "_seen_partitions")
    seen_days: dict[int, set] = {}
    # reverse index day -> owning batch: the clobber check must be
    # O(days in THIS batch), not a re-union of every historical
    # batch's days on every micro-batch (that grows linearly with
    # stream age on a long-lived stream)
    day_owner: dict[str, int] = {}
    if mode == "overwrite_dynamic":
        os.makedirs(state_dir, exist_ok=True)
        for fn in os.listdir(state_dir):
            if fn.startswith("days_") and fn.endswith(".json"):
                bid = int(fn[5:-5])
                with open(os.path.join(state_dir, fn)) as fh:
                    ds = set(json.load(fh))
                seen_days[bid] = ds
                for d in ds:
                    day_owner[d] = bid

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = batch_df
        if mode == "append":
            if batch_id_col:
                out = out.withColumn(batch_id_col, F.lit(batch_id))
            writer.append(fqn, out)
        else:
            part_field = meta.partition.field
            # persist: the days collect AND the overwrite both consume
            # this batch — uncached, the batch plan runs twice per
            # micro-batch for the stream's whole life
            out = out.persist()
            try:
                days = {
                    str(r[0])
                    for r in out.select(
                        F.to_date(F.col(f"`{part_field}`"))
                    ).distinct().collect()
                }
                clobbered = {
                    d for d in days if day_owner.get(d, batch_id) != batch_id
                }
                if clobbered:
                    raise ValueError(
                        "overwrite_dynamic sink: partitions "
                        f"{sorted(clobbered)} span multiple micro-batches — "
                        "a later batch would erase the earlier one's rows. "
                        "Align batches to partitions or use append mode "
                        "with batch-id dedup."
                    )
                writer.overwrite_dynamic(fqn, out)
            finally:
                out.unpersist()
            seen_days.setdefault(batch_id, set()).update(days)
            for d in days:
                day_owner[d] = batch_id
            path = os.path.join(state_dir, f"days_{batch_id}.json")
            tmp = path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(sorted(seen_days[batch_id]), fh)
            os.replace(tmp, path)

    stream = (
        sdf.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        stream = stream.trigger(availableNow=True)
    return stream.start()
