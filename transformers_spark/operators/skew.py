"""Skew- and parallelism-handling utilities.

AQE's skew-join splitting handles most cases at runtime
(``session.ENGINE_CONF``); ``salted_join`` is the explicit fallback
for pathological hot keys when joining a large fact side against an
aggregated/deduped dimension that cannot be broadcast:

* fact side: add a random-ish salt in ``[0, salt)`` per row (derived
  deterministically from a row fingerprint here, keeping results
  reproducible — a production pipeline can use ``rand()``),
* dim side: explode each row ``salt`` ways,
* join on (key, salt): each hot key's rows spread over ``salt``
  shuffle partitions instead of one.

``salt`` multiplies the small side, so size it to the skew factor,
not "big".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "fan_out"]


def fan_out(df: DataFrame) -> DataFrame:
    """Widen a narrow input to the cluster's default parallelism before
    a CPU-heavy map stage.

    A map-only operator inherits the scan's partitioning; when the
    input is one small file (or a few unsplittable ones), the whole
    stage pins to that many cores no matter how wide the cluster is.
    At 100 TB a scan arrives in thousands of splits and this is a
    no-op; the round-robin shuffle it adds on narrow inputs is bounded
    by the input's (small, by premise) size.

    The narrowness probe reads leaf-scan file names + local sizes only
    — never ``df.rdd`` (which forces full physical planning and
    codegen just to count partitions). Non-file or non-local sources
    are left untouched.
    """
    import math
    import os
    import re
    from urllib.parse import unquote, urlparse

    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files or len(files) >= target:
        return df
    raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    # Honor Spark's byte-suffix forms ('128m', '1g', '134217728b'):
    # reading '128m' as 128 raw bytes would estimate thousands of
    # splits and silently skip the fan-out this operator exists for
    m = re.match(r"(\d+)\s*([kmgtp]?)b?$", raw.strip().lower())
    if m:
        max_bytes = int(m.group(1)) * (
            1024 ** " kmgtp".index(m.group(2) or " ")
        )
    else:
        max_bytes = 134217728
    splits = 0
    for uri in files:
        parsed = urlparse(uri)
        if parsed.scheme not in ("", "file"):
            return df  # remote storage: sizing needs an RPC, leave alone
        try:
            size = os.stat(unquote(parsed.path)).st_size
        except OSError:
            return df
        splits += max(1, math.ceil(size / max_bytes))
        if splits >= target:
            return df  # Spark will already split this wide
    return df.repartition(target)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 8,
    fingerprint_cols: list[str] | None = None,
) -> DataFrame:
    """Join ``big ⋈ small`` on key column(s) with an explicit salt.

    Result equals ``big.join(small, on, how)`` for 'inner' and 'left'
    joins (each big row matches exactly its salt's replica of the
    small row).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    fp_cols = fingerprint_cols or big.columns
    # pmod, not abs(...)%: abs(Long.MIN_VALUE) overflows back to
    # negative, producing a salt value the exploded small side never
    # carries — that row would silently lose its match
    salt_col: Column = F.pmod(
        F.xxhash64(*[F.col(c) for c in fp_cols]), F.lit(salt)
    ).cast("int")
    big_salted = big.withColumn("__salt", salt_col)
    small_salted = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>"))
    )
    out = big_salted.join(small_salted, keys + ["__salt"], how)
    return out.drop("__salt")
