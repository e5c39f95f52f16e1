"""Skew-handling join utilities.

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

__all__ = ["salted_join"]


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
    salt_col: Column = (
        F.abs(F.xxhash64(*[F.col(c) for c in fp_cols])) % F.lit(salt)
    ).cast("int")
    big_salted = big.withColumn("__salt", salt_col)
    small_salted = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>"))
    )
    out = big_salted.join(small_salted, keys + ["__salt"], how)
    return out.drop("__salt")
