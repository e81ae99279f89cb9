"""Skew-mitigation: salted joins.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; salting is the explicit fallback for pathological hot keys —
e.g. a null-like sentinel user owning 10% of a 100 TB events table.

``salted_join(big, small, key, n_salts)``:
- big side: adds a deterministic salt in [0, n_salts) derived from the
  row's other content (LCG over a row id), splitting each hot key's
  rows across n_salts sub-partitions;
- small side: replicated n_salts times (explode), one copy per salt;
- join on (key, salt) — each hot key now occupies n_salts shuffle
  partitions instead of one.

Result is row-identical to the plain join (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_source: Column | str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join. ``salt_source`` must be a deterministic
    per-row expression on the big side (ideally a unique id)."""
    src = F.col(salt_source) if isinstance(salt_source, str) else salt_source
    big_s = big.withColumn(
        "_salt",
        F.pmod(src.cast("bigint") * F.lit(1103515245) + F.lit(12345), F.lit(n_salts)).cast(
            "int"
        ),
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_s.join(
        small_s,
        (big_s[big_key] == small_s[small_key]) & (big_s["_salt"] == small_s["_salt"]),
        how,
    )
    return out.drop("_salt")
