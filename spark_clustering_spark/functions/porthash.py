"""Cross-engine portable integer hashing (md5-derived).

``xxhash64`` is Spark's fast JVM-side hash, but DuckDB has no
compatible implementation, so any query built on it can only get the
driver's weaker rows-only check. Both engines DO expose ``md5`` over
identical UTF-8 bytes; slicing its hex digest yields uniform integers
computable bit-identically in both:

- Spark: ``conv(substring(md5(x), 1, 8), 16, 10)`` -> bigint in [0, 2^32)
- DuckDB: no hex->int cast exists, so the oracle unrolls the digit sum
  ``sum_i (strpos('0123456789abcdef', substr(hex, i, 1)) - 1) * 16^(n-i)``
  with BIGINT literal weights (exact integer math, no doubles).

The declared dedup queries (MinHash, SimHash, components) use THIS hash
so the DuckDB oracle can reproduce them exactly; at production scale a
caller who does not need cross-engine verification can swap in
``F.xxhash64`` for ~3x cheaper per-token hashing (same pipeline shape —
the hash is computed once per shingle/token and only 8-byte integers
shuffle either way).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_HEXDIGITS = "0123456789abcdef"


def md5_int32(col: Column, *, hi: bool = False) -> Column:
    """First (or, with ``hi``, second) 8 md5 hex chars as bigint in [0, 2^32)."""
    start = 9 if hi else 1
    return F.conv(F.substring(F.md5(col.cast("binary")), start, 8), 16, 10).cast(
        "bigint"
    )


def sql_hex_int(hex_expr: str, start: int = 1, n: int = 8) -> str:
    """DuckDB SQL for ``n`` hex chars of ``hex_expr`` (1-based ``start``)
    as a BIGINT. ``hex_expr`` is repeated ``n`` times — keep it a cheap
    column reference (compute the md5 once in a prior CTE stage)."""
    terms = [
        f"(strpos('{_HEXDIGITS}', substr({hex_expr}, {start + i}, 1)) - 1)::BIGINT"
        f" * {16 ** (n - 1 - i)}"
        for i in range(n)
    ]
    return "(" + " + ".join(terms) + ")"
