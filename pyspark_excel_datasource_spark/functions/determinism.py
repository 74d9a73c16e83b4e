"""Cross-engine numeric determinism helpers.

The driver compares each Spark query against a DuckDB oracle with an
order-insensitive *value hash* — so float results must be bit-identical, not
just close. Floating-point aggregation order differs between engines (and
between runs, with AQE), so raw ``SUM(double)`` can never hash-match.

The testdata money columns are exact 2-decimal values (verified in
``tools/check_grids.py``); row-wise arithmetic over them lands on a known
decimal grid. That gives us exact strategies:

- **Row-wise scalar math is safe.** IEEE ops on identical inputs give
  identical doubles in every engine; only *aggregation* order varies.
- **dsum(col, s)** — cast each row to ``DECIMAL(18, s)`` (exactly recovers
  the grid value), sum in exact decimal arithmetic (order-independent),
  present as ``DECIMAL(38, s)``. Bit-exact across engines.
- **davg(col, s)** — exact decimal sum, cast to double, divide by count:
  one IEEE division of identical operands → identical double.
- **dround(col, s)** — for genuinely irrational aggregates (stddev, corr,
  geometric means): round to ``s`` decimals and cast to ``DECIMAL(38, s)``.
  Deterministic unless the true value sits within ~1e-12 of a rounding
  boundary (negligible for the testdata distributions).

Every helper has a mirrored SQL spelling (``sql_*``) used in the DuckDB
oracle strings so both sides compute the same thing the same way.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent exact sum of a fixed-scale numeric column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast(f"decimal(38,{scale})")


def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DECIMAL(38,{scale}))"


def davg(col: Column | str, scale: int = 2) -> Column:
    """Bit-exact cross-engine average: exact decimal sum / count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)


def sql_davg(expr: str, scale: int = 2) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / COUNT({expr})"
    )


def dround(col: Column | str, scale: int = 6) -> Column:
    """Round-then-decimal for aggregates with engine-specific fp accumulation."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, scale).cast(f"decimal(38,{scale})")


def sql_dround(expr: str, scale: int = 6) -> str:
    return f"CAST(ROUND({expr}, {scale}) AS DECIMAL(38,{scale}))"


def canon(col: Column | str) -> Column:
    """Canonical string presentation of an exact decimal column.

    Round 1's driver hashed 12 rows+schema-green decimal outputs
    differently from the local replica (CORRECTNESS_r01.json; see
    ``operators/probes.py``). A fixed-scale decimal has exactly one
    string spelling (``"1234.5000"``, ``"-0.07"``) and both engines emit
    it identically, so presenting the final column as that string keeps
    the value exact while removing the decimal128 byte layout from the
    hash entirely. Semantically the column is still the exact decimal —
    this is presentation-layer canonicalization only, applied to BOTH the
    Spark query and its oracle.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string")


def sql_canon(expr: str) -> str:
    return f"CAST({expr} AS VARCHAR)"


def spark_canon(expr: str) -> str:
    """Spark-SQL spelling of :func:`sql_canon` (Spark rejects bare
    ``VARCHAR``; ``STRING`` is the same canonical decimal text). Lets a
    query build its aggregate list as one ``F.expr`` per column from the
    SAME ``sql_*`` strings its oracle uses — a single JVM parse instead
    of the column-DSL's ~10 py4j-bridged objects per aggregate (guide
    §7.3 driver work; q_flagship_pricing's build measured 323 ms in
    DSL)."""
    return f"CAST({expr} AS STRING)"


def bigsum(col: Column | str) -> Column:
    """Integer sum presented as BIGINT (DuckDB sums integers as HUGEINT)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c).cast("long")


def sql_bigsum(expr: str) -> str:
    return f"CAST(SUM({expr}) AS BIGINT)"
