"""Named-query registry: the driver-facing catalog of every implemented
operator (SURVEY.md §2), each as a (PySpark callable, DuckDB oracle SQL)
pair.

Determinism conventions (so the order-insensitive value-hash comparison
against DuckDB is exact, not approximate):

- **Sums/averages of doubles** are computed as exact integer sums of
  fixed-point "cents" (``SUM(CAST(ROUND(x*scale,0) AS BIGINT))/scale``) on
  BOTH sides — integer addition is order-independent, so Spark's partial
  aggregation and DuckDB's single-threaded sum produce bit-identical
  doubles.
- **Small-magnitude float statistics** (corr, stddev, median, pct-change)
  are rounded to 6 decimals on both sides; their cross-engine error is
  ~1e-12 so the rounding boundary is never in doubt.
- **LIMIT queries** always ORDER BY a unique key suffix.
- **Counts** are CAST to BIGINT in the oracle (DuckDB count_if/sum(int)
  widen to HUGEINT otherwise).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --- Spark-side determinism helpers ---


def sum_fixed(c: Column | str, scale: int = 100) -> Column:
    """Order-independent exact sum of a double column via fixed-point
    integer accumulation."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(F.round(col * scale, 0).cast("long")) / float(scale)


def avg_fixed(c: Column | str, scale: int = 100) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return sum_fixed(col, scale) / F.count(col)


def o_sum_fixed(expr: str, scale: int = 100) -> str:
    """Oracle-side twin of sum_fixed."""
    return f"SUM(CAST(ROUND(({expr})*{scale},0) AS BIGINT))/{scale}.0"


def o_avg_fixed(expr: str, scale: int = 100) -> str:
    return f"{o_sum_fixed(expr, scale)}/COUNT({expr})"
