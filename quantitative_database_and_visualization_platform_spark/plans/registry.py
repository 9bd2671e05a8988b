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
        # Loud duplicate guard (r12): registration is last-writer-wins
        # on a plain dict, so a name collision silently REPLACES an
        # already-gated query — round 12 briefly shadowed the r8/r9
        # variance_ratio_test and mean_reversion_halflife with new
        # definitions and only a downstream golden caught it. Fail at
        # import, where the collision is written, not at the gate.
        if name in QUERIES:
            raise ValueError(
                f"duplicate query registration: {name!r} "
                f"(already registered by {QUERIES[name].__module__})"
            )
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


def round6(c: Column | str) -> Column:
    """Cross-engine-deterministic 6-dp rounding: ``FLOOR(x*1e6+0.5)/1e6``
    (identical IEEE ops on both engines) instead of ``ROUND`` (Spark
    rounds the shortest BigDecimal repr HALF_UP, DuckDB multiplies the raw
    double — they disagree whenever the shortest repr ends in "...5" at
    the boundary). Non-finite inputs are normalized to NULL first: Spark's
    FLOOR returns a LONG so NaN would silently become 0 (and ±Inf a
    saturated long) while DuckDB keeps NaN/Inf, and −0.0 vs 0.0 hash
    differently even though they compare equal. Floor output is an exact
    integer, so the quotient can never be −0.0 or a boundary case."""
    col = F.col(c) if isinstance(c, str) else c
    finite = F.when(
        F.isnan(col) | (col == float("inf")) | (col == float("-inf")), F.lit(None)
    ).otherwise(col)
    return F.floor(finite * 1_000_000 + F.lit(0.5)) / 1_000_000.0


def o_round6(expr: str) -> str:
    """Oracle-side twin of :func:`round6`."""
    return (
        f"CASE WHEN isnan({expr}) OR isinf({expr}) THEN NULL "
        f"ELSE FLOOR(({expr})*1000000 + 0.5)/1000000.0 END"
    )
