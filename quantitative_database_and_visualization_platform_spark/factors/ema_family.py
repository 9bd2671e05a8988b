"""Recursive-EMA factor family: MACD diff/dea, KDJ, TRIX, Force index
(`basic factor_function.md:8-9,12,17,26`).

These are recursions (y_t = (1-α)·y_{t-1} + α·x_t), not finite window
aggregates, so the honest Spark mapping is applyInPandas per entity —
ONE pass computes the entire chained family (e12→e26→diff→dea,
rsv→K→D→J, triple-EMA TRIX, force) instead of one shuffle per EMA.
Inside each group everything is vectorized pandas ewm — the same
per-stock computation the reference runs (`Project report.md:670-682`).

Scale: one shuffle on the entity key; per-group state is O(rows of one
entity) — the same bound the rolling-window suites already accept. For
skewed entities the group is one stock's history (~10^4 rows), far below
executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType

EMA_FAMILY_COLS = (
    "macd_diff",
    "macd_dea",
    "kdj_k",
    "kdj_d",
    "kdj_j",
    "trix_12",
    "force_13",
    "mass_10",
)


def with_ema_family(bars: DataFrame, entity: str = "code", order: str = "d") -> DataFrame:
    """Append the chained EMA factor columns to a daily-bar panel."""
    out_schema = StructType(
        bars.schema.fields + [StructField(name, DoubleType()) for name in EMA_FAMILY_COLS]
    )

    def compute(pdf):
        pdf = pdf.sort_values(order, kind="mergesort")
        c, v = pdf["close"], pdf["volume"]
        # MACD: diff = (EMA12 - EMA26) * 2, dea = EMA(diff, 9)
        e12 = c.ewm(span=12, adjust=False).mean()
        e26 = c.ewm(span=26, adjust=False).mean()
        diff = (e12 - e26) * 2
        pdf["macd_diff"] = diff
        pdf["macd_dea"] = diff.ewm(span=9, adjust=False).mean()
        # KDJ: RSV over 9-day channel (neutral 50 on a degenerate channel),
        # K/D = successive α=1/3 smoothings (span 5), J = 3K - 2D
        ln = pdf["low"].rolling(9, min_periods=1).min()
        hn = pdf["high"].rolling(9, min_periods=1).max()
        denom = hn - ln
        rsv = ((c - ln) / denom * 100).where(denom != 0, 50.0)
        k = rsv.ewm(span=5, adjust=False).mean()
        d = k.ewm(span=5, adjust=False).mean()
        pdf["kdj_k"], pdf["kdj_d"], pdf["kdj_j"] = k, d, 3 * k - 2 * d
        # TRIX: triple EMA(12), then 1-step rate of change
        e3 = (
            c.ewm(span=12, adjust=False)
            .mean()
            .ewm(span=12, adjust=False)
            .mean()
            .ewm(span=12, adjust=False)
            .mean()
        )
        pdf["trix_12"] = e3 / e3.shift(1) - 1
        # Force index: EMA(volume * Δclose, 13); first Δ is 0 (defined
        # identically in the oracle so the recursion seeds match)
        fc = (v * c.diff()).fillna(0.0)
        pdf["force_13"] = fc.ewm(span=13, adjust=False).mean()
        # Mass index: Σ_10 EMA(H-L, 9) / EMA(EMA(H-L, 9), 9)
        hl = pdf["high"] - pdf["low"]
        e9 = hl.ewm(span=9, adjust=False).mean()
        e99 = e9.ewm(span=9, adjust=False).mean()
        pdf["mass_10"] = (e9 / e99).rolling(10, min_periods=10).sum()
        return pdf

    return bars.groupBy(entity).applyInPandas(compute, schema=out_schema)
