"""Scalar expression helpers (SURVEY.md §2.8).

All are native Column expressions — no Python UDFs — so they run inside
whole-stage codegen on a 100 TB scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def signed_power(x: Column, a: Column | float) -> Column:
    """sign(x) * |x|^a (alpha101_engine.py:104-107)."""
    return F.signum(x) * F.pow(F.abs(x), a)


def streak_height(streak: Column) -> Column:
    """Limit-up streak text → integer board height
    (`app/Quantlib/main.py:76-80`, `Project report.md:735`):
    '3连板' → 3, '5天4板' → 4, '首板' → 1, anything else → 1.
    """
    lianban = F.regexp_extract(streak, r"^(\d+)连板$", 1)
    tianban = F.regexp_extract(streak, r"^\d+天(\d+)板$", 1)
    return (
        F.when(lianban != "", lianban.cast("int"))
        .when(tianban != "", tianban.cast("int"))
        .otherwise(F.lit(1))
    )


def monetary_text_to_double(s: Column) -> Column:
    """Chinese monetary text → float: '1.2亿' → 1.2e8, '5000万' → 5e7,
    plain numeric text passes through
    (`pages/2_Sentiment radar.py:61-71`)."""
    num = F.regexp_extract(s, r"([-+]?\d+(?:\.\d+)?)", 1)
    base = F.when(num != "", num.cast("double"))
    return (
        F.when(s.contains("亿"), base * 1e8)
        .when(s.contains("万"), base * 1e4)
        .otherwise(base)
    )


def normalize_stock_code(code: Column) -> Column:
    """Bare 6-digit code → exchange-suffixed code
    (`QuantDB.py:18-25`, `Project report.md:547-560`): 6xxxxx → .SH,
    0xxxxx/3xxxxx → .SZ, 4xxxxx/8xxxxx/9xxxxx → .BJ; already-suffixed
    codes pass through."""
    bare = F.regexp_extract(code, r"^(\d{6})$", 1)
    first = F.substring(bare, 1, 1)
    return (
        F.when(bare == "", code)
        .when(first == "6", F.concat(bare, F.lit(".SH")))
        .when(first.isin("0", "3"), F.concat(bare, F.lit(".SZ")))
        .otherwise(F.concat(bare, F.lit(".BJ")))
    )


def sector_id(sector_type: Column, sector_name: Column) -> Column:
    """Deterministic 16-hex sector id = md5(type + name)[:16]
    (`Project report.md:606-617`)."""
    return F.substring(F.md5(F.concat_ws("|", sector_type, sector_name)), 1, 16)


def trunc_ntz_second(ts: Column) -> Column:
    """Second-truncate a TIMESTAMP_NTZ without leaving the NTZ domain.

    ``date_trunc`` promotes NTZ to the instant type and the cast back
    converts through the session time zone, so a naive timestamp that
    falls inside a DST *gap* of the session zone does not round-trip
    (e.g. under America/New_York, 2024-03-10 02:30:45 came back as
    03:30:45). Rebuilding from extracted parts via ``make_timestamp_ntz``
    never touches the session zone. Field extraction + make_timestamp_ntz
    are all codegen'd JVM expressions — still the fast path at scale.
    """
    return F.make_timestamp_ntz(
        F.year(ts), F.month(ts), F.dayofmonth(ts),
        F.hour(ts), F.minute(ts), F.second(ts),
    )
