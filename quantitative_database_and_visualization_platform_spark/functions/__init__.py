from .scalar import (
    monetary_text_to_double,
    normalize_stock_code,
    sector_id,
    signed_power,
    streak_height,
)

__all__ = [
    "monetary_text_to_double",
    "normalize_stock_code",
    "sector_id",
    "signed_power",
    "streak_height",
]
