"""Structured Streaming extensions (SURVEY.md §2.10): the tick→bar
aggregation the reference's tick store exists to serve, expressed as an
event-time streaming job with watermarked late-data handling.
"""

from .hll_sink import read_hll_estimates, start_hll_sink  # noqa: F401
from .rollup_sink import read_rollup, start_rollup_sink  # noqa: F401
from .session_windows import session_stats  # noqa: F401
from .span_dedup import read_span_pairs, start_span_anchor_sink  # noqa: F401
from .stateful import running_user_stats, streaming_funnel_levels  # noqa: F401
from .tick_bars import (  # noqa: F401
    click_purchase_interval_join,
    click_purchase_outer_join,
    sliding_type_stats,
    stream_events,
    streaming_minute_bars,
)
