from .registry import ORACLES, QUERIES, query

# importing the modules registers their queries
from . import relational_queries  # noqa: E402,F401
from . import window_queries  # noqa: E402,F401
from . import alpha_queries  # noqa: E402,F401
from . import crosssection_queries  # noqa: E402,F401
from . import factor_queries  # noqa: E402,F401
from . import longtail_queries  # noqa: E402,F401
from . import pipeline_queries  # noqa: E402,F401
from . import advanced_queries  # noqa: E402,F401
from . import backtest_queries  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "query"]
