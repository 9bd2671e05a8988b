"""Factor builders (SURVEY.md §2.9): the reference's technical / momentum /
value / EMA-recursive factor suites, composed from the window-op library
(`operators/timeseries.py`) over the daily-bar panel (`factors/panel.py`).

Reference definitions: `database/functions/basic factor_function.md:6-59`,
stored schemas `database/ddl/factor_db_ddl.md:37-133`.
"""

from .panel import daily_bars  # noqa: F401
