from . import crosssection, relational, timeseries

__all__ = ["crosssection", "relational", "timeseries"]
