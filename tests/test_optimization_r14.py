"""Round-14 optimization-round focused tests.

1. The alpha101 cache build reads a defaultParallelism-floored bars
   leaf, not the shared 4-partition `bars_table` leaf (r13 verdict item
   1, guide §2.2): with AQE off for the build, its pre-shuffle
   projection stages ride leaf parallelism, and cold fresh-JVM probes
   measured exec 81/83/157 s on the 4-partition leaf vs 58/60/63 s on
   the wide one. The values must stay bit-identical to the shared leaf
   (same `daily_bars` plan underneath) — pinned here, and by the
   alpha101_a-d oracle hashes at the gate.
"""

from __future__ import annotations

from quantitative_database_and_visualization_platform_spark.factors.panel import (
    _BAR_ROW_BYTES,
    bars_table,
    daily_bars,
)
from quantitative_database_and_visualization_platform_spark.session import (
    checkpoint_sized,
)

SF = "/root/testdata/sf0.001"


def test_alpha_bars_input_keeps_build_parallelism(spark):
    """The exact input construction `_alpha_table` uses: floored at
    defaultParallelism, so checkpoint_sized must NOT coalesce it down to
    the small consumer floor, and its rows must equal the shared leaf's."""
    wide = checkpoint_sized(
        spark,
        daily_bars(spark, SF),
        _BAR_ROW_BYTES,
        floor=spark.sparkContext.defaultParallelism,
    )
    shared = bars_table(spark, SF)
    # floor=defaultParallelism means: never coalesce below what the
    # (AQE-off) build produced, bounded by parallelism — unlike the
    # 4-floor shared leaf, which at this scale collapses to 4
    assert wide.rdd.getNumPartitions() >= min(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions")),
    )
    if spark.sparkContext.defaultParallelism > 4:
        assert shared.rdd.getNumPartitions() <= 4
    assert wide.exceptAll(shared).count() == 0
    assert shared.exceptAll(wide).count() == 0
