"""Per-entity time-series (rolling) operators.

The reference implements these as vectorized pandas rolling ops inside a
per-stock groupby (reference `database/functions/alpha101_engine.py:17-112`,
`Project report.md:670-682`). Here each one is a pure Column builder over a
row-based window frame, so the whole factor DAG stays inside Catalyst /
whole-stage codegen — no Python in the hot path. Only the recursive EMA
family needs `applyInPandas` (reference `basic factor_function.md:8-9`).

Frame convention: **row-based** (trading days), `rowsBetween(-(d-1), 0)`,
never range-based — this matches pandas `rolling(d)` semantics.

Null/min_periods convention: pandas `rolling(d)` emits NaN until the
window holds `d` observations; Spark window aggregates happily compute
over short/null-skipping windows. `gate()` reproduces the pandas
semantics (full window of non-null values required) and the factor suites
apply it (SURVEY.md §7.3 risk 4).

Scale: a window over `partitionBy(entity).orderBy(time)` shuffles once on
the entity key; every rolling column after that reuses the same sort, so
a 50-factor build is one shuffle, not 50. Skewed entities are bounded by
window length d (state is O(d)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(x: ColumnOrName) -> Column:
    return F.col(x) if isinstance(x, str) else x


def entity_window(partition: str = "stock_code", order: str = "trade_date", *extra_order: str) -> WindowSpec:
    """W = Window.partitionBy(entity).orderBy(time) — the per-stock axis."""
    return Window.partitionBy(partition).orderBy(order, *extra_order)


def rolling(w: WindowSpec, d: int) -> WindowSpec:
    """Trailing d-row frame (current row inclusive): pandas rolling(d)."""
    return w.rowsBetween(-(d - 1), 0)


def cumulative(w: WindowSpec) -> WindowSpec:
    return w.rowsBetween(Window.unboundedPreceding, 0)


def gate(expr: Column, x: ColumnOrName, d: int, w: WindowSpec) -> Column:
    """NULL unless the trailing d-row frame holds d non-null observations —
    pandas min_periods=d parity (SURVEY.md §7.3)."""
    return F.when(F.count(_col(x)).over(rolling(w, d)) == d, expr)


# --- direct window-aggregate mappings (alpha101_engine.py:17-45,64-77) ---


def delay(x: ColumnOrName, d: int, w: WindowSpec) -> Column:
    """lag d rows (alpha101_engine.py:17-20)."""
    return F.lag(_col(x), d).over(w)


def delta(x: ColumnOrName, d: int, w: WindowSpec) -> Column:
    """x - lag(x, d) (alpha101_engine.py:22-25)."""
    return _col(x) - F.lag(_col(x), d).over(w)


def ts_sum(x: ColumnOrName, d: int, w: WindowSpec) -> Column:
    return F.sum(_col(x)).over(rolling(w, d))


def ts_mean(x: ColumnOrName, d: int, w: WindowSpec) -> Column:
    return F.avg(_col(x)).over(rolling(w, d))


def ts_min(x: ColumnOrName, d: int, w: WindowSpec) -> Column:
    return F.min(_col(x)).over(rolling(w, d))


def ts_max(x: ColumnOrName, d: int, w: WindowSpec) -> Column:
    return F.max(_col(x)).over(rolling(w, d))


def ts_stddev(x: ColumnOrName, d: int, w: WindowSpec) -> Column:
    """Rolling *sample* std (pandas default ddof=1; alpha101_engine.py:74-77)."""
    return F.stddev_samp(_col(x)).over(rolling(w, d))


def ts_corr(x: ColumnOrName, y: ColumnOrName, d: int, w: WindowSpec) -> Column:
    """Rolling Pearson correlation (alpha101_engine.py:27-30).

    NULL when either series is constant over the frame (zero variance) —
    matching pandas/DuckDB — independent of spark.sql.ansi.enabled (under
    ANSI the unguarded corr throws DIVIDE_BY_ZERO on such frames)."""
    frame = rolling(w, d)
    cx, cy = _col(x), _col(y)
    ok = (F.stddev_samp(cx).over(frame) > 0) & (F.stddev_samp(cy).over(frame) > 0)
    return F.when(ok, F.corr(cx, cy).over(frame))


def ts_cov(x: ColumnOrName, y: ColumnOrName, d: int, w: WindowSpec) -> Column:
    """Rolling sample covariance (alpha101_engine.py:32-35). NULL unless
    the frame holds >= 2 complete (x, y) pairs (sample ddof=1)."""
    frame = rolling(w, d)
    cx, cy = _col(x), _col(y)
    pairs = F.count(F.when(cx.isNotNull() & cy.isNotNull(), 1)).over(frame)
    return F.when(pairs >= 2, F.covar_samp(cx, cy).over(frame))


def ts_product(x: ColumnOrName, d: int, w: WindowSpec) -> Column:
    """Rolling product via exp(sum(log x)) — the reference's own log trick
    (alpha101_engine.py:69-72). Sign-safe variant: handles negatives by
    tracking sign parity; null if any element is 0 handled via log(abs)."""
    c = _col(x)
    frame = rolling(w, d)
    magnitude = F.exp(F.sum(F.log(F.abs(c))).over(frame))
    neg_cnt = F.sum(F.when(c < 0, 1).otherwise(0)).over(frame)
    zero_cnt = F.sum(F.when(c == 0, 1).otherwise(0)).over(frame)
    sign = F.when(neg_cnt % 2 == 1, -1.0).otherwise(1.0)
    return F.when(zero_cnt > 0, F.lit(0.0)).otherwise(sign * magnitude)


def ts_skew(x: ColumnOrName, d: int, w: WindowSpec) -> Column:
    """Rolling skewness (`basic factor_function.md:43`). NOTE: Spark's
    skewness is the population g1; pandas/scipy skew is sample-adjusted G1
    = g1 * sqrt(n(n-1))/(n-2). We emit the sample-adjusted value to match
    the reference's scipy semantics."""
    n = F.count(_col(x)).over(rolling(w, d)).cast("double")
    g1 = F.skewness(_col(x)).over(rolling(w, d))
    return g1 * F.sqrt(n * (n - 1)) / (n - 2)


def ts_kurt(x: ColumnOrName, d: int, w: WindowSpec) -> Column:
    """Rolling excess kurtosis, sample-adjusted (pandas .kurt parity):
    G2 = ((n+1)*g2 + 6) * (n-1)/((n-2)(n-3)) where g2 is Spark's
    population excess kurtosis."""
    n = F.count(_col(x)).over(rolling(w, d)).cast("double")
    g2 = F.kurtosis(_col(x)).over(rolling(w, d))
    return ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))


def ts_zscore(x: ColumnOrName, d: int, w: WindowSpec) -> Column:
    """(x - rolling mean) / rolling std — pe_zscore_60 family
    (`basic factor_function.md:58-59`)."""
    c = _col(x)
    return (c - ts_mean(c, d, w)) / ts_stddev(c, d, w)


def ts_regr_slope(y: ColumnOrName, d: int, w: WindowSpec, x: ColumnOrName | None = None) -> Column:
    """Rolling OLS slope of y against time index (linear_reg_slope_20,
    `factor_db_ddl.md:50`). x defaults to the row_number within the
    entity, i.e. regression against 0..d-1."""
    xx = _col(x) if x is not None else F.row_number().over(w).cast("double")
    return F.regr_slope(_col(y), xx).over(rolling(w, d))


def adv(amount: ColumnOrName, d: int, w: WindowSpec) -> Column:
    """adv{d}: rolling mean dollar volume (alpha101_function.md usage)."""
    return ts_mean(amount, d, w)


def cum_sum(x: ColumnOrName, w: WindowSpec) -> Column:
    return F.sum(_col(x)).over(cumulative(w))


def cum_prod(x: ColumnOrName, w: WindowSpec) -> Column:
    """Cumulative product via exp(sum(log)) — equity curve
    (`pages/6_Sector rotation.py:154`). Assumes x > 0 (1 + ret)."""
    return F.exp(F.sum(F.log(_col(x))).over(cumulative(w)))


def normalize_to_first(x: ColumnOrName, w: WindowSpec) -> Column:
    """x / first(x) - 1 — index normalization
    (`pages/1_Market overview.py:81`)."""
    return _col(x) / F.first(_col(x), ignorenulls=True).over(cumulative(w)) - 1


# --- long-window rolling aggregates in O(rows): fixed-point running sums ---
# Spark's WindowExec re-aggregates the whole frame per output row for a
# sliding frame (no retraction), so a 250-day corr costs O(rows × 250).
# For long windows we instead take CUMULATIVE sums (computed incrementally,
# O(rows)) and difference them at distance d. Plain double cumsums would
# lose bit-parity with the oracle (summation order differs between
# engines), so each term is quantized to a fixed-point integer first —
# integer addition is associative, making the trailing sums EXACT and
# engine-identical; the final corr/sum arithmetic is then the same IEEE
# double ops on both sides. Cost of the quantization: inputs are rounded
# at 1/scale, so the result is the exact statistic of the quantized
# series (~1e-8 relative fidelity at the default scale), not of the raw
# doubles. alpha_queries._o_corr_fixed / _o_sum_fixed are the oracle twins.


def _cum_fixed(x: Column, both: Column, d: int, w: WindowSpec) -> Column:
    """Trailing-d sum of integer expression x (counted only where `both`),
    via cumulative sum minus its lag — exact decimal arithmetic, cast to
    double only after the subtraction."""
    cum = F.sum(F.when(both, x).otherwise(F.lit(0).cast("decimal(38,0)"))).over(cumulative(w))
    prev = F.coalesce(F.lag(cum, d).over(w), F.lit(0).cast("decimal(38,0)"))
    return (cum - prev).cast("double")


def _quantize(x: Column, scale: int) -> Column:
    # floor(x*scale + 0.5): identical IEEE ops on both engines (ROUND
    # diverges at "...5" boundaries); decimal(19,0) so products reach
    # decimal(38,0) without overflow
    return F.floor(x * scale + F.lit(0.5)).cast("decimal(19,0)")


def ts_sum_fixed(x: ColumnOrName, d: int, w: WindowSpec, scale: int = 100_000_000) -> Column:
    """O(rows) trailing-d sum for long windows, on the scale-quantized
    series. NULL inputs contribute nothing (matches SUM's null-skipping)."""
    c = _col(x)
    s = _cum_fixed(_quantize(c, scale), c.isNotNull(), d, w)
    return s / float(scale)


def _sql_w(part: str, order: str) -> str:
    return f"PARTITION BY {part} ORDER BY {order}"


_SQL_CUM_FRAME = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
_SQL_DEC0 = "CAST(0 AS DECIMAL(38,0))"


def _sql_q(x: str, scale: int) -> str:
    return f"CAST(FLOOR(({x}) * {scale} + 0.5D) AS DECIMAL(19,0))"


def _sql_cumdiff(x: str, both: str, d: int, part: str, order: str) -> str:
    w = _sql_w(part, order)
    cum = (
        f"SUM(CASE WHEN {both} THEN {x} ELSE {_SQL_DEC0} END)"
        f" OVER ({w} {_SQL_CUM_FRAME})"
    )
    prev = f"COALESCE(LAG({cum}, {d}) OVER ({w}), {_SQL_DEC0})"
    return f"CAST(({cum} - {prev}) AS DOUBLE)"


def ts_sum_fixed_expr(
    x: str, d: int, part: str = "code", order: str = "d", scale: int = 100_000_000
) -> Column:
    """F.expr twin of ts_sum_fixed for SQL-snippet inputs: ONE parser
    round-trip instead of ~15 py4j calls. Parses to the same expression
    tree, so values are bit-identical (pinned by the oracle parity gate)."""
    s = _sql_cumdiff(_sql_q(x, scale), f"(({x}) IS NOT NULL)", d, part, order)
    return F.expr(f"{s} / {float(scale)!r}D")


def ts_corr_fixed_expr(
    x: str, y: str, d: int, part: str = "code", order: str = "d", scale: int = 1_000_000,
    scale_y: int | None = None,
) -> Column:
    """F.expr twin of ts_corr_fixed — the Column version costs ~80 py4j
    round-trips per call (the dominant share of the alpha DAG's Python
    build time at ~50 call sites); this builds one SQL string and parses
    once. Identical quantize/cumsum/difference/corr arithmetic."""
    both = f"(({x}) IS NOT NULL AND ({y}) IS NOT NULL)"
    qx = _sql_q(x, scale)
    qy = _sql_q(y, scale_y if scale_y is not None else scale)
    n = _sql_cumdiff("CAST(1 AS DECIMAL(19,0))", both, d, part, order)
    sx = _sql_cumdiff(qx, both, d, part, order)
    sy = _sql_cumdiff(qy, both, d, part, order)
    sxx = _sql_cumdiff(f"{qx} * {qx}", both, d, part, order)
    syy = _sql_cumdiff(f"{qy} * {qy}", both, d, part, order)
    sxy = _sql_cumdiff(f"{qx} * {qy}", both, d, part, order)
    varx = f"({sxx} - {sx} * {sx} / {n})"
    vary = f"({syy} - {sy} * {sy} / {n})"
    cov = f"({sxy} - {sx} * {sy} / {n})"
    return F.expr(
        f"CASE WHEN {n} >= 2 AND {varx} > 0 AND {vary} > 0"
        f" THEN {cov} / SQRT({varx} * {vary}) END"
    )


def ts_corr_fixed(
    x: ColumnOrName, y: ColumnOrName, d: int, w: WindowSpec, scale: int = 1_000_000
) -> Column:
    """O(rows) trailing-d Pearson correlation for long windows, computed
    from exact fixed-point running sums (pairwise-complete, sample
    semantics, variance-gated like ts_corr). Scale-invariant, so the
    quantized-series corr needs no un-scaling."""
    cx, cy = _col(x), _col(y)
    both = cx.isNotNull() & cy.isNotNull()
    qx, qy = _quantize(cx, scale), _quantize(cy, scale)
    n = _cum_fixed(F.lit(1).cast("decimal(19,0)"), both, d, w)
    sx = _cum_fixed(qx, both, d, w)
    sy = _cum_fixed(qy, both, d, w)
    sxx = _cum_fixed(qx * qx, both, d, w)
    syy = _cum_fixed(qy * qy, both, d, w)
    sxy = _cum_fixed(qx * qy, both, d, w)
    varx = sxx - sx * sx / n
    vary = syy - sy * sy / n
    cov = sxy - sx * sy / n
    return F.when((n >= 2) & (varx > 0) & (vary > 0), cov / F.sqrt(varx * vary))


# --- collect_list + higher-order-function operators (no Spark builtin) ---
# O(d) per row, evaluated inside codegen'd expression eval — still JVM-side,
# no Python. For very large d an applyInPandas variant would win; window
# lengths in the reference are <= 180 so this is the right default.


def _frame_array(x: ColumnOrName, d: int, w: WindowSpec) -> Column:
    """CONTRACT: the input column must be non-null — collect_list drops
    nulls (unlike DuckDB's list() OVER, which keeps them), so a null
    would silently shift frame positions for ts_rank/ts_argmax/
    decay_linear. Callers feed raw panel columns (never null) or
    coalesce first; gate() on the same column restores min_periods
    semantics where needed."""
    return F.collect_list(_col(x)).over(rolling(w, d))


def ts_rank(x: ColumnOrName, d: int, w: WindowSpec) -> Column:
    """Percentile rank of today's value within the trailing d-row window
    (alpha101_engine.py:57-62). Tie convention: average rank (scipy
    rankdata default), result in (0, 1].

    One packed aggregate pass, not two: higher-order-function lambdas are
    interpreted (no whole-stage codegen), so each pass over the frame
    array costs real CPU — lt and eq counts share a single accumulator
    (lt*2^20 + eq; frames are ≤ a few hundred rows, far below the 2^20
    packing radix). (lt + le + 1)/2 == lt + (eq + 1)/2 exactly in integer
    arithmetic, so values are bit-identical to the two-pass form."""
    c = _col(x)
    arr = _frame_array(c, d, w)
    packed = F.aggregate(
        arr,
        F.lit(0),
        lambda acc, v: acc
        + F.when(v < c, F.lit(1 << 20)).when(v == c, F.lit(1)).otherwise(F.lit(0)),
    )
    lt = F.floor(packed / F.lit(1 << 20)).cast("int")
    eq = packed % F.lit(1 << 20)
    avg_rank = (lt + (lt + eq) + 1) / 2.0
    return avg_rank / F.size(arr)


def ts_argmax(x: ColumnOrName, d: int, w: WindowSpec) -> Column:
    """Days since the max of the trailing window: 0 = today is the max.
    The reference's code returns np.argmax (0 = oldest,
    alpha101_engine.py:47-50) while its report documents 0 = today
    (`Project report.md:676`); we implement the report's stated semantics
    (SURVEY.md §7.3 risk 5). Ties resolve to the earliest occurrence,
    matching np.argmax."""
    arr = _frame_array(x, d, w)
    return (F.size(arr) - F.array_position(arr, F.array_max(arr))).cast("double")


def ts_argmin(x: ColumnOrName, d: int, w: WindowSpec) -> Column:
    arr = _frame_array(x, d, w)
    return (F.size(arr) - F.array_position(arr, F.array_min(arr))).cast("double")


def decay_linear(x: ColumnOrName, d: int, w: WindowSpec) -> Column:
    """Linearly-weighted moving average, weights 1..d with d on the most
    recent row (alpha101_engine.py:79-84)."""
    arr = _frame_array(x, d, w)
    n = F.size(arr)
    weighted = F.zip_with(arr, F.sequence(F.lit(1), n), lambda v, i: v * i)
    return F.aggregate(weighted, F.lit(0.0), lambda acc, v: acc + v) / (n * (n + 1) / 2.0)


# --- recursive EMA family: the one honest pandas-UDF path (SURVEY §7.3) ---


def with_ema_columns(
    df: DataFrame,
    specs: dict[str, tuple[str, float]],
    entity: str = "stock_code",
    order: str = "trade_date",
    *extra_order: str,
) -> DataFrame:
    """Append exponentially-weighted means, computed per entity.

    specs: {out_col: (src_col, span)} with pandas ewm(span=..,
    adjust=False) semantics — the recursive EMA the reference uses for
    MACD/TRIX/force/mass (`basic factor_function.md:8-27`). Recursive ⇒
    not a finite window aggregate ⇒ pandas on the executor; shaped as
    mapInPandas over hash-partitioned entities with the C-implemented
    GROUPED ewm (one Python call per partition), not per-group
    applyInPandas (whose per-group Arrow/DataFrame overhead dominates
    when entities are many and short).
    """
    from collections.abc import Iterator

    import pandas as pd

    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(df.schema.fields + [StructField(name, DoubleType()) for name in specs])
    items = list(specs.items())
    sort_cols = [entity, order, *extra_order]

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(batches)  # whole partition; an entity never spans
        if not chunks:  # partitions (hash-partitioned below)
            return
        pdf = pd.concat(chunks, ignore_index=True)
        # tie-break columns keep duplicate (entity, order) rows
        # deterministic, mirroring entity_window's extra_order
        pdf = pdf.sort_values(sort_cols, kind="mergesort", ignore_index=True)
        for out, (src, span) in items:
            pdf[out] = (
                pdf[src]
                .groupby(pdf[entity], sort=False)
                .ewm(span=span, adjust=False)
                .mean()
                .reset_index(drop=True)
            )
        yield pdf

    # partition count derived from DATA SIZE, not core count: compute()
    # concatenates a whole partition into one pandas frame, so memory is
    # O(partition bytes). Catalyst's size estimate / a ~64 MB target keeps
    # partitions pandas-sized at any input scale; the core count is only
    # the floor (so a small input still uses every core).
    floor_n = df.sparkSession.sparkContext.defaultParallelism
    try:
        size_bytes = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes().toString()
        )
        n_parts = min(max(floor_n, size_bytes // (64 * 1024 * 1024) + 1), 4096)
    except Exception:  # noqa: BLE001 — stats unavailable: fall back to cores
        n_parts = floor_n
    partitioned = df.repartition(n_parts, entity)
    return partitioned.mapInPandas(compute, schema=out_schema)
