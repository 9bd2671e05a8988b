"""Independent-reference tests for the round-5 quant operators.

The DuckDB oracles share each query's formula by construction, so a
formula error implemented identically twice would pass the parity gate.
These tests recompute the semantics with an INDEPENDENT implementation
(numpy least squares, pandas group math, plain python set arithmetic)
on sf0.001 and compare to the registered query's output.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from quantitative_database_and_visualization_platform_spark.factors.panel import daily_bars
from quantitative_database_and_visualization_platform_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"
_FM_S = 10_000


def _panel(spark) -> pd.DataFrame:
    bars = daily_bars(spark, SF)
    w = Window.partitionBy("code").orderBy("d")
    return (
        bars.select(
            "code",
            "d",
            (F.col("close") / F.lag("close", 5).over(w) - 1).alias("x"),
            (F.lead("close").over(w) / F.col("close") - 1).alias("y"),
        )
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
        .toPandas()
    )


def test_fama_macbeth_beta_matches_numpy_lstsq(spark):
    """Per-date beta/alpha must equal numpy's least-squares fit of the
    SAME quantized observations (independent algorithm: matrix lstsq vs
    the closed-form integer-moment ratio)."""
    got = {r["d"]: r for r in QUERIES["fama_macbeth_mom"](spark, SF).collect()}
    pdf = _panel(spark)
    pdf["xq"] = (pdf["x"] * _FM_S).round().astype("int64")
    pdf["yq"] = (pdf["y"] * _FM_S).round().astype("int64")
    checked = 0
    for d, g in pdf.groupby("d"):
        if d not in got:
            continue
        x, y = g["xq"].to_numpy(float), g["yq"].to_numpy(float)
        if np.var(x) == 0:
            assert got[d]["beta"] is None
            continue
        A = np.stack([x, np.ones_like(x)], axis=1)
        beta, alpha_q = np.linalg.lstsq(A, y, rcond=None)[0]
        assert abs(got[d]["beta"] - beta) < 2e-6, (d, got[d]["beta"], beta)
        assert abs(got[d]["alpha"] - alpha_q / _FM_S) < 2e-6
        checked += 1
    assert checked > 5


def test_turnover_matches_set_arithmetic(spark):
    """Leg turnover must equal 1 - |kept| / |current| computed by plain
    python set logic over the same decile memberships."""
    bars = daily_bars(spark, SF)
    w = Window.partitionBy("code").orderBy("d")
    panel = (
        bars.select(
            "code",
            "d",
            (F.col("close") / F.lag("close", 5).over(w) - 1).alias("mom_5"),
            (F.lead("close").over(w) / F.col("close") - 1).alias("fwd_ret"),
        )
        .filter(F.col("mom_5").isNotNull() & F.col("fwd_ret").isNotNull())
        .withColumn(
            "decile", F.ntile(10).over(Window.partitionBy("d").orderBy("mom_5", "code"))
        )
        .toPandas()
    )
    legs: dict[tuple[object, str], set] = {}
    for (d, dec), g in panel.groupby(["d", "decile"]):
        if dec == 10:
            legs[(d, "L")] = set(g["code"])
        elif dec == 1:
            legs[(d, "S")] = set(g["code"])
    dates = sorted({d for d, _ in legs})
    got = {r["d"]: r for r in QUERIES["backtest_turnover_cost"](spark, SF).collect()}
    checked = 0
    for i, d in enumerate(dates):
        if d not in got:
            continue
        prev = dates[i - 1] if i > 0 else None
        for leg, col in (("L", "to_long"), ("S", "to_short")):
            cur = legs.get((d, leg))
            if cur is None:
                continue  # a thin day may lack one decile
            kept = len(cur & legs.get((prev, leg), set())) if prev is not None else 0
            want = 1.0 - kept / len(cur)
            assert abs(got[d][col] - want) < 2e-6, (d, leg, got[d][col], want)
        checked += 1
    assert checked > 5


def test_vwap_slippage_matches_pandas(spark):
    """Per-day mean/std of close-vs-VWAP deviation vs pandas group math
    on the same quantized deviations."""
    bars = daily_bars(spark, SF).toPandas()
    bars = bars[(bars["volume"] > 0) & (bars["amount"] > 0)]
    sq = (
        ((bars["close"] / (bars["amount"] / bars["volume"]) - 1) * 10_000)
        .round()
        .astype("int64")
    )
    df = pd.DataFrame({"d": bars["d"], "sq": sq})
    got = {r["d"]: r for r in QUERIES["vwap_slippage_daily"](spark, SF).collect()}
    checked = 0
    for d, g in df.groupby("d"):
        want_mean = g["sq"].mean() / 10_000
        assert abs(got[d]["mean_slip"] - want_mean) < 2e-6
        if len(g) > 1 and g["sq"].var(ddof=1) > 0:
            want_std = g["sq"].std(ddof=1) / 10_000
            assert abs(got[d]["std_slip"] - want_std) < 2e-6
        checked += 1
    assert checked > 5


def test_pairs_beta_matches_numpy_rolling(spark):
    """Rolling hedge ratio vs numpy lstsq over the same 20-row windows."""
    out = QUERIES["pairs_spread_zscore"](spark, SF).orderBy("d").collect()
    bars = daily_bars(spark, SF)
    two = [
        r["code"]
        for r in bars.select("code").distinct().orderBy("code").limit(2).collect()
    ]
    w = Window.partitionBy("code").orderBy("d")
    rets = (
        bars.filter(F.col("code").isin(two))
        .select(
            "code",
            "d",
            F.round((F.col("close") / F.lag("close").over(w) - 1) * _FM_S, 0)
            .cast("long")
            .alias("rq"),
        )
        .filter(F.col("rq").isNotNull())
        .toPandas()
    )
    a = rets[rets["code"] == two[0]].set_index("d")["rq"]
    b = rets[rets["code"] == two[1]].set_index("d")["rq"]
    common = sorted(set(a.index) & set(b.index))
    x = a.loc[common].to_numpy(float)
    y = b.loc[common].to_numpy(float)
    by_d = {r["d"]: r for r in out}
    checked = 0
    for i, d in enumerate(common):
        lo = max(0, i - 19)
        xs, ys = x[lo : i + 1], y[lo : i + 1]
        if d not in by_d or by_d[d]["beta"] is None:
            continue
        A = np.stack([xs, np.ones_like(xs)], axis=1)
        beta = np.linalg.lstsq(A, ys, rcond=None)[0][0]
        assert abs(by_d[d]["beta"] - beta) < 2e-6, (d, by_d[d]["beta"], beta)
        checked += 1
    assert checked > 5


def test_event_study_car_matches_pandas_loop(spark):
    """CAR profile vs a direct pandas reimplementation (trailing volume
    average, abnormal return, per-event cumulative sums)."""
    bars = daily_bars(spark, SF).toPandas().sort_values(["code", "d"])
    bars["ret"] = bars.groupby("code")["close"].pct_change()
    g = bars.groupby("code")["volume"]
    bars["vavg"] = g.transform(lambda s: s.shift(1).rolling(20, min_periods=1).mean())
    bars["vcnt"] = g.transform(
        lambda s: s.shift(1).rolling(20, min_periods=1).count()
    ).fillna(0)
    panel = bars[bars["ret"].notna()].copy()
    panel["rn"] = panel.groupby("code").cumcount() + 1
    retq = (panel["ret"] * 1e8).round().astype("int64")
    mkt = retq.groupby(panel["d"]).mean() / 1e8
    panel["aq"] = (
        ((panel["ret"] - panel["d"].map(mkt)) * 1e8).round().astype("int64")
    )
    events = panel[(panel["vcnt"] >= 10) & (panel["volume"] > 2 * panel["vavg"])]
    idx = panel.set_index(["code", "rn"])["aq"]
    cars: dict[int, list[int]] = {k: [] for k in range(-2, 4)}
    for _, ev in events.iterrows():
        cum = 0
        for k in range(-2, 4):
            key = (ev["code"], ev["rn"] + k)
            if key in idx.index:
                cum += int(idx.loc[key])
                cars[k].append(cum)
    got = {r["offset"]: r for r in QUERIES["event_study_car"](spark, SF).collect()}
    checked = 0
    for k, vals in cars.items():
        if not vals:
            assert k not in got
            continue
        assert got[k]["n_events"] == len(vals)
        want = sum(vals) / len(vals) / 1e8
        assert abs(got[k]["avg_car"] - want) < 2e-6, (k, got[k]["avg_car"], want)
        checked += 1
    assert checked >= 4


def test_walkforward_splits_match_python_windows(spark):
    """Split boundaries and leg returns recomputed with plain lists from
    an independently-built daily panel."""
    import math
    from collections import defaultdict

    import pandas as pd

    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(["ts", "event_id"])
    ev["d"] = pd.to_datetime(ev["ts"]).dt.date
    closes = {}
    for (code, d), g in ev.groupby(["user_id", "d"]):
        closes[(code, d)] = g.iloc[-1]["value"]
    by_code = defaultdict(list)
    for (code, d), c in closes.items():
        by_code[code].append((d, c))
    rets = defaultdict(list)
    for code, seq in by_code.items():
        seq.sort()
        for (d0, c0), (d1, c1) in zip(seq, seq[1:]):
            rets[d1].append(c1 / c0 - 1)
    RS = 100_000_000
    mkt = {
        d: sum(int(round(r * RS)) for r in rs) / len(rs) / RS
        for d, rs in rets.items()
    }
    days = sorted(mkt)

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    expect = {}
    i = 0
    while i * 5 + 15 <= len(days):
        tr = days[i * 5 : i * 5 + 10]
        te = days[i * 5 + 10 : i * 5 + 15]
        expect[i] = (
            tr[0], tr[-1], te[0], te[-1],
            r6(sum(int(round(mkt[d] * RS)) for d in tr) / 10.0 / RS),
            r6(sum(int(round(mkt[d] * RS)) for d in te) / 5.0 / RS),
        )
        i += 1

    got = {
        r["split_id"]: (
            r["train_start"], r["train_end"], r["test_start"], r["test_end"],
            r["train_mkt_ret"], r["test_mkt_ret"],
        )
        for r in QUERIES["walkforward_splits"](spark, SF).collect()
    }
    assert got == expect
    assert len(got) >= 2


def test_brinson_attribution_matches_python_loops(spark):
    """Allocation/selection/interaction recomputed with dict loops from
    an independently-built panel; the Brinson identity alloc + sel +
    inter = rp − rb must hold per date to fixed-point tolerance."""
    import math
    from collections import defaultdict

    import pandas as pd

    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(["ts", "event_id"])
    ev["d"] = pd.to_datetime(ev["ts"]).dt.date
    closes = defaultdict(list)
    for (code, d), g in ev.groupby(["user_id", "d"]):
        closes[code].append((d, g.iloc[-1]["value"]))
    rows = []  # (d, code, mom5, fwd)
    for code, seq in closes.items():
        seq.sort()
        for i in range(len(seq)):
            if i >= 5 and i + 1 < len(seq):
                mom5 = seq[i][1] / seq[i - 5][1] - 1
                fwd = seq[i + 1][1] / seq[i][1] - 1
                rows.append((seq[i][0], code, mom5, fwd))
    RS = 100_000_000

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    by_d = defaultdict(list)
    for d, code, m, f in rows:
        by_d[d].append((code, m, f))
    expect = {}
    for d, rs in by_d.items():
        rs.sort(key=lambda t: (-t[1], t[0]))
        n = len(rs)
        port = {code for k, (code, _, _) in enumerate(rs, 1) if k * 2 <= n}
        cells = defaultdict(lambda: [0, 0, 0, 0])  # nb, np, rb_sum, rp_sum
        for code, _, f in rs:
            c = cells[code % 5]
            fi = int(round(f * RS))
            c[0] += 1
            c[2] += fi
            if code in port:
                c[1] += 1
                c[3] += fi
        nb_tot = sum(c[0] for c in cells.values())
        np_tot = sum(c[1] for c in cells.values())
        rb = sum(c[2] for c in cells.values()) / nb_tot / RS
        al = se = it = 0
        for c in cells.values():
            rb_s = c[2] / c[0] / RS
            rp_s = c[3] / c[1] / RS if c[1] else rb_s
            dw = c[1] / np_tot - c[0] / nb_tot
            al += int(round(dw * (rb_s - rb) * RS))
            se += int(round((c[0] / nb_tot) * (rp_s - rb_s) * RS))
            it += int(round(dw * (rp_s - rb_s) * RS))
        expect[d] = (r6(al / RS), r6(se / RS), r6(it / RS))

    got = {
        r["d"]: (r["allocation"], r["selection"], r["interaction"])
        for r in QUERIES["brinson_attribution"](spark, SF).collect()
    }
    assert set(got) == set(expect)
    for d in got:
        for a, b in zip(got[d], expect[d]):
            assert abs(a - b) <= 2e-6, (d, got[d], expect[d])
        # Brinson identity vs direct rp - rb
        rs = by_d[d]
        n = len(rs)
        rs_sorted = sorted(rs, key=lambda t: (-t[1], t[0]))
        port = [f for k, (_, _, f) in enumerate(rs_sorted, 1) if k * 2 <= n]
        rp = sum(port) / len(port)
        rb = sum(f for _, _, f in rs) / n
        assert abs(sum(got[d]) - (rp - rb)) < 1e-4, d
    assert len(got) > 10


def test_cross_factor_regression_matches_numpy_lstsq(spark):
    """Per-date 2-factor betas and R² recomputed with numpy least
    squares over the same quantized panel."""
    import math
    from collections import defaultdict

    import numpy as np
    import pandas as pd

    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(["ts", "event_id"])
    ev["d"] = pd.to_datetime(ev["ts"]).dt.date
    ev["k"] = ev["props"].str.extract(r"(\d+)").astype(float)
    panel = defaultdict(list)
    for code, g in ev.groupby("user_id"):
        byd = []
        for d, gd in g.groupby("d"):
            close = gd.iloc[-1]["value"]
            cents = (gd["value"] * 100).round().astype("int64")
            amount = float((cents * gd["k"].astype("int64")).sum()) / 100.0
            byd.append((d, close, amount))
        byd.sort()
        for i in range(len(byd)):
            if i >= 5 and i + 1 < len(byd):
                x1 = byd[i][1] / byd[i - 5][1] - 1
                x2 = math.log(max(byd[i][2], 1.0))
                r = byd[i + 1][1] / byd[i][1] - 1
                panel[byd[i][0]].append(
                    (round(x1 * 1e5) / 1e5, round(x2 * 1e5) / 1e5, round(r * 1e5) / 1e5)
                )

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    got = {
        r["d"]: (r["n"], r["beta_mom"], r["beta_liq"], r["r2"])
        for r in QUERIES["cross_factor_regression"](spark, SF).collect()
    }
    checked = 0
    for d, rows in panel.items():
        X = np.array([[a, b] for a, b, _ in rows])
        y = np.array([c for _, _, c in rows])
        Xc = X - X.mean(axis=0)
        yc = y - y.mean()
        G = Xc.T @ Xc
        if abs(np.linalg.det(G)) < 1e-12 or yc @ yc <= 0:
            continue
        beta = np.linalg.solve(G, Xc.T @ yc)
        resid = yc - Xc @ beta
        r2 = 1.0 - (resid @ resid) / (yc @ yc)
        assert d in got, d
        n, b1, b2, gr2 = got[d]
        assert n == len(rows)
        assert abs(b1 - r6(beta[0])) <= 5e-6, (d, b1, beta[0])
        assert abs(b2 - r6(beta[1])) <= 5e-6, (d, b2, beta[1])
        assert abs(gr2 - r6(r2)) <= 5e-6, (d, gr2, r2)
        assert 0.0 <= gr2 <= 1.0 + 1e-9
        checked += 1
    assert checked > 10 and checked == len(got)


def test_volume_anomaly_matches_python_windows(spark):
    """Trailing-window z-scores recomputed with list slices."""
    import math
    from collections import defaultdict

    import pandas as pd

    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(["ts", "event_id"])
    ev["d"] = pd.to_datetime(ev["ts"]).dt.date
    ev["k"] = ev["props"].str.extract(r"(\d+)").astype("int64")
    vols = defaultdict(list)
    for (code, d), g in ev.groupby(["user_id", "d"]):
        vols[code].append((d, int(g["k"].sum())))

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    expect = {}
    for code, seq in vols.items():
        seq.sort()
        for i, (d, v) in enumerate(seq):
            win = [x for _, x in seq[max(0, i - 10) : i]]
            if len(win) < 5:
                continue
            mu = sum(win) / len(win)
            var = max(sum(x * x for x in win) / len(win) - mu * mu, 0.0)
            sigma = math.sqrt(var)
            if sigma > 0 and abs((v - mu) / sigma) > 3:
                expect[(code, d)] = (v, r6((v - mu) / sigma))

    got = {
        (r["code"], r["d"]): (r["volume"], r["zscore"])
        for r in QUERIES["volume_anomaly_days"](spark, SF).collect()
    }
    assert got == expect
    assert len(got) > 5


def test_panel_gap_report_matches_python_sets(spark):
    """Gap stats recomputed with sorted day-index lists."""
    from collections import defaultdict

    import pandas as pd

    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["d"] = pd.to_datetime(ev["ts"]).dt.date
    days = sorted(ev["d"].unique())
    idx = {d: i + 1 for i, d in enumerate(days)}
    per_code = defaultdict(set)
    for r in ev.itertuples():
        per_code[r.user_id].add(r.d)
    expect = {}
    for code, ds in per_code.items():
        ixs = sorted(idx[d] for d in ds)
        span = ixs[-1] - ixs[0] + 1
        missing = span - len(ixs)
        if missing > 0:
            max_gap = max(b - a - 1 for a, b in zip(ixs, ixs[1:]))
            expect[code] = (len(ixs), span, missing, max_gap)

    got = {
        r["code"]: (r["n_obs"], r["span_days"], r["n_missing"], r["max_gap"])
        for r in QUERIES["panel_gap_report"](spark, SF).collect()
    }
    assert got == expect
    assert len(got) > 5


def test_forecast_eval_matches_python_lists(spark):
    """Seasonal-naive MAE/MAPE recomputed with list arithmetic and the
    same fixed-point accumulation."""
    import math
    from collections import defaultdict

    import pandas as pd

    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["d"] = pd.to_datetime(ev["ts"]).dt.date
    ev["k"] = ev["props"].str.extract(r"(\d+)").astype("int64")
    vols = defaultdict(list)
    for (code, d), g in ev.groupby(["user_id", "d"]):
        vols[code].append((d, int(g["k"].sum())))

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    expect = {}
    for code, seq in vols.items():
        seq.sort()
        pairs = [
            (y, seq[i - 5][1]) for i, (_, y) in enumerate(seq) if i >= 5
        ]
        if not pairs:
            continue
        mae = sum(abs(y - yh) for y, yh in pairs) / len(pairs)
        pos = [(y, yh) for y, yh in pairs if y > 0]
        mape = (
            sum(int(round(abs(y - yh) / y * 1e9)) for y, yh in pos) / 1e9 / len(pos)
        )
        expect[code] = (len(pairs), r6(mae), r6(mape))

    got = {
        r["code"]: (r["n_eval"], r["mae"], r["mape"])
        for r in QUERIES["forecast_eval_naive"](spark, SF).collect()
    }
    assert got == expect
    assert len(got) > 10


def test_m4_downsample_matches_python_buckets(spark):
    """M4 picks (first/last/min/max per pixel bucket, full tie-breaks)
    recomputed with sorted lists; every bucket's min<=first/last<=max
    envelope property checked."""
    import math
    from collections import defaultdict

    import pandas as pd

    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(["ts", "event_id"])
    ev["d"] = pd.to_datetime(ev["ts"]).dt.date
    series = defaultdict(list)
    for (code, d), g in ev.groupby(["user_id", "d"]):
        series[code].append((d, math.floor(g.iloc[-1]["value"] * 100 + 0.5)))

    expect = {}
    for code, seq in series.items():
        seq.sort()
        n = len(seq)
        buckets = defaultdict(list)
        for i, (d, c) in enumerate(seq):
            buckets[math.floor(i * 16 / n)].append((d, c))
        for bk, pts in buckets.items():
            first, last = pts[0], pts[-1]
            mn = min(pts, key=lambda t: (t[1], t[0]))
            # max value with earliest-date tie-break
            mx = sorted(pts, key=lambda t: (-t[1], t[0]))[0]
            expect[(code, bk)] = (
                first[0], first[1], last[0], last[1], mn[0], mn[1], mx[0], mx[1]
            )

    got = {
        (r["code"], r["bucket"]): (
            r["d_first"], r["v_first"], r["d_last"], r["v_last"],
            r["d_min"], r["v_min"], r["d_max"], r["v_max"],
        )
        for r in QUERIES["m4_downsample_close"](spark, SF).collect()
    }
    assert got == expect
    for (_, _), (df_, vf, dl, vl, dmn, vmn, dmx, vmx) in got.items():
        assert vmn <= vf <= vmx and vmn <= vl <= vmx
        assert dmn >= df_ and dmx >= df_ and dl >= df_


def test_top_correlated_pairs_match_numpy(spark):
    """Pairwise return correlations recomputed with numpy; top-15
    membership and 6dp values must match."""
    import math
    from collections import defaultdict

    import numpy as np
    import pandas as pd

    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(["ts", "event_id"])
    ev["d"] = pd.to_datetime(ev["ts"]).dt.date
    closes = defaultdict(dict)
    for (code, d), g in ev.groupby(["user_id", "d"]):
        closes[code][d] = g.iloc[-1]["value"]
    rets = {}
    for code, byd in closes.items():
        days = sorted(byd)
        rets[code] = {
            d1: byd[d1] / byd[d0] - 1 for d0, d1 in zip(days, days[1:])
        }

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    scored = []
    codes = sorted(rets)
    for i, a in enumerate(codes):
        for b in codes[i + 1 :]:
            common = sorted(set(rets[a]) & set(rets[b]))
            if len(common) < 20:
                continue
            xa = np.array([rets[a][d] for d in common])
            xb = np.array([rets[b][d] for d in common])
            c = float(np.corrcoef(xa, xb)[0, 1])
            if not math.isnan(c):
                scored.append((a, b, len(common), r6(c)))
    expect = sorted(scored, key=lambda t: (-t[3], t[0], t[1]))[:15]

    got = [
        (r["code_a"], r["code_b"], r["n_days"], r["correlation"])
        for r in QUERIES["top_correlated_pairs"](spark, SF).collect()
    ]
    assert len(got) == 15
    # numpy's corr differs from the engines' accumulation by ~1e-12;
    # allow one ulp at the 6th decimal on the value, exact on identity
    assert [(a, b, n) for a, b, n, _ in got] == [(a, b, n) for a, b, n, _ in expect]
    for (_, _, _, cg), (_, _, _, ce) in zip(got, expect):
        assert abs(cg - ce) <= 2e-6


def test_robust_outliers_match_python_statistics(spark):
    """Median/MAD/robust-z counts recomputed with statistics.median."""
    import math
    import statistics
    from collections import defaultdict

    import pandas as pd

    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["d"] = pd.to_datetime(ev["ts"]).dt.date
    ev["k"] = ev["props"].str.extract(r"(\d+)").astype("int64")
    vols = defaultdict(list)
    for (code, d), g in ev.groupby(["user_id", "d"]):
        vols[code].append(int(g["k"].sum()))

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    expect = {}
    for code, vs in vols.items():
        med = statistics.median(vs)
        adev = [abs(v - med) for v in vs]
        mad = statistics.median(adev)
        n_out = (
            sum(1 for a in adev if a > 3 * 1.4826 * mad) if mad > 0 else None
        )
        expect[code] = (len(vs), r6(med), r6(mad), n_out)

    got = {
        r["code"]: (r["n_days"], r["med_volume"], r["mad_volume"], r["n_outliers"])
        for r in QUERIES["robust_volume_outliers"](spark, SF).collect()
    }
    assert got == expect
    assert len(got) > 10


def test_market_concentration_matches_python_shares(spark):
    """HHI and top-5 share recomputed with dict arithmetic; HHI must sit
    in [1/n, 1]."""
    import math
    from collections import defaultdict

    import pandas as pd

    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(["ts", "event_id"])
    ev["d"] = pd.to_datetime(ev["ts"]).dt.date
    ev["k"] = ev["props"].str.extract(r"(\d+)").astype("int64")
    amounts = defaultdict(dict)
    for (code, d), g in ev.groupby(["user_id", "d"]):
        cents = (g["value"] * 100).round().astype("int64")
        amount = float((cents * g["k"]).sum()) / 100.0
        if amount > 0:
            amounts[d][code] = math.floor(amount * 100 + 0.5)

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    expect = {}
    for d, per_code in amounts.items():
        t = sum(per_code.values())
        hhi_q = sum(
            int(round((ac / t) * (ac / t) * 1e12)) for ac in per_code.values()
        )
        top5 = sum(
            ac for ac in sorted(per_code.values(), reverse=True)[:5]
        )
        expect[d] = (len(per_code), r6(hhi_q / 1e12), r6(top5 / t))

    got = {
        r["d"]: (r["n_names"], r["hhi"], r["top5_share"])
        for r in QUERIES["market_concentration_daily"](spark, SF).collect()
    }
    assert got == expect
    for d, (n, hhi, t5) in got.items():
        assert 1.0 / n - 1e-6 <= hhi <= 1.0 + 1e-6
        assert 0.0 < t5 <= 1.0 + 1e-6


def test_ic_decay_matches_scipy_spearman(spark):
    """Per-horizon mean IC recomputed with an independent Spearman
    (rank via scipy-style average ties through pandas.rank) on the same
    panel."""
    import math
    from collections import defaultdict

    import numpy as np
    import pandas as pd

    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(["ts", "event_id"])
    ev["d"] = pd.to_datetime(ev["ts"]).dt.date
    closes = defaultdict(list)
    for (code, d), g in ev.groupby(["user_id", "d"]):
        closes[code].append((d, g.iloc[-1]["value"]))
    rows = []
    for code, seq in closes.items():
        seq.sort()
        for i in range(len(seq)):
            if i < 5:
                continue
            mom = seq[i][1] / seq[i - 5][1] - 1
            for h in range(1, 6):
                if i + h < len(seq):
                    rows.append(
                        (h, seq[i][0], mom, seq[i + h][1] / seq[i][1] - 1)
                    )
    df = pd.DataFrame(rows, columns=["h", "d", "mom", "fwd"])

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    expect = {}
    for h, gh in df.groupby("h"):
        ics = []
        for d, g in gh.groupby("d"):
            rm = g["mom"].rank(method="average")
            rf = g["fwd"].rank(method="average")
            c = np.corrcoef(rm, rf)[0, 1]
            if not math.isnan(c):
                ics.append(int(round(r6(float(c)) * 1e6)))
        if ics:
            expect[h] = (len(ics), r6(sum(ics) / 1e6 / len(ics)))

    got = {
        r["horizon"]: (r["n_days"], r["mean_ic"])
        for r in QUERIES["ic_decay_profile"](spark, SF).collect()
    }
    assert set(got) == set(expect) == {1, 2, 3, 4, 5}
    for h in got:
        assert got[h][0] == expect[h][0]
        assert abs(got[h][1] - expect[h][1]) <= 3e-6, (h, got[h], expect[h])


def _bars_pd(spark) -> pd.DataFrame:
    return daily_bars(spark, SF).toPandas().sort_values(["code", "d"])


def _rets_quantized(spark) -> pd.DataFrame:
    """(code, d, ret_c) with the engine's 1e8 fixed-point quantization."""
    bars = _bars_pd(spark)
    bars["prev"] = bars.groupby("code")["close"].shift(1)
    bars = bars.dropna(subset=["prev"])
    bars["ret_c"] = (
        ((bars["close"] / bars["prev"] - 1) * 100_000_000).round().astype("int64")
    )
    return bars[["code", "d", "ret_c"]]


def _r6(x: float) -> float:
    import math

    return math.floor(x * 1_000_000 + 0.5) / 1_000_000


def test_var_cvar_matches_python_order_statistics(spark):
    """VaR/CVaR recomputed with plain python sorting: k-th worst return
    and the mean of the k worst, k = ceil(n/20)."""
    rets = _rets_quantized(spark)
    expect = {}
    for code, g in rets.groupby("code"):
        vals = sorted(zip(g["ret_c"], g["d"]))  # ties broken by date
        n = len(vals)
        k = -(-n // 20)
        worst = [v for v, _ in vals[:k]]
        expect[code] = (
            n,
            _r6(worst[-1] / 1e8),
            _r6(sum(worst) / k / 1e8),
        )
    got = {
        r["code"]: (r["n_days"], r["var_95"], r["cvar_95"])
        for r in QUERIES["var_cvar_daily"](spark, SF).collect()
    }
    assert got == expect


def test_underwater_duration_matches_python_scan(spark):
    """Underwater streaks recomputed with a sequential python scan of
    each code's fixed-point equity curve."""
    rets = _rets_quantized(spark)
    expect = {}
    for code, g in rets.groupby("code"):
        eq, peak = 0, None
        segs: list[int] = []
        for ret_c in g.sort_values("d")["ret_c"]:
            eq += ret_c
            if peak is None or eq >= peak:
                peak = eq
                segs.append(0)  # a new peak opens a segment
            else:
                segs[-1] += 1
        expect[code] = (max(segs), sum(segs), len(segs))
    got = {
        r["code"]: (
            r["max_underwater_days"],
            r["total_underwater_days"],
            r["n_segments"],
        )
        for r in QUERIES["underwater_duration"](spark, SF).collect()
    }
    assert got == expect


def test_calendar_dow_matches_python_buckets(spark):
    """Day-of-week stats recomputed with a python dict accumulation."""
    rets = _rets_quantized(spark)
    buckets: dict[int, list[int]] = {}
    for _, r in rets.iterrows():
        buckets.setdefault(pd.Timestamp(r["d"]).weekday(), []).append(r["ret_c"])
    expect = {
        dow: (
            len(v),
            _r6(sum(v) / len(v) / 1e8),
            _r6(sum(1 for x in v if x > 0) / len(v)),
            _r6((max(v) - min(v)) / 1e8),
        )
        for dow, v in buckets.items()
    }
    got = {
        r["dow"]: (r["n_obs"], r["mean_ret"], r["hit_rate"], r["ret_range"])
        for r in QUERIES["calendar_dow_effect"](spark, SF).collect()
    }
    assert got == expect
    assert len(got) == 7  # a weekday axis must not be degenerate


def test_benford_matches_python_counter(spark):
    """First-digit counts recomputed with a python Counter; expected
    rates from math.log10 directly."""
    import collections
    import math

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cnt = collections.Counter(
        int(str(int(math.floor(p)))[0])
        for p in orders["o_totalprice"]
        if p >= 1
    )
    total = sum(cnt.values())
    got = {
        r["digit"]: (r["n"], r["obs_rate"], r["benford_rate"], r["abs_dev"])
        for r in QUERIES["benford_first_digit"](spark, SF).collect()
    }
    assert set(got) == set(cnt)
    for d, n in cnt.items():
        exp_rate = _r6(math.log10(1 + 1 / d))
        assert got[d][0] == n
        assert got[d][1] == _r6(n / total)
        assert got[d][2] == exp_rate
        assert abs(got[d][3] - abs(n / total - exp_rate)) < 2e-6


def test_market_share_matches_pandas_joins(spark):
    """The Q8-shaped per-nation share recomputed with pandas merges and
    python half-up cent rounding."""
    import math

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    supp = pd.read_parquet(f"{SF}/supplier.parquet")
    nation = pd.read_parquet(f"{SF}/nation.parquet")
    region = pd.read_parquet(f"{SF}/region.parquet")
    cn = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey").merge(
        region, left_on="n_regionkey", right_on="r_regionkey"
    )
    asia_cust = set(cn.loc[cn["r_name"] == "ASIA", "c_custkey"])
    sn = supp.merge(nation, left_on="s_nationkey", right_on="n_nationkey")
    supp_nation = dict(zip(sn["s_suppkey"], sn["n_name"]))
    df = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    df = df[df["o_custkey"].isin(asia_cust)].copy()
    # HALF-UP cent rounding (pandas .round is half-even; the engines are
    # half-up on positive cents)
    df["rev_c"] = [
        int(math.floor(x * 100 + 0.5))
        for x in df["l_extendedprice"] * (1 - df["l_discount"])
    ]
    df["yr"] = pd.to_datetime(df["o_orderdate"]).dt.year
    df["supp_nation"] = df["l_suppkey"].map(supp_nation)
    totals = df.groupby("yr")["rev_c"].sum().to_dict()
    expect = {}
    for (yr, nat), g in df.groupby(["yr", "supp_nation"]):
        nat_c, tot_c = int(g["rev_c"].sum()), int(totals[yr])
        expect[(yr, nat)] = (nat_c / 100.0, tot_c / 100.0, _r6(nat_c / tot_c))
    got = {
        (r["yr"], r["supp_nation"]): (
            r["nation_revenue"],
            r["market_revenue"],
            r["mkt_share"],
        )
        for r in QUERIES["market_share_by_nation"](spark, SF).collect()
    }
    assert got == expect


def test_kline_patterns_match_python_scan(spark):
    """Pattern counts recomputed with a sequential python scan over each
    code's OHLC rows."""
    bars = _bars_pd(spark)
    expect = {}
    for code, g in bars.groupby("code"):
        g = g.sort_values("d")
        n = doji = hammer = star = bull = bear = 0
        prev = None
        for r in g.itertuples():
            n += 1
            body = abs(r.close - r.open)
            upper = r.high - max(r.open, r.close)
            lower = min(r.open, r.close) - r.low
            rng = r.high - r.low
            if rng > 0 and body <= 0.1 * rng:
                doji += 1
            if lower >= 2 * body and upper <= body and rng > 0:
                hammer += 1
            if upper >= 2 * body and lower <= body and rng > 0:
                star += 1
            if prev is not None:
                po, pc = prev
                if pc < po and r.close > r.open and r.open <= pc and r.close >= po:
                    bull += 1
                if pc > po and r.close < r.open and r.open >= pc and r.close <= po:
                    bear += 1
            prev = (r.open, r.close)
        expect[code] = (n, doji, hammer, star, bull, bear)
    got = {
        r["code"]: (
            r["n_days"], r["n_doji"], r["n_hammer"], r["n_shooting_star"],
            r["n_bull_engulf"], r["n_bear_engulf"],
        )
        for r in QUERIES["kline_pattern_screen"](spark, SF).collect()
    }
    assert got == expect


def test_percentile_bands_match_numpy_quantiles(spark):
    """Bands recomputed with numpy's linear-interpolation quantiles over
    the same fixed-point integers."""
    rets = _rets_quantized(spark)
    expect = {}
    for d, g in rets.groupby("d"):
        v = np.sort(g["ret_c"].to_numpy(dtype=np.float64))
        qs = [
            _r6(float(np.quantile(v, p, method="linear")) / 1e8)
            for p in (0.1, 0.25, 0.5, 0.75, 0.9)
        ]
        expect[pd.Timestamp(d).date()] = (len(v), *qs)
    got = {
        r["d"]: (r["n_names"], r["p10"], r["p25"], r["p50"], r["p75"], r["p90"])
        for r in QUERIES["percentile_bands_daily"](spark, SF).collect()
    }
    assert got == expect


def test_acf_profile_matches_numpy_corrcoef(spark):
    """Per-lag mean autocorrelation recomputed with numpy corrcoef over
    raw (unquantized) returns."""
    bars = _bars_pd(spark)
    bars["prev"] = bars.groupby("code")["close"].shift(1)
    bars["ret"] = bars["close"] / bars["prev"] - 1
    bars = bars.dropna(subset=["ret"])
    per_lag: dict[int, list[float]] = {}
    for code, g in bars.groupby("code"):
        r = g.sort_values("d")["ret"].to_numpy()
        for lag in range(1, 6):
            if len(r) - lag >= 10:
                c = float(np.corrcoef(r[lag:], r[:-lag])[0, 1])
                if not np.isnan(c):
                    per_lag.setdefault(lag, []).append(_r6(c))
    expect = {
        lag: (
            len(v),
            _r6(sum(int(round(x * 1e6)) for x in v) / 1e6 / len(v)),
            _r6(min(v)),
            _r6(max(v)),
        )
        for lag, v in per_lag.items()
    }
    got = {
        r["lag"]: (r["n_codes"], r["mean_acf"], r["min_acf"], r["max_acf"])
        for r in QUERIES["acf_lag_profile"](spark, SF).collect()
    }
    assert set(got) == set(expect)
    for lag in expect:
        assert got[lag][0] == expect[lag][0]
        for i in (1, 2, 3):
            assert abs(got[lag][i] - expect[lag][i]) <= 2e-6, (lag, i, got[lag], expect[lag])


def test_amihud_matches_python_loop(spark):
    """Amihud terms recomputed with a python loop over (|ret|, amount)."""
    import math

    bars = _bars_pd(spark)
    bars["prev"] = bars.groupby("code")["close"].shift(1)
    bars = bars.dropna(subset=["prev"])
    expect = {}
    for code, g in bars.groupby("code"):
        terms = []
        for r in g.itertuples():
            aret_c = int(round(abs(r.close / r.prev - 1) * 1e8))
            if r.amount > 0:
                terms.append(int(round(aret_c / 1e8 / r.amount * 1e12)))
        if terms:
            expect[code] = (
                len(terms),
                _r6(sum(terms) / len(terms) / 1e6),
            )
    got = {
        r["code"]: (r["n_days"], r["amihud_x1e6"])
        for r in QUERIES["amihud_illiquidity"](spark, SF).collect()
    }
    assert got == expect


def test_roll_spread_matches_numpy_cov(spark):
    """Serial covariance recomputed with numpy over the same quantized
    price changes; spread = 2*sqrt(-cov) when negative."""
    import math

    bars = _bars_pd(spark)
    got = {
        r["code"]: (r["n_days"], r["serial_cov"], r["roll_spread"])
        for r in QUERIES["roll_spread_estimator"](spark, SF).collect()
    }
    expect = {}
    for code, g in bars.groupby("code"):
        closes = g.sort_values("d")["close"].to_list()
        dpc = [
            int(round((b - a) * 1e6)) for a, b in zip(closes, closes[1:])
        ]
        pairs = [(y, x) for x, y in zip(dpc, dpc[1:])]  # (current, prev)
        n = len(pairs)
        if n == 0:
            expect[code] = (0, None, None)
            continue
        if n < 2:
            expect[code] = (n, None, None)
            continue
        x = np.array([p for _, p in pairs], dtype=np.float64)
        y = np.array([c for c, _ in pairs], dtype=np.float64)
        cov = float(np.cov(y, x, ddof=1)[0, 1]) / 1e12
        spread = 2 * math.sqrt(-cov) if cov < 0 else None
        expect[code] = (n, _r6(cov), _r6(spread) if spread is not None else None)
    assert set(got) == set(expect)
    for code, (n, cov, spread) in expect.items():
        assert got[code][0] == n
        if cov is None:
            assert got[code][1] is None
        else:
            assert abs(got[code][1] - cov) < 2e-6, (code, got[code], cov)
        if spread is None:
            assert got[code][2] is None
        else:
            assert abs(got[code][2] - spread) < 2e-6


def test_vol_term_structure_matches_numpy_std(spark):
    """Trailing vols recomputed with numpy sample std over the same
    1e-4-quantized returns."""
    bars = _bars_pd(spark)
    bars["prev"] = bars.groupby("code")["close"].shift(1)
    bars = bars.dropna(subset=["prev"])
    bars["r"] = ((bars["close"] / bars["prev"] - 1) * 10_000).round().astype("int64")
    expect = {}
    for code, g in bars.groupby("code"):
        r = g.sort_values("d")["r"].to_numpy(dtype=np.float64)
        if len(r) < 20:
            continue
        vols = {}
        for k in (5, 10, 20):
            vols[k] = float(np.std(r[-k:], ddof=1) * np.sqrt(252)) / 10_000
        ratio = vols[5] / vols[20] if np.std(r[-20:], ddof=1) > 0 else None
        expect[code] = (
            _r6(vols[5]), _r6(vols[10]), _r6(vols[20]),
            _r6(ratio) if ratio is not None else None,
        )
    got = {
        r["code"]: (r["vol_5"], r["vol_10"], r["vol_20"], r["vol_ratio_5_20"])
        for r in QUERIES["vol_term_structure"](spark, SF).collect()
    }
    assert set(got) == set(expect)
    for code, exp in expect.items():
        for i in range(4):
            if exp[i] is None:
                assert got[code][i] is None
            else:
                assert abs(got[code][i] - exp[i]) < 2e-6, (code, i, got[code], exp)


def test_gap_stats_match_python_loop(spark):
    bars = _bars_pd(spark)
    bars["prev"] = bars.groupby("code")["close"].shift(1)
    bars = bars.dropna(subset=["prev"])
    expect = {}
    for code, g in bars.groupby("code"):
        gaps = [int(round((r.open / r.prev - 1) * 1e8)) for r in g.itertuples()]
        expect[code] = (
            len(gaps),
            _r6(sum(gaps) / len(gaps) / 1e8),
            _r6(sum(1 for x in gaps if x > 0) / len(gaps)),
            _r6(max(gaps) / 1e8),
            _r6(min(gaps) / 1e8),
        )
    got = {
        r["code"]: (
            r["n_days"], r["mean_gap"], r["gap_up_rate"],
            r["max_gap_up"], r["max_gap_down"],
        )
        for r in QUERIES["gap_open_stats"](spark, SF).collect()
    }
    assert got == expect


def test_streaks_match_python_runlength(spark):
    rets = _rets_quantized(spark)
    expect = {}
    for code, g in rets.groupby("code"):
        signs = [1 if x > 0 else (-1 if x < 0 else 0) for x in g.sort_values("d")["ret_c"]]
        signs = [s for s in signs if s != 0]
        runs: list[tuple[int, int]] = []
        for s in signs:
            if runs and runs[-1][0] == s:
                runs[-1] = (s, runs[-1][1] + 1)
            else:
                runs.append((s, 1))
        if not runs:
            continue
        expect[code] = (
            max((l for s, l in runs if s == 1), default=0),
            max((l for s, l in runs if s == -1), default=0),
            sum(1 for s, _ in runs if s == 1),
            sum(1 for s, _ in runs if s == -1),
        )
    got = {
        r["code"]: (
            r["max_up_streak"], r["max_down_streak"],
            r["n_up_runs"], r["n_down_runs"],
        )
        for r in QUERIES["streak_analysis"](spark, SF).collect()
    }
    assert got == expect


def test_risk_ratios_match_numpy(spark):
    """Sharpe/Sortino/Calmar recomputed with numpy over the same
    1e-4-quantized returns and a python drawdown scan."""
    bars = _bars_pd(spark)
    bars["prev"] = bars.groupby("code")["close"].shift(1)
    bars = bars.dropna(subset=["prev"])
    bars["r"] = ((bars["close"] / bars["prev"] - 1) * 10_000).round().astype("int64")
    expect = {}
    for code, g in bars.groupby("code"):
        r = g.sort_values("d")["r"].to_numpy(dtype=np.float64)
        n = len(r)
        mean = r.sum() / n
        sharpe = sortino = calmar = None
        if n >= 2 and np.std(r, ddof=1) > 0:
            sharpe = _r6(float(mean / np.std(r, ddof=1) * np.sqrt(252)))
        dn = r[r < 0]
        if len(dn) > 0:
            sortino = _r6(float(mean / np.sqrt((dn ** 2).sum() / n) * np.sqrt(252)))
        eq = np.cumsum(r)
        dd = eq - np.maximum.accumulate(eq)
        if dd.min() < 0:
            calmar = _r6(float(mean * 252 / -dd.min()))
        expect[code] = (n, sharpe, sortino, calmar)
    got = {
        r["code"]: (r["n_days"], r["sharpe"], r["sortino"], r["calmar"])
        for r in QUERIES["risk_adjusted_ratios"](spark, SF).collect()
    }
    assert set(got) == set(expect)
    for code, exp in expect.items():
        assert got[code][0] == exp[0]
        for i in (1, 2, 3):
            if exp[i] is None:
                assert got[code][i] is None, (code, i, got[code])
            else:
                assert abs(got[code][i] - exp[i]) < 2e-6, (code, i, got[code], exp)


def test_scd2_intervals_match_python_scan(spark):
    """Validity intervals recomputed with a per-key python scan over the
    three deterministic snapshot versions."""
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    expect = set()
    for r in orders.itertuples():
        k, p = r.o_orderkey, r.o_orderpriority
        v2 = "9-REVISED" if k % 5 == 0 else p
        v3 = "8-FINAL" if k % 3 == 0 else ("9-REVISED" if k % 5 == 0 else p)
        seq = [(1, p), (2, v2), (3, v3)]
        intervals = []
        for ver, attr in seq:
            if intervals and intervals[-1][0] == attr:
                continue
            intervals.append((attr, ver))
        for i, (attr, vfrom) in enumerate(intervals):
            vto = intervals[i + 1][1] - 1 if i + 1 < len(intervals) else None
            expect.add((k, attr, vfrom, vto, vto is None))
    got = {
        (r["o_orderkey"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in QUERIES["scd2_history_build"](spark, SF).collect()
    }
    assert got == expect
    # the mutation rules must actually produce multi-interval histories
    assert any(not cur for (_, _, _, _, cur) in expect)


def test_pagerank_matches_python_iteration(spark):
    """PageRank recomputed with plain python dict iterations using the
    same 1e12 integer quantization (independent of both engines' join
    machinery)."""
    import math

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")[["o_orderkey", "o_custkey"]]
    cust = pd.read_parquet(f"{SF}/customer.parquet")[["c_custkey", "c_nationkey"]]
    supp = pd.read_parquet(f"{SF}/supplier.parquet")[["s_suppkey", "s_nationkey"]]
    nation = pd.read_parquet(f"{SF}/nation.parquet")
    df = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    )
    df["w"] = [
        int(math.floor(x * 100 + 0.5))
        for x in df["l_extendedprice"] * (1 - df["l_discount"])
    ]
    edges: dict[tuple[int, int], int] = {}
    for r in df.itertuples():
        key = (r.c_nationkey, r.s_nationkey)
        edges[key] = edges.get(key, 0) + r.w
    nodes = sorted(nation["n_nationkey"])
    for nd in nodes:
        edges.setdefault((nd, nd), edges.get((nd, nd), 0))
    outw: dict[int, int] = {}
    for (s, _), w in edges.items():
        outw[s] = outw.get(s, 0) + w
    n = len(nodes)
    rank = {nd: int(round(1e12 / n)) for nd in nodes}
    base = int(round(0.15 * 1e12 / n))
    for _ in range(10):
        inflow = {nd: 0 for nd in nodes}
        for (s, dst), w in edges.items():
            inflow[dst] += int(round(0.85 * rank[s] * w / outw[s]))
        rank = {nd: base + inflow[nd] for nd in nodes}
    expect = {nd: math.floor(rank[nd] / 1e12 * 1e6 + 0.5) / 1e6 for nd in nodes}
    got = {
        r["nationkey"]: r["pagerank"]
        for r in QUERIES["pagerank_nation_trade"](spark, SF).collect()
    }
    assert got == expect
    # ranks must sum to ~1 and be non-uniform
    assert abs(sum(got.values()) - 1.0) < 1e-3
    assert len(set(got.values())) > 1


def test_ma_crossover_matches_python_scan(spark):
    """Cross events and post-signal returns recomputed with a python
    scan using integer cross-products (no division)."""
    bars = _bars_pd(spark)
    expect = {}
    for code, g in bars.groupby("code"):
        g = g.sort_values("d")
        closes = [int(round(c * 100)) for c in g["close"]]
        raw = g["close"].to_list()
        rows = []
        for i in range(len(closes)):
            if i + 1 < 20:
                continue
            s5, n5 = sum(closes[i - 4 : i + 1]), 5
            s20, n20 = sum(closes[i - 19 : i + 1]), 20
            fwd = raw[i + 1] / raw[i] - 1 if i + 1 < len(raw) else None
            rows.append((s5 * n20 > s20 * n5, fwd))
        golden, death = [], []
        ng = nd = 0
        for (above, fwd), (p_above, _) in zip(rows[1:], rows[:-1]):
            if above and not p_above:
                ng += 1
                if fwd is not None:
                    golden.append(int(round(fwd * 1e8)))
            elif not above and p_above:
                nd += 1
                if fwd is not None:
                    death.append(int(round(fwd * 1e8)))
        if not rows[1:]:
            continue
        expect[code] = (
            ng,
            nd,
            _r6(sum(golden) / len(golden) / 1e8) if golden else None,
            _r6(sum(death) / len(death) / 1e8) if death else None,
        )
    got = {
        r["code"]: (
            r["n_golden"], r["n_death"],
            r["mean_ret_after_golden"], r["mean_ret_after_death"],
        )
        for r in QUERIES["ma_crossover_signals"](spark, SF).collect()
    }
    assert got == expect
    # the panel must actually produce crosses
    assert any(v[0] + v[1] > 0 for v in expect.values())


def test_rfm_scores_match_pandas_quintiles(spark):
    """RFM quintiles recomputed with a python sort + explicit ntile."""
    import datetime
    import math

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    agg = {}
    for r in orders.itertuples():
        k = r.o_custkey
        c = int(math.floor(r.o_totalprice * 100 + 0.5))
        d = pd.Timestamp(r.o_orderdate).date()
        if k not in agg:
            agg[k] = [d, 0, 0]
        agg[k][0] = max(agg[k][0], d)
        agg[k][1] += 1
        agg[k][2] += c

    def ntile(keys_sorted, n=5):
        total = len(keys_sorted)
        out = {}
        base, extra = divmod(total, n)
        idx = 0
        for b in range(1, n + 1):
            size = base + (1 if b <= extra else 0)
            for _ in range(size):
                out[keys_sorted[idx]] = b
                idx += 1
        return out

    ref = datetime.date(2002, 1, 1)
    rec = {k: (ref - v[0]).days for k, v in agg.items()}
    r_sc = ntile(sorted(agg, key=lambda k: (-rec[k], k)))
    f_sc = ntile(sorted(agg, key=lambda k: (agg[k][1], k)))
    m_sc = ntile(sorted(agg, key=lambda k: (agg[k][2], k)))
    expect = {
        k: (
            rec[k], agg[k][1], agg[k][2] / 100.0,
            r_sc[k], f_sc[k], m_sc[k],
            r_sc[k] * 100 + f_sc[k] * 10 + m_sc[k],
        )
        for k in agg
    }
    got = {
        r["custkey"]: (
            r["recency_days"], r["frequency"], r["monetary"],
            r["r_score"], r["f_score"], r["m_score"], r["rfm_segment"],
        )
        for r in QUERIES["rfm_customer_scores"](spark, SF).collect()
    }
    assert got == expect


def test_equi_depth_histogram_matches_python_ntile(spark):
    import math

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    vals = sorted(
        (int(math.floor(p * 100 + 0.5)), k)
        for k, p in zip(orders["o_orderkey"], orders["o_totalprice"])
    )
    total = len(vals)
    base, extra = divmod(total, 10)
    expect = {}
    idx = 0
    for b in range(1, 11):
        size = base + (1 if b <= extra else 0)
        chunk = [c for c, _ in vals[idx : idx + size]]
        idx += size
        expect[b] = (
            len(chunk), min(chunk) / 100.0, max(chunk) / 100.0,
            sum(chunk) / 100.0,
        )
    got = {
        r["bucket"]: (r["n_rows"], r["lo"], r["hi"], r["bucket_mass"])
        for r in QUERIES["histogram_equi_depth"](spark, SF).collect()
    }
    assert got == expect


def test_intraday_profile_matches_python_counter(spark):
    import math
    import re

    ev = pd.read_parquet(f"{SF}/events.parquet")
    agg: dict[int, list[int]] = {}
    for r in ev.itertuples():
        hr = pd.Timestamp(r.ts).hour
        k = int(re.search(r"(\d+)", r.props).group(1))
        v_c = int(math.floor(r.value * 100 + 0.5))
        if hr not in agg:
            agg[hr] = [0, 0, 0]
        agg[hr][0] += 1
        agg[hr][1] += k
        agg[hr][2] += v_c
    tv = sum(v[1] for v in agg.values())
    expect = {
        hr: (
            n, vol,
            math.floor(vol / tv * 1e6 + 0.5) / 1e6,
            math.floor(vs / n / 100.0 * 1e6 + 0.5) / 1e6,
        )
        for hr, (n, vol, vs) in agg.items()
    }
    got = {
        r["hr"]: (r["n_events"], r["volume"], r["volume_share"], r["mean_value"])
        for r in QUERIES["intraday_hour_profile"](spark, SF).collect()
    }
    assert got == expect
    assert len(got) == 24


def test_out_of_orderness_matches_python_scan(spark):
    """Lateness recomputed with a python per-user scan in simulated
    arrival order (same md5 jitter)."""
    import hashlib
    import math

    # read through the engine's loader: the parquet carries NANOS
    # timestamps and pandas' floor-to-micros differs from the engines'
    # conversion on near-tie rows — the golden recomputes the LOGIC, not
    # the ingestion
    from pyspark.sql import functions as SF_
    from quantitative_database_and_visualization_platform_spark.sources.catalog import load_table

    ev = load_table(spark, SF, "events").select(
        "event_id", "user_id", "event_type",
        SF_.unix_micros(SF_.col("ts").cast("timestamp")).alias("ev_us"),
    ).collect()
    rows = []
    for r in ev:
        jit = int(hashlib.md5(str(r.event_id).encode()).hexdigest()[:6], 16) % 172_800
        rows.append((r.user_id, r.event_type, r.ev_us, r.ev_us + jit * 1_000_000, r.event_id))
    per_user: dict[int, list] = {}
    for u, et, ev_us, arr, eid in rows:
        per_user.setdefault(u, []).append((arr, eid, ev_us, et))
    agg: dict[str, list[int]] = {}
    for u, lst in per_user.items():
        mx = None
        for arr, eid, ev_us, et in sorted(lst):
            # both engines' GREATEST ignores the NULL running max, so the
            # first arrival per user counts with lateness 0
            late = max((mx - ev_us), 0) if mx is not None else 0
            agg.setdefault(et, []).append(late)
            mx = ev_us if mx is None else max(mx, ev_us)
    expect = {}
    for et, v in agg.items():
        s = sorted(v)
        idx = (len(s) - 1) * 0.95
        lo, hi = int(math.floor(idx)), int(math.ceil(idx))
        p95 = s[lo] + (s[hi] - s[lo]) * (idx - lo)
        expect[et] = (
            len(v),
            sum(1 for x in v if x > 0),
            math.floor(sum(1 for x in v if x > 0) / len(v) * 1e6 + 0.5) / 1e6,
            math.floor(p95 / 1e6 * 1e6 + 0.5) / 1e6,
            math.floor(max(v) / 1e6 * 1e6 + 0.5) / 1e6,
        )
    got = {
        r["event_type"]: (
            r["n_events"], r["n_late"], r["late_ratio"],
            r["p95_late_s"], r["max_late_s"],
        )
        for r in QUERIES["out_of_orderness_profile"](spark, SF).collect()
    }
    assert set(got) == set(expect)
    for et, exp in expect.items():
        assert got[et][:3] == exp[:3], (et, got[et], exp)
        assert abs(got[et][3] - exp[3]) < 2e-6
        assert abs(got[et][4] - exp[4]) < 2e-6
    assert any(v[1] > 0 for v in expect.values())  # disorder must exist


def test_order_priority_delay_matches_pandas(spark):
    import math

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    j = li.merge(orders[["o_orderkey", "o_orderdate"]], left_on="l_orderkey",
                 right_on="o_orderkey")
    late_keys = set(
        j.loc[
            pd.to_datetime(j["l_shipdate"])
            > pd.to_datetime(j["o_orderdate"]) + pd.Timedelta(days=90),
            "l_orderkey",
        ]
    )
    expect = {}
    orders["yr"] = pd.to_datetime(orders["o_orderdate"]).dt.year
    for (yr, pri), g in orders.groupby(["yr", "o_orderpriority"]):
        n = len(g)
        d = int(g["o_orderkey"].isin(late_keys).sum())
        expect[(yr, pri)] = (n, d, math.floor(d / n * 1e6 + 0.5) / 1e6)
    got = {
        (r["yr"], r["o_orderpriority"]): (
            r["n_orders"], r["n_delayed"], r["delayed_ratio"],
        )
        for r in QUERIES["order_priority_delay"](spark, SF).collect()
    }
    assert got == expect


def test_volume_price_corr_matches_numpy(spark):
    bars = _bars_pd(spark)
    expect = {}
    for code, g in bars.groupby("code"):
        g = g.sort_values("d")
        aret, dvol = [], []
        prev_c = prev_v = None
        for r in g.itertuples():
            if prev_c is not None and prev_v not in (None, 0):
                aret.append(abs(r.close / prev_c - 1))
                dvol.append(r.volume / prev_v - 1)
            prev_c, prev_v = r.close, r.volume
        if len(aret) >= 2:
            c = float(np.corrcoef(aret, dvol)[0, 1])
            if not np.isnan(c):
                expect[code] = (len(aret), _r6(c))
    got = {
        r["code"]: (r["n_days"], r["vol_price_corr"])
        for r in QUERIES["volume_price_corr"](spark, SF).collect()
    }
    assert set(got) == set(expect)
    for code, (n, c) in expect.items():
        assert got[code][0] == n
        assert abs(got[code][1] - c) <= 2e-6, (code, got[code], c)


def test_extreme_day_concentration_matches_python(spark):
    import math

    rets = _rets_quantized(spark)
    expect = {}
    for code, g in rets.groupby("code"):
        a = sorted((abs(x) for x in g["ret_c"]), reverse=True)
        tot = sum(a)
        if tot > 0:
            expect[code] = (
                len(a),
                math.floor(sum(a[:5]) / tot * 1e6 + 0.5) / 1e6,
            )
    got = {
        r["code"]: (r["n_days"], r["top5_abs_share"])
        for r in QUERIES["extreme_day_concentration"](spark, SF).collect()
    }
    assert got == expect


def test_nation_trade_balance_matches_pandas(spark):
    import math

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")[["o_orderkey", "o_custkey"]]
    cust = pd.read_parquet(f"{SF}/customer.parquet")[["c_custkey", "c_nationkey"]]
    supp = pd.read_parquet(f"{SF}/supplier.parquet")[["s_suppkey", "s_nationkey"]]
    nation = pd.read_parquet(f"{SF}/nation.parquet")
    names = dict(zip(nation["n_nationkey"], nation["n_name"]))
    df = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    )
    df["rev_c"] = [
        int(math.floor(x * 100 + 0.5))
        for x in df["l_extendedprice"] * (1 - df["l_discount"])
    ]
    earned: dict[str, int] = {}
    spent: dict[str, int] = {}
    for r in df.itertuples():
        earned[names[r.s_nationkey]] = earned.get(names[r.s_nationkey], 0) + r.rev_c
        spent[names[r.c_nationkey]] = spent.get(names[r.c_nationkey], 0) + r.rev_c
    expect = {
        n: (
            earned.get(n, 0) / 100.0,
            spent.get(n, 0) / 100.0,
            (earned.get(n, 0) - spent.get(n, 0)) / 100.0,
        )
        for n in set(earned) | set(spent)
    }
    got = {
        r["nation"]: (r["earned"], r["spent"], r["balance"])
        for r in QUERIES["nation_trade_balance"](spark, SF).collect()
    }
    assert got == expect


def test_sector_breadth_matches_python(spark):
    import math

    bars = _bars_pd(spark)
    rows = []
    for code, g in bars.groupby("code"):
        g = g.sort_values("d")
        cents = [int(round(c * 100)) for c in g["close"]]
        ds = g["d"].to_list()
        for i in range(len(cents)):
            if i + 1 < 20:
                continue
            s20 = sum(cents[i - 19 : i + 1])
            rows.append((ds[i], code % 5, cents[i] * 20 > s20))
    agg: dict[tuple, list[bool]] = {}
    for d, sec, above in rows:
        agg.setdefault((pd.Timestamp(d).date(), sec), []).append(above)
    expect = {
        k: (
            len(v), sum(v),
            math.floor(sum(v) / len(v) * 1e6 + 0.5) / 1e6,
        )
        for k, v in agg.items()
    }
    got = {
        (r["d"], r["sector"]): (r["n_names"], r["n_above_ma20"], r["breadth"])
        for r in QUERIES["sector_breadth_daily"](spark, SF).collect()
    }
    assert got == expect


def test_order_cadence_matches_python(spark):
    import math

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    expect = {}
    for k, g in orders.groupby("o_custkey"):
        seq = sorted(
            (pd.Timestamp(r.o_orderdate).date(), r.o_orderkey)
            for r in g.itertuples()
        )
        gaps = [
            (b[0] - a[0]).days for a, b in zip(seq, seq[1:])
        ]
        if len(gaps) >= 2:
            expect[k] = (
                len(gaps) + 1,
                math.floor(sum(gaps) / len(gaps) * 1e6 + 0.5) / 1e6,
                max(gaps),
                sum(gaps),
            )
    got = {
        r["custkey"]: (
            r["n_orders"], r["mean_gap_days"], r["max_gap_days"], r["span_days"],
        )
        for r in QUERIES["order_cadence_stats"](spark, SF).collect()
    }
    assert got == expect


def test_supplier_concentration_matches_python(spark):
    import math

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    part = pd.read_parquet(f"{SF}/part.parquet")[["p_partkey", "p_type"]]
    df = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    df["rev_c"] = [
        int(math.floor(x * 100 + 0.5))
        for x in df["l_extendedprice"] * (1 - df["l_discount"])
    ]
    expect = {}
    for pt, g in df.groupby("p_type"):
        by_supp = g.groupby("l_suppkey")["rev_c"].sum()
        t = int(by_supp.sum())
        hhi_c = sum(
            int(round((int(v) / t) * (int(v) / t) * 1e12)) for v in by_supp
        )
        expect[pt] = (
            len(by_supp),
            math.floor(hhi_c / 1e12 * 1e6 + 0.5) / 1e6,
            math.floor(int(by_supp.max()) / t * 1e6 + 0.5) / 1e6,
        )
    got = {
        r["p_type"]: (r["n_suppliers"], r["hhi"], r["top_share"])
        for r in QUERIES["supplier_concentration_by_type"](spark, SF).collect()
    }
    assert got == expect


def test_cube_matches_pandas_subsets(spark):
    import math

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    nation = pd.read_parquet(f"{SF}/nation.parquet")
    df = orders.merge(cust, left_on="o_custkey", right_on="c_custkey").merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    )
    df["price_c"] = [
        int(math.floor(x * 100 + 0.5)) for x in df["o_totalprice"]
    ]
    expect = {}
    def add(key, g):
        expect[key] = (len(g), int(g["price_c"].sum()) / 100.0)
    for (n, s), g in df.groupby(["n_name", "c_mktsegment"]):
        add((n, s, 0, 0), g)
    for n, g in df.groupby("n_name"):
        add((n, None, 0, 1), g)
    for s, g in df.groupby("c_mktsegment"):
        add((None, s, 1, 0), g)
    add((None, None, 1, 1), df)
    got = {
        (r["nation"], r["segment"], r["g_nation"], r["g_segment"]): (
            r["n_orders"], r["revenue"],
        )
        for r in QUERIES["cube_nation_segment"](spark, SF).collect()
    }
    assert got == expect


def test_sql_interface_matches_pandas(spark):
    import math

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    df = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey").merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    )
    df = df[pd.to_datetime(df["o_orderdate"]) >= pd.Timestamp("1996-01-01")]
    df["rev_c"] = [
        int(math.floor(x * 100 + 0.5))
        for x in df["l_extendedprice"] * (1 - df["l_discount"])
    ]
    expect = {
        s: (g["o_orderkey"].nunique(), int(g["rev_c"].sum()) / 100.0)
        for s, g in df.groupby("c_mktsegment")
    }
    got = {
        r["segment"]: (r["n_orders"], r["revenue"])
        for r in QUERIES["sql_interface_revenue"](spark, SF).collect()
    }
    assert got == expect
