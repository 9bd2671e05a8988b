"""Independent-reference tests for the round-7 operators.

Same philosophy as test_quant_golden.py: the DuckDB oracles share each
query's formula by construction, so these recompute the semantics with
an INDEPENDENT implementation (pandas group math, plain-python sets and
adjacency maps, numpy linear algebra) at sf0.001 and compare to the
registered query's output.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from quantitative_database_and_visualization_platform_spark.factors.panel import daily_bars
from quantitative_database_and_visualization_platform_spark.plans import QUERIES
from quantitative_database_and_visualization_platform_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _pdf(spark, table: str) -> pd.DataFrame:
    return load_table(spark, SF, table).toPandas()


def _r6(x: float) -> float:
    return math.floor(x * 1_000_000 + 0.5) / 1_000_000.0


def test_small_qty_order_revenue_matches_pandas(spark):
    li = _pdf(spark, "lineitem")
    part = _pdf(spark, "part")[["p_partkey", "p_brand"]]
    avg_qty = li.groupby("l_partkey")["l_quantity"].mean()
    small = li[li["l_quantity"] < 0.4 * li["l_partkey"].map(avg_qty)].merge(
        part, left_on="l_partkey", right_on="p_partkey"
    )
    want = {
        b: (
            len(g),
            np.floor(g["l_extendedprice"] * 100 + 0.5).astype("int64").sum() / 100.0 / 7.0,
        )
        for b, g in small.groupby("p_brand")
    }
    got = {
        r["p_brand"]: (r["n_small_lines"], r["avg_yearly"])
        for r in QUERIES["small_qty_order_revenue"](spark, SF).collect()
    }
    assert set(got) == set(want)
    for b in want:
        assert got[b][0] == want[b][0], b
        assert abs(got[b][1] - want[b][1]) < 1e-9, b


def test_sole_problem_supplier_matches_python_sets(spark):
    li = _pdf(spark, "lineitem")
    s = _pdf(spark, "supplier").set_index("s_suppkey")
    n = _pdf(spark, "nation").set_index("n_nationkey")["n_name"]
    want: dict[tuple, int] = {}
    for _, g in li.groupby("l_orderkey"):
        supps = set(g["l_suppkey"])
        rsupps = set(g.loc[g["l_returnflag"] == "R", "l_suppkey"])
        if len(supps) >= 2 and len(rsupps) == 1:
            sk = next(iter(rsupps))
            key = (s.loc[sk, "s_name"], n[s.loc[sk, "s_nationkey"]])
            want[key] = want.get(key, 0) + 1
    got = {
        (r["s_name"], r["n_name"]): r["numwait"]
        for r in QUERIES["sole_problem_supplier"](spark, SF).collect()
    }
    assert got == want


def test_idle_high_balance_customers_matches_pandas(spark):
    c = _pdf(spark, "customer")
    o = _pdf(spark, "orders")
    pos = c[c["c_acctbal"] > 0]["c_acctbal"]
    ab = np.floor(pos * 100 + 0.5).astype("int64").sum() / 100.0 / len(pos)
    urgent = set(o.loc[o["o_orderpriority"] == "1-URGENT", "o_custkey"])
    rich = c[(c["c_acctbal"] > ab) & ~c["c_custkey"].isin(urgent)]
    want = {
        nk: (
            len(g),
            np.floor(g["c_acctbal"] * 100 + 0.5).astype("int64").sum() / 100.0,
        )
        for nk, g in rich.groupby("c_nationkey")
    }
    got = {
        r["c_nationkey"]: (r["n_custs"], r["total_bal"])
        for r in QUERIES["idle_high_balance_customers"](spark, SF).collect()
    }
    assert set(got) == set(want) and len(got) > 0
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-9


def test_dominant_supplier_parts_matches_pandas(spark):
    li = _pdf(spark, "lineitem")
    s = _pdf(spark, "supplier").set_index("s_suppkey")["s_name"]
    tot = li.groupby("l_partkey").agg(
        tq=("l_quantity", "sum"), ns=("l_suppkey", "nunique")
    )
    per = li.groupby(["l_partkey", "l_suppkey"])["l_quantity"].sum().reset_index()
    per = per.join(tot, on="l_partkey")
    dom = per[(per["ns"] >= 2) & (per["l_quantity"] > 0.2 * per["tq"])]
    want = {
        s[sk]: (len(g), int(g["l_quantity"].sum()))
        for sk, g in dom.groupby("l_suppkey")
    }
    got = {
        r["s_name"]: (r["n_dominated_parts"], r["dominated_qty"])
        for r in QUERIES["dominant_supplier_parts"](spark, SF).collect()
    }
    assert got == want and len(got) > 0


def test_nation_trade_triangles_matches_python_adjacency(spark):
    from itertools import combinations

    li = _pdf(spark, "lineitem")[["l_orderkey", "l_suppkey"]]
    o = _pdf(spark, "orders")[["o_orderkey", "o_custkey"]]
    c = _pdf(spark, "customer").set_index("c_custkey")["c_nationkey"]
    s = _pdf(spark, "supplier").set_index("s_suppkey")["s_nationkey"]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    a = j["o_custkey"].map(c)
    b = j["l_suppkey"].map(s)
    edges = {(min(x, y), max(x, y)) for x, y in zip(a, b) if x != y}
    nodes = {u for e in edges for u in e}
    adj = {u: set() for u in nodes}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    tri = {u: 0 for u in nodes}
    for x, y, z in combinations(sorted(nodes), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            tri[x] += 1
            tri[y] += 1
            tri[z] += 1
    got = {
        r["nationkey"]: (r["degree"], r["n_triangles"], r["clustering_coef"])
        for r in QUERIES["nation_trade_triangles"](spark, SF).collect()
    }
    assert set(got) == nodes
    for u in nodes:
        deg = len(adj[u])
        assert got[u][0] == deg
        assert got[u][1] == tri[u], u
        if deg >= 2:
            assert got[u][2] == _r6(2.0 * tri[u] / (deg * (deg - 1)))
        else:
            assert got[u][2] is None


def test_t_closeness_matches_python_distributions(spark):
    c = _pdf(spark, "customer")
    o = _pdf(spark, "orders")
    j = c.merge(o, left_on="c_custkey", right_on="o_custkey")
    gt = len(j)
    gdist = j["o_orderpriority"].value_counts().to_dict()
    got = {
        (r["c_nationkey"], r["c_mktsegment"]): (r["n_rows"], r["t_distance"])
        for r in QUERIES["t_closeness_report"](spark, SF).collect()
    }
    want_keys = set()
    for (nk, seg), g in j.groupby(["c_nationkey", "c_mktsegment"]):
        want_keys.add((nk, seg))
        ct = len(g)
        cdist = g["o_orderpriority"].value_counts().to_dict()
        tv = 0.5 * sum(
            abs(cdist.get(v, 0) / ct - gn / gt) for v, gn in gdist.items()
        )
        n_rows, t_distance = got[(nk, seg)]
        assert n_rows == ct
        assert abs(t_distance - tv) < 2e-6, (nk, seg, t_distance, tv)
    assert set(got) == want_keys


def _bars_pdf(spark) -> pd.DataFrame:
    return daily_bars(spark, SF).toPandas().sort_values(["code", "d"])


def test_ohlc_vol_estimators_match_numpy(spark):
    bars = _bars_pdf(spark)
    got = {
        r["code"]: (
            r["n_days"],
            r["parkinson_vol"],
            r["garman_klass_vol"],
            r["close_close_vol"],
        )
        for r in QUERIES["ohlc_vol_estimators"](spark, SF).collect()
    }
    for code, g in bars.groupby("code"):
        x = np.floor(np.log(g["high"] / g["low"]) * 1e4 + 0.5).astype("int64")
        y_raw = np.log(g["close"] / g["open"]) * 1e4
        y = np.where(y_raw >= 0, np.floor(y_raw + 0.5), np.ceil(y_raw - 0.5)).astype(
            "int64"
        )
        z_raw = np.log(g["close"].to_numpy()[1:] / g["close"].to_numpy()[:-1]) * 1e4
        z = np.where(z_raw >= 0, np.floor(z_raw + 0.5), np.ceil(z_raw - 0.5)).astype(
            "int64"
        )
        n = len(g)
        park = math.sqrt((x * x).sum() / 1e8 / (4 * math.log(2) * n) * 252)
        gk_num = 0.5 * (x * x).sum() - (2 * math.log(2) - 1) * (y * y).sum()
        gk = math.sqrt(gk_num / 1e8 / n * 252)
        nz = len(z)
        cc = (
            math.sqrt(
                ((z * z).sum() - z.sum() ** 2 / nz) / (nz - 1) / 1e8 * 252
            )
            if nz >= 2
            else None
        )
        gn, gp, gg, gc = got[code]
        assert gn == n
        assert abs(gp - park) < 2e-6, code
        assert abs(gg - gk) < 2e-6, code
        if cc is None:
            assert gc is None
        else:
            assert abs(gc - cc) < 2e-6, code


def test_kyle_lambda_matches_numpy_polyfit(spark):
    bars = _bars_pdf(spark)
    got = {
        r["code"]: (r["n_days"], r["lambda_bp"])
        for r in QUERIES["kyle_lambda_daily"](spark, SF).collect()
    }
    checked = 0
    for code, g in bars.groupby("code"):
        close = g["close"].to_numpy()
        raw = (close[1:] / close[:-1] - 1) * 1e4
        r = np.where(raw >= 0, np.floor(raw + 0.5), np.ceil(raw - 0.5))
        sign = np.sign(g["close"].to_numpy() - g["open"].to_numpy())[1:]
        sv = g["volume"].to_numpy()[1:] * sign
        if np.var(sv) == 0:
            assert code not in got
            continue
        slope = np.polyfit(sv.astype(float), r.astype(float), 1)[0]
        assert got[code][0] == len(r)
        assert abs(got[code][1] - slope) < 2e-5, (code, got[code][1], slope)
        checked += 1
    assert checked > 5


def test_seasonal_dow_volume_matches_pandas_rolling(spark):
    bars = _bars_pdf(spark)
    daily = (
        bars.groupby("d")["volume"].sum().astype("int64").sort_index().reset_index()
    )
    trend = daily["volume"].rolling(7, center=True).mean()
    det = daily.assign(detr=daily["volume"] - trend).dropna()
    det["dow"] = pd.to_datetime(det["d"]).dt.weekday
    got = {
        r["dow"]: (r["n_days"], r["avg_volume"], r["seasonal_component"])
        for r in QUERIES["seasonal_dow_volume"](spark, SF).collect()
    }
    for dow, g in det.groupby("dow"):
        n, av, sc = got[dow]
        assert n == len(g)
        assert abs(av - g["volume"].mean()) < 2e-6
        assert abs(sc - g["detr"].mean()) < 2e-6, (dow, sc, g["detr"].mean())
    assert set(got) == set(det["dow"].unique())


def test_hard_negative_mining_matches_numpy_cosine(spark):
    emb = _pdf(spark, "embeddings")
    vecs = np.stack(emb["embedding"].to_numpy())
    norms = np.linalg.norm(vecs, axis=1)
    got: dict[int, list] = {}
    for r in QUERIES["hard_negative_mining"](spark, SF).collect():
        got.setdefault(r["a_id"], []).append(
            (r["rn"], r["neg_id"], r["neg_label"], r["cos"])
        )
    anchors = emb[emb["vec_id"] % 100 == 0]
    assert set(got) == set(anchors["vec_id"])
    for _, a in anchors.iterrows():
        av = np.array(a["embedding"])
        cos = vecs @ av / (norms * np.linalg.norm(av))
        mask = emb["label"].to_numpy() != a["label"]
        cand = sorted(
            zip(
                np.round(cos[mask], 6),
                emb["vec_id"].to_numpy()[mask],
                emb["label"].to_numpy()[mask],
            ),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        mine = sorted(got[a["vec_id"]])
        for (rn, neg_id, neg_label, c), (wc, wid, wlab) in zip(mine, cand):
            assert neg_id == wid and neg_label == wlab
            assert abs(c - wc) < 2e-6


def test_embedding_silhouette_matches_numpy(spark):
    """Plain-float numpy silhouette (un-quantized centroids/distances)
    must agree with the engine's fixed-point form to ~1e-3 — verifies
    the SEMANTICS, not the shared quantization recipe."""
    emb = _pdf(spark, "embeddings")
    vecs = np.stack(emb["embedding"].to_numpy()).astype(float)
    labels = emb["label"].to_numpy()
    cents = {l: vecs[labels == l].mean(axis=0) for l in np.unique(labels)}
    got = {
        r["label"]: (r["n_vectors"], r["mean_silhouette"])
        for r in QUERIES["embedding_silhouette"](spark, SF).collect()
    }
    for lab in cents:
        mask = labels == lab
        d_own = ((vecs[mask] - cents[lab]) ** 2).sum(axis=1)
        d_other = np.stack(
            [((vecs[mask] - c) ** 2).sum(axis=1) for l2, c in cents.items() if l2 != lab]
        ).min(axis=0)
        s = (d_other - d_own) / np.maximum(d_own, d_other)
        n, ms = got[lab]
        assert n == mask.sum()
        assert abs(ms - s.mean()) < 1e-3, (lab, ms, s.mean())


def test_trade_reachability_matches_python_bfs(spark):
    from collections import deque

    li = _pdf(spark, "lineitem")[["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]]
    o = _pdf(spark, "orders")[["o_orderkey", "o_custkey"]]
    c = _pdf(spark, "customer").set_index("c_custkey")["c_nationkey"]
    s = _pdf(spark, "supplier").set_index("s_suppkey")["s_nationkey"]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j["src"] = j["o_custkey"].map(c)
    j["dst"] = j["l_suppkey"].map(s)
    j = j[j["src"] != j["dst"]]
    j["w"] = np.floor(j["l_extendedprice"] * (1 - j["l_discount"]) * 100 + 0.5).astype("int64")
    rev = j.groupby(["src", "dst"])["w"].sum().reset_index()
    rev = rev.sort_values(["w", "src", "dst"], ascending=[False, True, True])
    top = rev.head(40)[["src", "dst"]]
    adj: dict[int, list] = {}
    for u, v in top.itertuples(index=False):
        adj.setdefault(u, []).append(v)
    source = int(top.iloc[0]["src"])
    dist = {source: 0}
    dq = deque([source])
    while dq:
        u = dq.popleft()
        if dist[u] >= 8:
            continue
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    got = {
        r["nationkey"]: r["hops"]
        for r in QUERIES["trade_reachability_hops"](spark, SF).collect()
    }
    assert got == dist
    # structure check: the sparsified graph must actually be traversed
    # (multi-node); multi-HOP is additionally asserted at sf0.01 by the
    # oracle row counts (hops up to the graph eccentricity)
    assert len(got) > 1 and max(got.values()) >= 1


def test_pii_scrub_matches_python_re(spark):
    """Recompute the scrub with python's `re` — a THIRD regex engine
    (Java on Spark, RE2 in DuckDB), so an engine-specific match-extent
    quirk in the shared patterns cannot pass silently."""
    import re

    docs = _pdf(spark, "documents")
    em = re.compile(r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}")
    ip = re.compile(r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}")
    ph = re.compile(r"\+?\d{1,3}-\d{3}-\d{4}")
    agg: dict[str, list] = {}
    for r in docs.itertuples():
        t = (
            f"{r.text} contact user{r.doc_id}@example.com or "
            f"+1-555-{r.doc_id % 10000:04d} from 10.0.{r.doc_id % 256}"
            f".{(r.doc_id * 7) % 256}"
        )
        n_em = len(em.findall(t))
        n_ip_ = len(ip.findall(t))
        red = ph.sub("[PHONE]", ip.sub("[IP]", em.sub("[EMAIL]", t)))
        n_ph = red.count("[PHONE]")
        a = agg.setdefault(r.source, [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += n_em
        a[2] += n_ip_
        a[3] += n_ph
        a[4] += len(t) - len(red)
    got = {
        r["source"]: [
            r["n_docs"], r["n_emails"], r["n_ips"], r["n_phones"], r["chars_removed"]
        ]
        for r in QUERIES["pii_scrub_report"](spark, SF).collect()
    }
    assert got == agg
    assert all(v[1] >= v[0] and v[3] >= v[0] for v in got.values())


def test_min_unit_cost_supplier_matches_pandas(spark):
    li = _pdf(spark, "lineitem")
    s = _pdf(spark, "supplier").set_index("s_suppkey")["s_name"]
    g = li.groupby(["l_partkey", "l_suppkey"]).agg(
        cents=("l_extendedprice", lambda x: np.floor(x * 100 + 0.5).astype("int64").sum()),
        qty=("l_quantity", "sum"),
    )
    g["uc"] = g["cents"] / g["qty"] / 100.0
    want = set()
    for pk, grp in g.groupby(level=0):
        mc = grp["uc"].min()
        for (pk2, sk), row in grp[grp["uc"] == mc].iterrows():
            want.add((pk, s[sk], _r6(row["uc"])))
    got = {
        (r["l_partkey"], r["s_name"], r["unit_cost"])
        for r in QUERIES["min_unit_cost_supplier"](spark, SF).collect()
    }
    assert got == want and len(got) > 0


def test_top_value_parts_matches_pandas(spark):
    li = _pdf(spark, "lineitem")
    # half-up like both engines, not pandas' half-even .round()
    cents = (
        np.floor(li["l_extendedprice"] * (1 - li["l_discount"]) * 100 + 0.5)
        .astype("int64")
        .groupby(li["l_partkey"])
        .sum()
    )
    t, n = cents.sum(), len(cents)
    want = {pk: c / 100.0 for pk, c in cents.items() if c * n * 1.0 > 1.5 * t}
    got = {
        r["l_partkey"]: r["part_value"]
        for r in QUERIES["top_value_parts"](spark, SF).collect()
    }
    assert got == want and 0 < len(got) < len(cents)


def test_top_revenue_supplier_quarter_matches_pandas(spark):
    li = _pdf(spark, "lineitem")
    s = _pdf(spark, "supplier").set_index("s_suppkey")["s_name"]
    q = li[
        (li["l_shipdate"] >= pd.Timestamp("1996-01-01"))
        & (li["l_shipdate"] < pd.Timestamp("1996-04-01"))
    ]
    cents = (
        np.floor(q["l_extendedprice"] * (1 - q["l_discount"]) * 100 + 0.5)
        .astype("int64")
        .groupby(q["l_suppkey"])
        .sum()
    )
    m = cents.max()
    want = {(sk, s[sk], c / 100.0) for sk, c in cents.items() if c == m}
    got = {
        (r["s_suppkey"], r["s_name"], r["total_revenue"])
        for r in QUERIES["top_revenue_supplier_quarter"](spark, SF).collect()
    }
    assert got == want and len(got) >= 1


def test_variance_ratio_matches_numpy(spark):
    bars = _bars_pdf(spark)
    got = {
        r["code"]: (r["n_days"], r["vr5"])
        for r in QUERIES["variance_ratio_test"](spark, SF).collect()
    }
    checked = 0
    for code, g in bars.groupby("code"):
        close = g["close"].to_numpy()
        raw = np.log(close[1:] / close[:-1]) * 1e4
        z = np.where(raw >= 0, np.floor(raw + 0.5), np.ceil(raw - 0.5))
        if len(z) < 6 or np.var(z) == 0:
            assert code not in got
            continue
        z5 = np.convolve(z, np.ones(5), mode="valid")  # overlapping 5-sums
        vr = z5.var(ddof=1) / (5.0 * z.var(ddof=1))
        assert got[code][0] == len(z)
        assert abs(got[code][1] - vr) < 2e-6, (code, got[code][1], vr)
        checked += 1
    assert checked > 5


def test_curriculum_phases_matches_python(spark):
    """Recompute the token-budget curriculum split with a plain-python
    sort + running sum over independently recomputed quality scores."""
    docs = _pdf(spark, "documents")
    stop = {"the", "a", "of", "to", "and", "is", "in"}
    rows = []
    for r in docs.itertuples():
        t = " ".join(r.text.split()).lower().strip()
        w = t.split(" ")
        sr = sum(1 for x in w if x in stop) / len(w)
        q = 0.6 * min(len(w) / 100.0, 1.0) + 0.4 * min(sr * 10, 1.0)
        rows.append((r.source, r.doc_id, len(w), math.floor(q * 1e6 + 0.5)))
    agg: dict[tuple, list] = {}
    for source in {r[0] for r in rows}:
        sub = sorted(
            (r for r in rows if r[0] == source), key=lambda r: (-r[3], r[1])
        )
        tt = sum(r[2] for r in sub)
        ct = 0
        for _, _, n_tok, qq in sub:
            ct += n_tok
            phase = 1 if ct * 10 <= tt else (2 if ct * 10 <= 3 * tt else 3)
            a = agg.setdefault((source, phase), [0, 0, 0])
            a[0] += 1
            a[1] += n_tok
            a[2] += qq
    got = {
        (r["source"], r["phase"]): (r["n_docs"], r["phase_tokens"], r["avg_quality"])
        for r in QUERIES["curriculum_phases"](spark, SF).collect()
    }
    assert set(got) == set(agg)
    for k, (n, tok, qqs) in agg.items():
        gn, gt, gq = got[k]
        assert (gn, gt) == (n, tok), k
        assert gq == math.floor(qqs / n + 0.5) / 1e6, k
    # every source must produce all three phases at this corpus size
    assert {ph for _, ph in got} == {1, 2, 3}


def test_leadlag_cross_correlation_matches_numpy(spark):
    bars = _bars_pdf(spark)
    codes = sorted(bars["code"].unique())[:2]
    series = {}
    for c in codes:
        close = bars[bars["code"] == c].sort_values("d")["close"].to_numpy()
        raw = (close[1:] / close[:-1] - 1) * 1e4
        series[c] = np.where(raw >= 0, np.floor(raw + 0.5), np.ceil(raw - 0.5))
    x, y = series[codes[0]], series[codes[1]]
    got = {
        r["lag"]: (r["n"], r["xcorr"])
        for r in QUERIES["leadlag_cross_correlation"](spark, SF).collect()
    }
    for lag in range(-3, 4):
        # align x[i] with y[i + lag]
        if lag >= 0:
            xs, ys = x[: len(y) - lag], y[lag:]
        else:
            xs, ys = x[-lag:], y[: len(x) + lag]
        n = min(len(xs), len(ys))
        xs, ys = xs[:n], ys[:n]
        if n < 3 or np.var(xs) == 0 or np.var(ys) == 0:
            assert lag not in got
            continue
        want = np.corrcoef(xs, ys)[0, 1]
        gn, gc = got[lag]
        assert gn == n, lag
        assert abs(gc - want) < 2e-6, (lag, gc, want)
    assert len(got) == 7


def test_cusum_matches_sequential_python(spark):
    """Recompute the CUSUM with the literal RECURSION
    S_t = max(0, S_{t-1} + z_t - k) — the engine uses the prefix-sum
    identity S_t = C_t - min(0, min C), so agreement proves the
    factorization, not just the formula."""
    bars = _bars_pdf(spark)
    got = {
        r["code"]: (r["n_days"], r["n_alarm_days"], r["first_alarm"], r["max_cusum"])
        for r in QUERIES["cusum_changepoint"](spark, SF).collect()
    }
    for code, g in bars.groupby("code"):
        g = g.sort_values("d")
        close = g["close"].to_numpy()
        raw = (close[1:] / close[:-1] - 1) * 1e4
        z = np.where(raw >= 0, np.floor(raw + 0.5), np.ceil(raw - 0.5)).astype("int64")
        dates = g["d"].to_numpy()[1:]
        s, alarms, first, mx = 0, 0, None, 0
        for zt, d in zip(z, dates):
            s = max(0, s + int(zt) - 50)
            mx = max(mx, s)
            if s > 3000:
                alarms += 1
                if first is None:
                    first = d
        gn, ga, gf, gm = got[code]
        assert gn == len(z)
        assert (ga, gm) == (alarms, mx), code
        assert (gf is None and first is None) or (gf == first), code


def test_gini_matches_python_sort(spark):
    """Gini recomputed with the mean-absolute-difference definition
    G = sum_ij |x_i - x_j| / (2 n^2 mu) — an algebraically different
    formula than the engine's rank form."""
    c = _pdf(spark, "customer")
    o = _pdf(spark, "orders")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = np.floor(j["o_totalprice"] * 100 + 0.5).astype("int64")
    got = {
        r["c_nationkey"]: (r["n_customers"], r["total_revenue"], r["gini"])
        for r in QUERIES["gini_revenue_by_nation"](spark, SF).collect()
    }
    for nk, g in j.groupby("c_nationkey"):
        x = g.groupby("o_custkey")["cents"].sum().to_numpy().astype(float)
        n = len(x)
        mad = np.abs(x[:, None] - x[None, :]).sum()
        gini = mad / (2 * n * n * x.mean())
        gn, gt, gg = got[nk]
        assert gn == n
        assert abs(gt - x.sum() / 100.0) < 1e-9
        assert abs(gg - gini) < 2e-6, (nk, gg, gini)
    assert set(got) == set(j["c_nationkey"].unique())


def test_event_path_trigrams_matches_python(spark):
    from collections import Counter

    ev = load_table(spark, SF, "events").toPandas()
    ev["day"] = pd.to_datetime(ev["ts"]).dt.date
    cnt: Counter = Counter()
    for _, g in ev.groupby(["user_id", "day"]):
        path = g.sort_values(["ts", "event_id"])["event_type"].tolist()
        for i in range(len(path) - 2):
            cnt[f"{path[i]}>{path[i+1]}>{path[i+2]}"] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["trigram"], r["n"])
        for r in QUERIES["event_path_trigrams"](spark, SF).collect()
    ]
    assert got == want and len(got) == 20


def test_weighted_median_matches_python(spark):
    li = _pdf(spark, "lineitem")
    p = _pdf(spark, "part").set_index("p_partkey")["p_brand"]
    li["brand"] = li["l_partkey"].map(p)
    li["up"] = li["l_extendedprice"] / li["l_quantity"]
    got = {
        r["p_brand"]: (r["total_qty"], r["weighted_median_price"])
        for r in QUERIES["weighted_median_unit_price"](spark, SF).collect()
    }
    for brand, g in li.groupby("brand"):
        g = g.sort_values(["up", "l_orderkey", "l_linenumber"])
        w = g["l_quantity"].astype("int64").to_numpy()
        tw = w.sum()
        cw = w.cumsum()
        idx = int(np.argmax(2 * cw >= tw))  # first crossing
        wm = g["up"].to_numpy()[idx]
        gt, gm = got[brand]
        assert gt == tw
        assert gm == _r6(wm), (brand, gm, wm)
    assert set(got) == set(li["brand"].unique())


def test_join_skew_report_matches_python(spark):
    from collections import Counter

    li = _pdf(spark, "lineitem")
    got = {
        r["key_col"]: (
            r["n_rows"], r["n_keys"], r["max_key_rows"], r["skew_factor"], r["top3_keys"]
        )
        for r in QUERIES["join_skew_report"](spark, SF).collect()
    }
    for col in ("l_partkey", "l_suppkey", "l_orderkey"):
        c = Counter(li[col])
        n, k, mx = len(li), len(c), max(c.values())
        top3 = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        want = (n, k, mx, _r6(mx * k / n), ",".join(str(x) for x, _ in top3))
        assert got[col] == want, (col, got[col], want)
    assert set(got) == {"l_partkey", "l_suppkey", "l_orderkey"}


def test_bootstrap_sharpe_ci_matches_python(spark):
    """Recompute the deterministic block bootstrap with plain-python
    loops — same hash arithmetic, independent evaluation path."""
    bars = _bars_pdf(spark)
    got = {
        r["code"]: (r["n_resamples"], r["ci_lo"], r["ci_hi"])
        for r in QUERIES["bootstrap_sharpe_ci"](spark, SF).collect()
    }
    checked = 0
    for code, g in bars.groupby("code"):
        close = g.sort_values("d")["close"].to_numpy()
        raw = (close[1:] / close[:-1] - 1) * 1e4
        z = np.where(raw >= 0, np.floor(raw + 0.5), np.ceil(raw - 0.5)).astype("int64")
        n = len(z)
        shs = []
        for b in range(50):
            idxs = [
                ((b * 1000003 + (p // 5) * 7919) + p % 5) % n for p in range(n)
            ]
            zz = z[idxs].astype(float)
            if zz.var(ddof=1) == 0:
                continue
            sh = zz.mean() / zz.std(ddof=1) * math.sqrt(252.0)
            shs.append(math.floor(sh * 1e6 + 0.5) / 1e6)
        shs.sort()
        nb = len(shs)
        if nb == 0:
            assert code not in got
            continue
        lo = shs[math.ceil(nb * 0.05) - 1]
        hi = shs[math.ceil(nb * 0.95) - 1]
        gn, gl, gh = got[code]
        assert gn == nb
        assert gl == lo and gh == hi, (code, (gl, gh), (lo, hi))
        checked += 1
    assert checked > 5


def test_matryoshka_dim_audit_matches_numpy(spark):
    emb = _pdf(spark, "embeddings")
    vecs = np.stack(emb["embedding"].to_numpy()).astype(float)
    ids = emb["vec_id"].to_numpy()
    got = {
        r["probe_id"]: (r["n_overlap"], r["jaccard_10"], r["top1_full"], r["top1_trunc"])
        for r in QUERIES["matryoshka_dim_audit"](spark, SF).collect()
    }

    def top10(p_vec, dims, p_id):
        v = vecs[:, :dims]
        pv = p_vec[:dims]
        cos = np.round(
            v @ pv / (np.linalg.norm(v, axis=1) * np.linalg.norm(pv)), 6
        )
        cand = [(c, i) for c, i in zip(cos, ids) if i != p_id]
        cand.sort(key=lambda t: (-t[0], t[1]))
        return [i for _, i in cand[:10]]

    probes = emb[emb["vec_id"] % 100 == 0]
    assert set(got) == set(probes["vec_id"])
    for _, p in probes.iterrows():
        pv = np.array(p["embedding"], dtype=float)
        tf = top10(pv, 64, p["vec_id"])
        tt = top10(pv, 16, p["vec_id"])
        n = len(set(tf) & set(tt))
        gn, gj, g1f, g1t = got[p["vec_id"]]
        assert gn == n
        assert gj == _r6(n / (20 - n))
        assert g1f == tf[0] and g1t == tt[0]


def test_rake_keywords_matches_python(spark):
    """Full RAKE recomputation with plain-python dicts: phrase splitting
    on stopwords, degree/frequency word scores, quantized phrase sums."""
    from collections import defaultdict

    docs = _pdf(spark, "documents")
    stop = {"the", "a", "of", "to", "and", "is", "in"}
    phrases = []  # (phrase_words_tuple)
    for r in docs.itertuples():
        t = " ".join(r.text.split()).lower().strip()
        cur = []
        for w in t.split(" "):
            if w in stop:
                if cur:
                    phrases.append(tuple(cur))
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(tuple(cur))
    freq: dict = defaultdict(int)
    deg: dict = defaultdict(int)
    for ph in phrases:
        for w in ph:
            freq[w] += 1
            deg[w] += len(ph)
    sq = {w: math.floor(deg[w] / freq[w] * 1e6 + 0.5) for w in freq}
    by_text: dict = defaultdict(list)
    for ph in phrases:
        by_text[" ".join(ph)].append(sum(sq[w] for w in ph))
    rows = [
        (txt, len(scores), min(scores) / 1e6) for txt, scores in by_text.items()
    ]
    rows.sort(key=lambda r: (-r[2], r[0]))
    want = rows[:20]
    got = [
        (r["phrase"], r["n_occurrences"], r["rake_score"])
        for r in QUERIES["rake_keywords"](spark, SF).collect()
    ]
    assert got == want and len(got) == 20


def test_split_leakage_audit_matches_python(spark):
    """Recompute with python sets: brute-force exact Jaccard >= 0.8 over
    3-shingle sets (independent of the engine's prefix-filter pruning)
    joined to the md5-bucket split."""
    import hashlib
    from collections import defaultdict

    docs = _pdf(spark, "documents")

    def shingles(text):
        w = " ".join(text.split()).lower().strip().split(" ")
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)} if len(w) >= 3 else set()

    def split_of(doc_id):
        b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[29:32], 16) % 10
        return "train" if b < 8 else ("val" if b == 8 else "test")

    sh = {r.doc_id: shingles(r.text) for r in docs.itertuples()}
    ids = sorted(sh)
    agg: dict = defaultdict(lambda: [0, 0])
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = sh[a], sh[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            denom = len(sa) + len(sb) - inter
            j = inter / denom if denom else 0.0
            if _r6(j) >= 0.8:
                lo, hi = sorted([split_of(a), split_of(b)])
                cell = agg[(lo, hi)]
                cell[0] += 1
                cell[1] += math.floor(_r6(j) * 1e6 + 0.5)
    got = {
        (r["split_lo"], r["split_hi"]): (r["is_leak"], r["n_pairs"], r["mean_jaccard"])
        for r in QUERIES["split_leakage_audit"](spark, SF).collect()
    }
    assert set(got) == set(agg)
    for k, (n, jq) in agg.items():
        leak, gn, gj = got[k]
        assert leak == (k[0] != k[1])
        assert gn == n
        assert gj == math.floor(jq / n + 0.5) / 1e6
    assert any(lo != hi for lo, hi in got), "no cross-split pair — audit degenerate"


def test_int8_quantization_audit_matches_numpy(spark):
    emb = _pdf(spark, "embeddings")
    got = {
        r["label"]: (r["n_vectors"], r["mean_cos"], r["min_cos"])
        for r in QUERIES["int8_quantization_audit"](spark, SF).collect()
    }
    from collections import defaultdict

    agg: dict = defaultdict(list)
    for r in emb.itertuples():
        x = np.array(r.embedding, dtype=float)
        sc = np.abs(x).max()
        if sc <= 0:
            continue
        dq = np.floor(x / sc * 127 + 0.5) * sc / 127
        cos = (x @ dq) / (np.linalg.norm(x) * np.linalg.norm(dq))
        agg[r.label].append(math.floor(cos * 1e6 + 0.5))
    assert set(got) == set(agg)
    for lab, cqs in agg.items():
        n, mc, mnc = got[lab]
        assert n == len(cqs)
        assert mc == math.floor(sum(cqs) / n + 0.5) / 1e6
        assert mnc == min(cqs) / 1e6
        assert 0.99 < mnc <= 1.0  # int8 keeps cosine within ~1% on this corpus


def test_kaplan_meier_matches_lifelines_style_python(spark):
    """Recompute the product-limit estimator with a sequential python
    loop over the risk set (the textbook algorithm, not the windowed
    prefix form)."""
    o = _pdf(spark, "orders")
    li = _pdf(spark, "lineitem")
    fs = li.groupby("l_orderkey")["l_shipdate"].min()
    obs = []
    for r in o.itertuples():
        ms = fs.get(r.o_orderkey)
        if ms is None or pd.isna(ms):
            obs.append((365, False))
            continue
        lag = (ms - r.o_orderdate).days
        if lag < 0:
            continue  # excluded noise
        obs.append((min(lag, 365), lag <= 365))
    n_at_risk = len(obs)
    from collections import defaultdict

    d: dict = defaultdict(int)
    leave: dict = defaultdict(int)
    for t, ev in obs:
        leave[t] += 1
        if ev:
            d[t] += 1
    got = {
        r["t_days"]: (r["n_events"], r["n_risk"], r["survival"])
        for r in QUERIES["kaplan_meier_ship_times"](spark, SF).collect()
    }
    s = 1.0
    want = {}
    for t in sorted(leave):
        if d[t]:
            s *= 1.0 - d[t] / n_at_risk
            want[t] = (d[t], n_at_risk, s)
        n_at_risk -= leave[t]
    assert set(got) == set(want)
    for t, (dd, nr, sv) in want.items():
        gd, gn, gs = got[t]
        assert (gd, gn) == (dd, nr), t
        assert abs(gs - sv) < 2e-6, (t, gs, sv)
    # the curve must be monotonically non-increasing and start below 1
    vals = [got[t][2] for t in sorted(got)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_theil_sen_matches_python_pairs(spark):
    bars = _bars_pdf(spark)
    got = {
        r["code"]: (r["n_pairs"], r["theil_sen_slope"])
        for r in QUERIES["theil_sen_trend"](spark, SF).collect()
    }
    for code, g in bars.groupby("code"):
        c = np.floor(g.sort_values("d")["close"].to_numpy() * 100 + 0.5).astype("int64")
        n = len(c)
        slopes = []
        for i in range(n):
            for j in range(i + 1, n):
                slopes.append(math.floor((c[j] - c[i]) * 1e6 / (j - i) + 0.5))
        slopes.sort()
        npairs = len(slopes)
        med = slopes[(npairs + 1) // 2 - 1]
        gn, gs = got[code]
        assert gn == npairs
        assert gs == med / 1e6 / 100.0, (code, gs, med)
    assert set(got) == set(bars["code"].unique())
