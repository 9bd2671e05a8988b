"""Round-11 goldens: pure-python recomputes (the third independent
implementation next to the Spark plan and the DuckDB oracle) for the
round-11 additions — the blocked pair-screen production twins, the
corpus-sized DBSCAN form, and the six new market panels
(updown_capture, semibeta_downside, comoment_coskew,
duration_clustering, lottery_max_factor, volume_profile_poc)."""

from __future__ import annotations

import math
from collections import defaultdict

from quantitative_database_and_visualization_platform_spark.factors.panel import daily_bars
from quantitative_database_and_visualization_platform_spark.plans import QUERIES
from quantitative_database_and_visualization_platform_spark.plans.backtest_queries import (
    _PAIR_BLOCK_TARGET,
)
from quantitative_database_and_visualization_platform_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _round6(x: float) -> float:
    return math.floor(x * 1_000_000 + 0.5) / 1_000_000.0


def _rq_half_away(v: float) -> int:
    """ROUND(x, 0) half-away-from-zero, the convention both engines use."""
    return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)


def _bars_by_code(spark, sf=SF):
    bars = daily_bars(spark, sf).toPandas()
    out = {}
    for code, grp in bars.sort_values("d").groupby("code"):
        out[code] = grp
    return out


def _n_blocks(spark, sf):
    n = (
        load_table(spark, sf, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    return max(1, (n + _PAIR_BLOCK_TARGET - 1) // _PAIR_BLOCK_TARGET)


def _pair_cands_python(spark, sf, nb=None):
    """Mirror of _cand_pairs: (c, ca, cb, n_days) sorted, ALL candidates
    (caller slices the limit)."""
    rets = defaultdict(dict)
    for code, grp in _bars_by_code(spark, sf).items():
        closes, days = list(grp["close"]), list(grp["d"])
        for t in range(1, len(closes)):
            rets[code][days[t]] = closes[t] / closes[t - 1] - 1
    codes = sorted(rets)
    cands = []
    for i, ca in enumerate(codes):
        for cb in codes[i + 1 :]:
            if nb is not None and ca % nb != cb % nb:
                continue
            common = sorted(set(rets[ca]) & set(rets[cb]))
            if len(common) < 20:
                continue
            xs = [rets[ca][d] for d in common]
            ys = [rets[cb][d] for d in common]
            n = len(common)
            mx, my = sum(xs) / n, sum(ys) / n
            cov = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
            vx = sum((a - mx) ** 2 for a in xs)
            vy = sum((b - my) ** 2 for b in ys)
            if vx <= 0 or vy <= 0:
                continue
            cands.append((_round6(cov / math.sqrt(vx * vy)), ca, cb, n))
    cands.sort(key=lambda t: (-t[0], t[1], t[2]))
    return cands


def test_blocked_pairs_matches_python(spark):
    """top_correlated_pairs_blocked at sf0.01 (150 codes -> 5 blocks,
    so the block predicate actually prunes)."""
    nb = _n_blocks(spark, SF01)
    assert nb == 5  # 150 codes / 32-name target
    got = {
        (r["code_a"], r["code_b"]): (r["n_days"], r["correlation"])
        for r in QUERIES["top_correlated_pairs_blocked"](spark, SF01).collect()
    }
    cands = _pair_cands_python(spark, SF01, nb)
    want = {(ca, cb): (n, c) for c, ca, cb, n in cands[:15]}
    assert want and got == want


def test_blocked_twins_degenerate_equal_unblocked(spark):
    """At sf0.001 the universe (15 codes) fits ONE block, so every
    blocked twin must return EXACTLY its unblocked sibling's rows —
    the block restriction is provably a no-op at nb=1."""
    assert _n_blocks(spark, SF) == 1
    for blocked, plain in [
        ("top_correlated_pairs_blocked", "top_correlated_pairs"),
        ("cointegration_screen_blocked", "cointegration_screen"),
        ("granger_causality_screen_blocked", "granger_causality_screen"),
    ]:
        got_b = sorted(
            tuple(r) for r in QUERIES[blocked](spark, SF).collect()
        )
        got_p = sorted(
            tuple(r) for r in QUERIES[plain](spark, SF).collect()
        )
        assert got_b == got_p, blocked


def test_blocked_screens_block_invariant(spark):
    """Every pair emitted by a blocked screen shares a block — the
    operator definition the oracle re-derives."""
    nb = _n_blocks(spark, SF01)
    for name in [
        "top_correlated_pairs_blocked",
        "cointegration_screen_blocked",
        "granger_causality_screen_blocked",
    ]:
        rows = QUERIES[name](spark, SF01).collect()
        assert rows, name
        for r in rows:
            assert r["code_a"] % nb == r["code_b"] % nb, (name, r)


def test_planes_cte_matches_python():
    """The oracle's bin()/length twin must equal planes_for_corpus for
    every corpus size class (the exact-integer equivalence the sized
    dbscan hash depends on)."""
    import duckdb

    from quantitative_database_and_visualization_platform_spark.pipeline.embeddings import (
        planes_for_corpus,
    )

    ns = [1, 2, 255, 256, 257, 500, 512, 513, 600, 1024, 1025, 2000,
          5000, 100_000, 10_000_000_000]
    for n in ns:
        sql = f"SELECT GREATEST(1, length(bin(({n} - 1) // 256)))"
        got = duckdb.sql(sql).fetchone()[0]
        assert got == planes_for_corpus(n, 256), n


def test_dbscan_sized_matches_python(spark):
    """Full-python recompute of the SIZED classification: plane count
    from planes_for_corpus(n), md5-Rademacher buckets from first
    principles, neighbor = same-bucket AND quantized cosine >= tau."""
    import hashlib

    from quantitative_database_and_visualization_platform_spark.pipeline.embeddings import (
        DIMS,
        planes_for_corpus,
    )

    emb = load_table(spark, SF, "embeddings").toPandas()
    n_planes = planes_for_corpus(len(emb), 256)
    got = {
        r["label"]: (r["n_core"], r["n_border"], r["n_noise"], r["mean_neighbors"])
        for r in QUERIES["embedding_dbscan_sized"](spark, SF).collect()
    }
    weights = [
        [
            1.0
            if hashlib.md5(f"p{p}_{j}".encode()).hexdigest()[0] >= "8"
            else -1.0
            for j in range(DIMS)
        ]
        for p in range(n_planes)
    ]
    rows = [
        (int(r.vec_id), int(r.label), [float(x) for x in r.embedding])
        for r in emb.itertuples()
    ]
    buckets = defaultdict(list)
    for vid, lab, v in rows:
        bits = "".join(
            "1" if sum(x * s for x, s in zip(v, w)) >= 0 else "0"
            for w in weights
        )
        buckets[bits].append((vid, v))

    def cosq(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        return math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e9 + 0.5)

    nbrs = defaultdict(set)
    for members in buckets.values():
        for x, ex in members:
            for y, ey in members:
                if x != y and cosq(ex, ey) >= 200_000_000:
                    nbrs[x].add(y)
    core = {v for v, ns in nbrs.items() if len(ns) >= 3}
    per_label = defaultdict(lambda: [0, 0, 0, 0, 0])
    for vid, lab, _ in rows:
        acc = per_label[lab]
        acc[4] += 1
        acc[3] += len(nbrs.get(vid, ()))
        if vid in core:
            acc[0] += 1
        elif nbrs.get(vid) and nbrs[vid] & core:
            acc[1] += 1
        else:
            acc[2] += 1
    want = {
        lab: (c, b, n, _round6(s / t))
        for lab, (c, b, n, s, t) in per_label.items()
    }
    assert want and got == want


def _rets_mkt_python(spark, sf=SF):
    """(code, d) -> (rq, mq): per-code 1e4-grid returns joined with the
    round-half-up equal-weight market mean on the same grid."""
    rq_by_day = defaultdict(dict)
    for code, grp in _bars_by_code(spark, sf).items():
        closes, days = list(grp["close"]), list(grp["d"])
        for t in range(1, len(closes)):
            v = (closes[t] / closes[t - 1] - 1) * 10_000
            rq_by_day[days[t]][code] = _rq_half_away(v)
    out = {}
    for d, per_code in rq_by_day.items():
        s, n = sum(per_code.values()), len(per_code)
        mq = math.floor(s / n + 0.5)
        for code, rq in per_code.items():
            out[(code, d)] = (rq, mq)
    return out


def test_updown_capture_matches_python(spark):
    got = {
        r["code"]: (r["n_up"], r["n_down"], r["up_capture"], r["down_capture"])
        for r in QUERIES["updown_capture"](spark, SF).collect()
    }
    per_code = defaultdict(list)
    for (code, _), (rq, mq) in _rets_mkt_python(spark).items():
        per_code[code].append((rq, mq))
    want = {}
    for code, obs in per_code.items():
        ups = [(r, m) for r, m in obs if m > 0]
        dns = [(r, m) for r, m in obs if m < 0]
        up = (
            _round6(sum(r for r, _ in ups) / sum(m for _, m in ups))
            if ups
            else None
        )
        dn = (
            _round6(sum(r for r, _ in dns) / sum(m for _, m in dns))
            if dns
            else None
        )
        want[code] = (len(ups), len(dns), up, dn)
    assert want and got == want


def test_semibeta_matches_python(spark):
    got = {
        r["code"]: (
            r["n_down"],
            r["n_up"],
            r["beta_down"],
            r["beta_up"],
            r["beta_spread"],
        )
        for r in QUERIES["semibeta_downside"](spark, SF).collect()
    }
    per_code = defaultdict(list)
    for (code, _), (rq, mq) in _rets_mkt_python(spark).items():
        per_code[code].append((rq, mq))

    def beta(obs):
        n = len(obs)
        if n < 5:
            return None
        sx = sum(r for r, _ in obs)
        sm = sum(m for _, m in obs)
        sxm = sum(r * m for r, m in obs)
        smm = sum(m * m for _, m in obs)
        den = n * smm - sm * sm
        if den <= 0:
            return None
        return (n * sxm - sx * sm) / den

    want = {}
    for code, obs in per_code.items():
        dns = [(r, m) for r, m in obs if m < 0]
        ups = [(r, m) for r, m in obs if m > 0]
        bd, bu = beta(dns), beta(ups)
        want[code] = (
            len(dns),
            len(ups),
            _round6(bd) if bd is not None else None,
            _round6(bu) if bu is not None else None,
            _round6(bd - bu) if bd is not None and bu is not None else None,
        )
    assert want and got == want


def test_comoment_coskew_matches_python(spark):
    got = {
        r["code"]: (r["n_days"], r["coskew"], r["cokurt"])
        for r in QUERIES["comoment_coskew"](spark, SF).collect()
    }
    per_code = defaultdict(list)
    for (code, _), (rq, mq) in _rets_mkt_python(spark).items():
        per_code[code].append((rq, mq))
    want = {}
    for code, obs in per_code.items():
        n = len(obs)
        if n < 10:
            continue
        sr = sum(r for r, _ in obs)
        sm = sum(m for _, m in obs)
        mx = [n * r - sr for r, _ in obs]
        mm = [n * m - sm for _, m in obs]
        sxx = sum(a * a for a in mx)
        smm = sum(b * b for b in mm)
        if sxx <= 0 or smm <= 0:
            want[code] = (n, None, None)
            continue
        sxmm = sum(a * b * b for a, b in zip(mx, mm))
        sxmmm = sum(a * b * b * b for a, b in zip(mx, mm))
        coskew = _round6(sxmm * math.sqrt(n) / math.sqrt(sxx) / smm)
        cokurt = _round6(sxmmm * n / math.sqrt(sxx) / smm**1.5)
        want[code] = (n, coskew, cokurt)
    assert want and got == want


def test_duration_clustering_matches_python(spark):
    got = {
        r["code"]: (r["n_gaps"], r["mean_gap_s"], r["cv"], r["acf1"])
        for r in QUERIES["duration_clustering"](spark, SF).collect()
    }
    ev = load_table(spark, SF, "events").toPandas()
    ev["t"] = ev["ts"].astype("int64") // 1_000  # ns -> micros
    want = {}
    for code, grp in ev.sort_values(["t", "event_id"]).groupby("user_id"):
        ts = list(grp["t"])
        durs = [(ts[i] - ts[i - 1]) // 1_000_000 for i in range(1, len(ts))]
        n = len(durs)
        if n < 10:
            continue
        s = sum(durs)
        m = [n * d - s for d in durs]
        smm = sum(x * x for x in m)
        sml = sum(m[i] * m[i - 1] for i in range(1, n))
        want[code] = (
            n,
            _round6(s / n),
            _round6(math.sqrt(smm / n) / s) if s > 0 else None,
            _round6(sml / smm) if smm > 0 else None,
        )
    assert want and got == want


def test_lottery_max_matches_python(spark):
    got = {
        r["code"]: (r["n_days"], r["max1"], r["max5_mean"])
        for r in QUERIES["lottery_max_factor"](spark, SF).collect()
    }
    want = {}
    for code, grp in _bars_by_code(spark).items():
        closes = list(grp["close"])
        rqs = [
            _rq_half_away((closes[t] / closes[t - 1] - 1) * 10_000)
            for t in range(1, len(closes))
        ]
        n = len(rqs)
        if n < 20:
            continue
        top = sorted(rqs, reverse=True)[:5]
        want[code] = (
            n,
            _round6(top[0] / 10_000.0),
            _round6(sum(top) / 5.0 / 10_000.0),
        )
    assert want and got == want


def test_volume_profile_matches_python(spark):
    got = {
        r["code"]: (
            r["n_buckets"],
            r["total_vol"],
            r["poc_price_lo"],
            r["poc_price_hi"],
            r["poc_vol_share"],
        )
        for r in QUERIES["volume_profile_poc"](spark, SF).collect()
    }
    want = {}
    for code, grp in _bars_by_code(spark).items():
        cents = [_rq_half_away(c * 100) for c in grp["close"]]
        vols = [int(v) for v in grp["volume"]]
        mn, mx = min(cents), max(cents)
        width = max((mx - mn + 19) // 20, 1)
        per_bucket = defaultdict(int)
        for c, v in zip(cents, vols):
            per_bucket[(c - mn) // width] += v
        total = sum(per_bucket.values())
        if total <= 0:
            continue
        poc = min(per_bucket, key=lambda b: (-per_bucket[b], b))
        want[code] = (
            len(per_bucket),
            total,
            (mn + poc * width) / 100.0,
            (mn + (poc + 1) * width) / 100.0,
            _round6(per_bucket[poc] / total),
        )
    assert want and got == want


def test_hamming_topk_matches_python(spark):
    got = [
        (r["vec_id"], r["label"], r["hamming"], r["cos"])
        for r in QUERIES["embedding_hamming_topk"](spark, SF).collect()
    ]
    emb = load_table(spark, SF, "embeddings").toPandas()
    rows = [
        (int(r.vec_id), int(r.label), [float(x) for x in r.embedding])
        for r in emb.itertuples()
    ]
    probe = next(v for vid, _, v in rows if vid == 0)
    pbits = [x >= 0 for x in probe]

    def cos(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        return _round6(dot / (math.sqrt(na) * math.sqrt(nb)))

    scored = sorted(
        (
            (sum((x >= 0) != pb for x, pb in zip(v, pbits)), vid, lab, v)
            for vid, lab, v in rows
        )
    )[:10]
    want = [(vid, lab, h, cos(v, probe)) for h, vid, lab, v in scored]
    assert want and got == want


def test_drawdown_at_risk_matches_python(spark):
    got = {
        r["code"]: (r["n_days"], r["k_tail"], r["max_drawdown"], r["cdar_95"])
        for r in QUERIES["drawdown_at_risk"](spark, SF).collect()
    }
    want = {}
    for code, grp in _bars_by_code(spark).items():
        cents = [_rq_half_away(c * 100) for c in grp["close"]]
        dqs, mx = [], 0
        for c in cents:
            mx = max(mx, c)
            if mx > 0:
                dqs.append(_rq_half_away((c / mx - 1) * 100_000_000))
        n = len(dqs)
        if n < 20:
            continue
        k = (n + 19) // 20
        tail = sorted(dqs)[:k]
        want[code] = (
            n,
            k,
            _round6(-min(dqs) / 1e8),
            _round6(-sum(tail) / k / 1e8),
        )
    assert want and got == want


def test_calendar_month_effect_matches_python(spark):
    got = {
        r["mth"]: (r["n_obs"], r["mean_ret"], r["t_stat"], r["hit_rate"])
        for r in QUERIES["calendar_month_effect"](spark, SF).collect()
    }
    per_month = defaultdict(list)
    for code, grp in _bars_by_code(spark).items():
        closes, days = list(grp["close"]), list(grp["d"])
        for t in range(1, len(closes)):
            rc = _rq_half_away((closes[t] / closes[t - 1] - 1) * 100_000_000)
            per_month[days[t].month].append(rc)
    want = {}
    for mth, rs in per_month.items():
        n, s = len(rs), sum(rs)
        q = sum(r * r for r in rs)
        var_num = n * q - s * s
        tstat = (
            _round6((s / n) / math.sqrt((n * q - s * s) / n / (n - 1) / n))
            if n > 1 and var_num > 0
            else None
        )
        want[mth] = (
            n,
            _round6(s / n / 100_000_000),
            tstat,
            _round6(sum(1 for r in rs if r > 0) / n),
        )
    assert want and got == want
