"""Round-10 late-addition goldens: pure-python recomputes (a third
independent implementation next to the Spark plan and the DuckDB
oracle) for the six operators added after the round-10 gate window was
pinned — boilerplate_segment_ratio, ewma_vol_riskmetrics,
corwin_schultz_spread, cointegration_screen, ulcer_index_martin, and
vpin_flow_toxicity."""

from __future__ import annotations

import math
import re
from collections import defaultdict

from quantitative_database_and_visualization_platform_spark.factors.panel import daily_bars
from quantitative_database_and_visualization_platform_spark.plans import QUERIES
from quantitative_database_and_visualization_platform_spark.plans.backtest_queries import (
    _EWMA_CAP,
    _EWMA_WQ,
)
from quantitative_database_and_visualization_platform_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _round6(x: float) -> float:
    return math.floor(x * 1_000_000 + 0.5) / 1_000_000.0


def _bars_by_code(spark):
    bars = daily_bars(spark, SF).toPandas()
    out = {}
    for code, grp in bars.sort_values("d").groupby("code"):
        out[code] = grp
    return out


def test_ewma_vol_matches_python(spark):
    got = {
        (r["code"], r["d"]): (r["n_obs"], r["ewma_vol"])
        for r in QUERIES["ewma_vol_riskmetrics"](spark, SF).collect()
    }
    want = {}
    for code, grp in _bars_by_code(spark).items():
        closes, days = list(grp["close"]), list(grp["d"])
        rets = []
        for t in range(1, len(closes)):
            if closes[t] > 0 and closes[t - 1] > 0:
                rq = int(
                    math.floor(
                        abs(math.log(closes[t] / closes[t - 1])) * 10_000 + 0.5
                    )
                ) * (1 if closes[t] >= closes[t - 1] else -1)
                # ROUND half-away-from-zero on both engines for negatives
                rq = max(-_EWMA_CAP, min(_EWMA_CAP, rq))
                rets.append((days[t], rq))
        for t in range(len(rets)):
            window = rets[max(0, t - 59) : t + 1]
            n = len(window)
            if n < 20:
                continue
            s = sum(
                rq * rq * _EWMA_WQ[k]
                for k, (_, rq) in enumerate(reversed(window))
            )
            vol = _round6(math.sqrt((0.06 * (s / 1e16)) * 252))
            want[(code, rets[t][0])] = (n, vol)
    assert want and got == want


def test_corwin_schultz_matches_python(spark):
    got = {
        r["code"]: (r["n_pairs"], r["n_pos"], r["mean_cs_spread"], r["max_cs_spread"])
        for r in QUERIES["corwin_schultz_spread"](spark, SF).collect()
    }
    k = 3 - 2 * math.sqrt(2)
    want = {}
    for code, grp in _bars_by_code(spark).items():
        hi, lo = list(grp["high"]), list(grp["low"])
        xs = [
            int(round(math.log(h / l) * 1_000_000)) if l > 0 else None
            for h, l in zip(hi, lo)
        ]
        sqs = []
        for t in range(len(xs) - 1):
            if xs[t] is None or xs[t + 1] is None:
                continue
            h2, l2 = max(hi[t], hi[t + 1]), min(lo[t], lo[t + 1])
            if l2 <= 0:
                continue
            g = int(round(math.log(h2 / l2) * 1_000_000))
            beta = (xs[t] * xs[t] + xs[t + 1] * xs[t + 1]) / 1e12
            gamma = g * g / 1e12
            alpha = (math.sqrt(2 * beta) - math.sqrt(beta)) / k - math.sqrt(
                gamma / k
            )
            s = 2 * (math.exp(alpha) - 1) / (1 + math.exp(alpha))
            sqs.append(int(round(max(s, 0.0) * 100_000_000)))
        if sqs:
            want[code] = (
                len(sqs),
                sum(1 for s in sqs if s > 0),
                _round6(sum(sqs) / 100_000_000.0 / len(sqs)),
                _round6(max(sqs) / 100_000_000.0),
            )
    assert want and got == want


def test_ulcer_index_matches_python(spark):
    got = {
        r["code"]: (
            r["n_days"],
            r["ulcer_index"],
            r["max_drawdown_pct"],
            r["martin_ratio"],
        )
        for r in QUERIES["ulcer_index_martin"](spark, SF).collect()
    }
    want = {}
    for code, grp in _bars_by_code(spark).items():
        cents = [int(round(c * 100)) for c in grp["close"]]
        mx, dqs, kept = 0, [], []
        for c in cents:
            mx = max(mx, c)
            if mx > 0:
                dqs.append(int(round((c / mx - 1) * 100_000_000)))
                kept.append(c)
        if not dqs:
            continue
        n = len(dqs)
        ui = math.sqrt(sum(d * d for d in dqs) / n) / 1_000_000.0
        tr = (kept[-1] / kept[0] - 1) * 100 if kept[0] > 0 else None
        want[code] = (
            n,
            _round6(ui),
            _round6(min(dqs) / 1_000_000.0),
            _round6(tr / ui) if (ui > 0 and tr is not None) else None,
        )
    assert want and got == want


def test_vpin_matches_python(spark):
    got = {
        r["code"]: (r["n_buckets"], r["total_vol"], r["vpin"])
        for r in QUERIES["vpin_flow_toxicity"](spark, SF).collect()
    }
    ev = load_table(spark, SF, "events").toPandas()
    ev["k"] = [
        int(m.group(1)) if (m := re.search(r"(\d+)", p)) else None
        for p in ev["props"]
    ]
    want = {}
    for code, grp in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        s, signed = None, []
        prev_p = None
        for r in grp.itertuples():
            if prev_p is not None:
                if r.value > prev_p:
                    s = 1
                elif r.value < prev_p:
                    s = -1
            prev_p = r.value
            if s is not None:
                signed.append((s, r.k))
        total = sum(k for _, k in signed)
        if total <= 0:
            continue
        bsz = (total + 19) // 20
        buckets = defaultdict(lambda: [0, 0])
        cum = 0
        for s, k in signed:
            cum += k
            b = max(cum - 1, 0) // bsz
            buckets[b][0] += s * k
            buckets[b][1] += k
        imb = sum(abs(sv) for sv, _ in buckets.values())
        want[code] = (len(buckets), total, _round6(imb / total))
    assert want and got == want


def test_boilerplate_matches_python(spark):
    got = {
        r["source"]: (
            r["n_docs"],
            r["docs_with_bp"],
            r["bp_doc_share"],
            r["mean_bp_ratio"],
            r["distinct_bp_segs"],
        )
        for r in QUERIES["boilerplate_segment_ratio"](spark, SF).collect()
    }
    docs = load_table(spark, SF, "documents").toPandas()
    seg_docs = defaultdict(set)
    doc_segs = {}
    for r in docs.itertuples():
        t = re.sub(" +", " ", r.text).strip().lower()
        w = t.split(" ")
        segs = [
            " ".join(w[g * 8 : g * 8 + 8]) for g in range(len(w) // 8)
        ]
        if not segs:
            continue
        doc_segs[r.doc_id] = (r.source, segs)
        for s in segs:
            seg_docs[s].add(r.doc_id)
    bp = {s for s, ids in seg_docs.items() if len(ids) >= 3}
    per_src = defaultdict(lambda: [0, 0, 0, set()])
    for doc_id, (source, segs) in doc_segs.items():
        n_bp = sum(1 for s in segs if s in bp)
        acc = per_src[source]
        acc[0] += 1
        acc[1] += 1 if n_bp else 0
        acc[2] += math.floor(n_bp * 1_000_000.0 / len(segs) + 0.5)
        acc[3] |= {s for s in segs if s in bp}
    want = {
        src: (
            n,
            with_bp,
            _round6(with_bp / n),
            _round6(rq / 1_000_000.0 / n),
            len(bps),
        )
        for src, (n, with_bp, rq, bps) in per_src.items()
    }
    assert want and got == want


def _eg_python(spark):
    """Full Engle-Granger mirror in exact python ints/floats."""
    bars = daily_bars(spark, SF).toPandas()
    rets, levs = defaultdict(dict), defaultdict(dict)
    for code, grp in bars.sort_values("d").groupby("code"):
        closes, days = list(grp["close"]), list(grp["d"])
        for t in range(len(closes)):
            if closes[t] > 0:
                levs[code][days[t]] = int(
                    round(math.log(closes[t]) * 1_000_000)
                )
            if t and closes[t - 1] != 0:
                rets[code][days[t]] = closes[t] / closes[t - 1] - 1
    codes = sorted(rets)
    cands = []
    for i, ca in enumerate(codes):
        for cb in codes[i + 1 :]:
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
            c = _round6(cov / math.sqrt(vx * vy))
            cands.append((c, ca, cb, n))
    cands.sort(key=lambda t: (-t[0], t[1], t[2]))
    out = {}
    for c, ca, cb, n_days in cands[:20]:
        common = sorted(set(levs[ca]) & set(levs[cb]))
        xq = [levs[ca][d] for d in common]
        yq = [levs[cb][d] for d in common]
        n = len(common)
        if n < 20:
            continue
        sx, sy = sum(xq), sum(yq)
        sxy = sum(a * b for a, b in zip(xq, yq))
        sxx = sum(a * a for a in xq)
        den = n * sxx - sx * sx
        if den == 0:
            continue
        b = (n * sxy - sx * sy) / den
        a0 = (sy - b * sx) / n
        eq = [int(round((y - b * x - a0) * 100)) for x, y in zip(xq, yq)]
        adf_t = hl = None
        if len(eq) >= 4:
            els = eq[:-1]
            des = [eq[t + 1] - eq[t] for t in range(len(eq) - 1)]
            nd = len(els)
            if nd >= 3:
                sed = sum(e * d for e, d in zip(els, des))
                see = sum(e * e for e in els)
                sdd = sum(d * d for d in des)
                if see > 0:
                    rho = sed / see
                    var_num = sdd - rho * sed
                    if var_num > 0:
                        adf_t = _round6(
                            rho / math.sqrt(var_num / (nd - 1) / see)
                        )
                    if -1 < rho < 0:
                        hl = _round6(-math.log(2) / math.log(1 + rho))
        out[(ca, cb)] = (n_days, c, _round6(b), adf_t, hl)
    return out


def test_cointegration_matches_python(spark):
    got = {
        (r["code_a"], r["code_b"]): (
            r["n_days"],
            r["correlation"],
            r["hedge_beta"],
            r["adf_t"],
            r["halflife_days"],
        )
        for r in QUERIES["cointegration_screen"](spark, SF).collect()
    }
    want = _eg_python(spark)
    assert want and got == want


def test_ljung_box_matches_python(spark):
    got = {
        r["code"]: (r["n_obs"], r["lb_q10"], r["reject_5pct"])
        for r in QUERIES["ljung_box_q"](spark, SF).collect()
    }
    want = {}
    for code, grp in _bars_by_code(spark).items():
        closes = list(grp["close"])
        rq = [
            int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)
            for v in (
                (closes[t] / closes[t - 1] - 1) * 10_000
                for t in range(1, len(closes))
            )
        ]
        n, s = len(rq), sum(rq)
        if n < 20:
            continue
        m = [n * r - s for r in rq]
        s0 = sum(x * x for x in m)
        if s0 <= 0:
            continue
        acc = 0.0
        for k in range(1, 11):
            ck = sum(m[t] * m[t - k] for t in range(k, n))
            p = ck / s0
            acc += p * p / (n - k)
        q10 = n * (n + 2) * acc
        want[code] = (n, _round6(q10), int(q10 > 18.307))
    assert want and got == want


def test_pq_audit_matches_python(spark):
    """Fourth implementation of the PQ chain: numpy-free python mirror
    of seeds -> assign -> engine-exact Lloyd mean -> assign -> error."""
    got = {
        r["label"]: (r["n_vecs"], r["mean_rel_err"], r["max_rel_err"])
        for r in QUERIES["pq_quantization_audit"](spark, SF).collect()
    }
    emb = load_table(spark, SF, "embeddings").toPandas()
    rows = sorted(
        (int(r.vec_id), int(r.label), [float(x) for x in r.embedding])
        for r in emb.itertuples()
    )

    def d6(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += (x - y) * (x - y)
        return math.floor(s * 1_000_000 + 0.5)

    dq_total = defaultdict(int)
    for m in range(4):
        subs = [(vid, v[m * 16 : m * 16 + 16]) for vid, _, v in rows]
        seeds = subs[:8]  # rows sorted by vec_id
        assign = {}
        for vid, e in subs:
            assign[vid] = min(
                (d6(e, s), scid) for (scid, s) in [(sv, se) for sv, se in seeds]
            )[1]
        cents = {}
        for cid in {c for c in assign.values()}:
            members = [e for vid, e in subs if assign[vid] == cid]
            n = len(members)
            cents[cid] = [
                (sum(math.floor(e[i] * 1_000_000 + 0.5) for e in members) / n)
                / 1_000_000.0
                for i in range(16)
            ]
        for vid, e in subs:
            dq, _ = min((d6(e, c), cid) for cid, c in cents.items())
            dq_total[vid] += dq
    per_label = defaultdict(list)
    for vid, label, v in rows:
        n2 = 0.0
        for x in v:
            n2 += x * x
        if n2 > 0:
            relq = math.floor(dq_total[vid] / 1_000_000.0 / n2 * 1_000_000 + 0.5)
            per_label[label].append(relq)
    want = {
        lab: (
            len(rq),
            _round6(sum(rq) / 1_000_000.0 / len(rq)),
            _round6(max(rq) / 1_000_000.0),
        )
        for lab, rq in per_label.items()
    }
    assert want and got == want


def _lb_python(series_by_code):
    """Shared Ljung-Box python mirror over {(code): [rq,...]} series."""
    want = {}
    for code, rq in series_by_code.items():
        n, s = len(rq), sum(rq)
        if n < 20:
            continue
        m = [n * r - s for r in rq]
        s0 = sum(x * x for x in m)
        if s0 <= 0:
            continue
        acc = 0.0
        for k in range(1, 11):
            ck = sum(m[t] * m[t - k] for t in range(k, n))
            p = ck / s0
            acc += p * p / (n - k)
        q10 = n * (n + 2) * acc
        want[code] = (n, _round6(q10), int(q10 > 18.307))
    return want


def _rq_series(spark, scale):
    out = {}
    for code, grp in _bars_by_code(spark).items():
        closes = list(grp["close"])
        out[code] = [
            int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)
            for v in (
                (closes[t] / closes[t - 1] - 1) * scale
                for t in range(1, len(closes))
            )
        ]
    return out


def test_arch_effect_matches_python(spark):
    got = {
        r["code"]: (r["n_obs"], r["lb_q10"], r["reject_5pct"])
        for r in QUERIES["arch_effect_q"](spark, SF).collect()
    }
    sq = {c: [r * r for r in s] for c, s in _rq_series(spark, 100).items()}
    want = _lb_python(sq)
    assert want and got == want


def test_tracking_error_matches_python(spark):
    got = {
        r["code"]: (r["n_days"], r["tracking_error"], r["info_ratio_ann"])
        for r in QUERIES["tracking_error_ir"](spark, SF).collect()
    }
    bars = daily_bars(spark, SF).toPandas()
    rets = defaultdict(dict)
    for code, grp in bars.sort_values("d").groupby("code"):
        closes, days = list(grp["close"]), list(grp["d"])
        for t in range(1, len(closes)):
            v = (closes[t] / closes[t - 1] - 1) * 10_000
            rets[days[t]][code] = int(math.floor(abs(v) + 0.5)) * (
                1 if v >= 0 else -1
            )
    ex = defaultdict(list)
    for d, by_code in rets.items():
        mq = math.floor(sum(by_code.values()) * 10_000.0 / len(by_code) + 0.5)
        for code, rq in by_code.items():
            ex[code].append(rq * 10_000 - mq)
    want = {}
    for code, eq in ex.items():
        n = len(eq)
        if n < 10:
            continue
        se, se2 = sum(eq), sum(e * e for e in eq)
        var_e = (n * se2 - se * se) / n / (n - 1)
        if var_e < 0:
            continue
        ir = (
            _round6(se / n / math.sqrt(var_e) * math.sqrt(252))
            if var_e > 0
            else None
        )
        want[code] = (n, _round6(math.sqrt(var_e) / 1e8), ir)
    assert want and got == want


def test_inverse_vol_portfolio_matches_python(spark):
    got = {
        r["d"]: (r["n_names"], r["port_ret"], r["cum_log_ret"])
        for r in QUERIES["inverse_vol_portfolio"](spark, SF).collect()
    }
    by_day = defaultdict(list)
    for code, rq in _rq_series(spark, 10_000).items():
        days = sorted(_bars_by_code(spark)[code]["d"])[1:]  # return days
        for t in range(len(rq)):
            lo = max(0, t - 19)
            window = rq[lo : t + 1]
            n_w = len(window)
            if n_w < 10 or t + 1 >= len(rq):
                continue
            s1, s2 = sum(window), sum(x * x for x in window)
            var = (n_w * s2 - s1 * s1) / n_w / (n_w - 1)
            v = math.sqrt(var) / 10_000
            if v > 0:
                wq = math.floor(1_000_000.0 / v + 0.5)
                by_day[days[t]].append((wq, rq[t + 1]))
    want, cum = {}, 0
    for d in sorted(by_day):
        rows = by_day[d]
        num = sum(w * r for w, r in rows)
        den = sum(w for w, _ in rows)
        pr = num / den / 10_000
        if pr > -1:
            cum += math.floor(math.log(1 + pr) * 1e8 + 0.5)
        want[d] = (len(rows), _round6(pr), _round6(cum / 1e8))
    assert want and got == want


def _winnow_python(spark):
    import hashlib

    docs = load_table(spark, SF, "documents").toPandas()
    fps = {}
    for r in docs.itertuples():
        t = re.sub(" +", " ", r.text).strip().lower()
        w = t.split(" ")
        if len(w) < 8:
            continue
        hs = [
            int(
                hashlib.md5(" ".join(w[p : p + 4]).encode()).hexdigest()[:13],
                16,
            )
            for p in range(len(w) - 3)
        ]
        sel = {min(hs[q : q + 5]) for q in range(len(hs) - 4)}
        fps[r.doc_id] = sel
    return fps


def test_winnowing_matches_python(spark):
    got = {
        (r["doc_a"], r["doc_b"]): (r["shared_fp"], r["containment"])
        for r in QUERIES["winnowing_fingerprints"](spark, SF).collect()
    }
    fps = _winnow_python(spark)
    want = {}
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = len(fps[a] & fps[b])
            if shared >= 3:
                want[(a, b)] = (
                    shared,
                    _round6(shared / min(len(fps[a]), len(fps[b]))),
                )
    assert got == want
    assert want, "no overlapping pair at this sf — test degenerate"


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark):
    """The MOSS contract: two documents sharing any run of >= W+K-1 = 8
    tokens must share at least one fingerprint — verified on every
    near-dup pair the exact-substring ground truth knows about."""
    import hashlib

    docs = load_table(spark, SF, "documents").toPandas()
    toks = {}
    for r in docs.itertuples():
        t = re.sub(" +", " ", r.text).strip().lower()
        toks[r.doc_id] = t.split(" ")
    fps = _winnow_python(spark)
    ids = sorted(toks)
    checked = 0
    for i, a in enumerate(ids):
        if a not in fps:
            continue
        runs_a = {
            " ".join(toks[a][p : p + 8]) for p in range(len(toks[a]) - 7)
        }
        for b in ids[i + 1 :]:
            if b not in fps:
                continue
            runs_b = {
                " ".join(toks[b][p : p + 8]) for p in range(len(toks[b]) - 7)
            }
            if runs_a & runs_b:
                assert fps[a] & fps[b], (a, b)
                checked += 1
    assert checked, "no 8-token shared run at this sf — test degenerate"


def test_dbscan_core_matches_python(spark):
    from test_roundnine_golden import _bucket, _plane_weights

    got = {
        r["label"]: (r["n_core"], r["n_border"], r["n_noise"], r["mean_neighbors"])
        for r in QUERIES["embedding_dbscan_core"](spark, SF).collect()
    }
    emb = load_table(spark, SF, "embeddings").toPandas()
    weights = _plane_weights()
    rows = [
        (int(r.vec_id), int(r.label), [float(x) for x in r.embedding])
        for r in emb.itertuples()
    ]
    buckets = defaultdict(list)
    for vid, lab, v in rows:
        buckets[_bucket(v, weights)].append((vid, v))

    def cosq(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        return math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e9 + 0.5)

    nbrs = defaultdict(set)
    for members in buckets.values():
        for i, (x, ex) in enumerate(members):
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


def test_granger_matches_python(spark):
    got = {
        (r["code_a"], r["code_b"]): (
            r["n_obs"],
            r["correlation"],
            r["f_a_causes_b"],
            r["f_b_causes_a"],
        )
        for r in QUERIES["granger_causality_screen"](spark, SF).collect()
    }
    bars = daily_bars(spark, SF).toPandas()
    rets = defaultdict(dict)
    for code, grp in bars.sort_values("d").groupby("code"):
        closes, days = list(grp["close"]), list(grp["d"])
        for t in range(1, len(closes)):
            rets[code][days[t]] = closes[t] / closes[t - 1] - 1
    codes = sorted(rets)
    cands = []
    for i, ca in enumerate(codes):
        for cb in codes[i + 1 :]:
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
            cands.append((_round6(cov / math.sqrt(vx * vy)), ca, cb))
    cands.sort(key=lambda t: (-t[0], t[1], t[2]))

    def f_dir(yv, xv):
        yl, xl, yc = yv[:-1], xv[:-1], yv[1:]
        n = len(yc)
        if n < 10:
            return None, n
        sy, sy1, sx1 = sum(yc), sum(yl), sum(xl)
        syy = sum(v * v for v in yc)
        syy1 = sum(a * b for a, b in zip(yc, yl))
        syx1 = sum(a * b for a, b in zip(yc, xl))
        sy1y1 = sum(v * v for v in yl)
        sx1x1 = sum(v * v for v in xl)
        sy1x1 = sum(a * b for a, b in zip(yl, xl))
        m_yy = float(n * syy - sy * sy)
        m_yy1 = float(n * syy1 - sy * sy1)
        m_yx1 = float(n * syx1 - sy * sx1)
        m_y1y1 = float(n * sy1y1 - sy1 * sy1)
        m_x1x1 = float(n * sx1x1 - sx1 * sx1)
        m_y1x1 = float(n * sy1x1 - sy1 * sx1)
        det = m_y1y1 * m_x1x1 - m_y1x1 * m_y1x1
        if m_y1y1 <= 0 or det <= 0:
            return None, n
        b1 = (m_yy1 * m_x1x1 - m_yx1 * m_y1x1) / det
        b2 = (m_yx1 * m_y1y1 - m_yy1 * m_y1x1) / det
        rss_u = (m_yy - b1 * m_yy1 - b2 * m_yx1) / n
        rss_r = (m_yy - m_yy1 * m_yy1 / m_y1y1) / n
        if rss_u <= 0:
            return None, n
        return _round6((rss_r - rss_u) / (rss_u / (n - 3))), n

    want = {}
    for c, ca, cb in cands[:20]:
        common = sorted(set(rets[ca]) & set(rets[cb]))
        q = lambda v: int(math.floor(abs(v * 10_000) + 0.5)) * (
            1 if v >= 0 else -1
        )
        xs = [q(rets[ca][d]) for d in common]
        ys = [q(rets[cb][d]) for d in common]
        fab, n = f_dir(ys, xs)
        fba, _ = f_dir(xs, ys)
        want[(ca, cb)] = (n, c, fab, fba)
    assert want and got == want


def test_omega_downside_matches_python(spark):
    got = {
        r["code"]: (
            r["n_days"],
            r["n_up"],
            r["n_down"],
            r["omega"],
            r["downside_dev_ann"],
        )
        for r in QUERIES["omega_downside_panel"](spark, SF).collect()
    }
    want = {}
    for code, rq in _rq_series(spark, 10_000).items():
        n = len(rq)
        if n < 10:
            continue
        gains = sum(r for r in rq if r > 0)
        losses = sum(-r for r in rq if r < 0)
        d2 = sum(r * r for r in rq if r < 0)
        want[code] = (
            n,
            sum(1 for r in rq if r > 0),
            sum(1 for r in rq if r < 0),
            _round6(gains / losses) if losses > 0 else None,
            _round6(math.sqrt(d2 / n) / 10_000 * math.sqrt(252)),
        )
    assert want and got == want


def test_fama_macbeth_nw_matches_python(spark):
    rows = QUERIES["fama_macbeth_nw"](spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    got = (r["n_days"], r["mean_premium"], r["t_iid"], r["t_nw3"], r["slope_acf1"])
    bars = daily_bars(spark, SF).toPandas()
    panel = defaultdict(list)
    for code, grp in bars.sort_values("d").groupby("code"):
        closes, days = list(grp["close"]), list(grp["d"])
        for t in range(len(closes)):
            if t >= 5 and t + 1 < len(closes):
                x = closes[t] / closes[t - 5] - 1
                y = closes[t + 1] / closes[t] - 1
                q = lambda v: int(math.floor(abs(v * 10_000) + 0.5)) * (
                    1 if v >= 0 else -1
                )
                panel[days[t]].append((q(x), q(y)))
    gq = {}
    for d, xy in panel.items():
        n = len(xy)
        sx = sum(x for x, _ in xy)
        sy = sum(y for _, y in xy)
        sxy = sum(x * y for x, y in xy)
        sxx = sum(x * x for x, _ in xy)
        den = n * sxx - sx * sx
        if den == 0:
            continue
        raw = math.floor((n * sxy - sx * sy) / den * 1e8 + 0.5)
        gq[d] = max(-10**12, min(10**12, raw))
    days = sorted(gq)
    g = [gq[d] for d in days]
    t = len(g)
    s = sum(g)
    mm = [t * v - s for v in g]
    c0 = sum(v * v for v in mm)
    c = [sum(mm[i] * mm[i - l] for i in range(l, t)) for l in (1, 2, 3)]
    mean = s / t / 1e8
    se_iid = math.sqrt(c0 / t / t / (t - 1) / t / 1e16)
    nw = c0 + 2 * (0.75 * c[0] + 0.5 * c[1] + 0.25 * c[2])
    se_nw = math.sqrt(nw / t / t / t / t / 1e16)
    want = (
        t,
        _round6(mean),
        _round6(mean / se_iid) if (t > 3 and c0 > 0) else None,
        _round6(mean / se_nw) if (t > 3 and nw > 0) else None,
        _round6(c[0] / c0) if c0 > 0 else None,
    )
    assert got == want


def test_filter_cascade_matches_python(spark):
    got = {
        (r["source"], r["rule"]): (r["n_docs"], r["share"], r["mean_quality"])
        for r in QUERIES["filter_cascade_report"](spark, SF).collect()
    }
    docs = load_table(spark, SF, "documents").toPandas()
    stop = {"the", "a", "of", "to", "and", "is", "in"}
    rows = []
    for r in docs.itertuples():
        t = re.sub(" +", " ", r.text).strip().lower()
        w = t.split(" ")
        n = len(w)
        sr = sum(1 for x in w if x in stop) / n
        q = 0.6 * min(n / 100.0, 1.0) + 0.4 * min(sr * 10, 1.0)
        rule = (
            "too_short"
            if n < 20
            else "non_english"
            if sr < 0.02
            else "low_quality"
            if q < 0.35
            else "pass"
        )
        rows.append((r.source, rule, q))
    totals = defaultdict(int)
    for src, _, _ in rows:
        totals[src] += 1
    acc = defaultdict(lambda: [0, 0])
    for src, rule, q in rows:
        acc[(src, rule)][0] += 1
        acc[(src, rule)][1] += int(round(q * 1_000_000))
    want = {
        k: (n, _round6(n / totals[k[0]]), _round6(s / 1_000_000.0 / n))
        for k, (n, s) in acc.items()
    }
    assert want and got == want
