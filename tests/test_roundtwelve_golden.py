"""Round-12 goldens: pure-python recomputes (the third independent
implementation next to the Spark plan and the DuckDB oracle) for the
round-12 additions — the repeated-span exact-dedup pairs (the r11
verdict's missing substring modality) and the redefined
embedding_neardup (corpus-derived top-slice threshold replacing the
fixed >= 0.99 that selected zero pairs on the synthetic corpus)."""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

from quantitative_database_and_visualization_platform_spark.pipeline.embeddings import (
    planes_for_corpus,
)
from quantitative_database_and_visualization_platform_spark.plans import QUERIES
from quantitative_database_and_visualization_platform_spark.plans.pipeline_queries import (
    _RSP_A,
    _RSP_K,
    _RSP_L,
)
from quantitative_database_and_visualization_platform_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _round6(x: float) -> float:
    return math.floor(x * 1_000_000 + 0.5) / 1_000_000.0


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_repeated_span_pairs_matches_python(spark):
    got = {
        (r["doc_a"], r["doc_b"]): (r["shared_spans"], r["span_frac"])
        for r in QUERIES["repeated_span_pairs"](spark, SF).collect()
    }
    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    anch: set[tuple[int, str]] = set()
    for r in docs:
        w = re.sub(" +", " ", r["text"]).strip().lower().split(" ")
        if len(w) < _RSP_L:
            continue
        for p in range(len(w) - _RSP_L + 1):
            h = int(_md5(" ".join(w[p : p + _RSP_K]))[:13], 16)
            if h % _RSP_A == 0:
                anch.add((r["doc_id"], _md5(" ".join(w[p : p + _RSP_L]))))
    sizes: dict[int, int] = defaultdict(int)
    by_hash: dict[str, list[int]] = defaultdict(list)
    for d, sh in anch:
        sizes[d] += 1
        by_hash[sh].append(d)
    shared: dict[tuple[int, int], int] = defaultdict(int)
    for ds in by_hash.values():
        ds.sort()
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                shared[(ds[i], ds[j])] += 1
    want = {
        (a, b): (n, _round6(n / min(sizes[a], sizes[b])))
        for (a, b), n in shared.items()
    }
    assert want and got == want


def test_embedding_neardup_matches_python(spark):
    got = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in QUERIES["embedding_neardup"](spark, SF).collect()
    }
    emb = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in load_table(spark, SF, "embeddings").collect()
    ]
    n = len(emb)
    n_planes = planes_for_corpus(n)
    dims = len(emb[0][1])
    # the shared md5-Rademacher planes (salt 'p{q}_{j}', first hex >= '8')
    planes = [
        [1.0 if _md5(f"p{q}_{j}")[0] >= "8" else -1.0 for j in range(dims)]
        for q in range(n_planes)
    ]

    def bucket(v):
        return "".join(
            "1" if sum(x * s for x, s in zip(v, p)) >= 0 else "0" for p in planes
        )

    buckets: dict[str, list[tuple[int, list[float]]]] = defaultdict(list)
    for vid, v in emb:
        buckets[bucket(v)].append((vid, v))

    def cq(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return math.floor(dot / (na * nb) * 1_000_000_000 + 0.5)

    pairs = []
    for vs in buckets.values():
        vs.sort()
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                pairs.append((vs[i][0], vs[j][0], cq(vs[i][1], vs[j][1])))
    k = max(1, -(-n // 100))
    thr = sorted((c for _, _, c in pairs), reverse=True)[k - 1]
    want = {(a, b): c / 1_000_000_000.0 for a, b, c in pairs if c >= thr}
    assert len(want) >= k and got == want


# the five queries the r12 hostile-TZ sweep caught emitting values that
# shifted with the session time zone (the driver wrapper pins UTC via
# tune_existing, so the DRIVER gate never sees this — but any non-UTC
# user of the engine did): event-time now stays TIMESTAMP_NTZ on every
# batch path. This red-line re-runs their oracle check with the session
# TZ flipped to a hostile offset, then restores it.
_TZ_FIXED = [
    "interval_join_click_purchase",
    "sliding_window_stats",
    "session_window_stats",
    "latest_event_per_user",
    "conversion_attribution",
]


def test_fixed_queries_are_session_tz_independent(spark):
    from quantitative_database_and_visualization_platform_spark.plans.oracle_check import (
        check_query,
    )

    tz0 = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        for name in _TZ_FIXED:
            problems = check_query(spark, SF, name)
            assert not problems, f"{name} under hostile TZ: {problems}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


def _rq_half_away(v: float) -> int:
    """ROUND(x, 0) half-away-from-zero, the convention both engines use."""
    return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)


def _round9_half_away(x: float) -> float:
    s = 1.0 if x >= 0 else -1.0
    return s * math.floor(abs(x) * 1e9 + 0.5) / 1e9


def _bars_by_code(spark):
    from quantitative_database_and_visualization_platform_spark.factors.panel import daily_bars

    bars = daily_bars(spark, SF).toPandas()
    return {code: grp for code, grp in bars.sort_values("d").groupby("code")}


def _rets(grp):
    closes = list(grp["close"])
    return [
        _rq_half_away((c / p - 1) * 10_000)
        for p, c in zip(closes, closes[1:])
    ]


def test_cusum_break_matches_python(spark):
    got = {
        r["code"]: (r["n_days"], r["cusum_stat"], r["break_frac"])
        for r in QUERIES["cusum_break_stat"](spark, SF).collect()
    }
    want = {}
    for code, grp in _bars_by_code(spark).items():
        rq = _rets(grp)
        n, t = len(rq), sum(rq)
        q = sum(x * x for x in rq)
        if n < 20 or n * q - t * t <= 0:
            continue
        best_bk, best_k, sk = -1, -1, 0
        for k, x in enumerate(rq, start=1):
            sk += x
            bk = abs(n * sk - k * t)
            if bk > best_bk:  # strictly greater == earliest day on ties
                best_bk, best_k = bk, k
        stat = best_bk / math.sqrt((n * q - t * t) * n)
        want[code] = (n, _round6(stat), _round6(best_k / n))
    assert want and got == want
