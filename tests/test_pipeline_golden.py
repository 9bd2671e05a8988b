"""Independent-reference tests for the late-round-5 pipeline operators.

Same rationale as test_quant_golden.py: the DuckDB oracles share each
query's formula by construction, so a formula error implemented
identically twice passes the parity gate. These tests recompute
dedup_containment, doc_packing, and source_mixing_weights with plain
python (sets, loops, dicts — no SQL, no Spark expressions) on sf0.001
and compare against the registered queries' output.

The python twins deliberately brute-force what the engine blocks/prunes:
containment is verified ALL-PAIRS here, so a blocking-soundness bug
(prefix filter dropping a qualifying pair) fails this test even though
both engines share the blocked shape.
"""

from __future__ import annotations

import math
import re

import pandas as pd

from quantitative_database_and_visualization_platform_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"
STOPWORDS = {"the", "a", "of", "to", "and", "is", "in"}


def _docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/documents.parquet")


def _norm(text: str) -> str:
    # twin of pipeline.dedup.normalized_text: collapse runs of SPACES
    # (not all whitespace), trim, lowercase
    return re.sub(" +", " ", text).strip().lower()


def _words(text: str) -> list[str]:
    return _norm(text).split(" ")


def _shingle_set(text: str, k: int = 3) -> set[str]:
    w = _words(text)
    if len(w) < k:
        return set()
    return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}


def _quality(text: str) -> float:
    w = _words(text)
    n = len(w)
    stop_ratio = sum(1 for x in w if x in STOPWORDS) / n
    return 0.6 * min(n / 100.0, 1.0) + 0.4 * min(stop_ratio * 10, 1.0)


def test_containment_matches_all_pairs_set_arithmetic(spark):
    """Every (a, b) ordered pair with |Sa∩Sb|/|Sa| >= 0.8 — found by
    brute force over all pairs with python sets — must match the blocked
    prefix-filter pipeline exactly (ids AND containment values)."""
    docs = _docs()
    sets = {r.doc_id: _shingle_set(r.text) for r in docs.itertuples()}
    expect: dict[tuple[int, int], float] = {}
    for a, sa in sets.items():
        if not sa:
            continue
        for b, sb in sets.items():
            if a == b or not sb:
                continue
            c = len(sa & sb) / len(sa)
            if c >= 0.8:
                expect[(a, b)] = c
    got = {
        (r["a_id"], r["b_id"]): r["containment"]
        for r in QUERIES["dedup_containment"](spark, SF).collect()
    }
    assert set(got) == set(expect), (
        f"pair sets differ: engine-only={sorted(set(got) - set(expect))[:5]} "
        f"python-only={sorted(set(expect) - set(got))[:5]}"
    )
    for pair, c in expect.items():
        assert abs(got[pair] - c) < 1e-6, (pair, got[pair], c)
    # the corpus must actually exercise the operator
    assert len(expect) > 0


def test_doc_packing_matches_greedy_python_loop(spark):
    """Pack assignment recomputed with a per-source python loop over
    doc_id order: cum token sums, pack = floor((cum - n)/512)."""
    docs = _docs()
    expect: dict[tuple[str, int], list[int]] = {}
    for source, g in docs.groupby("source"):
        cum = 0
        for r in g.sort_values("doc_id").itertuples():
            n = len(_words(r.text))
            pack = cum // 512  # first token's window
            cum += n
            key = (source, pack)
            expect.setdefault(key, [0, 0])
            expect[key][0] += 1
            expect[key][1] += n
    got = {
        (r["source"], r["pack_id"]): [r["n_docs"], r["tokens_packed"]]
        for r in QUERIES["doc_packing"](spark, SF).collect()
    }
    assert got == expect


def test_source_mixing_weights_match_python_dict_math(spark):
    """Weights recomputed with dict accumulation + python floats; the
    quantization ladders (qq/wq) are reproduced so the comparison is
    near-exact, not merely directionally similar."""
    docs = _docs()
    acc: dict[str, list[float]] = {}
    for r in docs.itertuples():
        a = acc.setdefault(r.source, [0, 0])
        a[0] += 1
        a[1] += math.floor(_quality(r.text) * 1_000_000 + 0.5)
    per = {
        s: (n, qsum / n / 1_000_000) for s, (n, qsum) in acc.items()
    }
    wq = {
        s: math.floor(n * aq * aq * 1_000_000 + 0.5) for s, (n, aq) in per.items()
    }
    total = sum(wq.values())
    rows = QUERIES["source_mixing_weights"](spark, SF).collect()
    assert {r["source"] for r in rows} == set(per)
    for r in rows:
        n, aq = per[r["source"]]
        assert r["n_docs"] == n
        assert abs(r["avg_quality"] - aq) < 2e-6
        assert abs(r["weight"] - wq[r["source"]] / total) < 2e-6
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
