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


def test_exact_substring_dedup_matches_python_counters(spark):
    """Per-doc repeated-8-gram stats recomputed with python sets and a
    flat Counter over the whole corpus."""
    from collections import Counter

    docs = _docs()
    gsets = {
        r.doc_id: _shingle_set(r.text, k=8) for r in docs.itertuples()
    }
    freq = Counter(g for s in gsets.values() for g in s)
    got = {r["doc_id"]: r for r in QUERIES["exact_substring_dedup"](spark, SF).collect()}
    expect_ids = {d for d, s in gsets.items() if s}
    assert set(got) == expect_ids
    for d, s in gsets.items():
        if not s:
            continue
        n_rep = sum(1 for g in s if freq[g] > 1)
        assert got[d]["n_grams"] == len(s)
        assert got[d]["n_repeated"] == n_rep
        assert abs(got[d]["repeated_frac"] - n_rep / len(s)) < 1e-6
        assert got[d]["keep"] == int(n_rep / len(s) <= 0.5)
    assert any(r["n_repeated"] > 0 for r in got.values())


def test_dsir_importance_matches_python_loglik(spark):
    """DSIR log-ratio recomputed with python dicts + math.log over the
    same hashed feature space (independent of both engines' SQL)."""
    import hashlib
    from collections import Counter

    docs = _docs()
    B = 1024

    def feat(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % B

    doc_feats = {r.doc_id: [feat(t) for t in _words(r.text)] for r in docs.itertuples()}
    lang = dict(zip(docs.doc_id, docs.lang))
    raw, tgt = Counter(), Counter()
    for d, fs in doc_feats.items():
        raw.update(fs)
        if lang[d] == "en":
            tgt.update(fs)
    r_tot, t_tot = sum(raw.values()), sum(tgt.values())
    lam = {
        f: math.floor(
            (math.log((tgt[f] + 1) / (t_tot + B)) - math.log((raw[f] + 1) / (r_tot + B)))
            * 1e9
            + 0.5
        )
        for f in raw
    }
    got = {r["doc_id"]: r for r in QUERIES["dsir_importance"](spark, SF).collect()}
    assert set(got) == set(doc_feats)
    for d, fs in doc_feats.items():
        assert got[d]["n_tokens"] == len(fs)
        assert got[d]["lang"] == lang[d]
        assert abs(got[d]["dsir_logratio"] - sum(lam[f] for f in fs) / 1e9) < 2e-6
    # 'en' docs must score higher on average — the semantics, not just math
    en = [r["dsir_logratio"] for r in got.values() if r["lang"] == "en"]
    other = [r["dsir_logratio"] for r in got.values() if r["lang"] != "en"]
    assert sum(en) / len(en) > sum(other) / len(other)


def test_lang_mix_drift_matches_python_kl(spark):
    docs = _docs()
    langs = sorted(docs.lang.unique())
    L, N = len(langs), len(docs)
    corpus = docs.lang.value_counts().to_dict()
    got = {r["source"]: r for r in QUERIES["lang_mix_drift"](spark, SF).collect()}
    assert set(got) == set(docs.source.unique())
    for source, g in docs.groupby("source"):
        n = len(g)
        counts = g.lang.value_counts().to_dict()
        kl = 0.0
        for lg in langs:
            ps = (counts.get(lg, 0) + 1) / (n + L)
            pc = (corpus[lg] + 1) / (N + L)
            kl += ps * math.log(ps / pc)
        assert got[source]["n_docs"] == n
        assert abs(got[source]["kl_divergence"] - kl) < 2e-6


def test_semdedup_prune_matches_numpy_union_find(spark):
    """Full numpy/union-find recomputation: seeds, quantized-L2 argmin
    assignment, fixed-point centroid means, re-assignment, all-pairs
    intra-cluster cosine, union-find components, farthest-from-centroid
    election. Independent of both engines' SQL and of the shared CC
    implementation."""
    import numpy as np

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    ids = emb.vec_id.to_numpy()
    X = np.stack([np.asarray(v, dtype=np.float64) for v in emb.embedding])

    def assign(cents: dict[int, np.ndarray]) -> dict[int, int]:
        out = {}
        for vid, x in zip(ids, X):
            keyed = sorted(
                (math.floor(float(((x - c) ** 2).sum()) * 1e6 + 0.5), cid)
                for cid, c in cents.items()
            )
            out[vid] = keyed[0][1]
        return out

    order = np.argsort(ids)
    seed_ids = ids[order][:8]
    seeds = {int(v): X[list(ids).index(v)] for v in seed_ids}
    a1 = assign(seeds)
    cents = {}
    for cid in set(a1.values()):
        members = X[[i for i, v in enumerate(ids) if a1[v] == cid]]
        q = np.floor(members * 1e6 + 0.5).astype("int64")
        cents[cid] = q.sum(axis=0) / len(members) / 1e6
    a2 = assign(cents)
    dist_q = {
        int(v): math.floor(float(((X[i] - cents[a2[v]]) ** 2).sum()) * 1e6 + 0.5)
        for i, v in enumerate(ids)
    }
    # union-find over intra-cluster eps-pairs
    parent = {int(v): int(v) for v in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    norms = np.sqrt((X**2).sum(axis=1))
    in_pairs = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = int(ids[i]), int(ids[j])
            if a2[a] != a2[b]:
                continue
            cos = float(X[i] @ X[j]) / (norms[i] * norms[j])
            if cos >= 0.35:
                lo, hi = min(a, b), max(a, b)
                in_pairs.add(lo)
                in_pairs.add(hi)
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, list[int]] = {}
    for v in in_pairs:
        comps.setdefault(find(v), []).append(v)
    expect = {}
    for root, members in comps.items():
        comp_id = min(members)
        kept = max(members, key=lambda v: (dist_q[v], -v))
        expect[comp_id] = (a2[comp_id], kept, len(members), len(members) - 1)
    got = {
        r["component"]: (r["cluster"], r["kept_id"], r["n_members"], r["n_pruned"])
        for r in QUERIES["semdedup_prune"](spark, SF).collect()
    }
    assert got == expect
    assert len(expect) > 0


def test_bpe_merge_candidates_match_python_counters(spark):
    """First-BPE-merge pair counts recomputed with plain Counters over
    the same normalized token stream."""
    from collections import Counter

    docs = _docs()
    vocab = Counter(t for r in docs.itertuples() for t in _words(r.text))
    pair_count: Counter = Counter()
    pair_words: dict[str, set] = {}
    for w, freq in vocab.items():
        if len(w) < 2:
            continue
        for i in range(len(w) - 1):
            p = w[i : i + 2]
            pair_count[p] += freq
            pair_words.setdefault(p, set()).add(w)
    top = sorted(pair_count.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r["pair"], r["pair_count"], r["n_words"])
           for r in QUERIES["bpe_merge_candidates"](spark, SF).collect()]
    assert got == [(p, c, len(pair_words[p])) for p, c in top]


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


def test_lm_perplexity_matches_python_counters(spark):
    """Add-1 bigram LM recomputed with Counters + math.log; fixed-point
    micro accumulation and the floor(x*1e6+0.5) rounding ladder are
    reproduced so the comparison is exact; NTILE(3) is recomputed from
    its definition (first n%3 buckets get the extra row)."""
    import math
    from collections import Counter, defaultdict

    docs = _docs()
    toks = {r.doc_id: _words(r.text) for r in docs.itertuples()}
    lang = dict(zip(docs.doc_id, docs.lang))
    uni: Counter = Counter(t for w in toks.values() for t in w)
    vocab = len(uni)
    big: Counter = Counter()
    for w in toks.values():
        for i in range(len(w) - 1):
            big[(w[i], w[i + 1])] += 1

    def r6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    expect = {}
    for doc_id, w in toks.items():
        if len(w) < 2:
            continue
        micro = 0
        for i in range(len(w) - 1):
            p = (big[(w[i], w[i + 1])] + 1.0) / (uni[w[i]] + vocab)
            micro += int(math.floor(-math.log(p) * 1e6 + 0.5))
        n = len(w) - 1
        avg = r6(micro / n / 1e6)
        expect[doc_id] = (n, avg, r6(math.exp(avg)))

    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"], r["ppl"], r["ppl_bucket"])
        for r in QUERIES["lm_perplexity_buckets"](spark, SF).collect()
    }
    assert {d: v[:3] for d, v in got.items()} == expect

    bylang = defaultdict(list)
    for d, (_, avg, _) in expect.items():
        bylang[lang[d]].append((avg, d))
    for lg, lst in bylang.items():
        lst.sort()
        q, r = divmod(len(lst), 3)
        idx = 0
        for b in range(1, 4):
            for _ in range(q + (1 if b <= r else 0)):
                assert got[lst[idx][1]][3] == b, (lg, lst[idx])
                idx += 1


def test_doc_chunking_matches_python_slices(spark):
    """64/48 overlapping chunks recomputed with list slicing + hashlib."""
    import hashlib

    expect = {}
    for r in _docs().itertuples():
        w = _words(r.text)
        n = len(w)
        for k in range(max(0, -((n - 64) // -48)) + 1):
            start = k * 48
            clen = min(64, n - start)
            h = hashlib.md5(" ".join(w[start : start + clen]).encode()).hexdigest()
            expect[(r.doc_id, k)] = (start, clen, h)
    got = {
        (r["doc_id"], r["chunk_id"]): (r["start_tok"], r["n_tok"], r["chunk_hash"])
        for r in QUERIES["doc_chunking_overlap"](spark, SF).collect()
    }
    assert got == expect


def test_source_overlap_matrix_matches_python_sets(spark):
    """Pairwise source Jaccard recomputed with python set intersection
    over per-source shingle unions."""
    import math
    from collections import defaultdict

    sets: dict[str, set] = defaultdict(set)
    for r in _docs().itertuples():
        sets[r.source] |= _shingle_set(r.text)
    srcs = sorted(s for s in sets if sets[s])

    def r6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    expect = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(sets[a] & sets[b])
            na, nb = len(sets[a]), len(sets[b])
            expect[(a, b)] = (na, nb, inter, r6(inter / (na + nb - inter)))
    got = {
        (r["src_a"], r["src_b"]): (r["n_a"], r["n_b"], r["inter_cnt"], r["jaccard"])
        for r in QUERIES["source_overlap_matrix"](spark, SF).collect()
    }
    assert got == expect


def test_zipf_token_curve_matches_numpy_ols(spark):
    """Rank-frequency OLS refit with numpy.polyfit (an independent
    least-squares path — SVD, not the regr_* moment formulas), tolerance
    2e-6 = the round6 quantum plus float slack."""
    from collections import Counter, defaultdict

    import numpy as np

    freq: dict[str, Counter] = defaultdict(Counter)
    langtot: Counter = Counter()
    for r in _docs().itertuples():
        w = _words(r.text)
        freq[r.lang].update(w)
        langtot[r.lang] += len(w)

    got = {r["lang"]: r for r in QUERIES["zipf_token_curve"](spark, SF).collect()}
    assert set(got) == set(freq)
    for lg, c in freq.items():
        items = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        x = np.log(np.arange(1, len(items) + 1, dtype=float))
        y = np.log(np.array([v for _, v in items], dtype=float))
        slope, intercept = np.polyfit(x, y, 1)
        r = float(np.corrcoef(x, y)[0, 1])
        g = got[lg]
        assert g["vocab_size"] == len(items)
        assert g["total_tokens"] == langtot[lg]
        assert abs(g["zipf_slope"] - slope) < 2e-6
        assert abs(g["zipf_intercept"] - intercept) < 2e-6
        assert abs(g["zipf_r2"] - r * r) < 2e-6


def test_template_prefix_clusters_match_python_dicts(spark):
    """8-token prefix template groups recomputed with dict accumulation
    + hashlib."""
    import hashlib
    from collections import defaultdict

    groups: dict[str, list] = defaultdict(list)
    for r in _docs().itertuples():
        pre = " ".join(_words(r.text)[:8])
        groups[pre].append((r.doc_id, r.source))
    expect = {
        hashlib.md5(pre.encode()).hexdigest(): (
            pre,
            len(members),
            len({s for _, s in members}),
            min(d for d, _ in members),
        )
        for pre, members in groups.items()
        if len(members) >= 2
    }
    got = {
        r["prefix_hash"]: (r["prefix_text"], r["n_docs"], r["n_sources"], r["min_doc_id"])
        for r in QUERIES["template_prefix_clusters"](spark, SF).collect()
    }
    assert got == expect
    assert len(expect) > 0


def test_cluster_balanced_sample_quota_and_determinism(spark):
    """Structural golden for the balanced sample: per-cluster picks are
    capped at the quota, ranks are the md5(vec_id) order recomputed with
    hashlib, n_members sums to the corpus size, and the pick set is
    exactly the quota-prefix of each cluster's hash-ordered members."""
    import hashlib
    from collections import defaultdict

    rows = QUERIES["cluster_balanced_sample"](spark, SF).collect()
    by_cluster: dict[int, list] = defaultdict(list)
    members = {}
    for r in rows:
        by_cluster[r["cluster"]].append((r["pick_rank"], r["vec_id"]))
        members[r["cluster"]] = r["n_members"]

    n_vecs = len(pd.read_parquet(f"{SF}/embeddings.parquet"))
    assert sum(members.values()) == n_vecs
    for cid, picks in by_cluster.items():
        assert len(picks) == min(32, members[cid])
        assert sorted(p for p, _ in picks) == list(range(1, len(picks) + 1))
        # ranks must equal the hash order of the picked ids themselves
        ordered = sorted(
            picks, key=lambda pv: (hashlib.md5(str(pv[1]).encode()).hexdigest(), pv[1])
        )
        assert [p for p, _ in ordered] == list(range(1, len(picks) + 1))


def test_doc_novelty_matches_python_first_seen(spark):
    """Novelty recomputed with a first-seen dict over shingle sets in
    doc_id order."""
    import math

    first: dict[str, int] = {}
    sets = {}
    for r in sorted(_docs().itertuples(), key=lambda r: r.doc_id):
        s = _shingle_set(r.text)
        sets[r.doc_id] = s
        for g in s:
            first.setdefault(g, r.doc_id)

    def r6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    expect = {
        d: (len(s), sum(1 for g in s if first[g] == d),
            r6(sum(1 for g in s if first[g] == d) / len(s)))
        for d, s in sets.items()
        if s
    }
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty"])
        for r in QUERIES["doc_novelty_score"](spark, SF).collect()
    }
    assert got == expect


def test_weighted_resample_matches_python_race(spark):
    """Efraimidis–Spirakis keys recomputed with hashlib + math.log; the
    top-50 selection and ordering must match exactly."""
    import hashlib
    import math

    def r6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    rows = []
    for r in _docs().itertuples():
        h = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16)
        u = (h + 1) / 4294967296.0
        rows.append((r6(-math.log(u) / r.n_chars), r.doc_id, r.n_chars))
    rows.sort()
    expect = [(d, w, k) for k, d, w in rows[:50]]
    got = [
        (r["doc_id"], r["weight"], r["race_key"])
        for r in QUERIES["weighted_resample_topk"](spark, SF).collect()
    ]
    assert got == expect


def test_retention_funnel_matches_python_pipeline(spark):
    """The four keep-flags and cumulative funnel recomputed with dicts,
    sets, and the python quality twin at sf0.001."""
    docs = sorted(_docs().itertuples(), key=lambda r: r.doc_id)

    def five_grams(text: str) -> set:
        w = _words(text)
        return {" ".join(w[i : i + 5]) for i in range(len(w) - 4)} if len(w) >= 5 else set()

    first_by_hash: dict[str, int] = {}
    first_by_prefix: dict[str, int] = {}
    for r in docs:
        first_by_hash.setdefault(_norm(r.text), r.doc_id)
        first_by_prefix.setdefault(" ".join(_words(r.text)[:8]), r.doc_id)
    eval_grams: set = set()
    for r in docs:
        if r.doc_id % 97 == 0:
            eval_grams |= five_grams(r.text)

    tot = dict.fromkeys(
        ["raw_docs", "raw_tokens", "dedup_docs", "dedup_tokens", "quality_docs",
         "quality_tokens", "decon_docs", "decon_tokens", "final_docs",
         "final_tokens"], 0)
    for r in docs:
        w = _words(r.text)
        n = len(w)
        k1 = first_by_hash[_norm(r.text)] == r.doc_id
        k2 = n >= 5 and _quality(r.text) >= 0.2
        k3 = r.doc_id % 97 != 0 and not (five_grams(r.text) & eval_grams)
        k4 = first_by_prefix[" ".join(w[:8])] == r.doc_id
        tot["raw_docs"] += 1
        tot["raw_tokens"] += n
        if k1:
            tot["dedup_docs"] += 1
            tot["dedup_tokens"] += n
        if k1 and k2:
            tot["quality_docs"] += 1
            tot["quality_tokens"] += n
        if k1 and k2 and k3:
            tot["decon_docs"] += 1
            tot["decon_tokens"] += n
        if k1 and k2 and k3 and k4:
            tot["final_docs"] += 1
            tot["final_tokens"] += n

    row = QUERIES["pipeline_retention_funnel"](spark, SF).collect()[0].asDict()
    assert row == tot
    assert tot["final_docs"] > 0
    assert tot["raw_docs"] > tot["final_docs"]


def test_chunk_level_dedup_matches_python_sets(spark):
    """Shared-chunk pair counts recomputed with per-doc chunk-hash sets."""
    import hashlib
    from collections import defaultdict

    chunks: dict[int, set] = {}
    for r in _docs().itertuples():
        w = _words(r.text)
        n = len(w)
        hs = set()
        for k in range(max(0, -((n - 64) // -48)) + 1):
            start = k * 48
            clen = min(64, n - start)
            hs.add(hashlib.md5(" ".join(w[start : start + clen]).encode()).hexdigest())
        chunks[r.doc_id] = hs
    ids = sorted(chunks)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            n = len(chunks[a] & chunks[b])
            if n:
                expect[(a, b)] = n
    got = {
        (r["a_id"], r["b_id"]): r["n_shared_chunks"]
        for r in QUERIES["chunk_level_dedup"](spark, SF).collect()
    }
    assert got == expect
    assert len(expect) > 0


def test_length_histogram_matches_python_counters(spark):
    """Log2 length bins recomputed with math.floor + Counters."""
    import math
    from collections import defaultdict

    agg: dict[tuple, list] = defaultdict(lambda: [0, 0, None, None])
    for r in _docs().itertuples():
        n = len(_words(r.text))
        key = (r.source, math.floor(math.log2(n + 1)))
        a = agg[key]
        a[0] += 1
        a[1] += n
        a[2] = n if a[2] is None else min(a[2], n)
        a[3] = n if a[3] is None else max(a[3], n)
    got = {
        (r["source"], r["len_bin"]): [
            r["n_docs"], r["total_tokens"], r["min_tokens"], r["max_tokens"]
        ]
        for r in QUERIES["length_histogram_by_source"](spark, SF).collect()
    }
    assert got == {k: list(v) for k, v in agg.items()}


def test_minhash_audit_matches_python_signatures(spark):
    """MinHash minima, band collisions, and estimate/exact/abs_err
    recomputed with hashlib over python shingle sets."""
    import hashlib
    import math

    def r6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    sigs = {}
    for r in _docs().itertuples():
        s = _shingle_set(r.text)
        if not s:
            continue
        mh = [
            min(hashlib.md5(f"{i}:{x}".encode()).hexdigest() for x in s)
            for i in range(8)
        ]
        bands = [mh[2 * b] + mh[2 * b + 1] for b in range(4)]
        sigs[r.doc_id] = (s, mh, bands)
    ids = sorted(sigs)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, ma, ba = sigs[a]
            sb, mb, bb = sigs[b]
            if not any(x == y for x, y in zip(ba, bb)):
                continue
            est = sum(x == y for x, y in zip(ma, mb)) / 8.0
            inter = len(sa & sb)
            exact = inter / (len(sa) + len(sb) - inter)
            expect[(a, b)] = (r6(est), r6(exact), r6(abs(est - exact)))
    got = {
        (r["a_id"], r["b_id"]): (r["jaccard_est"], r["jaccard_exact"], r["abs_err"])
        for r in QUERIES["minhash_accuracy_audit"](spark, SF).collect()
    }
    assert got == expect
    assert len(expect) > 0


def test_vocab_coverage_matches_python_cumsum(spark):
    """Coverage thresholds recomputed with sorted Counters and integer
    comparisons."""
    from collections import Counter, defaultdict

    freq: dict[str, Counter] = defaultdict(Counter)
    for r in _docs().itertuples():
        freq[r.lang].update(_words(r.text))
    got = {r["lang"]: r for r in QUERIES["vocab_coverage_curve"](spark, SF).collect()}
    assert set(got) == set(freq)
    for lg, c in freq.items():
        items = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        total = sum(c.values())
        ks = {}
        cum = 0
        for rnk, (_, cnt) in enumerate(items, 1):
            cum += cnt
            for name, mc, mt in (("k50", 2, 1), ("k90", 10, 9), ("k99", 100, 99)):
                if name not in ks and mc * cum >= mt * total:
                    ks[name] = rnk
        g = got[lg]
        assert g["vocab_size"] == len(items) and g["total_tokens"] == total
        assert (g["k50"], g["k90"], g["k99"]) == (ks["k50"], ks["k90"], ks["k99"])
        assert g["k50"] <= g["k90"] <= g["k99"] <= g["vocab_size"]


def test_hll_distinct_matches_python_registers(spark):
    """HLL register maxes, the exact integer harmonic sum, the
    small-range correction, and the merged '__all__' row recomputed with
    hashlib + dict loops."""
    import hashlib
    import math

    from quantitative_database_and_visualization_platform_spark.pipeline import sketches as sk

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    regs: dict[str, dict[int, int]] = {}
    exact: dict[str, set] = {}
    docs = _docs()
    for r in docs.itertuples():
        w = _words(r.text)
        grams = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)} if len(w) >= 3 else set()
        for g in grams:
            h = hashlib.md5(g.encode()).hexdigest()
            reg, v = int(h[:2], 16), int(h[2:15], 16)
            rho = 53 if v == 0 else 53 - v.bit_length()
            for key in (r.source, "__all__"):
                m = regs.setdefault(key, {})
                m[reg] = max(m.get(reg, 0), rho)
                exact.setdefault(key, set()).add(g)

    expect = {}
    for key, m in regs.items():
        hit = len(m)
        s = sum(1 << (53 - x) for x in m.values()) + (256 - hit) * (1 << 53)
        raw = sk.HLL_NUMERATOR / float(s)
        zeros = 256 - hit
        est = 256.0 * math.log(256.0 / zeros) if (raw <= 640.0 and zeros > 0) else raw
        ex = len(exact[key])
        expect[key] = (hit, r6(est), ex, r6((r6(est) - ex) / ex))

    got = {
        r["source"]: (
            r["registers_hit"],
            r["hll_estimate"],
            r["exact_distinct"],
            r["rel_err"],
        )
        for r in QUERIES["hll_distinct_by_source"](spark, SF).collect()
    }
    assert got == expect
    assert "__all__" in got and len(got) > 2


def test_bloom_decontamination_matches_python_sets(spark):
    """Bloom bit membership, per-doc hit/exact/false-positive counts
    recomputed with hashlib + python sets (no SQL shapes shared)."""
    import hashlib

    def pos(r, g):
        return int(hashlib.md5(f"{r}|{g}".encode()).hexdigest()[:13], 16) % 65536

    grams: dict[int, set] = {}
    for r in _docs().itertuples():
        w = _words(r.text)
        if len(w) >= 5:
            grams[r.doc_id] = {" ".join(w[i : i + 5]) for i in range(len(w) - 4)}

    ev = set().union(*(g for d, g in grams.items() if d % 97 == 0))
    bits = {pos(r, g) for g in ev for r in range(4)}

    expect = {}
    for d, gs in grams.items():
        if d % 97 == 0:
            continue
        bloom = {g for g in gs if all(pos(r, g) in bits for r in range(4))}
        ex = gs & ev
        if bloom:
            expect[d] = (len(gs), len(bloom), len(ex), len(bloom - ex))

    got = {
        r["doc_id"]: (r["n_grams"], r["n_bloom_hits"], r["n_exact_hits"], r["n_false_pos"])
        for r in QUERIES["bloom_decontamination"](spark, SF).collect()
    }
    assert got == expect
    assert len(expect) > 0


def test_rank_fusion_matches_python_rrf(spark):
    """Both retrieval channels (exact cosine top-20, SRP same-bucket
    top-20) and the RRF blend recomputed with hashlib + left-to-right
    float folds (the same sequential order as Spark's aggregate())."""
    import hashlib
    import math

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    def cos(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += float(x) * float(y)
        for x in a:
            na += float(x) * float(x)
        for y in b:
            nb += float(y) * float(y)
        return dot / (math.sqrt(na) * math.sqrt(nb))

    signs = [
        [
            1.0 if hashlib.md5(f"p{p}_{j}".encode()).hexdigest()[0] >= "8" else -1.0
            for j in range(64)
        ]
        for p in range(4)
    ]

    def bucket(v):
        bits = ""
        for p in range(4):
            dot = 0.0
            for x, s in zip(v, signs[p]):
                dot += float(x) * s
            bits += "1" if dot >= 0 else "0"
        return bits

    probe = emb.loc[emb.vec_id == 0].iloc[0]
    rows = [
        (int(r.vec_id), int(r.label), r6(cos(r.embedding, probe.embedding)), bucket(r.embedding))
        for r in emb.itertuples()
    ]
    pb = bucket(probe.embedding)
    exact = sorted(rows, key=lambda t: (-t[2], t[0]))[:20]
    srp = sorted([t for t in rows if t[3] == pb], key=lambda t: (-t[2], t[0]))[:20]
    ra = {t[0]: i + 1 for i, t in enumerate(exact)}
    rb = {t[0]: i + 1 for i, t in enumerate(srp)}
    fused = {}
    for vid in set(ra) | set(rb):
        s = (1.0 / (60 + ra[vid]) if vid in ra else 0.0) + (
            1.0 / (60 + rb[vid]) if vid in rb else 0.0
        )
        fused[vid] = (ra.get(vid), rb.get(vid), r6(s))
    top10 = sorted(fused.items(), key=lambda kv: (-kv[1][2], kv[0]))[:10]
    expect = {vid: v for vid, v in top10}

    got = {
        r["vec_id"]: (r["rank_exact"], r["rank_srp"], r["rrf"])
        for r in QUERIES["embedding_rank_fusion"](spark, SF).collect()
    }
    assert got == expect
    assert len(got) == 10


def test_bm25_matches_python_counters(spark):
    """BM25 (k1=1.2, b=0.75, idf with +1) recomputed with Counters and
    the same fixed-order float additions."""
    import math
    from collections import Counter

    docs = _docs()
    words = {r.doc_id: _words(r.text) for r in docs.itertuples()}
    src = {r.doc_id: r.source for r in docs.itertuples()}
    n_docs = len(words)
    avgdl = sum(len(w) for w in words.values()) / n_docs
    terms = ("spark", "join", "filter")
    df = Counter(t for w in words.values() for t in set(w) if t in terms)

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    expect = {}
    for d, w in words.items():
        tf = Counter(t for t in w if t in terms)
        if not tf:
            continue
        s = []
        for t in terms:
            if tf[t]:
                idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                s.append(
                    idf
                    * (tf[t] * 2.2)
                    / (tf[t] + 1.2 * (1.0 - 0.75 + 0.75 * len(w) / avgdl))
                )
            else:
                s.append(0.0)
        expect[d] = (src[d], len(w), r6((s[0] + s[1]) + s[2]))
    top10 = sorted(expect.items(), key=lambda kv: (-kv[1][2], kv[0]))[:10]

    got = [
        (r["doc_id"], (r["source"], r["dlen"], r["bm25"]))
        for r in QUERIES["bm25_topk"](spark, SF).collect()
    ]
    assert got == top10
    assert len(got) == 10


def test_mixture_temperature_matches_python_dict_math(spark):
    """Alpha-temperature weights recomputed with Counters and the same
    1e-9 fixed-point quantization."""
    import math
    from collections import Counter

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    n = Counter(r.source for r in _docs().itertuples())
    total = sum(n.values())
    expect = {}
    qs = {a: {} for a in (0.3, 0.7, 1.0)}
    for s, c in n.items():
        p = c / total
        for a in qs:
            qs[a][s] = math.floor(p**a * 1e9 + 0.5)
    for s, c in n.items():
        p = c / total
        expect[s] = (
            c,
            r6(p),
            *(r6(qs[a][s] / sum(qs[a].values())) for a in (0.3, 0.7, 1.0)),
        )

    got = {
        r["source"]: (r["n_docs"], r["p"], r["w03"], r["w07"], r["w10"])
        for r in QUERIES["mixture_temperature_weights"](spark, SF).collect()
    }
    assert got == expect
    # α=1.0 must reproduce raw proportions
    for s in got:
        assert abs(got[s][4] - got[s][1]) <= 2e-6


def test_hll_cumulative_users_matches_python_merge(spark):
    """Per-day register partials merged by max along the time axis,
    recomputed with hashlib + dict loops; exact cumsum from first-seen
    dates."""
    import hashlib
    import math

    from quantitative_database_and_visualization_platform_spark.pipeline import sketches as sk

    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["d"] = pd.to_datetime(ev["ts"]).dt.date

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    day_regs: dict = {}
    first_seen: dict = {}
    for r in ev.itertuples():
        h = hashlib.md5(str(r.user_id).encode()).hexdigest()
        reg, v = int(h[:2], 16), int(h[2:15], 16)
        rho = 53 if v == 0 else 53 - v.bit_length()
        m = day_regs.setdefault(r.d, {})
        m[reg] = max(m.get(reg, 0), rho)
        if r.user_id not in first_seen or r.d < first_seen[r.user_id]:
            first_seen[r.user_id] = r.d

    days = sorted(day_regs)
    expect = {}
    merged: dict = {}
    for d in days:
        for reg, rho in day_regs[d].items():
            merged[reg] = max(merged.get(reg, 0), rho)
        hit = len(merged)
        s = sum(1 << (53 - x) for x in merged.values()) + (256 - hit) * (1 << 53)
        raw = sk.HLL_NUMERATOR / float(s)
        zeros = 256 - hit
        est = 256.0 * math.log(256.0 / zeros) if (raw <= 640.0 and zeros > 0) else raw
        exact = sum(1 for fd in first_seen.values() if fd <= d)
        expect[d] = (hit, r6(est), exact, r6((r6(est) - exact) / exact))

    got = {
        r["d"]: (r["registers_hit"], r["hll_estimate"], r["exact_cum_users"], r["rel_err"])
        for r in QUERIES["hll_cumulative_users"](spark, SF).collect()
    }
    assert got == expect
    # cumulative exact counts must be nondecreasing and end at the
    # global distinct-user count
    seq = [expect[d][2] for d in days]
    assert seq == sorted(seq) and seq[-1] == len(first_seen)


def test_snapshot_diff_matches_python_dicts(spark):
    """CDC classification recomputed with plain dict diffs (no joins, no
    hashes — field tuples compared directly)."""
    import math

    orders = pd.read_parquet(f"{SF}/orders.parquet")

    def row_tuple(r, bump):
        p = r.o_totalprice * 1.1 if bump else r.o_totalprice
        return (
            r.o_orderstatus,
            math.floor(p * 100 + 0.5),
            str(pd.Timestamp(r.o_orderdate).date()),
            r.o_orderpriority,
        )

    v1 = {
        int(r.o_orderkey): row_tuple(r, False)
        for r in orders.itertuples()
        if r.o_orderkey % 991 != 0
    }
    v2 = {
        int(r.o_orderkey): row_tuple(r, r.o_orderkey % 1000 == 0)
        for r in orders.itertuples()
        if r.o_orderkey % 997 != 0
    }
    cls: dict[str, list] = {"added": [], "removed": [], "changed": [], "unchanged": []}
    for k in set(v1) | set(v2):
        if k not in v1:
            cls["added"].append(k)
        elif k not in v2:
            cls["removed"].append(k)
        elif v1[k] != v2[k]:
            cls["changed"].append(k)
        else:
            cls["unchanged"].append(k)
    expect = {
        c: (len(ks), min(ks), max(ks)) for c, ks in cls.items() if ks
    }

    got = {
        r["change_type"]: (r["n"], r["min_key"], r["max_key"])
        for r in QUERIES["snapshot_diff_orders"](spark, SF).collect()
    }
    assert got == expect
    assert set(got) >= {"unchanged"}


def test_event_transitions_match_python_counters(spark):
    """Per-user lag sequences and transition probabilities recomputed
    with sorted lists + Counters."""
    import math
    from collections import Counter, defaultdict

    ev = pd.read_parquet(f"{SF}/events.parquet")
    seqs = defaultdict(list)
    for r in ev.itertuples():
        seqs[r.user_id].append((r.ts, r.event_id, r.event_type))
    trans = Counter()
    for s in seqs.values():
        s.sort()
        for (_, _, a), (_, _, b) in zip(s, s[1:]):
            trans[(a, b)] += 1
    totals = Counter()
    for (a, _), n in trans.items():
        totals[a] += n

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    expect = {
        (a, b): (n, r6(n / totals[a])) for (a, b), n in trans.items()
    }
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in QUERIES["event_transition_matrix"](spark, SF).collect()
    }
    assert got == expect
    assert len(got) > 5


def test_cohort_retention_matches_python_sets(spark):
    """Cohort triangle recomputed with date math + sets; offset-0
    retention must be 1.0 for every cohort."""
    import math
    from collections import defaultdict

    ev = pd.read_parquet(f"{SF}/events.parquet")
    weeks = defaultdict(set)
    for r in ev.itertuples():
        d = pd.Timestamp(r.ts)
        wk = (d - pd.Timedelta(days=d.dayofweek)).date()
        weeks[r.user_id].add(wk)
    cohort = {u: min(ws) for u, ws in weeks.items()}
    sizes = defaultdict(int)
    for u in cohort:
        sizes[cohort[u]] += 1
    m = defaultdict(set)
    for u, ws in weeks.items():
        for wk in ws:
            m[(cohort[u], (wk - cohort[u]).days // 7)].add(u)

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    expect = {
        (cw, off): (sizes[cw], len(us), r6(len(us) / sizes[cw]))
        for (cw, off), us in m.items()
    }
    got = {
        (r["cohort_wk"], r["week_offset"]): (
            r["cohort_size"],
            r["n_active"],
            r["retention"],
        )
        for r in QUERIES["cohort_retention_matrix"](spark, SF).collect()
    }
    assert got == expect
    for (cw, off), (_, _, ret) in got.items():
        if off == 0:
            assert ret == 1.0


def test_hll_rolling_users_matches_python_band_merge(spark):
    """7-day banded register merge + exact windowed distinct recomputed
    with dict loops."""
    import hashlib
    import math

    from quantitative_database_and_visualization_platform_spark.pipeline import sketches as sk

    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["d"] = pd.to_datetime(ev["ts"]).dt.date

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    day_regs: dict = {}
    day_users: dict = {}
    for r in ev.itertuples():
        h = hashlib.md5(str(r.user_id).encode()).hexdigest()
        reg, v = int(h[:2], 16), int(h[2:15], 16)
        rho = 53 if v == 0 else 53 - v.bit_length()
        m = day_regs.setdefault(r.d, {})
        m[reg] = max(m.get(reg, 0), rho)
        day_users.setdefault(r.d, set()).add(r.user_id)

    days = sorted(day_regs)
    expect = {}
    for d in days:
        window = [w for w in days if 0 <= (d - w).days <= 6]
        merged: dict = {}
        users: set = set()
        for w in window:
            for reg, rho in day_regs[w].items():
                merged[reg] = max(merged.get(reg, 0), rho)
            users |= day_users[w]
        hit = len(merged)
        s = sum(1 << (53 - x) for x in merged.values()) + (256 - hit) * (1 << 53)
        raw = sk.HLL_NUMERATOR / float(s)
        zeros = 256 - hit
        est = 256.0 * math.log(256.0 / zeros) if (raw <= 640.0 and zeros > 0) else raw
        expect[d] = (hit, r6(est), len(users), r6((r6(est) - len(users)) / len(users)))

    got = {
        r["d"]: (r["registers_hit"], r["hll_estimate"], r["exact_users"], r["rel_err"])
        for r in QUERIES["hll_rolling_users_7d"](spark, SF).collect()
    }
    assert got == expect
    assert len(got) == len(days)


def test_data_profile_matches_pandas(spark):
    """Column profile recomputed with pandas primitives."""
    import math

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cents = orders["o_totalprice"].map(lambda p: math.floor(p * 100 + 0.5))
    dates = pd.to_datetime(orders["o_orderdate"]).dt.date
    n = len(orders)
    expect = {
        "o_orderkey": (n, int(orders["o_orderkey"].isna().sum()),
                       orders["o_orderkey"].nunique(),
                       str(int(orders["o_orderkey"].min())),
                       str(int(orders["o_orderkey"].max()))),
        "o_orderstatus": (n, int(orders["o_orderstatus"].isna().sum()),
                          orders["o_orderstatus"].nunique(),
                          orders["o_orderstatus"].min(),
                          orders["o_orderstatus"].max()),
        "o_totalprice_cents": (n, int(orders["o_totalprice"].isna().sum()),
                               cents.nunique(), str(int(cents.min())),
                               str(int(cents.max()))),
        "o_orderdate": (n, int(orders["o_orderdate"].isna().sum()),
                        dates.nunique(), str(dates.min()), str(dates.max())),
        "o_orderpriority": (n, int(orders["o_orderpriority"].isna().sum()),
                            orders["o_orderpriority"].nunique(),
                            orders["o_orderpriority"].min(),
                            orders["o_orderpriority"].max()),
    }
    got = {
        r["col"]: (r["n_rows"], r["n_nulls"], r["n_distinct"], r["min_repr"], r["max_repr"])
        for r in QUERIES["data_profile_orders"](spark, SF).collect()
    }
    assert got == expect


def test_data_quality_checks_match_pandas(spark):
    """Constraint suite recomputed with pandas set logic; the synthetic
    tables must pass every check (violations injected in-memory would
    be a different dataset)."""
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    dup = int((orders.groupby("o_orderkey").size() - 1).clip(lower=0).sum())
    oc = int((~orders["o_custkey"].isin(cust["c_custkey"])).sum())
    ol = int((~li["l_orderkey"].isin(orders["o_orderkey"])).sum())
    dom = {"1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"}
    bp = int((~orders["o_orderpriority"].isin(dom)).sum())
    neg = int((orders["o_totalprice"] < 0).sum())
    dts = pd.to_datetime(orders["o_orderdate"]).dt.date
    import datetime

    stale = int(
        ((dts < datetime.date(1992, 1, 1)) | (dts > datetime.date(1998, 12, 31))).sum()
    )
    expect = {
        "unique_orderkey": dup, "fk_orders_customer": oc,
        "fk_lineitem_orders": ol, "domain_orderpriority": bp,
        "nonnegative_totalprice": neg, "orderdate_in_window": stale,
    }
    got = {
        r["check_name"]: r["n_violations"]
        for r in QUERIES["data_quality_checks"](spark, SF).collect()
    }
    assert got == expect
    for r in QUERIES["data_quality_checks"](spark, SF).collect():
        assert r["passed"] == (r["n_violations"] == 0)


def test_embedding_drift_matches_numpy_centroids(spark):
    """Per-label half-split centroids and drift metrics recomputed with
    numpy + the same 1e6 fixed-point quantization and sequential-fold
    cosine."""
    import math

    import numpy as np

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    def centroid(vecs):
        q = np.floor(np.stack(vecs).astype("float64") * 1e6 + 0.5).astype("int64")
        return (q.sum(axis=0).astype("float64") / len(vecs)) / 1e6

    def cos(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += float(x) * float(y)
        for x in a:
            na += float(x) * float(x)
        for y in b:
            nb += float(y) * float(y)
        return dot / (math.sqrt(na) * math.sqrt(nb))

    expect = {}
    for lab, g in emb.groupby("label"):
        ref = [r.embedding for r in g.itertuples() if r.vec_id % 2 == 0]
        cur = [r.embedding for r in g.itertuples() if r.vec_id % 2 == 1]
        if not ref or not cur:
            continue
        a, b = centroid(ref), centroid(cur)
        l2 = 0.0
        for x, y in zip(a, b):
            l2 += (x - y) * (x - y)
        expect[lab] = (len(ref), len(cur), r6(cos(a, b)), r6(math.sqrt(l2)))

    got = {
        r["label"]: (r["n_ref"], r["n_cur"], r["centroid_cos"], r["centroid_l2"])
        for r in QUERIES["embedding_drift_by_label"](spark, SF).collect()
    }
    assert set(got) == set(expect)
    for k in got:
        assert got[k][:2] == expect[k][:2]
        assert abs(got[k][2] - expect[k][2]) <= 2e-6, (k, got[k], expect[k])
        assert abs(got[k][3] - expect[k][3]) <= 2e-6, (k, got[k], expect[k])
    assert len(got) > 3


def test_langid_confusion_matches_python_counters(spark):
    """Confusion cells and per-language shares recomputed with Counters
    over the same stopword heuristic."""
    import math
    from collections import Counter

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    cells = Counter()
    for r in _docs().itertuples():
        w = _words(r.text)
        ratio = sum(1 for x in w if x in STOPWORDS) / len(w)
        pred = "en" if ratio > 0.03 else "other"
        cells[(r.lang, pred)] += 1
    totals = Counter()
    for (lang, _), n in cells.items():
        totals[lang] += n
    expect = {
        (lang, pred): (n, r6(n / totals[lang])) for (lang, pred), n in cells.items()
    }
    got = {
        (r["lang"], r["lang_pred"]): (r["n"], r["share"])
        for r in QUERIES["langid_confusion"](spark, SF).collect()
    }
    assert got == expect
    assert len(got) >= 2


def test_merge_upsert_matches_python_dicts(spark):
    """MERGE semantics (matched update, unmatched insert, survivor keep)
    recomputed with dict overlay."""
    import math
    from collections import defaultdict

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    base = {}
    for r in orders.itertuples():
        k = int(r.o_orderkey)
        if k % 997 != 0:
            base[k] = (r.o_orderpriority, r.o_totalprice, "keep")
    merged = dict(base)
    for r in orders.itertuples():
        k = int(r.o_orderkey)
        if k % 997 == 0:
            merged[k] = (r.o_orderpriority, r.o_totalprice, "insert")
        elif k % 1000 == 0:
            merged[k] = (r.o_orderpriority, r.o_totalprice * 1.1, "update")
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for prio, price, action in merged.values():
        a = agg[prio]
        a[0] += 1
        a[1] += action == "insert"
        a[2] += action == "update"
        a[3] += math.floor(price * 100 + 0.5)
    expect = {p: tuple(v) for p, v in agg.items()}
    got = {
        r["o_orderpriority"]: (
            r["n_rows_after"], r["n_inserted"], r["n_updated"], r["price_cents_after"]
        )
        for r in QUERIES["merge_upsert_orders"](spark, SF).collect()
    }
    assert got == expect
    assert sum(v[1] for v in got.values()) > 0


def test_k_anonymity_matches_pandas_groups(spark):
    """Equivalence classes and k=5 violations recomputed with pandas."""
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    cust["bal_sign"] = cust["c_acctbal"].map(lambda b: "neg" if b < 0 else "nonneg")
    g = cust.groupby(["c_nationkey", "c_mktsegment", "bal_sign"]).size()
    expect = {k: (int(n), bool(n < 5)) for k, n in g.items()}
    got = {
        (r["c_nationkey"], r["c_mktsegment"], r["bal_sign"]): (
            r["class_size"], r["violates_k5"]
        )
        for r in QUERIES["k_anonymity_customers"](spark, SF).collect()
    }
    assert got == expect
    assert len(got) > 5


def test_reconciliation_matches_python_dicts(spark):
    """Header/detail buckets recomputed with dict sums."""
    import math
    from collections import Counter, defaultdict

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    det = defaultdict(int)
    for r in li.itertuples():
        det[int(r.l_orderkey)] += math.floor(
            r.l_extendedprice * (1 + r.l_tax) * (1 - r.l_discount) * 100 + 0.5
        )
    cells = Counter()
    for r in orders.itertuples():
        k = int(r.o_orderkey)
        hdr = math.floor(r.o_totalprice * 100 + 0.5)
        if k not in det:
            b = "no_detail"
        else:
            diff = abs(det[k] - hdr)
            b = "match" if diff <= 0.001 * hdr else ("near" if diff <= 0.05 * hdr else "large")
        cells[(r.o_orderpriority, b)] += 1
    expect = dict(cells)
    got = {
        (r["o_orderpriority"], r["bucket"]): r["n"]
        for r in QUERIES["order_lineitem_reconciliation"](spark, SF).collect()
    }
    assert got == expect
    assert len(got) > 3


def test_token_pmi_matches_python_counters(spark):
    """PMI top-25 recomputed with Counters and math.log."""
    import math
    from collections import Counter

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    uni = Counter()
    big = Counter()
    for r in _docs().itertuples():
        w = _words(r.text)
        uni.update(w)
        big.update(zip(w, w[1:]))
    n = sum(uni.values())
    scored = [
        (a, b, c, r6(math.log(n * c / (uni[a] * uni[b]))))
        for (a, b), c in big.items()
        if c >= 5
    ]
    expect = sorted(scored, key=lambda t: (-t[3], t[0], t[1]))[:25]
    got = [
        (r["a"], r["b"], r["cab"], r["pmi"])
        for r in QUERIES["token_pmi_pairs"](spark, SF).collect()
    ]
    assert got == expect
    assert len(got) == 25


def test_conversion_attribution_matches_python_loops(spark):
    """First/last-touch picks recomputed with list scans."""
    from collections import defaultdict

    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["ts"] = pd.to_datetime(ev["ts"])
    clicks = defaultdict(list)
    for r in ev[ev.event_type == "click"].itertuples():
        clicks[r.user_id].append((r.ts, r.event_id))
    expect = {}
    for r in ev[ev.event_type == "purchase"].itertuples():
        lo = r.ts - pd.Timedelta(days=7)
        touches = [(t, i) for t, i in clicks.get(r.user_id, []) if lo <= t <= r.ts]
        if touches:
            first = min(touches)
            last = max(touches)
            expect[r.event_id] = (
                r.user_id, r.ts.to_pydatetime(), len(touches),
                first[1], first[0].to_pydatetime(),
                last[1], last[0].to_pydatetime(),
            )

    got = {
        r["purchase_id"]: (
            r["user_id"], r["purchase_ts"], r["n_touches"],
            r["first_click_id"], r["first_click_ts"],
            r["last_click_id"], r["last_click_ts"],
        )
        for r in QUERIES["conversion_attribution"](spark, SF).collect()
    }
    assert got == expect
    assert len(got) > 3


def test_char_entropy_matches_python_counters(spark):
    """Per-doc char entropies and source stats recomputed with Counters
    and the same fixed-point term quantization."""
    import math
    from collections import Counter, defaultdict

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    per_src = defaultdict(list)
    for r in _docs().itertuples():
        t = _norm(r.text)
        cnt = Counter(t)
        n = sum(cnt.values())
        s = 0
        for _, k in cnt.items():
            p = k / n
            s += int(round(p * math.log(p) * 1e9))
        per_src[r.source].append(-s / 1e9)

    expect = {}
    for src, hs in per_src.items():
        mean = sum(int(round(h * 1e6)) for h in hs) / 1e6 / len(hs)
        expect[src] = (
            len(hs), r6(mean), r6(min(hs)), r6(max(hs)),
            sum(1 for h in hs if h < 2.5),
        )
    got = {
        r["source"]: (
            r["n_docs"], r["mean_entropy"], r["min_entropy"],
            r["max_entropy"], r["n_low_entropy"],
        )
        for r in QUERIES["char_entropy_quality"](spark, SF).collect()
    }
    assert got == expect
    assert len(got) > 2


def test_corpus_overview_matches_python(spark):
    """One-row corpus header recomputed with Counters."""
    import math
    from collections import Counter

    docs = _docs()
    toks = []
    fps = Counter()
    quals = []
    for r in docs.itertuples():
        w = _words(r.text)
        toks.extend(w)
        fps[_norm(r.text)] += 1
        quals.append(int(round(_quality(r.text) * 1e6)))
    row = QUERIES["corpus_overview"](spark, SF).collect()[0]
    assert row["n_docs"] == len(docs)
    assert row["n_chars"] == int(docs["n_chars"].sum())
    assert row["n_tokens"] == len(toks)
    assert row["vocab_size"] == len(set(toks))
    assert row["n_langs"] == docs["lang"].nunique()
    assert row["n_sources"] == docs["source"].nunique()
    assert row["n_exact_dup_docs"] == sum(c - 1 for c in fps.values() if c > 1)
    mean_q = sum(quals) / len(quals) / 1e6
    assert row["mean_quality"] == math.floor(mean_q * 1e6 + 0.5) / 1e6


def test_neardup_cluster_sizes_match_python_union_find(spark):
    """Cluster-size histogram recomputed with brute-force all-pairs
    Jaccard (t = 0.6 on distinct 3-gram sets) + a plain union-find —
    so a blocking-soundness bug in the pair generator shows up here as
    a component split/merge."""
    from collections import defaultdict

    docs = _docs()
    sets = {r.doc_id: _shingle_set(r.text) for r in docs.itertuples()}
    chars = {r.doc_id: r.n_chars for r in docs.itertuples()}
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter and inter / (len(sa) + len(sb) - inter) >= 0.6:
                union(a, b)

    comp_members = defaultdict(list)
    for a in ids:
        comp_members[find(a)].append(a)
    # only docs that appear in at least one pair belong to the graph
    in_graph = {a for a in ids if find(a) != a} | {
        find(a) for a in ids if find(a) != a
    }
    expect = defaultdict(lambda: [0, 0, 0])
    for root, members in comp_members.items():
        members = [m for m in members if m in in_graph]
        if not members:
            continue
        sz = len(members)
        e = expect[sz]
        e[0] += 1
        e[1] += sz
        e[2] += sum(chars[m] for m in members)
    expect = {k: tuple(v) for k, v in expect.items()}

    got = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"], r["total_chars"])
        for r in QUERIES["neardup_cluster_sizes"](spark, SF).collect()
    }
    assert got == expect
    assert sum(v[0] for v in got.values()) > 0


def test_ab_test_lift_matches_python_stats(spark):
    """Arm means, lift, and Welch t recomputed with hashlib + python
    statistics on the same cents-quantized per-user spends."""
    import hashlib
    import math
    from collections import defaultdict

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    ev = pd.read_parquet(f"{SF}/events.parquet")
    spend = defaultdict(int)
    users = set()
    for r in ev.itertuples():
        users.add(r.user_id)
        if r.event_type == "purchase":
            spend[r.user_id] += int(round(r.value * 100))
    arms = {0: [], 1: []}
    for uid in users:
        arm = int(hashlib.md5(str(uid).encode()).hexdigest()[:13], 16) % 2
        arms[arm].append(spend[uid])

    def stats(xs):
        n = len(xs)
        s = sum(xs)
        s2 = sum(x * x for x in xs)
        mean = s / 100.0 / n
        var = (s2 / 10000 - (s / 100) * s / 100 / n) / (n - 1)
        return n, mean, var

    n0, m0, v0 = stats(arms[0])
    n1, m1, v1 = stats(arms[1])
    row = QUERIES["ab_test_lift"](spark, SF).collect()[0]
    assert (row["n_control"], row["n_treatment"]) == (n0, n1)
    assert row["mean_control"] == r6(m0)
    assert row["mean_treatment"] == r6(m1)
    assert row["abs_lift"] == r6(m1 - m0)
    assert row["rel_lift"] == r6((m1 - m0) / m0)
    assert abs(row["welch_t"] - r6((m1 - m0) / math.sqrt(v0 / n0 + v1 / n1))) <= 2e-6


def test_rare_token_ratio_matches_python_counter(spark):
    """Top-100 vocabulary and per-source rare ratios recomputed with
    python Counters."""
    import collections
    import math

    docs = _docs()
    cnt = collections.Counter()
    for t in docs["text"]:
        cnt.update(_words(t))
    vocab = {
        tk for tk, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    }
    per_source: dict[str, list[float]] = {}
    for r in docs.itertuples():
        w = _words(r.text)
        ratio = sum(1 for x in w if x not in vocab) / len(w)
        per_source.setdefault(r.source, []).append(ratio)
    expect = {}
    for src, ratios in per_source.items():
        mean = (
            sum(int(round(x * 1_000_000)) for x in ratios) / 1_000_000 / len(ratios)
        )
        expect[src] = (
            len(ratios),
            math.floor(mean * 1_000_000 + 0.5) / 1_000_000,
            sum(1 for x in ratios if x > 0.5),
        )
    got = {
        r["source"]: (r["n_docs"], r["mean_rare_ratio"], r["n_flagged"])
        for r in QUERIES["rare_token_ratio"](spark, SF).collect()
    }
    assert got == expect


def test_ttr_quality_matches_python_counters(spark):
    """Per-doc type/hapax counts recomputed with python Counters."""
    import collections
    import math

    docs = _docs()
    expect = {}
    for r in docs.itertuples():
        freq = collections.Counter(_words(r.text))
        n_tokens = sum(freq.values())
        n_types = len(freq)
        n_hapax = sum(1 for v in freq.values() if v == 1)
        expect[r.doc_id] = (
            n_tokens,
            n_types,
            n_hapax,
            math.floor(n_types / n_tokens * 1_000_000 + 0.5) / 1_000_000,
            math.floor(n_hapax / n_types * 1_000_000 + 0.5) / 1_000_000,
        )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_types"], r["n_hapax"], r["ttr"], r["hapax_ratio"])
        for r in QUERIES["ttr_quality"](spark, SF).collect()
    }
    assert got == expect


def test_vocab_jsd_matches_python_direct_formula(spark):
    """JSD recomputed DIRECTLY (full-vocabulary sum, no factoring of the
    absent-token term) with python floats — breaks the shared-identity
    blind spot of the engine/oracle pair."""
    import collections
    import math

    docs = _docs()
    per_source: dict[str, collections.Counter] = {}
    for r in docs.itertuples():
        per_source.setdefault(r.source, collections.Counter()).update(
            _words(r.text)
        )
    corpus = collections.Counter()
    for c in per_source.values():
        corpus.update(c)
    n = sum(corpus.values())
    expect = {}
    for src, cs in per_source.items():
        ns = sum(cs.values())
        jsd = 0.0
        for tk, c in corpus.items():
            p = cs.get(tk, 0) / ns
            q = c / n
            m = (p + q) / 2
            if p > 0:
                jsd += 0.5 * p * math.log(p / m)
            jsd += 0.5 * q * math.log(q / m)
        expect[src] = (len(cs), jsd)
    got = {
        r["source"]: (r["vocab_source"], r["jsd"])
        for r in QUERIES["vocab_jsd_by_source"](spark, SF).collect()
    }
    assert set(got) == set(expect)
    for src, (vocab_n, jsd) in expect.items():
        assert got[src][0] == vocab_n
        # engine quantizes per-term at 1e9: tolerance scales with vocab
        assert abs(got[src][1] - jsd) < 5e-5, (src, got[src][1], jsd)
    # JSD must be non-degenerate for at least one source
    assert any(v[1] > 1e-4 for v in expect.values())


def test_dedup_impact_matches_python_dict_math(spark):
    """Before/after doc and token mass recomputed with python dicts
    (keep-first by min doc_id per normalized-text hash)."""
    import math

    docs = _docs().sort_values("doc_id")
    first_by_text: dict[str, int] = {}
    per_source: dict[str, list[tuple[int, bool]]] = {}
    for r in docs.itertuples():
        t = _norm(r.text)
        keeper = first_by_text.setdefault(t, r.doc_id) == r.doc_id
        per_source.setdefault(r.source, []).append((len(_words(r.text)), keeper))
    expect = {}
    for src, rows in per_source.items():
        tb = sum(n for n, _ in rows)
        ta = sum(n for n, k in rows if k)
        expect[src] = (
            len(rows),
            sum(1 for _, k in rows if k),
            tb,
            ta,
            math.floor((1.0 - ta / tb) * 1_000_000 + 0.5) / 1_000_000,
        )
    got = {
        r["source"]: (
            r["docs_before"], r["docs_after"],
            r["tokens_before"], r["tokens_after"], r["dup_token_ratio"],
        )
        for r in QUERIES["dedup_impact_report"](spark, SF).collect()
    }
    assert got == expect
    # sf0.001 carries no exact duplicates — the duplicate-mass behavior is
    # bound by the sf0.01 oracle parity run (corpus_overview counts dups
    # there); here the report must at least be full-coverage and consistent
    assert sum(v[0] for v in expect.values()) == len(docs)


def test_ann_recall_audit_matches_numpy_brute_force(spark):
    """Recall@10 recomputed with numpy: exact top-10 by cosine and the
    SRP bucket membership recomputed from the engine's own bucket
    column (the bucket hash is already independently golden-tested)."""
    import numpy as np

    from quantitative_database_and_visualization_platform_spark.pipeline.embeddings import srp_bucket
    from quantitative_database_and_visualization_platform_spark.sources.catalog import load_table

    emb = load_table(spark, SF, "embeddings")
    rows = emb.select("vec_id", "embedding", srp_bucket("embedding").alias("b")).collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    bucket = {r["vec_id"]: r["b"] for r in rows}
    norms = np.linalg.norm(mat, axis=1)
    expect = {}
    for pi, pid in enumerate(ids):
        if pid % 50 != 0:
            continue
        cos = (mat @ mat[pi]) / (norms * norms[pi])
        order = sorted(
            (int(i) for i in range(len(ids)) if ids[i] != pid),
            key=lambda i: (-cos[i], ids[i]),
        )
        exact = {int(ids[i]) for i in order[:10]}
        cand = [int(ids[i]) for i in order if bucket[int(ids[i])] == bucket[pid]]
        hits = len(exact & set(cand[:10]))
        expect[int(pid)] = (len(cand), hits, hits / 10.0)
    got = {
        r["p_id"]: (r["n_cand"], r["n_hit"], r["recall_at_10"])
        for r in QUERIES["ann_recall_audit"](spark, SF).collect()
    }
    assert set(got) == set(expect)
    for pid, (n_cand, hits, rec) in expect.items():
        assert got[pid][0] == n_cand, (pid, got[pid], n_cand)
        assert got[pid][1] == hits
        assert abs(got[pid][2] - rec) < 1e-6


def test_l_diversity_matches_pandas(spark):
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    df = cust.merge(orders, left_on="c_custkey", right_on="o_custkey")
    expect = {}
    for (nk, seg), g in df.groupby(["c_nationkey", "c_mktsegment"]):
        l = g["o_orderpriority"].nunique()
        expect[(nk, seg)] = (len(g), l, l < 3)
    got = {
        (r["c_nationkey"], r["c_mktsegment"]): (
            r["n_rows"], r["l_distinct"], r["violates_l3"],
        )
        for r in QUERIES["l_diversity_report"](spark, SF).collect()
    }
    assert got == expect


def test_cluster_profile_matches_numpy_kmeans_step(spark):
    """Cluster profile recomputed with numpy: the same seeds→assign→
    refine→assign chain (independent matrix implementation), then
    python-side cohesion and majority-label math."""
    import math

    import numpy as np

    emb = pd.read_parquet(f"{SF}/embeddings.parquet").sort_values("vec_id")
    ids = emb["vec_id"].to_numpy()
    mat = np.array([list(v) for v in emb["embedding"]], dtype=np.float64)
    labels = emb["label"].to_list()
    seeds = {int(ids[i]): mat[i] for i in range(8)}

    def assign(cents: dict[int, np.ndarray]) -> list[int]:
        out = []
        for i in range(len(ids)):
            best = min(
                cents.items(),
                key=lambda kv: (
                    math.floor(float(((mat[i] - kv[1]) ** 2).sum()) * 1e6 + 0.5),
                    kv[0],
                ),
            )
            out.append(best[0])
        return out

    a1 = assign(seeds)
    cents2: dict[int, np.ndarray] = {}
    for cid in set(a1):
        members = mat[[i for i in range(len(ids)) if a1[i] == cid]]
        q = np.floor(members * 1e6 + 0.5).astype("int64").sum(axis=0)
        cents2[cid] = (q / len(members)) / 1e6
    a2 = assign(cents2)
    per: dict[int, list[int]] = {}
    labs: dict[int, dict[str, int]] = {}
    for i, cid in enumerate(a2):
        cos = float(
            mat[i] @ cents2[cid]
            / (np.linalg.norm(mat[i]) * np.linalg.norm(cents2[cid]))
        )
        per.setdefault(cid, []).append(int(math.floor(cos * 1e6 + 0.5)))
        labs.setdefault(cid, {})
        labs[cid][labels[i]] = labs[cid].get(labels[i], 0) + 1
    expect = {}
    for cid, cos6 in per.items():
        maj = min(labs[cid].items(), key=lambda kv: (-kv[1], kv[0]))
        expect[cid] = (
            len(cos6),
            math.floor(sum(cos6) / len(cos6) / 1e6 * 1e6 + 0.5) / 1e6,
            maj[0],
            math.floor(maj[1] / len(cos6) * 1e6 + 0.5) / 1e6,
        )
    got = {
        r["cluster"]: (
            r["n_members"], r["mean_cos_to_centroid"],
            r["majority_label"], r["majority_share"],
        )
        for r in QUERIES["embedding_cluster_profile"](spark, SF).collect()
    }
    assert set(got) == set(expect)
    for cid, exp in expect.items():
        assert got[cid][0] == exp[0]
        assert abs(got[cid][1] - exp[1]) <= 2e-6, (cid, got[cid], exp)
        assert got[cid][2] == exp[2]
        assert abs(got[cid][3] - exp[3]) <= 2e-6


def test_minhash_pr_audit_matches_python_brute_force(spark):
    """P/R audit recomputed fully in python: md5 minhash signatures,
    band-key candidates, and brute-force exact-Jaccard ground truth."""
    import hashlib
    import math

    docs = _docs()
    sets = {r.doc_id: _shingle_set(r.text) for r in docs.itertuples()}
    sets = {k: v for k, v in sets.items() if v}

    def h(i: int, x: str) -> str:
        return hashlib.md5(f"{i}:{x}".encode()).hexdigest()

    sigs = {
        k: [min(h(i, x) for x in s) for i in range(8)] for k, s in sets.items()
    }
    cand = set()
    keys = sorted(sigs)
    buckets: dict[tuple[int, str], list[int]] = {}
    for k in keys:
        for b in range(4):
            key = (b, sigs[k][2 * b] + sigs[k][2 * b + 1])
            buckets.setdefault(key, []).append(k)
    for members in buckets.values():
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                cand.add((min(a, b), max(a, b)))
    exact = set()
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter / (len(sets[a]) + len(sets[b]) - inter) >= 0.6:
                exact.add((a, b))
    tp = len(exact & cand)
    expect = (
        len(exact), len(cand), tp, len(cand - exact), len(exact - cand),
        math.floor(tp / len(cand) * 1e6 + 0.5) / 1e6 if cand else None,
        math.floor(tp / len(exact) * 1e6 + 0.5) / 1e6 if exact else None,
    )
    r = QUERIES["minhash_pr_audit"](spark, SF).collect()[0]
    got = (
        r["n_exact"], r["n_cand"], r["tp"], r["fp"], r["fn"],
        r["precision"], r["recall"],
    )
    assert got == expect


def _exact_pairs_06() -> dict[tuple[int, int], float]:
    """Brute-force exact-Jaccard pairs >= 0.6 with 6-dp rounding."""
    import math

    docs = _docs()
    sets = {r.doc_id: _shingle_set(r.text) for r in docs.itertuples()}
    out = {}
    keys = sorted(k for k, v in sets.items() if v)
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            inter = len(sets[a] & sets[b])
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= 0.6:
                out[(a, b)] = math.floor(j * 1e6 + 0.5) / 1e6
    return out


def test_threshold_sweep_matches_python_sets(spark):
    pairs = _exact_pairs_06()
    expect = {}
    for i in range(4):
        thr = 0.6 + i * 0.1
        kept = {k: v for k, v in pairs.items() if v >= thr}
        slots = len({a for a, _ in kept}) + len({b for _, b in kept})
        expect[round(thr, 6)] = (len(kept), slots)
    got = {
        round(r["thr"], 6): (r["n_pairs"], r["n_doc_slots"])
        for r in QUERIES["neardup_threshold_sweep"](spark, SF).collect()
    }
    assert got == expect
    assert expect[0.6][0] > 0  # the corpus must exercise the sweep


def test_cross_source_matrix_matches_python_sets(spark):
    import math

    docs = _docs()
    src = dict(zip(docs["doc_id"], docs["source"]))
    pairs = _exact_pairs_06()
    agg: dict[tuple[str, str], list[int]] = {}
    for (a, b), j in pairs.items():
        key = tuple(sorted((src[a], src[b])))
        agg.setdefault(key, []).append(int(round(j * 1e6)))
    expect = {
        k: (
            len(v),
            math.floor(sum(v) / 1e6 / len(v) * 1e6 + 0.5) / 1e6,
        )
        for k, v in agg.items()
    }
    got = {
        (r["source_x"], r["source_y"]): (r["n_pairs"], r["mean_jaccard"])
        for r in QUERIES["cross_source_dup_matrix"](spark, SF).collect()
    }
    assert got == expect


def test_shard_balance_matches_python_hash(spark):
    import hashlib
    import math

    docs = _docs()
    agg: dict[int, list[int]] = {}
    for r in docs.itertuples():
        shard = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:13], 16) % 16
        agg.setdefault(shard, []).append(len(_words(r.text)))
    t = sum(sum(v) for v in agg.values())
    k = len(agg)
    expect = {
        shard: (
            len(v), sum(v),
            math.floor(sum(v) / (t / k) * 1e6 + 0.5) / 1e6,
        )
        for shard, v in agg.items()
    }
    got = {
        r["shard"]: (r["n_docs"], r["tokens"], r["load_vs_mean"])
        for r in QUERIES["shard_assignment_balance"](spark, SF).collect()
    }
    assert got == expect


def test_length_quality_grid_matches_python(spark):
    docs = _docs()
    feats = []
    for r in docs.itertuples():
        w = _words(r.text)
        feats.append((r.doc_id, len(w), _quality(r.text)))
    total = len(feats)
    base, extra = divmod(total, 5)
    grid: dict[tuple[int, str], list[int]] = {}
    idx = 0
    for q in range(1, 6):
        size = base + (1 if q <= extra else 0)
        for doc_id, n_tok, qual in sorted(feats, key=lambda t: (t[1], t[0]))[idx : idx + size]:
            band = "low" if qual < 0.5 else ("mid" if qual < 0.8 else "high")
            grid.setdefault((q, band), []).append(n_tok)
        idx += size
    expect = {k: (len(v), sum(v)) for k, v in grid.items()}
    got = {
        (r["len_q"], r["q_band"]): (r["n_docs"], r["tokens"])
        for r in QUERIES["length_quality_grid"](spark, SF).collect()
    }
    assert got == expect


def test_token_length_by_lang_matches_python(spark):
    import math

    docs = _docs()
    agg: dict[str, list[int]] = {}
    for r in docs.itertuples():
        agg.setdefault(r.lang, []).extend(len(t) for t in _words(r.text))
    expect = {
        lang: (
            len(v),
            sum(1 for x in v if x <= 3),
            sum(1 for x in v if 4 <= x <= 6),
            sum(1 for x in v if x >= 7),
            math.floor(sum(v) / len(v) * 1e6 + 0.5) / 1e6,
        )
        for lang, v in agg.items()
    }
    got = {
        r["lang"]: (r["n_tokens"], r["n_short"], r["n_mid"], r["n_long"], r["mean_len"])
        for r in QUERIES["token_length_by_lang"](spark, SF).collect()
    }
    assert got == expect
