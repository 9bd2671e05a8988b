"""Property tests (SURVEY.md §5.4): operator invariants that hold for
arbitrary panels — rank range, scale normalization, demean zero-mean,
log-trick product exactness, parser totality."""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _panel(spark, values):
    pdf = pd.DataFrame(
        {
            "d": [v[0] for v in values],
            "x": [v[1] for v in values],
            "e": range(len(values)),
        }
    )
    return spark.createDataFrame(pdf)


values_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # date bucket
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
    ),
    min_size=2,
    max_size=40,
)


@settings(max_examples=12, deadline=None)
@given(values_strategy)
def test_cs_rank_in_unit_interval(spark, values):
    from quantitative_database_and_visualization_platform_spark.operators.crosssection import cs_rank

    out = _panel(spark, values).select(cs_rank("x", "d").alias("r")).toPandas()["r"]
    assert ((out > 0) & (out <= 1)).all()


@settings(max_examples=12, deadline=None)
@given(values_strategy)
def test_cs_scale_sums_abs_to_a(spark, values):
    from quantitative_database_and_visualization_platform_spark.operators.crosssection import cs_scale

    df = _panel(spark, values)
    out = df.select("d", cs_scale("x", 2.5, "d").alias("s")).toPandas()
    for _, grp in out.groupby("d"):
        total = grp["s"].abs().sum()
        if not math.isnan(total) and total > 0:
            assert abs(total - 2.5) < 1e-6


@settings(max_examples=12, deadline=None)
@given(values_strategy)
def test_cs_demean_zero_mean(spark, values):
    from quantitative_database_and_visualization_platform_spark.operators.crosssection import cs_demean

    df = _panel(spark, values)
    out = df.select("d", cs_demean("x", "d").alias("m")).toPandas()
    for _, grp in out.groupby("d"):
        scale = max(1.0, grp["m"].abs().max())
        assert abs(grp["m"].mean()) / scale < 1e-9


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-50, max_value=50, allow_nan=False, width=16),
        min_size=1,
        max_size=12,
    )
)
def test_ts_product_matches_direct_multiply(spark, xs):
    from quantitative_database_and_visualization_platform_spark.operators import timeseries as ts

    pdf = pd.DataFrame({"e": [1] * len(xs), "t": range(len(xs)), "x": xs})
    w = ts.entity_window("e", "t")
    out = (
        spark.createDataFrame(pdf)
        .select("t", ts.ts_product("x", len(xs), w).alias("p"))
        .orderBy("t")
        .toPandas()["p"]
        .iloc[-1]
    )
    direct = 1.0
    for v in xs:
        direct *= v
    if direct == 0:
        assert out == 0
    else:
        assert abs(out - direct) <= 1e-9 * max(1.0, abs(direct))


def test_parser_totality(spark):
    """streak/monetary parsers never throw and hit the documented cases."""
    from quantitative_database_and_visualization_platform_spark.functions.scalar import (
        monetary_text_to_double,
        streak_height,
    )

    pdf = pd.DataFrame(
        {
            "streak": ["3连板", "5天4板", "首板", "garbage", "", "12连板"],
            "money": ["1.2亿", "5000万", "42", "-3.5亿", "junk", ""],
        }
    )
    out = (
        spark.createDataFrame(pdf)
        .select(
            streak_height(F.col("streak")).alias("h"),
            monetary_text_to_double(F.col("money")).alias("m"),
        )
        .toPandas()
    )
    assert out["h"].tolist() == [3, 4, 1, 1, 1, 12]
    m = out["m"].tolist()
    assert m[0] == 1.2e8 and m[1] == 5e7 and m[2] == 42.0 and m[3] == -3.5e8
    assert pd.isna(m[4]) and pd.isna(m[5])


@settings(max_examples=8, deadline=None)
@given(values_strategy)
def test_rank_block_matches_window_cs_rank(spark, values):
    """with_cs_rank_block must be BIT-identical to the window cs_rank for
    null-free input — same average-tie pct rank, same division order —
    since the alpha DAG mixes block ranks with window-era oracle SQL."""
    from quantitative_database_and_visualization_platform_spark.operators.crosssection import (
        cs_rank,
        with_cs_rank_block,
    )

    # the block contract requires date-clustered input (in the alpha DAG
    # the preceding window stage guarantees it; here, repartition)
    df = _panel(spark, values).repartition("d")
    want = df.select("d", "e", cs_rank("x", "d").alias("r")).collect()
    got = (
        with_cs_rank_block(df, {"r": "x"}, "d", keep=("d", "e", "x"))
        .select("d", "e", "r")
        .collect()
    )
    a = {(row.d, row.e): row.r for row in want}
    b = {(row.d, row.e): row.r for row in got}
    assert a == b


def test_rank_block_null_and_keep(spark):
    """Null in → null out (Arrow NaN round-trip restored to NULL), and the
    keep projection drops unlisted columns while analysis fails loudly if
    a kept column does not exist."""
    import pandas as pd
    import pytest

    from quantitative_database_and_visualization_platform_spark.operators.crosssection import (
        with_cs_rank_block,
    )

    pdf = pd.DataFrame({"d": [1, 1, 1, 2], "x": [3.0, None, 1.0, 5.0], "junk": [0, 0, 0, 0]})
    df = spark.createDataFrame(pdf).repartition("d")
    out = with_cs_rank_block(df, {"r": "x"}, "d", keep=("d", "x"))
    rows = sorted(out.collect(), key=lambda r: (r.d, r.x if r.x is not None else -1))
    assert "junk" not in out.columns
    assert [r.r for r in rows] == [None, 0.5, 1.0, 1.0]
    with pytest.raises(Exception, match="junk2|UNRESOLVED"):
        with_cs_rank_block(df, {"r": "x"}, "d", keep=("d", "x", "junk2")).collect()


# --- advanced-operator properties (round 4) --------------------------------


asof_strategy = st.tuples(
    st.lists(  # left: (key, time)
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=25
    ),
    st.lists(  # right: (key, time, payload-seed)
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 99)),
        min_size=0,
        max_size=25,
    ),
)


@settings(max_examples=10, deadline=None)
@given(asof_strategy)
def test_asof_join_matches_brute_force(spark, data):
    """For every left row the as-of match must equal the brute-force
    'greatest right_time <= left_time for the key' — on arbitrary
    key/time multisets (duplicate left times, sparse keys, empty right)."""
    import datetime as dt

    from quantitative_database_and_visualization_platform_spark.operators.relational import asof_join

    left_rows, right_rows = data
    base = dt.datetime(2024, 1, 1)
    # right side must be unique per (key, time): keep the max payload
    right_dedup = {}
    for k, t, p in right_rows:
        right_dedup[(k, t)] = max(right_dedup.get((k, t), -1), p)
    left = spark.createDataFrame(
        [(i, k, base + dt.timedelta(hours=t)) for i, (k, t) in enumerate(left_rows)],
        ["lid", "k", "t"],
    )
    if right_dedup:
        right = spark.createDataFrame(
            [(k, base + dt.timedelta(hours=t), float(p)) for (k, t), p in right_dedup.items()],
            ["k", "rt", "px"],
        )
    else:
        from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType, TimestampType

        right = spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("k", IntegerType()),
                    StructField("rt", TimestampType()),
                    StructField("px", DoubleType()),
                ]
            ),
        )
    got = {
        r["lid"]: r["asof_px"]
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="rt", payload=["px"]
        ).collect()
    }
    for i, (k, t) in enumerate(left_rows):
        earlier = [(rt, p) for (rk, rt), p in right_dedup.items() if rk == k and rt <= t]
        want = float(max(earlier)[1]) if earlier else None
        assert got[i] == want, (i, k, t, got[i], want)
    assert len(got) == len(left_rows)


edges_strategy = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)), min_size=1, max_size=40
).filter(lambda es: any(a != b for a, b in es))


@settings(max_examples=8, deadline=None)
@given(edges_strategy, st.sampled_from([3, 7, 500_000]))
def test_connected_components_match_union_find(spark, edges, epp):
    """epp (edges_per_partition) also draws SMALL values so random graphs
    exercise the multi-partition union-find path (the r6 ADVICE duplicate-
    row bug lived only there); the dict comprehension below doubles as the
    one-row-per-node check via the explicit length assert."""
    from quantitative_database_and_visualization_platform_spark.pipeline.dedup import (
        connected_components,
    )
    from quantitative_database_and_visualization_platform_spark.session import release_managed

    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["a_id", "b_id"])
    try:
        rows = connected_components(df, edges_per_partition=epp).collect()
        got = {r["doc_id"]: r["component"] for r in rows}
        assert len(rows) == len(got), "duplicate (doc_id, component) rows"
    finally:
        release_managed()
    # reference union-find
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want


def test_stratified_sample_is_balanced_and_partition_invariant(spark):
    """Every stratum is downsampled to exactly the rarest stratum's
    count, and the SELECTION (not just the counts) is identical under a
    different input partitioning — the determinism contract."""
    from pyspark.sql import functions as F

    from quantitative_database_and_visualization_platform_spark.plans import QUERIES

    sf = "/root/testdata/sf0.01"
    out = QUERIES["stratified_sample_balanced"](spark, sf)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    min_cnt = min(
        r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    )
    assert set(counts.values()) == {min_cnt}, counts
    # partition-invariance: recompute from a deliberately reshuffled input
    ids = {(r["lang"], r["doc_id"]) for r in out.collect()}
    from quantitative_database_and_visualization_platform_spark.sources.catalog import load_table

    reshuffled = load_table(spark, sf, "documents").repartition(13).select("doc_id", "lang")
    h = F.md5(F.col("doc_id").cast("string"))
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    mc = reshuffled.groupBy("lang").count().agg(F.min("count").alias("__m"))
    again = (
        reshuffled.withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(mc))
        .filter(F.col("rn") <= F.col("__m"))
    )
    ids2 = {(r["lang"], r["doc_id"]) for r in again.collect()}
    assert ids == ids2


def test_doc_packing_conserves_tokens_and_is_contiguous(spark):
    """Packing must conserve the token mass per source shard and assign
    contiguous pack ids from 0 (a gap would mean a lost window)."""
    from pyspark.sql import functions as F

    from quantitative_database_and_visualization_platform_spark.pipeline.dedup import normalized_text
    from quantitative_database_and_visualization_platform_spark.plans import QUERIES
    from quantitative_database_and_visualization_platform_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.01"
    out = QUERIES["doc_packing"](spark, sf).collect()
    docs = load_table(spark, sf, "documents")
    want = {
        r["source"]: r["t"]
        for r in docs.groupBy("source")
        .agg(F.sum(F.size(F.split(normalized_text("text"), " "))).alias("t"))
        .collect()
    }
    got: dict[str, int] = {}
    packs: dict[str, list[int]] = {}
    for r in out:
        got[r["source"]] = got.get(r["source"], 0) + r["tokens_packed"]
        packs.setdefault(r["source"], []).append(r["pack_id"])
    assert got == want
    for src, ids in packs.items():
        ids.sort()
        assert ids == list(range(len(ids))), f"{src}: non-contiguous packs {ids[:10]}"


def test_repetition_fractions_are_valid(spark):
    """dup/top fractions are proper fractions; a doc of all-identical
    words must be flagged, a doc of all-distinct words kept."""
    from pyspark.sql import functions as F

    from quantitative_database_and_visualization_platform_spark.plans import QUERIES

    sf = "/root/testdata/sf0.01"
    out = QUERIES["repetition_quality"](spark, sf)
    bad = out.filter(
        (F.col("dup_3gram_frac") < 0)
        | (F.col("dup_3gram_frac") >= 1)
        | (F.col("top_2gram_frac") <= 0)
        | (F.col("top_2gram_frac") > 1)
    ).count()
    assert bad == 0


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # user bucket
            st.integers(min_value=0, max_value=200_000),  # seconds offset
        ),
        min_size=1,
        max_size=50,
    )
)
def test_session_windows_match_islands_for_any_times(spark, events):
    """For ARBITRARY event times, native session_window must produce
    exactly the islands a gap-scan finds: same session count per user,
    every gap inside a session < 30 min, every inter-session gap >= 30
    min, and session_end = last_ts + 30 min."""
    import datetime as dt

    from quantitative_database_and_visualization_platform_spark.streaming.session_windows import (
        session_stats,
    )

    base = dt.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {
            "user_id": [u for u, _ in events],
            "ts": [base + dt.timedelta(seconds=s) for _, s in events],
            "value": [1.0] * len(events),
        }
    )
    out = session_stats(spark.createDataFrame(pdf)).toPandas()

    gap = dt.timedelta(minutes=30)
    for uid in {u for u, _ in events}:
        times = sorted(t for u, t in zip(pdf.user_id, pdf.ts) if u == uid)
        # islands by the >= gap rule (window [t, t+gap) merge-on-overlap)
        sessions = []
        for t in times:
            if sessions and t - sessions[-1][-1] < gap:
                sessions[-1].append(t)
            else:
                sessions.append([t])
        mine = out[out.user_id == uid].sort_values("session_start")
        assert len(mine) == len(sessions)
        for row, sess in zip(mine.itertuples(), sessions):
            assert row.session_start == sess[0]
            assert row.session_end == sess[-1] + gap
            assert row.n_events == len(sess)


@settings(max_examples=8, deadline=None)
@given(st.integers(min_value=1, max_value=400))
def test_chunking_tiles_every_token(spark, n_tokens):
    """For any doc length, the engine's 64/48 chunks must cover every
    token exactly once per overlap pattern: starts at stride multiples,
    lengths min(64, n-start), hashes of the exact slices, and the union
    of [start, start+len) covering [0, n)."""
    import hashlib

    from pyspark.sql import Row

    from quantitative_database_and_visualization_platform_spark.pipeline.text import chunk_tokens

    words = [f"t{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([Row(doc_id=1, text=" ".join(words))])
    got = sorted(
        (r["chunk_id"], r["start_tok"], r["n_tok"], r["chunk_hash"])
        for r in chunk_tokens(df).collect()
    )
    covered = set()
    prev_end = 0
    for k, (cid, start, n_tok, h) in enumerate(got):
        assert cid == k and start == k * 48
        assert n_tok == min(64, n_tokens - start)
        assert h == hashlib.md5(" ".join(words[start : start + n_tok]).encode()).hexdigest()
        # every chunk past the first must cover at least one NEW token —
        # no clamped-tail chunk may be a subset of its predecessor
        if k > 0:
            assert start + n_tok > prev_end, (start, n_tok, prev_end)
        prev_end = start + n_tok
        covered |= set(range(start, start + n_tok))
    assert covered == set(range(n_tokens))
    # chunk count: exactly ceil((n - 64) / 48) + 1, floored at one chunk
    assert len(got) == (1 if n_tokens <= 64 else -((n_tokens - 64) // -48) + 1)
    # no chunk starts at/after the end of the doc
    assert all(start < n_tokens for _, start, _, _ in got)


def test_bloom_filter_has_no_false_negatives(spark):
    """Fundamental Bloom guarantee: every exact contamination hit is
    also a bloom hit, per doc — a false negative would mean the filter
    can silently leak benchmark text into training data."""
    from quantitative_database_and_visualization_platform_spark.plans import QUERIES

    rows = QUERIES["bloom_decontamination"](spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert r["n_exact_hits"] <= r["n_bloom_hits"], r
        assert r["n_false_pos"] == r["n_bloom_hits"] - r["n_exact_hits"], r


def test_hll_estimate_within_error_bound(spark):
    """HLL with m=256 registers has σ ≈ 1.04/√256 = 6.5%; every
    per-source estimate (16k+ distinct shingles) must land within 3σ of
    the exact count, and the merged '__all__' row must estimate at least
    the largest single source."""
    from quantitative_database_and_visualization_platform_spark.plans import QUERIES

    rows = {
        r["source"]: r
        for r in QUERIES["hll_distinct_by_source"](spark, "/root/testdata/sf0.01").collect()
    }
    assert "__all__" in rows
    for src, r in rows.items():
        assert abs(r["rel_err"]) < 3 * 1.04 / 16.0, (src, r["rel_err"])
    biggest = max(
        r["exact_distinct"] for s, r in rows.items() if s != "__all__"
    )
    assert rows["__all__"]["hll_estimate"] >= biggest * (1 - 3 * 1.04 / 16.0)


def test_bloom_probe_paths_agree(spark):
    """The literal-bitmap expression probe and the relational
    (broadcast-join) probe must classify every candidate identically —
    they implement the same filter."""
    from pyspark.sql import functions as F

    from quantitative_database_and_visualization_platform_spark.pipeline import dedup as dd
    from quantitative_database_and_visualization_platform_spark.pipeline import sketches as sk
    from quantitative_database_and_visualization_platform_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    sh = dd.with_shingles(docs, k=5).persist()
    grams = sh.select("doc_id", F.explode("shingles").alias("g"))
    ev = grams.filter(F.col("doc_id") % 97 == 0).select("g").distinct().persist()
    bits = sk.bloom_bits(ev, "g")
    vocab = grams.filter(F.col("doc_id") % 97 != 0).select("g").distinct()

    join_path = {
        r["g"]: r["bloom_hit"]
        for r in sk.bloom_membership(vocab, bits, "g").collect()
    }
    words = sk.bloom_bitmap(bits)
    expr_path = {
        r["g"]: r["bh"]
        for r in vocab.withColumn("__bw", F.lit(words))
        .withColumn("bh", F.expr(sk.bloom_hit_sql("g")))
        .select("g", "bh")
        .collect()
    }
    sh.unpersist()
    ev.unpersist()
    assert join_path == expr_path
    assert len(join_path) > 0 and any(join_path.values())


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # order key (dup-heavy)
            st.integers(min_value=0, max_value=2),  # group
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=7),  # n buckets
    st.integers(min_value=1, max_value=9),  # num_ranges
)
def test_global_ntile_matches_window_ntile_property(spark, rows, n, num_ranges):
    """global_ntile must be bit-identical to the window-function NTILE for
    ANY data / bucket count / range-partition count — including heavy
    ties (unique tie-break via the row id), empty-ish groups, N < n, and
    more ranges than rows."""
    from pyspark.sql import Window

    from quantitative_database_and_visualization_platform_spark.operators.relational import global_ntile

    pdf = pd.DataFrame(
        {
            "v": [r[0] for r in rows],
            "g": [str(r[1]) for r in rows],
            "k": range(len(rows)),
        }
    )
    df = spark.createDataFrame(pdf).repartition(3)
    # global
    exp = df.withColumn("b", F.ntile(n).over(Window.orderBy("v", "k")))
    got = global_ntile(df, n, ["v", "k"], num_ranges=num_ranges, out="b")
    assert sorted(map(tuple, exp.collect())) == sorted(map(tuple, got.collect()))
    # partitioned
    expg = df.withColumn(
        "b", F.ntile(n).over(Window.partitionBy("g").orderBy("v", "k"))
    )
    gotg = global_ntile(
        df, n, ["v", "k"], partition_cols=["g"], num_ranges=num_ranges, out="b"
    )
    assert sorted(map(tuple, expg.collect())) == sorted(map(tuple, gotg.collect()))


@given(st.integers(min_value=1, max_value=10**12))
@settings(max_examples=200, deadline=None)
def test_pair_blocks_formula_matches_oracle_twin(n):
    """The blocked pair screens' Python block count must equal the
    oracle's GREATEST(1, (n + 31) // 32) for ANY universe size — the
    value hash binds only if both engines derive the identical integer."""
    import duckdb

    from quantitative_database_and_visualization_platform_spark.plans.backtest_queries import (
        _PAIR_BLOCK_TARGET,
    )

    py = max(1, (n + _PAIR_BLOCK_TARGET - 1) // _PAIR_BLOCK_TARGET)
    sql = duckdb.sql(
        f"SELECT GREATEST(1, ({n} + {_PAIR_BLOCK_TARGET - 1}) // {_PAIR_BLOCK_TARGET})"
    ).fetchone()[0]
    assert py == sql


@given(st.integers(min_value=1, max_value=10**12))
@settings(max_examples=200, deadline=None)
def test_planes_formula_matches_oracle_twin_property(n):
    """planes_for_corpus vs the bin()/length oracle twin, over arbitrary
    corpus sizes (the parametrized golden pins a fixed list; this
    covers the space)."""
    import duckdb

    from quantitative_database_and_visualization_platform_spark.pipeline.embeddings import (
        planes_for_corpus,
    )

    sql = duckdb.sql(
        f"SELECT GREATEST(1, length(bin(({n} - 1) // 256)))"
    ).fetchone()[0]
    assert sql == planes_for_corpus(n, 256)


@given(
    st.lists(
        st.tuples(st.sampled_from([-1, 1]), st.integers(min_value=0, max_value=50)),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=200, deadline=None)
def test_vpin_bucket_edge_three_way_agreement(signed):
    """The r10-advice vpin edge: a leading k=0 row gives cum=0, where
    truncating (engine DIV / //) and flooring (Python //) division
    disagree on the negative operand. With the GREATEST/max clamp all
    three implementations must agree for ANY signed volume sequence."""
    import duckdb

    total = sum(k for _, k in signed)
    if total <= 0:
        return
    bsz = (total + 19) // 20
    cum = 0
    py_buckets = []
    for _, k in signed:
        cum += k
        py_buckets.append(max(cum - 1, 0) // bsz)
    rows = ",".join(
        f"({i}, {k})" for i, (_, k) in enumerate(signed)
    )
    sql_buckets = [
        r[0]
        for r in duckdb.sql(
            f"""
            SELECT GREATEST(cum - 1, 0) // {bsz} AS b FROM (
                SELECT i, SUM(k) OVER (ORDER BY i) AS cum
                FROM (VALUES {rows}) t(i, k)
            ) ORDER BY i
            """
        ).fetchall()
    ]
    assert py_buckets == sql_buckets
