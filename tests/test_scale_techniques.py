"""Scale-technique tests: bucketed co-located joins (no exchange) and
salted skew joins (identical results to a plain join)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark):
    """bucketBy co-locates both sides on the join key at WRITE time, so
    the join plans with zero shuffles — the lakehouse move that makes a
    repeated 100 TB fact⋈fact join affordable."""
    try:
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
        (
            orders.write.bucketBy(4, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable("orders_b")
        )
        (
            lineitem.write.bucketBy(4, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable("lineitem_b")
        )
        # at test scale the planner would broadcast (and skip bucketing);
        # disable broadcast to exercise the co-located sort-merge path a
        # fact⋈fact join takes at 100 TB
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("lineitem_b").join(
                spark.table("orders_b"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan[:3000]
            assert "Bucketed: true" in plan, plan[:3000]
            expected = lineitem.join(
                orders, lineitem["l_orderkey"] == orders["o_orderkey"]
            ).count()
            assert joined.count() == expected
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        # warehouse dir is a static config; tables land in the session's
        # default spark-warehouse — drop them and remove the leftovers
        warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
        for t in ("orders_b", "lineitem_b"):
            shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)


def test_salted_join_matches_plain_join(spark):
    from quantitative_database_and_visualization_platform_spark.operators.relational import (
        salted_join,
    )

    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    salted = salted_join(lineitem, orders, "l_orderkey")
    plain = lineitem.join(orders, "l_orderkey")
    key = ["l_orderkey", "l_linenumber"]
    a = salted.orderBy(key).toPandas().reset_index(drop=True)
    b = plain.orderBy(key).toPandas().reset_index(drop=True)
    assert len(a) == len(b) > 0
    assert sorted(a.columns) == sorted(b.columns)
    a = a[sorted(a.columns)]
    b = b[sorted(b.columns)]
    assert a.equals(b)


def test_srp_multiprobe_recall(spark):
    """Multi-probe SRP ANN must dominate single-probe recall against the
    brute-force cosine top-k at the same bucketing, and flipping the two
    weakest bits should recover a solid fraction of the true neighbors."""
    from quantitative_database_and_visualization_platform_spark.pipeline.embeddings import (
        ann_multiprobe,
        topk_cosine,
    )
    from quantitative_database_and_visualization_platform_spark.sources.catalog import load_table

    emb = load_table(spark, SF, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0)
    k = 10
    truth = {r.vec_id for r in topk_cosine(emb, probe, k).select("vec_id").collect()}

    def recall(n_probes: int) -> float:
        got = {
            r.vec_id
            for r in ann_multiprobe(emb, probe, k, n_probes=n_probes)
            .select("vec_id")
            .collect()
        }
        return len(got & truth) / len(truth)

    r0, r2 = recall(0), recall(2)
    assert r2 >= r0, (r0, r2)
    # synthetic embeddings are near-uniform (no cluster structure), so
    # true neighbors scatter across buckets: probing 3/16 buckets (~19%
    # of the corpus) recovering >=30% of the exact top-k is the
    # above-chance bar; real clustered embeddings sit far higher
    assert r2 >= 0.3, f"multi-probe recall too low: {r2}"


def test_ivf_ann_candidate_budget_and_recall(spark):
    """IVF ANN (embedding_ann_ivf): probing 2 of 8 clusters must touch a
    strict subset of the corpus (the scale contract: candidates ~ 2n/K),
    and the exact re-ranked top-5 must overlap the brute-force top-5 —
    on near-uniform synthetic embeddings the above-chance bar is loose,
    but zero overlap would mean the clustering is broken."""
    from quantitative_database_and_visualization_platform_spark.pipeline.embeddings import (
        topk_cosine,
    )
    from quantitative_database_and_visualization_platform_spark.plans import QUERIES
    from quantitative_database_and_visualization_platform_spark.sources.catalog import load_table

    emb = load_table(spark, SF, "embeddings")
    n = emb.count()
    probe = emb.filter(F.col("vec_id") == 0)
    truth = {r.vec_id for r in topk_cosine(emb, probe, 5).select("vec_id").collect()}

    got_rows = QUERIES["embedding_ann_ivf"](spark, SF).collect()
    got = {r.vec_id for r in got_rows}
    assert len(got_rows) == 5
    # the probe vector itself lives in the probed cluster and is its own
    # nearest neighbor — it must always be recovered
    assert 0 in got
    assert len(got & truth) >= 1, (got, truth)
    # every returned row carries its cluster id; at most 2 distinct
    # clusters may appear (the probe budget)
    assert len({r.cluster for r in got_rows}) <= 2


def test_srp_planes_scale_with_corpus():
    """Fixed SRP planes ⇒ bucket size grows linearly with the corpus
    (Σ bucket² toward all-pairs); the sizing helper must hold the
    expected bucket ~constant by growing planes with log2(n)."""
    from quantitative_database_and_visualization_platform_spark.pipeline.embeddings import (
        planes_for_corpus,
    )

    for n in (10_000, 1_000_000, 100_000_000, 10_000_000_000):
        p = planes_for_corpus(n, target_bucket=256)
        expected_bucket = n / 2**p
        assert expected_bucket <= 256, (n, p, expected_bucket)
        assert expected_bucket > 64, "overshooting planes wastes recall"
    # 100 TB-scale corpus stays a cheap key
    assert planes_for_corpus(10_000_000_000, 256) == 26


def test_two_phase_quota_pick_matches_one_phase_window(spark):
    """The survivors-first two-phase pick must return BIT-IDENTICAL rows
    to the one-phase full-window rank, for quotas spanning prefilter-
    active and degenerate (quota >= group) regimes — and the prefilter
    must actually drop rows in the active regime."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from quantitative_database_and_visualization_platform_spark.pipeline.sampling import (
        _h52,
        two_phase_quota_pick,
    )
    from quantitative_database_and_visualization_platform_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "lang"
    )
    for quota in (5, 40, 10_000):
        w = Window.partitionBy("lang").orderBy(
            F.md5(F.col("doc_id").cast("string")), "doc_id"
        )
        want = sorted(
            (r["lang"], r["doc_id"])
            for r in docs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= quota)
            .collect()
        )
        got = sorted(
            (r["lang"], r["doc_id"])
            for r in two_phase_quota_pick(docs, "lang", "doc_id", quota).collect()
        )
        assert got == want, f"quota={quota}"
    # prefilter effectiveness: at quota=5 the survivor set must be far
    # smaller than the corpus (safety*quota per group, not group size)
    from quantitative_database_and_visualization_platform_spark.pipeline import sampling as sp

    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("__gc"))
    with_h = docs.withColumn("__h", sp._h52(F.col("doc_id"))).join(counts, "lang")
    frac = F.least(F.lit(1.0), F.lit(2.0) * F.lit(5) / F.col("__gc"))
    surv = with_h.filter(
        F.col("__h") < F.ceil(frac * F.lit(float(sp.HASH_SPACE))).cast("long")
    ).count()
    assert surv < docs.count() * 0.2, surv


def test_two_phase_quota_pick_fallback_keeps_duplicate_keys(spark):
    """safety=0 zeroes the hash threshold, so EVERY group takes the
    exact-rank fallback — with duplicate (group, key) rows the fallback
    must keep both copies, matching the one-phase window form (the old
    dropDuplicates fallback silently collapsed them; r6 ADVICE)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from quantitative_database_and_visualization_platform_spark.pipeline.sampling import (
        two_phase_quota_pick,
    )

    rows = [("g", i) for i in range(1, 9) for _ in range(2)]  # every key twice
    df = spark.createDataFrame(rows, ["lang", "doc_id"])
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    for quota in (3, 6, 100):
        want = sorted(
            (r["lang"], r["doc_id"])
            for r in df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= quota)
            .collect()
        )
        got = sorted(
            (r["lang"], r["doc_id"])
            for r in two_phase_quota_pick(df, "lang", "doc_id", quota, safety=0.0).collect()
        )
        assert got == want, f"quota={quota}"
        if quota >= 6:  # even quota cut: every kept key keeps BOTH copies
            from collections import Counter

            assert all(c == 2 for c in Counter(got).values()), Counter(got)


def test_pair_blocking_shrinks_candidate_domain(spark):
    """Executable form of the SCALING claim: the blocked candidate scan
    visits a strict subset of the all-pairs domain, smaller by ~the
    block count (universe/32 blocks at sf0.01 -> ~5x fewer pairs), and
    every blocked pair shares a block."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from quantitative_database_and_visualization_platform_spark.factors.panel import daily_bars
    from quantitative_database_and_visualization_platform_spark.plans.backtest_queries import (
        _cand_pairs,
        _pair_blocks,
    )
    from quantitative_database_and_visualization_platform_spark.session import release_managed

    sf = "/root/testdata/sf0.01"
    try:
        bars = daily_bars(spark, sf)
        w = Window.partitionBy("code").orderBy("d")
        rets = bars.select(
            "code", "d", (F.col("close") / F.lag("close").over(w) - 1).alias("ret")
        ).filter(F.col("ret").isNotNull())
        nb = _pair_blocks(spark, sf)
        assert nb >= 4  # the blocking must actually bite at this sf

        def domain(n_blocks):
            # distinct candidate PAIRS the scan generates (pre-corr)
            a = rets.select(F.col("code").alias("ca"), "d")
            b = rets.select(F.col("code").alias("cb"), F.col("d").alias("d_b"))
            cond = (F.col("d") == F.col("d_b")) & (F.col("ca") < F.col("cb"))
            if n_blocks is not None:
                cond = cond & (F.col("ca") % n_blocks == F.col("cb") % n_blocks)
            return (
                a.join(b, cond).select("ca", "cb").distinct().count()
            )

        full, blocked = domain(None), domain(nb)
        assert 0 < blocked < full
        # expected shrink ~ nb; allow slack for uneven code-mod buckets
        assert blocked <= full / (nb / 2), (full, blocked, nb)
        # and the registered blocked query emits only within-block pairs
        out = _cand_pairs(rets, nb, limit=20).collect()
        assert out and all(r["ca"] % nb == r["cb"] % nb for r in out)
    finally:
        release_managed()
