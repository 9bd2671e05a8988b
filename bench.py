"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line:

    {"metric": "suite_seconds", "value": <total>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

Each query is executed to completion with a noop sink (full computation,
no driver-side materialization cost), timed individually. A warmup query
runs first so JVM/codegen startup is not billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

from quantitative_database_and_visualization_platform_spark.plans import QUERIES
from quantitative_database_and_visualization_platform_spark.session import (
    get_spark,
    release_managed,
)


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.removeprefix("sf"))
    except ValueError:
        return -1.0


def _execute(df) -> None:
    # noop sink: full execution of the plan without collecting to driver
    df.write.format("noop").mode("overwrite").save()


# Shared session-materialized tables (bars / IVF / shingles, r13) are
# built from parquet inside the FIRST consumer's timed region, which made
# that consumer's bench number "its own cost + the shared build" and
# confounded round-over-round per-query diffs (r13 verdict item 2:
# acf_lag_profile absorbed the bars build, cluster_balanced_sample the
# IVF chain, bloom_decontamination the shingle leaves). A full-suite run
# now times each build as an explicit `_build:*` pseudo-query BEFORE the
# query loop, so consumer queries report their standalone cost. Additive
# only: no existing entry is removed or renamed, the same computation is
# still timed from the parquet inputs inside the same session, and the
# one-line JSON contract is unchanged. Subset runs (explicit argv) skip
# the pre-builds so a targeted probe still measures build+query like the
# old protocol (and like the driver's correctness gate does).
def _shared_builds() -> dict:
    from quantitative_database_and_visualization_platform_spark.factors.panel import (
        bars_table,
    )
    from quantitative_database_and_visualization_platform_spark.plans.pipeline_queries import (
        _ivf_chain,
        _shingles_table,
    )

    def build_shingles(spark, sf_dir):
        _shingles_table(spark, sf_dir, k=3, distinct=True)
        _shingles_table(spark, sf_dir, k=3, distinct=False)
        _shingles_table(spark, sf_dir, k=5, distinct=True)

    from quantitative_database_and_visualization_platform_spark.plans.pipeline_queries import (
        _ngram_pairs,
    )

    return {
        "_build:bars": lambda spark, sf_dir: bars_table(spark, sf_dir),
        "_build:ivf": lambda spark, sf_dir: _ivf_chain(spark, sf_dir),
        "_build:shingles": build_shingles,
        # the shared PPJoin pair table (prefix filter + jaccard verify):
        # cross_source_dup_matrix, its first alphabetical consumer, was
        # still absorbing this build (r14; same rationale as the three
        # entries above). The alpha cache build is deliberately NOT
        # itemized: alpha101_a's round-over-round comparability IS the
        # build (the r13 verdict's item-1 done-criterion is stated in
        # terms of it).
        "_build:ngram_pairs": lambda spark, sf_dir: _ngram_pairs(spark, sf_dir),
    }


try:
    _LOAD_START = round(os.getloadavg()[0], 2)
except OSError:
    _LOAD_START = -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("qdvp-bench")
    names = sys.argv[1:] or sorted(QUERIES)

    # warmup: cheap query to absorb JVM + codegen + parquet-footer startup
    _execute(QUERIES["global_market_stats"](spark, sf_dir))

    timings: dict[str, float] = {}
    if not sys.argv[1:]:  # full-suite run: itemize the shared-table builds
        for name, build in _shared_builds().items():
            t0 = time.perf_counter()
            try:
                build(spark, sf_dir)
                timings[name] = round(time.perf_counter() - t0, 3)
            except Exception as exc:  # noqa: BLE001 — keep the suite running
                print(
                    f"# bench error in {name}: {type(exc).__name__}: {exc}",
                    file=sys.stderr,
                )
                timings[name] = -1.0
    for name in names:
        t0 = time.perf_counter()
        try:
            _execute(QUERIES[name](spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — a broken query must not kill the bench
            print(f"# bench error in {name}: {type(exc).__name__}: {exc}", file=sys.stderr)
            timings[name] = -1.0
        finally:
            # drop per-query managed caches so a 55-query session does not
            # accumulate cached blocks (the shared alpha table is exempt)
            release_managed()

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    # quiet-bench protocol (r9): wall times swing +-30% with EXTERNAL
    # host load (the r8 "+13% suite drift" was the closing bench running
    # concurrently with a full pytest rehearsal). Record the 1-minute
    # load average at start and end so every recorded number carries its
    # own ambient-load context; treat load_1m_end > ~cpus/4 as "loaded"
    # and re-run before believing any drift.
    try:
        load_end = round(os.getloadavg()[0], 2)
    except OSError:
        load_end = -1.0
    # mechanical quiet verdict (r10): a run counts as quiet iff the
    # 1-minute load is under cpus/4 at BOTH ends, so round-over-round
    # comparisons can filter on a field instead of re-reading SCALING
    # prose. The end sample must measure AMBIENT load, not the bench's
    # own just-finished 32-thread tail (measured: a bench started at
    # load 0.07 ends at 9.2 purely from self-load, which would mislabel
    # every legitimate run) — so stop the session first and let the
    # 1-minute average decay for 45 s before sampling. An external
    # workload keeps the average high through the wait; the bench's own
    # contribution decays to ~half and stops accruing.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    spark.stop()
    time.sleep(45)
    try:
        load_ambient = round(os.getloadavg()[0], 2)
    except OSError:
        load_ambient = -1.0
    quiet = bool(
        0 <= _LOAD_START < cpus / 4 and 0 <= load_ambient < cpus / 4
    )
    record = {
        "metric": "suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(sf_dir),
        "load_1m_start": _LOAD_START,
        "load_1m_end": load_end,
        "load_1m_ambient": load_ambient,
        "quiet": quiet,
    }
    # Full per-query detail goes to a repo file; the stdout line must stay
    # UNDER ~2000 bytes because the round driver keeps only the last 2000
    # chars of stdout and parses the JSON line out of that tail — with
    # 100+ registered queries the full dict is ~3.5 KB and the head of the
    # line gets truncated away (BENCH_r04/r05: "parsed": null). Emit the
    # slowest queries first until the byte budget is spent and point at
    # the detail file for the rest.
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    try:
        with open(detail_path, "w") as fh:
            json.dump(record, fh)
            fh.write("\n")
    except OSError as exc:  # read-only checkout: keep the stdout line anyway
        print(f"# bench: could not write {detail_path}: {exc}", file=sys.stderr)

    head = {
        "metric": "suite_seconds",
        "value": total,
        "unit": "sec",
        "sf": _sf_of(sf_dir),
        "n_queries": len(timings),
        "detail": "BENCH_DETAIL.json",
        "load_1m_start": _LOAD_START,
        "load_1m_end": load_end,
        "load_1m_ambient": load_ambient,
        "quiet": quiet,
    }
    budget = 1800 - len(json.dumps({**head, "queries": {}},
                                   separators=(",", ":")))
    shown: dict[str, float] = {}
    used = 0
    for name in sorted(timings, key=lambda n: -timings[n]):
        cost = len(name) + len(f"{timings[name]}") + 6
        if used + cost > budget:
            break
        shown[name] = timings[name]
        used += cost
    print(
        json.dumps({**head, "queries": shown}, separators=(",", ":")),
        flush=True,
    )


if __name__ == "__main__":
    main()
