"""Per-query job/stage decomposition probe (r14 item 4).

Runs the named registered queries in one warm UI-enabled session (bench
conditions otherwise) and prints, per query: wall seconds, number of
Spark jobs, number of stages, total task count, summed executor run time
— the metrics that expose micro-task storms and driver-side job storms
on bounded relations. Measurement-only tool.

Usage: PYTHONPATH=. python tools/query_stage_probe.py q1 q2 ... [--sf DIR]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

from pyspark.sql import SparkSession

from quantitative_database_and_visualization_platform_spark.plans import QUERIES
from quantitative_database_and_visualization_platform_spark.session import (
    cpu_count,
    release_managed,
)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    builder = SparkSession.builder.appName("query-stage-probe").master(
        f"local[{cpu_count()}]"
    )
    for k, v in [
        ("spark.sql.shuffle.partitions", str(max(cpu_count(), 8))),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16KB"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.ansi.enabled", "false"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.python.sql.dataFrameDebugging.enabled", "false"),
        ("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)),
        ("spark.driver.memory", "8g"),
        ("spark.ui.enabled", "true"),
    ]:
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    app = spark.sparkContext.applicationId
    base = f"http://localhost:4040/api/v1/applications/{app}"

    QUERIES["global_market_stats"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    def stages():
        return json.loads(
            urllib.request.urlopen(f"{base}/stages?status=complete").read()
        )

    def jobs():
        return json.loads(urllib.request.urlopen(f"{base}/jobs").read())

    for name in args:
        pre_s = {s["stageId"] for s in stages()}
        pre_j = {j["jobId"] for j in jobs()}
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        release_managed()
        new_s = [s for s in stages() if s["stageId"] not in pre_s]
        new_j = [j for j in jobs() if j["jobId"] not in pre_j]
        ntasks = sum(s["numCompleteTasks"] for s in new_s)
        runtime = sum(s["executorRunTime"] for s in new_s) / 1000
        biggest = sorted(new_s, key=lambda s: -s["executorRunTime"])[:3]
        print(
            f"{name}: wall={wall:.2f}s jobs={len(new_j)} stages={len(new_s)} "
            f"tasks={ntasks} tasktime={runtime:.1f}s "
            f"top_stages={[(s['numCompleteTasks'], round(s['executorRunTime']/1000,1)) for s in biggest]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
