"""Time individual registry queries in isolation (the round-14
optimization loop's measuring stick): same session settings as
bench.py, min-of-N per query, noop-sink or count forcing.

Usage: python scripts/qtime.py [--runs N] [--noop] [--sf DIR] q1 [q2 ...]

Prints one line per query: name, min, all runs. Interleave A/B by
alternating module edits between invocations — or pass --runs high
enough that host noise shows up as spread.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    runs = 3
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i:i + 2]
    noop = "--noop" in args
    if noop:
        args.remove("--noop")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i:i + 2]
    names = args

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("qtime")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")  # bench parity (r14)
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    from da_transform_judgments_pipeline_spark.operators import dedup

    # warmup (bench parity)
    warm = "/root/testdata/sf0.001"
    for name in names:
        try:
            qs[name](spark, warm).count()
        except Exception:
            pass
        try:
            dedup.release_cached()
        except Exception:
            pass

    for name in names:
        times = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            times.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            try:
                dedup.release_cached()
            except Exception:
                pass
        splits = getattr(entrymod, "STREAM_SPLITS", {}).get(name)
        extra = f" splits={splits}" if splits else ""
        print(
            f"{name}: min={min(times):.3f} "
            f"runs={[round(t, 3) for t in times]}{extra}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
