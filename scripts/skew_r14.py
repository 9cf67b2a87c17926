"""Round-14 perf validation harness (see SKEWCHECK_r14.md).

Two tools in one file:

1. ``profile``: run one 300-page crawl-stream micro-batch with every
   sink write and localCheckpoint timed — the decomposition that
   located the r13 regression in per-job Catalyst re-analysis rather
   than data volume.
2. ``ab``: interleaved A/B of the current crawl_stream module against
   a pinned git revision (default: the pre-restructure r14 commit),
   alternating the module file + importlib.reload per repetition in
   ONE session, min of 4 — the only methodology that survives this
   host's load noise (sequential comparisons swing 2x on identical
   code).

Usage:
    python scripts/skew_r14.py profile
    python scripts/skew_r14.py ab [old_git_rev]
"""
import importlib
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

MODULE = "da_transform_judgments_pipeline_spark/streaming/crawl_stream.py"


def session():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def profile():
    from pyspark.sql.classic.dataframe import DataFrame

    from da_transform_judgments_pipeline_spark.sources import frontier
    from da_transform_judgments_pipeline_spark.sources.warc import (
        build_warc_gz,
    )
    from da_transform_judgments_pipeline_spark.streaming import (
        crawl_stream as cs,
    )

    spark = session()
    times = []
    orig_lc = DataFrame.localCheckpoint

    def timed_lc(self, eager=True):
        t0 = time.perf_counter()
        r = orig_lc(self, eager)
        times.append(("localCheckpoint", time.perf_counter() - t0))
        return r

    DataFrame.localCheckpoint = timed_lc
    orig_w = cs._write_batch_partition

    def timed_w(df, path, key):
        t0 = time.perf_counter()
        orig_w(df, path, key)
        times.append((os.path.basename(path), time.perf_counter() - t0))

    cs._write_batch_partition = timed_w

    tmp = tempfile.mkdtemp(prefix="skew_r14_")
    os.makedirs(f"{tmp}/warcs")
    os.makedirs(f"{tmp}/manifests")
    pages = []
    for d in range(300):
        k = d % 4
        html = (
            f'<html><body><p>case {d} body</p><a href="/linked/{d}">x'
            f'</a><a href="/page/{d}">self</a><a href="/common">c</a>'
            "</body></html>"
        ).encode()
        pages.append({
            "url": f"https://h{k}.example/page/{d}",
            "date": "2021-03-04T05:06:07Z", "payload": html,
        })
    with open(f"{tmp}/warcs/pages.warc.gz", "wb") as f:
        f.write(build_warc_gz(pages))
    with open(f"{tmp}/manifests/w.jsonl", "w") as f:
        f.write(json.dumps(
            {"file_id": 1, "path": f"{tmp}/warcs/pages.warc.gz"}
        ) + "\n")
    frontier.build_url_index(
        spark.createDataFrame(
            [("https://seed.example/",)], "url string"
        ),
        "skew_r14_frontier", buckets=4, path=f"{tmp}/fidx",
    )
    t0 = time.perf_counter()
    q = cs.run_crawl_stream(
        spark, f"{tmp}/manifests", "skew_r14_frontier", f"{tmp}/out",
        max_files_per_trigger=100000,
    )
    q.awaitTermination(300)
    total = time.perf_counter() - t0
    print(f"TOTAL stream: {total:.2f}s")
    for name, dt in times:
        print(f"  {name}: {dt:.2f}s")
    spark.sql("DROP TABLE IF EXISTS skew_r14_frontier")
    shutil.rmtree(tmp, ignore_errors=True)


def ab(old_rev):
    spark = session()
    import __spark_entry__ as e
    import da_transform_judgments_pipeline_spark.streaming.crawl_stream \
        as cs

    old_src = subprocess.check_output(
        ["git", "show", f"{old_rev}:{MODULE}"], cwd=REPO
    )
    new_src = open(MODULE, "rb").read()
    qs = e.queries()
    queries = ("s26_crawl_schedule_stream", "s27_crawl_link_graph")

    def set_variant(src):
        with open(MODULE, "wb") as f:
            f.write(src)
        importlib.reload(cs)

    def run(q):
        t0 = time.perf_counter()
        qs[q](spark, os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )).count()
        return time.perf_counter() - t0

    try:
        for src in (old_src, new_src):
            set_variant(src)
            qs[queries[0]](spark, "/root/testdata/sf0.001").count()
        res = {(v, q): [] for v in ("OLD", "NEW") for q in queries}
        for _ in range(4):
            for v, src in (("OLD", old_src), ("NEW", new_src)):
                set_variant(src)
                for q in queries:
                    res[(v, q)].append(run(q))
    finally:
        set_variant(new_src)  # always restore the working tree
    for (v, q), ts in sorted(res.items()):
        print(f"{v} {q}: min={min(ts):.2f} "
              f"runs={[round(t, 2) for t in ts]}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "profile"
    if mode == "profile":
        profile()
    elif mode == "ab":
        ab(sys.argv[2] if len(sys.argv) > 2 else "cb4fd51")
    else:
        raise SystemExit(f"unknown mode {mode!r}")
