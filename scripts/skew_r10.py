"""Round-10 skew / scale validation: the COMPOSED streaming crawl
lifecycle (verdict item: the pieces were measured in r9; this measures
the composition with index growth) — three waves of WARC files driven
through streaming/crawl_stream.run_crawl_stream (one checkpoint, one
growing frontier index, one growing processed ledger), then a frontier
compaction. Flat per-file wave cost = the per-batch decision does not
degrade as the index grows; planted corruption isolates per file; RSS
stays bounded.

Usage: python scripts/skew_r10.py [--quick]   (writes SKEWCHECK_r10.md)
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

from pyspark.sql import functions as F  # noqa: E402

from da_transform_judgments_pipeline_spark.session import get_spark  # noqa: E402
from da_transform_judgments_pipeline_spark.sources import frontier  # noqa: E402
from da_transform_judgments_pipeline_spark.sources.warc import (  # noqa: E402
    build_warc_gz,
)
from da_transform_judgments_pipeline_spark.streaming.crawl_stream import (  # noqa: E402
    run_crawl_stream,
)

QUICK = "--quick" in sys.argv
N_FILES = 2_000 if QUICK else 20_000
WAVES = 3
BAD_EVERY = 1000  # planted truncated file per thousand


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def build_files(root: str) -> list[list[dict]]:
    """N_FILES tiny .warc.gz files split into WAVES manifests. Each good
    file has 3 responses: two unique URLs and, for every 10th file, a
    re-crawl of a WAVE-1 URL (so later waves exercise the url_seen
    path against the grown index)."""
    os.makedirs(f"{root}/warcs")
    waves: list[list[dict]] = [[] for _ in range(WAVES)]
    per_wave = N_FILES // WAVES
    for i in range(N_FILES):
        path = f"{root}/warcs/f{i}.warc.gz"
        wave = min(i // per_wave, WAVES - 1)
        if i % BAD_EVERY == 7:
            with open(path, "wb") as f:
                f.write(b"\x1f\x8b\x08\x00 truncated junk")
        else:
            resp = [
                {
                    "url": f"https://h{i % 97}.example/{i}/{r}",
                    "date": "2021-03-04T05:06:07Z",
                    "payload": (
                        f"<html><body><p>Crawl body {i} item {r} of the "
                        f"judgment corpus</p></body></html>"
                    ).encode(),
                }
                for r in range(2)
            ]
            if i % 10 == 3:  # re-crawl a wave-1 URL (always file 0's)
                resp.append({
                    "url": "https://h0.example/0/0",
                    "date": "2021-03-04T05:06:07Z",
                    "payload": b"<html><body><p>mirror</p></body></html>",
                })
            with open(path, "wb") as f:
                f.write(build_warc_gz(resp))
        waves[wave].append({"file_id": i, "path": path})
    return waves


def main() -> None:
    spark = get_spark(master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="skew_r10_")
    table = "skew_r10_frontier"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    results: dict = {
        "n_files": N_FILES, "waves": WAVES, "bad_every": BAD_EVERY,
    }
    try:
        t0 = time.time()
        waves = build_files(root)
        results["build_sec"] = round(time.time() - t0, 2)
        frontier.build_url_index(
            spark.createDataFrame(
                [("https://seed.example/",)], "url string"
            ),
            table, buckets=32, path=f"{root}/fidx",
        )
        os.makedirs(f"{root}/manifests")
        wave_stats = []
        for wi, wave in enumerate(waves):
            with open(f"{root}/manifests/wave{wi}.jsonl", "w") as f:
                f.write("\n".join(json.dumps(x) for x in wave) + "\n")
            t0 = time.time()
            q = run_crawl_stream(
                spark, f"{root}/manifests", table, f"{root}/out",
                max_files_per_trigger=64,
            )
            q.awaitTermination(3600)
            dt = time.time() - t0
            idx_rows = spark.table(table).count()
            wave_stats.append({
                "wave": wi,
                "files": len(wave),
                "sec": round(dt, 2),
                "ms_per_file": round(1000 * dt / len(wave), 3),
                "index_rows_after": idx_rows,
                "rss_mb": round(rss_mb(), 1),
            })
        results["wave_stats"] = wave_stats
        acc = spark.read.parquet(f"{root}/out/accepted")
        dup = spark.read.parquet(f"{root}/out/duplicates")
        err = spark.read.parquet(f"{root}/out/errors")
        n_bad = sum(1 for i in range(N_FILES) if i % BAD_EVERY == 7)
        results["accepted_rows"] = acc.count()
        results["accepted_distinct_canonicals"] = (
            acc.select("canonical").distinct().count()
        )
        results["duplicate_rows"] = dup.count()
        results["url_seen_rows"] = dup.filter(
            F.col("reason") == "url_seen"
        ).count()
        results["error_rows"] = err.count()
        results["expected_errors"] = n_bad
        # exactly-once audit at scale: no canonical accepted twice, the
        # ledger holds each path once, every planted error isolated
        led = spark.read.parquet(f"{root}/out/processed")
        results["ledger_rows"] = led.count()
        results["ledger_distinct"] = led.distinct().count()
        # frontier compaction: many per-wave appends → few files, same
        # decision results afterwards
        from da_transform_judgments_pipeline_spark.streaming.dedup_stream import (
            compact_index_table,
        )

        probe = spark.createDataFrame(
            [("https://h0.example/0/0",), ("https://new.example/x",)],
            "url string",
        )
        before = sorted(
            r["canonical"] for r in
            frontier.new_frontier_urls(probe, spark, table).collect()
        )
        t0 = time.time()
        comp = compact_index_table(spark, table)
        results["compaction"] = {
            "sec": round(time.time() - t0, 2), **comp
        }
        after = sorted(
            r["canonical"] for r in
            frontier.new_frontier_urls(probe, spark, table).collect()
        )
        results["compaction_decisions_identical"] = before == after
        first, last = wave_stats[0], wave_stats[-1]
        results["per_file_cost_flat"] = (
            last["ms_per_file"] <= 1.5 * first["ms_per_file"]
        )
        results["ok"] = (
            results["error_rows"] == n_bad
            and results["accepted_rows"]
            == results["accepted_distinct_canonicals"]
            and results["ledger_rows"] == results["ledger_distinct"]
            == N_FILES
            and results["compaction_decisions_identical"]
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(root, ignore_errors=True)

    md = (
        "# Skew / scale blow-up validation (round 10)\n\n"
        "The COMPOSED streaming crawl lifecycle on local[32]: "
        f"{N_FILES} .warc.gz files in {WAVES} waves through ONE "
        "run_crawl_stream checkpoint — WARC parse → html_text → "
        "language/quality → fingerprint → frontier anti-join → "
        "idempotent index append → T10 ledger — then a frontier "
        "compaction. Flat ms/file across waves = the per-batch decision "
        "does not degrade as the index grows; accepted==distinct "
        "canonicals and ledger uniqueness are the exactly-once audit "
        "at scale; planted truncated files isolate per file.\n\n"
        "```json\n" + json.dumps(results, indent=2) + "\n```\n"
    )
    with open("SKEWCHECK_r10.md", "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
