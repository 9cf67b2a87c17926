"""Round-12 skew / scale validation: the prioritizer half of the crawl
loop as LIBRARY calls — crawl_wave_ranks (warm-started PageRank over
the stream's out/links sink) feeding run_crawl_stream(ranks=...) so
out/discovered carries (via, priority). Measures, on the r11 graded-hub
graph shape:

- WARM-START VALUE at equal cost: per wave, ranks are computed twice at
  a fixed iteration budget — cold (from uniform) and warm (from the
  previous wave's ranks) — and the final L1 residual is compared. A
  warm start on a grown graph should sit much closer to the fixed point
  for the same spend (equivalently: fewer iterations to a target tol,
  measured once on the final wave).
- PRIORITY PLUMBING at scale: waves 2+ run with ranks supplied; the
  discovered queue's priority column must be populated (nonzero for
  vias that were in the previous wave's graph — which is most of them,
  since this wave's pages were last wave's link targets) and must
  equal the supplied rank of the via.
- The r11 invariants still hold under the added work: flat ms/page as
  the index grows, planted hub order surfaced and stable.

Usage: python scripts/skew_r12.py [--quick]   (writes SKEWCHECK_r12.md)
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
    crawl_wave_ranks,
    run_crawl_stream,
)

QUICK = "--quick" in sys.argv
N_PAGES = 6_000 if QUICK else 100_000
PER_FILE = 50
WAVES = 3
HUBS = 50
TOPK = 20
BUDGET_ITERS = 8     # equal-cost residual comparison
FINAL_TOL = 1e-3     # iterations-to-tol comparison, final wave only
MAX_ITERS = 60

_TRI = [h for h in range(HUBS) for _ in range(HUBS - h)]


def hub_for(i: int) -> int:
    return _TRI[i % len(_TRI)]


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def page_url(i: int) -> str:
    return f"https://h{i % 97}.example/p/{i}"


def build_files(root: str) -> list[list[dict]]:
    """The r11 corpus shape: graded 50-hub spectrum (hub h receives
    ∝ (HUBS - h) links, so the planted order is recoverable), hubs
    dangling, one pseudo-random cross link per page."""
    os.makedirs(f"{root}/warcs")
    n_files = (N_PAGES + PER_FILE - 1) // PER_FILE
    per_wave = n_files // WAVES
    waves: list[list[dict]] = [[] for _ in range(WAVES)]
    for fi in range(n_files):
        recs = []
        for r in range(PER_FILE):
            i = fi * PER_FILE + r
            if i >= N_PAGES:
                break
            if i < HUBS:
                body = f"<html><body><p>Hub page {i}</p></body></html>"
            else:
                hub = page_url(hub_for(i - HUBS))
                cross = page_url((i * 7 + 13) % N_PAGES)
                body = (
                    f"<html><body><p>Crawl page {i} of the ranked "
                    f'corpus</p><a href="{hub}">hub</a> '
                    f'<a href="{cross}">next</a></body></html>'
                )
            recs.append({
                "url": page_url(i),
                "date": "2021-03-04T05:06:07Z",
                "payload": body.encode(),
            })
        path = f"{root}/warcs/f{fi}.warc.gz"
        with open(path, "wb") as f:
            f.write(build_warc_gz(recs))
        wave = min(fi // per_wave, WAVES - 1)
        waves[wave].append({"file_id": fi, "path": path})
    return waves


def main() -> None:
    spark = get_spark(master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="skew_r12_")
    table = "skew_r12_frontier"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    results: dict = {
        "n_pages": N_PAGES, "per_file": PER_FILE, "waves": WAVES,
        "hubs": HUBS, "topk": TOPK, "budget_iters": BUDGET_ITERS,
        "final_tol": FINAL_TOL,
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
        prev_ranks = None
        prev_top: set | None = None
        for wi, wave in enumerate(waves):
            with open(f"{root}/manifests/wave{wi}.jsonl", "w") as f:
                f.write("\n".join(json.dumps(x) for x in wave) + "\n")
            pages = len(wave) * PER_FILE
            # priority column from wave 1 on (wave 0 has no ranks yet;
            # an EMPTY frame keeps the discovered schema uniform)
            ranks_in = prev_ranks if prev_ranks is not None else (
                spark.createDataFrame([], "node string, rank double")
            )
            t0 = time.time()
            q = run_crawl_stream(
                spark, f"{root}/manifests", table, f"{root}/out",
                max_files_per_trigger=64, ranks=ranks_in,
            )
            q.awaitTermination(3600)
            stream_sec = time.time() - t0

            # equal-cost comparison over the GROWN graph: tiny tol so
            # the budget is always exhausted and l1_delta is recorded
            st_cold: dict = {}
            t0 = time.time()
            cold = crawl_wave_ranks(
                spark, f"{root}/out", prev_ranks=None,
                n_iterations=BUDGET_ITERS, tol=1e-300, stats=st_cold,
            ).localCheckpoint(eager=True)
            cold_sec = time.time() - t0
            st_warm: dict = {}
            t0 = time.time()
            warm = crawl_wave_ranks(
                spark, f"{root}/out", prev_ranks=prev_ranks,
                n_iterations=BUDGET_ITERS, tol=1e-300, stats=st_warm,
            ).localCheckpoint(eager=True)
            warm_sec = time.time() - t0
            top = [
                r["node"]
                for r in warm.orderBy(F.desc("rank"), "node")
                .limit(TOPK).collect()
            ]
            hub_urls = {page_url(i) for i in range(HUBS)}
            stat = {
                "wave": wi,
                "pages": pages,
                "stream_sec": round(stream_sec, 2),
                "ms_per_page": round(1000 * stream_sec / pages, 3),
                "cold_residual": st_cold["l1_delta"],
                "warm_residual": st_warm["l1_delta"],
                "residual_ratio": (
                    round(st_cold["l1_delta"] / st_warm["l1_delta"], 1)
                    if wi and st_warm["l1_delta"] else None
                ),
                "cold_sec": round(cold_sec, 2),
                "warm_sec": round(warm_sec, 2),
                "top10_all_hubs": all(u in hub_urls for u in top[:10]),
                "top1_is_hub0": top[0] == page_url(0),
                "rss_mb": round(rss_mb(), 1),
            }
            if prev_top is not None:
                stat["top_overlap_prev"] = round(
                    len(set(top) & prev_top) / TOPK, 3
                )
            prev_top = set(top)
            prev_ranks = warm
            wave_stats.append(stat)
        results["wave_stats"] = wave_stats

        # iterations-to-tol, final grown graph: the headline number
        st_cold, st_warm = {}, {}
        cold_fp = crawl_wave_ranks(
            spark, f"{root}/out", prev_ranks=None,
            n_iterations=MAX_ITERS, tol=FINAL_TOL, stats=st_cold,
        ).localCheckpoint(eager=True)
        warm_fp = crawl_wave_ranks(
            spark, f"{root}/out", prev_ranks=prev_ranks,
            n_iterations=MAX_ITERS, tol=FINAL_TOL, stats=st_warm,
        ).localCheckpoint(eager=True)
        results["final_cold_iters"] = st_cold["iterations"]
        results["final_warm_iters"] = st_warm["iterations"]
        agree = cold_fp.alias("c").join(
            warm_fp.alias("w"), "node"
        ).agg(
            F.max(F.abs(F.col("c.rank") - F.col("w.rank"))).alias("d")
        ).collect()[0]["d"]
        results["final_fixed_point_max_diff"] = float(agree)

        # priority plumbing: waves 1-2 discovered rows carry priority
        # == the supplied via rank; the nonzero fraction is high
        # because this wave's pages were last wave's link targets
        # the nonzero fraction tracks the FIXTURE's geometry, not the
        # production shape: this harness is manifest-driven (pages
        # arrive whether or not discovered), and only ~1/3 of a wave's
        # pages were cross-linked by earlier waves, so ~1/3 of vias
        # carry rank. A queue-driven crawl fetches BECAUSE discovered,
        # so its vias are previously-seen by construction (s29 pins
        # that case exactly); here we assert the plumbing populates
        # the fixture's expected share.
        disc = spark.read.parquet(f"{root}/out/discovered")
        later = disc.filter(~F.col("batch_key").endswith("-0"))
        n_later = later.count()
        nz = later.filter(F.col("priority") > 0).count()
        results["discovered_rows"] = disc.count()
        results["prioritized_rows"] = n_later
        results["priority_nonzero_frac"] = round(nz / n_later, 3)
        acc = spark.read.parquet(f"{root}/out/accepted")
        results["accepted_rows"] = acc.count()
        first, last = wave_stats[0], wave_stats[-1]
        results["per_page_cost_flat"] = (
            last["ms_per_page"] <= 1.5 * first["ms_per_page"]
        )
        results["ok"] = (
            results["accepted_rows"] == N_PAGES
            and all(s["top10_all_hubs"] for s in wave_stats)
            and all(s["top1_is_hub0"] for s in wave_stats)
            and all(
                s["warm_residual"] < s["cold_residual"]
                for s in wave_stats[1:]
            )
            and results["final_warm_iters"] < results["final_cold_iters"]
            and results["final_fixed_point_max_diff"] < 10 * FINAL_TOL
            and results["priority_nonzero_frac"] > 0.2
            and results["per_page_cost_flat"]
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(root, ignore_errors=True)
    md = (
        "# Skew / scale blow-up validation (round 12)\n\n"
        "The prioritizer half of the crawl loop as LIBRARY calls on "
        f"local[32]: {N_PAGES} pages ({PER_FILE}/WARC) in {WAVES} waves "
        "through one run_crawl_stream checkpoint; after each wave "
        "crawl_wave_ranks re-ranks the grown out/links graph twice at "
        f"an equal {BUDGET_ITERS}-iteration budget — cold (uniform) vs "
        "warm (previous wave's ranks, L1-normalized) — comparing the "
        "final L1 residual; the next wave runs with ranks supplied so "
        "out/discovered carries (via, priority). Headline: iterations-"
        f"to-tol {FINAL_TOL} on the final graph, cold vs warm, same "
        "fixed point. The r11 invariants (flat ms/page, planted graded "
        "hub order, top-set stability) must hold under the added "
        "work.\n\n"
        "```json\n" + json.dumps(results, indent=2) + "\n```\n"
    )
    with open(os.path.join(REPO, "SKEWCHECK_r12.md"), "w") as f:
        f.write(md)
    print(json.dumps(results))
    print("OK" if results.get("ok") else "NOT OK")
    spark.stop()


if __name__ == "__main__":
    main()
