"""Round-13 scale validation: the new intake paths at volume.

Four measurements on local[32]:

1. **HTTP payload decoding overhead** — the same N-record corpus built
   in each wire regime (plain / Content-Encoding gzip / chunked /
   deflate+chunked), parsed by warc_records; µs/record per regime. The
   decode rides the existing per-record Python loop (Arrow-batched
   mapInPandas), so the claim to verify is BOUNDED LINEAR overhead —
   no blow-up vs the plain regime.
2. **Revisit resolution at crawl ratios** — a corpus where 20% of
   records are revisits, resolved by resolve_revisits (one record-id
   equi-join); wall time at two sizes for a linearity ratio, plus the
   no-cartesian plan assertion.
3. **pagerank iteration fusion** — jobs per iteration measured via
   statusTracker on a 100k-edge graph, 8 iterations: the r13 in-plan
   dangling broadcast should pin jobs/iteration near 1 (it was 2+
   with the driver-side scalar collect).
4. **Charset decode throughput** — decode_payloads vs the blind cast
   over the same rows; the ratio is the price of correct charsets on
   the intake projection (map-side, so it must be a constant factor,
   not a scale term).

Usage: python scripts/skew_r13.py  (prints one JSON line)
"""

import json
import os
import resource
import time

from pyspark.sql import functions as F

from da_transform_judgments_pipeline_spark.session import get_spark


def _rss_mb() -> float:
    return round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
    )


def bench_decode_regimes(spark, n_files=400, per_file=50):
    from da_transform_judgments_pipeline_spark.sources.warc import (
        warc_records,
    )

    regimes = {
        "plain": {},
        "gzip": {"content_encoding": "gzip"},
        "chunked": {"transfer_encoding": "chunked"},
        "deflate_chunked": {
            "content_encoding": "deflate",
            "transfer_encoding": "chunked",
        },
    }
    out = {}
    body = ("<html><body><p>" + "payload text " * 60 + "</p></body></html>")
    # untimed warmup: spin up the Arrow workers + JIT once so the first
    # timed regime (plain) isn't charged the cold start
    regimes = {"_warmup": {}, **regimes}
    for name, reg in regimes.items():
        files = spark.range(n_files).select(
            F.col("id").alias("file_id")
        ).repartition(32)

        def make(batches, reg=reg):
            import pandas as pd

            from da_transform_judgments_pipeline_spark.sources.warc import (
                build_warc_gz,
            )

            for pdf in batches:
                blobs = []
                for fid in pdf["file_id"]:
                    d = int(fid)
                    blobs.append(bytearray(build_warc_gz([
                        {
                            "url": f"https://h.example/{d}/{r}",
                            "date": "2021-03-04T05:06:07Z",
                            "payload": f"{d}/{r} {body}".encode(),
                            **reg,
                        }
                        for r in range(per_file)
                    ])))
                yield pd.DataFrame(
                    {"file_id": pdf["file_id"], "content": blobs}
                )

        corpus = files.mapInPandas(make, "file_id long, content binary")
        t0 = time.perf_counter()
        n = (
            warc_records(corpus)
            .filter(F.col("warc_type") == "response")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("payload_len")).alias("bytes"),
                F.min(F.col("digest_ok").cast("int")).alias("all_ok"),
            )
            .collect()[0]
        )
        sec = time.perf_counter() - t0
        assert n["n"] == n_files * per_file and n["all_ok"] == 1
        if name == "_warmup":
            continue
        out[name] = {
            "records": int(n["n"]),
            "sec": round(sec, 2),
            "us_per_record": round(sec / n["n"] * 1e6, 1),
        }
    base = out["plain"]["us_per_record"]
    for name in out:
        out[name]["vs_plain"] = round(
            out[name]["us_per_record"] / base, 2
        )
    return out


def bench_revisits(spark, n_files, per_file=50, revisit_every=5):
    from da_transform_judgments_pipeline_spark.sources.warc import (
        resolve_revisits,
        warc_records,
    )

    files = spark.range(n_files).select(
        F.col("id").alias("file_id")
    ).repartition(32)

    def make(batches):
        import pandas as pd

        from da_transform_judgments_pipeline_spark.sources.warc import (
            build_warc_gz,
        )

        for pdf in batches:
            blobs = []
            for fid in pdf["file_id"]:
                d = int(fid)
                recs = []
                for r in range(per_file):
                    rid = f"<urn:uuid:{d:08x}-0000-4000-8000-{r:012d}>"
                    if r % revisit_every == revisit_every - 1:
                        # revisit of the PREVIOUS record in this file
                        prev = (
                            f"<urn:uuid:{d:08x}-0000-4000-8000-"
                            f"{r - 1:012d}>"
                        )
                        recs.append({
                            "url": f"https://h.example/{d}/{r}",
                            "date": "2021-03-04T05:06:07Z",
                            "payload": f"page {d} {r - 1}".encode(),
                            "warc_type": "revisit",
                            "refers_to": prev,
                            "record_id": rid,
                        })
                    else:
                        recs.append({
                            "url": f"https://h.example/{d}/{r}",
                            "date": "2021-03-04T05:06:07Z",
                            "payload": f"page {d} {r}".encode(),
                            "record_id": rid,
                        })
                blobs.append(bytearray(build_warc_gz(recs)))
            yield pd.DataFrame(
                {"file_id": pdf["file_id"], "content": blobs}
            )

    corpus = files.mapInPandas(make, "file_id long, content binary")
    recs = warc_records(corpus).localCheckpoint(eager=True)
    resolved = resolve_revisits(recs, payload=False)
    plan = resolved._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    t0 = time.perf_counter()
    row = resolved.agg(
        F.count("*").alias("n"),
        F.sum(F.col("digest_match").cast("int")).alias("matched"),
        F.sum(F.col("resolved_uri").isNull().cast("int")).alias("dangling"),
    ).collect()[0]
    sec = time.perf_counter() - t0
    n_rev = n_files * (per_file // revisit_every)
    assert row["n"] == n_rev and row["dangling"] == 0, row
    return {
        "records": n_files * per_file,
        "revisits": int(row["n"]),
        "digest_matched": int(row["matched"]),
        "resolve_sec": round(sec, 2),
    }


def bench_pagerank_jobs(spark, n_nodes=20000, avg_deg=5, iters=8):
    from da_transform_judgments_pipeline_spark.operators.graph import (
        pagerank,
    )

    nodes = spark.range(n_nodes).select(F.col("id").alias("node"))
    edges = (
        spark.range(n_nodes * avg_deg)
        .select(
            (F.col("id") % n_nodes).alias("src"),
            ((F.col("id") * 2654435761) % n_nodes).alias("dst"),
        )
        .localCheckpoint(eager=True)
    )
    # AQE splits one action into a variable number of runtime jobs
    # (stage materialization), which would swamp the action count the
    # fusion claim is about — pin it off for the measurement window
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        j0 = int(spark.sparkContext._jsc.sc().dagScheduler().nextJobId())
        t0 = time.perf_counter()
        ranks = pagerank(nodes, edges, n_iterations=iters)
        total = ranks.agg(F.sum("rank")).collect()[0][0]
        sec = time.perf_counter() - t0
        j1 = int(spark.sparkContext._jsc.sc().dagScheduler().nextJobId())
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
    jobs = j1 - j0
    assert abs(total - 1.0) < 1e-9
    return {
        "nodes": n_nodes,
        "edges": n_nodes * avg_deg,
        "iterations": iters,
        # total = setup actions (count/persists/final agg) + the loop:
        # the r13 contract is ONE action (the eager checkpoint) per
        # iteration — formerly two (dangling scalar collect + checkpoint)
        "spark_jobs": int(jobs),
        "jobs_per_iteration": round((jobs - 4) / iters, 2),
        "sec": round(sec, 2),
    }


def bench_charset(spark, n_rows=2_000_000):
    from da_transform_judgments_pipeline_spark.operators import text

    d = F.col("id")
    rows = spark.range(n_rows).select(
        d.alias("doc_id"),
        F.when(d % 3 == 0, F.encode(F.concat(
            F.lit("Café "), d.cast("string")), "ISO-8859-1"))
        .when(d % 3 == 1, F.concat(
            F.lit(b"\xff\xfe"),
            F.encode(F.concat(F.lit("u "), d.cast("string")), "UTF-16LE"),
        ))
        .otherwise(F.encode(F.concat(
            F.lit("plain "), d.cast("string")), "UTF-8"))
        .alias("payload"),
        F.when(d % 3 == 0, F.lit("text/html; charset=iso-8859-1"))
        .otherwise(F.lit("text/html")).alias("mime"),
    ).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    base = rows.select(
        F.sum(F.length(F.col("payload").cast("string"))).alias("s")
    ).collect()[0]["s"]
    t1 = time.perf_counter()
    cs = text.decode_payloads(rows).select(
        F.sum(F.length("text")).alias("s")
    ).collect()[0]["s"]
    t2 = time.perf_counter()
    return {
        "rows": n_rows,
        "blind_cast_sec": round(t1 - t0, 2),
        "decode_payloads_sec": round(t2 - t1, 2),
        "us_per_row": round((t2 - t1) / n_rows * 1e6, 3),
        "overhead_x": round((t2 - t1) / max(t1 - t0, 1e-9), 2),
        "chars_blind": int(base),
        "chars_decoded": int(cs),
    }


def main():
    spark = (
        get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    )
    spark.sparkContext.setLogLevel("WARN")
    out = {
        "decode_regimes": bench_decode_regimes(spark),
        "revisits_small": bench_revisits(spark, n_files=200),
        "revisits_large": bench_revisits(spark, n_files=800),
        "pagerank_fusion": bench_pagerank_jobs(spark),
        "charset_decode": bench_charset(spark),
        "rss_mb": _rss_mb(),
    }
    r = out["revisits_large"]["resolve_sec"] / max(
        out["revisits_small"]["resolve_sec"], 1e-9
    )
    out["revisit_scale_ratio_4x_data"] = round(r, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
