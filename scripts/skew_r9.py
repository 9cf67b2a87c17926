"""Round-9 skew / scale blow-up validation: the new corpus operators
(PDF parse, WARC intake, GIF decode, n-gram repetition suite) at ×N
synthetic scale with planted corruption, measuring per-row cost at two
scales (flat cost = the operator has no super-linear term) and error
isolation under report mode.

Usage: python scripts/skew_r9.py [--quick]   (writes SKEWCHECK_r09.md)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

from pyspark.sql import functions as F  # noqa: E402

from da_transform_judgments_pipeline_spark.session import get_spark  # noqa: E402

QUICK = "--quick" in sys.argv
SCALE = 4 if QUICK else 1


def timed(fn):
    best = None
    for _ in range(2):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def ids(spark, n):
    return spark.range(n).select(
        F.col("id").alias("doc_id")
    ).repartition(spark.sparkContext.defaultParallelism)


def pdf_section(spark, results):
    from da_transform_judgments_pipeline_spark.plans.editorial import (
        parse_pdfs,
    )

    n_small, n_big = 10_000 // SCALE, 100_000 // SCALE
    bad_every = 1000

    def corpus(n):
        def make(batches):
            import pandas as pd

            from da_transform_judgments_pipeline_spark.plans.pdf_parser import (
                build_pdf,
            )

            for pdf in batches:
                blobs = []
                for did in pdf["doc_id"]:
                    d = int(did)
                    if d % bad_every == 7:
                        blobs.append(bytearray(b"%PDF-1.4 truncated"))
                        continue
                    paras = [
                        f"Case {d} heading",
                        f"[{2000 + d % 30}] EWHC {d % 500 + 1}",
                    ] + [f"Body paragraph {j} of {d}." for j in range(d % 7)]
                    blobs.append(bytearray(build_pdf(
                        paras, title=f"Case {d}",
                        compress=(d % 2 == 0), tj_arrays=(d % 3 == 0),
                    )))
                yield pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "content": blobs}
                )

        return ids(spark, n).mapInPandas(
            make, "doc_id long, content binary"
        )

    def run(n):
        out = parse_pdfs(corpus(n))
        agg = out.agg(
            F.count("*").alias("rows"),
            F.sum(F.col("error").isNotNull().cast("int")).alias("errs"),
            F.sum("n_pages").alias("pages"),
        ).collect()[0]
        return agg

    sec_small, a_small = timed(lambda: run(n_small))
    sec_big, a_big = timed(lambda: run(n_big))
    results["m15_pdf_corpus"] = {
        "docs_small": n_small,
        "docs_big": n_big,
        "error_rows_big": int(a_big["errs"]),
        "expected_errors_big": n_big // bad_every,
        "pages_parsed_big": int(a_big["pages"]),
        "sec_small": round(sec_small, 2),
        "sec_big": round(sec_big, 2),
        "ms_per_doc_small": round(1000 * sec_small / n_small, 3),
        "ms_per_doc_big": round(1000 * sec_big / n_big, 3),
        "ok": bool(
            a_big["errs"] == n_big // bad_every
            and a_big["rows"] == n_big
            # flat per-doc cost: the big corpus may not cost more than
            # 2x per doc (fixed overheads make SMALL look worse, not big)
            and sec_big / n_big <= 2 * sec_small / n_small
        ),
    }


def warc_section(spark, results):
    from da_transform_judgments_pipeline_spark.sources.warc import (
        warc_records,
    )

    n_small, n_big = 2_000 // SCALE, 20_000 // SCALE
    recs_per_file = 5
    bad_every = 500

    def corpus(n):
        def make(batches):
            import pandas as pd

            from da_transform_judgments_pipeline_spark.sources.warc import (
                build_warc_gz,
            )

            for pdf in batches:
                blobs = []
                for fid in pdf["file_id"]:
                    d = int(fid)
                    body = (
                        "<html><body>" + "word " * (50 + d % 50)
                        + "</body></html>"
                    ).encode()
                    blob = build_warc_gz([
                        {
                            "url": f"https://crawl.example/{d}/{r}",
                            "date": "2021-03-04T05:06:07Z",
                            "payload": body,
                        }
                        for r in range(recs_per_file)
                    ])
                    if d % bad_every == 3:
                        blob = blob[:-9]  # truncate the final member
                    blobs.append(bytearray(blob))
                yield pd.DataFrame(
                    {"file_id": pdf["file_id"], "content": blobs}
                )

        return ids(spark, n).selectExpr("doc_id as file_id").mapInPandas(
            make, "file_id long, content binary"
        )

    def run(n):
        out = warc_records(corpus(n))
        return out.agg(
            F.count("*").alias("rows"),
            F.sum(F.col("error").isNotNull().cast("int")).alias("errs"),
            F.sum(F.col("digest_ok").cast("int")).alias("digests"),
        ).collect()[0]

    sec_small, a_small = timed(lambda: run(n_small))
    sec_big, a_big = timed(lambda: run(n_big))
    n_bad = len([d for d in range(n_big) if d % bad_every == 3])
    good = n_big - n_bad
    results["m16_warc_corpus"] = {
        "files_small": n_small,
        "files_big": n_big,
        "records_per_file": recs_per_file + 1,
        "error_rows_big": int(a_big["errs"]),
        "expected_errors_big": n_bad,
        "digest_verified_big": int(a_big["digests"]),
        "expected_digests_big": good * recs_per_file,
        "sec_small": round(sec_small, 2),
        "sec_big": round(sec_big, 2),
        "ms_per_file_small": round(1000 * sec_small / n_small, 3),
        "ms_per_file_big": round(1000 * sec_big / n_big, 3),
        "ok": bool(
            a_big["errs"] == n_bad
            and a_big["digests"] == good * recs_per_file
            and sec_big / n_big <= 2 * sec_small / n_small
        ),
    }


def gif_section(spark, results):
    from da_transform_judgments_pipeline_spark.operators import multimodal

    n_small, n_big = 10_000 // SCALE, 100_000 // SCALE

    def corpus(n):
        def make(batches):
            import numpy as np
            import pandas as pd

            from da_transform_judgments_pipeline_spark.operators.imagecodec import (
                encode_gif,
            )

            for pdf in batches:
                blobs = []
                for did in pdf["media_id"]:
                    d = int(did)
                    arr = np.empty((16, 16, 3), np.uint8)
                    arr[:8] = (d % 256, (d * 7) % 256, (d * 13) % 256)
                    arr[8:] = ((d * 3) % 256, (d * 5) % 256, (d * 11) % 256)
                    blobs.append(bytearray(
                        encode_gif(arr, interlace=(d % 2 == 0))
                    ))
                yield pd.DataFrame(
                    {"media_id": pdf["media_id"], "content": blobs}
                )

        return ids(spark, n).selectExpr("doc_id as media_id").mapInPandas(
            make, "media_id long, content binary"
        )

    def run(n):
        out = multimodal.extract_features(
            corpus(n), dim=10, real_decode=True, on_error="report"
        )
        return out.agg(
            F.count("*").alias("rows"),
            F.sum(F.col("error").isNotNull().cast("int")).alias("errs"),
        ).collect()[0]

    sec_small, a_small = timed(lambda: run(n_small))
    sec_big, a_big = timed(lambda: run(n_big))
    results["m17_gif_corpus"] = {
        "images_small": n_small,
        "images_big": n_big,
        "error_rows_big": int(a_big["errs"]),
        "sec_small": round(sec_small, 2),
        "sec_big": round(sec_big, 2),
        "ms_per_image_small": round(1000 * sec_small / n_small, 3),
        "ms_per_image_big": round(1000 * sec_big / n_big, 3),
        "ok": bool(
            a_big["errs"] == 0
            and sec_big / n_big <= 2 * sec_small / n_small
        ),
    }


def x28_section(spark, results):
    """Repetition suite on a dup-heavy long-doc corpus: per-doc cost is
    quadratic-free (sorted-array RLE is m log m in DOC length, not
    corpus size); the blow-up axis that matters is document length."""
    from da_transform_judgments_pipeline_spark.operators.text import (
        ngram_repetition_suite,
    )

    n_docs = 50_000 // SCALE

    def corpus(tokens_per_doc):
        boiler = " ".join(
            "tok%d" % (i % 37) for i in range(tokens_per_doc)
        )
        return ids(spark, n_docs).withColumn(
            "text",
            F.concat(F.lit(boiler + " tail"), F.col("doc_id").cast("string")),
        )

    def run(tp):
        out = ngram_repetition_suite(corpus(tp))
        return out.agg(
            F.count("*").alias("rows"),
            F.round(F.avg("dup5_char_frac"), 4).alias("avg_dup5"),
        ).collect()[0]

    sec_200, a200 = timed(lambda: run(200))
    sec_400, a400 = timed(lambda: run(400))
    results["x28_dup_heavy"] = {
        "docs": n_docs,
        "tokens_per_doc": [200, 400],
        "sec": {"200": round(sec_200, 2), "400": round(sec_400, 2)},
        "avg_dup5_at_400": float(a400["avg_dup5"]),
        # doubling doc length may at most ~2.4x the time (m log m)
        "growth_2x_len": round(sec_400 / sec_200, 2),
        "ok": bool(a400["rows"] == n_docs and sec_400 / sec_200 <= 3.0),
    }


def frontier_section(spark, results):
    """Two-wave frontier at ×N: decision time vs INDEX size must stay
    flat (the bucketed anti-join touches only the batch's buckets), and
    wave-2 must classify wave-1's appends as seen."""
    import shutil
    import tempfile

    from da_transform_judgments_pipeline_spark.sources import frontier

    n_index, n_batch = 1_000_000 // SCALE, 50_000 // SCALE
    tmp = tempfile.mkdtemp(prefix="frontier_skew_")
    try:
        for size_tag, n_idx in (("small", n_index // 10), ("big", n_index)):
            table = f"frontier_skew_{size_tag}"
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            corpus = spark.range(n_idx).selectExpr(
                "concat('https://h.example/', id) AS url"
            )
            frontier.build_url_index(
                corpus, table, buckets=32,
                path=os.path.join(tmp, size_tag),
            )
            # half the batch re-discovers indexed pages via messy
            # spellings, half is genuinely new
            batch = spark.range(n_batch).selectExpr(
                "concat('HTTPS://H.example:443/x/../',"
                " CASE WHEN id % 2 = 0 THEN id"
                f" ELSE id + {n_idx} END, '#f', id) AS url"
            )

            def run():
                return frontier.new_frontier_urls(
                    batch, spark, table
                ).count()

            sec, new_count = timed(run)
            results[f"s22_frontier_{size_tag}"] = {
                "index_urls": n_idx,
                "batch_urls": n_batch,
                "new_found": int(new_count),
                "expected_new": n_batch - n_batch // 2,
                "sec": round(sec, 2),
                "ok": bool(new_count == n_batch - n_batch // 2),
            }
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        a = results["s22_frontier_small"]
        b = results["s22_frontier_big"]
        # 10x the index may not slow the same batch decision by >2x
        b["growth_10x_index"] = round(b["sec"] / max(a["sec"], 1e-9), 2)
        b["ok"] = bool(b["ok"] and b["sec"] <= 2 * a["sec"] + 0.5)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


SECTIONS = {
    "pdf": lambda s, r: pdf_section(s, r),
    "warc": lambda s, r: warc_section(s, r),
    "gif": lambda s, r: gif_section(s, r),
    "x28": lambda s, r: x28_section(s, r),
    "frontier": lambda s, r: frontier_section(s, r),
}


def main():
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    results = {}
    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
    chosen = only or ["pdf", "warc", "gif", "x28", "frontier"]
    for name in chosen:
        SECTIONS[name](spark, results)
    out_path = os.path.join(REPO, "SKEWCHECK_r09.md")
    if only and os.path.exists(out_path):
        # partial rerun: merge into the existing sections, don't clobber
        prev = open(out_path).read()
        i, j = prev.find("```json\n"), prev.rfind("\n```")
        if i >= 0 and j > i:
            merged = json.loads(prev[i + 8:j])
            merged.update(results)
            results = merged
    body = json.dumps(results, indent=2)
    factor = "quick" if QUICK else "full"
    with open(out_path, "w") as f:
        f.write(
            "# Skew / scale blow-up validation (round 9)\n\n"
            f"Executed on local[32], {factor} scale, min of 2 runs, via "
            "scripts/skew_r9.py.\n\n```json\n" + body + "\n```\n"
        )
    print(body)
    print("ALL OK" if all(v["ok"] for v in results.values()) else "FAILURES")


if __name__ == "__main__":
    main()
