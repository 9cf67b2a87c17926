"""Skew/scale validation for the WET/WAT derivations: 20k pages across
400 response WARCs (50 pages/archive) → wet_pack + wat_pack → re-parse
+ digest re-verification, with per-wave archive-count sweep.  Flat
ms/page across the sweep = derivation cost proportional to pages, the
applyInPandas group staying archive-sized.  Appends to SKEWCHECK_r11.md
with --write."""

import json
import resource
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from da_transform_judgments_pipeline_spark.operators import text  # noqa: E402
from da_transform_judgments_pipeline_spark.session import get_spark  # noqa: E402
from da_transform_judgments_pipeline_spark.sources.warc import (  # noqa: E402
    warc_records,
    wat_pack,
    wet_pack,
)


def main() -> None:
    spark = get_spark(
        app_name="skew-wet-wat", master="local[32]", shuffle_partitions=32
    )
    results = []
    for n_archives in (100, 200, 400):
        per_file = 50
        n_pages = n_archives * per_file
        t0 = time.time()

        def gen(it, per_file=per_file):
            import pandas as pd

            from da_transform_judgments_pipeline_spark.sources.warc import (
                build_warc_gz,
            )

            for pdf in it:
                blobs = []
                for fid in pdf["file_id"]:
                    fid = int(fid)
                    resp = [
                        {
                            "url": f"http://h{fid % 97}.example/{fid}/{r}",
                            "date": "2021-03-04T05:06:07Z",
                            "payload": (
                                f"<html><body><p>Doc {fid}/{r} "
                                + "filler text " * (r % 7 + 3)
                                + f'</p><a href="http://h{fid % 97}.example/l/{r}">x</a>'
                                "</body></html>"
                            ).encode(),
                        }
                        for r in range(per_file)
                    ]
                    blobs.append(bytearray(build_warc_gz(resp)))
                yield pd.DataFrame(
                    {"file_id": pdf["file_id"], "content": blobs}
                )

        files = (
            spark.range(n_archives)
            .withColumnRenamed("id", "file_id")
            .repartition(64)
            .mapInPandas(gen, "file_id long, content binary")
        )
        pages = (
            warc_records(files)
            .filter(F.col("warc_type") == "response")
            .withColumn(
                "text", text.html_text(F.col("payload").cast("string"))
            )
            .withColumn(
                "links", text.html_links(F.col("payload").cast("string"))
            )
        )
        wet = warc_records(wet_pack(pages)).filter(
            F.col("warc_type") == "conversion"
        )
        wat = warc_records(wat_pack(pages)).filter(
            F.col("warc_type") == "metadata"
        )
        row = wet.agg(
            F.count("*").alias("n"),
            F.sum(F.col("digest_ok").cast("long")).alias("ok"),
        ).collect()[0]
        row2 = wat.agg(
            F.count("*").alias("n"),
            F.sum(F.col("digest_ok").cast("long")).alias("ok"),
        ).collect()[0]
        dt = time.time() - t0
        assert row["n"] == n_pages == row["ok"], row
        assert row2["n"] == n_pages == row2["ok"], row2
        results.append(
            {
                "archives": n_archives,
                "pages": n_pages,
                "wet_rows": row["n"],
                "wat_rows": row2["n"],
                "digests_ok": row["ok"] + row2["ok"],
                "sec": round(dt, 2),
                "ms_per_page": round(dt * 1000 / n_pages, 3),
                "rss_mb": round(
                    resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024,
                    1,
                ),
            }
        )
        print(results[-1], flush=True)
    report = {
        "shape": "response WARC -> wet_pack+wat_pack -> re-parse, digests re-verified",
        "sweep": results,
    }
    print(json.dumps(report))
    if "--write" in sys.argv:
        with open("/root/repo/SKEWCHECK_r11.md", "a") as f:
            f.write(
                "\n## WET/WAT derivations — archive-count sweep x4\n\n"
                "Response WARCs (50 pages each) through BOTH derivations and"
                " back through the parser with every block digest"
                " re-verified; ms/page should stay flat as the corpus"
                " quadruples (per-archive groups, one shuffle each).\n\n"
                "```json\n" + json.dumps(report, indent=2) + "\n```\n"
            )
    spark.stop()


if __name__ == "__main__":
    main()
