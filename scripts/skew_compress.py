"""Skew/scale validation for the content-blob transport decoders
(operators/compress.decompress_blobs): 20k mixed-codec blobs through
one Arrow-batched decode stage, payload size swept x16, with a planted
corruption fraction that must isolate into error rows.

Flat-ish ms/MB across the size sweep = decode cost proportional to
BYTES, not row count or corpus size (no cross-row state, no shuffle);
the corrupt rows must never take down a task.  Appends a section to
SKEWCHECK_r11.md when run with --write.
"""

import json
import resource
import sys
import time

import pyarrow as pa

sys.path.insert(0, "/root/repo")

from da_transform_judgments_pipeline_spark.operators.compress import (  # noqa: E402
    decompress_blobs,
)
from da_transform_judgments_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(
        app_name="skew-compress", master="local[32]", shuffle_partitions=32
    )
    sc = spark.sparkContext

    unit = (
        b"The WARC record block contains the HTTP payload bytes exactly "
        b"as captured; politeness schedules derive per-host slots. "
    )
    results = []
    for scale in (1, 4, 16):
        n = 20000
        payload_reps = scale * 8
        t0 = time.time()

        def gen(it, reps=payload_reps):
            import pandas as pd

            for pdf in it:
                blobs, codecs = [], []
                for i in pdf["i"]:
                    i = int(i)
                    payload = unit * reps + str(i).encode()
                    codec = ("zstd", "lz4", "snappy", "gzip")[i % 4]
                    if i % 500 == 499:
                        blobs.append(b"\x28\xb5\x2f\xfdgarbage" + bytes(8))
                        codecs.append("zstd")
                        continue
                    if codec == "gzip":
                        import gzip

                        blobs.append(gzip.compress(payload))
                    else:
                        level = [1, 19][i % 2] if codec == "zstd" else None
                        c = (
                            pa.Codec(codec, compression_level=level)
                            if level
                            else pa.Codec(codec)
                        )
                        blobs.append(c.compress(payload, asbytes=True))
                    codecs.append(codec)
                yield pd.DataFrame(
                    {"i": pdf["i"], "codec": codecs, "content": blobs}
                )

        src = (
            spark.range(n)
            .withColumnRenamed("id", "i")
            .repartition(64)
            .mapInPandas(gen, "i long, codec string, content binary")
        )
        out = decompress_blobs(src, codec_col="codec")
        from pyspark.sql import functions as F

        agg = out.agg(
            F.count("*").alias("rows"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias(
                "errors"
            ),
            F.sum(F.length("decompressed")).alias("bytes_out"),
        ).collect()[0]
        dt = time.time() - t0
        mb = (agg["bytes_out"] or 0) / 1e6
        results.append(
            {
                "scale": scale,
                "rows": agg["rows"],
                "errors": agg["errors"],
                "mb_decoded": round(mb, 1),
                "sec": round(dt, 2),
                "ms_per_blob": round(dt * 1000 / n, 3),
                "ms_per_mb": round(dt * 1000 / mb, 2) if mb else None,
                "rss_mb": round(
                    resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024,
                    1,
                ),
            }
        )
        print(results[-1], flush=True)

    expected_errors = 20000 // 500
    ok = all(r["errors"] == expected_errors for r in results)
    report = {
        "n_blobs": 20000,
        "codecs": ["zstd l1/l19", "lz4", "snappy", "gzip"],
        "planted_corrupt_per_run": expected_errors,
        "all_errors_isolated": ok,
        "sweep": results,
    }
    print(json.dumps(report))
    if "--write" in sys.argv:
        with open("/root/repo/SKEWCHECK_r11.md", "a") as f:
            f.write(
                "\n## Transport decoders (decompress_blobs) — size sweep x16\n\n"
                "20k mixed-codec blobs (zstd l1/l19, LZ4 frame, snappy, gzip)"
                " per run, payload swept x1/x4/x16, 40 planted corrupt blobs"
                " per run that must isolate into error rows. ms/MB should"
                " stay near-flat (cost tracks bytes, not corpus size);"
                " errors must equal the planted count every run.\n\n"
                "```json\n" + json.dumps(report, indent=2) + "\n```\n"
            )
    spark.stop()


if __name__ == "__main__":
    main()
