"""Checksum-manifest scans (SURVEY.md §1.3, §2.1 S11/S12).

A BagIt sha256 manifest is fixed-width text: chars [0:64] = hex checksum,
chars [64:].strip() = file path (reference: s3_lib/s3_lib/checksum_lib.py:
23-79). The Spark form is a text scan + substring projection — no UDFs, fully
codegen'd, parallel across manifest files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import basename

CHECKSUM_WIDTH = 64


def _project(line: Column) -> list[Column]:
    checksum = F.lower(F.trim(line.substr(F.lit(1), F.lit(CHECKSUM_WIDTH))))
    file_ = F.trim(line.substr(F.lit(CHECKSUM_WIDTH + 1), F.length(line)))
    return [
        checksum.alias("checksum"),
        file_.alias("file"),
        basename(file_).alias("basename"),
    ]


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Scan manifest file(s) → (checksum, file, basename).

    Equivalent of checksum_lib.get_manifest_s3/get_manifest_url; blank lines
    dropped like the reference's line iteration.
    """
    lines = spark.read.text(path)
    return (
        lines.filter(F.length(F.trim(F.col("value"))) > 0)
        .select(*_project(F.col("value")))
    )


def parse_manifest_lines(df: DataFrame, line_col: str = "value") -> DataFrame:
    """Project already-loaded manifest lines (e.g. from an untarred member)."""
    return df.filter(F.length(F.trim(F.col(line_col))) > 0).select(
        *_project(F.col(line_col))
    )


def manifest_from_lines(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Explode a whole-manifest text blob column into manifest rows.

    Used after untar: one row per archive member → one row per manifest entry.
    Non-manifest columns are preserved (e.g. the consignment reference) so the
    result joins back without a shuffle on small dims.
    """
    exploded = df.withColumn(
        "_line", F.explode(F.split(F.col(content_col).cast("string"), "\n"))
    )
    keep = [c for c in df.columns if c != content_col]
    return (
        exploded.filter(F.length(F.trim(F.col("_line"))) > 0)
        .select(*keep, *_project(F.col("_line")))
    )
