"""BagIt metadata scans (SURVEY.md §1.4, §2.1 S7/S8).

bag-info.txt / bagit.txt are `key: value` lines split on the LEFT-MOST
separator (reference: s3_lib/s3_lib/object_lib.py:211-228); file-metadata.csv
is a header CSV accepted with whatever columns it has — that's how TDR v1.1
and v1.2 both load (reference: object_lib.py:231-241,
tre_bagit_transforms.py:3-47).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import FILE_METADATA_COLUMNS_V11


def read_bag_info(spark: SparkSession, path: str, sep: str = ":") -> DataFrame:
    """key:value text scan → (key, value); split on left-most separator,
    both sides trimmed (matches the reference's `str.split(sep, 1)` +
    strip)."""
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), sep, 2)
    return (
        lines.filter(F.length(F.trim(F.col("value"))) > 0)
        .select(
            F.trim(parts.getItem(0)).alias("key"),
            F.trim(F.coalesce(parts.getItem(1), F.lit(""))).alias("value"),
        )
    )


def bag_info_to_dict(df: DataFrame) -> dict[str, str]:
    """Collect a (key, value) DF to a driver dict — bag-info files are a
    dozen lines; this is config, not data."""
    return {r["key"]: r["value"] for r in df.collect()}


def read_file_metadata(spark: SparkSession, path: str) -> DataFrame:
    """file-metadata.csv scan (header CSV, all STRING).

    Accepts both TDR v1.1 and v1.2 header vocabularies like the reference's
    DictReader: columns come from the file header; missing v1.1 columns raise
    downstream in the transform (strict parity). An `_row_order` column
    preserves input order for byte-exact golden output rendering.
    """
    # escape='"' = RFC4180 doubled-quote escaping, matching Python's
    # csv.DictReader (the reference's parser — Spark's default escape is
    # backslash, which would pass `""` through literally)
    df = spark.read.csv(
        path, header=True, inferSchema=False, escape='"'
    )
    missing = [c for c in FILE_METADATA_COLUMNS_V11 if c not in df.columns]
    if missing:
        raise ValueError(f"file-metadata.csv missing required columns: {missing}")
    # DictReader yields '' (not None) for empty fields — match that, else the
    # enum CASE chains see NULL where the reference sees ''.
    df = df.na.fill("")
    return df.withColumn("_row_order", F.monotonically_increasing_id())
