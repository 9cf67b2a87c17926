"""Checksum + set-reconciliation validation (SURVEY.md §2.3 J2-J4, §2.4 A1-A5).

The reference validates sequentially and fails on the first mismatch
(s3_lib/s3_lib/checksum_lib.py:121-154). The Spark form is strictly more
informative AND parallel: compute sha2 over a binaryFile catalog, join to the
manifest, and return a full *mismatch report* DataFrame; bidirectional
anti-joins replace count-equality reconciliation
(tre_vb_validate_bagit_files.py:88-132). A `fail_fast` helper restores raise
semantics for parity.

Scale: the manifest side is per-consignment KBs → broadcast; the files side
is the 100 TB fact table and is never shuffled (all joins broadcast, the
sha2 fold is map-side only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sha256_hex

STATUS_OK = "ok"
STATUS_MISMATCH = "checksum-mismatch"
STATUS_MISSING_FILE = "missing-file"  # manifest entry with no file
STATUS_UNEXPECTED_FILE = "unexpected-file"  # file with no manifest entry


def computed_checksums(
    files: DataFrame, path_col: str = "file", content_col: str = "content"
) -> DataFrame:
    """A1: SHA-256 over file content, executor-parallel (reference's 5 MB
    chunked fold, checksum_lib.py:101-119, parallelized across files)."""
    return files.select(
        F.col(path_col).alias("file"), sha256_hex(content_col).alias("actual")
    )


def computed_checksums_streamed(
    files: DataFrame,
    path_col: str = "path",
    file_col: str | None = None,
    block_bytes: int = 5 * 1024 * 1024,
) -> DataFrame:
    """A1 for objects too big to hold as a row: stream each object through
    SHA-256 in fixed ``block_bytes`` blocks (the reference's 5 MB chunked
    fold, s3_lib checksum_lib.py:101-119) instead of materializing
    ``content`` as one binary cell.

    Input is a catalog WITHOUT content — (path[, file]) rows, e.g.
    ``read_file_catalog(..., with_content=False)`` — so a multi-GB member
    never rides a Spark row at all; peak executor memory per in-flight
    file is one block. Objects are opened executor-side via
    ``pyarrow.fs.FileSystem.from_uri`` (file:// locally; the same call
    resolves object-store URIs where a pyarrow filesystem is available).
    Output matches :func:`computed_checksums`: (file, actual), ``file``
    taken from ``file_col`` when given else the raw path — so it drops
    into :func:`checksum_report` unchanged.
    """
    import pandas as pd

    src = files.select(
        F.col(path_col).alias("_path"),
        F.col(file_col if file_col else path_col).alias("_file"),
    )

    def fold(batches):
        import hashlib

        from pyarrow import fs as pafs

        for pdf in batches:
            names, digests = [], []
            for path, fname in zip(pdf["_path"], pdf["_file"]):
                fsys, p = pafs.FileSystem.from_uri(path)
                h = hashlib.sha256()
                # compression=None: pyarrow auto-inflates by extension —
                # a .gz object must hash its STORED bytes, not the
                # decompressed stream
                with fsys.open_input_stream(p, compression=None) as stream:
                    while True:
                        block = stream.read(block_bytes)
                        if not block:
                            break
                        h.update(block)
                names.append(fname)
                digests.append(h.hexdigest())
            yield pd.DataFrame({"file": names, "actual": digests})

    return src.mapInPandas(fold, "file string, actual string")


def checksum_report(manifest: DataFrame, computed: DataFrame) -> DataFrame:
    """J2 as a full-outer verification join → one row per (manifest ∪ files)
    entry with a status column.

    Columns: file, expected, actual, status.
    """
    m = manifest.select("file", F.col("checksum").alias("expected"))
    c = computed.select("file", "actual")
    # full-outer can't broadcast; manifest-vs-files cardinality is small-vs-
    # huge, so AQE plans this as a shuffled join with the tiny side coalesced.
    joined = m.join(c, "file", "full_outer")
    return joined.select(
        "file",
        "expected",
        "actual",
        F.when(F.col("expected").isNull(), F.lit(STATUS_UNEXPECTED_FILE))
        .when(F.col("actual").isNull(), F.lit(STATUS_MISSING_FILE))
        .when(F.col("expected") == F.col("actual"), F.lit(STATUS_OK))
        .otherwise(F.lit(STATUS_MISMATCH))
        .alias("status"),
    )


def verify_checksums(manifest: DataFrame, computed: DataFrame) -> None:
    """Fail-fast parity with checksum_lib.verify_s3_object_checksum: raise
    ValueError describing the FIRST problem row (deterministic order)."""
    bad = (
        checksum_report(manifest, computed)
        .filter(F.col("status") != STATUS_OK)
        .orderBy("file")
        .limit(1)
        .collect()
    )
    if bad:
        r = bad[0]
        raise ValueError(
            f'Checksum validation failed for "{r.file}": status={r.status} '
            f"expected={r.expected} actual={r.actual}"
        )


def reconcile_sets(
    expected: DataFrame,
    actual: DataFrame,
    key: str = "file",
) -> DataFrame:
    """J4 upgraded: bidirectional anti-join reconciliation.

    The reference only compares counts (tre_vb_validate_bagit_files.py:88-132,
    tre_files_checksum_validation.py:101-143); anti-joins both directions name
    the offending keys. Returns (key, status) with status ∈
    {missing-file, unexpected-file}; empty result == reconciled.
    """
    missing = (
        expected.select(key)
        .join(actual.select(key), key, "left_anti")
        .withColumn("status", F.lit(STATUS_MISSING_FILE))
    )
    unexpected = (
        actual.select(key)
        .join(expected.select(key), key, "left_anti")
        .withColumn("status", F.lit(STATUS_UNEXPECTED_FILE))
    )
    return missing.unionByName(unexpected)


def assert_exactly_one(df: DataFrame, what: str) -> dict:
    """A5 cardinality assertion: exactly-1 checks (sidecar manifest must have
    one checksum, one context block, ... — tre_vb_validate_bagit.py:100-105).
    Returns the single row as a dict."""
    rows = df.limit(2).collect()
    if len(rows) != 1:
        found = len(rows) if len(rows) < 2 else df.count()
        raise ValueError(f"Incorrect number of {what}; expected 1, found {found}")
    return rows[0].asDict()


def basename_matches(manifest_basename: str, resource_name: str) -> None:
    """J3: manifest-derived basename must equal the URL-derived name
    (tre_vb_validate_bagit.py:111-116)."""
    if manifest_basename != resource_name:
        raise ValueError(
            f'The name "{manifest_basename}" (derived from manifest file '
            f'entry) does not match the value "{resource_name}" (derived '
            f"from the input URL)"
        )
