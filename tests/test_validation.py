"""Checksum verification joins + set reconciliation (SURVEY.md §2.3 J2-J4)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from da_transform_judgments_pipeline_spark.operators.validation import (
    STATUS_MISMATCH,
    STATUS_MISSING_FILE,
    STATUS_OK,
    STATUS_UNEXPECTED_FILE,
    assert_exactly_one,
    basename_matches,
    checksum_report,
    computed_checksums,
    reconcile_sets,
    verify_checksums,
)


def sha(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()


@pytest.fixture()
def files(spark):
    rows = [
        ("data/a.txt", bytearray(b"alpha")),
        ("data/b.txt", bytearray(b"beta")),
        ("data/extra.txt", bytearray(b"extra")),
    ]
    return spark.createDataFrame(rows, "file string, content binary")


@pytest.fixture()
def manifest(spark):
    rows = [
        (sha(b"alpha"), "data/a.txt", "a.txt"),
        ("0" * 64, "data/b.txt", "b.txt"),  # wrong checksum
        (sha(b"gone"), "data/gone.txt", "gone.txt"),  # file absent
    ]
    return spark.createDataFrame(rows, "checksum string, file string, basename string")


def test_checksum_report_statuses(spark, files, manifest):
    report = checksum_report(manifest, computed_checksums(files))
    got = {r.file: r.status for r in report.collect()}
    assert got == {
        "data/a.txt": STATUS_OK,
        "data/b.txt": STATUS_MISMATCH,
        "data/gone.txt": STATUS_MISSING_FILE,
        "data/extra.txt": STATUS_UNEXPECTED_FILE,
    }


def test_verify_fail_fast(spark, files, manifest):
    with pytest.raises(ValueError, match="Checksum validation failed"):
        verify_checksums(manifest, computed_checksums(files))


def test_verify_ok(spark, files):
    good = spark.createDataFrame(
        [(sha(b"alpha"), "data/a.txt", "a.txt"),
         (sha(b"beta"), "data/b.txt", "b.txt"),
         (sha(b"extra"), "data/extra.txt", "extra.txt")],
        "checksum string, file string, basename string",
    )
    verify_checksums(good, computed_checksums(files))  # no raise


def test_reconcile_sets(spark, files, manifest):
    report = reconcile_sets(manifest, files)
    got = {(r.file, r.status) for r in report.collect()}
    assert got == {
        ("data/gone.txt", STATUS_MISSING_FILE),
        ("data/extra.txt", STATUS_UNEXPECTED_FILE),
    }


def test_assert_exactly_one(spark, manifest):
    one = manifest.filter(F.col("basename") == "a.txt")
    row = assert_exactly_one(one, "checksums")
    assert row["file"] == "data/a.txt"
    with pytest.raises(ValueError, match="expected 1, found 3"):
        assert_exactly_one(manifest, "checksums")
    with pytest.raises(ValueError, match="expected 1, found 0"):
        assert_exactly_one(manifest.filter(F.lit(False)), "checksums")


def test_basename_matches():
    basename_matches("bag.tar.gz", "bag.tar.gz")
    with pytest.raises(ValueError, match="does not match"):
        basename_matches("bag.tar.gz", "other.tar.gz")


def test_computed_checksums_streamed_matches_sha2(spark, tmp_path):
    """The chunked streaming hash must equal the whole-row sha2 path on
    files spanning many blocks (block_bytes shrunk to force >100 blocks
    per file), while never carrying content through a Spark row — input
    is the content-free catalog."""
    import hashlib

    from da_transform_judgments_pipeline_spark.operators.validation import (
        checksum_report,
        computed_checksums_streamed,
    )
    from da_transform_judgments_pipeline_spark.sources.catalog import (
        read_file_catalog,
    )

    # NB: no empty-file case — Spark's binaryFile source silently drops
    # 0-byte files from the catalog, so they never reach the hash fold
    blobs = {
        "big-a.bin": bytes(range(256)) * 2000,   # 512 KB
        "big-b.bin": b"xyz" * 100_000,           # 300 KB
    }
    for name, blob in blobs.items():
        (tmp_path / name).write_bytes(blob)

    cat = read_file_catalog(spark, str(tmp_path), with_content=False)
    assert "content" not in cat.columns
    out = {
        r["file"]: r["actual"]
        for r in computed_checksums_streamed(
            cat, block_bytes=4096
        ).collect()
    }
    for name, blob in blobs.items():
        want = hashlib.sha256(blob).hexdigest()
        [key] = [k for k in out if k.endswith(name)]
        assert out[key] == want

    # drops into checksum_report unchanged (the J2 join contract)
    manifest = spark.createDataFrame(
        [(hashlib.sha256(blobs["big-a.bin"]).hexdigest(),
          f"file:{tmp_path}/big-a.bin")],
        ["checksum", "file"],
    )
    rep = checksum_report(
        manifest,
        computed_checksums_streamed(
            cat.filter(F.col("path").endswith("big-a.bin")), block_bytes=4096
        ),
    ).collect()
    assert [r["status"] for r in rep] == ["ok"]
