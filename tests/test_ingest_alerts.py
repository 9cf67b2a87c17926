"""Connector layer: S4/A2 URL ingest with running checksum, S9 presigned
URLs, S17-S19 forward/alert sinks (transport-injected, offline)."""

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from da_transform_judgments_pipeline_spark.sources import ingest
from da_transform_judgments_pipeline_spark.streaming import alerts


def _fixture_file(tmp_path, name="src.bin", payload=b"x" * 1000):
    p = tmp_path / name
    p.write_bytes(payload)
    return p, hashlib.sha256(payload).hexdigest()


def test_url_to_file_checksum_ok(tmp_path):
    src, digest = _fixture_file(tmp_path)
    dest = tmp_path / "out" / "obj.bin"
    r = ingest.url_to_file(src.as_uri(), str(dest), expected_sha256=digest)
    assert r["size"] == 1000 and r["sha256"] == digest
    assert dest.read_bytes() == b"x" * 1000


def test_url_to_file_checksum_mismatch_cleans_up(tmp_path):
    src, _ = _fixture_file(tmp_path)
    dest = tmp_path / "obj.bin"
    with pytest.raises(ingest.ChecksumMismatchError):
        ingest.url_to_file(src.as_uri(), str(dest), expected_sha256="0" * 64)
    # neither the object nor the in-progress temp may remain
    assert not dest.exists()
    assert not os.path.exists(str(dest) + ".inprogress")


def test_url_to_file_overwrite_guard(tmp_path):
    src, digest = _fixture_file(tmp_path)
    dest = tmp_path / "obj.bin"
    ingest.url_to_file(src.as_uri(), str(dest))
    with pytest.raises(ingest.ObjectExistsError):
        ingest.url_to_file(src.as_uri(), str(dest))
    ingest.url_to_file(src.as_uri(), str(dest), allow_overwrite=True)


def test_ingest_urls_accumulates_errors(spark, tmp_path):
    src, digest = _fixture_file(tmp_path)
    rows = [
        (src.as_uri(), str(tmp_path / "a.bin"), digest),     # ok
        (src.as_uri(), str(tmp_path / "b.bin"), "0" * 64),   # bad checksum
        ((tmp_path / "missing").as_uri(), str(tmp_path / "c.bin"), None),
    ]
    urls = spark.createDataFrame(
        rows, "url string, dest string, expected_sha256 string"
    )
    got = {r["dest"]: r for r in ingest.ingest_urls(urls).collect()}
    assert got[str(tmp_path / "a.bin")]["ok"]
    assert got[str(tmp_path / "a.bin")]["sha256"] == digest
    assert not got[str(tmp_path / "b.bin")]["ok"]
    assert "ChecksumMismatch" in got[str(tmp_path / "b.bin")]["error"]
    assert not got[str(tmp_path / "c.bin")]["ok"]


def test_presigned_url_deterministic():
    u1 = ingest.presigned_url("https://store", "a/b c.txt", 1700000000, b"k")
    u2 = ingest.presigned_url("https://store", "a/b c.txt", 1700000000, b"k")
    u3 = ingest.presigned_url("https://store", "a/b c.txt", 1700000060, b"k")
    assert u1 == u2 != u3
    assert "a/b%20c.txt" in u1 and "X-Signature=" in u1


def test_alert_payloads_and_sink(spark):
    sent = []
    df = spark.createDataFrame(
        [("bagit-validated", "ABC-123", "err msg")],
        "event_name string, reference string, error string",
    )
    alerts.alert_sink(sent.append, "prod", kind="status")(df, 0)
    alerts.alert_sink(sent.append, "prod", kind="dlq")(df, 0)
    assert "bagit-validated" in sent[0]["text"] and "ABC-123" in sent[0]["text"]
    assert "dead-lettered" in sent[1]["text"] and "err msg" in sent[1]["text"]


def test_forward_sink_accumulates_failures(spark):
    sent = []

    def transport(msg, attrs):
        if attrs["type"] == "bad":
            raise IOError("endpoint down")
        sent.append((msg, attrs))

    df = spark.createDataFrame(
        [('{"a":1}', "judgment"), ('{"a":2}', "bad"), ('{"a":3}', "bad")],
        "event_json string, type string",
    )
    with pytest.raises(alerts.ForwardError) as ei:
        alerts.forward_sink(transport, attribute_cols=("type",))(df, 0)
    # every record was attempted; both failures reported together
    assert len(sent) == 1 and len(ei.value.failures) == 2


def test_copy_objects_streamed_gz_bytes_and_errors(spark, tmp_path):
    """The streamed copier must move STORED bytes — pyarrow streams would
    otherwise auto-inflate a .gz on read (and re-deflate on write) by
    extension, corrupting both copy and digest. Also: per-row error
    accumulation for a missing source, never a job failure."""
    import gzip
    import hashlib

    from da_transform_judgments_pipeline_spark.sources.ingest import (
        copy_objects_streamed,
    )

    blob = gzip.compress(b"payload " * 1000)
    src = tmp_path / "archive.tar.gz"
    src.write_bytes(blob)
    pairs = spark.createDataFrame(
        [
            (str(src), str(tmp_path / "out" / "archive.tar.gz")),
            (str(tmp_path / "missing.bin"), str(tmp_path / "out" / "m.bin")),
        ],
        "src string, dest string",
    )
    rows = {r["src"]: r for r in copy_objects_streamed(pairs).collect()}
    ok = rows[str(src)]
    assert ok["ok"] and ok["size"] == len(blob)
    assert ok["sha256"] == hashlib.sha256(blob).hexdigest()
    assert (tmp_path / "out" / "archive.tar.gz").read_bytes() == blob
    bad = rows[str(tmp_path / "missing.bin")]
    assert not bad["ok"] and bad["error"]


def test_computed_checksums_streamed_gz_hashes_stored_bytes(spark, tmp_path):
    """Same extension trap for the streamed hasher: a .gz object's digest
    is over its stored (compressed) bytes."""
    import gzip
    import hashlib

    from da_transform_judgments_pipeline_spark.operators.validation import (
        computed_checksums_streamed,
    )
    from da_transform_judgments_pipeline_spark.sources.catalog import (
        read_file_catalog,
    )

    blob = gzip.compress(b"zzz " * 5000)
    (tmp_path / "x.gz").write_bytes(blob)
    cat = read_file_catalog(spark, str(tmp_path), with_content=False)
    [r] = computed_checksums_streamed(cat, block_bytes=1024).collect()
    assert r["actual"] == hashlib.sha256(blob).hexdigest()
