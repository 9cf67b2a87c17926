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
