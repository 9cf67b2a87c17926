"""Real-object-store smoke (r13): the driver-side single-object
connectors (S4 url_to_file, S5/S6 sinks, the fsio seam) against a REAL
S3 API — a moto server over HTTP, boto3 transport — with TRUE
non-atomic copy+delete rename semantics, the contract viewfs could only
approximate. The Spark DATA plane (parquet sinks/scans on s3a://) stays
environment-blocked here: this container ships no hadoop-aws jar, so
s3a cannot resolve; the fsio ``s3://`` branch covers exactly the
single-object surface the reference's boto3 connectors owned
(object_lib.py:87-209). Skips cleanly when moto/boto3 are absent."""

import hashlib

import pytest

boto3 = pytest.importorskip("boto3")
pytest.importorskip("moto")

from da_transform_judgments_pipeline_spark.sources import (  # noqa: E402
    fsio,
    ingest,
    sinks,
)


@pytest.fixture()
def s3_bucket(monkeypatch):
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(ip_address="127.0.0.1", port=0)
    server.start()
    host, port = server.get_host_and_port()
    monkeypatch.setenv("AWS_ENDPOINT_URL", f"http://{host}:{port}")
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "test")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "test")
    monkeypatch.setenv("AWS_DEFAULT_REGION", "us-east-1")
    fsio._S3_CLIENTS.clear()  # clients pin their endpoint at creation
    client = boto3.client("s3", endpoint_url=f"http://{host}:{port}")
    client.create_bucket(Bucket="tre")
    yield "s3://tre"
    fsio._S3_CLIENTS.clear()
    server.stop()


def _get(path: str) -> bytes:
    client, bucket, key = fsio._s3(path)
    return client.get_object(Bucket=bucket, Key=key)["Body"].read()


def _ls(prefix_path: str) -> list:
    client, bucket, key = fsio._s3(prefix_path)
    out = []
    for page in client.get_paginator("list_objects_v2").paginate(
        Bucket=bucket, Prefix=key
    ):
        out += [o["Key"] for o in page.get("Contents", [])]
    return sorted(out)


def test_sinks_on_s3(s3_bucket):
    path = f"{s3_bucket}/a/b/metadata.csv"
    sinks.write_single_text("h1,h2\nv1,v2\n", path)
    assert _get(path) == b"h1,h2\nv1,v2\n"
    # the S6 error-if-exists guard holds on the real store
    with pytest.raises(FileExistsError):
        sinks.write_single_text("x", path)
    sinks.write_single_text("v3", path, allow_overwrite=True)
    assert _get(path) == b"v3"
    assert fsio.exists(path) and not fsio.exists(path + ".nope")
    with pytest.raises(FileExistsError):
        fsio.write_bytes(path, b"x")


def test_url_to_file_on_s3(s3_bucket, tmp_path):
    """The S4 ingest connector end-to-end onto S3: spool object under
    the in-progress name, digest verified, copy+delete flip to the
    final key, spool removed; a mismatch leaves NO object at the final
    key (the reference's ingest contract on its native store)."""
    src = tmp_path / "payload.bin"
    src.write_bytes(b"y" * 2000)
    digest = hashlib.sha256(b"y" * 2000).hexdigest()
    dest = f"{s3_bucket}/out/obj.bin"
    r = ingest.url_to_file(
        src.as_uri(), dest, expected_sha256=digest, chunk_size=512
    )
    assert r["size"] == 2000 and r["sha256"] == digest
    assert _get(dest) == b"y" * 2000
    assert _ls(f"{s3_bucket}/out/") == ["out/obj.bin"]  # no spool left
    with pytest.raises(ingest.ObjectExistsError):
        ingest.url_to_file(src.as_uri(), dest)
    bad = f"{s3_bucket}/out/bad.bin"
    with pytest.raises(ingest.ChecksumMismatchError):
        ingest.url_to_file(src.as_uri(), bad, expected_sha256="0" * 64)
    assert _ls(f"{s3_bucket}/out/") == ["out/obj.bin"]


def test_rename_failure_safe_on_s3(s3_bucket):
    """The r13 overwrite contract on TRUE copy+delete rename: the old
    object parks under a side name, the flip installs the new bytes,
    the side name is cleaned up — and a failed flip (source vanished)
    leaves the old object in place, never zero objects."""
    src = f"{s3_bucket}/r/src.bin"
    dst = f"{s3_bucket}/r/dst.bin"
    fsio.write_bytes(src, b"new")
    fsio.write_bytes(dst, b"old")
    with pytest.raises(FileExistsError):
        fsio.rename(src, dst)  # overwrite off
    fsio.rename(src, dst, overwrite=True)
    assert _get(dst) == b"new"
    assert _ls(f"{s3_bucket}/r/") == ["r/dst.bin"]  # src + side gone
    with pytest.raises(OSError):
        fsio.rename(f"{s3_bucket}/r/gone.bin", dst, overwrite=True)
    assert _get(dst) == b"new"
    assert _ls(f"{s3_bucket}/r/") == ["r/dst.bin"]


def test_ingest_urls_executor_side_to_s3(spark, s3_bucket, tmp_path):
    """The DISTRIBUTED S4 (ingest_urls, a mapInPandas stage) writing to
    S3 destinations: executor workers have no JVM gateway, which used
    to force the local-disk fallback — the boto3 branch needs none, so
    the whole transfer (spool, digest, copy+delete flip) now runs
    worker-side against the object store. One bad checksum row
    isolates (ok=False) without failing the job or leaving a partial
    object."""
    import hashlib as hl

    srcs = []
    for i in range(4):
        p = tmp_path / f"src{i}.bin"
        p.write_bytes(bytes([i]) * (300 + i))
        srcs.append(p)
    rows = [
        (s.as_uri(), f"{s3_bucket}/ing/obj{i}.bin",
         hl.sha256(s.read_bytes()).hexdigest())
        for i, s in enumerate(srcs)
    ]
    rows[2] = (rows[2][0], rows[2][1], "0" * 64)  # planted bad digest
    df = spark.createDataFrame(
        rows, "url string, dest string, expected_sha256 string"
    ).repartition(4)
    got = {r["dest"]: r for r in ingest.ingest_urls(df).collect()}
    for i in (0, 1, 3):
        r = got[f"{s3_bucket}/ing/obj{i}.bin"]
        assert r["ok"] is True and r["size"] == 300 + i
        assert _get(f"{s3_bucket}/ing/obj{i}.bin") == bytes([i]) * (300 + i)
    bad = got[f"{s3_bucket}/ing/obj2.bin"]
    assert bad["ok"] is False and "Checksum" in bad["error"]
    # the failed row left NO object (and no spool) at its key
    assert _ls(f"{s3_bucket}/ing/") == [
        "ing/obj0.bin", "ing/obj1.bin", "ing/obj3.bin",
    ]


def test_delete_on_s3(s3_bucket):
    p = f"{s3_bucket}/d/one.txt"
    fsio.write_bytes(p, b"1")
    fsio.write_bytes(f"{s3_bucket}/d/sub/two.txt", b"2")
    assert fsio.delete(p) is True
    assert fsio.delete(p) is False
    assert fsio.delete(f"{s3_bucket}/d", recursive=True) is True
    assert _ls(f"{s3_bucket}/d") == []


def test_exists_directory_prefix_on_s3(s3_bucket):
    """r14 (per r13 ADVICE): the Hadoop FileSystem route answers True
    for a directory; the boto3 s3:// branch used to HEAD only the
    exact key, so a prefix with objects under it reported False and
    pre-write directory probes diverged by backend. Parity: a
    non-empty 'directory' prefix is True (with or without a trailing
    slash), an empty one is False, and the exact-object probe is
    unchanged."""
    fsio.write_bytes(f"{s3_bucket}/batch/in/0/doc.xml", b"<x/>")
    assert fsio.exists(f"{s3_bucket}/batch/in/0/doc.xml")
    assert fsio.exists(f"{s3_bucket}/batch/in/0")
    assert fsio.exists(f"{s3_bucket}/batch/in/0/")
    assert fsio.exists(f"{s3_bucket}/batch")
    assert not fsio.exists(f"{s3_bucket}/batch/in/1")
    assert not fsio.exists(f"{s3_bucket}/batch/in/0/doc")  # no such
    # object AND no object under "doc/" — a name PREFIX is not a dir


def test_cross_scheme_rename_refuses_typed(s3_bucket, tmp_path):
    """r14 (per r13 ADVICE): rename with an s3:// source and a local
    destination used to crash unpacking _s3(dst) (TypeError); the
    reverse direction would have written a literal 's3:/...' local
    file. Both directions now refuse with a descriptive OSError and
    leave the source untouched."""
    src = f"{s3_bucket}/move/src.bin"
    fsio.write_bytes(src, b"payload")
    with pytest.raises(OSError, match="cross-scheme"):
        fsio.rename(src, str(tmp_path / "dst.bin"))
    assert _get(src) == b"payload"  # source untouched
    local = tmp_path / "local.bin"
    local.write_bytes(b"local")
    with pytest.raises(OSError, match="cross-scheme"):
        fsio.rename(str(local), f"{s3_bucket}/move/dst.bin")
    assert local.read_bytes() == b"local"
    assert not fsio.exists(f"{s3_bucket}/move/dst.bin")
