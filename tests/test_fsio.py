"""Object-store seam tests (sources/fsio, round-12): the single-object
connectors (S5/S6 sinks, S4 url_to_file) run through the Hadoop
FileSystem API of the active session, so a NON-file scheme works the
day credentials exist. Here the stub: scheme is registered against
RawLocalFileSystem — a genuinely different FileSystem resolution path
than file:, backed by the same disk so results are assertable."""

import hashlib
import os

import pytest

from da_transform_judgments_pipeline_spark.sources import fsio, ingest, sinks


@pytest.fixture()
def stub_scheme(spark, tmp_path):
    """A genuinely non-file scheme: Hadoop's viewfs with a mount table
    entry resolving /data onto the local disk — the same FileSystem
    resolution machinery an s3a/abfs/gs URI goes through, assertable
    against the backing directory. (RawLocalFileSystem can't simply be
    aliased: its checkPath pins file:///.)"""
    import uuid

    # FileSystem instances are CACHED per (scheme, authority): a fresh
    # mount-table name per test keeps each test's mount isolated
    name = f"fsio-{uuid.uuid4().hex[:8]}"
    conf = spark._jsc.hadoopConfiguration()
    conf.set(
        f"fs.viewfs.mounttable.{name}.link./data", f"file://{tmp_path}"
    )
    return f"viewfs://{name}/data"


def test_sinks_on_nonfile_scheme(spark, stub_scheme, tmp_path):
    path = f"{stub_scheme}/a/b/metadata.csv"
    sinks.write_single_text("h1,h2\nv1,v2\n", path)
    # bytes land where the mount says (parents created by the FS API)
    disk = tmp_path / "a" / "b" / "metadata.csv"
    assert disk.read_text() == "h1,h2\nv1,v2\n"
    # the S6 guard holds across the scheme
    with pytest.raises(FileExistsError):
        sinks.write_single_text("x", path)
    sinks.write_single_text("v3", path, allow_overwrite=True)
    assert disk.read_text() == "v3"
    assert fsio.exists(path) and not fsio.exists(path + ".nope")
    # the raw fsio guard surfaces as FileExistsError on the FS path
    # too (not a Java FileAlreadyExistsException)
    with pytest.raises(FileExistsError):
        fsio.write_bytes(path, b"x")
    with pytest.raises(FileExistsError):
        fsio.rename(path, path)  # dst exists, overwrite off


def test_url_to_file_on_nonfile_scheme(spark, stub_scheme, tmp_path):
    src = tmp_path / "payload.bin"
    src.write_bytes(b"y" * 2000)
    digest = hashlib.sha256(b"y" * 2000).hexdigest()
    dest = f"{stub_scheme}/out/obj.bin"
    r = ingest.url_to_file(
        src.as_uri(), dest, expected_sha256=digest, chunk_size=512
    )
    assert r["size"] == 2000 and r["sha256"] == digest
    disk = tmp_path / "out" / "obj.bin"
    assert disk.read_bytes() == b"y" * 2000
    # spool removed; overwrite guard holds on the scheme; mismatch
    # cleans up without leaving a partial object at the final key
    assert not (tmp_path / "out" / "obj.bin.inprogress").exists()
    with pytest.raises(ingest.ObjectExistsError):
        ingest.url_to_file(src.as_uri(), dest)
    bad = f"{stub_scheme}/out/bad.bin"
    with pytest.raises(ingest.ChecksumMismatchError):
        ingest.url_to_file(src.as_uri(), bad, expected_sha256="0" * 64)
    assert not (tmp_path / "out" / "bad.bin").exists()
    assert not (tmp_path / "out" / "bad.bin.inprogress").exists()


def test_rename_overwrite_failure_safe(spark, stub_scheme, tmp_path):
    """r13 (per r12 ADVICE): overwrite-rename must never pass through a
    state with NO object at dst. On non-file schemes the old object is
    parked under a side name, the new object renamed in, the side name
    deleted — and a FAILED flip restores the old object instead of
    having pre-deleted it. On file: the flip is POSIX-atomic
    os.replace."""
    src = f"{stub_scheme}/r/src.bin"
    dst = f"{stub_scheme}/r/dst.bin"
    fsio.write_bytes(src, b"new")
    fsio.write_bytes(dst, b"old")
    fsio.rename(src, dst, overwrite=True)
    disk = tmp_path / "r"

    def _objs():  # viewfs keeps .crc siblings; objects are what count
        return sorted(
            n for n in os.listdir(disk) if not n.startswith(".")
        )

    assert _objs() == ["dst.bin"]  # no side debris
    assert (disk / "dst.bin").read_bytes() == b"new"
    # failed flip (src vanished): the old object is RESTORED, not lost
    with pytest.raises(OSError):
        fsio.rename(f"{stub_scheme}/r/gone.bin", dst, overwrite=True)
    assert (disk / "dst.bin").read_bytes() == b"new"
    assert _objs() == ["dst.bin"]
    # file: scheme takes the atomic os.replace branch
    p1 = f"file:{tmp_path}/f/src.txt"
    p2 = f"file:{tmp_path}/f/dst.txt"
    fsio.write_bytes(p1, b"n2")
    fsio.write_bytes(p2, b"o2")
    fsio.rename(p1, p2, overwrite=True)
    assert (tmp_path / "f" / "dst.txt").read_bytes() == b"n2"
    assert sorted(os.listdir(tmp_path / "f")) == ["dst.txt"]


def test_file_scheme_writes_no_crc_siblings(spark, tmp_path):
    """On file: paths the raw FS is used, so no .crc sibling appears —
    the reference's consumers list directories and must see exactly
    the objects written."""
    sinks.write_single_text("x", f"file:{tmp_path}/only/f.txt")
    assert sorted(os.listdir(tmp_path / "only")) == ["f.txt"]


def test_fsio_local_fallback_without_session(tmp_path, monkeypatch):
    """With no active session (pure-library use) the helpers fall back
    to os/open with identical semantics."""
    from pyspark.sql import SparkSession

    monkeypatch.setattr(
        SparkSession, "getActiveSession", staticmethod(lambda: None)
    )
    p = str(tmp_path / "x" / "f.txt")
    fsio.write_bytes(p, b"abc")
    assert open(p, "rb").read() == b"abc"
    with pytest.raises(FileExistsError):
        fsio.write_bytes(p, b"def")
    fsio.write_bytes(p, b"def", overwrite=True)
    fsio.rename(p, p + ".2")
    assert fsio.exists(p + ".2") and not fsio.exists(p)
    # the non-overwrite rename refuses an existing destination on the
    # local fallback too (POSIX os.rename would silently replace)
    fsio.write_bytes(p, b"again")
    with pytest.raises(FileExistsError):
        fsio.rename(p, p + ".2")
    fsio.rename(p, p + ".2", overwrite=True)
    assert open(p + ".2", "rb").read() == b"again"
    assert fsio.delete(p + ".2") is True
    assert fsio.delete(p + ".2") is False
