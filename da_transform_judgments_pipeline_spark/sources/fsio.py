"""Scheme-aware single-object IO — the object-store seam (round-12).

The reference's connectors are boto3 against S3 (object_lib.py:87-171
streamed GET + multipart upload, :196-209 the overwrite guard); this
repo reproduces their SEMANTICS but originally wrote through
``os``/``open``, which binds the driver-side connectors (S4/S5/S6) to
the local filesystem. These helpers route the same operations through
the Hadoop FileSystem API of the ACTIVE SparkSession instead, so the
moment a deployment carries s3a/abfs/gs/hdfs credentials the
connectors work on those schemes with no code change — the Spark-first
answer to a cloud SDK dependency. With no active session (pure-library
use, no JVM) they fall back to the local ``os`` implementations, which
are semantically identical on ``file:`` paths.

Two deliberate behaviors:

- on the ``file`` scheme the RAW filesystem is used
  (``ChecksumFileSystem.getRawFileSystem``) so no ``.crc`` sibling
  files appear next to outputs — the reference's consumers list
  directories and must see exactly the objects written;
- ``rename`` is the visibility-flip primitive of the tmp+rename write
  pattern; on object stores it degrades to copy+delete (S3A has no
  atomic rename), which still preserves the ingest contract — the
  final name never holds a partial object, because the bytes were
  complete before the flip began.

All DATA-plane IO (tables, sinks, streams) already goes through Spark
readers/writers, which are scheme-clean by construction; these helpers
cover the handful of driver-side single-object touches the reference's
workflow needs. See SCALE.md "Object-store readiness".
"""

from __future__ import annotations

import os


def _fs_path(path: str):
    """(Hadoop FileSystem, Path) for ``path`` via the active session,
    or (None, None) when no JVM is up (local fallback)."""
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
    except Exception:
        spark = None
    if spark is None:
        return None, None
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    try:
        scheme = fs.getScheme()
    except Exception:
        # FileSystem.getScheme's default (e.g. a bare
        # RawLocalFileSystem registered under an alias) throws
        # UnsupportedOperationException — such an FS is already raw
        scheme = None
    if scheme == "file":
        # the checksummed LocalFileSystem writes .crc siblings; the raw
        # FS matches what os/open produce (and what consumers list)
        try:
            fs = fs.getRawFileSystem()
        except Exception:
            pass
    return fs, p


def exists(path: str) -> bool:
    fs, p = _fs_path(path)
    if fs is None:
        return os.path.exists(path)
    return bool(fs.exists(p))


def write_bytes(path: str, data: bytes, overwrite: bool = False) -> None:
    """Create ``path`` holding exactly ``data`` (parents implied — the
    FS API creates them; the local fallback makedirs)."""
    fs, p = _fs_path(path)
    if fs is None:
        if not overwrite and os.path.exists(path):
            raise FileExistsError(f"Object already exists: {path}")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        mode = "wb" if overwrite else "xb"
        with open(path, mode) as f:
            f.write(data)
        return
    # probe-then-create so the guard surfaces as the same Python
    # FileExistsError the local fallback raises (FileSystem.create
    # would throw a Java FileAlreadyExistsException); create(False)
    # still backstops the race
    if not overwrite and fs.exists(p):
        raise FileExistsError(f"Object already exists: {path}")
    out = fs.create(p, overwrite)
    try:
        out.write(bytearray(data))
    finally:
        out.close()


class _FsWriter:
    """Chunked writer over an FSDataOutputStream (url_to_file's spool)."""

    def __init__(self, stream):
        self._stream = stream

    def write(self, chunk: bytes) -> None:
        self._stream.write(bytearray(chunk))

    def close(self) -> None:
        self._stream.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def open_output(path: str, overwrite: bool = True):
    """A chunk-writable stream at ``path`` (context manager), FS-backed
    when a session is active, plain file otherwise."""
    fs, p = _fs_path(path)
    if fs is None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        return open(path, "wb")
    return _FsWriter(fs.create(p, overwrite))


def rename(src: str, dst: str, overwrite: bool = False) -> None:
    """Move ``src`` to ``dst`` (the tmp→final visibility flip).

    Overwrite semantics are failure-safe (r13, per r12 ADVICE — the
    earlier delete-then-rename left NO object at ``dst`` if the
    process died between the two steps, and the caller's tmp cleanup
    then lost the new bytes too):

    - ``file`` scheme (FS-backed or fallback): ``os.replace`` — a
      POSIX-atomic swap, no window where ``dst`` is absent;
    - other schemes (no atomic overwrite-rename in the FileSystem
      API): the old object is PARKED under a side name first, the new
      object renamed in, then the side name deleted — a crash at any
      point leaves at least one complete object recoverable, never
      zero."""
    fs, p = _fs_path(src)
    if fs is None:
        if overwrite:
            os.replace(src, dst)
        else:
            # POSIX os.rename silently REPLACES an existing dst — the
            # FS path refuses one, so the fallback must too or the
            # overwrite contract depends on which engine is active
            if os.path.exists(dst):
                raise FileExistsError(
                    f"rename destination exists: {dst}"
                )
            os.rename(src, dst)
        return
    from pyspark.sql import SparkSession

    jvm = SparkSession.getActiveSession()._jvm
    d = jvm.org.apache.hadoop.fs.Path(dst)
    if fs.exists(d):
        if not overwrite:
            raise FileExistsError(f"rename destination exists: {dst}")
        try:
            scheme = fs.getScheme()
        except Exception:
            scheme = None
        if scheme == "file":
            os.replace(
                fs.makeQualified(p).toUri().getPath(),
                fs.makeQualified(d).toUri().getPath(),
            )
            return
        side = jvm.org.apache.hadoop.fs.Path(dst + ".~replaced~")
        if fs.exists(side):  # debris from an older crashed flip
            fs.delete(side, False)
        if not fs.rename(d, side):
            raise OSError(f"rename failed: {dst} -> {dst}.~replaced~")
        try:
            ok = fs.rename(p, d)
        except Exception as e:  # some schemes throw instead of False
            fs.rename(side, d)  # restore the old object
            raise OSError(f"rename failed: {src} -> {dst}: {e}") from e
        if not ok:
            fs.rename(side, d)
            raise OSError(f"rename failed: {src} -> {dst}")
        fs.delete(side, False)
        return
    if not fs.rename(p, d):
        raise OSError(f"rename failed: {src} -> {dst}")


def delete(path: str, recursive: bool = False) -> bool:
    """Remove ``path`` if present; True when something was deleted."""
    fs, p = _fs_path(path)
    if fs is None:
        if not os.path.exists(path):
            return False
        if recursive and os.path.isdir(path):
            import shutil

            shutil.rmtree(path)
        else:
            os.remove(path)
        return True
    return bool(fs.delete(p, recursive))
