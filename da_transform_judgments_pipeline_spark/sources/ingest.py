"""Ingest connectors: URL → object store with streaming checksum.

Reference parity (SURVEY.md §2.1):

- S4 `url_to_s3_object` (object_lib.py:87-171): streamed GET in 5 MB
  chunks, running SHA-256 folded during transfer (A2, object_lib.py:118-162),
  abort-and-clean on mismatch, overwrite guard (S6, object_lib.py:107-109).
  Here: :func:`url_to_file` (single transfer) and :func:`ingest_urls`
  (distributed — each partition transfers its URLs; the work parallelizes
  across executors instead of the reference's sequential loop).
- S9 `get_s3_object_presigned_url` (object_lib.py:244-258): a driver-side
  service adapter, not a Spark operator — :func:`presigned_url` implements
  the generic HMAC-SHA256 query-string scheme with an injectable key so no
  cloud SDK is required.

Transports are stdlib ``urllib`` — ``file://`` URLs exercise the full code
path offline; ``https://`` works unchanged where the cluster has egress.
"""

from __future__ import annotations

import hashlib
import hmac
import os
import urllib.parse
import urllib.request
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

READ_BLOCK_SIZE = 5 * 1024 * 1024  # reference parity: object_lib.py:19


class ObjectExistsError(FileExistsError):
    """Raised by the S6 overwrite guard."""


class ChecksumMismatchError(ValueError):
    """Raised when the running SHA-256 differs from the expected digest."""


def url_to_file(
    url: str,
    dest: str,
    expected_sha256: str | None = None,
    allow_overwrite: bool = False,
    chunk_size: int = READ_BLOCK_SIZE,
) -> dict:
    """S4/A2: stream ``url`` to ``dest`` with a running SHA-256.

    The digest is folded chunk-by-chunk during the transfer (never a second
    read pass); on mismatch the partial object is removed and
    :class:`ChecksumMismatchError` raised — mirroring the reference's
    multipart abort. Returns ``{url, dest, size, sha256}``.
    """
    from . import fsio

    if not allow_overwrite and fsio.exists(dest):
        raise ObjectExistsError(dest)
    digest = hashlib.sha256()
    size = 0
    tmp = dest + ".inprogress"
    try:
        # spool to a sibling, flip the name last: the final key never
        # holds a partial object. IO goes through the Hadoop FS API
        # (fsio), so dest may be s3a/abfs/gs/hdfs — there the "rename"
        # is a copy+delete, which preserves the same contract (the
        # bytes are complete and checksum-verified before the flip).
        with urllib.request.urlopen(url) as src, fsio.open_output(
            tmp
        ) as out:
            while True:
                chunk = src.read(chunk_size)
                if not chunk:
                    break
                digest.update(chunk)
                out.write(chunk)
                size += len(chunk)
        actual = digest.hexdigest()
        if expected_sha256 is not None and actual != expected_sha256.lower():
            raise ChecksumMismatchError(
                f"{url}: expected {expected_sha256}, got {actual}"
            )
        fsio.rename(tmp, dest, overwrite=True)
    finally:
        fsio.delete(tmp)
    return {"url": url, "dest": dest, "size": size, "sha256": actual}


INGEST_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("dest", T.StringType(), False),
        T.StructField("size", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)


def ingest_urls(
    urls: DataFrame,
    url_col: str = "url",
    dest_col: str = "dest",
    checksum_col: str | None = "expected_sha256",
    allow_overwrite: bool = False,
) -> DataFrame:
    """Distributed S4: each partition transfers its rows (the reference's
    sequential per-consignment copy loop, parallelized across executors).

    Errors are accumulated per row (T5/A6 report-then-route style: ``ok``
    flag + ``error`` message), never raised mid-job — a single bad URL must
    not fail a 100 TB ingest; route the error rows instead.
    """
    import os

    import pandas as pd

    has_ck = checksum_col is not None and checksum_col in urls.columns
    cols = [url_col, dest_col] + ([checksum_col] if has_ck else [])
    src = urls.select(*cols)

    # non-secret S3 configuration travels WITH the job (r13): executor
    # Python workers inherit the JVM's env from SESSION start, not the
    # driver's current env, so an endpoint set after startup (or only
    # driver-side) never reaches them. Endpoint/region are config, not
    # credentials — those come from each worker's own standard chain
    # (instance profile / env), never serialized into the closure.
    _s3_env = {
        k: os.environ[k]
        for k in ("AWS_ENDPOINT_URL", "AWS_DEFAULT_REGION")
        if k in os.environ
    }

    def transfer(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import os as _os

        for k, v in _s3_env.items():
            _os.environ.setdefault(k, v)
        for pdf in batches:
            out = []
            for rec in pdf.to_dict("records"):
                url, dest = rec[url_col], rec[dest_col]
                expected = rec.get(checksum_col) if has_ck else None
                try:
                    r = url_to_file(
                        url, dest, expected, allow_overwrite=allow_overwrite
                    )
                    out.append(
                        dict(r, ok=True, error=None)
                    )
                except Exception as e:  # accumulate, never fail the job
                    out.append(
                        {
                            "url": url,
                            "dest": dest,
                            "size": None,
                            "sha256": None,
                            "ok": False,
                            "error": f"{type(e).__name__}: {e}",
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "url", "dest", "size", "sha256", "ok", "error",
                ],
            )

    return src.mapInPandas(transfer, schema=INGEST_RESULT_SCHEMA)


def copy_objects_streamed(
    pairs: DataFrame,
    src_col: str = "src",
    dest_col: str = "dest",
    block_bytes: int = READ_BLOCK_SIZE,
) -> DataFrame:
    """S4/A2 filesystem→filesystem at unbounded object size: every
    (src, dest) pair streams through pyarrow filesystem streams in fixed
    ``block_bytes`` blocks with a RUNNING SHA-256 folded during the
    transfer — the object never rides a Spark row, so a 10 GB bagit costs
    one block of executor memory, not one 10 GB binary cell. The
    distributed twin of :func:`url_to_file` for store-to-store moves
    (reference: object_lib.py:87-171's multipart copy + the 5 MB
    checksum fold of checksum_lib.py:101-119).

    Paths resolve via ``pyarrow.fs.FileSystem.from_uri`` (file:// and
    plain local paths here; the same call resolves object-store URIs
    where a pyarrow filesystem is available). Destination parent
    directories are created. Errors accumulate per row (``ok`` +
    ``error``), never raised mid-job — same report-then-route contract
    as :func:`ingest_urls`. Returns (src, dest, size, sha256, ok, error).
    """
    import pandas as pd

    src = pairs.select(
        F.col(src_col).alias("src"), F.col(dest_col).alias("dest")
    )

    def transfer(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from pyarrow import fs as pafs

        def resolve(path: str):
            if "://" in path or path.startswith("file:"):
                return pafs.FileSystem.from_uri(path)
            return pafs.LocalFileSystem(), path

        for pdf in batches:
            out = []
            for s, d in zip(pdf["src"], pdf["dest"]):
                try:
                    sfs, sp = resolve(s)
                    dfs, dp = resolve(d)
                    parent = dp.rsplit("/", 1)[0]
                    if parent:
                        dfs.create_dir(parent, recursive=True)
                    digest = hashlib.sha256()
                    size = 0
                    # compression=None: pyarrow streams otherwise
                    # auto-(de)compress by file EXTENSION — a .tar.gz
                    # would be inflated on read / re-deflated on write,
                    # corrupting the copy and its digest
                    with sfs.open_input_stream(sp, compression=None) as rd, \
                            dfs.open_output_stream(dp, compression=None) as wr:
                        while True:
                            block = rd.read(block_bytes)
                            if not block:
                                break
                            digest.update(block)
                            wr.write(block)
                            size += len(block)
                    out.append(
                        {
                            "url": s,
                            "dest": d,
                            "size": size,
                            "sha256": digest.hexdigest(),
                            "ok": True,
                            "error": None,
                        }
                    )
                except Exception as e:
                    out.append(
                        {
                            "url": s,
                            "dest": d,
                            "size": None,
                            "sha256": None,
                            "ok": False,
                            "error": f"{type(e).__name__}: {e}",
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=["url", "dest", "size", "sha256", "ok", "error"],
            )

    return src.mapInPandas(transfer, schema=INGEST_RESULT_SCHEMA).select(
        F.col("url").alias("src"), "dest", "size", "sha256", "ok", "error"
    )


def presigned_url(
    base_url: str,
    key: str,
    expires_at: int,
    signing_key: bytes,
) -> str:
    """S9 adapter: HMAC-SHA256 query-string presigning (the generic scheme
    cloud object stores implement; reference mints via boto3,
    object_lib.py:244-258). Deterministic for a given (key, expiry,
    signing_key) — callers pass an absolute ``expires_at`` epoch so URL
    generation is reproducible and testable."""
    canonical = f"{key}\n{expires_at}"
    sig = hmac.new(signing_key, canonical.encode(), hashlib.sha256).hexdigest()
    q = urllib.parse.urlencode({"X-Expires": expires_at, "X-Signature": sig})
    return f"{base_url.rstrip('/')}/{urllib.parse.quote(key)}?{q}"
