"""WARC (Web ARChive, ISO 28500) source — the Common Crawl ingest path.

The reference ingests consignments as tar.gz packages (see
``archive.untar``); a 100 TB web/training corpus arrives as WARC: one
``.warc.gz`` file = many INDEPENDENTLY gzipped members concatenated
(the Common Crawl convention — per-record members are what make a
petabyte archive random-accessible and a record-splitting scan
parallelizable). This module reads that format with stdlib ``zlib``
only, from public knowledge (ISO 28500 / the WARC 1.0 spec + RFC 1952
multi-member gzip + RFC 9112 HTTP framing):

- :func:`split_gzip_members` walks concatenated members via
  ``decompressobj(…).unused_data``, with per-member and cumulative
  bomb bounds (the ``docx_parser`` pattern);
- :func:`parse_warc_record` parses the WARC version line + named
  headers + ``Content-Length``-framed block; ``response`` records
  carrying ``application/http`` are split into HTTP status line /
  headers / payload;
- ``WARC-Payload-Digest: sha1:BASE32`` is RE-VERIFIED against the
  actual payload bytes (``digest_ok``) — the checksum-report posture of
  ``validation.checksum_report`` applied to the web-archive surface;
- :func:`warc_records` fans the whole read over a corpus of WARC blobs
  as one Arrow-batched ``mapInPandas`` stage with ``on_error='report'``
  row isolation (a crawl ALWAYS has truncated members).

:func:`build_warc_gz` is the deterministic encoder twin
(``build_pdf``/``build_docx`` pattern): real, ``warcio``-compatible
bytes — per-record gzip members with pinned mtime, a leading
``warcinfo`` record, correct Content-Length framing and genuine sha1
payload digests — so closed-form oracles can recompute every parsed
field.
"""

from __future__ import annotations

import base64
import hashlib
import struct
import zlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WARC_MAX_MEMBER_BYTES = 256 << 20
WARC_MAX_TOTAL_BYTES = 1 << 30
#: Per-FILE compressed bound: warc_records/warc_cdx ride the whole file
#: in one task (the ~1 GB Common Crawl work-unit convention); a
#: pathological multi-GB WARC is refused with a typed error BEFORE the
#: blob is walked, instead of becoming an implicit task-memory risk.
WARC_MAX_FILE_BYTES = 2 << 30


class WarcFileTooLargeError(ValueError):
    """A .warc/.warc.gz file exceeds WARC_MAX_FILE_BYTES — split the
    archive (or raise the bound) rather than riding multi-GB blobs
    through single tasks."""


class WarcError(ValueError):
    """Malformed or unsupported WARC content — typed so report mode can
    isolate the blob with the real reason."""


class WarcBombError(WarcError):
    """A gzip member inflated past WARC_MAX_MEMBER_BYTES /
    WARC_MAX_TOTAL_BYTES."""


def _check_file_size(blob, max_file_bytes: int = None) -> None:
    bound = WARC_MAX_FILE_BYTES if max_file_bytes is None else max_file_bytes
    if blob is not None and len(blob) > bound:
        raise WarcFileTooLargeError(
            f"WARC file is {len(blob)} bytes, over the per-task bound"
            f" of {bound} — split the archive into ~1 GB files (the"
            " Common Crawl convention) or raise max_file_bytes"
        )


def split_gzip_members(blob: bytes) -> list[bytes]:
    """Decompress a concatenation of independent gzip members into the
    list of member payloads, bomb-bounded. A non-gzip blob is treated
    as a single uncompressed WARC file (the spec allows plain .warc)."""
    return [m for m, _, _ in split_gzip_members_indexed(blob)]


def split_gzip_members_indexed(
    blob: bytes,
) -> list[tuple[bytes, int, int]]:
    """Like :func:`split_gzip_members` but each element is
    (payload, compressed_offset, compressed_length) — the byte range of
    that member INSIDE the .warc.gz file. These ranges are what a CDX
    index stores: ``blob[off:off+length]`` is a complete standalone
    gzip stream, so a petabyte archive serves any single record with
    one ranged GET + one small inflate (the Common Crawl access
    pattern)."""
    if blob[:2] != b"\x1f\x8b":
        return [(bytes(blob), 0, len(blob))]
    out: list[tuple[bytes, int, int]] = []
    total = 0
    blob = bytes(blob)
    pos = 0
    while pos < len(blob):
        if blob[pos:pos + 2] != b"\x1f\x8b":
            raise WarcError(
                f"garbage between gzip members at byte {pos}"
            )
        dec = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            member = dec.decompress(blob[pos:], WARC_MAX_MEMBER_BYTES + 1)
        except zlib.error as e:
            raise WarcError(f"corrupt gzip member: {e}")
        if len(member) > WARC_MAX_MEMBER_BYTES or dec.unconsumed_tail:
            raise WarcBombError(
                f"gzip member inflates past {WARC_MAX_MEMBER_BYTES} bytes"
            )
        if not dec.eof:
            raise WarcError("truncated gzip member")
        total += len(member)
        if total > WARC_MAX_TOTAL_BYTES:
            raise WarcBombError(
                f"cumulative inflated bytes exceed {WARC_MAX_TOTAL_BYTES}"
            )
        clen = (len(blob) - pos) - len(dec.unused_data)
        out.append((member, pos, clen))
        pos += clen
    return out


def split_warc_members_indexed(
    blob: bytes,
) -> list[tuple[bytes, int, int]]:
    """Transport dispatch for one WARC file: ``.warc.gz`` (concatenated
    gzip members), ``.warc.zst`` (one zstd frame per record, skippable
    frames skipped — the IIPC warc.zst convention), or plain ``.warc``
    (the whole file as one member).  Each element is
    ``(payload, offset, compressed_length)``; zstd frames inherit the
    same per-member / cumulative bomb bounds as gzip members.  Frames
    requiring an external dictionary raise a typed
    ``UnsupportedCompressionError`` (dictionary warc.zst needs the
    dictionary frame's contents wired in; refuse loudly, never decode
    wrong)."""
    if blob[:2] == b"\x1f\x8b":
        return split_gzip_members_indexed(blob)
    if len(blob) >= 4:
        from ..operators.compress import (
            CompressBombError,
            ZSTD_MAGIC,
            ZSTD_MAGIC_SKIPPABLE_MAX,
            ZSTD_MAGIC_SKIPPABLE_MIN,
        )

        (magic,) = struct.unpack_from("<I", blob, 0)
        if magic == ZSTD_MAGIC or (
            ZSTD_MAGIC_SKIPPABLE_MIN <= magic <= ZSTD_MAGIC_SKIPPABLE_MAX
        ):
            # r12: frame extents come from the cheap header walk (no
            # entropy work), then each frame's payload inflates through
            # the native libzstd fast path in operators.compress —
            # ~50x over the pure decoder on the 100 TB intake path,
            # same typed errors and per-member / cumulative bounds.
            from ..operators.compress import decompress, zstd_frame_bounds

            members = []
            total = 0
            try:
                for start, end, _fcs, skippable in zstd_frame_bounds(blob):
                    if skippable:
                        continue
                    remaining = WARC_MAX_TOTAL_BYTES - total
                    if remaining <= 0:
                        raise WarcBombError(
                            f"zstd frames inflate past the cumulative "
                            f"{WARC_MAX_TOTAL_BYTES}-byte bound"
                        )
                    try:
                        payload = decompress(
                            blob[start:end],
                            "zstd",
                            max_output=min(WARC_MAX_MEMBER_BYTES, remaining),
                        )
                    except CompressBombError as e:
                        raise WarcBombError(
                            f"zstd frame inflates past "
                            f"{min(WARC_MAX_MEMBER_BYTES, remaining)} bytes: {e}"
                        ) from e
                    total += len(payload)
                    members.append((payload, start, end - start))
            except CompressBombError as e:
                raise WarcBombError(str(e)) from e
            return members
    return [(blob, 0, len(blob))]


def _parse_headers(block: bytes, what: str) -> tuple[str, dict]:
    """First line + case-insensitively keyed named headers."""
    try:
        head = block.decode("latin-1")
    except Exception:  # latin-1 never fails; defensive
        raise WarcError(f"{what}: undecodable header block")
    lines = head.split("\r\n")
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        if not ln:
            continue
        if ":" not in ln:
            raise WarcError(f"{what}: malformed header line {ln!r}")
        k, v = ln.split(":", 1)
        headers[k.strip().lower()] = v.strip()
    return lines[0], headers


def _dechunk(body: bytes) -> bytes:
    """Decode RFC 9112 §7.1 ``Transfer-Encoding: chunked`` framing —
    hex chunk-size lines (chunk extensions after ``;`` ignored), CRLF
    delimiters, a ``0`` terminator chunk, optional trailers tolerated.
    Output is strictly smaller than input (framing removed), so no
    separate bomb bound is needed. Malformed framing is a typed
    :class:`WarcError` for on_error='report' row isolation."""
    out = bytearray()
    i = 0
    while True:
        j = body.find(b"\r\n", i)
        if j < 0:
            raise WarcError(
                "chunked payload: missing chunk-size line terminator"
            )
        line = body[i:j].split(b";", 1)[0].strip()
        try:
            size = int(line, 16)
        except ValueError:
            raise WarcError(
                f"chunked payload: bad chunk size {line[:24]!r}"
            )
        if size < 0:
            raise WarcError(f"chunked payload: negative chunk size {size}")
        i = j + 2
        if size == 0:
            # trailer section (rare) ends at a blank line; anything
            # there is metadata, not payload — ignore it
            return bytes(out)
        chunk = body[i:i + size]
        if len(chunk) != size:
            raise WarcError(
                f"chunked payload: truncated chunk "
                f"({len(chunk)} < {size} bytes)"
            )
        out += chunk
        i += size
        if body[i:i + 2] != b"\r\n":
            raise WarcError("chunked payload: missing chunk-data CRLF")
        i += 2


def _inflate_deflate(blob: bytes, max_output: int) -> bytes:
    """HTTP ``Content-Encoding: deflate`` — RFC-correct servers send
    zlib-wrapped (RFC 1950) data, but raw-deflate senders are a
    well-known reality (the reason every browser tries both). Bounded
    like the gzip path."""
    for wbits in (zlib.MAX_WBITS, -zlib.MAX_WBITS):
        dec = zlib.decompressobj(wbits)
        try:
            out = dec.decompress(blob, max_output + 1)
        except zlib.error:
            continue
        if len(out) > max_output:
            raise WarcBombError(
                f"deflate payload inflates past {max_output} bytes"
            )
        if dec.eof and not dec.unused_data:
            return out
    raise WarcError("deflate payload: corrupt stream")


def _decode_http_payload(
    payload: bytes, http_headers: dict
) -> tuple[bytes, str | None, str | None]:
    """Undo the HTTP transfer/content codings on a stored payload —
    real crawl WARCs store the bytes AS SENT (chunk framing digits,
    gzip/deflate streams), and flowing those into html_text/dedup as
    document text is silent corruption. Returns (decoded bytes,
    transfer_encoding, content_encoding) with the raw header values
    surfaced as audit columns. ``br`` (RFC 7932 — what most
    Cloudflare-fronted sites actually serve) decodes through the
    canonical-lib fast path (pyarrow brotli, bounded reads, r14);
    genuinely unsupported codings raise a typed WarcError so report
    mode isolates the row instead of emitting compressed bytes as
    text."""
    te = http_headers.get("transfer-encoding")
    ce = http_headers.get("content-encoding")
    if payload and te:
        for t in reversed([s.strip().lower() for s in te.split(",")]):
            if t == "chunked":
                payload = _dechunk(payload)
            elif t in ("identity", ""):
                pass
            else:
                raise WarcError(f"unsupported Transfer-Encoding {t!r}")
    if payload and ce:
        from ..operators.compress import CompressError, decompress

        for c in reversed([s.strip().lower() for s in ce.split(",")]):
            if c in ("gzip", "x-gzip"):
                try:
                    payload = decompress(
                        payload, "gzip",
                        max_output=WARC_MAX_MEMBER_BYTES,
                    )
                except CompressError as e:
                    raise WarcError(f"gzip payload: {e}") from e
            elif c == "deflate":
                payload = _inflate_deflate(
                    payload, WARC_MAX_MEMBER_BYTES
                )
            elif c == "br":
                try:
                    payload = decompress(
                        payload, "brotli",
                        max_output=WARC_MAX_MEMBER_BYTES,
                    )
                except CompressError as e:
                    # includes the typed refusal when pyarrow lacks
                    # the brotli codec — either way one error row,
                    # never compressed bytes flowing on as text
                    raise WarcError(f"br payload: {e}") from e
            elif c in ("identity", ""):
                pass
            else:
                raise WarcError(f"unsupported Content-Encoding {c!r}")
    return payload, te, ce


def parse_warc_record(member: bytes) -> dict:
    """Parse ONE WARC record (= one gzip member's payload).

    Returns dict with: ``warc_type``, ``record_id``, ``date``,
    ``target_uri``, ``http_status`` (int or None), ``mime`` (HTTP
    Content-Type or None), ``payload`` (bytes, HTTP transfer/content
    codings decoded), ``digest_ok`` (bool or None when the record
    carries no payload digest — always None for ``revisit``, whose
    payload lives in the referred record), ``refers_to`` /
    ``payload_digest`` (revisit resolution keys), and the
    ``transfer_encoding`` / ``content_encoding`` audit values."""
    rec, used = _parse_one(member)
    rest = member[used:]
    if rest.strip(b"\r\n"):
        raise WarcError(
            f"{len(rest)} trailing bytes after the record (did you mean"
            " parse_warc, which walks multi-record data?)"
        )
    return rec


def _parse_one(member: bytes) -> tuple[dict, int]:
    """Parse the record at the START of ``member``; also return how many
    bytes it consumed (record + the \\r\\n\\r\\n record separator), so
    plain multi-record .warc data can be walked frame by frame."""
    sep = member.find(b"\r\n\r\n")
    if sep < 0:
        raise WarcError("record has no header terminator")
    version, headers = _parse_headers(member[:sep], "warc record")
    if not version.startswith("WARC/"):
        raise WarcError(f"bad WARC version line {version!r}")
    if version not in ("WARC/1.0", "WARC/1.1"):
        raise WarcError(f"unsupported WARC version {version!r}")
    try:
        length = int(headers["content-length"])
    except KeyError:
        raise WarcError("record missing Content-Length")
    except ValueError:
        raise WarcError(
            f"bad Content-Length {headers['content-length']!r}"
        )
    block = member[sep + 4:sep + 4 + length]
    if len(block) != length:
        raise WarcError(
            f"record block truncated ({len(block)} < {length} bytes)"
        )
    wtype = headers.get("warc-type", "")
    http_status = None
    mime = None
    location = None
    tenc = None
    cenc = None
    payload = block
    # revisit (the Common Crawl dedup convention): the block carries
    # the new response's HTTP HEAD only — the payload lives in the
    # record named by WARC-Refers-To, claimed by WARC-Payload-Digest
    if wtype in ("response", "request", "revisit") and headers.get(
        "content-type", ""
    ).startswith("application/http"):
        hsep = block.find(b"\r\n\r\n")
        if hsep < 0:
            raise WarcError("http block has no header terminator")
        status_line, http_headers = _parse_headers(block[:hsep], "http")
        parts = status_line.split(None, 2)
        if wtype in ("response", "revisit"):
            if len(parts) < 2 or not parts[0].startswith("HTTP/"):
                raise WarcError(f"bad HTTP status line {status_line!r}")
            try:
                http_status = int(parts[1])
            except ValueError:
                raise WarcError(f"bad HTTP status {parts[1]!r}")
        mime = http_headers.get("content-type")
        location = http_headers.get("location")  # 3xx redirect target
        payload = block[hsep + 4:]
        stored_payload = payload
        # the payload digest covers the STORED bytes (the WARC spec's
        # "payload" is the record's own content), so verify BEFORE
        # undoing the HTTP codings
        payload, tenc, cenc = _decode_http_payload(payload, http_headers)
    else:
        stored_payload = payload
    if mime is None and wtype not in ("response", "request"):
        # conversion/warcinfo/metadata records type their block at the
        # WARC level (WET files: text/plain)
        mime = headers.get("content-type")
    digest_ok = None
    want = headers.get("warc-payload-digest")
    if want is not None and wtype != "revisit":
        if not want.startswith("sha1:"):
            raise WarcError(f"unsupported payload digest {want!r}")
        got = base64.b32encode(
            hashlib.sha1(stored_payload).digest()
        ).decode("ascii")
        digest_ok = got == want[5:]
    elif want is None and "warc-block-digest" in headers:
        # WET conversion records carry a block digest instead
        bwant = headers["warc-block-digest"]
        if not bwant.startswith("sha1:"):
            raise WarcError(f"unsupported block digest {bwant!r}")
        got = base64.b32encode(
            hashlib.sha1(block).digest()
        ).decode("ascii")
        digest_ok = got == bwant[5:]
    rec = {
        "warc_type": wtype,
        "record_id": headers.get("warc-record-id", ""),
        "date": headers.get("warc-date", ""),
        "target_uri": headers.get("warc-target-uri", ""),
        "http_status": http_status,
        "mime": mime,
        "location": location,
        "payload": payload,
        "digest_ok": digest_ok,
        "refers_to": headers.get("warc-refers-to"),
        "payload_digest": want,
        "transfer_encoding": tenc,
        "content_encoding": cenc,
        # the CC convention truncates payloads at a size cap and marks
        # WARC-Truncated: length — a truncated page is NOT the document
        # (dedup fingerprints and quality signals on it are wrong), so
        # the reason must ride the row for consumers to filter on
        "truncated": headers.get("warc-truncated"),
    }
    used = sep + 4 + length
    # consume the two CRLFs separating records (tolerate their absence
    # at end-of-data)
    for _ in range(2):
        if member[used:used + 2] == b"\r\n":
            used += 2
    return rec, used


def parse_warc(blob: bytes) -> list[dict]:
    """All records of one WARC file — gzipped (one or more records per
    member), zstd-framed (.warc.zst) or plain — in file order, each
    dict as :func:`parse_warc_record` plus ``pos``."""
    out = []
    for member, _, _ in split_warc_members_indexed(blob):
        while member.strip(b"\r\n"):
            rec, used = _parse_one(member)
            rec["pos"] = len(out)
            out.append(rec)
            member = member[used:]
    return out


WARC_RECORD_SCHEMA = (
    "file_id long, pos int, warc_type string, record_id string,"
    " date string, target_uri string, http_status int, mime string,"
    " location string, payload binary, payload_len int,"
    " digest_ok boolean, refers_to string, payload_digest string,"
    " transfer_encoding string, content_encoding string,"
    " truncated string"
)


def warc_records(
    files: DataFrame,
    id_col: str = "file_id",
    content_col: str = "content",
    on_error: str = "report",
    max_file_bytes: int = WARC_MAX_FILE_BYTES,
) -> DataFrame:
    """Distributed WARC record extraction: one row in (id, .warc.gz
    bytes) → one row out PER RECORD. At 100 TB this is the crawl-intake
    stage: a ``binaryFile`` scan of the archive feeds this operator and
    every downstream text/dedup/quality stage sees plain (uri, payload)
    rows. Parallelism is per-FILE (WARC files are the crawl's natural
    ~1 GB work units); ``repartition`` the file catalog before this
    stage when the source listing is skewed.

    ``on_error='report'`` (default) appends an ``error`` column — a
    truncated or bomb-bounded file yields ONE error row (pos NULL) and
    the rest of the corpus proceeds; ``'raise'`` keeps the strict
    contract and omits the column."""
    if on_error not in ("raise", "report"):
        raise ValueError(
            f"on_error must be 'raise' or 'report', not {on_error!r}"
        )
    report = on_error == "report"

    src = files.select(
        F.col(id_col).alias("file_id"), F.col(content_col).alias("_blob")
    )
    cols = [
        "file_id", "pos", "warc_type", "record_id", "date", "target_uri",
        "http_status", "mime", "location", "payload", "payload_len",
        "digest_ok", "refers_to", "payload_digest",
        "transfer_encoding", "content_encoding", "truncated",
    ] + (["error"] if report else [])

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fid, blob in zip(pdf["file_id"], pdf["_blob"]):
                try:
                    _check_file_size(blob, max_file_bytes)
                    for r in parse_warc(bytes(blob)):
                        rows.append({
                            "file_id": fid,
                            "pos": r["pos"],
                            "warc_type": r["warc_type"],
                            "record_id": r["record_id"],
                            "date": r["date"],
                            "target_uri": r["target_uri"],
                            "http_status": r["http_status"],
                            "mime": r["mime"],
                            "location": r["location"],
                            "payload": bytearray(r["payload"]),
                            "payload_len": len(r["payload"]),
                            "digest_ok": r["digest_ok"],
                            "refers_to": r["refers_to"],
                            "payload_digest": r["payload_digest"],
                            "transfer_encoding": r["transfer_encoding"],
                            "content_encoding": r["content_encoding"],
                            "truncated": r["truncated"],
                            **({"error": None} if report else {}),
                        })
                except Exception as e:
                    if not report:
                        raise
                    row = {c: None for c in cols}
                    row["file_id"] = fid
                    row["error"] = f"{type(e).__name__}: {e}"
                    rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    schema = WARC_RECORD_SCHEMA + (", error string" if report else "")
    return src.mapInPandas(run, schema=schema)


def resolve_revisits(records: DataFrame, payload: bool = True) -> DataFrame:
    """Resolve WARC ``revisit`` records against their referents — the
    Common Crawl dedup convention read back: a revisit stores NO body,
    only ``WARC-Refers-To`` (the referent's record id) and
    ``WARC-Payload-Digest`` (the referent content's sha1). One row out
    per revisit row in ``records`` (a :func:`warc_records` frame):

    - ``file_id``/``pos``/``target_uri``/``refers_to``/
      ``payload_digest`` — the revisit's own identity;
    - ``ref_file_id``/``ref_pos``/``resolved_uri`` (+
      ``resolved_payload`` unless ``payload=False``) — the referent
      response, NULL when it lives outside this corpus (revisits may
      point across archives; resolve against the widest frame you
      have);
    - ``digest_match`` — the revisit's claimed digest equals the
      referent's verified one (NULL when unresolved): the cheap
      cross-check that the dedup pointer is not stale.

    Scale shape: one equi-join on ``record_id`` (globally unique by
    the WARC spec) — the revisit side of a real crawl is a small
    fraction of records, so AQE broadcasts it; no all-pairs anywhere.
    Reference analogue: the reference resolves its lineage pointers
    the same way (tre_lib message UUID references, message.py:31-170),
    re-expressed as a DataFrame join."""
    rev = records.filter(F.col("warc_type") == "revisit").select(
        "file_id", "pos", "target_uri", "refers_to", "payload_digest"
    )
    ref_cols = [
        F.col("record_id").alias("refers_to"),
        F.col("file_id").alias("ref_file_id"),
        F.col("pos").alias("ref_pos"),
        F.col("target_uri").alias("resolved_uri"),
        F.col("payload_digest").alias("_ref_digest"),
    ]
    if payload:
        ref_cols.append(F.col("payload").alias("resolved_payload"))
    ref = records.filter(F.col("warc_type") == "response").select(*ref_cols)
    return (
        rev.join(ref, "refers_to", "left")
        .withColumn(
            "digest_match",
            F.when(
                F.col("_ref_digest").isNotNull(),
                F.col("payload_digest") == F.col("_ref_digest"),
            ),
        )
        .drop("_ref_digest")
    )


# --------------------------------------------------------------------------
# Encoder twin


def _gzip_member(data: bytes) -> bytes:
    """One deterministic gzip member (pinned mtime=0, no name, XFL=0)."""
    co = zlib.compressobj(6, zlib.DEFLATED, -zlib.MAX_WBITS)
    body = co.compress(data) + co.flush()
    header = b"\x1f\x8b\x08\x00" + struct.pack("<I", 0) + b"\x00\xff"
    return (
        header + body
        + struct.pack("<I", zlib.crc32(data) & 0xFFFFFFFF)
        + struct.pack("<I", len(data) & 0xFFFFFFFF)
    )


def _zst_members(members: list[bytes]) -> bytes:
    """Assemble the IIPC ``.warc.zst`` layout from raw records: the
    leading SKIPPABLE frame (where real archives store the shared
    dictionary — empty marker here; dictionary-less is the supported
    path) then one zstd frame per record.  Frames come from the
    stdlib store-mode writer (operators.compress.zstd_compress_store
    — legal RFC 8878 frames any conforming decoder reads, no pyarrow
    needed executor-side); the engine's own reader takes them through
    the same split_warc_members_indexed path as libzstd output."""
    from ..operators.compress import zstd_compress_store

    out = bytearray(struct.pack("<II", 0x184D2A50, 0))
    for m in members:
        out += zstd_compress_store(m)
    return bytes(out)


def _pack_members(
    members: list[bytes], gzip_members: bool, transport: str | None
) -> bytes:
    """Shared transport dispatch for the WARC-family builders:
    ``transport`` of ``'gz'`` / ``'zst'`` / ``'plain'`` wins when
    given; otherwise the legacy ``gzip_members`` bool picks gz or
    plain."""
    if transport is None:
        transport = "gz" if gzip_members else "plain"
    if transport == "zst":
        return _zst_members(members)
    if transport == "gz":
        return b"".join(_gzip_member(m) for m in members)
    if transport == "plain":
        return b"".join(members)
    raise ValueError(
        f"transport must be 'gz', 'zst' or 'plain', got {transport!r}"
    )


def _record(headers: list[tuple[str, str]], block: bytes) -> bytes:
    head = "".join(f"{k}: {v}\r\n" for k, v in headers)
    return (
        b"WARC/1.0\r\n" + head.encode("latin-1")
        + b"Content-Length: %d\r\n\r\n" % len(block)
        + block + b"\r\n\r\n"
    )


def build_warc_gz(
    responses: list[dict],
    filename: str = "crawl.warc.gz",
    gzip_members: bool = True,
) -> bytes:
    """Assemble a real .warc.gz file: a ``warcinfo`` record then one
    ``response`` record per entry, each its own gzip member.

    Each response dict: ``url``, ``date`` (ISO-8601 Z), ``payload``
    (bytes), optional ``status`` (default 200), ``content_type``
    (default text/html), ``location`` (emits the ``Location`` header a
    3xx redirect carries), ``record_id``. Digests are genuine sha1
    over the payload; everything is deterministic.

    Real-crawl payload regimes (r13 — so oracles exercise what
    production WARCs actually contain):

    - ``content_encoding``: ``'gzip'``, ``'deflate'`` or ``'br'`` (r14)
      — the body is stored compressed with a matching
      ``Content-Encoding`` header (deterministic: pinned-mtime gzip
      member / zlib level 6 / single-shot pyarrow brotli);
    - ``transfer_encoding``: ``'chunked'`` — the (possibly encoded)
      body is stored in RFC 9112 chunk framing (fixed 57-byte chunks,
      a chunk extension on the first chunk for parser coverage) with
      ``Transfer-Encoding: chunked`` and NO Content-Length;
    - ``warc_type``: ``'revisit'`` — emits a Common-Crawl-convention
      identical-payload-digest revisit: the block is the HTTP HEAD
      only, ``WARC-Refers-To`` names ``refers_to``, and
      ``WARC-Payload-Digest`` is the sha1 of ``payload`` (the referred
      content, used ONLY for the digest — not stored).

    The WARC-Payload-Digest always covers the STORED bytes (for
    revisits: the referred bytes), matching the parser's
    verify-before-decode contract."""
    members = _build_warc_members(responses, filename)
    if gzip_members:
        return b"".join(_gzip_member(m) for m in members)
    return b"".join(members)


def _build_warc_members(responses: list[dict], filename: str) -> list[bytes]:
    """:func:`build_warc_gz`'s record list, factored out (r15-opt) so
    :func:`build_warc_zst` frames the SAME records without re-parsing
    the joined plain stream to recover their bounds — the parse was
    ~40% of every build_warc_zst call."""
    members = []
    info_body = (
        b"software: da-transform-judgments-pipeline-spark\r\n"
        b"format: WARC File Format 1.0\r\n"
    )
    members.append(_record(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-000000000000>"),
            ("WARC-Date", "2021-03-04T05:06:07Z"),
            ("WARC-Filename", filename),
            ("Content-Type", "application/warc-fields"),
        ],
        info_body,
    ))
    for i, r in enumerate(responses):
        payload = bytes(r["payload"])
        status = int(r.get("status", 200))
        ctype = r.get("content_type", "text/html")
        reason = {200: "OK", 404: "Not Found", 301: "Moved Permanently",
                  302: "Found", 304: "Not Modified",
                  500: "Internal Server Error"}.get(status, "Status")
        loc = r.get("location")
        loc_hdr = f"Location: {loc}\r\n" if loc else ""
        rid = r.get(
            "record_id",
            f"<urn:uuid:00000000-0000-0000-0000-{i + 1:012d}>",
        )
        digest = base64.b32encode(
            hashlib.sha1(payload).digest()
        ).decode("ascii")
        if r.get("warc_type") == "revisit":
            # identical-payload-digest revisit: HTTP head only — the
            # digest names the referred record's bytes
            http = (
                f"HTTP/1.1 {status} {reason}\r\n"
                f"Content-Type: {ctype}\r\n{loc_hdr}\r\n"
            ).encode("latin-1")
            members.append(_record(
                [
                    ("WARC-Type", "revisit"),
                    ("WARC-Record-ID", rid),
                    ("WARC-Date", r["date"]),
                    ("WARC-Target-URI", r["url"]),
                    ("WARC-Refers-To", r["refers_to"]),
                    ("WARC-Profile",
                     "http://netpreserve.org/warc/1.0/revisit/"
                     "identical-payload-digest"),
                    ("WARC-Payload-Digest", f"sha1:{digest}"),
                    ("Content-Type",
                     "application/http; msgtype=response"),
                ],
                http,
            ))
            continue
        body = payload
        enc_hdr = ""
        cenc = r.get("content_encoding")
        if cenc == "gzip":
            body = _gzip_member(body)
            enc_hdr = "Content-Encoding: gzip\r\n"
        elif cenc == "deflate":
            body = zlib.compress(body, 6)
            enc_hdr = "Content-Encoding: deflate\r\n"
        elif cenc == "br":
            # canonical brotli via pyarrow (deterministic single-shot
            # encode) — the r14 regime the decoder's br path reads
            import pyarrow as pa

            body = pa.Codec("brotli").compress(body, asbytes=True)
            enc_hdr = "Content-Encoding: br\r\n"
        elif cenc is not None:
            raise ValueError(f"unsupported content_encoding {cenc!r}")
        tenc = r.get("transfer_encoding")
        if tenc == "chunked":
            chunks = [body[o:o + 57] for o in range(0, len(body), 57)]
            framed = bytearray()
            for n, ch in enumerate(chunks):
                ext = b";x=1" if n == 0 else b""
                framed += f"{len(ch):x}".encode() + ext + b"\r\n"
                framed += ch + b"\r\n"
            framed += b"0\r\n\r\n"
            body = bytes(framed)
            frame_hdr = "Transfer-Encoding: chunked\r\n"
        elif tenc is not None:
            raise ValueError(f"unsupported transfer_encoding {tenc!r}")
        else:
            frame_hdr = f"Content-Length: {len(body)}\r\n"
        stored_digest = base64.b32encode(
            hashlib.sha1(body).digest()
        ).decode("ascii")
        http = (
            f"HTTP/1.1 {status} {reason}\r\n"
            f"Content-Type: {ctype}\r\n{loc_hdr}{enc_hdr}"
            f"{frame_hdr}\r\n"
        ).encode("latin-1") + body
        warc_headers = [
            ("WARC-Type", "response"),
            ("WARC-Record-ID", rid),
            ("WARC-Date", r["date"]),
            ("WARC-Target-URI", r["url"]),
            ("WARC-Payload-Digest", f"sha1:{stored_digest}"),
        ]
        if r.get("truncated"):
            # CC convention: payload cut at the crawler's size cap —
            # the caller passes the ALREADY-truncated payload; the
            # digest covers the stored (truncated) bytes, per spec
            warc_headers.append(("WARC-Truncated", r["truncated"]))
        warc_headers.append(
            ("Content-Type", "application/http; msgtype=response")
        )
        members.append(_record(warc_headers, http))
    return members


def build_warc_zst(
    responses: list[dict],
    filename: str = "crawl.warc.zst",
    level: int = 3,
    leading_skippable: bool = True,
) -> bytes:
    """The ``.warc.zst`` twin of :func:`build_warc_gz`: identical
    records, one zstd frame per record (the IIPC warc.zst layout),
    optionally preceded by a skippable frame where real archives store
    the shared dictionary (here: an empty marker — dictionary-less
    archives are the supported decode path).  Frames are produced by
    the REAL libzstd (via ``pyarrow.Codec``), so reading this file
    exercises the pure-stdlib zstd decoder against canonical encoder
    output, not a twin that could share a bug."""
    import pyarrow as pa

    # the records build_warc_gz assembles, taken directly from the
    # shared builder (r15-opt: this used to re-parse the joined plain
    # stream with _parse_one to recover each record's bounds)
    records = _build_warc_members(responses, filename)
    codec = pa.Codec("zstd", compression_level=level)
    out = bytearray()
    if leading_skippable:
        out += struct.pack("<II", 0x184D2A50, 0)
    for rec in records:
        out += codec.compress(rec, asbytes=True)
    return bytes(out)


def build_wet(
    conversions: list[dict],
    filename: str = "crawl.warc.wet.gz",
    gzip_members: bool = True,
    transport: str | None = None,
) -> bytes:
    """Assemble a real WET file (the Common Crawl extracted-text
    derivative): a ``warcinfo`` record then one ``conversion`` record
    per entry — ``WARC-Refers-To`` back to the source response record,
    a genuine sha1 ``WARC-Block-Digest`` over the text bytes, WARC-level
    ``Content-Type: text/plain`` — each its own gzip member, fully
    deterministic.

    Each conversion dict: ``url``, ``date``, ``text`` (str), optional
    ``refers_to`` (source record id) and ``record_id``."""
    members = []
    members.append(_record(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Record-ID",
             "<urn:uuid:00000000-0000-0000-0001-000000000000>"),
            ("WARC-Date", "2021-03-04T05:06:07Z"),
            ("WARC-Filename", filename),
            ("Content-Type", "application/warc-fields"),
        ],
        b"software: da-transform-judgments-pipeline-spark\r\n"
        b"format: WARC File Format 1.0\r\n"
        b"conformsTo: conversion (WET)\r\n",
    ))
    for i, c in enumerate(conversions):
        block = c["text"].encode("utf-8")
        digest = base64.b32encode(hashlib.sha1(block).digest()).decode(
            "ascii"
        )
        headers = [
            ("WARC-Type", "conversion"),
            ("WARC-Record-ID", c.get(
                "record_id",
                f"<urn:uuid:00000000-0000-0000-0001-{i + 1:012d}>",
            )),
            ("WARC-Date", c["date"]),
            ("WARC-Target-URI", c["url"]),
        ]
        if c.get("refers_to"):
            headers.append(("WARC-Refers-To", c["refers_to"]))
        headers += [
            ("WARC-Block-Digest", f"sha1:{digest}"),
            ("Content-Type", "text/plain"),
        ]
        members.append(_record(headers, block))
    return _pack_members(members, gzip_members, transport)


def build_wat(
    pages: list[dict],
    filename: str = "crawl.warc.wat.gz",
    gzip_members: bool = True,
    transport: str | None = None,
) -> bytes:
    """Assemble a real WAT file (the Common Crawl metadata derivative):
    a ``warcinfo`` record then one ``metadata`` record per page whose
    block is a DETERMINISTIC JSON envelope (sorted keys, compact
    separators — byte-stable across runs) in the CC WAT shape:
    WARC-Header-Metadata + HTTP-Response-Metadata with the page's
    extracted outlinks under HTML-Metadata/Links.  Each record carries
    ``WARC-Refers-To`` lineage and a genuine sha1 block digest.

    Each page dict: ``url``, ``date``, optional ``status`` (int),
    ``links`` (list of str), ``refers_to``, ``record_id``."""
    import json as _json

    members = []
    members.append(_record(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Record-ID",
             "<urn:uuid:00000000-0000-0000-0002-000000000000>"),
            ("WARC-Date", "2021-03-04T05:06:07Z"),
            ("WARC-Filename", filename),
            ("Content-Type", "application/warc-fields"),
        ],
        b"software: da-transform-judgments-pipeline-spark\r\n"
        b"format: WARC File Format 1.0\r\n"
        b"conformsTo: metadata (WAT)\r\n",
    ))
    for i, p in enumerate(pages):
        envelope = {
            "Envelope": {
                "WARC-Header-Metadata": {
                    "WARC-Type": "response",
                    "WARC-Target-URI": p["url"],
                    "WARC-Date": p["date"],
                },
                "Payload-Metadata": {
                    "HTTP-Response-Metadata": {
                        "Response-Message": {
                            "Status": str(p.get("status", 200)),
                        },
                        "HTML-Metadata": {
                            "Links": [
                                {"path": "A@/href", "url": u}
                                for u in (p.get("links") or [])
                            ],
                        },
                    },
                },
            },
        }
        block = _json.dumps(
            envelope, sort_keys=True, separators=(",", ":")
        ).encode("utf-8")
        digest = base64.b32encode(hashlib.sha1(block).digest()).decode(
            "ascii"
        )
        headers = [
            ("WARC-Type", "metadata"),
            ("WARC-Record-ID", p.get(
                "record_id",
                f"<urn:uuid:00000000-0000-0000-0002-{i + 1:012d}>",
            )),
            ("WARC-Date", p["date"]),
            ("WARC-Target-URI", p["url"]),
        ]
        if p.get("refers_to"):
            headers.append(("WARC-Refers-To", p["refers_to"]))
        headers += [
            ("WARC-Block-Digest", f"sha1:{digest}"),
            ("Content-Type", "application/json"),
        ]
        members.append(_record(headers, block))
    return _pack_members(members, gzip_members, transport)


def _pack_by_file(
    records: DataFrame, cols: dict, row_to_entry, builder
) -> DataFrame:
    """Shared engine of :func:`wet_pack` / :func:`wat_pack`: co-locate
    rows by file id (ONE hash repartition — the only shuffle), sort
    within partitions so each file's rows are contiguous and ordered,
    then walk Arrow batches with a one-group CARRYOVER (a file's rows
    may straddle batch boundaries).  Compared to
    ``groupBy().applyInPandas`` this amortizes the per-group pandas
    overhead across every archive in the batch — measured 10x+ on a
    5000-small-archive corpus — while holding at most one batch plus
    one archive's rows in memory (an archive must fit in task RAM
    anyway to be packed)."""
    select = [F.col(c).alias(a) for c, a in cols.items()]
    # Pin the shuffle's partition COUNT (r14-opt): a bare
    # ``repartition("_fid")`` lets AQE coalesce by BYTES, and the pack
    # stage's cost is per-FILE Python work, not bytes — at bench SF the
    # few-MB shuffle coalesced to ONE partition and serialized the
    # whole pack (measured 2.9 s of the 5 s m25 pipeline). One
    # partition per core is the floor for a CPU-bound Python stage; at
    # real scale (~1 GB archives) the byte sizes dominate and this
    # count matches what AQE would pick anyway.
    sc = records.sparkSession.sparkContext
    src = (
        records.select(*select)
        .repartition(sc.defaultParallelism, "_fid")
        .sortWithinPartitions("_fid", "_ord")
    )

    def run(batches):
        import pandas as pd

        def emit(pdf):
            out_ids, out_blobs = [], []
            for fid, grp in pdf.groupby("_fid", sort=False):
                entries = [row_to_entry(row) for row in
                           grp.to_dict("records")]
                out_ids.append(fid)
                out_blobs.append(bytearray(builder(entries)))
            return pd.DataFrame(
                {"file_id": out_ids, "content": out_blobs}
            )

        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            last = pdf["_fid"].iloc[-1]
            mask = pdf["_fid"] == last
            carry = pdf[mask]
            rest = pdf[~mask]
            if len(rest):
                yield emit(rest)
        if carry is not None and len(carry):
            yield emit(carry)

    return src.mapInPandas(run, "file_id long, content binary")


def wat_pack(
    records: DataFrame,
    id_col: str = "file_id",
    uri_col: str = "target_uri",
    links_col: str = "links",
    status_col: str = "http_status",
    date_col: str = "date",
    refers_col: str = "record_id",
    order_col: str = "pos",
    transport: str = "gz",
) -> DataFrame:
    """Pack page metadata into WAT files, one per source WARC — the
    metadata twin of :func:`wet_pack` (same single-shuffle
    pack-by-file engine).  ``links_col`` is an array<string> of the
    page's extracted outlinks.  ``transport``: ``'gz'`` (default,
    per-record gzip members) or ``'zst'`` (per-record store-mode zstd
    frames behind the IIPC skippable-frame lead) — the engine WRITES
    both transports it reads."""
    import functools

    return _pack_by_file(
        records,
        {
            id_col: "_fid", uri_col: "_uri", links_col: "_links",
            status_col: "_status", date_col: "_date",
            refers_col: "_ref", order_col: "_ord",
        },
        lambda r: {
            "url": r["_uri"],
            "date": r["_date"],
            "status": int(r["_status"]) if r["_status"] is not None else 200,
            "links": list(r["_links"]) if r["_links"] is not None else [],
            "refers_to": r["_ref"],
        },
        functools.partial(build_wat, transport=transport),
    )


def wet_pack(
    records: DataFrame,
    id_col: str = "file_id",
    uri_col: str = "target_uri",
    text_col: str = "text",
    date_col: str = "date",
    refers_col: str = "record_id",
    order_col: str = "pos",
    transport: str = "gz",
) -> DataFrame:
    """Pack extracted text back into WET files, one per source WARC:
    ``(file_id, ...)`` record rows in -> ``(file_id, content)`` out,
    where ``content`` is a real per-record-gzip-member ``.warc.wet.gz``
    built by :func:`build_wet` (conversion records with WARC-Refers-To
    lineage and genuine block digests).

    The WET derivation is embarrassingly parallel per archive (the
    Common Crawl job shape: response WARC in, same-named WET out): one
    repartition on the file id is the only shuffle, rows are sorted
    within partitions so output bytes are deterministic, and the
    pack-by-file engine amortizes pandas overhead across archives.
    ``transport``: ``'gz'`` (default) or ``'zst'`` — see
    :func:`wat_pack`."""
    import functools

    return _pack_by_file(
        records,
        {
            id_col: "_fid", uri_col: "_uri", text_col: "_text",
            date_col: "_date", refers_col: "_ref", order_col: "_ord",
        },
        lambda r: {
            "url": r["_uri"],
            "date": r["_date"],
            "text": r["_text"] if r["_text"] is not None else "",
            "refers_to": r["_ref"],
        },
        functools.partial(build_wet, transport=transport),
    )


WARC_CDX_SCHEMA = (
    "file_id long, pos int, target_uri string, warc_type string,"
    " offset long, length long, member_pos int, payload_digest string,"
    " http_status int"
)


def warc_cdx(
    files: DataFrame,
    id_col: str = "file_id",
    content_col: str = "content",
    on_error: str = "report",
    max_file_bytes: int = WARC_MAX_FILE_BYTES,
) -> DataFrame:
    """Build the CDX-style random-access index of a WARC corpus: one row
    per record with the COMPRESSED byte range (offset, length) of its
    gzip member inside the file — the structure that lets a petabyte
    archive serve any single record with one ranged GET + one small
    inflate instead of a full-file scan (what makes WARC corpora
    seekable at 100 TB; pair with :func:`fetch_warc_record`). Digest
    and HTTP status ride along so the index doubles as a fetch-free
    integrity/quality surface.

    Every record is indexed, including spec-conforming .warc.gz files
    with several records per gzip member and plain uncompressed .warc
    (one member holding the whole file): such records share their
    member's (offset, length) and are disambiguated by ``member_pos``
    (record index within the member, 0 for the per-record-member
    Common Crawl convention)."""
    if on_error not in ("raise", "report"):
        raise ValueError(
            f"on_error must be 'raise' or 'report', not {on_error!r}"
        )
    report = on_error == "report"

    src = files.select(
        F.col(id_col).alias("file_id"), F.col(content_col).alias("_blob")
    )
    cols = [
        "file_id", "pos", "target_uri", "warc_type", "offset", "length",
        "member_pos", "payload_digest", "http_status",
    ] + (["error"] if report else [])

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fid, blob in zip(pdf["file_id"], pdf["_blob"]):
                try:
                    _check_file_size(blob, max_file_bytes)
                    pos = 0
                    for member, off, clen in split_warc_members_indexed(
                        bytes(blob)
                    ):
                        mpos = 0
                        while member.strip(b"\r\n"):
                            rec, used = _parse_one(member)
                            rows.append({
                                "file_id": fid,
                                "pos": pos,
                                "target_uri": rec["target_uri"],
                                "warc_type": rec["warc_type"],
                                "offset": off,
                                "length": clen,
                                "member_pos": mpos,
                                "payload_digest": base64.b32encode(
                                    hashlib.sha1(rec["payload"]).digest()
                                ).decode("ascii"),
                                "http_status": rec["http_status"],
                                **({"error": None} if report else {}),
                            })
                            pos += 1
                            mpos += 1
                            member = member[used:]
                except Exception as e:
                    if not report:
                        raise
                    row = {c: None for c in cols}
                    row["file_id"] = fid
                    row["error"] = f"{type(e).__name__}: {e}"
                    rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    schema = WARC_CDX_SCHEMA + (", error string" if report else "")
    return src.mapInPandas(run, schema=schema)


def write_cdx_surt(
    cdx: DataFrame,
    path: str,
    target_file_mb: int = 256,
    mode: str = "error",
) -> int:
    """Materialize a :func:`warc_cdx` index in the SURT-ordered layout
    (r14 — the composition f06 + s28 were built for): add the
    ``surt`` column (:func:`..functions.strings.surt_key` over
    ``target_uri`` — host labels reversed, the Common Crawl
    ``url_surtkey`` convention) and write it range-partitioned and
    file-sorted on ``(surt, file_id, pos)`` via
    :func:`..sources.sinks.write_sorted_parquet`.

    This is the concrete 100 TB random-access story: lexicographic
    SURT order lays every page of a domain — then of each subdomain —
    CONTIGUOUSLY, so "all records under example.com" becomes a prefix
    range over the sorted index; with disjoint per-file key ranges the
    parquet footer stats prune the scan to the few files whose range
    intersects the prefix (layout-asserted in pytest), and each hit
    row then serves its record with one ranged GET
    (:func:`fetch_warc_record`). Error rows (NULL target_uri in
    report mode) sort first under a NULL key rather than being
    dropped. Returns the partition/file count used."""
    from ..functions.strings import surt_key
    from .sinks import write_sorted_parquet

    keyed = cdx.withColumn("surt", surt_key("target_uri"))
    return write_sorted_parquet(
        keyed, path, ["surt", "file_id", "pos"],
        target_file_mb=target_file_mb, mode=mode,
    )


def fetch_warc_record(
    blob: bytes, offset: int, length: int, member_pos: int = 0
) -> dict:
    """Random access: decode ONE record from its CDX byte range without
    touching the rest of the file (``blob`` may be just the ranged
    bytes — pass offset=0 then). ``member_pos`` selects the record
    within a multi-record member (0 = first, the Common Crawl
    per-record-member case)."""
    member = split_warc_members_indexed(bytes(blob)[offset:offset + length])
    if len(member) != 1:
        raise WarcError(
            f"CDX range does not hold exactly one member ({len(member)})"
        )
    data = member[0][0]
    for _ in range(member_pos):
        if not data.strip(b"\r\n"):
            raise WarcError(
                f"member has fewer than {member_pos + 1} records"
            )
        _, used = _parse_one(data)
        data = data[used:]
    if not data.strip(b"\r\n"):
        raise WarcError(f"member has fewer than {member_pos + 1} records")
    rec, _ = _parse_one(data)
    return rec
