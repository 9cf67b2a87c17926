"""Sitemap ingestion (sitemaps.org XML protocol) — the third discovery
channel of a crawler after link extraction and redirects: hosts publish
``sitemap.xml`` (a ``<urlset>`` of page URLs with optional freshness
hints) or ``sitemap-index.xml`` (a ``<sitemapindex>`` naming child
sitemaps), usually advertised by a ``Sitemap:`` line in robots.txt
(which :func:`..operators.robots.robots_rules` surfaces).

Built from the public protocol only (sitemaps.org/protocol.html):
namespace-tolerant element matching, the four ``<url>`` children
(``loc`` required; ``lastmod``/``changefreq``/``priority`` optional),
index recursion left to the caller (each child sitemap is its own fetch
— a crawler treats index entries as frontier discoveries, not inline
expansions), gzip transport (``sitemap.xml.gz``) inflated with a
decompression bound, and a 50k-entry / 50 MB protocol limit enforced as
a typed error.

Scale shape: one sitemap is one row (sitemaps are ≤50 MB by protocol);
the parse fans out as an Arrow-batched ``mapInPandas`` stage with
``on_error='report'`` per-file isolation, and the output feeds
:func:`.frontier.new_frontier_urls` exactly like redirect discoveries.
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET
import zlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: protocol limits (sitemaps.org): ≤50,000 entries, ≤50 MB uncompressed
SITEMAP_MAX_ENTRIES = 50_000
SITEMAP_MAX_BYTES = 50 << 20


class SitemapError(ValueError):
    """Malformed sitemap XML or a protocol-limit violation — typed so
    report mode can isolate the file with the real reason."""


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_sitemap(blob: bytes) -> tuple[str, list[dict]]:
    """One sitemap file → (kind, entries). ``kind`` is ``urlset`` or
    ``sitemapindex``; each entry dict has ``loc`` plus optional
    ``lastmod``/``changefreq``/``priority`` (urlset) or ``lastmod``
    (index). Accepts gzip transport; enforces the protocol's 50 MB /
    50k-entry limits with typed errors."""
    blob = bytes(blob)
    if blob[:2] == b"\x1f\x8b":
        # Bounded inflation (the warc.py pattern): ask for at most
        # limit+1 bytes per member so a gzip bomb is caught at the
        # bound instead of allocating its full inflated size before
        # the check. Concatenated members (legal gzip transport) are
        # decoded in sequence under the same CUMULATIVE bound —
        # stopping at the first member would silently truncate the
        # document.
        parts: list[bytes] = []
        remaining = blob
        total = 0
        while remaining:
            dec = zlib.decompressobj(16 + zlib.MAX_WBITS)
            try:
                part = dec.decompress(
                    remaining, SITEMAP_MAX_BYTES + 1 - total
                )
            except zlib.error as exc:
                raise SitemapError(f"corrupt gzip transport: {exc}")
            total += len(part)
            if total > SITEMAP_MAX_BYTES or dec.unconsumed_tail:
                raise SitemapError(
                    "gzip transport inflates past the protocol's"
                    f" {SITEMAP_MAX_BYTES}-byte limit"
                )
            if not dec.eof:
                raise SitemapError(
                    "corrupt gzip transport: truncated stream"
                )
            parts.append(part)
            remaining = dec.unused_data
        blob = b"".join(parts)
    if len(blob) > SITEMAP_MAX_BYTES:
        raise SitemapError(
            f"sitemap is {len(blob)} bytes, over the protocol's"
            f" {SITEMAP_MAX_BYTES}-byte limit"
        )
    # stdlib ElementTree expands internal DTD entities (the
    # billion-laughs memory bomb); sitemaps never legitimately carry a
    # DTD, so refuse the declaration outright — the byte bound above
    # cannot catch EXPANSION bombs
    head = blob[:4096]
    if b"<!DOCTYPE" in head or b"<!ENTITY" in blob:
        raise SitemapError(
            "DTD/entity declarations refused (XML entity-expansion"
            " bomb guard)"
        )
    try:
        root = ET.fromstring(blob)
    except ET.ParseError as exc:
        raise SitemapError(f"sitemap XML parse failed: {exc}")
    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        raise SitemapError(f"root element {kind!r} is not a sitemap")
    child_tag = "url" if kind == "urlset" else "sitemap"
    entries: list[dict] = []
    for el in root:
        if _local(el.tag) != child_tag:
            continue
        entry: dict = {
            "loc": None, "lastmod": None,
            "changefreq": None, "priority": None,
        }
        for field in el:
            name = _local(field.tag)
            if name in ("loc", "lastmod", "changefreq"):
                entry[name] = (field.text or "").strip() or None
            elif name == "priority":
                try:
                    entry["priority"] = float((field.text or "").strip())
                except ValueError:
                    raise SitemapError(
                        f"bad priority {field.text!r} in {kind}"
                    )
        if not entry["loc"]:
            raise SitemapError(f"<{child_tag}> without <loc>")
        entries.append(entry)
        if len(entries) > SITEMAP_MAX_ENTRIES:
            raise SitemapError(
                f"sitemap exceeds the protocol's {SITEMAP_MAX_ENTRIES}"
                "-entry limit"
            )
    return kind, entries


SITEMAP_SCHEMA = (
    "sitemap_id long, kind string, pos int, loc string, lastmod string,"
    " changefreq string, priority double"
)


def sitemap_entries(
    files: DataFrame,
    id_col: str = "sitemap_id",
    content_col: str = "content",
    on_error: str = "report",
) -> DataFrame:
    """Distributed sitemap extraction: one row in (id, xml-or-gzip
    bytes) → one row out per ``<url>`` / ``<sitemap>`` entry, in file
    order. ``kind='sitemapindex'`` rows are CHILD-SITEMAP discoveries
    (fetch them next wave); ``kind='urlset'`` rows are page
    discoveries — both feed the frontier decision like redirect
    targets. ``on_error='report'`` (default) isolates a malformed file
    to one error row."""
    if on_error not in ("raise", "report"):
        raise ValueError(
            f"on_error must be 'raise' or 'report', not {on_error!r}"
        )
    report = on_error == "report"

    src = files.select(
        F.col(id_col).alias("sitemap_id"),
        F.col(content_col).alias("_blob"),
    )
    cols = [
        "sitemap_id", "kind", "pos", "loc", "lastmod", "changefreq",
        "priority",
    ] + (["error"] if report else [])

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for sid, blob in zip(pdf["sitemap_id"], pdf["_blob"]):
                try:
                    kind, entries = parse_sitemap(bytes(blob))
                    for i, e in enumerate(entries):
                        rows.append({
                            "sitemap_id": sid, "kind": kind, "pos": i,
                            **e,
                            **({"error": None} if report else {}),
                        })
                except Exception as e:
                    if not report:
                        raise
                    row = {c: None for c in cols}
                    row["sitemap_id"] = sid
                    row["error"] = f"{type(e).__name__}: {e}"
                    rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    schema = SITEMAP_SCHEMA + (", error string" if report else "")
    return src.mapInPandas(run, schema=schema)


def build_sitemap(
    entries: list[dict],
    kind: str = "urlset",
    gzip_transport: bool = False,
) -> bytes:
    """Deterministic encoder twin: real sitemaps.org XML (namespace
    declared, fields in protocol order, only the fields present) with
    optional gzip transport (pinned mtime). Each entry dict: ``loc``
    (required), optional ``lastmod``/``changefreq``/``priority``."""
    ns = "http://www.sitemaps.org/schemas/sitemap/0.9"
    child_tag = "url" if kind == "urlset" else "sitemap"
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f'<{kind} xmlns="{ns}">',
    ]
    for e in entries:
        parts.append(f"<{child_tag}>")
        parts.append(f"<loc>{e['loc']}</loc>")
        for k in ("lastmod", "changefreq"):
            if e.get(k) is not None:
                parts.append(f"<{k}>{e[k]}</{k}>")
        if e.get("priority") is not None:
            parts.append(f"<priority>{e['priority']}</priority>")
        parts.append(f"</{child_tag}>")
    parts.append(f"</{kind}>")
    xml = "".join(parts).encode()
    if gzip_transport:
        return gzip.compress(xml, 6, mtime=0)
    return xml
