"""A REAL document-transforming parser executable (U2): .docx judgment →
LegalDocML-style XML + metadata.json + extracted images + parser.log.

The reference runs its parser as a separate .NET Lambda container
(lambda_functions/tre-run-judgment-parser/Dockerfile:1-31) speaking the
parser-inputs/parser-outputs JSON contract
(tre-prepare-parser-input/prepare_parser_input.py:92-103,
test_parser_lambda_fn.py:82-134). This module is a working parser on the
other side of that same contract, built from public knowledge only:

- a .docx IS a zip (ECMA-376 Office Open XML): ``zipfile`` +
  ``xml.etree`` read ``word/document.xml`` (WordprocessingML paragraphs),
  ``docProps/core.xml`` (Dublin-Core properties), and ``word/media/*``
  (embedded images) — no external libraries;
- the output XML is an Akoma Ntoso (OASIS LegalDocML) judgment skeleton;
- the neutral citation / court are extracted from the document text with
  a public-format regex (``[2023] EWHC 123``).

DELIBERATELY stdlib-only and import-free of the package, so
``[sys.executable, __file__]`` is a complete parser command for
:func:`.editorial.subprocess_parser` — the process boundary stays real
(stdin JSON → child process → stdout JSON), and every failure mode
(corrupt zip → non-zero exit + stderr, missing document, malformed
input) exercises the boundary's contract with genuine errors.

:func:`build_docx` is the deterministic encoder twin (same pattern as
``audiocodec.encode_wav``): it assembles a real, Word-readable .docx
from paragraphs + images with pinned zip timestamps, used to generate
the committed fixture and property-test inputs.
"""

from __future__ import annotations

import io
import json
import os
import posixpath
import re
import sys
import zipfile
import xml.etree.ElementTree as ET

W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
CP_NS = (
    "http://schemas.openxmlformats.org/package/2006/metadata/"
    "core-properties"
)
DC_NS = "http://purl.org/dc/elements/1.1/"
DCTERMS_NS = "http://purl.org/dc/terms/"
XSI_NS = "http://www.w3.org/2001/XMLSchema-instance"
AKN_NS = "http://docs.oasis-open.org/legaldocml/ns/akn/3.0"

# Decompression bounds, checked against DECLARED sizes before any
# zf.read and against ACTUAL produced bytes during the read (a hostile
# header can lie small): the archive.DEFAULT_MAX_ARCHIVE_BYTES /
# imagecodec.PNG_MAX_DECODED_BYTES pattern for the docx surface.
DOCX_MAX_MEMBER_BYTES = 256 << 20
DOCX_MAX_TOTAL_BYTES = 1 << 30


class DocxBombError(ValueError):
    """Raised when a docx zip declares or produces more decompressed
    bytes than the bounds allow — converted to a non-zero exit by the
    executable, then to a per-row error report by subprocess_parser."""


def _read_bounded(
    zf: "zipfile.ZipFile", name: str, budget: list | None = None
) -> bytes:
    """zf.read with an actual-bytes cap: reads at most
    DOCX_MAX_MEMBER_BYTES + 1 decompressed bytes and raises rather than
    materializing a member whose header under-declared its size.

    ``budget`` is a one-element list holding the cumulative ACTUAL
    decompressed bytes read so far across the whole package; when the
    running total would exceed DOCX_MAX_TOTAL_BYTES this raises. The
    declared-size total check in parse_docx is advisory only — many
    members each under-declaring would pass it while their real
    inflated sizes sum past the bound, so the cumulative check must be
    on actual bytes."""
    with zf.open(name) as fh:
        data = fh.read(DOCX_MAX_MEMBER_BYTES + 1)
        if len(data) > DOCX_MAX_MEMBER_BYTES:
            raise DocxBombError(
                f"zip member {name!r} produced more than "
                f"{DOCX_MAX_MEMBER_BYTES} decompressed bytes"
            )
    if budget is not None:
        budget[0] += len(data)
        if budget[0] > DOCX_MAX_TOTAL_BYTES:
            raise DocxBombError(
                f"zip produced more than {DOCX_MAX_TOTAL_BYTES} total "
                f"decompressed bytes (at member {name!r})"
            )
    return data


def _parse_xml(blob: bytes):
    """ET.fromstring with the entity-expansion guard: stdlib
    ElementTree expands internal DTD entities (the billion-laughs
    memory bomb), which the byte bounds above cannot catch because the
    blow-up happens at EXPANSION time. OOXML parts never legitimately
    carry a DTD, so the declaration is refused outright."""
    if b"<!DOCTYPE" in blob[:4096] or b"<!ENTITY" in blob:
        raise DocxBombError(
            "DTD/entity declarations refused (XML entity-expansion"
            " bomb guard)"
        )
    return ET.fromstring(blob)


# neutral-citation patterns (public formats):
# "[2023] EWCA Civ 123" and "[2023] EWHC 123 (Admin)"
CITE_RE = re.compile(
    r"\[(\d{4})\]\s+(UKSC|UKPC|EWCA|EWHC|UKUT|EWFC|EWCOP)"
    r"(?:\s+(Civ|Crim))?\s+(\d+)"
    r"(?:\s+\((Admin|Ch|QB|KB|Fam|Pat|Comm|TCC|IPEC|Costs)\))?"
)

CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Default Extension="png" ContentType="image/png"/>'
    '<Override PartName="/word/document.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.wordprocessingml.document.main'
    '+xml"/>'
    '<Override PartName="/docProps/core.xml" ContentType="application/'
    'vnd.openxmlformats-package.core-properties+xml"/>'
    "</Types>"
)

ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="word/document.xml"/>'
    '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/'
    'package/2006/relationships/metadata/core-properties" '
    'Target="docProps/core.xml"/>'
    "</Relationships>"
)


NUMBERING_XML = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<w:numbering xmlns:w="{W_NS}">'
    '<w:abstractNum w:abstractNumId="0"><w:lvl w:ilvl="0">'
    '<w:numFmt w:val="decimal"/><w:lvlText w:val="%1."/>'
    "</w:lvl></w:abstractNum>"
    '<w:num w:numId="1"><w:abstractNumId w:val="0"/></w:num>'
    "</w:numbering>"
)

_OFFICE_REL = (
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
)
R_NS = _OFFICE_REL


def _doc_rels(entries: list[tuple[str, str, str]]) -> bytes:
    """word/_rels/document.xml.rels from (rId, relation-type-suffix,
    target) triples; hyperlink relations get TargetMode="External"
    (ECMA-376 — their target is a URL, not a package part)."""
    rels = "".join(
        f'<Relationship Id="{rid}" Type="{_OFFICE_REL}/{kind}" '
        f'Target="{target}"'
        + (' TargetMode="External"' if kind == "hyperlink" else "")
        + "/>"
        for rid, kind, target in entries
    )
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/'
        'package/2006/relationships">' + rels + "</Relationships>"
    ).encode()


def build_docx(
    paragraphs: list[str],
    title: str = "",
    creator: str = "",
    created: str = "1970-01-01T00:00:00Z",
    images: dict[str, bytes] | None = None,
    numbered: list[str] | None = None,
    tables: list[list[list[str]]] | None = None,
    headers: list[str] | None = None,
    links: list[tuple[str, str]] | None = None,
    footnotes: list[str] | None = None,
    endnotes: list[str] | None = None,
    comments: list[tuple[str, str]] | None = None,
) -> bytes:
    """Assemble a minimal real .docx (ECMA-376 zip package) from
    paragraph texts + optional NUMBERED paragraphs (``w:numPr`` with a
    real ``word/numbering.xml`` part + document relationship — the
    structure of a judgment's numbered points), optional TABLES
    (``w:tbl``/``w:tr``/``w:tc`` — schedules and cost tables; each
    table is rows of cell strings), optional page HEADERS (a real
    ``word/header1.xml`` part wired through ``w:sectPr``/
    ``w:headerReference`` + relationship — where courts put the
    neutral-citation banner), optional HYPERLINKS (``w:hyperlink``
    with a real externally-targeted relationship per link — how
    judgments cite legislation and earlier cases; each (anchor, url)
    becomes its own paragraph), optional FOOTNOTES (a real
    ``word/footnotes.xml`` part + relationship; footnote i's
    ``w:footnoteReference`` rides in body paragraph ``i %% len``
    — where judgments keep citations of authorities), optional
    ENDNOTES (``word/endnotes.xml`` — the same apparatus at document
    end, same reference-in-body wiring via ``w:endnoteReference``),
    optional COMMENTS (``word/comments.xml``; each (author, text)
    comment is anchored by a ``w:commentReference`` in body paragraph
    ``i %% len`` — the editorial review apparatus), and optional
    embedded images.
    Byte-deterministic (pinned zip timestamps, sorted members) so
    fixtures are committable and property tests reproducible."""
    w = f"{{{W_NS}}}"
    ET.register_namespace("w", W_NS)
    doc = ET.Element(f"{w}document")
    body = ET.SubElement(doc, f"{w}body")

    def add_runs(p, text):
        # split across two runs when possible: a real Word file rarely
        # holds a paragraph in one run, and the parser must join them
        mid = len(text) // 2
        for part in (text[:mid], text[mid:]):
            if part or not text:
                r = ET.SubElement(p, f"{w}r")
                t = ET.SubElement(r, f"{w}t")
                t.set(
                    "{http://www.w3.org/XML/1998/namespace}space",
                    "preserve",
                )
                t.text = part
            if not text:
                break

    body_paras = []
    for text in paragraphs:
        p = ET.SubElement(body, f"{w}p")
        add_runs(p, text)
        body_paras.append(p)
    footnotes_xml = None
    if footnotes:
        if not body_paras:
            raise ValueError("footnotes need at least one paragraph")
        fns = ET.Element(f"{w}footnotes")
        for i, note in enumerate(footnotes, start=1):
            fn = ET.SubElement(fns, f"{w}footnote", {f"{w}id": str(i)})
            add_runs(ET.SubElement(fn, f"{w}p"), note)
            host = body_paras[(i - 1) % len(body_paras)]
            r = ET.SubElement(host, f"{w}r")
            ET.SubElement(
                r, f"{w}footnoteReference", {f"{w}id": str(i)}
            )
        footnotes_xml = ET.tostring(
            fns, xml_declaration=True, encoding="UTF-8"
        )
    endnotes_xml = None
    if endnotes:
        if not body_paras:
            raise ValueError("endnotes need at least one paragraph")
        ens = ET.Element(f"{w}endnotes")
        for i, note in enumerate(endnotes, start=1):
            en = ET.SubElement(ens, f"{w}endnote", {f"{w}id": str(i)})
            add_runs(ET.SubElement(en, f"{w}p"), note)
            host = body_paras[(i - 1) % len(body_paras)]
            r = ET.SubElement(host, f"{w}r")
            ET.SubElement(
                r, f"{w}endnoteReference", {f"{w}id": str(i)}
            )
        endnotes_xml = ET.tostring(
            ens, xml_declaration=True, encoding="UTF-8"
        )
    comments_xml = None
    if comments:
        if not body_paras:
            raise ValueError("comments need at least one paragraph")
        cms = ET.Element(f"{w}comments")
        for i, (author, text) in enumerate(comments, start=1):
            cm = ET.SubElement(
                cms, f"{w}comment",
                {f"{w}id": str(i), f"{w}author": author},
            )
            add_runs(ET.SubElement(cm, f"{w}p"), text)
            host = body_paras[(i - 1) % len(body_paras)]
            r = ET.SubElement(host, f"{w}r")
            ET.SubElement(
                r, f"{w}commentReference", {f"{w}id": str(i)}
            )
        comments_xml = ET.tostring(
            cms, xml_declaration=True, encoding="UTF-8"
        )
    for text in numbered or []:
        p = ET.SubElement(body, f"{w}p")
        ppr = ET.SubElement(p, f"{w}pPr")
        numpr = ET.SubElement(ppr, f"{w}numPr")
        ET.SubElement(numpr, f"{w}ilvl", {f"{w}val": "0"})
        ET.SubElement(numpr, f"{w}numId", {f"{w}val": "1"})
        add_runs(p, text)
    for rows in tables or []:
        tbl = ET.SubElement(body, f"{w}tbl")
        ET.SubElement(tbl, f"{w}tblPr")
        for row in rows:
            tr = ET.SubElement(tbl, f"{w}tr")
            for cell in row:
                tc = ET.SubElement(tr, f"{w}tc")
                add_runs(ET.SubElement(tc, f"{w}p"), cell)
    link_rels: list[tuple[str, str]] = []
    for i, (anchor, url) in enumerate(links or [], start=1):
        ET.register_namespace("r", R_NS)
        p = ET.SubElement(body, f"{w}p")
        hl = ET.SubElement(
            p, f"{w}hyperlink", {f"{{{R_NS}}}id": f"rIdLn{i}"}
        )
        add_runs(hl, anchor)
        link_rels.append((f"rIdLn{i}", url))
    header_xml = None
    if headers:
        ET.register_namespace("r", R_NS)
        sect = ET.SubElement(body, f"{w}sectPr")
        ET.SubElement(
            sect,
            f"{w}headerReference",
            {f"{w}type": "default", f"{{{R_NS}}}id": "rIdHdr1"},
        )
        hdr = ET.Element(f"{w}hdr")
        for text in headers:
            add_runs(ET.SubElement(hdr, f"{w}p"), text)
        header_xml = ET.tostring(
            hdr, xml_declaration=True, encoding="UTF-8"
        )
    document_xml = ET.tostring(doc, xml_declaration=True, encoding="UTF-8")

    core = ET.Element(f"{{{CP_NS}}}coreProperties")
    ti = ET.SubElement(core, f"{{{DC_NS}}}title")
    ti.text = title
    cr = ET.SubElement(core, f"{{{DC_NS}}}creator")
    cr.text = creator
    cd = ET.SubElement(core, f"{{{DCTERMS_NS}}}created")
    cd.set(f"{{{XSI_NS}}}type", "dcterms:W3CDTF")
    cd.text = created
    core_xml = ET.tostring(core, xml_declaration=True, encoding="UTF-8")

    members: list[tuple[str, bytes]] = [
        ("[Content_Types].xml", CONTENT_TYPES.encode()),
        ("_rels/.rels", ROOT_RELS.encode()),
        ("word/document.xml", document_xml),
        ("docProps/core.xml", core_xml),
    ]
    overrides = []
    rels: list[tuple[str, str, str]] = []
    if numbered:
        overrides.append(
            '<Override PartName="/word/numbering.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.'
            'wordprocessingml.numbering+xml"/>'
        )
        rels.append(("rId1", "numbering", "numbering.xml"))
        members.append(("word/numbering.xml", NUMBERING_XML.encode()))
    if header_xml is not None:
        overrides.append(
            '<Override PartName="/word/header1.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.'
            'wordprocessingml.header+xml"/>'
        )
        rels.append(("rIdHdr1", "header", "header1.xml"))
        members.append(("word/header1.xml", header_xml))
    if footnotes_xml is not None:
        overrides.append(
            '<Override PartName="/word/footnotes.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.'
            'wordprocessingml.footnotes+xml"/>'
        )
        rels.append(("rIdFn1", "footnotes", "footnotes.xml"))
        members.append(("word/footnotes.xml", footnotes_xml))
    if endnotes_xml is not None:
        overrides.append(
            '<Override PartName="/word/endnotes.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.'
            'wordprocessingml.endnotes+xml"/>'
        )
        rels.append(("rIdEn1", "endnotes", "endnotes.xml"))
        members.append(("word/endnotes.xml", endnotes_xml))
    if comments_xml is not None:
        overrides.append(
            '<Override PartName="/word/comments.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.'
            'wordprocessingml.comments+xml"/>'
        )
        rels.append(("rIdCm1", "comments", "comments.xml"))
        members.append(("word/comments.xml", comments_xml))
    if overrides:
        ct = CONTENT_TYPES.replace("</Types>", "".join(overrides) + "</Types>")
        members[0] = ("[Content_Types].xml", ct.encode())
    for rid, url in link_rels:
        rels.append((rid, "hyperlink", url))
    if rels:
        members.append(("word/_rels/document.xml.rels", _doc_rels(rels)))
    for name, blob in sorted((images or {}).items()):
        members.append((f"word/media/{name}", blob))

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, blob in members:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, blob)
    return buf.getvalue()


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_docx(blob: bytes, reference: str) -> dict:
    """Transform a .docx into the parser's artifacts. Returns
    ``{xml: str, metadata: dict, images: {name: bytes}, log: [str]}``.
    Raises (``zipfile.BadZipFile``, ``KeyError``,
    ``DocxBombError``) on a broken or hostile package — the executable
    converts that to a non-zero exit, which ``subprocess_parser``
    reports per its contract. Every member read is bounded by
    DOCX_MAX_MEMBER_BYTES / DOCX_MAX_TOTAL_BYTES (declared sizes checked
    BEFORE decompression, mirroring archive.DEFAULT_MAX_ARCHIVE_BYTES
    and imagecodec.PNG_MAX_DECODED_BYTES): a zip bomb inside an Arrow
    batch would otherwise OOM the executor, and an OOM kill escapes the
    per-row ``on_error='report'`` isolation this error feeds."""
    log: list[str] = [f"docx parser start: reference={reference}"]
    zf = zipfile.ZipFile(io.BytesIO(blob))
    total = 0
    for info in zf.infolist():
        if info.file_size > DOCX_MAX_MEMBER_BYTES:
            raise DocxBombError(
                f"zip member {info.filename!r} declares "
                f"{info.file_size} decompressed bytes "
                f"(> {DOCX_MAX_MEMBER_BYTES})"
            )
        total += info.file_size
    if total > DOCX_MAX_TOTAL_BYTES:
        raise DocxBombError(
            f"zip declares {total} total decompressed bytes "
            f"(> {DOCX_MAX_TOTAL_BYTES})"
        )
    actual = [0]  # cumulative ACTUAL decompressed bytes across members
    doc_root = _parse_xml(
        _read_bounded(zf, "word/document.xml", actual)
    )

    w = f"{{{W_NS}}}"

    def run_text(el) -> str:
        return "".join(t.text or "" for t in el.iter(f"{w}t"))

    # hyperlink relationship targets (r:id -> URL), ECMA-376 part rels
    rel_targets: dict[str, str] = {}
    try:
        rels_root = _parse_xml(
            _read_bounded(zf, "word/_rels/document.xml.rels", actual)
        )
        for rel in rels_root:
            if rel.get("Type", "").endswith("/hyperlink"):
                rel_targets[rel.get("Id", "")] = rel.get("Target", "")
    except KeyError:
        pass  # no relationships part — legal for a linkless document

    # STRUCTURAL body walk (not a flat w:p iter): top-level paragraphs
    # keep their w:numPr numbering flag, and w:tbl blocks become tables
    # of cell texts instead of leaking their cells into the paragraph
    # stream — real judgments carry schedules and numbered points
    # (reference contract: the .NET parser's document model,
    # prepare_parser_input.py:92-103).
    paragraphs: list[tuple[str, bool]] = []  # (text, numbered)
    tables: list[list[list[str]]] = []
    links: list[tuple[str, str]] = []  # (anchor text, resolved URL)
    body_el = doc_root.find(f"{w}body")
    for child in body_el if body_el is not None else []:
        tag = _local(child.tag)
        if tag == "p":
            numbered = (
                child.find(f"{w}pPr/{w}numPr") is not None
            )
            paragraphs.append((run_text(child), numbered))
            for hl in child.iter(f"{w}hyperlink"):
                rid = hl.get(f"{{{R_NS}}}id", "")
                links.append((run_text(hl), rel_targets.get(rid, "")))
        elif tag == "tbl":
            rows = [
                [run_text(tc) for tc in tr.findall(f"{w}tc")]
                for tr in child.findall(f"{w}tr")
            ]
            tables.append(rows)
    n_numbered = sum(1 for _, numbered in paragraphs if numbered)
    headers: list[str] = []
    for name in sorted(zf.namelist()):
        if re.fullmatch(r"word/header\d+\.xml", name):
            hroot = _parse_xml(_read_bounded(zf, name, actual))
            for p in hroot.iter(f"{w}p"):
                headers.append(run_text(p))
    footnotes: list[str] = []
    n_footnote_refs = sum(
        1 for _ in doc_root.iter(f"{w}footnoteReference")
    )
    if "word/footnotes.xml" in zf.namelist():
        froot = _parse_xml(
            _read_bounded(zf, "word/footnotes.xml", actual)
        )
        for fn in froot.findall(f"{w}footnote"):
            # real Word files carry separator/continuation pseudo-notes
            # with ids <= 0 — not authorial content
            try:
                fid = int(fn.get(f"{w}id", "0"))
            except ValueError:
                fid = 0
            if fid >= 1:
                footnotes.append(
                    "\n".join(run_text(p) for p in fn.findall(f"{w}p"))
                )
    endnotes: list[str] = []
    n_endnote_refs = sum(
        1 for _ in doc_root.iter(f"{w}endnoteReference")
    )
    if "word/endnotes.xml" in zf.namelist():
        eroot = _parse_xml(
            _read_bounded(zf, "word/endnotes.xml", actual)
        )
        for en in eroot.findall(f"{w}endnote"):
            # same separator/continuation pseudo-note filter as footnotes
            try:
                eid = int(en.get(f"{w}id", "0"))
            except ValueError:
                eid = 0
            if eid >= 1:
                endnotes.append(
                    "\n".join(run_text(p) for p in en.findall(f"{w}p"))
                )
    comments: list[tuple[str, str]] = []  # (author, text)
    n_comment_refs = sum(
        1 for _ in doc_root.iter(f"{w}commentReference")
    )
    if "word/comments.xml" in zf.namelist():
        croot = _parse_xml(
            _read_bounded(zf, "word/comments.xml", actual)
        )
        for cm in croot.findall(f"{w}comment"):
            comments.append((
                cm.get(f"{w}author", ""),
                "\n".join(run_text(p) for p in cm.findall(f"{w}p")),
            ))
    log.append(
        f"extracted {len(paragraphs)} paragraphs "
        f"({n_numbered} numbered), {len(tables)} tables, "
        f"{len(headers)} header paragraphs, {len(links)} hyperlinks, "
        f"{len(footnotes)} footnotes ({n_footnote_refs} references), "
        f"{len(endnotes)} endnotes ({n_endnote_refs} references), "
        f"{len(comments)} comments ({n_comment_refs} anchors)"
    )

    title, creator, created = "", "", ""
    try:
        core = _parse_xml(
            _read_bounded(zf, "docProps/core.xml", actual)
        )
        for el in core:
            name = _local(el.tag)
            if name == "title":
                title = el.text or ""
            elif name == "creator":
                creator = el.text or ""
            elif name == "created":
                created = el.text or ""
    except KeyError:
        log.append("no docProps/core.xml; using fallbacks")

    images: dict[str, bytes] = {}
    for name in sorted(zf.namelist()):
        if name.startswith("word/media/") and not name.endswith("/"):
            base = posixpath.basename(name)
            if base in images:
                # two media members in different subfolders sharing a
                # basename would silently clobber each other in the
                # flat artifact namespace — fail loud, like the
                # reserved-artifact clash check in main()
                raise ValueError(
                    "embedded media basename collision: "
                    f"{base!r} appears more than once under word/media/"
                )
            images[base] = _read_bounded(zf, name, actual)
    log.append(f"extracted {len(images)} embedded images")

    full_text = "\n".join(
        [t for t, _ in paragraphs]
        + [c for rows in tables for row in rows for c in row]
        + headers  # courts put the citation banner in the page header
        + footnotes  # authorities are often cited only in footnotes
        + endnotes  # ... or in endnotes; comments are editorial
        # apparatus, NOT judgment text — excluded from citation search
    )
    m = CITE_RE.search(full_text)
    if m:
        cite = m.group(0)
        court = m.group(2)
        if m.group(3):
            court += f" {m.group(3)}"
        if m.group(5):
            court += f" ({m.group(5)})"
        uri = "https://caselaw.example/" + "/".join(
            g.lower() for g in m.groups() if g
        )
        log.append(f"neutral citation found: {cite}")
    else:
        cite, court, uri = None, None, None
        log.append("no neutral citation found in document text")

    date = (created.split("T", 1)[0] or "1970-01-01") if created else (
        "1970-01-01"
    )
    metadata = {
        "uri": uri,
        "court": court,
        "cite": cite,
        "date": date,
        "name": title or f"Re {reference}",
        "attachments": [],
    }
    if creator:
        log.append(f"document creator: {creator}")

    ET.register_namespace("", AKN_NS)
    akn = f"{{{AKN_NS}}}"
    root = ET.Element(f"{akn}akomaNtoso")
    judgment = ET.SubElement(root, f"{akn}judgment", name="judgment")
    meta_el = ET.SubElement(judgment, f"{akn}meta")
    ident = ET.SubElement(meta_el, f"{akn}identification", source="#tre")
    work = ET.SubElement(ident, f"{akn}FRBRWork")
    ET.SubElement(work, f"{akn}FRBRname", value=metadata["name"])
    ET.SubElement(work, f"{akn}FRBRdate", date=date, name="judgment")
    if cite:
        proprietary = ET.SubElement(meta_el, f"{akn}proprietary")
        cite_el = ET.SubElement(proprietary, f"{akn}neutralCitation")
        cite_el.text = cite
    if links:
        refs_el = ET.SubElement(meta_el, f"{akn}references", source="#tre")
        for i, (anchor, target) in enumerate(links, start=1):
            ET.SubElement(
                refs_el, f"{akn}TLCReference",
                eId=f"ref_{i}", href=target, showAs=anchor,
            )
    if headers:
        # AKN judgment structure: meta, header, judgmentBody — the
        # page-header banner lands in the judgment's formal <header>
        hdr_el = ET.SubElement(judgment, f"{akn}header")
        for text in headers:
            hp = ET.SubElement(hdr_el, f"{akn}p")
            hp.text = text
    body = ET.SubElement(judgment, f"{akn}judgmentBody")
    num_no = 0
    for i, (text, numbered) in enumerate(paragraphs, start=1):
        para = ET.SubElement(body, f"{akn}paragraph", eId=f"para_{i}")
        if numbered:
            num_no += 1
            num_el = ET.SubElement(para, f"{akn}num")
            num_el.text = f"{num_no}."
        p_el = ET.SubElement(para, f"{akn}p")
        p_el.text = text
    for j, rows in enumerate(tables, start=1):
        tbl_el = ET.SubElement(body, f"{akn}table", eId=f"table_{j}")
        for row in rows:
            tr_el = ET.SubElement(tbl_el, f"{akn}tr")
            for cell in row:
                td_el = ET.SubElement(tr_el, f"{akn}td")
                cp = ET.SubElement(td_el, f"{akn}p")
                cp.text = cell
    for k, note in enumerate(footnotes, start=1):
        # AKN renders footnotes as authorialNote elements
        note_el = ET.SubElement(
            body, f"{akn}authorialNote", eId=f"note_{k}", marker=str(k)
        )
        np_el = ET.SubElement(note_el, f"{akn}p")
        np_el.text = note
    for k, note in enumerate(endnotes, start=1):
        # endnotes are the same AKN authorialNote apparatus, placed at
        # document end (placement attribute per the AKN schema)
        note_el = ET.SubElement(
            body, f"{akn}authorialNote",
            eId=f"endnote_{k}", marker=f"e{k}", placement="bottom",
        )
        np_el = ET.SubElement(note_el, f"{akn}p")
        np_el.text = note
    xml_str = ET.tostring(
        root, xml_declaration=True, encoding="unicode"
    )
    log.append("judgment XML rendered")
    return {
        "xml": xml_str,
        "metadata": metadata,
        "images": images,
        "log": log,
        "tables": tables,
        "n_numbered": n_numbered,
        "headers": headers,
        "links": links,
        "footnotes": footnotes,
        "n_footnote_refs": n_footnote_refs,
        "endnotes": endnotes,
        "n_endnote_refs": n_endnote_refs,
        "comments": comments,
        "n_comment_refs": n_comment_refs,
    }


def main() -> int:
    """The executable contract (:func:`.editorial.subprocess_parser`):
    parser-inputs JSON on stdin, artifacts written next to the staged
    document under ``{s3-bucket}/{s3-output-prefix}``, parser-outputs
    JSON on stdout. Any failure (corrupt package, missing document,
    malformed input) propagates as a traceback on stderr + non-zero
    exit — the boundary converts it to the error-messages contract."""
    inputs = json.load(sys.stdin)
    store = inputs["s3-bucket"]
    prefix = inputs["s3-output-prefix"]
    ref = inputs["consignment-reference"]
    doc_name = posixpath.basename(inputs["document-url"].split("?", 1)[0])
    out_dir = os.path.join(store, prefix)
    with open(os.path.join(out_dir, doc_name), "rb") as f:
        blob = f.read()

    result = parse_docx(blob, ref)

    xml_name, meta_name, log_name = f"{ref}.xml", "metadata.json", "parser.log"
    # an untrusted package may embed media whose basename collides with
    # the parser's own artifacts (metadata.json, {ref}.xml, the staged
    # document) — silently clobbering them with image bytes while
    # reporting success would corrupt the downstream package. Refuse
    # loudly; the boundary converts the non-zero exit to the
    # error-messages contract.
    reserved = {xml_name, meta_name, log_name, doc_name}
    clash = sorted(reserved & set(result["images"]))
    if clash:
        raise ValueError(
            f"embedded image name collides with parser artifact: {clash}"
        )
    with open(os.path.join(out_dir, xml_name), "w") as f:
        f.write(result["xml"])
    with open(os.path.join(out_dir, meta_name), "w") as f:
        json.dump(result["metadata"], f)
    for name, img in result["images"].items():
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(img)
    with open(os.path.join(out_dir, log_name), "w") as f:
        f.write("\n".join(result["log"]) + "\n")

    json.dump(
        {
            "xml": xml_name,
            "metadata": meta_name,
            "images": sorted(result["images"]),
            "attachments": [],
            "log": log_name,
            "error-messages": [],
        },
        sys.stdout,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
