"""PDF parser (plans/pdf_parser) + parse_pdfs corpus operator tests."""

import zlib

import pytest

from da_transform_judgments_pipeline_spark.plans.pdf_parser import (
    PdfBombError,
    PdfError,
    build_pdf,
    parse_pdf,
)

PARAS = [
    "Case 7 heading",
    "[2007] EWCA Civ 8",
    "Body paragraph 0 of case 7.",
    "Body paragraph 1 of case 7.",
    "Body paragraph 2 of case 7.",
]


def test_roundtrip_all_encoder_modes():
    """Text/metadata survive raw, Flate, and TJ-kerned encodings; the
    compressed and kerned files decode to the SAME extraction."""
    base = None
    for compress in (False, True):
        for tj in (False, True):
            blob = build_pdf(
                PARAS,
                title="Case 7",
                author="Court of Appeal",
                created="D:20210304050607Z",
                compress=compress,
                tj_arrays=tj,
                images=2,
            )
            r = parse_pdf(blob, "7")
            assert r["lines"] == PARAS
            assert r["title"] == "Case 7"
            assert r["author"] == "Court of Appeal"
            assert r["created"] == "2021-03-04T05:06:07Z"
            assert r["cite"] == "[2007] EWCA Civ 8"
            assert r["court"] == "EWCA"
            assert r["n_pages"] == 2
            assert r["n_images"] == 2
            assert r["n_compressed_streams"] == (2 if compress else 0)
            key = {k: v for k, v in r.items()
                   if k != "n_compressed_streams"}
            if base is None:
                base = key
            else:
                assert key == base


def test_string_escapes_and_empty_doc():
    blob = build_pdf(["a (tricky) \\ line", "tab\there", "nl\nin para"])
    r = parse_pdf(blob)
    assert r["lines"][0] == "a (tricky) \\ line"
    assert r["lines"][1] == "tab\there"
    # \n inside a paragraph is escaped into the literal and restored
    assert r["lines"][2] == "nl\nin para"
    empty = parse_pdf(build_pdf([]))
    assert empty["n_pages"] == 1 and empty["text"] == ""


def test_octal_and_hex_string_forms():
    """Escape forms the encoder doesn't emit still parse (other
    producers' files): octal escapes and hex strings."""
    raw = b"BT /F1 12 Tf 72 720 Td (\\130Y\\132) Tj ET"
    r = _single_stream_pdf(raw)
    assert parse_pdf(r)["text"] == "XYZ"
    hexed = b"BT 72 720 Td <58595A> Tj ET"
    assert parse_pdf(_single_stream_pdf(hexed))["text"] == "XYZ"


def _single_stream_pdf(content: bytes, extra_objs=(), filt=b"") -> bytes:
    """Hand-assemble a minimal one-page PDF around a raw content stream
    (for exercising parser paths the deterministic builder never
    emits)."""
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Contents 4 0 R >>"
        ),
        4: (
            b"<< /Length %d%s >>\nstream\n" % (len(content), filt)
            + content
            + b"\nendstream"
        ),
    }
    for num, body in extra_objs:
        objs[num] = body
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    n = max(objs) + 1
    out += b"xref\n0 %d\n" % n + b"0000000000 65535 f \n"
    for num in range(1, n):
        out += b"%010d 00000 n \n" % offsets.get(num, 0)
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (n, xref_at)
    )
    return bytes(out)


def test_flate_bomb_refused():
    """A content stream that inflates past PDF_MAX_STREAM_BYTES is a
    typed refusal, not an OOM."""
    from da_transform_judgments_pipeline_spark.plans import pdf_parser

    bomb = zlib.compress(b"\x00" * (pdf_parser.PDF_MAX_STREAM_BYTES + 64))
    blob = _single_stream_pdf(bomb, filt=b" /Filter /FlateDecode")
    with pytest.raises(PdfBombError, match="inflates past"):
        parse_pdf(blob)


def test_unsupported_filter_and_bogus_startxref_refused():
    blob = _single_stream_pdf(b"BT ET", filt=b" /Filter /LZWDecode")
    with pytest.raises(PdfError, match="LZWDecode"):
        parse_pdf(blob)
    # startxref pointing at neither a classic table nor an XRef stream
    good = build_pdf(["x"])
    tampered = good[: good.rfind(b"startxref")] + b"startxref\n9\n%%EOF\n"
    with pytest.raises(
        PdfError, match="neither 'xref' nor an object|not a /Type /XRef"
    ):
        parse_pdf(tampered)


def test_corruption_refusals():
    good = build_pdf(["x"])
    with pytest.raises(PdfError, match="%PDF- header"):
        parse_pdf(b"notapdf")
    with pytest.raises(PdfError, match="startxref"):
        parse_pdf(good[:-30])
    with pytest.raises(PdfError):
        parse_pdf(good.replace(b"xref", b"xran", 1))


def test_incremental_update_prev_chain():
    """A /Prev-chained incremental update: the LATER xref section wins
    for overridden objects, earlier sections fill the rest (the PDF
    append-only update model)."""
    base = build_pdf(["original text"], title="Old")
    first_xref = int(base[base.rfind(b"startxref") + 9:].split()[0])
    # append a replacement content stream (object 5 in build_pdf's
    # single-page numbering) and a new xref section chaining to the old
    new_content = b"BT /F1 12 Tf 72 720 Td (updated text) Tj ET"
    obj5 = (
        b"5 0 obj\n<< /Length %d >>\nstream\n" % len(new_content)
        + new_content
        + b"\nendstream\nendobj\n"
    )
    out = bytearray(base)
    off5 = len(out)
    out += obj5
    xref_at = len(out)
    out += (
        b"xref\n0 1\n0000000000 65535 f \n5 1\n%010d 00000 n \n" % off5
        + b"trailer\n<< /Size 7 /Root 1 0 R /Prev %d >>\n" % first_xref
        + b"startxref\n%d\n%%%%EOF\n" % xref_at
    )
    r = parse_pdf(bytes(out))
    assert r["text"] == "updated text"
    assert r["title"] == "Old"  # Info resolved through the /Prev chain


def test_multi_page_ordering_and_nested_pages_tree():
    paras = [f"line {i}" for i in range(10)]
    r = parse_pdf(build_pdf(paras, paras_per_page=4))
    assert r["n_pages"] == 3
    assert r["lines"] == paras  # document order across pages


def test_parse_pdfs_report_isolation(spark):
    """One corrupt blob isolates to its error row; good rows parse."""
    import pandas as pd

    from da_transform_judgments_pipeline_spark.plans.editorial import (
        parse_pdfs,
    )

    rows = [
        (1, bytearray(build_pdf(["good one"], title="T1"))),
        (2, bytearray(b"%PDF-1.4 truncated garbage")),
        (3, bytearray(build_pdf(["good three"], title="T3"))),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "content"]),
        "doc_id long, content binary",
    )
    out = {r["doc_id"]: r for r in parse_pdfs(df).collect()}
    assert out[1]["text"] == "good one" and out[1]["error"] is None
    assert out[3]["title"] == "T3"
    assert out[2]["error"] is not None and out[2]["text"] is None
    with pytest.raises(Exception):
        parse_pdfs(df, on_error="raise").collect()
    with pytest.raises(ValueError, match="on_error"):
        parse_pdfs(df, on_error="nope")


def test_binaryfile_scan_to_parse_pdfs(spark, tmp_path):
    """The real consumer path: .pdf files on disk → binaryFile scan →
    parse_pdfs, end to end."""
    from da_transform_judgments_pipeline_spark.plans.editorial import (
        parse_pdfs,
    )

    for i in range(3):
        (tmp_path / f"j{i}.pdf").write_bytes(
            build_pdf(
                [f"Judgment {i}", f"[202{i}] UKSC {i + 1}"],
                title=f"J{i}",
                compress=(i % 2 == 0),
            )
        )
    files = (
        spark.read.format("binaryFile")
        .load(str(tmp_path))
        .selectExpr(
            "cast(regexp_extract(path, 'j(\\\\d+)\\\\.pdf', 1) as long)"
            " as doc_id",
            "content",
        )
    )
    out = parse_pdfs(files).orderBy("doc_id").collect()
    assert [r["title"] for r in out] == ["J0", "J1", "J2"]
    assert [r["cite"] for r in out] == [
        "[2020] UKSC 1", "[2021] UKSC 2", "[2022] UKSC 3"
    ]
    assert all(r["error"] is None for r in out)


def test_xref_stream_and_object_stream_modes():
    """PDF 1.5 structures: a /Type /XRef cross-reference stream (binary
    W=[1,4,2] entries under the PNG Up predictor) and a /Type /ObjStm
    object-stream container (type-2 entries) decode to EXACTLY the same
    document as the classic-table encoding."""
    paras = ["Case 7 heading", "[2007] EWCA Civ 8"] + [
        f"Body {j} of 7." for j in range(4)
    ]
    base = None
    for xs, os_ in ((False, False), (True, False), (True, True)):
        for comp in (False, True):
            r = parse_pdf(build_pdf(
                paras, title="Case 7", author="CoA",
                created="D:20210304050607Z", compress=comp,
                tj_arrays=True, images=2,
                xref_stream=xs, obj_streams=os_,
            ))
            key = {k: v for k, v in r.items()
                   if k != "n_compressed_streams"}
            assert r["lines"] == paras
            assert r["n_images"] == 2 and r["n_pages"] == 2
            if base is None:
                base = key
            assert key == base, (xs, os_, comp)
    with pytest.raises(ValueError, match="requires xref_stream"):
        build_pdf(["x"], obj_streams=True)


def test_xref_stream_corruption_refused():
    blob = build_pdf(["x"], xref_stream=True)
    start = blob.rfind(b">>\nstream\n") + len(b">>\nstream\n")
    # poison the zlib header of the xref stream's data
    bad = blob[:start] + b"\x00\x00" + blob[start + 2:]
    with pytest.raises(PdfError, match="corrupt Flate|not a"):
        parse_pdf(bad)
    # truncating the file kills startxref → typed refusal
    with pytest.raises(PdfError):
        parse_pdf(blob[:-40])


def test_xref_stream_prev_chain_incremental_update():
    """An incremental update whose NEW section is an xref stream over a
    classic base: later sections win, /Prev walks back."""
    base = build_pdf(["original text"], title="Old")
    first_xref = int(base[base.rfind(b"startxref") + 9:].split()[0])
    new_content = b"BT /F1 12 Tf 72 720 Td (updated text) Tj ET"
    out = bytearray(base)
    off5 = len(out)
    out += (
        b"5 0 obj\n<< /Length %d >>\nstream\n" % len(new_content)
        + new_content + b"\nendstream\nendobj\n"
    )
    xref_at = len(out)
    import zlib as _z

    # one type-1 entry for object 5, no predictor, W=[1,4,2]
    entry = bytes([1]) + off5.to_bytes(4, "big") + (0).to_bytes(2, "big")
    z = _z.compress(entry)
    out += (
        b"7 0 obj\n<< /Type /XRef /Size 8 /W [1 4 2] /Index [5 1]"
        b" /Root 1 0 R /Prev %d /Filter /FlateDecode /Length %d"
        b" >>\nstream\n" % (first_xref, len(z))
        + z + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n%d\n%%%%EOF\n" % xref_at
    r = parse_pdf(bytes(out))
    assert r["text"] == "updated text"
    assert r["title"] == "Old"
