"""Parser staging + editorial integration (reference entry point A steps
3-7 and entry point C): prepare_parser_input, the parser RPC contract via
the deterministic stub, ParserHandler packaging, T10 first-run guard, and
the RetryHandler sequence/recovery semantics."""

import hashlib
import json
import os
import tarfile

import pytest

from da_transform_judgments_pipeline_spark.plans import editorial

REF = "TDR-2023-XY1"


@pytest.fixture()
def store(tmp_path):
    """A validated consignment laid out per the reference key convention."""
    root = tmp_path / "store"
    bag = root / "consignments" / "judgment" / REF / "0" / REF
    (bag / "data").mkdir(parents=True)
    (bag / "data" / "doc.docx").write_bytes(b"DOCX" * 100)
    (bag / "bagit.txt").write_text("BagIt-Version: 0.97\n")
    (bag / "bag-info.txt").write_text(
        "Consignment-Series: TEST 123\nContact-Name: A Person\n"
    )
    return str(root)


def _validated_event(store):
    base = f"consignments/judgment/{REF}/0/{REF}"
    return {
        "parameters": {
            "bagit-validated": {
                "reference": REF,
                "s3-bucket": store,
                "validated-files": {
                    "path": base,
                    "root": [f"{base}/bagit.txt", f"{base}/bag-info.txt"],
                    "data": [f"{base}/data/doc.docx"],
                },
            }
        }
    }


def _stage_and_parse(spark, store):
    staged = editorial.prepare_parser_input(
        spark, _validated_event(store), store
    )
    assert staged["error"] is False, staged
    outputs = editorial.fake_parser(staged["parser-inputs"])
    return [
        {"context": staged["context"], "parser-inputs": staged["parser-inputs"]},
        [{"sdk-noise": True}, {"parser-outputs": outputs}],
    ]


def test_prepare_parser_input_stages_files(spark, store):
    staged = editorial.prepare_parser_input(
        spark, _validated_event(store), store
    )
    assert staged["error"] is False
    pi = staged["parser-inputs"]
    assert pi["s3-output-prefix"] == f"parsed/judgment/{REF}/0/"
    for name in ("doc.docx", "bagit-info.txt", "bag-info.txt"):
        assert os.path.exists(os.path.join(store, pi["s3-output-prefix"], name))
    assert "X-Signature=" in pi["document-url"]
    # error envelope parity: a broken event routes, it does not raise
    bad = editorial.prepare_parser_input(spark, {"parameters": {}}, store)
    assert bad["error"] is True and "error-message" in bad


def test_editorial_parser_handler_packages_tar(spark, store):
    event = _stage_and_parse(spark, store)
    msg = editorial.editorial_integration(spark, event)
    out = msg["editorial-output"]
    assert out["consignment-reference"] == REF
    assert out["number-of-retries"] == 0

    tar_key = msg["tar-gz"]["key"]
    tar_path = os.path.join(store, tar_key)
    with tarfile.open(tar_path) as tf:
        names = tf.getnames()
        meta = json.load(
            tf.extractfile(f"{REF}/TRE-{REF}-metadata.json")
        )
    # members packed in to_tar_list order — metadata, xml, log, doc
    # (reference tre_editorial_integration.py:257-287), NOT alphabetically
    assert names == [
        f"{REF}/TRE-{REF}-metadata.json",
        f"{REF}/{REF}.xml",
        f"{REF}/parser.log",
        f"{REF}/doc.docx",
    ]
    assert {i["name"] for i in msg["tar-gz"]["items"]} == set(names)
    # TRE metadata merges parser metadata + bag-info + versions
    assert meta["producer"]["name"] == "TRE"
    assert meta["parameters"]["TDR"]["Consignment-Series"] == "TEST 123"
    assert meta["parameters"]["PARSER"]["court"] == "EWHC"
    assert meta["parameters"]["PARSER"]["error-messages"] == []
    assert meta["parameters"]["TRE"]["payload"]["xml"] == f"{REF}.xml"

    # sha256 sidecar covers the written archive
    with open(tar_path, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    sidecar = open(tar_path + ".sha256").read()
    assert sidecar == f"{digest} TRE-{REF}.tar.gz"
    # output message persisted for retries
    assert os.path.exists(
        os.path.join(store, f"parsed/judgment/{REF}/0/0/output-message.json")
    )


def test_editorial_first_run_guard(spark, store):
    event = _stage_and_parse(spark, store)
    editorial.editorial_integration(spark, event)
    with pytest.raises(editorial.EditorialIntegrationError) as ei:
        editorial.editorial_integration(spark, event)
    assert "unexpected output folder" in str(ei.value)


def test_editorial_block_and_field_validation(spark, store):
    event = _stage_and_parse(spark, store)
    with pytest.raises(editorial.EditorialIntegrationError):
        editorial.editorial_integration(spark, [event[1]])  # no context block
    del event[0]["context"]["judgment-document"]
    with pytest.raises(editorial.EditorialIntegrationError) as ei:
        editorial.editorial_integration(spark, event)
    assert "judgment-document" in str(ei.value)


def test_editorial_retry_sequence(spark, store):
    editorial.editorial_integration(spark, _stage_and_parse(spark, store))
    retry = {
        "consignment-reference": REF,
        "consignment-type": "judgment",
        "number-of-retries": 1,
    }
    msg = editorial.editorial_integration(spark, retry, store=store)
    assert msg["editorial-output"]["number-of-retries"] == 1
    assert os.path.exists(
        os.path.join(store, f"parsed/judgment/{REF}/0/1/output-message.json")
    )
    # next valid counter is 2; anything else is rejected (W3 monotonic)
    with pytest.raises(editorial.EditorialIntegrationError) as ei:
        editorial.editorial_integration(spark, dict(retry), store=store)
    assert 'Expected number-of-retries to be "2"' in str(ei.value)
    msg2 = editorial.editorial_integration(
        spark, dict(retry, **{"number-of-retries": 2}), store=store
    )
    assert msg2["editorial-output"]["number-of-retries"] == 2


def test_editorial_retry_requires_prior_output(spark, tmp_path):
    retry = {
        "consignment-reference": "TDR-0000-NONE",
        "consignment-type": "judgment",
        "number-of-retries": 1,
    }
    # a never-parsed consignment must surface the reference's domain error
    # (tre_editorial_integration.py:493-495), not Spark's PATH_NOT_FOUND
    with pytest.raises(editorial.EditorialIntegrationError) as ei:
        editorial.editorial_integration(spark, retry, store=str(tmp_path))
    assert "No TDR output data found" in str(ei.value)


CHILD_SCRIPT = r"""
import json, os, sys, time
mode = sys.argv[1]
if mode == "hang":
    time.sleep(60)
if mode == "crash":
    print("kaboom: cannot parse document", file=sys.stderr)
    sys.exit(3)
if mode == "garbage":
    print("<<<not json at all>>>")
    sys.exit(0)
if mode == "flaky":
    marker = sys.argv[3]
    if not os.path.exists(marker):
        open(marker, "w").write("x")
        print("transient failure", file=sys.stderr)
        sys.exit(1)
sys.path.insert(0, sys.argv[2])
from da_transform_judgments_pipeline_spark.plans.editorial import fake_parser
print(json.dumps(fake_parser(json.load(sys.stdin))))
"""


def _child_cmd(tmp_path, mode, *extra):
    import sys

    script = tmp_path / "child_parser.py"
    if not script.exists():
        script.write_text(CHILD_SCRIPT)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return [sys.executable, str(script), mode, repo, *extra]


def test_subprocess_parser_ok_end_to_end(spark, store, tmp_path):
    """The real process boundary: parser-inputs through a child process's
    stdin/stdout, outputs identical to the in-process stub, and the full
    editorial integration packages the child's artifacts."""
    staged = editorial.prepare_parser_input(
        spark, _validated_event(store), store
    )
    parser = editorial.subprocess_parser(
        _child_cmd(tmp_path, "ok"), timeout_s=60
    )
    outputs = parser(staged["parser-inputs"])
    assert outputs["error-messages"] == []
    assert outputs["xml"] == f"{REF}.xml"
    event = [
        {"context": staged["context"], "parser-inputs": staged["parser-inputs"]},
        [{"parser-outputs": outputs}],
    ]
    msg = editorial.editorial_integration(spark, event)
    assert msg["editorial-output"]["consignment-reference"] == REF


def test_subprocess_parser_failure_modes(tmp_path):
    """Hanging → killed at the timeout; crashing → exit code + stderr tail
    captured; garbage stdout → invalid-JSON error. All three return the
    parser-outputs CONTRACT (error-messages populated, artifacts None) —
    never a raise — so the stage/orchestrator route them through T4."""
    import time

    inputs = {"consignment-reference": REF, "s3-bucket": "x",
              "s3-output-prefix": "y/", "document-url": "u"}

    t0 = time.monotonic()
    out = editorial.subprocess_parser(
        _child_cmd(tmp_path, "hang"), timeout_s=1.0, attempts=1
    )(inputs)
    assert time.monotonic() - t0 < 15
    assert out["xml"] is None and out["metadata"] is None
    assert "timed out after 1.0s" in out["error-messages"][0]

    out = editorial.subprocess_parser(
        _child_cmd(tmp_path, "crash"), timeout_s=10, attempts=1
    )(inputs)
    assert "parser exited 3" in out["error-messages"][0]
    assert "kaboom" in out["error-messages"][0]  # stderr tail captured

    out = editorial.subprocess_parser(
        _child_cmd(tmp_path, "garbage"), timeout_s=10, attempts=1
    )(inputs)
    assert "invalid JSON" in out["error-messages"][0]


def test_subprocess_parser_flaky_retry_with_audit_trail(
    spark, store, tmp_path
):
    """A parser that fails once then succeeds: the boundary absorbs the
    transient failure on its second attempt, keeps the first failure in
    error-messages, and the editorial stage carries that audit trail into
    the merged TRE metadata's PARSER block — the signal downstream
    routing (T4) and operators read."""
    staged = editorial.prepare_parser_input(
        spark, _validated_event(store), store
    )
    marker = str(tmp_path / "flaky-marker")
    parser = editorial.subprocess_parser(
        _child_cmd(tmp_path, "flaky", marker), timeout_s=30, attempts=2
    )
    outputs = parser(staged["parser-inputs"])
    assert outputs["xml"] == f"{REF}.xml"  # succeeded on attempt 2
    assert len(outputs["error-messages"]) == 1
    assert "attempt 1/2" in outputs["error-messages"][0]

    event = [
        {"context": staged["context"], "parser-inputs": staged["parser-inputs"]},
        [{"parser-outputs": outputs}],
    ]
    msg = editorial.editorial_integration(spark, event)
    tar_key = msg["tar-gz"]["key"]
    with tarfile.open(os.path.join(store, tar_key)) as tf:
        meta = json.load(
            tf.extractfile(f"{REF}/TRE-{REF}-metadata.json")
        )
    assert meta["parameters"]["PARSER"]["error-messages"] == outputs[
        "error-messages"
    ]


def _real_parser_cmd():
    import sys

    from da_transform_judgments_pipeline_spark.plans import docx_parser

    return [sys.executable, os.path.abspath(docx_parser.__file__)]


FIXTURE_DOCX = os.path.join(
    os.path.dirname(__file__), "..", "fixtures", "judgment.docx"
)


def test_real_docx_parser_end_to_end(spark, store):
    """U2 closed: a REAL document-transforming executable (stdlib
    docx-unzip → WordprocessingML parse → Akoma Ntoso XML + metadata +
    image extraction) driven through the genuine subprocess boundary
    over the committed fixture docx, then packaged by the full editorial
    chain. No stub anywhere in this path."""
    import zipfile

    from da_transform_judgments_pipeline_spark.operators.imagecodec import (
        decode_png,
    )

    doc = os.path.join(
        store, "consignments", "judgment", REF, "0", REF, "data", "doc.docx"
    )
    with open(FIXTURE_DOCX, "rb") as f:
        blob = f.read()
    with open(doc, "wb") as f:
        f.write(blob)

    staged = editorial.prepare_parser_input(
        spark, _validated_event(store), store
    )
    assert staged["error"] is False, staged
    parser = editorial.subprocess_parser(_real_parser_cmd(), timeout_s=120)
    outputs = parser(staged["parser-inputs"])
    assert outputs["error-messages"] == []
    assert outputs["xml"] == f"{REF}.xml"
    assert outputs["metadata"] == "metadata.json"
    assert outputs["images"] == ["image1.png", "image2.png"]
    assert outputs["log"] == "parser.log"

    out_dir = os.path.join(store, staged["parser-inputs"]["s3-output-prefix"])
    xml = open(os.path.join(out_dir, f"{REF}.xml")).read()
    assert "akomaNtoso" in xml
    assert "[2023] EWHC 123 (Admin)" in xml  # citation from document text
    assert "the application is dismissed" in xml  # paragraph text (2 runs)
    meta = json.load(open(os.path.join(out_dir, "metadata.json")))
    assert meta["cite"] == "[2023] EWHC 123 (Admin)"
    assert meta["court"] == "EWHC (Admin)"
    assert meta["name"] == "Example v Sample"  # from docProps/core.xml
    assert meta["date"] == "2023-01-15"
    # embedded media extracted bit-exact, and they are REAL PNGs
    zf = zipfile.ZipFile(FIXTURE_DOCX)
    for name in outputs["images"]:
        extracted = open(os.path.join(out_dir, name), "rb").read()
        assert extracted == zf.read(f"word/media/{name}")
        decode_png(extracted)
    log = open(os.path.join(out_dir, "parser.log")).read()
    assert "6 paragraphs" in log and "2 embedded images" in log

    event = [
        {"context": staged["context"], "parser-inputs": staged["parser-inputs"]},
        [{"parser-outputs": outputs}],
    ]
    msg = editorial.editorial_integration(spark, event)
    tar_key = msg["tar-gz"]["key"]
    with tarfile.open(os.path.join(store, tar_key)) as tf:
        names = tf.getnames()
        tre_meta = json.load(
            tf.extractfile(f"{REF}/TRE-{REF}-metadata.json")
        )
        xml_bytes = tf.extractfile(f"{REF}/{REF}.xml").read()
    assert f"{REF}/image1.png" in names and f"{REF}/image2.png" in names
    assert tre_meta["parameters"]["PARSER"]["court"] == "EWHC (Admin)"
    assert tre_meta["parameters"]["PARSER"]["error-messages"] == []
    assert b"neutralCitation" in xml_bytes


def test_real_docx_parser_failure_modes(spark, store):
    """The real executable's genuine failures cross the boundary per the
    contract: a non-zip document → BadZipFile exit captured; a zip
    missing word/document.xml → KeyError exit captured; a missing staged
    document → FileNotFoundError exit captured. Artifacts None, stage
    still routable — no raise."""
    import io
    import zipfile as zf_mod

    doc = os.path.join(
        store, "consignments", "judgment", REF, "0", REF, "data", "doc.docx"
    )
    # store fixture's placeholder bytes are NOT a zip — the real crash
    staged = editorial.prepare_parser_input(
        spark, _validated_event(store), store
    )
    parser = editorial.subprocess_parser(
        _real_parser_cmd(), timeout_s=120, attempts=1
    )
    out = parser(staged["parser-inputs"])
    assert out["xml"] is None and out["metadata"] is None
    assert "parser exited 1" in out["error-messages"][0]
    assert "BadZipFile" in out["error-messages"][0]

    # a zip that is not a docx (no word/document.xml)
    buf = io.BytesIO()
    with zf_mod.ZipFile(buf, "w") as z:
        z.writestr("hello.txt", "not a docx")
    with open(doc, "wb") as f:
        f.write(buf.getvalue())
    staged = editorial.prepare_parser_input(
        spark, _validated_event(store), store
    )
    out = parser(staged["parser-inputs"])
    assert out["xml"] is None
    assert "KeyError" in out["error-messages"][0]

    # staged document missing entirely
    os.remove(
        os.path.join(
            store, staged["parser-inputs"]["s3-output-prefix"], "doc.docx"
        )
    )
    out = parser(staged["parser-inputs"])
    assert out["xml"] is None
    assert "FileNotFoundError" in out["error-messages"][0]


def test_build_docx_is_deterministic_and_real():
    """The fixture generator's encoder twin: byte-deterministic across
    calls (committable fixtures) and a real ECMA-376 package the stdlib
    zipfile validates; parse_docx inverts it (paragraph round-trip,
    multi-run joins included)."""
    import zipfile

    from da_transform_judgments_pipeline_spark.plans.docx_parser import (
        build_docx,
        parse_docx,
    )

    paras = ["Alpha beta", "", "[2024] EWCA Civ 7", "Final words here"]
    b1 = build_docx(paras, title="T", creator="C", images={"i.png": b"PNG?"})
    b2 = build_docx(paras, title="T", creator="C", images={"i.png": b"PNG?"})
    assert b1 == b2
    assert zipfile.ZipFile(io_bytes(b1)).testzip() is None
    r = parse_docx(b1, "R-1")
    assert r["metadata"]["cite"] == "[2024] EWCA Civ 7"
    assert r["metadata"]["court"] == "EWCA Civ"
    assert r["images"] == {"i.png": b"PNG?"}
    # paragraphs round-trip through the two-run split
    assert "Alpha beta" in r["xml"] and "Final words here" in r["xml"]


def io_bytes(b):
    import io

    return io.BytesIO(b)


def test_parse_docx_zip_bomb_and_collision_guards():
    """Hostile-package guards: a member whose header declares an
    oversized decompressed size, a total over the package bound, a
    member whose header LIES small but inflates big, and two media
    members that collide on basename all raise typed errors instead of
    OOMing the executor (an OOM kill escapes on_error='report' row
    isolation) or silently dropping image bytes."""
    import io
    import zipfile

    from da_transform_judgments_pipeline_spark.plans import docx_parser
    from da_transform_judgments_pipeline_spark.plans.docx_parser import (
        DocxBombError,
        build_docx,
        parse_docx,
    )

    # declared member size over the bound (patch the bound down so the
    # fixture stays tiny)
    big = build_docx(["x" * 2000], title="T")
    orig_member = docx_parser.DOCX_MAX_MEMBER_BYTES
    orig_total = docx_parser.DOCX_MAX_TOTAL_BYTES
    try:
        docx_parser.DOCX_MAX_MEMBER_BYTES = 100
        with pytest.raises(DocxBombError, match="declares"):
            parse_docx(big, "R-1")
        docx_parser.DOCX_MAX_MEMBER_BYTES = orig_member
        docx_parser.DOCX_MAX_TOTAL_BYTES = 100
        with pytest.raises(DocxBombError, match="total"):
            parse_docx(big, "R-1")
        # the actual-bytes cap in _read_bounded: a member inflating past
        # the cap raises even when the declared-size precheck was skipped
        docx_parser.DOCX_MAX_TOTAL_BYTES = orig_total
        docx_parser.DOCX_MAX_MEMBER_BYTES = 50
        with zipfile.ZipFile(io.BytesIO(big)) as zf:
            with pytest.raises(DocxBombError, match="produced"):
                docx_parser._read_bounded(zf, "word/document.xml")
        # a header that lies SMALL is caught by zipfile itself (reads
        # truncate at the declared size, CRC then mismatches) — still a
        # loud error, converted to a non-zero exit by the executable
        buf = io.BytesIO(big)
        with zipfile.ZipFile(buf) as zf:
            zf.getinfo("word/document.xml").file_size = 10  # lie
            with pytest.raises(Exception):
                docx_parser._read_bounded(zf, "word/document.xml")
    finally:
        docx_parser.DOCX_MAX_MEMBER_BYTES = orig_member
        docx_parser.DOCX_MAX_TOTAL_BYTES = orig_total

    # XML entity-expansion bomb (billion laughs): byte bounds cannot
    # catch an EXPANSION blow-up, so DTD/entity declarations are
    # refused before ElementTree ever sees them
    laughs = (
        b'<?xml version="1.0"?><!DOCTYPE w [<!ENTITY a "ha">'
        b'<!ENTITY b "&a;&a;&a;&a;&a;&a;&a;&a;&a;&a;">'
        b'<!ENTITY c "&b;&b;&b;&b;&b;&b;&b;&b;&b;&b;">]>'
        b'<w:document xmlns:w="' + docx_parser.W_NS.encode()
        + b'"><w:body><w:p><w:r><w:t>&c;</w:t></w:r></w:p>'
        b"</w:body></w:document>"
    )
    evil = io.BytesIO()
    with zipfile.ZipFile(evil, "w") as zf:
        with zipfile.ZipFile(io.BytesIO(big)) as src:
            for n in src.namelist():
                zf.writestr(
                    n,
                    laughs if n == "word/document.xml" else src.read(n),
                )
    with pytest.raises(DocxBombError, match="entity-expansion"):
        parse_docx(evil.getvalue(), "R-1")

    # basename collision across media subfolders: both members survive
    # the zip, but the flat artifact namespace cannot hold both
    base = build_docx(["hello"], title="T")
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(base)) as zin, zipfile.ZipFile(
        buf, "w", zipfile.ZIP_DEFLATED
    ) as zout:
        for name in zin.namelist():
            zout.writestr(name, zin.read(name))
        zout.writestr("word/media/a/img.png", b"one")
        zout.writestr("word/media/b/img.png", b"two")
    with pytest.raises(ValueError, match="basename collision"):
        parse_docx(buf.getvalue(), "R-1")


def test_parse_documents_corpus_operator(spark):
    """The distributed parser stage: real docx packages parse per-row in
    Arrow batches (paragraph joins across runs, citation extraction,
    image counts), a corrupt package yields an error row in report mode
    (the default — a corpus always has corrupt members) and raises under
    on_error='raise'."""
    from da_transform_judgments_pipeline_spark.plans.docx_parser import (
        build_docx,
    )
    from da_transform_judgments_pipeline_spark.plans.editorial import (
        parse_documents,
    )

    good = build_docx(
        ["Heading here", "[2022] UKSC 11", "Body text"],
        title="Good v Better",
        created="2022-05-06T07:08:09Z",
        images={"a.png": b"x", "b.png": b"y"},
    )
    corpus = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"not a zip at all"))],
        "doc_id long, content binary",
    )
    rows = {r["doc_id"]: r for r in parse_documents(corpus).collect()}
    ok = rows[1]
    assert ok["error"] is None
    assert ok["name"] == "Good v Better"
    assert ok["cite"] == "[2022] UKSC 11" and ok["court"] == "UKSC"
    assert ok["date"] == "2022-05-06"
    assert ok["n_paragraphs"] == 3 and ok["n_images"] == 2
    assert "akomaNtoso" in ok["xml"] and "Body text" in ok["xml"]
    bad = rows[2]
    assert bad["xml"] is None and "BadZipFile" in bad["error"]

    with pytest.raises(Exception, match="BadZipFile"):
        parse_documents(corpus, on_error="raise").collect()
    with pytest.raises(ValueError, match="on_error"):
        parse_documents(corpus, on_error="skip")


def test_real_docx_parser_rejects_artifact_name_collision(spark, store):
    """An untrusted package embedding media named like a parser artifact
    (metadata.json / {ref}.xml / the staged doc) must FAIL loudly across
    the boundary — not silently clobber the artifacts and report
    success."""
    from da_transform_judgments_pipeline_spark.plans.docx_parser import (
        build_docx,
    )

    doc = os.path.join(
        store, "consignments", "judgment", REF, "0", REF, "data", "doc.docx"
    )
    evil = build_docx(
        ["Some judgment text"],
        title="Evil v Good",
        images={"metadata.json": b'{"not": "the metadata"}'},
    )
    with open(doc, "wb") as f:
        f.write(evil)
    staged = editorial.prepare_parser_input(
        spark, _validated_event(store), store
    )
    out = editorial.subprocess_parser(
        _real_parser_cmd(), timeout_s=120, attempts=1
    )(staged["parser-inputs"])
    assert out["xml"] is None
    assert "collides with parser artifact" in out["error-messages"][0]
    # the real metadata.json was not replaced by image bytes
    out_dir = os.path.join(store, staged["parser-inputs"]["s3-output-prefix"])
    assert not os.path.exists(os.path.join(out_dir, f"{REF}.xml"))


def test_parse_documents_raise_mode_has_no_error_column(spark):
    """Mirror of the multimodal contract: the error column exists only
    in report mode (under 'raise' it could never be non-NULL)."""
    from da_transform_judgments_pipeline_spark.plans.docx_parser import (
        build_docx,
    )
    from da_transform_judgments_pipeline_spark.plans.editorial import (
        parse_documents,
    )

    corpus = spark.createDataFrame(
        [(1, bytearray(build_docx(["hello"])))],
        "doc_id long, content binary",
    )
    assert "error" not in parse_documents(corpus, on_error="raise").columns
    assert "error" in parse_documents(corpus).columns


def test_docx_tables_and_numbering_roundtrip(spark, store):
    """Judgment structure beyond flat paragraphs: numbered points
    (w:numPr + a real numbering part) and tables (w:tbl/w:tr/w:tc)
    round-trip through build_docx → parse_docx into the Akoma Ntoso
    output (<num> children, <table>/<tr>/<td> blocks), table cells stay
    OUT of the paragraph stream, the citation regex still sees table
    text, and the same package parses through the REAL subprocess
    boundary."""
    from da_transform_judgments_pipeline_spark.plans.docx_parser import (
        build_docx,
        parse_docx,
    )

    blob = build_docx(
        ["Heading", "Plain paragraph"],
        title="T v U",
        numbered=["First numbered point", "Second numbered point"],
        tables=[
            [["r0c0", "r0c1"], ["r1c0", "[2020] UKSC 99"]],
            [["only cell"]],
        ],
    )
    # deterministic with the new parts too
    assert blob == build_docx(
        ["Heading", "Plain paragraph"],
        title="T v U",
        numbered=["First numbered point", "Second numbered point"],
        tables=[
            [["r0c0", "r0c1"], ["r1c0", "[2020] UKSC 99"]],
            [["only cell"]],
        ],
    )
    r = parse_docx(blob, "R-1")
    assert r["n_numbered"] == 2
    assert r["tables"] == [
        [["r0c0", "r0c1"], ["r1c0", "[2020] UKSC 99"]],
        [["only cell"]],
    ]
    # paragraph stream: 2 plain + 2 numbered, no table cells
    assert r["xml"].count("<paragraph ") == 4
    assert "r0c0" not in r["xml"].split("<table", 1)[0]
    assert r["xml"].count("<table ") == 2
    assert r["xml"].count("<td>") == 5
    assert "<num>1.</num>" in r["xml"] and "<num>2.</num>" in r["xml"]
    # table text participates in citation extraction
    assert r["metadata"]["cite"] == "[2020] UKSC 99"

    # the same structured package through the real subprocess boundary
    doc = os.path.join(
        store, "consignments", "judgment", REF, "0", REF, "data", "doc.docx"
    )
    with open(doc, "wb") as f:
        f.write(blob)
    staged = editorial.prepare_parser_input(
        spark, _validated_event(store), store
    )
    assert staged["error"] is False, staged
    parser = editorial.subprocess_parser(_real_parser_cmd(), timeout_s=120)
    outputs = parser(staged["parser-inputs"])
    assert outputs["error-messages"] == []


def test_parse_documents_counts_tables_and_numbering(spark):
    from da_transform_judgments_pipeline_spark.plans.docx_parser import (
        build_docx,
    )
    from da_transform_judgments_pipeline_spark.plans.editorial import (
        parse_documents,
    )

    b1 = build_docx(
        ["p"], numbered=["n1", "n2", "n3"],
        tables=[[["a", "b", "c"], ["d", "e", "f"]]],
    )
    b2 = build_docx(["p only"])
    corpus = spark.createDataFrame(
        [(1, bytearray(b1)), (2, bytearray(b2))],
        "doc_id long, content binary",
    )
    rows = {
        r["doc_id"]: r
        for r in parse_documents(corpus, on_error="raise").collect()
    }
    assert rows[1]["n_numbered"] == 3
    assert rows[1]["n_tables"] == 1 and rows[1]["n_table_cells"] == 6
    assert rows[1]["n_paragraphs"] == 4
    assert rows[2]["n_numbered"] == 0 and rows[2]["n_tables"] == 0


def test_docx_headers_roundtrip_and_citation_from_banner(spark):
    """Page headers (w:sectPr/w:headerReference + a real header1.xml
    part): header paragraphs round-trip into the AKN <header> element,
    the citation banner in the page header drives citation extraction
    when the body has none, and headerless documents emit no <header>."""
    from da_transform_judgments_pipeline_spark.plans.docx_parser import (
        build_docx,
        parse_docx,
    )
    from da_transform_judgments_pipeline_spark.plans.editorial import (
        parse_documents,
    )

    blob = build_docx(
        ["Body with no citation at all"],
        title="T v U",
        headers=["IN THE HIGH COURT", "[2023] EWHC 42 (Admin)"],
    )
    r = parse_docx(blob, "R-1")
    assert r["headers"] == ["IN THE HIGH COURT", "[2023] EWHC 42 (Admin)"]
    assert r["metadata"]["cite"] == "[2023] EWHC 42 (Admin)"
    assert r["metadata"]["court"] == "EWHC (Admin)"
    assert "<header>" in r["xml"] and "IN THE HIGH COURT" in r["xml"]
    # header text stays out of the body paragraph count
    assert r["xml"].count("<paragraph ") == 1

    plain = parse_docx(build_docx(["p"]), "R-2")
    assert plain["headers"] == [] and "<header>" not in plain["xml"]

    corpus = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(build_docx(["p"])))],
        "doc_id long, content binary",
    )
    rows = {
        r["doc_id"]: r
        for r in parse_documents(corpus, on_error="raise").collect()
    }
    assert rows[1]["n_headers"] == 2 and rows[2]["n_headers"] == 0


def test_parse_docx_cumulative_actual_bytes_bound():
    """Members that each pass the PER-MEMBER actual-bytes cap can still
    sum past the package bound (each header under-declares, the
    declared-total precheck passes, but the real inflated sizes
    accumulate): the cumulative ACTUAL budget threaded through
    _read_bounded must trip, preventing the multi-member zip-bomb OOM
    that escapes on_error='report' row isolation."""
    import io
    import zipfile

    from da_transform_judgments_pipeline_spark.plans import docx_parser
    from da_transform_judgments_pipeline_spark.plans.docx_parser import (
        DocxBombError,
        build_docx,
    )

    blob = build_docx(
        ["alpha " * 50],
        title="T",
        images={"a.png": b"\x01" * 400, "b.png": b"\x02" * 400},
    )
    orig_total = docx_parser.DOCX_MAX_TOTAL_BYTES
    try:
        # each member is under the (untouched) per-member cap; reading
        # them back-to-back against one budget must raise at the member
        # that pushes the running ACTUAL total past the package bound
        docx_parser.DOCX_MAX_TOTAL_BYTES = 500
        budget = [0]
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            with pytest.raises(DocxBombError, match="total decompressed"):
                for name in sorted(zf.namelist()):
                    docx_parser._read_bounded(zf, name, budget)
        assert budget[0] > 500  # tripped ON the cumulative check
    finally:
        docx_parser.DOCX_MAX_TOTAL_BYTES = orig_total


def test_docx_hyperlinks_roundtrip(spark, store):
    """Hyperlinks (w:hyperlink + externally-targeted relationships —
    how judgments cite legislation and earlier cases): anchors resolve
    to their URLs through the rels part, land in the AKN meta as
    TLCReference elements, anchor text stays in the searchable
    paragraph stream, and the same package parses through the REAL
    subprocess boundary."""
    from da_transform_judgments_pipeline_spark.plans.docx_parser import (
        build_docx,
        parse_docx,
    )
    from da_transform_judgments_pipeline_spark.plans.editorial import (
        parse_documents,
    )

    kw = dict(
        title="L v M",
        links=[
            ("Human Rights Act 1998", "https://legislation.example/1998/42"),
            ("[2019] EWCA Civ 7", "https://caselaw.example/ewca/civ/7"),
        ],
    )
    blob = build_docx(["Heading", "Body"], **kw)
    assert blob == build_docx(["Heading", "Body"], **kw)  # deterministic
    r = parse_docx(blob, "R-1")
    assert r["links"] == kw["links"]
    # each link is its own paragraph; anchor text searchable
    assert r["xml"].count("<paragraph ") == 4
    assert "Human Rights Act 1998" in r["xml"]
    assert (
        'href="https://legislation.example/1998/42"' in r["xml"]
        and "TLCReference" in r["xml"]
    )
    # the citation regex sees anchor text (link paragraphs join the
    # full-text stream)
    assert r["metadata"]["cite"] == "[2019] EWCA Civ 7"

    # corpus operator counts
    corpus = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(build_docx(["plain"])))],
        "doc_id long, content binary",
    )
    rows = {
        r["doc_id"]: r
        for r in parse_documents(corpus, on_error="raise").collect()
    }
    assert rows[1]["n_links"] == 2 and rows[2]["n_links"] == 0

    # the real subprocess boundary
    doc = os.path.join(
        store, "consignments", "judgment", REF, "0", REF, "data", "doc.docx"
    )
    with open(doc, "wb") as f:
        f.write(blob)
    staged = editorial.prepare_parser_input(
        spark, _validated_event(store), store
    )
    assert staged["error"] is False, staged
    parser = editorial.subprocess_parser(_real_parser_cmd(), timeout_s=120)
    outputs = parser(staged["parser-inputs"])
    assert outputs["error-messages"] == []


def test_docx_footnotes_roundtrip_and_citation_from_note():
    """Footnotes: a real word/footnotes.xml part round-trips through
    build_docx -> parse_docx, references count from the body, a neutral
    citation present ONLY in a footnote is still extracted, and the AKN
    render carries authorialNote elements without inflating the
    paragraph count."""
    import pytest as _pytest

    from da_transform_judgments_pipeline_spark.plans.docx_parser import (
        build_docx,
        parse_docx,
    )

    notes = ["See [2019] UKSC 41.", "Cf. earlier order.", "Third note."]
    blob = build_docx(
        ["Intro paragraph.", "Second paragraph."],
        title="T",
        footnotes=notes,
    )
    r = parse_docx(blob, "x")
    assert r["footnotes"] == notes
    assert r["n_footnote_refs"] == 3
    assert r["metadata"]["cite"] == "[2019] UKSC 41"
    assert "<authorialNote" in r["xml"] and 'marker="3"' in r["xml"]
    assert r["xml"].count("<paragraph ") == 2
    plain = parse_docx(build_docx(["a"]), "y")
    assert plain["footnotes"] == [] and plain["n_footnote_refs"] == 0
    with _pytest.raises(ValueError, match="at least one paragraph"):
        build_docx([], footnotes=["orphan"])


def test_docx_endnotes_and_comments_roundtrip():
    """Endnotes (word/endnotes.xml) and comments (word/comments.xml):
    both round-trip through build_docx → parse_docx with body-anchored
    reference counts; a citation present ONLY in an endnote is still
    extracted (endnotes are judgment text) while comment text is
    EXCLUDED from citation search (editorial apparatus); the AKN render
    carries endnotes as placed authorialNote elements and never inflates
    the paragraph count."""
    import pytest as _pytest

    from da_transform_judgments_pipeline_spark.plans.docx_parser import (
        build_docx,
        parse_docx,
    )

    ends = ["See [2020] EWHC 99 (Admin).", "Final endnote."]
    cmts = [("Editor", "check this"), ("QA", "approved")]
    blob = build_docx(
        ["Intro paragraph.", "Second paragraph."],
        title="T",
        endnotes=ends,
        comments=cmts,
    )
    r = parse_docx(blob, "x")
    assert r["endnotes"] == ends
    assert r["n_endnote_refs"] == 2
    assert r["comments"] == cmts
    assert r["n_comment_refs"] == 2
    # endnote text reaches the citation scan...
    assert r["metadata"]["cite"] == "[2020] EWHC 99 (Admin)"
    assert 'eId="endnote_2"' in r["xml"] and 'marker="e2"' in r["xml"]
    assert r["xml"].count("<paragraph ") == 2
    # ...but a citation that exists ONLY in a comment is NOT extracted
    only_cmt = parse_docx(
        build_docx(["plain body"],
                   comments=[("E", "see [2018] UKSC 7")]), "y",
    )
    assert only_cmt["metadata"]["cite"] is None
    assert only_cmt["comments"] == [("E", "see [2018] UKSC 7")]
    plain = parse_docx(build_docx(["a"]), "z")
    assert plain["endnotes"] == [] and plain["comments"] == []
    with _pytest.raises(ValueError, match="at least one paragraph"):
        build_docx([], endnotes=["orphan"])
    with _pytest.raises(ValueError, match="at least one paragraph"):
        build_docx([], comments=[("a", "b")])
