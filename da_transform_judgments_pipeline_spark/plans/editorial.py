"""Parser staging + editorial integration stages (SURVEY.md §3.1 steps 3-7,
§3.3): the reference's `tre-prepare-parser-input` and
`tre-editorial-integration` Lambdas as composable event→dict functions.

Reference citations:

- prepare_parser_input ← tre-prepare-parser-input/prepare_parser_input.py:37-198
  (stage copies + presigned document-url + `{context, parser-inputs}` output)
- parser RPC contract  ← prepare_parser_input.py:92-103 (inputs) and
  testing/parser_testing/test_parser_lambda_fn.py:82-134 (outputs); the
  external .NET parser itself (tre-run-judgment-parser/Dockerfile:31) is a
  black box behind :data:`Parser` — :func:`fake_parser` is a clearly-marked
  deterministic stand-in that honors the exact I/O contract.
- editorial_integration ← tre-editorial-integration/tre_editorial_integration.py:122-132
  (P9 list/dict dispatch), :146-165 (P10 block locators), :197-242 (P11
  field-presence validation), :179-191 (T10 first-run guard), :244-334
  (ParserHandler packaging), :386-430 (TRE metadata merge), :472-542
  (RetryHandler, T9/W3).

Spark-first shape: the per-file work (copies, checksums, tar pack) runs as
DataFrame plans over the store catalog — executor-parallel where the
reference loops sequentially; only the event-level control flow (a handful
of dict fields per consignment) stays on the driver.
"""

from __future__ import annotations

import hashlib
import json
import os
import posixpath
from collections.abc import Callable

from pyspark.errors import AnalysisException
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..sources.archive import tar_gz_pack
from ..sources.catalog import max_numeric_subfolder, read_file_catalog
from ..sources.ingest import presigned_url
from ..sources.sinks import write_single_text

PRODUCER_NAME = "TRE"
OUTPUT_MESSAGE_FILE = "output-message.json"
FILE_TRE_METADATA = "metadata.json"
# deterministic far-future default so URL generation is reproducible;
# production passes a real epoch
DEFAULT_EXPIRES_AT = 2**31 - 1
DEFAULT_SIGNING_KEY = b"tre-signing-key"


class EditorialIntegrationError(ValueError):
    """Parity with TEEditorialIntegrationError."""


# ---------------------------------------------------------------------------
# stage: prepare parser input
# ---------------------------------------------------------------------------

def prepare_parser_input(
    spark: SparkSession,
    event: dict,
    store: str,
    expires_at: int = DEFAULT_EXPIRES_AT,
    signing_key: bytes = DEFAULT_SIGNING_KEY,
) -> dict:
    """`bagit-validated` parameters → `{context, parser-inputs}` | error.

    Copies the judgment document plus `bagit.txt` (as `bagit-info.txt`) and
    `bag-info.txt` into `parsed/{type}/{reference}/{retry}/` and mints a
    presigned document-url (reference: prepare_parser_input.py:37-198,
    including the error envelope :183-187). The copies run as one
    distributed catalog read + partition write, not sequential GETs.
    """
    output: dict = {"error": False}
    try:
        p = event["parameters"]["bagit-validated"]
        reference = p["reference"]
        validated = p["validated-files"]
        doc_key = validated["data"][0]
        filename = posixpath.basename(doc_key)
        root = validated["path"]
        # key convention consignments/{type}/{reference}/{retry}/... (§1.1)
        parts = root.strip("/").split("/")
        ctype, retry = parts[1], int(parts[3])
        out_prefix = f"parsed/{ctype}/{reference}/{retry}/"

        copies = [
            (doc_key, filename),
            (f"{root}/bagit.txt", "bagit-info.txt"),
            (f"{root}/bag-info.txt", "bag-info.txt"),
        ]
        src = read_file_catalog(spark, [f"{store}/{k}" for k, _ in copies])
        dest_by_base = {posixpath.basename(k): n for k, n in copies}
        _copy_catalog(src, dest_by_base, f"{store}/{out_prefix}")

        document_url = presigned_url(
            f"file://{store}", out_prefix + filename, expires_at, signing_key
        )
        output["context"] = {
            "number-of-retries": retry,
            "s3-bagit-name": "bagit-info.txt",
            "judgment-document": filename,
            "consignment-type": ctype,
            "bag-info-txt": "bag-info.txt",
        }
        output["parser-inputs"] = {
            "consignment-reference": reference,
            "s3-bucket": store,
            "document-url": document_url,
            "attachment-urls": [],
            "s3-output-prefix": out_prefix,
        }
    except Exception as e:
        output["error"] = True
        output["error-message"] = f"{e}"
    return output


def _copy_catalog(src, dest_by_base: dict[str, str], dest_root: str) -> None:
    """Distributed copy: each partition writes its rows under dest_root."""
    dest_root = dest_root.rstrip("/")
    rows = src.select(
        F.element_at(F.split("path", "/"), -1).alias("base"), "content"
    )

    def write_partition(it):
        for row in it:
            name = dest_by_base.get(row["base"], row["base"])
            path = os.path.join(dest_root, name)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "wb") as f:
                f.write(bytes(row["content"]))

    rows.foreachPartition(write_partition)


# ---------------------------------------------------------------------------
# parser RPC boundary
# ---------------------------------------------------------------------------

Parser = Callable[[dict], dict]
"""The external document parser: parser-inputs dict → parser-outputs dict.
Production wires an RPC to the .NET parser service; tests use
:func:`fake_parser`."""


def subprocess_parser(
    command: list[str],
    timeout_s: float = 60.0,
    attempts: int = 2,
) -> Parser:
    """Wrap an external parser EXECUTABLE as a :data:`Parser` — the real
    process boundary the reference crosses into its .NET parser container
    (tre-run-judgment-parser/Dockerfile:1-31): parser-inputs go to the
    child's stdin as one JSON document, parser-outputs come back on
    stdout as one JSON document.

    Failure semantics follow the parser-outputs contract
    (test_parser_lambda_fn.py:82-134) rather than Python exceptions: a
    parser that hangs (killed at ``timeout_s``), crashes (non-zero exit;
    stderr tail captured), or writes garbage produces a parser-outputs
    block with ``error-messages`` populated and the artifact fields None
    — so the editorial stage still builds its TRE metadata (None members
    are skipped from the tar, exactly the reference's optional-artifact
    handling) and the orchestration layer routes the attempt through the
    T4 retry loop like any other stage error. Transient flakiness is
    absorbed here first: up to ``attempts`` tries per call, each failed
    try recorded in ``error-messages`` (a success after a failed try
    returns the parser's own output with the earlier failure appended,
    keeping the audit trail)."""
    import subprocess

    required = ("xml", "metadata", "images", "log", "error-messages")

    def call(parser_inputs: dict) -> dict:
        errors: list[str] = []
        for attempt in range(1, attempts + 1):
            tag = f"attempt {attempt}/{attempts}"
            try:
                proc = subprocess.run(
                    list(command),
                    input=json.dumps(parser_inputs).encode(),
                    capture_output=True,
                    timeout=timeout_s,
                )
            except subprocess.TimeoutExpired:
                errors.append(f"{tag}: parser timed out after {timeout_s}s")
                continue
            if proc.returncode != 0:
                tail = proc.stderr.decode(errors="replace").strip()[-500:]
                errors.append(
                    f"{tag}: parser exited {proc.returncode}: {tail}"
                )
                continue
            try:
                out = json.loads(proc.stdout.decode())
                if not isinstance(out, dict):
                    raise ValueError("not a JSON object")
            except ValueError as exc:
                errors.append(f"{tag}: parser wrote invalid JSON ({exc})")
                continue
            missing = [k for k in required if k not in out]
            if missing:
                errors.append(f"{tag}: parser output missing keys {missing}")
                continue
            out["error-messages"] = list(out["error-messages"]) + errors
            return out
        return {
            "xml": None,
            "metadata": None,
            "images": [],
            "attachments": [],
            "log": None,
            "error-messages": errors,
        }

    return call


PARSED_DOC_SCHEMA = (
    "doc_id long, xml string, name string, cite string, court string,"
    " date string, n_paragraphs int, n_numbered int, n_tables int,"
    " n_table_cells int, n_headers int, n_links int, n_footnotes int,"
    " n_footnote_refs int, n_endnotes int, n_endnote_refs int,"
    " n_comments int, n_comment_refs int, n_images int"
)


def parse_documents(
    docs,
    id_col: str = "doc_id",
    content_col: str = "content",
    on_error: str = "report",
):
    """Distributed document transformation — the 100 TB shape of the
    reference's one-Lambda-per-document parser step: instead of one
    state-machine execution per judgment, the REAL docx parser
    (:func:`.docx_parser.parse_docx` — stdlib zip walk, WordprocessingML
    paragraph extraction, Dublin-Core props, neutral-citation regex,
    Akoma Ntoso render) fans out over the corpus as an Arrow-batched
    ``mapInPandas`` stage. One row in (id, docx bytes) → one row out
    (id, judgment XML, extracted metadata fields, paragraph/image
    counts).

    ``on_error='report'`` (default — a corpus ALWAYS has corrupt
    members) appends an ``error`` column (NULL on success) and yields an
    error row per undecodable package instead of failing the job;
    ``'raise'`` keeps the strict single-document contract and, like the
    multimodal report-mode twins, omits the column (it could never be
    non-NULL). Everything here is executor-side pure Python over Arrow
    batches: no driver loop, no subprocess per row (the subprocess
    boundary exists for out-of-process parsers — editorial.
    subprocess_parser; this path runs the in-process library parser at
    corpus scale)."""
    if on_error not in ("raise", "report"):
        raise ValueError(
            f"on_error must be 'raise' or 'report', not {on_error!r}"
        )
    report = on_error == "report"

    src = docs.select(
        F.col(id_col).alias("doc_id"), F.col(content_col).alias("_blob")
    )

    cols = [
        "doc_id", "xml", "name", "cite", "court", "date",
        "n_paragraphs", "n_numbered", "n_tables", "n_table_cells",
        "n_headers", "n_links", "n_footnotes", "n_footnote_refs",
        "n_endnotes", "n_endnote_refs", "n_comments", "n_comment_refs",
        "n_images",
    ] + (["error"] if report else [])

    def run(batches):
        import pandas as pd

        from .docx_parser import parse_docx

        for pdf in batches:
            rows = []
            for did, blob in zip(pdf["doc_id"], pdf["_blob"]):
                try:
                    r = parse_docx(bytes(blob), str(did))
                    m = r["metadata"]
                    row = {
                        "doc_id": did,
                        "xml": r["xml"],
                        "name": m["name"],
                        "cite": m["cite"],
                        "court": m["court"],
                        "date": m["date"],
                        "n_paragraphs": r["xml"].count("<paragraph "),
                        "n_numbered": r["n_numbered"],
                        "n_tables": len(r["tables"]),
                        "n_table_cells": sum(
                            len(row) for rows in r["tables"] for row in rows
                        ),
                        "n_headers": len(r["headers"]),
                        "n_links": len(r["links"]),
                        "n_footnotes": len(r["footnotes"]),
                        "n_footnote_refs": r["n_footnote_refs"],
                        "n_endnotes": len(r["endnotes"]),
                        "n_endnote_refs": r["n_endnote_refs"],
                        "n_comments": len(r["comments"]),
                        "n_comment_refs": r["n_comment_refs"],
                        "n_images": len(r["images"]),
                    }
                    if report:
                        row["error"] = None
                except Exception as e:
                    if not report:
                        raise
                    row = {c: None for c in cols}
                    row["doc_id"] = did
                    row["error"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    schema = PARSED_DOC_SCHEMA + (", error string" if report else "")
    return src.mapInPandas(run, schema=schema)


PARSED_PDF_SCHEMA = (
    "doc_id long, text string, title string, author string,"
    " created string, cite string, court string, n_pages int,"
    " n_lines int, n_chars int, n_images int, n_compressed_streams int"
)


def parse_pdfs(
    docs,
    id_col: str = "doc_id",
    content_col: str = "content",
    on_error: str = "report",
):
    """Distributed PDF text extraction — :func:`parse_documents`'s twin
    for the OTHER dominant judgment/corpus format (the reference's
    parser consumes Office documents; a 100 TB training corpus is
    PDF-heavy). The REAL stdlib PDF parser
    (:func:`.pdf_parser.parse_pdf` — classic-xref object store, COS
    lexer, bounded FlateDecode, page-tree walk, BT/ET text-operator
    extraction, Info metadata, neutral-citation regex) fans out over
    the corpus as one Arrow-batched ``mapInPandas`` stage: one row in
    (id, pdf bytes) → one row out (id, extracted text + metadata +
    structure counts).

    ``on_error='report'`` (default) appends an ``error`` column (NULL
    on success) so one corrupt or bomb-bounded PDF isolates to its row
    instead of failing the corpus job; ``'raise'`` keeps the strict
    contract and omits the column."""
    if on_error not in ("raise", "report"):
        raise ValueError(
            f"on_error must be 'raise' or 'report', not {on_error!r}"
        )
    report = on_error == "report"

    src = docs.select(
        F.col(id_col).alias("doc_id"), F.col(content_col).alias("_blob")
    )

    cols = [
        "doc_id", "text", "title", "author", "created", "cite", "court",
        "n_pages", "n_lines", "n_chars", "n_images",
        "n_compressed_streams",
    ] + (["error"] if report else [])

    def run(batches):
        import pandas as pd

        from .pdf_parser import parse_pdf

        for pdf in batches:
            rows = []
            for did, blob in zip(pdf["doc_id"], pdf["_blob"]):
                try:
                    r = parse_pdf(bytes(blob), str(did))
                    row = {
                        "doc_id": did,
                        "text": r["text"],
                        "title": r["title"],
                        "author": r["author"],
                        "created": r["created"],
                        "cite": r["cite"],
                        "court": r["court"],
                        "n_pages": r["n_pages"],
                        "n_lines": len(r["lines"]),
                        "n_chars": len(r["text"]),
                        "n_images": r["n_images"],
                        "n_compressed_streams": r["n_compressed_streams"],
                    }
                    if report:
                        row["error"] = None
                except Exception as e:
                    if not report:
                        raise
                    row = {c: None for c in cols}
                    row["doc_id"] = did
                    row["error"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    schema = PARSED_PDF_SCHEMA + (", error string" if report else "")
    return src.mapInPandas(run, schema=schema)


def fake_parser(parser_inputs: dict) -> dict:
    """STUB — deterministic stand-in for the external .NET judgment parser
    (the real parser is a separate service; this container has no .NET).
    Honors the exact contract: reads the staged document under
    `s3-output-prefix`, writes `{reference}.xml`, `metadata.json` and
    `parser.log` next to it, returns the parser-outputs block
    (test_parser_lambda_fn.py:82-134 shape)."""
    store = parser_inputs["s3-bucket"]
    prefix = parser_inputs["s3-output-prefix"]
    ref = parser_inputs["consignment-reference"]
    doc_name = posixpath.basename(
        parser_inputs["document-url"].split("?", 1)[0]
    )
    doc_path = os.path.join(store, prefix, doc_name)
    with open(doc_path, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()

    xml_name, log_name = f"{ref}.xml", "parser.log"
    out_dir = os.path.join(store, prefix)
    with open(os.path.join(out_dir, xml_name), "w") as f:
        f.write(
            "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
            f"<judgment ref=\"{ref}\" source=\"{doc_name}\" "
            f"sha256=\"{digest}\"/>\n"
        )
    with open(os.path.join(out_dir, FILE_TRE_METADATA), "w") as f:
        json.dump(
            {
                "uri": f"https://caselaw.example/{ref}",
                "court": "EWHC",
                "cite": f"[{ref}]",
                "date": "1970-01-01",
                "name": f"Re {ref}",
                "attachments": [],
            },
            f,
        )
    with open(os.path.join(out_dir, log_name), "w") as f:
        f.write(f"parsed {doc_name} ok\n")
    return {
        "xml": xml_name,
        "metadata": FILE_TRE_METADATA,
        "images": [],
        "attachments": [],
        "log": log_name,
        "error-messages": [],
    }


# ---------------------------------------------------------------------------
# stage: editorial integration (P9 dispatch)
# ---------------------------------------------------------------------------

def editorial_integration(
    spark: SparkSession,
    event: list | dict,
    environment: str = "test",
    tre_version: str = "v0.1.0",
    lambda_versions: dict | None = None,
    expires_at: int = DEFAULT_EXPIRES_AT,
    signing_key: bytes = DEFAULT_SIGNING_KEY,
    store: str | None = None,
    parsed_root: str = "parsed/",
) -> dict:
    """P9 record-shape dispatch (tre_editorial_integration.py:122-132):
    list → parser-output handler, dict → retry handler."""
    if isinstance(event, list):
        return _parser_handler(
            spark, event, environment, tre_version, lambda_versions or {},
            expires_at, signing_key,
        )
    if isinstance(event, dict):
        if store is None:
            raise EditorialIntegrationError(
                "Retry handling requires the store root (reference: "
                "S3_BUCKET env var)"
            )
        return _retry_handler(
            spark, event, store, parsed_root, expires_at, signing_key
        )
    raise EditorialIntegrationError(
        "Invalid input event; expected list (from parser) or "
        "dictionary (from retry)"
    )


def _locate_blocks(event: list) -> tuple[dict, dict, dict]:
    """P10 block locators + A5 exactly-1 guards
    (tre_editorial_integration.py:146-165)."""
    context_block = [
        i for i in event
        if isinstance(i, dict) and "context" in i and "parser-inputs" in i
    ]
    if len(context_block) != 1:
        raise EditorialIntegrationError(
            'Error locating input parameter block with keys "context" and '
            f'"parser-inputs"; {len(context_block)} records found'
        )
    parser_output_block: list = []
    for i in event:
        if isinstance(i, list):
            parser_output_block = [
                j for j in i if isinstance(j, dict) and "parser-outputs" in j
            ]
            if parser_output_block:
                break
    if len(parser_output_block) != 1:
        raise EditorialIntegrationError(
            'Error locating input parameter block with key '
            f'"parser-outputs"; {len(parser_output_block)} records found'
        )
    return (
        context_block[0]["context"],
        context_block[0]["parser-inputs"],
        parser_output_block[0]["parser-outputs"],
    )


def _validate_fields(context: dict, parser_inputs: dict, parser_outputs: dict):
    """P11 field-presence validation with accumulated missing lists
    (tre_editorial_integration.py:197-242)."""
    missing = [
        k for k in (
            "number-of-retries", "bag-info-txt", "judgment-document",
            "consignment-type",
        ) if k not in context
    ]
    if missing:
        raise EditorialIntegrationError(
            f"Missing mandatory context block inputs: {missing}"
        )
    missing = [
        k for k in ("consignment-reference", "s3-bucket", "s3-output-prefix")
        if k not in parser_inputs
    ]
    if missing:
        raise EditorialIntegrationError(
            f"Missing mandatory parser input block inputs: {missing}"
        )
    missing = [
        k for k in ("xml", "metadata", "images", "log", "error-messages")
        if k not in parser_outputs
    ]
    if missing:
        raise EditorialIntegrationError(
            f"Missing mandatory parser output block inputs: {missing}"
        )


def _build_tre_metadata(
    context: dict,
    parser_inputs: dict,
    parser_outputs: dict,
    metadata_filename: str,
    parser_metadata: dict,
    bagit_info: dict,
    environment: str,
    tre_version: str,
    lambda_versions: dict,
) -> dict:
    """TRE metadata merge (tre_editorial_integration.py:386-430): parser
    metadata + bag-info + version fields under one parameters document."""
    parser_content = dict(parser_metadata)
    parser_content["error-messages"] = list(parser_outputs["error-messages"])
    tre_params = {
        "reference": f"{PRODUCER_NAME}-{parser_inputs['consignment-reference']}",
        f"{environment}-tre-version": tre_version,
        "payload": {
            "filename": context["judgment-document"],
            "xml": parser_outputs["xml"],
            "metadata": metadata_filename,
            "images": parser_outputs["images"],
            "log": parser_outputs["log"],
        },
    }
    tre_params.update(lambda_versions)
    return {
        "producer": {
            "name": PRODUCER_NAME,
            "process": "transform",
            "type": context["consignment-type"],
            "environment": environment,
        },
        "parameters": {
            PRODUCER_NAME: tre_params,
            "PARSER": parser_content,
            "TDR": dict(bagit_info),
        },
    }


def _parser_handler(
    spark: SparkSession,
    event: list,
    environment: str,
    tre_version: str,
    lambda_versions: dict,
    expires_at: int,
    signing_key: bytes,
) -> dict:
    """ParserHandler (tre_editorial_integration.py:244-334): build the TRE
    metadata file, pack `[metadata, xml, log, doc, images...]` into
    `TRE-{ref}.tar.gz` under editorial retry 0, write the `.sha256` sidecar,
    mint presigned URLs, persist the output message for retries."""
    context, parser_inputs, parser_outputs = _locate_blocks(event)
    _validate_fields(context, parser_inputs, parser_outputs)

    store = parser_inputs["s3-bucket"]
    prefix = parser_inputs["s3-output-prefix"]
    ref = parser_inputs["consignment-reference"]

    # T10 exactly-once guard: a numeric subfolder under the output prefix
    # means this consignment attempt was already integrated
    catalog = read_file_catalog(spark, f"{store}/{prefix}", with_content=False)
    prior = max_numeric_subfolder(catalog, f"file:{store}/{prefix}")
    if prior is not None:
        raise EditorialIntegrationError(
            f'First run of process found unexpected output folder "{prior}" '
            f'at path "{prefix}" in bucket "{store}".'
        )
    ed_retry = 0
    ed_prefix = f"{prefix}{ed_retry}/"

    # TRE metadata file (merge of parser metadata + bag-info + versions)
    metadata_name = f"{PRODUCER_NAME}-{ref}-{FILE_TRE_METADATA}"
    parser_metadata = (
        _read_json(os.path.join(store, prefix, parser_outputs["metadata"]))
        if parser_outputs["metadata"] else {}
    )
    bagit_info = _read_keyvalue(
        os.path.join(store, prefix, context["bag-info-txt"])
    )
    tre_metadata = _build_tre_metadata(
        context, parser_inputs, parser_outputs, metadata_name,
        parser_metadata, bagit_info, environment, tre_version,
        lambda_versions,
    )
    write_single_text(
        json.dumps(tre_metadata), os.path.join(store, ed_prefix, metadata_name)
    )

    # pack list (prepend the metadata file; skip parser files it omitted)
    to_tar = [ed_prefix + metadata_name]
    for name in (parser_outputs["xml"], parser_outputs["log"]):
        if name is not None:
            to_tar.append(prefix + name)
    to_tar.append(prefix + context["judgment-document"])
    for image in parser_outputs["images"] or []:
        to_tar.append(prefix + image)

    tar_key = f"{ed_prefix}{PRODUCER_NAME}-{ref}.tar.gz"
    # pack in to_tar order (metadata first — reference to_tar_list,
    # tre_editorial_integration.py:257-287), not alphabetically: the
    # ordinal is the position of the member's key suffix in to_tar
    ordinal = F.lit(len(to_tar)).cast("long")
    for i in range(len(to_tar) - 1, -1, -1):
        ordinal = F.when(
            F.col("path").endswith("/" + to_tar[i]), F.lit(i).cast("long")
        ).otherwise(ordinal)
    members = read_file_catalog(
        spark, [f"{store}/{k}" for k in to_tar]
    ).select(
        F.lit(tar_key).alias("archive"),
        F.element_at(F.split("path", "/"), -1).alias("name"),
        ordinal.alias("ord"),
        "content",
    )
    packed = tar_gz_pack(
        members, internal_prefix=f"{ref}/", order_col="ord"
    ).first()
    tar_path = os.path.join(store, tar_key)
    os.makedirs(os.path.dirname(tar_path), exist_ok=True)
    with open(tar_path, "wb") as f:
        f.write(bytes(packed["content"]))
    tar_items = [
        {"name": i["name"], "size": i["size"]} for i in packed["items"]
    ]

    # sha256 sidecar (one-row Spark scan, same plan as stage checksums)
    tar_checksum = (
        read_file_catalog(spark, f"{store}/{tar_key}")
        .select(F.sha2("content", 256).alias("sha"))
        .first()["sha"]
    )
    write_single_text(
        f"{tar_checksum} {PRODUCER_NAME}-{ref}.tar.gz",
        f"{store}/{tar_key}.sha256",
    )

    output_message = {
        "editorial-output": {
            "consignment-reference": ref,
            "s3-folder-url": presigned_url(
                f"file://{store}", tar_key, expires_at, signing_key
            ),
            "s3-sha256-url": presigned_url(
                f"file://{store}", tar_key + ".sha256", expires_at, signing_key
            ),
            "consignment-type": context["consignment-type"],
            "number-of-retries": ed_retry,
        },
        "tar-gz": {"bucket": store, "key": tar_key, "items": tar_items},
    }
    write_single_text(
        json.dumps(output_message),
        os.path.join(store, ed_prefix, OUTPUT_MESSAGE_FILE),
    )
    return output_message


def _retry_handler(
    spark: SparkSession,
    event: dict,
    store: str,
    parsed_root: str,
    expires_at: int,
    signing_key: bytes,
) -> dict:
    """RetryHandler (tre_editorial_integration.py:472-542): recover the
    persisted output message of the latest editorial attempt, enforce the
    monotonic retry sequence (W3: incoming == last + 1), regenerate the
    presigned URLs, bump the counter, persist under the new retry folder."""
    missing = [
        k for k in (
            "number-of-retries", "consignment-reference", "consignment-type",
        ) if k not in event
    ]
    if missing:
        raise EditorialIntegrationError(
            f"Missing mandatory input fields: {missing}"
        )
    ref = event["consignment-reference"]
    ctype = event["consignment-type"]

    tdr_root = f"{parsed_root}{ctype}/{ref}/"
    try:
        catalog = read_file_catalog(
            spark, f"{store}/{tdr_root}", with_content=False
        )
        latest_tdr = max_numeric_subfolder(
            catalog, f"file:{store}/{tdr_root}"
        )
    except AnalysisException:
        # binaryFile raises PATH_NOT_FOUND at load time when parsed/{type}/
        # {ref}/ doesn't exist; the reference's RetryHandler reports this as
        # its domain error (tre_editorial_integration.py:493-495)
        latest_tdr = None
    if latest_tdr is None:
        raise EditorialIntegrationError("No TDR output data found")

    ed_root = f"{tdr_root}{latest_tdr}/"
    last_ed = max_numeric_subfolder(catalog, f"file:{store}/{ed_root}")
    if last_ed is None:
        raise EditorialIntegrationError("No Editorial output data found")

    expected = int(last_ed) + 1
    if int(event["number-of-retries"]) != expected:
        raise EditorialIntegrationError(
            f'Expected number-of-retries to be "{expected}" but got '
            f'"{event["number-of-retries"]}"'
        )

    output_message = _read_json(
        os.path.join(store, ed_root, str(last_ed), OUTPUT_MESSAGE_FILE)
    )
    tar = output_message["tar-gz"]
    out = output_message["editorial-output"]
    out["s3-folder-url"] = presigned_url(
        f"file://{tar['bucket']}", tar["key"], expires_at, signing_key
    )
    out["s3-sha256-url"] = presigned_url(
        f"file://{tar['bucket']}", tar["key"] + ".sha256", expires_at,
        signing_key,
    )
    out["number-of-retries"] = expected
    write_single_text(
        json.dumps(output_message),
        os.path.join(store, ed_root, str(expected), OUTPUT_MESSAGE_FILE),
    )
    return output_message


def _read_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _read_keyvalue(path: str, sep: str = ":") -> dict:
    """bag-info key:value parse, left-most separator (object_lib.py:211-228)."""
    out = {}
    with open(path) as f:
        for line in f:
            if sep in line:
                k, v = line.split(sep, 1)
                out[k.strip()] = v.strip()
    return out
