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
