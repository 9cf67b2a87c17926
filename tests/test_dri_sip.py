"""Golden tests for the BagIt → DRI SIP transform.

Mirrors the reference's byte-exact expectations
(testing/tre_bagit_to_dri_sip/test_bagit_transforms.py:48-79 and the
behave features): TDR v1.1 and v1.2 inputs both produce identical
metadata.csv / closure.csv strings.
"""

import pytest

from da_transform_judgments_pipeline_spark.operators.dri_sip import (
    dri_closure,
    dri_config,
    dri_metadata,
    to_closure_csv,
    to_metadata_csv,
)
from da_transform_judgments_pipeline_spark.sources.bagit import read_file_metadata
from da_transform_judgments_pipeline_spark.sources.manifest import read_manifest

CHECKSUM = "5bd8879fba139fed98c048261cb2a91d727ceafb27414cc54e21c26915e9e40f"

CSV_V11 = (
    "Filepath,FileName,FileType,Filesize,RightsCopyright,LegalStatus,HeldBy,"
    "Language,FoiExemptionCode,LastModified\n"
    "data/content/file-c1.txt,file-c1.txt,File,12825,Crown Copyright,"
    "Public Record,TNA,English,open,2022-09-29T15:10:20\n"
    "data/content,content,Folder,,Crown Copyright,Public Record,TNA,English,open,\n"
)

CSV_V12 = (
    "Filepath,FileName,FileType,Filesize,RightsCopyright,LegalStatus,HeldBy,"
    "Language,FoiExemptionCode,LastModified,OriginalFilePath\n"
    'data/content/file-c1.txt,file-c1.txt,File,36,Crown Copyright,'
    'Public Record(s),"The National Archives, Kew",English,,2022-09-29T15:10:20,\n'
    'data/content,content,Folder,,Crown Copyright,Public Record(s),'
    '"The National Archives, Kew",English,,,\n'
)

EXPECTED_METADATA = (
    "identifier,file_name,folder,date_last_modified,checksum,rights_copyright,"
    "legal_status,held_by,language,TDR_consignment_ref\n"
    "file:/MOCKA101Y22TBAA1/MOCKA_101/content/file-c1.txt,file-c1.txt,file,"
    f"2022-09-29T15:10:20,{CHECKSUM},Crown Copyright,Public Record(s),"
    '"The National Archives, Kew",English,TDR-2022-AA1\n'
    "file:/MOCKA101Y22TBAA1/MOCKA_101/content/,content,folder,"
    "2022-07-18T12:45:45,,Crown Copyright,Public Record(s),"
    '"The National Archives, Kew",English,TDR-2022-AA1\n'
)

EXPECTED_CLOSURE = (
    "identifier,folder,closure_start_date,closure_period,foi_exemption_code,"
    "foi_exemption_asserted,title_public,title_alternate,closure_type\n"
    "file:/MOCKA101Y22TBAA1/MOCKA_101/content/file-c1.txt,file,,0,open,,TRUE,"
    ",open_on_transfer\n"
    "file:/MOCKA101Y22TBAA1/MOCKA_101/content/,folder,,0,open,,TRUE,,"
    "open_on_transfer\n"
)

MANIFEST_TEXT = f"{CHECKSUM}  data/content/file-c1.txt\n"


@pytest.fixture(scope="module")
def bagit_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bagit")
    (d / "file-metadata-v11.csv").write_text(CSV_V11)
    (d / "file-metadata-v12.csv").write_text(CSV_V12)
    (d / "manifest-sha256.txt").write_text(MANIFEST_TEXT)
    return d


@pytest.fixture(scope="module")
def config():
    return dri_config("TDR-2022-AA1", "MOCKA 101")


def _load(spark, bagit_dir, version):
    fm = read_file_metadata(spark, str(bagit_dir / f"file-metadata-{version}.csv"))
    mf = read_manifest(spark, str(bagit_dir / "manifest-sha256.txt"))
    return fm, mf


def test_dri_config(config):
    assert config["BATCH"] == "MOCKA101Y22TBAA1"
    assert config["SERIES"] == "MOCKA_101"
    assert config["IDENTIFIER_PREFIX"] == "file:/MOCKA101Y22TBAA1/MOCKA_101/"
    assert config["METADATA_CHECKSUM_IN_SIP"] == (
        "MOCKA101Y22TBAA1/MOCKA_101/metadata.csv.sha256"
    )


@pytest.mark.parametrize("version", ["v11", "v12"])
def test_metadata_golden(spark, bagit_dir, config, version):
    fm, mf = _load(spark, bagit_dir, version)
    df = dri_metadata(
        fm, mf, "TDR-2022-AA1", "2022-07-18T12:45:45Z",
        config["IDENTIFIER_PREFIX"],
    )
    assert to_metadata_csv(df) == EXPECTED_METADATA


@pytest.mark.parametrize("version", ["v11", "v12"])
def test_closure_golden(spark, bagit_dir, config, version):
    fm, mf = _load(spark, bagit_dir, version)
    df = dri_closure(fm, config["IDENTIFIER_PREFIX"])
    assert to_closure_csv(df) == EXPECTED_CLOSURE


def test_unknown_enum_value_errors(spark, bagit_dir, config):
    bad = CSV_V11.replace("Crown Copyright", "Unknown Rights")
    p = bagit_dir / "bad.csv"
    p.write_text(bad)
    fm = read_file_metadata(spark, str(p))
    mf = read_manifest(spark, str(bagit_dir / "manifest-sha256.txt"))
    df = dri_metadata(
        fm, mf, "TDR-2022-AA1", "2022-07-18T12:45:45Z",
        config["IDENTIFIER_PREFIX"],
    )
    with pytest.raises(Exception, match="not expected for key"):
        df.collect()


def test_broadcast_join_in_plan(spark, bagit_dir, config):
    fm, mf = _load(spark, bagit_dir, "v11")
    df = dri_metadata(
        fm, mf, "TDR-2022-AA1", "2022-07-18T12:45:45Z",
        config["IDENTIFIER_PREFIX"],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
