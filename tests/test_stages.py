"""End-to-end pipeline-stage tests (SURVEY.md §3.2 entry point B).

Builds a real BagIt tar.gz + sidecar, then chains
bagit-available → validate_bagit → validate_bagit_files → bagit_to_dri_sip,
checking event envelopes, lineage accumulation, and the SIP archive content
(mirrors testing/tre_bagit_then_files_v2/run.py:17-21 and the module tests).
"""

import hashlib
import io
import json
import tarfile

import pytest

from da_transform_judgments_pipeline_spark.plans import legacy
from da_transform_judgments_pipeline_spark.plans.events import create_event
from da_transform_judgments_pipeline_spark.plans.stages import (
    EVENT_BAGIT_ERROR,
    EVENT_BAGIT_RECEIVED,
    EVENT_BAGIT_VALIDATED,
    EVENT_SIP_AVAILABLE,
    StageContext,
    bagit_to_dri_sip,
    validate_bagit,
    validate_bagit_files,
)

REF = "TDR-2022-AA1"

FILE_METADATA = (
    "Filepath,FileName,FileType,Filesize,RightsCopyright,LegalStatus,HeldBy,"
    "Language,FoiExemptionCode,LastModified\n"
    "data/content/file-c1.txt,file-c1.txt,File,5,Crown Copyright,"
    "Public Record,TNA,English,open,2022-09-29T15:10:20\n"
    "data/content,content,Folder,,Crown Copyright,Public Record,TNA,English,open,\n"
)

BAG_INFO = (
    "Consignment-Series: MOCKA 101\n"
    f"Internal-Sender-Identifier: {REF}\n"
    "Consignment-Export-Datetime: 2022-07-18T12:45:45Z\n"
)

BAGIT_TXT = "BagIt-Version: 0.97\nTag-File-Character-Encoding: UTF-8\n"
DATA_FILE = b"hello"


def sha(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()


def build_bagit_tar_gz() -> bytes:
    """BagIt with correct manifests: data/ file + tag files at root."""
    data_manifest = f"{sha(DATA_FILE)}  data/content/file-c1.txt\n"
    root_files = {
        "bagit.txt": BAGIT_TXT.encode(),
        "bag-info.txt": BAG_INFO.encode(),
        "file-metadata.csv": FILE_METADATA.encode(),
        "manifest-sha256.txt": data_manifest.encode(),
    }
    tag_manifest = "".join(
        f"{sha(content)}  {name}\n" for name, content in root_files.items()
    )
    entries = dict(root_files)
    entries["tagmanifest-sha256.txt"] = tag_manifest.encode()
    entries["data/content/file-c1.txt"] = DATA_FILE

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        for name, content in entries.items():
            info = tarfile.TarInfo(name=f"{REF}/{name}")
            info.size = len(content)
            info.mtime = 1660000000
            tf.addfile(info, io.BytesIO(content))
    return buf.getvalue()


@pytest.fixture(scope="module")
def delivery(tmp_path_factory):
    d = tmp_path_factory.mktemp("delivery")
    blob = build_bagit_tar_gz()
    (d / f"{REF}.tar.gz").write_bytes(blob)
    (d / f"{REF}.tar.gz.sha256").write_text(f"{sha(blob)}  {REF}.tar.gz\n")
    return d


@pytest.fixture()
def ctx(tmp_path):
    return StageContext(store_root=str(tmp_path / "store"),
                        out_root=str(tmp_path / "out"))


def available_event(delivery, retries=0):
    return create_event(
        environment="test",
        producer="TDR",
        process="consignment-export",
        event_name="bagit-available",
        type="judgment",
        parameters={
            "bagit-available": {
                "resource": {"value": str(delivery / f"{REF}.tar.gz")},
                "resource-validation": {
                    "value": str(delivery / f"{REF}.tar.gz.sha256")
                },
                "number-of-retries": retries,
                "reference": REF,
            }
        },
    )


def test_ok_path_end_to_end(spark, delivery, ctx):
    e0 = available_event(delivery)
    e1 = validate_bagit(spark, e0, ctx)
    assert e1["producer"]["event-name"] == EVENT_BAGIT_RECEIVED, e1
    # lineage accumulated, prior list copied not referenced (T7)
    assert len(e1["UUIDs"]) == 2 and len(e0["UUIDs"]) == 1
    assert e1["producer"]["type"] == "judgment"  # inherited from prior

    e2 = validate_bagit_files(spark, e1, ctx)
    assert e2["producer"]["event-name"] == EVENT_BAGIT_VALIDATED, e2
    vf = e2["parameters"][EVENT_BAGIT_VALIDATED]["validated-files"]
    assert len(vf["root"]) == 4 and len(vf["data"]) == 1
    assert len(e2["UUIDs"]) == 3

    e3 = bagit_to_dri_sip(spark, e2, ctx)
    assert e3["producer"]["event-name"] == EVENT_SIP_AVAILABLE, e3
    sip_path = e3["parameters"][EVENT_SIP_AVAILABLE]["s3-folder-url"]
    with tarfile.open(sip_path, "r:gz") as tf:
        names = sorted(m.name for m in tf if m.isfile())
        metadata_csv = tf.extractfile(
            "MOCKA101Y22TBAA1/MOCKA_101/metadata.csv"
        ).read().decode()
    assert names == [
        "MOCKA101Y22TBAA1/MOCKA_101/closure.csv",
        "MOCKA101Y22TBAA1/MOCKA_101/closure.csv.sha256",
        "MOCKA101Y22TBAA1/MOCKA_101/closure.csvs",
        "MOCKA101Y22TBAA1/MOCKA_101/content/file-c1.txt",
        "MOCKA101Y22TBAA1/MOCKA_101/metadata.csv",
        "MOCKA101Y22TBAA1/MOCKA_101/metadata.csv.sha256",
        "MOCKA101Y22TBAA1/MOCKA_101/metadata.csvs",
    ]
    assert f"{sha(DATA_FILE)}" in metadata_csv
    assert "Public Record(s)" in metadata_csv
    # sidecar of the sip archive exists and verifies
    sidecar = open(sip_path + ".sha256").read()
    assert sidecar.endswith("MOCKA101Y22TBAA1.tar.gz\n")
    assert sidecar.split()[0] == sha(open(sip_path, "rb").read())


def test_bad_sidecar_checksum_routes_error(spark, delivery, ctx, tmp_path):
    bad = tmp_path / "bad-delivery"
    bad.mkdir()
    (bad / f"{REF}.tar.gz").write_bytes((delivery / f"{REF}.tar.gz").read_bytes())
    (bad / f"{REF}.tar.gz.sha256").write_text(f"{'0'*64}  {REF}.tar.gz\n")
    e1 = validate_bagit(spark, available_event(bad), ctx)
    assert e1["producer"]["event-name"] == EVENT_BAGIT_ERROR
    errs = e1["parameters"][EVENT_BAGIT_ERROR]["errors"]
    assert len(errs) == 1 and "Checksum mismatch" in errs[0]


def test_wrong_basename_routes_error(spark, delivery, ctx, tmp_path):
    bad = tmp_path / "bad-name"
    bad.mkdir()
    blob = (delivery / f"{REF}.tar.gz").read_bytes()
    (bad / f"{REF}.tar.gz").write_bytes(blob)
    (bad / f"{REF}.tar.gz.sha256").write_text(f"{sha(blob)}  other.tar.gz\n")
    e1 = validate_bagit(spark, available_event(bad), ctx)
    assert e1["producer"]["event-name"] == EVENT_BAGIT_ERROR
    assert "does not match" in e1["parameters"][EVENT_BAGIT_ERROR]["errors"][0]


def test_corrupt_inner_manifest_routes_error(spark, ctx, tmp_path):
    """F9 failure injection: valid sidecar, corrupted inner data manifest."""
    blob = build_bagit_tar_gz()
    # rebuild with a wrong checksum inside manifest-sha256.txt
    buf = io.BytesIO()
    with tarfile.open(fileobj=io.BytesIO(blob), mode="r:gz") as src, tarfile.open(
        fileobj=buf, mode="w:gz"
    ) as dst:
        for m in src:
            if not m.isfile():
                continue
            content = src.extractfile(m).read()
            if m.name.endswith("/manifest-sha256.txt"):
                content = f"{'f'*64}  data/content/file-c1.txt\n".encode()
            info = tarfile.TarInfo(name=m.name)
            info.size = len(content)
            dst.addfile(info, io.BytesIO(content))
    bad_blob = buf.getvalue()
    d = tmp_path / "corrupt"
    d.mkdir()
    (d / f"{REF}.tar.gz").write_bytes(bad_blob)
    (d / f"{REF}.tar.gz.sha256").write_text(f"{sha(bad_blob)}  {REF}.tar.gz\n")

    e1 = validate_bagit(spark, available_event(d), ctx)
    assert e1["producer"]["event-name"] == EVENT_BAGIT_RECEIVED
    e2 = validate_bagit_files(spark, e1, ctx)
    assert e2["producer"]["event-name"] == EVENT_BAGIT_ERROR
    errs = e2["parameters"][EVENT_BAGIT_ERROR]["errors"]
    assert "does not match expected checksum" in errs[0]


def test_event_json_round_trip(delivery):
    e0 = available_event(delivery)
    assert json.loads(json.dumps(e0)) == e0


# ---------------------------------------------------------------------------
# v1 (legacy) flat-message entry path (SURVEY.md §3.1)
# ---------------------------------------------------------------------------

def v1_message(delivery, retries=0):
    """testing/README.md:74-83 message format (legacy 'judgement'
    spelling exercised deliberately)."""
    return {
        "consignment-reference": REF,
        "s3-bagit-url": str(delivery / f"{REF}.tar.gz"),
        "s3-sha-url": str(delivery / f"{REF}.tar.gz.sha256"),
        "consignment-type": "judgement",
        "number-of-retries": retries,
    }


def test_v1_execution_name_shape(delivery):
    name = legacy.v1_execution_name(
        v1_message(delivery, retries=1), queue="tre-tdr-in", unique_id="ab12"
    )
    assert name == f"tre-{REF}-1-tre-tdr-in-ab12"
    # tdr_message.py missing-field fallback
    assert legacy.v1_execution_name({}, unique_id="u").startswith("tre-X-X-")


def test_v1_to_v2_df_matches_dict_adapter(spark, delivery):
    """The distributed adapter row-for-row mirrors v1_to_v2_event /
    v1_execution_name: type normalization (any-case 'judgement' →
    'judgment', unknown → NULL), retries default 0, and the execution
    name's missing-field fallback to 'X'."""
    rows = [
        ("TDR-1", "s3://b/1.tar.gz", "s3://b/1.sha", "judgement", 1, "u1"),
        ("TDR-2", "s3://b/2.tar.gz", "s3://b/2.sha", "JUDGMENT", None, "u2"),
        ("TDR-3", "s3://b/3.tar.gz", "s3://b/3.sha", "standard", 0, "u3"),
        ("TDR-4", "s3://b/4.tar.gz", "s3://b/4.sha", "litigation", 2, "u4"),
    ]
    df = spark.createDataFrame(
        rows, "reference string, bagit_url string, sha_url string, "
        "ctype string, retries int, uid string"
    )
    got = {
        r["reference"]: r
        for r in legacy.v1_to_v2_df(df, queue="tre-tdr-in").collect()
    }
    assert got["TDR-1"]["type"] == "judgment"
    assert got["TDR-2"]["type"] == "judgment"
    assert got["TDR-3"]["type"] == "standard"
    assert got["TDR-4"]["type"] is None  # unknown type → error path
    assert got["TDR-2"]["number_of_retries"] == 0
    assert got["TDR-2"]["execution_name"] == "tre-TDR-2-X-tre-tdr-in-u2"
    # parity with the dict-side name builder at identical inputs
    assert got["TDR-1"]["execution_name"] == legacy.v1_execution_name(
        v1_message(delivery, retries=1) | {"consignment-reference": "TDR-1"},
        queue="tre-tdr-in",
        unique_id="u1",
    )
    assert got["TDR-1"]["resource_value"] == "s3://b/1.tar.gz"
    assert got["TDR-1"]["resource_validation_value"] == "s3://b/1.sha"


def test_v1_ok_path_through_shared_stages(spark, delivery, ctx):
    out = legacy.validate_bagit_v1(spark, v1_message(delivery), ctx)
    assert out["error"] is False
    assert "error-message" not in out
    assert out["s3-bagit-name"].endswith(f"{REF}.tar.gz")
    # output-message: URL fields blanked, counter NOT incremented
    om = out["output-message"]
    assert om["s3-bagit-url"] == "" and om["s3-sha-url"] == ""
    assert om["number-of-retries"] == 0
    # the v2 event feeds the existing downstream stages unchanged
    e2 = validate_bagit_files(spark, out["v2-event"], ctx)
    assert e2["producer"]["event-name"] == EVENT_BAGIT_VALIDATED
    # legacy "judgement" normalized into the v2 enum
    assert out["v2-event"]["producer"]["type"] == "judgment"


def test_v1_error_path_increments_counter(spark, delivery, ctx, tmp_path):
    bad = tmp_path / "v1bad"
    bad.mkdir()
    (bad / f"{REF}.tar.gz").write_bytes(
        (delivery / f"{REF}.tar.gz").read_bytes()
    )
    (bad / f"{REF}.tar.gz.sha256").write_text(f"{'0'*64}  {REF}.tar.gz\n")
    out = legacy.validate_bagit_v1(spark, v1_message(bad, retries=1), ctx)
    assert out["error"] is True
    assert "checksum" in out["error-message"].lower()
    # reference parity: the re-queue copy carries the bumped counter
    assert out["output-message"]["number-of-retries"] == 2


def test_write_sorted_parquet_layout(spark, tmp_path):
    """The balanced writer produces a range-partitioned, within-file
    sorted layout: files' key ranges are disjoint and each file is
    internally ordered — the properties that make footer-stat pruning
    and tight row groups work at scale."""
    from pyspark.sql import functions as F

    from da_transform_judgments_pipeline_spark.sources.sinks import (
        write_sorted_parquet,
    )

    df = spark.range(10_000).select(
        (F.col("id") * 7919 % 10_000).alias("k"),
        F.col("id").alias("payload"),
    )
    out = str(tmp_path / "sorted")
    n = write_sorted_parquet(df, out, ["k"], target_file_mb=1)
    assert n >= 1
    back = spark.read.parquet(out)
    assert back.count() == 10_000
    import glob
    import os

    files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert len(files) >= 1
    ranges = []
    for f in files:
        part = spark.read.parquet(f).select("k").collect()
        ks = [r.k for r in part]
        assert ks == sorted(ks)  # within-file order
        if ks:
            ranges.append((min(ks), max(ks)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint file key ranges
