"""Generate fixtures/batch_store — a deterministic multi-consignment
unpacked-bagit catalog for the b01 driver-contract query (plans/batch.py
batch_validation_report vs a DuckDB oracle over the same files).

Four consignments, one per outcome class:
- TDR-2026-AAA: fully valid
- TDR-2026-BBB: two data-manifest checksum mismatches
- TDR-2026-CCC: data manifest lists a file that does not exist
- TDR-2026-DDD: extra file on disk not listed anywhere (count mismatch)

Layout: fixtures/batch_store/<consignment>/<name>, where <name> is the
path inside the unpacked root (bag-info.txt, data/content/..., both
manifests). Re-runnable: output is a pure function of this file.
"""

from __future__ import annotations

import hashlib
import os
import shutil

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "fixtures", "batch_store")

BAGIT_TXT = b"BagIt-Version: 0.97\nTag-File-Character-Encoding: UTF-8\n"


def sha(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()


FILE_METADATA_HEADER = (
    "Filepath,FileName,FileType,Filesize,RightsCopyright,LegalStatus,"
    "HeldBy,Language,FoiExemptionCode,LastModified\n"
)


def members_for(consignment: str, tamper: str | None = None):
    data = {
        "data/content/file-1.txt": f"{consignment} one\n".encode(),
        "data/content/file-2.txt": f"{consignment} two\n".encode(),
        "data/content/folder-a/file-3.txt": f"{consignment} three\n".encode(),
    }
    fm = FILE_METADATA_HEADER
    for path, blob in sorted(data.items()):
        name = path.rsplit("/", 1)[1]
        fm += (
            f"{path},{name},File,{len(blob)},Crown Copyright,Public Record,"
            "TNA,English,open,2022-09-29T15:10:20\n"
        )
    for folder in ("data/content", "data/content/folder-a"):
        fname = folder.rsplit("/", 1)[1]
        fm += (
            f"{folder},{fname},Folder,,Crown Copyright,Public Record,"
            "TNA,English,open,\n"
        )
    root = {
        "bagit.txt": BAGIT_TXT,
        "bag-info.txt": (
            "Consignment-Series: MOCKA 101\n"
            f"Internal-Sender-Identifier: {consignment}\n"
            "Consignment-Export-Datetime: 2022-07-18T12:45:45Z\n"
        ).encode(),
        "file-metadata.csv": fm.encode(),
    }
    data_manifest = {k: sha(v) for k, v in data.items()}
    if tamper == "mismatch":
        data_manifest["data/content/file-1.txt"] = sha(b"tampered-1")
        data_manifest["data/content/file-2.txt"] = sha(b"tampered-2")
    if tamper == "missing":
        data_manifest["data/content/ghost.txt"] = sha(b"ghost")
    root["manifest-sha256.txt"] = "".join(
        f"{c}  {k}\n" for k, c in sorted(data_manifest.items())
    ).encode()
    tag_manifest = "".join(
        f"{sha(v)}  {k}\n" for k, v in sorted(root.items())
    ).encode()
    out = dict(root)
    out["tagmanifest-sha256.txt"] = tag_manifest
    out.update(data)
    if tamper == "extra":
        out["data/content/stray.txt"] = b"not in any manifest\n"
    return out


def main() -> None:
    if os.path.isdir(ROOT):
        shutil.rmtree(ROOT)
    for consignment, tamper in (
        ("TDR-2026-AAA", None),
        ("TDR-2026-BBB", "mismatch"),
        ("TDR-2026-CCC", "missing"),
        ("TDR-2026-DDD", "extra"),
    ):
        for name, content in members_for(consignment, tamper).items():
            path = os.path.join(ROOT, consignment, name)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "wb") as f:
                f.write(content)
    n = sum(len(fs) for _, _, fs in os.walk(ROOT))
    print(f"wrote {n} files under {ROOT}")


if __name__ == "__main__":
    main()
