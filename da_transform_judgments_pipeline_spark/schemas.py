"""Declared schemas for every data shape the reference handles (SURVEY.md §1).

All structs are fixed/declared, mirroring the reference's JSON Schema +
CSV-schema files; `file-metadata.csv` keeps permissive all-STRING columns so
both TDR v1.1 and v1.2 vocabularies load through one schema (reference:
lambda_functions/tre-bagit-to-dri-sip/tre_bagit_transforms.py:3-47).
"""

from __future__ import annotations

from pyspark.sql import types as T

MESSAGE_VERSION = "0.0.2"

# ---------------------------------------------------------------------------
# §1.2 TRE event envelope (reference: lib/tre_lib/tre_lib/schema.json:1-113,
# message.py:31-170). Timestamp is *nanoseconds UTC* stored as LONG (never
# TimestampType — Spark timestamps are µs precision).
# ---------------------------------------------------------------------------

PRODUCER_SCHEMA = T.StructType(
    [
        T.StructField("environment", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("process", T.StringType(), False),
        T.StructField("type", T.StringType(), True),  # judgment|standard|null
        T.StructField("event-name", T.StringType(), False),
    ]
)

# UUIDs: append-only lineage, each hop appends {"<producer>-UUID": uuid4}
UUIDS_SCHEMA = T.ArrayType(T.MapType(T.StringType(), T.StringType()), False)

# parameters: map keyed by event-name; payload kept as JSON string so one
# envelope schema serves every event type (per-event structs below parse it).
TRE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("version", T.StringType(), False),
        T.StructField("timestamp", T.LongType(), False),
        T.StructField("UUIDs", UUIDS_SCHEMA, False),
        T.StructField("producer", PRODUCER_SCHEMA, False),
        T.StructField("parameters", T.MapType(T.StringType(), T.StringType()), False),
    ]
)

CONSIGNMENT_TYPES = ["judgment", "standard"]

EVENT_NAMES = [
    "bagit-available",
    "consignment-export",
    "bagit-received",
    "bagit-validated",
    "bagit-validation-error",
    "dri-preingest-sip-available",
    "dri-preingest-sip-error",
    "editorial-output",
]

# per-event parameter payloads (reference: schema_param_tdr_to_tre.json:1-44,
# schema_param_tre_validate_bagit*.json)
RESOURCE_SCHEMA = T.StructType(
    [
        T.StructField("resource-type", T.StringType(), True),
        T.StructField("access-type", T.StringType(), True),
        T.StructField("validation-method", T.StringType(), True),
        T.StructField("value", T.StringType(), False),
    ]
)

PARAM_BAGIT_AVAILABLE_SCHEMA = T.StructType(
    [
        T.StructField("resource", RESOURCE_SCHEMA, False),
        T.StructField("resource-validation", RESOURCE_SCHEMA, False),
        T.StructField("number-of-retries", T.IntegerType(), True),
        T.StructField("reference", T.StringType(), False),
    ]
)

VALIDATED_FILES_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), True),
        T.StructField("root", T.ArrayType(T.StringType()), True),
        T.StructField("data", T.ArrayType(T.StringType()), True),
    ]
)

PARAM_BAGIT_RECEIVED_SCHEMA = T.StructType(
    [
        T.StructField("reference", T.StringType(), False),
        T.StructField("s3-bucket", T.StringType(), True),
        T.StructField("s3-bagit-name", T.StringType(), True),
        T.StructField("s3-object-root", T.StringType(), True),
        T.StructField("validated-files", VALIDATED_FILES_SCHEMA, True),
        T.StructField("errors", T.ArrayType(T.StringType()), True),
        T.StructField("number-of-retries", T.IntegerType(), True),
    ]
)

# ---------------------------------------------------------------------------
# §1.3 checksum manifests — (file, basename, checksum CHAR(64))
# (reference: s3_lib/s3_lib/checksum_lib.py:23-79)
# ---------------------------------------------------------------------------

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("checksum", T.StringType(), False),
        T.StructField("file", T.StringType(), False),
        T.StructField("basename", T.StringType(), False),
    ]
)

# ---------------------------------------------------------------------------
# §1.4 BagIt file-metadata.csv — TDR v1.1 columns; v1.2 appends
# OriginalFilePath (reference: testing/tre_bagit_to_dri_sip/
# test_bagit_transforms.py:34-45). All STRING: Filesize/LastModified may be
# empty for folders, so typed parsing happens downstream.
# ---------------------------------------------------------------------------

FILE_METADATA_COLUMNS_V11 = [
    "Filepath", "FileName", "FileType", "Filesize", "RightsCopyright",
    "LegalStatus", "HeldBy", "Language", "FoiExemptionCode", "LastModified",
]
FILE_METADATA_COLUMNS_V12 = FILE_METADATA_COLUMNS_V11 + ["OriginalFilePath"]

FILE_METADATA_SCHEMA_V11 = T.StructType(
    [T.StructField(c, T.StringType(), True) for c in FILE_METADATA_COLUMNS_V11]
)
FILE_METADATA_SCHEMA_V12 = T.StructType(
    [T.StructField(c, T.StringType(), True) for c in FILE_METADATA_COLUMNS_V12]
)

# bag-info.txt / bagit.txt — key: value lines (reference:
# s3_lib/s3_lib/object_lib.py:211-228)
KEY_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
    ]
)

# §1.1 file catalog — binaryFile scan + path-derived partition columns
CATALOG_PARTITION_COLUMNS = ["consignment_type", "reference", "retry", "relpath"]

# parser metadata.json (reference: testing/tre_editorial_integration/
# test_data/parser_output/judgment/ABC-123/0/metadata.json)
PARSER_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("uri", T.StringType(), True),
        T.StructField("court", T.StringType(), True),
        T.StructField("cite", T.StringType(), True),
        T.StructField("date", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("attachments", T.ArrayType(T.StringType()), True),
    ]
)

# DRI SIP outputs (reference: tre_bagit.py:32-33, 48-49)
DRI_METADATA_COLUMNS = [
    "identifier", "file_name", "folder", "date_last_modified", "checksum",
    "rights_copyright", "legal_status", "held_by", "language",
    "TDR_consignment_ref",
]
DRI_CLOSURE_COLUMNS = [
    "identifier", "folder", "closure_start_date", "closure_period",
    "foi_exemption_code", "foi_exemption_asserted", "title_public",
    "title_alternate", "closure_type",
]
