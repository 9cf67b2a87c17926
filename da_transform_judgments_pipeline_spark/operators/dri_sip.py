"""BagIt → DRI SIP transform (SURVEY.md §2.2 P1-P6, §2.3 J1, §2.2 P3).

The reference's per-row dict transforms (lambda_functions/tre-bagit-to-dri-sip/
tre_bagit_transforms.py:3-75, tre_bagit.py:31-88) re-expressed as one
declarative DataFrame plan: CASE-chain enum normalization, a broadcast LEFT
join against the checksum manifest, constant-column extension, and a tiny
Pandas UDF for the percent-encoded identifier. Both TDR v1.1 and v1.2 input
vocabularies produce identical output (the golden-test contract,
testing/tre_bagit_to_dri_sip/test_bagit_transforms.py:48-79).

At scale: file-metadata is the fact side; the manifest is per-consignment and
small → broadcast hash join, no shuffle. Enum CASEs and string builds are all
whole-stage-codegen'd; the only Python is percent_encode (Arrow-batched).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import percent_encode, replace_first, strip_z_suffix
from ..schemas import DRI_CLOSURE_COLUMNS, DRI_METADATA_COLUMNS


def dri_config(consignment_reference: str, consignment_series: str) -> dict:
    """Batch/series naming config (reference: tre_bagit_transforms.py:78-100
    dri_config_dict). `TDR-2022-AA1` + `MOCKA 101` → BATCH=MOCKA101Y22TBAA1,
    SERIES=MOCKA_101."""
    metadata = "metadata.csv"
    closure = "closure.csv"
    _, tdr_year, tdr_batch_number = consignment_reference.split("-")
    batch = (
        consignment_series.replace(" ", "")
        + "Y" + tdr_year[2:] + "TB" + tdr_batch_number
    )
    series = consignment_series.replace(" ", "_")
    internal_prefix = f"{batch}/{series}/"
    return dict(
        BATCH=batch,
        SERIES=series,
        INTERNAL_PREFIX=internal_prefix,
        IDENTIFIER_PREFIX="file:/" + internal_prefix,
        METADATA=metadata,
        CLOSURE=closure,
        METADATA_IN_SIP=internal_prefix + metadata,
        CLOSURE_IN_SIP=internal_prefix + closure,
        METADATA_SCHEMA_IN_SIP=internal_prefix + metadata + "s",
        CLOSURE_SCHEMA_IN_SIP=internal_prefix + closure + "s",
        METADATA_CHECKSUM_IN_SIP=internal_prefix + metadata + ".sha256",
        CLOSURE_CHECKSUM_IN_SIP=internal_prefix + closure + ".sha256",
    )


def _mapped(col: str, mapping: dict[str, str], strict: bool) -> F.Column:
    """Enum-normalization CASE chain with unknown-value error parity
    (reference: tre_bagit_transforms.py handle_error sites)."""
    expr = None
    for src, dst in mapping.items():
        cond = F.col(col) == F.lit(src)
        expr = F.when(cond, F.lit(dst)) if expr is None else expr.when(cond, F.lit(dst))
    if strict:
        return expr.otherwise(
            F.raise_error(
                F.concat(
                    F.lit("value "), F.coalesce(F.col(col), F.lit("<null>")),
                    F.lit(f" not expected for key {col}"),
                )
            )
        )
    return expr.otherwise(F.lit(None))


_FOLDER_MAP = {"File": "file", "Folder": "folder"}
_RIGHTS_MAP = {"Crown Copyright": "Crown Copyright"}
_LEGAL_MAP = {
    "Public Record": "Public Record(s)",
    "Public Record(s)": "Public Record(s)",
}
_HELD_BY_MAP = {
    "TNA": "The National Archives, Kew",
    "The National Archives, Kew": "The National Archives, Kew",
}
_LANGUAGE_MAP = {"English": "English"}
_FOI_MAP = {"": "open", "open": "open"}


def _cfg(v) -> F.Column:
    """Config value → Column: the per-consignment API passes literal
    strings; the keyed batch path passes the broadcast config dim's
    columns. Same plan either way."""
    return F.lit(v) if isinstance(v, str) else v


def _identifier(identifier_prefix) -> F.Column:
    """DRI identifier: Filepath with leading 'data/' swapped for the batch
    prefix, percent-encoded (':' preserved), trailing '/' iff folder
    (reference: tre_bagit.py:72-76)."""
    raw = replace_first("Filepath", "data/", _cfg(identifier_prefix))
    encoded = percent_encode(raw)
    return F.concat(
        encoded,
        F.when(F.col("_folder") == "folder", F.lit("/")).otherwise(F.lit("")),
    )


def _with_common(
    file_metadata: DataFrame, identifier_prefix, strict: bool
) -> DataFrame:
    return file_metadata.withColumn(
        "_folder", _mapped("FileType", _FOLDER_MAP, strict)
    ).withColumn("identifier", _identifier(identifier_prefix))


def dri_metadata(
    file_metadata: DataFrame,
    manifest: DataFrame,
    consignment_reference,
    export_datetime,
    identifier_prefix,
    strict: bool = True,
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """metadata.csv rows (reference: tre_bagit.py:31-45 to_metadata).

    - checksum: LEFT broadcast join manifest on Filepath == file, null → ''
      (J1; manifest rows exist only for files, never folders)
    - date_last_modified: files keep LastModified; folders get the bagit
      export datetime with 'Z' stripped (P6)
    - enum maps with unknown-value errors in strict mode (P1)
    """
    base = _with_common(file_metadata, identifier_prefix, strict)
    m = manifest.select(*key_cols, "file", "checksum")
    cond = base["Filepath"] == m["file"]
    for k in key_cols:
        cond = (base[k] == m[k]) & cond
    joined = base.join(F.broadcast(m), cond, "left")
    order_cols = ["_row_order"] if "_row_order" in file_metadata.columns else []
    return joined.select(
        *[base[k] for k in key_cols],
        *order_cols,
        F.col("identifier"),
        F.col("FileName").alias("file_name"),
        F.col("_folder").alias("folder"),
        F.when(F.col("_folder") == "file", F.col("LastModified"))
        .otherwise(strip_z_suffix(_cfg(export_datetime)))
        .alias("date_last_modified"),
        F.coalesce(F.col("checksum"), F.lit("")).alias("checksum"),
        _mapped("RightsCopyright", _RIGHTS_MAP, strict).alias("rights_copyright"),
        _mapped("LegalStatus", _LEGAL_MAP, strict).alias("legal_status"),
        _mapped("HeldBy", _HELD_BY_MAP, strict).alias("held_by"),
        _mapped("Language", _LANGUAGE_MAP, strict).alias("language"),
        _cfg(consignment_reference).alias("TDR_consignment_ref"),
    )


def dri_closure(
    file_metadata: DataFrame,
    identifier_prefix,
    strict: bool = True,
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """closure.csv rows (reference: tre_bagit.py:47-63 to_closure): enum maps
    (P2) + constant-column extension (P3)."""
    base = _with_common(file_metadata, identifier_prefix, strict)
    order_cols = ["_row_order"] if "_row_order" in file_metadata.columns else []
    return base.select(
        *key_cols,
        *order_cols,
        F.col("identifier"),
        F.col("_folder").alias("folder"),
        F.lit("").alias("closure_start_date"),
        F.lit(0).alias("closure_period"),
        _mapped("FoiExemptionCode", _FOI_MAP, strict).alias("foi_exemption_code"),
        F.lit("").alias("foi_exemption_asserted"),
        F.lit("TRUE").alias("title_public"),
        F.lit("").alias("title_alternate"),
        F.lit("open_on_transfer").alias("closure_type"),
    )


def dri_metadata_keyed(
    file_metadata: DataFrame,
    manifest: DataFrame,
    config: DataFrame,
    key_col: str = "consignment",
    strict: bool = True,
) -> DataFrame:
    """MANY consignments' metadata.csv rows in one plan: ``file_metadata``
    and ``manifest`` carry ``key_col``; ``config`` is the per-consignment
    dim (key_col, reference, export_datetime, identifier_prefix) —
    broadcast onto the fact side, so the per-consignment literals of
    :func:`dri_metadata` become columns and the manifest join becomes
    (key, Filepath)-keyed. Identical rows to calling :func:`dri_metadata`
    once per consignment (pytest-asserted)."""
    fm = file_metadata.join(F.broadcast(config), key_col)
    return dri_metadata(
        fm,
        manifest,
        F.col("reference"),
        F.col("export_datetime"),
        F.col("identifier_prefix"),
        strict,
        key_cols=(key_col,),
    )


def dri_closure_keyed(
    file_metadata: DataFrame,
    config: DataFrame,
    key_col: str = "consignment",
    strict: bool = True,
) -> DataFrame:
    """MANY consignments' closure.csv rows in one plan — see
    :func:`dri_metadata_keyed`."""
    fm = file_metadata.join(F.broadcast(config), key_col)
    return dri_closure(
        fm, F.col("identifier_prefix"), strict, key_cols=(key_col,)
    )


def _render_ordered(df: DataFrame, columns: list[str]) -> str:
    from ..sources.sinks import render_csv

    if "_row_order" in df.columns:
        df = df.orderBy("_row_order")
    return render_csv(df.select(*columns))


def to_metadata_csv(df: DataFrame) -> str:
    """Byte-exact metadata.csv string (golden-test surface)."""
    return _render_ordered(df, DRI_METADATA_COLUMNS)


def to_closure_csv(df: DataFrame) -> str:
    """Byte-exact closure.csv string (golden-test surface)."""
    return _render_ordered(df, DRI_CLOSURE_COLUMNS)
