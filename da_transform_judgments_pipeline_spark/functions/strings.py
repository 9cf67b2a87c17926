"""String/path/url scalar helpers (SURVEY.md §2.6).

Each helper returns a Column built from JVM-side builtins (whole-stage
codegen'd) unless noted. Reference behaviors cited per function.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def basename(c: Column | str) -> Column:
    """Last path segment — os.path.basename for '/'-separated keys.

    Reference: s3_lib/s3_lib/checksum_lib.py:50,74.
    """
    return F.element_at(F.split(_col(c), "/"), -1)


def url_path(c: Column | str) -> Column:
    """Path component of a URL — urlparse(url).path.

    Reference: tre-vb-validate-bagit/tre_vb_validate_bagit.py:78,82.
    """
    return F.parse_url(_col(c), F.lit("PATH"))


def _substr_from(col: Column, start: Column) -> Column:
    # substring(col, start) to end-of-string; length arg bounded by col length
    return col.substr(start, F.length(col))


def replace_first(c: Column | str, find: str, replacement: Column | str) -> Column:
    """Replace only the FIRST occurrence of a literal substring
    (Python's str.replace(a, b, 1)) — pure Catalyst via locate/substr/concat.

    Reference: tre-bagit-to-dri-sip/tre_bagit.py:74; s3_lib tar_lib.py:159.
    """
    col = _col(c)
    repl = F.lit(replacement) if isinstance(replacement, str) else replacement
    pos = F.locate(find, col)  # 1-based; 0 if absent
    return F.when(pos == F.lit(0), col).otherwise(
        F.concat(
            col.substr(F.lit(1), pos - 1),
            repl,
            _substr_from(col, pos + len(find)),
        )
    )


def strip_suffix(c: Column | str, suffix: str) -> Column:
    """Drop a literal suffix if present (name[:-len(sfx)]).

    Reference: tre_vb_validate_bagit_files.py:80-82 ('.tar.gz' strip).
    """
    return F.regexp_replace(_col(c), re.escape(suffix) + "$", "")


def strip_dot_slash(c: Column | str) -> Column:
    """Drop a leading './' from tar member names.

    Reference: s3_lib/s3_lib/tar_lib.py:53.
    """
    return F.regexp_replace(_col(c), r"^\./", "")


def strip_z_suffix(c: Column | str) -> Column:
    """Drop one trailing 'Z' from an ISO datetime string.

    Reference: tre-bagit-to-dri-sip/tre_bagit.py:88.
    """
    return F.regexp_replace(_col(c), "Z$", "")


def sha256_hex(c: Column | str) -> Column:
    """Lower-hex SHA-256 of a binary/string column.

    Reference: s3_lib/s3_lib/checksum_lib.py:108-116 (chunked hashlib fold —
    here the whole value is one column cell, so sha2() is the parallel form).
    """
    return F.sha2(_col(c), 256)


@pandas_udf(T.StringType())
def percent_encode(s: pd.Series) -> pd.Series:
    """urllib.parse.quote(value) with '%3A' restored to ':' — the DRI
    identifier escaping rule. Arrow-batched; only non-builtin-expressible
    scalar in the engine (URLEncoder-style url_encode() differs on '/', ' ',
    '~').

    Reference: tre-bagit-to-dri-sip/tre_bagit.py:72-76.
    """
    from urllib.parse import quote

    return s.map(lambda v: None if v is None else quote(v).replace("%3A", ":"))
