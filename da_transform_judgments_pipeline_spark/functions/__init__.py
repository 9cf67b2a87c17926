"""Scalar expression helpers (SURVEY.md §2.6).

Everything here compiles to native Catalyst expressions except
``percent_encode`` (Arrow-batched Pandas UDF — Python's quote() semantics
aren't reproducible with builtins alone).
"""

from .strings import (
    basename,
    percent_encode,
    replace_first,
    sha256_hex,
    strip_dot_slash,
    strip_suffix,
    strip_z_suffix,
    url_path,
)

__all__ = [
    "basename",
    "percent_encode",
    "replace_first",
    "sha256_hex",
    "strip_dot_slash",
    "strip_suffix",
    "strip_z_suffix",
    "url_path",
]
