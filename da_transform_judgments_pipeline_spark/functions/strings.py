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


#: built URL-key Columns memoized per (fn, column-name[, params]) —
#: r14-opt, guide §5 (the driver is a shared resource): one
#: canonical_url/surt_key construction is ~30 py4j Column ops
#: including two HOF lambdas, measured ~200 ms per call, and the
#: frontier rebuilds it every stream micro-batch. Cached ONLY for
#: plain column-NAME inputs — a name fully determines the unresolved
#: tree, and Columns are immutable plan fragments reusable across any
#: DataFrame carrying that name. Column-typed inputs (arbitrary
#: expressions) are built fresh as before.
_KEY_CACHE: dict = {}


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


def canonical_url(c: Column | str) -> Column:
    """RFC 3986 §6 URL canonicalization — the crawl-dedup key (two
    spellings of one page must collide BEFORE fingerprint dedup ever
    sees their content). Pure Catalyst, no UDF:

    - scheme and host lowercased; fragment dropped; RFC 3986 §3.2.1
      userinfo (``user:pass@``) dropped — two spellings with and
      without credentials are one page, and userinfo may itself
      contain ``:``, which would corrupt the host/port split;
    - default ports stripped (``:80`` for http, ``:443`` for https),
      others kept;
    - path dot-segments resolved with a REAL fold (``aggregate`` over
      the segment array — ``.`` skipped, ``..`` pops, a regex cannot do
      this), duplicate slashes collapsed, empty path → ``/``;
    - query parameters sorted bytewise (duplicates kept), empty query
      dropped.

    Percent-encoding is left byte-exact (case-normalizing %XX without
    decoding reserved characters needs a table the oracle would have to
    mirror — out of scope, documented). NULL in → NULL out."""
    if isinstance(c, str):
        key = ("canonical_url", c)
        cached = _KEY_CACHE.get(key)
        if cached is None:
            cached = _KEY_CACHE[key] = canonical_url(F.col(c))
        return cached
    p = _url_parts(c)
    return F.when(
        p["scheme"] == "", p["u"]  # not an absolute URL: pass through
    ).otherwise(
        F.concat(
            p["scheme"], F.lit("://"), p["host"], p["port_sfx"],
            p["canon_path"], p["canon_query"],
        )
    )


def _url_parts(c: Column | str) -> dict:
    """The shared RFC 3986 parse both :func:`canonical_url` and
    :func:`surt_key` assemble from. One dict of component Columns —
    surt_key used to RE-PARSE canonical_url's output string, nesting
    the entire canonicalization tree (dot-segment fold included) at
    every component reference; Catalyst analysis cost grew with the
    duplicated tree, a per-query constant measured at several seconds
    (r13 — the f06 watch item). Building both keys from one parts dict
    keeps the expression tree ~the size of canonical_url itself."""
    u = F.trim(_col(c))
    u = F.regexp_replace(u, "#.*$", "")  # fragment
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    authority = F.regexp_extract(rest, r"^([^/?]*)", 1)
    # RFC 3986 §3.2.1 userinfo (user:pass@) is dropped from the key —
    # the robots.url_host convention; it may itself contain ':' (and
    # precedes a bracketed host), so it must be stripped BEFORE the
    # bracket test and host/port split or the host truncates at the
    # userinfo's first colon (r13 fix; mirrors url_host's regex)
    hostport = F.regexp_replace(authority, r"^[^/?#]*@", "")
    # RFC 3986 §3.2.2 IP-literal: a bracketed host ([2001:db8::1])
    # contains colons, so the host/port split keys on the bracket —
    # the plain split would truncate the address at its first colon
    # (r12 fix; non-bracketed authorities take the original branch)
    _v6 = hostport.startswith("[")
    host = F.when(
        _v6, F.lower(F.regexp_extract(hostport, r"^(\[[^\]]*\])", 1))
    ).otherwise(F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1)))
    port = F.when(
        _v6, F.regexp_extract(hostport, r"\]:(\d+)$", 1)
    ).otherwise(F.regexp_extract(hostport, r":(\d+)$", 1))
    port_sfx = F.when(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == ""),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    after = _substr_from(rest, F.length(authority) + 1)
    path = F.regexp_extract(after, r"^([^?]*)", 1)
    query = F.when(
        after.contains("?"), F.regexp_extract(after, r"\?(.*)$", 1)
    ).otherwise(F.lit(""))
    # dot-segment resolution: fold segments, '.' drops, '..' pops —
    # empty segments (duplicate slashes) drop too
    segs = F.filter(
        F.split(path, "/"), lambda s: (s != "") & (s != ".")
    )
    resolved = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            s == "..",
            # '..' above root clamps (RFC 3986 §5.2.4) — and slice with
            # length -1 on an empty stack is an ANSI error anyway
            F.when(
                F.size(acc) > 0, F.slice(acc, F.lit(1), F.size(acc) - 1)
            ).otherwise(acc),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    canon_path = F.concat(F.lit("/"), F.array_join(resolved, "/"))
    params = F.array_sort(
        F.filter(F.split(query, "&"), lambda p: p != "")
    )
    canon_query = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(params, "&")),
    ).otherwise(F.lit(""))
    return {
        "u": u,
        "scheme": scheme,
        "_v6": _v6,
        "host": host,
        "port_sfx": port_sfx,
        "canon_path": canon_path,
        "canon_query": canon_query,
    }


def surt_key(c: Column | str, strip_www: bool = True) -> Column:
    """SURT (Sort-friendly URI Reordering Transform — the Heritrix /
    OpenWayback / Common Crawl index key, from the public webarchive
    convention): host labels REVERSED and comma-joined, non-default
    port kept, then ``)`` and the path+query —
    ``http://www.Example.com/a/../p?b=2&a=1`` →
    ``com,example)/p?a=1&b=2``. Lexicographic order of SURT keys
    groups a domain's pages, then each subdomain's, contiguously —
    the layout key that turns "every page under example.com" into a
    PREFIX RANGE SCAN over a 100 TB sorted index (what warc_cdx rows
    or a frontier sort on; the Common Crawl columnar index ships
    exactly this column as ``url_surtkey``).

    Builds on the :func:`canonical_url` parse (one SHARED parts dict —
    r13: the key used to be assembled by re-parsing canonical_url's
    output string, which nested the whole canonicalization expression
    tree at every component reference and made Catalyst analysis a
    multi-second per-query constant), so scheme/host case, default
    ports, dot-segments, and query order are already normalized;
    ``strip_www`` (default, matching the CDX convention) drops one
    leading ``www``/``www2``-style label when more labels remain. The
    scheme is dropped (http and https collapse — the CDX convention;
    keep ``canonical_url`` when the distinction matters). Non-URLs
    pass through untouched like canonical_url; NULL in → NULL out."""
    if isinstance(c, str):
        key = ("surt_key", c, strip_www)
        cached = _KEY_CACHE.get(key)
        if cached is None:
            cached = _KEY_CACHE[key] = surt_key(F.col(c), strip_www)
        return cached
    p = _url_parts(c)
    host = p["host"]
    if strip_www:
        host = F.when(
            host.rlike(r"^www\d*\..+\."),
            F.regexp_replace(host, r"^www\d*\.", ""),
        ).otherwise(host)
    # IP hosts stay VERBATIM (the webarchive SURT convention: label
    # reversal is for DNS hierarchies; reversing an address is
    # meaningless) — bracketed IPv6 and dotted-quad IPv4 alike
    rev = F.when(
        p["_v6"] | host.rlike(r"^\d+\.\d+\.\d+\.\d+$"),
        host,
    ).otherwise(
        F.array_join(F.reverse(F.split(host, r"\.")), ",")
    )
    key = F.concat(
        rev,
        p["port_sfx"],  # already default-stripped, ':'-prefixed
        F.lit(")"),
        p["canon_path"],
        p["canon_query"],
    )
    return F.when(p["scheme"] == "", p["u"]).otherwise(key)
