"""robots.txt crawl-policy filtering (RFC 9309) — the politeness gate
between URL discovery and fetch in a crawl pipeline.

Built from the public RFC only: group selection by most-specific
``User-agent`` (exact product token beats ``*``), ``Allow``/``Disallow``
path rules, LONGEST-MATCH precedence with Allow winning length ties
("most octets" per RFC 9309 §2.2.2), and "no matching rule → allowed".

Pattern support is the full RFC set: literal path prefixes stay on the
fast path (a ``startswith`` inside whole-stage codegen); rules carrying
a mid-pattern ``*`` wildcard or an end-of-match ``$`` anchor are
compiled ONCE at parse time into an anchored regex carried alongside
the rule, and matched JVM-side with ``regexp_like`` inside the same
array fold. A ``$`` anywhere but the end is a literal character (as in
the reference googlebot parser); a trailing ``*`` (with or without a
redundant ``$`` after it) is prefix-equivalent and normalized away.

The parse runs once per robots.txt (a control-plane-sized input: one
small file per HOST) in an Arrow-batched stage; the per-URL decision —
the 100 TB side — is a broadcast join on host plus a pure array
expression (filter by prefix-or-regex, fold to the longest match).
``on_error='report'`` isolates a pathological file to its own host row
(empty rules + error message) instead of failing the stage — the same
per-row isolation contract as warc_records / parse_pdfs / unzip.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class RobotsParseError(ValueError):
    """A robots.txt could not be parsed — today that means it exceeds
    the parsing limit (RFC 9309 §2.5: crawlers impose one, ≥500 KiB);
    wildcard/anchor patterns are supported, not refused."""


#: RFC 9309 §2.5 lower bound for the parsing limit (Google uses the same).
DEFAULT_MAX_ROBOTS_BYTES = 512 * 1024


def _normalize_pattern(val: str) -> str:
    """Strip redundant suffixes: ``p*`` ≡ prefix ``p``; ``p*$`` ≡ ``p*``
    ≡ prefix ``p`` (a wildcard immediately before the end anchor makes
    the anchor vacuous)."""
    if val.endswith("$") and val[:-1].endswith("*"):
        val = val[:-1]
    while val.endswith("*"):
        val = val[:-1]
    return val


def rule_regex(pattern: str) -> str | None:
    """Compile one (normalized) rule pattern to an anchored Java regex,
    or ``None`` when the pattern is a pure literal prefix (the codegen
    fast path). ``*`` → ``.*``; a trailing ``$`` → end anchor; ``$``
    elsewhere is literal. ``re.escape`` output is Java-compatible (a
    backslash before a non-alphanumeric is a literal there too)."""
    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    if "*" not in core and not anchored:
        return None
    body = ".*".join(re.escape(chunk) for chunk in core.split("*"))
    return "^" + body + ("$" if anchored else "")


def _parse_groups(
    content: str,
) -> tuple[
    dict[str, list[tuple[str, bool]]], dict[str, float], list[str]
]:
    """One pass over a robots.txt: rule groups AND crawl-delays (both
    keyed by lowercase product token) AND the file's ``Sitemap:`` URLs
    (group-independent per the sitemaps.org protocol). Groups merge
    when several name the same agent (RFC 9309 §2.2.1)."""
    groups: dict[str, list[tuple[str, bool]]] = {}
    delays: dict[str, float] = {}
    sitemaps: list[str] = []
    current: list[str] = []
    in_rules = False
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, val = (s.strip() for s in line.split(":", 1))
        key = key.lower()
        if key == "user-agent":
            if in_rules:
                current = []
                in_rules = False
            current.append(val.lower())
            groups.setdefault(val.lower(), [])
        elif key in ("allow", "disallow"):
            in_rules = True
            if val == "":
                continue  # "Disallow:" empty = allow everything
            # A non-empty value that normalizes to "" was a pure
            # wildcard ("*", "*$", "**"): it matches EVERY path, so it
            # must be kept as the match-all prefix "" — dropping it
            # would invert the rule. Only a genuinely empty value
            # (handled above) means "no rule".
            pattern = _normalize_pattern(val)
            for a in current:
                groups.setdefault(a, []).append((pattern, key == "allow"))
        elif key == "crawl-delay":
            in_rules = True
            try:
                d = float(val)
            except ValueError:
                continue  # malformed delay: ignore the line, keep rules
            for a in current:
                if a not in delays:
                    delays[a] = d
        elif key == "sitemap":
            if val:
                sitemaps.append(val)  # cross-group, order preserved
        # other keys (host, clean-param) are ignored
    return groups, delays, sitemaps


def _select_group(groups: dict, agent: str):
    agent = agent.lower()
    if agent in groups:
        return groups[agent]
    return groups.get("*", None)


def parse_robots(content: str, agent: str) -> list[tuple[str, bool]]:
    """Parse one robots.txt and select the rule group for ``agent``
    (case-insensitive product-token match; specific group beats ``*``;
    groups merge when several name the same agent, per RFC 9309 §2.2.1).

    Returns [(pattern, allow)] for the selected group. Patterns may
    contain mid-pattern ``*`` / end ``$`` — see :func:`rule_regex`."""
    groups, _, _ = _parse_groups(content)
    got = _select_group(groups, agent)
    return got if got is not None else []


def parse_crawl_delay(content: str, agent: str) -> float | None:
    """The Crawl-delay (seconds) the selected group requests for
    ``agent``, or None when no group states one. Crawl-delay is a de
    facto extension (not in RFC 9309) but ubiquitous; group selection
    follows the same product-token precedence as the rules."""
    _, delays, _ = _parse_groups(content)
    agent = agent.lower()
    if agent in delays:
        return delays[agent]
    return delays.get("*", None)


def parse_sitemap_urls(content: str) -> list[str]:
    """The ``Sitemap:`` URLs a robots.txt advertises (group-independent
    per the sitemaps.org protocol) — the crawler's entry points into
    :func:`..sources.sitemap.sitemap_entries` discovery."""
    _, _, sitemaps = _parse_groups(content)
    return sitemaps


_RULES_T = "array<struct<path:string,allow:boolean,re:string>>"


def robots_rules(
    robots: DataFrame,
    agent: str,
    host_col: str = "host",
    content_col: str = "content",
    on_error: str = "raise",
    max_bytes: int = DEFAULT_MAX_ROBOTS_BYTES,
) -> DataFrame:
    """(host, robots.txt text) → (host, rules array<struct<path, allow,
    re>>, crawl_delay, sitemaps) for ``agent`` — one Arrow-batched
    parse per file; the output is the small broadcast side of
    :func:`robots_filter` / :func:`fetch_schedule`, and ``sitemaps``
    (the file's advertised ``Sitemap:`` URLs) seeds
    :func:`..sources.sitemap.sitemap_entries` discovery. ``re`` is null
    for literal-prefix rules (codegen fast path) and an anchored regex
    for wildcard/anchor rules.

    ``on_error='report'`` adds an ``error`` column and maps a
    pathological file to (empty rules, null delay, message) instead of
    failing the stage — drop/route error rows before broadcast."""
    if on_error not in ("raise", "report"):
        raise ValueError(f"on_error must be raise|report, got {on_error!r}")
    report = on_error == "report"

    src = robots.select(
        F.col(host_col).alias("host"), F.col(content_col).alias("_txt")
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for host, txt in zip(pdf["host"], pdf["_txt"]):
                try:
                    if txt is not None and len(txt) > max_bytes:
                        raise RobotsParseError(
                            f"robots.txt is {len(txt)} bytes, over the"
                            f" {max_bytes}-byte parsing limit"
                            " (RFC 9309 §2.5)"
                        )
                    groups, delays, sitemaps = _parse_groups(txt or "")
                    rules = _select_group(groups, agent) or []
                    a = agent.lower()
                    delay = delays.get(a, delays.get("*", None))
                    row = {
                        "host": host,
                        "rules": [
                            {"path": p, "allow": al, "re": rule_regex(p)}
                            for p, al in rules
                        ],
                        "crawl_delay": delay,
                        "sitemaps": sitemaps,
                    }
                except Exception as exc:
                    if not report:
                        if isinstance(exc, RobotsParseError):
                            raise
                        raise RobotsParseError(str(exc)) from exc
                    row = {
                        "host": host, "rules": [], "crawl_delay": None,
                        "sitemaps": [],
                    }
                    row["error"] = f"{type(exc).__name__}: {exc}"
                else:
                    if report:
                        row["error"] = None
                rows.append(row)
            cols = ["host", "rules", "crawl_delay", "sitemaps"] + (
                ["error"] if report else []
            )
            yield pd.DataFrame(rows, columns=cols)

    schema = (
        f"host string, rules {_RULES_T}, crawl_delay double,"
        " sitemaps array<string>"
    )
    if report:
        schema += ", error string"
    return src.mapInPandas(run, schema)


def url_host(url: Column | str) -> Column:
    """Lowercased host of an absolute URL — the politeness/robots
    grouping key. Skips RFC 3986 userinfo (``user:pass@host`` must
    group under ``host``, and userinfo may itself contain ``:``) and
    stops before port/path/query/fragment."""
    c = F.col(url) if isinstance(url, str) else url
    # bracketed IP-literals ([2001:db8::1]) carry colons inside the
    # host, so they match as a unit before the colon-terminated
    # DNS-host branch (r12 — the plain class truncated IPv6 hosts)
    return F.lower(
        F.regexp_extract(
            c,
            r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/?#]*@)?"
            r"(\[[^\]]*\]|[^/:?#@]+)",
            1,
        )
    )


def url_pathq(url: Column | str) -> Column:
    """Path + query (the byte range robots rules match against)."""
    c = F.col(url) if isinstance(url, str) else url
    p = F.regexp_replace(
        F.regexp_replace(c, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/]*", ""),
        r"#.*$", "",
    )
    return F.when(p == "", F.lit("/")).otherwise(p)


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Append an ``allowed`` column: RFC 9309 longest-match decision of
    each URL against its host's rule group. The rules side is one row
    per HOST (control-plane sized) → broadcast join; the decision is a
    pure array fold (filter by prefix — or by the rule's precompiled
    regex when it carries wildcards — then max by (pattern octets,
    allow) so Allow wins length ties), so the crawl-scale side never
    shuffles."""
    path = url_pathq(F.col(url_col))
    rules_side = rules.select("host", "rules").withColumnRenamed(
        "host", "_host"
    )
    joined = urls.withColumn("_host", url_host(F.col(url_col))).join(
        F.broadcast(rules_side), "_host", "left"
    )
    matches = F.filter(
        F.coalesce(F.col("rules"), F.array().cast(_RULES_T)),
        lambda r: F.when(
            r["re"].isNotNull(), F.regexp_like(path, r["re"])
        ).otherwise(path.startswith(r["path"])),
    )
    best = F.array_max(
        F.transform(
            matches,
            lambda r: F.struct(
                F.length(r["path"]).alias("l"), r["allow"].alias("allow")
            ),
        )
    )
    allowed = F.when(best.isNull(), F.lit(True)).otherwise(best["allow"])
    # one projection folds the verdict and the _host/rules drop (r14-opt
    # §1: withColumn + drop would re-analyze the tree twice more)
    return joined.select(
        *[c for c in urls.columns if c != "allowed"],
        allowed.alias("allowed"),
    )


def fetch_schedule(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    default_delay: float = 1.0,
    order_col: str | list | tuple | None = None,
    use_prefix_rank: bool = False,
) -> DataFrame:
    """The POLITENESS half of crawl scheduling (frontier = discovery,
    robots_filter = permission, this = pacing): assign every URL a
    per-host fetch ``slot`` (0-based rank within its host, ordered by
    ``order_col`` or the URL string) and ``offset_sec`` = slot × the
    host's Crawl-delay (``default_delay`` when the host's robots.txt
    states none) — the earliest polite fetch time relative to the
    host's first request. Pure Catalyst integer/decimal arithmetic: the
    per-host delay rides the same control-plane broadcast as
    robots_filter, and the slot is a keyed window rank.

    ``order_col`` may be a LIST of column names for compound orderings
    (all ascending — pre-negate a column for descending, e.g. the
    prioritized queue ranks by ``-priority`` first so high-rank pages
    take each host's earliest polite slots).

    At web scale host cardinality is huge and groups are small, so the
    keyed window is the right default; for the few-giant-hosts regime
    (an intranet crawl of three hosts) pass ``use_prefix_rank=True`` to
    rank via the two-phase parallel prefix scan
    (:func:`..operators.scale.keyed_prefix_rank`) instead of funneling
    a giant host through one window task."""
    from pyspark.sql import Window

    order = order_col if order_col is not None else url_col
    orders = (
        list(order) if isinstance(order, (list, tuple)) else [order]
    )
    delays = rules.select(
        F.col("host").alias("_host"),
        F.coalesce(F.col("crawl_delay"), F.lit(default_delay)).alias(
            "crawl_delay"
        ),
    )
    joined = urls.withColumn("_host", url_host(F.col(url_col))).join(
        F.broadcast(delays), "_host", "left"
    ).withColumn(
        "crawl_delay",
        F.coalesce(F.col("crawl_delay"), F.lit(default_delay)),
    )
    if use_prefix_rank:
        from .scale import keyed_prefix_rank

        if len(orders) == 1:
            ranked = keyed_prefix_rank(
                joined, "_host", orders[0], rank_name="slot"
            )
        else:
            # compound ordering through the prefix scan: pack the
            # fields into one struct (struct ordering is field-by-field
            # — exactly the compound semantics), rank, drop
            ranked = keyed_prefix_rank(
                joined.withColumn(
                    "_ord", F.struct(*[F.col(c) for c in orders])
                ),
                "_host", "_ord", rank_name="slot",
            ).drop("_ord")
    else:
        w = Window.partitionBy("_host").orderBy(*orders)
        ranked = joined.withColumn(
            "slot", (F.row_number().over(w) - 1).cast("long")
        )
    return (
        ranked.withColumn(
            "offset_sec",
            F.round(F.col("slot") * F.col("crawl_delay"), 6),
        )
        .withColumnRenamed("_host", "host")
    )
