"""robots.txt crawl-policy filtering (RFC 9309) — the politeness gate
between URL discovery and fetch in a crawl pipeline.

Built from the public RFC only: group selection by most-specific
``User-agent`` (exact product token beats ``*``), ``Allow``/``Disallow``
path rules, LONGEST-MATCH precedence with Allow winning length ties, and
"no matching rule → allowed". Scope is the literal path-prefix form
(every rule is a path prefix; a trailing ``*`` is redundant and
stripped) — rules carrying mid-pattern ``*`` or ``$`` anchors raise a
typed error naming the pattern rather than mis-filtering (regex-per-rule
matching would also force per-row pattern compilation on the JVM side;
prefix matching keeps the decision in whole-stage codegen).

The parse runs once per robots.txt (a control-plane-sized input: one
small file per HOST) in an Arrow-batched stage; the per-URL decision —
the 100 TB side — is a broadcast join on host plus a pure array
expression (filter by ``startswith``, fold to the longest match).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class RobotsParseError(ValueError):
    """A rule uses features outside the literal-prefix subset."""


def parse_robots(content: str, agent: str) -> list[tuple[str, bool]]:
    """Parse one robots.txt and select the rule group for ``agent``
    (case-insensitive product-token match; specific group beats ``*``;
    groups merge when several name the same agent, per RFC 9309 §2.2.1).

    Returns [(path_prefix, allow)] for the selected group."""
    agent = agent.lower()
    groups: dict[str, list[tuple[str, bool]]] = {}
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
            for a in (val.lower(),):
                groups.setdefault(a, [])
        elif key in ("allow", "disallow"):
            in_rules = True
            if val == "":
                continue  # "Disallow:" empty = allow everything
            core = val[:-1] if val.endswith("*") else val
            if "*" in core or "$" in core:
                raise RobotsParseError(
                    f"rule pattern {val!r} uses wildcards/anchors beyond"
                    " the literal-prefix subset"
                )
            for a in current:
                groups.setdefault(a, []).append((core, key == "allow"))
        # other keys (crawl-delay, sitemap) are ignored
    if agent in groups:
        return groups[agent]
    return groups.get("*", [])


def robots_rules(
    robots: DataFrame,
    agent: str,
    host_col: str = "host",
    content_col: str = "content",
) -> DataFrame:
    """(host, robots.txt text) → (host, rules array<struct<path,allow>>)
    for ``agent`` — one Arrow-batched parse per file; the output is the
    small broadcast side of :func:`robots_filter`."""

    src = robots.select(
        F.col(host_col).alias("host"), F.col(content_col).alias("_txt")
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for host, txt in zip(pdf["host"], pdf["_txt"]):
                rules = parse_robots(txt or "", agent)
                rows.append({
                    "host": host,
                    "rules": [
                        {"path": p, "allow": a} for p, a in rules
                    ],
                })
            yield pd.DataFrame(rows, columns=["host", "rules"])

    return src.mapInPandas(
        run, "host string, rules array<struct<path:string,allow:boolean>>"
    )


def url_host(url: Column | str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/:?#]+)", 1))


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
    pure array fold (filter by prefix, max by (length, allow) so Allow
    wins length ties), so the crawl-scale side never shuffles."""
    path = url_pathq(F.col(url_col))
    joined = urls.withColumn("_host", url_host(F.col(url_col))).join(
        F.broadcast(rules.withColumnRenamed("host", "_host")),
        "_host",
        "left",
    )
    matches = F.filter(
        F.coalesce(
            F.col("rules"),
            F.array().cast("array<struct<path:string,allow:boolean>>"),
        ),
        lambda r: path.startswith(r["path"]),
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
    return joined.withColumn("allowed", allowed).drop("_host", "rules")
