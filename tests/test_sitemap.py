"""Sitemap ingestion tests (sources/sitemap + the robots.txt Sitemap:
advertisement path)."""

import gzip

import pytest

from da_transform_judgments_pipeline_spark.sources.sitemap import (
    SitemapError,
    build_sitemap,
    parse_sitemap,
    sitemap_entries,
)


def test_parse_roundtrip_urlset_and_index():
    entries = [
        {"loc": "https://h/a", "lastmod": "2021-01-02",
         "changefreq": "daily", "priority": 0.8},
        {"loc": "https://h/b"},
    ]
    kind, got = parse_sitemap(build_sitemap(entries))
    assert kind == "urlset"
    assert got[0]["loc"] == "https://h/a"
    assert got[0]["priority"] == 0.8
    assert got[1] == {"loc": "https://h/b", "lastmod": None,
                      "changefreq": None, "priority": None}
    kind, got = parse_sitemap(build_sitemap(
        [{"loc": "https://h/s1.xml", "lastmod": "2021-02-03"}],
        kind="sitemapindex",
    ))
    assert kind == "sitemapindex" and got[0]["lastmod"] == "2021-02-03"
    # gzip transport (sitemap.xml.gz) inflates transparently
    kind, got = parse_sitemap(
        build_sitemap(entries, gzip_transport=True)
    )
    assert kind == "urlset" and len(got) == 2
    # a REAL third-party-shaped document: namespace prefixes + extra
    # whitespace + unknown extension elements are tolerated
    xml = (b'<?xml version="1.0"?><sm:urlset xmlns:sm='
           b'"http://www.sitemaps.org/schemas/sitemap/0.9">'
           b"<sm:url><sm:loc>\n  https://h/x \n</sm:loc>"
           b"<sm:lastmod>2020-12-31</sm:lastmod>"
           b"<other>ignored</other></sm:url></sm:urlset>")
    kind, got = parse_sitemap(xml)
    assert got == [{"loc": "https://h/x", "lastmod": "2020-12-31",
                    "changefreq": None, "priority": None}]


def test_parse_typed_refusals():
    with pytest.raises(SitemapError, match="parse failed"):
        parse_sitemap(b"<urlset><url>")
    with pytest.raises(SitemapError, match="not a sitemap"):
        parse_sitemap(b"<html><body/></html>")
    with pytest.raises(SitemapError, match="without <loc>"):
        parse_sitemap(
            b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            b"<url><priority>0.5</priority></url></urlset>"
        )
    with pytest.raises(SitemapError, match="bad priority"):
        parse_sitemap(
            b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            b"<url><loc>https://h/a</loc><priority>soon</priority>"
            b"</url></urlset>"
        )
    with pytest.raises(SitemapError, match="corrupt gzip"):
        parse_sitemap(b"\x1f\x8b\x08\x00junk")
    # XML entity-expansion bomb: DTD/entity declarations refused before
    # ElementTree can expand them (byte bounds can't catch expansion)
    with pytest.raises(SitemapError, match="entity-expansion"):
        parse_sitemap(
            b'<?xml version="1.0"?><!DOCTYPE u [<!ENTITY a "x">]>'
            b"<urlset><url><loc>&a;</loc></url></urlset>"
        )
    # truncated-but-valid-prefix gzip is also corrupt (decompressobj
    # returns partial data without raising — the eof check catches it)
    import gzip as _gzip

    whole = _gzip.compress(b"<urlset></urlset>" * 50, mtime=0)
    with pytest.raises(SitemapError, match="truncated"):
        parse_sitemap(whole[:-8])


def test_gzip_multi_member_transport():
    """Concatenated gzip members are legal transport: the bounded
    inflater must decode ALL members (stopping at the first would
    silently truncate the urlset), still under the cumulative bound."""
    import gzip as _gzip

    xml = (
        b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        b"<url><loc>https://h/a</loc></url>"
        b"<url><loc>https://h/b</loc></url></urlset>"
    )
    half = len(xml) // 2
    blob = _gzip.compress(xml[:half], mtime=0) + _gzip.compress(
        xml[half:], mtime=0
    )
    kind, entries = parse_sitemap(blob)
    assert kind == "urlset"
    assert [e["loc"] for e in entries] == ["https://h/a", "https://h/b"]


def test_gzip_bomb_bounded():
    """A small gzip bomb must be rejected AT the 50 MB bound — the
    decompressobj(max_length) pattern — not after inflating the whole
    payload into executor memory."""
    import gzip as _gzip

    bomb = _gzip.compress(b"\x00" * (60 << 20), 9, mtime=0)
    assert len(bomb) < (1 << 20)  # ~60 KB transport for 60 MB inflated
    with pytest.raises(SitemapError, match="inflates past"):
        parse_sitemap(bomb)


def test_sitemap_entries_report_isolation(spark):
    files = spark.createDataFrame(
        [
            (1, bytearray(build_sitemap([{"loc": "https://h/a"}]))),
            (2, bytearray(b"<notxml")),
            (3, bytearray(gzip.compress(b"<urlset xmlns='x'>") [:8])),
        ],
        "sitemap_id long, content binary",
    )
    rows = {r["sitemap_id"]: r for r in sitemap_entries(files).collect()}
    assert rows[1]["loc"] == "https://h/a" and rows[1]["error"] is None
    assert rows[2]["loc"] is None and "SitemapError" in rows[2]["error"]
    assert rows[3]["error"] is not None
    with pytest.raises(Exception, match="SitemapError"):
        sitemap_entries(files, on_error="raise").collect()


def test_robots_sitemap_advertisement():
    """Sitemap: lines are group-independent and surface both through
    parse_sitemap_urls and the robots_rules sitemaps column."""
    from da_transform_judgments_pipeline_spark.operators.robots import (
        parse_sitemap_urls,
    )

    content = ("Sitemap: https://h/sitemap1.xml\n"
               "User-agent: a\nDisallow: /x\n"
               "Sitemap: https://h/sitemap2.xml.gz\n"
               "User-agent: *\nDisallow: /\n")
    assert parse_sitemap_urls(content) == [
        "https://h/sitemap1.xml", "https://h/sitemap2.xml.gz"
    ]


def test_robots_rules_sitemaps_column(spark):
    from da_transform_judgments_pipeline_spark.operators.robots import (
        robots_rules,
    )

    df = spark.createDataFrame(
        [("h.example",
          "Sitemap: https://h.example/s.xml\nUser-agent: *\nDisallow: /p\n"),
         ("none.example", "User-agent: *\nDisallow: /q\n")],
        "host string, content string",
    )
    out = {r["host"]: r["sitemaps"]
           for r in robots_rules(df, agent="g").collect()}
    assert out["h.example"] == ["https://h.example/s.xml"]
    assert out["none.example"] == []
