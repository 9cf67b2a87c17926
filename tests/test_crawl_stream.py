"""Streaming crawl-intake tests (streaming/crawl_stream): the x29 chain
driven incrementally by an arriving-WARC manifest stream, with the T10
ledger + idempotent frontier append proving exactly-once under chaos."""

import json

from da_transform_judgments_pipeline_spark.sources import frontier
from da_transform_judgments_pipeline_spark.sources.warc import build_warc_gz
from da_transform_judgments_pipeline_spark.streaming.crawl_stream import (
    read_seen,
    run_crawl_stream,
)


def _html(body):
    return (
        "<html><head><script>t();</script></head><body><p>"
        + body + "</p><!-- c --></body></html>"
    ).encode()


def _warc(path, urls_bodies):
    blob = build_warc_gz([
        {"url": u, "date": "2021-03-04T05:06:07Z", "payload": _html(b)}
        for u, b in urls_bodies
    ])
    path.write_bytes(blob)
    return str(path)


def _read(spark, path):
    try:
        return spark.read.parquet(str(path))
    except Exception:
        return None


def test_crawl_stream_two_wave_chaos_exactly_once(spark, tmp_path):
    """One continuous crawl-intake stream (one checkpoint) through 2
    waves with (a) an injected crash in the worst-case window — after
    accepted/duplicates/errors sinks, the frontier append AND the
    processed ledger, before the offset commit — forcing a full batch
    replay on restart; (b) a duplicate manifest resend in the SAME wave
    and a cross-restart resend of an already-processed file; (c) a
    re-crawl of an already-indexed URL (url_seen), an in-batch
    re-discovery (in_batch_dup), and a truncated WARC (error isolation).
    Exactly-once everywhere: zero duplicate accepted rows, zero
    duplicate frontier canonicals, one error row, ledger keys unique."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    warcs = tmp_path / "warcs"
    warcs.mkdir()
    manifests = tmp_path / "manifests"
    manifests.mkdir()
    out = tmp_path / "out"

    table = "crawl_stream_chaos_frontier"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    frontier.build_url_index(
        spark.createDataFrame(
            [("https://h.example/seed",)], "url string"
        ),
        table, buckets=4, path=str(tmp_path / "fidx"),
    )

    # wave-1 files: f1 = two new pages + a messy re-crawl of the seed;
    # f2 = re-discovers /b (in-batch dup vs f1 pos 1) + one new page;
    # f3 = truncated (error isolation)
    f1 = _warc(warcs / "f1.warc.gz", [
        ("https://h.example/a", "alpha body one"),
        ("https://h.example/b#frag", "bravo body two"),
        ("HTTPS://H.example:443/x/../seed", "seed recrawl"),
    ])
    f2 = _warc(warcs / "f2.warc.gz", [
        ("https://h.example/b", "bravo mirror"),
        ("https://h.example/c", "charlie body"),
    ])
    blob3 = build_warc_gz([{
        "url": "https://h.example/broken",
        "date": "2021-03-04T05:06:07Z", "payload": _html("x"),
    }])
    (warcs / "f3.warc.gz").write_bytes(blob3[:-7])
    f3 = str(warcs / "f3.warc.gz")

    lines = [
        {"file_id": 1, "path": f1},
        {"file_id": 1, "path": f1},  # duplicate resend, same wave
        {"file_id": 2, "path": f2},
        {"file_id": 3, "path": f3},
    ]
    (manifests / "wave1.jsonl").write_text(
        "\n".join(json.dumps(x) for x in lines) + "\n"
    )

    armed = {"crash": True}

    def chaos_hook(batch_id):
        if armed["crash"]:
            armed["crash"] = False
            raise RuntimeError("injected crash before offset commit")

    def run_wave():
        q = run_crawl_stream(
            spark, str(manifests), table, str(out),
            on_batch_complete=chaos_hook,
        )
        try:
            q.awaitTermination(120)
        except StreamingQueryException as exc:
            return exc
        finally:
            if q.isActive:
                q.stop()
        return None

    # wave 1, attempt 1: all sinks written once, then the crash
    failure = run_wave()
    assert failure is not None and "injected crash" in str(failure)
    # restart, same checkpoint: the batch replays; the ledger swallows it
    assert run_wave() is None

    acc = _read(spark, out / "accepted").collect()
    assert sorted(r["canonical"] for r in acc) == [
        "https://h.example/a", "https://h.example/b", "https://h.example/c",
    ]
    by_canon = {r["canonical"]: r for r in acc}
    # the in-batch dup rule kept f1's /b (lowest (file_id, pos))
    assert by_canon["https://h.example/b"]["file_id"] == 1
    assert by_canon["https://h.example/a"]["text"] == "alpha body one"
    assert all(r["digest_ok"] for r in acc)
    assert all(r["detected_lang"] is not None for r in acc)
    assert all(r["quality_keep"] in (0, 1) for r in acc)

    dups = _read(spark, out / "duplicates").collect()
    got = sorted((r["canonical"], r["reason"]) for r in dups)
    assert got == [
        ("https://h.example/b", "in_batch_dup"),
        ("https://h.example/seed", "url_seen"),
    ]
    errs = _read(spark, out / "errors").collect()
    assert len(errs) == 1 and errs[0]["file_id"] == 3

    # wave 2: cross-restart resend of f1 (must be a no-op) + f4 whose
    # /c is now url_seen (frontier grew in wave 1) and /d is new
    f4 = _warc(warcs / "f4.warc.gz", [
        ("https://h.example/c", "charlie again"),
        ("https://h.example/d", "delta body"),
    ])
    (manifests / "wave2.jsonl").write_text(
        json.dumps({"file_id": 1, "path": f1}) + "\n"
        + json.dumps({"file_id": 4, "path": f4}) + "\n"
    )
    assert run_wave() is None

    acc2 = _read(spark, out / "accepted").collect()
    assert sorted(r["canonical"] for r in acc2) == [
        "https://h.example/a", "https://h.example/b",
        "https://h.example/c", "https://h.example/d",
    ]
    dups2 = _read(spark, out / "duplicates").collect()
    assert sorted((r["canonical"], r["reason"]) for r in dups2) == [
        ("https://h.example/b", "in_batch_dup"),
        ("https://h.example/c", "url_seen"),
        ("https://h.example/seed", "url_seen"),
    ]
    # frontier: one row per canonical, seed + a/b/c/d
    idx = spark.table(table).collect()
    canons = sorted(r["canonical"] for r in idx)
    assert canons == sorted(set(canons))
    assert len(canons) == 5
    # ledger: each processed path exactly once (f1 NOT re-recorded)
    led = [r["exec_name"] for r in
           _read(spark, out / "processed").collect()]
    assert sorted(led) == sorted(set(led)) and len(led) == 4
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_crawl_stream_crash_every_window_exactly_once(spark, tmp_path):
    """Crash injected into EACH window of the batch sequence — (1)
    after the corpus sinks but BEFORE the ledger append (the worst
    pre-ledger window: accepted already on disk, replay must OVERWRITE
    it, not re-append), (2) after the ledger but before the index
    append (replay must reprocess the full batch despite its own
    ledger rows), (3) after the index append (replay must not flip its
    own accepted rows into url_seen) — each followed by a restart.
    After every recovery: zero duplicate accepted rows, duplicates
    routing unchanged, one frontier row per canonical, unique ledger
    keys."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from da_transform_judgments_pipeline_spark.streaming import (
        crawl_stream as cs,
    )

    warcs = tmp_path / "warcs"
    warcs.mkdir()
    manifests = tmp_path / "manifests"
    manifests.mkdir()
    out = tmp_path / "out"
    table = "crawl_stream_window_frontier"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    frontier.build_url_index(
        spark.createDataFrame([("https://w.example/seed",)], "url string"),
        table, buckets=2, path=str(tmp_path / "fidx"),
    )

    def run_once():
        q = run_crawl_stream(spark, str(manifests), table, str(out))
        try:
            q.awaitTermination(120)
        except StreamingQueryException as exc:
            return exc
        finally:
            if q.isActive:
                q.stop()
        return None

    expected = ["https://w.example/seed"]
    waves = [
        ("after_sinks", ["a", "b"]),
        ("after_ledger", ["c"]),
        ("after_index", ["d", "e"]),
    ]
    for wave_no, (window, pages) in enumerate(waves):
        _warc(warcs / f"w{wave_no}.warc.gz", [
            (f"https://w.example/{p}", f"{p} body text") for p in pages
        ] + [("https://w.example/seed", "seed recrawl")])
        (manifests / f"wave{wave_no}.jsonl").write_text(json.dumps(
            {"file_id": wave_no, "path": str(warcs / f"w{wave_no}.warc.gz")}
        ) + "\n")

        armed = {"on": True}

        def hook(point, batch_id, _w=window, _armed=armed):
            if point == _w and _armed["on"]:
                _armed["on"] = False
                raise RuntimeError(f"injected crash at {_w}")

        cs._chaos_hook = hook
        try:
            failure = run_once()
            assert failure is not None and "injected crash" in str(failure)
            assert run_once() is None  # restart: replay converges
        finally:
            cs._chaos_hook = None

        expected += [f"https://w.example/{p}" for p in pages]
        acc = _read(spark, out / "accepted").collect()
        got = sorted(r["canonical"] for r in acc)
        assert got == sorted(set(got)), f"{window}: duplicate accepted"
        assert got == sorted(expected[1:]), window
        dups = sorted(
            (r["canonical"], r["reason"])
            for r in _read(spark, out / "duplicates").collect()
        )
        assert dups == [
            ("https://w.example/seed", "url_seen"),
        ] * (wave_no + 1), window
        idx = [r["canonical"] for r in spark.table(table).collect()]
        assert sorted(idx) == sorted(set(expected)), window
        led = [r["exec_name"] for r in
               _read(spark, out / "processed").collect()]
        assert sorted(led) == sorted(set(led)) and len(led) == wave_no + 1
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_crawl_stream_robots_gate_and_mojibake_repair(spark, tmp_path):
    """The composed crawler triad in the stream: with a robots_rules
    broadcast, disallowed pages route to out/disallowed BEFORE the
    frontier decision and never enter the index; mojibake'd bodies are
    repaired by the in-chain x34 fixer before language/quality see
    them."""
    from da_transform_judgments_pipeline_spark.operators.robots import (
        robots_rules,
    )

    warcs = tmp_path / "warcs"
    warcs.mkdir()
    manifests = tmp_path / "manifests"
    manifests.mkdir()
    out = tmp_path / "out"
    table = "crawl_stream_robots_frontier"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    frontier.build_url_index(
        spark.createDataFrame([("https://x.example/seed",)], "url string"),
        table, buckets=2, path=str(tmp_path / "fidx"),
    )
    good = "Café body — naïve text of the judgment here"
    bad = good.encode("utf-8").decode("cp1252")
    f1 = _warc(warcs / "f1.warc.gz", [
        ("https://h.example/private/x", "secret page"),
        ("https://h.example/ok", bad),
    ])
    (manifests / "w.jsonl").write_text(
        json.dumps({"file_id": 1, "path": f1}) + "\n"
    )
    rules = robots_rules(
        spark.createDataFrame(
            [("h.example", "User-agent: *\nDisallow: /private/\n")],
            "host string, content string",
        ),
        agent="graftbot",
    )
    q = run_crawl_stream(
        spark, str(manifests), table, str(out), rules=rules
    )
    q.awaitTermination(120)
    acc = _read(spark, out / "accepted").collect()
    assert [r["canonical"] for r in acc] == ["https://h.example/ok"]
    assert acc[0]["text"] == good  # mojibake repaired in-chain
    dis = _read(spark, out / "disallowed").collect()
    assert [r["canonical"] for r in dis] == ["https://h.example/private/x"]
    canons = {r["canonical"] for r in spark.table(table).collect()}
    assert "https://h.example/private/x" not in canons
    assert "https://h.example/ok" in canons
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_crawl_ledger_compaction_keeps_partition_layout(spark, tmp_path):
    """Compacting the crawl's batch_id-PARTITIONED ledger must keep the
    partition layout (compacted keys land in the reserved batch_id=-1
    partition): plain files beside later batch_id=N subdirs would break
    Spark's partition discovery for every subsequent wave. After
    compaction: a resend still drops at the guard, and a genuinely new
    wave still writes its own ledger partition."""
    from da_transform_judgments_pipeline_spark.streaming.orchestrator import (
        compact_processed_ledger,
    )

    warcs = tmp_path / "warcs"
    warcs.mkdir()
    manifests = tmp_path / "manifests"
    manifests.mkdir()
    out = tmp_path / "out"
    table = "crawl_ledger_compact_frontier"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    frontier.build_url_index(
        spark.createDataFrame([("https://x.example/seed",)], "url string"),
        table, buckets=2, path=str(tmp_path / "fidx"),
    )
    f1 = _warc(warcs / "f1.warc.gz", [("https://h.example/a", "a body")])
    (manifests / "w1.jsonl").write_text(json.dumps(
        {"file_id": 1, "path": f1}) + "\n")
    q = run_crawl_stream(spark, str(manifests), table, str(out))
    q.awaitTermination(120)

    stats = compact_processed_ledger(spark, str(out))
    assert stats["keys"] == 1
    led = _read(spark, out / "processed")
    assert "batch_key" in led.columns  # layout preserved
    assert [r["batch_key"] for r in led.collect()] == ["compacted"]

    # wave 2: resend f1 (guard drops) + a new f2 (processed, new
    # ledger partition lands beside batch_id=-1 without conflict)
    f2 = _warc(warcs / "f2.warc.gz", [("https://h.example/b", "b body")])
    (manifests / "w2.jsonl").write_text(
        json.dumps({"file_id": 1, "path": f1}) + "\n"
        + json.dumps({"file_id": 2, "path": f2}) + "\n"
    )
    q = run_crawl_stream(spark, str(manifests), table, str(out))
    q.awaitTermination(120)
    acc = sorted(r["canonical"]
                 for r in _read(spark, out / "accepted").collect())
    assert acc == ["https://h.example/a", "https://h.example/b"]
    led2 = [r["exec_name"] for r in
            _read(spark, out / "processed").collect()]
    assert sorted(led2) == sorted(set(led2)) and len(led2) == 2
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_crawl_stream_sitemap_and_politeness(spark, tmp_path):
    """The crawler triad COMPOSED in the stream: robots 'Sitemap:'
    advertisements and fetched sitemaps' <loc> entries feed
    out/discovered beside links/redirects, and with rules supplied the
    queue carries the per-host politeness schedule (slot, offset_sec =
    slot x Crawl-delay). Across two waves: the advertised sitemap URL
    is discovered exactly ONCE (wave 1), routed to out/sitemaps when
    its WARC arrives (wave 2, never a corpus row), and its entries
    become wave-2 discoveries."""
    from da_transform_judgments_pipeline_spark.operators.robots import (
        robots_rules,
    )

    warcs = tmp_path / "warcs"
    warcs.mkdir()
    manifests = tmp_path / "manifests"
    manifests.mkdir()
    out = tmp_path / "out"
    table = "crawl_stream_sitemap_frontier"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    frontier.build_url_index(
        spark.createDataFrame([("https://x.example/seed",)], "url string"),
        table, buckets=2, path=str(tmp_path / "fidx"),
    )
    rules = robots_rules(
        spark.createDataFrame(
            [
                ("h.example",
                 "User-agent: *\nCrawl-delay: 2\n"
                 "Sitemap: https://h.example/sitemap.xml\n"),
                ("i.example", "User-agent: *\n"),
            ],
            "host string, content string",
        ),
        agent="graftbot",
    ).localCheckpoint(eager=True)

    blob1 = build_warc_gz([
        {"url": "https://h.example/p1", "date": "2021-03-04T05:06:07Z",
         "payload": (b"<html><body><p>page one body</p>"
                     b'<a href="/l1">a</a>'
                     b'<a href="//i.example/l2">b</a></body></html>')},
    ])
    (warcs / "f1.warc.gz").write_bytes(blob1)
    (manifests / "w1.jsonl").write_text(json.dumps(
        {"file_id": 1, "path": str(warcs / "f1.warc.gz")}) + "\n")
    q = run_crawl_stream(spark, str(manifests), table, str(out),
                         rules=rules)
    q.awaitTermination(120)

    disc1 = _read(spark, out / "discovered").collect()
    got1 = {r["canonical"]: (r["host"], r["crawl_delay"], r["slot"],
                             r["offset_sec"]) for r in disc1}
    assert got1 == {
        "https://h.example/l1": ("h.example", 2.0, 0, 0.0),
        "https://h.example/sitemap.xml": ("h.example", 2.0, 1, 2.0),
        "https://i.example/l2": ("i.example", 1.0, 0, 0.0),
    }

    # wave 2: the advertised sitemap's WARC + one queued page arrive
    sm_xml = (
        b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        b"<url><loc>https://h.example/s1</loc></url>"
        b"<url><loc>https://h.example/s2</loc></url></urlset>"
    )
    blob2 = build_warc_gz([
        {"url": "https://h.example/sitemap.xml",
         "date": "2021-03-04T05:06:07Z", "payload": sm_xml},
        {"url": "https://h.example/l1", "date": "2021-03-04T05:06:07Z",
         "payload": b"<html><body><p>l-one body</p></body></html>"},
    ])
    (warcs / "f2.warc.gz").write_bytes(blob2)
    (manifests / "w2.jsonl").write_text(json.dumps(
        {"file_id": 2, "path": str(warcs / "f2.warc.gz")}) + "\n")
    q = run_crawl_stream(spark, str(manifests), table, str(out),
                         rules=rules)
    q.awaitTermination(120)

    acc = sorted(r["canonical"]
                 for r in _read(spark, out / "accepted").collect())
    assert acc == ["https://h.example/l1", "https://h.example/p1"]
    sm = read_seen(spark, str(out), "sitemap").collect()
    assert [(r["canonical"], r["kind"], r["n_entries"], r["error"])
            for r in sm] == [
        ("https://h.example/sitemap.xml", "urlset", 2, None),
    ]
    disc = _read(spark, out / "discovered").collect()
    # the advertised URL was discovered exactly once (wave 1)
    assert sum(
        1 for r in disc
        if r["canonical"] == "https://h.example/sitemap.xml"
    ) == 1
    wave2 = {r["canonical"]: (r["slot"], r["offset_sec"]) for r in disc
             if r["batch_key"].endswith("-1")}
    assert wave2 == {
        "https://h.example/s1": (0, 0.0),
        "https://h.example/s2": (1, 2.0),
    }
    idx = {r["canonical"] for r in spark.table(table).collect()}
    assert "https://h.example/sitemap.xml" in idx  # fetched → seen
    assert "https://h.example/s1" not in idx       # discovered ≠ fetched
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_crawl_stream_redirect_discovery(spark, tmp_path):
    """3xx responses route to out/redirects (their URL marked fetched
    in the index), and their Location targets land in out/discovered —
    frontier-deduped but NOT indexed, so the target's own WARC is still
    ACCEPTED when it arrives in a later wave."""
    from da_transform_judgments_pipeline_spark.sources.warc import (
        build_warc_gz,
    )

    warcs = tmp_path / "warcs"
    warcs.mkdir()
    manifests = tmp_path / "manifests"
    manifests.mkdir()
    out = tmp_path / "out"
    table = "crawl_stream_redirect_frontier"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    frontier.build_url_index(
        spark.createDataFrame([("https://x.example/seed",)], "url string"),
        table, buckets=2, path=str(tmp_path / "fidx"),
    )
    blob = build_warc_gz([
        {"url": "https://h.example/old", "date": "2021-03-04T05:06:07Z",
         "status": 301, "location": "https://h.example/new",
         "payload": b"<html><body><p>moved</p></body></html>"},
        {"url": "https://h.example/also-old",
         "date": "2021-03-04T05:06:07Z",
         "status": 302, "location": "https://h.example/new",
         "payload": b"<html><body><p>moved too</p></body></html>"},
        {"url": "https://h.example/page", "date": "2021-03-04T05:06:07Z",
         "payload": (b"<html><body><p>a real page body</p>"
                     b'<a href="/linked">in-site</a>'
                     b'<a href="https://h.example/page">self</a>'
                     b'<a href="sub/rel">relative</a>'
                     b'<a href="mailto:x@y">drop</a>'
                     b"</body></html>")},
    ])
    (warcs / "f1.warc.gz").write_bytes(blob)
    (manifests / "w1.jsonl").write_text(json.dumps(
        {"file_id": 1, "path": str(warcs / "f1.warc.gz")}) + "\n")
    q = run_crawl_stream(spark, str(manifests), table, str(out))
    q.awaitTermination(120)
    acc = {r["canonical"] for r in _read(spark, out / "accepted").collect()}
    assert acc == {"https://h.example/page"}
    red = read_seen(spark, str(out), "redirect").collect()
    assert sorted((r["canonical"], r["location"]) for r in red) == [
        ("https://h.example/also-old", "https://h.example/new"),
        ("https://h.example/old", "https://h.example/new"),
    ]
    disc = _read(spark, out / "discovered").collect()
    # two redirects share one target → ONE discovery (in-batch dedup,
    # arrival order keeps the first redirect's discovery); the page's
    # extracted /linked href is a discovery too; the self-link is
    # suppressed (its canonical was just indexed) and mailto dropped
    assert sorted(r["canonical"] for r in disc) == [
        "https://h.example/linked", "https://h.example/new",
        "https://h.example/sub/rel",  # path-relative: §5.3 merge on
    ]
    idx = {r["canonical"] for r in spark.table(table).collect()}
    assert "https://h.example/old" in idx          # fetched → seen
    assert "https://h.example/new" not in idx      # discovered ≠ fetched
    # the link-graph sink: one canonical edge per extracted anchor of
    # the accepted page (self-link included — it IS an edge; mailto
    # dropped at resolution)
    edges = sorted((r["src"], r["dst"]) for r in
                   _read(spark, out / "links").collect())
    assert edges == [
        ("https://h.example/page", "https://h.example/linked"),
        ("https://h.example/page", "https://h.example/page"),
        ("https://h.example/page", "https://h.example/sub/rel"),
    ]
    # wave 2: the target's own WARC arrives → ACCEPTED (not url_seen)
    blob2 = build_warc_gz([
        {"url": "https://h.example/new", "date": "2021-03-04T05:06:07Z",
         "payload": b"<html><body><p>the target body</p></body></html>"},
    ])
    (warcs / "f2.warc.gz").write_bytes(blob2)
    (manifests / "w2.jsonl").write_text(json.dumps(
        {"file_id": 2, "path": str(warcs / "f2.warc.gz")}) + "\n")
    q = run_crawl_stream(spark, str(manifests), table, str(out))
    q.awaitTermination(120)
    acc2 = {r["canonical"]: r["text"] for r in
            _read(spark, out / "accepted").collect()}
    assert acc2["https://h.example/new"] == "the target body"
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_crawl_stream_warc_zst_transport(spark, tmp_path):
    """The streaming intake is transport-agnostic: a wave of .warc.zst
    files (real libzstd frames per record) flows through the SAME
    run_crawl_stream path — parse, canonicalize, frontier, text — and a
    dictionary-requiring zst file isolates as one error row instead of
    failing the batch."""
    from da_transform_judgments_pipeline_spark.sources.warc import (
        build_warc_zst,
    )

    warcs = tmp_path / "warcs"
    warcs.mkdir()
    manifests = tmp_path / "manifests"
    manifests.mkdir()
    out = tmp_path / "out"

    table = "crawl_stream_zst_frontier"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    frontier.build_url_index(
        spark.createDataFrame([("https://z.example/seed",)], "url string"),
        table, buckets=4, path=str(tmp_path / "fidx"),
    )

    blob1 = build_warc_zst([
        {"url": "https://z.example/a", "date": "2021-03-04T05:06:07Z",
         "payload": _html("alpha zst body")},
        {"url": "https://z.example/b", "date": "2021-03-04T05:06:07Z",
         "payload": _html("bravo zst body")},
    ], level=19)
    (warcs / "z1.warc.zst").write_bytes(blob1)
    # a frame declaring an external dictionary: typed refusal -> error row
    bad = bytearray(build_warc_zst(
        [{"url": "https://z.example/c", "date": "2021-03-04T05:06:07Z",
          "payload": _html("c")}],
        leading_skippable=False,
    ))
    desc = bad[4]
    bad[4] = desc | 0x01
    bad.insert(5 + (0 if desc & 0x20 else 1), 0x07)
    (warcs / "z2.warc.zst").write_bytes(bytes(bad))

    (manifests / "wave.jsonl").write_text(
        json.dumps({"file_id": 1, "path": str(warcs / "z1.warc.zst")})
        + "\n"
        + json.dumps({"file_id": 2, "path": str(warcs / "z2.warc.zst")})
        + "\n"
    )
    q = run_crawl_stream(spark, str(manifests), table, str(out))
    q.awaitTermination(120)
    if q.isActive:
        q.stop()

    acc = _read(spark, out / "accepted").collect()
    assert sorted(r["canonical"] for r in acc) == [
        "https://z.example/a", "https://z.example/b",
    ]
    by = {r["canonical"]: r for r in acc}
    assert by["https://z.example/a"]["text"] == "alpha zst body"
    assert all(r["digest_ok"] for r in acc)
    errs = _read(spark, out / "errors").collect()
    assert len(errs) == 1 and errs[0]["file_id"] == 2
    assert "dictionary" in errs[0]["error"]
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_crawl_stream_cdx_sink(spark, tmp_path):
    """emit_cdx=True: the stream maintains the archive's random-access
    index as it ingests — one CDX row per record with the compressed
    byte range + archive path, batch-partitioned like every other
    sink; any row serves its record back via one ranged read."""
    from da_transform_judgments_pipeline_spark.sources.warc import (
        fetch_warc_record,
    )

    warcs = tmp_path / "warcs"
    warcs.mkdir()
    manifests = tmp_path / "manifests"
    manifests.mkdir()
    out = tmp_path / "out"

    table = "crawl_stream_cdx_frontier"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    frontier.build_url_index(
        spark.createDataFrame([("https://c.example/seed",)], "url string"),
        table, buckets=4, path=str(tmp_path / "fidx"),
    )
    p1 = _warc(warcs / "c1.warc.gz", [
        ("https://c.example/a", "alpha body"),
        ("https://c.example/b", "bravo body"),
    ])
    (manifests / "wave.jsonl").write_text(
        json.dumps({"file_id": 1, "path": p1}) + "\n"
    )
    q = run_crawl_stream(
        spark, str(manifests), table, str(out), emit_cdx=True
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()

    cdx = _read(spark, out / "cdx").collect()
    # warcinfo + 2 responses
    assert len(cdx) == 3
    responses = [r for r in cdx if r["warc_type"] == "response"]
    assert sorted(r["target_uri"] for r in responses) == [
        "https://c.example/a", "https://c.example/b",
    ]
    row = responses[0]
    blob = open(row["warc_path"], "rb").read()
    rec = fetch_warc_record(
        blob, row["offset"], row["length"], row["member_pos"]
    )
    assert rec["target_uri"] == row["target_uri"]
    assert rec["digest_ok"] is True

    # r14 maintenance pass: the accreted per-batch cdx partitions
    # compact into the SURT-ordered random-access layout, and a
    # host-prefix row from THAT layout still serves its record back
    # via one ranged read
    from pyspark.sql import functions as F

    from da_transform_judgments_pipeline_spark.streaming.crawl_stream \
        import compact_cdx_surt

    n = compact_cdx_surt(spark, str(out), str(tmp_path / "cdx_surt"))
    assert n >= 1
    surt = spark.read.parquet(str(tmp_path / "cdx_surt"))
    hit = (
        surt.filter(F.col("surt").startswith("example,c)/a"))
        .collect()
    )
    assert len(hit) == 1
    h = hit[0]
    rec2 = fetch_warc_record(
        open(h["warc_path"], "rb").read(),
        h["offset"], h["length"], h["member_pos"],
    )
    assert rec2["target_uri"] == "https://c.example/a"
    assert rec2["digest_ok"] is True
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_crawl_stream_sitemap_mime_sniff_routing(spark, tmp_path):
    """Sitemap classification is CONTENT-first, not URL-regex: an RSS
    feed served at /feed.xml stays a CORPUS page (it used to be
    silently dropped as a 'sitemap'), an extension-less /sitemap whose
    body is <urlset> routes to out/sitemaps with its <loc> entries
    discovered, and a gzip-transport sitemap (unsniffable head; mime +
    .xml.gz URL tiebreak) parses through parse_sitemap's gzip path.

    r13 (per r12 ADVICE): a gzip ASSET (application/gzip mime, no
    sitemap-shaped URL — e.g. a fetched .tar.gz) stays a CORPUS row
    instead of being permanently mis-indexed as a broken sitemap; and
    a PLAIN sitemap whose <urlset> root sits past the 2048-byte sniff
    window (long comment preamble) still routes to discovery via the
    declared-XML-mime + sitemap-URL tiebreak."""
    import gzip as _gzip

    warcs = tmp_path / "warcs"
    warcs.mkdir()
    manifests = tmp_path / "manifests"
    manifests.mkdir()
    out = tmp_path / "out"
    table = "crawl_stream_sniff_frontier"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    frontier.build_url_index(
        spark.createDataFrame([("https://h.example/seed",)], "url string"),
        table, buckets=2, path=str(tmp_path / "fidx"),
    )
    feed = (
        b'<?xml version="1.0"?><rss version="2.0"><channel>'
        b"<title>my feed</title><description>feed body text here"
        b"</description></channel></rss>"
    )
    sm_plain = (
        b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        b"<url><loc>https://h.example/s1</loc></url>"
        b"<url><loc>https://h.example/s2</loc></url></urlset>"
    )
    sm_gz_body = (
        b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        b"<url><loc>https://h.example/s3</loc></url></urlset>"
    )
    sm_late = (
        b'<?xml version="1.0"?><!-- '
        + b"preamble padding " * 150  # root element past the 2048 sniff
        + b' --><urlset'
        b' xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        b"<url><loc>https://h.example/s4</loc></url></urlset>"
    )
    assert sm_late.index(b"<urlset") > 2048
    tarball = _gzip.compress(b"\x00fake-tar-members" * 40, mtime=0)
    blob = build_warc_gz([
        {"url": "https://h.example/feed.xml",
         "date": "2021-03-04T05:06:07Z", "payload": feed,
         "content_type": "application/xml"},
        {"url": "https://h.example/sitemap",
         "date": "2021-03-04T05:06:07Z", "payload": sm_plain,
         "content_type": "application/xml"},
        {"url": "https://h.example/sm2.xml.gz",
         "date": "2021-03-04T05:06:07Z",
         "payload": _gzip.compress(sm_gz_body, mtime=0),
         "content_type": "application/x-gzip"},
        {"url": "https://h.example/assets/data.tar.gz",
         "date": "2021-03-04T05:06:07Z", "payload": tarball,
         "content_type": "application/gzip"},
        {"url": "https://h.example/late.xml",
         "date": "2021-03-04T05:06:07Z", "payload": sm_late,
         "content_type": "application/xml"},
    ])
    (warcs / "f1.warc.gz").write_bytes(blob)
    (manifests / "w1.jsonl").write_text(json.dumps(
        {"file_id": 1, "path": str(warcs / "f1.warc.gz")}) + "\n")
    q = run_crawl_stream(spark, str(manifests), table, str(out))
    q.awaitTermination(120)

    acc = sorted(
        r["canonical"] for r in _read(spark, out / "accepted").collect()
    )
    # the feed AND the gzip asset are corpus rows (the asset would
    # previously have been mis-routed to sitemaps on its generic gzip
    # mime alone and silently dropped from the corpus forever)
    assert acc == [
        "https://h.example/assets/data.tar.gz",
        "https://h.example/feed.xml",
    ]
    sm = {r["canonical"]: (r["kind"], r["n_entries"], r["error"])
          for r in read_seen(spark, str(out), "sitemap").collect()}
    assert sm == {
        "https://h.example/sitemap": ("urlset", 2, None),
        "https://h.example/sm2.xml.gz": ("urlset", 1, None),
        "https://h.example/late.xml": ("urlset", 1, None),
    }
    disc = sorted(r["canonical"]
                  for r in _read(spark, out / "discovered").collect())
    assert disc == [
        "https://h.example/s1", "https://h.example/s2",
        "https://h.example/s3", "https://h.example/s4",
    ]
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_crawl_stream_revisit_routing(spark, tmp_path):
    """r13: WARC revisit records (the CC dedup convention) route
    seen-not-corpus — the revisited URL is marked fetched in the
    frontier index (no re-queue next wave), its row lands in
    out/revisits carrying refers_to + payload_digest (where the
    content actually lives), and it never re-enters the corpus as an
    empty accepted page. A chunked+gzip page in the same wave proves
    the decoded-payload path composes with the stream."""
    warcs = tmp_path / "warcs"
    warcs.mkdir()
    manifests = tmp_path / "manifests"
    manifests.mkdir()
    out = tmp_path / "out"
    table = "crawl_stream_revisit_frontier"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    frontier.build_url_index(
        spark.createDataFrame([("https://h.example/seed",)], "url string"),
        table, buckets=2, path=str(tmp_path / "fidx"),
    )
    body = _html("original page body with a few words of prose")
    rid = "<urn:uuid:00000000-0000-0000-0000-0000000000aa>"
    blob = build_warc_gz([
        # a real page whose payload is stored chunked+gzip on the wire
        {"url": "https://h.example/page", "date": "2021-03-04T05:06:07Z",
         "payload": body, "record_id": rid,
         "content_encoding": "gzip", "transfer_encoding": "chunked"},
        # a revisit of a DIFFERENT url pointing at that record
        {"url": "https://h.example/mirror",
         "date": "2021-03-05T05:06:07Z", "payload": body,
         "warc_type": "revisit", "refers_to": rid},
    ])
    (warcs / "f1.warc.gz").write_bytes(blob)
    (manifests / "w1.jsonl").write_text(json.dumps(
        {"file_id": 1, "path": str(warcs / "f1.warc.gz")}) + "\n")
    q = run_crawl_stream(spark, str(manifests), table, str(out))
    q.awaitTermination(120)

    acc = {r["canonical"]: r["text"]
           for r in _read(spark, out / "accepted").collect()}
    # only the real page is corpus — with its payload DECODED (the
    # chunk framing and gzip stream never reach html_text)
    assert list(acc) == ["https://h.example/page"]
    assert "original page body" in acc["https://h.example/page"]
    rev = read_seen(spark, str(out), "revisit").collect()
    assert [(r["canonical"], r["refers_to"]) for r in rev] == [
        ("https://h.example/mirror", rid)
    ]
    assert rev[0]["payload_digest"].startswith("sha1:")
    # both canonicals are indexed as fetched: a second wave re-serving
    # the mirror URL dedups to url_seen instead of re-queueing
    idx = {r["canonical"] for r in spark.table(table).collect()}
    assert {"https://h.example/page", "https://h.example/mirror"} <= idx
    blob2 = build_warc_gz([
        {"url": "https://h.example/mirror",
         "date": "2021-03-06T05:06:07Z", "payload": body},
    ])
    (warcs / "f2.warc.gz").write_bytes(blob2)
    (manifests / "w2.jsonl").write_text(json.dumps(
        {"file_id": 2, "path": str(warcs / "f2.warc.gz")}) + "\n")
    q = run_crawl_stream(spark, str(manifests), table, str(out))
    q.awaitTermination(120)
    dups = [(r["canonical"], r["reason"])
            for r in _read(spark, out / "duplicates").collect()]
    assert ("https://h.example/mirror", "url_seen") in dups
    acc2 = [r["canonical"] for r in _read(spark, out / "accepted").collect()]
    assert acc2 == ["https://h.example/page"]  # still the one corpus row
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_crawl_stream_meta_robots_routing(spark, tmp_path):
    """r13 page-level exclusion: a noindex page is fetched-but-not-
    corpus (routed to out/noindex, URL indexed, links STILL feed
    discovery), a nofollow page stays corpus but contributes no links,
    and a noindex,nofollow page does neither."""
    warcs = tmp_path / "warcs"
    warcs.mkdir()
    manifests = tmp_path / "manifests"
    manifests.mkdir()
    out = tmp_path / "out"
    table = "crawl_stream_metarobots_frontier"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    frontier.build_url_index(
        spark.createDataFrame([("https://h.example/seed",)], "url string"),
        table, buckets=2, path=str(tmp_path / "fidx"),
    )

    def page(meta, href, body):
        m = f'<meta name="robots" content="{meta}">' if meta else ""
        return (
            f"<html><head>{m}</head><body><p>{body}</p>"
            f'<a href="{href}">x</a></body></html>'
        ).encode()

    blob = build_warc_gz([
        {"url": "https://h.example/ni", "date": "2021-03-04T05:06:07Z",
         "payload": page("noindex", "/from-ni", "not for the corpus")},
        {"url": "https://h.example/nf", "date": "2021-03-04T05:06:07Z",
         "payload": page("NOFOLLOW", "/from-nf", "corpus but no links")},
        {"url": "https://h.example/both",
         "date": "2021-03-04T05:06:07Z",
         "payload": page("noindex, nofollow", "/from-both", "neither")},
        {"url": "https://h.example/plain",
         "date": "2021-03-04T05:06:07Z",
         "payload": page(None, "/from-plain", "normal page")},
        # r14: legal UNQUOTED content value — the r13 extractor
        # returned NULL here and this page entered the corpus
        {"url": "https://h.example/unq",
         "date": "2021-03-04T05:06:07Z",
         "payload": (
             b"<html><head><meta name=robots content=noindex></head>"
             b'<body><p>unquoted noindex</p><a href="/from-unq">x</a>'
             b"</body></html>"
         )},
        # r14: content=none is the spec shorthand for noindex,nofollow
        {"url": "https://h.example/none",
         "date": "2021-03-04T05:06:07Z",
         "payload": (
             b"<html><head><meta name=robots content=none></head>"
             b'<body><p>none page</p><a href="/from-none">x</a>'
             b"</body></html>"
         )},
        # r14: a robots-prefixed decoy name must NOT suppress the page
        {"url": "https://h.example/decoy",
         "date": "2021-03-04T05:06:07Z",
         "payload": (
             b'<html><head><meta name="robotsx" content="noindex">'
             b'</head><body><p>decoy meta page</p>'
             b'<a href="/from-decoy">x</a></body></html>'
         )},
        # a declared-Latin-1 page: the r13 charset ladder must decode
        # it before extraction (a blind UTF-8 cast would mojibake it)
        {"url": "https://h.example/latin",
         "date": "2021-03-04T05:06:07Z",
         "payload": "<html><body><p>Café crawl page</p></body></html>"
         .encode("latin-1"),
         "content_type": "text/html; charset=iso-8859-1"},
        # r14 (ADVICE): a hostile page — lying charset=utf-16 header,
        # even length, unpaired surrogate. Spark 4 ANSI F.decode
        # raises on it; decode_payloads must degrade to the raw cast
        # so ONE bad record never fails (and forever retries) the
        # whole foreachBatch batch
        {"url": "https://h.example/hostile",
         "date": "2021-03-04T05:06:07Z",
         "payload": (
             # 50 markup bytes + the lone high surrogate = 52, EVEN —
             # so the surrogate scan (not the odd-length fallback) is
             # what must route this to the raw cast
             b"<html><body><p>hostile utf16 lie</p></body></html>"
             b"\x00\xd8"
         ),
         "content_type": "text/html; charset=utf-16"},
    ])
    (warcs / "f1.warc.gz").write_bytes(blob)
    (manifests / "w1.jsonl").write_text(json.dumps(
        {"file_id": 1, "path": str(warcs / "f1.warc.gz")}) + "\n")
    q = run_crawl_stream(spark, str(manifests), table, str(out))
    q.awaitTermination(120)

    acc = {r["canonical"]: r["text"]
           for r in _read(spark, out / "accepted").collect()}
    assert sorted(acc) == [
        "https://h.example/decoy", "https://h.example/hostile",
        "https://h.example/latin", "https://h.example/nf",
        "https://h.example/plain",
    ]
    assert acc["https://h.example/latin"] == "Café crawl page"
    # the hostile declared-utf-16 page degraded to the raw cast (its
    # markup survives recognizably) instead of failing the batch
    assert "hostile utf16 lie" in acc["https://h.example/hostile"]
    ni = {r["canonical"]: r["robots_meta"]
          for r in read_seen(spark, str(out), "noindex").collect()}
    assert ni == {
        "https://h.example/ni": "noindex",
        "https://h.example/both": "noindex,nofollow",
        "https://h.example/unq": "noindex",
        "https://h.example/none": "none",
    }
    # discovery: noindex pages' links followed, nofollow (and none)
    # pages' dropped; the decoy meta never suppresses anything
    disc = sorted(r["canonical"]
                  for r in _read(spark, out / "discovered").collect())
    assert disc == [
        "https://h.example/from-decoy", "https://h.example/from-ni",
        "https://h.example/from-plain", "https://h.example/from-unq",
    ]
    # the graph sink honors nofollow (and the none shorthand) too
    links = sorted((r["src"], r["dst"])
                   for r in _read(spark, out / "links").collect())
    assert links == [
        ("https://h.example/decoy", "https://h.example/from-decoy"),
        ("https://h.example/ni", "https://h.example/from-ni"),
        ("https://h.example/plain", "https://h.example/from-plain"),
        ("https://h.example/unq", "https://h.example/from-unq"),
    ]
    # every fetched URL is indexed — noindex pages never re-queue
    idx = {r["canonical"] for r in spark.table(table).collect()}
    assert {"https://h.example/ni", "https://h.example/both",
            "https://h.example/unq", "https://h.example/none"} <= idx
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_crawl_stream_canonical_variant_routing(spark, tmp_path):
    """r13: a page declaring a SAME-HOST rel=canonical pointing
    elsewhere is a publisher-declared duplicate — routed to
    out/canonical_variants (seen-not-corpus, pointer + fingerprint
    recorded), its canonical TARGET queued for fetch, and the target's
    own later WARC still accepted. A CROSS-HOST declaration (the
    canonical-hijack spam vector) is ignored."""
    warcs = tmp_path / "warcs"
    warcs.mkdir()
    manifests = tmp_path / "manifests"
    manifests.mkdir()
    out = tmp_path / "out"
    table = "crawl_stream_canonvar_frontier"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    frontier.build_url_index(
        spark.createDataFrame([("https://h.example/seed",)], "url string"),
        table, buckets=2, path=str(tmp_path / "fidx"),
    )

    def page(canon, body):
        link = f'<link rel="canonical" href="{canon}">' if canon else ""
        return (
            f"<html><head>{link}</head><body><p>{body}</p></body></html>"
        ).encode()

    blob = build_warc_gz([
        {"url": "https://h.example/article?utm=x",
         "date": "2021-03-04T05:06:07Z",
         "payload": page("/article", "tracking variant of the piece")},
        {"url": "https://h.example/self",
         "date": "2021-03-04T05:06:07Z",
         # canonical pointing at ITSELF (modulo canonicalization):
         # not a variant, stays corpus
         "payload": page("https://h.example/self", "self canonical")},
        {"url": "https://h.example/victim",
         "date": "2021-03-04T05:06:07Z",
         "payload": page("https://evil.example/steal",
                         "cross host declaration ignored")},
    ])
    (warcs / "f1.warc.gz").write_bytes(blob)
    (manifests / "w1.jsonl").write_text(json.dumps(
        {"file_id": 1, "path": str(warcs / "f1.warc.gz")}) + "\n")
    q = run_crawl_stream(spark, str(manifests), table, str(out))
    q.awaitTermination(120)

    acc = sorted(r["canonical"]
                 for r in _read(spark, out / "accepted").collect())
    assert acc == ["https://h.example/self", "https://h.example/victim"]
    cv = {r["canonical"]: r["canon_target"] for r in
          read_seen(spark, str(out), "canonical_variant").collect()}
    assert cv == {
        "https://h.example/article?utm=x": "https://h.example/article",
    }
    disc = sorted(r["canonical"]
                  for r in _read(spark, out / "discovered").collect())
    assert disc == ["https://h.example/article"]
    # wave 2: the canonical target's own WARC arrives — accepted
    blob2 = build_warc_gz([
        {"url": "https://h.example/article",
         "date": "2021-03-05T05:06:07Z",
         "payload": page(None, "the real article body")},
    ])
    (warcs / "f2.warc.gz").write_bytes(blob2)
    (manifests / "w2.jsonl").write_text(json.dumps(
        {"file_id": 2, "path": str(warcs / "f2.warc.gz")}) + "\n")
    q = run_crawl_stream(spark, str(manifests), table, str(out))
    q.awaitTermination(120)
    acc2 = sorted(r["canonical"]
                  for r in _read(spark, out / "accepted").collect())
    assert "https://h.example/article" in acc2
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_own_canonicals_propagates_read_errors(spark, tmp_path):
    """_own_canonicals' exception posture, narrowed (round-12): an
    EMPTY crashed-attempt partition (dir exists, no committed parquet)
    still resolves to None — nothing reached the index — but a
    partition whose read-back genuinely FAILS (corrupt file standing in
    for transient IO) propagates, failing the batch for foreachBatch to
    retry, instead of silently flipping replay decisions."""
    import pytest
    from da_transform_judgments_pipeline_spark.streaming.crawl_stream import (
        _own_canonicals,
    )

    out = tmp_path / "out"
    key = "cafe0123-0"
    part = out / "accepted" / f"batch_key={key}"

    # window A: dir exists, zero committed files -> None (pre-commit
    # crash; the index never saw these rows either)
    part.mkdir(parents=True)
    assert _own_canonicals(spark, str(out), key) is None

    # window B: a committed-looking but unreadable file -> raise
    (part / "part-00000.snappy.parquet").write_bytes(b"not parquet at all")
    with pytest.raises(Exception) as exc:
        _own_canonicals(spark, str(out), key)
    assert "AnalysisException" not in type(exc.value).__name__

    # healthy partition still reads back
    spark.createDataFrame(
        [("https://h.example/a",)], "canonical string"
    ).write.mode("overwrite").parquet(str(part))
    own = _own_canonicals(spark, str(out), key)
    assert [r["canonical"] for r in own.collect()] == [
        "https://h.example/a"
    ]


def test_crawl_stream_rank_priority_two_waves(spark, tmp_path):
    """The discover→rank→prioritize loop as library calls (round-12):
    wave 1 crawls a 4-page cycle that also links four /x targets;
    crawl_wave_ranks (scope='seen') ranks pages AND not-yet-fetched
    targets over out/links; wave 2 fetches two /x pages with
    ranks= supplied, and its out/discovered rows carry via (the
    discovering page) and priority == that page's rank from the
    supplied frame — nonzero because this wave's pages were last
    wave's link targets. via is recorded even without ranks (wave 1)."""
    from da_transform_judgments_pipeline_spark.streaming.crawl_stream import (
        crawl_wave_ranks,
    )

    warcs = tmp_path / "warcs"
    warcs.mkdir()
    manifests = tmp_path / "manifests"
    manifests.mkdir()
    out = tmp_path / "out"
    table = "crawl_stream_priority_frontier"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    frontier.build_url_index(
        spark.createDataFrame([("https://r.example/seed",)], "url string"),
        table, buckets=2, path=str(tmp_path / "fidx"),
    )
    n = 4
    pages = []
    for i in range(n):
        html = (
            f"<html><body><p>page {i} body</p>"
            f'<a href="/p/{(i + 1) % n}">n</a>'
            f'<a href="/p/{(i - 1) % n}">p</a>'
            f'<a href="/x/{i}">x</a>'
            f'<a href="/x/{i}">x2</a></body></html>'
        ).encode()
        pages.append(
            {"url": f"https://r.example/p/{i}",
             "date": "2021-03-04T05:06:07Z", "payload": html}
        )
    (warcs / "w1.warc.gz").write_bytes(build_warc_gz(pages))
    (manifests / "m1.jsonl").write_text(json.dumps(
        {"file_id": 1, "path": str(warcs / "w1.warc.gz")}) + "\n")
    q = run_crawl_stream(spark, str(manifests), table, str(out))
    q.awaitTermination(120)

    d1 = _read(spark, out / "discovered").collect()
    assert {r["canonical"]: r["via"] for r in d1} == {
        f"https://r.example/x/{i}": f"https://r.example/p/{i}"
        for i in range(n)
    }
    assert "priority" not in _read(spark, out / "discovered").columns

    st: dict = {}
    ranks = crawl_wave_ranks(
        spark, str(out), damping=0.5, n_iterations=3, tol=None,
        stats=st,
    ).localCheckpoint(eager=True)
    assert st["iterations"] == 3
    rank_of = {r["node"]: r["rank"] for r in ranks.collect()}
    # scope='seen': the unfetched /x targets are ranked (dangling
    # receivers), the fetched /p pages too
    for i in range(n):
        assert rank_of[f"https://r.example/x/{i}"] > 0
        assert rank_of[f"https://r.example/p/{i}"] > 0

    wave2 = [
        {"url": f"https://r.example/x/{i}",
         "date": "2021-03-04T05:06:07Z",
         "payload": (f"<html><body><p>x {i} body</p>"
                     f'<a href="/y/{i}">y</a></body></html>').encode()}
        for i in range(2)
    ]
    (warcs / "w2.warc.gz").write_bytes(build_warc_gz(wave2))
    (manifests / "m2.jsonl").write_text(json.dumps(
        {"file_id": 2, "path": str(warcs / "w2.warc.gz")}) + "\n")
    q = run_crawl_stream(
        spark, str(manifests), table, str(out), ranks=ranks
    )
    q.awaitTermination(120)

    disc = (
        spark.read.option("mergeSchema", "true")
        .parquet(str(out / "discovered"))
        .collect()
    )
    w2 = {r["canonical"]: r for r in disc
          if r["batch_key"].endswith("-1")}
    assert set(w2) == {f"https://r.example/y/{i}" for i in range(2)}
    for i in range(2):
        row = w2[f"https://r.example/y/{i}"]
        assert row["via"] == f"https://r.example/x/{i}"
        assert row["priority"] == rank_of[f"https://r.example/x/{i}"]
        assert row["priority"] > 0
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_crawl_stream_priority_ordered_politeness(spark, tmp_path):
    """With BOTH rules and ranks supplied, the politeness schedule
    assigns each host's slots in PRIORITY order (slot 0 = the
    highest-rank discovery, offset = slot x Crawl-delay) — the
    prioritizer and politeness halves composed. Two pages on one host
    discover one URL each; the page with more in-links ranks higher,
    so its discovery takes slot 0 even though its URL sorts LAST
    alphabetically (pinning that priority, not the URL string, drives
    the order)."""
    from da_transform_judgments_pipeline_spark.operators.robots import (
        robots_rules,
    )
    from da_transform_judgments_pipeline_spark.streaming.crawl_stream import (
        crawl_wave_ranks,
    )

    warcs = tmp_path / "warcs"
    warcs.mkdir()
    manifests = tmp_path / "manifests"
    manifests.mkdir()
    out = tmp_path / "out"
    table = "crawl_stream_prio_polite_frontier"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    frontier.build_url_index(
        spark.createDataFrame([("https://q.example/seed",)], "url string"),
        table, buckets=2, path=str(tmp_path / "fidx"),
    )
    rules = robots_rules(
        spark.createDataFrame(
            [("q.example", "User-agent: *\nCrawl-delay: 3\n")],
            "host string, content string",
        ),
        agent="graftbot",
    ).localCheckpoint(eager=True)
    # wave 1: /popular is linked by three pages, /obscure by none —
    # after ranking, rank(/popular) >> rank(/obscure)
    w1 = [
        {"url": f"https://q.example/src{i}",
         "date": "2021-03-04T05:06:07Z",
         "payload": (f"<html><body><p>source {i} page</p>"
                     '<a href="/popular">p</a></body></html>').encode()}
        for i in range(3)
    ] + [
        {"url": "https://q.example/obscure",
         "date": "2021-03-04T05:06:07Z",
         "payload": (b"<html><body><p>obscure page</p>"
                     b'<a href="/src0">s</a></body></html>')},
    ]
    (warcs / "w1.warc.gz").write_bytes(build_warc_gz(w1))
    (manifests / "m1.jsonl").write_text(json.dumps(
        {"file_id": 1, "path": str(warcs / "w1.warc.gz")}) + "\n")
    q = run_crawl_stream(spark, str(manifests), table, str(out),
                         rules=rules)
    q.awaitTermination(120)
    ranks = crawl_wave_ranks(
        spark, str(out), damping=0.5, n_iterations=4, tol=None
    ).localCheckpoint(eager=True)
    rank_of = {r["node"]: r["rank"] for r in ranks.collect()}
    assert rank_of["https://q.example/popular"] > rank_of[
        "https://q.example/obscure"
    ]

    # wave 2: /popular (URL sorts after /another...) and /a-first are
    # both discovered by NEW pages; /a-first's via is unranked
    w2 = [
        {"url": "https://q.example/popular",
         "date": "2021-03-04T05:06:07Z",
         "payload": (b"<html><body><p>popular body</p>"
                     b'<a href="/zz-target">z</a></body></html>')},
        {"url": "https://q.example/newpage",
         "date": "2021-03-04T05:06:07Z",
         "payload": (b"<html><body><p>new page body</p>"
                     b'<a href="/aa-target">a</a></body></html>')},
    ]
    (warcs / "w2.warc.gz").write_bytes(build_warc_gz(w2))
    (manifests / "m2.jsonl").write_text(json.dumps(
        {"file_id": 2, "path": str(warcs / "w2.warc.gz")}) + "\n")
    q = run_crawl_stream(spark, str(manifests), table, str(out),
                         rules=rules, ranks=ranks)
    q.awaitTermination(120)

    disc = (
        spark.read.option("mergeSchema", "true")
        .parquet(str(out / "discovered")).collect()
    )
    w2rows = {r["canonical"]: r for r in disc
              if r["batch_key"].endswith("-1")}
    zz = w2rows["https://q.example/zz-target"]   # via /popular (ranked)
    aa = w2rows["https://q.example/aa-target"]   # via /newpage (unranked)
    assert zz["priority"] == rank_of["https://q.example/popular"]
    assert aa["priority"] == 0.0
    # priority beats URL order: zz-target sorts LAST but fetches FIRST
    assert (zz["slot"], zz["offset_sec"]) == (0, 0.0)
    assert (aa["slot"], aa["offset_sec"]) == (1, 3.0)
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_crawl_stream_recrawl_ttl_refreshes_stale_pages(spark, tmp_path):
    """r14 recrawl: with recrawl_ttl_sec set, a page whose indexed
    fetch stamp is older than (batch clock - ttl) is re-accepted when
    its refetch arrives — and its canonical re-enters the discovery
    queue — while a fresh page still routes url_seen. The refetch
    appends a newer-stamped index row (no rewrite)."""
    warcs = tmp_path / "warcs"
    warcs.mkdir()
    manifests = tmp_path / "manifests"
    manifests.mkdir()
    out = tmp_path / "out"
    table = "crawl_stream_recrawl_frontier"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    frontier.build_url_index(
        spark.createDataFrame([("https://h.example/seed",)], "url string"),
        table, buckets=2, path=str(tmp_path / "fidx"),
    )
    ttl = 7 * 24 * 3600  # one week

    def wave(n, entries):
        blob = build_warc_gz([
            {"url": u, "date": d, "payload": _html(b)}
            for u, d, b in entries
        ])
        (warcs / f"f{n}.warc.gz").write_bytes(blob)
        (manifests / f"w{n}.jsonl").write_text(json.dumps(
            {"file_id": n, "path": str(warcs / f"f{n}.warc.gz")}) + "\n")
        q = run_crawl_stream(
            spark, str(manifests), table, str(out),
            recrawl_ttl_sec=ttl,
        )
        q.awaitTermination(120)

    # wave 1: two pages fetched on 2021-03-04
    wave(1, [
        ("https://h.example/stale", "2021-03-04T05:06:07Z", "v1 body"),
        ("https://h.example/fresh", "2021-03-04T05:06:07Z", "f1 body"),
    ])
    acc1 = sorted(r["canonical"]
                  for r in _read(spark, out / "accepted").collect())
    assert acc1 == ["https://h.example/fresh", "https://h.example/stale"]

    # wave 2, a month later: /stale is re-served (older than the TTL
    # against the new batch clock) and /fresh is re-served too — but
    # the batch also carries a SAME-DAY fetch of /fresh, so… simplest:
    # both wave-1 stamps are now > ttl old, /stale refetch arrives,
    # /fresh does not. /stale re-accepts; a brand-new page queues its
    # links; nothing routes url_seen spuriously.
    wave(2, [
        ("https://h.example/stale", "2021-04-10T05:06:07Z", "v2 body"),
        ("https://h.example/new", "2021-04-10T05:06:07Z", "n body"),
    ])
    acc2 = [(r["canonical"], r["text"], r["batch_key"])
            for r in _read(spark, out / "accepted").collect()]
    stale_rows = sorted(t for c, t, _ in acc2
                        if c == "https://h.example/stale")
    assert stale_rows == ["v1 body", "v2 body"]  # both versions kept
    # the index accreted a newer stamp instead of rewriting
    idx = sorted(
        (r["canonical"], r["fetched_at"])
        for r in spark.table(table).collect()
        if r["canonical"] == "https://h.example/stale"
    )
    assert len(idx) == 2 and idx[0][1] < idx[1][1]

    # wave 3, same day as wave 2: /stale re-served again — now FRESH
    # (stamped a moment ago), so it routes url_seen, not accepted
    wave(3, [
        ("https://h.example/stale", "2021-04-10T06:00:00Z", "v3 body"),
    ])
    acc3 = sorted(t for c, t, _ in
                  ((r["canonical"], r["text"], r["batch_key"])
                   for r in _read(spark, out / "accepted").collect())
                  if c == "https://h.example/stale")
    assert acc3 == ["v1 body", "v2 body"]  # v3 did NOT re-accept
    dups = [(r["canonical"], r["reason"])
            for r in _read(spark, out / "duplicates").collect()]
    assert ("https://h.example/stale", "url_seen") in dups
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_read_seen_rejects_unknown_kind(spark, tmp_path):
    """read_seen validates the kind BEFORE touching storage, so a typo
    gets the descriptive error rather than a missing-path analysis
    failure."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown seen kind"):
        read_seen(spark, str(tmp_path / "nowhere"), "redirects")


def test_read_manifest_files_task_read_parity(spark, tmp_path):
    """The task-side manifest read (r14-opt) returns exactly the
    (file_id, content) rows the old binaryFile scan produced: one row
    per manifest entry, bytes identical to the on-disk file, file: and
    plain spellings both accepted, and parallelism = min(n_files,
    defaultParallelism) partitions."""
    from da_transform_judgments_pipeline_spark.streaming.crawl_stream import (
        _read_manifest_files,
    )

    blobs = {}
    entries = []
    for i in range(5):
        p = tmp_path / f"f{i}.warc.gz"
        blobs[i] = _warc(p, [(f"https://t.example/{i}", f"body {i}")])
        entries.append({
            "file_id": i,
            # exercise both the plain and the file:-scheme spellings
            "path": f"file://{p}" if i % 2 else str(p),
        })
    out = _read_manifest_files(spark, entries)
    assert out.rdd.getNumPartitions() == min(
        5, spark.sparkContext.defaultParallelism
    )
    got = {int(r["file_id"]): bytes(r["content"]) for r in out.collect()}
    assert set(got) == set(range(5))
    for i in range(5):
        with open(tmp_path / f"f{i}.warc.gz", "rb") as fh:
            assert got[i] == fh.read()
