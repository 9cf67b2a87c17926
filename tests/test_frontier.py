"""Crawl-frontier lifecycle tests (sources/frontier)."""

import pytest


@pytest.fixture()
def warehouse(spark, tmp_path):
    return str(tmp_path / "urls")


def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_frontier_two_wave_lifecycle(spark, tmp_path):
    """Build → batch decision → append → next batch sees wave-1's
    URLs as seen; canonicalization collides messy respellings; batch-
    internal duplicates keep the min URL; a replayed append stays
    one-row-per-canonical."""
    from da_transform_judgments_pipeline_spark.sources import frontier

    table = "frontier_t1"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    frontier.build_url_index(
        _urls(spark, [
            "https://h.example/a",
            "HTTP://H.example:80/b#frag",  # canonicalizes to /b
        ]),
        table,
        buckets=4,
        path=str(tmp_path / "t1"),
    )
    wave1 = _urls(spark, [
        "https://h.example/x/../a",      # seen (dot segments)
        "https://h.example/c#1",
        "https://h.example/c#2",         # same canonical, #1 kept
        "https://h.example/d",
    ])
    new1 = frontier.new_frontier_urls(wave1, spark, table)
    got = {r["canonical"]: r["url"] for r in new1.collect()}
    assert set(got) == {"https://h.example/c", "https://h.example/d"}
    assert got["https://h.example/c"] == "https://h.example/c#1"
    frontier.append_to_url_index(spark, new1, table)
    # replayed append must not duplicate rows
    frontier.append_to_url_index(spark, new1, table)
    idx = spark.table(table)
    assert idx.count() == idx.select("canonical").distinct().count() == 4
    wave2 = _urls(spark, [
        "https://h.example/c",           # discovered in wave 1 → seen
        "https://h.example/e",
    ])
    new2 = frontier.new_frontier_urls(wave2, spark, table)
    assert [r["canonical"] for r in new2.collect()] == [
        "https://h.example/e"
    ]
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_frontier_order_cols_arrival_order(spark, tmp_path):
    """order_cols=('batch_id','pos') keeps the FIRST discovery in
    arrival order (not the lexicographically-smallest URL)."""
    from da_transform_judgments_pipeline_spark.sources import frontier

    table = "frontier_t3"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    frontier.build_url_index(
        _urls(spark, ["https://h.example/seen"]), table,
        buckets=2, path=str(tmp_path / "t3"),
    )
    batch = spark.createDataFrame(
        [
            (1, 0, "https://h.example/c#zz"),  # arrives first
            (1, 1, "https://h.example/c#aa"),  # lexicographically first
            (2, 0, "https://h.example/c#00"),
        ],
        "batch_id int, pos int, url string",
    )
    got = frontier.new_frontier_urls(
        batch, spark, table, order_cols=("batch_id", "pos")
    ).collect()
    assert len(got) == 1 and got[0]["url"] == "https://h.example/c#zz"
    # default: lexicographically-smallest URL string
    got2 = frontier.new_frontier_urls(batch, spark, table).collect()
    assert got2[0]["url"] == "https://h.example/c#00"
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_frontier_index_side_never_shuffles(spark, tmp_path):
    """The 100 TB contract: the persisted index (the corpus-scale side)
    joins with zero Exchange above its scan — only the batch shuffles.
    Gate: every Exchange in the anti-join plan sits on the batch
    subtree (none consume the index table scan)."""
    from da_transform_judgments_pipeline_spark.sources import frontier

    table = "frontier_t2"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    frontier.build_url_index(
        _urls(spark, [f"https://h.example/{i}" for i in range(50)]),
        table,
        buckets=4,
        path=str(tmp_path / "t2"),
    )
    batch = _urls(spark, [f"https://h.example/{i}#f" for i in range(60)])
    plan = (
        frontier.new_frontier_urls(batch, spark, table)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the index scan feeds the join directly: no Exchange between the
    # FileScan of the bucketed table and the SortMergeJoin/anti
    import re

    assert plan.count("Exchange") <= 2, plan  # batch agg + batch join side
    idx_scan = re.search(r"\n([^\n]*FileScan[^\n]*frontier_t2[^\n]*)", plan)
    assert idx_scan is not None, plan
    # bucketed scan reports its bucket layout (SelectedBucketsCount)
    assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan, plan
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_frontier_recrawl_ttl_and_stamp_replay_safety(spark, tmp_path):
    """r14 recrawl: a canonical whose newest fetched_at stamp is older
    than the refetch cutoff RE-ENTERS the queue; a fresh one doesn't;
    NULL-stamped rows never expire. The timestamp append is
    replay-safe (same stamp dropped, newer stamp accretes a new row)
    and the refetch-filtered anti-join keeps the zero-index-side-
    Exchange plan."""
    import re

    from da_transform_judgments_pipeline_spark.sources import frontier

    table = "frontier_ttl"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    seed = spark.createDataFrame(
        [
            ("https://h.example/stale", 1000),
            ("https://h.example/fresh", 5000),
            ("https://h.example/eternal", None),
        ],
        "url string, fa long",
    )
    frontier.build_url_index(
        seed, table, buckets=4, path=str(tmp_path / "ttl"),
        fetched_at_col="fa",
    )
    batch = _urls(spark, [
        "https://h.example/stale",    # stamp 1000 < 4000 → re-queue
        "https://h.example/fresh",    # stamp 5000 ≥ 4000 → suppressed
        "https://h.example/eternal",  # NULL stamp → never expires
        "https://h.example/new",      # unseen → queued
    ])
    # without a cutoff: pre-r14 behavior, only the unseen URL queues
    got0 = sorted(r["canonical"] for r in
                  frontier.new_frontier_urls(batch, spark, table)
                  .collect())
    assert got0 == ["https://h.example/new"]
    got = sorted(r["canonical"] for r in
                 frontier.new_frontier_urls(
                     batch, spark, table, refetch_before=4000
                 ).collect())
    assert got == ["https://h.example/new", "https://h.example/stale"]

    # wave 2: the stale page was refetched at t=6000 — its append
    # accretes a newer-stamped row; a REPLAY of the same append (the
    # crash-window contract) must not duplicate it
    refetched = spark.createDataFrame(
        [("https://h.example/stale", 6000),
         ("https://h.example/new", 6000)],
        "canonical string, fa long",
    )
    frontier.append_to_url_index(
        spark, refetched, table, fetched_at_col="fa"
    )
    frontier.append_to_url_index(  # replay: same stamps, no new rows
        spark, refetched, table, fetched_at_col="fa"
    )
    rows = {(r["canonical"], r["fetched_at"])
            for r in spark.table(table).collect()}
    assert ("https://h.example/stale", 1000) in rows
    assert ("https://h.example/stale", 6000) in rows
    assert ("https://h.example/new", 6000) in rows
    assert len([r for r in rows if r[0].endswith("/stale")]) == 2
    # the refreshed page is now suppressed at the same cutoff…
    got2 = sorted(r["canonical"] for r in
                  frontier.new_frontier_urls(
                      batch, spark, table, refetch_before=4000
                  ).collect())
    assert got2 == []
    # …until the clock passes its newest stamp — at cutoff 7000 every
    # stamped page (fresh@5000, new@6000, stale@6000) is stale again,
    # and only the NULL-stamped eternal row still suppresses
    got3 = sorted(r["canonical"] for r in
                  frontier.new_frontier_urls(
                      batch, spark, table, refetch_before=7000
                  ).collect())
    assert got3 == ["https://h.example/fresh", "https://h.example/new",
                    "https://h.example/stale"]

    # plan gate on the NEW schema + refetch filter: the index side
    # still joins with zero Exchange above its bucketed scan
    plan = (
        frontier.new_frontier_urls(
            batch, spark, table, refetch_before=4000
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") <= 2, plan
    idx_scan = re.search(r"\n([^\n]*FileScan[^\n]*frontier_ttl[^\n]*)",
                         plan)
    assert idx_scan is not None, plan
    assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan, plan
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_recrawl_queue_changefreq_and_plan(spark, tmp_path):
    """r14 scheduler: recrawl_queue reads max-stamp per canonical,
    applies changefreq-aware TTLs ('never' drops out, unknown values
    fall back to the default), orders stalest-first — and its
    index-side aggregation groups on the bucket column with ZERO
    Exchange above the bucketed scan (the 100 TB contract)."""
    import re

    from da_transform_judgments_pipeline_spark.sources import frontier

    table = "frontier_rcq"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    seed = spark.createDataFrame(
        [
            ("https://h.example/old", 1000),       # stale, default ttl
            ("https://h.example/older", 500),      # stalest
            ("https://h.example/fresh", 7500),     # within default ttl
            ("https://h.example/hourly", 4000),    # due only via hourly
            ("https://h.example/archived", 100),   # never -> excluded
            ("https://h.example/seedrow", None),   # NULL stamp: never
        ],
        "url string, fa long",
    )
    frontier.build_url_index(
        seed, table, buckets=4, path=str(tmp_path / "rcq"),
        fetched_at_col="fa",
    )
    # a refetch row: /old was re-fetched at 2000 -> max wins
    frontier.append_to_url_index(
        spark,
        spark.createDataFrame(
            [("https://h.example/old", 2000)], "canonical string, fa long"
        ),
        table, fetched_at_col="fa",
    )
    hints = spark.createDataFrame(
        [("https://h.example/archived", "never", None),
         ("https://h.example/hourly", "hourly", None),
         ("https://h.example/old", "quarterly", None),  # unknown->dflt
         # a <lastmod> NEWER than the last fetch: due IMMEDIATELY,
         # TTL regardless (/fresh is otherwise within its TTL)
         ("https://h.example/fresh", None, 7600)],
        "canonical string, changefreq string, lastmod long",
    )
    q = frontier.recrawl_queue(
        spark, table, now=8000, default_ttl_sec=3000, changefreq=hints
    )
    got = [(r["canonical"], r["last_fetched_at"], r["staleness_sec"],
            r["modified"])
           for r in q.collect()]
    # default ttl 3000: due iff last < 5000; hourly 3600: last < 4400
    assert got == [
        ("https://h.example/older", 500, 7500, False),
        ("https://h.example/old", 2000, 6000, False),  # max stamp won
        ("https://h.example/hourly", 4000, 4000, False),
        ("https://h.example/fresh", 7500, 500, True),  # lastmod wins
    ]
    # without hints: hourly page (4000 >= 5000? no -> due), archived
    # page re-enters, NULL row still excluded
    got2 = [r["canonical"] for r in frontier.recrawl_queue(
        spark, table, now=8000, default_ttl_sec=3000
    ).collect()]
    assert got2 == [
        "https://h.example/archived", "https://h.example/older",
        "https://h.example/old", "https://h.example/hourly",
    ]
    plan = (
        frontier.recrawl_queue(
            spark, table, now=8000, default_ttl_sec=3000
        )._jdf.queryExecution().executedPlan().toString()
    )
    idx_scan = re.search(r"FileScan[^\n]*frontier_rcq", plan)
    assert idx_scan is not None, plan
    # no Exchange between the bucketed scan and the max() aggregation
    # (the final orderBy's range Exchange sits on the tiny due set)
    assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan, plan
    agg_region = plan[plan.index("FileScan"):] if "FileScan" in plan else plan
    assert "Exchange hashpartitioning" not in agg_region, plan
    spark.sql(f"DROP TABLE IF EXISTS {table}")
