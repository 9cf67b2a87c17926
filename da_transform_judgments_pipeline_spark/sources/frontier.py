"""Incremental crawl FRONTIER: a persisted seen-URL index and the
per-batch "which of these are new" decision — the discovery half of a
crawler (robots.py is the politeness half, warc.py the fetch-result
half). The d06/d11/e14 incremental-index lifecycle applied to URLs:

- URLs canonicalize first (:func:`..functions.strings.canonical_url` —
  RFC 3986 §6), so `HTTP://Host:80/a/../b` and `http://host/b` collide
  BEFORE the index is consulted;
- the index holds (canonical, fetched_at) rows bucketed on the
  canonical, so each batch's anti-join plans with ZERO index-side
  Exchange (the batch shuffles; the 100 TB side never does —
  plan-gated in pytest);
- batches dedup internally before the index join (a crawl batch
  re-discovers the same link many times): keep-lowest min-struct over
  ``(*order_cols, url)`` — pass e.g. ``order_cols=("batch_id", "pos")``
  to keep the first discovery in arrival order, or omit it to keep the
  lexicographically-smallest URL string per canonical;
- RECRAWL (r14): rows carry an optional ``fetched_at`` epoch-seconds
  stamp. With ``refetch_before`` the frontier decision suppresses only
  canonicals with a FRESH enough fetch on record — a stale page
  re-enters the queue, which is what lets a long-running crawl refresh
  a corpus instead of freezing it at first fetch. Refetches APPEND a
  newer-stamped row (the index stays append-only — no in-place update
  at 100 TB); suppression reads "any row fresh enough", so no
  aggregation is needed on the decision path. Rows with a NULL stamp
  (seeds, legacy appends) never expire — the pre-r14 behavior, and the
  conservative default for timestamp-less callers;
- append + compaction reuse the dedup_stream lifecycle (crash-safe
  write-first/swap-last, bucket layout preserved).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.strings import canonical_url


def _canon(df: DataFrame, url_col: str) -> DataFrame:
    # string form → the memoized key Column (strings._KEY_CACHE): the
    # stream rebuilds this per micro-batch, ~200 ms of py4j each
    return df.withColumn("canonical", canonical_url(url_col))


def build_url_index(
    df: DataFrame,
    table: str,
    url_col: str = "url",
    buckets: int = 32,
    path: str | None = None,
    mode: str = "overwrite",
    fetched_at_col: str | None = None,
) -> None:
    """Materialize the seen-URL set once: one row per DISTINCT canonical
    URL, bucketed on it. State is the frontier's honest minimum (every
    crawler keeps exactly this set); the full-history scan is paid here
    and amortized over every later batch. With ``fetched_at_col`` the
    named column (epoch seconds, castable to long) stamps each row —
    the max per canonical wins; without it rows carry a NULL stamp and
    never expire."""
    from ..operators.scale import write_bucketed

    canon = _canon(df, url_col)
    if fetched_at_col is not None:
        seen = canon.groupBy("canonical").agg(
            F.max(F.col(fetched_at_col).cast("long")).alias("fetched_at")
        )
    else:
        seen = (
            canon.select("canonical")
            .distinct()
            .withColumn("fetched_at", F.lit(None).cast("long"))
        )
    write_bucketed(
        seen, table, "canonical", buckets=buckets, mode=mode, path=path
    )


def new_frontier_urls(
    batch: DataFrame,
    spark: SparkSession,
    table: str,
    url_col: str = "url",
    order_cols: tuple = (),
    keep_cols: tuple = (),
    refetch_before: int | None = None,
) -> DataFrame:
    """The per-batch frontier decision: canonicalize, keep ONE
    representative per canonical within the batch (a min-struct over
    ``(*order_cols, url)`` — no sort), then anti-join the persisted
    index. With ``order_cols=("batch_id", "pos")`` the representative
    is the first discovery in arrival order; with the default empty
    tuple it is the lexicographically-smallest URL string. Returns the
    batch rows that are genuinely new, with their ``canonical`` column.
    ``keep_cols``: extra payload columns carried THROUGH the dedup on
    the surviving representative row (appended to the min-struct after
    the ordering fields, so they ride along without changing which row
    wins) — e.g. the discovering page's canonical, so a prioritizer can
    attach that page's rank to the queue row.

    ``refetch_before`` (r14, epoch seconds): the recrawl/TTL policy.
    Only index rows with ``fetched_at`` NULL (never expires) or ``>=
    refetch_before`` suppress a URL — a canonical whose every stamp is
    older is STALE and re-enters the queue. The filter is map-side on
    the bucketed scan, so the zero-index-side-Exchange plan survives.
    Append the result's canonicals via :func:`append_to_url_index`
    after a successful fetch wave."""
    canon = _canon(batch, url_col)
    key = F.struct(
        *[F.col(c).alias(f"o{i}") for i, c in enumerate(order_cols)],
        F.col(url_col).alias("u"),
        *[F.col(c).alias(f"k{i}") for i, c in enumerate(keep_cols)],
    )
    firsts = (
        canon.groupBy("canonical")
        .agg(F.min(key).alias("first"))
        .select(
            "canonical",
            F.col("first.u").alias(url_col),
            *[
                F.col(f"first.k{i}").alias(c)
                for i, c in enumerate(keep_cols)
            ],
        )
    )
    index = spark.table(table)
    if refetch_before is not None:
        index = index.filter(
            F.col("fetched_at").isNull()
            | (F.col("fetched_at") >= F.lit(int(refetch_before)))
        )
    return firsts.join(index, "canonical", "left_anti")


#: the sitemap ``<changefreq>`` vocabulary mapped to TTL seconds (the
#: public sitemaps.org hint semantics); ``never`` means "archived —
#: do not re-fetch" and drops the page from the recrawl queue.
CHANGEFREQ_TTL_SEC = {
    "always": 0,
    "hourly": 3600,
    "daily": 86400,
    "weekly": 604800,
    "monthly": 2592000,
    "yearly": 31536000,
}


def recrawl_queue(
    spark: SparkSession,
    table: str,
    now: int,
    default_ttl_sec: int,
    changefreq: DataFrame | None = None,
) -> DataFrame:
    """The SCHEDULING half of recrawl (r14; :func:`new_frontier_urls`
    ``refetch_before`` is the admission half): scan the stamped index
    and emit the pages DUE for a refresh, stalest first — the queue a
    re-fetch wave executes.

    Per canonical the NEWEST ``fetched_at`` stamp wins (refetches
    append rows; see :func:`append_to_url_index`); staleness is
    ``now - last_fetched_at`` and a page is due when staleness exceeds
    its TTL. With ``changefreq`` (a ``(canonical, changefreq[,
    lastmod])`` frame — e.g. the sitemap ``<changefreq>``/``<lastmod>``
    hints surfaced by ``sources.sitemap.sitemap_entries``) per-page
    TTLs come from :data:`CHANGEFREQ_TTL_SEC`; ``never`` pages drop
    out entirely, unknown values fall back to ``default_ttl_sec``; and
    when the frame carries a ``lastmod`` column (epoch seconds,
    castable to long), a publisher-declared modification NEWER than
    the page's last fetch makes it due IMMEDIATELY, TTL regardless —
    the highest-precision recrawl signal the web actually publishes
    (``never`` still wins over lastmod: an archived page stays out).
    NULL-stamped rows (seeds, pre-r14 appends) never re-queue —
    consistent with the decision path's never-expires reading.

    Scale shape: the aggregation groups on the table's bucket column,
    so the 100 TB index side plans with zero Exchange (plan-gated in
    pytest); the optional changefreq join is keyed on the same column,
    and the output is the (small) due set only."""
    idx = (
        spark.table(table)
        .filter(F.col("fetched_at").isNotNull())
        .groupBy("canonical")
        .agg(F.max("fetched_at").alias("last_fetched_at"))
    )
    modified = F.lit(False)
    if changefreq is not None:
        hint_cols = ["canonical", "changefreq"] + (
            ["lastmod"] if "lastmod" in changefreq.columns else []
        )
        idx = idx.join(
            changefreq.select(*hint_cols)
            .dropDuplicates(["canonical"]),
            "canonical", "left",
        )
        cf = F.lower(F.col("changefreq"))
        ttl = F.coalesce(
            *[
                F.when(cf == name, F.lit(int(sec)))
                for name, sec in CHANGEFREQ_TTL_SEC.items()
            ],
            F.lit(int(default_ttl_sec)),
        )
        idx = idx.filter(
            cf.isNull() | (cf != "never")
        ).withColumn("_ttl", ttl)
        if "lastmod" in hint_cols:
            modified = F.coalesce(
                F.col("lastmod").cast("long")
                > F.col("last_fetched_at"),
                F.lit(False),
            )
    else:
        idx = idx.withColumn("_ttl", F.lit(int(default_ttl_sec)))
    return (
        idx.withColumn(
            "staleness_sec",
            F.lit(int(now)) - F.col("last_fetched_at"),
        )
        .withColumn("_mod", modified)
        .filter(
            (F.col("staleness_sec") > F.col("_ttl")) | F.col("_mod")
        )
        .select(
            "canonical", "last_fetched_at", "staleness_sec",
            F.col("_mod").alias("modified"),
        )
        .orderBy(F.desc("staleness_sec"), "canonical")
    )


def append_to_url_index(
    spark: SparkSession,
    new_urls: DataFrame,
    table: str,
    buckets: int | None = None,
    fetched_at_col: str | None = None,
) -> None:
    """Append freshly-fetched canonicals to the index, preserving the
    bucket layout (bucket count read from the catalog, the
    append_to_substring_index pattern) so later batches' zero-Exchange
    anti-join plans survive appends.

    Without ``fetched_at_col`` (the pre-r14 contract): an anti-join
    re-guard keeps the table one-row-per-canonical even if a caller
    replays an append (the d06 replay-safety rule) — rows land with a
    NULL stamp and never expire. With ``fetched_at_col`` (epoch
    seconds): a refetch appends a NEW row only when its stamp is
    STRICTLY newer than the canonical's newest stored stamp, so a
    replayed append (same stamp) is still dropped, while a genuine
    recrawl accretes its newer stamp without rewriting history. A
    canonical first recorded WITHOUT a stamp stays stamp-less (it
    never expires, so a later stamp would be unreachable anyway). The
    guard aggregation groups on the table's bucket column — no
    index-side Exchange."""
    if buckets is None:
        from ..streaming.dedup_stream import _table_buckets

        buckets = _table_buckets(spark, table) or 32
    from ..operators.scale import write_bucketed

    if fetched_at_col is None:
        fresh = (
            new_urls.select("canonical")
            .distinct()
            .join(spark.table(table), "canonical", "left_anti")
            .withColumn("fetched_at", F.lit(None).cast("long"))
        )
    else:
        incoming = new_urls.groupBy("canonical").agg(
            F.max(F.col(fetched_at_col).cast("long")).alias("fetched_at")
        )
        # r15-opt (guide §2.3 — aggregate less): the guard only needs
        # the newest stored stamp FOR THE BATCH'S OWN canonicals, and
        # the left join below drops every other key anyway — semi-join
        # the index scan down to the (batch-sized, broadcastable)
        # incoming set BEFORE aggregating, so per-batch work tracks the
        # batch instead of aggregating the whole 100 TB index. Rows and
        # stamps are identical; the agg still groups on the bucket
        # column (no index-side Exchange — plan-gated in pytest).
        prev = (
            spark.table(table)
            .join(
                F.broadcast(incoming.select("canonical")),
                "canonical", "left_semi",
            )
            .groupBy("canonical").agg(
                F.max("fetched_at").alias("_prev"),
                F.lit(True).alias("_present"),
            )
        )
        fresh = (
            incoming.join(prev, "canonical", "left")
            .filter(
                F.col("_present").isNull()
                | F.coalesce(
                    F.col("fetched_at") > F.col("_prev"), F.lit(False)
                )
            )
            .select("canonical", "fetched_at")
        )
    write_bucketed(fresh, table, "canonical", buckets=buckets, mode="append")
    spark.catalog.refreshTable(table)
