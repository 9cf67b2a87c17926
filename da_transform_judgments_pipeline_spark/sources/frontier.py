"""Incremental crawl FRONTIER: a persisted seen-URL index and the
per-batch "which of these are new" decision — the discovery half of a
crawler (robots.py is the politeness half, warc.py the fetch-result
half). The d06/d11/e14 incremental-index lifecycle applied to URLs:

- URLs canonicalize first (:func:`..functions.strings.canonical_url` —
  RFC 3986 §6), so `HTTP://Host:80/a/../b` and `http://host/b` collide
  BEFORE the index is consulted;
- the index holds one row per distinct canonical URL, bucketed on it,
  so each batch's anti-join plans with ZERO index-side Exchange (the
  batch shuffles; the 100 TB side never does — plan-gated in pytest);
- batches dedup internally before the index join (a crawl batch
  re-discovers the same link many times): keep-lowest min-struct over
  ``(*order_cols, url)`` — pass e.g. ``order_cols=("batch_id", "pos")``
  to keep the first discovery in arrival order, or omit it to keep the
  lexicographically-smallest URL string per canonical;
- append + compaction reuse the dedup_stream lifecycle (crash-safe
  write-first/swap-last, bucket layout preserved).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.strings import canonical_url


def _canon(df: DataFrame, url_col: str) -> DataFrame:
    return df.withColumn("canonical", canonical_url(F.col(url_col)))


def build_url_index(
    df: DataFrame,
    table: str,
    url_col: str = "url",
    buckets: int = 32,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize the seen-URL set once: one row per DISTINCT canonical
    URL, bucketed on it. State is the frontier's honest minimum (every
    crawler keeps exactly this set); the full-history scan is paid here
    and amortized over every later batch."""
    from ..operators.scale import write_bucketed

    seen = _canon(df, url_col).select("canonical").distinct()
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
    attach that page's rank to the queue row. Append the result's
    canonicals via :func:`append_to_url_index` after a successful
    fetch wave."""
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
    return firsts.join(index, "canonical", "left_anti")


def append_to_url_index(
    spark: SparkSession,
    new_urls: DataFrame,
    table: str,
    buckets: int | None = None,
) -> None:
    """Append freshly-fetched canonicals to the index, preserving the
    bucket layout (bucket count read from the catalog, the
    append_to_substring_index pattern) so later batches' zero-Exchange
    anti-join plans survive appends. An anti-join re-guard keeps the
    table one-row-per-canonical even if a caller replays an append (the
    d06 replay-safety rule)."""
    if buckets is None:
        from ..streaming.dedup_stream import _table_buckets

        buckets = _table_buckets(spark, table) or 32
    from ..operators.scale import write_bucketed

    fresh = (
        new_urls.select("canonical")
        .distinct()
        .join(spark.table(table), "canonical", "left_anti")
    )
    write_bucketed(fresh, table, "canonical", buckets=buckets, mode="append")
    spark.catalog.refreshTable(table)
