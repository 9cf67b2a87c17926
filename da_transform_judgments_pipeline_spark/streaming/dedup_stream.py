"""Streaming ingestion dedup: every micro-batch of documents is checked
against the persisted corpus MinHash index and then ADDED to it.

The streaming twin of operators.dedup's incremental path: readStream →
foreachBatch { flag near-dups vs index, append clean docs + their
signatures }. State lives in the bucketed index tables, not in Spark
streaming state — so the stream restarts cheaply (checkpoint only tracks
source offsets), the index is queryable mid-stream by any other job, and
state size is bounded by the corpus, not the watermark.

Scale notes: per micro-batch work = shingle/sign the BATCH only (the
corpus scan was paid at index build); both index joins land on bucketed
tables with no corpus-side Exchange. Appends go through the same bucketed
writer, so bucket co-location survives growth. At 100 TB the index tables
are just two more tables in the lake — compaction/retention is ordinary
table maintenance, not streaming-state surgery.
"""

from __future__ import annotations

import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    _bands_sql,
    _hp_frame,
    _sig_sql,
    incremental_near_duplicates,
)
from ..operators.scale import write_bucketed


def _fs_delete(spark: SparkSession, path: str) -> None:
    """Recursive delete through the Hadoop FileSystem API (works on any
    supported filesystem, object stores included — no POSIX assumed)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(hpath, True)


def _table_buckets(spark: SparkSession, table: str) -> int | None:
    for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
        if r.col_name == "Num Buckets":
            return int(r.data_type)
    return None


def append_to_minhash_index(
    batch: DataFrame,
    table_prefix: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    buckets: int | None = None,
) -> None:
    """Add a batch's band keys + hash sets to an existing index
    (build_minhash_index created it). The bucket count is read from the
    existing table's catalog entry by default — an append with a different
    spec is rejected by Spark, so detection keeps the no-corpus-Exchange
    join plans intact without the caller re-stating build parameters."""
    if buckets is None:
        buckets = _table_buckets(
            batch.sparkSession, f"{table_prefix}_bands"
        ) or 32
    rows = k // bands
    hp = _hp_frame(batch, id_col, text_col, n)
    # replay re-guard (the d06 rule the frontier/substring appends
    # already follow): ids already indexed are skipped, so a crashed
    # batch's re-append cannot double the band/hash rows — duplicate hp
    # rows would multiply later batches' verify joins
    hp = hp.join(
        batch.sparkSession.table(f"{table_prefix}_hp").select("id"),
        "id", "left_anti",
    )
    banded = hp.withColumn("sig", F.expr(_sig_sql("hp", k))).select(
        "id",
        F.explode(F.expr(_bands_sql("sig", bands, rows))).alias("band"),
    )
    write_bucketed(
        banded, f"{table_prefix}_bands", "band", buckets=buckets,
        mode="append",
    )
    write_bucketed(hp, f"{table_prefix}_hp", "id", buckets=buckets,
                   mode="append")
    # invalidate the writing session's cached file listing; sessions that
    # READ the index (e.g. the outer session driving foreachBatch — each
    # micro-batch runs in a cloned session with its own relation cache)
    # must refresh too, or their next lookup reuses a stale FileIndex that
    # predates this append. run_dedup_stream does this.
    for t in (f"{table_prefix}_bands", f"{table_prefix}_hp"):
        batch.sparkSession.catalog.refreshTable(t)


def compact_index_table(spark: SparkSession, table: str) -> dict:
    """Index-lifecycle maintenance for the bucketed index tables: every
    :func:`append_to_minhash_index` adds one-or-more files per bucket, so
    after N micro-batches each bucket directory holds ~N small files and
    every lookup pays N× the file-open cost. Rewrite the table to ~one
    file per bucket WITHOUT changing its bucketing contract — the
    no-corpus-Exchange join plans (the whole point of the bucketed index)
    must survive compaction, which the pytest asserts via
    scale.exchange_count.

    Bucket count, bucket column, sortedness, and external location are
    read from the catalog, never re-stated by the caller. Write-first,
    swap-last: the compacted copy is fully written (and row-count
    verified) into a ``{table}_compacting`` staging table — at a FRESH
    sibling location for external tables — while the live table and its
    files stay untouched and readable. Only then does the swap happen:
    ``DROP TABLE`` + ``ALTER TABLE … RENAME`` (two catalog operations),
    and the old external location is deleted LAST, when it is already
    garbage. If a crash lands inside the two-op swap window, the data
    still exists in the ``_compacting`` staging table (and, for external
    tables, also at the old location) — recovery is one statement:
    ``ALTER TABLE {table}_compacting RENAME TO {table}``. Spark's
    bucketed writer emits one file per (task, bucket) pair, and the
    hash-repartition on the bucket column puts each bucket in exactly
    one task — hence ~one file per bucket after.

    Returns {files_before, files_after, rows, location}; ``location`` is
    the table's (new, ``_compact_<hex>``-suffixed) external location, or
    None for managed tables. External readers go through the table name,
    so the location drift is invisible to them.
    """
    desc = {
        r.col_name: r.data_type
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    }
    buckets = int(desc["Num Buckets"])
    key = desc["Bucket Columns"].strip("[]`").strip("`")
    sort = bool(desc.get("Sort Columns", "[]").strip("[]"))
    ext_path = (
        desc.get("Location")
        if desc.get("Type", "").strip().upper() == "EXTERNAL"
        else None
    )
    src = spark.table(table)
    files_before = len(src.inputFiles())
    rows = src.count()

    # Pin the bucketed SCAN on for the rewrite: the planner removes the
    # repartition-on-bucket-key as redundant against the table's bucketing
    # spec, but autoBucketedScan (on by default) would simultaneously
    # disable the bucketed read for this no-join query — leaving NEITHER
    # a shuffle NOR bucket-aligned partitions, so every task would write
    # every bucket (task×bucket small files, the opposite of compaction).
    # With the scan pinned bucketed, partitions == buckets and each task
    # streams one bucket into exactly one file, no Exchange at all.
    conf_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    saved = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "false")
    try:
        tmp = f"{table}_compacting"
        # a leftover staging table from a crashed previous run: DROP on an
        # external table keeps its files, so capture and delete its
        # location too — otherwise every crash orphans a full compacted
        # copy on disk forever
        if spark.catalog.tableExists(tmp):
            stale = {
                r.col_name: r.data_type
                for r in spark.sql(
                    f"DESCRIBE TABLE EXTENDED {tmp}"
                ).collect()
            }
            stale_loc = (
                stale.get("Location")
                if stale.get("Type", "").strip().upper() == "EXTERNAL"
                else None
            )
            spark.sql(f"DROP TABLE {tmp}")
            if stale_loc:
                _fs_delete(spark, stale_loc)
        # compacted copy FIRST, to a fresh location for external tables —
        # the live table and its data files stay intact and readable until
        # the copy is fully written and verified. The suffix is appended
        # to the STABLE base (any prior _compact_<hex> suffixes stripped),
        # so repeated compactions never grow the path unboundedly.
        new_path = None
        if ext_path:
            base = re.sub(
                r"(_compact_[0-9a-f]{8})+$", "", ext_path.rstrip("/")
            )
            new_path = base + "_compact_" + uuid.uuid4().hex[:8]
        write_bucketed(
            spark.table(table).repartition(buckets, F.col(key)), tmp, key,
            buckets=buckets, sort=sort, mode="overwrite", path=new_path,
        )
        if spark.table(tmp).count() != rows:
            spark.sql(f"DROP TABLE IF EXISTS {tmp}")
            if new_path:
                _fs_delete(spark, new_path)
            raise ValueError(
                "compaction row-count mismatch; table left intact"
            )
        # swap LAST: two catalog operations. A crash between them leaves
        # the name unbound, but the staging table (and the old external
        # files) still hold the data — recovery is
        # `ALTER TABLE {tmp} RENAME TO {table}`.
        spark.sql(f"DROP TABLE {table}")
        spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")
        if ext_path:
            # old location's files are garbage now (renamed external
            # tables keep the new location) — delete through the Hadoop
            # FS API (object-store-safe)
            _fs_delete(spark, ext_path)
        spark.catalog.refreshTable(table)
        files_after = len(spark.table(table).inputFiles())
    finally:
        if saved is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, saved)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "rows": rows,
        "location": new_path,
    }


def compact_minhash_index(spark: SparkSession, table_prefix: str) -> dict:
    """Compact both halves of a MinHash index
    (``{prefix}_bands`` + ``{prefix}_hp``) — see
    :func:`compact_index_table`. Returns per-table stats."""
    return {
        t: compact_index_table(spark, f"{table_prefix}_{t}")
        for t in ("bands", "hp")
    }


def run_dedup_stream(
    spark: SparkSession,
    source_dir: str,
    table_prefix: str,
    out_dir: str,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
    schema: str = "doc_id LONG, text STRING",
    max_files_per_trigger: int = 10,
    once: bool = True,
):
    """readStream over a document drop-dir; each micro-batch is
    near-dup-checked against the index, flagged pairs land in
    ``{out_dir}/duplicates``, clean (non-duplicate) docs land in
    ``{out_dir}/accepted`` AND join the index so later batches dedup
    against them. Exactly the reference's trigger shape
    (maxFilesPerTrigger mirrors the ≤10-records SQS batch,
    orchestrator.py) applied to corpus ingestion.

    Exactly-once in EVERY crash window (the crawl_stream posture):
    sinks are batch_key-partitioned with dynamic-partition overwrite (a
    replay REPLACES the crashed attempt's rows), decisions exclude the
    batch's OWN ids from the index view (a crash after the index append
    cannot flip batch docs into duplicates of their own index rows on
    replay), and the index append re-guards by id."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(source_dir)
    )
    from .orchestrator import batch_key, write_batch_partition

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        key = batch_key(f"{out_dir}/_checkpoint", batch_id)
        batch = batch.filter(F.col(id_col).isNotNull()).persist()
        try:
            dups = incremental_near_duplicates(
                batch, spark, table_prefix, threshold=threshold,
                id_col=id_col, text_col=text_col,
                exclude_ids=batch.select(id_col),
            )
            dup_ids = dups.select(
                F.col("id_new").alias(id_col)
            ).distinct()
            write_batch_partition(dups, f"{out_dir}/duplicates", key)
            clean = batch.join(dup_ids, id_col, "left_anti")
            write_batch_partition(clean, f"{out_dir}/accepted", key)
            append_to_minhash_index(
                clean, table_prefix, id_col=id_col, text_col=text_col
            )
            # the index joins above read the tables through the OUTER
            # session — refresh its relation cache so the next micro-batch
            # sees this batch's appended files (the wrapped micro-batch
            # session's own refresh does not cross sessions)
            for t in (f"{table_prefix}_bands", f"{table_prefix}_hp"):
                spark.catalog.refreshTable(t)
        finally:
            batch.unpersist()

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", f"{out_dir}/_checkpoint"
    )
    if once:
        return writer.trigger(availableNow=True).start()
    return writer.start()


def run_semantic_stream(
    spark: SparkSession,
    source_dir: str,
    table: str,
    out_dir: str,
    centroids: list[list[float]],
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    schema: str = "vec_id LONG, embedding ARRAY<DOUBLE>",
    max_files_per_trigger: int = 10,
    once: bool = True,
    max_cluster_size: int | None = None,
    n_anchors: int = 32,
):
    """The SEMANTIC twin of :func:`run_dedup_stream` — streaming
    SemDeDup over an embeddings drop-dir against the persisted
    cluster-bucketed index (clustering.build_semantic_index): each
    micro-batch's pruning decisions land in ``{out_dir}/pruned`` (one
    row per batch vector: id, cluster, kept, pruned_by), kept vectors
    in ``{out_dir}/accepted``, and the WHOLE batch — kept and pruned —
    joins the index (cosine is not transitive; a kept-only index would
    drift decisions, see build_semantic_index). The centroid model is
    frozen (driver-held bytes) for the stream's lifetime, exactly like
    production SemDeDup ingestion.

    State lives in the bucketed index table, not in streaming state:
    restarts are cheap (checkpoint = source offsets), a replayed
    micro-batch is harmless (decisions exclude the batch's own indexed
    ids; the append is id-idempotent), the index stays queryable
    mid-stream, and small-file growth is ordinary table maintenance —
    compact_index_table works unchanged on the semantic index (it is
    just another bucketed table)."""
    from ..operators.clustering import (
        append_to_semantic_index,
        semantic_dedup_incremental,
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(source_dir)
    )

    from .orchestrator import batch_key, write_batch_partition

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        # exactly-once in every crash window: decisions replay
        # identically (semantic_dedup_incremental excludes the batch's
        # own ids from the corpus side, append_to_semantic_index drops
        # already-indexed ids), and the sinks REPLACE the batch's own
        # partition on replay instead of re-appending.
        key = batch_key(f"{out_dir}/_checkpoint", batch_id)
        batch = batch.filter(F.col(id_col).isNotNull()).persist()
        decisions = None
        try:
            decisions = semantic_dedup_incremental(
                batch, spark, table, centroids, threshold=threshold,
                id_col=id_col, vec_col=vec_col,
                max_cluster_size=max_cluster_size, n_anchors=n_anchors,
            ).persist()
            write_batch_partition(
                decisions.filter(~F.col("kept")), f"{out_dir}/pruned", key
            )
            kept_ids = decisions.filter(F.col("kept")).select(id_col)
            write_batch_partition(
                batch.join(kept_ids, id_col), f"{out_dir}/accepted", key
            )
            append_to_semantic_index(
                batch, table, centroids, id_col=id_col, vec_col=vec_col
            )
            # the index reads above go through the OUTER session —
            # refresh its relation cache so the next micro-batch sees
            # this batch's appended files
            spark.catalog.refreshTable(table)
        finally:
            if decisions is not None:
                decisions.unpersist()
            batch.unpersist()

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", f"{out_dir}/_checkpoint"
    )
    if once:
        return writer.trigger(availableNow=True).start()
    return writer.start()
