"""Streaming CRAWL INTAKE: the arriving-WARC-driven front end of the
crawl layer — the x29 batch chain (warc_records → html_text →
quality/language → fingerprint) run incrementally per micro-batch, with
the URL frontier appended as pages land.

The reference's whole intake is event-driven (its SQS trigger fans ≤10
records out per batch, tre_sqs_sf_trigger.py:186-207); a production
crawl is likewise ARRIVING-file-driven, not re-scan-driven. Spark has
no ``binaryFile`` readStream, so the stream is a WARC **manifest**: a
drop-dir of JSON lines ``{"file_id": N, "path": "..."}`` naming each
landed .warc.gz. Structured Streaming tracks manifest offsets (the
cheap, checkpointable part); each micro-batch SIDE-LOADS the named
files' bytes through an ordinary ``binaryFile`` batch read — bytes are
never stream state.

Exactly-once posture (the orchestrator's T10 machinery applied to
files):

- the idempotency key is the WARC file path. A processed-path LEDGER
  (``{out_dir}/processed``, the run_pipeline ledger shape) is
  anti-joined first (:func:`..streaming.orchestrator.replay_guard`), so
  a duplicate manifest resend — or a whole replayed micro-batch after a
  crash in the post-ledger window (``on_batch_complete``, where the
  chaos test injects) — re-processes NOTHING: zero duplicate corpus
  rows, zero duplicate frontier rows.
- the frontier append is idempotent by construction
  (append_to_url_index re-guards with an anti-join), so a crash in the
  mid-batch window (sinks written, ledger not) cannot duplicate INDEX
  rows either; the parquet sinks remain at-least-once of the SAME
  decisions in that window — the standard foreachBatch sink contract,
  same as run_dedup_stream/run_pipeline.

Scale shape: per micro-batch the DRIVER touches only the manifest rows
(≤ ``max_files_per_trigger`` paths — a control-plane list, collected
deliberately); record parsing, extraction, language/quality scoring and
the fingerprint stay in the same distributed operators the batch
pipeline uses, and the frontier anti-join keeps its zero-index-side-
Exchange plan (sources/frontier.py). State lives in the bucketed index
table + the ledger, not in streaming state: restarts are checkpoint
offsets only.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.strings import canonical_url
from ..operators import text
from ..sources.frontier import append_to_url_index, new_frontier_urls
from ..sources.warc import warc_records
from .orchestrator import _processed_keys, replay_guard

MANIFEST_SCHEMA = "file_id LONG, path STRING"

#: columns of {out_dir}/accepted and /duplicates (duplicates adds reason)
CRAWL_DOC_COLUMNS = [
    "file_id", "pos", "target_uri", "canonical", "digest_ok",
    "detected_lang", "n_tokens", "quality_keep", "fp", "text",
]


def _extract_docs(files: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(file_id, content) → (docs, errors): the x29 chain — WARC record
    parse (report mode), HTTP responses only, Catalyst HTML tag-strip,
    cp1252 mojibake repair (x34 — a no-op on clean text, so it composes
    with zero semantic cost and rescues double-encoded crawls before
    the language/quality signals see them), language-ID, Gopher quality
    signals, md5 content fingerprint, RFC 3986 canonical URL."""
    recs = warc_records(files, on_error="report")
    errors = recs.filter(F.col("error").isNotNull()).select(
        "file_id", "error"
    )
    responses = recs.filter(
        (F.col("error").isNull()) & (F.col("warc_type") == "response")
    )
    extracted = responses.select(
        "file_id",
        "pos",
        "target_uri",
        "digest_ok",
        "http_status",
        "location",
        # link extraction reads the RAW markup (html_text strips tags);
        # hrefs resolve against the page URL, unresolvable forms → null
        F.filter(
            F.transform(
                text.html_links(F.col("payload").cast("string")),
                lambda h: text.resolve_link(F.col("target_uri"), h),
            ),
            lambda u: u.isNotNull(),
        ).alias("links"),
        text.html_text(F.col("payload").cast("string")).alias("_raw"),
    )
    extracted = (
        text.fix_mojibake(extracted, text_col="_raw", out_col="text")
        .drop("_raw", "chars_recovered", "had_mojibake")
    )
    langed = text.language_id(extracted).select(
        "file_id", "pos", "detected_lang"
    )
    quality = text.quality_filter(extracted).select(
        "file_id", "pos", "n_tokens",
        F.col("keep").alias("quality_keep"),
    )
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    docs = (
        extracted
        .join(langed, ["file_id", "pos"])
        .join(quality, ["file_id", "pos"])
        .withColumn("fp", F.md5(norm))
        .withColumn("canonical", canonical_url(F.col("target_uri")))
    )
    return docs, errors


def _norm_path(col):
    """Strip the URI scheme a binaryFile scan prepends (file:/a, file:///a
    → /a) so manifest paths and scan paths join."""
    return F.regexp_replace(col, r"^[a-zA-Z][a-zA-Z0-9+.\-]*:/{0,2}(/)", "$1")


def run_crawl_stream(
    spark: SparkSession,
    manifest_dir: str,
    frontier_table: str,
    out_dir: str,
    max_files_per_trigger: int = 10,
    once: bool = True,
    on_batch_complete: Callable[[int], None] | None = None,
    rules: DataFrame | None = None,
):
    """readStream over a WARC-manifest drop-dir; per micro-batch:
    replay-guard the file list against the processed ledger, side-load
    the fresh files' bytes, run the crawl chain, route rows —

    - genuinely new pages (canonical URL unseen by the frontier index
      and first in-batch) → ``{out_dir}/accepted``;
    - re-crawls (canonical already indexed: ``url_seen``) and in-batch
      re-discoveries (``in_batch_dup``) → ``{out_dir}/duplicates`` with
      a ``reason`` column;
    - with ``rules`` (a :func:`..operators.robots.robots_rules` frame —
      the per-host policy broadcast), pages whose URL the host's
      robots.txt disallows → ``{out_dir}/disallowed`` BEFORE the
      frontier decision, and they never enter the index (a policy
      change can make them fetchable later);
    - 3xx responses carrying a Location header → ``{out_dir}/redirects``
      (their own canonical IS marked fetched in the index), and their
      targets PLUS every page's extracted+resolved ``<a href>`` links
      — frontier-deduped against the just-appended index but NOT
      indexed themselves, since the index records fetched URLs —
      → ``{out_dir}/discovered``, the fetch queue for the next wave;
    - malformed/bomb-bounded files → ``{out_dir}/errors`` (one row per
      file, the report-mode contract);

    then append the accepted canonicals to the frontier index
    (idempotent), append the file paths to the ledger LAST, and fire
    ``on_batch_complete(batch_id)`` — the worst-case crash window the
    chaos test exercises. Returns the StreamingQuery.

    The ledger shares run_pipeline's layout, so
    :func:`.orchestrator.compact_processed_ledger` is the maintenance
    path when thousands of batches have accumulated small files."""
    stream = (
        spark.readStream.schema(MANIFEST_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(manifest_dir)
    )

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        manifest = (
            batch.filter(F.col("path").isNotNull())
            .withColumn("exec_name", F.col("path"))
            .dropDuplicates(["path"])  # duplicate resends in one batch
        )
        fresh = replay_guard(manifest, _processed_keys(spark, out_dir))
        # the manifest IS control-plane: ≤ max_files_per_trigger paths
        # per micro-batch — this collect is a file list, never data
        entries = fresh.select("file_id", "path").collect()
        if entries:
            scan = (
                spark.read.format("binaryFile")
                .load([e["path"] for e in entries])
                .select(
                    _norm_path(F.col("path")).alias("_p"), "content"
                )
            )
            ids = spark.createDataFrame(
                [(e["file_id"], e["path"]) for e in entries],
                "file_id long, _mp string",
            ).select("file_id", _norm_path(F.col("_mp")).alias("_p"))
            files = scan.join(F.broadcast(ids), "_p").select(
                "file_id", "content"
            )
            docs, errors = _extract_docs(files)
            errors.write.mode("append").parquet(f"{out_dir}/errors")
            if rules is not None:
                from ..operators.robots import robots_filter

                flagged = robots_filter(docs, rules, url_col="target_uri")
                flagged.filter(~F.col("allowed")).select(
                    *CRAWL_DOC_COLUMNS
                ).write.mode("append").parquet(f"{out_dir}/disallowed")
                docs = flagged.filter(F.col("allowed")).drop("allowed")

            me = F.struct(F.col("file_id"), F.col("pos"))
            first = F.min(me).over(Window.partitionBy("canonical"))
            is_redir = (
                F.col("http_status").isin(301, 302, 303, 307, 308)
                & F.col("location").isNotNull()
            )
            docs = (
                docs.withColumn("_first", first)
                .withColumn("_redir", is_redir)
                .persist()
            )
            try:
                survivors = docs.filter(me == F.col("_first"))
                index = spark.table(frontier_table)
                fresh_docs = survivors.join(index, "canonical", "left_anti")
                # a 3xx fetch is a SEEN url (it joins the index below)
                # but not a corpus document: its row lands in
                # out/redirects and its Location target becomes a
                # frontier DISCOVERY for the next fetch wave
                accepted = fresh_docs.filter(~F.col("_redir")).select(
                    *CRAWL_DOC_COLUMNS
                )
                redirects = fresh_docs.filter(F.col("_redir")).select(
                    "file_id", "pos", "target_uri", "canonical",
                    "http_status", "location",
                )
                dup_in_batch = docs.filter(me != F.col("_first")).select(
                    *CRAWL_DOC_COLUMNS, F.lit("in_batch_dup").alias("reason")
                )
                dup_seen = survivors.join(
                    index.select("canonical"), "canonical", "left_semi"
                ).select(*CRAWL_DOC_COLUMNS, F.lit("url_seen").alias("reason"))
                accepted.write.mode("append").parquet(f"{out_dir}/accepted")
                redirects.write.mode("append").parquet(
                    f"{out_dir}/redirects"
                )
                dup_in_batch.union(dup_seen).write.mode("append").parquet(
                    f"{out_dir}/duplicates"
                )
                # discovered = redirect targets + extracted page links
                # not yet fetched: index anti-join + in-batch
                # min-struct dedup, MINUS canonicals fetched in this
                # very batch (the anti-join below — the index append
                # must stay AFTER this point or lazy re-evaluation of
                # fresh_docs would see its own appended rows and empty
                # itself). Discoveries are NOT appended to the index
                # (it records FETCHED urls), so a discovered page's own
                # WARC is still accepted when it arrives.
                # out/discovered is the dedup'd fetch queue.
                discovered = new_frontier_urls(
                    redirects.select(
                        F.col("file_id"), F.col("pos"),
                        F.col("location").alias("url"),
                    ).union(
                        fresh_docs.select(
                            "file_id", "pos",
                            F.explode("links").alias("url"),
                        )
                    ),
                    spark, frontier_table,
                    order_cols=("file_id", "pos"),
                ).join(
                    docs.select("canonical"), "canonical", "left_anti"
                )
                discovered.write.mode("append").parquet(
                    f"{out_dir}/discovered"
                )
                append_to_url_index(
                    spark,
                    fresh_docs.select("canonical"),
                    frontier_table,
                )
                spark.catalog.refreshTable(frontier_table)
            finally:
                docs.unpersist()
            # ledger LAST: every sink above is either idempotent (index)
            # or derived from decisions this ledger append finalizes
            fresh.select("exec_name").write.mode("append").parquet(
                f"{out_dir}/processed"
            )
        if on_batch_complete is not None:
            on_batch_complete(batch_id)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", f"{out_dir}/_checkpoint"
    )
    if once:
        return writer.trigger(availableNow=True).start()
    return writer.start()
