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
files' bytes task-side (one Arrow task per file up to the core count —
:func:`_read_manifest_files`) — bytes are never stream state and never
cross the driver or a shuffle.

Exactly-once posture (the orchestrator's T10 machinery applied to
files) — EVERY crash window replays to identical sink contents:

- the idempotency key is the WARC file path. The processed-path LEDGER
  (``{out_dir}/processed``) is batch_key-PARTITIONED (a lineage-
  qualified key — see orchestrator.batch_key) and each batch
  overwrites its own partition; the replay guard anti-joins the ledger
  MINUS the current batch's partition, so a crashed batch ALWAYS
  replays in full (even after a partial ledger write) while a
  cross-batch duplicate resend is still dropped.
- every sink (``accepted``/``seen``/``links``/``duplicates``/
  ``discovered``/``disallowed``/``errors``) is batch_key-partitioned and
  written with dynamic-partition OVERWRITE: a replay after a crash in
  the pre-ledger window REPLACES the batch's partition instead of
  re-appending — zero duplicate rows in any window, not just
  post-ledger.
- replay decisions are pinned to the ORIGINAL attempt's index view:
  before the frontier anti-joins, the batch's own previously-written
  ``accepted``/``seen`` partitions (if a crashed attempt left
  them) are subtracted from the index, so a crash AFTER the idempotent
  ``append_to_url_index`` cannot flip the batch's accepted rows into
  ``url_seen`` duplicates on replay.

The only atomicity assumed is parquet's per-job commit (files appear
at job commit, the standard FileOutputCommitter contract) — the same
assumption every foreachBatch file sink makes.

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

from concurrent.futures import ThreadPoolExecutor
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.strings import canonical_url
from ..operators import text
from ..sources.frontier import append_to_url_index, new_frontier_urls
from ..sources.warc import warc_records
from .orchestrator import (
    batch_key,
    ledger_other_batches as _ledger_other_batches,
    replay_guard,
    write_batch_partition as _write_batch_partition,
)

MANIFEST_SCHEMA = "file_id LONG, path STRING"

#: test seam — when set, called as ``hook(point, batch_id)`` at
#: "after_sinks" (corpus sinks written, ledger not), "after_ledger"
#: (ledger written, index not), and "after_index" (index appended,
#: checkpoint offset not committed). The chaos tests raise from each
#: point to prove every crash window replays to identical contents.
_chaos_hook = None


def _fire(point: str, batch_id: int) -> None:
    if _chaos_hook is not None:
        _chaos_hook(point, batch_id)

#: columns of {out_dir}/accepted and /duplicates (duplicates adds reason)
CRAWL_DOC_COLUMNS = [
    "file_id", "pos", "target_uri", "canonical", "digest_ok",
    "detected_lang", "n_tokens", "quality_keep", "fp", "text",
]

#: column order of the consolidated {out_dir}/seen sink (r14): the five
#: fetched-but-not-corpus families — redirects, sitemaps, revisits,
#: noindex, canonical variants — share ONE batch-partitioned sink with
#: a ``kind`` discriminator instead of one write job each. At bench
#: scale the fixed per-job cost of five thin sinks dominated a
#: micro-batch (BENCH_r13: s24/s26/s27/s29 regressed 20-45% on sink
#: fan-out); one union write restores one job, and at 100× data per
#: batch nothing changes — the rows were disjoint filters of the same
#: persisted frame either way. Columns not carried by a kind are NULL.
SEEN_COLUMNS = [
    "kind", "file_id", "pos", "target_uri", "canonical",
    "http_status", "location", "refers_to", "payload_digest",
    "robots_meta", "canon_target", "fp",
    "sitemap_kind", "n_entries", "error",
]

#: per-kind projections of {out_dir}/seen — the pre-r14 per-sink
#: schemas, which :func:`read_seen` reconstructs (``sitemap`` restores
#: its own ``kind`` column from ``sitemap_kind``)
SEEN_KINDS = {
    "redirect": [
        "file_id", "pos", "target_uri", "canonical", "http_status",
        "location",
    ],
    "sitemap": [
        "file_id", "pos", "target_uri", "canonical", "sitemap_kind",
        "n_entries", "error",
    ],
    "revisit": [
        "file_id", "pos", "target_uri", "canonical", "http_status",
        "refers_to", "payload_digest",
    ],
    "noindex": [
        "file_id", "pos", "target_uri", "canonical", "robots_meta",
    ],
    "canonical_variant": [
        "file_id", "pos", "target_uri", "canonical", "canon_target",
        "fp",
    ],
}


def read_seen(spark: SparkSession, out_dir: str, kind: str | None = None):
    """Read the consolidated seen-not-corpus sink. With ``kind`` (one
    of :data:`SEEN_KINDS`) the result is filtered to that family and
    projected to its pre-consolidation schema — the migration path for
    readers of the former ``{out_dir}/redirects``/``sitemaps``/
    ``revisits``/``noindex``/``canonical_variants`` directories."""
    if kind is not None and kind not in SEEN_KINDS:
        raise ValueError(
            f"unknown seen kind {kind!r}; expected one of "
            f"{sorted(SEEN_KINDS)}"
        )
    df = spark.read.parquet(f"{out_dir}/seen")
    if kind is None:
        return df
    out = df.filter(F.col("kind") == kind).select(
        *SEEN_KINDS[kind], "batch_key"
    )
    if kind == "sitemap":
        out = out.withColumnRenamed("sitemap_kind", "kind")
    return out


def _extract_docs(
    files: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(file_id, content) → (docs, errors, recs): the x29 chain — WARC
    record parse (report mode), HTTP responses only, Catalyst HTML
    tag-strip, cp1252 mojibake repair (x34 — a no-op on clean text, so
    it composes with zero semantic cost and rescues double-encoded
    crawls before the language/quality signals see them), language-ID,
    Gopher quality signals, md5 content fingerprint, RFC 3986
    canonical URL. ``recs`` is the PERSISTED parse output both returns
    derive from (r14): the errors sink and the docs cache fill used to
    each run the full WARC parse — the single most expensive stage of
    a batch — so the caller persists once and unpersists when the
    batch's sinks are written."""
    recs = warc_records(files, on_error="report").persist()
    errors = recs.filter(F.col("error").isNotNull()).select(
        "file_id", "error"
    )
    xp = _extract_exprs()
    # revisit records (the CC dedup convention, r13) ride the same
    # chain: their payload is EMPTY (the content lives in the record
    # named by refers_to / payload_digest), so the text stages are
    # no-ops on them; downstream routes them seen-not-corpus
    responses = recs.filter(
        (F.col("error").isNull())
        & (F.col("warc_type").isin("response", "revisit"))
    )
    # charset-correct intake (r13): the HTML5 prescan ladder (BOM >
    # Content-Type charset > <meta charset> > UTF-8) decodes the page
    # ONCE; links, directives, extraction, language and quality all
    # read the decoded string instead of a blind UTF-8 cast — a
    # Latin-1/cp1252/UTF-16 page stops mojibaking before dedup
    # fingerprints ever see it (fix_mojibake still rescues UNDECLARED
    # cp1252 downstream)
    responses = text.decode_payloads(
        responses, payload_col="payload", mime_col="mime",
        text_col="_page", charset_col="_charset",
    )
    # page-level exclusion protocol (r13): <meta name=robots> noindex
    # pages are fetched-but-not-corpus (routed like revisits below),
    # nofollow pages contribute NO links to discovery or the graph.
    # The extractor is STAGED as its own column (the stage-before-
    # reference rule): three inline references used to triple its
    # expression tree in the projection, a measurable slice of the
    # per-batch Catalyst analysis constant.
    responses = responses.withColumn("_meta", xp["meta"])
    # the cp1252 mojibake repair (x34 semantics, fix_mojibake's exact
    # replace chain) is INLINED into the projection (r14-opt §1): the
    # stream only keeps the repaired text, so staging `_raw` and then
    # dropping it plus the two audit columns cost three more full-tree
    # analyses per micro-batch for nothing — `_raw` is referenced
    # exactly once, so inlining duplicates no subtree
    extracted = responses.select(*xp["select_cols"])
    # language-ID and the Gopher quality rules are ROW-WISE transforms
    # (withColumn chains over the same frame), so they compose
    # linearly (r14): the old extracted⋈langed⋈quality self-joins
    # shuffled the batch twice per micro-batch AND tripled the
    # extraction chain's Catalyst tree in the plan — measured as the
    # dominant slice of the per-batch analysis constant. Chained,
    # there is ONE copy of the chain and zero joins; the explicit
    # select drops the per-language hit counts and per-rule audit
    # signals the helpers add.
    base_cols = extracted.columns
    enriched = text.quality_filter(
        text.language_id(extracted)
    ).select(
        *base_cols, "detected_lang", "n_tokens",
        F.col("keep").alias("quality_keep"),
    )
    docs = (
        enriched
        # rel=canonical honored SAME-HOST only (r13): a print/tracking
        # variant declaring its canonical collapses BEFORE content
        # fingerprints; a cross-host declaration is the classic
        # canonical-hijack spam vector and is ignored (the page stays
        # an ordinary corpus candidate). Two withColumns levels, not
        # four withColumn analyses (r14-opt §1): fp/canonical/
        # _canon_target are mutually independent; only _canon_dup
        # references them as columns.
        .withColumns({
            "fp": xp["fp"],
            "canonical": xp["canonical"],
            "_canon_target": xp["canon_target"],
        })
        .withColumns({"_canon_dup": xp["canon_dup"]})
    )
    return docs, errors, recs


def _mojibake_fixed(col):
    """fix_mojibake's exact replace chain (same pinned digraph table,
    longest forms first) as a bare Column over ``col`` — the
    expression form, for inlining the repair into the extraction
    projection (the audit columns are not kept in the stream)."""
    fixed = col
    for m, c in text.mojibake_table():
        fixed = F.replace(fixed, F.lit(m), F.lit(c))
    return fixed


#: built-once Column fragments of :func:`_extract_docs` (r14-opt): the
#: extraction tree is assembled from FIXED column names, and building
#: it through py4j measured ~1.6 s of driver time per micro-batch —
#: pure plan construction, identical every batch. Cached per process
#: alongside operators.text's own _PLAN_CACHE.
_EXTRACT_EXPRS: dict = {}


def _extract_exprs() -> dict:
    if _EXTRACT_EXPRS:
        return _EXTRACT_EXPRS
    from ..operators.robots import url_host

    # a response that IS a sitemap is a DISCOVERY DOCUMENT, not a
    # corpus page: its raw bytes ride along (only for these rows) so
    # process_batch can parse <loc> entries into the fetch queue.
    # Classification is CONTENT-first (warc.py surfaces the HTTP
    # Content-Type as ``mime``, and the payload head is sniffed for the
    # protocol's root elements), because the URL alone misroutes both
    # ways: an RSS/Atom feed at /feed.xml is a corpus page, and a real
    # sitemap served at /sitemap (no extension) is a sitemap. The
    # mime/URL tests survive as TIEBREAKS where the sniff is blind:
    # for gzip-transport payloads (head not sniffable without
    # inflating) an xml-family declared mime OR a sitemap-shaped URL
    # routes to discovery — but a GENERIC gzip mime alone does NOT
    # (r13, per r12 ADVICE: a fetched .tar.gz asset is an asset, not a
    # sitemap); for PLAIN payloads the tiebreak applies only when the
    # sniff is INCONCLUSIVE — no root element inside the window (long
    # DOCTYPE/comment preamble) — so declared XML at a sitemap-shaped
    # URL still routes to discovery (r13) while an RSS/Atom feed at
    # /feed.xml (root <rss>/<feed> visible) stays a corpus page.
    _head = F.substring(F.col("payload"), 1, 2048).cast("string")
    _sniff_sm = _head.rlike(
        r"<\s*(?:[A-Za-z0-9_.\-]+:)?(?:urlset|sitemapindex)[\s/>]"
    )
    # first ELEMENT in the window ('<' + letter — prolog '<?', comments
    # '<!--' and DOCTYPE '<!' never match); empty = inconclusive head
    _root = F.regexp_extract(
        _head, r"<\s*[A-Za-z][A-Za-z0-9_.\-:]*", 0
    )
    _gz = F.substring(F.col("payload"), 1, 2) == F.lit(b"\x1f\x8b")
    _mime = F.lower(F.coalesce(F.col("mime"), F.lit("")))
    _mime_xml = _mime.rlike(r"^(application|text)/xml\b")
    _url_sm = F.col("target_uri").rlike(r"\.xml(\.gz)?$")
    is_sm = (
        _sniff_sm
        | (_gz & (_mime_xml | _url_sm))
        | (~_gz & (_root == "") & _mime_xml & _url_sm)
    )
    # r14: the none-aware helpers — content="none" means noindex AND
    # nofollow per the robots-meta spec, and the extractor reads
    # legal unquoted content=noindex values (r13 verdict defect #1)
    _meta = F.col("_meta")
    _noindex = text.robots_noindex(_meta)
    _nofollow = text.robots_nofollow(_meta)
    select_cols = [
        F.col("file_id"),
        F.col("pos"),
        F.col("target_uri"),
        F.col("digest_ok"),
        F.col("http_status"),
        F.col("location"),
        # the fetch clock (r14 recrawl): the record's own WARC-Date as
        # epoch seconds — deterministic, and exactly what a frontier
        # freshness policy should key on (when the page was FETCHED,
        # not when the batch ran)
        F.unix_timestamp(F.to_timestamp(F.col("date"))).alias(
            "_fetched_at"
        ),
        (F.col("warc_type") == "revisit").alias("_revisit"),
        F.col("refers_to"),
        F.col("payload_digest"),
        _noindex.alias("_noindex"),
        _meta.alias("robots_meta"),
        # the publisher's own dedup declaration (r13): resolved +
        # canonicalized downstream; honored SAME-HOST only
        text.html_canonical_link(F.col("_page")).alias("_canon_href"),
        is_sm.alias("_sitemap"),
        F.when(is_sm, F.col("payload")).alias("_smblob"),
        # link extraction reads the RAW markup (html_text strips tags);
        # hrefs resolve against the page URL with the RFC 3986 §5.3
        # directory merge ON (path-relative and query-only hrefs are
        # the bulk of real-site navigation — dropping them would blind
        # discovery); dot segments are folded downstream by
        # canonical_url, and genuinely unresolvable forms
        # (fragment-only, mailto:, other schemes) → null → dropped
        F.when(
            _nofollow, F.array().cast("array<string>")
        ).otherwise(
            F.filter(
                F.transform(
                    text.html_links(F.col("_page")),
                    lambda h: text.resolve_link(
                        F.col("target_uri"), h, merge_relative=True
                    ),
                ),
                lambda u: u.isNotNull(),
            )
        ).alias("links"),
        _mojibake_fixed(text.html_text(F.col("_page"))).alias("text"),
    ]
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    canonical = canonical_url(F.col("target_uri"))
    canon_target = canonical_url(
        text.resolve_link(
            F.col("target_uri"), F.col("_canon_href"),
            merge_relative=True,
        )
    )
    _EXTRACT_EXPRS.update({
        "meta": text.html_meta_robots(F.col("_page")),
        "select_cols": select_cols,
        "fp": F.md5(norm),
        "canonical": canonical,
        "canon_target": canon_target,
        "canon_dup": F.coalesce(
            F.col("_canon_target").isNotNull()
            & (F.col("_canon_target") != F.col("canonical"))
            & (
                url_host(F.col("_canon_target"))
                == url_host(F.col("canonical"))
            ),
            F.lit(False),
        ),
        "links_dst": canonical_url(F.col("_u")),
    })
    return _EXTRACT_EXPRS


def _manifest_df(spark: SparkSession, rows) -> DataFrame:
    """``(file_id, path)`` rows as a pure-JVM local relation.

    r14-opt (guide §4 — eliminate the Python boundary): a
    ``spark.createDataFrame(rows, ...)`` leaf is a pickled Python RDD
    sliced over ``defaultParallelism`` partitions, so EVERY job that
    scans it launches that many Python worker tasks — measured
    0.4–0.6 s per action at local[32] for a ONE-ROW manifest (and the
    manifest subtree executes 2–3× per micro-batch: parse-cache fill,
    the opt-in CDX pass, the path map). A parameterized explode binds
    the same rows as array literals and stays entirely in the JVM —
    zero Python tasks, one partition."""
    if not rows:
        return spark.createDataFrame([], "file_id long, path string")
    # r15-opt (guide §5 — the driver is a shared resource): the former
    # parameterized ARRAY args crossed py4j one element at a time
    # (pyspark lowers a list arg to array(lit(x), ...)), measured
    # ~0.4-0.5 s of per-batch driver time at 385 manifest rows and
    # linear in the batch size. The rows now cross as ONE json string
    # parsed JVM-side by from_json — same values, same pure-JVM
    # one-partition relation, one py4j call.
    import json as _json

    return spark.sql(
        "SELECT s.file_id, s.path FROM (SELECT explode(from_json("
        ":j, 'array<struct<file_id: bigint, path: string>>')) AS s)",
        args={
            "j": _json.dumps(
                [{"file_id": int(fid), "path": p} for fid, p in rows]
            ),
        },
    )


def _read_manifest_files(spark: SparkSession, entries) -> DataFrame:
    """(file_id, path) manifest rows → (file_id, content): each TASK
    reads its own file's bytes directly from storage (local path or
    ``s3://`` via the fsio boto3 seam) inside the Arrow batch loop.

    r14-opt, guide §2.3/§8 (shuffle keys and metadata, move heavy
    bytes once) + §6 (small-file packing): the former ``binaryFile``
    scan charged each file only ``openCostInBytes`` (4 MB), so a
    micro-batch of small WARCs packed into a handful of scan
    partitions and the parse — the most expensive stage of a batch —
    ran nearly serial; it also re-listed every path on the driver each
    batch and needed a broadcast join to map scan paths back to
    manifest file_ids. Distributing the ≤``max_files_per_trigger``
    manifest ROWS round-robin over ``min(n_files,
    defaultParallelism)`` partitions gives the parse one task per file
    up to the core count at ANY scale (the same expression the
    pack-by-file stage uses), ships zero payload bytes through the
    driver or any shuffle, and keeps read failures task-side — a
    missing file still fails the batch exactly like a failed scan.
    Bomb bounds are unchanged: ``warc_records`` applies its
    per-file size check to these bytes as before.

    Paths on OTHER remote schemes (hdfs://, viewfs://, s3a://…) fall
    back to the pre-r14 ``binaryFile`` scan + broadcast id join: the
    Python workers have no JVM gateway, so only the Hadoop readers can
    serve those — the fallback keeps every scheme Spark supports
    readable at the cost of the scan's packing behavior."""
    rows = [(int(e["file_id"]), e["path"]) for e in entries]
    import re as _re_s

    def _task_readable(p: str) -> bool:
        m = _re_s.match(r"^([A-Za-z][A-Za-z0-9+.\-]*):", p)
        return m is None or m.group(1) in ("file", "s3")

    if not all(_task_readable(p) for _, p in rows):
        scan = (
            spark.read.format("binaryFile")
            .load([p for _, p in rows])
            .select(F.col("path").alias("_p"), "content")
        )
        ids = _manifest_df(spark, rows).withColumnRenamed("path", "_mp")
        norm = lambda c: F.regexp_replace(  # noqa: E731
            c, r"^[a-zA-Z][a-zA-Z0-9+.\-]*:/{0,2}(/)", "$1"
        )
        return (
            scan.withColumn("_p", norm(F.col("_p")))
            .join(
                F.broadcast(ids.select("file_id", norm(F.col("_mp")).alias("_p"))),
                "_p",
            )
            .select("file_id", "content")
        )
    n_slots = max(1, min(len(rows), spark.sparkContext.defaultParallelism))

    def _read(batches):
        import re as _re

        import pandas as pd

        from ..sources.fsio import _s3

        for pdf in batches:
            ids, blobs = [], []
            for fid, p in zip(pdf["file_id"], pdf["path"]):
                s3 = _s3(p)
                if s3 is not None:
                    client, bucket, key = s3
                    body = client.get_object(Bucket=bucket, Key=key)[
                        "Body"
                    ].read()
                else:
                    # strip a file:/ | file:/// scheme; plain paths pass
                    local = _re.sub(
                        r"^file:/{0,2}(/)", r"\1", p
                    )
                    with open(local, "rb") as fh:
                        body = fh.read()
                ids.append(fid)
                blobs.append(bytearray(body))
            yield pd.DataFrame({"file_id": ids, "content": blobs})

    return (
        _manifest_df(spark, rows)
        .repartition(n_slots)
        .mapInPandas(_read, "file_id long, content binary")
    )


def _own_canonicals(spark, out_dir: str, key: str):
    """Canonicals a CRASHED earlier attempt of this very batch already
    wrote to accepted/seen — the exact set append_to_url_index
    would have added. Subtracting them from the index view pins replay
    decisions to the original attempt's pre-append view, closing the
    crash-after-index-append window. Returns a localCheckpointed frame
    (detached from the files the replay is about to overwrite) or None
    when no earlier attempt exists (the happy path — a driver-side
    existence probe, no Spark job)."""
    from pyspark.errors import AnalysisException

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    conf = spark._jsc.hadoopConfiguration()
    found = []
    for sink in ("accepted", "seen"):
        # NO exception guard here: exists() returns False for a missing
        # path, so anything raised is a genuine FS/IO failure — it must
        # FAIL the batch (foreachBatch retries it) rather than silently
        # skip a partition and flip the replay's accepted/url_seen
        # decisions against the post-append index view
        p = f"{out_dir}/{sink}/batch_key={key}"
        if hpath(p).getFileSystem(conf).exists(hpath(p)):
            found.append(p)
    if not found:
        return None
    try:
        # per-path reads (the sinks have different schemas), unioned on
        # the one shared column
        df = None
        for p in found:
            part = spark.read.parquet(p).select("canonical")
            df = part if df is None else df.union(part)
        return df.distinct().localCheckpoint(eager=True)
    except AnalysisException:
        # the ONLY expected failure: partition dir exists but holds no
        # committed parquet (crash mid-write, pre-job-commit — schema
        # inference finds nothing to read), so nothing reached the
        # index either. Corrupt files or transient read IO raise other
        # types and propagate: the batch fails and replays.
        return None


def compact_cdx_surt(
    spark: SparkSession,
    out_dir: str,
    dest: str,
    target_file_mb: int = 256,
    mode: str = "error",
) -> int:
    """Periodic maintenance for the stream's opt-in CDX sink (r14):
    the per-batch ``{out_dir}/cdx`` partitions accrete in arrival
    order; this materializes them into the SURT-ordered random-access
    layout (:func:`..sources.warc.write_cdx_surt` — range-partitioned
    and file-sorted on the reversed-host key) at ``dest``, so "every
    record under example.com" prunes to a handful of files and each
    hit serves its record with one ranged GET
    (:func:`..sources.warc.fetch_warc_record`). Run it on the cadence
    of :func:`.orchestrator.compact_processed_ledger`; the stream
    keeps appending to ``{out_dir}/cdx`` untouched. Returns the file
    count written."""
    from ..sources.warc import write_cdx_surt

    cdx = spark.read.parquet(f"{out_dir}/cdx").drop("batch_key")
    return write_cdx_surt(
        cdx, dest, target_file_mb=target_file_mb, mode=mode
    )


def crawl_wave_graph(
    spark: SparkSession,
    out_dir: str,
    scope: str = "seen",
    reset: DataFrame | None = None,
):
    """Build the persisted PageRank setup :func:`crawl_wave_ranks`
    runs on — the weighted-edge collapse of ``{out_dir}/links``, the
    scope's node set, and the seeded/flagged base — ONCE, for sharing
    across chained calls via ``crawl_wave_ranks(graph=...)`` (r14-opt,
    guide §1.3): the prioritizer shape ranks the SAME accreted graph
    twice per wave (a cold leg then a warm-started leg), and
    rebuilding the collapse + node union + seed normalization per
    call is pure duplicate work — at crawl scale a full extra shuffle
    over the link graph. The weighted frame is persisted too (it is
    scanned by the node union, the edge fan and the degree aggregate —
    three executions of the links group-by otherwise). Values are
    bit-identical to the per-call build; the caller owns
    ``.release()`` after the last consuming call."""
    if scope not in ("seen", "crawled"):
        raise ValueError(
            f"scope must be 'seen' or 'crawled', got {scope!r}"
        )
    from ..operators.graph import pagerank_graph, weight_edges

    edges = spark.read.parquet(f"{out_dir}/links").select("src", "dst")
    w = weight_edges(edges).persist()
    if scope == "crawled":
        srcs = w.select(F.col("src").alias("node")).distinct()
        ew = w.join(
            srcs.select(F.col("node").alias("dst")), "dst", "left_semi"
        )
        nodes = srcs
    else:
        ew = w
        # the union's own distinct absorbs a staged srcs.distinct()
        # (set-identical, and the union aggregate dedups map-side
        # anyway) — the inner de-dup was one redundant Exchange per
        # call (r14-opt, guide §2.1)
        nodes = w.select(F.col("src").alias("node")).union(
            w.select(F.col("dst").alias("node"))
        ).distinct()
    g = pagerank_graph(
        nodes, ew, reset=reset, weight_col="weight",
        nodes_distinct=True,
    )
    g.adopt(w)
    return g


def crawl_wave_ranks(
    spark: SparkSession,
    out_dir: str,
    prev_ranks: DataFrame | None = None,
    scope: str = "seen",
    damping: float = 0.85,
    n_iterations: int = 20,
    tol: float | None = 1e-6,
    reset: DataFrame | None = None,
    stats: dict | None = None,
    graph=None,
) -> DataFrame:
    """The RANK half of the discover→rank→prioritize crawl loop
    (SKEWCHECK_r11's harness loop as a library call): read the stream's
    accreted link graph (``{out_dir}/links``), collapse anchor
    multiplicity into weighted edges, and PageRank it — warm-started
    from ``prev_ranks`` (the previous wave's output) so a grown graph
    converges in a fraction of the cold iteration count. Feed the
    result back to :func:`run_crawl_stream` ``ranks=`` and the next
    wave's ``out/discovered`` queue carries a ``priority`` column.

    ``scope='seen'`` (production default — the SKEWCHECK_r11 shape)
    ranks every canonical on either side of an edge: link TARGETS not
    yet fetched still receive rank through their in-links, which is
    what makes one-wave-behind prioritization work (this wave's pages
    were last wave's targets, so they already have ranks).
    ``scope='crawled'`` ranks the induced subgraph of FETCHED pages
    only (nodes = sources; edges restricted to targets in that set) —
    the corpus-quality view, where out-weights count only intra-corpus
    links. Returns (node, rank); pass it back as next wave's
    ``prev_ranks``.

    ``graph``: optional shared setup from :func:`crawl_wave_graph` —
    chained calls over the same wave's links (cold + warm-started)
    then pay the edge collapse/node union/seed build once; ``scope``
    and ``reset`` are encoded in it (passing ``reset`` alongside is a
    typed error), and the caller owns ``graph.release()``."""
    from ..operators.graph import pagerank

    own = graph is None
    if own:
        graph = crawl_wave_graph(spark, out_dir, scope=scope,
                                 reset=reset)
    elif reset is not None:
        raise ValueError(
            "crawl_wave_ranks(graph=...) encodes reset already — "
            "pass it to crawl_wave_graph instead"
        )
    try:
        return pagerank(
            n_iterations=n_iterations, damping=damping, tol=tol,
            initial_ranks=prev_ranks, stats=stats, graph=graph,
        )
    finally:
        if own:
            graph.release()


def run_crawl_stream(
    spark: SparkSession,
    manifest_dir: str,
    frontier_table: str,
    out_dir: str,
    max_files_per_trigger: int = 10,
    once: bool = True,
    on_batch_complete: Callable[[int], None] | None = None,
    rules: DataFrame | None = None,
    emit_cdx: bool = False,
    ranks: DataFrame | None = None,
    recrawl_ttl_sec: int | None = None,
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
    - every fetched-but-not-corpus response lands in the ONE
      consolidated ``{out_dir}/seen`` sink (r14 — one write job per
      batch where five thin sinks used to each launch their own; read
      back per-family via :func:`read_seen`), discriminated by
      ``kind``:
    - ``kind='redirect'``: 3xx responses carrying a Location header
      (their own canonical IS marked fetched in the index); fetched
      SITEMAP responses (classified by payload-head sniff for
      ``<urlset>``/``<sitemapindex>`` plus the HTTP ``mime``, with the
      ``.xml``/``.xml.gz`` URL test only as a gzip-transport tiebreak —
      an RSS feed at ``/feed.xml`` stays a corpus page) →
      ``kind='sitemap'`` (one summary row: sitemap_kind, n_entries,
      report-mode error), likewise indexed as fetched;
    - ``<meta name=robots>`` pages (r13): ``noindex`` responses —
      including the unquoted ``content=noindex`` spelling and the
      ``none`` shorthand (r14) — are fetched-but-not-corpus →
      ``kind='noindex'`` (URL indexed as fetched, page never enters
      accepted; its links still feed discovery and the link graph);
      ``nofollow`` (or ``none``) responses contribute NO links to any
      channel (emptied at extraction, so the graph sink and the fetch
      queue both honor it);
    - SAME-HOST ``rel=canonical`` variants (r13): a page declaring a
      different canonical URL on its own host is a publisher-declared
      duplicate → ``kind='canonical_variant'`` (seen-not-corpus, the
      row records the pointer + content fingerprint) and the
      canonical TARGET joins the discovery channels; cross-host
      declarations are ignored (the canonical-hijack spam vector) and
      the page stays an ordinary corpus candidate;
    - ``revisit`` records (the Common Crawl dedup convention, r13) →
      ``kind='revisit'`` — seen-not-corpus like redirects: the
      URL is marked fetched in the index (no re-queue next wave) and
      the row carries ``refers_to`` + ``payload_digest``, resolving
      WHERE the content lives instead of re-entering the corpus as an
      empty page;
    - the fetch queue ``{out_dir}/discovered`` unions FOUR discovery
      channels — redirect targets, every page's extracted+resolved
      ``<a href>`` links, each fetched sitemap's ``<loc>`` entries, and
      (with ``rules``) the hosts' robots ``Sitemap:`` advertisements —
      frontier-deduped against the index but NOT indexed themselves,
      since the index records fetched URLs. Every queue row carries
      ``via`` — the canonical of the response that discovered it (null
      for robots ads). With ``rules`` the queue also carries the
      POLITENESS schedule: per-host ``slot`` and ``offset_sec`` from
      the host's Crawl-delay (:func:`..operators.robots.fetch_schedule`),
      so a rate-limited fetcher can execute it directly. With ``ranks``
      (a (node, rank) frame — :func:`crawl_wave_ranks` over the link
      graph so far, one wave behind) it also carries ``priority``: the
      discovering page's rank, 0.0 when unranked — the PRIORITIZER
      half of the crawl loop (pass ranks consistently across waves, or
      the sink's partitions disagree on the priority column). With
      BOTH ``rules`` and ``ranks``, each host's polite slots are
      assigned in priority order — high-rank pages take the earliest
      fetch times;
    - the LINK GRAPH accretes in ``{out_dir}/links``: one (src, dst)
      canonical edge per extracted anchor of each newly-accepted page —
      the input :func:`..operators.graph.pagerank` / ``hits`` rank to
      prioritize the fetch queue;
    - malformed/bomb-bounded files → ``{out_dir}/errors`` (one row per
      file, the report-mode contract);

    Every sink is batch_key-partitioned and the batch's partition is
    written with dynamic-partition OVERWRITE; then the file paths
    overwrite the batch's ledger partition, then the accepted
    canonicals append to the frontier index (idempotent), then
    ``on_batch_complete(batch_id)`` fires. A crash ANYWHERE in that
    sequence replays to identical contents (see the module docstring's
    window-by-window argument); the chaos tests inject into each
    window via the ``_chaos_hook`` seam. Returns the StreamingQuery.

    RECRAWL (r14): every indexed canonical is stamped with its
    record's WARC-Date (epoch seconds) on append. With
    ``recrawl_ttl_sec`` set, each batch computes its clock as the
    newest WARC-Date it carries and treats canonicals whose newest
    stamp predates ``clock - ttl`` as STALE: an arriving refetch of a
    stale page is re-accepted (not ``url_seen``), its canonical can
    re-enter the discovery queue, and the refetch appends a
    newer-stamped row (append-only — the replay guard drops same-stamp
    replays, so every crash window still converges). Without the
    parameter behavior is exactly the pre-r14 fetch-once frontier.

    The ledger shares run_pipeline's layout, so
    :func:`.orchestrator.compact_processed_ledger` is the maintenance
    path when thousands of batches have accumulated small files."""
    stream = (
        spark.readStream.schema(MANIFEST_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(manifest_dir)
    )

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        key = batch_key(f"{out_dir}/_checkpoint", batch_id)
        manifest = (
            batch.filter(F.col("path").isNotNull())
            .withColumn("exec_name", F.col("path"))
            .dropDuplicates(["path"])  # duplicate resends in one batch
        )
        fresh = replay_guard(
            manifest, _ledger_other_batches(spark, out_dir, key)
        )
        # the manifest IS control-plane: ≤ max_files_per_trigger paths
        # per micro-batch — this collect is a file list, never data
        entries = fresh.select("file_id", "path").collect()
        if entries:
            files = _read_manifest_files(spark, entries)
            docs, errors, recs = _extract_docs(files)
            # Overlap independent per-batch jobs (r14-opt, guide §2.6:
            # Spark happily runs several jobs at once inside one
            # application; these were serialized only because the
            # driver called them sequentially). The errors sink — whose
            # action FILLS the shared parse cache — the opt-in CDX
            # parse, and the replay read-back are all independent of
            # the extraction checkpoint materialized below, so they run
            # on a small thread pool while the main thread materializes
            # the big chain; per-partition cache locks make the
            # concurrent fills compute the parse exactly once.
            pool = ThreadPoolExecutor(max_workers=6)
            fut_err = pool.submit(
                _write_batch_partition, errors, f"{out_dir}/errors", key
            )
            fut_cdx = None
            if emit_cdx:
                # the crawler maintains its own random-access index as
                # it ingests: one CDX row per record with the
                # compressed byte range inside the archive (+ the
                # archive path, so a ranged GET can serve any record
                # later).  Costs one extra parse pass per batch —
                # opt-in.  Same batch-partitioned idempotent sink as
                # every other output.
                from ..sources.warc import warc_cdx

                paths = _manifest_df(
                    spark, [(e["file_id"], e["path"]) for e in entries]
                ).withColumnRenamed("path", "warc_path")
                cdx = warc_cdx(files).join(
                    F.broadcast(paths), "file_id"
                )
                fut_cdx = pool.submit(
                    _write_batch_partition, cdx, f"{out_dir}/cdx", key
                )
            # the replay read-back is two parquet reads + a distinct —
            # an independent job, overlapped with the jobs above
            fut_own = pool.submit(_own_canonicals, spark, out_dir, key)
            if rules is not None:
                from ..operators.robots import robots_filter

                docs = robots_filter(docs, rules, url_col="target_uri")
            else:
                docs = docs.withColumn("allowed", F.lit(True))

            me = F.struct(F.col("file_id"), F.col("pos"))
            # first occurrence among ALLOWED rows only (min skips the
            # NULL branch) — identical to the old compute-after-the-
            # robots-filter ordering, but in the same plan as the
            # robots verdict, so the extraction chain is built ONCE
            # for both the disallowed sink and the corpus branches
            # (r14-opt: the disallowed write used to execute the full
            # chain a second time before the checkpoint existed)
            first = F.min(F.when(F.col("allowed"), me)).over(
                Window.partitionBy("canonical")
            )
            is_redir = (
                F.col("http_status").isin(301, 302, 303, 307, 308)
                & F.col("location").isNotNull()
            )
            try:
                # the decision view of the index: on a replay after a
                # crashed attempt already ran append_to_url_index,
                # subtract that attempt's own canonicals (read back
                # from its sink partitions) so accepted/url_seen
                # decisions replay IDENTICALLY
                index = spark.table(frontier_table)
                cutoff = None
                if recrawl_ttl_sec is not None:
                    # the batch clock: the newest WARC-Date among the
                    # batch's robots-allowed response/revisit records
                    # (a control-plane scalar; deterministic, so
                    # replays agree). Computed from the PERSISTED
                    # parse output rather than the extraction chain —
                    # same row set, same expression, but the agg
                    # never executes the chain (r14-opt). Pages whose
                    # newest index stamp predates (clock - ttl) are
                    # STALE: their arriving refetch is re-accepted
                    # instead of url_seen, and their canonical
                    # re-enters the discovery queue.
                    clk = recs.filter(
                        F.col("error").isNull()
                        & F.col("warc_type").isin("response", "revisit")
                    )
                    if rules is not None:
                        from ..operators.robots import robots_filter

                        clk = robots_filter(
                            clk, rules, url_col="target_uri"
                        ).filter(F.col("allowed"))
                    _now = clk.agg(
                        F.max(
                            F.unix_timestamp(F.to_timestamp(F.col("date")))
                        )
                    ).first()[0]
                    if _now is not None:
                        cutoff = int(_now) - int(recrawl_ttl_sec)
                        index = index.filter(
                            F.col("fetched_at").isNull()
                            | (F.col("fetched_at") >= F.lit(cutoff))
                        )
                own = fut_own.result()
                if own is not None:
                    index = index.join(own, "canonical", "left_anti")
                # ONE checkpoint materializes the whole per-batch
                # decision state (r14-opt, formerly docs + marked —
                # two jobs): the extraction chain, the robots verdict,
                # the first-occurrence window AND the index decision
                # join land in a single eager localCheckpoint. The
                # join keys on ``canonical`` — the window's own
                # partitioning — so it reuses that Exchange (guide
                # §2.4: two operations keyed the same way share one
                # exchange) instead of shuffling a second time, and
                # every sink branch below plans against a leaf
                # relation (the f06 shared-parse lesson; a bare
                # persist() would re-ANALYZE the thousands-of-nodes
                # chain above the cache for every one of the batch's
                # ~8 jobs). The index is scanned once here plus once
                # for the discovery queue's own decision.
                marked = (
                    docs.withColumns({"_first": first, "_redir": is_redir})
                    .join(
                        index.select(
                            "canonical", F.lit(True).alias("_seen")
                        ).dropDuplicates(["canonical"]),
                        "canonical", "left",
                    )
                    .localCheckpoint(eager=True)
                )
                fut_err.result()
                if fut_cdx is not None:
                    fut_cdx.result()
                docs_ok = marked.filter(F.col("allowed"))
                fresh_docs = docs_ok.filter(
                    (me == F.col("_first")) & F.col("_seen").isNull()
                ).drop("_seen")
                # a 3xx fetch is a SEEN url (it joins the index below)
                # but not a corpus document: its row lands in the seen
                # sink as kind='redirect' and its Location target
                # becomes a frontier DISCOVERY for the next fetch
                # wave; likewise a fetched SITEMAP is seen-but-not-
                # corpus (kind='sitemap') and its <loc> entries become
                # discoveries
                accepted = fresh_docs.filter(
                    ~F.col("_redir") & ~F.col("_sitemap")
                    & ~F.col("_revisit") & ~F.col("_noindex")
                    & ~F.col("_canon_dup")
                ).select(*CRAWL_DOC_COLUMNS)
                # same-host rel=canonical variants (r13): seen-not-
                # corpus — the page is a publisher-declared duplicate,
                # its row records the pointer, and the canonical
                # TARGET becomes a discovery so the real page gets
                # fetched (its own later WARC is still accepted)
                canon_variants = fresh_docs.filter(
                    F.col("_canon_dup") & ~F.col("_redir")
                    & ~F.col("_sitemap") & ~F.col("_revisit")
                    & ~F.col("_noindex")
                ).select(
                    "file_id", "pos", "target_uri", "canonical",
                    F.col("_canon_target").alias("canon_target"),
                    "fp",
                )
                # meta-robots noindex (r13): fetched-but-not-corpus —
                # the URL joins the index (no re-fetch loop) but the
                # page must NOT enter the corpus; its LINKS still feed
                # discovery unless nofollow emptied them upstream
                noindex_rows = fresh_docs.filter(
                    F.col("_noindex") & ~F.col("_redir")
                    & ~F.col("_sitemap") & ~F.col("_revisit")
                ).select(
                    "file_id", "pos", "target_uri", "canonical",
                    "robots_meta",
                )
                redirects = fresh_docs.filter(F.col("_redir")).select(
                    "file_id", "pos", "target_uri", "canonical",
                    "http_status", "location",
                )
                # revisit fetches are SEEN-not-corpus like redirects/
                # sitemaps (r13): the URL joins the index below (no
                # re-queue next wave) and the row records WHERE the
                # content lives — the referred record id + its payload
                # digest — instead of re-entering the corpus empty
                revisits = fresh_docs.filter(
                    F.col("_revisit") & ~F.col("_redir")
                ).select(
                    "file_id", "pos", "target_uri", "canonical",
                    "http_status", "refers_to", "payload_digest",
                )
                sm_rows = fresh_docs.filter(
                    F.col("_sitemap") & ~F.col("_redir")
                    & ~F.col("_revisit")
                ).select(
                    "file_id", "pos", "target_uri", "canonical", "_smblob"
                )
                # parse each fetched sitemap's entries (report mode —
                # a malformed sitemap isolates to one error row, never
                # fails the batch); sid packs (file_id, pos) so entries
                # join back to their response row for arrival ordering
                from ..sources.sitemap import sitemap_entries

                sm_src = sm_rows.withColumn(
                    "sid", F.col("file_id") * F.lit(1 << 20) + F.col("pos")
                )
                sm_parsed = sitemap_entries(
                    sm_src.select(
                        F.col("sid").alias("sitemap_id"),
                        F.col("_smblob").alias("content"),
                    )
                )
                # LEFT join from the response rows: a zero-entry (or
                # unparseable) sitemap still gets its summary row —
                # _own_canonicals replays depend on every fetched
                # sitemap canonical being on disk
                sm_summary = (
                    sm_src.select(
                        F.col("sid").alias("sitemap_id"), "file_id",
                        "pos", "target_uri", "canonical",
                    )
                    .join(
                        sm_parsed.groupBy("sitemap_id").agg(
                            F.min("kind").alias("kind"),
                            F.count("loc").alias("n_entries"),
                            F.min("error").alias("error"),
                        ),
                        "sitemap_id", "left",
                    )
                    .select(
                        "file_id", "pos", "target_uri", "canonical",
                        "kind",
                        F.coalesce(F.col("n_entries"), F.lit(0)).alias(
                            "n_entries"
                        ),
                        "error",
                    )
                )
                sm_locs = (
                    sm_parsed.filter(F.col("loc").isNotNull())
                    .select("sitemap_id", "loc")  # drop entry pos: the
                    # RESPONSE row's (file_id, pos) orders discoveries
                    .join(
                        sm_src.select(
                            F.col("sid").alias("sitemap_id"), "file_id",
                            "pos", "canonical",
                        ),
                        "sitemap_id",
                    )
                    .select(
                        "file_id", "pos", F.col("loc").alias("url"),
                        F.col("canonical").alias("_via"),
                    )
                )
                dup_in_batch = docs_ok.filter(
                    me != F.col("_first")
                ).select(
                    *CRAWL_DOC_COLUMNS, F.lit("in_batch_dup").alias("reason")
                )
                dup_seen = docs_ok.filter(
                    (me == F.col("_first")) & F.col("_seen")
                ).select(
                    *CRAWL_DOC_COLUMNS, F.lit("url_seen").alias("reason")
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
                # every channel also carries _via — the canonical of
                # the DISCOVERING response (null for robots ads) — so
                # the queue row can be prioritized by that page's rank
                channels = redirects.select(
                    F.col("file_id"), F.col("pos"),
                    F.col("location").alias("url"),
                    F.col("canonical").alias("_via"),
                ).union(
                    fresh_docs.select(
                        "file_id", "pos",
                        F.explode("links").alias("url"),
                        F.col("canonical").alias("_via"),
                    )
                ).union(sm_locs).union(
                    # a declared canonical target is a discovery: the
                    # variant was fetched, the REAL page may not be yet
                    canon_variants.select(
                        "file_id", "pos",
                        F.col("canon_target").alias("url"),
                        F.col("canonical").alias("_via"),
                    )
                )
                if rules is not None and "sitemaps" in rules.columns:
                    # robots 'Sitemap:' advertisements are standing
                    # discoveries; file_id -1 ranks them first in ties,
                    # and once a sitemap's WARC arrives its canonical
                    # is indexed and the ad anti-joins away
                    ads = rules.select(
                        F.posexplode("sitemaps").alias("pos", "url")
                    ).select(
                        F.lit(-1).cast("long").alias("file_id"),
                        F.col("pos"), "url",
                        F.lit(None).cast("string").alias("_via"),
                    )
                    channels = channels.union(ads)
                discovered = new_frontier_urls(
                    channels,
                    spark, frontier_table,
                    order_cols=("file_id", "pos"),
                    keep_cols=("_via",),
                    refetch_before=cutoff,
                ).join(
                    docs_ok.select("canonical"), "canonical", "left_anti"
                ).withColumnRenamed("_via", "via")
                def _discovered_job(d=discovered):
                    # the PRIORITIZER half: priority = the discovering
                    # page's rank in the caller-supplied (node, rank)
                    # frame (crawl_wave_ranks over out/links, one wave
                    # behind by construction); unranked/null via → 0.
                    # Scale shape: the queue side is bounded by the
                    # batch (≤ max_files_per_trigger files of links),
                    # so the batch's via-set is semi-joined INTO the
                    # rank frame broadcast-side-first — one map-side
                    # pass over ranks, which never shuffles; the
                    # checkpoint pins the queue so its plan isn't
                    # re-derived for the via projection. The whole
                    # queue job (checkpoint + rank attach + politeness
                    # + write) runs as ONE of the concurrent sink jobs
                    # (r14-opt) — its checkpoint used to serialize on
                    # the driver before any sink started.
                    if ranks is not None:
                        d = d.localCheckpoint(eager=True)
                        vias = d.select(
                            F.col("via").alias("node")
                        ).where(F.col("node").isNotNull()).distinct()
                        pri = ranks.join(
                            F.broadcast(vias), "node"
                        ).select(
                            F.col("node").alias("via"),
                            F.col("rank").alias("priority"),
                        )
                        d = d.join(
                            F.broadcast(pri), "via", "left"
                        ).withColumn(
                            "priority",
                            F.coalesce(F.col("priority"), F.lit(0.0)),
                        )
                    if rules is not None:
                        # the POLITENESS half: every queued fetch gets
                        # its per-host slot and earliest polite offset
                        # from the host's Crawl-delay (s23's
                        # arithmetic, composed into the stream so the
                        # queue is directly executable by a
                        # rate-limited fetcher). With ranks supplied
                        # the slots are PRIORITY-ordered within each
                        # host (negated column = descending): high-rank
                        # pages take the earliest polite slots — the
                        # prioritizer and politeness halves composed.
                        from ..operators.robots import fetch_schedule

                        if ranks is not None:
                            d = fetch_schedule(
                                d.withColumn(
                                    "_negpri", -F.col("priority")
                                ),
                                rules, url_col="url",
                                order_col=["_negpri", "url"],
                            ).drop("_negpri")
                        else:
                            d = fetch_schedule(d, rules, url_col="url")
                    _write_batch_partition(
                        d, f"{out_dir}/discovered", key
                    )
                # the LINK-GRAPH edge sink: (src page canonical →
                # resolved+canonicalized target), one row per extracted
                # anchor of every newly-accepted page — what PageRank/
                # HITS rank and the prioritizer reads; decision-
                # deterministic, so replay-safe like every other sink
                links_out = fresh_docs.filter(
                    ~F.col("_redir") & ~F.col("_sitemap")
                    & ~F.col("_revisit")
                ).select(
                    F.col("canonical").alias("src"),
                    F.explode("links").alias("_u"),
                ).select(
                    "src", _extract_exprs()["links_dst"].alias("dst")
                )
                # the five seen-not-corpus families in ONE sink (r14):
                # disjoint filters of the same persisted frame, tagged
                # with a kind column and union'd — one write job where
                # r13 launched five, the fix for the s24/s26/s27/s29
                # sink-fan-out regression. unionByName fills the
                # columns a kind doesn't carry with NULLs.
                seen = (
                    redirects.select(
                        F.lit("redirect").alias("kind"), "*"
                    )
                    .unionByName(
                        sm_summary.select(
                            F.lit("sitemap").alias("kind"),
                            "file_id", "pos", "target_uri", "canonical",
                            F.col("kind").alias("sitemap_kind"),
                            "n_entries", "error",
                        ),
                        allowMissingColumns=True,
                    )
                    .unionByName(
                        revisits.select(
                            F.lit("revisit").alias("kind"), "*"
                        ),
                        allowMissingColumns=True,
                    )
                    .unionByName(
                        noindex_rows.select(
                            F.lit("noindex").alias("kind"), "*"
                        ),
                        allowMissingColumns=True,
                    )
                    .unionByName(
                        canon_variants.select(
                            F.lit("canonical_variant").alias("kind"), "*"
                        ),
                        allowMissingColumns=True,
                    )
                    .select(*SEEN_COLUMNS)
                )
                # the corpus sinks are disjoint projections of the
                # same leaf checkpoint — independent write jobs, run
                # CONCURRENTLY on the pool (r14-opt, guide §2.6): at
                # micro-batch scale each job's fixed cost dominates,
                # and five-in-flight overlaps those constants; at
                # 100 TB per-batch the jobs' tasks interleave on free
                # executor slots exactly like any multi-tenant stage.
                # Crash-window posture is unchanged: every sink write
                # still replaces this batch's partition (idempotent
                # under replay), the ledger still strictly FOLLOWS all
                # sinks and the index append the ledger, and a crash
                # mid-phase leaves some subset of partitions written —
                # the same observable states the old serial order
                # could leave, all absorbed by replay. (_own_canonicals
                # only matters after an index append, by which point
                # every sink had completed.)
                sink_futs = [
                    pool.submit(
                        _write_batch_partition,
                        accepted, f"{out_dir}/accepted", key,
                    ),
                    pool.submit(
                        _write_batch_partition,
                        seen, f"{out_dir}/seen", key,
                    ),
                    pool.submit(
                        _write_batch_partition,
                        links_out, f"{out_dir}/links", key,
                    ),
                    pool.submit(
                        _write_batch_partition,
                        dup_in_batch.union(dup_seen),
                        f"{out_dir}/duplicates", key,
                    ),
                    pool.submit(_discovered_job),
                ]
                if rules is not None:
                    sink_futs.append(pool.submit(
                        _write_batch_partition,
                        marked.filter(~F.col("allowed")).select(
                            *CRAWL_DOC_COLUMNS
                        ),
                        f"{out_dir}/disallowed", key,
                    ))
                first_exc = None
                for fut in sink_futs:
                    try:
                        fut.result()
                    except BaseException as exc:  # noqa: BLE001 — any
                        # sink failure must fail the batch before the
                        # ledger writes; collect so every job settles
                        if first_exc is None:
                            first_exc = exc
                if first_exc is not None:
                    raise first_exc
                _fire("after_sinks", batch_id)
                # ledger next (its partition also overwrites): from here
                # a replay reprocesses the full batch because the guard
                # excludes this batch's own partition
                _write_batch_partition(
                    fresh.select("exec_name"),
                    f"{out_dir}/processed", key,
                )
                _fire("after_ledger", batch_id)
                # index LAST — idempotent (anti-join re-guard), and any
                # replay after this point restores the pre-append view
                # via _own_canonicals
                append_to_url_index(
                    spark,
                    fresh_docs.select("canonical", "_fetched_at"),
                    frontier_table,
                    fetched_at_col="_fetched_at",
                )
                spark.catalog.refreshTable(frontier_table)
                _fire("after_index", batch_id)
            finally:
                # marked is a localCheckpoint — its RDD is released by
                # the ContextCleaner; only the parse cache needs an
                # explicit unpersist
                pool.shutdown(wait=True)
                recs.unpersist()
        if on_batch_complete is not None:
            on_batch_complete(batch_id)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", f"{out_dir}/_checkpoint"
    )
    if once:
        return writer.trigger(availableNow=True).start()
    return writer.start()
