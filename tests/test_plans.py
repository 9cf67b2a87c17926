"""Physical-plan quality gates: the properties that make these queries hold
at 100 TB — predicate pushdown into the parquet scan, column pruning,
broadcast joins for dims, map-side partial aggregation, semi-join shape,
whole-stage codegen — asserted on the driver-contract queries so a
regression in plan shape fails CI, not just a benchmark."""

import contextlib
import io

import pytest

import __spark_entry__ as entry


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    qs = entry.queries()
    return {
        name: _formatted(qs[name](spark, sf_dir))
        for name in (
            "s01_prefix_scan",
            "a07_pricing_summary",
            "a08_revenue_filter",
            "j01_left_lookup_join",
            "a12_order_priority_count",
            "a13_local_supplier_volume",
            "w02_latest_per_key",
        )
    }


def test_filter_pushdown_reaches_scan(plans):
    assert "StringStartsWith(source,src1)" in plans["s01_prefix_scan"]
    assert "LessThan(l_shipdate" in plans["a07_pricing_summary"]
    # all three predicates of the revenue filter reach the scan
    a08 = plans["a08_revenue_filter"]
    assert "GreaterThanOrEqual(l_shipdate" in a08
    assert "GreaterThanOrEqual(l_discount,0.02)" in a08
    assert "LessThan(l_quantity,24.0)" in a08


def test_column_pruning(plans):
    # s01 projects 3 of documents' 5 columns; the wide text column must not
    # be read
    scan_schema = [
        ln for ln in plans["s01_prefix_scan"].splitlines()
        if "ReadSchema" in ln
    ][0]
    assert "text" not in scan_schema and "n_chars" in scan_schema
    # j01 reads only the join/out columns of each side
    j01 = plans["j01_left_lookup_join"]
    assert "o_orderkey:bigint,o_custkey:bigint" in j01
    assert "c_custkey:bigint,c_name:string" in j01


def test_dimension_joins_broadcast(plans):
    assert "BroadcastHashJoin" in plans["j01_left_lookup_join"]
    # the 6-table star join must broadcast every dimension (5 joins, no
    # shuffle join anywhere on the dim side)
    assert plans["a13_local_supplier_volume"].count("BroadcastHashJoin") >= 5
    assert "SortMergeJoin" not in plans["a13_local_supplier_volume"]
    # and the region constant filter reaches the region scan
    assert "EqualTo(r_name,ASIA)" in plans["a13_local_supplier_volume"]


def test_semi_join_shape(plans):
    assert "LeftSemi" in plans["a12_order_priority_count"]


def test_partial_aggregation(plans):
    # partial (map-side) + final HashAggregate around one exchange
    a07 = plans["a07_pricing_summary"]
    assert a07.count("HashAggregate") >= 2


def test_whole_stage_codegen(spark, sf_dir):
    """The relational core must run inside codegen spans (`*(n)` markers).
    AQE only finalizes the executed plan after an action, so collect first
    and read the simple-mode explain."""
    qs = entry.queries()
    for name in ("s01_prefix_scan", "a07_pricing_summary",
                 "j01_left_lookup_join"):
        df = qs[name](spark, sf_dir)
        df.collect()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()
        assert buf.getvalue().count("*(") >= 2, name


def test_unigram_lm_vocab_join_broadcasts(spark, sf_dir):
    """x17's vocabulary lookup must broadcast the V-row vocab onto the
    token stream — the corpus-side token scan must NOT shuffle for the
    join (its only exchanges are the wordcount and the per-doc agg)."""
    from da_transform_judgments_pipeline_spark.operators import text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        text.unigram_lm_score(docs, vocab_size=50)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_audio_window_plan_is_map_side(spark):
    """m06's window fan-out is pure Catalyst — no Exchange, no Python."""
    import pyspark.sql.functions as F

    from da_transform_judgments_pipeline_spark.operators import multimodal

    media = spark.createDataFrame(
        [(1, 5000)], "media_id long, duration_ms long"
    ).select("media_id", F.struct("duration_ms").alias("meta"))
    plan = (
        multimodal.audio_window_plan(media)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_cluster_balanced_sample_single_window_shuffle(spark):
    """e10's selection adds exactly ONE exchange on top of the map-side
    assignment: the per-cluster window. (kmeans_fit's update shuffles run
    during construction; the returned plan is assignment + window.)"""
    from da_transform_judgments_pipeline_spark.operators import clustering

    rows = [(i, [float(i % 3), 0.0]) for i in range(30)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    plan = (
        clustering.cluster_balanced_sample(df, k=2, per_cluster=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1


def test_interval_overlap_join_never_theta(spark):
    """o05's scale contract: the overlap join must plan as an EQUI-join
    on (key, bucket) — no CartesianProduct, no BroadcastNestedLoopJoin
    (the shapes Spark plans for a raw interval theta join)."""
    import pyspark.sql.functions as F

    from da_transform_judgments_pipeline_spark.operators import temporal

    def mk(n0):
        return spark.createDataFrame(
            [(i % 5, i, "2024-01-01 00:00:00", "2024-01-01 06:00:00")
             for i in range(n0, n0 + 20)],
            ["user_id", "event_id", "s", "e"],
        ).select(
            "user_id", "event_id",
            F.to_timestamp("s").alias("start"),
            F.to_timestamp("e").alias("end"),
        )

    plan = (
        temporal.interval_overlap_join(mk(0), mk(100), "user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_keyed_prefix_rank_no_keyed_exchange(spark):
    """m08's scale contract: the per-key rank must NOT hash-partition on
    the low-cardinality key — the only exchange is the range repartition
    on the order column (hashpartitioning(modality) would funnel each
    giant group through one task)."""
    from da_transform_judgments_pipeline_spark.operators import dedup
    from da_transform_judgments_pipeline_spark.operators.scale import (
        keyed_prefix_rank,
    )

    df = spark.createDataFrame(
        [(i, i % 3) for i in range(50)], ["id", "k"]
    )
    out = keyed_prefix_rank(df, "k", "id", range_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning(id" in plan
    # the window runs on (_pid, k) INSIDE the range partitions — no
    # exchange keyed on k alone
    assert "hashpartitioning(k" not in plan
    out.count()
    dedup.release_cached()


def test_time_weighted_avg_reuses_window_partitioning(spark, sf_dir):
    """o07's aggregate must reuse the lead() window's hashpartitioning on
    the key — keeping the key un-aliased between the two is what makes
    alias-aware partitioning propagation hold. Exactly 2 exchanges: the
    keyed window shuffle and the final presentation orderBy."""
    saved = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = (
            entry.queries()["o07_time_weighted_avg"](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", saved)
    assert plan.count("Exchange") == 2


def test_driver_contract_registry_consistency():
    """Registry invariants a typo would silently break: every bench
    HEADLINE name resolves to a registered query; every oracle belongs
    to a registered query; the rows-only set is exactly the documented
    approximate-by-design queries; and the first 50 entries (the
    driver's recorded window) contain no duplicates."""
    import bench

    qs = entry.queries()
    osql = entry.oracle_sql()
    assert [n for n in bench.HEADLINE if n not in qs] == []
    assert [n for n in osql if n not in qs] == []
    rows_only = sorted(k for k in qs if k not in osql)
    assert rows_only == [
        "a25_hll_distinct",
        "e03_ann_lsh_topk",
        "e05b_embedding_lsh_pruned",
        "e07_ann_ivf",
        "e12_pq_topk",
        "x21_bpe_train",
    ]
    window = list(qs)[:50]
    assert len(set(window)) == 50


def test_every_streaming_query_records_stream_splits():
    """Every StreamingQuery-lifecycle bench entry must decompose its
    timing into fixture/stream/collect/teardown via STREAM_SPLITS —
    otherwise its checkpoint/harness overhead reads as engine time in
    round-over-round comparisons (the round-11 verdict's s27 gap).
    Pinned structurally: each streaming query's source records a split
    under its own registry name."""
    import inspect

    for fn in (
        entry.q_s24_crawl_stream_intake,
        entry.q_s26_crawl_schedule_stream,
        entry.q_s27_crawl_link_graph,
        entry.q_s29_crawl_priority_stream,
    ):
        name = fn.__name__[2:]
        src = inspect.getsource(fn)
        assert f'STREAM_SPLITS["{name}"]' in src, name
        for part in ("fixture_sec", "stream_sec", "collect_sec",
                     "teardown_sec"):
            assert part in src, (name, part)


def test_bench_tail_line_survives_2000_char_capture():
    """The driver records only the TAIL (~2000 chars) of bench.py's
    stdout; r5-r7 all recorded `parsed: null` because the line carrying
    headline_total overflowed the capture. Pin the contract: with a
    realistically large registry (120 queries, 90 smoke), the LAST line
    of output_lines() is <=300 bytes, scalars-only, and parses to the
    headline metric even from a simulated 2000-char tail capture."""
    import json

    import bench

    out = {
        "metric": "headline_total",
        "value": 39.712,
        "unit": "sec",
        "sf": 0.1,
        "r3_subtotal": 13.456,
        "stream_splits": {
            "s24_crawl_stream_intake": {
                "fixture_sec": 4.5, "stream_sec": 9.1,
                "collect_sec": 0.4, "teardown_sec": 0.2,
            },
        },
        "stream_harness": 5.1,
        "index_builds": {"build_ivf_index": 1.234},
        "e05b_candidates": {"fraction": 0.0451},
        "queries": {f"q{i:03d}_some_operator_name": 0.123 for i in range(120)},
        "smoke": {f"s{i:03d}_smoke_query_name": 0.045 for i in range(90)},
        "headline_total": 39.712,
        "headline_unit": "sec",
        "headline_sf": 0.1,
    }
    lines = bench.output_lines(out)
    assert len(lines) == 3
    assert len(lines[-1]) <= 300
    captured_tail = "\n".join(lines)[-2000:]
    last = captured_tail.splitlines()[-1]
    parsed = json.loads(last)
    assert parsed["metric"] == "headline_total"
    assert parsed["value"] == 39.712
    assert parsed["r3_subtotal"] == 13.456
    assert parsed["stream_harness"] == 5.1
    assert parsed["n_queries"] == 120
    assert "queries" not in parsed


def test_bench_artifact_carries_full_per_query_map(tmp_path):
    """r15: the driver's tail capture drops most of the stdout per-query
    map (PERF_r14.per_query came back empty), so the bench also persists
    the COMPLETE output object to a JSON file. Pin: every queries/smoke
    entry survives the round-trip, and an unwritable path degrades to
    None instead of failing the bench."""
    import json

    import bench

    out = {
        "metric": "headline_total",
        "value": 1.0,
        "queries": {f"q{i:03d}_name": 0.1 * i for i in range(160)},
        "smoke": {f"s{i:03d}_name": 0.01 for i in range(50)},
        "headline_total": 1.0,
    }
    path = bench.write_artifact(out, str(tmp_path / "BENCH_latest.json"))
    assert path is not None
    loaded = json.load(open(path))
    assert loaded["queries"] == out["queries"]
    assert loaded["smoke"] == out["smoke"]
    assert bench.write_artifact(out, "/nonexistent-dir/x.json") is None


def test_batch_validation_report_plan_shape(spark):
    """b01's relational core: the batched J2 verification join must never
    plan as a cartesian/nested-loop product (it is an equi-join on
    (consignment, file)), and sha2 must evaluate below the join (map-side
    over the member scan), with a bounded number of shuffles. At sf scale
    AQE broadcasts the tiny sides; at 100 TB the same equi-join degrades
    to a shuffled join on the same keys — either way no quadratic node."""
    from da_transform_judgments_pipeline_spark.plans.batch import (
        batch_validation_report,
    )

    rows = []
    for c in ("P-1", "P-2"):
        rows += [
            (c, "tagmanifest-sha256.txt", b"x" * 64 + b"  bagit.txt\n"),
            (c, "manifest-sha256.txt", b"y" * 64 + b"  data/f.txt\n"),
            (c, "bagit.txt", b"hello"),
            (c, "data/f.txt", b"world"),
        ]
    df = spark.createDataFrame(
        rows, "consignment string, name string, content binary"
    )
    out = batch_validation_report(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # sha2 is projected from the scan side, not recomputed post-join
    assert "sha2" in plan
    assert plan.count("Exchange hashpartitioning") <= 4
    # and the report itself is correct on this toy input
    got = {r["consignment"]: r["status"] for r in out.collect()}
    assert got == {"P-1": "error", "P-2": "error"}  # planted mismatches


def test_token_budget_sample_is_map_side(spark):
    """x22's scale contract: after the one availability agg (computed
    before plan construction, control-plane), the SAMPLE itself is a
    pure map-side filter — the returned plan carries no Exchange, so at
    100 TB the kept path is a single scan."""
    from da_transform_judgments_pipeline_spark.operators import text

    df = spark.createDataFrame(
        [(i, f"s{i % 2}", "w " * 10) for i in range(40)],
        ["doc_id", "source", "text"],
    )
    out = text.token_budget_sample(
        df, {"s0": 1.0, "s1": 1.0}, total_tokens=100
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    out.count()


def test_substring_dedup_single_source_scan(spark, tmp_path):
    """d10's token stage feeds BOTH the window fan-out and the
    reassembly join; it is persisted so the dominant input — the corpus
    text — is scanned and tokenized exactly once. Gate: the executed
    plan shows ONE parquet scan of the source and reuses the cached
    token stage (InMemoryTableScan) for every other consumer."""
    from da_transform_judgments_pipeline_spark.operators import dedup, text

    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 10) for i in range(20)],
        ["doc_id", "text"],
    ).write.parquet(src)
    df = spark.read.parquet(src)
    out = text.substring_dedup(df, window_tokens=5)
    try:
        out.count()  # materialize so the persist is populated
        plan = out._jdf.queryExecution().executedPlan().toString()
        # every Scan parquet in the printout is the one nested inside an
        # InMemoryRelation's cached-child description — i.e. EVERY
        # consumer of the token stage reads the cache, and the real
        # parquet scan runs once, to populate it
        n_cached = plan.count("InMemoryTableScan")
        assert n_cached >= 2  # window fan-out + reassembly join
        assert plan.count("Scan parquet") == n_cached
    finally:
        dedup.release_cached()


def test_ngram_repetition_suite_is_map_side(spark):
    """x28's scale contract: all nine Gopher repetition fractions are
    computed as a projection (sorted-array run-length encoding per
    document) — the plan carries NO Exchange and no Python stage, so at
    100 TB the suite is a single scan."""
    from da_transform_judgments_pipeline_spark.operators import text

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "x y z")], "doc_id long, text string"
    )
    out = text.ngram_repetition_suite(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan, plan


def test_ngram_dup_union_is_map_side(spark):
    """x33's scale contract: the positional-union fractions are a pure
    projection like the x28 proxy — NO Exchange, no Python stage; the
    per-document cost is O(n·T) with the window bounded at n ≤ 10."""
    from da_transform_judgments_pipeline_spark.operators import text

    df = spark.createDataFrame(
        [(1, "a b a b c a b a b c"), (2, "x y z")],
        "doc_id long, text string",
    )
    out = text.ngram_dup_union_fractions(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan, plan


def test_crawl_pipeline_single_shuffle(spark):
    """x29's scale contract: after the Arrow-batched WARC record stage,
    everything up to the dup-ownership window is map-side — the only
    Exchange in the plan is the ONE hash partition on the content
    fingerprint (plus its window sort)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from da_transform_judgments_pipeline_spark.operators import text
    from da_transform_judgments_pipeline_spark.sources.warc import (
        build_warc_gz,
        warc_records,
    )

    blob = bytearray(build_warc_gz([{
        "url": "https://crawl.example/1/0",
        "date": "2021-03-04T05:06:07Z",
        "payload": b"<html><body>hi there</body></html>",
    }]))
    files = spark.createDataFrame(
        [(1, blob)], "file_id long, content binary"
    )
    recs = warc_records(files).filter(F.col("warc_type") == "response")
    extracted = text.language_id(
        recs.select(
            F.col("file_id").alias("doc_id"), "pos",
            text.html_text(F.col("payload").cast("string")).alias("text"),
        )
    )
    me = F.struct(F.col("doc_id"), F.col("pos"))
    out = extracted.withColumn(
        "fp", F.md5(F.lower(F.col("text")))
    ).withColumn("first", F.min(me).over(Window.partitionBy("fp")))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_warc_and_pdf_record_schemas_prune(spark):
    """Column pruning through the Arrow stages: selecting one narrow
    column from warc_records/parse_pdfs output plans without error and
    the mapInPandas schema stays the declared contract (the stage
    itself cannot prune — Python produces every column — but nothing
    downstream re-shuffles to drop them)."""
    from da_transform_judgments_pipeline_spark.plans.editorial import (
        PARSED_PDF_SCHEMA,
    )
    from da_transform_judgments_pipeline_spark.sources.warc import (
        WARC_RECORD_SCHEMA,
    )

    assert "payload binary" in WARC_RECORD_SCHEMA
    assert "n_pages int" in PARSED_PDF_SCHEMA


def test_canonical_url_is_map_side(spark):
    """f04's scale contract: canonicalization (incl. the dot-segment
    aggregate fold) is a pure projection — no Exchange, no Python."""
    from da_transform_judgments_pipeline_spark.functions.strings import (
        canonical_url,
    )

    df = spark.createDataFrame(
        [(1, "HTTP://A.b:80/x/../y?b&a#f")], "i int, u string"
    )
    out = df.select(canonical_url("u").alias("c"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan, plan


def test_wet_wat_pack_single_shuffle(spark):
    """The WET/WAT derivations are embarrassingly parallel per ARCHIVE:
    the plan's only Exchange is the group-by-file co-location (plus
    nothing on the parse side — warc_records is a mapInPandas leaf)."""
    import pyspark.sql.functions as F

    from da_transform_judgments_pipeline_spark.operators.scale import (
        exchange_count,
    )
    from da_transform_judgments_pipeline_spark.sources import warc as W

    df = spark.createDataFrame(
        [(1, "http://h/a", "t", "2021-03-04T05:06:07Z", "<u:1>", 1)],
        "file_id long, target_uri string, text string, date string,"
        " record_id string, pos int",
    )
    assert exchange_count(W.wet_pack(df)) == 1
    wat_df = df.withColumn(
        "links", F.array(F.lit("http://h/x"))
    ).withColumn("http_status", F.lit(200))
    assert exchange_count(W.wat_pack(wat_df)) == 1
    # and re-parsing the packed files adds NO further exchange
    assert exchange_count(W.warc_records(W.wet_pack(df))) == 1


def test_round13_op_scale_contracts(spark):
    """The round-13 operators' scale contracts: charset-aware payload
    decoding (decode_payloads) is a pure map-side chain — NO Exchange,
    no Python stage (at 100 TB it's a single scan riding the intake
    projection); revisit resolution (resolve_revisits) is ONE equi-join
    whose plan contains no cartesian product and exactly the join's
    exchanges."""
    from da_transform_judgments_pipeline_spark.operators import text
    from da_transform_judgments_pipeline_spark.sources import warc as W
    from pyspark.sql import functions as F

    pay = spark.createDataFrame(
        [(1, bytearray(b"caf\xe9"), "text/html; charset=iso-8859-1")],
        "doc_id long, payload binary, mime string",
    )
    plan = (
        text.decode_payloads(pay)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan, plan

    recs = spark.createDataFrame(
        [(1, 1, "response", "<urn:uuid:a>", "https://h/x", None,
          "sha1:AA", bytearray(b"x")),
         (1, 2, "revisit", "<urn:uuid:b>", "https://h/y", "<urn:uuid:a>",
          "sha1:AA", bytearray(b""))],
        "file_id long, pos int, warc_type string, record_id string,"
        " target_uri string, refers_to string, payload_digest string,"
        " payload binary",
    )
    resolved = W.resolve_revisits(recs)
    plan = resolved._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    got = {r["target_uri"]: r["resolved_uri"] for r in resolved.collect()}
    assert got == {"https://h/y": "https://h/x"}


def test_round12_map_side_ops_no_exchange(spark):
    """The round-12 projection operators' scale contracts: boilerplate
    removal (extract_main_text), SURT keys (surt_key) and int8
    quantization (quantize_embeddings) are all pure map-side chains —
    NO Exchange, no Python stage; at 100 TB each is a single scan."""
    from da_transform_judgments_pipeline_spark.functions.strings import (
        surt_key,
    )
    from da_transform_judgments_pipeline_spark.operators import text
    from da_transform_judgments_pipeline_spark.operators.similarity import (
        quantize_embeddings,
    )
    from pyspark.sql import functions as F

    html = spark.createDataFrame(
        [(1, "<p>some long enough paragraph of prose text here</p>")],
        "doc_id long, html string",
    )
    plan = (
        text.extract_main_text(html)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan, plan

    urls = spark.createDataFrame(
        [("https://www.example.com/a",)], "u string"
    )
    plan = (
        urls.select(surt_key(F.col("u")).alias("k"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan, plan

    emb = spark.createDataFrame(
        [(1, [0.5, -1.0])], "vec_id long, embedding array<float>"
    )
    plan = (
        quantize_embeddings(emb)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan, plan
