"""Corpus-curation operators: connected components / duplicate clusters,
deterministic hash sampling, benchmark contamination, n-gram heavy hitters."""

import pytest
from pyspark.sql import functions as F

from da_transform_judgments_pipeline_spark.operators import dedup, text


def test_connected_components_chain_and_islands(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 4), (7, 8), (8, 7)], ["id_a", "id_b"]
    )
    got = {
        r.id: r.cluster_id
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 7: 7, 8: 7}
    dedup.release_cached()


def test_connected_components_long_chain_converges(spark):
    # a path graph is the worst case (diameter = n-1); label propagation
    # still reaches the fixpoint because min labels hop every round
    n = 17
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["id_a", "id_b"]
    )
    rows = dedup.connected_components(pairs).collect()
    assert {r.cluster_id for r in rows} == {0}
    assert len(rows) == n + 1
    dedup.release_cached()


def test_duplicate_clusters_groups_near_dups(spark):
    base = (
        "spark catalyst tungsten shuffle partition broadcast join "
        "aggregate window watermark state store checkpoint lineage "
        "executor driver stage task codegen arrow pandas udf"
    )
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                       # exact dup of 1
            (3, base + " epilogue"),         # near dup of 1/2
            (4, "completely different words about cooking pasta dinner "
                "tomato basil garlic olive oil parmesan recipe kitchen"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.duplicate_clusters(docs, threshold=0.8).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}  # 4 has no near-dup -> unlabeled
    dedup.release_cached()


def test_deterministic_sample_reproducible_and_calibrated(spark):
    df = spark.range(20000).select(
        F.col("id").alias("doc_id"), F.lit("src").alias("source")
    )
    s1 = dedup if False else text.deterministic_sample(df, ["doc_id"], 0.1)
    ids1 = {r.doc_id for r in s1.collect()}
    ids2 = {r.doc_id for r in text.deterministic_sample(df, ["doc_id"], 0.1).collect()}
    assert ids1 == ids2                       # pure function of the key
    assert 0.08 < len(ids1) / 20000 < 0.12    # calibrated rate
    # nested rates: a 5% sample is a subset of the 10% sample (same salt)
    ids_small = {
        r.doc_id for r in text.deterministic_sample(df, ["doc_id"], 0.05).collect()
    }
    assert ids_small <= ids1
    # a salted sample is (nearly) independent, not a subset
    ids_salted = {
        r.doc_id
        for r in text.deterministic_sample(df, ["doc_id"], 0.1, salt="v2").collect()
    }
    assert ids_salted != ids1
    with pytest.raises(ValueError):
        text.deterministic_sample(df, ["doc_id"], 1.5)


def test_deterministic_sample_plan_is_scan_side_filter(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(100).select(F.col("id").alias("doc_id")).write.parquet(p)
    plan = text.deterministic_sample(
        spark.read.parquet(p), ["doc_id"], 0.5
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-side filter, no shuffle


def test_contamination_counts_shared_grams(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),        # contains benchmark 5-grams
            (2, "z y x w v u t s"),        # clean
            (3, "q q q a b c d e q q"),    # one shared 5-gram
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(99, "a b c d e f")], ["doc_id", "text"])
    got = {
        r.doc_id: r.n_contaminated
        for r in text.contamination(docs, bench, n=5).collect()
    }
    # doc 1 shares 'a b c d e' and 'b c d e f'; doc 3 shares 'a b c d e'
    assert got == {1: 2, 3: 1}


def test_top_ngrams_deterministic_order(spark):
    docs = spark.createDataFrame(
        [(1, "x y z x y z"), (2, "x y z only"), (3, "a b c")],
        ["doc_id", "text"],
    )
    rows = text.top_ngrams(docs, n=3, k=2).collect()
    # 'x y z' in docs 1+2 (distinct per doc); ties break on gram string
    assert [(r.gram, r.n_docs) for r in rows] == [("x y z", 2), ("a b c", 1)]


def test_tf_idf_ranks_distinctive_terms(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple apple shared shared"),
            (2, "banana banana shared shared shared"),
            (3, "cherry shared"),
        ],
        ["doc_id", "text"],
    )
    rows = text.tf_idf(docs, top_k=1).collect()
    best = {r.doc_id: r.term for r in rows}
    # the term unique to each doc outranks the corpus-wide one
    assert best == {1: "apple", 2: "banana", 3: "cherry"}
    # rank is deterministic and scores are rounded
    assert all(r.rank_n == 1 for r in rows)


def test_tf_idf_term_tiebreak_deterministic(spark):
    docs = spark.createDataFrame([(1, "zed abc zed abc")], ["doc_id", "text"])
    rows = text.tf_idf(docs, top_k=2).orderBy("rank_n").collect()
    # equal scores -> lexicographic term order breaks the tie
    assert [r.term for r in rows] == ["abc", "zed"]


def test_stratified_sample_rates_and_determinism(spark):
    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 2).cast("string")).alias("src"),
    )
    out = text.stratified_sample(
        df, "src", {"s0": 0.5, "s1": 0.1}, ["src", "doc_id"]
    )
    counts = {
        r.src: r.n
        for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    assert abs(counts["s0"] / 2000 - 0.5) < 0.06
    assert abs(counts["s1"] / 2000 - 0.1) < 0.04
    # pure function of the key: identical on re-run
    again = text.stratified_sample(
        df, "src", {"s0": 0.5, "s1": 0.1}, ["src", "doc_id"]
    )
    assert out.exceptAll(again).isEmpty() and again.exceptAll(out).isEmpty()


def test_stratified_sample_default_rate_drops_unknown(spark):
    df = spark.createDataFrame(
        [(1, "known"), (2, "mystery")], ["doc_id", "src"]
    )
    kept = text.stratified_sample(df, "src", {"known": 1.0}, ["doc_id"])
    assert [r.doc_id for r in kept.collect()] == [1]
    with pytest.raises(ValueError, match="rate"):
        text.stratified_sample(df, "src", {"known": 1.5}, ["doc_id"])


def test_incremental_dedup_matches_batch_pairs(spark, tmp_path):
    """build_minhash_index + incremental_near_duplicates finds the
    batch-vs-corpus near-dup without re-shuffling the corpus in either
    index join (corpus sides are bucketed on the join keys)."""
    def doc(i):
        # per-document vocabulary — no cross-doc shingle overlap
        return " ".join(f"w{i}x{j}" for j in range(40))

    corpus_rows = [(i, doc(i)) for i in range(0, 20)]
    # batch doc 100 is a near-copy of corpus doc 3; doc 101 is novel
    batch_rows = [
        (100, doc(3) + " tail"),
        (101, "completely different content with no overlap at all here"),
    ]
    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    batch = spark.createDataFrame(batch_rows, ["doc_id", "text"])

    prefix = "mh_idx_testinc"
    dedup.build_minhash_index(
        corpus, prefix, path=str(tmp_path / "idx"), buckets=4
    )
    try:
        out = dedup.incremental_near_duplicates(
            batch, spark, prefix, threshold=0.9
        )
        from da_transform_judgments_pipeline_spark.operators.scale import (
            exchange_count,
        )
        # only the BATCH side may shuffle: band join (1) + verify join (1)
        # + batch-side dropDuplicates/agg; the bucketed corpus tables
        # contribute zero Exchanges. Empirically the plan carries 3 batch
        # exchanges; the assertion guards against a corpus-side regression
        # (which would add 2 more).
        assert exchange_count(out) <= 4
        rows = out.collect()
        assert [(r.id_new, r.id_old) for r in rows] == [(100, 3)]
        assert rows[0].jaccard >= 0.9
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_bands")
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_hp")
        dedup.release_cached()


def test_repetition_stats_flags_looping_text(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam ham eggs " * 10),          # heavy trigram repetition
            (2, " ".join(f"u{i}" for i in range(30))),  # all distinct
            (3, "too short"),                    # no trigram at all
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in text.repetition_stats(docs, n=3).collect()}
    assert rows[1].dup_ngram_ratio > 0.8
    assert rows[2].dup_ngram_ratio == 0.0
    assert rows[2].n_ngrams == rows[2].n_distinct == 28
    assert rows[3].n_ngrams == 0 and rows[3].dup_ngram_ratio == 0.0


def test_quality_filter_rules_and_audit_columns(spark):
    from da_transform_judgments_pipeline_spark.operators.text import (
        quality_filter,
    )

    good = (
        "the quick brown fox jumps over a lazy dog and then it runs on "
        "with the pack for a while as evening falls by the river bank"
    )
    rows = [
        (1, good),                                  # passes every rule
        (2, "short text only"),                     # too_short
        (3, " ".join(["zzzzz"] * 30)),              # no stopwords
        (4, " ".join(["12345"] * 30)),              # non_alpha first
        (5, good + " " + "#" * 40),                 # symbol_heavy
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r
        for r in quality_filter(df, min_tokens=10).collect()
    }
    assert out[1].keep == 1 and out[1].fail_reason is None
    assert out[2].fail_reason == "too_short"
    assert out[3].fail_reason == "no_stopwords"
    assert out[4].fail_reason == "non_alpha"
    assert out[5].fail_reason == "symbol_heavy"
    assert all(out[i].keep == 0 for i in (2, 3, 4, 5))


def test_quality_filter_is_map_side(spark):
    from da_transform_judgments_pipeline_spark.operators.text import (
        quality_filter,
    )

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = (
        quality_filter(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_pii_redact_emails_and_phones(spark):
    from da_transform_judgments_pipeline_spark.operators.text import (
        pii_redact,
    )

    rows = [
        (1, "reach me at jane.doe+spam@example.co.uk thanks"),
        (2, "call +44 20 7946 0958 or +33 14 5555 1234 today"),
        (3, "clean text with no contact details at all"),
        (4, "two mails a@b.io and c.d@e-f.org plus +49 30 1234 5678"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in pii_redact(df).collect()}
    assert out[1].n_emails == 1 and "<EMAIL>" in out[1].text
    assert "jane.doe" not in out[1].text
    assert out[2].n_phones == 2 and out[2].text.count("<PHONE>") == 2
    assert out[3].n_emails == 0 and out[3].n_phones == 0
    assert out[3].text == rows[2][1]
    assert out[4].n_emails == 2 and out[4].n_phones == 1


def test_pii_redact_is_map_side(spark):
    from da_transform_judgments_pipeline_spark.operators.text import (
        pii_redact,
    )

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = pii_redact(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_line_dedup_keeps_min_id_owner(spark):
    from da_transform_judgments_pipeline_spark.operators.text import (
        line_dedup,
    )

    shared = "one two three four"  # a full 4-token line, shared verbatim
    rows = [
        (1, shared + " alpha beta gamma delta"),
        (2, shared + " epsilon zeta eta theta"),
        (3, "totally unrelated words here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r
        for r in line_dedup(df, line_tokens=4).collect()
    }
    # doc 1 owns the shared line (min id); doc 2 loses it
    assert out[1].n_lines == 2 and out[1].n_kept == 2
    assert out[2].n_lines == 2 and out[2].n_kept == 1
    assert shared in out[1].text_deduped
    assert shared not in out[2].text_deduped
    assert out[2].text_deduped == "epsilon zeta eta theta"
    assert out[3].n_kept == 1
    # reassembly preserves original line order
    assert out[1].text_deduped == rows[0][1]


def test_line_dedup_formulations_agree(spark, sf_dir):
    """The fingerprint formulation (narrow-key shuffles, text moves once)
    and the content formulation (text-keyed, collision-impossible oracle
    form) must produce identical output on real corpus data — including
    ragged final lines and docs whose every line is owned elsewhere."""
    from da_transform_judgments_pipeline_spark.operators.text import (
        line_dedup,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    key = lambda r: (r.doc_id, r.text_deduped, r.n_lines, r.n_kept)  # noqa: E731
    fp = sorted(map(key, line_dedup(docs, line_tokens=8).collect()))
    ct = sorted(
        map(key, line_dedup(docs, line_tokens=8, key="content").collect())
    )
    assert fp == ct and fp
    import pytest as _pytest

    with _pytest.raises(ValueError, match="key"):
        line_dedup(docs, key="blake3")


def test_bpe_pair_counts_known_corpus(spark):
    """Adjacent-pair frequencies on a hand-countable corpus: overlapping
    pairs, repeated pairs across docs, sub-2-token docs dropped, and the
    (count desc, pair asc) tie order."""
    from da_transform_judgments_pipeline_spark.operators.text import (
        bpe_pair_counts,
    )

    rows = [
        (1, "a b a b"),      # pairs: "a b" x2, "b a" x1
        (2, "a b c"),        # "a b", "b c"
        (3, "solo"),         # dropped (one token)
        (4, ""),             # dropped (no tokens)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = [(r.pair, r.n_pairs) for r in bpe_pair_counts(df).collect()]
    assert got == [("a b", 3), ("b a", 1), ("b c", 1)]
    top1 = [(r.pair, r.n_pairs) for r in bpe_pair_counts(df, top_n=1).collect()]
    assert top1 == [("a b", 3)]


def test_sequence_pack_plan_matches_sequential_scan(spark):
    """The two-phase parallel prefix scan must equal the sequential
    definition: offsets are the running sum of token counts in id order,
    chunk spans are integer windows over the concatenated stream —
    including a doc straddling a chunk boundary and empty docs dropping."""
    from da_transform_judgments_pipeline_spark.operators.text import (
        sequence_pack_plan,
    )

    rows = [
        (1, " ".join(f"t{i}" for i in range(5))),   # offset 0
        (2, ""),                                     # drops
        (3, " ".join(f"u{i}" for i in range(6))),   # offset 5, straddles 8
        (4, "x y"),                                  # offset 11
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_tokens, r.offset, r.chunk_start, r.chunk_end)
        for r in sequence_pack_plan(df, seq_len=8, range_partitions=3).collect()
    }
    assert got == {
        1: (5, 0, 0, 0),
        3: (6, 5, 0, 1),   # tokens 5..10 span chunks 0 and 1
        4: (2, 11, 1, 1),
    }
    dedup.release_cached()


def test_new_text_operator_plan_shapes(spark, sf_dir):
    """Physical-plan contracts for the round-4 text operators:
    sequence_pack_plan must never collapse to a single-partition global
    window (the anti-pattern its two-phase scan exists to avoid), and
    bpe_pair_counts must be join-free with partial+final aggregation and
    a TakeOrderedAndProject top-N (no full sort of the pair table)."""
    from da_transform_judgments_pipeline_spark.operators.text import (
        bpe_pair_counts,
        sequence_pack_plan,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pack = sequence_pack_plan(docs, seq_len=256)
    plan = pack._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "rangepartitioning" in plan
    dedup.release_cached()

    pairs = bpe_pair_counts(docs)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert not any(
        j in plan
        for j in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct")
    )
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") == 2  # partial + final


def test_select_for_training_composes_score_budget_order(spark):
    """The composed pipeline keeps target-like raw docs, drops raw docs
    with no target-gram signal, never emits the target domain itself,
    respects the mixture's source set, and stamps every kept row with
    the reproducible epoch key."""
    target = "legal judgment court appeal ruling judge"
    other = "cooking recipe flour sugar butter oven"
    rows = (
        [(i, target, "tgt") for i in range(1, 4)]
        + [(10 + i, "legal judgment court appeal extra", "raw") for i in range(3)]
        + [(20 + i, other + " words", "raw") for i in range(3)]
        + [(30, "legal judgment court appeal", "excluded_src")]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = text.select_for_training(
        df, "tgt", weights={"raw": 1.0}, total_tokens=10_000,
        lift_threshold_milli=1000.0,
    ).collect()
    dedup.release_cached()
    ids = {r["doc_id"] for r in out}
    assert ids and ids <= {10, 11, 12}        # target-like raw docs only
    assert all(r["source"] == "raw" for r in out)
    assert all(r["lift_milli"] >= 1000.0 for r in out)
    assert all(len(r["epoch_key"]) == 16 for r in out)
    # deterministic: same call, same manifest
    again = text.select_for_training(
        df, "tgt", weights={"raw": 1.0}, total_tokens=10_000,
        lift_threshold_milli=1000.0,
    ).collect()
    dedup.release_cached()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_bm25_scores_hand_computed(spark):
    import math

    from da_transform_judgments_pipeline_spark.operators.scale import (
        exchange_count,
    )
    from da_transform_judgments_pipeline_spark.operators.text import (
        bm25_scores,
    )

    rows = [
        (1, "red fox red"),
        (2, "blue fox"),
        (3, "green tree green tree"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_scores(docs, ["red", "fox"], k1=1.2, b=0.75)
    # the SCORING plan is shuffle-free (stats are control-plane scalars)
    assert exchange_count(out) == 0
    got = {r["doc_id"]: r for r in out.collect()}
    n, avgdl = 3, (3 + 2 + 4) / 3
    tfs = {1: (2, 1), 2: (0, 1), 3: (0, 0)}
    lens = {1: 3, 2: 2, 3: 4}
    dfs = (1, 2)
    for did in (1, 2, 3):
        score = 0.0
        for ti in range(2):
            idf = math.log(1.0 + (n - dfs[ti] + 0.5) / (dfs[ti] + 0.5))
            tf = float(tfs[did][ti])
            denom = tf + 1.2 * (1.0 - 0.75 + 0.75 * lens[did] / avgdl)
            score += idf * (tf * 2.2) / denom
        assert got[did]["doclen"] == lens[did]
        assert abs(got[did]["score"] - round(score, 6)) < 1e-9, did
    # zero-match doc scores exactly 0
    assert got[3]["score"] == 0.0
