"""Text-analysis, dedup, and similarity operators on the driver testdata."""

import pytest
from pyspark.sql import functions as F

from da_transform_judgments_pipeline_spark.operators import dedup, similarity, text


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_text_stats(spark, docs):
    out = text.text_stats(docs).select(
        "doc_id", "n_tokens", "n_chars_computed", "stopword_ratio",
        "quality_score",
    )
    rows = out.collect()
    assert all(0 <= r.quality_score <= 1 for r in rows)
    assert all(r.n_tokens > 0 for r in rows)
    one = docs.filter(F.col("doc_id") == 0).first()
    got = [r for r in rows if r.doc_id == 0][0]
    assert got.n_tokens == len(one.text.split())
    assert got.n_chars_computed == len(one.text)


def test_language_id_deterministic(spark, docs):
    out = text.language_id(docs)
    rows = out.select("doc_id", "detected_lang").collect()
    # vocabulary contains 'the' and 'a' → english profile hits dominate
    langs = {r.detected_lang for r in rows}
    assert langs <= {"en", "de", "fr", "es", "und"}
    # determinism
    again = {r.doc_id: r.detected_lang for r in out.select("doc_id", "detected_lang").collect()}
    assert all(again[r.doc_id] == r.detected_lang for r in rows)


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [(1, "Hello  world foo bar baz"), (2, "hello world  foo bar baz"),
         (3, "entirely different words here now")],
        "id int, text string",
    )
    out = text.fingerprint(df, "text").collect()
    by_id = {r.id: r for r in out}
    assert by_id[1].fingerprint_md5 == by_id[2].fingerprint_md5
    assert by_id[1].fingerprint_md5 != by_id[3].fingerprint_md5


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "unique")],
        "doc_id long, text string",
    )
    dups = dedup.exact_duplicates(df, ["text"], "doc_id").collect()
    assert len(dups) == 1
    assert dups[0].keep_id == 1 and dups[0].dup_ids == [1, 2]
    kept = dedup.exact_dedup(df, ["text"], "doc_id")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3]


def test_exact_dedup_null_is_its_own_group(spark):
    """SQL GROUP BY semantics: NULL text must NOT merge into the ''
    group (a bare concat_ws key would), and NULL rows dedup among
    themselves."""
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, None), (4, "")],
        "doc_id long, text string",
    )
    kept = sorted(
        r.doc_id for r in dedup.exact_dedup(df, ["text"], "doc_id").collect()
    )
    assert kept == [1, 2]  # one NULL survivor, one '' survivor
    dups = dedup.exact_duplicates(df, ["text"], "doc_id").collect()
    assert sorted(tuple(r.dup_ids) for r in dups) == [(1, 3), (2, 4)]


def test_srp_ann_recall_contract(spark, tmp_path):
    """e03's approximate SRP path gets a MEASURED recall contract instead
    of 'approximate by design': recall@10 vs exact top-10 (mean over the
    10 lowest-vec_id queries, sf0.01, 500 vectors) is deterministic
    (seeded hyperplanes, fixed data) and must (a) hold its per-knob floor
    and (b) rise monotonically with max_hamming up to >=0.8 at hamming<=4.
    Measured r5: 0.37 @ h<=2 (probing 37/256 of signature space — the
    6.9x-cheaper serving default), 0.61 @ h<=3, 0.82 @ h<=4; the floors
    sit just under those values so a formulation regression trips them
    while run-to-run determinism keeps them tight."""
    from da_transform_judgments_pipeline_spark.operators import similarity

    emb = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    ).persist()
    path = str(tmp_path / "srp")
    similarity.build_ann_index(emb, path, n_planes=8, seed=42, dim=64)
    idx = spark.read.parquet(path)
    qvecs = [
        list(r["embedding"]) for r in emb.orderBy("vec_id").limit(10).collect()
    ]
    exact = [
        {r.id for r in similarity.cosine_topk(emb, q, k=10).collect()}
        for q in qvecs
    ]

    def mean_recall(max_hamming):
        rec = []
        for q, ex in zip(qvecs, exact):
            approx = {
                r.id
                for r in similarity.ann_topk_indexed(
                    spark, idx, q, k=10, n_planes=8,
                    max_hamming=max_hamming, seed=42,
                ).collect()
            }
            rec.append(len(ex & approx) / 10)
        return sum(rec) / len(rec)

    r2, r4 = mean_recall(2), mean_recall(4)
    assert r2 >= 0.35  # serving default (e03's knob)
    assert r4 >= 0.80  # wider probe must reach the 0.8 bar
    assert r4 > r2  # recall must rise with the probe radius
    emb.unpersist()


def test_minhash_finds_planted_near_dups(spark, docs):
    """sf0.001 documents contain planted ~0.99-jaccard pairs; MinHash-LSH
    must find what exact n-gram jaccard finds (high threshold ⇒ recall ~1)."""
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_near_duplicates(docs, threshold=0.9).collect()
    }
    assert exact, "expected planted near-duplicates in testdata"
    assert lsh == exact  # banded LSH at j≈0.99, b=16,r=4 ⇒ recall ≈ 1
    # precision is exact by construction (candidates verified on true jaccard)


def test_minhash_collapse_paths_agree(spark, docs):
    """The physical routes — collapse (forced), full collapse without the
    shared cache (persist_shingles=False), and no collapse — must produce
    identical pairs on a corpus CONTAINING identical-set groups, including
    intra-group jaccard-1.0 rows and member expansion of rep-level
    matches. (The retired split_dups router's semi/anti probe joins must
    be GONE from the collapse plan — it carries no LeftSemi/LeftAnti.)"""
    dup1 = docs.limit(6).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    dup2 = docs.limit(2).withColumn("doc_id", F.col("doc_id") + 2_000_000)
    corpus = docs.unionByName(dup1).unionByName(dup2)
    key = lambda r: (r.id_a, r.id_b, r.jaccard)  # noqa: E731
    collapsed_df = dedup.minhash_near_duplicates(
        corpus, threshold=0.9, collapse_exact=True
    )
    plan = collapsed_df._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" not in plan and "LeftAnti" not in plan
    collapsed = sorted(map(key, collapsed_df.collect()))
    dedup.release_cached()
    full = sorted(
        map(
            key,
            dedup.minhash_near_duplicates(
                corpus,
                threshold=0.9,
                persist_shingles=False,
                collapse_exact=True,
            ).collect(),
        )
    )
    plain = sorted(
        map(
            key,
            dedup.minhash_near_duplicates(
                corpus, threshold=0.9, collapse_exact=False
            ).collect(),
        )
    )
    dedup.release_cached()
    assert collapsed == full == plain
    # the duplicated docs must appear: each dup pairs with its original
    pair_set = {(a, b) for a, b, _ in collapsed}
    originals = [r.doc_id for r in docs.limit(2).select("doc_id").collect()]
    for o in originals:
        assert (o, o + 2_000_000) in pair_set
    with pytest.raises(ValueError, match="collapse_exact"):
        dedup.minhash_near_duplicates(docs, collapse_exact="sometimes")


def test_simhash_behavior(spark):
    """SimHash invariants on controlled docs: identical text → hamming 0;
    one-token edit on a long doc → small hamming; unrelated text → large.
    (The sf testdata docs are ~20 tokens — too short for stable simhash, so
    this test uses sized fixtures; minhash covers the tiny-doc regime.)"""
    base = " ".join(f"tok{i % 97}word{i % 31}" for i in range(300))
    edited = base.replace("tok5word5", "changedtoken", 1)
    other = " ".join(f"zz{i}qq{i * 7 % 13}" for i in range(300))
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, edited), (4, other)],
        "doc_id long, text string",
    )
    sig = df.select(
        "doc_id", dedup.simhash64(F.col("text")).alias("sig")
    ).collect()
    s = {r.doc_id: r.sig for r in sig}
    assert s[1] == s[2]
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")  # noqa: E731
    assert ham(s[1], s[3]) <= 10
    assert ham(s[1], s[4]) >= 16

    pairs = dedup.simhash_near_duplicates(df, max_hamming=10).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in got and (1, 3) in got and (1, 4) not in got


def test_simhash_md5_matches_python_reference(spark):
    """simhash64_md5 must equal a pure-Python simhash over md5 token bits
    (the cross-engine-deterministic contract the DuckDB oracle relies on)."""
    import hashlib

    def py_simhash(s: str) -> int:
        toks = [t for t in s.strip().split() if t]
        votes = [0] * 64
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:16], 16)
            for i in range(64):
                # bit i = bit (3 - i%4) of hex digit i//4, i.e. big-endian
                # over the first 64 bits of the digest
                bit = (h >> (63 - i)) & 1
                votes[i] += 1 if bit else -1
        sig = 0
        for i in range(63):
            if votes[i] > 0:
                sig += 1 << i
        if votes[63] > 0:
            sig += -(1 << 63)
        return sig

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "hello world"),
        (3, "  padded   whitespace\ttokens  "),
        (4, "single"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.sig
        for r in df.select(
            "doc_id", dedup.simhash64_md5(F.col("text")).alias("sig")
        ).collect()
    }
    for doc_id, s in rows:
        assert got[doc_id] == py_simhash(s), doc_id


def test_embedding_near_duplicates_threshold(spark, embeddings):
    pairs = dedup.embedding_near_duplicates_exact(embeddings, threshold=0.4)
    rows = pairs.collect()
    assert all(r.cosine >= 0.4 for r in rows)
    assert all(r.id_a < r.id_b for r in rows)


def test_embedding_near_duplicates_default_is_lsh(spark, embeddings):
    """The unsuffixed name routes to the LSH scale path: no cartesian or
    nested-loop node in its plan."""
    out = dedup.embedding_near_duplicates(
        embeddings, threshold=0.45, n_planes=8, dim=64
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_near_duplicates_lsh_matches_exact(spark, embeddings):
    """The SRP-bucketed scale path returns exactly the all-pairs result,
    and its plan contains no cartesian/nested-loop node."""
    exact = dedup.embedding_near_duplicates_exact(embeddings, threshold=0.45)
    lsh = dedup.embedding_near_duplicates_lsh(
        embeddings, threshold=0.45, n_planes=8, dim=64
    )
    plan = lsh._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    key = lambda r: (r.id_a, r.id_b, r.cosine)  # noqa: E731
    assert sorted(map(key, lsh.collect())) == sorted(
        map(key, exact.collect())
    )


def test_probe_radius_tightens_with_threshold():
    loose = similarity.probe_radius_for(0.45, 16)
    tight = similarity.probe_radius_for(0.95, 16)
    assert tight < loose
    # at 2σ (recall ~97.7% at the threshold) real near-dup thresholds keep
    # the probe ball small
    assert similarity.probe_radius_for(0.95, 16, sigmas=2.0) <= 5
    assert len(similarity.hamming_ball_masks(8, 1)) == 9  # 1 + C(8,1)


def test_cosine_topk_matches_bruteforce(spark, embeddings):
    qrow = embeddings.filter(F.col("vec_id") == 0).first()
    q = list(qrow.embedding)
    top = similarity.cosine_topk(embeddings, q, k=5).collect()
    assert top[0].id == 0 and abs(top[0].cosine - 1.0) < 1e-6
    assert len(top) == 5
    assert all(
        top[i].cosine >= top[i + 1].cosine for i in range(len(top) - 1)
    )


def test_knn_join_exact(spark, embeddings):
    small = embeddings.limit(50)
    out = similarity.knn_join_exact(small, small, k=3).collect()
    by_left = {}
    for r in out:
        by_left.setdefault(r.id_l, []).append(r)
    assert all(len(v) == 3 for v in by_left.values())
    assert all(r.id_l != r.id_r for r in out)


def test_knn_join_default_is_lsh(spark, embeddings):
    """The unsuffixed name routes to the LSH scale path: no cartesian or
    nested-loop node in its plan."""
    small = embeddings.limit(50)
    out = similarity.knn_join(small, small, k=3, probe_radius=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_index_probe_prunes_partitions(spark, embeddings, tmp_path):
    """The persisted index probe must scan only the hamming-neighborhood
    partitions (PartitionFilters on sig), not the whole corpus, and agree
    with the on-the-fly ann_topk at identical parameters."""
    path = str(tmp_path / "ann_index")
    similarity.build_ann_index(
        embeddings, path, n_planes=8, seed=42, dim=64
    )
    q = list(embeddings.filter(F.col("vec_id") == 1).first().embedding)
    probe = similarity.ann_topk_indexed(
        spark, path, q, k=10, n_planes=8, max_hamming=2, seed=42
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "sig" in plan
    rows = probe.collect()
    # post-execution scan metrics: the probe touches ≤ |hamming ball| = 37
    # partitions and reads a strict subset of the corpus rows
    leaf = probe._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    metrics = leaf.metrics()
    n_parts = metrics.apply("numPartitions").value()
    n_rows = metrics.apply("numOutputRows").value()
    assert n_parts <= len(similarity.hamming_ball_masks(8, 2))
    assert n_rows < embeddings.count()
    flat = similarity.ann_topk(
        embeddings, q, k=10, n_planes=8, max_hamming=2, seed=42
    )
    key = lambda r: (r.id, r.cosine)  # noqa: E731
    assert [key(r) for r in rows] == [key(r) for r in flat.collect()]


def test_embedding_near_dup_method_routing(spark, embeddings):
    """The unsuffixed names dispatch on method=: 'exact' runs the blocked
    all-pairs oracle form, 'lsh' (default) the SRP-bucketed path, anything
    else raises — the r3 silent-semantics-change is now an explicit knob."""
    small = embeddings.limit(60)
    ex = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_near_duplicates(
            small, threshold=0.45, method="exact"
        ).collect()
    }
    default = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_near_duplicates(small, threshold=0.45).collect()
    }
    assert default <= ex  # LSH recall ≤ exact, precision exact-on-candidates
    with pytest.raises(ValueError, match="method"):
        dedup.embedding_near_duplicates(small, method="fuzzy")
    with pytest.raises(ValueError, match="method"):
        similarity.knn_join(small, small, method="fuzzy")


def test_ann_index_full_radius_is_exact(spark, embeddings, tmp_path):
    """The SRP index at its exact endpoint (max_hamming = n_planes: the
    hamming ball covers all 2^n signatures, so the probe reads the whole
    index): the result must equal brute-force cosine_topk, values AND
    order — the exactness contract the e09 oracle query relies on."""
    path = str(tmp_path / "ann_index_full")
    similarity.build_ann_index(embeddings, path, n_planes=8, seed=42, dim=64)
    q = list(embeddings.filter(F.col("vec_id") == 1).first().embedding)
    full = similarity.ann_topk_indexed(
        spark, path, q, k=10, n_planes=8, max_hamming=8, seed=42
    ).collect()
    brute = similarity.cosine_topk(embeddings, q, k=10).collect()
    key = lambda r: (r.id, r.cosine)  # noqa: E731
    assert [key(r) for r in full] == [key(r) for r in brute]


def test_knn_join_lsh_no_crossjoin_and_recall(spark, embeddings):
    small = embeddings.limit(100)
    out = similarity.knn_join_lsh(
        small, small, k=3, n_planes=8, probe_radius=4
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = out.collect()
    assert all(r.id_l != r.id_r for r in rows)
    by_left = {}
    for r in rows:
        by_left.setdefault(r.id_l, []).append(r)
    assert all(len(v) <= 3 for v in by_left.values())
    # recall vs the exact crossJoin k-NN: generous radius-4 ball on 8
    # planes should recover at least half the true neighbor pairs
    exact = similarity.knn_join_exact(small, small, k=3).collect()
    e = {(r.id_l, r.id_r) for r in exact}
    a = {(r.id_l, r.id_r) for r in rows}
    assert len(a & e) / len(e) >= 0.5


def test_ann_recall_against_exact(spark, embeddings):
    qrow = embeddings.filter(F.col("vec_id") == 1).first()
    q = list(qrow.embedding)
    exact = [r.id for r in similarity.cosine_topk(embeddings, q, k=10).collect()]
    approx = [
        r.id
        for r in similarity.ann_topk(
            embeddings, q, k=10, n_planes=8, max_hamming=4
        ).collect()
    ]
    # generous hamming → decent recall on 500 vectors; query itself always found
    assert 1 in approx
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, (exact, approx)


def test_unigram_lm_score(spark):
    """Vocabulary = top-V by (count desc, token asc); OOV = outside it;
    token-less docs drop; mean_prob_ppm is the exact integer ratio."""
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "rare zyx qwv tokens here"),
         (3, "   ")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.unigram_lm_score(df, vocab_size=3).collect()}
    # corpus: the=2, everything else 1 -> vocab = {the, cat, here} (ties
    # break alphabetically among count-1 tokens)
    assert set(out) == {1, 2}  # doc 3 has no tokens
    r1 = out[1]
    assert (r1.n_tokens, r1.n_oov) == (6, 3)  # sat/on/mat OOV
    # sum_c for doc 1 = the(2)+cat(1)+the(2) = 5; N = 11 tokens
    assert r1.mean_prob_ppm == round(5 * 1e6 / (11 * 6), 6)
    r2 = out[2]
    assert (r2.n_tokens, r2.n_oov) == (5, 4)  # only 'here' in vocab
    assert r2.oov_rate == 0.8


def test_ngram_lm_score_short_docs_drop(spark):
    """Docs with fewer than n tokens produce NO n-grams (the sequence()
    guard: Spark's sequence(1, 0) counts DOWN and would otherwise
    fabricate grams from a 1-token doc) and therefore no output row."""
    from da_transform_judgments_pipeline_spark.operators import text as t

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "alpha beta alpha beta"), (3, "  "), (4, None)],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in t.ngram_lm_score(df, n=2).collect()}
    assert set(out) == {2}
    # doc 2's bigrams: (alpha,beta) x2, (beta,alpha) x1 — all in-vocab
    assert out[2].n_tokens == 3 and out[2].n_oov == 0


def test_ngram_lm_score_n1_delegates_to_unigram(spark):
    from da_transform_judgments_pipeline_spark.operators import text as t

    df = spark.createDataFrame([(1, "a b a")], ["doc_id", "text"])
    a = t.ngram_lm_score(df, n=1).collect()
    b = t.unigram_lm_score(df).collect()
    assert a == b


def test_zipf_histogram_power_of_two_buckets(spark):
    """Bucket = exact integer msb: frequency 4 must land in bucket 2
    (a float log2 off by one ulp would misbucket it), frequency 1 in
    bucket 0, frequency 3 in bucket 1."""
    from da_transform_judgments_pipeline_spark.operators import text as t

    # corpus: 'a' x4, 'b' x3, 'c' x1, 'd' x1
    df = spark.createDataFrame(
        [(1, "a a a a b"), (2, "b b c d")], ["doc_id", "text"]
    )
    out = {
        r.freq_bucket: (r.n_types, r.n_occurrences)
        for r in t.zipf_histogram(df).collect()
    }
    assert out == {0: (2, 2), 1: (1, 3), 2: (1, 4)}


def test_duplicate_weights_sum_to_one_per_group(spark):
    """Every exact-duplicate group's weights sum to 1.0 (6-dp rounding
    aside); NULL text is its OWN group, distinct from empty string."""
    from da_transform_judgments_pipeline_spark.operators import dedup as dd

    df = spark.createDataFrame(
        [
            (1, "same"),
            (2, "same"),
            (3, "other"),
            (4, ""),
            (5, None),
            (6, None),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r.doc_id: (r.group_size, r.weight)
        for r in dd.duplicate_weights(df, ["text"], "doc_id").collect()
    }
    assert len(rows) == 6  # cardinality-preserving
    assert rows[1] == (2, 0.5) and rows[2] == (2, 0.5)
    assert rows[3] == (1, 1.0)
    assert rows[4] == (1, 1.0)  # '' alone — NOT merged with NULLs
    assert rows[5] == (2, 0.5) and rows[6] == (2, 0.5)


def test_containment_pairs_asymmetric(spark):
    """A short doc fully inside a long one scores containment 1.0 in the
    short→long direction and below threshold the other way; the
    hot-shingle cap drops boilerplate-only pairs."""
    from da_transform_judgments_pipeline_spark.operators import dedup as dd

    short = "alpha beta gamma delta epsilon"
    long_ = short + " zeta eta theta iota kappa " + "x y z w v u t s r q"
    df = spark.createDataFrame(
        [(1, short), (2, long_), (3, "completely different words here now")],
        ["doc_id", "text"],
    )
    out = {
        (r.id_a, r.id_b): r.containment
        for r in dd.containment_pairs(df, threshold=0.5).collect()
    }
    assert out[(1, 2)] == 1.0          # short fully contained in long
    assert (2, 1) not in out           # long not contained in short
    assert not any(3 in k for k in out)


def test_containment_hot_shingle_cap(spark):
    """max_shingle_df drops shingles shared by too many docs from the
    index: pairs that only share boilerplate disappear."""
    from da_transform_judgments_pipeline_spark.operators import dedup as dd

    boiler = "all rights reserved by owner"
    df = spark.createDataFrame(
        [(i, f"doc {i} unique words here {boiler}") for i in range(1, 6)],
        ["doc_id", "text"],
    )
    exact = dd.containment_pairs(df, threshold=0.3).count()
    capped = dd.containment_pairs(
        df, threshold=0.3, max_shingle_df=2
    ).count()
    assert exact > 0 and capped == 0


def test_normalize_text_nfc_and_controls(spark):
    """NFC composes e+combining-accent to é; control chars strip (tab/
    newline survive as whitespace → collapsed); NULL passes through."""
    from da_transform_judgments_pipeline_spark.operators import text as t

    decomposed = "caf" + "e" + "́"        # NFD-style café
    composed = "café"
    df = spark.createDataFrame(
        [
            (1, decomposed),
            (2, "a\x00b\x07c"),
            (3, "  spaced\tout\n\nwords  "),
            (4, None),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.text_norm for r in t.normalize_text(df).collect()}
    assert out[1] == composed
    assert out[2] == "abc"
    assert out[3] == "spaced out words"
    assert out[4] is None


def test_embedding_lsh_pruned_regime_recall_and_pruning(spark):
    """e05b contract: the pruned SRP config (threshold 0.9, 16 planes,
    sigmas=1 → radius 4) must (a) find planted near-duplicates at cosine
    ≈0.99 among random noise vectors, and (b) actually prune — the
    measured candidate fraction stays an order of magnitude under the
    86%-ball 8-plane demo config."""
    import numpy as np

    from da_transform_judgments_pipeline_spark.operators import dedup

    rng = np.random.RandomState(3)
    mat = rng.randn(200, 64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    planted = []
    for i in range(5):
        j = 100 + i
        v = mat[i] + 0.05 * rng.randn(64)
        mat[j] = v / np.linalg.norm(v)
        planted.append((i, j))
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(200)],
        ["vec_id", "embedding"],
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_near_duplicates_lsh(
            df, threshold=0.9, n_planes=16, sigmas=1.0, dim=64
        ).collect()
    }
    dedup.release_cached()
    for p in planted:
        assert p in pairs, f"planted near-dup {p} missed by pruned config"

    stats = dedup.embedding_lsh_candidate_stats(
        df, threshold=0.9, n_planes=16, sigmas=1.0, dim=64
    )
    dedup.release_cached()
    assert stats["radius"] == 4 and stats["ball_buckets"] == 2517
    assert stats["candidate_fraction"] < 0.10, stats
    # every surviving pair must also be a candidate-verified true pair
    assert all(a < b for a, b in pairs)


def test_ngram_jaccard_hot_shingle_cap_and_audit(spark):
    """d02's max_shingle_df (ported from containment_pairs): boilerplate
    shingles leave the index, so boilerplate-only pairs disappear while
    genuinely-similar pairs survive; hot_shingles reports exactly what a
    cap drops, hottest first."""
    from da_transform_judgments_pipeline_spark.operators import dedup as dd

    boiler = "all rights reserved by owner"
    rows = [(i, f"doc number {i} entirely unique {boiler}") for i in range(1, 6)]
    # one genuinely near-duplicate pair sharing non-boilerplate content
    rows += [
        (10, "the quick brown fox jumps over the lazy dog today"),
        (11, "the quick brown fox jumps over the lazy dog tonight"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    exact = {
        (r.id_a, r.id_b)
        for r in dd.ngram_jaccard_pairs(df, threshold=0.3).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in dd.ngram_jaccard_pairs(
            df, threshold=0.3, max_shingle_df=2
        ).collect()
    }
    assert (10, 11) in exact and (10, 11) in capped
    assert any(a < 6 and b < 6 for a, b in exact)       # boilerplate pairs
    assert not any(a < 6 and b < 6 for a, b in capped)  # ...dropped by cap

    audit = dd.hot_shingles(df, max_shingle_df=2).collect()
    assert audit and audit[0]["df"] == 5  # the 5-doc boilerplate shingles
    assert all(r["df"] > 2 for r in audit)
    dd.release_cached()


def _ref_bpe_train(texts, n_merges, min_pair_count=2):
    """Independent pure-Python Sennrich BPE trainer (word-frequency
    formulation, greedy leftmost non-overlapping merge, count-desc then
    lexicographic tie-break) — the differential model for bpe_train."""
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in t.split():
            vocab[w] += 1
    words = {w: list(w) + ["</w>"] for w in vocab}
    merges = []
    for rank in range(1, n_merges + 1):
        counts = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += vocab[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), c = best
        if c < min_pair_count:
            break
        merges.append(
            {"rank": rank, "left": left, "right": right, "pair_count": c}
        )
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def test_bpe_train_matches_reference_trainer(spark):
    """Differential contract: the distributed trainer's merge SEQUENCE
    (rank, pair, count) must exactly equal the pure-Python reference on
    the same corpus — including tie-breaks and the min-count early stop —
    and bpe_segment's per-doc token counts must match re-segmenting with
    the reference's merges."""
    from da_transform_judgments_pipeline_spark.operators import text as t

    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "widest wide wider new low",
        "the the the lowering widens",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], ["doc_id", "text"]
    )
    got = t.bpe_train(df, n_merges=12)
    want = _ref_bpe_train(texts, 12)
    assert got == want, (got, want)
    assert len(got) >= 8  # the corpus genuinely supports many merges

    # segmentation token counts agree with a reference re-segmentation
    def ref_count(s, merges):
        n = 0
        for w in s.split():
            syms = list(w) + ["</w>"]
            for m in merges:
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == m["left"]
                        and syms[i + 1] == m["right"]
                    ):
                        out.append(m["left"] + m["right"])
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            n += len(syms)
        return n

    seg = {
        r["doc_id"]: (r["n_bpe_tokens"], r["n_words"])
        for r in t.bpe_segment(df, got).collect()
    }
    for i, s in enumerate(texts):
        assert seg[i] == (ref_count(s, want), len(s.split())), i


def test_bpe_train_early_stop_and_empty(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    # every pair unique → below min_pair_count=2 → no merges learned
    assert t_bpe(df) == []


def t_bpe(df):
    from da_transform_judgments_pipeline_spark.operators import text as t

    return t.bpe_train(df, n_merges=5)


def test_token_budget_sample_mixture_calibration(spark):
    """Per-source token yields land near weight_s x budget (hash sampling
    is binomial — 3sigma tolerance); a source whose availability is under
    its target is taken WHOLE; unlisted sources are dropped; the sample
    is a pure function of keys (re-run identical)."""
    import numpy as np

    from da_transform_judgments_pipeline_spark.operators import text as t

    rng = np.random.RandomState(13)
    rows = []
    did = 0
    for src, n_docs in (("a", 400), ("b", 400), ("tiny", 5)):
        for _ in range(n_docs):
            n_words = 10 + int(rng.randint(0, 20))
            rows.append((did, src, " ".join(f"w{did}x{j}" for j in range(n_words))))
            did += 1
    rows.append((did, "unlisted", "should never appear"))
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])

    weights = {"a": 3.0, "b": 1.0, "tiny": 1.0}
    budget = 8000
    out = t.token_budget_sample(df, weights, budget).collect()
    assert all(r["source"] != "unlisted" for r in out)

    got = {}
    for r in out:
        got[r["source"]] = got.get(r["source"], 0) + r["n_tokens"]
    wsum = sum(weights.values())
    for src in ("a", "b"):
        target = weights[src] / wsum * budget
        # binomial std ≈ sqrt(target · mean_doc_tokens); 3σ with ~20-token docs
        assert abs(got[src] - target) < 3 * (target * 20) ** 0.5, (src, got)
    # tiny's availability (~5·20 tokens) is far below its 1600-token
    # target → every tiny doc kept
    assert sum(1 for r in out if r["source"] == "tiny") == 5

    again = t.token_budget_sample(df, weights, budget).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(
        r["doc_id"] for r in out
    )


def test_epoch_order_is_permutation_and_epoch_dependent(spark):
    """Epoch keys induce a full deterministic permutation (no collisions
    at realistic scale — 16 hex chars), different epochs give different
    orders, same epoch re-derives identically."""
    from da_transform_judgments_pipeline_spark.operators import text as t

    df = spark.createDataFrame(
        [(i,) for i in range(300)], ["doc_id"]
    )
    rows = df.select(
        "doc_id",
        t.epoch_order_key(1).alias("k1"),
        t.epoch_order_key(2).alias("k2"),
    ).collect()
    k1 = [r["k1"] for r in rows]
    k2 = [r["k2"] for r in rows]
    assert len(set(k1)) == 300 and len(set(k2)) == 300  # injective
    order1 = [r["doc_id"] for r in sorted(rows, key=lambda r: r["k1"])]
    order2 = [r["doc_id"] for r in sorted(rows, key=lambda r: r["k2"])]
    assert sorted(order1) == list(range(300))  # a true permutation
    assert order1 != order2                    # epochs reshuffle
    again = {
        r["doc_id"]: r["k"]
        for r in df.select(
            "doc_id", t.epoch_order_key(1).alias("k")
        ).collect()
    }
    assert all(again[r["doc_id"]] == r["k1"] for r in rows)


def test_bpe_train_hybrid_paths_identical(spark):
    """The driver-side merge loop (default when the vocab fits) and the
    distributed fallback (max_driver_vocab=0) must learn the EXACT same
    merge sequence — counts, ranks, and tie-breaks included."""
    from da_transform_judgments_pipeline_spark.operators import text as t

    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "widest wide wider new low",
        "the the the lowering widens",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], ["doc_id", "text"]
    )
    driver = t.bpe_train(df, n_merges=20)
    distributed = t.bpe_train(df, n_merges=20, max_driver_vocab=0)
    assert driver == distributed
    assert driver == _ref_bpe_train(texts, 20)


def test_bpe_train_production_merge_count(spark):
    """n_merges=1000 under the same exact differential contract (the
    production-scale 'done' bar): a deterministic 400-word corpus rich
    enough to support >=1000 merges, trained via the hybrid driver loop,
    must match the independent pure-Python trainer merge-for-merge."""
    from da_transform_judgments_pipeline_spark.operators import text as t

    import numpy as np

    rs = np.random.RandomState(42)
    alphabet = list("abcdefghijklmnopqrstuvwxyz")
    words = []
    for i in range(600):
        # 12-char seeded-random word (distinct w.h.p., little prefix
        # sharing); each repeated >=2 so every intra-word pair clears
        # min_pair_count — the corpus supports thousands of merges
        w = "".join(rs.choice(alphabet, 12))
        words.extend([w] * (2 + i % 3))
    texts = [" ".join(words[i::8]) for i in range(8)]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], ["doc_id", "text"]
    )
    got = t.bpe_train(df, n_merges=1000, min_pair_count=2)
    want = _ref_bpe_train(texts, 1000, min_pair_count=2)
    assert len(got) >= 1000, len(got)
    assert got == want


def test_bpe_segment_ranked_matches_fold_path(spark):
    """The O(1)-plan ranked segmenter must produce exactly the fold
    path's output (same (n_bpe_tokens, n_words) per doc) — the min-rank-
    present loop is equivalent to replaying merges in training order."""
    from da_transform_judgments_pipeline_spark.operators import text as t

    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "widest wide wider new low",
        "the the the lowering widens",
        "unseen wording lowers newest widest",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], ["doc_id", "text"]
    )
    merges = t.bpe_train(df, n_merges=30)
    fold = {
        r["doc_id"]: (r["n_bpe_tokens"], r["n_words"])
        for r in t.bpe_segment(df, merges).collect()
    }
    ranked = {
        r["doc_id"]: (r["n_bpe_tokens"], r["n_words"])
        for r in t.bpe_segment_ranked(df, merges).collect()
    }
    assert ranked == fold


def test_bpe_segment_ranked_production_table(spark):
    """Segmentation with a 1000-merge table (where the fold path's plan
    would be infeasible): the ranked segmenter's per-doc token counts
    must match a pure-Python sequential replay of the same merges."""
    import numpy as np

    from da_transform_judgments_pipeline_spark.operators import text as t

    rs = np.random.RandomState(7)
    alphabet = list("abcdefghijklmnopqrstuvwxyz")
    vocab_words = ["".join(rs.choice(alphabet, 12)) for _ in range(500)]
    words = [w for i, w in enumerate(vocab_words) for _ in range(2 + i % 3)]
    texts = [" ".join(words[i::6]) for i in range(6)]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], ["doc_id", "text"]
    )
    merges = t.bpe_train(df, n_merges=1000)
    assert len(merges) >= 1000

    def replay_count(s):
        n = 0
        for w in s.split():
            syms = list(w) + ["</w>"]
            for m in merges:
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == m["left"]
                        and syms[i + 1] == m["right"]
                    ):
                        out.append(m["left"] + m["right"])
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            n += len(syms)
        return n

    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in t.bpe_segment_ranked(df, merges).collect()
    }
    for i, s in enumerate(texts):
        assert got[i] == replay_count(s), i


def test_bpe_encode_ids_round_trip(spark):
    """Token-ID encoding closes the tokenizer path: ids decode back
    through the inverted vocab to exactly the segmentation the ranked
    segmenter produces, counts agree with both segmenters, ids preserve
    document word order, and an unseen character encodes as -1 (explicit
    OOV, never silent)."""
    from da_transform_judgments_pipeline_spark.operators import text as t

    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "widest wide wider new low",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], ["doc_id", "text"]
    )
    merges = t.bpe_train(df, n_merges=20)
    vocab = t.bpe_vocab(df, merges)
    # layout: base chars sorted, then merges in rank order
    base = sorted({c for s in texts for c in s if c != " "})
    assert [s for s, _ in sorted(vocab.items(), key=lambda kv: kv[1])][
        : len(base)
    ] == base
    assert vocab["</w>"] == len(base)
    for j, m in enumerate(merges):
        assert vocab[m["left"] + m["right"]] == len(base) + 1 + j

    enc = {r["doc_id"]: r for r in t.bpe_encode_ids(df, merges, vocab).collect()}
    seg = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in t.bpe_segment_ranked(df, merges).collect()
    }
    inv = {v: k for k, v in vocab.items()}
    for i, s in enumerate(texts):
        ids = enc[i]["ids"]
        assert enc[i]["n_tokens"] == len(ids) == seg[i]
        assert all(v >= 0 for v in ids)  # no OOV on the training corpus
        # decode: concatenating tokens (stripping </w>) rebuilds the text
        rebuilt = "".join(inv[v] for v in ids).replace("</w>", " ").strip()
        assert rebuilt == " ".join(s.split())

    # unseen character at encode time -> explicit -1
    oov = spark.createDataFrame([(9, "low zebra!")], ["doc_id", "text"])
    row = t.bpe_encode_ids(oov, merges, vocab).collect()[0]
    assert -1 in row["ids"]
    assert row["n_tokens"] == len(row["ids"])


def test_substring_dedup_semantics(spark):
    """ExactSubstr-style window dedup: a copied passage is cut from every
    occurrence except the global first (min (doc_id, start)), including
    self-repetition inside one document; short docs pass through; token
    accounting is exact."""
    from da_transform_judgments_pipeline_spark.operators import text as t

    common = " ".join(f"c{i}" for i in range(25))
    df = spark.createDataFrame(
        [
            (1, "a1 a2 a3 " + common + " a4 a5"),
            (2, "b1 b2 " + common + " b3"),
            (3, "short doc here"),
            (4, common + " " + common),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in t.substring_dedup(df, window_tokens=20).collect()
    }
    assert out[1]["n_removed"] == 0  # first occurrence survives verbatim
    assert out[1]["text_deduped"].startswith("a1 a2 a3 c0")
    assert out[2]["n_removed"] == 25  # exactly the copied passage
    assert out[2]["text_deduped"] == "b1 b2 b3"
    assert out[3]["n_removed"] == 0 and out[3]["n_tokens"] == 3
    assert out[4]["n_removed"] == 50  # both copies lose to doc 1
    assert out[4]["text_deduped"] == ""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="window_tokens"):
        t.substring_dedup(df, window_tokens=1)


def test_contrastive_score_ranks_target_like_docs(spark):
    """DSIR-shaped selection signal on a controlled corpus: a raw doc
    made of target-domain bigrams must out-lift a raw doc of
    raw-domain bigrams; integer accounting is exact; short docs drop."""
    from da_transform_judgments_pipeline_spark.operators import text as t

    target = "legal judgment court appeal ruling judge"
    other = "cooking recipe flour sugar butter oven"
    df = spark.createDataFrame(
        [
            (1, target, "tgt"),
            (2, target + " extra words here", "tgt"),
            (3, "legal judgment court appeal", "raw"),   # target-like
            (4, "cooking recipe flour sugar", "raw"),    # raw-like
            (5, other, "raw"),
            (6, "x", "raw"),                             # <2 tokens: drops
        ],
        ["doc_id", "text", "source"],
    )
    out = {
        r["doc_id"]: r
        for r in t.contrastive_score(
            df, "tgt", source_col="source", n=2
        ).collect()
    }
    assert 6 not in out  # no bigrams, no signal
    assert out[3]["lift_milli"] > out[4]["lift_milli"]
    assert out[3]["target_ppm"] > out[4]["target_ppm"]
    assert out[4]["raw_ppm"] > out[3]["raw_ppm"]
    # exact gram accounting: doc 3 has 3 bigrams
    assert out[3]["n_grams"] == 3
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n must be"):
        t.contrastive_score(df, "tgt", n=0)


def test_contrastive_score_degenerate_corpus_raises(spark):
    """T==0 (no target grams) and R==0 (no raw grams) must fail loud at
    evaluation via the in-plan assert_true, not emit silent NULL/inf
    scores that diverge between Spark (NULL on /0) and DuckDB (inf)."""
    from da_transform_judgments_pipeline_spark.operators import text as t

    all_raw = spark.createDataFrame(
        [(1, "alpha beta gamma", "raw"), (2, "delta eps zeta", "raw")],
        ["doc_id", "text", "source"],
    )
    with pytest.raises(Exception, match="degenerate corpus"):
        t.contrastive_score(all_raw, "tgt").collect()
    all_tgt = all_raw.withColumn("source", F.lit("tgt"))
    with pytest.raises(Exception, match="degenerate corpus"):
        t.contrastive_score(all_tgt, "tgt").collect()
    # a target doc that is too short to produce grams is degenerate too
    short_tgt = spark.createDataFrame(
        [(1, "solo", "tgt"), (2, "alpha beta gamma", "raw")],
        ["doc_id", "text", "source"],
    )
    with pytest.raises(Exception, match="degenerate corpus"):
        t.contrastive_score(short_tgt, "tgt").collect()


def test_incremental_substring_dedup_two_wave_growth(spark, tmp_path):
    """The ExactSubstr incremental lifecycle (build → incremental →
    append → incremental): with waves in id order, each wave's
    incremental decisions must equal the full-corpus substring_dedup
    restricted to that wave — and the index join must add ZERO
    corpus-side Exchanges (the bucketed table pre-pays the shuffle)."""
    from da_transform_judgments_pipeline_spark.operators.scale import (
        exchange_count,
    )

    passage = " ".join(f"c{j}" for j in range(8))  # the shared substring

    def doc(i, copy=False):
        own = " ".join(f"w{i}x{j}" for j in range(8))
        return f"{own} {passage}" if copy else f"{own} {own}x"

    wave1 = [(i, doc(i, copy=(i == 2))) for i in range(0, 6)]
    wave2 = [(10, doc(10, copy=True)), (11, doc(11))]
    wave3 = [(20, doc(20, copy=True)), (21, doc(2, copy=True))]
    mk = lambda rows: spark.createDataFrame(rows, ["doc_id", "text"])

    table = "ss_idx_testinc"
    L = 8
    try:
        text.build_substring_index(
            mk(wave1), table, window_tokens=L,
            path=str(tmp_path / "ssidx"), buckets=4,
        )

        def full_restricted(rows, ids):
            out = text.substring_dedup(mk(rows), window_tokens=L)
            return sorted(
                tuple(r) for r in out.collect() if r["doc_id"] in ids
            )

        inc2 = text.incremental_substring_dedup(
            mk(wave2), spark, table, window_tokens=L
        )
        got2 = sorted(tuple(r) for r in inc2.collect())
        assert got2 == full_restricted(wave1 + wave2, {10, 11})
        # doc 10 copied the wave1 passage → tokens removed
        rem = {r[0]: r[3] for r in got2}
        assert rem[10] > 0 and rem[11] == 0

        text.append_to_substring_index(mk(wave2), table, window_tokens=L)
        inc3 = text.incremental_substring_dedup(
            mk(wave3), spark, table, window_tokens=L
        )
        got3 = sorted(tuple(r) for r in inc3.collect())
        assert got3 == full_restricted(wave1 + wave2 + wave3, {20, 21})
        rem3 = {r[0]: r[3] for r in got3}
        assert rem3[20] > 0 and rem3[21] > 0  # 21 duplicates doc 2's text

        # the exchange budget: with broadcast disabled (at corpus scale
        # the index can never broadcast), the bucketed index must join
        # with ZERO index-side Exchange — an UNBUCKETED copy of the same
        # owners pays exactly one more
        spark.table(table).write.mode("overwrite").saveAsTable(
            f"{table}_flat"
        )
        saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            n_bucketed = exchange_count(
                text.incremental_substring_dedup(
                    mk(wave2), spark, table, window_tokens=L
                )
            )
            n_flat = exchange_count(
                text.incremental_substring_dedup(
                    mk(wave2), spark, f"{table}_flat", window_tokens=L
                )
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        # bucketed: 5 exchanges, all batch-side (windows shuffling INTO
        # the index bucketing, ownership agg, union re-key, reassembly
        # join + final sort); flat twin: 8 — the index side must shuffle
        # for the lookup join AND the h-keyed ownership stages lose the
        # inherited bucket partitioning. The gap is what the bucketed
        # index pre-pays; the absolute pin catches a corpus-side
        # Exchange sneaking back in.
        assert n_bucketed == 5
        assert n_flat == 8
    finally:
        spark.sql(f"DROP TABLE IF EXISTS ss_idx_testinc")
        spark.sql(f"DROP TABLE IF EXISTS ss_idx_testinc_flat")
        dedup.release_cached()


def test_incremental_substring_dedup_within_batch_first_kept(spark, tmp_path):
    """A batch-internal duplicate with NO corpus hit still dedups by the
    keep-first rule, and the index stays one-row-per-hash after append
    (a duplicated index row would multiply the lookup join)."""
    base = " ".join(f"z{j}" for j in range(8))
    corpus = spark.createDataFrame(
        [(1, " ".join(f"a{j}" for j in range(10)))], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [(5, base + " five"), (6, base + " six")], ["doc_id", "text"]
    )
    table = "ss_idx_testwb"
    try:
        text.build_substring_index(
            corpus, table, window_tokens=8,
            path=str(tmp_path / "ssidx2"), buckets=4,
        )
        out = {
            r["doc_id"]: r
            for r in text.incremental_substring_dedup(
                batch, spark, table, window_tokens=8
            ).collect()
        }
        assert out[5]["n_removed"] == 0          # batch-first occurrence
        assert out[6]["n_removed"] == 8          # loses the shared window
        text.append_to_substring_index(batch, table, window_tokens=8)
        text.append_to_substring_index(batch, table, window_tokens=8)
        counts = (
            spark.table(table).groupBy("h").count()
            .filter(F.col("count") > 1).count()
        )
        assert counts == 0  # anti-join keeps it one-row-per-hash
    finally:
        spark.sql("DROP TABLE IF EXISTS ss_idx_testwb")
        dedup.release_cached()


def test_contrastive_score_guard_survives_column_pruning(spark):
    """The degenerate-corpus guard is threaded through BOTH totals:
    selecting only raw_ppm (divides by R) on an all-target corpus, or
    only target_ppm (divides by T) on an all-raw corpus, must still
    raise — Catalyst prunes the unused total, and a guard attached to
    only one of them would vanish with it, yielding silent NaN."""
    from da_transform_judgments_pipeline_spark.operators import text as t

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", "tgt"), (2, "delta eps zeta", "tgt")],
        ["doc_id", "text", "source"],
    )
    with pytest.raises(Exception, match="degenerate corpus"):
        t.contrastive_score(docs, "tgt").select(
            "doc_id", "raw_ppm"
        ).collect()
    all_raw = docs.withColumn("source", F.lit("raw"))
    with pytest.raises(Exception, match="degenerate corpus"):
        t.contrastive_score(all_raw, "tgt").select(
            "doc_id", "target_ppm"
        ).collect()


def test_ngram_repetition_suite_closed_form(spark):
    """Handcrafted docs with hand-computed Gopher fractions: top-gram
    coverage (with the lexicographic tie-break), duplicated-gram
    coverage (occurrence-counting — may exceed 1), and the zero cases
    (short doc, empty doc)."""
    from da_transform_judgments_pipeline_spark.operators.text import (
        ngram_repetition_suite,
    )

    df = spark.createDataFrame(
        [
            # tokens: a b a b a b x → joined "a b a b a b x" (13 chars)
            # 2-grams: "a b"×3, "b a"×2, "b x"×1 → top covers 3·3 = 9
            (1, "a b a b a b x"),
            # tie between "x y"×1 and "y x"×1... all 2-grams distinct
            # counts: doc with tie at count 2: "p q p q" → "p q"×2,
            # "q p"×1 → no tie; craft tie: "u v w u v" →
            # "u v"×2, "v w"×1, "w u"×1 → top = "u v" (4 chars? 3)×2=6
            (2, "u v w u v"),
            # dup 5-grams: 10 tokens repeated once → doc of 20 tokens:
            # every 5-gram window that re-occurs counts all occurrences
            (3, " ".join(["t%d" % i for i in range(10)] * 2)),
            (4, "short doc"),  # one 2-gram, nothing duplicated, no 5-gram
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in ngram_repetition_suite(df).collect()
    }
    assert out[1]["top2_char_frac"] == round(9 / 13, 6)
    assert out[2]["top2_char_frac"] == round(6 / 9, 6)
    # doc 3: tokens t0..t9 t0..t9 (20 two-char tokens) → joined text
    # 20·2+19 = 59 chars. 5-gram windows i = 0..15: w_i == w_{i+10}
    # for i = 0..5 (w5 = t5..t9 = w15), windows 6..9 cross the seam
    # uniquely → 6 duplicated grams × 2 occurrences = 12 occurrences,
    # each gram 5·2+4 = 14 chars.
    assert out[3]["dup5_char_frac"] == round(12 * 14 / 59, 6)
    # occurrence-counting can exceed 1 by design on heavy repeats
    assert out[3]["dup6_char_frac"] > 0
    assert out[4]["top2_char_frac"] == round(9 / 9, 6)  # its only 2-gram
    assert out[4]["dup5_char_frac"] == 0.0
    for col in ("top2_char_frac", "top3_char_frac", "dup5_char_frac",
                "dup10_char_frac"):
        assert out[5][col] == 0.0


def test_ngram_dup_union_fractions_closed_form(spark):
    """The positional-union Gopher fractions against hand-computed
    values — including the heavy-overlap doc where the occurrence-
    counting proxy would overshoot (union is capped at 1.0 by
    construction) and the full-repeat doc where the union covers the
    WHOLE stream."""
    from da_transform_judgments_pipeline_spark.operators.text import (
        ngram_dup_union_fractions,
        ngram_repetition_suite,
    )

    df = spark.createDataFrame(
        [
            # 10 distinct tokens repeated once (t0..t9 t0..t9, 59 chars
            # joined). Duplicated 5-grams start at i=0..5 and i=10..15;
            # they cover token positions 0..9 ∪ 10..19 = ALL 20 tokens
            # (40 chars) and all spaces except the SEAM space between
            # tokens 9 and 10 (no duplicated occurrence spans it: that
            # would need a flagged i in 6..9) → union = 58/59
            (1, " ".join(["t%d" % i for i in range(10)] * 2)),
            # heavy overlap: 'z'×8 + distinct tail of 8 tokens.
            # 5-grams: 'z z z z z' occurs 4× (i=0..3) → union covers
            # tokens 0..7 (the 8 z's) + 7 spaces = 8 + 7 = 15 chars.
            # tail tokens are 2-char ('a0'..'a7'): joined total =
            # 8·1+8·2+15 spaces = 39. union_frac5 = 15/39.
            (2, "z z z z z z z z " + " ".join("a%d" % i for i in range(8))),
            (3, "no repeats here at all"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           ngram_dup_union_fractions(df).collect()}
    assert out[1]["dup5_union_frac"] == round(58 / 59, 6)
    assert out[2]["dup5_union_frac"] == round(15 / 39, 6)
    assert out[2]["dup10_union_frac"] == 0.0  # no duplicated 10-gram
    assert out[3]["dup5_union_frac"] == 0.0
    assert out[4]["dup5_union_frac"] == 0.0
    # the documented divergence: on the overlap doc the occurrence-
    # counting proxy exceeds the union (4 occ × 9 chars = 36 vs 15)
    proxy = {r["doc_id"]: r for r in ngram_repetition_suite(df).collect()}
    assert proxy[2]["dup5_char_frac"] == round(36 / 39, 6)
    assert proxy[2]["dup5_char_frac"] > out[2]["dup5_union_frac"]
    # union never exceeds 1 on any doc
    for r in out.values():
        for n in (5, 6, 7, 8, 9, 10):
            assert 0.0 <= r[f"dup{n}_union_frac"] <= 1.0


def test_mixture_epochs_budget_and_oversampling(spark):
    """r13 true-oversampling mixture plan: per weighted source the
    mixed mass sum(n_copies * n_tokens) lands in [target, target +
    max_doc) (budget met, never undershot); a source smaller than its
    target gets FULL passes for every doc; unweighted sources drop;
    determinism across partitionings."""
    from da_transform_judgments_pipeline_spark.operators.text import (
        mixture_epochs,
    )

    rows = [
        (i, "big" if i < 40 else ("small" if i < 48 else "junk"),
         "tok " * ((i % 7) + 3))
        for i in range(56)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    weights = {"big": 1.0, "small": 3.0}
    budget = 400
    out = mixture_epochs(df, weights, budget).collect()
    assert {r["source"] for r in out} == {"big", "small"}  # junk dropped
    avail = {"big": sum((i % 7) + 3 for i in range(40)),
             "small": sum((i % 7) + 3 for i in range(40, 48))}
    for s, w in weights.items():
        target = int(budget * w / 4.0)
        mass = sum(r["n_copies"] * r["n_tokens"] for r in out
                   if r["source"] == s)
        max_doc = max(r["n_tokens"] for r in out if r["source"] == s)
        assert target <= mass < target + max_doc, (s, target, mass)
        full = target // avail[s]
        assert all(r["n_copies"] >= full for r in out
                   if r["source"] == s), s
    # 'small' is oversampled (target 300 >> avail ~48): full passes > 1
    assert min(r["n_copies"] for r in out if r["source"] == "small") >= 6
    # partitioning-independent
    out2 = mixture_epochs(df.repartition(7), weights, budget).collect()
    assert sorted((r["doc_id"], r["n_copies"]) for r in out) == sorted(
        (r["doc_id"], r["n_copies"]) for r in out2
    )


def test_html_page_directives(spark):
    """r13 page-level crawl directives: canonical link extraction
    handles both attribute orders and all quote shells, first
    declaration wins, meta robots folds case and whitespace, absence
    is NULL."""
    from da_transform_judgments_pipeline_spark.operators.text import (
        html_canonical_link,
        html_meta_robots,
    )

    cases = [
        ('<link rel="canonical" href="https://a/x">', "https://a/x", None),
        ("<link href='/y' rel='canonical'>", "/y", None),
        ("<LINK REL=canonical HREF=https://b/z>", "https://b/z", None),
        # first canonical wins over a second declaration
        ('<link rel="canonical" href="/one">'
         '<link rel="canonical" href="/two">', "/one", None),
        # rel=stylesheet link must NOT match
        ('<link rel="stylesheet" href="/s.css">', None, None),
        ('<meta name="robots" content="NOINDEX, nofollow">',
         None, "noindex,nofollow"),
        ("<meta content='index' name=robots>", None, "index"),
        # name=viewport etc must NOT match
        ('<meta name="viewport" content="width=1">', None, None),
        ("<p>no head stuff</p>", None, None),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _, _) in enumerate(cases)], "i int, h string"
    )
    rows = {
        r["i"]: r
        for r in df.select(
            "i",
            html_canonical_link("h").alias("c"),
            html_meta_robots("h").alias("r"),
        ).collect()
    }
    for i, (_, want_c, want_r) in enumerate(cases):
        assert rows[i]["c"] == want_c, (i, rows[i]["c"], want_c)
        assert rows[i]["r"] == want_r, (i, rows[i]["r"], want_r)


def test_decode_payloads_charsets(spark):
    """r13 charset-aware intake: BOM > Content-Type charset > <meta
    charset> > UTF-8; Windows-1252 decodes its C1 range as the REAL
    cp1252 printables (not Latin-1 control chars); bare utf-16 without
    a BOM is LE; odd-length utf-16 falls back to the raw cast instead
    of raising; unknown names fall back to UTF-8."""
    from da_transform_judgments_pipeline_spark.operators.text import (
        decode_payloads,
    )

    s = "Résumé №7 — §2"
    cases = [
        # (payload, mime, want_charset, want_text)
        (s.encode("utf-8"), "text/html; charset=utf-8", "utf-8", s),
        ("Résumé °7".encode("latin-1"),
         'text/html; charset="ISO-8859-1"', "iso-8859-1", "Résumé °7"),
        ("price €9 — 'ok'™".encode("cp1252"),
         "text/html; charset=windows-1252", "windows-1252",
         "price €9 — 'ok'™"),
        (b"\xff\xfe" + s.encode("utf-16-le"), "text/html",
         "utf-16le", s),
        (b"\xfe\xff" + s.encode("utf-16-be"), "text/html",
         "utf-16be", s),
        # BOM beats a lying Content-Type
        (b"\xef\xbb\xbf" + s.encode("utf-8"),
         "text/html; charset=utf-16le", "utf-8", s),
        # meta prescan when the Content-Type is silent
        (('<html><head><meta charset="iso-8859-1"></head><body>é'
          ).encode("latin-1"), "text/html", "iso-8859-1",
         '<html><head><meta charset="iso-8859-1"></head><body>é'),
        # bare utf-16 declaration, no BOM -> LE (the HTML5 rule)
        (s.encode("utf-16-le"), "text/html; charset=utf-16",
         "utf-16le", s),
        # unknown charset name -> utf-8 fallback
        (s.encode("utf-8"), "text/html; charset=x-mystery", "utf-8", s),
        # structurally malformed utf-16 (odd length) -> raw cast
        (b"A\x00B", "text/html; charset=utf-16le", "utf-16le", None),
        (None, None, "utf-8", None),  # NULL payload stays NULL
    ]
    df = spark.createDataFrame(
        [(i, bytearray(p) if p is not None else None, m)
         for i, (p, m, _, _) in enumerate(cases)],
        "i int, payload binary, mime string",
    )
    rows = {r["i"]: r for r in decode_payloads(df).collect()}
    for i, (_, _, want_cs, want_text) in enumerate(cases):
        if cases[i][0] is not None:
            assert rows[i]["charset"] == want_cs, (i, rows[i]["charset"])
        if want_text is not None:
            assert rows[i]["text"] == want_text, (i, rows[i]["text"])
    assert rows[10]["text"] is None
    assert rows[9]["text"] is not None  # odd utf-16: raw cast, no raise


def test_decode_payloads_unpaired_surrogates_degrade(spark):
    """r14 (per r13 ADVICE): under Spark 4 ANSI, F.decode raises on
    malformed UTF-16 — an even-length payload with an UNPAIRED
    surrogate behind a lying charset=utf-16 header would fail a whole
    foreachBatch batch forever. decode_payloads must instead fall back
    to the raw cast for such bodies (both endiannesses, every lone-
    surrogate position) while VALID astral pairs still decode."""
    from da_transform_judgments_pipeline_spark.operators.text import (
        decode_payloads,
    )

    cases = [
        # (payload, mime, decodes_cleanly, want_text_if_clean)
        ("a\U0001F600b".encode("utf-16-le"),
         "text/html; charset=utf-16", True, "a\U0001F600b"),
        ("x\U0001F600".encode("utf-16-be"),
         "text/html; charset=utf-16be", True, "x\U0001F600"),
        # lone high surrogate at end / mid; lone low at start / mid
        (b"a\x00\x00\xd8", "text/html; charset=utf-16", False, None),
        (b"a\x00\x00\xd8b\x00", "text/html; charset=utf-16",
         False, None),
        (b"\x00\xdca\x00", "text/html; charset=utf-16", False, None),
        (b"a\x00\x00\xdcb\x00", "text/html; charset=utf-16",
         False, None),
        # a valid pair then a lone low: still malformed
        ("\U0001F600".encode("utf-16-le") + b"\x00\xdc",
         "text/html; charset=utf-16", False, None),
        (b"\xd8\x00\x00a", "text/html; charset=utf-16be", False, None),
        (b"\xdc\x00\x00a", "text/html; charset=utf-16be", False, None),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(p), m) for i, (p, m, _, _) in enumerate(cases)],
        "i int, payload binary, mime string",
    )
    rows = {r["i"]: r for r in decode_payloads(df).collect()}  # no raise
    for i, (_, _, clean, want) in enumerate(cases):
        assert rows[i]["text"] is not None, i
        if clean:
            assert rows[i]["text"] == want, (i, rows[i]["text"])
        else:  # raw cast: surrogate byte survives as replacement/junk,
            # never a decoded surrogate pair and never an exception
            assert "\U0001F600" not in rows[i]["text"], i


def test_fix_mojibake_planted_and_noop(spark):
    """fix_mojibake: planted cp1252 double-encodings repair to the
    original text (2- and 3-char digraphs, longest-first), clean
    accented text is untouched, the chain is idempotent, and the plan
    is pure map-side Catalyst (no Exchange, no Python)."""
    from da_transform_judgments_pipeline_spark.operators.text import (
        fix_mojibake,
        mojibake_table,
    )

    good = "Café déjà-vu — naïve ‘quoted’ € ± ß æ Ø"
    bad = good.encode("utf-8").decode("cp1252")
    assert bad != good and "Ã©" in bad and "â€”" in bad
    df = spark.createDataFrame(
        [(1, f"intro {bad} outro"), (2, f"clean {good} text"),
         (3, "plain ascii"), (4, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in fix_mojibake(df).collect()}
    assert out[1]["fixed"] == f"intro {good} outro"
    assert out[1]["had_mojibake"]
    assert out[1]["chars_recovered"] == len(bad) - len(good)
    assert out[2]["fixed"] == f"clean {good} text"
    assert not out[2]["had_mojibake"] and out[2]["chars_recovered"] == 0
    assert out[3]["fixed"] == "plain ascii"
    assert out[4]["fixed"] is None
    # idempotent: repairing repaired text changes nothing
    twice = fix_mojibake(
        fix_mojibake(df).select("doc_id", F.col("fixed").alias("text"))
    ).collect()
    assert all(r["chars_recovered"] in (0, None) for r in twice)
    # longest-first ordering is what makes 3-char digraphs win
    forms = [m for m, _ in mojibake_table()]
    assert sorted(forms, key=len, reverse=True)[0] == forms[0]
    plan = fix_mojibake(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan, plan


def test_split_assign_contamination_safety_and_calibration(spark):
    """split_assign: (a) rows sharing the key NEVER straddle splits —
    the leakage guarantee; (b) split sizes calibrate to the rates;
    (c) assignment is a pure function (rerun-identical) and salt
    derives an independent splitting; (d) bad rates are refused."""
    import pytest as _pytest

    from da_transform_judgments_pipeline_spark.operators.text import (
        split_assign,
    )

    df = spark.createDataFrame(
        [(i, f"fam{i % 400}") for i in range(2000)], "row_id long, fp string"
    )
    out = split_assign(df, ["fp"], {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = out.collect()
    by_fam = {}
    for r in rows:
        by_fam.setdefault(r["fp"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_fam.values())  # no straddling
    counts = {}
    for r in rows:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert 0.7 < counts["train"] / 2000 < 0.9
    assert counts.get("val", 0) > 0 and counts.get("test", 0) > 0
    again = {r["row_id"]: r["split"] for r in
             split_assign(df, ["fp"], {"train": 0.8, "val": 0.1,
                                       "test": 0.1}).collect()}
    assert all(again[r["row_id"]] == r["split"] for r in rows)
    salted = {r["row_id"]: r["split"] for r in
              split_assign(df, ["fp"], {"train": 0.8, "val": 0.1,
                                        "test": 0.1}, salt="v2").collect()}
    assert any(salted[r["row_id"]] != r["split"] for r in rows)
    with _pytest.raises(ValueError, match="sum to 1"):
        split_assign(df, ["fp"], {"train": 0.8, "val": 0.1})
    with _pytest.raises(ValueError, match="two splits"):
        split_assign(df, ["fp"], {"train": 1.0})
    # map-side: no Exchange in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_shard_plan_balance_and_determinism(spark):
    """shard_plan: every shard's token total stays under target + its
    largest document (the greedy bound), shards are contiguous from 0
    per source, sources never mix, and the plan is rerun-identical."""
    from da_transform_judgments_pipeline_spark.operators.text import (
        shard_plan,
    )

    rows = [
        (i, f"s{i % 3}", "w " * (5 + (i * 37) % 90)) for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    target = 200
    out = shard_plan(df, target_tokens=target).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault((r["source"], r["shard"]), []).append(
            r["n_tokens"]
        )
    max_doc = max(r["n_tokens"] for r in out)
    for (src, sh), toks in by_shard.items():
        assert sum(toks) < target + max(toks), (src, sh, sum(toks))
    for src in ("s0", "s1", "s2"):
        shards = sorted({sh for (s, sh) in by_shard if s == src})
        assert shards == list(range(len(shards)))
        # greedy fill bound: a non-final shard holds at least
        # target − (previous shard's overshoot) < target − max_doc
        for sh in shards[:-1]:
            assert sum(by_shard[(src, sh)]) > target - max_doc, (src, sh)
    again = shard_plan(df, target_tokens=target).collect()
    assert {(r["doc_id"], r["shard"]) for r in again} == {
        (r["doc_id"], r["shard"]) for r in out
    }
    import pytest as _pytest

    with _pytest.raises(ValueError, match="target_tokens"):
        shard_plan(df, target_tokens=0)


def test_line_repetition_stats_closed_form(spark):
    """Handcrafted duplicate-line docs: ratios match hand-computed
    values; a doc with no duplicated lines scores 0; token-less docs
    drop."""
    from da_transform_judgments_pipeline_spark.operators import text as t

    docs = spark.createDataFrame(
        [
            (1, "a b a b c d"),   # lines: "a b","a b","c d"
            (2, "x y z w"),       # lines: "x y","z w" — no dups
            (3, "   "),           # token-less → drops
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in t.line_repetition_stats(docs, line_tokens=2).collect()
    }
    assert set(rows) == {1, 2}
    r1 = rows[1]
    assert r1["n_lines"] == 3 and r1["n_distinct_lines"] == 2
    assert r1["dup_line_ratio"] == round(1 - 2 / 3, 6)
    # "a b" twice: 2*3 chars duplicated of 9 total line chars
    assert r1["dup_line_char_ratio"] == round(6 / 9, 6)
    r2 = rows[2]
    assert r2["dup_line_ratio"] == 0.0
    assert r2["dup_line_char_ratio"] == 0.0
    with pytest.raises(ValueError, match="line_tokens"):
        t.line_repetition_stats(docs, line_tokens=0)


def test_perplexity_buckets_balanced_and_ordered(spark):
    """CCNet bucketing invariants: within each group the tiles are
    balanced (sizes differ by at most 1, early tiles get extras), HEAD
    holds the highest-probability docs (every head score >= every tail
    score inside a group), and bucket names map 1→head / n→tail."""
    from da_transform_judgments_pipeline_spark.operators import text as t

    docs = spark.createDataFrame(
        [
            # src A: "common common ..." ranks above OOV-ish docs
            (i, ("common " * 5 + f"rare{i}") if i % 3 else "common " * 6,
             "A" if i < 20 else "B")
            for i in range(1, 35)
        ],
        ["doc_id", "text", "source"],
    )
    out = t.perplexity_buckets(docs, vocab_size=10).collect()
    assert {r["bucket"] for r in out} == {"head", "middle", "tail"}
    for g in ("A", "B"):
        grp = [r for r in out if r["source"] == g]
        sizes = [
            sum(1 for r in grp if r["bucket_no"] == b) for b in (1, 2, 3)
        ]
        assert max(sizes) - min(sizes) <= 1
        assert sizes == sorted(sizes, reverse=True)  # extras go early
        head = [r["mean_prob_ppm"] for r in grp if r["bucket"] == "head"]
        tail = [r["mean_prob_ppm"] for r in grp if r["bucket"] == "tail"]
        assert min(head) >= max(tail)
    with pytest.raises(ValueError, match="n_buckets"):
        t.perplexity_buckets(docs, n_buckets=1)
    # n_buckets=2: ends keep their names, no middle
    two = t.perplexity_buckets(docs, n_buckets=2, vocab_size=10).collect()
    assert {r["bucket"] for r in two} == {"head", "tail"}


def test_quantize_embeddings_rules(spark):
    """int8 quantization (round-12): q = floor(x/max|x|*127 + 0.5),
    dequant error bounded by scale/2, extremes hit ±127, the all-zero
    vector quantizes to zeros with scale 0 (no ANSI divide-by-zero),
    and invalid bit widths are typed errors."""
    import pytest as _pytest

    from da_transform_judgments_pipeline_spark.operators.similarity import (
        quantize_embeddings,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, -1.0, 0.5, 0.0]),
            (2, [0.0, 0.0, 0.0]),
            (3, [-2.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert rows[1]["qvec"] == [127, -127, 64, 0]  # 63.5+0.5 -> 64
    assert rows[1]["scale"] == 1.0 / 127.0
    assert rows[1]["max_abs_err"] <= rows[1]["scale"] / 2 + 1e-12
    assert rows[2]["qvec"] == [0, 0, 0]
    assert rows[2]["scale"] == 0.0 and rows[2]["max_abs_err"] == 0.0
    assert rows[3]["qvec"] == [-127, 64]  # 63.5+0.5 half-up again
    for vid in (1, 3):
        r = rows[vid]
        for x, q in zip(
            [1.0, -1.0, 0.5, 0.0] if vid == 1 else [-2.0, 1.0],
            r["qvec"],
        ):
            assert abs(x - q * r["scale"]) <= r["scale"] / 2 + 1e-12
    with _pytest.raises(ValueError, match="bits"):
        quantize_embeddings(df, bits=1)
    # wider widths shrink the error floor
    r16 = {r["vec_id"]: r for r in
           quantize_embeddings(df, bits=16).collect()}
    assert r16[1]["max_abs_err"] < rows[1]["max_abs_err"]
    # r13 (per r12 ADVICE): a would-be clobber of an existing input
    # column is a typed error, not a silent withColumn replace — and
    # the names are steerable
    clash = df.withColumn("scale", F.lit(9.9))
    with _pytest.raises(ValueError, match="scale"):
        quantize_embeddings(clash)
    ok = {r["vec_id"]: r for r in quantize_embeddings(
        clash, scale_col="q_scale", err_col="q_err"
    ).collect()}
    assert ok[1]["q_scale"] == 1.0 / 127.0
    assert ok[1]["scale"] == 9.9  # the input column survives untouched
    assert ok[1]["q_err"] <= ok[1]["q_scale"] / 2 + 1e-12
