"""Scale utilities: salted skew-join equivalence and bucketed co-location
(zero-exchange joins)."""

import pytest
from pyspark.sql import functions as F

from da_transform_judgments_pipeline_spark.operators import scale


@pytest.fixture()
def skewed(spark):
    # one hot key (90% of rows) + a uniform tail
    hot = spark.range(9000).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    )
    tail = spark.range(1000).select(
        (F.col("id") % 100).alias("k").cast("int").alias("k"),
        (F.col("id") + 100_000).alias("payload"),
    )
    return hot.unionByName(tail)


@pytest.fixture()
def dim(spark):
    return spark.range(100).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"),
    )


def test_salted_join_matches_plain_join(spark, skewed, dim):
    plain = skewed.join(dim, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("payload").alias("s")
    )
    salted = scale.salted_join(skewed, dim, "k", salt=8).groupBy("k").agg(
        F.count("*").alias("n"), F.sum("payload").alias("s")
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_left_join_keeps_unmatched(spark, skewed):
    dim_partial = spark.range(5).select(
        F.col("id").cast("int").alias("k"), F.lit("x").alias("name")
    )
    plain = skewed.join(dim_partial, "k", "left")
    salted = scale.salted_join(skewed, dim_partial, "k", salt=4, how="left")
    assert plain.count() == salted.count()
    assert (
        salted.filter(F.col("name").isNull()).count()
        == plain.filter(F.col("name").isNull()).count()
    )


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    a = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    scale.write_bucketed(a, "bkt_a", "k", buckets=8, path=str(tmp_path / "a"))
    scale.write_bucketed(b, "bkt_b", "k", buckets=8, path=str(tmp_path / "b"))
    # force sort-merge so zero exchanges proves bucket co-location (a
    # broadcast join would trivially have no hash exchange)
    joined = scale.bucketed_table(spark, "bkt_a").join(
        scale.bucketed_table(spark, "bkt_b").hint("merge"), "k"
    )
    assert joined.count() == 1000
    # the whole point: bucket co-location removes the join shuffle
    assert scale.exchange_count(joined) == 0
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # an unbucketed equivalent shuffles at least one side
    # control: the same join as sort-merge over unbucketed data must shuffle
    # both sides
    plain = a.join(b.hint("merge"), "k")
    plain.count()
    assert scale.exchange_count(plain) >= 1
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")


# ---------------------------------------------------------------------------
# MinHash band-join skew hardening (boilerplate / identical-doc corpora)
# ---------------------------------------------------------------------------

def test_minhash_identical_docs_collapse_no_hot_bucket(spark):
    """A corpus of N identical docs is the band join's worst case: every doc
    shares every band key. With exact-set collapse the band join sees ONE
    representative (no quadratic bucket anywhere) and the full C(N,2)
    jaccard-1.0 output comes from the distributed group expansion."""
    from da_transform_judgments_pipeline_spark.operators import dedup

    n = 300
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit(
            "the same boilerplate sentence repeated across every single "
            "document in this synthetic corpus for dedup stress testing"
        ).alias("text"),
    )
    pairs = dedup.minhash_near_duplicates(docs, threshold=0.9)
    rows = pairs.collect()
    assert len(rows) == n * (n - 1) // 2
    assert all(r.jaccard == 1.0 for r in rows)
    assert all(r.id_a < r.id_b for r in rows)
    dedup.release_cached()


def test_minhash_mixed_corpus_collapse_matches_uncollapsed(spark, sf_dir):
    """Collapse on/off must produce identical pair sets on a real mixed
    corpus (the driver documents table has planted near-dups)."""
    from da_transform_judgments_pipeline_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    key = lambda r: (r.id_a, r.id_b, r.jaccard)  # noqa: E731
    on = sorted(
        map(key, dedup.minhash_near_duplicates(
            docs, threshold=0.9, collapse_exact=True
        ).collect())
    )
    off = sorted(
        map(key, dedup.minhash_near_duplicates(
            docs, threshold=0.9, collapse_exact=False
        ).collect())
    )
    assert on == off
    assert dedup.release_cached() > 0


def test_minhash_group_pair_cap_raises(spark):
    """The quadratic-output guard lives in the collapse path; pin
    collapse_exact=True (the 'auto' gate would route this tiny corpus to
    plain banding, where a 50-doc group is harmless by construction —
    the guard protects the at-scale route the gate picks there)."""
    from da_transform_judgments_pipeline_spark.operators import dedup

    docs = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.lit("identical text for the cap guard check here").alias("text"),
    )
    pairs = dedup.minhash_near_duplicates(
        docs, threshold=0.9, max_group_pairs=100, collapse_exact=True
    )
    with pytest.raises(Exception, match="max_group_pairs"):
        pairs.collect()
    dedup.release_cached()


def test_minhash_collapse_auto_gate_equivalence(spark):
    """collapse_exact='auto' (default) must produce the identical pair
    set as both forced routes on a duplicate-bearing corpus, and reject
    unknown strings."""
    import pytest as _pytest

    from da_transform_judgments_pipeline_spark.operators import dedup

    rows = [(i, f"shared prefix tokens alpha beta gamma delta {i % 4}")
            for i in range(24)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    runs = {}
    for mode in ("auto", True, False):
        runs[str(mode)] = sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in dedup.minhash_near_duplicates(
                docs, threshold=0.9, collapse_exact=mode
            ).collect()
        )
        dedup.release_cached()
    assert runs["auto"] == runs["True"] == runs["False"]
    assert len(runs["auto"]) > 0
    with _pytest.raises(ValueError, match="collapse_exact"):
        dedup.minhash_near_duplicates(docs, collapse_exact="maybe")


def test_minhash_uncollapsed_band_join_aqe_skew_split(spark):
    """Raw (collapse_exact=False) path under an identical-doc corpus: with
    broadcast disabled, the band self-join's hot bucket must be split by
    AQE's skew-join (skew=true in the final adaptive plan) instead of one
    task computing every candidate pair."""
    from da_transform_judgments_pipeline_spark.operators import dedup

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        docs = spark.range(800).select(
            F.col("id").alias("doc_id"),
            F.lit(
                "hot bucket stress corpus where every doc is identical"
            ).alias("text"),
        )
        pairs = dedup.minhash_near_duplicates(
            docs, threshold=0.9, collapse_exact=False
        )
        # collect() drives THIS DataFrame's QueryExecution to its final
        # adaptive plan (count() would plan a separate query)
        assert len(pairs.collect()) == 800 * 799 // 2
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        dedup.release_cached()


def test_keyed_prefix_rank_matches_window(spark):
    """The two-phase per-key prefix scan must equal the keyed-window
    row_number it replaces, across keys that straddle range-partition
    boundaries."""
    from pyspark.sql import Window

    from da_transform_judgments_pipeline_spark.operators import dedup
    from da_transform_judgments_pipeline_spark.operators.scale import (
        keyed_prefix_rank,
    )

    rows = [(i, i % 3) for i in range(97)]
    df = spark.createDataFrame(rows, ["id", "k"])
    got = {
        (r.k, r.id): r.rank_in_key
        for r in keyed_prefix_rank(
            df, "k", "id", range_partitions=8
        ).collect()
    }
    w = Window.partitionBy("k").orderBy("id")
    want = {
        (r.k, r.id): r.rn - 1
        for r in df.withColumn(
            "rn", F.row_number().over(w)
        ).collect()
    }
    assert got == want
    dedup.release_cached()


def test_collapse_probe_routes_on_group_size_not_bytes(spark, tmp_path):
    """The auto collapse gate must key on the EXACT max identical-set
    group size, not the (compression-distorted) byte estimate: a small
    parquet corpus with one 40-member identical group routes to collapse
    (collect_list in the optimized plan), while a same-sized corpus of
    singleton groups routes plain. Inputs must be parquet-backed — a
    createDataFrame LocalRelation reports Long.Max size (unknown), which
    correctly short-circuits to the scale-safe collapse without probing."""
    from da_transform_judgments_pipeline_spark.operators import dedup

    def plan(df):
        return df._jdf.queryExecution().optimizedPlan().toString()

    uniq = spark.createDataFrame(
        [(i, f"unique words alpha beta gamma delta {i}") for i in range(60)],
        ["doc_id", "text"],
    )
    dup_rows = [(i, "identical text body repeated many times over here")
                for i in range(40)]
    dup_rows += [(100 + i, f"unique filler text number {i} words")
                 for i in range(20)]
    dupy = spark.createDataFrame(dup_rows, ["doc_id", "text"])
    uniq.write.parquet(str(tmp_path / "uniq"))
    dupy.write.parquet(str(tmp_path / "dupy"))
    uniq = spark.read.parquet(str(tmp_path / "uniq"))
    dupy = spark.read.parquet(str(tmp_path / "dupy"))

    p_uniq = plan(dedup.minhash_near_duplicates(uniq, threshold=0.9))
    p_dupy = plan(dedup.minhash_near_duplicates(dupy, threshold=0.9))
    dedup.release_cached()
    assert "collect_list" not in p_uniq      # plain banding
    assert "collect_list" in p_dupy          # collapse engaged
    # and unknown-size inputs (LocalRelation → Long.Max estimate) must
    # take the scale-safe collapse without probing
    local = spark.createDataFrame(
        [(i, f"some local words {i}") for i in range(10)],
        ["doc_id", "text"],
    )
    assert "collect_list" in plan(
        dedup.minhash_near_duplicates(local, threshold=0.9)
    )
    dedup.release_cached()


def test_zorder_index_morton_and_locality(spark):
    """The 2-bit Morton curve visits the textbook order; and sorting a
    grid by the z-index gives materially better 2-D neighbor locality
    than a lexicographic (x, y) sort (mean Manhattan distance between
    consecutive rows — the property that makes BOTH dimensions prunable
    from one file order)."""
    from da_transform_judgments_pipeline_spark.operators.scale import (
        zorder_index,
    )

    grid = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], ["x", "y"]
    )
    z = grid.select(
        "x", "y", zorder_index(F.col("x"), F.col("y"), bits=4).alias("z")
    ).collect()
    # textbook 2x2 case: (0,0)=0 (1,0)=1 (0,1)=2 (1,1)=3
    zmap = {(r.x, r.y): r.z for r in z}
    assert [zmap[(0, 0)], zmap[(1, 0)], zmap[(0, 1)], zmap[(1, 1)]] == [
        0, 1, 2, 3,
    ]
    assert len(set(zmap.values())) == 256  # bijective on the grid

    # the prunability property: split the sorted stream into 16 "files"
    # of 16 rows — z-order files are 4×4 boxes (worst side 3), while a
    # lexicographic sort yields 1×16 strips (worst side 15): a query on
    # the SECOND dimension prunes z-files but must read every lex-file
    def worst_box_side(order):
        worst = 0
        for i in range(0, len(order), 16):
            chunk = order[i : i + 16]
            xs = [p[0] for p in chunk]
            ys = [p[1] for p in chunk]
            worst = max(worst, max(xs) - min(xs), max(ys) - min(ys))
        return worst

    z_order = [(r.x, r.y) for r in sorted(z, key=lambda r: r.z)]
    lex_order = sorted((r.x, r.y) for r in z)
    assert worst_box_side(z_order) == 3
    assert worst_box_side(lex_order) == 15


def test_hll_distinct_error_and_merge(spark):
    """HLL sketch contract: per-group estimates within the documented
    ~1.6% band (lgk=12) of exact distinct counts, and the UNION of group
    sketches estimates the global distinct count — the mergeability that
    justifies keeping sketch state at all (sub-aggregates roll up
    without raw data)."""
    from da_transform_judgments_pipeline_spark.operators.scale import (
        hll_distinct_by_group,
        hll_union_estimate,
    )

    # 3 groups with overlapping member sets
    df = spark.range(30_000).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 7000).alias("v"),  # overlap across groups
    )
    got = {
        r.g: r.approx_distinct
        for r in hll_distinct_by_group(df, "g", "v").collect()
    }
    exact = {
        r.g: r.n
        for r in df.groupBy("g")
        .agg(F.count_distinct("v").alias("n"))
        .collect()
    }
    for g in exact:
        assert abs(got[g] - exact[g]) / exact[g] < 0.05
    sketches = hll_distinct_by_group(df, "g", "v").select("sketch")
    union_est = hll_union_estimate(sketches)
    global_exact = df.select("v").distinct().count()
    assert abs(union_est - global_exact) / global_exact < 0.05


def test_keyed_prefix_rank_nonstring_and_null_keys(spark):
    """Regression: the offset map's keys must be rendered exactly as the
    engine renders them — Python str() disagrees with Spark's CAST for
    booleans ('True' vs 'true') and drops nothing for NULL (concat_ws
    drops the null field). A mismatch silently coalesces to offset 0."""
    from pyspark.sql import Window

    from da_transform_judgments_pipeline_spark.operators import dedup
    from da_transform_judgments_pipeline_spark.operators.scale import (
        keyed_prefix_rank,
    )

    rows = [
        (i, True if i % 3 == 0 else (False if i % 3 == 1 else None))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id int, k boolean")
    got = {
        (r.k, r.id): r.rank_in_key
        for r in keyed_prefix_rank(
            df, "k", "id", range_partitions=8
        ).collect()
    }
    w = Window.partitionBy("k").orderBy("id")
    want = {
        (r.k, r.id): r.rn - 1
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want
    dedup.release_cached()
