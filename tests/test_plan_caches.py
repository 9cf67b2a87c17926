"""Round-14 plan-construction caches: replaying a cached step list /
Column must be RESULT-identical to a cold build, and the cache must
never leak rows (it holds unmaterialized expression objects only).

These pin the optimization's internals (OPTIMIZATION_r14.md §5):
- operators/text._PLAN_CACHE step-list replay for the ngram suites
- operators/similarity._SIG_COL_CACHE / _MASK_COL_CACHE
- __spark_entry__._T per-session lazy-plan memo
"""

import pytest
from pyspark.sql import functions as F

from da_transform_judgments_pipeline_spark.operators import (
    similarity,
    text,
)


def _rows(df, cols):
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )


def test_ngram_suite_cached_replay_identical(spark):
    df = spark.createDataFrame(
        [(i, ("alpha beta gamma " * (i % 4 + 2)).strip()) for i in range(24)],
        "doc_id long, text string",
    )
    cols = ["doc_id", "top2_char_frac", "dup5_char_frac"]
    key = ("ngram_repetition_suite", "text", (2, 3, 4), (5, 6, 7, 8, 9, 10))
    text._PLAN_CACHE.pop(key, None)
    cold = _rows(text.ngram_repetition_suite(df), cols)
    assert key in text._PLAN_CACHE  # the cold call populated the cache
    cached = _rows(text.ngram_repetition_suite(df), cols)
    assert cold == cached


def test_ngram_dup_union_cached_replay_identical(spark):
    df = spark.createDataFrame(
        [(i, ("one two three four five " * 3).strip()) for i in range(8)],
        "doc_id long, text string",
    )
    cols = ["doc_id", "dup5_union_frac"]
    key = ("ngram_dup_union_fractions", "text", (5, 6, 7, 8, 9, 10))
    text._PLAN_CACHE.pop(key, None)
    cold = _rows(text.ngram_dup_union_fractions(df), cols)
    assert key in text._PLAN_CACHE
    cached = _rows(text.ngram_dup_union_fractions(df), cols)
    assert cold == cached


def test_cached_signature_and_masks_match_uncached(spark):
    emb = spark.createDataFrame(
        [(i, [float((i * 5 + j) % 11) - 5.0 for j in range(8)])
         for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    vec_sql = "CAST(embedding AS array<double>)"
    similarity._SIG_COL_CACHE.pop((vec_sql, 8, 8, 42), None)
    sig_cold = emb.select(
        similarity.hyperplane_signature(vec_sql, 8, 8).alias("s")
    ).collect()
    # second call returns the SAME cached Column object
    c1 = similarity.hyperplane_signature(vec_sql, 8, 8)
    c2 = similarity.hyperplane_signature(vec_sql, 8, 8)
    assert c1 is c2
    sig_cached = emb.select(c2.alias("s")).collect()
    assert [r["s"] for r in sig_cold] == [r["s"] for r in sig_cached]
    # uncached python-side signature agrees (the pre-existing parity)
    rows = emb.collect()
    for r in rows[:5]:
        assert similarity.signature_of(r["embedding"], 8) == sig_cold[
            rows.index(r)
        ]["s"]
    # mask Column literal equals the python mask list, and is cached
    m1 = similarity.hamming_ball_masks_col(8, 2)
    m2 = similarity.hamming_ball_masks_col(8, 2)
    assert m1 is m2
    got = spark.range(1).select(m1.alias("m")).first()["m"]
    assert sorted(got) == sorted(similarity.hamming_ball_masks(8, 2))


def test_entry_table_cache_is_lazy_and_per_session(spark, sf_dir):
    import __spark_entry__ as entry

    a = entry._T(spark, sf_dir, "documents")
    b = entry._T(spark, sf_dir, "documents")
    assert a is b  # memoized plan object, same session + dir + table
    # distinct tables / dirs get distinct plans
    c = entry._T(spark, sf_dir, "embeddings")
    assert c is not a
    # the cached object is an UNMATERIALIZED plan: no storage level set
    assert a.storageLevel.useMemory is False
    assert a.storageLevel.useDisk is False
    # and actions on it still read from disk (row count matches a
    # fresh read bypassing the cache)
    import os

    fresh = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    assert a.count() == fresh.count()


@pytest.mark.parametrize("n,r", [(8, 0), (8, 1), (16, 2)])
def test_mask_col_matches_list_across_params(spark, n, r):
    got = spark.range(1).select(
        similarity.hamming_ball_masks_col(n, r).alias("m")
    ).first()["m"]
    assert sorted(got) == sorted(similarity.hamming_ball_masks(n, r))
