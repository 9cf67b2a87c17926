"""Deduplication operators for training-data pipelines (BASELINE.json north
star): exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design notes
------------------
- exact dedup: one hash-shuffle on the key; map-side partial agg applies.
- MinHash signatures: computed per row with array expressions (NO explode →
  no shuffle, no row blow-up); only the band→bucket join shuffles, and it
  shuffles k/band-size values per doc, not the shingle stream.
- candidate verification joins shingle sets back only for candidate pairs —
  at 100 TB the candidate set is orders of magnitude smaller than the
  cross-product the naive approach would shuffle.
- all hashing is Spark's deterministic murmur3/xxhash64 — signatures are
  reproducible across runs and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(
    df: DataFrame, key_cols: list[str], id_col: str
) -> DataFrame:
    """Groups with >1 row on the (hashed) key: returns
    (dup_key, n_dups, keep_id, dup_ids) — keep_id is the min id (stable
    canonical representative)."""
    key = F.md5(F.concat_ws("", *[F.col(c) for c in key_cols]))
    return (
        df.withColumn("dup_key", key)
        .groupBy("dup_key")
        .agg(
            F.count("*").alias("n_dups"),
            F.min(id_col).alias("keep_id"),
            F.sort_array(F.collect_list(id_col)).alias("dup_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep exactly one row (min id) per duplicate group — the scalable
    groupBy-hash form of exact dedup."""
    key = F.md5(F.concat_ws("", *[F.col(c) for c in key_cols]))
    w_min = (
        df.withColumn("_k", key)
        .groupBy("_k")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(w_min, id_col, "left_semi")


# ---------------------------------------------------------------------------
# shingling + MinHash + LSH
# ---------------------------------------------------------------------------

def shingle_array(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array column (no explode)."""
    toks = tokens(text)
    size = F.size(toks)
    # NB: sequence(1, 0) counts DOWN in Spark, so docs shorter than n tokens
    # must be guarded (element_at would range-error under ANSI mode)
    grams = F.transform(
        F.sequence(F.lit(1), size - (n - 1)),
        lambda i: F.concat_ws(
            "", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    empty = F.array().cast("array<string>")
    return F.when(size >= n, F.array_distinct(grams)).otherwise(empty)


def minhash_signature(shingles: Column, k: int = 64) -> Column:
    """k-permutation MinHash signature as array<int> — k array-min scans per
    row, all map-side (murmur3 with k fixed seeds)."""

    def min_for_seed(seed: int) -> Column:
        # closure factory: a two-arg lambda would make F.transform bind the
        # array index to the second parameter instead of the seed
        return F.array_min(F.transform(shingles, lambda s: F.hash(s, F.lit(seed))))

    return F.array(*[min_for_seed(i) for i in range(k)])


def lsh_band_keys(signature: Column, bands: int, rows: int) -> Column:
    """Band the signature: array of `bands` bucket keys, each hashing `rows`
    consecutive signature slots (banded LSH: P(candidate) ≈ 1-(1-j^r)^b)."""
    return F.array(
        *[
            F.hash(
                F.lit(b),
                *[
                    F.element_at(signature, b * rows + r + 1)
                    for r in range(rows)
                ],
            )
            for b in range(bands)
        ]
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs with EXACT Jaccard verification.

    shingle → signature (map-side) → band-bucket self-join (the only
    shuffle) → verify candidates on true shingle-set Jaccard → pairs with
    jaccard ≥ threshold. Output: (id_a, id_b, jaccard) with id_a < id_b.

    Verification makes the result exact-on-candidates: LSH only affects
    recall, never precision, so downstream joins see true Jaccard values.
    """
    rows = k // bands
    base = (
        df.select(
            F.col(id_col).alias("id"),
            shingle_array(text_col, n).alias("shingles"),
        )
        # docs with no shingles have no similarity signal — and would all
        # collide on the null signature (then divide by zero in jaccard)
        .filter(F.size("shingles") > 0)
        .withColumn("sig", minhash_signature(F.col("shingles"), k))
    )

    banded = base.select(
        "id",
        "shingles",
        F.explode(lsh_band_keys(F.col("sig"), bands, rows)).alias("band"),
    )

    left = banded.alias("a")
    right = banded.alias("b")
    candidates = (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        candidates.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index join.

    explode distinct shingles → self-join on shingle → per-pair intersection
    count → Jaccard from set sizes. Exact (no LSH recall loss); the shingle
    join IS the cost — use minhash_near_duplicates at scale. Serves as the
    correctness oracle for the LSH path.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingle_array(text_col, n)).alias("s"),
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), "s")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: Column | str) -> Column:
    """64-bit SimHash over whitespace tokens, pure array expressions:
    per-token xxhash64 → ±1 vote per bit → sign fold to a LONG. Map-side
    only; hamming-distance bucketing joins on the result column."""
    toks = tokens(text)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def bit_votes(h: Column) -> Column:
        # ±1 per bit; shift counts must be Python ints (shiftright does not
        # accept a Column), so expand the fixed 64-bit range here
        return F.array(
            *[
                (F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1).cast("int")
                for i in range(64)
            ]
        )

    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(acc, bit_votes(h), lambda a, b: a + b),
    )
    # fold positive-vote bits back into one signed 64-bit value; bit 63 is
    # the sign bit, added as its two's-complement value
    terms = [
        F.when(F.element_at(votes, i + 1) > 0, F.lit(1 << i).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        for i in range(63)
    ]
    terms.append(
        F.when(F.element_at(votes, 64) > 0, F.lit(-(1 << 63)).cast("long"))
        .otherwise(F.lit(0).cast("long"))
    )
    sig = terms[0]
    for t in terms[1:]:
        sig = sig + t
    return sig


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: signature (map-side) → 4-block bucketing
    (pigeonhole: ≤3 differing bits ⇒ at least one identical 16-bit block) →
    exact hamming verify on candidates. Output (id_a, id_b, hamming)."""
    sig = df.select(
        F.col(id_col).alias("id"), simhash64(text_col).alias("sig")
    )
    blocks = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block_no"),
                        F.shiftright(F.col("sig"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("block"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", F.col("bk.block_no"), F.col("bk.block"))
    cands = (
        blocks.alias("a")
        .join(
            blocks.alias("b"),
            (F.col("a.block_no") == F.col("b.block_no"))
            & (F.col("a.block") == F.col("b.block"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cands.withColumn("hamming", hamming64(F.col("sig_a"), F.col("sig_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------

def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two float-array columns, pure Catalyst:
    zip_with dot product / norms."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return dot / (norm(a) * norm(b))


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding near-dup pairs by cosine ≥ threshold.

    Brute-force O(n²) pair join — correct baseline; for the 100 TB path,
    pre-bucket with random-hyperplane LSH (similarity.hyperplane_buckets)
    and run this within buckets."""
    v = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    pairs = v.alias("a").join(
        v.alias("b"), F.col("a.id") < F.col("b.id")
    )
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(
                cosine_similarity(F.col("a.vec"), F.col("b.vec")), 6
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
