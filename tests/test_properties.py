"""Property-based tests (hypothesis) for the invariants golden tests can't
pin down: LSH precision against the exact oracle, sampling monotonicity,
connected components vs a reference union-find, encoding round-trips.

The reference has no property/randomized tests (SURVEY.md §5); these guard
the operators whose correctness is a MATHEMATICAL contract rather than a
fixed fixture. Spark jobs are expensive per example, so each property runs
few, information-dense examples (deadline disabled — JVM warmup skews
wall-clock wildly)."""

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from da_transform_judgments_pipeline_spark.operators import dedup, text

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,  # CI determinism: same examples every run
)

_spark = None


def _get_spark():
    # hypothesis drives the test function many times per pytest item, so
    # the session fixture is fetched lazily once (function-scoped fixture
    # injection is suppressed above)
    global _spark
    if _spark is None:
        from da_transform_judgments_pipeline_spark.session import get_spark

        _spark = get_spark(
            app_name="tests", shuffle_partitions=4, master="local[4]"
        )
    return _spark


words = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
)
docs_strategy = st.lists(
    st.lists(words, min_size=3, max_size=12).map(" ".join),
    min_size=2,
    max_size=8,
)


@given(texts=docs_strategy)
@SLOW
def test_minhash_pairs_subset_of_exact_with_equal_jaccard(texts):
    """LSH affects recall, never precision: every pair minhash emits must
    appear in the exact n-gram Jaccard pairs WITH the same jaccard value,
    and byte-identical documents (jaccard 1.0) are always recalled (they
    collide in every band)."""
    spark = _get_spark()
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    approx = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.minhash_near_duplicates(
            df, threshold=0.5, persist_shingles=False
        ).collect()
    }
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(df, threshold=0.5).collect()
    }
    for pair, j in approx.items():
        assert pair in exact, f"false positive {pair}"
        assert abs(j - exact[pair]) < 1e-9, f"jaccard mismatch {pair}"
    # guaranteed recall for identical shingle sets
    toks = [tuple(t.split()) for t in texts]
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if toks[i] == toks[j] and len(toks[i]) >= 3:
                assert (i, j) in approx, f"identical pair {(i, j)} missed"


@given(
    rate_lo=st.floats(min_value=0.0, max_value=1.0),
    rate_hi=st.floats(min_value=0.0, max_value=1.0),
)
@SLOW
def test_deterministic_sample_monotone_and_stable(rate_lo, rate_hi):
    """A lower-rate sample is always a subset of a higher-rate sample of
    the same keys (thresholds are nested), and resampling is identical."""
    if rate_lo > rate_hi:
        rate_lo, rate_hi = rate_hi, rate_lo
    spark = _get_spark()
    df = spark.range(300).select(F.col("id").alias("doc_id"))
    lo = {r.doc_id for r in text.deterministic_sample(
        df, ["doc_id"], rate_lo).collect()}
    hi = {r.doc_id for r in text.deterministic_sample(
        df, ["doc_id"], rate_hi).collect()}
    assert lo <= hi
    again = {r.doc_id for r in text.deterministic_sample(
        df, ["doc_id"], rate_lo).collect()}
    assert lo == again
    if rate_hi == 1.0:
        assert len(hi) == 300  # full rate keeps everything


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=25,
    )
)
@SLOW
def test_connected_components_match_union_find(edges):
    """Distributed min-label propagation computes exactly the components a
    sequential union-find computes, for any pair list (self-loops and
    duplicate/reversed edges included)."""
    spark = _get_spark()
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        r.id: r.cluster_id for r in dedup.connected_components(df).collect()
    }
    dedup.release_cached()

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    want = {}
    roots: dict[int, int] = {}
    for node in sorted(parent):
        r = find(node)
        roots.setdefault(r, node)  # min member = first in sorted order
        want[node] = roots[r]
    assert got == want


@given(
    s=st.text(
        alphabet=string.ascii_letters + string.digits + " /:?&=.#~%-_",
        max_size=40,
    )
)
@SLOW
def test_percent_encode_matches_urllib(s):
    """The Arrow-batched percent encoder reproduces urllib.parse.quote with
    the reference's %3A→: restoration for arbitrary path-ish strings."""
    from urllib.parse import quote

    spark = _get_spark()
    from da_transform_judgments_pipeline_spark.functions.strings import (
        percent_encode,
    )

    df = spark.createDataFrame([(s,)], ["v"])
    got = df.select(percent_encode("v").alias("e")).first()["e"]
    assert got == quote(s).replace("%3A", ":")


@given(texts=docs_strategy, line_tokens=st.sampled_from([2, 3, 4]))
@SLOW
def test_line_dedup_fingerprint_equals_content(texts, line_tokens):
    """The fingerprint formulation (narrow-key shuffles, text moves once)
    is semantically IDENTICAL to the content-keyed form on arbitrary
    corpora: same survivors, same reassembled text, same counts — for
    ragged final lines, intra-doc repeats, and fully-owned docs alike."""
    spark = _get_spark()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    key = lambda r: (r.doc_id, r.text_deduped, r.n_lines, r.n_kept)  # noqa: E731
    fp = sorted(
        map(key, text.line_dedup(df, line_tokens=line_tokens).collect())
    )
    ct = sorted(
        map(
            key,
            text.line_dedup(
                df, line_tokens=line_tokens, key="content"
            ).collect(),
        )
    )
    assert fp == ct


@SLOW
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),        # user
            st.integers(min_value=0, max_value=50),       # ts offset (s)
            st.sampled_from(["view", "click", "purchase", "noise"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_funnel_fold_matches_sequential_min_reference(events):
    """The single-shuffle sorted-fold funnel must equal the sequential
    min-timestamp reference formulation (the DuckDB-oracle construction)
    on arbitrary event streams — including equal timestamps, which never
    chain on either side."""
    from da_transform_judgments_pipeline_spark.operators.temporal import (
        funnel_depth,
    )

    spark = _get_spark()
    steps = ["view", "click", "purchase"]
    rows = [
        (u, f"2024-01-01 00:00:{s:02d}" if s < 60 else None, t)
        for u, s, t in events
    ]
    rows = [(u, ts, t) for u, ts, t in rows if ts]
    if not rows:
        return
    df = spark.createDataFrame(
        rows, ["user_id", "s", "event_type"]
    ).select("user_id", F.to_timestamp("s").alias("ts"), "event_type")
    got = {
        r.user_id: r.funnel_depth
        for r in funnel_depth(df, steps).collect()
    }

    # reference: per user, t_i = min ts of step i strictly after t_{i-1}
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, ts, t in rows:
        by_user[u].append((ts, t))
    want = {}
    for u, evs in by_user.items():
        if not any(t in steps for _, t in evs):
            continue
        last, depth = None, 0
        for step in steps:
            cands = [
                ts for ts, t in evs
                if t == step and (last is None or ts > last)
            ]
            if not cands:
                break
            last = min(cands)
            depth += 1
        want[u] = depth
    assert got == want


@SLOW
@given(
    ivs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),      # key
            st.integers(min_value=0, max_value=200),    # start (hours)
            st.integers(min_value=1, max_value=60),     # duration (hours)
        ),
        min_size=2,
        max_size=24,
    )
)
def test_interval_overlap_join_matches_theta_reference(ivs):
    """The bucket-replicated overlap join must produce EXACTLY the raw
    theta-join pair set on arbitrary keyed intervals — including
    intervals spanning many buckets and boundary-touching (half-open)
    cases."""
    from da_transform_judgments_pipeline_spark.operators.temporal import (
        interval_overlap_join,
    )

    spark = _get_spark()
    base = 1_700_000_000_000_000
    rows = [
        (k, i, base + s * 3_600_000_000, base + (s + d) * 3_600_000_000)
        for i, (k, s, d) in enumerate(ivs)
    ]
    left = [r for r in rows if r[1] % 2 == 0]
    right = [r for r in rows if r[1] % 2 == 1]
    if not left or not right:
        return

    def mk(rs):
        return spark.createDataFrame(
            rs, ["user_id", "event_id", "s_us", "e_us"]
        ).select(
            "user_id",
            "event_id",
            F.timestamp_micros("s_us").alias("start"),
            F.timestamp_micros("e_us").alias("end"),
        )

    got = sorted(
        (r.user_id, r.l_event_id, r.r_event_id, r.overlap_us)
        for r in interval_overlap_join(
            mk(left), mk(right), "user_id", bucket_width_s=86_400
        ).collect()
    )
    want = sorted(
        (lk, li, ri, min(le, re) - max(ls, rs))
        for lk, li, ls, le in left
        for rk, ri, rs, re in right
        if lk == rk and ls < re and rs < le
    )
    assert got == want


@SLOW
@given(
    obs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),     # key
            st.integers(min_value=0, max_value=50),    # ts offset (s)
            st.integers(min_value=0, max_value=2),     # state value
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: (t[0], t[1]),  # one observation per instant
    )
)
def test_scd2_intervals_tile_the_timeline(obs):
    """SCD2 invariants on arbitrary change streams: per key, intervals
    are contiguous (each valid_to equals the next valid_from), exactly
    one open interval per key (the last), version numbers are dense
    from 1, and replaying the intervals reproduces the run-compressed
    value sequence of the input."""
    from da_transform_judgments_pipeline_spark.operators.temporal import (
        scd2_intervals,
    )

    spark = _get_spark()
    rows = [
        (k, f"2024-01-01 00:00:{s:02d}", k * 1000 + s, str(v))
        for k, s, v in obs
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "s", "event_id", "value"]
    ).select(
        "user_id", F.to_timestamp("s").alias("ts"), "event_id", "value"
    )
    out = scd2_intervals(df, tiebreak_col="event_id").collect()
    from collections import defaultdict

    by_key = defaultdict(list)
    for r in out:
        by_key[r.user_id].append(r)
    # reference run-compression
    ref = defaultdict(list)
    for k, s, v in sorted(obs):
        if not ref[k] or ref[k][-1] != str(v):
            ref[k].append(str(v))
    for k, ivs in by_key.items():
        ivs.sort(key=lambda r: r.version_no)
        assert [r.version_no for r in ivs] == list(range(1, len(ivs) + 1))
        assert [r.value for r in ivs] == ref[k]
        opens = [r for r in ivs if r.valid_to is None]
        assert opens == [ivs[-1]]
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from


consignment_spec = st.tuples(
    st.integers(min_value=0, max_value=3),   # n data files
    st.booleans(),                           # corrupt a data file
    st.booleans(),                           # ghost manifest entry
    st.booleans(),                           # stray unlisted file
    st.booleans(),                           # corrupt a root file
)


def _members_from_spec(tag, spec):
    """Deterministic member dict for one consignment spec."""
    import hashlib

    def sha(b):
        return hashlib.sha256(b).hexdigest()

    n_data, corrupt_data, ghost, stray, corrupt_root = spec
    data = {
        f"data/content/f{i}.txt": f"{tag} body {i}".encode()
        for i in range(n_data)
    }
    root = {
        "bagit.txt": b"BagIt-Version: 0.97\n",
        "bag-info.txt": f"Internal-Sender-Identifier: {tag}\n".encode(),
    }
    dm = {k: sha(v) for k, v in data.items()}
    if corrupt_data and data:
        first = sorted(data)[0]
        dm[first] = sha(data[first] + b"!")
    if ghost:
        dm["data/content/ghost.txt"] = sha(b"ghost")
    root["manifest-sha256.txt"] = "".join(
        f"{c}  {k}\n" for k, c in sorted(dm.items())
    ).encode()
    tm = {k: sha(v) for k, v in sorted(root.items())}
    if corrupt_root:
        tm["bagit.txt"] = sha(b"tampered-root")
    tag_manifest = "".join(f"{c}  {k}\n" for k, c in sorted(tm.items()))
    out = dict(root)
    out["tagmanifest-sha256.txt"] = tag_manifest.encode()
    out.update(data)
    if stray:
        out["data/content/stray.bin"] = b"unlisted"
    return out


def _model_report(members):
    """Independent pure-Python model of the sequential stage's checks
    (tre_vb_validate_bagit_files semantics): returns (status, error)."""
    import hashlib

    def sha(b):
        return hashlib.sha256(b).hexdigest()

    def parse(blob):
        rows = []
        for line in blob.decode().split("\n"):
            if line.strip():
                rows.append(
                    (line[:64].strip().lower(), line[64:].strip())
                )
        return rows

    actual = {k: sha(v) for k, v in members.items()}
    for kind, mname in (("root", "tagmanifest-sha256.txt"),
                        ("data", "manifest-sha256.txt")):
        listed = parse(members.get(mname, b""))
        bad = []
        for expected, fname in sorted(listed, key=lambda t: t[1]):
            got = actual.get(fname)
            if got is None or got != expected:
                bad.append((fname, expected, got))
        if bad:
            fname, expected, got = bad[0]
            return "error", (
                f'Object "C/{fname}" checksum "{got}" does not match '
                f'expected checksum "{expected}" '
                f"({len(bad)} problem file(s) total)"
            )
    n_root = len(parse(members.get("tagmanifest-sha256.txt", b"")))
    n_data_listed = len(parse(members.get("manifest-sha256.txt", b"")))
    manifests_total = 1 + n_root + n_data_listed
    if len(members) != manifests_total:
        return "error", (
            f"Incorrect total file count; {manifests_total} in manifest, "
            f"but {len(members)} found"
        )
    n_data_extracted = sum(1 for k in members if k.startswith("data/"))
    if n_data_listed != n_data_extracted:
        return "error", (
            f"Incorrect data file count; {n_data_listed} in manifest "
            f"but {n_data_extracted} found"
        )
    return "ok", None


@given(specs=st.lists(consignment_spec, min_size=1, max_size=5))
@SLOW
def test_batch_validation_report_matches_python_model(specs):
    """Differential contract for the batched J2/A3 core: across random
    consignment corpora (tampered data files, ghost manifest entries,
    stray files, corrupted root files — independently per consignment),
    batch_validation_report's (status, error) per consignment equals an
    independent pure-Python reimplementation of the sequential checks.
    The model prints python-None for missing actuals and counts each
    manifest's bad rows exactly as the stage's f-strings do."""
    from da_transform_judgments_pipeline_spark.plans.batch import (
        batch_validation_report,
    )

    spark = _get_spark()
    rows = []
    want = {}
    for i, spec in enumerate(specs):
        cname = f"C{i}"
        members = _members_from_spec(cname, spec)
        status, error = _model_report(members)
        if error is not None:
            error = error.replace('"C/', f'"{cname}/')
        want[cname] = (status, error)
        rows += [(cname, k, v) for k, v in members.items()]
    df = spark.createDataFrame(
        rows, "consignment string, name string, content binary"
    )
    got = {
        r["consignment"]: (r["status"], r["error"])
        for r in batch_validation_report(df).collect()
    }
    assert got == want


FAST = settings(max_examples=60, deadline=None, derandomize=True)


@FAST
@given(
    data=st.binary(min_size=0, max_size=4000),
    mcs=st.integers(min_value=2, max_value=8),
)
def test_gif_lzw_roundtrip_property(data, mcs):
    """decode(encode(x)) == x for arbitrary index streams at every
    minimum code size — the width-boundary and KwKwK cases fall out of
    the byte strategy (regression guard for the tail-append width
    bug)."""
    from da_transform_judgments_pipeline_spark.operators.imagecodec import (
        _lzw_decode,
        _lzw_encode,
    )

    idx = bytes(b % (1 << mcs) for b in data)
    assert bytes(_lzw_decode(_lzw_encode(idx, mcs), mcs, 10**7)) == idx


@FAST
@given(
    paras=st.lists(
        st.text(
            alphabet=string.ascii_letters + string.digits + " ()\\#/-.,",
            min_size=0,
            max_size=60,
        ),
        min_size=0,
        max_size=8,
    ),
    compress=st.booleans(),
    tj=st.booleans(),
    xs=st.booleans(),
)
def test_pdf_text_roundtrip_property(paras, compress, tj, xs):
    """build_pdf → parse_pdf recovers exactly the non-empty paragraph
    lines across every encoder mode, including strings full of PDF
    delimiters and escapes."""
    from da_transform_judgments_pipeline_spark.plans.pdf_parser import (
        build_pdf,
        parse_pdf,
    )

    blob = build_pdf(
        paras, compress=compress, tj_arrays=tj,
        xref_stream=xs, obj_streams=xs,
    )
    # empty paragraphs emit an empty show string → no extracted line
    assert parse_pdf(blob)["lines"] == [p for p in paras if p]


@FAST
@given(
    payloads=st.lists(
        st.binary(min_size=0, max_size=300), min_size=0, max_size=5
    ),
    gz=st.booleans(),
)
def test_warc_roundtrip_property(payloads, gz):
    """build_warc_gz → parse_warc recovers every payload byte-exactly
    with verified digests, in both framings."""
    from da_transform_judgments_pipeline_spark.sources.warc import (
        build_warc_gz,
        parse_warc,
    )

    resp = [
        {
            "url": f"https://h.example/{i}",
            "date": "2021-03-04T05:06:07Z",
            "payload": p,
        }
        for i, p in enumerate(payloads)
    ]
    recs = parse_warc(build_warc_gz(resp, gzip_members=gz))
    assert len(recs) == len(payloads) + 1
    for i, p in enumerate(payloads):
        assert recs[i + 1]["payload"] == p
        assert recs[i + 1]["digest_ok"] is True


@FAST
@given(
    rules=st.lists(
        st.tuples(
            st.text(alphabet="/abde", min_size=1, max_size=6),
            st.booleans(),
        ),
        min_size=0,
        max_size=6,
    ),
    path=st.text(alphabet="/abde", min_size=1, max_size=8),
)
def test_robots_longest_match_model_property(rules, path):
    """parse_robots + the longest-match decision agree with a tiny
    reference model: among matching rules take max(len) with Allow
    winning ties; no match → allowed."""
    from da_transform_judgments_pipeline_spark.operators.robots import (
        parse_robots,
    )

    content = "User-agent: *\n" + "".join(
        f"{'Allow' if a else 'Disallow'}: {p}\n" for p, a in rules
    )
    got_rules = parse_robots(content, "anybot")
    assert got_rules == [(p, a) for p, a in rules]
    matching = [(len(p), a) for p, a in got_rules if path.startswith(p)]
    expected = max(matching)[1] if matching else True
    # mirror of the Spark fold: max by (length, allow)
    best = max(matching) if matching else None
    assert (best[1] if best else True) == expected


@settings(
    max_examples=40, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(data=st.binary(min_size=0, max_size=4000))
def test_transport_decoders_roundtrip_any_bytes(data):
    """For ANY byte string, the canonical C encoders' output must decode
    back exactly through the pure-stdlib decoders (hypothesis widens
    the fixed differential shapes to adversarial inputs)."""
    import pyarrow as pa

    from da_transform_judgments_pipeline_spark.operators.compress import (
        lz4_frame_decompress,
        snappy_decompress,
        zstd_compress_store,
        zstd_decompress,
    )

    assert zstd_decompress(
        pa.Codec("zstd", compression_level=3).compress(data, asbytes=True)
    ) == data
    assert lz4_frame_decompress(
        pa.Codec("lz4").compress(data, asbytes=True)
    ) == data
    assert snappy_decompress(
        pa.Codec("snappy").compress(data, asbytes=True)
    ) == data
    # and libzstd must accept our store-mode frames
    frame = zstd_compress_store(data)
    assert pa.Codec("zstd").decompress(
        frame, decompressed_size=len(data), asbytes=True
    ) == data


@settings(
    max_examples=30, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1, max_size=400,
    ),
    mode_i=st.integers(min_value=0, max_value=3),
    kind_i=st.integers(min_value=0, max_value=5),
)
def test_flac_roundtrip_any_samples(samples, mode_i, kind_i):
    from da_transform_judgments_pipeline_spark.operators.flaccodec import (
        decode_flac, encode_flac,
    )

    mode = ("independent", "left_side", "right_side", "mid_side")[mode_i]
    kind = ("fixed0", "fixed1", "fixed2", "verbatim", "lpc2", "lpc4")[kind_i]
    other = [(s * 3) % 1000 - 500 for s in samples]
    blob = encode_flac(
        [samples, other], channel_mode=mode,
        subframe_kinds=[kind, "verbatim"],
    )
    dec = decode_flac(blob)
    assert dec["samples"] == [samples, other]
    assert dec["md5_ok"] is True


_label = st.sampled_from(["example", "news", "sub", "www", "a1", "x"])
_urls_strategy = st.lists(
    st.tuples(
        st.sampled_from(["http", "https"]),
        st.lists(_label, min_size=1, max_size=4).map(".".join),
        st.sampled_from(["", ":8080"]),
        st.sampled_from(["/", "/p", "/a/b", "/a/../b", "/p?b=2&a=1"]),
    ).map(lambda t: f"{t[0]}://{t[1]}{t[2]}{t[3]}"),
    min_size=1,
    max_size=12,
)


@given(urls=_urls_strategy)
@SLOW
def test_surt_key_properties(urls):
    """SURT invariants over generated URLs (round-12): the key is a
    pure function of the CANONICAL form (two spellings that
    canonicalize together share one key), never NULL for an absolute
    URL, scheme-insensitive (http/https collapse — the CDX
    convention), and reversing the key's host labels reconstructs the
    canonical host modulo the stripped www label."""
    from da_transform_judgments_pipeline_spark.functions.strings import (
        canonical_url,
        surt_key,
    )

    spark = _get_spark()
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    rows = df.select(
        "u",
        canonical_url(F.col("u")).alias("c"),
        surt_key(F.col("u")).alias("k"),
        surt_key(canonical_url(F.col("u"))).alias("k2"),
    ).collect()
    for r in rows:
        assert r["k"] is not None
        assert r["k"] == r["k2"]  # canonical fixpoint: same key
        host = r["c"].split("://", 1)[1].split("/", 1)[0].split(":")[0]
        labels = host.split(".")
        if host.startswith("www.") and len(labels) > 2:
            labels = labels[1:]
        rev = ",".join(reversed(labels))
        assert r["k"].startswith(rev + ")") or r["k"].startswith(
            rev + ":"
        ), (r["u"], r["k"], rev)
    # scheme-insensitivity: flipping http<->https yields the same keys
    odf = spark.createDataFrame(
        [(u,) for u in urls]
        + [(u.replace("http://", "https://", 1)
            if u.startswith("http://")
            else u.replace("https://", "http://", 1),)
           for u in urls],
        "u string",
    )
    ks = [r["k"] for r in odf.select(surt_key(F.col("u")).alias("k"))
          .collect()]
    n = len(urls)
    assert ks[:n] == ks[n:]  # http and https collapse to one key
