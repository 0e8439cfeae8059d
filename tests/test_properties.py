"""Property-based invariants (SURVEY §5.4) via hypothesis.

Each property runs a bounded number of examples (Spark jobs are
~100 ms each); the generators are chosen to hit the semantic edges the
differential gate can't sweep — arbitrary partition orders for money
sums, NULL patterns for row-wise stddev, skewed key multisets for the
salted join and two-phase distinct.
"""

from __future__ import annotations

import math
import statistics

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

#: cent-valued amounts (the money domain: exact at 2 decimals)
amounts = st.lists(
    st.integers(min_value=-10_000_00, max_value=10_000_00).map(lambda c: c / 100.0),
    min_size=1,
    max_size=40,
)


@given(vals=amounts, parts=st.integers(min_value=1, max_value=8))
@SET
def test_money_sum_is_partition_order_independent(spark, vals, parts):
    from data_quality_checks_in_relational_database_spark.functions.scalars import money_sum

    base = spark.createDataFrame([(v,) for v in vals], "v: double")
    a = base.coalesce(1).agg(money_sum("v").alias("s")).collect()[0]["s"]
    b = (
        base.repartition(parts)
        .agg(money_sum("v").alias("s"))
        .collect()[0]["s"]
    )
    assert a == b
    # and it equals the exact integer-cents sum
    assert a == round(sum(round(v * 100) for v in vals)) / 100.0


keys = st.lists(
    st.sampled_from(["hot"] * 6 + ["a", "b", "c", "d"]), min_size=1, max_size=30
)


@given(ks=keys, n_salts=st.integers(min_value=1, max_value=5))
@SET
def test_salted_join_equals_plain_join_property(spark, ks, n_salts):
    from data_quality_checks_in_relational_database_spark.operators.skew import salted_join

    big = spark.createDataFrame([(k, i) for i, k in enumerate(ks)], ["k", "v"])
    small = spark.createDataFrame(
        [("hot", 1), ("a", 2), ("z", 3)], ["k", "w"]
    )
    for how in ("inner", "left"):
        plain = sorted(map(tuple, big.join(small, "k", how).collect()))
        salted = sorted(
            map(tuple, salted_join(big, small, "k", n_salts=n_salts, how=how).collect())
        )
        assert plain == salted


@given(ks=keys)
@SET
def test_two_phase_distinct_equals_count_distinct(spark, ks):
    from data_quality_checks_in_relational_database_spark.operators.skew import (
        two_phase_distinct_count,
    )

    df = spark.createDataFrame(
        [(k, i % 4) for i, k in enumerate(ks)], ["g", "u"]
    )
    want = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.count_distinct("u").alias("n")).collect()
    }
    got = {
        r["g"]: r["n_distinct"]
        for r in two_phase_distinct_count(df, "g", "u").collect()
    }
    assert got == want


triples = st.tuples(
    st.one_of(st.none(), st.integers(min_value=0, max_value=10_000)),
    st.one_of(st.none(), st.integers(min_value=0, max_value=10_000)),
    st.one_of(st.none(), st.integers(min_value=0, max_value=10_000)),
)


@given(t=triples)
@SET
def test_rowwise_stddev_matches_pandas_skipna(spark, t):
    """A5 semantics: NULLs skipped, ddof = n_nonnull - 1, NULL when
    fewer than 2 values — pandas ``std(axis=1)``, which the reference
    relies on (data_consistency_checks.py:140)."""
    from data_quality_checks_in_relational_database_spark.functions.scalars import (
        rowwise_stddev_samp,
    )

    df = spark.createDataFrame([t], "a: long, b: long, c: long")
    got = df.select(rowwise_stddev_samp("a", "b", "c").alias("s")).collect()[0]["s"]
    vals = [v for v in t if v is not None]
    if len(vals) < 2:
        assert got is None
    else:
        want = statistics.stdev(vals)
        assert got is not None and math.isclose(got, want, rel_tol=1e-12, abs_tol=1e-12)


@given(
    src=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=20),
    dst_extra=st.integers(min_value=0, max_value=3),
)
@SET
def test_reconciliation_variance_zero_iff_equal(spark, src, dst_extra):
    """PP:239 invariant: variance is 0 exactly when both sides agree."""
    from data_quality_checks_in_relational_database_spark.operators.checks import reconcile

    s = spark.createDataFrame(
        [(1, "t", float(sum(src)))], ["site_id", "table_name", "record_count"]
    )
    d = spark.createDataFrame(
        [(1, "t", float(sum(src) + dst_extra))],
        ["site_id", "table_name", "record_count"],
    )
    row = reconcile(s, d, keys=["site_id", "table_name"]).collect()[0]
    assert (row["variance"] == 0) == (dst_extra == 0)


#: small integer intervals over a few keys — hits stacking, touching
#: endpoints, point intervals, and cross-bucket layouts
intervals = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),     # key
        st.integers(min_value=0, max_value=60),    # start
        st.integers(min_value=0, max_value=25),    # length
    ),
    min_size=1,
    max_size=25,
)


@given(iv=intervals)
@SET
def test_overlap_stats_matches_brute_force(spark, iv):
    import itertools

    from data_quality_checks_in_relational_database_spark.operators.interval import overlap_stats

    rows = [(k, i, s, s + ln) for i, (k, s, ln) in enumerate(iv)]
    df = spark.createDataFrame(rows, "k int, rid int, s int, e int")
    expect = {}
    for (k1, _, s1, e1), (k2, _, s2, e2) in itertools.combinations(rows, 2):
        if k1 == k2 and s1 <= e2 and s2 <= e1:
            n, t = expect.get(k1, (0, 0))
            expect[k1] = (n + 1, t + min(e1, e2) - max(s1, s2))
    got = {
        r.k: (r.n_overlapping_pairs, r.total_overlap)
        for r in overlap_stats(df, "k", "s", "e").collect()
    }
    assert got == expect


@given(
    a=st.lists(st.sampled_from("wxyz"), min_size=1, max_size=20),
    b=st.lists(st.sampled_from("wxyz"), min_size=1, max_size=20),
)
@SET
def test_categorical_drift_symmetric_and_bounded(spark, a, b):
    from data_quality_checks_in_relational_database_spark.operators.diff import categorical_drift

    da = spark.createDataFrame([(v,) for v in a], "c string")
    db = spark.createDataFrame([(v,) for v in b], "c string")
    fwd = {r.category: r for r in categorical_drift(da, db, "c").collect()}
    rev = {r.category: r for r in categorical_drift(db, da, "c").collect()}
    total = sum(r.js_term for r in fwd.values())
    # js_term is rounded to 6 dp per category, so the sum can exceed
    # ln 2 by up to 5e-7 per category
    assert -1e-5 <= total <= math.log(2) + 1e-5
    # symmetry: swapping sides mirrors the shares and preserves js terms
    assert set(fwd) == set(rev)
    for c in fwd:
        assert fwd[c].js_term == rev[c].js_term
        assert (fwd[c].base_n, fwd[c].curr_n) == (rev[c].curr_n, rev[c].base_n)


#: small random event logs over few users/steps — hits equal
#: timestamps, missing steps, out-of-order step arrivals
event_logs = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),    # user
        st.integers(min_value=0, max_value=12),   # ts
        st.sampled_from(["s1", "s2", "s3", "zz"]),  # type (zz = non-step noise)
    ),
    min_size=1,
    max_size=30,
)


@given(log=event_logs)
@SET
def test_funnel_matches_recursive_definition(spark, log):
    from data_quality_checks_in_relational_database_spark.operators.funnel import funnel_report

    steps = ["s1", "s2", "s3"]
    df = spark.createDataFrame(
        [(u, t, e) for u, t, e in log], "user_id long, ts long, event_type string"
    ).withColumn("ts", F.timestamp_seconds(F.col("ts")))
    # reference: the recursive earliest-at-or-after definition
    users = {u for u, _, _ in log}
    counts = []
    conv = {}
    for si, s in enumerate(steps):
        nxt = {}
        for u in users:
            prev = 0 if si == 0 else conv.get(u)
            if si > 0 and prev is None:
                continue
            ts_list = [t for uu, t, e in log if uu == u and e == s and (si == 0 or t >= prev)]
            if ts_list:
                nxt[u] = min(ts_list)
        conv = nxt
        counts.append(len(conv))
    got = {r.step: r.n_users for r in funnel_report(df, "user_id", "ts", "event_type", steps).collect()}
    assert got == {i + 1: c for i, c in enumerate(counts)}


@given(log=event_logs, w=st.integers(min_value=0, max_value=8))
@SET
def test_windowed_funnel_matches_recursive_definition(spark, log, w):
    from data_quality_checks_in_relational_database_spark.operators.funnel import (
        funnel_report_windowed,
    )

    steps = ["s1", "s2", "s3"]
    df = spark.createDataFrame(
        [(u, t, e) for u, t, e in log], "user_id long, ts long, event_type string"
    ).withColumn("ts", F.timestamp_seconds(F.col("ts")))
    users = {u for u, _, _ in log}
    counts = []
    conv, anchor = {}, {}
    for si, s in enumerate(steps):
        nxt = {}
        for u in users:
            prev = 0 if si == 0 else conv.get(u)
            if si > 0 and prev is None:
                continue
            ts_list = [
                t
                for uu, t, e in log
                if uu == u
                and e == s
                and (si == 0 or (t >= prev and t <= anchor[u] + w))
            ]
            if ts_list:
                nxt[u] = min(ts_list)
                if si == 0:
                    anchor[u] = min(ts_list)
        conv = nxt
        counts.append(len(conv))
    got = {
        r.step: r.n_users
        for r in funnel_report_windowed(
            df, "user_id", "ts", "event_type", steps, within_seconds=w
        ).collect()
    }
    assert got == {i + 1: c for i, c in enumerate(counts)}


#: random CDC logs: few keys, colliding timestamps, mixed op kinds
cdc_logs = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),   # key
        st.integers(min_value=0, max_value=6),   # ts (collisions likely)
        st.sampled_from(["upsert", "delete"]),
    ),
    min_size=1,
    max_size=25,
)


@given(log=cdc_logs)
@SET
def test_cdc_compact_matches_reference(spark, log):
    from data_quality_checks_in_relational_database_spark.operators.diff import cdc_compact

    rows = [(k, t, seq, op) for seq, (k, t, op) in enumerate(log)]
    df = spark.createDataFrame(rows, "k long, ts long, seq long, op string")
    # reference: latest (ts, seq) per key wins; delete-winners drop
    latest = {}
    for k, t, seq, op in rows:
        if k not in latest or (t, seq) > latest[k][:2]:
            latest[k] = (t, seq, op)
    expect = {k: (t, seq) for k, (t, seq, op) in latest.items() if op != "delete"}
    got = {r.k: (r.ts, r.seq) for r in cdc_compact(df, "k", "ts", "seq", "op").collect()}
    assert got == expect


@given(
    vecs=st.lists(
        st.lists(
            st.integers(min_value=-50, max_value=50).map(float),
            min_size=4,
            max_size=4,
        ).filter(lambda v: any(x != 0 for x in v)),
        min_size=2,
        max_size=20,
    ),
    thr=st.sampled_from([0.2, 0.5, 0.9]),
    blocks=st.integers(min_value=1, max_value=5),
)
@SET
def test_blockjoin_allpairs_matches_numpy(spark, vecs, thr, blocks):
    """The distributed block-pair cosine join must emit EXACTLY the
    numpy-computed pair set at any block count and any threshold —
    including pairs split across hash blocks and thresholds near ties."""
    import numpy as np

    from data_quality_checks_in_relational_database_spark.operators.similarity import (
        cosine_allpairs_blockjoin,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    M = np.array(vecs, dtype=np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    S = M @ M.T
    want = {
        (i, j)
        for i in range(len(vecs))
        for j in range(i + 1, len(vecs))
        if S[i, j] >= thr - 1e-12  # float ulp guard at exact-tie thresholds
    }
    strict = {
        (i, j)
        for i in range(len(vecs))
        for j in range(i + 1, len(vecs))
        if S[i, j] >= thr + 1e-12
    }
    got = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in cosine_allpairs_blockjoin(df, threshold=thr, num_blocks=blocks).collect()
    }
    assert strict <= got <= want


@given(
    keys=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60),
    parts=st.integers(min_value=1, max_value=6),
)
@SET
def test_cms_overcount_only_and_partition_independent(spark, keys, parts):
    """CMS invariants under arbitrary multisets and partitionings:
    estimates never undercount, and the counter matrix is identical
    for any physical layout (md5 hashing is data-only)."""
    from data_quality_checks_in_relational_database_spark.operators.sketch import (
        cms_counters,
        cms_topk,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    out = cms_topk(df, "k", k=100, depth=3, width=32).collect()
    exact = {}
    for k in keys:
        exact[str(k)] = exact.get(str(k), 0) + 1
    assert {r["key"]: r["exact_count"] for r in out} == dict(
        sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    ) or len(exact) > 100
    for r in out:
        assert r["est_count"] >= r["exact_count"]
    a = {(r["row"], r["bucket"]): r["cnt"] for r in cms_counters(df, "k", 3, 32).collect()}
    b = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_counters(df.repartition(parts), "k", 3, 32).collect()
    }
    assert a == b


# --- round-3 numeric kernels ---

_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=1, max_value=5),
    ),
    min_size=1,
    max_size=25,
)


@SET
@given(es=_edges)
def test_pagerank_mass_conserved_and_positive(spark, es):
    """For ANY multigraph (self-loops, dangling nodes, duplicates):
    ranks are positive and sum to 1 (within rounding of the emitted
    6-dp values)."""
    from data_quality_checks_in_relational_database_spark.operators.graph import pagerank

    df = spark.createDataFrame(
        [(f"n{a}", f"n{b}", float(w)) for a, b, w in es],
        "src string, dst string, w double",
    )
    rows = pagerank(df, weight_col="w", iters=5).collect()
    nodes = {f"n{a}" for a, _, _ in es} | {f"n{b}" for _, b, _ in es}
    assert {r["node"] for r in rows} == nodes
    assert all(r["rank"] > 0 for r in rows)
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-4


_points = st.lists(
    st.tuples(
        st.floats(min_value=-50, max_value=50, allow_nan=False),
        st.floats(min_value=-50, max_value=50, allow_nan=False),
    ),
    min_size=3,
    max_size=30,
    unique=True,
)


@settings(
    max_examples=5,  # each example runs 6 distributed Lloyd fits
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pts=_points)
def test_kmeans_objective_never_increases(spark, pts):
    """Lloyd invariant: the within-cluster sum of squares after one
    more update round never exceeds the previous round's."""
    import numpy as np

    from data_quality_checks_in_relational_database_spark.operators import linalg as la

    x = np.asarray(pts)
    df = spark.createDataFrame(
        [(i, list(map(float, p))) for i, p in enumerate(pts)],
        "vec_id long, embedding array<double>",
    )

    def wcss(c):
        return float(((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2).min(axis=1).sum())

    prev = None
    for iters in (1, 2, 3):
        c = la.kmeans_fit(df, k=2, iters=iters)
        cur = wcss(c)
        if prev is not None:
            assert cur <= prev + 1e-9
        prev = cur


# --------------------------------------------------------------- codecs (r5)


@st.composite
def _pcm_channels(draw):
    nc = draw(st.integers(min_value=1, max_value=3))
    nf = draw(st.integers(min_value=1, max_value=48))
    chans = [
        draw(
            st.lists(
                st.integers(min_value=-32768, max_value=32767),
                min_size=nf,
                max_size=nf,
            )
        )
        for _ in range(nc)
    ]
    return chans


@given(chans=_pcm_channels(), sr=st.sampled_from([8000, 16000, 44100]),
       note_len=st.integers(min_value=0, max_value=9))
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_property(chans, sr, note_len):
    """decode(encode(x)) reproduces every stat computed independently in
    plain Python, for arbitrary PCM16 content, channel counts, rates,
    and odd/even decoy-note lengths."""
    from data_quality_checks_in_relational_database_spark.operators.multimodal import (
        decode_wav,
        encode_wav_pcm16,
    )

    d = decode_wav(encode_wav_pcm16(chans, sr, note_len=note_len))
    flat = [chans[c][t] for t in range(len(chans[0])) for c in range(len(chans))]
    ch0 = chans[0]
    assert d["n_channels"] == len(chans)
    assert d["sample_rate"] == sr
    assert d["n_frames"] == len(ch0)
    assert d["duration_ms"] == len(ch0) * 1000 // sr
    assert d["peak_abs"] == max(abs(v) for v in flat)
    assert d["sum_sq"] == sum(v * v for v in flat)
    assert d["n_clipped"] == sum(1 for v in flat if v >= 32767 or v <= -32768)
    assert d["zero_cross"] == sum(
        1 for i in range(1, len(ch0)) if (ch0[i - 1] < 0) != (ch0[i] < 0)
    )


@st.composite
def _pixels(draw):
    w = draw(st.integers(min_value=1, max_value=12))
    h = draw(st.integers(min_value=1, max_value=8))
    return [
        draw(st.lists(st.integers(min_value=0, max_value=255), min_size=w, max_size=w))
        for _ in range(h)
    ]


@given(px=_pixels(), ft=st.integers(min_value=0, max_value=4))
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(px, ft):
    """Arbitrary grayscale content survives every scanline filter type
    bit-exactly (brightness is the exact integer milli-mean)."""
    from data_quality_checks_in_relational_database_spark.operators.multimodal import (
        decode_png,
        encode_png_gray,
    )

    d = decode_png(encode_png_gray(px, filter_type=ft))
    flat = [v for row in px for v in row]
    assert (d["width"], d["height"]) == (len(px[0]), len(px))
    assert d["n_samples"] == len(flat)
    assert d["brightness_milli"] == sum(flat) * 1000 // len(flat)


@st.composite
def _rgb_pixels(draw):
    w = draw(st.integers(min_value=1, max_value=7))
    h = draw(st.integers(min_value=1, max_value=6))
    return [
        [
            tuple(draw(st.integers(min_value=0, max_value=255)) for _ in range(3))
            for _ in range(w)
        ]
        for _ in range(h)
    ]


@given(px=_rgb_pixels(), topdown=st.booleans())
@settings(max_examples=60, deadline=None)
def test_bmp_roundtrip_property(px, topdown):
    """Arbitrary RGB content survives both BMP row orders bit-exactly:
    the position-weighted checksum equals the row-major-RGB reference
    regardless of on-disk layout (bottom-up flip + padding + BGR are
    all decoder responsibilities)."""
    from data_quality_checks_in_relational_database_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp24,
    )

    d = decode_bmp(encode_bmp24(px, topdown=topdown))
    flat = [v for row in px for p in row for v in p]
    wsum = 0
    for i, v in enumerate(flat, 1):
        wsum = (wsum + v * i) % 2147483647
    assert (d["width"], d["height"]) == (len(px[0]), len(px))
    assert d["topdown"] is topdown
    assert d["brightness_milli"] == sum(flat) * 1000 // len(flat)
    assert d["weighted_checksum"] == wsum
