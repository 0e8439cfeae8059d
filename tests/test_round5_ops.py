"""Round-5 pins: k-core convergence + multigraph hygiene, debounce
schema derivation, PNG truncated-chunk contract (r4 ADVICE items)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------- k-core


def test_kcore_multigraph_input_does_not_inflate_degrees(spark):
    """Duplicate edges and self-loops must not count toward degree —
    node 4 has one real neighbor (3×-duplicated edge) plus a self-loop;
    under the old COUNT(*) it would look degree-5 and survive k=2."""
    from data_quality_checks_in_relational_database_spark.operators.graph import kcore_peel

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3),            # triangle: the true 2-core
         (3, 4), (3, 4), (4, 3),            # duplicated pendant edge
         (4, 4), (4, 4)],                   # self-loops
        "src long, dst long",
    )
    rows = {r["node"]: r for r in kcore_peel(edges, k=2, rounds=4).collect()}
    assert {n for n, r in rows.items() if r["in_kcore"]} == {1, 2, 3}
    assert rows[4]["in_kcore"] is False and rows[4]["core_degree"] == 0


@pytest.mark.parametrize(
    "sf_dir",
    ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"],
)
def test_kcore_boilerplate_converges_at_shipped_sfs(spark, sf_dir):
    """``in_kcore`` means "survived ``rounds`` peels" — this asserts the
    registered round budget has actually converged at every shipped SF
    (rounds and rounds+1 produce identical membership), so the unrolled
    oracle's inability to see under-peeling is moot on shipped data."""
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} absent")
    from data_quality_checks_in_relational_database_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from data_quality_checks_in_relational_database_spark.operators.graph import kcore_peel
    from data_quality_checks_in_relational_database_spark.plans.graph_queries import (
        _KCORE_K,
        _KCORE_ROUNDS,
    )
    from data_quality_checks_in_relational_database_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    # checkpoint the (expensive) pair source once; peel twice from it
    pairs = minhash_lsh_pairs(docs, threshold=0.5).localCheckpoint()

    def membership(rounds):
        return {
            (r["node"], r["core_degree"], r["in_kcore"])
            for r in kcore_peel(
                pairs, k=_KCORE_K, rounds=rounds, src="doc_id_a", dst="doc_id_b"
            ).collect()
        }

    at_budget = membership(_KCORE_ROUNDS)
    assert at_budget == membership(_KCORE_ROUNDS + 1)
    # non-vacuous: some survivors AND some peeled nodes exist
    assert any(r[2] for r in at_budget)
    assert any(not r[2] for r in at_budget)


# ----------------------------------------------------------- debounce


def test_debounce_events_derives_schema_from_input(spark):
    """String event ids + int user keys must round-trip — the output
    schema is derived from the input columns, not hardcoded."""
    from data_quality_checks_in_relational_database_spark.operators.funnel import (
        debounce_events,
    )

    events = spark.createDataFrame(
        [
            ("e1", 7, "click", "2024-01-01 00:00:00"),
            ("e2", 7, "click", "2024-01-01 00:00:03"),
            ("e3", 7, "click", "2024-01-01 00:00:20"),
            ("e4", 8, "view", "2024-01-01 00:00:00"),
        ],
        "event_id string, user_id int, event_type string, ts string",
    )
    out = debounce_events(
        events, gap_seconds=10, id_col="event_id", user_col="user_id",
        type_col="event_type", ts_col="ts",
    )
    assert dict(out.dtypes)["event_id"] == "string"
    assert dict(out.dtypes)["user_id"] == "int"
    kept = {r["event_id"]: r["kept"] for r in out.collect()}
    assert kept == {"e1": True, "e2": False, "e3": True, "e4": True}


# ---------------------------------------------------------------- PNG


def test_decode_png_truncated_chunk_raises_value_error():
    """A chunk whose declared length runs past the payload end must hit
    the documented ValueError contract, not struct.error."""
    from data_quality_checks_in_relational_database_spark.operators.multimodal import (
        _build_png_codec,
    )

    encode_png_gray, decode_png = _build_png_codec()
    good = encode_png_gray([[10, 20, 30, 40], [50, 60, 70, 80], [90, 100, 110, 120]])
    # cut IEND (12 bytes) plus 1 byte of IDAT's CRC: IDAT's declared
    # length now extends past the payload end
    truncated = good[: len(good) - 13]
    with pytest.raises(ValueError, match="truncated PNG chunk"):
        decode_png(truncated)
    # and a declared length beyond the end inside a middle chunk
    import struct

    blown = bytearray(good)
    # IHDR length field sits at offset 8; inflate it past payload end
    blown[8:12] = struct.pack(">I", len(good))
    with pytest.raises(ValueError, match="truncated PNG chunk"):
        decode_png(bytes(blown))


# ------------------------------------------------------------- passjoin


def test_passjoin_pairs_equals_brute_force(spark):
    """PassJoin blocking must be LOSSLESS: at every radius the verified
    candidate set equals the naive all-pairs join filtered to
    dist <= radius (random short strings incl. empty / sub-radius)."""
    import itertools
    import random

    from data_quality_checks_in_relational_database_spark.operators.fuzzy import (
        passjoin_pairs,
    )

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                cur = dp[j]
                dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
                prev = cur
        return dp[-1]

    rng = random.Random(7)
    strs = ["".join(rng.choice("abcd") for _ in range(rng.randint(0, 12)))
            for _ in range(60)]
    df = spark.createDataFrame(list(enumerate(strs)), "rid int, txt string")
    for radius in (1, 3, 7):
        got = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in passjoin_pairs(df, radius, "rid", "txt").collect()
        }
        want = {
            (i, j, lev(a, b))
            for (i, a), (j, b) in itertools.combinations(enumerate(strs), 2)
            if lev(a, b) <= radius
        }
        assert got == want, (radius, len(got), len(want))


# ------------------------------------------- bucketed cumulative (KS/W1)


def _unpartitioned_windows(df):
    """Window nodes whose spec has NO partition columns — the first
    windowspecdefinition argument is then a sort item (… ASC/DESC)."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    return [
        m.group(0)
        for m in re.finditer(r"windowspecdefinition\([^,)]*? (ASC|DESC)", plan)
    ]


def test_ks_w1_high_cardinality_no_global_window(spark):
    """A continuous, high-cardinality value domain through KS/W1 must
    (a) match a brute-force ECDF computation and (b) plan NO
    unpartitioned window over the distinct-value table (r4 verdict #3:
    the two-phase bucketed cumulative)."""
    import random
    from bisect import bisect_right

    from data_quality_checks_in_relational_database_spark.operators.diff import (
        ks_two_sample,
        wasserstein_two_sample,
    )

    rng = random.Random(11)
    # integer-valued but HIGH-cardinality (W1's documented decimals=0
    # integer-gap contract) — ~7000 distinct values over a wide range
    av = [float(int(rng.gauss(0, 1) * 1_000_000)) for _ in range(4000)]
    bv = [float(int(rng.gauss(0.3, 1.2) * 1_000_000)) for _ in range(3000)]
    a = spark.createDataFrame([(x,) for x in av], "x double")
    b = spark.createDataFrame([(x,) for x in bv], "x double")

    sa, sb, na, nb = sorted(av), sorted(bv), len(av), len(bv)
    vs = sorted(set(av) | set(bv))
    want_d = max(
        abs(bisect_right(sa, v) * nb - bisect_right(sb, v) * na) for v in vs
    )
    want_w1 = sum(
        abs(bisect_right(sa, v) * nb - bisect_right(sb, v) * na) * int(nxt - v)
        for v, nxt in zip(vs, vs[1:])
    )

    ks = ks_two_sample(a, b, "x", decimals=0)
    row = ks.collect()[0]
    assert (row["n_a"], row["n_b"], row["d_numer"]) == (na, nb, want_d)
    assert _unpartitioned_windows(ks) == []

    w1 = wasserstein_two_sample(a, b, "x", decimals=0)
    row = w1.collect()[0]
    assert row["w1_numer"] == want_w1
    assert _unpartitioned_windows(w1) == []


def test_exact_global_quantiles_no_global_window(spark):
    from data_quality_checks_in_relational_database_spark.plans.pipeline_queries import (
        q_exact_global_quantiles,
    )

    df = q_exact_global_quantiles(spark, SF_SMOKE)
    assert df.collect()[0]["n_rows"] > 0
    assert _unpartitioned_windows(df) == []


def test_bucketed_cumulative_tiny_and_single_bucket(spark):
    """Degenerate shapes: one row, and all rows in one bucket."""
    from data_quality_checks_in_relational_database_spark.operators.cumulative import (
        bucketed_cumulative,
    )

    one = spark.createDataFrame([(5.0, 3)], "v double, c long")
    r = bucketed_cumulative(one, "v", ["c"], lead_value=True).collect()
    assert [(x["cum_c"], x["n_c"], x["next_v"]) for x in r] == [(3, 3, None)]

    few = spark.createDataFrame(
        [(1.0, 2), (2.0, 5), (4.0, 1)], "v double, c long"
    )
    rows = sorted(
        bucketed_cumulative(few, "v", ["c"], num_buckets=2, lead_value=True).collect(),
        key=lambda x: x["v"],
    )
    assert [(x["v"], x["cum_c"], x["n_c"], x["next_v"]) for x in rows] == [
        (1.0, 2, 8, 2.0),
        (2.0, 7, 8, 4.0),
        (4.0, 8, 8, None),
    ]


# ----------------------------------------------------- bootstrap codegen


def test_bootstrap_ci_compiles_under_strict_codegen(spark):
    """The replica fan-out must stay inside janino's 64 KB method limit
    (the unrolled 50-copy md5 ladder used to fail compilation and drop
    to interpreted execution). With the codegen fallback disabled, a
    compile failure becomes a hard error."""
    from data_quality_checks_in_relational_database_spark.plans.extension_queries import (
        q_bootstrap_ci,
    )

    prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        rows = q_bootstrap_ci(spark, SF_SMOKE).collect()
        assert len(rows) > 0
        assert all(r["ci_lo"] <= r["ci_hi"] for r in rows)
    finally:
        spark.conf.set("spark.sql.codegen.fallback", prev)


# ---------------------------------------------------------------- JPEG


def test_jpeg_probe_roundtrip_and_decoys():
    from data_quality_checks_in_relational_database_spark.operators.multimodal import (
        decode_image,
        encode_jpeg_stub,
        probe_jpeg,
    )

    for (w, h, nc, prog, seed) in [
        (1, 1, 1, False, 0),
        (316, 211, 3, True, 7),
        (65535, 65535, 4, False, 255),
        (13, 200, 2, True, 28),
    ]:
        b = encode_jpeg_stub(w, h, nc, progressive=prog, filler_seed=seed)
        d = probe_jpeg(b)
        assert (d["width"], d["height"], d["n_components"], d["progressive"]) == (
            w, h, nc, prog,
        )
        assert d["precision"] == 8
    # the decoy COM segment contains an FF C0 byte pair with bogus
    # dimensions — a byte-scan parser would return garbage; the walker
    # must NOT (asserted implicitly above since dims round-trip)
    b = encode_jpeg_stub(10, 10, 3)
    assert b"\xff\xc0\x00\x11\x08\xfa" in b  # decoy really present
    # dispatch through decode_image by magic bytes and by format tag
    assert decode_image(b, "jpeg")["width"] == 10
    assert decode_image(b, "unknown")["height"] == 10  # FFD8 sniffed
    import pytest as _pytest

    with _pytest.raises(ValueError):
        probe_jpeg(b[:20])  # truncated before SOF
    with _pytest.raises(ValueError):
        probe_jpeg(bytes([0, 1, 2, 3]))  # bad SOI
    # 0xFF fill bytes before a marker are legal padding
    padded = b[:2] + b"\xff" + b[2:]
    assert probe_jpeg(padded)["width"] == 10


# --------------------------------------------------- PPJoin positional


def test_prefix_filter_positional_is_lossless(spark):
    """PPJoin's positional prune must not drop any true pair: at every
    threshold the prefix-filter result equals the naive all-pairs
    Jaccard join (pinned on random short documents with a tiny shared
    vocabulary — the worst case for prefix selectivity)."""
    import itertools
    import random

    from data_quality_checks_in_relational_database_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 18))))
        for i in range(50)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def sh(text, n=3):
        t = text.split()
        return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}

    for t in (0.3, 0.5, 0.7, 0.9):
        got = {
            (r["doc_id_a"], r["doc_id_b"])
            for r in prefix_filter_jaccard_pairs(df, threshold=t).collect()
        }
        want = set()
        for (i, a), (j, b) in itertools.combinations(docs, 2):
            sa, sb = sh(a), sh(b)
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter / (len(sa) + len(sb) - inter) >= t:
                want.add((i, j))
        assert got == want, (t, len(got), len(want))


def test_ks_value_drift_plan_has_no_unpartitioned_window(spark):
    from data_quality_checks_in_relational_database_spark.plans.pipeline_queries import (
        q_ks_value_drift,
    )

    df = q_ks_value_drift(spark, SF_SMOKE)
    assert df.collect()[0]["n_a"] > 0
    assert _unpartitioned_windows(df) == []


# ----------------------------------------------------- stratified sample


def test_stratified_sample_exact_budget(spark):
    """Largest-remainder allocation must hand out EXACTLY the budget
    whenever the corpus is big enough, with every quota respected."""
    from data_quality_checks_in_relational_database_spark.plans.curation_queries import (
        _STRAT_BUDGET,
        q_stratified_sample,
    )

    rows = q_stratified_sample(spark, "/root/testdata/sf0.01").collect()
    assert sum(r["n_sampled"] for r in rows) == _STRAT_BUDGET
    assert all(r["n_sampled"] == r["quota"] for r in rows)


def test_ngram_novelty_first_doc_gets_full_credit(spark):
    """A doc fully duplicated later keeps novelty 1.0; the copy gets 0."""
    from data_quality_checks_in_relational_database_spark.operators.dedup import (
        shingle_sets,
    )
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "x y z w v")],
        "doc_id long, text string",
    )
    sh = shingle_sets(docs, "text", "doc_id", 3)
    ex = sh.select("doc_id", F.size("shingles").alias("n"), F.explode("shingles").alias("g"))
    first = ex.groupBy("g").agg(F.min("doc_id").alias("fd"))
    nov = (
        ex.join(first, "g").groupBy("doc_id", "n")
        .agg(F.sum((F.col("fd") == F.col("doc_id")).cast("long")).alias("novel"))
        .collect()
    )
    by_id = {r["doc_id"]: r["novel"] / r["n"] for r in nov}
    assert by_id == {1: 1.0, 2: 0.0, 3: 1.0}


def test_bucketed_cumulative_equals_naive_on_random_data(spark):
    """Property: for random high-cardinality values, the two-phase
    bucketed running totals equal a driver-side cumsum — across bucket
    counts above and below the partition count, with lead_value."""
    import random

    from data_quality_checks_in_relational_database_spark.operators.cumulative import (
        bucketed_cumulative,
    )

    rng = random.Random(5)
    data = [(rng.uniform(-1e6, 1e6), rng.randint(1, 9)) for _ in range(5000)]
    vals = sorted(set(v for v, _ in data))
    # make v unique per row like callers do (aggregate first)
    agg = {}
    for v, c in data:
        agg[v] = agg.get(v, 0) + c
    rows = sorted(agg.items())
    df = spark.createDataFrame(rows, "v double, c long")
    for nb in (4, 64, 256):
        out = {
            r["v"]: (r["cum_c"], r["n_c"], r["next_v"])
            for r in bucketed_cumulative(df, "v", ["c"], num_buckets=nb,
                                         lead_value=True).collect()
        }
        run, total = 0, sum(c for _, c in rows)
        for i, (v, c) in enumerate(rows):
            run += c
            nxt = rows[i + 1][0] if i + 1 < len(rows) else None
            assert out[v] == (run, total, nxt), (nb, v)


# ------------------------------------------------- scale_queries (r5 batch 2)


def test_zorder_skipping_invariants_and_real_pruning(spark):
    """The zone-map audit's layouts must agree on true selectivity
    (rows_matched is layout-independent), obey touched ≤ total, and the
    Z-order layout must actually prune for the 2-D predicate — the
    whole point of interleaving is beating BOTH single-column sorts on
    a conjunctive range filter."""
    from data_quality_checks_in_relational_database_spark.plans.scale_queries import q_zorder_skipping

    rows = {r["layout"]: r for r in q_zorder_skipping(spark, SF_SMOKE).collect()}
    assert set(rows) == {"zorder", "price_sort", "date_sort"}
    matched = {r["rows_matched"] for r in rows.values()}
    assert len(matched) == 1 and matched.pop() > 0, "predicate must be non-vacuous"
    for r in rows.values():
        assert 0 < r["files_touched"] <= r["n_files"]
        assert r["rows_touched"] >= r["rows_matched"]
    assert rows["zorder"]["rows_touched"] <= rows["price_sort"]["rows_touched"]
    assert rows["zorder"]["rows_touched"] <= rows["date_sort"]["rows_touched"]
    assert rows["zorder"]["files_touched"] < rows["zorder"]["n_files"]


def test_md5_u32_matches_duckdb(spark):
    """Bit-for-bit parity of the 32-bit portable hash (the minhash_error
    permutation input) against DuckDB's hex-cast idiom, unicode included."""
    import duckdb

    from data_quality_checks_in_relational_database_spark.functions.scalars import md5_u32

    vals = ["", "a", "the quick brown fox", "héllo wörld", "0", "ab cd ef"]
    got = {
        r["v"]: r["h"]
        for r in spark.createDataFrame([(v,) for v in vals], "v string")
        .select("v", md5_u32("v").alias("h"))
        .collect()
    }
    con = duckdb.connect()
    for v in vals:
        want = con.execute(
            "SELECT CAST('0x' || substr(md5(?), 1, 8) AS BIGINT)", [v]
        ).fetchone()[0]
        assert got[v] == want, v


def test_minhash_error_non_vacuous_and_bounded(spark):
    """The estimator audit must see real pairs at the smoke SF, and the
    scaled error obeys its algebraic bound |matches·u − K·sh| ≤ K·u
    (both terms live in [0, K·u])."""
    from data_quality_checks_in_relational_database_spark.plans.scale_queries import (
        _MH_K,
        q_minhash_error,
    )

    row = q_minhash_error(spark, SF_SMOKE).collect()[0]
    assert row["k_perm"] == _MH_K
    assert row["n_pairs"] > 0, "no candidate pairs — audit is vacuous at smoke SF"
    assert 0 <= row["sum_matches"] <= _MH_K * row["n_pairs"]
    assert row["max_scaled_err"] >= 0
    # near-dup pairs (J ≥ 0.5) should have estimates far above random:
    # mean matches per pair ≥ K/4 would already be loose; assert > 0
    assert row["sum_matches"] > 0, "estimator is degenerate (all-miss signatures)"


def test_token_fertility_exact_on_punctuated_corpus(spark):
    """On real punctuated text fertility exceeds 1 (the shipped synthetic
    corpus is bare alphabetic words, where fertility is exactly 1.0 —
    pinned here too so a testdata change is noticed). Counts are exact:
    "don't stop." → 2 whitespace words, 5 BPE-ish tokens."""
    from data_quality_checks_in_relational_database_spark.functions.scalars import token_count
    from data_quality_checks_in_relational_database_spark.operators import text as tx
    from data_quality_checks_in_relational_database_spark.plans.scale_queries import q_token_fertility

    df = spark.createDataFrame(
        [(1, "don't stop."), (2, "the of and 3.14")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["w"], r["bpe"])
        for r in df.select(
            "doc_id",
            token_count("text").alias("w"),
            tx.bpe_token_count("text").alias("bpe"),
        ).collect()
    }
    # don't → [don, ', t]; stop. → [stop, .]
    assert got[1] == (2, 5)
    # 3.14 → [3, ., 14]
    assert got[2] == (4, 6)

    for r in q_token_fertility(spark, SF_SMOKE).collect():
        assert r["fertility"] == 1.0, (
            "synthetic corpus grew punctuation — update the vacuity note "
            f"in scale_queries.q_token_fertility: {r}"
        )


# ------------------------------------------- hilbert curve (r5 batch 3)


def test_hilbert_xy2d_bijective_and_never_jumps():
    """The two defining curve properties on a 32×32 grid: every cell
    gets a distinct position (bijection) and consecutive positions are
    grid NEIGHBORS (|dx|+|dy| = 1) — the locality Morton lacks and the
    entire reason hilbert_skipping's zone maps stay tight."""
    from data_quality_checks_in_relational_database_spark.operators.layout import hilbert_xy2d

    side = 32
    pos = {}
    for x in range(side):
        for y in range(side):
            d = hilbert_xy2d(side, x, y)
            assert 0 <= d < side * side
            pos[d] = (x, y)
    assert len(pos) == side * side
    for d in range(1, side * side):
        (x0, y0), (x1, y1) = pos[d - 1], pos[d]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, (d, pos[d - 1], pos[d])


def test_hilbert_lookup_matches_python(spark):
    """The broadcast lookup table IS the pure-Python curve."""
    from data_quality_checks_in_relational_database_spark.operators.layout import (
        hilbert_lookup,
        hilbert_xy2d,
    )

    rows = hilbert_lookup(spark, bits=4).collect()
    assert len(rows) == 256
    for r in rows:
        assert r["hd"] == hilbert_xy2d(16, r["hx"], r["hy"])


def test_hilbert_skipping_row_balance_and_dominance(spark):
    """Row-balanced curve packing: both layouts agree on true
    selectivity, cut into exactly 64 files, genuinely prune, and the
    Hilbert layout never touches more rows than Z-order for the 2-D
    box (it reads strictly fewer at every shipped SF — the measured
    liquid-clustering argument)."""
    from data_quality_checks_in_relational_database_spark.plans.scale_queries import (
        _HNF,
        q_hilbert_skipping,
    )

    rows = {r["layout"]: r for r in q_hilbert_skipping(spark, SF_SMOKE).collect()}
    assert set(rows) == {"hilbert", "zorder"}
    h, z = rows["hilbert"], rows["zorder"]
    assert h["rows_matched"] == z["rows_matched"] > 0
    assert h["n_files"] == z["n_files"] == _HNF
    for r in (h, z):
        assert 0 < r["files_touched"] < r["n_files"]
        assert r["rows_touched"] >= r["rows_matched"]
    assert h["files_touched"] <= z["files_touched"]
    assert h["rows_touched"] <= z["rows_touched"]


def test_bucketed_cumulative_tiebreak_matches_row_number(spark):
    """Property (r8): with a tiebreak column, cum of a 1-column over
    lexicographic (value, tiebreak) equals ROW_NUMBER over that total
    order — including HEAVY ties (few distinct values, many tiebreaks),
    the regime plain value-boundary bucketing cannot split — across
    bucket counts, with the composite-double cut."""
    import random

    from data_quality_checks_in_relational_database_spark.operators.cumulative import (
        bucketed_cumulative,
    )

    rng = random.Random(11)
    # 3 distinct values x ~1700 unique tiebreaks each: every value
    # group spans many buckets only if the composite cut splits ties
    rows = [(rng.randint(0, 2), k) for k in rng.sample(range(10**9), 5000)]
    df = spark.createDataFrame(rows, "v long, t long").withColumn(
        "c", F.lit(1).cast("long")
    )
    expected = {
        (v, t): i + 1 for i, (v, t) in enumerate(sorted(rows))
    }
    for nb in (4, 64):
        got = bucketed_cumulative(
            df, "v", ["c"], num_buckets=nb, tiebreak_col="t"
        ).collect()
        assert len(got) == len(rows)
        for r in got:
            assert r["cum_c"] == expected[(r["v"], r["t"])], (nb, r)
            assert r["n_c"] == len(rows)
    # the composite cut must actually SPLIT the tied groups: with 3
    # distinct values and 64 requested buckets, a value-only cut would
    # yield <= 3 buckets; assert the plan got real spread by checking
    # per-bucket balance indirectly (no partition holds everything):
    from pyspark.sql import functions as SF

    part = bucketed_cumulative(
        df, "v", ["c"], num_buckets=64, tiebreak_col="t"
    )
    # re-derive the internal bucket spread via approxQuantile on the
    # same composite: >= 10 distinct cut points expected on 5000 rows
    comp = df.withColumn(
        "_cv", SF.col("v").cast("double") * float(1 << 40) + SF.col("t").cast("double")
    )
    bounds = set(comp.approxQuantile("_cv", [i / 64 for i in range(1, 64)], 0.004))
    assert len(bounds) >= 10


def test_bucketed_cumulative_plan_has_no_range_exchange(spark):
    """Regression pin for the dual-materialization hazard: the bucket
    id must be a deterministic literal-boundary expression, never a
    range exchange + spark_partition_id (two consumers of an unpinned
    range exchange can sample DIFFERENT boundaries, silently skewing
    every offset — caught live by hilbert_skipping's cells frame).
    Also re-checks exactness on a SHUFFLE-DERIVED frame (the
    createDataFrame property pin above never tripped the original
    bug; a grouped parquet scan did)."""
    from data_quality_checks_in_relational_database_spark.operators.cumulative import (
        bucketed_cumulative,
    )
    from data_quality_checks_in_relational_database_spark.session import load_tables

    li = load_tables(spark, SF_SMOKE, ("lineitem",))["lineitem"]
    per = li.groupBy(F.col("l_partkey").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    cum = bucketed_cumulative(per, "v", ["c"], num_buckets=16)
    plan = cum._sc._jvm.PythonSQLUtils.explainString(
        cum._jdf.queryExecution(), "formatted"
    )
    assert "rangepartitioning" not in plan.lower(), plan
    got = sorted((r["v"], r["c"], r["cum_c"]) for r in cum.collect())
    run = 0
    for v, c, cm in got:
        run += c
        assert cm == run, (v, cm, run)


# ------------------------------------------- WAV codec (r5 batch 3)


def _wav_parts():
    from data_quality_checks_in_relational_database_spark.operators.multimodal import (
        decode_wav,
        encode_wav_pcm16,
    )

    return encode_wav_pcm16, decode_wav


def test_wav_roundtrip_exact_stats_stereo():
    """Hand-computed stats on a crafted stereo wave: peak, energy,
    channel-0 zero crossings (frame-major interleave — a channel-major
    encoder bug would change the reconstructed channel 0 and miscount),
    clipping at the int16 rails."""
    enc, dec = _wav_parts()
    ch0 = [0, 100, -100, 32767, -32768, 0]
    ch1 = [1, 2, 3, 4, 5, 6]
    d = dec(enc([ch0, ch1], 8000, note_len=5))
    assert d["n_channels"] == 2
    assert d["sample_rate"] == 8000
    assert d["n_frames"] == 6
    assert d["duration_ms"] == 6 * 1000 // 8000
    assert d["peak_abs"] == 32768
    assert d["sum_sq"] == sum(v * v for v in ch0 + ch1)
    # (0,100) no, (100,-100) yes, (-100,32767) yes, (32767,-32768) yes,
    # (-32768,0) yes — sign(0) counts as non-negative
    assert d["zero_cross"] == 4
    assert d["n_clipped"] == 2  # both int16 rails, channel 0 only


def test_wav_decoy_data_tag_and_odd_padding():
    """The LIST chunk body contains the ASCII bytes 'data' + a ~4 GB
    length BEFORE the real data chunk — a byte-scan parser dies, the
    chunk walker must not; the odd-length note chunk checks pad-byte
    handling."""
    enc, dec = _wav_parts()
    payload = enc([[7, -7, 7]], 12000, note_len=3)  # odd note body
    decoy_at = payload.index(b"data")
    real_at = payload.index(b"data", decoy_at + 1)
    assert decoy_at < real_at, "decoy must precede the real data chunk"
    import struct

    (fake_len,) = struct.unpack("<I", payload[decoy_at + 4 : decoy_at + 8])
    assert fake_len > len(payload), "decoy length must be absurd"
    d = dec(payload)
    assert d["n_frames"] == 3 and d["peak_abs"] == 7


def test_wav_corruption_contract():
    """ValueError on structural damage, NotImplementedError on honest
    codec gaps (non-PCM16) — mirroring the PNG/JPEG contracts."""
    import struct

    enc, dec = _wav_parts()
    good = enc([[1, 2, 3, 4]], 8000)
    with pytest.raises(ValueError, match="RIFF magic"):
        dec(b"JUNK" + good[4:])
    with pytest.raises(ValueError, match="size field"):
        dec(good[:4] + struct.pack("<I", 5) + good[8:])
    # chop the data chunk but keep the RIFF size honest → chunk overrun
    chopped = good[:-4]
    fixed = chopped[:4] + struct.pack("<I", len(chopped) - 8) + chopped[8:]
    with pytest.raises(ValueError, match="truncated WAV chunk"):
        dec(fixed)
    # IEEE-float WAV (format code 3) is a contracted gap, not corruption
    at = good.index(b"fmt ") + 8
    floaty = good[:at] + struct.pack("<H", 3) + good[at + 2 :]
    with pytest.raises(NotImplementedError, match="format=3"):
        dec(floaty)


def test_wav_roundtrip_features_matches_local_decode(spark):
    """The Arrow stage reproduces the local encode→decode exactly for
    a handful of ids spanning all (channels × rate) combinations."""
    from data_quality_checks_in_relational_database_spark.operators.multimodal import (
        wav_roundtrip_features,
    )

    enc, dec = _wav_parts()
    ids = [0, 1, 2, 3, 4, 5, 101]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r["doc_id"]: r.asDict() for r in wav_roundtrip_features(df).collect()}
    for i in ids:
        nf, sr, nc = i % 40 + 12, 8000 + (i % 3) * 4000, i % 2 + 1
        chans = [
            [((i * 2654435761 + t * 9973 + c * 31) % 65536) - 32768 for t in range(nf)]
            for c in range(nc)
        ]
        d = dec(enc(chans, sr, note_len=i % 5 + 3))
        row = got[i]
        for k in ("n_channels", "sample_rate", "n_frames", "duration_ms",
                  "peak_abs", "sum_sq", "zero_cross", "n_clipped"):
            assert row[k] == d[k], (i, k, row[k], d[k])


# ------------------------------------- encoding + file audits (r5 batch 4)


def test_encoding_patterns_precise(spark):
    """The three rot detectors fire on exactly their targets: clean
    ASCII never matches; A-tilde + ASCII letter is NOT mojibake (the
    class must be the Latin-1 continuation range, not a sloppy
    any-follower); TAB/LF/CR are exempt control chars."""
    from data_quality_checks_in_relational_database_spark.plans.curation_queries import (
        _ENC_CTRL_RE,
        _ENC_FFFD,
        _ENC_MOJI,
    )

    rows = [
        (1, "plain ascii text, nothing wrong."),
        (2, "tab\tand\nnewline\rare fine"),
        (3, "bell\x07is not"),
        (4, "lost char � here"),
        (5, "moji Ã© pair"),          # Ã©
        (6, "Ãb is A-tilde + ascii, ok"),  # must NOT match moji
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    got = {
        r["i"]: (r["f"], r["c"], r["m"])
        for r in df.select(
            "i",
            F.col("t").rlike(_ENC_FFFD).alias("f"),
            F.col("t").rlike(_ENC_CTRL_RE).alias("c"),
            F.col("t").rlike(_ENC_MOJI).alias("m"),
        ).collect()
    }
    assert got[1] == (False, False, False)
    assert got[2] == (False, False, False)
    assert got[3] == (False, True, False)
    assert got[4] == (True, False, False)
    assert got[5] == (False, False, True)
    assert got[6] == (False, False, False)


def test_encoding_audit_non_vacuous(spark):
    """Injected damage reaches every detector at the smoke SF."""
    from data_quality_checks_in_relational_database_spark.plans.curation_queries import (
        q_encoding_audit,
    )

    rows = q_encoding_audit(spark, SF_SMOKE).collect()
    tot = {
        k: sum(r[k] for r in rows)
        for k in ("n_docs", "n_fffd", "n_ctrl", "n_mojibake", "n_any")
    }
    assert tot["n_fffd"] > 0 and tot["n_ctrl"] > 0 and tot["n_mojibake"] > 0
    assert tot["n_any"] <= tot["n_fffd"] + tot["n_ctrl"] + tot["n_mojibake"]
    assert tot["n_any"] < tot["n_docs"]


def test_file_balance_roundtrip_invariants(spark):
    """The written dataset must land exactly one file per md5 bucket
    and account for every lineitem row."""
    from data_quality_checks_in_relational_database_spark.plans.scale_queries import (
        _FB_BUCKETS,
        q_file_balance,
    )
    from data_quality_checks_in_relational_database_spark.session import load_tables

    r = q_file_balance(spark, SF_SMOKE).collect()[0]
    n_li = load_tables(spark, SF_SMOKE, ("lineitem",))["lineitem"].count()
    assert r["n_files"] == _FB_BUCKETS
    assert r["n_rows"] == n_li
    assert 0 < r["min_rows"] <= r["max_rows"]
    assert r["skew_permille"] >= 1000  # max/avg is at least 1


def test_merge_upsert_query_semantics(spark):
    """The merged target must account for every row class exactly:
    updates replace (no row growth), inserts add, nothing is lost."""
    from data_quality_checks_in_relational_database_spark.plans.scale_queries import q_merge_upsert
    from data_quality_checks_in_relational_database_spark.session import load_tables

    r = q_merge_upsert(spark, SF_SMOKE).collect()[0]
    o = load_tables(spark, SF_SMOKE, ("orders",))["orders"]
    n = o.count()
    n_upd = o.filter("o_orderkey % 5 = 0").count()
    n_ins = o.filter("o_orderkey % 7 = 3").count()
    assert r["n_rows"] == n + n_ins
    assert r["n_updated"] == n_upd
    assert r["n_inserted"] == n_ins
    assert r["n_changed"] == n_upd + n_ins


def test_schema_evolution_null_fill(spark):
    """mergeSchema must surface the missing column as NULL on old-epoch
    rows and leave new-epoch rows fully populated."""
    from data_quality_checks_in_relational_database_spark.plans.scale_queries import (
        q_schema_evolution,
    )

    rows = {r["epoch"]: r for r in q_schema_evolution(spark, SF_SMOKE).collect()}
    assert set(rows) == {0, 1}
    assert rows[0]["n_null_status"] == rows[0]["n_rows"] > 0
    assert rows[0]["n_statuses"] == 0
    assert rows[1]["n_null_status"] == 0 and rows[1]["n_statuses"] > 0


# ------------------------------------------------------- tf-idf cosine


def _py_tfidf_cosine(texts: dict, n: int = 3, scale: int = 1_000_000):
    """Pure-Python replay of the documented integer micro-idf recipe."""
    import math

    grams = {}
    for did, txt in texts.items():
        t = txt.strip().lower().split()
        if len(t) < n:
            continue
        g = [" ".join(t[i : i + n]) for i in range(len(t) - n + 1)]
        tf = {}
        for x in g:
            tf[x] = tf.get(x, 0) + 1
        grams[did] = tf
    nd = len(grams)
    df = {}
    for tf in grams.values():
        for term in tf:
            df[term] = df.get(term, 0) + 1
    w = {
        did: {
            term: c * round(math.log(nd / df[term]) * scale)
            for term, c in tf.items()
            if round(math.log(nd / df[term]) * scale) != 0
        }
        for did, tf in grams.items()
    }
    w = {did: tf for did, tf in w.items() if tf}
    out = {}
    ids = sorted(w)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            dot = sum(w[a][t] * w[b][t] for t in w[a] if t in w[b])
            if dot == 0:
                continue
            na = math.sqrt(float(sum(v * v for v in w[a].values())))
            nb = math.sqrt(float(sum(v * v for v in w[b].values())))
            out[(a, b)] = round(dot / (na * nb), 6)
    return out


def test_tfidf_cosine_matches_pure_python_and_is_tf_sensitive(spark):
    from data_quality_checks_in_relational_database_spark.operators.text import (
        tfidf_cosine_pairs,
    )

    texts = {
        1: "a b c a b c",          # gram "a b c" has tf = 2
        2: "a b c",                # same gram, tf = 1
        3: "a b c a b c",          # exact duplicate of 1
        4: "x y z w",              # disjoint
        5: "x y z q r s",          # shares one gram with 4
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(docs, threshold=0.0).collect()
    }
    want = _py_tfidf_cosine(texts)
    assert got == want
    # tf sensitivity: identical-content pair is exactly 1.0, while the
    # tf-2 vs tf-1 pair is strictly below it (set-Jaccard calls 1≡2)
    assert got[(1, 3)] == 1.0
    assert got[(1, 2)] < 1.0


def test_tfidf_cosine_max_doc_freq_caps_vocabulary(spark):
    from data_quality_checks_in_relational_database_spark.operators.text import (
        tfidf_cosine_pairs,
    )

    # gram "a b c" appears in docs 1 and 2 (df = 2 of N = 3, so its idf
    # is positive and it survives the idf-0 vocabulary drop); capping
    # df <= 1 removes it, leaving doc 1 with no vector at all -> the
    # (1, 2) pair disappears rather than dividing by a zero norm
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c x y z"), (3, "p q r s")],
        "doc_id long, text string",
    )
    uncapped = tfidf_cosine_pairs(docs, threshold=0.0).collect()
    assert [(r["doc_id_a"], r["doc_id_b"]) for r in uncapped] == [(1, 2)]
    capped = tfidf_cosine_pairs(docs, threshold=0.0, max_doc_freq=1).collect()
    assert capped == []


def test_tfidf_cosine_empty_and_short_docs(spark):
    from data_quality_checks_in_relational_database_spark.operators.text import (
        tfidf_cosine_pairs,
    )

    docs = spark.createDataFrame(
        [(1, ""), (2, "one two"), (3, None)], "doc_id long, text string"
    )
    assert tfidf_cosine_pairs(docs).collect() == []


def test_tfidf_cosine_all_stopword_doc_is_excluded_not_divide_by_zero(spark):
    from data_quality_checks_in_relational_database_spark.operators.text import (
        tfidf_cosine_pairs,
    )

    # "a b c" appears in EVERY doc -> idf exactly 0 -> docs 1 and 2 are
    # zero vectors; under ANSI mode a naive cosine would divide by zero
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "a b c d e f"), (4, "a b c d e g")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in tfidf_cosine_pairs(docs, threshold=0.0).collect()
    }
    assert got == {(3, 4)}


# ------------------------------------------------------------ dHash


def test_dhash_bands_known_bits():
    from data_quality_checks_in_relational_database_spark.operators.multimodal import (
        _dhash_bands,
    )

    # monotone-decreasing row -> every comparison fires; increasing -> none
    down = bytes(range(8, -1, -1))      # 9 px, all 8 bits of row 0 set
    up = bytes(range(9))
    flat = bytes([5] * 9)
    px = down + up + flat * 6           # rows 2..7 flat -> no bits
    b0, b1, b2, b3 = _dhash_bands(px)
    assert (b0, b1, b2, b3) == (0x00FF, 0, 0, 0)


def test_dhash_near_pairs_band_blocking_is_lossless_at_radius_3(spark):
    from data_quality_checks_in_relational_database_spark.operators.multimodal import (
        dhash_near_pairs,
    )

    base = (0x1234, 0x5678, 0x9ABC, 0x0DEF)
    rows = [
        (1, *base),
        # 3 flips all inside band 0 -> bands 1-3 identical (the case a
        # single-band join would need; any of the other three catches it)
        (2, base[0] ^ 0b111, base[1], base[2], base[3]),
        # 3 flips spread over three bands -> band 3 identical
        (3, base[0] ^ 1, base[1] ^ 1, base[2] ^ 1, base[3]),
        # 4 flips, one per band -> hamming 4: excluded by contract
        (4, base[0] ^ 1, base[1] ^ 1, base[2] ^ 1, base[3] ^ 1),
        # far away everywhere
        (5, 0xFFFF ^ base[0], 0xFFFF ^ base[1], 0xFFFF ^ base[2], 0xFFFF ^ base[3]),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, b0 long, b1 long, b2 long, b3 long"
    )
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["hamming"]
        for r in dhash_near_pairs(df).collect()
    }
    # exact expectation computed by a reference hamming, not by hand:
    import itertools

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a[1:], b[1:]))

    want = {}
    for a, b in itertools.combinations(rows, 2):
        h = ham(a, b)
        if h <= 3:
            want[(a[0], b[0])] = h
    assert got == want
    assert (1, 2) in got and (1, 3) in got          # the pigeonhole cases
    assert all(h <= 3 for h in got.values())


def test_dhash_near_pairs_refuses_radius_past_pigeonhole(spark):
    from data_quality_checks_in_relational_database_spark.operators.multimodal import (
        dhash_near_pairs,
    )

    df = spark.createDataFrame([(1, 0, 0, 0, 0)], "doc_id long, b0 long, b1 long, b2 long, b3 long")
    with pytest.raises(ValueError, match="lossless"):
        dhash_near_pairs(df, max_hamming=4)


# -------------------------------------------------- seasonal decompose


def test_seasonal_decompose_matches_pure_python_replay(spark):
    """Exact replay of the documented arithmetic (7-row centered trend
    numerator, per-dow seasonal numerator, micro-quantized residuals,
    integer-sum z moments) over the smoke SF — every emitted value must
    agree, and the anomaly flags must be non-vacuous both ways."""
    import math

    from data_quality_checks_in_relational_database_spark.plans.pipeline_queries import (
        q_seasonal_decompose,
    )
    from data_quality_checks_in_relational_database_spark.session import load_tables

    got = {r["day"]: r for r in q_seasonal_decompose(spark, SF_SMOKE).collect()}

    od = load_tables(spark, SF_SMOKE, ("orders",))["orders"]
    daily = sorted(
        (r["day"], r["n"])
        for r in od.groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    rows = []
    for k in range(3, len(daily) - 3):
        day, n = daily[k]
        sum7 = sum(v for _, v in daily[k - 3 : k + 4])
        dow = (day.weekday() + 1) % 7  # python Mon=0 -> Sunday=0 convention
        rows.append((day, n, sum7, 7 * n - sum7, dow))
    seas = {}
    for _, _, _, d7, dow in rows:
        c, s = seas.get(dow, (0, 0))
        seas[dow] = (c + 1, s + d7)
    r_us = {}
    for day, n, sum7, d7, dow in rows:
        c, s_num = seas[dow]
        r_us[day] = round((c * d7 - s_num) / (7.0 * c) * 1_000_000.0)
    n_i = len(r_us)
    s1, s2 = sum(r_us.values()), sum(v * v for v in r_us.values())
    var = (s2 - float(s1) * s1 / n_i) / (n_i - 1)
    assert set(got) == set(r_us)
    flags = 0
    for day, n, sum7, d7, dow in rows:
        c, s_num = seas[dow]
        g = got[day]
        assert g["n_orders"] == n
        assert g["trend"] == round(sum7 / 7.0, 6)
        assert g["seasonal"] == round(s_num / (7.0 * c), 6)
        assert g["resid_micro"] == r_us[day]
        z = (r_us[day] - float(s1) / n_i) / math.sqrt(var)
        assert g["z"] == round(z, 6)
        assert g["is_anomaly"] == (abs(z) > 2.0)
        flags += g["is_anomaly"]
    assert 0 < flags < len(rows)  # shocks exist; not everything is one


# ------------------------------------------------------- golden record


def test_golden_records_survivorship_rules(spark):
    """Recency rule must prefer a STALE non-null over a fresh null;
    modal rule must break count ties to the smallest value; groups with
    an all-null field get NULL (not a crash, not 0)."""
    from data_quality_checks_in_relational_database_spark.operators.dedup import (
        golden_records,
    )

    rows = [
        # key, t, rid, cat, v
        (1, 10, 1, "b", 5.0),
        (1, 20, 2, "a", None),   # freshest record, but v is null
        (1, 15, 3, "a", 7.0),    # latest NON-NULL v
        (2, 10, 4, "z", None),
        (2, 11, 5, "y", None),   # v all-null in group 2
    ]
    df = spark.createDataFrame(
        rows, "key long, t long, rid long, cat string, v double"
    )
    got = {
        r["key"]: r
        for r in golden_records(
            df, "key", ("t", "rid"), fields=("v",), modal_fields=("cat",)
        ).collect()
    }
    g1, g2 = got[1], got[2]
    assert g1["last_v"] == 7.0            # not None (fresh null loses)
    assert g1["n_v_nulls"] == 1
    assert g1["first_t"] == 10 and g1["last_t"] == 20 and g1["n_records"] == 3
    assert g1["modal_cat"] == "a"         # 2-vs-1 count
    assert g2["last_v"] is None and g2["n_v_nulls"] == 2
    assert g2["modal_cat"] == "y"         # 1-1 tie -> smallest value


def test_golden_records_order_tie_broken_by_later_order_cols(spark):
    from data_quality_checks_in_relational_database_spark.operators.dedup import (
        golden_records,
    )

    df = spark.createDataFrame(
        [(1, 10, 1, 3.0), (1, 10, 2, 4.0)], "key long, t long, rid long, v double"
    )
    (row,) = golden_records(df, "key", ("t", "rid"), fields=("v",)).collect()
    assert row["last_v"] == 4.0           # same t, higher rid wins


# ------------------------------------------------------------- BMP


def test_bmp_codec_contracts():
    """Corruption → ValueError; unsupported variants →
    NotImplementedError; the weighted checksum CATCHES a row-order bug
    a brightness mean cannot see."""
    import struct

    from data_quality_checks_in_relational_database_spark.operators.multimodal import (
        decode_bmp,
        decode_image,
        encode_bmp24,
    )

    px = [[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (10, 11, 12)]]
    good = encode_bmp24(px)
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"XX" + good[2:])
    with pytest.raises(ValueError, match="truncated BMP header"):
        decode_bmp(good[:20])
    with pytest.raises(ValueError, match="truncated BMP pixel"):
        decode_bmp(good[:-3])
    # 8bpp / RLE variants are contracted NotImplementedError
    bad_bpp = bytearray(good)
    bad_bpp[28:30] = struct.pack("<H", 8)
    with pytest.raises(NotImplementedError, match="bpp=8"):
        decode_bmp(bytes(bad_bpp))
    # decode_image routes BMP by magic and by fmt
    assert decode_image(good, "bmp")["width"] == 2
    assert decode_image(good, "auto")["bpp"] == 24
    # row-order sensitivity: same pixel multiset, flipped rows -> same
    # brightness, DIFFERENT weighted checksum
    flipped = encode_bmp24(list(reversed(px)))
    d, f = decode_bmp(good), decode_bmp(flipped)
    assert d["brightness_milli"] == f["brightness_milli"]
    assert d["weighted_checksum"] != f["weighted_checksum"]
    # and top-down vs bottom-up encodings of the SAME image agree fully
    td = decode_bmp(encode_bmp24(px, topdown=True))
    assert td["weighted_checksum"] == d["weighted_checksum"]
    assert td["topdown"] is True and d["topdown"] is False


# ------------------------------------------------------- bloom skipping


def test_bloom_skipping_invariants(spark):
    """Bloom filters may false-positive but NEVER false-negative
    (files_bloom ≥ files_actual per probe), zone maps are sound too
    (files_zone ≥ files_actual), and on the date-laid-out files the
    bloom must prune far better than the orderkey zone maps — the
    reason the audit exists."""
    from data_quality_checks_in_relational_database_spark.plans.scale_queries import (
        q_bloom_skipping,
    )

    rows = q_bloom_skipping(spark, SF_SMOKE).collect()
    assert len(rows) >= 2
    for r in rows:
        assert r["files_bloom"] >= r["files_actual"], r
        assert r["files_zone"] >= r["files_actual"], r
        assert r["bloom_fp_files"] == r["files_bloom"] - r["files_actual"]
    zone_total = sum(r["files_zone"] for r in rows)
    bloom_total = sum(r["files_bloom"] for r in rows)
    assert bloom_total * 4 < zone_total  # point pruning actually wins
    # non-vacuous both ways: some probe hits data, some probe is absent
    assert any(r["files_actual"] > 0 for r in rows)


# ---------------------------------------------------------------- AQP


def test_aqp_estimates_within_ci_and_calibrated(spark):
    """Sample-and-scale sanity at the smoke SF: every group's exact
    answer falls inside the 95% CI (md5 sampling is uniform; with
    thousands of rows per group a miss would flag broken estimator
    math, not bad luck), the estimate is within a few percent, and the
    CI is non-degenerate (positive, far smaller than the estimate)."""
    from data_quality_checks_in_relational_database_spark.plans.scale_queries import (
        q_aqp_group_estimate,
    )

    rows = q_aqp_group_estimate(spark, SF_SMOKE).collect()
    assert len(rows) == 3  # l_returnflag in {A, N, R}
    for r in rows:
        assert r["rows_within_ci"] and r["cents_within_ci"], r
        assert 0 < r["ci_rows_half"] < r["exact_rows"]
        assert 0 < r["ci_cents_half"] < r["exact_cents"]
        assert abs(r["est_rows"] - r["exact_rows"]) <= 0.1 * r["exact_rows"]
        assert abs(r["est_cents"] - r["exact_cents"]) <= 0.1 * r["exact_cents"]


# ------------------------------------------------------- bucketed join


def test_bucketed_join_plans_no_shuffle_on_either_side(spark):
    """The point of bucketing: with both tables bucketed+sorted on the
    join key, the sort-merge join must plan ZERO shuffle exchanges
    below the join (broadcast disabled so the SMJ path is forced; the
    final aggregate's exchange is outside the join subtree). Also
    re-checks values equal the plain join, so bucketing changed the
    plan and nothing else."""
    import re

    from data_quality_checks_in_relational_database_spark.plans.scale_queries import (
        q_bucketed_join,
    )

    s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.session.timeZone", spark.conf.get("spark.sql.session.timeZone"))
    out = q_bucketed_join(s, SF_SMOKE)
    o = s.table("spark_dq_bj_orders")
    l = s.table("spark_dq_bj_lineitem")
    joined = o.join(l, o["o_orderkey"] == l["l_orderkey"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert not re.search(r"Exchange (hashpartitioning|rangepartitioning)", plan), plan
    # values ≡ plain join on the raw parquet
    from data_quality_checks_in_relational_database_spark.session import load_tables

    li = load_tables(s, SF_SMOKE, ("lineitem",))["lineitem"]
    od = load_tables(s, SF_SMOKE, ("orders",))["orders"]
    import pyspark.sql.functions as F2

    plain = {
        (r["o_orderpriority"], r["n_lines"], r["revenue_cents"])
        for r in od.join(li, od["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F2.count(F2.lit(1)).cast("long").alias("n_lines"),
            F2.sum(
                F2.round(F2.col("l_extendedprice") * 100, 0).cast("long")
            ).cast("long").alias("revenue_cents"),
        )
        .collect()
    }
    got = {
        (r["o_orderpriority"], r["n_lines"], r["revenue_cents"])
        for r in out.collect()
    }
    assert got == plain and len(got) == 5


# ------------------------------------------- incremental join view


def test_incremental_join_view_matches_and_deltas_are_real(spark):
    """Every priority's incrementally-maintained (count, cents) must
    equal the full recompute, and each of the three delta joins must
    contribute rows — otherwise the algebra is vacuously 'verified'."""
    from data_quality_checks_in_relational_database_spark.plans.scale_queries import (
        q_incremental_join_view,
    )
    from data_quality_checks_in_relational_database_spark.session import load_tables

    rows = q_incremental_join_view(spark, SF_SMOKE).collect()
    assert len(rows) == 5 and all(r["matches"] for r in rows)
    assert all(r["n_inc"] > 0 for r in rows)
    li = load_tables(spark, SF_SMOKE, ("lineitem",))["lineitem"]
    od = load_tables(spark, SF_SMOKE, ("orders",))["orders"]
    j = od.join(li, od["o_orderkey"] == li["l_orderkey"])
    on = F.col("o_orderkey") % 20 == 0
    ln = F.col("l_linenumber") > 5
    for cond in (on & ~ln, ~on & ln, on & ln):
        assert j.where(cond).count() > 0


# ----------------------------------------------------- watermark audit


def test_watermark_audit_curve_is_monotone_and_non_vacuous(spark):
    """Drop counts must be non-increasing in the watermark (a wider
    watermark never drops more), with real drops at the narrow end and
    zero at the 1-day end (the injected lateness tops out below it)."""
    from data_quality_checks_in_relational_database_spark.plans.extension_queries import (
        _WM_CANDIDATES,
        q_watermark_audit,
    )

    rows = q_watermark_audit(spark, SF_SMOKE).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], {})[r["watermark_s"]] = r
    for t, curve in by_type.items():
        assert set(curve) == set(_WM_CANDIDATES)
        drops = [curve[w]["n_dropped"] for w in sorted(curve)]
        assert drops == sorted(drops, reverse=True), (t, drops)
        n = curve[1]["n_events"]
        for w, r in curve.items():
            assert r["drop_per_million"] == r["n_dropped"] * 1_000_000 // n
    total_narrow = sum(c[1]["n_dropped"] for c in by_type.values())
    total_wide = sum(c[86400]["n_dropped"] for c in by_type.values())
    assert total_narrow > 0 and total_wide == 0
