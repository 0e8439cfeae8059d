"""Snapshot diff — keyed table drift between two versions (the
"data-diff" DQ primitive: what was added / removed / changed between
yesterday's and today's load).

Shape: one full-outer join on the key; change classification compares
the non-key columns with null-safe equality. The join shuffles both
snapshots by key once (AQE handles skew); the per-row output can be
consumed directly or collapsed to the bounded summary.

At 100 TB, prefer the summary (aggregation happens map-side after the
join) and pushdown-friendly snapshot predicates (e.g. partition = day)
so each side scans only its snapshot.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_quality_checks_in_relational_database_spark.operators.cumulative import (
    bucketed_cumulative,
)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key change rows: ``(*keys, change_type)`` with change_type in
    {added, removed, changed, unchanged}."""
    compare_cols = compare_cols or [c for c in old.columns if c not in keys]
    o = old.select(*keys, *[F.col(c).alias(f"__o_{c}") for c in compare_cols], F.lit(1).alias("__in_old"))
    n = new.select(*keys, *[F.col(c).alias(f"__n_{c}") for c in compare_cols], F.lit(1).alias("__in_new"))
    j = o.join(n, keys, "full_outer")
    differs = reduce(
        lambda a, b: a | b,
        [~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")) for c in compare_cols],
    )
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(*keys, change.alias("change_type"))


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Bounded drift report: ``(change_type, n_keys)``."""
    return (
        snapshot_diff(old, new, keys, compare_cols)
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )


def psi_report(
    base: DataFrame,
    current: DataFrame,
    value_col: str,
    bin_edges: list[float],
) -> DataFrame:
    """Population Stability Index per histogram bin — the standard
    distribution-drift score between a baseline snapshot and a current
    one (PSI < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 major).

    ``bin_edges`` are EXPLICIT (len = n_bins+1, half-open [lo, hi)
    buckets, with underflow/overflow clamped into the end bins) so the
    binning is deterministic and engine-portable — deriving edges from
    data would need a separate min/max pass and make the report depend
    on outliers. Output: one row per bin ``(bin, base_n, curr_n,
    base_frac, curr_frac, psi_term)`` — per-bin PSI contributions as
    single products of count ratios (no cross-row double summation →
    hash-stable); total PSI = SUM(psi_term), a bounded n_bins-row sum
    the consumer applies. Empty bins use the standard epsilon-free
    convention: a bin empty on either side contributes NULL (flagged,
    not fabricated — epsilon choices change the score arbitrarily).

    Shape: two grouped integer counts (one scan each side, map-side
    combined) broadcast-joined on the bin id — report cost is
    O(n_bins), independent of table size.
    """

    def binned(df: DataFrame, out: str) -> DataFrame:
        v = F.col(value_col).cast("double")
        b = None
        for i in range(len(bin_edges) - 1):
            cond = v < F.lit(float(bin_edges[i + 1]))
            term = F.when(cond, F.lit(i)) if b is None else b.when(cond, F.lit(i))
            b = term
        bin_id = b.otherwise(F.lit(len(bin_edges) - 2))
        return (
            df.filter(v.isNotNull())
            .groupBy(bin_id.alias("bin"))
            .agg(F.count(F.lit(1)).alias(out))
        )

    bins = base.sparkSession.range(len(bin_edges) - 1).select(F.col("id").cast("int").alias("bin"))
    b = binned(base, "base_n")
    c = binned(current, "curr_n")
    j = (
        bins.join(F.broadcast(b), "bin", "left")
        .join(F.broadcast(c), "bin", "left")
        .select(
            "bin",
            F.coalesce("base_n", F.lit(0)).alias("base_n"),
            F.coalesce("curr_n", F.lit(0)).alias("curr_n"),
        )
    )
    # global totals via an empty-partition window: the frame is n_bins
    # rows (bounded), so the single-partition window is free here
    tot_b = F.sum("base_n").over(Window.partitionBy())
    tot_c = F.sum("curr_n").over(Window.partitionBy())
    # empty-side totals yield NULL fractions, not an ANSI divide-by-zero
    bf = F.when(tot_b > 0, F.col("base_n") / tot_b)
    cf = F.when(tot_c > 0, F.col("curr_n") / tot_c)
    psi = F.when(
        (F.col("base_n") > 0) & (F.col("curr_n") > 0), (cf - bf) * F.log(cf / bf)
    )
    return j.select(
        "bin",
        "base_n",
        "curr_n",
        F.round(bf, 6).alias("base_frac"),
        F.round(cf, 6).alias("curr_frac"),
        F.round(psi, 6).alias("psi_term"),
    )


def ks_two_sample(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    decimals: int = 0,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between two cohorts of a
    numeric column — the non-parametric companion to psi_report (PSI
    needs chosen bins; KS is bin-free up to the stated rounding).

    Values are rounded to ``decimals`` first, so the contract is "KS of
    the rounded distribution". The running ECDF is computed by
    :func:`operators.cumulative.bucketed_cumulative` (two-phase
    range-bucketed running totals), so even a HIGH-cardinality distinct
    domain — a continuous double with a generous ``decimals`` — never
    funnels through one unpartitioned ordered window (r4 verdict fix).

    Exact-integer hash contract: with cum_a/cum_b the cumulative counts
    and n_a/n_b the totals,

        D = max |cum_a/n_a - cum_b/n_b|
          = max |cum_a*n_b - cum_b*n_a| / (n_a*n_b)

    so the report carries the integer numerator ``d_numer`` and totals;
    ``ks_stat`` is the single final division rounded to 6 dp.

    Output: one row ``(n_a, n_b, d_numer, ks_stat)``.
    """
    return _ks_from_counts(_two_sample_counts_joined(a, b, value_col, decimals))


def ks_two_sample_split(
    df: DataFrame,
    split_cond,
    value_col: str,
    decimals: int = 0,
) -> DataFrame:
    """:func:`ks_two_sample` for the common case where the two cohorts
    PARTITION one frame by a boolean predicate (yesterday/today,
    weekend/weekday): cohort a is ``split_cond`` true, cohort b is
    ``split_cond`` false, rows where it is NULL belong to neither —
    exactly ``ks_two_sample(df.filter(c), df.filter(~c), ...)``.

    Same output, half the physical work (guide §2.3/§2.4): the generic
    form scans the source once PER COHORT, aggregates each, and
    reconciles with a full-outer sort-merge join (two extra sort
    exchanges); this form computes both cohorts' per-value counts in
    ONE scan + ONE keyed aggregation with conditional sums — the
    full-outer join disappears because a single groupBy already emits
    every value seen in either cohort, with exact zero counts (never
    NULLs) for the absent side.
    """
    return _ks_from_counts(
        _two_sample_counts_split(df, split_cond, value_col, decimals)
    )


def _two_sample_counts_joined(
    a: DataFrame, b: DataFrame, value_col: str, decimals: int
) -> DataFrame:
    """Per-rounded-value cohort counts ``(v, ca, cb)`` from two
    independent frames: aggregate each side, reconcile the value grids
    with a full-outer join (a value missing on one side counts 0)."""
    v = F.round(F.col(value_col).cast("double"), decimals)

    def counted(df: DataFrame, out: str) -> DataFrame:
        return (
            df.filter(F.col(value_col).isNotNull())
            .groupBy(v.alias("v"))
            .agg(F.count(F.lit(1)).alias(out))
        )

    return (
        counted(a, "ca")
        .join(counted(b, "cb"), "v", "full_outer")
        .select(
            "v",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )


def _two_sample_counts_split(
    df: DataFrame, split_cond, value_col: str, decimals: int
) -> DataFrame:
    """Per-rounded-value cohort counts ``(v, ca, cb)`` when the cohorts
    partition ONE frame: one scan, one keyed aggregation, conditional
    sums. Row-for-row equal to the joined form over
    ``df.filter(split_cond)`` / ``df.filter(~split_cond)``: the value
    grid is the set of values with at least one row in either cohort
    (NULL ``split_cond`` rows are dropped, matching filter semantics
    where both ``c`` and ``~c`` reject NULL), and a one-sided value
    gets an exact 0 from the conditional sum where the join gets a
    coalesced NULL."""
    v = F.round(F.col(value_col).cast("double"), decimals)
    return (
        df.filter(F.col(value_col).isNotNull() & split_cond.isNotNull())
        .groupBy(v.alias("v"))
        .agg(
            # coalesce makes the columns non-nullable like the joined
            # form's coalesce(count, 0); the sums themselves can never
            # be NULL (groups are non-empty by construction)
            F.coalesce(F.sum(F.when(split_cond, 1).otherwise(0)), F.lit(0)).alias(
                "ca"
            ),
            F.coalesce(F.sum(F.when(split_cond, 0).otherwise(1)), F.lit(0)).alias(
                "cb"
            ),
        )
    )


def _ks_from_counts(j: DataFrame) -> DataFrame:
    """KS report from a per-value cohort-count frame ``(v, ca, cb)``."""
    cum = bucketed_cumulative(j, "v", ["ca", "cb"]).select(
        F.col("cum_ca").alias("cum_a"),
        F.col("cum_cb").alias("cum_b"),
        F.col("n_ca").alias("n_a"),
        F.col("n_cb").alias("n_b"),
    )
    return cum.agg(
        F.max("n_a").cast("long").alias("n_a"),
        F.max("n_b").cast("long").alias("n_b"),
        F.max(F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")))
        .cast("long")
        .alias("d_numer"),
        F.round(
            F.max(F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")))
            / (F.max("n_a") * F.max("n_b")),
            6,
        ).alias("ks_stat"),
    )


#: Modulus for content checksums: 2^60 keeps every intermediate and the
#: final value exactly representable in a signed 64-bit integer in any
#: engine (and in the md5_u60 domain).
CHECKSUM_MOD = 1 << 60


def content_checksum(
    df: DataFrame,
    cols: list[str] | None = None,
    group_col: str | None = None,
) -> DataFrame:
    """Order-independent row-CONTENT fingerprint per group — the strong
    form of the reference's count-only reconciliation
    (pre_and_post_etl_checks.py:229-239 compares COUNT(*) source vs
    destination; equal counts with corrupted cells still pass there).

    Each row canonicalizes to a single string (columns joined with a
    0x1F separator; NULL encoded distinctly from the empty string),
    hashes through the engine-portable md5-derived 60-bit integer, and
    the group checksum is the SUM of those hashes mod 2^60 (NULL cells encode as a 0x1E-prefixed sentinel distinct from the empty string) — addition
    is commutative, so the result is partition- and order-independent,
    and the mod-2^60 domain stays exact in int64 everywhere. The sum
    accumulates in DECIMAL(38,0): overflow-free to ~10^19 rows per
    group under ANSI mode, no wraparound semantics to match across
    engines.

    One map-side-combined aggregation; no shuffle beyond the group key.
    DuckDB twin (parity pinned by the `content_checksums` oracle):
    ``CAST(SUM(CAST('0x' || substr(md5(row), 1, 15) AS BIGINT)) % (1<<60) AS BIGINT)``.
    """
    from data_quality_checks_in_relational_database_spark.functions.scalars import md5_u60

    cols = cols or [c for c in df.columns if c != group_col]
    canon = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x1eNULL")) for c in cols]
    )
    h = md5_u60(canon).cast("decimal(38,0)")
    keys = [F.col(group_col)] if group_col else []
    return df.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.pmod(F.sum(h), F.lit(CHECKSUM_MOD).cast("decimal(38,0)"))
        .cast("long")
        .alias("content_checksum"),
    )


def checksum_reconcile(
    src: DataFrame,
    dst: DataFrame,
    cols: list[str],
    group_col: str,
) -> DataFrame:
    """Source-vs-destination reconciliation on row content, not counts:
    full-outer join the per-group checksums and flag any group where
    either the row count or the content fingerprint diverges. Catches
    the silent single-cell corruption that count reconciliation
    (the reference's J1 primitive) cannot see. Both inputs reduce to
    one bounded row per group BEFORE the join — the join is trivially
    broadcast at any corpus size."""
    s = content_checksum(src, cols, group_col).withColumnsRenamed(
        {"n_rows": "src_rows", "content_checksum": "src_checksum"}
    )
    d = content_checksum(dst, cols, group_col).withColumnsRenamed(
        {"n_rows": "dst_rows", "content_checksum": "dst_checksum"}
    )
    j = s.join(d, group_col, "full_outer")
    return j.select(
        group_col,
        "src_rows",
        "dst_rows",
        "src_checksum",
        "dst_checksum",
        (
            F.col("src_rows").eqNullSafe(F.col("dst_rows"))
            & F.col("src_checksum").eqNullSafe(F.col("dst_checksum"))
        ).alias("content_match"),
    )


def schema_drift(old: DataFrame, new: DataFrame) -> DataFrame:
    """Schema-level drift between two table versions: one row per
    column that was added, removed, type-changed, or
    nullability-changed. The companion to :func:`snapshot_diff` — the
    reference's ETL checks compare row counts only and would load a
    silently retyped column without noticing.

    Pure driver-side metadata (``df.schema``): no job runs, no data is
    scanned — safe to call on 100 TB tables. Emits an empty frame when
    the schemas agree.
    """
    spark = old.sparkSession
    o = {f.name: f for f in old.schema.fields}
    n = {f.name: f for f in new.schema.fields}
    rows: list[tuple[str, str, str | None, str | None]] = []
    for name in sorted(o.keys() | n.keys()):
        fo, fn = o.get(name), n.get(name)
        if fo is None:
            rows.append((name, "added", None, fn.dataType.simpleString()))
        elif fn is None:
            rows.append((name, "removed", fo.dataType.simpleString(), None))
        elif fo.dataType != fn.dataType:
            rows.append(
                (name, "type_changed", fo.dataType.simpleString(), fn.dataType.simpleString())
            )
        elif fo.nullable != fn.nullable:
            rows.append(
                (
                    name,
                    "nullability_changed",
                    f"nullable={fo.nullable}",
                    f"nullable={fn.nullable}",
                )
            )
    return spark.createDataFrame(
        rows, "column string, change string, old_type string, new_type string"
    )


def wasserstein_two_sample(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    decimals: int = 0,
) -> DataFrame:
    """Exact 1-Wasserstein (earth-mover) distance between two cohorts of
    a numeric column — KS tells you the distributions differ; W1 tells
    you by HOW MUCH in the column's own units (∫|F_a − F_b| dv), which
    is the number a drift alert should threshold on.

    Same contract as :func:`ks_two_sample`: values round to
    ``decimals`` first; the running totals (and the inter-value gap)
    come from :func:`operators.cumulative.bucketed_cumulative`'s
    two-phase range-bucketed plan — no unpartitioned window even on
    high-cardinality value domains. The heavy work is two
    map-side-combined counts.

    Exact-integer hash contract (``decimals=0`` keeps value gaps
    integral): with cum_X cumulative counts, n_X totals and
    gap = next(v) − v,

        W1 = Σ |cum_a·n_b − cum_b·n_a| · gap / (n_a·n_b)

    carries the integer numerator ``w1_numer``; ``w1`` is the single
    final division rounded to 6 dp.

    Output: one row ``(n_a, n_b, w1_numer, w1)``.
    """
    return _w1_from_counts(_two_sample_counts_joined(a, b, value_col, decimals))


def wasserstein_two_sample_split(
    df: DataFrame,
    split_cond,
    value_col: str,
    decimals: int = 0,
) -> DataFrame:
    """:func:`wasserstein_two_sample` for cohorts that PARTITION one
    frame by a boolean predicate — same one-scan/one-aggregation
    rewrite as :func:`ks_two_sample_split` (the full-outer cohort
    reconciliation join disappears; NULL predicate rows belong to
    neither cohort, matching the two-filter form)."""
    return _w1_from_counts(
        _two_sample_counts_split(df, split_cond, value_col, decimals)
    )


def _w1_from_counts(j: DataFrame) -> DataFrame:
    """W1 report from a per-value cohort-count frame ``(v, ca, cb)``."""
    cum = (
        bucketed_cumulative(j, "v", ["ca", "cb"], lead_value=True)
        .select(
            F.col("cum_ca").alias("cum_a"),
            F.col("cum_cb").alias("cum_b"),
            F.col("n_ca").alias("n_a"),
            F.col("n_cb").alias("n_b"),
            (F.col("next_v") - F.col("v")).cast("long").alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
    )
    numer = F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")) * F.col("gap")
    return cum.agg(
        F.max("n_a").cast("long").alias("n_a"),
        F.max("n_b").cast("long").alias("n_b"),
        F.sum(numer).cast("long").alias("w1_numer"),
        F.round(F.sum(numer) / (F.max("n_a") * F.max("n_b")), 6).alias("w1"),
    )


def categorical_drift(
    base: DataFrame,
    current: DataFrame,
    category_col: str,
) -> DataFrame:
    """Jensen-Shannon drift between two snapshots' CATEGORY mixes — the
    categorical sibling of :func:`psi_report`/:func:`ks_two_sample`
    (which need an ordered/numeric axis). JS is symmetric, bounded by
    ln 2, and defined even for categories present on only one side
    (where PSI's log blows up).

    Output: one row per category seen on either side —
    (category, base_n, curr_n, base_share, curr_share, js_term);
    total divergence = SUM(js_term), output bounded by |categories|.

    Per category with shares p, q and m = (p+q)/2:
    ``js_term = (p·ln(p/m) + q·ln(q/m)) / 2``, with a one-sided zero
    contributing only the other side's term (0·ln 0 → 0). Shares are
    ratios of exact integer counts and the log shape is fixed, so the
    6-dp values reproduce cross-engine.

    Scale shape: two map-side-combined count aggregations, a full-outer
    category join, one broadcast totals row — the raw tables are
    scanned once each and never joined to each other.
    """
    bc = base.groupBy(F.col(category_col).alias("category")).agg(
        F.count(F.lit(1)).alias("base_n")
    )
    cc = current.groupBy(F.col(category_col).alias("category")).agg(
        F.count(F.lit(1)).alias("curr_n")
    )
    from pyspark.storagelevel import StorageLevel

    # pin the bounded (|categories| rows) joined count table: the
    # totals row and the final projection both consume it, and an
    # unpinned plan re-scans BOTH raw inputs per consumer
    j = (
        bc.join(cc, "category", "full_outer")
        .select(
            "category",
            F.coalesce("base_n", F.lit(0)).alias("base_n"),
            F.coalesce("curr_n", F.lit(0)).alias("curr_n"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    totals = j.agg(
        F.sum("base_n").cast("double").alias("tb"),
        F.sum("curr_n").cast("double").alias("tc"),
    )
    p = F.col("base_n").cast("double") / F.col("tb")
    q = F.col("curr_n").cast("double") / F.col("tc")
    m = (p + q) / 2
    term = (
        F.when(F.col("base_n") > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when(F.col("curr_n") > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    ) / 2
    return j.crossJoin(F.broadcast(totals)).select(
        "category",
        "base_n",
        "curr_n",
        F.round(p, 6).alias("base_share"),
        F.round(q, 6).alias("curr_share"),
        F.round(term, 6).alias("js_term"),
    )


def cdc_compact(
    ops: DataFrame,
    key_col: str,
    ts_col: str,
    seq_col: str,
    op_col: str,
    delete_op: str = "delete",
) -> DataFrame:
    """Compact a change-data-capture operation log to the final state
    per key (the Debezium-style snapshot build): keep each key's
    LATEST operation by (ts, seq), drop keys whose latest operation is
    a delete. ``seq_col`` breaks same-timestamp ties (a unique id or
    log offset), making the winner deterministic.

    Output: the winning rows minus deletes, original columns intact.

    Scale shape: one keyed window pass (WindowGroupLimit pushes the
    rank-1 filter, so per-key state is one row, not a sort buffer at
    the output); no joins. This composes with ``sinks.merge_upsert``
    for the write side.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).desc(), F.col(seq_col).desc()
    )
    return (
        ops.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != delete_op))
        .drop("_rn")
    )
