"""Declarative data-quality rules over DataFrames — the engine's
generalization of the reference's hard-coded checks into the
"DataFrame validation + SQL-based quality rules" surface named by the
north star (BASELINE.json).

A :class:`Rule` declares what must hold; :func:`evaluate_rules`
compiles every row-level rule on the same table into ONE aggregate
pass (a single scan computing all violation counters with map-side
combine), and each cross-table rule (referential integrity) into one
anti-join branch. The result is a bounded report frame:
``(rule_name, table_name, n_rows, n_violations, passed)`` — rows ∝
number of rules, never data size, so the report is collectable at any
input scale.

Null semantics (pinned in tests): ``not_null`` counts NULLs;
``accepted_values``/``in_range``/``matches_regex``/``expression``
count NULL as a violation (a value that can't be proven valid isn't);
``unique_key`` counts rows in excess of the distinct key count.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass(frozen=True)
class Rule:
    """One declarative check. ``violation`` is a boolean Column factory
    evaluated per row (None for aggregate/cross-table rules)."""

    name: str
    table: str
    kind: str
    params: dict = field(default_factory=dict)


def not_null(table: str, col: str) -> Rule:
    return Rule(f"{table}.{col}.not_null", table, "not_null", {"col": col})


def unique_key(table: str, col: str) -> Rule:
    return Rule(f"{table}.{col}.unique", table, "unique_key", {"col": col})


def accepted_values(table: str, col: str, values: list) -> Rule:
    return Rule(
        f"{table}.{col}.accepted_values", table, "accepted_values", {"col": col, "values": values}
    )


def in_range(table: str, col: str, lo, hi) -> Rule:
    return Rule(f"{table}.{col}.in_range", table, "in_range", {"col": col, "lo": lo, "hi": hi})


def with_tolerance(rule: Rule, max_violation_ratio: float) -> Rule:
    """Tolerance-thresholded variant of any row-level rule: it PASSES
    while ``n_violations / n_rows <= max_violation_ratio`` (the dbt
    warn-threshold / Deequ hasCompleteness(>= x) shape — real feeds are
    rarely 100% clean and a strict rule would page on every run).
    Violations are still counted and reported in full."""
    if not 0.0 <= max_violation_ratio <= 1.0:
        raise ValueError("max_violation_ratio must be within [0, 1]")
    return Rule(
        f"{rule.name}.tol_{max_violation_ratio}",
        rule.table,
        rule.kind,
        {**rule.params, "max_violation_ratio": max_violation_ratio},
    )


def matches_regex(table: str, col: str, pattern: str) -> Rule:
    return Rule(
        f"{table}.{col}.matches_regex", table, "matches_regex", {"col": col, "pattern": pattern}
    )


def expression(table: str, name: str, sql_predicate: str) -> Rule:
    """Arbitrary SQL predicate that must hold per row (NULL = violation)."""
    return Rule(f"{table}.{name}", table, "expression", {"predicate": sql_predicate})


def referential_integrity(table: str, col: str, parent_table: str, parent_col: str) -> Rule:
    return Rule(
        f"{table}.{col}.ri.{parent_table}.{parent_col}",
        table,
        "referential_integrity",
        {"col": col, "parent_table": parent_table, "parent_col": parent_col},
    )


def schema_check(
    df: DataFrame, table: str, expected: dict[str, str], strict: bool = False
) -> list[dict]:
    """Validate a table's schema against a declared contract.

    ``expected`` maps column name → Spark simpleString type (e.g.
    ``{"o_orderkey": "bigint"}``). Driver-side metadata only — no job
    runs. Returns one finding dict per problem: missing columns, type
    mismatches, and (when ``strict``) unexpected extra columns.
    Timestamp flavors (timestamp vs timestamp_ntz) compare equal —
    parquet NTZ inference is session-dependent.
    """
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}

    def _canon(t: str) -> str:
        return "timestamp" if t.startswith("timestamp") else t

    findings = []
    for col, typ in expected.items():
        if col not in actual:
            findings.append(
                {"table": table, "column": col, "kind": "missing_column", "expected": typ, "actual": None}
            )
        elif _canon(actual[col]) != _canon(typ):
            findings.append(
                {
                    "table": table,
                    "column": col,
                    "kind": "type_mismatch",
                    "expected": typ,
                    "actual": actual[col],
                }
            )
    if strict:
        for col in actual:
            if col not in expected:
                findings.append(
                    {
                        "table": table,
                        "column": col,
                        "kind": "unexpected_column",
                        "expected": None,
                        "actual": actual[col],
                    }
                )
    return findings


def _violation_expr(rule: Rule) -> Column:
    p = rule.params
    if rule.kind == "not_null":
        return F.col(p["col"]).isNull()
    if rule.kind == "accepted_values":
        ok = F.col(p["col"]).isin(*p["values"])
        return ~F.coalesce(ok, F.lit(False))
    if rule.kind == "in_range":
        ok = F.col(p["col"]).between(F.lit(p["lo"]), F.lit(p["hi"]))
        return ~F.coalesce(ok, F.lit(False))
    if rule.kind == "matches_regex":
        ok = F.col(p["col"]).rlike(p["pattern"])
        return ~F.coalesce(ok, F.lit(False))
    if rule.kind == "expression":
        ok = F.expr(p["predicate"])
        return ~F.coalesce(ok, F.lit(False))
    raise ValueError(f"not a row-level rule: {rule.kind}")


def evaluate_rules(tables: dict[str, DataFrame], rules: list[Rule]) -> DataFrame:
    """Evaluate all rules with ONE scan per distinct child table.

    Row-level rules compile to violation counters in a single wide
    aggregate. Referential-integrity rules on the same table fold into
    that SAME aggregate: the child is left-joined against the parent's
    distinct keys (a hit marker per RI rule) before aggregating, so the
    orphan count is just another ``SUM(CASE WHEN marker IS NULL)``
    counter — no separate anti-join scan and no separate ``n_rows``
    scan (the r2 plan scanned the child three times). The parent side
    is scanned once for its distinct keys; Catalyst/AQE broadcasts it
    when small and falls back to a shuffled join when not — either way
    the child is read exactly once.
    """
    by_table: dict[str, list[Rule]] = {}
    for r in rules:
        by_table.setdefault(r.table, []).append(r)

    parts: list[DataFrame] = []
    for table, trs in by_table.items():
        df = tables[table]
        # pre-join one distinct-parent-key hit marker per RI rule; a
        # NULL marker after the left join means "no parent row" (NULL
        # child keys never match, matching LEFT ANTI semantics)
        for i, r in enumerate(trs):
            if r.kind != "referential_integrity":
                continue
            parent = tables[r.params["parent_table"]]
            pkeys = (
                parent.select(F.col(r.params["parent_col"]).alias(f"__ri_key_{i}"))
                .where(F.col(f"__ri_key_{i}").isNotNull())
                .distinct()
                .withColumn(f"__ri_hit_{i}", F.lit(1))
            )
            df = df.join(pkeys, df[r.params["col"]] == pkeys[f"__ri_key_{i}"], "left")

        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for i, r in enumerate(trs):
            if r.kind == "unique_key":
                key = F.col(r.params["col"])
                # non-null rows in excess of distinct keys (nulls don't
                # count toward uniqueness on either side)
                aggs.append((F.count(key) - F.count_distinct(key)).alias(f"v{i}"))
            elif r.kind == "referential_integrity":
                aggs.append(
                    F.sum(
                        F.when(F.col(f"__ri_hit_{i}").isNull(), 1).otherwise(0)
                    ).alias(f"v{i}")
                )
            else:
                aggs.append(
                    F.sum(F.when(_violation_expr(r), 1).otherwise(0)).alias(f"v{i}")
                )
        wide = df.agg(*aggs)
        # ONE select over the single wide row emits every rule's report
        # row (inline of a struct array) — a per-rule wide.select would
        # re-run the whole aggregation scan once per rule
        def _passed(i: int, r: Rule):
            tol = r.params.get("max_violation_ratio")
            if tol is None:
                return F.col(f"v{i}") == 0
            # dbt-style tolerance: pass while the violation RATE stays
            # at or under the declared ceiling
            return F.col(f"v{i}") <= F.lit(float(tol)) * F.col("n_rows")

        report_rows = F.array(
            *[
                F.struct(
                    F.lit(r.name).alias("rule_name"),
                    F.lit(table).alias("table_name"),
                    F.col("n_rows").alias("n_rows"),
                    F.col(f"v{i}").cast("long").alias("n_violations"),
                    _passed(i, r).alias("passed"),
                )
                for i, r in enumerate(trs)
            ]
        )
        parts.append(wide.select(F.inline(report_rows)))

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def rule_violation_rows(
    df: DataFrame,
    rules: list[Rule],
    key_cols: list[str],
    max_rows_per_rule: int | None = 1000,
) -> DataFrame:
    """Row-level side output for debugging failed rules: the offending
    rows themselves, tagged with every row-level rule they violate —
    what an on-call engineer pulls after :func:`evaluate_rules` reports
    red (counts say HOW MANY; this says WHICH).

    One scan: each rule's violation predicate becomes an entry in an
    array-of-names column built per row (no per-rule scan, no union),
    then rows with ≥1 violation explode to (rule_name, *key_cols).
    ``max_rows_per_rule`` caps the sample per rule via one keyed
    window (a debugging pull, not a full export — at 100 TB an
    unbounded violations table can be the size of the input; pass
    ``None`` deliberately for a full quarantine extract).
    """
    row_rules = [r for r in rules if r.kind not in ("referential_integrity", "unique_key")]
    tags = F.array_compact(
        F.array(
            *[
                F.when(_violation_expr(r), F.lit(r.name))
                for r in row_rules
            ]
        )
    )
    out = (
        df.select(*key_cols, F.explode(tags).alias("rule_name"))
        .select("rule_name", *key_cols)
    )
    if max_rows_per_rule is not None:
        w = Window.partitionBy("rule_name").orderBy(*[F.col(c) for c in key_cols])
        out = (
            out.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_rows_per_rule)
            .drop("__rn")
        )
    return out


def suggest_rules(
    df: DataFrame,
    cols: list[str],
    accepted_values_cap: int = 10,
) -> DataFrame:
    """Constraint suggestion (the Deequ ``ConstraintSuggestion`` shape):
    profile the declared columns in ONE stacked scan and emit the
    candidate rules the data currently satisfies — the bootstrap for a
    rule suite on an unknown table, to be human-reviewed and then fed
    to :func:`evaluate_rules`.

    Output: (column, rule, param), sorted-stable, with rules:

    - ``not_null`` — no NULLs observed
    - ``unique`` — distinct == non-null count (> 0)
    - ``accepted_values`` — ≤ ``accepted_values_cap`` distinct values;
      param is the sorted ``|``-joined value list
    - ``numeric_range`` — every non-null value parses as a number;
      param is ``<min>..<max>`` in integer MICRO-units (engine-stable
      string, no float formatting)

    Scale shape: the columns stack to (column, value-as-string) long
    form in one scan, aggregate to per-(column, value) counts
    (map-side combined, 8-byte-ish rows), and every rule derives from
    that bounded table — per-column stats via a second tiny
    aggregation, accepted-value lists collected only for columns
    already known to be under the cap. No per-column scans, no
    unbounded collect_set.
    """
    from pyspark.storagelevel import StorageLevel

    stack_args = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in cols)
    stacked = df.selectExpr(f"stack({len(cols)}, {stack_args}) AS (column, value)")
    # pin the per-(column, value) profile table — the stats and
    # accepted-values branches both consume it; unpinned, each re-runs
    # the stacked scan of the raw input
    counts = (
        stacked.groupBy("column", "value")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    num = F.col("value").try_cast("double")
    stats = counts.groupBy("column").agg(
        F.sum("n").alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), F.col("n")).otherwise(0)).alias("n_null"),
        F.sum(F.when(F.col("value").isNotNull(), 1).otherwise(0)).alias("n_distinct"),
        F.sum(
            F.when(F.col("value").isNotNull() & num.isNotNull(), F.col("n")).otherwise(0)
        ).alias("n_numeric"),
        F.min(F.round(num * 1e6).cast("long")).alias("micro_min"),
        F.max(F.round(num * 1e6).cast("long")).alias("micro_max"),
    )
    n_nonnull = F.col("n_rows") - F.col("n_null")
    acc = (
        counts.join(
            stats.filter(
                (F.col("n_distinct") > 0)
                & (F.col("n_distinct") <= accepted_values_cap)
            ).select("column"),
            "column",
        )
        .filter(F.col("value").isNotNull())
        .groupBy("column")
        .agg(
            F.array_join(F.array_sort(F.collect_set("value")), "|").alias("acc_param")
        )
    )
    s = stats.join(F.broadcast(acc), "column", "left")
    rules = F.filter(
        F.array(
            F.when(
                F.col("n_null") == 0,
                F.struct(F.lit("not_null").alias("rule"), F.lit("").alias("param")),
            ),
            F.when(
                (n_nonnull > 0) & (F.col("n_distinct") == n_nonnull),
                F.struct(F.lit("unique").alias("rule"), F.lit("").alias("param")),
            ),
            F.when(
                F.col("acc_param").isNotNull(),
                F.struct(
                    F.lit("accepted_values").alias("rule"),
                    F.col("acc_param").alias("param"),
                ),
            ),
            F.when(
                (n_nonnull > 0) & (F.col("n_numeric") == n_nonnull),
                F.struct(
                    F.lit("numeric_range").alias("rule"),
                    F.concat_ws(
                        "..",
                        F.col("micro_min").cast("string"),
                        F.col("micro_max").cast("string"),
                    ).alias("param"),
                ),
            ),
        ),
        lambda x: x.isNotNull(),
    )
    return (
        s.select("column", F.explode(rules).alias("r"))
        .select("column", F.col("r.rule").alias("rule"), F.col("r.param").alias("param"))
    )
