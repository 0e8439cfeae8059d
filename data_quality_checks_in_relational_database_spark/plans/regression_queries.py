"""Closed-form distributed regression: OLS fit via exact normal
equations.

No counterpart in the reference (flat aggregates only); this is the
model-fit shape a curation pipeline uses to learn simple scoring /
cost models over the corpus (e.g. predicting document cost from
length features) without an ML runtime.

Scale design (100 TB): the fit is ONE map-side-combinable aggregate —
the normal-equation sufficient statistics (9 sums + count for two
features) — followed by an O(1) closed-form Cramer solve on the
1-row result. No iteration, no driver collect of data, no Python:
everything is whole-stage-codegen SQL. Sufficient statistics are
summed as exact integers (quantity is integral, money in integer
cents) in DECIMAL(38,0), so the solve's double inputs are bit-exact
under any partitioning — the same determinism contract as
``functions.scalars.money_sum``. At petabyte row counts the decimal
accumulator is what prevents BIGINT overflow (sum of rc*yc crosses
2^63 around SF 1).

The Spark query and the DuckDB oracle run the SAME SQL text (dialect
intersection), so the gate proves the whole pipeline — coercion,
exact sums, Cramer determinants, R² — agrees across engines to the
rounded 6th decimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_quality_checks_in_relational_database_spark.session import register_views

# Fit l_extendedprice ~ b0 + b1*l_quantity + b2*p_retailprice.
# Shared dialect-intersection SQL: exact integer sufficient statistics
# (cents / integral quantity) accumulated in DECIMAL(38,0), cast to
# DOUBLE only for the closed-form solve; every emitted double is
# ROUND(..., 6) + 0.0 (negative-zero canonicalization).
SQL_OLS_PRICE_MODEL = """
WITH obs AS (
    SELECT CAST(l.l_quantity AS BIGINT) AS q,
           CAST(ROUND(p.p_retailprice * 100, 0) AS BIGINT) AS rc,
           CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT) AS yc
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
s AS (
    SELECT CAST(COUNT(*) AS DOUBLE)                                 AS n,
           CAST(SUM(CAST(q AS DECIMAL(38, 0))) AS DOUBLE)           AS s1,
           CAST(SUM(CAST(rc AS DECIMAL(38, 0))) AS DOUBLE) / 100.0  AS s2,
           CAST(SUM(CAST(q * q AS DECIMAL(38, 0))) AS DOUBLE)       AS s11,
           CAST(SUM(CAST(q * rc AS DECIMAL(38, 0))) AS DOUBLE) / 100.0    AS s12,
           CAST(SUM(CAST(rc * rc AS DECIMAL(38, 0))) AS DOUBLE) / 10000.0 AS s22,
           CAST(SUM(CAST(yc AS DECIMAL(38, 0))) AS DOUBLE) / 100.0        AS sy,
           CAST(SUM(CAST(q * yc AS DECIMAL(38, 0))) AS DOUBLE) / 100.0    AS s1y,
           CAST(SUM(CAST(rc * yc AS DECIMAL(38, 0))) AS DOUBLE) / 10000.0 AS s2y,
           CAST(SUM(CAST(yc * yc AS DECIMAL(38, 0))) AS DOUBLE) / 10000.0 AS syy
    FROM obs
),
solved AS (
    SELECT n, sy, s1y, s2y, syy,
           n  * (s11 * s22 - s12 * s12)
         - s1 * (s1  * s22 - s12 * s2)
         + s2 * (s1  * s12 - s11 * s2)  AS det,
           sy * (s11 * s22 - s12 * s12)
         - s1 * (s1y * s22 - s12 * s2y)
         + s2 * (s1y * s12 - s11 * s2y) AS det0,
           n  * (s1y * s22 - s2y * s12)
         - sy * (s1  * s22 - s12 * s2)
         + s2 * (s1  * s2y - s1y * s2)  AS det1,
           n  * (s11 * s2y - s12 * s1y)
         - s1 * (s1  * s2y - s1y * s2)
         + sy * (s1  * s12 - s11 * s2)  AS det2
    FROM s
),
betas AS (
    SELECT n, sy, s1y, s2y, syy,
           det0 / det AS b0, det1 / det AS b1, det2 / det AS b2
    FROM solved
)
SELECT CAST(n AS BIGINT) AS n_obs,
       ROUND(b0, 6) + 0.0 AS beta0,
       ROUND(b1, 6) + 0.0 AS beta1,
       ROUND(b2, 6) + 0.0 AS beta2,
       ROUND(1.0 - (syy - b0 * sy - b1 * s1y - b2 * s2y)
                 / (syy - sy * sy / n), 6) + 0.0 AS r2
FROM betas
"""


def q_ols_price_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS fit of extended price on quantity and part retail price —
    closed-form normal equations in one whole-stage-codegen aggregate
    plus a Cramer solve on the 1-row sufficient-statistics frame.
    Shared SQL text: the oracle runs the identical statement."""
    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(SQL_OLS_PRICE_MODEL)


ORACLE_OLS_PRICE_MODEL = SQL_OLS_PRICE_MODEL
