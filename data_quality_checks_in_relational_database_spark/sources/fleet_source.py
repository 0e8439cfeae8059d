"""Custom Python Data Source (Spark 4 DataSource API): a fleet of
per-site record feeds exposed as ONE partitioned relation.

The reference's I/O model is "loop over N site databases, query each,
concat client-side" (data_consistency_checks.py:85-116). The Spark 4
Python Data Source API inverts that: each site becomes an
InputPartition, Spark schedules the per-site reads across executors,
and the result is a single DataFrame — the fan-out happens inside the
scan, with Spark's retry/locality machinery instead of a driver loop.

This module ships a deterministic synthetic implementation
(``fleet``): each site partition yields seeded pseudo-random visit
rows (site_id, visit_id, visit_ts_us, status). Deterministic-by-seed
makes it usable in differential tests; swapping the row generator for
a real per-site fetch (REST page, message queue slice, legacy driver)
is the extension point — the partition/schema/serialization plumbing
is exactly what a production custom source needs.

Filter pushdown: the reader implements ``pushFilters`` for equality on
``site_id`` — a filtered scan prunes whole site partitions before any
row is generated (the Python-source analogue of partition pruning).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

FLEET_SCHEMA = StructType(
    [
        StructField("site_id", LongType(), False),
        StructField("visit_id", LongType(), False),
        StructField("visit_ts_us", LongType(), False),
        StructField("status", StringType(), False),
    ]
)

_STATUSES = ("open", "closed", "voided")
#: 2024-01-01T00:00:00Z in epoch microseconds
_BASE_US = 1_704_067_200_000_000


class _SitePartition(InputPartition):
    def __init__(self, site_id: int, rows_per_site: int, seed: int):
        self.site_id = site_id
        self.rows_per_site = rows_per_site
        self.seed = seed


def _lcg(state: int) -> int:
    # explicit 64-bit LCG (MMIX constants) — deterministic across
    # Python versions, no dependence on random module internals
    return (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)


def site_rows(site_id: int, rows_per_site: int, seed: int):
    """The deterministic per-site generator (shared with tests/oracles):
    yields (site_id, visit_id, visit_ts_us, status)."""
    state = _lcg(seed * 1_000_003 + site_id)
    for i in range(rows_per_site):
        state = _lcg(state)
        ts = _BASE_US + (state >> 16) % (30 * 24 * 3600 * 1_000_000)
        status = _STATUSES[state % 3]
        yield (site_id, site_id * 1_000_000 + i, ts, status)


class FleetReader(DataSourceReader):
    def __init__(self, options):
        self.n_sites = int(options.get("sites", "4"))
        self.rows_per_site = int(options.get("rowspersite", "100"))
        self.seed = int(options.get("seed", "7"))
        self._site_filter: int | None = None

    def pushFilters(self, filters):
        # accept site_id equality (partition pruning); everything else
        # stays in Spark's post-scan Filter
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("site_id",):
                self._site_filter = int(f.value)
            else:
                yield f

    def partitions(self):
        sites = range(self.n_sites)
        if self._site_filter is not None:
            sites = [s for s in sites if s == self._site_filter]
        return [
            _SitePartition(s, self.rows_per_site, self.seed) for s in sites
        ]

    def read(self, partition: _SitePartition):
        yield from site_rows(
            partition.site_id, partition.rows_per_site, partition.seed
        )


class FleetDataSource(DataSource):
    """``spark.read.format("fleet").option("sites", 8).load()``"""

    @classmethod
    def name(cls) -> str:
        return "fleet"

    def schema(self):
        return FLEET_SCHEMA

    def reader(self, schema) -> FleetReader:
        return FleetReader(self.options)


def register(spark) -> None:
    # runtime conf: Python-source filter pushdown is opt-in (readers
    # that implement pushFilters error without it)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(FleetDataSource)
