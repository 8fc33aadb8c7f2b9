"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``): a
deterministic synthetic ledger with PARTITIONED reads and FILTER
PUSHDOWN — the modern connector surface for sources the built-in
readers don't cover (internal services, ledgers, feature stores).

The reference ingests via engine-attached readers (gzip CSV over HTTP,
``dags/mitma/bronze_mitma.py``); this is the Spark-4-native equivalent
extension point, exercised end to end: ``spark.dataSource.register`` →
``spark.read.format("synthetic_ledger")`` → Catalyst pushes supported
predicates into :meth:`LedgerReader.pushFilters` → each
:class:`InputPartition` generates ONLY the ids its pruned range/stride
covers.

Pushdown here is not cosmetic — it changes the work:

- ``GreaterThanOrEqual/GreaterThan/LessThan/LessThanOrEqual(entry_id)``
  narrow the generated id RANGE (partition pruning at the source),
- ``EqualTo(bucket)`` turns enumeration into a STRIDED walk (only ids
  with ``id % NBUCKETS == bucket`` are ever produced — a 16× row cut).

Everything is closed-form integer arithmetic on ``entry_id``
(amount = (id*97) % 10000 cents; day = 2024-01-01 + id % 365;
bucket = id % 16), so a DuckDB ``range()`` relation reproduces the
source exactly and any generation/pushdown bug fails the hash.
"""

from __future__ import annotations

from datetime import date, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

LEDGER_ROWS = 100_000
NBUCKETS = 16
N_PARTITIONS = 8
_EPOCH = date(2024, 1, 1)

SCHEMA_DDL = "entry_id bigint, bucket int, amount_cents bigint, day date"


class LedgerReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", LEDGER_ROWS))
        self.lo = 0  # inclusive id lower bound after pushdown
        self.hi = self.n_rows  # exclusive upper bound after pushdown
        self.bucket: int | None = None  # EqualTo(bucket) stride, if pushed

    def pushFilters(self, filters):  # noqa: N802 (API name)
        """Accept entry_id range bounds and bucket equality; everything
        else is returned to Spark to evaluate post-scan."""
        for f in filters:
            if isinstance(f, GreaterThanOrEqual) and f.attribute == ("entry_id",):
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, GreaterThan) and f.attribute == ("entry_id",):
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, LessThan) and f.attribute == ("entry_id",):
                self.hi = min(self.hi, int(f.value))
            elif isinstance(f, LessThanOrEqual) and f.attribute == ("entry_id",):
                self.hi = min(self.hi, int(f.value) + 1)
            elif isinstance(f, EqualTo) and f.attribute == ("bucket",):
                self.bucket = int(f.value)
            else:
                yield f  # unsupported -> Spark keeps it

    def partitions(self):
        """Split the (pruned) id range into contiguous slices — the
        parallel-read contract; each slice generates independently."""
        span = max(0, self.hi - self.lo)
        step = max(1, -(-span // N_PARTITIONS))  # ceil div
        return [
            InputPartition((self.lo + i * step, min(self.lo + (i + 1) * step, self.hi)))
            for i in range(N_PARTITIONS)
            if self.lo + i * step < self.hi
        ]

    def read(self, partition):
        lo, hi = partition.value
        if self.bucket is not None:
            # strided walk: first id >= lo with id % NBUCKETS == bucket
            first = lo + (self.bucket - lo) % NBUCKETS
            ids = range(first, hi, NBUCKETS)
        else:
            ids = range(lo, hi)
        for i in ids:
            yield (
                i,
                i % NBUCKETS,
                (i * 97) % 10000,
                _EPOCH + timedelta(days=i % 365),
            )


class LedgerDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_ledger"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return LedgerReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(LedgerDataSource)
