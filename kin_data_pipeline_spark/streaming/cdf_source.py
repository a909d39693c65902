"""Streaming change-data-feed source over the versioned catalog — a
custom PySpark 4 Python Data Source (``pyspark.sql.datasource``).

`Catalog.table_changes` answers "what changed between v_from and v_to" as
a batch question; this source turns the SAME contract into a stream:
offsets are VERSION NUMBERS in the table's commit log (`_log.json` is the
single authority the batch reader also trusts), `latestOffset` re-reads
the log each trigger, and each micro-batch emits one partition per newly
committed version carrying the row-level insert/delete diff versus its
predecessor plus `_commit_version` provenance. Reading the Delta-style
CDF as a stream is exactly Delta's `readStream.option("readChangeFeed")`
surface, expressed PySpark-natively.

Scale boundary (documented, same class as PLANS.md's other rows): each
partition diffs two full version snapshots in one task via a counted
hash map — O(|v-1| + |v|) per commit, the same total work the batch
`table_changes` pays, but not distributed within a commit. The
production-scale form derives per-commit changes from the mutation's own
changelog (the engine's `apply_changelog` path) instead of re-diffing
snapshots; this source is the CONSUMER surface and the test-scale
reference implementation.

Workers rebuild state from paths + JSON only (options travel as strings;
no SparkSession, no Catalog object crosses the boundary), so the source
works in any deployment where executors see the warehouse filesystem —
the same requirement the hardlinked version store already imposes.
"""

from __future__ import annotations

import json
import os
from collections import Counter
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

TRACKING_COLS = "_change_type string, _commit_version int"


def _versions_dir(warehouse: str, table: str) -> str:
    return os.path.join(warehouse, f"{table}.__versions")


def _read_log(warehouse: str, table: str) -> list[dict]:
    log = os.path.join(_versions_dir(warehouse, table), "_log.json")
    with open(log) as fh:
        return json.load(fh)


class _VersionDiffPartition(InputPartition):
    def __init__(
        self, warehouse: str, table: str, version: int, arrow_schema
    ):
        self.warehouse = warehouse
        self.table = table
        self.version = version
        self.arrow_schema = arrow_schema  # picklable pa.schema


class CatalogChangesStreamReader(DataSourceStreamReader):
    """Offsets are ``{"version": N}`` = "every commit ≤ N has been
    emitted". The initial offset is the starting version (default 0), so
    a fresh stream replays history from the enable point — pass
    ``startingVersion`` to begin later (Delta's convention)."""

    def __init__(self, schema, options):
        from pyspark.sql.pandas.types import to_arrow_schema

        self._warehouse = options["warehouse"]
        self._table = options["table"]
        self._start = int(options.get("startingversion", 0))
        # spark passes the parsed schema; field order defines row order,
        # and the arrow twin types the record batches read() emits
        # (vectorized transfer — never row-at-a-time tuples)
        self._arrow_schema = to_arrow_schema(schema)

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        entries = _read_log(self._warehouse, self._table)
        tip = entries[-1]["version"] if entries else self._start
        return {"version": max(tip, self._start)}

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        # one partition per newly committed version: batch (start, end]
        return [
            _VersionDiffPartition(
                self._warehouse, self._table, v, self._arrow_schema
            )
            for v in range(int(start["version"]) + 1, int(end["version"]) + 1)
        ]

    def read(self, partition: _VersionDiffPartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        base = _versions_dir(partition.warehouse, partition.table)
        fields = [
            f.name for f in partition.arrow_schema if not f.name.startswith("_")
        ]

        def rows(version: int) -> list[tuple]:
            data = os.path.join(base, f"v{version}", "data")
            if not os.path.isdir(data):
                raise ValueError(
                    f"version {version} of '{partition.table}' is not on "
                    "disk (vacuumed?): start the stream at a retained "
                    "version via startingVersion"
                )
            tbl = pq.read_table(data, columns=fields)
            cols = [tbl.column(f).to_pylist() for f in fields]
            return list(zip(*cols)) if cols else []

        v = partition.version
        old = Counter(rows(v - 1)) if v > 0 else Counter()
        new = Counter(rows(v))
        # multiplicity-aware diff — the same EXCEPT ALL semantics as the
        # batch Catalog.table_changes
        out: list[tuple] = []
        for row, n in sorted((new - old).items()):
            out.extend((*row, "insert", v) for _ in range(n))
        for row, n in sorted((old - new).items()):
            out.extend((*row, "delete", v) for _ in range(n))
        if not out:
            return iter(())
        cols = list(zip(*out))
        batch = pa.record_batch(
            [
                pa.array(col, type=field.type)
                for col, field in zip(cols, partition.arrow_schema)
            ],
            schema=partition.arrow_schema,
        )
        return iter((batch,))

    def commit(self, end: dict) -> None:
        pass  # the version store is append-only; nothing to release


class CatalogChangesBatchReader(DataSourceReader):
    """Batch twin (``spark.read.format("catalog_changes")``): the change
    rows for the version range (``startingVersion``, ``endingVersion``],
    one diff partition per commit — Delta's batch ``readChangeFeed``
    surface. ``endingVersion`` defaults to the log tip at planning
    time."""

    def __init__(self, schema, options):
        from pyspark.sql.pandas.types import to_arrow_schema

        self._warehouse = options["warehouse"]
        self._table = options["table"]
        self._start = int(options.get("startingversion", 0))
        if "endingversion" in options:
            self._end = int(options["endingversion"])
        else:
            entries = _read_log(self._warehouse, self._table)
            self._end = entries[-1]["version"] if entries else self._start
        self._arrow_schema = to_arrow_schema(schema)

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _VersionDiffPartition(
                self._warehouse, self._table, v, self._arrow_schema
            )
            for v in range(self._start + 1, self._end + 1)
        ]

    read = CatalogChangesStreamReader.read


class CatalogChangesDataSource(DataSource):
    """``spark.readStream.format("catalog_changes")`` (or ``spark.read``
    for a bounded version range) over a versioned catalog table. Options:
    ``warehouse``, ``table``, ``schema_ddl`` (the table's column DDL —
    workers cannot probe the catalog for it), optional
    ``startingVersion`` / ``endingVersion`` (batch only)."""

    @classmethod
    def name(cls) -> str:
        return "catalog_changes"

    def schema(self) -> str:
        return f"{self.options['schema_ddl']}, {TRACKING_COLS}"

    def reader(self, schema) -> CatalogChangesBatchReader:
        return CatalogChangesBatchReader(schema, self.options)

    def streamReader(self, schema) -> CatalogChangesStreamReader:
        return CatalogChangesStreamReader(schema, self.options)


def read_table_changes(spark, warehouse: str, table: str, schema_ddl: str,
                       starting_version: int = 0,
                       ending_version: int | None = None):
    """Batch CDF read through the same source: change rows for the
    version range (starting, ending]; ending defaults to the tip."""
    spark.dataSource.register(CatalogChangesDataSource)
    r = (
        spark.read.format("catalog_changes")
        .option("warehouse", warehouse)
        .option("table", table)
        .option("schema_ddl", schema_ddl)
        .option("startingVersion", starting_version)
    )
    if ending_version is not None:
        r = r.option("endingVersion", ending_version)
    return r.load()


def stream_table_changes(spark, warehouse: str, table: str, schema_ddl: str,
                         starting_version: int = 0):
    """Register the source (idempotent per session) and open the CDF
    stream for ``table``: the table's columns plus ``_change_type`` and
    ``_commit_version``."""
    spark.dataSource.register(CatalogChangesDataSource)
    return (
        spark.readStream.format("catalog_changes")
        .option("warehouse", warehouse)
        .option("table", table)
        .option("schema_ddl", schema_ddl)
        .option("startingVersion", starting_version)
        .load()
    )
