"""Custom Python DataSource: embedded-DuckDB connector with partitioned
reads and filter pushdown.

The reference's warehouse connectivity is a JDBC connector with
partitioned parallel reads (load_warehouse.py:61-87 ClickHouse JDBC).
Spark 4's Python DataSource API lets this engine grow the same kind of
connector natively — no JVM driver jar — so this module implements one
for DuckDB (the embedded analytical DB this repo already uses as its
differential oracle):

- **JDBC-style partitioning**: ``partition_column`` + ``num_partitions``
  split the value range [min, max] into stride predicates, one SQL query
  per Spark task — parallel reads of one embedded file, the exact
  semantics of ``spark.read.jdbc(..., column, lowerBound, upperBound,
  numPartitions)``.
- **Filter pushdown** (``pushFilters``): EqualTo / GreaterThan[OrEqual] /
  LessThan[OrEqual] / In / IsNotNull are rendered into the remote WHERE
  clause; anything else is returned as unsupported so Spark re-applies
  it post-scan — the same contract as DataSource V2 pushdown.
- **Arrow transport**: each partition streams out of DuckDB as Arrow
  record batches (no per-row Python objects on the read path).

Usage::

    spark.dataSource.register(DuckDBDataSource)
    df = (spark.read.format("duckdb")
          .option("database", "/path/db.duckdb")     # or omit for :memory:
          .option("query", "SELECT * FROM t")         # or .option("table", "t")
          .option("partition_column", "id")
          .option("num_partitions", "8")
          .load())

Deployment notes: executors unpickle the reader by module reference, so
this package must be importable on workers (``--py-files`` / pip install
/ PYTHONPATH — the same requirement as any Python UDF module). Filter
pushdown needs ``spark.sql.python.filterPushdown.enabled=true``; under
the default conf pass ``.option("pushdown", "false")`` (Spark refuses a
reader that merely implements pushFilters when the conf is off). Reads
open the database read-only, so any number of partitions can scan one
embedded file concurrently.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
)

_DUCK_TO_SPARK = {
    "BOOLEAN": "boolean",
    "TINYINT": "byte",
    "SMALLINT": "short",
    "INTEGER": "int",
    "BIGINT": "long",
    "HUGEINT": "decimal(38,0)",
    "FLOAT": "float",
    "DOUBLE": "double",
    "VARCHAR": "string",
    "DATE": "date",
    "TIMESTAMP": "timestamp_ntz",
    "BLOB": "binary",
}


def _sql_literal(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    return str(v)


def _quote(ident: str) -> str:
    return '"' + ident.replace('"', '""') + '"'


class DuckDBDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "duckdb"

    def _relation(self) -> str:
        if "query" in self.options:
            return f"({self.options['query']})"
        return _quote(self.options["table"])

    def _connect(self):
        import duckdb

        db = self.options.get("database", ":memory:")
        return duckdb.connect(db, read_only=db != ":memory:")

    def schema(self) -> str:
        con = self._connect()
        try:
            desc = con.sql(
                f"DESCRIBE SELECT * FROM {self._relation()}"
            ).fetchall()
        finally:
            con.close()
        fields = []
        for name, duck_type, *_ in desc:
            base = duck_type.split("(")[0].upper()
            if base == "DECIMAL":
                spark_type = duck_type.lower()
            else:
                spark_type = _DUCK_TO_SPARK.get(base, "string")
            # Spark DDL quotes identifiers with backticks, not SQL quotes
            fields.append(f"`{name.replace('`', '``')}` {spark_type}")
        return ", ".join(fields)

    def writer(self, schema, overwrite: bool) -> "DuckDBWriter":
        return DuckDBWriter(self.options, schema, overwrite)

    def reader(self, schema) -> "DuckDBReader":
        # Spark refuses a reader that IMPLEMENTS pushFilters when
        # spark.sql.python.filterPushdown.enabled is false (its default),
        # so pushdown is opt-out via option for sessions without the conf:
        # .option("pushdown", "false") selects the plain reader.
        if self.options.get("pushdown", "true").lower() == "false":
            return DuckDBReaderNoPushdown(self.options, schema)
        return DuckDBReader(self.options, schema)


class _DuckDBReaderBase(DataSourceReader):
    """Partition planning + Arrow reads shared by both reader variants."""

    def __init__(self, options, schema):
        self.options = dict(options)
        self.schema = schema
        self.pushed: list[str] = []

    # -- partition planning ---------------------------------------------------

    def _relation(self) -> str:
        if "query" in self.options:
            return f"({self.options['query']})"
        return _quote(self.options["table"])

    def _connect(self):
        import duckdb

        db = self.options.get("database", ":memory:")
        return duckdb.connect(db, read_only=db != ":memory:")

    def partitions(self):
        col = self.options.get("partition_column")
        n = int(self.options.get("num_partitions", "1"))
        if not col or n <= 1:
            return [InputPartition(None)]
        con = self._connect()
        try:
            lo, hi = con.sql(
                f"SELECT MIN({_quote(col)}), MAX({_quote(col)}) FROM {self._relation()}"
            ).fetchone()
        finally:
            con.close()
        if lo is None:
            return [InputPartition(None)]
        lo, hi = int(lo), int(hi)
        stride = max(1, (hi - lo + 1 + n - 1) // n)
        parts = []
        q = _quote(col)
        for i in range(n):
            a, b = lo + i * stride, lo + (i + 1) * stride
            if a > hi:
                break
            pred = f"{q} >= {a} AND {q} < {b}"
            if i == 0:
                pred = f"({pred} OR {q} IS NULL)"  # JDBC semantics: nulls in part 0
            parts.append(InputPartition(pred))
        return parts

    # -- read -----------------------------------------------------------------

    def read(self, partition):
        preds = list(self.pushed)
        if partition.value is not None:
            preds.append(partition.value)
        where = f" WHERE {' AND '.join(preds)}" if preds else ""
        con = self._connect()
        try:
            # schema() declares unmapped DuckDB types (UUID, TIME, LIST,
            # STRUCT, ...) as 'string'; the native Arrow stream would
            # carry their real type and the scan would error on the
            # declared/actual mismatch (ADVICE r3 low). Re-DESCRIBE
            # (metadata-only) and CAST exactly those columns to VARCHAR
            # so batch schema == declared schema.
            desc = con.sql(
                f"DESCRIBE SELECT * FROM {self._relation()}"
            ).fetchall()
            unmapped = {
                name
                for name, duck_type, *_ in desc
                if duck_type.split("(")[0].upper() not in _DUCK_TO_SPARK
                and duck_type.split("(")[0].upper() != "DECIMAL"
            }
            cols = ", ".join(
                f"CAST({_quote(f.name)} AS VARCHAR) AS {_quote(f.name)}"
                if f.name in unmapped
                else _quote(f.name)
                for f in self.schema.fields
            )
            reader = con.sql(
                f"SELECT {cols} FROM {self._relation()}{where}"
            ).fetch_arrow_reader(batch_size=10000)
            for batch in reader:
                yield batch  # Arrow RecordBatch: zero per-row Python objects
        finally:
            con.close()


class DuckDBReader(_DuckDBReaderBase):
    """Reader with WHERE-clause filter pushdown (requires
    ``spark.sql.python.filterPushdown.enabled=true`` — Spark refuses any
    reader that implements pushFilters under the default conf)."""

    def pushFilters(self, filters):
        for f in filters:
            col = _quote(f.attribute[0]) if isinstance(f.attribute, tuple) else _quote(f.attribute)
            if isinstance(f, EqualTo):
                self.pushed.append(f"{col} = {_sql_literal(f.value)}")
            elif isinstance(f, GreaterThan):
                self.pushed.append(f"{col} > {_sql_literal(f.value)}")
            elif isinstance(f, GreaterThanOrEqual):
                self.pushed.append(f"{col} >= {_sql_literal(f.value)}")
            elif isinstance(f, LessThan):
                self.pushed.append(f"{col} < {_sql_literal(f.value)}")
            elif isinstance(f, LessThanOrEqual):
                self.pushed.append(f"{col} <= {_sql_literal(f.value)}")
            elif isinstance(f, In):
                vals = ", ".join(_sql_literal(v) for v in f.value)
                self.pushed.append(f"{col} IN ({vals})")
            elif isinstance(f, IsNotNull):
                self.pushed.append(f"{col} IS NOT NULL")
            else:
                yield f  # unsupported: Spark re-applies it post-scan


class DuckDBReaderNoPushdown(_DuckDBReaderBase):
    """Partitioned Arrow reads without a pushFilters method — for
    sessions where the filter-pushdown conf is off; Spark then applies
    every filter post-scan."""


# ---------------------------------------------------------------------------
# Write path: the warehouse-LOAD half of the connector (the reference's
# load_warehouse.py:61-87 JDBC batch insert + side-channel TRUNCATE,
# S8/S9) with a real two-phase commit:
#
#   phase 1 (executors)  — each task stages its rows as one parquet file
#     in a task-private temp dir and returns the path as its commit
#     message. DuckDB is single-writer, so tasks never touch the database.
#   phase 2 (driver)     — commit(messages) opens ONE write connection and
#     loads every staged file inside ONE transaction (INSERT INTO ...
#     FROM read_parquet([...])); overwrite mode deletes existing rows in
#     the same transaction (transactional TRUNCATE — S9 without the side
#     channel). abort() deletes the staged files; a crashed job leaves
#     the warehouse untouched.
#
# Exactly-once by construction: the warehouse sees either the whole
# dataframe or none of it.
# ---------------------------------------------------------------------------

import os as _os
import tempfile as _tempfile
import uuid as _uuid
from dataclasses import dataclass

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


@dataclass
class _StagedFile(WriterCommitMessage):
    path: str
    rows: int


class DuckDBWriter(DataSourceWriter):
    """Two-phase-commit loader (see block comment above).

    SHARED-FILESYSTEM REQUIREMENT: phase 1 stages parquet under
    ``staging_dir`` on the *executor* and phase 2 opens those paths on
    the *driver*, so ``staging_dir`` must be a filesystem both can see —
    automatic in local mode (the default is the driver's temp dir), but
    on a real cluster you MUST pass ``.option("staging_dir", <NFS/fuse
    mount>)``; with executor-local staging the commit-side
    ``read_parquet`` fails closed (no partial load) but the write cannot
    succeed. (The embedded DuckDB file itself has the same property: the
    driver must reach it.)
    """

    def __init__(self, options, schema, overwrite: bool):
        self.options = dict(options)
        self.schema = schema
        self.overwrite = overwrite
        self.staging_dir = self.options.get("staging_dir") or _tempfile.gettempdir()

    def write(self, iterator):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        rows = [r.asDict() for r in iterator]
        path = _os.path.join(
            self.staging_dir, f"duckdb_stage_{_uuid.uuid4().hex}.parquet"
        )
        if rows:
            # explicit schema: an all-None column in this partition would
            # otherwise infer arrow null type and break the commit-side
            # read_parquet union across staged files (ADVICE r3 medium)
            table = pa.Table.from_pylist(rows, schema=to_arrow_schema(self.schema))
            pq.write_table(table, path)
            return _StagedFile(path=path, rows=len(rows))
        return _StagedFile(path="", rows=0)

    def _connect_rw(self):
        import duckdb

        return duckdb.connect(self.options["database"])

    def commit(self, messages):
        files = [m.path for m in messages if m.rows > 0]
        table = self.options["table"]
        con = self._connect_rw()
        try:
            con.begin()
            if self.overwrite:
                con.sql(f"DELETE FROM {_quote(table)}")
            if files:
                file_list = ", ".join(_sql_literal(f) for f in files)
                con.sql(
                    f"INSERT INTO {_quote(table)} "
                    f"SELECT * FROM read_parquet([{file_list}])"
                )
            con.commit()
        except Exception:
            con.rollback()
            raise
        finally:
            con.close()
            for f in files:
                try:
                    _os.remove(f)
                except OSError:
                    pass

    def abort(self, messages):
        for m in messages:
            if m.rows > 0:
                try:
                    _os.remove(m.path)
                except OSError:
                    pass
