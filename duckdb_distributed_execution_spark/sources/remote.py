"""``duckdb_remote`` — a PySpark Python DataSource that scans a table
served by an embedded DuckDB database, split into rowid-range tasks.

This is the Spark-native re-expression of the reference's core
novelty, the distributed remote-table scan:

- client scan table function + paging
  (src/client/distributed_table_scan_function.cpp:37-120, pages
  LIMIT/OFFSET tickets — ``strategy='offset'`` here);
- task partitioner's strategy ladder
  (src/server/driver/task_partitioner.cpp:35-160: small-table bypass
  below one row group 14-21, range strategy 100-135, task cap
  4×workers 54-57 — ``partitions()`` here);
- partition SQL generation by rowid-predicate injection
  (src/server/driver/partition_sql_generator.cpp:7-45 —
  ``rowid BETWEEN lo AND hi`` in ``read()`` here);
- worker execution streaming Arrow record batches
  (src/server/worker/worker_node.cpp:273-331 — each Spark task opens
  the database read-only and yields ``pyarrow.RecordBatch``es).

It goes beyond the reference in one deliberate way: the reference
pushes only *projection* into the remote scan (filters run
client-side, distributed_table_scan_function.cpp:40-41); this source
implements real **filter pushdown** (``pushFilters``) so predicates
execute inside the remote engine and never cross the wire.

At cluster scale each executor task opens its own read-only
connection (DuckDB supports concurrent read-only attach), reads only
its rowid range, and streams Arrow batches straight into Spark's
columnar pipeline — no driver funnel, no row-at-a-time path.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

# Reference row-group unit: 122,880 rows (query_plan_analyzer.cpp:91,
# docs/README.md:117-121) — the scheduling quantum below which a scan
# is not worth distributing (task_partitioner.cpp:14-21).
ROW_GROUP_ROWS = 122_880
TASK_CAP_FACTOR = 4  # tasks ≤ 4 × target parallelism (task_partitioner.cpp:54-57)


@dataclass
class _RangeTask(InputPartition):
    lo: int
    hi: int  # inclusive rowid range


@dataclass
class _PageTask(InputPartition):
    limit: int
    offset: int


def _sql_literal(v) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    raise ValueError(f"unsupported literal {type(v).__name__}")


class DuckDBRemoteReader(DataSourceReader):
    def __init__(self, options, schema):
        self._path = options["path"]
        self._table = options["table"]
        self._target = int(options.get("partitions", "8"))
        self._unit = int(options.get("page_rows", str(ROW_GROUP_ROWS)))
        self._strategy = options.get("strategy", "rowid")
        self._columns = [f.name for f in schema.fields]
        self._pushed: list[str] = []

    # -- filter pushdown (superset of the reference's projection-only) --
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            clause = self._translate(f)
            if clause is None:
                yield f  # Spark re-applies what we can't push
            else:
                self._pushed.append(clause)

    def _translate(self, f: Filter) -> str | None:
        attr = getattr(f, "attribute", None)
        if not attr or len(attr) != 1:
            return None
        col = '"' + attr[0].replace('"', '""') + '"'
        try:
            if isinstance(f, EqualTo):
                return f"{col} = {_sql_literal(f.value)}"
            if isinstance(f, GreaterThan):
                return f"{col} > {_sql_literal(f.value)}"
            if isinstance(f, GreaterThanOrEqual):
                return f"{col} >= {_sql_literal(f.value)}"
            if isinstance(f, LessThan):
                return f"{col} < {_sql_literal(f.value)}"
            if isinstance(f, LessThanOrEqual):
                return f"{col} <= {_sql_literal(f.value)}"
            if isinstance(f, In):
                vals = ", ".join(_sql_literal(v) for v in f.value)
                return f"{col} IN ({vals})"
            if isinstance(f, IsNull):
                return f"{col} IS NULL"
            if isinstance(f, IsNotNull):
                return f"{col} IS NOT NULL"
        except ValueError:
            return None
        return None

    # -- task planning: the reference's strategy ladder --
    def partitions(self) -> list[InputPartition]:
        import duckdb

        con = duckdb.connect(self._path, read_only=True)
        try:
            rows = con.sql(
                f'SELECT COUNT(*) FROM "{self._table}"'
            ).fetchone()[0]
        finally:
            con.close()
        if rows == 0:
            return [_RangeTask(0, -1)]
        if rows < self._unit:
            # Small-table bypass: a single task (task_partitioner.cpp:14-21).
            n_tasks = 1
        else:
            n_tasks = min(
                math.ceil(rows / self._unit), TASK_CAP_FACTOR * self._target
            )
        per = math.ceil(rows / n_tasks)
        if self._strategy == "offset":
            return [
                _PageTask(limit=per, offset=i * per) for i in range(n_tasks)
            ]
        return [
            _RangeTask(lo=i * per, hi=min((i + 1) * per, rows) - 1)
            for i in range(n_tasks)
        ]

    # -- worker-side execution: rowid-injected SQL → Arrow batches --
    def read(self, partition: InputPartition):
        import duckdb

        cols = ", ".join('"' + c + '"' for c in self._columns)
        if isinstance(partition, _PageTask):
            # Scan paging analog (LIMIT/OFFSET per Flight round-trip,
            # distributed_flight_server.cpp:503-508). ORDER BY rowid
            # pins page boundaries to physical order so pages tile the
            # table deterministically under parallel scans.
            where = (" WHERE " + " AND ".join(self._pushed)) if self._pushed else ""
            q = (
                f'SELECT {cols} FROM "{self._table}"{where} '
                f"ORDER BY rowid LIMIT {partition.limit} OFFSET {partition.offset}"
            )
        else:
            if partition.hi < partition.lo:
                return
            preds = [
                f"rowid BETWEEN {partition.lo} AND {partition.hi}"
            ] + self._pushed
            q = (
                f'SELECT {cols} FROM "{self._table}" '
                f"WHERE {' AND '.join(preds)}"
            )
        con = duckdb.connect(self._path, read_only=True)
        try:
            reader = con.sql(q).fetch_arrow_reader(batch_size=8192)
            for batch in reader:
                yield batch
        finally:
            con.close()


class DuckDBRemoteStreamReader(SimpleDataSourceStreamReader):
    """CDC-style streaming ingest from the remote table: each
    micro-batch reads the rowid tail appended since the last offset
    (``{"rowid": n}`` — rows with rowid ≥ n). The reference has no
    streaming surface at all (SURVEY §2.C); this completes the remote
    round-trip so a duckherder-style table can feed a Structured
    Streaming pipeline (watermarked aggs, streaming dedup, …) with
    exactly-once offsets tracked in the Spark checkpoint.

    Append-only contract: rowids of committed rows never change while
    the stream runs (DuckDB appends assign monotonically increasing
    rowids); deletes/updates are out of scope, as they are for every
    log-tail CDC reader."""

    def __init__(self, options):
        self._path = options["path"]
        self._table = options["table"]

    def initialOffset(self) -> dict:
        return {"rowid": 0}

    def _max_rowid_exclusive(self, con) -> int:
        row = con.sql(
            f'SELECT MAX(rowid) FROM "{self._table}"'
        ).fetchone()
        return (row[0] + 1) if row and row[0] is not None else 0

    def read(self, start: dict):
        import duckdb

        con = duckdb.connect(self._path, read_only=True)
        try:
            end = self._max_rowid_exclusive(con)
            lo = int(start["rowid"])
            if end <= lo:
                return iter([]), start
            rows = con.sql(
                f'SELECT * FROM "{self._table}" '
                f"WHERE rowid >= {lo} AND rowid < {end}"
            ).fetchall()
        finally:
            con.close()
        return iter(rows), {"rowid": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        import duckdb

        con = duckdb.connect(self._path, read_only=True)
        try:
            rows = con.sql(
                f'SELECT * FROM "{self._table}" '
                f"WHERE rowid >= {int(start['rowid'])} "
                f"AND rowid < {int(end['rowid'])}"
            ).fetchall()
        finally:
            con.close()
        return iter(rows)


@dataclass
class _StagedFile(WriterCommitMessage):
    path: str
    rows: int


class DuckDBRemoteWriter(DataSourceArrowWriter):
    """Distributed INSERT back to the remote database — the Spark
    re-expression of the reference's write path (A3,
    distributed_insert.cpp:26-100 + the DoPut Arrow ingest,
    distributed_flight_server.cpp:573-613), minus its wart: the
    reference serializes every chunk into one giant row-by-row
    ``INSERT … VALUES`` SQL string on the driver; here every task
    stages its partition as parquet (columnar, parallel, off-driver)
    and ``commit()`` appends all staged files to the table in ONE
    transaction — honoring DuckDB's single-writer model at the commit
    point only, with data movement fully distributed. ``abort()``
    removes the staging directory, so a failed write leaves the table
    untouched (all-or-nothing, which the reference does not have)."""

    def __init__(self, options, overwrite: bool):
        self._path = options["path"]
        self._table = options["table"]
        self._staging = self._path + ".staging"
        self._overwrite = overwrite

    def write(self, iterator):
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(self._staging, exist_ok=True)
        out = os.path.join(self._staging, f"part-{uuid.uuid4().hex}.parquet")
        writer = None
        rows = 0
        for batch in iterator:
            if writer is None:
                writer = pq.ParquetWriter(out, batch.schema)
            writer.write_table(pa.Table.from_batches([batch]))
            rows += batch.num_rows
        if writer is None:
            return _StagedFile(path="", rows=0)
        writer.close()
        return _StagedFile(path=out, rows=rows)

    def commit(self, messages):
        import shutil

        import duckdb

        files = [m.path for m in messages if m is not None and m.path]
        con = duckdb.connect(self._path)
        try:
            con.execute("BEGIN")
            if self._overwrite:
                con.execute(f'DELETE FROM "{self._table}"')
            if files:
                con.execute(
                    f'INSERT INTO "{self._table}" '
                    f"SELECT * FROM read_parquet(?)",
                    [files],
                )
            con.execute("COMMIT")
        finally:
            con.close()
        shutil.rmtree(self._staging, ignore_errors=True)

    def abort(self, messages):
        import shutil

        shutil.rmtree(self._staging, ignore_errors=True)


class DuckDBRemoteDataSource(DataSource):
    """Register with ``spark.dataSource.register(DuckDBRemoteDataSource)``
    then::

        spark.read.format("duckdb_remote")
             .option("path", "/path/server.duckdb")
             .option("table", "lineitem")
             .option("partitions", "32")       # target parallelism
             .option("strategy", "rowid")      # or "offset" paging
             .load()
    """

    @classmethod
    def name(cls) -> str:
        return "duckdb_remote"

    def schema(self):
        import duckdb

        from pyspark.sql.pandas.types import from_arrow_schema

        con = duckdb.connect(self.options["path"], read_only=True)
        try:
            arrow_schema = con.sql(
                f'SELECT * FROM "{self.options["table"]}" LIMIT 0'
            ).arrow().schema
        finally:
            con.close()
        return from_arrow_schema(arrow_schema)

    def reader(self, schema) -> DataSourceReader:
        return DuckDBRemoteReader(self.options, schema)

    def writer(self, schema, overwrite: bool) -> DuckDBRemoteWriter:
        return DuckDBRemoteWriter(self.options, overwrite)

    def simpleStreamReader(self, schema) -> DuckDBRemoteStreamReader:
        return DuckDBRemoteStreamReader(self.options)


_REGISTERED: set[str] = set()


def register_remote_source(spark) -> None:
    """Idempotently register the ``duckdb_remote`` format on a session.
    Also enables Python-datasource filter pushdown: the reader
    implements ``pushFilters`` and Spark refuses to plan it while the
    capability flag is off."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    app = spark.sparkContext.applicationId
    if app in _REGISTERED:
        return
    # The registered DataSource class is cloudpickled into planner-
    # and worker-side Python processes that (unlike task workers) do
    # NOT see sc.addPyFile additions for streaming source init — if
    # this module is pickled BY REFERENCE, any harness whose CWD isn't
    # the repo root dies with ModuleNotFoundError there. Registering
    # the module for pickle-BY-VALUE makes the class self-contained
    # (its globals ride along; stdlib/pyspark/duckdb imports stay by
    # reference).
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(DuckDBRemoteDataSource)
    _REGISTERED.add(app)


def build_remote_db(
    sf_dir: str, tables: tuple[str, ...] = ("lineitem", "supplier", "events")
) -> str:
    """Materialize a deterministic DuckDB 'server' database from the
    testdata parquet (once per sf_dir per process) — the stand-in for
    the reference's remote duckling catalog."""
    import duckdb

    tag = os.path.basename(sf_dir.rstrip("/"))
    # v2: table set grew (events added) — versioned name invalidates
    # any db built by an earlier process with fewer tables.
    path = os.path.join("/tmp", f"dde_remote_v2_{tag}.duckdb")
    if os.path.exists(path):
        return path
    tmp = f"{path}.build-{os.getpid()}"
    if os.path.exists(tmp):
        os.unlink(tmp)
    con = duckdb.connect(tmp)
    try:
        for t in tables:
            src = os.path.join(sf_dir, f"{t}.parquet")
            con.execute(
                f'CREATE TABLE "{t}" AS SELECT * FROM read_parquet(?)', [src]
            )
    finally:
        con.close()
    os.rename(tmp, path)
    return path
