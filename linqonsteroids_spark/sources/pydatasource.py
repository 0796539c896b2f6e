"""Custom Python Data Source (Spark 4 `pyspark.sql.datasource`): the
"user-defined collection leaf" surface done Spark-natively.

Reference parity: the reference lets any Scala collection become a query
leaf (`Queryable`/`pureColl`, see sources/parquet.py citations); the
Spark-4 equivalent for a NON-FILE source (a service, a generator, a
proprietary store) is a registered Python DataSource. This module ships
a deterministic synthetic-ledger source that demonstrates the three
properties a 100 TB connector must have:

- **partitioned reads**: `partitions()` splits the keyspace into
  `parts` contiguous ranges, one task each — the driver never
  materializes rows, and parallelism is declared, not collected;
- **source-level filter pushdown**: `pushFilters` accepts >=/</<=/>
  and = predicates on the row id `i` and narrows each partition's
  range BEFORE any row is generated (Spark's planner sees the accepted
  filters removed from the post-scan Filter) — rows outside the pushed
  range are never yielded, the connector-side analogue of parquet
  row-group pruning;
- **exact determinism**: every column is an integer/string function of
  `i`, so a SQL oracle (DuckDB `range(n)`) reproduces the source
  bit-for-bit.

The row function (Knuth multiplicative hash, small-modulus buckets) is
arbitrary but frozen: gates and oracles embed the same arithmetic.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

SYNTH_SCHEMA = "i bigint, bucket int, amount bigint, tag string"

# Knuth's multiplicative constant; i stays <= ~1e6 so i * KNUTH is far
# below 2^63 — the same expression is exact BIGINT arithmetic in DuckDB.
_KNUTH = 2654435761


def synth_row(i: int) -> tuple:
    return (i, i % 16, (i * _KNUTH) % 100000, f"tag_{i % 7}")


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start  # inclusive
        self.end = end  # exclusive


class SyntheticLedgerReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 4))
        # range narrowed by pushed-down predicates on i
        self.lo = 0
        self.hi = self.n

    def pushFilters(self, filters):
        # accept only range/equality predicates on the id column `i`;
        # everything else is returned for Spark to evaluate post-scan
        for f in filters:
            col = getattr(f, "attribute", None)
            if col != ("i",):
                yield f
                continue
            if isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, GreaterThan):
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, LessThan):
                self.hi = min(self.hi, int(f.value))
            elif isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, int(f.value) + 1)
            elif isinstance(f, EqualTo):
                self.lo = max(self.lo, int(f.value))
                self.hi = min(self.hi, int(f.value) + 1)
            else:
                yield f

    def partitions(self):
        # contiguous id ranges AFTER pushdown narrowing: pruned-away
        # partitions simply never exist
        lo, hi = self.lo, max(self.lo, self.hi)
        parts = max(1, self.parts)
        span = max(1, -(-(hi - lo) // parts))  # ceil
        out = []
        s = lo
        while s < hi:
            out.append(_RangePartition(s, min(s + span, hi)))
            s += span
        return out or [_RangePartition(0, 0)]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield synth_row(i)


class SyntheticLedgerStreamReader(DataSourceStreamReader):
    """Micro-batch twin of the batch reader: offsets are positions in
    the id space, each trigger advances by ``batch`` ids, and
    ``partitions(start, end)`` splits every micro-batch into ``parts``
    ranges read ON EXECUTORS — the partition-planned
    DataSourceStreamReader, not the driver-side Simple variant, because
    a real ingest source must scale horizontally per trigger. Offsets
    are replayable (any [start, end) regenerates identical rows), which
    is exactly the exactly-once-source contract Structured Streaming
    asks of a connector."""

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.batch = int(options.get("batch", 250))
        self.parts = int(options.get("parts", 4))
        self._pos = 0

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        self._pos = min(self._pos + self.batch, self.n)
        return {"pos": self._pos}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["pos"]), int(end["pos"])
        span = max(1, -(-(hi - lo) // max(1, self.parts)))
        out = []
        s = lo
        while s < hi:
            out.append(_RangePartition(s, min(s + span, hi)))
            s += span
        return out or [_RangePartition(0, 0)]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield synth_row(i)

    def commit(self, end: dict) -> None:
        pass


@dataclass
class _FileCommit(WriterCommitMessage):
    path: str
    n_rows: int


MANIFEST = "_manifest.json"


def _write_jsonl_task(directory: str, iterator):
    """Executor-side half of both sinks: stream rows into a uniquely
    named file (partitionId + taskAttemptId — speculative/retried
    attempts never collide) and return it as a commit message."""
    import json
    import os

    from pyspark import TaskContext

    ctx = TaskContext.get()
    name = f"part-{ctx.partitionId():05d}-{ctx.taskAttemptId()}.jsonl"
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, name)
    n = 0
    with open(path, "w") as f:
        for row in iterator:
            f.write(json.dumps(row.asDict()) + "\n")
            n += 1
    return _FileCommit(path=path, n_rows=n)


class LedgerJsonlWriter(DataSourceWriter):
    """Manifest-committed JSONL sink — the exactly-once WRITE contract a
    custom connector owes Structured query jobs: each task writes its
    rows to a uniquely-named data file (partitionId + taskAttemptId, so
    speculative/retried attempts never collide) and returns it as a
    commit message; ``commit`` runs ONCE on the driver after all tasks
    succeed and atomically publishes the manifest listing exactly the
    committed files; ``abort`` removes everything the failed job wrote.
    Readers resolve the manifest, never the directory listing — orphan
    files from dead attempts are invisible (pinned in tests)."""

    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("linq_synth write requires .option('path', dir)")

    def write(self, iterator):
        return _write_jsonl_task(self.dir, iterator)

    def commit(self, messages):
        import json
        import os

        files = [
            {"path": m.path, "n_rows": m.n_rows}
            for m in messages
            if m is not None
        ]
        tmp = os.path.join(self.dir, MANIFEST + ".tmp")
        # a zero-task job (empty input) reaches commit without any write()
        # having created the directory — publish an empty manifest, don't
        # FileNotFoundError (the streaming twin below already does this)
        os.makedirs(self.dir, exist_ok=True)
        with open(tmp, "w") as f:
            json.dump({"files": files}, f)
        os.replace(tmp, os.path.join(self.dir, MANIFEST))  # atomic publish

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


def read_jsonl_manifest(spark, path: str, schema: str):
    """Read a LedgerJsonlWriter output: exactly the manifest-listed
    files, with a mandatory schema (JSONL carries no types)."""
    import json
    import os

    with open(os.path.join(path, MANIFEST)) as f:
        files = [e["path"] for e in json.load(f)["files"]]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)


class LedgerJsonlStreamWriter(DataSourceStreamWriter):
    """Streaming twin of the batch sink: one manifest PER MICRO-BATCH
    (``_manifest-<batchId>.json``), published atomically by the driver
    in ``commit(messages, batchId)``. Exactly-once follows from the
    batch-keyed idempotent manifests: a batch replayed after a failure
    (the source's offsets are replayable) rewrites ITS OWN manifest
    with the new attempt's files, so readers — which resolve manifests,
    never the directory listing — see each batch's rows exactly once;
    dead-attempt orphans and half-written batches are invisible.
    ``abort`` additionally removes the failed attempt's files eagerly.
    This completes the connector matrix: batch read (pushdown), stream
    read (partition-planned offsets), batch write (job manifest),
    stream write (per-batch manifests)."""

    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError(
                "linq_synth stream write requires .option('path', dir)"
            )

    def write(self, iterator):
        return _write_jsonl_task(self.dir, iterator)

    def commit(self, messages, batchId: int) -> None:
        import json
        import os

        files = [
            {"path": m.path, "n_rows": m.n_rows}
            for m in messages
            if m is not None
        ]
        name = batch_manifest_name(batchId)
        tmp = os.path.join(self.dir, name + ".tmp")
        os.makedirs(self.dir, exist_ok=True)
        with open(tmp, "w") as f:
            json.dump({"batch_id": batchId, "files": files}, f)
        os.replace(tmp, os.path.join(self.dir, name))  # atomic, idempotent

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


def batch_manifest_name(batch_id: int) -> str:
    return f"_manifest-{batch_id:010d}.json"


def read_jsonl_stream_manifests(spark, path: str, schema: str):
    """Read a LedgerJsonlStreamWriter output: the union of every
    committed batch's manifest-listed files, in batch order. Files not
    named by any manifest (failed attempts, concurrent writers) are
    invisible by construction."""
    import glob
    import json
    import os

    files = []
    for mp in sorted(glob.glob(os.path.join(path, "_manifest-*.json"))):
        with open(mp) as f:
            files.extend(e["path"] for e in json.load(f)["files"])
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)


class SyntheticLedgerDataSource(DataSource):
    """spark.read.format("linq_synth").option("n", N).option("parts", P)
    — or spark.readStream with an extra option("batch", B) for rows per
    micro-batch."""

    @classmethod
    def name(cls) -> str:
        return "linq_synth"

    def schema(self) -> str:
        return SYNTH_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticLedgerReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return SyntheticLedgerStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return LedgerJsonlWriter(self.options)

    def streamWriter(
        self, schema: StructType, overwrite: bool
    ) -> DataSourceStreamWriter:
        return LedgerJsonlStreamWriter(self.options)


def register(spark) -> None:
    """Idempotent registration of the custom source on a session.

    Deliberately does NOT touch spark.sql.python.filterPushdown.enabled:
    a library registration must not mutate session-wide planner state.
    CALLERS OWN THE CONF for batch reads — a reader that implements
    pushFilters() refuses to even initialize while the conf is off
    (DATA_SOURCE_PUSHDOWN_DISABLED, raised at first execution, not at
    explain), so every batch-read site binds it with conf_guard: around
    eager work (pyds_write_roundtrip) or by forcing the plan under the
    guard (pyds_ledger_rollup). Stream reads are unaffected (the stream
    reader has no pushFilters)."""
    spark.dataSource.register(SyntheticLedgerDataSource)
