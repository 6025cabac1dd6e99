"""Custom Python Data Source (Spark 4 DataSource API): a pure-Python,
partition-planned parquet reader with filter pushdown.

This is the engine surface the reference's pandas-based loaders map onto
when rebuilt Spark-native-but-Python (reference: etl_agent/ops.py:20-33
loads whole files into a single pandas frame on one machine; here the
SAME pure-Python reading code becomes a first-class distributed source):

- ``partitions()`` plans one InputPartition per parquet ROW GROUP, so a
  100 TB directory of files fans out across executors with no JVM-side
  reader involved;
- ``pushFilters()`` accepts EqualTo filters on the declared columns and
  applies them INSIDE the reader via pyarrow compute — rows are dropped
  before they ever reach Spark (the Python-source equivalent of
  PushedFilters);
- ``read()`` yields Arrow record batches (zero-copy into Spark's Arrow
  pipeline), never Python row objects.

Registered as format name ``pydocs``.  The battery entry u06 reads the
driver's ``documents.parquet`` through it and proves the whole loop
against a plain-SQL oracle over the same file.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

#: Columns the source declares (text is deliberately excluded: a custom
#: source should project narrow, and the entry needs only metadata).
_SCHEMA = "doc_id bigint, lang string, source string, n_chars bigint"
_COLUMNS = ["doc_id", "lang", "source", "n_chars"]


def _parquet_pieces(path: str) -> list[str]:
    """A parquet dataset is a FILE or a DIRECTORY of part files (the
    directory form is what every engine writes at scale) — return the
    ordered physical files either way.  Directories are walked
    RECURSIVELY (partitioned layouts nest key=value subdirs), engine
    sidecars (_SUCCESS, _metadata, .crc, hidden files) are ignored, and
    any OTHER entry raises — a dataset that silently scans as missing
    data is the one failure mode a source must never have."""
    import os

    if not os.path.isdir(path):
        return [path]
    pieces: list[str] = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                pieces.append(os.path.join(root, f))
            elif f.startswith(("_", ".")) or f.endswith(".crc"):
                continue  # engine sidecars / checksums / manifests
            else:
                raise ValueError(
                    f"unexpected non-parquet entry {os.path.join(root, f)!r} "
                    f"in dataset {path!r}; refusing to scan a dataset whose "
                    f"contents I do not understand"
                )
    return sorted(pieces)


def _piece_row_groups(path: str) -> list[tuple[str, int]]:
    """Flattened (file, row_group) work units across the dataset."""
    import pyarrow.parquet as pq

    units: list[tuple[str, int]] = []
    for piece in _parquet_pieces(path):
        n = pq.ParquetFile(piece).metadata.num_row_groups
        units.extend((piece, rg) for rg in range(n))
    return units


class DocsPyDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pydocs"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> "DocsPyReader":
        return DocsPyReader(self.options)


class DocsPyReader(DataSourceReader):
    def __init__(self, options):
        self._path = options["path"]
        self._pushed: list[tuple[str, object]] = []

    def pushFilters(self, filters):
        """Accept EqualTo on declared columns; everything else is returned
        to Spark to evaluate post-scan."""
        for f in filters:
            if isinstance(f, EqualTo) and len(f.attribute) == 1 and (
                f.attribute[0] in _COLUMNS
            ):
                self._pushed.append((f.attribute[0], f.value))
            else:
                yield f

    def partitions(self):
        units = _piece_row_groups(self._path)
        if not units:
            # zero-row-group dataset: one fabricated partition that reads
            # as EMPTY so the scan still plans
            return [InputPartition(None)]
        return [InputPartition(u) for u in units]

    def read(self, partition):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        if partition.value is None:
            return
        piece, rg = partition.value
        tbl = pq.ParquetFile(piece).read_row_group(rg, columns=_COLUMNS)
        for col, val in self._pushed:
            tbl = tbl.filter(pc.equal(tbl[col], val))
        yield from tbl.to_batches()


def register(spark) -> None:
    """Idempotent per session: re-registering overwrites the format."""
    spark.dataSource.register(DocsPyDataSource)


# -- streaming sibling: the same file read as a micro-batch STREAM ------

class DocsStreamDataSource(DataSource):
    """Custom Python STREAMING source (Spark 4 SimpleDataSourceStreamReader):
    offsets are parquet row-group indices, so each micro-batch replays one
    row group — a deterministic, checkpointable cursor over the file.  The
    shape a Python connector to an external system (queue, ledger, API
    cursor) takes when rebuilt Spark-native: offsets are plain dicts,
    replay between offsets is exact, commit is the ack hook."""

    @classmethod
    def name(cls) -> str:
        return "pydocs_stream"

    def schema(self) -> str:
        return _SCHEMA

    def simpleStreamReader(self, schema) -> "DocsSimpleStreamReader":
        return DocsSimpleStreamReader(self.options)


class DocsSimpleStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self._path = options["path"]
        self._units: list[tuple[str, int]] | None = None

    def initialOffset(self) -> dict:
        return {"rg": 0}

    def _all_units(self) -> list[tuple[str, int]]:
        # (file, row_group) units across the dataset — file or directory;
        # computed once per reader (the dataset is immutable input)
        if self._units is None:
            self._units = _piece_row_groups(self._path)
        return self._units

    def _rows(self, rg: int):
        import pyarrow.parquet as pq

        units = self._all_units()
        if rg >= len(units):
            return None
        piece, piece_rg = units[rg]
        tbl = pq.ParquetFile(piece).read_row_group(piece_rg, columns=_COLUMNS)
        return list(
            zip(*(tbl[c].to_pylist() for c in _COLUMNS))
        )

    def read(self, start: dict):
        rows = self._rows(start["rg"])
        if rows is None:  # caught up: same offset back, no rows
            return iter([]), {"rg": start["rg"]}
        return iter(rows), {"rg": start["rg"] + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        out = []
        for rg in range(start["rg"], end["rg"]):
            rows = self._rows(rg)
            if rows:
                out.extend(rows)
        return iter(out)

    def commit(self, end: dict) -> None:
        pass  # nothing external to ack


def register_stream(spark) -> None:
    spark.dataSource.register(DocsStreamDataSource)


# -- write path: a custom Python sink with a real commit protocol -------

class LedgerWriteDataSource(DataSource):
    """Custom Python SINK (Spark 4 DataSourceWriter): each task stages its
    partition as an uncommitted NDJSON part file and returns a commit
    message naming it; the driver-side ``commit()`` promotes exactly the
    acknowledged parts into a MANIFEST — readers trust only manifest-listed
    files, so a failed/speculative task's orphan stage file is invisible.
    That is the two-phase exactly-once contract every distributed sink
    needs (the reference's CSV writer has no such protocol — its
    single-file write is the degenerate case)."""

    @classmethod
    def name(cls) -> str:
        return "pyledger"

    def writer(self, schema, overwrite: bool) -> "LedgerWriter":
        return LedgerWriter(
            self.options, [f.name for f in schema.fields], overwrite
        )


@dataclass
class LedgerCommit(WriterCommitMessage):
    filename: str
    n_rows: int


class LedgerWriter(DataSourceWriter):
    def __init__(self, options, columns, overwrite: bool = True):
        self._dir = options["path"]
        self._columns = columns
        self._overwrite = overwrite

    def write(self, iterator) -> "LedgerCommit":
        import json
        import os
        import uuid

        from pyspark import TaskContext

        os.makedirs(self._dir, exist_ok=True)
        part = TaskContext.get().partitionId()
        name = f"stage-{part}-{uuid.uuid4().hex}.ndjson"
        n = 0
        with open(os.path.join(self._dir, name), "w") as f:
            for row in iterator:
                f.write(json.dumps(dict(zip(self._columns, row))) + "\n")
                n += 1
        return LedgerCommit(filename=name, n_rows=n)

    def commit(self, messages) -> None:
        """Promote acknowledged parts into the manifest ATOMICALLY (temp
        name + os.replace — a crash mid-commit leaves old or new, never
        truncated).  mode('append') MERGES with an existing manifest
        instead of overwriting it — otherwise previously committed parts
        would be silently orphaned despite the exactly-once claim.  The
        append read-modify-write is serialized by the shared O_EXCL
        manifest lock (_manifest_lock): two concurrent append jobs would
        each read the old manifest and one commit's parts would be
        silently orphaned."""
        import json
        import os

        files = sorted(m.filename for m in messages if m is not None)
        rows = sum(m.n_rows for m in messages if m is not None)
        manifest_path = os.path.join(self._dir, "_MANIFEST.json")
        with _manifest_lock(manifest_path):
            if not self._overwrite and os.path.exists(manifest_path):
                with open(manifest_path) as f:
                    prior = json.load(f)
                files = sorted(set(prior["files"]) | set(files))
                rows += prior["rows"]
            _write_manifest_atomic(manifest_path, {"files": files, "rows": rows})

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self._dir, m.filename))
                except OSError:
                    pass


def read_ledger(spark, path: str):
    """Read back ONLY manifest-committed part files."""
    import json
    import os

    with open(os.path.join(path, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    files = [os.path.join(path, name) for name in manifest["files"]]
    return spark.read.json(files)


def register_writer(spark) -> None:
    spark.dataSource.register(LedgerWriteDataSource)


_LOCK_WAIT_SEC = 30.0


import contextlib


@contextlib.contextmanager
def _manifest_lock(manifest_path: str):
    """Kernel-owned flock() serializing manifest read-modify-writes.

    Earlier revisions used an O_EXCL lock FILE with mtime-based
    stale-break; every repair still left a window (review round 8: a
    breaker's os.replace could steal a lock a fresh holder had JUST
    recreated, admitting two committers).  fcntl.flock closes the whole
    class: the kernel releases the lock when the holder's fd closes —
    including on crash — so there is no stale state to break and no
    check-then-act anywhere.  The lock file itself is permanent,
    content-free bookkeeping (never unlinked: unlinking would let a new
    opener lock a different inode than a current holder).  Waiting past
    _LOCK_WAIT_SEC raises rather than guessing.  Scope note: flock is
    advisory and per-machine, which matches this sink (the commit runs
    driver-side); a multi-driver deployment would commit manifests via
    a conditional put on the object store instead."""
    import fcntl
    import os
    import time

    lock_path = manifest_path + ".lock"
    fd = os.open(lock_path, os.O_CREAT | os.O_RDWR)
    deadline = time.monotonic() + _LOCK_WAIT_SEC
    try:
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except OSError:
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"ledger manifest lock {lock_path!r} held for "
                        f">{_LOCK_WAIT_SEC}s by a concurrent commit"
                    ) from None
                time.sleep(0.05)
        yield
    finally:
        os.close(fd)  # releases the flock


def _write_manifest_atomic(manifest_path: str, manifest: dict) -> None:
    """Temp name + fsync + os.replace: a crash mid-commit leaves the old
    manifest or the new one, never a truncated file."""
    import json
    import os
    import uuid

    tmp = manifest_path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, manifest_path)


# -- streaming write path: the same ledger contract per micro-batch -----

class LedgerStreamWriteDataSource(DataSource):
    """Custom Python STREAMING sink (Spark 4 DataSourceStreamWriter) —
    the fourth quadrant of the custom-DataSource matrix (u06 batch read,
    v07 stream read, u07 batch write): per micro-batch, each task stages
    its partition as an NDJSON part named with the batch id, and the
    driver-side ``commit(messages, batchId)`` promotes the acknowledged
    parts into the manifest — IDEMPOTENTLY: a replayed batch (restart
    between sink commit and checkpoint write, the classic streaming
    failure window) finds its batchId already recorded and changes
    nothing, which is exactly how a sink turns at-least-once batch
    replay into exactly-once output."""

    @classmethod
    def name(cls) -> str:
        return "pyledger_stream"

    def streamWriter(self, schema, overwrite: bool) -> "LedgerStreamWriter":
        return LedgerStreamWriter(
            self.options, [f.name for f in schema.fields]
        )


class LedgerStreamWriter(DataSourceStreamWriter):
    def __init__(self, options, columns):
        self._dir = options["path"]
        self._columns = columns

    def write(self, iterator) -> "LedgerCommit":
        import json
        import os
        import uuid

        from pyspark import TaskContext

        os.makedirs(self._dir, exist_ok=True)
        part = TaskContext.get().partitionId()
        name = f"stream-{part}-{uuid.uuid4().hex}.ndjson"
        n = 0
        with open(os.path.join(self._dir, name), "w") as f:
            for row in iterator:
                f.write(json.dumps(dict(zip(self._columns, row))) + "\n")
                n += 1
        return LedgerCommit(filename=name, n_rows=n)

    def commit(self, messages, batchId: int) -> None:
        import json
        import os

        files = sorted(m.filename for m in messages if m is not None)
        rows = sum(m.n_rows for m in messages if m is not None)
        manifest_path = os.path.join(self._dir, "_MANIFEST.json")
        with _manifest_lock(manifest_path):
            manifest = {"files": [], "rows": 0, "batches": []}
            if os.path.exists(manifest_path):
                with open(manifest_path) as f:
                    manifest = json.load(f)
                manifest.setdefault("batches", [])
            if batchId in manifest["batches"]:
                # replayed batch: its parts are already manifest-listed;
                # the restaged duplicates stay orphaned and invisible
                return
            manifest["files"] = sorted(set(manifest["files"]) | set(files))
            manifest["rows"] += rows
            manifest["batches"] = sorted(set(manifest["batches"]) | {batchId})
            _write_manifest_atomic(manifest_path, manifest)

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self._dir, m.filename))
                except OSError:
                    pass


def register_stream_writer(spark) -> None:
    spark.dataSource.register(LedgerStreamWriteDataSource)
