"""pyarrow.fs resolution for the zero-shuffle scan paths.

The rowgroup encode mode plans from parquet footers and reads row groups with
pyarrow inside ``mapInArrow`` — both need a *Python-side* filesystem, unlike
the chunk/manifest datasets (Spark's JVM writers) and the tiny sidecar files
(fsio.py → Hadoop FS).  This module maps any input location onto a
``pyarrow.fs.FileSystem`` so the fast path engages on object stores, not just
local disk — the reference's headline remote flow is S3A
(`/root/reference/src/orc/read.clj:27-49`, `README.md:87-107`):

* bare local paths → ``LocalFileSystem`` (unchanged fast path);
* scheme-qualified URIs (``s3://``, ``gs://``, ``hdfs://``, ``file://``) →
  ``FileSystem.from_uri`` with Hadoop scheme aliases mapped (``s3a``/``s3n``
  → ``s3``);
* an explicit ``filesystem=`` object (e.g. ``SubTreeFileSystem`` in tests,
  or a custom-configured ``S3FileSystem``) wins over URI inference.

pyarrow filesystems pickle, so the SAME object the planner used travels to
executor tasks in the ``mapInArrow`` closure — listing, footer reads, and
row-group reads all go through one filesystem, and a resume with the same
``input_path``/``filesystem`` reproduces the plan exactly.

Schemes pyarrow cannot serve raise here; the encode entry point catches
that, records the degradation in the run report/run_meta, and falls back to
the JVM scan + salted repartition (never silently — a 100 TB operator must
see that every token byte is about to cross a shuffle).
"""

from __future__ import annotations

import pyarrow.fs as _fs


def clamp_arrow_threads() -> None:
    """Bound pyarrow's per-process thread pools inside executor tasks.

    Spark already supplies inter-task parallelism — every local[N] slot (or
    real executor core) runs its own Python worker — but EACH worker's
    pyarrow pools default to ``os.cpu_count()`` threads.  Two failure modes
    on a 32-thread box: at local[32] that is ~32x32 CPU threads contending
    for 32 hardware threads (oversubscription tax on every parquet
    decompress and ``pc.*`` call), and at local[8] the 8 workers' 32-thread
    pools silently use the WHOLE machine, so an N-vs-4N scaling comparison
    is polluted — the N-level job secretly runs on all cores (the
    north-rule measurement artifact this fixes).  One CPU thread per worker
    keeps the parallelism where the scheduler can see and account for it;
    two IO threads keep object-store reads overlapped.  Opt out (or widen)
    with ``SPARK_GRAFT_ARROW_CPU`` (``0`` = leave pyarrow defaults) — e.g.
    a real cluster running one fat executor with many cores per Python
    worker wants the default pools back."""
    import os

    import pyarrow as pa

    want = os.environ.get("SPARK_GRAFT_ARROW_CPU", "1")
    try:
        n = int(want)
    except ValueError:
        return
    if n <= 0:
        return
    if pa.cpu_count() != n:
        pa.set_cpu_count(n)
    io_n = max(2, n)
    if pa.io_thread_count() != io_n:
        pa.set_io_thread_count(io_n)

#: Hadoop filesystem scheme names → the pyarrow implementations that serve them
SCHEME_ALIASES = {"s3a": "s3", "s3n": "s3", "gs": "gcs"}


def normalize_uri(path: str) -> str:
    if "://" not in path:
        return path
    scheme, rest = path.split("://", 1)
    return f"{SCHEME_ALIASES.get(scheme.lower(), scheme)}://{rest}"


def resolve(path: str, filesystem=None) -> tuple[_fs.FileSystem, str]:
    """(filesystem, fs-native path) for a possibly scheme-qualified path.

    Raises (ArrowInvalid/OSError) for schemes pyarrow cannot serve — the
    caller decides whether to fall back to the JVM scan."""
    if filesystem is not None:
        return filesystem, path
    if "://" in path:
        return _fs.FileSystem.from_uri(normalize_uri(path))
    return _fs.LocalFileSystem(), path


def list_files(fs: _fs.FileSystem, path: str, ext: str) -> list[str]:
    """All ``ext`` files at/under ``path`` (one recursive LIST on object
    stores, not a per-directory walk), sorted for plan determinism."""
    info = fs.get_file_info(path)
    if info.type == _fs.FileType.File:
        return [path] if path.endswith(ext) else []
    if info.type != _fs.FileType.Directory:
        return []
    sel = _fs.FileSelector(path, recursive=True)
    return sorted(
        i.path
        for i in fs.get_file_info(sel)
        if i.type == _fs.FileType.File and i.path.endswith(ext)
    )


def list_parquet(fs: _fs.FileSystem, path: str) -> list[str]:
    return list_files(fs, path, ".parquet")


def list_orc(fs: _fs.FileSystem, path: str) -> list[str]:
    return list_files(fs, path, ".orc")


def total_bytes(fs: _fs.FileSystem, path: str) -> int:
    info = fs.get_file_info(path)
    if info.type == _fs.FileType.File:
        return int(info.size or 0)
    if info.type != _fs.FileType.Directory:
        return 0
    sel = _fs.FileSelector(path, recursive=True)
    return sum(
        int(i.size or 0)
        for i in fs.get_file_info(sel)
        if i.type == _fs.FileType.File
    )


def open_parquet(path: str, fs: _fs.FileSystem | None = None):
    """ParquetFile handle through the resolved filesystem — executor-side
    helper (``fs=None`` re-resolves from the path, e.g. for manifest-recorded
    URIs whose tasks outlive the planner's filesystem object)."""
    import pyarrow.parquet as pq

    if fs is None:
        fs, path = resolve(path)
    return pq.ParquetFile(fs.open_input_file(path))


class OrcInput:
    """ORC read handle with the ParquetFile surface the rowgroup encoder
    uses (``read_row_group``/``read``/``close``) — a stripe is ORC's row
    group (the reference's own read unit: its batch loop walks stripes via
    ``rows()``, `/root/reference/src/orc/read.clj:27-49`).
    ``pyarrow.orc.ORCFile.read_stripe`` returns a RecordBatch; wrap to a
    Table so downstream slicing/encoding is format-agnostic."""

    def __init__(self, handle):
        import pyarrow.orc as _orc

        self._fh = handle
        self._of = _orc.ORCFile(handle)
        self.nstripes = self._of.nstripes
        self.nrows = self._of.nrows
        self.schema = self._of.schema

    def read_row_group(self, i: int, columns=None):
        import pyarrow as pa

        return pa.Table.from_batches(
            [self._of.read_stripe(i, columns=columns)]
        )

    def read(self, columns=None):
        return self._of.read(columns=columns)

    def close(self):
        self._fh.close()


def open_orc(path: str, fs: _fs.FileSystem | None = None) -> OrcInput:
    if fs is None:
        fs, path = resolve(path)
    return OrcInput(fs.open_input_file(path))


def open_input(path: str, fs: _fs.FileSystem | None = None):
    """Format-dispatched read handle: units carry their own paths, so the
    encoder opens each by extension — a plan may in principle mix formats
    (Iceberg tables can)."""
    if path.endswith(".orc"):
        return open_orc(path, fs)
    return open_parquet(path, fs)
