"""Hadoop FileSystem helpers for storage probes and swaps.

Self-managed parquet stores (the streaming folds in `streaming/jobs.py`,
the maintenance compactors) need existence probes, directory listings and
renames against the SAME filesystem Spark reads — which is NOT the
driver's local filesystem once paths are `hdfs://`, `s3a://` or
`abfss://`. Driver-local `os.path` calls silently return False there (the
failure class `sources/watermark.py` documents for its read path), so
every probe here goes through `org.apache.hadoop.fs.FileSystem` resolved
from the path's own scheme + the session's Hadoop configuration. Local
paths resolve to `RawLocalFileSystem` and behave exactly as before.

Atomicity note: `rename` maps to `FileSystem.rename`, which is atomic on
POSIX-like stores (local, HDFS, ABFS). On S3A it is a COPY+DELETE — any
swap protocol built on these helpers is only crash-atomic on an
atomic-rename store; object-store deployments should use a transactional
table format (Delta/Iceberg) instead, as `sinks.merge_upsert` already
does when available.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path``, resolved by the path's scheme."""
    jvm = spark._jvm  # noqa: SLF001 — py4j gateway is the only route to Hadoop FS
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    return fs, hpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs(spark, path)
    return bool(fs.exists(p))


def is_dir(spark: SparkSession, path: str) -> bool:
    fs, p = _fs(spark, path)
    return bool(fs.exists(p) and fs.getFileStatus(p).isDirectory())


def child_names(spark: SparkSession, path: str) -> list[str]:
    """Immediate child names of a directory ([] when absent)."""
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def _in_temporary(base, f) -> bool:
    """True iff file ``f`` sits under a ``_temporary`` PATH COMPONENT
    inside ``base``. A substring test over the whole URI would also hit
    stores whose own path merely CONTAINS the text (e.g.
    `/data/etl_temporary/sig_store`) and misclassify every committed
    file as in-flight — so walk the parent components instead."""
    p = f.getParent()
    stop = base.toString()
    while p is not None and p.toString() != stop:
        if p.getName() == "_temporary":
            return True
        p = p.getParent()
    return False


def has_committed_parquet(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` contains at least one COMMITTED parquet file
    (ignoring in-flight ``_temporary`` output) — the existence test every
    crash-retried reader of a self-managed parquet store needs, since a
    bare directory appears as soon as a write STARTS."""
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return False
    it = fs.listFiles(p, True)  # recursive RemoteIterator
    while it.hasNext():
        f = it.next().getPath()
        if _in_temporary(p, f):
            continue
        if f.getName().endswith(".parquet"):
            return True
    return False


def parquet_file_sizes(spark: SparkSession, path: str) -> list[int]:
    """Byte sizes of every committed parquet file under ``path``
    (recursive, `_temporary` excluded); [] when the path is absent.
    Metadata-only listing — never reads data."""
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return []
    sizes: list[int] = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        f = st.getPath()
        if _in_temporary(p, f) or not f.getName().endswith(".parquet"):
            continue
        sizes.append(int(st.getLen()))
    return sizes


def rename(spark: SparkSession, src: str, dst: str) -> None:
    """Directory move (atomic on local/HDFS/ABFS — see module docstring).
    Raises OSError on any failure — Hadoop signals them inconsistently
    (silent False on some stores, FileNotFoundException on others)."""
    fs, s = _fs(spark, src)
    _, d = _fs(spark, dst)
    try:
        ok = fs.rename(s, d)
    except Exception as exc:
        raise OSError(f"rename failed: {src} -> {dst}: {exc}") from exc
    if not ok:
        raise OSError(f"rename failed: {src} -> {dst}")


def delete(spark: SparkSession, path: str) -> None:
    """Recursive delete; no-op when absent."""
    fs, p = _fs(spark, path)
    if fs.exists(p):
        fs.delete(p, True)


def touch(spark: SparkSession, path: str) -> None:
    """Create an empty file (overwriting), e.g. an ``_applied_N`` marker."""
    fs, p = _fs(spark, path)
    fs.create(p, True).close()


def recover_interrupted_swap(spark: SparkSession, target: str) -> None:
    """Repair the aftermath of a crashed :func:`swap_with_backup` before
    touching ``target`` again, and garbage-collect stale temp siblings.

    - A kill between the swap's two renames leaves ``target`` missing and
      ``<target>.old`` holding the only copy — restore it FIRST, or a
      fresh-target branch would silently rebuild the store from one batch
      and a later successful swap would delete the backup (data loss).
    - A kill during a temp write leaves a full-size ``<target>.tmp*``
      sibling that no later run overwrites (uuid-suffixed names) — each
      crash-retry cycle would otherwise add another complete copy next to
      a 100 TB fact. Single-writer-per-target is already the module's
      protocol (two concurrent merges into one fact race the swap
      itself), so deleting this target's temp siblings here is safe."""
    target = target.rstrip("/")
    backup = target + ".old"
    if not exists(spark, target) and exists(spark, backup):
        rename(spark, backup, target)
    # Temp-sibling GC via parent listing + literal prefix match, NOT
    # globStatus: a target path containing glob metacharacters ([]{}*?)
    # would make a glob match unintended siblings (or nothing at all).
    # listStatus + startswith treats the name as the literal it is.
    fs, tpath = _fs(spark, target)
    parent = tpath.getParent()
    if parent is None or not fs.exists(parent):
        return
    prefix = tpath.getName() + ".tmp"
    for st in fs.listStatus(parent):
        if st.getPath().getName().startswith(prefix):
            fs.delete(st.getPath(), True)


def swap_with_backup(spark: SparkSession, tmp: str, target: str) -> None:
    """Install the fully-written ``tmp`` directory at ``target`` with a
    recovery copy at every step: the old target is renamed aside
    (atomic), the new data moved into place (atomic), and only then is
    the backup removed — a crash at any point leaves either the old or
    the new store intact on disk (as ``<target>.old`` if the final rename
    didn't run; :func:`recover_interrupted_swap` restores it). A missing
    target (first install) skips the backup step. Crash-atomicity rests
    on atomic rename — local/HDFS/ABFS, NOT S3A (module docstring)."""
    target = target.rstrip("/")
    backup = target + ".old"
    delete(spark, backup)
    if exists(spark, target):
        rename(spark, target, backup)
    rename(spark, tmp, target)
    delete(spark, backup)
