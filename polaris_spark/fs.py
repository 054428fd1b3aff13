"""Filesystem abstraction for index metadata + layout operations.

The build's control-plane I/O (manifest marks, stats JSON, chunk wipes,
compaction swaps) must work wherever the index lives. The reference never
faces this (its Lucene index is a local FSDirectory,
indexing/IndexPathUtils.java:8-18, and the driver owns it single-threaded);
our index is a distributed table whose home may be HDFS/S3/GCS at cluster
scale. Two implementations of one small interface:

- :class:`LocalFS` — plain ``os``/``shutil`` for scheme-less paths (the
  sandbox + developer path; no JVM round-trips).
- :class:`HadoopFS` — ``org.apache.hadoop.fs.FileSystem`` via the live
  SparkSession's JVM gateway for ANY scheme'd URI (``hdfs://``, ``s3a://``,
  ``file://``, ...). The same Hadoop connectors Spark itself uses for the
  parquet data, so wherever the data can go, the manifests can go.
  Exercised in tests through ``file://`` URIs (Hadoop LocalFileSystem) —
  same code path as a real cluster store, no cluster needed.

``get_fs(spark, path)`` picks by URI scheme. All data-plane I/O (parquet
read/write) already goes through Spark and needs nothing from here.

Atomicity notes: ``write_text_atomic`` stages to a sibling temp file and
renames over the target — POSIX-atomic locally, and a single-op
``FileContext.rename(OVERWRITE)`` swap on HDFS-like stores that bind a
FileContext. On stores without one (and object stores where rename is
copy+delete) the swap degrades to delete+rename: a brief window exists where
the target is absent — safe for the single-writer control plane and the
existence-only resume checks, but a reader constructed mid-swap can observe
a missing ``_stats.json``; retry on construction if that matters.
Completion markers are whole files, so a torn run leaves either no marker or
a complete one — the resume logic only ever tests existence.
"""

from __future__ import annotations

import os
import shutil
import uuid
from urllib.parse import urlparse


class LocalFS:
    """os/shutil implementation for scheme-less local paths."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def delete(self, path: str) -> None:
        """Remove file or directory tree; absent path is a no-op."""
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            os.remove(path)

    def rename(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def read_text(self, path: str) -> str:
        with open(path, encoding="utf-8") as f:
            return f.read()

    def write_text_atomic(self, path: str, text: str) -> None:
        tmp = os.path.join(
            os.path.dirname(path), f".{os.path.basename(path)}.{uuid.uuid4().hex[:8]}.tmp"
        )
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(text)
        os.replace(tmp, path)

    def dir_bytes(self, path: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(path):
            for fn in files:
                total += os.path.getsize(os.path.join(root, fn))
        return total

    def listdir(self, path: str) -> list[str]:
        """Child entry NAMES of a directory; absent path → empty list."""
        if not os.path.isdir(path):
            return []
        return sorted(os.listdir(path))

    def copy_tree(self, src: str, dst: str) -> None:
        """Recursive copy (file or directory) within this filesystem —
        the snapshot primitive. Absent source → no-op."""
        import shutil

        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        elif os.path.exists(src):
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copy2(src, dst)


class HadoopFS:
    """org.apache.hadoop.fs.FileSystem via the SparkSession JVM gateway.

    One instance is bound to the filesystem owning ``base_uri`` (per-scheme/
    authority); paths passed to methods must live on the same filesystem —
    exactly how the index uses it (everything under one index root).
    """

    def __init__(self, spark, base_uri: str):
        self._jvm = spark._jvm
        self._gateway = spark.sparkContext._gateway
        self._conf = spark._jsc.hadoopConfiguration()
        base = self._jvm.org.apache.hadoop.fs.Path(base_uri)
        self._fs = base.getFileSystem(self._conf)
        # FileContext gives rename(OVERWRITE) — a single atomic swap on HDFS
        # (FileSystem.rename has no public overwrite form, so the fallback
        # is delete+rename with a reader-visible gap). Resolved lazily per
        # store: some Hadoop connectors ship no AbstractFileSystem binding.
        try:
            self._fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                self._fs.getUri(), self._conf
            )
            self._rename_opts = self._gateway.new_array(
                self._jvm.org.apache.hadoop.fs.Options.Rename, 1
            )
            self._rename_opts[0] = self._jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        except Exception:
            self._fc = None

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def makedirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def delete(self, path: str) -> None:
        p = self._p(path)
        if self._fs.exists(p):
            self._fs.delete(p, True)

    def rename(self, src: str, dst: str) -> None:
        """Overwriting rename. Via FileContext.rename(OVERWRITE) where the
        store binds one (single-op swap on HDFS — no window with the target
        absent, so ``write_text_atomic``'s marker/stats swaps stay atomic
        for concurrent readers); else delete+rename, which IS a two-step
        swap — on such stores (and any object store where rename is
        copy+delete) atomicity degrades to last-writer-wins with a brief
        absent-target window, acceptable for the single-writer control
        plane but visible to a concurrently constructed SearchEngine."""
        if self._fc is not None:
            try:
                self._fc.rename(self._p(src), self._p(dst), self._rename_opts)
                return
            except Exception:
                pass  # e.g. rename across mount points; fall through
        d = self._p(dst)
        if self._fs.exists(d):
            self._fs.delete(d, True)
        if not self._fs.rename(self._p(src), d):
            raise OSError(f"rename failed: {src} -> {dst}")

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._p(path))
        try:
            data = self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            return bytes(data).decode("utf-8")
        finally:
            stream.close()

    def write_text_atomic(self, path: str, text: str) -> None:
        parent, name = path.rsplit("/", 1)
        tmp = f"{parent}/.{name}.{uuid.uuid4().hex[:8]}.tmp"
        out = self._fs.create(self._p(tmp), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        self.rename(tmp, path)

    def dir_bytes(self, path: str) -> int:
        p = self._p(path)
        if not self._fs.exists(p):
            return 0
        return int(self._fs.getContentSummary(p).getLength())

    def listdir(self, path: str) -> list[str]:
        """Child entry NAMES of a directory; absent path → empty list."""
        p = self._p(path)
        if not self._fs.exists(p):
            return []
        return sorted(st.getPath().getName()
                      for st in self._fs.listStatus(p))

    def copy_tree(self, src: str, dst: str) -> None:
        """Recursive copy within this filesystem via Hadoop FileUtil —
        the snapshot primitive. Absent source → no-op."""
        sp = self._p(src)
        if not self._fs.exists(sp):
            return
        self._jvm.org.apache.hadoop.fs.FileUtil.copy(
            self._fs, sp, self._fs, self._p(dst), False, True, self._conf)


def get_fs(spark, path: str):
    """LocalFS for scheme-less paths, HadoopFS for any URI scheme. The one
    switch point between the sandbox layout and a cluster object store."""
    scheme = urlparse(path).scheme
    # windows drive letters would appear as single-char schemes; irrelevant here
    if not scheme:
        return LocalFS()
    return HadoopFS(spark, path)
