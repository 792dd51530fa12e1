"""Filesystem-agnostic metadata I/O via the Hadoop FileSystem API.

The reference's Store typeclass (Core.hs:82-143) abstracts MemoryStore
vs RadosStore; here the same duality is the Hadoop FS layer: a local
path in tests, ``s3a://bucket/prefix`` (Ceph RGW) or ``hdfs://`` in
production — one code path, resolved per-URI through
``spark._jvm.org.apache.hadoop.fs.FileSystem``.

Only *metadata* goes through this class (the ``_meta.json`` index/
watermark document, rollover size probes, compaction swaps); bulk data
always moves through Spark's own readers/writers.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


class HadoopFS:
    """Thin wrapper over org.apache.hadoop.fs.FileSystem for one root."""

    def __init__(self, spark: SparkSession, root: str):
        self._jvm = spark.sparkContext._jvm
        self._conf = spark.sparkContext._jsc.hadoopConfiguration()
        self._root_path = self._path(root)
        self.fs = self._root_path.getFileSystem(self._conf)

    def _path(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    # ------------------------------------------------------- queries

    def exists(self, p: str) -> bool:
        return self.fs.exists(self._path(p))

    def is_dir(self, p: str) -> bool:
        path = self._path(p)
        return self.fs.exists(path) and self.fs.getFileStatus(path).isDirectory()

    def list_dirs(self, p: str) -> list[str]:
        """Names of child directories (e.g. ``epoch=3`` partition dirs)."""
        path = self._path(p)
        if not self.fs.exists(path):
            return []
        return [
            st.getPath().getName()
            for st in self.fs.listStatus(path)
            if st.isDirectory()
        ]

    def dir_size(self, p: str) -> int:
        """Total bytes under a directory (recursive content summary)."""
        path = self._path(p)
        if not self.fs.exists(path):
            return 0
        return int(self.fs.getContentSummary(path).getLength())

    # ------------------------------------------------------ mutation

    def mkdirs(self, p: str) -> None:
        self.fs.mkdirs(self._path(p))

    def read_text(self, p: str) -> str:
        stream = self.fs.open(self._path(p))
        try:
            reader = self._jvm.java.io.BufferedReader(
                self._jvm.java.io.InputStreamReader(stream, "UTF-8")
            )
            lines = []
            line = reader.readLine()
            while line is not None:
                lines.append(line)
                line = reader.readLine()
            return "\n".join(lines)
        finally:
            stream.close()

    def write_text_atomic(self, p: str, text: str) -> None:
        """Crash-safe document replace: tmp + backup + rename.

        Hadoop's ``FileSystem.rename`` refuses to clobber an existing
        destination on HDFS/local, so a naive delete-then-rename has a
        window where NO complete copy of the document exists — a crash
        there would destroy ``_meta.json`` (the namespace's index,
        watermarks and points_version pointer).  Instead the previous
        version is moved aside to ``p.bak`` before the new file renames
        in, so at every crash point at least one complete copy (``p``
        or ``p.bak``) survives; :meth:`exists_or_recover` restores from
        the backup when the primary is missing (plain :meth:`read_text`
        does NOT recover — callers must check :meth:`exists_or_recover`
        first, as ``Store._read_meta`` does).  A crash in the middle
        can lose the *newest* write (the backup holds the previous
        version) but never the document.
        """
        import os as _os
        import time as _time

        tmp = f"{p}.tmp.{_os.getpid()}.{_time.monotonic_ns()}"
        out = self.fs.create(self._path(tmp), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        dest = self._path(p)
        bak = self._path(p + ".bak")
        if self.fs.exists(dest):
            if self.fs.exists(bak):
                self.fs.delete(bak, False)
            if not self.fs.rename(dest, bak):
                raise IOError(f"backup rename failed: {p} -> {p}.bak")
        if not self.fs.rename(self._path(tmp), dest):
            raise IOError(f"rename failed: {tmp} -> {p}")
        # New primary is in place; the backup is only crash insurance.
        if self.fs.exists(bak):
            self.fs.delete(bak, False)

    def exists_or_recover(self, p: str) -> bool:
        """True iff ``p`` exists, restoring it from the ``p.bak``
        crash backup (see :meth:`write_text_atomic`) if needed."""
        if self.fs.exists(self._path(p)):
            return True
        bak = self._path(p + ".bak")
        if self.fs.exists(bak):
            if self.fs.rename(bak, self._path(p)):
                return True
            # Rename can fail because a concurrent reader already
            # recovered the file or a writer recreated it between the
            # two exists checks — re-check rather than reporting a
            # spurious miss (which would surface as a bogus
            # NamespaceNotRegistered in _read_meta).
            return bool(self.fs.exists(self._path(p)))
        return False

    def rename(self, src: str, dst: str) -> bool:
        return bool(self.fs.rename(self._path(src), self._path(dst)))

    def delete(self, p: str, recursive: bool = True) -> bool:
        return bool(self.fs.delete(self._path(p), recursive))
